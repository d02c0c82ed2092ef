"""Address normalization, featurization, and match levels.

Semantics of mismo/lib/geo/_address.py:38-202.  The reference's street
parser is a 686-line regex table (mismo/lib/geo/_regex_parse.py) — we
implement the same *shape* with a compact street-type vocabulary: the
parser splits "123 N MAIN ST" / "PO BOX 42" into number / name / PO-box,
which is all the match levels consume.

Unlike the reference (which chains small mutates to dodge DuckDB's
repeated-regex evaluation, see comment at
mismo/lib/geo/_address.py:64-75), Spark's whole-stage codegen CSEs the
shared subexpressions, so one projection is fine.
"""

from __future__ import annotations

from enum import IntEnum

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from mismo_spark.lib.geo import distance_km
from mismo_spark.text.features import ngrams
from mismo_spark.text.similarity import damerau_levenshtein_ratio


def _norm_field(s: Column) -> Column:
    """strip/upper/collapse-ws/drop-specials/nullif ''
    (mismo/lib/geo/_address.py:38-45)."""
    out = F.upper(F.trim(s))
    out = F.regexp_replace(out, r"\s+", " ")
    out = F.regexp_replace(out, r"[^0-9A-Z.\- ]", "")
    return F.nullif(out, F.lit(""))


def norm_address(address: Column) -> Column:
    """Normalize a struct<street1,street2,city,state,postal_code>
    (mismo/lib/geo/_address.py:48-57)."""
    return F.struct(
        _norm_field(address["street1"]).alias("street1"),
        _norm_field(address["street2"]).alias("street2"),
        _norm_field(address["city"]).alias("city"),
        _norm_field(address["state"]).alias("state"),
        _norm_field(address["postal_code"]).alias("postal_code"),
    )


def parse_street1(street1: Column) -> Column:
    """→ struct<AddressNumber, StreetNamePreDirectional, StreetName,
    StreetNamePostType, StreetNamePostDirectional, USPSBoxID> — the
    reference's ParsedStreet1 shape (mismo/lib/geo/_regex_parse.py:
    653-686) over the full USPS Pub-28 vocabulary
    (mismo_spark/lib/street_vocab.py): number, optional pre-directional,
    1-4 word name (preferring fewer), optional post street type
    ("TERRACE", "CIR", "PKWY", …, longest alternative first), optional
    post-directional; or a PO-box form.  Components absent from a
    matching line are empty strings; a line matching neither grammar
    yields a NULL struct (same convention as the reference, which skips
    per-field nullif for engine-performance reasons).

    Six ``regexp_extract`` runs of one shared pattern per row — all
    JVM-side, whole-stage codegen; no Python in the path."""
    from mismo_spark.lib.street_vocab import street1_pattern

    # case-insensitive match, case-preserving capture (the reference's
    # behavior: "7100 Ridge Manor ln" parses with name "Ridge Manor")
    s = F.trim(street1)
    pat = "(?i)" + street1_pattern()
    groups = {
        "AddressNumber": 1,
        "StreetNamePreDirectional": 2,
        "StreetName": 3,
        "StreetNamePostType": 4,
        "StreetNamePostDirectional": 5,
        "USPSBoxID": 6,
    }
    parsed = F.struct(
        *[F.regexp_extract(s, pat, i).alias(n) for n, i in groups.items()]
    )
    return F.when(s.rlike(pat), parsed)


#: Reference-exact public name (mismo/lib/geo/_regex_parse.py:662).
parse_street1_re = parse_street1


def featurize_address(address: Column) -> Column:
    """→ struct with street_name / street_number / street_number_sorted /
    is_pobox / street_trigrams added (mismo/lib/geo/_address.py:60-112)."""
    cleaned = norm_address(address)
    parsed = parse_street1(cleaned["street1"])
    street_number = _norm_field(
        F.concat(
            F.coalesce(parsed["AddressNumber"], F.lit("")),
            F.coalesce(parsed["USPSBoxID"], F.lit("")),
        )
    )
    digits = F.split(F.coalesce(street_number, F.lit("")), "")
    street_number_sorted = F.nullif(
        F.concat_ws("", F.array_sort(digits)), F.lit("")
    )
    return F.struct(
        cleaned["street1"].alias("street1"),
        cleaned["city"].alias("city"),
        cleaned["postal_code"].alias("postal_code"),
        cleaned["state"].alias("state"),
        _norm_field(parsed["StreetName"]).alias("street_name"),
        street_number.alias("street_number"),
        (parsed["USPSBoxID"] != "").alias("is_pobox"),
        street_number_sorted.alias("street_number_sorted"),
        F.array_distinct(ngrams(cleaned["street1"], 3)).alias("street_trigrams"),
    )


class AddressesMatchLevel(IntEnum):
    """mismo/lib/geo/_address.py:115-133."""

    STREET1_AND_CITY_OR_POSTAL = 0
    POSSIBLE_TYPO = 1
    SAME_REGION = 2
    WITHIN_100KM = 3
    SAME_STATE = 4
    ELSE = 6


def _is_possible_typo(left: Column, right: Column) -> Column:
    """mismo/lib/geo/_address.py:135-157."""
    dl = damerau_levenshtein_ratio
    return (
        ((left["street1"] == right["street1"]) & (F.length(left["street1"]) >= 5))
        | (
            (dl(left["street_name"], right["street_name"]) > 0.9)
            & (dl(left["city"], right["city"]) > 0.9)
        )
        | (
            (dl(left["street_name"], right["street_name"]) > 0.9)
            & (dl(left["postal_code"], right["postal_code"]) >= 0.8)
        )
        | (
            (left["street_number"] == right["street_number"])
            & (dl(left["street_name"], right["street_name"]) > 0.4)
            & (dl(left["city"], right["city"]) > 0.9)
        )
    )


def match_level(left: Column, right: Column, *, has_latlon: bool = False) -> Column:
    """6-level address agreement (mismo/lib/geo/_address.py:160-202)."""
    out = F.when(
        (left["street1"] == right["street1"])
        & (
            (left["city"] == right["city"])
            | (left["postal_code"] == right["postal_code"])
        ),
        F.lit(int(AddressesMatchLevel.STREET1_AND_CITY_OR_POSTAL)),
    ).when(
        _is_possible_typo(left, right), F.lit(int(AddressesMatchLevel.POSSIBLE_TYPO))
    ).when(
        (left["postal_code"] == right["postal_code"])
        | ((left["city"] == right["city"]) & (left["state"] == right["state"])),
        F.lit(int(AddressesMatchLevel.SAME_REGION)),
    )
    if has_latlon:
        out = out.when(
            distance_km(
                lat1=left["latitude"],
                lon1=left["longitude"],
                lat2=right["latitude"],
                lon2=right["longitude"],
            )
            <= 100,
            F.lit(int(AddressesMatchLevel.WITHIN_100KM)),
        )
    return out.when(
        left["state"] == right["state"], F.lit(int(AddressesMatchLevel.SAME_STATE))
    ).otherwise(F.lit(int(AddressesMatchLevel.ELSE)))


# -- AddressesDimension (mismo/lib/geo/_address.py:205-277) ----------------


def _dl_ratio_py(a, b) -> float:
    from mismo_spark.text.similarity import _damerau_levenshtein

    if a is None or b is None:
        return float("nan")
    mx = max(len(a), len(b))
    if mx == 0:
        return float("nan")
    return (mx - _damerau_levenshtein(a, b)) / mx


def _eq(a, b) -> bool:
    return a is not None and a == b


def _address_pair_level(a: dict, b: dict) -> int:
    """Python mirror of match_level (sans latlon) for one featurized
    address pair — executed inside the Arrow batch of
    AddressesDimension.compare."""
    if _eq(a["street1"], b["street1"]) and (
        _eq(a["city"], b["city"]) or _eq(a["postal_code"], b["postal_code"])
    ):
        return int(AddressesMatchLevel.STREET1_AND_CITY_OR_POSTAL)
    sn = _dl_ratio_py(a["street_name"], b["street_name"])
    ct = _dl_ratio_py(a["city"], b["city"])
    pc = _dl_ratio_py(a["postal_code"], b["postal_code"])
    typo = (
        (_eq(a["street1"], b["street1"]) and len(a["street1"]) >= 5)
        or (sn > 0.9 and ct > 0.9)
        or (sn > 0.9 and pc >= 0.8)
        or (_eq(a["street_number"], b["street_number"]) and sn > 0.4 and ct > 0.9)
    )
    if typo:
        return int(AddressesMatchLevel.POSSIBLE_TYPO)
    if _eq(a["postal_code"], b["postal_code"]) or (
        _eq(a["city"], b["city"]) and _eq(a["state"], b["state"])
    ):
        return int(AddressesMatchLevel.SAME_REGION)
    if _eq(a["state"], b["state"]):
        return int(AddressesMatchLevel.SAME_STATE)
    return int(AddressesMatchLevel.ELSE)


@F.pandas_udf(LongType())
def _best_address_level_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Best (min) match level across all l×r combinations of two
    featurized address arrays — one Arrow stage, no shuffle."""
    out = []
    for le, ri in zip(left, right):
        if le is None or ri is None or len(le) == 0 or len(ri) == 0:
            out.append(int(AddressesMatchLevel.ELSE))
            continue
        best = int(AddressesMatchLevel.ELSE)
        for a in le:
            for b in ri:
                lvl = _address_pair_level(a, b)
                if lvl < best:
                    best = lvl
                    if best == 0:
                        break
            if best == 0:
                break
        out.append(best)
    return pd.Series(out)


class AddressesDimension:
    """Prep + block + compare bundle over an array<address-struct>
    column (mismo/lib/geo/_address.py:205-277).

    compare() is a single Arrow pandas-UDF stage taking the best (min)
    match level over all l×r address combinations — the reference maps
    match_level over array_combinations; the level needs an
    edit-distance UDF so a higher-order-function translation is
    impossible and explode→re-aggregate would add two shuffles."""

    def __init__(
        self,
        column: str,
        *,
        column_featured: str = "{column}_featured",
        column_compared: str = "{column}_compared",
    ) -> None:
        self.column = column
        self.column_featured = column_featured.format(column=column)
        self.column_compared = column_compared.format(column=column)

    def prepare(self, t):
        """array<address> → array<featurized address> (higher-order
        transform over featurize_address, pure column algebra)
        (mismo/lib/geo/_address.py:235-244)."""
        return t.withColumn(
            self.column_featured,
            F.transform(F.col(self.column), featurize_address),
        )

    def block(self, left, right=None, **kwargs):
        """UnnestLinker on (street_number, street_name) keys — the
        same any-address-matches blocking shape as the reference's
        keywords blocking (mismo/lib/geo/_address.py:246-266), keyed on
        the parsed street identity instead of trigram keywords."""
        from mismo_spark.linker.unnest import UnnestLinker

        key = F.transform(
            F.col(self.column_featured),
            lambda a: F.concat_ws(
                "\x00",
                F.coalesce(a["street_number"], F.lit("")),
                F.coalesce(a["street_name"], F.lit("")),
                F.coalesce(a["postal_code"], F.lit("")),
            ),
        )
        return UnnestLinker(key, **kwargs)(left, right)

    def compare(self, t):
        """Best (min) match level over all address combinations
        (mismo/lib/geo/_address.py:270-277)."""
        return t.withColumn(
            self.column_compared,
            _best_address_level_udf(
                F.col(self.column_featured + "_l"),
                F.col(self.column_featured + "_r"),
            ),
        )
