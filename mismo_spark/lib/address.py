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

from pyspark.sql import Column
from pyspark.sql import functions as F

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
    """→ struct<AddressNumber, StreetName, USPSBoxID>
    (compact re-derivation of mismo/lib/geo/_regex_parse.py:662-686)."""
    s = F.upper(F.trim(street1))
    box = F.regexp_extract(s, r"^P\.?\s*O\.?\s*BOX\s+(\d+)", 1)
    number = F.regexp_extract(s, r"^(\d+[A-Z]?)\s", 1)
    name = F.trim(
        F.regexp_replace(
            F.regexp_extract(s, r"^(?:\d+[A-Z]?\s+)?(.*?)$", 1),
            # strip a trailing street type + optional unit
            r"\s+(ST|STREET|AVE|AVENUE|RD|ROAD|BLVD|BOULEVARD|LN|LANE|DR|DRIVE"
            r"|CT|COURT|PL|PLACE|WAY|TER|TERRACE|CIR|CIRCLE|HWY|HIGHWAY)\.?"
            r"(\s+(APT|UNIT|STE|SUITE|#)\.?\s*\S*)?$",
            "",
        )
    )
    name = F.when(box != "", F.lit("")).otherwise(name)
    return F.struct(
        number.alias("AddressNumber"),
        name.alias("StreetName"),
        box.alias("USPSBoxID"),
    )


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
