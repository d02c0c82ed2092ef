"""cluster eval metrics (numpy re-derivation of sklearn semantics),
address featurize/match_level, NameBlocker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.cluster.eval import (
    adjusted_mutual_info,
    adjusted_rand_score,
    completeness_score,
    fowlkes_mallows,
    homogeneity_completeness_v,
    homogeneity_score,
    mutual_info_score,
    normalized_mutual_info,
    rand_score,
    v_measure_score,
)
from mismo_spark.lib.address import (
    AddressesMatchLevel,
    featurize_address,
    match_level,
    parse_street1,
)
from mismo_spark.lib.name_blocker import NameBlocker


def test_eval_metrics_perfect(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 100), (3, 20, 200)],
        "record_id long, component long, label_true long",
    )
    assert adjusted_rand_score(df) == pytest.approx(1.0)
    hcv = homogeneity_completeness_v(df)
    assert hcv["v_measure"] == pytest.approx(1.0)
    assert normalized_mutual_info(df) == pytest.approx(1.0)
    assert fowlkes_mallows(df) == pytest.approx(1.0)


def test_eval_metrics_imperfect(spark):
    # one record mis-clustered
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 100), (3, 10, 200), (4, 20, 200)],
        "record_id long, component long, label_true long",
    )
    ari = adjusted_rand_score(df)
    assert -0.5 <= ari < 1.0
    hcv = homogeneity_completeness_v(df)
    assert 0.0 <= hcv["homogeneity"] < 1.0
    fm = fowlkes_mallows(df)
    assert 0.0 < fm < 1.0


def test_eval_matches_known_values(spark):
    # hand-computed ARI for labels [0,0,1,1] vs [0,0,1,2]
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0), (3, 1, 1), (4, 2, 1)],
        "record_id long, component long, label_true long",
    )
    # contingency [[2,0,0],[0,1,1]]; sklearn ARI = 0.5714285714
    assert adjusted_rand_score(df) == pytest.approx(0.57142857, abs=1e-6)
    # RI: of the 6 pairs, only (3,4) disagrees (same true, split pred)
    assert rand_score(df) == pytest.approx(5.0 / 6.0, abs=1e-9)
    # MI: (2/4)ln2 + (1/4)ln2 + (1/4)ln2 = ln 2
    import math

    assert mutual_info_score(df) == pytest.approx(math.log(2.0), abs=1e-9)


def test_ami_chance_correction(spark):
    import math

    # identical non-trivial clustering → AMI exactly 1
    same = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0), (3, 1, 1), (4, 1, 1), (5, 2, 2)],
        "record_id long, component long, label_true long",
    )
    assert adjusted_mutual_info(same) == pytest.approx(1.0, abs=1e-12)
    # a clustering independent of truth → AMI near 0 while raw NMI is
    # inflated by chance (the whole point of the correction)
    rows = [(i, i % 2, (i * 7 + 3) % 5) for i in range(40)]
    indep = spark.createDataFrame(
        rows, "record_id long, component long, label_true long"
    )
    ami = adjusted_mutual_info(indep)
    nmi = normalized_mutual_info(indep)
    assert abs(ami) < 0.3
    assert ami < nmi + 1e-9
    # all averaging variants stay chance-corrected near 0 here
    for method in ("min", "max", "geometric"):
        assert abs(adjusted_mutual_info(indep, average_method=method)) < 0.3
    with pytest.raises(ValueError):
        adjusted_mutual_info(indep, average_method="bogus")


def test_individual_hcv_wrappers(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0), (3, 1, 1), (4, 2, 1)],
        "record_id long, component long, label_true long",
    )
    hcv = homogeneity_completeness_v(df)
    assert homogeneity_score(df) == pytest.approx(hcv["homogeneity"])
    assert completeness_score(df) == pytest.approx(hcv["completeness"])
    assert v_measure_score(df) == pytest.approx(hcv["v_measure"])


def test_parse_street1(spark):
    df = spark.createDataFrame(
        [("123 N Main St",), ("PO Box 42",), ("456 Oak Avenue",)],
        "s string",
    )
    out = [r["v"] for r in df.select(parse_street1(F.col("s")).alias("v")).collect()]
    assert out[0]["AddressNumber"] == "123"
    assert out[0]["StreetNamePreDirectional"] == "N"
    assert out[0]["StreetName"] == "Main"
    assert out[0]["StreetNamePostType"] == "St"
    assert out[0]["USPSBoxID"] == ""
    assert out[1]["USPSBoxID"] == "42"
    assert out[1]["StreetName"] == ""
    assert out[2]["AddressNumber"] == "456"
    assert out[2]["StreetName"] == "Oak"
    assert out[2]["StreetNamePostType"] == "Avenue"


# the reference's own parse expectations
# (mismo/lib/geo/tests/test_re_parse.py:9-330, sans the USPSBoxGroup
# fields we don't capture)
_REF_PARSE_CASES = [
    ("GENERAL DELIVERY", None),
    ("BARRACKS ST UNIT 2", None),
    ("4602 CR 673", ("4602", "", "CR 673", "", "", "")),
    ("6473 FM 1798", ("6473", "", "FM 1798", "", "", "")),
    ("1 1ST", ("1", "", "1ST", "", "", "")),
    ("123 MAIN", ("123", "", "MAIN", "", "", "")),
    ("123 S MAIN WEST", ("123", "S", "MAIN", "", "WEST", "")),
    ("1 1ST ST", ("1", "", "1ST", "ST", "", "")),
    ("7100 RIDGE MANOR LN", ("7100", "", "RIDGE MANOR", "LN", "", "")),
    ("7100 Ridge Manor ln", ("7100", "", "Ridge Manor", "ln", "", "")),
    ("1101B ODIN ST", ("1101B", "", "ODIN", "ST", "", "")),
    ("1385 JUNEAU AVE", ("1385", "", "JUNEAU", "AVE", "", "")),
    ("PO BOX 651", ("", "", "", "", "", "651")),
    ("p.o. Box 651", ("", "", "", "", "", "651")),
    ("604 FIFTH ST", ("604", "", "FIFTH", "ST", "", "")),
    ("604 E  FIFTH ST", ("604", "E", "FIFTH", "ST", "", "")),
    ("604 E  5TH ST", ("604", "E", "5TH", "ST", "", "")),
    ("44755 STERLING HWY", ("44755", "", "STERLING", "HWY", "", "")),
    ("100 MC CARREY ST", ("100", "", "MC CARREY", "ST", "", "")),
    ("100 MC CARREY ST.", ("100", "", "MC CARREY", "ST", "", "")),
    ("100 MC CARREY ST. W", ("100", "", "MC CARREY", "ST", "W", "")),
    ("100 MC CARREY ST. W.", ("100", "", "MC CARREY", "ST", "W", "")),
    ("100 St. Johann Loop", ("100", "", "St. Johann", "Loop", "", "")),
    ("1015 OTTER RUN", ("1015", "", "OTTER", "RUN", "", "")),
    (
        "9950 STEPHEN RICHARDS MEMORIAL DR",
        ("9950", "", "STEPHEN RICHARDS MEMORIAL", "DR", "", ""),
    ),
    ("123 MAIN TERRACE", ("123", "", "MAIN", "TERRACE", "", "")),
    ("45 OAK CIRCLE", ("45", "", "OAK", "CIRCLE", "", "")),
    ("9 LIBERTY PARKWAY", ("9", "", "LIBERTY", "PARKWAY", "", "")),
]


def test_parse_street1_reference_parity(spark):
    df = spark.createDataFrame([(s,) for s, _ in _REF_PARSE_CASES], "s string")
    got = {
        r["s"]: r["v"]
        for r in df.select("s", parse_street1(F.col("s")).alias("v")).collect()
    }
    fields = (
        "AddressNumber",
        "StreetNamePreDirectional",
        "StreetName",
        "StreetNamePostType",
        "StreetNamePostDirectional",
        "USPSBoxID",
    )
    for s, expected in _REF_PARSE_CASES:
        v = got[s]
        if expected is None:
            assert v is None, (s, v)
        else:
            assert v is not None, s
            assert tuple(v[f] for f in fields) == expected, (s, v)


@pytest.fixture
def addr_pairs(spark):
    mk = lambda s1, city, state, zipc: (s1, None, city, state, zipc)  # noqa: E731
    rows = [
        (mk("123 Main St", "Springfield", "IL", "62704"),
         mk("123 Main St", "Springfield", "IL", "62704")),   # exact
        (mk("123 Main St", "Springfield", "IL", "62704"),
         mk("123 Mian St", "Springfield", "IL", "62704")),   # typo
        (mk("99 Elm St", "Springfield", "IL", "62704"),
         mk("5 Oak Rd", "Springfield", "IL", "62704")),      # same region
        (mk("99 Elm St", "Chicago", "IL", "60601"),
         mk("5 Oak Rd", "Peoria", "IL", "61601")),           # same state
        (mk("99 Elm St", "Chicago", "IL", "60601"),
         mk("5 Oak Rd", "Austin", "TX", "73301")),           # else
    ]
    schema_one = "struct<street1:string,street2:string,city:string,state:string,postal_code:string>"
    return spark.createDataFrame(rows, f"a {schema_one}, b {schema_one}")


def test_address_match_levels(addr_pairs):
    out = addr_pairs.select(
        match_level(
            featurize_address(F.col("a")), featurize_address(F.col("b"))
        ).alias("lvl")
    ).collect()
    lvls = [r["lvl"] for r in out]
    assert lvls == [
        int(AddressesMatchLevel.STREET1_AND_CITY_OR_POSTAL),
        int(AddressesMatchLevel.POSSIBLE_TYPO),
        int(AddressesMatchLevel.SAME_REGION),
        int(AddressesMatchLevel.SAME_STATE),
        int(AddressesMatchLevel.ELSE),
    ]


def test_name_blocker(spark):
    schema = (
        "record_id long, name struct<prefix:string,given:string,middle:string,"
        "surname:string,suffix:string,nickname:string>"
    )
    df = spark.createDataFrame(
        [
            (1, ("", "alice", "", "smith", "", "")),
            (2, ("", "bob", "", "ALICE", "", "")),   # given↔surname cross
            (3, ("", "carol", "", "jones", "", "")),
            (4, ("", "", "", "", "", "")),            # empties never match
            (5, ("", "", "", "", "", "")),
        ],
        schema,
    )
    lk = NameBlocker(column="name", task="dedupe")(df)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(1, 2)}
