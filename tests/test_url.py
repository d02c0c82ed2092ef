"""lib/url.py: canonicalization, parts, domain key, match levels.

Expected values are hand-derived from the module's documented rules and
cross-checked against the DuckDB replay used by the clean_url /
url_match_level oracle rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mismo_spark.lib.url import (
    UrlMatchLevel,
    clean_url,
    match_level,
    registrable_domain,
    url_parts,
)

CASES = [
    # (raw, clean, registrable_domain)
    (
        "HTTP://WWW.Example.COM:80/Path/page?b=2&utm_source=x&a=1#frag",
        "http://www.example.com/Path/page?a=1&b=2",
        "example.com",
    ),
    ("https://sub.example.com:443/", "https://sub.example.com/", "example.com"),
    (
        "https://sub.example.com:8443/x?gclid=1",
        "https://sub.example.com:8443/x",
        "example.com",
    ),
    (
        "example.com/no-scheme?z=1&y=2",
        "http://example.com/no-scheme?y=2&z=1",
        "example.com",
    ),
    ("http://example.com", "http://example.com/", "example.com"),
    (None, None, None),
    ("ftp://files.example.org:21/a/b", "ftp://files.example.org:21/a/b", "example.org"),
]


def test_clean_url_and_domain(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    got = df.select(
        clean_url(F.col("url")).alias("clean"),
        registrable_domain(F.col("url")).alias("dom"),
    ).collect()
    for (raw, want_clean, want_dom), row in zip(CASES, got):
        assert row["clean"] == want_clean, raw
        assert row["dom"] == want_dom, raw


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("https://Host.Example.com:8443/a/b?x=1#frag",)], "url string"
    )
    p = df.select(url_parts(F.col("url")).alias("p")).select("p.*").collect()[0]
    assert p["scheme"] == "https"
    assert p["host"] == "host.example.com"
    assert p["port"] == "8443"
    assert p["path"] == "/a/b"
    assert p["query"] == "x=1"
    assert p["fragment"] == "frag"


def test_match_levels(spark):
    pairs = [
        # EXACT: same canonical url, different tracking + case noise
        ("https://A.example.com/x?b=2&a=1", "HTTPS://a.Example.com/x?a=1&b=2&utm_s=9"),
        # SAME_PATH: query differs
        ("https://a.example.com/x?a=1", "https://a.example.com/x?a=2"),
        # SAME_DOMAIN: subdomain/path differ
        ("https://a.example.com/x", "https://b.example.com/y"),
        # ELSE
        ("https://a.example.com/x", "https://a.other.org/x"),
        # NULL side -> ELSE
        (None, "https://a.example.com/x"),
    ]
    want = [
        UrlMatchLevel.EXACT,
        UrlMatchLevel.SAME_PATH,
        UrlMatchLevel.SAME_DOMAIN,
        UrlMatchLevel.ELSE,
        UrlMatchLevel.ELSE,
    ]
    df = spark.createDataFrame(pairs, "u1 string, u2 string")
    got = df.select(match_level(F.col("u1"), F.col("u2")).alias("lvl")).collect()
    assert [r["lvl"] for r in got] == [int(w) for w in want]


def test_match_level_symmetric(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/x?a=1", "https://a.example.com/x?a=2"),
            ("https://a.example.com/x", "https://b.other.org/y"),
        ],
        "u1 string, u2 string",
    )
    fwd = df.select(match_level(F.col("u1"), F.col("u2")).alias("l")).collect()
    rev = df.select(match_level(F.col("u2"), F.col("u1")).alias("l")).collect()
    assert [r["l"] for r in fwd] == [r["l"] for r in rev]


def test_clean_url_idempotent(spark):
    """clean(clean(u)) == clean(u) over a seeded messy-URL corpus —
    canonical output must be a fixed point of the canonicalizer."""
    import random

    rng = random.Random(7)
    schemes = ["http://", "HTTPS://", "", "ftp://"]
    hosts = ["Example.COM", "www.shop.example.org", "A.B.example.net:8080",
             "example.com:80", "example.com:443"]
    paths = ["", "/", "/a/B", "/x%20y"]
    queries = ["", "?b=2&a=1", "?utm_source=x&z=9&y=8", "?a=1&a=1&ref=r"]
    frags = ["", "#f"]
    urls = [
        (rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
         + rng.choice(queries) + rng.choice(frags),)
        for _ in range(200)
    ]
    df = spark.createDataFrame(urls, "url string")
    once = clean_url(F.col("url"))
    got = df.select(once.alias("c1"), clean_url(once).alias("c2")).collect()
    for r in got:
        assert r["c1"] == r["c2"], r


def test_surt(spark):
    from mismo_spark.lib.url import surt

    cases = [
        ("https://www.Example.COM/path/p?b=2&a=1&utm_source=x",
         "com,example)/path/p?a=1&b=2"),
        ("http://a.b.example.com:80/x", "com,example,b,a)/x"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        ("example.com", "com,example)/"),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["s"] for r in df.select(surt(F.col("url")).alias("s")).collect()]
    assert got == [w for _, w in cases]
    # SURT keys of one site sort adjacently (the CDX co-location point)
    df2 = spark.createDataFrame(
        [("https://www.site.com/a",), ("https://zeta.org/x",),
         ("http://site.com/b",), ("https://blog.site.com/c",)],
        "url string",
    )
    keys = sorted(
        r["s"] for r in df2.select(surt(F.col("url")).alias("s")).collect()
    )
    assert keys == ["com,site)/a", "com,site)/b", "com,site,blog)/c",
                    "org,zeta)/x"]


def test_domain_suffixes(spark):
    from mismo_spark.lib.url import domain_suffixes

    df = spark.createDataFrame(
        [("https://a.b.example.com/x",)], "url string"
    )
    got = df.select(domain_suffixes(F.col("url")).alias("s")).collect()[0]["s"]
    assert got == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_blocklist_filter(spark):
    from mismo_spark.lib.url import blocklist_filter

    docs = spark.createDataFrame(
        [
            (0, "https://ads.tracker.net/x"),      # subdomain of blocked
            (1, "https://tracker.net/y"),           # exact blocked
            (2, "https://nottracker.net/z"),        # NOT a suffix match
            (3, "https://fine.example.org/a"),
            (4, "https://deep.a.bad.site/b"),       # under bad.site
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame(
        [("Tracker.NET",), ("bad.site",)], "domain string"
    )
    kept = {r["doc_id"] for r in blocklist_filter(docs, blocked).collect()}
    assert kept == {2, 3}
    dropped = {
        r["doc_id"]
        for r in blocklist_filter(docs, blocked, keep_blocked=True).collect()
    }
    assert dropped == {0, 1, 4}
