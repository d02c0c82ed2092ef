"""URL cleaning / parsing / match levels — the web-native sibling of
``lib/email.py`` (no reference counterpart: mismo has no URL toolkit,
but the north-star corpus is keyed by url, so canonicalization is the
first blocking/dedup lever a web-scale pipeline reaches for).

Everything is pure column algebra (regexp + array built-ins, zero
UDFs), so plans stay in whole-stage codegen and every function is
replayable as ANSI SQL by the DuckDB oracle (driver rows ``clean_url``
and ``url_match_level``).

Canonicalization rules (deterministic, order matters):
1. trim; prepend ``http://`` when no ``scheme://`` is present
2. scheme and host lowercase
3. default ports dropped (``:80`` for http, ``:443`` for https)
4. fragment dropped
5. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), remaining query params sorted bytewise
6. empty path normalized to ``/``; trailing ``?`` dropped
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F

#: params stripped by clean_url — bytewise-sortable, anchored match
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def _with_scheme(url: Column) -> Column:
    u = F.trim(url)
    return F.when(u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), u).otherwise(
        F.concat(F.lit("http://"), u)
    )


def url_parts(url: Column) -> Column:
    """→ struct<scheme, host, port, path, query, fragment>; empty
    components are NULL.  Host is lowercased; nothing else is altered
    (use :func:`clean_url` for full canonicalization)."""
    u = _with_scheme(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$", 1)
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"\?([^#]*)", 1)
    fragment = F.regexp_extract(rest, r"#(.*)$", 1)
    nn = lambda c: F.nullif(c, F.lit(""))  # noqa: E731
    return F.struct(
        nn(scheme).alias("scheme"),
        nn(host).alias("host"),
        nn(port).alias("port"),
        nn(path).alias("path"),
        nn(query).alias("query"),
        nn(fragment).alias("fragment"),
    )


def _canonical_query(query: Column) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing left)."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def clean_url(url: Column) -> Column:
    """Canonical URL string (rules in the module docstring); NULL in →
    NULL out."""
    p = url_parts(url)
    scheme = p["scheme"]
    default_port = (
        (scheme == "http") & (p["port"] == "80")
        | (scheme == "https") & (p["port"] == "443")
    )
    hostport = F.when(
        p["port"].isNull() | default_port, p["host"]
    ).otherwise(F.concat(p["host"], F.lit(":"), p["port"]))
    path = F.coalesce(p["path"], F.lit("/"))
    q = _canonical_query(F.coalesce(p["query"], F.lit("")))
    out = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(out)


def registrable_domain(url: Column) -> Column:
    """Last-two-labels domain key ('example.com' from
    'https://a.b.example.com/x') — the blocking key of the flagship
    pipeline (heuristic: no public-suffix list; fine for blocking,
    where over-merging a key only costs extra candidate pairs)."""
    host = F.regexp_replace(url_parts(url)["host"], r"^www\.", "")
    return F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit(""))


class UrlMatchLevel(IntEnum):
    """Ordered like EmailMatchLevel: smaller = stronger agreement."""

    EXACT = 0  # canonical URLs equal
    SAME_PATH = 1  # host + path equal (query differs)
    SAME_DOMAIN = 2  # registrable domain equal
    ELSE = 3


def match_level(u1: Column, u2: Column) -> Column:
    """EXACT < SAME_PATH < SAME_DOMAIN < ELSE over canonicalized URLs;
    NULL on either side → ELSE (SQL equality semantics)."""
    p1, p2 = url_parts(u1), url_parts(u2)
    return (
        F.when(clean_url(u1) == clean_url(u2), F.lit(int(UrlMatchLevel.EXACT)))
        .when(
            (p1["host"] == p2["host"])
            & (F.coalesce(p1["path"], F.lit("/")) == F.coalesce(p2["path"], F.lit("/"))),
            F.lit(int(UrlMatchLevel.SAME_PATH)),
        )
        .when(
            registrable_domain(u1) == registrable_domain(u2),
            F.lit(int(UrlMatchLevel.SAME_DOMAIN)),
        )
        .otherwise(F.lit(int(UrlMatchLevel.ELSE)))
    )


def surt(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform — the key format of the
    Common Crawl / Internet Archive CDX indexes ("com,example,www)/p"):
    host labels reversed and comma-joined, ')' separator, then the
    path and the canonical (sorted, tracking-stripped) query.  Scheme,
    default ports and the 'www.' prefix are dropped, so all the
    variants ``clean_url`` still distinguishes by scheme/host spelling
    collapse to ONE sortable key — and a corpus sorted/bucketed by it
    co-locates each site's pages, which is exactly what per-domain
    blocking, crawl diffing against a CDX index, and range-pruned
    site extraction want from a 10^12-row table layout.

    Pure column algebra (split/reverse/array_join); NULL in → NULL
    out; non-default ports are kept after the host ("com,example:8080)").
    """
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    default_port = (
        (p["scheme"] == "http") & (p["port"] == "80")
        | (p["scheme"] == "https") & (p["port"] == "443")
    )
    hostkey = F.when(
        p["port"].isNull() | default_port, rev
    ).otherwise(F.concat(rev, F.lit(":"), p["port"]))
    q = _canonical_query(F.coalesce(p["query"], F.lit("")))
    out = F.concat(
        hostkey,
        F.lit(")"),
        F.coalesce(p["path"], F.lit("/")),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(out)


def domain_suffixes(url: Column) -> Column:
    """array<string> of the host's dot-suffix chain, most-specific
    first ('a.b.example.com' → [a.b.example.com, b.example.com,
    example.com, com]) — the probe side of blocklist matching, where a
    blocked 'example.com' must catch every subdomain."""
    host = url_parts(url)["host"]
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or keep, with ``keep_blocked=True``) rows whose URL host
    equals a blocked domain OR sits under one (subdomain match) — the
    UT1/adult-blocklist screen of a web-curation funnel.

    Plan: each row explodes to its ≤ #labels host suffixes, equi-joins
    the (broadcast) blocklist, and a left-semi/anti join on a row id
    keeps the original rows intact — no UDF, no regex scan of the
    blocklist per row (the naive contains-join is quadratic in the
    blocklist; this is linear with a broadcast hash probe).
    """
    probe = df.select(
        F.monotonically_increasing_id().alias("__rid"), "*"
    )
    hits = (
        probe.select(
            "__rid", F.explode(domain_suffixes(F.col(url_col))).alias("__sfx")
        )
        .join(
            F.broadcast(
                blocked_domains.select(
                    F.lower(F.col(domain_col)).alias("__sfx")
                ).distinct()
            ),
            "__sfx",
        )
        .select("__rid")
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return probe.join(hits, "__rid", how).drop("__rid")
