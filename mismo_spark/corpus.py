"""Deterministic synthetic web-page corpus (FIXTURES.md F1).

The primary pipeline input: Common-Crawl-shaped pages
(url, warc_ts, html, text, lang) + a test-only ``label_true`` ground
truth.  Duplicate clusters are generated per true entity with seeded
mutations (token drop/swap, casing, typos); domains follow a Zipf so
some are hot (exercises the skew path); a few large clusters exercise
the mega-block cap.

Generation is DISTRIBUTED and deterministic: each entity's members are
derived only from (seed, entity_id) inside ``mapInPandas`` over
``spark.range(n_entities)`` — the same corpus comes out at any
parallelism, which is what the scaling benchmark requires.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_VOCAB = [
    # deterministic small vocabulary; overlap across entities is what
    # makes blocking non-trivial
    w
    for w in (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
        "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
        "xray yankee zulu amber basin cedar dune ember fjord grove harbor isle "
        "jetty knoll lagoon mesa nook oasis prairie quarry ridge summit tundra "
        "upland vale wharf yonder zephyr anchor beacon copper driftwood estuary "
        "falcon garnet heron iris jasper kestrel larch maple nectar osprey pine "
        "quartz raven spruce thistle umber violet willow juniper saffron cobalt "
        "crimson indigo marigold obsidian pearl russet sable teal vermilion"
    ).split()
]

CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("label_true", LongType(), True),
    ]
)

_EPOCH = dt.datetime(2024, 3, 1, 0, 0, 0)
_LANGS = ["es", "de", "fr", "zh"]


def _render_html(text: str, entity: int) -> bytes:
    """Deterministic, invertible template — extraction must be
    byte-identical per url (BASELINE.json input_hint)."""
    return (
        f"<html><head><title>doc-{entity}</title></head>"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")


def _entity_rows(entity: int, seed: int, n_domains: int, skew_every: int):
    rng = np.random.RandomState((seed * 1_000_003 + entity) % (2**31 - 1))
    n_words = 30 + int(rng.randint(0, 50))
    base = [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), n_words)]
    # Zipf-ish hot domains: low ranks are overwhelmingly common
    domain_rank = min(int(rng.zipf(1.3)), n_domains) - 1
    domain = f"site{domain_rank:04d}.example.com"
    if skew_every and entity % skew_every == 0:
        size = 30  # a few large clusters → mega-block / skew exercise
    else:
        size = 1 + int(rng.geometric(0.55))
    lang = "en" if rng.rand() < 0.9 else _LANGS[int(rng.randint(0, len(_LANGS)))]
    for member in range(size):
        mrng = np.random.RandomState(
            (seed * 2_000_003 + entity * 97 + member) % (2**31 - 1)
        )
        toks = list(base)
        if member > 0:  # member 0 keeps the base text verbatim
            # token drops
            toks = [t for t in toks if mrng.rand() > 0.04] or list(base)
            # adjacent swaps
            for i in range(len(toks) - 1):
                if mrng.rand() < 0.03:
                    toks[i], toks[i + 1] = toks[i + 1], toks[i]
            # typos: replace one char in up to 2 tokens
            for _ in range(int(mrng.randint(0, 3))):
                ti = int(mrng.randint(0, len(toks)))
                t = toks[ti]
                if len(t) > 2:
                    ci = int(mrng.randint(0, len(t)))
                    toks[ti] = t[:ci] + "abcdefghijklmnopqrstuvwxyz"[
                        int(mrng.randint(0, 26))
                    ] + t[ci + 1 :]
            # casing
            if mrng.rand() < 0.2:
                toks = [t.capitalize() for t in toks]
        text = " ".join(toks)
        url = f"https://{domain}/doc/{entity}/{member}"
        ts = _EPOCH + dt.timedelta(seconds=int(mrng.randint(0, 30 * 24 * 3600)))
        yield (url, ts, _render_html(text, entity), text, lang, entity)


def make_corpus(
    spark: SparkSession,
    n_entities: int = 1000,
    *,
    seed: int = 42,
    n_domains: int = 500,
    skew_every: int = 1000,
    n_partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame(url, warc_ts, html, text, lang, label_true)."""
    params = {"seed": seed, "n_domains": n_domains, "skew_every": skew_every}

    def gen(batches):
        for pdf in batches:
            rows = []
            for entity in pdf["id"].tolist():
                rows.extend(_entity_rows(int(entity), **params))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CORPUS_SCHEMA.fields]
            )

    rng = spark.range(n_entities, numPartitions=n_partitions)
    return rng.mapInPandas(gen, CORPUS_SCHEMA)


def extract_text(html_col):
    """Deterministic HTML→text extraction (the <p> body of the
    template).  Pure column expression — byte-identical across runs,
    cluster sizes, and resumes."""
    decoded = F.decode(html_col, "UTF-8")
    return F.regexp_extract(decoded, r"<p>(.*?)</p>", 1)
