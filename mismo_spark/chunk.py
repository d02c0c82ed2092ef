"""Document chunking and sequence packing — the two layout transforms
between a curated document corpus and a token-budgeted training run.

* :func:`chunk_documents` — split long documents into overlapping
  token-window chunks (the RAG / long-doc-training shape).  The window
  arithmetic runs INSIDE one higher-order ``transform`` over each
  document's token array (a generator in whole-stage codegen), so the
  corpus is scanned once and no shuffle is introduced; lineage
  (``doc ids``, ``chunk_id``, token offsets) rides along for joins
  back to the source.
* :func:`pack_sequences` — assign whole documents to fixed-budget
  training sequences in one deterministic pass (the "concatenate into
  context windows" step): documents are laid out in md5 order (or per
  group), a running token total places each document, and its sequence
  id is ``floor(tokens_before / seq_tokens)``.  A document is assigned
  to the sequence where it STARTS; sequences can overflow by less than
  one document's length — chunk oversized documents first (that is
  what :func:`chunk_documents` is for), then pack the chunks.
  Start-bin packing keeps the operator a single window cumsum —
  shuffle = one exchange on the group key (or one bounded global pass),
  versus true bin packing which is inherently sequential.

Both are deterministic (md5 order, no rand()) and replayable in ANSI
SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark.text.features import tokenize


def _hash_order(id_col: str, seed: int) -> Column:
    return F.md5(F.concat_ws("|", F.col(id_col), F.lit(str(seed))))


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_col, chunk_id, start_token, n_tokens, chunk_text): each
    document split into windows of ``chunk_tokens`` whitespace tokens
    with ``overlap_tokens`` shared between consecutive chunks; the last
    chunk keeps the tail (may be shorter).  Documents with no tokens
    yield no chunks (filter them or union them back as needed)."""
    c, o = int(chunk_tokens), int(overlap_tokens)
    if c < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= o < c):
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    step = c - o
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - c, 0) / step)
    n_chunks = F.when(n <= c, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(c)) / F.lit(step)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * step).alias("start_token"),
            F.slice(toks, i * step + 1, c).alias("toks"),
        ),
    )
    exploded = docs.where(n > 0).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "__c"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.col("__c.start_token").alias("start_token"),
        F.size("__c.toks").alias("n_tokens"),
        F.array_join("__c.toks", " ").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    *,
    seq_tokens: int,
    by: list[str] | None = None,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """→ ``docs`` + (seq_id, seq_offset): deterministic start-bin
    packing of whole documents into training sequences of
    ``seq_tokens`` (see module docstring for the overflow contract).
    ``by`` partitions the layout (e.g. ["split"] so train/test never
    share a sequence) and bounds the window; without it the cumsum is
    one global pass — fine up to millions of rows, pass ``by`` at
    corpus scale.  ``seq_offset`` is the document's token offset inside
    its sequence."""
    L = int(seq_tokens)
    if L < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    part = Window.partitionBy(*by) if by else Window.partitionBy()
    w = part.orderBy(_hash_order(id_col, seed)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0)).cast(
        "long"
    )
    return (
        docs.withColumn("__before", before)
        .withColumn("seq_id", F.floor(F.col("__before") / L).cast("long"))
        .withColumn(
            "seq_offset", (F.col("__before") % F.lit(L)).cast("long")
        )
        .drop("__before")
    )
