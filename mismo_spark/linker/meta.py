"""Meta-blocking: weight the candidate-pair graph implied by a block
collection, then prune low-evidence edges.

Beyond the reference (mismo stops at block construction; its skew guard
is KeyLinker.max_pairs).  Semantics follow the meta-blocking literature
(Papadakis et al., TKDE 2014, "Meta-Blocking: Taking Entity Resolution
to the Next Level"): records co-occurring in MORE blocks are likelier
matches, so the blocking graph's edges are weighted (CBS = common-block
count, JS = Jaccard of the two records' block sets) and pruned either
globally (WEP — drop edges below the mean weight) or per-node (CNP —
keep each node's top-k edges).

Plan shape, built for 10^12 records:

* The block collection is ONE narrow (record_id, block) relation —
  block ids are strings "<key_idx>:<value>", so no re-tokenization per
  scheme and the whole graph derivation is equi-joins on it.
* Block purging (drop blocks larger than ``max_block_size``) bounds the
  per-block self-join exactly like KeyLinker's skew guard — an oversized
  block contributes O(size²) pairs, so the cap is the scale lever.
* Edge weights come from one groupBy of the per-block pair stream
  (map-side combinable); node block-counts join back by record id.
* WEP's threshold is a one-row aggregate; CNP is two per-node window
  top-k passes (WindowGroupLimit pushdown), an edge surviving if either
  endpoint keeps it — both shuffle only on node id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def block_collection(
    df: DataFrame,
    keys: Sequence[Sequence[str] | str],
    *,
    id_column: str = "record_id",
    max_block_size: int | None = None,
) -> DataFrame:
    """→ (record_id, block): one row per record per blocking key whose
    value is non-null.  ``keys`` is a list of schemes, each a column
    name or a composite (list of column names).  Blocks larger than
    ``max_block_size`` are purged (block purging, Papadakis et al. §3)."""
    parts = []
    for i, key in enumerate(keys):
        cols = [key] if isinstance(key, str) else list(key)
        non_null = None
        for c in cols:
            cond = F.col(c).isNotNull()
            non_null = cond if non_null is None else (non_null & cond)
        block = F.concat_ws(
            "\x1f", F.lit(str(i)), *[F.col(c).cast("string") for c in cols]
        )
        parts.append(
            df.filter(non_null).select(
                F.col(id_column), block.alias("block")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.distinct()
    if max_block_size is not None:
        sizes = out.groupBy("block").agg(F.count(F.lit(1)).alias("__bs"))
        out = (
            out.join(sizes.filter(F.col("__bs") <= max_block_size), "block")
            .drop("__bs")
        )
    return out


def candidate_graph(
    df: DataFrame,
    keys: Sequence[Sequence[str] | str],
    *,
    id_column: str = "record_id",
    max_block_size: int | None = None,
) -> DataFrame:
    """The weighted blocking graph: one row per candidate pair with

    * ``cbs`` — common-block count (CBS weight), and
    * ``js`` — Jaccard of the two records' block sets,
      cbs / (|B(l)| + |B(r)| − cbs).

    → (record_id_l, record_id_r, cbs, js), l < r."""
    # materialize once: the (record, block) relation feeds the pair
    # self-join (twice), the per-record block counts, and — with
    # purging — its own size filter; Spark re-executes the aliased
    # union+distinct subtree per consumer otherwise
    blocks = block_collection(
        df, keys, id_column=id_column, max_block_size=max_block_size
    ).localCheckpoint(eager=True)
    left = blocks.select(F.col(id_column).alias("record_id_l"), "block")
    right = blocks.select(F.col(id_column).alias("record_id_r"), "block")
    pairs = (
        left.join(right, "block")
        .filter(F.col("record_id_l") < F.col("record_id_r"))
        .groupBy("record_id_l", "record_id_r")
        .agg(F.count(F.lit(1)).alias("cbs"))
    )
    nblocks = blocks.groupBy(id_column).agg(F.count(F.lit(1)).alias("nb"))
    return (
        pairs.join(
            nblocks.select(F.col(id_column).alias("record_id_l"), F.col("nb").alias("__nbl")),
            "record_id_l",
        )
        .join(
            nblocks.select(F.col(id_column).alias("record_id_r"), F.col("nb").alias("__nbr")),
            "record_id_r",
        )
        .select(
            "record_id_l",
            "record_id_r",
            "cbs",
            (
                F.col("cbs")
                / (F.col("__nbl") + F.col("__nbr") - F.col("cbs"))
            ).alias("js"),
        )
    )


def prune_wep(graph: DataFrame, *, weight: str = "js") -> DataFrame:
    """Weighted Edge Pruning: keep edges with weight > the global mean
    (Papadakis et al. §4.2).  One one-row aggregate, then a filter."""
    mean = graph.agg(F.avg(weight)).collect()[0][0]
    if mean is None:
        return graph
    return graph.filter(F.col(weight) > float(mean))


def prune_cnp(graph: DataFrame, *, k: int, weight: str = "js") -> DataFrame:
    """Cardinality Node Pruning: keep an edge if it ranks in the top-k
    of EITHER endpoint's full incident-edge list (Papadakis et al.
    §4.3), tie-broken deterministically by the opposite record id.

    Each edge is viewed from both endpoints (a 2× union, still linear
    in edges), ranked per node with one window (WindowGroupLimit keeps
    k rows per node per partition), and an edge survives via a semi-join
    against the kept orientations."""
    incident = graph.select(
        F.col("record_id_l").alias("node"),
        F.col("record_id_r").alias("other"),
        F.col(weight).alias("__w"),
    ).unionByName(
        graph.select(
            F.col("record_id_r").alias("node"),
            F.col("record_id_l").alias("other"),
            F.col(weight).alias("__w"),
        )
    )
    w = Window.partitionBy("node").orderBy(F.desc("__w"), F.col("other"))
    kept = (
        incident.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            F.least("node", "other").alias("record_id_l"),
            F.greatest("node", "other").alias("record_id_r"),
        )
        .distinct()
    )
    return graph.join(kept, ["record_id_l", "record_id_r"], "left_semi")


def meta_block(
    df: DataFrame,
    keys: Sequence[Sequence[str] | str],
    *,
    scheme: str = "wep",
    k: int = 5,
    weight: str = "js",
    id_column: str = "record_id",
    max_block_size: int | None = None,
) -> DataFrame:
    """Build the weighted blocking graph and prune it in one call."""
    # materialize once: WEP consumes the graph twice (mean aggregate is
    # an action, then the filter re-executes the plan) and CNP three
    # times (two orientations + the semi-join probe)
    graph = candidate_graph(
        df, keys, id_column=id_column, max_block_size=max_block_size
    ).localCheckpoint(eager=True)
    if scheme == "wep":
        return prune_wep(graph, weight=weight)
    if scheme == "cnp":
        return prune_cnp(graph, k=k, weight=weight)
    if scheme == "none":
        return graph
    raise ValueError(f"unknown meta-blocking scheme {scheme!r}")
