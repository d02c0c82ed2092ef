"""Link-graph operators for web corpora: outlink extraction, degree
tables, and iterative PageRank — the crawl-frontier-prioritization /
spam-downweighting layer of a Common-Crawl-style pipeline (mismo has no
graph module; clustering shares the shape via ``cluster/cc.py``, and
PageRank reuses its per-round checkpoint discipline).

Scale notes (100 TB / 10^12 pages):

* ``extract_outlinks`` is a map-only regexp projection — zero UDFs,
  whole-stage codegen, linear in corpus bytes.
* ``degrees`` is one groupBy per direction with map-side partial
  aggregation, combined by a full outer join on the node id.
* ``pagerank`` iterates k rounds of (ranks ⋈ edges on src) →
  groupBy(dst).sum — the canonical two-shuffle round.  The edge table
  is ``persist()``-ed with its out-degree column precomputed so the
  per-round join reuses one cached, already-partitioned relation;
  ranks are ``localCheckpoint``-ed per round (cc.py's discipline) so
  lineage stays O(1) instead of O(k).  Dangling mass (nodes with no
  out-edges) is folded back in-plan via a broadcast single-row
  aggregate — no per-round ``collect`` on the driver, so the whole
  round is one job and the driver never holds rank data.

Determinism / oracle parity: ranks are pure float64 arithmetic over
deterministic joins; summation-order differences between engines are
~1e-15 relative, far inside the harness' 6-decimal rounding.  The
DuckDB oracle replays the SAME fixed-iteration recurrence with the
iterations unrolled as nested subqueries (aggregates are not allowed in
recursive CTE terms), built by :func:`pagerank_oracle_sql`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_outlinks",
    "degrees",
    "pagerank",
    "pagerank_oracle_sql",
]

_HREF_RE = r'href\s*=\s*"([^"#]*)'


def extract_outlinks(
    pages: DataFrame,
    *,
    url_column: str = "url",
    html_column: str = "html",
) -> DataFrame:
    """→ (url, outlink) — one row per ``href="..."`` target in the page
    HTML (fragment part stripped, empty/intra-page targets dropped).

    Pure ``regexp_extract_all`` + explode: map-only, no UDF.  The
    ``html`` column may be binary (decoded as UTF-8) or string.  This
    is deliberately a *lexical* extractor (no base-URL resolution of
    relative links — that needs the URL toolkit's parser and is left to
    the caller via ``lib.url.clean_url``), matching the corpus
    generator's absolute-URL convention."""
    html = F.col(html_column)
    if dict(pages.dtypes)[html_column] == "binary":
        html = F.decode(html, "UTF-8")
    return (
        pages.select(
            F.col(url_column).alias("url"),
            F.explode_outer(F.regexp_extract_all(html, F.lit(_HREF_RE), 1)).alias(
                "outlink"
            ),
        )
        .filter(F.col("outlink").isNotNull() & (F.col("outlink") != ""))
    )


def degrees(
    edges: DataFrame,
    *,
    src_column: str = "src",
    dst_column: str = "dst",
) -> DataFrame:
    """→ (node, out_degree, in_degree) for every node appearing in the
    edge list (absent direction counts 0).  Two map-side-combined
    groupBys joined full-outer on the node id."""
    out_d = edges.groupBy(F.col(src_column).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst_column).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 10,
    damping: float = 0.85,
    src_column: str = "src",
    dst_column: str = "dst",
    dedupe_edges: bool = True,
) -> DataFrame:
    """Mass-conserving PageRank over a directed edge list.

    → (node, rank) for every node in the graph; Σ rank = 1 at every
    iteration (dangling-node mass is redistributed uniformly, the
    classic formulation — NOT GraphX's lossy variant).

        rank'(v) = (1−d)/N + d·( Σ_{u→v} rank(u)/outdeg(u)
                                 + dangling_mass/N )

    Plan shape per round: ranks ⋈ cached (src, dst, out_degree) edges
    on src → groupBy(dst).sum — two shuffles, both keyed by node ids
    (AQE coalescing applies); the dangling mass is a single-row
    aggregate cross-broadcast back into the update, keeping the whole
    round one job with no driver-side scalar collect.  Ranks are
    localCheckpoint-ed per round so the k-round lineage never stacks.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(
        F.col(src_column).alias("src"), F.col(dst_column).alias("dst")
    )
    if dedupe_edges:
        e = e.dropDuplicates(["src", "dst"])
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # out-degree folded onto the edge table ONCE; this is the relation
    # every round re-joins, so it is persisted (and the per-round join
    # reuses the same node-keyed exchange)
    out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    e_deg = e.join(out_d, "src").persist()
    nodes = nodes.persist()
    n = nodes.count()  # also materializes the persists' lineage root
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    dangling = nodes.join(out_d, nodes["node"] == out_d["src"], "left_anti")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # single-row aggregate, hash-broadcast into every partition:
        # the in-plan replacement for a driver-side scalar collect
        dm = F.broadcast(
            dangling.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(dm)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling_mass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    *,
    n_iter: int = 10,
    damping: float = 0.85,
    round_digits: int = 6,
) -> str:
    """ANSI-SQL replay of :func:`pagerank` with the iterations UNROLLED
    as nested CTE levels (DuckDB/Postgres forbid aggregates inside a
    recursive CTE's recursive term).  ``edges_sql`` must yield columns
    (src, dst).  Returns (node, rank) with rank rounded to
    ``round_digits`` — pair it with the same rounding on the Spark
    side for the value-hash comparison."""
    d = damping
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS out_degree FROM e GROUP BY src)",
        (
            "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"
        ),
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"r{i}"
        parts.append(
            f"{cur} AS (SELECT nodes.node, "
            f"(1.0 - {d}) / (SELECT n FROM nn) + {d} * ("
            f"COALESCE(c.contrib, 0) + "
            f"(SELECT COALESCE(SUM(r.rank), 0) FROM {prev} r "
            f"LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"
            f" / (SELECT n FROM nn)) AS rank "
            f"FROM nodes LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.rank / deg.out_degree) AS contrib "
            f"FROM {prev} r JOIN e ON r.node = e.src "
            f"JOIN deg ON e.src = deg.src GROUP BY e.dst"
            f") c ON nodes.node = c.node)"
        )
        prev = cur
    parts_sql = ",\n".join(parts)
    return (
        f"{parts_sql}\n"
        f"SELECT node, ROUND(rank, {round_digits}) AS rank FROM {prev}"
    )
