"""Graph analytics DataFrame-first — PageRank over a derived trade graph.

Reference anchor: the reference ships GraphX (graphx/.../lib/PageRank.scala
:158 runWithOptions — Pregel-style iterate) and its connected-components
(ConnectedComponents.scala); this engine expresses both relationally
(components: dedup/components.py; PageRank: here) — edges are a DataFrame,
one power iteration is join + groupBy, and the iteration count is a fixed
unroll so the DuckDB oracle can replay it exactly.

Scale: the per-iteration shuffle is keyed on dst (contribution aggregation)
over the EDGE relation — O(|E|) per round like Pregel; rank and out-weight
tables are O(|V|) and broadcast when V is small (here 25 nations; at 100 TB
vertex-side joins shuffle-partition on the vertex key instead). Driver only
unrolls the loop — no data collects. Long chains would localCheckpoint
every few rounds (see dedup/components.py); at 3 rounds lineage is shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

PR_DAMPING = 0.85
PR_ITERS = 3


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): supplier-nation → customer-nation edge weighted by the
    number of lineitems shipped between them (the q7 join shape)."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.alias("sn")), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(F.broadcast(n.alias("cn")), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .select(
            F.col("sn.n_name").alias("src"), F.col("cn.n_name").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    truncate_lineage: bool = False,
) -> DataFrame:
    """Weighted PageRank, `iters` unrolled power iterations:

        pr_{t+1}(j) = (1−d)/N + d · Σ_{i→j} pr_t(i) · w_ij / W_i

    nodes: (node); edges: (src, dst, w). Returns (node, pr) unrounded —
    callers round at presentation.

    The normalized edge relation is always materialized once (it is reused
    by every round); ``truncate_lineage=True`` additionally localCheckpoints
    the rank table after each iteration, so
    the final plan is O(1) nodes instead of O(iters·nodes) — the lineage
    discipline of iterative algorithms in the reference's GraphX/mllib
    (Pregel.scala materializes messages each superstep;
    mllib/.../clustering/KMeans.scala). Off by default: the oracle-checked
    query replays the exact unrolled plan, and at iters≤3 lineage is
    shallow; at real graph scale (tens of rounds) turn it on — asserted
    O(1)-per-iteration in tests/test_plans.py."""
    n_nodes = nodes.count()  # bounded: the vertex universe of a dimension
    outw = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("w_out")).alias("p_edge")
    )
    # r12: the normalized edge relation is consumed by EVERY iteration —
    # materialize it once (the Pregel/GraphX message-relation discipline)
    # so the rounds iterate over an O(|E|) in-memory relation instead of
    # re-planning the upstream edge-building join chain under each round.
    # Values unchanged (same relation); measured 1.33 → 1.23s at sf0.1 on
    # graph_pagerank_nations, and the win grows with iters.
    e = e.localCheckpoint(eager=True)
    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p_edge")).alias("mass"))
        )
        pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("pr"),
        )
        if truncate_lineage:
            pr = pr.localCheckpoint(eager=True)
    return pr


_PR_EDGE_CTE = """
    edges AS (
      SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      GROUP BY sn.n_name, cn.n_name
    ),
    nodes AS (SELECT n_name AS node FROM nation),
    nn AS (SELECT count(*) AS n FROM nodes),
    e AS (
      SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p_edge FROM edges
    )
"""


def _pr_iter_cte(i: int, prev: str, damping: float) -> str:
    return f"""
    c{i} AS (
      SELECT dst, sum(pr * p_edge) AS mass
      FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY dst
    ),
    p{i} AS (
      SELECT node,
             (1 - {damping}) / nn.n + {damping} * coalesce(mass, 0) AS pr
      FROM nodes LEFT JOIN c{i} ON node = dst CROSS JOIN nn
    )"""


def _pagerank_oracle(iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    sql = "WITH" + _PR_EDGE_CTE.rstrip()
    sql += ",\n    p0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"
    prev = "p0"
    for i in range(1, iters + 1):
        sql += "," + _pr_iter_cte(i, prev, damping)
        prev = f"p{i}"
    sql += f"\n    SELECT node, round(pr, 6) AS pr FROM {prev}"
    return sql


@query("graph_pagerank_nations", oracle=_pagerank_oracle())
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (reference GraphX PageRank.scala:158) on the supplier→
    customer nation trade graph, 3 unrolled weighted power iterations,
    damping 0.85 — (node, pr) for all 25 nations."""
    nodes = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("node"))
    edges = trade_edges(spark, sf_dir)
    pr = pagerank(nodes, edges)
    return pr.select("node", F.round("pr", 6).alias("pr"))


@query(
    "graph_triangle_count",
    oracle="""
    WITH d AS (
      SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    ),
    u AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM d WHERE src <> dst
    )
    SELECT count(*) AS n_triangles
    FROM u e1 JOIN u e2 ON e1.b = e2.a JOIN u e3
      ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (reference GraphX TriangleCount.scala:54) on the
    undirected nation trade graph: canonical a<b edges, the two-hop join
    closed by an (a,c) edge — each triangle counted once via the a<b<c
    ordering the canonical edges induce.

    Scale: |E|^(3/2)-bounded via the ordered-edge join (the standard
    relational triangle algorithm); every join keys on a vertex, so the
    shuffles partition by vertex id — no broadcast of the full edge set
    required at scale (here the 25-node edge list broadcasts anyway)."""
    d = trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    u = (
        d.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e1 = u.alias("e1")
    e2 = u.alias("e2")
    e3 = u.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
