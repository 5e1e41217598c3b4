"""Graph analytics: weighted PageRank over the customer→supplier
trade graph, aggregated from lineitem.

[beyond-reference] third iterative operator (after k-means and
connected components), and the standard web-scale quality-weighting
primitive a training-data pipeline uses to score crawl domains: rank
nodes of a link graph, then weight/sample documents by the rank of
their source. Here the "link graph" is nations trading with nations
(customer nation → supplier nation, edge weight = number of line
items), so the whole surface is oracled exactly.

Determinism contract (full DuckDB oracle despite being iterative —
same recipe as llm/kmeans.py):
- edge weights are exact integer counts; out-weight sums are integer;
- the only float inputs are the damping constants, written as the
  same decimal literals in both engines (identical IEEE doubles);
- ranks are ROUNDED to 6 dp after each iteration, so the
  aggregation-order drift of the ≤25-term inflow sums dies at the
  round;
- fixed iteration count, unrolled as CTE rounds in the SQL oracle.

Scale: the expensive part is building the edge list — a
lineitem⋈orders⋈customer⋈supplier join that partially aggregates
map-side and shuffles only (src, dst) pairs. The iteration then runs
on the aggregated graph, which is tiny here (≤625 edges) and in the
web-graph case is still orders of magnitude smaller than the corpus;
each step is one broadcast join + one groupBy, driver-controlled
with checkpointed lineage (no unbounded plan growth). At 100 TB the
rank loop's cost is independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..memo import register_memo
from pyspark.sql import functions as F

from .base import load, tables

N_NATIONS = 25
DAMPING = 0.85
BASE = 0.006  # (1 - DAMPING) / N_NATIONS, written as a plain literal
INIT_RANK = 0.04  # 1 / N_NATIONS
ITERATIONS = 3


_TRADE_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=customer nation, dst=supplier nation, w=lineitem count) —
    the ≤|nations|²-row trade graph, materialized once per (corpus,
    app): the 4-table join behind it is the whole cost of BOTH
    consumers (PageRank and the recursive-CTE reach), so they share
    one checkpoint the way the co-purchase faces share the edge
    memo."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _TRADE_CACHE.get(key)
    if cached is not None:
        return cached
    out = _build_trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    _TRADE_CACHE[key] = out
    return out


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uncheckpointed 4-table build plan (plan-asserted in
    tests/test_graph.py: map-side partial aggregation before the
    (src, dst) shuffle, broadcast supplier dim)."""
    lineitem, orders, customer, supplier = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier"
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation PageRank after 3 damped iterations over the trade graph."""
    nation = tables(spark, sf_dir, "nation")[0]
    edges = _trade_edges(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    # edge transition weights never change across iterations
    trans = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("p"))
        # lazy: materializes inside iteration 1's inflow job and is
        # reused by the later iterations (one fewer driver barrier)
        .localCheckpoint(eager=False)
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ranks = nodes.select("node", F.lit(INIT_RANK).alias("r"))
    for _ in range(ITERATIONS):
        inflow = (
            trans.join(F.broadcast(ranks), F.col("node") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                F.round(
                    F.lit(BASE) + F.lit(DAMPING) * F.coalesce(F.col("inflow"), F.lit(0.0)), 6
                ).alias("r"),
            )
            # lazy: each ranks relation is consumed exactly once (the
            # next iteration's broadcast build, or the final join) —
            # the eager variant paid a separate materialization job
            # per iteration (guide §1.2)
            .localCheckpoint(eager=False)
        )
    return (
        nation.join(ranks, F.col("node") == F.col("n_nationkey"))
        .select("n_nationkey", "n_name", F.col("r").alias("pagerank"))
        .orderBy("n_nationkey")
    )


def _sql_iter(prev: str, name: str) -> str:
    return f"""
{name}_in AS (
  SELECT t.dst, sum({prev}.r * t.p) AS inflow
  FROM t JOIN {prev} ON {prev}.node = t.src
  GROUP BY t.dst
),
{name} AS (
  SELECT nodes.node,
         round({BASE}::DOUBLE + {DAMPING}::DOUBLE * coalesce({name}_in.inflow, 0.0), 6) AS r
  FROM nodes LEFT JOIN {name}_in ON {name}_in.dst = nodes.node
)"""


_PAGERANK_SQL = f"""
WITH e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w)::BIGINT AS wout FROM e GROUP BY src),
t AS (SELECT e.src, e.dst, e.w / outw.wout AS p FROM e JOIN outw ON outw.src = e.src),
nodes AS (SELECT n_nationkey AS node FROM nation),
r0 AS (SELECT node, {INIT_RANK}::DOUBLE AS r FROM nodes),
{_sql_iter('r0', 'r1')},
{_sql_iter('r1', 'r2')},
{_sql_iter('r2', 'r3')}
SELECT n.n_nationkey, n.n_name, r3.r AS pagerank
FROM nation n JOIN r3 ON r3.node = n.n_nationkey
ORDER BY n.n_nationkey
"""


REACH_DEPTH = 4
TOP_LANES = 2


def recursive_cte_trade_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability over the top-trade-lane graph written
    as a TRUE ``WITH RECURSIVE`` CTE — Spark 4.1's recursive-CTE
    support (UNION ALL form), the declarative twin of the iterative-
    fixpoint faces ([[bfs_levels_from_hub]] materializes frontiers by
    hand; this hands the SAME semantics to the engine). Graph: each
    nation keeps its TOP_LANES highest-volume supplier nations
    (w desc, dst tiebreak — deterministic), giving a sparse directed
    graph where reachability is non-trivial; the walk starts at
    nation 0 and the recursive term is depth-bounded (dist <
    REACH_DEPTH), which also makes the cyclic graph terminate — path
    fanout is ≤ TOP_LANES^REACH_DEPTH rows, the bounded case.

    The edge relation is passed to ``spark.sql`` as a DataFrame
    parameter (no temp-view name pollution). DuckDB runs the
    byte-identical recursion — one of the few operator shapes where
    BOTH engines accept the same modern-SQL text."""
    nation = tables(spark, sf_dir, "nation")[0]
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.desc("w"), "dst")
    lanes = (
        _trade_edges(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_LANES)
        .select("src", "dst")
    )
    reach = spark.sql(
        f"""
WITH RECURSIVE reach(node, dist) AS (
  SELECT 0, 0
  UNION ALL
  SELECT t.dst, r.dist + 1
  FROM reach r JOIN {{lanes}} t ON t.src = r.node
  WHERE r.dist < {REACH_DEPTH}
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM reach GROUP BY node
""",
        lanes=lanes,
    )
    return (
        reach.join(nation, F.col("n_nationkey") == F.col("node"))
        .select("n_nationkey", "n_name", "dist")
        .orderBy("dist", "n_nationkey")
    )


_REACH_SQL = f"""
WITH RECURSIVE tw AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
lanes AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM tw
  ) WHERE rn <= {TOP_LANES}
),
reach(node, dist) AS (
  SELECT 0, 0
  UNION ALL
  SELECT t.dst, r.dist + 1
  FROM reach r JOIN lanes t ON t.src = r.node
  WHERE r.dist < {REACH_DEPTH}
)
SELECT n.n_nationkey, n.n_name, CAST(min(r.dist) AS BIGINT) AS dist
FROM reach r JOIN nation n ON n.n_nationkey = r.node
GROUP BY 1, 2
ORDER BY dist, n_nationkey
"""


def harmonic_centrality_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality over the top-trade-lane graph — "which
    nation can reach the trade network fastest" — C(v) = Σ_{u≠v} 1/d(v,u),
    the centrality that stays well-defined on DISCONNECTED graphs
    (closeness breaks; unreachable nodes simply contribute 0).
    All-pairs BFS as ONE ``WITH RECURSIVE`` walk seeded from every
    nation ([[recursive_cte_trade_reach]] walks from nation 0; this
    is its all-sources generalization), scored in exact integer
    per-mille: Σ (1000 div d) — no float reciprocals.

    Scale: the lanes graph is the ≤|nations|·TOP_LANES relation the
    whole trade family shares; the recursion's path fanout is bounded
    by |nations|·TOP_LANES^REACH_DEPTH — the documented bounded case.
    On a big graph the same query runs unchanged; the depth bound is
    the knob."""
    nation = tables(spark, sf_dir, "nation")[0]
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.desc("w"), "dst")
    lanes = (
        _trade_edges(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_LANES)
        .select("src", "dst")
    )
    harm = spark.sql(
        f"""
WITH RECURSIVE walk(root, node, dist) AS (
  SELECT n_nationkey, n_nationkey, 0 FROM {{nation}}
  UNION ALL
  SELECT w.root, t.dst, w.dist + 1
  FROM walk w JOIN {{lanes}} t ON t.src = w.node
  WHERE w.dist < {REACH_DEPTH}
),
sp AS (SELECT root, node, min(dist) AS d FROM walk GROUP BY root, node)
SELECT root,
       CAST(count(CASE WHEN node <> root THEN 1 END) AS BIGINT) AS n_reached,
       CAST(coalesce(sum(CASE WHEN node <> root THEN 1000 div d END), 0)
            AS BIGINT) AS harmonic_x1000
FROM sp GROUP BY root
""",
        nation=nation.select("n_nationkey"),
        lanes=lanes,
    )
    return (
        harm.join(nation, F.col("n_nationkey") == F.col("root"))
        .select("n_nationkey", "n_name", "n_reached", "harmonic_x1000")
        .orderBy(F.desc("harmonic_x1000"), "n_nationkey")
    )


_HARMONIC_SQL = f"""
WITH RECURSIVE tw AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
lanes AS (
  SELECT src, dst FROM (
    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM tw
  ) WHERE rn <= {TOP_LANES}
),
walk(root, node, dist) AS (
  SELECT n_nationkey, n_nationkey, 0 FROM nation
  UNION ALL
  SELECT w.root, t.dst, w.dist + 1
  FROM walk w JOIN lanes t ON t.src = w.node
  WHERE w.dist < {REACH_DEPTH}
),
sp AS (SELECT root, node, min(dist) AS d FROM walk GROUP BY root, node)
SELECT n.n_nationkey, n.n_name,
       CAST(count(CASE WHEN node <> root THEN 1 END) AS BIGINT) AS n_reached,
       CAST(coalesce(sum(CASE WHEN node <> root THEN 1000 // d END), 0)
            AS BIGINT) AS harmonic_x1000
FROM sp JOIN nation n ON n.n_nationkey = sp.root
GROUP BY 1, 2
ORDER BY harmonic_x1000 DESC, n_nationkey
"""


def bipartite_hits_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority scoring on the user↔event-type bipartite
    graph, carried as EXACT PATH COUNTS instead of normalized floats:
    with hubs initialized to 1, authority a₁(t) = deg(t), hub
    h₁(u) = Σ_{t∋u} a₁(t), authority a₂(t) = Σ_{u∋t} h₁(u) — i.e.
    a₂ counts length-3 paths t→u→t'→u' through the incidence
    structure. Per-iteration normalization is a positive scalar, so
    the RANKING equals textbook HITS iteration-2 exactly while every
    number stays integral (the [[pagerank_trade_graph]] trick taken
    further: no rounding contract needed at all). High a₂/deg ratio =
    the event types co-engaged by the most promiscuous users.

    Scale: one distinct over (user, type) — the same rollup any
    engagement metric pays; a₁ lives on the tiny type relation
    (broadcast); h₁ is a user-keyed rollup; a₂ re-joins edges to h₁
    hash-partitioned on user_id. Nothing iterates driver-side and no
    per-user state exceeds its edge count; hub sums widen to
    DECIMAL(38,0) (path counts are products of degrees — 10¹⁸ wraps
    at web scale)."""
    edges = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a1 = edges.groupBy("event_type").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        edges.join(F.broadcast(a1), "event_type")
        .groupBy("user_id")
        .agg(F.sum(F.col("a1").cast("decimal(38,0)")).alias("h1"))
    )
    a2 = (
        edges.join(h1, "user_id")
        .groupBy("event_type")
        .agg(F.sum("h1").alias("a2"))
    )
    return (
        a1.join(a2, "event_type")
        .select(
            "event_type",
            F.col("a1").cast("bigint").alias("n_users"),
            F.expr("CAST(a2 AS BIGINT)").alias("paths3"),
            F.expr("CAST(a2 div a1 AS BIGINT)").alias("paths3_per_user"),
        )
        .orderBy(F.desc("paths3"), "event_type")
    )


_HITS_SQL = """
WITH edges AS (SELECT DISTINCT user_id, event_type FROM events),
a1 AS (SELECT event_type, count(*)::BIGINT AS a1 FROM edges GROUP BY 1),
h1 AS (
  SELECT user_id, sum(a1::HUGEINT) AS h1
  FROM edges JOIN a1 USING (event_type) GROUP BY 1
),
a2 AS (
  SELECT event_type, sum(h1) AS a2
  FROM edges JOIN h1 USING (user_id) GROUP BY 1
)
SELECT event_type, a1 AS n_users,
       CAST(a2 AS BIGINT) AS paths3,
       CAST(a2 // a1 AS BIGINT) AS paths3_per_user
FROM a1 JOIN a2 USING (event_type)
ORDER BY paths3 DESC, event_type
"""


QUERIES = {
    "pagerank_trade_graph": pagerank_trade_graph,
    "recursive_cte_trade_reach": recursive_cte_trade_reach,
    "bipartite_hits_event_types": bipartite_hits_event_types,
    "harmonic_centrality_trade": harmonic_centrality_trade,
}
ORACLES = {
    "harmonic_centrality_trade": _HARMONIC_SQL,
    "pagerank_trade_graph": _PAGERANK_SQL,
    "recursive_cte_trade_reach": _REACH_SQL,
    "bipartite_hits_event_types": _HITS_SQL,
}
