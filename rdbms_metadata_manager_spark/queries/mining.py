"""Pattern mining + distribution drift over the warehouse tables.

[beyond-reference] three analytics shapes the reference has no
counterpart for, each expressed shuffle-minimally:

- ``copurchase_part_pairs`` — market-basket pair counting: parts
  bought together in one order. The per-order item list is first
  DISTINCT-ed (one order buying part X twice is one basket
  membership), then self-joined within the order with ``p1 < p2``
  so each unordered pair appears once. Fanout per order is
  C(items, 2) with items bounded by the basket size (≤7 in TPC-H
  shape) — the classic a-priori guard: at 100 TB you additionally
  cap basket size before pairing (a mega-basket of 10⁴ items would
  emit 5·10⁷ pairs); the cap is applied here structurally so the
  plan survives adversarial baskets. Top-k via TakeOrderedAndProject.

- ``copurchase_triangles`` — triangle counting over the co-purchase
  graph, in the degree-oriented form (orient every edge from the
  endpoint with smaller (degree, id) to the larger; count wedges at
  the small end and close them against oriented edges). This is the
  MR-standard algorithm (Suri & Vassilvitskii, WWW'11): orientation
  bounds every node's out-degree by O(sqrt(E)), so the wedge join is
  O(E^1.5) worst-case instead of quadratic in the max degree —
  *the* difference between surviving a power-law graph at scale and
  not. The oracle counts the same triangles by plain id-ordered
  triple join (a < b < c), which is correct but not the scale shape.

- ``drift_event_type_shares`` — distribution drift between the early
  and late half of the event stream (split at the exact median
  timestamp): per-type per-mille share in each half and the absolute
  drift. The report an ingest pipeline watches to catch a source
  changing under it. All-integer arithmetic (micros epoch, integer
  div shares) — exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..memo import register_memo
from pyspark.sql import functions as F

from .base import load

TOP_PAIRS = 20
MAX_BASKET = 50  # a-priori fanout guard: C(50,2) ≈ 1.2k pairs max per order


# Materialized-once basket relation, keyed by (corpus dir, Spark app
# id): SEVEN graph/mining operators start from the same expensive
# groupBy+pair-explode, exactly the "edge list is a cached table"
# layout a cluster deployment uses. The app-id key stops a DataFrame
# whose context died from being served to a new session. The value is
# an eagerly localCheckpoint-ed DataFrame — deterministic content, so
# a hit changes nothing downstream.
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ordered within-order part pairs (part_a < part_b), one row
    per (order, pair) — the market-basket kernel shared by the pair
    counter, the triangle counter, k-core, LPA, BFS, and the rule
    miner; materialized once per corpus (module cache above).

    Shape: ONE groupBy(l_orderkey) with collect_set (dedup folded
    into the aggregation — no separate DISTINCT shuffle), a size cap
    (the a-priori fanout guard), then C(n,2) pair emission JVM-side
    via nested transform/flatten inside whole-stage codegen.  No
    self-join: the aliased-join form paid a second shuffle and
    computed the basket relation twice."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
    )
    out = (
        baskets.select(
            "l_orderkey",
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p"),
        )
        .select("l_orderkey", "p.part_a", "p.part_b")
        .localCheckpoint(eager=True)
    )
    _PAIRS_CACHE[key] = out
    return out


_EDGES_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (a < b) co-purchase edge list — the graph
    kernel ALL eight graph operators start from, materialized once
    per (corpus, Spark app) like the basket pairs beneath it (each
    operator used to re-run the distinct + checkpoint on every
    call)."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    out = (
        _basket_pairs(spark, sf_dir)
        .select(F.col("part_a").alias("a"), F.col("part_b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    _EDGES_CACHE[key] = out
    return out


_DEGREES_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _node_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree ``(n, deg)`` of the full co-purchase edge list,
    materialized once per (corpus, Spark app). Six graph reports
    (triangle summary, clustering coefficients, degree histogram,
    SCAN similarity, assortativity, rich club) each rebuilt this
    union+groupBy over the memoized edges — and several consume it
    through TWO renamed broadcast builds per cycle, so the aggregate
    ran up to three times per invocation (guide §1.2). ~|V| rows."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _DEGREES_CACHE.get(key)
    if cached is not None:
        return cached
    e = _copurchase_edges(spark, sf_dir)
    out = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    _DEGREES_CACHE[key] = out
    return out


_TRIPLES_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def _edge_triangle_triples(e: DataFrame) -> DataFrame:
    """Each triangle of the undirected edge set ``e`` exactly once as
    (src, dst, w): degree-oriented adjacency intersection (Suri &
    Vassilvitskii) — out-neighborhoods O(sqrt E), no wedge set. The
    per-round k-truss support reuses this on shrinking edge sets."""
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(F.struct(F.col("b").alias("src"), F.col("a").alias("dst")))
            .alias("o")
        )
        .select("o.src", "o.dst")
        # checkpoint: ed feeds BOTH the adjacency build and the probe
        # join — without it the e⋈deg orientation subtree runs twice
        # (measured 7.5 s -> ~3 s at sf0.1 when this was first added)
        .localCheckpoint(eager=True)
    )
    adj = ed.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    return (
        ed.join(F.broadcast(adj.select(F.col("src"), F.col("nbrs").alias("n_src"))), "src")
        .join(
            F.broadcast(adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("n_dst"))),
            "dst",
        )
        .select("src", "dst", F.explode(F.array_intersect("n_src", "n_dst")).alias("w"))
    )


def _triangle_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full graph's triangle triples, materialized once per
    (corpus, Spark app): the triangle COUNT (copurchase_triangles),
    the per-corner charges (local_clustering_coefficients), and
    k-truss round 1 all read this one ~#triangles-row relation
    instead of re-running the oriented intersection."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _TRIPLES_CACHE.get(key)
    if cached is not None:
        return cached
    out = _edge_triangle_triples(_copurchase_edges(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    _TRIPLES_CACHE[key] = out
    return out



def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _basket_pairs(spark, sf_dir).select("part_a", "part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(TOP_PAIRS)
    )


_PAIRS_SQL = f"""
WITH b AS (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM b a JOIN b b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {TOP_PAIRS}
"""


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the memoized edge list + triangle-triple
    relation (one row per triangle, enumerated once at its
    orientation apex — see ``_edge_triangle_triples`` for the
    degree-oriented adjacency-intersection kernel and its O(E^1.5)
    bound). The triple relation is shared with the clustering-
    coefficient histogram and k-truss round 1, so the expensive
    intersection pass runs once per corpus, not once per report."""
    e = _copurchase_edges(spark, sf_dir)
    tri = _triangle_triples(spark, sf_dir)
    deg_nodes = _node_degrees(spark, sf_dir)
    n_nodes = deg_nodes.agg(F.count("*").alias("c"))
    n_edges = e.agg(F.count("*").alias("c"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("c"))
    return (
        n_nodes.select(F.col("c").alias("n_nodes"))
        .join(n_edges.select(F.col("c").alias("n_edges")))
        .join(n_tri.select(F.col("c").alias("n_triangles")))
    )


_TRI_SQL = f"""
WITH b AS (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
nodes AS (SELECT count(*) AS n_nodes FROM (SELECT a AS n FROM e UNION SELECT b FROM e)),
edges AS (SELECT count(*) AS n_edges FROM e),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_nodes, n_edges, n_triangles FROM nodes, edges, tri
"""


def local_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering-coefficient histogram over the co-purchase
    graph: for every node with degree ≥ 2, C(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)), bucketed in per-cent — the
    community-structure fingerprint (random graphs sit at C ≈ edge
    density; real co-purchase graphs show a fat high-C tail of
    tightly-bundled product kits).

    Per-vertex triangle counts come from the SAME degree-oriented
    adjacency-intersection kernel as ``copurchase_triangles``, but
    EXPLODING the intersection elements instead of summing sizes:
    each triangle surfaces exactly once (at its orientation apex) as
    (u, v, w) and charges all three corners. Work is O(Σ intersection
    sizes) = O(#triangles) on top of the oriented O(E^1.5) bound —
    no wedge materialization. C(v) is kept integer (per-mille then
    per-cent bucket), so both engines bucket identically; the oracle
    recounts triangles by the id-ordered triple join (correct but
    not the scale shape) over MATERIALIZED CTEs.

    Scale: rides the memoized ``_basket_pairs`` kernel; the adjacency
    broadcast carries Σ|N+| = |E| longs — on a graph too big for
    that, the same plan runs as two O(E)-row shuffle joins."""
    e = _copurchase_edges(spark, sf_dir)
    deg = _node_degrees(spark, sf_dir)
    corners = _triangle_triples(spark, sf_dir)
    charges = (
        corners.select(F.col("src").alias("v"))
        .unionAll(corners.select(F.col("dst").alias("v")))
        .unionAll(corners.select(F.col("w").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    per_v = (
        deg.filter(F.col("deg") >= 2)
        .join(charges.withColumnRenamed("v", "n"), "n", "left")
        .select("n", "deg", F.coalesce("t", F.lit(0).cast("long")).alias("t"))
    )
    return (
        per_v.select(
            F.expr("(2000 * t div (cast(deg AS BIGINT) * (deg - 1))) div 10").alias(
                "coef_bucket_pct"
            ),
            "deg",
            "t",
        )
        .groupBy("coef_bucket_pct")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("sum_deg"),
            F.sum("t").alias("sum_triangles"),
        )
        .orderBy("coef_bucket_pct")
    )


_LCC_SQL = f"""
WITH b AS (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e AS MATERIALIZED (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
tri AS MATERIALIZED (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcounts AS (
  SELECT v, count(*) AS t
  FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY v
),
deg AS (
  SELECT n, count(*) AS deg
  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
  GROUP BY n
),
per_v AS (
  SELECT n, deg, coalesce(t, 0) AS t
  FROM deg LEFT JOIN tcounts ON tcounts.v = deg.n
  WHERE deg >= 2
)
SELECT ((2000 * t // (deg * (deg - 1))) // 10)::BIGINT AS coef_bucket_pct,
       count(*) AS n_nodes,
       sum(deg)::BIGINT AS sum_deg,
       sum(t)::BIGINT AS sum_triangles
FROM per_v
GROUP BY 1
ORDER BY coef_bucket_pct
"""


# Power-of-two degree buckets; the open top bucket catches hubs.
DEG_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


def copurchase_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-binned degree distribution of the co-purchase graph — the
    first QA plot of any graph pipeline (a power-law tail here is
    what makes the degree-oriented triangle kernel necessary; a
    missing tail means the broadcast-adjacency plan is safe). Per
    power-of-two bucket: node count and total degree mass. Rides the
    memoized basket-pair kernel + one groupBy; the bucket edges are a
    literal integer CASE chain (no libm log2)."""
    e = _copurchase_edges(spark, sf_dir)
    deg = _node_degrees(spark, sf_dir)
    edges = list(DEG_BUCKETS)
    bucket = F.lit(edges[-1])
    for lo, hi in zip(reversed(edges[:-1]), reversed(edges[1:])):
        bucket = F.when(F.col("deg") < hi, F.lit(lo)).otherwise(bucket)
    return (
        deg.select(bucket.alias("deg_bucket_lo"), "deg")
        .groupBy("deg_bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("deg").alias("sum_deg"))
        .orderBy("deg_bucket_lo")
    )


def _deg_bucket_sql(col: str) -> str:
    edges = list(DEG_BUCKETS)
    branches = "".join(
        f"WHEN {col} < {hi} THEN {lo} " for lo, hi in zip(edges[:-1], edges[1:])
    )
    return f"CASE {branches}ELSE {edges[-1]} END"


_DEG_HIST_SQL = f"""
WITH b AS (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
deg AS (
  SELECT n, count(*) AS deg
  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
  GROUP BY n
)
SELECT {_deg_bucket_sql("deg")} AS deg_bucket_lo,
       count(*) AS n_nodes,
       sum(deg)::BIGINT AS sum_deg
FROM deg
GROUP BY 1
ORDER BY deg_bucket_lo
"""


def drift_event_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "event_type"
    )
    med = ev.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY us)").alias("med_us")
    )
    tagged = ev.join(F.broadcast(med)).select(
        "event_type", (F.col("us") <= F.col("med_us")).alias("early")
    )
    counts = tagged.groupBy("event_type").agg(
        F.count_if(F.col("early")).alias("early_n"),
        F.count_if(~F.col("early")).alias("late_n"),
    )
    totals = tagged.agg(
        F.count_if(F.col("early")).alias("early_total"),
        F.count_if(~F.col("early")).alias("late_total"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "event_type",
            F.expr("early_n * 1000 div early_total").alias("early_pm"),
            F.expr("late_n * 1000 div late_total").alias("late_pm"),
            F.expr("abs(early_n * 1000 div early_total - late_n * 1000 div late_total)").alias(
                "drift_pm"
            ),
        )
        .orderBy("event_type")
    )


_DRIFT_SQL = """
WITH ev AS (SELECT epoch_us(ts) AS us, event_type FROM events),
med AS (SELECT quantile_disc(us, 0.5) AS med_us FROM ev),
tagged AS (SELECT event_type, us <= med_us AS early FROM ev, med),
counts AS (
  SELECT event_type,
         count(*) FILTER (WHERE early) AS early_n,
         count(*) FILTER (WHERE NOT early) AS late_n
  FROM tagged GROUP BY 1
),
totals AS (
  SELECT count(*) FILTER (WHERE early) AS early_total,
         count(*) FILTER (WHERE NOT early) AS late_total
  FROM tagged
)
SELECT event_type,
       early_n * 1000 // early_total AS early_pm,
       late_n * 1000 // late_total AS late_pm,
       abs(early_n * 1000 // early_total - late_n * 1000 // late_total) AS drift_pm
FROM counts, totals
ORDER BY event_type
"""


def skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) of customers over
    (order count, biggest single order): a customer is on the skyline
    iff no other customer has ≥ on both axes with > on at least one
    (Börzsönyi et al., ICDE'01 "The Skyline Operator"). The axes are
    anti-correlated (one-off big spenders vs frequent small buyers),
    so the frontier is non-degenerate — lifetime-total as the second
    axis collapses it to the single best customer.

    Spark-first shape: instead of the quadratic dominance anti-join
    (the oracle's NOT EXISTS), reduce per-axis — group customers by
    n_orders, keep each group's max spend (a dominated-within-group
    kill), then a running max over the groups sorted by n_orders DESC
    gives the best spend among all STRICTLY-higher order counts.
    p is dominated iff that running max ≥ p.spend (a higher-count
    customer at least ties spend), or p's own group max > p.spend
    (same count, strictly richer). O(n) shuffle + a window over the
    DISTINCT n_orders values only — n_orders cardinality is tiny
    (bounded by max orders per customer), so the single-partition
    window holds ~hundreds of rows even at 100 TB; a continuous
    first axis would be range-bucketed first. Spend is exact bigint
    cents (float-aggregate trap: sum(double) is order-dependent)."""
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5)
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max(cents).alias("best_order_cents"),
    )
    gmax = per.groupBy("n_orders").agg(F.max("best_order_cents").alias("gmax"))
    from .prefix import one_group

    # distinct n_orders values only — bounded cardinality per docstring
    wg = (
        Window.partitionBy(one_group(F.col("n_orders")))
        .orderBy(F.desc("n_orders"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = gmax.withColumn("maxt_gt", F.max("gmax").over(wg))
    return (
        per.join(F.broadcast(frontier), "n_orders")
        .filter(
            ~(
                F.coalesce(F.col("maxt_gt") >= F.col("best_order_cents"), F.lit(False))
                | (F.col("gmax") > F.col("best_order_cents"))
            )
        )
        .select("o_custkey", "n_orders", "best_order_cents")
        .orderBy("o_custkey")
    )


_SKYLINE_SQL = """
WITH c AS (
  SELECT o_custkey, count(*) AS n_orders,
         max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS best_order_cents
  FROM orders GROUP BY 1
)
SELECT p.o_custkey, p.n_orders, p.best_order_cents
FROM c p
WHERE NOT EXISTS (
  SELECT 1 FROM c q
  WHERE q.n_orders >= p.n_orders AND q.best_order_cents >= p.best_order_cents
    AND (q.n_orders > p.n_orders OR q.best_order_cents > p.best_order_cents)
)
ORDER BY p.o_custkey
"""


def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto / ABC analysis) over customers:
    rank customers by exact-cents lifetime revenue, accumulate the
    running share in integer per-mille, and band A/B/C at the 800‰
    and 950‰ cuts. Everything is bigint (cents, running cents,
    per-mille via `div`), so the window cumsum is order-stable and
    engine-identical — a double cumsum would drift between engines
    under reordering.

    Scale: ONE per-customer rollup (map-side combined); the exact
    cumulative share then runs on the two-pass range kernel
    (``prefix.ranged_prefix``: B contiguous ranges, per-range local
    sums, B-row broadcast offsets) — with a billion customers no
    executor holds more than ~1/B of the rolled-up relation, and the
    output is bit-identical to the oracle's global window. Output is
    the per-band rollup: band, customers, revenue share."""
    from .prefix import ranged_prefix

    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5)
    per = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_cents"))
    total = per.agg(F.sum("rev_cents").alias("total_cents"))
    banded = (
        ranged_prefix(
            per,
            [F.desc("rev_cents"), F.col("o_custkey")],
            sum_cols=["rev_cents"],
        )
        .withColumnRenamed("cum_rev_cents", "cum_cents")
        .join(F.broadcast(total))
        .withColumn("cum_pm", F.expr("cum_cents * 1000 div total_cents"))
        .withColumn(
            "band",
            F.when(F.col("cum_pm") <= 800, "A")
            .when(F.col("cum_pm") <= 950, "B")
            .otherwise("C"),
        )
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev_cents").alias("band_cents"),
        )
        .orderBy("band")
    )


_PARETO_SQL = """
WITH per AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1
),
t AS (SELECT sum(rev_cents) AS total_cents FROM per),
banded AS (
  SELECT rev_cents,
         CASE WHEN cum_pm <= 800 THEN 'A'
              WHEN cum_pm <= 950 THEN 'B'
              ELSE 'C' END AS band
  FROM (
    SELECT rev_cents,
           sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1000 // total_cents AS cum_pm
    FROM per, t
  )
)
SELECT band, count(*)::BIGINT AS n_customers, sum(rev_cents)::BIGINT AS band_cents
FROM banded GROUP BY band ORDER BY band
"""


K_CORE_ROUNDS = 12


def kcore_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the co-purchase part graph (k=4):
    iteratively peel nodes of degree < k until the remaining subgraph
    is stable — the standard dense-subgraph extraction (community
    cores, spam/bot rings, "always bought together" clusters).

    Completes the iterative-graph family next to connected
    components (fixpoint label spread), PageRank (fixed-iteration
    scoring), and triangles (one-shot counting): peeling is the
    REMOVAL-until-fixpoint shape. Each round is one degree aggregate
    + two semi-joins on the shrinking edge list, localCheckpoint-ed
    so lineage stays flat; the loop exits early once the edge count
    is stable (every later round is a no-op). The oracle unrolls the
    SAME {K_CORE_ROUNDS} rounds as nested CTEs, so equality is exact
    whether or not the fixpoint landed earlier; a test asserts the
    fixpoint IS reached on the testdata, making the "k-core" label
    honest. Scale: work per round is O(current E); the edge list
    only shrinks, and rounds at 100 TB are the same count of jobs —
    the classic Pregel-style loop without needing a graph library."""
    e = _copurchase_edges(spark, sf_dir)
    # ONE action for both starting stats: each edge contributes
    # exactly two endpoint rows, so count(1) div 2 is the edge count
    # and countDistinct the node count — the separate count() +
    # distinct().count() pair paid two driver barriers (guide §1.2)
    st = (
        e.select(F.explode(F.array("a", "b")).alias("n"))
        .agg(
            F.expr("count(1) div 2").alias("ne"),
            F.countDistinct("n").alias("nn"),
        )
        .collect()[0]
    )
    n_edges, n_nodes = int(st.ne), int(st.nn)
    # half the mean degree, integer-exact in both engines:
    # ceil(E/N) = (E + N - 1) div N. Above ~3/4 of the mean this
    # graph's core cascades to empty (measured); half-mean keeps a
    # non-trivial core at every SF while still peeling the sparse rim.
    k_core = (n_edges + n_nodes - 1) // n_nodes if n_nodes else 0
    def peel(edges: DataFrame) -> DataFrame:
        deg = (
            edges.select(F.col("a").alias("n"))
            .unionAll(edges.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # lazy checkpoint: keep feeds TWO semi-join builds (a-side,
        # b-side rename) — each otherwise re-runs the round's degree
        # aggregate over the surviving edges (guide §1.2)
        keep = (
            deg.filter(F.col("deg") >= k_core)
            .select("n")
            .localCheckpoint(eager=False)
        )
        return (
            edges.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )

    # BATCHED peeling (VERDICT r9 item 7): TWO rounds built lazily per
    # driver action, both alive-counts folded into ONE tagged-union
    # collect — halves the per-round driver barriers (each lazy
    # checkpoint still computes exactly once inside that action; round
    # B reads round A's checkpointed rows). Peeling is monotone, so a
    # round computed past the fixpoint removes nothing and the batched
    # edge relation is row-identical to the one-round-at-a-time loop's;
    # the early exits below compare the same counts the old loop did.
    r = 0
    while r < K_CORE_ROUNDS and n_edges:
        rounds = min(2, K_CORE_ROUNDS - r)
        step_edges, legs = [], []
        cur = e
        for j in range(rounds):
            cur = peel(cur)
            step_edges.append(cur)
            legs.append(
                cur.agg(F.count(F.lit(1)).alias("c")).select(
                    F.lit(j).alias("i"), "c"
                )
            )
        combined = legs[0]
        for leg in legs[1:]:
            combined = combined.unionAll(leg)
        counts = {int(row["i"]): int(row["c"]) for row in combined.collect()}
        stable = None  # first round index whose count repeats = fixpoint
        if counts[0] == n_edges:
            stable = 0
        elif rounds == 2 and counts[1] == counts[0]:
            stable = 1
        if stable is not None:
            e, n_edges = step_edges[stable], counts[stable]
            break
        e, n_edges = step_edges[rounds - 1], counts[rounds - 1]
        r += rounds
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.agg(
        F.count(F.lit(1)).alias("n_core_nodes"),
        F.max("deg").alias("max_core_degree"),
    ).select(
        "n_core_nodes",
        F.lit(n_edges).cast("long").alias("n_core_edges"),
        "max_core_degree",
    )


_KCORE_EDGES_SQL = f"""
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM bk a JOIN bk b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
"""


def _kcore_oracle() -> str:
    ctes = [
        f"""bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)""",
        f"e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})",
        """kv AS MATERIALIZED (
  SELECT ((SELECT count(*) FROM e0) + nn - 1) // nn AS k
  FROM (SELECT count(DISTINCT n) AS nn
        FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0))
)""",
    ]
    for r in range(1, K_CORE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT n FROM (
    SELECT n, count(*) AS deg
    FROM (SELECT a AS n FROM e{p} UNION ALL SELECT b FROM e{p})
    GROUP BY n
  ) WHERE deg >= (SELECT k FROM kv)
)"""
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT a, b FROM e{p} WHERE a IN (SELECT n FROM d{r}) AND b IN (SELECT n FROM d{r}))"
        )
    last = f"e{K_CORE_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
fdeg AS (
  SELECT n, count(*) AS deg
  FROM (SELECT a AS n FROM {last} UNION ALL SELECT b FROM {last})
  GROUP BY n
)
SELECT (SELECT count(*) FROM fdeg) AS n_core_nodes,
       (SELECT count(*) FROM {last}) AS n_core_edges,
       (SELECT max(deg) FROM fdeg) AS max_core_degree
"""
    )


LPA_ROUNDS = 2
TOP_COMMUNITIES = 20


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (2 rounds) over the co-purchase
    part graph — frequency-based community detection, the missing
    member of the iterative-graph family next to connected components
    (reachability fixpoint), PageRank (score diffusion), and k-core
    (peeling): LPA spreads the MOST FREQUENT neighbor label, so it
    finds dense communities rather than mere connectivity. The
    deterministic variant: every node starts labeled with its own id;
    each round it adopts the neighbor label with the highest count,
    ties broken by smallest label — integer counts + total tie-break
    make the whole trajectory exact cross-engine, so the oracle
    unrolls the SAME two rounds as CTEs.

    Plan per round: one join of the bidirectional edge list (O(2E)
    rows) against the current V-sized label relation (auto-broadcast
    here; hash-shuffle on src at web scale — still O(E) per round),
    one (node, label) count aggregate, one per-node row_number
    window. Label state is localCheckpoint-ed so lineage stays flat
    across rounds — the Pregel superstep shape without a graph
    library. Output: the TOP_COMMUNITIES largest communities."""
    e = _copurchase_edges(spark, sf_dir)
    labels = _propagate_labels(e, LPA_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(TOP_COMMUNITIES)
    )


def _propagate_labels(edges: DataFrame, rounds: int) -> DataFrame:
    """Deterministic synchronous LPA core over an undirected (a, b)
    edge list → final (node, label). Testable on hand-built graphs."""
    both = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        both.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    w = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(rounds):
        labels = (
            both.join(labels, both["src"] == labels["node"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    return labels


def _lpa_oracle() -> str:
    ctes = [
        f"""bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)""",
        f"e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})",
        """bo AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM bo)",
    ]
    for r in range(1, LPA_ROUNDS + 1):
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT b.dst AS node, l.label,
           row_number() OVER (PARTITION BY b.dst
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM bo b JOIN l{r - 1} l ON b.src = l.node
    GROUP BY b.dst, l.label
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT label AS community, count(*) AS n_members
FROM l{LPA_ROUNDS}
GROUP BY label
ORDER BY n_members DESC, community ASC
LIMIT {TOP_COMMUNITIES}
"""
    )


MIN_SUPPORT = 3
TOP_RULES = 20


def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over the co-purchase baskets — the
    normalized successor to raw pair counting
    ([[copurchase_part_pairs]]): for each frequently co-bought pair,
    confidence in both directions (P(j|i), P(i|j)) and lift
    (observed co-rate over the independence expectation), all in
    integer per-mille so the ranking is exact cross-engine. The
    min-support floor is the classic guard against the
    rare-pair-lift explosion (co=1 singleton pairs otherwise
    dominate any lift ranking).

    Plan: the basket relation is built ONCE (one groupBy with the
    a-priori size cap), then feeds three thin aggregates — item
    support, pair support (JVM-side pair emission inside codegen, no
    self-join), and the 1-row basket count (broadcast scalar, not a
    collect). Joining supports onto the pair relation is two hash
    joins on the item key; per-mille integer products stay far from
    int64 range (1000·co·n ≤ 1e16 at sf100). Top rules via
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
        .localCheckpoint(eager=True)
    )
    items = baskets.select("l_orderkey", F.explode("parts").alias("part"))
    deg = items.groupBy("part").agg(F.count(F.lit(1)).alias("deg"))
    co = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= MIN_SUPPORT)
    )
    nb = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (
        co.join(deg.select(F.col("part").alias("part_a"), F.col("deg").alias("deg_a")), "part_a")
        .join(deg.select(F.col("part").alias("part_b"), F.col("deg").alias("deg_b")), "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "co",
            F.expr("(1000 * co) div deg_a").alias("conf_ab_permille"),
            F.expr("(1000 * co) div deg_b").alias("conf_ba_permille"),
            F.expr("(1000 * co * n_baskets) div (deg_a * deg_b)").alias("lift_permille"),
        )
        .orderBy(F.col("lift_permille").desc(), F.col("co").desc(), "part_a", "part_b")
        .limit(TOP_RULES)
    )


_RULES_SQL = f"""
WITH bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
deg AS (SELECT l_partkey AS part, count(*) AS deg FROM bk GROUP BY 1),
co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS co
  FROM bk a JOIN bk b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
),
nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM bk)
SELECT co.part_a, co.part_b, co.co,
       (1000 * co.co) // da.deg AS conf_ab_permille,
       (1000 * co.co) // db.deg AS conf_ba_permille,
       (1000 * co.co * nb.n_baskets) // (da.deg * db.deg) AS lift_permille
FROM co
JOIN deg da ON da.part = co.part_a
JOIN deg db ON db.part = co.part_b
CROSS JOIN nb
ORDER BY lift_permille DESC, co DESC, part_a, part_b
LIMIT {TOP_RULES}
"""




BFS_ROUNDS = 3


_ADJ_CACHE: dict[tuple[str, str], tuple[DataFrame, int]] = register_memo({})


def _bidir_adjacency(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, int]:
    """Grouped bidirectional adjacency of the co-purchase graph —
    one (node, sorted-neighbor-array) row per node — plus the node
    count, materialized once per (corpus, app) like the edge memo it
    derives from. The Pregel BFS faces scan THIS ~|V|-row relation
    per round instead of re-materializing and re-scanning the
    2·|E|-row edge list every call (VERDICT r5 item 2: the per-round
    cost of the double sweep was dominated by eight 2.4M-row scans +
    a per-call edge-list checkpoint; the adjacency form is the
    standard Pregel layout and at 100 TB it is also the layout a
    deployed graph pipeline stores)."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _ADJ_CACHE.get(key)
    if cached is not None:
        return cached
    e = _copurchase_edges(spark, sf_dir)
    both = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = (
        both.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    out = (adj, adj.count())
    _ADJ_CACHE[key] = out
    return out


def _bfs_visited(adj, src, rounds: int, n_nodes: int):
    """Pregel-frontier BFS from the 1-row ``src`` relation over the
    grouped adjacency ``adj``: returns (node, dist) for every node
    within ``rounds`` hops — shared by [[bfs_levels_from_hub]] and
    [[diameter_double_sweep]].

    Per round: join the frontier (checkpointed, small — AQE converts
    to a broadcast build) against the ~|V|-row adjacency, explode the
    neighbor arrays inside codegen, anti-join the visited set BEFORE
    the dedup (so the distinct's map-side partial aggregation sees
    only new nodes), checkpoint. Early exit when the frontier empties
    OR the visited count reaches ``n_nodes`` — a saturated graph
    (diameter < horizon, the common case on dense co-purchase data)
    stops paying per-round jobs at its true eccentricity; the counts
    are actions on already-checkpointed relations, ~free. The layer
    sets are identical to the oracle's unrolled chain either way —
    skipped rounds could only ever add zero rows."""
    first = src.select("node", F.lit(0).alias("dist")).localCheckpoint(eager=False)
    layers = [first]
    frontier = first.select("node")
    visited_count = 1
    start = 1
    if rounds >= 2:
        # Fold hops 1+2 into ONE materialization: the layer-1 subtree
        # is the neighbor array of a SINGLE node, so evaluating it
        # twice inside the job (once as the dist-1 layer, once as the
        # dist-2 expansion seed) costs two trivial adjacency probes —
        # strictly cheaper than the extra driver barrier + checkpoint
        # it replaces. Folding DEEPER rounds loses: their layer
        # subtrees carry real shuffles and recomputing those doubled
        # the wall (measured 7->14 s before this was restricted to
        # the source round).
        n1 = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.explode("nbrs").alias("node"))
            .join(first.select("node"), "node", "left_anti")
            .distinct()
        )
        n2 = (
            adj.join(n1.withColumnRenamed("node", "src"), "src")
            .select(F.explode("nbrs").alias("node"))
            .join(first.select("node"), "node", "left_anti")
            .distinct()
        )
        # lazy checkpoint + count = ONE action: the count() below is
        # the first job over the marked RDD, so it materializes the
        # checkpoint as a side effect — the eager variant paid a
        # separate materialization job before the count (two driver
        # barriers per round instead of one; guide §1.2).
        new = (
            n1.select("node", F.lit(1).alias("dist"))
            .unionAll(n2.select("node", F.lit(2).alias("dist")))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        for r in (1, 2):
            layers.append(
                new.filter(F.col("dist") == r).select("node", F.lit(r).alias("dist"))
            )
        frontier = new.filter(F.col("dist") == 2).select("node")
        visited_count += new.count()
        start = 3
        if start <= rounds and (
            visited_count >= n_nodes or frontier.isEmpty()
        ):
            start = rounds + 1  # saturated within the fold
    for r in range(start, rounds + 1):
        visited_nodes = layers[0].select("node")
        for l in layers[1:]:
            visited_nodes = visited_nodes.unionAll(l.select("node"))
        # same lazy-checkpoint+count fusion as the fold above; the
        # horizon round (r == rounds) has no count at all — its
        # materialization rides the consumer's action
        frontier = (
            adj.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.explode("nbrs").alias("node"))
            .join(visited_nodes, "node", "left_anti")
            .distinct()
            .localCheckpoint(eager=False)
        )
        layers.append(frontier.select("node", F.lit(r).alias("dist")))
        if r < rounds:
            fc = frontier.count()
            visited_count += fc
            if fc == 0 or visited_count >= n_nodes:
                break
    out = layers[0]
    for l in layers[1:]:
        out = out.unionAll(l)
    return out


def bfs_levels_from_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first traversal levels from a fixed hub of the
    co-purchase graph — the frontier-expansion member of the
    iterative-graph family (components spread labels, PageRank spreads
    mass, k-core removes, LPA votes; BFS EXPANDS): how much of the
    graph is within 1, 2, 3 hops of a product. The reachability
    curve is the standard small-world diagnostic, and the per-round
    plan is the Pregel frontier shape: join the current frontier
    against the bidirectional edge list, dedup, anti-join the visited
    set, tag with the round number. Frontier and visited sets are
    localCheckpoint-ed per round (flat lineage); each round costs
    O(E_frontier) — never a full-graph pass.

    The hub is the minimum part id in the edge list (deterministic;
    every edge stores its smaller endpoint in ``a``, so min(a) is the
    global min node). Output: one row per BFS level with its node
    count, plus a dist = -1 row counting nodes the horizon never
    reached."""
    e = _copurchase_edges(spark, sf_dir)
    adj, n_nodes = _bidir_adjacency(spark, sf_dir)
    src = e.agg(F.min("a").alias("node"))
    visited = _bfs_visited(adj, src, BFS_ROUNDS, n_nodes)
    reached = visited.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))
    unreached = (
        visited.agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit(-1).alias("dist"), (F.lit(n_nodes) - F.col("v")).alias("n_nodes"))
        .filter(F.col("n_nodes") > 0)
    )
    return reached.unionAll(unreached).orderBy("dist")


def _bfs_oracle() -> str:
    ctes = [
        f"""bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)""",
        f"e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})",
        """bo AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
)""",
    ]
    ctes += _bfs_chain_ctes("", "SELECT min(a) AS node FROM e0", BFS_ROUNDS)
    last = f"v{BFS_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT dist, count(*)::BIGINT AS n_nodes FROM {last} GROUP BY dist
UNION ALL
SELECT -1, t - v FROM
  (SELECT count(DISTINCT src) AS t FROM bo),
  (SELECT count(*) AS v FROM {last})
WHERE t - v > 0
ORDER BY dist
"""
    )




TOP_PREDICTIONS = 20
AA_SCALE = 1_000_000


DIAMETER_ROUNDS = 4


def diameter_double_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-diameter lower bound by the classic double sweep: BFS
    from the hub, restart a second BFS from the farthest node found
    (ties → smallest id), report both eccentricities — the second is
    the standard cheap diameter bound (exact on trees, near-exact on
    most real graphs), the number a graph-pipeline reads to size
    iteration counts for label propagation / components before paying
    for them. Horizon = DIAMETER_ROUNDS hops; eccentricities are
    lower bounds when the horizon clips (reported via n_reached).

    Scale: two Pregel frontier expansions over the memoized edge
    list — each round O(E_frontier) with flat checkpointed lineage,
    identical shape to [[bfs_levels_from_hub]]; no all-pairs
    distances anywhere (APSP at 100 TB is the trap this op exists to
    avoid)."""
    e = _copurchase_edges(spark, sf_dir)
    adj, n_nodes = _bidir_adjacency(spark, sf_dir)
    hub = e.agg(F.min("a").alias("node"))
    v1 = _bfs_visited(adj, hub, DIAMETER_ROUNDS, n_nodes)
    far = (
        v1.orderBy(F.desc("dist"), "node").limit(1).select("node")
        # lazy: materializes inside sweep 2's first count action
        .localCheckpoint(eager=False)
    )
    v2 = _bfs_visited(adj, far, DIAMETER_ROUNDS, n_nodes)
    ecc1 = v1.agg(F.max("dist").alias("hub_ecc"))
    ecc2 = v2.agg(
        F.max("dist").alias("diameter_lower_bound"),
        F.count(F.lit(1)).alias("n_reached_sweep2"),
    )
    return (
        hub.select(F.col("node").alias("hub_node"))
        .crossJoin(F.broadcast(ecc1))
        .crossJoin(F.broadcast(far.select(F.col("node").alias("far_node"))))
        .crossJoin(F.broadcast(ecc2))
        .select(
            "hub_node",
            F.col("hub_ecc").cast("bigint").alias("hub_ecc"),
            "far_node",
            F.col("diameter_lower_bound").cast("bigint").alias("diameter_lower_bound"),
            "n_reached_sweep2",
        )
    )


def _bfs_chain_ctes(suffix: str, src_sql: str, rounds: int) -> list[str]:
    """Unrolled BFS CTE chain (f/v per round) from ``src_sql`` (a
    1-row (node) relation) over the ``bo`` bidirectional edges —
    shared by the BFS-levels and double-sweep oracles."""
    ctes = [
        f"v0{suffix} AS MATERIALIZED (SELECT node, 0 AS dist FROM ({src_sql}))",
        f"f0{suffix} AS MATERIALIZED (SELECT node FROM v0{suffix})",
    ]
    for r in range(1, rounds + 1):
        p_ = r - 1
        ctes.append(
            f"""f{r}{suffix} AS MATERIALIZED (
  SELECT DISTINCT b.dst AS node
  FROM bo b JOIN f{p_}{suffix} f ON b.src = f.node
  WHERE b.dst NOT IN (SELECT node FROM v{p_}{suffix})
)"""
        )
        ctes.append(
            f"v{r}{suffix} AS MATERIALIZED "
            f"(SELECT * FROM v{p_}{suffix} UNION ALL SELECT node, {r} FROM f{r}{suffix})"
        )
    return ctes


def _diameter_oracle() -> str:
    ctes = [
        f"""bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)""",
        f"e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})",
        """bo AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
)""",
    ]
    ctes += _bfs_chain_ctes("a", "SELECT min(a) AS node FROM e0", DIAMETER_ROUNDS)
    last_a = f"v{DIAMETER_ROUNDS}a"
    ctes.append(
        f"farn AS MATERIALIZED (SELECT node FROM {last_a} ORDER BY dist DESC, node LIMIT 1)"
    )
    ctes += _bfs_chain_ctes("b", "SELECT node FROM farn", DIAMETER_ROUNDS)
    last_b = f"v{DIAMETER_ROUNDS}b"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT (SELECT min(a) FROM e0) AS hub_node,
       (SELECT max(dist) FROM {last_a})::BIGINT AS hub_ecc,
       (SELECT node FROM farn) AS far_node,
       (SELECT max(dist) FROM {last_b})::BIGINT AS diameter_lower_bound,
       (SELECT count(*) FROM {last_b})::BIGINT AS n_reached_sweep2
"""
    )


def link_prediction_hub_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized link prediction for the BFS hub node: rank
    NON-neighbors by common-neighbor count with an Adamic–Adar
    tie-breaker — the "customers also bought" / recommendation shape
    of the co-purchase graph ([[bfs_levels_from_hub]] measures reach;
    this ranks the next edge).

    Scale: the GLOBAL common-neighbor problem is the wedge set
    (Σ deg² rows — 10⁸ at sf0.1 on this dense graph); personalizing
    to one source makes it one broadcast-semi-join pass over the
    edge list: N(hub) is bounded by the max degree, so candidates
    are exactly the edges landing in N(hub) — O(E) scanned, only the
    per-candidate aggregate shuffles.  Adamic–Adar's 1/log(deg)
    weight is replaced by the monotone integer surrogate
    ``AA_SCALE div deg(w)`` (libm-free, exact cross-engine; same
    "rarer shared neighbors count more" ordering)."""
    e = _copurchase_edges(spark, sf_dir)
    both = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    hub = e.agg(F.min("a").alias("hub"))
    # No checkpoint here (VERDICT r3 item 6): nbrs is bounded by the
    # max degree and its three consumers each broadcast the SAME
    # subplan, which Catalyst collapses to one BroadcastExchange +
    # ReusedExchange — so the whole query is a single job whose only
    # barrier is the memoized edge list.
    nbrs = both.join(F.broadcast(hub), F.col("src") == F.col("hub")).select(
        F.col("dst").alias("w")
    )
    deg_w = (
        both.join(F.broadcast(nbrs), F.col("src") == F.col("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    cand = (
        both.join(F.broadcast(nbrs), F.col("dst") == F.col("w"))
        .join(F.broadcast(hub), F.col("src") == F.col("hub"), "left_anti")
        .join(
            F.broadcast(nbrs.select(F.col("w").alias("src"))), "src", "left_anti"
        )
        .select(F.col("src").alias("part"), "w")
    )
    return (
        cand.join(F.broadcast(deg_w), "w")
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.expr(f"sum({AA_SCALE} div dg)").alias("aa_micro"),
        )
        .orderBy(F.col("common_neighbors").desc(), F.col("aa_micro").desc(), "part")
        .limit(TOP_PREDICTIONS)
    )


_LINKPRED_SQL = f"""
WITH bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e0 AS MATERIALIZED ({_KCORE_EDGES_SQL}),
bo AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
),
hub AS (SELECT min(a) AS h FROM e0),
nbrs AS MATERIALIZED (SELECT dst AS w FROM bo, hub WHERE src = h),
degw AS (
  SELECT w, count(*) AS dg FROM bo JOIN nbrs ON bo.src = nbrs.w GROUP BY 1
),
cand AS (
  SELECT bo.src AS part, bo.dst AS w
  FROM bo JOIN nbrs ON bo.dst = nbrs.w, hub
  WHERE bo.src != h AND bo.src NOT IN (SELECT w FROM nbrs)
)
SELECT cand.part, count(*) AS common_neighbors,
       CAST(sum({AA_SCALE} // dg) AS BIGINT) AS aa_micro
FROM cand JOIN degw ON degw.w = cand.w
GROUP BY cand.part
ORDER BY common_neighbors DESC, aa_micro DESC, part
LIMIT {TOP_PREDICTIONS}
"""


TRUSS_K = 4  # edges must sit in >= K-2 = 2 triangles to survive
TRUSS_ROUNDS = 2


def ktruss_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss peeling (k=TRUSS_K=4, TRUSS_ROUNDS=2 fixed rounds) of
    the co-purchase graph: each round computes per-EDGE triangle
    support and removes edges in fewer than k−2 triangles — the
    edge-level strengthening of [[kcore_copurchase_parts]]'s
    node-degree peeling (a k-truss is the standard cohesive-subgraph
    definition that survives hub-spoke noise a k-core keeps). Output
    is one row per round (edges before, edges peeled) — a FIXED
    round count, so the report shape is deterministic whether or not
    the peeling converged early (a converged round peels 0).

    Round-1 support reuses the triangle kernel's scale shape:
    orient each edge from its lower-(degree, id) endpoint
    (out-neighborhoods O(√E)), enumerate each triangle ONCE as an
    adjacency-array intersection, then explode the triangle to
    credit its three canonical edges — O(#triangles) rows, never a
    wedge set. Rounds ≥2 are INCREMENTAL (VERDICT r3 item 5): a
    triangle dies iff one of its edges was peeled, so instead of
    re-running the adjacency intersection over the surviving graph,
    join the memoized triple list against the (small, broadcast)
    peeled-edge set, take the DISTINCT dead triangles, and SUBTRACT
    their edge credits from the running support — one O(#triangles)
    scan with a map-side join per round instead of a full
    re-enumeration, and the work shrinks with the dead-triangle
    count, not the graph. Zero-support edges peel implicitly (they
    appear in no triangle, so they can kill none). The oracle
    unrolls the same rounds with the canonical a<b<c triple join;
    jobs per round are constant in data size (Pregel-loop shape)."""
    k_min = TRUSS_K - 2
    tri = _triangle_triples(spark, sf_dir)
    edge_struct = lambda x, y: F.struct(  # noqa: E731 — canonical (a<b) edge
        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
    )

    def tri_edges(t: DataFrame) -> DataFrame:
        """3 rows per triangle: the triple plus one canonical edge."""
        return t.select(
            "src",
            "dst",
            "w",
            F.explode(
                F.array(
                    edge_struct(F.col("src"), F.col("dst")),
                    edge_struct(F.col("src"), F.col("w")),
                    edge_struct(F.col("dst"), F.col("w")),
                )
            ).alias("c"),
        ).select("src", "dst", "w", F.col("c.a").alias("a"), F.col("c.b").alias("b"))

    # Running per-edge support; edges not present have support 0.
    # EAGER checkpoint (r10, VERDICT item 1's requested local[32] A/B):
    # the r9 lazy form deferred sup's materialization into the final
    # collect, where its three consumers (peeled broadcast, alive
    # counts, the round-2 subtraction join) race AQE stage scheduling —
    # eager-vs-lazy measured 2.60 vs 2.66 s against a 0.88x same-run
    # control (i.e. lazy ≈14% slower bias-corrected), reproducing the
    # direction of the driver's r9 regression. The counts stay folded
    # into the ONE tagged-union collect either way (that part of the r9
    # change survives; the separate per-round .count() actions do not
    # return).
    sup = (
        tri_edges(tri)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("sup"))
        .localCheckpoint(eager=True)
    )
    # Per-round alive counts as lazy 1-row aggregates, folded into one
    # action. The round-2 incremental dead-triangle subtraction is
    # unchanged — it is just built lazily on top of the checkpointed
    # support relation instead of being re-materialized per round.
    # (TRUSS_ROUNDS is a small fixed constant; with a deep round count
    # the per-round checkpoints would return to bound the plan.)
    count_aggs = [
        _copurchase_edges(spark, sf_dir)
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(0).alias("i"), "c")
    ]
    sup_r = sup
    for r in range(2, TRUSS_ROUNDS + 1):
        # Edges peeled LAST round that carried support — the only
        # ones that can invalidate a triangle.
        peeled = sup_r.filter(F.col("sup") < k_min).select("a", "b")
        dead = (
            tri_edges(tri)
            .join(F.broadcast(peeled), ["a", "b"])
            .select("src", "dst", "w")
            .distinct()
        )
        dead_credits = (
            tri_edges(dead).groupBy("a", "b").agg(F.count(F.lit(1)).alias("dead_n"))
        )
        sup_next = (
            sup_r.filter(F.col("sup") >= k_min)
            .join(dead_credits, ["a", "b"], "left")
            .select(
                "a",
                "b",
                (F.col("sup") - F.coalesce(F.col("dead_n"), F.lit(0))).alias("sup"),
            )
        )
        if r < TRUSS_ROUNDS:
            # Surviving triangles feed the next round's dead scan.
            tri = tri.join(F.broadcast(dead), ["src", "dst", "w"], "left_anti")
            sup_next = sup_next.localCheckpoint(eager=False)
        count_aggs.append(
            sup_r.filter(F.col("sup") >= k_min)
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(r - 1).alias("i"), "c")
        )
        sup_r = sup_next
    count_aggs.append(
        sup_r.filter(F.col("sup") >= k_min)
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(TRUSS_ROUNDS).alias("i"), "c")
    )
    # Tagged UNION instead of crossJoin(broadcast(...)) stitching: each
    # broadcast of a 1-row aggregate was its own sequential Spark job
    # (a BroadcastExchange materializes before the consuming plan
    # runs); the union folds every count into the ONE collect action,
    # and the lazy `sup` checkpoint still computes once across the
    # union legs (guide §1.2: don't serialize the driver on counts one
    # action can fold).
    combined = count_aggs[0]
    for c in count_aggs[1:]:
        combined = combined.unionAll(c)
    vals = {int(r["i"]): int(r["c"]) for r in combined.collect()}
    alive = [vals[r] for r in range(TRUSS_ROUNDS + 1)]
    rows = [(r, alive[r - 1], alive[r - 1] - alive[r]) for r in range(1, TRUSS_ROUNDS + 1)]
    return spark.createDataFrame(
        rows, "round long, n_edges_before long, n_peeled long"
    ).orderBy("round")


def _ktruss_oracle() -> str:
    ctes = [
        f"""bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
)""",
        f"e0 AS MATERIALIZED ({_KCORE_EDGES_SQL})",
    ]
    for r in range(1, TRUSS_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""tri{r} AS MATERIALIZED (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e{p} e1 JOIN e{p} e2 ON e2.a = e1.b JOIN e{p} e3 ON e3.a = e1.a AND e3.b = e2.b
)"""
        )
        ctes.append(
            f"""sup{r} AS MATERIALIZED (
  SELECT a, b, count(*) AS sup FROM (
    SELECT u AS a, v AS b FROM tri{r}
    UNION ALL SELECT u, w FROM tri{r}
    UNION ALL SELECT v, w FROM tri{r}
  ) GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{p} e JOIN sup{r} s ON s.a = e.a AND s.b = e.b
  WHERE s.sup >= {TRUSS_K - 2}
)"""
        )
    stats = "\nUNION ALL\n".join(
        f"SELECT {r}::BIGINT AS round,"
        f" (SELECT count(*) FROM e{r - 1})::BIGINT AS n_edges_before,"
        f" ((SELECT count(*) FROM e{r - 1}) - (SELECT count(*) FROM e{r}))::BIGINT AS n_peeled"
        for r in range(1, TRUSS_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM (\n{stats}\n) ORDER BY round"


SCAN_TOP_EDGES = 50


def scan_structural_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCAN-style structural similarity per co-purchase edge: the
    neighborhood-overlap score (Xu et al., SCAN, KDD'07) that seeds
    density-based graph clustering — an edge whose endpoints share
    most of their neighbors is intra-cluster; one bridging two
    communities scores near zero. Reported as open-neighborhood
    Jaccard in exact integer permille (SCAN's cosine form needs a
    sqrt; the Jaccard form is the same monotone signal with no float
    hazard): 1000·|N(a)∩N(b)| div (deg(a)+deg(b)−|N(a)∩N(b)|).

    Scale: |N(a)∩N(b)| per edge IS the edge's triangle support, so
    the whole operator rides the memoized triangle-triple relation
    (one explode + groupBy bounded by #edges) — no neighborhood
    self-join, no wedge set. Degrees come from the memoized edge
    list; the node-count-sized degree relation broadcasts. Top-K by
    (similarity, edge) compiles to TakeOrderedAndProject — no global
    sort. Same kernel family as [[ktruss_copurchase_edges]] (support
    = peel signal there, similarity numerator here)."""
    e = _copurchase_edges(spark, sf_dir)
    tri = _triangle_triples(spark, sf_dir)
    edge_struct = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
    )
    sup = (
        tri.select(
            F.explode(
                F.array(
                    edge_struct(F.col("src"), F.col("dst")),
                    edge_struct(F.col("src"), F.col("w")),
                    edge_struct(F.col("dst"), F.col("w")),
                )
            ).alias("c")
        )
        .select("c.a", "c.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    deg = _node_degrees(spark, sf_dir)
    return (
        e.join(sup, ["a", "b"], "left")
        .na.fill({"common_neighbors": 0})
        .join(F.broadcast(deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))), "a")
        .join(F.broadcast(deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))), "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.expr(
                "1000 * common_neighbors div (deg_a + deg_b - common_neighbors)"
            ).alias("sim_permille"),
        )
        .orderBy(F.col("sim_permille").desc(), "a", "b")
        .limit(SCAN_TOP_EDGES)
    )


_SCAN_SQL = f"""
WITH bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e0 AS MATERIALIZED ({_KCORE_EDGES_SQL}),
tri AS MATERIALIZED (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup AS (
  SELECT a, b, count(*) AS common_neighbors FROM (
    SELECT u AS a, v AS b FROM tri
    UNION ALL SELECT u, w FROM tri
    UNION ALL SELECT v, w FROM tri
  ) GROUP BY 1, 2
),
deg AS (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY 1
)
SELECT e.a, e.b,
       CAST(coalesce(s.common_neighbors, 0) AS BIGINT) AS common_neighbors,
       da.deg AS deg_a,
       db.deg AS deg_b,
       CAST(1000 * coalesce(s.common_neighbors, 0)
            // (da.deg + db.deg - coalesce(s.common_neighbors, 0)) AS BIGINT)
         AS sim_permille
FROM e0 e
LEFT JOIN sup s ON s.a = e.a AND s.b = e.b
JOIN deg da ON da.n = e.a
JOIN deg db ON db.n = e.b
ORDER BY sim_permille DESC, e.a, e.b
LIMIT {SCAN_TOP_EDGES}
"""


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the Newman
    mixing coefficient: the Pearson correlation between the degrees
    at the two ends of every edge. Positive = hubs link to hubs
    (social-network shape), negative = hubs link to leaves
    (hub-and-spoke catalogs) — the ONE summary number that tells a
    graph pipeline which skew strategy its joins need before it runs
    them ([[copurchase_degree_histogram]] gives the marginal degree
    law; this gives the JOINT structure).

    Exactness: over the symmetric pair multiset (each edge counted
    in both directions, M = 2|E|) the x and y marginals coincide, so
    r = (M·Σxy − Sx²) / (M·Σx² − Sx²) — a pure integer ratio, NO
    square root — reported in truncated per-mille (both engines
    truncate toward zero). Every product widens to DECIMAL(38,0)/
    HUGEINT: Sx² reaches (E·d̄)² and wraps int64 long before 100 TB.

    Scale: degrees are one count over the memoized edge list; the
    pair stats are ONE aggregate over edges joined twice against the
    ~|V|-row degree relation (broadcast at this SF, key-shuffle at
    cluster scale) — no wedge or pair materialization anywhere."""
    e = _copurchase_edges(spark, sf_dir)
    deg = _node_degrees(spark, sf_dir)
    paired = e.join(
        F.broadcast(deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))), "a"
    ).join(
        F.broadcast(deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))), "b"
    )
    stats = paired.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("da").cast("decimal(38,0)") + F.col("db")).alias("sx"),
        F.sum(
            F.col("da").cast("decimal(38,0)") * F.col("da")
            + F.col("db").cast("decimal(38,0)") * F.col("db")
        ).alias("sxx"),
        F.sum(2 * F.col("da").cast("decimal(38,0)") * F.col("db")).alias("sxy"),
    )
    return stats.select(
        "n_edges",
        F.expr(
            "CASE WHEN 2 * n_edges * sxx - sx * sx = 0 THEN NULL ELSE"
            " CAST((1000 * (2 * n_edges * sxy - sx * sx))"
            " div (2 * n_edges * sxx - sx * sx) AS BIGINT) END"
        ).alias("assortativity_permille"),
    )


def _assortativity_oracle() -> str:
    return f"""
WITH bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e0 AS MATERIALIZED ({_KCORE_EDGES_SQL}),
deg AS (
  SELECT n, count(*)::BIGINT AS deg FROM (
    SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY n
),
stats AS (
  SELECT count(*)::BIGINT AS n_edges,
         sum(x.deg::HUGEINT + y.deg) AS sx,
         sum(x.deg::HUGEINT * x.deg + y.deg::HUGEINT * y.deg) AS sxx,
         sum(2 * x.deg::HUGEINT * y.deg) AS sxy
  FROM e0
  JOIN deg x ON x.n = e0.a
  JOIN deg y ON y.n = e0.b
)
SELECT n_edges,
       CASE WHEN 2 * n_edges::HUGEINT * sxx - sx * sx = 0 THEN NULL ELSE
         CAST((1000 * (2 * n_edges::HUGEINT * sxy - sx * sx))
              // (2 * n_edges::HUGEINT * sxx - sx * sx) AS BIGINT) END
         AS assortativity_permille
FROM stats
"""


RICH_CLUB_KS = (2, 4, 8, 16, 32, 64, 128, 256)


def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the co-purchase graph at
    doubling degree thresholds — the density of the subgraph induced
    by nodes of degree > k: φ(k) = 2·E_k / (N_k·(N_k−1)). Rising
    φ(k) means the hubs form a tightly-wired core (the "rich club") —
    together with [[degree_assortativity]] this is the standard
    two-number summary of hub wiring, and for a join planner a strong
    rich club means the skewed keys CO-OCCUR (salting must split the
    hot-hot pairs, not just the hot rows).

    Scale: everything derives from two BOUNDED histograms — edges by
    min(endpoint degrees) and nodes by degree (≤ max-degree rows
    each) — so the per-k probes are conditional sums over broadcast
    relations; the edge relation is scanned ONCE (the degree join is
    the same ~|V|-row broadcast the assortativity face uses). All
    integer; truncated per-mille; classes with N_k < 2 report NULL."""
    e = _copurchase_edges(spark, sf_dir)
    deg = _node_degrees(spark, sf_dir)
    paired = e.join(
        F.broadcast(deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))), "a"
    ).join(
        F.broadcast(deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))), "b"
    )
    edge_hist = paired.groupBy(
        F.least("da", "db").alias("m")
    ).agg(F.count(F.lit(1)).alias("ce"))
    deg_hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("cn"))
    probes = spark.createDataFrame([(k,) for k in RICH_CLUB_KS], "k long")
    ek = (
        probes.crossJoin(F.broadcast(edge_hist))
        .groupBy("k")
        .agg(F.sum(F.when(F.col("m") > F.col("k"), F.col("ce"))).alias("n_edges"))
    )
    nk = (
        probes.crossJoin(F.broadcast(deg_hist))
        .groupBy("k")
        .agg(F.sum(F.when(F.col("deg") > F.col("k"), F.col("cn"))).alias("n_nodes"))
    )
    return (
        nk.join(F.broadcast(ek), "k")
        .select(
            "k",
            F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.expr(
                "CASE WHEN coalesce(n_nodes, 0) < 2 THEN NULL ELSE"
                " CAST((2000 * coalesce(n_edges, 0))"
                " div (CAST(n_nodes AS DECIMAL(38,0)) * (n_nodes - 1)) AS BIGINT) END"
            ).alias("phi_permille"),
        )
        .orderBy("k")
    )


def _rich_club_oracle() -> str:
    ks = ", ".join(str(k) for k in RICH_CLUB_KS)
    return f"""
WITH bk AS MATERIALIZED (
  SELECT l_orderkey, l_partkey
  FROM (
    SELECT l_orderkey, l_partkey,
           count(*) OVER (PARTITION BY l_orderkey) AS basket_n
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  ) WHERE basket_n <= {MAX_BASKET}
),
e0 AS MATERIALIZED ({_KCORE_EDGES_SQL}),
deg AS (
  SELECT n, count(*)::BIGINT AS deg FROM (
    SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY n
),
edge_hist AS (
  SELECT least(x.deg, y.deg) AS m, count(*)::BIGINT AS ce
  FROM e0 JOIN deg x ON x.n = e0.a JOIN deg y ON y.n = e0.b
  GROUP BY 1
),
deg_hist AS (SELECT deg, count(*)::BIGINT AS cn FROM deg GROUP BY deg),
probes AS (SELECT unnest([{ks}])::BIGINT AS k)
SELECT p.k,
       coalesce((SELECT sum(cn) FROM deg_hist WHERE deg > p.k), 0)::BIGINT
         AS n_nodes,
       coalesce((SELECT sum(ce) FROM edge_hist WHERE m > p.k), 0)::BIGINT
         AS n_edges,
       CASE WHEN coalesce((SELECT sum(cn) FROM deg_hist WHERE deg > p.k), 0) < 2
            THEN NULL ELSE
         CAST((2000 * coalesce((SELECT sum(ce) FROM edge_hist WHERE m > p.k), 0)::HUGEINT)
              // ((SELECT sum(cn) FROM deg_hist WHERE deg > p.k)::HUGEINT
                  * ((SELECT sum(cn) FROM deg_hist WHERE deg > p.k) - 1)) AS BIGINT) END
         AS phi_permille
FROM probes p
ORDER BY p.k
"""


QUERIES = {
    "skyline_customers": skyline_customers,
    "pareto_revenue_concentration": pareto_revenue_concentration,
    "degree_assortativity": degree_assortativity,
    "rich_club_coefficient": rich_club_coefficient,
    "copurchase_part_pairs": copurchase_part_pairs,
    "copurchase_triangles": copurchase_triangles,
    "drift_event_type_shares": drift_event_type_shares,
    "kcore_copurchase_parts": kcore_copurchase_parts,
    "label_propagation_communities": label_propagation_communities,
    "association_rules_lift": association_rules_lift,
    "bfs_levels_from_hub": bfs_levels_from_hub,
    "diameter_double_sweep": diameter_double_sweep,
    "link_prediction_hub_cn": link_prediction_hub_cn,
    "local_clustering_coefficients": local_clustering_coefficients,
    "copurchase_degree_histogram": copurchase_degree_histogram,
    "ktruss_copurchase_edges": ktruss_copurchase_edges,
    "scan_structural_similarity": scan_structural_similarity,
}
ORACLES = {
    "skyline_customers": _SKYLINE_SQL,
    "pareto_revenue_concentration": _PARETO_SQL,
    "degree_assortativity": _assortativity_oracle(),
    "rich_club_coefficient": _rich_club_oracle(),
    "copurchase_part_pairs": _PAIRS_SQL,
    "copurchase_triangles": _TRI_SQL,
    "drift_event_type_shares": _DRIFT_SQL,
    "kcore_copurchase_parts": _kcore_oracle(),
    "label_propagation_communities": _lpa_oracle(),
    "association_rules_lift": _RULES_SQL,
    "bfs_levels_from_hub": _bfs_oracle(),
    "diameter_double_sweep": _diameter_oracle(),
    "link_prediction_hub_cn": _LINKPRED_SQL,
    "local_clustering_coefficients": _LCC_SQL,
    "copurchase_degree_histogram": _DEG_HIST_SQL,
    "ktruss_copurchase_edges": _ktruss_oracle(),
    "scan_structural_similarity": _SCAN_SQL,
}
