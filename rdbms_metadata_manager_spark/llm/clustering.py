"""Dedup clustering: transitive closure over near-dup pairs.

Pairwise detectors (Jaccard/MinHash) emit edges; real deduplication
needs the connected COMPONENTS — if A~B and B~C, one keeper must
cover all three even when A~C was never emitted. This is the
iterative-algorithm face of the engine: a driver-side loop over
DataFrame fixpoint steps (control plane in Python, data plane fully
distributed — no row ever reaches the driver except the convergence
counter).

Oracle: DuckDB's recursive CTE computes the same min-label
propagation, so even the iterative operator is hash-checked exactly.

Scale: each iteration is one join + groupBy on node id (shuffle on
the same key every round → AQE reuses partitioning); iterations ≈
graph diameter, and near-dup graphs are overwhelmingly tiny cliques
(diameter ≤ ~3). The same loop is large-scale connected components
(hash-to-min), the standard pre-GraphFrames formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..memo import register_memo
from pyspark.sql import functions as F

from ..queries.base import load
from .dedup import _JACCARD_SQL, dedup_ngram_jaccard
from .sampling import _split_bucket
from .hashing import h32_sql

MAX_ITERATIONS = 20


def connected_components(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """(node, cluster_id=min reachable id) for every node in edges,
    via min-label propagation to fixpoint."""
    both = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # Iterative DataFrames MUST truncate lineage each round
    # (localCheckpoint): without it every iteration re-plans the whole
    # history and analysis cost grows exponentially — a 10-hop chain
    # took minutes unchecked, sub-second checkpointed. On a cluster
    # use checkpoint() with a reliable dir for fault tolerance.
    both = both.localCheckpoint(eager=True)
    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            both.join(labels, both["u"] == labels["node"])
            .groupBy(F.col("v").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # min-label propagation moves a component's minimum one hop
        # per round, so a duplicate CHAIN longer than MAX_ITERATIONS
        # hops would exit here with WRONG labels — two docs of one
        # family keeping different keepers is silent data corruption,
        # so fail loudly instead. (Remedy: raise MAX_ITERATIONS, or
        # switch to the pointer-doubling large-star/small-star form,
        # which converges in O(log n) rounds.)
        raise RuntimeError(
            f"connected_components did not converge within {MAX_ITERATIONS} "
            "iterations; component diameter exceeds the cap"
        )
    return labels


MAX_STAR_ROUNDS = 15


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node links its LARGER neighbors to the
    minimum of its closed neighborhood. Output edges oriented
    (a=hi, b=lo). Window-min instead of groupBy+self-join: the
    neighborhood minimum rides ONE exchange on u."""
    from pyspark.sql import Window

    both = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        both.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node links its SMALLER neighbors (and
    itself) to the minimum of that set. Input/output edges oriented
    (a=hi, b=lo). Same one-exchange window-min shape as large-star."""
    from pyspark.sql import Window

    j = e.withColumn("m", F.min("b").over(Window.partitionBy("a")))
    relink = j.where(F.col("b") != F.col("m")).select(
        F.col("b").alias("a"), F.col("m").alias("b")
    )
    selfedge = j.select("a", F.col("m").alias("b"))
    return relink.union(selfedge).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(node, cluster_id=component min) via alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — O(log n) rounds regardless of component
    DIAMETER, where min-label propagation needs diameter rounds.
    This is the scale path for adversarial graphs (long duplicate
    chains, crawl link graphs); `connected_components` stays the
    cheaper choice for the tiny-clique topology of near-dup families.

    Each round is two window-min + distinct passes on the shrinking
    edge list (one exchange each — see the star helpers);
    convergence = edge-set fixpoint, detected
    with a one-job (count, xxhash64-sum) checksum per round and then
    CONFIRMED with two exact anti-semidifferences only on the
    candidate final round — so the O(rounds) cost is the cheap
    checksum and a checksum collision can never stop the loop early
    with wrong labels.
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Node set from the CHECKPOINTED canonical edges, not the raw
    # `edges` argument — the argument may be an expensive unsaved
    # pipeline (e.g. the Jaccard pair join) and re-deriving nodes
    # from it would execute that pipeline a second time. Self-loop
    # inputs (a == b) are filtered above, matching the fixpoint
    # variant's node universe (endpoints of real pairs).
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    def _checksum(df: DataFrame) -> tuple:
        # decimal(38,0) fold: a long sum of 64-bit hashes overflows
        # under ANSI mode
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    converged = False
    prev_sum = _checksum(e)
    for _ in range(MAX_STAR_ROUNDS):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sum = _checksum(new_e)
        if new_sum == prev_sum and new_e.exceptAll(e).isEmpty() and e.exceptAll(new_e).isEmpty():
            converged = True
            e = new_e
            break
        e, prev_sum = new_e, new_sum
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge within {MAX_STAR_ROUNDS} rounds"
        )
    # Fixpoint edges form stars (child → component min); roots keep
    # themselves. min() guards the (already-converged) invariant that
    # each child has exactly one root without assuming it.
    stars = e.groupBy("a").agg(F.min("b").alias("root"))
    return nodes.join(stars, nodes["node"] == stars["a"], "left").select(
        "node", F.coalesce("root", "node").alias("label")
    )


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract (and oracle) as `dedup_clusters`, computed by
    star contraction instead of min-label propagation — the
    diameter-independent variant."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return (
        connected_components_star(pairs)
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
        .orderBy("doc_id")
    )


_CC_CACHE: dict[tuple[str, str], DataFrame] = register_memo({})


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the exact-Jaccard pair list: each doc in
    a pair gets its component's minimum doc_id as cluster keeper.

    Materialized once per (corpus, Spark app), like the pair list it
    rides: connected_components is an ITERATIVE kernel (O(log n)
    star-contraction rounds, several jobs), and five downstream
    queries (keep_best, survivorship, size histogram, safe split,
    threshold composition) would otherwise re-run the whole fixpoint
    per call (r7 tide audit: the re-derivation was most of
    dedup_keep_best's per-call wall)."""
    key = (sf_dir, spark.sparkContext.applicationId)
    cached = _CC_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    out = (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    _CC_CACHE[key] = out
    return out


_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_JACCARD_SQL})),
nodes AS (SELECT doc_a AS n FROM pairs UNION SELECT doc_b FROM pairs),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, label) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach
GROUP BY node
ORDER BY doc_id
"""


def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-family size distribution: per family size, how many
    clusters, how many documents they cover, and how many are
    DELETABLE (size − 1 per family, one keeper each) — the storage-
    reclaim estimate a dedup run is justified by, and the skew alarm
    for the clustering itself (one giant family usually means a
    boilerplate template, not true duplication, and argues for the
    O(log n) star contraction over diameter-bound propagation).

    Rides the connected-components labels (which ride the memoized
    near-dup pair list); two tiny groupBys on top. All-integer."""
    cc = dedup_clusters(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("family_size"))
    return (
        sizes.groupBy("family_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("family_size").alias("n_docs"),
            F.sum(F.col("family_size") - 1).alias("n_deletable"),
        )
        .orderBy("family_size")
    )


_CLUSTER_SIZES_SQL = f"""
WITH cc AS ({_CLUSTERS_SQL}),
sizes AS (SELECT cluster_id, count(*) AS family_size FROM cc GROUP BY cluster_id)
SELECT family_size,
       count(*) AS n_clusters,
       sum(family_size)::BIGINT AS n_docs,
       sum(family_size - 1)::BIGINT AS n_deletable
FROM sizes
GROUP BY family_size
ORDER BY family_size
"""


def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split keyed on the NEAR-DUP CLUSTER representative —
    the strongest rung of the leakage ladder: [[split_train_val_test]]
    keys on doc_id (verbatim copies can straddle splits),
    [[leakage_safe_split]] keys on content (near-dups with edits can
    still straddle), this keys on the [[dedup_clusters]] component
    label, so an entire near-duplicate FAMILY lands in one split and
    a lightly-edited copy of a training document can never sit in
    test. Documents outside any near-dup pair are their own
    singleton family (rep = own doc_id).

    Scale: rides the memoized near-dup pair list and its
    connected-components labels (cluster relation ≪ corpus); one
    broadcast-ready left join attaches the rep, then the split is the
    same hash projection as the other two splitters — no extra
    shuffle of document text."""
    docs = load(spark, sf_dir, "documents")
    cc = dedup_clusters(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("cc_label")
    )
    rep = F.coalesce(F.col("cc_label"), F.col("doc_id"))
    bucket = _split_bucket(rep)
    return (
        docs.join(cc, "doc_id", "left")
        .select(
            "doc_id",
            rep.alias("cluster_rep"),
            bucket.alias("bucket"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def _cluster_split_oracle() -> str:
    rep_key = "'split:' || coalesce(cc.cluster_id, d.doc_id)::VARCHAR"
    bucket = f"{h32_sql(rep_key)} % 100"
    return f"""
WITH cc AS ({_CLUSTERS_SQL})
SELECT d.doc_id,
       coalesce(cc.cluster_id, d.doc_id) AS cluster_rep,
       {bucket} AS bucket,
       CASE WHEN {bucket} < 80 THEN 'train'
            WHEN {bucket} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
ORDER BY d.doc_id
"""



def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection — the curation decision that
    composes two pipelines this repo already ships: near-dup families
    ([[dedup_clusters]], connected components over the exact-Jaccard
    pair list) × the frozen linear quality scorer
    ([[quality_classifier_scores]]). Instead of keep-lowest-id, every
    family keeps its HIGHEST-scoring member (ties → lowest doc_id) —
    what production dedup actually does, since the verbatim copies of
    a page differ in boilerplate/truncation and the keeper choice
    decides what the model trains on. Output: one row per DROPPED
    doc with its family, its score, and the keeper it lost to.

    Scale: rides the memoized pair list and CC labels (family
    relation ≪ corpus); scores join family members on doc_id (one
    hash join), the per-family rank window is bounded by family size,
    and the keeper join broadcasts the ≤|families|-row keep list."""
    from pyspark.sql import Window

    from .curation import quality_classifier_scores

    cc = dedup_clusters(spark, sf_dir)
    scores = quality_classifier_scores(spark, sf_dir).select("doc_id", "score")
    fam = cc.join(scores, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), "doc_id")
    ranked = fam.withColumn("rk", F.row_number().over(w))
    keep = ranked.filter(F.col("rk") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keep_doc"),
        F.col("score").alias("keep_score"),
    )
    return (
        ranked.filter(F.col("rk") > 1)
        .join(F.broadcast(keep), "cluster_id")
        .select(
            F.col("doc_id").alias("drop_doc"),
            "cluster_id",
            F.col("score").alias("drop_score"),
            "keep_doc",
            "keep_score",
        )
        .orderBy("drop_doc")
    )


def _keep_best_oracle() -> str:
    from .curation import _QC_SQL

    return f"""
WITH cc AS ({_CLUSTERS_SQL}),
qc AS ({_QC_SQL}),
fam AS (
  SELECT cc.doc_id, cc.cluster_id, qc.score
  FROM cc JOIN qc ON qc.doc_id = cc.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY score DESC, doc_id) AS rk
  FROM fam
)
SELECT d.doc_id AS drop_doc, d.cluster_id, d.score AS drop_score,
       k.doc_id AS keep_doc, k.score AS keep_score
FROM ranked d JOIN ranked k ON k.cluster_id = d.cluster_id AND k.rk = 1
WHERE d.rk > 1
ORDER BY drop_doc
"""


def dedup_survivorship_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship-bias audit of quality-aware dedup — the QA
    question every curation pipeline must answer after
    [[dedup_keep_best]] runs: does keeping the best family member
    actually RAISE the surviving corpus' quality, and how much mass
    do the dropped docs carry? Every document is classed 'kept'
    (family winner), 'dropped' (family loser), or 'unique' (never in
    a near-dup family), with exact integer score stats per class
    (count, min/max, mean in milli-units via truncating div, exact
    median via percentile_disc). By construction mean(kept) ≥
    mean(dropped); 'unique' calibrates both against the untouched
    corpus.

    Scale: rides the memoized pair/CC/score relations the whole
    dedup family amortizes; the per-family rank window is bounded by
    family size; the class rollup is 3 rows."""
    from pyspark.sql import Window

    from .curation import quality_classifier_scores

    cc = dedup_clusters(spark, sf_dir)
    scores = quality_classifier_scores(spark, sf_dir).select("doc_id", "score")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), "doc_id")
    fam = (
        cc.join(scores, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select("doc_id", "rk")
    )
    classed = scores.join(fam, "doc_id", "left").select(
        "score",
        F.expr(
            "CASE WHEN rk IS NULL THEN 'unique'"
            " WHEN rk = 1 THEN 'kept' ELSE 'dropped' END"
        ).alias("doc_class"),
    )
    return (
        classed.groupBy("doc_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.expr(
                "CAST((1000 * CAST(sum(score) AS DECIMAL(38,0))) div count(1)"
                " AS BIGINT)"
            ).alias("mean_score_milli"),
            # CAST: Spark's percentile_disc yields DOUBLE even over a
            # BIGINT column; the value is an actual (integer) score, so
            # the cast is exact and matches the oracle's ::BIGINT
            # (window type-class lint, surfaced by the r7 rotation)
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY score)"
                " AS BIGINT)"
            ).alias("median_score"),
        )
        .orderBy("doc_class")
    )


def _survivorship_oracle() -> str:
    from .curation import _QC_SQL

    return f"""
WITH cc AS ({_CLUSTERS_SQL}),
qc AS ({_QC_SQL}),
fam AS (
  SELECT cc.doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY score DESC, cc.doc_id) AS rk
  FROM cc JOIN qc ON qc.doc_id = cc.doc_id
),
classed AS (
  SELECT qc.score,
         CASE WHEN fam.rk IS NULL THEN 'unique'
              WHEN fam.rk = 1 THEN 'kept' ELSE 'dropped' END AS doc_class
  FROM qc LEFT JOIN fam ON fam.doc_id = qc.doc_id
)
SELECT doc_class, count(*)::BIGINT AS n_docs,
       min(score)::BIGINT AS min_score, max(score)::BIGINT AS max_score,
       CAST((1000 * sum(score)::HUGEINT) // count(*) AS BIGINT)
         AS mean_score_milli,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY score)::BIGINT
         AS median_score
FROM classed
GROUP BY doc_class
ORDER BY doc_class
"""


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "cluster_safe_split": cluster_safe_split,
    "dedup_clusters_star": dedup_clusters_star,
    "dedup_cluster_size_histogram": dedup_cluster_size_histogram,
    "dedup_keep_best": dedup_keep_best,
    "dedup_survivorship_audit": dedup_survivorship_audit,
}
ORACLES = {
    "dedup_clusters": _CLUSTERS_SQL,
    "cluster_safe_split": _cluster_split_oracle(),
    "dedup_clusters_star": _CLUSTERS_SQL,
    "dedup_cluster_size_histogram": _CLUSTER_SIZES_SQL,
    "dedup_keep_best": _keep_best_oracle(),
    "dedup_survivorship_audit": _survivorship_oracle(),
}
