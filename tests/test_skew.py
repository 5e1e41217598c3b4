"""Two-path hot-key salted join: identity vs plain join, salted-path
exercise on a synthetic celebrity key, and the plan shape (union of a
plain tail join and a salted hot join; hot set broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries.skew import (
    SALT_BUCKETS,
    salted_join_revenue,
    two_path_skew_join,
)


def _synthetic(spark):
    # celebrity key 7: 500 probe rows; tail keys 1..20: 3 rows each
    probe = spark.range(500).select(
        F.lit(7).alias("k"), (F.col("id")).alias("pv")
    ).unionByName(
        spark.range(60).select(
            (F.col("id") % 20 + 1).alias("k"), (F.col("id") + 1000).alias("pv")
        )
    )
    build = spark.range(25).select(
        (F.col("id") + 1).alias("bk"), (F.col("id") * 10).alias("bv")
    )
    return probe, build


def test_two_path_join_identical_to_plain_join(spark):
    probe, build = _synthetic(spark)
    got = two_path_skew_join(probe, build, "k", "bk", threshold=10, buckets=4)
    want = probe.join(build, probe["k"] == build["bk"])
    # key 7 (hot): 500 rows; tail keys 1..20 (3 rows each) all match build
    assert got.count() == want.count() == 500 + 60
    got_rows = sorted((r.k, r.pv, r.bk, r.bv) for r in got.collect())
    want_rows = sorted((r.k, r.pv, r.bk, r.bv) for r in want.collect())
    assert got_rows == want_rows


def test_salted_path_actually_splits_hot_key(spark):
    """With threshold below the celebrity key's frequency, the hot
    slice must be non-empty and spread across multiple salt values."""
    probe, build = _synthetic(spark)
    hot = (
        probe.groupBy("k").agg(F.count("*").alias("n")).filter(F.col("n") > 10)
    )
    assert [r.k for r in hot.collect()] == [7]
    salted = probe.join(F.broadcast(hot.select("k")), "k", "left_semi").withColumn(
        "_salt", F.pmod(F.abs(F.xxhash64("k", "pv")), F.lit(4))
    )
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts > 1  # the hot key's rows really fan out over salts


def test_salted_join_revenue_plan_is_two_path(spark, sf_dir):
    df = salted_join_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan, plan
    # hot-key set distribution: broadcast semi/anti splits on both sides
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the build-side explode exists only on the (hot) salted path,
    # never as a whole-table multiplier before the tail join
    assert plan.count("Generate explode") <= 1, plan


def test_two_path_join_extremes_all_hot_and_none_hot(spark):
    """threshold=0 routes EVERY key through the salted path;
    threshold=10**9 routes everything through the plain tail —
    both must still equal the plain join."""
    probe, build = _synthetic(spark)
    want = sorted(
        (r.k, r.pv, r.bk, r.bv)
        for r in probe.join(build, probe["k"] == build["bk"]).collect()
    )
    for threshold in (0, 10**9):
        got = two_path_skew_join(probe, build, "k", "bk", threshold=threshold, buckets=4)
        assert sorted((r.k, r.pv, r.bk, r.bv) for r in got.collect()) == want, threshold


def test_countmin_never_underestimates_and_matches_hand_sketch(spark, sf_dir):
    """The Count-Min guarantee: estimate >= exact for EVERY key (min
    over rows of sums that each include the key's own mass). Also
    rebuild the sketch in plain Python from the per-user counts and
    assert the reported estimates match it exactly — pins the md5
    bucket derivation end to end."""
    import hashlib

    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.skew import (
        CMS_ROWS,
        CMS_WIDTH,
        countmin_heavy_hitters,
    )

    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows, "no heavy hitters reported"
    assert all(r.overestimate >= 0 for r in rows), rows

    counts = {
        r.user_id: r.n_events
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_events")
        .collect()
    }

    def bucket(r: int, user: int) -> int:
        return int(hashlib.md5(f"cm{r}:{user}".encode()).hexdigest()[:8], 16) % CMS_WIDTH

    cells: dict[tuple[int, int], int] = {}
    for user, n in counts.items():
        for r in range(CMS_ROWS):
            key = (r, bucket(r, user))
            cells[key] = cells.get(key, 0) + n
    for row in rows:
        est = min(cells[(r, bucket(r, row.user_id))] for r in range(CMS_ROWS))
        assert (row.n_events, row.cms_estimate) == (counts[row.user_id], est), row
