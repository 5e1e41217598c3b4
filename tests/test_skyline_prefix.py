"""Crafted-input tests for the prefix-filter Jaccard join, the
containment near-dup, the skyline operator, and linear-interpolation
resampling — semantics the synthetic testdata exercises only thinly
(its planted dups are near-identical, so containment ≡ Jaccard
there; the frontier shape and gap interpolation need known inputs)."""

from __future__ import annotations

import datetime

import pytest


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")


def _shingle_set(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted_corpus"))
    rows = [
        # 1 and 2: near-identical (J well above 0.5)
        (1, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu nu", "en", "web", 0),
        (2, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu xi", "en", "web", 0),
        # 3: verbatim QUOTE of 1's opening — containment 1.0, Jaccard 0.3
        (3, "alpha beta gamma delta epsilon", "en", "web", 0),
        # 4: unrelated
        (4, "one two three four five six seven eight nine ten", "en", "web", 0),
        # 5: shares only a stop-ish shingle with 1/2 (below any threshold)
        (5, "alpha beta gamma totally different tail of words here now", "en", "web", 0),
    ]
    _write_docs(spark, d, rows)
    return d


def test_prefix_filter_matches_bruteforce_on_crafted_corpus(spark, corpus_dir):
    """Lossless pruning: output == brute-force string-set Jaccard."""
    from rdbms_metadata_manager_spark.llm.dedup import (
        JACCARD_THRESHOLD,
        dedup_jaccard_prefix_filter,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{corpus_dir}/documents.parquet").collect()
    }
    expected = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = _shingle_set(texts[a]), _shingle_set(texts[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_THRESHOLD:
                expected[(a, b)] = j
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix_filter(spark, corpus_dir).collect()
    }
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert abs(got[k] - j) < 1e-12, k


def test_containment_finds_subset_quote_jaccard_misses(spark, corpus_dir):
    from rdbms_metadata_manager_spark.llm.dedup import (
        dedup_containment,
        dedup_jaccard_prefix_filter,
    )

    jacc_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_prefix_filter(spark, corpus_dir).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup_containment(spark, corpus_dir).collect()
    }
    # the quote pair: all 3 of doc 3's shingles appear in doc 1
    assert cont[(1, 3)] == 1.0
    assert (1, 3) not in jacc_pairs
    # the near-identical pair is found by both
    assert (1, 2) in cont and (1, 2) in jacc_pairs
    # unrelated docs appear in neither
    assert not any(4 in p for p in cont)


def test_skyline_known_frontier(spark, tmp_path_factory):
    from rdbms_metadata_manager_spark.queries.mining import skyline_customers

    d = str(tmp_path_factory.mktemp("skyline"))
    t0 = datetime.datetime(1995, 1, 1)
    orders = []

    def add(ck, prices):
        for i, p in enumerate(prices):
            orders.append((ck * 100 + i, ck, "O", p, t0, "1-URGENT"))

    add(1, [100.0, 10.0, 10.0])  # (3, 100) frontier
    add(2, [500.0])              # (1, 500) frontier
    add(3, [200.0, 50.0])        # (2, 200) frontier
    add(4, [400.0])              # dominated by c2 (1,500)
    add(5, [90.0, 5.0, 5.0])     # dominated by c1 (3,100)
    add(6, [100.0, 1.0, 1.0])    # ties c1 exactly — neither dominates
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    got = {
        r.o_custkey: (r.n_orders, r.best_order_cents)
        for r in skyline_customers(spark, d).collect()
    }
    assert got == {1: (3, 10000), 2: (1, 50000), 3: (2, 20000), 6: (3, 10000)}


def test_interp_fills_gap_linearly(spark, tmp_path_factory):
    from rdbms_metadata_manager_spark.queries.profiling import (
        resample_events_hourly_interp,
    )

    d = str(tmp_path_factory.mktemp("interp"))
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def hour(h, n):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=5), 7, "click", 1.0, "{}"))

    hour(0, 5)
    hour(1, 2)
    hour(4, 8)  # hours 2 and 3 are gaps: expect 4.0 and 6.0
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r.hour.hour: (r.n_events, r.is_gap, r.n_interp)
        for r in resample_events_hourly_interp(spark, d).collect()
    }
    assert got[0] == (5, False, 5.0)
    assert got[1] == (2, False, 2.0)
    assert got[2] == (0, True, 4.0)
    assert got[3] == (0, True, 6.0)
    assert got[4] == (8, False, 8.0)


def test_prefix_filter_never_indexes_hot_boilerplate_shingle(spark, tmp_path_factory):
    """The Σdf² guard, tested directly: 60 docs share one boilerplate
    opening (a df=60 shingle) but each has enough unique shingles
    that the hot one falls outside every prefix — so the hot posting
    list is never indexed and the candidate join stays linear. Also
    checks the end-to-end result: no pair reaches J ≥ 0.5."""
    from pyspark.sql import functions as F

    from rdbms_metadata_manager_spark.llm.dedup import (
        _prefix_postings,
        _shingled,
        dedup_jaccard_prefix_filter,
    )

    d = str(tmp_path_factory.mktemp("hot_shingle"))
    rows = [
        (i, f"the quick brown u{i}a u{i}b u{i}c u{i}d u{i}e", "en", "web", 0)
        for i in range(60)
    ]
    _write_docs(spark, d, rows)

    prefix = _prefix_postings(_shingled(spark, d))
    # every prefix slot is taken by a unique (df=1) shingle, and
    # df=1 postings are dropped from the join input entirely — the
    # indexed relation is EMPTY: zero join work on this corpus
    assert prefix.count() == 0
    # the full inverted index WOULD have had a 60-long posting list
    full = (
        _shingled(spark, d)
        .select(F.explode("hashes").alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert full == 60
    assert dedup_jaccard_prefix_filter(spark, d).count() == 0


def test_count_filter_soundness_contained_doc_hapax_prefix(spark, tmp_path_factory):
    """Regression (ADVICE r2, high): the count filter's overlap bound
    must be c + max(suffix_a, suffix_b), not min.  With min, a true
    pair is pruned when the contained doc's prefix is hapax-heavy:
    'a b c d e f' vs 'p q r s a b c d e f' share ALL 4 of doc 1's
    shingles (J = 4/8 = 0.5, exactly at threshold), but the shared
    shingles sort late in doc 2's (df, shingle) order so few land in
    both prefixes — min(suffixes) then under-bounds the overlap and
    the pair dies before verification."""
    from rdbms_metadata_manager_spark.llm.dedup import dedup_jaccard_prefix_filter

    d = str(tmp_path_factory.mktemp("count_filter"))
    _write_docs(
        spark,
        d,
        [
            (1, "a b c d e f", "en", "web", 0),
            (2, "p q r s a b c d e f", "en", "web", 0),
        ],
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_jaccard_prefix_filter(spark, d).collect()
    }
    assert (1, 2) in got, got
    assert abs(got[(1, 2)] - 0.5) < 1e-12


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.floats(1.0, 500.0, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_bruteforce_on_random_points(spark, tmp_path_factory, data):
    """Window-skyline ≡ quadratic dominance filter on random
    (n_orders, best_price) customer profiles, ties and all."""
    from rdbms_metadata_manager_spark.queries.mining import skyline_customers

    d = str(tmp_path_factory.mktemp("sky_prop"))
    t0 = datetime.datetime(1995, 1, 1)
    rows = []
    for ck, (n, price) in enumerate(data, start=1):
        for i in range(n):
            # one order carries the max price, the rest are below it
            p = round(price, 2) if i == 0 else 0.01
            rows.append((ck * 1000 + i, ck, "O", p, t0, "x"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    import math

    pts = {
        ck: (n, int(math.floor(round(price, 2) * 100 + 0.5)))
        for ck, (n, price) in enumerate(data, start=1)
    }
    expected = {
        ck
        for ck, (n, c) in pts.items()
        if not any(
            qn >= n and qc >= c and (qn > n or qc > c)
            for qk, (qn, qc) in pts.items()
            if qk != ck
        )
    }
    got = {r.o_custkey for r in skyline_customers(spark, d).collect()}
    assert got == expected, (sorted(got), sorted(expected), pts)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12),
        min_size=2,
        max_size=15,
    )
)
def test_prefix_filter_matches_bruteforce_on_random_corpora(
    spark, tmp_path_factory, word_lists
):
    """Lossless pruning on RANDOM small-alphabet corpora — heavy
    shingle collisions, ties in the df order, short docs."""
    from rdbms_metadata_manager_spark.llm.dedup import (
        JACCARD_THRESHOLD,
        dedup_jaccard_prefix_filter,
    )

    d = str(tmp_path_factory.mktemp("pp_prop"))
    texts = {i + 1: " ".join(ws) for i, ws in enumerate(word_lists)}
    _write_docs(spark, d, [(i, t, "en", "web", 0) for i, t in texts.items()])

    expected = set()
    ids = sorted(texts)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            sa, sb = _shingle_set(texts[a]), _shingle_set(texts[b])
            if sa and sb and len(sa & sb) / len(sa | sb) >= JACCARD_THRESHOLD:
                expected.add((a, b))
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_prefix_filter(spark, d).collect()
    }
    assert got == expected, (sorted(got), sorted(expected), texts)
