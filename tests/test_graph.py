"""Property + plan tests for the graph (PageRank) and PII operators
beyond the registry-wide oracle parity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.llm.pii import pii_redaction
from rdbms_metadata_manager_spark.queries.graph import (
    BASE,
    N_NATIONS,
    _build_trade_edges,
    pagerank_trade_graph,
)

from test_plans import physical_plan


def test_pagerank_edge_build_is_scale_shaped(spark, sf_dir):
    """The heavy stage must partially aggregate map-side before the
    (src, dst) shuffle and broadcast the supplier dim. Asserted on
    the UNCHECKPOINTED builder — _trade_edges itself memoizes a
    localCheckpoint whose visible plan is just the RDD scan."""
    plan = physical_plan(_build_trade_edges(spark, sf_dir))
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pagerank_mass_and_floor(spark, sf_dir):
    ranks = {r.n_nationkey: r.pagerank for r in pagerank_trade_graph(spark, sf_dir).collect()}
    assert len(ranks) == N_NATIONS
    # damped rank mass is conserved when every node has out-edges
    # (every nation trades at every sf); rounding adds ≤25 × 5e-7
    assert abs(sum(ranks.values()) - 1.0) < 1e-3, sum(ranks.values())
    # every node keeps at least the teleport floor
    assert all(r >= BASE for r in ranks.values()), ranks


def test_pii_redaction_removes_all_pii(spark, sf_dir):
    df = pii_redaction(spark, sf_dir)
    # exactly one email and one phone constructed per note, all gone after redaction
    bad = df.filter(
        (F.col("n_emails") != 1)
        | (F.col("n_phones") != 1)
        | F.col("redacted").contains("@")
        | F.col("redacted").rlike("\\d{3}-\\d{4}")
        | ~F.col("redacted").contains("[EMAIL]")
        | ~F.col("redacted").contains("[PHONE]")
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_kcore_peels_chain_and_subthreshold_clique(spark, tmp_path):
    """Crafted graph, k = ceil(E/N) = ceil(18/11) = 2: the pendant
    chain (degrees 1-2) peels in cascading rounds — removing its tip
    drops the next node below k — while both cliques survive.
    Expected core: K5 + K4 = 9 nodes, 16 edges, max degree 4."""
    d = str(tmp_path)
    rows = []
    # order 1: parts 1-5 → K5 clique
    rows += [(1, p) for p in range(1, 6)]
    # order 2: parts 11-14 → K4 clique (below threshold)
    rows += [(2, p) for p in range(11, 15)]
    # chain: 5-21, 21-22 (pendant path off the clique)
    rows += [(3, 5), (3, 21), (4, 21), (4, 22)]
    spark.createDataFrame(
        [(o, p, 1.0) for o, p in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    ).write.parquet(f"{d}/lineitem.parquet")
    from rdbms_metadata_manager_spark.queries.mining import kcore_copurchase_parts

    got = kcore_copurchase_parts(spark, d).collect()[0]
    assert (got.n_core_nodes, got.n_core_edges, got.max_core_degree) == (9, 16, 4)


def test_kcore_reaches_fixpoint_within_round_budget(spark, sf_dir, monkeypatch):
    """The 'k-core' label requires the peel to CONVERGE within
    K_CORE_ROUNDS on the testdata (the oracle unrolls exactly that
    many rounds): raising the budget must not change the answer."""
    from rdbms_metadata_manager_spark.queries import mining

    base = [tuple(r) for r in mining.kcore_copurchase_parts(spark, sf_dir).collect()]
    monkeypatch.setattr(mining, "K_CORE_ROUNDS", mining.K_CORE_ROUNDS + 4)
    more = [tuple(r) for r in mining.kcore_copurchase_parts(spark, sf_dir).collect()]
    assert base == more


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: deterministic min-tie
    LPA must label each clique by its internal consensus after 2
    rounds — frequency wins over the bridge (unlike connected
    components, which would merge everything into one label)."""
    from itertools import combinations

    from rdbms_metadata_manager_spark.queries.mining import _propagate_labels

    clique_a = list(combinations([1, 2, 3, 4], 2))
    clique_b = list(combinations([10, 11, 12, 13], 2))
    edges = spark.createDataFrame(clique_a + clique_b + [(4, 10)], "a long, b long")
    got = {r.node: r.label for r in _propagate_labels(edges, 2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}, got


def test_bigram_lm_scores_hand_corpus(spark):
    """Hand-checkable corpus: C(a,b)=3, C(b,a)=1, C(b,c)=1, C(x,y)=1;
    C1: a=3, b=2, x=1 → doc 1 averages (1000+500+1000+500)/4."""
    from rdbms_metadata_manager_spark.llm.text import _bigram_scores

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "x y"), (4, "solo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score_permille, r.min_bigram_permille)
        for r in _bigram_scores(docs).collect()
    }
    # doc 4 has a single token -> no bigrams -> excluded by construction
    assert got == {1: (4, 750, 500), 2: (1, 1000, 1000), 3: (1, 1000, 1000)}, got


def test_k_anonymity_hand_classes(spark):
    """One class of 5 (safe at k=5) + one class of 2 (violating):
    at-risk rows = 2 of 7 -> 285 per-mille."""
    from rdbms_metadata_manager_spark.llm.pii import _k_anonymity

    rows = [(0, "AUTO", 100.0)] * 5 + [(1, "BIKE", 2500.0)] * 2
    customer = spark.createDataFrame(
        rows, "c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    r = _k_anonymity(customer).collect()[0]
    assert (r.n_classes, r.n_violating_classes, r.n_records_at_risk, r.at_risk_permille) == (
        2, 1, 2, 285,
    ), r


def test_bfs_levels_hand_graph(spark, sf_dir, monkeypatch):
    """Path 1-2-3-4-5 plus a detached edge (10,11): from hub 1 the
    levels are 1 node each at dist 0..3, and {5, 10, 11} stay
    unreachable within 3 rounds (5 is at dist 4)."""
    from rdbms_metadata_manager_spark.queries import mining

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long"
    )
    # patch the memoized edge kernel itself: _copurchase_edges caches
    # by (sf_dir, app) and would otherwise serve the real corpus —
    # and reset the derived adjacency memo, which caches under the
    # same key and would serve the real corpus even through the patch
    monkeypatch.setattr(mining, "_copurchase_edges", lambda s, d: edges)
    monkeypatch.setattr(mining, "_ADJ_CACHE", {})
    got = {r.dist: r.n_nodes for r in mining.bfs_levels_from_hub(spark, sf_dir).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, -1: 3}, got


def test_link_prediction_known_graph(spark, tmp_path):
    """Hub 1 with N(1)={2,3}: node 4 shares both neighbors (AA =
    1e6//deg(2) + 1e6//deg(3)), node 5 shares only node 2; existing
    neighbors and the hub itself must not appear as candidates."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdbms_metadata_manager_spark.queries.mining import link_prediction_hub_cn

    baskets = [(1, 2), (1, 3), (2, 4), (3, 4), (2, 5)]
    li = pd.DataFrame(
        {
            "l_orderkey": [i for i, pair in enumerate(baskets) for _ in pair],
            "l_partkey": [p for pair in baskets for p in pair],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
    rows = {r.part: r for r in link_prediction_hub_cn(spark, str(tmp_path)).collect()}
    assert set(rows) == {4, 5}
    assert rows[4].common_neighbors == 2
    assert rows[4].aa_micro == 1_000_000 // 3 + 1_000_000 // 2
    assert rows[5].common_neighbors == 1
    assert rows[5].aa_micro == 1_000_000 // 3
