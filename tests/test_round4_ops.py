"""Round-4 operators: independent-reference semantic tests.

Each operator already hash-matches its DuckDB oracle at three scales
(tests/test_oracle_parity.py covers sf0.001 in-suite); these tests
check the SEMANTICS against a second, independent implementation
(plain Python/numpy over collected inputs) so an oracle that encoded
the same mistake as the engine would still be caught."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_scan_similarity_matches_python_set_jaccard(spark, sf_dir):
    """Top-50 SCAN edges vs a from-scratch Python computation:
    neighborhoods as sets, common = |N(a)∩N(b)|, integer-permille
    Jaccard, same (sim desc, a, b) cut."""
    from rdbms_metadata_manager_spark.queries.mining import (
        SCAN_TOP_EDGES,
        _copurchase_edges,
        scan_structural_similarity,
    )

    edges = [(r.a, r.b) for r in _copurchase_edges(spark, sf_dir).collect()]
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    for a, b in edges:
        common = len(nbrs[a] & nbrs[b])
        da, db = len(nbrs[a]), len(nbrs[b])
        rows.append((a, b, common, da, db, 1000 * common // (da + db - common)))
    want = sorted(rows, key=lambda r: (-r[5], r[0], r[1]))[:SCAN_TOP_EDGES]
    got = [tuple(r) for r in scan_structural_similarity(spark, sf_dir).collect()]
    assert got == want


def test_cusum_kernel_finds_planted_level_shift(spark):
    """A hand-built step series (20 days at 100, then 20 days at 200)
    must score its argmax exactly at the step boundary, and the score
    must equal the closed-form integer formula."""
    from rdbms_metadata_manager_spark.queries.forecast import _cusum_report

    series = spark.createDataFrame(
        [(d, 100 if d < 20 else 200) for d in range(40)], "day_idx long, x long"
    )
    got = _cusum_report(series).collect()
    # boundary split: n_left=20, s_left=2000, S=6000, N=40
    # score = (40*2000 - 20*6000)^2 // (40*20*20) = 1.6e9 // 16000 = 100000
    assert got[0].day_idx == 19
    assert (got[0].n_left, got[0].n_right) == (20, 20)
    assert got[0].cusum_score == (40 * 2000 - 20 * 6000) ** 2 // (40 * 20 * 20)
    # scores strictly decay moving away from the true changepoint
    by_day = {r.day_idx: r.cusum_score for r in got}
    assert set(by_day) == {17, 18, 19, 20, 21}


def test_cusum_is_flat_zero_on_constant_series(spark):
    from rdbms_metadata_manager_spark.queries.forecast import _cusum_report

    series = spark.createDataFrame(
        [(d, 7) for d in range(10)], "day_idx long, x long"
    )
    got = _cusum_report(series).collect()
    assert got and all(r.cusum_score == 0 for r in got)


def test_mmr_matches_independent_numpy_greedy(spark, sf_dir):
    """MMR selection vs a from-scratch numpy implementation over the
    raw embeddings: same candidate pool, same greedy, independent
    float path (numpy vectorized cosine vs the SQL fold) — selected
    ids must agree exactly, scores to 1e-9."""
    import numpy as np

    from rdbms_metadata_manager_spark.llm.similarity import (
        MMR_CANDIDATES,
        MMR_SELECT,
        similarity_mmr_rerank,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    qv = emb[0]

    def cos(u, v):
        return float(u @ v / (np.sqrt(u @ u) * np.sqrt(v @ v)))

    rel = {i: cos(v, qv) for i, v in emb.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CANDIDATES]
    chosen: list[int] = []
    want = []
    for rank in range(1, MMR_SELECT + 1):
        best = None
        for c in cand:
            if c in chosen:
                continue
            pen = max((cos(emb[c], emb[s]) for s in chosen), default=0.0)
            score = 0.7 * rel[c] - 0.3 * pen
            if best is None or score > best[1]:
                best = (c, score)
        want.append((rank, best[0], rel[best[0]], best[1]))
        chosen.append(best[0])

    got = [tuple(r) for r in similarity_mmr_rerank(spark, sf_dir).collect()]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-9)
        assert g[3] == pytest.approx(w[3], abs=1e-9)


def test_fertility_matches_python_bpe_encode(spark, sf_dir):
    """Fertility totals vs a sequential Python BPE: re-apply the
    learned merge table greedily left-to-right per word (the Sennrich
    reference semantics) and recount tokens per source."""
    from rdbms_metadata_manager_spark.llm.bpe import (
        bpe_train_merges,
        tokenizer_fertility_report,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    merges = [
        (r.sym_a, r.sym_b) for r in bpe_train_merges(spark, sf_dir).collect()
    ]

    def encode(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    want: dict[str, list[int]] = {}
    tok_cache: dict[str, int] = {}
    for r in docs:
        for w in r.text.split(" "):
            if not w:
                continue
            if w not in tok_cache:
                tok_cache[w] = encode(w)
            agg = want.setdefault(r.source, [0, 0, 0])  # words, chars, tokens
            agg[0] += 1
            agg[1] += len(w)
            agg[2] += tok_cache[w]

    got = {r.source: r for r in tokenizer_fertility_report(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for src, (nw, nc, nt) in want.items():
        g = got[src]
        assert (g.n_words, g.n_chars, g.n_tokens) == (nw, nc, nt)
        assert g.tokens_per_word_micro == 1_000_000 * nt // nw
        assert g.chars_per_token_micro == 1_000_000 * nc // nt


def test_mmr_first_pick_is_pure_relevance(spark, sf_dir):
    """Rank-1 must be the plain cosine argmax (empty-set penalty is
    zero) with score exactly 0.7·rel; ranks contiguous, ids distinct.
    (No upper bound on later scores: max-sim to the selected set can
    be NEGATIVE on these near-orthogonal embeddings, which RAISES the
    MMR score above 0.7·rel — correct per the formula.)"""
    from rdbms_metadata_manager_spark.llm.similarity import (
        similarity_mmr_rerank,
        similarity_topk_bruteforce,
    )

    got = similarity_mmr_rerank(spark, sf_dir).collect()
    top1 = similarity_topk_bruteforce(spark, sf_dir).collect()[0]
    assert got[0].vec_id == top1.vec_id
    assert got[0].mmr_score == 0.7 * got[0].relevance
    assert [g.rank for g in got] == list(range(1, len(got) + 1))
    assert len({g.vec_id for g in got}) == len(got)


def test_filtered_topk_matches_numpy_prefilter(spark, sf_dir):
    """Filtered vector search vs a from-scratch numpy implementation:
    PRE-filter to label==FILTER_LABEL (excluding the query row), then
    exact cosine top-K with the same (cosine desc, vec_id) cut. Also
    pins the pre-filter contract: every returned row carries the
    filter label, and the result is exactly min(K, #matching) rows —
    a post-filtered top-K would return fewer."""
    import numpy as np

    from rdbms_metadata_manager_spark.llm.similarity import (
        FILTER_LABEL,
        FILTERED_TOP_K,
        similarity_filtered_topk,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    lab = {r.vec_id: r.label for r in rows}
    qv = emb[0]

    def cos(u, v):
        return float(u @ v / (np.sqrt(u @ u) * np.sqrt(v @ v)))

    pool = [i for i in emb if i != 0 and lab[i] == FILTER_LABEL]
    want = sorted(((i, cos(emb[i], qv)) for i in pool), key=lambda t: (-t[1], t[0]))
    want = want[:FILTERED_TOP_K]

    got = [tuple(r) for r in similarity_filtered_topk(spark, sf_dir).collect()]
    assert len(got) == min(FILTERED_TOP_K, len(pool))
    assert all(g[1] == FILTER_LABEL for g in got)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[1], abs=1e-9)


def test_binary_rerank_matches_numpy_hamming_pipeline(spark, sf_dir):
    """Binary-quantized search vs a from-scratch numpy pipeline:
    sign-bit codes, Hamming candidate cut (hamming asc, vec_id), then
    exact cosine rerank — both cuts replayed with the same tiebreaks.
    Also pins the compression contract: every Hamming distance the
    engine reports equals the number of sign-disagreeing dims."""
    import numpy as np

    from rdbms_metadata_manager_spark.llm.quantize import (
        HAM_CANDIDATES,
        HAM_RERANK_K,
        similarity_binary_rerank,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qsign = emb[0] >= 0

    def ham(i):
        return int(((emb[i] >= 0) != qsign).sum())

    cand = sorted((i for i in emb if i != 0), key=lambda i: (ham(i), i))
    cand = cand[:HAM_CANDIDATES]

    def cos(i):
        u, v = emb[i], emb[0]
        return float(u @ v / (np.sqrt(u @ u) * np.sqrt(v @ v)))

    want = sorted(cand, key=lambda i: (-cos(i), i))[:HAM_RERANK_K]
    got = similarity_binary_rerank(spark, sf_dir).collect()
    assert [g.vec_id for g in got] == want
    for g in got:
        assert g.hamming == ham(g.vec_id)
        assert g.cosine == pytest.approx(cos(g.vec_id), abs=1e-9)


def test_l_diversity_matches_python_recount(spark, sf_dir):
    """l-diversity summary vs a plain-Python recount over collected
    customers: same /100 band, distinct segments per (nation, band),
    exposure below L_DIV."""
    import math

    from rdbms_metadata_manager_spark.llm.pii import L_DIV, l_diversity_audit
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "customer").collect()
    classes: dict[tuple, list] = {}
    for r in rows:
        key = (r.c_nationkey, math.floor(r.c_acctbal / 100))
        classes.setdefault(key, []).append(r.c_mktsegment)
    n_exposed = sum(1 for v in classes.values() if len(set(v)) < L_DIV)
    rec_exposed = sum(len(v) for v in classes.values() if len(set(v)) < L_DIV)
    min_l = min(len(set(v)) for v in classes.values())
    got = l_diversity_audit(spark, sf_dir).collect()[0]
    assert got.n_classes == len(classes)
    assert got.n_exposed_classes == n_exposed
    assert got.n_records_exposed == rec_exposed
    assert got.min_l == min_l
    assert got.exposed_permille == 1000 * rec_exposed // len(rows)


def test_matryoshka_recall_matches_numpy_prefix_topk(spark, sf_dir):
    """Truncation-recall report vs a from-scratch numpy replay: tick
    quantization, prefix-dot cosines, per-(query, dim) top-K with the
    (cos desc, vec_id) tiebreak, overlap against the full-dim top-K.
    Also pins monotone sanity: dim=64 would be perfect recall (the
    engine reports prefixes only), and hits ∈ [0, K]."""
    import numpy as np

    from rdbms_metadata_manager_spark.llm.projection import (
        MAT_DIMS,
        MAT_K,
        MAT_QUERIES,
        matryoshka_truncation_recall,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()
    ticks = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in rows
    }
    pool = sorted(i for i in ticks if i >= MAT_QUERIES)

    def topk(qid, d):
        qt = ticks[qid][:d]
        scored = []
        for i in pool:
            t = ticks[i][:d]
            vn, qn = int(t @ t), int(qt @ qt)
            c = -2.0 if vn * qn == 0 else float(int(qt @ t)) / np.sqrt(float(vn * qn))
            scored.append((i, c))
        scored.sort(key=lambda s: (-s[1], s[0]))
        return {i for i, _ in scored[:MAT_K]}

    got = matryoshka_truncation_recall(spark, sf_dir).collect()
    assert len(got) == MAT_QUERIES * len(MAT_DIMS)
    for g in got:
        want = len(topk(g.query_id, g.dim) & topk(g.query_id, 64))
        assert (g.hits, g.recall_permille) == (want, 1000 * want // MAT_K), (
            g.query_id,
            g.dim,
        )
        assert 0 <= g.hits <= MAT_K


def test_retrieval_eval_matches_numpy_ir_metrics(spark, sf_dir):
    """IR metrics vs a from-scratch numpy replay: exact-cosine top-K
    per query with the (cos desc, vec_id) tiebreak, relevance = label
    equality, integer per-mille precision/recall and MRR = 1000 //
    first-relevant-rank."""
    import numpy as np

    from rdbms_metadata_manager_spark.llm.ranking import (
        EVAL_K,
        N_EVAL_QUERIES,
        retrieval_eval_metrics,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    lab = {r.vec_id: r.label for r in rows}
    pool = sorted(i for i in emb if i >= N_EVAL_QUERIES)

    def cos(u, v):
        return float(u @ v / (np.sqrt(u @ u) * np.sqrt(v @ v)))

    got = retrieval_eval_metrics(spark, sf_dir).collect()
    assert len(got) == min(N_EVAL_QUERIES, len(emb))
    for g in got:
        qv, ql = emb[g.query_id], lab[g.query_id]
        ranked = sorted(pool, key=lambda i: (-cos(emb[i], qv), i))[:EVAL_K]
        rel = [i for i in ranked if lab[i] == ql]
        n_relevant = sum(1 for i in pool if lab[i] == ql)
        hits = len(rel)
        first = ranked.index(rel[0]) + 1 if rel else None
        assert g.n_relevant == n_relevant
        assert g.hits == hits
        assert g.precision_permille == hits * 1000 // EVAL_K
        assert g.recall_permille == (hits * 1000 // n_relevant if n_relevant else 0)
        assert g.mrr_permille == (1000 // first if first else 0)


def test_label_noise_audit_matches_python_knn_vote(spark, sf_dir):
    """Label-noise audit vs a from-scratch pure-Python replay,
    including the LSH bucket construction (md5 plane components, the
    same ascending-d left fold), tick dots, (cos desc, vec_id)
    neighbour cut, and the majority flag."""
    import hashlib
    import math

    from rdbms_metadata_manager_spark.llm.similarity import (
        DIM,
        N_PLANES,
        NN_K,
        label_noise_knn_audit,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()

    def comp(p, d):
        h = hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8]
        return int(h, 16) / 4294967296.0 - 0.5

    comps = [[comp(p, d) for d in range(DIM)] for p in range(N_PLANES)]

    def bucket(v):
        out = 0
        for p in range(N_PLANES):
            acc = 0.0
            for d in range(DIM):
                acc = acc + float(v[d]) * comps[p][d]
            if acc > 0:
                out += 1 << p
        return out

    by_bucket: dict[int, list] = {}
    info = {}
    for r in rows:
        v = [float(x) for x in r.embedding]
        b = bucket(v)
        tk = [math.floor(x * 1000) for x in v]
        info[r.vec_id] = (r.label, b, tk)
        by_bucket.setdefault(b, []).append(r.vec_id)

    def cos(ti, tj):
        dot = sum(a * b for a, b in zip(ti, tj))
        vn = sum(a * a for a in ti)
        wn = sum(a * a for a in tj)
        return -2.0 if vn * wn == 0 else dot / math.sqrt(vn * wn)

    got = label_noise_knn_audit(spark, sf_dir).collect()
    assert len(got) == len(rows)
    for g in got:
        lab, b, tk = info[g.vec_id]
        assert (g.label, g.bucket) == (lab, b)
        others = [j for j in by_bucket[b] if j != g.vec_id]
        k = min(NN_K, len(others))
        nbrs = sorted(others, key=lambda j: (-cos(tk, info[j][2]), j))[:k]
        n_same = sum(1 for j in nbrs if info[j][0] == lab)
        assert (g.n_neighbors, g.n_same) == (k, n_same), (g.vec_id, nbrs)
        assert g.flagged == (k > 0 and 2 * n_same < k)


def test_coreset_kcenter_matches_python_greedy(spark, sf_dir):
    """k-center greedy vs a from-scratch integer replay: seed vec 0,
    then argmax of min squared tick distance with the (dist2 desc,
    vec_id) tie-break. Also pins the greedy invariant: dist2 (the
    covering radius² at selection time) is non-increasing in rank."""
    import math

    from rdbms_metadata_manager_spark.llm.sampling import (
        CORESET_K,
        coreset_kcenter_sample,
    )
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "embeddings").collect()
    tk = {
        r.vec_id: [math.floor(float(x) * 1000) for x in r.embedding] for r in rows
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(tk[a], tk[b]))

    want = [(1, 0, 0)]
    chosen = [0]
    for rank in range(2, min(CORESET_K, len(tk)) + 1):
        best = None
        for v in sorted(tk):
            if v in chosen:
                continue
            mind = min(d2(v, c) for c in chosen)
            if best is None or mind > best[1]:
                best = (v, mind)
        want.append((rank, best[0], best[1]))
        chosen.append(best[0])

    got = [(r.rank, r.vec_id, r.dist2) for r in coreset_kcenter_sample(spark, sf_dir).collect()]
    assert got == want
    radii = [g[2] for g in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_partition_advisor_matches_python_recount(spark, sf_dir):
    """Layout advisor vs a plain-Python recount: per candidate key,
    partition count, row stats, integer skew, and the health band."""
    from collections import Counter

    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.profiling import (
        PART_MAX_PARTS,
        PART_MAX_SKEW_PERMILLE,
        PART_MIN_PARTS,
        partition_layout_advisor,
    )

    rows = load(spark, sf_dir, "orders").collect()
    keys = {
        "order_month": lambda r: r.o_orderdate.strftime("%Y-%m"),
        "order_year": lambda r: r.o_orderdate.year,
        "order_priority": lambda r: r.o_orderpriority,
        "order_status": lambda r: r.o_orderstatus,
        "cust_bucket_1k": lambda r: r.o_custkey % 1024,
    }
    got = {r.candidate: r for r in partition_layout_advisor(spark, sf_dir).collect()}
    assert set(got) == set(keys)
    for name, keyfn in keys.items():
        counts = Counter(keyfn(r) for r in rows)
        n_parts, total = len(counts), sum(counts.values())
        mn, mx = min(counts.values()), max(counts.values())
        avg = total // n_parts
        skew = mx * 1000 // avg
        g = got[name]
        assert (g.n_partitions, g.total_rows, g.min_rows, g.max_rows) == (
            n_parts, total, mn, mx,
        ), name
        assert (g.avg_rows, g.skew_permille) == (avg, skew), name
        assert g.recommended == (
            PART_MIN_PARTS <= n_parts <= PART_MAX_PARTS
            and skew <= PART_MAX_SKEW_PERMILLE
        ), name


def test_join_advisor_matches_python_recount(spark, sf_dir):
    """Join-strategy advisor vs a plain-Python recount over the five
    edges: build rows, probe key stats, integer skew, and the
    broadcast/salt/shuffle decision rule."""
    from collections import Counter

    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.profiling import (
        _JOIN_EDGES,
        BROADCAST_MAX_ROWS,
        SALT_SKEW_PERMILLE,
        join_strategy_advisor,
    )

    got = {r.edge: r for r in join_strategy_advisor(spark, sf_dir).collect()}
    assert set(got) == {e[0] for e in _JOIN_EDGES}
    for edge, build_t, probe_t, key in _JOIN_EDGES:
        build_rows = len(load(spark, sf_dir, build_t).collect())
        counts = Counter(r[key] for r in load(spark, sf_dir, probe_t).collect())
        keys, total = len(counts), sum(counts.values())
        mx = max(counts.values())
        avg = total // keys
        skew = mx * 1000 // avg
        g = got[edge]
        assert (g.build_rows, g.probe_keys, g.probe_rows) == (build_rows, keys, total)
        assert (g.max_per_key, g.avg_per_key, g.skew_permille) == (mx, avg, skew)
        want = (
            "broadcast"
            if build_rows <= BROADCAST_MAX_ROWS
            else ("salted_shuffle" if skew >= SALT_SKEW_PERMILLE else "shuffle")
        )
        assert g.strategy == want, edge


def _write_embeddings_dir(tmp_path, vecs, labels=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels or [0] * len(vecs), type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_coreset_certificate_survives_all_ties_geometry(spark, tmp_path):
    """Adversarial geometry for the certified-pool greedy: 300
    near-one-hot vectors where EVERY pairwise distance ties, so the
    pool cutoff equals every candidate's min-dist, the strict-
    inequality certificate fails on every pick, and the refresh path
    must carry all K−1 rounds — and still reproduce the brute-force
    greedy (which degenerates to the vec_id tie-break)."""
    import math

    from rdbms_metadata_manager_spark.llm.sampling import (
        CORESET_K,
        coreset_kcenter_sample,
    )

    n, dim = 300, 64
    vecs = [[1.0 if d == i % dim else 0.0 for d in range(dim)] for i in range(n)]
    d = _write_embeddings_dir(tmp_path, vecs)

    tk = {i: [math.floor(x * 1000) for x in vecs[i]] for i in range(n)}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(tk[a], tk[b]))

    want = [(1, 0, 0)]
    chosen = [0]
    for rank in range(2, CORESET_K + 1):
        best = None
        for v in range(n):
            if v in chosen:
                continue
            mind = min(d2(v, c) for c in chosen)
            if best is None or mind > best[1]:
                best = (v, mind)
        want.append((rank, best[0], best[1]))
        chosen.append(best[0])

    got = [(r.rank, r.vec_id, r.dist2) for r in coreset_kcenter_sample(spark, d).collect()]
    assert got == want
    # the tie geometry really is total: every pick after the seed has
    # the identical distance and the ids are consecutive
    assert [g[1] for g in got] == list(range(CORESET_K))
    assert len({g[2] for g in got[1:]}) == 1


def test_label_noise_ties_break_by_vec_id(spark, tmp_path):
    """Duplicate vectors share one LSH bucket and tie at cosine 1.0 —
    the neighbour cut must break ties by ascending vec_id in both the
    kernel (lexsort) and the oracle (ORDER BY ..., j)."""
    from rdbms_metadata_manager_spark.llm.similarity import (
        NN_K,
        label_noise_knn_audit,
    )

    n, dim = 10, 64
    vecs = [[0.25] * dim for _ in range(n)]  # all identical → one bucket
    labels = [0, 0, 0, 1, 1, 1, 1, 1, 1, 1]
    d = _write_embeddings_dir(tmp_path, vecs, labels)
    got = {r.vec_id: r for r in label_noise_knn_audit(spark, d).collect()}
    assert len(got) == n
    for i in range(n):
        nbrs = [j for j in range(n) if j != i][:NN_K]  # vec_id-ascending
        n_same = sum(1 for j in nbrs if labels[j] == labels[i])
        g = got[i]
        assert (g.n_neighbors, g.n_same) == (NN_K, n_same), i
        assert g.flagged == (2 * n_same < NN_K), i


def test_gdpr_erasure_cascade_matches_python_recount(spark, sf_dir):
    """Erasure audit vs a plain-Python FK-cascade recount."""
    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.quality import (
        ERASURE_MOD,
        ERASURE_RESIDUE,
        gdpr_erasure_audit,
    )

    cust = load(spark, sf_dir, "customer").collect()
    orders = load(spark, sf_dir, "orders").collect()
    li = load(spark, sf_dir, "lineitem").collect()
    subj = {r.c_custkey for r in cust if r.c_custkey % ERASURE_MOD == ERASURE_RESIDUE}
    hit_o = {r.o_orderkey for r in orders if r.o_custkey in subj}
    hit_l = sum(1 for r in li if r.l_orderkey in hit_o)
    got = {r.table_name: r for r in gdpr_erasure_audit(spark, sf_dir).collect()}
    want = {
        "customer": (len(subj), len(cust)),
        "orders": (len(hit_o), len(orders)),
        "lineitem": (hit_l, len(li)),
    }
    for t, (n, total) in want.items():
        assert (got[t].rows_to_erase, got[t].table_rows) == (n, total), t
        assert got[t].share_permille == n * 1000 // total, t


def test_cluster_safe_split_keeps_families_together(spark, sf_dir):
    """The near-dup-cluster-keyed split: every member of a connected
    component must land in the same split, the rep must equal the
    component's min doc_id (singletons: their own id), and the
    bucket must equal the doc_id-keyed splitter's bucket FOR THE REP
    (same hash machinery, coarser key)."""
    from pyspark.sql import functions as F

    from rdbms_metadata_manager_spark.llm.clustering import (
        cluster_safe_split,
        dedup_clusters,
    )

    split = cluster_safe_split(spark, sf_dir)
    fam = split.groupBy("cluster_rep").agg(
        F.countDistinct("split").alias("n_splits"), F.count("*").alias("n")
    )
    assert fam.filter(F.col("n_splits") > 1).count() == 0
    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_dir).collect()}
    rows = split.collect()
    assert len(rows) > 0
    multi = 0
    for r in rows:
        assert r.cluster_rep == labels.get(r.doc_id, r.doc_id)
        assert (r.split == "train") == (r.bucket < 80)
        if r.doc_id in labels and labels[r.doc_id] != r.doc_id:
            multi += 1
    assert multi > 0  # the planted near-dup families actually exercise it


def test_activity_streaks_matches_python_islands(spark, sf_dir):
    """Gaps-and-islands streaks vs a plain-Python recount of
    consecutive-day runs per user."""
    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.cohort import user_activity_streaks

    rows = load(spark, sf_dir, "events").collect()
    days: dict[int, set] = {}
    for r in rows:
        days.setdefault(r.user_id, set()).add(r.ts.date())
    got = {r.user_id: r for r in user_activity_streaks(spark, sf_dir).collect()}
    assert set(got) == set(days)
    for uid, ds in days.items():
        sd = sorted(ds)
        streaks = []
        run = 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                run += 1
            else:
                streaks.append(run)
                run = 1
        streaks.append(run)
        g = got[uid]
        assert (g.n_active_days, g.n_streaks, g.max_streak) == (
            len(ds), len(streaks), max(streaks),
        ), uid


def test_dp_sensitivity_matches_python_recount(spark, sf_dir):
    """DP sensitivity audit vs a plain-Python recount: per-user
    integer contributions, percentile_disc = sorted[ceil(q*n)-1],
    and the p99-clip mass loss in integer per-mille."""
    import math

    from rdbms_metadata_manager_spark.llm.pii import dp_sensitivity_audit
    from rdbms_metadata_manager_spark.queries.base import load

    rows = load(spark, sf_dir, "events").collect()
    per_user: dict[int, list[int]] = {}
    for r in rows:
        c = per_user.setdefault(r.user_id, [0, 0])
        c[0] += 1
        c[1] += math.floor(r.value * 100)

    def pdisc(vals, q):
        s = sorted(vals)
        return s[math.ceil(q * len(s)) - 1]

    got = {r.metric: r for r in dp_sensitivity_audit(spark, sf_dir).collect()}
    for metric, idx in (("event_count", 0), ("value_cents_sum", 1)):
        vals = [c[idx] for c in per_user.values()]
        g = got[metric]
        assert g.n_users == len(vals)
        assert g.max_contribution == max(vals)
        assert (g.p50, g.p99) == (pdisc(vals, 0.5), pdisc(vals, 0.99))
        clip = g.p99
        loss = 1000 * sum(max(v - clip, 0) for v in vals) // sum(vals)
        assert g.clipped_loss_permille == loss, metric


def test_constraint_mining_matches_python_recount(spark, sf_dir):
    """Constraint discovery vs a plain-Python recount: uniqueness,
    null completeness, and FK value containment with the same
    integer per-mille support."""
    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.quality import (
        _FK_CANDIDATES,
        _UNIQ_CANDIDATES,
        constraint_mining,
    )

    cache = {}

    def vals(table, col):
        if table not in cache:
            cache[table] = load(spark, sf_dir, table).collect()
        return [getattr(r, col) for r in cache[table]]

    got = {(r.kind, r.subject, r.target): r for r in constraint_mining(spark, sf_dir).collect()}
    for table, col in _UNIQ_CANDIDATES:
        v = vals(table, col)
        g = got[("unique", f"{table}.{col}", "")]
        nd = len(set(v))
        assert (g.n_rows, g.support_permille, g.holds) == (
            len(v), 1000 * nd // len(v), nd == len(v),
        )
        g = got[("not_null", f"{table}.{col}", "")]
        nn = sum(1 for x in v if x is not None)
        assert (g.n_rows, g.support_permille, g.holds) == (
            len(v), 1000 * nn // len(v), nn == len(v),
        )
    for ct, cc, pt, pc in _FK_CANDIDATES:
        child = set(vals(ct, cc))
        parent = set(vals(pt, pc))
        g = got[("foreign_key", f"{ct}.{cc}", f"{pt}.{pc}")]
        n_in = len(child & parent)
        assert (g.n_rows, g.support_permille) == (len(child), 1000 * n_in // len(child))
        assert g.holds == (1000 * n_in // len(child) >= 1000)
    # the miner actually discriminates on this schema
    assert got[("unique", "orders.o_orderkey", "")].holds
    assert not got[("unique", "orders.o_custkey", "")].holds
    assert all(
        got[("foreign_key", f"{ct}.{cc}", f"{pt}.{pc}")].holds
        for ct, cc, pt, pc in _FK_CANDIDATES
    )


def test_zorder_report_matches_python_morton(spark, sf_dir):
    """Z-order locality report vs a plain-Python Morton recount, and
    the locality property itself: each single-key layout is perfect
    on its own key (avg 1.000) while z-order bounds BOTH dimensions
    strictly better than the off-dimension of either sort."""
    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.profiling import (
        ZORDER_BITS,
        zorder_locality_report,
    )

    rows = load(spark, sf_dir, "orders").collect()
    import datetime as dt

    d0 = dt.date(1992, 1, 1)
    pts = [
        (r.o_custkey % 256, (r.o_orderdate.date() - d0).days % 256) for r in rows
    ]

    def morton(a, b):
        m = 0
        for i in range(ZORDER_BITS):
            m |= ((a >> i) & 1) << (2 * i + 1)
            m |= ((b >> i) & 1) << (2 * i)
        return m

    got = {r.layout: r for r in zorder_locality_report(spark, sf_dir).collect()}
    for layout, key in (
        ("custkey_sort", lambda p: p[0]),
        ("date_sort", lambda p: p[1]),
        ("zorder", lambda p: morton(p[0], p[1]) >> ZORDER_BITS),
    ):
        buckets: dict[int, list] = {}
        for p in pts:
            buckets.setdefault(key(p), []).append(p)
        n_cust = sum(len({p[0] for p in v}) for v in buckets.values())
        n_days = sum(len({p[1] for p in v}) for v in buckets.values())
        g = got[layout]
        assert g.n_buckets == len(buckets)
        assert g.avg_custkeys_milli == 1000 * n_cust // len(buckets)
        assert g.avg_days_milli == 1000 * n_days // len(buckets)
        assert g.total_rows == len(pts)
    assert got["custkey_sort"].avg_custkeys_milli == 1000
    assert got["date_sort"].avg_days_milli == 1000
    # the balanced-locality property needs dense buckets — at sf0.001
    # every bucketing is near-singleton and all layouts look alike
    z = got["zorder"]
    if z.total_rows // z.n_buckets >= 32:
        assert z.avg_custkeys_milli < got["date_sort"].avg_custkeys_milli
        assert z.avg_days_milli < got["custkey_sort"].avg_days_milli


def test_catalog_pii_scan_classifies_fixture_columns(spark, sf_dir):
    """PII-risk triage vs a plain-Python regex recount over the
    catalog fixture, plus the concrete classifications that matter:
    email/username are direct, user_id is a quasi-identifier, and
    product_name must NOT be swept up by the name patterns."""
    import re

    from rdbms_metadata_manager_spark.catalog.fixtures import ECOMMERCE_COLUMNS
    from rdbms_metadata_manager_spark.queries.metadata import (
        PII_DIRECT_RX,
        PII_QUASI_RX,
        catalog_pii_risk_scan,
    )

    got = {(r.table_name, r.column_name): r for r in catalog_pii_risk_scan(spark, sf_dir).collect()}
    assert len(got) == len(ECOMMERCE_COLUMNS)
    for row in ECOMMERCE_COLUMNS:
        table, col, dtype = row[1], row[2], row[4]
        g = got[(table, col)]
        if re.search(PII_DIRECT_RX, col.lower()):
            want = ("direct", "redact_or_hash_at_ingest")
        elif re.search(PII_QUASI_RX, col.lower()):
            want = ("quasi", "generalize_or_band")
        else:
            want = ("none", "pass")
        assert (g.pii_risk, g.recommended_action) == want, (table, col)
        assert g.data_type == dtype
    assert got[("Users", "email")].pii_risk == "direct"
    assert got[("Users", "username")].pii_risk == "direct"
    assert got[("Orders", "user_id")].pii_risk == "quasi"
    assert got[("Products", "product_name")].pii_risk == "none"


def test_aa_calibration_matches_python_recount(spark, sf_dir):
    """A/A calibration vs a plain-Python replay: md5 arm assignment,
    purchase-within-first-3-events conversion, exact counts, and the
    guarded two-proportion z in integer micros."""
    import hashlib
    import math

    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.cohort import (
        AA_FIRST_K,
        ab_test_aa_calibration,
    )

    rows = load(spark, sf_dir, "events").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    stats = {0: [0, 0], 1: [0, 0]}  # arm -> [n, conv]
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        conv = int(any(r.event_type == "purchase" for r in evs[:AA_FIRST_K]))
        arm = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2
        stats[arm][0] += 1
        stats[arm][1] += conv
    (n_a, conv_a), (n_b, conv_b) = stats[0], stats[1]
    g = ab_test_aa_calibration(spark, sf_dir).collect()[0]
    assert (g.n_a, g.conv_a, g.n_b, g.conv_b) == (n_a, conv_a, n_b, conv_b)
    assert g.conv_a_permille == 1000 * conv_a // n_a
    assert g.conv_b_permille == 1000 * conv_b // n_b
    tot, n = conv_a + conv_b, n_a + n_b
    if n_a == 0 or n_b == 0 or tot == 0 or tot == n:
        want_z = 0.0
    else:
        pp = tot / n
        want_z = (conv_a / n_a - conv_b / n_b) / math.sqrt(
            pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)
        )
    assert g.z_micro == math.floor(want_z * 1_000_000)


def test_weekly_wow_matches_python_recount(spark, sf_dir):
    """Week-over-week revenue vs a plain-Python recount: epoch-day
    DIV 7 weeks, exact cents, lag deltas in integer per-mille."""
    import datetime as dt
    import math

    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.queries.cohort import weekly_revenue_wow

    rows = load(spark, sf_dir, "orders").collect()
    d0 = dt.date(1992, 1, 1)
    weekly: dict[int, list[int]] = {}
    for r in rows:
        wk = (r.o_orderdate.date() - d0).days // 7
        agg = weekly.setdefault(wk, [0, 0])
        agg[0] += math.floor(r.o_totalprice * 100)
        agg[1] += 1
    got = weekly_revenue_wow(spark, sf_dir).collect()
    assert [g.week_idx for g in got] == sorted(weekly)
    prev = None
    for g in got:
        cents, n = weekly[g.week_idx]
        assert (g.revenue_cents, g.n_orders) == (cents, n)
        assert g.prev_cents == (prev if prev is not None else 0)
        if prev:
            num = 1000 * (cents - prev)
            # Spark DIV and DuckDB // both TRUNCATE toward zero on
            # negative deltas (Python // floors)
            trunc = abs(num) // prev * (1 if num >= 0 else -1)
            assert g.wow_delta_permille == trunc
        else:
            assert g.wow_delta_permille == 0
        prev = cents
