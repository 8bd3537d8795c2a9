"""Unit tests for the iterative-graph and ranking operators against
pure-Python reference implementations (no Spark in the expected-value
path, so a planner/operator bug can't cancel itself out)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.graph import pagerank
from mapreduce_implementation_spark.operators.textstats import bm25_topk


def _py_pagerank(edges, nodes, iters=5, d=0.85):
    outw = {}
    for s, _t, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += r[s] * w / outw[s]
        r = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    edges = [(1, 2, 3.0), (2, 1, 1.0), (2, 3, 1.0), (3, 1, 2.0), (1, 3, 1.0)]
    nodes = [1, 2, 3]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v int")
    got = {r.v: r.r for r in pagerank(e, nd, iters=5).collect()}
    want = _py_pagerank(edges, nodes, iters=5)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_shuffle_mode_matches_broadcast(spark):
    """All three physical modes — broadcast-vector, the web-scale
    shuffled-join fallback, and the dimension-sized dense Arrow task —
    must produce identical ranks: same math, different physical plans.
    Forcing broadcast_node_limit=0 exercises the auto-probe path too."""
    edges = [(1, 2, 3.0), (2, 1, 1.0), (2, 3, 1.0), (3, 1, 2.0), (1, 3, 1.0)]
    nodes = [1, 2, 3]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v int")
    want = _py_pagerank(edges, nodes, iters=5)
    for kwargs in ({"broadcast_ranks": False, "dense_path": False},
                   # auto-probe picks shuffle once dense is off
                   {"broadcast_node_limit": 0, "dense_path": False},
                   {"dense_path": True}):
        got = {r.v: r.r for r in pagerank(e, nd, iters=5, **kwargs).collect()}
        assert set(got) == set(want)
        for v in nodes:
            assert abs(got[v] - want[v]) < 1e-9, (kwargs, v, got[v], want[v])


def test_pagerank_mass_conserved_no_dangling(spark):
    """With every node having out-edges, total rank mass stays 1."""
    edges = [(i, (i + 1) % 6, 1.0) for i in range(6)] + [(0, 3, 2.0)]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    nd = spark.createDataFrame([(v,) for v in range(6)], "v int")
    total = pagerank(e, nd, iters=4).agg(F.sum("r")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    import math

    toks = {i: t.split() for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / len(dl)
    n = len(docs)
    scores = {}
    for term in terms:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf:
                scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[i] / avgdl))
    return scores


def test_bm25_matches_python_reference(spark):
    docs = [
        (1, "hash join hash join window"),
        (2, "window scan sort sort sort"),
        (3, "join join join join join hash"),
        (4, "scan scan scan scan"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in
           bm25_topk(df, "doc_id", "text", ("hash", "join", "window"), k=10).collect()}
    want = _py_bm25(docs, ("hash", "join", "window"))
    assert set(got) == set(want)
    for i, s in want.items():
        assert abs(got[i] - round(s, 6)) < 2e-6, (i, got[i], s)


def test_bm25_rank_order_and_k(spark):
    docs = [(i, "hash " * i + "filler") for i in range(1, 8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, "doc_id", "text", ("hash",), k=3).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].bm25 >= out[1].bm25 >= out[2].bm25


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization should recall >=80% of the exact top-10 (SQ8
    error is ~1/254 per component; far below the cosine gaps between
    neighbors and non-neighbors)."""
    from mapreduce_implementation_spark.operators.similarity import (
        cosine_topk, quantized_cosine_topk,
    )
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    emb = load_table(spark, SF_DIR_01, "embeddings").cache()
    row = emb.filter(F.col("vec_id") == 0).head()
    qv = [float(x) for x in row["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb, "vec_id", "embedding", qv, k=10, exclude_id=0).collect()]
    approx = [r["vec_id"] for r in
              quantized_cosine_topk(emb, "vec_id", "embedding", qv, k=10,
                                    exclude_id=0).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"quantized recall too low: {recall}"


def test_quantize_int8_bounds_and_roundtrip(spark):
    """Quantized components stay in [-127, 127] and dequantize back to
    within one quantization step of the original."""
    from mapreduce_implementation_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [100.0, -50.0, 0.0, 1.0]),
         (3, [0.0, 0.0, 0.0, 0.0])],
        "id long, embedding array<double>")
    out = quantize_int8(df, "embedding").collect()
    for r in out:
        for orig, q in zip(r.embedding, r.qvec):
            assert -127 <= q <= 127
            assert abs(orig - q * r.qscale) <= r.qscale / 2 + 1e-12


def test_hll_distinct_relative_error(spark):
    """approx_count_distinct at rsd=0.02 must land within 5% of the exact
    distinct count per group (HLL++ is deterministic for a given input,
    so this is a regression pin, not a flaky bound)."""
    from mapreduce_implementation_spark.registry import all_specs
    from tests.conftest import SF_DIR_01

    rows = all_specs()["agg_hll_distinct"].fn(spark, SF_DIR_01).collect()
    assert rows, "expected one row per event_type"
    for r in rows:
        assert r["within_tol"], f"{r['event_type']}: HLL estimate off by >5%"


def test_approx_percentile_tracks_exact(spark):
    """approx_percentile (the mergeable-sketch 100 TB form) stays within
    1% of the exact interpolated percentile on every group/quantile."""
    from pyspark.sql import functions as F
    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    exact = {r["o_orderpriority"]: r
             for r in all_specs()["agg_percentiles_exact"].fn(spark, SF_DIR_01).collect()}
    o = load_table(spark, SF_DIR_01, "orders")
    approx = (
        o.groupBy("o_orderpriority")
        .agg(F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)")
             .alias("ap"))
        .collect()
    )
    for r in approx:
        e = exact[r["o_orderpriority"]]
        for i, key in enumerate(("p50", "p90", "p99")):
            rel = abs(r["ap"][i] - e[key]) / max(e[key], 1.0)
            assert rel <= 0.01, f"{r['o_orderpriority']} {key}: rel {rel}"


def test_countmin_overestimate_bounds(spark):
    """CM contract on the real corpus: est(k) >= true(k) always, and
    est(k) <= true(k) + (e/w)*N for the probed stopwords (w=1024 makes
    the slack ~0.27% of the stream — tight enough to catch a broken
    hash or merge)."""
    import math

    from mapreduce_implementation_spark.operators.sketch import (
        countmin_build, countmin_estimate,
    )
    from mapreduce_implementation_spark.operators.textstats import _tok_df
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    docs = load_table(spark, SF_DIR_01, "documents")
    toks = _tok_df(docs, "doc_id", "text").cache()
    n_stream = toks.count()
    sketch = countmin_build(toks, "tok", depth=4, width=1024)
    probe_words = ["the", "a", "of", "to", "and", "in", "is", "it",
                   "spark", "zzz_absent_key"]
    probes = spark.createDataFrame([(w,) for w in probe_words], "tok string")
    est = {r["key"]: r["est"]
           for r in countmin_estimate(sketch, probes, "tok",
                                      depth=4, width=1024).collect()}
    exact = {r["tok"]: r["n"] for r in
             toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    slack = math.e / 1024 * n_stream
    for w in probe_words:
        t = exact.get(w, 0)
        assert est[w] >= t, (w, est[w], t)
        assert est[w] <= t + slack, (w, est[w], t, slack)


def test_span_dedup_rebuild_invariants(spark):
    """Structural contract of C4 span removal on the real corpus: the
    rebuilt corpus keeps each distinct span text EXACTLY once across all
    documents (n_kept sums to the distinct-span count), nothing is
    dropped that wasn't a repeat (chunks - kept == chunks - distinct),
    and every doc's n_kept <= n_chunks."""
    from mapreduce_implementation_spark.operators.dedup import (
        span_chunks, span_dedup_rebuild,
    )
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    docs = load_table(spark, SF_DIR_01, "documents")
    out = span_dedup_rebuild(docs, "doc_id", "text", span_tokens=10).cache()
    chunks = span_chunks(docs, "doc_id", "text", span_tokens=10)
    n_distinct = chunks.select("chunk_text").distinct().count()
    n_total = chunks.count()
    agg = out.agg(F.sum("n_kept").alias("k"), F.sum("n_chunks").alias("c")).head()
    assert agg["k"] == n_distinct, (agg["k"], n_distinct)
    assert agg["c"] == n_total, (agg["c"], n_total)
    assert out.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    assert n_total > n_distinct, "fixture corpus should contain repeated spans"


def test_sequence_packing_invariants(spark):
    """Packing conservation on the real corpus: bins are contiguous from
    0, token totals are conserved, and no sequence overflows 2048 by
    more than one straddling document (each doc lands in the bin of its
    starting offset)."""
    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.operators.textstats import _tok_df
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    out = all_specs()["pipeline_sequence_packing"].fn(spark, SF_DIR_01).cache()
    rows = {r["seq_id"]: r for r in out.collect()}
    assert sorted(rows) == list(range(len(rows))), "seq_ids must be contiguous"
    docs = load_table(spark, SF_DIR_01, "documents")
    total = _tok_df(docs, "doc_id", "text").count()
    assert sum(r["n_tokens"] for r in rows.values()) == total
    max_doc = (docs.select(
        F.size(F.split(F.lower(F.regexp_replace("text", "[^A-Za-z ]", "")), " "))
        .alias("n")).agg(F.max("n")).head()[0])
    for r in rows.values():
        assert r["n_tokens"] <= 2048 + max_doc, r


def test_sssp_weighted_prefers_cheap_multihop_path(spark):
    """Weighted relaxation must take the cheap 2-hop route over the
    expensive direct edge (the property separating Bellman-Ford from
    BFS hop counting), and derive the unreachable NULL correctly."""
    from mapreduce_implementation_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 1), (1, 3, 2)],
        "src long, dst long, w long")
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,), (9,)], "v long")
    for dense in (True, False):
        d = {r["v"]: r["dist"]
             for r in sssp_weighted(edges, nodes, source=0, rounds=4,
                                    max_edge_w=10,
                                    dense_path=dense).collect()}
        assert d == {0: 0, 1: 2, 2: 1, 3: 4, 9: None}, dense

    import pytest

    with pytest.raises(ValueError):
        sssp_weighted(edges, nodes, source=0, rounds=4, max_edge_w=0)


def test_hits_matches_numpy_iteration(spark):
    """hits() must reproduce an independent numpy implementation of the
    same 2 authority-then-hub L2-normalized rounds on a small weighted
    digraph, in BOTH physical modes (declarative lazy chain and the
    single-Arrow-task dense path), and both score vectors must be
    unit-norm.  The declarative mode defers normalization across rounds
    (scale invariance), so agreement to 1e-9 also pins that algebra."""
    import numpy as np

    from mapreduce_implementation_spark.operators.graph import hits
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (3, 2, 5.0),
             (2, 0, 1.0), (4, 1, 2.0)]
    nv = 6  # node 5 is isolated
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    nodes = spark.createDataFrame([(i,) for i in range(nv)], "v bigint")

    W = np.zeros((nv, nv))
    for s, d, w in edges:
        W[s, d] = w
    h = np.ones(nv)
    for _ in range(2):
        a = W.T @ h
        a = a / np.sqrt((a * a).sum())
        h = W @ a
        h = h / np.sqrt((h * h).sum())
    assert abs(np.linalg.norm(h) - 1) < 1e-9

    for dense in (True, False):
        try:
            got = {r["v"]: (r["hub"], r["authority"])
                   for r in hits(df, nodes, iters=2,
                                 dense_path=dense).collect()}
        finally:
            release_persisted()
        for v in range(nv):
            assert abs(got[v][0] - h[v]) < 1e-9, ("hub", v, dense)
            assert abs(got[v][1] - a[v]) < 1e-9, ("authority", v, dense)
        # isolated node present, scored zero
        assert got[5] == (0.0, 0.0), dense


def test_personalized_pagerank_uniform_reset_equals_global(spark):
    """pagerank(reset=uniform 1/N) must equal plain pagerank: the
    personalization generalizes the uniform teleport, so the uniform
    distribution is the identity case (atol for the one extra multiply
    vs divide rounding)."""
    from mapreduce_implementation_spark.operators.graph import pagerank
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (0, 2, 1.0),
             (3, 1, 1.0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "v bigint")
    uniform = nodes.selectExpr("v", "1.0 / 5 AS s")
    try:
        plain = {r["v"]: r["r"] for r in
                 pagerank(df, nodes, iters=4).collect()}
        seeded = {r["v"]: r["r"] for r in
                  pagerank(df, nodes, iters=4, reset=uniform).collect()}
    finally:
        release_persisted()
    assert plain.keys() == seeded.keys()
    for v in plain:
        assert abs(plain[v] - seeded[v]) < 1e-12, v


def test_graph_dense_paths_match_declarative_random(spark):
    """Randomized dense-vs-declarative parity for pagerank() and hits()
    on seeded random digraphs (self-loops, isolated nodes, parallel-free
    multi-weight edges, a node with out-edges only): the two physical
    modes must agree to 1e-9 on every score, and pagerank must also
    match the pure-Python reference."""
    import random

    from mapreduce_implementation_spark.operators.graph import hits
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randrange(4, 9)
        nodes = list(range(n + 2))  # n+1 and n stay isolated sometimes
        edges = sorted({(rng.randrange(n), rng.randrange(n))
                        for _ in range(rng.randrange(3, 14))})
        edges = [(s, t, float(rng.randrange(1, 6))) for s, t in edges]
        if not edges:
            continue
        e = spark.createDataFrame(edges, "src int, dst int, w double")
        nd = spark.createDataFrame([(v,) for v in nodes], "v int")
        # a random sparse reset distribution for the personalized case
        # (r8: the dense path covers seeded walks too)
        seeds = sorted({rng.choice(nodes) for _ in range(3)})
        reset = {v: 1.0 / len(seeds) for v in seeds}
        rst = spark.createDataFrame(list(reset.items()), "v int, s double")
        try:
            pr_want = _py_pagerank(edges, nodes, iters=4)
            ppr_want = _py_ppr(edges, nodes, reset, iters=4)
            pr = {}
            ppr = {}
            ht = {}
            for dense in (True, False):
                pr[dense] = {r.v: r.r for r in pagerank(
                    e, nd, iters=4, dense_path=dense).collect()}
                ppr[dense] = {r.v: r.r for r in pagerank(
                    e, nd, iters=4, reset=rst, dense_path=dense).collect()}
                ht[dense] = {r.v: (r.hub, r.authority) for r in hits(
                    e, nd, iters=2, dense_path=dense).collect()}
        finally:
            release_persisted()
        assert set(pr[True]) == set(pr[False]) == set(nodes), trial
        assert set(ppr[True]) == set(ppr[False]) == set(nodes), trial
        assert set(ht[True]) == set(ht[False]) == set(nodes), trial
        for v in nodes:
            assert abs(pr[True][v] - pr[False][v]) < 1e-9, (trial, v)
            assert abs(pr[True][v] - pr_want[v]) < 1e-9, (trial, v)
            assert abs(ppr[True][v] - ppr[False][v]) < 1e-9, (trial, v)
            assert abs(ppr[True][v] - ppr_want[v]) < 1e-9, (trial, v)
            for j in (0, 1):
                assert abs(ht[True][v][j] - ht[False][v][j]) < 1e-9, \
                    (trial, v, j)


def _py_lpa(edges, nodes, iters):
    """Pure-Python synchronous LPA with min-label ties (the operator's
    documented semantics: new label = argmax incident src-label weight,
    no-mass nodes revert to their own id)."""
    lab = {v: v for v in nodes}
    for _ in range(iters):
        score = {}
        for s, t, w in edges:
            score.setdefault(t, {})
            score[t][lab[s]] = score[t].get(lab[s], 0.0) + w
        nxt = {v: v for v in nodes}
        for t, per in score.items():
            best = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[t] = best
        lab = nxt
    return lab


def test_label_propagation_modes_match(spark):
    """Dense Arrow task vs declarative window chain vs the pure-Python
    model on seeded random weighted digraphs: identical labels, every
    node, every trial (integer weights make sums exact in any
    accumulation order, so argmax ties are engine-independent)."""
    import random

    from mapreduce_implementation_spark.operators.graph import (
        label_propagation,
    )
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    rng = random.Random(11)
    for trial in range(3):
        n = rng.randrange(4, 9)
        nodes = list(range(n + 2))
        edges = sorted({(rng.randrange(n), rng.randrange(n))
                        for _ in range(rng.randrange(4, 16))})
        edges = [(s, t, float(rng.randrange(1, 5))) for s, t in edges]
        if not edges:
            continue
        e = spark.createDataFrame(edges, "src int, dst int, w double")
        nd = spark.createDataFrame([(v,) for v in nodes], "v int")
        want = _py_lpa(edges, nodes, iters=4)
        try:
            for dense in (True, False):
                got = {r.v: r.label for r in label_propagation(
                    e, nd, iters=4, dense_path=dense).collect()}
                assert got == want, (trial, dense, got, want)
        finally:
            release_persisted()


def test_graph_operators_ignore_null_weight_edges(spark):
    """A NULL-weight (or NULL-endpoint) edge row must be ignored
    IDENTICALLY by both physical modes — the declarative chains skip
    NULLs inside F.sum/F.min, and the operators now drop such rows
    before the mode split so the dense numpy path never sees NaN.
    Also: float edge weights keep sssp_weighted on the declarative
    chain (auto probe) and raise on an explicit dense_path=True."""
    import pytest

    from mapreduce_implementation_spark.operators.graph import (
        hits, sssp_weighted,
    )
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [(1, 2, 3.0), (2, 1, 1.0), (2, 3, None), (None, 1, 5.0),
             (3, 1, 2.0), (1, 3, 1.0)]
    clean = [(s, t, w) for s, t, w in edges if None not in (s, t, w)]
    nodes = [1, 2, 3]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    ec = spark.createDataFrame(clean, "src int, dst int, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v int")
    want = _py_pagerank(clean, nodes, iters=4)
    try:
        for dense in (True, False):
            got = {r.v: r.r for r in pagerank(
                e, nd, iters=4, dense_path=dense).collect()}
            for v in nodes:
                assert abs(got[v] - want[v]) < 1e-9, (dense, v)
            hv = {r.v: (r.hub, r.authority) for r in hits(
                e, nd, iters=2, dense_path=dense).collect()}
            hc = {r.v: (r.hub, r.authority) for r in hits(
                ec, nd, iters=2, dense_path=dense).collect()}
            assert hv == hc, dense

        ew = spark.createDataFrame([(1, 2, 1.5), (2, 3, 1.0)],
                                   "src int, dst int, w double")
        # auto probe: float weights -> declarative (must not truncate)
        d = {r["v"]: r["dist"]
             for r in sssp_weighted(ew, nd, source=1, rounds=3,
                                    max_edge_w=2).collect()}
        assert d[2] == 1.5 or d[2] == 1  # long cast floors the output
        with pytest.raises(ValueError):
            sssp_weighted(ew, nd, source=1, rounds=3, max_edge_w=2,
                          dense_path=True)
    finally:
        release_persisted()


def test_string_vertex_keys_fall_back_to_declarative(spark):
    """Non-integral vertex ids must auto-route around the dense Arrow
    paths (whose output schema relabels through int64) and still return
    correct results through the declarative chains — the _dense_probe
    key-type gate, exercised end to end for pagerank and hits."""
    from mapreduce_implementation_spark.operators.graph import hits
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [("x", "y", 3.0), ("y", "x", 1.0), ("y", "z", 1.0),
             ("z", "x", 2.0), ("x", "z", 1.0)]
    nodes = ["x", "y", "z"]
    e = spark.createDataFrame(edges, "src string, dst string, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v string")
    int_edges = [(0, 1, 3.0), (1, 0, 1.0), (1, 2, 1.0), (2, 0, 2.0),
                 (0, 2, 1.0)]
    want = _py_pagerank(int_edges, [0, 1, 2], iters=4)
    m = {"x": 0, "y": 1, "z": 2}
    try:
        pr = {r.v: r.r for r in pagerank(e, nd, iters=4).collect()}
        assert set(pr) == set(nodes)
        for v in nodes:
            assert abs(pr[v] - want[m[v]]) < 1e-9, v
        ht = {r.v: (r.hub, r.authority)
              for r in hits(e, nd, iters=2).collect()}
        assert set(ht) == set(nodes)
        # same graph through the int-keyed dense path must agree
        ei = spark.createDataFrame(int_edges, "src int, dst int, w double")
        ni = spark.createDataFrame([(v,) for v in (0, 1, 2)], "v int")
        hti = {r.v: (r.hub, r.authority)
               for r in hits(ei, ni, iters=2).collect()}
        for v in nodes:
            for j in (0, 1):
                assert abs(ht[v][j] - hti[m[v]][j]) < 1e-9, (v, j)
    finally:
        release_persisted()


def _py_ppr(edges, nodes, reset, iters=4, d=0.85):
    """Pure-Python personalized PageRank (the operator's documented
    semantics: initial rank = reset distribution, teleport mass lands
    as (1-d)*s_v, zero-out-weight sources contribute nothing — the
    declarative chain's divide-by-zero-is-NULL behavior)."""
    outw = {}
    for s, _t, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {v: reset.get(v, 0.0) for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            if outw[s] != 0.0:
                contrib[t] += r[s] * w / outw[s]
        r = {v: (1 - d) * reset.get(v, 0.0) + d * contrib[v]
             for v in nodes}
    return r


def test_personalized_pagerank_dense_matches(spark):
    """Reset-distribution parity across the physical modes (r8: the
    dense Arrow task now covers personalized walks — the reset mass
    rides into the batch as per-edge columns): dense vs declarative vs
    the pure-Python model, on a graph with an isolated seed node (its
    closed-form rank is (1-d)*s_v), an isolated non-seed node (rank
    exactly 0), and a seed concentrated on one vertex."""
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0), (0, 2, 1.0),
             (3, 1, 1.0)]
    nodes = list(range(6))  # 4 = isolated seed, 5 = isolated non-seed
    reset = {0: 0.5, 4: 0.5}
    e = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v bigint")
    rst = spark.createDataFrame(list(reset.items()), "v bigint, s double")
    want = _py_ppr(edges, nodes, reset, iters=4)
    try:
        got = {}
        for dense in (True, False):
            got[dense] = {r["v"]: r["r"] for r in pagerank(
                e, nd, iters=4, reset=rst, dense_path=dense).collect()}
            assert set(got[dense]) == set(nodes), dense
            for v in nodes:
                assert abs(got[dense][v] - want[v]) < 1e-9, (dense, v)
        assert got[True].keys() == got[False].keys()
        # isolated seed: closed form (1-d)*s_v; isolated non-seed: 0
        assert abs(got[True][4] - 0.15 * 0.5) < 1e-12
        assert got[True][5] == 0.0
    finally:
        release_persisted()


def test_pagerank_zero_out_weight_source_modes_match(spark):
    """A source whose edge weights sum to exactly 0 (w=0.0 rows pass
    the isNotNull filter) must contribute nothing in BOTH physical
    modes: the declarative w/_ow divide-by-zero yields NULL (skipped by
    F.sum), and the dense path masks those edges out of the bincount
    (ADVICE r7 — unguarded it was 0/0=NaN poisoning every rank)."""
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0),
             (3, 1, 0.0), (3, 2, 0.0)]  # node 3: all-zero out-weight
    nodes = [0, 1, 2, 3]
    nonzero = [(s, t, w) for s, t, w in edges if w != 0.0]
    e = spark.createDataFrame(edges, "src int, dst int, w double")
    nd = spark.createDataFrame([(v,) for v in nodes], "v int")
    want = _py_ppr(nonzero, nodes, {v: 0.25 for v in nodes}, iters=4)
    try:
        for dense in (True, False):
            got = {r["v"]: r["r"] for r in pagerank(
                e, nd, iters=4, dense_path=dense).collect()}
            for v in nodes:
                assert got[v] == got[v], (dense, v)  # no NaN
                assert abs(got[v] - want[v]) < 1e-9, (dense, v)
    finally:
        release_persisted()


def test_dense_paths_preserve_input_key_dtypes(spark):
    """The dense Arrow fast paths relabel through int64 internally but
    must cast their outputs back to the caller's key dtype (ADVICE r7):
    the same call's output schema cannot flip with the physical mode.
    Exercised for connected_components (cluster_id), kcore (node) and
    label_propagation (label) with INT vertex keys, values compared
    across modes too."""
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.graph import (
        connected_components, kcore, label_propagation,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7)], "a int, b int")
    ek = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "a int, b int")
    el = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 1), (3, 1, 1)], "src int, dst int, w int")
    nd = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v int")
    try:
        out = {}
        for dense in (True, False):
            cc = connected_components(pairs, "a", "b", dense_path=dense)
            assert dict(cc.dtypes) == {"node": "int",
                                       "cluster_id": "int"}, dense
            kc = kcore(ek, "a", "b", k=2, rounds=3, dense_path=dense)
            assert dict(kc.dtypes) == {"node": "int",
                                       "core_deg": "bigint"}, dense
            lp = label_propagation(el, nd, iters=3, dense_path=dense)
            assert dict(lp.dtypes) == {"v": "int", "label": "int"}, dense
            out[dense] = (
                {r["node"]: r["cluster_id"] for r in cc.collect()},
                {r["node"]: r["core_deg"] for r in kc.collect()},
                {r["v"]: r["label"] for r in lp.collect()},
            )
        assert out[True] == out[False]
    finally:
        release_persisted()


def test_lpa_float_weights_auto_route_declarative(spark):
    """Float caller weights keep label_propagation's AUTO probe on the
    declarative chain (the exact-tie-break contract, ADVICE r7): the
    dense plan's FlatMapGroupsInPandas node must be absent with float
    w, present with integral w, and both must agree on this fixture
    (integer-valued floats, so sums are exact either way)."""
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.graph import (
        label_propagation,
    )

    rows = [(1, 2, 2), (2, 3, 1), (3, 1, 1), (1, 3, 3)]
    ef = spark.createDataFrame([(s, t, float(w)) for s, t, w in rows],
                               "src int, dst int, w double")
    ei = spark.createDataFrame(rows, "src int, dst int, w bigint")
    nd = spark.createDataFrame([(v,) for v in (1, 2, 3)], "v int")
    try:
        lf = label_propagation(ef, nd, iters=3)
        li = label_propagation(ei, nd, iters=3)
        plan_f = lf._jdf.queryExecution().executedPlan().toString()
        plan_i = li._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan_f
        assert "FlatMapGroupsInPandas" in plan_i
        assert ({r["v"]: r["label"] for r in lf.collect()}
                == {r["v"]: r["label"] for r in li.collect()})
    finally:
        release_persisted()


def test_bpe_replace_encoder_matches_reference(spark):
    """text_token_budget_bpe's expression encoder vs an independent
    Python BPE reference (leftmost-greedy full application of each
    merge in table order, the standard encode loop), on 200 seeded
    random words plus the r11-review counterexamples ('there' collapsed
    to ONE token under the first, single-space-separated cut: ' e r'
    matched symbol e followed by the PREFIX of symbol 're').  The
    space-WRAPPED representation (' a  b ' -> ' ab ') anchors both
    symbols whole, making one literal replace per merge exactly full
    BPE application — this test pins that equivalence on the real Spark
    expression, one action for all cases."""
    import random

    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.queries.textanalysis import (
        _BPE_MERGES,
    )

    def bpe_ref(word):
        syms = list(word)
        for a, b in _BPE_MERGES:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    rng = random.Random(4211)
    words = ["there", "then", "other", "the", "and", "rere", "thther",
             "eses", "interesting", "and then there were none"]
    words += ["".join(rng.choice("theranois") for _ in range(rng.randint(1, 14)))
              for _ in range(200)]

    from mapreduce_implementation_spark.queries.textanalysis import (
        _bpe_encode,
    )

    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i long, text string")
    # the PRODUCTION encoder expression — not a local copy, so an edit
    # to the query's encoder is judged by this reference test too
    enc = _bpe_encode(F.col("text"))
    got = {r["i"]: (r["n"], r["toks"]) for r in df.select(
        "i",
        F.size(F.regexp_extract_all(enc, F.lit("[^ ]+"), F.lit(0))).alias("n"),
        F.regexp_extract_all(enc, F.lit("[^ ]+"), F.lit(0)).alias("toks"),
    ).collect()}
    for i, w in enumerate(words):
        ref = [t for part in w.split() for t in bpe_ref(part)]
        assert got[i] == (len(ref), ref), (w, got[i], ref)


def _random_wellformed_merges(rng, n_merges, alphabet="theranois"):
    """A random BPE-style merge table built the way training builds one:
    each merge pairs two symbols already in the pool (chars + earlier
    merge outputs) and its output is a NEW string not yet in the pool —
    the well-formedness property real merges.txt files have."""
    pool = list(alphabet)
    seen = set(pool)
    merges = []
    while len(merges) < n_merges:
        a, b = rng.choice(pool), rng.choice(pool)
        if a + b in seen or len(a + b) > 8:
            continue
        merges.append((a, b))
        pool.append(a + b)
        seen.add(a + b)
    return merges


def _bpe_ref_seq(word, merges):
    """Independent sequential-full-application reference (table order,
    leftmost non-overlapping) — deliberately NOT the production helper."""
    syms = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_replace_encoder_random_merge_tables(spark):
    """The ADVICE-r11 fuzz, committed: the space-wrapped chained-replace
    encoder vs the independent reference over RANDOM well-formed merge
    tables (not just the fixed _BPE_MERGES fixture), so the wrap-form
    equivalence is pinned as a property of the representation, not of
    one lucky table.  8 seeded tables x 150 words = 1,200 cases, one
    Spark action per table."""
    import random

    from mapreduce_implementation_spark.queries.textanalysis import (
        _bpe_encode,
    )

    rng = random.Random(1211)
    for table_i in range(8):
        merges = _random_wellformed_merges(rng, rng.randint(4, 20))
        words = ["".join(rng.choice("theranois")
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(148)] + ["there", "and then there were none"]
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "i long, text string")
        enc = _bpe_encode(F.col("text"), merges=merges)
        got = {r["i"]: r["toks"] for r in df.select(
            "i", F.regexp_extract_all(
                enc, F.lit("[^ ]+"), F.lit(0)).alias("toks")).collect()}
        for i, w in enumerate(words):
            ref = [t for part in w.split() for t in _bpe_ref_seq(part, merges)]
            assert got[i] == ref, (table_i, merges, w, got[i], ref)


def test_bpe_batched_parity_with_expression(spark):
    """bpe_encode_batched (the vocab-scale mapInPandas path) must agree
    token-for-token with the oracle-able expression form on the fixture
    table AND on random well-formed tables, including None/empty/
    punctuation-bearing text — the crossover contract in its docstring."""
    import random

    from mapreduce_implementation_spark.queries.textanalysis import (
        _BPE_MERGES, _bpe_encode, bpe_encode_batched,
    )

    rng = random.Random(907)
    texts = ["There, THEN: other!", "", None, "İstanbul naïve reëntry",
             "and then there were none", "x" * 40]
    texts += ["".join(rng.choice("theranois .,!")
                      for _ in range(rng.randint(0, 30))) for _ in range(80)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string")
    for merges in (_BPE_MERGES, _random_wellformed_merges(rng, 15)):
        expr_toks = F.regexp_extract_all(
            _bpe_encode(F.col("text"), merges=merges),
            F.lit("[^ ]+"), F.lit(0))
        want = {r["i"]: r["toks"]
                for r in df.select("i", expr_toks.alias("toks")).collect()}
        got_df = bpe_encode_batched(df, "text", merges=merges, out="toks")
        got = {r["i"]: r["toks"] for r in got_df.collect()}
        assert got == want


def test_bpe_batched_rejects_output_name_collision(spark):
    """An `out` name that already exists on the input must fail loudly
    at call time — the pandas side would silently overwrite while the
    schema gained a duplicate field (r12 review)."""
    import pytest

    from mapreduce_implementation_spark.queries.textanalysis import (
        bpe_encode_batched,
    )

    df = spark.createDataFrame([(1, "ab")], "i long, text string")
    with pytest.raises(ValueError, match="already exists"):
        bpe_encode_batched(df, "text", out="text")


def test_bpe_batched_at_vocab_scale_matches_reference(spark):
    """The vocab-scale path at a REAL merge-table size: 1,000 random
    well-formed merges (where the expression form cannot even be
    planned — it StackOverflows at ~300, SCALE.md r12), batched encoder
    vs the independent sequential reference on 120 seeded words.  This
    is the regime bpe_encode_batched exists for; the small-table parity
    tests alone never drive it past the expression form's ceiling."""
    import random

    from mapreduce_implementation_spark.queries.textanalysis import (
        bpe_encode_batched,
    )

    rng = random.Random(5012)
    merges = _random_wellformed_merges(rng, 1000)
    words = ["".join(rng.choice("theranois")
                     for _ in range(rng.randint(1, 14)))
             for _ in range(118)] + ["there", "and then there were none"]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               "i long, text string")
    got = {r["i"]: r["toks"] for r in
           bpe_encode_batched(df, "text", merges=merges,
                              out="toks").collect()}
    for i, w in enumerate(words):
        ref = [t for part in w.split() for t in _bpe_ref_seq(part, merges)]
        assert got[i] == ref, (w, got[i][:8], ref[:8])


def test_bpe_train_batched_parity_with_declarative(spark):
    """bpe_train_merges_batched (O(1)-plan-depth localCheckpoint loop)
    must produce the IDENTICAL merge table — ranks, pairs, and counts —
    as the declarative one-plan trainer on the fixture rounds over the
    real documents table (r12 VERDICT item 3: the training loop gets
    the same batched escape hatch the encoder has)."""
    from tests.conftest import SF_DIR_001

    from mapreduce_implementation_spark.queries.textanalysis import (
        _BPE_TRAIN_ROUNDS, bpe_train_merges, bpe_train_merges_batched,
    )
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR_001, "documents")
    try:
        want = [tuple(r) for r in bpe_train_merges(
            docs, "text", _BPE_TRAIN_ROUNDS).collect()]
        got = [tuple(r) for r in bpe_train_merges_batched(
            docs, "text", _BPE_TRAIN_ROUNDS).collect()]
    finally:
        release_persisted()
    assert len(want) == _BPE_TRAIN_ROUNDS
    assert got == want


def test_bpe_train_batched_matches_reference_past_ceiling(spark):
    """The batched trainer vs an INDEPENDENT pure-Python Sennrich
    trainer (dict-of-word-counts formulation, shared nothing with the
    Spark path) for 40 rounds — past nothing physical, but enough
    rounds that a tie-break or apply-order slip compounds visibly;
    the 1k-round regime (where the declarative form cannot even be
    planned) is measured in SCALE.md r13 with this same operator."""
    import random
    from collections import Counter

    from mapreduce_implementation_spark.queries.textanalysis import (
        bpe_train_merges_batched,
    )

    def ref_train(word_counts, k):
        vocab = {w: list(w) for w in word_counts}
        out = []
        for rank in range(1, k + 1):
            pc = Counter()
            for w, syms in vocab.items():
                c = word_counts[w]
                for j in range(len(syms) - 1):
                    pc[(syms[j], syms[j + 1])] += c
            if not pc:
                break
            # argmax with (count desc, lhs asc, rhs asc) — the same
            # total order both engines sort by
            (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, a, b, n))
            for w in vocab:
                vocab[w] = _bpe_ref_seq_one(vocab[w], a, b)
        return out

    def _bpe_ref_seq_one(syms, a, b):
        i, res = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        return res

    rng = random.Random(1307)
    words = ["".join(rng.choice("theranois")
                     for _ in range(rng.randint(2, 12)))
             for _ in range(400)]
    counts = Counter(words)
    # docs frame: one word per row, repeated per count (the trainer
    # collapses it back itself)
    df = spark.createDataFrame([(w,) for w in words], "text string")
    want = ref_train(counts, 40)
    got = [tuple(r) for r in
           bpe_train_merges_batched(df, "text", 40).collect()]
    assert got == want, (got[:3], want[:3])


def test_bpe_train_multi_merge_parity(spark):
    """Multi-merge batching (r13 VERDICT item 4): batch_merges=m
    selects the maximal symbol-disjoint PREFIX of the sorted pair
    candidates, tie-guarded against created-pair count collisions
    (the two refinements that make the batch provably equal to the
    sequential trainer — see the operator docstring).  Pin m∈{4,16}
    == m=1 — ranks, pairs, AND counts — on BOTH a uniform-random
    corpus (tie-dense: greedy-skip batching diverged at rank 3 here)
    and the real fixture documents (where plain prefix truncation
    without the tie-guard diverged at rank 14, the 'column'
    created-pair tie)."""
    import random

    from mapreduce_implementation_spark.queries.textanalysis import (
        bpe_train_merges_batched,
    )
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_001

    rng = random.Random(1307)
    words = ["".join(rng.choice("theranois")
                     for _ in range(rng.randint(2, 12)))
             for _ in range(400)]
    corpora = [
        spark.createDataFrame([(w,) for w in words], "text string"),
        load_table(spark, SF_DIR_001, "documents"),
    ]
    for corpus in corpora:
        want = [tuple(r) for r in
                bpe_train_merges_batched(corpus, "text", 40).collect()]
        for m in (4, 16):
            got = [tuple(r) for r in
                   bpe_train_merges_batched(corpus, "text", 40,
                                            batch_merges=m).collect()]
            first_diff = next((i for i, (g, w_) in
                               enumerate(zip(got, want)) if g != w_), None)
            assert got == want, (m, first_diff,
                                 got[first_diff] if first_diff is not None
                                 else None,
                                 want[first_diff] if first_diff is not None
                                 else None)


def test_bpe_train_fast_mode_quality(spark):
    """strict=False (the production-build mode): batches run at full m
    with greedy disjoint selection, so the merge table may reorder or
    re-path near batch boundaries (co+lu vs lu+m while building
    'column' — pair IDENTITIES differ even when the learned tokens
    converge).  The defensible quality pin is the objective BPE
    greedily optimizes: corpus COMPRESSION.  Encoding the corpus with
    the fast-mode table must land within 5% of the sequential table's
    total token count at the same merge budget (same length, exact
    positive counts too)."""
    from pyspark.sql import functions as SF

    from mapreduce_implementation_spark.queries.textanalysis import (
        bpe_encode_batched, bpe_train_merges_batched,
    )
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_001

    docs = load_table(spark, SF_DIR_001, "documents").select("text")
    seq = [tuple(r) for r in
           bpe_train_merges_batched(docs, "text", 40).collect()]
    fast = [tuple(r) for r in
            bpe_train_merges_batched(docs, "text", 40, batch_merges=16,
                                     strict=False).collect()]
    assert len(fast) == len(seq) == 40
    assert all(n > 0 for _, _, _, n in fast)

    def total_tokens(table):
        enc = bpe_encode_batched(docs, "text",
                                 merges=[(a, b) for _, a, b, _ in table])
        return enc.agg(SF.sum(SF.size("bpe_tokens"))).collect()[0][0]

    n_seq, n_fast = total_tokens(seq), total_tokens(fast)
    assert n_fast <= n_seq * 1.05, (n_fast, n_seq)


# --- r12: random-graph reference models for the remaining graph ops ---------
# (the BPE-lesson idiom: each operator's oracle twin unrolls the SAME
# formulation in SQL, so a mis-formulated algorithm could hash-match;
# these recompute the graph statistic with textbook pure-Python
# implementations on seeded random graphs, both physical modes.)


def _random_graph(rng, n_nodes, n_edges):
    edges = set()
    while len(edges) < n_edges:
        u, v = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    return sorted(edges)


def test_connected_components_matches_union_find(spark):
    import random

    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(121)
    for trial in range(3):
        edges = _random_graph(rng, 40, rng.randint(15, 60))
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        comp: dict[int, list] = {}
        for u, v in edges:
            comp.setdefault(find(u), []).append(u)
            comp[find(u)].append(v)
        want = {}
        for members in comp.values():
            lo = min(members)
            for m in members:
                want[m] = lo

        df = spark.createDataFrame(edges, "a long, b long")
        for dense in (True, False):
            try:
                got = {r["node"]: r["cluster_id"] for r in
                       connected_components(df, "a", "b",
                                            dense_path=dense).collect()}
            finally:
                release_persisted()
            assert got == want, (trial, dense,
                                 sorted(set(got.items()) ^ set(want.items()))[:4])


def test_kcore_matches_python_peeling(spark):
    import random

    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.graph import kcore

    rng = random.Random(212)
    for trial in range(3):
        edges = _random_graph(rng, 30, rng.randint(25, 80))
        k = rng.randint(2, 4)
        # textbook fixed point: repeatedly drop ALL nodes of degree < k
        es = set(edges)
        while True:
            deg: dict[int, int] = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            keep = {x for x, d in deg.items() if d >= k}
            nes = {(u, v) for u, v in es if u in keep and v in keep}
            if nes == es:
                break
            es = nes
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        want = dict(deg)

        df = spark.createDataFrame(edges, "a long, b long")
        for dense in (True, False):
            try:
                got = {r["node"]: r["core_deg"] for r in
                       kcore(df, "a", "b", k=k, rounds=30,
                             dense_path=dense).collect()}
            finally:
                release_persisted()
            assert got == want, (trial, dense, k, got, want)


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from mapreduce_implementation_spark.operators.graph import triangle_count

    rng = random.Random(312)
    for trial in range(3):
        edges = _random_graph(rng, 25, rng.randint(40, 120))
        es = set(edges)
        want: dict[int, int] = {}
        nodes = sorted({x for e in es for x in e})
        for a, b, c in itertools.combinations(nodes, 3):
            if ((a, b) in es and (a, c) in es and (b, c) in es):
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: r["n_triangles"] for r in
               triangle_count(df, "a", "b").collect()}
        assert got == want, (trial, sorted(set(got.items())
                                           ^ set(want.items()))[:4])


def test_bfs_and_sssp_match_python_shortest_paths(spark):
    import heapq
    import random

    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.graph import (
        bfs_distances, sssp_weighted,
    )

    rng = random.Random(412)
    for trial in range(2):
        n = 25
        dir_edges = sorted({(rng.randrange(n), rng.randrange(n))
                            for _ in range(70) if True})
        dir_edges = [(u, v, rng.randint(1, 9)) for u, v in dir_edges
                     if u != v]
        adj: dict[int, list] = {}
        for u, v, w in dir_edges:
            adj.setdefault(u, []).append((v, w))
        # dijkstra from 0 (weighted) + BFS hop counts (unit)
        dist = {0: 0}
        pq = [(0, 0)]
        while pq:
            d, x = heapq.heappop(pq)
            if d > dist.get(x, 1 << 60):
                continue
            for y, w in adj.get(x, ()):
                nd = d + w
                if nd < dist.get(y, 1 << 60):
                    dist[y] = nd
                    heapq.heappush(pq, (nd, y))
        hops = {0: 0}
        frontier = [0]
        h = 0
        while frontier and h < 6:
            h += 1
            nxt = []
            for x in frontier:
                for y, _ in adj.get(x, ()):
                    if y not in hops:
                        hops[y] = h
                        nxt.append(y)
            frontier = nxt

        all_nodes = sorted({x for u, v, _ in dir_edges for x in (u, v)}
                           | {0})
        e = spark.createDataFrame(dir_edges, "src long, dst long, w long")
        nodes = spark.createDataFrame([(x,) for x in all_nodes], "v long")
        for dense in (True, False):
            try:
                got_b = {r["v"]: r["dist"] for r in bfs_distances(
                    e, nodes, 0, max_hops=6, dense_path=dense).collect()}
                got_s = {r["v"]: r["dist"] for r in sssp_weighted(
                    e, nodes, 0, rounds=n, max_edge_w=9,
                    dense_path=dense).collect()}
            finally:
                release_persisted()
            want_b = {x: hops.get(x) for x in all_nodes}
            want_s = {x: dist.get(x) for x in all_nodes}
            assert got_b == want_b, (trial, dense,
                                     {x: (got_b[x], want_b[x])
                                      for x in all_nodes
                                      if got_b[x] != want_b[x]})
            assert got_s == want_s, (trial, dense,
                                     {x: (got_s[x], want_s[x])
                                      for x in all_nodes
                                      if got_s[x] != want_s[x]})
