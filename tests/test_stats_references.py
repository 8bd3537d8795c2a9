"""Independent reference-model checks for the statistics family.

The r11 BPE review lesson (SCALE.md r11): for algorithm-bearing queries
the DuckDB oracle twin validates AGREEMENT, not INTENT — when both
engines run the same (possibly wrong) formulation, hash parity proves
nothing about the statistic.  Every test here recomputes the claimed
statistic with an INDEPENDENT implementation (numpy linear algebra or a
pure-Python fold over data read straight from parquet via pyarrow,
bypassing both engines' SQL) and compares against the registered
query's output at sf0.001.

Scope: the queries whose Spark and oracle sides share a formulation
with no third leg until now — OLS via Cramer's rule (vs numpy lstsq),
KS two-sample (vs a numpy CDF-diff), Gini (vs the sorted-rank formula
in numpy), Zipf alpha (vs numpy polyfit), higher moments (vs numpy
moment arithmetic), and the Holt / CUSUM / EWMA sequential folds (vs
pure-Python recurrences over the SAME Spark-computed daily series, so
the test isolates the F.aggregate struct-fold — the algorithmic part —
from the shared round(2) input prep).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.registry import all_specs
from tests.conftest import SF_DIR_001

SPECS = all_specs()


def _pdf(table: str):
    return pq.read_table(f"{SF_DIR_001}/{table}.parquet").to_pandas()


def test_ols_matches_numpy_lstsq(spark):
    """agg_ols_normal_equations' Cramer's-rule solve (the same formulas
    on BOTH engine sides — a transcription slip would hash-match) vs
    numpy.linalg.lstsq on the identical design matrix."""
    li = _pdf("lineitem")
    X = np.column_stack([np.ones(len(li)),
                         li["l_quantity"].to_numpy(dtype=float),
                         li["l_discount"].to_numpy(dtype=float)])
    y = li["l_extendedprice"].to_numpy(dtype=float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)

    row = SPECS["agg_ols_normal_equations"].fn(spark, SF_DIR_001).collect()[0]
    assert row["n_rows"] == len(li)
    got = np.array([row["b0"], row["b1"], row["b2"]], dtype=float)
    assert np.allclose(got, beta, rtol=1e-5, atol=1e-4), (got, beta)


def test_ks_two_sample_matches_numpy(spark):
    """stats_ks_two_sample's D statistic (identical CDF-diff SQL on
    both sides) vs a numpy two-sample KS over the same length arrays."""
    d = _pdf("documents")
    ga = {f"src{i}" for i in range(5)}
    gb = {f"src{i}" for i in range(5, 10)}
    a = np.sort(d[d["source"].isin(ga)]["n_chars"].to_numpy(dtype=float))
    b = np.sort(d[d["source"].isin(gb)]["n_chars"].to_numpy(dtype=float))
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    d_ref = float(np.max(np.abs(f1 - f2)))
    crit_ref = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))

    row = SPECS["stats_ks_two_sample"].fn(spark, SF_DIR_001).collect()[0]
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    assert abs(row["ks_d"] - d_ref) < 1e-6, (row["ks_d"], d_ref)
    assert abs(row["crit_05"] - crit_ref) < 1e-6
    assert row["reject_same_dist"] == (d_ref > crit_ref)


def test_moments_match_numpy(spark):
    """agg_stat_moments' population skew / excess kurtosis and sample
    std/corr/cov vs direct numpy moment arithmetic per group."""
    li = _pdf("lineitem")
    rows = {r["returnflag"]: r for r in
            SPECS["agg_stat_moments"].fn(spark, SF_DIR_001).collect()}
    for flag, g in li.groupby("l_returnflag"):
        q = g["l_quantity"].to_numpy(dtype=float)
        p = g["l_extendedprice"].to_numpy(dtype=float)
        dc = g["l_discount"].to_numpy(dtype=float)
        m = q - q.mean()
        m2 = float((m ** 2).mean())
        skew = float((m ** 3).mean()) / m2 ** 1.5
        kurt = float((m ** 4).mean()) / m2 ** 2 - 3.0
        std = float(q.std(ddof=1))
        corr = float(np.corrcoef(q, p)[0, 1])
        cov = float(np.cov(q, dc, ddof=1)[0, 1])
        r = rows[flag]
        assert r["n"] == len(g)
        for got, ref in [(r["skew_qty"], skew), (r["kurt_qty"], kurt),
                         (r["std_qty"], std), (r["corr_qty_price"], corr),
                         (r["cov_qty_disc"], cov)]:
            assert abs(got - ref) < 1e-4, (flag, got, ref)


def test_gini_matches_numpy(spark):
    """agg_gini_spend's tie-collapsed two-phase rank formula vs the
    plain sorted-rank Gini in numpy over the same rounded spends."""
    o = _pdf("orders")
    spend = np.sort(np.round(
        o.groupby("o_custkey")["o_totalprice"].sum().to_numpy(dtype=float),
        2))
    n = len(spend)
    ranks = np.arange(1, n + 1, dtype=float)
    gini_ref = 2.0 * float(np.sum(ranks * spend)) / (
        n * float(np.sum(spend))) - (n + 1.0) / n

    row = SPECS["agg_gini_spend"].fn(spark, SF_DIR_001).collect()[0]
    assert row["n_customers"] == n
    assert abs(row["gini"] - gini_ref) < 2e-6, (row["gini"], gini_ref)


def test_zipf_alpha_matches_numpy_polyfit(spark):
    """text_zipf_alpha's REGR_SLOPE/REGR_R2 fit (the same builtins
    class on both engine sides) vs numpy OLS over a pure-Python
    tokenize -> count -> (cnt desc, tok) rank pipeline."""
    d = _pdf("documents")
    counts: dict[str, int] = {}
    for t in d["text"]:
        for tok in re.sub(r"[^A-Za-z ]", "", t).lower().split(" "):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ordered) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ordered], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    resid = y - (slope * x + intercept)
    r2 = 1.0 - float(np.sum(resid ** 2)) / float(np.sum((y - y.mean()) ** 2))

    row = SPECS["text_zipf_alpha"].fn(spark, SF_DIR_001).collect()[0]
    assert row["n_vocab"] == len(ordered)
    assert abs(row["zipf_alpha"] - (-slope)) < 1e-3, (row["zipf_alpha"], -slope)
    assert abs(row["fit_r2"] - r2) < 1e-3, (row["fit_r2"], r2)


@pytest.fixture(scope="module")
def daily_series(spark):
    """The shared (event_type, day, v) daily series all three fold
    queries aggregate — computed ONCE by Spark so the fold tests
    isolate the F.aggregate recurrence from the shared round(2) prep."""
    from mapreduce_implementation_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR_001, "events")
    rows = (e.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.round(F.sum("value"), 2).alias("v"))
            .orderBy("event_type", "day").collect())
    out: dict[str, list[float]] = {}
    for r in rows:
        out.setdefault(r["event_type"], []).append(float(r["v"]))
    return out


def test_holt_linear_matches_python_fold(spark, daily_series):
    """timeseries_holt_linear's F.aggregate struct fold vs the plain
    Python Holt recurrence (alpha=0.3, gamma=0.1, l1=x1, b1=x2-x1)."""
    rows = {r["event_type"]: r for r in
            SPECS["timeseries_holt_linear"].fn(spark, SF_DIR_001).collect()}
    checked = 0
    for et, vs in daily_series.items():
        if len(vs) < 2:
            assert et not in rows
            continue
        level, b = vs[0], vs[1] - vs[0]
        for x in vs[1:]:
            lnew = 0.3 * x + 0.7 * (level + b)
            b = 0.1 * (lnew - level) + 0.9 * b
            level = lnew
        r = rows[et]
        assert r["n_days"] == len(vs)
        assert abs(r["level"] - level) < 1e-5, (et, r["level"], level)
        assert abs(r["trend"] - b) < 1e-5, (et, r["trend"], b)
        assert abs(r["forecast_3d"] - (level + 3 * b)) < 1e-4
        checked += 1
    assert checked >= 1


def test_cusum_matches_python_fold(spark, daily_series):
    """timeseries_cusum_changepoint's two-component struct fold vs the
    plain Python Page CUSUM recurrence over the same daily series."""
    rows = {r["event_type"]: r for r in
            SPECS["timeseries_cusum_changepoint"].fn(spark, SF_DIR_001)
            .collect()}
    for et, vs in daily_series.items():
        mu = round(sum(vs) / len(vs), 2)
        s = max(0.0, vs[0] - mu)
        peak = s
        for x in vs[1:]:
            s = max(0.0, s + x - mu)
            peak = max(peak, s)
        r = rows[et]
        assert r["n_days"] == len(vs)
        assert abs(r["cusum_final"] - s) < 1e-3, (et, r["cusum_final"], s)
        assert abs(r["cusum_peak"] - peak) < 1e-3, (et, r["cusum_peak"], peak)
        assert r["alarm"] == (peak > 5 * mu)


def test_ewma_matches_python_fold(spark, daily_series):
    """timeseries_ewma_daily's seeded fold vs the plain Python EWMA
    recurrence (alpha=0.2, seeded with the first element)."""
    rows = {r["event_type"]: r for r in
            SPECS["timeseries_ewma_daily"].fn(spark, SF_DIR_001).collect()}
    for et, vs in daily_series.items():
        acc = vs[0]
        for x in vs[1:]:
            acc = 0.2 * x + 0.8 * acc
        r = rows[et]
        assert r["n_days"] == len(vs)
        assert abs(r["ewma"] - acc) < 1e-5, (et, r["ewma"], acc)


def test_pca_power_matches_numpy(spark):
    """embedding_pca_power vs numpy, two claims: (1) the distributed
    BLAS-partial covariance + _PCA_POWER_ITERS power iterations
    reproduce the SAME
    numbers as numpy running the identical recipe on raw parquet
    vectors (pins covariance_matrix / power_iteration_top exactly);
    (2) the recipe's output approximates the TRUE leading eigenpair
    from numpy.linalg.eigh (pins the statistic's intent, which the
    shared matvec formulation on both engine sides cannot)."""
    from mapreduce_implementation_spark.queries.similarity import (
        _PCA_POWER_ITERS,
    )

    e = _pdf("embeddings")
    M = np.stack(e["embedding"].to_numpy())
    C = np.cov(M, rowvar=False, ddof=0)
    v = np.full(64, 0.125)
    for _ in range(_PCA_POWER_ITERS):
        y = C @ v
        lam = float(np.linalg.norm(y))
        v = y / lam
    rows = SPECS["embedding_pca_power"].fn(spark, SF_DIR_001).collect()
    got = np.empty(64)
    for r in rows:
        got[r["dim"]] = r["loading"]
        assert abs(r["eigenvalue"] - lam) < 1e-4
        assert abs(r["var_explained"] - lam / float(C.trace())) < 1e-4
    assert np.allclose(got, v, atol=1e-3), (got[:5], v[:5])

    # intent: the iteration count actually converged near the true top
    # eigenpair (this assertion is what caught the original 5-round
    # setting stopping at ~85% of lambda1 on the near-isotropic fixture
    # spectrum, lambda2/lambda1 ~ 0.93 — prompting the r11 bump to 40)
    w, V = np.linalg.eigh(C)
    top_val, top_vec = float(w[-1]), V[:, -1]
    assert lam <= top_val * (1 + 1e-9)  # ||C v||, v unit => lam <= lambda1
    assert abs(lam - top_val) / top_val < 0.02, (lam, top_val)
    assert abs(float(np.dot(v, top_vec))) > 0.95


def test_embedding_outlier_zscore_matches_numpy(spark):
    """embedding_outlier_zscore's top-20 diagonal-Mahalanobis distances
    vs direct numpy per-dim z-score arithmetic on the raw vectors."""
    e = _pdf("embeddings")
    ids = e["vec_id"].to_numpy()
    M = np.stack(e["embedding"].to_numpy()).astype(float)
    mu = M.mean(axis=0)
    sigma = M.std(axis=0, ddof=0)
    nz = sigma != 0
    d2 = (((M[:, nz] - mu[nz]) / sigma[nz]) ** 2).sum(axis=1)
    order = sorted(range(len(ids)),
                   key=lambda i: (-round(d2[i], 6), ids[i]))[:20]
    want = [(int(ids[i]), round(round(d2[i], 6), 2)) for i in order]

    got = [(r["vec_id"], r["z2"]) for r in
           SPECS["embedding_outlier_zscore"].fn(spark, SF_DIR_001).collect()]
    assert [g[0] for g in got] == [w[0] for w in want], (got[:5], want[:5])
    for (gi, gz), (wi, wz) in zip(got, want):
        assert abs(gz - wz) < 0.02, (gi, gz, wz)


def test_chi2_matches_numpy(spark):
    """stats_chi2_event_dow's contingency chi-square (identical
    marginal/expected formulation on both engine sides) vs direct
    numpy arithmetic on a pandas-built contingency table."""
    e = _pdf("events")
    # Spark dayofweek(): 1=Sunday..7=Saturday; pandas: 0=Monday..6=Sunday
    dow = (e["ts"].dt.dayofweek.to_numpy() + 1) % 7 + 1
    tab: dict[tuple[str, int], int] = {}
    for et, d in zip(e["event_type"], dow):
        tab[(et, int(d))] = tab.get((et, int(d)), 0) + 1
    types = sorted({k[0] for k in tab})
    dows = sorted({k[1] for k in tab})
    obs = np.array([[tab.get((t, d), 0) for d in dows] for t in types],
                   dtype=float)
    rn = obs.sum(axis=1, keepdims=True)
    cn = obs.sum(axis=0, keepdims=True)
    exp = rn * cn / obs.sum()
    # the query sums only over OBSERVED cells (obs built from groupBy);
    # zero-count cells contribute exp, not 0 — replicate exactly
    mask = obs > 0
    chi2_ref = float((((obs - exp) ** 2 / exp)[mask]).sum())
    dof_ref = (len(types) - 1) * (len(dows) - 1)

    row = SPECS["stats_chi2_event_dow"].fn(spark, SF_DIR_001).collect()[0]
    assert row["dof"] == dof_ref
    assert abs(row["chi2"] - chi2_ref) < 1e-3, (row["chi2"], chi2_ref)


def test_anomaly_zscore_matches_python(spark):
    """anomaly_daily_zscore's 2-sigma day flags vs pandas daily counts
    + numpy sample-stddev z-scores, fully independent of both engines'
    SQL."""
    e = _pdf("events")
    day = e["ts"].dt.strftime("%Y-%m-%d")
    counts: dict[tuple[str, str], int] = {}
    for et, d in zip(e["event_type"], day):
        counts[(et, d)] = counts.get((et, d), 0) + 1
    series: dict[str, list[tuple[str, int]]] = {}
    for (et, d), n in counts.items():
        series.setdefault(et, []).append((d, n))
    want = {}
    for et, pairs in series.items():
        ns = np.array([n for _, n in pairs], dtype=float)
        mu, sd = ns.mean(), ns.std(ddof=1)
        if sd <= 0:
            continue
        for d, n in pairs:
            z = (n - mu) / sd
            if abs(z) > 2:
                want[(et, d)] = (n, z)

    got = {(r["event_type"], r["day"]): (r["n_events"], r["zscore"])
           for r in SPECS["anomaly_daily_zscore"].fn(spark, SF_DIR_001)
           .collect()}
    assert set(got) == set(want), (
        sorted(set(got) ^ set(want))[:5])
    for k, (n, z) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - z) < 1e-4, (k, got[k][1], z)


def test_anomaly_mad_matches_numpy(spark, daily_series):
    """anomaly_daily_mad's robust z (median/MAD with the 1.4826
    consistency constant) vs numpy percentile arithmetic over the same
    Spark-computed daily revenue series."""
    rows = {(r["event_type"], r["day"]): (r["revenue"], r["robust_z"])
            for r in SPECS["anomaly_daily_mad"].fn(spark, SF_DIR_001)
            .collect()}
    flagged = set()
    for et, vs in daily_series.items():
        v = np.array(vs, dtype=float)
        m = float(np.percentile(v, 50))
        mad = float(np.percentile(np.abs(v - m), 50))
        if mad <= 0:
            continue
        for x in v:
            z = (x - m) / (1.4826 * mad)
            if abs(z) > 2.5:
                flagged.add((et, round(float(x), 2), round(z, 4)))
    got = {(et, round(float(rev), 2), robust)
           for (et, _day), (rev, robust) in rows.items()}
    assert got == flagged, (sorted(got - flagged)[:3],
                            sorted(flagged - got)[:3])


def test_geometric_harmonic_means_match_numpy(spark):
    """agg_geometric_harmonic_means' log-space GM and reciprocal HM
    (the same single-pass formulation both engine sides) vs numpy."""
    li = _pdf("lineitem")
    li = li[li["l_extendedprice"] > 0]
    rows = {r["l_returnflag"]: r for r in
            SPECS["agg_geometric_harmonic_means"].fn(spark, SF_DIR_001)
            .collect()}
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_extendedprice"].to_numpy(dtype=float)
        am = float(x.mean())
        gm = float(np.exp(np.log(x).mean()))
        hm = float(len(x) / np.sum(1.0 / x))
        r = rows[flag]
        assert r["n"] == len(x)
        assert abs(r["mean_arith"] - am) < 1e-3
        assert abs(r["mean_geom"] - gm) < 1e-3
        assert abs(r["mean_harm"] - hm) < 1e-3
        assert r["am_gm_hm_holds"] == (gm <= am and hm <= gm) is True


def test_trimmed_winsorized_mean_match_numpy(spark):
    """agg_trimmed_mean's p10/p90 bounds, two-sided trimmed mean and
    winsorized mean vs numpy.percentile (linear interpolation — the
    quantile_cont/percentile() definition both engines share)."""
    li = _pdf("lineitem")
    x = li["l_extendedprice"].to_numpy(dtype=float)
    p10, p90 = np.percentile(x, [10, 90])
    kept = x[(x >= p10) & (x <= p90)]
    trimmed = float(kept.mean())
    winsor = float(np.clip(x, p10, p90).mean())

    row = SPECS["agg_trimmed_mean"].fn(spark, SF_DIR_001).collect()[0]
    assert row["n_kept"] == len(kept)
    assert abs(row["p10"] - p10) < 1e-2
    assert abs(row["p90"] - p90) < 1e-2
    assert abs(row["trimmed_mean"] - trimmed) < 1e-2
    assert abs(row["winsorized_mean"] - winsor) < 1e-2


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^A-Za-z ]", "", text).lower().split(" ")
            if t]


def test_pmi_matches_python(spark):
    """text_pmi_pairs' document-event PMI (same inverted-index
    formulation both engine sides) vs a pure-Python co-occurrence
    count: PMI = ln(c_ab * N / (c_a * c_b)) over the df>=0.2N vocab
    with c_ab >= 0.3N."""
    d = _pdf("documents")
    doc_toks = {int(i): set(_py_tokens(t))
                for i, t in zip(d["doc_id"], d["text"])}
    n = len(doc_toks)
    df: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in toks:
            df[t] = df.get(t, 0) + 1
    vocab = {t for t, c in df.items() if c >= 0.2 * n}
    co: dict[tuple[str, str], int] = {}
    for toks in doc_toks.values():
        keep = sorted(toks & vocab)
        for i in range(len(keep)):
            for j in range(i + 1, len(keep)):
                co[(keep[i], keep[j])] = co.get((keep[i], keep[j]), 0) + 1
    want = {pair: (c, math.log(c * n / (df[pair[0]] * df[pair[1]])))
            for pair, c in co.items() if c >= 0.3 * n}

    got = {(r["w1"], r["w2"]): (r["c_ab"], r["pmi"]) for r in
           SPECS["text_pmi_pairs"].fn(spark, SF_DIR_001).collect()}
    assert set(got) == set(want), (sorted(set(got) ^ set(want))[:5])
    for pair, (c, pmi) in want.items():
        assert got[pair][0] == c
        assert abs(got[pair][1] - pmi) < 1e-5, (pair, got[pair][1], pmi)


def test_bigram_logprob_matches_python(spark):
    """text_bigram_logprob's corpus-trained MLE bigram model and
    per-doc mean log-probability vs a pure-Python count model."""
    d = _pdf("documents")
    doc_bigrams: dict[int, list[tuple[str, str]]] = {}
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _py_tokens(t)
        bgs = list(zip(toks, toks[1:]))
        doc_bigrams[int(i)] = bgs
        for bg in bgs:
            c12[bg] = c12.get(bg, 0) + 1
            c1[bg[0]] = c1.get(bg[0], 0) + 1
    want = {i: (len(bgs),
                sum(math.log(c12[bg] / c1[bg[0]]) for bg in bgs) / len(bgs))
            for i, bgs in doc_bigrams.items() if bgs}

    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in
           SPECS["text_bigram_logprob"].fn(spark, SF_DIR_001).collect()}
    assert set(got) == set(want)
    for i, (nb, lp) in want.items():
        assert got[i][0] == nb, (i, got[i][0], nb)
        assert abs(got[i][1] - lp) < 1e-5, (i, got[i][1], lp)


def test_js_divergence_matches_python(spark):
    """text_js_divergence_sources' pairwise JSD over source unigram
    distributions vs a pure-Python entropy computation."""
    d = _pdf("documents")
    cnt: dict[str, dict[str, int]] = {}
    for src, t in zip(d["source"], d["text"]):
        m = cnt.setdefault(src, {})
        for tok in _py_tokens(t):
            m[tok] = m.get(tok, 0) + 1
    probs = {s: {t: c / sum(m.values()) for t, c in m.items()}
             for s, m in cnt.items()}
    want = {}
    srcs = sorted(probs)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            p, q = probs[srcs[i]], probs[srcs[j]]
            vocab = set(p) | set(q)
            jsd = 0.0
            for t in vocab:
                p1, p2 = p.get(t, 0.0), q.get(t, 0.0)
                m = (p1 + p2) / 2
                jsd += (0.5 * (p1 * math.log(p1) if p1 > 0 else 0.0)
                        + 0.5 * (p2 * math.log(p2) if p2 > 0 else 0.0)
                        - m * math.log(m))
            want[(srcs[i], srcs[j])] = (len(vocab), jsd)

    got = {(r["s1"], r["s2"]): (r["n_words"], r["jsd_nats"], r["jsd_bits"])
           for r in SPECS["text_js_divergence_sources"].fn(spark, SF_DIR_001)
           .collect()}
    assert set(got) == set(want)
    for pair, (nv, jsd) in want.items():
        assert got[pair][0] == nv, (pair, got[pair][0], nv)
        assert abs(got[pair][1] - jsd) < 1e-5, (pair, got[pair][1], jsd)
        assert abs(got[pair][2] - jsd / math.log(2)) < 1e-5
        # JSD bounds: symmetric, in [0, ln 2]
        assert 0.0 <= got[pair][1] <= math.log(2) + 1e-9


def test_heaps_law_matches_python(spark):
    """text_heaps_law's cumulative vocabulary curve and fitted beta vs
    pure-Python trigram accounting.  The decile boundary doc_ids are
    taken FROM the query output (the percentile_disc convention is
    engine-defined); everything downstream — cumulative gram counts,
    first-seen vocabulary sizes at each boundary, and the log-log OLS
    slope — is recomputed independently."""
    d = _pdf("documents")
    per_doc: dict[int, int] = {}
    first_doc: dict[tuple[str, str, str], int] = {}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _py_tokens(t)
        grams = list(zip(toks, toks[1:], toks[2:]))
        if not grams:
            continue
        per_doc[int(i)] = len(grams)
        for g in grams:
            if g not in first_doc or first_doc[g] > int(i):
                first_doc[g] = int(i)

    rows = sorted(SPECS["text_heaps_law"].fn(spark, SF_DIR_001).collect(),
                  key=lambda r: r["decile"])
    assert len(rows) == 10
    xs, ys = [], []
    for r in rows:
        b = r["boundary_doc"]
        cum = sum(n for i, n in per_doc.items() if i <= b)
        voc = sum(1 for fd in first_doc.values() if fd <= b)
        assert r["cum_tokens"] == cum, (r["decile"], r["cum_tokens"], cum)
        assert r["vocab_size"] == voc, (r["decile"], r["vocab_size"], voc)
        xs.append(math.log(cum))
        ys.append(math.log(voc))
    slope, _ = np.polyfit(np.array(xs), np.array(ys), 1)
    assert abs(rows[0]["heaps_beta"] - slope) < 1e-3, (
        rows[0]["heaps_beta"], slope)
    # intent: a natural-ish corpus grows sub-linearly but non-trivially
    assert 0.1 < slope < 1.0


def test_markov_transitions_match_python(spark):
    """events_markov_transitions' first-order transition matrix vs a
    pure-Python per-user sequence walk (ordered by the same
    second-formatted-ts, event_id total order)."""
    e = _pdf("events")
    rows = sorted(
        zip(e["user_id"], e["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            e["event_id"], e["event_type"]),
        key=lambda r: (r[0], r[1], r[2]))
    trans: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for uid, _ts, _eid, et in rows:
        if uid == prev_user:
            trans[(prev_type, et)] = trans.get((prev_type, et), 0) + 1
        prev_user, prev_type = uid, et
    tot: dict[str, int] = {}
    for (cur, _nxt), n in trans.items():
        tot[cur] = tot.get(cur, 0) + n

    got = {(r["cur_type"], r["next_type"]): (r["n_trans"], r["p"]) for r in
           SPECS["events_markov_transitions"].fn(spark, SF_DIR_001).collect()}
    assert set(got) == set(trans)
    for pair, n in trans.items():
        assert got[pair][0] == n, (pair, got[pair][0], n)
        assert abs(got[pair][1] - n / tot[pair[0]]) < 1e-6
    # intent: rows of the transition matrix are probability distributions
    psum: dict[str, float] = {}
    for (cur, _), (_, p) in got.items():
        psum[cur] = psum.get(cur, 0.0) + p
    for cur, s in psum.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)


def test_repetition_gopher_matches_python(spark):
    """text_repetition_gopher's duplicate-bigram fraction, top-bigram
    mass and keep flag (Rae et al. 2021 SA1.1 thresholds) vs a
    pure-Python bigram count per document."""
    d = _pdf("documents")
    got = {r["doc_id"]: r for r in
           SPECS["text_repetition_gopher"].fn(spark, SF_DIR_001).collect()}
    checked = 0
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _py_tokens(t)
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert int(i) not in got
            continue
        cnt: dict[tuple[str, str], int] = {}
        for bg in bgs:
            cnt[bg] = cnt.get(bg, 0) + 1
        n, top, nd = len(bgs), max(cnt.values()), len(cnt)
        dup, tfrac = 1 - nd / n, top / n
        r = got[int(i)]
        assert r["n_bigrams"] == n
        assert abs(r["dup_bigram_frac"] - dup) < 1e-6
        assert abs(r["top_bigram_frac"] - tfrac) < 1e-6
        assert r["keep"] == int(tfrac <= 0.18 and dup <= 0.6)
        checked += 1
    assert checked == len(got)


def test_rake_matches_python_reference(spark):
    """text_keyphrase_rake vs a pure-Python RAKE (Rose et al. 2010):
    stopword-delimited candidate phrases, corpus word scores
    deg(w)/freq(w) with deg = sum of containing-phrase lengths, phrase
    score = sum of member word scores, support cut n_occ >= 3 on
    >= 2-word phrases."""
    from mapreduce_implementation_spark.operators.textstats import (
        EN_STOPWORDS,
    )

    d = _pdf("documents")
    stop = set(EN_STOPWORDS)
    phrases: list[list[str]] = []  # every phrase occurrence, all lengths
    for t in d["text"]:
        cur: list[str] = []
        for tok in _py_tokens(t):
            if tok in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append(cur)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    want: dict[str, tuple[int, int, float]] = {}
    for ph in phrases:
        if len(ph) < 2:
            continue
        text = " ".join(ph)
        score = sum(deg[w] / freq[w] for w in ph)
        n, _nw, _s = want.get(text, (0, len(ph), score))
        want[text] = (n + 1, len(ph), score)
    want = {k: v for k, v in want.items() if v[0] >= 3}

    got = {r["phrase"]: (r["n_occ"], r["n_words"], r["rake_score"]) for r in
           SPECS["text_keyphrase_rake"].fn(spark, SF_DIR_001).collect()}
    assert set(got) == set(want), (sorted(set(got) ^ set(want))[:5])
    for ph, (n, nw, s) in want.items():
        assert got[ph][0] == n, (ph, got[ph][0], n)
        assert got[ph][1] == nw
        assert abs(got[ph][2] - s) < 1e-3, (ph, got[ph][2], s)


def test_weighted_median_matches_python(spark):
    """agg_weighted_median's half-total crossing row vs a pure-Python
    cumulative walk over the identically-ordered rows."""
    li = _pdf("lineitem")
    rows = sorted(zip(li["l_extendedprice"], li["l_quantity"],
                      li["l_orderkey"], li["l_linenumber"]),
                  key=lambda r: (r[0], r[2], r[3]))
    total = float(sum(r[1] for r in rows))
    acc = 0.0
    med = None
    for price, qty, _, _ in rows:
        acc += qty
        if acc >= total / 2:
            med = round(float(price), 2)
            break

    r = SPECS["agg_weighted_median"].fn(spark, SF_DIR_001).collect()[0]
    assert r["total_weight"] == int(total)
    assert abs(r["weighted_median"] - med) < 1e-9, (r["weighted_median"], med)


def test_systematic_sampling_matches_python(spark):
    """sample_weighted_systematic's PPS crossings vs a pure-Python
    integer cumulative walk — selection iff the cumulative weight
    crosses a multiple of step = total DIV 50."""
    d = _pdf("documents")
    rows = sorted(zip(d["doc_id"], d["n_chars"]), key=lambda r: r[0])
    total = int(sum(n for _, n in rows))
    step = total // 50
    want = {}
    acc = 0
    for i, n in rows:
        prev = acc
        acc += int(n)
        if acc // step > prev // step:
            want[int(i)] = acc // step

    got = {r["doc_id"]: r["sel_idx"] for r in
           SPECS["sample_weighted_systematic"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, (sorted(set(got) ^ set(want))[:5])
    # intent: ~50 picks, each doc at most once, probability ~ weight
    assert 40 <= len(got) <= 51


def test_source_topp_matches_python(spark):
    """corpus_source_topp's nucleus cut (keep largest docs while the
    EXCLUSIVE cumulative offset is under half the source's mass) vs a
    pure-Python sorted walk per source."""
    d = _pdf("documents")
    per_src: dict[str, list[tuple[int, int]]] = {}
    for src, i, n in zip(d["source"], d["doc_id"], d["n_chars"]):
        per_src.setdefault(src, []).append((int(n), int(i)))
    want = {}
    for src, docs in per_src.items():
        total = sum(n for n, _ in docs)
        acc, kept_n, kept_chars = 0, 0, 0
        for n, i in sorted(docs, key=lambda x: (-x[0], x[1])):
            if acc < 0.5 * total:
                kept_n += 1
                kept_chars += n
            acc += n
        want[src] = (kept_n, kept_chars, round(kept_chars / total, 4))

    got = {r["source"]: (r["n_docs_kept"], r["chars_kept"], r["share"])
           for r in SPECS["corpus_source_topp"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, (sorted(got.items())[:2], sorted(want.items())[:2])
    # intent: the nucleus covers at least half of each source's mass,
    # and removing the crossing doc would drop it under half
    for src, (_kn, kc, _sh) in want.items():
        assert kc * 2 >= sum(n for n, _ in per_src[src])


def test_wau_sliding_matches_python(spark):
    """timeseries_wau_sliding's fan-out identity vs a direct per-day
    set-union of the trailing 7 days' active users."""
    e = _pdf("events")
    base = np.datetime64("2024-01-01")
    dday = ((e["ts"].dt.normalize().to_numpy() - base)
            / np.timedelta64(1, "D")).astype(int)
    active: dict[int, set] = {}
    for d_, u in zip(dday, e["user_id"]):
        active.setdefault(int(d_), set()).add(u)
    lo, hi = min(active), max(active)
    want = {}
    for day in range(lo, hi + 1):
        users = set()
        for back in range(7):
            users |= active.get(day - back, set())
        if users:
            want[day] = len(users)

    got = {r["dday"]: r["wau"] for r in
           SPECS["timeseries_wau_sliding"].fn(spark, SF_DIR_001).collect()}
    assert got == want, (sorted(set(got) ^ set(want))[:5])


def test_quality_score_matches_python(spark):
    """text_quality_score's band-weighted heuristic (token-count,
    mean-word-length and stopword bands + raw-text alpha ratio) vs a
    pure-Python recomputation over the same token rules."""
    from mapreduce_implementation_spark.operators.textstats import (
        EN_STOPWORDS,
    )

    d = _pdf("documents")
    got = {r["doc_id"]: r for r in
           SPECS["text_quality_score"].fn(spark, SF_DIR_001).collect()}
    stop = set(EN_STOPWORDS)
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _py_tokens(t)
        n_tok = len(toks)
        mean_wlen = (sum(len(w) for w in toks) / n_tok) if toks else 0.0
        n_stop = sum(1 for w in toks if w in stop)
        stop_ratio = n_stop / max(n_tok, 1)
        alpha = len(re.sub(r"[^A-Za-z]", "", t)) / max(len(t), 1)
        score = (0.3 * (1.0 if 20 <= n_tok <= 1000 else 0.3)
                 + 0.25 * (1.0 if 3 <= mean_wlen <= 10 else 0.4)
                 + 0.25 * (1.0 if stop_ratio >= 0.02 else 0.5)
                 + 0.2 * alpha)
        r = got[int(i)]
        assert r["n_tokens"] == n_tok
        assert abs(r["alpha_ratio"] - alpha) < 1e-6
        assert abs(r["stopword_ratio"] - stop_ratio) < 1e-6
        assert abs(r["mean_word_len"] - mean_wlen) < 1e-6
        assert abs(r["quality_score"] - score) < 1e-6, (i, r["quality_score"],
                                                        score)


def test_lang_id_matches_python(spark):
    """text_lang_id's stopword-profile argmax (with the 'und' floor and
    the en>de>fr>es tie order) vs a pure-Python recomputation."""
    from mapreduce_implementation_spark.operators.textstats import (
        EN_STOPWORDS,
    )

    profiles = {
        "en": set(EN_STOPWORDS),
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
        "fr": {"le", "la", "les", "et", "est", "un", "une"},
        "es": {"el", "la", "los", "y", "es", "un", "una"},
    }
    d = _pdf("documents")
    got = {r["doc_id"]: (r["score_en"], r["predicted_lang"]) for r in
           SPECS["text_lang_id"].fn(spark, SF_DIR_001).collect()}
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _py_tokens(t)
        n = max(len(toks), 1)
        r = {lang: sum(1 for w in toks if w in s) / n
             for lang, s in profiles.items()}
        best = max(r.values())
        if best < 0.01:
            lang = "und"
        else:
            lang = next(k for k in ("en", "de", "fr", "es")
                        if r[k] == best)
        if int(i) not in got:
            assert not toks, i  # zero-token docs drop out of the join
            continue
        assert abs(got[int(i)][0] - r["en"]) < 1e-6
        assert got[int(i)][1] == lang, (i, got[int(i)][1], lang, r)


def test_streaks_matches_python(spark):
    """streaks_gaps_islands' longest consecutive-day streak (island
    trick on both engine sides) vs a pure-Python day-set walk."""
    e = _pdf("events")
    days: dict[int, set] = {}
    for u, d_ in zip(e["user_id"], e["ts"].dt.normalize()):
        days.setdefault(int(u), set()).add(d_.date())
    want = {}
    one = np.timedelta64  # noqa: F841 (kept simple below)
    import datetime as dt
    for u, ds in days.items():
        best_len, best_start = 0, None
        for d_ in sorted(ds):
            if d_ - dt.timedelta(days=1) in ds:
                continue  # not a streak start
            ln = 1
            while d_ + dt.timedelta(days=ln) in ds:
                ln += 1
            # longest wins; earliest start breaks ties
            if ln > best_len:
                best_len, best_start = ln, d_
        want[u] = (best_len, str(best_start))

    got = {r["user_id"]: (r["longest_streak_days"], r["streak_start"])
           for r in SPECS["streaks_gaps_islands"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, (sorted(set(got) ^ set(want))[:3])


def test_new_vs_returning_matches_python(spark):
    """events_new_vs_returning's daily growth decomposition vs a
    pure-Python first-seen walk; pins active = new + returning."""
    e = _pdf("events")
    act: dict[str, set] = {}
    first: dict[int, str] = {}
    for u, d_ in zip(e["user_id"], e["ts"].dt.strftime("%Y-%m-%d")):
        act.setdefault(d_, set()).add(int(u))
        if int(u) not in first or d_ < first[int(u)]:
            first[int(u)] = d_
    want = {}
    for d_, users in act.items():
        new = sum(1 for u in users if first[u] == d_)
        want[d_] = (len(users), new, len(users) - new)

    got = {r["day"]: (r["active_users"], r["new_users"],
                      r["returning_users"])
           for r in SPECS["events_new_vs_returning"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, (sorted(set(got) ^ set(want))[:3])
    for d_, (a, n, r_) in got.items():
        assert a == n + r_


def test_cumulative_users_matches_python(spark):
    """timeseries_cumulative_users' first-occurrence growth curve vs a
    pure-Python expanding distinct-user walk; the final cumulative
    value must equal the total distinct-user count."""
    e = _pdf("events")
    first: dict[int, str] = {}
    for u, d_ in zip(e["user_id"], e["ts"].dt.strftime("%Y-%m-%d")):
        if int(u) not in first or d_ < first[int(u)]:
            first[int(u)] = d_
    new_per_day: dict[str, int] = {}
    for d_ in first.values():
        new_per_day[d_] = new_per_day.get(d_, 0) + 1
    want = {}
    acc = 0
    for d_ in sorted(new_per_day):
        acc += new_per_day[d_]
        want[d_] = (new_per_day[d_], acc)

    got = {r["day"]: (r["new_users"], r["cumulative_users"]) for r in
           SPECS["timeseries_cumulative_users"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, (sorted(set(got) ^ set(want))[:3])
    assert max(c for _, c in got.values()) == len(first)


# --- r12: the text-retrieval statistics the r11 program skipped ---
# (VERDICT r11 item 3: BM25, TF-IDF weights, LLR pair scores, and the
# MinHash Jaccard ESTIMATE — all shared-formulation oracle twins until
# now, exactly the shape the BPE lesson warns about.)


def test_tfidf_matches_python(spark):
    """text_tfidf_top3's weights (tf=n/len, idf=ln(N/df)) and per-doc
    top-3 selection vs a pure-Python fold over the parquet text."""
    d = _pdf("documents")
    doc_toks = {int(i): _py_tokens(t) for i, t in zip(d["doc_id"], d["text"])}
    doc_toks = {i: ts for i, ts in doc_toks.items() if ts}  # docs w/ tokens
    n_docs = len(doc_toks)
    dfreq: dict[str, int] = {}
    for ts in doc_toks.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    want: dict[int, list[tuple[str, float, int]]] = {}
    for i, ts in doc_toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((term, round(c / len(ts) * math.log(n_docs / dfreq[term]), 6))
             for term, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]))
        want[i] = [(term, w, rk + 1)
                   for rk, (term, w) in enumerate(scored[:3])]

    rows = SPECS["text_tfidf_top3"].fn(spark, SF_DIR_001).collect()
    got: dict[int, list[tuple[str, float, int]]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tfidf"], r["term_rank"]))
    got = {i: sorted(v, key=lambda x: x[2]) for i, v in got.items()}
    assert set(got) == set(want)
    for i in want:
        assert [(t, rk) for t, _, rk in got[i]] \
            == [(t, rk) for t, _, rk in want[i]], (i, got[i], want[i])
        for (gt, gw, _), (wt, ww, _) in zip(got[i], want[i]):
            assert abs(gw - ww) <= 1e-6, (i, gt, gw, ww)


def test_bm25_matches_python(spark):
    """text_bm25_top10's Okapi ranking (k1=1.2, b=0.75, the query
    {hash, join, window}) vs an independent pure-Python BM25."""
    k1, b, terms = 1.2, 0.75, ("hash", "join", "window")
    d = _pdf("documents")
    doc_toks = {int(i): _py_tokens(t) for i, t in zip(d["doc_id"], d["text"])}
    doc_toks = {i: ts for i, ts in doc_toks.items() if ts}
    n_docs = len(doc_toks)
    avgdl = sum(len(ts) for ts in doc_toks.values()) / n_docs
    dfreq = {t: sum(1 for ts in doc_toks.values() if t in ts)
             for t in terms}
    scores: dict[int, float] = {}
    for i, ts in doc_toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [(r["doc_id"], r["bm25"], r["rank"]) for r in sorted(
        SPECS["text_bm25_top10"].fn(spark, SF_DIR_001).collect(),
        key=lambda r: r["rank"])]
    assert [(i, rk + 1) for rk, (i, _) in enumerate(want)] \
        == [(i, rk) for i, _, rk in got]
    for (wi, ws), (_, gs, _) in zip(want, got):
        assert abs(gs - ws) <= 2e-6, (wi, gs, ws)


def test_llr_matches_python(spark):
    """text_collocations_llr's Dunning 2x2 log-likelihood ratio vs a
    pure-Python contingency fold over per-doc consecutive bigrams."""
    d = _pdf("documents")
    k11: dict[tuple[str, str], int] = {}
    for t in d["text"]:
        ts = _py_tokens(t)
        for a, bb in zip(ts, ts[1:]):
            k11[(a, bb)] = k11.get((a, bb), 0) + 1
    r1: dict[str, int] = {}
    c1: dict[str, int] = {}
    for (a, bb), k in k11.items():
        r1[a] = r1.get(a, 0) + k
        c1[bb] = c1.get(bb, 0) + k
    nn = sum(k11.values())

    def llr(a, bb):
        kk11 = k11[(a, bb)]
        kk12 = r1[a] - kk11
        kk21 = c1[bb] - kk11
        kk22 = nn - r1[a] - c1[bb] + kk11
        def term(k, le, ri):
            return k * math.log(k * nn / (le * ri)) if k > 0 else 0.0
        return round(2 * (term(kk11, r1[a], c1[bb])
                          + term(kk12, r1[a], nn - c1[bb])
                          + term(kk21, nn - r1[a], c1[bb])
                          + term(kk22, nn - r1[a], nn - c1[bb])), 4)

    want = sorted(
        ((a, bb, k, llr(a, bb)) for (a, bb), k in k11.items() if k >= 30),
        key=lambda x: (-x[3], x[0], x[1]))[:20]

    got = [(r["w1"], r["w2"], r["n_pair"], r["llr"]) for r in
           SPECS["text_collocations_llr"].fn(spark, SF_DIR_001).collect()]
    assert [(a, bb, k) for a, bb, k, _ in got] \
        == [(a, bb, k) for a, bb, k, _ in want], (got[:3], want[:3])
    for (_, _, _, gl), (wa, wb, _, wl) in zip(got, want):
        assert abs(gl - wl) <= 2e-4, (wa, wb, gl, wl)


def test_minhash_estimate_tracks_true_jaccard(spark):
    """The MinHash est_jaccard column is a STATISTICAL estimator — the
    DuckDB audit oracle re-derives the same signatures, so it can never
    say whether signature agreement actually estimates shingle Jaccard.
    This test computes the TRUE 9-char-shingle Jaccard per candidate
    pair in pure Python and checks the estimator against its binomial
    error bar: with 64 hashes, sd = sqrt(J(1-J)/64) <= 0.0625, so
    |est - J| <= 0.25 (4 sd) per pair and mean |err| <= 0.08 across
    pairs.  High-similarity pairs (J >= 0.9) must estimate >= 0.7."""
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    from mapreduce_implementation_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    d = _pdf("documents")
    docs = spark.createDataFrame(d[["doc_id", "text"]])
    try:
        pairs = minhash_dedup_pairs(docs, "doc_id", "text").collect()
    finally:
        release_persisted()
    assert pairs, "sf0.001 synthesizes near-dups; empty candidates = bug"

    def shingles(text):
        norm = re.sub(r"[^A-Za-z ]", "", text).lower()
        return {norm[i:i + 9] for i in range(len(norm) - 8)}

    sh = {int(i): shingles(t) for i, t in zip(d["doc_id"], d["text"])}
    errs = []
    for r in pairs:
        a, b_, est = r["a"], r["b"], r["est_jaccard"]
        inter = len(sh[a] & sh[b_])
        union = len(sh[a] | sh[b_])
        true_j = inter / union if union else 0.0
        errs.append(abs(est - true_j))
        assert abs(est - true_j) <= 0.25, (a, b_, est, true_j)
        if true_j >= 0.9:
            assert est >= 0.7, (a, b_, est, true_j)
    assert sum(errs) / len(errs) <= 0.08, sum(errs) / len(errs)


def test_pii_card_luhn_matches_python(spark):
    """pii_scrub_multi's Luhn gate is the same unrolled doubled-digit
    sum in BOTH engines — hash parity can't catch a mis-transcribed
    checksum.  Recompute card validity per doc with the textbook Python
    Luhn over the independently re-synthesized card numbers, and check
    the redaction actually happened (valid cards absent from the
    scrubbed text implied by n_card - n_card_valid candidates left)."""
    def luhn_valid(digits: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(digits)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    d = _pdf("documents")
    want_valid: dict[int, int] = {}
    want_cards: dict[int, int] = {}
    for did in d["doc_id"]:
        did = int(did)
        if did % 7 == 3:
            digits = (f"4{did % 1000:03d}{did * 3 % 10000:04d}"
                      f"{did * 11 % 10000:04d}{did * 17 % 10000:04d}")
            assert len(digits) == 16
            want_cards[did] = 1
            want_valid[did] = int(luhn_valid(digits))
        else:
            want_cards[did] = want_valid[did] = 0

    rows = SPECS["pii_scrub_multi"].fn(spark, SF_DIR_001).collect()
    assert len(rows) == len(d)
    got_valid = {r["doc_id"]: r["n_card_valid"] for r in rows}
    got_cards = {r["doc_id"]: r["n_card"] for r in rows}
    assert got_cards == want_cards, "card candidates disagree"
    assert got_valid == want_valid, "Luhn validity disagrees"
    # both branches must carry mass, else the gate is untested
    assert sum(want_valid.values()) > 0
    assert sum(want_cards.values()) > sum(want_valid.values())


# --- r12 second wave: layout/analytics/similarity formula checks ------------


def _half_up(x: float, nd: int) -> float:
    """Spark's F.round is HALF_UP; Python's round() is banker's —
    mirror Spark where the test needs exact rounded equality."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"),
                                           rounding=ROUND_HALF_UP))


def test_zorder_key_matches_python_morton(spark):
    """layout_zorder_key's 12-bit Morton interleave (the same
    fully-parenthesized bit expression on both engine sides) vs a
    pure-Python interleave over the raw parquet orders."""
    import datetime

    o = _pdf("orders")
    epoch = datetime.date(1992, 1, 1)
    want: dict[int, list] = {}
    for ck, od in zip(o["o_custkey"], o["o_orderdate"]):
        ck = int(ck)
        dday = (od.date() if hasattr(od, "date") else od) - epoch
        dday = dday.days
        a, b = ck & 4095, dday & 4095
        z = 0
        for i in range(12):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        zb = z >> 14
        e = want.setdefault(zb, [0, ck, ck, dday, dday])
        e[0] += 1
        e[1] = min(e[1], ck); e[2] = max(e[2], ck)
        e[3] = min(e[3], dday); e[4] = max(e[4], dday)

    got = {r["zbucket"]: [r["n"], r["cust_lo"], r["cust_hi"],
                          r["day_lo"], r["day_hi"]] for r in
           SPECS["layout_zorder_key"].fn(spark, SF_DIR_001).collect()}
    assert got == want, sorted(set(got) ^ set(want))[:5]


def test_skyline_pareto_matches_python_bruteforce(spark):
    """skyline_2d_min's collapse-then-running-min formulation vs the
    DEFINITION: brute-force all-pairs dominance over the raw points
    (no window, no collapse — if the linear-scan trick were subtly
    wrong on ties it could agree with its oracle twin and still not be
    the skyline)."""
    o = _pdf("orders")
    import datetime
    epoch = datetime.date(1992, 1, 1)
    pts: dict[str, dict[int, list]] = {}
    for pr, od, tp in zip(o["o_orderpriority"], o["o_orderdate"],
                          o["o_totalprice"]):
        dday = ((od.date() if hasattr(od, "date") else od) - epoch).days
        g = pts.setdefault(pr, {})
        e = g.setdefault(dday, [float("inf"), 0])
        e[0] = min(e[0], float(tp)); e[1] += 1
    want = {}
    for pr, g in pts.items():
        items = [(d, p, n) for d, (p, n) in g.items()]
        for d, p, n in items:
            dominated = any(
                (d2 <= d and p2 <= p and (d2 < d or p2 < p))
                for d2, p2, _ in items)
            if not dominated:
                want[(pr, d)] = (p, n)

    rows = SPECS["skyline_pareto_orders"].fn(spark, SF_DIR_001).collect()
    got = {(r["o_orderpriority"], r["dday"]): (r["min_price"],
                                               r["n_orders_day"])
           for r in rows}
    assert set(got) == set(want), sorted(set(got) ^ set(want))[:5]
    for k, (p, n) in want.items():
        assert got[k][1] == n, (k, got[k], n)
        assert abs(got[k][0] - p) < 5e-3, (k, got[k][0], p)


def test_maxsim_matches_python(spark):
    """similarity_maxsim_multivector's late-interaction score (per
    query-subvector max over doc-subvector cosines, summed) vs a
    pure-numpy recompute with Spark's HALF_UP rounding mirrored at the
    same two stages."""
    e = _pdf("embeddings")
    vecs = {int(i): np.asarray(v, dtype=float)
            for i, v in zip(e["vec_id"], e["embedding"])}
    q = vecs[0]
    sub = 8
    scores = {}
    for vid, v in vecs.items():
        if vid == 0:
            continue
        total = 0.0
        for i in range(8):
            qi = q[i * sub:(i + 1) * sub]
            qn = float(np.linalg.norm(qi))
            best = max(
                _half_up(float(np.dot(v[j * sub:(j + 1) * sub], qi)
                               / (np.linalg.norm(v[j * sub:(j + 1) * sub])
                                  * qn)), 6)
                for j in range(8))
            total += best
        scores[vid] = _half_up(total, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    rows = sorted(SPECS["similarity_maxsim_multivector"]
                  .fn(spark, SF_DIR_001).collect(), key=lambda r: r["rank"])
    got = [(r["vec_id"], r["maxsim"]) for r in rows]
    assert [v for v, _ in got] == [v for v, _ in want], (got, want)
    for (gv, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 2e-6, (gv, gs, ws)


def test_contamination_4gram_matches_python(spark):
    """text_contamination_4gram's broadcast eval-gram join vs a
    pure-Python set-overlap model over the raw text."""
    d = _pdf("documents")
    doc_grams: dict[int, set] = {}
    for did, t in zip(d["doc_id"], d["text"]):
        ts = _py_tokens(t)
        doc_grams[int(did)] = {" ".join(ts[i:i + 4])
                               for i in range(len(ts) - 3)}
    ev = set()
    for did, g in doc_grams.items():
        if did % 100 == 0:
            ev |= g
    want = {did: len(g & ev) for did, g in doc_grams.items()
            if did % 100 != 0 and g & ev}

    got = {r["doc_id"]: r["n_eval_grams"] for r in
           SPECS["text_contamination_4gram"].fn(spark, SF_DIR_001).collect()}
    assert got == want, sorted(set(got) ^ set(want))[:5]


def test_quality_classifier_matches_python(spark):
    """text_quality_classifier's logistic keep-probability (fixed
    public weights over stopword ratio / alpha ratio / mean word
    length) vs a pure-Python recompute of the identical features."""
    stop = {"the", "a", "of", "to", "and", "in", "is", "it"}
    d = _pdf("documents")
    want = {}
    for did, t in zip(d["doc_id"], d["text"]):
        ts = _py_tokens(t)
        n_tok = len(ts)
        n_stop = sum(1 for x in ts if x in stop)
        sum_wlen = sum(len(x) for x in ts)
        alpha = sum(1 for ch in t if ch.isalpha() and ch.isascii())
        alpha_ratio = alpha / max(len(t), 1)
        z = (-1.5 + 4.0 * n_stop / max(n_tok, 1) + 2.0 * alpha_ratio
             + 0.1 * sum_wlen / max(n_tok, 1))
        want[int(did)] = 1.0 / (1.0 + math.exp(-z))

    rows = SPECS["text_quality_classifier"].fn(spark, SF_DIR_001).collect()
    assert len(rows) == len(want)
    for r in rows:
        w = want[r["doc_id"]]
        assert abs(r["p_quality"] - w) <= 2e-6, (r["doc_id"],
                                                 r["p_quality"], w)
        if abs(w - 0.7) > 1e-5:
            assert r["keep"] == (w >= 0.7), (r["doc_id"], w, r["keep"])


def test_rrf_fusion_matches_python(spark):
    """retrieval_rrf_fusion recomputed END TO END in pure Python: BM25
    top-20 over the raw text (independent Okapi), cosine top-20 to
    vec 0 over the raw embeddings (numpy), RRF(k=60) fusion, final
    top-10 — the prior contract test only bounded the rrf values; this
    pins the ranking itself."""
    k1, b, terms = 1.2, 0.75, ("hash", "join", "window")
    d = _pdf("documents")
    doc_toks = {int(i): _py_tokens(t) for i, t in zip(d["doc_id"], d["text"])
                if int(i) != 0}
    doc_toks = {i: ts for i, ts in doc_toks.items() if ts}
    n_docs = len(doc_toks)
    avgdl = sum(len(ts) for ts in doc_toks.values()) / n_docs
    dfreq = {t: sum(1 for ts in doc_toks.values() if t in ts) for t in terms}
    bm_scores = {}
    for i, ts in doc_toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf and dfreq[t]:
                idf = math.log(1 + (n_docs - dfreq[t] + 0.5)
                               / (dfreq[t] + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            bm_scores[i] = s
    bm20 = {i: r + 1 for r, (i, _) in enumerate(
        sorted(bm_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20])}

    e = _pdf("embeddings")
    vecs = {int(i): np.asarray(v, dtype=float)
            for i, v in zip(e["vec_id"], e["embedding"])}
    q = vecs[0]
    qn = np.linalg.norm(q)
    cos = {i: float(np.dot(v, q) / (np.linalg.norm(v) * qn))
           for i, v in vecs.items() if i != 0}
    # the engine ranks on round(cos, 6) — mirror with HALF_UP
    cs20 = {i: r + 1 for r, (i, _) in enumerate(
        sorted(((i, _half_up(c, 6)) for i, c in cos.items()),
               key=lambda kv: (-kv[1], kv[0]))[:20])}

    fused = {}
    for i in set(bm20) | set(cs20):
        fused[i] = ((1.0 / (60 + bm20[i]) if i in bm20 else 0.0)
                    + (1.0 / (60 + cs20[i]) if i in cs20 else 0.0))
    want = sorted(((i, _half_up(s, 6)) for i, s in fused.items()),
                  key=lambda kv: (-kv[1], kv[0]))[:10]

    rows = sorted(SPECS["retrieval_rrf_fusion"].fn(spark, SF_DIR_001)
                  .collect(), key=lambda r: r["rank"])
    got = [(r["doc_id"], r["rrf"]) for r in rows]
    assert [i for i, _ in got] == [i for i, _ in want], (got, want)
    for (gi, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 2e-6, (gi, gs, ws)


def test_source_prior_shrinkage_matches_python(spark):
    """curation_source_prior's empirical-Bayes shrinkage
    (sum_p + C*g)/(n + C), C=25, recomputed in pure Python over the
    same logistic features — and the shrinkage PROPERTY itself: every
    shrunk mean lies strictly between the source's raw mean and the
    global mean (unless they coincide), with small sources pulled
    proportionally harder."""
    stop = {"the", "a", "of", "to", "and", "in", "is", "it"}
    d = _pdf("documents")
    by_src: dict[str, list[float]] = {}
    for src, t in zip(d["source"], d["text"]):
        ts = _py_tokens(t)
        n_tok = len(ts)
        alpha = sum(1 for ch in t if ch.isalpha() and ch.isascii())
        z = (-1.5 + 4.0 * sum(1 for x in ts if x in stop) / max(n_tok, 1)
             + 2.0 * alpha / max(len(t), 1)
             + 0.1 * sum(len(x) for x in ts) / max(n_tok, 1))
        by_src.setdefault(src, []).append(1.0 / (1.0 + math.exp(-z)))
    all_p = [p for ps in by_src.values() for p in ps]
    g = sum(all_p) / len(all_p)

    rows = SPECS["curation_source_prior"].fn(spark, SF_DIR_001).collect()
    assert {r["source"] for r in rows} == set(by_src)
    for r in rows:
        ps = by_src[r["source"]]
        n = len(ps)
        raw = sum(ps) / n
        shrunk = (sum(ps) + 25.0 * g) / (n + 25.0)
        keep = sum(1 for p in ps if p >= 0.7) / n
        assert r["n_docs"] == n
        assert abs(r["raw_avg_q"] - raw) <= 2e-6, (r["source"],
                                                   r["raw_avg_q"], raw)
        assert abs(r["shrunk_q"] - shrunk) <= 2e-6
        assert abs(r["keep_rate"] - keep) <= 2e-6
        # betweenness: shrunk is a convex combination of raw and g
        lo, hi = min(raw, g), max(raw, g)
        assert lo - 2e-6 <= r["shrunk_q"] <= hi + 2e-6


def test_basket_lift_matches_python(spark):
    """basket_lift_pairs' support/confidence/lift (identical formula
    SQL both engine sides) vs a pure-Python basket fold."""
    li = _pdf("lineitem")[["l_orderkey", "l_partkey"]]
    part = _pdf("part")[["p_partkey", "p_brand"]]
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    baskets: dict[int, set] = {}
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(ok), set()).add(brand[int(pk)])
    n_orders = len(baskets)
    sup: dict[str, int] = {}
    c_ab: dict[tuple[str, str], int] = {}
    for bs in baskets.values():
        for b_ in bs:
            sup[b_] = sup.get(b_, 0) + 1
        bl = sorted(bs)
        for i in range(len(bl)):
            for j in range(i + 1, len(bl)):
                c_ab[(bl[i], bl[j])] = c_ab.get((bl[i], bl[j]), 0) + 1
    want = {pair: (c, c / n_orders, c / sup[pair[0]],
                   c * n_orders / (sup[pair[0]] * sup[pair[1]]))
            for pair, c in c_ab.items() if c >= 50}

    rows = SPECS["basket_lift_pairs"].fn(spark, SF_DIR_001).collect()
    got = {(r["brand_a"], r["brand_b"]):
           (r["n_both"], r["support"], r["confidence"], r["lift"])
           for r in rows}
    assert set(got) == set(want), sorted(set(got) ^ set(want))[:4]
    for pair, (c, s, cf, lf) in want.items():
        gc, gs, gcf, glf = got[pair]
        assert gc == c
        assert abs(gs - s) <= 2e-6 and abs(gcf - cf) <= 2e-6 \
            and abs(glf - lf) <= 2e-6, (pair, got[pair], want[pair])


def test_cohort_retention_matches_python(spark):
    """cohort_retention's week-truncation + offset arithmetic vs a
    pure-Python Monday-of-week model over the raw events."""
    import datetime

    def monday(ts) -> datetime.date:
        d = ts.date() if hasattr(ts, "date") else ts
        return d - datetime.timedelta(days=d.weekday())

    e = _pdf("events")
    first_ts: dict[int, object] = {}
    for u, ts in zip(e["user_id"], e["ts"]):
        u = int(u)
        if u not in first_ts or ts < first_ts[u]:
            first_ts[u] = ts
    cohort = {u: monday(ts) for u, ts in first_ts.items()}
    seen = set()
    want: dict[tuple[str, int], int] = {}
    for u, ts in zip(e["user_id"], e["ts"]):
        u = int(u)
        off = (monday(ts) - cohort[u]).days // 7
        key = (u, off)
        if key in seen:
            continue
        seen.add(key)
        wk = (cohort[u].strftime("%Y-%m-%d"), off)
        want[wk] = want.get(wk, 0) + 1

    got = {(r["cohort_week"], r["week_offset"]): r["active_users"]
           for r in SPECS["cohort_retention"].fn(spark, SF_DIR_001)
           .collect()}
    assert got == want, sorted(set(got.items()) ^ set(want.items()))[:4]


def test_events_top_paths_matches_python(spark):
    """events_top_paths' per-user 3-step path mining vs a pure-Python
    sort-and-slide model with the identical engine-portable tie order
    (second-formatted ts, event_id)."""
    e = _pdf("events")
    by_user: dict[int, list] = {}
    for u, ts, eid, et in zip(e["user_id"], e["ts"], e["event_id"],
                              e["event_type"]):
        by_user.setdefault(int(u), []).append(
            (ts.strftime("%Y-%m-%d %H:%M:%S"), int(eid), et))
    counts: dict[str, int] = {}
    for seq in by_user.values():
        seq.sort()
        ets = [et for _, _, et in seq]
        for i in range(len(ets) - 2):
            p = f"{ets[i]}>{ets[i+1]}>{ets[i+2]}"
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [(r["path"], r["n"]) for r in
           SPECS["events_top_paths"].fn(spark, SF_DIR_001).collect()]
    assert got == want, (got, want)


def test_bpe_training_matches_python_trainer(spark):
    """text_bpe_train_merges' 6-round declarative induction vs the
    textbook Sennrich trainer in pure Python (word-frequency dict,
    sequential argmax with (count desc, pair asc) tie order) over the
    raw parquet text — the oracle twin runs the SAME unrolled SQL, so
    a mis-formulated induction could hash-match; this pins it against
    an independent implementation."""
    d = _pdf("documents")
    vocab: dict[str, int] = {}
    for t in d["text"]:
        for w in _py_tokens(t):
            if len(w) >= 2:
                vocab[w] = vocab.get(w, 0) + 1
    words = {tuple(w): c for w, c in vocab.items()}
    want = []
    for _ in range(6):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((a, b, n))
        new_words: dict[tuple, int] = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words

    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )
    try:
        rows = sorted(SPECS["text_bpe_train_merges"]
                      .fn(spark, SF_DIR_001).collect(),
                      key=lambda r: r["merge_rank"])
    finally:
        release_persisted()
    got = [(r["lhs"], r["rhs"], r["n_pairs"]) for r in rows]
    assert got == want, (got, want)


# --- r13: recall@k as a NUMBER for the lossy ANN scale paths ----------------
# (r12 VERDICT item 6: the in-query recall_ok booleans pin a threshold
# at ONE seed; these recompute recall against brute force across three
# seeds so a parameter regression shows up as a number dropping, not a
# boolean staying coincidentally true.  All inputs and seeds are fixed,
# so every recall below is DETERMINISTIC — the bounds are pins at the
# measured values, not statistical hopes.)

_ANN_SEEDS = (101, 202, 303)


def _emb_and_query(spark):
    from mapreduce_implementation_spark.sources.tables import load_table
    from tests.conftest import SF_DIR_01

    emb = load_table(spark, SF_DIR_01, "embeddings")
    qv = [float(x) for x in
          emb.filter("vec_id = 0").collect()[0]["embedding"]]
    return emb, qv


def test_ann_lsh_recall_at_10_across_seeds(spark):
    """Sign-LSH top-k recall@10 vs exact brute force at (bits=4,
    tables=16) — the similarity_ann_lsh defaults.  Measured 0.8 / 0.9
    / 1.0 at seeds 101/202/303 (mean 0.9, the docstring's Charikar
    target for moderate-similarity corpora)."""
    from mapreduce_implementation_spark.operators.similarity import (
        ann_topk_lsh, cosine_topk,
    )

    emb, qv = _emb_and_query(spark)
    exact = {r["vec_id"] for r in cosine_topk(
        emb, "vec_id", "embedding", qv, k=10, exclude_id=0).collect()}
    recalls = []
    for seed in _ANN_SEEDS:
        ann = {r["vec_id"] for r in ann_topk_lsh(
            emb, "vec_id", "embedding", qv, dim=64, k=10,
            seed=seed, exclude_id=0).collect()}
        recalls.append(len(ann & exact) / 10.0)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.9 and min(recalls) >= 0.8, (
        f"LSH recall@10 regressed: per-seed {recalls} (mean {mean:.2f}) "
        f"vs pinned mean>=0.9, min>=0.8 at seeds {_ANN_SEEDS}")


def test_ann_ivf_recall_at_10_across_seeds(spark):
    """IVF (k=8 lists, nprobe=4) top-k recall@10 vs brute force across
    three k-means init seeds.  Measured 0.6 / 0.9 / 0.6 (mean 0.7) —
    consistent with the registered query's documented 0.6-0.8 band and
    its >=5-of-10 audit floor."""
    from mapreduce_implementation_spark.operators.ivf import (
        ivf_topk, kmeans_fit,
    )
    from mapreduce_implementation_spark.operators.similarity import (
        cosine_topk,
    )

    emb, qv = _emb_and_query(spark)
    emb = emb.cache()
    try:
        exact = {r["vec_id"] for r in cosine_topk(
            emb, "vec_id", "embedding", qv, k=10, exclude_id=0).collect()}
        recalls = []
        for seed in _ANN_SEEDS:
            c = kmeans_fit(emb, "embedding", dim=64, k=8, iters=3,
                           seed=seed)
            ann = {r["vec_id"] for r in ivf_topk(
                emb, "vec_id", "embedding", qv, c, k=10, nprobe=4,
                exclude_id=0).collect()}
            recalls.append(len(ann & exact) / 10.0)
    finally:
        emb.unpersist()
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.7 and min(recalls) >= 0.5, (
        f"IVF recall@10 regressed: per-seed {recalls} (mean {mean:.2f}) "
        f"vs pinned mean>=0.7, min>=0.5 at seeds {_ANN_SEEDS}")


def test_embedding_lsh_dedup_pair_recall_across_seeds(spark):
    """Near-dup PAIR recall of the bucketed LSH path vs the exact
    all-pairs set at cos>=0.35, with (bits, tables) from
    sign_lsh_params — the dedup_embedding_lsh configuration.  Measured
    0.930 / 0.926 / 0.893 on the 271 true pairs (the query's in-query
    flag pins >=0.8 at one seed; this pins the number at three)."""
    from mapreduce_implementation_spark.operators.dedup import (
        embedding_near_dup_pairs, embedding_near_dup_pairs_lsh,
        sign_lsh_params,
    )

    emb, _ = _emb_and_query(spark)
    emb = emb.cache()
    try:
        brute = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(
            emb, "vec_id", "embedding", min_cosine=0.35).collect()}
        assert len(brute) > 100  # the audit has teeth
        bits, tables = sign_lsh_params(emb.count(), 0.35,
                                       target_bucket=50)
        recalls = []
        for seed in _ANN_SEEDS:
            lsh = {(r["a"], r["b"])
                   for r in embedding_near_dup_pairs_lsh(
                       emb, "vec_id", "embedding", dim=64,
                       min_cosine=0.35, bits=bits, tables=tables,
                       seed=seed).collect()}
            recalls.append(len(lsh & brute) / len(brute))
    finally:
        emb.unpersist()
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.9 and min(recalls) >= 0.85, (
        f"LSH pair recall regressed: per-seed "
        f"{[f'{r:.3f}' for r in recalls]} (mean {mean:.3f}) vs pinned "
        f"mean>=0.9, min>=0.85 at seeds {_ANN_SEEDS}, {len(brute)} pairs")


def test_pii_class_patterns_disjoint():
    """pii_scrub_multi's merged ladder (r14) classifies each combined-
    alternation match by anchored re-match against the class patterns —
    sound only if no class's full-match set intersects another's.
    Check every fixture shape plus the adversarial look-alikes
    (dot-separated phones vs IPv4, digit groups vs cards): each string
    must anchored-match EXACTLY the one class that produced it."""
    import re

    from mapreduce_implementation_spark.queries.curation import (
        _PII_CARD_RE, _PII_EMAIL_RE, _PII_IP_RE, _PII_IPV6_RE,
        _PII_PHONE_RE,
    )

    classes = {
        "email": _PII_EMAIL_RE,
        "phone": _PII_PHONE_RE,
        "ip": _PII_IP_RE,
        "ipv6": _PII_IPV6_RE,
        "card": _PII_CARD_RE,
    }
    cases = [
        ("alice42@Mail.Example.org", "email"),
        ("a.1-b_c%d+e@sub.domain-x.io", "email"),
        ("(555) 042-1042", "phone"),
        ("555.123.4567", "phone"),      # dot separators, NOT an IPv4
        ("555-123-4567", "phone"),
        ("10.42.38.90", "ip"),
        ("12.34.56.789", "ip"),         # 3-digit last octet, NOT a phone
        ("2001:db8:0042::1", "ipv6"),
        ("2001:db8:1:2:3:4", "ipv6"),
        ("4123 4567 8901 2345", "card"),
        ("4123-4567-8901-2345", "card"),
    ]
    for s, want in cases:
        got = [c for c, pat in classes.items()
               if re.fullmatch(f"(?:{pat})", s)]
        assert got == [want], (s, got, want)


def test_bootstrap_ci_matches_python(spark):
    """stats_bootstrap_ci vs a pure-Python Poisson-bootstrap fold:
    hashlib.md5-derived weights (independent of both engines' md5),
    exact integer replica sums, numpy linear-interp quantiles.  The
    oracle twin shares the md5/ladder formulation, so this is the
    third leg proving the STATISTIC, not just engine agreement."""
    import hashlib

    from mapreduce_implementation_spark.queries.curation import (
        _BOOT_REPLICAS, _POISSON_CDF_24BIT)

    # the ladder itself vs math.exp-computed Poisson(1) CDF
    lam_cdf, p = [], math.exp(-1.0)
    c = 0.0
    for k in range(8):
        c += p
        lam_cdf.append(math.floor(c * 2**24))
        p /= (k + 1)
    assert tuple(lam_cdf) == _POISSON_CDF_24BIT

    docs = _pdf("documents")
    reps: dict[str, list[float]] = {}
    base: dict[str, list[int]] = {}
    for src, grp in docs.groupby("source"):
        base[src] = grp["n_chars"].tolist()
        means = []
        for r in range(_BOOT_REPLICAS):
            wn = wx = 0
            for did, x in zip(grp["doc_id"], grp["n_chars"]):
                b = int(hashlib.md5(f"{did}:{r}".encode()).hexdigest()[:6],
                        16)
                w = 8
                for k, t in enumerate(_POISSON_CDF_24BIT):
                    if b < t:
                        w = k
                        break
                wn += w
                wx += w * int(x)
            if wn > 0:
                means.append(round(wx / wn, 6))
        reps[src] = means

    out = {r["source"]: r for r in
           SPECS["stats_bootstrap_ci"].fn(spark, SF_DIR_001).collect()}
    assert set(out) == set(reps)
    for src, means in reps.items():
        row = out[src]
        assert row["n_docs"] == len(base[src])
        assert row["n_replicas"] == len(means)
        assert math.isclose(row["mean_chars"],
                            sum(base[src]) / len(base[src]), abs_tol=1e-5)
        lo, hi = np.percentile(means, [2.5, 97.5])
        assert math.isclose(row["ci_lo"], lo, abs_tol=1e-5), (src, row, lo)
        assert math.isclose(row["ci_hi"], hi, abs_tol=1e-5), (src, row, hi)
        assert math.isclose(row["se_boot"], np.std(means, ddof=1),
                            abs_tol=1e-5)
        # the interval is a real interval around the point estimate
        assert row["ci_lo"] <= row["ci_hi"]
        assert row["ci_lo"] <= row["mean_chars"] <= row["ci_hi"], src


def test_ndcg_matches_python(spark):
    """retrieval_eval_ndcg vs a numpy brute-force re-rank + textbook
    metric formulas (Jarvelin & Kekalainen nDCG, MRR, P@10) — the
    independent leg for the eval-metric math, since Spark and the
    oracle share the precomputed-discount formulation."""
    emb = _pdf("embeddings")
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    norms = np.linalg.norm(V, axis=1)

    out = {r["qid"]: r for r in
           SPECS["retrieval_eval_ndcg"].fn(spark, SF_DIR_001).collect()}
    qids = [int(i) for i in ids if i % 25 == 0]
    assert set(out) == set(qids)
    for qid in qids:
        qi = int(np.where(ids == qid)[0][0])
        ql = labels[qi]
        cos = V @ V[qi] / (norms * norms[qi])
        cand = [(round(float(cos[j]), 6), int(ids[j]), labels[j] == ql)
                for j in range(len(ids)) if ids[j] != qid]
        cand.sort(key=lambda t: (-t[0], t[1]))
        top = cand[:10]
        rel_flags = [c[2] for c in top]
        dcg = sum(1.0 / math.log2(i + 2)
                  for i, f in enumerate(rel_flags) if f)
        n_rel = int((labels == ql).sum()) - 1
        idcg = sum(1.0 / math.log2(i + 2) for i in range(min(10, n_rel)))
        row = out[qid]
        assert row["n_rel"] == n_rel
        assert row["rel_in_10"] == sum(rel_flags)
        assert math.isclose(row["p_at_10"], sum(rel_flags) / 10.0,
                            abs_tol=1e-6)
        first = next((i + 1 for i, f in enumerate(rel_flags) if f), None)
        assert math.isclose(row["mrr_at_10"],
                            0.0 if first is None else 1.0 / first,
                            abs_tol=1e-6)
        assert math.isclose(row["ndcg_at_10"],
                            0.0 if idcg == 0 else dcg / idcg,
                            abs_tol=1e-5), (qid, row["ndcg_at_10"], dcg, idcg)


def test_psi_drift_matches_python(spark):
    """stats_psi_drift vs a numpy re-derivation: decile edges from
    numpy.percentile (linear interp == percentile/quantile_cont),
    binning and smoothed PSI in pure Python over pyarrow-read orders."""
    from mapreduce_implementation_spark.queries.relational import (
        _PSI_QS, _PSI_REF_YEAR)

    o = _pdf("orders")
    years = o["o_orderdate"].dt.year
    x = o["o_totalprice"].to_numpy(dtype=float)
    ref = x[years == _PSI_REF_YEAR]
    bounds = [round(float(b), 2)
              for b in np.percentile(ref, [100 * q for q in _PSI_QS])]

    def bin_of(v):
        return 1 + sum(1 for b in bounds if v > b)

    ref_c = [0] * 10
    for v in ref:
        ref_c[bin_of(v) - 1] += 1
    n_ref = len(ref)

    out = {r["year"]: r for r in
           SPECS["stats_psi_drift"].fn(spark, SF_DIR_001).collect()}
    expect_years = sorted(set(int(y) for y in years if y > _PSI_REF_YEAR))
    assert sorted(out) == expect_years
    for y in expect_years:
        cur = x[years == y]
        c = [0] * 10
        for v in cur:
            c[bin_of(v) - 1] += 1
        n_y = len(cur)
        psi = sum((p - q) * math.log(p / q)
                  for p, q in (((ci + 0.5) / (n_y + 5.0),
                                (ri + 0.5) / (n_ref + 5.0))
                               for ci, ri in zip(c, ref_c)))
        row = out[y]
        assert row["n_orders"] == n_y
        assert math.isclose(row["psi"], psi, abs_tol=1e-5), (y, row, psi)
        assert row["psi"] >= 0 or abs(row["psi"]) < 1e-3
