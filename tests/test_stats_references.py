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
    BLAS-partial covariance + 5 power iterations reproduce the SAME
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
