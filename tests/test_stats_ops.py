"""Differential tests for plans.stats_ops: brute-force Python
recomputation of each statistic from the raw sf0.001 parquet, compared
against the registered distributed query — independent of the DuckDB
oracle (which the sweep covers), so a shared SQL-formulation mistake
cannot pass both gates.
"""

from __future__ import annotations

import collections
import math

import pyarrow.parquet as pq
import pytest

from amazon_sales_data_engineering_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders_pd():
    return pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()


def _two_sample(orders_pd):
    a = sorted(
        float(p)
        for p in orders_pd.loc[
            orders_pd.o_orderpriority == "1-URGENT", "o_totalprice"
        ]
    )
    b = sorted(
        float(p)
        for p in orders_pd.loc[
            orders_pd.o_orderpriority == "5-LOW", "o_totalprice"
        ]
    )
    return a, b


def test_ks_matches_bruteforce(spark, orders_pd):
    a, b = _two_sample(orders_pd)
    n_a, n_b = len(a), len(b)
    values = sorted(set(a) | set(b))
    ca = cb = ia = ib = 0
    d_num = 0
    for v in values:
        while ia < n_a and a[ia] <= v:
            ia += 1
        while ib < n_b and b[ib] <= v:
            ib += 1
        d_num = max(d_num, abs(ia * n_b - ib * n_a))
        ca, cb = ia, ib
    row = REGISTRY["stats_ks_two_sample"].spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_a"], r["n_b"], r["d_num"]) == (n_a, n_b, d_num)
    assert r["ks_d"] == d_num / (n_a * n_b)


def test_mwu_matches_bruteforce_and_identity(spark, orders_pd):
    a, b = _two_sample(orders_pd)
    n_a, n_b = len(a), len(b)
    cnt_b = collections.Counter(b)
    # U2_a = sum over a-values of (2 * #b strictly less + #b tied)
    b_sorted = sorted(cnt_b)
    u2_a = 0
    for x in a:
        less = sum(c for v, c in cnt_b.items() if v < x)
        u2_a += 2 * less + cnt_b.get(x, 0)
    row = REGISTRY["stats_mannwhitney_u"].spark_fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    assert r["u2_a"] == u2_a
    assert r["u2_a"] + r["u2_b"] == 2 * n_a * n_b
    del b_sorted


def test_kaplan_meier_matches_bruteforce(spark, orders_pd):
    df = orders_pd[["o_custkey", "o_orderdate"]].copy()
    df["d"] = df["o_orderdate"].astype("datetime64[ns]").dt.date
    maxd = df["d"].max()
    durs = []
    for _cust, g in df.groupby("o_custkey"):
        ds = sorted(g["d"])
        fd = ds[0]
        nxt = next((x for x in ds if x > fd), None)
        if nxt is None:
            durs.append(((maxd - fd).days, 0))
        else:
            durs.append(((nxt - fd).days, 1))
    n = len(durs)
    km = collections.defaultdict(lambda: [0, 0])
    for dur, ev in durs:
        km[dur][0] += ev
        km[dur][1] += 1 - ev
    expected = {}
    at_risk = n
    surv = 1.0
    for t in sorted(km):
        d_ev, c_cen = km[t]
        surv = surv * ((at_risk - d_ev) / at_risk)
        expected[t] = (at_risk, d_ev, c_cen, surv)
        at_risk -= d_ev + c_cen
    rows = REGISTRY["survival_kaplan_meier"].spark_fn(spark, SF_DIR).collect()
    got = {
        r["dur"]: (r["n_risk"], r["d_events"], r["c_censored"], r["survival"])
        for r in rows
    }
    assert set(got) == set(expected)
    for t, (nr, d_ev, c_cen, s) in expected.items():
        gnr, gd, gc, gs = got[t]
        assert (gnr, gd, gc) == (nr, d_ev, c_cen), t
        # same left-fold association order -> bit-identical product
        assert gs == pytest.approx(s, abs=0, rel=1e-12), t
        assert 0.0 <= gs <= 1.0
    # survival is non-increasing over time
    times = sorted(got)
    for t0, t1 in zip(times, times[1:]):
        assert got[t1][3] <= got[t0][3] + 1e-15
    assert not math.isnan(rows[0]["survival"])


def test_ols_matches_numpy(spark):
    import numpy as np

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount",
                 "l_extendedprice"],
    ).to_pandas()
    rows = REGISTRY["regression_ols_normal_eq"].spark_fn(
        spark, SF_DIR
    ).collect()
    assert {r["returnflag"] for r in rows} == set(li.l_returnflag.unique())
    for r in rows:
        g = li[li.l_returnflag == r["returnflag"]]
        x1 = g.l_quantity.round().astype("int64").to_numpy()
        x2 = (g.l_discount * 100).round().astype("int64").to_numpy()
        y = (g.l_extendedprice * 100).round().astype("int64").to_numpy()
        X = np.column_stack([np.ones_like(x1), x1, x2]).astype(float)
        beta, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
        assert r["n_rows"] == len(g)
        assert r["intercept_cents"] == pytest.approx(beta[0], rel=1e-6)
        assert r["beta_qty_cents"] == pytest.approx(beta[1], rel=1e-6)
        assert r["beta_disc_cents"] == pytest.approx(beta[2], rel=1e-6)


def test_poisson_bootstrap_weights_reproducible(spark, orders_pd):
    from amazon_sales_data_engineering_spark.plans.stats_ops import (
        _N_REPS,
        _POISSON_T,
    )

    keys = orders_pd.o_orderkey.astype("int64").tolist()
    cents = (
        (orders_pd.o_totalprice * 100).round().astype("int64").tolist()
    )

    def weight(okey: int, rep: int) -> int:
        u = ((((okey % 2147483648) + rep * 1315423911) % 2147483648)
             * 2654435761) % 4294967296
        for k, thr in enumerate(_POISSON_T):
            if u < thr:
                return k
        return 9

    expected = {}
    for rep in (1, 7, _N_REPS):
        ws = [weight(k, rep) for k in keys]
        n_eff = sum(ws)
        wsum = sum(w * c for w, c in zip(ws, cents))
        expected[rep] = (n_eff, wsum, wsum / n_eff)

    rows = REGISTRY["stats_poisson_bootstrap"].spark_fn(
        spark, SF_DIR
    ).collect()
    assert len(rows) == _N_REPS
    got = {r["rep"]: (r["n_eff"], r["wsum_cents"], r["est_cents"])
           for r in rows}
    for rep, (n_eff, wsum, est) in expected.items():
        assert got[rep][0] == n_eff, rep
        assert got[rep][1] == wsum, rep
        assert got[rep][2] == est, rep
    # replicate means bracket the plain mean (sanity, not a tight CI)
    plain = sum(cents) / len(cents)
    ests = sorted(v[2] for v in got.values())
    assert ests[0] < plain < ests[-1]


def test_permutation_test_reproducible(spark, orders_pd):
    from amazon_sales_data_engineering_spark.plans.stats_ops import (
        _GRP_A,
        _GRP_B,
        _PERM_REPS,
    )

    sub = orders_pd[orders_pd.o_orderpriority.isin([_GRP_A, _GRP_B])]
    keys = sub.o_orderkey.astype("int64").tolist()
    cents = (sub.o_totalprice * 100).round().astype("int64").tolist()
    is_a = (sub.o_orderpriority == _GRP_A).tolist()
    n_a = sum(is_a)
    n_b = len(is_a) - n_a
    s_a = sum(c for c, a in zip(cents, is_a) if a)
    s_b = sum(c for c, a in zip(cents, is_a) if not a)
    t_obs = s_a / n_a - s_b / n_b
    thr = (n_a * 4294967296) // (n_a + n_b)

    def u32(okey: int, rep: int) -> int:
        return ((((okey % 2147483648) + rep * 2654435761) % 2147483648)
                * 2246822519) % 4294967296

    p_num = 0
    for rep in range(1, _PERM_REPS + 1):
        sa_p = sb_p = na_p = nb_p = 0
        for k, c in zip(keys, cents):
            if u32(k, rep) < thr:
                na_p += 1
                sa_p += c
            else:
                nb_p += 1
                sb_p += c
        t_p = sa_p / na_p - sb_p / nb_p
        if abs(t_p) >= abs(t_obs):
            p_num += 1

    rows = REGISTRY["stats_permutation_test"].spark_fn(
        spark, SF_DIR
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_a"], r["n_b"], r["n_reps"]) == (n_a, n_b, _PERM_REPS)
    assert r["t_obs"] == t_obs
    assert r["p_num"] == p_num
    assert r["p_value"] == p_num / _PERM_REPS
    # the null is true by construction only under exchangeability of the
    # two priority groups; either way the p-value is a valid fraction
    assert 0.0 <= r["p_value"] <= 1.0


def test_stl_identity_and_weekday_means(spark):
    rows = REGISTRY["events_stl_decompose"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # decomposition identity: c == trend + seasonal + residual
        assert r["c"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], rel=1e-12
        )
    # per-weekday seasonal is constant
    by_wd = collections.defaultdict(set)
    for r in rows:
        by_wd[r["d"].isoweekday()].add(r["seasonal"])
    for wd, vals in by_wd.items():
        assert len(vals) == 1, wd
    # seasonal components of a full-week mean sum to ~0 (weighted by
    # per-weekday counts they sum to exactly 0; unweighted is close)
    total = sum(v for s in by_wd.values() for v in s)
    assert abs(total) < max(abs(r["c"]) for r in rows)


def test_conformal_coverage_near_nominal(spark):
    rows = REGISTRY["conformal_split_coverage"].spark_fn(
        spark, SF_DIR
    ).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        assert r["n_calib"] > 0 and r["n_test"] > 0
        assert r["covered"] <= r["n_test"]
        assert r["coverage"] == r["covered"] / r["n_test"]
        # split-conformal guarantee: coverage ~ 0.9 (finite-sample slack
        # at sf0.001's ~300 rows/priority is generous)
        assert 0.80 <= r["coverage"] <= 0.98, r


def test_acf_matches_bruteforce(spark):
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"]).to_pandas()
    daily = collections.Counter(ev.ts.dt.date)
    dates = sorted(daily)
    n = len(dates)
    s = sum(daily.values())
    u = {d: n * daily[d] - s for d in dates}
    den = sum(v * v for v in u.values())
    import datetime

    expected = {}
    for lag in range(1, 15):
        num = 0
        pairs = 0
        for d in dates:
            d2 = d + datetime.timedelta(days=lag)
            if d2 in u:
                num += u[d] * u[d2]
                pairs += 1
        expected[lag] = (pairs, num / den)
    rows = REGISTRY["events_acf_lags"].spark_fn(spark, SF_DIR).collect()
    got = {r["lag"]: (r["n_pairs"], r["acf"]) for r in rows}
    assert set(got) == set(expected)
    for lag, (pairs, acf) in expected.items():
        assert got[lag][0] == pairs, lag
        assert got[lag][1] == pytest.approx(acf, rel=1e-12), lag
        assert -1.0 <= got[lag][1] <= 1.0


def test_anova_matches_bruteforce(spark, orders_pd):
    cents = (orders_pd.o_totalprice * 100).round().astype("int64")
    groups = {
        g: cents[orders_pd.o_orderpriority == g].tolist()
        for g in orders_pd.o_orderpriority.unique()
    }
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    ssq = sum(y * y for v in groups.values() for y in v)
    sum_sg2n = sum(
        sum(v) ** 2 / len(v) for _g, v in sorted(groups.items())
    )
    ssb = sum_sg2n - s * s / n
    ssw = ssq - sum_sg2n
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    rows = REGISTRY["stats_anova_oneway"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["n"]) == (k, n)
    assert r["ssb"] == pytest.approx(ssb, rel=1e-9)
    assert r["ssw"] == pytest.approx(ssw, rel=1e-9)
    assert r["f_stat"] == pytest.approx(f_stat, rel=1e-9)
    assert r["f_stat"] >= 0.0


def test_mase_matches_bruteforce(spark, orders_pd):
    cents = (orders_pd.o_totalprice * 100).round().astype("int64")
    dt = orders_pd.o_orderdate.astype("datetime64[ns]")
    mk = dt.dt.year * 12 + dt.dt.month - 1
    monthly = (
        cents.groupby(mk).sum().sort_index()
    )
    diffs = [
        abs(monthly[k] - monthly[k - 1])
        for k in monthly.index
        if k - 1 in monthly.index
    ]
    evals = {
        k: (monthly[k], monthly[k - 12], abs(monthly[k] - monthly[k - 12]))
        for k in monthly.index
        if k - 12 in monthly.index
    }
    sae = sum(v[2] for v in evals.values())
    mase = (sae / len(evals)) / (sum(diffs) / len(diffs))
    rows = REGISTRY["forecast_backtest_mase"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == len(evals)
    for r in rows:
        k = r["yr"] * 12 + r["mo"] - 1
        act, fc, err = evals[k]
        assert (r["actual_cents"], r["forecast_cents"],
                r["abs_err_cents"]) == (act, fc, err)
        assert r["mase"] == mase


def test_stratified_ate_matches_bruteforce(spark):
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_discount", "l_returnflag"],
    ).to_pandas()
    part = pq.read_table(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    m["tr"] = (m.l_discount >= 0.05).astype(int)
    m["y"] = (m.l_returnflag == "R").astype(int)
    strata = {}
    for brand, g in m.groupby("p_brand"):
        n_t = int(g.tr.sum())
        n_c = len(g) - n_t
        if n_t == 0 or n_c == 0:
            continue
        y1_t = int((g.tr * g.y).sum())
        y1_c = int(((1 - g.tr) * g.y).sum())
        strata[brand] = (len(g), n_t, n_c, y1_t, y1_c,
                         y1_t / n_t - y1_c / n_c)
    n_tot = sum(v[0] for v in strata.values())
    ate = 0.0
    for brand in sorted(strata):
        v = strata[brand]
        ate = ate + (v[0] / n_tot) * v[5]
    rows = REGISTRY["causal_stratified_ate"].spark_fn(spark, SF_DIR).collect()
    assert {r["brand"] for r in rows} == set(strata)
    for r in rows:
        v = strata[r["brand"]]
        assert (r["n_s"], r["n_t"], r["n_c"], r["y1_t"], r["y1_c"]) == v[:5]
        assert r["effect"] == v[5]
        assert r["ate"] == ate


def test_cuped_matches_bruteforce(spark, orders_pd):
    cents = (orders_pd.o_totalprice * 100).round().astype("int64")
    yr = orders_pd.o_orderdate.astype("datetime64[ns]").dt.year
    df = orders_pd.assign(cents=cents, yr=yr)
    per = df.groupby("o_custkey").apply(
        lambda g: (
            int(g.loc[g.yr < 1997, "cents"].sum()),
            int(g.loc[g.yr >= 1997, "cents"].sum()),
        ),
        include_groups=False,
    )
    xs = [v[0] for v in per]
    ys = [v[1] for v in per]
    n = len(per)
    sx, sy = sum(xs), sum(ys)
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    syy = float(sum(y * y for y in ys))
    cov_n = n * sxy - float(sx) * sy
    varx_n = n * sxx - float(sx) * sx
    vary_n = n * syy - float(sy) * sy
    rows = REGISTRY["stats_cuped_adjustment"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == n
    assert r["theta"] == pytest.approx(cov_n / varx_n, rel=1e-12)
    assert r["var_reduction"] == pytest.approx(
        (cov_n * cov_n) / (varx_n * vary_n), rel=1e-12
    )
    assert 0.0 <= r["var_reduction"] <= 1.0  # it's a squared correlation


def test_kappa_matches_bruteforce(spark):
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text", "n_chars"]
    ).to_pandas()
    r1 = (docs.n_chars >= 200).astype(int)
    r2 = docs.text.str.split(" ").str.len().ge(40).astype(int)
    n = len(docs)
    n11 = int(((r1 == 1) & (r2 == 1)).sum())
    n10 = int(((r1 == 1) & (r2 == 0)).sum())
    n01 = int(((r1 == 0) & (r2 == 1)).sum())
    n00 = int(((r1 == 0) & (r2 == 0)).sum())
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    rows = REGISTRY["stats_cohens_kappa"].spark_fn(spark, SF_DIR).collect()
    r = rows[0]
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        n, n11, n10, n01, n00,
    )
    assert r["kappa"] == pytest.approx(kappa, rel=1e-12)
    assert -1.0 <= r["kappa"] <= 1.0


def test_spearman_matches_bruteforce(spark):
    import pandas as pd

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    ).to_pandas()
    x = li.l_quantity.astype("int64")
    y = (
        (li.l_extendedprice.map(lambda v: __import__("decimal").Decimal(repr(v)))
         * 100)
        .map(int)
        .astype("int64")
    )
    rx, ry = x.rank(method="average"), y.rank(method="average")
    n = len(x)
    sxy = float(((rx - rx.mean()) * (ry - ry.mean())).sum())
    sxx = float(((rx - rx.mean()) ** 2).sum())
    syy = float(((ry - ry.mean()) ** 2).sum())
    expected = sxy / math.sqrt(sxx * syy)
    r = REGISTRY["stats_spearman_rho"].spark_fn(spark, SF_DIR).collect()[0]
    assert r["n"] == n
    # doubled mid-ranks sum to n*(n+1) exactly — the rank-map identity
    assert r["srx"] == n * (n + 1)
    assert r["sry"] == n * (n + 1)
    assert math.isclose(r["rho"], expected, rel_tol=1e-9)


def test_wasserstein_matches_bruteforce(spark, orders_pd):
    import decimal

    cents = orders_pd.o_totalprice.map(
        lambda v: int(decimal.Decimal(repr(v)) * 100)
    )
    a = sorted(cents[orders_pd.o_orderpriority == "1-URGENT"])
    b = sorted(cents[orders_pd.o_orderpriority == "5-LOW"])
    n_a, n_b = len(a), len(b)
    values = sorted(set(a) | set(b))
    ia = ib = 0
    num = 0
    for v, nxt in zip(values, values[1:]):
        while ia < n_a and a[ia] <= v:
            ia += 1
        while ib < n_b and b[ib] <= v:
            ib += 1
        num += abs(ia * n_b - ib * n_a) * (nxt - v)
    expected = num / (n_a * n_b) / 100.0
    r = REGISTRY["stats_wasserstein_drift"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n_a"], r["n_b"], r["d_levels"]) == (n_a, n_b, len(values) - 1)
    assert math.isclose(r["w1"], expected, rel_tol=1e-12)


def test_levene_brownforsythe_matches_bruteforce(spark, orders_pd):
    import decimal

    df = orders_pd.assign(
        y=orders_pd.o_totalprice.map(
            lambda v: int(decimal.Decimal(repr(v)) * 100)
        )
    )
    groups = {}
    for g, sub in df.groupby("o_orderstatus"):
        ys = sorted(sub.y)
        med = ys[math.ceil(0.5 * len(ys)) - 1]  # percentile_disc element
        groups[g] = [abs(v - med) for v in sub.y]
    k = len(groups)
    n = sum(len(z) for z in groups.values())
    zbar = sum(sum(z) for z in groups.values()) / n
    ssb = sum(
        len(z) * (sum(z) / len(z) - zbar) ** 2 for z in groups.values()
    )
    ssw = sum(
        sum((v - sum(z) / len(z)) ** 2 for v in z) for z in groups.values()
    )
    expected = (ssb / (k - 1)) / (ssw / (n - k))
    r = (
        REGISTRY["stats_levene_brownforsythe"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert (r["k"], r["n"]) == (k, n)
    assert math.isclose(r["w_stat"], expected, rel_tol=1e-9)


def test_assortativity_matches_bruteforce(spark):
    import itertools

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(set)
    und = set()
    for parts in baskets:
        for a, b in itertools.combinations(sorted(parts), 2):
            und.add((a, b))
    ed = [(u, v) for u, v in und] + [(v, u) for u, v in und]
    deg = collections.Counter(s for s, _ in ed)
    xs = [deg[s] for s, _ in ed]
    ys = [deg[d] for _, d in ed]
    m = len(ed)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    expected = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    r = (
        REGISTRY["graph_degree_assortativity"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert (r["m"], r["n_nodes"]) == (m, len(deg))
    assert math.isclose(r["assortativity"], expected, rel_tol=1e-9)


def test_mcnemar_matches_composed_filters(spark):
    """2x2 cells recomputed in Python from the two registered filters'
    own (gate-pinned) outputs — independent of the nested oracle."""
    g = {
        r.doc_id: int(r.keep)
        for r in REGISTRY["corpus_gopher_rules"]
        .spark_fn(spark, SF_DIR)
        .select("doc_id", "keep")
        .collect()
    }
    c = {
        r.doc_id: int(r.above_mean)
        for r in REGISTRY["quality_classifier_logodds"]
        .spark_fn(spark, SF_DIR)
        .select("doc_id", "above_mean")
        .collect()
    }
    common = set(g) & set(c)
    n11 = sum(1 for d in common if g[d] and c[d])
    n10 = sum(1 for d in common if g[d] and not c[d])
    n01 = sum(1 for d in common if not g[d] and c[d])
    n00 = sum(1 for d in common if not g[d] and not c[d])
    r = REGISTRY["stats_mcnemar_filters"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        len(common), n11, n10, n01, n00,
    )
    if n10 + n01:
        assert math.isclose(
            r["mcnemar_chi2"], (n10 - n01) ** 2 / (n10 + n01), rel_tol=1e-12
        )
    else:
        assert r["mcnemar_chi2"] is None


def test_mood_median_matches_bruteforce(spark, orders_pd):
    import decimal

    df = orders_pd.assign(
        y=orders_pd.o_totalprice.map(
            lambda v: int(decimal.Decimal(repr(v)) * 100)
        )
    )
    ys = sorted(df.y)
    med = ys[math.ceil(0.5 * len(ys)) - 1]
    grp = {}
    for g, sub in df.groupby("o_orderpriority"):
        above = int((sub.y > med).sum())
        grp[g] = (above, len(sub) - above)
    ta = sum(a for a, _ in grp.values())
    tb = sum(b for _, b in grp.values())
    n = ta + tb
    rows = (
        REGISTRY["stats_mood_median_test"].spark_fn(spark, SF_DIR).collect()
    )
    assert sorted(r.g for r in rows) == sorted(grp)
    for r in rows:
        a, b = grp[r.g]
        assert (r.n_above, r.n_below) == (a, b)
        ea = (a + b) * ta / n
        eb = (a + b) * tb / n
        assert math.isclose(r.expected_above, ea, rel_tol=1e-12)
        assert math.isclose(
            r.chi2_term,
            (a - ea) ** 2 / ea + (b - eb) ** 2 / eb,
            rel_tol=1e-9,
        )


def test_runs_test_matches_bruteforce(spark, orders_pd):
    import decimal

    df = orders_pd.assign(
        d=orders_pd.o_orderdate.dt.normalize(),
        c=orders_pd.o_totalprice.map(
            lambda v: int(decimal.Decimal(repr(v)) * 100)
        ),
    )
    daily = df.groupby("d")["c"].sum().sort_index()
    vals = sorted(daily)
    med = vals[math.ceil(0.5 * len(vals)) - 1]
    seq = [1 if v > med else 0 for v in daily if v != med]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    n = n1 + n2
    mu = 1 + 2 * n1 * n2 / n
    var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    r = REGISTRY["stats_runs_test_daily"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n1"], r["n2"], r["runs"]) == (n1, n2, runs)
    assert math.isclose(r["mu"], mu, rel_tol=1e-12)
    assert math.isclose(r["z"], (runs - mu) / math.sqrt(var), rel_tol=1e-9)


def test_bullwhip_matches_bruteforce(spark, orders_pd):
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate"]
    ).to_pandas()
    om = orders_pd.o_orderdate.dt.to_period("M").value_counts()
    sm = li.l_shipdate.dt.to_period("M").value_counts()

    def cv2(counts):
        n = len(counts)
        s = int(counts.sum())
        ss = int((counts.astype("int64") ** 2).sum())
        return (n * ss - s * s) / (s * s)

    r = (
        REGISTRY["supply_bullwhip_ratio"].spark_fn(spark, SF_DIR).collect()[0]
    )
    assert (r["n_months_orders"], r["n_months_ship"]) == (len(om), len(sm))
    assert math.isclose(r["cv2_orders"], cv2(om), rel_tol=1e-9)
    assert math.isclose(r["cv2_ship"], cv2(sm), rel_tol=1e-9)
    assert math.isclose(r["bullwhip"], cv2(om) / cv2(sm), rel_tol=1e-9)


def test_kendall_tau_b_matches_bruteforce(spark, orders_pd):
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).to_pandas()
    pri = dict(
        zip(orders_pd.o_orderkey, orders_pd.o_orderpriority.str[0].astype(int))
    )
    pts = [
        (int(q), pri[k]) for k, q in zip(li.l_orderkey, li.l_quantity)
    ]
    cells = collections.Counter(pts)
    items = list(cells.items())
    C = D = 0
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items:
            if xb > xa:
                if yb > ya:
                    C += ca * cb
                elif yb < ya:
                    D += ca * cb
    n = len(pts)
    rx = collections.Counter(x for x, _ in pts)
    cy = collections.Counter(y for _, y in pts)
    tx2 = sum(v * (v - 1) for v in rx.values())
    ty2 = sum(v * (v - 1) for v in cy.values())
    expected = (C - D) / (
        math.sqrt(n * (n - 1) - tx2) * math.sqrt(n * (n - 1) - ty2)
    )
    r = REGISTRY["stats_kendall_tau_b"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n"], r["c_pairs"], r["d_pairs"]) == (n, C, D)
    assert math.isclose(r["tau_b"], expected, rel_tol=1e-9)


def test_randomized_response_matches_bruteforce(spark):
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pylist()
    n = len(docs)
    n_true = n_rep = 0
    for r in docs:
        truth = 1 if r["lang"] == "en" else 0
        u32 = (
            ((r["doc_id"] % 2147483648) + 374761393) % 2147483648
            * 3266489917
        ) % 4294967296
        keep = 1 if u32 % 4 < 3 else 0
        n_true += truth
        n_rep += truth if keep else 1 - truth
    row = (
        REGISTRY["privacy_randomized_response"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert (row["n"], row["n_true"], row["n_reported"]) == (n, n_true, n_rep)
    assert row["est_pi"] == (4 * n_rep - n) / (2 * n)
    assert row["true_pi"] == n_true / n
    # the debiased estimator should land near the truth even at n=500
    assert abs(row["est_pi"] - row["true_pi"]) < 0.15


def test_cramers_v_matches_bruteforce(spark, orders_pd):
    cells = collections.Counter(
        zip(orders_pd.o_orderstatus, orders_pd.o_orderpriority)
    )
    rt = collections.Counter()
    ct = collections.Counter()
    for (s, p), o in cells.items():
        rt[s] += o
        ct[p] += o
    n = sum(cells.values())
    chi2 = 0.0
    for (s, p) in sorted(cells):
        e = rt[s] * ct[p] / n
        chi2 += (cells[(s, p)] - e) ** 2 / e
    expected = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    r = REGISTRY["stats_cramers_v"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n"], r["n_rows"], r["n_cols"]) == (n, len(rt), len(ct))
    assert math.isclose(r["chi2"], chi2, rel_tol=1e-9)
    assert math.isclose(r["cramers_v"], expected, rel_tol=1e-9)


def test_cohens_d_matches_bruteforce(spark, orders_pd):
    import decimal

    cents = orders_pd.o_totalprice.map(
        lambda v: int(decimal.Decimal(repr(v)) * 100)
    )
    a = [c for c, p in zip(cents, orders_pd.o_orderpriority) if p == "1-URGENT"]
    b = [c for c, p in zip(cents, orders_pd.o_orderpriority) if p == "5-LOW"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssa = sum(v * v for v in a) - sum(a) ** 2 / na
    ssb = sum(v * v for v in b) - sum(b) ** 2 / nb
    pooled = (ssa + ssb) / (na + nb - 2)
    r = REGISTRY["stats_cohens_d"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert math.isclose(r["mean_diff"], (ma - mb) / 100.0, rel_tol=1e-9)
    assert math.isclose(
        r["cohens_d"], (ma - mb) / math.sqrt(pooled), rel_tol=1e-9
    )


def test_peak_over_threshold_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["ts"]
    ).to_pandas()
    hourly = ev.ts.dt.floor("h").value_counts()
    counts = sorted(int(c) for c in hourly)
    u = counts[math.ceil(0.9 * len(counts)) - 1]
    exc = [c - u for c in counts if c > u]
    r = (
        REGISTRY["events_peak_over_threshold"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert (r["n_hours"], r["threshold"], r["n_exceedances"]) == (
        len(counts), u, len(exc),
    )
    assert r["max_excess"] == max(exc)
    assert math.isclose(r["mean_excess"], sum(exc) / len(exc), rel_tol=1e-12)


def test_welch_ttest_matches_bruteforce(spark, orders_pd):
    cents = lambda xs: [round(x * 100) for x in xs]  # noqa: E731
    a_f, b_f = _two_sample(orders_pd)
    a, b = cents(a_f), cents(b_f)
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ua = ((sum(v * v for v in a) - sum(a) * ma) / (na - 1)) / na
    ub = ((sum(v * v for v in b) - sum(b) * mb) / (nb - 1)) / nb
    t_w = (ma - mb) / math.sqrt(ua + ub)
    df_w = ((ua + ub) * (ua + ub)) / (
        ua * ua / (na - 1) + ub * ub / (nb - 1)
    )
    r = REGISTRY["stats_welch_ttest"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert math.isclose(r["mean_a"], ma, rel_tol=1e-12)
    assert math.isclose(r["mean_b"], mb, rel_tol=1e-12)
    assert math.isclose(r["t_welch"], t_w, rel_tol=1e-9)
    assert math.isclose(r["df_welch"], df_w, rel_tol=1e-9)


def test_benjamini_hochberg_matches_bruteforce(spark, orders_pd):
    import pyarrow.parquet as pq2

    cust = pq2.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nat = dict(zip(cust.c_custkey, cust.c_nationkey))
    rows = [
        (int(k), round(float(p) * 100), nat[ck])
        for k, ck, p in zip(
            orders_pd.o_orderkey, orders_pd.o_custkey, orders_pd.o_totalprice
        )
    ]
    R = 128
    from collections import defaultdict

    n_g, s_g = defaultdict(int), defaultdict(int)
    for _, cents, g in rows:
        n_g[g] += 1
        s_g[g] += cents
    gs = sorted(n_g)
    N, S, m = sum(n_g.values()), sum(s_g.values()), len(gs)
    cum, bnds = 0, []
    for g in gs:
        cum += n_g[g]
        bnds.append(cum * 4294967296 // N)
    na = defaultdict(int)
    sa = defaultdict(int)
    for k, cents, _ in rows:
        for rep in range(1, R + 1):
            u = (((k % 2147483648) + rep * 3266489917) % 2147483648
                 * 2654435761) % 4294967296
            gi = sum(1 for b in bnds if b <= u)
            na[(rep, gi)] += 1
            sa[(rep, gi)] += cents
    t_obs = {g: s_g[g] / n_g[g] - (S - s_g[g]) / (N - n_g[g]) for g in gs}
    p_num = {}
    for i, g in enumerate(gs):
        cnt = 0
        for rep in range(1, R + 1):
            np_, sp_ = na[(rep, i)], sa[(rep, i)]
            if np_ == 0 or np_ == N:
                cnt += 1
            elif abs(sp_ / np_ - (S - sp_) / (N - np_)) >= abs(t_obs[g]):
                cnt += 1
        p_num[g] = 1 + cnt
    order = sorted(gs, key=lambda g: (p_num[g], g))
    raw = [p_num[g] * m / ((i + 1) * (R + 1)) for i, g in enumerate(order)]
    adj = {}
    run = float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, raw[i])
        adj[order[i]] = min(run, 1.0)
    got = {
        r["nationkey"]: r
        for r in REGISTRY["stats_benjamini_hochberg"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert sorted(got) == gs
    for g in gs:
        r = got[g]
        assert r["n_g"] == n_g[g]
        assert r["p_num"] == p_num[g]
        assert math.isclose(r["t_obs"], t_obs[g], rel_tol=1e-12)
        assert math.isclose(r["adj_p"], adj[g], rel_tol=1e-12)
    assert [got[g]["bh_rank"] for g in order] == list(range(1, m + 1))


def test_holt_linear_matches_bruteforce(spark):
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"]).to_pandas()
    daily = ev.ts.dt.floor("d").value_counts().sort_index()
    ys = [float(c) for c in daily]
    level, trend, sse = ys[0], 0.0, 0.0
    for y in ys[1:]:
        pred = level + trend
        newlevel = 0.5 * y + 0.5 * pred
        trend = 0.5 * (newlevel - level) + 0.5 * trend
        sse += (y - pred) * (y - pred)
        level = newlevel
    r = (
        REGISTRY["events_holt_linear_forecast"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert r["n_days"] == len(ys)
    assert r["level"] == level
    assert r["trend"] == trend
    assert r["sse_one_step"] == sse
    assert r["forecast_7"] == level + 7.0 * trend
