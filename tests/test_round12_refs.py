"""Round-12 reference tests — independent pure-numpy/pandas checks of
the canonical-suite-closure wave (#490-#499, round12_q.py).

Each test recomputes the statistic from the raw parquet with numpy
(float64 without the engine's quantization grids) or a brute pandas
pass, and compares to the Spark query at sf0.001 within a tolerance
wide enough for grid effects but tight enough to catch a wrong
formula (the DuckDB oracle already pins bit-exactness; these pin the
MATH against a second, non-SQL derivation)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from zmaxion_spark.queries import REGISTRY


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE).toPandas()


@pytest.fixture(scope="module")
def daily():
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    day = orders["o_orderdate"].dt.floor("D")
    y = (
        np.floor(orders["o_totalprice"] + 0.5)
        .astype("int64")
        .groupby(day)
        .sum()
        .sort_index()
    )
    return y.to_numpy(dtype="float64")


def test_q02_min_cost_supplier_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    region = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    li = li.assign(cost=li.l_extendedprice / li.l_quantity)
    ps = (
        li.groupby(["l_partkey", "l_suppkey"], as_index=False)["cost"].min()
    )
    eur = (
        ps.merge(
            part[(part.p_size <= 15) & (part.p_type == "STANDARD")],
            left_on="l_partkey",
            right_on="p_partkey",
        )
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
        .merge(
            region[region.r_name == "EUROPE"],
            left_on="n_regionkey",
            right_on="r_regionkey",
        )
    )
    mn = eur.groupby("p_partkey")["cost"].transform("min")
    want = (
        eur[eur.cost == mn]
        .sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
        )
        .head(100)
    )
    got = _run(spark, "q02_min_cost_supplier")
    assert len(got) == len(want)
    assert list(got.p_partkey) == list(want.p_partkey)
    assert np.allclose(got.supply_cost, want.cost, rtol=0, atol=1e-8)


def test_q11_above_mean_gate_and_head(spark):
    got = _run(spark, "q11_important_stock")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    region = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    eur = (
        supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
        .merge(
            region[region.r_name == "EUROPE"],
            left_on="n_regionkey",
            right_on="r_regionkey",
        )
    )
    sli = li[li.l_suppkey.isin(eur.s_suppkey)]
    cents = np.floor(
        sli.l_extendedprice * (1 - sli.l_discount) * 100 + 0.5
    ).astype("int64")
    v = cents.groupby(sli.l_partkey).sum()
    kept = v[v * len(v) > v.sum()].sort_values(ascending=False)
    want = kept.head(100)
    assert len(got) == len(want)
    # same part set and same value head (order ties broken by partkey)
    assert set(got.partkey) == set(want.index)
    assert np.allclose(
        sorted(got.stock_value), sorted(want.to_numpy() / 100), atol=1e-6
    )


def test_kpss_matches_numpy(spark, daily):
    y = daily
    n = len(y)
    e = np.floor(y - y.mean() + 0.5)
    s = np.cumsum(e)
    num = float((s * s).sum())
    g = [float((e[j:] * e[: n - j]).sum()) for j in range(5)]
    s2 = g[0] + 2 * (0.8 * g[1] + 0.6 * g[2] + 0.4 * g[3] + 0.2 * g[4])
    eta = num / (n * s2)
    got = _run(spark, "q_kpss_test").iloc[0]
    assert got.n_days == n
    assert math.isclose(got.kpss_eta, eta, rel_tol=1e-6, abs_tol=1e-8)
    assert bool(got.reject_stationary_5pct) == (eta > 0.463)


def test_pacf_matches_statsmodels_free_durbin_levinson(spark, daily):
    y = daily
    n = len(y)
    e = np.floor(y - y.mean() + 0.5)
    g = [float((e[j:] * e[: n - j]).sum()) for j in range(4)]
    r1, r2, r3 = g[1] / g[0], g[2] / g[0], g[3] / g[0]
    phi11 = r1
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    got = _run(spark, "q_pacf").set_index("lag")
    assert math.isclose(got.loc[1, "pacf"], phi11, rel_tol=1e-6, abs_tol=1e-8)
    assert math.isclose(got.loc[2, "pacf"], phi22, rel_tol=1e-6, abs_tol=1e-8)
    assert math.isclose(got.loc[3, "pacf"], phi33, rel_tol=1e-6, abs_tol=1e-8)
    assert math.isclose(got.loc[2, "rho"], r2, rel_tol=1e-6, abs_tol=1e-8)


def test_variance_ratio_matches_numpy(spark, daily):
    y = daily
    x = np.diff(y)
    z = y[5:] - y[:-5]
    m, mq = len(x), len(z)
    mu = x.mean()
    v1 = ((x - mu) ** 2).sum() / (m - 1)
    vq = ((z - 5 * mu) ** 2).sum() / (mq - 1)
    vr = vq / (5 * v1)
    zstat = (vr - 1) / math.sqrt(2.0 * 9 * 4 / (3.0 * 5 * m))
    got = _run(spark, "q_variance_ratio").iloc[0]
    assert got.n_diffs == m
    assert math.isclose(got.vr, vr, rel_tol=1e-6, abs_tol=1e-8)
    assert math.isclose(got.z_stat, zstat, rel_tol=1e-6, abs_tol=1e-8)


def test_breusch_pagan_matches_numpy(spark, daily):
    y = daily
    n = len(y)
    t = np.arange(n, dtype="float64")
    b = ((n * (t * y).sum() - t.sum() * y.sum())
         / (n * (t * t).sum() - t.sum() ** 2))
    a = (y.sum() - b * t.sum()) / n
    e = np.floor(np.floor(y - (a + b * t) + 0.5) / 100 + 0.5)
    u = e * e
    # R^2 of u on t (hecto-dollar residual grid, as the engine)
    num = n * (t * u).sum() - t.sum() * u.sum()
    r2 = num * num / (
        (n * (t * t).sum() - t.sum() ** 2)
        * (n * (u * u).sum() - u.sum() ** 2)
    )
    stat = n * r2
    got = _run(spark, "q_breusch_pagan").iloc[0]
    assert got.n_days == n
    assert math.isclose(got.bp_stat, stat, rel_tol=1e-6, abs_tol=1e-8)


def test_pettitt_matches_brute_force(spark, daily):
    y = daily
    n = len(y)
    # brute-force U_t = sum_{i<=t, j>t} sgn(y_i - y_j)
    sgn = np.sign(y[:, None] - y[None, :])
    best_k, best_t = -1, -1
    for t in range(n):
        ut = int(sgn[: t + 1, t + 1:].sum())
        if abs(ut) > best_k:
            best_k, best_t = abs(ut), t
    p = 2 * math.exp(-6.0 * best_k * best_k / (n**3 + n**2))
    got = _run(spark, "q_pettitt_test").iloc[0]
    assert got.n_days == n
    assert got.k_stat == best_k
    assert math.isclose(got.p_approx, p, rel_tol=1e-6)


def test_bartlett_matches_numpy(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    cents = np.floor(cust.c_acctbal * 100 + 0.5).astype("int64")
    groups = [
        g.to_numpy(dtype="float64")
        for _, g in cents.groupby(cust.c_nationkey)
    ]
    k = len(groups)
    n = sum(len(g) for g in groups)
    vi = [g.var(ddof=1) for g in groups]
    sp2 = sum((len(g) - 1) * v for g, v in zip(groups, vi)) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(v) for g, v in zip(groups, vi)
    )
    c = 1 + (
        sum(1.0 / (len(g) - 1) for g in groups) - 1.0 / (n - k)
    ) / (3.0 * (k - 1))
    stat = num / c
    got = _run(spark, "q_bartlett_test").iloc[0]
    assert got.n_groups == k and got.n_rows == n
    # whole-cents^2 quantization of (n_i-1)s_i^2 admits ~1e-9 drift
    assert math.isclose(got.bartlett_stat, stat, rel_tol=1e-6)


def test_atkinson_matches_numpy(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    cents = np.floor(j.o_totalprice * 100 + 0.5).astype("int64")
    cells = cents.groupby(j.c_nationkey % 25).agg(["count", "sum"])
    # groupby key: nationkey already 0..24; the %25 is a no-op guard
    n = int(cells["count"].sum())
    mu = float(cells["sum"].sum()) / n
    mu_i = cells["sum"] / cells["count"]
    a1 = 1 - math.exp(
        float((cells["count"] * np.log(mu_i)).sum()) / n
    ) / mu
    a05 = 1 - (float((cells["count"] * np.sqrt(mu_i)).sum()) / n) ** 2 / mu
    got = _run(spark, "q_atkinson_index").iloc[0]
    assert got.n_nations == len(cells)
    assert math.isclose(got.mean_value, mu / 100, rel_tol=1e-9)
    assert math.isclose(got.atkinson_1, a1, rel_tol=1e-6, abs_tol=1e-9)
    assert math.isclose(got.atkinson_05, a05, rel_tol=1e-6, abs_tol=1e-9)


def test_price_elasticity_matches_numpy(spark):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    bins = np.floor(part.p_retailprice / 10).astype("int64")
    cents = np.floor(part.p_retailprice * 100 + 0.5).astype("int64")
    pc = pd.DataFrame(
        {"bin": bins, "cents": cents, "p_partkey": part.p_partkey}
    )
    price = pc.groupby("bin")["cents"].agg(["count", "sum"])
    qty = (
        li.merge(pc, left_on="l_partkey", right_on="p_partkey")
        .assign(q=lambda d: np.floor(d.l_quantity + 0.5).astype("int64"))
        .groupby("bin")["q"]
        .sum()
    )
    x = np.log(price["sum"] / price["count"]).to_numpy()
    yv = np.log(qty.loc[price.index].to_numpy(dtype="float64"))
    nb = len(x)
    num = nb * (x * yv).sum() - x.sum() * yv.sum()
    slope = num / (nb * (x * x).sum() - x.sum() ** 2)
    r2 = num * num / (
        (nb * (x * x).sum() - x.sum() ** 2)
        * (nb * (yv * yv).sum() - yv.sum() ** 2)
    )
    got = _run(spark, "q_price_elasticity").iloc[0]
    assert got.n_bins == nb
    assert math.isclose(got.elasticity, slope, rel_tol=1e-6)
    assert math.isclose(got.r2, r2, rel_tol=1e-6)
    assert bool(got.elastic) == (abs(slope) > 1)


# ---- wave 2: OLS-misspecification closure + Fleiss (#500-#503) ----


def _ols_residuals(y):
    n = len(y)
    t = np.arange(n, dtype="float64")
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    return t, np.floor(y - (a + b * t) + 0.5), a, b


def test_arch_lm_matches_numpy(spark, daily):
    y = daily
    _, e, _, _ = _ols_residuals(y)
    e = np.floor(e / 100 + 0.5)
    u = e * e
    uc, u1 = u[1:], u[:-1]
    m = len(uc)
    num = m * (uc * u1).sum() - u1.sum() * uc.sum()
    r2 = num * num / (
        (m * (u1 * u1).sum() - u1.sum() ** 2)
        * (m * (uc * uc).sum() - uc.sum() ** 2)
    )
    stat = m * r2
    got = _run(spark, "q_arch_lm").iloc[0]
    assert got.n_pairs == m
    assert math.isclose(got.arch_lm_stat, stat, rel_tol=1e-6, abs_tol=1e-8)


def test_cochrane_orcutt_matches_numpy(spark, daily):
    y = daily
    t, e, _, b_ols = _ols_residuals(y)
    rho = (e[1:] * e[:-1]).sum() / (e[:-1] * e[:-1]).sum()
    ys = np.floor(y[1:] - rho * y[:-1] + 0.5)
    xs = np.floor((t[1:] - rho * (t[1:] - 1)) * 1e6 + 0.5) / 1e6
    m = len(ys)
    bg = (m * (xs * ys).sum() - xs.sum() * ys.sum()) / (
        m * (xs * xs).sum() - xs.sum() ** 2
    )
    ag = (ys.sum() - bg * xs.sum()) / m
    got = _run(spark, "q_cochrane_orcutt").iloc[0]
    assert got.n_days == m
    assert math.isclose(got.rho, rho, rel_tol=1e-6, abs_tol=1e-8)
    assert math.isclose(got.slope_ols, b_ols, rel_tol=1e-6, abs_tol=1e-8)
    # the engine quantizes x*y / x*x products to 1e-6 before summing
    assert math.isclose(got.slope_gls, bg, rel_tol=1e-5)
    assert math.isclose(got.intercept_gls, ag / (1 - rho), rel_tol=1e-5)


def test_ramsey_reset_matches_numpy(spark, daily):
    y = daily
    n = len(y)
    t, _, a, b = _ols_residuals(y)
    h = np.floor((a + b * t) * (a + b * t) / 1e6 + 0.5)
    ctt = (t * t).sum() - t.sum() ** 2 / n
    cth = (t * h).sum() - t.sum() * h.sum() / n
    chh = (h * h).sum() - h.sum() ** 2 / n
    cty = (t * y).sum() - t.sum() * y.sum() / n
    chy = (h * y).sum() - h.sum() * y.sum() / n
    cyy = (y * y).sum() - y.sum() ** 2 / n
    det = ctt * chh - cth * cth
    b1 = (chh * cty - cth * chy) / det
    b2 = (ctt * chy - cth * cty) / det
    sse_r = cyy - cty * cty / ctt
    sse_u = cyy - b1 * cty - b2 * chy
    stat = (sse_r - sse_u) / (sse_u / (n - 3))
    got = _run(spark, "q_ramsey_reset").iloc[0]
    assert got.n_days == n
    # float64 moment sums here vs the engine's exact DECIMAL sums:
    # the h^2 moments are ~1e28, far past float64's 2^53 — compare
    # loosely and rely on the DuckDB oracle for exactness
    assert math.isclose(got.reset_f, stat, rel_tol=1e-2)


def test_fleiss_kappa_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    pairs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["l_partkey", "o_orderkey", "o_orderpriority"]
        ]
        .drop_duplicates()
        .sort_values(["l_partkey", "o_orderkey"])
    )
    panel = pairs.groupby("l_partkey").filter(lambda g: len(g) >= 5)
    panel = panel.groupby("l_partkey").head(5)
    nic = (
        panel.groupby(["l_partkey", "o_orderpriority"])
        .size()
        .rename("n_ic")
        .reset_index()
    )
    n_items = nic.l_partkey.nunique()
    s2 = int((nic.n_ic**2).sum())
    p_bar = (s2 - 5 * n_items) / (20.0 * n_items)
    colsum = nic.groupby("o_orderpriority")["n_ic"].sum()
    p_e = float((colsum**2).sum()) / (25.0 * n_items * n_items)
    kappa = (p_bar - p_e) / (1 - p_e)
    got = _run(spark, "q_fleiss_kappa").iloc[0]
    assert got.n_items == n_items
    assert got.n_cats == len(colsum)
    assert math.isclose(got.p_bar, p_bar, rel_tol=1e-8, abs_tol=1e-9)
    assert math.isclose(got.fleiss_kappa, kappa, rel_tol=1e-6, abs_tol=1e-9)
