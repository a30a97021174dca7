"""Fifth independent-semantics sweep: the round-7 classical-inference
battery recomputed from parquet with plain numpy/pandas (textbook
formulas, not the SQL) — the oracle gate proves the engines agree,
these prove the shared formula is right."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    from slipstream_async_spark.plans.catalog import _QUERIES

    def run(name):
        return _QUERIES[name](spark, SF).toPandas()

    return run


@pytest.fixture(scope="module")
def documents():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _daily_cents(orders):
    o = orders.copy()
    o["day"] = o.o_orderdate.dt.floor("D")
    o["cents"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    s = o.groupby("day")["cents"].sum().sort_index()
    s.index = (s.index - pd.Timestamp("1990-01-01")).days
    return s


def _groups(documents):
    a = documents.loc[documents.source == "src0", "n_chars"].to_numpy(
        dtype=np.float64
    )
    b = documents.loc[documents.source != "src0", "n_chars"].to_numpy(
        dtype=np.float64
    )
    return a, b


def test_welch_matches_textbook(q, documents):
    a, b = _groups(documents)
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t_ref = (a.mean() - b.mean()) / np.sqrt(va + vb)
    df_ref = (va + vb) ** 2 / (
        va**2 / (len(a) - 1) + vb**2 / (len(b) - 1)
    )
    row = q("stats_welch_ttest").iloc[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["t_stat"] == pytest.approx(t_ref, abs=2e-6)
    assert row["df_welch"] == pytest.approx(df_ref, abs=2e-5)


def test_cohens_d_matches_textbook(q, documents):
    a, b = _groups(documents)
    sp2 = (
        (len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1)
    ) / (len(a) + len(b) - 2)
    d_ref = (a.mean() - b.mean()) / np.sqrt(sp2)
    g_ref = d_ref * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    row = q("stats_cohens_d").iloc[0]
    assert row["cohens_d"] == pytest.approx(d_ref, abs=2e-6)
    assert row["hedges_g"] == pytest.approx(g_ref, abs=2e-6)


def test_chi2_dow_matches_textbook(q, orders):
    o = orders.copy()
    dow = (
        (o.o_orderdate.dt.floor("D") - pd.Timestamp("1990-01-01")).dt.days
        % 7
    )
    obs = dow.value_counts().reindex(range(7), fill_value=0).to_numpy()
    e = obs.sum() / 7
    chi2_ref = ((obs - e) ** 2 / e).sum()
    row = q("stats_chi2_dow_uniform").iloc[0]
    assert row["n_orders"] == obs.sum()
    assert row["chi2_stat"] == pytest.approx(chi2_ref, abs=2e-6)


def test_jarque_bera_matches_textbook(q, documents):
    x = documents.n_chars.to_numpy(dtype=np.float64)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    skew = m3 / m2**1.5
    kurt = m4 / m2**2
    jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
    row = q("stats_jarque_bera").iloc[0]
    assert row["n_docs"] == n
    assert row["skewness"] == pytest.approx(skew, abs=2e-6)
    assert row["kurtosis"] == pytest.approx(kurt, abs=2e-6)
    assert row["jb_stat"] == pytest.approx(jb, abs=1e-4)


def test_durbin_watson_matches_textbook(q, orders):
    x = _daily_cents(orders).to_numpy(dtype=np.float64)
    e = x - x.mean()
    dw_ref = (np.diff(e) ** 2).sum() / (e**2).sum()
    row = q("stats_durbin_watson").iloc[0]
    assert row["n_days"] == len(x)
    assert row["dw_stat"] == pytest.approx(dw_ref, abs=2e-6)
    assert row["rho_lag1"] == pytest.approx(1 - dw_ref / 2, abs=2e-6)


def test_mann_kendall_matches_bruteforce(q, orders):
    x = _daily_cents(orders).to_numpy()
    n = len(x)
    s_ref = 0
    for i in range(n - 1):
        s_ref += np.sign(x[i + 1 :] - x[i]).sum()
    _, t = np.unique(x, return_counts=True)
    t = t[t > 1]
    var = (n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()) / 18
    sc = s_ref - np.sign(s_ref)
    z_ref = sc / np.sqrt(var)
    n0 = n * (n - 1) / 2
    tau_ref = s_ref / np.sqrt(n0 * (n0 - (t * (t - 1)).sum() / 2))
    row = q("stats_mann_kendall").iloc[0]
    assert row["s_stat"] == s_ref
    assert row["z"] == pytest.approx(z_ref, abs=2e-6)
    assert row["tau_b"] == pytest.approx(tau_ref, abs=2e-6)


def test_kruskal_wallis_matches_textbook(q, documents):
    x = documents.n_chars.to_numpy(dtype=np.float64)
    g = documents.source.to_numpy()
    # midranks via average method
    order = pd.Series(x).rank(method="average").to_numpy()
    n = len(x)
    h = 0.0
    for src in np.unique(g):
        r = order[g == src]
        h += r.sum() ** 2 / len(r)
    h = 12 / (n * (n + 1)) * h - 3 * (n + 1)
    _, t = np.unique(x, return_counts=True)
    corr = 1 - ((t**3 - t).sum()) / (n**3 - n)
    row = q("stats_kruskal_wallis").iloc[0]
    assert row["n_docs"] == n
    assert row["h_stat"] == pytest.approx(h, abs=2e-5)
    assert row["h_tie_corrected"] == pytest.approx(h / corr, abs=2e-5)


def test_levene_bf_matches_textbook(q, documents):
    # Brown-Forsythe with the documented LOWER median
    z = []
    groups = []
    for src, grp in documents.groupby("source"):
        v = np.sort(grp.n_chars.to_numpy(dtype=np.int64))
        med = v[(len(v) + 1) // 2 - 1]
        z.append(np.abs(grp.n_chars.to_numpy(dtype=np.int64) - med))
        groups.append(len(grp))
    zb = np.concatenate(z).astype(np.float64)
    n, k = len(zb), len(groups)
    grand = zb.mean()
    ss_between = sum(
        len(zi) * (zi.mean() - grand) ** 2 for zi in np.array(z, dtype=object)
    )
    ss_within = sum(((zi - zi.mean()) ** 2).sum() for zi in z)
    f_ref = (ss_between / (k - 1)) / (ss_within / (n - k))
    row = q("stats_levene_bf").iloc[0]
    assert row["n_docs"] == n and row["n_groups"] == k
    assert row["f_stat"] == pytest.approx(f_ref, abs=2e-5)


def test_theil_sen_matches_bruteforce(q, orders):
    s = _daily_cents(orders)
    dn = s.index.to_numpy()
    x = s.to_numpy(dtype=np.float64)
    slopes = []
    for i in range(len(x) - 1):
        slopes.append((x[i + 1 :] - x[i]) / (dn[i + 1 :] - dn[i]))
    slopes = np.sort(np.concatenate(slopes))
    med = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
    row = q("orders_theil_sen_slope").iloc[0]
    assert row["n_pairs"] == len(slopes)
    assert row["sen_slope_per_day"] == pytest.approx(med / 100, abs=2e-6)


def test_holt_matches_reference_loop(q, orders):
    x = _daily_cents(orders).to_numpy(dtype=np.float64)
    alpha, beta = 0.3, 0.1
    l, b = x[0], x[1] - x[0]
    sape = 0.0
    for t in range(1, len(x)):
        f = l + b
        sape += abs(x[t] - f) / x[t]
        l_new = alpha * x[t] + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    row = q("forecast_holt_linear").iloc[0]
    assert row["n_days"] == len(x)
    assert row["level_end"] == pytest.approx(l / 100, rel=1e-9)
    assert row["trend_end"] == pytest.approx(b / 100, abs=1e-4)
    assert row["forecast_7d"] == pytest.approx((l + 7 * b) / 100, rel=1e-6)
    assert row["mape_insample"] == pytest.approx(
        sape / (len(x) - 1), abs=2e-6
    )


def test_bh_fdr_matches_textbook(q):
    from math import erf, sqrt

    got = q("stats_bh_fdr").sort_values("bh_rank").reset_index(drop=True)
    m = len(got)
    # p-values must be the two-sided normal tail of z (within the
    # documented Abramowitz-Stegun 1.5e-7 envelope)
    for _, r in got.iterrows():
        p_ref = 1 - erf(abs(r["z"]) / sqrt(2))
        assert r["p_two_sided"] == pytest.approx(p_ref, abs=5e-6)
    # BH: rejected set == ranks up to the largest k with p_k <= q*k/m
    ps = got["p_two_sided"].to_numpy()
    ks = np.nonzero(ps <= 0.10 * (np.arange(1, m + 1)) / m)[0]
    kstar = ks.max() + 1 if len(ks) else 0
    expect = np.arange(1, m + 1) <= kstar
    assert (got["rejected_fdr10"].to_numpy() == expect).all()


def test_markov_mixing_matches_numpy(q, spark):
    import numpy.linalg  # noqa: F401

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    prev = ev.groupby("user_id")["event_type"].shift()
    trans = pd.DataFrame(
        {"src": prev, "dst": ev.event_type.to_numpy()}
    ).dropna()
    states = sorted(ev.event_type.unique())
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    c = np.zeros((k, k), dtype=np.int64)
    for (s, d), n in trans.value_counts().items():
        c[idx[s], idx[d]] = n
    # ppm-floored row-stochastic matrix, integer micro-unit iterations —
    # the engines' exact arithmetic, reproduced independently
    share = np.floor(c * 1_000_000 / c.sum(axis=1, keepdims=True)).astype(
        np.int64
    )
    p = np.full(k, 1_000_000 // k, dtype=np.int64)
    for _ in range(5):
        p4 = p.copy()
        inc = np.zeros(k, dtype=np.int64)
        for i in range(k):
            inc += (p[i] * share[i]) // 1_000_000
        dangling = p[(c.sum(axis=1) == 0)].sum() if (c.sum(axis=1) == 0).any() else 0
        p = inc + dangling // k
    got = q("events_markov_mixing").set_index("event_type")
    for s in states:
        assert got.loc[s, "stationary_prob"] == pytest.approx(
            p[idx[s]] / 1e6, abs=1e-9
        )
        assert got.loc[s, "mixing_delta"] == pytest.approx(
            abs(p[idx[s]] - p4[idx[s]]) / 1e6, abs=1e-9
        )
    # mixed chain: stationary mass ~ 1 (integer floor crumbs only)
    assert got.stationary_prob.sum() == pytest.approx(1.0, abs=1e-3)
