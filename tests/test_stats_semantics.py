"""Independent SEMANTIC checks for the statistics family.

The DuckDB oracle gate proves Spark and DuckDB agree; it cannot prove
the shared formula is RIGHT. These tests recompute each statistic from
the same sf0.001 parquet with plain pandas/numpy — a third
implementation written from the textbook definition, not from the SQL —
and compare within the documented quantization tolerance.
"""

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
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _daily_cents(orders):
    o = orders.copy()
    o["day"] = o["o_orderdate"].dt.floor("D")
    o["cents"] = (o["o_totalprice"].round(2) * 100).round().astype("int64")
    return o.groupby("day")["cents"].sum().sort_index()


def test_ks_two_sample_matches_textbook(q, docs):
    a = np.sort(docs.loc[docs.source == "src0", "n_chars"].to_numpy())
    b = np.sort(docs.loc[docs.source != "src0", "n_chars"].to_numpy())
    xs = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, xs, side="right") / len(a)
    f2 = np.searchsorted(b, xs, side="right") / len(b)
    d_ref = np.max(np.abs(f1 - f2))
    row = q("stats_ks_two_sample").iloc[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["ks_d"] - d_ref) < 2e-6


def test_mann_whitney_matches_textbook(q, docs):
    a = docs.loc[docs.source == "src0", "n_chars"].to_numpy()
    b = docs.loc[docs.source != "src0", "n_chars"].to_numpy()
    # U1 = wins of a over b with half credit for ties (direct O(n*m))
    u_ref = (
        (a[:, None] > b[None, :]).sum()
        + 0.5 * (a[:, None] == b[None, :]).sum()
    )
    n1, n2 = len(a), len(b)
    n = n1 + n2
    _, t = np.unique(np.concatenate([a, b]), return_counts=True)
    var = n1 * n2 / 12 * ((n + 1) - ((t**3 - t).sum()) / (n * (n - 1)))
    z_ref = (u_ref - n1 * n2 / 2) / np.sqrt(var)
    row = q("stats_mann_whitney").iloc[0]
    assert row["u_stat"] == pytest.approx(u_ref)
    assert abs(row["z"] - z_ref) < 2e-6


def test_acf_matches_numpy(q, orders):
    s = _daily_cents(orders)
    s.index = (s.index - pd.Timestamp("1990-01-01")).days
    got = {int(r["lag"]): r for _, r in q("revenue_acf_lags").iterrows()}
    for lag in (1, 7, 28):
        pairs = [
            (s[d], s[d - lag]) for d in s.index if (d - lag) in s.index
        ]
        x, y = np.array(pairs, dtype=float).T
        r_ref = np.corrcoef(x, y)[0, 1]
        assert got[lag]["n_pairs"] == len(pairs)
        assert abs(got[lag]["acf"] - r_ref) < 2e-6


def test_cusum_matches_bruteforce(q, orders):
    o = orders.copy()
    o["day"] = o["o_orderdate"].dt.floor("D")
    c = o.groupby("day").size().sort_index()
    n = len(c)
    cum = c.cumsum().to_numpy()
    t = np.arange(1, n + 1)
    dev = np.abs(n * cum - t * c.sum())
    i = int(np.argmax(dev))  # ties: earliest day — argmax takes first
    row = q("orders_cusum_changepoint").iloc[0]
    assert pd.Timestamp(row["change_day"]) == c.index[i]
    assert row["cusum_stat"] == pytest.approx(dev[i] / n)


def test_mad_outliers_match_bruteforce(q, orders):
    s = _daily_cents(orders)
    x = np.sort(s.to_numpy())
    med = x[(len(x) + 1) // 2 - 1]  # lower median
    adev = np.abs(s.to_numpy() - med)
    mad = np.sort(adev)[(len(adev) + 1) // 2 - 1]
    want = {
        pd.Timestamp(d)
        for d, a in zip(s.index, adev)
        if mad > 0 and a > 3 * mad
    }
    out = q("revenue_mad_outliers")
    assert {pd.Timestamp(d) for d in out["day"]} == want


def test_bootstrap_is_calibrated(q, orders):
    row = q("orders_bootstrap_ci").iloc[0]
    true_mean = orders["o_totalprice"].round(2).mean()
    assert row["n_boot"] == 16
    # Poisson bootstrap means concentrate around the sample mean: the
    # CI must contain it and the SE must be within an order of the
    # theoretical sd/sqrt(n)
    assert row["boot_lo"] <= true_mean <= row["boot_hi"]
    se_ref = orders["o_totalprice"].std() / np.sqrt(len(orders))
    assert 0.2 * se_ref < row["boot_se"] < 5 * se_ref


def test_fano_factor_matches_definition(q):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    hours = ts.dt.floor("h")
    span = int(
        (hours.max() - hours.min()) / pd.Timedelta(hours=1)
    ) + 1
    got = {r["event_type"]: r for _, r in q("events_fano_factor").iterrows()}
    for et, grp in ev.groupby("event_type"):
        c = pd.to_datetime(grp["ts"]).dt.floor("h").value_counts()
        counts = np.zeros(span)
        counts[: len(c)] = c.to_numpy()  # zeros for absent hours
        fano = counts.var() / counts.mean()
        assert abs(got[et]["fano_factor"] - fano) < 2e-6, et


def test_pagerank_sums_to_one_and_matches_reference_loop(q, spark):
    out = q("nation_trade_pagerank")
    # quantized ranks: total mass within integer-truncation slack of 1
    assert 0.95 < out["pagerank"].sum() <= 1.0 + 1e-9
    # independent reference: rebuild edges in pandas, run the same
    # integer scheme
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    j = (
        li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
        .merge(na, left_on="s_nationkey", right_on="n_nationkey")
        .rename(columns={"n_name": "src"})
        .merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .rename(columns={"n_name": "dst"})
    )
    j["w"] = (
        (
            j["l_extendedprice"].round(2)
            * (1 - j["l_discount"].round(2))
            * 10000
        )
        .round()
        .astype("int64")
    )
    flows = j.groupby(["src", "dst"])["w"].sum().reset_index()
    out_w = flows.groupby("src")["w"].transform("sum")
    flows["share"] = np.floor(
        flows["w"].astype(float) * 1_000_000 / out_w.astype(float)
    ).astype("int64")
    nodes = sorted(na["n_name"])
    has_out = set(flows["src"])
    pr = {x: 40000 for x in nodes}
    for _ in range(3):
        dm = sum(v for x, v in pr.items() if x not in has_out)
        inc = {x: 0 for x in nodes}
        for _, r in flows.iterrows():
            inc[r["dst"]] += pr[r["src"]] * r["share"] // 1_000_000
        pr = {
            x: 6000 + 85 * (inc[x] + dm // len(nodes)) // 100
            for x in nodes
        }
    got = dict(zip(out["nation"], out["pagerank"]))
    for x in nodes:
        assert got[x] == pytest.approx(pr[x] / 1e6), x


def test_anova_f_matches_numpy(q, spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6 + 0.5
    )
    labels = emb["label"].to_numpy()
    got = {int(r["pos"]): r["f_stat"] for _, r in q("emb_anova_f_per_dim").iterrows()}
    for pos in (0, 17, 63):
        x = mat[:, pos]
        groups = [x[labels == g] for g in np.unique(labels)]
        k, n = len(groups), len(x)
        grand = x.mean()
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f_ref = (ssb / (k - 1)) / (ssw / (n - k))
        assert got[pos] == pytest.approx(f_ref, rel=1e-3), pos


def test_dow_index_and_mape_match_definitions(q, orders):
    s = _daily_cents(orders)
    day_no = (s.index - pd.Timestamp("1990-01-01")).days
    dow = pd.Series(day_no % 7, index=s.index)
    overall = s.mean()
    got = {int(r["dow"]): r["revenue_index"] for _, r in q("orders_dow_index").iterrows()}
    for d in range(7):
        ref = s[dow == d].mean() / overall
        assert abs(got[d] - ref) < 2e-6, d

    f = s.copy()
    f.index = day_no + 7
    s2 = s.copy()
    s2.index = day_no
    both = pd.concat([s2, f], axis=1, keys=["x", "f"]).dropna()
    ape = (both["x"] - both["f"]).abs() / both["x"]
    row = q("forecast_naive_mape").iloc[0]
    assert row["n_days"] == len(both)
    assert abs(row["mape"] - ape.mean()) < 2e-6
    assert abs(row["mdape"] - np.sort(ape)[(len(ape) + 1) // 2 - 1]) < 2e-6
