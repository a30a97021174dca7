"""Third independent-semantics sweep: the round-6 statistics family
recomputed from parquet with plain pandas/numpy (textbook definitions,
not the SQL) — the cross-engine oracle proves agreement, these prove
the agreed-on formula is right."""

from __future__ import annotations

import re

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
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def documents():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


def _cents(s: pd.Series) -> pd.Series:
    return (s.round(2) * 100).round().astype("int64")


def test_spearman_matches_textbook(q, orders):
    c = orders.groupby("o_custkey").agg(
        n_orders=("o_orderkey", "size"),
        spend_c=("o_totalprice", lambda s: _cents(s).sum()),
    )
    keys = c.index.to_numpy()
    n = len(c)
    rx = np.empty(n, dtype=np.int64)
    rx[np.lexsort((keys, c["n_orders"].to_numpy()))] = np.arange(1, n + 1)
    ry = np.empty(n, dtype=np.int64)
    ry[np.lexsort((keys, c["spend_c"].to_numpy()))] = np.arange(1, n + 1)
    rho_ref = 1 - 6 * float(((rx - ry) ** 2).sum()) / (n * (n * n - 1))
    row = q("stats_spearman_rank").iloc[0]
    assert row["n"] == n
    assert abs(row["spearman_rho"] - rho_ref) < 2e-6


def test_weighted_median_matches_textbook(q, lineitem):
    s = lineitem[["l_orderkey", "l_linenumber"]].copy()
    s["cents"] = _cents(lineitem["l_extendedprice"])
    s["w"] = lineitem["l_quantity"].round().astype("int64")
    s = s.sort_values(["cents", "l_orderkey", "l_linenumber"])
    cum = s["w"].cumsum().to_numpy()
    total = int(s["w"].sum())
    target = (total + 1) // 2
    ref = s["cents"].to_numpy()[np.searchsorted(cum, target)] / 100
    row = q("lineitem_weighted_median_price").iloc[0]
    assert row["w_total"] == total
    assert row["weighted_median_price"] == pytest.approx(ref, abs=1e-9)


def test_winsorized_mean_matches_textbook(q, lineitem):
    part = pd.read_parquet(f"{SF}/part.parquet")
    cents = _cents(lineitem["l_extendedprice"]).to_numpy()
    srt = np.sort(cents)
    n = len(srt)
    lo = srt[-(-5 * n // 100) - 1]  # value at rank ceil(5n/100)
    hi = srt[-(-95 * n // 100) - 1]
    j = lineitem.merge(part, left_on="l_partkey", right_on="p_partkey")
    wc = np.clip(_cents(j["l_extendedprice"]).to_numpy(), lo, hi)
    got = {r["p_brand"]: r for _, r in q("brand_winsorized_mean").iterrows()}
    for brand, grp in pd.Series(wc, index=j["p_brand"]).groupby(level=0):
        ref = grp.to_numpy().mean() / 100
        assert got[brand]["n_lines"] == len(grp)
        assert abs(got[brand]["winsorized_mean_price"] - ref) < 2e-6, brand


def test_rolling_ols_slope_matches_textbook(q, orders):
    day = orders["o_orderdate"].dt.floor("D")
    dn = (day - pd.Timestamp("1992-01-01")).dt.days.astype("int64")
    rev = _cents(orders["o_totalprice"]).groupby(dn).sum()
    got = q("orders_rolling_ols_slope").set_index("day")
    days = rev.index.to_numpy()
    for d0 in days[:40]:
        m = (days >= d0 - 27) & (days <= d0)
        x, y = days[m].astype(float), rev.to_numpy()[m].astype(float)
        nw = len(x)
        den = nw * (x * x).sum() - x.sum() ** 2
        ts = pd.Timestamp("1992-01-01") + pd.Timedelta(days=int(d0))
        row = got.loc[ts]
        assert row["n_days"] == nw
        if nw >= 2 and den != 0:
            ref = (nw * (x * y).sum() - x.sum() * y.sum()) / den / 100
            assert abs(row["slope_per_day"] - ref) < 2e-5, d0


def test_key_skew_report_matches_textbook(q, events):
    c = events.groupby("user_id").size().to_numpy()
    srt = np.sort(c)
    n_keys = len(c)
    row = q("events_key_skew_report").iloc[0]
    assert row["n_events"] == len(events)
    assert row["n_keys"] == n_keys
    assert row["max_c"] == c.max()
    assert row["p50_c"] == srt[-(-50 * n_keys // 100) - 1]
    assert row["p99_c"] == srt[-(-99 * n_keys // 100) - 1]
    assert abs(row["top_key_share"] - c.max() / len(events)) < 2e-6
    assert (
        abs(row["skew_max_over_avg"] - c.max() * n_keys / len(events)) < 2e-6
    )


def test_cohens_kappa_matches_textbook(q, documents):
    a = (documents["n_chars"] >= 300).to_numpy()
    b = (documents["lang"] == "en").to_numpy()
    n = len(a)
    po = (a == b).mean()
    pe = (a.mean() * b.mean()) + ((1 - a.mean()) * (1 - b.mean()))
    kappa_ref = (po - pe) / (1 - pe)
    row = q("stats_cohens_kappa").iloc[0]
    assert row["n"] == n
    assert row["n11"] == int((a & b).sum())
    assert row["n00"] == int((~a & ~b).sum())
    assert abs(row["po"] - po) < 2e-6
    assert abs(row["pe"] - pe) < 2e-6
    assert abs(row["kappa"] - kappa_ref) < 2e-6


def test_psi_matches_textbook(q, orders):
    bkt = _cents(orders["o_totalprice"]) // 2000000
    era = (orders["o_orderdate"] >= pd.Timestamp("1995-01-01")).astype(int)
    tab = pd.crosstab(bkt, era)
    c0 = tab.get(0, pd.Series(0, index=tab.index)).to_numpy()
    c1 = tab.get(1, pd.Series(0, index=tab.index)).to_numpy()
    nb = len(tab)
    p = (c0 + 1) / (c0.sum() + nb)
    qq = (c1 + 1) / (c1.sum() + nb)
    psi_ref = ((p - qq) * np.log(p / qq)).sum()
    row = q("orders_psi_price_drift").iloc[0]
    assert row["n_buckets"] == nb
    assert row["n_early"] == c0.sum()
    assert row["n_late"] == c1.sum()
    assert abs(row["psi"] - psi_ref) < 2e-6


def test_burstiness_matches_textbook(q, documents):
    cf: dict[str, int] = {}
    df: dict[str, int] = {}
    for _, r in documents.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    top = sorted(cf, key=lambda t: (-cf[t], t))[:30]
    got = q("text_term_burstiness")
    assert list(got["term"]) == top or set(got["term"]) == set(top)
    for _, r in got.iterrows():
        t = r["term"]
        assert r["cf"] == cf[t]
        assert r["df"] == df[t]
        assert abs(r["burstiness"] - cf[t] / df[t]) < 2e-6, t


def test_cramers_v_matches_textbook(q, orders):
    tab = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"])
    obs = tab.to_numpy().astype(float)
    # observed-cells-only chi2, matching the classical computation the
    # catalog documents (structural zeros contribute nothing)
    rt = obs.sum(axis=1, keepdims=True)
    ct = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = rt @ ct / n
    mask = obs > 0
    chi2_ref = (((obs - e) ** 2 / e)[mask]).sum()
    r, c = (obs.sum(axis=1) > 0).sum(), (obs.sum(axis=0) > 0).sum()
    v_ref = np.sqrt(chi2_ref / (n * (min(r, c) - 1)))
    row = q("stats_cramers_v").iloc[0]
    assert row["n_orders"] == n
    assert row["dof"] == (r - 1) * (c - 1)
    assert abs(row["chi2"] - chi2_ref) < 2e-4
    assert abs(row["cramers_v"] - v_ref) < 2e-6


def test_heldout_cross_entropy_matches_textbook(q, documents):
    train: dict[str, int] = {}
    test: dict[str, int] = {}
    for _, r in documents.iterrows():
        side = train if r["doc_id"] % 2 == 0 else test
        for t in re.split(r"\s+", r["text"]):
            if t:
                side[t] = side.get(t, 0) + 1
    n_train, vocab = sum(train.values()), len(train)
    n_test = sum(test.values())
    denom = n_train + vocab + 1
    nll = sum(
        ct * np.log(denom / (train.get(t, 0) + 1)) for t, ct in test.items()
    )
    row = q("lm_heldout_perplexity").iloc[0]
    assert row["n_train"] == n_train
    assert row["vocab"] == vocab
    assert row["n_test"] == n_test
    assert abs(row["cross_entropy_nats"] - nll / n_test) < 2e-6


def test_theil_matches_textbook(q, orders):
    x = (
        _cents(orders["o_totalprice"])
        .groupby(orders["o_custkey"])
        .sum()
        .to_numpy()
        .astype(float)
    )
    n, total = len(x), x.sum()
    theil_ref = float((x / total * np.log(x * n / total)).sum())
    row = q("orders_theil_index").iloc[0]
    assert row["n_customers"] == n
    assert abs(row["mean_spend"] - total / n / 100) < 2e-6
    assert abs(row["theil_t"] - theil_ref) < 2e-6


def test_bounce_rate_matches_textbook(q, events):
    ev = events.sort_values(["user_id", "ts", "event_id"])
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    gap = us.groupby(ev["user_id"]).diff()
    new_s = (gap > 1800 * 1_000_000).fillna(False).astype(int)
    sid = new_s.groupby(ev["user_id"]).cumsum()
    g = pd.DataFrame({"user_id": ev["user_id"], "sid": sid, "us": us})
    sess = g.groupby(["user_id", "sid"])["us"].agg(["size", "min", "max"])
    n_sessions = len(sess)
    n_bounces = int((sess["size"] == 1).sum())
    dur_us = (sess["max"] - sess["min"]).sum()
    row = q("events_bounce_rate").iloc[0]
    assert row["n_sessions"] == n_sessions
    assert row["n_bounces"] == n_bounces
    assert abs(row["bounce_rate"] - n_bounces / n_sessions) < 2e-6
    assert (
        abs(row["avg_events_per_session"] - sess["size"].mean()) < 2e-6
    )
    assert (
        abs(row["avg_session_secs"] - dur_us / n_sessions / 1e6) < 2e-6
    )
