"""Sixth independent-semantics sweep: the round-7 vocabulary-economics
and behavioral-diagnostics families recomputed with plain pandas/numpy
textbook formulas (the oracle gate proves cross-engine agreement; these
prove the agreed-on formula)."""

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
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _tokens(text: str) -> list[str]:
    return [t for t in text.split() if t != ""]


def test_vocab_richness_matches_chao_good_turing(q, documents):
    got = q("source_vocab_richness").set_index("source")
    for src, grp in documents.groupby("source"):
        counts = pd.Series(
            [t for txt in grp.text for t in _tokens(txt)]
        ).value_counts()
        n = int(counts.sum())
        f1 = int((counts == 1).sum())
        f2 = int((counts == 2).sum())
        chao1 = len(counts) + f1 * (f1 - 1) / (2 * (f2 + 1))
        g = got.loc[src]
        assert g["n_tokens"] == n and g["n_types"] == len(counts)
        assert g["f1"] == f1 and g["f2"] == f2
        assert g["chao1"] == pytest.approx(chao1, abs=2e-6)
        assert g["gt_unseen_mass"] == pytest.approx(f1 / n, abs=2e-6)


def test_vocab_jaccard_matches_set_ops(q, documents):
    vocab = {
        src: {t for txt in grp.text for t in _tokens(txt)}
        for src, grp in documents.groupby("source")
    }
    got = q("vocab_jaccard_sources")
    assert len(got) == len(vocab) * (len(vocab) - 1) // 2
    for _, r in got.iterrows():
        a, b = vocab[r["source_a"]], vocab[r["source_b"]]
        inter = len(a & b)
        assert r["inter"] == inter
        assert r["vocab_jaccard"] == pytest.approx(
            inter / len(a | b), abs=2e-6
        )
        assert r["overlap_coeff"] == pytest.approx(
            inter / min(len(a), len(b)), abs=2e-6
        )


def test_oov_rate_matches_head_vocab(q, documents):
    all_toks = pd.Series(
        [t for txt in documents.text for t in _tokens(txt)]
    )
    counts = all_toks.value_counts()
    # count-desc, token-asc tie-break, top 20
    head = set(
        counts.rename_axis("t")
        .reset_index(name="c")
        .sort_values(["c", "t"], ascending=[False, True])
        .head(20)["t"]
    )
    got = q("text_oov_rate").set_index("source")
    for src, grp in documents.groupby("source"):
        toks = [t for txt in grp.text for t in _tokens(txt)]
        oov = sum(1 for t in toks if t not in head)
        g = got.loc[src]
        assert g["n_tokens"] == len(toks) and g["n_oov"] == oov
        assert g["oov_rate"] == pytest.approx(oov / len(toks), abs=2e-6)


def test_hourly_entropy_matches_shannon(q, events):
    got = q("events_hourly_entropy").set_index("hour")
    for hour, grp in events.groupby(events.ts.dt.hour):
        p = grp.event_type.value_counts(normalize=True).to_numpy()
        ent = float(-(p * np.log2(p)).sum())
        g = got.loc[hour]
        assert g["n_events"] == len(grp)
        assert g["entropy_bits"] == pytest.approx(ent, abs=2e-6)
        assert g["normalized_entropy"] == pytest.approx(
            ent / np.log2(len(p)), abs=2e-6
        )


def test_user_lorenz_matches_cumulative_shares(q, events):
    u = (
        events.groupby("user_id")
        .size()
        .rename("c")
        .reset_index()
        .sort_values(["c", "user_id"])
        .reset_index(drop=True)
    )
    n, tot = len(u), int(u.c.sum())
    u["decile"] = np.ceil((np.arange(1, n + 1)) * 10 / n).astype(int)
    got = q("events_user_lorenz").set_index("decile").sort_index()
    cum = 0
    for d, grp in u.groupby("decile"):
        cum += int(grp.c.sum())
        g = got.loc[d]
        assert g["n_users"] == len(grp)
        assert g["events"] == int(grp.c.sum())
        assert g["cum_share"] == pytest.approx(cum / tot, abs=2e-6)
    # Lorenz curve must be convex-ish: monotone cumulative shares
    assert got["cum_share"].is_monotonic_increasing


def test_interarrival_cv_matches_definition(q, events):
    got = q("events_interarrival_cv").set_index("event_type")
    for et, grp in events.groupby("event_type"):
        ts = grp.sort_values(["ts", "event_id"]).ts
        gaps = ts.diff().dropna().dt.total_seconds().to_numpy() * 1e6
        gaps = np.round(gaps).astype("int64")
        g = got.loc[et]
        assert g["n_gaps"] == len(gaps)
        assert g["mean_gap_secs"] == pytest.approx(
            gaps.mean() / 1e6, abs=2e-6
        )
        assert g["cv"] == pytest.approx(
            gaps.std(ddof=1) / gaps.mean(), abs=2e-6
        )


def test_pareto_8020_matches_bruteforce(q, orders):
    o = orders.copy()
    o["cents"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    spend = (
        o.groupby("o_custkey")["cents"]
        .sum()
        .rename("cents")
        .reset_index()
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    tot = int(spend.cents.sum())
    cum = spend.cents.cumsum()
    k = int(np.argmax(cum.to_numpy() * 5 >= tot * 4)) + 1
    row = q("orders_pareto_8020").iloc[0]
    assert row["n_customers"] == len(spend)
    assert row["k_for_80pct"] == k
    assert row["customer_share"] == pytest.approx(
        k / len(spend), abs=2e-6
    )
    assert row["revenue_share_at_k"] == pytest.approx(
        int(cum.iloc[k - 1]) / tot, abs=2e-6
    )


def test_seasonal_strength_matches_hyndman(q, orders):
    o = orders.copy()
    o["day"] = o.o_orderdate.dt.floor("D")
    o["cents"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    daily = o.groupby("day")["cents"].sum().sort_index()
    dn = (daily.index - pd.Timestamp("1990-01-01")).days.to_numpy()
    x = daily.to_numpy(dtype=np.float64)
    trend = np.array([x[(dn >= d - 3) & (dn <= d + 3)].mean() for d in dn])
    dow = dn % 7
    seas = np.array(
        [x[dow == d].mean() for d in dow]
    ) - x.mean()
    # the engines quantize components to 1/100-cent before variances
    rq = np.floor((x - trend - seas) * 100 + 0.5)
    dq = np.floor((x - trend) * 100 + 0.5)
    sq = np.floor((x - seas) * 100 + 0.5)
    fs = max(0.0, 1 - rq.var(ddof=1) / dq.var(ddof=1))
    ft = max(0.0, 1 - rq.var(ddof=1) / sq.var(ddof=1))
    row = q("orders_seasonal_strength").iloc[0]
    assert row["n_days"] == len(x)
    assert row["seasonal_strength"] == pytest.approx(fs, abs=2e-5)
    assert row["trend_strength"] == pytest.approx(ft, abs=2e-5)


def test_hurst_matches_reference_rs(q, orders):
    o = orders.copy()
    o["day"] = o.o_orderdate.dt.floor("D")
    o["cents"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    daily = o.groupby("day")["cents"].sum().sort_index()
    x = daily.to_numpy(dtype=np.float64)
    pts = []
    for s in (16, 32, 64, 128):
        nb = len(x) // s
        rs_blocks = []
        for b in range(nb):
            seg = x[b * s : (b + 1) * s]
            dev = np.cumsum(seg - seg.mean())
            r = dev.max() - dev.min()
            sd = seg.std(ddof=0)
            # engines quantize each block's R/S to micro units
            rs_blocks.append(np.floor(r / sd * 1e6 + 0.5) / 1e6)
        mean_rs = np.floor(np.sum(np.array(rs_blocks) * 1e6) / nb + 0.5) / 1e6
        pts.append((np.log2(s), np.log2(mean_rs)))
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    slope = ((lx - lx.mean()) * (ly - ly.mean())).sum() / (
        (lx - lx.mean()) ** 2
    ).sum()
    row = q("orders_hurst_rs").iloc[0]
    assert row["n_days"] == len(x)
    assert row["hurst_exponent"] == pytest.approx(slope, abs=2e-5)
    # an i.i.d.-by-construction synthetic series must look like noise
    assert 0.3 < row["hurst_exponent"] < 0.7
