"""Fourth independent-semantics sweep: the round-6 marketing /
forecasting / fusion / privacy family recomputed from parquet with plain
pandas/numpy (textbook definitions, not the SQL). The cross-engine
oracle gate proves Spark and DuckDB agree; these prove the agreed-on
formula is RIGHT — this suite's pattern already caught a shared
PageRank dangling-mass bug both engines reproduced identically."""

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
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


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
def customer():
    return pd.read_parquet(f"{SF}/customer.parquet")


@pytest.fixture(scope="module")
def emb():
    m = pd.read_parquet(f"{SF}/embeddings.parquet")
    return m.sort_values("vec_id").reset_index(drop=True)


def _ranked(score: np.ndarray, ids: np.ndarray, descending: bool):
    """Rank positions 1..n ordered by score (desc/asc) with id tie-break
    — the same (score, vec_id) ordering every catalog window uses."""
    key = -score if descending else score
    order = np.lexsort((ids, key))
    ranks = np.empty(len(ids), dtype=np.int64)
    ranks[order] = np.arange(1, len(ids) + 1)
    return ranks


def test_attribution_position_matches_model(q, events):
    # Direct per-purchase U-shaped split in integer basis points.
    ev = events
    purchases = ev[ev.event_type == "purchase"]
    touch = ev[ev.event_type.isin(["view", "click", "signup"])]
    credited: dict[str, int] = {}
    n_touch: dict[str, int] = {}
    for _, p in purchases.iterrows():
        val_c = int(np.floor(p["value"] * 100 + 0.5))
        t = touch[
            (touch.user_id == p.user_id)
            & (touch.ts < p.ts)
            & (touch.ts >= p.ts - pd.Timedelta(days=7))
        ].sort_values(["ts", "event_id"])
        k = len(t)
        for pos, (_, row) in enumerate(t.iterrows(), start=1):
            if k == 1:
                bp = 10000
            elif k == 2:
                bp = 5000
            elif pos in (1, k):
                bp = 4000
            else:
                bp = 2000 // (k - 2)
            et = row["event_type"]
            credited[et] = credited.get(et, 0) + val_c * bp
            n_touch[et] = n_touch.get(et, 0) + 1
    got = q("events_attribution_position").set_index("event_type")
    assert set(got.index) == set(credited)
    for et in credited:
        assert got.loc[et, "n_touches"] == n_touch[et]
        assert got.loc[et, "credited_revenue"] == pytest.approx(
            credited[et] / 1e6, abs=1e-9
        )


def test_p_chart_matches_shewhart(q, events):
    ev = events.copy()
    ev["day"] = ev.ts.dt.floor("D")
    daily = ev.groupby("day").agg(
        n=("event_id", "size"),
        e=("event_type", lambda s: int((s == "error").sum())),
    )
    pbar = daily.e.sum() / daily.n.sum()
    ucl = pbar + 3 * np.sqrt(pbar * (1 - pbar) / daily.n)
    got = q("events_p_chart").set_index("day").sort_index()
    assert len(got) == len(daily)
    for day, row in daily.iterrows():
        g = got.loc[day]
        assert g["n_events"] == row.n and g["n_errors"] == row.e
        assert g["p_hat"] == pytest.approx(row.e / row.n, abs=2e-6)
        assert g["ucl"] == pytest.approx(ucl.loc[day], abs=2e-6)
        assert bool(g["out_of_control"]) == bool(
            row.e / row.n > ucl.loc[day]
        )
    # sanity: the chart must actually be a 3-sigma chart, not z on raw
    assert (got["ucl"] > pbar).all()


def test_rrf_fusion_matches_cormack_clarke(q, emb):
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    got = q("retrieval_rrf_fusion")
    for qid in range(10):
        qv = X[emb.vec_id.to_numpy() == qid][0]
        mask = ids != qid
        cand, C = ids[mask], X[mask]
        dots = C @ qv
        cn = np.linalg.norm(C, axis=1) * np.linalg.norm(qv)
        cos = np.where(cn == 0, 0.0, dots / np.where(cn == 0, 1, cn))
        l2sq = (C * C).sum(axis=1) - 2 * dots + qv @ qv
        ra = _ranked(cos, cand, descending=True)
        rb = _ranked(l2sq, cand, descending=False)
        rrf = np.where(ra <= 20, 1.0 / (60 + ra), 0.0) + np.where(
            rb <= 20, 1.0 / (60 + rb), 0.0
        )
        keep = rrf > 0
        order = np.lexsort((cand[keep], -rrf[keep]))
        top = cand[keep][order][:10]
        scores = rrf[keep][order][:10]
        g = got[got.query_id == qid].sort_values("fused_rank")
        assert list(g.vec_id) == list(top)
        assert np.allclose(g.rrf_score, scores, atol=2e-9)


def test_hard_negatives_matches_triplet_model(q, emb):
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    got = q("emb_hard_negatives").set_index("anchor_id")
    for aid in range(10):
        a_idx = np.flatnonzero(ids == aid)[0]
        qv, a_label = X[a_idx], labels[a_idx]
        mask = ids != aid
        cand, C, lab = ids[mask], X[mask], labels[mask]
        dots = C @ qv
        cn = np.linalg.norm(C, axis=1) * np.linalg.norm(qv)
        cos = np.where(cn == 0, 0.0, dots / np.where(cn == 0, 1, cn))

        def best(sel):
            k = np.lexsort((cand[sel], -cos[sel]))
            return cand[sel][k[0]], cos[sel][k[0]]

        pos_id, cos_pos = best(lab == a_label)
        neg_id, cos_neg = best(lab != a_label)
        g = got.loc[aid]
        assert g["anchor_label"] == a_label
        assert g["pos_id"] == pos_id and g["neg_id"] == neg_id
        assert g["cos_pos"] == pytest.approx(cos_pos, abs=2e-6)
        assert g["cos_neg"] == pytest.approx(cos_neg, abs=2e-6)
        assert g["margin"] == pytest.approx(cos_pos - cos_neg, abs=4e-6)


def test_simpson_diversity_matches_textbook(q, documents):
    got = q("source_simpson_diversity").set_index("source")
    for source, grp in documents.groupby("source"):
        toks = pd.Series(
            [t for txt in grp.text for t in txt.split() if t != ""]
        )
        c = toks.value_counts().to_numpy()
        n = int(c.sum())
        m = int((c * (c - 1)).sum())
        g = got.loc[source]
        assert g["n_tokens"] == n and g["n_types"] == len(c)
        if m == 0:
            assert pd.isna(g["simpson_d"])
        else:
            assert g["simpson_d"] == pytest.approx(
                m / (n * (n - 1)), rel=1e-12
            )
            assert g["eff_types"] == pytest.approx(
                n * (n - 1) / m, rel=1e-12
            )


def test_seasonal_decompose_matches_definitions(q, orders):
    o = orders.copy()
    o["day"] = o.o_orderdate.dt.floor("D")
    o["cents"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    daily = o.groupby("day")["cents"].sum().sort_index()
    dn = (daily.index - pd.Timestamp("1990-01-01")).days.to_numpy()
    x = daily.to_numpy()
    # gap-aware centered +-3-day RANGE trend
    trend = np.array(
        [
            x[(dn >= d - 3) & (dn <= d + 3)].mean()
            for d in dn
        ]
    )
    dow = dn % 7
    dow_mean = {d: x[dow == d].mean() for d in np.unique(dow)}
    grand = x.mean()
    seasonal = np.array([dow_mean[d] - grand for d in dow])
    got = q("orders_seasonal_decompose").set_index("day").sort_index()
    assert len(got) == len(daily)
    gv = got.reindex(daily.index)
    assert np.allclose(gv.revenue, x / 100, atol=1e-9)
    assert np.allclose(gv.trend, trend / 100, atol=2e-6)
    assert np.allclose(gv.seasonal, seasonal / 100, atol=2e-6)
    assert np.allclose(
        gv.residual, (x - trend - seasonal) / 100, atol=4e-6
    )
    # decomposition identity: components sum back to the observation
    assert np.allclose(
        gv.trend + gv.seasonal + gv.residual, gv.revenue, atol=1e-5
    )


def test_exact_quantiles_are_nearest_rank(q, lineitem):
    cents = (
        (lineitem.l_extendedprice.round(2) * 100).round().astype("int64")
    )
    s = np.sort(cents.to_numpy())
    n = len(s)
    got = q("lineitem_exact_quantiles").set_index("pct")
    for pct in (25, 50, 75, 90, 99):
        rk = int(np.floor((pct * n + 99) / 100.0))  # ceil(pct*n/100)
        assert got.loc[pct, "value"] == pytest.approx(
            s[rk - 1] / 100, abs=1e-9
        )
    # nearest-rank p50 must be an actual data value >= the lower median
    assert int(round(got.loc[50, "value"] * 100)) in s
    assert got.loc[50, "value"] >= np.percentile(s, 50, method="lower") / 100


def test_k_anonymity_matches_sweeney(q, customer):
    g = customer.groupby(
        [
            "c_nationkey",
            "c_mktsegment",
            np.floor(customer.c_acctbal / 1000).astype("int64"),
        ]
    ).size()
    got = q("privacy_k_anonymity").iloc[0]
    assert got["n_groups"] == len(g)
    assert got["k_anonymity"] == int(g.min())
    assert got["n_violating_groups"] == int((g < 5).sum())
    assert got["n_rows_at_risk"] == int(g[g < 5].sum())
