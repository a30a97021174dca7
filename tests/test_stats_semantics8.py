"""Eighth independent-semantics sweep: the round-8 time-series,
behavioral, and robust-stat families recomputed with plain pandas/numpy
textbook formulas (the oracle gate proves cross-engine agreement; these
prove the agreed-on formula)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
EPOCH = np.datetime64("1990-01-01")


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
def events():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def documents():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _daily_cents(orders):
    day_no = (
        orders.o_orderdate.values.astype("datetime64[D]") - EPOCH
    ).astype(int)
    cents = (
        (orders.o_totalprice * 100).round().astype(np.int64)
    )
    g = pd.DataFrame({"day_no": day_no, "cents": cents}).groupby("day_no")
    return g.cents.sum(), g.size()


def _pair_rho(x: pd.Series, lag: int) -> float:
    """Gap-correct calendar-paired Pearson at a lag, micro-quantized —
    the engines' shared ACF definition."""
    t = x.index.to_numpy()
    vals = dict(zip(t, x.to_numpy(dtype=float)))
    pairs = [(vals[d], vals[d - lag]) for d in t if d - lag in vals]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    n = len(a)
    num = n * (a * b).sum() - a.sum() * b.sum()
    den = np.sqrt(
        (n * (a * a).sum() - a.sum() ** 2)
        * (n * (b * b).sum() - b.sum() ** 2)
    )
    return np.floor(num / den * 1e6 + 0.5) / 1e6


def test_ljung_box_matches_numpy(q, orders):
    x, _ = _daily_cents(orders)
    n = len(x)
    acc = sum(_pair_rho(x, k) ** 2 / (n - k) for k in range(1, 6))
    got = q("stats_ljung_box").iloc[0]
    assert got["n_days"] == n
    assert got["q_stat"] == pytest.approx(n * (n + 2) * acc, abs=2e-5)
    assert got["reject_095"] == (n * (n + 2) * acc > 11.070497693516351)


def test_pacf_matches_durbin_levinson(q, orders):
    x, _ = _daily_cents(orders)
    r1, r2, r3 = (_pair_rho(x, k) for k in (1, 2, 3))
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - phi22)
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    got = q("orders_partial_autocorr").set_index("lag")
    assert got.loc[1, "pacf"] == pytest.approx(r1, abs=2e-6)
    assert got.loc[2, "pacf"] == pytest.approx(phi22, abs=2e-6)
    assert got.loc[3, "pacf"] == pytest.approx(phi33, abs=2e-6)


def test_kendall_tau_matches_scipy_formula(q, orders):
    x, c = _daily_cents(orders)
    df = pd.DataFrame({"c": c, "x": x}).sort_index()
    cc = df.c.to_numpy()
    xx = df.x.to_numpy()
    n = len(df)
    nc = nd = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = np.sign(cc[j] - cc[i])
            dy = np.sign(xx[j] - xx[i])
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / np.sqrt((n0 - n1) * (n0 - n2))
    got = q("stats_kendall_tau_daily").iloc[0]
    assert got["n_pairs"] == n0
    assert got["concordant"] == nc and got["discordant"] == nd
    assert got["tau_b"] == pytest.approx(tau, abs=2e-6)


def test_sign_test_matches_binomial(q, orders):
    month_no = (
        orders.o_orderdate.dt.year - 1990
    ) * 12 + orders.o_orderdate.dt.month - 1
    cents = (orders.o_totalprice * 100).round().astype(np.int64)
    m = pd.DataFrame({"m": month_no, "c": cents}).groupby("m").c.sum()
    up = down = 0
    for k in m.index:
        if k - 1 in m.index:
            if m[k] > m[k - 1]:
                up += 1
            elif m[k] < m[k - 1]:
                down += 1
    got = q("stats_sign_test_monthly").iloc[0]
    assert got["n_up"] == up and got["n_down"] == down
    assert got["z_stat"] == pytest.approx(
        (up - down) / np.sqrt(up + down), abs=2e-6
    )


def test_huber_mean_matches_irls(q, orders):
    x, _ = _daily_cents(orders)
    v = x.to_numpy(dtype=float)
    n = len(v)
    mu = v.mean()
    k = 1.345 * np.sqrt(
        (n * (v * v).sum() - v.sum() ** 2) / (n * (n - 1))
    )
    mu0 = mu
    for _ in range(3):
        d = np.abs(v - mu)
        wq = np.where(d <= k, 1e6, np.floor(k / d * 1e6 + 0.5))
        mu = (wq * v).sum() / wq.sum()
    got = q("stats_huber_mean_daily").iloc[0]
    assert got["n_days"] == n
    assert got["plain_mean"] == pytest.approx(mu0 / 100, abs=0.02)
    assert got["huber_mean"] == pytest.approx(mu / 100, abs=0.02)


def test_char_entropy_matches_numpy(q, documents):
    got = q("text_char_entropy").set_index("source")
    for src, grp in documents.groupby("source"):
        counts = pd.Series(list("".join(grp.text))).value_counts()
        n = counts.sum()
        p = counts / n
        h = -(p * np.log(p)).sum() / np.log(2)
        g = got.loc[src]
        assert g["n_chars"] == n
        assert g["n_distinct_chars"] == len(counts)
        assert g["entropy_bits"] == pytest.approx(h, abs=2e-6)
        assert g["entropy_normalized"] == pytest.approx(
            h / np.log2(len(counts)), abs=2e-6
        )


def test_retention_cohort_matches_pandas(q, events):
    week = (
        (events.ts.values.astype("datetime64[D]") - EPOCH).astype(int) // 7
    )
    act = pd.DataFrame(
        {"u": events.user_id, "w": week}
    ).drop_duplicates()
    first = act.groupby("u").w.min().rename("cw")
    j = act.join(first, on="u")
    tri = (
        j.assign(off=j.w - j.cw)
        .groupby(["cw", "off"])
        .size()
        .rename("n")
        .reset_index()
    )
    base = tri[tri.off == 0].set_index("cw").n
    got = q("events_retention_cohort")
    for r in got.itertuples():
        want = tri[(tri.cw == r.cohort_week) & (tri.off == r.week_offset)]
        assert int(want.n.iloc[0]) == r.n_users
        assert r.cohort_size == int(base[r.cohort_week])
        assert r.retention == pytest.approx(
            r.n_users / base[r.cohort_week], abs=2e-6
        )
    assert len(got) == len(tri)


def test_session_stats_matches_pandas(q, events):
    df = events.sort_values(["user_id", "ts", "event_id"])
    us = df.ts.values.astype("datetime64[us]").astype(np.int64)
    new_s = np.ones(len(df), dtype=int)
    uid = df.user_id.to_numpy()
    for i in range(1, len(df)):
        if uid[i] == uid[i - 1] and us[i] - us[i - 1] <= 1_800_000_000:
            new_s[i] = 0
    sess = pd.DataFrame(
        {"u": uid, "us": us, "sid": np.cumsum(new_s)}
    )
    per = sess.groupby("sid").agg(
        n_ev=("us", "size"), dur=("us", lambda s: s.max() - s.min())
    )
    got = q("events_session_stats").iloc[0]
    assert got["n_sessions"] == len(per)
    assert got["n_events"] == len(df)
    assert got["events_per_session"] == pytest.approx(
        len(df) / len(per), abs=2e-6
    )
    assert got["mean_duration_secs"] == pytest.approx(
        per.dur.sum() / len(per) / 1e6, abs=2e-6
    )
    assert got["max_session_events"] == per.n_ev.max()
    assert got["n_bounce_sessions"] == int((per.n_ev == 1).sum())


def test_abc_classes_match_pandas(q, orders):
    cents = (orders.o_totalprice * 100).round().astype(np.int64)
    cust = (
        pd.DataFrame({"k": orders.o_custkey, "c": cents})
        .groupby("k")
        .c.sum()
        .reset_index()
        .sort_values(["c", "k"], ascending=[False, True])
    )
    cum = cust.c.cumsum()
    total = cust.c.sum()
    cls = np.where(
        cum * 100 <= total * 80, "A", np.where(cum * 100 <= total * 95, "B", "C")
    )
    want = (
        pd.DataFrame({"cls": cls, "c": cust.c.to_numpy()})
        .groupby("cls")
        .agg(n=("c", "size"), rev=("c", "sum"))
    )
    got = q("orders_abc_class").set_index("abc_class")
    for k in want.index:
        assert got.loc[k, "n_customers"] == want.loc[k, "n"]
        assert got.loc[k, "revenue"] == pytest.approx(
            want.loc[k, "rev"] / 100, abs=0.02
        )
        assert got.loc[k, "revenue_share"] == pytest.approx(
            want.loc[k, "rev"] / total, abs=2e-6
        )


def test_covariance_offdiag_matches_numpy(q):
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(df.embedding.to_numpy()).astype(np.float64)
    Xq = np.floor(X * 1e6 + 0.5)  # the engines' micro-quantized elements
    n, d = Xq.shape
    s = Xq.sum(axis=0)
    qd = (Xq * Xq).sum(axis=0)
    cqs = []
    mx = 0.0
    for i in range(d):
        for j in range(i + 1, d):
            qij = (Xq[:, i] * Xq[:, j]).sum()
            corr = abs(
                (n * qij - s[i] * s[j])
                / np.sqrt((n * qd[i] - s[i] ** 2) * (n * qd[j] - s[j] ** 2))
            )
            cq = np.floor(corr * 1e6 + 0.5)
            cqs.append(cq)
            mx = max(mx, cq)
    got = q("emb_covariance_offdiag").iloc[0]
    assert got["n_dims"] == d
    assert got["n_pairs"] == d * (d - 1) // 2
    assert got["mean_abs_offdiag_corr"] == pytest.approx(
        np.floor(np.mean(cqs) + 0.5) / 1e6, abs=2e-6
    )
    assert got["max_abs_offdiag_corr"] == pytest.approx(mx / 1e6, abs=2e-6)


def test_chow_test_matches_numpy(q, orders):
    x, _ = _daily_cents(orders)
    df = x.sort_index()
    dn = df.index.to_numpy(dtype=float)
    y = df.to_numpy(dtype=float)
    m = (dn.min() + dn.max()) // 2

    def ssr(mask):
        xs, ys = dn[mask], y[mask]
        n = len(xs)
        num = n * (xs * ys).sum() - xs.sum() * ys.sum()
        den = n * (xs * xs).sum() - xs.sum() ** 2
        return ((n * (ys * ys).sum() - ys.sum() ** 2) - num * num / den) / n

    s1 = ssr(dn <= m)
    s2 = ssr(dn > m)
    sp = ssr(np.ones_like(dn, dtype=bool))
    n = len(dn)
    f = (sp - s1 - s2) / 2 / ((s1 + s2) / (n - 4))
    got = q("stats_chow_test").iloc[0]
    assert got["n_days"] == n and got["split_day"] == m
    assert got["f_stat"] == pytest.approx(f, abs=2e-4)
    assert got["reject_095"] == (f > 2.995732273553991)


def test_migration_matrix_matches_pandas(q, orders):
    dn = (
        orders.o_orderdate.values.astype("datetime64[D]") - EPOCH
    ).astype(int)
    m = (dn.min() + dn.max()) // 2
    cents = (orders.o_totalprice * 100).round().astype(np.int64)
    d = pd.DataFrame(
        {
            "k": orders.o_custkey,
            "p": np.where(dn <= m, 1, 2),
            "c": cents,
        }
    )
    spend = d.groupby(["k", "p"]).c.sum().reset_index()

    def quart(p):
        s = spend[spend.p == p].sort_values(["c", "k"]).reset_index(drop=True)
        n = len(s)
        qn, rem = divmod(n, 4)
        ranks = np.arange(1, n + 1)
        head = (qn + 1) * rem
        tile = np.where(
            ranks <= head,
            (ranks - 1) // (qn + 1) + 1,
            rem + (ranks - head - 1) // qn + 1,
        )
        return dict(zip(s.k, tile))

    q1, q2 = quart(1), quart(2)
    want: dict[tuple[int, int], int] = {}
    for k in set(q1) | set(q2):
        cell = (q1.get(k, 0), q2.get(k, 0))
        want[cell] = want.get(cell, 0) + 1
    got = {
        (int(r.q_early), int(r.q_late)): int(r.n_customers)
        for r in q("customer_migration_matrix").itertuples()
    }
    assert got == want


def test_friedman_matches_numpy(q, orders):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    j = li.merge(
        orders[["o_orderkey", "o_orderpriority", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    lag = (
        j.l_shipdate.values.astype("datetime64[D]")
        - j.o_orderdate.values.astype("datetime64[D]")
    ).astype(int)
    block = (
        j.o_orderdate.dt.year - 1990
    ) * 12 + j.o_orderdate.dt.month - 1
    cell = (
        pd.DataFrame({"b": block, "t": j.o_orderpriority, "v": lag})
        .groupby(["b", "t"])
        .v.agg(["sum", "size"])
    )
    mq = np.floor(cell["sum"] / cell["size"] * 1e6 + 0.5).rename("mq")
    tbl = mq.reset_index()
    complete = tbl.groupby("b").size()
    blocks = complete[complete == 5].index
    tbl = tbl[tbl.b.isin(blocks)]
    rj: dict[str, float] = {}
    for b, grp in tbl.groupby("b"):
        vals = grp.mq.to_numpy()
        for t, v in zip(grp.t, vals):
            rank = 1 + (vals < v).sum() + ((vals == v).sum() - 1) / 2.0
            rj[t] = rj.get(t, 0.0) + rank
    n, k = len(blocks), len(rj)
    sr2 = sum(r * r for r in rj.values())
    chi2 = 12.0 / (n * k * (k + 1)) * sr2 - 3 * n * (k + 1)
    got = q("stats_friedman_test").iloc[0]
    assert got["n_blocks"] == n and got["n_treatments"] == k
    assert got["chi2_stat"] == pytest.approx(chi2, abs=2e-6)
    assert got["reject_095"] == (chi2 > 9.487729036781154)
