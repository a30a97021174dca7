"""Second independent-semantics sweep: the round-4/5 statistics family
recomputed from parquet with plain pandas/numpy (textbook definitions,
not the SQL) — the cross-engine oracle proves agreement, these prove
the agreed-on formula is right (the check that caught the PageRank
dangling-mass bug in test_stats_semantics.py)."""

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
def orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_gini_matches_textbook(q, orders):
    cents = (
        (orders["o_totalprice"].round(2) * 100)
        .round()
        .astype("int64")
        .groupby(orders["o_custkey"])
        .sum()
    )
    x = np.sort(cents.to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    g_ref = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    row = q("orders_gini_coefficient").iloc[0]
    assert row["n_customers"] == n
    assert abs(row["gini"] - g_ref) < 2e-6


def test_hhi_matches_textbook(q):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pa = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(pa, left_on="l_partkey", right_on="p_partkey")
    j["rev"] = j["l_extendedprice"].round(2) * (1 - j["l_discount"].round(2))
    got = {r["p_type"]: r for _, r in q("supplier_hhi_by_part_type").iterrows()}
    for ptype, grp in j.groupby("p_type"):
        rc = np.floor(
            grp.groupby("l_suppkey")["rev"].sum().to_numpy() * 100 + 0.5
        )
        hhi_ref = (rc**2).sum() / rc.sum() ** 2
        assert got[ptype]["n_suppliers"] == len(rc)
        assert abs(got[ptype]["hhi"] - hhi_ref) < 2e-6, ptype


def test_benford_matches_textbook(q, orders):
    d = orders["o_totalprice"].astype(str).str.lstrip("0.").str[0].astype(int)
    n = len(d)
    got = {int(r["digit"]): r for _, r in q("stats_benford_check").iterrows()}
    for digit in range(1, 10):
        obs = (d == digit).sum() / n
        exp = np.log10(1 + 1 / digit)
        assert abs(got[digit]["observed_frac"] - obs) < 2e-6, digit
        assert abs(got[digit]["benford_frac"] - exp) < 2e-6, digit
        chi = n * (obs - exp) ** 2 / exp
        assert got[digit]["chi2_contribution"] == pytest.approx(
            chi, rel=1e-3, abs=2e-4
        ), digit


def test_ols_matches_numpy(q):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pa = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(pa, left_on="l_partkey", right_on="p_partkey")
    got = {r["p_brand"]: r for _, r in q("lineitem_price_qty_ols").iterrows()}
    for brand in list(got)[:5]:
        grp = j[j["p_brand"] == brand]
        x = grp["l_quantity"].round().to_numpy(dtype=float)
        y = grp["l_extendedprice"].round(2).to_numpy(dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert got[brand]["slope_per_unit"] == pytest.approx(
            slope, rel=1e-4
        ), brand
        assert got[brand]["intercept"] == pytest.approx(
            intercept, rel=1e-3
        ), brand


def test_entropy_rate_matches_textbook(q):
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    prev = ev.groupby("user_id")["event_type"].shift(1)
    t = pd.DataFrame(
        {"prev": prev, "cur": ev["event_type"]}
    ).dropna()
    counts = t.groupby(["prev", "cur"]).size()
    n_from = counts.groupby(level=0).sum()
    rate_ref = 0.0
    for state in n_from.index:
        p = counts[state] / n_from[state]
        h = -(p * np.log2(p)).sum()
        rate_ref += (n_from[state] / n_from.sum()) * h
    out = q("events_entropy_rate")
    assert out["entropy_rate_bits"].iloc[0] == pytest.approx(
        rate_ref, abs=2e-6
    )


def test_runs_test_matches_textbook(q, orders):
    o = orders.copy()
    o["day"] = o["o_orderdate"].dt.floor("D")
    s = (
        (o["o_totalprice"].round(2) * 100)
        .round()
        .astype("int64")
        .groupby(o["day"])
        .sum()
        .sort_index()
    )
    x = s.to_numpy()
    med = np.sort(x)[(len(x) + 1) // 2 - 1]
    x = x[x != med]  # ties at the median drop (standard W-W treatment)
    above = x > med
    n1, n2 = int(above.sum()), int((~above).sum())
    runs = 1 + int((above[1:] != above[:-1]).sum())
    n = n1 + n2
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n**2 * (n - 1))
    z_ref = (runs - mu) / np.sqrt(var)
    row = q("orders_runs_test").iloc[0]
    assert (row["n_above"], row["n_below"], row["n_runs"]) == (n1, n2, runs)
    assert abs(row["z_stat"] - z_ref) < 2e-6


def test_zipf_fit_matches_numpy(q):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(w for w in re.split(r"\s+", t) if w)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    y = np.log([v for _, v in top])
    x = np.log(np.arange(1, len(top) + 1))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    row = q("text_zipf_fit").iloc[0]
    assert row["n_types"] == len(top)
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-4)
    assert row["zipf_intercept"] == pytest.approx(intercept, abs=1e-4)
    assert row["r2"] == pytest.approx(r2, abs=1e-4)


def test_ewma_matches_direct_weighting(q, orders):
    o = orders.copy()
    o["day"] = o["o_orderdate"].dt.floor("D")
    s = (
        (o["o_totalprice"].round(2) * 100)
        .round()
        .astype("int64")
        .groupby(o["day"])
        .sum()
        .sort_index()
    )
    w = [round(0.7**k * 1e4) for k in range(15)]
    out = q("orders_revenue_ewma").set_index("day")["ewma_14d"]
    for day in list(s.index)[40:43]:
        num = den = 0
        for k in range(15):
            d = day - pd.Timedelta(days=k)
            if d in s.index:
                num += s[d] * w[k]
                den += w[k]
        ref = num / den / 100  # cents -> dollars
        assert out[day] == pytest.approx(ref, abs=2e-4), day


def test_km_survival_matches_textbook(q):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    last = pd.to_datetime(ev["ts"]).dt.floor("D").groupby(ev["user_id"]).max()
    mx = last.max()
    churned = last < mx - pd.Timedelta(days=2)
    days = sorted(last.unique())
    s = 1.0
    ref = {}
    for d in days:
        at_risk = int((last >= d).sum())
        d_churn = int(((last == d) & churned).sum())
        d_cens = int(((last == d) & ~churned).sum())
        if at_risk > 0:
            s *= 1 - d_churn / at_risk
        ref[pd.Timestamp(d)] = (at_risk, d_churn, d_cens, s)
    out = q("events_km_survival")
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        at_risk, d_churn, d_cens, s = ref[pd.Timestamp(r["day"])]
        assert (r["n_at_risk"], r["n_churned"], r["n_censored"]) == (
            at_risk, d_churn, d_cens,
        ), r["day"]
        assert abs(r["survival"] - s) < 2e-6, r["day"]


def test_wilson_ci_matches_textbook(q):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pa = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(pa, left_on="l_partkey", right_on="p_partkey")
    got = {r["p_brand"]: r for _, r in q("returns_wilson_ci").iterrows()}
    z = 1.959963985
    for brand in list(got)[:5]:
        grp = j[j["p_brand"] == brand]
        n = len(grp)
        r = int((grp["l_returnflag"] == "R").sum())
        ph = r / n
        denom = 1 + z * z / n
        center = ph + z * z / (2 * n)
        half = z * np.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
        lo, hi = (center - half) / denom, (center + half) / denom
        assert got[brand]["n_lines"] == n and got[brand]["n_returned"] == r
        assert abs(got[brand]["wilson_low"] - lo) < 2e-6, brand
        assert abs(got[brand]["wilson_high"] - hi) < 2e-6, brand


def test_js_matrix_matches_textbook(q):
    import hashlib
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    buckets = {}
    for src, grp in docs.groupby("source"):
        c = np.zeros(128)
        for t in grp["text"]:
            for w in re.split(r"\s+", t):
                if w:
                    h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                    c[h % 128] += 1
        buckets[src] = c
    out = q("source_js_matrix")
    for _, r in out.head(12).iterrows():
        ca, cb = buckets[r["source_a"]], buckets[r["source_b"]]
        p = (ca + 1) / (ca.sum() + 128)
        qd = (cb + 1) / (cb.sum() + 128)
        m = (p + qd) / 2
        js = 0.5 * (p * np.log(p / m)).sum() + 0.5 * (qd * np.log(qd / m)).sum()
        assert abs(r["js_divergence"] - js) < 2e-6, (r["source_a"], r["source_b"])


def test_mrr_ndcg_matches_textbook(spark):
    # sf0.01: the tiny sf0.001 corpus has zero relevant-in-top-5 rows,
    # which would vacuously pass
    from slipstream_async_spark.plans.catalog import _QUERIES

    sf = "/root/testdata/sf0.01"
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    out = _QUERIES["retrieval_mrr_ndcg"](spark, sf).toPandas()
    got = {int(r["query_id"]): r for _, r in out.iterrows()}
    nonzero = 0
    for qi in range(10):
        i = int(np.where(ids == qi)[0][0])
        cos = mat @ mat[i] / (norms * norms[i])
        order = sorted(
            (j for j in range(len(ids)) if ids[j] != qi),
            key=lambda j: (-cos[j], ids[j]),
        )[:5]
        rel = [1 if labels[j] == labels[i] else 0 for j in order]
        mrr = next((1 / (k + 1) for k, v in enumerate(rel) if v), 0.0)
        dcg = sum(v / np.log2(k + 2) for k, v in enumerate(rel))
        n_lab = int((labels == labels[i]).sum()) - 1
        idcg = sum(1 / np.log2(k + 2) for k in range(min(5, n_lab)))
        ndcg = dcg / idcg if idcg else 0.0
        r = got[qi]
        assert r["n_rel_at_5"] == sum(rel), qi
        assert abs(r["mrr"] - mrr) < 2e-6, qi
        assert abs(r["ndcg_at_5"] - ndcg) < 2e-6, qi
        nonzero += sum(rel)
    assert nonzero > 0  # the comparison exercised real relevance


def test_heaps_beta_matches_numpy(q):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    out = {r["source"]: r for _, r in q("heaps_law_fit").iterrows()}
    for src in list(out)[:4]:
        grp = docs[docs.source == src]
        seen: set = set()
        xs, ys = [], []
        big_n = 0
        for _, row in grp.iterrows():
            toks = [w for w in re.split(r"\s+", row["text"]) if w]
            big_n += len(toks)
            seen |= set(toks)
            if big_n > 0 and len(seen) > 0:
                xs.append(np.log(big_n))
                ys.append(np.log(len(seen)))
        beta = np.polyfit(xs, ys, 1)[0]
        r = out[src]
        assert r["total_tokens"] == big_n and r["vocab_size"] == len(seen)
        assert r["heaps_beta"] == pytest.approx(beta, abs=1e-4), src


def test_price_index_is_laspeyres(q):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["yr"] = li["l_shipdate"].dt.year
    py = (
        li.assign(unit=li["l_extendedprice"] / li["l_quantity"])
        .groupby(["l_partkey", "yr"])
        .agg(p=("unit", "mean"), q=("l_quantity", "sum"))
        .reset_index()
    )
    base = py[py.yr == 1995].set_index("l_partkey")[["p", "q"]]
    got = {int(r["yr"]): r for _, r in q("price_index_yoy").iterrows()}
    for yr in sorted(got):
        cur = py[(py.yr == yr)].set_index("l_partkey")
        common = cur.index.intersection(base.index)
        idx = (cur.loc[common, "p"] * base.loc[common, "q"]).sum() / (
            base.loc[common, "p"] * base.loc[common, "q"]
        ).sum()
        assert got[yr]["n_parts"] == len(common)
        assert got[yr]["laspeyres_index"] == pytest.approx(idx, abs=2e-6), yr


def test_backlog_matches_bruteforce(q):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    close = (
        li.groupby("l_orderkey")["l_shipdate"].max().dt.floor("D")
    )
    o = od.set_index("o_orderkey")
    o["open_day"] = o["o_orderdate"].dt.floor("D")
    o = o.join(close.rename("close_day"), how="inner")
    # ships-before-ordered anomalies clamp to open-for-one-day
    o["close_day"] = o[["close_day", "open_day"]].max(axis=1)
    out = q("orders_backlog_daily")
    # spot-check 5 reported days against a direct interval count
    for _, r in out.iloc[[0, len(out) // 4, len(out) // 2,
                          3 * len(out) // 4, -1]].iterrows():
        d = pd.Timestamp(r["day"])
        ref = int(((o["open_day"] <= d) & (o["close_day"] >= d)).sum())
        assert r["open_orders"] == ref, d


def test_ttr_mattr_matches_definition(q):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    out = q("text_ttr_mattr").set_index("doc_id")
    for doc_id in list(out.index)[:5]:
        toks = [
            w
            for w in re.split(
                r"\s+", docs.set_index("doc_id").loc[doc_id, "text"]
            )
            if w
        ]
        n = len(toks)
        ttr = len(set(toks)) / n
        if n >= 50:
            wins = [
                len(set(toks[i : i + 50])) / 50 for i in range(n - 49)
            ]
            mattr = float(np.mean(wins))
        else:
            mattr = ttr
        r = out.loc[doc_id]
        assert r["n_tokens"] == n
        assert abs(r["ttr"] - ttr) < 2e-6
        assert abs(r["mattr_50"] - mattr) < 2e-6, doc_id


def test_temperature_mix_matches_formula(q):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = docs["text"].map(
        lambda t: len([w for w in re.split(r"\s+", t) if w])
    )
    per = toks.groupby(docs["source"]).sum()
    wa = per**0.5
    out = {r["source"]: r for _, r in q("mix_temperature_weights").iterrows()}
    for src in per.index:
        w_ref = wa[src] / wa.sum()
        r = out[src]
        assert r["tokens"] == per[src], src
        assert r["weight"] == pytest.approx(w_ref, abs=2e-6), src
        assert r["epochs"] == pytest.approx(
            1_000_000_000 * w_ref / per[src], rel=1e-5
        ), src


def test_readability_matches_flesch(q):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")
    out = q("text_readability").set_index("doc_id")
    for doc_id in list(out.index)[:5]:
        t = docs.loc[doc_id, "text"]
        words = len([w for w in re.split(r"\s+", t) if w])
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syls = max(len(re.findall(r"[aeiouy]+", t.lower())), 1)
        flesch = 206.835 - 1.015 * words / sents - 84.6 * syls / words
        r = out.loc[doc_id]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            words, sents, syls,
        ), doc_id
        assert r["flesch_score"] == pytest.approx(flesch, abs=2e-6), doc_id


def test_dau_wau_matches_bruteforce(q):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    out = q("events_dau_wau").sort_values("day")
    act = ev.groupby("day")["user_id"].apply(set).sort_index()
    for _, r in out.iloc[[7, len(out) // 2, -1]].iterrows():
        d = pd.Timestamp(r["day"])
        dau_ref = len(act.get(d, set()))
        wau_users: set = set()
        for k in range(7):
            wau_users |= act.get(d - pd.Timedelta(days=k), set())
        assert r["dau"] == dau_ref, d
        assert r["wau"] == len(wau_users), d
        assert r["stickiness"] == pytest.approx(
            dau_ref / len(wau_users), abs=2e-6
        ), d
