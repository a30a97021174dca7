"""Seventh independent-semantics sweep: the round-7 embedding-space
health family recomputed with plain numpy textbook formulas (the oracle
gate proves cross-engine agreement; these prove the agreed-on formula —
the technique that caught the PageRank dangling-mass bug)."""

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
def emb():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(df.embedding.to_numpy()).astype(np.float64)
    return df.vec_id.to_numpy(), df.label.to_numpy(), X


def _micro(x):
    return np.floor(x * 1_000_000 + 0.5)


def test_norm_profile_matches_numpy(q, emb):
    vec_id, label, X = emb
    nq = _micro(np.sqrt((X * X).sum(axis=1)))  # exact integer micro units
    got = q("emb_norm_profile").set_index("label")
    for lb in np.unique(label):
        v = nq[label == lb]
        n = len(v)
        g = got.loc[int(lb)]
        assert g["n_vectors"] == n
        assert g["mean_norm"] == pytest.approx(
            np.floor(v.sum() / n + 0.5) / 1e6, abs=2e-6
        )
        std = np.sqrt((n * (v * v).sum() - v.sum() ** 2) / (n * (n - 1)))
        assert g["std_norm"] == pytest.approx(
            np.floor(std + 0.5) / 1e6, abs=2e-6
        )
        assert g["min_norm"] == pytest.approx(v.min() / 1e6, abs=2e-6)
        assert g["max_norm"] == pytest.approx(v.max() / 1e6, abs=2e-6)


def test_pair_cosine_histogram_matches_numpy(q, emb):
    vec_id, label, X = emb
    order = np.argsort(vec_id)
    ids, Xs = vec_id[order], X[order]
    # consecutive-id equi-pairs (vec_id, vec_id + 1)
    nxt = {i: j for j, i in enumerate(ids)}
    cos = []
    for j, i in enumerate(ids):
        k = nxt.get(i + 1)
        if k is None:
            continue
        a, b = Xs[j], Xs[k]
        d = np.sqrt(a @ a) * np.sqrt(b @ b)
        cos.append(0.0 if d == 0 else (a @ b) / d)
    buckets = np.minimum(np.floor((np.asarray(cos) + 1) * 10), 19).astype(int)
    want = pd.Series(buckets).value_counts().sort_index()
    got = q("emb_pair_cosine_histogram").set_index("bucket").sort_index()
    assert got["n_pairs"].to_dict() == {
        int(b): int(n) for b, n in want.items()
    }
    for b, row in got.iterrows():
        assert row["cos_lo"] == pytest.approx(b / 10 - 1, abs=2e-6)
        assert row["cos_hi"] == pytest.approx((b + 1) / 10 - 1, abs=2e-6)
    # the null distribution must actually concentrate (sanity: the
    # modal bucket holds a plurality, not a uniform spread)
    assert want.max() > want.sum() / len(want)


def _centroids(label, X):
    return {lb: X[label == lb].mean(axis=0) for lb in np.unique(label)}


def test_centroid_confusion_matches_numpy(q, emb):
    vec_id, label, X = emb
    cents = _centroids(label, X)
    labs = sorted(cents)
    C = np.stack([cents[lb] for lb in labs])
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    pred = np.array([labs[j] for j in d2.argmin(axis=1)])  # ties: label asc
    want: dict[tuple[int, int], int] = {}
    for t, p in zip(label, pred):
        want[(int(t), int(p))] = want.get((int(t), int(p)), 0) + 1
    got = q("emb_centroid_confusion")
    got_map = {
        (int(r.label), int(r.predicted)): int(r.n) for r in got.itertuples()
    }
    assert got_map == want
    # sanity: the diagonal carries more mass than chance would give it
    # (the synthetic table is weakly clustered — 183/500 diagonal at
    # sf0.001 — so assert better-than-uniform, not dominance)
    diag = sum(n for (t, p), n in want.items() if t == p)
    assert diag > sum(want.values()) / len(labs)


def test_silhouette_centroid_matches_numpy(q, emb):
    vec_id, label, X = emb
    cents = _centroids(label, X)
    labs = sorted(cents)
    C = np.stack([cents[lb] for lb in labs])
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab_idx = {lb: i for i, lb in enumerate(labs)}
    own = np.array([d2[i, lab_idx[lb]] for i, lb in enumerate(label)])
    other = d2.copy()
    for i, lb in enumerate(label):
        other[i, lab_idx[lb]] = np.inf
    a = np.sqrt(own)
    b = np.sqrt(other.min(axis=1))
    sq = _micro((b - a) / np.maximum(a, b))
    got = q("emb_silhouette_centroid").set_index("label")
    for lb in labs:
        v = sq[label == lb]
        g = got.loc[int(lb)]
        assert g["n_vectors"] == len(v)
        assert g["mean_silhouette"] == pytest.approx(
            np.floor(v.sum() / len(v) + 0.5) / 1e6, abs=2e-6
        )
        assert g["n_negative"] == int((v < 0).sum())
