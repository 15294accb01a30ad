"""Distributed full-batch logistic regression (functions/classifier.py):
reference-exactness, determinism, and separability."""

import numpy as np
import pyarrow as pa
import ray

from web3research_etl_ray.functions.classifier import (
    logreg_loss,
    logreg_score,
    logreg_train,
)


def _fixture(n=600, d=16, seed=9):
    rng = np.random.default_rng(seed)
    y = (rng.uniform(size=n) < 0.5).astype(np.float64)
    X = rng.normal(size=(n, d))
    X[:, 0] += 3.0 * (2 * y - 1)  # separable direction
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = (X / norms).astype(np.float32)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1), pa.float32()), d
            ),
            "label": pa.array(y.astype(bool)),
        }
    )
    return t, X.astype(np.float64), y


def _reference(X, y, iters, lr, reg):
    n, d = X.shape
    w = np.zeros(d + 1)
    for _ in range(iters):
        z = X @ w[:d] + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.empty(d + 1)
        g[:d] = X.T @ (p - y) / n + reg * w[:d]
        g[d] = (p - y).sum() / n
        w = w - lr * g
    return w


def test_matches_single_process_reference():
    t, X, y = _fixture()
    ds = ray.data.from_arrow(t).repartition(6)
    w = logreg_train(ds, label_col="label", iters=25, lr=1.0, reg=1e-4)
    w_ref = _reference(X, y, iters=25, lr=1.0, reg=1e-4)
    # partials regroup float sums → tolerance, not bit equality
    assert np.allclose(w, w_ref, rtol=1e-9, atol=1e-9)


def test_training_separates_and_loss_drops():
    t, X, y = _fixture()
    ds = ray.data.from_arrow(t).repartition(4)
    w0 = np.zeros(17)
    l0 = logreg_loss(ds, w0, label_col="label")
    w = logreg_train(ds, label_col="label", iters=60, lr=2.0)
    l1 = logreg_loss(ds, w, label_col="label")
    assert l1 < l0 / 2
    scores = {
        int(r["doc_id"]): float(r["score"])
        for r in logreg_score(ds, w).take_all()
    }
    s = np.array([scores[i] for i in range(len(y))])
    # AUC via rank statistic
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    pos = y == 1
    auc = (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2) / (
        pos.sum() * (~pos).sum()
    )
    assert auc > 0.97


def test_same_layout_is_deterministic():
    t, _, _ = _fixture(300)
    a = logreg_train(
        ray.data.from_arrow(t).repartition(5), label_col="label", iters=10
    )
    b = logreg_train(
        ray.data.from_arrow(t).repartition(5), label_col="label", iters=10
    )
    assert np.array_equal(a, b)
