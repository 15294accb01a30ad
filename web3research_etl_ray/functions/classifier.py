"""Distributed linear-model training — full-batch logistic regression
by synchronous gradient aggregation (the fastText-style quality-
classifier filter of LLM data pipelines, e.g. GPT-3/PaLM quality
scoring, trained inside the engine instead of imported).

Shape: the weight vector (d+1 floats, a few KiB) broadcasts via
ray.put each iteration; every batch computes its exact partial
gradient with two matmuls; the driver folds partials (sorted by the
partial's min row id, so a fixed partitioning is bit-deterministic)
and takes a plain gradient step.  Full-batch GD, not SGD: the
gradient is an associative SUM, so the computation is exact and
reproducible — no learning-rate-schedule/shuffle nondeterminism.
Driver state is O(d); exchange volume is O(partials × d) per
iteration, independent of row count.

Features come from any fixed-size-list embedding column — for text,
`functions.similarity.hash_embed` (hashed token features) makes the
whole quality-classifier path vocabulary- and model-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _xy(t: pa.Table, feature_col: str, label_col: str):
    emb = t.column(feature_col).combine_chunks()
    d = emb.type.list_size if hasattr(emb.type, "list_size") else None
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    if d is None:  # variable list: infer from row count
        d = len(flat) // max(1, t.num_rows)
    X = flat.astype(np.float64).reshape(t.num_rows, d)
    y = (
        t.column(label_col)
        .combine_chunks()
        .cast(pa.float64())
        .to_numpy(zero_copy_only=False)
    )
    return X, y


def logreg_train(
    ds: ray.data.Dataset,
    *,
    feature_col: str = "embedding",
    label_col: str,
    id_col: str = "doc_id",
    iters: int = 60,
    lr: float = 2.0,
    reg: float = 1e-4,
) -> np.ndarray:
    """Train w (d weights + bias) by full-batch gradient descent with
    L2 regularization.  Deterministic: partial gradients fold in
    ascending min-id order.  Returns w with the bias LAST."""
    probe = ds.take_batch(1, batch_format="pyarrow")
    X0, _ = _xy(probe, feature_col, label_col)
    d = X0.shape[1]
    n_total = ds.count()
    w = np.zeros(d + 1, np.float64)

    for _ in range(iters):
        w_ref = ray.put(w)

        def partial(t: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            X, y = _xy(t, feature_col, label_col)
            z = X @ wv[:d] + wv[d]
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.empty(d + 2, np.float64)
            g[:d] = X.T @ err
            g[d] = err.sum()
            # stable log-loss tail for the telemetry row
            g[d + 1] = float(
                np.sum(np.logaddexp(0.0, z) - y * z)
            )
            mid = t.column(id_col).combine_chunks()
            mid0 = int(pa.compute.min(mid).as_py()) if t.num_rows else -1
            return pa.table(
                {
                    "mid": pa.array([mid0], pa.int64()),
                    "g": pa.array([g.tobytes()], pa.binary()),
                }
            )

        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        rows.sort(key=lambda r: r["mid"])
        acc = np.zeros(d + 2, np.float64)
        for r in rows:
            acc += np.frombuffer(r["g"], np.float64)
        grad = acc[: d + 1] / n_total
        grad[:d] += reg * w[:d]
        w = w - lr * grad
    return w


def logreg_loss(
    ds: ray.data.Dataset,
    w: np.ndarray,
    *,
    feature_col: str = "embedding",
    label_col: str,
) -> float:
    """Mean log-loss of w over ds (one streaming pass)."""
    d = len(w) - 1
    w_ref = ray.put(w)

    def part(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        X, y = _xy(t, feature_col, label_col)
        z = X @ wv[:d] + wv[d]
        s = float(np.sum(np.logaddexp(0.0, z) - y * z))
        return pa.table(
            {
                "loss": pa.array([s], pa.float64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    rows = ds.map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return sum(r["loss"] for r in rows) / max(1, sum(r["n"] for r in rows))


def logreg_score(
    ds: ray.data.Dataset,
    w: np.ndarray,
    *,
    feature_col: str = "embedding",
    id_col: str = "doc_id",
    out_col: str = "score",
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Per-row sigmoid score under w — exact, order-free, streaming."""
    d = len(w) - 1
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        emb = t.column(feature_col).combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        X = flat.astype(np.float64).reshape(t.num_rows, d)
        p = 1.0 / (1.0 + np.exp(-(X @ wv[:d] + wv[d])))
        cols = {id_col: t.column(id_col)}
        for c in keep_cols:
            cols[c] = t.column(c)
        cols[out_col] = pa.array(p, pa.float64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
