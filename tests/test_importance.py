"""DSIR importance resampling (functions/importance.py): exact
equality vs a single-process numpy reference, split invariance, and
target-enrichment sanity."""

import numpy as np
import pyarrow as pa
import ray

from web3research_etl_ray.functions.importance import (
    _sha_uniform,
    dsir_logratio,
    dsir_select,
    hashed_feature_counts,
)

TARGET_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
NOISE_WORDS = ["foo", "bar", "baz", "qux", "zap", "mog", "wib", "nul"]


def _fixture(n=400):
    rng = np.random.default_rng(11)
    texts, is_target = [], []
    for i in range(n):
        tgt = i % 10 == 0  # 10% labelled target docs
        vocab = TARGET_WORDS if (tgt or i % 3 == 0) else NOISE_WORDS
        words = rng.choice(vocab, size=30)
        texts.append(" ".join(words))
        is_target.append(tgt)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "is_target": pa.array(is_target, pa.bool_()),
        }
    )


def _reference(t: pa.Table, buckets: int, k: int):
    """Single-process DSIR with the same tokenizer/hash kernels."""
    from web3research_etl_ray.functions.text import token_hash_stream

    h, p = token_hash_stream(t.column("text"))
    b = (h % np.uint64(buckets)).astype(np.int64)
    src = np.bincount(b, minlength=buckets).astype(np.int64)
    tmask = t.column("is_target").to_numpy(zero_copy_only=False).astype(bool)
    tgt = np.bincount(b[tmask[p]], minlength=buckets).astype(np.int64)
    w = dsir_logratio(src, tgt)
    lw = np.zeros(t.num_rows, np.float64)
    np.add.at(lw, p, w[b])
    u = _sha_uniform(t.column("doc_id").combine_chunks())
    g = lw - np.log(-np.log(u))
    order = np.lexsort(
        (t.column("doc_id").to_numpy(zero_copy_only=False), -g)
    )[:k]
    return src, tgt, {
        int(t.column("doc_id")[int(i)].as_py()): (float(lw[i]), float(g[i]))
        for i in order
    }


def test_dsir_matches_reference_exactly():
    t = _fixture()
    buckets, k = 512, 40
    ds = ray.data.from_arrow(t).repartition(7)
    src_d, tgt_d = hashed_feature_counts(
        ds, target_col="is_target", buckets=buckets
    )
    src_r, tgt_r, ref = _reference(t, buckets, k)
    assert np.array_equal(src_d, src_r) and np.array_equal(tgt_d, tgt_r)
    out = dsir_select(ds, target_col="is_target", k=k, buckets=buckets)
    got = {
        int(r["doc_id"]): (float(r["logweight"]), float(r["gumbel"]))
        for r in out.to_pylist()
    }
    assert got == ref  # float-exact: same kernels, same op order


def test_dsir_split_invariant():
    t = _fixture(150)
    a = dsir_select(
        ray.data.from_arrow(t).repartition(1),
        target_col="is_target", k=25, buckets=256,
    )
    b = dsir_select(
        ray.data.from_arrow(t).repartition(11),
        target_col="is_target", k=25, buckets=256,
    )
    assert a.to_pylist() == b.to_pylist()


def test_dsir_enriches_target_like_docs():
    t = _fixture()
    out = dsir_select(ray.data.from_arrow(t), target_col="is_target",
                      k=60, buckets=512)
    ids = out.column("doc_id").to_pylist()
    # target-vocabulary docs are i%10==0 or i%3==0 → ~40% of corpus;
    # the selection should be heavily enriched in them
    target_like = sum(1 for i in ids if i % 10 == 0 or i % 3 == 0)
    assert target_like >= 55
