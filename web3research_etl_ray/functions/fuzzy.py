"""Fuzzy (edit-distance-1) token matching — SymSpell-style deletion
blocking (Garbe's symmetric-delete algorithm) + the engine's batched
Levenshtein verify.

Two tokens are at edit distance ≤ 1 iff they are equal, one is a
1-char deletion of the other, or they share a 1-char-deletion variant
(a substitution deletes to the same string from both sides) — so the
deletion neighborhood {token} ∪ del1(token) is a COMPLETE blocking key
set for distance 1: no candidate is missed, and the verify pass makes
the output exact (no false positives either).

Distributed shape (the repo's standard 3-shuffle candidate pipeline):
1. corpus pass → word-TYPE table (types ≪ tokens), length/df bounds
   applied vectorized;
2. each type emits ≤ len+1 deletion keys; keys ride a HASH-BUCKET
   exchange (groups = B buckets, never O(distinct keys)); inside a
   bucket, runs of equal keys generate candidate pairs with pure
   index math (runs are tiny for natural vocabularies);
3. candidates dedup by pair-hash bucket (first-of-run, vectorized)
   and verify with the batched prefix-min Levenshtein DP — only
   distance-exactly-1 pairs survive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .hashing import key_hash64
from .window import default_num_buckets


def _codes_matrix(tokens: pa.Array, max_len: int):
    """(codes uint8[N, max_len] zero-padded, lens int32[N]) straight
    off the utf8 buffers — no Python strings."""
    tokens = (
        tokens.combine_chunks()
        if isinstance(tokens, pa.ChunkedArray)
        else tokens
    )
    n = len(tokens)
    if n == 0:
        return np.zeros((0, max_len), np.int32), np.zeros(0, np.int32)
    offs = np.frombuffer(tokens.buffers()[1], np.int32)[
        tokens.offset : tokens.offset + n + 1
    ]
    data = np.frombuffer(tokens.buffers()[2], np.uint8)
    lens = (offs[1:] - offs[:-1]).astype(np.int32)
    idx = offs[:-1, None] + np.arange(max_len)[None, :]
    mask = np.arange(max_len)[None, :] < lens[:, None]
    codes = np.zeros((n, max_len), np.int32)
    codes[mask] = data[np.minimum(idx[mask], len(data) - 1)]
    return codes, lens


def _deletion_keys(tokens: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Flat (key, token_index) for {token} ∪ del1(token): one
    vectorized slice+concat per char position, never per token."""
    tokens = (
        tokens.combine_chunks()
        if isinstance(tokens, pa.ChunkedArray)
        else tokens
    )
    n = len(tokens)
    lens = pc.utf8_length(tokens).to_numpy(zero_copy_only=False)
    keys = [tokens]
    owners = [np.arange(n, dtype=np.int64)]
    max_len = int(lens.max()) if n else 0
    for i in range(max_len):
        sel = np.flatnonzero(lens > i)
        sub = pc.take(tokens, pa.array(sel, pa.int64()))
        head = pc.utf8_slice_codeunits(sub, start=0, stop=i)
        tail = pc.utf8_slice_codeunits(sub, start=i + 1)
        keys.append(pc.binary_join_element_wise(head, tail, ""))
        owners.append(sel)
    return pa.concat_arrays(
        [k if isinstance(k, pa.Array) else k.combine_chunks() for k in keys]
    ), np.concatenate(owners)


def spelling_variant_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_len: int = 3,
    max_len: int = 14,
    df_min: int = 1,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """All UNORDERED token pairs (tok_a < tok_b) of the corpus
    vocabulary at edit distance exactly 1, for tokens with
    ``min_len <= len <= max_len`` and document frequency ≥ ``df_min``
    (both bounds mirror 1:1 into the SQL oracle)."""
    from .bpe import word_type_table

    if num_buckets is None:
        num_buckets = default_num_buckets()
    pair_buckets = num_buckets

    types = word_type_table(ds, text_col=text_col)

    def bound(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(t.column("word"))
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(ln, min_len), pc.less_equal(ln, max_len)
            ),
            pc.greater_equal(t.column("n"), df_min),
        )
        return t.filter(keep).select(["word"])

    vocab = types.map_batches(
        bound, batch_format="pyarrow", zero_copy_batch=True
    )

    def emit_keys(t: pa.Table) -> pa.Table:
        words = t.column("word").combine_chunks()
        keys, owners = _deletion_keys(words)
        kb = (
            key_hash64(keys) % np.uint64(num_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "key": keys,
                "word": pc.take(words, pa.array(owners, pa.int64())),
                "__kb": pa.array(kb, pa.int64()),
            }
        )

    keyed = vocab.map_batches(
        emit_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("key", "ascending"), ("word", "ascending")]
        )
        key = pc.take(g.column("key"), idx).combine_chunks()
        word = pc.take(g.column("word"), idx).combine_chunks()
        m = len(key)
        if m < 2:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string()),
                 "__pb": pa.array([], pa.int64())}
            )
        same = pc.equal(key.slice(0, m - 1), key.slice(1, m - 1))
        same = same.to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(~same) + 1, [m]))
        sizes = np.diff(starts)
        # candidate pairs: all within-run combinations (runs are tiny)
        npairs = (sizes * (sizes - 1)) // 2
        total = int(npairs.sum())
        if total == 0:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string()),
                 "__pb": pa.array([], pa.int64())}
            )
        run_of = np.repeat(np.arange(len(sizes)), npairs)
        off = np.arange(total) - np.repeat(
            np.cumsum(npairs) - npairs, npairs
        )
        s = sizes[run_of]
        # enumerate (i, j) with i<j inside each run from the flat offset
        i = (
            s - 2
            - np.floor(
                np.sqrt(-8.0 * off + 4.0 * s * (s - 1) - 7.0) / 2.0 - 0.5
            )
        ).astype(np.int64)
        j = (
            off + i + 1 - s * (s - 1) // 2 + (s - i) * ((s - i) - 1) // 2
        ).astype(np.int64)
        base = starts[run_of]
        ia, ib = base + i, base + j
        a = pc.take(word, pa.array(ia, pa.int64()))
        b = pc.take(word, pa.array(ib, pa.int64()))
        neq = pc.invert(pc.equal(a, b)).to_numpy(zero_copy_only=False)
        a, b = a.filter(pa.array(neq)), b.filter(pa.array(neq))
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        pb = (
            (key_hash64(lo) ^ key_hash64(hi)) % np.uint64(pair_buckets)
        ).astype(np.int64)
        return pa.table(
            {"tok_a": lo, "tok_b": hi, "__pb": pa.array(pb, pa.int64())}
        )

    cands = keyed.groupby("__kb").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    def verify_bucket(g: pa.Table) -> pa.Table:
        from .text import levenshtein_pairs

        idx = pc.sort_indices(
            g, sort_keys=[("tok_a", "ascending"), ("tok_b", "ascending")]
        )
        a = pc.take(g.column("tok_a"), idx).combine_chunks()
        b = pc.take(g.column("tok_b"), idx).combine_chunks()
        m = len(a)
        if m == 0:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string())}
            )
        dup = np.zeros(m, bool)
        if m > 1:
            dup[1:] = (
                pc.and_(
                    pc.equal(a.slice(0, m - 1), a.slice(1, m - 1)),
                    pc.equal(b.slice(0, m - 1), b.slice(1, m - 1)),
                ).to_numpy(zero_copy_only=False)
            )
        first = ~dup
        a, b = a.filter(pa.array(first)), b.filter(pa.array(first))
        n = len(a)
        both = pa.concat_arrays([a, b])
        codes, lens = _codes_matrix(both, max_len)
        ia = np.arange(n, dtype=np.int64)
        ib = ia + n
        d = levenshtein_pairs(codes, lens, ia, ib)
        keep = pa.array(d == 1)
        return pa.table({"tok_a": a.filter(keep), "tok_b": b.filter(keep)})

    return cands.groupby("__pb").map_groups(
        verify_bucket, batch_format="pyarrow"
    )
