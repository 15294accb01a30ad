"""Distributed BPE vocabulary learning (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training stage of an LLM data
pipeline, run inside the engine.

Classic BPE trains on the WORD-TYPE frequency dictionary, not the raw
token stream, so the distributed shape is:

1. one corpus pass folds word counts (the top_tokens exchange) — the
   only stage that touches the full corpus;
2. the type table (types ≪ tokens) becomes the working Dataset:
   (symbols: list<string> with a </w> marker on the final symbol,
   n: int64);
3. each merge round is a map-only pair-count pass (per-batch weighted
   bincount of adjacent symbol pairs → tiny partial tables → driver
   picks argmax, ties broken by lexicographically smallest pair) plus
   a map-only merge-apply pass (vectorized run-parity handling of
   overlapping matches, greedy left-to-right like the reference
   algorithm).  Per-round cost is O(types), independent of corpus
   size; driver state is one (pair, count) row per round.

Exactness vs the textbook single-process algorithm is pinned in
tests/test_bpe.py (same tie-break, same overlap semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def word_type_table(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, n) corpus type counts — per-batch partial group_by, one
    keyed fold (same exchange as top_tokens)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column(text_col), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return (
            pa.table({"word": flat})
            .group_by("word")
            .aggregate([("word", "count")])
            .rename_columns(["word", "n"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


def _to_symbols(t: pa.Table) -> pa.Table:
    """word → initial symbol sequence: chars, last char + '</w>'."""
    words = t.column("word").combine_chunks()
    syms, offsets = [], [0]
    for w in words.to_pylist():  # type table only — O(types), one-off
        cs = list(w)
        cs[-1] = cs[-1] + "</w>"
        syms.extend(cs)
        offsets.append(len(syms))
    return pa.table(
        {
            "symbols": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(syms, pa.string())
            ),
            "n": t.column("n"),
        }
    )


def _pair_counts(t: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts of one batch of the type table."""
    syms = t.column("symbols").combine_chunks()
    flat = syms.flatten()
    parent = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    m = len(flat)
    if m < 2:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    adj = parent[:-1] == parent[1:]
    left = flat.slice(0, m - 1).filter(pa.array(adj))
    right = flat.slice(1, m - 1).filter(pa.array(adj))
    w = n[parent[:-1][adj]]
    return (
        pa.table(
            {"left": left, "right": right, "n": pa.array(w, pa.int64())}
        )
        .group_by(["left", "right"])
        .aggregate([("n", "sum")])
        .rename_columns(["left", "right", "n"])
    )


def _apply_merge(t: pa.Table, a: str, b: str) -> pa.Table:
    """Replace greedy left-to-right non-overlapping (a, b) adjacencies
    with the merged symbol a+b — vectorized: overlapping runs of
    matches keep even offsets within the run (exactly the reference
    algorithm's scan order)."""
    syms = t.column("symbols").combine_chunks()
    flat = syms.flatten()
    parent = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
    m = len(flat)
    if m < 2:
        return t
    adj = parent[:-1] == parent[1:]
    is_a = pc.equal(flat.slice(0, m - 1), a).to_numpy(zero_copy_only=False)
    is_b = pc.equal(flat.slice(1, m - 1), b).to_numpy(zero_copy_only=False)
    match = adj & is_a & is_b
    pos = np.flatnonzero(match)
    if not len(pos):
        return t
    # greedy left-to-right: inside a run of consecutive matches
    # (e.g. 'aaaa' with pair (a,a)) only every other match applies
    run_start = np.flatnonzero(
        np.diff(np.concatenate(([-2], pos))) > 1
    )
    # parity within each run of consecutive positions
    run_id = np.cumsum(
        np.diff(np.concatenate(([-2], pos))) > 1
    ) - 1
    offset_in_run = pos - pos[run_start][run_id]
    keep_mask = offset_in_run % 2 == 0
    kept = pos[keep_mask]

    hit = np.zeros(m, bool)
    hit[kept] = True
    replaced = pc.if_else(
        pa.array(hit), pa.scalar(a + b, pa.string()), flat
    )  # no Python strings materialize
    drop = np.zeros(m, bool)
    drop[kept + 1] = True
    new_flat = replaced.filter(pa.array(~drop))
    new_parent = parent[~drop]
    # rebuild list offsets from the (nondecreasing) parent vector
    counts = np.bincount(new_parent, minlength=t.num_rows)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.table(
        {
            "symbols": pa.ListArray.from_arrays(
                pa.array(offsets), new_flat
            ),
            "n": t.column("n"),
        }
    )


class BpeEncoder:
    """Apply a learned merge table to documents — the tokenizer-APPLY
    stage that follows `bpe_learn` in an LLM data pipeline (count the
    real post-BPE sequence lengths before packing/mixing decisions).

    Stateful actor-pool shape: the merge list (tiny — one (left,
    right) pair per rank) binds ONCE per worker in ``__init__``; each
    ``__call__`` encodes one Arrow batch fully vectorized:

    1. tokenize the batch to its flat word stream (Arrow RE2);
    2. reduce to the batch's DISTINCT word types (types ≪ tokens) and
       run the same `_apply_merge` kernel the trainer uses, once per
       merge rank, over the type symbol table — so encode semantics
       are bit-identical to training (greedy left-to-right, even
       offsets in overlap runs);
    3. gather each occurrence's post-merge symbol count back through
       an `index_in` lookup and fold per document with one reduceat.

    Per-batch cost is O(merges × type symbols + tokens); no Python
    loops over tokens or documents."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .text import token_strings

        docs = t.column("doc_id").combine_chunks()
        flat, parents = token_strings(t.column("text"))
        n_rows = t.num_rows
        if len(flat) == 0:
            return pa.table(
                {
                    "doc_id": docs,
                    "n_tokens": pa.array(np.zeros(n_rows, np.int64)),
                    "n_bpe_tokens": pa.array(np.zeros(n_rows, np.int64)),
                }
            )
        types = pc.unique(flat)
        sym_tbl = _to_symbols(
            pa.table(
                {
                    "word": types,
                    "n": pa.array(np.ones(len(types), np.int64)),
                }
            )
        )
        for a, b in self.merges:
            sym_tbl = _apply_merge(sym_tbl, a, b)
        n_syms = pc.list_value_length(
            sym_tbl.column("symbols").combine_chunks()
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(flat, value_set=types).to_numpy(
            zero_copy_only=False
        )
        per_tok = n_syms[idx]
        # parents is nondecreasing; docs with zero tokens need 0 rows
        counts = np.bincount(parents, minlength=n_rows)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bpe = np.zeros(n_rows, np.int64)
        nz = counts > 0
        if nz.any():
            sums = np.add.reduceat(per_tok, starts[nz])
            bpe[nz] = sums
        return pa.table(
            {
                "doc_id": docs,
                "n_tokens": pa.array(counts.astype(np.int64)),
                "n_bpe_tokens": pa.array(bpe),
            }
        )


def bpe_learn(
    ds: ray.data.Dataset,
    num_merges: int,
    *,
    text_col: str = "text",
) -> pa.Table:
    """Learn ``num_merges`` BPE merges from the corpus.  Returns
    (merge_rank, left, right, pair_count) in learning order."""
    types = word_type_table(ds, text_col=text_col).map_batches(
        _to_symbols, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    merges = []
    for rank in range(num_merges):
        partials = types.map_batches(
            _pair_counts, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        if not partials:
            break
        agg: dict[tuple[str, str], int] = {}
        for r in partials:
            k = (r["left"], r["right"])
            agg[k] = agg.get(k, 0) + int(r["n"])
        if not agg:
            break
        # argmax count, ties → lexicographically smallest pair
        (a, b), cnt = min(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(
            {"merge_rank": rank, "left": a, "right": b, "pair_count": cnt}
        )
        types = types.map_batches(
            lambda t, a=a, b=b: _apply_merge(t, a, b),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    if not merges:
        return pa.table(
            {
                "merge_rank": pa.array([], pa.int64()),
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "pair_count": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(merges).cast(
        pa.schema(
            {
                "merge_rank": pa.int64(),
                "left": pa.string(),
                "right": pa.string(),
                "pair_count": pa.int64(),
            }
        )
    )
