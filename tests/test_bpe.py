"""Distributed BPE (functions/bpe.py) vs the textbook single-process
algorithm (Sennrich et al. 2016) — exact merge-sequence equality,
overlap semantics, and split invariance."""

import collections

import pyarrow as pa
import ray

from web3research_etl_ray.functions.bpe import bpe_learn


def _reference_bpe(texts, num_merges):
    """Textbook BPE on the word-frequency dict: greedy left-to-right
    merge apply, ties broken by lexicographically smallest pair."""
    import re

    vocab = collections.Counter()
    for txt in texts:
        for w in re.findall(r"\w+", txt.lower()):
            vocab[w] += 1
    words = {}
    for w, n in vocab.items():
        cs = list(w)
        cs[-1] += "</w>"
        words[tuple(cs)] = n

    merges = []
    for rank in range(num_merges):
        pairs = collections.Counter()
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        new_words = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest widen",
    "the new low news flows slower",
    "aaaa aaa aa baaa",  # overlapping-run semantics
] * 3


def _ds(texts, parts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


def test_bpe_matches_reference_merge_sequence():
    got = bpe_learn(_ds(TEXTS, 4), 20).to_pylist()
    ref = _reference_bpe(TEXTS, 20)
    assert [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in got
    ] == ref


def test_bpe_split_invariant():
    a = bpe_learn(_ds(TEXTS, 1), 8).to_pylist()
    b = bpe_learn(_ds(TEXTS, 7), 8).to_pylist()
    assert a == b


def test_bpe_learns_common_subwords():
    rows = bpe_learn(_ds(TEXTS, 2), 12).to_pylist()
    merged = {r["left"] + r["right"] for r in rows}
    # 'low</w>' and 'new' are high-frequency units in the fixture
    assert any("low" in m for m in merged)
    assert any("ne" in m for m in merged)
