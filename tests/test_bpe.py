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


def _reference_encode_len(texts, merges):
    """Apply merges in rank order (greedy left-to-right, the trainer's
    own overlap semantics) to each text; per-doc BPE token count."""
    import re

    out = []
    for txt in texts:
        total = 0
        words = re.findall(r"\w+", txt.lower())
        for w in words:
            syms = list(w)
            syms[-1] += "</w>"
            for _, a, b, _ in merges:
                new, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            total += len(syms)
        out.append((len(words), total))
    return out


def test_bpe_encode_matches_reference():
    from web3research_etl_ray.functions.bpe import BpeEncoder

    ref_merges = _reference_bpe(TEXTS, 12)
    enc = BpeEncoder([(a, b) for _, a, b, _ in ref_merges])
    got = (
        _ds(TEXTS, 3)
        .map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"]) for r in got}
    ref = _reference_encode_len(TEXTS, ref_merges)
    assert got == {i: ref[i] for i in range(len(TEXTS))}
    # merges strictly compress: fewer BPE tokens than characters,
    # never fewer than words
    for n_tok, n_bpe in got.values():
        assert n_bpe >= n_tok


def test_bpe_encode_empty_and_no_token_docs():
    from web3research_etl_ray.functions.bpe import BpeEncoder

    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["", "...!!!", "low lower"]),
        }
    )
    enc = BpeEncoder([("l", "o"), ("lo", "w")])
    out = enc(t)
    assert out.column("n_tokens").to_pylist() == [0, 0, 2]
    # 'low</w>' -> lo|w</w> (merge ('lo','w') does NOT apply: the
    # final symbol is 'w</w>', not 'w') => 2 symbols; 'lower</w>' ->
    # lo|w|e|r</w> -> low|e|r</w> (mid-word 'w' DOES merge) => 3
    assert out.column("n_bpe_tokens").to_pylist() == [0, 0, 5]


def test_pack_bpe_matches_reference_bins(tmp_path):
    """pack_bpe_documents == single-process reference: learn merges,
    encode each doc, pack by the doc_id-ordered prefix sum of BPE
    lengths."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import (
        _PACK_BUDGET,
        q_pack_bpe_documents,
    )

    texts = TEXTS * 20  # 300 docs (~2k BPE tokens) so several bins fill
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bin_id"])
        for r in q_pack_bpe_documents(str(tmp_path)).take_all()
    }
    ref_merges = _reference_bpe(texts, 40)
    lens = [n_bpe for _, n_bpe in _reference_encode_len(texts, ref_merges)]
    running = 0
    for i, n in enumerate(lens):
        assert got[i] == (n, running // _PACK_BUDGET), i
        running += n
    assert len({b for _, b in got.values()}) >= 2  # multiple bins used
