"""Adversarial unit tests for the wave-17 corpus-hygiene operators:
planted fixtures that exercise edge cases the sf corpora don't reach
(an all-one-token doc, a doc shorter than the shingle window, an exact
benchmark copy vs a one-token mutation, within-doc-only span repeats)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src0"] * len(texts)),
                "n_chars": pa.array(
                    [len(t or "") for t in texts], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def _rows(ds):
    return sorted(ds.take_all(), key=lambda r: r["doc_id"])


def test_gopher_repetition_planted(tmp_path):
    from web3research_etl_ray.pipelines.queries import (
        q_gopher_repetition_documents,
    )

    _write_docs(
        tmp_path,
        [
            "a a a a",          # 4 tokens, top=4; bigrams 3, distinct 1
            "x y x y x",        # 5 tokens, top('x')=3; bigrams 4, distinct 2
            "one two three",    # all unique: top=1, 2 bigrams, 0 dup
            "solo",             # 1 token: 0 bigrams
            "",                 # empty: everything 0
        ],
    )
    out = _rows(q_gopher_repetition_documents(str(tmp_path)))
    got = [
        (r["n_tokens"], r["top_unigram_n"], r["n_bigrams"], r["n_dup_bigrams"])
        for r in out
    ]
    assert got == [
        (4, 4, 3, 2),
        (5, 3, 4, 2),
        (3, 1, 2, 0),
        (1, 1, 0, 0),
        (0, 0, 0, 0),
    ]


def test_decontaminate_planted(tmp_path):
    """doc_id 0 is the benchmark (0 % 50 == 0).  doc 50 would also be,
    but with 5 docs only doc 0 qualifies.  A verbatim copy of the
    benchmark text is fully contaminated; sharing one 5-shingle flags
    partially; a disjoint doc and a too-short doc are clean."""
    from web3research_etl_ray.pipelines.queries import (
        q_decontaminate_documents,
    )

    bench = "alpha beta gamma delta epsilon zeta"
    _write_docs(
        tmp_path,
        [
            bench,                                   # benchmark slice
            bench,                                   # exact copy: all shared
            "alpha beta gamma delta epsilon other",  # shares 1 of 2 shingles
            "one two three four five six",           # disjoint: clean
            "tiny doc",                              # < W tokens: 0 shingles
        ],
    )
    out = _rows(q_decontaminate_documents(str(tmp_path)))
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4]  # benchmark excluded
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["contaminated"])
        for r in out
    }
    assert got[1] == (2, 2, True)
    assert got[2] == (2, 1, True)
    assert got[3] == (2, 0, False)
    assert got[4] == (0, 0, False)


def test_dup_span_planted(tmp_path):
    """Cross-doc shared 4-gram spans AND within-doc repeats both count
    (total occurrences >= 2, Lee-et-al semantics); unique spans don't."""
    from web3research_etl_ray.pipelines.queries import q_dup_span_documents

    _write_docs(
        tmp_path,
        [
            "a b c d x y z w",   # positions: 'a b c d' (shared w/ doc 1)
                                 # + 4 unique ones -> 5 pos, 1 dup
            "q a b c d r s t",   # 'a b c d' at pos 2 -> 5 pos, 1 dup
            "m n o p m n o p",   # within-doc repeat: 'm n o p' twice
                                 # (pos 1 and 5); middle windows unique
            "u v",               # < W tokens: no rows
        ],
    )
    out = _rows(q_dup_span_documents(str(tmp_path)))
    got = {r["doc_id"]: (r["n_positions"], r["n_dup_positions"]) for r in out}
    assert 3 not in got
    assert got[0] == (5, 1)
    assert got[1] == (5, 1)
    assert got[2] == (5, 2)
