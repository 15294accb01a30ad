"""Adversarial unit tests for the wave-17 operators: planted fixtures
that exercise kernel edge cases the sf corpora don't reach (an
all-one-token doc, a single-token doc, an empty doc)."""

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
    out = sorted(
        q_gopher_repetition_documents(str(tmp_path)).take_all(),
        key=lambda r: r["doc_id"],
    )
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
