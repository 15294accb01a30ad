"""Adversarial tests for the wave-22 operators: NTILE boundary math on
corpus sizes the sf fixtures don't hit (N < 10 → one-row tiles, N mod
10 ≠ 0 → first-r-tiles-take-the-extra-row), heavy n_chars ties broken
by doc_id, and the k-anonymity HAVING filter on a planted group —
each vs the registered DuckDB oracle on the same planted parquet."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from web3research_etl_ray.pipelines.queries import (
    ORACLE_DECILE_LENGTHS,
    ORACLE_K_ANONYMITY,
    q_decile_doc_lengths,
    q_k_anonymity_documents,
)


def _docs(tmp_path, n_chars, lang=None, source=None):
    n = len(n_chars)
    cols = {
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "lang": pa.array(lang or ["en"] * n, pa.string()),
        "source": pa.array(source or ["s"] * n, pa.string()),
    }
    pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _oracle(tmp_path, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con.execute(sql).fetch_arrow_table()


def _check_deciles(tmp_path, n_chars):
    sf = _docs(tmp_path, n_chars)
    out = q_decile_doc_lengths(sf).to_pandas()
    ora = _oracle(tmp_path, ORACLE_DECILE_LENGTHS).to_pandas()
    assert out["tile"].tolist() == ora["tile"].tolist()
    assert out["n_docs"].tolist() == ora["n_docs"].tolist()
    assert out["sum_chars"].tolist() == ora["sum_chars"].tolist()
    return out


def test_decile_uneven_split_and_ties(tmp_path):
    # N = 23 → q=2, r=3: tiles 1-3 take 3 rows, tiles 4-10 take 2;
    # every n_chars equal → the doc_id tiebreak decides every boundary
    out = _check_deciles(tmp_path, [100] * 23)
    assert out["n_docs"].tolist() == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]


def test_decile_fewer_docs_than_tiles(tmp_path):
    # N = 7 < 10 → q=0 path: seven one-row tiles, no tile 8-10
    out = _check_deciles(tmp_path, [5, 3, 9, 1, 7, 7, 2])
    assert out["tile"].tolist() == [1, 2, 3, 4, 5, 6, 7]
    assert out["n_docs"].tolist() == [1] * 7
    # tile 1 is the shortest doc, tile 7 the longest
    assert out["sum_chars"].tolist() == [1, 2, 3, 5, 7, 7, 9]


def test_k_anonymity_flags_only_small_groups(tmp_path):
    # (en, big): 12 docs — safe; (fr, rare): 3 docs and
    # (de, tiny): 1 doc — both flagged
    lang = ["en"] * 12 + ["fr"] * 3 + ["de"]
    source = ["big"] * 12 + ["rare"] * 3 + ["tiny"]
    sf = _docs(tmp_path, [10] * 16, lang=lang, source=source)
    out = q_k_anonymity_documents(sf).to_pandas()
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("de", "tiny", 1), ("fr", "rare", 3)
    ]
    ora = _oracle(tmp_path, ORACLE_K_ANONYMITY).to_pandas()
    assert ora.values.tolist() == out.values.tolist()
