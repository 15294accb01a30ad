"""Cross-validate the pure-Python oracle fold against an independent
DuckDB SQL fold of the same generated stream — two implementations of
the convergence semantics must agree before either is trusted as the
golden reference (SURVEY.md §5)."""

import glob

import duckdb

from web3research_etl_ray.oracle import load_rollback_ranges, oracle_fold


def test_oracle_fold_matches_duckdb(tiny_stream):
    con = duckdb.connect()
    files = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))
    con.execute(
        "CREATE VIEW ev AS SELECT repo, path, commit_seq, op, content "
        f"FROM read_parquet({files!r}, union_by_name=true)"
    )
    ranges = load_rollback_ranges(tiny_stream)
    orphan_pred = " AND ".join(
        f"commit_seq NOT BETWEEN {lo} AND {hi}" for lo, hi in ranges
    ) or "TRUE"
    sql = f"""
    WITH eff AS (SELECT * FROM ev WHERE {orphan_pred}),
    win AS (
      SELECT *, row_number() OVER (
        PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
      FROM eff
    )
    SELECT repo, path, commit_seq, sha256(content) AS sha
    FROM win WHERE rn = 1 AND op <> 'delete'
    ORDER BY repo, path
    """
    ddb = {
        (r[0], r[1]): (r[2], r[3]) for r in con.sql(sql).fetchall()
    }
    ours = {
        (r["repo"], r["path"]): (r["commit_seq"], r["content_sha256"].hex())
        for r in oracle_fold(tiny_stream).to_pylist()
    }
    assert ours == ddb
