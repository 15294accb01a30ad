"""Driver-contract query surface: one entry per operator family from
SURVEY.md §2 plus the training-data operators, each over the driver's
parquet tables (region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings) with a DuckDB oracle where the semantics
are SQL-expressible.

Parity rules that make the value-hash comparison exact:
- float SUMs are integer-ized first (``CAST(ROUND(x*100) AS BIGINT)``;
  Ray side uses round_mode=half_towards_infinity to match DuckDB) —
  integer sums are order-independent, double sums are not.
- regex counts use RE2 on both sides (pyarrow.compute and DuckDB).
- top-k ties are broken by id so the selected SET is deterministic.
- column names are identical on both sides (AS aliases).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
)
from ..functions.hashing import key_hash64, rolling_fingerprint, sha256_hex
from ..functions.multimodal import media_feature_pipeline
from ..functions.similarity import cosine_neardup_pairs, knn_brute, knn_lsh
from ..functions.text import lang_id, quality_score, simhash64, token_stats
from ..stages.lww import fold_lww
from .curate import filter_to_reps as _filter_to_reps

_ROUND = pc.RoundOptions(ndigits=0, round_mode="half_towards_infinity")


def _tbl(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _from_rows(rows: list[dict], schema: dict[str, pa.DataType]) -> pa.Table:
    """Typed table from driver-side final rows; empty row lists keep
    the declared schema (``pa.Table.from_pylist([])`` would drop it —
    an empty-partition crash at scale)."""
    if rows:
        return pa.Table.from_pylist(rows).select(list(schema)).cast(
            pa.schema(schema)
        )
    return pa.table({k: pa.array([], v) for k, v in schema.items()})


def _read(sf_dir: str, name: str, columns=None) -> ray.data.Dataset:
    """Column-pruned read with size-aware block count: Ray's default
    splits small files into ~64 near-empty blocks and every downstream
    map/sort pays a fixed per-block cost (measured: tpch_q1 1.38 s →
    0.62 s warm just from coalescing).  ~8 MB of file per block, floor 8
    for parallelism, cap 256 — at 100 TB the cap never binds because
    reads span many files."""
    path = _tbl(sf_dir, name)
    kw = {"columns": columns} if columns else {}
    try:
        blocks = max(8, min(256, os.path.getsize(path) // (8 << 20)))
        kw["override_num_blocks"] = int(blocks)
    except OSError:
        pass
    return ray.data.read_parquet(path, **kw)


def _cents(col) -> pa.Array:
    return pc.round(pc.multiply(col, pa.scalar(100.0)), options=_ROUND).cast(pa.int64())


def _round_int(col) -> pa.Array:
    # module-level so nested closures reference this function (picklable
    # by module path) rather than the _ROUND FunctionOptions instance,
    # which pyarrow cannot pickle
    return pc.round(col, options=_ROUND).cast(pa.int64())


def _micro(col) -> pa.Array:
    """Exact int64 micro-units (×1e6) — the float-sum integerizer for
    unit-scale values like embedding elements (module-level for the
    same pickling reason as ``_round_int``)."""
    return pc.round(
        pc.multiply(col.cast(pa.float64()), pa.scalar(1_000_000.0)),
        options=_ROUND,
    ).cast(pa.int64())


# ---------------------------------------------------------------------------
# 1. Flagship: CDC replay with a fully SQL-expressible event derivation
# ---------------------------------------------------------------------------

_ORPHAN_LO, _ORPHAN_HI = 200_000, 200_050


def _derive_cdc_stream(sf_dir: str) -> str:
    """Deterministically derive a (repo, path, commit, lang, content,
    commit_seq, op) change-event stream from the documents table — 3
    commits per doc, deletes on doc_id%37 at i=2, an orphaned range at
    [200000, 200050] — and stage it as a stream dir for the engine.
    The same derivation is expressed in the oracle SQL CTE, so the full
    engine replay has an exact DuckDB oracle."""
    docs = pq.read_table(_tbl(sf_dir, "documents"))
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/w3r_cdc/{tag}"
    marker = os.path.join(out_dir, "events-00000.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parts = []
    n = docs.num_rows
    doc_id = docs.column("doc_id").to_numpy(zero_copy_only=False)
    for i in range(3):
        repo = docs.column("source")
        path = pa.array([f"docs/{d}.txt" for d in doc_id], pa.string())
        seq = pa.array(i * 100_000 + doc_id, pa.int64())
        content = pc.binary_join_element_wise(
            docs.column("text").cast(pa.string()), f" v{i}", ""
        )
        commit_src = pc.binary_join_element_wise(
            repo.cast(pa.string()),
            pc.binary_join_element_wise(
                path, pc.cast(seq, pa.string()), "@"
            ),
            "/",
        )
        op = pa.array(
            [
                "delete" if (i == 2 and d % 37 == 0) else "upsert"
                for d in doc_id
            ],
            pa.string(),
        )
        parts.append(
            pa.table(
                {
                    "repo": repo.cast(pa.string()),
                    "path": path,
                    "commit": sha256_hex(commit_src),
                    "lang": docs.column("lang").cast(pa.string()),
                    "content": content,
                    "commit_seq": seq,
                    "op": op,
                }
            )
        )
    events = pa.concat_tables(parts).sort_by([("commit_seq", "ascending")])
    # rollbacks first: the events file doubles as the cache marker, so
    # a crash between the two writes can't leave a marker without the
    # rollback table
    pq.write_table(
        pa.table(
            {
                "barrier_seq": pa.array([_ORPHAN_HI + 1], pa.int64()),
                "orphan_from": pa.array([_ORPHAN_LO], pa.int64()),
                "orphan_to": pa.array([_ORPHAN_HI], pa.int64()),
            }
        ),
        os.path.join(out_dir, "rollbacks.parquet"),
    )
    pq.write_table(events, marker)
    return out_dir


def q_cdc_replay_lake(sf_dir: str) -> pa.Table:
    """Full engine replay (normalize → partial LWW → partitioned merge
    → manifest) of the derived stream; returns the converged lake."""
    import shutil

    from .replay import lake_table, replay

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-lake"
    shutil.rmtree(lake_dir, ignore_errors=True)
    replay(stream, lake_dir, num_partitions=8)
    lake = lake_table(lake_dir)
    out = pa.table(
        {
            "repo": lake.column("repo"),
            "path": lake.column("path"),
            "commit": lake.column("commit"),
            "lang": lake.column("lang"),
            "content": lake.column("content"),
            "content_sha256": sha256_hex(lake.column("content")),
            "commit_seq": lake.column("commit_seq"),
        }
    )
    return out.sort_by([("repo", "ascending"), ("path", "ascending")])


#: shared oracle prefix: the derived change-event stream + the
#: rollback-effective subset, exactly mirroring _derive_cdc_stream
_EV_CTE = f"""
ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         lang,
         text || ' v' || CAST(i AS VARCHAR) AS content,
         CASE WHEN i = 2 AND doc_id % 37 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
)"""


_CDC_SQL = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path,
       sha256(repo || '/' || path || '@' || CAST(commit_seq AS VARCHAR)) AS commit,
       lang, content, sha256(content) AS content_sha256, commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY repo, path
"""


def q_scd2_history(sf_dir: str) -> pa.Table:
    """SCD2-style versioned history over the change-event stream: for
    every (repo, path) version, its validity interval
    [commit_seq, valid_to_seq) — valid_to_seq = the next version's
    commit, NULL while current — plus an is_current flag (open AND not
    a delete).  The row-level history companion of the LWW lake (which
    keeps only winners) and manifest time travel (which keeps
    generations).  One key-hash bucket exchange; inside the bucket the
    lead is a vectorized per-segment shift over all keys at once."""
    from ..functions.hashing import key_hash64
    from ..functions.window import lead_one, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "op"],
    ).map_batches(
        # mirror the oracle's eff CTE: drop the orphaned reorg range
        lambda t: t.filter(
            pc.or_(
                pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = key_hash64(t.column("repo"), t.column("path"))
        return t.append_column(
            "__b", pa.array((h % np.uint64(32)).astype(np.int64), pa.int64())
        )

    def versions(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        key = pc.binary_join_element_wise(
            g.column("repo"), g.column("path"), "\x00"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        codes = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, codes))
        codes_s, seq_s = codes[order], seq[order]
        starts = segment_starts(codes_s)
        led, valid = lead_one(seq_s, starts)
        out = g.take(pa.array(order, pa.int64()))
        op = out.column("op").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "repo": out.column("repo"),
                "path": out.column("path"),
                "commit_seq": pa.array(seq_s, pa.int64()),
                "valid_to_seq": pa.array(
                    led.astype(np.int64), pa.int64(), mask=~valid
                ),
                "is_current": pa.array(~valid & (op != "delete")),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(versions, batch_format="pyarrow")
    )


ORACLE_SCD2 = f"""
WITH {_EV_CTE},
v AS (
  SELECT repo, path, commit_seq, op,
         lead(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq) AS valid_to_seq
  FROM eff
)
SELECT repo, path, commit_seq, valid_to_seq,
       (valid_to_seq IS NULL AND op <> 'delete') AS is_current
FROM v
"""


def q_cdc_scan_recent(sf_dir: str) -> pa.Table:
    """Zone-map read of the converged lake: winners with commit_seq ≥
    200000 via `lake_scan` — Parquet footer min/max prunes files BEFORE
    any task runs (merge-on-write keeps partitions sorted by key, and
    the footer carries per-row-group seq ranges).  Exercises the
    predicate-pruned read path at the oracle gate."""
    import shutil

    from .replay import lake_scan, replay

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-scanlake"
    if not os.path.exists(os.path.join(lake_dir, "LATEST")):
        shutil.rmtree(lake_dir, ignore_errors=True)
        replay(stream, lake_dir, num_partitions=8)
    ds, _read_n, _total = lake_scan(
        lake_dir,
        predicate=("commit_seq", ">=", 200_000),
        columns=["repo", "path", "commit_seq", "lang"],
    )
    t = _from_rows(
        ds.take_all(),
        {"repo": pa.string(), "path": pa.string(),
         "commit_seq": pa.int64(), "lang": pa.string()},
    )
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_SCAN_RECENT = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (
    PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path, commit_seq, lang
FROM win WHERE rn = 1 AND op <> 'delete' AND commit_seq >= 200000
ORDER BY repo, path
"""


_TT_SPLIT = 99_999  # gen 0 = commits with seq <= split; gen 1 = the rest


def q_time_travel_diff(sf_dir: str) -> pa.Table:
    """Replay the derived stream in two ticks (two committed manifest
    generations), then snapshot-diff them — partition-aligned file-pair
    compare, NO shuffle (pipelines/replay.py::lake_diff).  Exercises
    time travel (read gen 0 after gen 1 committed), tombstone deletes
    (i=2 doc_id%37 → 'deleted' rows) and reorg fallback (orphaned i=2
    commits fall back to the i=1 winner → still 'updated')."""
    import shutil

    from .replay import lake_diff, replay

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-ttlake"
    shutil.rmtree(lake_dir, ignore_errors=True)
    replay(stream, lake_dir, num_partitions=8, upto_seq=_TT_SPLIT)
    replay(stream, lake_dir, num_partitions=8)
    diff = pa.Table.from_pylist(lake_diff(lake_dir, 0, 1).take_all())
    return diff.select(["repo", "path", "change", "old_seq", "new_seq"]).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )


ORACLE_TT_DIFF = f"""
WITH {_EV_CTE},
old_w AS (
  SELECT repo, path, commit_seq, op,
         row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff WHERE commit_seq <= {_TT_SPLIT}
),
old_s AS (SELECT repo, path, commit_seq FROM old_w WHERE rn = 1 AND op <> 'delete'),
new_w AS (
  SELECT repo, path, commit_seq, op,
         row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
),
new_s AS (SELECT repo, path, commit_seq FROM new_w WHERE rn = 1 AND op <> 'delete')
SELECT COALESCE(o.repo, n.repo) AS repo,
       COALESCE(o.path, n.path) AS path,
       CASE WHEN o.path IS NULL THEN 'added'
            WHEN n.path IS NULL THEN 'deleted'
            ELSE 'updated' END AS change,
       o.commit_seq AS old_seq,
       n.commit_seq AS new_seq
FROM old_s o FULL OUTER JOIN new_s n ON o.repo = n.repo AND o.path = n.path
WHERE o.commit_seq IS DISTINCT FROM n.commit_seq
ORDER BY repo, path
"""


def q_changelog_export(sf_dir: str) -> pa.Table:
    """Publish-side CDC at the gate: replay the derived stream in two
    ticks, then emit the gen0→gen1 change FEED (replay.py::
    lake_changelog — Debezium verbs + after-images, the outbox half of
    a CDC engine).  Partition-aligned pair compare, NO shuffle; the
    oracle is the FULL OUTER JOIN of the two snapshot winners."""
    import shutil

    import ray

    from .replay import lake_changelog, replay

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-cllake"
    shutil.rmtree(lake_dir, ignore_errors=True)
    replay(stream, lake_dir, num_partitions=8, upto_seq=_TT_SPLIT)
    replay(stream, lake_dir, num_partitions=8)
    blocks = [
        b
        for b in ray.get(lake_changelog(lake_dir, 0, 1).to_arrow_refs())
        if b.num_rows
    ]
    cl = pa.concat_tables(blocks)
    is_d = pc.equal(cl.column("op"), "d")
    sha = sha256_hex(cl.column("content"))
    after_sha = pc.if_else(is_d, pa.nulls(cl.num_rows, pa.string()), sha)
    out = pa.table(
        {
            "repo": cl.column("repo"),
            "path": cl.column("path"),
            "op": cl.column("op"),
            "old_seq": cl.column("old_seq"),
            "seq": cl.column("seq"),
            "after_sha": after_sha,
        }
    )
    return out.sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_CHANGELOG = f"""
WITH {_EV_CTE},
old_w AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff WHERE commit_seq <= {_TT_SPLIT}
),
old_s AS (SELECT repo, path, commit_seq, content FROM old_w WHERE rn = 1 AND op <> 'delete'),
new_w AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
),
new_s AS (SELECT repo, path, commit_seq, content FROM new_w WHERE rn = 1 AND op <> 'delete')
SELECT COALESCE(o.repo, n.repo) AS repo,
       COALESCE(o.path, n.path) AS path,
       CASE WHEN o.path IS NULL THEN 'c'
            WHEN n.path IS NULL THEN 'd'
            ELSE 'u' END AS op,
       o.commit_seq AS old_seq,
       n.commit_seq AS seq,
       CASE WHEN n.path IS NULL THEN NULL ELSE sha256(n.content) END AS after_sha
FROM old_s o FULL OUTER JOIN new_s n ON o.repo = n.repo AND o.path = n.path
WHERE o.commit_seq IS DISTINCT FROM n.commit_seq
ORDER BY repo, path
"""


# ---------------------------------------------------------------------------
# 2. CDC-core operator analogues over the generic events table
# ---------------------------------------------------------------------------


def q_lww_upsert_events(sf_dir: str) -> pa.Table:
    """Generic keyed LWW upsert (ReplacingMergeTree analogue) applied
    to the events table: key (user_id, event_type), order event_id.
    partial fold per batch → groupby → final fold per group."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return fold_lww(t, None, ("user_id", "event_type"), "event_id")

    def final(g: pa.Table) -> pa.Table:
        w = fold_lww(g, None, ("user_id", "event_type"), "event_id")
        return pa.table(
            {
                "user_id": w.column("user_id").cast(pa.int64()),
                "event_type": w.column("event_type"),
                "last_event_id": w.column("event_id").cast(pa.int64()),
                "last_value_cents": _cents(w.column("value")),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(uids % 16, pa.int64()))

    # two-level fold: vectorized partial per block, then a SHARDED
    # final fold keyed by user hash (VERDICT r01 Wrong #9: a
    # repartition(1) fold is a single-task wall at 10^9 distinct
    # keys); group count stays 16, folds stay vectorized
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: final(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )


ORACLE_LWW = """
SELECT user_id, event_type,
       max(event_id) AS last_event_id,
       CAST(ROUND(arg_max(value, event_id) * 100) AS BIGINT) AS last_value_cents
FROM events GROUP BY user_id, event_type
"""


def q_watermark_events(sf_dir: str) -> pa.Table:
    """Watermark probe — SELECT max(number) analogue
    (reference src/ch_eth/sync.rs:341-344)."""
    ds = _read(sf_dir, "events", ["event_id"])
    agg = ds.aggregate(Max("event_id", alias_name="max_event_id"),
                       Count(alias_name="n_events"))
    return pa.table(
        {"max_event_id": [agg["max_event_id"]], "n_events": [agg["n_events"]]}
    )


def q_per_type_counts(sf_dir: str) -> pa.Table:
    """Per-key integrity counts (health_check count probes,
    reference src/ch_eth/sync.rs:204-325), pre-aggregated per batch."""
    ds = _read(sf_dir, "events", ["event_type", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("value_cents", _cents(t.column("value")))
        return (
            t.select(["event_type", "event_id", "value_cents"])
            .group_by("event_type")
            .aggregate(
                [("event_id", "count"), ("value_cents", "sum"),
                 ("event_id", "min"), ("event_id", "max")]
            )
            .rename_columns(
                ["event_type", "n", "sum_value_cents", "min_event_id", "max_event_id"]
            )
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Min("min_event_id", alias_name="min_event_id"),
            Max("max_event_id", alias_name="max_event_id"),
        )
    )


ORACLE_PER_TYPE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       min(event_id) AS min_event_id, max(event_id) AS max_event_id
FROM events GROUP BY event_type
"""

_EVENT_ORPHANS = [(1000, 1999), (5000, 5499)]


def q_orphan_filter_events(sf_dir: str) -> pa.Table:
    """Rollback orphan-range filter (reorg delete analogue) over the
    generic events table, then per-type live counts."""
    from ..stages.normalize import orphan_mask

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def live(t: pa.Table) -> pa.Table:
        seqs = t.column("event_id").to_numpy(zero_copy_only=False)
        keep = ~orphan_mask(seqs, _EVENT_ORPHANS)
        t = t.filter(pa.array(keep))
        return (
            t.group_by("event_type")
            .aggregate([("event_id", "count")])
            .rename_columns(["event_type", "n_live"])
        )

    return (
        ds.map_batches(live, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n_live", alias_name="n_live"))
    )


ORACLE_ORPHAN = """
SELECT event_type, count(*) AS n_live FROM events
WHERE event_id NOT BETWEEN 1000 AND 1999
  AND event_id NOT BETWEEN 5000 AND 5499
GROUP BY event_type
"""


def q_json_extract_events(sf_dir: str) -> pa.Table:
    """Untyped-JSON field extraction (Arbitrum extra-field analogue,
    reference src/ch_arb_one/schema.rs:72-104): pull props.k, sum per
    type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def ext(t: pa.Table) -> pa.Table:
        groups = pc.extract_regex(t.column("props"), r'"k": (?P<k>[0-9]+)')
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        k = pc.struct_field(groups, "k").cast(pa.int64())
        t = pa.table({"event_type": t.column("event_type"), "k": k})
        return (
            t.group_by("event_type")
            .aggregate([("k", "sum"), ("k", "count")])
            .rename_columns(["event_type", "sum_k", "n"])
        )

    return (
        ds.map_batches(ext, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))
    )


ORACLE_JSON = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_explode_embeddings(sf_dir: str) -> pa.Table:
    """List explode (flat_map) — the topics/withdrawals explode analogue
    (reference src/ch_eth/schema.rs:165-190): (vec_id, pos, val)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("vec_id"), 20))
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64()),
                 "val": pa.array([], pa.float64())}
            )
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lens = np.asarray([len(v) for v in emb])
        vec_ids = np.repeat(
            t.column("vec_id").to_numpy(zero_copy_only=False), lens
        )
        pos = np.concatenate([np.arange(n) for n in lens])
        flat = emb.flatten().cast(pa.float64())
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "val": flat,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_EXPLODE = """
SELECT vec_id,
       UNNEST(range(len(embedding))) AS pos,
       CAST(UNNEST(embedding) AS DOUBLE) AS val
FROM embeddings WHERE vec_id < 20
"""


def q_spread_embeddings(sf_dir: str) -> pa.Table:
    """List → fixed sparse columns (the reference's topics Vec →
    topic0..topic3 spread, src/ch_eth/schema.rs:165-190): first 4
    embedding elements as e0..e3 columns."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def spread(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        cols = {"vec_id": t.column("vec_id").cast(pa.int64())}
        for i in range(4):
            cols[f"e{i}"] = pc.list_element(emb, i).cast(pa.float64())
        return pa.table(cols)

    return ds.map_batches(spread, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SPREAD = """
SELECT vec_id,
       CAST(embedding[1] AS DOUBLE) AS e0, CAST(embedding[2] AS DOUBLE) AS e1,
       CAST(embedding[3] AS DOUBLE) AS e2, CAST(embedding[4] AS DOUBLE) AS e3
FROM embeddings
"""


def q_demux_events(sf_dir: str) -> pa.Table:
    """Type demux (the Tron 40-way contract demultiplexer,
    src/ch_tron/init.rs:374-820): one tagging pass + partitioned write
    fans events into per-type sub-tables; returns per-type row/file
    counts read back from the demuxed layout."""
    import shutil

    from .demux import demux_to_tables

    out_dir = f"/tmp/w3r_demux/{hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    info = demux_to_tables(ds, "event_type", out_dir)
    types = sorted(info)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n": pa.array([info[t]["rows"] for t in types], pa.int64()),
        }
    )


ORACLE_DEMUX = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_session_windows(sf_dir: str) -> pa.Table:
    """Gap-based sessionization (streaming-window operator family): a
    new session starts after >30 min of user inactivity.  Key-bucketed
    (user hash) groupby; inside each bucket the session assignment is
    ONE vectorized pass (lexsort + gap diff + cumsum + reduceat) over
    all users at once — partitioning assumption: all events of one
    user land in one group (guaranteed by the user-hash key)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(uids % 16, pa.int64()))

    def sessions(g: pa.Table) -> pa.Table:
        uids = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uids))
        uids, ts = uids[order], ts[order]
        n = len(uids)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uids[1:] != uids[:-1]
        gap = np.ones(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > _SESSION_GAP_US
        starts_mask = new_user | gap
        starts = np.flatnonzero(starts_mask)
        counts = np.diff(np.concatenate((starts, [n])))
        ends = np.concatenate((starts[1:], [n])) - 1
        return pa.table(
            {
                "user_id": pa.array(uids[starts], pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()),
                "session_end": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: sessions(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )


ORACLE_SESSIONS = """
WITH s AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT *, SUM(is_start) OVER (
      PARTITION BY user_id ORDER BY tus, event_id
      ROWS UNBOUNDED PRECEDING) AS sess
  FROM s
)
SELECT user_id, min(tus) AS session_start, max(tus) AS session_end,
       count(*) AS n_events
FROM g GROUP BY user_id, sess
"""


def q_hourly_user_activity(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate (event-time hour buckets) — the
    streaming-window pattern the reference lacks (SURVEY.md §2.9 W5),
    expressed as bucket column + grouped aggregate."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        g = pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "hour": hour,
                "value_cents": _cents(t.column("value")),
            }
        )
        return (
            g.group_by(["user_id", "hour"])
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["user_id", "hour", "sum_value_cents", "n"])
        )

    from ..functions.window import keyed_window, segment_starts

    partials = ds.map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # final fold via the keyed exchange (sort-based two-key groupby on
    # the partials measured ~10x slower at 20M rows — see BASELINE.md)
    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        hour = g.column("hour").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s = g.column("sum_value_cents").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((hour, uid))
        key_change = np.ones(len(uid), dtype=bool)
        if len(uid):
            key_change[1:] = (uid[order][1:] != uid[order][:-1]) | (
                hour[order][1:] != hour[order][:-1]
            )
        starts = np.flatnonzero(key_change)
        return pa.table(
            {
                "user_id": pa.array(uid[order][starts], pa.int64()),
                "hour": pa.array(hour[order][starts], pa.int64()).cast(
                    g.column("hour").type
                ),
                "sum_value_cents": pa.array(
                    np.add.reduceat(s[order], starts)
                    if len(starts) else np.zeros(0, np.int64),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.add.reduceat(n[order], starts)
                    if len(starts) else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    return keyed_window(partials, "user_id", fold)


ORACLE_HOURLY = """
SELECT user_id, date_trunc('hour', ts) AS hour,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       count(*) AS n
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def q_priority_sample_events(sf_dir: str) -> pa.Table:
    """Weighted sampling without a random side-channel (priority
    sampling, Duffield et al.: priority = weight / uniform; top-k by
    priority ≈ probability-proportional-to-size) — the data-mixing
    primitive for weighted corpus blending.  The 'uniform' is the
    event's sha256 prefix scaled to (0,1], so the draw is reproducible
    and SQL-mirrorable; distributed as per-batch partial top-k →
    tiny ordered merge.  Deterministic tie-break by event_id."""
    K = 100
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        sha = sha256_hex(t.column("event_id").cast(pa.string()))
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        if t.num_rows:
            offs = np.frombuffer(sha.buffers()[1], np.int32)[
                sha.offset : sha.offset + len(sha)
            ]
            data = np.frombuffer(sha.buffers()[2], np.uint8)
            u = np.zeros(len(sha), np.int64)
            for i in range(15):
                b = data[offs + i].astype(np.int64)
                u = (u << 4) | (b - 48 - 39 * (b >= 97))
        else:
            u = np.zeros(0, np.int64)
        # uniform in (0, 1]: (prefix + 1) / 2^60
        uni = (u.astype(np.float64) + 1.0) / float(1 << 60)
        w = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        prio = w.astype(np.float64) / uni
        t = t.append_column("priority", pa.array(prio, pa.float64()))
        return t.sort_by(
            [("priority", "descending"), ("event_id", "ascending")]
        ).slice(0, K)

    top = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort([("priority"), ("event_id")], descending=[True, False])
        .limit(K)
        .take_all()
    )
    t = _from_rows(top, {"event_id": pa.int64(), "value": pa.float64()})
    return pa.table(
        {
            "event_id": t.column("event_id"),
            "value_cents": _cents(t.column("value")),
        }
    ).sort_by("event_id")


ORACLE_PRIORITY_SAMPLE = """
WITH p AS (
  SELECT event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
         CAST(ROUND(value * 100) AS BIGINT) /
           ((CAST('0x' || substr(sha256(CAST(event_id AS VARCHAR)), 1, 15)
                  AS BIGINT) + 1.0) / 1152921504606846976.0)
           AS priority
  FROM events
)
SELECT event_id, value_cents FROM p
ORDER BY priority DESC, event_id LIMIT 100
"""


def q_stratified_sample_events(sf_dir: str) -> pa.Table:
    """Deterministic STRATIFIED sample — exactly 3 events per user,
    chosen by content-hash rank within each stratum (reproducible,
    no seed side-channel, every stratum represented regardless of
    size skew).  One keyed bucket exchange; per-bucket lexsort by
    (user, sha) + segment row numbers."""
    from ..functions.window import keyed_window, row_numbers, segment_starts

    K = 3
    ds = _read(sf_dir, "events", ["user_id", "event_id"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        sha = sha256_hex(g.column("event_id").cast(pa.string()))
        sha_np = np.asarray(sha.to_pylist())
        order = np.lexsort((sha_np, uid))
        uid_s = uid[order]
        starts = segment_starts(uid_s)
        keep = row_numbers(starts) <= K
        sel = order[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_id": g.column("event_id").take(
                    pa.array(sel, pa.int64())
                ).cast(pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_STRATIFIED = """
SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY sha256(CAST(event_id AS VARCHAR))) AS rn
  FROM events
) WHERE rn <= 3
"""


def q_hash_sample_events(sf_dir: str) -> pa.Table:
    """Deterministic uniform random sample WITHOUT a seed side-channel:
    rank rows by a value-pure hash (sha256 of the id) and keep the
    k smallest — reproducible across engines, so the oracle is plain
    SQL.  Distributed as partial top-k per batch → tiny final merge
    (the same shape as top_events; never a full-table sort)."""
    ds = _read(sf_dir, "events", ["event_id"])
    K = 200

    def partial(t: pa.Table) -> pa.Table:
        r = sha256_hex(t.column("event_id").cast(pa.string()))
        t = t.append_column("rank_hash", r)
        return t.sort_by([("rank_hash", "ascending")]).slice(0, K)

    top = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort("rank_hash")
        .limit(K)
    )
    t = pa.Table.from_pylist(top.take_all())
    return pa.table(
        {"event_id": t.column("event_id").cast(pa.int64())}
    ).sort_by([("event_id", "ascending")])


ORACLE_HASH_SAMPLE = """
SELECT event_id FROM (
  SELECT event_id FROM events
  ORDER BY sha256(CAST(event_id AS VARCHAR)) LIMIT 200
) ORDER BY event_id
"""


def q_systematic_sample_events(sf_dir: str) -> pa.Table:
    """Deterministic systematic sampling (every 20th event by id) —
    reproducible sampling for training-data subsetting."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 20 == 0))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SAMPLE = """
SELECT event_id, event_type FROM events WHERE event_id % 20 = 0
"""


def q_distinct_langs(sf_dir: str) -> pa.Table:
    """Distinct values (set op) over documents."""
    ds = _read(sf_dir, "documents", ["lang"])
    vals = sorted(ds.unique("lang"))
    return pa.table({"lang": pa.array(vals, pa.string())})


ORACLE_DISTINCT = "SELECT DISTINCT lang FROM documents"


def q_distinct_users_per_type(sf_dir: str) -> pa.Table:
    """Distinct-count aggregate: per-batch distinct pairs (combiner) →
    global pair dedup → count per key.  The mergeable-partial pattern
    that generalizes to sketches (HLL) at 10^10 scale."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    partials = ds.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    # keyed exchange on user co-locates every copy of a (type, user)
    # pair in one bucket: distinct inside the bucket, then only the
    # per-(bucket, type) counts — a handful of rows — reach the final
    # tiny groupby.  (Sort-based two-key groupby on the pair partials
    # is the 10x-slower path, see BASELINE.md.)
    from ..functions.window import keyed_window

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").combine_chunks()
        vocab = pa.array(sorted(pc.unique(et).to_pylist()))
        codes = pc.index_in(et, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        V = np.int64(len(vocab))
        distinct = np.unique(uid * V + codes)
        cnt = np.bincount(
            (distinct % V).astype(np.int64), minlength=int(V)
        )
        return pa.table(
            {
                "event_type": vocab,
                "n_users": pa.array(cnt, pa.int64()),
            }
        )

    return (
        keyed_window(partials, "user_id", fold)
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def q_hourly_distinct_users(sf_dir: str) -> pa.Table:
    """Windowed distinct: per event-time hour, the exact number of
    distinct users — tumbling window + the bucketed distinct-count
    fold (all copies of a (hour, user) pair co-locate in the user's
    bucket; only per-(bucket, hour) counts reach the final tiny
    groupby)."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return (
            pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "hour": hour}
            )
            .group_by(["user_id", "hour"])
            .aggregate([])
        )

    partials = ds.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        hour = g.column("hour").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hours = np.unique(hour)
        code = np.searchsorted(hours, hour)
        H = np.int64(len(hours))
        distinct = np.unique(uid * H + code)
        cnt = np.bincount((distinct % H).astype(np.int64), minlength=int(H))
        return pa.table(
            {
                "hour": pa.array(hours, pa.int64()).cast(
                    g.column("hour").type
                ),
                "n_users": pa.array(cnt, pa.int64()),
            }
        )

    return (
        keyed_window(partials, "user_id", fold)
        .groupby("hour")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


ORACLE_HOURLY_DISTINCT = """
SELECT date_trunc('hour', ts) AS hour,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_hourly_retention(sf_dir: str) -> pa.Table:
    """Retention cohorts without a self-join: per hour h, how many of
    its active users are also active in h+1.  One keyed exchange on
    user co-locates each user's distinct hours; a sorted-segment
    adjacent-difference finds consecutive-hour presences vectorized
    across all users at once; only per-(bucket, hour) counts reach the
    final tiny groupby."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    HOUR_US = 3_600 * 1_000_000

    def pairs(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return (
            pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "hour_us": hour.cast(pa.int64())}
            )
            .group_by(["user_id", "hour_us"])
            .aggregate([])
        )

    partials = ds.map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        hr = g.column("hour_us").to_numpy(zero_copy_only=False)
        # composite packing bounds: 41-bit user ids x 22-bit hour
        # slots (epoch-hours < 2^22 holds through year ~2447)
        if len(uid) and int(uid.max()) >= (1 << 41):
            raise ValueError("user_id >= 2^41 breaks the 22-bit packing; "
                             "use a wider composite")
        # global distinct within the bucket (partials may repeat pairs)
        key = np.unique(
            uid.astype(np.int64) * np.int64(1 << 22)
            + (hr // HOUR_US) % np.int64(1 << 22)
        )
        # decode keeping (user, hour-slot) sorted user-major
        u = key >> np.int64(22)
        slot = key & np.int64((1 << 22) - 1)
        starts = segment_starts(u)
        nxt = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            nxt[:-1] = (~starts[1:]) & (slot[1:] == slot[:-1] + 1)
        retained_slots = slot[nxt]
        slots_u, cnt = (
            np.unique(retained_slots, return_counts=True)
            if len(retained_slots)
            else (np.zeros(0, np.int64), np.zeros(0, np.int64))
        )
        return pa.table(
            {
                "hour_slot": pa.array(slots_u.astype(np.int64), pa.int64()),
                "n_retained": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    folded = (
        keyed_window(partials, "user_id", fold)
        .groupby("hour_slot")
        .aggregate(Sum("n_retained", alias_name="n_retained"))
    )

    def finish(t: pa.Table) -> pa.Table:
        slots = t.column("hour_slot").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(slots * HOUR_US, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_retained": t.column("n_retained"),
            }
        )

    return folded.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


ORACLE_RETENTION = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
)
SELECT a.hour, count(*) AS n_retained
FROM uh a JOIN uh b
  ON a.user_id = b.user_id AND b.hour = a.hour + INTERVAL 1 HOUR
GROUP BY a.hour
"""


ORACLE_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_approx_distinct_users_per_type(sf_dir: str) -> pa.Table:
    """Sketched distinct (VERDICT r01 Missing #5): the exact operator
    above ships every distinct pair through the shuffle; the HLL path
    ships one 4 KiB register row per (type, batch) regardless of
    cardinality — the 10^10-scale pattern.  ~1.6% standard error
    (p=12); accuracy asserted vs the exact count in tests."""
    from ..functions.sketch import hll_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    rows = hll_distinct(ds, ["event_type"], "user_id").take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "n_users": pa.array([r["approx_distinct"] for r in rows], pa.int64()),
        }
    )


def q_approx_quantiles_value(sf_dir: str) -> pa.Table:
    """Mergeable bottom-k-sample quantile sketch per event_type
    (rank-space error ~1/sqrt(k); accuracy asserted vs exact in
    tests).  The shuffle moves at most k sample rows per (type,
    batch) regardless of row count — the sketch family companion to
    the HLL distinct."""
    from ..functions.sketch import approx_quantiles

    ds = _read(sf_dir, "events", ["event_type", "value"])
    rows = approx_quantiles(
        ds, ["event_type"], "value", qs=(0.5, 0.9), k=2048
    ).take_all()
    rows.sort(key=lambda r: (r["event_type"], r["q"]))
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "q": pa.array([r["q"] for r in rows], pa.float64()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
        }
    )


def q_normalized_text_sha(sf_dir: str) -> pa.Table:
    """Text normalization (casefold) + content hash — the canonical-
    form fingerprint used before exact dedup of noisy corpora."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "norm_sha256": sha256_hex(pc.utf8_lower(t.column("text"))),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_NORM_SHA = "SELECT doc_id, sha256(lower(text)) AS norm_sha256 FROM documents"


def q_dedup_keep_best_documents(sf_dir: str) -> pa.Table:
    """Dedup with representative SELECTION: cluster by normalized-text
    sha, keep the member with the highest quality score (ties → lowest
    doc_id) — the standard corpus rule "of N near-identical crawls,
    keep the best one", vs exact_dedup_documents' keep-any-first.

    Shape: per-batch partial fold (winner + count per sha, vectorized
    Arrow sort + run-boundary scan, no Python per group) → one sha-hash
    bucket exchange → identical final fold, counts summed by reduceat.
    Shuffle volume is one row per (sha, batch), not per doc."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    NB = 32

    def _fold(tb: pa.Table) -> pa.Table:
        tb = tb.sort_by(
            [
                ("norm_sha256", "ascending"),
                ("quality", "descending"),
                ("doc_id", "ascending"),
            ]
        )
        s = tb.column("norm_sha256").combine_chunks()
        n = len(s)
        if n == 0:
            return tb
        neq = pc.not_equal(s.slice(1), s.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.concatenate(([True], neq))
        starts = np.flatnonzero(first)
        cnt = tb.column("cluster_size").to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(cnt, starts)
        win = tb.take(pa.array(starts, pa.int64()))
        return pa.table(
            {
                "doc_id": win.column("doc_id"),
                "norm_sha256": win.column("norm_sha256"),
                "cluster_size": pa.array(sums, pa.int64()),
                "quality": win.column("quality"),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        q = quality_score(t)
        # canonical form: lower + collapse whitespace runs + trim — so
        # case/spacing variants cluster together while their ORIGINAL
        # text quality still differs (what makes "keep best" real)
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t.column("text")), r"\s+", " "
            )
        )
        nsha = sha256_hex(norm)
        tb = pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "norm_sha256": nsha,
                "cluster_size": pa.array(
                    np.ones(t.num_rows, np.int64), pa.int64()
                ),
                "quality": q.column("quality"),
            }
        )
        out = _fold(tb)
        h = key_hash64(out.column("norm_sha256"))
        return out.append_column(
            "__b", pa.array((h % np.uint64(NB)).astype(np.int64), pa.int64())
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: _fold(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )


ORACLE_DEDUP_KEEP_BEST = r"""
WITH m AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits
  FROM documents
), c AS (
  SELECT doc_id,
         sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS norm_sha256,
         least(n_chars / 200.0, 1.0) * 0.4
       + least(n_tokens / 40.0, 1.0) * 0.4
       + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1
       + (1.0 - least(n_digits / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1
         AS quality
  FROM m
), r AS (
  SELECT doc_id, norm_sha256, quality,
         row_number() OVER (
           PARTITION BY norm_sha256 ORDER BY quality DESC, doc_id
         ) AS rn,
         count(*) OVER (PARTITION BY norm_sha256) AS csz
  FROM c
)
SELECT doc_id, norm_sha256, csz::BIGINT AS cluster_size, quality
FROM r WHERE rn = 1
"""


def q_top2_per_user(sf_dir: str) -> pa.Table:
    """Group-wise top-k (window-function family): each user's top-2
    events by value.  Partial top-2 per batch → final top-2 per user —
    no per-group task fan-out."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def topk(t: pa.Table, k: int = 2) -> pa.Table:
        t = t.sort_by(
            [("user_id", "ascending"), ("value", "descending"),
             ("event_id", "ascending")]
        )
        import numpy as np_

        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        first = np_.ones(len(uids), dtype=bool)
        first[1:] = uids[1:] != uids[:-1]
        ranks = np_.arange(len(uids)) - np_.maximum.accumulate(
            np_.where(first, np_.arange(len(uids)), 0)
        )
        return t.filter(pa.array(ranks < k))

    def bucketize(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(uids % 16, pa.int64()))

    def final_fold(g: pa.Table) -> pa.Table:
        w = topk(g.drop_columns(["__b"]))
        return pa.table(
            {
                "user_id": w.column("user_id").cast(pa.int64()),
                "event_id": w.column("event_id").cast(pa.int64()),
                "value_cents": _cents(w.column("value")),
            }
        )

    # distributed second fold (VERDICT r01 Wrong #4): partials are <=2
    # rows per (user, batch); the user-hash groupby shards the final
    # fold so the driver sees only finished rows
    return (
        ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(final_fold, batch_format="pyarrow")
    )


ORACLE_TOP2 = """
SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 2
"""


def q_top_events(sf_dir: str) -> pa.Table:
    """Global top-k with deterministic tie-break.  Per-batch partial
    top-k first (VERDICT r01 Wrong #5): the all-to-all sort sees only
    batches × k rows, never the full table."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    K = 100

    def partial(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("value", "descending"), ("event_id", "ascending")]
        ).slice(0, K)

    top = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort([("value"), ("event_id")], descending=[True, False])
        .limit(K)
    )
    t = pa.Table.from_pylist(top.take_all())
    return pa.table(
        {
            "event_id": t.column("event_id").cast(pa.int64()),
            "value_cents": _cents(t.column("value")),
        }
    )


ORACLE_TOP = """
SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
FROM events ORDER BY value DESC, event_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# 3. Hash / dedup / text-analysis operators over documents
# ---------------------------------------------------------------------------


def q_sha256_documents(sf_dir: str) -> pa.Table:
    """Scalar hash kernel (stored-hash invariant, BASELINE.json)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text_sha256": sha256_hex(t.column("text")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_SHA = "SELECT doc_id, sha256(text) AS text_sha256 FROM documents"


def q_exact_dedup_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_groups(ds)


ORACLE_DEDUP = """
SELECT sha256(text) AS text_sha256, min(doc_id) AS rep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def q_exact_dedup_keep(sf_dir: str) -> pa.Table:
    """Exact-dedup KEEP-LIST: the corpus with every non-representative
    exact duplicate dropped (representative = min doc_id per text).
    Distributed: rep-id set broadcast when small, distributed semi
    join past ``_KEEP_BROADCAST_MAX`` (see ``_filter_to_reps``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # reps is the SMALL fold output, consumed twice (count + filter)
    reps = exact_dedup_groups(ds).materialize()
    out = _filter_to_reps(ds, reps).select_columns(["doc_id"])
    return _from_rows(out.take_all(), {"doc_id": pa.int64()}).sort_by(
        "doc_id"
    )


ORACLE_DEDUP_KEEP = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
"""


def q_token_stats_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_stats(t).select(
            ["doc_id", "n_chars_calc", "n_tokens", "n_punct", "n_digits"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_TOKENS = r"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_extract_all(text, '\w+')) AS n_tokens,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits
FROM documents
"""


def q_top_tokens_documents(sf_dir: str) -> pa.Table:
    """Corpus wordcount, top-50 tokens: per-batch Arrow tokenize +
    hash group-by (the shuffle moves one row per distinct token per
    batch, never token instances), keyed-exchange fold over the token
    string, per-bucket top-k partial, tiny final merge.  Deterministic
    tie-break (count desc, token asc)."""
    from ..functions.window import keyed_window, segment_starts

    K = 50
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return (
            pa.table({"token": flat})
            .group_by("token")
            .aggregate([("token", "count")])
            .rename_columns(["token", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        # numeric bucket key for the keyed exchange
        lambda t: t.append_column(
            "tok_h",
            pa.array(
                (key_hash64(t.column("token")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def fold_topk(g: pa.Table) -> pa.Table:
        combined = (
            g.select(["token", "n"])
            .group_by("token")
            .aggregate([("n", "sum")])
            .rename_columns(["token", "n"])
        )
        return combined.sort_by(
            [("n", "descending"), ("token", "ascending")]
        ).slice(0, K)

    top = keyed_window(partials, "tok_h", fold_topk)
    t = _from_rows(top.take_all(), {"token": pa.string(), "n": pa.int64()})
    return t.sort_by(
        [("n", "descending"), ("token", "ascending")]
    ).slice(0, K)


ORACLE_TOP_TOKENS = r"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS token
  FROM documents
) WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


def q_pii_scan_documents(sf_dir: str) -> pa.Table:
    """PII pre-pass: per-document email/URL/IPv4/long-digit-run counts
    (see functions/text.py::pii_scan) — identical RE2 patterns run on
    both sides."""
    from ..functions.text import pii_scan

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pii_scan(t).select(
            ["doc_id", "n_emails", "n_urls", "n_ipv4", "n_long_digits"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_PII = r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
       len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
       len(regexp_extract_all(text, '\d{9,}')) AS n_long_digits
FROM documents
"""


def q_doc_quality(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: quality_score(t).select(["doc_id", "quality"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_QUALITY = r"""
WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits
  FROM documents
)
SELECT doc_id,
       least(n_chars / 200.0, 1.0) * 0.4
     + least(n_tokens / 40.0, 1.0) * 0.4
     + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1
     + (1.0 - least(n_digits / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1 AS quality
FROM c
"""


#: shingles shared by more docs than this are dropped from pair
#: generation (stop-phrase df cap, standard in dedup literature —
#: VERDICT r01 Wrong #8: one stop shingle with df 10^5 is 5·10^9
#: pairs).  Mirrored in the SQL oracle; a no-op on the fixtures
#: (max df is 25 at sf0.1) so parity is exact.
_NGRAM_DF_CAP = 1000


def _doc_shingles(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(shingle_hash int64, doc_id int64) of per-doc DISTINCT word-
    3-shingles, fully vectorized (token-hash stream + k-gram combine
    + per-doc unique).  64-bit hashed shingles stand in for the
    strings: collision probability ~ (#shingles)²/2^64 ≈ 0."""
    from ..functions.text import token_hash_stream

    h, parents = token_hash_stream(t.column("text"))
    k = 3
    if len(h) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    K = np.uint64(1099511628211)
    m = len(h) - k + 1
    sh = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        sh = sh * K + h[j : m + j]
    valid = parents[:m] == parents[k - 1 :]
    sh = sh[valid]
    shp = parents[:m][valid]
    order = np.lexsort((sh, shp))
    sh, shp = sh[order], shp[order]
    keep = np.concatenate(
        ([True], (sh[1:] != sh[:-1]) | (shp[1:] != shp[:-1]))
    ) if len(sh) else np.zeros(0, bool)
    sh, shp = sh[keep], shp[keep]
    docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return (sh >> np.uint64(1)).astype(np.int64), docs[shp]


def _shingle_pair_rows(ds, NB: int, PB: int):
    """Shared first two stages of the exact set-overlap family
    (`ngram_jaccard_pairs`, `ngram_containment_pairs`): hashed-shingle
    explode (each row carrying its doc's distinct-shingle count —
    sizes are batch-local, so they travel WITH the data instead of
    through a join) → per-bucket run pairs with a df cap.  Returns the
    pair-bucket-keyed Dataset (id_a, id_b, na, nb, __pb); callers
    regroup by __pb and apply their own overlap criterion."""

    def shingle_rows(t: pa.Table) -> pa.Table:
        sh, ids = _doc_shingles(t)
        if not len(ids):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "__b": pa.array([], pa.int64())}
            )
        # per-doc distinct-shingle count, batch-local (docs never span
        # batches): rides every shingle row as `n`
        uniq, counts = np.unique(ids, return_counts=True)
        n_of = counts[np.searchsorted(uniq, ids)]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(sh, pa.int64()),
                "n": pa.array(n_of, pa.int64()),
                "__b": pa.array(sh % NB, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64()),
             "__pb": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        sh = group.column("s").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        szs = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids, szs = sh[order], ids[order], szs[order]
        starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        lens = np.diff(np.concatenate((starts, [len(sh)])))
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, ln in zip(starts, lens):
            if ln < 2 or ln > _NGRAM_DF_CAP:
                continue  # singleton or stop-phrase shingle
            run = ids[s : s + ln]  # distinct + ascending by construction
            rsz = szs[s : s + ln]
            iu, ju = np.triu_indices(len(run), k=1)
            out_a.append(run[iu])
            out_b.append(run[ju])
            out_na.append(rsz[iu])
            out_nb.append(rsz[ju])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "na": pa.array(np.concatenate(out_na), pa.int64()),
                "nb": pa.array(np.concatenate(out_nb), pa.int64()),
                "__pb": pa.array((a * np.int64(2654435761) + b) % PB, pa.int64()),
            }
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def _pair_overlap_counts(group: pa.Table):
    """Vectorized run count over one pair bucket: one row per distinct
    (id_a, id_b) with n_inter and the size columns; None for an empty
    bucket."""
    if group.num_rows == 0:
        return None
    a = group.column("id_a").to_numpy(zero_copy_only=False)
    b = group.column("id_b").to_numpy(zero_copy_only=False)
    na = group.column("na").to_numpy(zero_copy_only=False)
    nb = group.column("nb").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, na, nb = a[order], b[order], na[order], nb[order]
    starts = np.flatnonzero(
        np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    )
    ni = np.diff(np.concatenate((starts, [len(a)])))
    return a[starts], b[starts], na[starts], nb[starts], ni


def _exact_jaccard_pairs_ds(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact word-3-shingle Jaccard >= 0.5 pairs as a streaming Dataset
    — the two-shuffle exchange shared by `ngram_jaccard_pairs` (which
    materializes the pair table) and `jaccard_clusters` /
    `triangle_count_pairs` (which keep composing distributed stages on
    top of it, so the pairs must stay out of the driver)."""

    def count_and_filter(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
        )
        counts = _pair_overlap_counts(group)
        if counts is None:
            return empty
        a, b, na, nb, ni = counts
        nu = na + nb - ni
        keep = 2 * ni >= nu
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "n_inter": pa.array(ni[keep], pa.int64()),
                "n_union": pa.array(nu[keep], pa.int64()),
            }
        )

    return (
        _shingle_pair_rows(ds, 64, 32)
        .groupby("__pb")
        .map_groups(count_and_filter, batch_format="pyarrow")
    )


def q_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact word-3-shingle Jaccard >= 0.5 pairs, fully distributed in
    TWO shuffles (`_shingle_pair_rows`) + a pair-bucket regroup where a
    vectorized run count yields n_inter and the sizes riding the pair
    rows yield n_union.  No driver-side size dict, no composite-key
    aggregate (measured 8x slower than the bucketed vectorized count).
    Integer counts only → exact SQL parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = _exact_jaccard_pairs_ds(ds).take_all()
    return pa.Table.from_pylist(rows).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    ) if rows else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
    )


ORACLE_NGRAM = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- stop-phrase df cap, mirrored from the engine (_NGRAM_DF_CAP):
-- shingles shared by more than 1000 docs are excluded from pair
-- generation (no-op on the fixtures; union sizes keep all shingles)
live AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, sa.n + sb.n - n_inter AS n_union
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 2 * n_inter >= sa.n + sb.n - n_inter
"""


def q_ngram_containment_pairs(sf_dir: str) -> pa.Table:
    """Exact word-3-shingle CONTAINMENT >= 0.9 pairs (Broder's
    asymmetric resemblance): n_inter / min(|A|, |B|) — the dedup
    criterion that catches a short document embedded inside a long one
    (quote pages, chunked mirrors), which symmetric Jaccard misses
    because the union is dominated by the long side.  Same two-shuffle
    exchange as `ngram_jaccard_pairs` (`_shingle_pair_rows`); only the
    per-pair-bucket criterion differs, in integer math (10*ni >=
    9*min).  Integer outputs → exact SQL parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_and_filter(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "n_inter": pa.array([], pa.int64()), "n_small": pa.array([], pa.int64())}
        )
        counts = _pair_overlap_counts(group)
        if counts is None:
            return empty
        a, b, na, nb, ni = counts
        n_small = np.minimum(na, nb)
        keep = 10 * ni >= 9 * n_small
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "n_inter": pa.array(ni[keep], pa.int64()),
                "n_small": pa.array(n_small[keep], pa.int64()),
            }
        )

    rows = (
        _shingle_pair_rows(ds, 64, 32)
        .groupby("__pb")
        .map_groups(count_and_filter, batch_format="pyarrow")
        .take_all()
    )
    return pa.Table.from_pylist(rows).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    ) if rows else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "n_inter": pa.array([], pa.int64()), "n_small": pa.array([], pa.int64())}
    )


ORACLE_NGRAM_CONTAIN = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, least(sa.n, sb.n) AS n_small
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 10 * n_inter >= 9 * least(sa.n, sb.n)
"""


# ---------------------------------------------------------------------------
# 4. Similarity search over embeddings
# ---------------------------------------------------------------------------


def _load_queries(sf_dir: str, n: int = 5):
    t = pq.read_table(_tbl(sf_dir, "embeddings"))
    t = t.filter(pc.less(t.column("vec_id"), n))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    return ids, mat


def q_knn_cosine(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-10 for the first 5 vectors (broadcast
    query matrix, per-batch float64 matmul, driver-side k-merge)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_brute(ds, ids, mat, k=10)
    return out.select(["query_id", "neighbor_id", "rank"])


ORACLE_KNN = """
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 5
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10
"""


def q_knn_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN (trained coarse quantizer — the data-adaptive companion
    to knn_lsh): top-10 for the first 5 vectors probing 6/16 cells.
    Recall vs knn_brute measured in tests (0.9 at 25% cells on
    clustered data; ~probed-fraction on this near-random fixture)."""
    from ..functions.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_ivf(ds, ids, mat, k=10, n_centroids=16, n_probe=6)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_embedding_neardup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs (tau=0.4 for this synthetic
    data; margin to the threshold verified >> float error).  Exact via
    the distributed block-pair exchange — no driver-side matrix."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_neardup_pairs(ds, tau=0.4)
    return out.select(["id_a", "id_b"])


def q_embedding_neardup_lsh(sf_dir: str) -> pa.Table:
    """Corpus-scale approximate variant: exact cosine only within
    hyperplane-LSH buckets; recall measured in tests.  tau=0.4 is a
    LOW-similarity regime (angle ~66°), so collision probability per
    plane is only ~0.63 — few planes, many tables keeps recall ~0.9;
    a real near-dup run (tau>=0.95) would use 8+ planes for stronger
    pruning."""
    from ..functions.similarity import cosine_neardup_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_neardup_lsh(ds, tau=0.4, n_planes=3, n_tables=8)
    return out.select(["id_a", "id_b"])


ORACLE_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


# ---------------------------------------------------------------------------
# 5. Broadcast join (small-side lookup, no shuffle)
# ---------------------------------------------------------------------------


def q_broadcast_join_segment(sf_dir: str) -> pa.Table:
    """orders ⋈ customer via broadcast Arrow arrays (ray.put once,
    vectorized ``pc.index_in`` + ``take`` per batch — no per-row
    Python loop; VERDICT r01 Wrong #6)."""
    import ray as _ray

    cust = pq.read_table(_tbl(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    lookup_ref = _ray.put(
        (cust.column("c_custkey").combine_chunks(),
         cust.column("c_mktsegment").combine_chunks())
    )
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join(t: pa.Table) -> pa.Table:
        keys, vals = _ray.get(lookup_ref)
        idx = pc.index_in(t.column("o_custkey"), keys)
        seg = pc.take(vals, idx)
        t = pa.table(
            {"c_mktsegment": seg, "price_cents": _cents(t.column("o_totalprice"))}
        )
        return (
            t.group_by("c_mktsegment")
            .aggregate([("price_cents", "sum"), ("price_cents", "count")])
            .rename_columns(["c_mktsegment", "sum_price_cents", "n_orders"])
        )

    return (
        ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


ORACLE_BROADCAST = """
SELECT c_mktsegment,
       CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_tpch_q1(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary (grouped aggregate benchmark
    headline), integer-cents sums for exact parity."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        g = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_cents": _cents(t.column("l_quantity")),
                "price_cents": _cents(t.column("l_extendedprice")),
                "disc_price_cents": _cents(disc_price),
            }
        )
        return (
            g.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("qty_cents", "sum"), ("price_cents", "sum"),
                 ("disc_price_cents", "sum"), ("qty_cents", "count")]
            )
            .rename_columns(
                ["l_returnflag", "l_linestatus", "sum_qty_cents",
                 "sum_base_price_cents", "sum_disc_price_cents", "count_order"]
            )
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q6(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style forecasting revenue change: pure filter +
    global sum — the read-pruning showcase (3 columns of lineitem
    leave storage, one int per batch leaves each task)."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
                    pc.less_equal(t.column("l_discount"), pa.scalar(0.07)),
                ),
                pc.less(t.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        t = t.filter(mask)
        rev = _cents(pc.multiply(t.column("l_extendedprice"),
                                 t.column("l_discount")))
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_cents": pa.array([s], pa.int64())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    total = parts.aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    return pa.table(
        {"revenue_cents": pa.array([total["revenue_cents"]], pa.int64())}
    )


ORACLE_Q6 = """
SELECT CAST(sum(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q3(sf_dir: str) -> pa.Table:
    """TPC-H Q3-style shipping-priority: broadcast semi-filter
    (qualifying custkeys via ray.put — the dimension side is tiny
    next to lineitem at any scale) → bucketed hash join lineitem x
    filtered orders → per-batch partial revenue pre-agg → one
    groupby over (orderkey, date, priority) → per-batch partial
    top-10 → tiny final merge.  The composition showcase: every
    stage is an operator this engine already ships."""
    from ..functions.joins import hash_join

    cutoff = pa.scalar(np.datetime64("1998-06-01", "us"))
    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(
        pc.equal(cust.column("c_mktsegment"), pa.scalar("BUILDING"))
    ).column("c_custkey").to_numpy(zero_copy_only=False)
    keys_ref = ray.put(np.sort(keys))

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def filter_orders(t: pa.Table) -> pa.Table:
        ck = ray.get(keys_ref)
        sel = np.isin(
            t.column("o_custkey").to_numpy(zero_copy_only=False), ck
        ) & pc.less(t.column("o_orderdate"), cutoff).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(sel)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"])

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("l_shipdate"), cutoff)).drop_columns(["l_shipdate"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    forders = orders.map_batches(
        filter_orders, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def partial_rev(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                    "o_orderpriority": t.column("o_orderpriority"),
                    "revenue_cents": rev,
                }
            )
            .group_by(["l_orderkey", "o_orderdate", "o_orderpriority"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["l_orderkey", "o_orderdate", "o_orderpriority",
                 "revenue_cents"]
            )
        )

    K = 10
    from ..functions.window import keyed_window, segment_starts

    # (o_orderdate, o_orderpriority) are functions of l_orderkey, so
    # the final fold keys on orderkey alone through the hash-bucket
    # exchange (sort-based multi-key groupby is the 10x-slower path,
    # see BASELINE.md); date/priority ride along via segment-first
    def fold(g: pa.Table) -> pa.Table:
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        starts = np.flatnonzero(segment_starts(ok_s))
        first = order[starts]
        return pa.table(
            {
                "l_orderkey": pa.array(ok_s[starts], pa.int64()),
                "o_orderdate": g.column("o_orderdate").take(
                    pa.array(first, pa.int64())
                ),
                "o_orderpriority": g.column("o_orderpriority").take(
                    pa.array(first, pa.int64())
                ),
                "revenue_cents": pa.array(
                    np.add.reduceat(rev[order], starts)
                    if len(starts) else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    summed = keyed_window(
        joined.map_batches(
            partial_rev, batch_format="pyarrow", zero_copy_batch=True
        ),
        "l_orderkey",
        fold,
    )

    def partial_top(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("revenue_cents", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, K)

    top = (
        summed.map_batches(
            partial_top, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort([("revenue_cents"), ("l_orderkey")], descending=[True, False])
        .limit(K)
        .take_all()
    )
    return _from_rows(
        top,
        {
            "l_orderkey": pa.int64(),
            "revenue_cents": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string(),
        },
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q_hash_join_orders_customer(sf_dir: str) -> pa.Table:
    """Partitioned hash join, both sides treated as large (bucket
    exchange + per-bucket vectorized merge) — the general-join
    companion to the broadcast join."""
    from ..functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        orders,
        cust,
        "o_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_mktsegment"],
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "c_mktsegment": t.column("c_mktsegment"),
                "o_totalprice_cents": _cents(t.column("o_totalprice")),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_HASH_JOIN = """
SELECT o_orderkey, c_mktsegment,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
FROM orders JOIN customer ON o_custkey = c_custkey
"""


#: order-value threshold for the outer/semi/anti join family: splits
#: customers into ~60% with and ~40% without a qualifying order, so
#: null-extension and existence paths are genuinely exercised.
_BIG_ORDER_CENTS = 45_000_000


def _big_orders(sf_dir: str) -> ray.data.Dataset:
    """High-value orders with the key renamed to the customer side's
    column name (hash_join joins on a shared key name)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        keep = pc.greater(cents, pa.scalar(_BIG_ORDER_CENTS, pa.int64()))
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "o_totalprice_cents": cents,
            }
        ).filter(keep)

    return orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def q_left_join_customer_orders(sf_dir: str) -> pa.Table:
    """LEFT OUTER hash join: every customer, null-extended when no
    high-value order exists.  Same bucket exchange as the inner join —
    null extension is decided bucket-locally (a key lives in exactly
    one bucket)."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=["o_orderkey", "o_totalprice_cents"],
        how="left",
    )


ORACLE_LEFT_JOIN = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice_cents
FROM customer c
LEFT JOIN (
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 45000000
) o ON o.o_custkey = c.c_custkey
"""


def q_semi_join_customers(sf_dir: str) -> pa.Table:
    """LEFT SEMI hash join: customers holding at least one high-value
    order, emitted once, left columns only."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=[],
        how="semi",
    )


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > 45000000)
"""


def q_anti_join_customers(sf_dir: str) -> pa.Table:
    """LEFT ANTI hash join: customers with NO high-value order."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=[],
        how="anti",
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > 45000000)
"""


def q_asof_join_clicks_views(sf_dir: str) -> pa.Table:
    """As-of join (absent from both the reference and Ray Data —
    implemented as bucketed merge_asof): for each click, the latest
    view by the same user at or before the click."""
    from ..functions.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click"))
        .drop_columns(["event_type"])
        .rename_columns(["click_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "view"))
        .drop_columns(["event_type"])
        .rename_columns(["view_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = asof_join(
        clicks, views, by="user_id", on="ts",
        left_cols=["click_id"], right_cols=["view_id"],
    )

    def project(t: pa.Table) -> pa.Table:
        vid = t.column("view_id").cast(pa.int64()).fill_null(-1)
        return pa.table(
            {
                "click_id": t.column("click_id").cast(pa.int64()),
                "view_id": vid,
            }
        )

    return joined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_ASOF = """
SELECT c.event_id AS click_id, COALESCE(v.event_id, -1) AS view_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
  -- pre-reduce to one view per (user_id, ts): max event_id — mirrors
  -- the engine's deterministic tie-break so parity is well-defined
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
) v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""


def q_repo_stats_lake(sf_dir: str) -> pa.Table:
    """Derived second table from the CDC lake (the reference's one-
    block→many-tables fan-out, src/ch_eth/init.rs:373-400, expressed as
    a downstream aggregate of the converged lake)."""
    lake = q_cdc_replay_lake(sf_dir)
    stats = (
        pa.table(
            {
                "repo": lake.column("repo"),
                "n_chars": pc.utf8_length(lake.column("content")).cast(pa.int64()),
                "commit_seq": lake.column("commit_seq"),
            }
        )
        .group_by("repo")
        .aggregate(
            [("n_chars", "count"), ("n_chars", "sum"), ("commit_seq", "max")]
        )
        .rename_columns(["repo", "n_paths", "sum_chars", "last_seq"])
    )
    return stats.sort_by([("repo", "ascending")])


ORACLE_REPO_STATS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         text || ' v' || CAST(i AS VARCHAR) AS content,
         CASE WHEN i = 2 AND doc_id % 37 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
),
lake AS (SELECT * FROM win WHERE rn = 1 AND op <> 'delete')
SELECT repo, count(*) AS n_paths, CAST(sum(length(content)) AS BIGINT) AS sum_chars,
       max(commit_seq) AS last_seq
FROM lake GROUP BY repo
"""


# ---------------------------------------------------------------------------
# 5b. Multi-table fan-out: one stream → three lake tables under ONE
#     atomic manifest commit — the reference's block→N-tables insert
#     loop (src/ch_eth/init.rs:146-341, concurrent inserts :403-424),
#     made cross-table atomic.  Each derived table has its own DuckDB
#     oracle over the same stream CTE.
# ---------------------------------------------------------------------------


def _fanout_tables():
    from ..schema import REPO_FILES, TableSpec
    from .fanout import FanoutTable

    heads_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("commit", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    heads_spec = TableSpec(
        name="repo_heads",
        schema=heads_schema,
        key=("repo",),
        event_schema=heads_schema.append(pa.field("op", pa.string())),
    )

    def derive_heads(t: pa.Table) -> pa.Table:
        # every commit (upserts AND deletes) advances the repo head
        return pa.table(
            {
                "repo": t.column("repo"),
                "commit": t.column("commit"),
                "lang": t.column("lang"),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    langs_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    langs_spec = TableSpec(
        name="repo_langs",
        schema=langs_schema,
        key=("repo", "lang"),
        event_schema=langs_schema.append(pa.field("op", pa.string())),
    )

    def derive_langs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "lang": t.column("lang"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    activity_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    activity_spec = TableSpec(
        name="repo_activity",
        schema=activity_schema,
        key=("repo",),
        event_schema=activity_schema.append(pa.field("op", pa.string())),
        sum_cols=("n_changes", "content_chars"),
    )

    def derive_activity(t: pa.Table) -> pa.Table:
        # additive (SummingMergeTree) table: every surviving event adds
        # one change + its content length; sums accumulate across ticks
        n = t.num_rows
        return pa.table(
            {
                "repo": t.column("repo"),
                "n_changes": pa.array(np.ones(n, dtype=np.int64)),
                "content_chars": pc.utf8_length(t.column("content")).cast(
                    pa.int64()
                ),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * n, pa.string()),
            }
        )

    return [
        FanoutTable(REPO_FILES, None),
        FanoutTable(heads_spec, derive_heads),
        FanoutTable(langs_spec, derive_langs),
        FanoutTable(activity_spec, derive_activity),
    ]


_FANOUT_LAKES: dict[str, str] = {}  # per-process cache: one build, N queries


def _fanout_lake(sf_dir: str) -> str:
    import shutil

    from .fanout import replay_fanout

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-mlake"
    if _FANOUT_LAKES.get(sf_dir) != lake_dir:
        shutil.rmtree(lake_dir, ignore_errors=True)
        replay_fanout(stream, lake_dir, _fanout_tables(), num_partitions=8)
        _FANOUT_LAKES[sf_dir] = lake_dir
    return lake_dir


def q_fanout_repo_heads(sf_dir: str) -> pa.Table:
    """Second table of the atomic multi-table fan-out: per-repo head
    (latest commit over all non-orphaned events)."""
    from .fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_heads")
    return t.select(["repo", "commit", "lang", "commit_seq"]).sort_by(
        [("repo", "ascending")]
    )


ORACLE_FANOUT_HEADS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         lang
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo,
       sha256(repo || '/' || path || '@' || CAST(commit_seq AS VARCHAR)) AS commit,
       lang, commit_seq
FROM win WHERE rn = 1
ORDER BY repo
"""


def q_fanout_repo_langs(sf_dir: str) -> pa.Table:
    """Third table of the atomic multi-table fan-out: per-(repo, lang)
    last-touched path."""
    from .fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_langs")
    return t.select(["repo", "lang", "path", "commit_seq"]).sort_by(
        [("repo", "ascending"), ("lang", "ascending")]
    )


ORACLE_FANOUT_LANGS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         lang
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, lang ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, lang, path, commit_seq
FROM win WHERE rn = 1
ORDER BY repo, lang
"""


def q_fanout_repo_activity(sf_dir: str) -> pa.Table:
    """Fourth table of the atomic fan-out — the ADDITIVE
    (SummingMergeTree-mode) one: per-repo change count + total content
    chars, accumulated across merge generations by ``sum_cols`` instead
    of last-writer-wins.  Same combiner → spool → merge-on-write path;
    the partial folds ship per-(key, block) SUMS, not raw events."""
    from .fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_activity")
    return t.select(
        ["repo", "n_changes", "content_chars", "commit_seq"]
    ).sort_by([("repo", "ascending")])


ORACLE_FANOUT_ACTIVITY = f"""
WITH {_EV_CTE}
SELECT repo,
       count(*) AS n_changes,
       CAST(sum(length(content)) AS BIGINT) AS content_chars,
       max(commit_seq) AS commit_seq
FROM eff GROUP BY repo ORDER BY repo
"""


# ---------------------------------------------------------------------------
# 5b. Tron-width 44-table fan-out (pipelines/wide.py) — the reference's
# widest shape (one block → 44 tables, src/ch_tron/init.rs:76-214) with
# its hairiest types: decimal256 (UInt256), binary(20) key
# (FixedString(20)), and list<struct<..., map_>> (Map-inside-Nested,
# src/ch_tron/schema.rs:1976-1984).  One shared read, ONE MultiManifest
# commit for all 44.
# ---------------------------------------------------------------------------


_WIDE_LAKES: dict[str, str] = {}


def _wide_lake(sf_dir: str) -> str:
    import shutil

    from .fanout import replay_fanout
    from .wide import tron_width_tables

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-wlake"
    if _WIDE_LAKES.get(sf_dir) != lake_dir:
        shutil.rmtree(lake_dir, ignore_errors=True)
        # the documents-derived stream carries natural-language codes
        # (vs gen.py's code langs) — same 44-table registry, lang set
        # matched to the input
        replay_fanout(
            stream,
            lake_dir,
            tron_width_tables(
                langs=("en", "zh", "es", "de", "fr", "py", "rs")
            ),
            num_partitions=8,
        )
        _WIDE_LAKES[sf_dir] = lake_dir
    return lake_dir


def q_fanout_wide_valuations(sf_dir: str) -> pa.Table:
    """decimal256(76,0) payload (UInt256 analogue) through the full
    44-table fan-out merge; compared against DuckDB DECIMAL(38,0) after
    a width-only downcast (values fit well inside 38 digits)."""
    from .fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_valuations")
    assert t.schema.field("value_wei").type == pa.decimal256(76, 0)
    # compare as int64: the fixture values fit, and DuckDB's DECIMAL
    # comes back float64 through pandas — the decimal256 AT-REST type
    # is what this query certifies (assert above)
    return pa.table(
        {
            "repo": t.column("repo"),
            "path": t.column("path"),
            "value_wei": t.column("value_wei").cast(pa.int64()),
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_FANOUT_WIDE_VAL = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path,
       CAST(length(content) * 1000000000 + commit_seq AS BIGINT) AS value_wei,
       commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY repo, path
"""


def q_fanout_wide_addr(sf_dir: str) -> pa.Table:
    """binary(20) KEY (FixedString(20) address analogue): the partition
    router hashes raw key bytes; the stored key round-trips to the hex
    the oracle derives with sha256()."""
    from .fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_addresses")
    assert t.schema.field("addr").type == pa.binary(20)
    addr_hex = pa.array(
        [v.hex() for v in t.column("addr").to_pylist()], pa.string()
    )
    return pa.table(
        {
            "addr_hex": addr_hex,
            "repo": t.column("repo"),
            "path": t.column("path"),
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("addr_hex", "ascending")])


ORACLE_FANOUT_WIDE_ADDR = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT substr(sha256(repo || '/' || path), 1, 40) AS addr_hex,
       repo, path, commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY addr_hex
"""


def q_fanout_wide_refs(sf_dir: str) -> pa.Table:
    """Map-inside-Nested payload (list<struct<name, counts:
    map<string,int64>>>) stored at rest in the wide lake; scalars are
    extracted AFTER the parquet round-trip, so equality with the oracle
    proves the nested encoding survived spool, merge and commit."""
    from .fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_refs")
    refs = t.column("refs").combine_chunks()
    structs = refs.flatten()  # one element per row by construction
    names = structs.field("name")
    counts = structs.field("counts")
    # ADVICE r04: derive entry positions from the map's OWN offsets —
    # .items ignores parent offset/slice, and hard-coded stride
    # arithmetic silently misaligns on sliced/chunked arrays or
    # reordered keys.  offsets values index the RAW items child, so
    # this stays exact under any layout; keys are matched by NAME.
    offs = counts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    assert (lens == 2).all(), "w_refs counts must carry exactly 2 entries"
    keys, items = counts.keys, counts.items
    first_is_len = pc.equal(
        keys.take(pa.array(offs[:-1])), "len"
    ).to_numpy(zero_copy_only=False)
    ref_len = items.take(
        pa.array(np.where(first_is_len, offs[:-1], offs[:-1] + 1))
    )
    ref_seq = items.take(
        pa.array(np.where(first_is_len, offs[:-1] + 1, offs[:-1]))
    )
    return pa.table(
        {
            "repo": t.column("repo"),
            "path": t.column("path"),
            "ref_name": names,
            "ref_len": ref_len,
            "ref_seq": ref_seq,
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_FANOUT_WIDE_REFS = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path,
       lang AS ref_name,
       length(content) AS ref_len,
       commit_seq AS ref_seq,
       commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY repo, path
"""


def q_fanout_wide_shards(sf_dir: str) -> pa.Table:
    """Union of the 10 repo-hash-sharded min/max watermark tables —
    shards are disjoint and together must reproduce the global per-repo
    first/last fold exactly (AggregatingMergeTree semantics at Tron
    width)."""
    from .fanout import fanout_table
    from .wide import N_SHARDS

    lake = _wide_lake(sf_dir)
    parts = []
    for s in range(N_SHARDS):
        st = fanout_table(lake, f"w_shard_{s}")
        if st.num_rows:
            parts.append(st.select(["repo", "first_seq", "last_seq"]))
    return pa.concat_tables(parts).sort_by([("repo", "ascending")])


ORACLE_FANOUT_WIDE_SHARDS = f"""
WITH {_EV_CTE}
SELECT repo, min(commit_seq) AS first_seq, max(commit_seq) AS last_seq
FROM eff GROUP BY repo ORDER BY repo
"""


def q_fanout_wide_langstat(sf_dir: str) -> pa.Table:
    """One of the 7 per-lang ADDITIVE tables of the 44-table registry
    (SummingMergeTree at Tron width): per-repo change count + content
    chars for lang='en' only (the documents-derived stream's lang set)."""
    from .fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_langstat_en")
    return t.select(
        ["repo", "n_changes", "content_chars", "commit_seq"]
    ).sort_by([("repo", "ascending")])


ORACLE_FANOUT_WIDE_LANGSTAT = f"""
WITH {_EV_CTE}
SELECT repo,
       count(*) AS n_changes,
       CAST(sum(length(content)) AS BIGINT) AS content_chars,
       max(commit_seq) AS commit_seq
FROM eff WHERE lang = 'en' GROUP BY repo ORDER BY repo
"""


# ---------------------------------------------------------------------------
# 6. Rows-only operators (no SQL-expressible oracle)
# ---------------------------------------------------------------------------


def q_lang_id_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(
        lambda t: lang_id(t).select(["doc_id", "lang", "lang_pred"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _lang_id_oracle() -> str:
    """Exact SQL mirror of ``functions/text.py::lang_id``: the engine's
    RE2 stopword counts are reproducible in DuckDB (also RE2-backed) as
    ``len(regexp_extract_all(...))``; the argmax with first-max-wins in
    sorted language order becomes a CASE cascade.  Generated from the
    same STOPWORDS dict so the two sides cannot drift."""
    from ..functions.text import CJK_RE, STOPWORDS

    score_cols = []
    for lg, words in STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        score_cols.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lg}"
        )
    score_cols.append(f"len(regexp_extract_all(text, '{CJK_RE}')) AS s_zh")
    langs = sorted(list(STOPWORDS) + ["zh"])
    cases = []
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lg} >= s_{other}" for other in langs[i + 1:]
        )
        cases.append(f"WHEN {conds} THEN '{lg}'")
    all_s = ", ".join(f"s_{lg}" for lg in langs)
    return f"""
WITH s AS (
  SELECT doc_id, lang, {", ".join(score_cols)}
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN greatest({all_s}) = 0 THEN 'und'
       {" ".join(cases)}
       ELSE '{langs[-1]}'
  END AS lang_pred
FROM s
"""


ORACLE_LANG_ID = _lang_id_oracle()


def q_curate_documents(sf_dir: str) -> pa.Table:
    """FLAGSHIP curation composition — the shape of a 100 TB
    training-data pre-processing run as ONE streaming pipeline:

        read → [pii_scan ∘ quality_score ∘ lang_id]  (one fused
        vectorized batch stage — each text is scanned while already
        in cache, no extra passes)
        → filter (PII-free, quality ≥ 0.75, language identified)
        → exact dedup over the SURVIVORS (per-batch sha partials →
          tiny groupby → broadcast keep-set)
        → curated (doc_id, lang_pred, n_tokens, quality)

    Every stage streams; see ``pipelines/curate.py`` for the scale
    notes (survivor pinning, broadcast→semi-join keep-filter)."""
    from .curate import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = curate(ds, quality_min=0.75)
    return _from_rows(
        out.take_all(),
        {"doc_id": pa.int64(), "lang_pred": pa.string(),
         "n_tokens": pa.int64(), "quality": pa.float64()},
    ).sort_by("doc_id")


def _curate_oracle() -> str:
    """The full curation pipeline as one SQL statement, built from the
    same component oracles (lang CASE cascade generated from the same
    STOPWORDS dict) so the two sides cannot drift."""
    lang_sql = _lang_id_oracle().replace("FROM documents", "FROM base")
    return rf"""
WITH base AS (SELECT doc_id, text FROM documents),
lang AS ({lang_sql.replace("SELECT doc_id, lang,", "SELECT doc_id,")}),
feat AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS n_tokens_d,
         len(regexp_extract_all(text, '\w+')) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_emails,
         len(regexp_extract_all(text,
             '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS n_ipv4,
         len(regexp_extract_all(text, '\d{{9,}}')) AS n_long_digits
  FROM base
),
scored AS (
  SELECT f.doc_id, f.text, l.lang_pred, f.n_tokens,
         least(f.n_chars / 200.0, 1.0) * 0.4
       + least(f.n_tokens_d / 40.0, 1.0) * 0.4
       + (1.0 - least(f.n_punct / greatest(f.n_chars, 1.0) * 5.0, 1.0)) * 0.1
       + (1.0 - least(f.n_digits / greatest(f.n_chars, 1.0) * 5.0, 1.0)) * 0.1
         AS quality
  FROM feat f JOIN lang l USING (doc_id)
  WHERE f.n_emails + f.n_ipv4 + f.n_long_digits = 0
),
surv AS (
  SELECT * FROM scored WHERE quality >= 0.75 AND lang_pred <> 'und'
),
dedup AS (
  SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS rep_id
  FROM surv
)
SELECT doc_id, lang_pred, n_tokens, quality
FROM dedup WHERE doc_id = rep_id ORDER BY doc_id
"""


ORACLE_CURATE = _curate_oracle()


def q_split_documents(sf_dir: str) -> pa.Table:
    """Deterministic content-hash train/val/test split (80/10/10):
    the first sha256 byte of the text decides the split, so the
    assignment is reproducible across runs/machines, independent of
    row order and partitioning, and stable under corpus growth (a doc
    never migrates).  Embarrassingly parallel, zero shuffle.  The SQL
    mirror compares the first two hex chars lexicographically
    ('cc' = 204, 'e6' = 230) — identical semantics."""
    from ..functions.hashing import sha256_binary

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def assign(t: pa.Table) -> pa.Table:
        sha = sha256_binary(t.column("text"))
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        # fixed_size_binary[32]: value i's first byte sits at stride
        # i*32 in the data buffer (vectorized, no per-row slice)
        if t.num_rows:
            data = np.frombuffer(sha.buffers()[1], np.uint8)
            first = data[sha.offset * 32 :: 32][: len(sha)]
        else:
            first = np.zeros(0, np.uint8)
        split = np.where(
            first < 204, "train", np.where(first < 230, "val", "test")
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SPLIT = """
SELECT doc_id,
       CASE WHEN substr(sha256(text), 1, 2) < 'cc' THEN 'train'
            WHEN substr(sha256(text), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


_PACK_BUDGET = 512  # tokens per packed sequence bin


def q_seq_pack_documents(sf_dir: str) -> pa.Table:
    """Sequence packing for pre-training (contiguous greedy by
    doc_id): each doc lands in bin floor(tokens_before / budget),
    where tokens_before is the GLOBAL ordered prefix sum of token
    counts — computed by the distributed range-partitioned two-pass
    scan (``functions/window.py::ordered_prefix_sum``), not a driver
    loop.  Exact SQL-window parity."""
    from ..functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_tokens": token_stats(t).column("n_tokens"),
            }
        )

    counted = ds.map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned = ordered_prefix_sum(counted, "doc_id", "n_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bin_id": pa.array((run - n) // _PACK_BUDGET, pa.int64()),
            }
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


ORACLE_SEQ_PACK = rf"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\w+')) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id) AS running
  FROM t
)
SELECT doc_id, n_tokens,
       CAST((running - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM r
"""


def q_semantic_neardup_docs(sf_dir: str) -> pa.Table:
    """Model-free semantic near-dup: hash_embed the documents, then
    LSH-bucketed cosine pairs — the end-to-end composition (text →
    embedding → ANN) with no external model or embedding table.
    Rows-only (float fixpoint of two approximations); planted-near-dup
    recall is unit-tested."""
    from ..functions.similarity import cosine_neardup_lsh, hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    embedded = ds.map_batches(
        lambda t: hash_embed(t).drop_columns(["text"]).rename_columns(
            ["vec_id", "embedding"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = cosine_neardup_lsh(embedded, tau=0.9)
    return out.select(["id_a", "id_b"])


def q_pagerank_parts(sf_dir: str) -> pa.Table:
    """PageRank over the bipartite supplier→part shipment graph from
    lineitem (iterative workload: per-iteration hash join + groupby —
    see functions/graph.py).  Rows-only check (iterative float
    fixpoint has no SQL oracle); exactness vs a dense numpy reference
    is asserted in tests."""
    from ..functions.graph import pagerank

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = li.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("l_suppkey").cast(pa.int64()),
                "dst": pc.add(
                    t.column("l_partkey").cast(pa.int64()),
                    pa.scalar(1_000_000, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = pagerank(edges, iterations=5)
    rows = out.take_all()
    rows.sort(key=lambda r: r["node"])
    return pa.table(
        {
            "node": pa.array([r["node"] for r in rows], pa.int64()),
            "rank": pa.array([round(r["rank"], 10) for r in rows],
                             pa.float64()),
        }
    )


def q_prepare_training_set(sf_dir: str) -> pa.Table:
    """THE end-to-end pre-training data prep, one streaming pipeline,
    oracle-exact at every stage: curate (fused PII/quality/lang scan →
    filter → exact dedup) → content-hash train split → contiguous
    sequence packing of the train docs via the distributed ordered
    prefix scan.  A user points this at a documents table and gets
    back the packed train manifest."""
    from ..functions.hashing import sha256_binary
    from ..functions.window import ordered_prefix_sum
    from .curate import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    curated = curate(ds, quality_min=0.75, keep_text=True)

    def train_only(t: pa.Table) -> pa.Table:
        sha = sha256_binary(t.column("text"))
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        if t.num_rows:
            data = np.frombuffer(sha.buffers()[1], np.uint8)
            first = data[sha.offset * 32 :: 32][: len(sha)]
        else:
            first = np.zeros(0, np.uint8)
        t = t.filter(pa.array(first < 204)).drop_columns(["text"])
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "lang_pred": t.column("lang_pred"),
                "n_tokens": t.column("n_tokens").cast(pa.int64()),
                "quality": t.column("quality"),
            }
        )

    train = curated.map_batches(
        train_only, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned = ordered_prefix_sum(train, "doc_id", "n_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return t.drop_columns(["running"]).append_column(
            "bin_id", pa.array((run - n) // _PACK_BUDGET, pa.int64())
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


def _prepare_training_oracle() -> str:
    curated = ORACLE_CURATE.strip().rstrip()
    return rf"""
WITH curated AS ({curated}),
withsplit AS (
  SELECT c.*, substr(sha256(d.text), 1, 2) AS shp
  FROM curated c JOIN documents d USING (doc_id)
),
train AS (SELECT * FROM withsplit WHERE shp < 'cc')
SELECT doc_id, lang_pred, n_tokens, quality,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
            // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM train
"""


ORACLE_PREPARE = _prepare_training_oracle()


def q_epoch_shuffle_documents(sf_dir: str) -> pa.Table:
    """Deterministic epoch shuffle for training: every doc gets a
    GLOBAL shuffle rank — row_number over (sha256('epoch1:'+doc_id)
    60-bit prefix, doc_id).  Reproducible across runs/engines with no
    seed side-channel, and a different epoch string reshuffles.
    Distributed as the range-partitioned prefix scan (hash keys are
    uniform ⇒ perfectly balanced ranges), value=1, tiebreak=doc_id —
    never a global sort."""
    from ..functions.hashing import sha256_hex
    from ..functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["epoch1"] * t.num_rows),
            t.column("doc_id").cast(pa.string()),
            ":",
        )
        sha = sha256_hex(s)
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        # 60-bit prefix (15 hex chars) keeps the order key in int64;
        # vectorized hex parse straight off the string buffer
        if t.num_rows:
            offs = np.frombuffer(sha.buffers()[1], np.int32)[
                sha.offset : sha.offset + len(sha)
            ]
            data = np.frombuffer(sha.buffers()[2], np.uint8)
            k = np.zeros(len(sha), np.int64)
            for i in range(15):
                b = data[offs + i].astype(np.int64)
                k = (k << 4) | (b - 48 - 39 * (b >= 97))
        else:
            k = np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "k64": pa.array(k, pa.int64()),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    out = ordered_prefix_sum(
        keyed, "k64", "one", out_col="shuffle_rank", tiebreak_col="doc_id"
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "shuffle_rank"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


ORACLE_EPOCH_SHUFFLE = """
SELECT doc_id,
       row_number() OVER (
         ORDER BY substr(sha256('epoch1:' || CAST(doc_id AS VARCHAR)),
                         1, 15),
                  doc_id) AS shuffle_rank
FROM documents
"""


def q_embed_documents(sf_dir: str) -> pa.Table:
    """Feature-hashing document embeddings (64-dim, L2-normalized, no
    model/vocab — deterministic across batch splits): the bridge from
    the text table to the whole similarity family."""
    from ..functions.similarity import hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: hash_embed(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_simhash_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: simhash64(t).select(["doc_id", "simhash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_fingerprint_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "fingerprint": rolling_fingerprint(t.column("text")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_minhash_lsh_pairs(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5)


def q_simhash_neardup_pairs(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_neardup_pairs(ds, max_hamming=3, num_bands=4)


def q_incremental_dedup_pairs(sf_dir: str) -> pa.Table:
    """Two-tick incremental near-dup over a deterministic split of the
    documents table (even doc_ids first, then odd): the union of the
    per-tick pair outputs equals the batch minhash_lsh_pairs result on
    the full corpus (tested in tests/test_dedup_index.py) — but each
    tick reads only the index buckets its docs touch."""
    import shutil
    import tempfile

    from .dedup_index import MinHashIndex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity: int):
        return ds.map_batches(
            lambda t, _p=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(t.column("doc_id").cast(pa.int64()), 1), _p
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    root = tempfile.mkdtemp(prefix="dedup_idx_")
    try:
        idx = MinHashIndex(root)
        t1 = idx.dedup_tick(half(0), threshold=0.5)
        t2 = idx.dedup_tick(half(1), threshold=0.5)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return pa.concat_tables([t1, t2]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def q_incremental_curate(sf_dir: str) -> pa.Table:
    """Two-tick incremental curation over a doc_id-ordered split of
    the documents table: the union of per-tick outputs equals the
    batch ``curate_documents`` result (first-seen == min-doc_id when
    ticks arrive in id order — the CDC arrival property; equivalence
    incl. cross-tick duplicates tested in tests/test_curate_index.py).
    Each tick probes only the sha buckets it touches."""
    import shutil
    import tempfile

    from .curate import CurateIndex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(lo: int, hi: int):
        return ds.map_batches(
            lambda t, _lo=lo, _hi=hi: t.filter(
                pc.and_(
                    pc.greater_equal(t.column("doc_id"), pa.scalar(_lo)),
                    pc.less(t.column("doc_id"), pa.scalar(_hi)),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    root = tempfile.mkdtemp(prefix="curate_idx_")
    try:
        idx = CurateIndex(root)
        t1 = idx.tick(part(0, 250))
        t2 = idx.tick(part(250, 10**9))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return pa.concat_tables([t1, t2]).sort_by("doc_id")


def q_dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup clusters: MinHash-LSH pairs → distributed hash-to-min
    connected components → (doc_id, cluster_id)."""
    from ..functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    rows = connected_components_ds(ray.data.from_arrow(pairs)).take_all()
    if not rows:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    return pa.Table.from_pylist(rows).sort_by("doc_id")


def q_knn_lsh(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    return knn_lsh(ds, ids, mat, k=10).select(["query_id", "neighbor_id", "rank"])


def q_knn_pq(sf_dir: str) -> pa.Table:
    """Compressed-domain ANN: PQ codes (8 bytes/vector at 64-dim, 32x
    vs float32) + per-query ADC lookup tables + exact refine of the
    ADC shortlist.  The 100TB-of-embeddings path — the code table is
    what scans, raw vectors serve only the bounded refine fetch.
    Recall vs knn_brute measured in tests."""
    from ..functions.similarity import knn_pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_pq(ds, ids, mat, k=10, n_sub=8, n_cent=32, refine=4)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_multimodal_features(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = media_feature_pipeline(ds)
    rows = out.take_all()
    rows.sort(key=lambda r: r["media_id"])
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "payload_bytes": pa.array([r["payload_bytes"] for r in rows], pa.int64()),
            "feat0": pa.array([float(r["features"][0]) for r in rows], pa.float64()),
        }
    )


def q_multimodal_decode_bmp(sf_dir: str) -> pa.Table:
    """REAL image decode path: documents rendered as 24-bit BMP
    payloads, decoded by the pure-numpy parser in an actor-pool stage;
    width/height/features come from actual pixel data."""
    from ..functions.multimodal import media_decode_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = media_decode_pipeline(ds).take_all()
    rows.sort(key=lambda r: r["media_id"])
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "width": pa.array([r["width"] for r in rows], pa.int32()),
            "height": pa.array([r["height"] for r in rows], pa.int32()),
            "feat0": pa.array([float(r["features"][0]) for r in rows], pa.float64()),
        }
    )


def q_video_frame_sample(sf_dir: str) -> pa.Table:
    """Frame-sampling path: documents rendered as deterministic
    8-frame RAWV clips, uniformly sampled to 4 frames per clip with
    per-frame features, in an actor-pool stage."""
    from ..functions.multimodal import video_frame_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = video_frame_pipeline(ds).take_all()
    rows.sort(key=lambda r: (r["media_id"], r["frame_idx"]))
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "frame_idx": pa.array([r["frame_idx"] for r in rows], pa.int64()),
            "feat0": pa.array(
                [float(r["features"][0]) for r in rows], pa.float64()
            ),
        }
    )


def q_range_join_value_bins(sf_dir: str) -> pa.Table:
    """Distributed interval (range) join — one of the custom operators
    the task brief names (as-of / RANGE join / windowed aggregate).
    Events join OVERLAPPING value bins (width 15, stride 5 ⇒ each value
    matches up to 3 bins) via ``functions/joins.py::range_join``'s
    chunked exchange, then a partial+final grouped aggregate per bin.
    The bin table is generated deterministically on both sides
    (numpy here, ``range()`` in the oracle)."""
    from ..functions.joins import range_join

    ds = _read(sf_dir, "events", ["value"])
    i = np.arange(98, dtype=np.int64)
    bins = ray.data.from_arrow(
        pa.table(
            {
                "bin_id": pa.array(i),
                "lo": pa.array(i * 5.0),
                "hi": pa.array(i * 5.0 + 15.0),
            }
        )
    )
    joined = range_join(
        ds,
        bins,
        on="value",
        lo="lo",
        hi="hi",
        point_cols=["value"],
        interval_cols=["bin_id"],
        boundaries=[float(b) for b in range(25, 500, 25)],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "bin_id": t.column("bin_id").cast(pa.int64()),
                "value_cents": _cents(t.column("value")),
            }
        )
        return (
            g.group_by("bin_id")
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["bin_id", "sum_value_cents", "n"])
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin_id")
        .aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n", alias_name="n"),
        )
    )


ORACLE_RANGE_JOIN = """
SELECT b.bin_id,
       CAST(sum(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       count(*) AS n
FROM events e
JOIN (SELECT i AS bin_id, i * 5.0 AS lo, i * 5.0 + 15.0 AS hi
      FROM range(0, 98) t(i)) b
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bin_id
"""


def q_sliding_window_activity(sf_dir: str) -> pa.Table:
    """Sliding (hopping) window aggregate: 60-minute windows advancing
    every 15 minutes — each event lands in exactly 4 windows.  The
    window fan-out is a vectorized flat_map (bucket − k·stride for
    k = 0..3) followed by a per-batch partial and one small final
    groupby; no per-row Python and no all-to-all beyond the grouped
    aggregate itself.  Complements the tumbling (`hourly_user_activity`)
    and session (`session_windows`) variants."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    stride_us = 15 * 60 * 1_000_000
    n_offsets = 4

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts // stride_us) * stride_us
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [bucket - k * stride_us for k in range(n_offsets)]
        )
        g = pa.table(
            {
                "window_start_us": pa.array(starts),
                "value_cents": pa.array(np.tile(cents, n_offsets)),
            }
        )
        return (
            g.group_by("window_start_us")
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["window_start_us", "sum_value_cents", "n"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start_us")
        .aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t.column("window_start_us").cast(
                    pa.timestamp("us")
                ),
                "sum_value_cents": t.column("sum_value_cents"),
                "n": t.column("n"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SLIDING = """
WITH x AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS b,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT b - CAST(k AS INT) * INTERVAL '15 minutes' AS window_start,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents,
       count(*) AS n
FROM x, range(0, 4) t(k)
GROUP BY window_start
"""


# ---------------------------------------------------------------------------
# 8. Keyed window functions (lag / running totals / ranking)
# ---------------------------------------------------------------------------


def _window_sorted(g: pa.Table):
    """Common prep: bucket sorted key-major by (user_id, ts, event_id);
    returns (uid, ts, eid, cents, starts) numpy views."""
    from ..functions.window import segment_starts

    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
    return uid, ts, eid, cents, segment_starts(uid)


def q_window_lag_value(sf_dir: str) -> pa.Table:
    """lag(1) per user ordered by (ts, event_id): previous event id and
    value, NULL at each user's first event.  One vectorized shift per
    bucket — no per-user grouping."""
    from ..functions.window import keyed_window, lag_one

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        prev_eid, valid = lag_one(eid, starts)
        prev_cents, _ = lag_one(cents, starts)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "prev_event_id": pa.array(prev_eid, pa.int64(), mask=~valid),
                "prev_cents": pa.array(prev_cents, pa.int64(), mask=~valid),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_LAG = """
SELECT event_id, user_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents,
       lag(event_id) OVER w AS prev_event_id,
       lag(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS prev_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_running_totals(sf_dir: str) -> pa.Table:
    """Running row count + running value sum per user ordered by
    (ts, event_id) — global cumsum rebased per segment (one pass per
    bucket, zero per-key work)."""
    from ..functions.window import keyed_window, row_numbers, running_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "rn": pa.array(row_numbers(starts), pa.int64()),
                "run_cents": pa.array(running_sum(cents, starts), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RUN = """
SELECT event_id, user_id,
       row_number() OVER w AS rn,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_dense_rank(sf_dir: str) -> pa.Table:
    """dense_rank of value (cents, descending) per user — ties share a
    rank, computed from a within-segment change mask over the whole
    bucket at once."""
    from ..functions.window import dense_ranks, keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -cents, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        starts = segment_starts(uid)
        change = np.zeros(len(cents), dtype=bool)
        change[1:] = cents[1:] != cents[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "drank": pa.array(dense_ranks(change, starts), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RANK = """
SELECT event_id, user_id,
       dense_rank() OVER (PARTITION BY user_id
                          ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC) AS drank
FROM events
"""


def q_window_lead_moving(sf_dir: str) -> pa.Table:
    """lead(1) plus a 3-row trailing moving sum per user ordered by
    (ts, event_id) — both from the same single vectorized segment
    pass."""
    from ..functions.window import keyed_window, lead_one, moving_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        next_eid, valid = lead_one(eid, starts)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "next_event_id": pa.array(next_eid, pa.int64(), mask=~valid),
                "mov3_cents": pa.array(moving_sum(cents, starts, 3), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_LEAD = """
SELECT event_id, user_id,
       lead(event_id) OVER w AS next_event_id,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_rank_tiles(sf_dir: str) -> pa.Table:
    """ntile(4) + first/last event per user (ordered by ts, event_id)
    plus SQL rank() and percent_rank() over cents — the full ranking
    family from the same bucket exchange and segment machinery."""
    from ..functions.window import (
        first_last, keyed_window, min_ranks, ntiles, segment_sizes,
        segment_starts)

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        tile4 = ntiles(4, starts)
        first_eid, last_eid = first_last(eid, starts)
        # rank family is ordered by cents (ties real), not arrival
        order2 = np.lexsort((eid, cents, uid))
        uid2, eid2, cents2 = uid[order2], eid[order2], cents[order2]
        starts2 = segment_starts(uid2)
        change2 = np.zeros(len(cents2), dtype=bool)
        change2[1:] = cents2[1:] != cents2[:-1]
        rank2 = min_ranks(change2, starts2)
        size2 = segment_sizes(starts2)
        prank2 = np.where(size2 > 1, (rank2 - 1) / np.maximum(size2 - 1, 1), 0.0)
        # scatter the cents-ordered outputs back to the ts-ordered
        # layout (ranks are tie-shared, so any tie order agrees)
        rank_ts = np.empty_like(rank2)
        prank_ts = np.empty(len(prank2))
        rank_ts[order2] = rank2
        prank_ts[order2] = prank2
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "tile4": pa.array(tile4, pa.int64()),
                "first_eid": pa.array(first_eid, pa.int64()),
                "last_eid": pa.array(last_eid, pa.int64()),
                "cents_rank": pa.array(rank_ts, pa.int64()),
                "cents_prank": pa.array(prank_ts, pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


def q_median_value_per_user(sf_dir: str) -> pa.Table:
    """EXACT per-user median (interpolated): the keyed bucket exchange
    co-locates each user's rows, then one vectorized gather per bucket
    takes the middle elements of every sorted segment at once — exact
    order statistics without a per-key sort loop, the complement of the
    approximate bottom-k quantile sketch."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid, cents = uid[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.append(start_idx, len(uid)))
        lo = start_idx + (counts - 1) // 2
        hi = start_idx + counts // 2
        med = (cents[lo] + cents[hi]) / 2.0
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "med_cents": pa.array(med, pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MEDIAN = """
SELECT user_id,
       median(CAST(ROUND(value * 100) AS BIGINT)) AS med_cents
FROM events GROUP BY user_id
"""


def q_quantiles_value_per_user(sf_dir: str) -> pa.Table:
    """EXACT per-user discrete quantiles (p25/p50/p75): same keyed
    bucket exchange as the median, one lexsort per bucket, then a
    single gather per quantile at index ceil(q*n)-1 of each sorted
    segment — DuckDB ``quantile_disc`` semantics (verified on n=4..7).
    Integer order statistics, so oracle parity is exact (no float
    interpolation)."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid, cents = uid[order], cents[order]
        start_idx = np.flatnonzero(segment_starts(uid))
        counts = np.diff(np.append(start_idx, len(uid)))
        cols = {"user_id": pa.array(uid[start_idx], pa.int64())}
        for q, nm in ((0.25, "p25_cents"), (0.5, "p50_cents"),
                      (0.75, "p75_cents")):
            # q is an exact binary fraction -> ceil(q*n) is exact
            idx = np.ceil(q * counts).astype(np.int64) - 1
            cols[nm] = pa.array(cents[start_idx + idx], pa.int64())
        return pa.table(cols)

    return keyed_window(ds, "user_id", fn)


ORACLE_QUANTILES = """
SELECT user_id,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.25) AS p25_cents,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.50) AS p50_cents,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.75) AS p75_cents
FROM events GROUP BY user_id
"""


def q_profile_events(sf_dir: str) -> pa.Table:
    """One-pass table profile (the data-quality intake scan a 100 TB
    ingest runs first): per numeric column, row count, null count,
    min, max — one partial row per (column, batch), tiny final fold.
    Long/narrow output shape so adding columns never changes the
    schema."""
    cols = ["event_id", "user_id", "value"]
    ds = _read(sf_dir, "events", cols)

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            if c == "value":
                col = _cents(col)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            mins.append(pc.min(col).as_py())
            maxs.append(pc.max(col).as_py())
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.int64()),
                "max_v": pa.array(maxs, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )


ORACLE_PROFILE = """
SELECT 'event_id' AS "column", count(*) AS n,
       count(*) - count(event_id) AS n_null,
       min(event_id) AS min_v, max(event_id) AS max_v FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       min(user_id), max(user_id) FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       min(CAST(ROUND(value * 100) AS BIGINT)),
       max(CAST(ROUND(value * 100) AS BIGINT)) FROM events
"""


def q_funnel_click_purchase(sf_dir: str) -> pa.Table:
    """Conversion funnel: purchases preceded by a click from the same
    user within the trailing hour.  One keyed exchange; inside the
    bucket the per-segment 'last click so far' is ONE
    maximum-accumulate over segment-offset-encoded click times (the
    offset trick keeps the accumulation from crossing segments), then
    a vectorized window test — no per-user loop, no self-join."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    WINDOW_US = 3_600 * 1_000_000

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, ts_s, et_s = (
            uid[order], eid[order], ts[order], et[order]
        )
        seg = np.cumsum(segment_starts(uid_s)) - 1
        # segment-offset encoding: accumulation cannot cross segments
        span = np.int64(ts_s.max() - ts_s.min() + 2) if len(ts_s) else np.int64(2)
        base = ts_s - (ts_s.min() if len(ts_s) else 0)
        click_v = np.where(et_s == "click", base, np.int64(-1)) + seg * span
        last_click = np.maximum.accumulate(click_v) - seg * span
        keep = (
            (et_s == "purchase")
            & (last_click >= 0)
            & (base - last_click <= WINDOW_US)
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[keep], pa.int64()),
                "event_id": pa.array(eid_s[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_FUNNEL = """
SELECT user_id, event_id FROM (
  SELECT user_id, event_id, event_type, ts,
         max(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click
  FROM events
)
WHERE event_type = 'purchase'
  AND last_click IS NOT NULL
  AND ts - last_click <= INTERVAL 1 HOUR
"""


def q_outlier_events_per_user(sf_dir: str) -> pa.Table:
    """Grouped anomaly filter: events whose value exceeds the user's
    mean + 2σ (sample std).  ONE keyed exchange — each bucket holds
    all of a user's rows, so moments and flags are a single vectorized
    segment pass; both sides derive the float threshold from the SAME
    exact integer moments with the SAME expression, so the comparison
    is bit-reproducible (no summation-order drift)."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        s = np.add.reduceat(cents_s, starts).astype(np.float64)
        ss = np.add.reduceat(cents_s * cents_s, starts).astype(np.float64)
        n = counts.astype(np.float64)
        with np.errstate(invalid="ignore"):
            thr = s / n + 2.0 * np.sqrt((ss - s * s / n) / (n - 1.0))
        seg = np.repeat(np.arange(len(starts)), counts)
        keep = (counts[seg] >= 2) & (cents_s.astype(np.float64) > thr[seg])
        sel = order[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_id": g.column("event_id").take(
                    pa.array(sel, pa.int64())
                ).cast(pa.int64()),
                "value_cents": pa.array(cents[sel], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_OUTLIER = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(cents) AS DOUBLE) AS s,
         CAST(sum(cents * cents) AS DOUBLE) AS ss
  FROM c GROUP BY user_id
)
SELECT c.user_id, c.event_id, c.cents AS value_cents
FROM c JOIN m USING (user_id)
WHERE m.n >= 2
  AND CAST(c.cents AS DOUBLE) >
      m.s / m.n + 2.0 * sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1.0))
"""


def q_mode_type_per_user(sf_dir: str) -> pa.Table:
    """EXACT grouped mode with a deterministic tie-break (highest
    count, then lexicographically smallest value): per-batch partial
    (key, val, count) — the shuffle moves one row per distinct pair
    per batch, never events — then groupby-sum, then a keyed bucket
    exchange over the |distinct pairs| rows picks each key's argmax
    with one lexsort + segment-first gather."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    counted = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # ONE hash-bucket exchange on user: combine the per-batch partial
    # counts AND pick the argmax inside the bucket (Ray's sort-based
    # two-key groupby on the partials measured ~10x slower at 20M rows)
    def pick(g: pa.Table) -> pa.Table:
        uid, codes, tot, vocab = _fold_pair_counts(g)
        # lexsort keys are last-key-major: uid asc, then count desc,
        # then event_type asc for the tie-break
        order = np.lexsort((codes, -tot, uid))
        uid_s = uid[order]
        start_idx = np.flatnonzero(segment_starts(uid_s))
        first = order[start_idx]
        return pa.table(
            {
                "user_id": pa.array(uid[first], pa.int64()),
                "mode_type": vocab.take(pa.array(codes[first], pa.int64())),
                "n": pa.array(tot[first], pa.int64()),
            }
        )

    return keyed_window(counted, "user_id", pick)


def _fold_pair_counts(g: pa.Table):
    """Combine per-batch (user_id, event_type, n) partials inside one
    bucket: composite-key sort + reduceat — returns (uid, type_code,
    total, vocab) over the DISTINCT (user, type) pairs."""
    from ..functions.window import segment_starts

    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    n = g.column("n").to_numpy(zero_copy_only=False)
    et = g.column("event_type").combine_chunks()
    vocab = pa.array(sorted(pc.unique(et).to_pylist()))
    codes = pc.index_in(et, value_set=vocab).to_numpy(zero_copy_only=False)
    V = np.int64(len(vocab))
    key = uid * V + codes
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.flatnonzero(segment_starts(key_s))
    tot = (
        np.add.reduceat(n[order], starts)
        if len(key_s)
        else np.zeros(0, np.int64)
    )
    dk = key_s[starts] if len(key_s) else key_s
    return dk // V, (dk % V).astype(np.int64), tot, vocab


ORACLE_MODE = """
SELECT user_id, event_type AS mode_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def q_topk_types_per_user(sf_dir: str) -> pa.Table:
    """Per-key top-k most-frequent values (k=2) — the grouped
    heavy-hitters companion of the mode: same partial-count →
    groupby-sum → keyed exchange shape, emitting each segment's first
    k rows of the (count desc, value asc) order with their rank."""
    from ..functions.window import keyed_window, segment_starts

    K = 2
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    counted = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def pick(g: pa.Table) -> pa.Table:
        uid, codes, tot, vocab = _fold_pair_counts(g)
        order = np.lexsort((codes, -tot, uid))
        uid_s = uid[order]
        start_idx = np.flatnonzero(segment_starts(uid_s))
        # rank within each segment, keep rank <= K
        rank = np.arange(len(uid_s)) - np.repeat(
            start_idx, np.diff(np.append(start_idx, len(uid_s)))
        ) + 1
        keep = rank <= K
        sel = order[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_type": vocab.take(pa.array(codes[sel], pa.int64())),
                "n": pa.array(tot[sel], pa.int64()),
                "rnk": pa.array(rank[keep], pa.int64()),
            }
        )

    return keyed_window(counted, "user_id", pick)


ORACLE_TOPK_TYPES = """
SELECT user_id, event_type, n, rnk FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rnk
  FROM events GROUP BY user_id, event_type
) WHERE rnk <= 2
"""


def q_string_agg_per_user(sf_dir: str) -> pa.Table:
    """Grouped ordered string aggregation (ClickHouse groupArray /
    SQL string_agg ... ORDER BY): bucket exchange co-locates each
    user's rows, one lexsort by (user, event_id) per bucket, then ONE
    vectorized ``pc.binary_join`` over a ListArray built straight from
    the segment offsets — no per-key Python loop, no pandas.  The
    deterministic ORDER BY (unique event_id) makes the concatenation
    reproducible and oracle-exact."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))
        uid = uid[order]
        types = g.column("event_type").combine_chunks().take(
            pa.array(order, pa.int64())
        )
        start_idx = np.flatnonzero(segment_starts(uid))
        offsets = np.append(start_idx, len(uid)).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets), types)
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "types_csv": pc.binary_join(lst, ","),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_STRING_AGG = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_id) AS types_csv
FROM events GROUP BY user_id
"""


def q_moments_value_per_user(sf_dir: str) -> pa.Table:
    """Distributed second-moment statistics with EXACT integer
    arithmetic: per-batch partial (n, sum, sum-of-squares) over cents
    — fully associative, so the shuffle moves one row per (user,
    batch), not the events — then a tiny groupby-sum.  Variance /
    stddev derive from these moments identically on both sides; the
    engine ships the exact BIGINT moments so parity is bit-exact (no
    float summation-order drift)."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, cents = uid[order], cents[order]
        keys, starts = np.unique(uid, return_index=True)
        n = np.diff(np.append(starts, len(uid)))
        csum = np.add.reduceat(cents, starts)
        sqsum = np.add.reduceat(cents * cents, starts)
        return pa.table(
            {
                "user_id": pa.array(keys, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(csum, pa.int64()),
                "sumsq_cents": pa.array(sqsum, pa.int64()),
            }
        )

    from ..functions.window import keyed_window, segment_starts

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # final fold through the hash-bucket exchange: Ray's sort-based
    # groupby on the partial rows measured 6x slower at 20M events
    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        for c in ("n_events", "sum_cents", "sumsq_cents"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    return keyed_window(partials, "user_id", fold)


ORACLE_MOMENTS = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)
                * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sumsq_cents
FROM events GROUP BY user_id
"""


def q_corr_value_ts_per_user(sf_dir: str) -> pa.Table:
    """Grouped Pearson correlation of (time, value) per user — the
    'is this user's spend trending' primitive — with EXACT integer
    moments: x = whole minutes since the global min ts, y = cents.
    Per-batch partials ship (n, Σx, Σy, Σx², Σy², Σxy) as BIGINTs —
    associative, one row per (user, batch) crosses the exchange —
    then the keyed hash-bucket fold sums them and the corr derives in
    float64 with an expression tree mirrored token-for-token in the
    oracle, so even the floats are bit-identical."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    # pass 1: global min ts (one scalar; the oracle's subquery twin)
    min_us = ds.aggregate(Min("ts"))["min(ts)"]
    min_us = pa.scalar(min_us).cast(pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) - min_us
        ) // 60_000_000
        y = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        keys, starts = np.unique(uid, return_index=True)
        n = np.diff(np.append(starts, len(uid)))
        cols = {
            "user_id": pa.array(keys, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        }
        for name, v in (
            ("sx", x), ("sy", y), ("sxx", x * x), ("syy", y * y),
            ("sxy", x * y),
        ):
            cols[name] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        acc = {}
        for c in ("n_events", "sx", "sy", "sxx", "syy", "sxy"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            acc[c] = np.add.reduceat(v, starts)
        # float64 tail, op order mirrored in ORACLE_CORR exactly
        n = acc["n_events"].astype(np.float64)
        sx, sy = acc["sx"].astype(np.float64), acc["sy"].astype(np.float64)
        sxx, syy = acc["sxx"].astype(np.float64), acc["syy"].astype(np.float64)
        sxy = acc["sxy"].astype(np.float64)
        cov = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = cov / den
        cols["n_events"] = pa.array(acc["n_events"], pa.int64())
        # zero-variance groups are NULL (matches the oracle's CASE)
        cols["corr_ts_value"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, corr)
        ).cast(pa.float64())
        t = pa.table(cols)
        return t.filter(pc.greater_equal(t.column("n_events"), 2))

    return keyed_window(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        fold,
    ).sort("user_id")


ORACLE_CORR = """
WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
b AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT t0 FROM m)) // 60000000 AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN sqrt(CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n_events AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
            THEN NULL
            ELSE (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_events AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr_ts_value
FROM s WHERE n_events >= 2
ORDER BY user_id
"""


def q_histogram_value(sf_dir: str) -> pa.Table:
    """Equi-width histogram of event values over the observed [min,
    max] cents range, NBINS=20 — exact integer bin edges so the oracle
    mirrors bit-for-bit.  Distributed: one tiny min/max aggregate,
    then per-batch bincount partials (each batch ships <= NBINS rows)
    folded by a 20-key groupby-sum."""
    NBINS = 20
    ds = _read(sf_dir, "events", ["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t.column("value"))})

    cents = ds.map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    mm = cents.aggregate(Min("c"), Max("c"))
    lo, hi = int(mm["min(c)"]), int(mm["max(c)"])
    width = int(np.ceil((hi - lo + 1) / float(NBINS)))

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        b = (c - lo) // width
        counts = np.bincount(b, minlength=NBINS)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    rows = (
        cents.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    t = _from_rows(rows, {"bin": pa.int64(), "n": pa.int64()})
    t = t.append_column(
        "lo_cents",
        pc.add(pc.multiply(t.column("bin"), pa.scalar(width, pa.int64())),
               pa.scalar(lo, pa.int64())),
    )
    return t.select(["bin", "lo_cents", "n"]).sort_by([("bin", "ascending")])


ORACLE_HISTOGRAM = """
WITH b AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
mm AS (SELECT min(c) AS lo, max(c) AS hi FROM b),
w AS (SELECT lo, CAST(ceil((hi - lo + 1) / 20.0) AS BIGINT) AS width FROM mm)
SELECT (c - lo) // width AS bin,
       lo + ((c - lo) // width) * width AS lo_cents,
       count(*) AS n
FROM b, w
GROUP BY 1, 2
ORDER BY bin
"""


ORACLE_WINDOW_TILES = """
SELECT event_id, user_id,
       ntile(4) OVER w AS tile4,
       first_value(event_id) OVER w AS first_eid,
       last_value(event_id) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_eid,
       rank() OVER r AS cents_rank,
       percent_rank() OVER r AS cents_prank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       r AS (PARTITION BY user_id
             ORDER BY CAST(ROUND(value * 100) AS BIGINT))
"""


# ---------------------------------------------------------------------------
# 9. Reshape: pivot / unpivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_event_counts(sf_dir: str) -> pa.Table:
    """Long→wide: per-user occurrence counts of each event type as
    columns.  Batch-local partial pivot (mask bincounts) → tiny
    groupby-sum; the shuffle moves wide partials, not events."""
    from ..functions.reshape import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type", _EVENT_TYPES)


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY user_id
"""


def q_unpivot_event_counts(sf_dir: str) -> pa.Table:
    """Wide→long round-trip: melt the pivoted per-user counts back to
    (user_id, event_type, n) rows — zero-shuffle batch-local melt."""
    from ..functions.reshape import pivot_counts, unpivot

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    wide = pivot_counts(ds, "user_id", "event_type", _EVENT_TYPES)
    return unpivot(
        wide,
        ["user_id"],
        ["n_" + c for c in _EVENT_TYPES],
        var_name="event_type",
        value_name="n",
    )


ORACLE_UNPIVOT = """
WITH w AS ({pivot})
SELECT user_id, 'n_' || t AS event_type,
       CASE t WHEN 'click' THEN n_click WHEN 'view' THEN n_view
              WHEN 'purchase' THEN n_purchase WHEN 'signup' THEN n_signup
              ELSE n_error END AS n
FROM w, unnest(['click','view','purchase','signup','error']) AS u(t)
""".format(pivot=ORACLE_PIVOT)


def q_rollup_event_counts(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(event_type, user_id): counts at every prefix
    grouping, NULLs in rolled-up columns.  One distributed pass builds
    the finest level; coarser levels fold the (already tiny) previous
    level."""
    from ..functions.reshape import rollup_counts

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return rollup_counts(ds, ["event_type", "user_id"], "n")


ORACLE_ROLLUP = """
SELECT event_type, user_id, count(*) AS n
FROM events GROUP BY ROLLUP(event_type, user_id)
"""


def q_cube_event_counts(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(event_type, user_id): all 4 grouping sets, each
    derived from the single distributed finest-level aggregation."""
    from ..functions.reshape import cube_counts

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return cube_counts(ds, ["event_type", "user_id"], "n")


ORACLE_CUBE = """
SELECT event_type, user_id, count(*) AS n
FROM events GROUP BY CUBE(event_type, user_id)
"""


#: "big purchase" threshold (cents) for the set-op queries — selective
#: enough that INTERSECT and EXCEPT are both non-trivial at every sf
_BIG_PURCHASE_CENTS = 20_000


def _clickers(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click")).select(
            ["user_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _big_purchasers(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("event_type"), "purchase"),
            pc.greater(_cents(t.column("value")),
                       pa.scalar(_BIG_PURCHASE_CENTS, pa.int64())),
        )
        return t.filter(keep).select(["user_id"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_intersect_click_purchase(sf_dir: str) -> pa.Table:
    """INTERSECT: users who clicked AND made a big purchase (distinct)
    — per-batch distinct + presence flags, one groupby-max combine."""
    from ..functions.setops import set_intersect

    return set_intersect(_clickers(sf_dir), _big_purchasers(sf_dir),
                         ["user_id"])


_SETOP_SIDES = f"""
SELECT user_id FROM events WHERE event_type = 'click'
{{op}}
SELECT user_id FROM events WHERE event_type = 'purchase'
  AND CAST(ROUND(value * 100) AS BIGINT) > {_BIG_PURCHASE_CENTS}
"""

ORACLE_INTERSECT = _SETOP_SIDES.format(op="INTERSECT")


def q_except_click_no_purchase(sf_dir: str) -> pa.Table:
    """EXCEPT: users who clicked but never made a big purchase."""
    from ..functions.setops import set_except

    return set_except(_clickers(sf_dir), _big_purchasers(sf_dir),
                      ["user_id"])


ORACLE_EXCEPT = _SETOP_SIDES.format(op="EXCEPT")


def q_heavy_hitter_users(sf_dir: str) -> pa.Table:
    """Users with ≥0.5% of all events, with EXACT counts, found via a
    Misra–Gries candidate sketch (shuffle moves ≤k rows per batch, not
    the distinct-user domain) + a broadcast-candidate exact recount —
    the 10^10-scale heavy-hitter pattern with an exact SQL oracle."""
    from ..functions.sketch import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", k=256, min_share=0.005)


ORACLE_HEAVY = """
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
HAVING count(*) >= CAST(ceil(0.005 * (SELECT count(*) FROM events)) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# r03 wave: corpus curation search/mixing/contamination operators
# ---------------------------------------------------------------------------


def q_boilerplate_prefixes(sf_dir: str) -> pa.Table:
    """Boilerplate/template detection: 8-token document PREFIXES shared
    by >= 2 docs (headers, license banners, scraped-page chrome — the
    classic C4/RefinedWeb cleanup signal, keyed on the prefix because
    templates anchor at the document start).  Distributed shape: one
    vectorized pass computes each doc's prefix (list_slice +
    binary_join — no row loop), per-batch partial counts collapse
    duplicates before the exchange, then a keyed hash-bucket exchange
    folds counts per prefix (one vectorized group count per bucket —
    never O(distinct prefixes) Ray groups)."""
    MIN_DOCS = 2
    NB = 64
    W = 8
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        prefix = pc.binary_join(pc.list_slice(toks, 0, W), " ")
        tbl = pa.table({"prefix": prefix})
        tbl = tbl.filter(pc.greater(pc.utf8_length(tbl.column("prefix")), 0))
        counts = (
            tbl.group_by("prefix").aggregate([("prefix", "count")])
            .rename_columns(["prefix", "n_docs"])
        )
        h = (key_hash64(counts.column("prefix")) % np.uint64(NB)).astype(
            np.int64
        )
        return counts.append_column("__b", pa.array(h, pa.int64()))

    def bucket(g: pa.Table) -> pa.Table:
        counts = (
            g.group_by("prefix").aggregate([("n_docs", "sum")])
            .rename_columns(["prefix", "n_docs"])
        )
        return counts.filter(
            pc.greater_equal(counts.column("n_docs"), MIN_DOCS)
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket, batch_format="pyarrow")
        .take_all()
    )
    t = _from_rows(rows, {"prefix": pa.string(), "n_docs": pa.int64()})
    return t.sort_by([("n_docs", "descending"), ("prefix", "ascending")])


ORACLE_BOILERPLATE = r"""
SELECT prefix, count(*) AS n_docs
FROM (SELECT array_to_string(
        (regexp_extract_all(lower(text), '\w+'))[1:8], ' ') AS prefix
      FROM documents)
WHERE length(prefix) > 0
GROUP BY prefix HAVING count(*) >= 2
ORDER BY n_docs DESC, prefix
"""


def q_chunk_documents(sf_dir: str) -> pa.Table:
    """Sliding-window document chunking (embedding/RAG prep): 200-char
    windows, stride 160 (40 overlap).  Vectorized: chunk index k is a
    SCALAR per pass, so every doc's k-th chunk slices in one Arrow
    utf8_slice_codeunits call — no per-row Python; the pass count is
    bounded by the longest doc, not the corpus."""
    SIZE, STRIDE = 200, 160
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        # chunk count per doc: 1 + max(0, ceil((len - SIZE) / STRIDE))
        extra = np.ceil(np.maximum(0, n - SIZE) / STRIDE).astype(np.int64)
        n_chunks = 1 + extra
        out = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            alive = n_chunks > k
            sub = t.filter(pa.array(alive))
            piece = pc.utf8_slice_codeunits(
                pc.fill_null(sub.column("text"), ""),
                start=k * STRIDE,
                stop=k * STRIDE + SIZE,
            )
            out.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64)
                        ),
                        "chunk": piece,
                        "chunk_len": pc.utf8_length(piece).cast(pa.int64()),
                    }
                )
            )
        if not out:
            return pa.schema(
                [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                 ("chunk", pa.string()), ("chunk_len", pa.int64())]
            ).empty_table()
        return pa.concat_tables(out)

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_CHUNKS = """
SELECT doc_id, i AS chunk_idx,
       substr(text, 1 + i * 160, 200) AS chunk,
       length(substr(text, 1 + i * 160, 200)) AS chunk_len
FROM documents JOIN range(0, 64) t(i)
  ON t.i <= CAST(ceil(greatest(0, length(text) - 200) / 160.0) AS BIGINT)
"""


def q_edit_distance_pairs(sf_dir: str) -> pa.Table:
    """Exact edit-distance VERIFY over template-candidate pairs: docs
    sharing an 8-token prefix (the boilerplate signal) are compared by
    Levenshtein distance of their 200-char heads; pairs within
    MAXD=40 edits survive.  The near-dup pattern LSH schemes cannot
    give exactly — an edit-metric guarantee on the emitted pairs.

    Distributed shape: candidates never leave their prefix group, so
    ONE keyed hash-bucket exchange on the prefix co-locates each
    group; inside a bucket, pair generation is vectorized per group
    SIZE (<= CAP distinct sizes, `np.triu_indices` broadcast over all
    groups of that size) and the DP itself is `levenshtein_pairs` —
    batched across pairs, one `np.minimum.accumulate` per DP row
    (functions/text.py).  Group sizes are capped at CAP=64 (mirrored
    in the oracle's HAVING, like the n-gram df cap) so a degenerate
    template cannot go quadratic."""
    W, NB, CAP, MAXD, HEAD = 8, 64, 64, 40, 200
    from ..functions.text import codepoint_matrix, levenshtein_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        prefix = pc.binary_join(pc.list_slice(toks, 0, W), " ")
        head = pc.utf8_slice_codeunits(
            pc.fill_null(t.column("text"), ""), start=0, stop=HEAD
        )
        out = pa.table(
            {"doc_id": t.column("doc_id"), "prefix": prefix, "head": head}
        )
        out = out.filter(pc.greater(pc.utf8_length(out.column("prefix")), 0))
        h = (key_hash64(out.column("prefix")) % np.uint64(NB)).astype(np.int64)
        return out.append_column("__b", pa.array(h, pa.int64()))

    def bucket(g: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("edit_dist", pa.int64())]
        ).empty_table()
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("prefix", "ascending"), ("doc_id", "ascending")])
        prefix = g.column("prefix")
        same = pc.equal(
            prefix.slice(1), prefix.slice(0, len(prefix) - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], ~same)))
        sizes = np.diff(np.append(starts, g.num_rows))
        keep = (sizes >= 2) & (sizes <= CAP)
        if not keep.any():
            return empty
        codes, lens = codepoint_matrix(g.column("head"), HEAD)
        ia_all, ib_all = [], []
        # vectorize pair generation per group SIZE: <= CAP distinct
        # sizes, each expands every group of that size in one broadcast
        for s in np.unique(sizes[keep]):
            gs = starts[keep & (sizes == s)]          # [G] group starts
            li, lj = np.triu_indices(int(s), k=1)     # local pair index
            ia_all.append((gs[:, None] + li[None, :]).ravel())
            ib_all.append((gs[:, None] + lj[None, :]).ravel())
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        dist = levenshtein_pairs(codes, lens, ia, ib)
        ok = dist <= MAXD
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(did[ia[ok]], pa.int64()),
                "id_b": pa.array(did[ib[ok]], pa.int64()),
                "edit_dist": pa.array(dist[ok], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket, batch_format="pyarrow")
        .take_all()
    )
    t = _from_rows(
        rows,
        {"id_a": pa.int64(), "id_b": pa.int64(), "edit_dist": pa.int64()},
    )
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


ORACLE_EDIT_DISTANCE = r"""
WITH p AS (
  SELECT doc_id,
         substr(text, 1, 200) AS head,
         array_to_string(
           (regexp_extract_all(lower(text), '\w+'))[1:8], ' ') AS prefix
  FROM documents
),
p2 AS (SELECT * FROM p WHERE length(prefix) > 0),
g AS (SELECT prefix FROM p2
      GROUP BY prefix HAVING count(*) BETWEEN 2 AND 64)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM p2 a
JOIN p2 b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
JOIN g ON g.prefix = a.prefix
WHERE levenshtein(a.head, b.head) <= 40
ORDER BY id_a, id_b
"""


def q_mix_char_budget(sf_dir: str) -> pa.Table:
    """Data mixing: per-source char budget — each source contributes
    docs in deterministic content-hash order until its cumulative
    n_chars exceeds the budget (the sampling primitive behind mixture
    weights like 'cap source X at N tokens').  Distributed: one keyed
    hash exchange on source, then ONE vectorized segment pass per
    bucket (sort by rank, segment cumsum) — the same shape as
    window_running_totals; no driver-side loop, no global sort."""
    BUDGET = 120_000
    from ..functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "rank_hash", sha256_hex(t.column("doc_id").cast(pa.string()))
        )
        # numeric key for the bucket exchange (source is a string)
        return t.append_column(
            "src_h",
            pa.array(
                (key_hash64(t.column("source")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("source", "ascending"), ("rank_hash", "ascending"),
             ("doc_id", "ascending")]
        )
        src = g.column("source").to_numpy(zero_copy_only=False)
        chars = g.column("n_chars").to_numpy(zero_copy_only=False)
        cum = np.cumsum(chars)
        # rebase the running sum at each source boundary
        starts = np.flatnonzero(
            np.concatenate([[True], src[1:] != src[:-1]])
        )
        base = np.zeros(len(chars), dtype=cum.dtype)
        base[starts[1:]] = cum[starts[1:] - 1]
        np.maximum.accumulate(base, out=base)
        keep = (cum - base) <= BUDGET
        return g.filter(pa.array(keep)).select(["doc_id", "source"])

    rows = keyed_window(ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ), "src_h", per_bucket).take_all()
    return _from_rows(
        rows, {"doc_id": pa.int64(), "source": pa.string()}
    ).sort_by("doc_id")


ORACLE_MIX = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id
         ) AS cum
  FROM documents
) WHERE cum <= 120000 ORDER BY doc_id
"""


def q_contamination_documents(sf_dir: str) -> pa.Table:
    """Benchmark-contamination scan: corpus docs sharing any 5-token
    shingle with the eval set (doc_id % 11 == 0 — a held-out slice).
    Distributed: the eval side is SMALL by construction (a benchmark,
    not a corpus), so its shingle set broadcasts once via ray.put and
    each corpus batch probes it with one vectorized is_in — zero
    shuffle.  Past ~10M eval shingles the same pipeline switches to a
    shingle-hash semi-join (the exact_dedup keep-list pattern)."""
    W = 5
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingles_vec(t: pa.Table) -> pa.Table:
        """Vectorized shingling: flatten tokens once, join W parallel
        shifted views (one binary_join_element_wise call), mask windows
        that cross document boundaries via segment offsets."""
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ok))
        parent = parent[ok]
        n = len(flat)
        if n < W:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "shingle": pa.array([], pa.string())}
            )
        views = [flat.slice(j, n - W + 1) for j in range(W)]
        sh = pc.binary_join_element_wise(*views, " ")
        # a window is valid only if its first and last token share a doc
        valid = parent[: n - W + 1] == parent[W - 1 :]
        doc = pc.take(
            t.column("doc_id"), pa.array(parent[: n - W + 1], pa.int64())
        )
        return pa.table({"doc_id": doc, "shingle": sh}).filter(pa.array(valid))

    # eval side: small by construction — collect its distinct shingles
    def eval_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 11 == 0))

    eval_sh = (
        ds.map_batches(eval_only, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(shingles_vec, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    eval_set = pa.array(
        sorted({r["shingle"] for r in eval_sh}), pa.string()
    )
    import ray as _ray

    eval_ref = _ray.put(eval_set)

    def probe(t: pa.Table) -> pa.Table:
        sh = shingles_vec(t)
        ids = sh.column("doc_id").to_numpy(zero_copy_only=False)
        sh = sh.filter(pa.array(ids % 11 != 0))
        hit = pc.is_in(sh.column("shingle"), value_set=_ray.get(eval_ref))
        docs = sh.filter(hit).column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(np.unique(docs), pa.int64())})

    rows = ds.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ids = sorted({int(r["doc_id"]) for r in rows})
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 4)
)
SELECT DISTINCT c.doc_id FROM sh c
WHERE c.doc_id % 11 <> 0
  AND EXISTS (SELECT 1 FROM sh e
              WHERE e.doc_id % 11 = 0 AND e.shingle = c.shingle)
ORDER BY doc_id
"""


def q_bm25_search(sf_dir: str) -> pa.Table:
    """BM25 top-20 for a fixed query — the retrieval primitive over
    the corpus (Robertson/Spärck Jones weighting, k1=1.2 b=0.75).
    Distributed: ONE streaming pass computes per-doc (dl, tf_t) with
    RE2 kernels (only query terms are counted — the inverted-index
    pruning happens at scan time); corpus stats (N, sum dl, df_t) are
    integer partials summed driver-side (a handful of ints per batch);
    scoring + partial top-k runs in a second pruned pass over docs
    with any hit.  Float determinism: every input to the double-math
    score is an INTEGER (tf, dl, N, df, sum_dl), added in fixed term
    order — bit-identical to the SQL oracle's expression tree."""
    TERMS = ("data", "model", "training")
    K1, B = 1.2, 0.75
    K = 20
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(t.column("text"), ""))
        cols = {
            "doc_id": t.column("doc_id"),
            "dl": pc.count_substring_regex(low, pattern=r"\w+").cast(pa.int64()),
        }
        for term in TERMS:
            cols[f"tf_{term}"] = pc.count_substring_regex(
                low, pattern=rf"\b{term}\b"
            ).cast(pa.int64())
        return pa.table(cols)

    st = ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def partials(t: pa.Table) -> pa.Table:
        row = {"n": [t.num_rows], "sum_dl": [int(pc.sum(t.column("dl")).as_py() or 0)]}
        for term in TERMS:
            row[f"df_{term}"] = [
                int(
                    pc.sum(
                        pc.greater(t.column(f"tf_{term}"), 0).cast(pa.int64())
                    ).as_py()
                    or 0
                )
            ]
        return pa.table(row)

    agg = pa.Table.from_pylist(
        st.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    N = int(pc.sum(agg.column("n")).as_py())
    sum_dl = int(pc.sum(agg.column("sum_dl")).as_py())
    avgdl = sum_dl / N
    idf = {
        term: np.log(
            (N - int(pc.sum(agg.column(f"df_{term}")).as_py()) + 0.5)
            / (int(pc.sum(agg.column(f"df_{term}")).as_py()) + 0.5)
            + 1.0
        )
        for term in TERMS
    }

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(t.num_rows, dtype=np.float64)
        # expression tree mirrors ORACLE_BM25 token-for-token (literal
        # 2.2/0.25/0.75, dl/avgdl grouped) so doubles stay bit-equal
        norm = K1 * (0.25 + 0.75 * (dl / avgdl))
        for term in TERMS:
            tf = (
                t.column(f"tf_{term}")
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            s = s + idf[term] * (tf * 2.2) / (tf + norm)
        out = t.append_column("score", pa.array(s, pa.float64()))
        out = out.filter(pa.array(s > 0))
        # partial top-k per batch (score desc, doc_id asc tie-break)
        return out.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        ).slice(0, K)

    rows = (
        st.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    t = _from_rows(
        rows,
        {"doc_id": pa.int64(), "dl": pa.int64(),
         **{f"tf_{term}": pa.int64() for term in TERMS},
         "score": pa.float64()},
    )
    return t.sort_by(
        [("score", "descending"), ("doc_id", "ascending")]
    ).slice(0, K)


ORACLE_BM25 = r"""
WITH stats AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\w+')) AS dl,
         len(regexp_extract_all(lower(text), '\bdata\b')) AS tf_data,
         len(regexp_extract_all(lower(text), '\bmodel\b')) AS tf_model,
         len(regexp_extract_all(lower(text), '\btraining\b')) AS tf_training
  FROM documents
), g AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl,
         count(*) FILTER (tf_data > 0) AS df_data,
         count(*) FILTER (tf_model > 0) AS df_model,
         count(*) FILTER (tf_training > 0) AS df_training
  FROM stats
)
SELECT doc_id, dl, tf_data, tf_model, tf_training,
       ln((n - df_data + 0.5) / (df_data + 0.5) + 1.0)
         * (tf_data * 2.2) / (tf_data + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
     + ln((n - df_model + 0.5) / (df_model + 0.5) + 1.0)
         * (tf_model * 2.2) / (tf_model + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
     + ln((n - df_training + 0.5) / (df_training + 0.5) + 1.0)
         * (tf_training * 2.2)
           / (tf_training + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
       AS score
FROM stats, g
WHERE tf_data > 0 OR tf_model > 0 OR tf_training > 0
ORDER BY score DESC, doc_id LIMIT 20
"""


def q_redact_pii_documents(sf_dir: str) -> pa.Table:
    """PII redaction — the write side of the pii_scan pre-pass: replace
    emails/URLs/IPv4/long digit runs with typed placeholders, emit the
    redacted text + per-doc replacement count.  One compiled-RE2
    replace kernel per pattern, fully vectorized, embarrassingly
    parallel (no shuffle); patterns AND application order are shared
    verbatim with the SQL oracle (order matters — a URL can contain
    digits)."""
    from ..functions.text import PII_PATTERNS

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    order = ["n_emails", "n_urls", "n_ipv4", "n_long_digits"]
    marks = {"n_emails": "[EMAIL]", "n_urls": "[URL]",
             "n_ipv4": "[IP]", "n_long_digits": "[NUM]"}

    def redact(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        total = np.zeros(t.num_rows, dtype=np.int64)
        for name in order:
            pat = PII_PATTERNS[name]
            total += (
                pc.count_substring_regex(text, pattern=pat)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            text = pc.replace_substring_regex(
                text, pattern=pat, replacement=marks[name]
            )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "redacted": text,
                "n_redactions": pa.array(total, pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_REDACT = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^\s]+', '[URL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\d{9,}', '[NUM]', 'g') AS redacted,
  len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
  + len(regexp_extract_all(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      'https?://[^\s]+'))
  + len(regexp_extract_all(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^\s]+', '[URL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
  + len(regexp_extract_all(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          'https?://[^\s]+', '[URL]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      '\d{9,}')) AS n_redactions
FROM documents
"""


def q_token_rarity_documents(sf_dir: str) -> pa.Table:
    """Unigram-LM rarity filter (the integer-exact core of CCNet-style
    perplexity filtering): per doc, the SUM of the corpus-wide counts
    of its tokens plus its token count — docs whose mean token
    frequency (sum_freq / n_tokens) is low are rare/OOD, high are
    boilerplate-like.  Both outputs are INTEGERS, so the parity hash
    is exact where a float mean-log-prob would be association-
    sensitive.  Distributed shape: corpus token counts via per-batch
    partial counts + one keyed fold (the top_tokens exchange); the
    count table broadcasts via ray.put while small (here: a pooled
    vocab), switching to a token-hash semi-join at web-scale vocab —
    the per-doc pass is then index_in + one segment reduceat, no row
    loops."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return (
            pa.table({"token": flat})
            .group_by("token")
            .aggregate([("token", "count")])
            .rename_columns(["token", "n"])
        )

    partial_rows = ds.map_batches(
        tok_counts, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    counts = (
        pa.Table.from_pylist(partial_rows)
        .group_by("token")
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    import ray as _ray

    vocab_ref = _ray.put(counts.column("token").combine_chunks())
    n_ref = _ray.put(
        counts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    )

    def rarity(t: pa.Table) -> pa.Table:
        vocab, nvec = _ray.get(vocab_ref), _ray.get(n_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(ok)), parent[ok]
        idx = pc.index_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        freqs = nvec[idx.astype(np.int64)]
        sum_freq = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(sum_freq, parent, freqs)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_tok, parent, 1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "sum_freq": pa.array(sum_freq, pa.int64()),
            }
        )

    return ds.map_batches(rarity, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_RARITY = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS token
  FROM documents
), cnt AS (
  SELECT token, count(*) AS n FROM tok GROUP BY token
)
SELECT doc_id, count(*) AS n_tokens, sum(n)::BIGINT AS sum_freq
FROM tok JOIN cnt USING (token)
GROUP BY doc_id
"""


def q_repetition_stats_documents(sf_dir: str) -> pa.Table:
    """Within-document repetition (Gopher-rule quality signal): total
    vs distinct 4-token shingles per doc — a high duplicate fraction
    marks looping/boilerplate generations.  Integer outputs keep the
    parity hash exact.  Vectorized: shingles come from W shifted views
    of the flattened token stream joined in ONE kernel call; per-doc
    distinct counting is a batch-local group_by over (doc, shingle)
    (docs never span batches), no row loops, no shuffle."""
    W = 4
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(ok)), parent[ok]
        n = len(flat)
        n_sh = np.zeros(t.num_rows, dtype=np.int64)
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        if n >= W:
            views = [flat.slice(j, n - W + 1) for j in range(W)]
            sh = pc.binary_join_element_wise(*views, " ")
            valid = parent[: n - W + 1] == parent[W - 1 :]
            doc_row = parent[: n - W + 1][valid]
            sh = sh.filter(pa.array(valid))
            np.add.at(n_sh, doc_row, 1)
            uniq = (
                pa.table(
                    {"row": pa.array(doc_row, pa.int64()), "sh": sh}
                )
                .group_by(["row", "sh"])
                .aggregate([])
            )
            rows = uniq.column("row").to_numpy(zero_copy_only=False)
            np.add.at(n_distinct, rows.astype(np.int64), 1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_distinct_shingles": pa.array(n_distinct, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_REPETITION = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
)
SELECT d.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(s.n_distinct_shingles, 0) AS n_distinct_shingles
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_shingles,
         count(DISTINCT shingle) AS n_distinct_shingles
  FROM sh GROUP BY doc_id
) s USING (doc_id)
"""


def q_compression_ratio_documents(sf_dir: str) -> pa.Table:
    """zlib compressibility (the Gopher/FineWeb repetitiveness
    signal): highly repetitive or templated text compresses far below
    natural prose, so `gz_bytes / raw_bytes` is a cheap quality score
    that needs no tokenizer or model.  Per-doc compression is inherent
    (zlib is a sequential codec) but runs at C speed over memoryview
    slices of the Arrow flat buffer — no Python string materializes.
    No SQL twin (DuckDB has no zlib scalar), so this entry is
    rows-only at the gate; determinism is pinned by zlib level 6."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        n = len(txt)
        offs = np.frombuffer(
            txt.buffers()[1], np.int32, count=n + 1, offset=txt.offset * 4
        ).astype(np.int64)
        mv = memoryview(txt.buffers()[2] or b"")
        gz = np.fromiter(
            (
                len(zlib.compress(mv[s:e], 6))
                for s, e in zip(offs[:-1], offs[1:])
            ),
            np.int64,
            count=n,
        )
        raw = offs[1:] - offs[:-1]
        with np.errstate(divide="ignore", invalid="ignore"):
            r = gz.astype(np.float64) / raw.astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "raw_bytes": pa.array(raw, pa.int64()),
                "gz_bytes": pa.array(gz, pa.int64()),
                # empty docs: no bytes, no signal -> null
                "ratio": pa.Array.from_pandas(
                    np.where(raw == 0, np.nan, r)
                ).cast(pa.float64()),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_ngrams_documents(sf_dir: str) -> pa.Table:
    """Cross-document duplicated-span signal (the core statistic of
    exact-substring training-data dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): per document, how
    many of its word-4-shingles (with multiplicity) also occur in at
    least one OTHER document.  A high dup fraction marks mirrored /
    templated / licensed-text spans that substring dedup would cut.

    Fully distributed in two bounded-bucket shuffles, mirroring
    `ngram_jaccard_pairs`: batch pass emits one row per (doc, shingle)
    with its in-doc multiplicity (docs never span batches, so the
    multiplicity is complete batch-side; 64-bit hashed shingles stand
    in for strings — collision odds (#shingles)^2/2^64 ≈ 0) → shingle-
    hash bucket exchange where a vectorized run count marks shingles
    seen in ≥2 docs and folds per-doc partials → doc-hash bucket
    exchange sums the ≤NB partials per doc.  Zero-shingle docs ride a
    sentinel row so every document emits exactly one output row.
    Integer outputs → exact SQL parity."""
    from ..functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = 4
    NB = 64
    DB = 32

    def shingle_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        sh = np.zeros(0, np.int64)
        shp = np.zeros(0, np.int64)
        if len(h) >= W:
            K = np.uint64(1099511628211)
            m = len(h) - W + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(W):
                acc = acc * K + h[j : m + j]
            valid = parents[:m] == parents[W - 1 :]
            sh = (acc[valid] >> np.uint64(1)).astype(np.int64)
            shp = parents[:m][valid]
        # per-(doc,shingle) multiplicity, batch-local
        if len(sh):
            order = np.lexsort((sh, shp))
            sh, shp = sh[order], shp[order]
            starts = np.flatnonzero(
                np.concatenate(([True], (sh[1:] != sh[:-1]) | (shp[1:] != shp[:-1])))
            )
            mult = np.diff(np.concatenate((starts, [len(sh)])))
            sh, shp = sh[starts], shp[starts]
        else:
            mult = np.zeros(0, np.int64)
        doc_ids = docs[shp] if len(sh) else np.zeros(0, np.int64)
        return pa.table(
            {
                "s": pa.array(
                    np.concatenate((sh, np.full(len(docs), -1, np.int64))),
                    pa.int64(),
                ),
                "doc_id": pa.array(
                    np.concatenate((doc_ids, docs)), pa.int64()
                ),
                "m": pa.array(
                    np.concatenate((mult, np.zeros(len(docs), np.int64))),
                    pa.int64(),
                ),
                "__b": pa.array(
                    np.concatenate((sh % NB, docs % NB)), pa.int64()
                ),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        m = group.column("m").to_numpy(zero_copy_only=False)
        sent = s == -1
        real = ~sent
        out_doc = [doc[sent]]
        out_tot = [np.zeros(int(sent.sum()), np.int64)]
        out_dup = [np.zeros(int(sent.sum()), np.int64)]
        if real.any():
            rs, rd, rm = s[real], doc[real], m[real]
            order = np.lexsort((rd, rs))
            rs, rd, rm = rs[order], rd[order], rm[order]
            starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
            lens = np.diff(np.concatenate((starts, [len(rs)])))
            dup_run = np.repeat(lens >= 2, lens)
            uniq, inv = np.unique(rd, return_inverse=True)
            tot = np.zeros(len(uniq), np.int64)
            dup = np.zeros(len(uniq), np.int64)
            np.add.at(tot, inv, rm)
            np.add.at(dup, inv, np.where(dup_run, rm, 0))
            out_doc.append(uniq)
            out_tot.append(tot)
            out_dup.append(dup)
        d = np.concatenate(out_doc)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "tot": pa.array(np.concatenate(out_tot), pa.int64()),
                "dup": pa.array(np.concatenate(out_dup), pa.int64()),
                "__db": pa.array(d % DB, pa.int64()),
            }
        )

    def doc_fold(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        tot = group.column("tot").to_numpy(zero_copy_only=False)
        dup = group.column("dup").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        t = np.zeros(len(uniq), np.int64)
        u = np.zeros(len(uniq), np.int64)
        np.add.at(t, inv, tot)
        np.add.at(u, inv, dup)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_shingles": pa.array(t, pa.int64()),
                "n_dup_shingles": pa.array(u, pa.int64()),
            }
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


ORACLE_DUP_NGRAMS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
), g AS (
  SELECT shingle, count(DISTINCT doc_id) AS nd FROM sh GROUP BY shingle
)
SELECT d.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(s.n_dup_shingles, 0) AS n_dup_shingles
FROM documents d LEFT JOIN (
  SELECT sh.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_shingles
  FROM sh JOIN g USING (shingle) GROUP BY sh.doc_id
) s USING (doc_id)
"""


def q_remove_dup_spans_documents(sf_dir: str) -> pa.Table:
    """Exact-substring span REMOVAL — the action half of the Lee et
    al. 2022 dedup whose statistic `dup_ngrams_documents` computes:
    every word position covered by a word-4-shingle occurrence that is
    a non-first duplicate (the gram occurs >1 times corpus-wide, and
    this occurrence is not the lexicographically-first (doc, pos)) is
    cut; documents are rebuilt from the surviving tokens.  Keeping the
    FIRST occurrence is what makes the rule deterministic and
    SQL-mirrorable.

    Scale shape: O(tokens) occurrence rows is inherent to exact-
    substring dedup (the paper builds a corpus suffix array — also
    O(tokens)); here it is two bounded-bucket shuffles. Batch pass
    emits one row per shingle occurrence (hash stands in for the gram,
    collision odds (#grams)^2/2^64 ≈ 0) → shingle-hash buckets mark
    non-first members of each hash run (vectorized lexsort + run
    scan) → removal rows and the original docs meet in doc-hash
    buckets where ONE vectorized pass per bucket (interval delta +
    cumsum cover mask + reduceat offsets + Arrow binary_join) rebuilds
    every doc's text.  No per-doc Python, no full-corpus state."""
    from ..functions.text import token_hash_stream, token_strings

    W = 4
    NB = 64
    DB = 32

    def occurrence_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        sh = np.zeros(0, np.int64)
        shp = np.zeros(0, np.int64)
        pos = np.zeros(0, np.int64)
        if len(h) >= W:
            K = np.uint64(1099511628211)
            m = len(h) - W + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(W):
                acc = acc * K + h[j : m + j]
            valid = parents[:m] == parents[W - 1 :]
            sh = (acc[valid] >> np.uint64(1)).astype(np.int64)
            shp = parents[:m][valid]
            # within-doc 0-based token position of each shingle start:
            # absolute index minus the doc's first absolute index
            starts = np.flatnonzero(
                np.concatenate(([True], parents[1:] != parents[:-1]))
            )
            first_abs = np.repeat(starts, np.diff(np.concatenate((starts, [len(parents)]))))
            pos = (np.arange(len(parents), dtype=np.int64) - first_abs)[:m][valid]
        return pa.table(
            {
                "s": pa.array(sh, pa.int64()),
                "doc_id": pa.array(docs[shp] if len(sh) else shp, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "__db": pa.array(sh % NB, pa.int64()),
            }
        )

    def mark_nonfirst(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc, s))
        s, doc, pos = s[order], doc[order], pos[order]
        first_of_run = np.concatenate(([True], s[1:] != s[:-1]))
        run_len = np.diff(
            np.concatenate((np.flatnonzero(first_of_run), [len(s)]))
        )
        in_dup_run = np.repeat(run_len > 1, run_len)
        # non-first members of every >1 run (the first occurrence of a
        # duplicated gram is KEPT, all later (doc,pos) are cut)
        cut = in_dup_run & ~first_of_run
        doc, pos = doc[cut], pos[cut]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "text": pa.nulls(len(doc), pa.string()),
                "__b": pa.array(doc % DB, pa.int64()),
            }
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").cast(pa.int64())
        d = docs.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": docs,
                "pos": pa.array(np.full(len(d), -1, np.int64), pa.int64()),
                "text": t.column("text"),
                "__b": pa.array(d % DB, pa.int64()),
            }
        )

    def rebuild(group: pa.Table) -> pa.Table:
        is_doc = pc.equal(group.column("pos"), -1)
        d_rows = group.filter(is_doc)
        r_rows = group.filter(pc.invert(is_doc))
        flat, parents = token_strings(d_rows.column("text"))
        n_docs = d_rows.num_rows
        counts = np.zeros(n_docs, np.int64)
        if len(parents):
            np.add.at(counts, parents, 1)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        delta = np.zeros(len(flat) + 1, np.int64)
        if r_rows.num_rows:
            ridx = pc.index_in(
                r_rows.column("doc_id"), d_rows.column("doc_id")
            ).to_numpy(zero_copy_only=False)
            g = offsets[ridx] + r_rows.column("pos").to_numpy(
                zero_copy_only=False
            )
            np.add.at(delta, g, 1)
            np.add.at(delta, g + W, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        cs = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        kept_counts = cs[offsets[1:]] - cs[offsets[:-1]]
        new_offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        kept = flat.filter(pa.array(keep)) if len(flat) else flat
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept
        )
        return pa.table(
            {
                "doc_id": d_rows.column("doc_id"),
                "text_dedup": pc.binary_join(lists, " "),
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    removals = (
        ds.map_batches(occurrence_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__db")
        .map_groups(mark_nonfirst, batch_format="pyarrow")
    )
    docs = ds.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (
        removals.union(docs)
        .groupby("__b")
        .map_groups(
            lambda g: rebuild(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )


ORACLE_REMOVE_DUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, i AS p, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
), cnt AS (
  SELECT shingle, count(*) AS c, min(doc_id * 1000000 + p) AS fk
  FROM sh GROUP BY shingle
), dupocc AS (
  SELECT s.doc_id, s.p FROM sh s JOIN cnt USING (shingle)
  WHERE cnt.c > 1 AND s.doc_id * 1000000 + s.p <> cnt.fk
), words AS (
  SELECT doc_id, i AS pos, ts[i] AS word
  FROM toks JOIN range(1, 4096) r(i) ON r.i <= len(ts)
), removed AS (
  SELECT DISTINCT w.doc_id, w.pos
  FROM words w JOIN dupocc o
    ON o.doc_id = w.doc_id AND w.pos BETWEEN o.p AND o.p + 3
)
SELECT t.doc_id,
       coalesce(
         string_agg(w.word, ' ' ORDER BY w.pos)
           FILTER (WHERE w.pos IS NOT NULL AND r.pos IS NULL),
         '') AS text_dedup,
       count(r.pos)::BIGINT AS n_removed
FROM toks t
LEFT JOIN words w USING (doc_id)
LEFT JOIN removed r ON r.doc_id = w.doc_id AND r.pos = w.pos
GROUP BY t.doc_id
"""


def q_tfidf_top_terms(sf_dir: str) -> pa.Table:
    """Per-document keyword extraction: top-3 terms by tf·idf over the
    FULL corpus vocabulary (idf = ln((N+1)/(df+1)) + 1, ties → term
    asc).  Unlike `bm25_search` (3 fixed query terms, doc ranking),
    this ranks every term of every doc — the keyword/tag primitive.

    Two bounded-bucket shuffles, df computed IN the term bucket it
    already lives in: batch pass emits one row per distinct (doc,
    term) with its tf (docs never span batches) → term-hash buckets
    hold every occurrence of a term, so df is a run length and rides
    back attached to the same rows (no second scan, no driver dict) →
    doc-hash buckets score and take the per-doc top-3 with ONE Arrow
    sort + run-rank per bucket.  Floats: integer tf/df/N enter the
    double expression in the oracle's exact tree shape."""
    from ..functions.text import token_strings

    NB = 64
    DB = 32
    TOPK = 3
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def term_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parents = token_strings(t.column("text"))
        tb = pa.table(
            {"term": flat, "doc_id": pa.array(docs[parents], pa.int64())}
        ).sort_by([("term", "ascending"), ("doc_id", "ascending")])
        term = tb.column("term").combine_chunks()
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(did)
        if n == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        neq = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.concatenate(([True], neq | (did[1:] != did[:-1])))
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate((starts, [n])))
        out_term = term.take(pa.array(starts, pa.int64()))
        h = key_hash64(out_term)
        return pa.table(
            {
                "term": out_term,
                "doc_id": pa.array(did[starts], pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "__b": pa.array(
                    (h % np.uint64(NB)).astype(np.int64), pa.int64()
                ),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        tb = group.sort_by([("term", "ascending")])
        term = tb.column("term").combine_chunks()
        n = len(term)
        neq = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.concatenate(([True], neq)))
        run = np.diff(np.concatenate((starts, [n])))
        df = np.repeat(run, run)  # (doc,term) rows are globally unique
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term": term,
                "doc_id": tb.column("doc_id"),
                "tf": tb.column("tf"),
                "df": pa.array(df, pa.int64()),
                "__db": pa.array(did % DB, pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = group.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        # mirrors the oracle tree: tf * (ln((N+1.0)/(df+1.0)) + 1.0)
        score = tf * (np.log((n_docs + 1.0) / (df + 1.0)) + 1.0)
        tb = group.append_column("score", pa.array(score, pa.float64())).sort_by(
            [
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ]
        )
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], did[1:] != did[:-1]))
        idx = np.arange(len(did), dtype=np.int64)
        rank = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
        keep = rank <= TOPK
        tb = tb.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": tb.column("doc_id"),
                "term": tb.column("term"),
                "rank": pa.array(rank[keep], pa.int64()),
                "tf": tb.column("tf"),
                "df": tb.column("df"),
                "score": tb.column("score"),
            }
        )

    return (
        ds.map_batches(term_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: attach_df(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
        .groupby("__db")
        .map_groups(
            lambda g: topk(g.drop_columns(["__db"])), batch_format="pyarrow"
        )
    )


ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (df.df + 1.0)) + 1.0)
           AS score
  FROM tf JOIN df USING (term)
), r AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         ) AS rank
  FROM sc
)
SELECT doc_id, term, rank::BIGINT AS rank, tf, df, score
FROM r WHERE rank <= 3
"""


def q_pca_embeddings(sf_dir: str) -> pa.Table:
    """Exact distributed PCA projection (top-2) of the embeddings
    table — fit = ONE moment-partial scan (count/sum/Gram per block,
    d×d driver eigh), project = one matmul pass. Eigendecomposition →
    no SQL oracle (rows-only gate); exactness vs single-process numpy
    PCA (same sign convention, 1e-9) is tested in test_functions.py."""
    from ..functions.similarity import pca_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_embeddings(ds, n_components=2)


def q_kmeans_embeddings(sf_dir: str) -> pa.Table:
    """Distributed Lloyd's k-means assignment over the embeddings
    table (SemDeDup / cluster-balanced-sampling primitive) — see
    `functions.similarity.kmeans_embeddings` for the combiner shape.
    Iterative model fit → no SQL oracle (rows-only gate); exactness is
    covered by the planted-blob recovery + numpy-Lloyd equivalence
    tests in tests/test_functions.py."""
    from ..functions.similarity import kmeans_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_embeddings(ds, k=8, iters=6)


def q_semdedup_embeddings(sf_dir: str) -> pa.Table:
    """SemDeDup semantic near-dup pairs: k-means fit + within-cluster
    cosine ≥ tau (see `functions.similarity.semdedup_pairs`).  Model-
    fit composite → rows-only gate; the within-cluster restriction is
    recall-tested against the EXACT block-pair operator on a clustered
    fixture in tests/test_functions.py.  tau matches the fixture's
    low-similarity regime (like `embedding_neardup`); on this
    near-random data the intra-cluster restriction keeps only the
    same-cluster subset of the exact tau=0.4 pairs — the documented
    SemDeDup trade (real corpora cluster; this fixture barely does)."""
    from ..functions.similarity import semdedup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup_pairs(ds, k=8, iters=6, tau=0.4)


def q_sort_events(sf_dir: str) -> pa.Table:
    """Global ORDER BY (value DESC, event_id) with exact 1-based ranks —
    the reference delegates insert-time ORDER BY to ClickHouse
    (reference src/ch_eth/sync.rs DDLs); here the engine owns it as a
    sampled range-partitioned sort (functions/sort.py): one sample
    pass, ONE row exchange, per-range numpy lexsort, ranks from a
    driver-side R-int prefix.  Never `Dataset.sort` (full-table
    all-to-all with no rank output)."""
    from ..functions.sort import range_partitioned_sort

    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = range_partitioned_sort(
        ds, "value", descending=True, tiebreak_col="event_id"
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "value", "sort_rank"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_SORT_EVENTS = """
SELECT event_id, value,
       row_number() OVER (ORDER BY value DESC, event_id) AS sort_rank
FROM events
"""


def q_equidepth_bins_value(sf_dir: str) -> pa.Table:
    """Exact equi-depth binning: ntile(16) over the global (value,
    event_id) order — the quantile-bucket primitive behind balanced
    range layouts and histogram-equalized features.  Rides the same
    range sort; the bin is pure arithmetic on the exact global rank."""
    from ..functions.sort import global_ntile

    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = global_ntile(ds, "value", 16, tiebreak_col="event_id")
    return out.map_batches(
        lambda t: t.select(["event_id", "bin"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_EQUIDEPTH = """
SELECT event_id,
       ntile(16) OVER (ORDER BY value, event_id) AS bin
FROM events
"""


def q_dsir_sample_documents(sf_dir: str) -> pa.Table:
    """DSIR data selection (Xie et al. 2023): pick the 500 docs whose
    hashed-unigram distribution best matches the English subcorpus
    (target = lang='en'), by importance log-ratio on 4096 hashed
    features + Gumbel top-k (see functions/importance.py — two
    streaming passes + a batches×k partial top-k; driver holds one
    4096-float vector).  Hash-feature scoring is not SQL-expressible →
    rows-only gate; exactness vs a single-process reference and
    split-invariance are pinned in tests/test_importance.py."""
    from ..functions.importance import dsir_select

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    flagged = ds.map_batches(
        lambda t: t.append_column(
            "is_target", pc.equal(t.column("lang"), "en")
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return dsir_select(flagged, target_col="is_target", k=500,
                       buckets=4096)


def q_zorder_scan_events(sf_dir: str) -> pa.Table:
    """Multi-column zone-map scan over a Z-order-clustered copy of the
    events table (functions/zorder.py): stage events once as Morton-
    range files on (value, user_id), then answer a rectangle predicate
    by pruning Parquet footer stats of BOTH columns before any task
    runs, + an exact vectorized row filter.  The key-sorted lake files
    can only zone-map ONE column; this is the layout for the other
    access path.  Pruning effectiveness (vs a single-sorted layout) is
    asserted in tests/test_zorder.py; this gate entry pins the exact
    rectangle result against SQL."""
    from ..functions.zorder import zorder_scan, zorder_write

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/w3r_zorder/{tag}"
    marker = os.path.join(out_dir, "z-00000.parquet")
    if not os.path.exists(marker):
        zorder_write(
            _read(sf_dir, "events", ["event_id", "user_id", "value"]),
            out_dir,
            ("value", "user_id"),
        )
    ds, _read_n, _tot = zorder_scan(
        out_dir,
        [
            ("value", ">=", 25.0),
            ("value", "<=", 75.0),
            ("user_id", ">=", 3),
            ("user_id", "<=", 40),
        ],
        columns=["event_id", "user_id", "value"],
    )
    return ds


ORACLE_ZORDER_SCAN = """
SELECT event_id, user_id, value FROM events
WHERE value >= 25.0 AND value <= 75.0
  AND user_id >= 3 AND user_id <= 40
"""


def q_spelling_variants_part(sf_dir: str) -> pa.Table:
    """Fuzzy token matching: all vocabulary pairs of the part-name
    corpus at edit distance exactly 1 — SymSpell symmetric-delete
    blocking (complete for d=1: equal / deletion / shared-deletion
    covers sub+ins+del) + the batched prefix-min Levenshtein verify
    (functions/fuzzy.py).  3-shuffle shape: type fold → deletion-key
    hash-bucket exchange (groups = B buckets, never O(keys)) →
    pair-hash dedup + verify.  Oracle: DuckDB levenshtein() self-join
    over the same length/df-bounded vocabulary."""
    from ..functions.fuzzy import spelling_variant_pairs

    ds = _read(sf_dir, "part", ["p_name"])
    return spelling_variant_pairs(
        ds, text_col="p_name", min_len=3, max_len=14, df_min=1
    )


ORACLE_SPELLING = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(p_name), '\w+')) AS token
  FROM part
), v AS (
  SELECT token FROM tok GROUP BY token
  HAVING count(*) >= 1 AND length(token) BETWEEN 3 AND 14
)
SELECT a.token AS tok_a, b.token AS tok_b
FROM v a JOIN v b
  ON a.token < b.token AND levenshtein(a.token, b.token) = 1
"""


def q_bpe_vocab_documents(sf_dir: str) -> pa.Table:
    """Tokenizer training inside the engine: learn 40 BPE merges from
    the corpus (functions/bpe.py — one corpus pass folds the word-TYPE
    table, then every merge round is O(types) map-only pair counting +
    vectorized merge apply; the driver holds one (pair, count) row per
    round).  Iterative argmax over corpus-global counts is not
    SQL-expressible → rows-only gate; exact merge-sequence equality vs
    the textbook algorithm is pinned in tests/test_bpe.py."""
    from ..functions.bpe import bpe_learn

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_learn(ds, 40)


def q_bpe_encode_documents(sf_dir: str):
    """Tokenizer APPLY: learn 40 BPE merges (same trainer as
    `bpe_vocab_documents`), then encode every document with the merge
    table and emit its real post-BPE sequence length — the statistic
    packing/mixing decisions need.  The merge table is tiny (one pair
    per rank) and binds once per actor via `BpeEncoder.__init__`
    (stateful actor-pool stage); each batch encodes its DISTINCT word
    types with the trainer's own vectorized merge kernel and gathers
    counts back per document.  Iterative BPE is not SQL-expressible →
    rows-only gate; encode-vs-reference equality is pinned in
    tests/test_bpe.py."""
    from ..functions.bpe import BpeEncoder, bpe_learn

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_tbl = bpe_learn(ds, 40)
    merges = list(
        zip(
            merges_tbl.column("left").to_pylist(),
            merges_tbl.column("right").to_pylist(),
        )
    )
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_event_transitions(sf_dir: str):
    """Markov next-event transition matrix (the user-journey /
    clickstream-path primitive): per user order events by (ts,
    event_id) and count every (prev_type → event_type) transition
    corpus-wide.  One keyed bucket exchange co-locates each user's
    rows (`keyed_window`), then per bucket ONE lexsort + a shifted
    compare produces the pairs and a batch-local value_counts folds
    them — the cross-bucket fold is over ≤|types|² tiny rows, so the
    driver never touches event-sized data.  Integer outputs → exact
    SQL parity (the oracle is the lag() window twin, same tiebreak)."""
    from ..functions.window import keyed_window

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type")
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = pc.take(et, pa.array(order, pa.int64())).combine_chunks()
        same_user = uid[1:] == uid[:-1]
        if not len(same_user) or not same_user.any():
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = len(uid)
        mask = pa.array(same_user)
        prev = et.slice(0, m - 1).filter(mask)
        cur = et.slice(1, m - 1).filter(mask)
        return (
            pa.table({"prev_type": prev, "event_type": cur})
            .group_by(["prev_type", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_type", "event_type", "n"])
        )

    return (
        keyed_window(ds, "user_id", fn)
        .groupby(["prev_type", "event_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["prev_type", "event_type", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def q_token_diversity_documents(sf_dir: str):
    """Per-document lexical diversity via the Simpson/repeat-rate
    index (the text-degeneracy signal complementary to
    `repetition_stats_documents`' shingle ratio): for each doc emit
    n_tokens, n_distinct and sum_c2 = Σ c_i² over its unigram counts —
    repeat rate = sum_c2/n², type-token ratio = n_distinct/n, both
    derivable from the exact INTEGER outputs, so oracle parity never
    touches float summation order.  Zero shuffle: docs never span
    batches, so the whole statistic is one batch-local pass — tokenize
    (Arrow RE2), one lexsort over (doc, token-hash), run-length counts,
    three bincounts.  64-bit token hashes stand in for strings
    (collision odds ~0, the `dup_ngrams` convention)."""
    from ..functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        if not len(h):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "sum_c2": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((h, parents))
        hs, ps = h[order], parents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])))
        )
        c = np.diff(np.append(starts, len(hs))).astype(np.int64)
        run_parent = ps[starts]
        n_rows = t.num_rows
        n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
        n_dis = np.bincount(run_parent, minlength=n_rows).astype(np.int64)
        s_c2 = np.bincount(run_parent, weights=(c * c).astype(np.float64),
                           minlength=n_rows).astype(np.int64)
        keep = n_tok > 0  # zero-token docs absent, like the SQL side
        return pa.table(
            {
                "doc_id": pa.array(docs[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "n_distinct": pa.array(n_dis[keep], pa.int64()),
                "sum_c2": pa.array(s_c2[keep], pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_TOKEN_DIVERSITY = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
       sum(c * c)::BIGINT AS sum_c2
FROM c GROUP BY doc_id
"""


def q_pack_bpe_documents(sf_dir: str):
    """Sequence packing with REAL tokenizer lengths — the production
    form of `seq_pack_documents`: whitespace token counts misestimate
    post-BPE sequence lengths, so packing bins drift from the actual
    context budget.  Pipeline: learn the merge table (`bpe_learn`),
    encode every doc's true post-BPE length (`BpeEncoder` actor pool),
    then assign bin floor(bpe_tokens_before / budget) via the same
    distributed range-partitioned two-pass prefix scan
    (`ordered_prefix_sum`) — no driver loop, no global sort.  BPE is
    not SQL-expressible → rows-only gate; bin equivalence vs a
    reference single-process encode+pack is pinned in tests."""
    from ..functions.bpe import BpeEncoder, bpe_learn
    from ..functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_tbl = bpe_learn(ds, 40)
    merges = list(
        zip(
            merges_tbl.column("left").to_pylist(),
            merges_tbl.column("right").to_pylist(),
        )
    )
    counted = ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = ordered_prefix_sum(counted, "doc_id", "n_bpe_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_bpe_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": t.column("n_bpe_tokens"),
                "bin_id": pa.array((run - n) // _PACK_BUDGET, pa.int64()),
            }
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


def q_quality_classifier_documents(sf_dir: str) -> pa.Table:
    """Model-based quality filter trained INSIDE the engine (the
    fastText-classifier stage of GPT-3/PaLM-style pipelines): hashed
    256-dim token features (`hash_embed`, no vocab/model file),
    full-batch logistic regression by synchronous exact gradient
    aggregation (functions/classifier.py — driver holds 257 floats,
    per-iteration exchange is O(partials × d), independent of corpus
    size), then one streaming scoring pass.  Label here: lang='en'
    (a stand-in for any editorial quality label).  Model training →
    rows-only gate; reference-exactness, determinism and AUC are
    pinned in tests/test_classifier.py."""
    from ..functions.classifier import logreg_score, logreg_train
    from ..functions.similarity import hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def featurize(t: pa.Table) -> pa.Table:
        t = hash_embed(t, dim=256)
        return t.drop_columns(["text"]).append_column(
            "label", pc.equal(t.column("lang"), "en")
        )

    feats = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # train loop re-reads features, not raw text
    w = logreg_train(feats, label_col="label", iters=30, lr=2.0)
    out = logreg_score(feats, w, keep_cols=("label",))
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "is_en": t.column("label"),
                "score": t.column("score"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_lm_bigram_documents(sf_dir: str):
    """Corpus bigram language-model quality score (the CCNet/KenLM
    filtering signal, Wenzek et al. 2020): train a Laplace-smoothed
    bigram LM on the corpus itself, then score every document by its
    per-bigram log-probabilities ln((c2+1)/(c1+V)) — c2 = corpus count
    of the bigram, c1 = corpus count of the prefix token, V = corpus
    vocabulary size.  Low-probability documents are boilerplate-free
    gibberish; high-probability ones are fluent (or duplicated) text.

    Per doc we emit ORDER-FREE float aggregates so oracle parity is
    bit-exact without caring about float summation order: min_lp (the
    most surprising bigram) and p50_lp (quantile_disc median, an exact
    element pick like `quantiles_value_per_user`).  Each lp itself is
    bit-equal to the SQL expression tree: integer counts -> one double
    divide -> one ln, matching `bm25_search`'s determinism argument.

    Fully distributed, 3 bounded-bucket shuffles, all over PRE-FOLDED
    rows: the batch pass explodes hashed bigram occurrences (64-bit
    token hashes stand in for strings, collision odds
    (#tokens)^2/2^64 ~= 0) and immediately folds batch-local
    (doc, bigram) duplicates into one row with multiplicity `m` — on
    repetitive corpora every later exchange moves a fraction of the
    token count.  Then: prefix-hash bucket attaches c1 by an
    m-weighted in-bucket reduceat (a bucket holds ALL occurrences of
    its prefix tokens, so the in-bucket sum IS the global count) ->
    bigram-hash bucket attaches c2 the same way and computes lp ->
    doc-hash bucket folds per-doc WEIGHTED order statistics (segment
    cumsum + searchsorted — never expanding multiplicities).  V is a
    distinct-count fold over a separate tiny per-batch-distinct token
    stream (vocab-bounded rows per batch), NOT a shuffle of the
    occurrence stream, and never a driver-side set.

    Perf ledger on the 1M-doc soak (32 CPUs): 262 s for v1 (3 shuffles
    of raw occurrences + sentinel vocab rows, materialized) -> 177 s
    for this shape (multiplicity fold + vocab side-stream).  A
    broadcast-c1 variant (partial-fold the vocab-sized unigram table,
    ray.put it, skip the w1 exchange) MEASURED SLOWER (340 s): its
    pre-pass re-tokenizes the corpus and sort-aggregates ~30M partial
    rows, costing more than the one bucketed exchange it saves — the
    exchange stays."""
    from ..functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B1 = 64   # prefix-token hash buckets
    B2 = 64   # bigram hash buckets
    DB = 32   # doc buckets
    TB = 32   # vocab distinct buckets

    def tok_rows(t: pa.Table) -> pa.Table:
        # batch-local distinct token hashes: O(min(batch tokens, vocab))
        h, _ = token_hash_stream(t.column("text"))
        toks = np.unique((h >> np.uint64(1)).astype(np.int64))
        return pa.table(
            {
                "tok": pa.array(toks, pa.int64()),
                "__tb": pa.array(toks % TB, pa.int64()),
            }
        )

    def vocab_partial(g: pa.Table) -> pa.Table:
        toks = g.column("tok").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(np.unique(toks))], pa.int64())})

    V = int(
        ds.map_batches(tok_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__tb")
        .map_groups(vocab_partial, batch_format="pyarrow")
        .sum("n")
    )

    def occ_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        K = np.uint64(1099511628211)
        if len(h) >= 2:
            valid = parents[:-1] == parents[1:]
            h1 = h[:-1][valid]
            h2 = h[1:][valid]
            w1 = (h1 >> np.uint64(1)).astype(np.int64)
            bg = ((h1 * K + h2) >> np.uint64(1)).astype(np.int64)
            doc = docs[parents[:-1][valid]]
        else:
            w1 = bg = doc = np.zeros(0, np.int64)
        # batch-local (doc, bigram) multiplicity fold (docs never span
        # batches, so m is complete): one lexsort + run-length count
        if len(bg):
            order = np.lexsort((bg, doc))
            doc, w1, bg = doc[order], w1[order], bg[order]
            starts = np.flatnonzero(
                np.concatenate(
                    ([True], (doc[1:] != doc[:-1]) | (bg[1:] != bg[:-1]))
                )
            )
            m = np.diff(np.append(starts, len(bg)))
            doc, w1, bg = doc[starts], w1[starts], bg[starts]
        else:
            m = np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "w1": pa.array(w1, pa.int64()),
                "bg": pa.array(bg, pa.int64()),
                "m": pa.array(m.astype(np.int64), pa.int64()),
                "__b": pa.array(w1 % B1, pa.int64()),
            }
        )

    def _weighted_counts(keys: np.ndarray, m: np.ndarray) -> np.ndarray:
        """sum of m per distinct key, broadcast back to each row."""
        order = np.argsort(keys, kind="stable")
        ks, ms = keys[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        sums = np.add.reduceat(ms, starts)
        out = np.empty(len(keys), np.int64)
        out[order] = np.repeat(sums, np.diff(np.append(starts, len(ks))))
        return out

    def attach_c1(g: pa.Table) -> pa.Table:
        w1 = g.column("w1").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        c1 = (
            _weighted_counts(w1, m) if len(w1) else np.zeros(0, np.int64)
        )
        bg = g.column("bg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "bg": g.column("bg"),
                "m": g.column("m"),
                "c1": pa.array(c1, pa.int64()),
                "__b2": pa.array(bg % B2, pa.int64()),
            }
        )

    def attach_c2(g: pa.Table) -> pa.Table:
        bg = g.column("bg").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        c1 = g.column("c1").to_numpy(zero_copy_only=False)
        c2 = (
            _weighted_counts(bg, m).astype(np.float64)
            if len(bg)
            else np.zeros(0, np.float64)
        )
        # expression tree mirrors the oracle: (c2 + 1.0) / (c1 + V)
        # with the denominator an exact integer sum, then one ln
        lp = np.log((c2 + 1.0) / (c1 + np.int64(V)).astype(np.float64))
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "lp": pa.array(lp, pa.float64()),
                "m": g.column("m"),
                "__db": pa.array(doc % DB, pa.int64()),
            }
        )

    def doc_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "min_lp": pa.array([], pa.float64()),
                    "p50_lp": pa.array([], pa.float64()),
                }
            )
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        lp = g.column("lp").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        order = np.lexsort((lp, doc))
        doc, lp, m = doc[order], lp[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], doc[1:] != doc[:-1]))
        ) if len(doc) else np.zeros(0, np.int64)
        cs = np.cumsum(m)  # strictly increasing (m >= 1)
        ends = np.append(starts[1:], len(doc)) - 1
        total = cs[ends] - np.where(starts > 0, cs[starts - 1], 0)
        base = np.where(starts > 0, cs[starts - 1], 0)
        # weighted quantile_disc(0.5): first row whose expanded-run
        # cumulative count reaches ceil(n/2) — searchsorted on the
        # global cumsum with absolute per-segment targets
        target = base + (total + 1) // 2
        p50 = lp[np.searchsorted(cs, target, side="left")]
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "n_bigrams": pa.array(total.astype(np.int64), pa.int64()),
                "min_lp": pa.array(lp[starts], pa.float64()),
                "p50_lp": pa.array(p50, pa.float64()),
            }
        )

    return (
        ds.map_batches(occ_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(attach_c1, batch_format="pyarrow")
        .groupby("__b2")
        .map_groups(attach_c2, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


ORACLE_LM_BIGRAM = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
), occ AS (
  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
        FROM toks WHERE len(w) >= 2)
), c1 AS (
  SELECT w1, count(*) AS c1 FROM occ GROUP BY w1
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM occ GROUP BY w1, w2
), v AS (
  SELECT count(DISTINCT tok) AS vocab
  FROM (SELECT unnest(w) AS tok FROM toks)
), scored AS (
  SELECT o.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.vocab)) AS lp
  FROM occ o
  JOIN c1 USING (w1)
  JOIN c2 ON o.w1 = c2.w1 AND o.w2 = c2.w2
  CROSS JOIN v
)
SELECT doc_id, count(*) AS n_bigrams, min(lp) AS min_lp,
       quantile_disc(lp, 0.5) AS p50_lp
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# wave 5: oracle-exact graph composites + rule-based curation filters
# ---------------------------------------------------------------------------


def q_jaccard_clusters(sf_dir: str) -> pa.Table:
    """Connected components over the EXACT Jaccard >= 0.5 pair graph:
    (doc_id, cluster_id = component-min doc_id) for every doc in at
    least one pair.  Same hash-to-min label-propagation operator as
    `dedup_clusters`, but the edge set is the deterministic
    `ngram_jaccard_pairs` graph, so the WHOLE composite — 2-shuffle
    pair generation feeding O(log diameter) keyed label exchanges —
    has an exact SQL oracle: a recursive min-label CTE over the
    identical pair query.  The oracle-checked twin of the
    probabilistic MinHash clustering path (rows-only `dedup_clusters`)."""
    from ..functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = connected_components_ds(pairs).take_all()
    if not rows:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    return pa.Table.from_pylist(rows).sort_by("doc_id")


ORACLE_JACCARD_CLUSTERS = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
-- min-label reachability: walk(v, m) holds iff a path m -> v exists on
-- which every node after m is > m; the component minimum reaches every
-- member through such a path, so min(comp) per node is the component min
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, k.comp FROM walk k JOIN edges e ON e.u = k.id
  WHERE k.comp < e.v
)
SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id
"""


def q_triangle_count(sf_dir: str) -> pa.Table:
    """Distributed triangle count over the exact Jaccard pair graph —
    the clustering-coefficient primitive for dedup-graph diagnostics
    (a near-dup graph whose pairs close into triangles is template
    boilerplate; a star-shaped one is a hub document).

    Node-iterator shape, every stage a keyed exchange: (1) wedges are
    enumerated at their minimum endpoint (groupby id_a; vectorized
    within-segment combination indexing, no per-row loop), (2) wedge
    instances union the edge set and co-locate on a packed (lo,hi)
    key, (3) each bucket counts wedges whose closing edge is present
    (np.isin on packed int64 keys).  Degenerate hubs are already
    df-capped upstream by `_NGRAM_DF_CAP`, which bounds per-node
    degree and hence the d^2 wedge blowup."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed twice (wedge stage + edge side)

    _EMPTY_WE = pa.table(
        {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
         "kind": pa.array([], pa.int64())}
    )

    def wedges(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = g.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return _EMPTY_WE
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(segment_starts(a))
        ends = np.append(starts[1:], len(a))
        # element k (global idx) is LEFT of every later element in its
        # segment: lcounts[k] = seg_end(k) - 1 - k
        seg_end = np.repeat(ends, np.diff(np.append(starts, len(a))))
        lcounts = seg_end - 1 - np.arange(len(a))
        total = int(lcounts.sum())
        if total == 0:
            return _EMPTY_WE
        lefts = np.repeat(np.arange(len(a)), lcounts)
        offs = np.concatenate(([0], np.cumsum(lcounts)[:-1]))
        rights = (
            np.arange(total)
            - np.repeat(offs, lcounts)
            + np.repeat(np.arange(len(a)) + 1, lcounts)
        )
        return pa.table(
            {
                "x": pa.array(b[lefts], pa.int64()),
                "y": pa.array(b[rights], pa.int64()),
                "kind": pa.array(np.ones(total, np.int64), pa.int64()),
            }
        )

    wedge_ds = keyed_window(pairs, "id_a", wedges)
    edge_ds = pairs.map_batches(
        lambda t: pa.table(
            {
                "x": t.column("id_a"),
                "y": t.column("id_b"),
                "kind": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pack(t: pa.Table) -> pa.Table:
        # doc_ids fit in 32 bits at any test scale; packing keeps the
        # exchange key a single int64 (guarded, not assumed)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        if len(x) and (x.max() >= 2**31 or y.max() >= 2**31):
            raise ValueError("triangle_count: doc_id exceeds 31 bits")
        return t.append_column(
            "__k", pa.array((x << 32) | y, pa.int64())
        )

    both = wedge_ds.union(edge_ds).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_closed(g: pa.Table) -> pa.Table:
        k = g.column("__k").to_numpy(zero_copy_only=False)
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        edge_keys = k[kind == 0]
        wedge_keys = k[kind == 1]
        n = int(np.isin(wedge_keys, edge_keys).sum())
        return pa.table({"cnt": pa.array([n], pa.int64())})

    per_bucket = keyed_window(both, "__k", count_closed)
    total = per_bucket.sum("cnt")
    return pa.table(
        {"n_triangles": pa.array([int(total or 0)], pa.int64())}
    )


ORACLE_TRIANGLES = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
)
SELECT count(*) AS n_triangles FROM pairs p1
JOIN pairs p2 ON p2.id_a = p1.id_a AND p2.id_b > p1.id_b
JOIN pairs p3 ON p3.id_a = p1.id_b AND p3.id_b = p2.id_b
"""


def q_gopher_quality_documents(sf_dir: str) -> pa.Table:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    published rule set, adapted to the fixture corpus): per doc, word
    count, word-char count, stopword hits, words containing an
    alphabetic char, and the keep verdict.  Every ratio rule is
    cross-multiplied to INTEGER comparisons (3*n_words <= n_word_chars
    <= 10*n_words for mean word length in [3,10]; 5*n_alpha >=
    4*n_words for the 0.8 alpha-word fraction), so parity with the SQL
    oracle is exact — no float thresholds.  One embarrassingly
    parallel map_batches over RE2 count kernels; n_word_chars equals
    the oracle's sum-of-token-lengths because \\w+ matches are maximal
    runs."""
    _STOP_RE = r"\b(the|be|to|of|and|that|have|with)\b"

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        n_words = pc.count_substring_regex(low, r"\w+").cast(pa.int64())
        n_wchars = pc.count_substring_regex(low, r"\w").cast(pa.int64())
        n_stop = pc.count_substring_regex(low, _STOP_RE).cast(pa.int64())
        n_alpha = pc.count_substring_regex(
            low, r"\w*[a-z]\w*"
        ).cast(pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(n_words, pa.scalar(50)),
                    pc.less_equal(n_words, pa.scalar(100000)),
                ),
                pc.and_(
                    pc.less_equal(pc.multiply(n_words, pa.scalar(3)), n_wchars),
                    pc.less_equal(n_wchars, pc.multiply(n_words, pa.scalar(10))),
                ),
            ),
            pc.and_(
                pc.greater_equal(n_stop, pa.scalar(2)),
                pc.greater_equal(
                    pc.multiply(n_alpha, pa.scalar(5)),
                    pc.multiply(n_words, pa.scalar(4)),
                ),
            ),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": n_words,
                "n_word_chars": n_wchars,
                "n_stop": n_stop,
                "n_alpha_words": n_alpha,
                "keep": keep,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_GOPHER = r"""
WITH c AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
              AS BIGINT) AS n_word_chars,
         CAST(len(list_filter(ws,
              x -> x IN ('the','be','to','of','and','that','have','with')))
              AS BIGINT) AS n_stop,
         CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha_words
  FROM c
)
SELECT doc_id, n_words, n_word_chars, n_stop, n_alpha_words,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= n_word_chars
        AND n_word_chars <= 10 * n_words
        AND n_stop >= 2
        AND 5 * n_alpha_words >= 4 * n_words) AS keep
FROM m
"""


def q_winsorize_value_events(sf_dir: str) -> pa.Table:
    """Per-type winsorization at the exact 1/8 and 7/8 discrete
    quantiles (exact binary fractions, so ceil(q*n) is float-exact —
    same convention as `quantiles_value_per_user`).  Two passes: a
    tiny per-type quantile fold (|event_type| rows — at 100 TB this
    stage's per-type sort would move to the sampled-sketch quantile
    path of `approx_quantiles_value`; the clip pass is unchanged),
    broadcast as a closure-captured dict, then one embarrassingly
    parallel clip over dictionary-encoded type codes — no second
    shuffle, no join."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def qfn(g: pa.Table) -> pa.Table:
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, codes))
        codes_s, cents_s = codes[order], cents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        ) if len(codes_s) else np.zeros(0, np.int64)
        counts = np.diff(np.append(starts, len(codes_s)))
        lo_i = np.ceil(0.125 * counts).astype(np.int64) - 1
        hi_i = np.ceil(0.875 * counts).astype(np.int64) - 1
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(codes_s[starts], pa.int64())
                ),
                "lo": pa.array(cents_s[starts + lo_i], pa.int64()),
                "hi": pa.array(cents_s[starts + hi_i], pa.int64()),
            }
        )

    bounds = {}
    for row in ds.groupby("event_type").map_groups(
        qfn, batch_format="pyarrow"
    ).take_all():
        bounds[row["event_type"]] = (row["lo"], row["hi"])

    def clip(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        vals = enc.dictionary.to_pylist()
        lo_arr = np.array([bounds[v][0] for v in vals], np.int64)
        hi_arr = np.array([bounds[v][1] for v in vals], np.int64)
        idx = np.asarray(enc.indices).astype(np.int64)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        w = np.clip(cents, lo_arr[idx], hi_arr[idx])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cents": pa.array(cents, pa.int64()),
                "cents_w": pa.array(w, pa.int64()),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_WINSORIZE = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
q AS (
  SELECT event_type,
         quantile_disc(cents, 0.125) AS lo,
         quantile_disc(cents, 0.875) AS hi
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type AS event_type, cents,
       least(greatest(cents, lo), hi) AS cents_w
FROM c JOIN q ON c.event_type = q.event_type
"""


def q_pareto_events(sf_dir: str) -> pa.Table:
    """Per-user skyline (Pareto frontier) on (ts, value): keep an
    event iff no same-user event has BOTH strictly later ts and
    strictly greater value — the classic dominance query (Börzsönyi et
    al. 2001), used in curation to keep only the 'latest or best'
    rows per key.  One keyed exchange; inside each bucket a single
    lexsort (user asc, ts desc) + grouped running max over strict-ts
    predecessors, with ts-tie groups reduced via reduceat and the
    per-user cummax reset done by an int64 offset lift (loop-free;
    falls back to a per-user slice loop only if the lift could
    overflow)."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    _EMPTY = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "cents": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-ts, uid))
        uid, ts, cents, eid = uid[order], ts[order], cents[order], eid[order]
        new_uid = segment_starts(uid)
        new_grp = new_uid | np.concatenate(([True], ts[1:] != ts[:-1]))
        gstart = np.flatnonzero(new_grp)
        gmax = np.maximum.reduceat(cents, gstart)
        g_uid_start = new_uid[gstart]
        seg_id = np.cumsum(g_uid_start) - 1
        lo = int(gmax.min())
        rng = int(gmax.max()) - lo + 2
        if rng * int(seg_id[-1] + 1) < 2**62:
            lifted = (gmax - lo) + seg_id * rng
            cm = np.maximum.accumulate(lifted) - seg_id * rng + lo
        else:
            cm = gmax.copy()
            ustart = np.flatnonzero(g_uid_start)
            for s, e in zip(ustart, np.append(ustart[1:], len(gmax))):
                np.maximum.accumulate(gmax[s:e], out=cm[s:e])
        prev = np.empty(len(gmax), np.int64)
        prev[1:] = cm[:-1]
        prev[np.flatnonzero(g_uid_start)] = np.iinfo(np.int64).min
        grp_of_row = np.cumsum(new_grp) - 1
        dominated = prev[grp_of_row] > cents
        keep = ~dominated
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "user_id": pa.array(uid[keep], pa.int64()),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_PARETO = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents FROM c e
WHERE NOT EXISTS (
  SELECT 1 FROM c d
  WHERE d.user_id = e.user_id AND d.ts > e.ts AND d.cents > e.cents
)
"""


def q_full_outer_join_customer_orders(sf_dir: str) -> pa.Table:
    """FULL OUTER hash join, both sides null-extended: BUILDING-segment
    customers × high-value orders.  Restricting the left side makes
    the right-extension real (orders of non-BUILDING customers
    survive with a null segment), which `left_join_customer_orders`
    can't exercise on TPC-H's referentially-complete keys.  Same
    bucket exchange as the inner join; Acero coalesces the key
    column across sides inside each bucket (salt is rejected for full
    outer — unmatched right rows would duplicate)."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), pa.scalar("BUILDING"))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_join(
        building,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=["o_orderkey", "o_totalprice_cents"],
        how="full",
    )


ORACLE_FULL_JOIN = """
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey,
       c.c_mktsegment, o.o_orderkey, o.o_totalprice_cents
FROM (
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
) c
FULL JOIN (
    SELECT o_custkey AS c_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 45000000
) o ON o.c_custkey = c.c_custkey
"""


def q_mad_value_per_user(sf_dir: str) -> pa.Table:
    """Robust scale estimate per user: discrete median and Median
    Absolute Deviation, BOTH order statistics computed in ONE keyed
    exchange — the second pass (|x − med|, re-sort, second median)
    happens bucket-locally on arrays already in cache, so MAD costs no
    extra shuffle over the median.  Integer cents in, integer cents
    out → exact quantile_disc parity (ceil(q·n)−1 indexing, verified
    convention of `quantiles_value_per_user`)."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        med_idx = np.ceil(0.5 * counts).astype(np.int64) - 1
        med = cents_s[starts + med_idx]
        # second order statistic over |x - med(user)|, same bucket
        seg_of = np.repeat(np.arange(len(starts)), counts)
        dev = np.abs(cents_s - med[seg_of])
        order2 = np.lexsort((dev, uid_s))
        dev_s = dev[order2]
        mad = dev_s[starts + med_idx]
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "med_cents": pa.array(med, pa.int64()),
                "mad_cents": pa.array(mad, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MAD = """
WITH c AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
m AS (
  SELECT user_id, quantile_disc(cents, 0.5) AS med FROM c GROUP BY user_id
)
SELECT c.user_id AS user_id, med AS med_cents,
       quantile_disc(abs(cents - med), 0.5) AS mad_cents
FROM c JOIN m USING (user_id)
GROUP BY c.user_id, med
"""


def q_degree_histogram(sf_dir: str) -> pa.Table:
    """Degree distribution of the exact Jaccard pair graph — the
    one-line diagnostic that tells a dedup run whether its candidate
    graph is chains (degree 1–2, mirrors), cliques (templates), or a
    hub explosion (df cap misconfigured).  Two tiny keyed counts over
    the directed edge list; all integer → exact SQL parity."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    deg = (
        pairs.map_batches(
            both_dirs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("node")
        .aggregate(Count(alias_name="degree"))
    )
    hist = (
        deg.groupby("degree")
        .aggregate(Count(alias_name="n_nodes"))
        .take_all()
    )
    if not hist:
        return pa.table(
            {"degree": pa.array([], pa.int64()),
             "n_nodes": pa.array([], pa.int64())}
        )
    t = pa.Table.from_pylist(hist).sort_by("degree")
    return pa.table(
        {
            "degree": t.column("degree").cast(pa.int64()),
            "n_nodes": t.column("n_nodes").cast(pa.int64()),
        }
    )


def q_funnel3_click_view_purchase(sf_dir: str) -> pa.Table:
    """Three-step windowed funnel with EXISTS semantics: a click
    qualifies iff SOME view follows it within 1h that itself has SOME
    purchase within 1h — NOT greedy first-match, which misses chains
    where the first view has no purchase but a later one does.

    One keyed exchange; inside each bucket everything is loop-free:
    the three type streams are split once, each lifted by
    uid_index × (global ts range + 2h) so ONE global searchsorted per
    boundary answers every user's window query at once (windows can't
    cross users — the lift exceeds any in-user window), views carry a
    has-purchase flag counted by prefix sums, and clicks test
    flag-count > 0 over their view window.  Falls back to a per-user
    loop only if the lift could overflow int64."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    _HOUR_US = 3_600_000_000

    def fn(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_funnels": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        vals = enc.dictionary.to_pylist()
        code = np.asarray(enc.indices).astype(np.int64)

        def stream(name: str):
            try:
                c = vals.index(name)
            except ValueError:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
            m = code == c
            u, t = uid[m], ts[m]
            order = np.lexsort((t, u))
            return u[order], t[order]

        cu, ct = stream("click")
        vu, vt = stream("view")
        pu, pt = stream("purchase")
        if not (len(cu) and len(vu) and len(pu)):
            return empty

        # dense uid index shared by the three streams
        all_u = np.unique(np.concatenate([cu, vu, pu]))
        lo_ts = int(min(ct.min(), vt.min(), pt.min()))
        hi_ts = int(max(ct.max(), vt.max(), pt.max()))
        lift = (hi_ts - lo_ts) + 2 * _HOUR_US + 1
        if lift * len(all_u) >= 2**62:
            return _funnel3_per_user(cu, ct, vu, vt, pu, pt)

        def lifted(u, t):
            seg = np.searchsorted(all_u, u)
            return (t - lo_ts) + seg * lift

        cl, vl, pl = lifted(cu, ct), lifted(vu, vt), lifted(pu, pt)
        # view qualifies iff a purchase lands in (vl, vl + 1h]
        v_has_p = (
            np.searchsorted(pl, vl + _HOUR_US, side="right")
            - np.searchsorted(pl, vl, side="right")
        ) > 0
        flags = np.concatenate(([0], np.cumsum(v_has_p.astype(np.int64))))
        # click qualifies iff a qualifying view lands in (cl, cl + 1h]
        n_q = (
            flags[np.searchsorted(vl, cl + _HOUR_US, side="right")]
            - flags[np.searchsorted(vl, cl, side="right")]
        )
        keep = n_q > 0
        if not keep.any():
            return empty
        ku = cu[keep]
        starts = np.flatnonzero(segment_starts(ku))
        counts = np.diff(np.append(starts, len(ku)))
        return pa.table(
            {
                "user_id": pa.array(ku[starts], pa.int64()),
                "n_funnels": pa.array(counts, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


def _funnel3_per_user(cu, ct, vu, vt, pu, pt):
    """Overflow fallback: same semantics, per-user slices."""
    _HOUR_US = 3_600_000_000
    out_u, out_n = [], []
    for u in np.unique(cu):
        c = ct[cu == u]
        v = np.sort(vt[vu == u])
        p = np.sort(pt[pu == u])
        if not (len(c) and len(v) and len(p)):
            continue
        v_has = (np.searchsorted(p, v + _HOUR_US, side="right")
                 - np.searchsorted(p, v, side="right")) > 0
        f = np.concatenate(([0], np.cumsum(v_has.astype(np.int64))))
        nq = (f[np.searchsorted(v, c + _HOUR_US, side="right")]
              - f[np.searchsorted(v, c, side="right")])
        n = int((nq > 0).sum())
        if n:
            out_u.append(int(u))
            out_n.append(n)
    return pa.table(
        {"user_id": pa.array(out_u, pa.int64()),
         "n_funnels": pa.array(out_n, pa.int64())}
    )


def q_cohort_retention_matrix(sf_dir: str) -> pa.Table:
    """Full cohort × activity-hour retention matrix (the triangle
    chart behind `hourly_retention`'s single diagonal): users grouped
    by their FIRST active hour, distinct-user counts for every later
    hour they return.  One user-keyed exchange emits exact partial
    counts — inside a bucket each user's distinct (hour) set and
    cohort are both complete, so a kept (user, hour) row IS one
    distinct user of its (cohort, hour) cell — then a second tiny
    exchange on the packed cell key folds partials.  Cell count is
    bounded by hours², independent of corpus size."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    _HOUR_US = 3_600_000_000
    _EMPTY = pa.table(
        {"__k": pa.array([], pa.int64()),
         "n_users": pa.array([], pa.int64())}
    )

    def partial(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // _HOUR_US
        order = np.lexsort((hr, uid))
        u, h = uid[order], hr[order]
        new_u = segment_starts(u)
        sidx = np.flatnonzero(new_u)
        counts = np.diff(np.append(sidx, len(u)))
        cohort = h[sidx]  # min hour per user (h sorted within user)
        seg_of = np.repeat(np.arange(len(sidx)), counts)
        keep = new_u | np.concatenate(([True], h[1:] != h[:-1]))
        packed = (cohort[seg_of][keep] << np.int64(32)) | h[keep]
        key, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {"__k": pa.array(key, pa.int64()),
             "n_users": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    def fold(g: pa.Table) -> pa.Table:
        k = g.column("__k").to_numpy(zero_copy_only=False)
        n = g.column("n_users").to_numpy(zero_copy_only=False)
        key, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {"__k": pa.array(key, pa.int64()),
             "n_users": pa.array(tot, pa.int64())}
        )

    parts = keyed_window(ds, "user_id", partial)
    folded = keyed_window(parts, "__k", fold).take_all()
    if not folded:
        return pa.table(
            {"cohort_hour": pa.array([], pa.timestamp("us")),
             "hour": pa.array([], pa.timestamp("us")),
             "n_users": pa.array([], pa.int64())}
        )
    k = np.array([r["__k"] for r in folded], np.int64)
    n = np.array([r["n_users"] for r in folded], np.int64)
    order = np.argsort(k)
    k, n = k[order], n[order]
    return pa.table(
        {
            "cohort_hour": pa.array(
                (k >> np.int64(32)) * _HOUR_US, pa.int64()
            ).cast(pa.timestamp("us")),
            "hour": pa.array(
                (k & np.int64(0xFFFFFFFF)) * _HOUR_US, pa.int64()
            ).cast(pa.timestamp("us")),
            "n_users": pa.array(n, pa.int64()),
        }
    )


ORACLE_COHORT_MATRIX = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
),
c AS (SELECT user_id, min(hour) AS cohort_hour FROM uh GROUP BY user_id)
SELECT cohort_hour, hour, CAST(count(*) AS BIGINT) AS n_users
FROM uh JOIN c USING (user_id)
GROUP BY cohort_hour, hour
"""


ORACLE_FUNNEL3 = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
vq AS (
  SELECT v.user_id, v.ts FROM v WHERE EXISTS (
    SELECT 1 FROM p WHERE p.user_id = v.user_id
      AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
),
cq AS (
  SELECT c.user_id FROM c WHERE EXISTS (
    SELECT 1 FROM vq WHERE vq.user_id = c.user_id
      AND vq.ts > c.ts AND vq.ts <= c.ts + INTERVAL 1 HOUR)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_funnels
FROM cq GROUP BY user_id
"""


def q_knn_ivf_incremental(sf_dir: str) -> pa.Table:
    """Incremental ANN at ingest: the embeddings table arrives in two
    doc-id-ordered ticks into a persistent `IvfIndex` (frozen coarse
    quantizer, one file per cell per tick), then the standard fixture
    queries probe only their cells' directories.  Exactness-within-
    probe, incremental==one-shot, dir-pruning and frozen-quantizer
    contracts are pinned in tests/test_ann_index.py; rows-only at the
    driver gate (ANN results are probe-dependent)."""
    import shutil
    import tempfile

    from .ann_index import IvfIndex

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def half(lo: int, hi: int):
        return ds.map_batches(
            lambda t, _lo=lo, _hi=hi: t.filter(
                pc.and_(
                    pc.greater_equal(t.column("vec_id"), pa.scalar(_lo)),
                    pc.less(t.column("vec_id"), pa.scalar(_hi)),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    ids, mat = _load_queries(sf_dir)
    root = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        idx = IvfIndex(root, n_centroids=16)
        idx.add_tick(half(0, 500))
        idx.add_tick(half(500, 10**9))
        out = idx.query(ids, mat, k=10, n_probe=4)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_trimmed_sum_per_user(sf_dir: str) -> pa.Table:
    """Per-user trimmed sum: drop the bottom and top floor(n/8) events
    by (cents, event_id) rank, sum the middle — the robust aggregate
    that survives sensor spikes and fat-finger values.  One keyed
    exchange, one lexsort per bucket, then a padded prefix-sum gives
    every user's middle-slice sum with two gathers (no masks, no
    second pass).  Integer in, integer out → exact SQL parity against
    the window-function oracle."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        k = counts // 8
        cs = np.concatenate(([0], np.cumsum(cents_s)))
        ends = starts + counts
        s_mid = cs[ends - k] - cs[starts + k]
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "n_mid": pa.array(counts - 2 * k, pa.int64()),
                "sum_mid_cents": pa.array(s_mid, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_TRIMMED = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, cents,
         row_number() OVER (
             PARTITION BY user_id ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM c
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_mid,
       CAST(sum(cents) AS BIGINT) AS sum_mid_cents
FROM r WHERE rn > n // 8 AND rn <= n - n // 8
GROUP BY user_id
"""


def q_throttle_dedup_events(sf_dir: str) -> pa.Table:
    """CDC debounce: drop an event if the SAME (user, type, cents)
    tuple fired within the previous hour — the at-least-once-delivery
    / double-click suppressor that runs at ingest in a change-data
    pipeline.  Rows co-locate on a 64-bit composite key hash (one
    exchange); inside each bucket the TRUE key columns are re-compared
    (hash collisions only co-locate, never merge), a single lexsort
    orders each key's events by (ts, event_id), and the lag compare is
    one shifted subtraction."""
    from ..functions.hashing import key_hash64
    from ..functions.window import keyed_window

    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
    )

    def add_key(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        h = key_hash64(
            t.column("user_id"), t.column("event_type"), cents
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
                "cents": cents,
                "__key": pa.array(h, pa.int64()),
            }
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    _HOUR_US = 3_600_000_000

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "cents": pa.array([], pa.int64())}
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = np.asarray(et.dictionary_encode().indices).astype(np.int64)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, cents, code, uid))
        uid_s, code_s, cents_s, ts_s = (
            uid[order], code[order], cents[order], ts[order]
        )
        new_key = np.concatenate(
            ([True],
             (uid_s[1:] != uid_s[:-1]) | (code_s[1:] != code_s[:-1])
             | (cents_s[1:] != cents_s[:-1]))
        )
        gap_ok = np.concatenate(([True], ts_s[1:] - ts_s[:-1] > _HOUR_US))
        keep = new_key | gap_ok
        sel = order[keep]
        return pa.table(
            {
                "event_id": pa.array(eid[sel], pa.int64()),
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_type": et.take(pa.array(sel, pa.int64())),
                "cents": pa.array(cents[sel], pa.int64()),
            }
        )

    return keyed_window(keyed, "__key", fn)


ORACLE_THROTTLE = """
WITH c AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT *, lag(ts) OVER (
      PARTITION BY user_id, event_type, cents
      ORDER BY ts, event_id) AS prev_ts
  FROM c
)
SELECT event_id, user_id, event_type, cents FROM l
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 1 HOUR
"""


ORACLE_DEGREES = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u FROM pairs UNION ALL SELECT id_b FROM pairs
),
deg AS (SELECT u, count(*) AS degree FROM edges GROUP BY u)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


# ---------------------------------------------------------------------------
# wave 6: grouped regression, entropy, first-seen cumulative distinct,
#         co-occurrence, gap stats, 2-hop reachability
# ---------------------------------------------------------------------------


def q_regr_value_on_ts_per_user(sf_dir: str) -> pa.Table:
    """Grouped least-squares line value ~ time per user — the trend
    primitive behind drift monitors.  Shares q_corr_value_ts_per_user's
    integer-moment design: per-batch partials ship exact BIGINTs
    (n, Σx, Σy, Σx², Σxy) with x = whole minutes since the global min
    ts and y = cents, the keyed hash-bucket fold sums them, and the
    float64 tail (slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx),
    intercept = (Σy − slope·Σx)/n) is mirrored token-for-token in the
    oracle so even the floats are bit-identical."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    min_us = ds.aggregate(Min("ts"))["min(ts)"]
    min_us = pa.scalar(min_us).cast(pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) - min_us
        ) // 60_000_000
        y = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        keys, starts = np.unique(uid, return_index=True)
        n = np.diff(np.append(starts, len(uid)))
        cols = {
            "user_id": pa.array(keys, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        }
        for name, v in (("sx", x), ("sy", y), ("sxx", x * x), ("sxy", x * y)):
            cols[name] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        acc = {}
        for c in ("n_events", "sx", "sy", "sxx", "sxy"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            acc[c] = np.add.reduceat(v, starts)
        # float64 tail, op order mirrored in ORACLE_REGR exactly
        n = acc["n_events"].astype(np.float64)
        sx, sy = acc["sx"].astype(np.float64), acc["sy"].astype(np.float64)
        sxx = acc["sxx"].astype(np.float64)
        sxy = acc["sxy"].astype(np.float64)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / den
            intercept = (sy - slope * sx) / n
        cols["n_events"] = pa.array(acc["n_events"], pa.int64())
        # zero-time-variance groups are NULL (matches the oracle CASE)
        cols["slope_cents_per_min"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, slope)
        ).cast(pa.float64())
        cols["intercept_cents"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, intercept)
        ).cast(pa.float64())
        t = pa.table(cols)
        return t.filter(pc.greater_equal(t.column("n_events"), 2))

    return keyed_window(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        fold,
    ).sort("user_id")


ORACLE_REGR = """
WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
b AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT t0 FROM m)) // 60000000 AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY user_id
),
d AS (
  SELECT user_id, n_events, sx, sy, sxx, sxy,
         CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
         CASE WHEN CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
              THEN NULL
              ELSE (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         END AS slope
  FROM s
)
SELECT user_id, n_events, slope AS slope_cents_per_min,
       CASE WHEN den = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                 / CAST(n_events AS DOUBLE)
       END AS intercept_cents
FROM d WHERE n_events >= 2
ORDER BY user_id
"""


def q_entropy_types_per_user(sf_dir: str) -> pa.Table:
    """Shannon entropy (bits) of each user's event-type distribution —
    the behavioral-diversity feature.  Integer (user, type) counts fold
    exactly across the keyed exchange; the float tail
    H = log2(N) − (Σ cᵢ·log2 cᵢ)/N sums the per-type terms
    SEQUENTIALLY in event_type order (padded column-walk across users,
    not np pairwise reduction) so it is bit-identical to the oracle's
    ``list_sum(list(term ORDER BY event_type))`` — verified: numpy's
    pairwise ``add.reduce`` diverges from DuckDB in the last ulp even
    at 8 terms, sequential accumulation does not.  log2 itself goes
    through libm (``math.log2``, what DuckDB calls) over the DISTINCT
    integer counts only — ``np.log2``'s SIMD path is 1 ulp off libm on
    some inputs (e.g. 75, 52)."""
    import math

    from ..functions.window import keyed_window, segment_starts

    def log2_libm(ints: np.ndarray) -> np.ndarray:
        # O(distinct integer values) libm calls, vectorized map-back
        uniq, inv = np.unique(ints, return_inverse=True)
        vals = np.array([math.log2(float(x)) for x in uniq], np.float64)
        return vals[inv]

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "event_type": t.column("event_type"),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("user_id", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((typ, uid))
        uid, typ, n = uid[order], typ[order], n[order]
        # combine partial counts for the same (user, type)
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1])
        starts = np.flatnonzero(new)
        c = np.add.reduceat(n, starts)
        uid, typ = uid[starts], typ[starts]
        ustarts = np.flatnonzero(segment_starts(uid))
        useg = np.cumsum(segment_starts(uid)) - 1  # user ordinal per row
        pos = np.arange(len(uid)) - ustarts[useg]  # rank of type in user
        N = np.add.reduceat(c, ustarts)
        n_types = np.diff(np.append(ustarts, len(uid)))
        terms = c.astype(np.float64) * log2_libm(c)
        s = np.zeros(len(ustarts), dtype=np.float64)
        for k in range(int(pos.max()) + 1 if len(pos) else 0):
            rows = pos == k  # k-th type of every user, in type order
            s[useg[rows]] += terms[rows]
        nf = N.astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(uid[ustarts], pa.int64()),
                "n_events": pa.array(N, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "entropy_bits": pa.array(
                    log2_libm(N) - s / nf, pa.float64()
                ),
            }
        )

    return keyed_window(partials, "user_id", fold).sort("user_id")


ORACLE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id,
         CAST(sum(n) AS BIGINT) AS n_events,
         count(*) AS n_types,
         list_sum(list(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))
                       ORDER BY event_type)) AS sl
  FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       log2(CAST(n_events AS DOUBLE)) - sl / CAST(n_events AS DOUBLE)
         AS entropy_bits
FROM s ORDER BY user_id
"""


def q_cumulative_distinct_users(sf_dir: str) -> pa.Table:
    """Audience-growth curve: per event-hour the number of NEVER-
    before-seen users plus the running cumulative total.  Each user's
    first-seen timestamp folds as an integer min across the keyed
    exchange (per-batch partial mins, one row per (user, batch)); only
    per-hour new-user counts reach the driver, which carries the
    running total over O(hours) rows — the first-occurrence trick that
    turns a windowed COUNT(DISTINCT) into an ordinary sum."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        starts = np.flatnonzero(segment_starts(uid))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_us": pa.array(us[starts], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        us = g.column("first_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        starts = np.flatnonzero(segment_starts(uid))
        first = us[starts]
        hour = first // 3_600_000_000 * 3_600_000_000
        hours, cnt = np.unique(hour, return_counts=True)
        return pa.table(
            {
                "hour_us": pa.array(hours, pa.int64()),
                "n_new": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby("hour_us")
        .aggregate(Sum("n_new", alias_name="n_new"))
        .take_all()
    )  # O(distinct hours) — the only driver-side state
    t = _from_rows(rows, {"hour_us": pa.int64(), "n_new": pa.int64()})
    t = t.sort_by("hour_us")
    n_new = t.column("n_new").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "hour": t.column("hour_us").cast(pa.timestamp("us")),
            "n_new": t.column("n_new"),
            "cum_users": pa.array(np.cumsum(n_new), pa.int64()),
        }
    )


ORACLE_CUM_DISTINCT = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
h AS (
  SELECT date_trunc('hour', first_ts) AS hour, count(*) AS n_new
  FROM f GROUP BY 1
)
SELECT hour, n_new,
       CAST(sum(n_new) OVER (ORDER BY hour) AS BIGINT) AS cum_users
FROM h ORDER BY hour
"""


def q_type_cooccurrence(sf_dir: str) -> pa.Table:
    """Market-basket support: for every unordered pair of event types,
    how many users did both — the co-occurrence matrix behind lift /
    association rules.  Per-batch distinct (user, type) partials fold
    to global distinct in the user's bucket, per-user pairs are
    generated by looping over distinct SEGMENT LENGTHS (≤ #types, not
    #users: all users with k types pair up in one (m, k) matrix op),
    and only (type_a, type_b, count) rows — at most |types|² of them —
    leave each bucket."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "event_type": t.column("event_type"),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((typ, uid))
        uid, typ = uid[order], typ[order]
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1])
        uid, typ = uid[new], typ[new]  # global distinct (bucket owns user)
        starts = np.flatnonzero(segment_starts(uid))
        sizes = np.diff(np.append(starts, len(uid)))
        a_parts, b_parts = [], []
        for L in np.unique(sizes):
            if L < 2:
                continue
            seg = starts[sizes == L]
            mat = typ[seg[:, None] + np.arange(L)[None, :]]  # (m, L) sorted
            for i in range(int(L) - 1):
                for j in range(i + 1, int(L)):
                    a_parts.append(mat[:, i])
                    b_parts.append(mat[:, j])
        if not a_parts:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        pairs = pa.table(
            {
                "type_a": pa.array(np.concatenate(a_parts), pa.string()),
                "type_b": pa.array(np.concatenate(b_parts), pa.string()),
            }
        )
        out = pairs.group_by(["type_a", "type_b"]).aggregate(
            [("type_a", "count")]
        )
        return out.rename_columns(["type_a", "type_b", "n_users"])

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .take_all()
    )  # ≤ |types|² rows
    return _from_rows(
        rows,
        {"type_a": pa.string(), "type_b": pa.string(), "n_users": pa.int64()},
    ).sort_by([("type_a", "ascending"), ("type_b", "ascending")])


ORACLE_COOCCUR = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_activity_gaps_per_user(sf_dir: str) -> pa.Table:
    """Per-user inactivity profile: event count, largest gap between
    consecutive events (µs, exact integer), and how many gaps exceeded
    one hour — the churn-risk features.  One keyed exchange, one
    lexsort per bucket, vectorized diffs; single-event users get a
    NULL max gap, matching SQL max() over an empty lag set."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, uid))
        uid, us = uid[order], us[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        d = np.empty(len(us), dtype=np.int64)
        d[0] = -1
        d[1:] = us[1:] - us[:-1]
        d[starts] = -1  # first row of each user has no gap
        gmax = np.maximum.reduceat(d, start_idx)
        n_events = np.diff(np.append(start_idx, len(uid)))
        n_gaps = np.add.reduceat(
            (d > 3_600_000_000).astype(np.int64), start_idx
        )
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "max_gap_us": pc.if_else(
                    pa.array(gmax < 0),
                    pa.nulls(len(gmax), pa.int64()),
                    pa.array(gmax, pa.int64()),
                ),
                "n_gaps_1h": pa.array(n_gaps, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_GAPS = """
WITH l AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_events,
       max(gap) AS max_gap_us,
       CAST(count(*) FILTER (WHERE gap > 3600000000) AS BIGINT)
         AS n_gaps_1h
FROM l GROUP BY user_id ORDER BY user_id
"""


def q_khop2_reachability(sf_dir: str) -> pa.Table:
    """2-hop neighborhood size per node of the exact-Jaccard dedup
    graph — how big each doc's transitive-duplicate blast radius is
    before full closure.  Three bounded keyed exchanges: (1) middle-
    node buckets turn each neighbor list into i<j wedge pairs (looped
    over segment LENGTHS like q_type_cooccurrence, so a degree-d node
    costs d² rows but no Python per-node work), (2) pair buckets
    dedup wedges ∪ direct edges vectorized, (3) node buckets count
    distinct partners.  Degree is bounded by the dedup graph's df cap
    upstream, so d² stays small — same assumption q_triangle_count
    documents."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds)

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)

    def wedges(g: pa.Table) -> pa.Table:
        # bucket key = u (middle node): neighbors of each u pair up
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(segment_starts(u))
        sizes = np.diff(np.append(starts, len(u)))
        a_parts, b_parts = [], []
        for L in np.unique(sizes):
            if L < 2:
                continue
            seg = starts[sizes == L]
            mat = v[seg[:, None] + np.arange(L)[None, :]]  # sorted rows
            for i in range(int(L) - 1):
                for j in range(i + 1, int(L)):
                    a_parts.append(mat[:, i])
                    b_parts.append(mat[:, j])
        # wedge endpoints plus the direct edges themselves (a < b)
        keep = u < v
        a_parts.append(u[keep])
        b_parts.append(v[keep])
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), pa.int64()),
                "b": pa.array(np.concatenate(b_parts), pa.int64()),
            }
        )

    cand = keyed_window(edges, "u", wedges)

    def dedup_pairs(g: pa.Table) -> pa.Table:
        # bucket key = a: every copy of an (a, b) pair lands here
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[new], b[new]
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    reach = keyed_window(cand, "a", dedup_pairs)
    rows = (
        reach.groupby("node")
        .aggregate(Count(alias_name="n_within_2"))
        .take_all()
    )
    return _from_rows(
        rows, {"node": pa.int64(), "n_within_2": pa.int64()}
    ).sort_by("node")


ORACLE_KHOP2 = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
two AS (
  SELECT a.u AS u, b.v AS v FROM sym a JOIN sym b
  ON a.v = b.u WHERE b.v <> a.u
),
reach AS (SELECT u, v FROM sym UNION SELECT u, v FROM two)
SELECT u AS node, count(*) AS n_within_2 FROM reach
GROUP BY u ORDER BY node
"""


# ---------------------------------------------------------------------------
# wave 7: time-weighted average, inter-arrival quantiles, cluster-size
#         histogram, per-doc unigram KL divergence
# ---------------------------------------------------------------------------


def q_twap_value_per_user(sf_dir: str) -> pa.Table:
    """Time-weighted average value per user (trapezoidal): the metric
    that doesn't overweight burst periods.  One keyed exchange; per
    consecutive pair the term (cᵢ + cᵢ₊₁)·Δµs is an EXACT int64
    (cents × span < 2⁶³ holds through ~10⁶× the fixture range; a
    100 TB deployment with wider spans would split hi/lo words), so
    the numerator folds order-independently and only the final
    division is float — mirrored in the oracle, bit-identical."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, cents = uid[order], us[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        end_idx = np.append(start_idx[1:], len(uid)) - 1
        term = np.zeros(len(uid), dtype=np.int64)
        if len(uid) > 1:
            term[:-1] = (cents[:-1] + cents[1:]) * (us[1:] - us[:-1])
        term[end_idx] = 0  # no pair crosses a user boundary
        num = np.add.reduceat(term, start_idx)
        den = us[end_idx] - us[start_idx]
        n_events = np.diff(np.append(start_idx, len(uid)))
        with np.errstate(divide="ignore", invalid="ignore"):
            twap = num.astype(np.float64) / (2.0 * den.astype(np.float64))
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "twap_cents": pa.Array.from_pandas(
                    np.where(den == 0, np.nan, twap)
                ).cast(pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_TWAP = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT user_id, us, cents,
         lead(us) OVER w AS us2, lead(cents) OVER w AS c2
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum((cents + c2) * (us2 - us)) AS BIGINT) AS num,
         max(us) - min(us) AS den
  FROM l GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN den = 0 THEN NULL
            ELSE CAST(num AS DOUBLE) / (2 * CAST(den AS DOUBLE))
       END AS twap_cents
FROM s ORDER BY user_id
"""


def q_interarrival_quantiles_per_type(sf_dir: str) -> pa.Table:
    """Per event-type inter-arrival profile: exact p50/p90 (DuckDB
    ``quantile_disc`` semantics, index ⌈q·n⌉−1 of the sorted gaps)
    and max gap in µs.  Keyed exchange on event_type, two lexsorts per
    bucket (arrival order for diffs, gap order for the order
    statistics), all-integer output."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def with_type_h(t: pa.Table) -> pa.Table:
        return t.append_column(
            "type_h",
            pa.array(
                (key_hash64(t.column("event_type")) % np.uint64(1 << 62))
                .astype(np.int64),
                pa.int64(),
            ),
        )

    keyed = ds.map_batches(
        with_type_h, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, typ))
        typ, us = typ[order], us[order]
        starts = segment_starts(typ)
        gap = np.empty(len(us), dtype=np.int64)
        gap[0] = -1
        gap[1:] = us[1:] - us[:-1]
        gap[starts] = -1
        keep = gap >= 0
        tseg, gap = typ[keep], gap[keep]
        if not len(gap):
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "p50_gap_us": pa.array([], pa.int64()),
                    "p90_gap_us": pa.array([], pa.int64()),
                    "max_gap_us": pa.array([], pa.int64()),
                }
            )
        order2 = np.lexsort((gap, tseg))
        tseg, gap = tseg[order2], gap[order2]
        s2 = np.flatnonzero(segment_starts(tseg))
        n = np.diff(np.append(s2, len(gap)))
        i50 = s2 + np.ceil(0.5 * n).astype(np.int64) - 1
        i90 = s2 + np.ceil(0.9 * n).astype(np.int64) - 1
        return pa.table(
            {
                "event_type": pa.array(tseg[s2], pa.string()),
                "n_gaps": pa.array(n, pa.int64()),
                "p50_gap_us": pa.array(gap[i50], pa.int64()),
                "p90_gap_us": pa.array(gap[i90], pa.int64()),
                "max_gap_us": pa.array(
                    gap[np.append(s2[1:], len(gap)) - 1], pa.int64()
                ),
            }
        )

    return keyed_window(keyed, "type_h", fold).sort("event_type")


ORACLE_INTERARRIVAL = """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY event_type ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       quantile_disc(gap, 0.5) AS p50_gap_us,
       quantile_disc(gap, 0.9) AS p90_gap_us,
       max(gap) AS max_gap_us
FROM l WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_cluster_size_histogram(sf_dir: str) -> pa.Table:
    """Size distribution of the exact-Jaccard duplicate clusters — the
    one-table answer to 'is my near-dup corpus mirrors (many 2s) or
    template spam (few giants)?'.  Rides q_jaccard_clusters' machinery
    (2-shuffle pair generation + O(log diameter) label propagation)
    and folds to O(distinct sizes) rows."""
    from ray.data.aggregate import Count as _Count

    from ..functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    comp = connected_components_ds(pairs)
    rows = (
        comp.groupby("cluster_id")
        .aggregate(_Count(alias_name="cluster_size"))
        .groupby("cluster_size")
        .aggregate(_Count(alias_name="n_clusters"))
        .take_all()
    )
    return _from_rows(
        rows, {"cluster_size": pa.int64(), "n_clusters": pa.int64()}
    ).sort_by("cluster_size")


ORACLE_CLUSTER_SIZES = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, k.comp FROM walk k JOIN edges e ON e.u = k.id
  WHERE k.comp < e.v
),
cm AS (SELECT id, min(comp) AS cluster_id FROM walk GROUP BY id),
cs AS (SELECT cluster_id, count(*) AS cluster_size FROM cm GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters
FROM cs GROUP BY 1 ORDER BY 1
"""


def q_kl_unigram_documents(sf_dir: str) -> pa.Table:
    """Per-document unigram KL divergence vs the corpus distribution —
    the CCNet/DSIR-style domain-shift signal.  Shape: per-batch
    (doc, token, c) counts (docs arrive whole, so counts are final),
    one token-keyed exchange attaches the corpus count C per token,
    one doc-keyed exchange folds Σ (c/N)·(((log2 c + log2 T) − log2 N)
    − log2 C) with the terms summed SEQUENTIALLY in token order
    (contiguous pos-slice walk, O(rows) total) and every log2 routed
    through libm over DISTINCT integers — bit-identical to the
    oracle's ordered list_sum.  T (corpus token total) is one extra
    streaming count pass; a production lake would persist it as a
    corpus statistic."""
    import math

    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_term(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        doc = pc.list_parent_indices(toks)
        doc = pc.take(t.column("doc_id"), doc)
        keep = pc.greater(pc.utf8_length(flat), 0)
        return (
            pa.table({"doc_id": doc.cast(pa.int64()), "token": flat})
            .filter(keep)
            .group_by(["doc_id", "token"])
            .aggregate([("token", "count")])
            .rename_columns(["doc_id", "token", "c"])
        )

    dt = ds.map_batches(doc_term, batch_format="pyarrow", zero_copy_batch=True)

    # corpus token total T: one streaming scalar pass
    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        n = pc.sum(pc.greater(pc.utf8_length(flat), 0).cast(pa.int64()))
        return pa.table({"n": pa.array([n.as_py() or 0], pa.int64())})

    T = (
        ds.map_batches(count_tokens, batch_format="pyarrow",
                       zero_copy_batch=True)
        .aggregate(Sum("n"))["sum(n)"]
    )
    log2T = math.log2(float(T))

    def with_tok_h(t: pa.Table) -> pa.Table:
        return t.append_column(
            "tok_h",
            pa.array(
                (key_hash64(t.column("token")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    keyed = dt.map_batches(
        with_tok_h, batch_format="pyarrow", zero_copy_batch=True
    )

    def attach_C(g: pa.Table) -> pa.Table:
        # bucket owns its tokens: corpus count = in-bucket segment sum
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="stable")
        tok, doc, c = tok[order], doc[order], c[order]
        starts = segment_starts(tok)
        start_idx = np.flatnonzero(starts)
        seg = np.cumsum(starts) - 1
        C = np.add.reduceat(c, start_idx)[seg]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "token": pa.array(tok, pa.string()),
                "c": pa.array(c, pa.int64()),
                "C": pa.array(C, pa.int64()),
            }
        )

    with_C = keyed_window(keyed, "tok_h", attach_C)

    def log2_libm(ints: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(ints, return_inverse=True)
        vals = np.array([math.log2(float(x)) for x in uniq], np.float64)
        return vals[inv]

    def fold(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        c = g.column("c").to_numpy(zero_copy_only=False)
        C = g.column("C").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, doc))
        doc, tok, c, C = doc[order], tok[order], c[order], C[order]
        starts = segment_starts(doc)
        start_idx = np.flatnonzero(starts)
        dseg = np.cumsum(starts) - 1
        N = np.add.reduceat(c, start_idx)
        pos = np.arange(len(doc)) - start_idx[dseg]
        terms = (c.astype(np.float64) / N.astype(np.float64)[dseg]) * (
            ((log2_libm(c) + log2T) - log2_libm(N)[dseg]) - log2_libm(C)
        )
        # sequential in-token-order sum: walk pos classes over
        # CONTIGUOUS slices (O(rows) total, not O(rows × max_pos))
        s = np.zeros(len(start_idx), dtype=np.float64)
        order2 = np.lexsort((dseg, pos))
        pos2, dseg2, terms2 = pos[order2], dseg[order2], terms[order2]
        bounds = np.append(
            np.flatnonzero(np.diff(pos2)) + 1, [0, len(pos2)]
        )
        bounds = np.unique(bounds)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            s[dseg2[lo:hi]] += terms2[lo:hi]
        return pa.table(
            {
                "doc_id": pa.array(doc[start_idx], pa.int64()),
                "n_tokens": pa.array(N, pa.int64()),
                "kl_bits": pa.array(s, pa.float64()),
            }
        )

    return keyed_window(with_C, "doc_id", fold).sort("doc_id")


ORACLE_KL_UNIGRAM = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
dt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
dn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS N FROM dt GROUP BY 1),
ct AS (SELECT token, CAST(sum(c) AS BIGINT) AS C FROM dt GROUP BY 1),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM dt),
terms AS (
  SELECT dt.doc_id, dt.token, dn.N,
         (CAST(dt.c AS DOUBLE) / CAST(dn.N AS DOUBLE)) *
         (((log2(CAST(dt.c AS DOUBLE))
            + log2(CAST((SELECT T FROM tt) AS DOUBLE)))
           - log2(CAST(dn.N AS DOUBLE)))
          - log2(CAST(ct.C AS DOUBLE))) AS term
  FROM dt
  JOIN dn USING (doc_id)
  JOIN ct USING (token)
)
SELECT doc_id, any_value(N) AS n_tokens,
       list_sum(list(term ORDER BY token)) AS kl_bits
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# wave 8: Benford digits, weekday×hour heatmap, lag-1 autocorrelation,
#         same-type streaks
# ---------------------------------------------------------------------------


def q_benford_value_digits(sf_dir: str) -> pa.Table:
    """First-significant-digit distribution of positive cent amounts —
    the Benford's-law fraud screen.  Pure per-batch partials (≤ 9 rows
    each cross the exchange), digit taken from the decimal string so
    there is no float log10 boundary case; tiny 9-key fold."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value"))
        c = c.filter(pc.greater(c, 0))
        digit = pc.utf8_slice_codeunits(
            pc.cast(c, pa.string()), start=0, stop=1
        ).cast(pa.int64())
        return (
            pa.table({"digit": digit})
            .group_by("digit")
            .aggregate([("digit", "count")])
            .rename_columns(["digit", "n"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    return _from_rows(
        rows, {"digit": pa.int64(), "n": pa.int64()}
    ).sort_by("digit")


ORACLE_BENFORD = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
)
SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       count(*) AS n
FROM c WHERE cents > 0 GROUP BY 1 ORDER BY 1
"""


def q_weekday_hour_heatmap(sf_dir: str) -> pa.Table:
    """Activity heatmap cells (day-of-week × hour-of-day, exact
    counts) — the seasonality profile.  Integer µs arithmetic per
    batch (epoch days + 4 ≡ DuckDB's Sunday-0 dayofweek), ≤ 168 rows
    per partial, one tiny fold."""
    ds = _read(sf_dir, "events", ["ts"])

    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        days = us // DAY_US
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday; Sunday = 0
        hr = us % DAY_US // 3_600_000_000
        cell = dow * 24 + hr
        cnt = np.bincount(cell.astype(np.int64), minlength=168)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "dow": pa.array(keep // 24, pa.int64()),
                "hr": pa.array(keep % 24, pa.int64()),
                "n_events": pa.array(cnt[keep], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dow", "hr"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .take_all()
    )
    return _from_rows(
        rows, {"dow": pa.int64(), "hr": pa.int64(), "n_events": pa.int64()}
    ).sort_by([("dow", "ascending"), ("hr", "ascending")])


ORACLE_WEEKDAY_HOUR = """
SELECT dayofweek(ts) AS dow, hour(ts) AS hr, count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_autocorr_lag1_value_per_user(sf_dir: str) -> pa.Table:
    """Lag-1 autocorrelation of each user's cent series (ordered by
    ts, event_id) — 'does this user's next amount look like the
    last'.  The ordered-pair twin of q_corr_value_ts_per_user: pairs
    (cᵢ, cᵢ₊₁) never cross users, their five moments are exact
    BIGINTs folded through one keyed exchange, and the Pearson tail is
    mirrored token-for-token in the oracle."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, cents = uid[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        end_idx = np.append(start_idx[1:], len(uid)) - 1
        a = cents.copy()
        b = np.empty_like(cents)
        b[:-1] = cents[1:]
        b[-1] = 0
        # zero the user-boundary rows out of every pair moment
        pair = np.ones(len(uid), dtype=np.int64)
        pair[end_idx] = 0
        a, b = a * pair, b * pair
        npairs = np.add.reduceat(pair, start_idx)
        sa = np.add.reduceat(a, start_idx)
        sb = np.add.reduceat(b, start_idx)
        saa = np.add.reduceat(a * a, start_idx)
        sbb = np.add.reduceat(b * b, start_idx)
        sab = np.add.reduceat(a * b, start_idx)
        n = npairs.astype(np.float64)
        saf, sbf = sa.astype(np.float64), sb.astype(np.float64)
        saaf, sbbf = saa.astype(np.float64), sbb.astype(np.float64)
        sabf = sab.astype(np.float64)
        den = np.sqrt(n * saaf - saf * saf) * np.sqrt(n * sbbf - sbf * sbf)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (n * sabf - saf * sbf) / den
        t = pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "autocorr_lag1": pa.Array.from_pandas(
                    np.where(den == 0.0, np.nan, r)
                ).cast(pa.float64()),
            }
        )
        return t.filter(pc.greater_equal(t.column("n_pairs"), 2))

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_AUTOCORR = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT user_id, cents AS a,
         lead(cents) OVER (
             PARTITION BY user_id ORDER BY us, event_id) AS b
  FROM c
),
p AS (SELECT user_id, a, b FROM l WHERE b IS NOT NULL),
s AS (
  SELECT user_id, count(*) AS n_pairs,
         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
         CAST(sum(a * a) AS BIGINT) AS saa,
         CAST(sum(b * b) AS BIGINT) AS sbb,
         CAST(sum(a * b) AS BIGINT) AS sab
  FROM p GROUP BY user_id
)
SELECT user_id, n_pairs,
       CASE WHEN sqrt(CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                 * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) = 0
            THEN NULL
            ELSE (CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
       END AS autocorr_lag1
FROM s WHERE n_pairs >= 2
ORDER BY user_id
"""


def q_type_streaks_per_user(sf_dir: str) -> pa.Table:
    """Gaps-and-islands: per user the number of consecutive-same-type
    streaks and the longest streak (ordered by ts, event_id).  One
    keyed exchange; run-length encoding is two boolean diffs and two
    reduceats — the vectorized twin of SQL's double-row_number
    grouping trick."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, uid))
        uid, typ = uid[order], typ[order]
        user_start = segment_starts(uid)
        run_start = user_start.copy()
        run_start[1:] |= typ[1:] != typ[:-1]
        run_idx = np.flatnonzero(run_start)
        run_len = np.diff(np.append(run_idx, len(uid)))
        run_uid = uid[run_idx]
        ustart = np.flatnonzero(segment_starts(run_uid))
        return pa.table(
            {
                "user_id": pa.array(run_uid[ustart], pa.int64()),
                "n_streaks": pa.array(
                    np.diff(np.append(ustart, len(run_uid))), pa.int64()
                ),
                "max_streak": pa.array(
                    np.maximum.reduceat(run_len, ustart), pa.int64()
                ),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_STREAKS = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events
),
r AS (
  SELECT user_id, count(*) AS len
  FROM o GROUP BY user_id, event_type, grp
)
SELECT user_id, count(*) AS n_streaks, max(len) AS max_streak
FROM r GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# wave 9: TPC-H-shaped composites the fixture schema supports
#         (Q4 EXISTS, Q14 promo share, Q18 large orders)
# ---------------------------------------------------------------------------


def q_late_orders_by_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q4-shaped correlated EXISTS: orders in a 1996 window with
    at least one lineitem shipped > 90 days after the order date,
    counted by priority.  The predicate compares columns from BOTH
    sides, so it rides the bucketed hash join (attach o_orderdate /
    o_orderpriority to each lineitem), then per-batch distinct
    (orderkey, priority) partials fold to global distinct in the
    orderkey's bucket — EXISTS = first occurrence, never a row
    explosion.  All-integer output."""
    from ..functions.joins import hash_join
    from ..functions.window import keyed_window, segment_starts

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    LATE_US = 90 * 86_400_000_000

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_orderdate", "o_orderpriority"])
        .rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = hash_join(
        lineitem, orders, "l_orderkey",
        left_cols=["l_orderkey", "l_shipdate"],
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def late_pairs(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        odate = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.greater(ship, pc.add(odate, pa.scalar(LATE_US, pa.int64())))
        return (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )
            .filter(keep)
            .group_by(["l_orderkey", "o_orderpriority"])
            .aggregate([])
        )

    pairs = joined.map_batches(
        late_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pri = np.asarray(
            g.column("o_orderpriority").to_pylist(), dtype=object
        )
        order = np.argsort(key, kind="stable")
        key, pri = key[order], pri[order]
        firsts = segment_starts(key)  # priority is functional on order
        pri = pri[firsts]
        vals, cnt = np.unique(pri, return_counts=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(vals, pa.string()),
                "n_orders": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        keyed_window(pairs, "l_orderkey", fold)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .take_all()
    )
    return _from_rows(
        rows, {"o_orderpriority": pa.string(), "n_orders": pa.int64()}
    ).sort_by("o_orderpriority")


ORACLE_LATE_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def q_promo_revenue_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14-shaped promo share: revenue fraction from PROMO parts
    in one ship month.  part is the broadcast side (`ray.put` once,
    Acero probe per batch — zero exchange; at real TPC-H scale part
    grows with SF, so past the broadcast threshold this switches to
    the bucketed join like `auto_join` does); per-row revenue is
    rounded to exact cents on both sides, so only the final percent
    division is float — mirrored token-for-token."""
    from ..functions.joins import broadcast_join

    lo = pa.scalar(np.datetime64("1996-09-01", "us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"))

    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_type"]
    ).select(["p_partkey", "p_type"]).rename_columns(
        ["l_partkey", "p_type"]
    )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            )
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = broadcast_join(lineitem, part, "l_partkey")

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        ).to_numpy(zero_copy_only=False)
        promo = pc.equal(t.column("p_type"), "PROMO").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(rev[promo].sum())], pa.int64()
                ),
                "total_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = parts.aggregate(
        Sum("promo_cents", alias_name="promo_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    p, t = int(agg["promo_cents"] or 0), int(agg["total_cents"] or 0)
    share = (
        100.0 * (np.float64(p) / np.float64(t)) if t else float("nan")
    )
    return pa.table(
        {
            "promo_cents": pa.array([p], pa.int64()),
            "total_cents": pa.array([t], pa.int64()),
            "promo_share_pct": pa.array([share], pa.float64()),
        }
    )


ORACLE_PROMO_SHARE = """
WITH j AS (
  SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate <  TIMESTAMP '1996-10-01'
),
s AS (
  SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
           AS promo_cents,
         CAST(sum(rev) AS BIGINT) AS total_cents
  FROM j
)
SELECT promo_cents, total_cents,
       100.0 * (CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE))
         AS promo_share_pct
FROM s
"""


def q_big_orders_topk(sf_dir: str) -> pa.Table:
    """TPC-H Q18-shaped large-order scan: orders whose total quantity
    ≥ 300, top 100 by quantity (orderkey tie-break).  Per-batch
    partial sums → keyed fold (exact integer quantities) → HAVING
    filter inside the bucket → bucketed join back to orders for the
    customer/date columns → per-batch partial top-100 so the driver
    merges ≤ 100 rows per block, never the full qualifying set."""
    from ..functions.joins import hash_join
    from ..functions.window import keyed_window, segment_starts

    K, THRESHOLD = 100, 300

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = _round_int(t.column("l_quantity")).to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, qty = key[order], qty[order]
        starts = np.flatnonzero(segment_starts(key))
        return pa.table(
            {
                "l_orderkey": pa.array(key[starts], pa.int64()),
                "total_qty": pa.array(
                    np.add.reduceat(qty, starts), pa.int64()
                ),
            }
        )

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = g.column("total_qty").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, qty = key[order], qty[order]
        starts = np.flatnonzero(segment_starts(key))
        total = np.add.reduceat(qty, starts)
        keep = total >= THRESHOLD
        return pa.table(
            {
                "l_orderkey": pa.array(key[starts][keep], pa.int64()),
                "total_qty": pa.array(total[keep], pa.int64()),
            }
        )

    qualifying = keyed_window(partials, "l_orderkey", fold)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.select(
            ["o_orderkey", "o_custkey", "o_orderdate"]
        ).rename_columns(["l_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        qualifying, orders, "l_orderkey",
        left_cols=["l_orderkey", "total_qty"],
        right_cols=["o_custkey", "o_orderdate"],
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("total_qty", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, K)

    rows = joined.map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    t = _from_rows(
        rows,
        {
            "l_orderkey": pa.int64(),
            "total_qty": pa.int64(),
            "o_custkey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
        },
    )
    t = t.sort_by(
        [("total_qty", "descending"), ("l_orderkey", "ascending")]
    ).slice(0, K)
    return t.rename_columns(
        ["o_orderkey", "total_qty", "o_custkey", "o_orderdate"]
    )


ORACLE_BIG_ORDERS = """
WITH q AS (
  SELECT l_orderkey,
         CAST(sum(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(ROUND(l_quantity) AS BIGINT)) >= 300
)
SELECT o.o_orderkey, q.total_qty, o.o_custkey, o.o_orderdate
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
ORDER BY total_qty DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# wave 10: the remaining TPC-H composites the fixture schema supports
#          (Q5 local-supplier revenue, Q8 market share, Q10 returned
#          items, Q13 order-count distribution, Q15 top supplier,
#          Q22 idle-rich anti-join)
# ---------------------------------------------------------------------------


def _nation_names(sf_dir: str) -> dict[int, str]:
    """nationkey → n_name lookup (25 rows — a driver-side constant,
    like the reference's chain-config table)."""
    t = pq.read_table(_tbl(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    return dict(
        zip(
            t.column("n_nationkey").to_pylist(),
            t.column("n_name").to_pylist(),
        )
    )


def q_tpch_q5(sf_dir: str) -> pa.Table:
    """TPC-H Q5-shaped local-supplier revenue: for one region and one
    order year, revenue from lineitems whose supplier nation equals
    the ordering customer's nation, grouped by nation.  nation/region
    are driver constants (25/5 rows); customer and supplier are
    broadcast maps (`ray.put` once — at real scale customer crosses
    the broadcast threshold and rides `auto_join`'s bucketed path);
    the one genuine exchange is lineitem × orders on orderkey.
    Partials collapse to ≤ 25 nation rows per batch before the final
    fold."""
    from ..functions.joins import broadcast_join, hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    nation = pq.read_table(
        _tbl(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        _tbl(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    asia_rk = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey").to_pylist()
    asia_nk = set(
        nation.filter(
            pc.is_in(nation.column("n_regionkey"),
                     value_set=pa.array(asia_rk, pa.int32()))
        ).column("n_nationkey").to_pylist()
    )

    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(cust.column("c_nationkey"),
                 value_set=pa.array(sorted(asia_nk), pa.int32()))
    ).rename_columns(["o_custkey", "c_nationkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    forders = broadcast_join(orders, cust, "o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]).rename_columns(
            ["l_orderkey", "c_nationkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["c_nationkey"],
    )

    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            t.column("s_nationkey").cast(pa.int32()),
            t.column("c_nationkey").cast(pa.int32()),
        )
        t = t.filter(keep)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {
                    "n_nationkey": t.column("c_nationkey").cast(pa.int64()),
                    "revenue_cents": rev,
                }
            )
            .group_by("n_nationkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["n_nationkey", "revenue_cents"])
        )

    rows = (
        broadcast_join(joined, supp, "l_suppkey")
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_nationkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .take_all()
    )
    t = _from_rows(
        rows, {"n_nationkey": pa.int64(), "revenue_cents": pa.int64()}
    )
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array([names[k] for k in t.column("n_nationkey").to_pylist()],
                 pa.string()),
    )
    return t.select(["n_name", "revenue_cents"]).sort_by(
        [("revenue_cents", "descending"), ("n_name", "ascending")]
    )


ORACLE_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue_cents DESC, n_name
"""


def q_tpch_q8(sf_dir: str) -> pa.Table:
    """TPC-H Q8-shaped market share: among lineitems ordered by
    AMERICA-region customers over two years, the revenue fraction
    supplied by one target nation, per order year.  Year extraction is
    Arrow `pc.year` (mirrors DuckDB `year()`); cents are exact int64
    on both sides so only the final share division is float."""
    from ..functions.joins import broadcast_join, hash_join

    TARGET = "NATION_12"
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    nation = pq.read_table(
        _tbl(sf_dir, "nation"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        _tbl(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    am_rk = region.filter(
        pc.equal(region.column("r_name"), "AMERICA")
    ).column("r_regionkey").to_pylist()
    am_nk = nation.filter(
        pc.is_in(nation.column("n_regionkey"),
                 value_set=pa.array(am_rk, pa.int32()))
    ).column("n_nationkey").to_pylist()
    target_nk = set(
        nation.filter(pc.equal(nation.column("n_name"), TARGET))
        .column("n_nationkey").to_pylist()
    )

    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    am_ck = cust.filter(
        pc.is_in(cust.column("c_nationkey"),
                 value_set=pa.array(am_nk, pa.int32()))
    ).select(["c_custkey"]).rename_columns(["o_custkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    forders = broadcast_join(orders, am_ck, "o_custkey", how="semi") \
        .map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t.column("o_orderkey"),
                    "yr": pc.year(t.column("o_orderdate")).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["yr"],
    )

    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nationkey"])
    tk = pa.array(sorted(target_nk), pa.int32())

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        is_t = pc.is_in(t.column("s_nationkey").cast(pa.int32()),
                        value_set=tk)
        target_rev = pc.if_else(is_t, rev, pa.scalar(0, pa.int64()))
        return (
            pa.table(
                {
                    "yr": t.column("yr"),
                    "target_cents": target_rev,
                    "total_cents": rev,
                }
            )
            .group_by("yr")
            .aggregate([("target_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["yr", "target_cents", "total_cents"])
        )

    rows = (
        broadcast_join(joined, supp, "l_suppkey")
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("yr")
        .aggregate(
            Sum("target_cents", alias_name="target_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"yr": pa.int64(), "target_cents": pa.int64(),
         "total_cents": pa.int64()},
    ).sort_by("yr")
    share = pc.divide(
        t.column("target_cents").cast(pa.float64()),
        t.column("total_cents").cast(pa.float64()),
    )
    return t.append_column("mkt_share", share)


ORACLE_TPCH_Q8 = """
WITH j AS (
  SELECT year(o_orderdate) AS yr,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev,
         (SELECT n_name FROM nation n2
          WHERE n2.n_nationkey = s.s_nationkey) = 'NATION_12' AS is_t
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE r.r_name = 'AMERICA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT yr,
       CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS BIGINT)
         AS target_cents,
       CAST(sum(rev) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS mkt_share
FROM j GROUP BY yr ORDER BY yr
"""


def q_tpch_q10(sf_dir: str) -> pa.Table:
    """TPC-H Q10-shaped returned-item report: top 20 customers by
    revenue lost to returns (l_returnflag = 'R') against orders placed
    in one quarter.  One bucketed exchange (lineitem × quarter
    orders), per-batch partials per custkey, exact keyed fold, then
    per-block partial top-20 so the driver merges ≤ 20 rows per
    block; name/acctbal/nation attach to the 20 survivors only."""
    from ..functions.joins import hash_join
    from ..functions.window import keyed_window, segment_starts

    K = 20
    lo = pa.scalar(np.datetime64("1996-10-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]).rename_columns(
            ["l_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("l_returnflag"), "R")
        ).drop_columns(["l_returnflag"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        lineitem, orders, "l_orderkey",
        left_cols=["l_extendedprice", "l_discount"],
        right_cols=["o_custkey"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {"c_custkey": t.column("o_custkey"), "revenue_cents": rev}
            )
            .group_by("c_custkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["c_custkey", "revenue_cents"])
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("c_custkey").to_numpy(zero_copy_only=False)
        rev = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, rev = key[order], rev[order]
        starts = np.flatnonzero(segment_starts(key))
        t = pa.table(
            {
                "c_custkey": pa.array(key[starts], pa.int64()),
                "revenue_cents": pa.array(
                    np.add.reduceat(rev, starts), pa.int64()
                ),
            }
        )
        return t.sort_by(
            [("revenue_cents", "descending"), ("c_custkey", "ascending")]
        ).slice(0, K)

    rows = keyed_window(partials, "c_custkey", fold).take_all()
    t = _from_rows(
        rows, {"c_custkey": pa.int64(), "revenue_cents": pa.int64()}
    ).sort_by(
        [("revenue_cents", "descending"), ("c_custkey", "ascending")]
    ).slice(0, K)

    cust = pq.read_table(
        _tbl(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    t = t.join(cust, keys=["c_custkey"], join_type="left outer")
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array(
            [names[k] for k in t.column("c_nationkey").to_pylist()],
            pa.string(),
        ),
    )
    return t.select(
        ["c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name"]
    ).sort_by(
        [("revenue_cents", "descending"), ("c_custkey", "ascending")]
    )


ORACLE_TPCH_Q10 = """
WITH r AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1
  ORDER BY revenue_cents DESC, c_custkey LIMIT 20
)
SELECT r.c_custkey, c.c_name, r.revenue_cents, c.c_acctbal, n.n_name
FROM r JOIN customer c ON r.c_custkey = c.c_custkey
       JOIN nation n   ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_cents DESC, r.c_custkey
"""


def q_tpch_q13(sf_dir: str) -> pa.Table:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly k qualifying orders (priority 2-HIGH), INCLUDING
    the zero bucket.  No customer×orders join at all: qualifying
    per-customer counts fold exactly (partials → keyed sum), the
    histogram over counts is another two-level fold, and the zero
    bucket is total_customers − customers_with_any — the algebraic
    identity the LEFT JOIN oracle spells out row by row."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "2-HIGH"))
        return (
            pa.table({"c_custkey": t.column("o_custkey")})
            .group_by("c_custkey")
            .aggregate([("c_custkey", "count")])
            .rename_columns(["c_custkey", "n"])
        )

    counts = (
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"c_count": t.column("c_count")})
            .group_by("c_count")
            .aggregate([("c_count", "count")])
            .rename_columns(["c_count", "custdist"])
        )

    rows = (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .take_all()
    )
    t = _from_rows(
        rows, {"c_count": pa.int64(), "custdist": pa.int64()}
    )
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zeros = n_cust - int(pc.sum(t.column("custdist")).as_py() or 0)
    if zeros > 0:
        t = pa.concat_tables(
            [t, pa.table({"c_count": pa.array([0], pa.int64()),
                          "custdist": pa.array([zeros], pa.int64())})]
        )
    return t.sort_by(
        [("custdist", "descending"), ("c_count", "descending")]
    )


ORACLE_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '2-HIGH'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(sf_dir: str) -> pa.Table:
    """TPC-H Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one quarter.  Per-supplier revenue folds exactly
    through one keyed exchange; each output block then emits only its
    rows tying the BLOCK max, so the driver merges ≤ blocks × ties
    rows and takes the global max — never the full supplier list."""
    from ..functions.window import keyed_window, segment_starts

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            )
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {"s_suppkey": t.column("l_suppkey"), "total_cents": rev}
            )
            .group_by("s_suppkey")
            .aggregate([("total_cents", "sum")])
            .rename_columns(["s_suppkey", "total_cents"])
        )

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("s_suppkey").to_numpy(zero_copy_only=False)
        rev = g.column("total_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, rev = key[order], rev[order]
        starts = np.flatnonzero(segment_starts(key))
        total = np.add.reduceat(rev, starts)
        keep = total == total.max() if len(total) else slice(0)
        return pa.table(
            {
                "s_suppkey": pa.array(key[starts][keep], pa.int64()),
                "total_cents": pa.array(total[keep], pa.int64()),
            }
        )

    rows = keyed_window(partials, "s_suppkey", fold).take_all()
    t = _from_rows(
        rows, {"s_suppkey": pa.int64(), "total_cents": pa.int64()}
    )
    mx = pc.max(t.column("total_cents"))
    t = t.filter(pc.equal(t.column("total_cents"), mx))
    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_name"]
    )
    return t.join(supp, keys=["s_suppkey"], join_type="left outer") \
        .select(["s_suppkey", "s_name", "total_cents"]).sort_by("s_suppkey")


ORACLE_TPCH_Q15 = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.total_cents
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM r)
ORDER BY r.s_suppkey
"""


def q_tpch_q22(sf_dir: str) -> pa.Table:
    """TPC-H Q22-shaped idle-rich report: customers whose balance
    beats the positive-balance average but who placed no order since
    1999, aggregated per nation.  The average gate is an integer
    cross-multiply (cents × count > total-cents) so the threshold has
    no float boundary; 'no recent order' is the bucketed anti-join;
    partials collapse to ≤ 25 nation rows per batch."""
    from ..functions.joins import hash_join

    cutoff = pa.scalar(np.datetime64("1999-01-01", "us"))

    customer = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("c_acctbal"), 0.0))
        return pa.table(
            {
                "tot": pa.array(
                    [int(pc.sum(_cents(pos.column("c_acctbal"))).as_py()
                         or 0)], pa.int64()
                ),
                "cnt": pa.array([pos.num_rows], pa.int64()),
            }
        )

    agg = customer.map_batches(
        bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("tot", alias_name="tot"), Sum("cnt", alias_name="cnt"))
    tot, cnt = int(agg["tot"] or 0), int(agg["cnt"] or 0)

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(cnt, pa.int64())),
            pa.scalar(tot, pa.int64()),
        )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "cents": cents,
            }
        ).filter(keep)

    rich_ds = customer.map_batches(
        rich, batch_format="pyarrow", zero_copy_batch=True
    )
    recent = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("o_orderdate"), cutoff)
        ).select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    idle = hash_join(
        rich_ds, recent, "c_custkey",
        left_cols=["c_custkey", "c_nationkey", "cents"],
        right_cols=[],
        how="anti",
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "n_nationkey": t.column("c_nationkey"),
                    "numcust": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "acctbal_cents": t.column("cents"),
                }
            )
            .group_by("n_nationkey")
            .aggregate([("numcust", "sum"), ("acctbal_cents", "sum")])
            .rename_columns(["n_nationkey", "numcust", "acctbal_cents"])
        )

    rows = (
        idle.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"n_nationkey": pa.int64(), "numcust": pa.int64(),
         "acctbal_cents": pa.int64()},
    )
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array([names[k] for k in t.column("n_nationkey").to_pylist()],
                 pa.string()),
    )
    return t.select(["n_name", "numcust", "acctbal_cents"]).sort_by("n_name")


ORACLE_TPCH_Q22 = """
WITH s AS (
  SELECT CAST(sum(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS tot,
         count(*) AS cnt
  FROM customer WHERE c_acctbal > 0
),
rich AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer, s
  WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * cnt > tot
)
SELECT n_name, count(*) AS numcust,
       CAST(sum(cents) AS BIGINT) AS acctbal_cents
FROM rich JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = rich.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01'
)
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# wave 11: rolling-window distinct (WAU), embedding centroids, corpus
#          balance (Gini), global percentile rank
# ---------------------------------------------------------------------------


def q_rolling_wau(sf_dir: str) -> pa.Table:
    """7-day rolling distinct active users (WAU) per observed day —
    the windowed COUNT(DISTINCT) the oracle writes as a 7-day
    self-join.  Per-user presence days fold through ONE keyed
    exchange; inside the bucket each user's day list collapses to
    merged coverage intervals (runs with gaps ≤ 6 extend, a user
    covers [day, day+6] per presence), which emit ±1 boundary deltas.
    Only O(distinct boundary days) rows reach the driver, which
    prefix-sums the step function and samples it at observed days —
    never a per-(day, user) pair table."""
    from ..functions.window import keyed_window, segment_starts

    DAY_US = 86_400_000_000
    W = 7  # window covers [d-6, d]
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            pa.scalar(DAY_US, pa.int64()),
        )
        return (
            pa.table({"user_id": t.column("user_id"), "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    presence = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        ustart = segment_starts(uid)
        # drop duplicate (user, day) rows surviving across batches
        dup = ~ustart.copy()
        dup[1:] &= day[1:] == day[:-1]
        uid, day, ustart = uid[~dup], day[~dup], ustart[~dup]
        # a new coverage interval starts at a user boundary or a gap > W-1
        newint = ustart.copy()
        newint[1:] |= (day[1:] - day[:-1]) > (W - 1)
        istart = np.flatnonzero(newint)
        iend = np.append(istart[1:], len(day)) - 1
        start_day = day[istart]
        end_day = day[iend] + (W - 1)  # inclusive
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate([start_day, end_day + 1]), pa.int64()
                ),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(istart), dtype=np.int64),
                            -np.ones(len(istart), dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    deltas = (
        keyed_window(presence, "user_id", fold)
        .groupby("day")
        .aggregate(Sum("delta", alias_name="delta"))
        .take_all()
    )
    dt = _from_rows(
        deltas, {"day": pa.int64(), "delta": pa.int64()}
    ).sort_by("day")
    bdays = dt.column("day").to_numpy(zero_copy_only=False)
    steps = np.cumsum(dt.column("delta").to_numpy(zero_copy_only=False))

    observed = (
        presence.map_batches(
            lambda t: t.group_by("day").aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    ot = _from_rows(
        observed, {"day": pa.int64(), "_n": pa.int64()}
    ).sort_by("day")
    odays = ot.column("day").to_numpy(zero_copy_only=False)
    idx = np.searchsorted(bdays, odays, side="right") - 1
    wau = np.where(idx >= 0, steps[np.maximum(idx, 0)], 0)
    return pa.table(
        {
            "day": pa.array(odays, pa.int64()),
            "wau": pa.array(wau.astype(np.int64), pa.int64()),
        }
    )


ORACLE_ROLLING_WAU = """
WITH ed AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
days AS (SELECT DISTINCT day FROM ed)
SELECT d.day, count(DISTINCT e.user_id) AS wau
FROM days d JOIN ed e ON e.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day ORDER BY d.day
"""


def q_centroid_per_label(sf_dir: str) -> pa.Table:
    """Per-label embedding centroid in exact integer micro-units —
    the class-prototype primitive behind SemDeDup-style pruning and
    embedding drift monitors.  Each element is rounded once to int64
    micro-units (mirrored in the oracle), so the distributed sum is
    order-independent; per-batch partials are ≤ labels × dims rows and
    only the final mean division is float."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if emb.num_chunks > 0:
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb)
        m = _micro(flat).to_numpy(zero_copy_only=False)
        lab = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = t.num_rows
        d = len(m) // max(n, 1)
        key = np.repeat(lab, d) * d + np.tile(
            np.arange(d, dtype=np.int64), n
        )
        order = np.argsort(key, kind="stable")
        key_s, m_s = key[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], key_s[1:] != key_s[:-1]))
            if len(key_s)
            else np.array([], dtype=bool)
        )
        uk = key_s[starts]
        return pa.table(
            {
                "label": pa.array(uk // d, pa.int64()),
                "dim": pa.array(uk % d, pa.int64()),
                "sum_micro": pa.array(
                    np.add.reduceat(m_s, starts) if len(starts) else [],
                    pa.int64(),
                ),
                "n_vecs": pa.array(
                    np.diff(np.append(starts, len(key_s))), pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sum_micro", alias_name="sum_micro"),
            Sum("n_vecs", alias_name="n_vecs"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"label": pa.int64(), "dim": pa.int64(), "sum_micro": pa.int64(),
         "n_vecs": pa.int64()},
    ).sort_by([("label", "ascending"), ("dim", "ascending")])
    mean = pc.divide(
        t.column("sum_micro").cast(pa.float64()),
        t.column("n_vecs").cast(pa.float64()),
    )
    return t.append_column("centroid_micro", mean)


ORACLE_CENTROID = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label, u.i - 1 AS dim,
         CAST(ROUND(CAST(u.e AS DOUBLE) * 1000000.0) AS BIGINT) AS m
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS e,
                       unnest(generate_series(1, len(embedding))) AS i) u
)
SELECT label, dim, CAST(sum(m) AS BIGINT) AS sum_micro,
       count(*) AS n_vecs,
       CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS centroid_micro
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_activity_gini(sf_dir: str) -> pa.Table:
    """Gini coefficient of per-user event counts — the corpus-balance
    diagnostic ('is 1% of users 90% of the data').  Per-user counts
    fold exactly; a second fold histograms the counts (O(distinct
    count values) rows); the driver evaluates the rank-weighted sum in
    closed form per histogram cell with Python-int exactness — the
    identity Σᵢ i·x₍ᵢ₎ = Σ_v v·(f·o + f(f+1)/2), which is tie-order
    invariant, so no global sort and no O(users) driver state."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"user_id": t.column("user_id")})
            .group_by("user_id")
            .aggregate([("user_id", "count")])
            .rename_columns(["user_id", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, n = uid[order], n[order]
        starts = np.flatnonzero(segment_starts(uid))
        total = np.add.reduceat(n, starts)
        vals, freq = np.unique(total, return_counts=True)
        return pa.table(
            {
                "n": pa.array(vals, pa.int64()),
                "freq": pa.array(freq, pa.int64()),
            }
        )

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby("n")
        .aggregate(Sum("freq", alias_name="freq"))
        .take_all()
    )
    t = _from_rows(rows, {"n": pa.int64(), "freq": pa.int64()}).sort_by("n")
    vals = t.column("n").to_pylist()
    freq = t.column("freq").to_pylist()
    nu = int(sum(freq))
    tot = int(sum(v * f for v, f in zip(vals, freq)))
    s = 0
    offset = 0  # users with strictly smaller counts
    for v, f in zip(vals, freq):
        s += v * (f * offset + f * (f + 1) // 2)
        offset += f
    gini = (
        2.0 * np.float64(s) / (np.float64(nu) * np.float64(tot))
        - (np.float64(nu) + 1.0) / np.float64(nu)
        if nu and tot
        else float("nan")
    )
    return pa.table(
        {
            "n_users": pa.array([nu], pa.int64()),
            "total_events": pa.array([tot], pa.int64()),
            "gini": pa.array([float(gini)], pa.float64()),
        }
    )


ORACLE_GINI = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
s AS (
  SELECT n, row_number() OVER (ORDER BY n, user_id) AS i FROM c
)
SELECT count(*) AS n_users, CAST(sum(n) AS BIGINT) AS total_events,
       2.0 * CAST(sum(i * n) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
         - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
         AS gini
FROM s
"""


def q_user_value_percent_rank(sf_dir: str) -> pa.Table:
    """Global percent_rank of each user's total spend — 'which
    percentile is this user in'.  Totals fold exactly per user; the
    global rank then uses the range-partitioned two-pass scan (the
    ordered_prefix_sum shape): pass 1 counts rows per value-range (the
    driver holds R integers), pass 2 ranks each row inside its range
    by local searchsorted plus the range's exclusive offset.  Equal
    totals always share a range, so SQL rank()/percent_rank() tie
    semantics are exact — no global sort."""
    from ..functions.window import default_num_buckets, keyed_window, \
        segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        return (
            pa.table({"user_id": t.column("user_id"), "cents": cents})
            .group_by("user_id")
            .aggregate([("cents", "sum")])
            .rename_columns(["user_id", "total_cents"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        c = g.column("total_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, c = uid[order], c[order]
        starts = np.flatnonzero(segment_starts(uid))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "total_cents": pa.array(
                    np.add.reduceat(c, starts), pa.int64()
                ),
            }
        )

    totals = keyed_window(partials, "user_id", fold)

    agg = totals.aggregate(
        Min("total_cents", alias_name="lo"),
        Max("total_cents", alias_name="hi"),
    )
    lo, hi = int(agg["lo"]), int(agg["hi"])
    R = default_num_buckets()
    span = max(hi - lo, 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("total_cents").to_numpy(zero_copy_only=False)
        rid = np.clip((v - lo) * R // (span + 1), 0, R - 1)
        return t.append_column("__r", pa.array(rid.astype(np.int64)))

    ranged = totals.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )
    counts_rows = (
        ranged.map_batches(
            lambda t: t.select(["__r"]).group_by("__r").aggregate(
                [("__r", "count")]
            ).rename_columns(["__r", "c"]),
            batch_format="pyarrow",
        )
        .groupby("__r")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    ct = _from_rows(
        counts_rows, {"__r": pa.int64(), "c": pa.int64()}
    ).sort_by("__r")
    rids = ct.column("__r").to_numpy(zero_copy_only=False)
    cs = ct.column("c").to_numpy(zero_copy_only=False)
    n_total = int(cs.sum())
    offsets_arr = np.zeros(R, dtype=np.int64)
    offsets_arr[rids] = cs
    offsets_arr = np.concatenate(([0], np.cumsum(offsets_arr)[:-1]))
    offsets = {int(r): int(offsets_arr[r]) for r in range(R)}
    denom = max(n_total - 1, 1)

    def rank_range(g: pa.Table) -> pa.Table:
        # a hash bucket may hold several range ids — rank each range
        # segment independently against its own exclusive offset
        rid = g.column("__r").to_numpy(zero_copy_only=False)
        v = g.column("total_cents").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, rid))
        rid, v, uid = rid[order], v[order], uid[order]
        starts = np.flatnonzero(segment_starts(rid))
        ends = np.append(starts[1:], len(rid))
        rank = np.empty(len(v), dtype=np.int64)
        for s, e in zip(starts, ends):  # ≤ R/num_buckets segments
            sv = v[s:e]  # already sorted within the segment
            rank[s:e] = (
                offsets[int(rid[s])]
                + np.searchsorted(sv, sv, side="left")
                + 1
            )
        pct = (rank - 1).astype(np.float64) / np.float64(denom)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "total_cents": pa.array(v, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return keyed_window(ranged, "__r", rank_range).sort("user_id")


ORACLE_PCT_RANK = """
WITH t AS (
  SELECT user_id,
         CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events GROUP BY 1
)
SELECT user_id, total_cents,
       percent_rank() OVER (ORDER BY total_cents) AS pct_rank
FROM t ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# wave 12: tokenizer fertility per language, top user journeys,
#          hard-negative mining over embeddings
# ---------------------------------------------------------------------------


def q_fertility_per_lang(sf_dir: str) -> pa.Table:
    """Tokenizer fertility by language (chars per token) — the
    multilingual-budget diagnostic: a language whose tokens are
    'cheap' in characters eats more of a fixed token budget.  Same
    RE2 token kernel as token_stats, per-batch per-lang integer
    partials (≤ |langs| rows each), one tiny fold; only the final
    ratio is float."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        stats = token_stats(t)
        return (
            pa.table(
                {
                    "lang": t.column("lang"),
                    "n_docs": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "n_tokens": stats.column("n_tokens"),
                    "n_chars": stats.column("n_chars_calc"),
                }
            )
            .group_by("lang")
            .aggregate(
                [("n_docs", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")]
            )
            .rename_columns(["lang", "n_docs", "n_tokens", "n_chars"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"lang": pa.string(), "n_docs": pa.int64(),
         "n_tokens": pa.int64(), "n_chars": pa.int64()},
    ).sort_by("lang")
    ratio = pc.divide(
        t.column("n_chars").cast(pa.float64()),
        t.column("n_tokens").cast(pa.float64()),
    )
    return t.append_column("chars_per_token", ratio)


ORACLE_FERTILITY = r"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(length(text)) AS DOUBLE)
         / CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS chars_per_token
FROM documents GROUP BY lang ORDER BY lang
"""


def q_top_journeys(sf_dir: str) -> pa.Table:
    """Top-10 session-opening journeys: the first ≤3 event types of
    each 30-min-gap session, '>'-joined — the funnel-discovery
    operator.  Session assignment is the session_windows kernel (one
    lexsort + gap diff per user bucket); the 3 opening types gather by
    start-offset arithmetic and join via one vectorized
    binary_join_element_wise; journey counts fold partially per batch
    before one tiny groupby and a deterministic (count desc, journey
    asc) top-10."""
    from ..functions.window import keyed_window

    K = 10
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(uids % 16, pa.int64()))

    def journeys(g: pa.Table) -> pa.Table:
        uids = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uids))
        uids, ts = uids[order], ts[order]
        typ = g.column("event_type").take(pa.array(order))
        n = len(uids)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uids[1:] != uids[:-1]
        gap = np.ones(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > _SESSION_GAP_US
        starts = np.flatnonzero(new_user | gap)
        counts = np.diff(np.concatenate((starts, [n])))
        parts = []
        for k in range(3):
            idx = np.where(counts > k, starts + k, starts)  # safe gather
            col = typ.take(pa.array(idx))
            # mask out sessions shorter than k+1 with ""
            col = pc.if_else(
                pa.array(counts > k), col, pa.scalar("", pa.string())
            )
            if k > 0:
                col = pc.if_else(
                    pa.array(counts > k),
                    pc.binary_join_element_wise(
                        pa.array([">"] * len(starts), pa.string()), col, ""
                    ),
                    pa.scalar("", pa.string()),
                )
            parts.append(col)
        journey = pc.binary_join_element_wise(*parts, "")
        return (
            pa.table({"journey": journey})
            .group_by("journey")
            .aggregate([("journey", "count")])
            .rename_columns(["journey", "n_sessions"])
        )

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: journeys(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("n_sessions", "descending"), ("journey", "ascending")]
        ).slice(0, K)

    rows = (
        partials.groupby("journey")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
        .map_batches(topk, batch_format="pyarrow")
        .take_all()
    )
    return _from_rows(
        rows, {"journey": pa.string(), "n_sessions": pa.int64()}
    ).sort_by(
        [("n_sessions", "descending"), ("journey", "ascending")]
    ).slice(0, K)


ORACLE_TOP_JOURNEYS = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(is_start) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM s
),
j AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= 3 GROUP BY user_id, sid
)
SELECT journey, count(*) AS n_sessions
FROM j GROUP BY journey
ORDER BY n_sessions DESC, journey LIMIT 10
"""


def q_hard_negatives_embeddings(sf_dir: str) -> pa.Table:
    """Hard-negative mining: for every vector, the most-similar vector
    with a DIFFERENT label — the contrastive-training pair generator.
    Same block-pair exchange as cosine_neardup_pairs (no full-matrix
    broadcast); each (g1,g2) group emits one partial best per vector
    side (cross-label mask on the sims matrix, exact-tie broken to the
    smallest neg id), and a keyed fold takes the global (max sim, min
    id) — O(vecs) rows, never O(vecs²), past the exchange.  Float64
    cosine on both sides; output is ids only so the hash compare is
    ulp-robust (sims differ from DuckDB's sequential sum only in the
    last ulp, and top-1 margins on this data are >> that)."""
    from ..functions.similarity import _batch_mat, _normalize
    from ..functions.window import keyed_window, segment_starts

    B = 4
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        g = (ids % B).astype(np.int64)
        out = []
        for g1 in range(B):
            for g2 in range(g1, B):
                sel = (g == g1) | (g == g2)
                if not sel.any():
                    continue
                sub = batch.filter(pa.array(sel))
                out.append(
                    sub.append_column(
                        "__grp",
                        pa.array(np.full(sub.num_rows, g1 * B + g2),
                                 pa.int64()),
                    )
                )
        return pa.concat_tables(out)

    def best_cross(ids_a, mat_a, lab_a, ids_b, mat_b, lab_b):
        sims = mat_a @ mat_b.T
        mask = lab_a[:, None] == lab_b[None, :]
        sims[mask] = -np.inf
        best = sims.max(axis=1)
        tie = sims == best[:, None]
        neg = np.where(tie, ids_b[None, :], np.iinfo(np.int64).max).min(
            axis=1
        )
        ok = np.isfinite(best)
        return pa.table(
            {
                "vec_id": pa.array(ids_a[ok], pa.int64()),
                "sim": pa.array(best[ok], pa.float64()),
                "neg_id": pa.array(neg[ok], pa.int64()),
            }
        )

    def pairs_in_group(group: pa.Table) -> pa.Table:
        grp = int(group.column("__grp")[0].as_py())
        g1, g2 = divmod(grp, B)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        lab = group.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        mat = _normalize(_batch_mat(group, "embedding"))
        blk = (ids % B).astype(np.int64)
        if g1 == g2:
            sel = blk == g1
            return best_cross(
                ids[sel], mat[sel], lab[sel], ids[sel], mat[sel], lab[sel]
            )
        sa, sb = blk == g1, blk == g2
        return pa.concat_tables(
            [
                best_cross(ids[sa], mat[sa], lab[sa],
                           ids[sb], mat[sb], lab[sb]),
                best_cross(ids[sb], mat[sb], lab[sb],
                           ids[sa], mat[sa], lab[sa]),
            ]
        )

    partials = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__grp")
        .map_groups(pairs_in_group, batch_format="pyarrow")
    )

    def fold(g: pa.Table) -> pa.Table:
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        sim = g.column("sim").to_numpy(zero_copy_only=False)
        neg = g.column("neg_id").to_numpy(zero_copy_only=False)
        # per vec: max sim, exact ties to min neg_id
        order = np.lexsort((neg, -sim, vid))
        vid, neg = vid[order], neg[order]
        starts = np.flatnonzero(segment_starts(vid))
        return pa.table(
            {
                "vec_id": pa.array(vid[starts], pa.int64()),
                "neg_id": pa.array(neg[starts], pa.int64()),
            }
        )

    return keyed_window(partials, "vec_id", fold).sort("vec_id")


ORACLE_HARD_NEGATIVES = """
WITH p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.label <> b.label
),
r AS (
  SELECT vec_id, neg_id,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY sim DESC, neg_id) AS rn
  FROM p
)
SELECT vec_id, neg_id FROM r WHERE rn = 1 ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# wave 13: temperature-sampled source mixing, perceptual-hash media
#          dedup, repeat-purchase rate
# ---------------------------------------------------------------------------


def q_temperature_mix_documents(sf_dir: str) -> pa.Table:
    """Temperature-sampled source mixing (τ = 0.5): each source's
    share of a 10% corpus budget is ∝ √count — the multilingual /
    multi-source rebalancing primitive (big sources are down-weighted,
    small ones up-weighted).  All quota arithmetic is INTEGER (isqrt
    weights, floor division — the oracle spells the same isqrt out as
    a floor(sqrt)±1 CASE), so there is no float boundary; selection
    within a source is content-hash rank.  Per-batch partial top-k_s
    per source bounds the exchange at O(Σ k_s) rows, then one
    source-keyed fold picks the exact global k_s."""
    import math

    from ..functions.window import keyed_window, row_numbers, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"source": t.column("source")})
            .group_by("source")
            .aggregate([("source", "count")])
            .rename_columns(["source", "n"])
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    src_n = {r["source"]: int(r["n"]) for r in counts}
    weights = {s: math.isqrt(n) for s, n in src_n.items()}
    total = sum(src_n.values())
    target = total // 10
    sw = sum(weights.values())
    quota = {s: (target * w) // sw for s, w in weights.items()}

    def select_partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        sha = np.asarray(
            sha256_hex(t.column("doc_id").cast(pa.string())).to_pylist()
        )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sha, src))
        src, sha_s, did_s = src[order], sha[order], did[order]
        starts = segment_starts(src)
        rn = row_numbers(starts)
        u, inv = np.unique(src, return_inverse=True)
        kcap = np.asarray([quota[s] for s in u], dtype=np.int64)[inv]
        keep = rn <= kcap
        return pa.table(
            {
                "doc_id": pa.array(did_s[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
                "sha": pa.array(sha_s[keep], pa.string()),
            }
        )

    partials = ds.map_batches(
        select_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        src = np.asarray(g.column("source").to_pylist(), dtype=object)
        sha = np.asarray(g.column("sha").to_pylist())
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sha, src))
        src, did = src[order], did[order]
        starts = segment_starts(src)
        rn = row_numbers(starts)
        u, inv = np.unique(src, return_inverse=True)
        kcap = np.asarray([quota[s] for s in u], dtype=np.int64)[inv]
        keep = rn <= kcap
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
            }
        )

    return keyed_window(partials, "source", fold).sort("doc_id")


ORACLE_TEMPERATURE_MIX = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
w0 AS (
  SELECT source, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r0
  FROM c
),
w AS (  -- exact integer sqrt: fix any float rounding of floor(sqrt)
  SELECT source, n,
         CASE WHEN (r0 + 1) * (r0 + 1) <= n THEN r0 + 1
              WHEN r0 * r0 > n THEN r0 - 1
              ELSE r0 END AS wt
  FROM w0
),
t AS (
  SELECT CAST(sum(n) AS BIGINT) // 10 AS target,
         CAST(sum(wt) AS BIGINT) AS sw
  FROM w
),
k AS (SELECT source, (SELECT target FROM t) * wt // (SELECT sw FROM t)
        AS quota FROM w),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source
             ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.source
FROM r JOIN k ON r.source = k.source
WHERE r.rn <= k.quota ORDER BY r.doc_id
"""


def q_phash_media_dupes(sf_dir: str) -> pa.Table:
    """Duplicate-media clusters by perceptual hash: documents rendered
    as real BMP payloads, decoded and average-hashed (8×8 gray) in an
    actor-pool stage, then grouped by the 64-bit hash — duplicate
    texts render identical bitmaps, so the planted duplicate docs
    surface as media clusters.  Per-batch partial (hash → count,
    min id) keeps the exchange O(distinct hashes).  Rows-only (SQL
    cannot decode BMPs); the hash kernel itself is unit-tested with
    planted identical/near/distinct images."""
    from ..functions.multimodal import media_phash_pipeline
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashes = media_phash_pipeline(ds)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("ahash")
            .aggregate([("media_id", "count"), ("media_id", "min")])
            .rename_columns(["ahash", "n_media", "min_media_id"])
        )

    partials = hashes.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        h = g.column("ahash").to_numpy(zero_copy_only=False)
        n = g.column("n_media").to_numpy(zero_copy_only=False)
        mn = g.column("min_media_id").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, n, mn = h[order], n[order], mn[order]
        starts = np.flatnonzero(segment_starts(h))
        tot = np.add.reduceat(n, starts)
        mins = np.minimum.reduceat(mn, starts)
        keep = tot >= 2
        return pa.table(
            {
                "ahash": pa.array(h[starts][keep], pa.int64()),
                "n_media": pa.array(tot[keep], pa.int64()),
                "min_media_id": pa.array(mins[keep], pa.int64()),
            }
        )

    return keyed_window(partials, "ahash", fold).sort("min_media_id")


def q_repeat_purchase_rate(sf_dir: str) -> pa.Table:
    """Repeat-purchase rate: of users with ≥1 purchase event, the
    fraction with ≥2 — the retention KPI.  Per-user purchase counts
    fold exactly; only two scalars reach the driver."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return (
            pa.table({"user_id": t.column("user_id")})
            .group_by("user_id")
            .aggregate([("user_id", "count")])
            .rename_columns(["user_id", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, n = uid[order], n[order]
        starts = np.flatnonzero(segment_starts(uid))
        tot = np.add.reduceat(n, starts)
        return pa.table(
            {
                "buyers": pa.array([len(tot)], pa.int64()),
                "repeaters": pa.array(
                    [int((tot >= 2).sum())], pa.int64()
                ),
            }
        )

    agg = keyed_window(partials, "user_id", fold).aggregate(
        Sum("buyers", alias_name="buyers"),
        Sum("repeaters", alias_name="repeaters"),
    )
    b, r = int(agg["buyers"] or 0), int(agg["repeaters"] or 0)
    rate = np.float64(r) / np.float64(b) if b else float("nan")
    return pa.table(
        {
            "buyers": pa.array([b], pa.int64()),
            "repeaters": pa.array([r], pa.int64()),
            "repeat_rate": pa.array([float(rate)], pa.float64()),
        }
    )


ORACLE_REPEAT_PURCHASE = """
WITH c AS (
  SELECT user_id, count(*) AS n FROM events
  WHERE event_type = 'purchase' GROUP BY 1
)
SELECT count(*) AS buyers,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS repeaters,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS repeat_rate
FROM c
"""


# ---------------------------------------------------------------------------
# wave 14: the last TPC-H shapes this schema can express
#          (Q7 volume shipping, Q17 small-quantity revenue, Q19
#          disjunctive predicate scan); Q2/Q9/Q11/Q16/Q20 need
#          partsupp and Q12/Q21 need commit/receipt dates — neither
#          exists in the fixture schema (documented, not skipped
#          silently).
# ---------------------------------------------------------------------------


def q_tpch_q7(sf_dir: str) -> pa.Table:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    nations (supplier side vs ordering-customer side, both
    directions), per ship year.  supplier and customer nation maps
    broadcast; one orderkey exchange; per-batch partials collapse to
    ≤ 2 × years rows."""
    from ..functions.joins import broadcast_join, hash_join

    NA, NB = "NATION_12", "NATION_3"

    nation = pq.read_table(
        _tbl(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    )
    tgt = nation.filter(
        pc.is_in(nation.column("n_name"),
                 value_set=pa.array([NA, NB], pa.string()))
    )
    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).join(
        tgt.rename_columns(["s_nationkey", "supp_nation"]),
        keys=["s_nationkey"], join_type="inner",
    ).select(["s_suppkey", "supp_nation"]).rename_columns(
        ["l_suppkey", "supp_nation"]
    )
    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).join(
        tgt.rename_columns(["c_nationkey", "cust_nation"]),
        keys=["c_nationkey"], join_type="inner",
    ).select(["c_custkey", "cust_nation"]).rename_columns(
        ["o_custkey", "cust_nation"]
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    forders = broadcast_join(orders, cust, "o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "cust_nation"]).rename_columns(
            ["l_orderkey", "cust_nation"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
         "l_discount"],
    )
    lsupp = broadcast_join(lineitem, supp, "l_suppkey")
    joined = hash_join(
        lsupp, forders, "l_orderkey",
        left_cols=["l_shipdate", "l_extendedprice", "l_discount",
                   "supp_nation"],
        right_cols=["cust_nation"],
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(t.column("supp_nation"), t.column("cust_nation"))
        )
        t = t.filter(keep)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {
                    "supp_nation": t.column("supp_nation"),
                    "cust_nation": t.column("cust_nation"),
                    "yr": pc.year(t.column("l_shipdate")).cast(pa.int64()),
                    "revenue_cents": rev,
                }
            )
            .group_by(["supp_nation", "cust_nation", "yr"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["supp_nation", "cust_nation", "yr", "revenue_cents"]
            )
        )

    rows = (
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(["supp_nation", "cust_nation", "yr"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .take_all()
    )
    return _from_rows(
        rows,
        {"supp_nation": pa.string(), "cust_nation": pa.string(),
         "yr": pa.int64(), "revenue_cents": pa.int64()},
    ).sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"),
         ("yr", "ascending")]
    )


ORACLE_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS yr,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3')
   OR (n1.n_name = 'NATION_3'  AND n2.n_name = 'NATION_12')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_tpch_q17(sf_dir: str) -> pa.Table:
    """TPC-H Q17-shaped small-quantity revenue: lineitems of one
    brand's parts whose quantity is below 20% of that part's average
    quantity.  The average gate is the integer cross-multiply
    qi·5·n < Σq (no float threshold); the brand's partkeys broadcast
    as a semi-filter FIRST so the per-part aggregate runs over the
    brand slice only, then one partkey exchange joins each lineitem
    back to its part's (Σq, n)."""
    from ..functions.joins import broadcast_join, hash_join
    from ..functions.window import keyed_window, segment_starts

    BRAND = "Brand#1"
    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    )
    bkeys = part.filter(
        pc.equal(part.column("p_brand"), BRAND)
    ).select(["p_partkey"]).rename_columns(["l_partkey"])

    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li = broadcast_join(lineitem, bkeys, "l_partkey", how="semi")

    def enrich(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qi": _round_int(t.column("l_quantity")),
                "pc_": _cents(t.column("l_extendedprice")),
            }
        )

    rows_ds = li.map_batches(
        enrich, batch_format="pyarrow", zero_copy_batch=True
    )

    def agg_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["l_partkey", "qi"])
            .group_by("l_partkey")
            .aggregate([("qi", "sum"), ("qi", "count")])
            .rename_columns(["l_partkey", "sq", "n"])
        )

    agg = (
        rows_ds.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sq"), Sum("n", alias_name="n"))
    )
    joined = hash_join(
        rows_ds, agg, "l_partkey",
        left_cols=["qi", "pc_"],
        right_cols=["sq", "n"],
    )

    def gate(t: pa.Table) -> pa.Table:
        qi = t.column("qi").to_numpy(zero_copy_only=False)
        sq = t.column("sq").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        pcents = t.column("pc_").to_numpy(zero_copy_only=False)
        keep = qi * 5 * n < sq
        return pa.table(
            {
                "n_lineitems": pa.array([int(keep.sum())], pa.int64()),
                "revenue_cents": pa.array(
                    [int(pcents[keep].sum())], pa.int64()
                ),
            }
        )

    out = joined.map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_lineitems", alias_name="n_lineitems"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    n, cents = int(out["n_lineitems"] or 0), int(out["revenue_cents"] or 0)
    return pa.table(
        {
            "n_lineitems": pa.array([n], pa.int64()),
            "revenue_cents": pa.array([cents], pa.int64()),
            "avg_yearly_cents": pa.array(
                [np.float64(cents) / 7.0], pa.float64()
            ),
        }
    )


ORACLE_TPCH_Q17 = """
WITH q AS (
  SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qi,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
),
a AS (
  SELECT l_partkey, CAST(sum(qi) AS BIGINT) AS sq, count(*) AS n
  FROM q GROUP BY 1
)
SELECT count(*) AS n_lineitems,
       CAST(coalesce(sum(q.pc), 0) AS BIGINT) AS revenue_cents,
       CAST(coalesce(sum(q.pc), 0) AS DOUBLE) / 7.0 AS avg_yearly_cents
FROM q JOIN a USING (l_partkey)
WHERE q.qi * 5 * a.n < a.sq
"""


def q_tpch_q19(sf_dir: str) -> pa.Table:
    """TPC-H Q19-shaped disjunctive predicate scan: revenue from
    lineitems matching any of three (brand, size range, quantity
    range) conjunctions — the multi-clause pushdown test.  part's
    (brand, size) broadcast once; the OR evaluates vectorized per
    batch; two scalars reach the driver."""
    from ..functions.joins import broadcast_join

    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    ).rename_columns(["l_partkey", "p_brand", "p_size"])
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(lineitem, part, "l_partkey")

    CLAUSES = [
        ("Brand#1", 1, 15, 1, 20),
        ("Brand#2", 10, 30, 10, 30),
        ("Brand#3", 20, 50, 20, 40),
    ]

    def partial(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand")
        size = t.column("p_size").cast(pa.int64())
        qty = t.column("l_quantity")
        keep = None
        for b, s_lo, s_hi, q_lo, q_hi in CLAUSES:
            c = pc.and_(
                pc.and_(
                    pc.equal(brand, b),
                    pc.and_(
                        pc.greater_equal(size, s_lo),
                        pc.less_equal(size, s_hi),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, float(q_lo)),
                    pc.less_equal(qty, float(q_hi)),
                ),
            )
            keep = c if keep is None else pc.or_(keep, c)
        t = t.filter(keep)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_lineitems": pa.array([t.num_rows], pa.int64()),
                "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    out = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_lineitems", alias_name="n_lineitems"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    return pa.table(
        {
            "n_lineitems": pa.array(
                [int(out["n_lineitems"] or 0)], pa.int64()
            ),
            "revenue_cents": pa.array(
                [int(out["revenue_cents"] or 0)], pa.int64()
            ),
        }
    )


ORACLE_TPCH_Q19 = """
SELECT count(*) AS n_lineitems,
       CAST(coalesce(sum(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                    * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# wave 15: corpus forensics + attribution
# ---------------------------------------------------------------------------

_NOVELTY_W = 3


def _distinct_shingle_rows(t: pa.Table, W: int) -> pa.Table:
    """(doc_id, shingle) rows of per-doc DISTINCT word W-shingles as
    STRINGS (SQL-mirrorable, unlike the hashed ``_doc_shingles``):
    tokenize + flatten once, join W shifted views in one
    binary_join_element_wise call, mask windows crossing doc
    boundaries, then one Arrow group_by for the per-doc distinct."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
    )
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(ok))
    parent = parent[ok]
    n = len(flat)
    if n < W:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shingle": pa.array([], pa.string())}
        )
    views = [flat.slice(j, n - W + 1) for j in range(W)]
    sh = pc.binary_join_element_wise(*views, " ")
    valid = parent[: n - W + 1] == parent[W - 1 :]
    doc = pc.take(
        t.column("doc_id"), pa.array(parent[: n - W + 1], pa.int64())
    )
    out = pa.table({"doc_id": doc, "shingle": sh}).filter(pa.array(valid))
    return out.group_by(["doc_id", "shingle"]).aggregate([])


def q_shingle_novelty_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-document shingle novelty: of each doc's distinct word
    3-shingles, how many occur for the FIRST time in this doc (corpus
    first occurrence = min doc_id over the shingle)?  The redundancy-
    growth statistic of a training corpus — a stream whose novel
    fraction collapses is re-crawling itself.

    Distributed: distinct (doc, shingle) rows → shingle-keyed bucket
    exchange (each shingle's global min is computed in exactly ONE
    bucket, and per-doc totals are additive across buckets because a
    (doc, shingle) row lands in exactly one) → per-doc partials →
    doc-keyed sum.  No shingle string ever reaches the driver; the
    per-bucket pass is one Arrow sort + shifted-compare, no Python
    loop over runs."""
    from ..functions.window import keyed_window, segment_starts

    W = _NOVELTY_W
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rows(t: pa.Table) -> pa.Table:
        return _distinct_shingle_rows(t, W)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_shingles": pa.array([], pa.int64()),
                 "n_novel": pa.array([], pa.int64())}
            )
        g = g.sort_by(
            [("shingle", "ascending"), ("doc_id", "ascending")]
        )
        sh = g.column("shingle").combine_chunks()
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(doc)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sh.slice(1), sh.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        novel_docs = doc[starts]  # run head = min doc_id of the shingle
        ud, uc = np.unique(doc, return_counts=True)
        nd, nc = np.unique(novel_docs, return_counts=True)
        nov = np.zeros(len(ud), np.int64)
        nov[np.searchsorted(ud, nd)] = nc
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n_shingles": pa.array(uc.astype(np.int64), pa.int64()),
                "n_novel": pa.array(nov, pa.int64()),
            }
        )

    shingle_rows = ds.map_batches(
        rows, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = keyed_window(shingle_rows, "shingle", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        ns = g.column("n_shingles").to_numpy(zero_copy_only=False)
        nv = g.column("n_novel").to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="stable")
        did, ns, nv = did[order], ns[order], nv[order]
        starts = np.flatnonzero(segment_starts(did))
        return pa.table(
            {
                "doc_id": pa.array(did[starts], pa.int64()),
                "n_shingles": pa.array(
                    np.add.reduceat(ns, starts).astype(np.int64), pa.int64()
                ),
                "n_novel": pa.array(
                    np.add.reduceat(nv, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return keyed_window(partials, "doc_id", fold).sort("doc_id")


ORACLE_SHINGLE_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 2)
), firsts AS (
  SELECT shingle, min(doc_id) AS md FROM sh GROUP BY 1
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.md = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel
FROM sh s JOIN firsts f ON s.shingle = f.shingle
GROUP BY 1 ORDER BY doc_id
"""


def q_dup_rate_per_source(sf_dir: str) -> ray.data.Dataset:
    """Exact-duplicate rate per source: per source, total docs and how
    many are non-canonical copies (canonical = corpus-wide min doc_id
    per text sha) — the per-feed quality dial a crawl operator watches.

    Distributed: per-batch (sha, source) partials (min id + count) →
    sha-keyed bucket exchange → per-bucket attribution (the global-min
    holder is decided inside the single bucket that owns the sha) →
    tiny per-source sums.  All run math is reduceat; the source
    grouping inside a bucket is Arrow group_by."""
    from ..functions.dedup import add_text_sha
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_sha(t)
        return (
            t.select(["text_sha256", "source", "doc_id"])
            .group_by(["text_sha256", "source"])
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
            .rename_columns(["text_sha256", "source", "min_id", "cnt"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_dups": pa.array([], pa.int64())}
            )
        # combine batch partials of the same (sha, source) first
        g = (
            g.group_by(["text_sha256", "source"])
            .aggregate([("min_id", "min"), ("cnt", "sum")])
            .rename_columns(["text_sha256", "source", "min_id", "cnt"])
            .sort_by([("text_sha256", "ascending"), ("min_id", "ascending")])
        )
        sha = g.column("text_sha256").combine_chunks()
        mid = g.column("min_id").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        n = len(mid)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sha.slice(1), sha.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        run_id = np.cumsum(starts) - 1
        runmin = np.minimum.reduceat(mid, sidx)
        keeper = mid == runmin[run_id]  # exactly one row per run
        dups = cnt - keeper.astype(np.int64)
        return (
            pa.table(
                {
                    "source": g.column("source"),
                    "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
                    "n_dups": pa.array(dups.astype(np.int64), pa.int64()),
                }
            )
            .group_by("source")
            .aggregate([("n_docs", "sum"), ("n_dups", "sum")])
            .rename_columns(["source", "n_docs", "n_dups"])
        )

    bucketed = keyed_window(partials, "text_sha256", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("source")
            .aggregate([("n_docs", "sum"), ("n_dups", "sum")])
            .rename_columns(["source", "n_docs", "n_dups"])
        )

    return keyed_window(bucketed, "source", fold).sort("source")


ORACLE_DUP_RATE_SOURCE = """
WITH s AS (
  SELECT doc_id, source, sha256(text) AS sha FROM documents
), m AS (
  SELECT sha, min(doc_id) AS md FROM s GROUP BY 1
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.doc_id <> m.md THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dups
FROM s JOIN m ON s.sha = m.sha
GROUP BY 1 ORDER BY source
"""


def q_cross_source_overlap(sf_dir: str) -> pa.Table:
    """Cross-source contamination matrix: for every source pair, the
    number of distinct text shas present in BOTH — which feeds are
    re-crawling each other.  Distributed: distinct (sha, source) rows
    → sha-keyed buckets → per-bucket source BITMASKS per sha
    (bitwise_or.reduceat — sources are a tiny set, runs are never
    looped) → mask histogram → pairs expanded per distinct mask only.
    Driver sees ≤ buckets × sourcepairs rows."""
    from ..functions.dedup import add_text_sha
    from ..functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_sha(t)
        return (
            t.select(["text_sha256", "source"])
            .group_by(["text_sha256", "source"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source_a": pa.array([], pa.string()),
             "source_b": pa.array([], pa.string()),
             "n_shared": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        g = (
            g.group_by(["text_sha256", "source"])
            .aggregate([])
            .sort_by(
                [("text_sha256", "ascending"), ("source", "ascending")]
            )
        )
        sha = g.column("text_sha256").combine_chunks()
        src = np.asarray(g.column("source").to_pylist(), dtype=object)
        n = len(src)
        u, inv = np.unique(src, return_inverse=True)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sha.slice(1), sha.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        mask = np.left_shift(np.uint64(1), inv.astype(np.uint64))
        runmask = np.bitwise_or.reduceat(mask, sidx)
        um, uc = np.unique(runmask, return_counts=True)
        out_a, out_b, out_n = [], [], []
        for m, c in zip(um, uc):  # ≤ 2^|sources| distinct masks, tiny
            members = u[
                (m >> np.arange(len(u), dtype=np.uint64)) & np.uint64(1) == 1
            ]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    out_a.append(members[i])
                    out_b.append(members[j])
                    out_n.append(int(c))
        if not out_a:
            return empty
        return pa.table(
            {
                "source_a": pa.array(out_a, pa.string()),
                "source_b": pa.array(out_b, pa.string()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    out = keyed_window(partials, "text_sha256", per_bucket)
    tiny = _from_rows(
        out.take_all(),
        {"source_a": pa.string(), "source_b": pa.string(),
         "n_shared": pa.int64()},
    )
    return (
        tiny.group_by(["source_a", "source_b"])
        .aggregate([("n_shared", "sum")])
        .rename_columns(["source_a", "source_b", "n_shared"])
        .sort_by([("source_a", "ascending"), ("source_b", "ascending")])
    )


ORACLE_CROSS_SOURCE = """
WITH s AS (
  SELECT DISTINCT source, sha256(text) AS sha FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM s a JOIN s b ON a.sha = b.sha AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_session_length_histogram(sf_dir: str) -> ray.data.Dataset:
    """Distribution of session sizes (events per 30-min-gap session):
    the shape statistic behind engagement dashboards and the sanity
    check on any sessionizer change.  Composes the sessionization
    pipeline with a two-level count fold — the exchange carries one
    row per (n_events, block), never per session."""
    from ..functions.window import keyed_window, segment_starts

    sess = q_session_windows(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["n_events"])
            .group_by("n_events")
            .aggregate([("n_events", "count")])
            .rename_columns(["n_events", "n_sessions"])
        )

    partials = sess.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        k = g.column("n_events").to_numpy(zero_copy_only=False)
        c = g.column("n_sessions").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = np.flatnonzero(segment_starts(k))
        return pa.table(
            {
                "n_events": pa.array(k[starts], pa.int64()),
                "n_sessions": pa.array(
                    np.add.reduceat(c, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return keyed_window(partials, "n_events", fold).sort("n_events")


ORACLE_SESSION_HIST = f"""
SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions
FROM ({ORACLE_SESSIONS}) GROUP BY 1 ORDER BY n_events
"""


def q_daily_streaks_per_user(sf_dir: str) -> ray.data.Dataset:
    """Longest consecutive-active-day streak per user (plus total
    active days) — calendar gaps-and-islands, the retention metric
    every engagement product ships.  Distributed: per-batch distinct
    (user, day) → user-keyed buckets → one lexsort + re-distinct +
    run pass over ALL users of the bucket at once."""
    from ..functions.window import keyed_window

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            t.column("ts").cast(pa.int64()), pa.scalar(DAY_US, pa.int64())
        )
        return (
            pa.table({"user_id": t.column("user_id"), "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # re-distinct: the same (user, day) may arrive from many batches
        keep = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        n = len(uid)
        newseg = np.ones(n, dtype=bool)
        if n > 1:
            newseg[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        sstart = np.flatnonzero(newseg)
        slen = np.diff(np.concatenate((sstart, [n])))
        suid = uid[sstart]
        ustart = np.flatnonzero(
            np.concatenate(([True], suid[1:] != suid[:-1]))
        ) if len(suid) else np.zeros(0, np.int64)
        if not len(suid):
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_active_days": pa.array([], pa.int64()),
                 "max_streak": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "user_id": pa.array(suid[ustart], pa.int64()),
                "n_active_days": pa.array(
                    np.add.reduceat(slen, ustart).astype(np.int64),
                    pa.int64(),
                ),
                "max_streak": pa.array(
                    np.maximum.reduceat(slen, ustart).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return keyed_window(partials, "user_id", fold).sort("user_id")


ORACLE_DAILY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events
), i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM d
), s AS (
  SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY 1 ORDER BY user_id
"""


def q_first_touch_attribution(sf_dir: str) -> pa.Table:
    """First-touch attribution: each user's lifetime value (and the
    user count) attributed to the event type of their FIRST event
    (order by ts, event_id) — the acquisition-channel report.
    Distributed: per-batch per-user partials (first candidate +
    cents/count sums) → user-keyed merge (min-by-(ts, event_id) is
    associative) → per-type sums inside each bucket, so the driver
    sees ≤ buckets × types rows."""
    from ..functions.window import keyed_window

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tus = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tus, uid))
        uid_s, tus_s, eid_s = uid[order], tus[order], eid[order]
        ustart = np.ones(len(uid_s), dtype=bool)
        if len(uid_s) > 1:
            ustart[1:] = uid_s[1:] != uid_s[:-1]
        sidx = np.flatnonzero(ustart)
        ftype = pc.take(
            t.column("event_type"), pa.array(order[sidx], pa.int64())
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[sidx], pa.int64()),
                "f_tus": pa.array(tus_s[sidx], pa.int64()),
                "f_eid": pa.array(eid_s[sidx], pa.int64()),
                "f_type": ftype,
                "cents": pa.array(
                    np.add.reduceat(cents[order], sidx).astype(np.int64),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.diff(np.concatenate((sidx, [len(uid_s)]))).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        tus = g.column("f_tus").to_numpy(zero_copy_only=False)
        eid = g.column("f_eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        nn = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tus, uid))
        uid_s = uid[order]
        ustart = np.ones(len(uid_s), dtype=bool)
        if len(uid_s) > 1:
            ustart[1:] = uid_s[1:] != uid_s[:-1]
        sidx = np.flatnonzero(ustart)
        ftype = pc.take(
            g.column("f_type"), pa.array(order[sidx], pa.int64())
        )
        ucents = np.add.reduceat(cents[order], sidx)
        return (
            pa.table(
                {
                    "event_type": ftype,
                    "n_users": pa.array(
                        np.ones(len(sidx), np.int64), pa.int64()
                    ),
                    "sum_value_cents": pa.array(
                        ucents.astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by("event_type")
            .aggregate([("n_users", "sum"), ("sum_value_cents", "sum")])
            .rename_columns(["event_type", "n_users", "sum_value_cents"])
        )

    out = keyed_window(partials, "user_id", fold)
    tiny = _from_rows(
        out.take_all(),
        {"event_type": pa.string(), "n_users": pa.int64(),
         "sum_value_cents": pa.int64()},
    )
    return (
        tiny.group_by("event_type")
        .aggregate([("n_users", "sum"), ("sum_value_cents", "sum")])
        .rename_columns(["event_type", "n_users", "sum_value_cents"])
        .sort_by("event_type")
    )


ORACLE_FIRST_TOUCH = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), u AS (
  SELECT user_id,
         sum(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT r.event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(u.cents) AS BIGINT) AS sum_value_cents
FROM r JOIN u USING (user_id) WHERE rn = 1
GROUP BY 1 ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# wave 16: code-corpus preprocessing + corpus statistics
# ---------------------------------------------------------------------------


def q_fim_split_documents(sf_dir: str) -> ray.data.Dataset:
    """Fill-in-the-middle (FIM) transform — the code-LLM preprocessing
    step (north rule: source-code corpora): split each doc at two
    deterministic offsets into prefix/middle/suffix and emit the PSM
    reordering '<PRE>'+prefix+'<SUF>'+suffix+'<MID>'+middle as a
    sha256 (the payload itself stays in the lake; the sha proves the
    transform byte-for-byte).  Offsets are hash-of-id arithmetic so
    the oracle can mirror them exactly: a = (id*48271+11) % (n+1),
    b = a + (id*16807+7) % (n-a+1).

    Vectorization note: offset arithmetic is numpy over the whole
    batch; the per-row loop exists only for sha256 (hashlib has no
    batch API — the same inherent loop as ``sha256_hex``), and slices
    feed ``hashlib.update`` directly, no concat copies."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = pc.utf8_length(
            pc.fill_null(t.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        a = (did * 48271 + 11) % (n + 1)
        b = a + (did * 16807 + 7) % (n - a + 1)
        texts = t.column("text").to_pylist()
        shas = [
            hashlib.sha256(
                b"<PRE>" + s[:ai].encode() + b"<SUF>" + s[bi:].encode()
                + b"<MID>" + s[ai:bi].encode()
            ).hexdigest()
            for s, ai, bi in zip(texts, a.tolist(), b.tolist())
        ]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "p_len": pa.array(a, pa.int64()),
                "m_len": pa.array(b - a, pa.int64()),
                "s_len": pa.array(n - b, pa.int64()),
                "fim_sha256": pa.array(shas, pa.string()),
            }
        )

    return ds.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


ORACLE_FIM_SPLIT = """
WITH s AS (
  SELECT doc_id, text, length(text) AS n,
         (doc_id * 48271 + 11) % (length(text) + 1) AS a
  FROM documents
), s2 AS (
  SELECT doc_id, text, n, a,
         a + ((doc_id * 16807 + 7) % (n - a + 1)) AS b
  FROM s
)
SELECT doc_id,
       CAST(a AS BIGINT) AS p_len,
       CAST(b - a AS BIGINT) AS m_len,
       CAST(n - b AS BIGINT) AS s_len,
       sha256('<PRE>' || substr(text, 1, CAST(a AS INT)) || '<SUF>' ||
              substr(text, CAST(b + 1 AS INT)) || '<MID>' ||
              substr(text, CAST(a + 1 AS INT), CAST(b - a AS INT)))
         AS fim_sha256
FROM s2 ORDER BY doc_id
"""


def q_vocab_richness_per_source(sf_dir: str) -> ray.data.Dataset:
    """Vocabulary richness per source: total token count and DISTINCT
    token count (types) — the type/token ratio inputs that flag
    template-generated or looping feeds.  Distributed COUNT(DISTINCT)
    per group: per-batch (token, source, cnt) partials → token-keyed
    bucket exchange (a token's rows land in ONE bucket, so per-bucket
    distinct counts are additive) → per-source sums."""
    from ..functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ok = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(ok)
        src = pc.take(t.column("source"), parent.filter(ok))
        return (
            pa.table({"tok": flat, "source": src})
            .group_by(["tok", "source"])
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "source", "cnt"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = (
            g.group_by(["tok", "source"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["tok", "source", "cnt"])
        )
        # one row per (token, source) now: types = row count per source
        return (
            pa.table(
                {
                    "source": g.column("source"),
                    "n_tokens": g.column("cnt").cast(pa.int64()),
                    "n_types": pa.array(
                        np.ones(g.num_rows, np.int64), pa.int64()
                    ),
                }
            )
            .group_by("source")
            .aggregate([("n_tokens", "sum"), ("n_types", "sum")])
            .rename_columns(["source", "n_tokens", "n_types"])
        )

    bucketed = keyed_window(partials, "tok", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("source")
            .aggregate([("n_tokens", "sum"), ("n_types", "sum")])
            .rename_columns(["source", "n_tokens", "n_types"])
        )

    return keyed_window(bucketed, "source", fold).sort("source")


ORACLE_VOCAB_RICHNESS = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_extract_all(lower(text), '\w+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types
FROM toks GROUP BY 1 ORDER BY source
"""


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


def q_pmi_collocations(sf_dir: str) -> pa.Table:
    """Top-20 collocations by pointwise mutual information over word
    bigrams: PMI = ln(c_ab·N / (c_a·c_b)), candidates capped at
    c_ab ≥ 5 — the corpus-statistics primitive behind phrase mining
    and tokenizer-merge seeding.

    Distributed: bigram partial counts → bigram-keyed fold; unigram
    partial counts → token-keyed fold; unigram counts attach to each
    bigram side through the generic pair↔value exchange
    (``attach_pair_values`` — values move ONCE, no driver dict);
    N is the one scalar on the driver.  Final top-k: per-block
    partial top-20 → driver merges ≤ 20·blocks rows.  Selection is
    deterministic: (pmi, w1, w2) with integer counts underneath."""
    from ..functions.exchange import attach_pair_values
    from ..functions.hashing import key_hash64
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["text"])

    def _flat_tokens(t: pa.Table):
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(ok)), parent[ok]

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t)
        return (
            pa.table({"tok": flat})
            .group_by("tok")
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "c"])
        )

    def uni_fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("tok")
            .aggregate([("c", "sum")])
            .rename_columns(["tok", "c"])
        )

    unigrams = keyed_window(
        ds.map_batches(
            uni_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "tok",
        uni_fold,
    )
    n_tokens = int(unigrams.aggregate(Sum("c", alias_name="c"))["c"] or 0)

    def big_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c_ab": pa.array([], pa.int64()),
                 "__k": pa.array([], pa.string())}
            )
        w1 = flat.slice(0, n - 1)
        w2 = flat.slice(1, n - 1)
        valid = parent[: n - 1] == parent[1:]
        g = (
            pa.table({"w1": w1, "w2": w2})
            .filter(pa.array(valid))
            .group_by(["w1", "w2"])
            .aggregate([("w1", "count")])
            .rename_columns(["w1", "w2", "c_ab"])
        )
        return g.append_column(
            "__k",
            pc.binary_join_element_wise(g.column("w1"), g.column("w2"), " "),
        )

    def big_fold(g: pa.Table) -> pa.Table:
        g = (
            g.group_by(["w1", "w2"])
            .aggregate([("c_ab", "sum")])
            .rename_columns(["w1", "w2", "c_ab"])
        )
        return g.filter(
            pc.greater_equal(g.column("c_ab"), _PMI_MIN_COUNT)
        )

    bigrams = keyed_window(
        ds.map_batches(
            big_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "__k",
        big_fold,
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array(
                    key_hash64(t.column("w1")).astype(np.int64), pa.int64()
                ),
                "id_b": pa.array(
                    key_hash64(t.column("w2")).astype(np.int64), pa.int64()
                ),
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c_ab": t.column("c_ab").cast(pa.int64()),
            }
        )

    def to_values(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    key_hash64(t.column("tok")).astype(np.int64), pa.int64()
                ),
                "c": t.column("c").cast(pa.int64()),
            }
        )

    pairs = bigrams.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    values = unigrams.map_batches(
        to_values, batch_format="pyarrow", zero_copy_batch=True
    )
    attached = attach_pair_values(
        pairs,
        values,
        value_col="c",
        value_type=pa.int64(),
        carry_cols=("w1", "w2", "c_ab"),
        carry_types={"w1": pa.string(), "w2": pa.string(),
                     "c_ab": pa.int64()},
    )

    def topk_partial(t: pa.Table) -> pa.Table:
        c_ab = t.column("c_ab").to_numpy(zero_copy_only=False)
        c_a = t.column("value_a").to_numpy(zero_copy_only=False)
        c_b = t.column("value_b").to_numpy(zero_copy_only=False)
        # operation order mirrors the oracle exactly:
        # (double(c_ab) * N) / (double(c_a) * double(c_b))
        pmi = np.log(
            (c_ab.astype(np.float64) * np.float64(n_tokens))
            / (c_a.astype(np.float64) * c_b.astype(np.float64))
        )
        t = pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c_ab": pa.array(c_ab.astype(np.int64), pa.int64()),
                "c_a": pa.array(c_a.astype(np.int64), pa.int64()),
                "c_b": pa.array(c_b.astype(np.int64), pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )
        return t.sort_by(
            [("pmi", "descending"), ("w1", "ascending"),
             ("w2", "ascending")]
        ).slice(0, _PMI_TOP_K)

    tops = attached.map_batches(
        topk_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tiny = _from_rows(
        tops.take_all(),
        {"w1": pa.string(), "w2": pa.string(), "c_ab": pa.int64(),
         "c_a": pa.int64(), "c_b": pa.int64(), "pmi": pa.float64()},
    )
    return tiny.sort_by(
        [("pmi", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    ).slice(0, _PMI_TOP_K)


ORACLE_PMI = r"""
WITH toks AS (
  SELECT doc_id, i AS pos, ts[CAST(i AS INT)] AS w
  FROM (SELECT doc_id,
               list_filter(regexp_extract_all(lower(text), '\w+'),
                           x -> length(x) > 0) AS ts
        FROM documents)
  JOIN range(1, 4096) t(i) ON t.i <= len(ts)
), big AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2 HAVING count(*) >= 5
), uni AS (
  SELECT w, count(*) AS c FROM toks GROUP BY 1
), n AS (SELECT count(*) AS nt FROM toks)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(ua.c AS BIGINT) AS c_a, CAST(ub.c AS BIGINT) AS c_b,
       ln((CAST(c_ab AS DOUBLE) * nt)
          / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))) AS pmi
FROM big JOIN uni ua ON ua.w = big.w1
         JOIN uni ub ON ub.w = big.w2, n
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def q_langid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Language-ID confusion matrix: labeled ``lang`` vs the n-gram
    classifier's ``lang_pred`` — the evaluation table any curation
    run publishes next to its lang filter.  Per-batch (lang,
    lang_pred, n) partials (≤ L² rows each) → tiny keyed fold."""
    from ..functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        t = lang_id(t)
        return (
            t.select(["lang", "lang_pred"])
            .group_by(["lang", "lang_pred"])
            .aggregate([("lang", "count")])
            .rename_columns(["lang", "lang_pred", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by(["lang", "lang_pred"])
            .aggregate([("n", "sum")])
            .rename_columns(["lang", "lang_pred", "n"])
        )

    return keyed_window(partials, "lang", fold).sort(
        ["lang", "lang_pred"]
    )


ORACLE_LANG_CONFUSION = f"""
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM ({ORACLE_LANG_ID}) GROUP BY 1, 2 ORDER BY 1, 2
"""

# ---------------------------------------------------------------------------
# wave 17: Gopher repetition rules + point-in-time interval probe
# ---------------------------------------------------------------------------

def q_gopher_repetition_documents(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style within-document repetition filters (Rae et al.
    2021 §A1.1, public paper): per doc, the count of its most frequent
    unigram (``top_unigram_n`` — the paper's "fraction of characters
    in the most common n-gram" rule, a doc dominated by one token is
    boilerplate) and the number of duplicated word BIGRAMS
    (``n_dup_bigrams`` = total − distinct — the duplicate-2-gram rule;
    `repetition_stats_documents` covers the sibling 4-gram rule of the
    same published rule set, and `gopher_quality_documents` the
    non-repetition rules).  All-integer output so the parity hash is
    exact; the ratios a filter would threshold are
    numerator/denominator of these columns.

    Distributed shape: embarrassingly parallel — each doc's text is
    one row, so every statistic completes inside its batch; NO
    exchange at any scale.  Per-batch math is one tokenize, two Arrow
    group_bys and bincounts — no Python loop over docs."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        flat = flat.filter(pa.array(ok))
        parent = parent[ok]
        nrows = t.num_rows
        n_tokens = np.bincount(parent, minlength=nrows).astype(np.int64)
        # most-frequent-unigram count per doc
        top_n = np.zeros(nrows, np.int64)
        if len(flat):
            ucnt = (
                pa.table({"p": pa.array(parent, pa.int64()), "tok": flat})
                .group_by(["p", "tok"])
                .aggregate([("tok", "count")])
            )
            pm = ucnt.column("p").to_numpy(zero_copy_only=False)
            cm = ucnt.column("tok_count").to_numpy(zero_copy_only=False)
            np.maximum.at(top_n, pm, cm)
        # bigrams: windows of 2 not crossing doc boundaries
        n_bigrams = np.maximum(n_tokens - 1, 0)
        n_distinct_bg = np.zeros(nrows, np.int64)
        n = len(flat)
        if n >= 2:
            sh = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1, n - 1), " "
            )
            valid = parent[: n - 1] == parent[1:]
            bg = pa.table(
                {"p": pa.array(parent[: n - 1], pa.int64()), "sh": sh}
            ).filter(pa.array(valid))
            if bg.num_rows:
                dist = (
                    bg.group_by(["p", "sh"])
                    .aggregate([])
                    .group_by("p")
                    .aggregate([("sh", "count")])
                )
                pm = dist.column("p").to_numpy(zero_copy_only=False)
                cm = dist.column("sh_count").to_numpy(zero_copy_only=False)
                n_distinct_bg[pm] = cm
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "top_unigram_n": pa.array(top_n, pa.int64()),
                "n_bigrams": pa.array(n_bigrams.astype(np.int64), pa.int64()),
                "n_dup_bigrams": pa.array(
                    (n_bigrams - n_distinct_bg).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


ORACLE_GOPHER_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), uni AS (
  SELECT doc_id, ts[i] AS tok
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= len(ts)
), ucnt AS (
  SELECT doc_id, tok, count(*) AS c FROM uni GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, max(c) AS top_unigram_n FROM ucnt GROUP BY 1
), bg AS (
  SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS sh
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 1)
), bgd AS (
  SELECT doc_id, count(DISTINCT sh) AS n_distinct, count(*) AS n_total
  FROM bg GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(d.ts) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.top_unigram_n, 0) AS BIGINT) AS top_unigram_n,
       CAST(COALESCE(b.n_total, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(b.n_total - b.n_distinct, 0) AS BIGINT)
         AS n_dup_bigrams
FROM toks d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN bgd b USING (doc_id)
ORDER BY doc_id
"""

#: decontamination shingle width (GPT-3 App. C uses 13-gram overlap on
#: real corpora; the synthetic fixture docs are ~30 tokens, so 5 keeps
#: the statistic non-degenerate at every sf)
#: point-in-time probe sequence numbers (spanning both live epochs and
#: the post-stream horizon; the orphaned range sits inside epoch 2)
_PIT_PROBES = (50_000, 150_000, 250_000)


def q_pit_live_versions(sf_dir: str) -> pa.Table:
    """Point-in-time interval probe over the SCD2 history (the
    interval-join company of `scd2_history`): for each probe sequence
    number, how many (repo, path) versions were LIVE at that instant —
    commit_seq ≤ probe < valid_to (open = ∞) and not a delete.  The
    "how many files existed at commit X" audit query.

    Distributed shape: one key-hash bucket exchange builds validity
    intervals (same kernel as scd2_history); each bucket then answers
    ALL probes with vectorized interval tests and emits ≤ |probes|
    partial counts — the driver folds ≤ buckets × probes integers."""
    from ..functions.hashing import key_hash64
    from ..functions.window import lead_one, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "op"],
    ).map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = key_hash64(t.column("repo"), t.column("path"))
        return t.append_column(
            "__b", pa.array((h % np.uint64(32)).astype(np.int64), pa.int64())
        )

    probes = np.asarray(_PIT_PROBES, np.int64)

    def live_counts(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        key = pc.binary_join_element_wise(
            g.column("repo"), g.column("path"), "\x00"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        codes = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, codes))
        codes_s, seq_s = codes[order], seq[order]
        starts = segment_starts(codes_s)
        led, valid = lead_one(seq_s, starts)
        op = (
            g.column("op").take(pa.array(order, pa.int64()))
            .to_numpy(zero_copy_only=False)
        )
        alive = op != "delete"
        counts = np.empty(len(probes), np.int64)
        for j, s in enumerate(probes):  # |probes| iterations, not rows
            open_or_after = ~valid | (led > s)
            counts[j] = int(np.sum((seq_s <= s) & open_or_after & alive))
        return pa.table(
            {
                "probe_seq": pa.array(probes, pa.int64()),
                "n_live": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(live_counts, batch_format="pyarrow")
    )
    rows = partials.take_all()  # ≤ buckets × probes rows
    acc = {int(s): 0 for s in probes}
    for r in rows:
        acc[int(r["probe_seq"])] += int(r["n_live"])
    return pa.table(
        {
            "probe_seq": pa.array(sorted(acc), pa.int64()),
            "n_live": pa.array(
                [acc[s] for s in sorted(acc)], pa.int64()
            ),
        }
    )


ORACLE_PIT_LIVE = f"""
WITH {_EV_CTE},
v AS (
  SELECT repo, path, commit_seq, op,
         lead(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq) AS valid_to_seq
  FROM eff
),
p AS (SELECT CAST(UNNEST([{", ".join(str(s) for s in _PIT_PROBES)}]) AS BIGINT)
        AS probe_seq)
SELECT p.probe_seq,
       CAST(count(*) FILTER (
         WHERE v.commit_seq <= p.probe_seq
           AND (v.valid_to_seq IS NULL OR v.valid_to_seq > p.probe_seq)
           AND v.op <> 'delete'
       ) AS BIGINT) AS n_live
FROM p CROSS JOIN v
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# wave 18: interval-overlap join over SCD2 validity intervals
# ---------------------------------------------------------------------------

def q_concurrent_versions_per_repo(sf_dir: str) -> ray.data.Dataset:
    """Interval-OVERLAP join over the SCD2 validity intervals (the
    interval-join family member `pit_live_versions`' point probe and
    `asof_join_clicks_views`' as-of don't cover): per repo, how many
    PAIRS of live versions (different paths — same-path versions chain
    and never overlap) had intersecting validity windows, plus the
    peak number of simultaneously-live versions.  The concurrent-edit
    / contention audit of a CDC lake.

    Distributed shape: the quadratic overlap join is never
    materialized — one repo-keyed bucket exchange, then TWO classic
    sweeps, both vectorized across ALL repos of the bucket at once by
    lifting (repo_code, seq) into a single composite key space:
    overlap pairs = C(n,2) − disjoint pairs via one global
    searchsorted of starts into sorted ends (half-open intervals make
    each disjoint pair counted exactly once), and peak concurrency =
    max of a per-segment running boundary sum (±1 deltas, ends sorted
    before starts at ties).  O(n log n) per bucket, no per-repo Python
    loop, driver sees one row per repo."""
    from ..functions.window import keyed_window, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "op"],
    ).map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    #: composite-key stride: seqs are < 2^22 here; 2^40 keeps every
    #: repo's (start, end) range disjoint in one sortable axis
    B = np.int64(1) << np.int64(40)
    INF = B - np.int64(1)  # open interval: "end of this repo's range"

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..functions.window import lead_one

        empty = pa.table(
            {"repo": pa.array([], pa.string()),
             "n_versions": pa.array([], pa.int64()),
             "n_overlap_pairs": pa.array([], pa.int64()),
             "peak_concurrent": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        key = pc.binary_join_element_wise(
            g.column("repo"), g.column("path"), "\x00"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        codes = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, codes))
        codes_s, seq_s = codes[order], seq[order]
        starts_m = segment_starts(codes_s)
        led, has_next = lead_one(seq_s, starts_m)
        op = (
            g.column("op").take(pa.array(order, pa.int64()))
            .to_numpy(zero_copy_only=False)
        )
        repo = (
            g.column("repo").take(pa.array(order, pa.int64()))
            .combine_chunks()
        )
        live = op != "delete"
        if not live.any():
            return empty
        rvocab = pa.array(sorted(pc.unique(repo).to_pylist()))
        rcode = pc.index_in(repo, value_set=rvocab).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lo = seq_s[live].astype(np.int64) + rcode[live] * B
        hi = np.where(has_next[live], led[live], INF).astype(np.int64) + (
            rcode[live] * B
        )
        rc = rcode[live]
        n_repos = len(rvocab)
        n_per = np.bincount(rc, minlength=n_repos).astype(np.int64)
        # --- overlap pairs: C(n,2) − disjoint (end_j ≤ start_i) ---
        hi_sorted = np.sort(hi)
        # ends belonging to earlier repos, per interval
        before = np.searchsorted(hi_sorted, rc * B, side="left")
        disjoint_i = np.searchsorted(hi_sorted, lo, side="right") - before
        disjoint = np.bincount(rc, weights=disjoint_i, minlength=n_repos)
        pairs = n_per * (n_per - 1) // 2 - disjoint.astype(np.int64)
        # --- peak concurrency: per-repo running ±1 boundary sum ---
        closed = hi % B != INF
        ev_seq = np.concatenate([lo, hi[closed]])
        ev_d = np.concatenate(
            [np.ones(len(lo), np.int64), -np.ones(int(closed.sum()), np.int64)]
        )
        ev_rc = np.concatenate([rc, rc[closed]])
        eorder = np.lexsort((ev_d, ev_seq))  # ends (−1) before starts at ties
        ev_rc = ev_rc[eorder]
        run = np.cumsum(ev_d[eorder])
        seg = segment_starts(ev_rc)  # composite keys keep repos contiguous
        idx = np.flatnonzero(seg)
        base = np.where(idx > 0, run[idx - 1], 0)
        run = run - np.repeat(base, np.diff(np.append(idx, len(run))))
        peak = np.maximum.reduceat(run, idx).astype(np.int64)
        peak_rc = ev_rc[idx]
        peak_per = np.zeros(n_repos, np.int64)
        peak_per[peak_rc] = peak
        return pa.table(
            {
                "repo": rvocab,
                "n_versions": pa.array(n_per, pa.int64()),
                "n_overlap_pairs": pa.array(pairs, pa.int64()),
                "peak_concurrent": pa.array(peak_per, pa.int64()),
            }
        )

    return keyed_window(ds, "repo", per_bucket).sort("repo")


ORACLE_CONCURRENT_VERSIONS = f"""
WITH {_EV_CTE},
v AS (
  SELECT repo, path, commit_seq, op,
         lead(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq) AS valid_to_seq
  FROM eff
),
lv AS (SELECT * FROM v WHERE op <> 'delete'),
pairs AS (
  SELECT a.repo, count(*) AS n_overlap_pairs
  FROM lv a JOIN lv b
    ON a.repo = b.repo AND a.commit_seq < b.commit_seq
   AND (a.valid_to_seq IS NULL OR a.valid_to_seq > b.commit_seq)
  GROUP BY 1
),
bounds AS (
  SELECT repo, commit_seq AS s, 1 AS d FROM lv
  UNION ALL
  SELECT repo, valid_to_seq AS s, -1 AS d FROM lv
  WHERE valid_to_seq IS NOT NULL
),
run AS (
  SELECT repo, sum(d) OVER (
    PARTITION BY repo ORDER BY s, d ROWS UNBOUNDED PRECEDING) AS c
  FROM bounds
),
peak AS (SELECT repo, max(c) AS peak_concurrent FROM run GROUP BY 1),
nv AS (SELECT repo, count(*) AS n_versions FROM lv GROUP BY 1)
SELECT nv.repo,
       CAST(nv.n_versions AS BIGINT) AS n_versions,
       CAST(COALESCE(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs,
       CAST(pk.peak_concurrent AS BIGINT) AS peak_concurrent
FROM nv
LEFT JOIN pairs p USING (repo)
JOIN peak pk USING (repo)
ORDER BY repo
"""


def q_window_range_trailing(sf_dir: str) -> ray.data.Dataset:
    """SQL RANGE frame — the TIME-interval window the ROWS-frame
    family (`window_lead_moving`'s mov3) can't express: per event, the
    count and cents-sum of the SAME user's events in the trailing ONE
    HOUR by timestamp (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW).  RANGE semantics are matched exactly: the frame ends
    at the current row's last PEER, so equal-ts events of a user see
    each other regardless of tie order (closed-interval searchsorted
    on ts gives precisely that set).

    One keyed bucket exchange; inside the bucket
    ``range_frame_bounds`` answers BOTH frame bounds for every row of
    every user with two global searchsorteds over a per-segment
    offset-lifted time axis (inter-user gaps > window keep probes
    inside their segment; the lift chunks itself on int64 overflow) —
    no per-user loop, and one prefix sum turns bounds into sums."""
    from ..functions.window import keyed_window, range_frame_bounds

    HOUR_US = np.int64(3_600_000_000)
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        lo, hi = range_frame_bounds(ts, starts, HOUR_US)
        csum = np.concatenate(([np.int64(0)], np.cumsum(cents)))
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "w1h_n": pa.array(hi - lo, pa.int64()),
                "w1h_sum_cents": pa.array(csum[hi] - csum[lo], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RANGE = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS w1h_n,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS w1h_sum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_quantiles_cont_per_user(sf_dir: str) -> ray.data.Dataset:
    """EXACT per-user INTERPOLATED quantiles (SQL ``quantile_cont`` /
    PERCENTILE_CONT p25/p50/p75) — the linear-interpolation complement
    of `quantiles_value_per_user`'s discrete gather.  Float parity is
    made bit-exact by integerizing the interpolation itself: with
    q = k/4, h = q*(n-1) has 4h integer, so 4x the interpolated value
    is the INTEGER c_lo*(4-r) + c_hi*r (r = 4h mod 4) — emitted as
    quarter-cents, and the oracle's quantile_cont(cents)*4 is exact in
    double because every term is a multiple of 0.25 below 2^55.

    Same distributed shape as the discrete path: one keyed bucket
    exchange, one lexsort per bucket, two gathers per quantile."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid, cents = uid[order], cents[order]
        start_idx = np.flatnonzero(segment_starts(uid))
        counts = np.diff(np.append(start_idx, len(uid)))
        cols = {"user_id": pa.array(uid[start_idx], pa.int64())}
        for k, nm in ((1, "p25_qc"), (2, "p50_qc"), (3, "p75_qc")):
            h4 = k * (counts - 1)  # 4*(q*(n-1)), exact integer
            r = h4 % 4
            lo = cents[start_idx + h4 // 4]
            hi = cents[start_idx + (h4 + 3) // 4]
            cols[nm] = pa.array(lo * (4 - r) + hi * r, pa.int64())
        return pa.table(cols)

    return keyed_window(ds, "user_id", fn)


ORACLE_QUANTILES_CONT = """
SELECT user_id,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.25) * 4)
       AS BIGINT) AS p25_qc,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.50) * 4)
       AS BIGINT) AS p50_qc,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.75) * 4)
       AS BIGINT) AS p75_qc
FROM events GROUP BY user_id
"""


def q_audience_matrix(sf_dir: str) -> pa.Table:
    """Audience segmentation matrix over HIGH-VALUE interactions
    (value > 200 — the whale-behavior band; the unfiltered matrix is
    degenerate on dense streams where every user touches every type):
    for every ordered event-type pair (done, missing), how many
    distinct users did `done` but NEVER did `missing`.  The
    did-X-not-Y query is the classic self-anti-join trap (|T|^2
    correlated NOT EXISTS subqueries); here it costs ONE user-keyed
    exchange total: each bucket folds its users' distinct types into
    per-user BITMASKS (bitwise_or.reduceat — the
    `cross_source_overlap` kernel), emits (mask, n_users) rows bounded
    by distinct masks <= 2^|T|, and the driver expands the tiny mask
    histogram into the |T|^2 matrix.  Assumes a bounded event-type
    taxonomy (|T| <= 63 — enum-like CDC op/type vocabularies), asserted
    at run time; the global vocabulary comes from a distinct pass so a
    type absent from a bucket still counts as 'never did' there."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"]) \
        .map_batches(
            lambda t: t.filter(
                pc.greater(t.column("value"), pa.scalar(200.0))
            ).select(["user_id", "event_type"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    types = sorted(ds.unique("event_type"))
    if len(types) > 63:
        raise ValueError("audience_matrix assumes |event types| <= 63")
    vocab = pa.array(types, pa.string())

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        code = pc.index_in(
            g.column("event_type").combine_chunks(), value_set=vocab
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, uid))
        uid, code = uid[order], code[order]
        idx = np.flatnonzero(segment_starts(uid))
        masks = np.bitwise_or.reduceat(np.int64(1) << code, idx)
        um, cnt = np.unique(masks, return_counts=True)
        return pa.table(
            {"mask": pa.array(um, pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    rows = keyed_window(ds, "user_id", fn).take_all()
    agg: dict[int, int] = {}
    for r in rows:  # <= buckets x distinct masks — tiny driver fold
        agg[r["mask"]] = agg.get(r["mask"], 0) + r["n"]
    T = len(types)
    out = np.zeros((T, T), np.int64)
    for mask, n in agg.items():
        done = np.flatnonzero((mask >> np.arange(T)) & 1)
        miss = np.flatnonzero(~(mask >> np.arange(T)) & 1)
        if len(done) and len(miss):
            out[np.repeat(done, len(miss)), np.tile(miss, len(done))] += n
    d, m = np.nonzero(out)
    return pa.table(
        {
            "done_type": pa.array([types[i] for i in d], pa.string()),
            "missing_type": pa.array([types[j] for j in m], pa.string()),
            "n_users": pa.array(out[d, m], pa.int64()),
        }
    ).sort_by([("done_type", "ascending"), ("missing_type", "ascending")])


ORACLE_AUDIENCE_MATRIX = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
            WHERE value > 200),
tys AS (SELECT DISTINCT event_type FROM events WHERE value > 200)
SELECT a.event_type AS done_type, t.event_type AS missing_type,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM ut a CROSS JOIN tys t
WHERE NOT EXISTS (
  SELECT 1 FROM ut b
  WHERE b.user_id = a.user_id AND b.event_type = t.event_type
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_bfs_hops(sf_dir: str) -> pa.Table:
    """Distributed multi-source BFS over the exact Jaccard >= 0.5 pair
    graph: per document in any pair, its HOP DISTANCE to the
    component's canonical representative (the min doc_id that
    `jaccard_clusters` elects) — the lineage-depth diagnostic for
    near-dup clusters (hops == how many near-dup steps separate a doc
    from its cluster exemplar; a deep chain is drift, hops 1 from a
    star center is a template).

    Third iterative-family member after `pagerank_parts` and the
    hash-to-min components: seeds = component minima from
    `connected_components_ds`, then level-synchronous frontier
    expansion (`functions/graph.py::bfs_hops`) — one bucketed hash
    join + groupby-min + anti-join per round, rounds = graph diameter.
    Oracle: the jaccard_clusters recursive min-label CTE extended with
    a shortest-path walk (UNION-dedup'd (node, depth) states, depth
    capped at 64 like the engine's max_iters)."""
    from ..functions.dedup import connected_components_ds
    from ..functions.graph import bfs_hops

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed twice: component labels + edge list
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "hops": pa.array([], pa.int64())}
    )
    if pairs.count() == 0:
        return empty
    comps = connected_components_ds(pairs)
    seeds = comps.map_batches(
        lambda t: (lambda f: pa.table(
            {"node": f.column("doc_id").cast(pa.int64()),
             "hops": pa.array(np.zeros(f.num_rows, np.int64), pa.int64())}
        ))(t.filter(pc.equal(t.column("doc_id"), t.column("cluster_id")))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"src": pa.concat_arrays(
                [t.column("id_a").cast(pa.int64()).combine_chunks(),
                 t.column("id_b").cast(pa.int64()).combine_chunks()]),
             "dst": pa.concat_arrays(
                [t.column("id_b").cast(pa.int64()).combine_chunks(),
                 t.column("id_a").cast(pa.int64()).combine_chunks()])}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    rows = bfs_hops(edges, seeds).take_all()
    if not rows:
        return empty
    return pa.Table.from_pylist(
        [{"doc_id": r["node"], "hops": r["hops"]} for r in rows]
    ).sort_by("doc_id")


ORACLE_BFS_HOPS = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, k.comp FROM walk k JOIN edges e ON e.u = k.id
  WHERE k.comp < e.v
),
comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
bfs(id, d) AS (
  SELECT id, 0 FROM comps WHERE id = comp
  UNION
  SELECT e.v, b.d + 1 FROM bfs b JOIN edges e ON e.u = b.id
  WHERE b.d < 64
)
SELECT id AS doc_id, CAST(min(d) AS BIGINT) AS hops FROM bfs GROUP BY id
ORDER BY doc_id
"""


def q_version_churn_per_path(sf_dir: str) -> ray.data.Dataset:
    """Code-churn analytics over the CDC stream itself — per (repo,
    path): how much each upsert CHANGED the content, as the exact
    token-overlap sums across consecutive version pairs (sum_inter /
    sum_union over all adjacent pairs; 1 - inter/union is the mean
    Jaccard churn).  The content-evolution-rate signal a code-corpus
    lake needs (a path whose versions share no tokens is a rewrite; a
    near-1 overlap stream is comment noise) — and the reference's
    sync loop has nothing like it because it never compares adjacent
    versions (src/ch_eth/sync.rs applies them blindly).

    One (repo,path)-keyed bucket exchange; inside the bucket the
    version-pair set intersections are computed WITHOUT per-pair work:
    every version's tokens flatten into one stream (Arrow RE2 split),
    one Arrow sort by (token, version-position) groups each token's
    version list, and two shifted compares find (a) duplicate tokens
    within a version (dedup to DISTINCT) and (b) adjacent-rank hits —
    a token in versions r and r+1 of the same key is exactly one
    adjacent pair in that sorted order.  Per-version bincounts +
    per-key reduceat fold the pair sums; no loop over pairs, keys, or
    versions."""
    from ..functions.text import token_strings
    from ..functions.window import keyed_window, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.not_equal(t.column("op"), pa.scalar("delete")),
                pc.or_(
                    pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                    pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
                ),
            )
        )
        return f.append_column(
            "__k",
            pc.binary_join_element_wise(
                f.column("repo"), f.column("path"), "\x00"
            ),
        )

    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "content", "op"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    _EMPTY = pa.table(
        {"repo": pa.array([], pa.string()),
         "path": pa.array([], pa.string()),
         "n_versions": pa.array([], pa.int64()),
         "sum_inter": pa.array([], pa.int64()),
         "sum_union": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY
        key = g.column("__k").combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        kcode = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, kcode))
        kcode = kcode[order]
        take = pa.array(order, pa.int64())
        content = g.column("content").take(take)
        starts = segment_starts(kcode)
        start_idx = np.flatnonzero(starts)
        V = len(kcode)
        nv = np.diff(np.append(start_idx, V))
        flat, vidx = token_strings(content)
        n_v = np.zeros(V, np.int64)
        inter_v = np.zeros(V, np.int64)
        if len(vidx):
            tt = pa.table(
                {"tok": flat, "v": pa.array(vidx, pa.int64())}
            )
            si = pc.sort_indices(
                tt,
                sort_keys=[("tok", "ascending"), ("v", "ascending")],
            )
            tok_s = tt.column("tok").take(si).combine_chunks()
            v_s = tt.column("v").take(si).to_numpy(zero_copy_only=False)
            n = len(v_s)
            same_tok = np.zeros(n, bool)
            if n > 1:
                same_tok[1:] = pc.equal(
                    tok_s.slice(1), tok_s.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            run_id = np.cumsum(~same_tok)
            dup = np.zeros(n, bool)
            if n > 1:
                dup[1:] = same_tok[1:] & (v_s[1:] == v_s[:-1])
            rid, vD = run_id[~dup], v_s[~dup]
            n_v = np.bincount(vD, minlength=V).astype(np.int64)
            if len(vD) > 1:
                adj = (
                    (rid[1:] == rid[:-1])
                    & (vD[1:] == vD[:-1] + 1)
                    & (kcode[vD[1:]] == kcode[vD[:-1]])
                )
                inter_v = np.bincount(
                    vD[:-1][adj], minlength=V
                ).astype(np.int64)
        not_last = np.ones(V, bool)
        not_last[np.append(start_idx[1:], V) - 1] = False
        not_first = ~starts
        sum_inter = np.add.reduceat(inter_v, start_idx)
        sum_union = (
            np.add.reduceat(
                n_v * not_last.astype(np.int64)
                + n_v * not_first.astype(np.int64),
                start_idx,
            )
            - sum_inter
        )
        keep = nv >= 2
        first = pa.array(start_idx[keep], pa.int64())
        return pa.table(
            {
                "repo": g.column("repo").take(take).take(first),
                "path": g.column("path").take(take).take(first),
                "n_versions": pa.array(nv[keep], pa.int64()),
                "sum_inter": pa.array(sum_inter[keep], pa.int64()),
                "sum_union": pa.array(sum_union[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "__k", fn)


ORACLE_VERSION_CHURN = rf"""
WITH {_EV_CTE},
up AS (
  SELECT repo, path, commit_seq, lower(content) AS c
  FROM eff WHERE op <> 'delete'
),
r AS (
  SELECT repo, path,
         CAST(row_number() OVER (
           PARTITION BY repo, path ORDER BY commit_seq) - 1 AS BIGINT)
           AS rk,
         c
  FROM up
),
tok AS (
  SELECT DISTINCT repo, path, rk, t
  FROM r, UNNEST(regexp_extract_all(c, '\w+')) AS u(t)
),
sz0 AS (SELECT repo, path, rk, count(*) AS n FROM tok GROUP BY 1, 2, 3),
sz AS (
  SELECT r.repo, r.path, r.rk, COALESCE(s.n, 0) AS n
  FROM r LEFT JOIN sz0 s
    ON s.repo = r.repo AND s.path = r.path AND s.rk = r.rk
),
iv AS (
  SELECT a.repo, a.path, a.rk, count(*) AS ni
  FROM tok a JOIN tok b
    ON a.repo = b.repo AND a.path = b.path AND a.t = b.t
   AND b.rk = a.rk + 1
  GROUP BY 1, 2, 3
),
pr AS (
  SELECT sa.repo, sa.path,
         sa.n + sb.n - COALESCE(i.ni, 0) AS uni,
         COALESCE(i.ni, 0) AS ni
  FROM sz sa
  JOIN sz sb ON sa.repo = sb.repo AND sa.path = sb.path
            AND sb.rk = sa.rk + 1
  LEFT JOIN iv i ON i.repo = sa.repo AND i.path = sa.path
                AND i.rk = sa.rk
),
nv AS (SELECT repo, path, count(*) AS n_versions FROM r GROUP BY 1, 2)
SELECT nv.repo, nv.path,
       CAST(nv.n_versions AS BIGINT) AS n_versions,
       CAST(COALESCE(sum(pr.ni), 0) AS BIGINT) AS sum_inter,
       CAST(COALESCE(sum(pr.uni), 0) AS BIGINT) AS sum_union
FROM nv
LEFT JOIN pr ON pr.repo = nv.repo AND pr.path = nv.path
WHERE nv.n_versions >= 2
GROUP BY 1, 2, 3
ORDER BY 1, 2
"""


def q_lang_source_chi2(sf_dir: str) -> pa.Table:
    """Chi-square independence cells for the (source x lang)
    contingency table — the corpus-drift screen ('is language mix
    independent of source?').  Distributed part = per-batch partial
    (source, lang) counts folded through one tiny groupby-sum; the
    driver expands the <= |S| x |L| margin product (INCLUDING
    zero-observed cells, which a naive GROUP BY would drop but the
    test requires) and emits per-CELL terms.  Floats are bit-exact by
    construction: expected and chi2_term are computed per cell from
    exact integer margins with the operation tree mirrored in the SQL
    ((o-e)*(o-e)/e, no pow), and no float is ever summed across rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {"source": t.column("source"), "lang": t.column("lang")}
        )
        return tt.group_by(["source", "lang"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["source", "lang", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # <= |S| x |L| rows
    obs = {(r["source"], r["lang"]): r["n"] for r in cells}
    sources = sorted({s for s, _ in obs})
    langs = sorted({l for _, l in obs})
    rs = {s: sum(v for (a, _), v in obs.items() if a == s) for s in sources}
    cs = {l: sum(v for (_, b), v in obs.items() if b == l) for l in langs}
    grand = float(sum(obs.values()))
    rows = {
        "source": [], "lang": [], "observed": [],
        "expected": [], "chi2_term": [],
    }
    for s in sources:
        for l in langs:
            o = float(obs.get((s, l), 0))
            e = float(rs[s]) * float(cs[l]) / grand
            rows["source"].append(s)
            rows["lang"].append(l)
            rows["observed"].append(int(obs.get((s, l), 0)))
            rows["expected"].append(e)
            rows["chi2_term"].append((o - e) * (o - e) / e)
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "observed": pa.array(rows["observed"], pa.int64()),
            "expected": pa.array(rows["expected"], pa.float64()),
            "chi2_term": pa.array(rows["chi2_term"], pa.float64()),
        }
    )


ORACLE_LANG_SOURCE_CHI2 = """
WITH c AS (SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
rs AS (SELECT source, sum(o) AS r FROM c GROUP BY 1),
cs AS (SELECT lang, sum(o) AS l FROM c GROUP BY 1),
g AS (SELECT sum(o) AS n FROM c)
SELECT rs.source, cs.lang,
       CAST(COALESCE(c.o, 0) AS BIGINT) AS observed,
       CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE) / CAST(g.n AS DOUBLE)
         AS expected,
       (CAST(COALESCE(c.o, 0) AS DOUBLE)
          - CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
            / CAST(g.n AS DOUBLE))
       * (CAST(COALESCE(c.o, 0) AS DOUBLE)
          - CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
            / CAST(g.n AS DOUBLE))
       / (CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
          / CAST(g.n AS DOUBLE)) AS chi2_term
FROM rs CROSS JOIN cs CROSS JOIN g
LEFT JOIN c ON c.source = rs.source AND c.lang = cs.lang
ORDER BY 1, 2
"""


def q_readability_documents(sf_dir: str) -> ray.data.Dataset:
    """Flesch reading-ease per document (Flesch 1948 — the classic
    readability curation filter, distinct from `doc_quality`'s
    length/punct ratios: it needs SENTENCE segmentation and a syllable
    proxy).  words = \\w+ runs, sentence breaks = [.!?]+ runs (floored
    at 1 — an unpunctuated doc is one long sentence), syllables ~
    [aeiouy]+ vowel groups in the lowered text — three RE2 counts per
    row (count_substring_regex), identical patterns in the oracle, and
    the score 206.835 - 1.015*(w/s) - 84.6*(syl/w) is per-row float
    arithmetic on exact integers (never summed), so parity is
    bit-exact; NULL where a doc has no words.
    Embarrassingly parallel: zero exchange."""
    from ..functions.text import _count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        w = _count(txt, r"\w+").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s = np.maximum(
            _count(txt, r"[.!?]+").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            1,
        )
        syl = _count(pc.utf8_lower(txt), r"[aeiouy]+").cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        ok = w > 0
        wf = w.astype(np.float64)
        sf = s.astype(np.float64)
        sylf = syl.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = 206.835 - 1.015 * (wf / sf) - 84.6 * (sylf / wf)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(s, pa.int64()),
                "n_syllables": pa.array(syl, pa.int64()),
                "flesch": pa.array(score, pa.float64(), mask=~ok),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_READABILITY = r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_words,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                  1) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         206.835
         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       END AS flesch
FROM c
"""


def q_max_drawdown_per_user(sf_dir: str) -> pa.Table:
    """Per-user maximum drawdown of the value series ordered by
    (ts, event_id): max over t of (running max − current value) — the
    classic peak-to-trough statistic (engagement decay / balance
    monitoring).  One keyed exchange; inside each bucket a single
    lexsort + per-user running cummax via the int64 offset lift
    (loop-free, same device as `q_pareto_events`, with the overflow
    fallback), then one maximum.reduceat per user segment.  Integer
    cents end to end → exact window-function oracle parity."""
    from ..functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    _EMPTY = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "max_drawdown": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, cents = uid[order], cents[order]
        new_uid = segment_starts(uid)
        ustart = np.flatnonzero(new_uid)
        seg_id = np.cumsum(new_uid) - 1
        lo = int(cents.min())
        rng = int(cents.max()) - lo + 2
        if rng * int(seg_id[-1] + 1) < 2**62:
            lifted = (cents - lo) + seg_id * rng
            cm = np.maximum.accumulate(lifted) - seg_id * rng + lo
        else:  # pragma: no cover - fixture cents never span 2^62
            cm = cents.copy()
            for s, e in zip(ustart, np.append(ustart[1:], n)):
                np.maximum.accumulate(cents[s:e], out=cm[s:e])
        dd = np.maximum.reduceat(cm - cents, ustart)
        return pa.table(
            {"user_id": pa.array(uid[ustart], pa.int64()),
             "max_drawdown": pa.array(dd, pa.int64())}
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MAX_DRAWDOWN = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, cents,
         max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS rm
  FROM c
)
SELECT user_id, max(rm - cents) AS max_drawdown
FROM r GROUP BY user_id
"""


def q_wow_change_per_type(sf_dir: str) -> pa.Table:
    """Week-over-week event-count delta per type — the growth/decay
    monitor over the ingest stream.  Per-batch (type, epoch-week)
    bincount partials fold through one tiny groupby (≤ types × weeks
    rows); the LAG over each type's OBSERVED weeks (gap weeks skipped,
    matching SQL LAG) runs on the driver over that small result.
    Integer µs week arithmetic, all-integer output."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    WEEK_US = 604_800_000_000

    _EMPTY = pa.table(
        {"event_type": pa.array([], pa.string()),
         "wk": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        codes = pc.dictionary_encode(t.column("event_type"))
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = codes.dictionary.to_pylist()
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        wk = us // WEEK_US
        w0 = wk.min() if len(wk) else 0
        nweeks = int(wk.max() - w0 + 1) if len(wk) else 0
        cell = idx * nweeks + (wk - w0)
        cnt = np.bincount(cell, minlength=len(names) * nweeks)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "event_type": pa.array(
                    [names[int(c) // nweeks] for c in keep], pa.string()
                ),
                "wk": pa.array(keep % nweeks + w0, pa.int64()),
                "n_events": pa.array(cnt[keep], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "wk"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .take_all()
    )
    t = _from_rows(
        rows,
        {"event_type": pa.string(), "wk": pa.int64(), "n_events": pa.int64()},
    ).sort_by([("event_type", "ascending"), ("wk", "ascending")])
    n = t.column("n_events").to_numpy(zero_copy_only=False)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    first = np.concatenate(([True], et[1:] != et[:-1])) if len(et) else (
        np.array([], dtype=bool)
    )
    prev = np.empty(len(n), np.int64)
    if len(n):
        prev[1:] = n[:-1]
    delta = n - prev
    return t.append_column(
        "wow_delta", pa.array(np.where(first, None, delta), pa.int64())
    )


ORACLE_WOW_CHANGE = """
WITH w AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, wk, n_events,
       n_events - lag(n_events) OVER (PARTITION BY event_type ORDER BY wk)
         AS wow_delta
FROM w
"""


def q_quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Symmetric int8 quantization of the embedding column (max-abs
    scale per vector, the standard ANN-index compression step) with
    per-vector integrity stats: scale (micro-units), sum / sum-of-
    squares / min / max of the int8 codes.  Embarrassingly parallel —
    one vectorized pass per batch over the flattened list buffer,
    zero shuffle; elements are integerized to micro-units once so the
    quantizer `floor(127·m/s + 0.5)` is the same IEEE double
    expression tree on both sides (bit-exact parity, the
    `lm_bigram_documents` technique)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if emb.num_chunks > 0:
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("vec_id", "s_micro", "q_sum", "q_sumsq",
                           "q_min", "q_max")}
            )
        offs = np.asarray(emb.offsets)
        starts = offs[:-1].astype(np.int64)
        lens = np.diff(offs).astype(np.int64)
        # reduceat misbehaves on zero-length segments (an empty vector
        # would steal its neighbour's first element; an empty LAST
        # vector would index past the end) — fixtures are fixed-dim,
        # so assert rather than silently mis-aggregate (ADVICE r03)
        if n and lens.min() == 0:
            raise ValueError(
                "quantize_embeddings: empty embedding vectors are not "
                "supported (drop or pad zero-length lists upstream)"
            )
        m = _micro(pc.list_flatten(emb)).to_numpy(zero_copy_only=False)
        s = np.maximum.reduceat(np.abs(m), starts)
        s_row = np.repeat(s, lens)
        mf = m.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            qf = np.floor(127.0 * mf / s_row.astype(np.float64) + 0.5)
        q = np.where(s_row == 0, 0, qf).astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "s_micro": pa.array(s, pa.int64()),
                "q_sum": pa.array(np.add.reduceat(q, starts), pa.int64()),
                "q_sumsq": pa.array(
                    np.add.reduceat(q * q, starts), pa.int64()
                ),
                "q_min": pa.array(np.minimum.reduceat(q, starts), pa.int64()),
                "q_max": pa.array(np.maximum.reduceat(q, starts), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_QUANTIZE = """
WITH u AS (
  SELECT vec_id,
         CAST(ROUND(CAST(u.e AS DOUBLE) * 1000000.0) AS BIGINT) AS m
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS e) u
),
s AS (SELECT vec_id, max(abs(m)) AS s_micro FROM u GROUP BY 1),
q AS (
  SELECT u.vec_id, s.s_micro,
         CASE WHEN s.s_micro = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR(127.0 * CAST(u.m AS DOUBLE)
                              / CAST(s.s_micro AS DOUBLE) + 0.5) AS BIGINT)
         END AS qv
  FROM u JOIN s ON u.vec_id = s.vec_id
)
SELECT vec_id, s_micro,
       CAST(sum(qv) AS BIGINT) AS q_sum,
       CAST(sum(qv * qv) AS BIGINT) AS q_sumsq,
       min(qv) AS q_min, max(qv) AS q_max
FROM q GROUP BY vec_id, s_micro
"""


def q_decile_doc_lengths(sf_dir: str) -> pa.Table:
    """Lorenz-curve cells of corpus concentration: split docs into 10
    exact NTILE groups by (n_chars, doc_id) and report each decile's
    doc count and char mass — 'what share of the corpus is its longest
    10% of docs'.  No global sort: a composite unique order key
    (n_chars · (max_id+1) + doc_id) rides the range-partitioned
    two-pass rank (the `user_value_percent_rank` shape — driver holds
    R integers), row_number is exact because the key is unique, and
    the SQL NTILE group boundary (first N mod 10 tiles get one extra
    row) is the same integer formula on both sides.  Per-tile sums
    fold from ≤ 10-row batch partials."""
    from ..functions.window import default_num_buckets, keyed_window, \
        segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    agg = ds.aggregate(
        Max("doc_id", alias_name="max_id"),
        Count(alias_name="n"),
    )
    max_id, n_total = int(agg["max_id"]), int(agg["n"])
    M = max_id + 1

    def keyed(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").cast(pa.int64())
        nch = t.column("n_chars").cast(pa.int64())
        key = pc.add(pc.multiply(nch, pa.scalar(M, pa.int64())), did)
        return pa.table({"key": key, "n_chars": nch})

    withkey = ds.map_batches(keyed, batch_format="pyarrow",
                             zero_copy_batch=True)
    kagg = withkey.aggregate(
        Min("key", alias_name="lo"), Max("key", alias_name="hi")
    )
    lo, hi = int(kagg["lo"]), int(kagg["hi"])
    R = default_num_buckets()
    span = max(hi - lo, 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("key").to_numpy(zero_copy_only=False)
        rid = np.clip((v - lo) * R // (span + 1), 0, R - 1)
        return t.append_column("__r", pa.array(rid.astype(np.int64)))

    ranged = withkey.map_batches(tag, batch_format="pyarrow",
                                 zero_copy_batch=True)
    counts_rows = (
        ranged.map_batches(
            lambda t: t.select(["__r"]).group_by("__r").aggregate(
                [("__r", "count")]
            ).rename_columns(["__r", "c"]),
            batch_format="pyarrow",
        )
        .groupby("__r")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    ct = _from_rows(
        counts_rows, {"__r": pa.int64(), "c": pa.int64()}
    ).sort_by("__r")
    offsets_arr = np.zeros(R, dtype=np.int64)
    offsets_arr[ct.column("__r").to_numpy(zero_copy_only=False)] = (
        ct.column("c").to_numpy(zero_copy_only=False)
    )
    offsets_arr = np.concatenate(([0], np.cumsum(offsets_arr)[:-1]))
    offsets = {int(r): int(offsets_arr[r]) for r in range(R)}
    # SQL NTILE(10): q = N // 10 rows per tile, the first r = N % 10
    # tiles take one extra row
    q10, r10 = divmod(n_total, 10)

    def per_range(g: pa.Table) -> pa.Table:
        rid = g.column("__r").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        nch = g.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, rid))
        rid, key, nch = rid[order], key[order], nch[order]
        starts = np.flatnonzero(segment_starts(rid))
        rownum = np.empty(len(key), dtype=np.int64)
        for s, e in zip(starts, np.append(starts[1:], len(rid))):
            rownum[s:e] = (
                offsets[int(rid[s])] + np.arange(1, e - s + 1)
            )  # keys are globally unique → local order IS row_number
        cut = r10 * (q10 + 1)
        if q10 > 0:
            tile = np.where(
                rownum <= cut,
                (rownum - 1) // (q10 + 1) + 1,
                r10 + (rownum - cut - 1) // q10 + 1,
            )
        else:  # fewer docs than tiles: first r10 tiles get one row each
            tile = rownum
        t10 = np.bincount(tile, minlength=11)[1:]
        s10 = np.bincount(tile, weights=nch.astype(np.float64),
                          minlength=11)[1:].astype(np.int64)
        keep = np.flatnonzero(t10)
        return pa.table(
            {
                "tile": pa.array(keep + 1, pa.int64()),
                "n_docs": pa.array(t10[keep], pa.int64()),
                "sum_chars": pa.array(s10[keep], pa.int64()),
            }
        )

    rows = (
        keyed_window(ranged, "__r", per_range)
        .groupby("tile")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .take_all()
    )
    return _from_rows(
        rows,
        {"tile": pa.int64(), "n_docs": pa.int64(), "sum_chars": pa.int64()},
    ).sort_by("tile")


ORACLE_DECILE_LENGTHS = """
WITH t AS (
  SELECT n_chars,
         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
  FROM documents
)
SELECT tile, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY tile ORDER BY tile
"""


def q_k_anonymity_documents(sf_dir: str) -> pa.Table:
    """k-anonymity audit over the (lang, source) quasi-identifier:
    groups holding fewer than k=10 docs are re-identification risks a
    release pipeline must generalize or drop (Sweeney 2002) — the
    compliance sibling of the purge verb.  Per-batch partial counts
    (≤ |langs|×|sources| rows), one tiny fold, driver-side filter."""
    K = 10
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        # count_all (not a column count): matches SQL count(*) even
        # when the counted column holds nulls (ADVICE r03)
        return (
            t.group_by(["lang", "source"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "source", "n_docs"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )
    t = _from_rows(
        rows,
        {"lang": pa.string(), "source": pa.string(), "n_docs": pa.int64()},
    )
    return t.filter(pc.less(t.column("n_docs"), pa.scalar(K))).sort_by(
        [("lang", "ascending"), ("source", "ascending")]
    )


ORACLE_K_ANONYMITY = """
SELECT lang, source, count(*) AS n_docs
FROM documents
GROUP BY lang, source
HAVING count(*) < 10
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "decile_doc_lengths": q_decile_doc_lengths,
    "k_anonymity_documents": q_k_anonymity_documents,
    "max_drawdown_per_user": q_max_drawdown_per_user,
    "wow_change_per_type": q_wow_change_per_type,
    "quantize_embeddings": q_quantize_embeddings,
    "version_churn_per_path": q_version_churn_per_path,
    "lang_source_chi2": q_lang_source_chi2,
    "readability_documents": q_readability_documents,
    "window_range_trailing": q_window_range_trailing,
    "quantiles_cont_per_user": q_quantiles_cont_per_user,
    "audience_matrix": q_audience_matrix,
    "bfs_hops_pairs": q_bfs_hops,
    "concurrent_versions_per_repo": q_concurrent_versions_per_repo,
    "gopher_repetition_documents": q_gopher_repetition_documents,
    "pit_live_versions": q_pit_live_versions,
    "fim_split_documents": q_fim_split_documents,
    "vocab_richness_per_source": q_vocab_richness_per_source,
    "pmi_collocations": q_pmi_collocations,
    "langid_confusion": q_langid_confusion,
    "shingle_novelty_documents": q_shingle_novelty_documents,
    "dup_rate_per_source": q_dup_rate_per_source,
    "cross_source_overlap": q_cross_source_overlap,
    "session_length_histogram": q_session_length_histogram,
    "daily_streaks_per_user": q_daily_streaks_per_user,
    "first_touch_attribution": q_first_touch_attribution,
    "tpch_q7": q_tpch_q7,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "temperature_mix_documents": q_temperature_mix_documents,
    "phash_media_dupes": q_phash_media_dupes,
    "repeat_purchase_rate": q_repeat_purchase_rate,
    "fertility_per_lang": q_fertility_per_lang,
    "top_journeys": q_top_journeys,
    "hard_negatives_embeddings": q_hard_negatives_embeddings,
    "rolling_wau": q_rolling_wau,
    "centroid_per_label": q_centroid_per_label,
    "user_activity_gini": q_user_activity_gini,
    "user_value_percent_rank": q_user_value_percent_rank,
    "tpch_q5": q_tpch_q5,
    "tpch_q8": q_tpch_q8,
    "tpch_q10": q_tpch_q10,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q22": q_tpch_q22,
    "late_orders_by_priority": q_late_orders_by_priority,
    "promo_revenue_share": q_promo_revenue_share,
    "big_orders_topk": q_big_orders_topk,
    "benford_value_digits": q_benford_value_digits,
    "weekday_hour_heatmap": q_weekday_hour_heatmap,
    "autocorr_lag1_value_per_user": q_autocorr_lag1_value_per_user,
    "type_streaks_per_user": q_type_streaks_per_user,
    "twap_value_per_user": q_twap_value_per_user,
    "interarrival_quantiles_per_type": q_interarrival_quantiles_per_type,
    "cluster_size_histogram": q_cluster_size_histogram,
    "kl_unigram_documents": q_kl_unigram_documents,
    "regr_value_on_ts_per_user": q_regr_value_on_ts_per_user,
    "entropy_types_per_user": q_entropy_types_per_user,
    "cumulative_distinct_users": q_cumulative_distinct_users,
    "type_cooccurrence": q_type_cooccurrence,
    "activity_gaps_per_user": q_activity_gaps_per_user,
    "khop2_reachability": q_khop2_reachability,
    "jaccard_clusters": q_jaccard_clusters,
    "triangle_count": q_triangle_count,
    "gopher_quality_documents": q_gopher_quality_documents,
    "winsorize_value_events": q_winsorize_value_events,
    "pareto_events": q_pareto_events,
    "full_outer_join_customer_orders": q_full_outer_join_customer_orders,
    "mad_value_per_user": q_mad_value_per_user,
    "degree_histogram": q_degree_histogram,
    "trimmed_sum_per_user": q_trimmed_sum_per_user,
    "throttle_dedup_events": q_throttle_dedup_events,
    "knn_ivf_incremental": q_knn_ivf_incremental,
    "funnel3_click_view_purchase": q_funnel3_click_view_purchase,
    "cohort_retention_matrix": q_cohort_retention_matrix,
    "lm_bigram_documents": q_lm_bigram_documents,
    "bpe_encode_documents": q_bpe_encode_documents,
    "ngram_containment_pairs": q_ngram_containment_pairs,
    "pack_bpe_documents": q_pack_bpe_documents,
    "token_diversity_documents": q_token_diversity_documents,
    "event_transitions": q_event_transitions,
    "sort_events": q_sort_events,
    "equidepth_bins_value": q_equidepth_bins_value,
    "dsir_sample_documents": q_dsir_sample_documents,
    "zorder_scan_events": q_zorder_scan_events,
    "quality_classifier_documents": q_quality_classifier_documents,
    "bpe_vocab_documents": q_bpe_vocab_documents,
    "spelling_variants_part": q_spelling_variants_part,
    # Ordered so the entries without a CORRECTNESS_r02 driver row run
    # first (capstone + composites lead), per VERDICT r02 next-round #1.
    "dup_ngrams_documents": q_dup_ngrams_documents,
    "remove_dup_spans_documents": q_remove_dup_spans_documents,
    "dedup_keep_best_documents": q_dedup_keep_best_documents,
    "kmeans_embeddings": q_kmeans_embeddings,
    "pca_embeddings": q_pca_embeddings,
    "tfidf_top_terms": q_tfidf_top_terms,
    "semdedup_embeddings": q_semdedup_embeddings,
    "bm25_search": q_bm25_search,
    "boilerplate_prefixes": q_boilerplate_prefixes,
    "edit_distance_pairs": q_edit_distance_pairs,
    "corr_value_ts_per_user": q_corr_value_ts_per_user,
    "histogram_value": q_histogram_value,
    "compression_ratio_documents": q_compression_ratio_documents,
    "chunk_documents": q_chunk_documents,
    "mix_char_budget": q_mix_char_budget,
    "contamination_documents": q_contamination_documents,
    "redact_pii_documents": q_redact_pii_documents,
    "token_rarity_documents": q_token_rarity_documents,
    "repetition_stats_documents": q_repetition_stats_documents,
    "prepare_training_set": q_prepare_training_set,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q6": q_tpch_q6,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "dedup_clusters": q_dedup_clusters,
    "incremental_dedup_pairs": q_incremental_dedup_pairs,
    "incremental_curate": q_incremental_curate,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "knn_pq": q_knn_pq,
    "semantic_neardup_docs": q_semantic_neardup_docs,
    "embed_documents": q_embed_documents,
    "lang_id_documents": q_lang_id_documents,
    "split_documents": q_split_documents,
    "seq_pack_documents": q_seq_pack_documents,
    "epoch_shuffle_documents": q_epoch_shuffle_documents,
    "pagerank_parts": q_pagerank_parts,
    "simhash_documents": q_simhash_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "window_lag_value": q_window_lag_value,
    "window_running_totals": q_window_running_totals,
    "window_dense_rank": q_window_dense_rank,
    "window_lead_moving": q_window_lead_moving,
    "window_rank_tiles": q_window_rank_tiles,
    "median_value_per_user": q_median_value_per_user,
    "quantiles_value_per_user": q_quantiles_value_per_user,
    "string_agg_per_user": q_string_agg_per_user,
    "moments_value_per_user": q_moments_value_per_user,
    "mode_type_per_user": q_mode_type_per_user,
    "topk_types_per_user": q_topk_types_per_user,
    "outlier_events_per_user": q_outlier_events_per_user,
    "funnel_click_purchase": q_funnel_click_purchase,
    "profile_events": q_profile_events,
    "pivot_event_counts": q_pivot_event_counts,
    "unpivot_event_counts": q_unpivot_event_counts,
    "rollup_event_counts": q_rollup_event_counts,
    "cube_event_counts": q_cube_event_counts,
    "heavy_hitter_users": q_heavy_hitter_users,
    "intersect_click_purchase": q_intersect_click_purchase,
    "except_click_no_purchase": q_except_click_no_purchase,
    "multimodal_features": q_multimodal_features,
    "multimodal_decode_bmp": q_multimodal_decode_bmp,
    "video_frame_sample": q_video_frame_sample,
    "cdc_replay_lake": q_cdc_replay_lake,
    "scd2_history": q_scd2_history,
    "cdc_scan_recent": q_cdc_scan_recent,
    "time_travel_diff": q_time_travel_diff,
    "changelog_export": q_changelog_export,
    "lww_upsert_events": q_lww_upsert_events,
    "watermark_events": q_watermark_events,
    "per_type_counts": q_per_type_counts,
    "orphan_filter_events": q_orphan_filter_events,
    "json_extract_events": q_json_extract_events,
    "explode_embeddings": q_explode_embeddings,
    "spread_embeddings": q_spread_embeddings,
    "demux_events": q_demux_events,
    "hourly_user_activity": q_hourly_user_activity,
    "session_windows": q_session_windows,
    "systematic_sample_events": q_systematic_sample_events,
    "hash_sample_events": q_hash_sample_events,
    "stratified_sample_events": q_stratified_sample_events,
    "priority_sample_events": q_priority_sample_events,
    "distinct_langs": q_distinct_langs,
    "distinct_users_per_type": q_distinct_users_per_type,
    "hourly_distinct_users": q_hourly_distinct_users,
    "hourly_retention": q_hourly_retention,
    "approx_distinct_users_per_type": q_approx_distinct_users_per_type,
    "approx_quantiles_value": q_approx_quantiles_value,
    "normalized_text_sha": q_normalized_text_sha,
    "top2_per_user": q_top2_per_user,
    "top_events": q_top_events,
    "sha256_documents": q_sha256_documents,
    "exact_dedup_documents": q_exact_dedup_documents,
    "exact_dedup_keep": q_exact_dedup_keep,
    "token_stats_documents": q_token_stats_documents,
    "pii_scan_documents": q_pii_scan_documents,
    "top_tokens_documents": q_top_tokens_documents,
    "doc_quality": q_doc_quality,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "knn_cosine": q_knn_cosine,
    "embedding_neardup": q_embedding_neardup,
    "broadcast_join_segment": q_broadcast_join_segment,
    "hash_join_orders_customer": q_hash_join_orders_customer,
    "left_join_customer_orders": q_left_join_customer_orders,
    "semi_join_customers": q_semi_join_customers,
    "anti_join_customers": q_anti_join_customers,
    "asof_join_clicks_views": q_asof_join_clicks_views,
    "range_join_value_bins": q_range_join_value_bins,
    "sliding_window_activity": q_sliding_window_activity,
    "repo_stats_lake": q_repo_stats_lake,
    "fanout_repo_heads": q_fanout_repo_heads,
    "fanout_repo_langs": q_fanout_repo_langs,
    "fanout_repo_activity": q_fanout_repo_activity,
    "fanout_wide_valuations": q_fanout_wide_valuations,
    "fanout_wide_addr": q_fanout_wide_addr,
    "fanout_wide_refs": q_fanout_wide_refs,
    "fanout_wide_shards": q_fanout_wide_shards,
    "fanout_wide_langstat": q_fanout_wide_langstat,
    "curate_documents": q_curate_documents,
}

#: run order insurance (VERDICT r02 Next #1): if a driver ever samples
#: or truncates the registry, the flagship composites and one
#: representative per operator family come first.
_PRIORITY = [
    "cdc_replay_lake",
    "prepare_training_set",
    "curate_documents",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q5",
    "tpch_q10",
    "ngram_jaccard_pairs",
    "exact_dedup_documents",
    "lww_upsert_events",
    "hash_join_orders_customer",
    "knn_cosine",
    "session_windows",
    "window_running_totals",
    "pivot_event_counts",
    "heavy_hitter_users",
    "incremental_curate",
    "fanout_repo_heads",
    "fanout_wide_valuations",
    "fanout_wide_refs",
    "seq_pack_documents",
]
QUERIES = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES} | {
    k: v for k, v in QUERIES.items() if k not in _PRIORITY
}
# The driver verifies the FIRST 50 registry entries each round
# (CORRECTNESS_r03 == registry head).  A final reorder below (after
# ORACLE_SQL is defined) pushes rows-only entries past every
# oracle-bearing one so no verification slot is spent on a
# ``no_oracle`` row (VERDICT r03 Next #2).

ORACLE_SQL = {
    "decile_doc_lengths": ORACLE_DECILE_LENGTHS,
    "k_anonymity_documents": ORACLE_K_ANONYMITY,
    "max_drawdown_per_user": ORACLE_MAX_DRAWDOWN,
    "wow_change_per_type": ORACLE_WOW_CHANGE,
    "quantize_embeddings": ORACLE_QUANTIZE,
    "version_churn_per_path": ORACLE_VERSION_CHURN,
    "lang_source_chi2": ORACLE_LANG_SOURCE_CHI2,
    "readability_documents": ORACLE_READABILITY,
    "window_range_trailing": ORACLE_WINDOW_RANGE,
    "quantiles_cont_per_user": ORACLE_QUANTILES_CONT,
    "audience_matrix": ORACLE_AUDIENCE_MATRIX,
    "bfs_hops_pairs": ORACLE_BFS_HOPS,
    "concurrent_versions_per_repo": ORACLE_CONCURRENT_VERSIONS,
    "gopher_repetition_documents": ORACLE_GOPHER_REPETITION,
    "pit_live_versions": ORACLE_PIT_LIVE,
    "fim_split_documents": ORACLE_FIM_SPLIT,
    "vocab_richness_per_source": ORACLE_VOCAB_RICHNESS,
    "pmi_collocations": ORACLE_PMI,
    "langid_confusion": ORACLE_LANG_CONFUSION,
    "shingle_novelty_documents": ORACLE_SHINGLE_NOVELTY,
    "dup_rate_per_source": ORACLE_DUP_RATE_SOURCE,
    "cross_source_overlap": ORACLE_CROSS_SOURCE,
    "session_length_histogram": ORACLE_SESSION_HIST,
    "daily_streaks_per_user": ORACLE_DAILY_STREAKS,
    "first_touch_attribution": ORACLE_FIRST_TOUCH,
    "lm_bigram_documents": ORACLE_LM_BIGRAM,
    "ngram_containment_pairs": ORACLE_NGRAM_CONTAIN,
    "token_diversity_documents": ORACLE_TOKEN_DIVERSITY,
    "event_transitions": ORACLE_TRANSITIONS,
    "sort_events": ORACLE_SORT_EVENTS,
    "equidepth_bins_value": ORACLE_EQUIDEPTH,
    "zorder_scan_events": ORACLE_ZORDER_SCAN,
    "spelling_variants_part": ORACLE_SPELLING,
    "dup_ngrams_documents": ORACLE_DUP_NGRAMS,
    "remove_dup_spans_documents": ORACLE_REMOVE_DUP_SPANS,
    "dedup_keep_best_documents": ORACLE_DEDUP_KEEP_BEST,
    "tfidf_top_terms": ORACLE_TFIDF,
    "bm25_search": ORACLE_BM25,
    "boilerplate_prefixes": ORACLE_BOILERPLATE,
    "edit_distance_pairs": ORACLE_EDIT_DISTANCE,
    "corr_value_ts_per_user": ORACLE_CORR,
    "regr_value_on_ts_per_user": ORACLE_REGR,
    "twap_value_per_user": ORACLE_TWAP,
    "benford_value_digits": ORACLE_BENFORD,
    "tpch_q7": ORACLE_TPCH_Q7,
    "tpch_q17": ORACLE_TPCH_Q17,
    "tpch_q19": ORACLE_TPCH_Q19,
    "temperature_mix_documents": ORACLE_TEMPERATURE_MIX,
    "repeat_purchase_rate": ORACLE_REPEAT_PURCHASE,
    "fertility_per_lang": ORACLE_FERTILITY,
    "top_journeys": ORACLE_TOP_JOURNEYS,
    "hard_negatives_embeddings": ORACLE_HARD_NEGATIVES,
    "rolling_wau": ORACLE_ROLLING_WAU,
    "centroid_per_label": ORACLE_CENTROID,
    "user_activity_gini": ORACLE_GINI,
    "user_value_percent_rank": ORACLE_PCT_RANK,
    "tpch_q5": ORACLE_TPCH_Q5,
    "tpch_q8": ORACLE_TPCH_Q8,
    "tpch_q10": ORACLE_TPCH_Q10,
    "tpch_q13": ORACLE_TPCH_Q13,
    "tpch_q15": ORACLE_TPCH_Q15,
    "tpch_q22": ORACLE_TPCH_Q22,
    "late_orders_by_priority": ORACLE_LATE_ORDERS,
    "promo_revenue_share": ORACLE_PROMO_SHARE,
    "big_orders_topk": ORACLE_BIG_ORDERS,
    "weekday_hour_heatmap": ORACLE_WEEKDAY_HOUR,
    "autocorr_lag1_value_per_user": ORACLE_AUTOCORR,
    "type_streaks_per_user": ORACLE_STREAKS,
    "interarrival_quantiles_per_type": ORACLE_INTERARRIVAL,
    "cluster_size_histogram": ORACLE_CLUSTER_SIZES,
    "kl_unigram_documents": ORACLE_KL_UNIGRAM,
    "entropy_types_per_user": ORACLE_ENTROPY,
    "cumulative_distinct_users": ORACLE_CUM_DISTINCT,
    "type_cooccurrence": ORACLE_COOCCUR,
    "activity_gaps_per_user": ORACLE_GAPS,
    "khop2_reachability": ORACLE_KHOP2,
    "histogram_value": ORACLE_HISTOGRAM,
    "chunk_documents": ORACLE_CHUNKS,
    "mix_char_budget": ORACLE_MIX,
    "contamination_documents": ORACLE_CONTAMINATION,
    "redact_pii_documents": ORACLE_REDACT,
    "token_rarity_documents": ORACLE_RARITY,
    "repetition_stats_documents": ORACLE_REPETITION,
    "cdc_replay_lake": _CDC_SQL,
    "jaccard_clusters": ORACLE_JACCARD_CLUSTERS,
    "triangle_count": ORACLE_TRIANGLES,
    "gopher_quality_documents": ORACLE_GOPHER,
    "winsorize_value_events": ORACLE_WINSORIZE,
    "pareto_events": ORACLE_PARETO,
    "full_outer_join_customer_orders": ORACLE_FULL_JOIN,
    "mad_value_per_user": ORACLE_MAD,
    "degree_histogram": ORACLE_DEGREES,
    "trimmed_sum_per_user": ORACLE_TRIMMED,
    "throttle_dedup_events": ORACLE_THROTTLE,
    "funnel3_click_view_purchase": ORACLE_FUNNEL3,
    "cohort_retention_matrix": ORACLE_COHORT_MATRIX,
    "scd2_history": ORACLE_SCD2,
    "cdc_scan_recent": ORACLE_SCAN_RECENT,
    "time_travel_diff": ORACLE_TT_DIFF,
    "changelog_export": ORACLE_CHANGELOG,
    "lww_upsert_events": ORACLE_LWW,
    "watermark_events": "SELECT max(event_id) AS max_event_id, count(*) AS n_events FROM events",
    "per_type_counts": ORACLE_PER_TYPE,
    "orphan_filter_events": ORACLE_ORPHAN,
    "json_extract_events": ORACLE_JSON,
    "explode_embeddings": ORACLE_EXPLODE,
    "spread_embeddings": ORACLE_SPREAD,
    "demux_events": ORACLE_DEMUX,
    "hourly_user_activity": ORACLE_HOURLY,
    "session_windows": ORACLE_SESSIONS,
    "systematic_sample_events": ORACLE_SAMPLE,
    "hash_sample_events": ORACLE_HASH_SAMPLE,
    "stratified_sample_events": ORACLE_STRATIFIED,
    "priority_sample_events": ORACLE_PRIORITY_SAMPLE,
    "distinct_langs": ORACLE_DISTINCT,
    "distinct_users_per_type": ORACLE_DISTINCT_USERS,
    "hourly_distinct_users": ORACLE_HOURLY_DISTINCT,
    "hourly_retention": ORACLE_RETENTION,
    "normalized_text_sha": ORACLE_NORM_SHA,
    "top2_per_user": ORACLE_TOP2,
    "top_events": ORACLE_TOP,
    "sha256_documents": ORACLE_SHA,
    "exact_dedup_documents": ORACLE_DEDUP,
    "exact_dedup_keep": ORACLE_DEDUP_KEEP,
    "token_stats_documents": ORACLE_TOKENS,
    "pii_scan_documents": ORACLE_PII,
    "top_tokens_documents": ORACLE_TOP_TOKENS,
    "doc_quality": ORACLE_QUALITY,
    "ngram_jaccard_pairs": ORACLE_NGRAM,
    "knn_cosine": ORACLE_KNN,
    "embedding_neardup": ORACLE_NEARDUP,
    "broadcast_join_segment": ORACLE_BROADCAST,
    "hash_join_orders_customer": ORACLE_HASH_JOIN,
    "left_join_customer_orders": ORACLE_LEFT_JOIN,
    "semi_join_customers": ORACLE_SEMI_JOIN,
    "anti_join_customers": ORACLE_ANTI_JOIN,
    "asof_join_clicks_views": ORACLE_ASOF,
    "range_join_value_bins": ORACLE_RANGE_JOIN,
    "sliding_window_activity": ORACLE_SLIDING,
    "repo_stats_lake": ORACLE_REPO_STATS,
    "fanout_repo_heads": ORACLE_FANOUT_HEADS,
    "fanout_repo_langs": ORACLE_FANOUT_LANGS,
    "fanout_repo_activity": ORACLE_FANOUT_ACTIVITY,
    "fanout_wide_valuations": ORACLE_FANOUT_WIDE_VAL,
    "fanout_wide_addr": ORACLE_FANOUT_WIDE_ADDR,
    "fanout_wide_refs": ORACLE_FANOUT_WIDE_REFS,
    "fanout_wide_shards": ORACLE_FANOUT_WIDE_SHARDS,
    "fanout_wide_langstat": ORACLE_FANOUT_WIDE_LANGSTAT,
    "curate_documents": ORACLE_CURATE,
    # the incremental index must reproduce the batch result exactly
    # (ticks arrive in doc_id order), so it shares the batch oracle
    "incremental_curate": ORACLE_CURATE,
    "tpch_q1": ORACLE_Q1,
    "tpch_q3": ORACLE_Q3,
    "tpch_q6": ORACLE_Q6,
    "lang_id_documents": ORACLE_LANG_ID,
    "split_documents": ORACLE_SPLIT,
    "seq_pack_documents": ORACLE_SEQ_PACK,
    "epoch_shuffle_documents": ORACLE_EPOCH_SHUFFLE,
    "prepare_training_set": ORACLE_PREPARE,
    "window_lag_value": ORACLE_WINDOW_LAG,
    "window_running_totals": ORACLE_WINDOW_RUN,
    "window_dense_rank": ORACLE_WINDOW_RANK,
    "window_lead_moving": ORACLE_WINDOW_LEAD,
    "window_rank_tiles": ORACLE_WINDOW_TILES,
    "median_value_per_user": ORACLE_MEDIAN,
    "quantiles_value_per_user": ORACLE_QUANTILES,
    "string_agg_per_user": ORACLE_STRING_AGG,
    "moments_value_per_user": ORACLE_MOMENTS,
    "mode_type_per_user": ORACLE_MODE,
    "topk_types_per_user": ORACLE_TOPK_TYPES,
    "outlier_events_per_user": ORACLE_OUTLIER,
    "funnel_click_purchase": ORACLE_FUNNEL,
    "profile_events": ORACLE_PROFILE,
    "pivot_event_counts": ORACLE_PIVOT,
    "unpivot_event_counts": ORACLE_UNPIVOT,
    "rollup_event_counts": ORACLE_ROLLUP,
    "cube_event_counts": ORACLE_CUBE,
    "heavy_hitter_users": ORACLE_HEAVY,
    "intersect_click_purchase": ORACLE_INTERSECT,
    "except_click_no_purchase": ORACLE_EXCEPT,
    # simhash/simhash_neardup/fingerprint/minhash_lsh/knn_lsh/
    # multimodal: model-scoring / probabilistic / media ops → rows-only
    # check
}

# Final registry order — ROTATING VERIFICATION WINDOW (VERDICT r04
# Next #2, mirroring the reference's full-range `check` verb,
# src/ch_eth/check.rs:10-66): the driver verifies the FIRST 50 entries
# each round, so the head is rotated every round to entries that have
# never appeared in a CORRECTNESS_r0N window.  Round 5's head is the
# 50 entries below — 49 never driver-verified, plus `cdc_replay_lake`
# (the headline; deliberate 1-entry overlap with r04 for continuity).
# The remaining oracle-bearing entries follow, rows-only entries last.
# NOTE (ADVICE r04): this ordering is a deliberate, documented
# verification-scheduling policy, not a representative random sample —
# rows-only entries are listed in COVERAGE.md and checked by the
# driver's weaker rows-only path plus `tests/parity.py` locally; the
# rotation is recorded in BASELINE.md each round.
_R05_WINDOW = [
    "cdc_replay_lake",
    # judge-named high-value never-sampled entries first
    "sort_events",
    "lm_bigram_documents",
    "remove_dup_spans_documents",
    "dup_ngrams_documents",
    "tpch_q8",
    "tpch_q13",
    "tpch_q22",
    # remaining never-verified oracle entries, registry order
    "repeat_purchase_rate",
    "fertility_per_lang",
    "top_journeys",
    "hard_negatives_embeddings",
    "rolling_wau",
    "centroid_per_label",
    "user_activity_gini",
    "user_value_percent_rank",
    "tpch_q15",
    "late_orders_by_priority",
    "promo_revenue_share",
    "big_orders_topk",
    "benford_value_digits",
    "weekday_hour_heatmap",
    "autocorr_lag1_value_per_user",
    "type_streaks_per_user",
    "twap_value_per_user",
    "interarrival_quantiles_per_type",
    "cluster_size_histogram",
    "kl_unigram_documents",
    "regr_value_on_ts_per_user",
    "entropy_types_per_user",
    "cumulative_distinct_users",
    "type_cooccurrence",
    "activity_gaps_per_user",
    "khop2_reachability",
    "jaccard_clusters",
    "triangle_count",
    "gopher_quality_documents",
    "winsorize_value_events",
    "pareto_events",
    "full_outer_join_customer_orders",
    "mad_value_per_user",
    "degree_histogram",
    "trimmed_sum_per_user",
    "throttle_dedup_events",
    "funnel3_click_view_purchase",
    "cohort_retention_matrix",
    "ngram_containment_pairs",
    "token_diversity_documents",
    "event_transitions",
    "equidepth_bins_value",
]
assert len(_R05_WINDOW) == 50, len(_R05_WINDOW)
QUERIES = (
    {k: QUERIES[k] for k in _R05_WINDOW if k in QUERIES}
    | {k: v for k, v in QUERIES.items() if k in ORACLE_SQL}
    | {k: v for k, v in QUERIES.items() if k not in ORACLE_SQL}
)
