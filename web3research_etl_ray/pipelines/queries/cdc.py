"""Flagship CDC replay + CDC-core operator analogues (SURVEY sections 1-2).

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Count,
    Max,
    Min,
    Sum,
    _cents,
    _from_rows,
    _read,
    _tbl,
    fold_lww,
    hashlib,
    key_hash64,
    np,
    os,
    pa,
    pc,
    pq,
    quality_score,
    ray,
    sha256_hex,
)

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

    from ..replay import lake_table, replay

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
    from ...functions.hashing import key_hash64
    from ...functions.window import lead_one, segment_starts

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

    from ..replay import lake_scan, replay

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

    from ..replay import lake_diff, replay

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

    from ..replay import lake_changelog, replay

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
    from ...stages.normalize import orphan_mask

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

    from ..demux import demux_to_tables

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

    from ...functions.window import keyed_window, segment_starts

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
    from ...functions.window import keyed_window, row_numbers, segment_starts

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
    from ...functions.window import keyed_window

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
    from ...functions.window import keyed_window, segment_starts

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
    from ...functions.window import keyed_window, segment_starts

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
    from ...functions.sketch import hll_distinct

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
    from ...functions.sketch import approx_quantiles

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


