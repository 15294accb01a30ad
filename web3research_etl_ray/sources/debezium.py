"""Debezium-style CDC wire adapter (JSONL envelopes → canonical stream).

The reference ingests from chain RPC endpoints (src/ch_eth/init.rs:19-97);
real CDC deployments ingest binlog/WAL tails serialized as Debezium
envelopes — one JSON object per line:

    {"op": "c"|"r"|"u",  "before": null,   "after": {row...}, "seq": N}
    {"op": "d",          "before": {row...}, "after": null,   "seq": N}

``row`` carries the input_hint columns (repo, path, commit, lang,
content) plus the schema-evolution extras when present (``metadata``
object, ``size_bytes``).  A reorg extension (no Debezium analogue —
the reference's new-head delete+reinsert, src/ch_eth/sync.rs:92-116)
rides the same stream:

    {"op": "rollback", "seq": B, "orphan_from": F, "orphan_to": T}

Landing-zone design, deliberately NOT a parallel replay path: the wire
stream is converted ONCE — a streaming `read_json` → vectorized
envelope unwrap → `write_parquet` pass, one task per input file — into
the engine's canonical segment layout.  Replay then runs with all of
its footer-stats pruning, watermark resume and manifest machinery; at
100 TB the conversion is embarrassingly parallel and the parquet
landing zone is what makes every later incremental tick prunable
(JSONL has no row-group stats to push a `commit_seq > watermark`
filter into).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..schema import ROLLBACK_SCHEMA, UNIFIED_EVENT_SCHEMA, unify_to

_OP_MAP = {"c": "upsert", "r": "upsert", "u": "upsert", "d": "delete"}


def _struct_field(col, name: str, typ: pa.DataType, n_rows: int = 0):
    """struct_field that tolerates the field being absent from the
    inferred JSON schema (older envelopes) — returns typed nulls."""
    if col is None or pa.types.is_null(col.type) or not any(
        f.name == name for f in col.type
    ):
        n = len(col) if col is not None else n_rows
        return pa.nulls(n, typ)
    out = pc.struct_field(col, name)
    if out.type != typ and not pa.types.is_struct(out.type):
        out = out.cast(typ)
    return out


def _struct_to_map(col) -> pa.Array:
    """struct<k1:string,...> → map<string,string>, preserving field
    order, null rows stay null.  Vectorized: presence matrix + one
    row-major flatten; no per-row Python in the value path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    mtype = pa.map_(pa.string(), pa.string())
    if n == 0 or pa.types.is_null(col.type):
        return pa.nulls(n, mtype)
    names = [f.name for f in col.type]
    if not names:
        return pa.nulls(n, mtype)
    row_valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    vals = [pc.struct_field(col, nm).cast(pa.string()) for nm in names]
    present = np.stack(
        [pc.is_valid(v).to_numpy(zero_copy_only=False) for v in vals], axis=1
    )  # [n, K] row-major
    present &= row_valid[:, None]
    counts = present.sum(axis=1)
    flat = present.ravel()
    keys_flat = np.tile(np.array(names, dtype=object), n)[flat]
    items_mat = np.stack(
        [v.to_numpy(zero_copy_only=False) for v in vals], axis=1
    )
    items_flat = items_mat.ravel()[flat]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    # null offsets mark null map rows (offsets[i] null => row i null)
    off_arr = pa.array(
        offsets, pa.int32(),
        mask=np.concatenate([~row_valid, [False]]),
    )
    return pa.MapArray.from_arrays(
        off_arr,
        pa.array(keys_flat.tolist(), pa.string()),
        pa.array(items_flat.tolist(), pa.string()),
    )


def envelopes_to_events(t: pa.Table) -> pa.Table:
    """One batch of parsed envelopes → canonical UNIFIED_EVENT_SCHEMA
    rows, sorted by commit_seq (keeps landed segments prunable).
    Rollback envelopes must be filtered out upstream."""
    op_in = t.column("op").cast(pa.string())
    is_del = pc.equal(op_in, "d")
    op = pc.if_else(is_del, "delete", "upsert")
    before = t.column("before") if "before" in t.column_names else None
    after = t.column("after") if "after" in t.column_names else None

    def fld(name: str, typ: pa.DataType):
        a = _struct_field(after, name, typ, t.num_rows)
        b = _struct_field(before, name, typ, t.num_rows)
        am = _struct_to_map(a) if pa.types.is_struct(a.type) else a
        bm = _struct_to_map(b) if pa.types.is_struct(b.type) else b
        if pa.types.is_nested(am.type) or pa.types.is_nested(bm.type):
            # if_else has no kernel for nested types → concat + take
            if isinstance(am, pa.ChunkedArray):
                am = am.combine_chunks()
            if isinstance(bm, pa.ChunkedArray):
                bm = bm.combine_chunks()
            del_np = is_del.to_numpy(zero_copy_only=False)
            idx = np.arange(len(del_np), dtype=np.int64) + del_np * len(del_np)
            return pa.concat_arrays([am, bm.cast(am.type)]).take(pa.array(idx))
        return pc.if_else(is_del, bm, am)

    content = fld("content", pa.string())
    out = pa.table(
        {
            "repo": fld("repo", pa.string()),
            "path": fld("path", pa.string()),
            "commit": fld("commit", pa.string()),
            "lang": fld("lang", pa.string()),
            # engine delete rows carry empty content (gen.py:146-148)
            "content": content.fill_null(""),
            "commit_seq": t.column("seq").cast(pa.int64()),
            "op": op,
            "metadata": fld("metadata", pa.map_(pa.string(), pa.string())),
            "size_bytes": fld("size_bytes", pa.int64()),
        }
    )
    return unify_to(out, UNIFIED_EVENT_SCHEMA).sort_by(
        [("commit_seq", "ascending")]
    )


def _segment_name_for(path: str) -> str:
    """Landed segment name as a PURE function of the wire file path —
    re-landing the same wire file (grown or crash-repeated) REPLACES
    its earlier landing instead of duplicating frames.  Idempotent
    landing is what makes ``wire=`` safe for additive (``sum_cols``)
    tables: unlike LWW rows, a double-landed frame would permanently
    double-count in every fold and repair (ADVICE r02)."""
    base = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.basename(path))
    if base.endswith(".jsonl"):
        base = base[: -len(".jsonl")]
    return f"events-dbz-{base}.parquet"


class DebeziumTail:
    """Stateful tail of a growing Debezium JSONL dump dir for
    ``pipelines.tail.sync(wire=...)``: a size-keyed ledger (persisted
    tmp+rename AFTER landing) tracks how many bytes of each wire file
    have been landed; each :meth:`land_new` re-lands only new or grown
    files.  A grown file is re-landed WHOLE (JSONL mid-file resume
    would need line-boundary bookkeeping for no gain) — the re-land
    OVERWRITES the file's landed segment (deterministic name, see
    :func:`_segment_name_for`), so the landing zone never holds two
    copies of a frame and additive tables stay exact."""

    def __init__(self, src: str, out_stream_dir: str,
                 state_path: str | None = None):
        self.src = src
        self.out = out_stream_dir
        self.state_path = state_path or os.path.join(
            out_stream_dir, "_debezium_ledger.json")
        self.landed: dict[str, int] = {}
        if os.path.exists(self.state_path):
            import json

            with open(self.state_path) as fh:
                self.landed = json.load(fh)

    def land_new(self) -> dict:
        files = sorted(glob.glob(os.path.join(self.src, "*.jsonl")))
        todo = [f for f in files
                if os.path.getsize(f) > self.landed.get(f, 0)]
        if not todo:
            return {"files": 0, "segments": 0, "rollbacks": 0}
        sizes = {f: os.path.getsize(f) for f in todo}  # pre-land snapshot
        info = land_debezium_jsonl(todo, self.out)
        self.landed.update(sizes)
        import json

        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.landed, fh)
        os.replace(tmp, self.state_path)
        return info


@ray.remote
def _land_dbz_one(path: str, out_stream_dir: str) -> dict:
    """Decode ONE wire file and (over)write its landed segment — a plain
    Ray task, same shape as ``wal._land_one``: each wire file maps to
    exactly one output segment, so there is no cross-file exchange for a
    Dataset to schedule, and one decode pass serves both the event rows
    and the rollback control set (the previous two-pass Dataset version
    decoded every wire byte twice).  The parquet lands tmp + os.replace
    so a killed task never leaves a torn segment visible."""
    from pyarrow import json as pj

    t = pj.read_json(path)
    op = t.column("op").cast(pa.string())
    ev = envelopes_to_events(t.filter(pc.not_equal(op, "rollback")))
    seg_name = None
    if ev.num_rows:
        seg_name = _segment_name_for(path)
        dst = os.path.join(out_stream_dir, seg_name)
        tmp = dst + ".tmp"
        pq.write_table(ev, tmp)
        os.replace(tmp, dst)
    rb_env = t.filter(pc.equal(op, "rollback"))
    if rb_env.num_rows == 0 or "orphan_from" not in rb_env.column_names:
        rb = ROLLBACK_SCHEMA.empty_table()
    else:
        rb = pa.table(
            {
                "barrier_seq": rb_env.column("seq").cast(pa.int64()),
                "orphan_from": rb_env.column("orphan_from").cast(pa.int64()),
                "orphan_to": rb_env.column("orphan_to").cast(pa.int64()),
            }
        )
    return {"segment": seg_name, "rollbacks": rb, "events": ev.num_rows}


def land_debezium_jsonl(src: str | list[str], out_stream_dir: str) -> dict:
    """Convert a directory (or list) of Debezium JSONL files into the
    canonical stream layout under ``out_stream_dir``.

    One Ray task per wire file (the unit of wire parallelism); landed
    segment names are a pure function of the wire file, so repeating a
    landing (crash before the ledger persisted, grown file re-landed
    whole) overwrites rather than duplicates — idempotent, which
    additive (sum_cols) tables require.
    Returns {"files": n_in, "segments": n_new, "rollbacks": n_rb}.
    """
    files = (
        sorted(glob.glob(os.path.join(src, "*.jsonl")))
        if isinstance(src, str)
        else list(src)
    )
    if not files:
        raise FileNotFoundError(f"no *.jsonl under {src!r}")
    os.makedirs(out_stream_dir, exist_ok=True)
    results = ray.get(
        [_land_dbz_one.remote(f, out_stream_dir) for f in files]
    )
    rollbacks = [r["rollbacks"] for r in results if r["rollbacks"].num_rows]
    n_events = sum(r["events"] for r in results)
    n_seg = sum(r["segment"] is not None for r in results)
    # merge with any previously landed rollbacks (incremental landings
    # pass only the new wire files) and dedup re-landed frames
    rb_path = os.path.join(out_stream_dir, "rollbacks.parquet")
    prior = [pq.read_table(rb_path)] if os.path.exists(rb_path) else []
    rb = (
        pa.concat_tables(prior + rollbacks)
        if (prior or rollbacks)
        else ROLLBACK_SCHEMA.empty_table()
    )
    rb = (
        rb.group_by(["barrier_seq", "orphan_from", "orphan_to"])
        .aggregate([])
        .sort_by([("barrier_seq", "ascending")])
        .cast(ROLLBACK_SCHEMA)
    )
    tmp = rb_path + ".tmp"
    pq.write_table(rb, tmp)
    os.replace(tmp, rb_path)
    return {"files": len(files), "segments": n_seg, "rollbacks": rb.num_rows,
            "events": n_events}


# ---------------------------------------------------------------------------
# Publish side: lake → Debezium JSONL (the outbox / downstream feed)
# ---------------------------------------------------------------------------


def _envelope_lines(
    t: "pa.Table", snapshot_op: str | None = None, spec=None
) -> list[str]:
    """One changelog/snapshot block → JSONL envelope lines.  Row-wise
    json.dumps is inherent at the wire-format boundary (the landing
    parser is the vectorized direction); blocks serialize in parallel,
    one Ray task each.  ``spec`` generalizes beyond REPO_FILES: payload
    = every spec column except the order col and the merge-recomputed
    hash col; delete envelopes carry the key plus empty strings for
    the spec's required string fields (LWW consumers only need the
    key + a winning seq)."""
    import json

    if spec is None:
        from ..schema import REPO_FILES as spec  # noqa: N811

    payload_cols = [
        f.name
        for f in spec.schema
        if f.name != spec.order_col
        and f.name != spec.hash_col
        and f.name in t.column_names
    ]
    del_payload = {k: None for k in spec.key}
    for f in spec.schema:
        if (
            f.name not in spec.key
            and not f.nullable
            and pa.types.is_string(f.type)
            and f.name != spec.order_col
        ):
            del_payload[f.name] = ""
    lines = []
    for r in t.to_pylist():
        op = snapshot_op if snapshot_op is not None else r["op"]
        seq = r[spec.order_col] if snapshot_op is not None else r["seq"]
        if op == "d":
            # merge drops tombstones, so the deleting event's own seq is
            # not retained in lake state; any seq > the key's old winner
            # makes every LWW consumer converge, and within the exported
            # stream only the snapshot row (old_seq) competes for the key
            payload = dict(del_payload)
            for k in spec.key:
                payload[k] = r[k]
            env = {"op": "d", "before": payload, "after": None,
                   "seq": r["old_seq"] + 1}
        else:
            payload = {}
            for c in payload_cols:
                v = r[c]
                if v is None:
                    continue
                # Arrow map values arrive as [(k, v), ...] tuples
                payload[c] = (
                    dict(v) if pa.types.is_map(spec.schema.field(c).type) else v
                )
            env = {"op": op, "before": None, "after": payload, "seq": seq}
        lines.append(json.dumps(env, sort_keys=True))
    return lines


def export_debezium_jsonl(
    lake_dir: str,
    out_dir: str,
    *,
    gen_old: int,
    gen_new: int | None = None,
    snapshot: bool = False,
    spec=None,
) -> dict:
    """Export the lake's change feed as Debezium JSONL — the PUBLISH
    half of a CDC engine (the reference only consumes; a downstream
    system tailing THIS lake needs envelopes it can apply).  With
    ``snapshot=True`` the full ``gen_old`` state is emitted first as
    op "r" envelopes (Debezium's initial-snapshot phase), then the
    gen_old→gen_new changelog as c/u/d envelopes — exactly the
    two-phase stream :func:`land_debezium_jsonl` consumes, so an
    engine can bootstrap a REPLICA lake from another lake's export
    (tested round-trip: export → land → replay == source lake).

    Scale shape: snapshot blocks and changelog partitions serialize in
    parallel (one Ray task per block, write-then-rename); file names
    are content-derived, so a re-export into the same dir overwrites
    rather than duplicates (idempotent, like the landing side)."""
    from ..pipelines.replay import lake_changelog, read_lake
    from ..schema import REPO_FILES

    spec = spec if spec is not None else REPO_FILES
    snap_ds = read_lake(lake_dir, generation=gen_old) if snapshot else None
    feed_ds = lake_changelog(lake_dir, gen_old, gen_new, spec=spec)
    return _export_streams(snap_ds, feed_ds, out_dir, spec)


def _export_streams(snap_ds, feed_ds, out_dir: str, spec) -> dict:
    """Serialize snapshot/changelog Datasets into an envelope wire dir
    — one Ray task per block, write-then-rename, content-derived names
    (idempotent re-export)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def _write_block(t: pa.Table, kind: str, snapshot_op: str | None) -> int:
        lines = _envelope_lines(t, snapshot_op, spec)
        if not lines:
            return 0
        body = "\n".join(lines) + "\n"
        tag = hashlib.sha256(body.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"wire-{kind}-{tag}.jsonl")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(body)
        os.replace(tmp, path)
        return len(lines)

    def snap_block(t: pa.Table) -> pa.Table:
        n = _write_block(t, "snap", "r")
        return pa.table({"n": pa.array([n], pa.int64())})

    def cl_block(t: pa.Table) -> pa.Table:
        n = _write_block(t, "feed", None)
        return pa.table({"n": pa.array([n], pa.int64())})

    n_snap = 0
    if snap_ds is not None:
        snap = snap_ds.map_batches(snap_block, batch_format="pyarrow")
        n_snap = sum(r["n"] for r in snap.take_all())
    n_feed = 0
    if feed_ds is not None:
        feed = feed_ds.map_batches(cl_block, batch_format="pyarrow")
        n_feed = sum(r["n"] for r in feed.take_all())
    return {"snapshot_rows": n_snap, "changelog_rows": n_feed}


def export_tick(lake_dir: str, out_dir: str, *, spec=None) -> dict:
    """Continuous outbox: publish everything committed since the last
    export tick.  First call emits the op-'r' snapshot of the current
    generation (Debezium's bootstrap phase); every later call emits the
    changelog cursor→latest.  The cursor persists in the wire dir
    (tmp+rename AFTER the envelopes land on disk), so a crash between
    writing envelopes and advancing the cursor re-exports the same
    window — idempotent, because envelope file names are
    content-derived (re-export overwrites) and the landing side's LWW
    absorbs replays.  Tailing sync loop + export_tick = a full
    source→lake→wire→replica relay chain."""
    import json as _json

    from ..state.manifest import load_latest

    latest = load_latest(lake_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed generation under {lake_dir}")
    os.makedirs(out_dir, exist_ok=True)
    cursor_path = os.path.join(out_dir, "export-cursor.json")
    cursor = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            cursor = _json.load(fh)["generation"]
    if cursor is None:
        stats = export_debezium_jsonl(
            lake_dir, out_dir, gen_old=latest.generation, snapshot=True,
            spec=spec,
        )
        stats["mode"] = "snapshot"
    elif cursor == latest.generation:
        stats = {"snapshot_rows": 0, "changelog_rows": 0, "mode": "noop"}
    else:
        try:
            stats = export_debezium_jsonl(
                lake_dir, out_dir, gen_old=cursor, gen_new=latest.generation,
                spec=spec,
            )
        except (FileNotFoundError, ValueError) as e:
            # The cursor generation was GC'd, or a partition split broke
            # alignment.  A silent re-snapshot here would be WRONG: keys
            # deleted since the cursor have no tombstone in a snapshot,
            # so a replica that already consumed this wire dir would
            # keep them forever.  Re-bootstrap into a FRESH wire dir
            # (and point consumers at it) instead.
            raise RuntimeError(
                f"export cursor at generation {cursor} can no longer be "
                f"diffed against {latest.generation} ({e}); the changelog "
                "window was lost (GC or partition split). Re-bootstrap: "
                "export --tick into a NEW wire dir and rebuild consumers "
                "from its snapshot."
            ) from e
        stats["mode"] = "changelog"
    tmp = cursor_path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump({"generation": latest.generation}, fh)
    os.replace(tmp, cursor_path)
    stats["generation"] = latest.generation
    stats["since"] = cursor
    return stats


def export_fanout_tick(lake_dir: str, out_dir: str, tables) -> dict:
    """Cross-table-CONSISTENT outbox for a multi-table fan-out lake:
    one cursor covers every table (a single multi-manifest pins all
    tables' files together, so every per-table feed is cut at the same
    committed generation).  Envelope streams land under
    ``out_dir/<table>/``; first tick snapshots every table at the
    cursor generation (op 'r'), later ticks export each table's
    changelog cursor→latest.  Same idempotence story as
    :func:`export_tick` (content-derived names, cursor advanced
    tmp+rename only after every table's envelopes are on disk)."""
    import json as _json

    from ..pipelines.fanout import read_fanout_table
    from ..pipelines.replay import fanout_changelog
    from ..state.manifest import load_latest_multi

    latest = load_latest_multi(lake_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed multi-manifest under {lake_dir}")
    os.makedirs(out_dir, exist_ok=True)
    cursor_path = os.path.join(out_dir, "export-cursor.json")
    cursor = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            cursor = _json.load(fh)["generation"]
    per_table: dict[str, dict] = {}
    mode = "noop"
    for ft in tables:
        name = ft.spec.name
        sub = os.path.join(out_dir, name)
        if cursor is None:
            mode = "snapshot"
            snap = read_fanout_table(
                lake_dir, name, generation=latest.generation
            )
            per_table[name] = _export_streams(snap, None, sub, ft.spec)
        elif cursor == latest.generation:
            per_table[name] = {"snapshot_rows": 0, "changelog_rows": 0}
        else:
            mode = "changelog"
            try:
                feed = fanout_changelog(
                    lake_dir, name, cursor, latest.generation, spec=ft.spec
                )
            except (FileNotFoundError, ValueError) as e:
                raise RuntimeError(
                    f"fan-out export cursor at generation {cursor} can no "
                    f"longer be diffed against {latest.generation} ({e}); "
                    "re-bootstrap into a NEW wire dir."
                ) from e
            per_table[name] = _export_streams(None, feed, sub, ft.spec)
    tmp = cursor_path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump({"generation": latest.generation}, fh)
    os.replace(tmp, cursor_path)
    return {
        "mode": mode,
        "generation": latest.generation,
        "since": cursor,
        "tables": per_table,
    }
