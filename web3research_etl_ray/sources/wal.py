"""Binlog/WAL-style framed binary source (segments → canonical stream).

The second wire adapter next to the Debezium JSONL one
(sources/debezium.py): a MySQL-binlog/Postgres-WAL-shaped append-only
segment format, because the north rule's ingest side is literally
"binlog/WAL tail -> lake upsert".  The reference's analogue is the
provider fetch loop (src/ch_eth/init.rs:19-97) + new-head tail
(src/ch_eth/sync.rs:40-91); here the "provider" is a directory of
append-only binary segments that a database keeps writing to.

Segment layout (`wal-*.log`):

    magic  b"W3RWAL01"                              (8 bytes)
    record*:
        u32  payload_len   (bytes after the crc field)
        u64  seq           (LSN / commit_seq)
        u8   op            (0=upsert, 1=delete, 2=rollback)
        u32  crc32(payload)
        payload

Upsert/delete payload: length-prefixed UTF-8 fields
`repo path commit lang content`, then a u16 metadata pair count +
length-prefixed kv pairs, then u8 presence flag + i64 `size_bytes`.
Rollback payload: u64 orphan_from, u64 orphan_to.

Scale shape: one decode task per segment (segments are the unit of
parallelism, same as the engine's own stream layout); the frame walk
is a sequential header scan per segment — unavoidable for row-framed
logs, which is exactly why `land_wal_segments` converts ONCE to the
canonical Parquet layout and all recurring work (incremental ticks,
footer pruning, watermark pushdown) runs against Parquet.  Tail
semantics: the returned per-segment byte offsets feed the next call's
``since=`` so a growing last segment is re-read only past the saved
offset — the binlog-tail resume, without re-decoding landed bytes.
"""

from __future__ import annotations

import glob
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..schema import ROLLBACK_SCHEMA, UNIFIED_EVENT_SCHEMA, unify_to

MAGIC = b"W3RWAL01"
_HDR = struct.Struct("<IQBI")  # payload_len, seq, op, crc32
OP_UPSERT, OP_DELETE, OP_ROLLBACK = 0, 1, 2


# ---------------------------------------------------------------- encode

def _put_str(buf: bytearray, s: str | None) -> None:
    if s is None:
        buf += struct.pack("<I", 0xFFFFFFFF)
    else:
        b = s.encode("utf-8")
        buf += struct.pack("<I", len(b))
        buf += b


def encode_record(row: dict) -> bytes:
    """One canonical event row (UNIFIED_EVENT_SCHEMA keys) → one frame."""
    payload = bytearray()
    op = OP_DELETE if row["op"] == "delete" else OP_UPSERT
    for k in ("repo", "path", "commit", "lang", "content"):
        _put_str(payload, row.get(k))
    md = row.get("metadata")
    pairs = list(md.items()) if isinstance(md, dict) else list(md or [])
    if md is None:
        payload += struct.pack("<H", 0xFFFF)
    else:
        payload += struct.pack("<H", len(pairs))
        for k, v in pairs:
            _put_str(payload, k)
            _put_str(payload, v)
    sb = row.get("size_bytes")
    payload += struct.pack("<Bq", sb is not None, sb or 0)
    return _HDR.pack(len(payload), row["commit_seq"], op,
                     zlib.crc32(payload)) + bytes(payload)


def encode_rollback(barrier_seq: int, orphan_from: int, orphan_to: int) -> bytes:
    payload = struct.pack("<QQ", orphan_from, orphan_to)
    return _HDR.pack(len(payload), barrier_seq, OP_ROLLBACK,
                     zlib.crc32(payload)) + payload


def write_wal_segment(path: str, frames: list[bytes], append: bool = False):
    """Write (or append to) one segment file.  Append never rewrites
    landed bytes — the tail contract."""
    mode = "ab" if append and os.path.exists(path) else "wb"
    with open(path, mode) as fh:
        if mode == "wb":
            fh.write(MAGIC)
        for f in frames:
            fh.write(f)


def stream_to_wal(stream_dir: str, out_dir: str) -> list[str]:
    """Fixture helper: canonical parquet stream → WAL segments (one per
    events-*.parquet; rollbacks ride the last segment, frame order =
    commit order within a segment)."""
    os.makedirs(out_dir, exist_ok=True)
    seg_files = sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet")))
    out = []
    for i, f in enumerate(seg_files):
        rows = pq.read_table(f).to_pylist()
        rows.sort(key=lambda r: r["commit_seq"])
        p = os.path.join(out_dir, f"wal-{i:05d}.log")
        write_wal_segment(p, [encode_record(r) for r in rows])
        out.append(p)
    rb_path = os.path.join(stream_dir, "rollbacks.parquet")
    if os.path.exists(rb_path) and out:
        rb = pq.read_table(rb_path).to_pylist()
        write_wal_segment(
            out[-1],
            [encode_rollback(r["barrier_seq"], r["orphan_from"],
                             r["orphan_to"]) for r in rb],
            append=True,
        )
    return out


# ---------------------------------------------------------------- decode

def _get_str(mv: memoryview, off: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from("<I", mv, off)
    off += 4
    if n == 0xFFFFFFFF:
        return None, off
    return str(mv[off:off + n], "utf-8"), off + n


def decode_segment(data: bytes, start: int = 0) -> tuple[dict, int]:
    """Decode one segment's bytes past ``start`` (0 = from magic).

    Returns ({"events": pa.Table, "rollbacks": pa.Table}, end_offset).
    A truncated trailing frame (torn write of an in-flight append) is
    left unread — end_offset points at its first byte so the next tail
    tick picks it up; a CRC mismatch on a complete frame raises.
    """
    mv = memoryview(data)
    off = start
    if off == 0:
        if mv[:8] != MAGIC:
            raise ValueError("bad WAL magic")
        off = 8
    cols: dict[str, list] = {k: [] for k in (
        "repo", "path", "commit", "lang", "content", "commit_seq", "op",
        "metadata", "size_bytes")}
    rbs: dict[str, list] = {"barrier_seq": [], "orphan_from": [], "orphan_to": []}
    end = len(mv)
    while off + _HDR.size <= end:
        plen, seq, op, crc = _HDR.unpack_from(mv, off)
        body_at = off + _HDR.size
        if body_at + plen > end:
            break  # torn trailing frame — not yet fully flushed
        payload = mv[body_at:body_at + plen]
        if zlib.crc32(payload) != crc:
            raise ValueError(f"WAL crc mismatch at offset {off} (seq {seq})")
        if op == OP_ROLLBACK:
            f, t = struct.unpack_from("<QQ", payload, 0)
            rbs["barrier_seq"].append(seq)
            rbs["orphan_from"].append(f)
            rbs["orphan_to"].append(t)
        else:
            p = 0
            for k in ("repo", "path", "commit", "lang", "content"):
                v, p = _get_str(payload, p)
                cols[k].append(v)
            (npairs,) = struct.unpack_from("<H", payload, p)
            p += 2
            if npairs == 0xFFFF:
                cols["metadata"].append(None)
            else:
                kv = []
                for _ in range(npairs):
                    k, p = _get_str(payload, p)
                    v, p = _get_str(payload, p)
                    kv.append((k, v))
                cols["metadata"].append(kv)
            has_sb, sb = struct.unpack_from("<Bq", payload, p)
            cols["size_bytes"].append(sb if has_sb else None)
            cols["commit_seq"].append(seq)
            cols["op"].append("delete" if op == OP_DELETE else "upsert")
        off = body_at + plen
    # engine delete rows carry empty content (gen.py convention)
    cols["content"] = [c if c is not None else "" for c in cols["content"]]
    ev = pa.table(
        {k: pa.array(v, type=UNIFIED_EVENT_SCHEMA.field(k).type)
         for k, v in cols.items()}
    )
    ev = unify_to(ev, UNIFIED_EVENT_SCHEMA).sort_by([("commit_seq", "ascending")])
    rb = pa.table({k: pa.array(v, pa.int64()) for k, v in rbs.items()},
                  schema=ROLLBACK_SCHEMA)
    return {"events": ev, "rollbacks": rb}, off


# ---------------------------------------------------------------- landing

def _coverage_end(out_stream_dir: str, idx: int) -> int:
    """Highest byte offset of segment ``idx`` already covered by a
    committed landed file (names carry ``-{start}-{end}``).  Legacy
    single-offset names (older landings) contribute nothing — they
    predate the coverage rule."""
    prefix = f"events-wal-{idx:05d}-"
    best = 0
    for f in glob.glob(os.path.join(out_stream_dir, prefix + "*.parquet")):
        parts = os.path.basename(f)[len(prefix):-len(".parquet")].split("-")
        if len(parts) == 2:
            try:
                best = max(best, int(parts[1]))
            except ValueError:
                continue
    return best


@ray.remote
def _land_one(path: str, start: int, out_stream_dir: str, idx: int) -> dict:
    """Decode one segment past ``start`` and write its landed parquet.
    A plain Ray task (not a Dataset stage) because each segment maps to
    exactly one output file + one offset — there is no cross-segment
    exchange for a Dataset to schedule."""
    with open(path, "rb") as fh:
        data = fh.read()
    tables, end = decode_segment(data, start)
    seg_name = None
    if tables["events"].num_rows:
        # deterministic (segment, [start,end)) name: a crash-repeat
        # re-land of the same byte range OVERWRITES this file instead
        # of duplicating its frames, and the end offset in the name is
        # what lets the next landing derive coverage from the landing
        # zone itself (see _coverage_end) — idempotent landing,
        # required for additive tables
        seg_name = f"events-wal-{idx:05d}-{start:012d}-{end:012d}.parquet"
        dst = os.path.join(out_stream_dir, seg_name)
        tmp = dst + ".tmp"
        pq.write_table(tables["events"], tmp)
        os.replace(tmp, dst)
    return {
        "path": path, "offset": end, "segment": seg_name,
        "rollbacks": tables["rollbacks"], "events": tables["events"].num_rows,
    }


class WalTail:
    """Stateful binlog tail: each :meth:`land_new` call lands only the
    bytes appended to ``src`` since the previous call, persisting the
    per-segment offsets crash-safe (tmp + rename, written AFTER the
    landing itself).  A crash between landing and offset persist means
    the next call re-lands those frames — and because landed segment
    names are keyed by (segment, start offset), the re-land OVERWRITES
    the earlier landing (with a superset if the log grew) rather than
    duplicating frames.  The landing zone therefore never holds two
    copies of a frame, which keeps additive (``sum_cols``) tables exact
    — LWW tables would also absorb duplicates, but additive folds and
    repairs would double-count them (ADVICE r02).

    This is the ``wire=`` adapter for ``pipelines.tail.sync`` — the
    north rule's "binlog/WAL tail -> lake upsert" as one loop.
    """

    def __init__(self, src: str, out_stream_dir: str,
                 state_path: str | None = None):
        self.src = src
        self.out = out_stream_dir
        self.state_path = state_path or os.path.join(
            out_stream_dir, "_wal_offsets.json")
        self.offsets: dict[str, int] = {}
        if os.path.exists(self.state_path):
            import json

            with open(self.state_path) as fh:
                self.offsets = json.load(fh)

    def land_new(self) -> dict:
        info = land_wal_segments(self.src, self.out, since=self.offsets)
        self.offsets = info["offsets"]
        import json

        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.offsets, fh)
        os.replace(tmp, self.state_path)
        return info


def land_wal_segments(
    src: str | list[str],
    out_stream_dir: str,
    since: dict[str, int] | None = None,
) -> dict:
    """Convert WAL segments into the canonical stream layout.

    ``since`` maps segment path → byte offset already landed (a prior
    call's ``offsets``); segments are re-read only past it, so tailing
    a growing log costs O(new bytes).  Landed parquet names embed the
    start offset, so disjoint byte ranges land as distinct files while
    a crash-repeated land of the SAME range overwrites its earlier file
    — the landing zone never duplicates a frame (additive-table safe).

    Returns {"files", "segments", "rollbacks", "events", "offsets"}.
    """
    files = (
        sorted(glob.glob(os.path.join(src, "wal-*.log")))
        if isinstance(src, str)
        else list(src)
    )
    if not files:
        raise FileNotFoundError(f"no wal-*.log under {src!r}")
    os.makedirs(out_stream_dir, exist_ok=True)
    since = since or {}
    todo = []
    offsets = dict(since)
    for i, f in enumerate(files):
        # the landing zone is the source of truth for what already
        # landed: resume past max(caller's offset, landed coverage).
        # This makes landing idempotent even across a lost/stale
        # offsets file — bytes a committed landed segment covers are
        # never decoded into a second file, so additive (sum_cols)
        # tables can never double-count (ADVICE r02).
        start = max(since.get(f, 0), _coverage_end(out_stream_dir, i))
        if start < os.path.getsize(f):
            todo.append((f, start, i))
        elif start > since.get(f, 0):
            offsets[f] = start  # caller's state was stale — repair it
    results = ray.get([
        _land_one.remote(f, start, out_stream_dir, i) for f, start, i in todo
    ])
    rollbacks = [r["rollbacks"] for r in results if r["rollbacks"].num_rows]
    n_events = 0
    n_segs = 0
    for r in results:
        offsets[r["path"]] = r["offset"]
        n_events += r["events"]
        n_segs += r["segment"] is not None
    rb_path = os.path.join(out_stream_dir, "rollbacks.parquet")
    prior = [pq.read_table(rb_path)] if os.path.exists(rb_path) else []
    rb = (
        pa.concat_tables(prior + rollbacks)
        if (prior or rollbacks)
        else ROLLBACK_SCHEMA.empty_table()
    )
    # idempotent re-land: a rollback frame may be seen once per land call
    rb = rb.group_by(["barrier_seq", "orphan_from", "orphan_to"]).aggregate([])
    rb = rb.sort_by([("barrier_seq", "ascending")]).cast(ROLLBACK_SCHEMA)
    rb_tmp = rb_path + ".tmp"
    pq.write_table(rb, rb_tmp)
    os.replace(rb_tmp, rb_path)
    return {
        "files": len(files), "segments": n_segs, "rollbacks": rb.num_rows,
        "events": n_events, "offsets": offsets,
    }
