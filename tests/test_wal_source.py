"""WAL binary source: framed segments land to the canonical stream and
replay to a byte-identical lake; byte-offset tailing resumes a growing
segment without re-decoding landed bytes; torn/corrupt frames behave."""

import os

from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.sources.wal import (
    MAGIC,
    decode_segment,
    encode_record,
    encode_rollback,
    land_wal_segments,
    stream_to_wal,
    write_wal_segment,
)


def _row(seq, repo="r1", path="a.py", op="upsert", **kw):
    return {
        "repo": repo, "path": path, "commit": f"c{seq}", "lang": "py",
        "content": f"x = {seq}\n" if op == "upsert" else "",
        "commit_seq": seq, "op": op,
        "metadata": kw.get("metadata"), "size_bytes": kw.get("size_bytes"),
    }


def test_wal_landing_replays_to_identical_lake(tmp_path):
    stream = ensure_stream(2_000)
    wal_dir = str(tmp_path / "wal")
    landed = str(tmp_path / "landed")
    stream_to_wal(stream, wal_dir)
    info = land_wal_segments(wal_dir, landed)
    assert info["segments"] >= 1 and info["rollbacks"] >= 1

    lake_a = str(tmp_path / "lake_parquet")
    lake_b = str(tmp_path / "lake_wal")
    replay(stream, lake_a, num_partitions=4)
    replay(landed, lake_b, num_partitions=4)
    assert tables_equal(lake_table(lake_a), lake_table(lake_b))
    assert tables_equal(lake_table(lake_b), oracle_fold(stream))


def test_wal_tail_resume_and_torn_frame(tmp_path):
    seg = str(tmp_path / "wal-00000.log")
    landed = str(tmp_path / "landed")
    write_wal_segment(seg, [encode_record(_row(i)) for i in range(3)])
    info1 = land_wal_segments([seg], landed)
    assert info1["events"] == 3
    off1 = info1["offsets"][seg]
    assert off1 == os.path.getsize(seg)

    # append two frames, the second torn mid-payload (in-flight flush)
    f3 = encode_record(_row(3, metadata={"k": "v"}, size_bytes=7))
    f4 = encode_record(_row(4))
    write_wal_segment(seg, [f3], append=True)
    with open(seg, "ab") as fh:
        fh.write(f4[: len(f4) - 5])
    info2 = land_wal_segments([seg], landed, since=info1["offsets"])
    assert info2["events"] == 1  # only the complete frame
    assert info2["offsets"][seg] == off1 + len(f3)  # parked at torn frame

    # complete the torn frame + a rollback, tail again
    with open(seg, "ab") as fh:
        fh.write(f4[len(f4) - 5:])
    write_wal_segment(seg, [encode_rollback(5, 2, 2)], append=True)
    info3 = land_wal_segments([seg], landed, since=info2["offsets"])
    assert info3["events"] == 1 and info3["rollbacks"] == 1
    assert info3["offsets"][seg] == os.path.getsize(seg)

    lake = str(tmp_path / "lake")
    replay(landed, lake, num_partitions=2)
    rows = {r["commit_seq"]: r for r in lake_table(lake).to_pylist()}
    # seq 4 wins the key; seq 2 was rolled back but superseded anyway
    assert set(rows) == {4}
    assert rows[4]["content"] == "x = 4\n"

    # idempotent re-land from saved offsets: nothing new
    info4 = land_wal_segments([seg], landed, since=info3["offsets"])
    assert info4["events"] == 0 and info4["rollbacks"] == 1


def test_wal_crc_mismatch_raises(tmp_path):
    frames = [encode_record(_row(i)) for i in range(2)]
    data = MAGIC + b"".join(frames)
    corrupted = bytearray(data)
    corrupted[-3] ^= 0xFF  # flip a payload byte of the last frame
    try:
        decode_segment(bytes(corrupted))
        raise AssertionError("expected crc mismatch")
    except ValueError as e:
        assert "crc mismatch" in str(e)


def test_wal_none_metadata_and_null_fields_roundtrip():
    rows = [
        _row(0, metadata=None, size_bytes=None),
        _row(1, metadata={}, size_bytes=0),
        _row(2, metadata={"a": "1", "b": "2"}, size_bytes=9),
        _row(3, op="delete"),
    ]
    data = MAGIC + b"".join(encode_record(r) for r in rows)
    tables, end = decode_segment(data)
    assert end == len(data)
    got = tables["events"].to_pylist()
    assert got[0]["metadata"] is None and got[0]["size_bytes"] is None
    assert got[1]["metadata"] == [] and got[1]["size_bytes"] == 0
    assert dict(got[2]["metadata"]) == {"a": "1", "b": "2"}
    assert got[3]["op"] == "delete" and got[3]["content"] == ""
