"""User-extension surface (SURVEY.md §2.10): a brand-new TableSpec —
different key columns/types, different order column, no content hash,
no op column in the source — replayed through the UNCHANGED engine
core, incl. incremental tail and deletes via an op column."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.schema import TableSpec

KV_LAKE = pa.schema(
    [
        pa.field("user_id", pa.int64(), nullable=False),
        pa.field("metric", pa.string(), nullable=False),
        pa.field("val", pa.float64(), nullable=True),
        pa.field("seq", pa.int64(), nullable=False),
    ]
)

KV_FLIGHT = KV_LAKE.append(pa.field("op", pa.string(), nullable=True))

KV_SPEC = TableSpec(
    name="kv_metrics",
    schema=KV_LAKE,
    key=("user_id", "metric"),
    order_col="seq",
    event_schema=KV_FLIGHT,
)


def _write_stream(d, rows):
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            "val": pa.array([r[2] for r in rows], pa.float64()),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            **(
                {"op": pa.array([r[4] for r in rows], pa.string())}
                if len(rows[0]) > 4
                else {}
            ),
        }
    )
    n = len(os.listdir(d))
    pq.write_table(t, os.path.join(d, f"events-{n:05d}.parquet"))


def test_custom_spec_replay_and_tail(tmp_path):
    stream = str(tmp_path / "kv_stream")
    lake = str(tmp_path / "kv_lake")
    # segment 1: no op column at all (pure upsert source)
    _write_stream(stream, [
        (1, "cpu", 0.5, 0), (1, "cpu", 0.7, 2), (2, "mem", 0.1, 1),
        (1, "cpu", 0.6, 1),  # out of order, loses to seq 2
    ])
    m = replay(stream, lake, num_partitions=4, spec=KV_SPEC)
    state = {
        (r["user_id"], r["metric"]): (r["val"], r["seq"])
        for r in lake_table(lake).to_pylist()
    }
    assert state == {(1, "cpu"): (0.7, 2), (2, "mem"): (0.1, 1)}

    # segment 2: op column appears (schema evolution) and deletes a key
    _write_stream(stream, [
        (2, "mem", 0.9, 3, "upsert"), (1, "cpu", None, 4, "delete"),
        (3, "io", 1.5, 5, "upsert"),
    ])
    m2 = replay(stream, lake, num_partitions=4, spec=KV_SPEC)
    assert m2.generation == 1
    state = {
        (r["user_id"], r["metric"]): (r["val"], r["seq"])
        for r in lake_table(lake).to_pylist()
    }
    assert state == {(2, "mem"): (0.9, 3), (3, "io"): (1.5, 5)}
    assert m2.max_watermark == 5


def test_custom_spec_idempotent_retick(tmp_path):
    stream = str(tmp_path / "kv_stream")
    lake = str(tmp_path / "kv_lake")
    _write_stream(stream, [(1, "cpu", 0.5, 0), (2, "mem", 0.1, 1)])
    replay(stream, lake, num_partitions=4, spec=KV_SPEC)
    replay(stream, lake, num_partitions=4, spec=KV_SPEC)
    assert lake_table(lake).num_rows == 2


def test_custom_spec_check_and_repair_roundtrip(tmp_path):
    """VERDICT r01 #7: the conformance check generalized over TableSpec
    — corrupt a custom-spec lake partition, check() must localize it,
    repair() must rebuild it from event history."""
    import glob

    from web3research_etl_ray.pipelines.check import check, repair

    stream = str(tmp_path / "kv_stream")
    lake = str(tmp_path / "kv_lake")
    rows = [(u, m, float(u) + s, s) for s, (u, m) in enumerate(
        (u, m) for u in range(1, 9) for m in ("cpu", "mem", "io")
    )]
    _write_stream(stream, rows)
    replay(stream, lake, num_partitions=4, spec=KV_SPEC)

    rep = check(stream, lake, spec=KV_SPEC)
    assert rep.ok and rep.partitions_checked > 0

    # corrupt one partition file: flip a val
    part = sorted(glob.glob(os.path.join(lake, "data", "gen=*", "part-*.parquet")))[0]
    t = pq.read_table(part)
    vals = t.column("val").to_pylist()
    vals[0] = 999.75
    t = t.set_column(t.schema.get_field_index("val"), "val",
                     pa.array(vals, pa.float64()))
    pq.write_table(t, part)

    rep2 = check(stream, lake, spec=KV_SPEC)
    assert not rep2.ok and rep2.mismatched == 1
    assert len(rep2.bad_partitions) == 1

    repair(stream, lake, rep2.bad_partitions, spec=KV_SPEC)
    rep3 = check(stream, lake, spec=KV_SPEC)
    assert rep3.ok


ADD_LAKE = pa.schema(
    [
        pa.field("user_id", pa.int64(), nullable=False),
        pa.field("hits", pa.int64(), nullable=False),
        pa.field("bytes", pa.int64(), nullable=False),
        pa.field("peak", pa.int64(), nullable=True),
        pa.field("seq", pa.int64(), nullable=False),
    ]
)

ADD_SPEC = TableSpec(
    name="user_counters",
    schema=ADD_LAKE,
    key=("user_id",),
    order_col="seq",
    event_schema=ADD_LAKE.append(pa.field("op", pa.string(), nullable=True)),
    sum_cols=("hits", "bytes"),
    max_cols=("peak",),
)


def _write_add_stream(d, rows):
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "hits": pa.array([r[1] for r in rows], pa.int64()),
            "bytes": pa.array([r[2] for r in rows], pa.int64()),
            "peak": pa.array([r[2] for r in rows], pa.int64()),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    n = len(os.listdir(d))
    pq.write_table(t, os.path.join(d, f"events-{n:05d}.parquet"))


def test_additive_spec_single_table_replay_and_tail(tmp_path):
    """The generic single-table engine honors sum_cols: accumulation
    across ticks, idempotent re-tick, exactly-once on skewed per-
    partition watermarks."""
    stream = str(tmp_path / "add_stream")
    lake = str(tmp_path / "add_lake")
    _write_add_stream(stream, [
        (1, 1, 100, 0), (1, 1, 50, 2), (2, 1, 10, 1),
    ])
    replay(stream, lake, num_partitions=4, spec=ADD_SPEC)

    def rows():
        t = lake_table(lake)
        return {
            r["user_id"]: (r["hits"], r["bytes"], r["peak"], r["seq"])
            for r in t.to_pylist()
        }

    assert rows() == {1: (2, 150, 100, 2), 2: (1, 10, 10, 1)}
    # re-tick: nothing new → unchanged
    replay(stream, lake, num_partitions=4, spec=ADD_SPEC)
    assert rows() == {1: (2, 150, 100, 2), 2: (1, 10, 10, 1)}
    # incremental tail with skewed seqs: user 1 far ahead of user 2 —
    # the new segment's low seqs (for user 2) must still apply exactly
    # once even though user 1's partition watermark is higher
    _write_add_stream(stream, [
        (2, 1, 5, 3), (1, 1, 25, 10), (3, 2, 7, 4),
    ])
    replay(stream, lake, num_partitions=4, spec=ADD_SPEC)
    want = {1: (3, 175, 100, 10), 2: (2, 15, 10, 3), 3: (2, 7, 7, 4)}
    assert rows() == want
    # one more empty tick: still unchanged (incl. running max)
    replay(stream, lake, num_partitions=4, spec=ADD_SPEC)
    assert rows() == want


def test_multi_column_binary_key_end_to_end(tmp_path):
    """ADVICE r04: a multi-column key with a binary component must stay
    collision-free under the length-prefixed framing — the adversarial
    pair ('a\\x00','b') vs ('a','\\x00b') joined identically under the
    old \\x00-separator join.  Replays both keys through the full
    engine (they must land as TWO rows) and runs the conformance check
    over the binary-keyed spec."""
    from web3research_etl_ray.pipelines.check import check

    BK_LAKE = pa.schema(
        [
            pa.field("addr", pa.binary(), nullable=False),
            pa.field("slot", pa.binary(), nullable=False),
            pa.field("val", pa.int64(), nullable=True),
            pa.field("seq", pa.int64(), nullable=False),
        ]
    )
    BK_SPEC = TableSpec(
        name="bk_state",
        schema=BK_LAKE,
        key=("addr", "slot"),
        order_col="seq",
        event_schema=BK_LAKE.append(pa.field("op", pa.string())),
    )
    stream = str(tmp_path / "bk_stream")
    os.makedirs(stream)
    rows = [
        # the adversarial colliding pair + NUL-heavy binary values
        (b"a\x00", b"b", 1, 0, "upsert"),
        (b"a", b"\x00b", 2, 1, "upsert"),
        (b"\x00\x00", b"\x00", 3, 2, "upsert"),
        (b"a\x00", b"b", 10, 3, "upsert"),  # LWW update of key 1
        (b"\x00\x00", b"\x00", 0, 4, "delete"),
    ]
    pq.write_table(
        pa.table(
            {
                "addr": pa.array([r[0] for r in rows], pa.binary()),
                "slot": pa.array([r[1] for r in rows], pa.binary()),
                "val": pa.array([r[2] for r in rows], pa.int64()),
                "seq": pa.array([r[3] for r in rows], pa.int64()),
                "op": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        os.path.join(stream, "events-00000.parquet"),
    )
    lake = str(tmp_path / "bk_lake")
    replay(stream, lake, num_partitions=4, spec=BK_SPEC)
    t = lake_table(lake, spec=BK_SPEC) if "spec" in (
        lake_table.__code__.co_varnames
    ) else lake_table(lake)
    got = {
        (r["addr"], r["slot"]): r["val"] for r in t.to_pylist()
    }
    # distinct keys stayed distinct; LWW applied; delete applied
    assert got == {(b"a\x00", b"b"): 10, (b"a", b"\x00b"): 2}
    report = check(stream, lake, spec=BK_SPEC)
    assert report.ok, report
