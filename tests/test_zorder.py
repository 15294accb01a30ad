"""Z-order clustered layout (functions/zorder.py): Morton math,
rectangle-scan exactness, and the multi-column pruning win over a
single-column-sorted layout."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from web3research_etl_ray.functions.zorder import (
    morton2,
    prune_files,
    zorder_scan,
    zorder_write,
)


def test_morton_interleave_bits():
    a = np.array([0b1011], np.uint64)
    b = np.array([0b0110], np.uint64)
    # a occupies even bit positions, b odd: 0b01101101 | check by hand
    z = int(morton2(a, b)[0])
    expect = 0
    for i in range(4):
        expect |= ((0b1011 >> i) & 1) << (2 * i)
        expect |= ((0b0110 >> i) & 1) << (2 * i + 1)
    assert z == expect


def _dataset(n=40_000, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.uniform(0, 1000, n)),
            "y": pa.array(rng.integers(0, 1000, n, dtype=np.int64)),
        }
    )


def test_zorder_rectangle_scan_exact(tmp_path):
    t = _dataset()
    out = str(tmp_path / "z")
    files = zorder_write(
        ray.data.from_arrow(t).repartition(8), out, ("x", "y"),
        num_files=16,
    )
    assert len(files) >= 8
    preds = [("x", ">=", 100.0), ("x", "<=", 200.0),
             ("y", ">=", 300), ("y", "<=", 400)]
    ds, n_read, n_total = zorder_scan(out, preds, columns=["id", "x", "y"])
    got = sorted(r["id"] for r in ds.take_all())
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    mask = (x >= 100.0) & (x <= 200.0) & (y >= 300) & (y <= 400)
    assert got == list(np.flatnonzero(mask))
    assert n_read < n_total  # the rectangle must prune something


def test_zorder_prunes_better_than_single_sort(tmp_path):
    """A layout sorted only by x cannot prune a selective y predicate;
    the Morton layout prunes BOTH dimensions."""
    t = _dataset()
    zdir = str(tmp_path / "z")
    zorder_write(ray.data.from_arrow(t), zdir, ("x", "y"), num_files=16)

    sdir = str(tmp_path / "s")
    os.makedirs(sdir)
    xs = t.sort_by([("x", "ascending")])
    rows = xs.num_rows
    per = (rows + 15) // 16
    sfiles = []
    for i in range(16):
        chunk = xs.slice(i * per, per)
        p = os.path.join(sdir, f"z-{i:05d}.parquet")
        pq.write_table(chunk, p, row_group_size=4096)
        sfiles.append(p)

    preds = [("x", ">=", 100.0), ("x", "<=", 900.0),
             ("y", ">=", 450), ("y", "<=", 500)]
    z_keep = prune_files(
        sorted(
            os.path.join(zdir, f) for f in os.listdir(zdir)
        ),
        preds,
    )
    s_keep = prune_files(sfiles, preds)
    # x-span covers ~80% of files in the x-sorted layout and y prunes
    # nothing there; the z-layout localizes the y band too
    assert len(z_keep) < len(s_keep)


def test_zorder_scan_empty_rectangle(tmp_path):
    t = _dataset(2000)
    out = str(tmp_path / "z")
    zorder_write(ray.data.from_arrow(t), out, ("x", "y"), num_files=4)
    ds, n_read, n_total = zorder_scan(
        out, [("x", ">", 5000.0)], columns=["id"]
    )
    assert ds.count() == 0 and n_read == 0 and n_total >= 1
