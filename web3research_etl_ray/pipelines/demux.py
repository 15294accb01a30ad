"""Type demux — the reference's 40-way Tron contract demultiplexer
(src/ch_tron/init.rs:374-820: parse payload once → typed row appended
to that contract type's table) re-expressed Ray-Data-first: one
``map_batches`` pass tags/normalizes, then a single partitioned write
fans rows out into one directory per type value.  No per-type scans,
no 40 filter passes — the hive partition layout IS the demux.
"""

from __future__ import annotations

import os

import ray.data


def demux_to_tables(
    ds: ray.data.Dataset,
    type_col: str,
    out_dir: str,
) -> dict[str, dict]:
    """Write one sub-table per distinct ``type_col`` value under
    ``out_dir/<type_col>=<value>/``; returns {value: {rows, files}}.

    The reference tries 40 typed protobuf decodes per tx and appends to
    40 buffers; here the tag column routes rows in one pass and the
    sink partitions by it."""
    ds.write_parquet(out_dir, partition_cols=[type_col])
    out: dict[str, dict] = {}
    prefix = f"{type_col}="
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith(prefix):
            continue
        val = d[len(prefix):]
        import pyarrow.dataset as pads

        sub = pads.dataset(os.path.join(out_dir, d))
        out[val] = {
            "rows": sum(f.count_rows() for f in sub.get_fragments()),
            "files": len(list(sub.files)),
            "path": os.path.join(out_dir, d),
        }
    return out


def read_demuxed(out_dir: str, type_col: str, value: str) -> ray.data.Dataset:
    """Read back one demuxed sub-table (partition-pruned at the path)."""
    return ray.data.read_parquet(os.path.join(out_dir, f"{type_col}={value}"))
