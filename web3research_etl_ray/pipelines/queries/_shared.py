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

from ...functions.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
)
from ...functions.hashing import key_hash64, rolling_fingerprint, sha256_hex
from ...functions.multimodal import media_feature_pipeline
from ...functions.similarity import cosine_neardup_pairs, knn_brute, knn_lsh
from ...functions.text import lang_id, quality_score, simhash64, token_stats
from ...stages.lww import fold_lww
from ..curate import filter_to_reps as _filter_to_reps

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


