"""Training-data curation pipeline — the flagship composition.

One streaming pass over a documents table fuses the per-batch scans
(PII counts + quality score + language-ID: each text is scanned while
already in cache), filters, exact-dedups the survivors, and emits the
curated corpus.  The operator core of what a 100 TB pre-training data
run does before tokenization.

Scale shape
-----------
- The fused scan is RE2-bound and embarrassingly parallel.
- Survivors materialize ONCE into (spillable) object-store blocks so
  the expensive scan never re-executes per consumer — a cache, not a
  driver collect.
- The dedup fold ships one row per (sha, batch); the keep-filter
  broadcasts the rep-id set when small and switches to the
  distributed semi hash-join past ``KEEP_BROADCAST_MAX`` reps
  (at 10^10 distinct texts the keep-set cannot ride the object store
  as one blob, but it shards fine through the bucket exchange).
- ``curate_to_dir`` writes hive-partitioned Parquet by predicted
  language — resumable output, one directory per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

#: above this many representatives the keep-filter switches from a
#: broadcast membership test (memory O(reps)) to the distributed semi
#: hash-join (memory O(reps / buckets)).
KEEP_BROADCAST_MAX = 5_000_000


def filter_to_reps(
    ds: ray.data.Dataset,
    reps: ray.data.Dataset,
    *,
    broadcast_max: int = KEEP_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Keep only rows of ``ds`` whose doc_id is a dedup representative.

    Small rep sets broadcast once (``ray.put`` + vectorized ``isin``);
    large ones go through the distributed semi join."""
    n_reps = reps.count()
    if n_reps <= broadcast_max:
        rep_ids = np.sort(
            np.concatenate(
                [
                    b["rep_id"]
                    for b in reps.select_columns(["rep_id"]).iter_batches(
                        batch_format="numpy", batch_size=None
                    )
                ]
                or [np.zeros(0, np.int64)]
            )
        )
        ref = ray.put(rep_ids)

        def keep(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, ray.get(ref))))

        return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    from ..functions.joins import hash_join

    rep_keys = reps.map_batches(
        lambda t: pa.table({"doc_id": t.column("rep_id").cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return hash_join(ds, rep_keys, "doc_id", how="semi")


def _probe_fn(root: str, committed: list[str]):
    """Factory for the per-bucket index-membership probe — shared by
    the distributed groupby path and the driver-local tick."""
    import os

    def probe(g: pa.Table) -> pa.Table:
        # membership stays Arrow end to end: the bucket's sha files
        # concat into ONE value set and pc.is_in does the lookup —
        # no Python set / per-row loop (a 10^9-doc index bucket
        # would otherwise build a ~10^7-entry set per tick bucket)
        k = int(g.column("bucket")[0].as_py())
        parts: list[pa.Array] = []

        def _extend(path: str) -> None:
            col = pq.read_table(path).column("text_sha256")
            parts.extend(col.chunks)

        base_f = os.path.join(root, "base", f"bucket={k}", "shas.parquet")
        if os.path.exists(base_f):
            _extend(base_f)
        for tid in committed:
            d = os.path.join(root, "ticks", tid, f"bucket={k}")
            if os.path.isdir(d):
                for f in os.listdir(d):
                    _extend(os.path.join(d, f))
        if not parts:
            return g
        seen = pa.concat_arrays(parts)
        hit = pc.is_in(g.column("text_sha256"), value_set=seen)
        return g.filter(pc.invert(hit))

    return probe


def _curate_stage_fn(quality_min: float):
    """The fused per-batch scan (lang-ID → PII → quality → filter) —
    ONE closure shared by the distributed `curate` pipeline and the
    CurateIndex driver-local tick, so the two paths cannot diverge."""
    from ..functions.text import lang_id, pii_scan, quality_score

    out_cols = ["doc_id", "text", "lang_pred", "n_tokens", "quality"]

    def stage(t: pa.Table) -> pa.Table:
        t = quality_score(pii_scan(lang_id(t)))
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("quality"), pa.scalar(quality_min)),
                pc.not_equal(t.column("lang_pred"), pa.scalar("und")),
            ),
            pc.equal(
                pc.add(
                    pc.add(t.column("n_emails"), t.column("n_ipv4")),
                    t.column("n_long_digits"),
                ),
                pa.scalar(0, pa.int64()),
            ),
        )
        return t.filter(mask).select(out_cols)

    return stage


def curate(
    ds: ray.data.Dataset,
    *,
    quality_min: float = 0.75,
    keep_text: bool = False,
    broadcast_max: int = KEEP_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Curated dataset: PII-free, quality ≥ ``quality_min``, language
    identified, exact-deduplicated (representative = min doc_id per
    text).  Columns: doc_id, lang_pred, n_tokens, quality (+ text when
    ``keep_text``)."""
    from ..functions.dedup import exact_dedup_groups

    stage = _curate_stage_fn(quality_min)
    survivors = ds.map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    reps = exact_dedup_groups(survivors).materialize()
    out = filter_to_reps(survivors, reps, broadcast_max=broadcast_max)
    if keep_text:
        return out
    return out.map_batches(
        lambda t: t.drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _sha_bucket(sha_hex: pa.Array | pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Bucket id from the digest's leading 8 hex chars (uniform),
    vectorized off the string buffers."""
    arr = sha_hex.combine_chunks() if isinstance(
        sha_hex, pa.ChunkedArray
    ) else sha_hex
    if len(arr) == 0:
        return np.zeros(0, np.int64)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], odt)[
        arr.offset : arr.offset + len(arr)
    ]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    key = np.zeros(len(arr), np.uint64)
    for i in range(8):
        key = (key << np.uint64(8)) | data[offs + i].astype(np.uint64)
    return (key % np.uint64(n_buckets)).astype(np.int64)


class CurateIndex:
    """Incremental curation at ingest: a persistent, bucketed
    content-sha index makes each curation tick O(new docs), not
    O(corpus) — the CDC-native form of the batch ``curate`` flagship
    (same philosophy as ``pipelines/dedup_index.py::MinHashIndex``).

        <root>/config.json            params (validated per tick)
        <root>/shas/bucket=K/*.parquet   (text_sha256,) rows

    Per tick: fused scan + filter over the NEW docs only →
    within-tick exact dedup (first-seen wins) → cross-tick dedup by
    probing ONLY the sha buckets the tick touches (dir-level pruning;
    the 10^10-doc index never scans) → append the surviving shas, one
    file per touched bucket per tick.

    First-seen-wins note: ticks arrive in doc_id order (CDC arrival),
    so the tick-local min-doc_id representative equals the global
    batch representative — asserted by the ticks==batch equivalence
    test.

    Exactly-once: a tick stages its output table AND its per-bucket
    sha files under ``staged/<tick_id>/`` and commits with one atomic
    directory rename into ``ticks/<tick_id>/`` — the same two-phase
    pattern as the lake manifest.  A crash before the rename leaves
    no committed trace (full re-tick reproduces everything); a replay
    of an already-committed tick_id returns the STORED output without
    touching the index (idempotent).  Probes read committed ticks
    only."""

    def __init__(self, root: str, *, quality_min: float = 0.75,
                 n_buckets: int = 64):
        import json
        import os

        self.root = root
        self.quality_min = quality_min
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)
        cfg_path = os.path.join(root, "config.json")
        cfg = {"quality_min": quality_min, "n_buckets": n_buckets}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                prev = json.load(f)
            if prev != cfg:
                raise ValueError(
                    f"index at {root} was built with {prev}, got {cfg}"
                )
        else:
            with open(cfg_path, "w") as f:
                json.dump(cfg, f)
        self._recover_base()

    def _recover_base(self) -> None:
        """Repair a compact() interrupted between its two directory
        renames: ``base.old`` without ``base`` means the swap never
        completed — roll it back so the folded ticks' shas (whose
        per-tick bucket dirs were already deleted by the PREVIOUS
        successful compact) stay visible to probe().  ``base.old``
        alongside ``base`` means the swap completed — drop the
        leftover."""
        import os
        import shutil

        base = os.path.join(self.root, "base")
        old = base + ".old"
        if os.path.isdir(old):
            if os.path.isdir(base):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.replace(old, base)

    _EMPTY = {
        "doc_id": pa.int64(), "lang_pred": pa.string(),
        "n_tokens": pa.int64(), "quality": pa.float64(),
    }

    def _committed_ticks(self) -> list[str]:
        import os

        d = os.path.join(self.root, "ticks")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    def compact(self) -> dict:
        """Fold every committed tick's sha files into one base file
        per bucket (probe reads stay O(1 file + recent ticks) instead
        of O(all ticks)).  Outputs (ticks/<tid>/output.parquet) are
        kept for idempotent replay; only the bucket dirs fold.  The
        folded-tick list commits atomically with the base via a
        staged rename."""
        import json
        import os
        import shutil

        self._recover_base()
        folded = self._folded()
        to_fold = [t for t in self._committed_ticks() if t not in folded]
        if not to_fold:
            return {"folded_ticks": 0}
        staged = os.path.join(self.root, "staged", "__base__")
        shutil.rmtree(staged, ignore_errors=True)
        os.makedirs(staged, exist_ok=True)
        n_files = 0
        for k in range(self.n_buckets):
            parts = []
            base_f = os.path.join(self.root, "base", f"bucket={k}",
                                  "shas.parquet")
            if os.path.exists(base_f):
                parts.append(pq.read_table(base_f))
            for tid in to_fold:
                d = os.path.join(self.root, "ticks", tid, f"bucket={k}")
                if os.path.isdir(d):
                    parts.extend(
                        pq.read_table(os.path.join(d, f))
                        for f in os.listdir(d)
                    )
            if parts:
                d = os.path.join(staged, f"bucket={k}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    pa.concat_tables(parts), os.path.join(d, "shas.parquet")
                )
                n_files += 1
        with open(os.path.join(staged, "meta.json"), "w") as f:
            json.dump({"folded": sorted(folded | set(to_fold))}, f)
        base = os.path.join(self.root, "base")
        old = base + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(base):
            os.replace(base, old)
        os.replace(staged, base)
        # a crash between the two os.replace calls above leaves base.old
        # without base — _recover_base() (run on every open and at the
        # top of compact) rolls the swap back, so folded shas are never
        # invisible to probe()
        shutil.rmtree(old, ignore_errors=True)
        # folded bucket dirs are now redundant bytes; drop them
        for tid in to_fold:
            for e in os.listdir(os.path.join(self.root, "ticks", tid)):
                if e.startswith("bucket="):
                    shutil.rmtree(
                        os.path.join(self.root, "ticks", tid, e),
                        ignore_errors=True,
                    )
        return {"folded_ticks": len(to_fold), "base_buckets": n_files}

    def _folded(self) -> set[str]:
        import json
        import os

        meta = os.path.join(self.root, "base", "meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                return set(json.load(f)["folded"])
        return set()

    def tick(self, docs: ray.data.Dataset,
             tick_id: str | None = None) -> pa.Table:
        """Curate the new docs against everything seen so far; returns
        the curated NEW rows and absorbs their shas into the index.
        ``tick_id`` names the tick for idempotent replay (default: a
        deterministic key from the tick's doc_id span + count).
        Runs under the index's single-writer lease (same contract as
        the lake: a second live writer refuses, a dead one is taken
        over)."""
        from ..state.manifest import acquire_lease, release_lease

        created = acquire_lease(self.root)
        try:
            return self._tick_locked(docs, tick_id)
        finally:
            if created:
                release_lease(self.root)

    def _tick_locked(self, docs: ray.data.Dataset,
                     tick_id: str | None) -> pa.Table:
        import os
        import shutil

        from ray.data.aggregate import Count, Max, Min

        from ..functions.dedup import add_text_sha, exact_dedup_groups

        # Size-adaptive tick (same move as the dedup index / replay
        # driver legs): a small tick pays ~6 Ray-execution fixed costs
        # for milliseconds of compute — stream the docs and run the
        # whole tick in-process under the threshold.
        limit = int(os.environ.get("W3R_CURATE_DRIVER_TICK_ROWS", 50_000))
        batches: list[pa.Table] = []
        nrows = 0
        small = True
        for rb in docs.iter_batches(batch_format="pyarrow", batch_size=None):
            batches.append(rb)
            nrows += rb.num_rows
            if nrows > limit:
                small = False
                break
        if small:
            t_docs = (
                pa.concat_tables(batches, promote_options="default")
                if batches
                else pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "text": pa.array([], pa.string())}
                )
            )
            return self._tick_driver(t_docs, tick_id)

        if tick_id is None:
            b = docs.aggregate(
                Min("doc_id", alias_name="lo"),
                Max("doc_id", alias_name="hi"),
                Count(alias_name="n"),
            )
            tick_id = f"t{b['lo']}-{b['hi']}-{b['n']}"
        tick_dir = os.path.join(self.root, "ticks", tick_id)
        if os.path.isdir(tick_dir):  # committed before: replay output
            return pq.read_table(os.path.join(tick_dir, "output.parquet"))

        survivors = curate(docs, quality_min=self.quality_min,
                           keep_text=True)
        reps = exact_dedup_groups(survivors)  # within-tick, first wins
        tick_rows = filter_to_reps(survivors, reps.materialize())
        with_sha = tick_rows.map_batches(
            add_text_sha, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(
            lambda t: t.drop_columns(["text"]).append_column(
                "bucket",
                pa.array(_sha_bucket(t.column("text_sha256"),
                                     self.n_buckets), pa.int64()),
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )

        folded = self._folded()
        committed = [t for t in self._committed_ticks() if t not in folded]
        probe = _probe_fn(self.root, committed)

        out = with_sha.groupby("bucket").map_groups(
            probe, batch_format="pyarrow"
        )
        blocks = [b for b in ray.get(out.to_arrow_refs()) if b.num_rows]
        t = (
            pa.concat_tables(blocks, promote_options="default")
            if blocks
            else pa.table({})
        )
        return self._finish_tick(t, tick_id)

    def _tick_driver(self, t_docs: pa.Table,
                     tick_id: str | None) -> pa.Table:
        """Driver-local tick: identical semantics, zero Ray executions.
        Every kernel is the one the distributed path maps over blocks
        (the fused curate stage, sha dedup with min-doc_id reps, the
        shared _probe_fn membership check) and the commit tail is the
        SAME _finish_tick; forced-path equivalence is asserted in
        tests/test_curate_index.py."""
        import os

        from ..functions.dedup import add_text_sha

        if tick_id is None:
            n = t_docs.num_rows
            if n:
                ids0 = t_docs.column("doc_id").to_numpy(
                    zero_copy_only=False
                )
                tick_id = f"t{int(ids0.min())}-{int(ids0.max())}-{n}"
            else:
                tick_id = "tNone-None-0"
        tick_dir = os.path.join(self.root, "ticks", tick_id)
        if os.path.isdir(tick_dir):  # committed before: replay output
            return pq.read_table(os.path.join(tick_dir, "output.parquet"))

        s = _curate_stage_fn(self.quality_min)(t_docs)
        sh = add_text_sha(s)
        # within-tick exact dedup: representative = min doc_id per sha
        ids = sh.column("doc_id").to_numpy(zero_copy_only=False)
        enc = sh.column("text_sha256").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        if len(codes):
            rep = np.full(len(enc.dictionary), np.iinfo(np.int64).max,
                          np.int64)
            np.minimum.at(rep, codes, ids)
            sh = sh.filter(pa.array(ids == rep[codes]))
        t = sh.drop_columns(["text"])
        t = t.append_column(
            "bucket",
            pa.array(
                _sha_bucket(t.column("text_sha256"), self.n_buckets),
                pa.int64(),
            ),
        )
        folded = self._folded()
        committed = [x for x in self._committed_ticks() if x not in folded]
        probe = _probe_fn(self.root, committed)
        if t.num_rows:
            t = t.sort_by("bucket")
            bn = t.column("bucket").to_numpy(zero_copy_only=False)
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(bn)) + 1, [len(bn)]]
            )
            kept = [
                probe(t.slice(starts[i], starts[i + 1] - starts[i]))
                for i in range(len(starts) - 1)
            ]
            kept = [g for g in kept if g.num_rows]
            t = (
                pa.concat_tables(kept, promote_options="default")
                if kept
                else pa.table({})
            )
        else:
            t = pa.table({})
        return self._finish_tick(t, tick_id)

    def _finish_tick(self, t: pa.Table, tick_id: str) -> pa.Table:
        """Shared tail: order the surviving rows, two-phase-commit the
        tick output + per-bucket sha files (stage dir + one atomic
        rename)."""
        import os
        import shutil

        tick_dir = os.path.join(self.root, "ticks", tick_id)
        if t.num_rows:
            t = t.sort_by("doc_id")
            result = t.drop_columns(["bucket", "text_sha256"])
        else:
            result = pa.table(
                {k: pa.array([], v) for k, v in self._EMPTY.items()}
            )

        staged = os.path.join(self.root, "staged", tick_id)
        shutil.rmtree(staged, ignore_errors=True)
        os.makedirs(staged, exist_ok=True)
        pq.write_table(result, os.path.join(staged, "output.parquet"))
        if t.num_rows:
            buckets = t.column("bucket").to_numpy(zero_copy_only=False)
            for k in np.unique(buckets):
                d = os.path.join(staged, f"bucket={int(k)}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    t.filter(pa.array(buckets == k)).select(
                        ["text_sha256"]
                    ),
                    os.path.join(d, "shas.parquet"),
                )
        os.makedirs(os.path.join(self.root, "ticks"), exist_ok=True)
        os.replace(staged, tick_dir)
        return result


def curate_to_dir(
    docs_dir: str,
    out_dir: str,
    *,
    quality_min: float = 0.75,
    overwrite: bool = False,
) -> dict:
    """CLI entry: curate ``docs_dir``/documents.parquet into
    hive-partitioned Parquet under ``out_dir`` (one directory per
    predicted language — never one giant file).  Refuses a non-empty
    target unless ``overwrite`` (a second append would duplicate
    rows)."""
    import os
    import shutil

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} is non-empty; pass overwrite/--force (a "
                "second write would append duplicate files)"
            )
        shutil.rmtree(out_dir)
    path = docs_dir if docs_dir.endswith(".parquet") else os.path.join(
        docs_dir, "documents.parquet"
    )
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    n_in = ds.count()
    curated = curate(ds, quality_min=quality_min, keep_text=True)
    curated.write_parquet(out_dir, partition_cols=["lang_pred"])
    out = ray.data.read_parquet(out_dir)
    return {"docs_in": n_in, "docs_kept": out.count(), "out": out_dir}
