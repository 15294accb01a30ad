"""Incremental near-duplicate detection at ingest: a persistent,
bucketed MinHash band index that makes each tick O(new docs), not
O(corpus).

The batch operator (``functions/dedup.py::minhash_lsh_pairs``)
re-shingles the whole corpus every run — right for one-shot dedup,
wrong for a CDC lake ingesting ticks forever (the reference's `sync`
loop shape, `/root/reference/src/ch_eth/sync.rs`).  This module keeps
LSH state ON DISK next to the lake, the same philosophy as the
engine's Parquet-lake-plus-manifest:

    <root>/config.json                         hash params (validated per tick)
    <root>/bands/bucket=K/*.parquet            (band_key, doc_id) rows
    <root>/sigs/bucket=K/*.parquet             (doc_id, sig) rows

Per tick:
  1. signature + band explode for the NEW docs only (vectorized
     MinHasher);
  2. candidate generation reads ONLY the band buckets the new docs
     touch (dir-level pruning — the 10^10-doc index never scans);
     pairs must involve >=1 new doc, so previously-reported old-old
     pairs are never re-emitted;
  3. verify attaches signatures via the generic 2-shuffle
     ``attach_pair_values`` exchange — old signatures read only from
     the doc buckets that candidates touch;
  4. the new rows append into the bucket dirs (one file per tick per
     touched bucket).

Crash note: band appends are fused into the candidate exchange (the
bucket's group task writes its own new rows) and sig appends land at
the end of the tick; a re-run of a half-appended tick re-emits the
same pairs (dedup downstream is idempotent by (id_a, id_b)) and
duplicate band/sig rows only cost bytes — candidate runs dedup ids,
and the sig attach picks one row per doc (tested).  Wrap ticks in the
lake's two-phase manifest if exactly-once index bytes matter.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.dedup import MinHasher, explode_bands
from ..functions.exchange import attach_pair_values

_CONFIG = "config.json"


def _write_bucketed(ds: ray.data.Dataset, root: str, sub: str) -> None:
    """ONE file per bucket per tick, written inside the bucket's own
    group task (the engine's spool pattern).  A naive
    ``write_parquet(partition_cols=...)`` splits every BLOCK by value
    — measured 9.5k files for one 400k-doc tick, and per-file footer
    overhead then dominates every later read."""

    def write_group(g: pa.Table) -> pa.Table:
        k = int(g.column("bucket")[0].as_py())
        d = os.path.join(root, sub, f"bucket={k}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            g.drop_columns(["bucket"]),
            os.path.join(d, f"{uuid.uuid4().hex}.parquet"),
        )
        return pa.table(
            {"bucket": pa.array([k], pa.int64()),
             "rows": pa.array([g.num_rows], pa.int64())}
        )

    ds.groupby("bucket").map_groups(
        write_group, batch_format="pyarrow"
    ).materialize()


def _bucket_files(root: str, sub: str, buckets: set[int]) -> list[str]:
    out = []
    for k in sorted(buckets):
        d = os.path.join(root, sub, f"bucket={k}")
        if os.path.isdir(d):
            out += [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
    return out


def _new_aware_pairs_fn(root: str, max_bucket: int):
    """Factory for the per-bucket candidate fn, shared by the
    distributed groupby path and the driver-local tick path:
    same pair semantics, same fused band-append side effect."""

    def new_aware_pairs(group: pa.Table) -> pa.Table:
        """Pairs within band_key runs that involve >=1 NEW doc —
        old-old pairs were reported by the tick that made them.
        Side effect: appends the bucket's NEW band rows to the
        index right here (same bucket key — fusing the append into
        this exchange saves shuffling the band rows twice)."""
        is_new_col = group.column("is_new").to_numpy(zero_copy_only=False)
        fresh = group.filter(pa.array(is_new_col == 1))
        if fresh.num_rows:
            k = int(fresh.column("__bucket")[0].as_py())
            d = os.path.join(root, "bands", f"bucket={k}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                fresh.select(["band_key", "doc_id"]),
                os.path.join(d, f"{uuid.uuid4().hex}.parquet"),
            )
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        keys = group.column("band_key").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        new = group.column("is_new").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        keys, ids, new = keys[order], ids[order], new[order]
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        lens = np.diff(np.concatenate((starts, [len(keys)])))
        out_a, out_b = [], []
        for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
            run_ids = ids[s : s + ln]
            run_new = new[s : s + ln]
            uids = np.unique(run_ids)
            # a doc re-ingested as "new" wins the new flag
            flags = np.zeros(len(uids), bool)
            np.logical_or.at(
                flags, np.searchsorted(uids, run_ids), run_new.astype(bool)
            )
            nids = uids[flags]
            oids = uids[~flags]
            if len(nids) == 0 or len(uids) < 2:
                continue
            if len(uids) > max_bucket:
                # star around the global min keeps components
                rep = uids[0]
                others = uids[1:]
                if flags[0]:
                    lo, hi = np.full(len(others), rep), others
                else:
                    lo, hi = np.full(len(nids), rep), nids
                    mask = hi != rep
                    lo, hi = lo[mask], hi[mask]
                out_a.append(lo.astype(np.int64))
                out_b.append(hi.astype(np.int64))
                continue
            if len(nids) >= 2:
                iu, ju = np.triu_indices(len(nids), k=1)
                out_a.append(nids[iu])
                out_b.append(nids[ju])
            if len(oids):
                gn = np.repeat(nids, len(oids))
                go = np.tile(oids, len(nids))
                out_a.append(np.minimum(gn, go))
                out_b.append(np.maximum(gn, go))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return new_aware_pairs


class MinHashIndex:
    """Handle on the on-disk index; parameters are persisted on first
    use and validated on every subsequent tick (signatures from
    different parameter sets must never mix)."""

    def __init__(
        self,
        root: str,
        *,
        num_perm: int = 64,
        num_bands: int = 16,
        shingle_k: int = 3,
        band_buckets: int = 256,
        doc_buckets: int = 64,
        scheme: str = "oph",
    ):
        cfg = {
            "num_perm": num_perm,
            "num_bands": num_bands,
            "shingle_k": shingle_k,
            "band_buckets": band_buckets,
            "doc_buckets": doc_buckets,
            "scheme": scheme,
        }
        path = os.path.join(root, _CONFIG)
        if os.path.exists(path):
            stored = json.load(open(path))
            if stored != cfg:
                raise ValueError(
                    f"index at {root} was built with {stored}, got {cfg}"
                )
        else:
            os.makedirs(root, exist_ok=True)
            with open(path, "w") as f:
                json.dump(cfg, f)
        self.root = root
        self.__dict__.update(cfg)

    def compact(self) -> None:
        """Merge each bucket's tick files into one — run occasionally
        in a long-lived sync loop (files accumulate one per bucket per
        tick).  One Ray task per bucket; a crash between writing the
        merged file and unlinking the originals leaves duplicate rows,
        which every reader tolerates (candidate runs dedup ids, the
        sig attach picks one row per doc) — re-running compact heals
        the layout."""

        def merge_one(batch: pa.Table) -> pa.Table:
            merged = []
            for d in batch.column("dir").to_pylist():
                files = [
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                ]
                if len(files) <= 1:
                    merged.append(0)
                    continue
                t = pa.concat_tables([pq.read_table(f) for f in files])
                pq.write_table(
                    t, os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
                )
                for f in files:
                    os.remove(f)
                merged.append(len(files))
            return pa.table({"merged": pa.array(merged, pa.int64())})

        dirs = []
        for sub in ("bands", "sigs"):
            base = os.path.join(self.root, sub)
            if os.path.isdir(base):
                dirs += [
                    {"dir": os.path.join(base, b)}
                    for b in os.listdir(base)
                    if b.startswith("bucket=")
                ]
        if dirs:
            ray.data.from_items(dirs).map_batches(
                merge_one, batch_format="pyarrow", batch_size=1
            ).materialize()

    # -- per-tick pipeline -------------------------------------------------

    def dedup_tick(
        self,
        docs: ray.data.Dataset,
        *,
        threshold: float = 0.5,
        max_bucket: int = 256,
    ) -> pa.Table:
        """Near-dup pairs INVOLVING the tick's new docs:
        (id_a, id_b, est_jaccard), id_a < id_b, vs both the existing
        index and the tick itself; then the new docs join the index.

        Equivalence note: banding is per-doc deterministic, so for
        band runs under ``max_bucket`` the union of per-tick outputs
        equals the batch operator on the full corpus EXACTLY (fuzzed
        in tests).  Runs over the cap emit star pairs, and the run
        composition differs between batch and incremental — both
        still preserve connected components (clusters/keep-lists are
        unchanged), but pair-level identity is only guaranteed below
        the cap."""
        from ..state.manifest import acquire_lease, release_lease

        created = acquire_lease(self.root)
        try:
            return self._dedup_tick_locked(
                docs, threshold=threshold, max_bucket=max_bucket
            )
        finally:
            if created:
                release_lease(self.root)

    def _dedup_tick_locked(
        self,
        docs: ray.data.Dataset,
        *,
        threshold: float,
        max_bucket: int,
    ) -> pa.Table:
        # Size-adaptive tick (same move as the replay engine's
        # exchange="driver" leg and the size-adaptive CC): a small tick
        # spends ~10 s in SIX Ray-execution fixed costs (sig, bands,
        # two-shuffle candidates, two-shuffle attach, sig append) for
        # milliseconds of compute — stream the docs and, under the
        # threshold, run the whole tick in-process on the same kernels.
        # Oversized ticks fall through to the distributed path (the
        # partial stream is discarded; Datasets re-execute lazily).
        limit = int(os.environ.get("W3R_DEDUP_DRIVER_TICK_ROWS", 50_000))
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
            return self._dedup_tick_driver(
                t_docs, threshold=threshold, max_bucket=max_bucket
            )
        return self._dedup_tick_distributed(
            docs, threshold=threshold, max_bucket=max_bucket
        )

    def _dedup_tick_driver(
        self,
        t_docs: pa.Table,
        *,
        threshold: float,
        max_bucket: int,
    ) -> pa.Table:
        """Driver-local tick: identical semantics, zero Ray executions.
        Every kernel is the SAME one the distributed path maps over
        blocks (MinHasher, explode_bands, the _new_aware_pairs_fn
        bucket fn incl. its band-append side effect, the (va==vb).mean
        estimator); forced-path equivalence is asserted in
        tests/test_dedup_index.py."""
        from ..functions.dedup import sig_matrix

        sig_t = pa.binary(self.num_perm * 8)
        empty_out = pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        if t_docs.num_rows == 0:
            return empty_out
        hasher = MinHasher(
            num_perm=self.num_perm, shingle_k=self.shingle_k,
            scheme=self.scheme,
        )
        sigs_new = hasher(t_docs).select(["doc_id", "minhash"])
        bands_new = explode_bands(
            sigs_new, self.num_bands, self.num_perm,
            num_buckets=self.band_buckets, sig_col="minhash",
        )
        bands_new = bands_new.append_column(
            "is_new",
            pa.array(np.ones(bands_new.num_rows, np.int8), pa.int8()),
        )
        new_keys = np.unique(
            bands_new.column("band_key").to_numpy(zero_copy_only=False)
        )
        BB = self.band_buckets
        touched = {int(k) for k in np.unique(new_keys % BB)}
        old_files = _bucket_files(self.root, "bands", touched)
        parts = [bands_new.select(["doc_id", "band_key", "__bucket", "is_new"])]
        if old_files and len(new_keys):
            old = pa.concat_tables(
                [
                    pq.read_table(f, columns=["band_key", "doc_id"])
                    for f in old_files
                ],
                promote_options="default",
            )
            bk = old.column("band_key").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(new_keys, bk)
            hit = (pos < len(new_keys)) & (
                new_keys[np.minimum(pos, max(len(new_keys) - 1, 0))] == bk
            )
            old = old.filter(pa.array(hit))
            if old.num_rows:
                kept = old.column("band_key").to_numpy(zero_copy_only=False)
                parts.append(
                    pa.table(
                        {
                            "doc_id": old.column("doc_id"),
                            "band_key": old.column("band_key"),
                            "__bucket": pa.array(kept % BB, pa.int64()),
                            "is_new": pa.array(
                                np.zeros(old.num_rows, np.int8), pa.int8()
                            ),
                        }
                    )
                )
        all_bands = pa.concat_tables(parts, promote_options="default")
        pair_fn = _new_aware_pairs_fn(self.root, max_bucket)
        ab = all_bands.sort_by("__bucket")
        bn = ab.column("__bucket").to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(bn)) + 1, [len(bn)]]
        )
        pairs_a: list[np.ndarray] = []
        pairs_b: list[np.ndarray] = []
        for i in range(len(starts) - 1):
            pr = pair_fn(ab.slice(starts[i], starts[i + 1] - starts[i]))
            if pr.num_rows:
                pairs_a.append(
                    pr.column("id_a").to_numpy(zero_copy_only=False)
                )
                pairs_b.append(
                    pr.column("id_b").to_numpy(zero_copy_only=False)
                )
        # sig append — one file per touched doc bucket, like the
        # distributed _write_bucketed
        ids_new = (
            sigs_new.column("doc_id")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        DB = self.doc_buckets
        sg = pa.table(
            {
                "doc_id": sigs_new.column("doc_id"),
                "sig": sigs_new.column("minhash").cast(sig_t),
                "bucket": pa.array(ids_new % DB, pa.int64()),
            }
        ).sort_by("bucket")
        sb = sg.column("bucket").to_numpy(zero_copy_only=False)
        ss = np.concatenate(
            [[0], np.flatnonzero(np.diff(sb)) + 1, [len(sb)]]
        )
        for i in range(len(ss) - 1):
            seg = sg.slice(ss[i], ss[i + 1] - ss[i])
            k = int(seg.column("bucket")[0].as_py())
            d = os.path.join(self.root, "sigs", f"bucket={k}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                seg.drop_columns(["bucket"]),
                os.path.join(d, f"{uuid.uuid4().hex}.parquet"),
            )
        if not pairs_a:
            return empty_out
        pairs = np.unique(
            np.stack(
                [np.concatenate(pairs_a), np.concatenate(pairs_b)], axis=1
            ),
            axis=0,
        )
        # sig lookup: tick sigs first (one-row-per-doc like the attach
        # exchange — identical bytes either way), then the candidate-
        # touched old doc buckets
        cand_dbs = {int(x) for x in np.unique(np.unique(pairs) % DB)}
        lut_ids = [ids_new]
        lut_sigs = [sig_matrix(sigs_new.column("minhash"), self.num_perm)]
        sig_files = _bucket_files(self.root, "sigs", cand_dbs)
        if sig_files:
            old_sigs = pa.concat_tables(
                [
                    pq.read_table(f, columns=["doc_id", "sig"])
                    for f in sig_files
                ],
                promote_options="default",
            )
            lut_ids.append(
                old_sigs.column("doc_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            lut_sigs.append(
                sig_matrix(old_sigs.column("sig"), self.num_perm)
            )
        ids_all = np.concatenate(lut_ids)
        sigs_all = np.concatenate(lut_sigs, axis=0)
        uniq, first = np.unique(ids_all, return_index=True)
        sigs_u = sigs_all[first]
        ia = np.searchsorted(uniq, pairs[:, 0])
        ib = np.searchsorted(uniq, pairs[:, 1])
        na = max(len(uniq) - 1, 0)
        valid = (
            (ia <= na)
            & (uniq[np.minimum(ia, na)] == pairs[:, 0])
            & (ib <= na)
            & (uniq[np.minimum(ib, na)] == pairs[:, 1])
        )
        pairs, ia, ib = pairs[valid], ia[valid], ib[valid]
        est = (sigs_u[ia] == sigs_u[ib]).mean(axis=1)
        sel = est >= threshold
        return pa.table(
            {
                "id_a": pa.array(pairs[sel, 0], pa.int64()),
                "id_b": pa.array(pairs[sel, 1], pa.int64()),
                "est_jaccard": pa.array(est[sel], pa.float64()),
            }
        ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])

    def _dedup_tick_distributed(
        self,
        docs: ray.data.Dataset,
        *,
        threshold: float,
        max_bucket: int,
    ) -> pa.Table:
        sig_t = pa.binary(self.num_perm * 8)

        hasher = MinHasher(
            num_perm=self.num_perm, shingle_k=self.shingle_k, scheme=self.scheme
        )
        sigs_new = (
            docs.map_batches(
                lambda t, _h=hasher: _h(t).select(["doc_id", "minhash"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )

        def bands_of(t: pa.Table, is_new: int) -> pa.Table:
            b = explode_bands(
                t,
                self.num_bands,
                self.num_perm,
                num_buckets=self.band_buckets,
                sig_col="minhash",
            )
            return b.append_column(
                "is_new", pa.array(np.full(b.num_rows, is_new, np.int8), pa.int8())
            )

        bands_new = sigs_new.map_batches(
            lambda t: bands_of(t, 1), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        BB = self.band_buckets

        # The tick's band-key set is the SMALL side: broadcast it once
        # (ray.put, zero-copy numpy in each task) and drop old band
        # rows with no matching new key BEFORE the exchange — an old
        # row whose band_key no new doc shares cannot form a candidate
        # involving this tick, and on unrelated corpora that is ~all of
        # them.  Driver/broadcast cost is O(16·tick_docs·8 B); for
        # ticks so large that this matters, raise band_buckets (fewer
        # files read per tick) — the filter itself stays a vectorized
        # searchsorted per batch.
        new_keys = np.unique(
            np.concatenate(
                [
                    b["band_key"]
                    for b in bands_new.select_columns(["band_key"]).iter_batches(
                        batch_format="numpy", batch_size=None
                    )
                ]
                or [np.zeros(0, np.int64)]
            )
        )
        keys_ref = ray.put(new_keys)
        # dir-level pruning derives from the same key set (one driver
        # stream, no extra shuffle): __bucket = band_key % BB
        touched = {int(k) for k in np.unique(new_keys % BB)}
        old_files = _bucket_files(self.root, "bands", touched)

        def tag_old_bands(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            bk = t.column("band_key").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, bk)
            hit = (pos < len(keys)) & (
                keys[np.minimum(pos, max(len(keys) - 1, 0))] == bk
            )
            t = t.filter(pa.array(hit))
            kept = t.column("band_key").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "band_key": t.column("band_key"),
                    "__bucket": pa.array(kept % BB, pa.int64()),
                    "is_new": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                }
            )

        if old_files and len(new_keys):
            bands_old = ray.data.read_parquet(
                old_files, columns=["band_key", "doc_id"]
            ).map_batches(
                tag_old_bands, batch_format="pyarrow", zero_copy_batch=True
            )
            all_bands = bands_new.union(bands_old)
        else:
            all_bands = bands_new

        new_aware_pairs = _new_aware_pairs_fn(self.root, max_bucket)

        # cross-band duplicate pairs MUST collapse before the attach
        # exchange (attach_pair_values requires distinct pairs — dup
        # rows would pair with themselves in the pivot)
        cands = (
            all_bands.groupby("__bucket")
            .map_groups(new_aware_pairs, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .count()
            .map_batches(
                lambda t: t.select(["id_a", "id_b"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )

        # signatures for the verify: new sigs + only the OLD doc
        # buckets that candidates touch (≤ doc_buckets ints on driver)
        def db_of(t: pa.Table) -> pa.Table:
            a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
            db = np.unique(np.concatenate([a, b]) % self.doc_buckets)
            return pa.table({"db": pa.array(db, pa.int64())})

        cands = cands.materialize()
        if cands.count() == 0:
            attached = None
        else:
            cand_dbs = {
                int(r["db"])
                for r in cands.map_batches(
                    db_of, batch_format="pyarrow", zero_copy_batch=True
                ).take_all()
            }
            sig_files = _bucket_files(self.root, "sigs", cand_dbs)
            values = sigs_new.map_batches(
                lambda t: t.rename_columns(["doc_id", "sig"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            if sig_files:
                values = values.union(
                    ray.data.read_parquet(sig_files, columns=["doc_id", "sig"])
                )

            attached = attach_pair_values(
                cands,
                values,
                value_col="sig",
                value_type=sig_t,
                doc_buckets=self.doc_buckets,
            )

        P = self.num_perm

        def verify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "est_jaccard": pa.array([], pa.float64())}
                )
            a = t.column("id_a").to_numpy(zero_copy_only=False)
            b = t.column("id_b").to_numpy(zero_copy_only=False)
            va = np.frombuffer(
                b"".join(t.column("value_a").to_pylist()), dtype="<u8"
            ).reshape(t.num_rows, P)
            vb = np.frombuffer(
                b"".join(t.column("value_b").to_pylist()), dtype="<u8"
            ).reshape(t.num_rows, P)
            est = (va == vb).mean(axis=1)
            sel = est >= threshold
            return pa.table(
                {
                    "id_a": pa.array(a[sel], pa.int64()),
                    "id_b": pa.array(b[sel], pa.int64()),
                    "est_jaccard": pa.array(est[sel], pa.float64()),
                }
            )

        rows = (
            attached.map_batches(
                verify, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
            if attached is not None
            else []
        )

        # band rows already appended inside new_aware_pairs (fused into
        # the candidate exchange); sigs append here — distributed, ONE
        # file per bucket per tick (uuid filenames: a re-run adds,
        # never clobbers)
        DB = self.doc_buckets

        def sig_rows(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "sig": t.column("minhash").cast(sig_t),
                    "bucket": pa.array(ids % DB, pa.int64()),
                }
            )

        _write_bucketed(
            sigs_new.map_batches(
                sig_rows, batch_format="pyarrow", zero_copy_batch=True
            ),
            self.root,
            "sigs",
        )

        if not rows:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        out = pa.Table.from_pylist(rows)
        # cross-band duplicates: keep one row per pair
        grp = out.group_by(["id_a", "id_b"]).aggregate([("est_jaccard", "max")])
        return grp.rename_columns(["id_a", "id_b", "est_jaccard"]).sort_by(
            [("id_a", "ascending"), ("id_b", "ascending")]
        )
