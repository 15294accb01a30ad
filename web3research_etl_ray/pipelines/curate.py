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
