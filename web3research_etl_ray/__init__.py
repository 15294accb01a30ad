"""web3research_etl_ray — a from-scratch, Ray-Data-native CDC/incremental-
ingest engine with the query/data-processing capabilities of
njublockchain/web3research-etl (reference at /root/reference, cited by
file:line throughout).

The reference is a chain→ClickHouse ETL: ordered block replay, reorg
rollback (delete+reinsert), idempotent last-writer-wins upsert into
ReplacingMergeTree tables, and a verify-else-repair pass
(reference: src/ch_eth/{init,sync,check}.rs).  This engine re-expresses
those semantics Ray-Data-first over a commit-ordered Parquet stream of
source-code repository change events keyed by (repo, path):

- ``gen``        deterministic synthetic change-event stream (seed 42)
- ``schema``     Arrow schemas + unification rules (schema evolution)
- ``sources``    event-stream readers (schema-unifying parquet read)
- ``stages``     map_batches stages: normalize/sha256, partial LWW,
                 orphan-range filter, final partition merge
- ``state``      two-phase manifest commit, watermarks, lineage
- ``pipelines``  replay (init), tail (sync), check/repair, compact
- ``functions``  scalar/batch kernels incl. training-data ops
                 (dedup, similarity search, text analysis, multimodal)
"""

__version__ = "0.1.0"
