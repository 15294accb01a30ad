"""Arrow schemas + schema-evolution (unification) rules.

The reference pins schema-as-code per table (DDL strings executed at
init, reference src/ch_eth/init.rs:144-341) and has exactly one
schema-evolution corner: Arbitrum widens the block schema with three
extra columns parsed out of an untyped JSON bag
(src/ch_arb_one/schema.rs:72-104).  We generalize that: event files may
arrive in schema versions v1/v2/v3 (FIXTURES.md §3) and every batch is
unified to the current target schema — nullable-add for new columns,
value-compatible re-encodings (dictionary<->plain string) are
normalized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# Event stream schemas (FIXTURES.md §1/§3)
# ---------------------------------------------------------------------------

#: v1 — base change-event schema mandated by BASELINE.json input_hint,
#: plus the replay-control columns (commit_seq = the "block number",
#: op = upsert|delete).
EVENT_SCHEMA_V1 = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
        pa.field("content", pa.string(), nullable=False),
        pa.field("commit_seq", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
    ]
)

#: v2 — adds ``metadata`` (nullable map<string,string>); analogue of the
#: Arbitrum extra-field widening (reference src/ch_arb_one/schema.rs:72-104).
EVENT_SCHEMA_V2 = EVENT_SCHEMA_V1.append(
    pa.field("metadata", pa.map_(pa.string(), pa.string()), nullable=True)
)

#: v3 — adds ``size_bytes`` (nullable int64) and re-encodes ``lang`` as
#: dictionary<int32,string> (value-compatible).
EVENT_SCHEMA_V3 = pa.schema(
    [
        f
        if f.name != "lang"
        else pa.field("lang", pa.dictionary(pa.int32(), pa.string()), nullable=False)
        for f in EVENT_SCHEMA_V2
    ]
).append(pa.field("size_bytes", pa.int64(), nullable=True))

#: The processing-time schema every batch is unified to before any
#: stage runs.  ``lang`` is plain string in flight (dictionary encoding
#: is a storage concern, applied on lake write).
UNIFIED_EVENT_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
        pa.field("content", pa.string(), nullable=False),
        pa.field("commit_seq", pa.int64(), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("metadata", pa.map_(pa.string(), pa.string()), nullable=True),
        pa.field("size_bytes", pa.int64(), nullable=True),
    ]
)

SCHEMA_VERSIONS = {1: EVENT_SCHEMA_V1, 2: EVENT_SCHEMA_V2, 3: EVENT_SCHEMA_V3}

#: Lake (converged state) schema — FIXTURES.md §4.  content_sha256 is the
#: per-row invariant vs the reference (BASELINE.json input_hint); the
#: analogue of the reference's stored-vs-chain hash check
#: (src/ch_eth/sync.rs:164-186).
LAKE_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string(), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
        pa.field("content", pa.string(), nullable=False),
        pa.field("content_sha256", pa.binary(32), nullable=False),
        pa.field("metadata", pa.map_(pa.string(), pa.string()), nullable=True),
        pa.field("size_bytes", pa.int64(), nullable=True),
        pa.field("commit_seq", pa.int64(), nullable=False),
    ]
)

#: Rollback (reorg) control table — FIXTURES.md §2; analogue of the
#: reference's delete-all-then-reinsert on new head (src/ch_eth/sync.rs:92-116).
ROLLBACK_SCHEMA = pa.schema(
    [
        pa.field("barrier_seq", pa.int64(), nullable=False),
        pa.field("orphan_from", pa.int64(), nullable=False),
        pa.field("orphan_to", pa.int64(), nullable=False),
    ]
)

LANGS = ("py", "rs", "go", "js", "java", "md", "toml")

LANG_BY_SUFFIX = {
    ".py": "py",
    ".rs": "rs",
    ".go": "go",
    ".js": "js",
    ".java": "java",
    ".md": "md",
    ".toml": "toml",
}


# ---------------------------------------------------------------------------
# TableSpec — the user-extension surface (SURVEY.md §2.10): the reference's
# per-chain module shape (schema.rs + ORDER BY key) collapses to a spec of
# (arrow schema, upsert key, LWW order column).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TableSpec:
    """One logical lake table: schemas + upsert key + LWW ordering.

    Equivalent of one ``ReplacingMergeTree`` table in the reference
    (ORDER BY = upsert key, e.g. src/ch_eth/init.rs:169-170): duplicate
    inserts with the same key converge to the last writer by
    ``order_col``.  This is the engine's user-extension surface
    (SURVEY.md §2.10): the reference's per-chain module shape
    (schema.rs structs + DDL) collapses to a spec; a new "chain" is a
    new spec + optional per-batch normalize fn, the engine core
    untouched.
    """

    name: str
    schema: pa.Schema  # lake (at-rest) schema
    key: tuple[str, ...]
    order_col: str = "commit_seq"
    op_col: str = "op"  # op column; value 'delete' tombstones a key
    event_schema: pa.Schema | None = None  # unified in-flight schema
    hash_source: str | None = None  # column to sha256 into hash_col at merge
    hash_col: str | None = None
    #: non-empty ⇒ SummingMergeTree semantics (ClickHouse's sibling of
    #: the reference's ReplacingMergeTree): these columns ACCUMULATE per
    #: key across events and merge generations (null = 0), all other
    #: payload still comes from the max-order_col row.  Contract:
    #: additive tables are upsert-only (emit no 'delete' ops from a
    #: derive fn) — per-row retraction does not compose associatively
    #: with partial sums; rollbacks are still exact because orphaned
    #: events never enter the fold and late rollbacks rebuild the
    #: partition from surviving history (repair path).
    sum_cols: tuple[str, ...] = ()
    #: running-min / running-max accumulators (AggregatingMergeTree
    #: family): same associativity/exactly-once contract as sum_cols;
    #: null rows are ignored, an all-null key yields null.
    min_cols: tuple[str, ...] = ()
    max_cols: tuple[str, ...] = ()
    extra: dict = field(default_factory=dict)

    @property
    def flight_schema(self) -> pa.Schema:
        return self.event_schema if self.event_schema is not None else self.schema


REPO_FILES = TableSpec(
    name="repo_files",
    schema=LAKE_SCHEMA,
    key=("repo", "path"),
    order_col="commit_seq",
    event_schema=UNIFIED_EVENT_SCHEMA,
    hash_source="content",
    hash_col="content_sha256",
)


def schema_version_of(schema: pa.Schema) -> int:
    """Classify an event-file schema as v1/v2/v3 (highest matching)."""
    names = set(schema.names)
    if "size_bytes" in names:
        return 3
    if "metadata" in names:
        return 2
    return 1


def unify_to(batch: pa.Table, target: pa.Schema = UNIFIED_EVENT_SCHEMA) -> pa.Table:
    """Unify a batch to ``target``: add absent columns as nulls, decode
    dictionary-encoded columns whose target is plain, and reorder.

    Generalization of the reference's only schema-evolution path
    (src/ch_arb_one/schema.rs:72-104 — absent extra fields default).
    """
    n = len(batch)
    cols = []
    for fld in target:
        if fld.name in batch.column_names:
            col = batch.column(fld.name)
            if col.type != fld.type:
                if pa.types.is_dictionary(col.type):
                    col = col.cast(col.type.value_type) if hasattr(col, "cast") else col
                if col.type != fld.type:
                    col = col.cast(fld.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, fld.type))
    return pa.table(cols, schema=target)
