"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches
stages.

The decode kernels themselves are STUBBED (this container has no
PIL/ffmpeg/librosa): ``RealImageDecoder`` raises NotImplementedError
unless the lib import succeeds, and ``StubImageDecoder`` produces a
deterministic fake decode so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.  At
production scale the only change is swapping the stub class for the
real one in the ``map_batches(cls, concurrency=..., batch_size=...)``
call; small batch sizes matter here because each payload row is large.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("kind", pa.string(), nullable=False),  # image|audio|video
        pa.field("payload", pa.binary(), nullable=False),
        pa.field("meta_format", pa.string(), nullable=True),
        pa.field("meta_width", pa.int32(), nullable=True),
        pa.field("meta_height", pa.int32(), nullable=True),
        pa.field("meta_duration_ms", pa.int64(), nullable=True),
    ]
)

FEATURE_DIM = 16


def try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class RealImageDecoder:
    """The production decode stage (requires PIL — absent here)."""

    def __init__(self, size: tuple[int, int] = (224, 224)):
        self.pil = try_import_pil()
        if self.pil is None:
            raise NotImplementedError(
                "image decode requires PIL, which is not installed in this "
                "environment; use StubImageDecoder for plumbing tests"
            )
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError("exercised only where PIL exists")


class StubImageDecoder:
    """Deterministic fake decode: features are a pure function of the
    payload bytes (blake2b-seeded), dims parsed from metadata.  Same
    signature/batch contract as the real decoder."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def features_of(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=self.feature_dim * 2).digest()
        raw = np.frombuffer(h, dtype=np.uint16).astype(np.float32)
        return raw / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self.features_of(p or b"").tolist() for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        return (
            batch.drop_columns(["payload"])
            .append_column("payload_bytes", pa.array(sizes, pa.int64()))
            .append_column("features", pa.array(feats, pa.list_(pa.float32())))
        )


def docs_as_media(batch: pa.Table) -> pa.Table:
    """Adapter for tests/benchmarks: lift the documents table into the
    media schema (text bytes as the opaque payload)."""
    texts = batch.column("text").to_pylist()
    payloads = [t.encode() for t in texts]
    n = batch.num_rows
    return pa.table(
        {
            "media_id": batch.column("doc_id").cast(pa.int64()),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "meta_format": pa.array(["txt"] * n),
            "meta_width": pa.array([len(t) % 1024 for t in texts], pa.int32()),
            "meta_height": pa.array([len(t) // 1024 + 1 for t in texts], pa.int32()),
            "meta_duration_ms": pa.nulls(n, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_feature_pipeline(ds, *, concurrency: int = 2, batch_size: int = 256):
    """documents → media schema → actor-pool stub decode → features.

    batch_size is deliberately small: payload rows are large, and
    batch × concurrency must fit each worker's heap (the multimodal
    sizing rule)."""
    return ds.map_batches(
        docs_as_media, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        StubImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
