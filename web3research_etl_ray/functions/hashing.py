"""Hashing kernels over Arrow arrays.

Analogue of the reference's hex/hash machinery: stored-hash-vs-source
comparison (src/ch_eth/sync.rs:164-186), hex codecs
(src/ch_btc/sync.rs:145-150).  Our per-row invariant is
sha256(content) equality (BASELINE.json input_hint).

sha256 has no vectorized Arrow kernel; we hash straight off the Arrow
string buffers (zero string materialization — memoryview slices into
the data buffer), which keeps the loop C-dominated.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _iter_chunks(arr: pa.Array | pa.ChunkedArray):
    if isinstance(arr, pa.ChunkedArray):
        yield from arr.chunks
    else:
        yield arr


def sha256_binary(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 digest (binary(32)) of each utf8 value, off the raw buffers."""
    n = len(arr)
    out = bytearray(32 * n)
    pos = 0
    for chunk in _iter_chunks(arr):
        if chunk.null_count:
            chunk = chunk.fill_null("")
        if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type):
            odt = np.int64
        else:
            odt = np.int32
        buffers = chunk.buffers()
        offs = np.frombuffer(buffers[1], dtype=odt)[
            chunk.offset : chunk.offset + len(chunk) + 1
        ]
        data = memoryview(buffers[2]) if buffers[2] is not None else memoryview(b"")
        for i in range(len(chunk)):
            d = hashlib.sha256(data[offs[i] : offs[i + 1]]).digest()
            out[pos : pos + 32] = d
            pos += 32
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(32), n, [None, pa.py_buffer(bytes(out))]
    )


def sha256_hex(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex string of each utf8 value (matches DuckDB ``sha256``)."""
    hexes = []
    for chunk in _iter_chunks(arr):
        if chunk.null_count:
            chunk = chunk.fill_null("")
        buffers = chunk.buffers()
        odt = (
            np.int64
            if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type)
            else np.int32
        )
        offs = np.frombuffer(buffers[1], dtype=odt)[
            chunk.offset : chunk.offset + len(chunk) + 1
        ]
        data = memoryview(buffers[2]) if buffers[2] is not None else memoryview(b"")
        hexes.extend(
            hashlib.sha256(data[offs[i] : offs[i + 1]]).hexdigest()
            for i in range(len(chunk))
        )
    return pa.array(hexes, pa.string())


def length_prefixed_join(cols: list[pa.Array | pa.ChunkedArray]) -> pa.Array:
    """Unambiguous concatenation of binary key components: each value
    is framed as a 4-byte big-endian length prefix + payload, then the
    frames are concatenated row-wise.  Unlike a separator join, two
    distinct key tuples can never produce identical bytes, whatever
    bytes the components contain (ADVICE r04 — binary(20) addresses
    contain NULs).  Vectorized: the prefix column is built straight
    from the length buffer, the concat is one
    ``binary_join_element_wise`` call."""
    import pyarrow.compute as pc

    framed: list[pa.Array] = []
    for c in cols:
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if c.null_count:
            c = c.fill_null(b"")
        ln = (
            pc.binary_length(c)
            .cast(pa.uint32())
            .to_numpy(zero_copy_only=False)
            .astype(">u4")
        )
        prefix = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(4), len(c), [None, pa.py_buffer(ln.tobytes())]
        ).cast(pa.binary())
        framed += [prefix, c]
    out = pc.binary_join_element_wise(*framed, b"")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def key_hash64(*cols: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit hash of the row-wise key tuple.

    Used for hash partitioning (part_id = key_hash64 % P) — the
    Ray-native replacement for the reference's single sequential range
    (SURVEY.md §4 'sharding: none' → our design).  Must be a pure
    function of the VALUES, stable across processes and array layouts
    (pandas' hash_pandas_object is not: its categorize path yields
    different hashes for the same string depending on call context, a
    bug we hit in testing).  crc32 straight off the Arrow string
    buffers is C-fast and layout-independent; 32 bits is ample for
    choosing among O(10^3) partitions.
    """
    import zlib

    import pyarrow.compute as pc

    def _prep(c):
        t = c.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return c
        if (
            pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)
        ):
            # binary keys (e.g. a binary(20) address) hash over their
            # raw bytes — same offsets+data layout as string after a
            # (zero-copy for var-binary) cast, so the crc loop below
            # is shared
            return c.cast(pa.binary())
        return c.cast(pa.string())

    cols = [_prep(c) for c in cols]
    if len(cols) > 1 and any(
        pa.types.is_binary(c.type) or pa.types.is_large_binary(c.type)
        for c in cols
    ):
        # join requires one family: strings cast to binary zero-copy.
        # Binary components can contain ANY byte (a binary(20) address
        # routinely holds \x00), so a separator join is ambiguous —
        # ('a\x00','b') vs ('a','\x00b') would collide.  Length-prefix
        # framing instead (ADVICE r04).  String-only multi-col keys
        # keep the historical \x00 join: changing it would re-route
        # part_id for every existing lake's resumed ticks.
        joined = length_prefixed_join(
            [
                c if pa.types.is_binary(c.type) else c.cast(pa.binary())
                for c in cols
            ]
        )
    else:
        joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
            *cols, "\x00"
        )
    n = len(joined)
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    crc32 = zlib.crc32
    for chunk in _iter_chunks(joined):
        if chunk.null_count:
            filler: str | bytes = (
                b"" if pa.types.is_binary(chunk.type)
                or pa.types.is_large_binary(chunk.type) else ""
            )
            chunk = chunk.fill_null(filler)
        buffers = chunk.buffers()
        odt = (
            np.int64
            if pa.types.is_large_string(chunk.type)
            or pa.types.is_large_binary(chunk.type)
            else np.int32
        )
        offs = np.frombuffer(buffers[1], dtype=odt)[
            chunk.offset : chunk.offset + len(chunk) + 1
        ]
        data = memoryview(buffers[2]) if buffers[2] is not None else memoryview(b"")
        for i in range(len(chunk)):
            out[pos] = crc32(data[offs[i] : offs[i + 1]])
            pos += 1
    return out


def _inv_mod2_64(b: int) -> int:
    """Multiplicative inverse of odd b modulo 2^64 (Newton iteration)."""
    x = b
    for _ in range(6):
        x = (x * (2 - b * x)) % (1 << 64)
    return x


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer: spreads the poorly-mixed low bits of
    a mod-2^64 polynomial hash so min() over windows is meaningful."""
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def rolling_fingerprint(arr: pa.Array | pa.ChunkedArray, window: int = 64) -> pa.Array:
    """Document fingerprint: min of rolling polynomial window hashes
    (winnowing-style, deterministic), numpy-vectorized ACROSS documents:
    one weighted prefix sum over the chunk's concatenated byte stream
    with per-document rebasing via segment offsets (the
    ``poly_hash_utf8`` flat-buffer shape) — no per-document Python loop.

    All arithmetic is natural uint64 wraparound (mod 2^64).  The
    window hash is built WITHOUT division (integer division does not
    invert multiplication mod 2^64): with prefix sums of
    b[j]*B^(n-1-j), the window-i sum S_i = B^(n-w-i) * H_i where H_i
    is the canonical window hash sum b[i+k]*B^(w-1-k).  B is odd, so
    B^-1 exists mod 2^64 (Newton iteration); multiplying by
    invB^(n-w-i) recovers H_i exactly — length-independent, so equal
    windows hash equal across documents — then a splitmix64 finalizer
    spreads bits before min().  Documents shorter than the window hash
    as one full-length window (no rebase); null/empty → 0.
    """
    B = np.uint64(1000003)
    invB = np.uint64(_inv_mod2_64(1000003))
    w = int(window)
    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    pos = 0
    for chunk in _iter_chunks(arr):
        m = len(chunk)
        if m == 0:
            continue
        if chunk.null_count:
            chunk = chunk.fill_null("")
        buffers = chunk.buffers()
        odt = (
            np.int64
            if pa.types.is_large_string(chunk.type)
            or pa.types.is_large_binary(chunk.type)
            else np.int32
        )
        offs = np.frombuffer(buffers[1], dtype=odt)[
            chunk.offset : chunk.offset + m + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None
            else np.zeros(0, np.uint8)
        )
        lens = offs[1:] - offs[:-1]
        ne = np.flatnonzero(lens > 0)  # non-empty docs only
        if len(ne) == 0:
            pos += m
            continue
        lens_ne = lens[ne]
        starts = np.zeros(len(ne), dtype=np.int64)
        np.cumsum(lens_ne[:-1], out=starts[1:])
        total = int(lens_ne.sum())
        intra = np.arange(total, dtype=np.int64) - np.repeat(starts, lens_ne)
        seg = data[np.repeat(offs[:-1][ne], lens_ne) + intra].astype(np.uint64)
        maxlen = int(lens_ne.max())
        pows = np.ones(maxlen, dtype=np.uint64)  # pows[i] = B^i mod 2^64
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, B, dtype=np.uint64), out=pows[1:]
            )
        # weighted[k] = b[k] * B^(n_d-1-j) for byte j of doc d
        e = np.repeat(lens_ne - 1, lens_ne) - intra
        weighted = seg * pows[e]
        C = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum(weighted, out=C[1:])  # wraps mod 2^64
        # window layout: docs longer than w get n_d-w+1 windows of w
        # bytes; shorter docs one full-doc window with rebase exponent 0
        nw = np.where(lens_ne > w, lens_ne - w + 1, 1)
        wseg = np.zeros(len(ne), dtype=np.int64)
        np.cumsum(nw[:-1], out=wseg[1:])
        total_w = int(nw.sum())
        i_in = np.arange(total_w, dtype=np.int64) - np.repeat(wseg, nw)
        left = np.repeat(starts, nw) + i_in
        right = left + np.repeat(np.minimum(lens_ne, w), nw)
        rebase = np.repeat(np.maximum(lens_ne - w, 0), nw) - i_in
        s = C[right] - C[left]
        maxm = int(rebase.max())
        invpows = np.ones(maxm + 1, dtype=np.uint64)  # invpows[i] = invB^i
        if maxm > 0:
            np.multiply.accumulate(
                np.full(maxm, invB, dtype=np.uint64), out=invpows[1:]
            )
        mixed = _mix64(s * invpows[rebase])
        out[pos + ne] = np.minimum.reduceat(mixed, wseg)
        pos += m
    # int64 view keeps downstream pylist/pandas round-trips overflow-free
    return pa.array(out.view(np.int64), pa.int64())


#: fast-path cutoff for poly_hash_utf8: values this short pack into
#: two 64-bit words (covers virtually all word tokens)
_PACK_MAX = 16

_PACK_AR = np.arange(_PACK_MAX, dtype=np.int64)

#: per-process scratch buffers for the hot temporaries — the [m,16]
#: gather-index matrix alone is ~128 MB per 1M tokens, and a FRESH
#: allocation per batch pays first-touch page faults worth more than
#: the gather itself (measured 0.56 s vs 0.12 s); long-lived workers
#: reuse warm pages instead
_SCRATCH: dict = {}


def _scratch(name: str, shape: tuple, dtype) -> np.ndarray:
    need = int(np.prod(shape))
    a = _SCRATCH.get(name)
    if a is None or a.size < need or a.dtype != np.dtype(dtype):
        a = np.empty(max(need, 1), dtype)
        _SCRATCH[name] = a
    return a[:need].reshape(shape)


def _poly_hash_segments(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Byte-level polynomial hash of back-to-back segments in ``data``
    (weighted byte sums via one reduceat), splitmix64-finalized."""
    B = np.uint64(1099511628211)  # FNV prime, odd => good wraparound mixing
    seg = data.astype(np.uint64)
    pos_in = np.arange(len(seg), dtype=np.int64) - np.repeat(starts, lens)
    maxlen = int(lens.max())
    pows = np.ones(maxlen, dtype=np.uint64)
    if maxlen > 1:
        np.multiply.accumulate(np.full(maxlen - 1, B, dtype=np.uint64), out=pows[1:])
    weighted = seg * pows[pos_in]
    hs = np.add.reduceat(weighted, starts)
    return _mix64(hs)


def poly_hash_utf8(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit hash of each utf8/binary value, fully vectorized off the
    Arrow buffers (no per-value Python in the hot paths).

    Values of <= 16 bytes — virtually every word token — pack into two
    little-endian 64-bit words with ONE [m,16] gather and finalize
    with splitmix64; the byte-level polynomial path (weighted byte
    sums via reduceat) handles the longer tail.  The split is by VALUE
    length, never by batch composition, so a given value hashes
    identically across blocks / actors / runs — required by every
    consumer (minhash signatures, simhash, HLL) that compares hashes
    produced in different tasks.

    Values must be non-empty (callers filter empties first) — reduceat
    boundaries require strictly increasing offsets.
    """
    B = np.uint64(1099511628211)
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    for chunk in _iter_chunks(arr):
        m = len(chunk)
        if m == 0:
            continue
        if chunk.null_count:
            chunk = chunk.fill_null("")
        buffers = chunk.buffers()
        odt = (
            np.int64
            if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type)
            else np.int32
        )
        offs = np.frombuffer(buffers[1], dtype=odt)[
            chunk.offset : chunk.offset + m + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None
            else np.zeros(0, np.uint8)
        )
        lens = offs[1:] - offs[:-1]
        if lens.min() <= 0:
            raise ValueError("poly_hash_utf8 requires non-empty values")
        seg = data[offs[0] : offs[-1]]
        starts_rel = offs[:-1] - offs[0]
        h = np.empty(m, dtype=np.uint64)
        short = lens <= _PACK_MAX
        si = np.flatnonzero(short)
        if len(si):
            dpad = np.concatenate([seg, np.zeros(_PACK_MAX, np.uint8)])
            k = len(si)
            idx = _scratch("phu_idx", (k, _PACK_MAX), np.int64)
            np.add(starts_rel[si][:, None], _PACK_AR[None, :], out=idx)
            g = _scratch("phu_g", (k, _PACK_MAX), np.uint8)
            np.take(dpad, idx, out=g)
            gmask = _scratch("phu_mask", (k, _PACK_MAX), bool)
            np.less(_PACK_AR[None, :], lens[si][:, None], out=gmask)
            np.multiply(g, gmask, out=g)
            w = g.view("<u8")
            h[si] = _mix64(
                (w[:, 1] * B + w[:, 0])
                ^ (lens[si].astype(np.uint64) << np.uint64(48))
            )
        if len(si) < m:
            li = np.flatnonzero(~short)
            sub_lens = lens[li]
            sub_starts = np.zeros(len(li), dtype=np.int64)
            np.cumsum(sub_lens[:-1], out=sub_starts[1:])
            total = int(sub_lens.sum())
            intra = np.arange(total, dtype=np.int64) - np.repeat(sub_starts, sub_lens)
            sub = seg[np.repeat(starts_rel[li], sub_lens) + intra]
            h[li] = _poly_hash_segments(sub, sub_starts, sub_lens)
        out[pos : pos + m] = h
        pos += m
    return out[:pos] if pos != n else out
