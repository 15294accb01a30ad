"""Deterministic synthetic change-event stream generator (FIXTURES.md).

Produces the commit-ordered Parquet event stream the engine replays —
the sandbox stand-in for the reference's chain RPC source
(src/ch_eth/init.rs:19-97 fetches blocks; our "blocks" are commit-
ordered rows over key (repo, path) per BASELINE.json input_hint).

Everything is a pure function of (seed, repo, path, commit_seq): commit
ids, contents, sizes, key choice, op choice (FIXTURES.md §6).  No
wall-clock, no global RNG state — any row can be re-derived in
isolation, which is what makes the golden-replay and resume tests
hermetic.

Layout written to ``out_dir``:
  events-{segment:05d}.parquet   one file per commit-range segment,
                                 rows sorted by commit_seq; files before
                                 segment v2_from are schema v1, then v2,
                                 then v3 (schema evolution mid-stream)
  rollbacks.parquet              sparse reorg control table
  gen-info.json                  parameters for reproducibility
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from statistics import NormalDist

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import LANGS, ROLLBACK_SCHEMA

_NORM = NormalDist()

# Base pseudo-code paragraphs per language, built once, deterministically.
_SNIPPET_TEMPLATES = {
    "py": "def fn_{i}(x, y):\n    acc = x * {i} + y\n    for k in range({i} % 7 + 1):\n        acc ^= hash((k, acc)) & 0xFFFF\n    return acc\n",
    "rs": "pub fn fn_{i}(x: u64, y: u64) -> u64 {{\n    let mut acc = x.wrapping_mul({i}) ^ y;\n    for k in 0..({i} % 7 + 1) {{ acc = acc.rotate_left(k as u32) ^ 0x{i:x}; }}\n    acc\n}}\n",
    "go": "func Fn{i}(x, y uint64) uint64 {{\n    acc := x*{i} ^ y\n    for k := 0; k < {i}%7+1; k++ {{ acc = acc<<1 ^ uint64(k) }}\n    return acc\n}}\n",
    "js": "function fn{i}(x, y) {{\n  let acc = (x * {i}) ^ y;\n  for (let k = 0; k < ({i} % 7) + 1; k++) acc = (acc << 1) ^ k;\n  return acc >>> 0;\n}}\n",
    "java": "static long fn{i}(long x, long y) {{\n    long acc = x * {i} ^ y;\n    for (int k = 0; k < {i} % 7 + 1; k++) acc = Long.rotateLeft(acc, k) ^ {i}L;\n    return acc;\n}}\n",
    "md": "## Section {i}\n\nNotes for module {i}: deterministic text body, revision-tracked.\nItem a-{i}, item b-{i}, item c-{i}.\n\n",
    "toml": "[module.m{i}]\nname = \"mod-{i}\"\nversion = \"0.{i}.0\"\nfeatures = [\"a{i}\", \"b{i}\"]\n\n",
}


def _paragraph_pool(lang: str, n: int = 16) -> list[str]:
    tpl = _SNIPPET_TEMPLATES[lang]
    return [tpl.format(i=i) for i in range(1, n + 1)]


_POOLS = {lang: _paragraph_pool(lang) for lang in LANGS}
_POOL_BODIES = {lang: "".join(pool) for lang, pool in _POOLS.items()}


def _h64(*parts: object) -> int:
    """Pure 64-bit hash of the given parts (stable across processes)."""
    b = hashlib.blake2b(":".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(b.digest(), "big")


def _u01(*parts: object) -> float:
    return (_h64(*parts) + 0.5) / 2.0**64


def commit_id(repo: str, commit_seq: int) -> str:
    """40-hex commit id = sha1(f"{repo}:{commit_seq}") (FIXTURES.md §1)."""
    return hashlib.sha1(f"{repo}:{commit_seq}".encode()).hexdigest()


def content_for(seed: int, repo: str, path: str, commit_seq: int) -> str:
    """Deterministic pseudo-code text, 64–8192 chars (log-normal)."""
    lang = lang_of_path(path)
    u = _u01(seed, repo, path, commit_seq, "len")
    # inverse-CDF log-normal, median ~500 chars
    z = _NORM.inv_cdf(min(max(u, 1e-12), 1 - 1e-12))
    length = int(min(max(math.exp(6.2 + 0.9 * z), 64), 8192))
    header = f"// {repo}/{path} @ seq {commit_seq} rev {_h64(seed, repo, path, commit_seq) & 0xFFFFFF:06x}\n"
    body = _POOL_BODIES[lang]
    start = _h64(seed, repo, path, commit_seq, "off") % max(1, len(body) - 64)
    need = max(length - len(header), 1)
    reps = need // max(1, len(body) - start) + 1
    text = (body[start:] + body * reps)[:need]
    return header + text


def lang_of_path(path: str) -> str:
    return path.rsplit(".", 1)[-1]


class KeyUniverse:
    """Deterministic repo/path universe with Zipf(α=1.1) repo skew.

    repos: 200 (sf-tiny 20); paths per repo log-normal μ=3.5 capped at
    2000 (FIXTURES.md §6).  Hot-repo skew exercises the salt-based
    splitting requirement (BASELINE.json north_star).
    """

    def __init__(self, seed: int, n_repos: int):
        self.seed = seed
        self.n_repos = n_repos
        self.repos = [
            f"org-{_h64(seed, 'org', i) % 50:03d}/repo-{i:04d}" for i in range(n_repos)
        ]
        # Zipf α=1.1 pmf over repo ranks
        ranks = np.arange(1, n_repos + 1, dtype=np.float64)
        p = ranks ** (-1.1)
        p /= p.sum()
        self.repo_cdf = np.cumsum(p)
        # paths per repo: log-normal mu=3.5 sigma=1.0 capped 2000
        self.paths_per_repo = []
        for i in range(n_repos):
            u = _u01(seed, "npaths", i)
            z = _NORM.inv_cdf(min(max(u, 1e-12), 1 - 1e-12))
            n_paths = int(min(max(math.exp(3.5 + 1.0 * z), 1), 2000))
            self.paths_per_repo.append(n_paths)
        self._path_cache: dict[tuple[int, int], str] = {}

    def pick_repo(self, seed_part: object, commit_seq: int) -> int:
        u = _u01(self.seed, "repo", seed_part, commit_seq)
        return int(np.searchsorted(self.repo_cdf, u))

    def path_of(self, repo_idx: int, path_idx: int) -> str:
        key = (repo_idx, path_idx)
        cached = self._path_cache.get(key)
        if cached is not None:
            return cached
        suffix = LANGS[_h64(self.seed, "suffix", repo_idx, path_idx) % len(LANGS)]
        module = _h64(self.seed, "mod", repo_idx, path_idx) % 20
        p = f"src/module_{module:02d}/file_{path_idx:04d}.{suffix}"
        self._path_cache[key] = p
        return p

    def pick_key(self, commit_seq: int) -> tuple[str, str]:
        ri = self.pick_repo("k", commit_seq)
        pi = _h64(self.seed, "path", commit_seq) % self.paths_per_repo[ri]
        return self.repos[ri], self.path_of(ri, pi)


def _event_row(seed: int, uni: KeyUniverse, commit_seq: int) -> dict:
    repo, path = uni.pick_key(commit_seq)
    op = "delete" if _u01(seed, "op", commit_seq) < 0.03 else "upsert"
    content = (
        "" if op == "delete" else content_for(seed, repo, path, commit_seq)
    )
    return {
        "repo": repo,
        "path": path,
        "commit": commit_id(repo, commit_seq),
        "lang": lang_of_path(path),
        "content": content,
        "commit_seq": commit_seq,
        "op": op,
    }


def _metadata_for(seed: int, commit_seq: int):
    if _u01(seed, "hasmeta", commit_seq) < 0.4:
        return None
    return [
        ("author", f"dev-{_h64(seed, 'author', commit_seq) % 40:02d}"),
        ("ticket", f"T-{_h64(seed, 'ticket', commit_seq) % 10000:04d}"),
    ]


def _write_segment(args) -> dict:
    """Worker: generate one segment file (pure function of its args —
    safe to run in any process, in any order)."""
    out_dir, seed, n_repos, seg, lo, hi, v2_from, v3_from = args
    uni = KeyUniverse(seed, n_repos)
    rows = [_event_row(seed, uni, s) for s in range(lo, hi)]
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    arrays = {
        "repo": pa.array(cols["repo"], pa.string()),
        "path": pa.array(cols["path"], pa.string()),
        "commit": pa.array(cols["commit"], pa.string()),
        "lang": pa.array(cols["lang"], pa.string()),
        "content": pa.array(cols["content"], pa.string()),
        "commit_seq": pa.array(cols["commit_seq"], pa.int64()),
        "op": pa.array(cols["op"], pa.string()),
    }
    version = 1
    if seg >= v2_from:
        version = 2
        meta = [_metadata_for(seed, s) for s in range(lo, hi)]
        arrays["metadata"] = pa.array(meta, pa.map_(pa.string(), pa.string()))
    if seg >= v3_from:
        version = 3
        arrays["lang"] = arrays["lang"].dictionary_encode()
        arrays["size_bytes"] = pa.array([len(c) for c in cols["content"]], pa.int64())
    fname = f"events-{seg:05d}.parquet"
    pq.write_table(pa.table(arrays), os.path.join(out_dir, fname))
    return {"file": fname, "segment": seg, "schema_version": version,
            "seq_from": lo, "seq_to": hi - 1}


def generate_events(
    out_dir: str,
    n_events: int = 5_000,
    seed: int = 42,
    n_repos: int | None = None,
    n_segments: int | None = None,
    n_rollbacks: int | None = None,
    workers: int | None = None,
) -> dict:
    """Write the full fixture set; returns the parameter/manifest dict.

    Schema evolution: first half of segments v1, then v2 (adds
    ``metadata``), last quarter v3 (adds ``size_bytes``, dict-encodes
    ``lang``).  Rollback orphan ranges are placed inside the already-
    emitted prefix so rollback genuinely rewrites applied state.
    """
    if n_repos is None:
        n_repos = 20 if n_events <= 10_000 else 200
    if n_segments is None:
        n_segments = max(4, min(64, n_events // 25_000))
    if n_rollbacks is None:
        n_rollbacks = 1 if n_events <= 10_000 else 3

    os.makedirs(out_dir, exist_ok=True)
    v2_from = n_segments // 2
    v3_from = (3 * n_segments) // 4
    per_seg = n_events // n_segments

    jobs = []
    for seg in range(n_segments):
        lo = seg * per_seg
        hi = n_events if seg == n_segments - 1 else (seg + 1) * per_seg
        jobs.append((out_dir, seed, n_repos, seg, lo, hi, v2_from, v3_from))

    if workers is None:
        workers = min(8, os.cpu_count() or 1, n_segments)
    if workers > 1 and n_events >= 50_000:
        # segments are pure functions of their args → embarrassingly
        # parallel; output identical to the sequential path.  fork, not
        # spawn: spawn re-imports the caller's __main__ (hangs when the
        # caller holds a Ray session); forked workers only run pure
        # numpy/pyarrow code and never touch inherited Ray state.
        import multiprocessing as mp

        with mp.get_context("fork").Pool(workers) as pool:
            files = pool.map(_write_segment, jobs)
    else:
        files = [_write_segment(j) for j in jobs]

    rollbacks = _make_rollbacks(seed, n_events, n_segments, n_rollbacks)
    pq.write_table(
        pa.table(
            {
                "barrier_seq": pa.array([r[0] for r in rollbacks], pa.int64()),
                "orphan_from": pa.array([r[1] for r in rollbacks], pa.int64()),
                "orphan_to": pa.array([r[2] for r in rollbacks], pa.int64()),
            },
            schema=ROLLBACK_SCHEMA,
        ),
        os.path.join(out_dir, "rollbacks.parquet"),
    )

    info = {
        "seed": seed,
        "n_events": n_events,
        "n_repos": n_repos,
        "n_segments": n_segments,
        "v2_from_segment": v2_from,
        "v3_from_segment": v3_from,
        "rollbacks": [
            {"barrier_seq": b, "orphan_from": f, "orphan_to": t}
            for b, f, t in rollbacks
        ],
        "files": files,
    }
    with open(os.path.join(out_dir, "gen-info.json"), "w") as fh:
        json.dump(info, fh, indent=1)
    return info


def _make_rollbacks(
    seed: int, n_events: int, n_segments: int, n_rollbacks: int
) -> list[tuple[int, int, int]]:
    out = []
    span = max(1, n_events // 100)  # ~1% of the stream orphaned per reorg
    for i in range(n_rollbacks):
        anchor = (i + 1) * n_events // (n_rollbacks + 1)
        orphan_to = anchor
        orphan_from = max(0, orphan_to - span + 1)
        barrier_seq = orphan_to + 1 + (_h64(seed, "rb", i) % span)
        out.append((barrier_seq, orphan_from, orphan_to))
    return out


def default_stream_dir(n_events: int, seed: int = 42) -> str:
    """Cached location for a generated stream (scratch under /tmp)."""
    return f"/tmp/w3r_streams/seed{seed}-n{n_events}"


def ensure_stream(n_events: int, seed: int = 42, **kw) -> str:
    """Generate-once helper: returns a dir containing the fixture set."""
    d = default_stream_dir(n_events, seed)
    marker = os.path.join(d, "gen-info.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh).get("n_events") == n_events:
                return d
    generate_events(d, n_events=n_events, seed=seed, **kw)
    return d
