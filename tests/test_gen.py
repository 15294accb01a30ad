"""Generator determinism + fixture-contract tests (FIXTURES.md §1/§6)."""

import collections
import hashlib

import pyarrow.parquet as pq

from web3research_etl_ray.gen import (
    KeyUniverse,
    commit_id,
    content_for,
    generate_events,
)


def test_deterministic_regeneration(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    generate_events(a, n_events=1000, seed=42)
    generate_events(b, n_events=1000, seed=42)
    for name in ["events-00000.parquet", "rollbacks.parquet"]:
        assert pq.read_table(f"{a}/{name}").equals(pq.read_table(f"{b}/{name}"))


def test_row_purity():
    """Any row is re-derivable in isolation (pure function of seed/key/seq)."""
    assert commit_id("org/r", 7) == hashlib.sha1(b"org/r:7").hexdigest()
    c1 = content_for(42, "org/r", "src/a.py", 7)
    c2 = content_for(42, "org/r", "src/a.py", 7)
    assert c1 == c2
    assert 64 <= len(c1) <= 8192
    assert content_for(43, "org/r", "src/a.py", 7) != c1


def test_schema_versions_and_lang(tiny_stream):
    import glob

    files = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))
    schemas = [pq.ParquetFile(f).schema_arrow for f in files]
    assert "metadata" not in schemas[0].names
    assert "metadata" in schemas[-1].names and "size_bytes" in schemas[-1].names
    t = pq.read_table(files[0])
    for lang, path in zip(t["lang"].to_pylist(), t["path"].to_pylist()):
        assert path.endswith("." + lang)


def test_zipf_skew():
    uni = KeyUniverse(42, 50)
    picks = collections.Counter(uni.pick_repo("k", s) for s in range(5000))
    top = picks.most_common(1)[0][1]
    assert top > 5000 * 0.1  # hottest repo dominates (skew exists)


def test_ops_and_ordering(tiny_stream):
    import glob

    seqs, ops = [], collections.Counter()
    for f in sorted(glob.glob(f"{tiny_stream}/events-*.parquet")):
        t = pq.read_table(f, columns=["commit_seq", "op"])
        seqs.extend(t["commit_seq"].to_pylist())
        ops.update(t["op"].to_pylist())
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert 0 < ops["delete"] < ops["upsert"]
