"""SymSpell deletion-blocked distance-1 matching (functions/fuzzy.py)
vs brute-force Levenshtein over the vocabulary."""

import numpy as np
import pyarrow as pa
import ray

from web3research_etl_ray.functions.fuzzy import spelling_variant_pairs


def _lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def _brute(vocab):
    out = set()
    v = sorted(vocab)
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if abs(len(v[i]) - len(v[j])) <= 1 and _lev(v[i], v[j]) == 1:
                out.add((v[i], v[j]))
    return out


def _planted_corpus(seed=13, n_words=300):
    rng = np.random.default_rng(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < n_words:
        w = "".join(rng.choice(list(letters), rng.integers(4, 10)))
        words.add(w)
    words = sorted(words)
    variants = []
    for w in words[:40]:  # planted typos: sub, del, ins
        variants.append(w[:2] + "z" + w[3:])
        variants.append(w[1:])
        variants.append(w[:3] + "q" + w[3:])
    vocab = words + variants
    rng.shuffle(vocab)
    docs = [" ".join(vocab[i::7]) for i in range(7)]
    return docs, set(vocab)


def _run(docs, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    rows = spelling_variant_pairs(ds, **kw).take_all()
    return {(r["tok_a"], r["tok_b"]) for r in rows}


def test_matches_brute_force_with_planted_typos():
    docs, vocab = _planted_corpus()
    got = _run(docs, min_len=3, max_len=14)
    want = {
        p for p in _brute({w for w in vocab if 3 <= len(w) <= 14})
    }
    assert got == want
    assert len(want) >= 80  # the planted typos are actually present


def test_handles_insertion_deletion_substitution():
    docs = ["cat cats bat cut coat"]
    got = _run(docs, min_len=3, max_len=14)
    assert ("cat", "cats") in got      # insertion
    assert ("bat", "cat") in got       # substitution
    assert ("cat", "cut") in got       # substitution
    assert ("cat", "coat") in got      # insertion mid-word
    assert ("bat", "cut") not in got   # distance 2


def test_df_and_length_bounds():
    docs = ["aa aaa apple apple apples banana"]
    # df_min=2 keeps only 'apple'; no partner -> empty
    assert _run(docs, min_len=3, max_len=14, df_min=2) == set()
    # aa/aaa excluded by min_len=3
    got = _run(docs, min_len=3, max_len=14)
    assert ("apple", "apples") in got
    assert all("aa" not in p for p in got)
