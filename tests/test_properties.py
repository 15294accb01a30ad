"""Property/metamorphic tests (SURVEY.md §5, no Ray needed):
the LWW fold must be invariant to cross-key event order and to
duplicate delivery — the algebra that makes distributed replay safe."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from web3research_etl_ray.stages.lww import fold_lww

KEYS = [("r1", "a"), ("r1", "b"), ("r2", "a")]


def _table(events):
    return pa.table(
        {
            "repo": [k[0] for k, _ in events],
            "path": [k[1] for k, _ in events],
            "commit_seq": pa.array([s for _, s in events], pa.int64()),
            "op": ["upsert"] * len(events),
            "n_events": pa.array([1] * len(events), pa.int64()),
        }
    )


def _state(t):
    return {
        (r["repo"], r["path"]): r["commit_seq"]
        for r in t.select(["repo", "path", "commit_seq"]).to_pylist()
    }


events_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)), min_size=1, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(events=events_strategy, seed=st.randoms(use_true_random=False))
def test_fold_order_invariant(events, seed):
    shuffled = list(events)
    seed.shuffle(shuffled)
    assert _state(fold_lww(_table(events))) == _state(fold_lww(_table(shuffled)))


@settings(max_examples=200, deadline=None)
@given(events=events_strategy, dup_idx=st.integers(0, 39))
def test_fold_duplicate_delivery_invariant(events, dup_idx):
    duplicated = events + [events[dup_idx % len(events)]]
    assert _state(fold_lww(_table(events))) == _state(fold_lww(_table(duplicated)))


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.text(min_size=1, max_size=40).filter(lambda s: s.encode("utf-8")),
        min_size=1,
        max_size=30,
    )
)
def test_poly_hash_batch_composition_invariant(values):
    """poly_hash_utf8(batch)[i] == poly_hash_utf8([v_i]) for arbitrary
    unicode — the fast/slow split is by value length, never by batch
    composition, which every cross-task hash comparison (minhash,
    simhash, HLL) depends on.  Exercises the 16-byte packed-path
    boundary since utf-8 lengths straddle it."""
    import numpy as np

    from web3research_etl_ray.functions.hashing import poly_hash_utf8

    batch = poly_hash_utf8(pa.array(values, pa.string()))
    singles = np.array(
        [poly_hash_utf8(pa.array([v], pa.string()))[0] for v in values],
        dtype=np.uint64,
    )
    assert (batch == singles).all()
    # equal values hash equal; and chunked layout is irrelevant
    if len(values) > 1:
        mid = len(values) // 2 or 1
        chunked = poly_hash_utf8(
            pa.chunked_array(
                [pa.array(values[:mid], pa.string()), pa.array(values[mid:], pa.string())]
            )
        )
        assert (batch == chunked).all()


@settings(max_examples=100, deadline=None)
@given(events=events_strategy, split=st.integers(1, 39))
def test_fold_associative_partial_then_final(events, split):
    """fold(fold(A) ∪ fold(B)) == fold(A ∪ B) — the partial/final
    two-level reduction used around the shuffle."""
    i = split % max(1, len(events))
    a, b = events[:i], events[i:]
    parts = [fold_lww(_table(p)) for p in (a, b) if p]
    two_level = fold_lww(pa.concat_tables(parts))
    assert _state(two_level) == _state(fold_lww(_table(events)))


# --- combiner associativity across ALL aggregate modes ----------------
# The inline map-side refold (replay.read_norm_partial) folds arbitrary
# prefixes of the stream before the exchange, and the merge folds the
# folded pieces again — correctness at Tron width (LWW + additive +
# min/max in one registry) rests on fold being associative per mode:
# fold(fold(A) ++ fold(B)) == fold(A ++ B) for ANY split point.

def _agg_table(events):
    n = len(events)
    return pa.table(
        {
            "repo": [k[0] for k, _ in events],
            "path": [k[1] for k, _ in events],
            "commit_seq": pa.array([s for _, s in events], pa.int64()),
            "op": ["upsert"] * n,
            "n_events": pa.array([1] * n, pa.int64()),
            "val": pa.array([s * 3 + 1 for _, s in events], pa.int64()),
            "lo": pa.array([s for _, s in events], pa.int64()),
            "hi": pa.array([s for _, s in events], pa.int64()),
        }
    )


def _agg_state(t):
    return {
        (r["repo"], r["path"]): (
            r["commit_seq"], r["n_events"], r["val"], r["lo"], r["hi"]
        )
        for r in t.to_pylist()
    }


def _fold_modes(t):
    return fold_lww(
        t, "n_events", ("repo", "path"), "commit_seq",
        sum_cols=("val",), min_cols=("lo",), max_cols=("hi",),
    )


@settings(max_examples=200, deadline=None)
@given(events=events_strategy, split=st.integers(0, 40))
def test_partial_fold_associative_all_modes(events, split):
    k = split % (len(events) + 1)
    t = _agg_table(events)
    whole = _fold_modes(t)
    a = _fold_modes(t.slice(0, k))
    b = _fold_modes(t.slice(k))
    refolded = _fold_modes(pa.concat_tables([a, b]))
    assert _agg_state(whole) == _agg_state(refolded)


# --- nested_equal ≡ to_pylist equality (the contract it replaced) ----

_NESTED_TY = pa.list_(
    pa.struct(
        [("k", pa.string()), ("m", pa.map_(pa.string(), pa.int64()))]
    )
)

_nested_vals = st.recursive(
    st.none()
    | st.lists(
        st.fixed_dictionaries(
            {
                "k": st.none() | st.text(max_size=3),
                "m": st.none()
                | st.lists(
                    st.tuples(
                        st.sampled_from(["a", "b", "c"]),
                        st.integers(-5, 5),
                    ),
                    max_size=3,
                    unique_by=lambda kv: kv[0],
                ),
            }
        ),
        max_size=3,
    ),
    lambda s: s,
    max_leaves=4,
)


@given(
    st.lists(_nested_vals, min_size=1, max_size=8),
    st.lists(_nested_vals, min_size=1, max_size=8),
    st.integers(0, 3),
)
@settings(max_examples=120, deadline=None)
def test_nested_equal_matches_pylist_semantics(xs, ys, off):
    """check.nested_equal must agree ROW-FOR-ROW with to_pylist
    equality for arbitrary list<struct<str, map>> values, including
    sliced layouts — it replaced that Python path (VERDICT r04)."""
    from web3research_etl_ray.pipelines.check import nested_equal

    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    # pad the front so the slice always yields exactly n rows at a
    # non-zero physical offset
    a = pa.array([None] * off + xs, _NESTED_TY).slice(off, n)
    b = pa.array(ys, _NESTED_TY)
    want = [x == y for x, y in zip(a.to_pylist(), b.to_pylist())]
    assert nested_equal(a, b).tolist() == want
