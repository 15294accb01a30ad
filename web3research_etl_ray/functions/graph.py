"""Iterative graph algorithms over edge Datasets.

Companions to the distributed connected components in
``functions/dedup.py`` — the iterative-workload family the Dataset
API handles with per-iteration shuffles (one join + one groupby per
step, state carried as a node-keyed Dataset).

Scale shape: each PageRank iteration ships one (dst, contribution)
row per edge through a groupby-sum and joins the O(V) rank state
through the bucketed hash join — no driver-side adjacency, no
broadcast rank dict; the driver sees only the dangling-mass scalar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from .joins import hash_join


def pagerank(
    edges: ray.data.Dataset,
    *,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """PageRank by power iteration (Brin & Page 1998) over an edge
    list, dangling mass redistributed uniformly (textbook form, ranks
    sum to 1 every iteration).

    State = a (node, deg, rank) Dataset, materialized per iteration.
    Per iteration: hash_join edges×state on src → per-edge
    contribution rank/deg → groupby(dst) sum → left-join back onto
    the node universe (absent ⇒ 0 in-flow) → rescale.  The only
    driver values are n_nodes and the dangling-rank scalar."""
    def ends(t: pa.Table) -> pa.Table:
        s = t.column(src_col).cast(pa.int64()).combine_chunks() \
            if isinstance(t.column(src_col), pa.ChunkedArray) \
            else t.column(src_col).cast(pa.int64())
        d = t.column(dst_col).cast(pa.int64()).combine_chunks() \
            if isinstance(t.column(dst_col), pa.ChunkedArray) \
            else t.column(dst_col).cast(pa.int64())
        return pa.table({"node": pa.concat_arrays(
            [pa.array(s.to_numpy(zero_copy_only=False), pa.int64()),
             pa.array(d.to_numpy(zero_copy_only=False), pa.int64())]
        )})

    nodes = edges.map_batches(
        ends, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("node").count().drop_columns(["count()"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
        )

    degrees = (
        edges.map_batches(
            lambda t: pa.table({"node": t.column(src_col).cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("node")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["node", "deg"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    # node universe with out-degree (0 for dangling) + initial rank
    state = hash_join(
        nodes, degrees, "node", left_cols=["node"], right_cols=["deg"],
        how="left",
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "deg": t.column("deg").fill_null(0).cast(pa.int64()),
                "rank": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(iterations):
        # dangling mass: one scalar aggregate over the state
        dangling = state.map_batches(
            lambda t: pa.table(
                {
                    "d": pa.array(
                        [
                            float(
                                np.where(
                                    t.column("deg").to_numpy(
                                        zero_copy_only=False
                                    ) == 0,
                                    t.column("rank").to_numpy(
                                        zero_copy_only=False
                                    ),
                                    0.0,
                                ).sum()
                            )
                        ],
                        pa.float64(),
                    )
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ).aggregate(Sum("d", alias_name="d"))["d"] or 0.0

        # per-edge contribution = rank(src)/deg(src), via the bucketed
        # hash join (state is the build side)
        contribs = hash_join(
            edges, state.map_batches(
                lambda t: t.rename_columns(
                    [src_col if c == "node" else c for c in t.column_names]
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            src_col,
            left_cols=[src_col, dst_col],
            right_cols=["deg", "rank"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column(dst_col).cast(pa.int64()),
                    "contrib": pa.array(
                        t.column("rank").to_numpy(zero_copy_only=False)
                        / np.maximum(
                            t.column("deg").to_numpy(zero_copy_only=False), 1
                        ),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        summed = contribs.groupby("node").aggregate(
            Sum("contrib", alias_name="contrib")
        )
        base = (1.0 - damping) / n_nodes + damping * float(dangling) / n_nodes

        def apply(t: pa.Table, base=base) -> pa.Table:
            c = t.column("contrib").fill_null(0.0).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "node": t.column("node").cast(pa.int64()),
                    "deg": t.column("deg").cast(pa.int64()),
                    "rank": pa.array(base + damping * c, pa.float64()),
                }
            )

        state = hash_join(
            state, summed, "node", left_cols=["node", "deg"],
            right_cols=["contrib"], how="left",
        ).map_batches(
            apply, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return state.map_batches(
        lambda t: t.select(["node", "rank"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    max_iters: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Multi-source breadth-first hop distances over a DIRECTED edge
    Dataset (pass both orientations for an undirected graph):
    (node, hops) for every node reachable from ``seeds`` — the third
    member of the iterative family next to ``pagerank`` and
    ``connected_components_ds``.

    Level-synchronous frontier expansion, the textbook distributed BFS
    (Pregel/Beamer): per round, one bucketed hash join frontier x edges
    on the source endpoint emits (neighbor, hops+1), a groupby-min
    dedups the level, and an anti-join against the visited set keeps
    only first-time nodes, so each edge is shipped at most once per
    round and each node settles exactly once (its first level is its
    shortest distance — BFS invariant).  State is two node-keyed
    Datasets (frontier, visited); the driver sees only the frontier
    count per round.  Rounds = graph diameter, capped at
    ``max_iters``."""
    from ray.data.aggregate import Min

    seeds = seeds.map_batches(
        lambda t: pa.table(
            {"node": t.column("node").cast(pa.int64()),
             "hops": t.column("hops").cast(pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    visited = seeds
    frontier = seeds

    def as_src(t: pa.Table) -> pa.Table:
        return pa.table(
            {src_col: t.column("node").cast(pa.int64()),
             "hops": t.column("hops").cast(pa.int64())}
        )

    def bump(t: pa.Table) -> pa.Table:
        h = t.column("hops").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": t.column(dst_col).cast(pa.int64()),
             "hops": pa.array(h + 1, pa.int64())}
        )

    for _ in range(max_iters):
        if frontier.count() == 0:
            break
        nbrs = hash_join(
            frontier.map_batches(
                as_src, batch_format="pyarrow", zero_copy_batch=True
            ),
            edges,
            src_col,
            left_cols=[src_col, "hops"],
            right_cols=[dst_col],
        ).map_batches(bump, batch_format="pyarrow", zero_copy_batch=True)
        level = nbrs.groupby("node").aggregate(Min("hops", alias_name="hops"))
        frontier = hash_join(
            level, visited, "node",
            left_cols=["node", "hops"], right_cols=["node"], how="anti",
        ).map_batches(
            # column order must match the visited schema for union()
            lambda t: t.select(["node", "hops"]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
    return visited
