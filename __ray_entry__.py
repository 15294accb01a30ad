"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: CDC replay of a change-event stream derived
    from /root/testdata/sf0.001 documents through the full engine
    (normalize → partial LWW → hash-partitioned merge actors →
    two-phase manifest commit); returns the converged lake table."""
    from web3research_etl_ray.pipelines.queries import q_cdc_replay_lake

    return q_cdc_replay_lake("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 +
    training-data operators).  Each callable takes sf_dir and returns
    a Dataset / pyarrow Table."""
    from web3research_etl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names); omitted for
    model-scoring / probabilistic / stub operators, which get the
    rows-only check."""
    from web3research_etl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
