"""Session-scoped Ray + shared fixture streams (generated once)."""

from __future__ import annotations

import shutil

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_stream():
    """sf-tiny change-event stream (~2k events, 1 rollback, v1→v3)."""
    from web3research_etl_ray.gen import ensure_stream

    return ensure_stream(2_000)


@pytest.fixture(scope="session")
def small_stream():
    """Golden-replay stream (~8k events, deterministic)."""
    from web3research_etl_ray.gen import ensure_stream

    return ensure_stream(8_000)


@pytest.fixture()
def lake_dir(tmp_path):
    d = str(tmp_path / "lake")
    yield d
    shutil.rmtree(d, ignore_errors=True)
