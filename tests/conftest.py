"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # num_cpus=6 (not 4): repeated intermittent full-suite deadlocks —
    # a test's 2-actor pool plus the PREVIOUS test's not-yet-reaped
    # 2-actor pool can hold all 4 CPUs, starving the read stage forever
    # (observed 4x across sessions, always a spatial-join actor pool
    # idle with ReadParquet at 0%). Two extra CPUs guarantee read
    # headroom regardless of actor reaping timing; per-test semantics
    # are unchanged (pools still size 1-2).
    ray.init(
        address="local",
        num_cpus=6,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixtures_dir():
    from rustac_ray import synth

    return synth.ensure_fixtures("/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
