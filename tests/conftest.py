"""Shared pytest fixtures.

Ray is initialised ONCE per session (local mode, 4 CPUs) — per driver
contract; individual tests must never call ray.init/shutdown.
"""

from __future__ import annotations

import sys

import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def pyjelly_reference():
    """Import the reference pyjelly as the round-trip oracle."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import pyjelly  # noqa: F401
    from pyjelly.integrations.generic import generic_sink  # noqa: F401

    return pyjelly
