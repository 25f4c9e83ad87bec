"""Session-scoped Ray fixture. Ray is initialised ONCE per pytest
session (driver requirement) and torn down at exit."""

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TESTS = os.path.join(_REPO, "tests")
# Ray workers must be able to import the package AND the test modules
# (actor classes constructed with test-defined pydantic models are
# pickled by reference). Workers inherit the driver's environment at
# ray.init time, so extend PYTHONPATH before the fixture initializes.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, _TESTS, os.environ.get("PYTHONPATH", "")) if p
)
for p in (_REPO, _TESTS):
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session", autouse=True)
def _quiet_ray_data():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield
