import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_fixture():
    from tabbyray.fixtures import ensure_fixture
    return ensure_fixture("smoke", seed=7, n_pages=30, n_entities=400)


@pytest.fixture(scope="session")
def conformance_fixture():
    from tabbyray.fixtures import ensure_fixture
    return ensure_fixture("conformance", seed=11, n_pages=200, n_entities=1200)


@pytest.fixture(scope="session")
def smoke_kb(smoke_fixture):
    from tabbyray.kb import load_kb
    return load_kb(os.path.join(smoke_fixture, "kb.parquet"))
