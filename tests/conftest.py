"""Shared fixtures: one Ray session per pytest run."""

from __future__ import annotations

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 200-doc F5 corpus (docs, truth, assets)."""
    from textgraphs_ray.corpus import generate

    return generate(200)


HERZOG = ("Werner Herzog is a remarkable filmmaker and intellectual "
          "originally from Germany, the son of Dietrich Herzog.")


@pytest.fixture(scope="session")
def herzog_docs():
    import pyarrow as pa
    return pa.table({"doc_id": ["herzog-0"], "text": [HERZOG]})
