import logging
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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
    from tsrollup.util import tune_ray_data

    tune_ray_data()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_table():
    """FIXTURES F1 'tiny': 4 sources, hot source skew, gaps, edge sources."""
    from tsrollup.synth import synth_table

    return synth_table(seed=42, n_sources=4, base_span=2048, edge_cases=True)


@pytest.fixture(scope="session")
def tiny_input_dir(tiny_table, tmp_path_factory):
    """tiny table split across two parquet fragments."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("tiny_in")
    half = tiny_table.num_rows // 2
    pq.write_table(tiny_table.slice(0, half), str(d / "a.parquet"))
    pq.write_table(tiny_table.slice(half), str(d / "b.parquet"))
    return str(d)
