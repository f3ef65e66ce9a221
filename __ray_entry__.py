"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the tsrollup library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship pipeline — the full tsrollup engine (1m/1h/1d rollup ->
  gap-fill -> wavelet downsample -> Gorilla) over the sf0.001 events table.
- ``queries()``: one callable per implemented operator/pipeline (SURVEY §2 and
  the training-data operator library), each taking ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query;
  non-SQL ops (wavelet, gorilla, LTTB, MinHash, SimHash, LSH ANN,
  fingerprints) are rows-only checked and golden-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: tiered engine over sf0.001 events, returns the 1m points
    summary (stable schema, >= 1 row)."""
    from tsrollup.pipelines.queries import q_wavelet_points
    from tsrollup.util import tune_ray_data

    tune_ray_data(quiet=False)
    return q_wavelet_points("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from tsrollup.pipelines.queries import QUERIES
    from tsrollup.util import tune_ray_data

    tune_ray_data(quiet=False)
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tsrollup.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
