"""Unit pins for the round-5 shared helpers: the worker-local broadcast
cache (task-pool setup-once semantics) and the byte-sized exchange-width
heuristics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_worker_broadcast_get_caches_and_keys_by_ref(ray_session):
    import ray

    from tsrollup import util

    util._WORKER_BCAST_CACHE.clear()
    a = ray.put({"x": np.arange(3)})
    b = ray.put({"x": np.arange(5)})
    va = util.worker_broadcast_get(a)
    # second get returns the SAME object (cache hit, no re-deserialize)
    assert util.worker_broadcast_get(a) is va
    # a different ref is a different entry — never a stale read
    vb = util.worker_broadcast_get(b)
    assert len(vb["x"]) == 5 and len(va["x"]) == 3
    assert len(util._WORKER_BCAST_CACHE) == 2


def test_worker_broadcast_get_bounds_cache(ray_session):
    import ray

    from tsrollup import util

    util._WORKER_BCAST_CACHE.clear()
    refs = [ray.put(i) for i in range(12)]
    for r in refs:
        util.worker_broadcast_get(r)
    # the cache clears when it exceeds its bound instead of growing
    # unboundedly across a long session
    assert len(util._WORKER_BCAST_CACHE) <= 9


def test_ev_parts_small_corpus_small_width(ray_session):
    from tsrollup.pipelines.queries import _ev_parts
    from tsrollup.shuffle import default_partitions

    # the testdata events table is a few MB: width must clamp to the floor,
    # not the cluster-wide default (fixed task latency is O(width))
    assert _ev_parts("/root/testdata/sf0.01") == 4
    # a missing table falls back to the cluster default
    assert _ev_parts("/nonexistent") == default_partitions()


def test_exchange_width_small_tables(ray_session):
    from tsrollup.pipelines.tpch import _exchange_width

    w = _exchange_width("/root/testdata/sf0.01", "orders", "lineitem")
    assert 4 <= w <= 8  # few-MB facts -> near the floor


def test_asof_task_pool_matches_exchange_plan(ray_session):
    """The task-pool asof broadcast lane and the keyed-exchange plan agree
    row-for-row (the worker_broadcast_get conversion must not have changed
    semantics)."""
    import pandas as pd

    from tsrollup.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["asof_join"](sf).to_pandas().sort_values(
        ["source", "mark_bucket"]).reset_index(drop=True)
    b = QUERIES["asof_join_exchange"](sf).to_pandas().sort_values(
        ["source", "mark_bucket"]).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
