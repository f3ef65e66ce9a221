"""The shuffle primitive and block-vs-group kernel equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tsrollup.shuffle import group_slices, map_key_groups, map_key_partitions
from tsrollup.stages import WINDOW_SCHEMA, gapfill_block, gapfill_group


def _toy(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c"], n)),
            "g": pa.array(rng.integers(0, 7, n)),
            "v": pa.array(rng.integers(0, 100, n)),
        }
    )


def test_group_slices_complete_and_disjoint():
    t = _toy()
    seen = 0
    keys = set()
    for g in group_slices(t, ["k", "g"]):
        seen += g.num_rows
        key = (g["k"][0].as_py(), g["g"][0].as_py())
        assert key not in keys
        keys.add(key)
        assert len(set(zip(g["k"].to_pylist(), g["g"].to_pylist()))) == 1
    assert seen == t.num_rows
    assert len(keys) == 21


def test_map_key_partitions_covers_all_keys(ray_session):
    import ray.data

    t = _toy(5000, seed=1)
    ds = ray.data.from_arrow(t)

    def _block(b: pa.Table) -> pa.Table:
        out = {}
        for g in group_slices(b, ["k", "g"]):
            out[(g["k"][0].as_py(), g["g"][0].as_py())] = int(
                np.sum(g["v"].to_numpy(zero_copy_only=False))
            )
        return pa.table(
            {
                "k": pa.array([k for k, _ in out]),
                "g": pa.array([g for _, g in out], type=pa.int64()),
                "s": pa.array(list(out.values()), type=pa.int64()),
            }
        )

    got = (
        map_key_partitions(ds, ["k", "g"], _block, num_partitions=5)
        .to_pandas()
        .sort_values(["k", "g"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["k", "g"], as_index=False)["v"]
        .sum()
        .rename(columns={"v": "s"})
        .sort_values(["k", "g"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_map_key_groups_pandas_format(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_toy(800, seed=2))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"k": pd.Series(dtype=object), "n": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"k": [df["k"].iloc[0]], "n": [len(df)]})

    got = map_key_groups(ds, ["k"], fn, batch_format="pandas").to_pandas()
    assert got["n"].sum() == 800 and set(got["k"]) == {"a", "b", "c"}


def test_gapfill_block_equals_per_group():
    """The vectorized multi-window kernel must equal the single-group kernel."""
    rng = np.random.default_rng(3)
    rows = []
    for tier in ("1m", "1h"):
        for src in ("s1", "s2"):
            for win in (10, 11):
                buckets = np.sort(rng.choice(np.arange(win * 200, win * 200 + 200), 50, replace=False))
                for b in buckets:
                    rows.append((tier, src, win, int(b), int(rng.integers(1, 1000))))
    t = pa.table(
        {
            "tier": pa.array([r[0] for r in rows]),
            "source": pa.array([r[1] for r in rows]),
            "window_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "bucket": pa.array([r[3] for r in rows], type=pa.int64()),
            "sum_tok": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )
    blk = gapfill_block(t, "linear").to_pandas().sort_values(
        ["tier", "source", "window_id"]
    ).reset_index(drop=True)
    groups = []
    for g in group_slices(t, ["tier", "source", "window_id"]):
        groups.append(gapfill_group(g, "linear").to_pandas())
    per_group = (
        pd.concat(groups, ignore_index=True)
        .sort_values(["tier", "source", "window_id"])
        .reset_index(drop=True)[blk.columns.tolist()]
    )
    assert len(blk) == len(per_group) == 8
    for i in range(len(blk)):
        a, b = blk.iloc[i], per_group.iloc[i]
        assert (a.tier, a.source, a.window_id, a.start_bucket, a.n_in, a.n_filled) == (
            b.tier, b.source, b.window_id, b.start_bucket, b.n_in, b.n_filled,
        )
        np.testing.assert_array_equal(np.asarray(a.series), np.asarray(b.series))


def test_gapfill_block_empty():
    t = gapfill_block(
        WINDOW_SCHEMA.empty_table().add_column(0, "tier", pa.array([], type=pa.string())).select(
            ["tier"]
        ).add_column(1, "source", pa.array([], type=pa.string())).add_column(
            2, "window_id", pa.array([], type=pa.int64())
        ).add_column(3, "bucket", pa.array([], type=pa.int64())).add_column(
            4, "sum_tok", pa.array([], type=pa.int64())
        ),
        "linear",
    )
    assert t.num_rows == 0 and "tier" in t.column_names


def test_map_key_partitions_hash_strategy(ray_session):
    """The HASH_SHUFFLE exchange path (key-based repartition) — scoped and
    restored so later tests build under the default sort strategy."""
    import ray.data
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    old = ctx.shuffle_strategy
    try:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        t = _toy(2000, seed=4)
        ds = ray.data.from_arrow(t)

        def _block(b: pa.Table) -> pa.Table:
            total = int(np.sum(b["v"].to_numpy(zero_copy_only=False))) if b.num_rows else 0
            return pa.table({"s": pa.array([total], type=pa.int64())})

        got = map_key_partitions(ds, ["k"], _block, num_partitions=4).to_pandas()
        assert got["s"].sum() == int(t["v"].to_numpy(zero_copy_only=False).sum())
    finally:
        ctx.shuffle_strategy = old


def test_window_guard_fires_through_real_output_buffer(ray_session, tiny_input_dir, tmp_path):
    """Integration proof for the co-partitioned fast-path guard: shrink Ray's
    target block size so the output buffer really slices blocks mid-window,
    and assert the engine REFUSES (RuntimeError) instead of silently
    gap-filling partial windows."""
    import pytest
    from ray.data import DataContext

    from tsrollup import job
    from tsrollup.config import RollupConfig

    ctx = DataContext.get_current()
    saved = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 2048  # ~40 rolled rows -> guaranteed splits
        with pytest.raises(Exception, match="split across blocks"):
            job.run(
                tiny_input_dir,
                RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",)),
                resume=False,
            )
    finally:
        ctx.target_max_block_size = saved
