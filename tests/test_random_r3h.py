"""Randomized engine-vs-oracle sweep for the round-3h event-analytics
family: seeded random events tables with ADVERSARIAL shape — tiny user
domains (forced ties), duplicate timestamps, negative values, sub-minute
jitter, sources with a single row — run through the SAME DuckDB oracles
the driver uses. Fixtures pin known edges; this sweep hunts unknown ones."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

SWEEP = [
    "sessionize", "user_transitions", "wau_7d", "window_funnel",
    "attribution_last_touch", "twa_1m", "motif_1m", "coverage_1h",
    "hod_anomaly", "log2_histogram", "audience_overlap", "pagerank_types",
    "retention_curve", "props_extract", "conversion_lag", "unpivot_stats", "dow_hod_profile", "gap_stats", "stl_strength", "theil_sen",
    # round-3i family
    "max_drawdown", "streaks", "bollinger_breach", "rollup_month", "benford",
    # round-3j family (semi_join_bloom shares semi_join_users' oracle, so
    # the sweep also proves the bloom plan against the SQL ground truth)
    "rollup_week", "gini_sources", "rsi_cutler", "semi_join_bloom",
    "dominant_period", "macd_1m", "interarrival_stats", "distinct_users_1h",
    "fano_factor", "peak_minute_1h", "source_share_1h",
    # round-3k family
    "source_corr_1m", "cusum_1m",
    # round-3l family
    "session_paths", "kendall_tau_1h", "quantiles_cont",
    "throttle_events", "ks_2samp_sources", "spearman_rho_1h",
    "rfm_segments", "systematic_sample", "tukey_outliers",
    "mwu_sources", "welch_t_sources", "survival_km", "hill_tail_index",
    "dtw_pairs_1h", "mk_trend_1h", "runs_test_1m",
    "growth_accounting", "session_durations", "ab_conversion",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _random_events(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    types = ["view", "click", "purchase", "signup", "error"][: int(rng.integers(2, 6))]
    # sub-minute jitter + heavy ts collisions (small time domain)
    ts_min = rng.integers(0, rng.integers(100, 20_000), size=n)
    ts_us = ts_min * 60_000_000 + rng.integers(0, 3, size=n) * 30_000_000
    props = rng.choice(
        ['{"k": 7}', '{"k": -2}', '{"j": 1}', "junk", ""], size=n
    )
    return pa.table(
        {"event_id": pa.array(np.arange(n), pa.int64()),
         "ts": pa.array(ts_us.astype("int64"), pa.timestamp("us")),
         "user_id": pa.array(rng.integers(1, rng.integers(2, 12), size=n), pa.int64()),
         "event_type": pa.array(rng.choice(types, size=n)),
         "value": pa.array(np.round(rng.normal(0, 50, size=n), 2), pa.float64()),
         "props": pa.array(props.astype(object), pa.string())}
    )


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_events_sweep(ray_session, tmp_path_factory, seed):
    import duckdb

    d = tmp_path_factory.mktemp(f"rand{seed}")
    pq.write_table(_random_events(seed), d / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    for name in SWEEP:
        res = QUERIES[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.execute(ORACLE_SQL[name]).df()
        if len(got) == 0 and len(want) == 0:
            continue  # empty matches empty regardless of schema inference
        try:
            pd.testing.assert_frame_equal(
                _canon(got), _canon(want), check_dtype=False)
        except AssertionError as e:
            raise AssertionError(f"query {name!r} diverged from oracle") from e
