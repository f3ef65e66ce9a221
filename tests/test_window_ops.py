"""Round-3 windowed/sequential operators on an ADVERSARIAL fixture: negative
values (floor-division semantics), counter resets, constant runs (zero
variance), conversion edges exactly at the funnel window. The driver gate
runs these queries on the synth testdata; this fixture exercises the edges
the synth corpus never hits, comparing the engine against the SAME DuckDB
oracle SQL on the same parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES


@pytest.fixture(scope="module")
def adversarial_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_events")
    rng = np.random.default_rng(31)
    rows = []
    base_us = 1_767_225_600_000_000  # 2026-01-01 in us
    # srcA: sawtooth counter with resets + a constant run (zero variance)
    v = 0.0
    for i in range(400):
        v = 0.0 if i % 97 == 0 else v + float(rng.integers(1, 50))
        rows.append(("srcA", base_us + i * 60_000_000, v, int(rng.integers(0, 6))))
    for i in range(400, 460):  # constant run -> rolling variance 0
        rows.append(("srcA", base_us + i * 60_000_000, 7.0, 1))
    # srcB: NEGATIVE values (floor division / floor binning edges); both
    # sources get a VARYING number of events per bucket so per-bucket counts
    # have variance (corr_pairs is defined on counts)
    for i in range(300):
        for _ in range(int(rng.integers(1, 5))):
            rows.append(
                ("srcB", base_us + i * 60_000_000, float(rng.normal(0, 12.345)), int(rng.integers(0, 6)))
            )
        if i % 3 == 0:  # srcA extra event in every third bucket
            rows.append(("srcA", base_us + i * 60_000_000, 1.25, 2))
    # funnel edges: users with purchase exactly at, just inside, just outside 1h
    h = 3_600_000_000  # 1h in us
    ev = []
    for uid, dt_us, expect in [(100, h, 1), (101, h - 1, 1), (102, h + 1_000, 0), (103, -1, 0)]:
        ev.append((uid, "signup", base_us))
        if dt_us >= 0:
            ev.append((uid, "purchase", base_us + dt_us))
    ev.append((104, "purchase", base_us))  # purchase only -> not in funnel

    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows) + len(ev)), type=pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows] + [e[2] for e in ev], type=pa.timestamp("us")
            ),
            "user_id": pa.array(
                [r[3] for r in rows] + [e[0] for e in ev], type=pa.int64()
            ),
            "event_type": pa.array([r[0] for r in rows] + [e[1] for e in ev]),
            "value": pa.array([r[2] for r in rows] + [0.5] * len(ev), type=pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    ["anomaly_zscore", "increase_1h", "corr_pairs", "ewma_1m", "funnel_1h",
     "value_histogram", "moving_avg", "delta_1m",
     # round-3 analytics family: negative values hit cusum's exact big-int
     # fallback (total < 0), floor-division edges hit m4/trend/holt, the
     # constant run hits rolling_median/winsorize ties, and the two-source
     # overlap exercises every ccf lag
     "downsample_m4", "cusum", "trend_ols", "rolling_median", "winsorize_1m",
     "seasonal_detrend", "ccf_pairs", "peak_detect", "holt_1m"],
)
def test_adversarial_fixture_matches_oracle(ray_session, adversarial_events_dir, name):
    eng = QUERIES[name](adversarial_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, adversarial_events_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_funnel_window_edges(ray_session, adversarial_events_dir):
    out = QUERIES["funnel_1h"](adversarial_events_dir).to_pandas()
    conv = dict(zip(out["user_id"], out["converted"]))
    assert conv[100] == 1  # exactly at the 1h boundary (<= semantics)
    assert conv[101] == 1  # just inside
    assert conv[102] == 0  # just outside
    assert conv[103] == 0  # signup, no purchase
    assert 104 not in conv  # purchase only -> not in the signup cohort


def test_anomaly_zscore_huge_values_no_overflow(ray_session, tmp_path):
    """Cents near 2^31 would overflow an int64 sum-of-squares prefix over a
    long series without the shift-invariant centering; the oracle's HUGEINT
    raw-value sums are exact, so equality here proves the centering is an
    exact identity, not an approximation."""
    rng = np.random.default_rng(7)
    base_us = 1_767_225_600_000_000
    n = 5_000
    # value*100 ~ 2.1e9 cents, +-1e6 noise; sum over 5k squares of the RAW
    # value would be ~2e22 >> int64
    vals = (2.1e9 + rng.integers(-1_000_000, 1_000_000, n) * 1.0) / 100.0
    vals[1_000] *= 1.002  # a genuine outlier
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(base_us + np.arange(n) * 60_000_000, type=pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n), type=pa.int64()),
            "event_type": pa.array(["big"] * n),
            "value": pa.array(vals, type=pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    eng = QUERIES["anomaly_zscore"](str(tmp_path)).to_pandas()
    ora = _oracle("anomaly_zscore", str(tmp_path))
    assert len(eng), "outlier should be flagged"
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)
