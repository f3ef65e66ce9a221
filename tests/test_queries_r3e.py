"""Round-3e operators (OHLC bars, hour-of-day profile, NTILE, mode,
GROUP BY ROLLUP) on an ADVERSARIAL fixture: same-timestamp ties inside a
bucket (open/close tie-break by cents), single-event buckets, out-of-order
file layout, NTILE remainder distribution AND fewer-rows-than-tiles, a mode
tie (smaller value must win), hour-of-day cells merged across days.
Engine vs the SAME DuckDB oracle SQL on the same parquet, plus a pure
associativity check on the OHLC partial+merge combiner."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import (
    _NTILE_T,
    ORACLE_SQL,
    QUERIES,
    _ohlc_merge_block,
    _ohlc_partial,
)

BASE_US = 1_767_225_600_000_000  # 2026-01-01, hour-aligned
MIN_US = 60_000_000
DAY_US = 86_400_000_000
BASE_MIN = BASE_US // MIN_US


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


@pytest.fixture(scope="module")
def r3e_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3e_events")
    rows = []  # (event_type, ts_us, value)

    # click, bucket 0: five events INCLUDING a same-timestamp tie at both
    # ends — open must be the SMALLER cents at the earliest ts, close the
    # LARGER cents at the latest ts. File order is deliberately shuffled
    # (close first) so any order-dependence in the combiner shows up.
    rows.append(("click", BASE_US + 50_000_000, 9.00))   # latest ts, tie hi
    rows.append(("click", BASE_US, 5.00))                # earliest ts, tie hi
    rows.append(("click", BASE_US, 3.00))                # earliest ts, tie lo -> open
    rows.append(("click", BASE_US + 50_000_000, 1.00))   # latest ts, tie lo
    rows.append(("click", BASE_US + 20_000_000, 99.0))   # high mid-bucket
    # click, bucket 1: single event — open == close == high == low
    rows.append(("click", BASE_US + MIN_US, 42.0))
    # click, bucket 2: open IS the high, close IS the low (descending bar)
    rows.append(("click", BASE_US + 2 * MIN_US, 80.0))
    rows.append(("click", BASE_US + 2 * MIN_US + 1_000_000, 10.0))

    # view — 7 days of daily volume for NTILE(4): 7 = 4*1+3, so tiles
    # {1,2,3} hold 2 days and tile 4 holds 1; days 3 and 4 TIE on volume
    # (earlier day gets the smaller tile slot). Also exercises seasonal_hod
    # merging the SAME hour-of-day across days (days x one bucket at hod 6).
    day_vals = [70.0, 60.0, 50.0, 50.0, 40.0, 30.0, 20.0]
    for day, v in enumerate(day_vals):
        rows.append(("view", BASE_US + day * DAY_US + 6 * 60 * MIN_US, v))

    # error — 2 days only (< 4 tiles): NTILE's q == 0 branch, tiles 1 and 2.
    # Values chosen to force a MODE TIE at the 1m grain for 'view' vs itself:
    # error buckets are 700 and 700 -> mode 700 with count 2.
    rows.append(("error", BASE_US, 7.00))
    rows.append(("error", BASE_US + DAY_US, 7.00))

    # signup — mode tie: two buckets at 100, two buckets at 200 -> the
    # SMALLER value (100) must win on both sides.
    rows.append(("signup", BASE_US + 0 * MIN_US, 1.00))
    rows.append(("signup", BASE_US + 1 * MIN_US, 1.00))
    rows.append(("signup", BASE_US + 2 * MIN_US, 2.00))
    rows.append(("signup", BASE_US + 3 * MIN_US, 2.00))

    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array(np.arange(len(rows)) % 5, type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["ohlc_1m", "seasonal_hod", "ntile_days", "mode_1m",
             "rollup_grouping"]
)
def test_r3e_adversarial_matches_oracle(ray_session, r3e_events_dir, name):
    eng = QUERIES[name](r3e_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, r3e_events_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_ohlc_tie_and_shape_semantics(ray_session, r3e_events_dir):
    out = QUERIES["ohlc_1m"](r3e_events_dir).to_pandas()
    clk = out[out["source"] == "click"].set_index(
        out[out["source"] == "click"]["bucket"] - BASE_MIN
    )
    b0 = clk.loc[0]
    assert (b0["open_cents"], b0["close_cents"]) == (300, 900)  # tie contract
    assert (b0["low_cents"], b0["high_cents"]) == (100, 9900)
    b1 = clk.loc[1]
    assert (
        b1["open_cents"] == b1["close_cents"] == b1["low_cents"]
        == b1["high_cents"] == 4200
    )
    b2 = clk.loc[2]
    assert b2["open_cents"] == b2["high_cents"] == 8000  # descending bar
    assert b2["close_cents"] == b2["low_cents"] == 1000


def test_ohlc_combiner_is_split_invariant(r3e_events_dir):
    """Partial+merge must give the SAME bars no matter how the input rows are
    batched: every 2-way split of the fixture (including empty sides) merges
    to the unsplit result — the associativity the streaming executor relies
    on when block boundaries move."""
    t = pq.read_table(f"{r3e_events_dir}/events.parquet")
    whole = _ohlc_merge_block(_ohlc_partial(t)).sort_by(
        [("source", "ascending"), ("bucket", "ascending")]
    )
    for cut in (0, 1, len(t) // 3, len(t) // 2, len(t) - 1, len(t)):
        parts = pa.concat_tables(
            [_ohlc_partial(t.slice(0, cut)), _ohlc_partial(t.slice(cut))]
        )
        merged = _ohlc_merge_block(parts).sort_by(
            [("source", "ascending"), ("bucket", "ascending")]
        )
        assert merged.equals(whole), f"split at {cut} changed the bars"


def test_ntile_distribution(ray_session, r3e_events_dir):
    out = QUERIES["ntile_days"](r3e_events_dir).to_pandas()
    view = out[out["source"] == "view"].sort_values(["tile", "day"])
    # 7 days into 4 tiles -> sizes [2, 2, 2, 1]
    assert view["tile"].value_counts().sort_index().tolist() == [2, 2, 2, 1]
    # tied days 2 and 3 (both 5000 cents): earlier day sorts first
    tied = view[view["day_cents"] == 5000].sort_values("day")
    assert list(tied["tile"]) == sorted(tied["tile"])
    err = out[out["source"] == "error"]
    assert sorted(err["tile"]) == [1, 2]  # fewer days than tiles
    assert _NTILE_T == 4  # oracle SQL is generated from this constant


def test_mode_tie_prefers_smaller_value(ray_session, r3e_events_dir):
    out = QUERIES["mode_1m"](r3e_events_dir).to_pandas().set_index("source")
    assert int(out.loc["signup", "mode_cents"]) == 100  # tie 100 vs 200
    assert int(out.loc["signup", "n_buckets"]) == 2


@pytest.fixture(scope="module")
def planner_events_dir(tmp_path_factory):
    """One source per planner branch: 'a' fits at 1m, 'b' overflows 1m but
    fits at 1h, 'c' overflows EVERY tier (1500 sparse days) and must be
    uniform-cut to the budget."""
    from tsrollup.pipelines.queries import _AR_BUDGET

    d = tmp_path_factory.mktemp("planner_events")
    rows = []
    for i in range(10):                        # 'a': 10 one-minute buckets
        rows.append(("a", BASE_US + i * MIN_US, float(i)))
    for i in range(_AR_BUDGET + 100):          # 'b': consecutive minutes
        rows.append(("b", BASE_US + i * MIN_US, 1.0))
    for i in range(_AR_BUDGET + 800):          # 'c': one bucket per day
        rows.append(("c", BASE_US + i * DAY_US, 2.0))
    t = pa.table(
        {"event_id": pa.array(np.arange(len(rows)), pa.int64()),
         "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
         "user_id": pa.array(np.zeros(len(rows)), pa.int64()),
         "event_type": pa.array([r[0] for r in rows]),
         "value": pa.array([r[2] for r in rows], pa.float64())}
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_auto_resolution_branches_and_oracle(ray_session, planner_events_dir):
    from tsrollup.pipelines.queries import _AR_BUDGET

    out = QUERIES["auto_resolution"](planner_events_dir).to_pandas()
    ora = _oracle("auto_resolution", planner_events_dir)
    pd.testing.assert_frame_equal(_canon(out), _canon(ora), check_dtype=False)
    tiers = out.groupby("source")["tier"].agg(["min", "max", "size"])
    assert (tiers["min"] == tiers["max"]).all()  # one tier per source
    assert tiers.loc["a", "min"] == "1m" and tiers.loc["a", "size"] == 10
    assert tiers.loc["b", "min"] == "1h"
    assert tiers.loc["c", "min"] == "1d"
    assert tiers.loc["c", "size"] == _AR_BUDGET  # overflow -> uniform cut
    assert (out.groupby("source").size() <= _AR_BUDGET).all()


def test_rollup_grouping_levels_are_consistent(ray_session, r3e_events_dir):
    out = QUERIES["rollup_grouping"](r3e_events_dir).to_pandas()
    lvl0 = out[out["lvl"] == 0]
    lvl1 = out[out["lvl"] == 1].set_index("src")["sum_cents"]
    lvl3 = out[out["lvl"] == 3]
    per_src = lvl0.groupby("src")["sum_cents"].sum()
    for src, s in per_src.items():
        assert lvl1[src] == s
    assert len(lvl3) == 1
    assert int(lvl3["sum_cents"].iloc[0]) == int(lvl0["sum_cents"].sum())
    assert lvl3["src"].iloc[0] == "" and int(lvl3["day"].iloc[0]) == -1
