"""Round-3k family — generic column profiler (`profile_events`) — engine
vs its own DuckDB oracle on an adversarial fixture the synth corpus can't
produce: Arrow nulls in every column, NaN/±inf doubles (values, not
nulls), negative floats across the FLOOR boundary, NUL-embedded and
duplicate strings, millisecond-colliding timestamps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES


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
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def profile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_profile")
    # Build arrays directly (NOT via pandas) so NaN/inf stay VALUES, not
    # nulls — from_pandas would silently convert NaN -> null and the
    # n_nonfinite branch would never fire.
    event_id = pa.array([5, None, 3, 3, -7, 11, 2, 2], pa.int64())
    base = 1_705_276_800_000_000
    ts = pa.array(
        [base, base + 250, base + 999, None, base + 1_000,
         base + 60_000_000, base + 999, base],  # 250us/999us collide in ms
        pa.timestamp("us"),
    )
    user_id = pa.array([1, 1, None, 2, 2, 3, -4, 1], pa.int64())
    event_type = pa.array(
        ["click", "a\x00b", "a\x00c", None, "click", "view", "a\x00b", "zz"],
        pa.string(),
    )
    value = pa.array(
        np.array([0.03, -0.03, float("nan"), float("inf"),
                  -float("inf"), 327.53, -0.0, 0.029], np.float64),
        pa.float64(),
    )
    # one Arrow null in value too (null AND nan must be told apart)
    value = pa.concat_arrays([value.slice(0, 7), pa.array([None], pa.float64())])
    props = pa.array(["{}", None, "{}", "{\x00}", "p", "p", None, "q"], pa.string())
    pq.write_table(
        pa.table(
            {"event_id": event_id, "ts": ts, "user_id": user_id,
             "event_type": event_type, "value": value, "props": props}
        ),
        d / "events.parquet",
    )
    return str(d)


def test_profile_events_matches_oracle_adversarial(ray_session, profile_dir):
    eng = _canon(pd.DataFrame(QUERIES["profile_events"](profile_dir)))
    ora = _canon(_oracle("profile_events", profile_dir))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)

    # spot-check the semantics by hand
    row = eng.set_index("col")
    assert row.loc["value", "n_null"] == 1          # the Arrow null only
    assert row.loc["value", "n_nonfinite"] == 3     # nan, +inf, -inf
    # finite values: .03 -.03 327.53 -0.0 .029 -> cents 2,-3,32752,0,2
    # (+-0.03*100 = +-2.9999999999999996 in binary, so floor is 2 / -3)
    assert row.loc["value", "n_distinct"] == 4
    assert row.loc["value", "min_v"] == "-3"
    assert row.loc["value", "max_v"] == "32752"
    # ms canonicalization collapses the 250us/999us/0us trio onto one ms
    assert row.loc["ts", "n_distinct"] == 3
    assert row.loc["event_type", "n_distinct"] == 5  # a\\0b vs a\\0c distinct
    assert row.loc["event_id", "min_v"] == "-7"


def test_profile_events_all_null_column(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_allnull")
    n = 4
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(n), pa.int64()),
             "ts": pa.array([1_705_276_800_000_000 + i for i in range(n)],
                            pa.timestamp("us")),
             "user_id": pa.array([None] * n, pa.int64()),
             "event_type": pa.array([None] * n, pa.string()),
             "value": pa.array([float("nan")] * n, pa.float64()),
             "props": pa.array(["x"] * n, pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _canon(pd.DataFrame(QUERIES["profile_events"](str(d))))
    ora = _canon(_oracle("profile_events", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    row = eng.set_index("col")
    assert row.loc["user_id", "n_distinct"] == 0
    assert row.loc["user_id", "min_v"] == ""
    assert row.loc["value", "n_nonfinite"] == n
    assert row.loc["value", "n_distinct"] == 0
