"""Time-series join / windowed-aggregate operators (asof_join, range_join,
moving_avg) cross-checked against DuckDB on the sf0.001 events table —
the same comparison the driver's correctness gate runs."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="testdata missing"
)


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _run(name: str):
    from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle(ORACLE_SQL[name])
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    return got


def test_asof_join_matches_duckdb(ray_session):
    got = _run("asof_join")
    assert len(got) > 0
    # marks are every 7th rolled bucket; joined mark_bucket must satisfy that
    assert (got["mark_bucket"] % 7 == 0).all()


def test_range_join_matches_duckdb(ray_session):
    got = _run("range_join")
    assert len(got) > 0
    # overlapping intervals: total matched events exceed the raw event count
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    assert got["n_events"].sum() > n_events


def test_moving_avg_matches_duckdb(ray_session):
    got = _run("moving_avg")
    # window caps at 10 rows and the first row of each source has win_n == 1
    assert got["win_n"].max() == 10
    assert (got.sort_values(["source", "bucket"]).groupby("source")["win_n"].first() == 1).all()


def test_asof_join_drops_sources_without_marks(ray_session, tmp_path):
    """A source whose rolled series has no mark buckets (none divisible by 7)
    must contribute NO rows — ASOF inner semantics — instead of erroring or
    mismatching; verified against DuckDB on a crafted events table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    # srcA has buckets 7000000..7000010 (7000000 % 7 == 0 -> has marks);
    # srcB only bucket 7000001..7000003 (none % 7 == 0 -> no marks)
    ts_a = [(7_000_000 + i) * 60_000_000 for i in range(11)]
    ts_b = [(7_000_001 + i) * 60_000_000 for i in range(3)]
    t = pa.table(
        {
            "ts": pa.array(ts_a + ts_b, pa.timestamp("us")),
            "event_type": ["srcA"] * 11 + ["srcB"] * 3,
            "value": [float(i) for i in range(14)],
            "user_id": list(range(14)),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    got = QUERIES["asof_join"](str(d)).to_pandas()
    assert set(got["source"]) == {"srcA"}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.sql(ORACLE_SQL["asof_join"]).df()
    assert len(got) == len(want)
    assert int(got["n_events"].sum()) == int(want["n_events"].sum()) == 11


def test_exchange_join_variants_match_broadcast(ray_session):
    """The keyed-exchange as-of/range joins (unbounded-mark-cardinality path)
    must produce the IDENTICAL result set as their broadcast siblings — same
    semantics, different physical plan (round-2 VERDICT 'What's missing' #2)."""
    from tsrollup.pipelines.queries import QUERIES

    for bc, ex, keys in [
        ("asof_join", "asof_join_exchange", ["source", "mark_bucket"]),
        ("range_join", "range_join_exchange", ["source", "lo"]),
    ]:
        a = QUERIES[bc](SF_DIR).to_pandas()
        b = QUERIES[ex](SF_DIR).to_pandas()
        pd.testing.assert_frame_equal(_canon(a), _canon(b))
        assert len(b) > 0


@pytest.mark.parametrize("qname", ["q_asof_join", "q_range_join"])
def test_join_auto_routes_above_broadcast_threshold(ray_session, qname):
    """broadcast_threshold=0 forces the plan selector onto the keyed-exchange
    path; the result must be identical to the default broadcast plan."""
    import tsrollup.pipelines.queries as qmod

    fn = getattr(qmod, qname)
    bc = fn(SF_DIR).to_pandas()
    ex = fn(SF_DIR, broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(_canon(bc), _canon(ex))
    assert len(ex) > 0
