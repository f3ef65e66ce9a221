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


# ---------------------------------------------------------------- r3k set 2
BASE_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC
HOUR_US = 3_600_000_000


def _write_events(d, rows):
    """rows: (event_type, ts_us, user_id) -> full events schema parquet."""
    et = [r[0] for r in rows]
    ts = [r[1] for r in rows]
    uid = [r[2] for r in rows]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array(ts, pa.timestamp("us")),
             "user_id": pa.array(uid, pa.int64()),
             "event_type": pa.array(et, pa.string()),
             "value": pa.array([1.0] * len(rows), pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    return str(d)


def _oracle_at(name: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


def _run(name: str, sf_dir: str) -> pd.DataFrame:
    out = QUERIES[name](sf_dir)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return _canon(out)


@pytest.fixture(scope="module")
def sliding_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_slide")
    H = HOUR_US
    rows = []
    # src 'a': user 1 at hours 0 and 23 (gap == W-1 -> ONE fused run),
    # user 2 at hour 0 and hour 48 (gap 48 > 23 -> two runs, the window
    # drains to user-1-only then to ZERO between h=47 and h=47... the
    # dense range must emit those zeros)
    rows += [("a", BASE_US + 0 * H, 1), ("a", BASE_US + 23 * H, 1)]
    rows += [("a", BASE_US + 0 * H, 2), ("a", BASE_US + 48 * H, 2)]
    # src 'b': single event -> 1 output row per covered hour clipped to
    # [lo, hi] = [5, 5]
    rows += [("b", BASE_US + 5 * H, 7)]
    # null user ignored everywhere
    rows += [("a", BASE_US + 1 * H, None)]
    # duplicate (source, user, hour) must not double count
    rows += [("a", BASE_US + 0 * H + 17, 1)]
    return _write_events(d, rows)


def test_sliding_distinct_matches_oracle(ray_session, sliding_dir):
    eng = _run("sliding_distinct_24h", sliding_dir)
    ora = _canon(_oracle_at("sliding_distinct_24h", sliding_dir))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    bh = BASE_US // HOUR_US  # bucket hours are absolute epoch hours
    a = eng[eng["source"] == "a"].set_index("bucket_h")["n_users_24h"]
    assert a.loc[bh + 0] == 2     # both users active at h=0
    assert a.loc[bh + 23] == 2    # user1 re-event at 23, user2's h=0 still in
    assert a.loc[bh + 24] == 1    # user2's h=0 fell out; user1's h=23 covers
    assert a.loc[bh + 46] == 1    # user1's h=23 covers through 23+23=46
    assert a.loc[bh + 47] == 0    # drained-to-zero hour IS emitted
    assert a.loc[bh + 48] == 1    # user2 returns
    assert a.index.min() == bh and a.index.max() == bh + 48
    b = eng[eng["source"] == "b"]
    assert len(b) == 1 and b.iloc[0]["n_users_24h"] == 1


@pytest.fixture(scope="module")
def pairs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_pairs")
    W = 300_000_000
    rows = []
    # user 1: x at t0; y at exactly t0+W (INCLUSIVE bound -> counts);
    # z at t0+W+1 (exclusive -> not from x, but y->z counts, dt=1)
    rows += [("x", BASE_US, 1), ("y", BASE_US + W, 1), ("z", BASE_US + W + 1, 1)]
    # user 2: two SIMULTANEOUS events -> dt=0 pairs excluded both ways
    rows += [("x", BASE_US, 2), ("y", BASE_US, 2)]
    # user 2: self-type chain x..x within W -> (x,x) pair
    rows += [("x", BASE_US + 10, 2)]
    # user 3 in another partition shouldn't pair with user 1
    rows += [("y", BASE_US + 1, 3)]
    # null user ignored
    rows += [("x", BASE_US, None), ("x", BASE_US + 1, None)]
    return _write_events(d, rows)


def test_event_pairs_matches_oracle(ray_session, pairs_dir):
    eng = _run("event_pairs_5m", pairs_dir)
    ora = _canon(_oracle_at("event_pairs_5m", pairs_dir))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    got = {(r.type_a, r.type_b): r.n_pairs for r in eng.itertuples()}
    # u1: x@t0 -> y@t0+W is the boundary-INCLUSIVE pair; u2's x/y at the
    # same instant is dt=0 and excluded both ways
    assert got[("x", "y")] == 1
    assert got[("y", "z")] == 1        # u1: dt = 1us
    assert ("x", "z") not in got       # dt = W+1 is past the bound
    assert got[("x", "x")] == 1        # u2: x@t0 -> x@t0+10us, same type
    assert got.get(("y", "x"), 0) == 1  # u2: y@t0 -> x@t0+10us


def test_pmi_type_hod_matches_oracle(ray_session, pairs_dir):
    eng = _run("pmi_type_hod", pairs_dir)
    ora = _canon(_oracle_at("pmi_type_hod", pairs_dir))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


MIN_US = 60_000_000


def test_global_rank_ties_match_oracle(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_rank")
    rows = []
    # minute sums: a -> [5, 5, 7, 5] cents, b -> [7] cents: value 5 ranks
    # 1 (x3, tied), value 7 ranks 4 (x2, tied); N=5 so pct = (r-1)/4
    for i, cents in enumerate([5, 5, 7, 5]):
        rows.append(("a", BASE_US + i * MIN_US + 1, cents / 100 + 1e-9, 1))
    rows.append(("b", BASE_US, 0.07 + 1e-9, 2))
    et = [r[0] for r in rows]
    ts = [r[1] for r in rows]
    val = [r[2] for r in rows]
    uid = [r[3] for r in rows]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array(ts, pa.timestamp("us")),
             "user_id": pa.array(uid, pa.int64()),
             "event_type": pa.array(et, pa.string()),
             "value": pa.array(val, pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("global_rank_1m", str(d))
    ora = _canon(_oracle_at("global_rank_1m", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert sorted(eng["rnk"]) == [1, 1, 1, 4, 4]     # RANK tie semantics
    assert set(eng[eng["rnk"] == 4]["sum_cents"]) == {7}
    assert abs(eng[eng["rnk"] == 1]["pct_rank"].iloc[0] - 0.0) < 1e-12
    assert abs(eng[eng["rnk"] == 4]["pct_rank"].iloc[0] - 0.75) < 1e-12


def test_global_rank_single_row(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_rank1")
    pq.write_table(
        pa.table(
            {"event_id": pa.array([0], pa.int64()),
             "ts": pa.array([BASE_US], pa.timestamp("us")),
             "user_id": pa.array([1], pa.int64()),
             "event_type": pa.array(["a"], pa.string()),
             "value": pa.array([1.0], pa.float64()),
             "props": pa.array(["{}"], pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("global_rank_1m", str(d))
    ora = _canon(_oracle_at("global_rank_1m", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert eng.iloc[0]["rnk"] == 1 and eng.iloc[0]["pct_rank"] == 0.0


def _oracle_docs(name: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


def test_dup_span_fraction_hand_computed(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_dupspan")
    texts = [
        # doc0/doc1 share the trigram "p q r"; doc0 repeats it twice, so
        # both its POSITIONS count as duplicated (occurrence weighting)
        "p q r s p q r",   # grams: pqr qrs rsp spq pqr -> 2/5 dup
        "z p q r z",       # grams: zpq pqr qrz -> 1/3 dup
        # doc2 repeats a trigram only WITHIN itself -> nd=1, not dup
        "m n o m n o m n",  # grams incl mno twice, all intra-doc only
        # short docs (< k tokens): whole-string shingles; doc3/doc4 match
        "hi there",
        "hi   there",       # whitespace-run collapse -> same shingle
        "lonely",           # unique short shingle -> 0 dup
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
         "text": pa.array(texts),
         "lang": pa.array(["en"] * len(texts)),
         "source": pa.array(["s1"] * len(texts)),
         "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(d / "documents.parquet"))

    eng = _run("dup_span_fraction", str(d))
    ora = _canon(_oracle_docs("dup_span_fraction", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    r = eng.set_index("doc_id")
    assert (r.loc[0, "n_grams"], r.loc[0, "n_dup"]) == (5, 2)
    assert (r.loc[1, "n_grams"], r.loc[1, "n_dup"]) == (3, 1)
    assert r.loc[2, "n_dup"] == 0          # intra-doc repetition only
    assert r.loc[3, "n_dup"] == 1 and r.loc[4, "n_dup"] == 1
    assert r.loc[5, "n_dup"] == 0
    assert abs(r.loc[0, "dup_frac"] - 0.4) < 1e-12


def test_scd2_intervals_hand_computed(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_scd2")
    MS = 1000
    rows = [
        # user 1: a a b a -> compressed to a[t0,t2) b[t2,t3) a[t3,open)
        ("a", BASE_US + 0 * MS, 1), ("a", BASE_US + 1 * MS, 1),
        ("b", BASE_US + 2 * MS, 1), ("a", BASE_US + 3 * MS, 1),
        # user 2: same-ms tie broken by event_id: b (id later) wins as the
        # 2nd change -> a[t, t) zero-length then b[t, open)
        ("a", BASE_US, 2), ("b", BASE_US, 2),
        # null user dropped
        ("c", BASE_US, None),
    ]
    _write_events(d, rows)
    # NOTE: _canon's .round(6) is lossy above 2^53/1e6 — epoch-ms values
    # corrupt identically on both sides (so the frame compare is still
    # meaningful), but the hand asserts below use the RAW engine output
    eng_raw = QUERIES["scd2_user_state"](str(d)).to_pandas()
    eng = _canon(eng_raw)
    ora = _canon(_oracle_at("scd2_user_state", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    u1 = eng_raw[eng_raw["user_id"] == 1].sort_values("valid_from_ms")
    assert list(u1["state"]) == ["a", "b", "a"]
    assert np.isnan(u1["valid_to_ms"].iloc[-1])     # live interval open
    base_ms = BASE_US // 1000
    assert u1["valid_to_ms"].iloc[0] == base_ms + 2  # a closed by b @t2
    u2 = eng_raw[eng_raw["user_id"] == 2].sort_values(["valid_from_ms", "state"])
    assert list(u2["state"]) == ["a", "b"]
    assert u2["valid_to_ms"].iloc[0] == base_ms      # zero-length interval


def test_event_trigrams_hand_computed(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_tri")
    MS = 1000
    rows = [
        # user 1 path: a b a b -> trigrams (a,b,a), (b,a,b)
        ("a", BASE_US + 0 * MS, 1), ("b", BASE_US + 1 * MS, 1),
        ("a", BASE_US + 2 * MS, 1), ("b", BASE_US + 3 * MS, 1),
        # user 2: only two events -> no trigram
        ("a", BASE_US, 2), ("b", BASE_US + MS, 2),
        # user 3: same-us tie -> event_id order decides (a then c then b)
        ("a", BASE_US, 3), ("c", BASE_US, 3), ("b", BASE_US, 3),
    ]
    _write_events(d, rows)
    eng = _run("event_trigrams", str(d))
    ora = _canon(_oracle_at("event_trigrams", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    got = {(r.s1, r.s2, r.s3): r.n for r in eng.itertuples()}
    assert got == {("a", "b", "a"): 1, ("b", "a", "b"): 1,
                   ("a", "c", "b"): 1}


def test_top3_minutes_ties_to_earlier_bucket(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3k_top3")
    # one source, five minutes with cents [5, 9, 9, 1, 9]: top3 by
    # (cents DESC, bucket ASC) = buckets m1, m2, m4 (three-way 9 tie
    # -> two earliest win ranks 1-2, third 9 takes rank 3; the 5 loses)
    rows = []
    for i, c in enumerate([5, 9, 9, 1, 9]):
        rows.append(("a", BASE_US + i * MIN_US, c / 100 + 1e-9, 1))
    et = [r[0] for r in rows]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array(et, pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("top3_minutes_daily", str(d))
    ora = _canon(_oracle_at("top3_minutes_daily", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert len(eng) == 3
    by_rn = eng.sort_values("rn")
    m = BASE_US // 60_000_000
    assert list(by_rn["bucket"]) == [m + 1, m + 2, m + 4]
    assert list(by_rn["sum_cents"]) == [9, 9, 9]


def test_rolling_corr_perfect_and_anti(ray_session, tmp_path_factory):
    """25 joined hours for pair (a,b): y = 2x -> corr exactly 1 in every
    full window; pair (a,c): c = -x + const -> corr -1. One source pair
    hour is MISSING mid-series for b (gap) — the ROWS window slides over
    joined observations, so the first post-gap window still spans 24
    JOINED rows, not 24 calendar hours."""
    d = tmp_path_factory.mktemp("r3k_rcorr")
    rows = []
    skip_b = 10  # b has no events in hour 10 -> joined series has a gap
    for i in range(26):
        x = 10 + (i * 7) % 13  # non-constant pattern
        rows.append(("a", BASE_US + i * HOUR_US, x / 100 + 1e-9, 1))
        if i != skip_b:
            rows.append(("b", BASE_US + i * HOUR_US, 2 * x / 100 + 1e-9, 1))
        rows.append(("c", BASE_US + i * HOUR_US, (60 - x) / 100 + 1e-9, 1))
    et = [r[0] for r in rows]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array(et, pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("rolling_corr_24h", str(d))
    ora = _canon(_oracle_at("rolling_corr_24h", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    ab = eng[(eng["source_a"] == "a") & (eng["source_b"] == "b")]
    ac = eng[(eng["source_a"] == "a") & (eng["source_b"] == "c")]
    assert len(ab) == 2       # 25 joined rows (one gap) -> 2 full windows
    assert len(ac) == 3       # 26 joined rows -> 3 full windows
    assert (ab["corr"] == 1.0).all()
    assert (ac["corr"] == -1.0).all()


def test_changepoint_step_series(ray_session, tmp_path_factory):
    """A clean level shift: 10 minutes at 5 cents then 10 at 50 — the max
    |n·S_t − t·S_n| statistic must land exactly on the last low minute."""
    d = tmp_path_factory.mktemp("r3k_cp")
    rows = []
    for i in range(20):
        c = 5 if i < 10 else 50
        rows.append(("a", BASE_US + i * MIN_US, c / 100 + 1e-9, 1))
    # a constant series: every split scores 0 -> earliest-bucket tie
    for i in range(5):
        rows.append(("flat", BASE_US + i * MIN_US, 0.07 + 1e-9, 1))
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array([r[0] for r in rows], pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("changepoint_1m", str(d))
    ora = _canon(_oracle_at("changepoint_1m", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    m0 = BASE_US // 60_000_000
    r = eng.set_index("source")
    assert r.loc["a", "cp_bucket"] == m0 + 9   # last minute before the shift
    # n=20, best split t=10 (S_10=50, S_n=550): |20*50 - 10*550| = 4500
    assert r.loc["a", "score"] == 4500
    assert r.loc["flat", "cp_bucket"] == m0    # all-zero scores tie earliest
    assert r.loc["flat", "score"] == 0


def test_psi_drift_hand_computed(ray_session, tmp_path_factory):
    """Minutes 0..3 early (mid at 2 of range 0..3 -> split at 2): bins
    from cents {64,64 | 64,128}: bin1 a=2,b=1; bin2 a=0,b=1 (excluded,
    one-sided). Totals over shared bins only: na=2, nb=1."""
    d = tmp_path_factory.mktemp("r3k_psi")
    cents = [64, 64, 64, 128]
    rows = [("a", BASE_US + i * MIN_US, c / 100 + 1e-9, 1)
            for i, c in enumerate(cents)]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array([r[0] for r in rows], pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("psi_drift", str(d))
    ora = _canon(_oracle_at("psi_drift", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert len(eng) == 1                       # one shared bin only
    row = eng.iloc[0]
    assert (row["bin"], row["n_early"], row["n_late"]) == (1, 2, 1)
    import math
    expect = (2 / 2 - 1 / 1) * math.log((2 * 1) / (1 * 2))  # 0.0
    assert abs(row["psi_term"] - expect) < 1e-12


def test_emd_sources_one_bin_shift(ray_session, tmp_path_factory):
    """b is exactly a shifted one bin right -> EMD = 1.0 (full mass moves
    one bin); c splits 50/50 between a's bin and b's bin -> EMD 0.5 to
    either. emd_scaled is the exact integer na*nb*EMD."""
    d = tmp_path_factory.mktemp("r3k_emd")
    rows = []
    for i, c in enumerate([64, 64]):          # a: bin 1, bin 1
        rows.append(("a", BASE_US + i * MIN_US, c / 100 + 1e-9, 1))
    for i, c in enumerate([128, 128]):        # b: bin 2, bin 2
        rows.append(("b", BASE_US + i * MIN_US, c / 100 + 1e-9, 1))
    for i, c in enumerate([64, 128]):         # c: bin 1, bin 2
        rows.append(("c", BASE_US + i * MIN_US, c / 100 + 1e-9, 1))
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(len(rows)), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array([r[0] for r in rows], pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * len(rows), pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("emd_sources", str(d))
    ora = _canon(_oracle_at("emd_sources", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    got = {(r.source_a, r.source_b): (r.emd_scaled, r.emd)
           for r in eng.itertuples()}
    assert got[("a", "b")] == (4, 1.0)
    assert got[("a", "c")] == (2, 0.5)
    assert got[("b", "c")] == (2, 0.5)


def test_doc_keywords_hand_computed(ray_session, tmp_path_factory):
    """4 docs; 'rare' appears only in doc0 (df=1, idf=ln 4) and beats
    'shared' (df=4, idf=0). Zero-score ubiquitous tokens tie on token
    byte order. NUL-embedded tokens exercise the no-hash-table df path."""
    d = tmp_path_factory.mktemp("r3k_kw")
    texts = [
        "rare rare shared z\x00a z\x00b",
        "shared z\x00a mid",
        "shared mid",
        "shared",
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
         "text": pa.array(texts),
         "lang": pa.array(["en"] * len(texts)),
         "source": pa.array(["s1"] * len(texts)),
         "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(d / "documents.parquet"))
    eng = _run("doc_keywords", str(d))
    ora = _canon(_oracle_docs("doc_keywords", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    import math
    d0 = eng[eng["doc_id"] == 0].sort_values("rn")
    # scores: rare 2·ln4 = 2.77; z\0b 1·ln4 = 1.39 (df=1); z\0a 1·ln2
    # = 0.69 (df=2, in docs 0 and 1); shared 0 (df=4) drops out of top-3
    assert list(d0["token"]) == ["rare", "z\x00b", "z\x00a"]
    assert d0.iloc[0]["tf"] == 2 and d0.iloc[0]["df"] == 1
    assert abs(d0.iloc[0]["score"] - round(2 * math.log(4), 6)) < 1e-9
    d3 = eng[eng["doc_id"] == 3]
    assert len(d3) == 1 and d3.iloc[0]["score"] == 0.0


def test_mase_perfectly_seasonal(ray_session, tmp_path_factory):
    """A series that repeats exactly every 1440 minutes: seasonal-naive
    error is 0 -> MASE exactly 0.0; the one-step error is nonzero."""
    d = tmp_path_factory.mktemp("r3k_mase")
    n = 2 * 1440 + 1
    rows = [("a", BASE_US + i * MIN_US, ((i % 1440) % 7 + 1) / 100 + 1e-9, 1)
            for i in range(n)]
    pq.write_table(
        pa.table(
            {"event_id": pa.array(range(n), pa.int64()),
             "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
             "user_id": pa.array([r[3] for r in rows], pa.int64()),
             "event_type": pa.array([r[0] for r in rows], pa.string()),
             "value": pa.array([r[2] for r in rows], pa.float64()),
             "props": pa.array(["{}"] * n, pa.string())}
        ),
        d / "events.parquet",
    )
    eng = _run("mase_naive", str(d))
    ora = _canon(_oracle_at("mase_naive", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert len(eng) == 1
    assert eng.iloc[0]["sae_seasonal"] == 0 and eng.iloc[0]["mase"] == 0.0
    assert eng.iloc[0]["n_seasonal"] == n - 1440
    assert eng.iloc[0]["sae_naive"] > 0


def test_k_anonymity_flags_small_combos(ray_session, tmp_path_factory):
    """combo (a, dow, hod=0): 5 users -> safe; hod=1: 2 users over 6 rows
    -> flagged with the ROW count preserved."""
    d = tmp_path_factory.mktemp("r3k_kanon")
    rows = []
    for u in range(5):                       # hod 0: 5 distinct users
        rows.append(("a", BASE_US, 100 + u))
    for i in range(6):                       # hod 1: 6 rows, 2 users
        rows.append(("a", BASE_US + HOUR_US + i, 200 + (i % 2)))
    _write_events(d, rows)
    eng = _run("k_anonymity", str(d))
    ora = _canon(_oracle_at("k_anonymity", str(d)))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert len(eng) == 1
    v = eng.iloc[0]
    assert (v["hod"], v["n_users"], v["n_rows"]) == (1, 2, 6)
