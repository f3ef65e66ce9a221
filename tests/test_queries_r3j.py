"""Round-3j family — ISO-week rollup / Gini concentration / Cutler RSI /
Bloom-prefiltered semi-join / token Pareto coverage — on adversarial
fixtures run against the SAME DuckDB oracle SQL each query ships with,
plus hand-computed semantic asserts (ISO year-boundary weeks, closed-form
Gini values, RSI window algebra, bloom-vs-plain plan equality)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

BASE_US = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC
MIN_US = 60_000_000


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
def r3j_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3j_events")
    rows = []  # (event_type, ts_us, value, user_id)

    # isoc — ISO week/year boundary minefield: Jan 1 belonging to the
    # PREVIOUS iso-year's W53, Dec 30 belonging to the NEXT iso-year's W01
    ISO_CAL = [
        1_609_459_200_000_000,  # 2021-01-01 -> 2020-W53
        1_609_372_800_000_000,  # 2020-12-31 -> 2020-W53
        1_735_516_800_000_000,  # 2024-12-30 -> 2025-W01
        1_451_779_200_000_000,  # 2016-01-03 (Sun) -> 2015-W53
        1_451_865_600_000_000,  # 2016-01-04 (Mon) -> 2016-W01
    ]
    for i, ts in enumerate(ISO_CAL):
        rows.append(("isoc", ts, 1.0 + i, 0))

    # ginieq — equal minute sums -> Gini exactly 0
    for i in range(5):
        rows.append(("ginieq", BASE_US + i * MIN_US, 3.0, 1))
    # ginimax — one loaded minute among zeros -> Gini (n-1)/n = 0.75
    for i, v in enumerate([0.0, 0.0, 0.0, 10.0]):
        rows.append(("ginimax", BASE_US + i * MIN_US, v, 2))

    # rsiup / rsidown / rsiflat — 16 rolled minutes = exactly 2 full
    # 14-delta windows; monotone direction pins every window's verdict
    for i in range(16):
        rows.append(("rsiup", BASE_US + i * MIN_US, 1.0 + i, 3))
        rows.append(("rsidown", BASE_US + i * MIN_US, 100.0 - i, 4))
        rows.append(("rsiflat", BASE_US + i * MIN_US, 7.0, 5))

    # per60 — exactly periodic spikes every 60 minutes: every harmonic
    # lag (60, 120, 240) has r = 1.0, so the argmax MUST tie-break to
    # the smallest lag. per1440 — sparse (20-minute grid) daily spikes:
    # only lag 1440 aligns spike-with-spike (r = 1), shorter lags align
    # spikes with baseline (r < 1)
    for i in range(300):
        rows.append(("per60", BASE_US + i * MIN_US,
                     5.0 if i % 60 == 0 else 1.0, 6))
    for i in range(0, 2881, 20):
        rows.append(("per1440", BASE_US + i * MIN_US,
                     9.0 if i % 1440 == 0 else 1.0, 6))

    # purchase traffic for the semi-join family: user 100 has 15
    # purchases (heavy), 101 has 14 (heavy, boundary), 102 has 13 (not)
    for u, n in ((100, 15), (101, 14), (102, 13)):
        for i in range(n):
            rows.append(("purchase", BASE_US + i * MIN_US, 1.0, u))
        rows.append(("view", BASE_US, 1.0, u))  # non-purchase traffic

    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[3] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["rollup_week", "gini_sources", "rsi_cutler",
                                  "semi_join_bloom", "dominant_period",
                                  "macd_1m", "interarrival_stats",
                                  "distinct_users_1h", "fano_factor"])
def test_r3j_adversarial_matches_oracle(ray_session, r3j_events_dir, name):
    eng = QUERIES[name](r3j_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, r3j_events_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_iso_week_boundaries(ray_session, r3j_events_dir):
    out = QUERIES["rollup_week"](r3j_events_dir).to_pandas()
    isoc = out[out["source"] == "isoc"].set_index("week")
    # 2020-12-31 + 2021-01-01 share 2020-W53; 2024-12-30 is 2025-W01;
    # 2016-01-03 (Sun) is still 2015-W53 while Monday 01-04 starts 2016-W01
    assert isoc.loc["2020-W53", "n_rows"] == 2
    assert isoc.loc["2025-W01", "n_rows"] == 1
    assert isoc.loc["2015-W53", "n_rows"] == 1
    assert isoc.loc["2016-W01", "n_rows"] == 1
    assert len(isoc) == 4


def test_iso_week_matches_duckdb_exhaustively():
    import duckdb

    from tsrollup.pipelines.queries import _iso_week

    days = np.arange(-1000, 40000)  # 1967..2079 incl. pre-epoch
    iy, wk = _iso_week(days)
    ref = duckdb.sql(
        """
        SELECT CAST(date_part('isoyear', d) AS BIGINT) AS iy,
               CAST(date_part('week', d) AS BIGINT) AS wk
        FROM (SELECT DATE '1970-01-01' + INTERVAL (i) DAY AS d
              FROM range(-1000, 40000) t(i)) ORDER BY d
        """
    ).fetchnumpy()
    np.testing.assert_array_equal(iy, ref["iy"].astype(np.int64))
    np.testing.assert_array_equal(wk, ref["wk"].astype(np.int64))


def test_gini_closed_forms(ray_session, r3j_events_dir):
    out = QUERIES["gini_sources"](r3j_events_dir).to_pandas().set_index("source")
    assert out.loc["ginieq", "gini"] == 0.0        # perfectly even
    assert out.loc["ginimax", "gini"] == 0.75      # all mass in 1 of 4
    assert out.loc["ginieq", "n_buckets"] == 5


def test_rsi_window_algebra(ray_session, r3j_events_dir):
    out = QUERIES["rsi_cutler"](r3j_events_dir).to_pandas().set_index("source")
    # 16 rows -> 15 deltas -> 2 full 14-delta windows
    assert tuple(out.loc["rsiup", ["n_win", "n_over", "n_under"]]) == (2, 2, 0)
    assert tuple(out.loc["rsidown", ["n_win", "n_over", "n_under"]]) == (2, 0, 2)
    # flat: g = l = 0 -> strict comparisons both false
    assert tuple(out.loc["rsiflat", ["n_win", "n_over", "n_under"]]) == (2, 0, 0)
    # isoc has 5 rolled rows < W+1 -> excluded entirely
    assert "isoc" not in out.index


def test_dominant_period_planted_and_harmonic_tie(ray_session, r3j_events_dir):
    out = QUERIES["dominant_period"](r3j_events_dir).to_pandas().set_index("source")
    # exact 60-minute periodicity: r = 1.0 at 60/120/240 -> smallest lag wins
    assert out.loc["per60", "lag"] == 60 and out.loc["per60", "r"] == 1.0
    # sparse daily spikes: only 1440 aligns spike-with-spike
    assert out.loc["per1440", "lag"] == 1440 and out.loc["per1440", "r"] == 1.0
    # isoc's midnight rows align only at the daily lag (12-31->01-01 and
    # 01-03->01-04), n = 2 pairs exactly
    assert out.loc["isoc", "lag"] == 1440 and out.loc["isoc", "n_pairs"] == 2


def test_macd_constant_series_is_identically_zero(ray_session, r3j_events_dir):
    out = QUERIES["macd_1m"](r3j_events_dir).to_pandas()
    flat = out[out["source"] == "rsiflat"]
    # both EWMAs seed at x0, so a constant series keeps f == s == x0 and
    # macd == sig == hist == 0 at every row
    assert len(flat) == 16
    assert (flat[["macd", "sig", "hist"]].to_numpy() == 0).all()
    up = out[out["source"] == "rsiup"].sort_values("bucket")
    # strictly rising series: fast EWMA leads slow -> macd >= 0, crossing 0
    # only at the seed row
    assert (up["macd"].to_numpy()[1:] >= 0).all()
    assert (up["hist"] == up["macd"] - up["sig"]).all()


def test_bloom_plan_equals_plain_semi_join(ray_session, r3j_events_dir):
    plain = _canon(QUERIES["semi_join_users"](r3j_events_dir).to_pandas())
    bloom = _canon(QUERIES["semi_join_bloom"](r3j_events_dir).to_pandas())
    pd.testing.assert_frame_equal(plain, bloom, check_dtype=False)
    # the boundary user (exactly 14 purchases) is heavy; 13 is not:
    # purchase rows kept = 15 + 14, distinct heavy users = 2
    p = plain.set_index("source")
    assert tuple(p.loc["purchase", ["n_events", "n_users"]]) == (29, 2)
    assert tuple(p.loc["view", ["n_events", "n_users"]]) == (2, 2)


def test_interarrival_and_fano_hand_computed(ray_session, r3j_events_dir):
    ia = QUERIES["interarrival_stats"](r3j_events_dir).to_pandas().set_index("source")
    # purchases are minute-spaced per user: 14+13+12 = 39 deltas, all 60 s;
    # each user's single 'view' event produces no delta at all
    assert tuple(ia.loc["purchase", ["n_deltas", "p50_s", "p90_s"]]) == (39, 60, 60)
    assert "view" not in ia.index
    ff = QUERIES["fano_factor"](r3j_events_dir).to_pandas().set_index("source")
    # rsiflat: one event per minute -> counts all 1 -> zero dispersion
    assert ff.loc["rsiflat", "fano"] == 0.0
    assert ff.loc["rsiflat", "n_buckets"] == 16


def test_distinct_users_1h_counts(ray_session, r3j_events_dir):
    out = QUERIES["distinct_users_1h"](r3j_events_dir).to_pandas()
    pur = out[out["source"] == "purchase"]
    # all purchase events land in BASE hour; users 100/101/102 each present
    assert len(pur) == 1 and pur["n_users"].iloc[0] == 3


@pytest.fixture(scope="module")
def r3j_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3j_docs")
    texts = [
        # s1: counts a:4 b:2 c:1 d:1 (tot 8) -> cum 4,6,7,8; 5*cum>=32
        # first at rank 3 (7*5=35) -> k_cover 3 of 4 types
        ("a a a a b b", "s1"),
        ("c d", "s1"),
        # s2: all-tie counts x:1 y:1 z:1 -> k_cover 3 (5*2=10 < 12 <= 15)
        ("x y z", "s2"),
        # s3: single token -> k_cover 1
        ("only", "s3"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array([x[0] for x in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array([x[1] for x in texts]),
            "n_chars": pa.array([len(x[0]) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_token_pareto_hand_computed(ray_session, r3j_docs_dir):
    from tsrollup.pipelines.docqueries import DOC_QUERIES

    out = DOC_QUERIES["token_pareto"](r3j_docs_dir).to_pandas().set_index("source")
    assert tuple(out.loc["s1", ["n_types", "k_cover"]]) == (4, 3)
    assert tuple(out.loc["s2", ["n_types", "k_cover"]]) == (3, 3)
    assert tuple(out.loc["s3", ["n_types", "k_cover"]]) == (1, 1)


@pytest.mark.parametrize("name", ["token_pareto", "lexicon_score",
                                  "corpus_grep"])
def test_r3j_docs_match_oracle(ray_session, r3j_docs_dir, name):
    import duckdb

    from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL, DOC_QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{r3j_docs_dir}/documents.parquet')"
    )
    ora = con.execute(DOC_ORACLE_SQL[name]).df()
    eng = DOC_QUERIES[name](r3j_docs_dir).to_pandas()
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_lexicon_and_grep_hand_computed(ray_session, r3j_docs_dir):
    from tsrollup.pipelines.docqueries import DOC_QUERIES

    # r3j docs contain none of the risk lexicon or grep pattern words ->
    # zero hits everywhere but full doc counts (the all-clean baseline)
    lex = DOC_QUERIES["lexicon_score"](r3j_docs_dir).to_pandas()
    assert int(lex["n_hits"].sum()) == 0 and int(lex["n_flagged"].sum()) == 0
    assert int(lex["n_docs"].sum()) == 4
    grep = DOC_QUERIES["corpus_grep"](r3j_docs_dir).to_pandas()
    assert int(grep["n_matches"].sum()) == 0
    # a pattern that DOES hit: 'a a a a b b' has four standalone a's
    hit = DOC_QUERIES["corpus_grep"](r3j_docs_dir, pattern=r"\ba\b").to_pandas()
    s1 = hit[hit["source"] == "s1"].iloc[0]
    assert (s1["n_matched"], s1["n_matches"]) == (1, 4)


def test_embed_doc_join_matches_oracle_with_dangles(ray_session, tmp_path_factory):
    """embeddings x documents exchange join: dangling vec_ids and empty
    vectors drop (inner-join + len>0 guard), float32 d0 min/max widen
    exactly, NUL-bearing source names survive the per-partition fold."""
    import duckdb
    import pyarrow.parquet as pq

    from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL, DOC_QUERIES

    d = tmp_path_factory.mktemp("edj")
    texts = ["aa", "bbb", "c", "dd dd"]
    srcs = ["s1", "s\x00x", "s1", "s\x00x"]
    pq.write_table(pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
         "text": pa.array(texts), "lang": pa.array(["en"] * 4),
         "source": pa.array(srcs),
         "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(d / "documents.parquet"))
    pq.write_table(pa.table(
        {"vec_id": pa.array([0, 1, 3, 9], pa.int64()),  # 9 dangles
         "embedding": pa.array(
             [[0.25, 1.0], [-0.5, 2.0], [], [7.0, 7.0]],  # 3 is empty
             pa.list_(pa.float32())),
         "label": pa.array([0, 1, 0, 1], pa.int32())}),
        str(d / "embeddings.parquet"))
    eng = DOC_QUERIES["embed_doc_join"](str(d)).to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    ora = con.execute(DOC_ORACLE_SQL["embed_doc_join"]).df()
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)
    e = eng.set_index("source")
    assert tuple(e.loc["s1", ["n_vecs", "sum_chars"]]) == (1, 2)
    assert e.loc["s1", "min_d0"] == 0.25
    assert tuple(e.loc["s\x00x", ["n_vecs", "sum_chars"]]) == (1, 3)
