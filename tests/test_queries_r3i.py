"""Round-3i analytics family — drawdown / streaks / Bollinger / calendar
month rollup / Benford — on an adversarial fixture run against the SAME
DuckDB oracle SQL that ships with each query, plus hand-computed semantic
asserts (breach algebra, drawdown tie-break, month boundaries incl. a leap
day) recomputed from first principles."""

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
def r3i_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3i_events")
    rows = []  # (event_type, ts_us, value)

    # mono — strictly rising sums: max_dd == 0 (tie at EVERY bucket ->
    # earliest wins), longest_up == n, Bollinger linear ramp z≈1.65 < 2
    # -> zero breaches despite 21 full windows
    for i in range(40):
        rows.append(("mono", BASE_US + i * MIN_US, 1.0 + i))

    # vee — 10,5,10,5 cents: TWO equal max drawdowns (5 at buckets 1 and
    # 3) -> tie-break must pick the earlier bucket; alternating runs keep
    # every streak at exactly 2
    for i, v in enumerate([0.10, 0.05, 0.10, 0.05]):
        rows.append(("vee", BASE_US + i * MIN_US, v))

    # flat — all-equal windows: a = v = 0, strict '>' means NO breach;
    # longest_flat == n, up == down == 1
    for i in range(25):
        rows.append(("flat", BASE_US + i * MIN_US, 2.0))

    # spikehi / spikelo — exactly one full window each; single outlier
    # among 19 equal values has |z| = sqrt(19) > 2 -> one breach
    for i in range(19):
        rows.append(("spikehi", BASE_US + i * MIN_US, 1.0))
    rows.append(("spikehi", BASE_US + 19 * MIN_US, 5.0))
    for i in range(19):
        rows.append(("spikelo", BASE_US + i * MIN_US, 1.0))
    rows.append(("spikelo", BASE_US + 19 * MIN_US, -3.0))

    # solo — single rolled row: streaks all 1, dd 0, EXCLUDED from
    # bollinger output (n < W) on both sides; negative cents (-127)
    # exercises Benford's ABS path
    rows.append(("solo", BASE_US, -1.27))

    # cal — month/year boundaries incl. leap day: 2023-12-31 23:59,
    # 2024-01-01 00:00, 2024-02-29 12:00, 2024-03-01 00:00
    CAL = [
        (1_704_067_140_000_000, 3.0),   # 2023-12-31 23:59
        (1_704_067_200_000_000, 4.0),   # 2024-01-01 00:00
        (1_709_208_000_000_000, 5.0),   # 2024-02-29 12:00
        (1_709_251_200_000_000, 6.0),   # 2024-03-01 00:00
    ]
    for ts, v in CAL:
        rows.append(("cal", ts, v))

    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array(np.arange(len(rows)) % 7, type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["max_drawdown", "streaks", "bollinger_breach", "rollup_month", "benford"],
)
def test_r3i_adversarial_matches_oracle(ray_session, r3i_events_dir, name):
    eng = QUERIES[name](r3i_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, r3i_events_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_drawdown_tie_earliest_bucket(ray_session, r3i_events_dir):
    out = QUERIES["max_drawdown"](r3i_events_dir).to_pandas()
    out = out.set_index("source")
    base_min = BASE_US // MIN_US
    assert out.loc["mono", "max_dd"] == 0
    assert out.loc["mono", "dd_bucket"] == base_min  # all-tie -> first
    assert out.loc["vee", "max_dd"] == 5
    assert out.loc["vee", "dd_bucket"] == base_min + 1  # ties at +1/+3

def test_streaks_semantics(ray_session, r3i_events_dir):
    out = QUERIES["streaks"](r3i_events_dir).to_pandas().set_index("source")
    assert tuple(out.loc["mono", ["longest_up", "longest_down", "longest_flat"]]) == (40, 1, 1)
    assert tuple(out.loc["flat", ["longest_up", "longest_down", "longest_flat"]]) == (1, 1, 25)
    assert tuple(out.loc["vee", ["longest_up", "longest_down", "longest_flat"]]) == (2, 2, 1)
    assert tuple(out.loc["solo", ["longest_up", "longest_down", "longest_flat"]]) == (1, 1, 1)


def test_bollinger_breach_algebra(ray_session, r3i_events_dir):
    out = QUERIES["bollinger_breach"](r3i_events_dir).to_pandas().set_index("source")
    # hand-check spikehi: a = 20*500 - 2400 = 7600, v = 20*440000 - 2400^2
    # = 3040000; 7600^2 = 57760000 > 4v = 12160000 -> one hi breach
    assert tuple(out.loc["spikehi", ["n_win", "n_hi", "n_lo"]]) == (1, 1, 0)
    assert tuple(out.loc["spikelo", ["n_win", "n_hi", "n_lo"]]) == (1, 0, 1)
    assert tuple(out.loc["flat", ["n_win", "n_hi", "n_lo"]]) == (6, 0, 0)
    assert out.loc["mono", "n_hi"] == 0 and out.loc["mono", "n_lo"] == 0
    assert "solo" not in out.index and "vee" not in out.index  # n < W


def test_rollup_month_boundaries(ray_session, r3i_events_dir):
    out = QUERIES["rollup_month"](r3i_events_dir).to_pandas()
    cal = out[out["source"] == "cal"].set_index("month")
    assert list(cal.index) == ["2023-12", "2024-01", "2024-02", "2024-03"]
    assert cal.loc["2023-12", "sum_cents"] == 300
    assert cal.loc["2024-02", "sum_cents"] == 500  # leap day lands in Feb
    mono = out[out["source"] == "mono"]
    assert len(mono) == 1 and mono["n_rows"].iloc[0] == 40


def test_learn_bpe_merges_matches_published_example():
    """Sennrich et al. 2016's worked example, merges hand-computed: with
    vocab {low:5, lower:2, newest:6, widest:3} the pair counts start at
    (e,s)=9 (t,</w>)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 ... — the freq-then-
    lexicographic tie-break gives es, est, est</w>, lo, low."""
    from tsrollup.pipelines.docqueries import learn_bpe_merges

    merges = learn_bpe_merges(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 5
    )
    assert merges == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_learn_bpe_stops_below_pair_freq_two():
    from tsrollup.pipelines.docqueries import learn_bpe_merges

    # every pair unique -> freq 1 everywhere -> zero merges
    assert learn_bpe_merges({"abc": 1, "xyz": 1}, 10) == []
    # empty-string words are ignored, not crashed on
    assert learn_bpe_merges({"": 7}, 3) == []


@pytest.fixture(scope="module")
def r3i_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3i_docs")
    # word counts across docs/sources total the published BPE example
    texts = [
        ("low low low newest newest newest", "web"),
        ("low low newest newest newest", "web"),
        ("lower lower widest widest widest", "wiki"),
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


def test_learn_bpe_query_end_to_end(ray_session, r3i_docs_dir):
    from tsrollup.pipelines.docqueries import DOC_QUERIES

    out = DOC_QUERIES["learn_bpe"](r3i_docs_dir, n_merges=5)
    assert list(out.columns) == ["rank", "left", "right", "freq"]
    got = list(zip(out["left"], out["right"], out["freq"]))
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_benford_excludes_zero_uses_abs(ray_session, r3i_events_dir):
    out = QUERIES["benford"](r3i_events_dir).to_pandas()
    spike = out[out["source"] == "spikehi"].set_index("digit")
    assert spike.loc[1, "n"] == 19 and spike.loc[1, "pct"] == 0.95
    assert spike.loc[5, "n"] == 1 and spike.loc[5, "pct"] == 0.05
    solo = out[out["source"] == "solo"].set_index("digit")
    assert list(solo.index) == [1] and solo.loc[1, "n"] == 1  # |-127| -> 1
