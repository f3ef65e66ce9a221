"""Round-3h: the unigram-LM / entropy / TTR corpus-quality family and the
twa_1m / motif_1m timeseries pair, each on an adversarial fixture run
against the SAME DuckDB oracle SQL that ships with the query, plus
hand-computed semantic asserts (fixed-point values recomputed from first
principles with math.log/math.floor — the exactness contract itself)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.docqueries import (
    DOC_ORACLE_SQL,
    DOC_QUERIES,
    _FP_SCALE,
    _ln_fp,
)
from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _oracle(sql: str, view: str, path: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


# ---------------------------------------------------------------------------
# documents fixture: repeats, singletons, null/empty text, NUL bytes,
# Unicode whitespace (NBSP must split like the engine's tokenizer)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def r3h_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3h_docs")
    rows = [
        (0, "a a a a", "web"),            # TTR 1/4; heavy-token doc
        (1, "a b c d", "web"),            # TTR 1
        (2, "", "web"),                   # empty -> excluded everywhere
        (3, None, "web"),                 # null  -> excluded everywhere
        (4, "x\x00y x\x00z x\x00y", "web"),  # NUL tokens differ past the NUL
        (5, "a b  c", "wiki"),       # NBSP is whitespace to the engine
        (6, "q", "wiki"),                 # singleton token, ln(c)=0 branch
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_ttr_quality_matches_oracle(ray_session, r3h_docs_dir):
    got = DOC_QUERIES["ttr_quality"](r3h_docs_dir).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["ttr_quality"], "documents",
                   f"{r3h_docs_dir}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "ttr_ppm"] == 250_000          # 1 distinct / 4
    assert by_id.loc[1, "ttr_ppm"] == 1_000_000
    assert by_id.loc[4, "n_distinct"] == 2             # NUL tokens NOT collapsed
    assert by_id.loc[5, "n_tok"] == 3                  # NBSP split
    assert 2 not in by_id.index and 3 not in by_id.index


def test_token_entropy_matches_oracle(ray_session, r3h_docs_dir):
    got = DOC_QUERIES["token_entropy"](r3h_docs_dir).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["token_entropy"], "documents",
                   f"{r3h_docs_dir}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    # wiki from first principles: tokens a b c q -> 4 singletons,
    # H = ln 4 exactly; ent_fp = 4*F(4) - 4*1*F(1) = 4*F(4)
    wiki = got.set_index("source").loc["wiki"]
    assert int(wiki["n_tok"]) == 4 and int(wiki["n_distinct"]) == 4
    assert int(wiki["ent_fp"]) == 4 * _ln_fp(4)
    assert wiki["entropy"] == pytest.approx(math.log(4), abs=2e-6)


def test_unigram_logprob_matches_oracle(ray_session, r3h_docs_dir):
    got = DOC_QUERIES["unigram_logprob"](r3h_docs_dir).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["unigram_logprob"], "documents",
                   f"{r3h_docs_dir}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    # doc 1 = "a b c d" from first principles over the whole-corpus counts:
    # c(a)=6 (docs 0,1,5), c(b)=2, c(c)=2, c(d)=1; N=15 tokens, D=7 distinct
    by_id = got.set_index("doc_id")
    base = _ln_fp(15 + 7)
    exp = _ln_fp(7) + _ln_fp(3) + _ln_fp(3) + _ln_fp(2) - 4 * base
    assert int(by_id.loc[1, "logprob_fp"]) == exp
    # repeated-token doc scores HIGHER per token than the rare-token doc
    assert (by_id.loc[0, "logprob_fp"] / by_id.loc[0, "n_tok"]
            > by_id.loc[1, "logprob_fp"] / by_id.loc[1, "n_tok"])


def test_unigram_vocab_cutoff(ray_session, r3h_docs_dir):
    # vocab_size=1 keeps only the most frequent token ('a'); every other
    # token is out-of-vocab and contributes F(1) = 0
    got = DOC_QUERIES["unigram_logprob"](r3h_docs_dir, vocab_size=1).to_pandas()
    by_id = got.set_index("doc_id")
    base = _ln_fp(15 + 7)
    assert int(by_id.loc[1, "logprob_fp"]) == _ln_fp(7) - 4 * base
    assert int(by_id.loc[6, "logprob_fp"]) == -base


def test_ln_fp_matches_duckdb_ln():
    """The fixed-point contract's only cross-engine assumption: CPython
    math.log and DuckDB LN produce the same double for integer inputs.
    Probe the full small-count range plus large magnitudes."""
    import duckdb

    xs = list(range(1, 20_000)) + [10**6 + 7, 10**9 + 7, 10**12 + 7]
    con = duckdb.connect()
    df = con.execute(
        "SELECT x, CAST(FLOOR(LN(x) * 1000000000) AS BIGINT) AS fp "
        "FROM (SELECT UNNEST(?) AS x)", [xs]
    ).df()
    theirs = dict(zip(df["x"], df["fp"]))
    for x in xs:
        assert _ln_fp(x) == theirs[x], x


# ---------------------------------------------------------------------------
# events fixture for twa / motif: irregular gaps, a repeated motif planted
# twice, sources too short for any window
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def r3h_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3h_events")
    rows = []  # (source, minute, cents)

    def add(src, minute, cents):
        rows.append((src, minute, cents))

    # src "m": 40 minutes; the 8-long pattern at rows 1..8 repeats at 25..32
    pattern = [10, 50, 20, 70, 30, 90, 40, 60]
    series = list(range(100, 140))
    series[0:8] = pattern
    series[24:32] = pattern
    for i, v in enumerate(series):
        add("m", i, v)
    # src "gap": irregular spacing for the time-weighted average
    for minute, v in [(0, 10), (1, 20), (5, 30), (15, 40)]:
        add("gap", minute, v)
    # src "tiny": below every window/segment minimum
    add("tiny", 0, 5)

    ts = pa.array(
        [m * 60_000_000 for _, m, _ in rows], pa.timestamp("us")
    )
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows]),
            "value": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_twa_matches_oracle_and_hand_value(ray_session, r3h_events_dir):
    got = QUERIES["twa_1m"](r3h_events_dir).to_pandas()
    want = _oracle(ORACLE_SQL["twa_1m"], "events",
                   f"{r3h_events_dir}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    g = got.set_index("source").loc["gap"]
    # segments: 10*1 + 20*4 + 30*10 over span 15
    assert int(g["twa_num"]) == 10 * 1 + 20 * 4 + 30 * 10
    assert int(g["twa_den"]) == 15
    assert g["twa"] == round(390 / 15, 6)
    assert "tiny" not in got["source"].values  # single point: no segment


def test_dedup_containment_catches_quotes(ray_session, tmp_path):
    # doc 1 is a verbatim quote inside the much larger doc 0: containment 1.0
    # but Jaccard small, so only the containment operator pairs them
    quote = "alpha beta gamma delta epsilon zeta"
    big = quote + " " + " ".join(f"w{i}" for i in range(200))
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([big, quote, "unrelated text entirely"], pa.string()),
         "lang": pa.array(["en"] * 3), "source": pa.array(["web"] * 3),
         "n_chars": pa.array([len(big), len(quote), 23], pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = DOC_QUERIES["dedup_containment"](str(tmp_path)).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["dedup_containment"], "documents",
                   f"{tmp_path}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    assert len(got) == 1
    assert (int(got.iloc[0]["a"]), int(got.iloc[0]["b"])) == (0, 1)
    assert got.iloc[0]["containment"] == 1.0
    jac = DOC_QUERIES["dedup_ngram"](str(tmp_path)).to_pandas()
    assert len(jac) == 0  # Jaccard misses the asymmetric pair


def test_embed_dim_stats(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    vecs = rng.normal(0, 1, size=(40, 8)).astype(np.float32)
    vecs[3, 2] = np.float32(7.25)    # exact-representable planted extremes
    vecs[9, 2] = np.float32(-7.25)
    t = pa.table(
        {"vec_id": pa.array(range(40), pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               pa.list_(pa.float32())),
         "label": pa.array([0] * 40, pa.int32())}
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = DOC_QUERIES["embed_dim_stats"](str(tmp_path)).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["embed_dim_stats"], "embeddings",
                   f"{tmp_path}/embeddings.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    d3 = got.set_index("dim").loc[3]
    assert d3["dim_max"] == 7.25 and d3["dim_min"] == -7.25
    assert int(d3["n"]) == 40


def test_embed_pca_recovers_planted_direction(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    d = 16
    direction = np.zeros(d); direction[3] = 1.0
    coef = rng.normal(0, 10, size=(300, 1))          # dominant variance on dim 3
    noise = rng.normal(0, 0.1, size=(300, d))
    vecs = (coef * direction[None, :] + noise).astype(np.float32)
    t = pa.table(
        {"vec_id": pa.array(range(300), pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               pa.list_(pa.float32())),
         "label": pa.array([0] * 300, pa.int32())}
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = DOC_QUERIES["embed_pca"](str(tmp_path)).to_pandas()
    c0 = got[got["component"] == 0].sort_values("dim")
    vec = c0["loading"].to_numpy()
    assert abs(vec[3]) > 0.99                         # planted axis recovered
    ev = got.groupby("component")["explained_var"].first().to_numpy()
    assert (np.diff(ev) <= 1e-9).all()                # descending variance
    assert ev[0] > 50 and ev[1] < 1                   # ~10^2 vs noise 0.1^2
    # deterministic orientation: rerun produces identical loadings
    again = DOC_QUERIES["embed_pca"](str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(again))


def test_bpe_pairs_ascii_alignment(ray_session, tmp_path):
    # 'xéyz' exercises the UTF-8 alignment contract: its only ASCII pair is
    # 'yz' — every pair touching é's two bytes must drop on BOTH sides
    rows = [(0, "abab ab"), (1, "xéyz"), (2, None)]
    t = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string()),
         "lang": pa.array(["en"] * 3), "source": pa.array(["web"] * 3),
         "n_chars": pa.array([len(r[1]) if r[1] else 0 for r in rows], pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = DOC_QUERIES["bpe_pairs"](str(tmp_path)).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["bpe_pairs"], "documents",
                   f"{tmp_path}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("pair")["n"]
    assert by.loc["ab"] == 3 and by.loc["ba"] == 1   # 'abab'+'ab'
    assert by.loc["yz"] == 1
    assert not any("é" in p for p in got["pair"])


def test_zipf_fit_matches_oracle(ray_session, r3h_docs_dir):
    got = DOC_QUERIES["zipf_fit"](r3h_docs_dir).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["zipf_fit"], "documents",
                   f"{r3h_docs_dir}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by_src = got.set_index("source")
    # web: a=5, x\0y=2, four singletons -> decaying counts, negative slope
    assert int(by_src.loc["web", "n_ranks"]) == 6
    assert by_src.loc["web", "zipf_slope"] < 0
    # wiki: four singletons -> y = F(1) = 0 everywhere -> slope exactly 0
    assert by_src.loc["wiki", "zipf_slope"] == 0.0


def test_compression_ratio_semantics(ray_session, tmp_path):
    rep = "spam " * 400                     # highly compressible
    nat = " ".join(f"w{i}x{i * 7 % 13}" for i in range(400))  # varied
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([rep, nat, None], pa.string()),
         "lang": pa.array(["en"] * 3), "source": pa.array(["web"] * 3),
         "n_chars": pa.array([len(rep), len(nat), 0], pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = DOC_QUERIES["compression_ratio"](str(tmp_path)).to_pandas()
    again = DOC_QUERIES["compression_ratio"](str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(again))  # deterministic
    by_id = got.set_index("doc_id")
    assert int(by_id.loc[0, "n_bytes"]) == len(rep.encode())
    assert by_id.loc[0, "ratio_ppm"] < by_id.loc[1, "ratio_ppm"] / 5
    assert int(by_id.loc[2, "n_bytes"]) == 0  # null -> '' -> denominator guard


def test_coverage_1h_matches_oracle(ray_session, r3h_events_dir):
    got = QUERIES["coverage_1h"](r3h_events_dir).to_pandas()
    want = _oracle(ORACLE_SQL["coverage_1h"], "events",
                   f"{r3h_events_dir}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index(["source", "hour"])
    assert int(by.loc[("m", 0), "n_minutes"]) == 40
    assert int(by.loc[("m", 0), "coverage_ppm"]) == 40 * 1_000_000 // 60
    assert int(by.loc[("gap", 0), "n_minutes"]) == 4


def test_wau_7d_chain_boundaries(ray_session, tmp_path):
    # user 1: days 0 and 6 (gap 6 -> ONE chain, covers 0..12)
    # user 2: days 0 and 7 (gap 7 -> TWO chains, covers 0..6 and 7..13)
    # user 3: day 20 only (isolated; also the only activity on day 20)
    rows = [(1, 0), (1, 6), (2, 0), (2, 7), (3, 20)]
    t = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([d * 86_400_000_000 for _, d in rows], pa.timestamp("us")),
         "user_id": pa.array([u for u, _ in rows], pa.int64()),
         "event_type": pa.array(["s"] * len(rows)),
         "value": pa.array([1.0] * len(rows), pa.float64()),
         "props": pa.array(["{}"] * len(rows))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["wau_7d"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["wau_7d"], "events", f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by_day = got.set_index("day")["wau"]
    assert by_day.loc[0] == 2          # users 1 and 2 active day 0
    assert by_day.loc[6] == 2          # u1 (day 6 or chain), u2 (day 0 in window)
    assert by_day.loc[7] == 2          # u1 chain covers 7..12, u2 second chain
    assert by_day.loc[20] == 1         # only user 3; u1 coverage ended day 12
    assert set(got["day"]) == {0, 6, 7, 20}  # only days with actual activity


def test_bigram_entropy_matches_oracle(ray_session, r3h_docs_dir):
    got = DOC_QUERIES["bigram_entropy"](r3h_docs_dir).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["bigram_entropy"], "documents",
                   f"{r3h_docs_dir}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("source")
    # web doc 0 "a a a a": bigram (a,a)x3; doc 1 adds (a,b),(b,c),(c,d);
    # doc 4 adds (x0y,x0z),(x0z,x0y). 'a'-continuations: aa=3, ab=1 -> cu=4
    assert int(by.loc["web", "n_bigrams"]) == 8
    # wiki doc 5 "a b c" + doc 6 "q": 2 bigrams, all prefixes unique ->
    # every continuation is deterministic EXCEPT none repeat: cu==c -> H = 0
    assert int(by.loc["wiki", "ent_fp"]) == 0
    assert by.loc["wiki", "cond_entropy"] == 0.0


def test_token_drift_semantics(ray_session, tmp_path):
    # craft doc_ids whose _SPLIT_K hash lands in each half; identical token
    # distributions in both halves -> drift 0 for 'same', disjoint -> 1e6/2*2
    from tsrollup.pipelines.docqueries import _SPLIT_K, _SPLIT_MOD

    a_ids = [i for i in range(100) if (i * _SPLIT_K) % _SPLIT_MOD < _SPLIT_MOD // 2]
    b_ids = [i for i in range(100) if (i * _SPLIT_K) % _SPLIT_MOD >= _SPLIT_MOD // 2]
    rows = [(a_ids[0], "x y", "same"), (b_ids[0], "x y", "same"),
            (a_ids[1], "p p", "disj"), (b_ids[1], "q q", "disj"),
            (a_ids[2], "only half a", "onehalf")]
    t = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string()),
         "lang": pa.array(["en"] * len(rows)),
         "source": pa.array([r[2] for r in rows]),
         "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = DOC_QUERIES["token_drift"](str(tmp_path)).to_pandas()
    want = _oracle(DOC_ORACLE_SQL["token_drift"], "documents",
                   f"{tmp_path}/documents.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("source")["drift_ppm"]
    assert by.loc["same"] == 0           # identical halves
    assert by.loc["disj"] == 1_000_000   # fully disjoint vocabularies
    assert "onehalf" not in by.index     # missing half excluded


def test_props_extract_matches_oracle(ray_session, tmp_path):
    props = ['{"k": 7}', '{"k": 7}', '{"k": -3}', '{"j": 1}', None, 'garbage']
    t = pa.table(
        {"event_id": pa.array(range(6), pa.int64()),
         "ts": pa.array([i * 60_000_000 for i in range(6)], pa.timestamp("us")),
         "user_id": pa.array([1] * 6, pa.int64()),
         "event_type": pa.array(["s"] * 6),
         "value": pa.array([1.0] * 6, pa.float64()),
         "props": pa.array(props, pa.string())}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["props_extract"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["props_extract"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("k")["n"]
    assert by.loc[7] == 2 and by.loc[-3] == 1
    assert len(got) == 2                 # no-match / null rows dropped


def test_window_funnel_strict_order(ray_session, tmp_path):
    MIN = 60_000_000
    # u1 completes all 3 in order within a day; u2 clicks BEFORE its view
    # (strict order -> level 1); u3 clicks after view but purchase precedes
    # the click (level 2); u4 views only; u5 has no view at all (excluded);
    # u6 clicks after the 1-day window (level 1)
    rows = [
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        (2, "click", 0), (2, "view", 10), (2, "purchase", 20),
        (3, "view", 0), (3, "purchase", 5), (3, "click", 10),
        (4, "view", 0),
        (5, "purchase", 0),
        (6, "view", 0), (6, "click", 60 * 25),
    ]
    t = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([m * MIN for _, _, m in rows], pa.timestamp("us")),
         "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
         "event_type": pa.array([e for _, e, _ in rows]),
         "value": pa.array([1.0] * len(rows), pa.float64()),
         "props": pa.array(["{}"] * len(rows))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["window_funnel"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["window_funnel"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("level")["n_users"]
    assert by.loc[1] == 3   # u2 (click precedes view), u4, u6 (late click)
    assert by.loc[2] == 1   # u3: purchase before click doesn't count
    assert by.loc[3] == 1   # u1
    assert by.sum() == 5    # u5 never viewed -> excluded entirely


def test_audience_overlap_and_log2_histogram(ray_session, tmp_path):
    MIN = 60_000_000
    # sources a/b share users {1,2}; c is disjoint; values hit exact
    # power-of-two cents boundaries (255/256/257 -> buckets 7/8/8)
    rows = [("a", 1, 2.55), ("a", 2, 2.56), ("a", 3, 2.57),
            ("b", 1, 0.01), ("b", 2, 0.01),
            ("c", 9, 0.00)]
    t = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([i * MIN for i in range(len(rows))], pa.timestamp("us")),
         "user_id": pa.array([u for _, u, _ in rows], pa.int64()),
         "event_type": pa.array([s for s, _, _ in rows]),
         "value": pa.array([v for _, _, v in rows], pa.float64()),
         "props": pa.array(["{}"] * len(rows))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    ov = QUERIES["audience_overlap"](str(tmp_path))
    ov = ov.to_pandas() if hasattr(ov, "to_pandas") else ov
    want = _oracle(ORACLE_SQL["audience_overlap"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(ov), _canon(want), check_dtype=False)
    ab = ov.set_index(["src_a", "src_b"]).loc[("a", "b")]
    assert int(ab["n_inter"]) == 2 and int(ab["n_a"]) == 3 and int(ab["n_b"]) == 2
    assert int(ab["jacc_ppm"]) == 2 * 1_000_000 // 3
    assert ("a", "c") not in ov.set_index(["src_a", "src_b"]).index

    h = QUERIES["log2_histogram"](str(tmp_path)).to_pandas()
    want_h = _oracle(ORACLE_SQL["log2_histogram"], "events",
                     f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(h), _canon(want_h), check_dtype=False)
    a = h[h["source"] == "a"].set_index("log2_bucket")["n"]
    assert a.loc[7] == 1 and a.loc[8] == 2     # 255 | 256, 257 (exact edge)
    c = h[h["source"] == "c"].set_index("log2_bucket")["n"]
    assert c.loc[-1] == 1                      # zero cents -> bucket -1


def test_hod_anomaly_flags_planted_spike(ray_session, tmp_path):
    # source "s": 12 days, one event per hour-0 with cents 100 ... except
    # day 9's hour 0 carries 100x the volume -> the only 3-sigma breach
    # (a single outlier among n equal values has z = sqrt(n-1), so n must
    # exceed 10: at exactly 10 the strict > 3-sigma test is a tie and both
    # sides correctly flag nothing)
    rows = []
    for day in range(12):
        v = 100_00 if day == 9 else 100
        rows.append((day * 1440, v))          # minute bucket of hour 0
        rows.append((day * 1440 + 60, 100))   # hour 1 stays flat (no flag)
    t = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([m * 60_000_000 for m, _ in rows], pa.timestamp("us")),
         "user_id": pa.array([1] * len(rows), pa.int64()),
         "event_type": pa.array(["s"] * len(rows)),
         "value": pa.array([c / 100.0 for _, c in rows], pa.float64()),
         "props": pa.array(["{}"] * len(rows))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["hod_anomaly"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["hod_anomaly"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    assert len(got) == 1
    assert int(got.iloc[0]["bucket_h"]) == 9 * 24   # day 9, hour 0
    assert got.iloc[0]["z"] > 2.9


def test_ipc_roundtrip_equals_rollup(ray_session, r3h_events_dir):
    rolled = QUERIES["rollup_1m"](r3h_events_dir).to_pandas()
    trip = QUERIES["ipc_roundtrip"](r3h_events_dir).to_pandas()
    pd.testing.assert_frame_equal(_canon(rolled), _canon(trip))


def test_attribution_last_touch(ray_session, tmp_path):
    MIN = 60_000_000
    # u1: view -> click -> purchase (credit: click, the LATEST prior touch)
    # u2: purchase with no prior touch -> organic; a LATER view must not count
    # u3: view -> purchase -> purchase (both purchases credit the same view)
    rows = [
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        (2, "purchase", 0), (2, "view", 5),
        (3, "view", 0), (3, "purchase", 1), (3, "purchase", 2),
    ]
    t = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([m * MIN for _, _, m in rows], pa.timestamp("us")),
         "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
         "event_type": pa.array([e for _, e, _ in rows]),
         "value": pa.array([1.0] * len(rows), pa.float64()),
         "props": pa.array(["{}"] * len(rows))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["attribution_last_touch"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["attribution_last_touch"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    by = got.set_index("touch")["n_conv"]
    assert by.loc["click"] == 1 and by.loc["organic"] == 1 and by.loc["view"] == 2


def test_retention_curve_matches_oracle(ray_session, r3h_events_dir):
    got = QUERIES["retention_curve"](r3h_events_dir).to_pandas()
    want = _oracle(ORACLE_SQL["retention_curve"], "events",
                   f"{r3h_events_dir}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    # the single user's first day is day 0 and it IS active on day 0
    d0 = got.set_index("day_offset").loc[0]
    assert int(d0["n_retained"]) >= 1 and int(d0["rate_ppm"]) == 1_000_000


def test_pagerank_types_matches_oracle(ray_session, tmp_path):
    # user 1 walks a->b->c->b->c (b<->c cycle absorbs rank; 'a' only leaks)
    # user 2 walks a->b; type 'd' appears with no transitions (dangling node)
    walks = [(1, ["a", "b", "c", "b", "c"]), (2, ["a", "b"]), (3, ["d"])]
    uid, et, ts = [], [], []
    for u, walk in walks:
        for i, e in enumerate(walk):
            uid.append(u); et.append(e); ts.append((u * 100 + i) * 60_000_000)
    t = pa.table(
        {"event_id": pa.array(range(len(uid)), pa.int64()),
         "ts": pa.array(ts, pa.timestamp("us")),
         "user_id": pa.array(uid, pa.int64()),
         "event_type": pa.array(et),
         "value": pa.array([1.0] * len(uid), pa.float64()),
         "props": pa.array(["{}"] * len(uid))}
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = QUERIES["pagerank_types"](str(tmp_path)).to_pandas()
    want = _oracle(ORACLE_SQL["pagerank_types"], "events",
                   f"{tmp_path}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    pr = got.set_index("source")["pr_fp"]
    assert set(pr.index) == {"a", "b", "c", "d"}   # dangling node present
    assert pr["b"] > pr["a"] and pr["c"] > pr["a"]  # the cycle holds the rank
    assert pr["d"] == pr["a"]  # both receive only the teleport term


def test_motif_finds_planted_repeat(ray_session, r3h_events_dir):
    got = QUERIES["motif_1m"](r3h_events_dir).to_pandas()
    want = _oracle(ORACLE_SQL["motif_1m"], "events",
                   f"{r3h_events_dir}/events.parquet")
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
    m = got.set_index("source").loc["m"]
    # planted copies start at 0-based rows 0 and 24 -> strided starts hit
    # both (stride 4), distance exactly 0
    assert int(m["d2"]) == 0
    assert int(m["rn_a"]) == 1 and int(m["rn_b"]) == 25
    assert "tiny" not in got["source"].values
    assert "gap" not in got["source"].values  # 4 points < 2*w
