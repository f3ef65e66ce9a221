"""Round-3c operators (pivot / rank / MAD outlier / SAX; normalize / redact /
bigrams / split) on ADVERSARIAL fixtures: negative values, zero-variance and
zero-MAD groups, PAA exactly at a SAX breakpoint, emails whose local part is a
long digit run (redaction order), bigrams across document boundaries, empty
and single-token documents, Unicode whitespace. Engine vs the SAME DuckDB
oracle SQL on the same parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES


def _oracle(name: str, sf_dir: str, table: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
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
def adv_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3c_events")
    rng = np.random.default_rng(53)
    base_us = 1_767_225_600_000_000  # 2026-01-01 in us
    rows = []  # (event_type, ts_us, value, user)
    # click: constant series (MAD 0, variance 0 -> SAX std guard) + 1 outlier
    for i in range(120):
        rows.append(("click", base_us + i * 60_000_000, 5.0, 1))
    rows.append(("click", base_us + 120 * 60_000_000, 999.0, 1))
    # view: negatives (floor-division binning) + varying per-minute counts
    for i in range(200):
        for _ in range(int(rng.integers(1, 4))):
            rows.append(("view", base_us + i * 60_000_000, float(rng.normal(-3, 17.7)), 2))
    # purchase: spans several days so rank_days has >1 day, with a TIE:
    # two days with identical totals (tie -> earlier day wins)
    day_us = 86_400_000_000
    for day, per_min in [(0, 11), (1, 7), (2, 7), (3, 20)]:
        for i in range(per_min):
            rows.append(("purchase", base_us + day * day_us + i * 60_000_000, 2.0, 3))
    # signup + error: sparse
    rows.append(("signup", base_us + 30_000_000, 1.0, 4))
    rows.append(("error", base_us + 3 * day_us + 42 * 60_000_000, -0.01, 5))
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


@pytest.mark.parametrize(
    "name", ["pivot_hour_counts", "rank_days", "outlier_mad", "sax_1m"]
)
def test_ts_adversarial_matches_oracle(ray_session, adv_events_dir, name):
    eng = QUERIES[name](adv_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, adv_events_dir, "events")
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_outlier_mad_zero_mad_group(ray_session, adv_events_dir):
    """A constant series has MAD 0 — ANY deviation must flag (strict >)."""
    out = QUERIES["outlier_mad"](adv_events_dir).to_pandas()
    clk = out[out["source"] == "click"]
    assert set(clk["sum_cents"]) == {99900}
    assert (clk["mad"] == 0.0).all()


def test_rank_days_tie_earlier_day_wins(ray_session, adv_events_dir):
    out = QUERIES["rank_days"](adv_events_dir).to_pandas()
    pur = out[out["source"] == "purchase"].sort_values("rnk")
    tied = pur[pur["day_cents"] == pur["day_cents"].mode().iloc[0]]
    if len(tied) >= 2:
        assert tied.sort_values("rnk")["day"].is_monotonic_increasing


def test_sax_constant_series_symbol(ray_session, tmp_path):
    """sigma==0 -> std guard 1.0 -> every PAA is 0.0 -> symbol 'c' (the CASE
    and searchsorted agree that 0.0 falls in the third band)."""
    base_us = 1_767_225_600_000_000
    n = 60
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(base_us + np.arange(n) * 60_000_000, type=pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n), type=pa.int64()),
            "event_type": pa.array(["flat"] * n),
            "value": pa.array(np.full(n, 3.21), type=pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    eng = QUERIES["sax_1m"](str(tmp_path)).to_pandas()
    assert (eng["sym"] == "c").all() and (eng["paa"] == 0.0).all()
    ora = _oracle("sax_1m", str(tmp_path), "events")
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


# ---------------------------------------------------------------------------
# documents fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def adv_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3c_docs")
    texts = [
        "  Hello   WORLD  ",                              # case + ws collapse + trim
        "reach me at Bob.Smith+spam@Example.co.uk now",    # email with dots/plus
        "1234567@mail.com then 9876543210 alone",          # digits: email first!
        "short 123456 run and 12345 too-short run",        # 6-digit yes, 5-digit no
        "",                                                # empty doc
        "single",                                          # 1 token -> no bigram
        "a b a b a",                                       # repeated bigrams
        "café NAÏVE straße",                # unicode lower
        "tab\tand\nnewline  mix",                          # mixed ASCII ws
        "nb sp tokens here",                          # U+00A0 (Unicode ws)
        "end with a b",                                    # shared bigram across docs
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s" + str(i % 3) for i in range(len(texts))]),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["normalize_text", "redact", "top_bigrams", "sample_split"]
)
def test_docs_adversarial_matches_oracle(ray_session, adv_docs_dir, name):
    eng = QUERIES[name](adv_docs_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, adv_docs_dir, "documents")
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_redact_email_before_digits(ray_session, adv_docs_dir):
    out = QUERIES["redact"](adv_docs_dir).to_pandas().set_index("doc_id")
    # doc 2: '1234567@mail.com' is ONE email (its digits are consumed by the
    # email pass), '9876543210' is one long-digit run
    assert out.loc[2, "n_email"] == 1 and out.loc[2, "n_num"] == 1
    assert "<EMAIL>" in out.loc[2, "redacted"] and "<NUM>" in out.loc[2, "redacted"]
    # doc 3: 123456 redacts, 12345 survives
    assert out.loc[3, "n_num"] == 1 and "12345 too-short" in out.loc[3, "redacted"]
    # doc 1: mixed-case email with + and subdomain dots
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_num"] == 0


def test_bigrams_never_cross_documents(ray_session, adv_docs_dir):
    from tsrollup.pipelines.docqueries import q_top_bigrams

    # k large enough to return EVERY bigram in the fixture
    out = q_top_bigrams(adv_docs_dir, k=1000).to_pandas()
    counts = dict(zip(out["bigram"], out["n"]))
    # 'a b' appears twice in doc 6 and once in doc 10
    assert counts.get("a b") == 3
    # doc 5 ends 'single', doc 6 starts 'a' -> the cross-doc pair must NOT exist
    assert "single a" not in counts
    # empty doc 4 between docs must not bridge doc 3's end to doc 5's start
    assert "run single" not in counts
    # NBSP separates tokens on the engine side; nb/sp become adjacent tokens
    assert counts.get("nb sp") == 1


def test_normalize_text_semantics(ray_session, adv_docs_dir):
    out = QUERIES["normalize_text"](adv_docs_dir).to_pandas().set_index("doc_id")
    assert out.loc[0, "norm"] == "hello world"
    assert out.loc[7, "norm"] == "café naïve straße"
    assert out.loc[8, "norm"] == "tab and newline mix"
    assert out.loc[4, "norm"] == ""


def test_sample_split_deterministic_and_stratified(ray_session, adv_docs_dir):
    a = QUERIES["sample_split"](adv_docs_dir).to_pandas()
    b = QUERIES["sample_split"](adv_docs_dir).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
    # every (source, split) count is positive and totals match the corpus
    assert a["n_docs"].sum() == 11


@pytest.fixture(scope="module")
def pack_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3c_pack")
    texts = [
        " ".join(["t"] * 300),     # p0 doc0: 300 tok
        " ".join(["u"] * 300),     # p0 doc1: 300 tok -> seq0 spans docs 0-1
        "   \n\t  ",               # p0 doc2: 0 tok (skipped from packing)
        " ".join(["v"] * 1124),    # p0 doc3: spans multiple sequences alone
        " ".join(["w"] * 256),     # p1 doc4: exact-multiple source:
        " ".join(["x"] * 256),     # p1 doc5: 512 total == exactly one seq
        "x\nx\nx",                 # p2 doc6: dup lines (frac 2/3 -> flagged)
        "a\n",                     # p2 doc7: trailing newline -> ['a', '']
        "",                        # p2 doc8: one empty line, no dups
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["p0"] * 4 + ["p1"] * 2 + ["p2"] * 3),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["repetition_filter", "pack_sequences"])
def test_pack_rep_adversarial_matches_oracle(ray_session, pack_docs_dir, name):
    eng = QUERIES[name](pack_docs_dir).to_pandas()
    ora = _oracle(name, pack_docs_dir, "documents")
    assert len(eng)
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_pack_sequences_layout(ray_session, pack_docs_dir):
    out = QUERIES["pack_sequences"](pack_docs_dir).to_pandas()
    p0 = out[out["source"] == "p0"].sort_values("seq").reset_index(drop=True)
    # p0 total = 300+300+1124 = 1724 -> 4 sequences, tail 188
    assert list(p0["n_tok_seq"]) == [512, 512, 512, 188]
    # seq0 spans docs 0-1 (the zero-token doc 2 never appears)
    assert (p0.loc[0, "first_doc"], p0.loc[0, "last_doc"], p0.loc[0, "n_docs"]) == (0, 1, 2)
    # seq1 starts inside doc1 and crosses into doc3, skipping doc2
    assert (p0.loc[1, "first_doc"], p0.loc[1, "last_doc"]) == (1, 3)
    # seqs 2-3 live entirely inside the giant doc3
    assert (p0.loc[2, "n_docs"], p0.loc[3, "n_docs"]) == (1, 1)
    # p1: exactly one full sequence (total is an exact multiple of 512)
    p1 = out[out["source"] == "p1"]
    assert len(p1) == 1 and int(p1["n_tok_seq"].iloc[0]) == 512
    # p2: docs 6/7/8 have 3/1/0 tokens -> one 4-token sequence spanning
    # docs 6-7 (the empty doc 8 is excluded entirely)
    p2 = out[out["source"] == "p2"]
    assert len(p2) == 1 and int(p2["n_tok_seq"].iloc[0]) == 4
    assert (int(p2["first_doc"].iloc[0]), int(p2["last_doc"].iloc[0])) == (6, 7)


def test_repetition_filter_semantics(ray_session, pack_docs_dir):
    out = QUERIES["repetition_filter"](pack_docs_dir).to_pandas().set_index("doc_id")
    assert (out.loc[6, "n_lines"], out.loc[6, "n_dup_lines"], out.loc[6, "flagged"]) == (3, 2, 1)
    assert (out.loc[7, "n_lines"], out.loc[7, "n_dup_lines"]) == (2, 0)
    assert (out.loc[8, "n_lines"], out.loc[8, "n_dup_lines"]) == (1, 0)


@pytest.fixture(scope="module")
def dup_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3c_dup")
    texts = [
        "The  Quick Brown Fox Jumps Over It",   # doc0: dup of doc1 after normalize
        "the quick brown fox jumps over it",    # doc1: loses to doc0 (min doc_id)
        "THE\tQUICK  brown fox jumps over it",  # doc2: same after ws-collapse+lower
        "too short",                            # doc3: fails the >=5-token gate
        "x " * 30,                              # doc4: passes both gates
        "nb sp one two three four five",   # doc5: NBSP counts as a separator
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["d0", "d0", "d1", "d1", "d0", "d1"]),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("fixture", ["adv_docs_dir", "pack_docs_dir", "dup_docs_dir"])
def test_corpus_pipeline_matches_oracle(ray_session, fixture, request):
    sf_dir = request.getfixturevalue(fixture)
    eng = QUERIES["corpus_pipeline"](sf_dir).to_pandas()
    ora = _oracle("corpus_pipeline", sf_dir, "documents")
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_corpus_pipeline_dedup_keeps_min_doc_id(ray_session, dup_docs_dir):
    out = QUERIES["corpus_pipeline"](dup_docs_dir).to_pandas()
    # docs 0/1/2 normalize to the same string -> ONE survivor (doc0);
    # doc3 gated out; docs 4/5 survive -> 3 docs total across groups
    assert int(out["n_docs"].sum()) == 3


@pytest.mark.parametrize("fixture", ["adv_docs_dir", "pack_docs_dir", "dup_docs_dir"])
def test_tfidf_topk_matches_oracle(ray_session, fixture, request):
    sf_dir = request.getfixturevalue(fixture)
    eng = QUERIES["tfidf_topk"](sf_dir).to_pandas()
    ora = _oracle("tfidf_topk", sf_dir, "documents")
    assert len(eng)
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_tfidf_tf_ties_break_by_token(ray_session, adv_docs_dir):
    out = QUERIES["tfidf_topk"](adv_docs_dir).to_pandas()
    # doc 6 is 'a b a b a': tf(a)=3 > tf(b)=2 -> a ranked first
    d6 = out[out["doc_id"] == 6].sort_values(["tf", "token"], ascending=[False, True])
    assert list(d6["token"]) == ["a", "b"]
    assert list(d6["tf"]) == [3, 2]
    # doc 10 'end with a b': all tf=1 -> top-3 alphabetical among its tokens
    d10 = out[out["doc_id"] == 10]
    assert list(sorted(d10["token"])) == ["a", "b", "end"]
    assert (d10["tf"] == 1).all()


def test_pivot_hour_counts_pre1970_floor(ray_session, tmp_path):
    """Pre-1970 events floor to NEGATIVE hours on both sides (the oracle uses
    FLOOR(x / y), never DuckDB's truncating `//`, because pivot derives hours
    from raw ts with no bucket-range validation upstream)."""
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(
                [-1_800_000_000, -7_200_000_000, 1_800_000_000], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    eng = QUERIES["pivot_hour_counts"](str(tmp_path)).to_pandas()
    assert set(eng["hour"]) == {-2, -1, 0}
    ora = _oracle("pivot_hour_counts", str(tmp_path), "events")
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_repetition_filter_null_text(ray_session, tmp_path):
    """A NULL text routes through as '' (one empty line) instead of crashing,
    matching the sibling operators' null contract."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a\na", None], pa.string()),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([3, 0], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = QUERIES["repetition_filter"](str(tmp_path)).to_pandas().set_index("doc_id")
    assert (out.loc[0, "n_lines"], out.loc[0, "n_dup_lines"]) == (2, 1)
    assert (out.loc[1, "n_lines"], out.loc[1, "n_dup_lines"]) == (1, 0)
