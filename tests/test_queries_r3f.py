"""Round-3f corpus-curation operators (decontaminate, quality_filter,
mix_rebalance) on an ADVERSARIAL documents fixture: repeated grams inside a
doc (counted once), docs exactly at / below the n-gram window, eval docs
excluded from output, cutoff ties (>= keeps them), a source whose every doc
shares one score, the smallest source keeping everything (thr == 2^32),
null text. Engine vs the SAME DuckDB oracle SQL, plus replay/semantic
asserts and the negative-doc_id guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.docqueries import (
    _DECON_MOD,
    _DECON_N,
    _MIX_K,
    _MIX_MOD,
    DOC_ORACLE_SQL,
    DOC_QUERIES,
)

EVAL_ID = _DECON_MOD * 3          # eval-side doc (id % mod == 0)
EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(DOC_ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def r3f_docs_dir(tmp_path_factory):
    assert _DECON_N == 5, "fixture grams are built for the shipped window"
    d = tmp_path_factory.mktemp("r3f_docs")
    rows = []  # (doc_id, text, source)

    # eval doc: 7 tokens -> three 5-grams
    rows.append((EVAL_ID, EVAL_TEXT, "web"))
    # train doc 1: shares EXACTLY one 5-gram (tokens 1..5 of the eval doc),
    # and repeats it — the repeat must count ONCE (distinct grams per doc)
    t1 = "alpha beta gamma delta epsilon X alpha beta gamma delta epsilon"
    rows.append((1, t1, "web"))
    # train doc 2: shares TWO distinct eval grams (a 6-token overlap window)
    rows.append((2, "Q alpha beta gamma delta epsilon zeta", "web"))
    # train doc 3: same words, different order -> NO hit
    rows.append((3, "epsilon delta gamma beta alpha zeta eta", "web"))
    # train doc 4: exactly 4 tokens (< window) -> no grams at all
    rows.append((4, "alpha beta gamma delta", "web"))
    # another eval doc that itself overlaps eval 1 — eval docs never appear
    # in the output regardless of overlap
    rows.append((EVAL_ID * 2, EVAL_TEXT + " theta", "web"))
    # null text (engine maps to ''; oracle coalesces)
    rows.append((5, None, "web"))

    # quality_filter material: 'hi' has 10 docs with distinct alpha densities
    # (cutoff = the p90 score, ties kept by >=); 'lo' has 3 docs all at the
    # SAME score (cutoff == score -> ALL kept)
    for i in range(10):
        # i alpha chars then (9-i) digits -> monotone alpha density, 9 chars
        rows.append((100 + i, "a" * i + "1" * (9 - i), "hi"))
    for i in range(3):
        rows.append((200 + i, "ab12", "lo"))

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
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["decontaminate", "quality_filter", "mix_rebalance"]
)
def test_r3f_adversarial_matches_oracle(ray_session, r3f_docs_dir, name):
    eng = DOC_QUERIES[name](r3f_docs_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, r3f_docs_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_decontaminate_semantics(ray_session, r3f_docs_dir):
    out = DOC_QUERIES["decontaminate"](r3f_docs_dir).to_pandas()
    hits = dict(zip(out["doc_id"], out["n_hits"]))
    assert hits == {1: 1, 2: 2}  # repeat counted once; 2-gram overlap; no
    # reordered / short / eval / null docs
    assert set(out["source"]) == {"web"}


def test_quality_filter_tie_and_uniform_source(ray_session, r3f_docs_dir):
    out = DOC_QUERIES["quality_filter"](r3f_docs_dir)
    out = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).set_index("source")
    # 'lo': every doc shares one score -> cutoff == score, ALL 3 kept
    assert int(out.loc["lo", "n_kept"]) == 3
    assert int(out.loc["lo", "n_docs"]) == 3
    # 'hi': p90 of 10 docs = rank ceil(0.9*10)=9 -> exactly the top-2 kept
    assert int(out.loc["hi", "n_kept"]) == 2


def test_mix_rebalance_replay_and_guard(ray_session, r3f_docs_dir):
    out = DOC_QUERIES["mix_rebalance"](r3f_docs_dir)
    out = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).set_index("source")
    docs = pd.read_parquet(f"{r3f_docs_dir}/documents.parquet")
    n_min = docs.groupby("source").size().min()
    for src, g in docs.groupby("source"):
        thr = (int(n_min) * _MIX_MOD) // len(g)
        h = (g["doc_id"].to_numpy().astype(np.uint64) * np.uint64(_MIX_K)) % np.uint64(_MIX_MOD)
        assert int(out.loc[src, "thr"]) == thr
        assert int(out.loc[src, "n_kept"]) == int((h < thr).sum())
    # smallest source keeps everything: thr == 2^32 > any hash
    lo = out.loc["lo"]
    assert int(lo["thr"]) == _MIX_MOD and int(lo["n_kept"]) == int(lo["n_docs"])

    # negative doc_id: loud error, not silent uint64 wraparound divergence
    import pyarrow.parquet as _pq

    bad = pa.table(
        {"doc_id": pa.array([-1], pa.int64()), "text": pa.array(["x"]),
         "lang": pa.array(["en"]), "source": pa.array(["web"]),
         "n_chars": pa.array([1], pa.int64())}
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        _pq.write_table(bad, os.path.join(td, "documents.parquet"))
        with pytest.raises(Exception, match="non-negative doc_id"):
            r = DOC_QUERIES["mix_rebalance"](td)
            if not isinstance(r, pd.DataFrame):
                r.to_pandas()
