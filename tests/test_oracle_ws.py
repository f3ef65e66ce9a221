"""Oracle-contract parity on NON-ASCII whitespace (ADVICE r2 #3/#4).

The engine tokenizes on the full Unicode whitespace set
(pc.utf8_split_whitespace == Python str.split); DuckDB's RE2 '\\s'/'\\S'
are ASCII-only, so each text oracle normalizes Unicode whitespace to ' '
first. These tests feed texts full of NBSP / ideographic space / NEL /
line+paragraph separators through BOTH sides and require identical output —
the synth corpus is ASCII, so without this the normalization would be
untested dead weight.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

TEXTS = [
    "the cat\u00a0sat on the mat",          # NBSP between tokens
    "the cat sat on the mat",               # ASCII twin (near-dup pair)
    "der\u3000hund und die\u3000katze im haus",  # ideographic space
    "le chat\x85et le chien",               # NEL
    "\u2028\u2029\u00a0",                   # only exotic whitespace -> 0 tokens
    "mixed\u00a0ws\tand ascii\nws here ok",
    "\x1cinfo\x1dseparator\x1econtrols\x1fsplit",
    "",                                     # empty
]


@pytest.fixture(scope="module")
def uni_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("uni_sf")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
            "text": pa.array(TEXTS),
            "lang": pa.array(["xx"] * len(TEXTS)),
            "source": pa.array(["s0", "s0", "s1", "s1", "s0", "s1", "s0", "s1"]),
            "n_chars": pa.array([len(t) for t in TEXTS], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
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
    "name", ["token_count", "token_count_by_source", "doc_quality", "langid",
             "dedup_ngram", "top_tokens",
             # round-3c text operators, same exotic-whitespace contract
             "normalize_text", "redact", "top_bigrams", "repetition_filter",
             "pack_sequences", "sample_split", "corpus_pipeline"]
)
def test_engine_matches_oracle_on_unicode_whitespace(ray_session, uni_sf_dir, name):
    eng = QUERIES[name](uni_sf_dir)
    eng_df = eng.to_pandas() if not isinstance(eng, pd.DataFrame) else eng
    ora_df = _oracle(name, uni_sf_dir)
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)
