"""Round-3g: corpus-level line dedup (`line_dedup`) on an adversarial
documents fixture — within-doc repeats, cross-doc duplicate lines, empty
text, null text, trailing-newline empty lines, NUL-byte lines that differ
only PAST the NUL (the pandas hash-table trap — must not collapse), and a
doc whose every line is dropped. Engine vs the SAME DuckDB oracle SQL plus
hand-computed semantic asserts."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL, DOC_QUERIES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def r3g_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3g_docs")
    rows = [
        # (doc_id, text): winner per distinct line = min (doc_id, idx)
        (0, "a\nb\na"),          # within-doc dup: second 'a' dropped
        (1, "b\nc"),             # 'b' lost to doc 0; 'c' kept
        (2, ""),                 # one empty line, the global winner for ''
        (3, None),               # null -> '' -> loses to doc 2: n_kept == 0
        (4, "x\x00y\nx\x00z"),   # NUL lines differing only past the NUL
        (5, "x\x00y"),           # exact dup of doc 4 line 1 -> dropped
        (6, "trailing\n"),       # ['trailing', '']; '' lost to doc 2
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["web"] * len(rows)),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_line_dedup_matches_oracle(ray_session, r3g_docs_dir):
    import duckdb

    got = DOC_QUERIES["line_dedup"](r3g_docs_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{r3g_docs_dir}/documents.parquet')"
    )
    want = con.execute(DOC_ORACLE_SQL["line_dedup"]).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_line_dedup_semantics(ray_session, r3g_docs_dir):
    got = (
        DOC_QUERIES["line_dedup"](r3g_docs_dir)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "text_dedup"] == "a\nb"
    assert (got.loc[0, "n_lines"], got.loc[0, "n_kept"]) == (3, 2)
    assert got.loc[1, "text_dedup"] == "c"
    assert got.loc[2, "text_dedup"] == ""
    assert got.loc[2, "n_kept"] == 1          # the winning empty line
    assert got.loc[3, "n_kept"] == 0          # null text, '' lost to doc 2
    assert got.loc[3, "text_dedup"] == ""
    # NUL-divergent lines must both survive (doc 4), the exact dup must not
    assert got.loc[4, "text_dedup"] == "x\x00y\nx\x00z"
    assert got.loc[5, "n_kept"] == 0
    assert got.loc[6, "text_dedup"] == "trailing"
    assert got.loc[6, "n_lines"] == 2


@pytest.fixture(scope="module")
def r3g_dups_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3g_dups")
    texts = ["same"] * 4 + ["other"] * 2 + ["uniq1", "uniq2", "uniq3", None, None]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(x) if x else 0 for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_dup_cluster_sizes_counts_real_clusters(ray_session, r3g_dups_dir):
    """4x'same' + 2x'other' + 3 singletons + 2 nulls (null == '' cluster):
    sizes {1:3, 2:2, 4:1} — and the engine matches its oracle."""
    import duckdb

    got = (
        DOC_QUERIES["dup_cluster_sizes"](r3g_dups_dir)
        .to_pandas()
        .set_index("cluster_size")["n_clusters"]
        .to_dict()
    )
    assert got == {1: 3, 2: 2, 4: 1}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{r3g_dups_dir}/documents.parquet')"
    )
    want = con.execute(DOC_ORACLE_SQL["dup_cluster_sizes"]).df()
    assert {int(r.cluster_size): int(r.n_clusters) for r in want.itertuples()} == got
