"""Randomized engine-vs-oracle sweep for the round-3h corpus-quality
family over adversarial documents: Unicode whitespace (NBSP, NEL,
U+2028), NUL bytes inside tokens, empty and null texts, single-token
docs, heavy repetition. Same DuckDB oracles the driver uses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL, DOC_QUERIES

SWEEP = [
    "ttr_quality", "token_entropy", "unigram_logprob", "zipf_fit",
    "token_drift", "bigram_entropy", "bpe_pairs", "utf8_profile",
    "doclen_quantiles", "trending_tokens", "source_perplexity",
    "token_pareto", "lexicon_score", "corpus_grep", "stratified_sample",
    # round-3l family
    "token_simpson", "kl_divergence_sources", "readability",
    "cosine_sources", "gini_tokens", "g2_collocations",
]

_WORDS = ["a", "ab", "the", "x\x00y", "x\x00z", "Zürich", "ému", "q1",
          "longer_token_here", "0", "中文字", "🦀go", "日本語テスト"]
_WS = [" ", "  ", "\t", " ", " ", "", "\n"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _random_docs(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 120))
    texts, srcs = [], []
    for i in range(n):
        kind = rng.integers(0, 10)
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        elif kind == 2:
            texts.append(str(rng.choice(_WORDS)))          # single token
        elif kind == 3:                                     # heavy repetition
            texts.append(" ".join([str(rng.choice(_WORDS))] * int(rng.integers(2, 30))))
        else:
            k = int(rng.integers(1, 40))
            parts = []
            for _ in range(k):
                parts.append(str(rng.choice(_WORDS)))
                parts.append(str(rng.choice(_WS)))
            texts.append("".join(parts))
        srcs.append(str(rng.choice(["web", "wiki", "code"])))
    return pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "lang": pa.array(["en"] * n),
         "source": pa.array(srcs),
         "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64())}
    )


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_random_docs_sweep(ray_session, tmp_path_factory, seed):
    import duckdb

    d = tmp_path_factory.mktemp(f"rdocs{seed}")
    pq.write_table(_random_docs(seed), d / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    for name in SWEEP:
        res = DOC_QUERIES[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.execute(DOC_ORACLE_SQL[name]).df()
        if len(got) == 0 and len(want) == 0:
            continue
        try:
            pd.testing.assert_frame_equal(
                _canon(got), _canon(want), check_dtype=False)
        except AssertionError as e:
            raise AssertionError(f"query {name!r} diverged from oracle") from e
