"""Round-3l operators: FastSS edit-distance pairs (engine vs DuckDB's
byte-based levenshtein on adversarial prefixes) plus unit coverage of the
vectorized ED<=1 verifier."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.docqueries import (
    DOC_ORACLE_SQL,
    DOC_QUERIES,
    EDITDIST_PREFIX,
    _byte_matrix,
    _ed1_verify,
)


def _ed1_ref(a: str, b: str) -> int:
    """Reference byte-level Levenshtein, capped at 2."""
    x, y = a.encode(), b.encode()
    if len(x) < len(y):
        x, y = y, x
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i] + [0] * len(y)
        for j, cy in enumerate(y, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (cx != cy))
        prev = cur
    return min(prev[-1], 2)


CASES = [
    ("hello world!", "hello world!", 0),
    ("hello world!", "hello worlds", 1),   # substitution
    ("hello world", "hello worl", 1),      # deletion
    ("hello worl", "hello world", 1),      # insertion (orientation swap)
    ("ab", "ba", 2),                       # shares deletion variants, ED 2
    ("", "", 0),
    ("", "x", 1),
    ("a\x00b", "a\x00b", 0),               # genuine NUL byte
    ("a\x00b", "ab", 1),                   # NUL deletion
    ("a\x00b", "a\x00c", 1),
    ("Zürich12345", "Zurich12345", 2),     # ü is 2 bytes: byte-ED 2
    ("中文", "中文", 0),
    ("中文", "丮文", 1),                    # U+4E2D vs U+4E2E: one UTF-8 byte
]


def test_ed1_verify_cases():
    ka = pa.array([a for a, _, _ in CASES], pa.string())
    kb = pa.array([b for _, b, _ in CASES], pa.string())
    am, al = _byte_matrix(ka, 4 * EDITDIST_PREFIX)
    bm, bl = _byte_matrix(kb, 4 * EDITDIST_PREFIX)
    got = _ed1_verify(am, al, bm, bl)
    for (a, b, want), g in zip(CASES, got):
        assert g == want == _ed1_ref(a, b), (a, b, want, g)


def test_ed1_verify_random():
    rng = np.random.default_rng(7)
    alphabet = list("abAB\x00é中")
    pairs = []
    for _ in range(400):
        la = int(rng.integers(0, 9))
        a = "".join(rng.choice(alphabet, la))
        mode = rng.integers(0, 4)
        if mode == 0:
            b = a
        elif mode == 1 and la:
            p = int(rng.integers(0, la))
            b = a[:p] + str(rng.choice(alphabet)) + a[p + 1:]
        elif mode == 2 and la:
            p = int(rng.integers(0, la))
            b = a[:p] + a[p + 1:]
        else:
            lb = int(rng.integers(0, 9))
            b = "".join(rng.choice(alphabet, lb))
        pairs.append((a, b))
    am, al = _byte_matrix(pa.array([a for a, _ in pairs], pa.string()), 48)
    bm, bl = _byte_matrix(pa.array([b for _, b in pairs], pa.string()), 48)
    got = _ed1_verify(am, al, bm, bl)
    for (a, b), g in zip(pairs, got):
        assert g == _ed1_ref(a, b), (a, b, g, _ed1_ref(a, b))


@pytest.mark.parametrize("seed", [3, 19])
def test_skyline_docs_random_vs_oracle(ray_session, tmp_path_factory, seed):
    """Random docs with duplicated texts (ties on both axes) and a tiny
    value domain so front points repeat — exercises the equal-point and
    equal-coordinate branches of the sweep."""
    import duckdb

    rng = np.random.default_rng(seed)
    words = ["a", "bb", "ccc", "dddd"]
    texts = []
    for _ in range(150):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(str(rng.choice(words)) for _ in range(k)))
    texts += texts[:20]                      # exact duplicates
    texts += [None, "", "   "]
    n = len(texts)
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "lang": pa.array(["en"] * n),
         "source": pa.array(["web"] * n),
         "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64())})
    d = tmp_path_factory.mktemp(f"sky{seed}")
    pq.write_table(tbl, d / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = DOC_QUERIES["skyline_docs"](str(d)).to_pandas()
    want = con.execute(DOC_ORACLE_SQL["skyline_docs"]).df()
    key = ["doc_id", "n_chars", "n_tok"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    assert len(want) > 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed,langs", [
    (1, ["en", "de", "fr", None]),
    (2, ["en"]),                       # n_neg = 0 -> NULL auc edge
    (3, ["de", "zh"]),                 # n_pos = 0 -> NULL auc edge
])
def test_quality_auc_random_vs_oracle(ray_session, tmp_path_factory,
                                      seed, langs):
    import duckdb

    rng = np.random.default_rng(seed)
    n = 120
    nchars = rng.integers(0, 25, size=n)   # tiny domain: heavy ties
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "text": pa.array(["x"] * n, pa.string()),
         "lang": pa.array([langs[i % len(langs)] for i in range(n)],
                          pa.string()),
         "source": pa.array(["web"] * n),
         "n_chars": pa.array(nchars, pa.int64())})
    d = tmp_path_factory.mktemp(f"auc{seed}")
    pq.write_table(tbl, d / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = DOC_QUERIES["quality_auc"](str(d)).reset_index(drop=True)
    want = con.execute(DOC_ORACLE_SQL["quality_auc"]).df()
    cols = ["n_pos", "n_neg", "u2", "auc"]
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)
    # sanity: engine AUC equals scipy-free reference on the raw rows
    if got["auc"].notna().all():
        pos = nchars[np.array([langs[i % len(langs)] == "en"
                               for i in range(n)])]
        neg = nchars[np.array([langs[i % len(langs)] != "en"
                               for i in range(n)])]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        ref = (wins + ties / 2) / (len(pos) * len(neg))
        assert abs(got["auc"].iloc[0] - ref) < 1e-12


@pytest.mark.parametrize("seed", [8, 21])
def test_throttle_events_dense_vs_oracle(ray_session, tmp_path_factory, seed):
    """Sub-5s gaps everywhere: events land microseconds-to-seconds apart so
    the debounce actually drops most rows (the coarse-grained testdata only
    drops equal-ts duplicates)."""
    import duckdb

    from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

    rng = np.random.default_rng(seed)
    n = 300
    ts_us = np.sort(rng.integers(0, 200_000_000, size=n))  # 200s span
    tbl = pa.table(
        {"event_id": pa.array(np.arange(n), pa.int64()),
         "ts": pa.array(ts_us.astype("int64"), pa.timestamp("us")),
         "user_id": pa.array(rng.integers(1, 5, size=n), pa.int64()),
         "event_type": pa.array(rng.choice(["a", "b"], size=n)),
         "value": pa.array(np.zeros(n), pa.float64()),
         "props": pa.array([""] * n, pa.string())})
    d = tmp_path_factory.mktemp(f"thr{seed}")
    pq.write_table(tbl, d / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = QUERIES["throttle_events"](str(d)).to_pandas()
    want = con.execute(ORACLE_SQL["throttle_events"]).df()
    assert 0 < len(want) < n, "sweep must drop a real fraction"
    key = ["event_id", "user_id", "event_type", "ts"]
    pd.testing.assert_frame_equal(
        got[key].sort_values("event_id").reset_index(drop=True),
        want[key].sort_values("event_id").reset_index(drop=True),
        check_dtype=False)


@pytest.mark.parametrize("seed,n,k", [(0, 150, 5), (4, 37, 5), (9, 3, 5),
                                      (12, 64, 7)])
def test_ntile_exact_vs_reference(ray_session, seed, n, k):
    """Distributed NTILE against the in-memory formula, with heavy ties —
    pins the per-bucket ordinal fix (a hash partition holds several range
    buckets; ordinals must reset per bucket)."""
    import ray

    from tsrollup.pipelines.queries import _ntile_exact

    rng = np.random.default_rng(seed)
    uid = np.arange(n, dtype=np.int64)
    v = rng.integers(-500, 500, size=n).astype(np.int64)
    if n > 30:
        v[10:30] = v[5]  # tie block
    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array(uid), "m": pa.array(v)}))
    got = (_ntile_exact(ds, "m", k).to_pandas()
           .set_index("user_id")["tile"].reindex(uid).to_numpy())
    order = np.lexsort((uid, v))
    rank0 = np.empty(n, np.int64)
    rank0[order] = np.arange(n)
    big, rem = divmod(n, k)
    boundary = rem * (big + 1)
    want = np.where(rank0 < boundary, rank0 // (big + 1) + 1,
                    rem + (rank0 - boundary) // max(big, 1) + 1)
    assert (got == want).all()


def test_null_users_and_empty_edges(ray_session, tmp_path_factory):
    """Code-review regressions: NULL user_ids must not fragment sessions
    (engine filters them; oracle WHERE matches), and zero-user / empty
    corpora return empty frames instead of crashing or emitting 0-rows
    where the oracle emits none."""
    import duckdb

    from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL as DOSQL
    from tsrollup.pipelines.docqueries import DOC_QUERIES as DQ
    from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

    d = tmp_path_factory.mktemp("nulledge")
    n = 6
    tbl = pa.table(
        {"event_id": pa.array(np.arange(n), pa.int64()),
         "ts": pa.array((np.arange(n) * 60_000_000).astype("int64"),
                        pa.timestamp("us")),
         "user_id": pa.array([None] * n, pa.int64()),  # ALL null users
         "event_type": pa.array(["a", "b"] * 3),
         "value": pa.array(np.ones(n), pa.float64()),
         "props": pa.array([""] * n, pa.string())})
    pq.write_table(tbl, d / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    for name in ("session_paths", "rfm_segments", "throttle_events"):
        res = QUERIES[name](str(d))
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = con.execute(ORACLE_SQL[name]).df()
        assert len(got) == len(want) == 0, (name, len(got), len(want))

    # empty documents corpus -> quality_auc yields 0 rows on both sides
    d2 = tmp_path_factory.mktemp("emptydocs")
    pq.write_table(pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string()),
         "lang": pa.array([], pa.string()),
         "source": pa.array([], pa.string()),
         "n_chars": pa.array([], pa.int64())}), d2 / "documents.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d2}/documents.parquet')")
    got = DQ["quality_auc"](str(d2))
    want = con2.execute(DOSQL["quality_auc"]).df()
    assert len(got) == len(want) == 0


def test_dtw_int_vs_reference():
    """Anti-diagonal vectorized DTW against the textbook O(n^2) DP."""
    from tsrollup.pipelines.queries import _dtw_int

    def ref(a, b):
        big = float("inf")
        dp = [[big] * (len(b) + 1) for _ in range(len(a) + 1)]
        dp[0][0] = 0
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                c = abs(a[i - 1] - b[j - 1])
                dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1],
                                   dp[i - 1][j - 1])
        return dp[len(a)][len(b)]

    rng = np.random.default_rng(2)
    for _ in range(200):
        a = rng.integers(-50, 50, size=int(rng.integers(1, 25)))
        b = rng.integers(-50, 50, size=int(rng.integers(1, 25)))
        assert _dtw_int(a.astype(np.int64), b.astype(np.int64)) \
            == ref(a.tolist(), b.tolist())


def _mutate(rng, base: str) -> str:
    p = int(rng.integers(0, max(len(base), 1)))
    c = str(rng.choice(list("abz\x00é中🦀")))
    mode = rng.integers(0, 4)
    if mode == 0:
        return base[:p] + c + base[p + 1:]            # substitution
    if mode == 1:
        return base[:p] + base[p + 1:]                # deletion
    if mode == 2:
        return base[:p] + c + base[p:]                # insertion
    if len(base) >= p + 2:
        return base[:p] + base[p + 1] + base[p] + base[p + 2:]  # transpose
    return base


@pytest.mark.parametrize("seed", [5, 17])
def test_editdist_pairs_random_vs_oracle(ray_session, tmp_path_factory, seed):
    import duckdb

    rng = np.random.default_rng(seed)
    bases = ["abcdefghijkl", "hello world ", "中文字テスト", "a\x00b\x00cdefgh",
             "🦀rusty crab", "short", ""]
    texts: list[str | None] = []
    for _ in range(90):
        kind = rng.integers(0, 12)
        if kind == 0:
            texts.append(None)
        elif kind == 1:
            texts.append("")
        else:
            t = str(rng.choice(bases))
            for _ in range(int(rng.integers(0, 3))):
                t = _mutate(rng, t)
            texts.append(t + " trailing suffix beyond the prefix window")
    n = len(texts)
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "lang": pa.array(["en"] * n),
         "source": pa.array(["web"] * n),
         "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64())})
    d = tmp_path_factory.mktemp(f"ed{seed}")
    pq.write_table(tbl, d / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = DOC_QUERIES["editdist_pairs"](str(d)).to_pandas()
    want = con.execute(DOC_ORACLE_SQL["editdist_pairs"]).df()
    key = ["doc_a", "doc_b", "dist"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    assert len(want) > 0, "sweep must generate real pairs"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
