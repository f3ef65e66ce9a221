"""Round-3d operators (semi/anti user join, burst islands, autocorrelation,
KMV sketch family, JSONL sink round trip) on an ADVERSARIAL fixture: runs
exactly at the length threshold, users exactly at the heavy-purchaser
threshold, a zero-variance series (ACF drop), a perfectly linear series
(ACF r == 1), sources with fewer distinct users than the sketch size.
Engine vs the SAME DuckDB oracle SQL on the same parquet, plus targeted
semantic asserts (complement property, KMV closure property)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import (
    _HEAVY_PURCHASES,
    _KMV_K,
    ORACLE_SQL,
    QUERIES,
    _kmv_hash,
)

BASE_US = 1_767_225_600_000_000  # 2026-01-01, hour-aligned
HOUR_US = 3_600_000_000
MIN_US = 60_000_000
BASE_HOUR = BASE_US // HOUR_US


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
def r3d_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3d_events")
    rows = []  # (event_type, ts_us, value, user)

    # click — burst islands on the 1h tier: hours {0,1,2} (run EXACTLY at the
    # min_len threshold), {5} (isolated), {10..14} (run of 5). Two events in
    # hour 1 (density must not split a run).
    for h in [0, 1, 1, 2, 5, 10, 11, 12, 13, 14]:
        rows.append(("click", BASE_US + h * HOUR_US, 1.0, 100 + h))

    # view — perfectly linear 1m series (ACF r == 1.0 at every lag), one
    # DISTINCT user per bucket (kmv: 30 distinct users, > _KMV_K)
    for i in range(30):
        rows.append(("view", BASE_US + i * MIN_US, float(i), 200 + i))

    # error — constant series over consecutive buckets: ACF variance 0 ->
    # dropped entirely; users overlap view's (jaccard n_inter > 0)
    for i in range(5):
        rows.append(("error", BASE_US + i * MIN_US, 7.0, 200 + i))
    # user 200 returns on days 1 and 2 (constant value keeps ACF dropped):
    # retention_cohorts gets (cohort 0 -> active 0/1/2) cells
    DAY_US = 86_400_000_000
    rows.append(("error", BASE_US + DAY_US, 7.0, 200))
    rows.append(("error", BASE_US + 2 * DAY_US, 7.0, 200))

    # purchase/signup — user 7 EXACTLY at the heavy threshold (kept by >=),
    # user 8 one below (anti side); both also have signup events
    for i in range(_HEAVY_PURCHASES):
        rows.append(("purchase", BASE_US + i * MIN_US, 2.0, 7))
    for i in range(_HEAVY_PURCHASES - 1):
        rows.append(("purchase", BASE_US + i * MIN_US, 2.0, 8))
    rows.append(("signup", BASE_US, 1.0, 7))
    rows.append(("signup", BASE_US + MIN_US, 1.0, 8))
    rows.append(("signup", BASE_US + 2 * MIN_US, 1.0, 8))

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
    "name",
    ["semi_join_users", "anti_join_users", "bursts", "acf_1m",
     "kmv_distinct", "jaccard_kmv", "jsonl_roundtrip", "quantiles_1d",
     "retention_cohorts"],
)
def test_r3d_adversarial_matches_oracle(ray_session, r3d_events_dir, name):
    eng = QUERIES[name](r3d_events_dir)
    eng_df = eng if isinstance(eng, pd.DataFrame) else eng.to_pandas()
    ora_df = _oracle(name, r3d_events_dir)
    assert len(eng_df), f"{name}: degenerate empty result on fixture"
    pd.testing.assert_frame_equal(_canon(eng_df), _canon(ora_df), check_dtype=False)


def test_bursts_islands(ray_session, r3d_events_dir):
    out = QUERIES["bursts"](r3d_events_dir).to_pandas()
    clk = out[out["source"] == "click"].sort_values("run_start")
    got = list(zip(clk["run_start"] - BASE_HOUR, clk["run_len"]))
    # the isolated hour 5 and any run shorter than min_len are absent;
    # the {0,1,2} run sits EXACTLY at the threshold and is kept
    assert got == [(0, 3), (10, 5)]


def test_acf_linear_is_one_and_constant_dropped(ray_session, r3d_events_dir):
    out = QUERIES["acf_1m"](r3d_events_dir).to_pandas()
    view = out[out["source"] == "view"]
    assert sorted(view["lag"]) == [1, 2, 3, 4, 5]
    assert (view["r"] == 1.0).all()
    assert (view.set_index("lag")["n_pairs"] == pd.Series(
        {lag: 30 - lag for lag in range(1, 6)})).all()
    assert "error" not in set(out["source"])  # zero variance -> dropped


def test_semi_anti_complement(ray_session, r3d_events_dir):
    semi = QUERIES["semi_join_users"](r3d_events_dir).to_pandas()
    anti = QUERIES["anti_join_users"](r3d_events_dir).to_pandas()
    ev = pd.read_parquet(f"{r3d_events_dir}/events.parquet")
    total = ev.groupby("event_type").size()
    both = pd.concat([semi, anti]).groupby("source")["n_events"].sum()
    for src, n in total.items():
        assert both.get(src, 0) == n  # semi + anti partition every event
    # user 7 is EXACTLY at the threshold (>= keeps it); user 8 one below
    sig_semi = semi[semi["source"] == "signup"]
    sig_anti = anti[anti["source"] == "signup"]
    assert int(sig_semi["n_users"].iloc[0]) == 1  # user 7
    assert int(sig_anti["n_users"].iloc[0]) == 1  # user 8
    assert int(sig_semi["n_events"].iloc[0]) == 1
    assert int(sig_anti["n_events"].iloc[0]) == 2


def test_kmv_closure_property(ray_session, r3d_events_dir):
    """The engine's pairwise estimate from the two bottom-k SKETCHES must
    equal the oracle's replay over the FULL distinct-hash sets — the KMV
    closure property (bottom-k of a union is contained in the union of
    bottom-k's), checked by brute force here."""
    ev = pd.read_parquet(f"{r3d_events_dir}/events.parquet")
    full = {
        src: set(_kmv_hash(g["user_id"].to_numpy()).tolist())
        for src, g in ev.groupby("event_type")
    }
    out = QUERIES["jaccard_kmv"](r3d_events_dir)
    assert len(out)
    for row in out.itertuples():
        union = sorted(full[row.src_a] | full[row.src_b])[:_KMV_K]
        n_inter = sum(
            1 for h in union if h in full[row.src_a] and h in full[row.src_b]
        )
        assert row.k_eff == len(union)
        assert row.n_inter == n_inter
        assert row.jacc_ppm == n_inter * 1_000_000 // len(union)
    # the view/error pair genuinely overlaps (5 shared users)
    ve = out[(out["src_a"] == "error") & (out["src_b"] == "view")]
    assert int(ve["n_inter"].iloc[0]) > 0


@pytest.fixture(scope="module")
def blob_embed_dir(tmp_path_factory):
    """3 well-separated Gaussian blobs (orthogonal centers, radius << gap)."""
    d = tmp_path_factory.mktemp("r3d_blobs")
    rng = np.random.default_rng(7)
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], float)
    sizes = [40, 30, 20]
    vecs, labels = [], []
    for ci, (c, s) in enumerate(zip(centers, sizes)):
        vecs.append(c + rng.normal(0, 0.1, size=(s, 4)))
        labels += [ci] * s
    m = np.vstack(vecs).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_recovers_blobs_and_converges(ray_session, blob_embed_dir):
    from tsrollup.pipelines.docqueries import q_kmeans_embeddings

    out = q_kmeans_embeddings(blob_embed_dir, n_clusters=3, n_iter=5)
    assert sorted(out["n"].tolist()) == [20, 30, 40]
    # tight blobs: per-point SSE ~ d * sigma^2 = 0.04; merged clusters would
    # be O(100s)
    assert float(out["inertia"].sum()) < 10.0
    # more Lloyd iterations never increase total inertia
    i1 = float(q_kmeans_embeddings(blob_embed_dir, 3, 1)["inertia"].sum())
    assert float(out["inertia"].sum()) <= i1 + 1e-9
    # deterministic across runs
    again = q_kmeans_embeddings(blob_embed_dir, 3, 5)
    pd.testing.assert_frame_equal(out, again)
    with pytest.raises(ValueError):
        q_kmeans_embeddings(blob_embed_dir, 3, 0)


def test_kmv_negative_user_id_rejected():
    with pytest.raises(ValueError):
        _kmv_hash(np.array([-1], dtype=np.int64))


@pytest.fixture(scope="module")
def assoc_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3d_docs")
    texts = [
        # "xx yy" always together (3x): perfect association, highest lift
        "xx yy filler one", "xx yy filler two", "pad xx yy",
        # "the cat" 3x but "the" is everywhere: high c_a drags lift down
        "the cat sat", "the cat ran", "the cat hid",
        "the dog", "the bird", "the fish", "the cow",
        # boundary trap: "qq" ends one doc, "rr" starts the next, 3 times —
        # a concatenating tokenizer would mint a phantom "qq rr" candidate
        "ends with qq", "rr starts this",
        "again qq", "rr again here",
        "third qq", "rr third time",
        # Unicode NBSP separates -> "uu vv" counted via Unicode-ws parity (3x)
        "uu\u00a0vv pad", "uu\u00a0vv pad", "uu\u00a0vv tail",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s" + str(i % 2) for i in range(len(texts))]),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_assoc_bigrams_matches_oracle(ray_session, assoc_docs_dir):
    from tsrollup.pipelines.docqueries import DOC_ORACLE_SQL, DOC_QUERIES
    import duckdb

    eng = DOC_QUERIES["assoc_bigrams"](assoc_docs_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{assoc_docs_dir}/documents.parquet')"
    )
    ora = con.execute(DOC_ORACLE_SQL["assoc_bigrams"]).df()
    assert len(eng)
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def test_top_tokens_by_source_matches_oracle(ray_session, assoc_docs_dir):
    import duckdb

    eng = QUERIES["top_tokens_by_source"](assoc_docs_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{assoc_docs_dir}/documents.parquet')"
    )
    ora = con.execute(ORACLE_SQL["top_tokens_by_source"]).df()
    assert len(eng)
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)
    # grouped top-k semantics: ranks are 1..k' per source, ties (n desc,
    # token asc) deterministic
    for _, g in eng.groupby("source"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        key = list(zip(-g["n"], g["token"]))
        assert key == sorted(key)


def test_assoc_bigrams_semantics(ray_session, assoc_docs_dir):
    from tsrollup.pipelines.docqueries import DOC_QUERIES

    out = DOC_QUERIES["assoc_bigrams"](assoc_docs_dir).to_pandas()
    pairs = set(zip(out["tok_a"], out["tok_b"]))
    assert ("qq", "rr") not in pairs          # never crosses documents
    assert ("uu", "vv") in pairs              # NBSP splits like ASCII space
    # xx/yy and uu/vv are BOTH perfect collocations (c_ab == c_a == c_b == 3)
    # -> identical maximal lift; ties break on tok_a ascending
    best = int(out["lift_ppm"].max())
    top2 = out[out["lift_ppm"] == best]
    assert set(zip(top2["tok_a"], top2["tok_b"])) == {("xx", "yy"), ("uu", "vv")}
    # "the cat": frequent left token -> strictly lower lift than the perfect pairs
    the_cat = out[(out["tok_a"] == "the") & (out["tok_b"] == "cat")]
    assert len(the_cat) and int(the_cat["lift_ppm"].iloc[0]) < best
