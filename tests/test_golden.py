"""Golden end-to-end: the distributed engine must equal the single-process
oracle bit-for-bit on every tier (FIXTURES invariants 1, 2, 4)."""

import numpy as np
import pandas as pd
import pytest

from tsrollup import job, oracle
from tsrollup.config import RollupConfig


def _rolled_df(out_root, tier):
    df = job.read_tier(out_root, tier, "rolled").to_pandas()
    df = df[df.source != "__quarantine__"].reset_index(drop=True)
    return df[oracle.ROLLED_COLUMNS]


def _assert_points_equal(got: pd.DataFrame, exp: pd.DataFrame, tier: str):
    assert len(got) == len(exp), tier
    for i in range(len(exp)):
        g, e = got.iloc[i], exp.iloc[i]
        assert (g.source, g.window_id, g.start_bucket, g.n_in, g.n_filled) == (
            e.source, e.window_id, e.start_bucket, e.n_in, e.n_filled,
        ), (tier, i)
        np.testing.assert_array_equal(np.asarray(g.kept_idx), np.asarray(e.kept_idx))
        np.testing.assert_array_equal(np.asarray(g["values"]), np.asarray(e["values"]))
        assert bytes(g.gorilla) == bytes(e.gorilla), (tier, i)


@pytest.fixture(scope="module")
def run_out(ray_session, tiny_input_dir, tmp_path_factory):
    cfg = RollupConfig(out_root=str(tmp_path_factory.mktemp("golden_out")))
    results = job.run(tiny_input_dir, cfg)
    return cfg, results


@pytest.fixture(scope="module")
def golden(tiny_table):
    return oracle.pipeline(tiny_table, RollupConfig())


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_rolled_tier_bit_for_bit(run_out, golden, tier):
    cfg, _ = run_out
    got = _rolled_df(cfg.out_root, tier)
    exp = golden[f"rolled_{tier}"].reset_index(drop=True)
    for c in exp.columns:
        got[c] = got[c].astype(exp[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_points_tier_bit_for_bit(run_out, golden, tier):
    cfg, _ = run_out
    got = (
        job.read_tier(cfg.out_root, tier, "points")
        .to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    exp = golden[f"points_{tier}"]
    _assert_points_equal(got[exp.columns.tolist()], exp, tier)


def test_lineage_records_match_oracle(run_out, golden):
    cfg, results = run_out
    lin = results["1m"]["lineage"]
    exp = golden["rolled_1m"]
    for src, g in exp.groupby("source"):
        rec = lin[src]
        assert rec["row_count"] == int(g["n_rows"].sum())
        assert rec["token_sum"] == int(g["sum_tok"].sum())
        assert rec["checksum"] == int(np.int64(g["chk"].to_numpy().sum()))


def test_determinism_across_batch_sizes(ray_session, tiny_input_dir, tmp_path, golden):
    """Same input, different physical batching -> byte-identical logical output
    (FIXTURES invariant 4 / SURVEY §7.6 order-independence)."""
    cfg = RollupConfig(out_root=str(tmp_path / "out_small_batches"), batch_size=128, window_batch_size=3)
    job.run(tiny_input_dir, cfg)
    got = _rolled_df(cfg.out_root, "1m")
    exp = golden["rolled_1m"].reset_index(drop=True)
    for c in exp.columns:
        got[c] = got[c].astype(exp[c].dtype)
    pd.testing.assert_frame_equal(got, exp)
    gotp = (
        job.read_tier(cfg.out_root, "1m", "points")
        .to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    _assert_points_equal(gotp[golden["points_1m"].columns.tolist()], golden["points_1m"], "1m")


def test_tokens_invariant(ray_session, tiny_input_dir):
    """input_hint invariant: n_tok == len(tokens) on every row, checked
    streaming (no materialization)."""
    import ray.data

    from tsrollup.ingest import check_tokens_invariant

    ds = ray.data.read_parquet(tiny_input_dir)
    assert check_tokens_invariant(ds) == 0


def test_quarantine_counts(ray_session, tiny_table, tmp_path):
    """Malformed rows are counted, not silently dropped (unlike the reference's
    [] sentinel, ref core/streaming_pipeline.py:342)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = tiny_table.slice(0, 100)
    bad = pa.table(
        {
            "doc_id": pa.array(["srcXX-badsuffix!", "srcXX-0000000001"]),
            "tokens": pa.array([[1, 2, 3], [1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3, 99], type=pa.int32()),  # second row violates n_tok==len
            "source": pa.array(["srcXX", "srcXX"]),
        }
    )
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(pa.concat_tables([t, bad]), str(d / "a.parquet"))
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    res = job.run(str(d), cfg)
    assert res["1m"]["lineage"]["__quarantine__"]["quarantined_rows"] == 2


@pytest.mark.parametrize(
    "cfg_kwargs",
    [
        {"gapfill_method": "ffill"},
        {"gapfill_method": "zero"},
        {"wavelet": "haar"},
        {"detail_selector": "adaptive"},
        {"dwt_level": 2},
        {"scorer": "mlp"},
        {"wavelet": "sym4"},
        {"wavelet": "coif1"},
    ],
    ids=["ffill", "zero", "haar", "adaptive", "level2", "mlp-scorer", "sym4", "coif1"],
)
def test_config_variants_match_oracle(ray_session, tiny_input_dir, tiny_table, tmp_path, cfg_kwargs):
    """Engine == oracle bit-for-bit under alternate configurations (1m only)."""
    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",), **cfg_kwargs)
    job.run(tiny_input_dir, cfg)
    golden = oracle.pipeline(tiny_table, RollupConfig(tiers=("1m",), **cfg_kwargs))
    got = (
        job.read_tier(cfg.out_root, "1m", "points")
        .to_pandas()
        .sort_values(["source", "window_id"])
        .reset_index(drop=True)
    )
    exp = golden["points_1m"]
    _assert_points_equal(got[exp.columns.tolist()], exp, f"1m-{cfg_kwargs}")


def test_empty_input_runs_cleanly(ray_session, tmp_path):
    """An input with zero valid rows commits empty tiers instead of crashing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string()),
        }
    )
    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(empty, str(d / "a.parquet"))
    res = job.run(str(d), RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",)))
    assert res["1m"]["lineage"] == {}


def test_independent_duckdb_cross_check(ray_session, tiny_input_dir, tmp_path):
    """Oracle-independent validation: DuckDB recomputes the 1m rollup straight
    from the input parquet and diffs it against the committed tier."""
    import duckdb

    cfg = RollupConfig(out_root=str(tmp_path / "out"), tiers=("1m",))
    job.run(tiny_input_dir, cfg)
    con = duckdb.connect()
    n = con.sql(f"""
        WITH raw AS (SELECT source, (1767225600 + CAST(doc_id[-10:] AS BIGINT)) // 60 AS bucket, n_tok
                     FROM read_parquet('{tiny_input_dir}/*.parquet'))
        SELECT count(*) FROM (
          SELECT source, bucket, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                 MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok
          FROM raw GROUP BY 1, 2
          EXCEPT
          SELECT source, bucket, n_rows, sum_tok, CAST(min_tok AS INTEGER), CAST(max_tok AS INTEGER)
          FROM read_parquet('{cfg.out_root}/1m/rolled/**/*.parquet', hive_partitioning=true)
          WHERE source != '__quarantine__')
    """).fetchone()[0]
    assert n == 0
