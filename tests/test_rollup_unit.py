"""Unit tests for the salted partial/final rollup combine and ingest derive."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tsrollup.config import EPOCH0_S, SECONDS_PER_BUCKET
from tsrollup.hashing import mix64, row_checksum
from tsrollup.ingest import derive_batch
from tsrollup.oracle import gapfill_series
from tsrollup.rollup import partial_recombine, partial_rollup


def _derived(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "source": pa.array(rng.choice(["a", "b", "hot"], n, p=[0.2, 0.2, 0.6])),
            "bucket": pa.array(rng.integers(100, 110, n)),
            "n_tok": pa.array(rng.integers(1, 500, n)),
            "chk": pa.array(rng.integers(-(2**62), 2**62, n)),
        }
    )


def test_partial_rollup_matches_pandas():
    t = _derived()
    got = partial_rollup(t).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    # reconstitute the checksum from the exact hi/lo halves
    got["chk"] = [
        np.uint64(((hi << 32) + lo) & 0xFFFFFFFFFFFFFFFF).astype(np.int64)
        for hi, lo in zip(got["chk_hi"], got["chk_lo"])
    ]
    df = t.to_pandas()
    g = df.groupby(["source", "bucket"], sort=True)
    exp = pd.DataFrame(
        {
            "n_rows": g.size(),
            "sum_tok": g["n_tok"].sum(),
            "min_tok": g["n_tok"].min().astype(np.int32),
            "max_tok": g["n_tok"].max().astype(np.int32),
            "chk": g["chk"].apply(lambda s: np.int64(s.to_numpy().sum())),
        }
    ).reset_index()
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_partial_rollup_split_invariance():
    """combine(partial(A), partial(B)) == partial(A+B) — the property that makes
    results independent of block boundaries (SURVEY §7.6)."""
    t = _derived(2000, seed=1)
    whole = partial_rollup(t)
    halves = pa.concat_tables([partial_rollup(t.slice(0, 777)), partial_rollup(t.slice(777))])
    recombined = partial_recombine(halves)
    w = whole.to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    r = recombined.to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(w, r)


def test_partial_recombine_cascade_factor():
    t = _derived(500, seed=2)
    p = partial_rollup(t)
    hourly = partial_recombine(p, bucket_factor=60).to_pandas()
    assert set(hourly["bucket"]) == {1}  # buckets 100..109 // 60
    assert hourly["n_rows"].sum() == 500


def test_derive_batch_fields():
    t = pa.table(
        {
            "doc_id": pa.array(["s1-0000000000", "s1-0000000059", "s1-0000000060"]),
            "n_tok": pa.array([5, 6, 7], type=pa.int32()),
            "source": pa.array(["s1", "s1", "s1"]),
        }
    )
    out = derive_batch(t).to_pandas()
    b0 = EPOCH0_S // SECONDS_PER_BUCKET
    assert out["bucket"].tolist() == [b0, b0, b0 + 1]
    exp_chk = row_checksum(np.array([0, 59, 60]), np.array([5, 6, 7])).view(np.int64)
    np.testing.assert_array_equal(out["chk"].to_numpy(), exp_chk)


def test_gapfill_methods():
    b = np.array([10, 11, 14, 15], dtype=np.int64)
    v = np.array([1.0, 2.0, 8.0, 9.0])
    full, lin, filled = gapfill_series(b, v, "linear")
    np.testing.assert_array_equal(full, [10, 11, 12, 13, 14, 15])
    np.testing.assert_allclose(lin, [1, 2, 4, 6, 8, 9])
    np.testing.assert_array_equal(filled, [False, False, True, True, False, False])
    _, ff, _ = gapfill_series(b, v, "ffill")
    np.testing.assert_allclose(ff, [1, 2, 2, 2, 8, 9])
    _, z, _ = gapfill_series(b, v, "zero")
    np.testing.assert_allclose(z, [1, 2, 0, 0, 8, 9])


def test_mix64_avalanche():
    a = mix64(np.arange(1000, dtype=np.uint64))
    assert len(np.unique(a)) == 1000
    bits = np.unpackbits(a.view(np.uint8))
    assert 0.45 < bits.mean() < 0.55  # roughly balanced


def test_json_source_roundtrip(ray_session, tiny_table, tmp_path):
    """JSON-lines source (S6/S7 analog) rolls up identically to parquet."""
    import json as _json

    from tsrollup.ingest import read_input_json
    from tsrollup.rollup import final_rollup
    import ray.data

    t = tiny_table.slice(0, 500)
    p = tmp_path / "in.jsonl"
    with open(p, "w") as f:
        for row in t.to_pylist():
            f.write(_json.dumps(row) + "\n")
    ds = read_input_json(str(p))
    derived = ds.map_batches(derive_batch, batch_format="pyarrow")
    rolled_json = (
        final_rollup(derived.map_batches(partial_rollup, batch_format="pyarrow"))
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    derived_pq = ray.data.from_arrow(t).map_batches(derive_batch, batch_format="pyarrow")
    rolled_pq = (
        final_rollup(derived_pq.map_batches(partial_rollup, batch_format="pyarrow"))
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rolled_json, rolled_pq)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(split=st.integers(min_value=1, max_value=1999), seed=st.integers(0, 100))
def test_partial_rollup_split_invariance_property(split, seed):
    """combine(partial(A), partial(B)) == partial(A+B) at ANY split point."""
    t = _derived(2000, seed=seed)
    whole = partial_rollup(t).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    halves = pa.concat_tables([partial_rollup(t.slice(0, split)), partial_rollup(t.slice(split))])
    rec = (
        partial_recombine(halves).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(whole, rec)


def test_fused_ingest_equals_unfused(ray_session, tiny_input_dir):
    """derived_partials_from_files (fused read->derive->partial) must produce
    the same final rollup as the unfused read_input + map_batches path."""
    import ray.data

    from tsrollup.ingest import INPUT_COLUMNS, derived_partials_from_files, read_input
    from tsrollup.rollup import final_rollup

    fused = (
        final_rollup(derived_partials_from_files(tiny_input_dir, INPUT_COLUMNS))
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    derived = read_input(tiny_input_dir, columns=INPUT_COLUMNS).map_batches(
        derive_batch, batch_format="pyarrow"
    )
    unfused = (
        final_rollup(derived.map_batches(partial_rollup, batch_format="pyarrow"))
        .to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, unfused)


def test_negative_bucket_groups_stay_distinct():
    """Round-2 regression (ADVICE rollup.py:73): the quarantine sentinel
    bucket=-1 must not merge distinct sources' groups — the composite key
    masks the bucket into the low 40 bits instead of OR-ing -1 (all bits)."""
    t = pa.table(
        {
            "source": pa.array(["a", "b", "a", "b"]),
            "bucket": pa.array([-1, -1, 5, 5], type=pa.int64()),
            "n_tok": pa.array([1, 2, 3, 4], type=pa.int64()),
            "chk": pa.array([0, 0, 0, 0], type=pa.int64()),
        }
    )
    got = partial_rollup(t).to_pandas().sort_values(["source", "bucket"]).reset_index(drop=True)
    assert len(got) == 4  # (a,-1) (a,5) (b,-1) (b,5) — no key collapse
    assert got.loc[(got.source == "a") & (got.bucket == -1), "sum_tok"].item() == 1
    assert got.loc[(got.source == "b") & (got.bucket == -1), "sum_tok"].item() == 2


def test_out_of_range_bucket_raises():
    import pytest

    from tsrollup.rollup import _BUCKET_MASK

    for bad in (-2, int(_BUCKET_MASK)):
        t = pa.table(
            {
                "source": pa.array(["a"]),
                "bucket": pa.array([bad], type=pa.int64()),
                "n_tok": pa.array([1], type=pa.int64()),
                "chk": pa.array([0], type=pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="bucket out of range"):
            partial_rollup(t)


def test_window_count_guard_detects_split():
    """Round-2 regression (ADVICE rollup.py:210): a block cut mid-window must
    raise, not silently gap-fill two partial windows."""
    import pytest

    from tsrollup.rollup import check_window_counts, with_window_counts

    t = pa.table(
        {
            "source": pa.array(["a"] * 6 + ["b"] * 2),
            "bucket": pa.array([0, 1, 2, 10, 11, 12, 3, 4], type=pa.int64()),
        }
    )
    stamped = with_window_counts(t, 10)  # windows: a/0 (3 rows), a/1 (3), b/0 (2)
    wid = stamped["bucket"].to_numpy() // 10
    check_window_counts(stamped, wid)  # complete block passes
    cut = stamped.slice(0, 5)  # cuts a/1 mid-window
    with pytest.raises(RuntimeError, match="split across blocks"):
        check_window_counts(cut, cut["bucket"].to_numpy() // 10)


def test_safe_factorize_nul_bytes_and_rollup_with_nul_source(ray_session):
    """pandas' string factorize merges strings differing only past a NUL byte
    (C-string hash table); safe_factorize must keep them distinct, and the
    full partial+final rollup must keep NUL-containing sources as separate
    groups."""
    import numpy as np
    import pyarrow as pa

    from tsrollup.hashing import safe_factorize
    from tsrollup.rollup import final_rollup, partial_rollup

    codes, uniq = safe_factorize(np.array(["\x00", "\x000", "\x00"], dtype=object))
    assert len(uniq) == 2 and codes[0] == codes[2] != codes[1]

    t = pa.table(
        {
            "source": ["s\x00a", "s\x00b", "s\x00a"],
            "bucket": [5, 5, 6],
            "n_tok": [10, 20, 30],
            "chk": [0, 0, 0],
        }
    )
    import ray.data

    rolled = final_rollup(
        ray.data.from_arrow(t).map_batches(partial_rollup, batch_format="pyarrow")
    ).to_pandas()
    # NB: pandas Series.unique() itself collapses NUL strings (same hash
    # table) — use a Python set for the check
    assert sorted(set(rolled["source"])) == ["s\x00a", "s\x00b"]
    assert int(rolled["sum_tok"].sum()) == 60
    assert len(rolled) == 3  # (s\x00a,5), (s\x00b,5), (s\x00a,6)


def test_csv_source_parses_ragged_lines_and_quarantines(ray_session, tmp_path):
    """S1 ragged-CSV source: variable-length token tails parse vectorized;
    malformed lines (missing fields / non-integer or non-integral tokens)
    fall into the quarantine channel instead of being silently dropped."""
    import numpy as np
    import pyarrow.compute as pc

    from tsrollup.ingest import QUARANTINE_SOURCE, derive_batch, read_input_csv
    from tsrollup.rollup import final_rollup, partial_rollup

    p = tmp_path / "in.csv"
    p.write_text(
        "srcA-0000000060,srcA,1 2 3\n"     # 3 tokens, bucket = (epoch0+60)//60
        "srcA-0000000120,srcA,7\n"          # 1 token
        "srcB-0000000060,srcB,\n"           # 0 tokens (valid)
        "broken-line-no-tokens-field\n"     # missing fields -> quarantine
        "srcA-0000000060,srcA,1 x 3\n"      # non-integer token -> quarantine
        "srcA-0000000060,srcA,1 3.5\n"      # non-integral token -> quarantine
        "badid,srcA,1 2\n"                  # doc_id suffix not 10 digits -> quarantine
        "srcA-0000000120,srcA,3.0 4\n"      # float-formatted integral -> quarantine
        "srcA-0000000120,srcA,1e3\n"        # scientific notation -> quarantine
        "srcA-0000000120,srcA,+5\n"         # explicit plus sign -> quarantine
    )
    derived = read_input_csv(str(p)).map_batches(derive_batch, batch_format="pyarrow")
    rolled = final_rollup(derived.map_batches(partial_rollup, batch_format="pyarrow")).to_pandas()
    q = rolled[rolled["source"] == QUARANTINE_SOURCE]
    good = rolled[rolled["source"] != QUARANTINE_SOURCE]
    assert int(q["chk"].sum()) == 7  # seven malformed lines counted
    # the three float-formatted lines must NOT have leaked into srcA's rollup
    assert set(good["source"]) == {"srcA", "srcB"}
    assert int(good["sum_tok"].sum()) == 3 + 1 + 0  # n_tok sums, not token values
    assert (good[good["source"] == "srcA"]["n_rows"].sum()) == 2
