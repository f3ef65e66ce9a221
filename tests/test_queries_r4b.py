"""Round-4 code-review fixes: the _gorilla_stats_block shape-drift fallback
lane, the Ray-job-aware minhash pair-set memo, and inspect_tier flag parsing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_gorilla_stats_fallback_lane_matches_fast_predicate():
    """When ANY row in a batch has length drift, every row is verified via
    the fallback loop — which must apply the SAME predicate as the fast
    lane: uint64 bit equality (NaN-safe) AND the timestamp identity
    ts == start_bucket + kept_idx. Pre-fix, the fallback used
    np.array_equal (NaN != NaN -> false negative) and skipped the
    timestamp check entirely (corrupted kept_idx -> false positive)."""
    from tsrollup import gorilla
    from tsrollup.pipelines.queries import _gorilla_stats_block

    sb = 1000
    k = np.array([0, 2, 5, 7], dtype=np.int64)
    ts = sb + k
    v_nan = np.array([1.5, np.nan, 2.5, 3.5])
    v_ok = np.array([1.0, 2.0, 3.0, 4.0])
    blk_nan = gorilla.encode(ts, v_nan)
    blk_ok = gorilla.encode(ts, v_ok)
    t = pa.table(
        {
            "source": pa.array(["s", "s", "s"]),
            "start_bucket": pa.array([sb] * 3, pa.int64()),
            "gorilla": pa.array([blk_nan, blk_ok, blk_ok], pa.binary()),
            # row 0: healthy block containing NaN -> must count as ok
            # row 1: length drift (stored values truncated) -> not ok,
            #        and its presence forces the fallback lane for ALL rows
            # row 2: values intact but kept_idx shifted -> timestamps
            #        disagree -> must count as NOT ok
            "values": pa.array(
                [v_nan.tolist(), v_ok.tolist()[:3], v_ok.tolist()],
                pa.list_(pa.float64()),
            ),
            "kept_idx": pa.array(
                [k.tolist(), k.tolist()[:3], (k + 1).tolist()],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = _gorilla_stats_block(t).to_pandas()
    assert out["roundtrip_ok"].tolist() == [1, 0, 0]
    # sanity: the fast lane (no drift) agrees on the same healthy rows
    fast = _gorilla_stats_block(t.take(pa.array([0, 2]))).to_pandas()
    assert fast["roundtrip_ok"].tolist() == [1, 0]


def test_minhash_pair_memo_is_job_keyed(ray_session):
    """The verified-pair Dataset memo must ride util.memoized_dataset (keyed
    on the Ray job id + file identity), not a bare lru_cache pinning
    object-store refs across Ray restarts."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata missing")
    from tsrollup.pipelines import docqueries as dq
    from tsrollup.util import _DS_MEMO

    ds1 = dq.dedup_minhash_pairs_ds(sf, 0.5)
    ds2 = dq.dedup_minhash_pairs_ds(sf, 0.5)
    assert ds1 is ds2  # memo hit inside one session
    src = os.path.realpath(os.path.join(sf, "documents.parquet"))
    keys = [k for k in _DS_MEMO if k[0] == src and k[1].startswith("minhash_pairs")]
    assert keys, "pair set must be registered in the job-keyed dataset memo"
    assert ds1.count() >= 0  # refs alive


def test_inspect_tier_flags_not_positional(tmp_path, monkeypatch, capsys):
    """`--verify-all` (any flag) must never be consumed as the tier
    positional: `inspect_tier.py <root> --verify-all` should look up the
    DEFAULT tier, not a tier literally named '--verify-all'."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import inspect_tier

    monkeypatch.setattr(
        sys, "argv", ["inspect_tier.py", str(tmp_path), "--verify-all"]
    )
    rc = inspect_tier.main()
    outp = capsys.readouterr().out
    assert rc == 1
    assert "--verify-all" not in outp  # flag did not become the tier name
    assert "'1m'" in outp  # default tier was looked up (empty manifest)


def test_bigram_marginals_lanes_agree(ray_session, monkeypatch):
    """The broadcast lane (vocab <= _BIGRAM_BCAST_MAX, single map_batches)
    and the keyed-exchange lane of _bigram_with_counts must produce the
    identical (tok_a, tok_b, c_ab, c_a, c_b) marginals table."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata missing")
    from tsrollup import util
    from tsrollup.pipelines import docqueries as dq

    def run():
        # the full-marginals memo key is lane-independent; clear it so the
        # second lane actually executes instead of returning the first's pin
        for k in [k for k in list(util._DS_MEMO)
                  if "bigram_marginals" in str(k[1])]:
            del util._DS_MEMO[k]
        full, n_total = dq._bigram_with_counts(sf, dq._ASSOC_MIN)
        df = (full.to_pandas()
              .sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
        return df, n_total

    bcast_df, bcast_n = run()
    monkeypatch.setattr(dq, "_BIGRAM_BCAST_MAX", 0)
    exch_df, exch_n = run()
    assert bcast_n == exch_n
    assert len(bcast_df) > 0
    pd.testing.assert_frame_equal(bcast_df, exch_df)
