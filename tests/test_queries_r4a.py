"""Round-4 kernel hardening tests.

1. The vectorized bigram-association kernels (_lift_table / _g2_table,
   round-3 verdict item #1) must be value-identical to a straight-line
   Python reference on both the int64 fast lane and the object-dtype
   bignum lane.
2. The _ln_fp fixed point must mirror DuckDB's HUGEINT->DOUBLE rounding
   (ADVICE r3 medium): math.log of float(x), not of the exact integer,
   once x >= 2^53.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from tsrollup.pipelines.docqueries import _g2_table, _lift_table, _ln_fp


def _ref_ln_fp(x: int) -> int:
    # DuckDB LN computes on DOUBLE: round the integer to double first
    return math.floor(math.log(float(x)) * 1_000_000_000)


def _ref_lift(c_ab, c_a, c_b, n):
    return [int(ab) * n * 1_000_000 // (int(a) * int(b))
            for ab, a, b in zip(c_ab, c_a, c_b)]


def _ref_g2(c_ab, c_a, c_b, n):
    """Round-3's per-candidate loop (the pre-vectorization oracle),
    with the float-cast ln contract applied."""
    keep, fps = [], []
    for ab, a, b in zip(c_ab, c_a, c_b):
        a, b, ab = int(a), int(b), int(ab)
        if a >= n or b >= n:
            keep.append(False)
            fps.append(0)
            continue
        cells = ((ab, a, b), (a - ab, a, n - b),
                 (b - ab, n - a, b), (n - a - b + ab, n - a, n - b))
        g2 = 0
        for o, r, c in cells:
            if o > 0:
                g2 += o * (_ref_ln_fp(o * n) - _ref_ln_fp(r * c))
        keep.append(True)
        fps.append(2 * g2)
    return keep, fps


def _cand_table(rng, m, n):
    """Random valid candidate rows: c_ab <= min(c_a, c_b), marginals
    consistent with a corpus of n tokens (all four cells non-negative)."""
    c_a = rng.integers(1, max(2, n // 3), size=m)
    c_b = rng.integers(1, max(2, n // 3), size=m)
    c_ab = np.minimum(np.minimum(c_a, c_b),
                      rng.integers(1, max(2, n // 4), size=m))
    toks = [f"t{i}" for i in range(m)]
    return pa.table({
        "tok_a": pa.array(toks, pa.string()),
        "tok_b": pa.array([s + "x" for s in toks], pa.string()),
        "c_ab": pa.array(c_ab, pa.int64()),
        "c_a": pa.array(c_a, pa.int64()),
        "c_b": pa.array(c_b, pa.int64()),
    })


@pytest.mark.parametrize("n_total", [1_000, 50_000_000,
                                     # bignum lane: n^2 >= 2^63
                                     4_000_000_000])
def test_lift_table_matches_reference(n_total):
    rng = np.random.default_rng(7)
    t = _cand_table(rng, 300, n_total)
    out = _lift_table(t, n_total)
    ref = _ref_lift(t["c_ab"].to_pylist(), t["c_a"].to_pylist(),
                    t["c_b"].to_pylist(), n_total)
    assert out["lift_ppm"].to_pylist() == ref
    assert out["tok_a"].to_pylist() == t["tok_a"].to_pylist()


def test_lift_table_overflow_is_loud():
    # int64 OUTPUT overflow must raise, never wrap
    t = pa.table({"tok_a": ["a"], "tok_b": ["b"],
                  "c_ab": pa.array([2**40], pa.int64()),
                  "c_a": pa.array([1], pa.int64()),
                  "c_b": pa.array([1], pa.int64())})
    with pytest.raises(Exception):
        _lift_table(t, 2**40)


@pytest.mark.parametrize("n_total", [1_000, 50_000_000,
                                     4_000_000_000])
def test_g2_table_matches_reference(n_total):
    rng = np.random.default_rng(11)
    t = _cand_table(rng, 300, n_total)
    # plant degenerate corpus-spanning marginals to exercise the keep mask
    t = t.set_column(t.schema.get_field_index("c_a"), "c_a",
                     pa.array([n_total] + t["c_a"].to_pylist()[1:],
                              pa.int64()))
    out = _g2_table(t, n_total)
    keep, fps = _ref_g2(t["c_ab"].to_pylist(), t["c_a"].to_pylist(),
                        t["c_b"].to_pylist(), n_total)
    ref_fps = [f for k, f in zip(keep, fps) if k]
    ref_toka = [s for k, s in zip(keep, t["tok_a"].to_pylist()) if k]
    assert out["g2_fp"].to_pylist() == ref_fps
    assert out["tok_a"].to_pylist() == ref_toka


def test_g2_table_empty_and_all_degenerate():
    empty = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                       ("c_ab", pa.int64()), ("c_a", pa.int64()),
                       ("c_b", pa.int64())]).empty_table()
    assert _g2_table(empty, 100).num_rows == 0
    deg = pa.table({"tok_a": ["a"], "tok_b": ["b"],
                    "c_ab": pa.array([5], pa.int64()),
                    "c_a": pa.array([100], pa.int64()),
                    "c_b": pa.array([5], pa.int64())})
    assert _g2_table(deg, 100).num_rows == 0


def test_ln_fp_mirrors_hugeint_to_double_cast():
    # below 2^53 float(x) is exact — the cast changes nothing
    for x in [1, 2, 3, 10, 999_983, 2**52, 2**53 - 1]:
        assert _ln_fp(x) == math.floor(math.log(float(x)) * 1_000_000_000)
    # above 2^53: the contract is float-first (round-to-nearest-double,
    # matching DuckDB's HUGEINT->DOUBLE), NOT exact-integer log
    for x in [2**53 + 1, 3**40, 12345678901234567890123]:
        assert _ln_fp(x) == math.floor(math.log(float(x)) * 1_000_000_000)


def test_ln_contract_probe():
    """The session-start libm probe (round-3 VERDICT item #4): passes on a
    healthy host, trips loudly on a poisoned log function."""
    from tsrollup.util import probe_ln_contract

    probe_ln_contract()  # healthy
    with pytest.raises(RuntimeError, match="ln contract BROKEN"):
        probe_ln_contract(log_fn=lambda x: math.log(x) + 3e-9)


def test_gorilla_compression_roundtrip_counter(ray_session):
    """The batch decode path (decode_concat) must verify round-trip on
    every committed block: roundtrip_ok == n_blocks per source."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/events.parquet"):
        pytest.skip("testdata missing")
    from tsrollup.pipelines.queries import q_gorilla_compression

    df = q_gorilla_compression(sf).to_pandas()
    assert len(df) > 0
    assert (df["roundtrip_ok"] == df["n_blocks"]).all()
    assert (df["encoded_bytes"] < df["raw_bytes"]).all()


def test_propagate_min_labels_lanes_agree(ray_session):
    """The single-task local lane and the multi-round exchange lane of
    propagate_min_labels must produce identical (node, label) tables, both
    equal to the driver union-find."""
    import pandas as pd

    from tsrollup.functions import dedup

    rng = np.random.default_rng(5)
    # several chains + cliques + singleton-free random edges
    a = rng.integers(0, 500, 800).astype(np.int64)
    b = rng.integers(0, 500, 800).astype(np.int64)
    keep = a != b
    pairs = pd.DataFrame({"a": np.minimum(a, b)[keep],
                          "b": np.maximum(a, b)[keep]})
    cc = dedup.connected_components(pairs)
    exp = (pd.DataFrame({"node": list(cc), "label": [cc[n] for n in cc]})
           .astype(np.int64).sort_values("node").reset_index(drop=True))
    for lane_kw in ({}, {"local_max_edge_rows": 0}):
        got = (dedup.propagate_min_labels(pairs, **lane_kw).to_pandas()
               .astype(np.int64).sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)
