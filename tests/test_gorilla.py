"""Gorilla codec: exact round-trip (FIXTURES invariant 3) + compression sanity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup import gorilla


def _roundtrip(ts, vals):
    blk = gorilla.encode(ts, vals)
    t2, v2 = gorilla.decode(blk)
    np.testing.assert_array_equal(ts, t2)
    # bit-exact float compare (NaN-safe)
    if len(vals):
        np.testing.assert_array_equal(
            np.asarray(vals, dtype=np.float64).view(np.uint64), v2.view(np.uint64)
        )
    return blk


def test_empty_single_constant():
    _roundtrip(np.array([], dtype=np.int64), np.array([]))
    _roundtrip(np.array([7], dtype=np.int64), np.array([1.5]))
    blk = _roundtrip(np.full(100, 5, dtype=np.int64), np.full(100, 2.5))
    assert len(blk) < 100  # constant series compresses hard


def test_regular_series_compresses():
    ts = np.arange(0, 20000, 60, dtype=np.int64)
    vals = np.round(np.cumsum(np.random.default_rng(0).standard_normal(len(ts))), 2)
    blk = _roundtrip(ts, vals)
    assert len(blk) < 16 * len(ts)  # beats raw (ts,val) pairs


def test_nonfinite_values_roundtrip():
    ts = np.arange(5, dtype=np.int64)
    vals = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0])
    _roundtrip(ts, vals)


def test_large_jumps():
    _roundtrip(
        np.array([0, 2**40, 2**41, 2**41 + 1], dtype=np.int64),
        np.array([1e-300, -1e300, 5.0, 5.0]),
    )


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31),
    rnd=st.integers(min_value=0, max_value=6),
)
def test_roundtrip_property(n, seed, rnd):
    rng = np.random.default_rng(seed)
    ts = np.cumsum(rng.integers(0, 5000, n)).astype(np.int64)
    vals = np.round(rng.standard_normal(n) * 10.0 ** float(rng.integers(-3, 3)), rnd)
    _roundtrip(ts, vals)


def test_encode_blocks_batch():
    pairs = [
        (np.arange(3, dtype=np.int64), np.array([1.0, 2.0, 3.0])),
        (np.array([], dtype=np.int64), np.array([])),
    ]
    blocks = gorilla.encode_blocks([p[0] for p in pairs], [p[1] for p in pairs])
    assert len(blocks) == 2
    t, v = gorilla.decode(blocks[0])
    np.testing.assert_array_equal(t, pairs[0][0])


def test_vectorized_encode_byte_identical_to_scalar():
    """encode/encode_blocks/encode_concat are batch-vectorized (round 3);
    they must stay BYTE-identical to the retained scalar reference across
    block shapes: empty, single-point, tiny, >=128 (vector dispatch),
    constant values, repeated XOR windows, non-finite."""
    rng = np.random.default_rng(123)
    parts_t, parts_v = [], []
    for L in [0, 1, 2, 3, 50, 127, 128, 400]:
        t0 = int(rng.integers(0, 10**12))
        parts_t.append(t0 + np.cumsum(rng.integers(0, 5000, L)).astype(np.int64))
        v = np.round(rng.normal(size=L), 1)
        if L >= 50:
            v[5] = np.inf
            v[6] = np.nan
            v[7:9] = 0.0
        parts_v.append(v)
    got = gorilla.encode_blocks(parts_t, parts_v)
    want = [gorilla._encode_scalar(t, v) for t, v in zip(parts_t, parts_v)]
    assert got == want
    for blk, t, v in zip(got, parts_t, parts_v):
        ts2, v2 = gorilla.decode(blk)
        assert np.array_equal(ts2, t)
        assert np.array_equal(v2.view(np.uint64), v.view(np.uint64))
    # single-block entry point dispatches to the vector path at n >= 128
    big_t, big_v = parts_t[-1], parts_v[-1]
    assert gorilla.encode(big_t, big_v) == gorilla._encode_scalar(big_t, big_v)


def test_decode_concat_matches_scalar_decode():
    """Round-4: vectorized batch decode must be bit-identical to per-block
    scalar decode across every payload shape (empty, single, constant,
    NaN/inf, 64-bit dod jumps, negative deltas, block-format edges)."""
    rng = np.random.default_rng(17)
    parts_t, parts_v = [], []
    for L in [0, 1, 2, 3, 50, 127, 128, 400]:
        t0 = int(rng.integers(0, 10**12))
        parts_t.append(t0 + np.cumsum(rng.integers(0, 5000, L)).astype(np.int64))
        v = np.round(rng.normal(size=L), 1)
        if L >= 50:
            v[5] = np.inf
            v[6] = np.nan
            v[7:9] = 0.0
            v[10:20] = 7.25  # xor == 0 run
        parts_v.append(v)
    # extreme dod: 64-bit bucket both signs + out-of-order timestamps
    parts_t.append(np.array([0, 2**40, 1, -(2**41), 5], dtype=np.int64))
    parts_v.append(np.array([1.0, -1.0, 1e300, -1e-300, 0.0]))
    blocks = gorilla.encode_blocks(parts_t, parts_v)
    ts, vals, off = gorilla.decode_concat(blocks)
    assert len(off) == len(blocks) + 1
    for b, blk in enumerate(blocks):
        et, ev = gorilla.decode(blk)
        assert np.array_equal(ts[off[b]:off[b + 1]], et)
        assert np.array_equal(vals[off[b]:off[b + 1]].view(np.uint64),
                              ev.view(np.uint64))


@settings(deadline=None, max_examples=25)
@given(
    seed=st.integers(0, 2**32 - 1),
    nblocks=st.integers(1, 24),
)
def test_decode_concat_property(seed, nblocks):
    rng = np.random.default_rng(seed)
    parts_t, parts_v = [], []
    for _ in range(nblocks):
        n = int(rng.integers(0, 120))
        step = rng.choice([1, 60, 3600, 10**6])
        t0 = int(rng.integers(-(10**9), 10**12))
        parts_t.append(t0 + np.cumsum(rng.integers(0, step + 1, n)).astype(np.int64))
        kind = rng.integers(0, 3)
        if kind == 0:
            v = np.full(n, float(rng.normal()))
        elif kind == 1:
            v = rng.normal(size=n).round(3)
        else:
            v = rng.integers(-1000, 1000, n).astype(np.float64)
        parts_v.append(v)
    blocks = gorilla.encode_blocks(parts_t, parts_v)
    ts, vals, off = gorilla.decode_concat(blocks)
    for b, blk in enumerate(blocks):
        et, ev = gorilla.decode(blk)
        assert np.array_equal(ts[off[b]:off[b + 1]], et)
        assert np.array_equal(vals[off[b]:off[b + 1]].view(np.uint64),
                              ev.view(np.uint64))
