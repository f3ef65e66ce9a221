"""Token-array varint codec: vectorized-vs-scalar byte parity and exact
round-trips over adversarial value shapes (int32 extremes, negatives,
empty / single-element lists, long runs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsrollup.functions import tokpack as tp


def _concat(lists):
    offsets = np.zeros(len(lists) + 1, np.int64)
    if lists:
        np.cumsum([len(x) for x in lists], out=offsets[1:])
    vals = (np.concatenate([np.asarray(x, np.int64) for x in lists])
            if lists else np.empty(0, np.int64))
    return vals, offsets


@pytest.mark.parametrize("lists", [
    [],
    [[]],
    [[0]],
    [[2**31 - 1], [-(2**31)]],
    [[5, 5, 5, 5], [], [7]],
    [[0, 2**31 - 1, -(2**31), 0]],
    [list(range(1000))],
])
def test_roundtrip_pinned(lists):
    vals, offsets = _concat(lists)
    buf, bo = tp.pack_concat(vals, offsets)
    assert buf.tobytes() == b"".join(tp.encode_list(x) for x in lists)
    dv, do = tp.unpack_concat(buf, bo)
    assert np.array_equal(dv, vals) and np.array_equal(do, offsets)
    for i, x in enumerate(lists):
        assert tp.decode_list(buf.tobytes()[bo[i]:bo[i + 1]]) == list(x)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(
    st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=40),
    max_size=6))
def test_roundtrip_property(lists):
    vals, offsets = _concat(lists)
    buf, bo = tp.pack_concat(vals, offsets)
    assert buf.tobytes() == b"".join(tp.encode_list(x) for x in lists)
    dv, do = tp.unpack_concat(buf, bo)
    assert np.array_equal(dv, vals) and np.array_equal(do, offsets)


def test_small_deltas_compress():
    # locally smooth ids (the BPE-ordered / synthetic case): ~1 byte/value
    lists = [list(range(500, 1000))]
    vals, offsets = _concat(lists)
    buf, _ = tp.pack_concat(vals, offsets)
    assert len(buf) < 0.3 * 4 * len(vals)


def test_tokens_compress_query(ray_session):
    from tsrollup.pipelines.docqueries import q_tokens_compress

    out = q_tokens_compress("/root/testdata/sf0.001")
    assert isinstance(out, pd.DataFrame) and len(out) == 1
    r = out.iloc[0]
    assert r["rt_failures"] == 0 and r["n_docs"] > 0
    # uniform-random ids over the synth vocab pack to ~3 bytes/value
    # (ratio ~1.5); smooth/BPE-ordered corpora reach ~4x (see
    # test_small_deltas_compress). The query must at least beat raw.
    assert r["ratio"] > 1.2
