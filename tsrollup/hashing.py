"""Deterministic, vectorized 64-bit mixing (splitmix64 finalizer — public
constant set from Steele et al. / xorshift literature) used for:

- synthetic-data generation (random access by (seed, source, seq, slot) with no
  RNG state, so any chunking of the generator produces identical rows);
- order-independent rollup checksums (per-row mix summed mod 2^64 — commutative
  and associative, so partial/final combines at any parallelism agree bit-for-bit,
  cf. SURVEY §7.6);
- content hashes for dedup / LSH banding.

All functions operate on uint64 numpy arrays, wrapping mod 2^64.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
U64 = np.uint64


def mix64(x: np.ndarray | int) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=np.uint64) + _GOLDEN
        z = (z ^ (z >> U64(30))) * _M1
        z = (z ^ (z >> U64(27))) * _M2
        return z ^ (z >> U64(31))


def mix2(a, b) -> np.ndarray:
    """Combine two uint64 streams into one mixed stream."""
    with np.errstate(over="ignore"):
        return mix64(np.asarray(a, dtype=np.uint64) * _M1 + mix64(b))


def mix3(a, b, c) -> np.ndarray:
    return mix2(mix2(a, b), c)


def row_checksum(seq: np.ndarray, n_tok: np.ndarray) -> np.ndarray:
    """Per-row checksum contribution; bucket checksum = sum mod 2^64 (stored
    as wrapping int64). Derived from (seq, n_tok) — seq uniquely identifies
    doc_id within a source — so it is fully vectorizable (no string hashing in
    the hot path)."""
    return mix2(np.asarray(seq, dtype=np.uint64), np.asarray(n_tok, dtype=np.uint64))


_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_bytes(data: bytes) -> int:
    """FNV-1a for occasional scalar string hashing (manifests, config) — the
    reference semantics the vectorized batch kernels below must match
    byte-for-byte (parity-tested in tests/test_functions.py)."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _utf8_buffer(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bytes uint8, starts int64, lengths int64) of an Arrow string array.

    Accepts pa.Array / pa.ChunkedArray / any sequence of str. The flat buffer
    view is zero-copy; everything downstream indexes into it."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offs[:-1], offs[1:] - offs[:-1]


def fnv1a64_update(
    state: np.ndarray, buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Feed the bytes of string i (``buf[starts[i]:starts[i]+lengths[i]]``)
    into ``state[i]`` — FNV-1a continued, vectorized ACROSS strings: one numpy
    pass per byte *position* (strings sorted by length so the active set is a
    suffix), not one Python call per string. This is what makes batch-wide
    token/shingle hashing O(max_len) numpy ops instead of O(n_tokens) Python.
    """
    h = np.array(state, dtype=np.uint64, copy=True)
    n = len(h)
    if n == 0:
        return h
    order = np.argsort(lengths, kind="stable")
    sl = np.asarray(lengths, dtype=np.int64)[order]
    so = np.asarray(starts, dtype=np.int64)[order]
    maxlen = int(sl[-1]) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            k = int(np.searchsorted(sl, j, side="right"))
            idx = order[k:]
            b = buf[so[k:] + j].astype(np.uint64)
            h[idx] = (h[idx] ^ b) * _FNV_PRIME
    return h


def fnv1a64_update_byte(state: np.ndarray, byte: int) -> np.ndarray:
    """Feed one literal byte (e.g. the ``' '`` join separator) into every state."""
    with np.errstate(over="ignore"):
        return (np.asarray(state, dtype=np.uint64) ^ np.uint64(byte)) * _FNV_PRIME


def fnv1a64_batch(strings) -> np.ndarray:
    """FNV-1a of each string -> uint64 array (vectorized; equals
    ``fnv1a64_bytes(s.encode())`` per element)."""
    buf, starts, lengths = _utf8_buffer(strings)
    h = np.full(len(starts), _FNV_BASIS, dtype=np.uint64)
    return fnv1a64_update(h, buf, starts, lengths)


def hash_strings(arr) -> np.ndarray:
    """Deterministic FNV-1a hash of a string sequence -> uint64 (vectorized)."""
    return fnv1a64_batch(arr)


def safe_factorize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NUL-safe string factorize: (codes, uniques) like ``pd.factorize``.

    ``pd.factorize`` on object strings goes through pandas' C-string hash
    table, which terminates at NUL bytes — '\\x00' and '\\x00' + '0' collapse
    into ONE unique, silently merging distinct groups (caught by the token
    fuzz in tests/test_functions.py). The fast khash factorize is therefore
    VERIFIED with one vectorized equality pass against each row's
    representative (C-level PyUnicode compare, NUL-exact); only when a
    collapse is detected does the comparison-based ``np.unique`` path run."""
    import pandas as pd

    arr = np.asarray(arr)
    codes, uniques = pd.factorize(arr, sort=False)
    uniques = np.asarray(uniques)
    if len(arr) and len(uniques) and arr.dtype.kind in "OUS":
        m = codes >= 0  # nulls factorize to -1; don't verify those
        if not (arr[m] == uniques[codes[m]]).all():
            # comparison-based exact path, preserving pd.factorize's full
            # contract (ADVICE r2 #5): nulls stay code -1 and uniques keep
            # FIRST-APPEARANCE order — a bare np.unique would sort them and
            # give nulls a real code, silently diverging for any caller
            # that relies on either invariant.
            null = pd.isna(arr) if arr.dtype.kind == "O" else np.zeros(len(arr), bool)
            vals = arr[~null]
            su, inv = np.unique(vals, return_inverse=True)
            first_pos = np.full(len(su), len(vals), dtype=np.int64)
            np.minimum.at(first_pos, inv, np.arange(len(vals), dtype=np.int64))
            order = np.argsort(first_pos, kind="stable")
            rank = np.empty(len(su), dtype=np.int64)
            rank[order] = np.arange(len(su), dtype=np.int64)
            codes = np.full(len(arr), -1, dtype=np.int64)
            codes[~null] = rank[inv]
            uniques = su[order]
    return codes, uniques
