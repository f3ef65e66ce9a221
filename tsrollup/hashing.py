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


def fnv1a64_bytes(data: bytes) -> int:
    """FNV-1a for occasional scalar string hashing (manifests, config)."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_strings(arr) -> np.ndarray:
    """Vectorized-ish deterministic hash of a string sequence -> uint64.

    Uses Python's stable iteration but C-speed bytes hashing via ``zlib.crc32``
    pairs folded through mix2 would lose entropy; instead fold FNV over a numpy
    byte view per string. Only used on small/medium batches (dedup keys).
    """
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        out[i] = fnv1a64_bytes(s.encode() if isinstance(s, str) else bytes(s))
    return out
