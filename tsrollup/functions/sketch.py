"""Mergeable sketches for cardinality and heavy hitters at 100 TB scale.

Both sketches follow the partial-combine shape the engine uses everywhere:
each ``map_batches`` task emits ONE tiny fixed-size partial (a few KB of
registers/counters), partials are commutative-idempotent merges, and the
driver folds the bounded set of partials — the exact aggregates these
approximate (``distinct_users``, ``top_tokens``) shuffle every distinct key,
which at 100 TB is the difference between a KB-sized reduce and an
all-to-all exchange over the full key space.

- :class:`HyperLogLog` (Flajolet et al. 2007, public algorithm): p-bit
  register index from the hash top bits, rank of the remaining bits,
  ``max`` merge, harmonic-mean estimate with the standard small-range
  linear-counting correction. 64-bit hashes need no large-range correction.
- :class:`CountMinSketch` (Cormode & Muthukrishnan 2005, public algorithm):
  depth x width counter matrix, per-row mixed indices, ``+`` merge, point
  estimate = row minimum (one-sided overestimate). Heavy hitters come from
  a per-batch exact candidate set unioned across batches and re-scored
  against the MERGED sketch.
- :class:`KLL` (Karnin, Lang & Liberty 2016, public algorithm): compactor
  stack for quantiles over an UNBOUNDED value domain — the scale path where
  the exact bounded-domain histogram (``q_quantiles``) no longer applies.
  Level i holds items of weight 2**i; a full level sorts and keeps every
  other item into level i+1. Compaction offsets are CONTENT-DERIVED (a hash
  bit of the level's bytes) instead of random, so identical inputs always
  produce the identical sketch — reproducibility over worst-case adversarial
  guarantees, the same trade the engine's salted folds make.
"""

from __future__ import annotations

import numpy as np

from tsrollup.hashing import fnv1a64_bytes, mix64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    from tsrollup.gorilla import _bit_length_u64 as bl

    return bl(x)


class HyperLogLog:
    """Fixed 2**p registers; ``add_hashes`` ingests 64-bit hashes."""

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12, regs: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8) if regs is None else regs

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        if len(h):
            idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
            rest = h << np.uint64(self.p)  # top (64-p) payload bits, left-aligned
            # rank = leading zeros of the payload + 1, capped at 64-p+1
            rank = np.minimum(64 - _bit_length_u64(rest) + 1, 64 - self.p + 1)
            np.maximum.at(self.regs, idx, rank.astype(np.uint8))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)  # standard constant for m >= 128
        e = alpha * m * m / np.sum(np.ldexp(1.0, -self.regs.astype(np.int64)))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.regs == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


class CountMinSketch:
    """depth x width int64 counters; conservative point estimate = row min."""

    __slots__ = ("depth", "width", "tab")

    def __init__(self, depth: int = 4, width: int = 1 << 16, tab: np.ndarray | None = None):
        assert width & (width - 1) == 0, "width must be a power of two"
        self.depth = depth
        self.width = width
        self.tab = np.zeros((depth, width), dtype=np.int64) if tab is None else tab

    def _rows(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        mask = np.uint64(self.width - 1)
        return np.stack(
            [(mix64(h ^ _CMS_SEEDS[j]) & mask).astype(np.int64) for j in range(self.depth)]
        )

    def add_hashes(self, h: np.ndarray, counts: np.ndarray) -> "CountMinSketch":
        if len(h):
            rows = self._rows(h)
            c = np.asarray(counts, dtype=np.int64)
            for j in range(self.depth):
                np.add.at(self.tab[j], rows[j], c)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.tab.shape == other.tab.shape
        self.tab += other.tab
        return self

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=np.int64)
        rows = self._rows(h)
        est = self.tab[0][rows[0]]
        for j in range(1, self.depth):
            est = np.minimum(est, self.tab[j][rows[j]])
        return est

    def to_bytes(self) -> bytes:
        return self.tab.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, depth: int = 4, width: int = 1 << 16) -> "CountMinSketch":
        return cls(depth, width, np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy())


_KLL_C = 2.0 / 3.0  # standard KLL capacity decay per level below the top


class KLL:
    """Deterministic KLL quantile sketch over int64 values.

    ``levels[i]`` holds UNSORTED items of weight ``2**i``; total weight is
    tracked exactly in ``n``. Capacity of level i (with H levels) is
    ``max(ceil(k * c**(H-1-i)), 8)`` — the top level always holds up to
    ``k``, lower levels geometrically less, total space O(3k) items.
    Rank error is ~O(1/k) of total weight (k=200 -> well under 1%)."""

    __slots__ = ("k", "n", "levels")

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None, n: int = 0):
        self.k = k
        self.n = n
        self.levels = levels if levels is not None else [np.zeros(0, np.int64)]

    def _cap(self, i: int) -> int:
        h = len(self.levels)
        return max(int(np.ceil(self.k * _KLL_C ** (h - 1 - i))), 8)

    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.int64)
        if len(v):
            self.n += len(v)
            self.levels[0] = np.concatenate([self.levels[0], v])
            self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            arr = self.levels[i]
            if len(arr) <= self._cap(i):
                i += 1
                continue
            arr = np.sort(arr, kind="stable")
            # content-derived coin: same items -> same compaction, always
            coin = int(fnv1a64_bytes(arr.tobytes()))
            bit = coin & 1
            if len(arr) & 1:
                # odd: one leftover stays at this level (end chosen by a
                # second content bit so neither extreme is systematically kept)
                leftover, arr = (arr[:1], arr[1:]) if (coin >> 1) & 1 else (arr[-1:], arr[:-1])
            else:
                leftover = arr[:0]
            promoted = arr[bit::2]
            self.levels[i] = leftover
            if i + 1 == len(self.levels):
                self.levels.append(np.zeros(0, np.int64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, np.int64))
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self.n += other.n
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([a for a in self.levels]) if self.levels else np.zeros(0, np.int64)
        wts = np.concatenate(
            [np.full(len(a), 1 << i, dtype=np.int64) for i, a in enumerate(self.levels)]
        ) if self.levels else np.zeros(0, np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def query(self, qs) -> np.ndarray:
        """Estimated values at quantiles ``qs`` with ``quantile_disc``
        semantics (sorted[ceil(q * W) - 1] over the weighted items)."""
        vals, wts = self._weighted()
        if not len(vals):
            return np.zeros(len(list(qs)), np.int64)
        cum = np.cumsum(wts)
        total = int(cum[-1])
        out = np.empty(len(list(qs)), dtype=np.int64)
        for j, q in enumerate(qs):
            rank = max(1, int(np.ceil(q * total)))
            out[j] = vals[np.searchsorted(cum, min(rank, total))]
        return out

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<qqq", self.k, self.n, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}q", *[len(a) for a in self.levels])
        return head + lens + b"".join(np.ascontiguousarray(a).tobytes() for a in self.levels)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        import struct

        k, n, h = struct.unpack_from("<qqq", b, 0)
        lens = struct.unpack_from(f"<{h}q", b, 24)
        off = 24 + 8 * h
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(b, dtype=np.int64, count=ln, offset=off).copy())
            off += 8 * ln
        return cls(int(k), levels, int(n))
