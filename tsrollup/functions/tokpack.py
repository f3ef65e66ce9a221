"""Token-array compression: delta + zigzag + LEB128 varint over the Arrow
ListArray layout — the tokens-payload analog of the Gorilla point codec
(delta-of-delta/XOR for rolled points, delta/varint for the raw int32
token sequences the input_hint's F1 corpus carries). Token ids are
locally smooth in synthetic and BPE-ordered vocabularies, so per-row
deltas are small and most values pack to 1-2 bytes instead of 4.

Both directions are fully vectorized over the CONCATENATED value stream
(the ListArray flat child + offsets — the same buf/starts/lengths shape
TokenBatch consumes): encode computes every value's byte length in five
comparison passes and scatters bytes by position-within-value; decode
recovers value boundaries from the continuation bits with one cumsum and
rebuilds magnitudes with one ``np.add.reduceat`` (shifted 7-bit groups
are disjoint, so ADD is OR). The only per-list work anywhere is slicing
the output buffer at list boundaries.

``encode_list`` / ``decode_list`` are the scalar executable
specification; the vectorized pair is byte-identical (property-tested in
tests/test_tokpack.py over negatives, int32 extremes, empty and
single-element lists).
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


# --- scalar executable spec -------------------------------------------------

def encode_list(vals) -> bytes:
    """Delta+zigzag+varint encode ONE token list (reference semantics)."""
    out = bytearray()
    prev = 0
    for i, v in enumerate(vals):
        d = int(v) - (prev if i else 0)
        prev = int(v)
        u = (d << 1) ^ (d >> 63) if d >= 0 else ((-d) << 1) - 1
        while True:
            b = u & 0x7F
            u >>= 7
            out.append(b | (0x80 if u else 0))
            if not u:
                break
    return bytes(out)


def decode_list(buf: bytes) -> list[int]:
    """Inverse of :func:`encode_list`."""
    vals: list[int] = []
    u = shift = 0
    prev = 0
    for b in buf:
        u |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
            continue
        d = (u >> 1) ^ -(u & 1)
        prev = (prev + d) if vals else d
        vals.append(prev)
        u = shift = 0
    return vals


# --- vectorized concat codec -------------------------------------------------

def pack_concat(vals: np.ndarray, offsets: np.ndarray):
    """Encode MANY lists in one pass. ``vals`` is the concatenated int32/
    int64 value stream, ``offsets`` the (n_lists+1,) list boundaries.
    Returns ``(buf uint8 ndarray, byte_offsets int64 ndarray)`` where list
    b's encoding is ``buf[byte_offsets[b]:byte_offsets[b+1]]``."""
    v = np.asarray(vals, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if not len(v):
        return np.empty(0, np.uint8), np.zeros(len(offsets), np.int64)
    d = np.empty(len(v), np.int64)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    starts = offsets[:-1][offsets[:-1] < offsets[1:]]  # non-empty lists
    d[starts] = v[starts]  # first value of each list is absolute
    u = ((d << 1) ^ (d >> 63)).view(np.uint64)
    nb = np.ones(len(u), np.int64)
    for t in (7, 14, 21, 28, 35, 42, 49, 56, 63):
        nb += (u >= (np.uint64(1) << np.uint64(t))).astype(np.int64)
    val_starts = np.zeros(len(u) + 1, np.int64)
    np.cumsum(nb, out=val_starts[1:])
    buf = np.zeros(val_starts[-1], np.uint8)
    for k in range(int(nb.max())):
        m = nb > k
        pos = val_starts[:-1][m] + k
        b = ((u[m] >> np.uint64(7 * k)) & _MASK7).astype(np.uint8)
        cont = ((nb[m] - 1) > k).astype(np.uint8) << 7
        buf[pos] = b | cont
    return buf, val_starts[offsets]


def unpack_concat(buf: np.ndarray, byte_offsets: np.ndarray):
    """Inverse of :func:`pack_concat`: returns ``(vals int64 ndarray,
    offsets int64 ndarray)`` in the same concatenated-list layout."""
    buf = np.asarray(buf, dtype=np.uint8)
    byte_offsets = np.asarray(byte_offsets, dtype=np.int64)
    n_lists = len(byte_offsets) - 1
    if not len(buf):
        return np.empty(0, np.int64), np.zeros(n_lists + 1, np.int64)
    term = (buf & _CONT) == 0
    # first byte index of every value: 0, then the byte after each terminator
    starts = np.concatenate(([0], np.flatnonzero(term)[:-1] + 1))
    vid = np.zeros(len(buf), np.int64)
    np.cumsum(term[:-1], out=vid[1:])
    pos = np.arange(len(buf), dtype=np.int64) - starts[vid]
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(
        np.uint64)
    u = np.add.reduceat(contrib, starts)  # 7-bit groups are disjoint
    d = ((u >> np.uint64(1)).astype(np.int64)) ^ -(
        (u & np.uint64(1)).astype(np.int64))
    # values per list = terminators before each list boundary
    term_cum = np.zeros(len(buf) + 1, np.int64)
    np.cumsum(term, out=term_cum[1:])
    offsets = term_cum[byte_offsets]
    # per-list prefix sums: global cumsum minus each list's base
    cs = np.cumsum(d)
    lens = np.diff(offsets)
    base = np.where(offsets[:-1] > 0, cs[offsets[:-1] - 1], 0)
    vals = cs - np.repeat(base, lens)
    return vals, offsets
