"""Gorilla-style compression of rolled-up points: delta-of-delta timestamps +
XOR float values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 — public algorithm; no reference-repo counterpart,
required by BASELINE.json north_rule).

Pure-Python bit packing. Each encoded block holds one (source, window) worth of
kept points (~10²), so the per-point Python cost is amortized across the
Arrow-vectorized pipeline around it; ``encode_blocks`` is the batch entry point.

Timestamp branch (delta-of-delta, Gorilla §4.1.1 bucket scheme):
    '0'                      dod == 0
    '10'  + 7  bits          dod in [-63, 64]
    '110' + 9  bits          dod in [-255, 256]
    '1110'+ 12 bits          dod in [-2047, 2048]
    '1111'+ 64 bits          otherwise (engine widens the 32-bit bucket to 64)
Value branch (XOR, Gorilla §4.1.2):
    '0'                      xor == 0
    '10' + meaningful bits   fits the previous leading/trailing window
    '11' + 5b lead + 6b len + meaningful bits
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    """Byte-wise accumulator (mirror of _BitWriter): refills 8 bits at a
    time, so a read costs O(bits/8) Python ops instead of O(bits)."""

    __slots__ = ("data", "bytepos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, bits: int) -> int:
        acc, nbits, p = self.acc, self.nbits, self.bytepos
        data = self.data
        while nbits < bits:
            acc = (acc << 8) | data[p]
            p += 1
            nbits += 8
        nbits -= bits
        out = acc >> nbits
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits
        self.bytepos = p
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


_TS_BUCKETS = ((7, 64), (9, 256), (12, 2048))


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64 timestamps + float64 values into one binary block."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    header = struct.pack("<I", n)
    if n == 0:
        return header
    header += struct.pack("<q", int(ts[0])) + struct.pack("<d", float(vals[0]))
    if n == 1:
        return header

    w = _BitWriter()
    bits = vals.view(np.uint64)
    prev_delta = 0
    prev_lead, prev_mlen = -1, -1
    for i in range(1, n):
        # --- timestamp: delta of delta ---
        delta = int(ts[i]) - int(ts[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        else:
            for tag_bits, (nbits, lim) in enumerate(_TS_BUCKETS):
                if -lim + 1 <= dod <= lim:
                    w.write((1 << (tag_bits + 2)) - 2, tag_bits + 2)  # '10', '110', '1110'
                    w.write(dod + lim - 1, nbits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(_zigzag(dod), 64)
        # --- value: XOR ---
        xor = int(bits[i] ^ bits[i - 1])
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            if lead > 31:
                lead = 31
            mlen = 64 - lead - trail
            if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_mlen:
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_mlen), prev_mlen)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mlen - 1, 6)  # mlen in [1,64] stored as 0..63
                w.write(xor >> trail, mlen)
                prev_lead, prev_mlen = lead, mlen
    return header + w.getvalue()


def decode(block: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode`; exact round-trip."""
    (n,) = struct.unpack_from("<I", block, 0)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    (t0,) = struct.unpack_from("<q", block, 4)
    (v0,) = struct.unpack_from("<d", block, 12)
    ts[0], vals[0] = t0, v0
    if n == 1:
        return ts, vals

    r = _BitReader(block[20:])
    bits = vals.view(np.uint64)
    prev_delta = 0
    prev_lead, prev_mlen = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            tag_bits = 0
            while tag_bits < 3 and r.read(1) == 1:
                tag_bits += 1
            if tag_bits < 3:
                nbits, lim = _TS_BUCKETS[tag_bits]
                dod = r.read(nbits) - lim + 1
            else:
                dod = _unzigzag(r.read(64))
        prev_delta += dod
        ts[i] = ts[i - 1] + prev_delta

        if r.read(1) == 0:
            bits[i] = bits[i - 1]
        else:
            if r.read(1) == 0:
                lead, mlen = prev_lead, prev_mlen
            else:
                lead = r.read(5)
                mlen = r.read(6) + 1
                prev_lead, prev_mlen = lead, mlen
            xor = r.read(mlen) << (64 - lead - mlen)
            bits[i] = np.uint64((int(bits[i - 1]) ^ xor) & 0xFFFFFFFFFFFFFFFF)
    return ts, vals


def encode_blocks(ts_lists, val_lists) -> list[bytes]:
    """Batch entry point: encode each (timestamps, values) pair."""
    return [encode(t, v) for t, v in zip(ts_lists, val_lists)]
