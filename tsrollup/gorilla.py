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


def _encode_scalar(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Reference scalar encoder (the round-1/2 implementation). Kept as the
    small-block fast path — NumPy call overhead beats the Python loop only
    past ~64 points — and as the differential-test oracle for the
    vectorized :func:`encode`."""
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


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for uint64 (0 for 0). Computed per
    32-bit half: float64 log2 is only exact for values that fit the 52-bit
    mantissa, and a 64-bit value just below 2**k can ROUND UP to 2**k and
    inflate the result — 32-bit values convert exactly, so each half is
    safe."""
    x = np.asarray(x, dtype=np.uint64)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)

    def _bl32(v: np.ndarray) -> np.ndarray:
        out = np.zeros(v.shape, np.int64)
        nz = v != 0
        if nz.any():
            out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    return np.where(hi != 0, _bl32(hi) + 32, _bl32(lo))


def _pack_bits(values: np.ndarray, widths: np.ndarray) -> bytes:
    """MSB-first bit packing of variable-width fields (the _BitWriter wire
    format), fully vectorized: each field is byte-aligned to its END bit,
    rendered as a 9-byte big-endian window (max 64-bit value + 7-bit
    misalignment), and scatter-ORed into the output. Disjoint bit ranges
    make the OR exact; zero-width fields carry value 0 and OR as no-ops.
    Precondition: values[i] < 2**widths[i]."""
    end_bits = np.cumsum(widths)  # exclusive end bit of each field
    total = int(end_bits[-1]) if len(end_bits) else 0
    out = np.zeros((total + 7) // 8 + 8, dtype=np.uint8)  # +8 scratch lead-in
    shift = ((-end_bits) % 8).astype(np.uint64)  # left shift to byte-align end
    low = values << shift  # wraps mod 2**64; overflow goes to `carry`
    # values >> (64 - shift) without the undefined >>64 at shift == 0
    carry = (values >> (np.uint64(63) - shift)) >> np.uint64(1)
    win = np.empty((len(values), 9), dtype=np.uint8)
    win[:, 0] = carry.astype(np.uint8)  # carry < 2**7: values < 2**64, shift <= 7
    win[:, 1:] = low.byteswap().view(np.uint8).reshape(-1, 8)  # big-endian
    # field's window covers stream bytes [last-8, last]; +8 scratch offset
    last_byte = (end_bits - 1) // 8
    pos = last_byte[:, None] + np.arange(9)[None, :]
    np.bitwise_or.at(out, pos.ravel(), win.ravel())
    return out[8:].tobytes()


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64 timestamps + float64 values into one binary
    block — byte-identical to :func:`_encode_scalar`, but batch-vectorized:
    delta-of-delta bucketing, XOR lead/trail analysis and the bit packing
    all run as NumPy kernels. The only remaining per-point Python is the
    Gorilla prev-window state machine (inherently sequential), reduced to
    plain-int compares over precomputed arrays on the nonzero-XOR subset."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    if n < 128:  # NumPy fixed overhead dominates below this (measured)
        return _encode_scalar(ts, vals)
    return encode_concat(ts, vals, np.array([0, n], dtype=np.int64))[0]


def encode_concat(ts: np.ndarray, vals: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Encode MANY blocks in one vectorized pass: ``offsets`` delimits blocks
    in the concatenated ``ts``/``vals`` (Arrow ListArray layout — block b is
    ``[offsets[b], offsets[b+1])``). Field computation (delta-of-delta
    buckets, XOR lead/trail) runs over ALL blocks' points at once with the
    per-block chain resets applied by index surgery; the bit packing is ONE
    :func:`_pack_bits` call over a byte-aligned concatenated stream that is
    then sliced per block. Byte-identical to per-block :func:`_encode_scalar`.
    The only per-block Python left is slicing out each result's bytes."""
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    B = len(offsets) - 1
    n_b = np.diff(offsets)  # points per block
    bits_all = vals.view(np.uint64)

    # headers: n, then (ts0, v0) for non-empty blocks
    head_n = n_b.astype("<u4").tobytes()  # 4B each, little-endian
    first = offsets[:-1].clip(max=len(ts) - 1 if len(ts) else 0)
    head_tv = np.empty((B, 2), dtype="<i8")
    head_tv[:, 0] = ts[first] if len(ts) else 0
    head_tv[:, 1] = bits_all[first].view(np.int64) if len(ts) else 0

    # encoded points: every point except each block's first
    e_b = np.maximum(n_b - 1, 0)  # encoded points per block
    enc_starts = np.concatenate(([0], np.cumsum(e_b)))  # in encoded domain
    E = int(enc_starts[-1])
    if E == 0:
        out = []
        for b in range(B):
            h = head_n[4 * b : 4 * b + 4]
            if n_b[b] >= 1:
                h += head_tv[b].tobytes()
            out.append(h)
        return out
    # global index of each encoded point (skip block-first points)
    pos = np.arange(E) + np.repeat(offsets[:-1] + 1 - enc_starts[:-1], e_b)

    # --- timestamps: delta-of-delta with per-block chain reset
    deltas = ts[pos] - ts[pos - 1]
    prev_delta = np.empty(E, dtype=np.int64)
    prev_delta[1:] = deltas[:-1]
    prev_delta[enc_starts[:-1][e_b > 0]] = 0  # chain restarts at each block
    dod = deltas - prev_delta
    zz = ((dod << 1) ^ (dod >> 63)).view(np.uint64)
    c0 = dod == 0
    c1 = (dod >= -63) & (dod <= 64)
    c2 = (dod >= -255) & (dod <= 256)
    c3 = (dod >= -2047) & (dod <= 2048)
    cases = [c0, c1, c2, c3]
    f1_val = np.select(cases, [0, 0b10, 0b110, 0b1110], 0b1111).astype(np.uint64)
    f1_bits = np.select(cases, [1, 2, 3, 4], 4)
    f2_val = np.select(
        cases,
        [
            np.zeros(E, np.uint64),
            (dod + 63).astype(np.uint64),
            (dod + 255).astype(np.uint64),
            (dod + 2047).astype(np.uint64),
        ],
        zz,
    )
    f2_bits = np.select(cases, [0, 7, 9, 12], 64)

    # --- values: XOR fields with per-block window reset
    xor = bits_all[pos] ^ bits_all[pos - 1]
    idx = np.nonzero(xor)[0]
    f3_val = np.zeros(E, dtype=np.uint64)  # xor == 0 -> single '0' bit
    f3_bits = np.ones(E, dtype=np.int64)
    f4_val = np.zeros(E, dtype=np.uint64)
    f4_bits = np.zeros(E, dtype=np.int64)
    if len(idx):
        xnz = xor[idx]
        lead = np.minimum(64 - _bit_length_u64(xnz), 31)
        trail = _bit_length_u64(xnz & (~xnz + np.uint64(1))) - 1
        # prev-window state machine (inherently sequential): plain-int
        # compares over the nonzero-XOR subset, resetting at block edges
        blk_of = np.searchsorted(enc_starts, idx, side="right")  # 1-based
        use_prev = np.zeros(len(idx), dtype=bool)
        sh = np.empty(len(idx), dtype=np.int64)  # right shift applied to xor
        ml = np.empty(len(idx), dtype=np.int64)  # payload width emitted
        pl, pt, pb = -1, 65, -1  # prev lead / prev trail / its block
        for j, (ld, tr, bk) in enumerate(
            zip(lead.tolist(), trail.tolist(), blk_of.tolist())
        ):
            if bk != pb:
                pl, pt, pb = -1, 65, bk
            if ld >= pl >= 0 and tr >= pt:
                use_prev[j] = True
                sh[j] = pt
                ml[j] = 64 - pl - pt
            else:
                sh[j] = tr
                ml[j] = 64 - ld - tr
                pl, pt = ld, tr
        v11 = (
            np.uint64(0b11 << 11)
            | (lead.astype(np.uint64) << np.uint64(6))
            | (ml.astype(np.uint64) - np.uint64(1))
        )
        f3_val[idx] = np.where(use_prev, np.uint64(0b10), v11)
        f3_bits[idx] = np.where(use_prev, 2, 13)
        f4_val[idx] = xnz >> sh.astype(np.uint64)
        f4_bits[idx] = ml

    fvals = np.empty(4 * E, dtype=np.uint64)
    fbits = np.empty(4 * E, dtype=np.int64)
    fvals[0::4], fvals[1::4], fvals[2::4], fvals[3::4] = f1_val, f2_val, f3_val, f4_val
    fbits[0::4], fbits[1::4], fbits[2::4], fbits[3::4] = f1_bits, f2_bits, f3_bits, f4_bits

    # byte-align each block's stream with a zero-valued pad field so ONE
    # _pack_bits call packs everything and per-block slices are byte-exact
    # (zero pad bits == _BitWriter's final-byte zero padding)
    fb4 = 4 * enc_starts  # block boundaries in field domain
    cum = np.concatenate(([0], np.cumsum(fbits)))
    blk_bits = np.diff(cum[fb4])  # bits per block
    pad = (-blk_bits) % 8
    ins = fb4[1:]  # insert AFTER each block's last field
    fvals = np.insert(fvals, ins, np.zeros(B, np.uint64))
    fbits = np.insert(fbits, ins, pad)
    packed = _pack_bits(fvals, fbits)
    byte_ends = np.cumsum((blk_bits + pad) // 8)
    byte_starts = np.concatenate(([0], byte_ends[:-1]))

    out = []
    bs, be = byte_starts.tolist(), byte_ends.tolist()
    htv = head_tv.tobytes()
    for b in range(B):
        if n_b[b] == 0:
            out.append(head_n[4 * b : 4 * b + 4])
        else:
            out.append(
                head_n[4 * b : 4 * b + 4] + htv[16 * b : 16 * b + 16] + packed[bs[b] : be[b]]
            )
    return out


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
    """Batch entry point: encode each (timestamps, values) pair in one
    vectorized :func:`encode_concat` pass (typical blocks are ~10² points —
    far below the single-block vectorization crossover, so batching ACROSS
    blocks is where the per-point Python loop actually disappears)."""
    ts_parts = [np.asarray(t, dtype=np.int64) for t in ts_lists]
    val_parts = [np.asarray(v, dtype=np.float64) for v in val_lists]
    offsets = np.zeros(len(ts_parts) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in ts_parts], out=offsets[1:])
    ts = np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
    vals = np.concatenate(val_parts) if val_parts else np.empty(0, np.float64)
    return encode_concat(ts, vals, offsets)


def _gather_bits(data: np.ndarray, offs: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Vectorized variable-width MSB-first bit extraction — the exact
    reverse of :func:`_pack_bits`' 9-byte window: for each element, read the
    9 bytes covering bits [offs, offs+71), assemble the 64-bit window that
    starts AT the offset, and keep its top ``widths`` bits. ``data`` must be
    padded with >= 16 zero bytes past the last real bit so speculative reads
    never index out of bounds. widths in [0, 64]; width 0 returns 0."""
    offs = np.asarray(offs, dtype=np.int64)
    w = np.asarray(widths, dtype=np.uint64)
    b = offs >> 3
    sh = (offs & 7).astype(np.uint64)
    mat = data[b[:, None] + np.arange(9)]
    hi = mat[:, 0].astype(np.uint64)
    for k in range(1, 8):
        hi = (hi << np.uint64(8)) | mat[:, k]
    lo8 = mat[:, 8].astype(np.uint64)
    win = (hi << sh) | ((lo8 >> (np.uint64(7) - sh)) >> np.uint64(1))
    out = win >> ((np.uint64(64) - w) % np.uint64(64))
    return np.where(w == 0, np.uint64(0), out)


def _seg_cumsum(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum of the flat array ``x`` (segment s is
    [starts[s], starts[s+1])) — one global cumsum + one repeat."""
    cs = np.cumsum(x)
    base = np.zeros(len(starts) - 1, dtype=cs.dtype)
    if len(starts) > 2:
        base[1:] = cs[np.maximum(starts[1:-1] - 1, 0)]
        base[1:][starts[1:-1] == 0] = 0  # all-empty prefix
    return cs - np.repeat(base, np.diff(starts))


def _seg_xor_accumulate(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment prefix XOR (the value-chain inverse: bits[i] =
    bits[i-1] ^ xor[i]) — one global xor-accumulate + one repeat."""
    xs = np.bitwise_xor.accumulate(x)
    base = np.zeros(len(starts) - 1, dtype=xs.dtype)
    if len(starts) > 2:
        base[1:] = xs[np.maximum(starts[1:-1] - 1, 0)]
        base[1:][starts[1:-1] == 0] = 0
    return xs ^ np.repeat(base, np.diff(starts))


def decode_concat(blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY Gorilla blocks in one vectorized pass (round-3 VERDICT
    item #6 — the encode_concat bit-window technique in reverse). Returns
    ``(ts, vals, offsets)`` in the Arrow ListArray layout encode_concat
    consumes: block b decodes to ``ts[offsets[b]:offsets[b+1]]`` /
    ``vals[...]``.

    A bitstream's field boundaries depend on decoded tags, so single-block
    decode is inherently sequential — but ACROSS blocks the tag state
    machines are independent. The loop therefore runs over point index i
    in lockstep, each iteration decoding point i of EVERY still-active
    block with vectorized speculative bit-window gathers (reads past a
    block's final field land in the next block's bytes but are case-masked
    before use, so they never affect output). Python cost is O(max block
    length); vector work is O(total points). Timestamp and value chains
    are then rebuilt with segmented cumsum / prefix-XOR — no per-point
    Python anywhere."""
    B = len(blocks)
    n_b = np.zeros(B, dtype=np.int64)
    t0 = np.zeros(B, dtype=np.int64)
    v0 = np.zeros(B, dtype=np.uint64)
    pay_off = np.zeros(B, dtype=np.int64)  # bit offset of payload start
    parts = []
    cur_bytes = 0
    for b, blk in enumerate(blocks):
        n = struct.unpack_from("<I", blk, 0)[0]
        n_b[b] = n
        if n >= 1:
            t0[b] = struct.unpack_from("<q", blk, 4)[0]
            v0[b] = struct.unpack_from("<Q", blk, 12)[0]
        if n >= 2:
            pay_off[b] = cur_bytes * 8
            parts.append(blk[20:])
            cur_bytes += len(blk) - 20
    out_offsets = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(n_b, out=out_offsets[1:])
    N = int(out_offsets[-1])
    ts = np.empty(N, dtype=np.int64)
    vals = np.empty(N, dtype=np.float64)
    bits = vals.view(np.uint64)
    has = n_b >= 1
    ts[out_offsets[:-1][has]] = t0[has]
    bits[out_offsets[:-1][has]] = v0[has]

    e_b = np.maximum(n_b - 1, 0)
    enc_starts = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(e_b, out=enc_starts[1:])
    E = int(enc_starts[-1])
    if E == 0:
        return ts, vals, out_offsets

    data = np.frombuffer(b"".join(parts) + b"\x00" * 16, dtype=np.uint8)
    dod_flat = np.zeros(E, dtype=np.int64)
    xor_flat = np.zeros(E, dtype=np.uint64)

    cursor = pay_off.copy()
    prev_lead = np.full(B, -1, dtype=np.int64)
    prev_mlen = np.full(B, -1, dtype=np.int64)
    max_n = int(n_b.max())
    for i in range(1, max_n):
        act = np.nonzero(n_b > i)[0]
        enc_idx = enc_starts[act] + (i - 1)
        m = len(act)
        # --- timestamp: speculative 4-bit tag read; the leading-ones count
        # decides the bucket, and garbage bits past the real (shorter) tag
        # can never change it (each case is decided before they're reached)
        cur = cursor[act]
        tag4 = _gather_bits(data, cur, np.full(m, 4, np.int64)).astype(np.int64)
        ones = np.select(
            [tag4 < 0b1000, tag4 < 0b1100, tag4 < 0b1110, tag4 < 0b1111],
            [0, 1, 2, 3], 4)
        consumed = np.minimum(ones + 1, 4)
        w = np.select([ones == 0, ones == 1, ones == 2, ones == 3],
                      [0, 7, 9, 12], 64)
        payload = _gather_bits(data, cur + consumed, w)
        p64 = payload.astype(np.int64)  # zigzag payload < 2^64 viewed signed
        unzig = (payload >> np.uint64(1)).astype(np.int64) ^ -(p64 & 1)
        dod_flat[enc_idx] = np.select(
            [ones == 0, ones == 1, ones == 2, ones == 3],
            [np.zeros(m, np.int64), p64 - 63, p64 - 255, p64 - 2047], unzig)
        cur = cur + consumed + w

        # --- value: speculative 2-bit tag, then speculative lead/mlen
        t2 = _gather_bits(data, cur, np.full(m, 2, np.int64)).astype(np.int64)
        is_zero = t2 < 0b10
        is_new = t2 == 0b11
        lead_new = _gather_bits(data, cur + 2, np.full(m, 5, np.int64)).astype(np.int64)
        mlen_new = _gather_bits(data, cur + 7, np.full(m, 6, np.int64)).astype(np.int64) + 1
        lead = np.where(is_new, lead_new, prev_lead[act])
        mlen = np.where(is_new, mlen_new, prev_mlen[act])
        hdr = np.where(is_zero, 1, np.where(is_new, 13, 2))
        pw = np.where(is_zero, 0, mlen)
        payload = _gather_bits(data, cur + hdr, pw)
        shift = np.clip(64 - lead - mlen, 0, 63).astype(np.uint64)
        xor_flat[enc_idx] = np.where(is_zero, np.uint64(0), payload << shift)
        upd = act[is_new]
        prev_lead[upd] = lead_new[is_new]
        prev_mlen[upd] = mlen_new[is_new]
        cursor[act] = cur + hdr + pw

    # --- rebuild chains: delta = cumsum(dod), ts = t0 + cumsum(delta),
    # bits = v0 ^ prefix-xor(xor) — all segmented, no per-point Python
    deltas = _seg_cumsum(dod_flat, enc_starts)
    toff = _seg_cumsum(deltas, enc_starts)
    xacc = _seg_xor_accumulate(xor_flat, enc_starts)
    pos = np.arange(E) + np.repeat(out_offsets[:-1] + 1 - enc_starts[:-1], e_b)
    ts[pos] = np.repeat(t0, e_b) + toff
    bits[pos] = np.repeat(v0, e_b) ^ xacc
    return ts, vals, out_offsets
