"""Batch-wide token machinery for the text/dedup operators.

Round-1 shipped per-document Python kernels (``for doc: for token: hash``)
for MinHash banding, SimHash, fingerprinting and token-id assignment — at
100 TB those loops ARE the job. This module replaces them with the
scale-safe shape (the same pattern ``rollup._group_reduce`` uses):

1. tokenize the whole batch once with ``pyarrow.compute.utf8_split_whitespace``
   — the resulting ListArray's flat utf8 child + offsets ARE the token
   buffer; no per-token Python object is ever created (verified bit-identical
   to Python ``str.split`` over the full Unicode range, modulo the empty edge
   tokens Arrow emits, which are masked out at the numpy level),
2. hash every token straight from that flat utf8 buffer (the vectorized
   FNV-1a kernel in ``tsrollup.hashing`` — one numpy pass per byte position,
   not one Python call per token; NUL-safe by construction, no string hash
   table involved),
3. segment-reduce per document (``np.minimum.reduceat`` / ``np.add.reduceat``).

Every kernel is bit-identical to its scalar counterpart in
``functions.text`` / ``functions.dedup`` (parity-tested in
tests/test_functions.py) — the scalar versions remain as the executable
specification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tsrollup.hashing import (
    _FNV_BASIS,
    fnv1a64_update,
    fnv1a64_update_byte,
    mix2,
    mix64,
)

_SPACE = 0x20


def as_string_array(texts) -> pa.Array:
    """Normalize a pd.Series / pa.Array / pa.ChunkedArray / sequence to a
    non-null Arrow string Array (nulls -> ''). The one unavoidable
    object-touching pass when the caller hands us pandas objects — document
    -level, not token-level; pyarrow-format stages skip it entirely."""
    if isinstance(texts, pd.Series):
        arr = pa.array(texts, from_pandas=True)
    elif isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(list(texts), type=pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    return arr


def split_whitespace(texts) -> pa.ListArray:
    """``list<string>`` of whitespace tokens per document, via one Arrow
    kernel call.

    Arrow's whitespace predicate equals Python ``str.isspace`` across the
    entire Unicode range (scanned exhaustively when this was written), but
    unlike ``str.split`` it emits zero-length tokens at document edges —
    callers must mask those (TokenBatch does)."""
    return pc.utf8_split_whitespace(as_string_array(texts))


class TokenBatch:
    """Whitespace tokens of a document batch, flattened + hashed once —
    entirely inside Arrow/numpy buffers; no per-token Python object exists
    at any point (the round-2 ``str.split`` + chain-flatten built one str
    per token; at 100 TB that flatten WAS the tokenize cost).

    Attributes:
        doc_lens:  (n_docs,) tokens per document
        doc_starts:(n_docs+1,) offset of each doc's first token in the flat arrays
        hashes:    (n_tokens,) uint64 FNV-1a per token (buffer-exact, NUL-safe)
        buf/starts/lengths: flat utf8 view of every token (for windowed joins)
    """

    def __init__(self, texts):
        sp = split_whitespace(texts)
        n_docs = len(sp)
        # raw per-doc token counts INCLUDING Arrow's empty edge tokens
        raw_lens = pc.list_value_length(sp).to_numpy().astype(np.int64)
        rel = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(raw_lens, out=rel[1:])
        child = sp.flatten()  # tokens in doc order; zero-copy slice of the child
        from tsrollup.hashing import _FNV_BASIS, _utf8_buffer, fnv1a64_update

        buf, tstarts, tlens = _utf8_buffer(child)
        keep = tlens > 0  # drop the empty edge tokens -> exact str.split()
        kept = np.zeros(len(keep) + 1, dtype=np.int64)
        np.cumsum(keep, out=kept[1:])
        self.doc_starts = kept[rel]
        self.doc_lens = np.diff(self.doc_starts)
        self.buf = buf
        self.starts = tstarts[keep]
        self.lengths = tlens[keep]
        self.n_tokens = int(kept[-1])
        self._child = child
        self._keep = keep
        if self.n_tokens:
            basis = np.full(self.n_tokens, _FNV_BASIS, dtype=np.uint64)
            self.hashes = fnv1a64_update(basis, buf, self.starts, self.lengths)
        else:
            self.hashes = np.zeros(0, np.uint64)

    def token_array(self) -> pa.Array:
        """The (non-empty) tokens as an Arrow StringArray, doc order —
        for downstream Arrow kernels (lower/trim/is_in/value_counts)."""
        if self.n_tokens == len(self._keep):
            return self._child
        return self._child.filter(pa.array(self._keep))

    # --- windowed join hashes (shingles / winnowing grams) ------------------

    def window_hashes(self, window: int) -> tuple[np.ndarray, np.ndarray]:
        """FNV-1a of ``' '.join(tokens[i:i+window])`` for every full window
        per document; a document with 0 < n_tok < window contributes ONE
        window over all its tokens (the scalar kernels' short-doc rule).

        Returns (hashes uint64, win_per_doc int64). Cost: ``window`` chained
        vectorized FNV passes — no per-window Python.
        """
        n_full = np.maximum(self.doc_lens - window + 1, 0)
        short = (self.doc_lens > 0) & (self.doc_lens < window)
        win_per_doc = np.where(short, 1, n_full)
        total = int(win_per_doc.sum())
        if total == 0:
            return np.zeros(0, np.uint64), win_per_doc
        # window w starts at token index win_tok0[w], size win_size[w]
        win_doc = np.repeat(np.arange(len(self.doc_lens)), win_per_doc)
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(win_per_doc)))[:-1], win_per_doc
        )
        win_tok0 = self.doc_starts[win_doc] + within
        win_size = np.where(short[win_doc], self.doc_lens[win_doc], window)

        h = np.full(total, _FNV_BASIS, dtype=np.uint64)
        maxsz = int(win_size.max())
        for i in range(maxsz):
            active = np.flatnonzero(win_size > i)
            if i > 0:
                h[active] = fnv1a64_update_byte(h[active], _SPACE)
            ti = win_tok0[active] + i
            h[active] = fnv1a64_update(
                h[active], self.buf, self.starts[ti], self.lengths[ti]
            )
        return h, win_per_doc


def segment_min(values: np.ndarray, seg_lens: np.ndarray, fill) -> np.ndarray:
    """Per-segment minimum with empty segments -> ``fill`` (reduceat can't
    express zero-length segments)."""
    out = np.full(len(seg_lens), fill, dtype=values.dtype if len(values) else np.uint64)
    nz = np.flatnonzero(seg_lens > 0)
    if len(nz) == 0:
        return out
    starts = np.concatenate(([0], np.cumsum(seg_lens)))[:-1]
    out[nz] = np.minimum.reduceat(values, starts[nz])
    return out


def minhash_signatures(tb: TokenBatch, num_perm: int = 64, k: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over k-token shingles.

    Identical to ``dedup.minhash_signature(dedup.shingle_hashes(text, k))``
    per row: duplicates don't change a min, so the scalar path's np.unique is
    skipped; empty docs get the all-max signature. mix2(seed, h) =
    mix64(seed * M1 + mix64(h)) — mix64(h) is precomputed ONCE across all
    permutations."""
    sh, win_per_doc = tb.window_hashes(k)
    n_docs = len(win_per_doc)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    seeds = mix64(np.arange(num_perm, dtype=np.uint64))
    from tsrollup.hashing import _M1

    inner = mix64(sh)  # shared across permutations
    maxu = np.iinfo(np.uint64).max
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            mixed = mix64(seeds[p] * _M1 + inner)
            sigs[:, p] = segment_min(mixed, win_per_doc, maxu)
    return sigs


def lsh_band_hashes(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 — identical to ``dedup.lsh_bands`` per row."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    folded = sigs[:, : bands * rows].reshape(n, bands, rows)
    out = folded[:, :, 0]
    for c in range(1, rows):
        out = mix2(out, folded[:, :, c])
    return out


def simhash_batch(tb: TokenBatch) -> np.ndarray:
    """(n_docs,) uint64 SimHash — identical to ``dedup.simhash`` per row:
    per-bit token votes (+1/-1), bit set where votes > 0; empty docs -> 0."""
    n_docs = len(tb.doc_lens)
    out = np.zeros(n_docs, dtype=np.uint64)
    nz = np.flatnonzero(tb.doc_lens > 0)
    if len(nz) == 0 or tb.n_tokens == 0:
        return out
    bits = (
        (tb.hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int32)
    votes = np.add.reduceat(2 * bits - 1, tb.doc_starts[:-1][nz], axis=0)  # (nz, 64)
    pos = votes > 0
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out[nz] = (pos * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def fingerprint_batch(tb: TokenBatch, window: int = 8) -> np.ndarray:
    """(n_docs,) uint64 winnowing fingerprints — identical to
    ``text.fingerprint`` per row (min rolling-window hash; short docs hash
    their full join; empty docs -> 0)."""
    h, win_per_doc = tb.window_hashes(window)
    return segment_min(h, win_per_doc, np.uint64(0))


def token_ids(tb: TokenBatch, vocab: int) -> np.ndarray:
    """(n_tokens,) int32 token ids — identical to ``text.tokenize_ids``
    flattened across the batch (use tb.doc_starts to segment)."""
    if tb.n_tokens == 0:
        return np.zeros(0, np.int32)
    return (tb.hashes % np.uint64(vocab)).astype(np.int32)


def unique_window_hashes(tb: TokenBatch, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc SORTED UNIQUE window hashes (= ``dedup.shingle_hashes`` sets),
    vectorized across the batch: one lexsort + one dedup mask, no per-doc
    np.unique calls. Returns (values uint64 concatenated, per-doc counts)."""
    h, wpd = tb.window_hashes(window)
    n_docs = len(wpd)
    if len(h) == 0:
        return h, np.zeros(n_docs, np.int64)
    doc_idx = np.repeat(np.arange(n_docs), wpd)
    order = np.lexsort((h, doc_idx))
    hs, ds = h[order], doc_idx[order]
    keep = np.ones(len(hs), dtype=bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    return hs[keep], np.bincount(ds[keep], minlength=n_docs).astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (for SimHash hamming distances)."""
    v = np.asarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[v].reshape(np.shape(x) + (8,)).sum(axis=-1).astype(np.int64)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
