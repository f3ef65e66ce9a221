"""Deduplication operators over a documents table.

- exact: content-hash -> hash-partitioned groupby -> keep first (min doc_id)
- minhash_lsh: shingle -> minhash -> band -> bucket groupby -> candidate pairs
  -> exact-Jaccard verify (Broder 1997 / LSH banding, MMDS ch.3 — public)
- simhash: 64-bit simhash + hamming-radius bucketing (Charikar 2002)
- ngram_jaccard: brute-force verified n-gram Jaccard for small candidate sets
- embedding cosine near-dup lives in tsrollup.functions.ann

Scale notes: every stage is a vectorized ``map_batches`` emit + one
``groupby`` on a short hash key — the canonical Ray Data dedup shape. The
candidate-pair verify joins doc texts back via a driver-broadcast dict only
when the candidate set is small; at 100 TB the verify stage would instead
re-shard pairs by doc_id (documented per-operator).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from tsrollup.hashing import fnv1a64_bytes, mix2, mix64

_WORD = re.compile(r"\S+")


def text_hash(s: str) -> int:
    return fnv1a64_bytes(s.encode())


def add_text_hash(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["text_hash"] = (
        df[text_col].fillna("").map(lambda s: fnv1a64_bytes(s.encode())).astype("uint64")
    )
    return df


def exact_keep_first(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Per text-hash group: keep the row with the smallest id (deterministic)."""
    return group.sort_values(id_col).head(1)


# --- MinHash + LSH ---------------------------------------------------------

def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles -> uint64 hash set."""
    toks = _WORD.findall(text or "")
    if len(toks) < k:
        return (
            np.array([fnv1a64_bytes(" ".join(toks).encode())], dtype=np.uint64)
            if toks
            else np.array([], dtype=np.uint64)
        )
    return np.unique(
        np.array(
            [fnv1a64_bytes(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)],
            dtype=np.uint64,
        )
    )


def minhash_signature(sh: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm min-hashes via seeded mixing (one mix per permutation).

    Vectorized: (num_perm, n_shingles) mix matrix -> row-min.
    """
    if len(sh) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = mix64(np.arange(num_perm, dtype=np.uint64))
    return mix2(seeds[:, None], sh[None, :]).min(axis=1)


def lsh_bands(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Fold the signature into ``bands`` band-hashes (rows = num_perm // bands)."""
    rows = len(sig) // bands
    folded = sig[: bands * rows].reshape(bands, rows)
    out = folded[:, 0]
    for c in range(1, rows):
        out = mix2(out, folded[:, c])
    return out


def minhash_band_rows(
    df: pd.DataFrame, text_col="text", id_col="doc_id", num_perm=64, bands=16, k=3
) -> pd.DataFrame:
    """Per doc: explode to (band_id, band_hash, doc_id) rows — the LSH shuffle key."""
    ids, band_ids, band_hashes = [], [], []
    for i, text in zip(df[id_col], df[text_col].fillna("")):
        bh = lsh_bands(minhash_signature(shingle_hashes(text, k), num_perm), bands)
        ids.extend([i] * bands)
        band_ids.extend(range(bands))
        band_hashes.extend(bh.tolist())
    return pd.DataFrame(
        {
            id_col: ids,
            "band_id": np.array(band_ids, dtype=np.int32),
            "band_hash": np.array(band_hashes, dtype=np.uint64).astype(np.int64),
        }
    )


def candidate_pairs_from_bucket(group: pd.DataFrame, id_col="doc_id") -> pd.DataFrame:
    """Per (band_id, band_hash) bucket: all id pairs (a < b)."""
    ids = np.sort(group[id_col].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []})
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a], "b": ids[b]})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


# --- SimHash ---------------------------------------------------------------

def simhash(text: str) -> np.uint64:
    """64-bit simhash over whitespace-token hashes (Charikar 2002)."""
    toks = _WORD.findall(text or "")
    if not toks:
        return np.uint64(0)
    hs = np.array([fnv1a64_bytes(t.encode()) for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(j)
    return out


def simhash_batch(df: pd.DataFrame, text_col="text") -> pd.Series:
    return df[text_col].fillna("").map(simhash).astype("uint64")


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return np.array([bin(int(v)).count("1") for v in np.ravel(x)]).reshape(np.shape(x))


def simhash_block_keys(sh: np.uint64, blocks: int = 4) -> list[int]:
    """Split the 64-bit simhash into ``blocks`` 16-bit keys — near-dups within
    hamming distance < blocks share at least one block key (pigeonhole)."""
    width = 64 // blocks
    mask = np.uint64((1 << width) - 1)
    return [
        int((np.uint64(sh) >> np.uint64(i * width)) & mask) | (i << 48) for i in range(blocks)
    ]


# --- connected components (driver-side, candidate graph is small) ----------

def connected_components(pairs: pd.DataFrame) -> dict:
    """Union-find over verified duplicate pairs -> {id: cluster_root}. Used on
    the (small) verified-pair set; at larger scale run min-label propagation
    rounds via groupby instead (documented in module docstring)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}
