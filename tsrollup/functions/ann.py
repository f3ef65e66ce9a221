"""Similarity search over an embedding column (``list<float>``).

- brute-force cosine top-k: numpy matmul per batch against a driver-broadcast
  query matrix (``ray.put`` ONCE, ``ray.get`` in each actor's ``__init__`` —
  never re-shipped per batch). The exact baseline.
- LSH-bucketed (random signed projections): candidate generation via shared
  hyperplane buckets, exact re-rank inside the bucket — the scale path: the
  all-pairs matmul becomes a per-bucket matmul.
- embedding cosine near-dup: all-pairs above a threshold via the same buckets.

Projections/queries are seeded -> deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stack_embeddings(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column — zero-copy flatten."""
    arr = t.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    offs = np.asarray(arr.offsets)
    widths = np.unique(offs[1:] - offs[:-1])
    assert len(widths) == 1, f"ragged embedding column: {widths}"
    return flat.reshape(-1, int(widths[0]))


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1.0, norms)


class BruteForceTopK:
    """Actor-pool stage: cosine top-k of each batch row set against the
    broadcast query matrix; emits (query_id, vec_id, score, rank-partial).

    A final small ``groupby(query_id).map_groups`` re-ranks the per-batch
    partial top-k lists — so the full (n x q) score matrix never materializes.
    """

    def __init__(self, queries_ref, k: int, round_dp: int = 4):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = normalize_rows(np.asarray(q, dtype=np.float32))  # (nq, d)
        self.k = k
        # scores round to `round_dp` decimals: coarse enough that float32
        # accumulation-order differences (vs a SQL oracle) cannot flip a digit
        self.round_dp = round_dp

    def __call__(self, t: pa.Table) -> pa.Table:
        m = normalize_rows(stack_embeddings(t))  # (n, d)
        vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
        # round BEFORE the per-batch cut and select with the same
        # (score desc, vec_id asc) tie-break as rerank_topk / the SQL oracle:
        # an argpartition on raw float32 scores could drop a candidate tied at
        # the k-th ROUNDED score that wins the global tie-break.
        scores = np.round((m @ self.q.T).astype(np.float64), self.round_dp)  # (n, nq)
        k = min(self.k, scores.shape[0])
        nq = self.q.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        rows = np.concatenate(
            [np.lexsort((vec_ids, -scores[:, qi]))[:k] for qi in range(nq)]
        )
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(vec_ids[rows]),
                "score": pa.array(scores[rows, qid]),
            }
        )


def rerank_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final per-query exact top-k over the partial candidates; deterministic
    tie-break on (score desc, vec_id asc)."""
    g = group.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
    g = g.copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def random_hyperplanes(d: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, d)).astype(np.float32)


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Signed-projection bucket id per row (one table of 2**n_planes buckets)."""
    bits = (m @ planes.T) > 0  # (n, p)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits @ weights


def ivf_centroids(m: np.ndarray, n_centroids: int, seed: int = 42, iters: int = 5) -> np.ndarray:
    """Deterministic IVF coarse quantizer: seeded init + a few Lloyd
    iterations over (a sample of) the corpus, on normalized vectors.
    The centroid table is tiny — train on the driver (or a sampled subset),
    broadcast with ``ray.put`` like the query matrix."""
    rng = np.random.default_rng(seed)
    mn = normalize_rows(np.asarray(m, dtype=np.float32))
    idx = rng.choice(len(mn), size=min(n_centroids, len(mn)), replace=False)
    cents = mn[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mn @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mn[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = normalize_rows(cents)
    return cents


def ivf_assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid list id per row (cosine)."""
    return np.argmax(normalize_rows(m) @ centroids.T, axis=1)


def cosine_pairs_above(
    m: np.ndarray, vec_ids: np.ndarray, threshold: float
) -> pd.DataFrame:
    """All pairs (a < b) with cosine >= threshold within one bucket/batch."""
    mn = normalize_rows(m)
    s = mn @ mn.T
    a, b = np.triu_indices(len(m), k=1)
    keep = s[a, b] >= threshold
    return pd.DataFrame(
        {
            "a": vec_ids[a[keep]],
            "b": vec_ids[b[keep]],
            "score": np.round(s[a[keep], b[keep]].astype(np.float64), 6),
        }
    )


def cosine_pairs_cross(
    mi: np.ndarray,
    ids_i: np.ndarray,
    mj: np.ndarray,
    ids_j: np.ndarray,
    threshold: float,
    round_dp: int = 4,
    both_orientations: bool = False,
) -> pd.DataFrame:
    """Pairs (a < b, cosine >= threshold) between two pre-NORMALIZED chunks —
    one tile of the distributed all-pairs join (q_embed_dedup). Scores in
    float64 over float32-normalized rows, rounded to ``round_dp`` (matches the
    DuckDB oracle's CAST(list_cosine_similarity(...) AS DOUBLE) at 4dp).

    ``both_orientations=False`` (symmetric / same-chunk tiles): keep only
    ``ids_i < ids_j`` hits (each unordered pair appears once per diagonal
    tile). ``True`` (disjoint off-diagonal tiles): emit every hit oriented as
    (min, max) — ONE matmul covers the tile, instead of recomputing the
    transposed product to recover pairs whose smaller id is on the j side."""
    s = mi.astype(np.float64) @ mj.astype(np.float64).T
    r, c = np.nonzero(s >= threshold)
    a = ids_i[r]
    b = ids_j[c]
    if both_orientations:
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
    else:
        keep = a < b
        lo, hi = a[keep], b[keep]
    return pa_to_pairs_frame(lo, hi, np.round(s[r[keep], c[keep]], round_dp))


def pa_to_pairs_frame(a: np.ndarray, b: np.ndarray, score: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame({"a": a, "b": b, "score": score})


def sample_rows_parquet(path: str, columns: list[str], max_rows: int) -> "pa.Table":
    """Bounded driver-side read: stream record batches and stop at
    ``max_rows`` — never materializes the full table (IVF training / query
    selection at 100 TB reads a sample, not the corpus)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    got, n = [], 0
    for batch in pf.iter_batches(batch_size=min(max_rows, 65536), columns=columns):
        got.append(batch)
        n += batch.num_rows
        if n >= max_rows:
            break
    t = pa.Table.from_batches(got, schema=pf.schema_arrow.empty_table().select(columns).schema)
    return t.slice(0, max_rows)
