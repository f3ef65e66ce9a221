"""Rollup: salted partial combine inside ``map_batches`` + one final
``groupby(source, bucket).aggregate`` — the engine's single wide step per tier
(SURVEY §2.7/§7.5; semantics of the reference's window mean/min/max pooling,
ref new_evaluation.py:74-94,117-137, keyed by (source, time-bucket)).

Skew strategy (north_rule "salted repartitioning"): the partial combine *is*
the salt — every input block reduces each (source, bucket) key it holds to one
partial row before the shuffle, so a hot source's rows never travel: at most
``num_blocks × distinct_keys_per_block`` partial rows move, independent of
row count per key. The final aggregate then combines a handful of partials per
key. All combined quantities are commutative/associative integer partials
(count, sum, min, max, wrapping-int64 checksum), so any combine order —
therefore any parallelism level — yields bit-identical results (SURVEY §7.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

ROLLED_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.int64()),
        ("n_rows", pa.int64()),
        ("sum_tok", pa.int64()),
        ("min_tok", pa.int32()),
        ("max_tok", pa.int32()),
        ("chk", pa.int64()),
    ]
)

PARTIAL_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("bucket", pa.int64()),
        ("n_rows", pa.int64()),
        ("sum_tok", pa.int64()),
        ("min_tok", pa.int32()),
        ("max_tok", pa.int32()),
        ("chk_hi", pa.int64()),
        ("chk_lo", pa.int64()),
    ]
)


def _split_chk(chk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split wrapping-int64 checksums into non-negative 32-bit halves whose
    int64 SUMS cannot overflow (needed because the distributed Sum must be
    exact — no silent wrap differences between numpy/Arrow/Python partials)."""
    u = np.ascontiguousarray(chk, dtype=np.int64).view(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.int64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
    return hi, lo


def _group_reduce(
    source: np.ndarray,
    bucket: np.ndarray,
    n_rows: np.ndarray,
    sum_tok: np.ndarray,
    min_tok: np.ndarray,
    max_tok: np.ndarray,
    chk_hi: np.ndarray,
    chk_lo: np.ndarray,
) -> pa.Table:
    """Vectorized grouped reduce over one in-memory batch: stable sort by
    (source, bucket), then ``np.*.reduceat`` per segment. No Python row loop."""
    src_codes, src_uniques = pd_factorize(source)
    # composite key: source code in high bits, bucket (minutes since epoch,
    # < 2^36 for any realistic date) in low bits
    key = (src_codes.astype(np.int64) << np.int64(40)) | bucket
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    seg = np.flatnonzero(np.concatenate(([True], key_s[1:] != key_s[:-1])))
    take = order[seg]
    out = pa.table(
        {
            "source": pa.array(src_uniques[src_codes[take]]),
            "bucket": pa.array(bucket[take]),
            "n_rows": pa.array(np.add.reduceat(n_rows[order], seg)),
            "sum_tok": pa.array(np.add.reduceat(sum_tok[order], seg)),
            "min_tok": pa.array(np.minimum.reduceat(min_tok[order], seg).astype(np.int32)),
            "max_tok": pa.array(np.maximum.reduceat(max_tok[order], seg).astype(np.int32)),
            "chk_hi": pa.array(np.add.reduceat(chk_hi[order], seg)),
            "chk_lo": pa.array(np.add.reduceat(chk_lo[order], seg)),
        }
    )
    return out


def pd_factorize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    codes, uniques = pd.factorize(arr, sort=False)
    return codes, np.asarray(uniques)


def partial_rollup(t: pa.Table) -> pa.Table:
    """Per-block partial combine of derived rows (source, bucket, n_tok, chk).

    Emits one row per distinct (source, bucket) in the block — the 'salted'
    pre-aggregation that bounds shuffle volume under source skew.
    """
    if t.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    source = t["source"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    n_tok = t["n_tok"].to_numpy(zero_copy_only=False)
    hi, lo = _split_chk(t["chk"].to_numpy(zero_copy_only=False))
    ones = np.ones(len(bucket), dtype=np.int64)
    return _group_reduce(
        source, bucket, ones, n_tok, n_tok.astype(np.int32), n_tok.astype(np.int32), hi, lo
    )


def partial_recombine(t: pa.Table, bucket_factor: int = 1) -> pa.Table:
    """Partial combine of already-rolled rows, optionally re-keying the bucket
    to a coarser tier (``bucket // factor``) — the cascade's map side."""
    if t.num_rows == 0:
        return PARTIAL_SCHEMA.empty_table()
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    if bucket_factor > 1:
        bucket = bucket // bucket_factor
    if "chk" in t.column_names:  # committed rolled tier rows
        hi, lo = _split_chk(t["chk"].to_numpy(zero_copy_only=False))
    else:  # partial rows (already split; sums of sums stay exact)
        hi = t["chk_hi"].to_numpy(zero_copy_only=False)
        lo = t["chk_lo"].to_numpy(zero_copy_only=False)
    return _group_reduce(
        t["source"].to_numpy(zero_copy_only=False),
        bucket,
        t["n_rows"].to_numpy(zero_copy_only=False),
        t["sum_tok"].to_numpy(zero_copy_only=False),
        t["min_tok"].to_numpy(zero_copy_only=False),
        t["max_tok"].to_numpy(zero_copy_only=False),
        hi,
        lo,
    )


def _finalize(t: pa.Table) -> pa.Table:
    """Reconstitute the wrapping-int64 checksum from the exact hi/lo sums and
    normalize output dtypes. int64 wrap == mod 2^64, so even wrapped hi-sums
    reconstitute exactly."""
    if t.num_rows == 0:
        return ROLLED_SCHEMA.empty_table()
    with np.errstate(over="ignore"):
        hi = t["chk_hi"].to_numpy(zero_copy_only=False).view(np.uint64)
        lo = t["chk_lo"].to_numpy(zero_copy_only=False).view(np.uint64)
        chk = (hi << np.uint64(32)) + lo
    return pa.table(
        {
            "source": t["source"],
            "bucket": pa.array(t["bucket"].to_numpy(zero_copy_only=False)),
            "n_rows": pa.array(t["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "sum_tok": pa.array(t["sum_tok"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "min_tok": pa.array(t["min_tok"].to_numpy(zero_copy_only=False).astype(np.int32)),
            "max_tok": pa.array(t["max_tok"].to_numpy(zero_copy_only=False).astype(np.int32)),
            "chk": pa.array(chk.view(np.int64)),
        }
    )


def final_rollup(
    partials: ray.data.Dataset,
    num_partitions: int | None = None,
    co_partition_window_len: int | None = None,
) -> ray.data.Dataset:
    """The wide step: combine partial rows by (source, bucket).

    A naive ``groupby(key).aggregate(...)`` pays per-GROUP Python overhead —
    catastrophic with millions of (source, bucket) keys (measured ~40s for a
    537k-key combine that is ~2s of actual work). Instead: COARSE hash
    partitioning into ``num_partitions`` blocks + ONE vectorized
    ``np.reduceat`` combine per block (tsrollup.rollup._group_reduce). Python
    cost is O(num_partitions); data cost is one pass. Hash partitioning also
    decouples reduce fan-in from key skew (a hot source spreads across its
    buckets).

    The exchange is :func:`tsrollup.shuffle.map_key_partitions`; the combine is
    fully vectorized per partition block — no per-group Python.

    ``co_partition_window_len``: partition by ``(source, bucket // L)`` instead
    of ``(source, bucket)`` — same-key co-location still holds (equal buckets
    share a window), and the output blocks are then COMPLETE per downsampling
    window, so the windowing stage downstream needs NO further exchange. One
    partitioning key, reused across stages.
    """
    from tsrollup.shuffle import map_key_partitions

    if co_partition_window_len:
        L = int(co_partition_window_len)

        def _wkey(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.append_column("__wkey", pc.divide(t["bucket"], pa.scalar(L, pa.int64())))

        combined = map_key_partitions(
            partials.map_batches(_wkey, batch_format="pyarrow"),
            ["source", "__wkey"],
            lambda t: partial_recombine(t.drop_columns(["__wkey"])),
            num_partitions,
        )
        # NOTE: no cross-partition coalesce here — it would merge blocks but
        # window-completeness survives concatenation, so coalescing is fine
        # for correctness; we keep blocks as-is to preserve partition count.
        return combined.map_batches(_finalize, batch_format="pyarrow")
    combined = map_key_partitions(
        partials, ["source", "bucket"], partial_recombine, num_partitions
    )
    return combined.map_batches(
        _finalize, batch_format="pyarrow", batch_size=FINAL_COALESCE_ROWS
    )


# The partial-combine stages COALESCE many small upstream blocks into large
# batches (batch_size in rows). Block count is the dominant cost of the
# downstream sort-shuffle (orchestration is O(map_blocks x reduce_blocks),
# actual data volume here is tiny) — measured 29.5s -> ~2s on a 537k-key
# combine by collapsing 274 blocks to ~8.
PARTIAL_COALESCE_ROWS = 1 << 20
FINAL_COALESCE_ROWS = 1 << 22


def rollup_1m(derived: ray.data.Dataset, batch_size: int = 65536) -> ray.data.Dataset:
    """derived rows -> rolled 1m tier."""
    partials = derived.map_batches(
        partial_rollup, batch_format="pyarrow", batch_size=PARTIAL_COALESCE_ROWS
    )
    return final_rollup(partials)


def cascade_tier(
    rolled_finer: ray.data.Dataset,
    bucket_factor: int,
    co_partition_window_len: int | None = None,
) -> ray.data.Dataset:
    """Coarser continuous aggregate from a committed finer tier (1m->1h: 60,
    1h->1d: 24). Input is already rolled (tiny), so the shuffle is trivial."""
    partials = rolled_finer.map_batches(
        lambda t: partial_recombine(t, bucket_factor),
        batch_format="pyarrow",
        batch_size=PARTIAL_COALESCE_ROWS,
    )
    return final_rollup(partials, co_partition_window_len=co_partition_window_len)
