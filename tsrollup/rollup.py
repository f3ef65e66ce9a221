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

# buckets occupy the low 40 bits of the composite group key; the quarantine
# sentinel (-1) masks to 2**40 - 1, so real buckets must stay strictly below
# that to avoid colliding with it.
_BUCKET_BITS = 40
_BUCKET_MASK = np.int64((1 << _BUCKET_BITS) - 1)


def _check_bucket_range(bucket: np.ndarray) -> None:
    """Valid buckets are -1 (quarantine sentinel) or [0, 2**40 - 2]: minutes
    since epoch fit in well under 40 bits for any realistic date. OR-ing an
    unmasked negative bucket into the composite key would collapse every
    (source, bucket) group into one row — so reject out-of-range loudly."""
    if len(bucket) == 0:
        return
    lo, hi = int(bucket.min()), int(bucket.max())
    if lo < -1 or hi >= int(_BUCKET_MASK):
        raise ValueError(
            f"bucket out of range [{lo}, {hi}]: must be -1 (quarantine) or in "
            f"[0, 2**{_BUCKET_BITS} - 2]; check event-time derivation"
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
    # composite key: source code in high bits, bucket masked into the low 40
    # bits (range-validated: -1 maps to 2**40-1 without touching other groups)
    _check_bucket_range(bucket)
    key = (src_codes.astype(np.int64) << np.int64(_BUCKET_BITS)) | (bucket & _BUCKET_MASK)
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
    # NUL-safe: pandas' own string factorize merges strings that differ only
    # past a NUL byte (C-string hash table) — distinct sources must never
    # merge into one rollup group
    from tsrollup.hashing import safe_factorize

    return safe_factorize(arr)


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
            # FLOOR division (numpy), not pc.divide: Arrow integer divide
            # truncates toward zero, so bucket=-1 would land in window 0
            # instead of window -1 and diverge from every other window-id
            # derivation (numpy / DuckDB floor semantics).
            b = t["bucket"].to_numpy(zero_copy_only=False)
            return t.append_column("__wkey", pa.array(b // L))

        # Finalize INSIDE the reduce (one task sees the whole partition) and
        # stamp each row with its window's row count (__wn). Downstream
        # block-local consumers (retention filter, gap-fill) validate group
        # sizes against __wn — turning a silent mid-window block split (Ray's
        # output buffer slices blocks > 1.5x target_max_block_size at
        # arbitrary row offsets) into a loud error instead of wrong gap-fill
        # spans.
        return map_key_partitions(
            partials.map_batches(_wkey, batch_format="pyarrow"),
            ["source", "__wkey"],
            lambda t: with_window_counts(
                _finalize(partial_recombine(t.drop_columns(["__wkey"]))), L
            ),
            num_partitions,
        )
    combined = map_key_partitions(
        partials, ["source", "bucket"], partial_recombine, num_partitions
    )
    return combined.map_batches(
        _finalize, batch_format="pyarrow", batch_size=FINAL_COALESCE_ROWS
    )


# --- window-completeness guard (co-partitioned fast path) -------------------

def window_group_counts(source: np.ndarray, wid: np.ndarray) -> np.ndarray:
    """Per-row size of the row's (source, window_id) group within this block."""
    codes, _ = pd_factorize(source)
    key = (codes.astype(np.int64) << np.int64(_BUCKET_BITS)) | (
        np.asarray(wid, dtype=np.int64) & _BUCKET_MASK
    )
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    return counts[inv]


def with_window_counts(t: pa.Table, window_len: int) -> pa.Table:
    """Append (or restamp) __wn = rows in this (source, bucket // L) window
    group."""
    if "__wn" in t.column_names:
        t = t.drop_columns(["__wn"])
    if t.num_rows == 0:
        return t.append_column("__wn", pa.array([], pa.int32()))
    source = t["source"].to_numpy(zero_copy_only=False)
    wid = t["bucket"].to_numpy(zero_copy_only=False) // window_len
    wn = window_group_counts(source, wid).astype(np.int32)
    return t.append_column("__wn", pa.array(wn))


def check_window_counts(t: pa.Table, wid: np.ndarray) -> None:
    """Raise if any (source, window) group in this block is smaller than the
    __wn stamped when the partition was provably complete — i.e. the block was
    split mid-window somewhere upstream."""
    if "__wn" not in t.column_names or t.num_rows == 0:
        return
    got = window_group_counts(t["source"].to_numpy(zero_copy_only=False), wid)
    exp = t["__wn"].to_numpy(zero_copy_only=False)
    if not np.array_equal(got, exp.astype(got.dtype)):
        bad = int(np.flatnonzero(got != exp)[0])
        raise RuntimeError(
            "window group split across blocks (co-partitioned fast path "
            f"invariant violated): row {bad} expects {int(exp[bad])} rows in "
            f"its (source, window) group, block holds {int(got[bad])}. "
            "Raise DataContext.target_max_block_size or lower the partition "
            "size (shuffle num_partitions) so one partition fits one block."
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
