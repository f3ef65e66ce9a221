"""The engine's one shuffle primitive: co-locate rows by key into a bounded
number of partitions, then run a vectorized function per partition block.

Why not ``groupby(keys).aggregate(...)`` / ``map_groups``: Ray's aggregate
pays per-GROUP Python overhead in the reduce (measured ~40s for a 537k-key
combine that is ~2s of actual work), and the reduce fan-in is per-key. Here
the key space is folded into ``num_partitions`` partitions and each partition
is processed with ONE vectorized pass (np.reduceat-style) — Python cost is
O(num_partitions), data cost is one pass, and skew is decoupled from key
distribution (a hot source spreads across its buckets/windows).

Two interchangeable exchange implementations (same semantics, selected by the
session's shuffle strategy — see tsrollup.util.tune_ray_data):

- SORT (default): a ``part = hash(keys) % P`` column + ``groupby("part")
  .map_groups`` — P groups only, so the sort is over a P-valued key.
- HASH: key-based ``repartition(num_partitions, keys=...)`` (requires
  DataContext.shuffle_strategy=HASH_SHUFFLE set BEFORE datasets are built;
  note ``groupby().map_groups`` deadlocks under HASH in Ray 2.49, which is
  why the sort path is the default and the engine's own primitive never uses
  per-key map_groups).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from tsrollup.hashing import hash_strings, mix2


def hash_shuffle_enabled() -> bool:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    return DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE


def default_partitions() -> int:
    """~2 partitions per CPU, capped (each costs a task / aggregator)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, min(64, cpus * 2))


def bytes_sized_partitions(n_bytes: int, per_partition: int = 128 << 20) -> int:
    """Keyed-exchange width from the bytes actually ENTERING the exchange
    (~128 MiB per partition, clamped to [4, default_partitions()]): a keyed
    exchange costs O(P) fixed task latency regardless of volume, so a small
    input must not pay cluster-wide width, while the cap keeps large inputs
    at the cluster's width. Scale ``n_bytes`` down BEFORE calling when only
    a fraction of the source columns enter the exchange — dividing the
    clamped result instead silently caps wide-cluster parallelism."""
    return max(4, min(default_partitions(), int(n_bytes) // per_partition + 1))


def _part_column(t: pa.Table, keys: Sequence[str], num_partitions: int) -> pa.Table:
    """Deterministic partition id from the key columns."""
    if t.schema.metadata:  # pandas-origin metadata is unhashable and trips
        t = t.replace_schema_metadata(None)  # Ray's block-schema dedup logging
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t[k]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # hash each distinct key once, scatter to rows — via the
            # NUL-safe factorize (bare pd.factorize merges strings that
            # differ only past a NUL byte)
            from tsrollup.hashing import safe_factorize

            codes, uniques = safe_factorize(col.to_numpy(zero_copy_only=False))
            h = hash_strings(uniques)[np.maximum(codes, 0)] if len(uniques) else np.zeros(len(codes), np.uint64)
            h[codes < 0] = np.uint64(0)  # null keys: one fixed partition
        else:
            h = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        acc = mix2(acc, h)
    return t.append_column(
        "__part", pa.array((acc % np.uint64(num_partitions)).astype(np.int64))
    )


def map_key_partitions(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    block_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Run ``block_fn`` over hash partitions; every row of a given key lands in
    exactly one invocation. ``block_fn``: pa.Table -> pa.Table, must accept an
    empty table (schema probe for empty partitions)."""
    keys = list(keys)
    P = num_partitions or default_partitions()
    if hash_shuffle_enabled():
        return ds.repartition(P, keys=keys).map_batches(
            block_fn, batch_format="pyarrow", batch_size=None
        )
    keyed = ds.map_batches(lambda t: _part_column(t, keys, P), batch_format="pyarrow")
    return keyed.groupby("__part").map_groups(
        lambda t: block_fn(t.drop_columns(["__part"])), batch_format="pyarrow"
    )


def group_slices(t: pa.Table, keys: Sequence[str]):
    """Sort a block by ``keys`` and yield one zero-copy slice per key-group."""
    if t.num_rows == 0:
        return
    t = t.sort_by([(k, "ascending") for k in keys])
    change = np.zeros(max(t.num_rows - 1, 0), dtype=bool)
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        change |= col[1:] != col[:-1]
    bounds = np.concatenate(([0], np.flatnonzero(change) + 1, [t.num_rows]))
    for i in range(len(bounds) - 1):
        yield t.slice(bounds[i], bounds[i + 1] - bounds[i])


def map_key_groups(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    fn: Callable,
    num_partitions: int | None = None,
    batch_format: str = "pyarrow",
) -> ray.data.Dataset:
    """``groupby(keys).map_groups(fn)`` semantics on the partitioned path.

    ``fn`` receives one complete key-group (pa.Table or pd.DataFrame per
    ``batch_format``) and must also handle an EMPTY input (empty partitions
    call it once to establish the output schema).
    """
    keys = list(keys)

    def _block(t: pa.Table):
        outs = []
        for g in group_slices(t, keys):
            out = fn(g.to_pandas()) if batch_format == "pandas" else fn(g)
            outs.append(out)
        if not outs:
            empty = t.slice(0, 0)
            out = fn(empty.to_pandas()) if batch_format == "pandas" else fn(empty)
            outs.append(out)
        if batch_format == "pandas":
            # drop empty frames before concat (pandas deprecates concat with
            # empty entries), keeping one for the schema when ALL are empty
            nonempty = [o for o in outs if len(o)]
            df = pd.concat(nonempty or outs[:1], ignore_index=True)
            # hand Arrow (metadata-free) back to Ray: pandas schema metadata
            # is unhashable and trips Ray's block-schema dedup logging
            return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        return pa.concat_tables(outs, promote_options="default")

    return map_key_partitions(ds, keys, _block, num_partitions)


def topk_rows(
    ds: ray.data.Dataset,
    sort_cols: Sequence[str],
    descending: Sequence[bool],
    k: int,
) -> ray.data.Dataset:
    """Global top-k with a per-block prune before the sort.

    ``sort(...).limit(k)`` alone is an all-to-all exchange of EVERY row (at a
    100 TB vocabulary, the whole distinct-key space). Any row outside its own
    block's top-k cannot be in the global top-k, so each block is first cut
    to k rows — the final sort then moves at most ``blocks * k`` rows.
    Requires rows to be globally unique per key (e.g. post-groupby), which is
    what makes the per-block prune lossless."""
    order = [
        (c, "descending" if d else "ascending")
        for c, d in zip(sort_cols, descending)
    ]

    def _prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.sort_by(order).slice(0, k)

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return pruned.sort(list(sort_cols), descending=list(descending)).limit(k)


# Bloom prefilter geometry: 2^20 bits (128 KiB broadcast) x 4 hashes.
# False positives only cost exchange volume, never correctness — callers
# must either re-verify membership after the exchange (semi_join_bloom's
# complete-counts re-check) or join INNER against the real key set so
# non-members drop naturally (tpch q18/q10).
BLOOM_BITS = 1 << 20
BLOOM_K = 4


def bloom_positions(keys: np.ndarray, i: int, bits: int = BLOOM_BITS) -> np.ndarray:
    """i-th Bloom bit position per int64/uint64 key (splitmix64-mixed, salted)."""
    salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
    return (mix2(keys.astype(np.uint64), salt) % np.uint64(bits)).astype(np.int64)


def bloom_build(ds: ray.data.Dataset, col: str,
                bits: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """OR per-block Bloom bitmaps over ``ds[col]`` into one driver-side
    bitmap (uint8 array, bits/8 bytes). The only driver state is the
    FIXED-SIZE bitmap — never the key set — so this scales to any key
    cardinality; the classic bloom-join build side (ray.put the result
    and prefilter the probe side before its exchange)."""

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(bits // 8, np.uint8)
        if t.num_rows:
            keys = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
            for i in range(k):
                h = bloom_positions(keys, i, bits)
                np.bitwise_or.at(bm, h >> 3, (1 << (h & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    bm = np.zeros(bits // 8, np.uint8)
    for row in ds.map_batches(_partial, batch_format="pyarrow").iter_rows():
        bm |= np.frombuffer(row["bm"], np.uint8)
    return bm


def bloom_keep(bm: np.ndarray, keys: np.ndarray,
               bits: int = BLOOM_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Membership mask for ``keys`` against a bloom_build bitmap."""
    keys = keys.astype(np.uint64)
    keep = np.ones(len(keys), bool)
    for i in range(k):
        h = bloom_positions(keys, i, bits)
        keep &= (bm[h >> 3] & (1 << (h & 7))) != 0
    return keep
