"""Session tuning helpers (callable by entry points — never on import)."""

from __future__ import annotations

import logging

#: ray_remote_args for actor pools whose CONSTRUCTOR receives a broadcast
#: ObjectRef (ray.put once, ray.get in __init__): an actor restart with a
#: lost constructor ref fails anyway (ray-project/ray#53727), so restarts
#: are disabled — the autoscaling pool creates FRESH actors (which re-fetch
#: the ref from its owner) and task retry covers in-flight work. Also keeps
#: the per-pool core-worker advisory out of bench/driver logs.
BROADCAST_ACTOR_ARGS = {"max_restarts": 0}

#: worker-local cache for broadcast refs consumed by TASK-pool map_batches
_WORKER_BCAST_CACHE: dict = {}


def worker_broadcast_get(ref):
    """Worker-local cached ``ray.get`` for a broadcast ref inside a
    TASK-pool ``map_batches`` function: the first batch in each (prestarted)
    Ray worker process pays the plasma fetch/deserialize, subsequent batches
    in that worker reuse it — setup-once-per-worker semantics (SURVEY ST1)
    without per-query actor-pool spin-up, which costs ~2-4 s of fresh-actor
    process startup per call at 32 CPUs (measured on asof_join: probe
    pipeline 4.5 s as an actor pool, 0.9 s as a cached task pool). Keyed by
    the ObjectRef itself so one session serving several corpora never reads
    a stale side; bounded so long sessions cannot accumulate pins."""
    hit = _WORKER_BCAST_CACHE.get(ref)
    if hit is None:
        import ray

        while len(_WORKER_BCAST_CACHE) > 8:
            # evict the OLDEST entry (dict preserves insertion order) —
            # never the whole cache, so refs actively streamed by
            # concurrent queries stay resident instead of thrashing
            _WORKER_BCAST_CACHE.pop(next(iter(_WORKER_BCAST_CACHE)))
        hit = _WORKER_BCAST_CACHE[ref] = ray.get(ref)
    return hit


def tune_ray_data(quiet: bool = True, hash_shuffle: bool | None = None) -> None:
    """Engine session setup. Call before the first dataset of a pipeline is
    created — Ray datasets snapshot the DataContext at creation.

    ``hash_shuffle`` selects the exchange implementation used by
    tsrollup.shuffle (None -> env TSROLLUP_HASH_SHUFFLE, default off: the
    hash-shuffle operator's per-execution aggregator-actor startup costs more
    than it saves at these scales, and ``groupby().map_groups`` deadlocks
    under it in Ray 2.49). Safe to call repeatedly.
    """
    import os

    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if hash_shuffle is None:
        hash_shuffle = os.environ.get("TSROLLUP_HASH_SHUFFLE", "0") == "1"
    if hash_shuffle:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        # default 200 partitions spawns 64+ aggregator actors even on a
        # 4-CPU node (thrash); ~2 per CPU is plenty
        ctx.default_hash_shuffle_parallelism = max(4, min(64, cpus * 2))
        ctx.max_hash_shuffle_aggregators = max(4, min(32, cpus))
    if quiet:
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)


_DS_MEMO: dict = {}


def memoized_dataset(src_file: str, tag: str, build):
    """In-session materialized-dataset memo (the committed-tier idea
    in-process): ``build()`` runs once per (source-file identity, tag, Ray
    job) and later callers share the pinned result. Safe only for
    AGGREGATED intermediates whose volume is bounded (rolled tiers, token
    count folds) — never memoize data-scale datasets. Keys include file
    (size, mtime) so a regenerated corpus is never served stale, and the
    job id so refs from a dead Ray session are dropped."""
    import os

    import ray

    if not ray.is_initialized():
        return build()  # driver owns session startup; stay lazy
    st = os.stat(src_file)
    ident = (os.path.realpath(src_file), tag,
             ray.get_runtime_context().get_job_id())
    key = ident + (st.st_size, st.st_mtime_ns)
    hit = _DS_MEMO.get(key)
    if hit is None:
        # evict superseded entries for the same (path, tag, job) so a
        # regenerated corpus doesn't leave stale pins in the object store
        for k in [k for k in _DS_MEMO if k[:3] == ident]:
            del _DS_MEMO[k]
        hit = _DS_MEMO[key] = build().materialize()
    return hit


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` with schema METADATA stripped. Parquet written
    by pandas carries a ``pandas`` metadata blob that makes pa.Schema
    unhashable — every downstream schema-unify then logs 'Failed to hash the
    schemas' from the workers. Strip at the source: hand the read a
    metadata-free schema (footer-only driver peek, so the read operator's own
    blocks are already clean), plus a fused strip for whatever the fragment
    scanner re-attaches."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data

    if "schema" not in kwargs:
        try:
            frag_schema = pads.dataset(paths, format="parquet").schema
            if frag_schema.metadata:
                cols = kwargs.get("columns")
                if cols:
                    frag_schema = pa.schema([frag_schema.field(c) for c in cols])
                kwargs["schema"] = frag_schema.remove_metadata()
        except Exception:
            pass  # fall back to the post-read strip alone

    def _strip(t):
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ray.data.read_parquet(paths, **kwargs).map_batches(
        _strip, batch_format="pyarrow"
    )


# queries whose oracle hashes rest on the cross-engine fixed-point ln
# contract (floor(ln(x)*1e9) identical between CPython math.log and DuckDB
# LN) — listed so the probe's failure message names what breaks
_LN_CONTRACT_FAMILIES = (
    "source_entropy, kl_divergence_sources, unigram_logprob,"
    " source_perplexity, g2_collocations, km_survival, hill_tail,"
    " zipf_fit, pmi/collocation and Simpson/diversity fixed-point families"
)


def probe_ln_contract(log_fn=None) -> None:
    """Session-start probe of the fixed-point ln contract (round-3 VERDICT
    item #4): the engine's F(x) = floor(log(float(x)) * 1e9) must equal
    DuckDB's CAST(FLOOR(LN(x) * 1e9) AS BIGINT) on this host, else every
    oracle hash in the fixed-point families silently diverges. CPython's
    math.log and DuckDB's LN both call the platform libm here, but a
    different libm (or a poisoned/patched log) can differ by 1 ulp — this
    probe fails LOUDLY up front instead of surfacing as a mystery hash
    mismatch deep in the gate. Grid: the dense small-count range the token
    statistics actually hit, plus geometric large magnitudes up to ~1e18
    (beyond 2^53, where the float-first rounding contract kicks in).
    Cost: one DuckDB query + ~2.3k math.log calls (<100 ms)."""
    import math

    import duckdb

    log_fn = log_fn or math.log
    xs = list(range(1, 2001)) + [
        int(10 ** (k / 4)) for k in range(13, 73)
    ] + [2**53 - 1, 2**53, 2**53 + 1, 3**40, 10**18 - 11]
    con = duckdb.connect()
    # the list binds as HUGEINT (so LN sees exactly the oracle's
    # HUGEINT->DOUBLE cast); list UNNEST preserves element order, and the
    # returned x would come back as lossy float64 — so zip positionally
    fp = con.execute(
        "SELECT CAST(FLOOR(LN(x) * 1000000000) AS BIGINT) AS fp "
        "FROM (SELECT UNNEST(?) AS x)",
        [xs],
    ).df()["fp"].astype("int64")
    bad = [
        x
        for x, their in zip(xs, fp)
        if math.floor(log_fn(float(x)) * 1_000_000_000) != int(their)
    ]
    if bad:
        raise RuntimeError(
            f"fixed-point ln contract BROKEN on this host: engine"
            f" floor(log(x)*1e9) != DuckDB LN at {len(bad)} of {len(xs)}"
            f" grid points (first: x={bad[0]}). Every oracle hash in these"
            f" families is unreliable here: {_LN_CONTRACT_FAMILIES}"
        )
