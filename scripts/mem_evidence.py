"""Object-store memory evidence for the headline engine (round-4 VERDICT
next #4 / the north rule's bounded-at-scale posture).

Runs the full engine job over the standard 25 GB bench corpus while a
sampler thread polls the plasma backing store (/dev/shm — Ray mmaps the
object store there) and the session spill directory, then prints one JSON
line with the peaks. Two modes:

  python scripts/mem_evidence.py            # default object store (~37 GiB)
  python scripts/mem_evidence.py --cap-gb 4 # 4 GiB object store

The --cap-gb run is the scale proof: if peak plasma under a 4 GiB cap
stays at the cap or below WITHOUT a spill storm and the job completes at
full throughput, the pipeline's working set is bounded by
(block size x concurrency), not by corpus size — the property that holds
at 10^12-sequence scale, where per-node plasma is likewise a tiny
fraction of the input. (A true 10x corpus does not fit this sandbox's
53 GB free disk; the cap run bounds the same quantity from the other
side. Recorded in BASELINE.md round-5.)

Env: RAY_GRAFT_CPUS (default 32), MEM_EV_SCALE (base_span multiplier,
default 1.0 — needs ~25 GB x scale free disk when > 1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _spill_dirs() -> list[str]:
    base = "/tmp/ray"
    out = []
    if os.path.isdir(base):
        for s in os.listdir(base):
            d = os.path.join(base, s, "ray_spilled_objects")
            if os.path.isdir(d):
                out.append(d)
    return out


class Sampler(threading.Thread):
    def __init__(self, period: float = 0.5):
        super().__init__(daemon=True)
        self.period = period
        self.stop_flag = False
        self.base_shm = _shm_used()
        self.peak_shm = 0
        self.peak_spill = 0

    def run(self):
        while not self.stop_flag:
            self.peak_shm = max(self.peak_shm, _shm_used() - self.base_shm)
            self.peak_spill = max(
                self.peak_spill, sum(_dir_bytes(d) for d in _spill_dirs())
            )
            time.sleep(self.period)


def main() -> int:
    cap_gb = None
    if "--cap-gb" in sys.argv:
        cap_gb = float(sys.argv[sys.argv.index("--cap-gb") + 1])
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    scale = float(os.environ.get("MEM_EV_SCALE", "1.0"))

    import ray

    kwargs = dict(address="local", num_cpus=num_cpus, include_dashboard=False,
                  ignore_reinit_error=True, logging_level="ERROR",
                  log_to_driver=False)
    if cap_gb:
        kwargs["object_store_memory"] = int(cap_gb * (1 << 30))
    ray.init(**kwargs)
    from tsrollup.util import tune_ray_data

    tune_ray_data()

    if scale == 1.0:
        in_dir = bench.ensure_synth()
    else:
        from tsrollup.synth import write_synth_parquet

        span = int(bench.BENCH_BASE_SPAN * scale)
        in_dir = write_synth_parquet(
            f"/tmp/tsrollup_bench/in-memev-s{bench.BENCH_SEED}-b{span}",
            seed=bench.BENCH_SEED, n_sources=bench.BENCH_SOURCES,
            base_span=span, rows_per_chunk=2_000_000,
            max_tok=bench.BENCH_MAX_TOK, use_ray=True)
    bench.warm_page_cache(in_dir)
    input_bytes = _dir_bytes(in_dir)

    sampler = Sampler()
    sampler.start()
    engine = bench.run_engine(in_dir)
    sampler.stop_flag = True
    sampler.join(timeout=5)

    out = {
        "metric": "engine peak object-store usage (plasma mmap on /dev/shm)",
        "input_bytes": input_bytes,
        "input_gib": round(input_bytes / (1 << 30), 2),
        "object_store_cap_gib": cap_gb,
        "peak_plasma_gib": round(sampler.peak_shm / (1 << 30), 3),
        "peak_spill_gib": round(sampler.peak_spill / (1 << 30), 3),
        "plasma_to_input_ratio": round(sampler.peak_shm / max(input_bytes, 1), 4),
        "num_cpus": num_cpus,
        "scale": scale,
        **engine,
    }
    ray.shutdown()
    print(json.dumps(out))
    if scale != 1.0:
        shutil.rmtree(in_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
