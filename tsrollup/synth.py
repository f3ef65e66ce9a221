"""Deterministic synthetic F1 input generator (FIXTURES.md §F1).

Schema: ``doc_id:string, tokens:list<int32>, n_tok:int32, source:string`` with
``doc_id = f"{source}-{seq:010d}"`` encoding event time ``ts = EPOCH0 + seq``.

Every row is a **closed-form function of (seed, source_idx, seq)** via
splitmix64 mixing (tsrollup.hashing) — no RNG state — so any chunking of the
generator (driver-side, Ray-parallel, oracle-side) yields identical rows.
That replaces the reference's stateful ``np.random.seed(42)`` setup
(ref main.py:261-262) with something that stays deterministic under
distribution.

Skew: source 0 spans ``base_span * (n_sources - 1)`` seqs (~50% of all rows,
Zipf-ish hot source) to exercise the salted-combine path. Gaps: a seeded ~4% of
1m buckets per source are dropped entirely (gap-fill path).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tsrollup.config import EPOCH0_S, SECONDS_PER_BUCKET, STEP_S
from tsrollup.hashing import mix2, mix3

_TAG_GAP = 0xA11CE
_TAG_LEN = 0xBEEF
_TAG_VAL = 0xCAFE

VOCAB = 50257


def source_name(i: int) -> str:
    return f"src{i:02d}"


def source_span(source_idx: int, n_sources: int, base_span: int) -> int:
    """Seq span per source; source 0 is the hot one (~half of all rows)."""
    if source_idx == 0:
        return base_span * max(1, n_sources - 1)
    return base_span


def gapped_buckets(seed: int, source_idx: int, buckets: np.ndarray, gap_pct: int) -> np.ndarray:
    """Boolean mask: True where the 1m bucket is dropped for this source."""
    h = mix3(np.uint64(seed ^ _TAG_GAP), np.uint64(source_idx), buckets.astype(np.uint64))
    return (h % np.uint64(100)) < np.uint64(gap_pct)


def synth_chunk(
    seed: int,
    source_idx: int,
    seq_lo: int,
    seq_hi: int,
    gap_pct: int = 4,
    min_tok: int = 8,
    max_tok: int = 512,
) -> pa.Table:
    """Generate the F1 rows of one source for seq in [seq_lo, seq_hi)."""
    src = source_name(source_idx)
    seq = np.arange(seq_lo, seq_hi, dtype=np.int64)
    buckets = (EPOCH0_S + seq * STEP_S) // SECONDS_PER_BUCKET
    keep = ~gapped_buckets(seed, source_idx, buckets, gap_pct)
    seq = seq[keep]
    n = len(seq)
    span = max_tok - min_tok + 1
    n_tok = (
        min_tok
        + (mix3(np.uint64(seed ^ _TAG_LEN), np.uint64(source_idx), seq.astype(np.uint64)) % np.uint64(span)).astype(np.int64)
    ).astype(np.int32)

    total = int(n_tok.sum())
    row_key = mix3(np.uint64(seed ^ _TAG_VAL), np.uint64(source_idx), seq.astype(np.uint64))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    flat_keys = np.repeat(row_key, n_tok)
    tok_vals = (mix2(flat_keys, j.astype(np.uint64)) % np.uint64(VOCAB)).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), pa.array(tok_vals))

    seq_str = pc.utf8_lpad(pc.cast(pa.array(seq), pa.string()), 10, "0")
    doc_id = pc.binary_join_element_wise(pa.array([src] * n), seq_str, "-")
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array([src] * n, type=pa.string()),
        }
    )


EDGE_SOURCES = ("edge_empty", "edge_single", "edge_onebucket")


def _edge_tables(seed: int, gap_pct: int, min_tok: int, max_tok: int) -> list[pa.Table]:
    """FIXTURES edge fixtures: empty source, single-row source, one-bucket source.

    Implemented as extra sources riding on high source indices with tiny spans;
    the empty source contributes zero rows by construction (span 0)."""
    tabs = []
    # single row (source idx 101), one bucket's worth (idx 102)
    t = synth_chunk(seed, 101, 0, 1, gap_pct=0, min_tok=min_tok, max_tok=max_tok)
    tabs.append(_rename_source(t, "edge_single"))
    t = synth_chunk(seed, 102, 0, SECONDS_PER_BUCKET // STEP_S, gap_pct=0, min_tok=min_tok, max_tok=max_tok)
    tabs.append(_rename_source(t, "edge_onebucket"))
    return tabs


def _rename_source(t: pa.Table, new_source: str) -> pa.Table:
    n = t.num_rows
    seq_str = pc.utf8_slice_codeunits(t["doc_id"], start=-10)
    doc_id = pc.binary_join_element_wise(pa.array([new_source] * n), seq_str, "-")
    return t.set_column(0, "doc_id", doc_id).set_column(3, "source", pa.array([new_source] * n))


def synth_table(
    seed: int = 42,
    n_sources: int = 4,
    base_span: int = 2048,
    gap_pct: int = 4,
    edge_cases: bool = False,
    min_tok: int = 8,
    max_tok: int = 512,
) -> pa.Table:
    """Whole table in one driver-side call (tests / oracle; keep it small)."""
    tabs = [
        synth_chunk(seed, i, 0, source_span(i, n_sources, base_span), gap_pct, min_tok, max_tok)
        for i in range(n_sources)
    ]
    if edge_cases:
        tabs.extend(_edge_tables(seed, gap_pct, min_tok, max_tok))
    return pa.concat_tables(tabs)


def chunk_specs(
    seed: int = 42,
    n_sources: int = 4,
    base_span: int = 2048,
    gap_pct: int = 4,
    rows_per_chunk: int = 100_000,
    min_tok: int = 8,
    max_tok: int = 512,
) -> list[dict]:
    """Chunked work list for Ray-parallel generation (one spec -> one table)."""
    specs = []
    for i in range(n_sources):
        span = source_span(i, n_sources, base_span)
        for lo in range(0, span, rows_per_chunk):
            specs.append(
                {
                    "seed": seed,
                    "source_idx": i,
                    "seq_lo": lo,
                    "seq_hi": min(lo + rows_per_chunk, span),
                    "gap_pct": gap_pct,
                    "min_tok": min_tok,
                    "max_tok": max_tok,
                }
            )
    return specs


def write_synth_parquet(
    out_dir: str,
    seed: int = 42,
    n_sources: int = 4,
    base_span: int = 2048,
    gap_pct: int = 4,
    rows_per_chunk: int = 100_000,
    min_tok: int = 8,
    max_tok: int = 512,
    use_ray: bool = False,
) -> str:
    """Write the F1 table as partitioned parquet under ``out_dir`` (idempotent:
    skipped when the _SYNTH_OK marker exists). With ``use_ray``, generation fans
    out over Ray tasks — each chunk is independent closed-form work."""
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_SYNTH_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    specs = chunk_specs(seed, n_sources, base_span, gap_pct, rows_per_chunk, min_tok, max_tok)

    def _write(spec: dict) -> str:
        p = os.path.join(out_dir, f"part-{spec['source_idx']:03d}-{spec['seq_lo']:012d}.parquet")
        if os.path.exists(p):  # resumable generation: chunks are deterministic
            return p
        t = synth_chunk(
            spec["seed"], spec["source_idx"], spec["seq_lo"], spec["seq_hi"],
            spec["gap_pct"], spec["min_tok"], spec["max_tok"],
        )
        tmp = p + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, p)
        return p

    if use_ray:
        import ray

        # num_cpus=2 bounds generator concurrency: each chunk materializes
        # several transient uint64 arrays (~8B per token), so full-width
        # parallelism overcommits memory on large chunks
        @ray.remote(num_cpus=2)
        def _w(spec):
            return _write(spec)

        ray.get([_w.remote(s) for s in specs])
    else:
        for s in specs:
            _write(s)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
