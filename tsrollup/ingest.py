"""Ingest: read the F1 Parquet, validate rows, derive event time — stateless
``map_batches`` over zero-copy Arrow.

Replaces the reference's driver-side CSV loader + pad/truncate + scrub
(ref main.py:21-80, core/streaming_pipeline.py:33-55,138-146): schema is
checked rather than padded (SURVEY §1.2), malformed rows are counted into a
quarantine channel instead of silently dropped as ``[]`` sentinels
(ref core/streaming_pipeline.py:342).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from tsrollup.config import EPOCH0_S, SECONDS_PER_BUCKET, STEP_S
from tsrollup.hashing import row_checksum

INPUT_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]
# columns actually needed by the rollup path — tokens are NOT shipped through
# the aggregation (prune at the read; the per-row invariant is checked where
# tokens are projected, then only (source, seq, n_tok) flows on).
ROLLUP_COLUMNS = ["doc_id", "n_tok", "source"]

QUARANTINE_SOURCE = "__quarantine__"

# schema evolution: fragments written before the ``source`` column existed
# (or carrying null sources) roll up under this label instead of failing the
# whole read — the 100 TB posture, where a corpus accretes over schema
# versions and a re-ingest of petabytes to backfill one column is not a plan.
# ``doc_id``/``n_tok`` have no default: a fragment missing either is
# structurally unreadable and quarantines as a whole (counted, not dropped).
LEGACY_SOURCE = "__legacy__"


def read_input(path: str | list[str], columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """`ray.data.read_parquet` with column pruning (engine source S1/S4).

    Routed through :func:`tsrollup.util.read_parquet_clean`: external inputs
    (e.g. pandas-written testdata) carry a ``pandas`` schema-metadata blob
    that makes pa.Schema unhashable and spams 'Failed to hash the schemas'
    from every downstream unify."""
    from tsrollup.util import read_parquet_clean

    return read_parquet_clean(path, columns=columns or ROLLUP_COLUMNS, **kwargs)


def derive_batch(t: pa.Table) -> pa.Table:
    """Validate + derive (seq, bucket, chk) per row; invalid rows are dropped
    and accounted as one ``__quarantine__`` row (bucket = -1, n_rows = count)
    so their count survives the aggregate into lineage records.

    Validation: doc_id suffix parses as the 10-digit seq; if ``tokens`` is
    present, ``n_tok == len(tokens)`` (the input_hint invariant).
    """
    n = t.num_rows
    if n == 0:
        return _derived_empty()
    seq_str = pc.utf8_slice_codeunits(t["doc_id"], start=-10)
    # ONE validation path: the anchored RE2 kernel (vectorized C, ~75 ms per
    # 1M rows — ~2% of scan wall). A cast-based fast path that bypassed the
    # regex when the WHOLE batch casts made validity depend on batch
    # composition (a short all-digit doc_id was accepted or quarantined based
    # on its neighbors), breaking determinism-at-any-parallelism.
    valid = pc.fill_null(pc.match_substring_regex(seq_str, r"^[0-9]{10}$"), False)
    if "tokens" in t.column_names:
        len_ok = pc.fill_null(pc.equal(pc.list_value_length(t["tokens"]), t["n_tok"]), False)
        valid = pc.and_(valid, len_ok)
    n_bad = n - pc.sum(pc.cast(valid, pa.int64())).as_py()

    if n_bad == 0:
        good, seq = t, pc.cast(seq_str, pa.int64())
    else:
        good = t.filter(valid)
        seq = pc.cast(pc.utf8_slice_codeunits(good["doc_id"], start=-10), pa.int64())
    seq_np = seq.to_numpy(zero_copy_only=False)
    n_tok_np = good["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = (EPOCH0_S + seq_np * STEP_S) // SECONDS_PER_BUCKET
    chk = row_checksum(seq_np, n_tok_np).view(np.int64)
    # schema evolution: fragments predating the source column (column
    # absent, or read as nulls through a unified-schema scan) roll up
    # under LEGACY_SOURCE
    if "source" in good.column_names:
        src = good["source"]
        if src.null_count:
            src = pc.fill_null(src, LEGACY_SOURCE)
    else:
        src = pa.array([LEGACY_SOURCE] * good.num_rows, pa.string())
    out = pa.table(
        {
            "source": src,
            "bucket": pa.array(bucket),
            "n_tok": pa.array(n_tok_np),
            "chk": pa.array(chk),
        }
    )
    if n_bad:
        q = pa.table(
            {
                "source": pa.array([QUARANTINE_SOURCE]),
                "bucket": pa.array([-1], type=pa.int64()),
                "n_tok": pa.array([0], type=pa.int64()),
                "chk": pa.array([np.int64(n_bad)], type=pa.int64()),
            }
        )
        out = pa.concat_tables([out, q])
    return out


def _derived_empty() -> pa.Table:
    return pa.table(
        {
            "source": pa.array([], type=pa.string()),
            "bucket": pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=pa.int64()),
            "chk": pa.array([], type=pa.int64()),
        }
    )


def read_input_json(path: str | list[str], **kwargs) -> ray.data.Dataset:
    """JSON-lines source for the F1 schema (the engine's analog of the
    reference's Kafka JSON deserialization, ref core/streaming_pipeline.py:33-55):
    rows with doc_id/tokens/n_tok/source; type normalization to the canonical
    Arrow schema happens in ``normalize_json_batch``; malformed rows fall into
    the quarantine channel downstream in ``derive_batch`` instead of the
    reference's silent [] sentinel."""
    ds = ray.data.read_json(path, **kwargs)
    return ds.map_batches(normalize_json_batch, batch_format="pyarrow")


def normalize_json_batch(t: pa.Table) -> pa.Table:
    cols = {}
    cols["doc_id"] = pc.cast(t["doc_id"], pa.string())
    tokens = t["tokens"]
    if not pa.types.is_list(tokens.type) or tokens.type.value_type != pa.int32():
        tokens = pc.cast(tokens, pa.list_(pa.int32()))
    cols["tokens"] = tokens
    cols["n_tok"] = pc.cast(pc.fill_null(t["n_tok"], -1), pa.int32())
    cols["source"] = pc.cast(t["source"], pa.string())
    return pa.table(cols)


def read_input_csv(path: str | list[str], **kwargs) -> ray.data.Dataset:
    """Ragged-CSV source — the reference's literal M4 reader surface
    (ref main.py:21-80: per-row variable-length CSV). Line format::

        doc_id,source,tok1 tok2 tok3 ...

    with a variable-length whitespace-separated token tail (CSV cannot carry
    arrays; the ragged tail IS the array, exactly like the reference's ragged
    series rows). Read as text lines (Arrow CSV requires rectangular rows),
    parsed with vectorized pandas str kernels; malformed lines (missing
    fields, non-integer tokens) become quarantine rows (n_tok = -1) that
    ``derive_batch`` counts into the quarantine channel — not the reference's
    silent ``[]`` drop."""
    ds = ray.data.read_text(path, **kwargs)
    return ds.map_batches(parse_csv_batch, batch_format="pandas")


def parse_csv_batch(df) -> pa.Table:
    """One text-line batch -> canonical F1 columns. Field splitting,
    numeric parsing and validation are vectorized pandas/numpy kernels; the
    one Python-level pass is the token flatten (same shape as
    functions.tokens.TokenBatch)."""
    import pandas as pd

    lines = df["text"].fillna("")
    parts = lines.str.split(",", n=2, expand=True)
    if parts.shape[1] < 3:  # batch where every line is short
        for c in range(parts.shape[1], 3):
            parts[c] = None
    doc_id = parts[0].fillna("")
    source = parts[1]
    tok_str = parts[2]
    bad = source.isna() | tok_str.isna()

    toks = tok_str.fillna("").str.split()
    lens = toks.map(len).to_numpy(dtype=np.int64)
    flat = pd.Series(
        [t for sub in toks for t in sub], dtype=object
    )
    ids = pd.to_numeric(flat, errors="coerce") if len(flat) else pd.Series([], dtype=float)
    # only canonical integer literals pass: Arrow's string->int cast (the
    # JSON path) rejects "3.0"/"1e3"/"+5", so the CSV path must too — a
    # to_numeric+integrality check alone would silently coerce them. The
    # regex gate enforces identical accept sets; the numeric bound still
    # catches int32 overflow (float64 holds every 10-digit int exactly).
    if len(flat):
        noncanon = ~flat.str.fullmatch(r"-?[0-9]+").to_numpy(dtype=bool)
        bad_tok = (
            noncanon
            | (ids.isna() | (ids < -(2**31)) | (ids >= 2**31)).to_numpy()
        )
    else:
        bad_tok = np.zeros(0, bool)
    bad = bad.to_numpy()
    if bad_tok.any():
        doc_idx = np.repeat(np.arange(len(lines)), lens)
        bad_lines = np.zeros(len(lines), dtype=bool)
        bad_lines[doc_idx[bad_tok]] = True
        bad |= bad_lines
    vals = np.where(bad_tok, 0, ids.to_numpy()) if len(flat) else np.zeros(0)
    offs = np.zeros(len(lines) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32)), pa.array(vals.astype(np.int32))
    )
    n_tok = np.where(bad, -1, lens).astype(np.int32)  # -1 fails derive_batch's
    # n_tok == len(tokens) check -> the row lands in the quarantine channel
    return pa.table(
        {
            "doc_id": pa.array(doc_id.to_numpy(dtype=object), pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(source.fillna("").to_numpy(dtype=object), pa.string()),
        }
    )


def list_parquet_files(path: str | list[str]) -> list[str]:
    import os

    paths = path if isinstance(path, list) else [path]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                out.extend(os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet"))
        else:
            out.append(p)
    return sorted(out)


def derived_partials_from_files(
    path: str | list[str], columns: list[str], batch_size: int = 65536
) -> ray.data.Dataset:
    """FUSED ingest: one task per parquet fragment does read -> validate/derive
    -> partial rollup, emitting only the tiny partial rows.

    Rationale (measured): Ray's planned ReadParquet op does not fuse with the
    derive stage (a SplitBlocks op intervenes), so the raw token columns
    (~2x the input bytes as Arrow) transit the object store — at 25 GB input
    that evicts the page cache and spills, turning a CPU job IO-bound. Fusing
    keeps per-task traffic at ~1/1000th (the partials), which is also the
    posture that matters on a real cluster: only combiner output crosses nodes.
    """
    import pyarrow.parquet as pq

    from tsrollup.rollup import partial_recombine, partial_rollup

    # one task per ROW GROUP (finer than per-file): more waves -> less
    # straggler quantization when task_count / num_cpus is small
    work: list[dict] = []
    for f in list_parquet_files(path):
        n_rg = pq.ParquetFile(f).num_row_groups
        for rg in range(n_rg):
            work.append({"path": f, "rg": rg})

    def _one(batch: pa.Table) -> pa.Table:
        from tsrollup.rollup import PARTIAL_SCHEMA

        outs = []
        for fp, rg in zip(batch["path"].to_pylist(), batch["rg"].to_pylist()):
            pf = pq.ParquetFile(fp)
            avail = set(pf.schema_arrow.names)
            missing = [c for c in columns if c not in avail]
            if any(c in ("doc_id", "n_tok") for c in missing):
                # structurally unreadable fragment: quarantine its rows
                # as a COUNT (derive_batch's malformed-row contract)
                n = pf.metadata.row_group(rg).num_rows
                outs.append(partial_rollup(pa.table(
                    {"source": pa.array([QUARANTINE_SOURCE]),
                     "bucket": pa.array([-1], pa.int64()),
                     "n_tok": pa.array([0], pa.int64()),
                     "chk": pa.array([np.int64(n)], pa.int64())})))
                continue
            # schema evolution: read what exists; derive_batch defaults
            # an absent source column to LEGACY_SOURCE
            t = pf.read_row_group(
                rg, columns=[c for c in columns if c in avail])
            for lo in range(0, t.num_rows, batch_size):
                outs.append(partial_rollup(derive_batch(t.slice(lo, batch_size))))
        if not outs:  # empty fragment
            return PARTIAL_SCHEMA.empty_table()
        return partial_recombine(pa.concat_tables(outs))  # per-task combine

    if not work:  # no fragments at all -> empty, schema-stable dataset
        from tsrollup.rollup import PARTIAL_SCHEMA

        return ray.data.from_arrow(PARTIAL_SCHEMA.empty_table())
    # one task per fragment EXACTLY: from_items' default blocking packs 1-2
    # fragments per block (336 fragments -> 200 blocks), baking in 2x task
    # skew that quantizes into straggler waves at high CPU counts
    return ray.data.from_items(work, override_num_blocks=len(work)).map_batches(
        _one, batch_format="pyarrow", batch_size=1
    )


def check_tokens_invariant(ds: ray.data.Dataset) -> int:
    """Count rows violating ``n_tok == len(tokens)`` without materializing
    anything (used by tests; streams one tiny count per batch)."""

    def _count(t: pa.Table) -> pa.Table:
        bad = pc.sum(
            pc.cast(pc.not_equal(pc.list_value_length(t["tokens"]), t["n_tok"]), pa.int64())
        ).as_py() or 0
        return pa.table({"bad": pa.array([bad], type=pa.int64())})

    agg = ds.map_batches(_count, batch_format="pyarrow").sum("bad")
    return int(agg or 0)
