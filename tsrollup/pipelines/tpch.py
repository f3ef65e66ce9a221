"""Classic TPC-H pipelines over the driver's relational tables — the
multi-table join / aggregate capability demo alongside the timeseries and
corpus families. Fifteen canonical shapes — every TPC-H query expressible
on the testdata's schema (q2/q9/q11/q16/q20 need the absent partsupp
table; q12/q21 need l_commitdate/l_receiptdate/l_shipmode) — all
SQL-verified against DuckDB running the textbook query on the same
parquet:

- ``tpch_q1``  — pricing summary: single-table scan -> wide exact-integer
  aggregate (no exchange beyond the tiny (flag, status) fold).
- ``tpch_q3``  — shipping priority: broadcast dim filter (customer) ->
  BIG-BIG hash join (orders x lineitem) via one orderkey exchange ->
  global top-k.
- ``tpch_q4``  — order-priority checking: correlated EXISTS semi-join
  resolved vectorized inside the exchange.
- ``tpch_q5``  — local supplier volume: two broadcast dims (customer and
  supplier nation maps) -> orderkey exchange join -> nation fold, with
  TPC-H's c_nationkey = s_nationkey twist applied inside the join.
- ``tpch_q6``  — forecasting revenue change: filtered global aggregate on
  integer predicate forms.
- ``tpch_q10`` — returned items: exchange join -> customer fold -> lossless
  top-20 -> broadcast name lookup.
- ``tpch_q14`` — promotion effect: broadcast (partkey, is_promo) dim ->
  two-sum ratio.
- ``tpch_q15`` — top supplier: argmax WITH TIES over a materialized
  supplier fold.
- ``tpch_q18`` — large-volume customers: aggregate-then-join HAVING
  semi-join whose big-keys set stays a Dataset.
- ``tpch_q7``  — volume shipping: bilateral region-pair trade per
  (supp_nation, cust_nation, year), direction predicate inside the
  orderkey exchange.
- ``tpch_q8``  — national market share: per-year target/total revenue
  ratio from one exchange join against three broadcast dims.
- ``tpch_q13`` — customer distribution: LEFT OUTER JOIN order-count
  histogram (k = 0 customers included) through one custkey exchange.
- ``tpch_q17`` — small-quantity revenue: correlated per-part average
  resolved in-partition as the exact integer rewrite 5*qc*n < sum.
- ``tpch_q19`` — discounted revenue: three disjunctive (brand, size,
  quantity) clauses, clause-id broadcast, no exchange at all.
- ``tpch_q22`` — global sales opportunity: above-average-balance
  anti-join (NOT EXISTS recent orders) folded per nation.

Exactness: every money aggregate runs on integer cents derived as
``FLOOR(x * 100)`` — the same double multiply+floor on both sides (the
events-table recipe), so revenue4 = Σ cents·(100−disc_pct) and the Q1
charge (scale 10^6) are exact integers; the only floats are one final
division of exact integers per avg column. Partitioning assumptions:
customer/supplier/nation/region are DIMENSION tables (broadcast via
ray.put — the join_broadcast contract); orders and lineitem are FACTS
and move through exactly one keyed exchange each. At extreme scale the
int64 fold bounds are the documented HUGEINT caveat (the oracle already
sums in HUGEINT).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tsrollup.shuffle import map_key_partitions, topk_rows
from tsrollup.util import read_parquet_clean

_US = 86_400_000_000  # µs per day

# shared query constants — every oracle below is generated from these
_Q1_CUTOFF = "1998-09-02"
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1995-03-15"
_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1995-01-01", "1996-01-01"


def _date_us(s: str) -> int:
    return int(np.datetime64(s, "us").astype(np.int64))


def _ts_filter(col: str, lo_us: int | None = None, hi_us: int | None = None,
               lo_strict: bool = False):
    """Predicate-pushdown expression for a timestamp[us] range, handed to
    ``read_parquet`` as ``filter=`` so pyarrow prunes row groups whose
    min/max statistics exclude the range and drops non-matching rows at
    the scan itself — rows outside the date cut never enter the object
    store (round-4 VERDICT next #3). Purely an IO/volume cut: every query
    still applies its own exact per-batch mask, and the pushed predicate
    is the SAME comparison on the same values (timestamp[us] order ==
    the int64-microsecond order the batch masks use), so pruned rows are
    exactly rows the mask would drop."""
    f = pc.field(col)
    e = None
    if lo_us is not None:
        lo_s = pa.scalar(lo_us, pa.timestamp("us"))
        e = (f > lo_s) if lo_strict else (f >= lo_s)
    if hi_us is not None:
        e2 = f < pa.scalar(hi_us, pa.timestamp("us"))
        e = e2 if e is None else e & e2
    return e


def _exchange_width(sf_dir: str, *tables: str, frac: int = 1) -> int:
    """Keyed-exchange width sized to the FACT bytes feeding it (the shared
    ``shuffle.bytes_sized_partitions`` heuristic — the q18-fold lesson:
    64 -> 12 partitions was most of that stage's wall at sf0.1).
    ``frac`` scales the bytes down BEFORE sizing, for exchanges fed only a
    column subset of the source tables."""
    import os as _os

    from tsrollup.shuffle import bytes_sized_partitions

    total = 0
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        try:
            total += (_os.path.getsize(p) if _os.path.isfile(p) else sum(
                _os.path.getsize(_os.path.join(dp, f))
                for dp, _dn, fn in _os.walk(p) for f in fn))
        except OSError:
            pass
    return bytes_sized_partitions(total // max(1, frac))


def _cents(x: np.ndarray) -> np.ndarray:
    """FLOOR(x * 100) as int64 — identical double arithmetic to DuckDB's
    FLOOR(x * 100), the events-table exactness recipe."""
    return np.floor(x * 100.0).astype(np.int64)


def _fmt_date(us: np.ndarray) -> list:
    """µs -> 'YYYY-MM-DD' via the vectorized civil-date conversion
    (matches DuckDB strftime('%Y-%m-%d'))."""
    from tsrollup.pipelines.queries import _civil_from_days

    y, m, d = _civil_from_days(us // _US)
    return [f"{yy:04d}-{mm:02d}-{dd:02d}" for yy, mm, dd in zip(y, m, d)]


def _match_sorted(sorted_keys: np.ndarray, probe: np.ndarray):
    """(membership mask, clamped positions) of ``probe`` keys against a
    SORTED unique key array — the one searchsorted-merge idiom shared by
    the broadcast lookups and every exchange join block in this file.
    Empty key arrays yield an all-False mask (matching inner-join
    semantics) instead of indexing errors."""
    if not len(sorted_keys):
        return np.zeros(len(probe), bool), np.zeros(len(probe), np.int64)
    pos = np.searchsorted(sorted_keys, probe)
    posc = np.minimum(pos, len(sorted_keys) - 1)
    return sorted_keys[posc] == probe, posc


def _union_join_parts(t: pa.Table):
    """Split a tagged-union exchange block into the order-side sort and the
    item-side probe — the preamble every _join_block/_exists_block in this
    file shares: returns None when either side is empty (inner-join
    semantics), else ``(so, om, ok, posc)`` where ``so`` sorts the side-0
    keys (orderkeys are unique), ``om`` masks side-0 rows, and
    ``ok``/``posc`` match every side-1 key against the sorted side-0
    keys."""
    if t.num_rows == 0:
        return None
    side = t["side"].to_numpy(zero_copy_only=False)
    keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
    om = side == 0
    o_keys = keys[om]
    if not len(o_keys) or len(o_keys) == t.num_rows:
        return None
    so = np.argsort(o_keys, kind="stable")
    ok, posc = _match_sorted(o_keys[so], keys[~om])
    return so, om, ok, posc


def _broadcast_column_pair(ds, key_col: str, val_col: str | None,
                           str_vals: bool = False):
    """Collect a DIMENSION table's (key[, value]) columns into sorted numpy
    arrays and ship once via ray.put (the join_broadcast contract — dims
    are bounded; facts never take this path). ``str_vals`` keeps the value
    column as an object array (e.g. customer names)."""
    import ray

    keys, vals = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        keys.append(b[key_col].to_numpy(zero_copy_only=False))
        if val_col is not None:
            vals.append(np.asarray(b[val_col].to_pylist(), dtype=object)
                        if str_vals
                        else b[val_col].to_numpy(zero_copy_only=False))
    k = (np.concatenate(keys) if keys else np.array([], np.int64)).astype(np.int64)
    order = np.argsort(k, kind="stable")
    k = k[order]
    if val_col is None:
        return ray.put((k, None))
    if vals:
        v = np.concatenate(vals)[order]
        if not str_vals:
            v = v.astype(np.int64)
    else:
        v = np.array([], dtype=object if str_vals else np.int64)
    return ray.put((k, v))


def _lookup(ref, keys: np.ndarray):
    """Membership mask + mapped values against a broadcast (key, value)
    pair; one searchsorted per batch, zero-copy plasma read per task."""
    import ray

    k, v = ray.get(ref)
    ok, posc = _match_sorted(k, keys)
    if v is None:
        return ok, None
    vals = v[posc] if len(k) else np.zeros(len(keys), v.dtype)
    return ok, vals


def _bloom_pruned(bm_ref, key_col: str, fn):
    """Shared exchange-lane prefilter: Bloom-filter a fact batch's
    ``key_col`` against a broadcast ``bloom_build`` bitmap BEFORE the
    per-batch transform ``fn`` — false positives survive into the exchange
    where the inner join drops them exactly (every q3/q5/q7/q8/q10/q18
    exchange lane shares this closure)."""
    from tsrollup.shuffle import bloom_keep

    def _pruned(t: pa.Table) -> pa.Table:
        import ray

        t = t.filter(pa.array(bloom_keep(
            ray.get(bm_ref),
            t[key_col].to_numpy(zero_copy_only=False))))
        return fn(t)

    return _pruned


def _collect_sorted_cols(ds, cols, obj_cols=()):
    """Broadcast-lane preamble shared by the survivor tails: collect a
    lane-guard-bounded Dataset's columns into numpy arrays sorted by the
    FIRST column (int64 unless listed in ``obj_cols``). An empty Dataset
    yields typed empties (``to_pandas`` loses the schema at 0 rows)."""
    df = ds.to_pandas()
    out = []
    for c in cols:
        if len(df):
            a = (np.asarray(df[c].tolist(), dtype=object) if c in obj_cols
                 else df[c].to_numpy().astype(np.int64))
        else:
            a = np.array([], dtype=object if c in obj_cols else np.int64)
        out.append(a)
    order = np.argsort(out[0], kind="stable")
    return tuple(a[order] for a in out)


def q_tpch_q1(sf_dir: str):
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) — quantity /
    base price / discounted price / charge sums and averages over
    lineitems shipped on or before the cutoff. One scan, per-batch Arrow
    group partials, one six-row fold; sums exact at integer scales
    10^2/10^4/10^6."""
    from ray.data.aggregate import Sum

    cutoff = _date_us(_Q1_CUTOFF)

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"l_returnflag": pa.array([], pa.string()),
             "l_linestatus": pa.array([], pa.string()),
             **{c: pa.array([], pa.int64())
                for c in ("sum_qty_c", "sum_base_c", "sum_disc4",
                          "sum_charge6", "sum_disc_p", "n_rows")}}
        )
        keep = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64) <= cutoff
        if not keep.any():
            return empty
        t = t.filter(pa.array(keep))
        qc = _cents(t["l_quantity"].to_numpy(zero_copy_only=False))
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        tp = _cents(t["l_tax"].to_numpy(zero_copy_only=False))
        disc4 = ec * (100 - dp)
        g = pa.table(
            {"l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
             "sum_qty_c": pa.array(qc), "sum_base_c": pa.array(ec),
             "sum_disc4": pa.array(disc4),
             "sum_charge6": pa.array(disc4 * (100 + tp)),
             "sum_disc_p": pa.array(dp),
             "n_rows": pa.array(np.ones(t.num_rows, np.int64))}
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in ("sum_qty_c", "sum_base_c", "sum_disc4",
                                  "sum_charge6", "sum_disc_p", "n_rows")]
        )
        return pa.table(
            {"l_returnflag": g["l_returnflag"], "l_linestatus": g["l_linestatus"],
             **{c: g[f"{c}_sum"].cast(pa.int64())
                for c in ("sum_qty_c", "sum_base_c", "sum_disc4",
                          "sum_charge6", "sum_disc_p", "n_rows")}}
        )

    folded = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("sum_qty_c", "sum_base_c", "sum_disc4",
                               "sum_charge6", "sum_disc_p", "n_rows")])
    )

    def _final(t: pa.Table) -> pa.Table:
        from tsrollup.pipelines.queries import _round6

        if t.num_rows == 0:
            return t.append_column("avg_qty", pa.array([], pa.float64())) \
                    .append_column("avg_price", pa.array([], pa.float64())) \
                    .append_column("avg_disc", pa.array([], pa.float64()))
        n = t["n_rows"].to_numpy(zero_copy_only=False)
        out = dict(zip(t.column_names, t.columns))
        for name, col in (("avg_qty", "sum_qty_c"), ("avg_price", "sum_base_c"),
                          ("avg_disc", "sum_disc_p")):
            s = t[col].to_numpy(zero_copy_only=False)
            # CAST(S AS DOUBLE) / (100 * n): numerator rounded to double
            # FIRST, exactly like the oracle; _round6 = DuckDB ROUND
            # (half away from zero), which these terminating-decimal
            # ratios hit on exact .5 ties
            out[name] = pa.array(
                _round6(s.astype(np.float64) / (100.0 * n)))
        return pa.table(out)

    return folded.map_batches(_final, batch_format="pyarrow")


_Q6_LO, _Q6_HI = "1995-01-01", "1996-01-01"
_Q6_DISC_LO, _Q6_DISC_HI, _Q6_QTY = 5, 7, 2400  # integer cents/pct bounds


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 forecasting revenue change: one filtered global aggregate —
    Σ extendedprice·discount over a ship-year, discount band and quantity
    cap. The filter runs on the SAME integer forms the oracle uses
    (FLOOR(d*100) ∈ [5,7]; FLOOR(q*100) < 2400 ⟺ q < 24), so the
    predicate can never straddle a float boundary differently on the two
    sides; revenue is an exact integer at scale 10^4. Embarrassingly
    parallel: per-batch partial sums, one single-row fold."""
    from ray.data.aggregate import Sum

    lo, hi = _date_us(_Q6_LO), _date_us(_Q6_HI)

    def _partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        qc = _cents(t["l_quantity"].to_numpy(zero_copy_only=False))
        keep = ((sd >= lo) & (sd < hi) & (dp >= _Q6_DISC_LO)
                & (dp <= _Q6_DISC_HI) & (qc < _Q6_QTY))
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {"revenue4": pa.array([int((ec * dp[keep]).sum())], pa.int64()),
             "n_rows": pa.array([int(keep.sum())], pa.int64())}
        )

    agg = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"],
            filter=_ts_filter("l_shipdate", lo, hi),
        )
        .map_batches(_partial, batch_format="pyarrow")
        .aggregate(Sum("revenue4", alias_name="revenue4"),
                   Sum("n_rows", alias_name="n_rows"))
    )
    return pd.DataFrame(
        [{"revenue4": np.int64(agg["revenue4"] or 0),
          "n_rows": np.int64(agg["n_rows"] or 0)}]
    )


_Q3_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("odate", pa.int64()), ("prio", pa.string()),
     ("rev4", pa.int64()), ("side", pa.int8())]
)


_Q3_BCAST_MAX = 2_000_000


def _q3_broadcast_tail(sf_dir: str, orders, date_us: int):
    """q3 broadcast lane: the segment+date-surviving (orderkey, odate,
    prio) triples collect once (bounded — the lane guard admits
    <= _Q3_BCAST_MAX rows), ship via one ``ray.put``, and the lineitem
    scan joins by searchsorted and pre-folds (orderkey, revenue) per
    batch; the only exchange left is the tiny survivor-keyed Sum (the
    q10/q18 posture — the union exchange's fixed all-to-all overhead
    dominated this query's wall at sf0.1)."""
    from ray.data.aggregate import Sum

    import ray

    # bounded collect: lane guard admits <= _Q3_BCAST_MAX rows
    okeys, odate, prio = _collect_sorted_cols(
        orders, ("l_orderkey", "odate", "prio"), obj_cols=("prio",))
    pair_ref = ray.put((okeys, odate, prio))

    def _items_fold(t: pa.Table) -> pa.Table:
        k, _od, _pr = ray.get(pair_ref)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keep = sd > date_us
        lk = t["l_orderkey"].to_numpy(
            zero_copy_only=False)[keep].astype(np.int64)
        hit, pos = _match_sorted(k, lk)
        if not hit.any():
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue4": pa.array([], pa.int64())})
        ec = _cents(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep][hit])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep][hit])
        uk, inv = np.unique(lk[hit], return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, ec * (100 - dp))
        return pa.table({"l_orderkey": pa.array(uk), "revenue4": pa.array(s)})

    folded = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
            filter=_ts_filter("l_shipdate", lo_us=date_us, lo_strict=True),
        )
        .map_batches(_items_fold, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue4", alias_name="revenue4"))
    )

    def _attach(t: pa.Table) -> pa.Table:
        k, od, pr = ray.get(pair_ref)
        ck = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ck):
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "revenue4": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.string()),
                 "o_orderpriority": pa.array([], pa.string())})
        pos = np.searchsorted(k, ck)  # every folded key came from k
        return pa.table(
            {"l_orderkey": pa.array(ck),
             "revenue4": t["revenue4"].cast(pa.int64()),
             "o_orderdate": pa.array(_fmt_date(od[pos]), pa.string()),
             "o_orderpriority": pa.array(pr[pos], pa.string())})

    folded = folded.map_batches(_attach, batch_format="pyarrow")
    return topk_rows(folded, ["revenue4", "l_orderkey"], [True, False], 10)


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shipping priority: top-10 open orders by discounted
    revenue for one market segment. Plan: the customer DIM filtered to
    the segment broadcasts as a sorted key array; orders and lineitem
    FACTS are pre-filtered per batch (segment membership via one
    searchsorted; date cuts). Below ``_Q3_BCAST_MAX`` surviving orders the
    broadcast lane ships (orderkey, odate, prio) exactly and the lineitem
    scan pre-folds revenue with no orderkey exchange; above it the facts
    meet in ONE orderkey-keyed exchange (lineitem Bloom-prefiltered
    against surviving orderkeys) where the join + revenue fold run
    vectorized per partition; the global top-10 uses the lossless
    per-block prune (rows are orderkey-unique after the fold)."""
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], _Q3_SEGMENT))
        .select(["c_custkey"]),
        batch_format="pyarrow",
    )
    cust_ref = _broadcast_column_pair(cust, "c_custkey", None)
    date_us = _date_us(_Q3_DATE)

    def _orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        ok, _ = _lookup(cust_ref, ck)
        keep = ok & (od < date_us)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "odate": pa.array(od[keep]),
             "prio": t["o_orderpriority"].filter(pa.array(keep)),
             "rev4": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q3_SCHEMA
        )

    def _items(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keep = sd > date_us
        n = int(keep.sum())
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {"l_orderkey": pa.array(
                t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "odate": pa.array(np.zeros(n, np.int64)),
             "prio": pa.array([""] * n, pa.string()),
             "rev4": pa.array(ec * (100 - dp)),
             "side": pa.array(np.ones(n, np.int8))}, schema=_Q3_SCHEMA
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=_ts_filter("o_orderdate", hi_us=date_us),
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    if orders.count() <= _Q3_BCAST_MAX:
        return _q3_broadcast_tail(sf_dir, orders, date_us)

    # exchange lane: Bloom-prefilter the lineitem FACT against surviving
    # orderkeys before the exchange; the inner join against the real
    # order rows drops false positives exactly (the q10/q18 shape)
    from tsrollup.shuffle import bloom_build, bloom_keep

    bm_ref = ray.put(bloom_build(orders, "l_orderkey"))

    _items_pruned = _bloom_pruned(bm_ref, "l_orderkey", _items)

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=_ts_filter("l_shipdate", lo_us=date_us, lo_strict=True),
    ).map_batches(_items_pruned, batch_format="pyarrow")

    def _join_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "revenue4": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.string()),
             "o_orderpriority": pa.array([], pa.string())}
        )
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        if not ok.any():
            return empty
        rev = np.zeros(len(so), np.int64)
        np.add.at(rev, posc[ok],
                  t["rev4"].to_numpy(zero_copy_only=False)[~om][ok])
        # an order is in the result iff it MATCHED a lineitem — not iff its
        # revenue is positive (zero/negative-revenue groups are rows too,
        # exactly as the oracle's GROUP BY emits them)
        hit = np.zeros(len(so), bool)
        hit[posc[ok]] = True
        okeys = t["l_orderkey"].to_numpy(zero_copy_only=False)[om][so]
        odate = t["odate"].to_numpy(zero_copy_only=False)[om][so][hit]
        prio = t["prio"].to_numpy(zero_copy_only=False)[om][so][hit]
        return pa.table(
            {"l_orderkey": pa.array(okeys[hit]),
             "revenue4": pa.array(rev[hit]),
             "o_orderdate": pa.array(_fmt_date(odate), pa.string()),
             "o_orderpriority": pa.array(prio, pa.string())}
        )

    joined = map_key_partitions(
        orders.union(items), ["l_orderkey"], _join_block,
        num_partitions=_exchange_width(sf_dir, "orders", "lineitem"))
    return topk_rows(joined, ["revenue4", "l_orderkey"], [True, False], 10)


_Q5_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("nat", pa.int64()), ("rev4", pa.int64()),
     ("side", pa.int8())]
)
_Q5_BCAST_MAX = 2_000_000


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 local supplier volume: revenue per nation in one region
    from orders in a date year, counting only lineitems whose SUPPLIER
    sits in the customer's own nation (the c_nationkey = s_nationkey
    twist that makes Q5 a join-order classic). Plan: nation/region/
    customer/supplier are DIMS — region membership resolves driver-side
    (25 nations), customer->nation and supplier->nation broadcast as
    sorted pairs; below ``_Q5_BCAST_MAX`` surviving orders the year's
    (orderkey, cust-nation) pairs broadcast too and lineitem pre-folds
    per nation with zero exchanges; above it the two FACTS meet in one
    orderkey exchange (lineitem Bloom-prefiltered) where the
    nation-equality filter and the per-nation fold run vectorized."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    # 25-row dims: resolve the region's nation set + names driver-side
    # (plain pyarrow + numpy — the engine never runs its own oracle)
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = reg["r_regionkey"].to_numpy(zero_copy_only=False)[
        pc.equal(reg["r_name"], _Q5_REGION).combine_chunks().to_numpy(
            zero_copy_only=False)]
    ntab = pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    in_region = np.isin(
        ntab["n_regionkey"].to_numpy(zero_copy_only=False), rkeys)
    nat_keys = ntab["n_nationkey"].to_numpy(
        zero_copy_only=False)[in_region].astype(np.int64)
    nat_names = dict(zip(
        (int(k) for k in nat_keys),
        (n for n, m in zip(ntab["n_name"].to_pylist(), in_region) if m)))

    cust_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    supp_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")
    lo, hi = _date_us(_Q5_LO), _date_us(_Q5_HI)

    def _orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        ok, cn = _lookup(cust_ref, t["o_custkey"].to_numpy(zero_copy_only=False))
        keep = ok & (od >= lo) & (od < hi) & np.isin(cn, nat_keys)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "nat": pa.array(cn[keep]),
             "rev4": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q5_SCHEMA
        )

    def _items(t: pa.Table) -> pa.Table:
        ok, sn = _lookup(supp_ref, t["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = ok & np.isin(sn, nat_keys)
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {"l_orderkey": pa.array(
                t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "nat": pa.array(sn[keep]),
             "rev4": pa.array(ec * (100 - dp)),
             "side": pa.array(np.ones(int(keep.sum()), np.int8))},
            schema=_Q5_SCHEMA
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=_ts_filter("o_orderdate", lo, hi),
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    if orders.count() <= _Q5_BCAST_MAX:
        # broadcast lane: the year's surviving (orderkey -> cust-nation)
        # pairs ship exactly once; the lineitem scan resolves BOTH nation
        # lookups (order pair + supplier dim) per batch, applies the
        # c_nationkey = s_nationkey twist, and pre-folds revenue by nation
        # — ZERO exchanges before the <= 25-row nation Sum (q10/q18
        # posture; the year's orders grow linearly with the corpus, so the
        # Bloom-prefiltered exchange below remains the scale plan).
        okeys, onat = _collect_sorted_cols(  # bounded: lane guard
            orders, ("l_orderkey", "nat"))
        pair_ref = ray.put((okeys, onat))

        def _items_fold(t: pa.Table) -> pa.Table:
            k, cn = ray.get(pair_ref)
            ok, sn = _lookup(
                supp_ref, t["l_suppkey"].to_numpy(zero_copy_only=False))
            keep = ok & np.isin(sn, nat_keys)
            lk = t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)
            hit, pos = _match_sorted(k, lk)
            hit &= (cn[pos] == sn[keep]) if len(k) else False
            if not hit.any():
                return pa.table({"nat": pa.array([], pa.int64()),
                                 "revenue4": pa.array([], pa.int64())})
            ec = _cents(t["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep][hit])
            dp = _cents(t["l_discount"].to_numpy(
                zero_copy_only=False)[keep][hit])
            nk, inv = np.unique(sn[keep][hit], return_inverse=True)
            rev = np.zeros(len(nk), np.int64)
            np.add.at(rev, inv, ec * (100 - dp))
            return pa.table({"nat": pa.array(nk), "revenue4": pa.array(rev)})

        folded = (
            read_parquet_clean(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                         "l_discount"],
            )
            .map_batches(_items_fold, batch_format="pyarrow")
            .groupby("nat")
            .aggregate(Sum("revenue4", alias_name="revenue4"))
        )
    else:
        # exchange lane: Bloom-prefilter lineitem against the year's
        # surviving orderkeys; the inner join drops false positives exactly
        from tsrollup.shuffle import bloom_build, bloom_keep

        bm_ref = ray.put(bloom_build(orders, "l_orderkey"))

        _items_pruned = _bloom_pruned(bm_ref, "l_orderkey", _items)

        items = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(_items_pruned, batch_format="pyarrow")

        def _join_block(t: pa.Table) -> pa.Table:
            empty = pa.table({"nat": pa.array([], pa.int64()),
                              "revenue4": pa.array([], pa.int64())})
            parts = _union_join_parts(t)
            if parts is None:
                return empty
            so, om, ok, posc = parts
            o_nat = t["nat"].to_numpy(zero_copy_only=False)[om][so]
            l_nat = t["nat"].to_numpy(zero_copy_only=False)[~om]
            ok &= o_nat[posc] == l_nat
            if not ok.any():
                return empty
            # fold revenue by nationkey inside the partition (nations <= 25)
            nk, inv = np.unique(l_nat[ok], return_inverse=True)
            rev = np.zeros(len(nk), np.int64)
            np.add.at(
                rev, inv, t["rev4"].to_numpy(zero_copy_only=False)[~om][ok])
            return pa.table({"nat": pa.array(nk), "revenue4": pa.array(rev)})

        folded = (
            map_key_partitions(
                orders.union(items), ["l_orderkey"], _join_block,
                num_partitions=_exchange_width(sf_dir, "orders", "lineitem"))
            .groupby("nat")
            .aggregate(Sum("revenue4", alias_name="revenue4"))
        )

    def _name(t: pa.Table) -> pa.Table:
        names = [nat_names[int(k)] for k in
                 t["nat"].to_numpy(zero_copy_only=False)]
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "revenue4": t["revenue4"].cast(pa.int64())})

    out = folded.map_batches(_name, batch_format="pyarrow").to_pandas()
    if not len(out):   # a 0-row Dataset loses its schema through to_pandas
        return pd.DataFrame({"n_name": pd.Series(dtype=object),
                             "revenue4": pd.Series(dtype=np.int64)})
    return out.sort_values("n_name").reset_index(drop=True)


_Q14_LO, _Q14_HI = "1995-09-01", "1995-10-01"


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 promotion effect: the revenue share of PROMO parts in one
    ship-month. The part DIM broadcasts as a sorted (partkey, is_promo)
    pair; lineitem folds two exact revenue sums per batch and the ratio
    is one float division of the two integers, 6dp. Single-row result."""
    from ray.data.aggregate import Sum

    part_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
        .map_batches(
            lambda t: pa.table(
                {"p_partkey": t["p_partkey"],
                 "is_promo": pc.starts_with(t["p_type"], "PROMO")
                 .cast(pa.int64())}),
            batch_format="pyarrow"),
        "p_partkey", "is_promo")
    lo, hi = _date_us(_Q14_LO), _date_us(_Q14_HI)

    def _partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keep = (sd >= lo) & (sd < hi)
        ok, promo = _lookup(part_ref, t["l_partkey"].to_numpy(
            zero_copy_only=False)[keep])
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        rev = (ec * (100 - dp))[ok]
        pm = promo[ok] if len(ok) else np.array([], np.int64)
        return pa.table(
            {"promo_rev4": pa.array([int((rev * pm).sum())], pa.int64()),
             "total_rev4": pa.array([int(rev.sum())], pa.int64())}
        )

    agg = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
            filter=_ts_filter("l_shipdate", lo, hi),
        )
        .map_batches(_partial, batch_format="pyarrow")
        .aggregate(Sum("promo_rev4", alias_name="promo_rev4"),
                   Sum("total_rev4", alias_name="total_rev4"))
    )
    p, t = np.int64(agg["promo_rev4"] or 0), np.int64(agg["total_rev4"] or 0)
    if t == 0:
        return pd.DataFrame({"promo_rev4": pd.Series(dtype=np.int64),
                             "total_rev4": pd.Series(dtype=np.int64),
                             "promo_pct": pd.Series(dtype=np.float64)})
    from tsrollup.pipelines.queries import _round6

    return pd.DataFrame(
        [{"promo_rev4": p, "total_rev4": t,
          "promo_pct": float(_round6(100.0 * float(p) / float(t)))}]
    )


_Q18_QTY_C = 30000  # HAVING sum(l_quantity) > 300, in integer cents scale

_Q18_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("custkey", pa.int64()), ("odate", pa.int64()),
     ("price_c", pa.int64()), ("qty_c", pa.int64()), ("side", pa.int8())]
)


def _q18_big_rows(t: pa.Table) -> pa.Table:
    """Threshold the per-order quantity fold and shape it for the union
    exchange (side 1 rows)."""
    q = t["qty_c"].cast(pa.int64())
    mask = pc.greater(q, _Q18_QTY_C)
    keys = t["l_orderkey"].cast(pa.int64()).filter(mask)
    qv = q.filter(mask)
    z = pa.array(np.zeros(len(keys), np.int64))
    return pa.table(
        {"l_orderkey": keys, "custkey": z, "odate": z, "price_c": z,
         "qty_c": qv, "side": pa.array(np.ones(len(keys), np.int8))},
        schema=_Q18_SCHEMA
    )


# broadcast-lane cutover for q18's HAVING-survivor set: 16 B/entry ->
# ~32 MB at the cap. TPC-H's sum(qty) > 300 keeps ~6 orders per SF, so
# even a 100 TB corpus (~SF 100k) stays ~3 orders of magnitude below it;
# the exchange lane exists for a hypothetical low-threshold variant.
_Q18_BCAST_MAX = 2_000_000


def _q18_name_fn(names_ref):
    """Final broadcast customer-name attach shared by both q18 lanes."""
    def _name(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"c_name": pa.array([], pa.string()),
             "o_custkey": pa.array([], pa.int64()),
             "l_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.string()),
             "price_c": pa.array([], pa.int64()),
             "sum_qty_c": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ck = t["custkey"].to_numpy(zero_copy_only=False)
        ok, names = _lookup(names_ref, ck)
        if not ok.any():   # dangling custkeys drop, like the oracle's
            return empty   # inner JOIN customer
        return pa.table(
            {"c_name": pa.array(names[ok], pa.string()),
             "o_custkey": pa.array(ck[ok]),
             "l_orderkey": t["l_orderkey"].filter(pa.array(ok)),
             "o_orderdate": pa.array(
                 _fmt_date(t["odate"].to_numpy(zero_copy_only=False)[ok]),
                 pa.string()),
             "price_c": t["price_c"].filter(pa.array(ok)),
             "sum_qty_c": t["sum_qty_c"].filter(pa.array(ok))}
        )

    return _name


def _q18_broadcast_tail(sf_dir: str, big, names_ref):
    """q18 broadcast lane: the HAVING-surviving (orderkey, sum_qty) pairs
    collect once (bounded — the lane guard admits <= _Q18_BCAST_MAX rows),
    ship via one ``ray.put``, and the orders scan resolves membership and
    attaches the sum with one vectorized searchsorted per batch. Zero
    exchanges after the quantity fold — the union-exchange alternative
    spent ~2.6 s of fixed all-to-all overhead moving ~100 rows at sf0.1."""
    import ray

    bdf = big.to_pandas()  # bounded: HAVING survivors only (lane guard)
    if len(bdf):
        keys = bdf["l_orderkey"].to_numpy().astype(np.int64)
        qty = bdf["qty_c"].to_numpy().astype(np.int64)
    else:  # an empty Dataset yields a column-less frame
        keys = np.array([], np.int64)
        qty = np.array([], np.int64)
    order = np.argsort(keys, kind="stable")
    big_ref = ray.put((keys[order], qty[order]))

    def _orders_join(t: pa.Table) -> pa.Table:
        k, q = ray.get(big_ref)
        okeys = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.zeros(len(okeys), bool)
        sq = np.zeros(len(okeys), np.int64)
        if len(k):
            pos = np.searchsorted(k, okeys)
            inb = pos < len(k)
            hit[inb] = k[pos[inb]] == okeys[inb]
            sq[hit] = q[pos[hit]]
        # customer membership BEFORE the top-100 prune: a dangling
        # o_custkey must not occupy a LIMIT slot the oracle's inner JOIN
        # customer gives to the next order
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cust_ok, _ = _lookup(names_ref, ck)
        keep = hit & cust_ok
        return pa.table(
            {"l_orderkey": pa.array(okeys[keep]),
             "custkey": pa.array(ck[keep]),
             "odate": pa.array(t["o_orderdate"].to_numpy(
                 zero_copy_only=False).view(np.int64)[keep]),
             "price_c": pa.array(_cents(t["o_totalprice"].to_numpy(
                 zero_copy_only=False))[keep]),
             "sum_qty_c": pa.array(sq[keep])}
        )

    joined = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(_orders_join, batch_format="pyarrow")
    top = topk_rows(joined, ["price_c", "odate", "l_orderkey"],
                    [True, False, False], 100)
    return top.map_batches(_q18_name_fn(names_ref), batch_format="pyarrow")


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 large-volume customers — the aggregate-then-join
    (HAVING semi-join) shape: pass 1 folds per-order quantities
    (orderkey groupby) and keeps orders over the threshold; the
    surviving aggregates then join the orders FACT through one of two
    lanes (the repo's broadcast-vs-exchange posture): the HAVING makes
    the survivor set tiny (~6 orders per TPC-H SF, ~10 MB of (key, sum)
    pairs even at SF 100k), so below ``_Q18_BCAST_MAX`` the exact pairs
    broadcast via ``ray.put`` and the join is a vectorized searchsorted
    inside the orders scan — ZERO further exchanges (the union-exchange
    stage was ~2.6 s of pure all-to-all overhead on ~100 surviving
    rows, round-5 measurement). Above the cutover the aggregate rows
    stay a Dataset and meet orders in a Bloom-prefiltered orderkey
    exchange. Customer names resolve via one broadcast dim lookup at
    the end; top-100 by (totalprice desc, orderdate, orderkey) through
    the lossless per-block prune."""
    def _qty_partial(t: pa.Table) -> pa.Table:
        qc = _cents(t["l_quantity"].to_numpy(zero_copy_only=False))
        g = pa.table(
            {"l_orderkey": t["l_orderkey"], "qty_c": pa.array(qc)}
        ).group_by(["l_orderkey"]).aggregate([("qty_c", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "qty_c": g["qty_c_sum"].cast(pa.int64())})

    def _fold_block(t: pa.Table) -> pa.Table:
        # one key partition: finish the quantity fold AND apply the HAVING
        # threshold in place — fusing them into the exchange block saves
        # the generic Sum-aggregator machinery, which costs ~8x this plan's
        # wall on a partial-aggregated input (round-5 measurement)
        g = t.group_by(["l_orderkey"]).aggregate([("qty_c", "sum")])
        return _q18_big_rows(pa.table(
            {"l_orderkey": g["l_orderkey"],
             "qty_c": g["qty_c_sum"].cast(pa.int64())}))

    partials = (
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])
        .map_batches(_qty_partial, batch_format="pyarrow")
    )
    # width from fact bytes, not a materialized count: partials stream
    # straight into the fold exchange with no barrier (the two key/qty
    # columns are ~1/8 of lineitem's bytes, hence frac=8 — applied to the
    # BYTES before clamping, so a large corpus still gets cluster width)
    P = _exchange_width(sf_dir, "lineitem", frac=8)
    big = map_key_partitions(
        partials, ["l_orderkey"], _fold_block, num_partitions=P
    ).materialize()  # consumed twice on the exchange lane

    import ray

    names_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"]),
        "c_custkey", "c_name", str_vals=True)

    if big.count() <= _Q18_BCAST_MAX:
        return _q18_broadcast_tail(sf_dir, big, names_ref)

    # exchange lane: HAVING makes the big-keys side tiny, so a 128 KiB
    # Bloom bitmap of it prefilters the orders FACT before the exchange —
    # the shuffle carries only qualifying orders plus the false-positive
    # sliver, and the inner join against the real aggregate rows drops
    # those FPs exactly (round-4 VERDICT next #5; q_semi_join_bloom shape)
    from tsrollup.shuffle import bloom_build, bloom_keep

    bm_ref = ray.put(bloom_build(big, "l_orderkey"))

    def _orders(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(bloom_keep(
            ray.get(bm_ref),
            t["o_orderkey"].to_numpy(zero_copy_only=False))))
        # the customer membership filter runs BEFORE the exchange and the
        # top-100 prune: a dangling o_custkey must not occupy a LIMIT slot
        # the oracle's inner JOIN customer gives to the next order
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        ok, _ = _lookup(names_ref, ck)
        t = t.filter(pa.array(ok))
        n = t.num_rows
        return pa.table(
            {"l_orderkey": t["o_orderkey"].cast(pa.int64()),
             "custkey": t["o_custkey"].cast(pa.int64()),
             "odate": pa.array(t["o_orderdate"].to_numpy(
                 zero_copy_only=False).view(np.int64)),
             "price_c": pa.array(_cents(t["o_totalprice"].to_numpy(
                 zero_copy_only=False))),
             "qty_c": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q18_SCHEMA
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(_orders, batch_format="pyarrow")

    def _join_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "custkey": pa.array([], pa.int64()),
             "odate": pa.array([], pa.int64()),
             "price_c": pa.array([], pa.int64()),
             "sum_qty_c": pa.array([], pa.int64())}
        )
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        if not ok.any():
            return empty
        oi = so[posc[ok]]
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": pa.array(keys[om][oi]),
             "custkey": pa.array(t["custkey"].to_numpy(
                 zero_copy_only=False)[om][oi]),
             "odate": pa.array(t["odate"].to_numpy(
                 zero_copy_only=False)[om][oi]),
             "price_c": pa.array(t["price_c"].to_numpy(
                 zero_copy_only=False)[om][oi]),
             "sum_qty_c": pa.array(t["qty_c"].to_numpy(
                 zero_copy_only=False)[~om][ok])}
        )

    joined = map_key_partitions(
        orders.union(big), ["l_orderkey"], _join_block,
        num_partitions=_exchange_width(sf_dir, "orders"))
    top = topk_rows(joined, ["price_c", "odate", "l_orderkey"],
                    [True, False, False], 100)
    return top.map_batches(_q18_name_fn(names_ref), batch_format="pyarrow")


_Q4_LO, _Q4_HI = "1995-07-01", "1995-10-01"
_Q4_BCAST_MAX = 2_000_000
_Q4_LATE_DAYS = 60  # 'late' = shipped more than this many days after order

_Q4_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("odate", pa.int64()), ("sdate", pa.int64()),
     ("prio", pa.string()), ("side", pa.int8())]
)


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 order-priority checking, adapted to this corpus's columns
    (no commit/receipt dates, so 'problem order' = EXISTS a lineitem
    shipped more than ``_Q4_LATE_DAYS`` days after the order date — the
    same EXISTS-correlated-semi-join shape as the textbook query; the
    oracle runs the identical adapted predicate). Below ``_Q4_BCAST_MAX``
    surviving orders the quarter's triples broadcast and the lineitem
    scan emits distinct late orderkeys (one tiny survivor-keyed dedup
    makes EXISTS exact); above it, one orderkey exchange where the
    EXISTS resolves vectorized per partition (match lineitems to
    their order, compare ship vs order+Δ, mark seen orders once)."""
    from ray.data.aggregate import Sum

    lo, hi = _date_us(_Q4_LO), _date_us(_Q4_HI)
    late_us = _Q4_LATE_DAYS * _US

    def _orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keep = (od >= lo) & (od < hi)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "odate": pa.array(od[keep]),
             "sdate": pa.array(np.zeros(n, np.int64)),
             "prio": t["o_orderpriority"].filter(pa.array(keep)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q4_SCHEMA
        )

    def _items(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"l_orderkey": t["l_orderkey"].cast(pa.int64()),
             "odate": pa.array(np.zeros(n, np.int64)),
             "sdate": pa.array(t["l_shipdate"].to_numpy(
                 zero_copy_only=False).view(np.int64)),
             "prio": pa.array([""] * n, pa.string()),
             "side": pa.array(np.ones(n, np.int8))}, schema=_Q4_SCHEMA
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=_ts_filter("o_orderdate", lo, hi),
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    if orders.count() <= _Q4_BCAST_MAX:
        # broadcast lane: the quarter's (orderkey, odate, prio) triples
        # ship once; the lineitem scan emits each batch's DISTINCT late
        # orderkeys, one tiny survivor-keyed dedup makes the EXISTS exact
        # across batches, and the priority fold reads the broadcast — no
        # full-fact orderkey exchange.
        okeys, odate, prio = _collect_sorted_cols(  # bounded: lane guard
            orders, ("l_orderkey", "odate", "prio"), obj_cols=("prio",))
        pair_ref = ray.put((okeys, odate, prio))

        def _late_keys(t: pa.Table) -> pa.Table:
            k, od, _pr = ray.get(pair_ref)
            sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
            lk = t["l_orderkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            hit, pos = _match_sorted(k, lk)
            late = hit & (sd > od[pos] + late_us) if len(k) else hit
            return pa.table(
                {"l_orderkey": pa.array(np.unique(lk[late]))})

        def _prio_fold(t: pa.Table) -> pa.Table:
            k, _od, pr = ray.get(pair_ref)
            ck = t["l_orderkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            if not len(ck):
                return pa.table({"o_orderpriority": pa.array([], pa.string()),
                                 "n_orders": pa.array([], pa.int64())})
            pos = np.searchsorted(k, ck)  # every deduped key came from k
            up, inv = np.unique(pr[pos].astype(str), return_inverse=True)
            return pa.table(
                {"o_orderpriority": pa.array(up, pa.string()),
                 "n_orders": pa.array(np.bincount(inv).astype(np.int64))})

        lates = (
            read_parquet_clean(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_shipdate"])
            .map_batches(_late_keys, batch_format="pyarrow")
            .groupby("l_orderkey")
            .count()
            .select_columns(["l_orderkey"])
        )
        return (
            lates.map_batches(_prio_fold, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_orders", alias_name="n_orders"))
        )

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(_items, batch_format="pyarrow")

    def _exists_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                          "n_orders": pa.array([], pa.int64())})
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        odate = t["odate"].to_numpy(zero_copy_only=False)[om][so]
        sd = t["sdate"].to_numpy(zero_copy_only=False)[~om]
        late = ok & (sd > odate[posc] + late_us)
        if not late.any():
            return empty
        seen = np.zeros(len(so), bool)
        seen[posc[late]] = True
        prio = t["prio"].to_numpy(zero_copy_only=False)[om][so][seen]
        g = pa.table(
            {"o_orderpriority": pa.array(prio, pa.string()),
             "one": pa.array(np.ones(len(prio), np.int64))}
        ).group_by(["o_orderpriority"]).aggregate([("one", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "n_orders": g["one_sum"].cast(pa.int64())})

    return (
        map_key_partitions(
            orders.union(items), ["l_orderkey"], _exists_block,
            num_partitions=_exchange_width(sf_dir, "orders", "lineitem"))
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


_Q10_LO, _Q10_HI = "1995-10-01", "1996-01-01"

_Q10_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("custkey", pa.int64()), ("rev4", pa.int64()),
     ("side", pa.int8())]
)


# broadcast-lane cutover for q10's quarter-filtered orders side: the
# quarter is a fixed ~4% of orders, so it GROWS with the corpus (unlike
# q18's HAVING set) — the guard is what keeps the lane honest at scale
# (2M pairs ~= 32 MB broadcast; a 100 TB corpus takes the exchange lane).
_Q10_BCAST_MAX = 2_000_000


def _q10_name_fn(names_ref):
    """Final broadcast customer-name attach shared by both q10 lanes."""
    def _name(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c_name": pa.array([], pa.string()),
                             "revenue4": pa.array([], pa.int64())})
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        ok, names = _lookup(names_ref, ck)
        return pa.table(
            {"c_custkey": pa.array(ck[ok]),
             "c_name": pa.array(names[ok], pa.string()),
             "revenue4": t["revenue4"].filter(pa.array(ok))}
        )

    return _name


def _q10_broadcast_tail(sf_dir: str, orders, names_ref):
    """q10 broadcast lane: the quarter's (orderkey, custkey) pairs collect
    once (bounded — the lane guard admits <= _Q10_BCAST_MAX rows), ship
    via one ``ray.put``, and the returned-lineitem scan joins by
    searchsorted and pre-folds (custkey, revenue) per batch, leaving only
    the tiny custkey Sum — no orderkey exchange at all (the union
    exchange spent ~3.8 s of fixed all-to-all overhead at sf0.1)."""
    from ray.data.aggregate import Sum

    import ray

    # bounded collect: one quarter of orders (lane guard)
    okeys, ocust = _collect_sorted_cols(orders, ("l_orderkey", "custkey"))
    pair_ref = ray.put((okeys, ocust))

    def _items_join(t: pa.Table) -> pa.Table:
        k, cust = ray.get(pair_ref)
        keep = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        lk = t["l_orderkey"].to_numpy(zero_copy_only=False)[keep].astype(
            np.int64)
        hit = np.zeros(len(lk), bool)
        if len(k):
            pos = np.searchsorted(k, lk)
            inb = pos < len(k)
            hit[inb] = k[pos[inb]] == lk[inb]
        if not hit.any():
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "revenue4": pa.array([], pa.int64())})
        ec = _cents(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep][hit])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep][hit])
        ck = cust[pos[hit]]
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, ec * (100 - dp))
        return pa.table({"c_custkey": pa.array(uk), "revenue4": pa.array(s)})

    folded = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"],
            filter=pc.field("l_returnflag") == "R",
        )
        .map_batches(_items_join, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("revenue4", alias_name="revenue4"))
        .map_batches(
            lambda t: pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                                "revenue4": t["revenue4"].cast(pa.int64())}),
            batch_format="pyarrow")
    )
    top = topk_rows(folded, ["revenue4", "c_custkey"], [True, False], 20)
    return top.map_batches(_q10_name_fn(names_ref), batch_format="pyarrow")


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue lost
    to returns (l_returnflag = 'R') against orders of one quarter. Same
    physical family as q3/q18 — orderkey exchange join of two
    pre-filtered facts, a custkey fold, the lossless top-k prune, then
    one broadcast name lookup on the 20 survivors."""
    from ray.data.aggregate import Sum

    lo, hi = _date_us(_Q10_LO), _date_us(_Q10_HI)

    names_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"]),
        "c_custkey", "c_name", str_vals=True)

    def _orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        # customer membership BEFORE the exchange and top-20 prune: a
        # dangling o_custkey must not occupy a LIMIT slot the oracle's
        # inner JOIN customer gives to the next customer
        ok, _ = _lookup(names_ref,
                        t["o_custkey"].to_numpy(zero_copy_only=False))
        keep = ok & (od >= lo) & (od < hi)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "custkey": pa.array(
                 t["o_custkey"].to_numpy(zero_copy_only=False)[keep]),
             "rev4": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q10_SCHEMA
        )

    def _items(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "custkey": pa.array(np.zeros(n, np.int64)),
             "rev4": pa.array(ec * (100 - dp)),
             "side": pa.array(np.ones(n, np.int8))}, schema=_Q10_SCHEMA
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=_ts_filter("o_orderdate", lo, hi),
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    # broadcast lane (q18 posture): the quarter's (orderkey, custkey)
    # pairs are one date-cut fraction of orders — small enough to ship
    # exactly below the cutover, where the returned-lineitem scan joins
    # by searchsorted and pre-folds (custkey, revenue) per batch with
    # ZERO exchanges before the tiny custkey Sum. Above the cutover
    # (the quarter grows linearly with the corpus) the Bloom-prefiltered
    # orderkey exchange below is the scale plan.
    if orders.count() <= _Q10_BCAST_MAX:
        # the quarter date cut is already baked into ``orders``
        return _q10_broadcast_tail(sf_dir, orders, names_ref)

    # exchange lane: the quarter's date cut keeps the orders side small;
    # Bloom-prefilter the returned-lineitem FACT before the exchange; the
    # inner join against the real order rows drops false positives exactly
    from tsrollup.shuffle import bloom_build, bloom_keep

    bm_ref = ray.put(bloom_build(orders, "l_orderkey"))

    _items_pruned = _bloom_pruned(bm_ref, "l_orderkey", _items)

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
        # string-equality pushdown: same comparison the batch mask applies
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(_items_pruned, batch_format="pyarrow")

    def _join_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "revenue4": pa.array([], pa.int64())})
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        if not ok.any():
            return empty
        ck = t["custkey"].to_numpy(zero_copy_only=False)[om][so][posc[ok]]
        rev = t["rev4"].to_numpy(zero_copy_only=False)[~om][ok]
        uk, inv = np.unique(ck, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"c_custkey": pa.array(uk), "revenue4": pa.array(s)})

    folded = (
        map_key_partitions(
            orders.union(items), ["l_orderkey"], _join_block,
            num_partitions=_exchange_width(sf_dir, "orders", "lineitem"))
        .groupby("c_custkey")
        .aggregate(Sum("revenue4", alias_name="revenue4"))
        .map_batches(
            lambda t: pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                                "revenue4": t["revenue4"].cast(pa.int64())}),
            batch_format="pyarrow")
    )
    top = topk_rows(folded, ["revenue4", "c_custkey"], [True, False], 20)
    return top.map_batches(_q10_name_fn(names_ref), batch_format="pyarrow")


_Q15_LO, _Q15_HI = "1996-01-01", "1996-04-01"


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 top supplier(s): the supplier(s) achieving the MAXIMUM
    quarterly revenue — the argmax-WITH-TIES shape (every supplier equal
    to the max is kept, unlike a top-k). Lineitem folds per-supplier
    revenue; the supplier-bounded fold materializes once and serves both
    the global max and the equality filter; names resolve through one
    broadcast dim lookup. Exact integer revenue, so the tie comparison
    is exact on both sides."""
    from ray.data.aggregate import Max, Sum

    lo, hi = _date_us(_Q15_LO), _date_us(_Q15_HI)

    def _partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keep = (sd >= lo) & (sd < hi)
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        g = pa.table(
            {"s_suppkey": pa.array(
                t["l_suppkey"].to_numpy(zero_copy_only=False)[keep]),
             "rev4": pa.array(ec * (100 - dp))}
        ).group_by(["s_suppkey"]).aggregate([("rev4", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"].cast(pa.int64()),
                         "revenue4": g["rev4_sum"].cast(pa.int64())})

    folded = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
            filter=_ts_filter("l_shipdate", lo, hi),
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("revenue4", alias_name="revenue4"))
        .materialize()  # consumed twice: global max + equality filter
    )
    mx = folded.aggregate(Max("revenue4", alias_name="mx"))["mx"]
    if mx is None:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object),
                             "revenue4": pd.Series(dtype=np.int64)})
    names_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", str_vals=True)

    def _sel(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["revenue4"], mx))
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
        ok, names = _lookup(names_ref, sk)
        return pa.table(
            {"s_suppkey": pa.array(sk[ok]).cast(pa.int64()),
             "s_name": pa.array(names[ok], pa.string()),
             "revenue4": t["revenue4"].filter(pa.array(ok)).cast(pa.int64())}
        )

    out = folded.map_batches(_sel, batch_format="pyarrow").to_pandas()
    if not len(out):   # every max-revenue suppkey can be dangling — the
        # oracle's JOIN supplier then returns no rows; 0-row Datasets lose
        # their schema through to_pandas, so rebuild the typed frame
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object),
                             "revenue4": pd.Series(dtype=np.int64)})
    return out.sort_values("s_suppkey").reset_index(drop=True)


_Q7_SUPP_REGION, _Q7_CUST_REGION = "ASIA", "EUROPE"
_Q7_LO, _Q7_HI = "1996-01-01", "1998-01-01"

_Q7_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("nat", pa.int64()), ("l_year", pa.int64()),
     ("rev4", pa.int64()), ("side", pa.int8())]
)
_Q7_BCAST_MAX = 2_000_000


def _region_nations(sf_dir: str, region_name: str):
    """(sorted nationkey array, {nationkey: n_name}) for one region —
    resolved driver-side from the two bounded dims (5 regions, 25
    nations), the same plan q5 uses."""
    import pyarrow.parquet as pq

    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = reg["r_regionkey"].to_numpy(zero_copy_only=False)[
        pc.equal(reg["r_name"], region_name).combine_chunks().to_numpy(
            zero_copy_only=False)]
    ntab = pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    in_region = np.isin(
        ntab["n_regionkey"].to_numpy(zero_copy_only=False), rkeys)
    keys = np.sort(ntab["n_nationkey"].to_numpy(
        zero_copy_only=False)[in_region].astype(np.int64))
    names = {int(k): n for k, n, m in zip(
        ntab["n_nationkey"].to_numpy(zero_copy_only=False),
        ntab["n_name"].to_pylist(), in_region) if m}
    return keys, names


def _year_from_us(us: np.ndarray) -> np.ndarray:
    """EXTRACT(year FROM ts) as int64, vectorized civil-date conversion."""
    from tsrollup.pipelines.queries import _civil_from_days

    y, _, _ = _civil_from_days(us // _US)
    return y.astype(np.int64)


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 volume shipping: bilateral trade revenue between the
    supplier nations of one region and the customer nations of another,
    per (supp_nation, cust_nation, ship year), both directions. Plan:
    nation/region membership resolves driver-side; customer->nation and
    supplier->nation broadcast as sorted pairs; orders rows carry the
    customer nation, lineitem rows carry the supplier nation + ship year
    + revenue; the direction predicate ((s in A and c in B) or (s in B
    and c in A)) runs vectorized inside one orderkey exchange, and the
    (supp, cust, year) fold is bounded by nations^2 x years."""
    sn_keys, sn_names = _region_nations(sf_dir, _Q7_SUPP_REGION)
    cn_keys, cn_names = _region_nations(sf_dir, _Q7_CUST_REGION)
    both = np.union1d(sn_keys, cn_keys)
    names = {**sn_names, **cn_names}

    cust_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    supp_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")
    lo, hi = _date_us(_Q7_LO), _date_us(_Q7_HI)

    def _orders(t: pa.Table) -> pa.Table:
        ok, cn = _lookup(cust_ref, t["o_custkey"].to_numpy(
            zero_copy_only=False))
        keep = ok & np.isin(cn, both)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "nat": pa.array(cn[keep]),
             "l_year": pa.array(np.zeros(n, np.int64)),
             "rev4": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q7_SCHEMA)

    def _items(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
        ok, sn = _lookup(supp_ref, t["l_suppkey"].to_numpy(
            zero_copy_only=False))
        keep = ok & (sd >= lo) & (sd < hi) & np.isin(sn, both)
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {"l_orderkey": pa.array(
                t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "nat": pa.array(sn[keep]),
             "l_year": pa.array(_year_from_us(sd[keep])),
             "rev4": pa.array(ec * (100 - dp)),
             "side": pa.array(np.ones(int(keep.sum()), np.int8))},
            schema=_Q7_SCHEMA)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    if orders.count() <= _Q7_BCAST_MAX:
        # broadcast lane: the region-pair customers' (orderkey, nation)
        # pairs ship once; the lineitem scan resolves both nations, applies
        # the direction predicate and folds (supp, cust, year) per batch —
        # <= nations^2 x years rows per batch, so the remaining combine is
        # the same driver-side bounded reduction the exchange lane uses.
        okeys, onat = _collect_sorted_cols(  # bounded: lane guard
            orders, ("l_orderkey", "nat"))
        pair_ref = ray.put((okeys, onat))

        def _items_fold(t: pa.Table) -> pa.Table:
            k, cn_arr = ray.get(pair_ref)
            sd = t["l_shipdate"].to_numpy(zero_copy_only=False).view(np.int64)
            ok, sn = _lookup(supp_ref, t["l_suppkey"].to_numpy(
                zero_copy_only=False))
            keep = ok & (sd >= lo) & (sd < hi) & np.isin(sn, both)
            lk = t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)
            hit, pos = _match_sorted(k, lk)
            if len(k):
                supp, cust = sn[keep], cn_arr[pos]
                hit &= ((np.isin(supp, sn_keys) & np.isin(cust, cn_keys))
                        | (np.isin(supp, cn_keys) & np.isin(cust, sn_keys)))
            if not hit.any():
                return pa.table({"supp_nat": pa.array([], pa.int64()),
                                 "cust_nat": pa.array([], pa.int64()),
                                 "l_year": pa.array([], pa.int64()),
                                 "revenue4": pa.array([], pa.int64())})
            ec = _cents(t["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep][hit])
            dp = _cents(t["l_discount"].to_numpy(
                zero_copy_only=False)[keep][hit])
            g = pa.table(
                {"supp_nat": pa.array(supp[hit]),
                 "cust_nat": pa.array(cust[hit]),
                 "l_year": pa.array(_year_from_us(sd[keep][hit])),
                 "rev4": pa.array(ec * (100 - dp))}
            ).group_by(["supp_nat", "cust_nat", "l_year"]).aggregate(
                [("rev4", "sum")])
            return pa.table(
                {"supp_nat": g["supp_nat"].cast(pa.int64()),
                 "cust_nat": g["cust_nat"].cast(pa.int64()),
                 "l_year": g["l_year"].cast(pa.int64()),
                 "revenue4": g["rev4_sum"].cast(pa.int64())})

        parts_ds = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"],
            filter=_ts_filter("l_shipdate", lo, hi),
        ).map_batches(_items_fold, batch_format="pyarrow")
        return _q7_fold_tail(parts_ds.to_pandas(), names)

    # exchange lane: Bloom-prefilter lineitem against surviving orderkeys
    from tsrollup.shuffle import bloom_build, bloom_keep

    bm_ref = ray.put(bloom_build(orders, "l_orderkey"))

    _items_pruned = _bloom_pruned(bm_ref, "l_orderkey", _items)

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=_ts_filter("l_shipdate", lo, hi),
    ).map_batches(_items_pruned, batch_format="pyarrow")

    def _join_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"supp_nat": pa.array([], pa.int64()),
                          "cust_nat": pa.array([], pa.int64()),
                          "l_year": pa.array([], pa.int64()),
                          "revenue4": pa.array([], pa.int64())})
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        cust = t["nat"].to_numpy(zero_copy_only=False)[om][so]
        supp = t["nat"].to_numpy(zero_copy_only=False)[~om]
        c_nat = cust[posc]
        ok &= ((np.isin(supp, sn_keys) & np.isin(c_nat, cn_keys))
               | (np.isin(supp, cn_keys) & np.isin(c_nat, sn_keys)))
        if not ok.any():
            return empty
        g = pa.table(
            {"supp_nat": pa.array(supp[ok]),
             "cust_nat": pa.array(c_nat[ok]),
             "l_year": pa.array(
                 t["l_year"].to_numpy(zero_copy_only=False)[~om][ok]),
             "rev4": pa.array(
                 t["rev4"].to_numpy(zero_copy_only=False)[~om][ok])}
        ).group_by(["supp_nat", "cust_nat", "l_year"]).aggregate(
            [("rev4", "sum")])
        return pa.table(
            {"supp_nat": g["supp_nat"].cast(pa.int64()),
             "cust_nat": g["cust_nat"].cast(pa.int64()),
             "l_year": g["l_year"].cast(pa.int64()),
             "revenue4": g["rev4_sum"].cast(pa.int64())})

    # each partition already folds to (supp, cust, year) — the whole
    # remaining input is bounded by partitions x nations^2 x years, so the
    # final combine is a driver-side bounded reduction (a distributed
    # Sum-aggregator fold here is pure fixed overhead; same int64 bounds)
    parts = map_key_partitions(
        orders.union(items), ["l_orderkey"], _join_block,
        num_partitions=_exchange_width(sf_dir, "orders", "lineitem"),
    ).to_pandas()
    return _q7_fold_tail(parts, names)


def _q7_fold_tail(parts: pd.DataFrame, names: dict) -> pd.DataFrame:
    """Driver-side bounded (supp, cust, year) combine + name attach shared
    by q7's broadcast and exchange lanes."""
    if not len(parts):
        return pd.DataFrame(
            {"supp_nation": pd.Series(dtype=object),
             "cust_nation": pd.Series(dtype=object),
             "l_year": pd.Series(dtype=np.int64),
             "revenue4": pd.Series(dtype=np.int64)})
    folded = parts.groupby(
        ["supp_nat", "cust_nat", "l_year"], as_index=False)["revenue4"].sum()
    out = pd.DataFrame(
        {"supp_nation": [names[int(k)] for k in folded["supp_nat"]],
         "cust_nation": [names[int(k)] for k in folded["cust_nat"]],
         "l_year": folded["l_year"].astype(np.int64),
         "revenue4": folded["revenue4"].astype(np.int64)})
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


_Q8_CUST_REGION = "ASIA"
_Q8_TARGET_NATION = 12          # NATION_12 — nonzero share at sf >= 0.001
_Q8_PART_TYPE = "ECONOMY"
_Q8_LO, _Q8_HI = "1995-01-01", "1997-01-01"

_Q8_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("o_year", pa.int64()),
     ("is_target", pa.int64()), ("rev4", pa.int64()), ("side", pa.int8())]
)
_Q8_BCAST_MAX = 2_000_000


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 national market share: the target nation's share of
    revenue, per order year, among lineitems of one part type sold to
    customers of one region. Plan: the part-type membership and the two
    nation maps broadcast; orders rows carry the order year (region
    membership already applied), lineitem rows carry the target flag +
    revenue; the per-year (target_rev, total_rev) fold runs inside one
    orderkey exchange and the share is one float division of exact
    integers per year."""
    cust_nations, _ = _region_nations(sf_dir, _Q8_CUST_REGION)
    part_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
        .map_batches(
            lambda t: pa.table(
                {"p_partkey": t["p_partkey"],
                 "is_type": pc.equal(t["p_type"], _Q8_PART_TYPE)
                 .cast(pa.int64())}),
            batch_format="pyarrow"),
        "p_partkey", "is_type")
    cust_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]),
        "c_custkey", "c_nationkey")
    supp_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", "s_nationkey")
    lo, hi = _date_us(_Q8_LO), _date_us(_Q8_HI)

    def _orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        ok, cn = _lookup(cust_ref, t["o_custkey"].to_numpy(
            zero_copy_only=False))
        keep = ok & (od >= lo) & (od < hi) & np.isin(cn, cust_nations)
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "o_year": pa.array(_year_from_us(od[keep])),
             "is_target": pa.array(np.zeros(n, np.int64)),
             "rev4": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q8_SCHEMA)

    def _items(t: pa.Table) -> pa.Table:
        pok, is_type = _lookup(part_ref, t["l_partkey"].to_numpy(
            zero_copy_only=False))
        sok, sn = _lookup(supp_ref, t["l_suppkey"].to_numpy(
            zero_copy_only=False))
        keep = pok & sok & (is_type == 1)
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        n = int(keep.sum())
        return pa.table(
            {"l_orderkey": pa.array(
                t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
             "o_year": pa.array(np.zeros(n, np.int64)),
             "is_target": pa.array(
                 (sn[keep] == _Q8_TARGET_NATION).astype(np.int64)),
             "rev4": pa.array(ec * (100 - dp)),
             "side": pa.array(np.ones(n, np.int8))}, schema=_Q8_SCHEMA)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=_ts_filter("o_orderdate", lo, hi),
    ).map_batches(_orders, batch_format="pyarrow").materialize()

    import ray

    if orders.count() <= _Q8_BCAST_MAX:
        # broadcast lane: the two years' region-customer (orderkey, year)
        # pairs ship once; the lineitem scan applies the part-type +
        # supplier lookups, joins by searchsorted and folds the per-year
        # (target, total) pair per batch — <= |years| rows per batch, so
        # the remaining combine is the same driver-side bounded reduction.
        okeys, oyear = _collect_sorted_cols(  # bounded: lane guard
            orders, ("l_orderkey", "o_year"))
        pair_ref = ray.put((okeys, oyear))

        def _items_fold(t: pa.Table) -> pa.Table:
            k, yr_arr = ray.get(pair_ref)
            pok, is_type = _lookup(part_ref, t["l_partkey"].to_numpy(
                zero_copy_only=False))
            sok, sn = _lookup(supp_ref, t["l_suppkey"].to_numpy(
                zero_copy_only=False))
            keep = pok & sok & (is_type == 1)
            lk = t["l_orderkey"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)
            hit, pos = _match_sorted(k, lk)
            if not hit.any():
                return pa.table({"o_year": pa.array([], pa.int64()),
                                 "nation_rev4": pa.array([], pa.int64()),
                                 "total_rev4": pa.array([], pa.int64())})
            ec = _cents(t["l_extendedprice"].to_numpy(
                zero_copy_only=False)[keep][hit])
            dp = _cents(t["l_discount"].to_numpy(
                zero_copy_only=False)[keep][hit])
            rev = ec * (100 - dp)
            tgt = (sn[keep][hit] == _Q8_TARGET_NATION).astype(np.int64)
            uy, inv = np.unique(yr_arr[pos[hit]], return_inverse=True)
            tot = np.zeros(len(uy), np.int64)
            nat = np.zeros(len(uy), np.int64)
            np.add.at(tot, inv, rev)
            np.add.at(nat, inv, rev * tgt)
            return pa.table({"o_year": pa.array(uy),
                             "nation_rev4": pa.array(nat),
                             "total_rev4": pa.array(tot)})

        parts = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"],
        ).map_batches(_items_fold, batch_format="pyarrow").to_pandas()
        return _q8_fold_tail(parts)

    # exchange lane: Bloom-prefilter lineitem against surviving orderkeys
    from tsrollup.shuffle import bloom_build, bloom_keep

    bm_ref = ray.put(bloom_build(orders, "l_orderkey"))

    _items_pruned = _bloom_pruned(bm_ref, "l_orderkey", _items)

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(_items_pruned, batch_format="pyarrow")

    def _join_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "nation_rev4": pa.array([], pa.int64()),
                          "total_rev4": pa.array([], pa.int64())})
        parts = _union_join_parts(t)
        if parts is None:
            return empty
        so, om, ok, posc = parts
        yr = t["o_year"].to_numpy(zero_copy_only=False)[om][so][posc][ok]
        rev = t["rev4"].to_numpy(zero_copy_only=False)[~om][ok]
        tgt = t["is_target"].to_numpy(zero_copy_only=False)[~om][ok]
        if not len(yr):
            return empty
        uy, inv = np.unique(yr, return_inverse=True)
        tot = np.zeros(len(uy), np.int64)
        nat = np.zeros(len(uy), np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(nat, inv, rev * tgt)
        return pa.table({"o_year": pa.array(uy),
                         "nation_rev4": pa.array(nat),
                         "total_rev4": pa.array(tot)})

    # per-partition output is <= |years| rows: the final combine is a
    # driver-side bounded reduction (a distributed Sum fold here is pure
    # fixed overhead; same int64 bounds)
    parts = map_key_partitions(
        orders.union(items), ["l_orderkey"], _join_block,
        num_partitions=_exchange_width(sf_dir, "orders", "lineitem"),
    ).to_pandas()
    return _q8_fold_tail(parts)


def _q8_fold_tail(parts: pd.DataFrame) -> pd.DataFrame:
    """Driver-side bounded per-year (target, total) combine + share
    division shared by q8's broadcast and exchange lanes."""
    if len(parts):
        folded = parts.groupby("o_year", as_index=False)[
            ["nation_rev4", "total_rev4"]].sum()
    else:  # an empty Dataset yields a column-less frame
        folded = parts
    if not len(folded):
        return pd.DataFrame({"o_year": pd.Series(dtype=np.int64),
                             "nation_rev4": pd.Series(dtype=np.int64),
                             "total_rev4": pd.Series(dtype=np.int64),
                             "mkt_share": pd.Series(dtype=np.float64)})
    from tsrollup.pipelines.queries import _round6

    folded = folded.sort_values("o_year").reset_index(drop=True)
    folded["o_year"] = folded["o_year"].astype(np.int64)
    folded["nation_rev4"] = folded["nation_rev4"].astype(np.int64)
    folded["total_rev4"] = folded["total_rev4"].astype(np.int64)
    folded["mkt_share"] = _round6(
        folded["nation_rev4"].to_numpy(np.float64)
        / folded["total_rev4"].to_numpy(np.float64))
    return folded


_Q13_EXCLUDE = "5-LOW"   # o_orderpriority class excluded from the count

_Q13_SCHEMA = pa.schema(
    [("c_custkey", pa.int64()), ("cnt", pa.int64()), ("side", pa.int8())]
)


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 customer distribution: how many customers placed exactly
    k qualifying orders, INCLUDING k = 0 — the LEFT OUTER JOIN shape (the
    testdata lacks o_comment, so the qualifying filter is an order
    priority class instead of the spec's NOT LIKE). Plan: orders fold a
    per-batch (custkey, count) partial; customers enter the same custkey
    exchange as zero-count rows; each partition resolves its customers'
    totals (absent order rows = count 0 — the outer join falls out of the
    union) and folds the local count histogram, so only (c_count,
    custdist) partials leave the exchange."""
    from ray.data.aggregate import Sum

    def _cust(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {"c_custkey": t["c_custkey"].cast(pa.int64()),
             "cnt": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.zeros(n, np.int8))}, schema=_Q13_SCHEMA)

    def _orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["o_orderpriority"], _Q13_EXCLUDE)))
        g = pa.table(
            {"c_custkey": t["o_custkey"],
             "one": pa.array(np.ones(t.num_rows, np.int64))}
        ).group_by(["c_custkey"]).aggregate([("one", "sum")])
        n = g.num_rows
        return pa.table(
            {"c_custkey": g["c_custkey"].cast(pa.int64()),
             "cnt": g["one_sum"].cast(pa.int64()),
             "side": pa.array(np.ones(n, np.int8))}, schema=_Q13_SCHEMA)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
    ).map_batches(_cust, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(_orders, batch_format="pyarrow")

    def _hist_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_count": pa.array([], pa.int64()),
                          "custdist": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        side = t["side"].to_numpy(zero_copy_only=False)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        cm = side == 0
        c_keys = np.sort(keys[cm])
        if not len(c_keys):
            return empty
        totals = np.zeros(len(c_keys), np.int64)
        ok, posc = _match_sorted(c_keys, keys[~cm])
        np.add.at(totals, posc[ok],
                  t["cnt"].to_numpy(zero_copy_only=False)[~cm][ok])
        counts, dist = np.unique(totals, return_counts=True)
        return pa.table({"c_count": pa.array(counts),
                         "custdist": pa.array(dist.astype(np.int64))})

    out = (
        map_key_partitions(
            cust.union(orders), ["c_custkey"], _hist_block,
            num_partitions=_exchange_width(sf_dir, "customer", "orders"))
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"c_count": pd.Series(dtype=np.int64),
                             "custdist": pd.Series(dtype=np.int64)})
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


_Q17_BRAND = "Brand#3"


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 small-quantity-order revenue: total and avg-yearly
    revenue from lineitems of one brand whose quantity is below 20% of
    that part's average quantity (the testdata lacks p_container, so the
    part filter is brand-only). The correlated per-part average resolves
    inside one partkey exchange — each part's full lineitem group lands
    in one partition, where the spec predicate ``qty < 0.2 * avg(qty)``
    runs as the exact integer rewrite ``5 * qc * n < sum_qc`` (qc <=
    5000 cents, so the product is far inside int64). Only a one-row
    (sum, count) partial leaves each partition."""
    from ray.data.aggregate import Sum

    brand_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"], _Q17_BRAND))
            .select(["p_partkey"]),
            batch_format="pyarrow"),
        "p_partkey", None)

    def _items(t: pa.Table) -> pa.Table:
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep, _ = _lookup(brand_ref, keys)
        return pa.table(
            {"l_partkey": pa.array(keys[keep].astype(np.int64)),
             "qc": pa.array(_cents(
                 t["l_quantity"].to_numpy(zero_copy_only=False)[keep])),
             "ec": pa.array(_cents(
                 t["l_extendedprice"].to_numpy(
                     zero_copy_only=False)[keep]))})

    def _small_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"total_ec": pa.array([], pa.int64()),
                             "n_small": pa.array([], pa.int64())})
        order = np.argsort(
            t["l_partkey"].to_numpy(zero_copy_only=False), kind="stable")
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)[order]
        qc = t["qc"].to_numpy(zero_copy_only=False)[order]
        ec = t["ec"].to_numpy(zero_copy_only=False)[order]
        starts = np.concatenate(([0], np.flatnonzero(pk[1:] != pk[:-1]) + 1))
        sums = np.add.reduceat(qc, starts)
        lens = np.diff(np.concatenate((starts, [len(pk)])))
        gid = np.repeat(np.arange(len(starts)), lens)
        small = 5 * qc * lens[gid] < sums[gid]
        return pa.table(
            {"total_ec": pa.array([int(ec[small].sum())], pa.int64()),
             "n_small": pa.array([int(small.sum())], pa.int64())})

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(_items, batch_format="pyarrow")
    agg = map_key_partitions(
        items, ["l_partkey"], _small_block,
        num_partitions=_exchange_width(sf_dir, "lineitem")).aggregate(
        Sum("total_ec", alias_name="total_ec"),
        Sum("n_small", alias_name="n_small"))
    total = int(agg["total_ec"] or 0)
    n = int(agg["n_small"] or 0)
    return pd.DataFrame(
        [{"total_ec": np.int64(total), "n_small": np.int64(n),
          "avg_yearly": float(total) / 700.0}])


_Q22_CUTOFF = "2000-01-01"   # 'inactive' = no orders on/after this date
_Q22_BCAST_MAX = 2_000_000


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 global sales opportunity: per nation, the count and
    total balance of ABOVE-AVERAGE-balance customers with NO recent
    orders (the testdata lacks c_phone, so the country grouping is the
    customer's nation). Plan: the positive-balance average resolves as
    one (sum, count) aggregate pass; below ``_Q22_BCAST_MAX`` candidates
    the anti-join broadcasts the candidate custkeys and the orders scan
    emits distinct recent hits (driver-side bounded anti + nation fold);
    above it the anti-join runs inside one custkey exchange where
    recent-order custkeys mask the customer rows. The spec predicate
    ``bal > avg`` is the exact integer cross-multiply
    ``bal_c * n > sum_c``. Only per-nation partials leave the
    exchange."""
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    def _bal_partial(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = bal > 0
        return pa.table({"pos_c": pa.array([int(bal[pos].sum())], pa.int64()),
                         "pos_n": pa.array([int(pos.sum())], pa.int64())})

    cust_ds = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])
    avg_agg = cust_ds.map_batches(
        _bal_partial, batch_format="pyarrow").aggregate(
        Sum("pos_c", alias_name="pos_c"), Sum("pos_n", alias_name="pos_n"))
    sum_c, n_pos = int(avg_agg["pos_c"] or 0), int(avg_agg["pos_n"] or 0)
    empty_out = pd.DataFrame({"n_name": pd.Series(dtype=object),
                              "numcust": pd.Series(dtype=np.int64),
                              "totacctbal_c": pd.Series(dtype=np.int64)})
    if n_pos == 0:
        return empty_out

    schema = pa.schema([("c_custkey", pa.int64()), ("nat", pa.int64()),
                        ("bal_c", pa.int64()), ("side", pa.int8())])

    def _cust(t: pa.Table) -> pa.Table:
        bal = _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))
        keep = bal * n_pos > sum_c   # bal_c <= 10^6 cents, n bounded by rows
        n = int(keep.sum())
        return pa.table(
            {"c_custkey": pa.array(t["c_custkey"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
             "nat": pa.array(t["c_nationkey"].to_numpy(
                 zero_copy_only=False)[keep].astype(np.int64)),
             "bal_c": pa.array(bal[keep]),
             "side": pa.array(np.zeros(n, np.int8))}, schema=schema)

    cutoff = _date_us(_Q22_CUTOFF)

    def _recent(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).view(np.int64)
        keys = np.unique(
            t["o_custkey"].to_numpy(zero_copy_only=False)[od >= cutoff])
        n = len(keys)
        return pa.table(
            {"c_custkey": pa.array(keys.astype(np.int64)),
             "nat": pa.array(np.zeros(n, np.int64)),
             "bal_c": pa.array(np.zeros(n, np.int64)),
             "side": pa.array(np.ones(n, np.int8))}, schema=schema)

    cust = cust_ds.map_batches(
        _cust, batch_format="pyarrow").materialize()

    import ray

    if cust.count() <= _Q22_BCAST_MAX:
        # broadcast lane: the above-average candidates' sorted custkeys
        # ship once; the orders scan emits each batch's DISTINCT recent
        # candidate custkeys, one tiny candidate-keyed dedup collapses
        # them, and the anti-join + nation fold are a driver-side bounded
        # reduction over the candidate set (<= lane guard rows).
        ckeys, cnat, cbal = _collect_sorted_cols(  # bounded: lane guard
            cust, ("c_custkey", "nat", "bal_c"))
        key_ref = ray.put(ckeys)

        def _recent_hits(t: pa.Table) -> pa.Table:
            k = ray.get(key_ref)
            od = t["o_orderdate"].to_numpy(
                zero_copy_only=False).view(np.int64)
            ck = np.unique(t["o_custkey"].to_numpy(
                zero_copy_only=False)[od >= cutoff]).astype(np.int64)
            hit, _ = _match_sorted(k, ck)
            return pa.table({"c_custkey": pa.array(ck[hit])})

        hits = (
            read_parquet_clean(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderdate"],
                filter=_ts_filter("o_orderdate", lo_us=cutoff))
            .map_batches(_recent_hits, batch_format="pyarrow")
            .groupby("c_custkey").count()
            .select_columns(["c_custkey"])
        ).to_pandas()  # bounded: subset of the candidate set
        recent_keys = (hits["c_custkey"].to_numpy().astype(np.int64)
                       if len(hits) else np.array([], np.int64))
        keep = ~np.isin(ckeys, recent_keys)
        if not keep.any():
            return empty_out
        nk, inv = np.unique(cnat[keep], return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        tot = np.zeros(len(nk), np.int64)
        np.add.at(tot, inv, cbal[keep])
        ntab = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
        names = dict(zip(ntab["n_nationkey"].to_pylist(),
                         ntab["n_name"].to_pylist()))
        out = pd.DataFrame({"n_name": [names[int(k)] for k in nk],
                            "numcust": cnt, "totacctbal_c": tot})
        return out.sort_values("n_name").reset_index(drop=True)

    recent = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"],
    ).map_batches(_recent, batch_format="pyarrow")

    def _anti_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"nat": pa.array([], pa.int64()),
                          "numcust": pa.array([], pa.int64()),
                          "totacctbal_c": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        side = t["side"].to_numpy(zero_copy_only=False)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        cm = side == 0
        keep = cm.copy()
        keep[cm] = ~np.isin(keys[cm], keys[~cm])
        if not keep.any():
            return empty
        nat = t["nat"].to_numpy(zero_copy_only=False)[keep]
        bal = t["bal_c"].to_numpy(zero_copy_only=False)[keep]
        nk, inv = np.unique(nat, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        tot = np.zeros(len(nk), np.int64)
        np.add.at(tot, inv, bal)
        return pa.table({"nat": pa.array(nk), "numcust": pa.array(cnt),
                         "totacctbal_c": pa.array(tot)})

    folded = (
        map_key_partitions(
            cust.union(recent), ["c_custkey"], _anti_block,
            num_partitions=_exchange_width(sf_dir, "customer", "orders"))
        .groupby("nat")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("totacctbal_c", alias_name="totacctbal_c"))
    ).to_pandas()
    if not len(folded):
        return empty_out
    ntab = pq.read_table(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    names = dict(zip(ntab["n_nationkey"].to_pylist(),
                     ntab["n_name"].to_pylist()))
    folded["n_name"] = [names[int(k)] for k in folded["nat"]]
    folded["numcust"] = folded["numcust"].astype(np.int64)
    folded["totacctbal_c"] = folded["totacctbal_c"].astype(np.int64)
    return folded[["n_name", "numcust", "totacctbal_c"]].sort_values(
        "n_name").reset_index(drop=True)


# (brand, size_lo, size_hi, qty_lo_c, qty_hi_c) per disjunct — quantity
# bounds in integer cents like every other money/quantity comparison here
_Q19_CLAUSES = (
    ("Brand#2", 1, 15, 100, 1100),
    ("Brand#13", 5, 25, 1000, 2000),
    ("Brand#24", 15, 50, 2000, 3000),
)


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 discounted revenue: three disjunctive (brand, size
    range, quantity range) clauses over lineitem x part — the
    multi-clause OR-predicate join (the testdata lacks l_shipmode /
    l_shipinstruct, so those conjuncts are dropped). Plan: the part DIM
    broadcasts as (partkey, clause-id) where clause-id is the first
    disjunct whose brand+size the part satisfies (clauses are
    brand-disjoint, so at most one can match); each lineitem batch
    resolves its part's clause and applies that clause's quantity window
    vectorized — no exchange at all, one exact two-sum fold."""
    from ray.data.aggregate import Sum

    def _classify(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = np.zeros(t.num_rows, np.int64)
        for i, (b, slo, shi, _, _) in enumerate(_Q19_CLAUSES, start=1):
            cls = np.where((brand == b) & (size >= slo) & (size <= shi)
                           & (cls == 0), i, cls)
        keep = cls > 0
        return pa.table(
            {"p_partkey": pa.array(t["p_partkey"].to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
             "cls": pa.array(cls[keep])})

    part_ref = _broadcast_column_pair(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
        .map_batches(_classify, batch_format="pyarrow"),
        "p_partkey", "cls")
    qlo = np.array([0] + [c[3] for c in _Q19_CLAUSES], np.int64)
    qhi = np.array([-1] + [c[4] for c in _Q19_CLAUSES], np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        ok, cls = _lookup(part_ref, t["l_partkey"].to_numpy(
            zero_copy_only=False))
        qc = _cents(t["l_quantity"].to_numpy(zero_copy_only=False))
        c = np.where(ok, cls, 0)
        keep = ok & (qc >= qlo[c]) & (qc <= qhi[c])
        ec = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dp = _cents(t["l_discount"].to_numpy(zero_copy_only=False)[keep])
        rev = ec * (100 - dp)
        return pa.table(
            {"revenue4": pa.array([int(rev.sum())], pa.int64()),
             "n_rows": pa.array([int(keep.sum())], pa.int64())})

    agg = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("revenue4", alias_name="revenue4"),
        Sum("n_rows", alias_name="n_rows"))
    return pd.DataFrame(
        [{"revenue4": np.int64(agg["revenue4"] or 0),
          "n_rows": np.int64(agg["n_rows"] or 0)}])


TPCH_QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q4": q_tpch_q4,
    "tpch_q10": q_tpch_q10,
    "tpch_q15": q_tpch_q15,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q13": q_tpch_q13,
    "tpch_q17": q_tpch_q17,
    "tpch_q22": q_tpch_q22,
    "tpch_q19": q_tpch_q19,
}

_Q1_SQL_BODY = f"""
    WITH b AS (SELECT l_returnflag, l_linestatus,
                      CAST(FLOOR(l_quantity * 100) AS BIGINT) AS qc,
                      CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) AS ec,
                      CAST(FLOOR(l_discount * 100) AS BIGINT) AS dp,
                      CAST(FLOOR(l_tax * 100) AS BIGINT) AS tp
               FROM lineitem
               WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}')
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qc) AS BIGINT) AS sum_qty_c,
           CAST(SUM(ec) AS BIGINT) AS sum_base_c,
           CAST(SUM(ec * (100 - dp)) AS BIGINT) AS sum_disc4,
           CAST(SUM(ec * (100 - dp) * (100 + tp)) AS BIGINT) AS sum_charge6,
           CAST(SUM(dp) AS BIGINT) AS sum_disc_p,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(qc) AS DOUBLE) / (100 * COUNT(*)), 6) AS avg_qty,
           ROUND(CAST(SUM(ec) AS DOUBLE) / (100 * COUNT(*)), 6) AS avg_price,
           ROUND(CAST(SUM(dp) AS DOUBLE) / (100 * COUNT(*)), 6) AS avg_disc
    FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""

TPCH_ORACLE_SQL = {
    "tpch_q1": _Q1_SQL_BODY,
    "tpch_q6": f"""
        SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS HUGEINT)
                                 * CAST(FLOOR(l_discount * 100) AS BIGINT)),
                             0)
                    AS BIGINT) AS revenue4,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
          AND l_shipdate < TIMESTAMP '{_Q6_HI}'
          AND CAST(FLOOR(l_discount * 100) AS BIGINT)
              BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
          AND CAST(FLOOR(l_quantity * 100) AS BIGINT) < {_Q6_QTY}
    """,
    "tpch_q14": f"""
        WITH b AS (SELECT CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                          * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT))
                              AS rev4,
                          CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END
                              AS promo
                   FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                   WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
                     AND l.l_shipdate < TIMESTAMP '{_Q14_HI}')
        SELECT CAST(SUM(rev4 * promo) AS BIGINT) AS promo_rev4,
               CAST(SUM(rev4) AS BIGINT) AS total_rev4,
               ROUND(100 * CAST(SUM(rev4 * promo) AS DOUBLE)
                     / CAST(SUM(rev4) AS DOUBLE), 6) AS promo_pct
        FROM b HAVING SUM(rev4) > 0
    """,
    "tpch_q4": f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
          AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                            + INTERVAL {_Q4_LATE_DAYS} DAY)
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_q10": f"""
        WITH rev AS (SELECT o.o_custkey AS c_custkey,
                            CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100)
                                          AS HUGEINT)
                                     * (100 - CAST(FLOOR(l.l_discount * 100)
                                                   AS BIGINT)))
                                 AS BIGINT) AS revenue4
                     FROM orders o
                     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     JOIN customer c ON c.c_custkey = o.o_custkey
                     WHERE l.l_returnflag = 'R'
                       AND o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
                       AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
                     GROUP BY 1)
        SELECT r.c_custkey AS c_custkey, c.c_name AS c_name, r.revenue4
        FROM rev r JOIN customer c ON c.c_custkey = r.c_custkey
        ORDER BY r.revenue4 DESC, r.c_custkey LIMIT 20
    """,
    "tpch_q15": f"""
        WITH r AS (SELECT l_suppkey AS s_suppkey,
                          CAST(SUM(CAST(FLOOR(l_extendedprice * 100)
                                        AS HUGEINT)
                                   * (100 - CAST(FLOOR(l_discount * 100)
                                                 AS BIGINT)))
                               AS BIGINT) AS revenue4
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
                     AND l_shipdate < TIMESTAMP '{_Q15_HI}'
                   GROUP BY 1)
        SELECT r.s_suppkey AS s_suppkey, s.s_name AS s_name, r.revenue4
        FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
        WHERE r.revenue4 = (SELECT MAX(revenue4) FROM r)
        ORDER BY 1
    """,
    "tpch_q18": f"""
        WITH big AS (SELECT l_orderkey,
                            SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT))
                                AS sum_qty_c
                     FROM lineitem GROUP BY 1
                     HAVING SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT))
                            > {_Q18_QTY_C})
        SELECT c.c_name AS c_name, o.o_custkey AS o_custkey,
               o.o_orderkey AS l_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_c,
               CAST(big.sum_qty_c AS BIGINT) AS sum_qty_c
        FROM big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY price_c DESC, o.o_orderdate, l_orderkey LIMIT 100
    """,
    "tpch_q3": f"""
        SELECT l.l_orderkey AS l_orderkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                        * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue4,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_orderpriority AS o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
          AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
        GROUP BY 1, 3, 4
        ORDER BY revenue4 DESC, l_orderkey LIMIT 10
    """,
    "tpch_q7": f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                        * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue4
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        WHERE l.l_shipdate >= TIMESTAMP '{_Q7_LO}'
          AND l.l_shipdate < TIMESTAMP '{_Q7_HI}'
          AND ((sr.r_name = '{_Q7_SUPP_REGION}'
                AND cr.r_name = '{_Q7_CUST_REGION}')
               OR (sr.r_name = '{_Q7_CUST_REGION}'
                   AND cr.r_name = '{_Q7_SUPP_REGION}'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "tpch_q8": f"""
        WITH b AS (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT))
                       AS rev4,
                   CASE WHEN s.s_nationkey = {_Q8_TARGET_NATION}
                        THEN 1 ELSE 0 END AS tgt
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = '{_Q8_CUST_REGION}'
              AND p.p_type = '{_Q8_PART_TYPE}'
              AND o.o_orderdate >= TIMESTAMP '{_Q8_LO}'
              AND o.o_orderdate < TIMESTAMP '{_Q8_HI}')
        SELECT o_year,
               CAST(SUM(rev4 * tgt) AS BIGINT) AS nation_rev4,
               CAST(SUM(rev4) AS BIGINT) AS total_rev4,
               ROUND(CAST(SUM(rev4 * tgt) AS DOUBLE)
                     / CAST(SUM(rev4) AS DOUBLE), 6) AS mkt_share
        FROM b GROUP BY 1 ORDER BY 1
    """,
    "tpch_q13": f"""
        WITH co AS (SELECT c.c_custkey,
                           count(o.o_orderkey) AS c_count
                    FROM customer c
                    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                         AND o.o_orderpriority <> '{_Q13_EXCLUDE}'
                    GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q17": f"""
        WITH li AS (SELECT l.l_partkey,
                           CAST(FLOOR(l.l_quantity * 100) AS BIGINT) AS qc,
                           CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)
                               AS ec
                    FROM lineitem l JOIN part p
                         ON p.p_partkey = l.l_partkey
                    WHERE p.p_brand = '{_Q17_BRAND}'),
             st AS (SELECT l_partkey, SUM(qc) AS s,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM li GROUP BY 1)
        SELECT CAST(COALESCE(SUM(li.ec), 0) AS BIGINT) AS total_ec,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(COALESCE(SUM(li.ec), 0) AS DOUBLE) / 700.0 AS avg_yearly
        FROM li JOIN st ON li.l_partkey = st.l_partkey
        WHERE 5 * li.qc * st.n < st.s
    """,
    "tpch_q22": f"""
        WITH avg_b AS (SELECT SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT))
                                  AS s,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM customer
                       WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) > 0),
             sel AS (SELECT c.c_nationkey,
                            CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) AS bal_c
                     FROM customer c, avg_b
                     WHERE CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) * avg_b.n
                           > avg_b.s
                       AND NOT EXISTS (
                           SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'))
        SELECT n.n_name AS n_name,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
        FROM sel JOIN nation n ON n.n_nationkey = sel.c_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_q19": f"""
        SELECT CAST(COALESCE(SUM(
                   CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                   * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT))), 0)
                    AS BIGINT) AS revenue4,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE """ + " OR ".join(
        f"""(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}
             AND CAST(FLOOR(l.l_quantity * 100) AS BIGINT)
                 BETWEEN {qlo} AND {qhi})"""
        for b, slo, shi, qlo, qhi in _Q19_CLAUSES) + """
    """,
    "tpch_q5": f"""
        SELECT n.n_name AS n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                        * (100 - CAST(FLOOR(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue4
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_nationkey = s.s_nationkey
          AND r.r_name = '{_Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
          AND o.o_orderdate < TIMESTAMP '{_Q5_HI}'
        GROUP BY 1 ORDER BY 1
    """,
}
