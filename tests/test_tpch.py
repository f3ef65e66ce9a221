"""TPC-H pipeline family (q1 / q3 / q5) — gate-replica checks at sf0.001
plus a randomized relational fixture with adversarial referential shape
(orders without lineitems, lineitems whose order misses the filters,
customers outside the segment, suppliers outside the region, revenue
ties) run against the SAME DuckDB oracle SQL the driver uses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tsrollup.pipelines.queries import ORACLE_SQL, QUERIES

TPCH_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).df()


@pytest.mark.parametrize("name", ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q14",
                                  "tpch_q18", "tpch_q4", "tpch_q10", "tpch_q15",
                                  "tpch_q7", "tpch_q8", "tpch_q13", "tpch_q17",
                                  "tpch_q22", "tpch_q19"])
def test_tpch_sf0001_matches_oracle(ray_session, name):
    sf = "/root/testdata/sf0.001"
    res = QUERIES[name](sf)
    eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    ora = _oracle(name, sf)
    assert len(eng), f"{name}: empty result at sf0.001"
    pd.testing.assert_frame_equal(_canon(eng), _canon(ora), check_dtype=False)


def _random_tpch(seed: int, d) -> None:
    rng = np.random.default_rng(seed)
    pq.write_table(pa.table(
        {"r_regionkey": pa.array([0, 1], pa.int32()),
         "r_name": pa.array(["ASIA", "EUROPE"])}), d / "region.parquet")
    n_nat = 6
    pq.write_table(pa.table(
        {"n_nationkey": pa.array(np.arange(n_nat), pa.int32()),
         "n_name": pa.array([f"NATION{i}" for i in range(n_nat)]),
         "n_regionkey": pa.array((np.arange(n_nat) % 2).astype("int32"))}),
        d / "nation.parquet")
    n_cust, n_supp = 40, 12
    pq.write_table(pa.table(
        {"c_custkey": pa.array(np.arange(n_cust), pa.int64()),
         "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
         "c_nationkey": pa.array(
             rng.integers(0, n_nat, n_cust).astype("int32")),
         "c_acctbal": pa.array(rng.normal(0, 100, n_cust)),
         "c_mktsegment": pa.array(
             rng.choice(["BUILDING", "AUTOMOBILE"], n_cust))}),
        d / "customer.parquet")
    pq.write_table(pa.table(
        {"s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
         "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
         "s_nationkey": pa.array(
             rng.integers(0, n_nat, n_supp).astype("int32")),
         "s_acctbal": pa.array(rng.normal(0, 100, n_supp))}),
        d / "supplier.parquet")
    n_part = 50
    pq.write_table(pa.table(
        {"p_partkey": pa.array(np.arange(n_part), pa.int64()),
         "p_name": pa.array([f"p{i}" for i in range(n_part)]),
         "p_brand": pa.array(rng.choice(["Brand#1", "Brand#2"], n_part)),
         "p_type": pa.array(rng.choice(["PROMO", "STANDARD", "ECONOMY"],
                                       n_part)),
         "p_size": pa.array(rng.integers(1, 50, n_part).astype("int32")),
         "p_retailprice": pa.array(rng.uniform(10, 2000, n_part))}),
        d / "part.parquet")
    n_ord = 120
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_us = 2 * 365 * 86_400_000_000
    odate = base + rng.integers(0, span_us, n_ord)
    pq.write_table(pa.table(
        {"o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
         # ~8% of orders reference custkeys that DON'T exist (the inner
         # join to customer must drop them BEFORE any LIMIT window)
         "o_custkey": pa.array(rng.integers(0, int(n_cust * 1.08), n_ord)),
         "o_orderstatus": pa.array(rng.choice(["O", "F"], n_ord)),
         "o_totalprice": pa.array(rng.uniform(100, 1e5, n_ord)),
         "o_orderdate": pa.array(odate, pa.timestamp("us")),
         "o_orderpriority": pa.array(
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord))}),
        d / "orders.parquet")
    n_li = 500
    # ~10% of lineitems reference orderkeys that DON'T exist (inner joins
    # must drop them); quantities/prices include exact .5 cents ties
    okeys = rng.integers(0, int(n_ord * 1.1), n_li)
    sdate = base + rng.integers(0, span_us, n_li)
    pq.write_table(pa.table(
        {"l_orderkey": pa.array(okeys.astype("int64")),
         "l_partkey": pa.array(rng.integers(0, 50, n_li)),
         "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
         "l_linenumber": pa.array(
             rng.integers(1, 7, n_li).astype("int32")),
         "l_quantity": pa.array(rng.integers(1, 50, n_li).astype("float64")),
         # include sub-cent prices (floor to 0 cents) so zero-revenue
         # join groups exercise the matched-vs-positive distinction
         "l_extendedprice": pa.array(np.where(
             rng.random(n_li) < 0.05, 0.004,
             np.round(rng.uniform(10, 1e4, n_li), 2))),
         "l_discount": pa.array(
             rng.integers(0, 11, n_li).astype("float64") / 100.0),
         "l_tax": pa.array(rng.integers(0, 9, n_li).astype("float64") / 100.0),
         "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
         "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
         "l_shipdate": pa.array(sdate, pa.timestamp("us"))}),
        d / "lineitem.parquet")


@pytest.mark.parametrize("seed", [11, 22])
def test_tpch_random_relational_sweep(ray_session, tmp_path_factory, seed):
    d = tmp_path_factory.mktemp(f"tpch{seed}")
    _random_tpch(seed, d)
    for name in ("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q14", "tpch_q18",
                 "tpch_q4", "tpch_q10", "tpch_q15", "tpch_q7", "tpch_q8",
                 "tpch_q13", "tpch_q17", "tpch_q22", "tpch_q19"):
        res = QUERIES[name](str(d))
        eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        ora = _oracle(name, str(d))
        if len(eng) == 0 and len(ora) == 0:
            continue
        try:
            pd.testing.assert_frame_equal(
                _canon(eng), _canon(ora), check_dtype=False)
        except AssertionError as e:
            raise AssertionError(f"{name} diverged from oracle") from e


def test_tpch_all_empty_windows(ray_session, tmp_path_factory):
    """Every TPC-H query must return the oracle's EMPTY (or zero-row-
    aggregate) result — not crash on schema loss — when no row matches the
    date windows (0-row Ray Datasets lose their schema through to_pandas;
    q5/q15 rebuild typed frames, q6/q14 emit the oracle's coalesced or
    HAVING-filtered shape)."""
    d = tmp_path_factory.mktemp("tpch_empty")
    _random_tpch(33, d)
    # shift every order/ship date to 2005 — outside all query windows
    delta = (np.datetime64("2005-01-01", "us").astype(np.int64)
             - np.datetime64("1995-01-01", "us").astype(np.int64))
    for f, col in (("orders.parquet", "o_orderdate"),
                   ("lineitem.parquet", "l_shipdate")):
        t = pq.read_table(str(d / f))
        us = t[col].to_numpy(zero_copy_only=False).view(np.int64) + delta
        t = t.set_column(t.schema.get_field_index(col), col,
                         pa.array(us, pa.timestamp("us")))
        pq.write_table(t, str(d / f))
    for name in ("tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
                 "tpch_q10", "tpch_q14", "tpch_q15", "tpch_q18", "tpch_q7",
                 "tpch_q8", "tpch_q13", "tpch_q17", "tpch_q22", "tpch_q19"):
        res = QUERIES[name](str(d))
        eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        ora = _oracle(name, str(d))
        if len(eng) == 0 and len(ora) == 0:
            continue
        try:
            pd.testing.assert_frame_equal(
                _canon(eng), _canon(ora), check_dtype=False)
        except AssertionError as e:
            raise AssertionError(f"{name} diverged on empty windows") from e


def test_tpch_q18_lane_equivalence(ray_session, monkeypatch):
    """q18's two join lanes (broadcast searchsorted vs Bloom-prefiltered
    union exchange) must produce identical output: force the exchange
    lane by zeroing the broadcast cutover and compare against the default
    lane AND the oracle at sf0.001 (the bigram-lane-equivalence pattern —
    the guarded fast lane must never be the only tested one)."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q18"](sf).to_pandas())
    monkeypatch.setattr(tpch, "_Q18_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q18"](sf).to_pandas())
    assert len(bcast), "q18 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q18", sf)), check_dtype=False)


def test_tpch_q10_lane_equivalence(ray_session, monkeypatch):
    """q10's two join lanes (broadcast quarter pairs vs Bloom-prefiltered
    union exchange) must produce identical output, like q18's."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q10"](sf).to_pandas())
    monkeypatch.setattr(tpch, "_Q10_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q10"](sf).to_pandas())
    assert len(bcast), "q10 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q10", sf)), check_dtype=False)


def test_tpch_q3_lane_equivalence(ray_session, monkeypatch):
    """q3's two join lanes (broadcast survivor triples vs Bloom-prefiltered
    union exchange) must produce identical output, like q18's."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q3"](sf).to_pandas())
    monkeypatch.setattr(tpch, "_Q3_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q3"](sf).to_pandas())
    assert len(bcast), "q3 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q3", sf)), check_dtype=False)


def test_tpch_q5_lane_equivalence(ray_session, monkeypatch):
    """q5's two join lanes (broadcast year (orderkey, nation) pairs vs
    Bloom-prefiltered union exchange) must produce identical output."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    r0 = QUERIES["tpch_q5"](sf)
    bcast = _canon(r0 if isinstance(r0, pd.DataFrame) else r0.to_pandas())
    monkeypatch.setattr(tpch, "_Q5_BCAST_MAX", -1)
    r1 = QUERIES["tpch_q5"](sf)
    exch = _canon(r1 if isinstance(r1, pd.DataFrame) else r1.to_pandas())
    assert len(bcast), "q5 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q5", sf)), check_dtype=False)


def test_tpch_q7_lane_equivalence(ray_session, monkeypatch):
    """q7's two join lanes (broadcast (orderkey, nation) pairs vs
    Bloom-prefiltered union exchange) must produce identical output."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q7"](sf))
    monkeypatch.setattr(tpch, "_Q7_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q7"](sf))
    assert len(bcast), "q7 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q7", sf)), check_dtype=False)


def test_tpch_q8_lane_equivalence(ray_session, monkeypatch):
    """q8's two join lanes (broadcast (orderkey, year) pairs vs
    Bloom-prefiltered union exchange) must produce identical output."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q8"](sf))
    monkeypatch.setattr(tpch, "_Q8_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q8"](sf))
    assert len(bcast), "q8 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q8", sf)), check_dtype=False)


def test_tpch_q4_lane_equivalence(ray_session, monkeypatch):
    """q4's two EXISTS lanes (broadcast quarter triples + distinct-late
    dedup vs union exchange) must produce identical output."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    bcast = _canon(QUERIES["tpch_q4"](sf).to_pandas())
    monkeypatch.setattr(tpch, "_Q4_BCAST_MAX", -1)
    exch = _canon(QUERIES["tpch_q4"](sf).to_pandas())
    assert len(bcast), "q4 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q4", sf)), check_dtype=False)


def test_tpch_q22_lane_equivalence(ray_session, monkeypatch):
    """q22's two anti-join lanes (broadcast candidate custkeys vs custkey
    exchange) must produce identical output."""
    import tsrollup.pipelines.tpch as tpch

    sf = "/root/testdata/sf0.001"
    r0 = QUERIES["tpch_q22"](sf)
    bcast = _canon(r0 if isinstance(r0, pd.DataFrame) else r0.to_pandas())
    monkeypatch.setattr(tpch, "_Q22_BCAST_MAX", -1)
    r1 = QUERIES["tpch_q22"](sf)
    exch = _canon(r1 if isinstance(r1, pd.DataFrame) else r1.to_pandas())
    assert len(bcast), "q22 lane test needs non-empty sf0.001 output"
    pd.testing.assert_frame_equal(bcast, exch, check_dtype=False)
    pd.testing.assert_frame_equal(
        bcast, _canon(_oracle("tpch_q22", sf)), check_dtype=False)
