"""The correctness-gate query battery.

One entry per operator/pipeline from SURVEY.md §2, each with a DuckDB
oracle (``ORACLES``) unless the op is not SQL-expressible.  Ray
implementations are Dataset pipelines; the float-formula mirroring
contract lives in :mod:`osm_live_updates_ray.sources.testdata`.

Rounding: aggregate float outputs are rounded HALF-AWAY-FROM-ZERO to a
fixed number of decimals on BOTH sides (DuckDB ROUND semantics) so
summation-order ulp noise cannot flip the value hash.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .config import DEFAULT_CONFIG as _CFG
from .sources import testdata as td

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}

_ADAPTER_VERSION = "v1"  # bump when adapter formulas change (busts /tmp cache)


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _rd():
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return rd


def _round(x: np.ndarray, d: int) -> np.ndarray:
    """Half-away-from-zero rounding (DuckDB ROUND semantics)."""
    f = 10.0 ** d
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


# ===========================================================================
# TPC-H-style relational operators (filters, joins, aggregates, sort/limit)
# ===========================================================================
@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(sf_dir: str):
    """Filter + grouped aggregation (SURVEY A5-style counters pattern:
    per-block partial aggregation inside Ray's aggregate)."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        disc = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return t.append_column("disc_price", disc)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = _round(out[c].to_numpy(), 2)
    return out


@register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(sf_dir: str):
    """Hash join (Ray Dataset.join) + grouped agg + global top-k."""
    rd = _rd()
    from ray.data.aggregate import Sum

    cust = td.read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = sorted(
        cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey")
        .to_pylist()
    )
    # join BEFORE the selective filters: a Ray 2.49 hash join aborts
    # when a shuffle partition on either side is empty (schema lost),
    # so keep both sides dense and filter the joined rows instead
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.greater(t.column("l_shipdate"), pa.scalar(np.datetime64("1995-03-15", "us")))
        )
        rev = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return t.append_column("revenue_part", rev).select(["l_orderkey", "revenue_part"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = li.join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.less(t.column("o_orderdate"), pa.scalar(np.datetime64("1995-03-15", "us"))),
                pc.is_in(t.column("o_custkey"), value_set=pa.array(building)),
            )
        ),
        batch_format="pyarrow",
    )
    agg = joined.groupby("l_orderkey").aggregate(Sum("revenue_part", alias_name="revenue"))
    top = agg.sort([("revenue"), ("l_orderkey")], descending=[True, False]).limit(10)
    out = top.to_pandas()
    out["revenue"] = _round(out["revenue"].to_numpy(), 2)
    return out[["l_orderkey", "revenue"]]


@register(
    "tpch_q5",
    """
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(sf_dir: str):
    """Distributed fact-fact joins (lineitem ⋈ orders ⋈ customer via
    Ray hash joins) with only the true dimensions (supplier/nation/
    region) broadcast as sorted key arrays probed by searchsorted —
    no driver-side fact dict, no per-row Python loop."""
    rd = _rd()
    from ray.data.aggregate import Sum

    nation = td.read(sf_dir, "nation")
    region = td.read(sf_dir, "region")
    asia = set(
        region.filter(pc.equal(region.column("r_name"), "ASIA"))
        .column("r_regionkey").to_pylist()
    )
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nrk = nation.column("n_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nation.column("n_name").to_pylist(), dtype=object)
    size = int(nk.max()) + 1 if len(nk) else 1
    name_by_nk = np.full(size, None, dtype=object)
    asia_by_nk = np.zeros(size, dtype=bool)
    name_by_nk[nk] = nname
    asia_by_nk[nk] = np.isin(nrk, np.fromiter(asia, np.int64, len(asia)))
    supp = td.read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snk = supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    order_ = np.argsort(sk)
    sk, snk = sk[order_], snk[order_]

    def o_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(
                t.column("o_orderdate"), pa.scalar(np.datetime64("1996-01-01", "us"))
            ),
            pc.less(
                t.column("o_orderdate"), pa.scalar(np.datetime64("1997-01-01", "us"))
            ),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(o_prep, batch_format="pyarrow")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    # orders(1996) ⋈ customer on custkey — both fact-sized, shuffle join
    oc = orders.join(
        cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])

    def li_prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        return t.append_column("revenue_part", rev).select(
            ["l_orderkey", "l_suppkey", "revenue_part"]
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = li.join(
        oc, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t.column("revenue_part").to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
            found = sk[pos] == ls
            s_nat = np.where(found, snk[pos], -1)
        else:
            s_nat = np.full(len(ls), -1, dtype=np.int64)
        keep = (s_nat >= 0) & (s_nat == cn) & asia_by_nk[np.clip(s_nat, 0, size - 1)]
        return pa.Table.from_pydict(
            {
                "n_name": pa.array(name_by_nk[s_nat[keep]], type=pa.string()),
                "revenue_part": pa.array(rev[keep], type=pa.float64()),
            }
        )

    out = (
        joined.map_batches(finish, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue_part", alias_name="revenue"))
        .to_pandas()
    )
    if "revenue" not in out.columns:  # empty result at tiny sf
        return pd.DataFrame({"n_name": pd.Series(dtype=object),
                             "revenue": pd.Series(dtype=float)})
    out["revenue"] = _round(out["revenue"].to_numpy(), 2)
    return out


@register(
    "tpch_q6",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6(sf_dir: str):
    rd = _rd()
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        m = (
            pc.and_(
                pc.and_(
                    pc.greater_equal(
                        t.column("l_shipdate"), pa.scalar(np.datetime64("1994-01-01", "us"))
                    ),
                    pc.less(t.column("l_shipdate"), pa.scalar(np.datetime64("1995-01-01", "us"))),
                ),
                pc.and_(
                    pc.and_(
                        pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
                        pc.less_equal(t.column("l_discount"), pa.scalar(0.07)),
                    ),
                    pc.less(t.column("l_quantity"), pa.scalar(24.0)),
                ),
            )
        )
        t = t.filter(m)
        return t.append_column(
            "rev", pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(prep, batch_format="pyarrow")
    total = ds.sum("rev")  # None when the filter leaves no rows (SQL NULL)
    if total is None:
        return pd.DataFrame({"revenue": [np.nan]})
    return pd.DataFrame({"revenue": [float(_round(np.array([total]), 2)[0])]})


@register(
    "tpch_q19",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(sf_dir: str):
    """Disjunctive-predicate join (TPC-H Q19 shape, adapted to the
    synthetic part columns): the dimension side collapses to three
    sorted broadcast arrays (partkey, brand band, size) probed with ONE
    searchsorted per batch; the OR-of-conjunctions evaluates as a
    vectorized mask over the probed attributes — no shuffle, no row
    loop, the fact table streams once.  At scale the dimension arrays
    ship via ray.put exactly like tpch_q5's."""
    import pyarrow.parquet as _pq

    rd = _rd()
    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    band = np.where(
        brand == "Brand#12", 1,
        np.where(brand == "Brand#23", 2, np.where(brand == "Brand#34", 3, 0)),
    ).astype(np.int8)
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk, kind="stable")
    pk, band, size = pk[order], band[order], size[order]

    def prep(t: pa.Table) -> pa.Table:
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
        hit = pk[pos] == lp
        b = np.where(hit, band[pos], 0)
        s = np.where(hit, size[pos], 0)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        m = (
            ((b == 1) & (s >= 1) & (s <= 5) & (q >= 1) & (q <= 11))
            | ((b == 2) & (s >= 1) & (s <= 10) & (q >= 10) & (q <= 20))
            | ((b == 3) & (s >= 1) & (s <= 15) & (q >= 20) & (q <= 30))
        )
        t = t.filter(pa.array(m))
        return t.append_column(
            "rev",
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            ),
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(prep, batch_format="pyarrow")
    total = ds.sum("rev")
    if total is None:
        return pd.DataFrame({"revenue": [np.nan]})
    return pd.DataFrame({"revenue": [float(_round(np.array([total]), 2)[0])]})


@register(
    "tpch_q12",
    """
    SELECT l_shipmode, COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count
    FROM (SELECT l_orderkey, l_returnflag AS l_shipmode FROM lineitem) l
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_shipmode
    """,
)
def tpch_q12(sf_dir: str):
    """Broadcast join (orders dict) + conditional aggregation.  The
    testdata lineitem has no shipmode column; l_returnflag stands in,
    mirrored in the oracle."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    orders = td.read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    okeys = orders.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    is_high = pc.is_in(
        orders.column("o_orderpriority"),
        value_set=pa.array(["1-URGENT", "2-HIGH"]),
    ).to_numpy(zero_copy_only=False)
    order_ = np.argsort(okeys)
    okeys, is_high = okeys[order_], is_high[order_]

    def probe(t: pa.Table) -> pa.Table:
        lo = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(okeys):
            pos = np.clip(np.searchsorted(okeys, lo), 0, len(okeys) - 1)
            found = okeys[pos] == lo
        else:
            pos = np.zeros(len(lo), dtype=np.int64)
            found = np.zeros(len(lo), dtype=bool)
        t = t.filter(pa.array(found))
        h = is_high[pos[found]].astype(np.int64)
        return pa.Table.from_pydict(
            {"l_shipmode": t.column("l_returnflag"), "is_high": pa.array(h)}
        )

    out = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
        .map_batches(probe, batch_format="pyarrow")
        .groupby("l_shipmode")
        .aggregate(Count(alias_name="n"), Sum("is_high", alias_name="high_line_count"))
        .to_pandas()
    )
    return out


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(sf_dir: str):
    """EXISTS semi-join as a distributed shape: fact ⋈ fact hash join,
    per-row predicate, then DISTINCT via a two-level groupby (never a
    driver-side id set).  The testdata lineitem has no commit/receipt
    dates; 'shipped >30 days after ordering' stands in for the
    reference's late-line predicate, mirrored in the oracle."""
    rd = _rd()
    from ray.data.aggregate import Count

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    # join the DENSE sides first (a 2.49 hash join aborts on an empty
    # shuffle partition), apply the quarter window + late predicate after
    joined = li.join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (
            (od >= np.datetime64("1996-07-01", "us"))
            & (od < np.datetime64("1996-10-01", "us"))
            & (sd > od + np.timedelta64(30, "D"))
        )
        return t.filter(pa.array(keep)).select(["o_orderpriority", "l_orderkey"])

    out = (
        joined.map_batches(late, batch_format="pyarrow")
        # EXISTS = at least one late line: collapse per order first …
        .groupby(["o_orderpriority", "l_orderkey"])
        .aggregate(Count(alias_name="_lines"))
        # … then count distinct orders per priority
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .to_pandas()
    )
    return out[["o_orderpriority", "order_count"]]


@register(
    "tpch_q14",
    """
    SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0e0 END), 2)
             AS promo_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
           ROUND(100e0
                 * ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0e0 END), 2)
                 / ROUND(SUM(l_extendedprice * (1 - l_discount)), 2), 4)
             AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def tpch_q14(sf_dir: str):
    """Promo-revenue ratio: part is a true dimension — broadcast once as
    sorted key + bool arrays, probed with searchsorted inside
    map_batches; one Dataset.aggregate computes both sums in a single
    pass.  The ratio is derived from the ROUNDED sums on both sides so
    summation-order ulps cannot move it."""
    rd = _rd()
    from ray.data.aggregate import Sum

    part = td.read(sf_dir, "part", ["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.starts_with(part.column("p_type"), "PROMO").to_numpy(
        zero_copy_only=False
    )
    order_ = np.argsort(pk)
    pk, promo = pk[order_], promo[order_]

    def probe(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (sd >= np.datetime64("1996-01-01", "us")) & (
            sd < np.datetime64("1997-01-01", "us")
        )
        t = t.filter(pa.array(keep))
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = t.column("l_extendedprice").to_numpy(zero_copy_only=False) * (
            1.0 - t.column("l_discount").to_numpy(zero_copy_only=False)
        )
        if len(pk):
            pos = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            found = pk[pos] == lp
        else:
            pos = np.zeros(len(lp), dtype=np.int64)
            found = np.zeros(len(lp), dtype=bool)
        is_promo = promo[pos] & found
        return pa.Table.from_pydict(
            {
                "rev": pa.array(rev[found], type=pa.float64()),
                "promo_rev": pa.array(
                    np.where(is_promo[found], rev[found], 0.0), type=pa.float64()
                ),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(probe, batch_format="pyarrow")
    agg = ds.aggregate(Sum("promo_rev"), Sum("rev"))
    p, tot = agg.get("sum(promo_rev)"), agg.get("sum(rev)")
    if tot is None or not tot:
        return pd.DataFrame(
            {"promo_revenue": [np.nan], "total_revenue": [np.nan],
             "promo_pct": [np.nan]}
        )
    pr = float(_round(np.array([p]), 2)[0])
    tr = float(_round(np.array([tot]), 2)[0])
    pct = float(_round(np.array([100.0 * pr / tr]), 4)[0])
    return pd.DataFrame(
        {"promo_revenue": [pr], "total_revenue": [tr], "promo_pct": [pct]}
    )


@register(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING ROUND(SUM(l_quantity), 2) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q18(sf_dir: str):
    """Large-volume-customer shape: grouped HAVING filter produces a
    SMALL key set (~1% of orders), which then drives streamed is_in
    probes of orders and customer — the fact tables are never
    materialized, only the having-selected rows come to the driver.
    The HAVING compares the ROUNDED sum on both sides so a boundary
    ulp cannot flip membership."""
    rd = _rd()
    from ray.data.aggregate import Sum

    qty = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .map_batches(
            lambda t: t.filter(
                pa.array(
                    _round(t.column("sum_qty").to_numpy(zero_copy_only=False), 2)
                    > 250.0
                )
            ),
            batch_format="pyarrow",
        )
    )
    big = pa.concat_tables(
        list(qty.iter_batches(batch_size=65536, batch_format="pyarrow"))
    )  # HAVING-selected: small by construction
    okeys = np.sort(big.column("l_orderkey").to_numpy(zero_copy_only=False))
    o_sel = pa.concat_tables(
        list(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
            )
            .map_batches(
                lambda t: t.filter(
                    pc.is_in(t.column("o_orderkey"), value_set=pa.array(okeys))
                ),
                batch_format="pyarrow",
            )
            .iter_batches(batch_size=65536, batch_format="pyarrow")
        )
    )
    ckeys = np.unique(o_sel.column("o_custkey").to_numpy(zero_copy_only=False))
    c_sel = pa.concat_tables(
        list(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
            )
            .map_batches(
                lambda t: t.filter(
                    pc.is_in(t.column("c_custkey"), value_set=pa.array(ckeys))
                ),
                batch_format="pyarrow",
            )
            .iter_batches(batch_size=65536, batch_format="pyarrow")
        )
    )
    # three small sides merge on the driver
    df = o_sel.to_pandas()
    qdf = big.to_pandas().rename(columns={"l_orderkey": "o_orderkey"})
    cdf = c_sel.to_pandas()
    out = df.merge(qdf, on="o_orderkey").merge(cdf, left_on="o_custkey",
                                               right_on="c_custkey")
    out["sum_qty"] = _round(out["sum_qty"].to_numpy(), 2)
    out = out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(10)
    return out[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]].reset_index(drop=True)


# ===========================================================================
# Geospatial pipeline over the adapter world (the engine's core surface)
# ===========================================================================
def _pages_geo_ds(sf_dir: str):
    """pages Dataset -> geocoded pages_geo Dataset (REAL extractor path:
    lon/lat parsed back from the rendered html, exercising the
    7-decimal round trip)."""
    rd = _rd()
    from .stages import spatial

    return spatial.geocode(rd.from_arrow(td.pages_table(sf_dir)))


@register(
    "extract_text",
    "WITH " + td.SQL_PAGES.strip() + "\nSELECT url, text FROM pages",
)
def extract_text(sf_dir: str):
    """The input_hint invariant: extracted text byte-identical per url.
    Runs html -> canonical extractor inside map_batches; the oracle is
    the source text itself."""
    rd = _rd()
    from .functions import text as textfn

    def ex(t: pa.Table) -> pa.Table:
        texts = textfn.extract_text_batch(t.column("html"))
        return pa.Table.from_pydict(
            {"url": t.column("url"), "text": texts}
        )

    return rd.from_arrow(td.pages_table(sf_dir)).map_batches(ex, batch_format="pyarrow")


@register(
    "pages_cells",
    "WITH " + td.SQL_PAGES.strip()
    + f"\nSELECT url, lon, lat, {td.SQL_CELL} AS cell_id, {td.SQL_TILE} AS tile_id FROM pages",
)
def pages_cells(sf_dir: str):
    """Vectorized batched cell encoding over zero-copy Arrow (north_rule
    core stage)."""
    return _pages_geo_ds(sf_dir).map_batches(
        lambda t: t.select(["url", "lon", "lat", "cell_id", "tile_id"]),
        batch_format="pyarrow",
    )


@register(
    "cell_histogram",
    "WITH " + td.SQL_PAGES.strip()
    + f"\nSELECT {td.SQL_CELL} AS cell_id, COUNT(*) AS n_pages FROM pages GROUP BY 1",
)
def cell_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _pages_geo_ds(sf_dir)
        .groupby("cell_id")
        .aggregate(Count(alias_name="n_pages"))
    )


def _nation_joiner(sf_dir: str, with_nodes: bool):
    from .stages import spatial

    rings = td.nation_rings(sf_dir)
    if with_nodes:
        nt = td.nodes_table(sf_dir)
        na = {
            "id": nt.column("id").to_numpy(zero_copy_only=False).astype(np.int64),
            "lon": nt.column("lon").to_numpy(zero_copy_only=False),
            "lat": nt.column("lat").to_numpy(zero_copy_only=False),
        }
    else:
        na = {
            "id": np.empty(0, dtype=np.int64),
            "lon": np.empty(0),
            "lat": np.empty(0),
        }
    return spatial.SpatialJoiner(rings, na)


@register(
    "pip_nation",
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_NATION_RECTS.strip()
    + """
    SELECT p.url, COALESCE(r.polygon_id, -1) AS polygon_id
    FROM pages p LEFT JOIN nation_rects r
      ON p.lon BETWEEN r.min_lon AND r.max_lon
     AND p.lat BETWEEN r.min_lat AND r.max_lat
    """,
)
def pip_nation(sf_dir: str):
    """Point-in-polygon via the per-cell polygon index (ray-cast kernel);
    nation rects are boundary-safe so BETWEEN == ray-cast exactly."""
    joiner = _nation_joiner(sf_dir, with_nodes=False)
    return _pages_geo_ds(sf_dir).map_batches(
        lambda t, j=joiner: j(t).select(["url", "polygon_id"]),
        batch_format="pyarrow",
    )


@register(
    "knn_part",
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_STATE_NODES.strip()
    + """
    SELECT url, knn_node_id, knn_dist FROM (
      SELECT p.url, s.id AS knn_node_id,
             (p.lon - s.lon) * (p.lon - s.lon) + (p.lat - s.lat) * (p.lat - s.lat)
               AS knn_dist,
             ROW_NUMBER() OVER (
               PARTITION BY p.url
               ORDER BY (p.lon - s.lon) * (p.lon - s.lon)
                      + (p.lat - s.lat) * (p.lat - s.lat), s.id
             ) AS rn
      FROM pages p CROSS JOIN state_nodes s
    ) WHERE rn = 1
    """,
)
def knn_part(sf_dir: str):
    """Exact nearest-node via the grid ring-search index (identical
    (dx*dx+dy*dy, id) ordering as the SQL window)."""
    joiner = _nation_joiner(sf_dir, with_nodes=True)
    return _pages_geo_ds(sf_dir).map_batches(
        lambda t, j=joiner: j(t).select(["url", "knn_node_id", "knn_dist"]),
        batch_format="pyarrow",
    )


_SQL_ASSIGN = (
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_NATION_RECTS.strip()
    + ",\n" + td.SQL_STATE_NODES.strip()
    + f"""
    , pg AS (
      SELECT url, lon, lat, {td.SQL_CELL} AS cell_id, {td.SQL_TILE} AS tile_id
      FROM pages
    ), pip AS (
      SELECT p.url, COALESCE(r.polygon_id, -1) AS polygon_id
      FROM pg p LEFT JOIN nation_rects r
        ON p.lon BETWEEN r.min_lon AND r.max_lon
       AND p.lat BETWEEN r.min_lat AND r.max_lat
    ), knn AS (
      SELECT url, knn_node_id, knn_dist FROM (
        SELECT p.url, s.id AS knn_node_id,
               (p.lon - s.lon) * (p.lon - s.lon) + (p.lat - s.lat) * (p.lat - s.lat)
                 AS knn_dist,
               ROW_NUMBER() OVER (
                 PARTITION BY p.url
                 ORDER BY (p.lon - s.lon) * (p.lon - s.lon)
                        + (p.lat - s.lat) * (p.lat - s.lat), s.id
               ) AS rn
        FROM pg p CROSS JOIN state_nodes s
      ) WHERE rn = 1
    )
    SELECT pg.url, pg.cell_id, pip.polygon_id, knn.knn_node_id, knn.knn_dist,
           pg.tile_id
    FROM pg JOIN pip ON pg.url = pip.url JOIN knn ON pg.url = knn.url
    """
)


@register("assignments", _SQL_ASSIGN)
def assignments(sf_dir: str):
    """The flagship static spatial join: page -> (cell, polygon, kNN,
    tile) — SURVEY J8 / the PAGE_TILE_ASSIGNMENTS output."""
    joiner = _nation_joiner(sf_dir, with_nodes=True)
    return _pages_geo_ds(sf_dir).map_batches(
        lambda t, j=joiner: j(t), batch_format="pyarrow"
    )


@register(
    "tile_rollup",
    _SQL_ASSIGN.replace(
        """
    SELECT pg.url, pg.cell_id, pip.polygon_id, knn.knn_node_id, knn.knn_dist,
           pg.tile_id
    FROM pg JOIN pip ON pg.url = pip.url JOIN knn ON pg.url = knn.url
    """,
        """
    , a AS (
      SELECT pg.url, pg.cell_id, pip.polygon_id, knn.knn_node_id, knn.knn_dist,
             pg.tile_id
      FROM pg JOIN pip ON pg.url = pip.url JOIN knn ON pg.url = knn.url
    )
    SELECT tile_id, COUNT(*) AS n_pages,
           CAST(SUM(CASE WHEN polygon_id >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_polygon,
           COUNT(DISTINCT cell_id) AS n_cells,
           ROUND(AVG(knn_dist), 4) AS mean_knn_dist
    FROM a GROUP BY tile_id
    """,
    ),
)
def tile_rollup(sf_dir: str):
    """Raster<->vector tile rollup (A6): partial-agg + small shuffle."""
    from .stages import tiles as tilestage

    ds = assignments(sf_dir)
    out = tilestage.tile_rollup(ds).to_pandas()
    out["mean_knn_dist"] = _round(out["mean_knn_dist"].to_numpy(), 4)
    return out


# ===========================================================================
# Delta semantics over the adapter world (O1, M1/M2, J1-J6)
# ===========================================================================
_ADAPTER_STORE_CACHE: dict[str, Any] = {}


def adapter_changes_full(sf_dir: str) -> pa.Table:
    """Adapter change window incl. payload list columns (members of
    changed ways/relations) in the OSM_CHANGES column layout."""
    ch = td.changes_table(sf_dir)
    n_node = td.read(sf_dir, "part", ["p_partkey"]).num_rows
    n_way = td.read(sf_dir, "orders", ["o_orderkey"]).num_rows
    ids = ch.column("id").to_numpy(zero_copy_only=False)
    types = np.asarray(ch.column("type").to_pylist(), dtype=object)
    actions = np.asarray(ch.column("action").to_pylist(), dtype=object)
    node_ids: list = [None] * len(ids)
    members: list = [None] * len(ids)
    for i in np.flatnonzero((types == "way") & (actions != "delete")).tolist():
        w = int(ids[i])
        node_ids[i] = [(w * 3 + j * 17) % n_node for j in range(w % 4 + 3)]
    for i in np.flatnonzero((types == "relation") & (actions != "delete")).tolist():
        r = int(ids[i])
        members[i] = [
            {"ref": (r * 5 + j * 23) % n_way, "type": "way", "role": ""}
            for j in range(r % 3 + 2)
        ]
    from .schemas import MEMBER, TAGS

    return (
        ch.append_column("node_ids", pa.array(node_ids, type=pa.list_(pa.int64())))
        .append_column("members", pa.array(members, type=pa.list_(MEMBER)))
        .append_column(
            "tags", pa.array([[("type", "route")]] * len(ids), type=TAGS)
        )
    )


def adapter_store(sf_dir: str):
    """Adapter OSM layers as a StateStore (cached on disk per sf tier +
    adapter version; reused across queries and driver calls)."""
    key = os.path.abspath(sf_dir)
    if key in _ADAPTER_STORE_CACHE:
        return _ADAPTER_STORE_CACHE[key]
    from .schemas import OSM_NODES, OSM_RELATIONS, OSM_WAYS
    from .state.store import StateStore

    root = f"/tmp/olu_ray_adapter_{_ADAPTER_VERSION}/{os.path.basename(key)}"
    if os.path.exists(os.path.join(root, "manifest.json")):
        store = StateStore(root)
        _ADAPTER_STORE_CACHE[key] = store
        return store

    nt = td.nodes_table(sf_dir)
    n = nt.num_rows
    ts = pa.array(np.full(n, np.int64(1700000000)).astype("datetime64[s]"))
    nodes = pa.Table.from_pydict(
        {
            "id": nt.column("id"),
            "lon": nt.column("lon"),
            "lat": nt.column("lat"),
            "tags": pa.array([[]] * n, type=OSM_NODES.field("tags").type),
            "version": pa.array(np.ones(n, dtype=np.int32)),
            "ts": ts,
        },
        schema=OSM_NODES,
    )

    we = td.way_edges(sf_dir).sort_by(
        [("way_id", "ascending"), ("pos", "ascending")]
    )
    wid = we.column("way_id").to_numpy(zero_copy_only=False)
    nid = we.column("node_id").to_numpy(zero_copy_only=False)
    bounds = np.flatnonzero(np.diff(wid)) + 1
    uway = wid[np.concatenate([[0], bounds])] if len(wid) else np.empty(0, np.int64)
    lists = [x.tolist() for x in np.split(nid, bounds)] if len(wid) else []
    nw = len(uway)
    ways = pa.Table.from_pydict(
        {
            "id": uway,
            "node_ids": pa.array(lists, type=pa.list_(pa.int64())),
            "tags": pa.array([[]] * nw, type=OSM_WAYS.field("tags").type),
            "version": pa.array(np.ones(nw, dtype=np.int32)),
            "ts": pa.array(np.full(nw, np.int64(1700100000)).astype("datetime64[s]")),
        },
        schema=OSM_WAYS,
    )

    re_ = td.rel_edges(sf_dir).sort_by(
        [("rel_id", "ascending"), ("pos", "ascending")]
    )
    rid = re_.column("rel_id").to_numpy(zero_copy_only=False)
    mid = re_.column("member_id").to_numpy(zero_copy_only=False)
    rbounds = np.flatnonzero(np.diff(rid)) + 1
    urel = rid[np.concatenate([[0], rbounds])] if len(rid) else np.empty(0, np.int64)
    rlists = (
        [
            [{"ref": int(m), "type": "way", "role": ""} for m in x]
            for x in np.split(mid, rbounds)
        ]
        if len(rid)
        else []
    )
    nr = len(urel)
    from .schemas import MEMBER

    rels = pa.Table.from_pydict(
        {
            "id": urel,
            "members": pa.array(rlists, type=pa.list_(MEMBER)),
            "tags": pa.array(
                [[("type", "route")]] * nr, type=OSM_RELATIONS.field("tags").type
            ),
            "version": pa.array(np.ones(nr, dtype=np.int32)),
            "ts": pa.array(np.full(nr, np.int64(1700200000)).astype("datetime64[s]")),
        },
        schema=OSM_RELATIONS,
    )
    store = StateStore.build(root, nodes=nodes, ways=ways, relations=rels)
    _ADAPTER_STORE_CACHE[key] = store
    return store


def _adapter_plan(sf_dir: str):
    from .stages.dedup import dedup_table
    from .stages.delta import classify

    ch = dedup_table(adapter_changes_full(sf_dir))
    return classify(ch, adapter_store(sf_dir)), ch


@register(
    "changes_dedup",
    td.sql_prelude()
    + "\nSELECT seq, type, id, version, action FROM deduped",
)
def changes_dedup(sf_dir: str):
    """Last-version-wins dedup of the change window (O1)."""
    from .stages.dedup import dedup_table

    out = dedup_table(td.changes_table(sf_dir))
    return out.select(["seq", "type", "id", "version", "action"])


@register(
    "classify_changes",
    td.sql_prelude()
    + """
    SELECT d.type, d.id,
      CASE
        WHEN d.action = 'delete' THEN 'deleted'
        WHEN d.action = 'create' THEN 'created'
        WHEN d.type = 'node' AND s.id IS NULL THEN 'created'
        WHEN d.type = 'node' AND (d.lon <> s.lon OR d.lat <> s.lat)
          THEN 'modified_loc_changed'
        ELSE 'modified'
      END AS bucket
    FROM deduped d
    LEFT JOIN state_nodes s ON d.type = 'node' AND d.id = s.id
    """,
)
def classify_changes(sf_dir: str):
    """M1/M2 + J1: change-action classification with the location-change
    split and modify-of-absent reclassification."""
    plan, _ = _adapter_plan(sf_dir)
    t = plan.dirty_sets_table()
    keep = pc.is_in(
        t.column("bucket"),
        value_set=pa.array(["created", "modified", "modified_loc_changed", "deleted"]),
    )
    return t.filter(keep)


_SQL_DIRTY_WAYS_CTES = """
loc_changed AS (
  SELECT d.id FROM deduped d JOIN state_nodes s ON d.id = s.id
  WHERE d.type = 'node' AND d.action = 'modify'
    AND (d.lon <> s.lon OR d.lat <> s.lat)
),
cf_ways AS (SELECT DISTINCT id FROM deduped WHERE type = 'way'),
cf_rels AS (SELECT DISTINCT id FROM deduped WHERE type = 'relation'),
cf_nodes AS (SELECT DISTINCT id FROM deduped WHERE type = 'node'),
dirty_ways AS (
  SELECT DISTINCT e.way_id AS id
  FROM way_edges e JOIN loc_changed l ON e.node_id = l.id
  WHERE e.way_id NOT IN (SELECT id FROM cf_ways)
),
mod_ways AS (SELECT id FROM deduped WHERE type = 'way' AND action = 'modify'),
upd_ways AS (SELECT id FROM mod_ways UNION SELECT id FROM dirty_ways),
dirty_rels AS (
  SELECT DISTINCT e.rel_id AS id
  FROM rel_edges e JOIN upd_ways u ON e.member_id = u.id AND e.member_type = 'way'
  WHERE e.rel_id NOT IN (SELECT id FROM cf_rels)
)"""


@register(
    "dirty_ways",
    td.sql_prelude(_SQL_DIRTY_WAYS_CTES.strip().lstrip(",").strip())
    + "\nSELECT id FROM dirty_ways",
)
def dirty_ways(sf_dir: str):
    """J2: ways whose geometry is dirtied by moved nodes, minus ways in
    the change file."""
    plan, _ = _adapter_plan(sf_dir)
    return pa.Table.from_pydict({"id": plan.ways_to_update_geometry})


@register(
    "dirty_relations",
    td.sql_prelude(_SQL_DIRTY_WAYS_CTES.strip().lstrip(",").strip())
    + "\nSELECT id FROM dirty_rels",
)
def dirty_relations(sf_dir: str):
    """J3: relations referencing moved nodes or updated ways, minus
    relations in the change file (rel-of-rel hop intentionally absent)."""
    plan, _ = _adapter_plan(sf_dir)
    return pa.Table.from_pydict({"id": plan.relations_to_update_geometry})


_SQL_CLOSURE_CTES = (
    _SQL_DIRTY_WAYS_CTES
    + """,
ref_ways_cf AS (
  SELECT DISTINCT member_id AS id FROM changed_rel_members
  WHERE member_id NOT IN (SELECT id FROM cf_ways)
),
rel_closure AS (SELECT id FROM dirty_rels),
ref_ways AS (
  SELECT id FROM ref_ways_cf
  UNION
  SELECT DISTINCT e.member_id AS id
  FROM rel_edges e JOIN rel_closure rc ON e.rel_id = rc.id
  WHERE e.member_type = 'way'
    AND e.member_id NOT IN (SELECT id FROM cf_ways)
),
way_closure AS (SELECT id FROM ref_ways UNION SELECT id FROM dirty_ways),
ref_nodes AS (
  SELECT DISTINCT node_id AS id FROM changed_way_members
  WHERE node_id NOT IN (SELECT id FROM cf_nodes)
  UNION
  SELECT DISTINCT e.node_id AS id
  FROM way_edges e JOIN way_closure wc ON e.way_id = wc.id
  WHERE e.node_id NOT IN (SELECT id FROM cf_nodes)
)"""
)


@register(
    "referenced_ways",
    td.sql_prelude(_SQL_CLOSURE_CTES.strip().lstrip(",").strip())
    + "\nSELECT id FROM ref_ways",
)
def referenced_ways(sf_dir: str):
    """Closure: ways referenced by change-file relations + members of
    dirty relations (J5), minus ways in the change file."""
    plan, _ = _adapter_plan(sf_dir)
    return pa.Table.from_pydict({"id": plan.referenced_ways})


@register(
    "referenced_nodes",
    td.sql_prelude(_SQL_CLOSURE_CTES.strip().lstrip(",").strip())
    + "\nSELECT id FROM ref_nodes",
)
def referenced_nodes(sf_dir: str):
    """Closure: nodes referenced by change-file ways + members of
    (referenced ∪ dirty) ways (J4), minus nodes in the change file."""
    plan, _ = _adapter_plan(sf_dir)
    return pa.Table.from_pydict({"id": plan.referenced_nodes})


@register(
    "reconstruct_nodes",
    td.sql_prelude(_SQL_CLOSURE_CTES.strip().lstrip(",").strip())
    + """
    SELECT s.id, s.lon, s.lat
    FROM ref_nodes r JOIN state_nodes s ON r.id = s.id
    """,
)
def reconstruct_nodes(sf_dir: str):
    """J6: reconstruction fetch of referenced node payloads (missing
    rows tolerated — left-semi, the regional-extract semantics)."""
    plan, _ = _adapter_plan(sf_dir)
    t = adapter_store(sf_dir).lookup(
        "nodes", plan.referenced_nodes, columns=["id", "lon", "lat"]
    )
    return t


# ===========================================================================
# Text analysis / dedup / similarity / events / multimodal
# ===========================================================================
@register(
    "doc_stats",
    """
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def doc_stats(sf_dir: str):
    """Token counting + length stats — zero-copy Arrow kernels
    (utf8_length / split_pattern + list_value_length), no pandas
    object-dtype round trip."""
    rd = _rd()

    def stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(
                pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
            ),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(stats, batch_format="pyarrow")


@register(
    "doc_pack_chunks",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum_before // 512 AS BIGINT) AS chunk_start,
           CAST((cum_before + n_tokens - 1) // 512 AS BIGINT) AS chunk_end,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_chunk
    FROM c
    """,
)
def doc_pack_chunks(sf_dir: str):
    """Sequence packing for training: concatenate the corpus in doc_id
    order and split at fixed 512-token boundaries — every doc gets the
    chunk range it lands in (docs may straddle a boundary, exactly the
    concat-and-chunk layout LLM pretraining uses).

    Distributed shape = the classic two-phase PREFIX SUM, which no
    single groupby expresses: (1) per-partition token totals (partition
    = doc_id range bucket, so the exchange is one row per bucket);
    (2) driver computes the tiny exclusive-offset table; (3) each
    bucket independently sorts its own docs and adds its offset to a
    local cumsum.  No stage ever sees more than its bucket; the
    offsets table is two ints per bucket.  At real scale the
    (doc_id, n_tokens) projection would be persisted instead of
    recomputed for pass 2."""
    rd = _rd()
    from ray.data.aggregate import Sum

    SPAN, B = 4096, 512

    def proj(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table({
            "doc_id": ids,
            "n_tokens": pc.cast(
                pc.list_value_length(pc.split_pattern(t.column("text"), " ")),
                pa.int64(),
            ),
            "part": pc.divide(ids, pa.scalar(SPAN, type=pa.int64())),
        })

    proj_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(proj, batch_format="pyarrow").materialize()
    sums = (
        proj_ds.groupby("part").aggregate(Sum("n_tokens", alias_name="tok")).to_pandas()
    ).sort_values("part")
    offsets = dict(
        zip(sums["part"], np.concatenate([[0], np.cumsum(sums["tok"].to_numpy())[:-1]]))
    )

    def pack(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        tok = g.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.argsort(ids, kind="stable")
        ids, tok = ids[o], tok[o]
        cum_before = int(offsets[int(ids[0]) // SPAN]) + np.concatenate(
            [[0], np.cumsum(tok)[:-1]]
        )
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(tok),
            "chunk_start": pa.array(cum_before // B),
            "chunk_end": pa.array((cum_before + tok - 1) // B),
            "offset_in_chunk": pa.array(cum_before % B),
        })

    return proj_ds.groupby("part").map_groups(pack, batch_format="pyarrow")


@register(
    "doc_quality",
    """
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LEN(STRING_SPLIT(text, ' ')), 4) AS mean_token_len
    FROM documents
    """,
)
def doc_quality(sf_dir: str):
    """Quality-scoring features (single-space-token world; richer
    whitespace/stopword/punct features live in functions/text.py and
    are covered by unit tests).  Zero-copy Arrow kernels throughout."""
    rd = _rd()

    def q(t: pa.Table) -> pa.Table:
        text = t.column("text")
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        nonspace = pc.utf8_length(
            pc.replace_substring(text, " ", "")
        ).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pa.array(n_tok),
            "mean_token_len": pa.array(
                _round(nonspace.astype(np.float64) / n_tok, 4)
            ),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(q, batch_format="pyarrow")


@register(
    "lang_counts",
    "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang",
)
def lang_counts(sf_dir: str):
    from ray.data.aggregate import Count

    rd = _rd()
    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


@register(
    "word_counts",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def word_counts(sf_dir: str):
    """Corpus vocabulary frequency — the canonical map-side-combine
    shape: each batch pre-aggregates its own (word, count) partials in
    one vectorized np.unique pass, so the groupby exchange carries one
    row per (block, distinct word) instead of one per corpus token.
    At 100 TB the shuffle moves ~|vocab| x n_blocks rows, not ~10^13
    token rows (reference A5 counters pattern, SURVEY §2.5)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(t.column("text"), " ")
        ).combine_chunks()
        vc = pc.value_counts(words)
        return pa.table({
            "word": vc.field("values"), "n_part": vc.field("counts"),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="n"))
    )


@register(
    "doc_repetition",
    """
    WITH w AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (SELECT doc_id, word, COUNT(*) AS k FROM w GROUP BY doc_id, word)
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_words,
           COUNT(*) AS n_distinct_words,
           ROUND(1.0 - COUNT(*) / CAST(SUM(k) AS DOUBLE), 4) AS dup_word_frac,
           ROUND(MAX(k) / CAST(SUM(k) AS DOUBLE), 4) AS top_word_frac
    FROM c GROUP BY doc_id
    """,
)
def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document: fraction
    of tokens that repeat an earlier token, and the share held by the
    single most frequent token (boilerplate detector for training-data
    filtering).  Embarrassingly parallel — each doc is one row; the
    batch kernel factorizes the exploded (doc, word) pairs and does all
    per-doc reductions with np.add/maximum.reduceat over ONE unique
    pass — no per-doc Python loop."""
    rd = _rd()

    def rep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                "n_distinct_words": pa.array([], type=pa.int64()),
                "dup_word_frac": pa.array([], type=pa.float64()),
                "top_word_frac": pa.array([], type=pa.float64()),
            })
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = off[1:] - off[:-1]
        codes = pc.dictionary_encode(lists.values).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vocab = int(codes.max()) + 1
        didx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        uk, counts = np.unique(didx * vocab + codes, return_counts=True)
        gdoc = uk // vocab
        starts = np.concatenate([[0], np.flatnonzero(np.diff(gdoc)) + 1])
        n_words = np.add.reduceat(counts, starts)
        n_distinct = np.diff(np.concatenate([starts, [len(uk)]]))
        top = np.maximum.reduceat(counts, starts)
        nw = n_words.astype(np.float64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[gdoc[starts]]),
            "n_words": pa.array(n_words.astype(np.int64)),
            "n_distinct_words": pa.array(n_distinct.astype(np.int64)),
            "dup_word_frac": pa.array(_round(1.0 - n_distinct / nw, 4)),
            "top_word_frac": pa.array(_round(top / nw, 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(rep, batch_format="pyarrow")


@register(
    "tfidf_top_term",
    """
    WITH w AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word),
    s AS (
      SELECT doc_id, word,
             ROUND(tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                           / df), 4) AS score
      FROM tf JOIN df USING (word)
    )
    SELECT doc_id, word AS top_term, score
    FROM s
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, word) = 1
    """,
)
def tfidf_top_term(sf_dir: str):
    """Per-document top TF-IDF term — the two-pass broadcast pattern:
    pass 1 computes document frequencies with the same map-side combine
    as `word_counts` (per-batch distinct (doc, word) pairs, so the
    exchange is vocabulary-sized); the tiny df table is broadcast into
    pass 2, which scores per-doc term frequencies and takes the argmax
    (ties broken by term text, scores rounded BEFORE ordering on both
    sides so ulp noise cannot flip the winner).  No shuffle ever
    carries a per-token row."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        parent = pc.list_parent_indices(lists)
        pairs = pa.table({
            "doc_id": t.column("doc_id").combine_chunks().take(parent),
            "word": pc.list_flatten(lists),
        })
        dis = pairs.group_by(["doc_id", "word"]).aggregate([])
        vc = pc.value_counts(dis.column("word").combine_chunks())
        return pa.table({
            "word": vc.field("values"),
            "df_part": vc.field("counts"),
        })

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # each doc lives in exactly one batch, so summing per-batch distinct
    # (doc, word) counts gives the exact global document frequency
    df_tbl = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df_part", alias_name="df"))
        .to_pandas()
    )
    dfk = pa.array(df_tbl["word"].to_numpy(dtype=object), type=pa.string())
    dfv = df_tbl["df"].to_numpy(dtype=np.float64)
    n_docs = float(_pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "top_term": pa.array([], type=pa.string()),
                "score": pa.array([], type=pa.float64()),
            })
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = off[1:] - off[:-1]
        denc = pc.dictionary_encode(lists.values)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dic = denc.dictionary
        vocab = len(dic)
        didx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        uk, counts = np.unique(didx * vocab + codes, return_counts=True)
        gdoc, gcode = uk // vocab, uk % vocab
        # per-dictionary-word idf (every batch word is in the global df)
        dpos = pc.index_in(dic, value_set=dfk).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        idf = np.log(n_docs / dfv[dpos])
        sc = _round(counts * idf[gcode], 4)
        # lexicographic rank of the batch dictionary for the tie-break
        dic_np = dic.to_numpy(zero_copy_only=False).astype(object)
        wr = np.empty(vocab, dtype=np.int64)
        wr[np.argsort(dic_np, kind="stable")] = np.arange(vocab)
        order = np.lexsort((wr[gcode], -sc, gdoc))
        first = order[
            np.concatenate([[0], np.flatnonzero(np.diff(gdoc[order])) + 1])
        ]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[gdoc[first]]),
            "top_term": dic.take(pa.array(gcode[first])),
            "score": pa.array(sc[first]),
        })

    return docs.map_batches(score, batch_format="pyarrow")


@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact_q(sf_dir: str):
    """Exact dedup = hash-partition + per-group first (the canonical
    shuffle-dedup); output = one surviving row per distinct text.  The
    exchange is HASH-ONLY: scan tasks project (fold, h1, h2, doc_id) —
    a 128-bit content fingerprint, never the text — so the dedup
    shuffle no longer scales with document length.  Singleton hash
    groups are final; members of multi-doc hash groups (the duplicate
    set itself) are re-read with text through a pruned scan and
    verified per ACTUAL text, so a fingerprint collision can never
    merge two distinct texts."""
    import ray

    from .stages.dedup_docs import _hash_group_marks, tag_hash128

    rd = _rd()
    # NOTE: deliberately NOT materialized — the verify pass re-reads
    # from parquet rather than pinning corpus-sized text blocks in the
    # object store; scans are the cheap resource, exchanges and
    # residency are the scarce ones at 100 TB
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    marks = (
        ds.map_batches(tag_hash128, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(_hash_group_marks, batch_format="pyarrow")
        .materialize()  # tiny (id + 3 small cols); consumed twice
    )
    singles = marks.map_batches(
        lambda t: t.filter(
            pc.invert(t.column("multi"))
        ).select(["doc_id", "n_copies"]),
        batch_format="pyarrow",
    )
    multi_parts = [
        b
        for b in marks.map_batches(
            lambda t: t.filter(t.column("multi")).select(["doc_id"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not multi_parts:
        return singles
    multi_ids = np.sort(
        pa.concat_tables(multi_parts)
        .column("doc_id")
        .to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    ref = ray.put(multi_ids)

    def fetch(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(ids, want)))
        return tag_hash128(t).append_column(
            "text", t.column("text").combine_chunks()
        )

    def per_text(g: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(g.column("text").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k = len(enc.dictionary)
        mins = np.full(k, np.iinfo(np.int64).max)
        np.minimum.at(mins, codes, ids)
        return pa.table({
            "doc_id": pa.array(mins),
            "n_copies": pa.array(np.bincount(codes, minlength=k).astype(
                np.int64)),
        })

    verified = (
        ds.map_batches(fetch, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(per_text, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(["doc_id", "n_copies"]), batch_format="pyarrow"
        )
    )
    return singles.union(verified)


@register(
    "training_mix",
    """
    WITH t AS (
      SELECT doc_id, lang, text,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             list_reduce(
               list_prepend(0::HUGEINT,
                 list_transform(range(1, length(text)+1),
                                i -> ord(substr(text, i, 1))::HUGEINT)),
               (h, b) -> (h * 1000003 + b) % 18446744073709551616::HUGEINT
             ) % 100 AS bucket
      FROM documents
    ), q AS (
      SELECT * FROM t WHERE n_tokens BETWEEN 20 AND 90
    ), d AS (
      SELECT * FROM q
      QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
    ), s AS (
      SELECT doc_id, lang, n_tokens, CAST(bucket AS BIGINT) AS bucket
      FROM d
      WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
                               WHEN 'fr' THEN 20 ELSE 10 END
    ), c AS (
      SELECT doc_id, lang, n_tokens, bucket,
        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM s
    )
    SELECT doc_id, lang, n_tokens, bucket,
           CAST(cum_before // 512 AS BIGINT) AS chunk_start,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_chunk
    FROM c
    """,
)
def training_mix(sf_dir: str):
    """The composed end-to-end training-data pipeline, as ONE streaming
    Dataset: quality filter (token-count window) → exact dedup (hash
    shuffle, keep min doc_id per distinct text) → deterministic
    stratified downsample (fingerprint bucket vs per-language rate) →
    concat-and-chunk sequence packing (distributed prefix sum).  Two
    shuffles total (dedup groupby, pack regroup); text leaves the
    pipeline at the dedup stage — everything downstream moves only
    int/lang columns.  Every stage is deterministic, so the whole mix
    is oracle-checked end to end."""
    rd = _rd()
    import ray
    from ray.data.aggregate import Sum

    from .functions import hashing as hashfn
    from .functions import text as textfn
    from .stages.dedup_docs import _hash_group_marks

    SPAN, B = 4096, 512
    rates = {"en": 50, "de": 30, "fr": 20}

    def stage_a(t: pa.Table) -> pa.Table:
        # quality window + fingerprint bucket + 128-bit content hash,
        # all INSIDE the scan task: text is dropped here and never
        # crosses an exchange (the dedup decision travels as (h1, h2))
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(t.column("text"), " ")),
            pa.int64(),
        )
        keep = pc.and_(pc.greater_equal(n_tok, pa.scalar(20)),
                       pc.less_equal(n_tok, pa.scalar(90)))
        t = t.append_column("n_tokens", n_tok).filter(keep)
        texts = t.column("text").combine_chunks()
        h1, h2 = hashfn.hash_strings128(
            texts.to_numpy(zero_copy_only=False)
        )
        bucket = (
            textfn.fingerprint64_batch(texts).view(np.uint64)
            % np.uint64(100)
        ).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "n_tokens": t.column("n_tokens"),
            "bucket": pa.array(bucket),
            "h1": pa.array(h1),
            "h2": pa.array(h2),
            "fold": pa.array(hashfn.fold_pair_int64(h1, h2, 64)),
        })

    rate_keys = pa.array(sorted(rates), type=pa.string())
    rate_vals = np.array([rates[k] for k in sorted(rates)], dtype=np.int64)

    def sample(t: pa.Table) -> pa.Table:
        pos = pc.fill_null(
            pc.index_in(t.column("lang"), value_set=rate_keys), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.where(pos < 0, 10, rate_vals[np.clip(pos, 0, None)])
        keep = t.column("bucket").to_numpy(zero_copy_only=False) < thr
        t = t.filter(pa.array(keep))
        return t.append_column(
            "part",
            pc.divide(t.column("doc_id"), pa.scalar(SPAN, type=pa.int64())),
        )

    filtered = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )
        .map_batches(stage_a, batch_format="pyarrow")
        .materialize()  # text-free; consumed by dedup marks + survivors
    )
    marks = (
        filtered.groupby("fold")
        .map_groups(_hash_group_marks, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(t.column("multi")).select(["doc_id", "is_min"]),
            batch_format="pyarrow",
        )
    )
    multi_parts = [
        b for b in marks.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    drop_ids = np.empty(0, dtype=np.int64)
    if multi_parts:
        # verify the duplicate set on ACTUAL text (collision safety):
        # pruned re-read of only the multi-group members
        mt = pa.concat_tables(multi_parts)
        multi_ids = np.sort(
            mt.column("doc_id").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        mref = ray.put(multi_ids)

        def fetch(t: pa.Table) -> pa.Table:
            want = ray.get(mref)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(np.isin(ids, want)))
            texts = t.column("text").to_pylist()
            h1, h2 = hashfn.hash_strings128(texts)
            return pa.table({
                "doc_id": t.column("doc_id").combine_chunks(),
                "text": t.column("text").combine_chunks(),
                "fold": pa.array(hashfn.fold_pair_int64(h1, h2, 64)),
            })

        def losers(g: pa.Table) -> pa.Table:
            enc = pc.dictionary_encode(g.column("text").combine_chunks())
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            mins = np.full(len(enc.dictionary), np.iinfo(np.int64).max)
            np.minimum.at(mins, codes, ids)
            return pa.table({"doc_id": pa.array(ids[ids != mins[codes]])})

        lost = (
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            .map_batches(fetch, batch_format="pyarrow")
            .groupby("fold")
            .map_groups(losers, batch_format="pyarrow")
        )
        lost_parts = [
            b for b in lost.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        if lost_parts:
            drop_ids = np.sort(
                pa.concat_tables(lost_parts)
                .column("doc_id")
                .to_numpy(zero_copy_only=False)
            ).astype(np.int64)
    dref = ray.put(drop_ids)

    def survive(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        if len(d):
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.clip(np.searchsorted(d, ids), 0, len(d) - 1)
            t = t.filter(pa.array(d[pos] != ids))
        return sample(t.drop_columns(["h1", "h2", "fold"]))

    survivors = (
        filtered.map_batches(survive, batch_format="pyarrow")
        .materialize()  # consumed twice: offsets pass + pack pass
    )
    sums = (
        survivors.groupby("part")
        .aggregate(Sum("n_tokens", alias_name="tok"))
        .to_pandas()
        .sort_values("part")
    )
    offsets = dict(
        zip(sums["part"], np.concatenate([[0], np.cumsum(sums["tok"].to_numpy())[:-1]]))
    )

    def pack(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.argsort(ids, kind="stable")
        take = pa.array(o)
        tok = g.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[o]
        part = int(g.column("part")[0].as_py())
        cum_before = int(offsets[part]) + np.concatenate(
            [[0], np.cumsum(tok)[:-1]]
        )
        return pa.table({
            "doc_id": pa.array(ids[o]),
            "lang": g.column("lang").combine_chunks().take(take),
            "n_tokens": pa.array(tok),
            "bucket": g.column("bucket").combine_chunks().take(take),
            "chunk_start": pa.array(cum_before // B),
            "offset_in_chunk": pa.array(cum_before % B),
        })

    return survivors.groupby("part").map_groups(pack, batch_format="pyarrow")


@register(
    "dedup_incremental",
    """
    WITH k AS (
      SELECT CAST(FLOOR(COUNT(*) * 0.6) AS BIGINT) AS k FROM documents
    ),
    win AS (SELECT doc_id, text FROM documents, k WHERE doc_id >= k.k)
    SELECT MIN(doc_id) AS doc_id
    FROM win
    WHERE text NOT IN (SELECT text FROM documents, k WHERE doc_id < k.k)
    GROUP BY text
    """,
)
def dedup_incremental(sf_dir: str):
    """Incremental ingest dedup — the 100-TB operating shape: a NEW
    window (the last 40% of doc_ids) is deduped against the accepted
    corpus (the first 60%) WITHOUT scanning it, via a persisted
    hash-partitioned fingerprint index; each window shard consults
    exactly one index part (stages/dedup_docs.py::incremental_dedup).
    The index build is cached per sf tier and published atomically
    (rename), so concurrent battery runs never see a half-built
    index."""
    import hashlib
    import shutil

    import pyarrow.parquet as _pq

    from .stages import dedup_docs

    rd = _rd()
    path = f"{sf_dir}/documents.parquet"
    n = _pq.read_metadata(path).num_rows
    k = int(n * 0.6)
    key = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:v1".encode()
    ).hexdigest()[:10]
    index_dir = f"/tmp/olu_ray_dedup_idx_{key}"
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    if not os.path.isdir(index_dir):
        tmp = index_dir + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        dedup_docs.build_hash_index(
            docs.map_batches(
                lambda t: t.filter(pc.less(t.column("doc_id"), k)),
                batch_format="pyarrow",
            ),
            tmp,
        )
        try:
            os.rename(tmp, index_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # another run won
    win = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("doc_id"), k)),
        batch_format="pyarrow",
    )
    return dedup_docs.incremental_dedup(win, index_dir).select_columns(
        ["doc_id"]
    )


@register(
    "doc_shuffle_shards",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(text), doc_id) - 1
                AS BIGINT) AS pos,
           CAST((ROW_NUMBER() OVER (ORDER BY md5(text), doc_id) - 1) // 100
                AS BIGINT) AS shard
    FROM documents
    """,
)
def doc_shuffle_shards(sf_dir: str):
    """Deterministic shuffled training export: every doc gets its
    GLOBAL position in md5(text) order (a seedless content-hash
    shuffle — reproducible and resumable, unlike RNG state) and the
    fixed-size output shard that position lands in.

    Distributed global ROW_NUMBER without a global sort: md5's first
    byte range-buckets the corpus into 256 ORDERED buckets; phase 1
    exchanges one count per bucket, the driver prefix-sums the 256-row
    offset table, phase 2 ranks each bucket locally and adds its
    offset.  No stage ever holds more than one bucket; the exchange is
    bucket-sized, never row-sized."""
    import hashlib

    rd = _rd()
    from ray.data.aggregate import Count

    def hashed(t: pa.Table) -> pa.Table:
        # md5 has no Arrow kernel; the per-row hash call is the kernel
        # (C speed), everything around it stays Arrow
        h = [hashlib.md5(s.encode()).hexdigest()
             for s in t.column("text").to_pylist()]
        harr = pa.array(h, type=pa.string())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h": harr,
            "bucket": pa.array(
                np.frombuffer(
                    bytes.fromhex("".join(x[:2] for x in h)), dtype=np.uint8
                ).astype(np.int64)
                if h else np.array([], dtype=np.int64)
            ),
        })

    hs = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(hashed, batch_format="pyarrow")
        .materialize()
    )
    counts = (
        hs.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    ).sort_values("bucket")
    offsets = dict(
        zip(
            counts["bucket"],
            np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]]),
        )
    )

    def rank(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = g.column("h").to_numpy(zero_copy_only=False).astype(object)
        o = np.lexsort((ids, h))
        pos = int(offsets[int(g.column("bucket")[0].as_py())]) + np.arange(
            len(ids), dtype=np.int64
        )
        return pa.table({
            "doc_id": pa.array(ids[o]),
            "pos": pa.array(pos),
            "shard": pa.array(pos // 100),
        })

    return hs.groupby("bucket").map_groups(rank, batch_format="pyarrow")


def _minhash_prefix_sql() -> str:
    """Shared CTE chain of the MinHash oracle mirrors: docs -> distinct
    string shingles (sh) -> polynomial+splitmix64 hash -> x mod M61 ->
    MinHash signatures (the engine's exact (a,b) permutation constants
    baked in as literals) -> FNV-folded LSH band rows.  All mod-2^64
    arithmetic runs in UHUGEINT (a UHUGEINT + BIGNT mix silently
    promotes to DOUBLE — every addend is cast); the engine's wrap/fold
    steps are mirrored op for op."""
    from .functions import hashing as _h

    a, b = _h._minhash_params(64, 1)
    params = ", ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(64)
    )
    m61 = (1 << 61) - 1
    return f"""params(p, pa, pb) AS (VALUES {params}),
    docs AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, UNNEST(
        CASE WHEN length(norm) <= 5 THEN [norm]
             ELSE list_transform(range(1, length(norm) - 3),
                                 i -> substr(norm, i, 5)) END) AS s
      FROM docs
    ),
    h0 AS (SELECT doc_id, CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(s)+1),
                           j -> CAST(unicode(substr(s, j, 1)) AS UHUGEINT))),
            (acc, c) -> (acc * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT) AS v FROM sh),
    m1 AS (SELECT doc_id, CAST((v::UHUGEINT + 11400714819323198485)
            % 18446744073709551616 AS UBIGINT) AS v FROM h0),
    m2 AS (SELECT doc_id, xor(v, v >> 30) AS v FROM m1),
    m3 AS (SELECT doc_id, CAST((v::UHUGEINT * 13787848793156543929)
            % 18446744073709551616 AS UBIGINT) AS v FROM m2),
    m4 AS (SELECT doc_id, xor(v, v >> 27) AS v FROM m3),
    m5 AS (SELECT doc_id, CAST((v::UHUGEINT * 10723151780598845931)
            % 18446744073709551616 AS UBIGINT) AS v FROM m4),
    hh AS (SELECT doc_id, xor(v, v >> 31) AS v FROM m5),
    xs AS (SELECT DISTINCT doc_id, v % {m61} AS x FROM hh),
    sig AS (
      SELECT doc_id, p, MIN(CASE WHEN r >= {m61} THEN r - {m61} ELSE r END)
             AS sig
      FROM (
        SELECT doc_id, p, (prod >> 61) + (prod & {m61}) AS r
        FROM (
          SELECT xs.doc_id, params.p,
                 CAST((CAST(params.pa AS UHUGEINT) * xs.x
                       + CAST(params.pb AS UHUGEINT))
                      % 18446744073709551616 AS UBIGINT) AS prod
          FROM xs, params
        )
      ) GROUP BY doc_id, p
    ),
    siglist AS (SELECT doc_id, list(sig ORDER BY p) AS sigs
                FROM sig GROUP BY doc_id),
    bandrows AS (
      SELECT doc_id, t.range AS b,
        CAST(list_reduce(list_prepend(CAST(1469598103934665603 AS UHUGEINT),
          [sigs[t.range*4+1], sigs[t.range*4+2],
           sigs[t.range*4+3], sigs[t.range*4+4]]),
          (h, s) -> (CAST(xor(CAST(h AS UBIGINT), CAST(s AS UBIGINT))
                          AS UHUGEINT) * 1099511628211)
                     % 18446744073709551616) AS UBIGINT) AS bh
      FROM siglist, range(0, 16) t
    )"""


def _minhash_near_dups_sql() -> str:
    """Bit-exact DuckDB mirror of the full MinHash+LSH near-dup
    pipeline: the shared MinHash prefix (exact signature/band
    arithmetic), all-pairs candidates within each (band, band_hash)
    bucket, EXACT string-shingle Jaccard >= 0.8 verification (the same
    shingle definition the ngram_jaccard_dups oracle pins), and
    connected components as a recursive transitive closure with
    min-label components.  The engine chains buckets > 200 rows; the
    testdata's buckets are far smaller, so all-pairs is exact here."""
    return f"""
    WITH RECURSIVE {_minhash_prefix_sql()},
    cand AS (
      SELECT DISTINCT b1.doc_id AS id_a, b2.doc_id AS id_b
      FROM bandrows b1 JOIN bandrows b2
        ON b1.b = b2.b AND b1.bh = b2.bh AND b1.doc_id < b2.doc_id
    ),
    cntx AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS i
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
      GROUP BY c.id_a, c.id_b
    ),
    verified AS (
      SELECT id_a, id_b
      FROM inter
      JOIN cntx ca ON ca.doc_id = id_a
      JOIN cntx cb ON cb.doc_id = id_b
      WHERE i / (ca.n + cb.n - i) >= 0.8e0
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    ),
    reach(a, b) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b
    )
    SELECT a AS doc_id, MIN(b) AS component
    FROM reach GROUP BY a ORDER BY doc_id
    """


@register("minhash_near_dups", _minhash_near_dups_sql())
def minhash_near_dups(sf_dir: str):
    """MinHash+LSH candidate pairs, Jaccard-verified by joining the
    pairs back to the documents Dataset (no driver-side corpus text),
    with connected components (shingle->minhash->band->bucket groupby)."""
    import pyarrow.parquet as _pq

    from .stages import dedup_docs

    rd = _rd()
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # materialize: count() + the verify stage must not re-execute the
    # shingle+groupby lineage a second time
    cand = dedup_docs.minhash_candidate_pairs(docs_ds).materialize()
    if cand.count() == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "component": pa.array([], type=pa.int64())}
        )
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs <= 100_000:
        # work-based shape switch (same rule as the delta paths): the
        # distributed verify is two hash joins + two groupbys — ~6
        # pipeline ramps that dwarf corpus-size work below ~100k docs.
        # The driver path holds only ≤100k texts; the distributed one
        # stays the default above and is equality-tested in pytest.
        docs_tbl = td.read(sf_dir, "documents", ["doc_id", "text"])
        texts = dict(
            zip(docs_tbl.column("doc_id").to_pylist(),
                docs_tbl.column("text").to_pylist())
        )
        verified = dedup_docs.verify_pairs(
            cand.to_pandas(), texts, threshold=0.8
        )
    else:
        verified = dedup_docs.verify_pairs_distributed(
            cand, docs_ds, threshold=0.8
        ).to_pandas()
    comp = dedup_docs.connected_components(verified)
    return pa.Table.from_pandas(comp, preserve_index=False)


@register(
    "ngram_jaccard_dups",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(nt, i, 5) AS sh
      FROM norm,
        LATERAL (SELECT unnest(generate_series(1, greatest(length(nt)-4, 1))) AS i) g
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, i / (ca.n + cb.n - i) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
    WHERE i / (ca.n + cb.n - i) >= 0.8e0
    """,
)
def ngram_jaccard_dups_q(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (AllPairs/PPJoin prefix
    filtering; no approximation) — the deterministic counterpart of
    `minhash_near_dups`.  Oracle mirrors the shingle definition with
    substr over the normalized text; the engine's Jaccard is
    |A∩B| / |A∪B| on shingle STRINGS (not hashes), so a 64-bit hash
    collision can never diverge from the SQL."""
    from .stages import dedup_docs

    rd = _rd()
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = dedup_docs.ngram_jaccard_pairs(docs_ds, threshold=0.8, k=5).to_pandas()
    if not len(out):
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=float)})
    return out


def _simhash_near_dups_sql() -> str:
    """Bit-exact DuckDB mirror of the SimHash near-dup pipeline:
    whitespace tokens (duplicates kept — bit votes count multiplicity)
    -> polynomial+splitmix64 token hash -> majority bit votes -> 64-bit
    signature -> four 16-bit sub-band buckets -> in-bucket pairs with
    XOR popcount hamming <= 3.  A pair sharing two bands emits twice on
    both sides (the engine does not dedupe across bands).  The engine
    chains buckets > 500 rows; testdata buckets are far smaller."""
    return """
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(
        str_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
      FROM documents
    ),
    h0 AS (SELECT doc_id, CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(w)+1),
                           j -> CAST(unicode(substr(w, j, 1)) AS UHUGEINT))),
            (acc, c) -> (acc * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT) AS v FROM toks),
    m1 AS (SELECT doc_id, CAST((v::UHUGEINT + 11400714819323198485)
            % 18446744073709551616 AS UBIGINT) AS v FROM h0),
    m2 AS (SELECT doc_id, xor(v, v >> 30) AS v FROM m1),
    m3 AS (SELECT doc_id, CAST((v::UHUGEINT * 13787848793156543929)
            % 18446744073709551616 AS UBIGINT) AS v FROM m2),
    m4 AS (SELECT doc_id, xor(v, v >> 27) AS v FROM m3),
    m5 AS (SELECT doc_id, CAST((v::UHUGEINT * 10723151780598845931)
            % 18446744073709551616 AS UBIGINT) AS v FROM m4),
    hh AS (SELECT doc_id, xor(v, v >> 31) AS v FROM m5),
    votes AS (
      SELECT doc_id, t.range AS bit,
             SUM(CAST((v >> t.range) & 1 AS BIGINT)) AS ones,
             COUNT(*) AS n
      FROM hh, range(0, 64) t GROUP BY doc_id, t.range
    ),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN 2 * ones > n
                           THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT)
                           ELSE 0 END) AS UBIGINT) AS s
      FROM votes GROUP BY doc_id
    ),
    siga AS (
      SELECT d.doc_id, COALESCE(s.s, CAST(0 AS UBIGINT)) AS s
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN sig s USING (doc_id)
    ),
    bandrows AS (
      SELECT doc_id, t.range AS band,
             (s >> (16 * t.range)) & 65535 AS key, s
      FROM siga, range(0, 4) t
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM bandrows a JOIN bandrows b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    ORDER BY id_a, id_b
    """


@register("simhash_near_dups", _simhash_near_dups_sql())
def simhash_near_dups_q(sf_dir: str):
    from .stages import dedup_docs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_docs.simhash_near_dups(ds)


@register(
    "doc_fingerprints",
    """
    SELECT doc_id,
      CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
        AS fingerprint
    FROM (
      SELECT doc_id,
        list_reduce(
          list_prepend(0::HUGEINT,
            list_transform(range(1, length(text)+1),
                           i -> ord(substr(text, i, 1))::HUGEINT)),
          (h, b) -> (h * 1000003 + b) % 18446744073709551616::HUGEINT
        ) AS h
      FROM documents
    )
    """,
)
def doc_fingerprints(sf_dir: str):
    """Rolling polynomial hash (Horner, base 1000003, mod 2^64) per doc.

    The oracle mirrors the recurrence exactly: DuckDB ``list_reduce``
    over the code points (documents are ASCII, so ord == UTF-8 byte)
    in HUGEINT with an explicit mod-2^64, then a two's-complement fold
    to BIGINT — matching the engine's uint64 wraparound → int64 view.
    """
    from .functions import text as textfn

    rd = _rd()

    def fp(t: pa.Table) -> pa.Table:
        vals = textfn.fingerprint64_batch(t.column("text"))
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "fingerprint": pa.array(vals, type=pa.int64())}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fp, batch_format="pyarrow")


@register(
    "doc_sample_stratified",
    """
    WITH h AS (
      SELECT doc_id, lang,
        list_reduce(
          list_prepend(0::HUGEINT,
            list_transform(range(1, length(text)+1),
                           i -> ord(substr(text, i, 1))::HUGEINT)),
          (h, b) -> (h * 1000003 + b) % 18446744073709551616::HUGEINT
        ) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket
    FROM h
    WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
                             WHEN 'fr' THEN 20 ELSE 10 END
    """,
)
def doc_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling — the downsample step of a
    training-data mix.  The sampling decision is a pure function of the
    document bytes (rolling-hash fingerprint mod 100 vs a per-language
    rate), so the sample is reproducible across runs, resumable
    mid-corpus, and needs NO shuffle or shared RNG state: each batch
    filters independently inside map_batches.  Rates: en 50%, de 30%,
    fr 20%, all other languages 10%."""
    from .functions import text as textfn

    rd = _rd()
    rates = {"en": 50, "de": 30, "fr": 20}

    def samp(t: pa.Table) -> pa.Table:
        buckets = (
            textfn.fingerprint64_batch(t.column("text")).view(np.uint64)
            % np.uint64(100)
        ).astype(np.int64)
        langs = t.column("lang").to_pylist()
        thr = np.fromiter((rates.get(l, 10) for l in langs), np.int64, len(langs))
        keep = buckets < thr
        t = t.append_column("bucket", pa.array(buckets, type=pa.int64()))
        return t.filter(pa.array(keep)).select(["doc_id", "lang", "bucket"])

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(samp, batch_format="pyarrow")


_LANGID_SQL = """
    WITH toks AS (
      SELECT doc_id, text,
             list_transform(
               string_split_regex(TRIM(LOWER(LEFT(text, 4000))), '\\s+'),
               t -> t
             ) AS tk,
             LEFT(text, 2000) AS head
      FROM documents
    ), votes AS (
      SELECT doc_id, text, head,
             (CASE WHEN list_contains(tk,'der') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'die') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'und') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'ist') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'nicht') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'das') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'ein') THEN 1 ELSE 0 END) AS v_de,
             (CASE WHEN list_contains(tk,'the') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'and') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'of') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'is') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'you') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'that') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'with') THEN 1 ELSE 0 END) AS v_en,
             (CASE WHEN list_contains(tk,'el') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'la') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'los') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'es') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'una') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'que') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'por') THEN 1 ELSE 0 END) AS v_es,
             (CASE WHEN list_contains(tk,'le') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'la') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'les') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'est') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'une') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'dans') THEN 1 ELSE 0 END +
              CASE WHEN list_contains(tk,'pas') THEN 1 ELSE 0 END) AS v_fr
      FROM toks
    )
    SELECT doc_id,
           CASE
             WHEN text IS NULL OR text = '' THEN 'und'
             WHEN LENGTH(head) > 0
                  AND LENGTH(regexp_replace(head, '[^\u4e00-\u9fff]', '', 'g'))
                      > 0.05 * LENGTH(head) THEN 'zh'
             WHEN GREATEST(v_de, v_en, v_es, v_fr) = 0 THEN 'und'
             WHEN v_de = GREATEST(v_de, v_en, v_es, v_fr) THEN 'de'
             WHEN v_en = GREATEST(v_de, v_en, v_es, v_fr) THEN 'en'
             WHEN v_es = GREATEST(v_de, v_en, v_es, v_fr) THEN 'es'
             ELSE 'fr'
           END AS pred_lang
    FROM votes
    """


@register("doc_langid", _LANGID_SQL)  # mirrored SQL: marker votes + CJK share
def doc_langid(sf_dir: str):
    from .functions import text as textfn

    rd = _rd()

    def lid(t: pa.Table) -> pa.Table:
        vals = [textfn.lang_id(s) for s in t.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "pred_lang": pa.array(vals)}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lid, batch_format="pyarrow")


@register(
    "embedding_norms",
    """
    SELECT vec_id,
           ROUND(SQRT(SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE))), 4) AS l2
    FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings)
    GROUP BY vec_id
    """,
)
def embedding_norms(sf_dir: str):
    rd = _rd()

    def norms(t: pa.Table) -> pa.Table:
        from .stages.similarity import _stack

        X = _stack(t, "embedding")
        l2 = _round(np.sqrt((X * X).sum(axis=1)), 4)
        return pa.Table.from_pydict(
            {"vec_id": t.column("vec_id"), "l2": pa.array(l2, type=pa.float64())}
        )

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet").map_batches(
        norms, batch_format="pyarrow"
    )


@register(
    "ann_topk",
    """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qe, CAST(e.embedding AS DOUBLE[])) AS score
      FROM q CROSS JOIN embeddings e
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, neighbor_id
             ) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def ann_topk(sf_dir: str):
    """Brute-force exact top-k over the embedding column (broadcast
    query matrix, per-batch matmul partials)."""
    from .stages.similarity import _stack, brute_force_topk

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    qmask = pc.less(emb.column("vec_id"), pa.scalar(5))
    q = emb.filter(qmask)
    out = brute_force_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        k=10,
        metric="dot",
    )
    return out[["query_id", "neighbor_id", "rank"]]


@register(
    "embedding_near_dups",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
    """,
)
def embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs (exact blocked all-pairs against
    the broadcast matrix; dot/(|a||b|) tree mirrored by the oracle)."""
    from .stages.similarity import cosine_near_dups

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    out = cosine_near_dups(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"), emb, threshold=0.35
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "cosine": pd.Series(dtype=float)})
    out["cosine"] = _round(out["cosine"].to_numpy(), 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _lsh_prefix_sql(n_cols: int, salt: int, dim: int = 64) -> str:
    """Shared CTE chain of the LSH oracle mirrors: ±1 Rademacher plane
    signs from splitmix64 (`stages/similarity.lsh_plane_signs` baked
    as SQL), int64 fixed-point quantization of the embedding column
    (FLOOR(x·2^24) — exact in both float64 and DuckDB DOUBLE), and the
    per-(vector, plane-column) integer dot products.  All arithmetic
    is integer-exact, so the bucket keys are bit-identical to the
    engine's.  `dim` is the testdata's fixed embedding width (64 at
    every sf tier); the engine reads it dynamically."""
    from .stages.sketchq import splitmix64_sql

    h = splitmix64_sql(f"({salt} + c*256 + d)")
    return f"""planes AS (
      SELECT c, d, CASE WHEN ({h}) % 2 = 1 THEN 1 ELSE -1 END AS s
      FROM range(0, {n_cols}) rc(c), range(0, {dim}) rd0(d)
    ),
    qe AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    dots AS (
      SELECT qe.vec_id, p.c, SUM(p.s * qe.q) AS dot
      FROM qe JOIN planes p ON p.d = qe.d
      GROUP BY qe.vec_id, p.c
    )"""


def _embedding_near_dups_lsh_sql() -> str:
    """Bit-exact mirror of `cosine_near_dups_lsh` at the entry's
    parameters (8 tables × 4 planes, threshold 0.35): per-table bucket
    keys from the shared LSH prefix, candidate pairs sharing any
    table's bucket, exact float cosine verification, 4-decimal
    rounding.  The engine's >max_bucket chaining never fires at the
    oracle scales (bucket size ≤ corpus size 500/2000 ≤ 2000)."""
    from .stages.similarity import LSH_SALT_PAIRS

    return f"""
    WITH {_lsh_prefix_sql(32, LSH_SALT_PAIRS)},
    keys AS (
      SELECT vec_id, c // 4 AS t,
             SUM(CASE WHEN dot > 0 THEN 1 << (c % 4) ELSE 0 END) AS key
      FROM dots GROUP BY vec_id, t
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keys a JOIN keys b
        ON a.t = b.t AND a.key = b.key AND a.vec_id < b.vec_id
    ),
    nn AS (
      SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    )
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
    FROM cand c
    JOIN nn a ON a.vec_id = c.id_a
    JOIN nn b ON b.vec_id = c.id_b
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
    ORDER BY id_a, id_b
    """


@register("embedding_near_dups_lsh", _embedding_near_dups_lsh_sql())
def embedding_near_dups_lsh(sf_dir: str):
    """LSH-bucketed near-dup pairs (the no-all-pairs scale path of
    `embedding_near_dups`).  Buckets come from splitmix64-derived ±1
    planes over fixed-point vectors, which is what lets this
    APPROXIMATE entry carry a bit-exact SQL oracle."""
    from .stages.similarity import cosine_near_dups_lsh

    rd = _rd()
    out = cosine_near_dups_lsh(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"), threshold=0.35
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "cosine": pd.Series(dtype=float)})
    out["cosine"] = _round(out["cosine"].to_numpy(), 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _ann_topk_lsh_sql() -> str:
    """Bit-exact mirror of `lsh_bucketed_topk` at the entry's
    parameters (one table of 8 planes, k=10): bucket keys from the
    shared LSH prefix, candidates = corpus vectors whose key equals a
    query's key, float dot-product scoring, rank by (score DESC,
    neighbor_id) — the same tree the exact `ann_topk` oracle pins."""
    from .stages.similarity import LSH_SALT_TOPK

    return f"""
    WITH {_lsh_prefix_sql(8, LSH_SALT_TOPK)},
    keys AS (
      SELECT vec_id, SUM(CASE WHEN dot > 0 THEN 1 << c ELSE 0 END) AS key
      FROM dots GROUP BY vec_id
    ),
    q AS (
      SELECT k.vec_id AS query_id, k.key,
             CAST(e.embedding AS DOUBLE[]) AS qv
      FROM keys k JOIN embeddings e ON e.vec_id = k.vec_id
      WHERE k.vec_id < 5
    ),
    scored AS (
      SELECT q.query_id, k.vec_id AS neighbor_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])) AS score
      FROM q
      JOIN keys k ON k.key = q.key
      JOIN embeddings e ON e.vec_id = k.vec_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, neighbor_id
             ) AS rank
      FROM scored
    ) WHERE rank <= 10
    """


@register("ann_topk_lsh", _ann_topk_lsh_sql())
def ann_topk_lsh(sf_dir: str):
    """LSH-bucketed approximate top-k (candidate reduction next to the
    exact `ann_topk`).  Oracle-checked bit-exactly: the splitmix64
    ±1-plane buckets are reproduced in SQL, so the candidate set —
    normally the un-checkable part of an ANN — is pinned too."""
    from .stages.similarity import _stack, lsh_bucketed_topk

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    out = lsh_bucketed_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        k=10,
    )
    return out[["query_id", "neighbor_id", "rank"]]


@register("ann_topk_ivf")  # rows-only (approximate; recall tested in pytest)
def ann_topk_ivf(sf_dir: str):
    """IVF-partitioned ANN (coarse k-means quantizer, nprobe nearest
    inverted lists scanned per query) — the partition-pruning scale
    path next to the LSH variant."""
    from .stages.similarity import _stack, ivf_topk

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    return ivf_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        k=10, nlist=16, nprobe=4,
        train_vecs=_stack(emb, "embedding"),
    )


@register("ann_topk_ivf_persisted")  # rows-only (equality-to-streaming pytest)
def ann_topk_ivf_persisted(sf_dir: str):
    """IVF ANN over a PERSISTED index: the corpus parquet is laid out
    partitioned by inverted-list id, so the query reads ONLY its
    nprobe lists' files (read-level pruning, the literal 100-TB form).
    Same quantizer/params as `ann_topk_ivf` — a pytest asserts the two
    variants return identical rows.  Index cached per sf tier with an
    atomic rename publish."""
    import hashlib
    import shutil

    from .stages.similarity import _stack, ivf_build_index, ivf_topk_persisted

    rd = _rd()
    path = f"{sf_dir}/embeddings.parquet"
    key = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:v1".encode()
    ).hexdigest()[:10]
    index_dir = f"/tmp/olu_ray_ivf_idx_{key}"
    emb = td.read(sf_dir, "embeddings")
    if not os.path.isdir(index_dir):
        tmp = index_dir + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        ivf_build_index(
            rd.read_parquet(path), tmp, nlist=16,
            train_vecs=_stack(emb, "embedding"),
        )
        try:
            os.rename(tmp, index_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    return ivf_topk_persisted(
        index_dir,
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        k=10, nprobe=4,
    )


def _ann_topk_ivf_sampled_sql() -> str:
    """Bit-exact mirror of `ivf_topk_sampled` at the entry's parameters
    (nlist=16, nprobe=4, k=10, queries vec_id < 5): centroids are the
    16 vectors with smallest splitmix64(vec_id) (UBIGINT order),
    assignment/probing use the integer score 2·(q(x)·q(c)) − q(c)·q(c)
    over floor(x·2^24) fixed-point values (exact in both engines, ties
    to the smaller centroid id), and the in-list scoring is the float
    dot-product tree the exact `ann_topk` oracle pins."""
    from .stages.sketchq import splitmix64_sql

    return f"""
    WITH cent AS (
      SELECT vec_id AS cid FROM (
        SELECT vec_id, {splitmix64_sql('vec_id')} AS hv FROM embeddings
        ORDER BY hv LIMIT 16)
    ),
    qe AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    cq AS (SELECT c.cid, qe.d, qe.q FROM cent c JOIN qe ON qe.vec_id = c.cid),
    cnorm AS (SELECT cid, SUM(q * q) AS cc FROM cq GROUP BY cid),
    scores AS (
      SELECT v.vec_id, c.cid, 2 * SUM(v.q * c.q) - MAX(n.cc) AS s
      FROM qe v JOIN cq c ON c.d = v.d JOIN cnorm n ON n.cid = c.cid
      GROUP BY v.vec_id, c.cid
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scores) WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scores WHERE vec_id < 5) WHERE rn <= 4
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN assign a ON a.cid = p.cid
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_dot_product(CAST(eq.embedding AS DOUBLE[]),
                              CAST(en.embedding AS DOUBLE[])) AS score
      FROM cand c
      JOIN embeddings eq ON eq.vec_id = c.query_id
      JOIN embeddings en ON en.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """


@register("ann_topk_ivf_sampled", _ann_topk_ivf_sampled_sql())
def ann_topk_ivf_sampled(sf_dir: str):
    """IVF ANN over the splitmix64-SAMPLED coarse quantizer — the
    partition-pruning scale path made fully ORACLE-CHECKABLE: centroid
    choice (mergeable bottom-k by hash, the KMV discipline), integer
    fixed-point assignment, and probe-list selection are all
    bit-reproducible in SQL, so the candidate set — normally the
    un-checkable part of an ANN — is pinned per round, next to the
    k-means `ann_topk_ivf` whose recall the pytest suite governs."""
    from .stages.similarity import _stack, ivf_topk_sampled

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    out = ivf_topk_sampled(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        emb.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(emb, "embedding"),
        k=10, nlist=16, nprobe=4,
    )
    return out[["query_id", "neighbor_id", "rank"]]


@register(
    "events_hourly",
    """
    SELECT event_type,
           CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS hour_bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type, hour_bucket
    """,
)
def events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the event stream (partial agg in
    map_batches + small groupby — the streaming-shaped op)."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()

    def prep(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = us // 3_600_000_000  # exact integer hour bucket
        return t.append_column("hour_bucket", pa.array(bucket))

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = _round(out["sum_value"].to_numpy(), 2)
    return out


@register(
    "events_props_extract",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_props_extract(sf_dir: str):
    """JSON field extraction over a semi-structured string column (the
    webtext staple): the flat `{"k": N}` payload is pulled with ONE
    RE2 `pc.extract_regex` C kernel per batch (no per-row json.loads —
    a general nested-path extractor would be the same stage with an
    actor-held parser), then a per-type aggregate.  Rows without the
    key yield nulls, skipped by SUM/MAX in both engines."""
    rd = _rd()
    from ray.data.aggregate import Count, Max, Sum

    pat = r'"k"\s*:\s*(?P<k>-?\d+)'

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), pat)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"),
                   Sum("k", alias_name="sum_k"),
                   Max("k", alias_name="max_k"))
        .to_pandas()
    )
    for c in ("n", "sum_k", "max_k"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type", kind="stable").reset_index(
        drop=True)[["event_type", "n", "sum_k", "max_k"]]


@register(
    "doc_length_quantiles",
    """
    SELECT lang,
           ROUND(quantile_cont(LENGTH(text), 0.5), 4) AS p50,
           ROUND(quantile_cont(LENGTH(text), 0.9), 4) AS p90,
           ROUND(quantile_cont(LENGTH(text), 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM documents GROUP BY lang
    """,
)
def doc_length_quantiles(sf_dir: str):
    """EXACT distributed quantiles via histogram partials (the data-
    profiling op): doc lengths are bounded ints, so per-batch
    (lang, n_chars) counts -> one small groupby-sum shuffle -> exact
    interpolated quantiles from the cumulative histogram.  No sort, no
    full-column materialization — the exchange is one row per DISTINCT
    (lang, length) pair.  The interpolation mirrors quantile_cont:
    h = (n-1)*q; v = x[floor(h)] + (h - floor(h)) * (x[floor(h)+1] -
    x[floor(h)]) on the sorted values."""
    from ray.data.aggregate import Count

    rd = _rd()

    def lengths(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "lang": t.column("lang"),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    hist = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )

    def q_from_hist(x: np.ndarray, c: np.ndarray, q: float) -> float:
        # cumulative-histogram form of quantile_cont's interpolation
        n = int(c.sum())
        h = (n - 1) * q
        lo = int(np.floor(h))
        cum = np.cumsum(c)
        xl = x[np.searchsorted(cum, lo + 1)]
        xu = x[np.searchsorted(cum, lo + 2)] if lo + 1 < n else xl
        return float(xl) + (h - np.floor(h)) * (float(xu) - float(xl))

    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        x = g["n_chars"].to_numpy()
        c = g["cnt"].to_numpy()
        rows.append(
            {
                "lang": lang,
                "p50": _round(np.array([q_from_hist(x, c, 0.5)]), 4)[0],
                "p90": _round(np.array([q_from_hist(x, c, 0.9)]), 4)[0],
                "p99": _round(np.array([q_from_hist(x, c, 0.99)]), 4)[0],
                "n": int(c.sum()),
            }
        )
    return pd.DataFrame(rows)


@register(
    "lang_top_docs",
    """
    SELECT lang, doc_id, n_chars, rnk FROM (
      SELECT lang, doc_id, LENGTH(text) AS n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY LENGTH(text) DESC, doc_id
             ) AS rnk
      FROM documents
    ) WHERE rnk <= 5
    """,
)
def lang_top_docs(sf_dir: str):
    """GROUPED top-k (per-language 5 longest docs): project to
    (lang, doc_id, n_chars) in map_batches, then per-group sort+head —
    the per-key-top-k shape that global sort+limit cannot express.
    Deterministic tie-break (length DESC, doc_id ASC) mirrored by the
    ROW_NUMBER ordering."""
    rd = _rd()

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nc = g.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.lexsort((ids, -nc))[:5]
        out = g.take(pa.array(o))
        return out.append_column(
            "rnk", pa.array(np.arange(1, len(o) + 1, dtype=np.int64))
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "doc_id", "text"]
        )
        .map_batches(proj, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
    )


@register(
    "events_sliding",
    """
    SELECT event_id,
           COUNT(*) OVER w AS n_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def events_sliding(sf_dir: str):
    """SLIDING windowed aggregate (the streaming-window op beyond the
    tumbling `events_hourly`): per event, count and sum of same-type
    events within the trailing hour.

    Scale shape: partitioning by event_type alone makes one hot type
    one giant ordered group, so the shuffle key is (event_type, TIME
    BAND) with a one-window HALO — rows in the last hour of band b are
    replicated into band b+1 as context-only rows (band length 6x the
    window caps replication at ~17%; band >= window guarantees one-hop
    halo suffices).  Each group runs ONE sort + two vectorized
    ``searchsorted`` passes; halo rows feed the prefix sums but emit
    nothing, so the output is row-identical to the single-group
    version at any band size.  Exact int64 cents make the prefix-sum
    differences exact at any partition size (a float prefix difference
    carries cancellation error that grows with the running total);
    RANGE semantics (ties on ts are peers, included on both ends) are
    matched by side='left' on ts-1h and side='right' on ts."""
    rd = _rd()
    W = 3_600_000_000  # 1 h in µs
    BAND = 6 * W

    def tag(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        own = ts // BAND
        halo_band = (ts + W) // BAND
        base = t.append_column("band", pa.array(own)).append_column(
            "halo", pa.array(np.zeros(t.num_rows, dtype=bool))
        )
        m = halo_band != own
        if m.any():
            h = t.filter(pa.array(m)).append_column(
                "band", pa.array(halo_band[m])
            ).append_column("halo", pa.array(np.ones(int(m.sum()), dtype=bool)))
            return pa.concat_tables([base, h])
        return base

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        lo = np.searchsorted(t, t - W, side="left")
        hi = np.searchsorted(t, t, side="right")
        cs = np.concatenate([[0], np.cumsum(cents)])
        emit = ~g["halo"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[emit],
                "n_1h": (hi - lo).astype(np.int64)[emit],
                "sum_1h": ((cs[hi] - cs[lo]) / 100.0)[emit],
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "band"])
        .map_groups(win, batch_format="pandas")
    )


@register(
    "user_sessions",
    """
    SELECT user_id, CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    GROUP BY user_id
    """,
)
def user_sessions(sf_dir: str):
    """Sessionization (30-min gap) — the stream-log windowing pattern.
    Shuffles on a coarse fold of user_id (per-user map_groups pays a
    Python call per user); the in-group kernel handles EVERY user in
    the fold with one lexsort + boundary masks — a session starts at
    each user boundary or >30-min gap, and per-user session counts
    fall out of one bincount."""
    rd = _rd()
    from .functions import hashing

    def tag(t: pa.Table) -> pa.Table:
        fold = hashing.fold_int64(
            t.column("user_id").to_numpy(zero_copy_only=False), 64
        )
        return t.append_column("fold", pa.array(fold))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        # normalize the unit BEFORE the int view: block conversion may
        # deliver ns under other pandas/pyarrow configs, which would
        # turn the 30-min gap into 1.8 s silently
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > 1800 * 1_000_000
        users = u[new_user]
        # sessions per user: count session starts between user boundaries
        starts = np.flatnonzero(new_user)
        n = np.add.reduceat(new_sess.astype(np.int64), starts)
        return pd.DataFrame({"user_id": users, "n_sessions": n})

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(sessions, batch_format="pandas")
    )


def _events_by_type(sf_dir: str, etype: str, columns: list[str]):
    """Pruned, pre-filtered event stream (one type) as a Dataset."""
    rd = _rd()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("event_type"), etype)).drop(
            ["event_type"]
        )

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns + ["event_type"]
    ).map_batches(keep, batch_format="pyarrow")


@register(
    "events_asof",
    """
    SELECT p.event_id AS purchase_id,
           v.event_id AS prior_view_id,
           v.value    AS prior_view_value,
           date_diff('microseconds', v.ts, p.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof(sf_dir: str):
    """AS-OF join (each purchase -> the same user's most recent
    prior-or-simultaneous view): tagged-union co-shuffle on a
    user-hash bucket, C merge_asof kernel per bucket — no broadcast
    side, no per-user group explosion (stages/temporal.py)."""
    from .stages import temporal

    return temporal.asof_join(
        _events_by_type(sf_dir, "purchase", ["event_id", "ts", "user_id"]),
        _events_by_type(sf_dir, "view", ["event_id", "ts", "user_id", "value"]),
    )


@register(
    "events_range_join",
    """
    SELECT e.event_id AS incident_id,
           COUNT(*) AS n_probes,
           ROUND(SUM(c.value), 2) AS probe_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.event_id
    """,
)
def events_range_join(sf_dir: str):
    """Pure RANGE join (no equi key): clicks landing inside the
    10-minute window opened by each error event, counted + value-summed
    per window.  Time-banded at the window length so each window
    replicates to <=2 bands and band partials stay disjoint — the
    shuffle is event-sized, never the |windows| x |probes| cross
    product (stages/temporal.py)."""
    from .stages import temporal

    agg = temporal.banded_range_join(
        _events_by_type(sf_dir, "error", ["event_id", "ts"]),
        _events_by_type(sf_dir, "click", ["event_id", "ts", "value"]),
        window_us=600_000_000,
    )

    def fin(t: pa.Table) -> pa.Table:
        pv = t.column("cents").to_numpy(zero_copy_only=False) / 100.0
        return t.drop(["cents"]).append_column(
            "probe_value", pa.array(pv, type=pa.float64())
        )

    return agg.map_batches(fin, batch_format="pyarrow")


@register("image_features")  # rows-only (stubbed decode; plumbing real)
def image_features(sf_dir: str):
    """Media derived from the sf_dir documents corpus (payload = text
    bytes), featurized through the real actor-pool stage — the battery
    entry exercises the test tables, not a synthesized side table."""
    from .stages import multimodal

    rd = _rd()
    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(multimodal.media_from_documents, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "image")),
            batch_format="pyarrow",
        )
    )
    feats = multimodal.featurize_images(ds)

    def summarize(t: pa.Table) -> pa.Table:
        from .stages.similarity import _stack

        X = _stack(t.select(["media_id", "feat"]).rename_columns(
            ["vec_id", "embedding"]), "embedding")
        return pa.Table.from_pydict(
            {
                "media_id": t.column("media_id"),
                "feat_dim": pa.array([X.shape[1]] * t.num_rows, type=pa.int32()),
                "feat_l2": pa.array(
                    _round(np.sqrt((X * X).sum(axis=1)), 4), type=pa.float64()
                ),
                "decoder_version": t.column("decoder_version"),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


@register("audio_features")  # rows-only (stubbed decode; plumbing real)
def audio_features(sf_dir: str):
    """Audio featurization over corpus-derived media (windowed
    pseudo-MFCCs through the actor-pool stage)."""
    from .stages import multimodal

    rd = _rd()
    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(multimodal.media_from_documents, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "audio")),
            batch_format="pyarrow",
        )
    )
    feats = multimodal.featurize_audio(ds)

    def summarize(t: pa.Table) -> pa.Table:
        flat = [np.asarray(v, dtype=np.float64) for v in t.column("mfcc").to_pylist()]
        return pa.Table.from_pydict(
            {
                "media_id": t.column("media_id"),
                "n_windows": t.column("n_windows"),
                "feat_l2": pa.array(
                    _round(np.array([float(np.sqrt((v * v).sum())) for v in flat]), 4),
                    type=pa.float64(),
                ),
                "decoder_version": t.column("decoder_version"),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


@register(
    "video_frames",
    """
    WITH media AS (
      SELECT doc_id AS media_id, 1000 + (doc_id % 10) * 500 AS duration_ms, text
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, CAST(t AS INTEGER) AS frame_ms,
           substring(text, 1, 16) AS frame_stub
    FROM media,
      LATERAL (SELECT unnest(generate_series(0, duration_ms - 1, 1000)) AS t) g
    """,
)
def video_frames(sf_dir: str):
    """Video frame sampling (flat_map expansion: one row per sampled
    frame) through the actor-pool stage.  Decode is a marked stub
    (payload byte prefix), but the deterministic media derivation makes
    even the stub ORACLE-checkable: the SQL mirrors the duration
    formula, the 1000 ms sampling grid, and the 16-byte frame payload.
    The stage emits BINARY frames (the realistic shape); the battery
    entry casts the stub to utf-8 so both sides hash as strings — a
    DuckDB BLOB round-trips to pandas as unhashable bytearray, and the
    documents corpus is ASCII so char prefix == byte prefix."""
    from .stages import multimodal

    def stub_to_str(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("frame_stub")
        return t.set_column(i, "frame_stub", t.column("frame_stub").cast(pa.string()))

    rd = _rd()
    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(multimodal.media_from_documents, batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), "video")),
            batch_format="pyarrow",
        )
        .select_columns(["media_id", "duration_ms", "payload"])
        .map_batches(
            multimodal.FrameSampler,
            batch_format="pyarrow",
            concurrency=(1, 4),
            batch_size=64,
        )
        .map_batches(stub_to_str, batch_format="pyarrow")
    )


@register(
    "media_container_stats",
    """
    SELECT kind, container, COUNT(*) AS n
    FROM (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CASE
               WHEN doc_id % 3 = 0 THEN
                 CASE (doc_id // 3) % 4 WHEN 0 THEN 'png'
                                        WHEN 1 THEN 'jpeg-baseline'
                                        WHEN 2 THEN 'jpeg-progressive'
                                        ELSE 'gif' END
               WHEN doc_id % 3 = 1 THEN
                 CASE (doc_id // 3) % 3 WHEN 0 THEN 'wav-pcm'
                                        WHEN 1 THEN 'wav-ulaw'
                                        ELSE 'wav-adpcm' END
               ELSE 'text'
             END AS container
      FROM documents
    )
    GROUP BY kind, container
    """,
)
def media_container_stats(sf_dir: str):
    """Container census over the corpus-derived media table — the
    format-distribution report a crawl-ingest pipeline runs before
    sizing its decode fleet.  The Ray side SNIFFS every payload's
    actual bytes (magic numbers; SOF marker scan splits baseline vs
    progressive JPEG; WAV fmt tag splits PCM / G.711 mu-law / IMA
    ADPCM) — the SQL mirror derives the expected container from the
    deterministic doc-id rotation, so a match proves every generated
    payload PARSES as the container it claims (an encoder bug or a
    sniffer bug breaks the hash).  Map-side combined counts -> tiny
    groupby-sum; payload bytes never shuffle."""
    import struct as _struct

    from ray.data.aggregate import Sum

    from .stages import multimodal

    def census(t: pa.Table) -> pa.Table:
        kinds, containers = [], []
        for kind, payload in zip(
            t.column("kind").to_pylist(), t.column("payload").to_pylist()
        ):
            p = payload or b""
            if p[:8] == b"\x89PNG\r\n\x1a\n":
                c = "png"
            elif p[:6] in (b"GIF87a", b"GIF89a"):
                c = "gif"
            elif p[:2] == b"\xff\xd8":
                c = ("jpeg-progressive" if b"\xff\xc2" in p
                     else "jpeg-baseline")
            elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                i = p.find(b"fmt ")
                tag = _struct.unpack_from("<H", p, i + 8)[0] if i >= 0 else 0
                c = {1: "wav-pcm", 7: "wav-ulaw", 0x11: "wav-adpcm"}.get(
                    tag, "wav-other")
            else:
                c = "text"
            kinds.append(kind)
            containers.append(c)
        part = pd.DataFrame({"kind": kinds, "container": containers})
        agg = part.groupby(["kind", "container"], as_index=False).size()
        return pa.Table.from_pydict({
            "kind": agg["kind"].tolist(),
            "container": agg["container"].tolist(),
            "n": pa.array(agg["size"].to_numpy(np.int64)),
        })

    rd = _rd()
    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(multimodal.media_from_documents, batch_format="pyarrow")
        .map_batches(census, batch_format="pyarrow")
        .groupby(["kind", "container"])
        .aggregate(Sum("n", alias_name="n"))
    )


_SQL_KNN_WAY = (
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_STATE_NODES.strip()
    + ",\n" + td.SQL_WAY_EDGES.strip()
    + """
    , ordered AS (
      SELECT way_id, pos, node_id,
             LEAD(node_id) OVER (PARTITION BY way_id ORDER BY pos, node_id)
               AS next_id
      FROM way_edges
    ), segs AS (
      SELECT o.way_id, o.pos,
             a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2
      FROM ordered o
      JOIN state_nodes a ON o.node_id = a.id
      JOIN state_nodes b ON o.next_id = b.id
      WHERE o.next_id IS NOT NULL
    ), dists AS (
      SELECT p.url, s.way_id, s.pos,
        (p.lon - (s.x1 + LEAST(GREATEST(
            CASE WHEN (s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1) = 0
                 THEN 0
                 ELSE ((p.lon-s.x1)*(s.x2-s.x1) + (p.lat-s.y1)*(s.y2-s.y1))
                      / ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))
            END, 0), 1) * (s.x2-s.x1)))
        * (p.lon - (s.x1 + LEAST(GREATEST(
            CASE WHEN (s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1) = 0
                 THEN 0
                 ELSE ((p.lon-s.x1)*(s.x2-s.x1) + (p.lat-s.y1)*(s.y2-s.y1))
                      / ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))
            END, 0), 1) * (s.x2-s.x1)))
        +
        (p.lat - (s.y1 + LEAST(GREATEST(
            CASE WHEN (s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1) = 0
                 THEN 0
                 ELSE ((p.lon-s.x1)*(s.x2-s.x1) + (p.lat-s.y1)*(s.y2-s.y1))
                      / ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))
            END, 0), 1) * (s.y2-s.y1)))
        * (p.lat - (s.y1 + LEAST(GREATEST(
            CASE WHEN (s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1) = 0
                 THEN 0
                 ELSE ((p.lon-s.x1)*(s.x2-s.x1) + (p.lat-s.y1)*(s.y2-s.y1))
                      / ((s.x2-s.x1)*(s.x2-s.x1) + (s.y2-s.y1)*(s.y2-s.y1))
            END, 0), 1) * (s.y2-s.y1)))
        AS d
      FROM pages p CROSS JOIN segs s
    )
    SELECT url, knn_way_id, knn_way_dist FROM (
      SELECT url, way_id AS knn_way_id, d AS knn_way_dist,
             ROW_NUMBER() OVER (
               PARTITION BY url ORDER BY d, way_id, pos
             ) AS rn
      FROM dists
    ) WHERE rn = 1
    """
)


_SEGMENT_INDEX_CACHE: dict[tuple, Any] = {}


def _segment_index(sf_dir: str):
    """GridSegmentIndex over the adapter way-segment layer, cached per
    sf tier (the build is the dominant cost of knn_way; the battery and
    repeated driver calls reuse it).  The cache key carries the source
    parquet mtimes, so regenerated testdata invalidates it."""
    root = os.path.abspath(sf_dir)
    key = (
        root,
        os.path.getmtime(os.path.join(root, "lineitem.parquet")),
        os.path.getmtime(os.path.join(root, "part.parquet")),
    )
    if key in _SEGMENT_INDEX_CACHE:
        return _SEGMENT_INDEX_CACHE[key]
    from .stages import spatial

    edges = td.way_edges(sf_dir)
    nodes = td.nodes_table(sf_dir)
    e = edges.to_pandas().merge(
        nodes.to_pandas().rename(columns={"id": "node_id"}), on="node_id"
    )
    e = e.sort_values(["way_id", "pos", "node_id"], kind="stable")
    segs = spatial.segments_from_edges(
        {k: e[k].to_numpy() for k in ("way_id", "pos", "lon", "lat")}
    )
    sidx = spatial.GridSegmentIndex(
        segs["way_id"], segs["pos"], segs["x1"], segs["y1"], segs["x2"], segs["y2"]
    )
    _SEGMENT_INDEX_CACHE[key] = sidx
    return sidx


@register("knn_way", _SQL_KNN_WAY)
def knn_way(sf_dir: str):
    """kNN to nearest WAY (segment distance, exact grid ring search) —
    north_rule: 'kNN to nearest way/node'."""
    sidx = _segment_index(sf_dir)

    def nw(t: pa.Table) -> pa.Table:
        cells = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w, d = sidx.nearest_way(
            cells,
            t.column("lon").to_numpy(zero_copy_only=False),
            t.column("lat").to_numpy(zero_copy_only=False),
        )
        return pa.Table.from_pydict(
            {"url": t.column("url"), "knn_way_id": pa.array(w),
             "knn_way_dist": pa.array(d)}
        )

    return _pages_geo_ds(sf_dir).map_batches(nw, batch_format="pyarrow")


@register(
    "tile_raster",
    "WITH " + td.SQL_PAGES.strip()
    + """
    SELECT CAST(FLOOR((lon + 180.0) / 0.625) AS BIGINT) AS gx,
           CAST(FLOOR((lat + 90.0) / 0.625) AS BIGINT) AS gy,
           COUNT(*) AS n_pages
    FROM pages
    GROUP BY gx, gy
    """,
)
def tile_raster(sf_dir: str):
    """Vector->raster rollup (north_rule raster<->vector): page points
    rasterized onto a 0.625-degree grid (16x16 sub-cells per tile) —
    partial counts per batch, tiny final groupby."""
    from ray.data.aggregate import Count

    def rast(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        gx = np.floor((lon + 180.0) / 0.625).astype(np.int64)
        gy = np.floor((lat + 90.0) / 0.625).astype(np.int64)
        return pa.Table.from_pydict({"gx": gx, "gy": gy})

    return (
        _pages_geo_ds(sf_dir)
        .map_batches(rast, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .aggregate(Count(alias_name="n_pages"))
    )


@register(
    "raster_to_vector",
    "WITH " + td.SQL_PAGES.strip()
    + """
    , raster AS (
      SELECT CAST(FLOOR((lon + 180.0) / 0.625) AS BIGINT) AS gx,
             CAST(FLOOR((lat + 90.0) / 0.625) AS BIGINT) AS gy,
             COUNT(*) AS n_pages
      FROM pages GROUP BY gx, gy
    )
    SELECT gx, gy,
           -180.0 + gx * 0.625 AS min_lon,
           -90.0 + gy * 0.625 AS min_lat,
           -180.0 + (gx + 1) * 0.625 AS max_lon,
           -90.0 + (gy + 1) * 0.625 AS max_lat,
           n_pages
    FROM raster WHERE n_pages >= 5
    """,
)
def raster_to_vector(sf_dir: str):
    """Raster->vector: occupied raster cells (count >= threshold) back
    to bbox polygons — the inverse rollup direction."""
    ds = tile_raster(sf_dir)

    def vec(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_pages"), pa.scalar(5)))
        gx = t.column("gx").to_numpy(zero_copy_only=False).astype(np.float64)
        gy = t.column("gy").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "gx": t.column("gx"), "gy": t.column("gy"),
                "min_lon": -180.0 + gx * 0.625,
                "min_lat": -90.0 + gy * 0.625,
                "max_lon": -180.0 + (gx + 1) * 0.625,
                "max_lat": -90.0 + (gy + 1) * 0.625,
                "n_pages": t.column("n_pages"),
            }
        )

    return ds.map_batches(vec, batch_format="pyarrow")


@register(
    "events_latest",
    """
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def events_latest(sf_dir: str):
    """Latest event per user — the argmax-combine shape (CDX-style
    latest-capture-per-url at Common-Crawl scale): each batch reduces
    to AT MOST one row per user before the shuffle (one lexsort + one
    boundary mask, no Python loop), so the exchange carries
    <= users x blocks rows, never the event stream.  The per-group
    finalizer reruns the identical kernel, which is associative —
    max under the (ts, event_id) order."""
    rd = _rd()

    def argmax_partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("int64")
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -ts, u))  # user asc, then ts/eid desc
        su = u[order]
        first = np.ones(len(su), dtype=bool)
        first[1:] = su[1:] != su[:-1]
        return t.take(pa.array(order[first]))

    from .functions import hashing

    def tag(t: pa.Table) -> pa.Table:
        fold = hashing.fold_int64(
            t.column("user_id").to_numpy(zero_copy_only=False), 64
        )
        return t.append_column("fold", pa.array(fold))

    def finalize(t: pa.Table) -> pa.Table:
        return argmax_partial(t).drop_columns(["fold"])

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "event_type", "value"],
        )
        .map_batches(argmax_partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("fold")  # coarse fold: argmax_partial is multi-user
        .map_groups(finalize, batch_format="pyarrow")
    )


@register(
    "lang_distinct_words",
    """
    SELECT lang, CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
    FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY lang
    """,
)
def lang_distinct_words(sf_dir: str):
    """EXACT distributed COUNT(DISTINCT) — the two-level distinct
    shape: batches emit their LOCAL distinct (lang, word) pairs (one
    np/pandas dedup pass), the pair-keyed groupby collapses global
    duplicates, and a second (lang-sized) pass counts rows per lang
    with map-side combine.  The wide exchange carries distinct pairs
    only — bounded by |vocab| x langs, never per-token rows.  The
    approximate companion is ``lang_distinct_words_hll``."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        parent = pc.list_parent_indices(lists)
        pairs = pa.table({
            "lang": t.column("lang").combine_chunks().take(parent),
            "word": pc.list_flatten(lists),
        })
        # batch-local distinct (Arrow hash group-by, no object dtypes)
        return pairs.group_by(["lang", "word"]).aggregate([])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("lang", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "n_part": pc.cast(g.column("lang_count"), pa.int64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Count(alias_name="_dup"))
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_part", alias_name="n_distinct"))
    )


@register(
    "lang_distinct_words_hll",
    # bit-exact DuckDB mirror of the HLL register computation (VERDICT
    # r3 item 7): the engine's word hash is hash_strings_poly — an
    # FNV-prime polynomial over unicode code points mod 2^64 + a
    # splitmix64 finalizer — reproduced here with UHUGEINT mod-2^64
    # arithmetic; registers/ranks/union/estimate then mirror
    # functions/sketch.py exactly (P=10, m=1024, linear-counting
    # small-range correction).  tests/test_sketch.py still bounds the
    # error vs the exact operator.
    """
    WITH words AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    h0 AS (SELECT lang, CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(w)+1),
                           j -> CAST(unicode(substr(w, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT) AS v FROM words),
    s1 AS (SELECT lang, CAST((v::UHUGEINT + 11400714819323198485)
            % 18446744073709551616 AS UBIGINT) AS v FROM h0),
    s2 AS (SELECT lang, xor(v, v >> 30) AS v FROM s1),
    s3 AS (SELECT lang, CAST((v::UHUGEINT * 13787848793156543929)
            % 18446744073709551616 AS UBIGINT) AS v FROM s2),
    s4 AS (SELECT lang, xor(v, v >> 27) AS v FROM s3),
    s5 AS (SELECT lang, CAST((v::UHUGEINT * 10723151780598845931)
            % 18446744073709551616 AS UBIGINT) AS v FROM s4),
    h  AS (SELECT lang, xor(v, v >> 31) AS v FROM s5),
    regs AS (SELECT lang, v % 1024 AS reg,
                    CASE WHEN (v >> 10) = 0 THEN 55
                         ELSE GREATEST(54 - CAST(FLOOR(LOG2(
                              CAST(v >> 10 AS DOUBLE))) AS INT), 1)
                    END AS rank FROM h),
    merged AS (SELECT lang, reg, MAX(rank) AS mx
               FROM regs GROUP BY lang, reg),
    agg AS (SELECT lang, COUNT(*) AS nz, SUM(POWER(2.0, -mx)) AS s
            FROM merged GROUP BY lang),
    fin AS (SELECT lang, 1024 - nz AS zeros,
                   (0.7213 / (1.0 + 1.079 / 1024)) * 1024.0 * 1024.0
                     / (s + (1024 - nz)) AS e
            FROM agg)
    SELECT lang,
           CAST(FLOOR(CASE WHEN e <= 2560.0 AND zeros > 0
                           THEN 1024.0 * LN(1024.0 / zeros)
                           ELSE e END + 0.5) AS BIGINT) AS n_distinct_approx
    FROM fin ORDER BY lang
    """,
)
def lang_distinct_words_hll(sf_dir: str):
    """Approximate per-lang distinct-word count via HyperLogLog
    PARTIALS-AS-ROWS (functions/sketch.py): each batch emits at most
    m=1024 (lang, register, max_rank) rows, ``groupby().max()`` IS the
    sketch union, and the estimator runs over the tiny merged table.
    The scale path when the exact pair shuffle (|vocab| x langs rows)
    is too wide — exchange here is bounded by langs x 1024 x blocks
    regardless of corpus size."""
    rd = _rd()
    from ray.data.aggregate import Max

    from .functions import sketch

    def hll_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        parent = pc.list_parent_indices(lists)
        words = pc.list_flatten(lists).to_numpy(
            zero_copy_only=False
        ).astype(object)
        langs = t.column("lang").combine_chunks().take(parent).to_numpy(
            zero_copy_only=False
        ).astype(object)
        reg, rank = sketch.register_ranks(words)
        lang, reg2, mx = sketch.partial_max(reg, rank, langs)
        return pa.table({
            "lang": pa.array(lang, type=pa.string()),
            "reg": pa.array(np.asarray(reg2, dtype=np.int64)),
            "mx": pa.array(mx.astype(np.int64)),
        })

    merged = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(hll_partial, batch_format="pyarrow")
        .groupby(["lang", "reg"])
        .aggregate(Max("mx", alias_name="mx"))
        .to_pandas()  # langs x 1024 rows — driver-safe by construction
    )
    out = [
        # floor(e + 0.5): matches the SQL mirror exactly (Python round()
        # is banker's rounding; DuckDB ROUND is half-away — this form is
        # identical in both)
        (lang, int(np.floor(sketch.estimate(
            g["reg"].to_numpy(), g["mx"].to_numpy()) + 0.5)))
        for lang, g in merged.groupby("lang", sort=True)
    ]
    return pd.DataFrame(
        {"lang": [o[0] for o in out],
         "n_distinct_approx": np.array([o[1] for o in out], dtype="int64")}
    )


@register(
    "source_rollup",
    """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           ROUND(AVG(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)), 4)
             AS mean_tokens
    FROM documents GROUP BY source
    """,
)
def source_rollup(sf_dir: str):
    """Per-source corpus rollup (count / volume / mean tokens) — the
    grouped-mean-as-sum-pair shape: batches pre-aggregate all three
    measures per source (one pandas groupby over the batch), the
    exchange carries sources x blocks rows, and the mean finalizes
    from (sum, count) so it is exact under any partial ordering."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        chars = pc.utf8_length(t.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        toks = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.zeros(k, dtype=np.int64)
        np.add.at(cs, codes, chars)
        ts = np.zeros(k, dtype=np.int64)
        np.add.at(ts, codes, toks)
        return pa.table({
            "source": enc.dictionary,
            "chars_part": pa.array(cs),
            "toks_part": pa.array(ts),
            "n_part": pa.array(np.bincount(codes, minlength=k).astype(
                np.int64)),
        })

    def finish(t: pa.Table) -> pa.Table:
        toks = t.column("toks").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table({
            "source": t.column("source"),
            "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            "total_chars": pc.cast(t.column("total_chars"), pa.int64()),
            "mean_tokens": pa.array(_round(toks / n, 4)),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("chars_part", alias_name="total_chars"),
            Sum("toks_part", alias_name="toks"),
            Sum("n_part", alias_name="n_docs"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


@register(
    "cells_zorder",
    "WITH " + td.SQL_PAGES.strip()
    + """
    , cells AS (
      SELECT CAST(FLOOR((lon + 180.0) / 0.625) AS BIGINT) AS gx,
             CAST(FLOOR((lat + 90.0) / 0.625) AS BIGINT) AS gy,
             COUNT(*) AS n_pages
      FROM pages GROUP BY gx, gy
    ),
    s1 AS (SELECT gx, gy, n_pages,
                  (gx | (gx << 8)) & 16711935 AS sx,
                  (gy | (gy << 8)) & 16711935 AS sy FROM cells),
    s2 AS (SELECT gx, gy, n_pages,
                  (sx | (sx << 4)) & 252645135 AS sx,
                  (sy | (sy << 4)) & 252645135 AS sy FROM s1),
    s3 AS (SELECT gx, gy, n_pages,
                  (sx | (sx << 2)) & 858993459 AS sx,
                  (sy | (sy << 2)) & 858993459 AS sy FROM s2),
    s4 AS (SELECT gx, gy, n_pages,
                  (sx | (sx << 1)) & 1431655765 AS sx,
                  (sy | (sy << 1)) & 1431655765 AS sy FROM s3)
    SELECT gx, gy, sx | (sy << 1) AS morton, n_pages FROM s4
    """,
)
def cells_zorder(sf_dir: str):
    """Z-order (Morton) layout keys for the occupied-cell layer — the
    space-filling-curve clustering used to order tile-export
    partitions so geographic neighbors land in neighboring files
    (range reads over a region touch O(few) partitions).  Rollup is
    the tile_raster partial-count shape; the interleave is one
    vectorized bit-spread pass (functions/cells.py), mirrored bit-op
    for bit-op by the SQL oracle."""
    from .functions.cells import morton_interleave

    ds = tile_raster(sf_dir)

    def z(t: pa.Table) -> pa.Table:
        gx = t.column("gx").to_numpy(zero_copy_only=False)
        gy = t.column("gy").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"gx": t.column("gx"), "gy": t.column("gy"),
             "morton": morton_interleave(gx, gy),
             "n_pages": t.column("n_pages")}
        )

    return ds.map_batches(z, batch_format="pyarrow").sort("morton")


@register(
    "doc_sample_weighted",
    """
    SELECT doc_id, lang, n_chars, rnk FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (ORDER BY
               ROUND(LN((((doc_id * 2654435761) % 4294967296) + 0.5)
                        / 4294967296.0)
                     / GREATEST(n_chars, 1), 12) DESC,
               doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 50
    """,
)
def doc_sample_weighted(sf_dir: str):
    """Distributed WEIGHTED sampling without replacement
    (Efraimidis–Spirakis exponential keys: top-k by ln(u)/w, here
    w = n_chars, so long documents are proportionally more likely):
    each batch keeps only its local top-k (one argpartition), the
    driver merges k x blocks partial rows — no global sort, no
    full-corpus exchange.  The uniform u is a DETERMINISTIC hash of
    doc_id (Knuth multiplicative, expressible identically in SQL), and
    keys are rounded BEFORE ordering on both sides with doc_id
    tie-break, per the engine's float-mirroring rules."""
    rd = _rd()
    K = 50

    def partial(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(did) == 0:  # empty fragment: argpartition(kth=-1) raises
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], type=pa.int64()),
                 "lang": pa.array([], type=pa.string()),
                 "n_chars": pa.array([], type=pa.int64()),
                 "key": pa.array([], type=pa.float64())}
            )
        w = np.maximum(
            t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64), 1
        )
        u = (((did * 2654435761) % 4294967296) + 0.5) / 4294967296.0
        key = _round(np.log(u) / w, 12)
        k = min(K, len(did))
        sel = np.argpartition(-key, kth=k - 1)[:k]
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id").take(pa.array(sel)),
             "lang": t.column("lang").take(pa.array(sel)),
             "n_chars": t.column("n_chars").take(pa.array(sel)),
             "key": pa.array(key[sel])}
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # k x blocks rows — driver-safe by construction
    )
    parts = parts.sort_values(
        ["key", "doc_id"], ascending=[False, True], kind="stable"
    ).head(K).reset_index(drop=True)
    parts["rnk"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts[["doc_id", "lang", "n_chars", "rnk"]]


@register(
    "doc_lm_score",
    """
    WITH w AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    cnt AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM cnt)
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(LN(cnt.c / tot.t)), 4) AS lm_score
    FROM w JOIN cnt USING (word), tot
    GROUP BY doc_id
    """,
)
def doc_lm_score(sf_dir: str):
    """Unigram-LM quality score per document (the CCNet-style corpus-LM
    filter proxy): mean token log-probability under the corpus's own
    unigram distribution.  Two-pass broadcast pattern (same shape as
    tfidf_top_term): pass 1 is the map-side-combined wordcount (the
    shuffle carries ~|vocab| x blocks rows, never per-token rows) whose
    vocabulary-sized result broadcasts via ray.put; pass 2 streams the
    corpus once, scoring every doc's tokens with one vectorized lookup
    + reduceat mean — scores rounded to 4 decimals on both sides so
    summation-order ulp noise cannot flip the value hash."""
    import ray

    rd = _rd()

    vocab = word_counts(sf_dir).to_pandas()
    total = float(vocab["n"].sum())
    logp = np.log(vocab["n"].to_numpy(dtype=np.float64) / total)
    vocab_words = pa.array(vocab["word"].to_numpy(dtype=object),
                           type=pa.string())
    ref = ray.put((vocab_words, logp))

    def score(t: pa.Table) -> pa.Table:
        vw, lp = ray.get(ref)
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        flat = pc.list_flatten(lists)
        # Arrow C hash lookup (no per-token Python dict probe)
        idx = pc.index_in(flat, value_set=vw).fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = np.where(idx >= 0, lp[np.maximum(idx, 0)], np.nan)
        n_tok = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        sums = np.add.reduceat(vals, starts)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "lm_score": pa.array(_round(sums / n_tok, 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


@register(
    "image_meta",
    """
    SELECT doc_id, 'ppm' AS format,
           CAST(8 + (doc_id % 8) * 4 AS INT) AS width,
           CAST(8 + (doc_id % 5) * 4 AS INT) AS height
    FROM documents
    """,
)
def image_meta_q(sf_dir: str):
    """Container-header metadata extraction (the sniff-before-decode
    step every crawl pipeline runs): documents become REAL P6 PPM
    containers (pixels tiled from the text bytes, dimensions a
    deterministic function of doc_id), and `functions/media.py::
    image_meta` parses format/width/height back from the ENCODED BYTES
    — PNG/GIF/JPEG/BMP branches of the same parser are pinned by unit
    tests with hand-built headers.  The oracle checks the encode→parse
    round trip against the dimension formula."""
    from .functions import media as mediafn

    rd = _rd()

    def to_meta(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        fmts, ws, hs = [], [], []
        for i, txt in zip(did, texts):
            w = 8 + int(i % 8) * 4
            h = 8 + int(i % 5) * 4
            buf = np.frombuffer(txt.encode(), dtype=np.uint8)
            img = np.resize(buf, (h, w, 3))
            f, pw, ph = mediafn.image_meta(mediafn.encode_ppm(img))
            fmts.append(f), ws.append(pw), hs.append(ph)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(did), "format": pa.array(fmts),
             "width": pa.array(ws, type=pa.int32()),
             "height": pa.array(hs, type=pa.int32())}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_meta, batch_format="pyarrow")


@register(
    "events_lag",
    """
    SELECT event_id, user_id,
           CAST(FLOOR(EPOCH(
                ts - LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)
           )) AS BIGINT) AS gap_s
    FROM events
    """,
)
def events_lag(sf_dir: str):
    """LAG window function (per-user gap to the previous event, in
    whole seconds; null for each user's first event) — same coarse
    user-fold shuffle as user_sessions, one lexsort + one shifted
    difference per fold group, user boundaries masked to null."""
    rd = _rd()
    from .functions import hashing

    def tag(t: pa.Table) -> pa.Table:
        fold = hashing.fold_int64(
            t.column("user_id").to_numpy(zero_copy_only=False), 64
        )
        return t.append_column("fold", pa.array(fold))

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        gap = np.empty(len(u), dtype=np.float64)
        gap[0] = np.nan
        gap[1:] = np.where(
            u[1:] == u[:-1], (ts[1:] - ts[:-1]) // 1_000_000, np.nan
        )
        return pd.DataFrame(
            {"event_id": eid, "user_id": u,
             "gap_s": pd.array(gap, dtype="Int64")}
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(lag, batch_format="pandas")
    )


def _near_dup_incremental_sql() -> str:
    """Bit-exact DuckDB mirror of the incremental near-dup flow (VERDICT
    r3 item 7): the shared MinHash prefix, then bucket join (window x
    index + in-window pairs) and signature-estimated Jaccard >= 0.8.
    The engine chains (instead of all-pairs) in-window buckets larger
    than 200 rows — the testdata's buckets are far smaller, so the
    all-pairs SQL join is exact here."""
    return f"""
    WITH {_minhash_prefix_sql()},
    wband AS (SELECT * FROM bandrows WHERE doc_id % 2 = 1),
    aband AS (SELECT * FROM bandrows WHERE doc_id % 2 = 0),
    cand AS (
      SELECT DISTINCT w.doc_id AS new_id, a.doc_id AS match_id
      FROM wband w JOIN aband a ON w.b = a.b AND w.bh = a.bh
      UNION
      SELECT DISTINCT w2.doc_id AS new_id, w1.doc_id AS match_id
      FROM wband w1 JOIN wband w2
        ON w1.b = w2.b AND w1.bh = w2.bh AND w1.doc_id < w2.doc_id
    ),
    est AS (
      SELECT c.new_id, c.match_id,
             SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) / 64.0 AS e
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.new_id
      JOIN sig sb ON sb.doc_id = c.match_id AND sb.p = sa.p
      GROUP BY c.new_id, c.match_id
    )
    SELECT new_id, match_id,
           FLOOR(e * 10000 + 0.5) / 10000 AS est_jaccard
    FROM est WHERE e >= 0.8 ORDER BY new_id, match_id
    """


@register("near_dup_incremental", _near_dup_incremental_sql())
def near_dup_incremental(sf_dir: str):
    """Incremental NEAR-dup ingest (the near-dup companion of
    `dedup_incremental`): even-doc_id documents form the accepted
    corpus whose LSH band index + signature shards are persisted
    (`stages/dedup_docs.py::build_band_index`); the odd-doc_id window
    then matches against that index with single-shard reads and
    signature-estimated Jaccard — the accepted corpus is never
    scanned.  Returns (new_id, match_id, est_jaccard) matches."""
    import tempfile

    from .stages import dedup_docs

    rd = _rd()
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    def split(keep_even: bool):
        def f(t: pa.Table) -> pa.Table:
            even = pc.equal(
                pc.bit_wise_and(t.column("doc_id"), pa.scalar(1)), pa.scalar(0)
            )
            return t.filter(even if keep_even else pc.invert(even))

        return f

    accepted = docs.map_batches(split(True), batch_format="pyarrow")
    window = docs.map_batches(split(False), batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="olu_nd_idx_") as idx:
        dedup_docs.build_band_index(accepted, idx)
        return dedup_docs.incremental_near_dup(window, idx)


@register(
    "geo_training_mix",
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_NATION_RECTS.strip()
    + """
    , geo AS (
      SELECT p.url, p.text, COALESCE(r.polygon_id, -1) AS polygon_id
      FROM pages p LEFT JOIN nation_rects r
        ON p.lon BETWEEN r.min_lon AND r.max_lon
       AND p.lat BETWEEN r.min_lat AND r.max_lat
    ),
    q AS (
      SELECT url, text, polygon_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      FROM geo WHERE polygon_id >= 0
    ),
    f AS (SELECT * FROM q WHERE n_tokens BETWEEN 20 AND 90),
    d AS (
      SELECT * FROM f
      QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY url) = 1
    )
    SELECT polygon_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM d GROUP BY polygon_id
    """,
)
def geo_training_mix(sf_dir: str):
    """The composed GEO-aware training-data pipeline — the north-rule
    narrative end to end in ONE streaming Dataset: pages -> geocode
    (actor pool, canonical extraction) -> point-in-polygon against the
    nation layer -> keep in-polygon pages -> token-count quality
    window -> exact dedup (coarse content-hash fold, min-url survivor
    carries ITS OWN polygon) -> per-polygon corpus rollup.  Two
    shuffles total (dedup fold, polygon rollup); text leaves the
    pipeline at the dedup stage."""
    from .functions import hashing
    from .stages.dedup_docs import add_content_hash

    joiner = _nation_joiner(sf_dir, with_nodes=False)

    def pip_quality(t: pa.Table) -> pa.Table:
        # the joiner DROPS no-geo rows (cell_id < 0): filter the input
        # the same way FIRST so the join output is one row per
        # remaining input row in order, and the positional text
        # re-attach below stays aligned
        t = t.filter(pc.greater_equal(t.column("cell_id"), pa.scalar(0)))
        j = joiner(t)
        t = j.append_column("text", t.column("text"))
        t = t.filter(pc.greater_equal(t.column("polygon_id"), pa.scalar(0)))
        n_tok = pc.list_value_length(
            pc.split_pattern(t.column("text"), " ")
        ).cast(pa.int64())
        t = t.append_column("n_tokens", n_tok)
        keep = pc.and_(
            pc.greater_equal(n_tok, pa.scalar(20, type=pa.int64())),
            pc.less_equal(n_tok, pa.scalar(90, type=pa.int64())),
        )
        t = t.filter(keep).select(["url", "text", "polygon_id", "n_tokens"])
        t = add_content_hash(t)
        fold = hashing.fold_int64(
            t.column("content_hash").to_numpy(zero_copy_only=False), 64
        )
        return t.append_column("fold", pa.array(fold))

    def dedup_group(g: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(
            g.column("text").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        urls = g.column("url").to_numpy(zero_copy_only=False).astype(object)
        o = np.lexsort((urls, codes))
        first = o[
            np.concatenate([[0], np.flatnonzero(np.diff(codes[o])) + 1])
        ]
        return g.take(pa.array(first)).select(["polygon_id", "n_tokens"])

    def rollup_partial(t: pa.Table) -> pa.Table:
        pid = t.column("polygon_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u, inv, cnt = np.unique(pid, return_inverse=True, return_counts=True)
        ts = np.zeros(len(u), dtype=np.int64)
        np.add.at(ts, inv, tok)
        return pa.table({
            "polygon_id": pa.array(u),
            "n_part": pa.array(cnt.astype(np.int64)),
            "tok_part": pa.array(ts),
        })

    from ray.data.aggregate import Sum

    return (
        _pages_geo_ds(sf_dir)
        .map_batches(pip_quality, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(dedup_group, batch_format="pyarrow")
        .map_batches(rollup_partial, batch_format="pyarrow")
        .groupby("polygon_id")
        .aggregate(
            Sum("n_part", alias_name="n_docs"),
            Sum("tok_part", alias_name="total_tokens"),
        )
    )


@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(sf_dir: str):
    """Returned-item report (TPC-H Q10 shape): the date filter keeps
    ~3.5% of orders, so the (o_orderkey -> o_custkey) map rides as a
    broadcast sorted-array pair (searchsorted probe, no shuffle); the
    fact table streams once emitting per-customer revenue partials;
    the customer/nation dimensions broadcast into the tiny
    post-aggregate; final top-20 is a sort+limit over customers with
    revenue only.  Revenue rounded BEFORE ordering on both sides
    (tie-break c_custkey) so ulp noise cannot flip the cut."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    orders = _pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))
    m = pc.and_(
        pc.greater_equal(orders.column("o_orderdate"), lo),
        pc.less(orders.column("o_orderdate"), hi),
    )
    orders = orders.filter(m)
    okeys = orders.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    ocust = orders.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    o_order = np.argsort(okeys, kind="stable")
    okeys, ocust = okeys[o_order], ocust[o_order]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))
        lk = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lk) == 0 or len(okeys) == 0:
            return pa.Table.from_pydict(
                {"c_custkey": pa.array([], type=pa.int64()),
                 "rev_part": pa.array([], type=pa.float64())}
            )
        pos = np.clip(np.searchsorted(okeys, lk), 0, len(okeys) - 1)
        hit = okeys[pos] == lk
        rev = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )
        cust = ocust[pos[hit]]
        rev = rev[hit]
        u, inv = np.unique(cust, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.float64)
        np.add.at(sums, inv, rev)
        return pa.Table.from_pydict(
            {"c_custkey": pa.array(u), "rev_part": pa.array(sums)}
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev_part", alias_name="revenue"))
        .to_pandas()  # customers-with-revenue only: small by the filter
    )
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).to_pandas()
    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = agg.merge(cust, on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["revenue"] = _round(out["revenue"].to_numpy(dtype=np.float64), 2)
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True],
                          kind="stable").head(20).reset_index(drop=True)
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


@register(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(sf_dir: str, _force_join: bool = False):
    """Volume shipping (TPC-H Q7 shape): the nation-pair filter prunes
    the supplier side to ~2/25 of suppliers BEFORE the fact scan (a
    broadcast sorted-array probe drops non-qualifying lineitem rows at
    the scan task).  Below the 2M-orders gate the o_custkey map rides
    into the SAME scan as sorted arrays (q21's broadcast-probe gate
    discipline — one lineitem pass, no exchange at all); above it the
    surviving fact slice goes through Ray's HASH JOIN against orders
    (the general two-big-sides path — orders carries no selective
    filter here).  The gate also sidesteps a Ray Data 2.49.2 hash-join
    defect: a join partition whose left side receives only EMPTY
    blocks loses its schema and Acero raises ArrowInvalid — which a
    heavily-filtered small-tier left (this one keeps ~2/25 of rows)
    can hit.  The customer→nation map broadcasts into the tiny
    post-join map.  The final (supp, cust, year) aggregate is 4
    rows."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = dict(zip(nat.column("n_nationkey").to_pylist(),
                    nat.column("n_name").to_pylist()))
    keys = {v: k for k, v in nmap.items()}
    k1, k2 = keys["NATION_1"], keys["NATION_2"]
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sn = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    smask = np.isin(sn, [k1, k2])
    sk, sn = sk[smask], sn[smask]
    so = np.argsort(sk, kind="stable")
    sk, sn = sk[so], sn[so]
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck, kind="stable")
    ck, cn = ck[co], cn[co]

    lo = pa.scalar(np.datetime64("1995-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def li_side(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), lo),
            pc.less(t.column("l_shipdate"), hi),
        )
        t = t.filter(m)
        lsk = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lsk) == 0 or len(sk) == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "supp_nk": pa.array([], pa.int64()),
                "l_year": pa.array([], pa.int64()),
                "volume": pa.array([], pa.float64()),
            })
        pos = np.clip(np.searchsorted(sk, lsk), 0, len(sk) - 1)
        hit = sk[pos] == lsk
        t = t.filter(pa.array(hit))
        yr = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        vol = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )
        return pa.table({
            "l_orderkey": t.column("l_orderkey").combine_chunks(),
            "supp_nk": pa.array(sn[pos[hit]]),
            "l_year": pa.array(yr),
            "volume": pa.array(vol),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_side, batch_format="pyarrow")

    def pair_core(t: pa.Table, oc: np.ndarray) -> pa.Table:
        pos = np.clip(np.searchsorted(ck, oc), 0, max(len(ck) - 1, 0))
        if len(ck):
            # verified probe: a custkey absent from customer must NOT
            # inherit a neighbour's nationkey (ADVICE r3)
            cust_nk = np.where(ck[pos] == oc, cn[pos], -1)
        else:
            cust_nk = np.full(len(oc), -1, dtype=np.int64)
        snk = t.column("supp_nk").to_numpy(zero_copy_only=False)
        keep = ((snk == k1) & (cust_nk == k2)) | ((snk == k2) & (cust_nk == k1))
        t = t.filter(pa.array(keep))
        return pa.table({
            "supp_nation": pa.array(
                [nmap[int(v)] for v in snk[keep]], type=pa.string()
            ),
            "cust_nation": pa.array(
                [nmap[int(v)] for v in cust_nk[keep]], type=pa.string()
            ),
            "l_year": t.column("l_year").combine_chunks(),
            "volume": t.column("volume").combine_chunks(),
        })

    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_orders <= _CFG.broadcast_keys_max and not _force_join:
        # broadcast-probe plan: the o_custkey map rides into the same
        # pruned lineitem scan as sorted arrays — zero exchanges
        ot = td.read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        ok_b = ot.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        oc_b = ot.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        oo = np.argsort(ok_b, kind="stable")
        ok_b, oc_b = ok_b[oo], oc_b[oo]

        def pair(t: pa.Table) -> pa.Table:
            lo_k = t.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(ok_b):
                op = np.clip(np.searchsorted(ok_b, lo_k), 0, len(ok_b) - 1)
                oc = np.where(ok_b[op] == lo_k, oc_b[op], -1)
            else:
                oc = np.full(len(lo_k), -1, dtype=np.int64)
            return pair_core(t, oc)

        paired = li.map_batches(pair, batch_format="pyarrow")
    else:
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        joined = li.join(
            orders, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def pair(t: pa.Table) -> pa.Table:
            oc = t.column("o_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pair_core(t, oc)

        paired = joined.map_batches(pair, batch_format="pyarrow")

    agg = (
        paired
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("volume", alias_name="revenue"))
        .to_pandas()
    )
    if len(agg) == 0:  # empty aggregate loses its schema
        return pd.DataFrame({
            "supp_nation": pd.Series(dtype=object),
            "cust_nation": pd.Series(dtype=object),
            "l_year": pd.Series(dtype=np.int64),
            "revenue": pd.Series(dtype=np.float64),
        })
    agg["revenue"] = _round(agg["revenue"].to_numpy(dtype=np.float64), 2)
    return agg.sort_values(
        ["supp_nation", "cust_nation", "l_year"], kind="stable"
    ).reset_index(drop=True)


@register(
    "tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(sf_dir: str):
    """Top supplier (TPC-H Q15 shape): argmax OF an aggregate — the
    per-supplier revenue aggregate (map-side combined partials, one
    supplier-sized groupby) feeds a driver-side max + tie-keeping
    filter; the supplier dimension joins into the ≤few winner rows.
    Float note: quantities/prices sum in different orders here vs the
    oracle, but winner selection only flips if two suppliers sit within
    one ulp of the max — not a structural hazard."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), lo),
            pc.less(t.column("l_shipdate"), hi),
        )
        t = t.filter(m)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t.column("l_discount").to_numpy(zero_copy_only=False))
        )
        u, inv = np.unique(skey, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.float64)
        np.add.at(sums, inv, rev)
        return pa.table({"l_suppkey": pa.array(u), "rev_part": pa.array(sums)})

    rev = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_part", alias_name="total_revenue"))
        .to_pandas()  # one row per supplier: dimension-sized
    )
    best = rev["total_revenue"].max()
    win = rev[rev["total_revenue"] == best]
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = win.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = _round(
        out["total_revenue"].to_numpy(dtype=np.float64), 2
    )
    return out.sort_values("s_suppkey", kind="stable").reset_index(drop=True)[
        ["s_suppkey", "s_name", "total_revenue"]
    ]


@register(
    "tpch_q17",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17(sf_dir: str):
    """Small-quantity-order revenue (TPC-H Q17 shape): a CORRELATED
    scalar subquery — per-part AVG(quantity) — becomes a two-pass
    broadcast: pass 1 map-side-combines (part, Σqty, n) partials into a
    part-sized table for the brand's parts only, the 0.2·avg thresholds
    broadcast, pass 2 re-scans and sums prices under threshold.
    Quantities are small integers, so the float average is EXACT
    (integer sums in f64) and the strict < cannot flip vs the oracle."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    pk = part.filter(
        pc.equal(part.column("p_brand"), pa.scalar("Brand#1"))
    ).column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    pk = np.sort(pk)

    def moments(t: pa.Table) -> pa.Table:
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pk) == 0 or len(lp) == 0:
            return pa.table({
                "l_partkey": pa.array([], pa.int64()),
                "qty_sum": pa.array([], pa.float64()),
                "qty_n": pa.array([], pa.int64()),
            })
        pos = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
        hit = pk[pos] == lp
        lp = lp[hit]
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)[hit]
        u, inv = np.unique(lp, return_inverse=True)
        s = np.zeros(len(u), dtype=np.float64)
        n = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, q)
        np.add.at(n, inv, 1)
        return pa.table({
            "l_partkey": pa.array(u), "qty_sum": pa.array(s),
            "qty_n": pa.array(n),
        })

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    mom = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        .map_batches(moments, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("qty_sum", alias_name="s"), Sum("qty_n", alias_name="n"))
        .to_pandas()
    )
    tk = mom["l_partkey"].to_numpy(dtype=np.int64)
    thr = 0.2 * (mom["s"].to_numpy() / mom["n"].to_numpy())
    to = np.argsort(tk, kind="stable")
    tk, thr = tk[to], thr[to]

    def under(t: pa.Table) -> pa.Table:
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(tk) == 0 or len(lp) == 0:
            return pa.table({"price_part": pa.array([], pa.float64())})
        pos = np.clip(np.searchsorted(tk, lp), 0, len(tk) - 1)
        hit = tk[pos] == lp
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = hit & (q < thr[pos])
        s = float(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep].sum()
        )
        return pa.table({"price_part": pa.array([s], type=pa.float64())})

    total = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        .map_batches(under, batch_format="pyarrow")
        .sum("price_part")
    )
    return pd.DataFrame({"avg_yearly": [float(_round(
        np.array([total / 7.0]), 2
    )[0])]})


@register(
    "tpch_q22",
    """
    WITH pos AS (
      SELECT AVG(c_acctbal) AS a FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    )
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c_acctbal > a
      AND c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def tpch_q22(sf_dir: str):
    """Global sales opportunity (TPC-H Q22 shape): a scalar-subquery
    threshold (avg positive balance over the nation set) + an ANTI-join
    against orders (customers who never ordered).  The distinct
    o_custkey set is reduced map-side (unique per batch), exchanged
    once at customer cardinality, and applied as a sorted-array
    anti-probe; the threshold itself is an exact two-pass moment
    (Σ, n) so the strict > matches the oracle to the ulp of one final
    division."""
    import pyarrow.parquet as _pq

    rd = _rd()

    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    nk = cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    bal = cust.column("c_acctbal").to_numpy(zero_copy_only=False)
    ckey = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    in_set = np.isin(nk, np.arange(1, 8))
    posm = in_set & (bal > 0.0)
    thr = float(bal[posm].sum() / posm.sum())

    def dedup_cust(t: pa.Table) -> pa.Table:
        u = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"o_custkey": pa.array(u)})

    have = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(dedup_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .to_pandas()["o_custkey"]
        .to_numpy(dtype=np.int64)
    )
    have = np.sort(have)
    keep = in_set & (bal > thr)
    if len(have):
        pos = np.clip(np.searchsorted(have, ckey), 0, len(have) - 1)
        keep &= ~(have[pos] == ckey)
    u, inv = np.unique(nk[keep], return_inverse=True)
    cnt = np.bincount(inv)
    sums = np.zeros(len(u), dtype=np.float64)
    np.add.at(sums, inv, bal[keep])
    return pd.DataFrame({
        "cntrycode": u.astype(np.int64),
        "numcust": cnt.astype(np.int64),
        "totacctbal": _round(sums, 2),
    })


def _kmv_sql() -> str:
    from .stages.sketchq import KMV_K, splitmix64_sql

    return f"""
    WITH h AS (
      SELECT lang, CAST(LENGTH(text) AS DOUBLE) AS v,
             {splitmix64_sql('doc_id')} AS h
      FROM documents
    ),
    r AS (
      SELECT lang, v,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
      FROM h
    )
    SELECT lang, COUNT(*) AS sample_n,
           ROUND(quantile_cont(v, 0.5), 4) AS p50,
           ROUND(quantile_cont(v, 0.9), 4) AS p90,
           ROUND(quantile_cont(v, 0.99), 4) AS p99
    FROM r WHERE rn <= {KMV_K}
    GROUP BY lang
    """


@register("doc_length_quantiles_kmv", _kmv_sql())
def doc_length_quantiles_kmv(sf_dir: str):
    """Mergeable QUANTILE SKETCH per language — the unbounded-domain
    companion of the exact histogram quantiles (`doc_length_quantiles`
    relies on lengths being small ints; this works for any ordered
    value).  Shape = KMV bottom-k: each block keeps the k rows whose
    hashed doc_id is smallest (a deterministic uniform sample);
    bottom-k of a union IS the union of bottom-k's, so the merge is a
    per-lang sort+head over ≤ k·blocks rows and quantiles interpolate
    from the merged sample.  Error is O(1/√k) — bounded by pytest
    against the exact per-lang quantiles (`tests/test_sketch.py`).
    Because the sample is DETERMINISTIC (splitmix64 is a bijection —
    no hash ties), the sketch itself is oracle-checked: the SQL mirror
    reproduces the hash bit-exactly and takes the same bottom-k."""
    from .functions import hashing
    from .stages.sketchq import KMV_K, kmv_merge_quantiles

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False)
        # UNSIGNED order — the SQL mirror's UBIGINT sorts unsigned
        h = hashing.hash_int64(ids).view(np.uint64)
        # vectorized per-lang bottom-k: one lexsort over (lang code, h),
        # rank-within-group < k (no per-group pandas nsmallest)
        codes = (
            t.column("lang").combine_chunks().dictionary_encode()
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.lexsort((h, codes))
        cs = codes[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1])
        sizes = np.diff(np.append(starts, len(cs)))
        rank = np.arange(len(cs)) - np.repeat(starts, sizes)
        keep = pa.array(order[rank < KMV_K])
        return pa.table({
            "lang": t.column("lang").take(keep),
            "h": pa.array(h[order[rank < KMV_K]]),
            "v": pa.array(ln[order[rank < KMV_K]].astype(np.int64)),
        })

    samples = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(kmv_merge_quantiles, batch_format="pandas")
    )
    return samples


@register(
    "word_heavy_hitters",
    """
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM words),
    cnt AS (SELECT word, COUNT(*) AS n_occurrences FROM words GROUP BY word)
    SELECT c.word, c.n_occurrences
    FROM cnt c, tot
    WHERE c.n_occurrences * 64 > tot.n
    """,
)
def word_heavy_hitters(sf_dir: str):
    """Heavy hitters (frequency > n/64) with an O(1)-per-block
    exchange: each batch emits only its LOCAL heavy words (freq_b >
    n_b/64 — at most 63 rows per block, a frequent-items sketch in the
    Misra-Gries sense).  Completeness is provable: a globally heavy
    word must be locally heavy in at least one block (else its total
    ≤ Σ n_b/64 = n/64).  The candidate union (≤63·blocks words) is then
    EXACTLY counted in a pruned second scan, so the output equals the
    full vocabulary groupby — which `word_counts` runs — without ever
    exchanging vocabulary-sized state."""
    import ray

    rd = _rd()
    from ray.data.aggregate import Sum

    def local_heavy(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            pc.list_flatten(
                pc.split_pattern(t.column("text").combine_chunks(), " ")
            )
        )
        c = vc.field("counts").to_numpy(zero_copy_only=False)
        keep = c * 64 > int(c.sum())
        return pa.table({"word": vc.field("values").filter(pa.array(keep))})

    cand_parts = [
        b
        for b in rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )
        .map_batches(local_heavy, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not cand_parts:
        return pd.DataFrame({
            "word": pd.Series([], dtype=object),
            "n_occurrences": pd.Series([], dtype="int64"),
        })
    cands = np.unique(
        pa.concat_tables(cand_parts).column("word").to_numpy(zero_copy_only=False)
    )
    cref = ray.put(cands)

    def verify(t: pa.Table) -> pa.Table:
        want = ray.get(cref)
        vc = pc.value_counts(
            pc.list_flatten(
                pc.split_pattern(t.column("text").combine_chunks(), " ")
            )
        )
        u = vc.field("values").to_numpy(zero_copy_only=False).astype(object)
        c = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        total = int(c.sum())
        pos = np.clip(np.searchsorted(want, u), 0, max(len(want) - 1, 0))
        hit = (want[pos] == u) if len(want) else np.zeros(len(u), bool)
        return pa.table({
            "word": pa.array(
                np.concatenate([u[hit], np.array([""], dtype=object)]),
                type=pa.string(),
            ),
            "n_part": pa.array(np.concatenate([c[hit], [total]])),
            "is_total": pa.array([False] * int(hit.sum()) + [True]),
        })

    agg = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(verify, batch_format="pyarrow")
        .groupby(["word", "is_total"])
        .aggregate(Sum("n_part", alias_name="n_occurrences"))
        .to_pandas()
    )
    total = int(agg.loc[agg["is_total"], "n_occurrences"].sum())
    out = agg[~agg["is_total"]]
    out = out[out["n_occurrences"].to_numpy() * 64 > total]
    return out[["word", "n_occurrences"]].reset_index(drop=True)


@register(
    "events_ntile",
    """
    SELECT event_id, event_type,
           CAST(NTILE(4) OVER (
             PARTITION BY event_type ORDER BY value, event_id
           ) AS BIGINT) AS quartile
    FROM events
    """,
)
def events_ntile(sf_dir: str):
    """NTILE(4) per event type WITHOUT a global sort: pass 1 exchanges
    only (type, value-range-bucket) COUNTS (64 monotone buckets over
    the global value range), the driver prefix-sums them into
    per-bucket global-rank offsets, and pass 2 ranks each (type,
    bucket) group locally by (value, event_id) — the same
    range-bucket global-ROW_NUMBER shape as doc_shuffle_shards, which
    also splits a hot event_type across 64 groups instead of one
    giant ordered partition."""
    rd = _rd()
    from ray.data.aggregate import Max, Min, Sum

    K, B = 4, 64
    src = lambda cols: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/events.parquet", columns=cols
    )
    stats = src(["value"]).aggregate(Min("value"), Max("value"))
    lo, hi = float(stats["min(value)"]), float(stats["max(value)"])
    span = (hi - lo) or 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(
            ((v - lo) / span * B).astype(np.int64), 0, B - 1
        )

    def counts(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        b = bucket_of(v)
        df = pd.DataFrame({"event_type": et, "bucket": b})
        g = df.groupby(["event_type", "bucket"], sort=False).size()
        out = g.reset_index()
        out.columns = ["event_type", "bucket", "c_part"]
        return pa.Table.from_pandas(out, preserve_index=False)

    cdf = (
        src(["event_type", "value"])
        .map_batches(counts, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("c_part", alias_name="c"))
        .to_pandas()
        .sort_values(["event_type", "bucket"], kind="stable")
    )
    offsets: dict = {}
    totals: dict = {}
    for et, grp in cdf.groupby("event_type", sort=False):
        cum = np.concatenate([[0], np.cumsum(grp["c"].to_numpy())])
        offsets[et] = dict(zip(grp["bucket"].to_numpy(), cum[:-1]))
        totals[et] = int(cum[-1])

    def rank_group(g: pa.Table) -> pa.Table:
        et = g.column("event_type")[0].as_py()
        b = int(g.column("bucket")[0].as_py())
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = g.column("value").to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, v))
        r = int(offsets[et][b]) + np.arange(len(eid), dtype=np.int64)
        n = totals[et]
        base = n // K
        m = n % K
        first = m * (base + 1)
        tile = np.where(
            r < first,
            r // max(base + 1, 1),
            m + np.where(base > 0, (r - first) // max(base, 1), 0),
        ) + 1
        return pa.table({
            "event_id": pa.array(eid[o]),
            "event_type": g.column("event_type").combine_chunks().take(
                pa.array(o)
            ),
            "quartile": pa.array(tile.astype(np.int64)),
        })

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(bucket_of(v)))

    return (
        src(["event_id", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(rank_group, batch_format="pyarrow")
    )


@register(
    "pip_nation_salted",
    # identical SQL to pip_nation: the ENGINE path differs (explicit
    # cell-keyed shuffle with salted mega-cells), the answer must not
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_NATION_RECTS.strip()
    + """
    SELECT p.url, COALESCE(r.polygon_id, -1) AS polygon_id
    FROM pages p LEFT JOIN nation_rects r
      ON p.lon BETWEEN r.min_lon AND r.max_lon
     AND p.lat BETWEEN r.min_lat AND r.max_lat
    """,
)
def pip_nation_salted(sf_dir: str):
    """Point-in-polygon via the PARTITIONED join (north_rule: 'explicit
    hash-partition shuffles keyed on cell id and salted repartitioning
    for skewed mega-cells'): rings travel IN the shuffle tagged-union'd
    with the pages, hot cells split into salt sub-partitions with the
    cell's rings replicated into every salt.  The threshold is forced
    low here so the salt path actually executes at battery scale; the
    oracle is IDENTICAL to pip_nation — same answer, different
    exchange plan."""
    import ray.data as rd_mod

    from .stages import spatial
    from .stages.spatial import EngineConfig

    rings = td.nation_rings(sf_dir)
    pages = _pages_geo_ds(sf_dir)
    cfg = EngineConfig(mega_cell_threshold=50, salt_factor=4)
    out = spatial.spatial_join_partitioned(pages, rings, cfg)
    return out.select_columns(["url", "polygon_id"])


@register(
    "knn_part_sharded",
    "WITH " + td.SQL_PAGES.strip() + ",\n" + td.SQL_STATE_NODES.strip()
    + """
    SELECT url, knn_node_id, knn_dist FROM (
      SELECT p.url, s.id AS knn_node_id,
             (p.lon - s.lon) * (p.lon - s.lon) + (p.lat - s.lat) * (p.lat - s.lat)
               AS knn_dist,
             ROW_NUMBER() OVER (
               PARTITION BY p.url
               ORDER BY (p.lon - s.lon) * (p.lon - s.lon)
                      + (p.lat - s.lat) * (p.lat - s.lat), s.id
             ) AS rn
      FROM pages p CROSS JOIN state_nodes s
    ) WHERE rn = 1
    """,
)
def knn_part_sharded(sf_dir: str):
    """Exact kNN via the BROADCAST-FREE sharded join: the node layer is
    split into cell-range shards, each held by its own actor stage;
    pages stream through every shard merging the running (dist², id)
    best — no process ever holds the full node layer (the scale path
    when it outgrows a broadcast).  Oracle identical to knn_part: same
    answer, different exchange plan."""
    import ray.data as rd_mod

    from .stages import spatial

    nt = td.nodes_table(sf_dir)
    nodes_tbl = pa.Table.from_pydict(
        {"id": nt.column("id").cast(pa.int64()),
         "lon": nt.column("lon"), "lat": nt.column("lat")}
    )
    rings = td.nation_rings(sf_dir)
    ds = spatial.spatial_join_sharded(
        _pages_geo_ds(sf_dir), rings, nodes_tbl, n_shards=3
    )
    return ds.select_columns(["url", "knn_node_id", "knn_dist"])


@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(sf_dir: str):
    """Customer order-count distribution (TPC-H Q13 shape) — the
    DOUBLE-aggregation pattern: the fact table streams once into
    per-batch (custkey, count) partials (map-side combine), one
    customer-keyed groupby-sum, then the zero-count bucket comes from
    the customer dimension MINUS the aggregate's key set (LEFT JOIN
    semantics without any join: |customer| is dimension-sized) and the
    final histogram-of-counts is count-distinct-sized."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.not_equal(t.column("o_orderpriority"), pa.scalar("1-URGENT"))
        )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(ck, return_counts=True)
        return pa.Table.from_pydict(
            {"c_custkey": pa.array(u), "n_part": pa.array(c.astype(np.int64))}
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_part", alias_name="c_count"))
        .to_pandas()  # customers-with-orders only
    )
    custkeys = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).column("c_custkey").to_numpy(zero_copy_only=False)
    n_zero = len(np.setdiff1d(custkeys, agg["c_custkey"].to_numpy()))
    counts = agg["c_count"].to_numpy(dtype=np.int64)
    u, dist = np.unique(counts, return_counts=True)
    if n_zero:
        u = np.concatenate([[0], u])
        dist = np.concatenate([[n_zero], dist])
    out = pd.DataFrame({"c_count": u.astype("int64"),
                        "custdist": dist.astype("int64")})
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


@register(
    "tpch_q2",
    """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(ps_supplycost, 4) AS supplycost
    FROM part, ps, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size <= 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(sf_dir: str):
    """Min-cost supplier (TPC-H Q2 shape: correlated-MIN subquery over
    a supply relation).  The testdata has no partsupp table; observed
    unit price MIN(l_extendedprice / l_quantity) per (part, supplier)
    stands in for ps_supplycost, mirrored in the oracle.  Shape: one
    lineitem groupby-MIN (map-side partial mins first), region/size
    dimension filters BROADCAST into the scan, then the correlated
    per-part MIN + tie-keeping equality on the dimension-sized
    aggregate (driver-side; result ≤ qualifying pairs)."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Min

    nat = td.read(sf_dir, "nation")
    reg = td.read(sf_dir, "region")
    eu_reg = set(
        reg.filter(pc.equal(reg.column("r_name"), "EUROPE"))
        .column("r_regionkey").to_pylist()
    )
    nmask = pc.is_in(nat.column("n_regionkey"),
                     value_set=pa.array(sorted(eu_reg)))
    eu_nat = nat.filter(nmask)
    nat_name = dict(zip(eu_nat.column("n_nationkey").to_pylist(),
                        eu_nat.column("n_name").to_pylist()))
    sup = td.read(sf_dir, "supplier")
    smask = pc.is_in(sup.column("s_nationkey"),
                     value_set=pa.array(sorted(nat_name) or [-1]))
    sup = sup.filter(smask)
    sk = np.sort(sup.column("s_suppkey").to_numpy(zero_copy_only=False))
    part = td.read(sf_dir, "part")
    pmask = pc.and_(pc.less_equal(part.column("p_size"), pa.scalar(15)),
                    pc.equal(part.column("p_type"), "LARGE"))
    part = part.filter(pmask)
    pk = np.sort(part.column("p_partkey").to_numpy(zero_copy_only=False))

    def partial(t: pa.Table) -> pa.Table:
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(lp), dtype=bool)
        if len(pk) and len(sk):
            pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
            keep = (pk[pp] == lp) & (sk[ss] == ls)
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table({"ps_partkey": pa.array([], type=pa.int64()),
                             "ps_suppkey": pa.array([], type=pa.int64()),
                             "unit": pa.array([], type=pa.float64())})
        unit = (
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            / t.column("l_quantity").to_numpy(zero_copy_only=False)
        )
        lp, ls = lp[keep], ls[keep]
        # map-side MIN per (part, supp): the exchange carries pairs
        key = np.stack([lp, ls], axis=1)
        u, inv = np.unique(key, axis=0, return_inverse=True)
        mins = np.full(len(u), np.inf)
        np.minimum.at(mins, inv, unit)
        return pa.table({"ps_partkey": pa.array(u[:, 0]),
                         "ps_suppkey": pa.array(u[:, 1]),
                         "unit": pa.array(mins)})

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["ps_partkey", "ps_suppkey"])
        .aggregate(Min("unit", alias_name="ps_supplycost"))
        .to_pandas()  # qualifying (part, supplier) pairs: dimension-sized
    )
    cols = ["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "supplycost"]
    if not len(agg):
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    best = agg.groupby("ps_partkey")["ps_supplycost"].transform("min")
    win = agg[agg["ps_supplycost"] == best].copy()
    supdf = sup.select(["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]).to_pandas()
    supdf["n_name"] = supdf["s_nationkey"].map(nat_name)
    partdf = part.select(["p_partkey", "p_name"]).to_pandas()
    out = (
        win.merge(supdf, left_on="ps_suppkey", right_on="s_suppkey")
        .merge(partdf, left_on="ps_partkey", right_on="p_partkey")
    )
    out["supplycost"] = _round(out["ps_supplycost"].to_numpy(np.float64), 4)
    out = out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], kind="stable",
    ).head(100).reset_index(drop=True)
    return out[cols]


@register(
    "tpch_q8",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                            AND TIMESTAMP '1996-12-31'
        AND p_type = 'PROMO'
    ) GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8(sf_dir: str, _force_join: bool = False):
    """National market share (TPC-H Q8 shape): every dimension (part
    filter, supplier→nation, customer→region) rides along as a
    BROADCAST sorted-array probe, and the share is two sums per year
    (conditional + total) combined in one groupby.  Shape switch
    (q21's gate): below 2M orders the QUALIFYING orders (window ∧
    ASIA, pre-joined driver-side) probe into one lineitem scan; above
    it the two facts hash-join on the Dataset (the q4 precedent)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    part = td.read(sf_dir, "part", ["p_partkey", "p_type"])
    pk = np.sort(
        part.filter(pc.equal(part.column("p_type"), "PROMO"))
        .column("p_partkey").to_numpy(zero_copy_only=False)
    )
    sup = td.read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = td.read(sf_dir, "nation")
    reg = td.read(sf_dir, "region")
    nname = dict(zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()))
    so = np.argsort(sup.column("s_suppkey").to_numpy(zero_copy_only=False))
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)[so]
    s_is_nat3 = np.array(
        [nname.get(k) == "NATION_3"
         for k in sup.column("s_nationkey").to_numpy(zero_copy_only=False)[so]]
    )
    asia_reg = set(
        reg.filter(pc.equal(reg.column("r_name"), "ASIA"))
        .column("r_regionkey").to_pylist()
    )
    asia_nk = {
        int(k) for k, r in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_regionkey").to_pylist())
        if int(r) in asia_reg
    }
    cust = td.read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    co = np.argsort(cust.column("c_custkey").to_numpy(zero_copy_only=False))
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)[co]
    c_asia = np.array(
        [int(k) in asia_nk
         for k in cust.column("c_nationkey").to_numpy(zero_copy_only=False)[co]]
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )

    def emit(t2: pa.Table, ls: np.ndarray, yr: np.ndarray) -> pa.Table:
        if t2.num_rows == 0:
            return pa.table({"o_year": pa.array([], type=pa.int64()),
                             "vol": pa.array([], type=pa.float64()),
                             "vol_nat": pa.array([], type=pa.float64())})
        vol = (
            t2.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t2.column("l_discount").to_numpy(zero_copy_only=False))
        )
        ss = np.clip(np.searchsorted(sk, ls), 0, max(len(sk) - 1, 0))
        is3 = s_is_nat3[ss] if len(sk) else np.zeros(len(ls), bool)
        return pa.table({"o_year": pa.array(yr),
                         "vol": pa.array(vol),
                         "vol_nat": pa.array(np.where(is3, vol, 0.0))})

    import pyarrow.parquet as _pq

    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_orders <= _CFG.broadcast_keys_max and not _force_join:
        # broadcast-probe plan (q21's gate discipline): the QUALIFYING
        # orders — date window ∧ ASIA customer, pre-joined driver-side
        # against the already-broadcast customer arrays — ride into one
        # lineitem scan as sorted (okey, year) arrays
        ot = td.read(sf_dir, "orders",
                     ["o_orderkey", "o_custkey", "o_orderdate"])
        od = ot.column("o_orderdate").to_numpy(zero_copy_only=False)
        oc = ot.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        win = (
            (od >= np.datetime64("1995-01-01", "us"))
            & (od <= np.datetime64("1996-12-31", "us"))
        )
        if len(ck):
            cc = np.clip(np.searchsorted(ck, oc), 0, len(ck) - 1)
            win &= (ck[cc] == oc) & c_asia[cc]
        else:
            win &= False
        okq = ot.column("o_orderkey").to_numpy(zero_copy_only=False)[win]
        oyq = od[win].astype("datetime64[Y]").astype(np.int64) + 1970
        oo = np.argsort(okq)
        okq, oyq = okq[oo], oyq[oo]

        def volume(t: pa.Table) -> pa.Table:
            lo = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(lo), dtype=bool)
            op = np.zeros(len(lo), dtype=np.int64)
            if len(okq) and len(pk) and len(sk):
                op = np.clip(np.searchsorted(okq, lo), 0, len(okq) - 1)
                pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
                ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
                keep = (okq[op] == lo) & (pk[pp] == lp) & (sk[ss] == ls)
            return emit(t.filter(pa.array(keep)), ls[keep], oyq[op[keep]])
    else:
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )
        li = li.join(
            orders, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def volume(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
            lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            oc = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (
                (od >= np.datetime64("1995-01-01", "us"))
                & (od <= np.datetime64("1996-12-31", "us"))
            )
            if len(pk):
                pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
                keep &= pk[pp] == lp
            else:
                keep &= False
            cc = np.clip(np.searchsorted(ck, oc), 0, max(len(ck) - 1, 0))
            keep &= (ck[cc] == oc) & c_asia[cc] if len(ck) else False
            ss = np.clip(np.searchsorted(sk, ls), 0, max(len(sk) - 1, 0))
            found_s = (sk[ss] == ls) if len(sk) else np.zeros(len(ls), bool)
            keep &= found_s
            t2 = t.filter(pa.array(keep))
            yr = (t2.column("o_orderdate").to_numpy(zero_copy_only=False)
                  .astype("datetime64[Y]").astype(np.int64) + 1970)
            return emit(t2, ls[keep], yr)

    out = (
        li.map_batches(volume, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("vol", alias_name="tot"),
                   Sum("vol_nat", alias_name="nat"))
        .to_pandas()  # one row per year
    )
    out["mkt_share"] = _round(
        out["nat"].to_numpy(np.float64) / out["tot"].to_numpy(np.float64), 4
    )
    out = out.sort_values("o_year", kind="stable").reset_index(drop=True)
    out["o_year"] = out["o_year"].astype(np.int64)
    return out[["o_year", "mkt_share"]]


@register(
    "tpch_q9",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(sf_dir: str, _force_join: bool = False):
    """Product-type profit (TPC-H Q9 shape).  No partsupp in the
    testdata, so profit has no supplycost term — amount is the
    discounted revenue, mirrored in the oracle; part-name LIKE filter
    and supplier→nation ride as broadcasts into a two-key groupby.
    Shape switch (q21's gate): order years probe into one lineitem
    scan below 2M orders; a fact ⋈ fact Dataset join above."""
    rd = _rd()
    from ray.data.aggregate import Sum

    part = td.read(sf_dir, "part", ["p_partkey", "p_name"])
    pmask = pc.match_substring(part.column("p_name"), "red")
    pk = np.sort(
        part.filter(pmask).column("p_partkey").to_numpy(zero_copy_only=False)
    )
    sup = td.read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = td.read(sf_dir, "nation")
    nname = dict(zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()))
    so = np.argsort(sup.column("s_suppkey").to_numpy(zero_copy_only=False))
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)[so]
    s_nat = np.array(
        [nname[int(k)]
         for k in sup.column("s_nationkey").to_numpy(zero_copy_only=False)[so]],
        dtype=object,
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )

    def finish(t2: pa.Table, ls: np.ndarray, yr: np.ndarray) -> pa.Table:
        if t2.num_rows == 0:
            return pa.table({"nation": pa.array([], type=pa.string()),
                             "o_year": pa.array([], type=pa.int64()),
                             "amount": pa.array([], type=pa.float64())})
        amt = (
            t2.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - t2.column("l_discount").to_numpy(zero_copy_only=False))
        )
        ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
        return pa.table({"nation": pa.array(list(s_nat[ss]), type=pa.string()),
                         "o_year": pa.array(yr),
                         "amount": pa.array(amt)})

    import pyarrow.parquet as _pq

    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_orders <= _CFG.broadcast_keys_max and not _force_join:
        # broadcast-probe plan (q21's gate discipline): order years ride
        # into ONE lineitem scan as sorted arrays — no fact-fact exchange
        ot = td.read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
        oo = np.argsort(ot.column("o_orderkey").to_numpy(zero_copy_only=False))
        ok_b = ot.column("o_orderkey").to_numpy(zero_copy_only=False)[oo]
        oyr = (ot.column("o_orderdate").to_numpy(zero_copy_only=False)[oo]
               .astype("datetime64[Y]").astype(np.int64) + 1970)

        def amount(t: pa.Table) -> pa.Table:
            lo = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(lp), dtype=bool)
            op = np.zeros(len(lo), dtype=np.int64)
            if len(pk) and len(sk) and len(ok_b):
                pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
                ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
                op = np.clip(np.searchsorted(ok_b, lo), 0, len(ok_b) - 1)
                keep = (pk[pp] == lp) & (sk[ss] == ls) & (ok_b[op] == lo)
            return finish(t.filter(pa.array(keep)), ls[keep], oyr[op[keep]])
    else:
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        li = li.join(
            orders, join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def amount(t: pa.Table) -> pa.Table:
            lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(lp), dtype=bool)
            if len(pk) and len(sk):
                pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
                ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
                keep = (pk[pp] == lp) & (sk[ss] == ls)
            t2 = t.filter(pa.array(keep))
            yr = (t2.column("o_orderdate").to_numpy(zero_copy_only=False)
                  .astype("datetime64[Y]").astype(np.int64) + 1970)
            return finish(t2, ls[keep], yr)

    out = (
        li.map_batches(amount, batch_format="pyarrow")
        .groupby(["nation", "o_year"])
        .aggregate(Sum("amount", alias_name="sum_profit"))
        .to_pandas()  # nations × years rows
    )
    out["sum_profit"] = _round(out["sum_profit"].to_numpy(np.float64), 2)
    out["o_year"] = out["o_year"].astype(np.int64)
    return out.sort_values(
        ["nation", "o_year"], ascending=[True, False], kind="stable"
    ).reset_index(drop=True)[["nation", "o_year", "sum_profit"]]


@register(
    "tpch_q11",
    """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey,
             CAST(SUM(l_quantity) AS BIGINT) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT ps_partkey, value FROM ps
    WHERE value > (SELECT SUM(value) * 0.0002 FROM ps)
    ORDER BY value DESC, ps_partkey
    """,
)
def tpch_q11(sf_dir: str):
    """Important stock (TPC-H Q11 shape: HAVING > scalar-subquery
    fraction of the global sum).  No partsupp availqty/supplycost in
    the testdata — shipped quantity per part from one nation's
    suppliers stands in for stock value (integer-valued, so the
    threshold crossing is float-exact), mirrored in the oracle.  The
    global total comes from a Dataset sum (no driver collect of the
    aggregate); the filter streams."""
    rd = _rd()
    from ray.data.aggregate import Sum

    sup = td.read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = td.read(sf_dir, "nation")
    nk7 = {
        int(k) for k, n in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_name").to_pylist())
        if n == "NATION_7"
    }
    sk = np.sort(
        sup.filter(
            pc.is_in(sup.column("s_nationkey"),
                     value_set=pa.array(sorted(nk7) or [-1]))
        ).column("s_suppkey").to_numpy(zero_copy_only=False)
    )

    def partial(t: pa.Table) -> pa.Table:
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(ls), dtype=bool)
        if len(sk):
            ss = np.clip(np.searchsorted(sk, ls), 0, len(sk) - 1)
            keep = sk[ss] == ls
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        u, inv = np.unique(lp, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.float64)
        np.add.at(sums, inv, q)
        return pa.table({"ps_partkey": pa.array(u),
                         "qty_part": pa.array(sums)})

    agg = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ps_partkey")
        .aggregate(Sum("qty_part", alias_name="value"))
        .materialize()  # read twice below: global sum + threshold filter
    )
    empty = pd.DataFrame({"ps_partkey": pd.Series(dtype=np.int64),
                          "value": pd.Series(dtype=np.int64)})
    schema = agg.schema(fetch_if_missing=True)
    if schema is None or "value" not in schema.names:
        return empty  # no qualifying supplier rows at this scale
    total = agg.sum("value") or 0.0
    thresh = total * 0.0002

    def over(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(v > thresh))
        return t.set_column(
            t.schema.get_field_index("value"), "value",
            pa.array(t.column("value").to_numpy(zero_copy_only=False)
                     .astype(np.int64)),
        )

    out = agg.map_batches(over, batch_format="pyarrow").to_pandas()
    if not len(out):
        return empty
    return out.sort_values(["value", "ps_partkey"],
                           ascending=[False, True], kind="stable"
                           ).reset_index(drop=True)[["ps_partkey", "value"]]


@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(sf_dir: str):
    """Supplier count by part attributes (TPC-H Q16 shape: NOT-IN
    anti-filter + COUNT DISTINCT via two groupbys).  lineitem's
    (partkey, suppkey) pairs stand in for partsupp; 'complaint'
    suppliers are the negative-acctbal ones — both mirrored in the
    oracle.  DISTINCT never lands on the driver: dedup groupby on
    (brand, type, size, suppkey), then a count groupby."""
    rd = _rd()
    from ray.data.aggregate import Count

    part = td.read(sf_dir, "part")
    sizes = pa.array([1, 9, 14, 19, 23, 36, 45, 49])
    pmask = pc.and_(
        pc.and_(
            pc.invert(pc.equal(part.column("p_brand"), "Brand#5")),
            pc.invert(pc.starts_with(part.column("p_type"), "PROMO")),
        ),
        pc.is_in(part.column("p_size"), value_set=sizes),
    )
    part = part.filter(pmask)
    po = np.argsort(part.column("p_partkey").to_numpy(zero_copy_only=False))
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)[po]
    pbrand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)[po]
    ptype = np.asarray(part.column("p_type").to_pylist(), dtype=object)[po]
    psize = part.column("p_size").to_numpy(zero_copy_only=False)[po]
    sup = td.read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    bad = np.sort(
        sup.filter(pc.less(sup.column("s_acctbal"), pa.scalar(0.0)))
        .column("s_suppkey").to_numpy(zero_copy_only=False)
    )

    def attrs(t: pa.Table) -> pa.Table:
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(lp), dtype=bool)
        if len(pk):
            pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            keep = pk[pp] == lp
        if len(bad):
            bb = np.clip(np.searchsorted(bad, ls), 0, len(bad) - 1)
            keep &= bad[bb] != ls
        pp = np.clip(np.searchsorted(pk, lp[keep]), 0, max(len(pk) - 1, 0))
        return pa.table({
            "p_brand": pa.array(list(pbrand[pp]), type=pa.string()),
            "p_type": pa.array(list(ptype[pp]), type=pa.string()),
            "p_size": pa.array(psize[pp].astype(np.int64)),
            "l_suppkey": pa.array(ls[keep]),
        })

    out = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_partkey", "l_suppkey"])
        .map_batches(attrs, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_dup"))     # DISTINCT
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .to_pandas()
    )
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="stable",
    ).reset_index(drop=True)[["p_brand", "p_type", "p_size", "supplier_cnt"]]


@register(
    "tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9' AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 20)
    ORDER BY s_name
    """,
)
def tpch_q20(sf_dir: str):
    """Suppliers with excess volume (TPC-H Q20 shape: nested IN over a
    grouped HAVING subquery).  No partsupp availqty — 'shipped more
    than 20 units of some small% part in 1996' stands in for the
    excess-stock predicate, mirrored in the oracle.  The HAVING
    aggregate is a distributed (suppkey, partkey) groupby (integer
    quantities, float-exact threshold); only qualifying suppkeys —
    dimension-sized — reach the driver for the name join."""
    rd = _rd()
    from ray.data.aggregate import Sum

    part = td.read(sf_dir, "part", ["p_partkey", "p_name"])
    pk = np.sort(
        part.filter(pc.starts_with(part.column("p_name"), "small"))
        .column("p_partkey").to_numpy(zero_copy_only=False)
    )
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (sd >= lo) & (sd < hi)
        if len(pk):
            pp = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            keep &= pk[pp] == lp
        else:
            keep &= False
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        key = np.stack([ls, lp[keep]], axis=1)
        u, inv = np.unique(key, axis=0, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.float64)
        np.add.at(sums, inv, q)
        return pa.table({"l_suppkey": pa.array(u[:, 0]),
                         "l_partkey": pa.array(u[:, 1]),
                         "qty_part": pa.array(sums)})

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Sum("qty_part", alias_name="qty"))
    )

    def over(t: pa.Table) -> pa.Table:
        q = t.column("qty").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(q > 20.0)).select(["l_suppkey"])

    win = (
        agg.map_batches(over, batch_format="pyarrow")
        .groupby("l_suppkey").count().to_pandas()  # qualifying suppliers
    )
    sup = td.read(sf_dir, "supplier").to_pandas()
    nat = td.read(sf_dir, "nation")
    nk9 = {
        int(k) for k, n in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_name").to_pylist())
        if n == "NATION_9"
    }
    out = sup[sup["s_nationkey"].isin(nk9)
              & sup["s_suppkey"].isin(set(win["l_suppkey"]))]
    return out.sort_values("s_name", kind="stable").reset_index(drop=True)[
        ["s_name", "s_acctbal"]
    ]


def _q21_broadcast_path(rd, li, sf_dir: str, Count) -> pd.DataFrame:
    """Small-orders q21 plan: F-order dates broadcast as sorted arrays,
    ONE lineitem scan emits per-batch-deduped late (order, supplier)
    pairs, a small distinct groupby finalizes them; the per-order
    supplier counts are computed in a SECOND scan that probes only the
    qualifying (exactly-one-late-supplier) orders.  Zero fact-fact
    exchanges; both scans carry pairs, never lines."""
    orders_t = td.read(sf_dir, "orders",
                       ["o_orderkey", "o_orderdate", "o_orderstatus"])
    f = orders_t.filter(pc.equal(orders_t.column("o_orderstatus"), "F"))
    oo = np.argsort(f.column("o_orderkey").to_numpy(zero_copy_only=False))
    ok = f.column("o_orderkey").to_numpy(zero_copy_only=False)[oo]
    od = f.column("o_orderdate").to_numpy(zero_copy_only=False)[oo]

    def late_pairs(t: pa.Table) -> pa.Table:
        lo = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(lo), dtype=bool)
        if len(ok):
            pos = np.clip(np.searchsorted(ok, lo), 0, len(ok) - 1)
            hit = ok[pos] == lo
            sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
            keep = hit & (sd > od[pos] + np.timedelta64(30, "D"))
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        u = np.unique(np.stack([lo[keep], ls], axis=1), axis=0)
        return pa.table({"l_orderkey": pa.array(u[:, 0]),
                         "l_suppkey": pa.array(u[:, 1])})

    late = (
        li.map_batches(late_pairs, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # late pairs: delta-sized by the 30-day predicate
    )
    if not len(late):
        return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                             "count()": pd.Series(dtype=np.int64)})
    n_late = late.groupby("l_orderkey")["l_suppkey"].transform("size")
    solo = late[n_late == 1]  # orders with EXACTLY one late supplier
    if not len(solo):
        return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                             "count()": pd.Series(dtype=np.int64)})
    qok = np.sort(solo["l_orderkey"].to_numpy(np.int64))

    def pairs_for(t: pa.Table) -> pa.Table:
        lo = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(lo), dtype=bool)
        if len(qok):
            pos = np.clip(np.searchsorted(qok, lo), 0, len(qok) - 1)
            keep = qok[pos] == lo
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        u = np.unique(np.stack([lo[keep], ls], axis=1), axis=0)
        return pa.table({"l_orderkey": pa.array(u[:, 0]),
                         "l_suppkey": pa.array(u[:, 1])})

    qs = (
        li.map_batches(pairs_for, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # suppliers of qualifying-late orders only
    )
    if not len(qs):
        return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                             "count()": pd.Series(dtype=np.int64)})
    n_supp = qs.groupby("l_orderkey")["l_suppkey"].transform("size")
    multi = set(qs.loc[n_supp >= 2, "l_orderkey"])
    win = solo[solo["l_orderkey"].isin(multi)]
    out = win.groupby("l_suppkey", as_index=False).size()
    return out.rename(columns={"size": "count()"})


def _q21_join_path(rd, li, sf_dir: str, Count) -> pd.DataFrame:
    """Large-orders q21 plan: Dataset joins/groupbys keyed on
    l_orderkey end to end (the 100-TB shape — no broadcast of the
    orders fact)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderstatus"])
    fo = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F")),
        batch_format="pyarrow",
    )
    joined = li.join(
        fo, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late_rows(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = sd > od + np.timedelta64(30, "D")
        return t.filter(pa.array(keep)).select(["l_orderkey", "l_suppkey"])

    late = (
        joined.map_batches(late_rows, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))     # DISTINCT pairs
        .materialize()  # reused: pair stream + per-order late counts
    )
    late_cnt = late.groupby("l_orderkey").count()  # -> count()
    supp_cnt = (
        li.groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
        .groupby("l_orderkey").count()
    )
    pairs = late.drop_columns(["_n"]).join(
        late_cnt.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "n_late"]),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("l_orderkey",),
    ).join(
        supp_cnt.map_batches(
            lambda t: t.rename_columns(["l_orderkey", "n_supp"]),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("l_orderkey",),
    )

    def qualify(t: pa.Table) -> pa.Table:
        nl = t.column("n_late").to_numpy(zero_copy_only=False)
        ns = t.column("n_supp").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((nl == 1) & (ns >= 2))).select(["l_suppkey"])

    return (
        pairs.map_batches(qualify, batch_format="pyarrow")
        .groupby("l_suppkey").count().to_pandas()  # supplier-sized
    )


@register(
    "tpch_q21",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    ),
    allsupp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_19'
      AND EXISTS (SELECT 1 FROM allsupp a
                  WHERE a.l_orderkey = l1.l_orderkey
                    AND a.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21(sf_dir: str):
    """Suppliers who kept orders waiting (TPC-H Q21 shape: self-join
    EXISTS / NOT EXISTS over per-order supplier sets).  The testdata
    has no commit/receipt dates — 'shipped > 30 days after ordering'
    on 'F' orders stands in for the late predicate, mirrored in the
    oracle.  The EXISTS pair becomes two per-order counts: a late pair
    qualifies iff its order has ≥ 2 distinct suppliers and EXACTLY 1
    late one.  Shape switch (the re-join discipline — collect
    delta-sized sets, stream corpus-sized ones): below the orders
    broadcast gate, F-order dates ride into ONE lineitem scan as a
    sorted-array probe (q12's discipline — no fact-fact exchange) and
    the late-order qualification probes back in a second scan; above
    it, everything is Dataset joins/groupbys on l_orderkey (one
    partitioning key end to end).  Either way only supplier-sized
    frames reach the driver; the two paths are equality-pinned by
    pytest."""
    import pyarrow.parquet as _pq

    rd = _rd()
    from ray.data.aggregate import Count

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    n_orders = _pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    if n_orders <= _CFG.broadcast_keys_max:
        per_supp = _q21_broadcast_path(rd, li, sf_dir, Count)
    else:
        per_supp = _q21_join_path(rd, li, sf_dir, Count)
    sup = td.read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    nat = td.read(sf_dir, "nation")
    nk = {
        int(k) for k, n in zip(nat.column("n_nationkey").to_pylist(),
                               nat.column("n_name").to_pylist())
        if n == "NATION_19"
    }
    supdf = sup.to_pandas()
    supdf = supdf[supdf["s_nationkey"].isin(nk)]
    out = per_supp.merge(supdf, left_on="l_suppkey", right_on="s_suppkey")
    out = (
        out.groupby("s_name", as_index=False)["count()"].sum()
        .rename(columns={"count()": "numwait"})
    )
    out["numwait"] = out["numwait"].astype(np.int64)
    return out.sort_values(["numwait", "s_name"], ascending=[False, True],
                           kind="stable").reset_index(drop=True)[
        ["s_name", "numwait"]
    ]


@register(
    "events_zscore",
    """
    SELECT event_id,
           ROUND((value - m) / NULLIF(s, 0), 4) AS z
    FROM events JOIN (
      SELECT event_type, AVG(value) AS m, STDDEV_POP(value) AS s
      FROM events GROUP BY event_type
    ) USING (event_type)
    """,
)
def events_zscore(sf_dir: str):
    """Per-type feature standardization (z-score) — the canonical
    two-pass ML-prep normalization: pass 1 reduces the stream to
    per-type (count, sum, sum-of-squares) partials (map-side combine;
    the exchange is types x blocks rows), the tiny moment table
    broadcasts, and pass 2 streams the corpus once scoring every row
    vectorized.  Moments finalize as mean = s1/n and POPULATION std =
    sqrt(s2/n - mean²); scores rounded to 4 decimals on both sides."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def moments(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        enc = pc.dictionary_encode(t.column("event_type").combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "event_type": enc.dictionary,
            "n_part": pa.array(np.bincount(codes, minlength=k)),
            "s1_part": pa.array(np.bincount(codes, weights=v, minlength=k)),
            "s2_part": pa.array(
                np.bincount(codes, weights=v * v, minlength=k)
            ),
        })

    mom = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("s1_part", alias_name="s1"),
            Sum("s2_part", alias_name="s2"),
        )
        .to_pandas()
    )
    mean = (mom["s1"] / mom["n"]).to_numpy(dtype=np.float64)
    var = (mom["s2"] / mom["n"]).to_numpy(dtype=np.float64) - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    types = pa.array(mom["event_type"].to_numpy(dtype=object),
                     type=pa.string())

    def score(t: pa.Table) -> pa.Table:
        pos = pc.index_in(t.column("event_type"), value_set=types).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        m, s = mean[pos], std[pos]
        v = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        z = np.where(s == 0, np.nan, (v - m) / np.where(s == 0, 1.0, s))
        return pa.table({
            "event_id": t.column("event_id"),
            "z": pa.array(_round(z, 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(score, batch_format="pyarrow")


@register(
    "raster_pyramid",
    "WITH " + td.SQL_PAGES.strip()
    + """
    , base AS (
      SELECT CAST(FLOOR((lon + 180.0) / 0.625) AS BIGINT) AS gx,
             CAST(FLOOR((lat + 90.0) / 0.625) AS BIGINT) AS gy,
             COUNT(*) AS n
      FROM pages GROUP BY 1, 2
    )
    SELECT CAST(0 AS BIGINT) AS zoom, gx, gy,
           CAST(SUM(n) AS BIGINT) AS n_pages
    FROM base GROUP BY gx, gy
    UNION ALL
    SELECT 1, gx // 2 AS gx, gy // 2 AS gy, CAST(SUM(n) AS BIGINT)
    FROM base GROUP BY 2, 3
    UNION ALL
    SELECT 2, gx // 4 AS gx, gy // 4 AS gy, CAST(SUM(n) AS BIGINT)
    FROM base GROUP BY 2, 3
    """,
)
def raster_pyramid(sf_dir: str):
    """Raster ZOOM PYRAMID (north_rule raster<->vector, the tiled-map
    shape): three zoom levels of page-count rollups derived from the
    BASE raster — the corpus is scanned once for level 0 and every
    coarser level aggregates the (tiny) level below, never the pages.
    Each base cell fans out to one row per zoom (gx >> z), one
    cell-count-sized groupby merges the pyramid."""
    from ray.data.aggregate import Sum

    base = tile_raster(sf_dir)

    def fan(t: pa.Table) -> pa.Table:
        gx = t.column("gx").to_numpy(zero_copy_only=False).astype(np.int64)
        gy = t.column("gy").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n_pages").to_numpy(zero_copy_only=False).astype(np.int64)
        zooms = []
        for z in (0, 1, 2):
            zooms.append(pa.Table.from_pydict(
                {"zoom": np.full(len(gx), z, dtype=np.int64),
                 "gx": gx >> z, "gy": gy >> z, "n_part": n}
            ))
        return pa.concat_tables(zooms)

    return (
        base.map_batches(fan, batch_format="pyarrow")
        .groupby(["zoom", "gx", "gy"])
        .aggregate(Sum("n_part", alias_name="n_pages"))
    )


@register(
    "audio_meta",
    """
    SELECT doc_id, 'wav' AS format,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS BIGINT)
             AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST((1600 + (doc_id % 5) * 400) * 1000
                / (CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END)
                AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def audio_meta_q(sf_dir: str):
    """RIFF/WAV container metadata extraction (the audio sibling of
    `image_meta`): documents become REAL PCM WAV containers (samples
    derived from the text bytes, rate/length a deterministic function
    of doc_id) and `functions/media.py::audio_meta` walks the chunk
    list back out of the ENCODED BYTES — fmt rate/channels/width plus
    duration from the data chunk length, no sample decode.  The oracle
    checks the encode→parse round trip against the formulas."""
    from .functions import media as mediafn

    rd = _rd()

    def to_meta(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        fmts, rates, chans, durs = [], [], [], []
        for i, txt in zip(did, texts):
            rate = 16000 if i % 2 == 0 else 8000
            n = 1600 + int(i % 5) * 400
            buf = np.frombuffer(txt.encode(), dtype=np.uint8)
            samples = (
                np.resize(buf, n).astype(np.int16) - 128
            ) * 200  # deterministic int16 payload
            f, r, c, d = mediafn.audio_meta(mediafn.encode_wav(samples, rate))
            fmts.append(f), rates.append(r), chans.append(c), durs.append(d)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(did), "format": pa.array(fmts),
             "sample_rate": pa.array(rates, type=pa.int64()),
             "n_channels": pa.array(chans, type=pa.int64()),
             "duration_ms": pa.array(durs, type=pa.int64())}
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_meta, batch_format="pyarrow")


@register(
    "doc_embedding_join",
    """
    SELECT d.doc_id, d.lang,
           ROUND(SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[]))), 4)
             AS norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def doc_embedding_join(sf_dir: str):
    """Plain two-table equi-join through Ray's hash join (documents ⋈
    embeddings on id) — the general join path for two corpus-sized
    sides where neither broadcasts (the battery's other joins are
    broadcast-probe or dimension joins by design).  The vector norm is
    computed BEFORE the join (project-early: the shuffle moves one
    float per row, not the embedding — also required, as Ray's hash
    join does not carry list-typed payload columns)."""
    rd = _rd()
    from .stages.similarity import _stack

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def pre_norm(t: pa.Table) -> pa.Table:
        X = _stack(t, "embedding")
        return pa.Table.from_pydict(
            {"doc_id": t.column("vec_id"),
             "norm": _round(np.sqrt((X * X).sum(axis=1)), 4)}
        )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(pre_norm, batch_format="pyarrow")
    return docs.join(emb, join_type="inner", num_partitions=4, on=("doc_id",))


# ===========================================================================
# Corpus-hygiene operators: PII redaction, paragraph-level dedup,
# benchmark-contamination screening (round 4)
# ===========================================================================
@register(
    "pii_redact",
    r"""
    WITH pii AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@ex-' || CAST(doc_id % 7 AS VARCHAR)
                  || '.net call +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                  || '.7' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9_.]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(t,
             '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9_.]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
             '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
    FROM pii
    """,
)
def pii_redact(sf_dir: str):
    """PII scrubbing over the corpus: count and redact emails / phone
    numbers / IPv4 addresses with RE2 in one vectorized pass (the
    pre-tokenization hygiene step of a crawl pipeline).  The synthetic
    corpus carries no PII, so a deterministic doc-seeded contact line
    is appended first on BOTH sides (the doc-seeded-payload discipline
    the multimodal battery rows use) — the oracle then checks the
    redaction kernel itself, not the generator.  Both engines run RE2
    (pyarrow's replace_substring_regex and DuckDB's regexp_replace),
    so match semantics are identical by construction.  Embarrassingly
    parallel: no shuffle, pruned read, compiled-once patterns."""
    rd = _rd()
    EMAIL = r"[A-Za-z0-9_.]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"\+1-555-[0-9]{4}"
    IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

    def k(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        idn = ids.to_numpy(zero_copy_only=False).astype(np.int64)

        def istr(x: np.ndarray) -> pa.Array:
            return pc.cast(pa.array(x), pa.string())

        full = pc.binary_join_element_wise(
            t.column("text"),
            pa.scalar(" contact user"), istr(idn),
            pa.scalar("@ex-"), istr(idn % 7),
            pa.scalar(".net call +1-555-"),
            pc.utf8_lpad(istr(idn % 10000), 4, padding="0"),
            pa.scalar(" ip 10."), istr(idn % 256),
            pa.scalar("."), istr((idn // 256) % 256),
            pa.scalar(".7"),
            pa.scalar(""),  # separator
        )
        red = pc.replace_substring_regex(full, pattern=EMAIL,
                                         replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=PHONE,
                                         replacement="<PHONE>")
        red = pc.replace_substring_regex(red, pattern=IP,
                                         replacement="<IP>")
        return pa.table({
            "doc_id": ids,
            "n_emails": pc.cast(pc.count_substring_regex(full, EMAIL),
                                pa.int64()),
            "n_phones": pc.cast(pc.count_substring_regex(full, PHONE),
                                pa.int64()),
            "n_ips": pc.cast(pc.count_substring_regex(full, IP), pa.int64()),
            "redacted": red,
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow")


@register(
    "paragraph_dedup",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord
      FROM toks
    ), chunks AS (
      SELECT doc_id, CAST((ord - 1) // 16 AS BIGINT) AS chunk_idx,
             string_agg(tok, ' ' ORDER BY ord) AS chunk
      FROM words GROUP BY doc_id, chunk_idx
    ), flagged AS (
      SELECT doc_id, chunk_idx, chunk,
             doc_id * 1048576 + chunk_idx =
               MIN(doc_id * 1048576 + chunk_idx) OVER (PARTITION BY chunk)
               AS keep
      FROM chunks
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN keep THEN chunk END, ' '
                               ORDER BY chunk_idx), '') AS text,
           CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
    FROM flagged GROUP BY doc_id
    """,
)
def paragraph_dedup(sf_dir: str):
    """Paragraph-level (passage-level) exact dedup a la Lee et al.
    "Deduplicating Training Data Makes Language Models Better": split
    every doc into fixed 16-word passages (the single-space synthetic
    corpus has no newlines, so fixed windows stand in for paragraphs),
    keep only the globally FIRST occurrence of each passage (min by
    (doc_id, chunk_idx)), and re-emit each doc with its duplicated
    passages removed.

    Distributed shape: (1) vectorized chunking inside map_batches
    (split -> rebuilt list offsets -> pc.binary_join, no Python
    per-row loop); (2) one groupby(chunk).min(pos) exchange — the
    aggregate's OUTPUT is exactly the kept set, so no join-back is
    needed (pos encodes (doc_id << 20) | chunk_idx); (3) winners union
    per-doc totals re-bucketed by doc_id range and reconstructed
    vectorized (np.lexsort + list-offset binary_join per bucket).  At
    100 TB the chunk exchange would carry a 128-bit chunk hash instead
    of the text with a pruned re-read for multi-member groups,
    mirroring stages/dedup_docs.exact_drop_ids."""
    rd = _rd()
    from ray.data.aggregate import Min

    C, SHIFT, SPAN = 16, 20, 4096

    def chunkify(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(text, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        L = off[1:] - off[:-1]
        nch = (L + C - 1) // C  # >= 1: split('') == ['']
        tot = int(nch.sum())
        excl = np.concatenate([[0], np.cumsum(nch)[:-1]])
        within = np.arange(tot) - np.repeat(excl, nch)
        starts = np.repeat(off[:-1], nch) + C * within
        bounds = np.concatenate([starts, off[-1:]])
        cl = pa.ListArray.from_arrays(
            pa.array(bounds, type=pa.int32()), lists.values
        )
        pos = (np.repeat(ids, nch) << SHIFT) + within
        return pa.table({
            "chunk": pc.binary_join(cl, " "),
            "pos": pa.array(pos),
        })

    def totals(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.list_value_length(
            pc.split_pattern(t.column("text").combine_chunks(), " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array(ids // SPAN),
            "doc_id": pa.array(ids),
            "chunk_idx": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "chunk": pa.array([""] * len(ids), type=pa.string()),
            "n_chunks": pa.array((n + C - 1) // C),
        })

    def decode_winners(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        did = pos >> SHIFT
        return pa.table({
            "part": pa.array(did // SPAN),
            "doc_id": pa.array(did),
            "chunk_idx": pa.array(pos & ((1 << SHIFT) - 1)),
            "chunk": t.column("chunk"),
            "n_chunks": pa.array(np.zeros(len(pos), dtype=np.int64)),
        })

    def reconstruct(g: pa.Table) -> pa.Table:
        is_tot = g.column("chunk_idx").to_numpy(zero_copy_only=False) < 0
        tot = g.filter(pa.array(is_tot))
        win = g.filter(pa.array(~is_tot))
        tdoc = tot.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tord = np.argsort(tdoc, kind="stable")
        tdoc = tdoc[tord]
        tn = tot.column("n_chunks").to_numpy(zero_copy_only=False)[tord]
        wdoc = win.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        widx = win.column("chunk_idx").to_numpy(zero_copy_only=False)
        word = np.lexsort((widx, wdoc))
        wdoc, widx = wdoc[word], widx[word]
        chunks = win.column("chunk").combine_chunks().take(pa.array(word))
        # kept chunks per totals-doc, then list offsets into the sorted wins
        kept = np.searchsorted(wdoc, tdoc, side="right") - np.searchsorted(
            wdoc, tdoc, side="left"
        )
        bounds = np.concatenate([[0], np.cumsum(kept)]).astype(np.int32)
        dl = pa.ListArray.from_arrays(pa.array(bounds), chunks)
        return pa.table({
            "doc_id": pa.array(tdoc),
            "text": pc.binary_join(dl, " "),
            "n_dropped": pa.array(tn - kept),
        })

    read = lambda: rd.read_parquet(  # noqa: E731
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    winners = (
        read()
        .map_batches(chunkify, batch_format="pyarrow")
        .groupby("chunk")
        .aggregate(Min("pos", alias_name="pos"))
        .map_batches(decode_winners, batch_format="pyarrow")
    )
    tot_ds = read().map_batches(totals, batch_format="pyarrow")
    return (
        winners.union(tot_ds)
        .groupby("part")
        .map_groups(reconstruct, batch_format="pyarrow")
    )


@register(
    "contamination_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord, len(w) AS n
      FROM toks
    ), grams AS (
      SELECT doc_id,
             string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY ord
               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS gram
      FROM words QUALIFY ord + 7 <= n
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 31 = 0
    ), hits AS (
      SELECT g.doc_id, COUNT(*) AS c
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 31 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(h.c, 0) AS BIGINT) AS n_contam,
           COALESCE(h.c, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 31 <> 0
    """,
)
def contamination_ngrams(sf_dir: str):
    """Benchmark-contamination screening: flag training docs whose text
    shares any 8-token n-gram with a held-out benchmark set (the
    decontamination step of every LLM data pipeline; 8-13-gram overlap
    is the published GPT-3/PaLM recipe).  The "benchmark" is the
    deterministic doc_id % 31 == 0 slice of the corpus.

    Distributed shape: the benchmark side is SMALL by definition
    (eval sets are thousands of docs, not billions), so its distinct
    8-gram set is built once and broadcast via ray.put; the corpus
    side streams through one map_batches that forms all token 8-grams
    vectorized (8 shifted takes of the flattened word values joined by
    pc.binary_join_element_wise — gram windows overlap, so shifted
    takes, not list offsets) and probes membership with Arrow's C
    hash-set pc.is_in.  No shuffle at all on the 100-TB side.  At
    scale the broadcast would carry 64-bit gram fingerprints instead
    of strings (same shape, smaller payload)."""
    rd = _rd()
    import ray

    N = 8

    def grams_of(t: pa.Table):
        """(doc_ids int64[], n_grams-per-doc int64[], grams pa.Array)."""
        text = t.column("text").combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(text, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        L = off[1:] - off[:-1]
        ng = np.maximum(L - (N - 1), 0)
        tot = int(ng.sum())
        if tot == 0:
            return ids, ng, pa.array([], type=pa.string())
        excl = np.concatenate([[0], np.cumsum(ng)[:-1]])
        starts = np.repeat(off[:-1], ng) + (np.arange(tot) - np.repeat(excl, ng))
        V = lists.values
        parts = [V.take(pa.array(starts + k)) for k in range(N)]
        return ids, ng, pc.binary_join_element_wise(*parts, pa.scalar(" "))

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % 31 == 0))
        _, _, g = grams_of(t)
        return pa.table({"gram": pc.unique(g)})

    # the benchmark slice streams through workers (the driver never
    # holds the corpus); only its per-batch-unique grams collect here
    parts = [
        b.column("gram").combine_chunks()
        for b in rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(bench_grams, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    bref = ray.put(pc.unique(pa.concat_arrays(parts)) if parts
                   else pa.array([], type=pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        bench = ray.get(bref)
        ids, ng, grams = grams_of(t)
        hit = pc.is_in(grams, value_set=bench).to_numpy(zero_copy_only=False)
        counts = np.zeros(len(ids), dtype=np.int64)
        np.add.at(counts, np.repeat(np.arange(len(ids)), ng), hit)
        keep = ids % 31 != 0
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_contam": pa.array(counts[keep]),
            "contaminated": pa.array(counts[keep] > 0),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(probe, batch_format="pyarrow")


_SPAN_N, _SPAN_PART = 16, 4096


def _dup_window_hits(rd, sf_dir: str):
    """(part, doc_id, s) rows for every 16-token window whose text
    occurs >= 2x in the corpus — the shared core of duplicate_spans
    and remove_duplicate_spans (scale notes on duplicate_spans)."""
    import ray
    from ray.data.aggregate import Count

    N, SPAN = _SPAN_N, _SPAN_PART

    def windows(t: pa.Table) -> pa.Table:
        text = t.column("text").combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(text, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ng = np.maximum(off[1:] - off[:-1] - (N - 1), 0)
        tot = int(ng.sum())
        if tot == 0:
            return pa.table({
                "gram": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
            })
        excl = np.concatenate([[0], np.cumsum(ng)[:-1]])
        within = np.arange(tot) - np.repeat(excl, ng)
        starts = np.repeat(off[:-1], ng) + within
        V = lists.values
        parts = [V.take(pa.array(starts + k)) for k in range(N)]
        return pa.table({
            "gram": pc.binary_join_element_wise(*parts, pa.scalar(" ")),
            "doc_id": pa.array(np.repeat(ids, ng)),
            "s": pa.array(within),
        })

    grams = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(windows, batch_format="pyarrow")

    def only_dups(t: pa.Table) -> pa.Table:
        # empty aggregate partitions emit schema-less blocks; normalize
        if "c" not in t.column_names:
            return pa.table({"gram": pa.array([], type=pa.string())})
        return t.filter(pc.greater_equal(t.column("c"), 2)).select(["gram"])

    dup = (
        grams.groupby("gram")
        .aggregate(Count(alias_name="c"))
        .map_batches(only_dups, batch_format="pyarrow")
    )
    # Broadcast-probe gate (house shape, see exact_drop_ids): the
    # duplicated-window VOCABULARY is small relative to the corpus, so
    # collect-and-broadcast it up to a cap; above the cap fall back to
    # the hash semi-join (whose partitions are then dense).
    DUP_BROADCAST_LIMIT = _CFG.broadcast_keys_max
    dup_parts, n_dup = [], 0
    for b in dup.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            dup_parts.append(b.column("gram").combine_chunks())
            n_dup += b.num_rows
        if n_dup > DUP_BROADCAST_LIMIT:
            break
    if n_dup > DUP_BROADCAST_LIMIT:
        hits = grams.join(
            dup, join_type="left_semi", num_partitions=64, on=("gram",)
        ).map_batches(
            lambda t: t.drop_columns(["gram"]), batch_format="pyarrow"
        )
    else:
        vset = (pa.concat_arrays([p.combine_chunks() if isinstance(
            p, pa.ChunkedArray) else p for p in dup_parts])
            if dup_parts else pa.array([], type=pa.string()))
        vref = ray.put(vset)

        def semi(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column("gram"), value_set=ray.get(vref))
            return t.filter(m).drop_columns(["gram"])

        hits = grams.map_batches(semi, batch_format="pyarrow")
    return hits.map_batches(
        lambda t: t.append_column(
            "part",
            pc.cast(
                pc.divide(t.column("doc_id"), pa.scalar(SPAN, pa.int64())),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    )


@register(
    "duplicate_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord, len(w) AS n
      FROM toks
    ), grams AS (
      SELECT doc_id, ord,
             string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY ord
               ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS gram
      FROM words QUALIFY ord + 15 <= n
    ), dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.ord - 1 AS s FROM grams g JOIN dup USING (gram)
    ), isl AS (
      SELECT doc_id, s,
             CASE WHEN s > COALESCE(MAX(s + 15) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS brk
      FROM hits
    ), grp AS (
      SELECT doc_id, s,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM isl
    )
    SELECT doc_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(s) + 15 AS BIGINT) AS span_end,
           CAST(MAX(s) + 16 - MIN(s) AS BIGINT) AS n_tokens
    FROM grp GROUP BY doc_id, gid
    """,
)
def duplicate_spans(sf_dir: str):
    """Exact substring-level dedup a la Lee et al.: find every MAXIMAL
    token span of length >= 16 whose every 16-token window occurs at
    least twice in the corpus (the spans ExactSubstr would cut before
    training).  Published pipelines build a distributed suffix array;
    the equivalent window formulation — duplicated fixed-size windows
    merged into maximal spans — is shuffle-friendly and exact for
    spans >= the window length.

    Distributed shape: (1) the vectorized shifted-take n-gram kernel
    (one row per 16-token window); (2) groupby(gram).count keeps only
    windows seen >= 2x; (3) hash-join window positions back on the
    gram key; (4) per-doc interval merge (gaps-and-islands) vectorized
    inside doc-range buckets: np.maximum.accumulate for the running
    span end, reduceat for island bounds.  At 100 TB both gram
    exchanges would carry a 64-bit rolling fingerprint instead of the
    window text (hash-carry, as stages/dedup_docs.exact_drop_ids), and
    the join becomes int-keyed."""
    rd = _rd()
    N = _SPAN_N

    def merge_spans(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = g.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, did))
        did, s = did[order], s[order]
        # per-doc running max span end WITHOUT a Python segment loop:
        # key = did * OFF + end is monotone in doc id, so the global
        # cummax within a doc always comes from that same doc
        OFF = np.int64(1) << 32  # pos < 2^32 tokens/doc, doc_id < 2^31
        cm = np.maximum.accumulate(did * OFF + (s + N - 1))
        prev_end = cm - did * OFF  # valid where the cummax is same-doc
        brk = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            same = did[1:] == did[:-1]
            brk[1:] = ~same | (s[1:] > prev_end[:-1] + 1)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(s))
        span_start = s[starts]
        # s is sorted within a doc, so the island max is its last member
        span_end = s[ends - 1] + N - 1
        return pa.table({
            "doc_id": pa.array(did[starts]),
            "span_start": pa.array(span_start),
            "span_end": pa.array(span_end),
            "n_tokens": pa.array(span_end - span_start + 1),
        })

    return (
        _dup_window_hits(rd, sf_dir)
        .groupby("part")
        .map_groups(merge_spans, batch_format="pyarrow")
    )


@register(
    "remove_duplicate_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord, len(w) AS n
      FROM toks
    ), grams AS (
      SELECT doc_id, ord,
             string_agg(tok, ' ') OVER (PARTITION BY doc_id ORDER BY ord
               ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS gram
      FROM words QUALIFY ord + 15 <= n
    ), dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.ord - 1 AS s FROM grams g JOIN dup USING (gram)
    ), kept AS (
      SELECT w.doc_id, w.tok, w.ord
      FROM words w
      WHERE NOT EXISTS (SELECT 1 FROM hits h
                        WHERE h.doc_id = w.doc_id
                          AND w.ord - 1 BETWEEN h.s AND h.s + 15)
    )
    SELECT d.doc_id,
           COALESCE(k.text, '') AS text,
           CAST(len(string_split(d.text, ' ')) - COALESCE(k.nk, 0) AS BIGINT)
             AS n_removed
    FROM documents d LEFT JOIN (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY ord) AS text,
             COUNT(*) AS nk
      FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """,
)
def remove_duplicate_spans(sf_dir: str):
    """The full ExactSubstr CUT: re-emit every doc with all tokens
    covered by a duplicated >= 16-token window removed (what
    duplicate_spans locates, this deletes — the output a training run
    would consume).  Shares :func:`_dup_window_hits`; the cut itself
    is one extra doc-range-bucketed exchange where coverage is a
    difference array (+1 at window start, -1 past its end, cumsum > 0
    = covered) over the bucket's concatenated token stream — fully
    vectorized, overlap-safe, no per-token Python."""
    rd = _rd()
    N, SPAN = _SPAN_N, _SPAN_PART

    hits = _dup_window_hits(rd, sf_dir).map_batches(
        lambda t: t.append_column(
            "text", pa.array([""] * t.num_rows, type=pa.string())
        ),
        batch_format="pyarrow",
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "s": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "part": pa.array(ids // SPAN),
            "text": t.column("text"),
        })

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(doc_rows, batch_format="pyarrow")

    def cut(g: pa.Table) -> pa.Table:
        sval = g.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        is_doc = sval < 0
        dt = g.filter(pa.array(is_doc))
        ht = g.filter(pa.array(~is_doc))
        ids = dt.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        text = dt.column("text").combine_chunks().take(pa.array(order))
        lists = pc.split_pattern(text, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        L = off[1:] - off[:-1]
        hdoc = ht.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hs = ht.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        di = np.searchsorted(ids, hdoc)  # ids unique & sorted
        total = int(off[-1])
        cover = np.zeros(total + 1, dtype=np.int64)
        np.add.at(cover, off[di] + hs, 1)
        np.add.at(cover, off[di] + hs + N, -1)
        covered = np.cumsum(cover[:-1]) > 0
        keep = ~covered
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), off[:-1])
        kept_per_doc[L == 0] = 0  # reduceat artifact on empty segments
        newV = lists.values.filter(pa.array(keep))
        bounds = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        dl = pa.ListArray.from_arrays(pa.array(bounds), newV)
        return pa.table({
            "doc_id": pa.array(ids),
            "text": pc.binary_join(dl, " "),
            "n_removed": pa.array(L - kept_per_doc),
        })

    return (
        hits.union(docs)
        .groupby("part")
        .map_groups(cut, batch_format="pyarrow")
    )


@register(
    "quality_filter_quantile",
    """
    WITH thr AS (
      SELECT lang, quantile_disc(LENGTH(text), 0.25) AS t
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, CAST(LENGTH(d.text) AS BIGINT) AS n_chars
    FROM documents d JOIN thr USING (lang)
    WHERE LENGTH(d.text) > t
    """,
)
def quality_filter_quantile(sf_dir: str):
    """Per-language quantile quality cut: drop every doc at or below
    its language's 25th-percentile length (the per-domain percentile
    pruning step of quality filtering; length stands in for the model
    score).  The threshold is the DISCRETE quantile — an integer from
    the data — so the strict > comparison is exact by construction (no
    interpolated-float ulp risk).

    Distributed shape: pass 1 is the exact histogram quantile of
    doc_length_quantiles (exchange = one row per distinct
    (lang, length), never the corpus); the per-lang integer thresholds
    broadcast via ray.put; pass 2 is a shuffle-free filter with an
    Arrow index_in lookup.  DuckDB's quantile_disc picks the first
    value whose cumulative fraction reaches q (index ceil(n*q)-1);
    the histogram mirror reads the same element off the cumsum."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()
    Q = 0.25

    def lengths(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "lang": t.column("lang"),
            "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
        })

    hist = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
        .map_batches(lengths, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    langs, thrs = [], []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars")
        x = g["n_chars"].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy())
        n = int(cum[-1])
        k = int(np.ceil(n * Q))  # first cum count reaching q
        langs.append(lang)
        thrs.append(int(x[np.searchsorted(cum, max(k, 1))]))
    lset = pa.array(langs, type=pa.string())
    tarr = np.asarray(thrs, dtype=np.int64)
    ref = ray.put((lset, tarr))

    def keep(t: pa.Table) -> pa.Table:
        ls, th = ray.get(ref)
        n_chars = pc.utf8_length(t.column("text")).cast(pa.int64())
        idx = pc.index_in(t.column("lang"), value_set=ls).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        thr_row = th[idx]
        mask = n_chars.to_numpy(zero_copy_only=False) > thr_row
        out = pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "n_chars": n_chars,
        })
        return out.filter(pa.array(mask))

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).map_batches(keep, batch_format="pyarrow")


def _bigram_pairs_of(t: pa.Table):
    """(doc_ids, n_bigrams_per_doc, pair_keys, first_tokens) for a
    (doc_id, text) batch — the shared vectorized bigram extractor
    (shifted-take over the split-list values buffer, one
    binary_join_element_wise; no per-row Python)."""
    text = t.column("text").combine_chunks()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lists = pc.split_pattern(text, " ")
    off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nb = np.maximum(off[1:] - off[:-1] - 1, 0)
    tot = int(nb.sum())
    if tot == 0:
        e = pa.array([], type=pa.string())
        return ids, nb, e, e
    excl = np.concatenate([[0], np.cumsum(nb)[:-1]])
    starts = np.repeat(off[:-1], nb) + (np.arange(tot) - np.repeat(excl, nb))
    V = lists.values
    a = V.take(pa.array(starts))
    b = V.take(pa.array(starts + 1))
    return ids, nb, pc.binary_join_element_wise(a, b, pa.scalar(" ")), a


@register(
    "doc_bigram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord
      FROM toks
    ), big AS (
      SELECT doc_id, tok,
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt
      FROM words
    ), bc AS (
      SELECT tok, nxt, COUNT(*) AS c FROM big
      WHERE nxt IS NOT NULL GROUP BY tok, nxt
    ), uc AS (
      SELECT tok, COUNT(*) AS u FROM big
      WHERE nxt IS NOT NULL GROUP BY tok
    ), v AS (
      SELECT COUNT(DISTINCT tok) AS vs FROM words
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(LN((bc.c + 1.0) / (uc.u + v.vs))) / COUNT(*), 4)
             AS bigram_lp
    FROM big b
    JOIN bc ON b.tok = bc.tok AND b.nxt = bc.nxt
    JOIN uc ON b.tok = uc.tok, v
    WHERE b.nxt IS NOT NULL
    GROUP BY b.doc_id
    """,
)
def doc_bigram_lm_score(sf_dir: str):
    """Second-order LM quality score: mean add-1-smoothed bigram log
    probability per doc, the companion of the unigram `doc_lm_score`
    (perplexity-style filtering with context).

    Distributed shape: pass 1 is ONE map-side-combined exchange
    carrying per-batch (key, count) partials for bigrams AND unigram
    contexts together (pair keys contain a space, token keys cannot —
    no collision); the model (bigram-vocabulary-sized, not corpus-
    sized) broadcasts via ray.put.  Pass 2 streams the corpus through
    a shuffle-free scorer: shifted-take pair keys, one Arrow index_in
    hash probe per table, segment-summed per doc.  Docs with fewer
    than 2 tokens have no bigrams and are excluded on both sides."""
    import ray
    from ray.data.aggregate import Sum

    rd = _rd()
    pairs_of = _bigram_pairs_of

    def partial(t: pa.Table) -> pa.Table:
        _, _, pairs, _ = pairs_of(t)
        toks = pc.list_flatten(
            pc.split_pattern(t.column("text").combine_chunks(), " ")
        )
        out_k, out_c = [], []
        for arr in (pairs, toks):
            vc = pc.value_counts(arr)
            out_k.append(vc.field("values"))
            out_c.append(vc.field("counts").cast(pa.int64()))
        return pa.table({
            "key": pa.concat_arrays([k.combine_chunks() if isinstance(
                k, pa.ChunkedArray) else k for k in out_k]),
            "cnt": pa.concat_arrays([c.combine_chunks() if isinstance(
                c, pa.ChunkedArray) else c for c in out_c]),
        })

    model = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    keys = model["key"].to_numpy(dtype=object)
    cnts = model["n"].to_numpy(dtype=np.int64)
    is_pair = np.array([" " in k for k in keys])
    bk, bc_ = keys[is_pair], cnts[is_pair]
    # context counts = sum of bigram counts per first token (matches
    # the SQL's uc: occurrences as a bigram context, not raw unigrams)
    firsts = np.array([k.split(" ", 1)[0] for k in bk], dtype=object)
    uk, inv = np.unique(firsts, return_inverse=True)
    uc_ = np.zeros(len(uk), dtype=np.int64)
    np.add.at(uc_, inv, bc_)
    vs = int((~is_pair).sum())  # distinct tokens over ALL words
    bref = ray.put((
        pa.array(bk, type=pa.string()), bc_,
        pa.array(uk, type=pa.string()), uc_, vs,
    ))

    def score(t: pa.Table) -> pa.Table:
        bkA, bcA, ukA, ucA, V = ray.get(bref)
        ids, nb, pairs, firsts_a = pairs_of(t)
        keep = nb > 0
        if not keep.any():
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_bigrams": pa.array([], type=pa.int64()),
                "bigram_lp": pa.array([], type=pa.float64()),
            })
        bi = pc.index_in(pairs, value_set=bkA).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ui = pc.index_in(firsts_a, value_set=ukA).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lp = np.log((bcA[bi] + 1.0) / (ucA[ui] + V))
        sums = np.zeros(len(ids), dtype=np.float64)
        np.add.at(sums, np.repeat(np.arange(len(ids)), nb), lp)
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_bigrams": pa.array(nb[keep]),
            "bigram_lp": pa.array(_round(sums[keep] / nb[keep], 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(score, batch_format="pyarrow")


@register(
    "gopher_quality_filter",
    """
    WITH w AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (SELECT doc_id, word, COUNT(*) AS k FROM w GROUP BY doc_id, word),
    agg AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS n_words,
             CAST(SUM(CASE WHEN word IN ('the', 'a') THEN k ELSE 0 END)
                  AS BIGINT) AS stopword_count,
             MAX(k) AS top_k
      FROM c GROUP BY doc_id
    ),
    f AS (
      SELECT d.doc_id, agg.n_words,
             LENGTH(REPLACE(d.text, ' ', ''))
               / CAST(agg.n_words AS DOUBLE) AS mwl,
             agg.stopword_count,
             agg.top_k / CAST(agg.n_words AS DOUBLE) AS twf
      FROM documents d JOIN agg USING (doc_id)
    )
    SELECT doc_id, n_words,
           ROUND(mwl, 4) AS mean_word_len,
           stopword_count,
           ROUND(twf, 4) AS top_word_frac,
           CAST(CASE WHEN n_words BETWEEN 30 AND 90
                      AND mwl >= 3.8 AND mwl <= 4.8
                      AND stopword_count >= 2
                      AND twf <= 0.15
                THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM f
    """,
)
def gopher_quality_filter(sf_dir: str):
    """Composite Gopher-rule document filter (Rae et al. 2021, table A1
    adapted to the single-space synthetic corpus): word-count bounds,
    mean-word-length bounds, minimum stopword evidence, and a
    top-word-concentration cap, emitted as per-doc features plus the
    0/1 verdict.  Thresholds were swept across all three sf tiers so
    every rule fires non-trivially at every tier (NOTES round-4
    discipline).

    Exactness: every feature is an exact-integer ratio (segment sums /
    word counts), so the float comparisons against the rule constants
    are bit-identical between numpy and DuckDB.  Distributed shape:
    embarrassingly parallel — one pruned read, one pyarrow pass per
    batch (split -> flattened word values; per-doc reductions via
    np.add/maximum.reduceat and one np.unique over (doc, word-code)
    pairs — no per-row Python, no shuffle)."""
    rd = _rd()
    STOP = pa.array(["the", "a"], type=pa.string())

    def k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                "mean_word_len": pa.array([], type=pa.float64()),
                "stopword_count": pa.array([], type=pa.int64()),
                "top_word_frac": pa.array([], type=pa.float64()),
                "passes": pa.array([], type=pa.int64()),
            })
        text = t.column("text").combine_chunks()
        lists = pc.split_pattern(text, " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        L = off[1:] - off[:-1]  # words per doc (>= 1: split('') == [''])
        vals = lists.values
        wlen = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nonspace = np.add.reduceat(wlen, off[:-1])
        sw = pc.is_in(vals, value_set=STOP).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sw_count = np.add.reduceat(sw, off[:-1])
        codes = pc.dictionary_encode(vals).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vocab = int(codes.max()) + 1
        didx = np.repeat(np.arange(len(L), dtype=np.int64), L)
        uk, counts = np.unique(didx * vocab + codes, return_counts=True)
        gdoc = uk // vocab
        starts = np.concatenate([[0], np.flatnonzero(np.diff(gdoc)) + 1])
        top = np.maximum.reduceat(counts, starts)  # L >= 1 => all docs
        nw = L.astype(np.float64)
        mwl = nonspace / nw
        twf = top / nw
        ok = (
            (L >= 30) & (L <= 90)
            & (mwl >= 3.8) & (mwl <= 4.8)
            & (sw_count >= 2)
            & (twf <= 0.15)
        )
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_words": pa.array(L),
            "mean_word_len": pa.array(_round(mwl, 4)),
            "stopword_count": pa.array(sw_count),
            "top_word_frac": pa.array(_round(twf, 4)),
            "passes": pa.array(ok.astype(np.int64)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(k, batch_format="pyarrow")


@register(
    "line_dedup_ccnet",
    """
    WITH aug AS (
      SELECT doc_id, source,
             text
               || chr(10) || 'copyright ' || source || ' all rights reserved'
               || chr(10) || 'contact admin at ' || source
                          || ' dot example dot com'
               || chr(10) || 'promo code ' || CAST(doc_id % 5 AS VARCHAR)
                          || ' of ' || source
               || chr(10) || 'ref id ' || CAST(doc_id % 97 AS VARCHAR)
                          || ' of ' || source AS t
      FROM documents
    ),
    ls AS (
      SELECT doc_id, source, string_split(t, chr(10)) AS l FROM aug
    ),
    lines AS (
      SELECT doc_id, source, UNNEST(l) AS line,
             UNNEST(range(1, len(l) + 1)) AS ord
      FROM ls
    ),
    cnt AS (
      SELECT source, line, COUNT(DISTINCT doc_id) AS ndocs
      FROM lines GROUP BY source, line
    ),
    flagged AS (
      SELECT l.doc_id, l.ord, l.line, c.ndocs < 3 AS keep
      FROM lines l JOIN cnt c ON l.source = c.source AND l.line = c.line
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
                               ORDER BY ord), '') AS text
    FROM flagged GROUP BY doc_id
    """,
)
def line_dedup_ccnet(sf_dir: str):
    """CCNet-style boilerplate line removal (Wenzek et al. 2020): a
    line occurring in >= 3 distinct documents of the SAME source is
    boilerplate and is dropped from every doc carrying it; docs are
    re-emitted with surviving lines plus removal counts.  The
    single-space synthetic corpus has no newlines, so a deterministic
    doc/source-seeded 4-line footer is appended on BOTH sides first
    (the pii_redact payload discipline): two per-source lines (always
    boilerplate), one doc_id%5 line (boilerplate at every tier) and
    one doc_id%97 line (kept at sf<=0.01, mixed at sf0.1 — the
    threshold bites in both directions).

    Distributed shape: explode lines vectorized (split_pattern over
    the augmented text), ONE exchange on fold(hash(source, line))
    (coarse-fold rule — never groupby a per-row-cardinality key),
    per-fold dictionary-encode + bincount marks boilerplate, then
    re-bucket by doc range and reconstruct vectorized (lexsort +
    list-offset binary_join).  At 100 TB the line exchange would carry
    a 128-bit line hash with a pruned re-read for multi-doc groups,
    mirroring stages/dedup_docs.exact_drop_ids."""
    rd = _rd()
    from .functions import hashing

    SPAN = 4096
    B = 3

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        src = t.column("source").combine_chunks()

        def istr(x: np.ndarray) -> pa.Array:
            return pc.cast(pa.array(x), pa.string())

        sep = pa.scalar("")
        f1 = pc.binary_join_element_wise(
            pa.scalar("copyright "), src, pa.scalar(" all rights reserved"),
            sep,
        )
        f2 = pc.binary_join_element_wise(
            pa.scalar("contact admin at "), src,
            pa.scalar(" dot example dot com"), sep,
        )
        f3 = pc.binary_join_element_wise(
            pa.scalar("promo code "), istr(ids % 5), pa.scalar(" of "), src,
            sep,
        )
        f4 = pc.binary_join_element_wise(
            pa.scalar("ref id "), istr(ids % 97), pa.scalar(" of "), src,
            sep,
        )
        aug = pc.binary_join_element_wise(
            t.column("text").combine_chunks(), f1, f2, f3, f4,
            pa.scalar("\n"),
        )
        lists = pc.split_pattern(aug, "\n")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        L = off[1:] - off[:-1]
        tot = int(off[-1])
        ordv = np.arange(tot, dtype=np.int64) - np.repeat(off[:-1], L) + 1
        src_rep = src.take(pa.array(np.repeat(np.arange(len(L)), L)))
        combo = pc.binary_join_element_wise(
            src_rep, lists.values, pa.scalar("\x1f")
        )
        fold = hashing.fold_int64(hashing.hash_strings(combo), 64)
        return pa.table({
            "fold": pa.array(fold),
            "doc_id": pa.array(np.repeat(ids, L)),
            "ord": pa.array(ordv),
            "line": lists.values,
            "combo": combo,
        })

    def mark(g: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(
            g.column("combo").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndocs = np.bincount(codes)  # one row per (doc, source, line)
        did = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table({
            "part": pa.array(did // SPAN),
            "doc_id": pa.array(did),
            "ord": g.column("ord"),
            "line": g.column("line"),
            "keep": pa.array(ndocs[codes] < B),
        })

    def rebuild(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ordv = g.column("ord").to_numpy(zero_copy_only=False)
        keep = g.column("keep").to_numpy(zero_copy_only=False).astype(bool)
        o = np.lexsort((ordv, did))
        did, keep = did[o], keep[o]
        lines = g.column("line").combine_chunks().take(pa.array(o))
        _, first = np.unique(did, return_index=True)
        n_lines = np.diff(np.concatenate([first, [len(did)]]))
        kept_n = np.add.reduceat(keep.astype(np.int64), first)
        bounds = np.concatenate([[0], np.cumsum(kept_n)]).astype(np.int32)
        dl = pa.ListArray.from_arrays(
            pa.array(bounds), lines.filter(pa.array(keep))
        )
        return pa.table({
            "doc_id": pa.array(did[first]),
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "n_removed": pa.array(n_lines - kept_n),
            "text": pc.binary_join(dl, "\n"),
        })

    return (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text"],
        )
        .map_batches(explode, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(mark, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def _embedding_kmeans_sql(k: int = 8, iters: int = 5) -> str:
    """Bit-exact DuckDB mirror of `kmeans_lloyd_quantized(k, iters)`:
    the iterative trajectory is unrolled into `iters` chained CTE
    pairs (assignment by integer L2 over floor((x+1)·2^24) fixed-point
    vectors, ties to the smaller cluster id; centroid update by
    integer floor-division, emptied clusters keep their previous
    centroid via the LEFT JOIN COALESCE).  All arithmetic is exact
    int64/int128, so every iteration — not just the final answer — is
    bit-identical between numpy and DuckDB."""
    from .stages.sketchq import splitmix64_sql

    its = []
    for i in range(1, iters + 1):
        p = f"cent{i - 1}"
        its.append(f"""
    dist{i} AS (
      SELECT qe.vec_id, ct.c,
             SUM((qe.q - ct.v) * (qe.q - ct.v)) AS d2
      FROM qe JOIN {p} ct ON ct.d = qe.d
      GROUP BY qe.vec_id, ct.c
    ),
    asg{i} AS (
      SELECT vec_id, c FROM (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM dist{i}
      ) WHERE rn = 1
    ),
    cent{i} AS (
      SELECT p.c, p.d, COALESCE(s.v, p.v) AS v
      FROM {p} p LEFT JOIN (
        SELECT a.c, qe.d, CAST(SUM(qe.q) // COUNT(*) AS BIGINT) AS v
        FROM asg{i} a JOIN qe ON qe.vec_id = a.vec_id
        GROUP BY a.c, qe.d
      ) s ON s.c = p.c AND s.d = p.d
    )""")
    return f"""
    WITH hv AS (
      SELECT vec_id, {splitmix64_sql('vec_id')} AS h FROM embeddings
    ),
    init AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY h) - 1 AS c
      FROM (SELECT vec_id, h FROM hv ORDER BY h LIMIT {k})
    ),
    qe AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR((CAST(UNNEST(embedding) AS DOUBLE) + 1) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    cent0 AS (
      SELECT i.c, qe.d, qe.q AS v FROM init i JOIN qe ON qe.vec_id = i.vec_id
    ),{','.join(its)},
    distF AS (
      SELECT qe.vec_id, ct.c,
             CAST(SUM((qe.q - ct.v) * (qe.q - ct.v)) AS BIGINT) AS d2
      FROM qe JOIN cent{iters} ct ON ct.d = qe.d
      GROUP BY qe.vec_id, ct.c
    )
    SELECT vec_id, c AS cluster, d2 AS dist2 FROM (
      SELECT vec_id, c, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
      FROM distF
    ) WHERE rn = 1
    """


@register("embedding_kmeans", _embedding_kmeans_sql())
def embedding_kmeans(sf_dir: str):
    """Distributed k-means clustering of the embedding column (k=8,
    5 Lloyd iterations) — the iterative-algorithm class of a
    training-data pipeline (semantic bucketing / dedup blocking /
    IVF training), made fully ORACLE-CHECKABLE by the integer
    fixed-point discipline (see stages/similarity.kmeans_lloyd_quantized
    and NOTES round 4: partitioning stays integer-exact; float would
    enter only after assignments are fixed).  Emits the final
    assignment (vec_id, cluster, dist2)."""
    from .stages.similarity import kmeans_lloyd_quantized

    rd = _rd()
    _, out = kmeans_lloyd_quantized(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        k=8, iters=5,
    )
    return out


@register(
    "near_dup_components",
    r"""
    WITH RECURSIVE norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(nt, i, 5) AS sh
      FROM norm,
        LATERAL (SELECT unnest(generate_series(1, greatest(length(nt)-4, 1))) AS i) g
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE i / (ca.n + cb.n - i) >= 0.8e0
    ),
    edges AS MATERIALIZED (
      -- referenced from both arms of the recursive CTE: MATERIALIZED
      -- keeps the quadratic shingle join from being re-planned per
      -- reference (the near_dup_pagerank lesson)
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab
    ),
    comp AS (
      SELECT node, LEAST(node, MIN(lab)) AS component
      FROM reach GROUP BY node
    )
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def near_dup_components(sf_dir: str):
    """Near-duplicate CLUSTER assignment for every document — the
    apply step after pair finding: exact n-gram-Jaccard pairs (the
    `ngram_jaccard_dups` PPJoin path, so the edge set is deterministic
    and SQL-expressible) fed through DISTRIBUTED min-label propagation
    (stages/dedup_docs.connected_components_distributed: each round a
    hash join + groupby-min shuffle, dup graph never on the driver);
    docs with no near-dup are their own singleton component.  The
    oracle mirrors the propagation with a recursive CTE (reachability
    closure + per-node min — fixpoint == O(diameter) rounds).

    Scale note: the label map broadcast into the final attach pass is
    DUP-CLUSTER-sized (nodes that have at least one near-dup pair),
    not corpus-sized; at a crawl corpus' 30-50% dup rates swap the
    broadcast for a hash left-join on doc_id, as exact_drop_ids'
    anti-join gate does."""
    import ray

    from .stages import dedup_docs

    rd = _rd()
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_docs.ngram_jaccard_pairs(docs_ds, threshold=0.8, k=5)
    # decide the propagation shape from the EXACT edge count (the
    # rejoin_driver_rows rule: collect delta-sized sets, stream
    # corpus-sized ones): below the gate the driver variant skips
    # ~2 s of Ray join+groupby ramp PER ROUND; the two variants are
    # equality-pinned by pytest
    pairs = pairs.materialize()
    if pairs.count() <= _CFG.cc_edge_gate:
        comp = dedup_docs.connected_components(pairs.to_pandas())
    else:
        comp = dedup_docs.connected_components_distributed(pairs).to_pandas()
    nodes = comp["doc_id"].to_numpy(dtype=np.int64)
    labs = comp["component"].to_numpy(dtype=np.int64)
    o = np.argsort(nodes, kind="stable")
    nodes, labs = nodes[o], labs[o]
    ref = ray.put((nodes, labs))

    def attach(t: pa.Table) -> pa.Table:
        nd, lb = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(nd):
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            compv = np.where(nd[pos] == ids, lb[pos], ids)
        else:
            compv = ids
        return pa.table({
            "doc_id": pa.array(ids),
            "component": pa.array(compv),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(attach, batch_format="pyarrow")


@register(
    "ann_range_search",
    """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < 8
    ), n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), qn AS (
      SELECT query_id, qe, SQRT(list_dot_product(qe, qe)) AS qnrm FROM q
    )
    SELECT qn.query_id, n.vec_id AS neighbor_id,
           ROUND(list_dot_product(qn.qe, n.v) / (qn.qnrm * n.nrm), 4)
             AS cosine
    FROM qn CROSS JOIN n
    WHERE n.vec_id != qn.query_id
      AND list_dot_product(qn.qe, n.v) / (qn.qnrm * n.nrm) >= 0.3
    """,
)
def ann_range_search(sf_dir: str):
    """Radius (range) similarity search — the third query shape after
    top-k (`ann_topk`) and all-pairs (`embedding_near_dups`): ALL
    corpus vectors within cosine >= threshold of each query, query
    matrix broadcast once via ray.put and probed per batch with one
    numpy matmul (stateless task pool — no actor spin-up, the
    brute_force_topk lesson).  Unlike top-k there is no global merge
    step at all: the per-batch threshold filter IS the final answer,
    so the operator is one embarrassingly-parallel pass.  Cosine trees
    (dot / (|q||v|)) and 4-decimal rounding mirror the SQL exactly."""
    import ray

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(8)))
    from .stages.similarity import _stack

    Q = _stack(q, "embedding")
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    qids = q.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put((qids, Q, qn))
    THR = 0.3

    def probe(t: pa.Table) -> pa.Table:
        ids, Qm, qnrm = ray.get(ref)
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        })
        if t.num_rows == 0 or len(ids) == 0:
            return empty
        V = _stack(t, "embedding")
        vn = np.sqrt(np.einsum("ij,ij->i", V, V))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cos = (Qm @ V.T) / (qnrm[:, None] * vn[None, :])
        hit = (cos >= THR) & (ids[:, None] != vid[None, :])
        qi, vi = np.nonzero(hit)
        return pa.table({
            "query_id": pa.array(ids[qi]),
            "neighbor_id": pa.array(vid[vi]),
            "cosine": pa.array(_round(cos[qi, vi], 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(probe, batch_format="pyarrow")


@register(
    "events_pivot",
    """
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
             AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
             AS n_view,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
             AS n_signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_error,
           ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 4)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def events_pivot(sf_dir: str):
    """PIVOT / cross-tab: one wide row per user with per-type event
    counts and purchase value — long→wide reshaping, the feature-table
    export shape.  Distributed: each batch pre-aggregates the FULL
    wide row per user (bincount over user×type codes — the pivot
    happens map-side, so the exchange carries users×blocks wide rows,
    never per-event rows), then one groupby-sum over every wide
    column.  The fixed column set comes from the schema's closed
    event-type domain; an open domain would use the two-pass
    vocabulary-discovery pattern of tfidf_top_term."""
    rd = _rd()
    from ray.data.aggregate import Sum

    TYPES = ["click", "view", "purchase", "signup", "error"]
    tset = pa.array(TYPES, type=pa.string())

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ti = pc.index_in(t.column("event_type"), value_set=tset).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        val = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        uu, inv = np.unique(uid, return_inverse=True)
        k = len(uu)
        cnt = np.zeros((k, len(TYPES)), dtype=np.int64)
        np.add.at(cnt, (inv, ti), 1)
        pv = np.zeros(k, dtype=np.float64)
        np.add.at(pv, inv[ti == 2], val[ti == 2])
        cols = {"user_id": pa.array(uu)}
        for j, ty in enumerate(TYPES):
            cols[f"n_{ty}_p"] = pa.array(cnt[:, j])
        cols["pv_p"] = pa.array(pv)
        return pa.table(cols)

    agg = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[Sum(f"n_{ty}_p", alias_name=f"n_{ty}") for ty in TYPES],
            Sum("pv_p", alias_name="pv"),
        )
        .to_pandas()
    )
    agg["purchase_value"] = _round(agg["pv"].to_numpy(dtype=np.float64), 4)
    # users with zero purchases: SQL's SUM FILTER yields NULL
    agg.loc[agg["n_purchase"] == 0, "purchase_value"] = np.nan
    return agg[
        ["user_id"] + [f"n_{ty}" for ty in TYPES] + ["purchase_value"]
    ]


@register(
    "events_running_total",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ), 4) AS running_value,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS seq
    FROM events
    """,
)
def events_running_total(sf_dir: str):
    """Cumulative window function: per-user running SUM(value) and
    event sequence number in time order — the running-total /
    prefix-scan class.  Distributed on the coarse user fold (the
    events_lag shuffle rule: never group on raw user_id), then ONE
    lexsort + segmented cumsum per group: the cumsum restarts at each
    user boundary by subtracting the per-user offset (vectorized — no
    per-user loop)."""
    rd = _rd()
    from .functions import hashing

    def tag(t: pa.Table) -> pa.Table:
        fold = hashing.fold_int64(
            t.column("user_id").to_numpy(zero_copy_only=False), 64
        )
        return t.append_column("fold", pa.array(fold))

    def scan(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = g.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        o = np.lexsort((eid, ts, u))
        u, eid, v = u[o], eid[o], v[o]
        cum = np.cumsum(v)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(u)) + 1])
        counts = np.diff(np.concatenate([starts, [len(u)]]))
        # per-user offset = global cumsum just before the user's first
        # row (sign-safe, unlike a maximum.accumulate trick)
        off = np.repeat(
            np.concatenate([[0.0], cum[starts[1:] - 1]]), counts
        )
        run = cum - off
        seq = np.arange(len(u), dtype=np.int64) - np.repeat(
            starts, counts
        ) + 1
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(u),
            "running_value": pa.array(_round(run, 4)),
            "seq": pa.array(seq),
        })

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(scan, batch_format="pyarrow")
    )


def _word_counts_cms_sql(w: int = 16, d: int = 4) -> str:
    """Bit-exact DuckDB mirror of the Count-Min sketch: word hash =
    hash_strings_poly (FNV polynomial over code points mod 2^64 +
    splitmix64 finalizer — the HLL mirror's chain), row-r bucket =
    splitmix64((salt_r + h) mod 2^64) % w, counters = exact integer
    COUNT(*) per (row, bucket), estimate = MIN over rows.  Everything
    is integer arithmetic, so the sketch state — not just the
    estimates — matches the engine exactly."""
    from .stages.sketchq import splitmix64_sql

    M = 18446744073709551616
    salts = [3_000_011 + 97 * r for r in range(d)]
    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(word)+1),
                           j -> CAST(unicode(substr(word, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    # splitmix64 finalizer completing hash_strings_poly
    fin = splitmix64_sql("CAST(p AS HUGEINT)")

    def bucket(r: int) -> str:
        return (
            splitmix64_sql(
                f"((CAST(h AS HUGEINT) + {salts[r]}) % {M})"
            )
            + f" % {w}"
        )

    rows_union = "\n      UNION ALL\n".join(
        f"      SELECT {r} AS r, {bucket(r)} AS bucket, word FROM h"
        for r in range(d)
    )
    return f"""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    p0 AS (SELECT word, {poly} AS p FROM words),
    h AS (SELECT word, {fin} AS h FROM p0),
    wb AS (
{rows_union}
    ),
    cms AS (SELECT r, bucket, COUNT(*) AS c FROM wb GROUP BY r, bucket),
    est AS (
      SELECT wb.word, MIN(cms.c) AS n_cms
      FROM (SELECT DISTINCT r, bucket, word FROM wb) wb
      JOIN cms ON cms.r = wb.r AND cms.bucket = wb.bucket
      GROUP BY wb.word
    ),
    truec AS (SELECT word, COUNT(*) AS n_true FROM words GROUP BY word)
    SELECT t.word, CAST(t.n_true AS BIGINT) AS n_true,
           CAST(e.n_cms AS BIGINT) AS n_cms
    FROM truec t JOIN est e ON e.word = t.word
    """


@register("word_counts_cms", _word_counts_cms_sql())
def word_counts_cms(sf_dir: str):
    """Count-Min sketch word frequencies — the fourth ORACLED mergeable
    sketch (after KMV quantiles, HLL distinct, MinHash signatures):
    d=4 splitmix64-salted rows x w integer counters, estimate =
    min over rows (never under the true count).  Output pairs every
    distinct word's exact count with its CMS estimate so the
    overestimate is judge-visible.

    Distributed shape: each batch emits its nonzero (row·w + bucket,
    count) partial cells — at most d·w rows per block, corpus-size
    independent — and the d×w integer reduce happens on the driver
    (the k-means partial-reduce shape; integer sums are order-free).
    True counts ride the existing vocabulary-sized word exchange.  At
    100 TB the CMS answers point frequency queries WITHOUT the
    vocabulary exchange; the exact side here exists for the oracle
    comparison."""
    import ray
    from ray.data.aggregate import Sum

    from .functions import hashing

    rd = _rd()
    # w deliberately SMALL for the battery corpus (31-word vocab):
    # at w=1024 no bucket ever collides and the sketch is
    # trivially exact — w=16 forces collisions so the
    # min-over-rows estimate (and its overestimate) is actually
    # exercised and oracle-checked.  Real deployments size
    # w ~ e/eps.
    W, D = 16, 4
    SALTS = np.array([3_000_011 + 97 * r for r in range(D)], dtype=np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(t.column("text").combine_chunks(), " ")
        ).to_numpy(zero_copy_only=False).astype(object)
        if len(words) == 0:
            return pa.table({
                "key": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
        h = hashing.hash_strings_poly(words).view(np.uint64)
        keys = []
        for r in range(D):
            b = hashing.hash_int64(
                (SALTS[r] + h).view(np.int64)
            ).view(np.uint64) % np.uint64(W)
            keys.append(r * W + b.astype(np.int64))
        cnt = np.bincount(np.concatenate(keys), minlength=D * W)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "key": pa.array(nz.astype(np.int64)),
            "c": pa.array(cnt[nz].astype(np.int64)),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    cms = np.zeros(D * W, dtype=np.int64)
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            cms,
            b.column("key").to_numpy(zero_copy_only=False),
            b.column("c").to_numpy(zero_copy_only=False),
        )

    def true_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            pc.list_flatten(
                pc.split_pattern(t.column("text").combine_chunks(), " ")
            )
        )
        return pa.table({
            "word": vc.field("values"),
            "n_part": vc.field("counts").cast(pa.int64()),
        })

    truec = (
        docs.map_batches(true_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="n_true"))
        .to_pandas()
    )
    wv = truec["word"].to_numpy(dtype=object)
    h = hashing.hash_strings_poly(wv).view(np.uint64)
    est = np.full(len(wv), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(D):
        b = hashing.hash_int64(
            (SALTS[r] + h).view(np.int64)
        ).view(np.uint64) % np.uint64(W)
        est = np.minimum(est, cms[r * W + b.astype(np.int64)])
    return pd.DataFrame({
        "word": wv,
        "n_true": truec["n_true"].to_numpy(dtype=np.int64),
        "n_cms": est,
    })


def _semdedup_sql(k: int = 8, iters: int = 5,
                  T: int = 360_000_000_000_000) -> str:
    """SemDeDup oracle: the full k-means trajectory mirror
    (`_embedding_kmeans_sql`, bit-exact integer Lloyd) nested as a CTE,
    then a within-cluster pairwise integer-L2 self-join — a vector is a
    semantic duplicate iff SOME smaller vec_id in its cluster sits
    within quantized dist2 <= T.  Every comparison is int64/int128, so
    the dup set is bit-identical between numpy and DuckDB."""
    return f"""
    WITH asg AS (
      {_embedding_kmeans_sql(k, iters)}
    ),
    qe2 AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR((CAST(UNNEST(embedding) AS DOUBLE) + 1) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    dup AS (
      SELECT DISTINCT vec_id FROM (
        SELECT b.vec_id
        FROM asg a JOIN asg b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN qe2 qa ON qa.vec_id = a.vec_id
        JOIN qe2 qb ON qb.vec_id = b.vec_id AND qb.d = qa.d
        GROUP BY a.vec_id, b.vec_id
        HAVING SUM((qa.q - qb.q) * (qa.q - qb.q)) <= {T}
      )
    )
    SELECT a.vec_id, a.cluster,
           a.vec_id IN (SELECT vec_id FROM dup) AS is_dup
    FROM asg a
    """


@register("semdedup", _semdedup_sql())
def semdedup(sf_dir: str):
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then mark
    within-cluster near-duplicates — clustering turns the quadratic
    all-pairs problem into k independent group-local ones.  Dup rule
    here: a vector is dropped iff a SMALLER vec_id in its cluster is
    within quantized L2 dist2 <= T (deterministic keep-first greedy;
    the paper keeps the member farthest from the centroid — same
    candidate structure, different tie policy).  Integer fixed-point
    vectors end-to-end (the kmeans/LSH oracle discipline), so both the
    clustering AND the dup set are SQL-exact.

    Distributed shape: k-means via `kmeans_lloyd_quantized` (per-
    iteration exchange = k·(dim+1) int64 rows per block, driver
    reduce), then ONE assignment pass re-tags vectors with their
    cluster and ONE groupby(cluster) shuffle co-locates each cluster;
    the group kernel sorts by vec_id and scans row-blocks against the
    id-prefix with chunked int64 matmuls (peak memory = block x
    cluster, never cluster^2).  At 100 TB pick k ~ sqrt(N) (the
    paper's regime): groups stay ~sqrt-corpus-sized and the shuffle
    carries dim+2 int64s per vector, no text."""
    import ray

    from .stages.similarity import (
        _kmeans_assign,
        _stack,
        kmeans_lloyd_quantized,
        kmeans_quantize,
    )

    rd = _rd()
    T = 360_000_000_000_000
    path = f"{sf_dir}/embeddings.parquet"
    emb = rd.read_parquet(path, columns=["vec_id", "embedding"])
    cent, _ = kmeans_lloyd_quantized(emb, k=8, iters=5)
    cref = ray.put(cent)

    def tag(t: pa.Table, _ref=cref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "q": pa.array([], type=pa.list_(pa.int64())),
            })
        C = ray.get(_ref)
        Q = kmeans_quantize(_stack(t, "embedding"))
        a = _kmeans_assign(Q, C)
        return pa.table({
            "vec_id": t.column("vec_id"),
            "cluster": pa.array(a.astype(np.int64)),
            "q": pa.array(list(Q), type=pa.list_(pa.int64())),
        })

    def mark(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        flat = (
            g.column("q").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        Q = flat.reshape(len(ids), -1)
        o = np.argsort(ids, kind="stable")
        ids, Q = ids[o], Q[o]
        n2 = np.einsum("ij,ij->i", Q, Q)
        dup = np.zeros(len(ids), dtype=bool)
        BX = 1024
        for s in range(1, len(ids), BX):
            e = min(s + BX, len(ids))
            G = Q[s:e] @ Q[:e].T
            D = n2[s:e, None] + n2[None, :e] - 2 * G
            hit = (D <= T) & (
                np.arange(e)[None, :] < np.arange(s, e)[:, None]
            )
            dup[s:e] = hit.any(axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": g.column("cluster").take(pa.array(o)),
            "is_dup": pa.array(dup),
        })

    return (
        emb.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(mark, batch_format="pyarrow")
    )


def _dsir_sql(B: int = 512, target_lang: str = "en") -> str:
    """Bit-exact DuckDB mirror of the DSIR hashed-bigram importance
    weight: bucket = splitmix64(FNV-poly(pair)) % B (the
    word_counts_cms hash chain over 'w1 w2' pair strings), smoothed
    bucket distributions from integer counts, per-doc weight =
    SUM(LN(p_target/p_raw)) rounded to 4 decimals (the
    doc_bigram_lm_score float discipline — the LN argument is the
    same IEEE double on both sides)."""
    from .stages.sketchq import splitmix64_sql

    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(pair)+1),
                           j -> CAST(unicode(substr(pair, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    fin = splitmix64_sql("CAST(p AS HUGEINT)")
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT doc_id, lang, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord
      FROM toks
    ), big AS (
      SELECT doc_id, lang,
             tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord)
               AS pair
      FROM words
    ), bp AS (SELECT doc_id, lang, pair FROM big WHERE pair IS NOT NULL),
    p0 AS (SELECT doc_id, lang, {poly} AS p FROM bp),
    hb AS (SELECT doc_id, lang, {fin} % {B} AS b FROM p0),
    cr AS (SELECT b, COUNT(*) AS c FROM hb GROUP BY b),
    ctg AS (SELECT b, COUNT(*) AS c FROM hb
            WHERE lang = '{target_lang}' GROUP BY b),
    tot AS (SELECT COUNT(*) AS nr,
                   COUNT(*) FILTER (WHERE lang = '{target_lang}') AS nt
            FROM hb)
    SELECT hb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(LN(((COALESCE(ctg.c, 0) + 1.0) / (tot.nt + {B})) /
                        ((cr.c + 1.0) / (tot.nr + {B})))), 4) AS dsir_logw
    FROM hb JOIN cr ON cr.b = hb.b LEFT JOIN ctg ON ctg.b = hb.b, tot
    GROUP BY hb.doc_id
    """


@register("dsir_importance", _dsir_sql())
def dsir_importance(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169,
    "Data Selection for Language Models via Importance Resampling"):
    per-doc log importance weight under hashed-bigram bag-of-ngrams
    models of a TARGET distribution (here the 'en' slice — the
    quality-proxy subset) vs the RAW corpus: logw(doc) =
    sum over the doc's hashed bigrams of ln(p_target(b)/p_raw(b)),
    add-1-smoothed over B=512 buckets.  Docs are then resampled
    proportional to exp(logw) — the weight column is the operator.

    Distributed shape (the CMS/k-means partial-reduce pattern): pass 1
    streams the corpus once, emitting per-batch bucket-count partials
    for raw (keys 0..B-1) and target (keys B..2B-1) — at most 2B int64
    rows per block, corpus-size independent — reduced on the driver
    into the 2xB model; the B-float score vector broadcasts via
    ray.put.  Pass 2 is a shuffle-free scorer: hashed bigrams ->
    score-vector gather -> per-doc segment sum.  No exchange ever
    carries text or a vocabulary; the model is O(B) by construction —
    exactly the property that makes DSIR run at web scale."""
    import ray

    from .functions import hashing

    rd = _rd()
    B, LANG = 512, "en"
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def buckets_of(t: pa.Table):
        ids, nb, pairs, _ = _bigram_pairs_of(t)
        if int(nb.sum()) == 0:
            return ids, nb, np.empty(0, dtype=np.int64)
        pv = pairs.to_numpy(zero_copy_only=False).astype(object)
        h = hashing.hash_strings_poly(pv).view(np.uint64) % np.uint64(B)
        return ids, nb, h.astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        _, nb, b = buckets_of(t)
        if len(b) == 0:
            return pa.table({
                "key": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
        lang = t.column("lang").to_numpy(zero_copy_only=False).astype(object)
        is_t = np.repeat(lang == LANG, nb)
        cnt = np.concatenate([
            np.bincount(b, minlength=B),
            np.bincount(b[is_t], minlength=B),
        ])
        nz = np.flatnonzero(cnt)
        return pa.table({
            "key": pa.array(nz.astype(np.int64)),
            "cnt": pa.array(cnt[nz].astype(np.int64)),
        })

    model = np.zeros(2 * B, dtype=np.int64)
    for bt in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            model,
            bt.column("key").to_numpy(zero_copy_only=False),
            bt.column("cnt").to_numpy(zero_copy_only=False),
        )
    nr, nt = int(model[:B].sum()), int(model[B:].sum())
    score = np.log(
        ((model[B:] + 1.0) / (nt + B)) / ((model[:B] + 1.0) / (nr + B))
    )
    sref = ray.put(score)

    def scorer(t: pa.Table, _ref=sref) -> pa.Table:
        s = ray.get(_ref)
        ids, nb, b = buckets_of(t)
        keep = nb > 0
        sums = np.zeros(len(ids), dtype=np.float64)
        if len(b):
            np.add.at(sums, np.repeat(np.arange(len(ids)), nb), s[b])
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_bigrams": pa.array(nb[keep]),
            "dsir_logw": pa.array(_round(sums[keep], 4)),
        })

    return docs.map_batches(scorer, batch_format="pyarrow")


def _ann_topk_pq_sql(m: int = 8, ks: int = 16, k: int = 10,
                     nq: int = 5) -> str:
    """Bit-exact mirror of `pq_topk_sampled`: codebook = bottom-ks
    vec_ids by splitmix64, codeword index = vec_id rank (matching
    sampled_centroids' ordering), per-subspace encoding by integer L2
    with ties to the smaller codeword, ADC distance = integer sum of
    per-subspace table entries — the final ranking, not just the
    candidate set, is integer-exact in both engines."""
    from .stages.sketchq import splitmix64_sql

    return f"""
    WITH cb AS (
      SELECT cwid, ROW_NUMBER() OVER (ORDER BY cwid) - 1 AS code FROM (
        SELECT vec_id AS cwid, {splitmix64_sql('vec_id')} AS hv
        FROM embeddings ORDER BY hv LIMIT {ks})
    ),
    qe AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    sub AS (
      SELECT vec_id, d // (len_d // {m}) AS s, d % (len_d // {m}) AS sd, q
      FROM qe, (SELECT COUNT(*) // COUNT(DISTINCT vec_id) AS len_d FROM qe)
    ),
    cw AS (
      SELECT cb.code, sub.s, sub.sd, sub.q AS cq
      FROM cb JOIN sub ON sub.vec_id = cb.cwid
    ),
    sd2 AS (
      SELECT v.vec_id, v.s, c.code,
             SUM((v.q - c.cq) * (v.q - c.cq)) AS d2
      FROM sub v JOIN cw c ON c.s = v.s AND c.sd = v.sd
      GROUP BY v.vec_id, v.s, c.code
    ),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY d2, code) AS rn
        FROM sd2) WHERE rn = 1
    ),
    adc AS (
      SELECT qd.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(SUM(qd.d2) AS BIGINT) AS adc_dist2
      FROM enc e JOIN sd2 qd ON qd.s = e.s AND qd.code = e.code
      WHERE qd.vec_id < {nq}
      GROUP BY qd.vec_id, e.vec_id
    )
    SELECT query_id, neighbor_id, rank, adc_dist2 FROM (
      SELECT query_id, neighbor_id, adc_dist2, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS rank
      FROM adc
    ) WHERE rank <= {k}
    """


@register("ann_topk_pq", _ann_topk_pq_sql())
def ann_topk_pq(sf_dir: str):
    """Product-quantization ANN (Jegou et al. 2011) — the fourth index
    family after brute/LSH/IVF, and the one that makes 100-TB ANN fit
    in memory: vectors compress to m=8 codes (one per 8-dim subspace,
    16 codewords each) and search is ADC table lookups, so the scan
    working set is m bytes/vector.  The splitmix64-sampled codebook +
    integer fixed-point encode/ADC make the ENTIRE ranking
    oracle-checkable (the sampled-IVF discipline; rank ties by
    neighbor_id).  One streamed pass, per-batch top-k partials, no
    shuffle; self-matches rank by their (small) quantization error
    like any other vector — deterministic on both sides."""
    from .stages.similarity import _stack, pq_topk_sampled

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    return pq_topk_sampled(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        emb.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(emb, "embedding"),
        k=10, m=8, ks=16,
    )


_BM25_TERMS = ("column", "window", "scan")


def _bm25_topk_sql(k: int = 10) -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH w AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS len FROM w GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(len) AS tot FROM dl),
    qt AS (SELECT UNNEST([{terms}]) AS term),
    df AS (
      SELECT tok AS term, COUNT(DISTINCT doc_id) AS df
      FROM w JOIN qt ON qt.term = w.tok GROUP BY tok
    ),
    tf AS (
      SELECT doc_id, tok AS term, COUNT(*) AS tf
      FROM w JOIN qt ON qt.term = w.tok GROUP BY doc_id, tok
    ),
    sc AS (
      SELECT tf.doc_id,
             SUM(LN((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len /
                    (CAST(stats.tot AS DOUBLE) / stats.n_docs)))) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, rank FROM (
      SELECT doc_id, ROUND(score, 4) AS bm25, ROW_NUMBER() OVER (
        ORDER BY ROUND(score, 4) DESC, doc_id) AS rank
      FROM sc
    ) WHERE rank <= {k}
    """


@register("bm25_topk", _bm25_topk_sql())
def bm25_topk(sf_dir: str):
    """Full-text keyword search: BM25 top-k (Robertson/Walker Okapi
    BM25, k1=1.2, b=0.75) for a fixed 3-term query — the retrieval
    primitive of a decontamination / eval-leakage hunt over a training
    corpus.  Ranking on ROUND(score, 4) with doc_id ties makes the
    order deterministic on both sides (the LN float discipline); docs
    containing no query term are excluded, as in the SQL.

    Distributed shape: pass 1 streams one map-side-combined partial of
    (per-term df, doc count, token count) — 5 int64 cells per block —
    reduced on the driver into the O(|query|) model; pass 2 is a
    shuffle-free scorer emitting per-batch top-k partials (k rows per
    block), merged on the driver.  Neither pass exchanges anything
    corpus-sized; a multi-query engine would broadcast a term
    dictionary instead of the tuple."""
    import ray

    rd = _rd()
    K = 10
    nt = len(_BM25_TERMS)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def toks_of(t: pa.Table):
        lists = pc.split_pattern(t.column("text").combine_chunks(), " ")
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = off[1:] - off[:-1]
        return lists.values, lens

    def tf_of(t: pa.Table):
        """per-doc term-frequency matrix (n_docs x n_terms) + doc lens."""
        V, lens = toks_of(t)
        didx = np.repeat(np.arange(len(lens)), lens)
        tf = np.zeros((len(lens), nt), dtype=np.int64)
        for j, term in enumerate(_BM25_TERMS):
            m = pc.equal(V, pa.scalar(term)).to_numpy(zero_copy_only=False)
            if m.any():
                np.add.at(tf[:, j], didx[m], 1)
        return tf, lens

    def partial(t: pa.Table) -> pa.Table:
        tf, lens = tf_of(t)
        vals = np.concatenate([
            (tf > 0).sum(axis=0),                      # df per term
            [tf.shape[0], int(lens.sum())],            # n_docs, tot tokens
        ]).astype(np.int64)
        return pa.table({
            "key": pa.array(np.arange(nt + 2, dtype=np.int64)),
            "cnt": pa.array(vals),
        })

    model = np.zeros(nt + 2, dtype=np.int64)
    for bt in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        np.add.at(
            model,
            bt.column("key").to_numpy(zero_copy_only=False),
            bt.column("cnt").to_numpy(zero_copy_only=False),
        )
    df, n_docs, tot = model[:nt], int(model[nt]), int(model[nt + 1])
    avgdl = float(tot) / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    mref = ray.put(idf)

    def score(t: pa.Table, _ref=mref) -> pa.Table:
        idf_ = ray.get(_ref)
        tf, lens = tf_of(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        denom = tf + 1.2 * (0.25 + 0.75 * lens[:, None] / avgdl)
        s = np.where(tf > 0, idf_[None, :] * (tf * 2.2) / denom, 0.0).sum(
            axis=1
        )
        keep = tf.sum(axis=1) > 0
        ids, s = ids[keep], _round(s[keep], 4)
        take = min(K, len(ids))
        if take < len(ids):
            # tie-aware partial: ties at the k-th rounded score must
            # keep the SMALLER doc_id or the merge can diverge from
            # the oracle's (score DESC, doc_id) order
            part = np.lexsort((ids, -s))[:take]
            ids, s = ids[part], s[part]
        return pa.table({"doc_id": pa.array(ids), "bm25": pa.array(s)})

    parts = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["bm25", "doc_id"], ascending=[False, True], kind="stable"
    ).head(K).reset_index(drop=True)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts[["doc_id", "bm25", "rank"]]


#: BPE-ish pre-tokenizer (GPT-2 style minus lookahead, so it is plain
#: RE2 — the SAME engine under pyarrow's count_substring_regex and
#: DuckDB's regexp_extract_all, which is what makes the count
#: bit-mirrorable): contractions, optional-space letter runs, digit
#: runs, punctuation runs, whitespace runs.
_BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def _doc_tokens_bpe_sql() -> str:
    pat = _BPE_PAT.replace("'", "''")
    return f"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(LEN(regexp_extract_all(text, '{pat}')) AS BIGINT)
             AS n_bpe_tokens,
           ROUND(LENGTH(text) /
                 CAST(LEN(regexp_extract_all(text, '{pat}')) AS DOUBLE), 4)
             AS chars_per_token
    FROM documents
    WHERE LEN(regexp_extract_all(text, '{pat}')) > 0
    """


@register("doc_tokens_bpe", _doc_tokens_bpe_sql())
def doc_tokens_bpe(sf_dir: str):
    """Token counting beyond whitespace: a BPE-ish pre-tokenizer count
    per document (the train-cost / packing estimator a real pipeline
    runs before tokenizing 100 TB) next to the whitespace count and
    the chars-per-token ratio.  One shuffle-free map_batches pass;
    the regex runs as a single RE2 C kernel per batch
    (pc.count_substring_regex) — never a Python loop — and both
    engines execute the SAME RE2 pattern, so counts are bit-equal."""
    rd = _rd()

    def stats(t: pa.Table) -> pa.Table:
        text = t.column("text")
        nb = pc.count_substring_regex(text, _BPE_PAT)
        nw = pc.list_value_length(pc.split_pattern(text, " "))
        nchars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nbv = nb.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nbv > 0
        ratio = _round(
            nchars[keep] / nbv[keep].astype(np.float64), 4
        )
        return pa.table({
            "doc_id": t.column("doc_id").filter(pa.array(keep)),
            "n_ws_tokens": pc.cast(nw, pa.int64()).filter(pa.array(keep)),
            "n_bpe_tokens": pa.array(nbv[keep]),
            "chars_per_token": pa.array(ratio),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(stats, batch_format="pyarrow")


def _source_overlap_sql() -> str:
    """Cross-source containment oracle: distinct bigram-shingle HASHES
    per source (the engine's exchange carries hashes, so the SQL
    mirrors the poly+splitmix64 chain rather than comparing raw
    strings — bit-equal even in the astronomically-unlikely collision
    case), pairwise intersection via self-join, Jaccard from the
    inclusion-exclusion counts."""
    from .stages.sketchq import splitmix64_sql

    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(pair)+1),
                           j -> CAST(unicode(substr(pair, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    fin = splitmix64_sql("CAST(p AS HUGEINT)")
    return f"""
    WITH toks AS (
      SELECT source, doc_id, string_split(text, ' ') AS w FROM documents
    ), words AS (
      SELECT source, doc_id, UNNEST(w) AS tok,
             UNNEST(range(1, len(w) + 1)) AS ord
      FROM toks
    ), big AS (
      SELECT source,
             tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY ord)
               AS pair
      FROM words
    ), bp AS (SELECT DISTINCT source, pair FROM big WHERE pair IS NOT NULL),
    p0 AS (SELECT source, {poly} AS p FROM bp),
    hb AS (SELECT DISTINCT source, {fin} AS h FROM p0),
    cnt AS (SELECT source, COUNT(*) AS n FROM hb GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM hb a JOIN hb b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, CAST(i.n_shared AS BIGINT) AS n_shared,
           ROUND(i.n_shared / CAST(ca.n + cb.n - i.n_shared AS DOUBLE), 4)
             AS jaccard
    FROM inter i
    JOIN cnt ca ON ca.source = i.source_a
    JOIN cnt cb ON cb.source = i.source_b
    """


@register("source_overlap", _source_overlap_sql())
def source_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every pair of sources,
    how many distinct bigram shingles they share and the shingle-set
    Jaccard — the corpus-analysis step that decides which crawl
    sources are near-copies of each other before mixing weights are
    assigned.

    Distributed shape: the exchange carries DEDUPED (source, hash64)
    pairs — 8+dict bytes per distinct shingle, never text (the
    exact-dedup hash-only lesson) — shuffled once on the coarse hash
    fold; each fold bucket finishes its hashes completely (global
    dedup + per-hash source-pair enumeration, vectorized per run-
    length class since |sources| is small) and emits pair partials
    plus per-source distinct-count partials, summed in a tiny driver
    reduce.  Nothing anywhere is corpus-sized; skewed shingles cost
    at most |sources|^2 rows per hash."""
    from .functions import hashing

    rd = _rd()

    def shingles(t: pa.Table) -> pa.Table:
        ids, nb, pairs, _ = _bigram_pairs_of(t)
        if int(nb.sum()) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "h": pa.array([], type=pa.int64()),
                "fold": pa.array([], type=pa.int64()),
            })
        pv = pairs.to_numpy(zero_copy_only=False).astype(object)
        h = hashing.hash_strings_poly(pv)
        src = np.repeat(
            t.column("source").to_numpy(zero_copy_only=False).astype(object),
            nb,
        )
        # batch-local dedup: shrink the exchange before it happens
        key = pd.MultiIndex.from_arrays([src, h])
        keep = ~key.duplicated()
        return pa.table({
            "source": pa.array(src[keep], type=pa.string()),
            "h": pa.array(h[keep]),
            "fold": pa.array(hashing.fold_int64(h[keep])),
        })

    def bucket(g: pa.Table) -> pa.Table:
        src = g.column("source").to_numpy(zero_copy_only=False).astype(object)
        h = g.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"s": src, "h": h}).drop_duplicates()
        df = df.sort_values(["h", "s"], kind="stable")
        hv = df["h"].to_numpy()
        sv = df["s"].to_numpy(dtype=object)
        # per-source distinct-count partials (hash-partitioned by fold,
        # so per-bucket counts sum globally without double counting)
        csrc, cn = np.unique(sv, return_counts=True)
        out_a = list(csrc)
        out_b = [""] * len(csrc)
        out_n = list(cn.astype(np.int64))
        # per-hash source lists -> pair partials, one vectorized slab
        # per run-length class (|sources| bounds the run length)
        starts = np.flatnonzero(np.concatenate([[True], hv[1:] != hv[:-1]]))
        runs = np.diff(np.concatenate([starts, [len(hv)]]))
        for r in np.unique(runs[runs >= 2]):
            sel = starts[runs == r]
            mat = sv[sel[:, None] + np.arange(r)[None, :]]
            iu, ju = np.triu_indices(int(r), 1)
            a = mat[:, iu].ravel()
            b = mat[:, ju].ravel()
            pa_, pb_ = np.minimum(a, b), np.maximum(a, b)
            key = pd.MultiIndex.from_arrays([pa_, pb_])
            u, c = np.unique(key.to_numpy(), return_counts=True)
            out_a.extend(x[0] for x in u)
            out_b.extend(x[1] for x in u)
            out_n.extend(c.astype(np.int64))
        return pa.table({
            "a": pa.array(out_a, type=pa.string()),
            "b": pa.array(out_b, type=pa.string()),
            "n": pa.array(out_n, type=pa.int64()),
        })

    parts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source", "text"])
        .map_batches(shingles, batch_format="pyarrow")
        .groupby("fold")
        .map_groups(bucket, batch_format="pyarrow")
        .to_pandas()
    )
    red = parts.groupby(["a", "b"], sort=False)["n"].sum()
    cnts = {a: int(n) for (a, b), n in red.items() if b == ""}
    rows = [
        (a, b, int(n),
         float(_round(np.array([n / (cnts[a] + cnts[b] - n)]), 4)[0]))
        for (a, b), n in red.items() if b != ""
    ]
    rows.sort()
    return pd.DataFrame(
        rows, columns=["source_a", "source_b", "n_shared", "jaccard"]
    )


@register("bm25_topk_indexed", _bm25_topk_sql())
def bm25_topk_indexed(sf_dir: str):
    """BM25 over a PERSISTED inverted index (stages/textindex): the
    corpus is laid out as term-hash-partitioned postings with the doc
    length denormalized into each row, so the query reads ONLY its
    terms' partitions — the literal 100-TB form of text search, where
    scanning documents is not an option.  Same scoring/rounding/tie
    rules as the scan-based `bm25_topk`, so BOTH exchange plans share
    one SQL oracle (the pip_nation_salted scale-path-twin
    discipline).  Index cached per sf tier with an atomic rename
    publish (the IVF-persisted pattern)."""
    import hashlib
    import shutil

    from .stages.textindex import bm25_query_indexed, build_inverted_index

    rd = _rd()
    path = f"{sf_dir}/documents.parquet"
    key = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:v1".encode()
    ).hexdigest()[:10]
    index_dir = f"/tmp/olu_ray_text_idx_{key}"
    if not os.path.isdir(index_dir):
        tmp = index_dir + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        build_inverted_index(
            rd.read_parquet(path, columns=["doc_id", "text"]), tmp
        )
        try:
            os.rename(tmp, index_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return bm25_query_indexed(index_dir, _BM25_TERMS, k=10)


def _near_dup_pagerank_sql(iters: int = 5) -> str:
    """Integer-exact PageRank mirror: rank in 1e12 fixed-point units,
    r_{t+1}(v) = 0.15e12 + (85 · Σ_{u→v} (r_t(u) // deg(u))) // 100 —
    every operand non-negative, so numpy's floor-div and DuckDB's
    truncating // agree (the kmeans +1-shift lesson applies for free)
    and the whole 5-iteration trajectory is bit-identical.  No
    dangling redistribution by definition: isolated docs sit at the
    0.15e12 base."""
    base = 150_000_000_000
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
    r{i} AS (
      SELECT e.dst AS node,
             {base} + CAST((85 * SUM(r{i - 1}.r // d.deg)) // 100
                           AS BIGINT) AS r
      FROM edges e
      JOIN r{i - 1} ON r{i - 1}.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )""")
    return f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(nt, i, 5) AS sh
      FROM norm,
        LATERAL (SELECT unnest(generate_series(1, greatest(length(nt)-4, 1))) AS i) g
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE i / (ca.n + cb.n - i) >= 0.8e0
    ),
    edges AS MATERIALIZED (
      -- MATERIALIZED is load-bearing: edges/deg are referenced once
      -- per unrolled iteration, and an inlining planner would
      -- recompute the quadratic shingle join for every reference
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    deg AS MATERIALIZED (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT DISTINCT src AS node, CAST(1000000000000 AS BIGINT) AS r
      FROM edges
    ),{','.join(its)}
    SELECT d.doc_id, COALESCE(rk.r, {base}) AS pagerank
    FROM documents d LEFT JOIN r{iters} rk ON rk.node = d.doc_id
    """


@register("near_dup_pagerank", _near_dup_pagerank_sql())
def near_dup_pagerank(sf_dir: str):
    """Graph centrality over the near-duplicate graph — the
    PageRank-style quality/weighting signal a crawl pipeline computes
    once it has a graph (here the deterministic n-gram-Jaccard edge
    set, the same one `near_dup_components` labels): hub documents
    that many near-copies point at accumulate rank; isolated docs sit
    at the 0.15e12 base.  Integer fixed-point trajectory (see the SQL
    mirror) — the third fully-oracled ITERATIVE algorithm after
    k-means and label propagation.

    Distributed shape: edge finding is the distributed PPJoin path
    (shuffles carry hashes, never text); the 5-round power iteration
    runs on the DUP-GRAPH (edge list is dup-cluster-sized, the same
    size class as near_dup_components' label map — at crawl-rate dup
    graphs swap the collect for per-round fold(dst) groupby-sum
    rounds, the label-propagation shape); the final attach streams the
    corpus against the broadcast rank map."""
    import ray

    from .stages import dedup_docs

    rd = _rd()
    BASE = 150_000_000_000
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_docs.ngram_jaccard_pairs(
        docs_ds, threshold=0.8, k=5
    ).to_pandas()
    a = pairs["id_a"].to_numpy(dtype=np.int64)
    b = pairs["id_b"].to_numpy(dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    nodes, si = np.unique(src, return_inverse=True)
    di = np.searchsorted(nodes, dst)  # symmetric graph: same node set
    deg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    r = np.full(len(nodes), 1_000_000_000_000, dtype=np.int64)
    for _ in range(5):
        acc = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(acc, di, r[si] // deg[si])
        r = BASE + (85 * acc) // 100
    ref = ray.put((nodes, r))

    def attach(t: pa.Table) -> pa.Table:
        nd, rv = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(nd):
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            out = np.where(nd[pos] == ids, rv[pos], BASE)
        else:
            out = np.full(len(ids), BASE, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "pagerank": pa.array(out.astype(np.int64)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(attach, batch_format="pyarrow")


def _doc_winnowing_sql(k: int = 5, w: int = 4) -> str:
    """Winnowing oracle: the minhash mirror's shingle-hash chain
    (poly + splitmix64, positions carried through), then per-window
    rightmost-minimum selection via ROW_NUMBER (v ASC, i DESC), DISTINCT
    selected (i, v) per doc, and an integer bit_xor rollup converted to
    the engine's int64 view."""
    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(g)+1),
                           j -> CAST(unicode(substr(g, j, 1)) AS UHUGEINT))),
            (acc, c) -> (acc * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    return f"""
    WITH docs AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    gs AS (
      SELECT doc_id, i, substr(norm, i, {k}) AS g,
             greatest(length(norm) - {k - 1}, 1) AS n
      FROM docs, LATERAL (SELECT UNNEST(range(1,
             greatest(length(norm) - {k - 1}, 1) + 1)) AS i) t
    ),
    h0 AS (SELECT doc_id, i, n, {poly} AS v FROM gs),
    m1 AS (SELECT doc_id, i, n, CAST((v::UHUGEINT + 11400714819323198485)
            % 18446744073709551616 AS UBIGINT) AS v FROM h0),
    m2 AS (SELECT doc_id, i, n, xor(v, v >> 30) AS v FROM m1),
    m3 AS (SELECT doc_id, i, n, CAST((v::UHUGEINT * 13787848793156543929)
            % 18446744073709551616 AS UBIGINT) AS v FROM m2),
    m4 AS (SELECT doc_id, i, n, xor(v, v >> 27) AS v FROM m3),
    m5 AS (SELECT doc_id, i, n, CAST((v::UHUGEINT * 10723151780598845931)
            % 18446744073709551616 AS UBIGINT) AS v FROM m4),
    hh AS MATERIALIZED (
      SELECT doc_id, i, n, xor(v, v >> 31) AS v FROM m5
    ),
    ws AS (
      SELECT doc_id, n, UNNEST(range(1, greatest(n - {w - 1}, 1) + 1)) AS s
      FROM (SELECT DISTINCT doc_id, n FROM hh) d
    ),
    sel AS (
      SELECT doc_id, s, i, v FROM (
        SELECT w.doc_id, w.s, h.i, h.v, ROW_NUMBER() OVER (
          PARTITION BY w.doc_id, w.s ORDER BY h.v ASC, h.i DESC) AS rn
        FROM ws w JOIN hh h ON h.doc_id = w.doc_id
         AND h.i >= w.s AND h.i <= least(w.s + {w - 1}, w.n)
      ) WHERE rn = 1
    ),
    fp AS (SELECT DISTINCT doc_id, i, v FROM sel),
    agg AS (
      SELECT f.doc_id, MAX(h.n) AS n_sh, COUNT(*) AS n_fp, bit_xor(f.v) AS x
      FROM fp f JOIN (SELECT DISTINCT doc_id, n FROM hh) h
        ON h.doc_id = f.doc_id
      GROUP BY f.doc_id
    )
    SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
           CAST(n_fp AS BIGINT) AS n_fp,
           CAST(CAST(x AS HUGEINT) - CASE WHEN x >= 9223372036854775808
                THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS fp_xor
    FROM agg
    """


@register("doc_winnowing", _doc_winnowing_sql())
def doc_winnowing(sf_dir: str):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): in every window of w=4 consecutive
    k-gram hashes keep the RIGHTMOST minimum — a (2/(w+1))-density
    fingerprint set with the guarantee that any match of length
    >= w+k-1 shares a fingerprint, the classic local-similarity /
    plagiarism primitive between exact hashing and MinHash.  Output
    per doc: shingle count, fingerprint count, and the XOR of the
    selected hashes (an integer value-check over the exact selected
    SET, order-free).

    Distributed shape: one shuffle-free map_batches pass; the batch
    kernel reuses the vectorized CSR shingle hasher, computes every
    window's rightmost argmin with w shifted slices over the WHOLE
    concatenated hash buffer (validity-masked per doc, the
    shingle_hashes_batch trick — no per-doc loop for long docs), and
    dedups selected GLOBAL positions with one np.unique + two
    reduceat rollups."""
    from .functions.hashing import shingle_hashes_batch

    rd = _rd()
    K, W = 5, 4

    def winnow(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if not texts:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_shingles": pa.array([], type=pa.int64()),
                "n_fp": pa.array([], type=pa.int64()),
                "fp_xor": pa.array([], type=pa.int64()),
            })
        h, off = shingle_hashes_batch(texts, K)
        cnt = np.diff(off)
        sel_chunks = []
        # long docs: every global window of W hashes, rightmost argmin
        # via W reversed shifted slices; keep windows fully inside one
        # long doc (same delta-mask trick as the hasher)
        nwin = len(h) - W + 1
        long_mask = cnt >= W
        if nwin > 0 and long_mask.any():
            stack = np.stack([h[W - 1 - j: W - 1 - j + nwin]
                              for j in range(W)])
            arg = np.argmin(stack, axis=0)  # first in reversed = rightmost
            sel = np.arange(nwin) + (W - 1 - arg)
            li = np.flatnonzero(long_mask)
            delta = np.zeros(nwin + 1, dtype=np.int32)
            np.add.at(delta, off[li], 1)
            np.add.at(delta, np.minimum(off[li + 1] - W + 1, nwin), -1)
            sel_chunks.append(sel[np.cumsum(delta[:-1]) > 0])
        # short docs: one window over the whole doc
        for i in np.flatnonzero(~long_mask).tolist():
            seg = h[off[i]:off[i + 1]]
            m = seg.min()
            sel_chunks.append(
                np.array([off[i] + np.flatnonzero(seg == m)[-1]],
                         dtype=np.int64)
            )
        sel = np.unique(np.concatenate(sel_chunks))
        bounds = np.searchsorted(sel, off)
        n_fp = np.diff(bounds)
        x = np.bitwise_xor.reduceat(h[sel], bounds[:-1])
        return pa.table({
            "doc_id": pa.array(ids),
            "n_shingles": pa.array(cnt.astype(np.int64)),
            "n_fp": pa.array(n_fp.astype(np.int64)),
            "fp_xor": pa.array(x.view(np.int64)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(winnow, batch_format="pyarrow")


def _ann_topk_ivfpq_sql(nlist: int = 16, nprobe: int = 4, m: int = 8,
                        ks: int = 16, k: int = 10, nq: int = 5) -> str:
    """Bit-exact mirror of `ivfpq_topk_sampled`: one shared splitmix64
    bottom-k sample serves as coarse centroids (cid = vec_id, the IVF
    mirror's convention) AND PQ codebook (code = vec_id rank); coarse
    assignment/probing by the integer score 2(x·c)−c·c, PQ encoding and
    ADC by integer L2 — the full ranking is integer arithmetic."""
    from .stages.sketchq import splitmix64_sql

    return f"""
    WITH samp AS (
      SELECT cwid, ROW_NUMBER() OVER (ORDER BY cwid) - 1 AS code FROM (
        SELECT vec_id AS cwid, {splitmix64_sql('vec_id')} AS hv
        FROM embeddings ORDER BY hv LIMIT {max(nlist, ks)})
    ),
    qe AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS d,
             CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 16777216)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    cq AS (SELECT s.cwid AS cid, qe.d, qe.q
           FROM samp s JOIN qe ON qe.vec_id = s.cwid),
    cnorm AS (SELECT cid, SUM(q * q) AS cc FROM cq GROUP BY cid),
    scores AS (
      SELECT v.vec_id, c.cid, 2 * SUM(v.q * c.q) - MAX(n.cc) AS s
      FROM qe v JOIN cq c ON c.d = v.d JOIN cnorm n ON n.cid = c.cid
      GROUP BY v.vec_id, c.cid
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scores) WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        FROM scores WHERE vec_id < {nq}) WHERE rn <= {nprobe}
    ),
    sub AS (
      SELECT vec_id, d // (len_d // {m}) AS s, d % (len_d // {m}) AS sd, q
      FROM qe, (SELECT COUNT(*) // COUNT(DISTINCT vec_id) AS len_d FROM qe)
    ),
    cw AS (
      SELECT s.code, sub.s, sub.sd, sub.q AS cq
      FROM samp s JOIN sub ON sub.vec_id = s.cwid
    ),
    sd2 AS MATERIALIZED (
      SELECT v.vec_id, v.s, c.code,
             SUM((v.q - c.cq) * (v.q - c.cq)) AS d2
      FROM sub v JOIN cw c ON c.s = v.s AND c.sd = v.sd
      GROUP BY v.vec_id, v.s, c.code
    ),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code, ROW_NUMBER() OVER (
          PARTITION BY vec_id, s ORDER BY d2, code) AS rn
        FROM sd2) WHERE rn = 1
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN assign a ON a.cid = p.cid
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(qd.d2) AS BIGINT) AS adc_dist2
      FROM cand c
      JOIN enc e ON e.vec_id = c.neighbor_id
      JOIN sd2 qd ON qd.vec_id = c.query_id
                 AND qd.s = e.s AND qd.code = e.code
      GROUP BY c.query_id, c.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, adc_dist2 FROM (
      SELECT query_id, neighbor_id, adc_dist2, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc_dist2, neighbor_id) AS rank
      FROM adc
    ) WHERE rank <= {k}
    """


@register("ann_topk_ivfpq", _ann_topk_ivfpq_sql())
def ann_topk_ivfpq(sf_dir: str):
    """IVF-PQ: the composed FAISS-style ANN layout — coarse partition
    pruning (nprobe=4 of 16 lists) over PQ-compressed codes (m=8
    bytes/vector, ADC scoring) — closing the index-family set
    (brute / LSH / IVF / IVF-persisted / PQ / IVF-PQ).  Every stage
    follows the sampled-integer oracle discipline, so coarse
    assignment, probe lists, codes AND the final ADC ranking are all
    bit-pinned by the SQL mirror at 3 sf tiers."""
    from .stages.similarity import _stack, ivfpq_topk_sampled

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    return ivfpq_topk_sampled(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        q.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(q, "embedding"),
        emb.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(emb, "embedding"),
        k=10, nlist=16, nprobe=4, m=8, ks=16,
    )


# ===========================================================================
# Near-dup graph: quality-aware representative selection + triangle census
# ===========================================================================
_NGRAM_PAIRS_CTES = r"""norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(nt, i, 5) AS sh
      FROM norm,
        LATERAL (SELECT unnest(generate_series(1, greatest(length(nt)-4, 1))) AS i) g
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE i / (ca.n + cb.n - i) >= 0.8e0
    )"""


@register(
    "near_dup_keep_best",
    f"""
    WITH RECURSIVE {_NGRAM_PAIRS_CTES},
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab
    ),
    comp AS (
      SELECT node, LEAST(node, MIN(lab)) AS component
      FROM reach GROUP BY node
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, component,
           CAST(CASE WHEN ROW_NUMBER() OVER (
             PARTITION BY component ORDER BY n_chars DESC, doc_id) = 1
             THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM labeled
    """,
)
def near_dup_keep_best(sf_dir: str, cc_gate_rows: int | None = None):
    """Quality-aware near-dup cluster REPRESENTATIVE selection — what a
    real training-data dedup keeps is the BEST document of each fuzzy
    cluster, not the smallest id: per component (the
    `near_dup_components` label set over the deterministic PPJoin edge
    set), the winner is max n_chars with min-doc_id tie-break (any
    integer-exact quality — the Gopher feature score, an LM
    perplexity bucket — plugs into the same packed argmax).

    Distributed shape: components + winner argmax run on the
    DUP-CLUSTER-sized member set (winner = first row of a
    (component, -quality, doc_id) lexsort — equivalently a map-side
    combinable max of quality·2^32 + (2^32-1-doc_id)); the member
    qualities come from a PRUNED (doc_id, n_chars) scan filtered
    against the broadcast dup-node set; the final attach streams the
    corpus against the broadcast (component, kept) maps.  Singletons
    never enter any exchange: kept=1, component=doc_id by default."""
    import ray

    from .stages import dedup_docs

    rd = _rd()
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_docs.ngram_jaccard_pairs(
        docs_ds, threshold=0.8, k=5
    ).materialize()
    if cc_gate_rows is None:
        cc_gate_rows = _CFG.cc_edge_gate
    if pairs.count() <= cc_gate_rows:
        comp = dedup_docs.connected_components(pairs.to_pandas())
    else:
        comp = dedup_docs.connected_components_distributed(pairs).to_pandas()
    nodes = comp["doc_id"].to_numpy(dtype=np.int64)
    labs = comp["component"].to_numpy(dtype=np.int64)
    o = np.argsort(nodes, kind="stable")
    nodes, labs = nodes[o], labs[o]

    mem_ref = ray.put(nodes)

    def members_only(t: pa.Table) -> pa.Table:
        nd = ray.get(mem_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(nd):
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            mask = nd[pos] == ids
        else:
            mask = np.zeros(len(ids), dtype=bool)
        return t.filter(pa.array(mask))

    mem = (
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(members_only, batch_format="pyarrow")
        .to_pandas()
    )
    kept_by_node = np.ones(len(nodes), dtype=np.int64)
    if len(mem):
        mids = mem["doc_id"].to_numpy(dtype=np.int64)
        mq = mem["n_chars"].to_numpy(dtype=np.int64)
        mpos = np.searchsorted(nodes, mids)
        mcomp = labs[mpos]
        order = np.lexsort((mids, -mq, mcomp))
        mc_s, mid_s = mcomp[order], mids[order]
        first = np.ones(len(mc_s), dtype=bool)
        first[1:] = mc_s[1:] != mc_s[:-1]
        win_comp, win_id = mc_s[first], mid_s[first]  # sorted by comp
        wpos = np.searchsorted(win_comp, mcomp)
        kept_m = (win_id[wpos] == mids).astype(np.int64)
        kept_by_node[:] = 0
        kept_by_node[mpos] = kept_m

    ref = ray.put((nodes, labs, kept_by_node))

    def attach(t: pa.Table) -> pa.Table:
        nd, lb, kp = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(nd):
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            hit = nd[pos] == ids
            compv = np.where(hit, lb[pos], ids)
            keptv = np.where(hit, kp[pos], 1)
        else:
            compv = ids
            keptv = np.ones(len(ids), dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "component": pa.array(compv.astype(np.int64)),
            "kept": pa.array(keptv.astype(np.int64)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(attach, batch_format="pyarrow")


@register(
    "near_dup_triangles",
    f"""
    WITH {_NGRAM_PAIRS_CTES},
    edges AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    tn AS (
      SELECT x AS doc_id FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT doc_id, COUNT(*) AS triangles FROM tn GROUP BY doc_id
    """,
)
def near_dup_triangles(sf_dir: str):
    """Per-document TRIANGLE counts over the near-duplicate graph —
    the local-clustering census that distinguishes a tight template
    family (every copy similar to every other: many triangles) from a
    chain of drifting revisions (few): the third graph shape after
    component labels and PageRank, on the same deterministic PPJoin
    edge set so the oracle is a plain 3-way self-join.

    Distributed shape (`stages/dedup_docs.triangle_counts_distributed`,
    equality-pinned to the driver variant by pytest): wedges per apex
    (`groupby(a).map_groups`, one triu call per group), wedges and
    edges CO-SHUFFLED into hash(x, y) buckets, bucket-local vectorized
    closure merge — no Dataset.join (the round-4 empty-block hash-join
    defect), no edge set on any single process — then one small
    groupby-count rollup.  Driver variant below the exact-count gate
    (the near_dup_components routing rule)."""
    from .stages import dedup_docs

    rd = _rd()
    docs_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup_docs.ngram_jaccard_pairs(
        docs_ds, threshold=0.8, k=5
    ).materialize()
    if pairs.count() <= _CFG.cc_edge_gate:
        return dedup_docs.triangle_counts(pairs.to_pandas())
    return dedup_docs.triangle_counts_distributed(pairs)


def _ann_recall_eval_sql() -> str:
    """Recall@10 of the oracle-pinned IVF candidate path against the
    exact brute-force ranking: BOTH sides are already bit-pinned SQL
    mirrors (`ann_topk`, `ann_topk_ivf_sampled`), so the per-query hit
    count is integer-exact — the normally-unverifiable quality metric
    of an ANN index, fully oracled."""
    exact = ORACLES["ann_topk"]
    ivf = _ann_topk_ivf_sampled_sql()
    return f"""
    WITH exact_side AS ({exact}),
    ivf_side AS ({ivf}),
    hits AS (
      SELECT e.query_id, COUNT(*) AS hits
      FROM exact_side e
      JOIN ivf_side i ON i.query_id = e.query_id
                     AND i.neighbor_id = e.neighbor_id
      GROUP BY e.query_id
    )
    SELECT q.query_id, CAST(10 AS BIGINT) AS k,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
           ROUND(COALESCE(h.hits, 0) / 10.0, 4) AS recall
    FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5) q
    LEFT JOIN hits h ON h.query_id = q.query_id
    """


@register("ann_recall_eval", _ann_recall_eval_sql())
def ann_recall_eval(sf_dir: str):
    """ANN index QUALITY EVALUATION — recall@10 of the IVF-sampled
    partition-pruning path against exact brute force, per query.  An
    index eval is a first-class pipeline op (you re-run it whenever
    the corpus or index parameters move); because this engine's IVF
    candidate set is oracle-pinned (splitmix64 centroids + integer
    fixed-point assignment), the eval itself is fully oracled — both
    rankings, the intersection, and the recall ratio are
    bit-reproducible in SQL.

    Distributed shape: two independent broadcast-probe scans of the
    embedding corpus (exact top-k partials + IVF probed lists); the
    intersection runs on the two FINAL-ANSWER-sized rankings
    (nq x k rows each) — nothing corpus-sized leaves the scans."""
    from .stages.similarity import _stack, brute_force_topk, ivf_topk_sampled

    rd = _rd()
    emb = td.read(sf_dir, "embeddings")
    q = emb.filter(pc.less(emb.column("vec_id"), pa.scalar(5)))
    qids = q.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    Q = _stack(q, "embedding")
    exact = brute_force_topk(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"), qids, Q, k=10
    )
    ivf = ivf_topk_sampled(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        qids, Q,
        emb.column("vec_id").to_numpy(zero_copy_only=False),
        _stack(emb, "embedding"),
        k=10, nlist=16, nprobe=4,
    )
    qs = np.sort(qids)
    hits = np.zeros(len(qs), dtype=np.int64)
    for i, qid in enumerate(qs):
        es = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        vs = set(ivf.loc[ivf["query_id"] == qid, "neighbor_id"])
        hits[i] = len(es & vs)
    return pd.DataFrame({
        "query_id": qs,
        "k": np.full(len(qs), 10, dtype=np.int64),
        "hits": hits,
        "recall": _round(hits / 10.0, 4),
    })


def _doc_hash_embed_sql(dim: int = 16) -> str:
    """Bit-exact mirror of the feature-hashing embedder: word hash =
    hash_strings_poly (the CMS/HLL mirror chain), dim = h % {dim},
    sign = bit 4 of h (+1/-1), per-(doc, dim) integer sum, dense 0-fill
    over the doc x dim grid."""
    from .stages.sketchq import splitmix64_sql

    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(word)+1),
                           j -> CAST(unicode(substr(word, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    fin = splitmix64_sql("CAST(p AS HUGEINT)")
    return f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM documents
    ),
    p0 AS (SELECT doc_id, {poly} AS p FROM words),
    h AS (SELECT doc_id, {fin} AS h FROM p0),
    contrib AS (
      SELECT doc_id, CAST(h % {dim} AS BIGINT) AS dim,
             CASE WHEN (h // 16) % 2 = 1 THEN -1 ELSE 1 END AS sgn
      FROM h
    ),
    sums AS (
      SELECT doc_id, dim, SUM(sgn) AS val FROM contrib
      GROUP BY doc_id, dim
    ),
    grid AS (
      SELECT d.doc_id, g.dim
      FROM documents d
      CROSS JOIN (SELECT UNNEST(range(0, {dim})) AS dim) g
    )
    SELECT g.doc_id, CAST(g.dim AS BIGINT) AS dim,
           CAST(COALESCE(s.val, 0) AS BIGINT) AS val
    FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.dim = g.dim
    """


@register("doc_hash_embed", _doc_hash_embed_sql())
def doc_hash_embed(sf_dir: str):
    """EMBEDDING GENERATION as a pipeline stage — signed feature
    hashing (hashing-trick bag of words, Weinberger et al. 2009): each
    token lands in dim h%16 with sign ±1 from bit 4 of the
    SQL-mirrorable poly+splitmix64 hash, summed per doc.  Closes the
    stage the ANN/kmeans entries assume as input (a model-based
    encoder is this same shuffle-free map with an actor-pool __init__
    model load); unlike a neural embed, this one is fully ORACLED —
    the vectors themselves are bit-checked, not just their plumbing.

    Distributed shape: ONE pass, no exchange at all — each batch
    tokenizes (one Arrow C split kernel), hashes the flat token array
    (vectorized poly hash), and scatter-adds into a per-row 16-lane
    accumulator; emits long-format (doc_id, dim, val) rows.  At 100 TB
    the output is 16 int64 rows/doc regardless of document length."""
    from .functions import hashing

    rd = _rd()
    DIM = 16

    def embed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(ids) * DIM, dtype=np.int64)
        if len(flat):
            h = hashing.hash_strings_poly(flat).view(np.uint64)
            dimv = (h % np.uint64(DIM)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(4)) & np.uint64(1)).astype(
                np.int64
            )
            row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            np.add.at(acc, row * DIM + dimv, sign)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, DIM)),
            "dim": pa.array(np.tile(np.arange(DIM, dtype=np.int64),
                                    len(ids))),
            "val": pa.array(acc),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(embed, batch_format="pyarrow")


@register("image_dedup_phash")  # rows-only (pixel decode not SQL-expressible)
def image_dedup_phash(sf_dir: str):
    """Perceptual image DEDUP over corpus-derived media — the
    LAION-style hygiene op byte-level exact dedup cannot do: two
    encodings of the same picture (different PNG filter, PNG vs JPEG)
    hash to the same 64-bit dHash and group together.  To exercise it
    the entry plants a RE-ENCODED copy of every 9th image doc
    (lossless re-encode of the decoded pixels through a different
    filter/codec, media_id + 1e9), exactly the duplicate class a crawl
    carries.

    Distributed shape: decode+hash per batch (task pool, small
    batches), then the shuffle carries (media_id, phash) — 16 B/image,
    never pixels (the exact-dedup hash-only-exchange shape) — and one
    groupby assigns group_min/is_dup.  Deterministic end-to-end;
    pytest pins the planted-copy collapse and the decode-noise
    robustness (rows-only: SQL cannot decode pixels).

    Payload note: the images here are doc-seeded hash-noise TEXTURES
    (through the real PNG/JPEG encoders), not the smooth gradients of
    `media_from_documents` — a dHash collapses any two smooth ramps
    (by design: it is invariant to brightness offsets), so a
    gradient-only corpus would degenerate into one perceptual group
    and the dedup would test nothing."""
    from .functions import hashing
    from .functions import media as _media
    from .stages import multimodal

    rd = _rd()

    def _textured(doc_id: int) -> np.ndarray:
        w = 8 + (doc_id % 8) * 2
        h = 6 + (doc_id % 5) * 2
        yy, xx = np.mgrid[0:h, 0:w]
        seed = (
            np.int64(doc_id) * np.int64(1 << 20)
            + yy.astype(np.int64) * 1024 + xx.astype(np.int64)
        )
        hv = hashing.hash_int64(seed.ravel()).view(np.uint64).reshape(h, w)
        return np.stack(
            [
                (hv & np.uint64(0xFF)).astype(np.uint8),
                ((hv >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8),
                ((hv >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8),
            ],
            axis=2,
        )

    def with_copies(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ids = ids[ids % 3 == 0]  # the media_from_documents image slots
        out_ids: list[int] = []
        out_pay: list[bytes] = []
        for d in ids:
            img = _textured(int(d))
            if (int(d) // 3) % 2:
                from .functions import jpeg as _jp

                payload = _jp.encode_jpeg(img, quality=90)
            else:
                payload = _media.encode_png(img, filter_type=int(d) % 5)
            out_ids.append(int(d))
            out_pay.append(payload)
            if d % 9 == 0:
                # the planted duplicate class: lossless re-encode of
                # the DECODED pixels under a different filter/codec —
                # byte-distinct payload, perceptually identical
                pix = _media.decode_image(payload)
                out_ids.append(int(d) + 1_000_000_000)
                out_pay.append(
                    _media.encode_png(pix, filter_type=(int(d) + 1) % 5)
                )
        return pa.table({
            "media_id": pa.array(np.asarray(out_ids, dtype=np.int64)),
            "payload": pa.array(out_pay, type=pa.binary()),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(with_copies, batch_format="pyarrow")
    return multimodal.phash_dedup(ds)


def _hash_embed_search_sql() -> str:
    """Integer-exact retrieval mirror: dense hashed embeddings (the
    `doc_hash_embed` mirror nested as a CTE), integer dot product via
    a 16-row dim join per pair, ROW_NUMBER ranking on
    (score DESC, match_id) — every operand an integer, so the WHOLE
    ranking is bit-pinned, ties included."""
    return f"""
    WITH emb AS ({_doc_hash_embed_sql()}),
    q AS (SELECT doc_id AS query_id, dim, val FROM emb WHERE doc_id < 5),
    sc AS (
      SELECT q.query_id, e.doc_id AS match_id,
             CAST(SUM(q.val * e.val) AS BIGINT) AS score
      FROM q JOIN emb e ON e.dim = q.dim
      GROUP BY q.query_id, e.doc_id
    )
    SELECT query_id, match_id, rank, score FROM (
      SELECT query_id, match_id, score, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, match_id) AS rank
      FROM sc
    ) WHERE rank <= 10
    """


@register("hash_embed_search", _hash_embed_search_sql())
def hash_embed_search(sf_dir: str):
    """END-TO-END text retrieval on engine-computed vectors: embed
    every document with the feature-hashing encoder (`doc_hash_embed`)
    and rank the corpus against the first 5 docs' embeddings by
    INTEGER dot product — the embed→search composition a RAG/retrieval
    pipeline runs, with no external embedding table.  Because the
    vectors and scores are all integers, the full ranking (not just
    the candidate set) is oracle-pinned — ties resolved by match_id
    both sides.

    Distributed shape: the query matrix is 5x16 int64 (driver-built
    from a pruned filtered read, broadcast once via ray.put); each
    batch embeds itself (the shuffle-free hashing kernel) and emits
    TIE-AWARE per-query top-k partials (lexsort before truncation —
    the BM25 partial lesson), so the driver merge sees
    nq x k x n_blocks rows, never corpus-sized scores."""
    import ray

    from .functions import hashing

    rd = _rd()
    DIM, K = 16, 10

    def _embed_matrix(ids: np.ndarray, texts: pa.ChunkedArray | pa.Array):
        toks = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        acc = np.zeros(len(ids) * DIM, dtype=np.int64)
        if len(flat):
            h = hashing.hash_strings_poly(flat).view(np.uint64)
            dimv = (h % np.uint64(DIM)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(4)) & np.uint64(1)).astype(
                np.int64
            )
            row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            np.add.at(acc, row * DIM + dimv, sign)
        return acc.reshape(len(ids), DIM)

    qdf = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(
            lambda t: t.filter(pc.less(t.column("doc_id"), pa.scalar(5))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    qids = qdf["doc_id"].to_numpy(dtype=np.int64)
    Q = _embed_matrix(qids, pa.array(qdf["text"].tolist()))
    qref = ray.put((qids, Q))

    def score(t: pa.Table) -> pa.Table:
        qi, Qm = ray.get(qref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "match_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.int64()),
        })
        if len(ids) == 0 or len(qi) == 0:
            return empty
        M = _embed_matrix(ids, t.column("text").combine_chunks())
        S = M @ Qm.T  # int64 exact
        outq, outm, outs = [], [], []
        for j in range(len(qi)):
            order = np.lexsort((ids, -S[:, j]))[:K]
            outq.append(np.full(len(order), qi[j], dtype=np.int64))
            outm.append(ids[order])
            outs.append(S[order, j])
        return pa.table({
            "query_id": pa.array(np.concatenate(outq)),
            "match_id": pa.array(np.concatenate(outm)),
            "score": pa.array(np.concatenate(outs)),
        })

    parts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    parts = parts.sort_values(
        ["query_id", "score", "match_id"],
        ascending=[True, False, True], kind="stable",
    )
    top = parts.groupby("query_id", sort=True).head(K).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id").cumcount() + 1).astype(np.int64)
    return top[["query_id", "match_id", "rank", "score"]]


def _source_distinct_kmv_sql(k: int = 16) -> str:
    """Bit-exact mirror of the KMV set-algebra sketch: distinct word
    hashes per source (the CMS/HLL poly+splitmix64 chain), bottom-k
    per source, per-pair union bottom-k (DISTINCT h then ROW_NUMBER —
    ties impossible after DISTINCT), membership flags against both
    member sketches, integer rho + ROUND(rho/k_used, 4)."""
    from .stages.sketchq import splitmix64_sql

    poly = """CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
            list_transform(range(1, length(word)+1),
                           j -> CAST(unicode(substr(word, j, 1)) AS UHUGEINT))),
            (a, c) -> (a * 1099511628211 + c) % 18446744073709551616)
            AS UBIGINT)"""
    fin = splitmix64_sql("CAST(p AS HUGEINT)")
    return f"""
    WITH words AS (
      SELECT DISTINCT source, word FROM (
        SELECT source, UNNEST(string_split(text, ' ')) AS word
        FROM documents)
    ),
    p0 AS (SELECT source, {poly} AS p FROM words),
    hh AS (SELECT DISTINCT source, {fin} AS h FROM p0),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hh) WHERE rn <= {k}
    ),
    prs AS (
      SELECT a.source AS sa, b.source AS sb
      FROM (SELECT DISTINCT source FROM documents) a
      JOIN (SELECT DISTINCT source FROM documents) b
        ON a.source < b.source
    ),
    uni AS (
      SELECT p.sa, p.sb, s.h
      FROM prs p JOIN sk s ON s.source IN (p.sa, p.sb)
      GROUP BY p.sa, p.sb, s.h
    ),
    topu AS (
      SELECT sa, sb, h FROM (
        SELECT sa, sb, h,
               ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
        FROM uni) WHERE rn <= {k}
    ),
    flags AS (
      SELECT t.sa, t.sb, t.h,
             MAX(CASE WHEN s.source = t.sa THEN 1 ELSE 0 END) AS ina,
             MAX(CASE WHEN s.source = t.sb THEN 1 ELSE 0 END) AS inb
      FROM topu t
      JOIN sk s ON s.h = t.h AND s.source IN (t.sa, t.sb)
      GROUP BY t.sa, t.sb, t.h
    )
    SELECT sa AS src_a, sb AS src_b,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(SUM(ina * inb) AS BIGINT) AS inter_in_union,
           ROUND(SUM(ina * inb) / COUNT(*), 4) AS jaccard_est
    FROM flags GROUP BY sa, sb
    """


@register("source_distinct_kmv", _source_distinct_kmv_sql())
def source_distinct_kmv(sf_dir: str):
    """KMV sketch SET ALGEBRA across sources — the sketch-family
    member that answers set QUESTIONS (how much vocabulary do two
    crawl sources share?) rather than point frequencies (CMS) or
    cardinalities (HLL): per source a bottom-k sketch of the distinct
    word-hash set, per pair the classic KMV intersection estimate
    rho/k over the union's bottom-k (Beyer et al. 2007).  k=16 is
    deliberately SMALL for the 31-word battery vocab so truncation is
    actually exercised (the CMS w=16 lesson); real deployments size
    k ~ 1/eps^2.  Everything through rho is integer and the hash is
    the poly+splitmix64 chain, so sketches AND estimates are
    oracle-pinned bit-exactly.

    Distributed shape: per-batch DISTINCT (source, hash) explode +
    per-source bottom-k partial (bottom-k of a union == union of
    bottom-k's, the KMV merge law), one groupby-source merge — the
    exchange is <= k rows per (source, block), never vocabulary-sized;
    pair enumeration runs on the S x k driver-side sketch table
    (sources are few; at many-source scale the pair step is itself a
    groupby over sketch rows)."""
    from .functions import hashing

    rd = _rd()
    K = 16

    def partial(t: pa.Table) -> pa.Table:
        srcs = t.column("source").to_numpy(zero_copy_only=False).astype(
            object
        )
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return pa.table({
                "source": pa.array([], type=pa.string()),
                "h": pa.array([], type=pa.int64()),
            })
        h = hashing.hash_strings_poly(flat).view(np.uint64)
        src_rep = np.repeat(srcs, lens)
        out_s: list[str] = []
        out_h: list[np.ndarray] = []
        for s in np.unique(src_rep):
            hs = np.unique(h[src_rep == s])[:K]  # sorted unique -> bottom-k
            out_s.extend([s] * len(hs))
            out_h.append(hs)
        return pa.table({
            "source": pa.array(out_s, type=pa.string()),
            "h": pa.array(np.concatenate(out_h).view(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(g["h"].to_numpy().view(np.uint64))[:K]
        return pd.DataFrame({
            "source": [g["source"].iloc[0]] * len(hs),
            "h": hs.view(np.int64),
        })

    sk = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    sketches = {
        s: np.sort(g["h"].to_numpy().view(np.uint64))
        for s, g in sk.groupby("source")
    }
    names = sorted(sketches)
    rows = []
    for i, sa in enumerate(names):
        for sb in names[i + 1:]:
            a, b = sketches[sa], sketches[sb]
            uni = np.unique(np.concatenate([a, b]))[:K]
            rho = int(np.isin(uni, a).sum() + np.isin(uni, b).sum()
                      - len(uni))  # in both == ina + inb - 1 summed
            rows.append((sa, sb, len(uni), rho,
                         float(rho) / len(uni) if len(uni) else 0.0))
    out = pd.DataFrame(
        rows, columns=["src_a", "src_b", "k_used", "inter_in_union",
                       "jaccard_est"],
    )
    out["k_used"] = out["k_used"].astype(np.int64)
    out["inter_in_union"] = out["inter_in_union"].astype(np.int64)
    out["jaccard_est"] = _round(out["jaccard_est"].to_numpy(), 4)
    return out


def _embed_moment_matrix_sql() -> str:
    """Integer-exact mirror: dense hashed embeddings (nested CTE) plus
    an intercept column (dim 16, value 1) and the target column
    (dim 17, n_chars), self-joined per doc for every i <= j moment
    SUM(f_i * f_j) — all integers, bit-pinned."""
    return f"""
    WITH emb AS ({_doc_hash_embed_sql()}),
    f AS (
      SELECT doc_id, dim, val FROM emb
      UNION ALL SELECT doc_id, CAST(16 AS BIGINT), CAST(1 AS BIGINT)
        FROM documents
      UNION ALL SELECT doc_id, CAST(17 AS BIGINT),
        CAST(n_chars AS BIGINT) FROM documents
    )
    SELECT a.dim AS i, b.dim AS j,
           CAST(SUM(a.val * b.val) AS BIGINT) AS m
    FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.dim >= a.dim
    GROUP BY a.dim, b.dim
    """


@register("embed_moment_matrix", _embed_moment_matrix_sql())
def embed_moment_matrix(sf_dir: str):
    """Distributed MODEL-TRAINING PRIMITIVE: the second-moment (Gram /
    normal-equation) matrix over [hashed features | intercept |
    target] in ONE streamed pass.  The 171 upper-triangle integers
    carry everything a linear model or PCA needs — X'X, X'y, n
    (at (16,16)), sum(y) (16,17) and sum(y^2) (17,17) — so "fit a
    regression of n_chars on the text features over 100 TB" is this
    op + an 18x18 driver solve; batch SGD's order-dependence is what
    makes it un-oracle-able, full-batch moments are not.

    Distributed shape: per batch ONE F'F matmul (n x 18 int64), the
    exchange is 171 integer rows per block folded by a tiny
    groupby-sum — map-side combinable like every sketch in the
    family; nothing corpus-sized moves."""
    from ray.data.aggregate import Sum

    from .functions import hashing

    rd = _rd()
    DIM = 16

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        empty = pa.table({
            "i": pa.array([], type=pa.int64()),
            "j": pa.array([], type=pa.int64()),
            "m": pa.array([], type=pa.int64()),
        })
        if n == 0:
            return empty
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        flat = pc.list_flatten(toks).to_numpy(
            zero_copy_only=False).astype(object)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        F = np.zeros((n, DIM + 2), dtype=np.int64)
        if len(flat):
            h = hashing.hash_strings_poly(flat).view(np.uint64)
            dimv = (h % np.uint64(DIM)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(4)) & np.uint64(1)).astype(
                np.int64
            )
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            np.add.at(F, (row, dimv), sign)
        F[:, DIM] = 1
        F[:, DIM + 1] = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        P = F.T @ F  # 18x18 int64, exact
        iu, ju = np.triu_indices(DIM + 2)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "m": pa.array(P[iu, ju]),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("m", alias_name="m"))
    )


@register(
    "source_lang_rollup",
    """
    SELECT COALESCE(source, '<all>') AS source,
           COALESCE(lang, '<all>') AS lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY ROLLUP(source, lang)
    """,
)
def source_lang_rollup(sf_dir: str):
    """GROUPING-SETS aggregate (ROLLUP source -> lang -> grand total)
    — the OLAP subtotal shape a mixing report needs in one result:
    per-(source, lang) counts, per-source subtotals, and the corpus
    total, with '<all>' sentinels (COALESCE keys both sides, so the
    value hash pins all three levels at once).

    Distributed shape: ONE exchange at the finest grain — per-batch
    (source, lang) partials -> small groupby-sum — then the coarser
    levels are driver re-aggregations of the ~|sources|x|langs| result
    rows (subtotals of an aggregate never need the corpus again; at
    any scale the rollup fan-out costs |groups|, not |rows|).

    NULL contract: a NULL source/lang would collide with the '<all>'
    rollup sentinel in the SQL mirror (COALESCE maps it to '<all>' at
    the finest grain) while the pandas rollup groups it differently —
    so the kernel ENFORCES non-null group keys per batch (the
    data_quality_checks philosophy: fail loudly on contract breach
    instead of silently mis-bucketing)."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()

    def _assert_keys(t: pa.Table) -> pa.Table:
        bad = (pc.sum(pc.cast(pc.is_null(t.column("source")),
                              pa.int64())).as_py() or 0) + (
              pc.sum(pc.cast(pc.is_null(t.column("lang")),
                             pa.int64())).as_py() or 0)
        if bad:
            raise ValueError(
                f"source_lang_rollup: {bad} NULL source/lang values — "
                "NULL group keys would collide with the '<all>' rollup "
                "sentinel; clean the corpus first"
            )
        return t

    fine = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "lang", "n_chars"])
        .map_batches(_assert_keys, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
    )
    fine["n_docs"] = fine["n_docs"].astype(np.int64)
    fine["sum_chars"] = fine["sum_chars"].astype(np.int64)
    per_src = (
        fine.groupby("source", as_index=False)[["n_docs", "sum_chars"]]
        .sum()
        .assign(lang="<all>")
    )
    total = pd.DataFrame({
        "source": ["<all>"], "lang": ["<all>"],
        "n_docs": [fine["n_docs"].sum()],
        "sum_chars": [fine["sum_chars"].sum()],
    })
    out = pd.concat([fine, per_src, total], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    return out[["source", "lang", "n_docs", "sum_chars"]]


@register(
    "pages_within_radius",
    f"""
    WITH p AS (
      SELECT doc_id, 'https://example.org/p/' || doc_id AS url,
             {td.SQL_PAGE_LON} AS lon, {td.SQL_PAGE_LAT} AS lat
      FROM documents
    ),
    q AS (
      SELECT doc_id AS query_id, lon AS qlon, lat AS qlat
      FROM p WHERE doc_id < 5
    )
    SELECT q.query_id, p.url,
           ROUND((p.lon - q.qlon) * (p.lon - q.qlon)
                 + (p.lat - q.qlat) * (p.lat - q.qlat), 6) AS d2
    FROM q CROSS JOIN p
    WHERE (p.lon - q.qlon) * (p.lon - q.qlon)
          + (p.lat - q.qlat) * (p.lat - q.qlat) <= 25.0
    """,
)
def pages_within_radius(sf_dir: str):
    """RADIUS spatial search — the 2D twin of `ann_range_search`,
    completing the spatial query-shape trio (point-in-polygon / kNN /
    radius): every page within 5 degrees (planar d2 <= 25) of each of
    5 query pages.  One broadcast-probe pass, the per-batch threshold
    filter IS the answer (no merge step); d2 uses the identical
    float expression tree both sides (the td adapter mirroring
    contract), rounded for the hash only.

    Scale path: with the pages layer cell-partitioned (as the store
    keeps it), the probe prunes to cells intersecting the R-disc of
    each query before any distance math — the `pip_nation` grid
    machinery; the battery's flat corpus makes the one-pass filter
    the honest shape here."""
    import ray

    rd = _rd()
    R2 = 25.0
    qids = np.arange(5, dtype=np.int64)
    qlon, qlat = td.page_lonlat(qids)
    ref = ray.put((qids, qlon, qlat))

    def probe(t: pa.Table) -> pa.Table:
        qi, qx, qy = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "url": pa.array([], type=pa.string()),
            "d2": pa.array([], type=pa.float64()),
        })
        if len(ids) == 0:
            return empty
        lon, lat = td.page_lonlat(ids)
        outq, outu, outd = [], [], []
        for j in range(len(qi)):
            dx = lon - qx[j]
            dy = lat - qy[j]
            d2 = dx * dx + dy * dy
            m = d2 <= R2
            if not m.any():
                continue
            outq.append(np.full(int(m.sum()), qi[j], dtype=np.int64))
            outu.extend(f"https://example.org/p/{i}" for i in ids[m])
            outd.append(d2[m])
        if not outq:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(outq)),
            "url": pa.array(outu, type=pa.string()),
            "d2": pa.array(_round(np.concatenate(outd), 6)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(probe, batch_format="pyarrow")


@register(
    "doc_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unicode(substr(text, i, 1)) AS cp
      FROM documents,
        LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) g
    ),
    cc AS (SELECT doc_id, cp, COUNT(*) AS c FROM ch GROUP BY doc_id, cp),
    nn AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                  SUM(c * LN(c)) AS slc
           FROM cc GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(nn.n, 0) AS n,
           ROUND(COALESCE(LN(nn.n) - nn.slc / nn.n, 0.0), 4) AS entropy
    FROM documents d LEFT JOIN nn ON nn.doc_id = d.doc_id
    """,
)
def doc_entropy(sf_dir: str):
    """Character-distribution ENTROPY per document — the
    compression-ratio proxy quality signal (low entropy = repeated
    boilerplate/filler, high = natural text or noise) rounding out the
    quality-feature family (stats / repetition / LM score / Gopher
    rules).  H = ln(n) - (sum c*ln c)/n with the IDENTICAL formula
    tree in numpy and SQL (only summation order differs; ROUND 4
    absorbs it — the battery's float contract).

    Distributed shape: shuffle-free single pass; per batch the
    codepoint runs of ALL docs are counted with one sort+run-length
    over (row, cp) int64 keys and folded per doc with np.add.at — no
    per-doc Python loop, output one row per doc."""
    rd = _rd()

    def ent(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n_doc = len(ids)
        lens = np.fromiter((len(s or "") for s in texts), dtype=np.int64,
                           count=n_doc)
        buf = np.frombuffer(
            "".join(s or "" for s in texts).encode("utf-32-le"),
            dtype=np.uint32,
        ).astype(np.int64)
        H = np.zeros(n_doc, dtype=np.float64)
        if len(buf):
            row = np.repeat(np.arange(n_doc, dtype=np.int64), lens)
            key = row * (np.int64(1) << np.int64(32)) + buf
            key.sort()
            uk, c = np.unique(key, return_counts=True)
            urow = (uk >> np.int64(32)).astype(np.int64)
            slc = np.zeros(n_doc, dtype=np.float64)
            np.add.at(slc, urow, c * np.log(c))
            nz = lens > 0
            H[nz] = np.log(lens[nz]) - slc[nz] / lens[nz]
        return pa.table({
            "doc_id": pa.array(ids),
            "n": pa.array(lens),
            "entropy": pa.array(_round(H, 4)),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(ent, batch_format="pyarrow")


@register(
    "data_quality_checks",
    """
    SELECT 'orders_custkey_fk' AS check_name, COUNT(*) AS violations
    FROM orders o
    WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_orderkey_fk', COUNT(*)
    FROM lineitem l
    WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'documents_docid_unique',
           (SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
    UNION ALL
    SELECT 'documents_nchars_consistent', COUNT(*)
    FROM documents WHERE n_chars != LENGTH(text)
    UNION ALL
    SELECT 'events_ts_null', COUNT(*) FROM events WHERE ts IS NULL
    """,
)
def data_quality_checks(sf_dir: str, _gate_keys: int | None = None):
    """DATA-QUALITY VALIDATION SUITE — the expectations gate a
    production pipeline runs before (and after) every transform:
    FK coverage (orders->customer, lineitem->orders), key uniqueness,
    derived-column consistency (n_chars == LENGTH(text)), null checks;
    one (check_name, violations) row each, all integer-exact.

    Distributed shapes, one per check class: FK coverage — the dim
    side's parquet-metadata row count (an upper bound on its distinct
    keys, read without scanning) decides the shape: at or below
    ``broadcast_keys_max`` the distinct keys are broadcast and each
    fact batch runs the sorted-array anti-probe (the tpch_q22 kernel);
    above the gate NO key set touches the driver — the probe is a hash
    LEFT ANTI join of the fact keys against the dim keys (dedup_exact's
    escape hatch, counted distributed).  Uniqueness = groupby-count on
    the key with the ``sum(c-1)`` reduced per block — the per-key count
    table never lands on the driver.  Consistency/null checks =
    shuffle-free per-batch C-kernel sums.  Each check returns one
    integer.  ``_gate_keys`` overrides the gate for the forced-branch
    test.

    The five checks submit CONCURRENTLY (driver threads; each is still
    a distributed Ray pipeline) so their fixed pipeline ramps overlap
    instead of summing — the checks are independent by construction.
    Dataset CONSTRUCTION (read_parquet path resolution) serializes on
    a lock: Ray's path resolver probes an optional fsspec HTTP module
    whose failing import is not thread-safe; execution overlaps."""
    import threading

    import ray
    from ray.data.aggregate import Count

    from .config import DEFAULT_CONFIG

    rd = _rd()
    _read_lock = threading.Lock()

    def _read(path: str, columns):
        with _read_lock:
            return rd.read_parquet(path, columns=columns)

    gate = (DEFAULT_CONFIG.broadcast_keys_max
            if _gate_keys is None else _gate_keys)

    def _distinct_sorted(path: str, col: str) -> np.ndarray:
        # per-batch uniques union'd on the driver: this path only runs
        # BELOW the broadcast gate, so the union is <= gate keys by
        # construction — no groupby AllToAll needed for a dim side
        def dd(t: pa.Table) -> pa.Table:
            return pa.table({
                col: pa.array(np.unique(
                    t.column(col).to_numpy(zero_copy_only=False)
                    .astype(np.int64)))
            })

        parts = [
            b.column(col).to_numpy(zero_copy_only=False)
            for b in _read(path, [col])
            .map_batches(dd, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def _fk_violations(fact_path: str, fact_col: str,
                       dim_path: str, dim_col: str) -> int:
        import pyarrow.parquet as pq

        # row count from parquet metadata: free upper bound on the
        # dim side's distinct-key count — decides the probe shape
        # without a scan
        n_dim = pq.ParquetFile(dim_path).metadata.num_rows

        if n_dim <= gate:
            dim_keys = _distinct_sorted(dim_path, dim_col)
            ref = ray.put(dim_keys)

            def miss(t: pa.Table) -> pa.Table:
                keys = ray.get(ref)
                v = t.column(fact_col).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                if len(keys):
                    pos = np.clip(np.searchsorted(keys, v), 0, len(keys) - 1)
                    n = int((keys[pos] != v).sum())
                else:
                    n = len(v)
                return pa.table({"n": pa.array([n], type=pa.int64())})

            parts = (
                _read(fact_path, [fact_col])
                .map_batches(miss, batch_format="pyarrow")
                .to_pandas()
            )
            return int(parts["n"].sum())

        # at-scale shape: hash anti-join — dim keys never collected
        n_cpu = (int(ray.cluster_resources().get("CPU", 8))
                 if ray.is_initialized() else 8)
        orphans = _read(fact_path, [fact_col]).join(
            _read(dim_path, [dim_col]),
            join_type="left_anti",
            num_partitions=max(8, n_cpu),
            on=(fact_col,),
            right_on=(dim_col,),
        )
        return int(orphans.count())

    def _check_orders():
        return _fk_violations(
            f"{sf_dir}/orders.parquet", "o_custkey",
            f"{sf_dir}/customer.parquet", "c_custkey")

    def _check_lineitem():
        return _fk_violations(
            f"{sf_dir}/lineitem.parquet", "l_orderkey",
            f"{sf_dir}/orders.parquet", "o_orderkey")

    def _excess(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([int((c - 1).sum())], type=pa.int64())
        })

    def _check_unique():
        return int(
            _read(f"{sf_dir}/documents.parquet", ["doc_id"])
            .groupby("doc_id")
            .aggregate(Count(alias_name="c"))
            .map_batches(_excess, batch_format="pyarrow")
            .to_pandas()["n"].sum()
        )

    def nch(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.int64())
        bad = pc.sum(pc.cast(pc.not_equal(
            t.column("n_chars").cast(pa.int64()), n), pa.int64()))
        return pa.table({
            "n": pa.array([bad.as_py() or 0], type=pa.int64())
        })

    def _check_nchars():
        return int(
            _read(f"{sf_dir}/documents.parquet", ["text", "n_chars"])
            .map_batches(nch, batch_format="pyarrow")
            .to_pandas()["n"].sum()
        )

    def tnull(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array(
                [int(pc.sum(pc.cast(pc.is_null(t.column("ts")),
                                    pa.int64())).as_py() or 0)],
                type=pa.int64(),
            )
        })

    def _check_tsnull():
        return int(
            _read(f"{sf_dir}/events.parquet", ["ts"])
            .map_batches(tnull, batch_format="pyarrow")
            .to_pandas()["n"].sum()
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as ex:
        futs = [ex.submit(f) for f in (
            _check_orders, _check_lineitem, _check_unique,
            _check_nchars, _check_tsnull,
        )]
        v_orders, v_lineitem, v_unique, v_nchars, v_tsnull = (
            f.result() for f in futs
        )

    return pd.DataFrame({
        "check_name": [
            "orders_custkey_fk", "lineitem_orderkey_fk",
            "documents_docid_unique", "documents_nchars_consistent",
            "events_ts_null",
        ],
        "violations": np.array(
            [v_orders, v_lineitem, v_unique, v_nchars, v_tsnull],
            dtype=np.int64,
        ),
    })
