"""Remaining TPC-H query shapes over the driver's tables (round 3, batch 6).

Each function completes a join/aggregation SHAPE the relational suite did not
yet cover (reference analog: the scorecard/report notebooks compose the same
primitives — joins J1, grouped aggregates G1/G5, sorts O1):

- Q7  ``nation_trade_volume``  — multi-fact join chain (lineitem ⋈ supplier
  ⋈ orders ⋈ customer) with tiny-dim broadcast maps at both ends.
- Q8  ``market_share``         — conditional revenue share per year (ratio of
  a flagged sum to the total sum after a 4-way join).
- Q9  ``product_profit``       — substring-filtered part broadcast + profit
  expression, grouped by supplier nation × ship year.
- Q14 ``promo_revenue``        — global conditional ratio (two sums, one scan).
- Q15 ``top_supplier``         — aggregate → global scalar max → equality
  filter (the decorrelated MAX-of-aggregate view shape).
- Q16 ``part_supplier_counts`` — distinct pairs → blocklist ANTI join →
  exact grouped COUNT DISTINCT.
- Q19 ``disjunctive_revenue``  — OR-of-AND predicate groups evaluated as one
  vectorized Arrow mask (disjunctive pushdown).

Scale notes (100 TB posture): lineitem/orders/customer/supplier are treated
as fact tables — every fact⋈fact edge is a hash-partitioned ``Dataset.join``;
only nation/region/part ride as driver-composed broadcast arrays probed with
``pc.index_in``/``pc.take`` (vectorized, shipped once per task, never per
batch).  Facts are filtered and column-pruned BEFORE any shuffle.  No stage
materializes a fact-sized table on the driver: every ``to_pandas`` below
lands on a grouped result whose cardinality is bounded by dimension domains
(nations × years, brand × type × size, one row).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


# shared shuffle-sizing helper now lives next to the join operators
from ..stages.joins import auto_partitions as _auto_partitions  # noqa: E402


def _nation_arrays(sf_dir: str):
    """Aligned (n_nationkey, n_name, r_name) arrays for broadcast probes."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    region_by_rkey = dict(zip(reg["r_regionkey"].to_pylist(),
                              reg["r_name"].to_pylist()))
    nkeys = pc.cast(nat["n_nationkey"].combine_chunks(), pa.int64())
    nnames = nat["n_name"].combine_chunks()
    rnames = pa.array([region_by_rkey[rk]
                       for rk in nat["n_regionkey"].to_pylist()], pa.string())
    return nkeys, nnames, rnames


def _part_arrays(sf_dir: str, columns: list[str]):
    """Aligned part-attribute arrays keyed by p_partkey (tiny-dim broadcast)."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey"] + columns)
    pkeys = pc.cast(part["p_partkey"].combine_chunks(), pa.int64())
    return pkeys, {c: part[c].combine_chunks() for c in columns}


def _probe(keys: pa.Array, values, probe_col) -> pa.Array:
    """Vectorized dim lookup: values[index_in(probe_col, keys)]."""
    idx = pc.index_in(pc.cast(probe_col, pa.int64()), value_set=keys)
    return pc.take(values, idx)


def _round_away(x, nd: int):
    """Half-away-from-zero round (DuckDB round() semantics; numpy/pandas
    round half-to-even)."""
    import numpy as np

    p = 10.0 ** nd
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * p + 0.5) / p


def nation_trade_volume(sf_dir: str, *, num_partitions: int | None = None,
                        end: str = "1998-01-01"):
    """TPC-H Q7 shape: revenue shipped between every cross-nation
    (supplier nation, customer nation) pair per ship year.

    Join plan: lineitem (filtered + pruned at the read) ⋈ supplier on
    suppkey, then ⋈ orders on orderkey, then ⋈ customer on custkey — all
    hash-partitioned ``Dataset.join``s; nation names resolve through ONE
    broadcast probe on each side.  Output ≤ nations² × years rows."""
    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    nkeys, nnames, _ = _nation_arrays(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["l_shipdate"],
                             pa.scalar(pd.Timestamp(end))))
        vol = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        # integerize at 1e4 (volume is exact at 4 dp: 2-dp price × 2-dp
        # discount) so group sums are EXACT int64 regardless of merge order
        # — float partial-sum ordering can straddle a .005 cent boundary
        vol_e4 = pc.cast(pc.round(pc.multiply(vol, pa.scalar(1e4))),
                         pa.int64())
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "volume_e4": vol_e4,
            "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
        })

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    ds = (li.map_batches(prep, batch_format="pyarrow")
          .join(sup, join_type="inner", num_partitions=num_partitions,
                on=("l_suppkey",), right_on=("s_suppkey",)))

    def add_supp_nation(b: pa.Table) -> pa.Table:
        b = b.append_column("supp_nation",
                            _probe(nkeys, nnames, b["s_nationkey"]))
        return b.select(["l_orderkey", "volume_e4", "l_year", "supp_nation"])

    ds = (ds.map_batches(add_supp_nation, batch_format="pyarrow")
          .join(orders, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))
          .join(cust, join_type="inner", num_partitions=num_partitions,
                on=("o_custkey",), right_on=("c_custkey",)))

    def add_cust_nation(b: pa.Table) -> pa.Table:
        b = b.append_column("cust_nation",
                            _probe(nkeys, nnames, b["c_nationkey"]))
        b = b.filter(pc.not_equal(b["supp_nation"], b["cust_nation"]))
        return b.select(["supp_nation", "cust_nation", "l_year",
                         "volume_e4"])

    out = (ds.map_batches(add_cust_nation, batch_format="pyarrow")
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("volume_e4", alias_name="rev_e4")))
    pdf = out.to_pandas()
    pdf["revenue"] = _round_away(pdf["rev_e4"].astype("float64") / 1e4, 2)
    pdf = pdf.drop(columns=["rev_e4"])
    return (pdf.sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


def market_share(sf_dir: str, *, supp_nation: str = "NATION_3",
                 region: str = "ASIA", ptype: str = "PROMO",
                 num_partitions: int | None = None):
    """TPC-H Q8 shape: per order-year share of ``supp_nation``'s revenue in
    ``region``-customer orders of ``ptype`` parts.

    The conditional share is computed as two Sums over the SAME joined
    stream (flagged volume vs total volume) — no second pass, no
    driver-side fact table."""
    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    nkeys, nnames, rnames = _nation_arrays(sf_dir)
    pkeys, pattrs = _part_arrays(sf_dir, ["p_type"])
    promo_keys = pc.filter(pkeys, pc.equal(pattrs["p_type"],
                                           pa.scalar(ptype)))

    def keep_type(b: pa.Table) -> pa.Table:
        mask = pc.is_in(pc.cast(b["l_partkey"], pa.int64()),
                        value_set=promo_keys)
        b = b.filter(mask)
        vol = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "volume": vol})

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    ds = (li.map_batches(keep_type, batch_format="pyarrow")
          .join(sup, join_type="inner", num_partitions=num_partitions,
                on=("l_suppkey",), right_on=("s_suppkey",)))

    def flag_target(b: pa.Table) -> pa.Table:
        nation = _probe(nkeys, nnames, b["s_nationkey"])
        flag = pc.cast(pc.equal(nation, pa.scalar(supp_nation)), pa.float64())
        b = b.append_column("target_volume", pc.multiply(b["volume"], flag))
        return b.select(["l_orderkey", "volume", "target_volume"])

    ds = (ds.map_batches(flag_target, batch_format="pyarrow")
          .join(orders, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))
          .join(cust, join_type="inner", num_partitions=num_partitions,
                on=("o_custkey",), right_on=("c_custkey",)))

    def keep_region(b: pa.Table) -> pa.Table:
        reg = _probe(nkeys, rnames, b["c_nationkey"])
        b = b.filter(pc.equal(reg, pa.scalar(region)))
        return pa.table({
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            "volume": b["volume"],
            "target_volume": b["target_volume"],
        })

    out = (ds.map_batches(keep_region, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("volume", alias_name="total_volume"),
                      Sum("target_volume", alias_name="target")))
    pdf = out.to_pandas()
    pdf["mkt_share"] = (pdf["target"] / pdf["total_volume"]).round(6)
    pdf = pdf[["o_year", "mkt_share"]]
    return pdf.sort_values("o_year").reset_index(drop=True)


def product_profit(sf_dir: str, *, name_token: str = "widget",
                   cost_rate: float = 0.6, num_partitions: int | None = None):
    """TPC-H Q9 shape: profit by supplier nation × ship year over parts whose
    name contains ``name_token``.

    The tables carry no partsupp, so unit cost is the deterministic proxy
    ``cost_rate × p_retailprice`` (documented in the oracle too):
    profit = l_extendedprice·(1−l_discount) − cost_rate·p_retailprice·l_quantity."""
    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])
    nkeys, nnames, _ = _nation_arrays(sf_dir)
    pkeys, pattrs = _part_arrays(sf_dir, ["p_name", "p_retailprice"])
    name_mask = pc.match_substring(pattrs["p_name"], name_token)
    sel_keys = pc.filter(pkeys, name_mask)
    sel_retail = pc.filter(pattrs["p_retailprice"], name_mask)

    def profit_batch(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["l_partkey"], pa.int64()),
                          value_set=sel_keys)
        keep = pc.is_valid(idx)
        b = b.append_column("_retail", pc.take(sel_retail, idx)).filter(keep)
        profit = pc.subtract(
            pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"])),
            pc.multiply(pa.scalar(cost_rate),
                        pc.multiply(b["_retail"], b["l_quantity"])))
        # integerize at 1e4 (profit is exact at 4 dp) — exact int64 sums,
        # no float merge-order noise at rounding boundaries
        profit_e4 = pc.cast(pc.round(pc.multiply(profit, pa.scalar(1e4))),
                            pa.int64())
        return pa.table({
            "l_suppkey": b["l_suppkey"],
            "o_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
            "profit_e4": profit_e4,
        })

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    ds = (li.map_batches(profit_batch, batch_format="pyarrow")
          .join(sup, join_type="inner", num_partitions=num_partitions,
                on=("l_suppkey",), right_on=("s_suppkey",)))

    def add_nation(b: pa.Table) -> pa.Table:
        return pa.table({
            "nation": _probe(nkeys, nnames, b["s_nationkey"]),
            "o_year": b["o_year"],
            "profit_e4": b["profit_e4"],
        })

    out = (ds.map_batches(add_nation, batch_format="pyarrow")
           .groupby(["nation", "o_year"])
           .aggregate(Sum("profit_e4", alias_name="profit_e4_sum")))
    pdf = out.to_pandas()
    pdf["sum_profit"] = _round_away(
        pdf["profit_e4_sum"].astype("float64") / 1e4, 2)
    pdf = pdf.drop(columns=["profit_e4_sum"])
    return (pdf.sort_values(["nation", "o_year"],
                            ascending=[True, False])
            .reset_index(drop=True))


def promo_revenue(sf_dir: str, *, start: str = "1996-01-01",
                  end: str = "1996-02-01", ptype: str = "PROMO"):
    """TPC-H Q14 shape: 100 × promo revenue / total revenue for one ship
    month — a single pruned scan with two native Sum aggregates (the
    conditional sum rides as a flagged column, merge is algebraic)."""
    import pyarrow.dataset as pads

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pd.Timestamp(start))
        & (pads.field("l_shipdate") < pd.Timestamp(end)))
    pkeys, pattrs = _part_arrays(sf_dir, ["p_type"])
    promo_keys = pc.filter(pkeys, pc.equal(pattrs["p_type"],
                                           pa.scalar(ptype)))

    def rev(b: pa.Table) -> pa.Table:
        vol = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        flag = pc.cast(pc.is_in(pc.cast(b["l_partkey"], pa.int64()),
                                value_set=promo_keys), pa.float64())
        return pa.table({"revenue": vol,
                         "promo": pc.multiply(vol, flag)})

    sums = (li.map_batches(rev, batch_format="pyarrow")
            .sum(["revenue", "promo"]))
    share = 100.0 * sums["sum(promo)"] / sums["sum(revenue)"]
    return pd.DataFrame({"promo_revenue": [round(share, 6)]})


def top_supplier(sf_dir: str, *, start: str = "1996-01-01",
                 end: str = "1996-04-01", num_partitions: int | None = None):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    aggregate → global scalar max → equality filter, then a reduce-side
    lookup join for the name (supplier is a fact at 100×, never broadcast).

    Revenue is rounded to 2 decimals BEFORE the max/equality so the filter
    compares at the precision the report publishes (sub-cent float noise
    from differing sum orders cannot flip membership)."""
    num_partitions = _auto_partitions(num_partitions)
    import pyarrow.dataset as pads

    from ..stages.joins import hash_lookup_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pd.Timestamp(start))
        & (pads.field("l_shipdate") < pd.Timestamp(end)))

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": b["l_suppkey"],
            "revenue": pc.multiply(b["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0),
                                               b["l_discount"]))})

    per_supp = (li.map_batches(rev, batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Sum("revenue", alias_name="total_revenue"))
                .map_batches(lambda b: b.set_column(
                    b.schema.get_field_index("total_revenue"),
                    "total_revenue", pc.round(b["total_revenue"], 2)),
                    batch_format="pyarrow"))
    best = per_supp.max("total_revenue")
    winners = per_supp.filter(
        expr=f"total_revenue == {best!r}")
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])

    def tag_left(b: pa.Table) -> pa.Table:
        return b.rename_columns(["key", "total_revenue"])

    def tag_right(b: pa.Table) -> pa.Table:
        return b.rename_columns(["key", "s_name"])

    joined = hash_lookup_join(
        winners.map_batches(tag_left, batch_format="pyarrow"),
        sup.map_batches(tag_right, batch_format="pyarrow"),
        on="key", num_partitions=num_partitions)
    pdf = joined.to_pandas().rename(columns={"key": "s_suppkey"})
    pdf = pdf[["s_suppkey", "s_name", "total_revenue"]]
    return pdf.sort_values("s_suppkey").reset_index(drop=True)


def part_supplier_counts(sf_dir: str, *, exclude_brand: str = "Brand#1",
                         max_acctbal: float = 1500.0,
                         num_partitions: int | None = None):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size) from
    observed lineitem pairs, excluding blocklisted suppliers
    (s_acctbal < ``max_acctbal`` stands in for the complaints predicate).

    Pipeline: per-batch distinct (partkey, suppkey) combiner → grouped
    distinct (only unique pairs shuffle) → distributed ANTI join against the
    blocklist → broadcast part-attribute probe → exact per-group
    COUNT DISTINCT via map_groups."""
    num_partitions = _auto_partitions(num_partitions)
    from ..stages.joins import hash_anti_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def distinct_partial(b: pa.Table) -> pa.Table:
        return b.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    # distinct pairs via a NATIVE aggregate (one Count per pair, dropped
    # after) — not map_groups(head(1)), which would invoke a Python fn per
    # distinct pair (corpus-scale pair counts → corpus-scale Python calls)
    from ray.data.aggregate import Count

    pairs = (li.map_batches(distinct_partial, batch_format="pyarrow")
             .groupby(["l_partkey", "l_suppkey"])
             .aggregate(Count(alias_name="_c"))
             .map_batches(lambda b: b.select(["l_partkey", "l_suppkey"]),
                          batch_format="pyarrow"))

    bad = (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_acctbal"])
           .filter(expr=f"s_acctbal < {max_acctbal}")
           .map_batches(lambda b: b.select(["s_suppkey"])
                        .rename_columns(["l_suppkey"]),
                        batch_format="pyarrow"))
    pairs = hash_anti_join(pairs, bad, on="l_suppkey",
                           num_partitions=num_partitions)

    pkeys, pattrs = _part_arrays(sf_dir, ["p_brand", "p_type", "p_size"])

    def attach_attrs(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["l_partkey"], pa.int64()),
                          value_set=pkeys)
        b = pa.table({
            "p_brand": pc.take(pattrs["p_brand"], idx),
            "p_type": pc.take(pattrs["p_type"], idx),
            "p_size": pc.cast(pc.take(pattrs["p_size"], idx), pa.int64()),
            "l_suppkey": b["l_suppkey"],
        })
        return b.filter(pc.not_equal(b["p_brand"],
                                     pa.scalar(exclude_brand)))

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_brand": [g["p_brand"].iloc[0]],
            "p_type": [g["p_type"].iloc[0]],
            "p_size": [g["p_size"].iloc[0]],
            "supplier_cnt": [int(g["l_suppkey"].nunique())],
        })

    out = (pairs.map_batches(attach_attrs, batch_format="pyarrow")
           .groupby(["p_brand", "p_type", "p_size"])
           .map_groups(count_distinct, batch_format="pandas"))
    pdf = out.to_pandas()
    pdf["supplier_cnt"] = pdf["supplier_cnt"].astype("int64")
    return (pdf.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


def disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under OR-of-AND predicate groups spanning
    part attributes and lineitem quantity — the whole disjunction evaluates
    as one vectorized Arrow mask per batch (no row loop, no join: part
    attributes ride the broadcast probe)."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    pkeys, pattrs = _part_arrays(sf_dir, ["p_brand", "p_size"])

    def clause(b, brand, max_size, qlo, qhi):
        return pc.and_(
            pc.and_(pc.equal(b["_brand"], pa.scalar(brand)),
                    pc.less_equal(b["_size"], pa.scalar(max_size,
                                                        pa.int64()))),
            pc.and_(pc.greater_equal(b["l_quantity"],
                                     pa.scalar(float(qlo))),
                    pc.less_equal(b["l_quantity"], pa.scalar(float(qhi)))))

    def rev(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["l_partkey"], pa.int64()),
                          value_set=pkeys)
        b = b.append_column("_brand", pc.take(pattrs["p_brand"], idx))
        b = b.append_column("_size", pc.cast(pc.take(pattrs["p_size"], idx),
                                             pa.int64()))
        mask = pc.or_(pc.or_(clause(b, "Brand#1", 10, 1, 11),
                             clause(b, "Brand#2", 20, 10, 20)),
                      clause(b, "Brand#3", 30, 20, 30))
        b = b.filter(mask)
        return pa.table({"revenue": pc.multiply(
            b["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), b["l_discount"]))})

    total = li.map_batches(rev, batch_format="pyarrow").sum("revenue")
    return pd.DataFrame({"revenue": [round(total, 4)]})


def heavy_suppliers(sf_dir: str, *, name_token: str = "widget",
                    frac: float = 0.2, num_partitions: int | None = None):
    """TPC-H Q20 shape (nested aggregate → semi-join chain): suppliers whose
    shipped quantity of ``name_token`` parts exceeds ``frac`` × that part's
    TOTAL shipped quantity, reported with their nation.

    Pipeline: part broadcast filter → (supp, part) quantity combiner
    groupby → per-part total via a second groupby joined back reduce-side
    → integer-exact threshold (quantities integerized at 1e2) → distinct
    qualifying suppliers ⋈ supplier (reduce-side lookup) for the name."""
    from ray.data.aggregate import Sum

    from ..stages.joins import hash_lookup_join

    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    pkeys, pattrs = _part_arrays(sf_dir, ["p_name"])
    sel_keys = pc.filter(pkeys, pc.match_substring(pattrs["p_name"],
                                                   name_token))

    def prep(b: pa.Table) -> pa.Table:
        mask = pc.is_in(pc.cast(b["l_partkey"], pa.int64()),
                        value_set=sel_keys)
        b = b.filter(mask)
        q2 = pc.cast(pc.round(pc.multiply(b["l_quantity"],
                                          pa.scalar(100.0))), pa.int64())
        t = pa.table({"l_partkey": b["l_partkey"],
                      "l_suppkey": b["l_suppkey"], "q2": q2})
        return (t.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("q2", "sum")])
                .rename_columns(["l_partkey", "l_suppkey", "q2"]))

    per_ps = (li.map_batches(prep, batch_format="pyarrow")
              .groupby(["l_partkey", "l_suppkey"])
              .aggregate(Sum("q2", alias_name="supp_q2"))
              .materialize())
    per_part = (per_ps.groupby("l_partkey")
                .aggregate(Sum("supp_q2", alias_name="part_q2")))

    joined = hash_lookup_join(per_ps, per_part, on="l_partkey",
                              num_partitions=num_partitions)

    def qualify(b: pa.Table) -> pa.Table:
        # supp_q2 > frac * part_q2, in integers: 2*supp > part for frac=.5
        lhs = pc.multiply(pc.cast(b["supp_q2"], pa.float64()),
                          pa.scalar(1.0))
        keep = pc.greater(lhs, pc.multiply(pa.scalar(frac),
                                           pc.cast(b["part_q2"],
                                                   pa.float64())))
        b = b.filter(keep)
        return (b.select(["l_suppkey"])
                .group_by("l_suppkey").aggregate([]))

    from ray.data.aggregate import Count

    supp_keys = (joined.map_batches(qualify, batch_format="pyarrow")
                 .groupby("l_suppkey")
                 .aggregate(Count(alias_name="_c"))
                 .map_batches(lambda b: b.select(["l_suppkey"])
                              .rename_columns(["key"]),
                              batch_format="pyarrow")
                 # tiny (qualifying suppliers); pin the schema before the
                 # reduce-side lookup join reads it
                 .materialize())
    if supp_keys.count() == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "nation": pd.Series([], dtype="object")})
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name", "s_nationkey"])
    nkeys, nnames, _ = _nation_arrays(sf_dir)

    def sup_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(b["s_suppkey"], pa.int64()),
            "s_name": b["s_name"],
            "nation": _probe(nkeys, nnames, b["s_nationkey"]),
        })

    out = hash_lookup_join(supp_keys,
                           sup.map_batches(sup_side,
                                           batch_format="pyarrow"),
                           on="key", num_partitions=num_partitions)
    pdf = out.to_pandas().rename(columns={"key": "s_suppkey"})
    pdf = pdf[["s_suppkey", "s_name", "nation"]]
    pdf["s_suppkey"] = pdf["s_suppkey"].astype("int64")
    return pdf.sort_values("s_suppkey").reset_index(drop=True)


def min_cost_supplier(sf_dir: str, *, size: int = 5, region: str = "EUROPE",
                      num_partitions: int | None = None):
    """TPC-H Q2 shape (correlated MIN decorrelated into a join): for each
    part of the given size, the supplier(s) in ``region`` offering the
    minimum observed price — min lineitem extendedprice per (part, supplier)
    stands in for partsupp.ps_supplycost (this corpus has no partsupp table;
    same adaptation as Q16/Q20 in this module).  Reference analog: the
    per-group argmin/argmax family of G2 (nb 03 cell 13).

    Pipeline: part-size broadcast filter → per-batch (part, supp) MIN-cents
    combiner → grouped MIN (only distinct pairs shuffle) → region-supplier
    attach via reduce-side lookup join (supplier is a fact at 100×, probed
    reduce-side, never broadcast; only tiny nation/region ride the driver)
    → per-part MIN joined back → integer-exact equality filter → part-name
    broadcast probe.  Prices integerized at 1e2 (cent-exact in this corpus)
    so the min/equality never compares floats."""
    from ray.data.aggregate import Min

    from ..stages.joins import hash_lookup_join

    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])
    pkeys, pattrs = _part_arrays(sf_dir, ["p_size", "p_name"])
    sel_keys = pc.filter(
        pkeys, pc.equal(pc.cast(pattrs["p_size"], pa.int64()),
                        pa.scalar(size, pa.int64())))

    def pair_min(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(pc.cast(b["l_partkey"], pa.int64()),
                              value_set=sel_keys))
        t = pa.table({
            "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            "cost2": pc.cast(pc.round(pc.multiply(b["l_extendedprice"],
                                                  pa.scalar(100.0))),
                             pa.int64())})
        return (t.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("cost2", "min")])
                .rename_columns(["l_partkey", "l_suppkey", "cost2"]))

    ps = (li.map_batches(pair_min, batch_format="pyarrow")
          .groupby(["l_partkey", "l_suppkey"])
          .aggregate(Min("cost2", alias_name="cost2")))

    nkeys, nnames, rnames = _nation_arrays(sf_dir)
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name", "s_acctbal",
                                   "s_nationkey"])

    def region_side(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
            "s_name": b["s_name"],
            "s_acctbal": b["s_acctbal"],
            "nation": _probe(nkeys, nnames, b["s_nationkey"]),
            "_region": _probe(nkeys, rnames, b["s_nationkey"])})
        t = t.filter(pc.equal(t["_region"], pa.scalar(region)))
        return t.drop_columns(["_region"])

    # inner lookup join = SEMI filter to region suppliers + payload attach
    joined = hash_lookup_join(
        ps, sup.map_batches(region_side, batch_format="pyarrow"),
        on="l_suppkey", num_partitions=num_partitions).materialize()
    per_part = (joined.groupby("l_partkey")
                .aggregate(Min("cost2", alias_name="min_cost2")))
    best = hash_lookup_join(joined, per_part, on="l_partkey",
                            num_partitions=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["cost2"], b["min_cost2"]))
        return pa.table({
            "s_acctbal": b["s_acctbal"],
            "s_name": b["s_name"],
            "nation": b["nation"],
            "p_partkey": pc.cast(b["l_partkey"], pa.int64()),
            "p_name": _probe(pkeys, pattrs["p_name"], b["l_partkey"]),
            "cost": pc.divide(pc.cast(b["cost2"], pa.float64()),
                              pa.scalar(100.0))})

    # bounded by |parts of one size| × ties — a report, not a fact table
    pdf = best.map_batches(finish, batch_format="pyarrow").to_pandas()
    return (pdf.sort_values(["s_acctbal", "nation", "s_name", "p_partkey"],
                            ascending=[False, True, True, True])
            .reset_index(drop=True))


def important_parts(sf_dir: str, *, region: str = "EUROPE",
                    mult: float = 1.5,
                    num_partitions: int | None = None):
    """TPC-H Q11 shape (grouped aggregate vs a global-scalar threshold):
    parts whose shipped value through ``region`` suppliers exceeds ``mult``
    × the mean per-part value.  Value = sum of cent-integerized
    extendedprice over lineitems (partsupp stand-in, as in Q2/Q16/Q20
    here).  Q11's fixed-fraction threshold is replaced by a mean-relative
    one so the report stays non-degenerate at every scale factor (a fixed
    fraction of the TOTAL empties out as the part count grows).

    Pipeline: per-batch (part, supp) SUM-cents combiner → grouped SUM →
    reduce-side SEMI join against the region's supplier keys (key-only
    shuffle; supplier never broadcast) → per-part SUM → driver-side scalar
    total + count (two ints) → strict > filter.  The compare is
    ``value2 × n_parts > mult × total`` — integers on the left, one double
    product on the right, identical arithmetic in engine and oracle (no
    float accumulation order in play)."""
    from ..stages.joins import hash_semi_join

    num_partitions = _auto_partitions(num_partitions)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def pair_sum(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            "v2": pc.cast(pc.round(pc.multiply(b["l_extendedprice"],
                                               pa.scalar(100.0))),
                          pa.int64())})
        return (t.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("v2", "sum")])
                .rename_columns(["l_partkey", "l_suppkey", "v2"]))

    pairs = (li.map_batches(pair_sum, batch_format="pyarrow")
             .groupby(["l_partkey", "l_suppkey"])
             .aggregate(Sum("v2", alias_name="v2")))

    nkeys, _, rnames = _nation_arrays(sf_dir)
    rsup = (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
            .map_batches(lambda b: pa.table({
                "l_suppkey": pc.cast(b["s_suppkey"], pa.int64())})
                .filter(pc.equal(_probe(nkeys, rnames, b["s_nationkey"]),
                                 pa.scalar(region))),
                batch_format="pyarrow"))
    pairs = hash_semi_join(pairs, rsup, on="l_suppkey",
                           num_partitions=num_partitions)
    per_part = (pairs.groupby("l_partkey")
                .aggregate(Sum("v2", alias_name="value2"))
                .materialize())
    total2 = int(per_part.sum("value2") or 0)
    n_parts = per_part.count()
    threshold = mult * total2  # one double product, same as the oracle's

    def above_mean(b: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.cast(b["value2"], pa.float64()),
                          pa.scalar(float(n_parts)))
        return b.filter(pc.greater(lhs, pa.scalar(threshold)))

    pdf = (per_part.map_batches(above_mean, batch_format="pyarrow")
           .to_pandas())
    if pdf.empty:
        pdf = pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                            "value2": pd.Series([], dtype="int64")})
    out = pd.DataFrame({
        "p_partkey": pdf["l_partkey"].astype("int64"),
        "value": pdf["value2"].astype("float64") / 100.0})
    return (out.sort_values(["value", "p_partkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def priority_shipments(sf_dir: str, *, start: str = "1996-01-01",
                       end: str = "1997-01-01",
                       num_partitions: int | None = None):
    """TPC-H Q12 shape (fact⋈fact join + conditional counts): lineitems
    shipped inside a window joined to their orders, counting high-priority
    (1-URGENT / 2-HIGH) vs low-priority lines per return flag
    (l_returnflag stands in for l_shipmode, absent from this corpus).

    Pipeline: shipdate-pruned, column-pruned lineitem scan → reduce-side
    lookup join to orders (both facts; |shuffle| = filtered lines + orders,
    key-bucketed) → 0/1 flag columns vectorized per batch → grouped SUM —
    the canonical partial-aggregate-after-join report."""
    import pyarrow.dataset as pads

    from ..stages.joins import hash_lookup_join

    num_partitions = _auto_partitions(num_partitions)
    li = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pd.Timestamp(start))
        & (pads.field("l_shipdate") < pd.Timestamp(end)))
        .map_batches(lambda b: pa.table({
            "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
            "l_returnflag": b["l_returnflag"]}),
            batch_format="pyarrow"))
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderpriority"])
              .map_batches(lambda b: pa.table({
                  "l_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                  "o_orderpriority": b["o_orderpriority"]}),
                  batch_format="pyarrow"))
    joined = hash_lookup_join(li, orders, on="l_orderkey",
                              num_partitions=num_partitions)

    def flags(b: pa.Table) -> pa.Table:
        hi = pc.is_in(b["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi64 = pc.cast(hi, pa.int64())
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "high_line_count": hi64,
            "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi64)})

    out = (joined.map_batches(flags, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                      Sum("low_line_count", alias_name="low_line_count")))
    pdf = out.to_pandas()
    for c in ("high_line_count", "low_line_count"):
        pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values("l_returnflag").reset_index(drop=True)
