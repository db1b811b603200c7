"""Relational operator coverage over the driver's TPC-H-ish tables.

Each function is one engine operator family from SURVEY.md §2 expressed
Ray-Data-first (vectorized Arrow batch kernels, combiner-pattern aggregation,
broadcast joins) with an exact DuckDB oracle in __ray_entry__.oracle_sql:

- filter + project + computed column (M12/M13 analogs)
- grouped aggregates (G1/G5 analogs) with pre-aggregation before the shuffle
- per-group argmax / top-k (G2/O4)
- broadcast hash join (J1)
- global sort + limit (O1/O2)
- distinct (G8), union-all (S3)
- tumbling-window aggregate over the events stream table (§2.9 analog)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _lineitem(sf_dir: str, columns: list[str]):
    return rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=columns)


def filter_project_revenue(sf_dir: str):
    """Vectorized filter + computed column; column-pruned read."""
    ds = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_extendedprice",
                            "l_discount", "l_shipdate"])

    def fn(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["l_shipdate"],
                             pa.scalar(pd.Timestamp("1995-06-01"))))
        rev = pc.round(pc.multiply(b["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0), b["l_discount"])), 6)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "revenue": rev,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate via native Ray aggregates (partial +
    final merge comes for free for algebraic aggs)."""
    ds = _lineitem(sf_dir, ["l_returnflag", "l_linestatus", "l_quantity",
                            "l_extendedprice", "l_discount"])
    out = (ds.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_base_price"),
                      Mean("l_discount", alias_name="avg_disc"),
                      Count(alias_name="count_order")))
    pdf = out.to_pandas()
    pdf["sum_qty"] = pdf["sum_qty"].round(2)
    pdf["sum_base_price"] = pdf["sum_base_price"].round(2)
    pdf["avg_disc"] = pdf["avg_disc"].round(6)
    return pdf.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def top_order_per_customer(sf_dir: str):
    """Per-group argmax with deterministic tie-break (totalprice desc,
    orderkey asc) — the G2 top-post pattern, combiner first so only one
    candidate row per customer per batch shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partials(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        return pa.Table.from_pandas(df.drop_duplicates("o_custkey"),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(1))

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("o_custkey").map_groups(merge, batch_format="pandas"))

    def round_price(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("o_totalprice"),
                            "o_totalprice", pc.round(b["o_totalprice"], 2))

    return out.map_batches(round_price, batch_format="pyarrow")


def orders_by_segment(sf_dir: str, *, num_partitions: int = 16):
    """Distributed hash join (J1 at fact scale): orders ⋈ customer on
    custkey with ``Dataset.join`` — both sides hash-partition on the key.
    Customer is fact-scale at 100× (VERDICT r1 #3): a driver-side broadcast
    dict of every customer would not survive; broadcasts stay reserved for
    the genuinely tiny dims (nation/region/part — see suppliers_by_region)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_custkey",), right_on=("c_custkey",))
    out = (joined.groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("o_totalprice", alias_name="sum_totalprice")))
    pdf = out.to_pandas()
    pdf["sum_totalprice"] = pdf["sum_totalprice"].round(2)
    return pdf.sort_values("c_mktsegment").reset_index(drop=True)


def top100_orders(sf_dir: str):
    """Global sort + limit.  Deterministic across boundaries: secondary key
    orderkey asc (Ray sort is single-key stable enough only per block, so we
    sort by both keys)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    out = ds.sort([("o_totalprice"), ("o_orderkey")],
                  descending=[True, False]).limit(100)

    def round_price(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("o_totalprice"),
                            "o_totalprice", pc.round(b["o_totalprice"], 2))

    return out.map_batches(round_price, batch_format="pyarrow")


def distinct_status_priority(sf_dir: str):
    """Distinct over two columns — per-batch set() combiner then a tiny
    groupby-first (G8 exact-dedup pattern)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority"])

    def partials(b: pa.Table) -> pa.Table:
        seen = sorted(set(zip(b["o_orderstatus"].to_pylist(),
                              b["o_orderpriority"].to_pylist())))
        return pa.table({
            "o_orderstatus": [s for s, _ in seen],
            "o_orderpriority": [p for _, p in seen],
        })

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby(["o_orderstatus", "o_orderpriority"])
            .map_groups(first, batch_format="pandas"))


def union_shipdate_extremes(sf_dir: str):
    """Union-all of two filtered scans, then grouped count (S3 + G1)."""
    cols = ["l_returnflag", "l_shipdate"]
    early = _lineitem(sf_dir, cols).map_batches(
        lambda b: b.filter(pc.less(b["l_shipdate"],
                                   pa.scalar(pd.Timestamp("1993-01-01")))),
        batch_format="pyarrow")
    late = _lineitem(sf_dir, cols).map_batches(
        lambda b: b.filter(pc.greater(b["l_shipdate"],
                                      pa.scalar(pd.Timestamp("1997-01-01")))),
        batch_format="pyarrow")
    out = (early.union(late).groupby("l_returnflag")
           .aggregate(Count(alias_name="n")))
    return out.to_pandas().sort_values("l_returnflag").reset_index(drop=True)


def events_summary(sf_dir: str):
    """G5-style summary stats: per event_type row counts, value stats, null
    counts and exact distinct users via two-level groupby (scales: first
    level collapses (type,user) pairs, second level is tiny)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "value", "props"])

    def partials(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("event_type").agg(
            n=("event_type", "size"),
            sum_value=("value", "sum"),
            n_null_props=("props", lambda s: int(s.isna().sum())),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "event_type": g["event_type"].iloc[0],
            "n": int(g["n"].sum()),
            "sum_value": float(g["sum_value"].sum()),
            "n_null_props": int(g["n_null_props"].sum()),
        }])

    base = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("event_type").map_groups(merge, batch_format="pandas")
            .to_pandas())

    users = (ds.groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="c"))
             .groupby("event_type").aggregate(Count(alias_name="n_users"))
             .to_pandas())
    out = base.merge(users, on="event_type")
    out["avg_value"] = (out["sum_value"] / out["n"]).round(6)
    out = out.drop(columns=["sum_value"])
    return out.sort_values("event_type").reset_index(drop=True)


def hourly_event_windows(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events log (streaming-shaped
    workload → groupby on (key, window_start), ray_guide §Streaming)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return b.append_column("window_start",
                               pc.strftime(hour, format="%Y-%m-%d %H:00:00"))

    out = (ds.map_batches(add_window, batch_format="pyarrow")
           .groupby(["event_type", "window_start"])
           .aggregate(Count(alias_name="n"),
                      Sum("value", alias_name="sum_value"),
                      Min("value", alias_name="min_value"),
                      Max("value", alias_name="max_value")))
    pdf = out.to_pandas()
    for c in ("sum_value", "min_value", "max_value"):
        pdf[c] = pdf[c].round(6)
    return pdf.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def suppliers_by_region(sf_dir: str):
    """Two-level broadcast join over tiny dimension tables (supplier ⋈ nation
    ⋈ region): nation→region maps are composed driver-side (25 + 5 rows),
    shipped once via closure, looked up inside map_batches — no shuffle."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    region_by_rkey = dict(zip(reg["r_regionkey"].to_pylist(),
                              reg["r_name"].to_pylist()))
    # composed nation→region lookup as ALIGNED ARRAYS for a vectorized
    # index_in/take probe (no per-row Python in the hot map)
    nkeys = pa.array(nat["n_nationkey"].to_pylist(), pa.int64())
    rnames = pa.array([region_by_rkey[rk]
                       for rk in nat["n_regionkey"].to_pylist()], pa.string())

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def join_batch(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["s_nationkey"], pa.int64()),
                          value_set=nkeys)
        return b.append_column("r_name", pc.take(rnames, idx))

    out = (sup.map_batches(join_batch, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(Count(alias_name="n_suppliers"),
                      Sum("s_acctbal", alias_name="sum_acctbal")))
    pdf = out.to_pandas()
    pdf["sum_acctbal"] = pdf["sum_acctbal"].round(2)
    return pdf.sort_values("r_name").reset_index(drop=True)


def revenue_by_brand(sf_dir: str):
    """Fact-dim broadcast join at scale (lineitem ⋈ part): the part side is
    small → ray.put once, per-batch array lookup; revenue aggregated with
    native algebraic aggregates.  The 100 TB shape: dim broadcast beats a
    shuffle join whenever the dim fits in the object store."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    # broadcast ONCE as aligned Arrow arrays; the per-batch probe is a
    # vectorized index_in + take (zero per-row Python)
    ref = ray.put((pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
                   part["p_brand"].combine_chunks()))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice", "l_discount"])

    def join_batch(b: pa.Table) -> pa.Table:
        pkeys, brands_arr = ray.get(ref)
        idx = pc.index_in(pc.cast(b["l_partkey"], pa.int64()),
                          value_set=pkeys)
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"p_brand": pc.take(brands_arr, idx),
                         "revenue": rev})

    out = (li.map_batches(join_batch, batch_format="pyarrow")
           .groupby("p_brand")
           .aggregate(Count(alias_name="n_lineitems"),
                      Sum("revenue", alias_name="sum_revenue")))
    pdf = out.to_pandas()
    pdf["sum_revenue"] = pdf["sum_revenue"].round(2)
    return pdf.sort_values("p_brand").reset_index(drop=True)


def make_window_explode_kernel(window_hours: int):
    """Vectorized replicate-then-tumble explode (VERDICT r2 #4: the r2 kernel
    was a per-row Python loop with a ``strftime`` per emitted row — the hot
    ×window_hours multiplier of the sliding-window pipeline).  One
    ``floor_temporal`` + per-OFFSET duration subtract + strftime over whole
    columns; the only Python loop is over the ``window_hours`` offsets."""
    import datetime as dt

    def explode_windows(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        val = pc.cast(b["value"], pa.float64())
        # strftime only over the DISTINCT hours (bounded by the time range,
        # not the row count), then a take per row — strftime is the dominant
        # cost at full-column width
        uniq = pc.unique(hour.combine_chunks() if isinstance(
            hour, pa.ChunkedArray) else hour)
        idx = pc.index_in(hour, value_set=uniq)
        pieces = []
        for off in range(window_hours):
            labels = pc.strftime(
                pc.subtract(uniq, pa.scalar(dt.timedelta(hours=off))),
                format="%Y-%m-%d %H:00:00")
            pieces.append(pa.table({
                "event_type": b["event_type"],
                "window_start": pc.take(labels, idx),
                "value": val,
            }))
        return pa.concat_tables(pieces)

    return explode_windows


def sliding_event_windows(sf_dir: str, *, window_hours: int = 3):
    """SLIDING window aggregate (window = ``window_hours``, slide = 1h): each
    event is flat-mapped into every window that covers it (one row per
    covering window inside map_batches — the standard replicate-then-tumble
    reduction of a sliding window to a keyed groupby), then aggregated with
    native algebraic aggregates.  Shuffle volume = window_hours × |events|
    partials, pre-combined per batch."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    explode_windows = make_window_explode_kernel(window_hours)

    out = (ds.map_batches(explode_windows, batch_format="pyarrow")
           .groupby(["event_type", "window_start"])
           .aggregate(Count(alias_name="n"),
                      Sum("value", alias_name="sum_value")))

    def round_cols(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("sum_value"),
                            "sum_value", pc.round(b["sum_value"], 6))

    return out.map_batches(round_cols, batch_format="pyarrow")


def orders_pivot(sf_dir: str):
    """Pivot / wide aggregation: order counts by priority (rows) × status
    (columns).  Combiner-first: per-batch (priority, status) counts, native
    Sum merge, then the tiny merged table pivots driver-side."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderstatus"])

    def partials(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = (df.groupby(["o_orderpriority", "o_orderstatus"])
             .size().rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["o_orderpriority", "o_orderstatus"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    wide = (merged.pivot_table(index="o_orderpriority",
                               columns="o_orderstatus", values="n",
                               fill_value=0, aggfunc="sum")
            .reset_index())
    # fixed output schema (F/O/P are the TPC-H order statuses) so the pivot
    # is schema-stable even when a status is absent at some scale
    for status in ("F", "O", "P"):
        wide[f"n_{status}"] = (wide[status] if status in wide else 0)
    out = wide[["o_orderpriority", "n_F", "n_O", "n_P"]].copy()
    for c in ("n_F", "n_O", "n_P"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def running_totals(sf_dir: str, *, n_customers: int = 50):
    """Per-key ordered cumulative aggregate (the prefix-scan family):
    running order-value total per customer ordered by (date, orderkey).
    groupby(custkey) co-locates a customer's history; per-group pandas sort +
    cumsum.  Restricted to custkey < n_customers to keep the gate output
    small — the operator itself streams over all keys."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b["o_custkey"], n_customers)),
        batch_format="pyarrow")

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
        g["running_total"] = g["o_totalprice"].cumsum().round(2)
        g["o_totalprice"] = g["o_totalprice"].round(2)
        g["o_orderdate"] = g["o_orderdate"].astype(str).str[:10]
        return g

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


def value_quantiles(sf_dir: str, *, qs=(0.5, 0.95)):
    """Exact per-group quantiles (linear interpolation, numpy/DuckDB
    quantile_cont semantics): groupby(event_type) co-locates each type's
    values; per-group numpy quantile.  Partitioning assumption: one type's
    values fit a worker — when they don't, stages/skew.approx_quantile_* is
    the sketch-based scale path."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["value"].to_numpy()
        row = {"event_type": g["event_type"].iloc[0]}
        for q in qs:
            row[f"p{int(q * 100)}"] = round(float(np.quantile(vals, q)), 6)
        return pd.DataFrame([row])

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pandas")


def shipping_priority(sf_dir: str, *, segment: str = "BUILDING",
                      num_partitions: int = 16):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue per order, top
    10.  Demonstrates the DISTRIBUTED hash join (``Dataset.join`` — both
    sides hash-partitioned on the key) for the fact-fact edge
    (orders ⋈ lineitem), where neither side fits a broadcast at 100 TB; the
    tiny customer side stays a broadcast dict."""
    # BUILDING-segment semi-join carried by a DISTRIBUTED hash join: customer
    # is fact-scale at 100× (VERDICT r1 #3), so the segment filter pushes
    # down to the customer scan and the surviving keys hash-partition against
    # orders — no driver-side key set, no closure broadcast.
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    cust_f = (cust.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], segment))
                   .drop_columns(["c_mktsegment"]),
        batch_format="pyarrow"))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate",
                                      "o_orderpriority"])
    orders_f = (orders.join(cust_f, join_type="inner",
                            num_partitions=num_partitions,
                            on=("o_custkey",), right_on=("c_custkey",))
                .drop_columns(["o_custkey"]))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": rev})

    li_rev = li.map_batches(revenue, batch_format="pyarrow")

    joined = li_rev.join(orders_f, join_type="inner",
                         num_partitions=num_partitions,
                         on=("l_orderkey",), right_on=("o_orderkey",))

    agg = (joined.groupby("l_orderkey")
           .aggregate(Sum("revenue", alias_name="revenue"),
                      Min("o_orderdate", alias_name="o_orderdate"),
                      Min("o_orderpriority", alias_name="o_orderpriority")))
    pdf = agg.to_pandas()
    pdf["revenue"] = pdf["revenue"].round(6)
    pdf["o_orderdate"] = pdf["o_orderdate"].astype(str).str[:10]
    pdf = pdf.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(10)
    return pdf.reset_index(drop=True)


def lag_lead_events(sf_dir: str):
    """Per-key window-shift functions (LAG/LEAD + gap-to-previous) over the
    events log — the peephole window family the tumbling/sliding aggregates
    don't cover.  groupby(user_id).map_groups co-locates each key, the
    within-group kernel is a vectorized pandas shift (no Python row loop);
    shuffle payload is exactly the projected columns.  Partitioning
    assumption: one user's history fits a worker (same contract as
    sessionize/running_totals); deterministic order inside a group is
    (ts, event_id) — event_id breaks timestamp ties."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["prev_value"] = g["value"].shift(1).round(6)
        g["next_value"] = g["value"].shift(-1).round(6)
        g["gap_s"] = (g["ts"] - g["ts"].shift(1)).dt.total_seconds().round(6)
        g["value"] = g["value"].round(6)
        return g

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


PRICE_BANDS = (("budget", 0.0, 2000.0), ("economy", 2000.0, 10000.0),
               ("mid", 10000.0, 30000.0), ("premium", 30000.0, 60000.0),
               ("luxury", 60000.0, None))


def price_band_join(sf_dir: str):
    """RANGE (inequality) join: lineitem prices against a small table of
    half-open price bands — the broadcast pattern for any theta-join whose
    small side is a set of disjoint intervals.  The band table's lower
    edges are shipped once in the task closure (5 floats); each batch
    resolves its band via ONE vectorized ``np.searchsorted`` instead of a
    cross-product filter (what a shuffle theta-join would do), then
    pre-aggregates, so the groupby only ever sees |bands| rows per block.
    Documented assumption: intervals are disjoint + sorted; overlapping
    bands would need the flat_map variant (emit one row per matching band).
    """
    import numpy as np

    names = [b[0] for b in PRICE_BANDS]
    lows = np.array([b[1] for b in PRICE_BANDS], dtype=np.float64)
    ds = _lineitem(sf_dir, ["l_extendedprice"])

    def partials(b: pa.Table) -> pa.Table:
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lows, p, side="right") - 1
        n = np.bincount(idx, minlength=len(names))
        # integer cents (prices are 2-decimal by schema): partial sums are
        # exact at any block order, so the distributed fold can't drift from
        # a sequential oracle at the rounding boundary
        cents = np.rint(p * 100.0).astype(np.int64)
        s = np.zeros(len(names), dtype=np.int64)
        np.add.at(s, idx, cents)
        keep = n > 0
        return pa.table({
            "band": pa.array(np.asarray(names, dtype=object)[keep],
                             pa.string()),
            "n": pa.array(n[keep].astype("int64")),
            "cents": pa.array(s[keep]),
        })

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("n", alias_name="n_items"),
                      Sum("cents", alias_name="cents"))
           .to_pandas())
    lo_by_band = {b[0]: b[1] for b in PRICE_BANDS}
    out["lo"] = out["band"].map(lo_by_band)
    out["sum_price"] = out["cents"].astype("int64") / 100.0
    out["avg_price"] = (out["sum_price"] / out["n_items"]).round(6)
    return (out[["band", "lo", "n_items", "sum_price", "avg_price"]]
            .sort_values("lo").reset_index(drop=True))


def urgent_lineitems(sf_dir: str):
    """Bloom-prefiltered SEMI join: lineitem rows belonging to 1-URGENT
    orders.  The urgent orderkeys are folded into a broadcast Bloom filter
    (distributed OR-fold build) that drops ~4/5 of lineitem BEFORE the
    exact reduce-side semi join — the shuffle moves only candidates, and
    the exact phase removes Bloom false positives, so the result equals a
    plain semi join (the SQL oracle).  See stages/joins.py:bloom_semi_join
    for the scale contract."""
    from ..stages.joins import bloom_semi_join

    li = _lineitem(sf_dir, ["l_orderkey", "l_linenumber", "l_extendedprice"])
    urgent = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderpriority"])
              .filter(expr="o_orderpriority == '1-URGENT'")
              .select_columns(["o_orderkey"])
              .map_batches(lambda b: b.rename_columns(["l_orderkey"]),
                           batch_format="pyarrow"))
    return bloom_semi_join(li, urgent, on="l_orderkey")


def orders_upsert(sf_dir: str):
    """CDC upsert demo: a derived delta (every 10th order re-priced at
    +1000, version 2) merged over the base table (version 1) with
    last-writer-wins — see stages/joins.py:upsert_merge.  The delta is a
    deterministic function of the base so the SQL oracle recomputes both
    sides exactly."""
    from ..stages.joins import upsert_merge

    def with_version(v: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "version", pa.array([v] * b.num_rows, pa.int64()))
        return fn

    base = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
            .map_batches(with_version(1), batch_format="pyarrow"))

    def reprice(b: pa.Table) -> pa.Table:
        import numpy as np

        keys = np.asarray(b["o_orderkey"].combine_chunks()
                          if isinstance(b["o_orderkey"], pa.ChunkedArray)
                          else b["o_orderkey"], dtype=np.int64)
        b = b.filter(pa.array(keys % 10 == 0))
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_totalprice": pc.add(b["o_totalprice"], pa.scalar(1000.0))})

    delta = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
             .map_batches(reprice, batch_format="pyarrow")
             .map_batches(with_version(2), batch_format="pyarrow"))
    return upsert_merge(base, delta, key="o_orderkey", version_col="version")


def _orders_fine_cents(sf_dir: str) -> pd.DataFrame:
    """The ONE distributed aggregation ROLLUP and CUBE share: per
    (status, priority) count + exact integer-cents sum."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"],
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({"o_orderstatus": b["o_orderstatus"],
                         "o_orderpriority": b["o_orderpriority"],
                         "cents": cents})

    return (ds.map_batches(to_cents, batch_format="pyarrow")
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Count(alias_name="n"),
                       Sum("cents", alias_name="cents"))
            .to_pandas())


def orders_cube(sf_dir: str):
    """CUBE / full grouping sets over (status, priority): the ROLLUP levels
    plus the priority-only margin.  Identical scale shape to
    ``orders_rollup`` — ONE distributed shuffle at the finest grouping
    (vocabulary-sized result), every coarser level an algebraic driver-side
    fold of those partials; integer-cents money keeps all four levels exact
    under any accumulation order."""
    fine = _orders_fine_cents(sf_dir)
    by_status = (fine.groupby("o_orderstatus", as_index=False)
                 .agg(n=("n", "sum"), cents=("cents", "sum")))
    by_status["o_orderpriority"] = None
    by_prio = (fine.groupby("o_orderpriority", as_index=False)
               .agg(n=("n", "sum"), cents=("cents", "sum")))
    by_prio["o_orderstatus"] = None
    grand = pd.DataFrame([{
        "o_orderstatus": None, "o_orderpriority": None,
        "n": int(fine["n"].sum()), "cents": int(fine["cents"].sum())}])
    out = pd.concat([fine, by_status, by_prio, grand], ignore_index=True)
    out["sum_price"] = out["cents"].astype("int64") / 100.0
    out["n"] = out["n"].astype("int64")
    return (out[["o_orderstatus", "o_orderpriority", "n", "sum_price"]]
            .sort_values(["o_orderstatus", "o_orderpriority"],
                         na_position="first")
            .reset_index(drop=True))


def events_by_segment(sf_dir: str):
    """Skew-aware fact ⋈ dim join: events ⋈ customer on user_id, with hot
    users (detected by a deterministic row sample) broadcast instead of
    shuffled — see stages/skew.py:skew_broadcast_join.  Result is the plain
    inner join (the oracle); only the movement plan is skew-dependent."""
    from ..stages.skew import skew_broadcast_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])

    def round_val(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("value"), "value",
                            pc.round(b["value"], ndigits=6))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    return skew_broadcast_join(
        ev.map_batches(round_val, batch_format="pyarrow"), cust,
        on="user_id", right_on="c_custkey", right_cols=["c_mktsegment"],
        row_id_col="event_id", sample_mod=5, hot_threshold=15)


def orders_rollup(sf_dir: str):
    """ROLLUP / grouping-sets aggregate: (status, priority) → (status) →
    grand total.  Only the FINEST grouping is distributed — its result is
    vocabulary-sized (|status| × |priority| rows), and the coarser levels
    are algebraic folds of those partials computed driver-side, so a rollup
    costs exactly one shuffle regardless of how many levels it has.

    Money is summed as integer CENTS (prices are 2-decimal by schema), so
    every level's total is exact and independent of accumulation order —
    float partial sums would drift between the engine's block order and any
    oracle's scan order at the rounding boundary."""
    fine = _orders_fine_cents(sf_dir)
    by_status = (fine.groupby("o_orderstatus", as_index=False)
                 .agg(n=("n", "sum"), cents=("cents", "sum")))
    by_status["o_orderpriority"] = None
    grand = pd.DataFrame([{
        "o_orderstatus": None, "o_orderpriority": None,
        "n": int(fine["n"].sum()), "cents": int(fine["cents"].sum())}])
    out = pd.concat([fine, by_status, grand], ignore_index=True)
    out["sum_price"] = out["cents"].astype("int64") / 100.0
    out["n"] = out["n"].astype("int64")
    return (out[["o_orderstatus", "o_orderpriority", "n", "sum_price"]]
            .sort_values(["o_orderstatus", "o_orderpriority"],
                         na_position="first")
            .reset_index(drop=True))


def _distinct_keys_tagged(ds, keys: list[str], flag: str):
    """Per-batch distinct key tuples, tagged with a presence flag column —
    the map side of the set-op shuffle (block-local dedup first, so the
    exchange carries ≤ distinct-keys-per-block rows, not raw rows)."""
    def fn(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(keys), keys,
                            use_threads=False).aggregate([])
        ones = pa.array([1] * g.num_rows, pa.int64())
        zeros = pa.array([0] * g.num_rows, pa.int64())
        return (g.append_column("in_l", ones if flag == "l" else zeros)
                .append_column("in_r", ones if flag == "r" else zeros))
    return ds.select_columns(keys).map_batches(fn, batch_format="pyarrow")


def distinct_set_op(left_ds, right_ds, keys: list[str], op: str):
    """Distributed INTERSECT / EXCEPT with SQL DISTINCT set semantics.

    Shape: both sides collapse block-locally to distinct tagged key rows,
    union-all, then ONE native groupby(keys) with Max(in_l)/Max(in_r) —
    presence on each side is an algebraic max, so the shuffle moves only
    per-block-distinct keys and the reduce is Arrow-native (no Python
    per-group UDF).  intersect = both flags set; except = left-only.
    This is the textbook shared-shuffle plan for set ops (one exchange for
    any number of INTERSECT/EXCEPT branches over the same key)."""
    tagged = _distinct_keys_tagged(left_ds, keys, "l").union(
        _distinct_keys_tagged(right_ds, keys, "r"))
    merged = tagged.groupby(keys).aggregate(
        Max("in_l", alias_name="in_l"), Max("in_r", alias_name="in_r"))

    def keep(b: pa.Table) -> pa.Table:
        if op == "intersect":
            mask = pc.and_(pc.equal(b["in_l"], 1), pc.equal(b["in_r"], 1))
        elif op == "except":
            mask = pc.and_(pc.equal(b["in_l"], 1), pc.equal(b["in_r"], 0))
        else:
            raise ValueError(f"unknown set op: {op}")
        return b.filter(mask).select(keys)

    return merged.map_batches(keep, batch_format="pyarrow")


def _custkeys_by_year(sf_dir: str, year: int):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    lo = pa.scalar(pd.Timestamp(f"{year}-01-01"))
    hi = pa.scalar(pd.Timestamp(f"{year + 1}-01-01"))
    return ds.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                                   pc.less(b["o_orderdate"], hi)))
        .select(["o_custkey"]),
        batch_format="pyarrow")


def customers_both_years(sf_dir: str, *, y1: int = 1996, y2: int = 1997):
    """INTERSECT: customers who ordered in BOTH years."""
    return distinct_set_op(_custkeys_by_year(sf_dir, y1),
                           _custkeys_by_year(sf_dir, y2),
                           ["o_custkey"], "intersect")


def customers_lapsed(sf_dir: str, *, y1: int = 1996, y2: int = 1997):
    """EXCEPT: customers who ordered in y1 but not y2 (churn list)."""
    return distinct_set_op(_custkeys_by_year(sf_dir, y1),
                           _custkeys_by_year(sf_dir, y2),
                           ["o_custkey"], "except")


def event_funnel(sf_dir: str, *, window_hours: int = 24):
    """Ordered funnel analysis (view → click → purchase) over the events
    log — the sequence-pattern family sessionize/lag_lead don't cover.
    Each step must happen strictly after the previous step's first match
    and within ``window_hours`` of it.  groupby(user_id) co-locates a
    user's history; the per-group kernel is three vectorized min-over-mask
    probes (no sort needed — min of a masked timestamp array).  The final
    rollup pre-aggregates per block (a 3-int vector) before a 3-row
    groupby, so the shuffle sees O(blocks) rows.  Partitioning assumption:
    one user's history fits a worker (same contract as sessionize)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    win = np.timedelta64(window_hours * 3600, "s")
    steps = ("view", "click", "purchase")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        reached = 0
        prev = None
        for step in steps:
            mask = et == step
            if prev is not None:
                mask &= (ts > prev) & (ts <= prev + win)
            if not mask.any():
                break
            prev = ts[mask].min()
            reached += 1
        return pd.DataFrame({"reached": [reached]})

    per = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

    def partials(b: pa.Table) -> pa.Table:
        r = b["reached"].to_numpy(zero_copy_only=False)
        names, counts = [], []
        for i, step in enumerate(steps):
            names.append(f"{i + 1}_{step}")
            counts.append(int((r >= i + 1).sum()))
        return pa.table({"step": pa.array(names, pa.string()),
                         "users": pa.array(counts, pa.int64())})

    out = (per.map_batches(partials, batch_format="pyarrow")
           .groupby("step").aggregate(Sum("users", alias_name="users"))
           .to_pandas())
    out["users"] = out["users"].astype("int64")
    return out.sort_values("step").reset_index(drop=True)


def daily_moving_avg(sf_dir: str, *, window_days: int = 7):
    """Trailing moving average (ROWS BETWEEN k PRECEDING frame) of daily
    revenue per order priority.  Per-block Arrow group_by partials →
    groupby(priority) — days are calendar-bounded, so one priority's daily
    series always fits a worker (~36.5K rows/century).  Money is exact
    integer cents through the fold; the rolling sum is a cumsum difference
    (each window sum is exact, no sliding-error accumulation)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderdate",
                                  "o_totalprice"])

    def partials(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        pa.int64())
        day = pc.strftime(b["o_orderdate"], format="%Y-%m-%d")
        t = pa.table({"priority": b["o_orderpriority"], "day": day,
                      "cents": cents})
        return pa.TableGroupBy(t, ["priority", "day"]).aggregate(
            [("cents", "sum")]).rename_columns(["priority", "day", "cents"])

    def per_priority(g: pd.DataFrame) -> pd.DataFrame:
        priority = g["priority"].iloc[0]
        g = (g.groupby("day", as_index=False)["cents"].sum()
             .sort_values("day").reset_index(drop=True))
        c = g["cents"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(c)])
        k = window_days
        idx = np.arange(len(c))
        lo = np.maximum(idx - (k - 1), 0)
        win = cum[idx + 1] - cum[lo]
        n = idx - lo + 1
        out = pd.DataFrame({"priority": priority, "day": g["day"]})
        out["revenue"] = np.round(c / 100.0, 2)
        # half-away round like DuckDB round(x, 6) (values non-negative)
        out["moving_avg"] = np.floor(((win / 100.0) / n) * 1e6 + 0.5) / 1e6
        return out[["priority", "day", "revenue", "moving_avg"]]

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("priority").map_groups(per_priority,
                                            batch_format="pandas"))


def _year_totals(sf_dir: str, year: int):
    """Per-customer (n_orders, cents) for one calendar year — combiner
    partials per block, then a native Sum groupby."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate", "o_totalprice"])
    lo = pa.scalar(pd.Timestamp(f"{year}-01-01"))
    hi = pa.scalar(pd.Timestamp(f"{year + 1}-01-01"))

    def partials(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.greater_equal(b["o_orderdate"], lo),
                             pc.less(b["o_orderdate"], hi)))
        cents = pc.cast(pc.round(pc.multiply(b["o_totalprice"], 100.0)),
                        pa.int64())
        t = pa.table({"o_custkey": b["o_custkey"], "cents": cents,
                      "n": pa.array([1] * len(b), pa.int64())})
        return pa.TableGroupBy(t, "o_custkey").aggregate(
            [("n", "sum"), ("cents", "sum")]).rename_columns(
            ["o_custkey", "n", "cents"])

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("cents", alias_name="cents")))


def customers_year_outer(sf_dir: str, *, y1: int = 1995, y2: int = 2000):
    """FULL OUTER JOIN: per-customer order totals in year y1 vs year y2,
    keeping customers active in only one of the two (the set-op family's
    value-carrying sibling — INTERSECT/EXCEPT drop the payload, this keeps
    both sides' aggregates with NULLs where a side is absent).

    Expressed as ONE tagged-union groupby (the upsert_merge /
    distinct_set_op shape): each side's vocabulary-sized aggregate carries
    a side flag, both co-shuffle on the key once, and the per-key merge
    emits a single output row with NULLs for the missing side.  This is
    shuffle-equivalent to a co-partitioned hash join and sidesteps Ray
    2.49's hash-shuffle join finalizing empty partitions to zero-column
    blocks (the pyarrow key-field error connected_components documents)."""
    def tag(ds, side):
        return ds.map_batches(
            lambda b, s=side: b.append_column(
                "side", pa.array([s] * b.num_rows, pa.int8())),
            batch_format="pyarrow")

    merged = tag(_year_totals(sf_dir, y1), 0).union(
        tag(_year_totals(sf_dir, y2), 1))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ra = g[g["side"] == 0]
        rb = g[g["side"] == 1]
        def pick(rows, col, scale):
            if rows.empty:
                return float("nan")
            return round(float(rows[col].iloc[0]) / scale, 2) if scale != 1 \
                else float(rows[col].iloc[0])
        return pd.DataFrame({
            "o_custkey": [g["o_custkey"].iloc[0]],
            "n_y1": [pick(ra, "n", 1)],
            "total_y1": [pick(ra, "cents", 100)],
            "n_y2": [pick(rb, "n", 1)],
            "total_y2": [pick(rb, "cents", 100)],
        })

    return merged.groupby("o_custkey").map_groups(merge,
                                                  batch_format="pandas")


def event_paths(sf_dir: str, *, n_users: int = 40):
    """Per-key ordered string aggregation (string_agg / collect_list
    family): each user's full event-type path ordered by (ts, event_id).
    groupby(user_id) co-locates the history; the in-group kernel is one
    pandas sort + ''.join.  Restricted to user_id < n_users to bound gate
    output — the operator streams over all keys."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b["user_id"], n_users)),
        batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_events": [len(g)],
            "path": ["->".join(g["event_type"])],
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")



def part_triangles(sf_dir: str):
    """Distributed triangle counting over the parts-bought-together graph
    (nodes = parts, edge when two parts share an order) — the iterative /
    multi-join graph-algorithm family beyond per-node degree counts.

    Shape (Suri & Vassilvitskii, "Counting triangles and the curse of the
    last reducer", WWW'11): orient each edge from its LOWER-(degree, id)
    endpoint, generate length-2 paths (wedges) only inside each node's
    out-neighborhood, and close them against the edge set.  Degree
    orientation bounds every out-neighborhood by O(sqrt(E)) amortized, so a
    celebrity part never concentrates quadratic wedge work on one worker —
    the failure mode id-orientation has.

    Every stage is keyed and shuffles once; the degree attach and the
    closing membership test are reduce-side joins expressed as tagged
    unions folded by NATIVE Sum aggregates (no per-edge Python group
    calls, and no ``Dataset.join`` — Ray 2.49's hash-shuffle join
    finalizes empty partitions to zero-column blocks and fails on small
    or skewed key ranges; see connected_components).  The only
    ``map_groups`` kernels run per NODE (vectorized numpy inside), never
    per edge.  Nothing broadcasts the (at 100 TB, billions-node) graph;
    the two ``materialize()`` boundary tables (edges, oriented edges) are
    GRAPH-sized and each feeds two downstream stages.  Wedges
    pre-aggregate per apex, so the closing shuffle carries distinct
    candidate edges with counts, not raw wedges."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy(np.int64))
        if len(parts) < 2:
            return pd.DataFrame({"e": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(parts), k=1)
        return pd.DataFrame({"e": (parts[i] << 32) | parts[j]})

    from ..stages.joins import exact_fold

    # distinct undirected edges, packed (lo<<32 | hi) so every shuffle key
    # is one int64; materialized because three stages consume it.  Every
    # fold below a map_groups goes through exact_fold: the schema-less
    # empty blocks map_groups emits otherwise poison the sort-aggregate's
    # partial merge into float64, corrupting packed keys above 2**53
    # (part ids past 2**21, ~sf10 — see exact_fold's docstring).
    edges = (exact_fold(ds.groupby("l_orderkey")
                        .map_groups(per_order, batch_format="pandas"),
                        "e", Count(alias_name="_n"))
             .drop_columns(["_n"])
             .map_batches(lambda b: b, batch_format="pyarrow")
             .materialize())

    # ---- degree attach: tagged union keyed on node --------------------
    # edge rows appear once per endpoint (pos 0/1); degree rows are
    # per-block pre-aggregated partials (pos -1)
    def edge_endpoint_rows(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        node = np.concatenate([e >> 32, e & 0xFFFFFFFF])
        pos = np.concatenate([np.zeros(len(e), np.int8),
                              np.ones(len(e), np.int8)])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "e": pa.array(np.concatenate([e, e]), pa.int64()),
                         "pos": pa.array(pos, pa.int8()),
                         "deg": pa.array(np.zeros(2 * len(e), np.int64))})

    def degree_partials(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        node = np.concatenate([e >> 32, e & 0xFFFFFFFF])
        uk, counts = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uk, pa.int64()),
                         "e": pa.nulls(len(uk), pa.int64()),
                         "pos": pa.array(np.full(len(uk), -1, np.int8)),
                         "deg": pa.array(counts.astype(np.int64))})

    tagged = (edges.map_batches(edge_endpoint_rows, batch_format="pyarrow")
              .union(edges.map_batches(degree_partials,
                                       batch_format="pyarrow")))

    def attach_deg(g: pa.Table) -> pa.Table:
        """One node's rows (vectorized): total the degree partials, stamp
        the degree onto that node's endpoint rows as deg_lo / deg_hi
        contributions (the other endpoint's slot stays 0 and the
        downstream per-edge Sum merges the two rows).

        ARROW in/out: the partial rows carry a NULL ``e``, and a pandas
        group conversion would coerce the whole int64 column to float64 —
        silently corrupting packed ``lo<<32|hi`` keys once part ids pass
        2**21 (~sf10).  Split the tagged sides in Arrow first (the
        connected_components fix, VERDICT r4 #2)."""
        part = g.filter(pc.equal(g["pos"], -1))
        deg = int(pc.sum(part["deg"]).as_py() or 0)
        ed = g.filter(pc.greater_equal(g["pos"], 0))
        is_lo = pc.equal(ed["pos"], 0).to_numpy(zero_copy_only=False)
        n = ed.num_rows
        return pa.table({
            "e": ed["e"],
            "deg_lo": pa.array(np.where(is_lo, deg, 0).astype(np.int64)),
            "deg_hi": pa.array(np.where(is_lo, 0, deg).astype(np.int64)),
        }) if n else pa.table({
            "e": pa.array([], pa.int64()),
            "deg_lo": pa.array([], pa.int64()),
            "deg_hi": pa.array([], pa.int64())})

    from ..stages.joins import exact_map_groups

    # exact_map_groups: the tagged union's null-padded int64 "e" must not
    # ride a pandas-majority sort merge (see exact_map_groups docstring)
    endpoint_degs = exact_map_groups(tagged, "node", attach_deg)

    # fold the two endpoint rows per edge with a NATIVE aggregate
    edge_degs = exact_fold(endpoint_degs, "e",
                           Sum("deg_lo", alias_name="deg_lo"),
                           Sum("deg_hi", alias_name="deg_hi"))

    def orient_batch(b: pa.Table) -> pa.Table:
        """Vectorized orientation: src = lower-(deg, id) endpoint (ids are
        unique, so the order is strict and total)."""
        e = b["e"].to_numpy(zero_copy_only=False)
        lo, hi = e >> 32, e & 0xFFFFFFFF
        dlo = b["deg_lo"].to_numpy(zero_copy_only=False)
        dhi = b["deg_hi"].to_numpy(zero_copy_only=False)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    oriented = (edge_degs.map_batches(orient_batch, batch_format="pyarrow")
                .materialize())

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        """One apex's out-neighborhood → candidate closing edges with
        multiplicity (canonical lo<<32|hi key via sort)."""
        nbrs = np.sort(g["dst"].to_numpy(np.int64))
        if len(nbrs) < 2:
            return pd.DataFrame({"e": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(nbrs), k=1)
        key = (nbrs[i] << 32) | nbrs[j]
        uk, counts = np.unique(key, return_counts=True)
        return pd.DataFrame({"e": uk, "n": counts.astype(np.int64)})

    wedge_rows = (oriented.groupby("src").map_groups(wedges,
                                                     batch_format="pandas")
                  .map_batches(lambda b: b.append_column(
                      "m", pa.array(np.zeros(b.num_rows, np.int64))),
                      batch_format="pyarrow"))

    # ---- closing membership test: tagged union + native Sum -----------
    edge_rows = edges.map_batches(
        lambda b: pa.table({"e": b["e"],
                            "n": pa.array(np.zeros(b.num_rows, np.int64)),
                            "m": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")

    closed = exact_fold(wedge_rows.union(edge_rows), "e",
                        Sum("n", alias_name="n"),
                        Sum("m", alias_name="m"))
    triangles = (closed.map_batches(
        lambda b: pa.table({"t": pc.multiply(
            b["n"], pc.cast(pc.greater(b["m"], 0), pa.int64()))}),
        batch_format="pyarrow").sum("t"))
    return pd.DataFrame({"triangles": [int(triangles or 0)]})


def user_cohorts(sf_dir: str):
    """Cohort retention analysis: users grouped by signup week (Monday
    truncation), counted once per later activity week — the
    self-join-on-user time-bucketing family funnel/sessionize don't cover.
    groupby(user_id) co-locates a user's history, so the "join signups to
    activity" step is free (one vectorized in-group kernel, no second
    shuffle); the (cohort, week) rollup pre-aggregates per block and the
    final groupby is calendar×cohort bounded."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        su = g.loc[g["event_type"] == "signup", "ts"]
        if su.empty:
            return pd.DataFrame({"cohort": pd.Series([], dtype="object"),
                                 "w": pd.Series([], dtype="int64")})
        t0 = su.min()
        week0 = (t0 - pd.Timedelta(days=t0.weekday())).normalize()
        ts = g.loc[g["ts"] >= t0, "ts"]
        weeks = (ts - pd.to_timedelta(ts.dt.weekday, unit="D")).dt.normalize()
        w = np.unique(((weeks - week0).dt.days // 7).to_numpy(np.int64))
        return pd.DataFrame({"cohort": week0.strftime("%Y-%m-%d"), "w": w})

    per = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

    def partials(b: pa.Table) -> pa.Table:
        t = b.append_column("users", pa.array([1] * b.num_rows, pa.int64()))
        return pa.TableGroupBy(t, ["cohort", "w"]).aggregate(
            [("users", "sum")]).rename_columns(["cohort", "w", "users"])

    out = (per.map_batches(partials, batch_format="pyarrow")
           .groupby(["cohort", "w"])
           .aggregate(Sum("users", alias_name="users"))
           .to_pandas())
    out["users"] = out["users"].astype("int64")
    return out.sort_values(["cohort", "w"]).reset_index(drop=True)


def part_khop(sf_dir: str, *, seed: int = 42, k: int = 3,
              num_buckets: int = 16):
    """k-hop BFS (shortest hop distance ≤ k from a seed node) over the
    parts-bought-together graph — iterative frontier expansion, the
    traversal sibling of part_triangles' counting.

    Per round: the CURRENT frontier (nodes first reached last round) is
    co-shuffled with the directed edge list by a hash bucket of the source
    node, each bucket does ONE vectorized pandas merge (the
    connected_components reduce-side-join pattern — no ``Dataset.join``,
    no broadcast of the graph), and a native Min-groupby folds proposed
    distances into the visited table.  Each round's distance table is
    materialized so round N+1 doesn't re-execute rounds 1..N; it holds
    only REACHED nodes (≤ frontier closure, not the whole graph).  k is
    small and fixed, so the loop is bounded driver-side control flow over
    fully distributed steps."""
    import numpy as np

    from ray.data.aggregate import Min

    _KNUTH = np.uint64(2654435761)

    def bucket(col: np.ndarray) -> np.ndarray:
        return (((col.astype(np.uint64) * _KNUTH) >> np.uint64(16))
                % np.uint64(num_buckets)).astype(np.int64)

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy(np.int64))
        if len(parts) < 2:
            return pd.DataFrame({"e": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(parts), k=1)
        # both orientations, packed src<<32|dst
        return pd.DataFrame({"e": np.concatenate([
            (parts[i] << 32) | parts[j], (parts[j] << 32) | parts[i]])})

    def unpack(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        src = e >> 32
        return pa.table({"part": pa.array(bucket(src)),
                         "src": pa.array(src, pa.int64()),
                         "dst": pa.array(e & 0xFFFFFFFF, pa.int64()),
                         "hop": pa.nulls(len(e), pa.int64())})

    from ..stages.joins import exact_fold, exact_map_groups

    # exact_fold everywhere below a map_groups: its schema-less empty
    # blocks otherwise float64-poison sort-aggregate partials, corrupting
    # packed int64 keys above 2**53 (see exact_fold's docstring)
    edges = (exact_fold(ds.groupby("l_orderkey")
                        .map_groups(per_order, batch_format="pandas"),
                        "e", Count(alias_name="_n"))
             .drop_columns(["_n"])
             .map_batches(unpack, batch_format="pyarrow")
             .materialize())

    dist = rd.from_items([{"node": seed, "hop": 0}]).map_batches(
        lambda b: b, batch_format="pyarrow").materialize()

    def expand(g: pa.Table) -> pa.Table:
        """One bucket: merge frontier rows onto edge rows by src; propose
        (dst, hop+1).

        ARROW in/out with the side split done in Arrow BEFORE any pandas
        conversion: the tagged union pads dst/hop with nulls, and pandas
        would coerce those int64 columns to float64, corrupting packed
        node ids above 2**53 (part ids past 2**21, ~sf10) — the
        connected_components bug class (VERDICT r4 #2).  The per-bucket
        merge itself runs on null-free numpy views, which pandas keeps
        exact int64."""
        fr = g.filter(pc.is_null(g["dst"]))
        ed = g.filter(pc.is_null(g["hop"]))
        m = pd.DataFrame({
            "src": ed["src"].to_numpy(zero_copy_only=False),
            "dst": ed["dst"].to_numpy(zero_copy_only=False),
        }).merge(pd.DataFrame({
            "src": fr["src"].to_numpy(zero_copy_only=False),
            "hop": fr["hop"].to_numpy(zero_copy_only=False),
        }), on="src", how="inner")
        return pa.table({
            "node": pa.array(m["dst"].to_numpy(dtype="int64"), pa.int64()),
            "hop": pa.array((m["hop"] + 1).to_numpy(dtype="int64"),
                            pa.int64()),
        })

    for h in range(1, k + 1):
        lvl = pa.scalar(h - 1, pa.int64())
        frontier = dist.map_batches(
            lambda b, lvl=lvl: (lambda f: pa.table({
                "part": pa.array(bucket(np.asarray(f["node"],
                                                   dtype=np.int64))),
                "src": f["node"],
                "dst": pa.nulls(f.num_rows, pa.int64()),
                "hop": f["hop"]}))(b.filter(pc.equal(b["hop"], lvl))),
            batch_format="pyarrow")
        proposals = (exact_map_groups(edges.union(frontier), "part",
                                      expand)
                     .map_batches(lambda b: b, batch_format="pyarrow"))
        dist = (exact_fold(proposals.union(dist), "node",
                           Min("hop", alias_name="hop"))
                .map_batches(lambda b: b, batch_format="pyarrow")
                .materialize())

    out = (dist.groupby("hop").aggregate(Count(alias_name="n_nodes"))
           .to_pandas())
    out["n_nodes"] = out["n_nodes"].astype("int64")
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values("hop").reset_index(drop=True)


def assoc_rules(sf_dir: str, *, top_n: int = 20):
    """Frequent-itemset mining / association rules over market baskets
    (A-priori's pair level): for each pair of parts bought together,
    support, both confidences and lift — the recommender-style analytics
    family (exact integer counts, single-division ratios, so the DuckDB
    oracle is bit-identical).

    All counting is keyed: basket pair generation groups by order, pair /
    item counts are native Count groupbys, and the item-count attach is
    the tagged-union reduce-side join from part_triangles (per-NODE
    vectorized groups, per-edge native Sum folds — no ``Dataset.join``,
    no broadcast of the at-scale-billions item table).  Only the top-N
    rows (edge-table sort + limit) reach the driver."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    n_orders = (ds.groupby("l_orderkey")
                .aggregate(Count(alias_name="_n")).count())

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy(np.int64))
        # one row per distinct item (for per-item order counts) ...
        item = parts.astype(np.int64)
        # ... and one per pair (packed lo<<32|hi)
        if len(parts) >= 2:
            i, j = np.triu_indices(len(parts), k=1)
            pair = (parts[i] << 32) | parts[j]
        else:
            pair = np.empty(0, np.int64)
        return pd.DataFrame({
            "e": np.concatenate([item, pair]),
            "kind": np.concatenate([np.zeros(len(item), np.int8),
                                    np.ones(len(pair), np.int8)]),
        })

    from ..stages.joins import exact_fold

    # exact_fold below every map_groups — schema-less empty blocks would
    # float64-poison the fold's partials and corrupt packed int64 keys
    # above 2**53 (see exact_fold's docstring)
    counts = (exact_fold(ds.groupby("l_orderkey")
                         .map_groups(per_order, batch_format="pandas"),
                         ["e", "kind"], Count(alias_name="n"))
              .map_batches(lambda b: b, batch_format="pyarrow")
              .materialize())

    # ---- attach item counts to each pair endpoint (tagged union) ------
    def endpoint_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["kind"], 1))
        e = b["e"].to_numpy(zero_copy_only=False)
        np_ = b["n"].to_numpy(zero_copy_only=False)
        node = np.concatenate([e >> 32, e & 0xFFFFFFFF])
        pos = np.concatenate([np.zeros(len(e), np.int8),
                              np.ones(len(e), np.int8)])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "e": pa.array(np.concatenate([e, e]), pa.int64()),
                         "pos": pa.array(pos, pa.int8()),
                         "np": pa.array(np.concatenate(
                             [np_, np.zeros(len(e), np.int64)]), pa.int64()),
                         "cnt": pa.array(np.zeros(2 * len(e), np.int64))})

    def item_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["kind"], 0))
        n = b.num_rows
        return pa.table({"node": b["e"],
                         "e": pa.nulls(n, pa.int64()),
                         "pos": pa.array(np.full(n, -1, np.int8)),
                         "np": pa.array(np.zeros(n, np.int64)),
                         "cnt": b["n"]})

    tagged = (counts.map_batches(endpoint_rows, batch_format="pyarrow")
              .union(counts.map_batches(item_rows, batch_format="pyarrow")))

    def attach(g: pa.Table) -> pa.Table:
        # ARROW in/out: item rows pad ``e`` with nulls, so a pandas group
        # would coerce the packed lo<<32|hi int64 keys to float64 and
        # corrupt them above 2**53 (part ids past 2**21, ~sf10) — split
        # the tagged sides in Arrow (VERDICT r4 #2 bug class)
        item = g.filter(pc.equal(g["pos"], -1))
        cnt = int(pc.sum(item["cnt"]).as_py() or 0)
        ed = g.filter(pc.greater_equal(g["pos"], 0))
        is_a = pc.equal(ed["pos"], 0).to_numpy(zero_copy_only=False)
        return pa.table({
            "e": ed["e"],
            "n_pair": ed["np"],
            "n_a": pa.array(np.where(is_a, cnt, 0).astype(np.int64)),
            "n_b": pa.array(np.where(is_a, 0, cnt).astype(np.int64)),
        })

    from ..stages.joins import exact_map_groups

    per_edge = exact_fold(
        exact_map_groups(tagged, "node", attach),
        "e",
        Sum("n_pair", alias_name="n_pair"),
        Sum("n_a", alias_name="n_a"),
        Sum("n_b", alias_name="n_b"))

    def finalize(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        np_ = b["n_pair"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = b["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)

        def round6(x):
            return np.floor(x * 1e6 + 0.5) / 1e6

        return pa.table({
            "part_a": pa.array(e >> 32, pa.int64()),
            "part_b": pa.array(e & 0xFFFFFFFF, pa.int64()),
            "n_pair": b["n_pair"], "n_a": b["n_a"], "n_b": b["n_b"],
            "support": pa.array(round6(np_ / n_orders)),
            "conf_a_b": pa.array(round6(np_ / na)),
            "conf_b_a": pa.array(round6(np_ / nb)),
            "lift": pa.array(round6(np_ * n_orders / (na * nb))),
        })

    out = (per_edge.map_batches(finalize, batch_format="pyarrow")
           .sort(["n_pair", "part_a", "part_b"],
                 descending=[True, False, False])
           .limit(top_n))
    return out.to_pandas()


def click_purchase_attribution(sf_dir: str, *, window_minutes: int = 60):
    """Stream-stream windowed equi-join: every (click, purchase) pair by
    the same user with the click inside the ``window_minutes`` before the
    purchase — the two-sided interval-join family (attribution windows)
    that asof (nearest one) and range join (static bands) don't cover.

    groupby(user_id) co-locates both streams, so the time-window probe is
    a pair of vectorized ``np.searchsorted`` bounds per group plus a
    repeat/offset expansion — no per-row loop, no second shuffle.  Output
    size is bounded by the window, not |clicks|×|purchases|.  Partitioning
    assumption: one user's history fits a worker (the sessionize
    contract); a celebrity key would be salted by time-bucket with pairs
    spanning the bucket edge handled by replicating one window of the
    click side into the next bucket."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(b["event_type"],
                                    value_set=pa.array(["click",
                                                        "purchase"]))),
        batch_format="pyarrow")
    win = np.timedelta64(window_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == "click"].sort_values("ts")
        p = g[g["event_type"] == "purchase"].sort_values("ts")
        empty = pd.DataFrame({
            "purchase_id": pd.Series([], dtype="int64"),
            "click_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "gap_s": pd.Series([], dtype="float64")})
        if c.empty or p.empty:
            return empty
        cts = c["ts"].to_numpy()
        pts = p["ts"].to_numpy()
        lo = np.searchsorted(cts, pts - win, side="left")
        hi = np.searchsorted(cts, pts, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        starts = np.repeat(lo, counts)
        offsets = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                               counts)
        ci = starts + offsets
        pi = np.repeat(np.arange(len(p)), counts)
        gap_us = (pts[pi] - cts[ci]).astype("timedelta64[us]").astype(
            np.int64)
        return pd.DataFrame({
            "purchase_id": p["event_id"].to_numpy()[pi],
            "click_id": c["event_id"].to_numpy()[ci],
            "user_id": np.full(total, g["user_id"].iloc[0], np.int64),
            "gap_s": np.round(gap_us / 1e6, 6),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def scd2_user_state(sf_dir: str):
    """SCD type-2 history build: each user's event stream becomes validity
    intervals [valid_from, valid_to) with the event's type as the tracked
    state and an is_current flag — the slowly-changing-dimension
    versioning family (CDC upsert keeps last-writer only; this keeps the
    full history).  groupby(user_id) co-locates a key's history; the
    in-group kernel is one vectorized sort + shift (no row loop).
    Deterministic order inside a key is (ts, event_id)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "state": g["event_type"],
            "valid_from": g["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "valid_to": g["ts"].shift(-1).dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
        })
        out["is_current"] = out["valid_to"].isna()
        # NaT-strftime yields float NaN; emit a true None so the Arrow
        # column is a null, matching the SQL LEAD's NULL
        out["valid_to"] = out["valid_to"].astype(object).where(
            out["valid_to"].notna(), None)
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def event_transitions(sf_dir: str):
    """First-order Markov transition estimation over per-user event
    sequences: counts and conditional probabilities of (state →
    next_state) — the sequence-model-fitting family (funnel checks one
    fixed path; this fits the whole transition matrix).

    groupby(user_id) co-locates each chain; the in-group kernel is one
    vectorized sort + shift; per-block Arrow ``group_by`` collapses
    transitions before the single (state, next_state) groupby, so the
    shuffle carries at most |states|² rows per block.  Probabilities are
    single divisions of exact int64 counts (bit-identical oracle)."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        cur = g["event_type"].to_numpy()
        if len(cur) < 2:
            return pd.DataFrame({"state": pd.Series([], dtype="object"),
                                 "next_state": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"state": cur[:-1], "next_state": cur[1:]})
        out = df.groupby(["state", "next_state"], sort=False).size()
        out = out.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    counts = (ds.groupby("user_id").map_groups(per_user,
                                               batch_format="pandas")
              .map_batches(lambda b: b, batch_format="pyarrow")
              .groupby(["state", "next_state"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype("int64")
    totals = counts.groupby("state")["n"].transform("sum")
    # half-away round like DuckDB round(x, 6)
    counts["p"] = np.floor(
        (counts["n"].to_numpy(np.float64) / totals.to_numpy(np.float64))
        * 1e6 + 0.5) / 1e6
    return counts.sort_values(["state", "next_state"]).reset_index(drop=True)


def priority_mode_by_status(sf_dir: str):
    """Grouped MODE (most frequent value, deterministic tie-break to the
    lexicographically smallest) — the categorical-statistic family mean/
    min/max aggregates don't cover.  Per-block Arrow ``group_by`` collapses
    (status, priority) pairs before ONE native Sum groupby; the final
    argmax runs per status group (vocabulary-sized)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority"])

    def partials(b: pa.Table) -> pa.Table:
        t = b.append_column("n", pa.array([1] * b.num_rows, pa.int64()))
        return pa.TableGroupBy(t, ["o_orderstatus", "o_orderpriority"])\
            .aggregate([("n", "sum")])\
            .rename_columns(["o_orderstatus", "o_orderpriority", "n"])

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["o_orderstatus", "o_orderpriority"])
              .aggregate(Sum("n", alias_name="n")))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "o_orderpriority"], ascending=[False, True])
        top = g.iloc[0]
        return pd.DataFrame({
            "o_orderstatus": [top["o_orderstatus"]],
            "mode_priority": [top["o_orderpriority"]],
            "n": [int(top["n"])],
        })

    return (counts.groupby("o_orderstatus")
            .map_groups(argmax, batch_format="pandas"))


def props_sum_by_key(sf_dir: str):
    """Semi-structured (JSON) field extraction + aggregate — the "parse the
    event payload" stage every behavioral-log pipeline has.  The ``props``
    column is a JSON string; the integer field ``k`` is pulled out with ONE
    vectorized re2 kernel (``pc.extract_regex``), never ``json.loads`` per
    row — at 100 TB the parse is the hot loop and stays in Arrow C++.
    Rows whose props lack the key are dropped (defensive: none in the
    synthetic table).  Output: per (event_type, decade bucket of k) row
    count and value sum."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k"\s*:\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({
            "event_type": b["event_type"],
            "k_bucket": pc.multiply(pc.floor(pc.divide(pc.cast(k, pa.float64()), 10.0)), 10.0),
            "value": b["value"],
        }).filter(pc.is_valid(k))
        # per-block combiner: collapse to (type, bucket) partials
        return pa.TableGroupBy(t, ["event_type", "k_bucket"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        ).rename_columns(["event_type", "k_bucket", "sum_value", "n"])

    out = (ds.map_batches(extract, batch_format="pyarrow")
           .groupby(["event_type", "k_bucket"])
           .aggregate(Sum("sum_value", alias_name="sum_value"),
                      Sum("n", alias_name="n"))
           .to_pandas())
    out["k_bucket"] = out["k_bucket"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "k_bucket"]).reset_index(drop=True)


def corr_by_returnflag(sf_dir: str):
    """Grouped Pearson correlation + least-squares fit (corr / regr_slope /
    regr_intercept) via MERGEABLE sufficient statistics: each block emits one
    (flag, n, Σx, Σy, Σxx, Σyy, Σxy) row from an Arrow hash group_by, a
    native Sum groupby merges them, and the closed-form solve runs on the
    vocabulary-sized result.  No second pass, no centering shuffle — the
    classic "algebraic aggregate" shape that distributes for free."""
    import numpy as np

    ds = _lineitem(sf_dir, ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partials(b: pa.Table) -> pa.Table:
        x = pc.cast(b["l_quantity"], pa.float64())
        y = b["l_extendedprice"]
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        return pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        ).rename_columns(["l_returnflag", "n", "sx", "sy", "sxx", "syy",
                          "sxy"])

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("l_returnflag")
             .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxx", alias_name="sxx"),
                        Sum("syy", alias_name="syy"),
                        Sum("sxy", alias_name="sxy"))
             .to_pandas())
    n = stats["n"].to_numpy(np.float64)
    sx, sy = stats["sx"].to_numpy(), stats["sy"].to_numpy()
    sxx, syy, sxy = stats["sxx"].to_numpy(), stats["syy"].to_numpy(), \
        stats["sxy"].to_numpy()
    cov_n2 = n * sxy - sx * sy
    varx_n2 = n * sxx - sx * sx
    vary_n2 = n * syy - sy * sy
    slope = cov_n2 / varx_n2
    return pd.DataFrame({
        "l_returnflag": stats["l_returnflag"],
        "n": stats["n"].astype("int64"),
        "corr_qty_price": np.round(cov_n2 / np.sqrt(varx_n2 * vary_n2), 6),
        "slope": np.round(slope, 6),
        "intercept": np.round((sy - slope * sx) / n, 4),
    }).sort_values("l_returnflag").reset_index(drop=True)


def event_value_anomalies(sf_dir: str, *, z_threshold: float = 2.5):
    """Grouped z-score anomaly detection: pass 1 computes per-event_type
    sufficient statistics (n, Σv, Σv²) with the combiner shape; the
    vocabulary-sized (mean, std) table is broadcast once via ``ray.put`` and
    pass 2 standardizes + filters each block vectorized.  The per-group
    stats never shuffle the fact rows — only blocks' partial rows move."""
    import numpy as np

    cols = ["event_id", "event_type", "value"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def partials(b: pa.Table) -> pa.Table:
        v = b["value"]
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "sv": v, "svv": pc.multiply(v, v),
        })
        return pa.TableGroupBy(t, "event_type").aggregate(
            [("n", "sum"), ("sv", "sum"), ("svv", "sum")]
        ).rename_columns(["event_type", "n", "sv", "svv"])

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"),
                        Sum("svv", alias_name="svv"))
             .to_pandas())
    n = stats["n"].to_numpy(np.float64)
    mean = stats["sv"].to_numpy() / n
    std = np.sqrt(stats["svv"].to_numpy() / n - mean * mean)  # population
    lookup_ref = ray.put({t: (m, s) for t, m, s in
                          zip(stats["event_type"], mean, std)})

    def standardize(b: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        types = b["event_type"].to_pylist()
        m = np.fromiter((lookup[t][0] for t in types), np.float64,
                        len(types))
        s = np.fromiter((lookup[t][1] for t in types), np.float64,
                        len(types))
        z = (b["value"].to_numpy(zero_copy_only=False) - m) / s
        keep = np.abs(z) >= z_threshold
        return pa.table({
            "event_id": b["event_id"].filter(pa.array(keep)),
            "event_type": b["event_type"].filter(pa.array(keep)),
            "value": b["value"].filter(pa.array(keep)),
            "z": pa.array(np.round(z[keep], 6), pa.float64()),
        })

    return ds.map_batches(standardize, batch_format="pyarrow")


def returned_item_report(sf_dir: str, *, k: int = 20,
                         num_partitions: int = 16):
    """TPC-H Q10 shape: revenue lost to returned items per customer, top-k.
    lineitem(filter R) → per-block revenue partials keyed by order (the
    combiner collapses multi-line orders BEFORE the join shuffle) →
    DISTRIBUTED hash join to orders (fact⋈fact) → custkey groupby →
    distributed join to customer (fact-scale at 100×) → nation name via a
    25-row broadcast dict.  Only order-grained partials ever shuffle."""
    li = _lineitem(sf_dir, ["l_orderkey", "l_returnflag", "l_extendedprice",
                            "l_discount"])

    def rev_partials(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        t = pa.table({
            "l_orderkey": b["l_orderkey"],
            "revenue": pc.multiply(b["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0),
                                               b["l_discount"])),
        })
        return pa.TableGroupBy(t, "l_orderkey").aggregate(
            [("revenue", "sum")]).rename_columns(["l_orderkey", "revenue"])

    per_order = (li.map_batches(rev_partials, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("revenue", alias_name="revenue")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    per_cust = (per_order.join(orders, join_type="inner",
                               num_partitions=num_partitions,
                               on=("l_orderkey",), right_on=("o_orderkey",))
                .groupby("o_custkey")
                .aggregate(Sum("revenue", alias_name="revenue")))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    joined = per_cust.join(cust, join_type="inner",
                           num_partitions=num_partitions,
                           on=("o_custkey",), right_on=("c_custkey",))

    nation = {r["n_nationkey"]: r["n_name"] for r in
              rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()}
    pdf = joined.to_pandas()
    pdf["n_name"] = pdf["c_nationkey"].map(nation)
    pdf["revenue"] = pdf["revenue"].round(4)
    pdf = (pdf.sort_values(["revenue", "o_custkey"], ascending=[False, True])
           .head(k)
           .rename(columns={"o_custkey": "c_custkey"}))
    return pdf[["c_custkey", "c_name", "n_name", "revenue"]] \
        .reset_index(drop=True)


def large_volume_customers(sf_dir: str, *, min_qty: float = 250.0,
                           num_partitions: int = 16):
    """TPC-H Q18 shape (HAVING over a fact aggregate + join-back): orders
    whose total lineitem quantity exceeds ``min_qty``, decorated with
    customer name and order header.  The HAVING filter runs where the
    aggregate lives — a vectorized post-groupby batch filter — so only the
    few surviving orders join back to orders/customer."""
    li = _lineitem(sf_dir, ["l_orderkey", "l_quantity"])

    def qty_partials(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b, "l_orderkey").aggregate(
            [("l_quantity", "sum")]).rename_columns(["l_orderkey", "sum_qty"])

    # The HAVING filter leaves most aggregate blocks empty (survivors are
    # ~1% of orders); compact them before the join — empty schema-less
    # blocks break the Arrow hash join, and sparse blocks waste join tasks.
    big = (li.map_batches(qty_partials, batch_format="pyarrow")
           .groupby("l_orderkey").aggregate(Sum("sum_qty",
                                                alias_name="sum_qty"))
           .map_batches(lambda b: b.filter(pc.greater(b["sum_qty"],
                                                      min_qty)),
                        batch_format="pyarrow")
           .repartition(num_partitions))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
    j1 = big.join(orders, join_type="inner", num_partitions=num_partitions,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    j2 = j1.join(cust, join_type="inner", num_partitions=num_partitions,
                 on=("o_custkey",), right_on=("c_custkey",))

    pdf = j2.to_pandas()
    pdf["o_orderdate"] = pdf["o_orderdate"].astype(str).str[:10]
    pdf["sum_qty"] = pdf["sum_qty"].round(2)
    pdf = pdf.rename(columns={"l_orderkey": "o_orderkey"})
    pdf = pdf[["c_name", "o_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]]
    return (pdf.sort_values(["sum_qty", "o_orderkey"],
                            ascending=[False, True])
            .reset_index(drop=True))


def value_deciles(sf_dir: str, *, n_buckets: int = 10):
    """Exact NTILE bucketing per group: each event_type's values are split
    into ``n_buckets`` rank buckets (SQL NTILE semantics: the first
    ``n % buckets`` buckets take the extra row), reported as per-bucket
    count / min / max — the rank-statistics family the histogram-sketch
    quantiles approximate.

    Partitioning assumption (same as the window operators): one GROUP's
    rows fit a worker, so the per-group sort is local after the groupby
    co-locates the key.  Ties order by (value, event_id) so bucket
    assignment is deterministic on both sides."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def buckets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"])
        n = len(g)
        q, r = divmod(n, n_buckets)
        sizes = np.r_[np.full(r, q + 1, np.int64), np.full(n_buckets - r, q,
                                                           np.int64)]
        sizes = sizes[sizes > 0]
        tile = np.repeat(np.arange(1, len(sizes) + 1), sizes)
        v = g["value"].to_numpy()
        out = pd.DataFrame({"tile": tile, "value": v}).groupby("tile").agg(
            n=("value", "size"), min_value=("value", "min"),
            max_value=("value", "max")).reset_index()
        out.insert(0, "event_type", g["event_type"].iloc[0])
        return out

    return (ds.groupby("event_type")
            .map_groups(buckets, batch_format="pandas"))


def nation_revenue_share(sf_dir: str, *, num_partitions: int = 16):
    """Ratio-to-report: each nation's order revenue as a share of its
    REGION's total — the percent-of-total window family.  The fact scan
    collapses to per-customer partials inside blocks, joins customer
    distributed (fact-scale at 100×), and the share division runs on the
    25-row nation table with region totals from one driver-side fold of
    that vocabulary-sized result."""
    import numpy as np

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def partials(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b, "o_custkey").aggregate(
            [("o_totalprice", "sum")]).rename_columns(
                ["o_custkey", "rev"])

    per_cust = (orders.map_batches(partials, batch_format="pyarrow")
                .groupby("o_custkey").aggregate(Sum("rev",
                                                    alias_name="rev")))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    per_nation = (per_cust.join(cust, join_type="inner",
                                num_partitions=num_partitions,
                                on=("o_custkey",), right_on=("c_custkey",))
                  .groupby("c_nationkey")
                  .aggregate(Sum("rev", alias_name="revenue"))
                  .to_pandas())

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    out = (per_nation.merge(nation, left_on="c_nationkey",
                            right_on="n_nationkey")
           .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    region_tot = out.groupby("r_name")["revenue"].transform("sum")
    out["share"] = np.floor(out["revenue"] / region_tot * 1e6 + 0.5) / 1e6
    out["revenue"] = out["revenue"].round(4)
    out = out[["r_name", "n_name", "revenue", "share"]]
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def robust_means(sf_dir: str):
    """Grouped geometric + harmonic means — the robust-statistics pair the
    arithmetic Mean aggregate misses, both ALGEBRAIC once rewritten as
    sufficient statistics (Σ ln x and Σ 1/x), so they merge for free like
    any Sum."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_totalprice"])

    def partials(b: pa.Table) -> pa.Table:
        x = b["o_totalprice"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "sln": pa.array(np.log(x), pa.float64()),
            "sinv": pa.array(1.0 / x, pa.float64()),
        })
        return pa.TableGroupBy(t, "o_orderpriority").aggregate(
            [("n", "sum"), ("sln", "sum"), ("sinv", "sum")]
        ).rename_columns(["o_orderpriority", "n", "sln", "sinv"])

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("o_orderpriority")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("sln", alias_name="sln"),
                        Sum("sinv", alias_name="sinv"))
             .to_pandas())
    n = stats["n"].to_numpy(np.float64)
    return pd.DataFrame({
        "o_orderpriority": stats["o_orderpriority"],
        "n": stats["n"].astype("int64"),
        "geo_mean": np.round(np.exp(stats["sln"].to_numpy() / n), 4),
        "harm_mean": np.round(n / stats["sinv"].to_numpy(), 4),
    }).sort_values("o_orderpriority").reset_index(drop=True)


def day_over_day(sf_dir: str):
    """Change detection: daily order counts/revenue with day-over-day
    percent change — the lag-window family over a DATE-bounded (hence
    vocabulary-sized) aggregate.  The fact scan collapses per block to
    (day, n, rev) partials; the final lag/pct runs on the ≤|days| table."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": b["o_orderdate"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "rev": b["o_totalprice"],
        })
        return pa.TableGroupBy(t, "day").aggregate(
            [("n", "sum"), ("rev", "sum")]
        ).rename_columns(["day", "n", "rev"])

    daily = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"),
                                       Sum("rev", alias_name="rev"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    prev = daily["n"].shift(1)
    diff = (daily["n"] - prev) / prev
    daily["pct_change"] = np.sign(diff) * np.floor(
        np.abs(diff) * 1e6 + 0.5) / 1e6
    daily["day"] = daily["day"].astype(str).str[:10]
    daily["rev"] = daily["rev"].round(4)
    # first day has no predecessor on either side — drop it, not NaN-match
    return daily[prev.notna()].reset_index(drop=True)


def data_profile(sf_dir: str, *, num_partitions: int = 16):
    """Data-validation / profiling suite — the expectation checks a 100 TB
    ingest runs before anything downstream trusts the tables: row counts,
    null counts, range violations, domain min/max, distinct-key
    cardinalities and referential orphans, reported as one
    (table_name, metric, value) row each.

    Shape: one column-pruned scan per table folds per-block partials (one
    Arrow kernel per metric) into a single scalar row via native Sum/Min/
    Max merges; FK orphan counts reuse the distributed reduce-side ANTI
    join (key columns only are shuffled).  Everything the driver sees is
    metric-count sized."""
    import numpy as np

    from ..stages.joins import hash_anti_join

    rows: list[tuple[str, str, float]] = []

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])

    def o_partials(b: pa.Table) -> pa.Table:
        tp = b["o_totalprice"]
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "n_null_price": pa.array([tp.null_count], pa.int64()),
            "n_nonpos_price": pa.array(
                [int(pc.sum(pc.less_equal(tp, 0.0)).as_py() or 0)],
                pa.int64()),
            "min_price": pa.array([pc.min(tp).as_py()], pa.float64()),
            "max_price": pa.array([pc.max(tp).as_py()], pa.float64()),
        })

    om = (orders.map_batches(o_partials, batch_format="pyarrow")
          .aggregate(Sum("n", alias_name="n"),
                     Sum("n_null_price", alias_name="n_null_price"),
                     Sum("n_nonpos_price", alias_name="n_nonpos_price"),
                     Min("min_price", alias_name="min_price"),
                     Max("max_price", alias_name="max_price")))
    rows += [("orders", "row_count", float(om["n"])),
             ("orders", "null_o_totalprice", float(om["n_null_price"])),
             ("orders", "nonpositive_o_totalprice",
              float(om["n_nonpos_price"])),
             ("orders", "min_o_totalprice", round(float(om["min_price"]), 4)),
             ("orders", "max_o_totalprice", round(float(om["max_price"]), 4))]

    # distinct customers referenced (two-level groupby keeps it combiner-y)
    n_cust = (orders.groupby("o_custkey").aggregate(Count(alias_name="c"))
              .count())
    rows.append(("orders", "distinct_o_custkey", float(n_cust)))

    cust_keys = rd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey"]) \
        .map_batches(lambda b: b.rename_columns(["o_custkey"]),
                     batch_format="pyarrow")
    orphans = hash_anti_join(orders.select_columns(["o_custkey"]), cust_keys,
                             on="o_custkey",
                             num_partitions=num_partitions).count()
    rows.append(("orders", "orphan_o_custkey", float(orphans)))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity", "l_discount"])

    def l_partials(b: pa.Table) -> pa.Table:
        disc = b["l_discount"]
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "n_bad_disc": pa.array(
                [int(pc.sum(pc.or_(pc.less(disc, 0.0),
                                   pc.greater(disc, 1.0))).as_py() or 0)],
                pa.int64()),
            "n_nonpos_qty": pa.array(
                [int(pc.sum(pc.less_equal(b["l_quantity"], 0.0)).as_py()
                     or 0)], pa.int64()),
        })

    lm = (li.map_batches(l_partials, batch_format="pyarrow")
          .aggregate(Sum("n", alias_name="n"),
                     Sum("n_bad_disc", alias_name="n_bad_disc"),
                     Sum("n_nonpos_qty", alias_name="n_nonpos_qty")))
    order_keys = orders.select_columns(["o_orderkey"]).map_batches(
        lambda b: b.rename_columns(["l_orderkey"]), batch_format="pyarrow")
    li_orphans = hash_anti_join(li.select_columns(["l_orderkey"]),
                                order_keys, on="l_orderkey",
                                num_partitions=num_partitions).count()
    rows += [("lineitem", "row_count", float(lm["n"])),
             ("lineitem", "discount_out_of_range", float(lm["n_bad_disc"])),
             ("lineitem", "nonpositive_l_quantity",
              float(lm["n_nonpos_qty"])),
             ("lineitem", "orphan_l_orderkey", float(li_orphans))]

    out = pd.DataFrame(rows, columns=["table_name", "metric", "value"])
    return out.sort_values(["table_name", "metric"]).reset_index(drop=True)


def missing_days(sf_dir: str):
    """Calendar-gap detection: days inside the table's [min, max] date span
    with ZERO orders — the completeness check a daily-partitioned ingest
    runs before publishing.  The fact scan folds to a date-bounded
    (day, n) table; the calendar scaffold and the anti-select run on that
    vocabulary-sized result (≤ span days, never corpus rows)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"day": b["o_orderdate"],
                      "n": pa.array([1] * b.num_rows, pa.int64())})
        return pa.TableGroupBy(t, "day").aggregate(
            [("n", "sum")]).rename_columns(["day", "n"])

    daily = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    days = pd.to_datetime(daily["day"]).dt.normalize()
    full = pd.date_range(days.min(), days.max(), freq="D")
    present = set(days)
    missing = [d for d in full if d not in present]
    return pd.DataFrame({
        "day": [str(d)[:10] for d in missing],
    })


def table_diff(sf_dir: str, *, num_partitions: int = 16):
    """Snapshot reconciliation: diff two versions of a keyed table into
    added / removed / changed / unchanged row counts — the regression gate
    a pipeline runs between yesterday's and today's output.  The "new"
    version is derived deterministically from orders (keys ≡ 0 mod 101
    dropped, prices of keys ≡ 0 mod 97 bumped) so the oracle can rebuild
    both sides.

    Shape: both versions are tagged and co-shuffled by key ONCE (the same
    tagged-union trick as the dedup survivor join); each key group compares
    its two payload fingerprints vectorized.  Only (key, side, fingerprint)
    rows move — payloads never shuffle twice."""
    import numpy as np

    base = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"])

    def old_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b["o_orderkey"],
            "fp": b["o_totalprice"],
            "side": pa.array(["old"] * b.num_rows, pa.string()),
        })

    def new_side(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = (k % 101) != 0
        k = k[keep]
        price = b["o_totalprice"].to_numpy(zero_copy_only=False)[keep]
        price = np.where(k % 97 == 0, np.round(price + 1.0, 4), price)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "fp": pa.array(price, pa.float64()),
            "side": pa.array(["new"] * len(k), pa.string()),
        })

    tagged = base.map_batches(old_side, batch_format="pyarrow").union(
        base.map_batches(new_side, batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        sides = set(g["side"])
        if sides == {"old"}:
            status = "removed"
        elif sides == {"new"}:
            status = "added"
        else:
            o = g.loc[g["side"] == "old", "fp"].iloc[0]
            n = g.loc[g["side"] == "new", "fp"].iloc[0]
            status = "unchanged" if o == n else "changed"
        return pd.DataFrame({"status": [status], "n": [1]})

    counts = (tagged.groupby("k")
              .map_groups(classify, batch_format="pandas")
              .groupby("status").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts["n"] = counts["n"].astype("int64")
    return counts.sort_values("status").reset_index(drop=True)


def waiting_suppliers(sf_dir: str, *, num_partitions: int = 16,
                      k: int = 100):
    """TPC-H Q21 shape — correlated EXISTS + NOT EXISTS over a fact
    self-relationship: suppliers whose returned line (l_returnflag='R') is
    the ONLY return inside a multi-supplier order.

    The two correlated subqueries collapse into per-order set algebra, so
    the whole query is one keyed dataflow instead of three fact scans:
    per-batch Arrow group_by combiner → global groupby(l_orderkey,
    l_suppkey) Max(is_r) → order-level (n_supp, n_r_supp) counts attached
    back with the reduce-side lookup join (joins.hash_lookup_join — the
    fact key range here is order-sized, exactly the regime where Ray
    2.49's native join trips on empty partitions) → vectorized qualify
    filter → supplier-level Count.  The 10-row supplier dim attaches
    driver-side (broadcast pattern, suppliers_by_region).
    """
    from ..stages.joins import hash_lookup_join

    li = _lineitem(sf_dir, ["l_orderkey", "l_suppkey", "l_returnflag"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "is_r": pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64()),
        })
        return (pa.TableGroupBy(t, ["l_orderkey", "l_suppkey"])
                .aggregate([("is_r", "max")])
                .rename_columns(["l_orderkey", "l_suppkey", "is_r"]))

    per_os = (li.map_batches(partials, batch_format="pyarrow")
              .groupby(["l_orderkey", "l_suppkey"])
              .aggregate(Max("is_r", alias_name="is_r"))
              .materialize())  # (order, supplier)-sized; two consumers
    per_o = (per_os.groupby("l_orderkey")
             .aggregate(Count(alias_name="n_supp"),
                        Sum("is_r", alias_name="n_r_supp")))
    joined = hash_lookup_join(per_os, per_o, on="l_orderkey",
                              num_partitions=num_partitions)

    def qualify(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.equal(b["is_r"], 1),
                               pc.greater(b["n_supp"], 1)),
                       pc.equal(b["n_r_supp"], 1))
        return b.filter(keep).select(["l_suppkey"])

    per_supp = (joined.map_batches(qualify, batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Count(alias_name="numwait")))

    import pyarrow.parquet as pq
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_name"].to_pylist()))
    pdf = per_supp.to_pandas()
    pdf["s_name"] = pdf["l_suppkey"].map(names)
    pdf["numwait"] = pdf["numwait"].astype("int64")
    return (pdf.sort_values(["numwait", "s_name"],
                            ascending=[False, True])
            .head(k)[["s_name", "numwait"]].reset_index(drop=True))


def window_dedup_events(sf_dir: str):
    """Streaming-window deduplication: keep the FIRST event (lowest
    event_id) per (user_id, event_type) per tumbling hour and count the
    suppressed duplicates — the at-least-once-delivery cleanup every event
    pipeline runs.  One groupby on the (key, window) composite; the window
    bucket comes from the same vectorized floor_temporal kernel as
    hourly_event_windows."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])

    def add_window(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table({
            "user_id": b["user_id"],
            "event_type": b["event_type"],
            "window_start": pc.strftime(hour, format="%Y-%m-%d %H:00:00"),
            "event_id": b["event_id"],
        })

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_type": b["event_type"],
            "window_start": b["window_start"],
            "kept_event_id": pc.cast(b["kept_event_id"], pa.int64()),
            "n_dups": pc.cast(pc.subtract(b["n_events"], 1), pa.int64()),
        })

    # output stays a Dataset end to end — at 100 TB the deduped (key,
    # window) table is event-scale, so no driver collect; the sort is
    # distributed (drop it and write partitioned in production)
    return (ds.map_batches(add_window, batch_format="pyarrow")
            .groupby(["user_id", "event_type", "window_start"])
            .aggregate(Min("event_id", alias_name="kept_event_id"),
                       Count(alias_name="n_events"))
            .map_batches(finalize, batch_format="pyarrow")
            .sort(["user_id", "event_type", "window_start"]))


def gap_fill_locf(sf_dir: str):
    """Per-key calendar gap-fill with last-observation-carried-forward
    (LOCF) — the time-series repair step between gap DETECTION
    (missing_days) and downstream window math: each user's daily value
    series is completed over their own [first, last] activity span,
    missing days inheriting the previous observed day's value.

    Shape: per-batch (user, day, Σvalue) Arrow combiner → one groupby
    (user_id) whose per-group kernel is a vectorized searchsorted ffill
    over the user's calendar span (same one-key-stream-per-worker
    assumption as sessionize).  Output rows are span-sized, not
    event-sized."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b["user_id"],
            "day": pc.strftime(pc.floor_temporal(b["ts"], unit="day"),
                               format="%Y-%m-%d"),
            "v": b["value"],
        })
        return (pa.TableGroupBy(t, ["user_id", "day"])
                .aggregate([("v", "sum")])
                .rename_columns(["user_id", "day", "v"]))

    daily = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["user_id", "day"])
             .aggregate(Sum("v", alias_name="v")))

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        obs = pd.to_datetime(g["day"]).to_numpy()
        full = pd.date_range(obs[0], obs[-1], freq="D")
        # index of the last observed day ≤ each scaffold day
        idx = np.searchsorted(obs, full.to_numpy(), side="right") - 1
        vals = g["v"].to_numpy(np.float64)[idx]
        filled = ~np.isin(full.to_numpy(), obs)
        return pd.DataFrame({
            "user_id": np.repeat(g["user_id"].iloc[0], len(full)),
            "day": full.strftime("%Y-%m-%d"),
            "value": np.round(vals, 6),
            "filled": filled,
        })

    out = (daily.groupby("user_id")
           .map_groups(fill, batch_format="pandas")
           .map_batches(lambda b: b, batch_format="pyarrow"))
    return out.sort(["user_id", "day"])


def small_quantity_revenue(sf_dir: str, *, frac: float = 0.5,
                           num_partitions: int = 16):
    """TPC-H Q17 shape — correlated SCALAR subquery (compare each row to
    its own group's aggregate), decorrelated into dataflow: per-part avg
    quantity via a combiner groupby, attached back to every lineitem with
    the reduce-side lookup join, then a vectorized below-threshold filter
    and one global sum.  Lineitems with quantity < ``frac``·avg(part) are
    the lost small-order revenue.

    Output: one row (total_revenue, n_lines)."""
    from ..stages.joins import hash_lookup_join

    li = _lineitem(sf_dir, ["l_partkey", "l_quantity", "l_extendedprice"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": b["l_partkey"], "q": b["l_quantity"]})
        return (pa.TableGroupBy(t, "l_partkey")
                .aggregate([("q", "sum"), ("q", "count")])
                .rename_columns(["l_partkey", "q_sum", "n"]))

    per_part = (li.map_batches(partials, batch_format="pyarrow")
                .groupby("l_partkey")
                .aggregate(Sum("q_sum", alias_name="q_sum"),
                           Sum("n", alias_name="n")))

    def threshold(b: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(b["q_sum"], pa.float64()),
                        pc.cast(b["n"], pa.float64()))
        return pa.table({"l_partkey": b["l_partkey"],
                         "thr": pc.multiply(avg, pa.scalar(frac))})

    thr = per_part.map_batches(threshold, batch_format="pyarrow")
    joined = hash_lookup_join(li, thr, on="l_partkey",
                              num_partitions=num_partitions)

    def qualify(b: pa.Table) -> pa.Table:
        keep = pc.less(b["l_quantity"], b["thr"])
        b = b.filter(keep)
        return pa.table({"rev": b["l_extendedprice"],
                         "one": pa.array([1] * b.num_rows, pa.int64())})

    agg = (joined.map_batches(qualify, batch_format="pyarrow")
           .aggregate(Sum("rev", alias_name="rev"),
                      Sum("one", alias_name="n_lines")))
    return pa.table({
        "total_revenue": pa.array([round(float(agg["rev"] or 0.0), 4)],
                                  pa.float64()),
        "n_lines": pa.array([int(agg["n_lines"] or 0)], pa.int64()),
    })


def priority_order_counts(sf_dir: str, *, num_partitions: int = 16):
    """TPC-H Q4 shape — EXISTS semi join: orders with at least one
    returned lineitem, counted by order priority.  The EXISTS collapses
    to `joins.hash_semi_join` (right side = distinct returned order keys,
    key-only shuffle) followed by one vocabulary-sized groupby."""
    from ..stages.joins import hash_semi_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    returned = (_lineitem(sf_dir, ["l_orderkey", "l_returnflag"])
                .map_batches(
                    lambda b: (b.filter(pc.equal(b["l_returnflag"], "R"))
                               .select(["l_orderkey"])
                               .rename_columns(["o_orderkey"])),
                    batch_format="pyarrow"))
    kept = hash_semi_join(orders, returned, on="o_orderkey",
                          num_partitions=num_partitions)
    out = (kept.groupby("o_orderpriority")
           .aggregate(Count(alias_name="n_orders")))
    pdf = out.to_pandas()
    pdf["n_orders"] = pdf["n_orders"].astype("int64")
    return pdf.sort_values("o_orderpriority").reset_index(drop=True)


def pushdown_scan(sf_dir: str):
    """Predicate + projection pushdown AT THE READ: the row filter and
    column list are handed to ``read_parquet`` itself, so non-matching
    row-groups and unused columns never leave storage — there is no
    post-read filter stage at all ("prune at the read").  Returns one row
    (n_lines, total_revenue) for Q1-1995 shipments."""
    import pyarrow.dataset as pads

    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1995-04-01")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pads.scalar(lo))
               & (pads.field("l_shipdate") < pads.scalar(hi)))
    agg = ds.aggregate(Count(alias_name="n_lines"),
                       Sum("l_extendedprice", alias_name="rev"))
    return pa.table({
        "n_lines": pa.array([int(agg["n_lines"] or 0)], pa.int64()),
        "total_revenue": pa.array([round(float(agg["rev"] or 0.0), 4)],
                                  pa.float64()),
    })


def partitioned_write_prune(sf_dir: str, *, priority: str = "1-URGENT"):
    """Hive-partitioned write + partition-PRUNED read-back — the resumable
    output layout the 100 TB brief requires (one directory per key, a
    failed run skips finished partitions) plus the read-side payoff:
    re-reading ONE priority touches one directory, never the other four.

    Returns (o_orderpriority, n_orders, total_price) for the pruned
    partition, provably equal to filtering the source table."""
    import tempfile

    out = tempfile.mkdtemp(prefix="orders_by_priority_")
    (rd.read_parquet(f"{sf_dir}/orders.parquet",
                     columns=["o_orderkey", "o_totalprice",
                              "o_orderpriority"])
     .write_parquet(out, partition_cols=["o_orderpriority"]))

    part = rd.read_parquet(f"{out}/o_orderpriority={priority}")
    agg = part.aggregate(Count(alias_name="n"),
                         Sum("o_totalprice", alias_name="tp"))
    return pa.table({
        "o_orderpriority": pa.array([priority], pa.string()),
        "n_orders": pa.array([int(agg["n"] or 0)], pa.int64()),
        "total_price": pa.array([round(float(agg["tp"] or 0.0), 4)],
                                pa.float64()),
    })


def ewma_daily(sf_dir: str, *, alpha: float = 0.3):
    """Per-key exponentially-weighted moving average over the daily value
    series (the classic streaming smoother: v_t = α·x_t + (1−α)·v_{t−1},
    seeded with v_0 = x_0) — the stateful scan every monitoring/feature
    pipeline runs after gap repair.

    Shape: (user, day, Σvalue) combiner groupby → per-key ORDER-SENSITIVE
    scan in map_groups (one short numpy-backed recurrence per user's
    OBSERVED days; same one-key-stream assumption as sessionize/pack_bins).
    The oracle replays the recurrence exactly with a RECURSIVE CTE, so the
    float arithmetic matches operation for operation."""
    import numpy as np

    def _round6(x: "np.ndarray") -> "np.ndarray":
        # half-away-from-zero at 6 dp — DuckDB round() semantics (numpy
        # rounds half-to-even; EWMA values here are non-negative)
        return np.floor(x * 1e6 + 0.5) / 1e6

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b["user_id"],
            "day": pc.strftime(pc.floor_temporal(b["ts"], unit="day"),
                               format="%Y-%m-%d"),
            "v": b["value"],
        })
        return (pa.TableGroupBy(t, ["user_id", "day"])
                .aggregate([("v", "sum")])
                .rename_columns(["user_id", "day", "v"]))

    daily = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["user_id", "day"])
             .aggregate(Sum("v", alias_name="v")))

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day")
        # round the daily sums BEFORE the recurrence: the engine's and the
        # oracle's sums can differ in the last ulp (summation order), and
        # the recurrence amplifies that onto rounding boundaries
        x = _round6(g["v"].to_numpy(np.float64))
        out = np.empty_like(x)
        acc = x[0]
        out[0] = acc
        for i in range(1, len(x)):  # per-key series, order-sensitive scan
            acc = alpha * x[i] + (1.0 - alpha) * acc
            out[i] = acc
        return pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                             "day": g["day"].to_numpy(),
                             "value": x,
                             "ewma": _round6(out)})

    return (daily.groupby("user_id")
            .map_groups(smooth, batch_format="pandas")
            .map_batches(lambda b: b, batch_format="pyarrow")
            .sort(["user_id", "day"]))


def grouped_moments(sf_dir: str):
    """Grouped higher moments (stddev, skewness, excess kurtosis) from
    MERGEABLE power sums (n, Σx, Σx², Σx³, Σx⁴) — the algebraic-aggregate
    family one step past corr_by_returnflag: each block emits one partial
    row per group via Arrow hash group_by, native Sums merge them, and the
    central-moment closed forms run on the vocabulary-sized result.
    l_quantity ∈ [1, 50] keeps the power sums well-conditioned at any scale
    (the cancellation-prone case would switch to streaming Welford merges)."""
    import numpy as np

    ds = _lineitem(sf_dir, ["l_returnflag", "l_quantity"])

    def partials(b: pa.Table) -> pa.Table:
        x = pc.cast(b["l_quantity"], pa.float64())
        x2 = pc.multiply(x, x)
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": pa.array([1] * b.num_rows, pa.int64()),
            "s1": x, "s2": x2,
            "s3": pc.multiply(x2, x), "s4": pc.multiply(x2, x2),
        })
        return pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum"),
             ("s3", "sum"), ("s4", "sum")]
        ).rename_columns(["l_returnflag", "n", "s1", "s2", "s3", "s4"])

    stats = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("l_returnflag")
             .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                        Sum("s2", alias_name="s2"), Sum("s3", alias_name="s3"),
                        Sum("s4", alias_name="s4"))
             .to_pandas())
    n = stats["n"].to_numpy(np.float64)
    s1, s2 = stats["s1"].to_numpy(), stats["s2"].to_numpy()
    s3, s4 = stats["s3"].to_numpy(), stats["s4"].to_numpy()
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu ** 3
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu ** 4
    return pd.DataFrame({
        "l_returnflag": stats["l_returnflag"],
        "n": stats["n"].astype("int64"),
        "mean_qty": np.round(mu, 6),
        "std_qty": np.round(np.sqrt(m2), 6),
        "skew_qty": np.round(m3 / m2 ** 1.5, 6),
        "kurt_qty": np.round(m4 / (m2 * m2) - 3.0, 6),
    }).sort_values("l_returnflag").reset_index(drop=True)


def customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): how many customers placed
    exactly k orders, INCLUDING the zero-order customers a plain inner join
    loses.  Per-customer counts come from the combiner groupby; the
    distribution is a second (tiny) groupby; the zero bucket is the
    reduce-side ANTI join of the customer key column against the counted
    keys — customers and orders never all-to-all together."""
    from ..stages.joins import hash_anti_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def count_partials(b: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": b["o_custkey"],
                      "n": pa.array([1] * b.num_rows, pa.int64())})
        return pa.TableGroupBy(t, "o_custkey").aggregate(
            [("n", "sum")]).rename_columns(["o_custkey", "n"])

    counts = (orders.map_batches(count_partials, batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count")))

    dist = (counts.groupby("c_count").count()
            .map_batches(lambda b: b.select(["c_count", "count()"])
                         .rename_columns(["c_count", "custdist"]),
                         batch_format="pyarrow").to_pandas())

    cust_keys = rd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey"])
    counted = counts.map_batches(
        lambda b: b.select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow")
    n_zero = hash_anti_join(cust_keys, counted, on="c_custkey").count()
    if n_zero:
        dist = pd.concat([dist, pd.DataFrame({"c_count": [0],
                                              "custdist": [n_zero]})],
                         ignore_index=True)
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    return (dist.sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


def idle_rich_customers(sf_dir: str, *, cutoff: str = "2000-06-01"):
    """TPC-H Q22 shape (global-position anomaly): LAPSED rich customers —
    no orders since ``cutoff``, account balance above the global average
    POSITIVE balance — rolled up per nation.  The scalar subquery is a
    one-row algebraic aggregate (it rides the driver), the recent-order key
    set is read with the date predicate pushed INTO the parquet scan, the
    no-recent-orders set is the reduce-side ANTI join on the key column
    only, and the 25-row nation name map is a broadcast probe."""
    import pyarrow.parquet as pq

    from ..stages.joins import hash_anti_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])

    # scalar: global avg positive balance (sum/count partials → one row)
    def bal_partials(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b["c_acctbal"], 0.0))
        return pa.table({"s": pa.array([pc.sum(pos["c_acctbal"]).as_py()
                                        or 0.0], pa.float64()),
                         "n": pa.array([pos.num_rows], pa.int64())})

    agg = (cust.map_batches(bal_partials, batch_format="pyarrow")
           .aggregate(Sum("s"), Sum("n")))
    avg_bal = agg["sum(s)"] / agg["sum(n)"]

    import pyarrow.dataset as pads

    order_keys = (rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderdate")
               >= pads.scalar(pd.Timestamp(cutoff)))
        .map_batches(lambda b: b.rename_columns(["c_custkey"]),
                     batch_format="pyarrow"))
    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"],
                                      pa.scalar(avg_bal, pa.float64()))),
        batch_format="pyarrow")
    idle = hash_anti_join(rich, order_keys, on="c_custkey")

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ref = ray.put((pc.cast(nation["n_nationkey"], pa.int64()).combine_chunks(),
                   nation["n_name"].combine_chunks()))

    def add_nation(b: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        idx = pc.index_in(pc.cast(b["c_nationkey"], pa.int64()),
                          value_set=keys)
        return pa.table({"n_name": pc.take(names, idx),
                         "c_acctbal": b["c_acctbal"]})

    out = (idle.map_batches(add_nation, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Count(alias_name="numcust"),
                      Sum("c_acctbal", alias_name="totacctbal"))
           .to_pandas())
    out["totacctbal"] = out["totacctbal"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


def winsorized_means(sf_dir: str, *, lo_q: float = 0.1, hi_q: float = 0.9):
    """Outlier-robust grouped means: per l_returnflag, the P10/P90-clipped
    (winsorized) and P10/P90-filtered (trimmed) means of l_quantity —
    robust-statistics companions to robust_means (geometric/harmonic).

    groupby co-locates each flag's values (the exact-quantile partitioning
    assumption of value_quantiles: one group's values fit a worker; at
    scale the histogram-sketch path approximates the cut points instead);
    quantiles are numpy linear interpolation == DuckDB quantile_cont."""
    import numpy as np

    ds = _lineitem(sf_dir, ["l_returnflag", "l_quantity"])

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["l_quantity"].to_numpy(np.float64)
        lo = float(np.quantile(vals, lo_q))
        hi = float(np.quantile(vals, hi_q))
        clipped = np.clip(vals, lo, hi)
        kept = vals[(vals >= lo) & (vals <= hi)]
        return pd.DataFrame([{
            "l_returnflag": g["l_returnflag"].iloc[0],
            "n": np.int64(len(vals)),
            "p_lo": round(lo, 6), "p_hi": round(hi, 6),
            "winsorized_mean": round(float(clipped.mean()), 6),
            "trimmed_mean": round(float(kept.mean()), 6),
        }])

    out = (ds.groupby("l_returnflag")
           .map_groups(per_flag, batch_format="pandas")
           .to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def grouped_mad(sf_dir: str):
    """Median absolute deviation per group — the robust dispersion
    companion to grouped_moments' std: per l_returnflag,
    median(|l_quantity − median(l_quantity)|).  Same groupby co-location
    assumption as value_quantiles (one group's values fit a worker;
    histogram sketches are the approximate scale path); numpy median ==
    DuckDB median/quantile_cont(0.5)."""
    import numpy as np

    ds = _lineitem(sf_dir, ["l_returnflag", "l_quantity"])

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["l_quantity"].to_numpy(np.float64)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        return pd.DataFrame([{
            "l_returnflag": g["l_returnflag"].iloc[0],
            "n": np.int64(len(vals)),
            "median_qty": round(med, 6),
            "mad_qty": round(mad, 6),
        }])

    out = (ds.groupby("l_returnflag")
           .map_groups(per_flag, batch_format="pandas").to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def lang_source_chi2(sf_dir: str):
    """Chi-square independence statistic between two categorical columns
    (documents.lang × documents.source) — the data-quality test for "is
    this metadata independent of that one".  ONE contingency-combiner scan
    (per-batch Arrow group_by on the pair) → a cells-sized table; the
    statistic folds driver-side over |langs|×|sources| cells.  Integer
    observed counts; expected = row_total·col_total/n in float64.  Empty
    grid cells (observed=0) each contribute exactly their expected count,
    and Σexp over the full grid is n — so the full-grid statistic is
    chi2_observed + (n − Σexp_observed) without materializing the grid."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])

    def partials(b: pa.Table) -> pa.Table:
        t = b.append_column("c", pa.array(np.ones(b.num_rows, np.int64)))
        return (t.group_by(["lang", "source"]).aggregate([("c", "sum")])
                .rename_columns(["lang", "source", "c"]))

    cells = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["lang", "source"])
             .aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    n = float(cells["c"].sum())
    row = cells.groupby("lang")["c"].sum()
    col = cells.groupby("source")["c"].sum()
    exp = (cells["lang"].map(row).astype("float64")
           * cells["source"].map(col).astype("float64") / n)
    chi2 = float((((cells["c"] - exp) ** 2) / exp).sum() + (n - exp.sum()))
    dof = (len(row) - 1) * (len(col) - 1)
    return pd.DataFrame({
        "n": [np.int64(int(n))],
        "n_cells": [np.int64(len(cells))],
        "dof": [np.int64(dof)],
        "chi2": [float(np.floor(chi2 * 1e6 + 0.5) / 1e6)],
    })


def value_psi(sf_dir: str, *, split: str = "2024-01-15", bins: int = 10,
              lo: float = 0.0, hi: float = 400.0):
    """Population stability index of events.value between the periods
    before and after ``split`` — the standard drift metric a production
    pipeline alerts on.  Fixed equal-width bins (clamped), so bin counts
    are exact integers from one combiner scan; PSI folds driver-side over
    O(bins) cells.  Laplace +1 smoothing keeps empty bins finite and
    deterministic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    w = (hi - lo) / bins

    def partials(b: pa.Table) -> pa.Table:
        x = np.asarray(b["value"].to_numpy(zero_copy_only=False),
                       np.float64)
        idx = np.clip(np.floor((np.clip(x, lo, hi) - lo) / w),
                      0, bins - 1).astype(np.int64)
        period = pc.less(b["ts"], pa.scalar(pd.Timestamp(split)))
        per = np.where(period.to_numpy(zero_copy_only=False), "a", "b")
        t = pa.table({"period": pa.array(per),
                      "bin": pa.array(idx, pa.int64()),
                      "c": pa.array(np.ones(len(idx), np.int64))})
        return (t.group_by(["period", "bin"]).aggregate([("c", "sum")])
                .rename_columns(["period", "bin", "c"]))

    cells = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby(["period", "bin"])
             .aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    a = np.ones(bins, np.float64)   # Laplace +1
    b_ = np.ones(bins, np.float64)
    for _, r in cells.iterrows():
        (a if r["period"] == "a" else b_)[int(r["bin"])] += r["c"]
    pa_ = a / a.sum()
    pb_ = b_ / b_.sum()
    psi = float(np.sum((pa_ - pb_) * np.log(pa_ / pb_)))
    return pd.DataFrame({
        "bins": [np.int64(bins)],
        "n_before": [np.int64(int(a.sum() - bins))],
        "n_after": [np.int64(int(b_.sum() - bins))],
        "psi": [float(np.floor(psi * 1e6 + 0.5) / 1e6)],
    })


def gini_user_spend(sf_dir: str):
    """Exact Gini coefficient of per-user total event value — the
    inequality summary a marketplace health dashboard tracks ("how
    concentrated is spend").  G = Σᵢ(2i − n − 1)·xᵢ / (n·Σx) over the
    ascending-sorted user totals.

    Shape: per-user totals come from one combiner groupby (int64 cents,
    exact under any merge order); the totals table — user-vocabulary
    sized, never event-sized — is then ``sort``ed distributedly on
    (cents, user_id) (a strict total order: user_id is unique), and each
    batch emits ONE partial row (count, sum, Σ local_rank·x, min key).
    The driver folds the O(n_batches) partials in key order, offsetting
    local ranks by the running count — the same bounded-driver fold shape
    as the Gini's SQL window mirror, with an exact int64 numerator."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def cents_partials(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"].to_numpy(zero_copy_only=False),
                       np.float64)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        t = pa.table({"user_id": b["user_id"],
                      "cents": pa.array(cents, pa.int64())})
        return (t.group_by(["user_id"]).aggregate([("cents", "sum")])
                .rename_columns(["user_id", "cents"]))

    totals = (ds.map_batches(cents_partials, batch_format="pyarrow")
              .groupby("user_id").aggregate(Sum("cents", alias_name="x"))
              .sort(["x", "user_id"]))

    def rank_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(1, len(x) + 1, dtype=np.int64)
        return pa.table({
            "min_x": pa.array([int(x[0])], pa.int64()),
            "min_uid": pa.array([int(b["user_id"][0].as_py())], pa.int64()),
            "cnt": pa.array([len(x)], pa.int64()),
            "sum_x": pa.array([int(x.sum())], pa.int64()),
            "wsum": pa.array([int(np.sum(i * x))], pa.int64()),
        })

    parts = (totals.map_batches(rank_partial, batch_format="pyarrow")
             .to_pandas().sort_values(["min_x", "min_uid"])
             .reset_index(drop=True))
    # global Σ i·x: each batch's local ranks shift by the rows before it
    offsets = np.concatenate(([0], np.cumsum(parts["cnt"].to_numpy())[:-1]))
    wsum = int((parts["wsum"] + offsets * parts["sum_x"]).sum())
    n = int(parts["cnt"].sum())
    total = int(parts["sum_x"].sum())
    gini = (2.0 * wsum - (n + 1.0) * total) / (float(n) * total)
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "total_cents": [np.int64(total)],
        "gini": [float(np.floor(gini * 1e6 + 0.5) / 1e6)],
    })


def part_skyline(sf_dir: str):
    """Pareto frontier (skyline) over per-part aggregates: parts for which
    no other part has BOTH more total shipped quantity AND a lower minimum
    price (maximize total_q2, minimize min_cost2; strict dominance).

    Scale shape: the aggregates come from the usual per-batch combiner →
    grouped Sum/Min; the skyline itself exploits the algebraic identity
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — each block reduces
    to its LOCAL skyline (vectorized sort + running-max, no pair loop), and
    only those survivors (≤ the frontier size per block) reach the final
    single-pass merge.  No O(n²) dominance test anywhere.  Quantities and
    prices integerized at 1e2 so dominance never compares floats."""
    import numpy as np

    li = _lineitem(sf_dir, ["l_partkey", "l_quantity", "l_extendedprice"])

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
            "q2": pc.cast(pc.round(pc.multiply(b["l_quantity"],
                                               pa.scalar(100.0))),
                          pa.int64()),
            "c2": pc.cast(pc.round(pc.multiply(b["l_extendedprice"],
                                               pa.scalar(100.0))),
                          pa.int64())})
        t = t.group_by("l_partkey").aggregate([("q2", "sum"), ("c2", "min")])
        return t.rename_columns(["l_partkey", "q2", "c2"])

    per_part = (li.map_batches(partials, batch_format="pyarrow")
                .groupby("l_partkey")
                .aggregate(Sum("q2", alias_name="total_q2"),
                           Min("c2", alias_name="min_cost2")))

    def _skyline(key, qty, cost):
        """2-D strict-dominance skyline, O(n log n), fully vectorized.

        keep i  ⟺  no j with (c_j < c_i ∧ q_j ≥ q_i) ∨ (c_j = c_i ∧
        q_j > q_i), i.e. q_i strictly exceeds the best qty of every
        strictly-cheaper cost level AND equals the best qty at its own
        level.  Tied (cost, qty) duplicates all survive (neither strictly
        dominates the other)."""
        order = np.lexsort((qty, cost))
        q, c, k = qty[order], cost[order], key[order]
        starts = np.r_[0, np.flatnonzero(np.diff(c) != 0) + 1]
        gmax = np.maximum.reduceat(q, starts)          # max qty per level
        gid = np.searchsorted(starts, np.arange(len(c)), side="right") - 1
        run = np.maximum.accumulate(gmax)
        prev_best = np.r_[np.iinfo(np.int64).min, run[:-1]][gid]
        keep = (q > prev_best) & (q == gmax[gid])
        return k[keep], q[keep], c[keep]

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        k = np.asarray(b["l_partkey"].combine_chunks())
        q = np.asarray(b["total_q2"].combine_chunks())
        c = np.asarray(b["min_cost2"].combine_chunks())
        k, q, c = _skyline(k, q, c)
        return pa.table({"l_partkey": pa.array(k, pa.int64()),
                         "total_q2": pa.array(q, pa.int64()),
                         "min_cost2": pa.array(c, pa.int64())})

    cand = per_part.map_batches(local_skyline,
                                batch_format="pyarrow").to_pandas()
    k, q, c = _skyline(cand["l_partkey"].to_numpy(),
                       cand["total_q2"].to_numpy(),
                       cand["min_cost2"].to_numpy())
    out = pd.DataFrame({
        "p_partkey": pd.Series(k, dtype="int64"),
        "total_qty": pd.Series(q, dtype="float64") / 100.0,
        "min_price": pd.Series(c, dtype="float64") / 100.0})
    return out.sort_values("p_partkey").reset_index(drop=True)


def topn_orders_per_customer(sf_dir: str, *, n: int = 3):
    """Top-``n`` orders per customer by total price (ROW_NUMBER ≤ n shape),
    deterministic tie-break = lowest o_orderkey.

    Scale shape: a per-batch combiner keeps at most ``n`` rows per customer
    per block (pandas C-level sort + groupby.head — no Python row loop), so
    the shuffle carries ≤ n × |customers-in-block| rows; the grouped final
    pass re-applies the same head-n.  Prices ride as exact cents."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderkey",
                                      "o_totalprice"])

    def partial_topn(b: pa.Table) -> pa.Table:
        df = pa.table({
            "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
            "price2": pc.cast(pc.round(pc.multiply(b["o_totalprice"],
                                                   pa.scalar(100.0))),
                              pa.int64())}).to_pandas()
        df = df.sort_values(["o_custkey", "price2", "o_orderkey"],
                            ascending=[True, False, True])
        df = df.groupby("o_custkey", sort=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price2", "o_orderkey"],
                          ascending=[False, True]).head(n)
        g = g.copy()
        g["rnk"] = range(1, len(g) + 1)
        return g

    out = (orders.map_batches(partial_topn, batch_format="pyarrow")
           .groupby("o_custkey")
           .map_groups(final_topn, batch_format="pandas")
           .to_pandas())
    res = pd.DataFrame({
        "o_custkey": out["o_custkey"].astype("int64"),
        "rnk": out["rnk"].astype("int64"),
        "o_orderkey": out["o_orderkey"].astype("int64"),
        "o_totalprice": out["price2"].astype("float64") / 100.0})
    return res.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)


def user_streaks(sf_dir: str):
    """Gaps-and-islands: per user, maximal runs of consecutive active DAYS
    in the events table — streak count, longest streak, total active days.

    Scale shape: per-batch DISTINCT (user, day) combiner (Arrow group_by)
    → grouped distinct → per-user island scan as one numpy diff over the
    sorted day ordinals inside map_groups (events co-located by user_id;
    the distinct-day set per user is calendar-bounded, thousands at most,
    so no group can blow a worker)."""
    import numpy as np

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def day_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": pc.cast(pc.floor_temporal(b["ts"], unit="day"),
                           pa.date32())})
        return t.group_by(["user_id", "day"]).aggregate([])

    days = (ev.map_batches(day_partial, batch_format="pyarrow")
            .groupby(["user_id", "day"])
            .aggregate(Count(alias_name="_c")))

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["day"].to_numpy().astype("datetime64[D]")
                    .astype(np.int64))
        breaks = int((np.diff(d) != 1).sum())
        lengths = np.diff(np.r_[0, np.flatnonzero(np.diff(d) != 1) + 1,
                                len(d)])
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_streaks": [breaks + 1],
            "longest": [int(lengths.max())],
            "active_days": [len(d)]})

    out = (days.groupby("user_id")
           .map_groups(islands, batch_format="pandas")
           .to_pandas())
    for c in ("n_streaks", "longest", "active_days"):
        out[c] = out[c].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def decayed_activity(sf_dir: str, *, decay: float = 0.9):
    """Recency-weighted user activity: Σ value·λ^Δdays with Δdays measured
    back from the corpus max date — the time-decay feature recommendation /
    fraud pipelines keep per user.  Unlike the recursive EWMA
    (``ewma_daily``), the decay-to-reference sum is ALGEBRAIC: per-batch
    partials merge under any order, so it's one combiner ``group_by`` +
    one native Sum shuffle, no order-sensitive scan.

    Two passes: a scalar max-date aggregate (one tiny fold), then the
    weighted combiner pass with the reference date in the task closure.
    Output rounds to 6dp (floor-half-up, mirrored in SQL) for float
    merge-order immunity."""
    import numpy as np

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ref_day = np.datetime64(ds.max("ts"), "D")

    def partials(b: pa.Table) -> pa.Table:
        days = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        delta = (ref_day - days).astype(np.int64)
        w = np.power(decay, delta.astype(np.float64))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({
            "user_id": b["user_id"],
            "dv": pa.array(v * w, pa.float64()),
            "n": pa.array(np.ones(len(v), np.int64)),
        })
        return (t.group_by(["user_id"])
                .aggregate([("dv", "sum"), ("n", "sum")])
                .rename_columns(["user_id", "dv", "n"]))

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Sum("dv", alias_name="dv"), Sum("n", alias_name="n")))

    def finish(b: pa.Table) -> pa.Table:
        dv = b["dv"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "n_events": b["n"],
            "decayed_value": pa.array(np.floor(dv * 1e6 + 0.5) / 1e6,
                                      pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def rfm_scores(sf_dir: str, *, n_bands: int = 5):
    """RFM (recency / frequency / monetary) quintile scoring per user —
    the classic marketing segmentation, here as the LLM-era "which data
    sources are active and valuable" profile.

    Shape: ONE combiner groupby builds the per-user aggregate table
    (max day via Max, count via Sum, exact int64 cents via the gini
    convention); each metric's band boundaries are exact order statistics
    from that table's distinct-value histogram (the curriculum_order
    machinery: driver folds metric-vocabulary counts, never user rows at
    scale beyond the aggregate itself — user-vocabulary sized, not
    event-sized).  Ties share a band, so assignment is deterministic
    without a tie-break rank.  Bands ascend with the metric value
    (r_band 1 = most recent, f/m_band {n_bands} = most active/valuable).
    """
    import numpy as np

    from ray.data.aggregate import Max, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ref_day = np.datetime64(ds.max("ts"), "D")

    def partials(b: pa.Table) -> pa.Table:
        days = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        t = pa.table({
            "user_id": b["user_id"],
            "day": pa.array(days, pa.int64()),
            "n": pa.array(np.ones(len(v), np.int64)),
            "cents": pa.array(cents, pa.int64()),
        })
        return (t.group_by(["user_id"])
                .aggregate([("day", "max"), ("n", "sum"), ("cents", "sum")])
                .rename_columns(["user_id", "day", "n", "cents"]))

    per_user = (ds.map_batches(partials, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Max("day", alias_name="day"),
                           Sum("n", alias_name="n"),
                           Sum("cents", alias_name="cents"))
                .materialize())

    ref_int = ref_day.astype("datetime64[D]").astype(np.int64)

    def metrics(b: pa.Table) -> pa.Table:
        rec = ref_int - b["day"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "recency_days": pa.array(rec.astype(np.int64), pa.int64()),
            "frequency": b["n"],
            "monetary_cents": b["cents"],
        })

    m = per_user.map_batches(metrics, batch_format="pyarrow").materialize()

    def bounds_for(col: str) -> np.ndarray:
        # distinct-value histogram → exact order-statistic boundaries
        # (trainset.curriculum_order semantics: rank ceil(k*n/B), ties
        # share a band)
        from ray.data.aggregate import Sum as _Sum

        hist = (m.select_columns([col])
                .map_batches(
                    lambda b, _c=col: (
                        pa.table({_c: b[_c]})
                        .group_by([_c]).aggregate([([], "count_all")])
                        .rename_columns([_c, "cnt"])),
                    batch_format="pyarrow")
                .groupby(col).aggregate(_Sum("cnt", alias_name="cnt"))
                .to_pandas().sort_values(col).reset_index(drop=True))
        counts = hist["cnt"].to_numpy(dtype=np.int64)
        vals = hist[col].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        ranks = np.array([-(-k * n // n_bands)
                          for k in range(1, n_bands)], dtype=np.int64)
        return vals[np.searchsorted(cum, ranks, side="left")]

    rb = bounds_for("recency_days")
    fb = bounds_for("frequency")
    mb = bounds_for("monetary_cents")

    def assign(b: pa.Table) -> pa.Table:
        def band(col: str, bounds: np.ndarray) -> pa.Array:
            x = b[col].to_numpy(zero_copy_only=False)
            return pa.array(
                (np.searchsorted(bounds, x, side="left") + 1)
                .astype(np.int64), pa.int64())

        return (b.append_column("r_band", band("recency_days", rb))
                 .append_column("f_band", band("frequency", fb))
                 .append_column("m_band", band("monetary_cents", mb)))

    return m.map_batches(assign, batch_format="pyarrow")


def late_event_audit(sf_dir: str, *, lateness_hours: int = 24):
    """Streaming watermark semantics replayed in batch: within each user's
    stream (arrival order = event_id), the watermark after arrival i is
    ``max(ts[0..i-1]) − lateness`` — an event whose event-time falls behind
    the watermark is LATE and would be dropped/side-routed by a streaming
    window operator.  This audit quantifies that loss before anyone turns
    on real streaming ingestion.

    Shape: one groupby(user) co-locates each stream, per-group vectorized
    prefix-max scan (``np.maximum.accumulate`` — no Python loop); the same
    one-key-stream partitioning assumption as sessionize/ewma_daily.
    Lateness is exact integer seconds (µs epoch arithmetic).

    The synthetic event stream arrives in event-time order, so this audit
    correctly reports ZERO late events on it (pinned by the oracle AND a
    test); the firing path is exercised on a shuffled synthetic stream in
    tests/test_expectations.py."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    return watermark_audit(ds, lateness_hours=lateness_hours)


def watermark_audit(ds, *, lateness_hours: int = 24):
    """Core of ``late_event_audit`` over any (event_id, user_id, ts)
    stream dataset."""
    import numpy as np

    late_us = np.int64(lateness_hours) * 3_600_000_000

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        prev_max = np.empty_like(us)
        prev_max[0] = us[0]          # first arrival is never late
        if len(us) > 1:
            prev_max[1:] = np.maximum.accumulate(us)[:-1]
        wm = prev_max - late_us
        late = us < wm
        lateness_sec = np.where(late, (wm - us) // 1_000_000, 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "is_late": late.astype(np.int64),
            "lateness_sec": lateness_sec.astype(np.int64),
        })

    return ds.groupby("user_id").map_groups(audit, batch_format="pandas")


def daily_trend(sf_dir: str):
    """Per-event-type linear trend: closed-form least-squares slope /
    intercept of daily total value vs day index — "is this source growing"
    as exact algebra, no iterative optimizer.

    Shape: (type, day) totals from one combiner groupby (calendar-sized);
    the regression is computed from ALGEBRAIC moments (Σx, Σy, Σxy, Σx²)
    per type — a second vocabulary-sized groupby, merge-order-free.
    Mirrored by DuckDB's ``regr_slope``/``regr_intercept`` (identical
    closed form).  Day index = days since the per-type minimum day, so the
    intercept is each type's own day-0 level.  Output rounds to 6dp."""
    import numpy as np

    from ray.data.aggregate import Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def day_partials(b: pa.Table) -> pa.Table:
        days = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({
            "event_type": b["event_type"],
            "day": pa.array(days, pa.int64()),
            "v": b["value"],
        })
        return (t.group_by(["event_type", "day"])
                .aggregate([("v", "sum")])
                .rename_columns(["event_type", "day", "v"]))

    daily = (ds.map_batches(day_partials, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Sum("v", alias_name="v"))
             .materialize())

    mins = {r["event_type"]: r["min_day"] for r in
            daily.groupby("event_type")
            .aggregate(Min("day", alias_name="min_day")).take_all()}

    def moments(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pylist()
        day = b["day"].to_numpy(zero_copy_only=False)
        x = (day - np.asarray([mins[e] for e in et], np.int64)) \
            .astype(np.float64)
        y = b["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({
            "event_type": b["event_type"],
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x),
        })
        return (t.group_by(["event_type"])
                .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                            ("sxy", "sum"), ("sxx", "sum")])
                .rename_columns(["event_type", "n", "sx", "sy", "sxy",
                                 "sxx"]))

    mom = (daily.map_batches(moments, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))

    n = mom["n"].to_numpy(np.float64)
    sx, sy = mom["sx"].to_numpy(), mom["sy"].to_numpy()
    sxy, sxx = mom["sxy"].to_numpy(), mom["sxx"].to_numpy()
    # single-day group → zero denominator; emit NULL like DuckDB's
    # regr_slope instead of inf/NaN-from-division (ADVICE r3)
    den = n * sxx - sx * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(den == 0.0, np.nan, (n * sxy - sx * sy) / den)
        intercept = np.where(den == 0.0, np.nan, (sy - slope * sx) / n)
    r6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731
    return pd.DataFrame({
        "event_type": mom["event_type"],
        "n_days": mom["n"].astype("int64"),
        "slope": r6(slope),
        "intercept": r6(intercept),
    })


def seasonal_anomalies(sf_dir: str, *, mad_k: float = 3.0):
    """Seasonal-baseline anomaly detection: per event type, each day's
    total is compared to that type's DAY-OF-WEEK mean (the weekly
    seasonality baseline); days whose |residual| exceeds ``mad_k`` × the
    type's median absolute residual are flagged — the robust
    weekday-aware monitor that plain z-scores (which a weekend dip fools)
    get wrong.

    Shape: one combiner groupby to (type, day) totals (calendar-sized),
    then ONE co-located per-type group scan computes baselines, residuals
    and the MAD flag — no further shuffle.  Output rounds to 6dp."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def day_partials(b: pa.Table) -> pa.Table:
        days = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]")
        t = pa.table({
            "event_type": b["event_type"],
            "day": pa.array(days),
            "v": b["value"],
        })
        return (t.group_by(["event_type", "day"]).aggregate([("v", "sum")])
                .rename_columns(["event_type", "day", "v"]))

    daily = (ds.map_batches(day_partials, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Sum("v", alias_name="v")))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day").copy()
        dow = pd.to_datetime(g["day"]).dt.dayofweek
        base = g.groupby(dow)["v"].transform("mean")
        resid = g["v"] - base
        mad = float(np.median(np.abs(resid)))
        r6 = lambda a: np.floor(np.asarray(a) * 1e6 + 0.5) / 1e6  # noqa
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "day": pd.to_datetime(g["day"]).dt.strftime("%Y-%m-%d")
            .to_numpy(),
            "v": r6(g["v"]),
            "baseline": r6(base),
            "residual": r6(resid),
            "is_anomaly": (np.abs(resid.to_numpy()) > mad_k * mad)
            .astype(np.int64),
        })

    return daily.groupby("event_type").map_groups(flag,
                                                  batch_format="pandas")


def part_kcore(sf_dir: str, *, k: int = 68, n_rounds: int = 8,
               num_partitions: int | None = None):
    """k-core decomposition (fixed-round peel) over the parts-bought-
    together graph — the iterative-PEELING graph family next to
    part_triangles (counting) and part_khop (traversal): ``n_rounds``
    synchronous rounds of "drop every node with degree < k, then drop the
    edges that lost an endpoint"; survivors with their within-core degrees
    are the dense backbone community miners start from (Seidman 1983).

    Shape per round: ONE native Count groupby over the symmetric edge list
    (degrees) + TWO reduce-side semi-joins (``stages.joins.hash_semi_join``
    — key-bucket co-shuffle, no broadcast of the node set, no
    ``Dataset.join``), all edge-table sized and monotonically SHRINKING as
    nodes peel.  The fixed round count is what makes the DuckDB mirror an
    exact unrolled-CTE replay; the convergence test pins that the sf0.001
    graph reaches its true fixpoint well inside the default rounds.

    Output: (part, degree) for every node still in the core after
    ``n_rounds``, degree counted over the surviving edge set.  The default
    k=68 sits just below the test graphs' degree phase transition, so the
    peel genuinely cascades (5 rounds at sf0.001) yet leaves a nonempty
    core at both test scales; convergence inside the default rounds is
    pinned by test."""
    import numpy as np

    from ..stages.joins import auto_partitions, hash_semi_join

    nparts = auto_partitions(num_partitions)
    ds = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy(np.int64))
        if len(parts) < 2:
            return pd.DataFrame({"e": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(parts), k=1)
        return pd.DataFrame({"e": (parts[i] << 32) | parts[j]})

    def symmetrize(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        a, bb = e >> 32, e & 0xFFFFFFFF
        return pa.table({
            "u": pa.array(np.concatenate([a, bb]), pa.int64()),
            "v": pa.array(np.concatenate([bb, a]), pa.int64())})

    from ..stages.joins import exact_fold

    # exact_fold below the map_groups: its schema-less empty blocks would
    # float64-poison the fold and crash symmetrize's int shifts once part
    # ids pack past 2**53 (see exact_fold's docstring)
    sym = (exact_fold(ds.groupby("l_orderkey")
                      .map_groups(per_order, batch_format="pandas"),
                      "e", Count(alias_name="_n"))
           .drop_columns(["_n"])
           .map_batches(symmetrize, batch_format="pyarrow")
           .materialize())

    for _ in range(n_rounds):
        deg = exact_fold(sym, "u", Count(alias_name="deg"),
                         nparts=nparts)
        surv = (deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k))
            .select(["u"]), batch_format="pyarrow"))
        surv_v = surv.map_batches(
            lambda b: pa.table({"v": b["u"]}), batch_format="pyarrow")
        # each semi-join multiplies the block count ~3×; without the
        # repartition the per-round block count (and scheduler overhead)
        # compounds geometrically across rounds (measured 16 → 1296 blocks
        # by round 3, 2.7 s → 160 s per round at sf0.001)
        sym = hash_semi_join(sym, surv, on="u", num_partitions=nparts)
        sym = (hash_semi_join(sym, surv_v, on="v",
                              num_partitions=nparts)
               .repartition(nparts).materialize())

    out = (exact_fold(sym, "u", Count(alias_name="degree"),
                      nparts=nparts)
           .to_pandas())
    out = out.rename(columns={"u": "part"}).astype(
        {"part": "int64", "degree": "int64"})
    return out.sort_values("part").reset_index(drop=True)


def part_assortativity(sf_dir: str, *, num_partitions: int | None = None):
    """Degree assortativity (Newman 2002) of the parts-bought-together
    graph: the Pearson correlation of (deg(u), deg(v)) over the DIRECTED
    edge list — one scalar summarizing whether hubs attach to hubs
    (positive) or to the periphery (negative); the structural-health
    metric next to part_triangles' clustering signal.

    Shape: the same distinct symmetric edge list as part_kcore, ONE native
    Count groupby for degrees, TWO reduce-side lookup joins
    (``hash_lookup_join`` — bucket co-shuffle, no broadcast of the degree
    table) to attach both endpoint degrees, then per-batch INTEGER moment
    partials (n, Σx, Σy, Σxy, Σx², Σy²) folded by native Sums — the
    rel_daily_trend algebraic-moments pattern, so the final double
    arithmetic is bit-identical to the SQL mirror regardless of
    partitioning.  Driver sees six integers.

    Output: one row (n_edges, assortativity), NULL when a degree side is
    constant (zero variance)."""
    import math

    import numpy as np

    from ..stages.joins import auto_partitions, hash_lookup_join

    nparts = auto_partitions(num_partitions)
    ds = _lineitem(sf_dir, ["l_orderkey", "l_partkey"])

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy(np.int64))
        if len(parts) < 2:
            return pd.DataFrame({"e": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(parts), k=1)
        return pd.DataFrame({"e": (parts[i] << 32) | parts[j]})

    def symmetrize(b: pa.Table) -> pa.Table:
        e = b["e"].to_numpy(zero_copy_only=False)
        a, bb = e >> 32, e & 0xFFFFFFFF
        return pa.table({
            "u": pa.array(np.concatenate([a, bb]), pa.int64()),
            "v": pa.array(np.concatenate([bb, a]), pa.int64())})

    from ..stages.joins import exact_fold

    # exact_fold below the map_groups: its schema-less empty blocks would
    # float64-poison the fold and crash symmetrize's int shifts once part
    # ids pack past 2**53 (see exact_fold's docstring)
    sym = (exact_fold(ds.groupby("l_orderkey")
                      .map_groups(per_order, batch_format="pandas"),
                      "e", Count(alias_name="_n"))
           .drop_columns(["_n"])
           .map_batches(symmetrize, batch_format="pyarrow")
           .materialize())

    # exact_fold again: the sym fold's own aggregate can emit fresh
    # schema-less empties, and a float64-drifted ``u`` would break the
    # lookup join's integer-hash co-location silently
    deg_u = exact_fold(sym, "u", Count(alias_name="du"), nparts=nparts)
    deg_v = deg_u.map_batches(
        lambda b: pa.table({"v": b["u"], "dv": b["du"]}),
        batch_format="pyarrow")
    withx = hash_lookup_join(sym, deg_u, on="u", num_partitions=nparts)
    withxy = hash_lookup_join(withx, deg_v, on="v", num_partitions=nparts)

    def moments(b: pa.Table) -> pa.Table:
        x = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64())})

    agg = (withxy.map_batches(moments, batch_format="pyarrow")
           .sum(["n", "sx", "sy", "sxy", "sxx", "syy"]))
    n, sx, sy = int(agg["sum(n)"]), int(agg["sum(sx)"]), int(agg["sum(sy)"])
    sxy, sxx, syy = (int(agg["sum(sxy)"]), int(agg["sum(sxx)"]),
                     int(agg["sum(syy)"]))
    denx, deny = n * sxx - sx * sx, n * syy - sy * sy
    if denx <= 0 or deny <= 0:
        r = None
    else:
        # each variance factor is converted to double BEFORE the product
        # (the exact int64 product overflows; the SQL mirror casts the
        # same way so both sides round identically)
        r = float(np.floor((n * sxy - sx * sy)
                           / math.sqrt(float(denx) * float(deny))
                           * 1e6 + 0.5) / 1e6)
    return pd.DataFrame({"n_edges": pd.array([n], dtype="int64"),
                         "assortativity": pd.array([r], dtype="float64")})
