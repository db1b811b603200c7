"""Deequ-style data-quality expectations (Schelter et al., VLDB 2018):
declare table constraints, get one violation report — the pre-flight check
a 100 TB ingest runs before anything downstream trusts the data.

Three constraint families, each with the right distributed shape:

- ROW checks (non-null, value range, domain membership): pure per-batch
  Arrow predicates folded to per-batch counts — one streaming scan emits
  ALL row checks at once, partials merge by Sum; no shuffle of data rows.
- UNIQUENESS: violations = n_rows − n_distinct(key); the distinct count is
  one key-only combiner groupby (the exact-dedup shuffle shape).
- REFERENTIAL integrity: child keys ∉ parent = the distributed
  ``hash_anti_join`` (reduce-side, hash-partitioned both sides).

Output: (check, n_checked, n_violations) — small, driver-safe.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _row_check_partials(checks):
    """Build a map_batches kernel emitting one partial-count row per check:
    ``checks`` is a list of (name, fn) where fn(batch) -> BooleanArray of
    VIOLATIONS (true = bad row)."""

    def kernel(b: pa.Table) -> pa.Table:
        names, checked, viol = [], [], []
        for name, fn in checks:
            mask = fn(b)
            names.append(name)
            checked.append(b.num_rows)
            viol.append(int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0))
        return pa.table({
            "check": pa.array(names, pa.string()),
            "n_checked": pa.array(checked, pa.int64()),
            "n_violations": pa.array(viol, pa.int64()),
        })

    return kernel


def expectations_report(sf_dir: str, *, num_partitions: int = 16):
    """Constraint suite over orders ⟂ lineitem:

    - ``orders.custkey_not_null``      o_custkey IS NOT NULL
    - ``orders.totalprice_positive``   o_totalprice > 0
    - ``orders.status_in_domain``      o_orderstatus ∈ {O, F, P}
    - ``orders.orderkey_unique``       o_orderkey has no duplicates
    - ``lineitem.discount_in_range``   0 ≤ l_discount ≤ 0.05 (tight bound
      so the check demonstrably FIRES on the test data)
    - ``lineitem.orderkey_in_orders``  l_orderkey references orders
    """
    from ray.data.aggregate import Sum

    from .joins import hash_anti_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount"])

    domain = pa.array(["O", "F", "P"], pa.string())
    o_checks = [
        ("orders.custkey_not_null",
         lambda b: pc.is_null(b["o_custkey"])),
        ("orders.totalprice_positive",
         lambda b: pc.invert(pc.greater(b["o_totalprice"], pa.scalar(0.0)))),
        # NULL status is NOT a domain violation (SQL NOT IN yields NULL →
        # counted 0 by the oracle); mask nulls out of the inverted is_in
        # so engine and oracle agree if null statuses appear (ADVICE r3)
        ("orders.status_in_domain",
         lambda b: pc.and_kleene(
             pc.invert(pc.is_in(b["o_orderstatus"], value_set=domain)),
             pc.is_valid(b["o_orderstatus"]))),
    ]
    l_checks = [
        ("lineitem.discount_in_range",
         lambda b: pc.invert(pc.and_(
             pc.greater_equal(b["l_discount"], pa.scalar(0.0)),
             pc.less_equal(b["l_discount"], pa.scalar(0.05))))),
    ]

    row_parts = (
        orders.map_batches(_row_check_partials(o_checks),
                           batch_format="pyarrow")
        .union(li.map_batches(_row_check_partials(l_checks),
                              batch_format="pyarrow"))
        .groupby("check")
        .aggregate(Sum("n_checked", alias_name="n_checked"),
                   Sum("n_violations", alias_name="n_violations"))
        .to_pandas())

    # uniqueness: n − n_distinct via a key-only combiner groupby
    n_orders = orders.count()
    n_distinct = (orders.select_columns(["o_orderkey"])
                  .map_batches(
                      lambda b: b.group_by(["o_orderkey"]).aggregate([]),
                      batch_format="pyarrow")
                  .groupby("o_orderkey").count().count())
    uniq = pd.DataFrame({
        "check": ["orders.orderkey_unique"],
        "n_checked": pd.array([n_orders], dtype="int64"),
        "n_violations": pd.array([n_orders - n_distinct], dtype="int64"),
    })

    # referential: child keys with no parent (distributed anti join)
    n_li = li.count()
    orphans = hash_anti_join(
        li.select_columns(["l_orderkey"]),
        orders.select_columns(["o_orderkey"]).rename_columns(["l_orderkey"]),
        on="l_orderkey", num_partitions=num_partitions).count()
    ref = pd.DataFrame({
        "check": ["lineitem.orderkey_in_orders"],
        "n_checked": pd.array([n_li], dtype="int64"),
        "n_violations": pd.array([orphans], dtype="int64"),
    })

    out = pd.concat([row_parts, uniq, ref], ignore_index=True)
    out["n_checked"] = out["n_checked"].astype("int64")
    out["n_violations"] = out["n_violations"].astype("int64")
    return out.sort_values("check").reset_index(drop=True)
