"""Round-3 batch 8: the last TPC-H shapes — Q2 (correlated MIN),
Q11 (grouped aggregate vs a global-scalar threshold), Q12 (fact⋈fact join
with conditional counts).  Each vs its DuckDB oracle at sf0.001."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

TABLES = ("lineitem", "orders", "supplier", "part", "nation", "region")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _vs_oracle(con, got, sql, sort_cols):
    want = (con.execute(sql).df()
            .sort_values(sort_cols).reset_index(drop=True))
    got = got.sort_values(sort_cols).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert (got[c] - want[c]).abs().max() < 1e-9, c
        else:
            assert got[c].equals(want[c]), c


def test_q2_min_cost_supplier(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        min_cost_supplier_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        min_cost_supplier)

    got = min_cost_supplier(SF)
    _vs_oracle(con, got, min_cost_supplier_sql(5, "EUROPE"),
               ["p_partkey", "s_name"])
    # every winner's cost is the per-part minimum: no part may appear with
    # two different costs
    assert (got.groupby("p_partkey")["cost"].nunique() == 1).all()


def test_q2_only_region_suppliers(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        min_cost_supplier)

    got = min_cost_supplier(SF, region="AFRICA")
    allowed = set(con.execute(
        """SELECT n.n_name FROM nation n JOIN region r
           ON r.r_regionkey = n.n_regionkey
           WHERE r.r_name = 'AFRICA'""").df()["n_name"])
    assert set(got["nation"]) <= allowed


def test_q11_important_parts(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        important_parts_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        important_parts)

    got = important_parts(SF)
    _vs_oracle(con, got, important_parts_sql("EUROPE", 1.5), ["p_partkey"])
    # threshold is strict: every kept part is above 1.5× the mean
    assert len(got) > 0


def test_q11_empty_when_threshold_unreachable(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        important_parts)

    # n_parts × value2 can never exceed 1e9 × total — schema survives empty
    got = important_parts(SF, mult=1e9)
    assert len(got) == 0
    assert list(got.columns) == ["p_partkey", "value"]


def test_q12_priority_shipments(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        priority_shipments_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        priority_shipments)

    got = priority_shipments(SF)
    _vs_oracle(con, got, priority_shipments_sql(), ["l_returnflag"])
    # conditional counts partition the joined lines exactly
    total = int((got["high_line_count"] + got["low_line_count"]).sum())
    want_total = con.execute(
        """SELECT count(*) FROM lineitem l
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
             AND l.l_shipdate < TIMESTAMP '1997-01-01'""").fetchone()[0]
    assert total == want_total
