"""Round-3 batch 6: remaining TPC-H shapes (Q7/Q8/Q9/Q14/Q15/Q16/Q19)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

TABLES = ("lineitem", "orders", "customer", "supplier", "part",
          "nation", "region")


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


def test_q7_nation_trade_exact_int_sums(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        nation_trade_volume_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        nation_trade_volume)

    got = nation_trade_volume(SF)
    _vs_oracle(con, got, nation_trade_volume_sql("1998-01-01"),
               ["supp_nation", "cust_nation", "l_year"])
    # cross-nation only
    assert (got["supp_nation"] != got["cust_nation"]).all()


def test_q8_market_share_bounded(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import market_share_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        market_share)

    got = market_share(SF)
    _vs_oracle(con, got, market_share_sql("NATION_3", "ASIA", "PROMO"),
               ["o_year"])
    assert got["mkt_share"].between(0.0, 1.0).all()


def test_q9_product_profit(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        product_profit_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        product_profit)

    got = product_profit(SF)
    _vs_oracle(con, got, product_profit_sql("widget", 0.6),
               ["nation", "o_year"])


def test_q14_promo_revenue(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import promo_revenue_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        promo_revenue)

    got = promo_revenue(SF)
    want = con.execute(promo_revenue_sql()).df()
    assert abs(got["promo_revenue"][0] - want["promo_revenue"][0]) < 1e-9
    assert 0.0 <= got["promo_revenue"][0] <= 100.0


def test_q15_top_supplier_max_filter(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import top_supplier_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        top_supplier)

    got = top_supplier(SF)
    _vs_oracle(con, got, top_supplier_sql(), ["s_suppkey"])
    # every returned supplier carries the same (max) revenue
    assert got["total_revenue"].nunique() == 1


def test_q16_supplier_counts_distinct_and_blocklist(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        part_supplier_counts_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        part_supplier_counts)

    got = part_supplier_counts(SF)
    _vs_oracle(con, got, part_supplier_counts_sql("Brand#1", 1500.0),
               ["p_brand", "p_type", "p_size"])
    assert (got["p_brand"] != "Brand#1").all()


def test_q19_disjunctive_revenue(ray_session, con):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        disjunctive_revenue_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        disjunctive_revenue)

    got = disjunctive_revenue(SF)
    want = con.execute(disjunctive_revenue_sql()).df()
    assert abs(got["revenue"][0] - want["revenue"][0]) < 1e-6
