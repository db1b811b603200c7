"""TPC-H Q20 shape + grouped MAD (round 3, batch 9)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_heavy_suppliers_matches_sql(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        heavy_suppliers_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        heavy_suppliers)

    got = heavy_suppliers(SF, frac=0.2)
    want = _con().execute(heavy_suppliers_sql("widget", 0.2)).df()
    assert got["s_suppkey"].tolist() == want["s_suppkey"].tolist()
    assert got["s_name"].tolist() == want["s_name"].tolist()
    assert got["nation"].tolist() == want["nation"].tolist()
    assert len(got) > 0


def test_heavy_suppliers_empty_threshold(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.tpch_ext import (
        heavy_suppliers)

    # frac=1.0 can never qualify (a supplier cannot exceed the part total)
    got = heavy_suppliers(SF, frac=1.0)
    assert len(got) == 0
    assert list(got.columns) == ["s_suppkey", "s_name", "nation"]


def test_grouped_mad_matches_numpy_and_sql(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import grouped_mad_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        grouped_mad)

    got = grouped_mad(SF)
    want = _con().execute(grouped_mad_sql()).df()
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    for c in ("median_qty", "mad_qty"):
        assert np.abs(got[c] - want[c]).max() < 1e-9, c

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity"]).to_pandas()
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(np.float64)
        row = got.set_index("l_returnflag").loc[flag]
        assert abs(row["median_qty"] - np.median(x)) < 1e-6
        assert abs(row["mad_qty"]
                   - np.median(np.abs(x - np.median(x)))) < 1e-6
