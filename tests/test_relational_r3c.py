"""Round-3 batch 3: JSON extraction, sufficient-statistics corr/regression,
grouped z-score anomalies."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_json_extract_semantics(ray_session, tmp_path):
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        # varied whitespace; one row missing the key -> dropped
        "props": pa.array(['{"k": 7}', '{"k":13}', '{ "k" : 25 }',
                           '{"other": 1}'], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        props_sum_by_key)

    out = props_sum_by_key(str(tmp_path))
    # buckets: k=7 -> 0, k=13 -> 10, k=25 -> 20; row 4 dropped
    assert out.values.tolist() == [
        ["a", 0, 1.0, 1], ["a", 10, 2.0, 1], ["b", 20, 3.0, 1]]


def test_corr_matches_numpy(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        corr_by_returnflag)

    out = corr_by_returnflag(SF).set_index("l_returnflag")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity",
                                "l_extendedprice"]).to_pandas()
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(np.float64)
        y = g["l_extendedprice"].to_numpy(np.float64)
        r = np.corrcoef(x, y)[0, 1]
        slope, intercept = np.polyfit(x, y, 1)
        row = out.loc[flag]
        assert row["n"] == len(g)
        assert abs(row["corr_qty_price"] - r) < 1e-5
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-2


def test_zscore_matches_pandas(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        event_value_anomalies)

    out = event_value_anomalies(SF, z_threshold=2.0).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type",
                                "value"]).to_pandas()
    g = ev.groupby("event_type")["value"]
    z = (ev["value"] - g.transform("mean")) / g.transform(
        lambda s: s.std(ddof=0))
    expect = set(ev.loc[z.abs() >= 2.0, "event_id"])
    assert set(out["event_id"]) == expect
    assert (out["z"].abs() >= 2.0).all()


def test_returned_items_semantics(ray_session, tmp_path):
    # two customers; cust 1 has one returned line, cust 2 two returned lines
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string()),
        "l_extendedprice": pa.array([100.0, 999.0, 50.0, 60.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.5], pa.float64()),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 20], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["cust10", "cust20"], pa.string()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["AAA", "BBB"], pa.string()),
    }), tmp_path / "nation.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        returned_item_report)

    out = returned_item_report(str(tmp_path), k=10, num_partitions=2)
    # cust10: 100*0.9 = 90 ; cust20: 50 + 60*0.5 = 80
    assert out.values.tolist() == [
        [10, "cust10", "AAA", 90.0], [20, "cust20", "BBB", 80.0]]


def test_large_orders_having_filter(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        large_volume_customers)

    out = large_volume_customers(SF, min_qty=250.0, num_partitions=4)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_quantity"]).to_pandas()
    expect = li.groupby("l_orderkey")["l_quantity"].sum()
    expect = set(expect[expect > 250.0].index)
    assert set(out["o_orderkey"]) == expect
    assert (out["sum_qty"] > 250.0).all()
    # sorted by sum_qty desc with orderkey tie-break
    assert out["sum_qty"].is_monotonic_decreasing or len(out) <= 1


def test_value_deciles_ntile_semantics(ray_session, tmp_path):
    # 7 rows, 3 buckets: NTILE sizes 3,2,2
    pq.write_table(pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "event_type": pa.array(["t"] * 7, pa.string()),
        "value": pa.array([5.0, 1.0, 3.0, 2.0, 7.0, 6.0, 4.0], pa.float64()),
    }), tmp_path / "events.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        value_deciles)

    out = (value_deciles(str(tmp_path), n_buckets=3).to_pandas()
           .sort_values("tile").reset_index(drop=True))
    assert out[["tile", "n", "min_value", "max_value"]].values.tolist() == [
        [1, 3, 1.0, 3.0], [2, 2, 4.0, 5.0], [3, 2, 6.0, 7.0]]


def test_day_over_day_pct_change(ray_session, tmp_path):
    import pandas as pd

    pq.write_table(pa.table({
        "o_orderdate": pa.array(pd.to_datetime(
            ["2024-01-01"] * 2 + ["2024-01-02"] * 4 + ["2024-01-03"] * 3),
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.0] * 9, pa.float64()),
    }), tmp_path / "orders.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        day_over_day)

    out = day_over_day(str(tmp_path))
    assert out["day"].tolist() == ["2024-01-02", "2024-01-03"]
    assert out["pct_change"].tolist() == [1.0, -0.25]


def test_data_profile_flags_violations(ray_session, tmp_path):
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 10, 99], pa.int64()),   # 99 is orphan
        "o_totalprice": pa.array([5.0, -1.0, None], pa.float64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 7], pa.int64()),         # 7 is orphan
        "l_quantity": pa.array([2.0, 0.0], pa.float64()),
        "l_discount": pa.array([0.5, 1.5], pa.float64()),   # 1.5 invalid
    }), tmp_path / "lineitem.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        data_profile)

    out = data_profile(str(tmp_path), num_partitions=2)
    got = {(r.table_name, r.metric): r.value for r in out.itertuples()}
    assert got[("orders", "row_count")] == 3
    assert got[("orders", "null_o_totalprice")] == 1
    assert got[("orders", "nonpositive_o_totalprice")] == 1
    assert got[("orders", "orphan_o_custkey")] == 1
    assert got[("orders", "distinct_o_custkey")] == 2
    assert got[("lineitem", "discount_out_of_range")] == 1
    assert got[("lineitem", "nonpositive_l_quantity")] == 1
    assert got[("lineitem", "orphan_l_orderkey")] == 1


def test_missing_days_gap(ray_session, tmp_path):
    import pandas as pd

    pq.write_table(pa.table({
        "o_orderdate": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-05"]), pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        missing_days)

    out = missing_days(str(tmp_path))
    assert out["day"].tolist() == ["2024-01-03", "2024-01-04"]


def test_table_diff_statuses(ray_session, tmp_path):
    # keys: 97 -> changed (price bump), 101 -> removed, others unchanged
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 97, 101, 194], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    }), tmp_path / "orders.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        table_diff)

    out = table_diff(str(tmp_path))
    got = dict(zip(out["status"], out["n"]))
    assert got == {"changed": 2, "removed": 1, "unchanged": 1}
