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
