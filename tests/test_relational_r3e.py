"""Round-3 batch 5: grouped higher moments, TPC-H Q13/Q22 shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_grouped_moments_match_scipy_free_numpy(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        grouped_moments)

    out = grouped_moments(SF).set_index("l_returnflag")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity"]).to_pandas()
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(np.float64)
        mu, m2 = x.mean(), x.var()          # population moments
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        row = out.loc[flag]
        assert row["n"] == len(g)
        assert abs(row["mean_qty"] - mu) < 1e-6
        assert abs(row["std_qty"] - np.sqrt(m2)) < 1e-6
        assert abs(row["skew_qty"] - m3 / m2 ** 1.5) < 1e-6
        assert abs(row["kurt_qty"] - (m4 / m2 ** 2 - 3)) < 1e-6


def test_custdist_includes_zero_bucket(ray_session, tmp_path):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        customer_order_distribution)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
    }), tmp_path / "orders.parquet")
    out = customer_order_distribution(str(tmp_path))
    dist = dict(zip(out["c_count"], out["custdist"]))
    assert dist == {3: 1, 1: 1, 0: 2}
    # sorted custdist desc, then c_count desc
    assert out["c_count"].tolist() == [0, 3, 1]


def test_idle_rich_matches_pandas(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        idle_rich_customers)

    out = idle_rich_customers(SF)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    avg = cust.loc[cust["c_acctbal"] > 0, "c_acctbal"].mean()
    recent = set(orders.loc[orders["o_orderdate"]
                            >= pd.Timestamp("2000-06-01"), "o_custkey"])
    idle = cust[(cust["c_acctbal"] > avg)
                & ~cust["c_custkey"].isin(recent)]
    exp = (idle.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           .groupby("n_name")
           .agg(numcust=("c_custkey", "size"),
                totacctbal=("c_acctbal", "sum"))
           .reset_index())
    exp["totacctbal"] = exp["totacctbal"].round(2)
    got = out.sort_values("n_name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.sort_values("n_name").reset_index(drop=True),
        check_dtype=False)


def test_decayed_activity_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        decayed_activity)

    sf = "/root/testdata/sf0.001"
    got = (decayed_activity(sf, decay=0.9).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    ref = ev["ts"].dt.floor("D").max()
    delta = (ref - ev["ts"].dt.floor("D")).dt.days.to_numpy()
    ev["dv"] = ev["value"].to_numpy() * np.power(0.9, delta)
    want = (ev.groupby("user_id")
            .agg(n_events=("dv", "size"), decayed_value=("dv", "sum"))
            .reset_index())
    want["decayed_value"] = np.floor(
        want["decayed_value"].to_numpy() * 1e6 + 0.5) / 1e6
    pd.testing.assert_frame_equal(
        got, want.sort_values("user_id").reset_index(drop=True),
        check_dtype=False, atol=2e-6)
    # decay sanity: every |decayed| <= plain |sum|
    plain = ev.groupby("user_id")["value"].apply(
        lambda s: np.abs(s).sum()).to_numpy()
    assert (np.abs(got["decayed_value"].to_numpy()) <= plain + 1e-9).all()


def test_daily_trend_matches_numpy_polyfit(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        daily_trend)

    sf = "/root/testdata/sf0.001"
    got = daily_trend(sf).set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].dt.floor("D")
    for et, g in ev.groupby("event_type"):
        d = g.groupby("day")["value"].sum().sort_index()
        x = (d.index - d.index.min()).days.to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, d.to_numpy(), 1)
        assert abs(got.loc[et, "slope"] - slope) < 1e-6
        assert abs(got.loc[et, "intercept"] - intercept) < 1e-6
        assert got.loc[et, "n_days"] == len(d)


def test_seasonal_anomalies_semantics(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        seasonal_anomalies)

    sf = "/root/testdata/sf0.001"
    got = seasonal_anomalies(sf, mad_k=3.0).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["day"] = ev["ts"].dt.floor("D")
    daily = (ev.groupby(["event_type", "day"])["value"].sum()
             .reset_index(name="v"))
    # one output row per (type, day)
    assert len(got) == len(daily)
    # replay one type
    et = daily["event_type"].iloc[0]
    d = daily[daily["event_type"] == et].sort_values("day")
    dow = d["day"].dt.dayofweek
    base = d.groupby(dow)["v"].transform("mean")
    resid = d["v"] - base
    mad = float(np.median(np.abs(resid)))
    want_flags = (np.abs(resid.to_numpy()) > 3.0 * mad).astype(int)
    g = got[got["event_type"] == et].sort_values("day")
    assert g["is_anomaly"].tolist() == want_flags.tolist()
    assert np.allclose(
        g["residual"].to_numpy(),
        np.floor(resid.to_numpy() * 1e6 + 0.5) / 1e6, atol=1e-9)
    # residuals sum ~0 within each (type, dow) cell by construction
    g2 = got.copy()
    g2["dow"] = pd.to_datetime(g2["day"]).dt.dayofweek
    cell = g2.groupby(["event_type", "dow"])["residual"].sum()
    assert (cell.abs() < 1e-3).all()
