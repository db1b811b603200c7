"""KMV approximate-distinct sketch: error bound + merge correctness."""


def test_kmv_exact_when_under_k(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import approx_ndistinct

    rows = [{"v": f"item_{i % 37}"} for i in range(5000)]
    out = approx_ndistinct(rd.from_items(rows), "v", k=256).to_pandas()
    assert out["approx_ndistinct"][0] == 37.0  # fewer than k distinct → exact


def test_kmv_error_bound(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import approx_ndistinct

    n_distinct = 20000
    rows = [{"v": f"val_{i % n_distinct}"} for i in range(60000)]
    out = approx_ndistinct(rd.from_items(rows), "v", k=1024).to_pandas()
    est = out["approx_ndistinct"][0]
    # 1/sqrt(1024) ≈ 3.1% expected; assert a loose 15% bound
    assert abs(est - n_distinct) / n_distinct < 0.15, est


def test_kmv_merge_distributed_block_invariant(ray_session):
    """VERDICT r2 #3: the merge is a distributed AggregateFn fold — the
    estimate must be invariant to block layout (1 block vs 32 blocks), and
    the driver-side path never materializes the partials dataset (pinned by
    monkeypatching Dataset.to_pandas to raise inside approx_ndistinct)."""
    import ray.data as rd
    from ray.data import Dataset

    from amharic_ecommerce_data_extractor_ray.stages.sketch import approx_ndistinct

    rows = [{"v": f"val_{i % 5000}"} for i in range(20000)]
    wide = rd.from_items(rows).repartition(32)
    narrow = rd.from_items(rows).repartition(1)

    orig = Dataset.to_pandas
    def _boom(self, *a, **kw):
        raise AssertionError("approx_ndistinct must not collect partials "
                             "via to_pandas")
    Dataset.to_pandas = _boom
    try:
        est_wide = approx_ndistinct(wide, "v", k=512)["approx_ndistinct"][0].as_py()
        est_narrow = approx_ndistinct(narrow, "v", k=512)["approx_ndistinct"][0].as_py()
    finally:
        Dataset.to_pandas = orig
    assert est_wide == est_narrow
    assert abs(est_wide - 5000) / 5000 < 0.15


def test_histogram_quantile_within_one_bin_of_exact(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        histogram_quantile)

    sf = "/root/testdata/sf0.001"
    lo, hi, bins = 0.0, 120_000.0, 1024
    out = histogram_quantile(
        rd.read_parquet(f"{sf}/lineitem.parquet",
                        columns=["l_extendedprice"]),
        col="l_extendedprice", quantiles=(0.25, 0.5, 0.75, 0.95),
        lo=lo, hi=hi, bins=bins).to_pandas()
    exact = np.quantile(pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_extendedprice"])["l_extendedprice"].to_numpy(),
        [0.25, 0.5, 0.75, 0.95])
    w = (hi - lo) / bins
    assert np.all(np.abs(out["estimate"].to_numpy() - exact) <= w)
    assert out["estimate"].is_monotonic_increasing


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        stratified_sample)

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang", "source"])
    rates = {"en": 10, "fr": 100, "es": 50}
    a = stratified_sample(docs, stratum_col="lang", key_col="doc_id",
                          rates_pct=rates).to_pandas()
    b = stratified_sample(docs, stratum_col="lang", key_col="doc_id",
                          rates_pct=rates).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])   # deterministic
    full = docs.to_pandas()
    by = a.groupby("lang").size()
    n_fr = (full["lang"] == "fr").sum()
    assert by.get("fr", 0) == n_fr                      # 100% stratum kept
    assert set(a["lang"]) <= {"en", "fr", "es"}         # default 0 dropped
    n_en = (full["lang"] == "en").sum()
    assert 0 < by.get("en", 0) < 0.35 * n_en            # ~10% of en


def test_grouped_histogram_quantile_within_bin_of_exact(ray_session):
    import numpy as np
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        grouped_histogram_quantile)

    rng = np.random.RandomState(7)
    rows = []
    for g, scale in (("a", 50.0), ("b", 200.0)):
        for v in rng.uniform(0, scale, 3000):
            rows.append({"g": g, "v": float(v)})
    lo, hi, bins = 0.0, 250.0, 500
    out = grouped_histogram_quantile(
        rd.from_items(rows, override_num_blocks=8), group_col="g", col="v",
        quantiles=(0.5, 0.9), lo=lo, hi=hi, bins=bins).to_pandas()
    w = (hi - lo) / bins
    assert len(out) == 4
    for g, scale in (("a", 50.0), ("b", 200.0)):
        for q in (0.5, 0.9):
            est = float(out[(out["g"] == g)
                            & (out["q"] == q)]["estimate"].iloc[0])
            exact = float(np.quantile(
                [r["v"] for r in rows if r["g"] == g], q))
            assert abs(est - exact) <= 2 * w, (g, q, est, exact)


def test_grouped_histogram_quantile_block_invariant(ray_session):
    """Partial histograms are mergeable: the result must not depend on how
    the input is split into blocks."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        grouped_histogram_quantile)

    rows = [{"g": "x" if i % 3 else "y", "v": float(i % 97)}
            for i in range(2000)]
    kw = dict(group_col="g", col="v", quantiles=(0.25, 0.75),
              lo=0.0, hi=100.0, bins=100)
    one = grouped_histogram_quantile(
        rd.from_items(rows, override_num_blocks=1), **kw).to_pandas() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    many = grouped_histogram_quantile(
        rd.from_items(rows, override_num_blocks=16), **kw).to_pandas() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    assert one.equals(many)


def test_value_percentiles_close_to_exact(ray_session):
    """Histogram percent-rank within one bin's mass of the exact rank."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        value_percentiles)

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "value"])
    out = (value_percentiles(ds, col="value", id_col="event_id",
                             lo=0.0, hi=512.0, bins=1024)
           .to_pandas().set_index("event_id"))
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    vals = np.sort(ev["value"].to_numpy())
    n = len(vals)
    # exact mid-rank percentile for a sample of rows
    for row in ev.head(50).itertuples():
        lo_r = np.searchsorted(vals, row.value, side="left") / n
        hi_r = np.searchsorted(vals, row.value, side="right") / n
        got = out.loc[row.event_id, "pct"]
        assert lo_r - 0.02 <= got <= hi_r + 0.02, (row.value, got, lo_r, hi_r)


def test_rolling_distinct_calendar_window(ray_session, tmp_path):
    """Window is by calendar day (gap days shrink the union), and the
    merged-sketch estimate equals a direct single-process recompute."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        _h64, kmv_estimate, rolling_distinct)

    rows = []
    # day 1: users 1-10; day 2: users 5-14; day 10 (gap!): users 100-104
    for u in range(1, 11):
        rows.append(("2024-01-01 10:00", u))
    for u in range(5, 15):
        rows.append(("2024-01-02 10:00", u))
    for u in range(100, 105):
        rows.append(("2024-01-10 10:00", u))
    tbl = pa.table({
        "ts": pa.array(pd.to_datetime([r[0] for r in rows]),
                       pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    ds = rd.read_parquet(str(tmp_path / "events.parquet"))
    out = (rolling_distinct(ds, ts_col="ts", id_col="user_id",
                            window_days=7, k=8)
           .to_pandas().set_index("day"))
    def direct(users):
        hs = sorted({_h64(str(u)) for u in users})[:8]
        return round(kmv_estimate([hs], 8), 1)
    assert out.loc["2024-01-01", "approx_distinct"] == direct(range(1, 11))
    assert out.loc["2024-01-02", "approx_distinct"] == direct(range(1, 15))
    # Jan 10 window [Jan 4, Jan 10] excludes both earlier days
    assert out.loc["2024-01-10", "approx_distinct"] == direct(range(100, 105))


def test_exact_quantiles_match_numpy_kth(ray_session):
    import math

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        exact_quantiles)

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["value"])
    out = exact_quantiles(ds, col="value", quantiles=(0.5, 0.95),
                          lo=0.0, hi=512.0, bins=64).to_pandas()
    vals = np.sort(pq.read_table(f"{sf}/events.parquet",
                                 columns=["value"])["value"].to_numpy())
    for q, got in zip(out["q"], out["exact"]):
        k = max(1, math.ceil(q * len(vals)))
        assert got == vals[k - 1]


def test_exact_quantiles_skew_guard(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        exact_quantiles)

    ds = rd.from_pandas(pd.DataFrame({"value": [1.0] * 1000}))
    with pytest.raises(ValueError, match="refine set"):
        exact_quantiles(ds, col="value", quantiles=(0.5,), lo=0.0, hi=512.0,
                        bins=8, max_refine_rows=10)
