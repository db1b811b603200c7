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
