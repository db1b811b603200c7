"""Salted two-phase groupby: identical results to unsalted, hot key spread."""

import pandas as pd


def _skewed_ds(rd, n=5000):
    # vendor_000 owns 60% of rows — a deliberately hot key
    rows = [{"repo": ("vendor_000" if i % 10 < 6 else f"vendor_{i % 7 + 1:03d}"),
             "views": (i * 37) % 1000, "message_id": i} for i in range(n)]
    return rd.from_items(rows)


def test_salted_topk_equals_unsalted(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.skew import (salted_groupby, topk_phase1,
                                                topk_phase2)

    ds = _skewed_ds(rd)
    salted = (salted_groupby(ds, "repo", topk_phase1(5, "views"),
                             topk_phase2(5, "views"), n_salts=8)
              .to_pandas())

    plain = (_skewed_ds(rd).groupby("repo")
             .map_groups(lambda g: g.nlargest(5, "views"),
                         batch_format="pandas").to_pandas())

    canon = lambda df: (df.sort_values(["repo", "views", "message_id"])
                        .reset_index(drop=True)[["repo", "views", "message_id"]])
    pd.testing.assert_frame_equal(canon(salted), canon(plain))


def test_salted_quantile_counts(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.skew import (approx_quantile_phase1,
                                                approx_quantile_phase2,
                                                salted_groupby)

    ds = _skewed_ds(rd, 2000)
    out = salted_groupby(
        ds.select_columns(["repo", "views"]), "repo",
        approx_quantile_phase1("views"), approx_quantile_phase2("views", 0.5),
        n_salts=4).to_pandas()
    assert out["n"].sum() == 2000
    assert out.set_index("repo").loc["vendor_000", "n"] == 1200
    assert (out["views_q50"] >= 0).all()
