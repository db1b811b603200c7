"""asof_join custom operator: backward as-of semantics per key."""

import pandas as pd


def test_asof_join_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import asof_join

    t = lambda s: pd.Timestamp(f"2024-01-01 {s}")
    left = rd.from_items([
        {"lid": 1, "user": 1, "ts": t("10:00")},   # matches r at 09:30
        {"lid": 2, "user": 1, "ts": t("09:00")},   # before any right → null
        {"lid": 3, "user": 1, "ts": t("09:30")},   # EQUAL ts matches (<=)
        {"lid": 4, "user": 2, "ts": t("12:00")},   # user 2 has no right rows
        {"lid": 5, "user": 1, "ts": t("11:00")},   # matches r at 10:30
    ])
    right = rd.from_items([
        {"rid": 10, "user": 1, "ts": t("09:30")},
        {"rid": 11, "user": 1, "ts": t("10:30")},
    ])
    out = (asof_join(left, right, by="user", on="ts",
                     right_cols=["ts", "rid"])
           .to_pandas().sort_values("lid").reset_index(drop=True))
    got = {int(r["lid"]): (None if pd.isna(r["rid_r"]) else int(r["rid_r"]))
           for _, r in out.iterrows()}
    assert got == {1: 10, 2: None, 3: 10, 4: None, 5: 11}
    assert len(out) == 5  # every left row exactly once


def test_asof_join_survives_repartition(ray_session):
    """Co-location comes from the groupby, not input partitioning."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = rd.from_items([
        {"lid": i, "user": i % 5, "ts": t0 + pd.Timedelta(minutes=i)}
        for i in range(100)]).repartition(7)
    right = rd.from_items([
        {"rid": 1000 + i, "user": i % 5,
         "ts": t0 + pd.Timedelta(minutes=i, seconds=30)}
        for i in range(100)]).repartition(3)
    out = asof_join(left, right, by="user", on="ts",
                    right_cols=["ts", "rid"]).to_pandas()
    assert len(out) == 100
    # each left at minute i matches the same-user right at minute i-5 + 30s
    m = out.set_index("lid")
    assert int(m.loc[42, "rid_r"]) == 1000 + 37
    assert pd.isna(m.loc[3, "rid_r"])  # first event per user: no prior right
