"""Heavy-hitter vocabulary + sessionization operators."""

import pandas as pd


def test_token_topk(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import token_topk

    rows = [{"text": "a b a"}, {"text": "b a"}, {"text": "c"}, {"text": None}]
    out = token_topk(rd.from_items(rows), k=2).to_pandas()
    assert list(out["token"]) == ["a", "b"]
    assert list(out["n"]) == [3, 2]


def test_token_topk_tiebreak(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import token_topk

    out = token_topk(rd.from_items([{"text": "z y x z y x"}]), k=3).to_pandas()
    # equal counts → token asc
    assert list(out["token"]) == ["x", "y", "z"]


def test_sessionize(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import sessionize

    t0 = pd.Timestamp("2024-03-01 10:00:00")
    rows = [
        # user 1: two sessions (45-min gap between events 2 and 3)
        {"user_id": 1, "ts": t0, "value": 1.0},
        {"user_id": 1, "ts": t0 + pd.Timedelta(minutes=10), "value": 2.0},
        {"user_id": 1, "ts": t0 + pd.Timedelta(minutes=55), "value": 4.0},
        # user 2: one session, exactly-30-min gap does NOT split
        {"user_id": 2, "ts": t0, "value": 1.5},
        {"user_id": 2, "ts": t0 + pd.Timedelta(minutes=30), "value": 2.5},
    ]
    out = (sessionize(rd.from_items(rows)).to_pandas()
           .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
    assert len(out) == 3
    u1 = out[out["user_id"] == 1]
    assert list(u1["n_events"]) == [2, 1]
    assert list(u1["sum_value"]) == [3.0, 4.0]
    assert u1.iloc[0]["session_end"] == "2024-03-01 10:10:00"
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [2]
