"""Round-3 batch 2: funnel, moving-average frame, full outer join, ordered
string agg, triangle counting, Gopher repetition filters."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[2] for r in rows]),
                       pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")


def test_funnel_semantics(ray_session, tmp_path):
    _write_events(tmp_path, [
        # user 1: full funnel inside the windows
        (1, 1, "2024-01-01 10:00", "view"),
        (2, 1, "2024-01-01 12:00", "click"),
        (3, 1, "2024-01-02 11:00", "purchase"),
        # user 2: click arrives 25h after first view -> funnel stops at view
        (4, 2, "2024-01-01 10:00", "view"),
        (5, 2, "2024-01-02 11:30", "click"),
        # user 3: click but purchase BEFORE the click -> stops at click
        (6, 3, "2024-01-01 09:00", "purchase"),
        (7, 3, "2024-01-01 10:00", "view"),
        (8, 3, "2024-01-01 11:00", "click"),
        # user 4: never views
        (9, 4, "2024-01-01 10:00", "click"),
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        event_funnel)

    out = event_funnel(str(tmp_path), window_hours=24).set_index("step")
    assert out.loc["1_view", "users"] == 3
    assert out.loc["2_click", "users"] == 2      # users 1 and 3
    assert out.loc["3_purchase", "users"] == 1   # user 1 only


def test_moving_avg_matches_pandas_rolling(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        daily_moving_avg)

    out = daily_moving_avg(SF, window_days=7)
    df = out.to_pandas().sort_values(["priority", "day"]).reset_index(
        drop=True)
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    orders["day"] = orders["o_orderdate"].dt.strftime("%Y-%m-%d")
    orders["cents"] = np.rint(orders["o_totalprice"] * 100).astype(np.int64)
    daily = (orders.groupby(["o_orderpriority", "day"], as_index=False)
             ["cents"].sum().sort_values(["o_orderpriority", "day"]))
    for prio, g in daily.groupby("o_orderpriority"):
        want = (g["cents"].rolling(7, min_periods=1).sum().to_numpy()
                / 100.0) / g["cents"].rolling(7, min_periods=1).count()\
            .to_numpy()
        got = df[df["priority"] == prio]["moving_avg"].to_numpy()
        assert np.allclose(got, np.floor(want * 1e6 + 0.5) / 1e6)


def test_full_outer_keeps_both_exclusives(ray_session, tmp_path):
    tbl = pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(
            ["1995-03-01", "2000-04-01", "1995-05-01", "2000-06-01"]),
            pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.5]),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        customers_year_outer)

    df = (customers_year_outer(str(tmp_path), y1=1995, y2=2000).to_pandas()
          .sort_values("o_custkey").reset_index(drop=True))
    assert list(df["o_custkey"]) == [1, 2, 3]
    r1 = df[df["o_custkey"] == 1].iloc[0]
    assert r1["total_y1"] == 10.0 and r1["total_y2"] == 20.0
    r2 = df[df["o_custkey"] == 2].iloc[0]
    assert r2["total_y1"] == 30.0 and pd.isna(r2["total_y2"])
    r3 = df[df["o_custkey"] == 3].iloc[0]
    assert pd.isna(r3["total_y1"]) and r3["total_y2"] == 40.5


def test_event_paths_order_and_ties(ray_session, tmp_path):
    _write_events(tmp_path, [
        (2, 1, "2024-01-01 10:00", "view"),
        (1, 1, "2024-01-01 10:05", "click"),     # ts tie below ↓
        (3, 1, "2024-01-01 10:05", "purchase"),  # event_id breaks tie
        (9, 2, "2024-01-01 11:00", "error"),
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        event_paths)

    df = event_paths(str(tmp_path), n_users=40).to_pandas().set_index(
        "user_id")
    assert df.loc[1, "path"] == "view->click->purchase"
    assert df.loc[1, "n_events"] == 3
    assert df.loc[2, "path"] == "error"


def test_triangles_small_graph(ray_session, tmp_path):
    # orders define cliques: order 1 = {1,2,3} (1 triangle), order 2 =
    # {3,4}, order 3 = {2,3,4} (adds edges 2-4, 3-4 -> triangle 2-3-4)
    rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4), (3, 2), (3, 3), (3, 4)]
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_triangles)

    out = part_triangles(str(tmp_path))
    assert int(out["triangles"].iloc[0]) == 2


def test_triangles_matches_duckdb(ray_session):
    from amharic_ecommerce_data_extractor_ray import oracles
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_triangles)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS "
            f"SELECT * FROM '{SF}/lineitem.parquet'")
    want = con.sql(oracles.part_triangles_sql()).df()["triangles"].iloc[0]
    got = part_triangles(SF)["triangles"].iloc[0]
    assert int(got) == int(want)


def test_repetition_kernel():
    from amharic_ecommerce_data_extractor_ray.stages.textstats import (
        repetition_batch)

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a a b", "x", "c d c d c"], pa.string()),
    })
    out = repetition_batch(batch, text_col="text").to_pandas()
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert r1["n_tokens"] == 3
    assert r1["top_token_frac"] == round(2 / 3, 6)
    assert r1["top_bigram_frac"] == 0.5          # "a a" and "a b" once each
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert r2["n_tokens"] == 1
    assert r2["top_token_frac"] == 1.0
    assert r2["top_bigram_frac"] == 0.0          # no bigrams
    r3 = out[out["doc_id"] == 3].iloc[0]
    # tokens: c x3 of 5; bigrams: "c d" x2, "d c" x2 of 4
    assert r3["top_token_frac"] == 0.6
    assert r3["top_bigram_frac"] == 0.5


def test_cohort_semantics(ray_session, tmp_path):
    _write_events(tmp_path, [
        # user 1 signs up Wed Jan 3 (cohort Mon Jan 1), active weeks 0 and 2
        (1, 1, "2024-01-03 10:00", "signup"),
        (2, 1, "2024-01-05 10:00", "click"),       # same week -> w=0
        (3, 1, "2024-01-16 10:00", "view"),        # two weeks later -> w=2
        # user 2 signs up the next week (cohort Mon Jan 8)
        (4, 2, "2024-01-08 10:00", "signup"),
        # pre-signup activity must NOT count
        (5, 2, "2024-01-02 10:00", "view"),
        # user 3 never signs up -> excluded entirely
        (6, 3, "2024-01-03 10:00", "view"),
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        user_cohorts)

    out = user_cohorts(str(tmp_path))
    rows = {(r.cohort, r.w): r.users for r in out.itertuples()}
    assert rows == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                    ("2024-01-08", 0): 1}


def test_khop_bfs_levels(ray_session, tmp_path):
    # path graph via co-order pairs: orders {42,1},{1,2},{2,3},{3,4}
    rows = [(1, 42), (1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (4, 3), (4, 4)]
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_khop)

    out = part_khop(str(tmp_path), seed=42, k=3)
    got = dict(zip(out["hop"], out["n_nodes"]))
    # 42 -> 1 -> 2 -> 3 (4 is 4 hops away, beyond k)
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_assoc_rules_counts(ray_session, tmp_path):
    # baskets: {1,2} x3, {1,2,3} x1, {2,3} x1 -> n_orders=5
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
            (4, 1), (4, 2), (4, 3), (5, 2), (5, 3)]
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        assoc_rules)

    out = assoc_rules(str(tmp_path), top_n=10).set_index(
        ["part_a", "part_b"])
    r = out.loc[(1, 2)]
    assert r["n_pair"] == 4 and r["n_a"] == 4 and r["n_b"] == 5
    assert r["support"] == 0.8                       # 4/5
    assert r["conf_a_b"] == 1.0                      # 4/4
    assert r["conf_b_a"] == 0.8                      # 4/5
    assert r["lift"] == 1.0                          # 4*5/(4*5)
    r23 = out.loc[(2, 3)]
    assert r23["n_pair"] == 2 and r23["lift"] == 1.0  # 2*5/(5*2)
    # top-1 by n_pair is (1,2)
    assert out.reset_index().iloc[0][["part_a", "part_b"]].tolist() == [1, 2]


def test_grouped_kmv_matches_single_process(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        _h64, grouped_ndistinct, kmv_estimate)

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    out = (grouped_ndistinct(ds, "event_type", "user_id", k=16)
           .to_pandas().set_index("event_type"))
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for et, g in ev.groupby("event_type"):
        hs = sorted({_h64(str(u)) for u in g["user_id"]})[:16]
        want = round(kmv_estimate([hs], 16), 1)
        assert out.loc[et, "approx_ndistinct"] == want


def test_stream_join_window_bounds(ray_session, tmp_path):
    _write_events(tmp_path, [
        (1, 1, "2024-01-01 10:00", "click"),
        (2, 1, "2024-01-01 10:30", "click"),
        (3, 1, "2024-01-01 11:00", "purchase"),   # joins click 2 only
        (4, 1, "2024-01-01 11:00", "click"),      # NOT < purchase ts
        (5, 2, "2024-01-01 10:45", "click"),      # other user
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        click_purchase_attribution)

    df = (click_purchase_attribution(str(tmp_path), window_minutes=60)
          .to_pandas().sort_values("click_id").reset_index(drop=True))
    # clicks 1 (exactly -60m, boundary inclusive) and 2 (-30m) join
    # purchase 3; click 4 at exactly the purchase ts is excluded (strict <);
    # click 5 is another user
    assert df["click_id"].tolist() == [1, 2]
    assert df["purchase_id"].tolist() == [3, 3]
    assert df["gap_s"].tolist() == [3600.0, 1800.0]


def test_scd2_intervals(ray_session, tmp_path):
    _write_events(tmp_path, [
        (1, 1, "2024-01-01 10:00", "signup"),
        (2, 1, "2024-01-01 11:00", "click"),
        (3, 1, "2024-01-01 12:00", "purchase"),
        (9, 2, "2024-01-01 09:00", "view"),
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        scd2_user_state)

    df = (scd2_user_state(str(tmp_path)).to_pandas()
          .sort_values(["user_id", "valid_from"]).reset_index(drop=True))
    u1 = df[df["user_id"] == 1]
    assert u1["state"].tolist() == ["signup", "click", "purchase"]
    # each interval closes at the next one's open; last is open-ended
    assert u1["valid_to"].tolist()[:2] == u1["valid_from"].tolist()[1:]
    assert u1["is_current"].tolist() == [False, False, True]
    assert df[df["user_id"] == 2]["is_current"].tolist() == [True]


def test_transitions_counts_and_probs(ray_session, tmp_path):
    _write_events(tmp_path, [
        (1, 1, "2024-01-01 10:00", "view"),
        (2, 1, "2024-01-01 11:00", "click"),
        (3, 1, "2024-01-01 12:00", "view"),
        (4, 1, "2024-01-01 13:00", "click"),
        (5, 2, "2024-01-01 10:00", "view"),
        (6, 2, "2024-01-01 11:00", "purchase"),
        (7, 3, "2024-01-01 10:00", "error"),   # singleton: no transitions
    ])
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        event_transitions)

    df = event_transitions(str(tmp_path)).set_index(["state", "next_state"])
    assert df.loc[("view", "click"), "n"] == 2
    assert df.loc[("view", "purchase"), "n"] == 1
    assert df.loc[("click", "view"), "n"] == 1
    # P(click | view) = 2/3
    assert df.loc[("view", "click"), "p"] == round(2 / 3, 6)
    # singleton chains contribute nothing
    assert len(df) == 3


def test_part_kcore_converged_and_independent_recompute(ray_session):
    """k-core (round 4): the default round budget reaches the true
    fixpoint at sf0.001 (one extra round changes nothing), every survivor
    meets the degree bound, and the whole table equals an independent
    pandas peel-to-fixpoint recompute."""
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_kcore)

    got = part_kcore(SF)                       # k=68, n_rounds=8
    more = part_kcore(SF, k=68, n_rounds=9)
    assert got.equals(more)                    # converged inside budget
    assert len(got) > 0
    assert (got["degree"] >= 68).all()

    # independent recompute: pandas peel loop to fixpoint
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pe = li.drop_duplicates()
    e = pe.merge(pe, on="l_orderkey")
    e = e[e["l_partkey_x"] != e["l_partkey_y"]][
        ["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    e.columns = ["u", "v"]
    while True:
        deg = e.groupby("u").size()
        surv = set(deg[deg >= 68].index)
        e2 = e[e["u"].isin(surv) & e["v"].isin(surv)]
        if len(e2) == len(e):
            break
        e = e2
    want = (e.groupby("u").size().rename("degree").reset_index()
            .rename(columns={"u": "part"})
            .sort_values("part").reset_index(drop=True))
    assert got["part"].tolist() == want["part"].tolist()
    assert got["degree"].tolist() == want["degree"].tolist()


def test_part_assortativity_matches_numpy_corrcoef(ray_session):
    """Assortativity (round 4): the distributed integer-moment fold equals
    a dense numpy Pearson correlation over the recomputed edge list."""
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        part_assortativity)

    got = part_assortativity(SF)
    assert len(got) == 1

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pe = li.drop_duplicates()
    e = pe.merge(pe, on="l_orderkey")
    e = e[e["l_partkey_x"] != e["l_partkey_y"]][
        ["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    deg = e.groupby("l_partkey_x").size()
    x = e["l_partkey_x"].map(deg).to_numpy(np.float64)
    y = e["l_partkey_y"].map(deg).to_numpy(np.float64)
    r = np.corrcoef(x, y)[0, 1]
    assert got["n_edges"][0] == len(e)
    assert abs(got["assortativity"][0] - r) < 1e-6
    # a dense co-purchase graph disassortates (hubs touch the periphery)
    assert got["assortativity"][0] < 0
