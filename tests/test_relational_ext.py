"""Round-3 operator family: lag/lead windows, range join, rollup, and the
KG graph-analytics queries (degrees, co-occurrence)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lag_lead_semantics(ray_session, tmp_path):
    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:05",
        "2024-01-01 11:00",   # user 2's only event
    ])
    tbl = pa.table({
        "event_id": pa.array([2, 1, 3, 9], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([10.0, 20.0, 30.0, 5.0]),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        lag_lead_events)

    out = (lag_lead_events(str(tmp_path)).to_pandas()
           .set_index("event_id"))
    # user 1 order by (ts, event_id): 1 (10:05? no - 10:00 is event 2)...
    # actual order: event 2 @10:00, event 1 @10:05, event 3 @10:05 (tie →
    # event_id breaks it), so prev(1)=value(2)=10, prev(3)=value(1)=20
    assert pd.isna(out.loc[2, "prev_value"])
    assert out.loc[2, "next_value"] == 20.0
    assert out.loc[1, "prev_value"] == 10.0
    assert out.loc[1, "gap_s"] == 300.0
    assert out.loc[3, "prev_value"] == 20.0
    assert out.loc[3, "gap_s"] == 0.0          # tie on ts
    assert pd.isna(out.loc[3, "next_value"])
    assert pd.isna(out.loc[9, "prev_value"]) and pd.isna(out.loc[9, "next_value"])


def test_range_join_partitions_table(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        PRICE_BANDS, price_band_join)

    out = price_band_join(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_extendedprice"]).to_pandas()
    # bands partition the rows: counts sum to the table
    assert int(out["n_items"].sum()) == len(li)
    # each band's exact cents sum matches a direct recompute
    lows = np.array([b[1] for b in PRICE_BANDS])
    idx = np.searchsorted(lows, li["l_extendedprice"].to_numpy(),
                          side="right") - 1
    cents = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    for i, (name, _, _) in enumerate(PRICE_BANDS):
        row = out[out["band"] == name]
        want = int(cents[idx == i].sum())
        if row.empty:
            assert want == 0
        else:
            assert float(row["sum_price"].iloc[0]) == want / 100.0


def test_rollup_levels_are_algebraically_consistent(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        orders_rollup)

    out = orders_rollup(SF)
    fine = out[out["o_orderpriority"].notna()]
    by_status = out[out["o_orderstatus"].notna()
                    & out["o_orderpriority"].isna()]
    grand = out[out["o_orderstatus"].isna()]
    assert len(grand) == 1
    assert int(grand["n"].iloc[0]) == int(fine["n"].sum())
    assert float(grand["sum_price"].iloc[0]) == float(
        round(fine["sum_price"].sum(), 2))
    for _, r in by_status.iterrows():
        sub = fine[fine["o_orderstatus"] == r["o_orderstatus"]]
        assert int(r["n"]) == int(sub["n"].sum())


def test_kg_degrees_conserves_edges(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    deg = kg.kg_degrees(SF).to_pandas()
    n_edges = kg.kg_edges(SF).count()
    v = deg[deg["node_type"] == "vendor"]
    e = deg[deg["node_type"] == "entity"]
    # every edge contributes exactly one endpoint to each side
    assert int(v["degree"].sum()) == n_edges
    assert int(e["degree"].sum()) == n_edges
    assert int(v["total_weight"].sum()) == int(e["total_weight"].sum())
    assert deg["node_id"].is_unique  # bipartite: no node on both sides


def test_kg_cooccurrence_matches_bruteforce(ray_session):
    """Independent recompute: pairs from the triples table, pandas-only."""
    from itertools import combinations

    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    got = (kg.kg_cooccurrence(SF).to_pandas()
           .sort_values(["pred_a", "obj_a", "pred_b", "obj_b"])
           .reset_index(drop=True))
    tri = kg.triples_ds(SF).to_pandas()
    counts: dict[tuple, int] = {}
    for _, g in tri.groupby("message_id"):
        ments = sorted({(p, o) for p, o in zip(g["pred"], g["obj_norm"])},
                       key=lambda m: f"{m[0]}:{m[1]}")
        for a, b in combinations(ments, 2):
            counts[a + b] = counts.get(a + b, 0) + 1
    want = (pd.DataFrame(
        [k + (n,) for k, n in counts.items()],
        columns=["pred_a", "obj_a", "pred_b", "obj_b", "n_messages"])
        .sort_values(["pred_a", "obj_a", "pred_b", "obj_b"])
        .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_messages": "int64"}), want)


def test_kg_pagerank_matches_numpy_power_iteration(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    got = (kg.kg_pagerank(SF).to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    # mass conservation: no dangling nodes after symmetrization → sum == 1
    assert abs(got["pagerank"].sum() - 1.0) < 1e-3
    assert (got["pagerank"] > 0).all()

    # independent dense recompute
    e = kg.kg_edges(SF).to_pandas()
    nodes = sorted(set(e["src_id"]) | set(e["dst_id"]))
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in zip(e["src_id"], e["dst_id"], e["weight"]):
        W[ix[s], ix[d]] += w
        W[ix[d], ix[s]] += w
    share = W / W.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        r = (1 - 0.85) / n + 0.85 * (share.T @ r)
    want = pd.DataFrame({"node_id": nodes, "pagerank": np.round(r, 6)}) \
        .sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_distinct_set_op_matches_python_sets(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        distinct_set_op)

    left = [{"k": i % 50} for i in range(500)]           # keys 0..49, dups
    right = [{"k": i % 30 + 20} for i in range(300)]     # keys 20..49
    lds = rd.from_items(left, override_num_blocks=7)
    rds = rd.from_items(right, override_num_blocks=5)
    inter = sorted(distinct_set_op(lds, rds, ["k"], "intersect")
                   .to_pandas()["k"])
    exc = sorted(distinct_set_op(lds, rds, ["k"], "except")
                 .to_pandas()["k"])
    lk, rk = {r["k"] for r in left}, {r["k"] for r in right}
    assert inter == sorted(lk & rk)
    assert exc == sorted(lk - rk)


def test_kg_hits_matches_numpy_power_iteration(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    got = kg.kg_hits(SF, n_iter=3).to_pandas()
    hubs = (got[got["kind"] == "hub"].set_index("node_id")["score"]
            .sort_index())
    auths = (got[got["kind"] == "authority"].set_index("node_id")["score"]
             .sort_index())
    # L1-normalized halves (up to the 6-decimal rounding)
    assert abs(hubs.sum() - 1.0) < 1e-3
    assert abs(auths.sum() - 1.0) < 1e-3

    # independent dense recompute on the DIRECTED weighted edge list
    e = kg.kg_edges(SF).to_pandas()
    us = sorted(set(e["src_id"]))
    vs = sorted(set(e["dst_id"]))
    ui = {n: i for i, n in enumerate(us)}
    vi = {n: i for i, n in enumerate(vs)}
    W = np.zeros((len(us), len(vs)))
    for s, d, w in zip(e["src_id"], e["dst_id"], e["weight"]):
        W[ui[s], vi[d]] += w
    h = np.full(len(us), 1.0 / len(us))
    for _ in range(3):
        a = W.T @ h
        a /= a.sum()
        h = W @ a
        h /= h.sum()
    want_h = pd.Series(np.round(h, 6), index=us).sort_index()
    want_a = pd.Series(np.round(a, 6), index=vs).sort_index()
    assert np.allclose(hubs.values, want_h.values, atol=2e-6)
    assert np.allclose(auths.values, want_a.values, atol=2e-6)
    assert list(hubs.index) == us and list(auths.index) == vs


def test_kg_ppr_matches_numpy_walk(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.canonicalize import (
        node_id)

    got = (kg.kg_ppr(SF, seed_vendor="vendor_000").to_pandas()
           .set_index("node_id")["ppr"])
    seed = node_id("vendor", "vendor_000")

    e = kg.kg_edges(SF).to_pandas()
    nodes = sorted(set(e["src_id"]) | set(e["dst_id"]))
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in zip(e["src_id"], e["dst_id"], e["weight"]):
        W[ix[s], ix[d]] += w
        W[ix[d], ix[s]] += w
    share = W / W.sum(axis=1, keepdims=True)
    r = np.zeros(n)
    r[ix[seed]] = 1.0
    tele = np.zeros(n)
    tele[ix[seed]] = 0.15
    for _ in range(5):
        r = tele + 0.85 * (share.T @ r)
    want = pd.Series(np.round(r, 6), index=nodes)
    want = want[want > 0]
    got = got.sort_index()
    want = want.sort_index()
    assert list(got.index) == list(want.index)
    assert np.allclose(got.values, want.values, atol=2e-6)
    # seed retains the largest mass after 5 steps on this bipartite graph
    assert got.idxmax() == seed


def test_kg_edge_churn_consistency(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    churn = kg.kg_edge_churn(SF, split_date="2024-07-01").to_pandas()
    full = kg.kg_edges(SF).to_pandas()
    # every churn edge exists in the full build, and early+late == full
    # weight (the halves partition the corpus)
    j = churn.merge(full[["src_id", "dst_id", "weight"]],
                    on=["src_id", "dst_id"], how="outer", indicator=True)
    assert (j["_merge"] == "both").all()
    assert (j["w_early"] + j["w_late"] == j["weight"]).all()
    # status classes are consistent with the weights
    for _, r in churn.iterrows():
        if r["status"] == "added":
            assert r["w_early"] == 0 and r["w_late"] > 0
        elif r["status"] == "removed":
            assert r["w_late"] == 0 and r["w_early"] > 0
        else:
            assert r["w_early"] > 0 and r["w_late"] > 0
    assert set(churn["status"]) == {"added", "removed", "retained"}


def test_graph_ops_big_packed_ids_exact(ray_session, tmp_path):
    """Regression (VERDICT r4 #2 class): part ids above 2**21 pack into
    lo<<32|hi edge keys above 2**53 — the old pandas attach/expand groups
    coerced the null-padded int64 key column to float64 and corrupted them
    (reachable at ~sf10 where partkeys pass 2 million).  The triangle
    count, k-hop frontier and association rules must all stay exact."""
    P = 3_000_000                          # (P << 32) | x ≈ 1.29e16 > 2**53
    tbl = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([P, P + 1, P + 2, P, P + 3], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")

    from amharic_ecommerce_data_extractor_ray.pipelines.relational import (
        assoc_rules, part_khop, part_triangles)

    tri = part_triangles(str(tmp_path))
    assert int(tri["triangles"].iloc[0]) == 1   # {P, P+1, P+2}

    kh = part_khop(str(tmp_path), seed=P, k=2).set_index("hop")
    assert int(kh.loc[0, "n_nodes"]) == 1       # the seed
    assert int(kh.loc[1, "n_nodes"]) == 3       # P+1, P+2, P+3
    assert len(kh) == 2                         # nothing new at hop 2

    ar = assoc_rules(str(tmp_path))
    pairs = set(zip(ar["part_a"].astype("int64"),
                    ar["part_b"].astype("int64")))
    # exact unpacked endpoints — float64 round-off would shift these by ±1
    assert pairs == {(P, P + 1), (P, P + 2), (P + 1, P + 2), (P, P + 3)}
    both = ar.set_index(["part_a", "part_b"])
    assert int(both.loc[(P, P + 3), "n_a"]) == 2      # P appears in 2 orders
    assert int(both.loc[(P, P + 3), "n_b"]) == 1
