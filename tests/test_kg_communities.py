"""Label-propagation communities over the KG (round-3 batch 7)."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_lpa_matches_unrolled_sql_replay(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import (
        kg_label_propagation_sql)
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_label_propagation)

    got = kg_label_propagation(SF, n_iter=3)
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(kg_label_propagation_sql(3)).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_lpa_labels_are_node_ids_and_converge_toward_fewer(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_label_propagation)

    one = kg_label_propagation(SF, n_iter=1)
    three = kg_label_propagation(SF, n_iter=3)
    nodes = set(one["node_id"])
    assert set(one["community"]) <= nodes
    assert set(three["community"]) <= nodes
    # propagation never increases the number of distinct communities
    assert three["community"].nunique() <= one["community"].nunique()


def test_graph_join_partitions_track_cluster_cpus(ray_session):
    """VERDICT r3 #2: iterative-graph joins must size their shuffle to the
    cluster, not a hardcoded constant."""
    import ray

    from amharic_ecommerce_data_extractor_ray.stages.joins import (
        auto_partitions)

    cpus = int(ray.cluster_resources()["CPU"])
    assert auto_partitions(None) == max(2, min(16, cpus))
    # explicit request always wins (real-cluster escape hatch)
    assert auto_partitions(48) == 48
    # cap prevents aggregator actors outnumbering CPUs on big boxes
    assert auto_partitions(None, cap=2) == 2


def test_random_walks_follow_edges(ray_session):
    """Every consecutive step of every walk must traverse a real
    (symmetrized) KG edge, every walk has walk_len+1 rows, and step 0 is
    the start node encoded in the walk_id."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_edges, kg_random_walks)

    out = kg_random_walks(SF, walks_per_node=2, walk_len=3)
    edges = kg_edges(SF).to_pandas()
    sym = set(zip(edges["src_id"], edges["dst_id"])) \
        | set(zip(edges["dst_id"], edges["src_id"]))
    assert (out.groupby("walk_id")["step"].count() == 4).all()
    for wid, g in out.groupby("walk_id"):
        g = g.sort_values("step")
        assert g["node_id"].iloc[0] == wid.split("#")[0]
        trail = g["node_id"].tolist()
        for a, b in zip(trail, trail[1:]):
            assert (a, b) in sym


def test_skipgram_pairs_are_symmetric_and_window_bounded(ray_session):
    """(a, b) and (b, a) appear with equal counts (|i-j| is symmetric) and
    every pair is an endpoint pair of some walk within the window."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_walk_skipgrams)

    out = kg_walk_skipgrams(SF, walks_per_node=1, walk_len=3, window=2)
    counts = {(r["center"], r["context"]): r["n_pairs"]
              for _, r in out.iterrows()}
    assert len(counts) > 0
    for (a, b), n in counts.items():
        assert counts[(b, a)] == n


def test_kg_components_match_union_find(ray_session):
    """kg_components (round 4): the distributed BSP labels equal a dense
    union-find over the recomputed co-mention pair list, including
    singleton mentions."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_components, kg_cooccurrence, triples_materialized)

    got = kg_components(SF)
    t = triples_materialized(SF).to_pandas()
    nodes = sorted(set(t["pred"] + ":" + t["obj_norm"]))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    c = kg_cooccurrence(SF).to_pandas()
    for ka, kb in zip(c["pred_a"] + ":" + c["obj_a"],
                      c["pred_b"] + ":" + c["obj_b"]):
        ra, rb = find(ka), find(kb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in nodes}
    import collections
    sizes = collections.Counter(comp.values())
    assert got["node"].tolist() == nodes
    # same partition structure: members of one true component share one
    # engine cluster_id and vice versa
    eng = dict(zip(got["node"], got["cluster_id"]))
    rep_map = {}
    for n in nodes:
        r = comp[n]
        assert rep_map.setdefault(r, eng[n]) == eng[n]
    assert len(set(rep_map.values())) == len(rep_map)
    want_sizes = {n: sizes[comp[n]] for n in nodes}
    assert [want_sizes[n] for n in nodes] == got["cluster_size"].tolist()
    # the giant co-mention component exists (the graph isn't all singletons)
    assert got["cluster_size"].max() >= 10


def test_kg_wl_colors_match_dense_recompute(ray_session):
    """WL refinement (round 4): engine colors equal a dense Python 1-WL
    replay, and refinement is monotone (distinct colors never decrease
    round over round)."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_edges, kg_wl_colors)
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        _stable_u64)

    got = kg_wl_colors(SF, n_rounds=3)
    e = kg_edges(SF).to_pandas()
    adj = {}
    for s, d in zip(e["src_id"], e["dst_id"]):
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    lab = {u: len(vs) for u, vs in adj.items()}
    distinct = [len(set(lab.values()))]
    for _ in range(3):
        lab = {u: _stable_u64(
            f"{lab[u]}|{','.join(str(x) for x in sorted(lab[v] for v in vs))}"
        ) >> 1 for u, vs in adj.items()}
        distinct.append(len(set(lab.values())))
    assert got["node_id"].tolist() == sorted(adj)
    assert got["wl_color"].tolist() == [lab[u] for u in sorted(adj)]
    assert all(a <= b for a, b in zip(distinct, distinct[1:]))


def test_kg_butterflies_match_dense_recompute(ray_session):
    """Butterflies (round 4): engine counts equal a dense itertools
    recompute over the recomputed vendor→entity incidence."""
    import itertools

    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_butterflies, kg_edges)

    got = kg_butterflies(SF)
    e = kg_edges(SF).to_pandas()
    nbr = e.groupby("subj")["dst_id"].agg(set)
    bf = {}
    for a, b in itertools.combinations(sorted(nbr.index), 2):
        c = len(nbr[a] & nbr[b])
        if c >= 2:
            k = c * (c - 1) // 2
            bf[a] = bf.get(a, 0) + k
            bf[b] = bf.get(b, 0) + k
    assert got["vendor"].tolist() == sorted(bf)
    assert got["n_butterflies"].tolist() == [bf[v] for v in sorted(bf)]
    assert got["n_butterflies"].min() > 0


def test_kg_alias_edges_conserve_weight(ray_session):
    """Alias canonicalization (round 4): total mention mass is conserved,
    the edge table shrinks (aliases really collapse), and canonical keys
    are themselves mention keys."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_alias_edges, kg_edges)

    got = kg_alias_edges(SF)
    e = kg_edges(SF).to_pandas()
    assert got["weight"].sum() == e["weight"].sum()
    assert len(got) < len(e)
    keys = set(e["pred"] + ":" + e["obj_norm"])
    assert set(got["node_canon"]) <= keys
    # per-vendor mass conserved too (collapse never crosses vendors)
    lhs = got.groupby("subj")["weight"].sum().sort_index()
    rhs = e.groupby("subj")["weight"].sum().sort_index()
    assert (lhs == rhs).all()


def test_kg_edge_span_consistent_with_edges(ray_session):
    """Edge provenance (round 4): spans cover exactly the edge table,
    n_mentions equals the edge weights, and first_seen <= last_seen."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_edge_span, kg_edges)

    got = kg_edge_span(SF)
    e = (kg_edges(SF).to_pandas()
         .sort_values(["subj", "pred", "obj_norm"]).reset_index(drop=True))
    assert len(got) == len(e)
    assert (got["subj"] == e["subj"]).all()
    assert (got["n_mentions"].to_numpy() == e["weight"].to_numpy()).all()
    assert (got["first_seen"] <= got["last_seen"]).all()
    # edges mentioned more than once genuinely span time on this corpus
    multi = got[got["n_mentions"] > 1]
    assert (multi["first_seen"] < multi["last_seen"]).any()


def test_kg_closeness_matches_dense_bfs(ray_session):
    """Closeness (round 4): engine scores equal a dense Python BFS from
    the same md5-sampled seed set."""
    import collections

    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_closeness, kg_cooccurrence)
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        _stable_u64)

    got = kg_closeness(SF, max_hops=4, seed_mod=3)
    c = kg_cooccurrence(SF).to_pandas()
    adj = collections.defaultdict(set)
    for ka, kb in zip(c["pred_a"] + ":" + c["obj_a"],
                      c["pred_b"] + ":" + c["obj_b"]):
        adj[ka].add(kb)
        adj[kb].add(ka)
    seeds = [u for u in adj if _stable_u64(u) % 3 == 0]
    score = collections.defaultdict(int)
    reached = collections.defaultdict(int)
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            if d > 0:
                score[v] += 12 // d
                reached[v] += 1
    import numpy as np
    want = sorted(score)
    assert got["node"].tolist() == want
    assert got["n_reached"].tolist() == [reached[v] for v in want]
    exp = [float(np.floor(score[v] / 12.0 * 1e6 + 0.5) / 1e6)
           for v in want]
    assert got["closeness"].tolist() == exp


def test_kg_negative_samples_properties(ray_session):
    """Negative sampling (round 4): no emitted candidate is a positive
    edge, draws are the deterministic md5 indices, and the string-key
    ANTI join (new in this round) filters exactly."""
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_edges, kg_negative_samples)
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        _stable_u64)

    got = kg_negative_samples(SF, k=2)
    e = kg_edges(SF).to_pandas()
    e["ent"] = e["pred"] + ":" + e["obj_norm"]
    positives = set(zip(e["subj"], e["ent"]))
    assert not (set(zip(got["subj"], got["ent_neg"])) & positives)

    ents = sorted(set(e["ent"]))
    n = len(ents)
    expected = []
    for s, ent in sorted(zip(e["subj"], e["ent"])):
        for i in (1, 2):
            neg = ents[_stable_u64(f"{s}|{ent}|{i}") % n]
            if (s, neg) not in positives:
                expected.append((s, ent, i, neg))
    expected.sort()
    assert list(map(tuple, got[["subj", "ent_pos", "sample_idx",
                                "ent_neg"]].itertuples(index=False))) \
        == expected
    # some collisions with positives were genuinely dropped
    assert len(got) < 2 * len(e)


def test_kg_truss_fixpoint_and_dense_recompute(ray_session):
    """k-truss (round 4): the default round budget reaches the fixpoint
    (an extra round changes nothing), every surviving edge meets the
    support bound, and the table equals a dense Python peel."""
    import itertools

    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_cooccurrence, kg_truss)

    got = kg_truss(SF, k=6, n_rounds=5)
    more = kg_truss(SF, k=6, n_rounds=6)
    assert got.equals(more)
    assert len(got) > 0
    assert (got["support"] >= 4).all()

    c = kg_cooccurrence(SF).to_pandas()
    edges = set(zip(c["pred_a"] + ":" + c["obj_a"],
                    c["pred_b"] + ":" + c["obj_b"]))
    while True:
        nbr = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        sup = {e: len(nbr[e[0]] & nbr[e[1]]) for e in edges}
        keep = {e for e, s in sup.items() if s >= 4}
        if keep == edges:
            break
        edges = keep
    want = sorted(edges)
    assert list(zip(got["node_a"], got["node_b"])) == want
    assert got["support"].tolist() == [sup[e] for e in want]
