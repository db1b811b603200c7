"""Dedup operators on constructed corpora with known duplicates."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    other = "completely different words about spark ray data engines at scale"
    rows = [
        {"doc_id": 0, "text": base, "lang": "en", "source": "s0"},
        {"doc_id": 1, "text": base, "lang": "en", "source": "s0"},   # exact dup
        {"doc_id": 2, "text": near, "lang": "en", "source": "s0"},   # near dup
        {"doc_id": 3, "text": other, "lang": "en", "source": "s0"},
        {"doc_id": 4, "text": other, "lang": "de", "source": "s1"},  # other block
    ]
    return rd.from_items(rows)


def test_exact_dedup(docs):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import exact_dedup_groups

    out = exact_dedup_groups(docs).to_pandas()
    # 3 distinct texts: base (ids 0,1), near (2), other (3,4)
    assert len(out) == 3
    assert sorted(out["keep_id"]) == [0, 2, 3]
    assert sorted(out["n_dups"]) == [1, 2, 2]


def test_minhash_finds_exact_and_near_dups(docs):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(docs, threshold=0.5).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs                      # exact dup → est 1.0
    est01 = out[(out["id_a"] == 0) & (out["id_b"] == 1)]["jaccard_est"].iloc[0]
    assert est01 == 1.0
    assert (3, 4) in pairs                      # same text, different block
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_simhash_identical_zero_hamming(docs):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import simhash_dedup

    out = simhash_dedup(docs).to_pandas()
    pairs = {(a, b): h for a, b, h in zip(out["id_a"], out["id_b"],
                                          out["hamming"])}
    assert pairs.get((0, 1)) == 0
    assert pairs.get((3, 4)) == 0


def test_ngram_jaccard_blocks(docs):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(docs, threshold=0.2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    # docs 3 and 4 share text but different (lang, source) block → not compared
    assert (3, 4) not in pairs


def test_dedup_ops_on_degenerate_inputs(ray_session):
    """Single-doc and all-empty-text corpora must not crash and must emit
    zero pairs (block-boundary / empty-signature edge cases)."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (exact_dedup_groups,
                                                 minhash_lsh_pairs,
                                                 simhash_dedup)

    single = rd.from_items([{"doc_id": 0, "text": "only one document here"}])
    assert minhash_lsh_pairs(single).count() == 0
    assert simhash_dedup(single).count() == 0
    assert exact_dedup_groups(single).count() == 1

    empties = rd.from_items([{"doc_id": i, "text": ""} for i in range(4)])
    # four empty docs are exact dups of each other: minhash sees identical
    # (all-max) signatures → all pairs; exact dedup keeps doc 0
    out = exact_dedup_groups(empties).to_pandas()
    assert len(out) == 1 and out["keep_id"].iloc[0] == 0
    mh = minhash_lsh_pairs(empties).to_pandas()
    assert len(mh) == 6 and (mh["jaccard_est"] == 1.0).all()


def test_hot_bucket_star_pairing(ray_session):
    """VERDICT r2 #2: a degenerate corpus (one doc duplicated tens of
    thousands of times → every copy in one LSH bucket) must complete with
    LINEAR output (star pairs from the lowest id), not ~n²/2 pairs."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (minhash_lsh_pairs,
                                                 simhash_dedup)

    n = 50_000
    dup = "identical spam message repeated across the entire corpus forever"
    docs = rd.range(n).map_batches(
        lambda b: {"doc_id": b["id"], "text": np.full(len(b["id"]), dup)},
        batch_format="numpy")

    mh = minhash_lsh_pairs(docs, max_bucket_rows=1000).to_pandas()
    # star: every doc pairs with rep id 0 exactly once → n-1 pairs
    assert len(mh) == n - 1
    assert (mh["id_a"] == 0).all() and (mh["jaccard_est"] == 1.0).all()
    assert set(mh["id_b"]) == set(range(1, n))

    sh = simhash_dedup(docs, max_block_rows=1000).to_pandas()
    assert len(sh) == n - 1
    assert (sh["id_a"] == 0).all() and (sh["hamming"] == 0).all()


def test_bucket_pairs_vectorized_matches_small_case(ray_session):
    """The vectorized small-bucket all-pairs path must equal the r2 scalar
    semantics on a mixed bucket (some near, some far)."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [{"doc_id": i, "text": base} for i in range(3)]
    rows.append({"doc_id": 3, "text": base.replace("gamma", "mu")})
    out = minhash_lsh_pairs(rd.from_items(rows), threshold=0.5).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert all(a < b for a, b in pairs)


def test_embedding_cosine_pairs(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import embedding_cosine_pairs

    v = [1.0, 0.0, 0.0]
    rows = [
        {"vec_id": 0, "embedding": v, "label": 0},
        {"vec_id": 1, "embedding": [2.0, 0.0, 0.0], "label": 0},  # cos 1.0
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0], "label": 0},  # orthogonal
        {"vec_id": 3, "embedding": v, "label": 1},                # other block
    ]
    out = embedding_cosine_pairs(rd.from_items(rows), threshold=0.99).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert pairs == {(0, 1)}


def test_connected_components_matches_union_find(ray_session):
    """Distributed min-label propagation vs a driver-side union-find on a
    random 400-edge graph (many components, chains, stars, self-loops)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        connected_components)

    rng = np.random.default_rng(11)
    a = rng.integers(0, 300, 400)
    off = rng.integers(0, 10, 400)  # local edges -> chains, not one blob
    pairs = pd.DataFrame({"id_a": a, "id_b": np.minimum(a + off, 299)})

    parent = list(range(300))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(pairs.id_a, pairs.id_b):
        parent[find(int(u))] = find(int(v))
    verts = sorted(set(pairs.id_a) | set(pairs.id_b))
    # canonical label = min member of the component
    comp_min = {}
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[find(v)] for v in verts}

    out = (connected_components(rd.from_pandas(pairs), num_partitions=8)
           .to_pandas())
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == expected


def test_connected_components_from_minhash_pairs(ray_session):
    """End-to-end: minhash pair list -> clusters; every pair's two ids share
    a cluster and every cluster_id is its own component minimum."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        connected_components, minhash_lsh_pairs)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs).materialize()
    out = connected_components(pairs).to_pandas()
    lab = dict(zip(out.doc_id, out.cluster_id))
    for row in pairs.take_all():
        assert lab[row["id_a"]] == lab[row["id_b"]]
    assert set(out.cluster_id) <= set(out.doc_id)
    assert all(lab[c] == c for c in set(out.cluster_id))


def test_fuzzy_within_one_matches_levenshtein():
    import duckdb

    from amharic_ecommerce_data_extractor_ray.stages.fuzzy import _within_one

    words = ["red bolt", "old bolt", "red bol", "red boltx", "red  bolt",
             "blue cap", "bluecap", "x", "", "xy", "yx", "ab", "ba"]
    con = duckdb.connect()
    for a in words:
        for b in words:
            if a == b:
                continue
            want = con.sql(
                "select levenshtein(?, ?) <= 1", params=[a, b]).fetchone()[0]
            assert _within_one(a, b) == want, (a, b)


def test_fuzzy_blocking_finds_all_pairs(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.stages.fuzzy import (
        fuzzy_form_pairs)
    import ray.data as rd

    names = ["cat", "cap", "cart", "dog", "dig", "cat", "cat"]
    pq.write_table(pa.table({"p_name": pa.array(names, pa.string())}),
                   tmp_path / "part.parquet")
    ds = rd.read_parquet(str(tmp_path / "part.parquet"))
    out = (fuzzy_form_pairs(ds, col="p_name").to_pandas()
           .sort_values(["name_a", "name_b"]).reset_index(drop=True))
    got = set(zip(out["name_a"], out["name_b"]))
    # cat-cap (sub), cat-cart (insert), dog-dig (sub); NOT cap-cart (d=2)
    assert got == {("cap", "cat"), ("cart", "cat"), ("dig", "dog")}
    r = out.set_index(["name_a", "name_b"]).loc[("cap", "cat")]
    assert r["n_a"] == 1 and r["n_b"] == 3    # counts carried through


def test_best_survivor_policy(ray_session):
    import pandas as pd
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        best_survivor_per_cluster)

    clusters = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 8],
        "cluster_id": [1, 1, 1, 7, 7],
    }))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 7, 8, 99],        # 99 is not in any cluster
        "n_chars": [10, 50, 50, 5, 4, 1000],
    }))
    out = (best_survivor_per_cluster(docs, clusters).to_pandas()
           .sort_values("cluster_id").reset_index(drop=True))
    # cluster 1: max n_chars is a tie (2 and 3 at 50) -> min id 2 wins
    assert out.iloc[0][["cluster_id", "doc_id", "n_chars",
                        "n_members"]].tolist() == [1, 2, 50, 3]
    assert out.iloc[1][["cluster_id", "doc_id", "n_chars",
                        "n_members"]].tolist() == [7, 7, 5, 2]
    assert len(out) == 2                       # unpaired docs don't appear


def test_substring_window_pairs(docs):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        substring_window_pairs)

    # window=5: base/near share "jumps over the lazy" only at 4 tokens, so
    # with window=5 the exact pair (0,1) and the cross-block exact pair (3,4)
    # survive while the near-dup (0,2) does not (its longest shared run is 8
    # tokens prefix "the quick brown fox jumps over the lazy" → DOES share
    # 5-token windows).  Verify counts precisely instead.
    out = substring_window_pairs(docs, window=5).to_pandas()
    pairs = {(a, b): n for a, b, n in
             zip(out["id_a"], out["id_b"], out["n_windows"])}
    # base is 12 tokens → 8 distinct 5-windows, all shared with id 1
    assert pairs[(0, 1)] == 8
    # near shares the 7-token prefix and the 4-token suffix overlap:
    # "the quick brown fox jumps over the lazy" (8 tokens) → 4 windows,
    # "again and again" suffix run "cat again and again" differs at 'cat'
    # → shared windows are exactly the 4 prefix ones
    assert pairs[(0, 2)] == 4
    # other-text docs pair regardless of lang/source blocks (exact substring
    # dedup is global)
    assert pairs[(3, 4)] == 10 - 5 + 1   # "other" is 10 tokens → 6 windows
    assert (0, 3) not in pairs
    # id_a is always the window-set's lowest id
    assert (out["id_a"] < out["id_b"]).all()


def test_substring_window_short_docs_drop(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        substring_window_pairs)

    ds = rd.from_items([{"doc_id": i, "text": "too short here"}
                        for i in range(3)])
    assert substring_window_pairs(ds, window=8).count() == 0


def test_dedup_histogram_mass_conservation(ray_session):
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_dedup_histogram)

    h = q_dedup_histogram("/root/testdata/sf0.001").to_pandas()
    # total docs across clusters == corpus size; cluster math consistent
    assert int(h["n_docs"].sum()) == 500
    assert (h["n_docs"] == h["n_dups"] * h["n_clusters"]).all()
    assert (h["n_dups"] >= 1).all()


def test_minhash_join_equals_cross_parity_subset_of_dedup(ray_session):
    """The cross-corpus LSH join over an even/odd split must produce
    exactly the cross-parity subset of the symmetric near-dup pair list
    (same banding → same candidates → same estimates)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        minhash_lsh_join, minhash_lsh_pairs)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])

    def parity(p):
        return lambda b: b.filter(
            pc.equal(pc.bit_wise_and(b["doc_id"], 1), p))

    left = docs.map_batches(parity(0), batch_format="pyarrow")
    right = docs.map_batches(parity(1), batch_format="pyarrow")
    got = (minhash_lsh_join(left, right).to_pandas()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))

    sym = minhash_lsh_pairs(docs).to_pandas()
    cross = sym[(sym["id_a"] % 2) != (sym["id_b"] % 2)]
    want = (pd.DataFrame({
        "left_id": np.where(cross["id_a"] % 2 == 0,
                            cross["id_a"], cross["id_b"]),
        "right_id": np.where(cross["id_a"] % 2 == 0,
                             cross["id_b"], cross["id_a"]),
        "jaccard_est": cross["jaccard_est"],
    }).sort_values(["left_id", "right_id"]).reset_index(drop=True))
    assert len(got) > 0          # the corpus does contain cross-parity dups
    assert got.equals(want)


def test_connected_components_md5_scale_ids(ray_session):
    """Regression (round 4): a PATH graph whose vertex ids exceed 2**53
    must collapse to ONE component labeled by the global min id.  The old
    per-bucket attach round-tripped the null-bearing columns through
    pandas float64, silently corrupting 63-bit md5 ids into phantom
    vertices — labels never propagated past round 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        connected_components)

    rng = np.random.default_rng(7)
    ids = rng.integers(2 ** 53, 2 ** 62, size=40, dtype=np.int64)
    ids = np.unique(ids)
    pairs = pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})  # one path
    cc = connected_components(rd.from_pandas(pairs), id_a="id_a",
                              id_b="id_b", out_id_col="nid",
                              num_partitions=8).to_pandas()
    assert len(cc) == len(ids)
    assert set(cc["nid"]) == set(ids)
    assert cc["cluster_id"].nunique() == 1
    assert int(cc["cluster_id"].iloc[0]) == int(ids.min())


def test_connected_components_big_ids_with_empty_block_lineage(ray_session,
                                                               tmp_path):
    """Regression (r5): the CC round-0 Min fold must stay exact when the
    pair list descends from a map_groups whose empty partitions leak
    schema-less pandas blocks — with 63-bit ids the unpinned fold's reduce
    float64-corrupted them (see joins.exact_fold)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        connected_components)

    B = (1 << 60) + 1
    # groups keyed so the sort leaves several group-less partitions
    pq.write_table(pa.table({
        "g": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "id_a": pa.array([B, B + 1, B + 2, B + 3, B + 9], pa.int64()),
        "id_b": pa.array([B + 1, B + 4, B + 3, B + 2, B + 9], pa.int64()),
    }), tmp_path / "pairs.parquet")

    def passthrough(g: pd.DataFrame) -> pd.DataFrame:
        return g[["id_a", "id_b"]]

    pairs = (rd.read_parquet(str(tmp_path / "pairs.parquet"))
             .groupby("g").map_groups(passthrough, batch_format="pandas"))
    out = (connected_components(pairs, num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    lab = {int(r["doc_id"]): int(r["cluster_id"]) for _, r in out.iterrows()}
    assert lab[B] == lab[B + 1] == lab[B + 4] == B
    assert lab[B + 2] == lab[B + 3] == B + 2
    assert lab[B + 9] == B + 9
