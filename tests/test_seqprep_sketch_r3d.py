"""Round-3 additions: HyperLogLog distinct sketch, count-min frequency
sketch, token-window chunking, and corpus-LM perplexity scoring."""

import numpy as np


def test_hll_error_bound_and_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        approx_ndistinct_hll)

    n_distinct = 20000
    rows = [{"v": f"val_{i % n_distinct}"} for i in range(60000)]
    est1 = approx_ndistinct_hll(
        rd.from_items(rows), "v", p=12).to_pandas()["approx_ndistinct"][0]
    # p=12 → expected relative error ≈ 1.04/sqrt(4096) ≈ 1.6%; assert 8%
    assert abs(est1 - n_distinct) / n_distinct < 0.08, est1
    # register-max merge ⇒ estimate invariant to block layout
    est32 = approx_ndistinct_hll(
        rd.from_items(rows).repartition(32), "v",
        p=12).to_pandas()["approx_ndistinct"][0]
    assert est1 == est32


def test_hll_small_range_linear_counting(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        approx_ndistinct_hll)

    rows = [{"v": f"x{i % 50}"} for i in range(2000)]
    est = approx_ndistinct_hll(
        rd.from_items(rows), "v", p=12).to_pandas()["approx_ndistinct"][0]
    # linear-counting regime: tiny cardinalities are near-exact
    assert abs(est - 50) <= 2, est


def test_countmin_upper_bound_and_heavy_hitter(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import countmin_topk

    # 200 docs; token "hot" appears 3× per doc, tail tokens once each
    rows = [{"text": f"hot hot hot tail_{i} tail_{(i * 7) % 151}"}
            for i in range(200)]
    out = countmin_topk(rd.from_items(rows).repartition(8),
                        text_col="text", k=5, depth=4,
                        width=2048).to_pandas()
    assert out.iloc[0]["token"] == "hot"
    # count-min never underestimates
    assert out.iloc[0]["n_est"] >= 600
    # with 2048-wide rows and ~150 tail tokens, the top estimate is exact
    assert out.iloc[0]["n_est"] == 600


def test_chunking_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import token_chunks

    docs = [
        {"doc_id": 1, "text": "a b c d e f g"},   # 7 tokens
        {"doc_id": 2, "text": "  "},              # empty → no chunks
        {"doc_id": 3, "text": "x y z"},           # 3 tokens → 1 chunk
    ]
    out = token_chunks(rd.from_items(docs), window=4,
                       stride=3).to_pandas()
    got = out.to_dict("records")
    assert got == [
        {"doc_id": 1, "chunk_id": 0, "start": 0, "n_tokens": 4,
         "chunk_text": "a b c d"},
        {"doc_id": 1, "chunk_id": 1, "start": 3, "n_tokens": 4,
         "chunk_text": "d e f g"},
        {"doc_id": 1, "chunk_id": 2, "start": 6, "n_tokens": 1,
         "chunk_text": "g"},
        {"doc_id": 3, "chunk_id": 0, "start": 0, "n_tokens": 3,
         "chunk_text": "x y z"},
    ]


def test_chunking_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import token_chunks

    docs = [{"doc_id": i, "text": " ".join(f"t{j}" for j in range(i % 9))}
            for i in range(60)]
    a = token_chunks(rd.from_items(docs), window=3, stride=2).to_pandas()
    b = token_chunks(rd.from_items(docs).repartition(16), window=3,
                     stride=2).to_pandas()
    assert a.equals(b)


def test_perplexity_formula_and_ordering(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        doc_perplexity)

    # corpus: "common" appears 12×, "rare" once → the rare-token doc is
    # higher-perplexity under the corpus LM
    docs = ([{"doc_id": i, "text": "common common common"}
             for i in range(4)]
            + [{"doc_id": 99, "text": "rare common"}])
    out = doc_perplexity(rd.from_items(docs), k_smooth=1.0).to_pandas()
    assert out["doc_id"].tolist() == [0, 1, 2, 3, 99]
    # hand-computed: N=14 tokens, V=2; p(common)=(13+1)/(14+2)=0.875,
    # p(rare)=(1+1)/16=0.125
    ppl_common = round(float(np.exp(-np.log(0.875))), 6)
    ppl_mixed = round(float(
        np.exp(-(np.log(0.125) + np.log(0.875)) / 2)), 6)
    assert out.set_index("doc_id").loc[0, "ppl"] == ppl_common
    assert out.set_index("doc_id").loc[99, "ppl"] == ppl_mixed
    assert ppl_mixed > ppl_common
    assert out.set_index("doc_id").loc[99, "n_tokens"] == 2


def test_perplexity_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        doc_perplexity)

    docs = [{"doc_id": i,
             "text": " ".join(f"w{(i * j) % 23}" for j in range(1, 8))}
            for i in range(80)]
    a = doc_perplexity(rd.from_items(docs)).to_pandas()
    b = doc_perplexity(rd.from_items(docs).repartition(16)).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert np.allclose(a["ppl"], b["ppl"], rtol=0, atol=1e-6)


def test_hash_lookup_join_inner_semantics(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import hash_lookup_join

    left = rd.from_items([{"k": f"key{i % 5}", "x": i} for i in range(20)])
    right = rd.from_items([{"k": "key0", "v": 100}, {"k": "key1", "v": 101},
                           {"k": "key1", "v": 201},  # multiplicity → 2 rows
                           {"k": "zzz", "v": 999}])  # unmatched → dropped
    out = (hash_lookup_join(left, right, on="k", num_partitions=4)
           .to_pandas().sort_values(["k", "x", "v"]).reset_index(drop=True))
    # key0: 4 left rows × 1; key1: 4 × 2; keys 2-4 unmatched; zzz dropped
    assert len(out) == 4 + 8
    assert set(out.columns) == {"k", "x", "v"}
    assert (out[out.k == "key1"].groupby("x").size() == 2).all()


def test_hash_lookup_join_int_keys_block_invariant(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.joins import hash_lookup_join

    left = rd.from_items([{"k": i % 7, "x": i} for i in range(50)])
    right = rd.from_items([{"k": i, "v": i * 10} for i in range(7)])
    a = (hash_lookup_join(left, right, on="k", num_partitions=3)
         .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    b = (hash_lookup_join(left.repartition(13), right.repartition(5),
                          on="k", num_partitions=8)
         .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a["v"] == a["k"] * 10).all()
