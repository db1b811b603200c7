"""Round-3 batch 3: inverted index and PMI collocation mining."""

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_inverted_index_semantics(ray_session, tmp_path):
    _write_docs(tmp_path, ["a b a", "b c", "a", ""])
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        inverted_index)

    docs = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = (inverted_index(docs, max_postings=2).to_pandas()
           .sort_values("token").reset_index(drop=True))
    # 'a' appears in docs 0 and 2 (repeat inside doc 0 counted once)
    assert out.values.tolist() == [
        ["a", 2, "0,2"], ["b", 2, "0,1"], ["c", 1, "1"]]


def test_inverted_index_caps_postings(ray_session, tmp_path):
    _write_docs(tmp_path, ["x"] * 30)
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        inverted_index)

    docs = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = inverted_index(docs, max_postings=5).to_pandas()
    assert out["df"].iloc[0] == 30                    # df is exact
    assert out["postings"].iloc[0] == "0,1,2,3,4"     # list is capped


def test_token_pmi_matches_direct_computation(ray_session, tmp_path):
    # 'a b' co-occur in every doc; 'a c' in half; 'b c' in half
    _write_docs(tmp_path, ["a b c", "a b", "a b c", "a b"])
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        token_pmi)

    docs = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = token_pmi(docs, min_support=1, k=10)
    got = {(r.token_a, r.token_b): (r.n_ab, r.pmi)
           for r in out.itertuples()}
    # pmi(a,b) = ln(4*4/(4*4)) = 0 ; pmi(a,c) = ln(2*4/(4*2)) = 0
    # pmi(b,c) = ln(2*4/(4*2)) = 0
    assert got[("a", "b")] == (4, 0.0)
    assert got[("a", "c")] == (2, 0.0)
    # skewed corpus: c rarer alone than with b
    _write_docs(tmp_path, ["b c", "b c", "a", "a b"])
    docs = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = token_pmi(docs, min_support=1, k=10)
    row = out[(out.token_a == "b") & (out.token_b == "c")].iloc[0]
    assert row["n_ab"] == 2
    assert abs(row["pmi"] - round(math.log(2 * 4 / (3 * 2)), 6)) < 1e-9


def test_entropy_uniform_vs_degenerate(ray_session):
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.stages.textstats import (
        entropy_batch)

    b = pa.table({"text": pa.array(["a b c d", "x x x x", "y"], pa.string())})
    out = entropy_batch(b)
    ents = out["token_entropy"].to_pylist()
    assert abs(ents[0] - round(math.log(4), 6)) < 1e-9   # uniform: ln 4
    assert ents[1] == 0.0                                # degenerate
    assert ents[2] == 0.0                                # single token
    assert out["n_tokens"].to_pylist() == [4, 4, 1]


def test_link_prediction_guard_and_jaccard(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import (
        kg_link_prediction)

    out = kg_link_prediction("/root/testdata/sf0.001", min_common=1, k=500)
    # jaccard in (0, 1], deterministic ordering
    assert (out["jaccard"] > 0).all() and (out["jaccard"] <= 1).all()
    assert (out["vendor_a"] < out["vendor_b"]).all()
    js = out["jaccard"].to_numpy()
    assert (js[:-1] >= js[1:]).all()


def test_weighted_sample_bias_and_determinism(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    n = 2000
    # half the keys carry 50x the weight -> they should dominate the sample
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_totalprice": np.where(np.arange(n) % 2 == 0, 500.0, 10.0),
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")
    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        weighted_sample)

    ds = rd.read_parquet(str(tmp_path / "orders.parquet"))
    out1 = weighted_sample(ds, key_col="o_orderkey",
                           weight_col="o_totalprice", k=100)
    out2 = weighted_sample(ds, key_col="o_orderkey",
                           weight_col="o_totalprice", k=100)
    assert out1.equals(out2)                       # deterministic
    heavy = (out1["o_orderkey"] % 2 == 0).mean()
    assert heavy > 0.8                             # weight bias visible
    assert out1["wkey"].is_monotonic_decreasing


def test_label_affinity_self_consistency(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        label_affinity)

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["label", "embedding"])
    out = label_affinity(ds)
    assert len(out) == 45                          # C(10, 2) pairs
    assert (out["cosine"].abs() <= 1.0 + 1e-9).all()
    assert (out["label_a"] < out["label_b"]).all()


def test_top_domains_extraction(ray_session):
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.stages.textstats import (
        top_domains_batch)

    b = pa.table({
        "repo": pa.array(["v1", "v1", "v2"], pa.string()),
        "content": pa.array([
            "see https://t.me/shop and www.example.com now",
            "https://t.me/shop again",
            "http://foo.bar/x path ignored",
        ], pa.string()),
    })
    out = top_domains_batch(b).to_pylist()
    got = {(r["repo"], r["domain"]): r["n"] for r in out}
    assert got == {("v1", "t.me"): 2, ("v1", "www.example.com"): 1,
                   ("v2", "foo.bar"): 1}


def test_quantize_embeddings_roundtrip(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        quantize_embeddings)

    vecs = [[3.0, 4.0], [-1.0, 1.0]]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    out = quantize_embeddings(ds).to_pandas().sort_values(
        ["vec_id", "dim"]).reset_index(drop=True)
    # [3,4]/5*127 = [76.2, 101.6] -> [76, 102]; [-1,1]/sqrt2*127 -> ±90
    assert out["code"].tolist() == [76, 102, -90, 90]


def test_bigram_lm_smoothing(ray_session, tmp_path):
    _write_docs(tmp_path, ["a b", "a b", "a c"])
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        bigram_lm)

    docs = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = bigram_lm(docs, k_smooth=1.0, topn=10)
    got = {(r.tok_a, r.tok_b): (r.n, r.prob) for r in out.itertuples()}
    # V = 3 (a, b, c); c(a.) = 3
    assert got[("a", "b")] == (2, round((2 + 1) / (3 + 3), 6))
    assert got[("a", "c")] == (1, round((1 + 1) / (3 + 3), 6))
