"""Round-3 batch 7: set-similarity join, quality logreg, RAG retrieval."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _docs_con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_set_similarity_join_equals_brute_force(ray_session):
    """Prefix filtering is lossless: the engine's sub-quadratic pair set
    must equal the all-pairs recompute exactly."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import (
        set_similarity_join_sql)
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        set_similarity_join)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = set_similarity_join(docs)
    want = _docs_con().execute(set_similarity_join_sql(5, 1, 2)).df()
    assert len(got) == len(want) > 0
    assert got["id_a"].tolist() == want["id_a"].tolist()
    assert got["id_b"].tolist() == want["id_b"].tolist()
    assert np.abs(got["jaccard"] - want["jaccard"]).max() < 1e-12
    # every pair genuinely meets the threshold
    assert (got["jaccard"] >= 0.5).all()


def test_set_similarity_join_block_invariance(ray_session):
    """Same pairs regardless of input block layout (combiner soundness)."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        set_similarity_join)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = set_similarity_join(docs)
    b = set_similarity_join(docs.repartition(13))
    assert a.equals(b)


def test_quality_logreg_matches_unrolled_sql(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import (
        quality_logreg_sql)
    from amharic_ecommerce_data_extractor_ray.stages.classify import (
        quality_logreg)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang", "n_chars"])
    got = quality_logreg(docs)
    want = _docs_con().execute(quality_logreg_sql("en", 0.5, 4)).df()
    for c in ("w0", "w1", "w2", "accuracy"):
        assert abs(got[c][0] - want[c][0]) < 1e-9, c
    assert got["n_docs"][0] == want["n_docs"][0] == 500
    # gradient descent moved off the origin and accuracy is a probability
    assert abs(got["w0"][0]) > 0
    assert 0.0 <= got["accuracy"][0] <= 1.0


def test_rag_retrieve_composition(ray_session):
    from amharic_ecommerce_data_extractor_ray.oracles import rag_retrieve_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.rag import (
        rag_retrieve)

    got = rag_retrieve(SF)
    want = _docs_con().execute(rag_retrieve_sql(32, 24, 8, 5, 97)).df()
    assert got[["query_doc", "rank", "doc_id", "chunk_id"]].equals(
        want[["query_doc", "rank", "doc_id", "chunk_id"]])
    assert np.abs(got["cosine"] - want["cosine"]).max() < 1e-12
    # rank 1 for each query is its own first chunk (self-match, cosine 1)
    top = got[got["rank"] == 1]
    assert (top["doc_id"].to_numpy() == top["query_doc"].to_numpy()).all()
    assert (top["cosine"] == 1.0).all()
