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


def test_hybrid_rrf_matches_sql_and_independent_recompute(ray_session):
    """RRF fusion (round 4): engine == SQL mirror, AND == an independent
    pandas recompute fusing the two already-gated component rankings."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.entrypoints import BM25_QUERY
    from amharic_ecommerce_data_extractor_ray.functions.np_model import (
        HashEmbedder)
    from amharic_ecommerce_data_extractor_ray.oracles import rag_rrf_sql
    from amharic_ecommerce_data_extractor_ray.pipelines.rag import hybrid_rrf
    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        bm25_topk)

    got = hybrid_rrf(SF, BM25_QUERY, k=20, pool=50)
    want = _docs_con().execute(rag_rrf_sql(BM25_QUERY, k=20, pool=50)).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.abs(got["rrf"] - want["rrf"]).max() < 1e-12
    assert (got["rank_bm25"].fillna(-1).to_numpy()
            == want["rank_bm25"].fillna(-1).to_numpy()).all()
    assert (got["rank_dense"].fillna(-1).to_numpy()
            == want["rank_dense"].fillna(-1).to_numpy()).all()

    # independent recompute: dense ranks via a dense-numpy pass over the
    # whole table, sparse ranks via bm25_topk itself, fused in pandas
    import pandas as pd

    docs = (rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas())
    model = HashEmbedder(dim=32)
    terms = sorted(set(BM25_QUERY))
    qv = np.mean([model.token_vec(t) for t in terms], axis=0)
    qv = qv / np.linalg.norm(qv)
    rows = [(d, float(v @ qv / np.linalg.norm(v)))
            for d, t in zip(docs["doc_id"], docs["text"])
            if (v := model.embed(t)) is not None]
    dense = pd.DataFrame(rows, columns=["doc_id", "cos"])
    dense["cos"] = np.floor(dense["cos"] * 1e6 + 0.5) / 1e6
    dense = (dense.sort_values(["cos", "doc_id"], ascending=[False, True])
             .head(50).reset_index(drop=True))
    dense["rd"] = np.arange(1, len(dense) + 1)
    sparse = bm25_topk(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]), BM25_QUERY, k=50)
    sparse["rs"] = np.arange(1, len(sparse) + 1)
    fused = sparse[["doc_id", "rs"]].merge(dense[["doc_id", "rd"]],
                                           on="doc_id", how="outer")
    score = (np.where(fused["rs"].isna(), 0, 1.0 / (60 + fused["rs"]))
             + np.where(fused["rd"].isna(), 0, 1.0 / (60 + fused["rd"])))
    fused["rrf"] = np.floor(score * 1e6 + 0.5) / 1e6
    fused = (fused.sort_values(["rrf", "doc_id"], ascending=[False, True])
             .head(20).reset_index(drop=True))
    assert got["doc_id"].tolist() == fused["doc_id"].tolist()
    assert np.abs(got["rrf"] - fused["rrf"]).max() < 1e-12
    # fusion is genuinely hybrid on this corpus: the top-20 contains docs
    # ranked by BOTH systems (neither arm alone decides the list)
    assert got["rank_bm25"].notna().any() and got["rank_dense"].notna().any()
