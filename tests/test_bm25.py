"""BM25 ranking (corpus_stats.bm25_topk)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_bm25_matches_duckdb_oracle(ray_session):
    from amharic_ecommerce_data_extractor_ray import oracles
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        BM25_QUERY, q_bm25)

    got = q_bm25(SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{SF}/documents.parquet')")
    want = con.execute(oracles.bm25_topk_sql(BM25_QUERY, 20)).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["bm25"], want["bm25"], atol=1e-9)


def test_bm25_partition_invariant_and_monotone(ray_session):
    """Same result under any block layout; a doc stuffed with the query
    terms must outrank a doc without them."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        bm25_topk)

    rows = [{"doc_id": 0, "text": "alpha beta alpha beta gamma"},
            {"doc_id": 1, "text": "delta epsilon zeta"},
            {"doc_id": 2, "text": "alpha delta delta delta"},
            {"doc_id": 3, "text": ""}]
    q = ["alpha", "beta"]
    a = bm25_topk(rd.from_items(rows), q, k=10)
    b = bm25_topk(rd.from_items(rows).repartition(7), q, k=10)
    assert a.equals(b)
    # only docs containing a query term appear; stuffed doc ranks first
    assert a["doc_id"].tolist() == [0, 2]
    assert a["bm25"].iloc[0] > a["bm25"].iloc[1] > 0
