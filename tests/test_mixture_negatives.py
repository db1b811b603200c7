"""Hard-negative mining + domain mixture weights (round 3, batch 8)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_hard_negatives_excludes_query_label(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        hard_negatives)

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = hard_negatives(emb, list(range(10)), k=10)
    labels = (emb.to_pandas().set_index("vec_id")["label"])
    for _, row in got.iterrows():
        assert row["neg_label"] != labels.loc[row["query_id"]]
        assert row["neg_label"] == labels.loc[row["negative_id"]]
    # k rows per query, ranks 1..k, cosine non-increasing within a query
    for _, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["cosine"].to_numpy()) <= 0).all()


def test_hard_negatives_matches_sql(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import (
        hard_negatives_sql)
    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        hard_negatives)

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = hard_negatives(emb, list(range(5)), k=5)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = con.execute(hard_negatives_sql(list(range(5)), 5)).df()
    for c in ("query_id", "rank", "negative_id", "neg_label"):
        assert (got[c].astype("int64").to_numpy()
                == want[c].astype("int64").to_numpy()).all(), c
    assert np.abs(got["cosine"] - want["cosine"]).max() < 1e-12


def test_source_mixture_weights_sum_properties(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.corpus_stats import (
        source_mixture_weights)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    got = source_mixture_weights(docs)
    # shares sum to 1 (up to rounding), weight x share = uniform share
    assert abs(got["token_share"].sum() - 1.0) < 1e-3
    uniform = 1.0 / len(got)
    prod = got["weight"] * got["token_share"]
    assert np.abs(prod - uniform).max() < 1e-4
    assert got["n_docs"].sum() == 500
