"""Iterative BPE training + KMV set-operation sketch (round 3, batch 8)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_bpe_train_matches_unrolled_sql(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import bpe_train_sql
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import bpe_train

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = bpe_train(docs, n_merges=5)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(bpe_train_sql(5)).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_bpe_train_merge_sequence_properties(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import bpe_train

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = bpe_train(docs, n_merges=5)
    assert list(got["rank"]) == [1, 2, 3, 4, 5]
    assert (got["merged"] == got["lhs"] + got["rhs"]).all()
    assert (got["score"] > 0).all()
    # iteration 1's winner must be the argmax of the iteration-0 candidate
    # table (bpe_pair_stats) under the same tie-break
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        bpe_pair_stats)
    stats = bpe_pair_stats(docs, top_n=1)
    assert got["merged"].iloc[0] == stats["pair"].iloc[0]
    assert got["score"].iloc[0] == stats["n"].iloc[0]


def test_bpe_train_block_invariance(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import bpe_train

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = bpe_train(docs, n_merges=3)
    b = bpe_train(docs.repartition(11), n_merges=3)
    assert a.equals(b)


def test_kmv_set_ops_exact_regime(ray_session):
    """With 15 users per type at sf0.001 and k=64 the sketches are exact:
    the estimates must equal the true set sizes."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        kmv_set_ops)

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    got = kmv_set_ops(ev, type_a="click", type_b="purchase", k=64)

    con = duckdb.connect()
    truth = con.execute(f"""
        WITH a AS (SELECT DISTINCT user_id FROM
                   read_parquet('{SF}/events.parquet')
                   WHERE event_type = 'click'),
             b AS (SELECT DISTINCT user_id FROM
                   read_parquet('{SF}/events.parquet')
                   WHERE event_type = 'purchase')
        SELECT (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
                 AS u,
               (SELECT count(*) FROM (SELECT * FROM a INTERSECT
                                      SELECT * FROM b)) AS i""").df()
    assert got["union_est"][0] == float(truth["u"][0])
    assert got["inter_est"][0] == float(truth["i"][0])
    assert abs(got["jaccard_est"][0]
               - truth["i"][0] / truth["u"][0]) < 1e-6


def test_kmv_set_ops_matches_sql_replay(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import kmv_set_ops_sql
    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        kmv_set_ops)

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    # k=8 forces the ESTIMATOR branch even on the tiny corpus
    got = kmv_set_ops(ev, k=8)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(kmv_set_ops_sql("click", "purchase", 8)).df()
    for c in ("jaccard_est", "union_est", "inter_est"):
        assert np.isclose(got[c][0], want[c][0], atol=1e-9), c


def test_bpe_encode_matches_sql_replay(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.oracles import bpe_encode_sql
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        bpe_encode)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (bpe_encode(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(bpe_encode_sql(5)).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # merges only fuse adjacent symbols: every word still emits ≥ 1 token,
    # and no word can emit more tokens than characters
    assert (got["n_subwords"] >= got["n_ws_tokens"]).all()


def test_bpe_encode_merge_actually_fuses(ray_session):
    """With 0 merges every char is a token; 5 merges must strictly shrink
    the corpus-wide subword count."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        bpe_encode)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    base = bpe_encode(docs, n_merges=0).to_pandas()
    merged = bpe_encode(docs, n_merges=5).to_pandas()
    assert merged["n_subwords"].sum() < base["n_subwords"].sum()
