"""Unigram-LM tokenizer training (stages/seqprep.py unigram_*)."""

import math

import pytest


def _toy(ray_session):
    import ray.data as rd

    return rd.from_items([{"doc_id": 0, "text": "ababab abab cd"},
                          {"doc_id": 1, "text": "abab cd cd"}])


def test_seed_counts_hand_checked(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        unigram_seed)

    out = unigram_seed(_toy(ray_session), max_piece_len=2, top_n=100)
    got = dict(zip(out["piece"], out["n"]))
    # words: ababab(1) abab(2) cd(3)
    # 'ab' substrings: ababab has 3 + 2('ba')... count 'ab': positions
    # 0,2,4 → 3; abab → 2 each ×2 words = 4; total 7
    assert got["ab"] == 7
    assert got["ba"] == 2 + 1 * 2  # ababab:2, abab:1 each
    assert got["cd"] == 3
    assert got["a"] == 3 + 2 * 2
    # ordering: n desc, piece asc
    pairs = list(zip(out["n"], out["piece"]))
    assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))


def test_em_learns_ab_piece(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        unigram_train)

    out = unigram_train(_toy(ray_session), max_piece_len=2, seed_size=50,
                        vocab_size=10, n_iters=2)
    got = dict(zip(out["piece"], out["n"]))
    # 'ab' dominates: ababab→3 uses, abab→2 uses ×2, total 7
    assert got.get("ab") == 7
    assert got.get("cd") == 3
    # single chars 'a'/'b' are never used by Viterbi once 'ab' wins, but
    # stay in the vocabulary at count 0 (segmentability floor)
    assert got.get("a") == 0 and got.get("b") == 0
    # logprobs normalize over surviving counts; zero-count pieces carry
    # the floor log(0.5/total), strictly below any count-1 piece
    total = out["n"].sum()
    floor = math.log(0.5 / total)
    for _, r in out.iterrows():
        want = math.log(r["n"] / total) if r["n"] > 0 else floor
        assert abs(r["logprob"] - want) < 1e-5


def test_counts_partition_invariant(ray_session):
    """Integer hard-EM counts must be identical under any block layout."""
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        unigram_train)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    a = unigram_train(docs, n_iters=1, seed_size=100, vocab_size=40)
    b = unigram_train(docs.repartition(13), n_iters=1, seed_size=100,
                      vocab_size=40)
    assert a.equals(b)


def test_segmentation_conserves_codepoints(ray_session):
    """Sum over pieces of len(piece)×count equals the corpus's total
    within-word codepoints when no word was dropped as unsegmentable."""
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.stages.seqprep import (
        unigram_train)
    import ray.data as rd

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    # big vocab → every single char retained → no word dropped
    out = unigram_train(docs, n_iters=1, seed_size=400, vocab_size=400)
    got = sum(len(p) * n for p, n in zip(out["piece"], out["n"]))
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    want = sum(len(w) for t in texts for w in (t or "").split())
    assert got == want


def test_seed_matches_duckdb_oracle(ray_session):
    import duckdb

    from amharic_ecommerce_data_extractor_ray import oracles
    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_unigram_seed)

    got = q_unigram_seed("/root/testdata/sf0.001").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                "'/root/testdata/sf0.001/documents.parquet')")
    want = con.execute(oracles.unigram_seed_sql()).df()
    assert got["piece"].tolist() == want["piece"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
