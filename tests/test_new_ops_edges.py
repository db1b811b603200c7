"""Edge cases for the round-3 batch 7/8 operators (tiny in-memory inputs)."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_set_similarity_join_short_docs_and_exact_dups(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        set_similarity_join)

    rows = [
        (1, "a b c d e f g"),          # 3 5-gram shingles
        (2, "a b c d e f g"),          # exact dup of 1 → J = 1
        (3, "completely different words here and there now"),
        (4, "tiny"),                   # < n tokens → no shingles, excluded
        (5, ""),                       # empty → excluded
    ]
    out = set_similarity_join(_docs(rows), n=5)
    assert [(r.id_a, r.id_b) for r in out.itertuples()] == [(1, 2)]
    assert out["jaccard"].iloc[0] == 1.0


def test_set_similarity_join_no_pairs(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.dedup import (
        set_similarity_join)

    rows = [(1, "one two three four five"),
            (2, "six seven eight nine ten")]
    out = set_similarity_join(_docs(rows), n=5)
    assert len(out) == 0


def test_bpe_train_single_word_corpus(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.seqprep import bpe_train

    out = bpe_train(_docs([(1, "aaab aaab aaab")]), n_merges=2)
    # merge 1: (a,a) appears 2x per word x 3 words = 6
    assert (out.loc[0, "lhs"], out.loc[0, "rhs"], out.loc[0, "score"]) \
        == ("a", "a", 6)
    # after merging: words are (aa, a, b) → merge 2 best is (aa, a) or
    # (a, b), both score 3; tie-break lhs asc picks ("a", "b")
    assert (out.loc[1, "lhs"], out.loc[1, "rhs"], out.loc[1, "score"]) \
        == ("a", "b", 3)


def test_kmv_set_ops_disjoint_and_missing_type(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.sketch import (
        kmv_set_ops)

    ev = rd.from_arrow(pa.table({
        "event_type": pa.array(["click", "click", "purchase"], pa.string()),
        "user_id": pa.array([1, 2, 3], pa.int64()),
    }))
    out = kmv_set_ops(ev, type_a="click", type_b="purchase", k=8)
    assert out["jaccard_est"][0] == 0.0
    assert out["union_est"][0] == 3.0
    assert out["inter_est"][0] == 0.0

    out2 = kmv_set_ops(ev, type_a="click", type_b="signup", k=8)
    assert out2["jaccard_est"][0] == 0.0


def test_entity_resolution_all_singletons(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from amharic_ecommerce_data_extractor_ray.pipelines.entity_res import (
        entity_resolution)

    pq.write_table(pa.table({
        "p_name": pa.array(["alpha product", "beta gadget",
                            "gamma widget thing"], pa.string()),
    }), tmp_path / "part.parquet")
    out = entity_resolution(str(tmp_path))
    assert (out["form"] == out["canonical"]).all()
    assert (out["cluster_size"] == 1).all()
    assert len(out) == 3


def test_hard_negatives_single_label_corpus_is_empty(ray_session):
    from amharic_ecommerce_data_extractor_ray.stages.similarity import (
        hard_negatives)

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]],
                              pa.list_(pa.float64())),
        "label": pa.array([5, 5, 5], pa.int64()),
    }))
    out = hard_negatives(emb, [0], k=2)
    assert len(out) == 0
