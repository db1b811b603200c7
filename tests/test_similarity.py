"""Similarity search vs a local numpy oracle."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist(), "label": i % 3}
            for i in range(60)]
    return rd.from_items(rows), vecs


def _oracle_topk(vecs, qids, k):
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    out = {}
    for qi in qids:
        cos = unit @ unit[qi]
        order = np.lexsort((np.arange(len(vecs)), -cos))[:k]
        out[qi] = [(int(n), round(float(cos[n]), 6)) for n in order]
    return out


def test_brute_force_topk_matches_numpy(emb):
    from amharic_ecommerce_data_extractor_ray.stages.similarity import brute_force_topk

    ds, vecs = emb
    qids = [0, 5, 9]
    got = brute_force_topk(ds, qids, k=5).to_pandas()
    expect = _oracle_topk(vecs, qids, 5)
    for qi in qids:
        rows = got[got["query_id"] == qi].sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True])
        assert [(int(n), round(float(c), 6))
                for n, c in zip(rows["neighbor_id"], rows["cosine"])] == expect[qi]


def test_self_match_is_rank_one(emb):
    from amharic_ecommerce_data_extractor_ray.stages.similarity import brute_force_topk

    ds, _ = emb
    got = brute_force_topk(ds, [3], k=3).to_pandas()
    best = got.sort_values(["cosine", "neighbor_id"],
                           ascending=[False, True]).iloc[0]
    assert best["neighbor_id"] == 3 and best["cosine"] == pytest.approx(1.0)


def test_lsh_topk_contains_self(emb):
    from amharic_ecommerce_data_extractor_ray.stages.similarity import lsh_topk

    ds, _ = emb
    got = lsh_topk(ds, [0, 5], k=5).to_pandas()
    assert set(got["query_id"]) == {0, 5}
    for qi in (0, 5):
        assert qi in set(got[got["query_id"] == qi]["neighbor_id"])


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.similarity import brute_force_topk, ivf_topk

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(5))
    exact = brute_force_topk(emb, qids, k=10).to_pandas()
    approx = ivf_topk(rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
                      qids, k=10, n_clusters=8, n_probe=4).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        recalls.append(len(e & a) / len(e))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"mean recall {mean_recall} too low"
    # self-match always survives probing (its own cluster is the nearest)
    for q in qids:
        assert q in set(approx[approx.query_id == q].neighbor_id)
