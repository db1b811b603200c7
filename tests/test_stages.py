"""Ray Data stage tests: sha256 invariant, triples vs goldens, KG build."""

import hashlib

import pytest

from amharic_ecommerce_data_extractor_ray import goldens
from amharic_ecommerce_data_extractor_ray.sources.corpus import N_TEMPLATES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def triples_df(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    return kg.triples_ds(SF).to_pandas()


def test_sha256_invariant_survives_pipeline(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    df = kg.tagged_messages(SF).to_pandas()
    assert len(df) == 500
    for content, sha in zip(df["content"], df["content_sha256"]):
        assert hashlib.sha256(content.encode()).hexdigest() == sha


def test_normalization_matches_goldens_through_ray(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    df = kg.tagged_messages(SF).to_pandas()
    for mid, norm, toks in zip(df["message_id"], df["preprocessed_text"],
                               df["tokens"]):
        t = mid % N_TEMPLATES
        assert norm == goldens.NORM[t]
        assert list(toks) == goldens.TOKENS[t]


def test_triples_match_reference_goldens(ray_session, triples_df):
    by_msg = {mid: g for mid, g in triples_df.groupby("message_id")}
    for mid in range(500):
        expected = goldens.TRIPLES[mid % N_TEMPLATES]
        got = by_msg.get(mid)
        actual = ([] if got is None else
                  list(zip(got["pred"], got["obj"], got["obj_norm"],
                           [None if p != p else p for p in got["price_value"]])))
        assert sorted(actual, key=str) == sorted(
            [tuple(e) for e in expected], key=str), f"message {mid}"


def test_triples_subject_is_vendor(ray_session, triples_df):
    assert triples_df["subj"].str.startswith("vendor_").all()


def test_kg_nodes_and_edges_consistent(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    nodes = kg.kg_nodes(SF).to_pandas()
    edges = kg.kg_edges(SF).to_pandas()
    node_ids = set(nodes["node_id"])
    assert set(edges["src_id"]) <= node_ids
    assert set(edges["dst_id"]) <= node_ids
    # vendor nodes + entity nodes, ids unique
    assert nodes["node_id"].is_unique
    assert set(nodes["node_type"]) == {"vendor", "entity"}


def test_fused_kernels_match_staged_chain(ray_session):
    """fused_triples_batch / fused_entities_batch are pure optimizations:
    bit-identical output to the staged enrich→tag→{triples,entities} chain."""
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.enrich import (
        enrich_batch, entities_batch, fused_entities_batch,
        fused_triples_batch, tag_batch, triples_batch)

    batch = kg.corpus_ds(SF).take_batch(200, batch_format="pyarrow")
    tbl = pa.table(batch)
    staged_tr = triples_batch(tag_batch(enrich_batch(tbl)))
    assert fused_triples_batch(tbl).equals(staged_tr)

    staged_en = entities_batch(tag_batch(enrich_batch(tbl)))
    fused_en = fused_entities_batch(tbl)
    for col in ("products", "prices", "locations", "contact_info",
                "all_numerical_prices"):
        assert fused_en[col].to_pylist() == staged_en[col].to_pylist()


def test_triples_from_entities_matches_fused(ray_session):
    """Deriving triples from the entities stage boundary yields the same
    multiset of rows as the direct fused kernel (per-message order may group
    by type — the table is keyed, not ordered)."""
    import pyarrow as pa

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.enrich import (
        fused_entities_batch, fused_triples_batch, triples_from_entities_batch)

    tbl = pa.table(kg.corpus_ds(SF).take_batch(300, batch_format="pyarrow"))
    direct = fused_triples_batch(tbl).to_pandas()
    derived = triples_from_entities_batch(fused_entities_batch(tbl)).to_pandas()
    key = ["message_id", "subj", "pred", "obj", "obj_norm", "content_sha256"]
    canon = lambda df: (df.sort_values(key).reset_index(drop=True)
                        [key + ["price_value"]])
    import pandas as pd

    pd.testing.assert_frame_equal(canon(direct), canon(derived))


def test_graph_from_triples_matches_separate_passes(ray_session):
    """Single-scan graph materialization ≡ canonical_entities +
    canonical_edges run separately."""
    import pandas as pd

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.canonicalize import (
        canonical_edges, canonical_entities, graph_from_triples)

    nodes_ds, edges_ds = graph_from_triples(kg.triples_ds(SF))
    canon = lambda df: df.sort_values(list(df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        canon(nodes_ds.to_pandas()),
        canon(canonical_entities(kg.triples_ds(SF)).to_pandas()))
    pd.testing.assert_frame_equal(
        canon(edges_ds.to_pandas()),
        canon(canonical_edges(kg.triples_ds(SF)).to_pandas()))
