"""Occlusion token attribution (A3): deterministic, self-consistent, and
sensitive to entity-bearing tokens."""

import numpy as np
import pytest


def test_occlusion_attribution_direct():
    """Masking a token whose own label is an entity must change at least its
    own position → attribution ≥ 1/n; a run where NOTHING depends on a token
    gives 0.  Verified against a hand-rolled occlusion loop on the model."""
    from amharic_ecommerce_data_extractor_ray.functions.np_model import NumpyTokenClassifier
    from amharic_ecommerce_data_extractor_ray.stages.interpret import (MASK,
                                                     OcclusionAttributionStage)
    import pyarrow as pa

    model = NumpyTokenClassifier()
    stage = OcclusionAttributionStage()
    toks = "ዋጋ 1500 ብር ላፕቶፕ አዲስ አበባ".split()
    out = stage(pa.table({
        "message_id": pa.array([7], pa.int64()),
        "tokens": pa.array([toks], pa.list_(pa.string())),
    })).to_pandas()
    assert len(out) == len(toks)
    assert list(out["tok_idx"]) == list(range(len(toks)))

    # independent recomputation
    base = [l for _t, l in model.tag(toks)]
    assert list(out["base_label"]) == base
    for i, row in out.iterrows():
        occ = toks[:i] + [MASK] + toks[i + 1:]
        labs = [l for _t, l in model.tag(occ)]
        expect = sum(1 for a, b in zip(base, labs) if a != b)
        assert row["n_changed"] == expect
        assert row["attribution"] == pytest.approx(expect / len(toks))

    # any token whose base label flips to something else when masked
    # contributes at least its own position
    flipped = out[out["n_changed"] > 0]
    assert (flipped["attribution"] >= 1 / len(toks) - 1e-9).all()


def test_token_attribution_pipeline(ray_session):
    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.interpret import token_attribution

    out = token_attribution(kg.corpus_ds("/root/testdata/sf0.001"),
                            limit=6).to_pandas()
    assert set(out.columns) == {"message_id", "tok_idx", "token",
                                "base_label", "n_changed", "attribution"}
    assert out["message_id"].nunique() == 6
    assert (out["attribution"] >= 0).all() and (out["attribution"] <= 1).all()
    # deterministic across runs
    out2 = token_attribution(kg.corpus_ds("/root/testdata/sf0.001"),
                             limit=6).to_pandas()
    key = ["message_id", "tok_idx"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
