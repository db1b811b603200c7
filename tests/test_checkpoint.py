"""Checkpointed write: skip-on-manifest, fingerprint invalidation, atomicity."""

import json
import os

import pytest


def test_checkpointed_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.state.checkpoint import checkpointed_write

    out = str(tmp_path / "ds1")
    ds = rd.range(100)
    r1 = checkpointed_write(ds, out, fingerprint="fp1")
    assert r1 == {"rows": 100, "skipped": False}
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))

    # same fingerprint → skipped, no rewrite
    r2 = checkpointed_write(rd.range(100), out, fingerprint="fp1")
    assert r2 == {"rows": 100, "skipped": True}

    # changed input fingerprint → rewritten
    r3 = checkpointed_write(rd.range(50), out, fingerprint="fp2")
    assert r3 == {"rows": 50, "skipped": False}
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f)["fingerprint"] == "fp2"


def test_build_kg_manifest(ray_session, tmp_path):
    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg

    out = str(tmp_path / "kg")
    m = build_kg("/root/testdata/sf0.001", out)
    assert m["datasets"]["triples"]["rows"] == 957
    assert not m["datasets"]["triples"]["skipped"]
    # triples partitioned by predicate for resumable, pruned reads
    parts = os.listdir(os.path.join(out, "triples"))
    assert any(p.startswith("pred=") for p in parts)
    # second run resumes
    m2 = build_kg("/root/testdata/sf0.001", out)
    assert m2["datasets"]["triples"]["skipped"]
