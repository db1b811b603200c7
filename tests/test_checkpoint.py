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
    assert m["datasets"]["triples"]["rows"] == 1482
    assert not m["datasets"]["triples"]["skipped"]
    # triples partitioned by predicate for resumable, pruned reads
    parts = os.listdir(os.path.join(out, "triples"))
    assert any(p.startswith("pred=") for p in parts)
    # second run resumes
    m2 = build_kg("/root/testdata/sf0.001", out)
    assert m2["datasets"]["triples"]["skipped"]


def test_sharded_resume_after_crash_byte_identical(ray_session, tmp_path):
    """Kill after shard k, re-run, output byte-identical to an uninterrupted
    run (SURVEY.md §5 resume test; north-rule per-partition lineage)."""
    import glob
    import hashlib

    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.sources.corpus import make_corpus
    from amharic_ecommerce_data_extractor_ray.stages.enrich import fused_triples_batch
    from amharic_ecommerce_data_extractor_ray.state.checkpoint import sharded_checkpointed_write

    corpus_dir = str(tmp_path / "corpus")
    make_corpus(corpus_dir, 2000, block_rows=250)  # 8 input files
    paths = glob.glob(f"{corpus_dir}/*.parquet")

    def make_ds(shard_paths):
        return (rd.read_parquet(shard_paths,
                                columns=["message_id", "repo", "content"])
                .map_batches(fused_triples_batch, batch_format="pyarrow"))

    def output_digest(root):
        import pyarrow.parquet as pq

        rows = []
        for f in glob.glob(f"{root}/**/*.parquet", recursive=True):
            t = pq.read_table(f)
            rows.extend(map(tuple, t.to_pandas().itertuples(index=False)))
        return hashlib.sha256(repr(sorted(rows)).encode()).hexdigest(), len(rows)

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref")
    sharded_checkpointed_write(make_ds, paths, ref_out, n_shards=4)
    ref_digest, ref_rows = output_digest(ref_out)
    assert ref_rows > 0

    # crash after shard 1
    crash_out = str(tmp_path / "crash")

    class Boom(RuntimeError):
        pass

    def crash_after_1(i, res):
        if i == 1:
            raise Boom()

    with pytest.raises(Boom):
        sharded_checkpointed_write(make_ds, paths, crash_out, n_shards=4,
                                   on_shard_done=crash_after_1)

    # resume: shards 0-1 skipped, 2-3 freshly built
    done = {}
    m = sharded_checkpointed_write(make_ds, paths, crash_out, n_shards=4,
                                   on_shard_done=lambda i, r: done.update({i: r}))
    assert done[0]["skipped"] and done[1]["skipped"]
    assert not done[2]["skipped"] and not done[3]["skipped"]
    assert m["n_shards"] == 4
    assert output_digest(crash_out) == (ref_digest, ref_rows)


def test_full_build_deterministic_across_runs(ray_session, tmp_path):
    """Two independent full KG builds over the same input must produce
    IDENTICAL logical content (row-level, order-insensitive) for every
    dataset — the determinism the per-partition lineage/resume story rests
    on."""
    import pandas as pd

    from amharic_ecommerce_data_extractor_ray.pipelines.kg import build_kg

    def content_hashes(out_dir):
        hashes = {}
        for name in ("triples", "nodes", "edges"):
            df = pd.read_parquet(f"{out_dir}/{name}")
            df = df[sorted(df.columns)].astype(str)
            df = df.sort_values(list(df.columns)).reset_index(drop=True)
            hashes[name] = pd.util.hash_pandas_object(df, index=False).sum()
        return hashes

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_kg("/root/testdata/sf0.001", a)
    build_kg("/root/testdata/sf0.001", b)
    assert content_hashes(a) == content_hashes(b)
