"""Multimodal plumbing: binary payload column, actor-pool decode stage."""

import hashlib

import pytest


def test_decode_pipeline_schema_and_determinism(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.multimodal import decode_pipeline

    rows = [{"message_id": i, "content": f"hello {i} ዋጋ"} for i in range(10)]
    out = decode_pipeline(rd.from_items(rows), concurrency=1).to_pandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        payload = r["content"].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        digest = hashlib.sha256(payload).digest()
        assert r["width"] == 1 + digest[0] % 64
        assert r["height"] == 1 + digest[1] % 64
        assert list(r["features"]) == [b / 255.0 for b in digest[:4]]
        assert r["media_type"] == "image/fake"


def test_frame_sample_pipeline(ray_session):
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.multimodal import frame_sample_pipeline

    rows = [{"message_id": i, "content": f"video {i}"} for i in range(6)]
    out = frame_sample_pipeline(rd.from_items(rows), stride=7,
                                concurrency=1).to_pandas()
    assert set(out["message_id"]) == set(range(6))
    # frame indices are stride-aligned and deterministic
    assert (out["frame_idx"] % 7 == 0).all()
    for _, g in out.groupby("message_id"):
        assert list(g["frame_idx"]) == sorted(g["frame_idx"])
        assert all(len(f) == 4 for f in g["features"])
    # determinism: second run identical
    out2 = frame_sample_pipeline(rd.from_items(rows), stride=7,
                                 concurrency=1).to_pandas()
    assert out.equals(out2)


def test_audio_window_energies(ray_session):
    import numpy as np

    from amharic_ecommerce_data_extractor_ray.pipelines import kg
    from amharic_ecommerce_data_extractor_ray.stages.multimodal import (
        audio_window_pipeline)

    sf = "/root/testdata/sf0.001"
    got = audio_window_pipeline(kg.corpus_ds(sf), window=16, hop=8) \
        .to_pandas()
    corpus = kg.corpus_ds(sf).to_pandas().set_index("message_id")
    # hand-verify one message's windows
    mid = got["message_id"].iloc[0]
    t = corpus.loc[mid, "content"]
    cp = np.array([ord(c) for c in t], dtype=np.int64)
    g = got[got["message_id"] == mid].sort_values("start")
    starts = np.arange(0, len(cp) - 16 + 1, 8)
    assert g["start"].tolist() == starts.tolist()
    for _, r in g.iterrows():
        s = int(r["start"])
        assert r["energy"] == int((cp[s:s + 16] ** 2).sum())
    # short messages (< window samples) emit nothing
    short = corpus[corpus["content"].str.len() < 16].index
    assert not got["message_id"].isin(short).any()


def test_image_phash_properties(ray_session):
    import numpy as np

    from amharic_ecommerce_data_extractor_ray.entrypoints import q_image_phash
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"
    got = q_image_phash(sf).to_pandas().set_index("message_id")["phash"]
    corpus = kg.corpus_ds(sf).to_pandas()
    # identical content => identical phash (near-dup signal invariant)
    dup = corpus.groupby("content")["message_id"].apply(list)
    for ids in dup[dup.str.len() > 1].head(5):
        assert got.loc[ids].nunique() == 1
    # hand-check one message against the definition
    r = corpus.iloc[0]
    cp = np.array([ord(c) for c in r["content"]], dtype=np.int64)
    n, G2 = len(cp), 64
    if n >= G2:
        pos = (np.arange(G2, dtype=np.int64) * n) // G2
        cells = cp[pos]
        bits = (cells * G2) > cells.sum()
        want = sum(int(b) << i for i, b in enumerate(bits)) % (1 << 63)
        assert got.loc[r["message_id"]] == want
    assert (got >= 0).all()


def test_scene_change_semantics(ray_session):
    import hashlib

    import numpy as np

    from amharic_ecommerce_data_extractor_ray.entrypoints import (
        q_scene_changes)
    from amharic_ecommerce_data_extractor_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"
    got = q_scene_changes(sf).to_pandas()
    # every payload's first sampled frame is a boundary with delta 0
    first = got.sort_values("frame_idx").groupby("message_id").head(1)
    assert first["is_scene"].eq(1).all() and first["delta"].eq(0).all()
    # boundaries fire exactly where |Δlum| >= 96 (hand replay, one message)
    corpus = kg.corpus_ds(sf).to_pandas()
    r = corpus.iloc[3]
    payload = r["content"].encode("utf-8")
    n_frames = 1 + hashlib.sha256(payload).digest()[2] % 120
    idxs = list(range(0, n_frames, 5))
    lums = [hashlib.sha256(payload + f":{i}".encode()).digest()[0]
            for i in idxs]
    g = got[got["message_id"] == r["message_id"]].sort_values("frame_idx")
    assert g["frame_idx"].tolist() == idxs
    assert g["lum"].tolist() == lums
    want_scene = [1] + [int(abs(b - a) >= 96)
                        for a, b in zip(lums, lums[1:])]
    assert g["is_scene"].tolist() == want_scene
    # on random-ish luminance, boundaries occur but are a strict subset
    assert 0 < got["is_scene"].sum() < len(got)
