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


# ---- real-media kernels (VERDICT r4 next-step #5) -------------------------

def _tiny_wav(samples, *, channels=1, rate=8000) -> bytes:
    """Deterministic 16-bit PCM WAV built with the stdlib only."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _tiny_png_gray4x4() -> bytes:
    """4x4 grayscale gradient PNG built with stdlib zlib/struct — a real,
    decodable asset that needs no image library to CREATE."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # 8-bit gray
    rows = b"".join(
        b"\x00" + bytes((y * 4 + x) * 17 for x in range(4))
        for y in range(4))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))


def test_audio_wav_kernel_real_pcm(ray_session):
    """kernel='wav' decodes REAL 16-bit PCM (stdlib wave — works in this
    sandbox) through the actor-pool stage; energies match a dense numpy
    recompute, stereo mixes down to the channel mean."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from amharic_ecommerce_data_extractor_ray.stages.multimodal import (
        AudioWindowStage)

    mono = list(range(-8, 12))                       # 20 samples
    stereo = [v for s in range(10) for v in (s, s + 2)]  # 10 frames, mean s+1
    ds = rd.from_items([
        {"message_id": 1, "payload": _tiny_wav(mono)},
        {"message_id": 2, "payload": _tiny_wav(stereo, channels=2)},
        {"message_id": 3, "payload": _tiny_wav([])},   # too short → no rows
    ])
    out = (ds.map_batches(AudioWindowStage, batch_format="pyarrow",
                          batch_size=2, concurrency=1,
                          fn_constructor_kwargs={"window": 8, "hop": 4,
                                                 "kernel": "wav"})
           .to_pandas().sort_values(["message_id", "window_idx"])
           .reset_index(drop=True))

    x = np.array(mono, dtype=np.int64)
    exp1 = [int((x[s:s + 8] ** 2).sum()) for s in range(0, 13, 4)]
    got1 = out[out["message_id"] == 1]["energy"].tolist()
    assert got1 == exp1
    y = np.arange(10, dtype=np.int64) + 1            # stereo mixdown
    exp2 = [int((y[s:s + 8] ** 2).sum()) for s in range(0, 3, 4)]
    got2 = out[out["message_id"] == 2]["energy"].tolist()
    assert got2 == exp2
    assert (out["message_id"] == 3).sum() == 0


def test_decode_stage_pil_kernel_or_clean_guard(ray_session):
    """With Pillow present the 'pil' kernel decodes the stdlib-built PNG
    (real width/height + thumbnail features); without it, actor init must
    raise the documented NotImplementedError, never fail mid-batch."""
    import pytest

    from amharic_ecommerce_data_extractor_ray.stages.multimodal import (
        DecodeStage)

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            DecodeStage(kernel="pil")
        return

    import pyarrow as pa

    stage = DecodeStage(kernel="pil")
    out = stage(pa.table({
        "message_id": pa.array([1], pa.int64()),
        "payload": pa.array([_tiny_png_gray4x4()], pa.binary())}))
    assert out["width"].to_pylist() == [4]
    assert out["height"].to_pylist() == [4]
    feats = out["features"].to_pylist()[0]
    assert len(feats) == 4 and all(0.0 <= f <= 1.0 for f in feats)


def test_frame_sample_imageio_guard():
    """kernel='imageio' raises the documented NotImplementedError at init
    when imageio/cv2 are absent (skips if one is present)."""
    import pytest

    from amharic_ecommerce_data_extractor_ray.stages.multimodal import (
        FrameSampleStage)

    try:
        import imageio  # noqa: F401
        pytest.skip("imageio present — guard not reachable")
    except ImportError:
        pass
    try:
        import cv2  # noqa: F401
        pytest.skip("cv2 present — guard not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="imageio"):
        FrameSampleStage(kernel="imageio")
