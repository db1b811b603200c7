"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with metadata columns
alongside.  Every stage carries TWO kernels behind one production layout:
the deterministic fake (the oracle-checkable default — no media libraries
in this container) and a REAL branch behind feature detection
(``DecodeStage(kernel="pil")`` → Pillow image decode,
``AudioWindowStage(kernel="wav")`` → stdlib PCM WAV decode — real even in
this sandbox, ``FrameSampleStage(kernel="imageio")`` → imageio/cv2 frame
extraction).  Absent libraries raise the documented NotImplementedError at
actor init, never mid-batch.

At scale: binary payloads dominate block size — stages here use small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns round-trip
zero-copy through Arrow; pandas object dtype would copy).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def attach_payload_batch(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """Simulate a multimodal ingest: derive a binary payload column (the
    UTF-8 bytes of the text stand in for an encoded image) + media metadata."""
    texts = batch[text_col].to_pylist()
    payloads = [(t or "").encode("utf-8") for t in texts]
    return (batch
            .append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("media_type",
                           pa.array(["image/fake"] * len(payloads), pa.string())))


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    Two kernels behind one production layout (actor signature, per-actor
    init-once, batch shaping, output schema):

    - ``kernel="fake"`` (default, the oracle path): deterministic stand-in —
      "width/height" derived from the payload hash, "features" = first 4
      bytes of sha256.  Verifiable without image libraries.
    - ``kernel="pil"``: REAL image decode via Pillow (feature-detected in
      ``__init__``, raising the documented NotImplementedError when absent):
      width/height from the decoded image, features = the 2×2 grayscale
      thumbnail's pixels / 255 (deterministic).  Exercised by an
      importorskip test over a stdlib-built PNG the day Pillow lands.
    """

    def __init__(self, kernel: str = "fake"):
        # Per-actor init: codec / model loads happen here once.
        self._hasher = hashlib.sha256
        self.kernel = kernel
        if kernel == "pil":
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "DecodeStage(kernel='pil') needs Pillow, which is not "
                    "available in this environment; use the deterministic "
                    "kernel='fake' path") from exc
            self._pil_image = Image

    def _decode(self, payload: bytes) -> tuple[int, int, list[float]]:
        if self.kernel == "pil":
            import io

            im = self._pil_image.open(io.BytesIO(payload))
            width, height = im.size
            thumb = im.convert("L").resize((2, 2))
            feats = [p / 255.0 for p in thumb.getdata()]
            return width, height, feats
        digest = self._hasher(payload).digest()
        width = 1 + digest[0] % 64
        height = 1 + digest[1] % 64
        feats = [b / 255.0 for b in digest[:4]]
        return width, height, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths, heights, feats, sizes = [], [], [], []
        for p in payloads:
            p = p or b""
            w, h, f = self._decode(p)
            widths.append(w)
            heights.append(h)
            feats.append(f)
            sizes.append(len(p))
        return (batch
                .append_column("n_bytes", pa.array(sizes, pa.int64()))
                .append_column("width", pa.array(widths, pa.int64()))
                .append_column("height", pa.array(heights, pa.int64()))
                .append_column("features",
                               pa.array(feats, pa.list_(pa.float64()))))


def decode_pipeline(ds, *, concurrency: int = 2, batch_size: int = 256):
    """Attach payloads then decode via an actor pool (small batches — wide
    binary rows)."""
    return (ds
            .map_batches(attach_payload_batch, batch_format="pyarrow")
            .map_batches(DecodeStage, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency))


class FrameSampleStage:
    """Actor-pool frame-sampling stage for video payloads.

    Real frame extraction needs ffmpeg/cv2 (absent here) — the deterministic
    fake derives ``n_frames`` from the payload hash and emits one feature
    vector per sampled frame (every ``stride``-th).  The production-relevant
    parts are real: actor init-once, small batch sizes for wide rows, and the
    output layout (one row per SAMPLED FRAME via a flat explode — the shape a
    downstream embedding/train stage consumes)."""

    def __init__(self, stride: int = 5, kernel: str = "fake"):
        self.stride = stride
        self._hasher = hashlib.sha256
        self.kernel = kernel
        if kernel == "imageio":
            try:
                import imageio  # noqa: F401
            except ImportError:
                try:
                    import cv2  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "FrameSampleStage(kernel='imageio') needs imageio "
                        "or cv2 (+ffmpeg), unavailable in this environment; "
                        "use the deterministic kernel='fake' path") from exc

    def _frames(self, payload: bytes) -> list[tuple[int, list[float]]]:
        if self.kernel == "imageio":  # pragma: no cover - env-blocked here
            import io

            import imageio.v3 as iio
            import numpy as np

            frames = iio.imread(io.BytesIO(payload), index=None)
            out = []
            for fidx in range(0, len(frames), self.stride):
                f = np.asarray(frames[fidx], dtype=np.float64)
                # mean luma of the frame's 2×2 corner blocks — the same
                # 4-float feature layout as the fake kernel
                h, w = f.shape[0], f.shape[1]
                g = f.mean(axis=-1) if f.ndim == 3 else f
                out.append((fidx, [
                    float(g[:h // 2, :w // 2].mean()) / 255.0,
                    float(g[:h // 2, w // 2:].mean()) / 255.0,
                    float(g[h // 2:, :w // 2].mean()) / 255.0,
                    float(g[h // 2:, w // 2:].mean()) / 255.0]))
            return out
        digest = self._hasher(payload).digest()
        n_frames = 1 + digest[2] % 120
        out = []
        for fidx in range(0, n_frames, self.stride):
            d = self._hasher(payload + fidx.to_bytes(4, "little")).digest()
            out.append((fidx, [b / 255.0 for b in d[:4]]))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch["message_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_mid, out_frame, out_feat = [], [], []
        for mid, p in zip(mids, payloads):
            for fidx, feat in self._frames(p or b""):
                out_mid.append(mid)
                out_frame.append(fidx)
                out_feat.append(feat)
        return pa.table({
            "message_id": pa.array(out_mid, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int64()),
            "features": pa.array(out_feat, pa.list_(pa.float64())),
        })


def frame_sample_pipeline(ds, *, stride: int = 5, concurrency: int = 2,
                          batch_size: int = 128):
    """Video path: payload → sampled frame-feature rows (actor pool)."""
    return (ds
            .map_batches(attach_payload_batch, batch_format="pyarrow")
            .map_batches(FrameSampleStage,
                         fn_constructor_kwargs={"stride": stride},
                         batch_format="pyarrow", batch_size=batch_size,
                         concurrency=concurrency))


class AudioWindowStage:
    """Actor-pool audio windowing: fixed windows of ``window`` samples at
    ``hop`` stride with per-window energy (Σ sample²) — the frame-level
    feature layout every audio pipeline (VAD, ASR chunking) emits.

    Decode is the honest sandbox stand-in (no torchaudio/ffmpeg): "PCM
    samples" are the text's Unicode code points, extracted VECTORIZED via
    ``utf-32-le`` reinterpretation (no per-char Python), and window
    energies come from one cumulative-sum-of-squares subtraction — the
    exact kernel shape a real int16 PCM buffer needs, so swapping in a
    real decoder changes one line."""

    def __init__(self, *, window: int = 16, hop: int = 8,
                 kernel: str = "text"):
        # kernel="text": the SQL-mirrorable sandbox decode (code points as
        # samples).  kernel="wav": REAL PCM decode of a "payload" binary
        # column via the stdlib wave module — works in this sandbox (no
        # ffmpeg needed for PCM WAV) and is pinned by a real-asset test.
        self.window = window
        self.hop = hop
        self.kernel = kernel

    @staticmethod
    def _wav_samples(payload: bytes):
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(payload)) as w:
            if w.getsampwidth() != 2:      # explicit: asserts vanish on -O
                raise ValueError(
                    f"AudioWindowStage(kernel='wav') expects 16-bit PCM, "
                    f"got sample width {w.getsampwidth()} bytes")
            raw = w.readframes(w.getnframes())
            x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            if w.getnchannels() > 1:          # mixdown: mean of channels
                x = x.reshape(-1, w.getnchannels()).mean(
                    axis=1).astype(np.int64)
            return x

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        if self.kernel == "wav":
            sources = batch["payload"].to_pylist()
        else:
            sources = batch["content"].to_pylist()
        mids = batch["message_id"].to_pylist()
        out_mid, out_idx, out_start, out_energy = [], [], [], []
        W, H = self.window, self.hop
        for mid, t in zip(mids, sources):
            if self.kernel == "wav":
                cp = self._wav_samples(t or b"")
            else:
                cp = np.frombuffer((t or "").encode("utf-32-le"),
                                   dtype=np.uint32).astype(np.int64)
            n = len(cp)
            if n < W:
                continue
            starts = np.arange(0, n - W + 1, H, dtype=np.int64)
            cs = np.concatenate(([0], np.cumsum(cp * cp)))
            energy = cs[starts + W] - cs[starts]
            out_mid.extend([mid] * len(starts))
            out_idx.extend((starts // H).tolist())
            out_start.extend(starts.tolist())
            out_energy.extend(energy.tolist())
        return pa.table({
            "message_id": pa.array(out_mid, pa.int64()),
            "window_idx": pa.array(out_idx, pa.int64()),
            "start": pa.array(out_start, pa.int64()),
            "energy": pa.array(out_energy, pa.int64()),
        })


def audio_window_pipeline(ds, *, window: int = 16, hop: int = 8,
                          concurrency: int = 2, batch_size: int = 256):
    """Corpus → per-message window energies (actor pool, small batches —
    the wide-binary-row contract of the other multimodal stages)."""
    return ds.map_batches(AudioWindowStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"window": window,
                                                 "hop": hop})


def phash_batch(batch: pa.Table, *, grid: int = 8) -> pa.Table:
    """Perceptual hash for image near-dup detection (average-hash family:
    resample to a grid, threshold at the mean, pack sign bits).  The
    sandbox stand-in 'decodes' the payload to a 1-D intensity signal (code
    points, as in AudioWindowStage); a real pipeline swaps the decode and
    2-D resample in, the threshold/pack/compare machinery is identical.

    Output (message_id, phash int64) feeds the same hamming-distance
    bucketing as stages/dedup.simhash_dedup.  Messages shorter than the
    grid emit phash 0 (degenerate-payload convention)."""
    import numpy as np

    n_cells = grid * grid
    texts = batch["content"].to_pylist()
    mids = batch["message_id"].to_pylist()
    out = np.zeros(len(texts), dtype=np.int64)
    for j, t in enumerate(texts):
        cp = np.frombuffer((t or "").encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        n = len(cp)
        if n < n_cells:
            continue
        pos = (np.arange(n_cells, dtype=np.int64) * n) // n_cells
        cells = cp[pos]
        # integer-rational threshold: bit i set iff cells[i]·K > Σcells
        # (i.e. cell > mean, exact — no float division)
        bits = (cells * n_cells) > cells.sum()
        # pack Σ bit_i·2^i mod 2^63 (keeps int64 positive; SQL mirrors the
        # identical HUGEINT sum + mod)
        out[j] = sum(int(b) << i for i, b in enumerate(bits)) % (1 << 63)
    return pa.table({
        "message_id": pa.array(mids, pa.int64()),
        "phash": pa.array(out, pa.int64()),
    })


def scene_change_batch(batch: pa.Table, *, stride: int = 5,
                       threshold: int = 96) -> pa.Table:
    """Video scene-change detection stand-in: per sampled frame a
    deterministic 'luminance' (byte 0 of sha256(payload ‖ ':' ‖ idx) — the
    SQL-mirrorable fake; a real pipeline plugs mean frame luma here), a
    boundary wherever |Δ luminance| ≥ threshold vs the previous sampled
    frame — the lag-over-ordered-frames shape every shot-segmentation
    pipeline runs.  First frame of each payload is always a boundary.

    Frame count/indices reuse the FrameSampleStage convention
    (n_frames = 1 + digest byte 2 % 120, every ``stride``-th sampled)."""
    import numpy as np

    texts = batch["content"].to_pylist()
    mids = batch["message_id"].to_pylist()
    out_mid, out_idx, out_lum, out_delta, out_scene = [], [], [], [], []
    for mid, t in zip(mids, texts):
        payload = (t or "").encode("utf-8")
        n_frames = 1 + hashlib.sha256(payload).digest()[2] % 120
        idxs = list(range(0, n_frames, stride))
        lums = np.fromiter(
            (hashlib.sha256(payload + f":{i}".encode()).digest()[0]
             for i in idxs), np.int64, len(idxs))
        delta = np.abs(np.diff(lums, prepend=lums[:1]))
        scene = (delta >= threshold).astype(np.int64)
        scene[0] = 1
        delta[0] = 0
        out_mid.extend([mid] * len(idxs))
        out_idx.extend(idxs)
        out_lum.extend(lums.tolist())
        out_delta.extend(delta.tolist())
        out_scene.extend(scene.tolist())
    return pa.table({
        "message_id": pa.array(out_mid, pa.int64()),
        "frame_idx": pa.array(out_idx, pa.int64()),
        "lum": pa.array(out_lum, pa.int64()),
        "delta": pa.array(out_delta, pa.int64()),
        "is_scene": pa.array(out_scene, pa.int64()),
    })
