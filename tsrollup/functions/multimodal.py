"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels are STUBS by design (no image/audio libraries in this
environment): ``DecodeImageStage`` raises ``NotImplementedError`` unless
constructed with ``fake=True``, in which case a deterministic fake decoder
(seeded from the payload bytes) stands in so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.

Schema convention:
    payload: binary            raw encoded bytes
    media_type: string         "image/png" | "audio/wav" | ...
    meta: string (JSON)        width/height/sample_rate/...
Output adds fixed-shape feature columns (list<float32>) suitable for the ANN
operators in tsrollup.functions.ann.

Memory posture: binary payloads are large -> callers should use a SMALL
``batch_size`` (e.g. 64) and let block splitting keep blocks near the target
size; the stage never concatenates payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tsrollup.hashing import fnv1a64_bytes, mix64

FEATURE_DIM = 64


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in 'decoder': features derived from a seeded mix of
    the payload hash — stable across runs/partitions, shaped like a real
    feature extractor's output."""
    seed = fnv1a64_bytes(payload or b"")
    h = mix64(np.arange(dim, dtype=np.uint64) + np.uint64(seed))
    return ((h % np.uint64(10_000)).astype(np.float32) / 10_000.0) - 0.5


class DecodeImageStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    Real decoders (PIL/cv2) are not available here; ``fake=True`` switches in
    the deterministic fake. ``__init__`` is where a real model/codec would be
    loaded once per actor (ST1 pattern, ref core/streaming_pipeline.py:229-257).
    """

    def __init__(self, fake: bool = False, dim: int = FEATURE_DIM):
        self.dim = dim
        self.fake = fake
        if not fake:
            try:
                import PIL.Image  # noqa: F401 — probe only

                self._pil = True
            except ImportError as e:
                raise NotImplementedError(
                    "image decoding requires PIL/cv2, not present in this "
                    "environment; construct with fake=True for plumbing tests"
                ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real image decode not available here")
        payloads = t["payload"].to_pylist()
        feats = np.stack([_fake_decode(p, self.dim) for p in payloads])
        offs = pa.array(np.arange(0, (len(payloads) + 1) * self.dim, self.dim, dtype=np.int32))
        col = pa.ListArray.from_arrays(offs, pa.array(feats.reshape(-1)))
        return t.drop_columns(["payload"]).append_column("features", col)


class FrameSampleStage:
    """Video frame sampling stub: emits every ``stride``-th frame index with a
    per-frame fake feature row (flat_map shape: one input row -> many)."""

    def __init__(self, stride: int = 30, fake: bool = True, dim: int = FEATURE_DIM):
        if not fake:
            raise NotImplementedError("real video decode not available here")
        self.stride = stride
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, feats = [], [], []
        import json

        for i in range(t.num_rows):
            meta = json.loads(t["meta"][i].as_py() or "{}")
            n_frames = int(meta.get("n_frames", 0))
            payload = t["payload"][i].as_py() or b""
            for f in range(0, n_frames, self.stride):
                ids.append(t["media_id"][i].as_py())
                frame_idx.append(f)
                feats.append(_fake_decode(payload + f.to_bytes(4, "little"), self.dim))
        flat = (
            np.concatenate(feats) if feats else np.array([], dtype=np.float32)
        )
        offs = pa.array(np.arange(0, (len(ids) + 1) * self.dim, self.dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "features": pa.ListArray.from_arrays(offs, pa.array(flat)),
            }
        )


class ResizeImageStage:
    """Image resize stub: emits a deterministic ``th x tw`` thumbnail tensor
    per payload (flattened list<float32>) plus the new dimensions. A real
    implementation would decode with PIL/cv2 and interpolate; the environment
    has neither, so the fake path derives stable pixels from the payload hash
    — the Ray-side shape (small batches, per-actor setup, fixed-size output
    tensor column) is the real contract."""

    def __init__(self, th: int = 8, tw: int = 8, fake: bool = False):
        if not fake:
            try:
                import PIL.Image  # noqa: F401 — probe only
            except ImportError as e:
                raise NotImplementedError(
                    "image resize requires PIL/cv2, not present in this "
                    "environment; construct with fake=True for plumbing tests"
                ) from e
        self.th, self.tw = th, tw
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real image resize not available here")
        n_px = self.th * self.tw
        payloads = t["payload"].to_pylist()
        px = np.stack([_fake_decode(p or b"", n_px) for p in payloads])
        offs = pa.array(np.arange(0, (len(payloads) + 1) * n_px, n_px, dtype=np.int32))
        return pa.table(
            {
                "media_id": t["media_id"],
                "height": pa.array([self.th] * t.num_rows, type=pa.int32()),
                "width": pa.array([self.tw] * t.num_rows, type=pa.int32()),
                "pixels": pa.ListArray.from_arrays(offs, pa.array(px.reshape(-1))),
            }
        )


class DecodeAudioStage:
    """Audio decode + windowed-feature stub: one feature row per ``hop``
    seconds of (meta-declared) duration — the audio analog of frame sampling.
    Real codecs (soundfile/librosa) are absent; the fake path is
    deterministic per (payload, window)."""

    def __init__(self, hop_seconds: float = 1.0, fake: bool = False, dim: int = FEATURE_DIM):
        if not fake:
            try:
                import soundfile  # noqa: F401 — probe only
            except ImportError as e:
                raise NotImplementedError(
                    "audio decoding requires soundfile/librosa, not present in "
                    "this environment; construct with fake=True for plumbing tests"
                ) from e
        self.hop = hop_seconds
        self.dim = dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real audio decode not available here")
        import json

        ids, win_idx, feats = [], [], []
        for i in range(t.num_rows):
            meta = json.loads(t["meta"][i].as_py() or "{}")
            dur = float(meta.get("duration_s", 0.0))
            payload = t["payload"][i].as_py() or b""
            n_wins = max(1, int(dur // self.hop)) if dur > 0 else 1
            for w in range(n_wins):
                ids.append(t["media_id"][i].as_py())
                win_idx.append(w)
                feats.append(_fake_decode(payload + w.to_bytes(4, "little"), self.dim))
        flat = np.concatenate(feats) if feats else np.array([], dtype=np.float32)
        offs = pa.array(np.arange(0, (len(ids) + 1) * self.dim, self.dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "window_idx": pa.array(win_idx, type=pa.int32()),
                "features": pa.ListArray.from_arrays(offs, pa.array(flat)),
            }
        )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    import json

    rng = np.random.default_rng(seed)
    payloads = [bytes(rng.integers(0, 256, int(rng.integers(100, 2000)), dtype=np.uint8)) for _ in range(n)]
    metas = [
        json.dumps(
            {"n_frames": int(rng.integers(10, 120)), "w": 64, "h": 64,
             "duration_s": float(rng.integers(1, 30))}
        )
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/png"] * n),
            "meta": pa.array(metas),
        }
    )
