"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels run in one of two modes:

- **real** (default): the optional codec library (PIL for images, soundfile
  for audio, cv2 for video) is probed ONCE per actor in ``__init__`` — the
  ST1 load-once pattern (ref core/streaming_pipeline.py:229-257). If the
  library is absent (as in this sandbox — verified: ``import PIL`` fails),
  construction raises ``NotImplementedError`` with a pointer to the fake
  path. The day the environment gains the library, ``fake=False`` works
  with no code change; skip-marked tests in tests/test_functions.py run
  the real path whenever the import succeeds.
- **fake=True**: a deterministic stand-in decoder (seeded from the payload
  bytes) so the Ray-side plumbing — schema, batch sizing, actor signature,
  output layout — is real and tested in any environment.

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


def _fit_dim(v: np.ndarray, dim: int) -> np.ndarray:
    """Pad (cycle) or truncate a 1-D float vector to exactly ``dim``."""
    v = np.asarray(v, dtype=np.float32).ravel()
    if len(v) == 0:
        return np.zeros(dim, dtype=np.float32)
    if len(v) >= dim:
        return v[:dim]
    reps = -(-dim // len(v))
    return np.tile(v, reps)[:dim]


def _probe(module: str, hint: str):
    """Import the optional codec module or raise the documented guard."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise NotImplementedError(
            f"{hint} requires {module}, not present in this environment; "
            "construct with fake=True for plumbing tests"
        ) from e


def _feature_table(t: pa.Table, feats: np.ndarray, dim: int) -> pa.Table:
    offs = pa.array(np.arange(0, (t.num_rows + 1) * dim, dim, dtype=np.int32))
    col = pa.ListArray.from_arrays(offs, pa.array(feats.reshape(-1)))
    return t.drop_columns(["payload"]).append_column("features", col)


class DecodeImageStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    Real path (PIL present): decode -> grayscale -> 8x8 thumbnail ->
    intensity vector in [-0.5, 0.5], fit to ``dim``. Deterministic, no
    model weights, so the output is reproducible anywhere PIL exists."""

    def __init__(self, fake: bool = False, dim: int = FEATURE_DIM):
        self.dim = dim
        self.fake = fake
        if not fake:
            self._pil = _probe("PIL.Image", "image decoding")

    def _decode_real(self, payload: bytes) -> np.ndarray:
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        px = np.asarray(img, dtype=np.float32) / 255.0 - 0.5
        return _fit_dim(px, self.dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        dec = _fake_decode if self.fake else self._decode_real
        args = (self.dim,) if self.fake else ()
        feats = (
            np.stack([dec(p or b"", *args) for p in payloads])
            if payloads
            else np.zeros((0, self.dim), np.float32)
        )
        return _feature_table(t, feats, self.dim)


class FrameSampleStage:
    """Video frame sampling: emits every ``stride``-th frame with a per-frame
    feature row (flat_map shape: one input row -> many).

    Real path (cv2 present): the payload is spooled to a temp file (OpenCV
    has no bytes-reader), every ``stride``-th frame is grabbed, grayscale
    8x8-pooled into the feature vector. Fake path derives the frame count
    from the JSON meta."""

    def __init__(self, stride: int = 30, fake: bool = False, dim: int = FEATURE_DIM):
        self.stride = stride
        self.dim = dim
        self.fake = fake
        if not fake:
            self._cv2 = _probe("cv2", "video decoding")

    def _frames_real(self, payload: bytes):
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            f.write(payload)
            path = f.name
        try:
            cap = self._cv2.VideoCapture(path)
            idx = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % self.stride == 0:
                    g = self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2GRAY)
                    small = self._cv2.resize(g, (8, 8)).astype(np.float32)
                    yield idx, _fit_dim(small / 255.0 - 0.5, self.dim)
                idx += 1
            cap.release()
        finally:
            os.unlink(path)

    def __call__(self, t: pa.Table) -> pa.Table:
        import json

        ids, frame_idx, feats = [], [], []
        for i in range(t.num_rows):
            payload = t["payload"][i].as_py() or b""
            mid = t["media_id"][i].as_py()
            if self.fake:
                meta = json.loads(t["meta"][i].as_py() or "{}")
                for f in range(0, int(meta.get("n_frames", 0)), self.stride):
                    ids.append(mid)
                    frame_idx.append(f)
                    feats.append(_fake_decode(payload + f.to_bytes(4, "little"), self.dim))
            else:
                for f, vec in self._frames_real(payload):
                    ids.append(mid)
                    frame_idx.append(f)
                    feats.append(vec)
        flat = np.concatenate(feats) if feats else np.array([], dtype=np.float32)
        offs = pa.array(np.arange(0, (len(ids) + 1) * self.dim, self.dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "features": pa.ListArray.from_arrays(offs, pa.array(flat)),
            }
        )


class ResizeImageStage:
    """Image resize: emits a ``th x tw`` grayscale thumbnail tensor per
    payload (flattened list<float32> in [0, 1]) plus the new dimensions.
    Real path decodes with PIL and bilinear-resizes; fake path derives
    stable pixels from the payload hash."""

    def __init__(self, th: int = 8, tw: int = 8, fake: bool = False):
        self.th, self.tw = th, tw
        self.fake = fake
        if not fake:
            self._pil = _probe("PIL.Image", "image resize")

    def _resize_real(self, payload: bytes) -> np.ndarray:
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L").resize((self.tw, self.th))
        return np.asarray(img, dtype=np.float32).ravel() / 255.0

    def __call__(self, t: pa.Table) -> pa.Table:
        n_px = self.th * self.tw
        payloads = t["payload"].to_pylist()
        if self.fake:
            px = np.stack([_fake_decode(p or b"", n_px) for p in payloads])
        else:
            px = (
                np.stack([self._resize_real(p or b"") for p in payloads])
                if payloads
                else np.zeros((0, n_px), np.float32)
            )
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
    """Audio decode + windowed features: one feature row per ``hop`` seconds
    — the audio analog of frame sampling.

    Real path (soundfile present): decode to mono float samples, split into
    hop-second windows, each window's feature = ``dim`` RFFT magnitude bins
    (log1p-compressed). Fake path derives the window count from the
    meta-declared duration."""

    def __init__(self, hop_seconds: float = 1.0, fake: bool = False, dim: int = FEATURE_DIM):
        self.hop = hop_seconds
        self.dim = dim
        self.fake = fake
        if not fake:
            self._sf = _probe("soundfile", "audio decoding")

    def _windows_real(self, payload: bytes):
        import io

        samples, rate = self._sf.read(io.BytesIO(payload), dtype="float32")
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        hop_n = max(1, int(self.hop * rate))
        n_wins = max(1, -(-len(samples) // hop_n))
        for w in range(n_wins):
            win = samples[w * hop_n : (w + 1) * hop_n]
            mag = np.abs(np.fft.rfft(win, n=2 * self.dim))[: self.dim]
            yield w, _fit_dim(np.log1p(mag), self.dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        import json

        ids, win_idx, feats = [], [], []
        for i in range(t.num_rows):
            payload = t["payload"][i].as_py() or b""
            mid = t["media_id"][i].as_py()
            if self.fake:
                meta = json.loads(t["meta"][i].as_py() or "{}")
                dur = float(meta.get("duration_s", 0.0))
                n_wins = max(1, int(dur // self.hop)) if dur > 0 else 1
                for w in range(n_wins):
                    ids.append(mid)
                    win_idx.append(w)
                    feats.append(_fake_decode(payload + w.to_bytes(4, "little"), self.dim))
            else:
                for w, vec in self._windows_real(payload):
                    ids.append(mid)
                    win_idx.append(w)
                    feats.append(vec)
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
