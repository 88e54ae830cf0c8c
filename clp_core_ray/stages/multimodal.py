"""Multimodal (image/audio/video) stages: real Ray plumbing, stubbed codecs.

Media ride as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate/duration). Decode / resize /
feature-extract / frame-sample are actor-pool map_batches stages: expensive
codec setup belongs in __init__, per-batch work in __call__, small
batch_size because rows are wide.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is pluggable: the default raises NotImplementedError; tests and
the demo use the deterministic fake decoder (bytes-hash-seeded arrays), which
exercises the full schema/batch/actor path end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_BATCH_SIZE = 64  # wide binary rows: keep batch × concurrency in heap


def fake_image_decode(buf: bytes, height: int = 32, width: int = 32) -> np.ndarray:
    """Deterministic stand-in for a real image decoder (seeded by content)."""
    seed = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def real_image_decode(buf: bytes) -> np.ndarray:
    """Real decoder — requires an imaging library not present in this env."""
    raise NotImplementedError(
        "image codec not available in this environment; pass "
        "decode_fn=fake_image_decode or install an imaging library"
    )


class ImageDecodeStage:
    """binary image column → fixed-size float feature rows.

    Emits mean-pooled 8x8x3 patch features as list<float> (192 dims): the
    layout a CLIP/ViT embedder would slot into — swap ``decode_fn`` and
    ``featurize`` for real models loaded in __init__.
    """

    def __init__(self, data_col: str = "image", decode_fn=None, out_col: str = "features"):
        self.data_col = data_col
        self.decode_fn = decode_fn or real_image_decode
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        feats = np.empty((len(bufs), 192), dtype=np.float32)
        for i, buf in enumerate(bufs):  # codec loop: decoding is per-item by nature
            img = self.decode_fn(buf)
            h, w, c = img.shape
            patch = img[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8, c)
            feats[i] = patch.mean(axis=(1, 3)).reshape(-1) / 255.0
        out = batch.drop_columns([self.data_col])
        return out.append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), 192),
        )


class AudioFrameStage:
    """binary audio column → fixed-rate frame energy features (stubbed codec)."""

    def __init__(self, data_col: str = "audio", n_frames: int = 16, decode_fn=None):
        self.data_col = data_col
        self.n_frames = n_frames
        self.decode_fn = decode_fn or self._fake_pcm

    @staticmethod
    def _fake_pcm(buf: bytes) -> np.ndarray:
        seed = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
        return np.random.default_rng(seed).normal(size=16000).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        out = np.empty((len(bufs), self.n_frames), dtype=np.float32)
        for i, buf in enumerate(bufs):
            pcm = self.decode_fn(buf)
            frames = np.array_split(pcm, self.n_frames)
            out[i] = [float(np.sqrt((f ** 2).mean())) for f in frames]
        return batch.drop_columns([self.data_col]).append_column(
            "frame_energy",
            pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), self.n_frames),
        )


def decode_images(ds, concurrency=(1, 4), **stage_kwargs):
    """Attach image features with the actor-pool layout sized for wide rows."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
