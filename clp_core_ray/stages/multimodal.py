"""Multimodal (image/audio/video) stages over Ray actor pools.

Media ride as opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate/duration). Decode / resize /
feature-extract / frame-sample are actor-pool map_batches stages: expensive
codec setup belongs in __init__, per-batch work in __call__, small
batch_size because rows are wide.

Codecs implemented with the standard library only (no PIL/ffmpeg in this
container): PNG (zlib inflate + scanline unfilter, 8-bit gray/RGB/RGBA),
24/32-bit BMP, and PCM WAV (the ``wave`` module). JPEG/video would need
external libraries — ``real_image_decode`` raises for those formats, and the
deterministic fake decoder remains available for schema-level tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_BATCH_SIZE = 64  # wide binary rows: keep batch × concurrency in heap

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def fake_image_decode(buf: bytes, height: int = 32, width: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder (seeded by content) for schema tests."""
    seed = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """Pure-python PNG decode (8-bit gray / RGB / RGBA, non-interlaced) →
    (h, w, 3) uint8. Spec: RFC 2083; filters 0-4 unapplied per scanline."""
    import struct
    import zlib

    if buf[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = []
    while pos + 8 <= len(buf):
        (length,), ctype = struct.unpack(">I", buf[pos:pos + 4]), buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={bit_depth}, "
                    f"color={color_type}, interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    out = np.empty((height, stride), dtype=np.uint8)
    rawa = np.frombuffer(raw, dtype=np.uint8)
    filters = rawa[:: stride + 1][:height]
    lines = np.delete(
        rawa[: height * (stride + 1)].reshape(height, stride + 1), 0, axis=1
    )
    prev = np.zeros(stride, dtype=np.uint8)
    y = 0
    while y < height:
        f = int(filters[y])
        line = lines[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-nch] → per-channel
            # prefix sum mod 256, one numpy cumsum per scanline
            acc = line.reshape(width, nch).astype(np.uint64)
            out[y] = (np.cumsum(acc, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: vector add
            out[y] = line + prev
        elif f in (3, 4):  # Average / Paeth: each output pixel depends on
            # left, up (and upleft) — an anti-diagonal wavefront computes
            # every cell of a run of same-filter rows exactly, vectorized
            # per diagonal (R+width diagonals instead of R*width*nch steps)
            r1 = y
            while r1 < height and int(filters[r1]) == f:
                r1 += 1
            nrun = r1 - y
            cur = lines[y:r1].reshape(nrun, width, nch).astype(np.int32)
            # padded grid: row 0 = previous output row, col 0 = zeros
            grid = np.zeros((nrun + 1, width + 1, nch), dtype=np.int32)
            grid[0, 1:] = prev.reshape(width, nch)
            for k in range(2, nrun + width + 1):
                lo = max(1, k - width)
                hi = min(nrun, k - 1)
                ys = np.arange(lo, hi + 1)
                xs = k - ys
                a = grid[ys, xs - 1]
                b = grid[ys - 1, xs]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = grid[ys - 1, xs - 1]
                    p = a + b - c
                    pa_ = np.abs(p - a)
                    pb = np.abs(p - b)
                    pc_ = np.abs(p - c)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                                    np.where(pb <= pc_, b, c))
                grid[ys, xs] = (cur[ys - 1, xs - 1] + pred) & 0xFF
            out[y:r1] = grid[1:, 1:].astype(np.uint8).reshape(nrun, stride)
            y = r1
            prev = out[r1 - 1]
            continue
        else:
            raise ValueError(f"bad PNG filter {f}")
        prev = out[y]
        y += 1
    img = out.reshape(height, width, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    elif nch == 4:
        img = img[:, :, :3]
    return img


def encode_png(img: np.ndarray, filter_type=0) -> bytes:
    """Minimal PNG writer (8-bit RGB) — test/fixture side.

    ``filter_type`` is one filter (0-4) for every scanline or a per-row
    sequence; forward filtering uses the original pixel values, so it is
    fully vectorized."""
    import struct
    import zlib

    h, w, _ = img.shape
    cur = img.astype(np.int32)
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    left = np.zeros_like(cur)
    left[:, 1:] = cur[:, :-1]
    upleft = np.zeros_like(cur)
    upleft[1:, 1:] = cur[:-1, :-1]
    p = left + up - upleft
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc_ = np.abs(p - upleft)
    paeth = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                     np.where(pb <= pc_, up, upleft))
    variants = [cur, cur - left, cur - up, cur - ((left + up) >> 1),
                cur - paeth]
    fts = ([int(filter_type)] * h if np.isscalar(filter_type)
           else [int(x) for x in filter_type])
    if len(fts) != h or any(ft not in (0, 1, 2, 3, 4) for ft in fts):
        raise ValueError(f"bad PNG filter spec {filter_type!r}")
    raw = b"".join(
        bytes([ft]) + (variants[ft][y] & 0xFF).astype(np.uint8).tobytes()
        for y, ft in enumerate(fts)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_bmp(buf: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP → (h, w, 3) uint8 (top-down output)."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", buf[10:14])[0]
    w, h = struct.unpack("<ii", buf[18:26])
    bpp = struct.unpack("<H", buf[28:30])[0]
    comp = struct.unpack("<I", buf[30:34])[0]
    if bpp not in (24, 32) or comp != 0:
        raise NotImplementedError(f"BMP variant unsupported (bpp={bpp})")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    img = img[:, :, 2::-1]  # BGR(A) → RGB
    return img[::-1] if flip else img


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float32 mono samples in [-1,1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        pcm = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        pcm = np.frombuffer(frames, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm, rate


def real_image_decode(buf: bytes) -> np.ndarray:
    """Dispatch by magic bytes: PNG and BMP decode natively; other formats
    (JPEG/WebP/…) need codecs absent from this container."""
    if buf[:8] == _PNG_MAGIC:
        return decode_png(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    raise NotImplementedError(
        "only PNG and BMP decode without external codecs; pass "
        "decode_fn=fake_image_decode for schema-level tests"
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


def real_audio_decode(buf: bytes) -> np.ndarray:
    """PCM samples from a WAV payload (other containers need ffmpeg)."""
    if buf[:4] == b"RIFF":
        pcm, _ = decode_wav(buf)
        return pcm
    raise NotImplementedError(
        "only PCM WAV decodes without external codecs; pass a custom decode_fn"
    )


class AudioFrameStage:
    """binary audio column → fixed-rate frame energy features (WAV codec)."""

    def __init__(self, data_col: str = "audio", n_frames: int = 16, decode_fn=None):
        self.data_col = data_col
        self.n_frames = n_frames
        self.decode_fn = decode_fn or real_audio_decode

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


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box/area resample to (out_h, out_w, c) — numpy only, exact mean over
    integer-factor boxes, index-mapped otherwise (nearest within box grid)."""
    h, w, c = img.shape
    if h % out_h == 0 and w % out_w == 0:
        return img.reshape(out_h, h // out_h, out_w, w // out_w, c) \
                  .mean(axis=(1, 3)).astype(img.dtype)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


class ImageResizeStage:
    """binary image column → resized raw pixel rows.

    Actor-pool stage: the codec (or a real model-input preprocessor) is
    bound once per actor in ``__init__``; ``__call__`` decodes, area-resizes
    to a fixed (h, w) and emits the raw pixels as fixed_size_list<uint8> —
    the layout a downstream embedder batch-matmuls over.
    """

    def __init__(self, data_col: str = "image", out_h: int = 16,
                 out_w: int = 16, decode_fn=None, out_col: str = "pixels"):
        self.data_col = data_col
        self.out_h, self.out_w = out_h, out_w
        self.decode_fn = decode_fn or real_image_decode
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        dim = self.out_h * self.out_w * 3
        out = np.empty((len(bufs), dim), dtype=np.uint8)
        for i, buf in enumerate(bufs):  # codec loop: per-item by nature
            img = self.decode_fn(buf)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[2] == 4:
                img = img[:, :, :3]
            out[i] = resize_area(img, self.out_h, self.out_w).reshape(-1)
        return batch.drop_columns([self.data_col]).append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), dim),
        )


# ---------------------------------------------------------------------------
# video: deterministic raw container + frame sampling
# ---------------------------------------------------------------------------

RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → RAWV container bytes (test/fixture format —
    real codecs need ffmpeg, which this sandbox doesn't ship)."""
    n, h, w, c = frames.shape
    if c != 3 or frames.dtype != np.uint8:
        raise ValueError("RAWV holds (n, h, w, 3) uint8 frames")
    import struct

    return RAWV_MAGIC + struct.pack("<IIII", n, h, w, c) + frames.tobytes()


def decode_rawv(buf: bytes) -> np.ndarray:
    if buf[:4] != RAWV_MAGIC:
        raise NotImplementedError(
            "only the RAWV raw-frame container decodes without ffmpeg; "
            "pass a custom decode_fn for real codecs"
        )
    import struct

    n, h, w, c = struct.unpack("<IIII", buf[4:20])
    return np.frombuffer(buf[20:20 + n * h * w * c],
                         dtype=np.uint8).reshape(n, h, w, c)


class VideoFrameSampleStage:
    """binary video column → one row per SAMPLED frame (every k-th, capped).

    The fan-out stage of a video pipeline: a row with an m-frame payload
    becomes ceil(m/stride) frame rows (video_id, frame_idx, frame bytes as
    PNG), each small enough for the downstream image stages — decode once
    per actor-held codec, emit rows the streaming executor can rebalance.
    """

    def __init__(self, data_col: str = "video", id_col: str = "video_id",
                 stride: int = 5, max_frames: int = 16, decode_fn=None):
        self.data_col = data_col
        self.id_col = id_col
        self.stride = stride
        self.max_frames = max_frames
        self.decode_fn = decode_fn or decode_rawv

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, png_out = [], [], []
        ids = batch.column(self.id_col).to_pylist()
        for vid, buf in zip(ids, batch.column(self.data_col).to_pylist()):
            frames = self.decode_fn(buf)
            take = np.arange(0, len(frames), self.stride)[: self.max_frames]
            for fi in take:
                ids_out.append(vid)
                idx_out.append(int(fi))
                png_out.append(encode_png(frames[fi]))
        return pa.table({
            self.id_col: pa.array(ids_out, type=pa.int64()),
            "frame_idx": pa.array(idx_out, type=pa.int64()),
            "image": pa.array(png_out, type=pa.binary()),
        })


def sample_video_frames(ds, concurrency=(1, 4), **stage_kwargs):
    """Video → sampled frame rows (actor pool, small batches: payloads are
    the widest rows in the system)."""
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=max(MEDIA_BATCH_SIZE // 8, 4),
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_images(ds, concurrency=(1, 4), **stage_kwargs):
    """Attach fixed-size raw pixels with the actor-pool layout."""
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# audio spectrogram + image channel statistics
# ---------------------------------------------------------------------------


def stft_magnitude(pcm: np.ndarray, n_fft: int = 256,
                   hop: int = 128) -> np.ndarray:
    """Hann-windowed STFT magnitude, shape (n_frames, n_fft//2 + 1).

    Pure numpy (rfft over a strided frame view) — the deterministic core a
    real mel/feature extractor would wrap; no external codec needed."""
    if len(pcm) < n_fft:
        pcm = np.pad(pcm, (0, n_fft - len(pcm)))
    n_frames = 1 + (len(pcm) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = pcm[idx] * np.hanning(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=1)).astype(np.float32)


class SpectrogramStage:
    """binary audio column → pooled log-spectrogram features.

    Actor-pool stage (codec bound in ``__init__``): WAV → STFT magnitude →
    mean-pool time into ``n_frames`` slots and frequency into ``n_bands``
    bands → log1p. Output is fixed_size_list<float32> of n_frames×n_bands,
    the fixed-shape layout a downstream audio embedder batches over.
    """

    def __init__(self, data_col: str = "audio", n_fft: int = 256,
                 hop: int = 128, n_frames: int = 8, n_bands: int = 16,
                 decode_fn=None, out_col: str = "spectrogram"):
        self.data_col = data_col
        self.n_fft, self.hop = n_fft, hop
        self.n_frames, self.n_bands = n_frames, n_bands
        self.decode_fn = decode_fn or real_audio_decode
        self.out_col = out_col

    def _pool(self, mag: np.ndarray) -> np.ndarray:
        t_idx = np.linspace(0, mag.shape[0], self.n_frames + 1).astype(int)
        f_idx = np.linspace(0, mag.shape[1], self.n_bands + 1).astype(int)
        out = np.empty((self.n_frames, self.n_bands), dtype=np.float32)
        for ti in range(self.n_frames):
            seg = mag[t_idx[ti]:max(t_idx[ti + 1], t_idx[ti] + 1)]
            for fi in range(self.n_bands):
                out[ti, fi] = seg[:, f_idx[fi]:max(f_idx[fi + 1],
                                                   f_idx[fi] + 1)].mean()
        return np.log1p(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        dim = self.n_frames * self.n_bands
        out = np.empty((len(bufs), dim), dtype=np.float32)
        for i, buf in enumerate(bufs):  # codec loop: per-item by nature
            pcm = self.decode_fn(buf)
            out[i] = self._pool(
                stft_magnitude(pcm, self.n_fft, self.hop)).reshape(-1)
        return batch.drop_columns([self.data_col]).append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), dim))


class ImageStatsStage:
    """binary image column → per-channel mean/std + 8-bin luma histogram.

    The cheap quality-screen features an image-curation pipeline filters on
    (black/blank frames, low-contrast scans) before paying for an embedding.
    """

    def __init__(self, data_col: str = "image", decode_fn=None):
        self.data_col = data_col
        self.decode_fn = decode_fn or real_image_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        n = len(bufs)
        mean = np.empty((n, 3), dtype=np.float32)
        std = np.empty((n, 3), dtype=np.float32)
        hist = np.empty((n, 8), dtype=np.float32)
        for i, buf in enumerate(bufs):  # codec loop: per-item by nature
            img = self.decode_fn(buf)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            px = img[:, :, :3].reshape(-1, 3).astype(np.float32)
            mean[i] = px.mean(axis=0)
            std[i] = px.std(axis=0)
            luma = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
            h, _ = np.histogram(luma, bins=8, range=(0.0, 256.0))
            hist[i] = h / max(len(luma), 1)
        out = batch.drop_columns([self.data_col])
        out = out.append_column("chan_mean", pa.FixedSizeListArray.from_arrays(
            pa.array(mean.reshape(-1)), 3))
        out = out.append_column("chan_std", pa.FixedSizeListArray.from_arrays(
            pa.array(std.reshape(-1)), 3))
        return out.append_column("luma_hist", pa.FixedSizeListArray.from_arrays(
            pa.array(hist.reshape(-1)), 8))


def audio_spectrograms(ds, concurrency=(1, 4), **stage_kwargs):
    """Attach pooled spectrogram features (actor-pool, wide-row batch size)."""
    return ds.map_batches(
        SpectrogramStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def image_stats(ds, concurrency=(1, 4), **stage_kwargs):
    """Attach per-channel stats + luma histogram (actor-pool stage)."""
    return ds.map_batches(
        ImageStatsStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


class AudioStatsStage:
    """binary WAV column → duration, RMS loudness, peak, silence ratio,
    clipping ratio — the cheap screens an audio-curation pipeline filters
    on (dead mics, near-silence, clipped takes) before paying for
    transcription or embeddings.

    Actor-pool stage: nothing heavier than the stdlib codec here, but the
    shape matches the other media stages (decode bound per actor in
    __init__, wide-row batch size) so a real loudness model drops in.
    """

    def __init__(self, data_col: str = "audio", decode_fn=None,
                 silence_db: float = -40.0):
        self.data_col = data_col
        self.decode_fn = decode_fn or decode_wav
        self.silence_amp = 10.0 ** (silence_db / 20.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        n = len(bufs)
        dur = np.empty(n, dtype=np.float32)
        rms = np.empty(n, dtype=np.float32)
        peak = np.empty(n, dtype=np.float32)
        silence = np.empty(n, dtype=np.float32)
        clip = np.empty(n, dtype=np.float32)
        for i, buf in enumerate(bufs):  # codec loop: per-item by nature
            pcm, rate = self.decode_fn(buf)
            m = max(len(pcm), 1)
            a = np.abs(pcm)
            dur[i] = len(pcm) / max(rate, 1)
            rms[i] = float(np.sqrt(np.mean(pcm * pcm))) if len(pcm) else 0.0
            peak[i] = float(a.max()) if len(pcm) else 0.0
            silence[i] = float((a < self.silence_amp).sum()) / m
            clip[i] = float((a >= 0.999).sum()) / m
        out = batch.drop_columns([self.data_col])
        for name, arr in (("duration_s", dur), ("rms", rms), ("peak", peak),
                          ("silence_ratio", silence), ("clip_ratio", clip)):
            out = out.append_column(name, pa.array(arr))
        return out


def audio_stats(ds, concurrency=(1, 4), **stage_kwargs):
    """Attach loudness/silence/clipping screens (actor-pool stage)."""
    return ds.map_batches(
        AudioStatsStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def dhash64(img: np.ndarray) -> np.uint64:
    """64-bit difference hash (dHash): grayscale → area-resample to 8×9 →
    sign of the horizontal gradient, row-major bit order. Robust to
    resizing/re-encoding/mild noise; hamming distance ≈ perceptual
    distance, so near-dup detection is a hamming-ball join."""
    gray = img.astype(np.float64).mean(axis=2, keepdims=True)
    small = resize_area(gray, 8, 9)[:, :, 0]
    bits = (small[:, 1:] < small[:, :-1]).reshape(-1)
    return np.uint64(np.packbits(bits).view(">u8")[0])


class PerceptualHashStage:
    """binary image column → 64-bit dHash signature rows.

    Actor-pool stage (codec bound once per actor in ``__init__``); the
    output (id, sig) feeds ``dedup.hamming_ball_pairs`` — the
    image-near-dup pipeline: decode → dHash → pigeonhole hamming join.
    """

    def __init__(self, data_col: str = "image", decode_fn=None,
                 out_col: str = "sig"):
        self.data_col = data_col
        self.decode_fn = decode_fn or real_image_decode
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.data_col).to_pylist()
        sigs = np.empty(len(bufs), dtype=np.uint64)
        for i, buf in enumerate(bufs):  # codec loop: decoding is per-item
            sigs[i] = dhash64(self.decode_fn(buf))
        out = batch.drop_columns([self.data_col])
        return out.append_column(
            self.out_col, pa.array(sigs.view(np.int64), type=pa.int64()))


def image_near_dup_pairs(ds, *, id_col: str = "img_id",
                         data_col: str = "image", max_hamming: int = 6,
                         concurrency=(1, 4), **stage_kwargs):
    """End-to-end image near-dup detection: per-actor codec decode →
    64-bit dHash → exact hamming-ball pair join (pigeonhole multi-index,
    recall 1.0 within the radius). Returns (id_a, id_b) pairs. The hash
    stage streams (8 B/image leaves the decode stage); the join is the
    same bounded-band machinery as SimHash text dedup."""
    from clp_core_ray.functions.dedup import hamming_ball_pairs

    sigs = ds.map_batches(
        PerceptualHashStage,
        fn_constructor_kwargs={"data_col": data_col, **stage_kwargs},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
    return hamming_ball_pairs(sigs, sig_col="sig", id_col=id_col,
                              max_hamming=max_hamming)


class AudioFingerprintStage:
    """binary WAV column → (id, fp) landmark-fingerprint rows (Shazam-lite).

    Actor-pool stage: decode → STFT → per-frame peak frequency bin →
    landmark hash over ``k`` consecutive peaks (peak sequence packed into
    one int64). Emits ONE ROW PER LANDMARK (id, fp) — the relation shape
    ``functions.graph.cooccurrence_pairs`` consumes directly, so duplicate
    detection is fingerprint-bucket pair counting, never a clip×clip scan.
    Peak-bin quantization (``bin_shift``) absorbs mild noise/level changes.
    """

    def __init__(self, data_col: str = "audio", id_col: str = "clip_id",
                 n_fft: int = 256, hop: int = 128, k: int = 4,
                 bin_shift: int = 2):
        self.data_col = data_col
        self.id_col = id_col
        self.n_fft, self.hop, self.k = n_fft, hop, k
        self.bin_shift = bin_shift

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, fps_out = [], []
        ids = batch.column(self.id_col).to_pylist()
        for cid, buf in zip(ids, batch.column(self.data_col).to_pylist()):
            pcm = real_audio_decode(buf)  # codec loop: per-item by nature
            mag = stft_magnitude(pcm, self.n_fft, self.hop)
            peaks = (mag.argmax(axis=1) >> self.bin_shift).astype(np.uint64)
            if len(peaks) < self.k:
                continue
            # pack k consecutive quantized peaks into one 64-bit landmark
            win = np.lib.stride_tricks.sliding_window_view(peaks, self.k)
            fp = np.zeros(len(win), dtype=np.uint64)
            for j in range(self.k):
                fp = (fp << np.uint64(8)) | (win[:, j] & np.uint64(0xFF))
            fp = np.unique(fp)
            ids_out.append(np.full(len(fp), cid, dtype=np.int64))
            fps_out.append(fp.view(np.int64))
        if not ids_out:
            return pa.table({self.id_col: pa.array([], type=pa.int64()),
                             "fp": pa.array([], type=pa.int64())})
        return pa.table({self.id_col: pa.array(np.concatenate(ids_out)),
                         "fp": pa.array(np.concatenate(fps_out))})


def audio_dup_pairs(ds, *, id_col: str = "clip_id", data_col: str = "audio",
                    min_matches: int = 5, concurrency=(1, 4),
                    **stage_kwargs):
    """End-to-end duplicate/overlap audio detection: per-actor WAV decode →
    landmark fingerprints → fingerprint-bucket pair counting (the
    market-basket kernel with fp as the basket) → pairs sharing ≥
    ``min_matches`` landmarks. Returns (item_a, item_b, cnt)."""
    import pyarrow.compute as pc

    from clp_core_ray.functions.graph import cooccurrence_pairs

    fps = ds.map_batches(
        AudioFingerprintStage,
        fn_constructor_kwargs={"data_col": data_col, "id_col": id_col,
                               **stage_kwargs},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )
    pairs = cooccurrence_pairs(fps, basket_col="fp", item_col=id_col)
    return pairs.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("cnt"), min_matches)),
        batch_format="pyarrow")


class SceneChangeStage:
    """binary video column → one row per detected scene boundary.

    Actor-pool stage (codec in ``__init__``): decode → per-frame mean
    absolute pixel delta to the previous frame (one vectorized diff over
    the whole frame tensor) → boundaries where the delta exceeds
    ``threshold``. Emits (video_id, frame_idx, delta) — the shot-boundary
    table a video curation pipeline samples keyframes from.
    """

    def __init__(self, data_col: str = "video", id_col: str = "video_id",
                 threshold: float = 12.0, decode_fn=None):
        self.data_col = data_col
        self.id_col = id_col
        self.threshold = threshold
        self.decode_fn = decode_fn or decode_rawv

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, d_out = [], [], []
        ids = batch.column(self.id_col).to_pylist()
        for vid, buf in zip(ids, batch.column(self.data_col).to_pylist()):
            frames = self.decode_fn(buf).astype(np.float32)
            if len(frames) < 2:
                continue
            delta = np.abs(frames[1:] - frames[:-1]).mean(axis=(1, 2, 3))
            for fi in np.flatnonzero(delta > self.threshold):
                ids_out.append(vid)
                idx_out.append(int(fi) + 1)
                d_out.append(float(delta[fi]))
        return pa.table({
            self.id_col: pa.array(ids_out, type=pa.int64()),
            "frame_idx": pa.array(idx_out, type=pa.int64()),
            "delta": pa.array(d_out, type=pa.float64()),
        })


def detect_scene_changes(ds, concurrency=(1, 4), **stage_kwargs):
    """Video → scene-boundary rows (actor pool, small batches)."""
    return ds.map_batches(
        SceneChangeStage,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=max(MEDIA_BATCH_SIZE // 8, 4),
        concurrency=concurrency,
        num_cpus=1,
    )
