"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are ``binary`` columns with a ``media_type`` tag.
Decode is REAL for uncompressed formats — PPM P6 / 24-bit BMP images,
PCM-16 WAV audio, and PPM-reel "video" (concatenated P6 frames) are
parsed with the pure-numpy codecs in ``functions/imaging.py`` — and an
explicit ``NotImplementedError`` gate marks where compressed-format
libraries (PIL/opencv/ffmpeg, absent in this container) plug in.  The
Ray-side shape is production-real either way: actor pools, small batch
sizes for wide binary rows, typed output schema.

Stages:

- :class:`DecodeStub` — payload → decode metadata (pixels/samples for
  raw formats; ``strict=True`` raises on undecodable payloads);
- :class:`MediaFeaturizer` — image payloads → REAL 8×8 grayscale
  thumbnail embedding; other payloads → hash-seeded deterministic
  stand-in for an audio/video encoder;
- :class:`ResizeStub` — REAL nearest-neighbor resize (re-encoded PPM)
  for raw images, byte-downsample stand-in otherwise;
- :class:`FrameSampler` — PPM-reel videos → every-nth REAL frame;
  unknown payloads → fixed-size byte slices (flat-map shape either
  way).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions import imaging

MEDIA_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("media_type", pa.string()),   # image | audio | video
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),
])

EMBED_DIM = 64


def _hash_vec(data: bytes, dim: int) -> np.ndarray:
    """Deterministic unit vector seeded by content bytes."""
    seed = int(hashlib.blake2b(data, digest_size=8).hexdigest(), 16)
    rng = np.random.RandomState(seed % (2 ** 32))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


class DecodeStub:
    """Actor-pool decode stage.

    Raw formats decode for real (``functions/imaging.py``): images
    report ``decoded_w``/``decoded_h`` and pixel count, WAV reports
    sample count.  Compressed/unknown payloads: ``strict=True`` raises
    ``NotImplementedError`` (the PIL/ffmpeg boundary), ``strict=False``
    falls back to byte-level metadata so downstream plumbing still runs
    end-to-end.
    """

    def __init__(self, *, strict: bool = False) -> None:
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        sizes = np.zeros(len(payloads), dtype=np.int64)
        widths = np.zeros(len(payloads), dtype=np.int32)
        heights = np.zeros(len(payloads), dtype=np.int32)
        kinds = []
        checksums = []
        for i, p in enumerate(payloads):
            p = p or b""
            checksums.append(hashlib.md5(p).hexdigest())
            kind = imaging.sniff(p)
            if kind in ("ppm", "bmp"):
                img = imaging.decode_image(p)
                heights[i], widths[i] = img.shape[:2]
                sizes[i] = img.size
            elif kind == "wav":
                samples, _rate = imaging.decode_wav_pcm16(p)
                sizes[i] = len(samples)
            else:
                if self.strict:
                    raise NotImplementedError(
                        "compressed media decode requires PIL/opencv/"
                        "ffmpeg, absent in this container; raw PPM/BMP/"
                        "WAV decode for real, or run strict=False for "
                        "byte-level metadata")
                sizes[i] = len(p)
            kinds.append(kind)
        return (batch.append_column("decoded_bytes", pa.array(sizes))
                .append_column("decoded_w", pa.array(widths))
                .append_column("decoded_h", pa.array(heights))
                .append_column("codec", pa.array(kinds, pa.string()))
                .append_column("checksum", pa.array(checksums, pa.string())))


class MediaFeaturizer:
    """payload → ``embedding`` fixed-size-list<float32> column.

    Raw images get a REAL feature: the 8×8 nearest-neighbor grayscale
    thumbnail, flattened and L2-normalized (64-dim — the classic
    perceptual-hash feature).  Non-image payloads get the hash-seeded
    deterministic stand-in for an audio/video encoder.  Shape-identical
    to a real encoder pool (state in ``__init__``, batched inference in
    ``__call__``, small ``batch_size`` because binary rows are wide)."""

    def __init__(self, *, dim: int = EMBED_DIM) -> None:
        self.dim = dim
        self.side = int(np.sqrt(dim))

    def _image_vec(self, img: np.ndarray) -> np.ndarray:
        gray = img.astype(np.float32).mean(axis=2)
        thumb = imaging.resize_nearest(
            gray[..., None], self.side, self.side)[..., 0]
        v = thumb.ravel()
        if len(v) < self.dim:
            v = np.pad(v, (0, self.dim - len(v)))
        n = np.linalg.norm(v)
        return (v / n if n else v).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        vecs = []
        for p in payloads:
            p = p or b""
            if imaging.sniff(p) in ("ppm", "bmp"):
                vecs.append(self._image_vec(imaging.decode_image(p)))
            else:
                vecs.append(_hash_vec(p, self.dim))
        mat = (np.stack(vecs) if vecs
               else np.zeros((0, self.dim), np.float32))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), self.dim)
        return batch.append_column("embedding", col)


class ResizeStub:
    """Image-resize stage.

    Raw images are resized for REAL (nearest-neighbor index striding)
    and re-encoded as PPM; undecodable payloads fall back to the
    deterministic byte downsampler (or raise with ``strict=True``).
    Actor pool + small ``batch_size`` because rows are wide."""

    def __init__(self, *, target_w: int = 64, target_h: int = 64,
                 strict: bool = False) -> None:
        self.target_w = target_w
        self.target_h = target_h
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            if imaging.sniff(p) in ("ppm", "bmp"):
                img = imaging.decode_image(p)
                out.append(imaging.encode_ppm(imaging.resize_nearest(
                    img, self.target_w, self.target_h)))
                continue
            if self.strict:
                raise NotImplementedError(
                    "compressed image resize requires PIL/opencv, absent "
                    "here; raw PPM/BMP resize for real, or strict=False "
                    "for the byte downsampler")
            target = self.target_w * self.target_h
            if len(p) <= target:
                out.append(p)
            else:
                stride = max(1, len(p) // target)
                out.append(p[::stride][:target])
        n = batch.num_rows
        return (batch.append_column("resized", pa.array(out, pa.binary()))
                .append_column("out_w", pa.array(
                    np.full(n, self.target_w, np.int32)))
                .append_column("out_h", pa.array(
                    np.full(n, self.target_h, np.int32))))


class FrameSampler:
    """"video" payload → one child row per sampled frame.

    A PPM reel (concatenated P6 frames — the uncompressed stand-in for
    a video container) is walked frame-by-frame via REAL header parses
    and every ``stride``-th frame is emitted intact; unknown payloads
    fall back to fixed-size byte slices.  Flat-map: output rows ≠
    input rows."""

    def __init__(self, *, frame_bytes: int = 256, stride: int = 4) -> None:
        self.frame_bytes = frame_bytes
        self.stride = stride

    def _reel_frames(self, p: bytes) -> list[bytes]:
        frames = []
        off = 0
        while p[off:off + 2] == b"P6":
            img = imaging.decode_ppm(p[off:])
            frame = imaging.encode_ppm(img)
            # frame length = canonical header + pixels; reel frames are
            # written canonically so this advances exactly one frame
            frames.append(frame)
            off += len(frame)
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ref, out_idx, out_frame = [], [], []
        for r, t, p in zip(refs, types, payloads):
            if t != "video" or not p:
                continue
            if p[:2] == b"P6":
                frames = self._reel_frames(p)
                for fi in range(0, len(frames), self.stride):
                    out_ref.append(r)
                    out_idx.append(fi)
                    out_frame.append(frames[fi])
                continue
            n_frames = max(1, len(p) // self.frame_bytes)
            for fi in range(0, n_frames, self.stride):
                out_ref.append(r)
                out_idx.append(fi)
                out_frame.append(
                    p[fi * self.frame_bytes:(fi + 1) * self.frame_bytes])
        return pa.table({
            "media_ref": pa.array(out_ref, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame": pa.array(out_frame, pa.binary()),
        })


class AudioSpectrogram:
    """"audio" payload → one row per STFT frame with banded
    log-power features — REAL pure-numpy DSP over the PCM-16 WAV
    decoder (no audio libs in this container, and none needed):
    frame the signal (``frame_len`` window, ``hop`` stride), Hann-
    window each frame, rFFT power spectrum, mean-pool the bins into
    ``n_bands`` log bands, and report each frame's dominant bin —
    the feature-extraction stage shape a real audio encoder pool
    (wav2vec / Whisper features) drops into.  Flat-map (rows out ≠
    rows in); the window table and band map build once per actor in
    ``__init__``, every batch is one vectorized (frames × fft) pass.

    Ref parity note: the reference has no audio path at all — this
    extends its media handling (SURVEY §2 multimodal row) with the
    decode → feature contract its `elem.py` media spans imply."""

    def __init__(self, *, frame_len: int = 256, hop: int = 128,
                 n_bands: int = 16) -> None:
        self.frame_len = frame_len
        self.hop = hop
        self.n_bands = n_bands
        self.window = np.hanning(frame_len).astype(np.float64)
        bins = frame_len // 2 + 1
        band_of = np.arange(bins) * n_bands // bins
        # band_of is non-decreasing → reduceat segment boundaries
        self.band_starts = np.searchsorted(band_of,
                                           np.arange(n_bands))
        self.band_counts = np.bincount(band_of, minlength=n_bands)

    def _frames(self, samples: np.ndarray) -> np.ndarray:
        x = samples.astype(np.float64) / 32768.0
        if len(x) < self.frame_len:
            return np.zeros((0, self.frame_len))
        n = 1 + (len(x) - self.frame_len) // self.hop
        idx = (np.arange(self.frame_len)[None, :]
               + self.hop * np.arange(n)[:, None])
        return x[idx] * self.window[None, :]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ref: list[str] = []
        out_idx: list[int] = []
        out_dom: list[int] = []
        band_rows: list[np.ndarray] = []
        for r, t, p in zip(refs, types, payloads):
            if t != "audio" or not p or imaging.sniff(p) != "wav":
                continue
            samples, _rate = imaging.decode_wav_pcm16(p)
            frames = self._frames(samples)
            if not len(frames):
                continue
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            dom = spec.argmax(axis=1)
            bands = (np.add.reduceat(spec, self.band_starts, axis=1)
                     / self.band_counts[None, :])
            logb = np.log10(bands + 1e-10).astype(np.float32)
            out_ref.extend([r] * len(frames))
            out_idx.extend(range(len(frames)))
            out_dom.extend(dom.tolist())
            band_rows.append(logb)
        mat = (np.concatenate(band_rows) if band_rows
               else np.zeros((0, self.n_bands), np.float32))
        return pa.table({
            "media_ref": pa.array(out_ref, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "dom_bin": pa.array(out_dom, pa.int64()),
            "bands": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), self.n_bands),
        })


def synth_media_table(n: int, *, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table in MEDIA_SCHEMA: REAL
    payloads — PPM images, PCM-16 WAV audio, PPM-reel video — so the
    decode stages exercise their true parse paths in tests/benchmarks."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_ref", "media_type", "payload", "width",
                            "height", "duration_ms")}
    for i in range(n):
        t = types[i % 3]
        r = np.random.RandomState(seed * 1_000_003 + i)
        if t == "image":
            w, h = int(r.randint(8, 33)), int(r.randint(8, 33))
            payload = imaging.encode_ppm(
                r.randint(0, 256, (h, w, 3)).astype(np.uint8))
            dur = 0
        elif t == "audio":
            w = h = 0
            samples = (r.standard_normal(int(r.randint(400, 1600)))
                       * 8000).astype(np.int16)
            payload = imaging.encode_wav_pcm16(samples, rate=16000)
            dur = int(len(samples) / 16)
        else:  # video: reel of small PPM frames
            w, h = 8, 8
            n_frames = int(r.randint(4, 13))
            payload = b"".join(
                imaging.encode_ppm(r.randint(0, 256, (h, w, 3))
                                   .astype(np.uint8))
                for _ in range(n_frames))
            dur = n_frames * 40
        rows["media_ref"].append(f"m://synth/{i:06d}")
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
