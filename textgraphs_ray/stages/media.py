"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as opaque ``binary`` columns with a
``media_type`` tag.  The decode kernels themselves are STUBS (the
decoding libraries are not in this container): ``DecodeStub`` raises
``NotImplementedError`` for real media types unless a deterministic
fake decoder is registered — but the Ray-side plumbing is real and
tested: schema, actor-pool signatures, small batch sizes for large
binary rows, feature/embedding output layout.

Stages:

- :class:`DecodeStub` — payload → decoded feature dict (stub);
- :class:`MediaFeaturizer` — decoded payload → fixed-dim embedding
  (hash-seeded deterministic fake of a vision/audio encoder);
- :class:`FrameSampler` — "video" payloads → every-nth-frame child rows
  (flat-map shape; frames are fixed-size byte slices in the stub).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
    """Actor-pool decode stage.  STUB: real decode (PIL/ffmpeg/librosa)
    is unavailable here; ``strict=True`` raises NotImplementedError to
    mark the boundary, ``strict=False`` emits deterministic fake
    features so downstream plumbing is exercised end-to-end."""

    def __init__(self, *, strict: bool = False) -> None:
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present "
                "in this container; run with strict=False for the "
                "deterministic fake decoder")
        payloads = batch.column("payload").to_pylist()
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        checksums = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        return (batch.append_column("decoded_bytes", pa.array(sizes))
                .append_column("checksum", pa.array(checksums, pa.string())))


class MediaFeaturizer:
    """payload → ``embedding`` fixed-size-list<float32> column.

    Shape-identical to a real encoder pool (model in ``__init__``,
    batched inference in ``__call__``, small ``batch_size`` because
    binary rows are wide)."""

    def __init__(self, *, dim: int = EMBED_DIM) -> None:
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mat = np.stack([_hash_vec(p or b"", self.dim) for p in payloads]) \
            if payloads else np.zeros((0, self.dim), np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), self.dim)
        return batch.append_column("embedding", col)


class ResizeStub:
    """Image-resize stage.  STUB: a real implementation calls
    PIL/opencv inside ``__call__``; here the "resize" is a
    deterministic byte-level downsample to ``target_bytes`` (stride
    slicing) with the real Ray-side contract — output schema adds
    (``resized``, binary) + (``out_w``, ``out_h``, int32), small
    ``batch_size`` because rows are wide, actor pool because a real
    resizer holds codec state."""

    def __init__(self, *, target_w: int = 64, target_h: int = 64,
                 strict: bool = False) -> None:
        self.target_w = target_w
        self.target_h = target_h
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image resize requires PIL/opencv, absent here; "
                "strict=False runs the deterministic byte downsampler")
        target = self.target_w * self.target_h
        out = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
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
    """"video" payload → one child row per sampled frame (every
    ``stride``-th fixed-size slice in the stub; a real decoder would
    seek keyframes).  Flat-map: output rows ≠ input rows."""

    def __init__(self, *, frame_bytes: int = 256, stride: int = 4) -> None:
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ref, out_idx, out_frame = [], [], []
        for r, t, p in zip(refs, types, payloads):
            if t != "video" or not p:
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


def synth_media_table(n: int, *, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table in MEDIA_SCHEMA (for tests
    and benchmarks; payload bytes are hash-seeded)."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_ref", "media_type", "payload", "width",
                            "height", "duration_ms")}
    for i in range(n):
        t = types[i % 3]
        payload = hashlib.blake2b(f"media-{seed}-{i}".encode(),
                                  digest_size=32).digest() * (8 + i % 5)
        rows["media_ref"].append(f"m://synth/{i:06d}")
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["width"].append(int(rng.randint(64, 1024)) if t == "image" else 0)
        rows["height"].append(int(rng.randint(64, 1024)) if t == "image" else 0)
        rows["duration_ms"].append(
            int(rng.randint(1000, 60000)) if t != "image" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
