"""Pure-numpy codecs for UNCOMPRESSED media formats.

The container has no PIL/opencv/ffmpeg, but uncompressed formats need
no codec library — PPM (P6) and 24-bit BI_RGB BMP are header + raw
pixels, PCM-16 WAV is header + raw samples.  These give the media
stages (``stages/media.py``) a REAL decode/resize path end-to-end;
compressed formats (JPEG/PNG/MP4/...) still hit the explicit
``NotImplementedError`` gate, which is where PIL/ffmpeg plug in
outside this sandbox.

All functions are numpy-vectorized over pixels/samples — per-image
Python is limited to header parsing.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff(data: bytes) -> str:
    """→ 'ppm' | 'bmp' | 'wav' | 'unknown' by magic bytes."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ── PPM (P6, maxval 255) ────────────────────────────────────────────

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → P6 bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 bytes → (H, W, 3) uint8 (whitespace/comment-tolerant
    header)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # parse three header ints (w, h, maxval), skipping comments
    vals: list[int] = []
    i = 2
    while len(vals) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=i)
    return px.reshape(h, w, 3)


# ── BMP (uncompressed 24-bit BI_RGB) ────────────────────────────────

def decode_bmp24(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    flip = h > 0  # positive height ⇒ bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(data, np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    return img[::-1] if flip else img


def encode_bmp24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed bottom-up 24-bit BMP."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = np.ascontiguousarray(
        img[::-1, :, ::-1], dtype=np.uint8).reshape(h, w * 3)
    px = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(px), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + px


# ── WAV (PCM 16-bit) ────────────────────────────────────────────────

def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000,
                     channels: int = 1) -> bytes:
    """int16 samples → RIFF/WAVE PCM bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → (int16 samples, sample_rate)."""
    if sniff(data) != "wav":
        raise ValueError("not a WAV")
    i, rate, samples = 12, 16000, None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        sz = struct.unpack_from("<I", data, i + 4)[0]
        if cid == b"fmt ":
            audio_fmt, _ch, rate = struct.unpack_from("<HHI", data, i + 8)
            bits = struct.unpack_from("<H", data, i + 22)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 WAV supported (fmt={audio_fmt}, "
                    f"bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(data, "<i2", count=sz // 2,
                                    offset=i + 8)
        i += 8 + sz + (sz & 1)
    if samples is None:
        raise ValueError("WAV has no data chunk")
    return samples, rate


# ── ops ─────────────────────────────────────────────────────────────

def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via index striding (one fancy-index)."""
    src_h, src_w = img.shape[:2]
    yi = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xi = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[yi[:, None], xi[None, :]]


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch decode for supported still-image formats."""
    kind = sniff(data)
    if kind == "ppm":
        return decode_ppm(data)
    if kind == "bmp":
        return decode_bmp24(data)
    raise NotImplementedError(
        "compressed image formats need PIL/opencv (absent here); "
        "supported raw formats: PPM P6, 24-bit BMP")
