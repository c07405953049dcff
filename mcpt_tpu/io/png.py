"""First-party PNG codec (stdlib zlib + numpy).

Replaces the *capability* of the reference's vendored lodepng
(`src/lodepng.{h,cpp}`, used at `src/Renderer.cpp:104` for output and
`src/Scene.hpp:41` for env-map decode). Supports what the renderer needs:

- encode: 8-bit RGB / RGBA / grayscale, non-interlaced, filter 0 per scanline.
- decode: 8-bit and 16-bit gray / RGB / palette / gray+alpha / RGBA,
  non-interlaced, all five filter types. 16-bit is narrowed to 8.

The hot rows (filters 0 and 2, which dominate real files) are unfiltered fully
vectorized; filters 1/3/4 need the left-neighbor recurrence and fall back to a
per-row carry loop on the byte stride.
"""

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path, image: np.ndarray, compress_level: int = 6) -> None:
    """Write an 8-bit PNG. ``image`` is (H,W), (H,W,1), (H,W,3) or (H,W,4) uint8."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        raise ValueError(f"write_png expects uint8, got {img.dtype}")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # Filter byte 0 (None) prepended to every scanline.
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    with open(path, "wb") as f:
        f.write(_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> None:
    """In-place Paeth unfilter of one scanline (int16 working row)."""
    n = cur.shape[0]
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        cur[i] = (cur[i] + pred) & 0xFF


def read_png(path):
    """Decode a PNG to uint8 (H,W,C). Palette is expanded, 16-bit narrowed."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG file")
    pos = 8
    ihdr = None
    idat = []
    palette = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError(f"{path}: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if interlace != 0:
        raise ValueError(f"{path}: interlaced PNG not supported")
    if depth not in (8, 16):
        raise ValueError(f"{path}: bit depth {depth} not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    nbytes = depth // 8
    bpp = channels * nbytes
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError(f"{path}: bad decompressed size {raw.size}")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = int(filters[y])
        cur = rows[y].copy()
        prev = out[y - 1].astype(np.int16) if y > 0 else zero
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub: per-stride-position cumulative sum mod 256
            cur = cur.reshape(-1, bpp).cumsum(axis=0, dtype=np.int64) % 256
            cur = cur.reshape(stride).astype(np.int16)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            _paeth_row(cur, prev, bpp)
        else:
            raise ValueError(f"{path}: bad filter {ftype} on row {y}")
        out[y] = cur.astype(np.uint8)
    img = out.reshape(h, w, bpp)
    if depth == 16:
        img = img.reshape(h, w, channels, 2)[:, :, :, 0]  # keep high byte
    else:
        img = img.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError(f"{path}: palette image without PLTE")
        idx = img[:, :, 0]
        img = palette[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: trns.size] = trns
            img = np.concatenate([img, alpha[idx][:, :, None]], axis=2)
    return img
