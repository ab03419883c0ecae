"""Pure-stdlib PNG codec: zlib inflate + per-scanline unfilter (+ the
inverse for the fixture encoder). No PIL/OpenCV — the container has
neither and pip installs are unavailable, yet PNG is just DEFLATE plus
five scanline filters, so a real in-container decode path is feasible
with stdlib ``zlib`` + numpy alone.

Reference analog: ``mmocr/datasets/pipelines/loading.py:84-184``
(LoadImageFromFile materializes pixel arrays via mmcv/cv2); this module
is the engine's clean-room decode for the one format the sandbox can
decode end-to-end. PIL keeps priority in
``operators/multimodal.decode_payload`` when present; this kernel is
the real branch that runs where PIL is absent.

Supported: 8/16-bit greyscale (0), truecolor (2), palette (3, 1/2/4/8
bit), grey+alpha (4), RGBA (6); 1/2/4-bit greyscale; Adam7 interlace;
filters 0-4 (None/Sub/Up/Average/Paeth). Ancillary chunks are skipped.
Luma uses PIL's integer ITU-R 601 formula ((299R + 587G + 114B) //
1000) so the stdlib and PIL paths agree byte-for-byte on 8-bit images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass grids: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering: raw = height * (1 + stride) filter
    bytes + data, output = height * stride recovered bytes."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        line = raw[pos:pos + stride]
        pos += stride
        o = y * stride
        prev_o = o - stride
        if ft == 0:
            out[o:o + stride] = line
        elif ft == 1:                      # Sub
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif ft == 2:                      # Up
            if y == 0:
                out[o:o + stride] = line
            else:
                up = np.frombuffer(bytes(out[prev_o:prev_o + stride]),
                                   dtype=np.uint8)
                cur = np.frombuffer(line, dtype=np.uint8)
                out[o:o + stride] = (cur + up).astype(np.uint8).tobytes()
        elif ft == 3:                      # Average
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[prev_o + x] if y > 0 else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif ft == 4:                      # Paeth
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[prev_o + x] if y > 0 else 0
                ul = out[prev_o + x - bpp] if (y > 0 and x >= bpp) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} at row {y}")
    return out


def _unpack_bits(data: bytearray, width: int, height: int, depth: int,
                 stride: int) -> np.ndarray:
    """Expand sub-byte greyscale/palette samples to one value per pixel
    (no scaling — palette indices must stay raw; grey scaling is the
    caller's job)."""
    rows = np.frombuffer(bytes(data), dtype=np.uint8).reshape(
        height, stride)
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, :width * depth].reshape(height, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (per * weights).sum(axis=2).astype(np.uint8)


def decode_png(data: bytes):
    """bytes → (array, meta) where array is uint8/uint16 of shape
    (h, w) for greyscale or (h, w, channels) otherwise, and meta is a
    dict with width/height/channels/bit_depth/interlace/color_type.
    Raises ValueError on malformed input — the guarded caller treats
    that as "not a decodable PNG" exactly like a PIL failure."""
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    palette = None
    trans = None
    idat = []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length                 # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trans = np.frombuffer(chunk, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"bad color type {color}")
    if depth not in (1, 2, 4, 8, 16) or \
            (depth < 8 and color not in (0, 3)) or \
            (depth == 16 and color == 3):
        raise ValueError(f"bad bit depth {depth} for color type {color}")
    channels = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))

    def pass_decode(w: int, h: int, buf: bytes, consumed: int):
        """Decode one (sub-)image of w×h from buf[consumed:]; returns
        (pixel array with shape (h, w[, channels]), bytes consumed)."""
        if w == 0 or h == 0:
            return None, 0
        bits_per_px = depth * channels
        stride = (w * bits_per_px + 7) // 8
        bpp = max(1, bits_per_px // 8)
        need = h * (1 + stride)
        if len(buf) - consumed < need:
            raise ValueError("truncated IDAT stream")
        flat = _unfilter(buf[consumed:consumed + need], h, stride, bpp)
        if depth < 8:
            px = _unpack_bits(flat, w, h, depth, stride)
        elif depth == 16:
            px = np.frombuffer(bytes(flat), dtype=">u2").astype(
                np.uint16).reshape(h, w, channels)
            if channels == 1:
                px = px[:, :, 0]
        else:
            px = np.frombuffer(bytes(flat), dtype=np.uint8).reshape(
                h, w, channels)
            if channels == 1:
                px = px[:, :, 0]
        return px, need

    if interlace == 0:
        px, used = pass_decode(width, height, raw, 0)
    elif interlace == 1:                   # Adam7
        dt = np.uint16 if depth == 16 else np.uint8
        shape = (height, width) if channels == 1 else \
            (height, width, channels)
        px = np.zeros(shape, dtype=dt)
        consumed = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            sub, used = pass_decode(pw, ph, raw, consumed)
            consumed += used
            if sub is not None:
                px[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"bad interlace method {interlace}")

    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = px
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        if trans is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[:len(trans)] = trans
            px = np.dstack([palette[idx], alpha[idx]])
            channels = 4
        else:
            px = palette[idx]
            channels = 3
    elif depth < 8:                        # scale sub-byte grey to 8-bit
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8)

    meta = {"width": width, "height": height, "channels": channels,
            "bit_depth": depth, "interlace": interlace,
            "color_type": color}
    return px, meta


def luma(px: np.ndarray) -> np.ndarray:
    """Greyscale plane with PIL's integer ITU-R 601 weights
    ((299R + 587G + 114B) // 1000, truncating) so the stdlib decode
    path produces the same feature bytes as ``Image.convert('L')``
    on 8-bit images; alpha is dropped exactly as PIL drops it."""
    if px.ndim == 2:
        return px
    if px.shape[2] == 2:                   # grey + alpha
        return px[:, :, 0]
    p = px.astype(np.uint32)
    return ((p[:, :, 0] * 299 + p[:, :, 1] * 587 + p[:, :, 2] * 114)
            // 1000).astype(px.dtype)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def encode_png(arr: np.ndarray, interlace: int = 0,
               filter_type: int = 0) -> bytes:
    """Minimal deterministic encoder for fixtures: uint8 (h, w) grey,
    (h, w, 3) RGB or (h, w, 4) RGBA; one filter type for every
    scanline; optional Adam7 so the decoder's interlace path has an
    in-repo round-trip partner. zlib level fixed for determinism."""
    a = np.ascontiguousarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("fixture encoder is uint8-only")
    if a.ndim == 2:
        color, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported fixture shape {a.shape}")
    h, w = a.shape[:2]

    def filt_rows(img: np.ndarray) -> bytes:
        hh, ww = img.shape[:2]
        flat = img.reshape(hh, ww * channels)
        bpp = channels
        rows = []
        for y in range(hh):
            line = flat[y].astype(np.int16)
            if filter_type == 0:
                enc = flat[y]
            elif filter_type == 1:         # Sub
                left = np.concatenate([np.zeros(bpp, np.int16),
                                       line[:-bpp]])
                enc = ((line - left) & 0xFF).astype(np.uint8)
            elif filter_type == 2:         # Up
                up = (flat[y - 1].astype(np.int16) if y > 0
                      else np.zeros_like(line))
                enc = ((line - up) & 0xFF).astype(np.uint8)
            else:
                raise ValueError("fixture encoder filters: 0/1/2")
            rows.append(bytes([filter_type]) + enc.tobytes())
        return b"".join(rows)

    if interlace == 0:
        body = filt_rows(a)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filt_rows(sub))
        body = b"".join(parts)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body, 6))
            + _chunk(b"IEND", b""))
