"""Image payload sniffing: format magic + EXIF orientation, no decode.

Reference analog: ``mmocr/utils/img_util.py`` (``drop_orientation`` /
``is_not_png``): the reference decides per image file whether EXIF
orientation would make the dataloader's view disagree with the
annotation geometry, and converts such files to PNG. It detects this by
decoding the image twice (orientation-respecting vs raw) and comparing
shapes — shapes differ exactly when the EXIF orientation is one of the
transposing values 5-8. This kernel extracts the same decision directly
from the bytes (magic signature + JPEG APP1/TIFF walk), which is the
scale-correct form: metadata-only, no pixel decode, no image library.

All functions are total: malformed/truncated payloads yield
``'unknown'`` / ``None``, never an exception (broken-record quarantine
discipline, SURVEY.md §2.2).
"""

from __future__ import annotations

import struct

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
GIF_MAGICS = (b"GIF87a", b"GIF89a")
# EXIF orientations that transpose width/height (rotate 90/270 families);
# only these make mmcv's oriented read disagree with the raw read.
TRANSPOSING_ORIENTATIONS = frozenset({5, 6, 7, 8})


def sniff_format(payload: bytes) -> str:
    """Container format from magic bytes: 'png' | 'jpeg' | 'gif' |
    'unknown'."""
    if not payload:
        return "unknown"
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload[:6] in GIF_MAGICS:
        return "gif"
    return "unknown"


def is_not_png(payload: bytes) -> bool:
    """Byte-level twin of ``is_not_png(img_file)`` (img_util.py:37-51):
    the reference tests the filename suffix; content magic is the
    trustworthy equivalent."""
    return sniff_format(payload) != "png"


def jpeg_exif_orientation(payload: bytes) -> int | None:
    """EXIF Orientation (tag 0x0112) from a JPEG's APP1 segment, or
    ``None`` when absent/unparseable. Walks the JPEG segment chain to
    APP1, then the TIFF IFD0 entries — bounded, byte-only, no decode."""
    if sniff_format(payload) != "jpeg":
        return None
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xDA:  # start-of-scan: no EXIF past this point
            return None
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker == 0xE1 and payload[pos + 4:pos + 10] == b"Exif\x00\x00":
            return _tiff_orientation(payload[pos + 10:pos + 2 + seg_len])
        pos += 2 + seg_len
    return None


def _tiff_orientation(tiff: bytes) -> int | None:
    if len(tiff) < 14:
        return None
    if tiff[:4] == b"II*\x00":
        endian = "<"
    elif tiff[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(endian + "I", tiff, 4)
    if ifd_off + 2 > len(tiff):
        return None
    (n_entries,) = struct.unpack_from(endian + "H", tiff, ifd_off)
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(tiff):
            return None
        tag, typ, _count = struct.unpack_from(endian + "HHI", tiff, base)
        if tag == 0x0112 and typ == 3:  # SHORT, value inline
            (val,) = struct.unpack_from(endian + "H", tiff, base + 8)
            return val if 1 <= val <= 8 else None
    return None


def orientation_plan(payload: bytes) -> tuple[str, int | None, bool, str]:
    """The ``drop_orientation`` decision (img_util.py:6-33) from bytes:
    returns (format, orientation, needs_rewrite, target_ext).
    ``needs_rewrite`` is True exactly when the reference's two decodes
    would disagree in shape — a JPEG whose EXIF orientation transposes
    (5-8) — and the rewrite target is then '.png'."""
    fmt = sniff_format(payload)
    orient = jpeg_exif_orientation(payload) if fmt == "jpeg" else None
    needs = orient in TRANSPOSING_ORIENTATIONS
    if fmt == "png":
        ext = ".png"
    elif needs:
        ext = ".png"  # converted, original removed (img_util.py:28-33)
    elif fmt == "jpeg":
        ext = ".jpg"
    elif fmt == "gif":
        ext = ".gif"
    else:
        ext = ""
    return fmt, orient, needs, ext


def build_jpeg_with_exif(orientation: int | None, seed: int = 0) -> bytes:
    """Deterministic minimal JPEG byte container (fixture synthesis for
    tests and the oracle query): SOI + optional APP1(Exif, big-endian
    TIFF, one IFD0 entry: Orientation) + a tiny COM segment + EOI. Not a
    decodable image — a structurally valid segment chain, which is all
    the metadata walk reads."""
    out = bytearray(b"\xff\xd8\xff")
    # the sniffer requires FFD8FF; make the third byte a real marker by
    # starting the first segment right there
    out.pop()  # keep SOI only; segments follow with their own FF
    if orientation is not None:
        tiff = bytearray(b"MM\x00*")
        tiff += struct.pack(">I", 8)        # IFD0 at offset 8
        tiff += struct.pack(">H", 1)        # one entry
        tiff += struct.pack(">HHI", 0x0112, 3, 1)
        tiff += struct.pack(">HH", orientation, 0)
        body = b"Exif\x00\x00" + bytes(tiff)
        out += b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    com = (b"seed:%d" % seed)
    out += b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com
    out += b"\xff\xd9"
    return bytes(out)
