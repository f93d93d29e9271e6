"""Pure-Python image header probing — no codec libraries required.

Parses just enough of the public container formats to report
``(format, width, height)`` from raw bytes:

- PNG  — W3C PNG spec: 8-byte signature then the IHDR chunk whose
  first 8 data bytes are width/height as big-endian uint32.
- JPEG — ITU-T T.81: segment-marker scan to the first SOFn frame
  header (``FFC0``-``FFCF`` minus DHT ``C4``, JPG ``C8``, DAC
  ``CC``), which carries height/width as big-endian uint16.
- GIF  — GIF87a/GIF89a logical screen descriptor: width/height as
  little-endian uint16 at offset 6.
- BMP  — BITMAPINFOHEADER: signed little-endian int32 dims at
  offsets 18/22 (height may be negative for top-down rows).

This replaces a real codec only for METADATA — pixel decode still
needs an image library (see ``multimodal.decode_image``); at 100 TB
the metadata pass is the cheap pre-filter that runs on every payload
while full decode runs on the survivors.
"""

from __future__ import annotations

import struct

__all__ = ["probe_image"]

_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}  # DHT / JPG / DAC share the SOF range


def probe_image(payload: bytes) -> tuple[str, int, int] | None:
    """``(format, width, height)`` if ``payload`` starts with a
    recognized image container, else ``None`` (caller falls back)."""
    p = bytes(payload)
    if (
        p[:8] == b"\x89PNG\r\n\x1a\n"
        and len(p) >= 24
        and p[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", p[16:24])
        return ("png", w, h)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack("<HH", p[6:10])
        return ("gif", w, h)
    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack("<ii", p[18:26])
        if w > 0 and h != 0:
            return ("bmp", w, abs(h))  # negative height = top-down rows
        return None
    if p[:2] == b"\xff\xd8":
        return _probe_jpeg(p)
    return None


def _probe_jpeg(p: bytes) -> tuple[str, int, int] | None:
    i, n = 2, len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:  # desynced — not a well-formed segment stream
            return None
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI: bare
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS — dims must precede scan
            return None
        if i + 4 > n:
            return None
        (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
        if seglen < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if i + 9 <= n:  # SOFn: [len:2][precision:1][h:2][w:2]...
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                return ("jpeg", w, h)
            return None
        i += 2 + seglen
    return None
