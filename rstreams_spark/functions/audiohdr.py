"""Pure-Python audio header probing — no codec libraries required.

Parses just enough of the public container formats to report
``(format, sample_rate, channels, bits, n_samples)`` from raw bytes
(the audio analog of ``imagehdr.probe_image``):

- WAV  — RIFF/WAVE chunk walk (Microsoft/IBM RIFF spec): ``fmt ``
  carries PCM format/channels/rate/block-align/bits as little-endian
  fields; ``data``'s chunk size over block-align gives the sample
  count. Chunks are padded to even offsets per the spec.
- FLAC — ``fLaC`` signature then the mandatory first STREAMINFO
  metadata block (type 0, 34 bytes): sample rate (20 bits),
  channels−1 (3 bits), bits−1 (5 bits), total samples (36 bits)
  packed big-endian starting at STREAMINFO byte 10.

Like the image probe, this replaces a codec only for METADATA —
waveform decode would need an audio library; at 100 TB the header
pass is the cheap pre-filter over every payload.
"""

from __future__ import annotations

import struct

__all__ = ["probe_audio", "build_wav"]


def probe_audio(
    payload: bytes,
) -> tuple[str, int, int, int, int] | None:
    """``(format, sample_rate, channels, bits, n_samples)`` if
    ``payload`` starts with a recognized audio container, else
    ``None`` (caller falls back)."""
    # header probe must not copy multi-MB payloads: bytes/bytearray
    # slice-and-compare directly; only exotic buffer types convert
    p = payload if isinstance(payload, (bytes, bytearray)) else bytes(payload)
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return _probe_wav(p)
    if p[:4] == b"fLaC" and len(p) >= 42:
        return _probe_flac(p)
    return None


def _probe_wav(p: bytes) -> tuple[str, int, int, int, int] | None:
    i, n = 12, len(p)
    rate = channels = bits = block_align = None
    data_size = None
    while i + 8 <= n:
        cid = p[i : i + 4]
        (size,) = struct.unpack("<I", p[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= n:
            _fmt, channels, rate = struct.unpack("<HHI", p[i + 8 : i + 16])
            block_align, bits = struct.unpack("<HH", p[i + 20 : i + 24])
        elif cid == b"data":
            data_size = size
        if rate is not None and data_size is not None:
            break
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if not rate or not channels or not block_align or data_size is None:
        return None
    return ("wav", rate, channels, bits or 0, data_size // block_align)


def _probe_flac(p: bytes) -> tuple[str, int, int, int, int] | None:
    # first metadata block header at offset 4: [last|type:1][len:3]
    if p[4] & 0x7F != 0:  # STREAMINFO must be first
        return None
    # STREAMINFO starts at 8 (4 sig + 4 block header); skip
    # blocksizes(4) + framesizes(6) → the 8 packed bytes at 18
    b = p[18:26]
    if len(b) < 8:
        return None
    word = int.from_bytes(b, "big")
    rate = word >> 44
    channels = ((word >> 41) & 0x7) + 1
    bits = ((word >> 36) & 0x1F) + 1
    n_samples = word & ((1 << 36) - 1)
    if rate == 0:
        return None
    return ("flac", rate, channels, bits, n_samples)


def build_wav(
    sample_rate: int, channels: int, bits: int, n_samples: int
) -> bytes:
    """A REAL (silent) PCM WAV payload: canonical 44-byte RIFF/WAVE
    header + zeroed sample data. Byte-exact round-trip with
    ``probe_audio`` — used both by the synthetic-corpus stub (params
    derived from the content digest) and by tests."""
    block_align = channels * bits // 8
    data_size = n_samples * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, bits,
        )
        + b"data"
        + struct.pack("<I", data_size)
        + b"\x00" * data_size
    )
