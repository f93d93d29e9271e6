"""Pure-Python video container probing — no codec libraries required.

Parses just enough of the public container formats to report
``(format, width, height, timescale, duration_units, n_frames)``
from raw bytes (the video analog of ``imagehdr.probe_image`` /
``audiohdr.probe_audio``):

- MP4 (ISO BMFF, ISO/IEC 14496-12) — length-prefixed box walk:
  ``moov/mvhd`` carries the movie timescale and duration (version 0:
  32-bit big-endian fields at offsets 12/16 of the box payload;
  version 1: 64-bit), ``moov/trak/tkhd`` the presentation width and
  height as 16.16 fixed-point at the end of the box, and
  ``moov/trak/mdia/minf/stbl/stsz`` the sample (frame) count.
- AVI — RIFF chunk walk (same spec family as WAV): the mandatory
  ``hdrl/avih`` main header carries dwMicroSecPerFrame,
  dwTotalFrames, dwWidth, dwHeight as little-endian 32-bit fields.

Like the image/audio probes, this replaces a codec only for
METADATA — frame decode would need a video library (stubbed per the
repo's multimodal contract); at 100 TB the header pass is the cheap
pre-filter over every payload.
"""

from __future__ import annotations

import struct

__all__ = ["probe_video", "build_mp4", "build_avi"]

def probe_video(
    payload: bytes,
) -> tuple[str, int, int, int, int, int] | None:
    """``(format, width, height, timescale, duration_units,
    n_frames)`` if ``payload`` starts with a recognized video
    container, else ``None`` (caller falls back). For AVI the
    timescale is 1_000_000 and duration_units is
    dwMicroSecPerFrame · dwTotalFrames, so duration_ms is uniformly
    ``duration_units * 1000 // timescale`` across formats."""
    p = payload if isinstance(payload, (bytes, bytearray)) else bytes(payload)
    if len(p) >= 12 and p[4:8] == b"ftyp":
        return _probe_mp4(p)
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return _probe_avi(p)
    return None


def _mp4_boxes(p: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) at one level."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", p[i : i + 4])
        btype = p[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", p[i + 8 : i + 16])
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < hdr or i + size > end:
            return  # malformed — stop walking, report what we have
        yield btype, i + hdr, i + size
        i += size


def _probe_mp4(p: bytes) -> tuple[str, int, int, int, int, int] | None:
    # Per-trak state: a real-world file interleaves video and audio
    # tracks, and summing stsz counts across ALL of them (or taking
    # dims from whichever tkhd parsed last) would report audio sample
    # counts as frames. Each trak is walked in isolation and the
    # VIDEO track — the first one with nonzero presentation dims
    # (audio tkhd dims are zero per spec) — supplies width/height and
    # n_frames; files with no dimensioned track fall back to the
    # first track so single-track metadata-only containers still
    # report their sample count.
    timescale = duration = None
    traks: list[tuple[int, int, int]] = []  # (width, height, n_frames)

    def walk_trak(t_start: int, t_end: int) -> None:
        width = height = 0
        n_frames = 0

        def walk(start: int, end: int) -> None:
            nonlocal width, height, n_frames
            for btype, ps, pe in _mp4_boxes(p, start, end):
                if btype in (b"mdia", b"minf", b"stbl"):
                    walk(ps, pe)
                elif btype == b"tkhd" and pe - ps >= 8:
                    # width/height: 16.16 fixed point, last 8 bytes
                    w, h = struct.unpack(">II", p[pe - 8 : pe])
                    width, height = w >> 16, h >> 16
                elif btype == b"stsz" and pe - ps >= 12:
                    _sz, count = struct.unpack(">II", p[ps + 4 : ps + 12])
                    n_frames += count

        walk(t_start, t_end)
        traks.append((width, height, n_frames))

    def walk_top(start: int, end: int) -> None:
        nonlocal timescale, duration
        for btype, ps, pe in _mp4_boxes(p, start, end):
            if btype == b"moov":
                walk_top(ps, pe)
            elif btype == b"trak":
                walk_trak(ps, pe)
            elif btype == b"mvhd" and pe - ps >= 20:
                ver = p[ps]
                if ver == 1:
                    # v1 layout: 64-bit times at 4, timescale at 20,
                    # 64-bit duration at 24 — needs 32 payload bytes;
                    # a truncated v1 box yields nothing rather than a
                    # crash or a v0 misparse of its 64-bit fields
                    if pe - ps >= 32:
                        timescale = struct.unpack(">I", p[ps + 20 : ps + 24])[0]
                        duration = struct.unpack(">Q", p[ps + 24 : ps + 32])[0]
                else:
                    timescale, duration = struct.unpack(
                        ">II", p[ps + 12 : ps + 20]
                    )

    walk_top(0, len(p))
    if timescale is None or duration is None:
        return None
    video = next(
        (t for t in traks if t[0] > 0 and t[1] > 0),
        traks[0] if traks else (0, 0, 0),
    )
    return ("mp4", video[0], video[1], timescale, duration, video[2])


def _probe_avi(p: bytes) -> tuple[str, int, int, int, int, int] | None:
    # RIFF size header, then LIST chunks; avih sits inside LIST'hdrl'
    i, n = 12, len(p)
    while i + 8 <= n:
        cid = p[i : i + 4]
        (size,) = struct.unpack("<I", p[i + 4 : i + 8])
        if cid == b"LIST" and p[i + 8 : i + 12] == b"hdrl":
            j, jend = i + 12, min(i + 8 + size, n)
            while j + 8 <= jend:
                sub = p[j : j + 4]
                (ssz,) = struct.unpack("<I", p[j + 4 : j + 8])
                if sub == b"avih" and j + 8 + 40 <= jend:
                    us_per_frame, _maxrate, _pad, _flags, total = (
                        struct.unpack("<IIIII", p[j + 8 : j + 28])
                    )
                    w, h = struct.unpack("<II", p[j + 40 : j + 48])
                    return (
                        "avi", w, h, 1_000_000,
                        us_per_frame * total, total,
                    )
                j += 8 + ssz + (ssz & 1)
        i += 8 + size + (size & 1)
    return None


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    width: int, height: int, timescale: int, duration_units: int,
    n_frames: int,
) -> bytes:
    """Minimal REAL ISO BMFF container: ftyp + moov{mvhd,
    trak{tkhd, mdia{mdhd, minf{stbl{stsz}}}}}. Every field the probe
    reads is written per spec (big-endian, 16.16 fixed-point track
    dims, version-0 full boxes); total size is the closed form
    ``MP4_FIXED_BYTES + 4 * n_frames`` so the DuckDB oracle can
    recompute n_bytes from the parameters alone."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)                      # version 0 + flags
        + struct.pack(">II", 0, 0)                  # creation/mod time
        + struct.pack(">II", timescale, duration_units)
        + struct.pack(">IH2x", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 8                               # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                              # pre_defined
        + struct.pack(">I", 2),                     # next_track_ID
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">III4x", 0, 0, 1)            # times, track_ID
        + struct.pack(">II", 0, 0)                  # duration, reserved
        + b"\x00" * 8
        + struct.pack(">HH", 0, 0)                  # layer, group
        + struct.pack(">H2x", 0)                    # volume (video: 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration_units)
        + struct.pack(">HH", 0x55C4, 0),            # language 'und'
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3x", 0)
        + struct.pack(">II", 0, n_frames)           # per-sample sizes
        + struct.pack(f">{n_frames}I", *([0] * n_frames)),
    )
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


# closed-form size of build_mp4 output minus the stsz entry table
MP4_FIXED_BYTES = len(build_mp4(0, 0, 1, 0, 0))


def build_avi(
    width: int, height: int, us_per_frame: int, n_frames: int
) -> bytes:
    """Minimal REAL RIFF/AVI container: LIST'hdrl'(avih) +
    LIST'movi' (empty). Fixed total size ``AVI_FIXED_BYTES`` —
    header-only, no frame data (the probe reads headers only)."""
    avih = b"avih" + struct.pack(
        "<I", 56
    ) + struct.pack(
        "<IIIII", us_per_frame, 0, 0, 0, n_frames
    ) + struct.pack(
        "<III", 0, 1, 0
    ) + struct.pack(
        "<II", width, height
    ) + b"\x00" * 16
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


AVI_FIXED_BYTES = len(build_avi(0, 0, 1, 0))
