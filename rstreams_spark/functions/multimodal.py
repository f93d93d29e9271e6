"""Multimodal (binary) column plumbing.

Images/audio/video ride as opaque ``binary`` columns with typed
metadata. The Spark-side shape is real and tested — schema, Arrow
batch flow through ``mapInPandas``, partition-preserving transforms.

Metadata extraction is REAL for PNG/JPEG/GIF/BMP payloads via the
pure-Python container-header probe (``imagehdr.probe_image``, no
codec library needed). Full pixel decode remains codec-gated: when
PIL is importable (``HAS_PIL``), ``decode_image``/``resize_images``
run the real codec per payload; otherwise (and for undecodable
payloads) the deterministic byte-derived stub keeps the pipeline
shape testable — same tests green in both environments.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audiohdr import build_wav, probe_audio
from .imagehdr import probe_image

try:  # optional codec: absent in this container, real on full images
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised implicitly here
    _PILImage = None
    HAS_PIL = False

__all__ = [
    "with_binary_payload", "extract_meta", "decode_image", "sample_frames",
    "resize_images", "with_audio_payload", "extract_audio_meta",
    "with_video_payload", "extract_video_meta",
]

META_SCHEMA = (
    "doc_id bigint, n_bytes int, magic string, format string, "
    "width int, height int, content_sha256 string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a text column as a binary payload column ``payload``
    (stand-in for real image/audio bytes in the synthetic corpus)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image(payload: bytes):
    """Decode image bytes → (width, height, mode) via PIL.

    Raises ``NotImplementedError`` when no codec library is present
    (this container); the Spark plumbing around it is real either way.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. PIL)"
        )
    with _PILImage.open(io.BytesIO(payload)) as im:
        return im.width, im.height, im.mode


def _fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic pseudo width/height derived from content bytes."""
    digest = hashlib.sha256(payload).digest()
    return 16 + digest[0] % 64, 16 + digest[1] % 64


def _decode_dims(payload: bytes) -> tuple[str | None, int, int]:
    """``(format, width, height)``. Order of authority: the
    pure-Python container-header probe (always available, covers
    PNG/JPEG/GIF/BMP), then PIL when importable (other formats),
    then the deterministic byte-derived stub (format=None) — so
    synthetic text-bytes corpora behave identically with or without
    PIL installed, and real image payloads get REAL metadata even in
    codec-less containers."""
    probed = probe_image(payload)
    if probed is not None:
        return probed
    if HAS_PIL:
        try:
            w, h, _ = decode_image(payload)
            return "pil", w, h
        except Exception:
            pass
    w, h = _fake_decode_meta(payload)
    return None, w, h


RESIZE_SCHEMA = "doc_id bigint, width int, height int, thumb binary, thumb_sha1 string"


def resize_images(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: payload in → fixed-size thumbnail payload out,
    batch-at-a-time through Arrow. With PIL present, decodable images
    get a real grayscale resample to width×height; otherwise (or for
    undecodable payloads) a deterministic byte-stride resample to
    exactly width×height bytes. Schema, batch flow and output
    contract are the real pipeline stage in both modes.
    """
    n_out = width * height

    def _stub_resample(payload: bytes) -> bytes:
        # deterministic stride-resample of the byte stream
        step = max(len(payload) / n_out, 1e-9)
        return bytes(
            payload[min(int(i * step), len(payload) - 1)] for i in range(n_out)
        )

    def _resample(payload: bytes) -> bytes:
        if HAS_PIL:
            try:
                with _PILImage.open(io.BytesIO(payload)) as im:
                    return im.convert("L").resize((width, height)).tobytes()
            except Exception:
                pass
        return _stub_resample(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → 1-byte stand-in (deterministic thumb),
            # not a kernel crash
            thumbs = [
                _resample(b"\x00" if p is None else (bytes(p) or b"\x00"))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "thumb": thumbs,
                    "thumb_sha1": [hashlib.sha1(b).hexdigest() for b in thumbs],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_sha1 string"


def sample_frames(df: DataFrame, n_frames: int, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing: one input payload → up to ``n_frames``
    evenly-spaced output rows, each carrying a frame payload. The
    row-expanding ``mapInPandas`` shape is exactly what a real video
    decoder stage uses (input batch in, larger frame batch out, Arrow
    both ways); the decode itself is faked deterministically — frames
    are evenly-spaced byte slices — since no codec libs exist here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:  # NULL payload → no frames
                    continue
                payload = bytes(payload)
                k = min(n_frames, max(len(payload), 1))
                step = max(len(payload) // k, 1)
                for i in range(k):
                    frame = payload[i * step : (i + 1) * step] or b"\x00"
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    digests.append(hashlib.sha1(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames,
                 "frame_sha1": digests}
            )

    return df.select(id_col, "payload").mapInPandas(run, FRAME_SCHEMA)


def extract_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    ``mapInPandas`` keeps the batch shape: one pandas frame per Arrow
    batch, vectorized per-batch work, no per-row Python dispatch. At
    scale this is the pattern for decode/resize/frame-sample stages.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (e.g. encode(NULL text)) propagate to NULL
            # metadata, mirroring the oracle's SQL NULL semantics —
            # one NULL doc must not kill a 100 TB pass
            payloads = [
                None if p is None else bytes(p) for p in pdf["payload"]
            ]
            dims = [
                (None, None, None) if p is None else _decode_dims(p)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [
                        None if p is None else len(p) for p in payloads
                    ],
                    "magic": [
                        None if p is None else p[:4].hex() for p in payloads
                    ],
                    "format": [d[0] for d in dims],
                    "width": [d[1] for d in dims],
                    "height": [d[2] for d in dims],
                    "content_sha256": [
                        None if p is None else hashlib.sha256(p).hexdigest()
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, META_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, sample_rate int, "
    "channels int, bits int, n_samples bigint, duration_ms bigint"
)


def with_audio_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic REAL audio payloads for the synthetic corpus:
    PCM parameters derive from the content digest (rate = 8000 +
    1000·(d₀ mod 8), channels = 1 + d₁ mod 2, bits = 16, samples =
    16 + d₂ mod 64 where dᵢ are sha256(text) bytes) and
    ``audiohdr.build_wav`` writes a genuine RIFF/WAVE container —
    the downstream probe exercises REAL header parsing while every
    parameter stays SQL-derivable for the DuckDB oracle (same trick
    as ``multimodal_meta``'s sha256 stub dims)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for txt in pdf[text_col]:
                # NULL text coalesces to "" so the digest domain matches the
                # oracle's sha256(coalesce(text, '')) — sha256('None') vs
                # SQL-NULL propagation would silently diverge on NULL rows
                d = hashlib.sha256(
                    ("" if txt is None else str(txt)).encode("utf-8")
                ).digest()
                payloads.append(
                    build_wav(
                        8000 + (d[0] % 8) * 1000,
                        1 + d[1] % 2,
                        16,
                        16 + d[2] % 64,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id", text_col).mapInPandas(
        run, "doc_id bigint, payload binary"
    )


def extract_audio_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched audio metadata extraction over binary payloads —
    the audio analog of ``extract_meta``: real WAV/FLAC header probe
    (``audiohdr.probe_audio``), NULL format for unrecognized bytes.
    Stateless mapInPandas: pipelines with the scan, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads propagate to NULL metadata (the catalog's
            # builder coalesces NULL text, but the API contract is
            # NULL-in → NULL-out, same as extract_meta)
            payloads = [
                None if p is None else bytes(p) for p in pdf["payload"]
            ]
            probed = [None if p is None else probe_audio(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [
                        None if p is None else len(p) for p in payloads
                    ],
                    "format": [t[0] if t else None for t in probed],
                    "sample_rate": [
                        (t[1] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "channels": [
                        (t[2] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "bits": [
                        (t[3] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "n_samples": [
                        (t[4] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "duration_ms": [
                        (t[4] * 1000 // t[1] if t and t[1] else 0)
                        if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int, "
    "n_frames bigint, duration_ms bigint"
)


def with_video_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic REAL video containers for the synthetic corpus:
    parameters derive from the content digest (format = mp4/avi by
    d₀ mod 2, width = 160 + 16·(d₁ mod 8), height = 120 + 16·(d₂ mod
    8), fps = 10 + d₃ mod 21, frames = 8 + d₄ mod 64 where dᵢ are
    sha256(text) bytes) and ``videohdr.build_mp4``/``build_avi``
    write genuine ISO BMFF / RIFF AVI headers — the downstream probe
    exercises REAL box/chunk walking while every parameter stays
    SQL-derivable for the DuckDB oracle (the audio/image trick)."""
    from .videohdr import build_avi, build_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for txt in pdf[text_col]:
                # NULL text coalesces to "" so the digest domain matches the
                # oracle's sha256(coalesce(text, '')) — sha256('None') vs
                # SQL-NULL propagation would silently diverge on NULL rows
                d = hashlib.sha256(
                    ("" if txt is None else str(txt)).encode("utf-8")
                ).digest()
                w = 160 + 16 * (d[1] % 8)
                h = 120 + 16 * (d[2] % 8)
                fps = 10 + d[3] % 21
                nf = 8 + d[4] % 64
                if d[0] % 2 == 0:
                    # timescale = fps, duration = frames: one unit
                    # per frame, duration_ms = nf*1000//fps
                    payloads.append(build_mp4(w, h, fps, nf, nf))
                else:
                    payloads.append(build_avi(w, h, 1_000_000 // fps, nf))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select("doc_id", text_col).mapInPandas(
        run, "doc_id bigint, payload binary"
    )


def extract_video_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched video metadata extraction over binary payloads —
    the video analog of ``extract_meta``/``extract_audio_meta``: real
    MP4/AVI container probe (``videohdr.probe_video``), NULL format
    for unrecognized bytes. duration_ms is uniformly
    ``duration_units * 1000 // timescale`` (AVI reports a
    microsecond timescale, so the same integer algebra covers both).
    Stateless mapInPandas: pipelines with the scan, no shuffle."""
    from .videohdr import probe_video

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → NULL metadata row (see extract_audio_meta)
            payloads = [
                None if p is None else bytes(p) for p in pdf["payload"]
            ]
            probed = [None if p is None else probe_video(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [
                        None if p is None else len(p) for p in payloads
                    ],
                    "format": [t[0] if t else None for t in probed],
                    "width": [
                        (t[1] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "height": [
                        (t[2] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "n_frames": [
                        (t[5] if t else 0) if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                    "duration_ms": [
                        (t[4] * 1000 // t[3] if t and t[3] else 0)
                        if p is not None else None
                        for p, t in zip(payloads, probed)
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, VIDEO_META_SCHEMA)
