"""Pure-numpy MJPEG-AVI video codec for the multimodal frame kernels (L5).

Completes the modality set: with jpegcodec.py providing a real baseline
JPEG decoder and WAV/RIFF chunk-walking already proven in audiocodec.py,
Motion-JPEG inside an AVI container — RIFF chunks whose '00dc'/'00db'
payloads are whole JPEG images — decodes for real with zero external
dependencies. Inter-frame codecs (H.264/VP9/AV1 — genuine motion
compensation) raise UnsupportedVideo, same honest policy as progressive
JPEG and MP3.

Format reference: the public RIFF/AVI container layout (LIST hdrl with
avih/strl headers, LIST movi holding '##dc' compressed / '##db'
uncompressed frame chunks, word-aligned). encode_mjpeg_avi writes a
minimal standard-compliant file for fixtures and the sink path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


class UnsupportedVideo(NotImplementedError):
    """Container/codec outside the pure-numpy envelope (e.g. H.264)."""


def sniff_video(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    return None


def _walk_riff(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (chunk_id, body_start, body_len); recurses into LISTs."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"LIST":
            yield data[body : body + 4], body + 4, clen - 4
            yield from _walk_riff(data, body + 4, body + clen)
        else:
            yield cid, body, clen
        pos = body + clen + (clen & 1)


def iter_mjpeg_frames(data: bytes) -> Iterator[bytes]:
    """Yield raw JPEG bytes per video frame of an MJPEG AVI."""
    if sniff_video(data) != "avi":
        raise UnsupportedVideo("not a RIFF/AVI signature")
    saw_movi = False
    for cid, start, clen in _walk_riff(data, 12, len(data)):
        if cid == b"movi":
            saw_movi = True
        elif (
            len(cid) == 4
            and cid[2:4] in (b"dc", b"db")
            and all(c in b"0123456789abcdefABCDEF" for c in cid[:2])
        ):
            frame = data[start : start + clen]
            if frame[:3] == b"\xff\xd8\xff":
                yield frame
            elif frame:
                raise UnsupportedVideo(
                    "AVI stream is not MJPEG (frame payload is not JPEG)"
                )
    if not saw_movi:
        raise UnsupportedVideo("AVI has no movi list")


def decode_frames(
    data: bytes, *, every_n: int = 1, max_frames: int | None = None
) -> Iterator[tuple[int, np.ndarray]]:
    """Decode every ``every_n``-th frame to (frame_index, raster).

    Frame sampling happens BEFORE JPEG decode — skipped frames cost a
    chunk-walk step, not an IDCT — so sparse sampling of long clips is
    cheap, the property the 100 TB video path needs.
    """
    from laser_hadoop_spark.operators.jpegcodec import decode_jpeg

    emitted = 0
    for i, frame in enumerate(iter_mjpeg_frames(data)):
        if i % every_n:
            continue
        yield i, decode_jpeg(frame)
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return


def encode_mjpeg_avi(
    frames: list[bytes], *, width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal standard MJPEG AVI from pre-encoded JPEG frame bytes."""
    if not frames:
        raise ValueError("need at least one frame")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
