"""Pure-numpy WAV (RIFF PCM) codec for the multimodal audio kernels (L5).

The audio analogue of imagecodec.py: the container has no audio
libraries, but RIFF/WAVE PCM needs only struct + numpy, so the audio
decode path is REAL — bytes in, float64 sample matrix out. Compressed
codecs (MP3/AAC/Opus — genuine DSP decoders) raise UnsupportedAudio,
mirroring the honest-unsupported policy of the image side.

Supported: PCM 8/16/24/32-bit integer and 32/64-bit IEEE float, any
channel count and sample rate; chunk walker tolerates extra chunks
(LIST/fact/cue) in any order. encode_wav writes 16-bit or float32 PCM
for test fixtures and the sink path.

Format reference: the public RIFF/WAVE specification (fmt/data chunk
layout, WAVE_FORMAT_PCM=1, WAVE_FORMAT_IEEE_FLOAT=3,
WAVE_FORMAT_EXTENSIBLE=0xFFFE).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudio(NotImplementedError):
    """Format/feature outside the pure-numpy codec's envelope (e.g. MP3)."""


def sniff_audio(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2"):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    return None


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM bytes to ((n_samples, n_channels) float64
    in [-1, 1], sample_rate)."""
    if sniff_audio(data) != "wav":
        raise UnsupportedAudio("not a RIFF/WAVE signature")
    pos = 12
    fmt = None
    samples = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, nch, rate, _byterate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE and clen >= 26:  # EXTENSIBLE: real tag in GUID
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, nch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or samples is None:
        raise UnsupportedAudio("WAV missing fmt/data chunk")
    tag, nch, rate, bits = fmt
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(samples, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(samples, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(samples, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(samples, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise UnsupportedAudio(f"PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(samples, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(samples, dtype="<f8").astype(np.float64)
        else:
            raise UnsupportedAudio(f"float bit depth {bits}")
    else:
        raise UnsupportedAudio(f"WAV format tag {tag} (only PCM/float)")
    if nch < 1:
        raise UnsupportedAudio("WAV with zero channels")
    x = x[: (len(x) // nch) * nch].reshape(-1, nch)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int, *, bits: int = 16) -> bytes:
    """Encode an (n, ch) or (n,) float array in [-1, 1] as PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    if bits == 16:
        payload = (
            np.clip(np.round(x * 32767.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
        tag, bytes_per = 1, 2
    elif bits == 32:
        payload = x.astype("<f4").tobytes()
        tag, bytes_per = 3, 4
    else:
        raise ValueError("encode_wav supports bits=16 (PCM) or 32 (float)")
    fmt = struct.pack(
        "<HHIIHH", tag, nch, rate, rate * nch * bytes_per, nch * bytes_per, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(x: np.ndarray, rate: int, *, fft_samples: int = 65536) -> dict:
    """Deterministic per-clip features from a decoded sample matrix:
    duration, RMS energy, zero-crossing rate, spectral centroid (on up
    to fft_samples of the channel mean — bounded work per clip)."""
    mono = x.mean(axis=1)
    n = len(mono)
    duration_ms = int(round(n * 1000.0 / rate)) if rate else 0
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    head = mono[:fft_samples]
    if len(head) > 1 and np.any(head):
        mag = np.abs(np.fft.rfft(head))
        freqs = np.fft.rfftfreq(len(head), d=1.0 / rate)
        denom = float(mag.sum())
        centroid = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
    else:
        centroid = 0.0
    return {
        "duration_ms": duration_ms,
        "sample_rate": int(rate),
        "n_channels": int(x.shape[1]),
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
    }
