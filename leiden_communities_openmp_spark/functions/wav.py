"""From-scratch RIFF/WAVE PCM codec (no external audio libraries).

Supports the canonical subset a training-data pipeline meets in practice:
PCM (format 1), 16-bit samples, any channel count (decoded to mono by
averaging), any sample rate. Encoder emits mono 16-bit PCM. Enough to make
the audio leg of the multimodal operators REAL in this codec-less
container, same as functions/png.py does for images.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (mono float64 samples in [-1, 1], sample_rate).

    Walks RIFF chunks; requires one ``fmt `` chunk (PCM, 16-bit) before the
    ``data`` chunk. Multi-channel audio is averaged to mono.
    """
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(data)
    fmt = None
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: format={audio_fmt} bits={bits}")
            fmt = (n_ch, rate)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n_ch, rate = fmt
            raw = np.frombuffer(body, dtype="<i2")
            if n_ch > 1:
                raw = raw[: len(raw) - len(raw) % n_ch].reshape(-1, n_ch)
                mono = raw.astype(np.float64).mean(axis=1)
            else:
                mono = raw.astype(np.float64)
            return mono / 32768.0, rate
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
