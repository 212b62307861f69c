"""Pure-stdlib WAV (RIFF) codec — PCM 16-bit mono/stereo.

Companion to :mod:`nebuia_vector_db_spark.multimodal.png`: the second
REAL codec behind the multimodal surface (the reference engine,
main.go:25-75, is text+vector only — this whole module is the mandated
multimodal extension). Audio payloads travel through the engine as
opaque ``BINARY`` columns; the executors decode them with this module
inside Arrow-batched ``mapInPandas`` kernels (see
``assets.attach_wav_assets`` / ``assets.decode_audio_real``).

The encoder emits a canonical 44-byte-header RIFF/WAVE file; the
decoder is a genuine chunk-walking container parser — it validates the
RIFF magic, walks ``fmt ``/``data``/foreign chunks in any order,
honours the spec's odd-size pad byte, and rejects truncated or
non-PCM-16 streams. Everything is ``struct`` + ``numpy``; no
third-party or deprecated-stdlib (``audioop``) dependencies.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Raised when the payload is not a decodable PCM-16 WAV stream."""


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 PCM samples as a RIFF/WAVE byte stream.

    ``samples`` is 1-D (mono) or 2-D ``(n_frames, n_channels)``.
    """
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavFormatError("samples must be 1-D or 2-D")
    n_frames, n_channels = arr.shape
    data = arr.tobytes()
    block_align = n_channels * 2
    byte_rate = rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM-16 WAV byte stream -> ``(rate, samples)``.

    ``samples`` is ``(n_frames, n_channels)`` int16. Walks the RIFF
    chunk list (tolerating foreign chunks such as LIST/INFO and the
    odd-length pad byte); raises :class:`WavFormatError` on anything
    that is not little-endian PCM 16-bit.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 > len(payload):
        raise WavFormatError("truncated RIFF payload")

    rate = n_channels = None
    data: bytes | None = None
    off = 12
    end = 8 + riff_size
    while off + 8 <= end:
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        chunk_end = off + 8 + size
        if chunk_end > end:
            raise WavFormatError(f"chunk {cid!r} overruns the stream")
        if cid == b"fmt ":
            if size < 16:
                raise WavFormatError("fmt chunk too small")
            audio_format, n_channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, off + 8
            )
            if audio_format != 1 or bits != 16:
                raise WavFormatError(
                    f"unsupported format: codec={audio_format} bits={bits}"
                )
        elif cid == b"data":
            data = payload[off + 8 : chunk_end]
        off = chunk_end + (size % 2)  # pad byte on odd-size chunks

    if rate is None or n_channels is None:
        raise WavFormatError("missing fmt chunk")
    if data is None:
        raise WavFormatError("missing data chunk")
    frames = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        frames = frames[: len(frames) - len(frames) % n_channels]
        frames = frames.reshape(-1, n_channels)
    else:
        frames = frames[:, None]
    return int(rate), frames
