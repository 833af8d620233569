"""Pure-stdlib WAV (RIFF/PCM) codec — the audio counterpart of
:mod:`.png`: a REAL decode kernel with no optional dependencies.

PCM WAV is a chunked RIFF container around raw samples; parsing it
needs only ``struct`` + numpy.  :func:`decode_wav` walks the chunk
stream (skipping unknown chunks such as ``LIST``/``fact``), validates
the ``fmt `` contract, and returns the samples as an ``(n_frames,
channels)`` int16/uint8 array; :func:`encode_wav` is the inverse used
by tests and the gate fixture.  Supported: PCM (format tag 1), 8-bit
unsigned and 16-bit signed little-endian — the shapes speech corpora
normalize to.  Compressed/float/24-bit raise ``ValueError`` with the
reason rather than returning wrong samples.

Independent validation: Python's stdlib ``wave`` module is a separate
implementation of the same format — the tests require byte-exact
agreement with it in both directions (our decoder on ``wave``-written
files, ``wave`` on ours).

Like the PNG codec, this is the per-item kernel inside the Arrow
``mapInPandas`` batches of ``multimodal.decode_wav_meta``; the
distribution story (binary column, Arrow batching) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Encode an ``(n_frames,)`` or ``(n_frames, channels)`` array as
    a PCM WAV byte string (int16 for ``bits=16``, uint8 for 8)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] < 1 or a.shape[1] < 1:
        raise ValueError(f"expected (n_frames[, channels]), got {samples.shape}")
    n_frames, channels = a.shape
    if bits == 16:
        data = a.astype("<i2").tobytes()
    elif bits == 8:
        data = a.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV byte string to ``(sample_rate, bits, samples)``
    with samples shaped ``(n_frames, channels)`` (int16 or uint8)."""
    b = bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(8 + riff_size, len(b))
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(
            f"unsupported audio format tag {audio_format} (PCM=1 only)"
        )
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits} (8/16 only)")
    if channels < 1:
        raise ValueError("zero channels")
    expect_align = channels * (bits // 8)
    if block_align != expect_align:
        raise ValueError(
            f"block align {block_align} != channels*bytes {expect_align}"
        )
    if len(pcm) % expect_align:
        raise ValueError("data chunk is not a whole number of frames")
    dtype = "<i2" if bits == 16 else np.uint8
    samples = np.frombuffer(pcm, dtype=dtype).reshape(-1, channels)
    return sample_rate, bits, samples
