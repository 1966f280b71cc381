"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The multimodal-columns north star (BASELINE.json): image/audio/video
travel as ``BinaryType`` columns with typed metadata beside them;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.

Decode support is split by what the container can honestly do:

- **Container formats with pure-bytes layouts decode for real**:
  uncompressed PCM WAV (RIFF header + samples — stdlib ``struct`` +
  numpy) and binary PPM (P6 — ASCII header + raw RGB). The registered
  query ``multimodal_decode_wav`` runs this path end to end.
- **Codec-compressed formats (JPEG/PNG/MP4/Opus...) remain a
  clearly-marked stub** (NotImplementedError): real decoding needs
  codec libraries (Pillow/ffmpeg) that are not in this environment.
  The surrounding Spark plumbing (schema, batch iteration, partition
  behavior) is identical for both paths, so swapping in a real codec
  lights up the rest.

Scale: mapInPandas streams Arrow batches through Python — constant
memory per task regardless of partition size; binary payloads never
pass through a shuffle in this pipeline (features are extracted before
any wide operation).
"""

from __future__ import annotations

import struct

import numpy as np

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, head_hex string"
)
# The featurizer itself lives as a closure inside
# operators/llm.py::multimodal_features — shipped UDFs must be
# closure-serialized, so a module-level copy here would be dead code
# that drifts from the one actually executed.


def decode_wav_pcm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed PCM WAV blob → (sample_rate, n_channels,
    samples as float64 in [-1, 1), shape (n_frames, n_channels)).

    Pure struct + numpy parsing of the canonical RIFF layout (chunk
    walk, so extra chunks like LIST don't break it). 16-bit PCM only —
    the format synthesize_wav emits and the overwhelmingly common case.
    Raises ValueError on anything that is not a PCM WAV."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    return sample_rate, n_channels, samples.reshape(-1, n_channels)


def decode_ppm_p6(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) blob → uint8 array (h, w, 3). Pure
    bytes parsing: ASCII header (magic, width, height, maxval ≤ 255)
    then raw RGB. Raises ValueError on anything else."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens, then ONE whitespace byte
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


def synthesize_wav(seed: int, n_frames: int = 800, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a fixed-point sine whose
    frequency derives from the seed. Gives the decode path REAL wav
    bytes to chew on without codec libs or binary fixtures."""
    freq = 200 + (seed % 40) * 25  # 200..1175 Hz
    t = np.arange(n_frames, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 12000.0).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload.

    Real for the pure-bytes container formats (audio/wav via
    decode_wav_pcm, image/ppm via decode_ppm_p6); a clearly-marked
    STUB for codec-compressed formats — those need libraries
    (Pillow/ffmpeg) not present in this environment. The Spark
    plumbing is identical either way; swap in a codec here to light up
    the rest."""
    if media_type == "audio/wav":
        return decode_wav_pcm(payload)
    if media_type == "image/ppm":
        return decode_ppm_p6(payload)
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries; "
        "this build decodes pure-bytes formats (audio/wav, image/ppm) "
        "and ships the Spark plumbing + a deterministic fake featurizer "
        "for the rest (see operators/llm.py::multimodal_features)"
    )
