"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The multimodal-columns north star (BASELINE.json): image/audio/video
travel as ``BinaryType`` columns with typed metadata beside them;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.

Decode support is split by what the container can honestly do:

- **Container formats with pure-bytes layouts decode for real**:
  uncompressed PCM WAV (RIFF header + samples — stdlib ``struct`` +
  numpy) and binary PPM (P6 — ASCII header + raw RGB). The registered
  query ``multimodal_decode_wav`` runs this path end to end.
- **PNG decodes for real too** (``decode_png``): a genuinely
  DEFLATE-compressed format handled with stdlib ``zlib`` + ``struct``
  — chunk walk, CRC check, IDAT inflate, all five per-row unfilters.
  ``multimodal_decode_png`` runs it end to end.
- **GIF decodes for real as well** (``decode_gif``): a genuinely
  LZW-compressed format with a pure-python variable-code-width LZW
  decoder (CLEAR resets, cScSc immediate-use case, 12-bit cap),
  extension skipping, sub-block reassembly and 4-pass de-interlacing;
  validated against real-world encoder output.
  ``multimodal_decode_gif`` runs it end to end.
- **Codec-compressed formats (JPEG/MP4/Opus...) remain a
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
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _paeth(left: int, up: int, upleft: int) -> int:
    """The Paeth predictor (PNG spec §9.4)."""
    p = left + up - upleft
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else upleft


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG blob → uint8 array (h, w, channels) with pure
    stdlib ``zlib`` + ``struct`` — a REAL decode of a genuinely
    DEFLATE-compressed format, no codec libraries: chunk walk with
    CRC32 verification, concatenated-IDAT inflate, then per-row
    unfiltering of all five PNG filter types (None/Sub/Up/Average/
    Paeth). Supports 8-bit depth, color types 0/2/4/6 (gray, RGB,
    gray+alpha, RGBA), non-interlaced — the shapes synthesize_png
    emits and the overwhelmingly common web case. Raises ValueError
    on anything else (palette, 16-bit, Adam7).

    The per-row unfilter runs vectorized where the recurrence allows
    (Up is a plain numpy add); Sub/Average/Paeth are sequential in
    the defined byte order. Inside mapInPandas this is per-task
    Python — fine for the decode-stage demonstration; a production
    deployment swaps in a codec lib behind the same decode_media
    dispatch."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 12 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if zlib.crc32(cid + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {cid!r} chunk")
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, color={ctype}, "
            f"interlace={interlace}); 8-bit 0/2/4/6 non-interlaced only"
        )
    nch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match IHDR dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for i in range(nch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - nch])) & 0xFF
        elif ftype == 2:  # Up — uint8 add wraps mod 256, vectorized
            cur = line + prev
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                upleft = int(prev[i - nch]) if i >= nch else 0
                cur[i] = (
                    int(line[i]) + _paeth(left, int(prev[i]), upleft)
                ) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, nch)


def synthesize_png(seed: int, w: int = 24, h: int = 16, ctype: int = 2) -> bytes:
    """Deterministic PNG bytes: a seed-derived 8-bit pixel gradient,
    DEFLATE-compressed with the row filter type CYCLING 0→4 so a
    decoder must exercise every unfilter path (None, Sub, Up, Average,
    Paeth) on every image — the forward filters here are the spec's
    §9 definitions, byte order and all. Gives the decode path real
    compressed PNGs without codec libs or binary fixtures."""
    nch = _PNG_CHANNELS[ctype]
    stride = w * nch
    # seed-derived pixels with enough structure that every filter
    # actually transforms the row
    yy, xx = np.mgrid[0:h, 0:stride]
    img = ((xx * 7 + yy * 13 + seed * 31) + (xx * yy) // 3).astype(np.uint8)
    filtered = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = img[y]
        ftype = y % 5
        filtered.append(ftype)
        if ftype == 0:
            enc = cur
        elif ftype == 1:  # Sub
            enc = cur.copy()
            enc[nch:] = (cur[nch:].astype(np.int16) - cur[:-nch]) & 0xFF
        elif ftype == 2:  # Up
            enc = cur - prev
        elif ftype == 3:  # Average
            enc = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                enc[i] = (int(cur[i]) - ((left + int(prev[i])) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                upleft = int(prev[i - nch]) if i >= nch else 0
                enc[i] = (
                    int(cur[i]) - _paeth(left, int(prev[i]), upleft)
                ) & 0xFF
        filtered.extend(enc.tobytes())
        prev = cur

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


def _gif_interlace_order(h: int) -> list[int]:
    """Row output order of a GIF interlaced image (the 4-pass scheme
    from the GIF89a spec, appendix E)."""
    return [y for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)]


def lzw_encode_gif(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavored LZW compression (variable code width, LSB-first
    bit packing, CLEAR/EOI codes, 12-bit table cap with reset) — the
    encoder side synthesize_gif uses so the decode path gets REAL
    compressed streams. Width grows when the just-added table entry's
    index reaches 2^width (the standard non-early-change rule); a full
    4096-entry table emits CLEAR and starts over."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    buf = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for b in bytes(indices):
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset mid-stream
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def lzw_decode_gif(data: bytes, min_code_size: int) -> bytearray:
    """GIF-flavored LZW decompression — the table-building decoder
    with the immediate-use (cScSc) case, CLEAR resets, and the
    one-entry-behind width rule (grow when the table length reaches
    2^width, capped at 12 bits). Raises ValueError on codes beyond
    the table (corrupt stream)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    singles = [bytes([i]) for i in range(clear)]

    def fresh() -> list[bytes]:
        return singles + [b"", b""]  # CLEAR/EOI placeholders

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:  # first code after a clear: plain lookup
            if code >= len(table):
                raise ValueError("corrupt LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # cScSc: the just-about-to-exist entry
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def decode_gif(payload: bytes):
    """Decode a GIF blob's FIRST image → (palette uint8 (n, 3),
    indices uint8 (h, w), interlaced bool) with pure stdlib bytes
    parsing + the LZW decoder above — a REAL decode of a genuinely
    LZW-compressed format, no codec libraries: header + logical
    screen descriptor, global/local color table, extension-block
    skipping, sub-block reassembly, variable-width LZW, and 4-pass
    de-interlacing. Raises ValueError on anything that is not a
    GIF87a/GIF89a still image — including payloads truncated mid
    sub-block, which the byte walk would otherwise surface as
    IndexError/struct.error (r7 advice)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as ex:
        raise ValueError(f"truncated GIF payload: {ex}") from ex


def _decode_gif_body(payload: bytes):
    pos = 6
    _sw, _sh, packed, _bg, _par = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    palette = None
    if packed & 0x80:  # global color table
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(
            payload, np.uint8, n * 3, pos
        ).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image without a color table")
            interlaced = bool(ipacked & 0x40)
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:  # sub-block reassembly
                size = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = np.frombuffer(
                bytes(lzw_decode_gif(bytes(lzw), mcs)[: w * h]), np.uint8
            )
            if idx.size != w * h:
                raise ValueError(
                    f"LZW stream decoded to {idx.size} pixels, "
                    f"descriptor says {w}x{h}"
                )
            rows = idx.reshape(h, w)
            if interlaced:
                out = np.zeros_like(rows)
                out[_gif_interlace_order(h)] = rows
                rows = out
            if int(rows.max(initial=0)) >= palette.shape[0]:
                raise ValueError("pixel index beyond the color table")
            return palette, rows, interlaced
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def synthesize_gif(seed: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic GIF89a bytes: a 16-color global palette and a
    seed-derived index raster, REALLY LZW-compressed by
    lzw_encode_gif, with odd seeds written INTERLACED (the 4-pass row
    order) so every decode exercises de-interlacing, plus a Graphic
    Control Extension so extension skipping runs on every payload.
    Both the palette and the raster are pure integer programs of
    (seed, x, y), which is what lets multimodal_decode_gif's oracle
    regenerate the decoded output in SQL (operators/llm.py)."""
    n_colors = 16
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((xx * 3 + yy * 5 + (xx * yy) // 7 + seed) % n_colors).astype(
        np.uint8
    )
    pal = bytes(
        (j * 47 + c * 101 + seed * 13 + 29) % 256
        for j in range(n_colors)
        for c in range(3)
    )
    interlaced = bool(seed % 2)
    raster = (idx[_gif_interlace_order(h)] if interlaced else idx).tobytes()
    mcs = 4  # 16 colors -> 4-bit codes
    lzw = lzw_encode_gif(raster, mcs)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (3 << 4) | 3, 0, 0)
        + pal
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: no transparency
        + struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0
        )
        + bytes([mcs])
        + bytes(sub)
        + b"\x3b"
    )


def synthesize_wav(seed: int, n_frames: int = 800, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: an INTEGER sawtooth whose
    step derives from the seed. Gives the decode path REAL wav bytes
    to chew on without codec libs or binary fixtures. Integer (not
    sine) on purpose: libm/numpy sin is not bit-identical across
    implementations, while this pure-integer program regenerates
    exactly in SQL — which is what gives multimodal_decode_wav a full
    differential oracle (operators/llm.py) instead of a rows-only
    check."""
    step = 100 + (seed % 40) * 25  # sawtooth increment per frame
    i = np.arange(n_frames, dtype=np.int64)
    pcm = (((i * step) % 24000) - 12000).astype("<i2")
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
    if media_type == "image/png":
        return decode_png(payload)
    if media_type == "image/gif":
        return decode_gif(payload)
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries; "
        "this build decodes pure-bytes formats (audio/wav, image/ppm), "
        "DEFLATE-compressed PNG (image/png, stdlib zlib) and "
        "LZW-compressed GIF (image/gif, pure-python LZW) and ships "
        "the Spark plumbing + a deterministic fake featurizer for the "
        "rest (see operators/llm.py::multimodal_features)"
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) uint8 image — the
    thumbnail/downsample stage of a multimodal pipeline, pure numpy
    (no imaging libs). Sample points sit at output-pixel centers
    (floor((i + 0.5) * H / out_h)), the standard NN convention, so
    results match common library implementations for integer factors
    and stay deterministic for all shapes."""
    h, w = img.shape[0], img.shape[1]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[ri][:, ci]
