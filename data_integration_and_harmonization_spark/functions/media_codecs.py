"""Stdlib+numpy media codecs for the multimodal operators.

This environment ships no codec library (PIL/opencv/ffmpeg), so the
engine implements the three public formats its multimodal tests and
fixtures need directly from their published specifications:

- PNG  (W3C PNG spec / RFC 2083): zlib-compressed filtered scanlines.
  Supported: bit depth 8, color types 0/2/3/4/6, non-interlaced.
- GIF  (GIF89a specification): LZW-compressed palette frames.
  Supported: global/local color tables, multi-frame, non-interlaced.
- WAV  (RIFF/PCM): via the stdlib ``wave`` module, 8/16-bit PCM.

Decoding is per-payload Python — the right cost model here, because
the operators call these inside Arrow-batched ``mapInPandas`` where
the parallelism unit is the batch, not the byte. These spec-level
codecs are CANONICAL for decode (``multimodal.decode_real`` tries
them first — deterministic, dependency-free, covered by the
spec-derived oracle); :func:`try_pil_decode` is only the rescue path
for format variants outside the supported subset, when PIL happens
to be importable.

Encoders exist so tests and fixtures can synthesize real media
without any external dependency (PNG filter-0 rows; GIF with a
literal LZW stream; WAV via ``wave``).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
GIF_MAGICS = (b"GIF87a", b"GIF89a")

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'png' | 'gif' | 'wav' | None."""
    if payload is None:
        return None
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:6] in GIF_MAGICS:
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PNG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 array.

    Implements chunk walk, zlib inflate, and scanline unfiltering per
    the spec. Filters 0 (none) and 2 (up) are fully vectorized; 1
    (sub) uses a per-lane cumulative sum (mod-256 addition chain); 3
    (average) and 4 (Paeth) depend on the left-neighbor RECONSTRUCTED
    pixel, so they walk pixels left-to-right vectorizing across
    channels.
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:
            rec = row
        elif f == 1:  # sub: additive chain per pixel lane
            rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride)
        elif f == 2:  # up
            rec = row + prev
        elif f == 3:  # average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                left = (row[s] + ((left + (prev[s] & 0xFF)) >> 1)) & 0xFF
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s] & 0xFF
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (row[s] + pred) & 0xFF
                rec[s] = left
                ul = up
        else:
            raise ValueError(f"bad PNG filter {f}")
        rec = rec & 0xFF
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0, one IDAT)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample — deterministic, no interpolation
    ambiguity across platforms (pixel centers, the classic formula)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------- GIF


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable code width (LSB-first bit packing),
    clear/end codes, 12-bit dictionary cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        table.clear()
        table.extend([[i] for i in range(clear)] + [[], []])
        return min_code_size + 1

    width = reset()
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (dict-based, emits clear code first)."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    seq: tuple[int, ...] = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12) + 1:  # table full: clear + restart
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = (idx,)
    if seq:
        emit(table[seq])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF -> list of full-canvas (H, W, 3) uint8 frames.

    Each image descriptor is decoded and composed onto the logical
    screen at its (left, top) rect — frame k is the canvas state after
    drawing image k (disposal methods beyond draw-over are not
    modeled; fixtures don't use them)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[payload[11]]  # background color index
    frames: list[np.ndarray] = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            size = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + size])
            pos += size + 1
        pos += 1
        idx = _lzw_decode(bytes(data), min_code)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data truncated")
        rect = table[np.asarray(idx[: iw * ih], dtype=np.int32)].reshape(ih, iw, 3)
        canvas[top : top + ih, left : left + iw] = rect
        frames.append(canvas.copy())
    return frames


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """List of (H, W, 3) uint8 frames (same size, <=256 distinct colors
    across all frames) -> animated GIF89a bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports <=256 distinct colors")
    # pad palette to a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    padded = np.zeros((1 << bits, 3), dtype=np.uint8)
    padded[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg=0, aspect=0
    out += padded.tobytes()
    n_px = h * w
    min_code = max(2, bits)
    for k in range(len(frames)):
        idx = inverse[k * n_px : (k + 1) * n_px].tolist()
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, (n_samples, n_channels) float64 in [-1, 1])."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return rate, arr.reshape(-1, ch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(n, ch) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    import wave

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ----------------------------------------------------- PIL preference


def try_pil_decode(payload: bytes) -> np.ndarray | None:
    """Decode an image payload with PIL when it's importable — the
    RESCUE path for variants the spec codec doesn't cover (interlaced
    PNG, 16-bit depth, exotic modes); None when PIL is absent or
    fails. Native band counts (L/LA/RGB/RGBA) are preserved so the
    features match what :func:`decode_png` would produce for the same
    pixel layout; other modes normalize to RGB."""
    try:
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(payload)) as im:
            if im.mode not in ("L", "LA", "RGB", "RGBA"):
                im = im.convert("RGB")
            return np.asarray(im)
    except Exception:
        return None
