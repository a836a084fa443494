"""Multimodal (image/audio/video) column plumbing (north-star extension).

Design: media are opaque ``binary`` columns + typed metadata structs; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so bytes move executor-side in columnar batches and
never through the driver.

Codecs are an OPTIONAL dependency: ``stub=True`` (default) yields
deterministic fake features derived from the raw bytes — bit-stable, which
is what the correctness oracle compares — while ``stub=False`` runs a real
decode. Fully functional with NO third-party codec: netpbm (P5/P6),
uncompressed 24/32-bit BMP, complete PNG (all bit depths, palette, Adam7
interlace; stdlib zlib inflate + per-scanline unfilter), GIF (LZW, first
frame) images via numpy parsers, baseline + progressive JPEG via
``operators/_jpeg.py``, RIFF/WAV PCM + G.711 + IMA ADPCM audio, and
YUV4MPEG2 (Y4M) uncompressed + Motion-JPEG AVI video via numpy
luma-plane parsers. Valid-but-out-of-scope image variants (arithmetic/
lossless/12-bit/CMYK JPEG)
fall through to PIL via an executor-side try-import that raises
``NotImplementedError`` only when a blob genuinely needs PIL and PIL is
absent. The stdlib image decoder is tried FIRST even when PIL is
installed (same 601-2 fixed-point luma as PIL's convert("L")), so a blob
decodes identically in every environment. The Spark-side plumbing
(schema, batch iteration, partitioning, UDF signature) is identical on
both paths and tested on both.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

from glamr_omics_pipelines_spark.operators import _cache

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image|audio|video
    StructField("content", BinaryType()),
    StructField("meta", StructType([
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    # double (not float32): the stub's byte-histogram arithmetic is exact in
    # doubles, which keeps the duckdb correctness oracle bit-identical
    StructField("feature", ArrayType(DoubleType())),
    StructField("decode_ok", StringType()),
])


def _import_pil_image():
    """Executor-side optional import: the real codec path needs PIL only for
    formats the stdlib decoder can't parse (png/jpeg/...); the stub path
    never touches it, so environments without PIL keep working (and the
    oracle stays bit-stable on the stub)."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL (pip install pillow) for this "
            "format; netpbm (P5/P6), uncompressed BMP and non-interlaced "
            "8-bit PNG decode without it; "
            "use stub=True for the deterministic fallback") from exc
    return Image


# ITU-R 601-2 luma in PIL's exact 16-bit fixed-point form — using the same
# constants keeps a blob's grayscale IDENTICAL whether it went through the
# stdlib decoder or PIL's convert("L"), so results never depend on which
# environment decoded it.
def _rgb_to_gray(rgb):
    import numpy as np
    r = rgb[..., 0].astype("u4")
    g = rgb[..., 1].astype("u4")
    b = rgb[..., 2].astype("u4")
    return ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype("u1")


def _parse_netpbm(buf: bytes):
    """Binary netpbm raster → grayscale uint8 array (P5 = gray, P6 = RGB
    reduced via the 601-2 luma). Returns None when the magic isn't netpbm
    (caller falls through to PIL); raises on a malformed/truncated raster
    (caller maps that to a row-level decode_error)."""
    import numpy as np
    if buf[:2] not in (b"P5", b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(buf):
            raise ValueError("truncated netpbm header")
        c = buf[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":                       # comment to end-of-line
            nl = buf.find(b"\n", pos)
            pos = len(buf) if nl < 0 else nl + 1
        elif c.isdigit():
            end = pos
            while end < len(buf) and buf[end:end + 1].isdigit():
                end += 1
            fields.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        raise ValueError(f"unsupported netpbm geometry {w}x{h} max={maxval}")
    # Exactly ONE whitespace byte separates maxval from the raster (netpbm
    # spec).  A CRLF-terminated header (Windows text-mode writer) would
    # otherwise shift the raster by one byte and decode silently-corrupt
    # pixels: validate the separator and reject the CRLF pair per the
    # length rule below (ADVICE r7 + r8 review). Benign trailing bytes
    # AFTER a complete raster remain accepted — some writers append a
    # final newline.
    if not buf[pos:pos + 1].isspace():
        raise ValueError("netpbm: maxval not followed by whitespace")
    ch = 1 if buf[:2] == b"P5" else 3
    need = w * h * ch
    # Reject the CRLF pair whenever the raster would STILL FIT after
    # skipping both bytes (r8 review: equality alone let a CRLF writer
    # with a trailing final newline decode shifted, silently corrupt).
    # The lone-'\r' + first-pixel-0x0A file is accepted only when the
    # raster fits EXCLUSIVELY under the one-byte skip — when both
    # readings fit, rejecting is the safe side of an inherent ambiguity.
    if buf[pos:pos + 2] == b"\r\n" and len(buf) - (pos + 2) >= need:
        raise ValueError("netpbm: CRLF-terminated header would shift the "
                         "raster; rewrite the header with unix newlines")
    pos += 1
    if len(buf) - pos < need:
        raise ValueError("truncated netpbm raster")
    data = np.frombuffer(buf, dtype="u1", count=need, offset=pos)
    if ch == 1:
        return data.reshape(h, w)
    return _rgb_to_gray(data.reshape(h, w, 3))


def _parse_bmp(buf: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BMP → grayscale uint8 array, handling
    4-byte row padding and both bottom-up (height > 0) and top-down
    (height < 0) row orders. Returns None when the magic isn't 'BM';
    raises on compressed / palettized / truncated files."""
    import numpy as np
    if buf[:2] != b"BM":
        return None
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down, h = h < 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP geometry {w}x{h}")
    nbytes = bpp // 8
    stride = ((nbytes * w + 3) // 4) * 4       # rows padded to 4 bytes
    if len(buf) - data_off < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(buf, dtype="u1", count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : nbytes * w].reshape(h, w, nbytes)
    if not top_down:
        px = px[::-1]
    return _rgb_to_gray(px[..., [2, 1, 0]])    # stored BGR(A)


def _unfilter_png_row(ftype: int, row, prev, ch: int):
    """Reconstruct one PNG scanline (filter types 0-4, RFC 2083 §6).
    None/Up/Sub are vectorized (Up: uint8 wrap-add; Sub: per-lane cumsum
    mod 256); Average/Paeth carry a non-linear left-pixel dependence and
    run as an int loop over the row."""
    import numpy as np
    if ftype == 0:
        return row
    if ftype == 2:
        return (row + prev).astype(np.uint8)
    if ftype not in (1, 3, 4):
        raise ValueError(f"bad PNG filter type {ftype}")
    if ftype == 1:
        # Sub is a per-channel-lane prefix sum mod 256 — vectorize it:
        # pad the row to a lane multiple, cumsum down each lane, trim.
        n = len(row)
        lanes = -(-n // ch)
        padded = np.zeros(lanes * ch, dtype=np.int64)
        padded[:n] = row
        recon = padded.reshape(lanes, ch).cumsum(axis=0) & 0xFF
        return recon.reshape(-1)[:n].astype(np.uint8)
    # Average/Paeth have a non-linear left+up dependence — serial by
    # nature. Fine for thumbnails/tiles (the multimodal scale contract);
    # pre-resize giant photographic assets upstream or ship PIL.
    r = row.astype(np.int32)
    p = prev.astype(np.int32)
    out = np.zeros_like(r)
    for x in range(len(r)):
        a = int(out[x - ch]) if x >= ch else 0
        b = int(p[x])
        if ftype == 3:
            v = r[x] + ((a + b) >> 1)
        else:  # Paeth predictor
            c = int(p[x - ch]) if x >= ch else 0
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = r[x] + pred
        out[x] = v & 0xFF
    return out.astype(np.uint8)


# Adam7 interlace pass layout (RFC 2083 §2.6): (x_start, y_start,
# x_step, y_step) per pass; pass sub-images are concatenated in the one
# zlib stream, each filtered independently.
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

# Valid (color_type -> bit depths) combinations, RFC 2083 §6
_PNG_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8},
               4: {8, 16}, 6: {8, 16}}


def _png_subimage(raw, off: int, w: int, h: int, depth: int, ch: int, np):
    """Unfilter one (sub)image's scanlines starting at ``raw[off]``;
    returns (uint16 sample array (h, w, ch), next offset). Filters
    operate byte-wise with the spec's bpp (bytes per complete pixel,
    rounded up to 1), independent of bit depth."""
    if w == 0 or h == 0:
        return None, off
    bpp = max(1, (depth * ch + 7) // 8)
    stride = (w * ch * depth + 7) // 8
    need = (stride + 1) * h
    if len(raw) - off < need:
        raise ValueError(f"PNG raster size mismatch: {len(raw) - off} "
                         f"bytes for {h} scanlines of {stride + 1}")
    rows = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        o = off + y * (stride + 1)
        row = np.frombuffer(raw, np.uint8, stride, offset=o + 1).copy()
        prev = _unfilter_png_row(raw[o], row, prev, bpp)
        rows[y] = prev
    if depth == 16:
        samples = (rows.view(">u2").astype(np.uint16)
                   .reshape(h, w, ch))
    elif depth == 8:
        samples = rows.reshape(h, w, ch).astype(np.uint16)
    else:                             # 1/2/4-bit: ch == 1 by the spec
        bits = np.unpackbits(rows, axis=1)[:, :w * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        samples = ((bits.reshape(h, w, depth) * weights)
                   .sum(axis=2, dtype=np.uint16).reshape(h, w, 1))
    return samples, off + need


def _parse_png(buf: bytes):
    """Dependency-free PNG decode (stdlib zlib + numpy; VERDICT r6 #5,
    completed r8): every valid PNG still image — gray / gray+alpha /
    RGB / RGBA / palette, bit depths 1/2/4/8/16, non-interlaced and
    Adam7-interlaced — → grayscale uint8 via the same 601-2 fixed-point
    luma as the other decoders. Alpha and tRNS are ignored (matching
    PIL's convert("L") on the color content); 16-bit samples reduce to
    their high byte (PIL's I;16→L convention); sub-8-bit gray scales to
    the full 0-255 range (x·255/(2^d−1), the spec's display mapping).
    Returns None only when the magic isn't PNG; raises ValueError on
    CORRUPT files (truncated chunks, bad depth/color combinations,
    inflate failures, raster size mismatches, missing or malformed PLTE,
    out-of-range palette indices)."""
    import struct
    import zlib
    import numpy as np
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, width, idat, plte = 8, None, [], None
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated PNG IHDR")
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc32
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if (color_type not in _PNG_DEPTHS
            or bit_depth not in _PNG_DEPTHS[color_type]
            or interlace not in (0, 1)):
        raise ValueError(f"invalid PNG color/depth/interlace combination "
                         f"({color_type}/{bit_depth}/{interlace})")
    if width == 0 or height == 0:
        # both branches, uniformly (r8 review: the interlaced path used
        # to return an empty 'ok' array for a zero-height file)
        raise ValueError("zero-dimension PNG")
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or not 3 <= len(plte) <= 768:
            raise ValueError("palette PNG with missing/malformed PLTE")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG inflate failed: {exc}") from None
    if interlace == 0:
        samples, off = _png_subimage(raw, 0, width, height, bit_depth,
                                     ch, np)
    else:                             # Adam7: scatter each pass's grid
        # validate the EXACT interlaced raster length BEFORE allocating
        # the sample grid: a hostile IHDR with dimensions near 2^32 must
        # raise ValueError here, never attempt a multi-TiB np.zeros
        # (r8 review: MemoryError broke the corrupt-file contract)
        expected = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw and ph:
                expected += ((pw * ch * bit_depth + 7) // 8 + 1) * ph
        if expected != len(raw):
            raise ValueError(f"PNG raster size mismatch: {len(raw)} bytes "
                             f"for an interlaced raster of {expected}")
        samples = np.zeros((height, width, ch), dtype=np.uint16)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            sub, off = _png_subimage(raw, off, pw, ph, bit_depth, ch, np)
            if sub is not None:
                samples[y0::ys, x0::xs] = sub
    if off != len(raw):
        raise ValueError(f"PNG raster size mismatch: {len(raw) - off} "
                         "trailing bytes after the last scanline")
    if color_type == 3:               # palette: index → RGB → luma
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return _rgb_to_gray(palette[idx])
    if bit_depth == 16:               # high byte, PIL's I;16→L convention
        pix = (samples >> 8).astype(np.uint8)
    elif bit_depth < 8:               # gray 1/2/4-bit: spec display scale
        pix = (samples * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
    else:
        pix = samples.astype(np.uint8)
    if ch in (1, 2):                  # gray / gray+alpha: luma channel
        return pix[:, :, 0]
    return _rgb_to_gray(pix[:, :, :3])  # RGB / RGBA (alpha ignored)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-variant LZW (LSB-first variable-width codes, CLEAR/END codes,
    12-bit dictionary cap with deferred-clear tolerance) → list of
    palette indices. Raises ValueError on malformed streams."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):          # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("GIF LZW output exceeds raster size")
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


# GIF interlace passes (GIF89a spec appendix E): (row start, row step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _parse_gif(buf: bytes):
    """Dependency-free GIF decode (r8): FIRST frame of a GIF87a/89a —
    LZW, global/local color table, interlacing — → grayscale uint8 via
    the same 601-2 fixed-point luma as the other decoders. Transparency
    is ignored (the transparent index renders as its palette color,
    consistent with the alpha-ignored PNG contract); pixels outside the
    first frame's sub-rectangle take the background color. Returns None
    when the magic isn't GIF; raises ValueError on corrupt files."""
    import struct
    import numpy as np
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(buf) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", buf[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("zero-dimension GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(buf) < pos + 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(buf, np.uint8, 3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(buf):
                raise ValueError("truncated GIF sub-blocks")
            n = buf[p]
            p += 1
            if n == 0:
                return p
            p += n

    while pos < len(buf):
        block = buf[pos]
        if block == 0x3B:             # trailer before any image
            raise ValueError("GIF has no image data")
        if block == 0x21:             # extension: label + sub-blocks
            if pos + 2 > len(buf):
                raise ValueError("truncated GIF extension")
            pos = skip_subblocks(pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 10 > len(buf):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", buf[pos + 1:pos + 10])
        pos += 10
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF frame outside logical screen")
        pal = gct
        if ipacked & 0x80:            # local color table
            n = 2 << (ipacked & 0x07)
            if len(buf) < pos + 3 * n:
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(buf, np.uint8, 3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(buf):
            raise ValueError("truncated GIF image data")
        min_code = buf[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad GIF LZW minimum code size {min_code}")
        chunks = []
        while True:
            if pos >= len(buf):
                raise ValueError("truncated GIF sub-blocks")
            n = buf[pos]
            pos += 1
            if n == 0:
                break
            chunks.append(buf[pos:pos + n])
            if len(chunks[-1]) < n:
                raise ValueError("truncated GIF sub-blocks")
            pos += n
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF raster underflow: {len(idx)}/{w * h}")
        arr = np.array(idx[:w * h], dtype=np.uint16)
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of range")
        frame = np.empty((h, w), dtype=np.uint16)
        if ipacked & 0x40:            # interlaced: 4-pass row shuffle
            rows = arr.reshape(h, w)
            src = 0
            for start, step in _GIF_INTERLACE:
                n_rows = len(range(start, h, step))
                frame[start::step] = rows[src:src + n_rows]
                src += n_rows
        else:
            frame = arr.reshape(h, w)
        # first frame only, composited onto the background color
        screen_idx = np.full((sh, sw), bg if gct is not None
                             and bg < len(gct) else 0, dtype=np.uint16)
        screen = _rgb_to_gray(gct[screen_idx]) if gct is not None else \
            np.zeros((sh, sw), dtype=np.uint8)
        screen[top:top + h, left:left + w] = _rgb_to_gray(pal[frame])
        return screen
    raise ValueError("GIF has no image data")


def _decode_image_gray(buf: bytes):
    """Dependency-free decode of the formats the stdlib+numpy parsers
    handle — netpbm P5/P6, uncompressed BMP, every valid PNG (all depths,
    palette, Adam7), GIF (LZW, first frame), and baseline/progressive
    JPEG (luma plane; operators/_jpeg.py) — to a grayscale uint8 array. Returns None for
    any other format (the caller falls through to PIL, now needed only
    for arithmetic/lossless/12-bit JPEG). Tried
    FIRST even when PIL is installed, so a given blob decodes identically
    in every environment."""
    from glamr_omics_pipelines_spark.operators._jpeg import decode_jpeg_luma
    arr = _parse_netpbm(buf)
    if arr is None:
        arr = _parse_bmp(buf)
    if arr is None:
        arr = _parse_png(buf)
    if arr is None:
        arr = _parse_gif(buf)
    if arr is None:
        arr = decode_jpeg_luma(buf)
    return arr


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _resize_grid(sh: int, sw: int, width: int, height: int):
    """Memoized pixel-center sample grid for :func:`_bilinear_resize`:
    (y0, y1, x0, x1, fy, fx), all read-only. Grid construction is pure
    shape arithmetic that the hash kernels were redoing per FRAME
    (guide §4.5)."""
    import numpy as np
    x = (np.arange(width) + 0.5) * (sw / width) - 0.5
    y = (np.arange(height) + 0.5) * (sh / height) - 0.5
    x0 = np.clip(np.floor(x).astype("i8"), 0, sw - 1)
    y0 = np.clip(np.floor(y).astype("i8"), 0, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    grids = (y0, y1, x0, x1, fy, fx)
    for g in grids:
        g.setflags(write=False)
    return grids


def _bilinear_resize(arr, width: int, height: int):
    """Deterministic pixel-center-aligned bilinear resample of a grayscale
    uint8 array (the textbook sample-grid form; NOT PIL's antialiased
    BILINEAR, which widens its kernel when downscaling — this path is the
    stdlib decoder's companion and defines its own contract)."""
    import numpy as np
    sh, sw = arr.shape
    y0, y1, x0, x1, fy, fx = _resize_grid(sh, sw, width, height)
    a = arr[np.ix_(y0, x0)].astype("f8")
    b = arr[np.ix_(y0, x1)].astype("f8")
    c = arr[np.ix_(y1, x0)].astype("f8")
    d = arr[np.ix_(y1, x1)].astype("f8")
    top = a * (1.0 - fx)[None, :] + b * fx[None, :]
    bot = c * (1.0 - fx)[None, :] + d * fx[None, :]
    out = top * (1.0 - fy)[:, None] + bot * fy[:, None]
    return np.clip(np.rint(out), 0, 255).astype("u1")


def _fold_histogram(hist, feature_dim: int) -> list[float]:
    """256-bin (or longer) histogram folded to feature_dim, L1-normalized —
    shared by the stub (byte histogram) and real (pixel histogram) kernels
    so both emit the same feature shape.

    Vectorized: the input (bytes / list of counts) is folded by padding to a
    multiple of feature_dim and column-summing the reshape — this was a
    per-BYTE Python loop, the hot path of the feature-extraction kernel
    (~60% of its wall at sf0.1). Values are bit-identical to the loop form:
    every addend is a small non-negative integer, so both sums are exact in
    float64 regardless of association order."""
    import numpy as np
    a = np.frombuffer(hist, dtype=np.uint8).astype(np.int64) \
        if isinstance(hist, (bytes, bytearray, memoryview)) \
        else np.asarray(hist, dtype=np.int64)
    pad = (-a.size) % feature_dim
    if pad:
        a = np.concatenate([a, np.zeros(pad, dtype=np.int64)])
    acc = a.reshape(-1, feature_dim).sum(axis=0) if a.size else \
        np.zeros(feature_dim, dtype=np.int64)
    total = float(acc.sum()) or 1.0
    return [v / total for v in acc.tolist()]


def _decode_image_batch(pdf: pd.DataFrame, feature_dim: int, stub: bool) -> pd.DataFrame:
    """Per-batch decode kernel. STUB: features = normalized byte histogram
    folded to feature_dim (deterministic in content). REAL (stub=False):
    grayscale pixel histogram folded the same way — netpbm/BMP decode via
    the dependency-free numpy parser (always available, tried first), other
    formats via PIL when installed (``NotImplementedError`` with an install
    hint when a blob needs PIL and PIL is absent). Malformed blobs of a
    recognized format flag decode_error instead of failing the task."""
    import io

    import numpy as np
    feats, oks = [], []
    for buf in pdf["content"]:
        if buf is None:
            feats.append(None)
            oks.append("null_content")
            continue
        if stub:
            feats.append(_fold_histogram(buf, feature_dim))
            oks.append("ok")
            continue
        b = bytes(buf)
        try:
            arr = _decode_image_gray(b)
        except Exception:  # recognized magic, malformed body: row-level flag
            feats.append(None)
            oks.append("decode_error")
            continue
        if arr is not None:
            hist = np.bincount(arr.ravel(), minlength=256).tolist()
        else:
            Image = _import_pil_image()   # raises NotImplementedError if absent
            try:
                img = Image.open(io.BytesIO(b))
                hist = img.convert("L").histogram()
            except Exception:  # undecodable blob: row-level flag, not task death
                feats.append(None)
                oks.append("decode_error")
                continue
        feats.append(_fold_histogram(hist, feature_dim))
        oks.append("ok")
    return pd.DataFrame({"media_id": pdf["media_id"],
                         "feature": feats, "decode_ok": oks})


PHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("phash", LongType()),
    StructField("decode_ok", StringType()),
])


import functools


@functools.lru_cache(maxsize=8)
def _dct2_matrix(n: int):
    """Orthonormal DCT-II basis matrix (row 0 scaled by 1/√2). Memoized —
    the hash kernels call this once per FRAME (guide §4.5: heavyweight
    init once per task, not per row); the cached array is marked
    read-only so no caller can corrupt the shared instance."""
    import numpy as np
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    m.setflags(write=False)
    return m


def _pack_sign_bits(bits) -> int:
    """Row-major bool[64] → signed 64-bit int (two's complement). Bit-exact
    replacement for the former 64-iteration Python shift loop: packbits
    puts bits[0] in the MSB of byte 0, so the big-endian int64 view IS the
    loop's result, sign bit included."""
    import numpy as np
    return int(np.frombuffer(np.packbits(bits).tobytes(), dtype=">i8")[0])


def _phash_of_gray(arr, hash_size: int = 8, img_size: int = 32) -> int:
    """64-bit perceptual hash of a grayscale array: bilinear resample to
    ``img_size``², orthonormal 2-D DCT-II, the top-left
    ``hash_size``×``hash_size`` low-frequency block, bits = coefficient >
    median (median over the block EXCLUDING the DC term, so a uniform
    brightness shift — which only moves DC — cannot flip a single bit).
    Packed row-major into a signed 64-bit int (two's complement, the
    simhash packing convention)."""
    import numpy as np
    a = _bilinear_resize(arr, img_size, img_size).astype(np.float64)
    m = _dct2_matrix(img_size)
    c = (m @ a @ m.T)[:hash_size, :hash_size].ravel()
    med = np.median(c[1:])
    return _pack_sign_bits(c > med)


def _phash_of_gray_many(arrs, hash_size: int = 8, img_size: int = 32):
    """Batched :func:`_phash_of_gray` over same-shaped grayscale arrays —
    BIT-IDENTICAL results (pinned by tests): the resize is the same
    element-wise lerp over a stacked tensor (per-element float ops are
    association-free), the two DCT matmuls stay per-frame (the exact
    ``m @ a @ m.T`` BLAS calls — a reshaped single-GEMM form could change
    accumulation order and flip a coefficient-vs-median ulp boundary),
    and median/packbits vectorize exactly. The win is Python/numpy
    dispatch amortization over the batch (guide §4.2): per-frame grid and
    basis construction disappear and the bit packing is one call."""
    import numpy as np
    if not arrs:
        return []
    if len(arrs) > 64:
        # chunk: the resize gathers/lerps materialize 4 float64 copies of
        # the stacked tensor — beyond ~64 frames they fall out of L2 and
        # the batch runs SLOWER than the scalar loop (measured 270 vs 131
        # µs/frame at 512; 78 µs/frame chunked). Per-frame values are
        # independent, so chunking cannot change them.
        out = []
        for i in range(0, len(arrs), 64):
            out.extend(_phash_of_gray_many(arrs[i:i + 64],
                                           hash_size, img_size))
        return out
    A = np.stack(arrs)
    n, (sh, sw) = A.shape[0], A.shape[1:]
    y0, y1, x0, x1, fy, fx = _resize_grid(sh, sw, img_size, img_size)
    a = A[:, y0[:, None], x0[None, :]].astype("f8")
    b = A[:, y0[:, None], x1[None, :]].astype("f8")
    cc = A[:, y1[:, None], x0[None, :]].astype("f8")
    d = A[:, y1[:, None], x1[None, :]].astype("f8")
    top = a * (1.0 - fx)[None, None, :] + b * fx[None, None, :]
    bot = cc * (1.0 - fx)[None, None, :] + d * fx[None, None, :]
    out = top * (1.0 - fy)[None, :, None] + bot * fy[None, :, None]
    R = np.clip(np.rint(out), 0, 255).astype("u1").astype(np.float64)
    m = _dct2_matrix(img_size)
    C = np.empty((n, hash_size * hash_size), dtype=np.float64)
    for i in range(n):  # per-frame GEMMs: bit-exact with the scalar path
        C[i] = (m @ R[i] @ m.T)[:hash_size, :hash_size].ravel()
    med = np.median(C[:, 1:], axis=1)
    packed = np.packbits(C > med[:, None], axis=1)
    return [int(v) for v in
            np.frombuffer(packed.tobytes(), dtype=">i8")]


def _phash_scatter(indexed_arrs):
    """Hash [(pos, gray_array), ...] of MIXED shapes via shape-grouped
    :func:`_phash_of_gray_many` batches; returns {pos: hash}."""
    groups: dict = {}
    for pos, a in indexed_arrs:
        groups.setdefault(a.shape, ([], []))
        groups[a.shape][0].append(pos)
        groups[a.shape][1].append(a)
    out = {}
    for positions, arrs in groups.values():
        for pos, h in zip(positions, _phash_of_gray_many(arrs)):
            out[pos] = h
    return out


def _phash_batch(pdf: pd.DataFrame, stub: bool) -> pd.DataFrame:
    """Per-batch pHash kernel. STUB: content bytes cycled into a 32×32
    uint8 array (no decode — schema/DCT/packing still real). REAL: the
    dependency-free grayscale decode (_decode_image_gray; PIL fallback),
    same row-level decode_error contract as _decode_image_batch."""
    import io

    import numpy as np
    n = len(pdf["content"])
    hashes: list = [None] * n
    oks: list = [None] * n
    pending = []  # (row position, decoded gray array)
    for i, buf in enumerate(pdf["content"]):
        if buf is None:
            oks[i] = "null_content"
            continue
        b = bytes(buf)
        arr = None
        if stub:
            if not b:
                oks[i] = "decode_error"
                continue
            flat = np.frombuffer(b, dtype=np.uint8)
            reps = -(-1024 // len(flat))
            arr = np.tile(flat, reps)[:1024].reshape(32, 32)
        else:
            try:
                arr = _decode_image_gray(b)
            except Exception:
                oks[i] = "decode_error"
                continue
            if arr is None:
                Image = _import_pil_image()
                try:
                    img = Image.open(io.BytesIO(b))
                    arr = np.asarray(img.convert("L"), dtype=np.uint8)
                except Exception:
                    oks[i] = "decode_error"
                    continue
        oks[i] = "ok"
        pending.append((i, arr))
    # hash all decoded rows in shape-grouped batches (bit-identical to the
    # per-row kernel; the batching amortizes the numpy dispatch — §4.2)
    for pos, h in _phash_scatter(pending).items():
        hashes[pos] = h
    return pd.DataFrame({"media_id": pdf["media_id"],
                         "phash": pd.array(hashes, dtype="Int64"),
                         "decode_ok": oks})


AFP_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("afp", LongType()),
    StructField("decode_ok", StringType()),
])


def _afp_of_samples(samples, frame: int = 1024, hop: int = 512,
                    bands: int = 16) -> int:
    """64-bit audio fingerprint: spectrogram pHash. Frames of ``frame``
    samples every ``hop`` → |rFFT|² → ``bands`` equal bin groups →
    log energy matrix (frames × bands; floored at 1e-12·peak so the
    floor itself scales with gain) → per-clip min-max affine to uint8
    → the SAME resize→DCT→sign pipeline as the image hash
    (_phash_of_gray). Volume scaling multiplies energies AND the
    gain-relative floor by c², i.e. shifts the log matrix by the
    constant log(c²), which the affine normalization removes EXACTLY —
    gain-invariant by construction even on quiet clips (pytest-pinned;
    log1p would only approximate this when band energies >> 1).
    Constant (silent) clips normalize to the all-zero matrix."""
    return _phash_of_gray(_afp_matrix(samples, frame, hop, bands))


def _afp_matrix(samples, frame: int = 1024, hop: int = 512,
                bands: int = 16):
    """The spectrogram-normalization half of :func:`_afp_of_samples`,
    returning the uint8 log-energy matrix the pHash kernel consumes —
    split out so :func:`_afp_batch` can batch the hash stage across a
    whole Arrow batch (§4.2)."""
    import numpy as np
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < frame:
        raise ValueError("clip shorter than one analysis frame")
    n_frames = 1 + (len(x) - frame) // hop
    idx = (np.arange(frame)[None, :]
           + hop * np.arange(n_frames)[:, None])
    spec = np.abs(np.fft.rfft(x[idx], axis=1)) ** 2
    # drop the DC bin, group the rest into equal bands
    usable = (spec.shape[1] - 1) // bands * bands
    e = spec[:, 1:1 + usable].reshape(n_frames, bands, -1).sum(axis=2)
    peak = e.max()
    if peak > 0:
        m = np.log(np.maximum(e, 1e-12 * peak))
    else:
        m = np.zeros_like(e)
    rng = m.max() - m.min()
    if rng > 0:
        m = (m - m.min()) / rng * 255.0
    else:
        m = np.zeros_like(m)
    return m.astype(np.uint8)


def _afp_batch(pdf: pd.DataFrame, stub: bool) -> pd.DataFrame:
    """Per-batch audio-fingerprint kernel. STUB: raw bytes re-centered as
    crude 8-bit samples (no decode — framing/FFT/hash still real). REAL:
    _decode_wav_samples (PCM 8/16/24/32, G.711, IMA ADPCM; stereo
    averaged), same row-level decode_error contract as the image path."""
    import numpy as np
    n = len(pdf["content"])
    out: list = [None] * n
    oks: list = [None] * n
    pending = []  # (row position, normalized spectrogram matrix)
    for i, buf in enumerate(pdf["content"]):
        if buf is None:
            oks[i] = "null_content"
            continue
        b = bytes(buf)
        try:
            if stub:
                samples = np.frombuffer(b, dtype=np.uint8).astype(
                    np.float64) - 128.0
            else:
                samples = _decode_wav_samples(b)
                if samples is None:
                    raise ValueError("not a decodable WAV")
            pending.append((i, _afp_matrix(samples)))
            oks[i] = "ok"
        except Exception:
            oks[i] = "decode_error"
    # hash stage batched across the Arrow batch (bit-identical — §4.2)
    for pos, h in _phash_scatter(pending).items():
        out[pos] = h
    return pd.DataFrame({"media_id": pdf["media_id"],
                         "afp": pd.array(out, dtype="Int64"),
                         "decode_ok": oks})


def afp_signatures(df: DataFrame, stub: bool = True) -> DataFrame:
    """binary audio content → 64-bit gain-invariant fingerprint via
    Arrow-batched mapInPandas — the audio member of the signature-dedup
    triangle (text simhash / image phash / audio afp); near-dup pairs
    come from dedup.hamming_candidates' banded equi join. Scale shape:
    hashing is scan-stage; only the 8-byte fingerprint reaches a
    shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _afp_batch(pdf, stub)

    return df.select("media_id", "content").mapInPandas(run, AFP_SCHEMA)


def phash_images(df: DataFrame, stub: bool = True) -> DataFrame:
    """binary content → 64-bit perceptual hash (pHash: 32×32 bilinear →
    2-D DCT-II → 8×8 low-frequency signs vs median) via Arrow-batched
    mapInPandas — the image twin of simhash_signatures: identical images
    hash identically regardless of container bytes, re-encodes/resizes/
    brightness shifts land within a small Hamming ball (resize and DC
    invariance pytest-pinned), and near-dup pairs come from
    dedup.hamming_candidates' banded equi join, never an all-pairs scan.

    Scale shape: hashing is scan-stage (batches stream through each task);
    the 8-byte hash is all that ever reaches a shuffle — at 100 TB of
    images the dedup runs on ~0.1 GB per billion images of signature data.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _phash_batch(pdf, stub)

    return df.select("media_id", "content").mapInPandas(run, PHASH_SCHEMA)


def extract_image_features(df: DataFrame, feature_dim: int = 16,
                           stub: bool = True) -> DataFrame:
    """binary content → feature vector via Arrow-batched mapInPandas.

    Scale shape: batches stream through each task (constant memory in rows ×
    batch size, never whole-partition materialization); repartition upstream
    by media_id range if individual blobs are large so tasks stay balanced.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_image_batch(pdf, feature_dim, stub)

    cols = df.select("media_id", "content")
    return cols.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("resize_ok", StringType()),
])


def resize_images(df: DataFrame, width: int, height: int,
                  stub: bool = True) -> DataFrame:
    """binary content → resized binary via Arrow-batched mapInPandas.

    STUB kernel: emits a deterministic content transform (byte stream
    truncated/cycled to width*height bytes) so schema, batch iteration and
    output sizing are real. REAL kernel (stub=False): decode + bilinear
    resize to (width, height), grayscale raw bytes out — netpbm/BMP via the
    dependency-free numpy parser + pixel-center bilinear (tried first, no
    third-party codec needed), other formats via PIL's convert("L") +
    BILINEAR when installed (NotImplementedError with an install hint when
    a blob needs PIL and PIL is absent). Same constant-memory batch shape
    as extract_image_features.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        for pdf in batches:
            out_content, oks = [], []
            target = width * height
            for buf in pdf["content"]:
                if buf is None:
                    out_content.append(None)
                    oks.append("null_content")
                    continue
                if stub:
                    reps = (target // max(len(buf), 1)) + 1
                    out_content.append((bytes(buf) * reps)[:target])
                    oks.append("ok")
                    continue
                b = bytes(buf)
                try:
                    arr = _decode_image_gray(b)
                except Exception:  # recognized magic, malformed body
                    out_content.append(None)
                    oks.append("decode_error")
                    continue
                if arr is not None:
                    out_content.append(
                        _bilinear_resize(arr, width, height).tobytes())
                    oks.append("ok")
                    continue
                Image = _import_pil_image()   # raises if genuinely absent
                try:
                    img = Image.open(io.BytesIO(b))
                    resized = img.convert("L").resize((width, height),
                                                      Image.BILINEAR)
                    out_content.append(resized.tobytes())
                    oks.append("ok")
                except Exception:
                    out_content.append(None)
                    oks.append("decode_error")
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "content": out_content,
                "width": [width] * len(pdf), "height": [height] * len(pdf),
                "resize_ok": oks})

    return df.select("media_id", "content").mapInPandas(kernel, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms) rows
    from metadata (decode stubbed). The explode is pure-JVM; the eventual
    frame decode plugs in as another mapInPandas stage — for uncompressed
    YUV4MPEG2 content, :func:`extract_video_frame_features` IS that stage."""
    frames = F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                        F.lit(every_ms))
    return (df.filter(F.col("media_type") == "video")
            .select("media_id", F.explode(frames).alias("frame_ts_ms")))


# Chroma subsampling → bytes per frame relative to the w*h luma plane.
_Y4M_FRAME_FACTORS = {"420": 3 / 2, "422": 2, "444": 3, "mono": 1}


def _parse_y4m_luma_frames(buf: bytes):
    """Dependency-free YUV4MPEG2 parse: yields (frame_idx, h×w uint8 luma
    plane) for every frame. Y4M is the uncompressed video interchange format
    (a text stream header `YUV4MPEG2 W.. H.. F.. [C..]`, then per-frame
    `FRAME...\\n` + raw planes) — the video analog of netpbm: numpy-parseable
    with no codec. Raises on malformed/truncated input; unsupported chroma
    modes raise too (caller maps to a row-level decode_error)."""
    import numpy as np
    if not buf.startswith(b"YUV4MPEG2"):
        return None
    nl = buf.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    w = h = None
    chroma = "420"
    for param in buf[9:nl].split():
        tag, val = param[:1], param[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            chroma = val.decode("ascii", "replace")
            for known in _Y4M_FRAME_FACTORS:
                if chroma.startswith(known):
                    chroma = known
                    break
            else:
                raise ValueError(f"unsupported Y4M chroma mode {chroma!r}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    luma = w * h
    frame_bytes = int(luma * _Y4M_FRAME_FACTORS[chroma])
    pos, idx, frames = nl + 1, 0, []
    while pos < len(buf):
        if buf[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or len(buf) - fnl - 1 < frame_bytes:
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(buf, dtype="u1", count=luma,
                          offset=fnl + 1).reshape(h, w)
        frames.append((idx, y))
        idx += 1
        pos = fnl + 1 + frame_bytes
    return frames


def _parse_avi_mjpeg_frames(buf: bytes):
    """Motion-JPEG AVI (r8): walk the RIFF chunk tree, collect the FIRST
    video stream's '##dc'/'##db' frame chunks and decode each as a JPEG
    through ``operators/_jpeg.py`` — compressed video with zero new codec
    code. Returns [(frame_idx, h×w uint8 luma)], None when the magic
    isn't RIFF/AVI, and raises ValueError for corrupt containers or
    non-MJPEG payloads (video has no PIL fall-through; the kernel maps
    the raise to a row-level decode_error)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    from glamr_omics_pipelines_spark.operators._jpeg import decode_jpeg_luma
    chunks: list[tuple[bytes, bytes]] = []
    # explicit stack, not recursion (ADVICE r8): a hostile AVI of ~12-byte
    # nested LISTs reaches depth ~len/12 and a recursive walk would raise
    # RecursionError, escaping the module's ValueError-only corrupt-bytes
    # contract; the stack form is depth-unbounded by construction
    stack: list[tuple[int, int]] = [(12, len(buf))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            sz = int.from_bytes(buf[pos + 4:pos + 8], "little")
            body_start = pos + 8
            body_end = body_start + sz
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                # resume THIS level after the list body so frame chunks
                # stay in container order (depth-first == byte order here:
                # the list body precedes the resume point in the file)
                stack.append((body_end + (sz & 1), end))
                pos, end = body_start + 4, body_end  # skip the type tag
                continue
            if cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                chunks.append((cid[:2], buf[body_start:body_end]))
            pos = body_end + (sz & 1)            # chunks are word-aligned
    if not chunks:
        raise ValueError("AVI has no video frame chunks")
    first_stream = chunks[0][0]
    out = []
    idx = 0
    for stream, payload in chunks:
        if stream != first_stream:
            continue
        if payload[:2] != b"\xff\xd8":
            raise ValueError("AVI video stream is not MJPEG")
        luma = decode_jpeg_luma(payload)
        if luma is None:
            raise ValueError("AVI MJPEG frame uses a JPEG variant outside "
                             "the decoder's scope")
        out.append((idx, luma))
        idx += 1
    return out


def _parse_video_luma_frames(buf: bytes):
    """Dispatch the dependency-free video parsers: Y4M (uncompressed),
    then MJPEG AVI. None when no magic matches."""
    frames = _parse_y4m_luma_frames(buf)
    if frames is None:
        frames = _parse_avi_mjpeg_frames(buf)
    return frames


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("feature", ArrayType(DoubleType())),
    StructField("decode_ok", StringType()),
])


VHASH_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("vhash", LongType()),
    StructField("decode_ok", StringType()),
])


def vhash_frames(df: DataFrame, every_n: int = 1,
                 stub: bool = True) -> DataFrame:
    """binary video content → one 64-bit perceptual hash per sampled frame
    (every ``every_n``-th) via Arrow-batched mapInPandas — the video
    member of the signature-dedup family: each sampled luma plane goes
    through the SAME resize→DCT→sign kernel as the image hash
    (_phash_of_gray), so re-encodes and uniform brightness shifts of a
    frame land on the same hash (the image-kernel invariances carry over).

    STUB kernel: consecutive 1024-byte windows of the raw content as
    32×32 pseudo-frames (partial tail window dropped) — no decode, the
    1→N shape and hashing real. REAL kernel (``stub=False``):
    dependency-free Y4M / MJPEG-AVI luma decode
    (_parse_video_luma_frames); unrecognized/truncated blobs flag ONE
    ``decode_error`` row.

    Scale: hashing is scan-stage; a clip collapses to ~n_frames × 8
    bytes of signature — what :func:`video_dup_pairs`' inverted-index
    join actually shuffles at 100 TB of video.
    """
    if every_n < 1:
        raise ValueError("vhash_frames: every_n must be >= 1")
    import numpy as np

    def one(buf):
        if buf is None:
            return [(None, None, "null_content")]
        b = bytes(buf)
        rows = []
        try:
            if stub:
                flat = np.frombuffer(b, dtype=np.uint8)
                frames = ((i, flat[i * 1024:(i + 1) * 1024]
                           .reshape(32, 32))
                          for i in range(len(flat) // 1024))
            else:
                frames = _parse_video_luma_frames(b)
                if frames is None:
                    raise ValueError("unrecognized video container")
            for idx, plane in frames:
                if idx % every_n:
                    continue
                rows.append((idx, plane, "ok"))
        except Exception:
            return [(None, None, "decode_error")]
        if not rows:
            return [(None, None, "empty_content")]
        return rows

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, planes, oks = [], [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                # decode only here; hashing runs batch-wide below so the
                # DCT kernel is amortized over ALL the batch's frames
                # (bit-identical per-frame values — §4.2)
                for idx, plane, ok in one(buf):
                    ids.append(mid)
                    idxs.append(idx)
                    planes.append(plane)
                    oks.append(ok)
            hs: list = [None] * len(planes)
            for pos, h in _phash_scatter(
                    [(i, p) for i, p in enumerate(planes)
                     if p is not None]).items():
                hs[pos] = h
            yield pd.DataFrame({
                "media_id": ids,
                "frame_idx": pd.array(idxs, dtype="Int64"),
                "vhash": pd.array(hs, dtype="Int64"),
                "decode_ok": oks})

    return df.select("media_id", "content").mapInPandas(run, VHASH_SCHEMA)


def video_dup_pairs(frames: DataFrame, min_shared: int = 1,
                    id_col: str = "media_id",
                    hash_col: str = "vhash") -> DataFrame:
    """Clip-level near-dup pairs from per-frame hashes: two clips pair
    when they share ≥ ``min_shared`` DISTINCT frame hashes; containment =
    shared / min(|A|, |B|) over distinct-hash counts (1.0 when one clip's
    sampled frames all appear in the other — the re-cut/subsequence case).

    Scale shape: distinct (clip, hash) pairs partial-agg map-side, then
    ONE equi self-join on the 8-byte frame hash (the inverted-index
    shape — candidate volume bounded by per-hash clip-list sizes, never
    all-pairs) + a pair-grain count; per-clip distinct counts broadcast
    back. Output: (id_a, id_b, n_shared, containment).
    """
    if min_shared < 1:
        raise ValueError("video_dup_pairs: min_shared must be >= 1")
    fh = (frames.filter(F.col(hash_col).isNotNull())
          .select(F.col(id_col).alias("_id"),
                  F.col(hash_col).alias("_h")).distinct())
    fh = _cache.register(fh)
    counts = fh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = fh.select(F.col("_id").alias("id_a"), "_h")
    b = fh.select(F.col("_id").alias("id_b"), "_h")
    pairs = (a.join(b, "_h").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
    ca = F.broadcast(counts.select(F.col("_id").alias("id_a"),
                                   F.col("_n").alias("_na")))
    cb = F.broadcast(counts.select(F.col("_id").alias("id_b"),
                                   F.col("_n").alias("_nb")))
    return (pairs.join(ca, "id_a").join(cb, "id_b")
            .select("id_a", "id_b", "n_shared",
                    F.round(F.col("n_shared")
                            / F.least("_na", "_nb"), 6)
                    .alias("containment")))


def extract_video_frame_features(df: DataFrame, every_n: int = 1,
                                 feature_dim: int = 16,
                                 stub: bool = True) -> DataFrame:
    """binary video content → one luma-histogram feature row per sampled
    frame (every ``every_n``-th), via Arrow-batched ``mapInPandas`` — the
    1→N frame-sampling stage behind :func:`sample_video_frames`'s plan.

    STUB kernel (default): the content is treated as equal 1024-byte
    pseudo-frames and each sampled window's byte histogram is folded by the
    shared ``_fold_histogram`` — deterministic in content, what the oracle
    pins. REAL kernel (``stub=False``): dependency-free YUV4MPEG2 decode
    (420/422/444/mono chroma; only the luma plane is read) with the SAME
    fold over each sampled frame's pixel histogram, and Motion-JPEG AVI
    (r8: RIFF walk + the _jpeg decoder per frame); unrecognized or
    truncated blobs flag ``decode_error`` per row. Inter-frame codecs
    (h264/vp9) would slot in via ffmpeg, which this container does not
    ship.

    Scale: constant-memory batch streaming like the image/audio kernels;
    rows are emitted per batch, and only every_n-th frame's histogram is
    materialized — a long recording never lives as one Python list.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ids, idxs, feats, oks = [], [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    ids.append(mid); idxs.append(0)
                    feats.append(None); oks.append("null_content")
                    continue
                b = bytes(buf)
                if stub:
                    if not b:
                        ids.append(mid); idxs.append(0)
                        feats.append(None); oks.append("empty_content")
                        continue
                    for i in range(0, (len(b) + 1023) // 1024):
                        if i % every_n:
                            continue
                        ids.append(mid); idxs.append(i)
                        feats.append(_fold_histogram(b[i * 1024:(i + 1) * 1024],
                                                     feature_dim))
                        oks.append("ok")
                    continue
                try:
                    frames = _parse_video_luma_frames(b)
                    if frames is None:
                        raise ValueError("not a YUV4MPEG2 / MJPEG-AVI "
                                         "stream")
                except Exception:
                    ids.append(mid); idxs.append(0)
                    feats.append(None); oks.append("decode_error")
                    continue
                if not frames:
                    ids.append(mid); idxs.append(0)
                    feats.append(None); oks.append("empty_content")
                    continue
                for idx, y in frames:
                    if idx % every_n:
                        continue
                    hist = np.bincount(y.ravel(), minlength=256).tolist()
                    ids.append(mid); idxs.append(idx)
                    feats.append(_fold_histogram(hist, feature_dim))
                    oks.append("ok")
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "feature": feats, "decode_ok": oks})

    return (df.filter(F.col("media_type") == "video")
            .select("media_id", "content")
            .mapInPandas(kernel, VIDEO_FRAME_SCHEMA))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("window_idx", LongType()),
    StructField("rms", DoubleType()),
    StructField("decode_ok", StringType()),
])

# sample widths the stdlib wave module can emit -> numpy dtype for the PCM
# payload; 24-bit needs manual sign extension so it is handled separately
_PCM_DTYPES = {1: "u1", 2: "<i2", 4: "<i4"}


def _g711_luts():
    """256-entry decode tables for G.711 companded audio (the CCITT
    reference expansion, ITU-T G.711 / classic g711.c): returns
    (ulaw_to_linear16, alaw_to_linear16) int32 numpy arrays."""
    import numpy as np
    b = np.arange(256, dtype=np.int32)
    # mu-law
    u = (~b) & 0xFF
    seg = (u & 0x70) >> 4
    t = (((u & 0x0F) << 3) + 0x84) << seg
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84)
    # A-law
    a = b ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    alaw = np.where(a & 0x80, t, -t)   # sign bit SET means positive in A-law
    return ulaw, alaw


def _parse_wav_companded(buf: bytes):
    """Manual RIFF parse for the compressed formats the stdlib ``wave``
    module rejects: G.711 (format tag 6 = A-law, 7 = mu-law; expanded
    through the CCITT LUTs) and IMA/DVI ADPCM (tag 0x11, the common
    4-bit compressed WAV — r8), both to linear 16-bit. Returns
    (samples_i32 interleaved, nchannels) or None when the container
    isn't RIFF/WAVE or the format tag isn't one of these."""
    import numpy as np
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        sz = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + sz]
        if cid in (b"fmt ", b"data") and len(body) < sz:
            raise ValueError(f"truncated WAV {cid.decode().strip()} chunk: "
                             f"{len(body)} of {sz} bytes")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)          # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 4:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    nch = int.from_bytes(fmt[2:4], "little") or 1
    if audio_format == 0x11:              # IMA/DVI ADPCM (r8)
        if len(fmt) < 16:
            raise ValueError("truncated WAV fmt chunk")
        block_align = int.from_bytes(fmt[12:14], "little")
        return _decode_ima_adpcm(data, nch, block_align), nch
    if audio_format not in (6, 7):
        return None
    ulaw, alaw = _g711_luts()
    lut = alaw if audio_format == 6 else ulaw
    return lut[np.frombuffer(data, dtype="u1")], nch


# IMA ADPCM reference tables (IMA Digital Audio Focus Group, 1992 — the
# same tables every implementation ships)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM nibble → (new predictor, new step index)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nibble & 0x0F]))
    return pred, idx


def _decode_ima_adpcm(data: bytes, nch: int, block_align: int):
    """IMA/DVI ADPCM (WAV format tag 0x11) → interleaved int16 samples.
    Per block per channel: a 4-byte header (initial predictor i16le,
    initial step index u8, reserved) — the predictor IS the block's
    first output sample — then nibble payload in 4-byte per-channel
    groups, low nibble first. Trailing partial blocks are decoded as far
    as they go (encoders pad the final block)."""
    import numpy as np
    if nch not in (1, 2):
        raise ValueError(f"unsupported IMA ADPCM channel count {nch}")
    if block_align < 4 * nch or block_align % (4 * nch):
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    out: list[int] = []
    for boff in range(0, len(data) - 4 * nch + 1, block_align):
        block = data[boff:boff + block_align]
        preds, idxs = [], []
        for c in range(nch):
            h = block[4 * c:4 * c + 4]
            preds.append(int.from_bytes(h[0:2], "little", signed=True))
            step_idx = h[2]
            if step_idx > 88:
                raise ValueError(f"bad IMA ADPCM step index {step_idx}")
            idxs.append(step_idx)
        out.extend(preds)                 # header predictor = sample 0
        payload = block[4 * nch:]
        # per-channel 4-byte groups, interleaved by channel
        for g in range(0, len(payload), 4 * nch):
            chunk = payload[g:g + 4 * nch]
            if len(chunk) < 4 * nch:
                break                     # truncated final group
            frame = [[0] * 8 for _ in range(nch)]
            for c in range(nch):
                for b in range(4):
                    byte = chunk[4 * c + b]
                    for half, nib in ((0, byte & 0x0F), (1, byte >> 4)):
                        preds[c], idxs[c] = _ima_step(nib, preds[c],
                                                      idxs[c])
                        frame[c][2 * b + half] = preds[c]
            for s in range(8):            # re-interleave per sample
                for c in range(nch):
                    out.append(frame[c][s])
    if not out:
        raise ValueError("IMA ADPCM stream with no complete block header")
    return np.array(out, dtype=np.int32)


def _decode_wav_samples(buf: bytes):
    """Real audio decode: parse a RIFF/WAV container with the stdlib
    ``wave`` module and return channel-averaged PCM samples as a float64
    numpy array (8-bit PCM is unsigned per the WAV spec and is centered at
    128 before averaging). G.711 A-law/mu-law payloads (format tags 6/7,
    which ``wave`` rejects) are expanded to linear 16-bit through the
    CCITT reference tables. Raises on non-WAV / truncated buffers — the
    caller maps that to a row-level decode_error flag."""
    import io
    import wave

    import numpy as np
    try:
        with wave.open(io.BytesIO(buf), "rb") as wf:
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except wave.Error:
        companded = _parse_wav_companded(buf)
        if companded is None:
            raise
        samples, nch = companded
        samples = samples.astype("f8")
        if nch > 1:
            samples = samples[: (len(samples) // nch) * nch]
            samples = samples.reshape(-1, nch).mean(axis=1)
        return samples
    if width == 3:  # 24-bit: pad each LE triplet to 4 bytes, arithmetic shift
        raw = np.frombuffer(frames, dtype="u1")
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype="u1")
        padded[:, 1:] = raw
        samples = (padded.view("<i4").ravel() >> 8).astype("f8")
    elif width in _PCM_DTYPES:
        samples = np.frombuffer(frames, dtype=_PCM_DTYPES[width]).astype("f8")
        if width == 1:
            samples -= 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples


def extract_audio_windows(df: DataFrame, window_bytes: int | None = None,
                          stub: bool = True,
                          window_samples: int | None = None) -> DataFrame:
    """binary audio content → per-window features via Arrow-batched
    ``mapInPandas`` — the audio twin of ``extract_image_features``, with a
    row EXPLOSION inside the kernel (one input blob yields one row per
    window), exercising the 1→N batch shape a real frame/window extractor
    needs.

    STUB kernel (default): RMS of raw bytes per ``window_bytes``-byte window
    (default 1024), deterministic in content (exact integer arithmetic until
    one final sqrt) — what the correctness oracle pins. REAL kernel
    (``stub=False``): stdlib ``wave`` decode of RIFF/WAV PCM (8/16/24/32-bit,
    multi-channel averaged) plus G.711 A-law/mu-law payloads (format tags
    6/7, CCITT reference expansion) and RMS over ``window_samples``-sample
    windows (default 1024) of the actual waveform — no third-party codec
    needed; non-WAV or truncated blobs flag ``decode_error`` per row instead
    of killing the task. Perceptual formats (mp3/ogg) would slot into the
    same kernel via librosa/ffmpeg, which this container does not ship.

    The window size params are per-path (bytes of raw content vs decoded
    samples); passing the wrong one for the selected path raises rather
    than being silently ignored. Degenerate rows behave identically on both
    paths: null content → one ``null_content`` row, decodable-but-empty
    content (zero bytes / a 0-frame WAV) → one ``empty_content`` row.

    Scale: same constant-memory batch streaming as the image path; window
    rows are emitted per batch, so a long recording never materializes as
    one python list across batches.
    """
    if stub and window_samples is not None:
        raise ValueError("window_samples applies to the real decode path "
                         "(stub=False); use window_bytes for the stub path")
    if not stub and window_bytes is not None:
        raise ValueError("window_bytes applies to the stub path; use "
                         "window_samples for the real decode path "
                         "(stub=False)")
    wb = window_bytes if window_bytes is not None else 1024
    ws = window_samples if window_samples is not None else 1024

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, oks = [], [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    ids.append(mid); widx.append(0)
                    rms.append(None); oks.append("null_content")
                    continue
                b = bytes(buf)
                if stub:
                    if not b:
                        ids.append(mid); widx.append(0)
                        rms.append(None); oks.append("empty_content")
                        continue
                    for w in range(0, len(b), wb):
                        win = b[w:w + wb]
                        ids.append(mid)
                        widx.append(w // wb)
                        rms.append((sum(x * x for x in win) / len(win)) ** 0.5)
                        oks.append("ok")
                    continue
                try:
                    samples = _decode_wav_samples(b)
                except Exception:
                    ids.append(mid); widx.append(0)
                    rms.append(None); oks.append("decode_error")
                    continue
                if len(samples) == 0:
                    ids.append(mid); widx.append(0)
                    rms.append(None); oks.append("empty_content")
                    continue
                for w in range(0, len(samples), ws):
                    win = samples[w:w + ws]
                    ids.append(mid)
                    widx.append(w // ws)
                    rms.append(float((win * win).mean() ** 0.5))
                    oks.append("ok")
            yield pd.DataFrame({"media_id": ids, "window_idx": widx,
                                "rms": rms, "decode_ok": oks})

    return (df.filter(F.col("media_type") == "audio")
            .select("media_id", "content")
            .mapInPandas(kernel, AUDIO_FEATURES_SCHEMA))
