"""Baseline JPEG luma decoder (operators/_jpeg.py): round-trip against a
minimal in-test encoder (forward DCT + canonical huffman, quant = ones so
the only loss is DCT/IDCT rounding), plus unsupported-format guards and
the end-to-end Spark image path on JPEG blobs with no PIL installed."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from glamr_omics_pipelines_spark.operators import multimodal
from glamr_omics_pipelines_spark.operators._jpeg import (
    _ZIGZAG, _idct_matrix, decode_jpeg_luma)

# Encoder-side huffman tables (arbitrary but canonical; the decoder reads
# them from DHT, so they only need to satisfy T.81 Annex C):
# DC: 12 symbols (sizes 0-11) all at code length 5.
_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_DC_VALS = list(range(12))
# AC: EOB, ZRL, and every (run 0-15, size 1-10) pair, all at length 8.
_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)                  # pad with 1s


def _encode_block(bw, block, pred):
    m = _idct_matrix()
    coefs = m @ (block.astype(np.float64) - 128.0) @ m.T
    zz = [int(round(coefs.flat[_ZIGZAG[k]])) for k in range(64)]
    diff = zz[0] - pred
    t = diff.bit_length() if diff > 0 else (-diff).bit_length()
    ln, code = _DC_CODES[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        ln, code = _AC_CODES[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = _AC_CODES[0x00]          # EOB
        bw.put(code, ln)
    return zz[0]


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([tc << 4 | th] + bits + vals))


def _encode_jpeg(gray, subsample=False, restart=0):
    """Encode a gray image as baseline JPEG. subsample=True emits a
    3-component 4:2:0 file whose chroma blocks are all-zero (gray pixels
    have Cb=Cr=128, i.e. zero after level shift)."""
    h, w = gray.shape
    qt = _seg(0xDB, bytes([0x00] + [1] * 64))      # quant table 0: all ones
    if subsample:
        comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
        sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                   + bytes([3]) + comps)
        sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        mcu_w, mcu_h, y_blocks = 16, 16, [(0, 0), (0, 8), (8, 0), (8, 8)]
    else:
        sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                   + bytes([1, 1, 0x11, 0]))
        sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        mcu_w, mcu_h, y_blocks = 8, 8, [(0, 0)]
    dht = _dht(0, 0, _DC_BITS, _DC_VALS) + _dht(1, 0, _AC_BITS, _AC_VALS)
    dri = _seg(0xDD, struct.pack(">H", restart)) if restart else b""

    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    padded = np.full((mcus_y * mcu_h, mcus_x * mcu_w), 128, dtype=np.uint8)
    padded[:h, :w] = gray
    data = bytearray()
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst, since = 0, 0
    for mcu in range(mcus_x * mcus_y):
        if restart and since == restart:
            bw.flush()
            data += bw.out + bytes([0xFF, 0xD0 + rst])
            bw = _BitWriter()
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
            since = 0
        my, mx = divmod(mcu, mcus_x)
        for r0, c0 in y_blocks:
            tile = padded[my * mcu_h + r0:my * mcu_h + r0 + 8,
                          mx * mcu_w + c0:mx * mcu_w + c0 + 8]
            preds[0] = _encode_block(bw, tile, preds[0])
        if subsample:
            zero = np.full((8, 8), 128, dtype=np.uint8)
            preds[1] = _encode_block(bw, zero, preds[1])
            preds[2] = _encode_block(bw, zero, preds[2])
        since += 1
    bw.flush()
    data += bw.out
    return (b"\xff\xd8" + qt + sof + dht + dri + sos
            + bytes(data) + b"\xff\xd9")


def _roundtrip_close(gray, **kw):
    out = decode_jpeg_luma(_encode_jpeg(gray, **kw))
    assert out.shape == gray.shape
    diff = np.abs(out.astype(int) - gray.astype(int)).max()
    assert diff <= 1, diff


def test_jpeg_gray_roundtrip_exactish():
    rng = np.random.RandomState(11)
    _roundtrip_close(rng.randint(0, 256, (16, 16)).astype(np.uint8))


def test_jpeg_non_multiple_of_8_crops():
    rng = np.random.RandomState(5)
    _roundtrip_close(rng.randint(0, 256, (13, 11)).astype(np.uint8))


def test_jpeg_420_three_component_luma():
    rng = np.random.RandomState(7)
    _roundtrip_close(rng.randint(0, 256, (16, 32)).astype(np.uint8),
                     subsample=True)


def test_jpeg_restart_markers():
    rng = np.random.RandomState(3)
    _roundtrip_close(rng.randint(0, 256, (24, 24)).astype(np.uint8),
                     restart=1)
    _roundtrip_close(rng.randint(0, 256, (24, 24)).astype(np.uint8),
                     restart=2)


def test_jpeg_rejects_unsupported():
    assert decode_jpeg_luma(b"notajpeg") is None
    blob = _encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_luma(blob[:40])                   # truncated
    # flip SOF0 -> SOF2: since r8 progressive is DECODED, and a baseline
    # scan header (Ss=0, Se=63) is CORRUPT under SOF2 scan rules — raises
    prog = bytearray(blob)
    idx = blob.index(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_luma(bytes(prog))
    # arithmetic-coded (SOF9) stays a VALID file out of scope -> None so
    # the caller falls through to PIL, never decode_error
    arith = bytearray(blob)
    arith[idx + 1] = 0xC9
    assert decode_jpeg_luma(bytes(arith)) is None


def test_image_features_real_path_jpeg_end_to_end(spark):
    """stub=False image features on a JPEG blob with NO PIL installed:
    the luma of a two-level image lands in the right histogram bins
    (DCT rounding keeps values within +-1 of 0/255, which fold into the
    same feature slots at feature_dim=4)."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[:, 4:] = 255
    blob = _encode_jpeg(img)
    rows = [Row(media_id=1, media_type="image", content=blob,
                meta=Row(width=8, height=8, duration_ms=None, codec="jpeg"))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_image_features(df, feature_dim=4,
                                            stub=False).collect()[0]
    assert out.decode_ok == "ok"
    # bins 0/1 -> slots 0/1; bins 254/255 -> slots 2/3
    assert out.feature[0] + out.feature[1] == pytest.approx(0.5)
    assert out.feature[2] + out.feature[3] == pytest.approx(0.5)


def test_ns1_first_scan_of_multicomponent_frame_falls_through():
    """ADVICE r7: an Ns=1 first scan of a multi-component file is only
    decodable when it is the FULL-RESOLUTION LUMA component — a
    chroma-only or subsampled-component first scan must return None (PIL
    fall-through), never decode as luma on the wrong grid."""
    import struct

    def sof_sos(comps, scan_comp_id):
        # comps: list of (id, h, v, tq)
        sof_body = struct.pack(">BHHB", 8, 16, 16, len(comps))
        for cid, h, v, tq in comps:
            sof_body += bytes([cid, (h << 4) | v, tq])
        sos_body = bytes([1, scan_comp_id, 0x00, 0, 63, 0])
        return (b"\xff\xd8"
                + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body))
                + sof_body
                + b"\xff\xda" + struct.pack(">H", 2 + len(sos_body))
                + sos_body)

    ycc = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    # chroma-component (id 3) first scan: valid, out of scope -> None
    assert decode_jpeg_luma(sof_sos(ycc, scan_comp_id=3)) is None
    # luma first but SUBSAMPLED relative to another component -> None
    weird = [(1, 1, 1, 0), (2, 2, 2, 1), (3, 1, 1, 1)]
    assert decode_jpeg_luma(sof_sos(weird, scan_comp_id=1)) is None
    # unknown component id in the scan stays CORRUPT -> raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_jpeg_luma(sof_sos(ycc, scan_comp_id=9))
