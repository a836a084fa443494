"""Progressive JPEG (SOF2) luma decoder: round-trip against an in-test
progressive encoder (spectral selection bands, DC/AC successive
approximation, EOB runs, correction bits, restart markers — T.81 Annex G)
and cross-checked against the BASELINE path: both encoders start from the
identical quantized coefficients (quant = ones), so progressive decode
must equal baseline decode EXACTLY, not just within DCT rounding."""

import struct

import numpy as np
import pytest

from glamr_omics_pipelines_spark.operators._jpeg import (
    _ZIGZAG, _idct_matrix, decode_jpeg_luma)
from tests.test_jpeg import (
    _AC_VALS, _DC_BITS, _DC_CODES, _DC_VALS,
    _BitWriter, _canonical_codes, _dht, _encode_jpeg, _seg)

# Progressive AC scans additionally need the EOBn symbols (r<<4, r=1..14)
# for EOB runs longer than one block; extend the baseline test table
# (canonical codes of the shared prefix are unchanged by appending).
_PAC_VALS = _AC_VALS + [r << 4 for r in range(1, 15)]
_PAC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PAC_VALS)] + [0] * 8
_PAC_CODES = _canonical_codes(_PAC_BITS, _PAC_VALS)


def _quantized_blocks(gray):
    """pixels -> {(row, col): 64 coefficients in ZIGZAG-scan order}
    (quant = ones, same forward DCT as the baseline test encoder)."""
    m = _idct_matrix()
    h, w = gray.shape
    nby, nbx = -(-h // 8), -(-w // 8)
    padded = np.full((nby * 8, nbx * 8), 128, dtype=np.uint8)
    padded[:h, :w] = gray
    out = {}
    for r in range(nby):
        for c in range(nbx):
            tile = padded[r * 8:r * 8 + 8, c * 8:c * 8 + 8]
            coefs = m @ (tile.astype(np.float64) - 128.0) @ m.T
            out[(r, c)] = [int(round(coefs.flat[_ZIGZAG[k]]))
                           for k in range(64)]
    return out, nby, nbx


def _put_code(bw, codes, sym):
    ln, code = codes[sym]
    bw.put(code, ln)


def _put_extend(bw, v, s):
    bw.put(v if v > 0 else v + (1 << s) - 1, s)


class _AcState:
    """EOB-run + buffered-correction-bit state for one AC scan segment.

    Two separate bit regions (the decoder reads them at different points):
    `run_br` — correction bits owned by the pending EOB run, emitted right
    after the EOBn symbol + its extension bits; `br` — the CURRENT block's
    correction bits since the last emitted symbol, emitted after the next
    symbol (ZRL or newly-significant) or folded into the run at block end.
    """

    def __init__(self, bw):
        self.bw = bw
        self.eobrun = 0
        self.run_br = []             # bits of blocks inside the EOB run
        self.br = []                 # current block's bits since last symbol

    def flush_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            _put_code(self.bw, _PAC_CODES, r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.run_br:
            self.bw.put(b, 1)
        self.run_br = []

    def emit_br(self):
        for b in self.br:
            self.bw.put(b, 1)
        self.br = []

    def end_block(self):
        """Trailing zeros and/or leftover correction bits: this block
        joins the EOB run; its bits transfer to the run's region."""
        self.eobrun += 1
        self.run_br += self.br
        self.br = []
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _encode_ac_first(state, zz, ss, se, al):
    """One block of a first-pass AC band scan (Ah=0): sign-magnitude
    shifted values, run/size symbols, shared EOB run."""
    vals = [(1 if zz[k] > 0 else -1) * (abs(zz[k]) >> al)
            for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()
        return
    state.flush_eobrun()
    last = nz[-1]
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            _put_code(state.bw, _PAC_CODES, 0xF0)
            r -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        _put_code(state.bw, _PAC_CODES, (r << 4) | s)
        _put_extend(state.bw, v, s)
        r = 0
    if last < se - ss:               # trailing zeros -> block joins a run
        state.eobrun += 1


def _encode_ac_refine(state, zz, ss, se, al):
    """One block of an AC refinement scan (Ah=Al+1): newly-significant
    coefficients as (run, 1)+sign, correction bits for already-nonzero
    ones buffered and emitted after the next symbol (T.81 G.1.2.3)."""
    bw = state.bw
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob = 0
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            state.flush_eobrun()
            _put_code(bw, _PAC_CODES, 0xF0)
            r -= 16
            state.emit_br()
        if t > 1:                    # already nonzero: one correction bit
            state.br.append(t & 1)
            continue
        state.flush_eobrun()
        _put_code(bw, _PAC_CODES, (r << 4) | 1)
        bw.put(1 if zz[ss + i] > 0 else 0, 1)
        state.emit_br()
        r = 0
    if r > 0 or state.br:
        state.end_block()


def _sos(comp_specs, ss, se, ah, al):
    body = bytes([len(comp_specs)])
    for cid, tdc, tac in comp_specs:
        body += bytes([cid, (tdc << 4) | tac])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _encode_jpeg_progressive(gray, dc_al=0, ac_bands=((1, 63),), ac_al=0,
                             restart=0, subsample=False,
                             chroma_ac_scan=False):
    """Progressive encoder: interleaved DC first scan at Al=dc_al plus
    bit-plane refinements down to 0, then per-band luma AC first scans at
    Al=ac_al plus refinements down to 0. subsample=True emits a
    3-component 4:2:0 frame (chroma blocks all-zero, DC interleaved);
    chroma_ac_scan adds a chroma AC band scan (exercises the decoder's
    chroma-scan skip). restart applies RSTn every `restart` MCUs in the
    DC scans and every `restart` blocks in the luma AC scans."""
    h, w = gray.shape
    blocks, nby, nbx = _quantized_blocks(gray)
    qt = _seg(0xDB, bytes([0x00] + [1] * 64))
    dht = _dht(0, 0, _DC_BITS, _DC_VALS) + _dht(1, 0, _PAC_BITS, _PAC_VALS)
    dri = _seg(0xDD, struct.pack(">H", restart)) if restart else b""
    if subsample:
        comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
        sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
                   + bytes([3]) + comps)
        mcus_x, mcus_y = -(-w // 16), -(-h // 16)
        comp_ids = [1, 2, 3]
    else:
        sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w)
                   + bytes([1, 1, 0x11, 0]))
        mcus_x, mcus_y = nbx, nby
        comp_ids = [1]

    def luma_blocks_of_mcu(mcu):
        my, mx = divmod(mcu, mcus_x)
        if not subsample:
            return [(my, mx)]
        return [(my * 2 + bv, mx * 2 + bh)
                for bv in range(2) for bh in range(2)]

    def dc_of(r, c):
        return blocks[(r, c)][0] if (r, c) in blocks else 0

    out = bytearray(b"\xff\xd8" + qt + sof + dht + dri)

    # ---- DC first scan (interleaved, Ah=0, Al=dc_al)
    bw = _BitWriter()
    body = bytearray()
    preds = {cid: 0 for cid in comp_ids}
    rst, since = 0, 0
    for mcu in range(mcus_x * mcus_y):
        if restart and since == restart:
            bw.flush()
            body += bw.out + bytes([0xFF, 0xD0 + rst])
            bw = _BitWriter()
            rst = (rst + 1) % 8
            preds = {cid: 0 for cid in comp_ids}
            since = 0
        for cid in comp_ids:
            units = luma_blocks_of_mcu(mcu) if cid == 1 else [None]
            for u in units:
                v = (dc_of(*u) >> dc_al) if u is not None else 0
                diff = v - preds[cid]
                preds[cid] = v
                t = diff.bit_length() if diff > 0 else (-diff).bit_length()
                _put_code(bw, _DC_CODES, t)
                if t:
                    _put_extend(bw, diff, t)
        since += 1
    bw.flush()
    out += (_sos([(cid, 0, 0) for cid in comp_ids], 0, 0, 0, dc_al)
            + bytes(body) + bw.out)

    # ---- DC refinement scans (one bit plane each)
    for al in range(dc_al - 1, -1, -1):
        bw = _BitWriter()
        rst, since = 0, 0
        body = bytearray()
        for mcu in range(mcus_x * mcus_y):
            if restart and since == restart:
                bw.flush()
                body += bw.out + bytes([0xFF, 0xD0 + rst])
                bw = _BitWriter()
                rst = (rst + 1) % 8
                since = 0
            for cid in comp_ids:
                units = luma_blocks_of_mcu(mcu) if cid == 1 else [None]
                for u in units:
                    v = dc_of(*u) if u is not None else 0
                    bw.put((v >> al) & 1, 1)
            since += 1
        bw.flush()
        out += (_sos([(cid, 0, 0) for cid in comp_ids], 0, 0, al + 1, al)
                + bytes(body) + bw.out)

    # ---- luma AC band scans: first pass at ac_al, then refinements
    def ac_scan(ss, se, ah, al):
        nonlocal out
        bw = _BitWriter()
        state = _AcState(bw)
        body = bytearray()
        rst, since = 0, 0
        for r in range(nby):
            for c in range(nbx):
                if restart and since == restart:
                    state.flush_eobrun()
                    bw.flush()
                    body += bw.out + bytes([0xFF, 0xD0 + rst])
                    bw = _BitWriter()
                    state = _AcState(bw)
                    rst = (rst + 1) % 8
                    since = 0
                if ah == 0:
                    _encode_ac_first(state, blocks[(r, c)], ss, se, al)
                else:
                    _encode_ac_refine(state, blocks[(r, c)], ss, se, al)
                since += 1
        state.flush_eobrun()
        bw.flush()
        out += _sos([(1, 0, 0)], ss, se, ah, al) + bytes(body) + bw.out

    for ss, se in ac_bands:
        ac_scan(ss, se, 0, ac_al)
    for al in range(ac_al - 1, -1, -1):
        for ss, se in ac_bands:
            ac_scan(ss, se, al + 1, al)

    # ---- optional chroma AC scan (all-zero blocks -> one big EOB run):
    # exercises the decoder's skip-chroma-scan path
    if subsample and chroma_ac_scan:
        bw = _BitWriter()
        state = _AcState(bw)
        for _ in range(mcus_x * mcus_y):
            _encode_ac_first(state, [0] * 64, 1, 63, 0)
        state.flush_eobrun()
        bw.flush()
        out += _sos([(2, 0, 0)], 1, 63, 0, 0) + bw.out

    return bytes(out) + b"\xff\xd9"


def _prog_equals_baseline(gray, **kw):
    base_kw = {"subsample": kw.get("subsample", False)}
    want = decode_jpeg_luma(_encode_jpeg(gray, **base_kw))
    got = decode_jpeg_luma(_encode_jpeg_progressive(gray, **kw))
    assert got is not None, "progressive file fell through to None"
    assert got.shape == want.shape
    assert np.array_equal(got, want), \
        f"max diff {np.abs(got.astype(int) - want.astype(int)).max()}"


def test_spectral_selection_only():
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    _prog_equals_baseline(gray, ac_bands=((1, 5), (6, 20), (21, 63)))


def test_single_band_whole_spectrum():
    rng = np.random.RandomState(2)
    gray = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    _prog_equals_baseline(gray, ac_bands=((1, 63),))


def test_dc_successive_approximation():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    _prog_equals_baseline(gray, dc_al=2, ac_bands=((1, 63),))


def test_ac_successive_approximation():
    rng = np.random.RandomState(4)
    gray = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    _prog_equals_baseline(gray, ac_bands=((1, 8), (9, 63)), ac_al=2)


def test_full_progressive_420_with_chroma_scan_skip():
    rng = np.random.RandomState(5)
    gray = rng.randint(0, 256, (32, 16)).astype(np.uint8)
    _prog_equals_baseline(gray, dc_al=1, ac_bands=((1, 5), (6, 63)),
                          ac_al=1, subsample=True, chroma_ac_scan=True)


def test_progressive_restart_markers():
    rng = np.random.RandomState(6)
    gray = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    _prog_equals_baseline(gray, dc_al=1, ac_bands=((1, 63),), ac_al=1,
                          restart=2)


def test_progressive_odd_geometry_crops():
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (13, 11)).astype(np.uint8)
    _prog_equals_baseline(gray, dc_al=1, ac_bands=((1, 2), (3, 63)), ac_al=1)


def test_progressive_truncated_raises():
    rng = np.random.RandomState(8)
    gray = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    blob = _encode_jpeg_progressive(gray, ac_bands=((1, 63),))
    with pytest.raises(ValueError):
        decode_jpeg_luma(blob[:len(blob) // 2])


def test_progressive_subsampled_luma_falls_through():
    # luma NOT at full resolution -> valid, out of scope -> None
    ihdr = bytes([8]) + struct.pack(">HH", 16, 16) \
        + bytes([2, 1, 0x11, 0, 2, 0x22, 0])
    blob = (b"\xff\xd8" + _seg(0xC2, ihdr)
            + _sos([(1, 0, 0)], 0, 0, 0, 0) + b"\xff\xd9")
    assert decode_jpeg_luma(blob) is None


def test_image_features_real_path_progressive_end_to_end(spark):
    """stub=False image features on a PROGRESSIVE JPEG blob with no PIL:
    the two-level image's luma must land in the outer histogram bins
    (same contract as the baseline end-to-end test)."""
    from pyspark.sql import Row
    from glamr_omics_pipelines_spark.operators import multimodal
    img = np.zeros((8, 8), dtype=np.uint8)
    img[:, 4:] = 255
    blob = _encode_jpeg_progressive(img, dc_al=1, ac_bands=((1, 5), (6, 63)),
                                    ac_al=1)
    rows = [Row(media_id=1, media_type="image", content=blob,
                meta=Row(width=8, height=8, duration_ms=None, codec="jpeg"))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_image_features(df, feature_dim=4,
                                            stub=False).collect()[0]
    assert out.decode_ok == "ok"
    assert out.feature[0] + out.feature[1] == pytest.approx(0.5)
    assert out.feature[2] + out.feature[3] == pytest.approx(0.5)
