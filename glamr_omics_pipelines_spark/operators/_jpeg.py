"""JPEG (ITU-T T.81) luma decoder — stdlib + numpy, no libjpeg/PIL.

The last piece of the dependency-free image path (netpbm/BMP/PNG landed
earlier): decodes SOF0/SOF1 (baseline / extended-sequential huffman) and
SOF2 (progressive huffman, T.81 Annex G — r8) 8-bit JPEGs — 1-3
components, any h/v sampling with a full-resolution Y plane (4:4:4,
4:2:2, 4:2:0), DRI/RSTn restart intervals, spectral-selection bands,
DC/AC successive approximation, EOB runs — and returns the Y (luma)
plane as a uint8 array. Y *is* the 601 luma the sibling decoders
compute from RGB, so grayscale features are consistent across formats
without any chroma upsample/color-convert step; chroma blocks are still
entropy-decoded (the bitstream interleaves them) but skip dequant/IDCT.

Fidelity note: this uses the exact orthonormal float DCT-III, not
libjpeg's scaled-integer IDCT approximations, so pixel values can differ
from libjpeg/PIL by ±1. That is fine for feature extraction, and results
are byte-stable across environments because only this implementation ever
runs (the multimodal kernels try the stdlib decoders FIRST even when PIL
is installed). Valid-but-out-of-scope files (arithmetic coding,
hierarchical, lossless, 12-bit, subsampled luma, multi-scan baseline)
return None so the caller can fall through to PIL, as do 4-component
(Adobe CMYK/YCCK) frames whose first component is Cyan, not luma; only
CORRUPT files raise ValueError (mapped to a row-level decode_error).

Reference precedent: the pipeline treats images as opaque artifacts
(multimodal columns are an engine extension, SURVEY §8); the decode
contract matches operators/multimodal.py's other real-path codecs.
"""

from __future__ import annotations

# Zigzag scan: index i in scan order -> position in the 8x8 block
# (row-major natural order), ITU-T T.81 Figure A.6.
_ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_IDCT_M = None  # lazy 8x8 orthonormal DCT-II basis (numpy import deferred)


def _idct_matrix():
    global _IDCT_M
    if _IDCT_M is None:
        import math

        import numpy as np
        m = np.empty((8, 8))
        for u in range(8):
            cu = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
            for x in range(8):
                m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
        _IDCT_M = m
    return _IDCT_M


def _build_huffman(bits: list[int], values: bytes) -> dict:
    """Canonical huffman: (code_length, code) -> symbol (T.81 Annex C)."""
    if sum(bits) > len(values):
        raise ValueError("truncated JPEG huffman table")
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data, self.pos, self.buf, self.cnt = data, 0, 0, 0

    def read_bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_block(reader: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int, coef_out=None) -> int:
    """Decode one 8x8 block's coefficients; returns the new DC predictor.
    coef_out (64 int list, natural order) is filled when given; passing
    None entropy-decodes and discards (the chroma skip path)."""
    t = _decode_huff(reader, dc_tab)
    pred += _extend(reader.read_bits(t), t) if t else 0
    if coef_out is not None:
        coef_out[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:          # ZRL: 16 zeros
                k += 16
                continue
            break                # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        v = _extend(reader.read_bits(s), s)
        if coef_out is not None:
            coef_out[_ZIGZAG[k]] = v
        k += 1
    return pred


def _split_entropy(buf: bytes, start: int):
    """Unstuff the scan's entropy data, splitting at RSTn markers.
    Returns (segments, end_pos) where end_pos sits on the terminating
    marker's 0xFF."""
    segs, cur, i, n = [], bytearray(), start, len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = buf[i + 1]
        if nxt == 0x00:              # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:    # restart marker: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                        # EOI or next marker: scan over
            break
    segs.append(bytes(cur))
    return segs, i


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0x0F
        p += 1
        tab = [0] * 64
        for k in range(64):
            if pq:
                tab[_ZIGZAG[k]] = int.from_bytes(seg[p:p + 2], "big")
                p += 2
            else:
                tab[_ZIGZAG[k]] = seg[p]
                p += 1
        qtables[tq] = tab


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    p = 0
    while p < len(seg):
        tc, th = seg[p] >> 4, seg[p] & 0x0F
        bits = list(seg[p + 1:p + 17])
        nv = sum(bits)
        values = seg[p + 17:p + 17 + nv]
        (huff_ac if tc else huff_dc)[th] = _build_huffman(bits, values)
        p += 17 + nv


def _validate_frame(height, width, comps) -> None:
    """SOF sanity (T.81 B.2.2): nonzero dimensions, 1-4 components,
    sampling factors in 1..4 — a zero factor would divide-by-zero the
    MCU grid on a corrupt stream (r8 fuzz finding)."""
    if height == 0 or width == 0 or not 1 <= len(comps) <= 4:
        raise ValueError("invalid JPEG frame header")
    for _cid, h, v, _tq in comps:
        if not (1 <= h <= 4 and 1 <= v <= 4):
            raise ValueError(f"invalid JPEG sampling factors {h}x{v}")


def decode_jpeg_luma(buf: bytes):
    """Public entry: see _decode_jpeg_luma_impl. A hostile/truncated byte
    stream can index past a segment end anywhere in the marker parse —
    normalize that to the documented corrupt-file contract (ValueError),
    never a bare IndexError (r8 fuzz finding)."""
    try:
        return _decode_jpeg_luma_impl(buf)
    except IndexError as exc:
        raise ValueError(f"truncated/corrupt JPEG structure: {exc}") from None


def _decode_jpeg_luma_impl(buf: bytes):
    """Decode a baseline or progressive JPEG to its luma plane (uint8,
    height x width). Returns None when the magic isn't JPEG OR the file
    is valid but out of scope (arithmetic/hierarchical/12-bit/
    subsampled-luma — the caller falls through to PIL); raises
    ValueError on corrupt files."""
    import numpy as np
    if buf[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None           # (height, width, [(cid, h, v, tq), ...])
    restart_interval = 0
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = buf[i + 1]
        if marker == 0xFF:           # fill byte
            i += 1
            continue
        if marker == 0xD9:           # EOI before SOS
            raise ValueError("JPEG ended before scan data")
        seg_len = int.from_bytes(buf[i + 2:i + 4], "big")
        seg = buf[i + 4:i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:           # DQT
            _parse_dqt(seg, qtables)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline-decodable
            if seg[0] != 8:
                return None          # 12-bit: valid but out of scope -> PIL
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            _validate_frame(height, width, comps)
            if len(comps) == 4:
                return None  # CMYK/YCCK: valid, out of scope -> PIL
            frame = (height, width, comps)
        elif marker == 0xC2:         # SOF2: progressive huffman (r8)
            return _decode_progressive(buf, np)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # arithmetic / hierarchical / lossless: a VALID file this
            # decoder doesn't cover — return None so the caller falls
            # through to PIL (or its NotImplementedError install hint)
            return None
        elif marker == 0xC4:         # DHT
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:         # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:         # SOS — scan starts after this segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []                # (comp_idx, dc_table, ac_table)
            height, width, comps = frame
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next((j for j, cm in enumerate(comps)
                            if cm[0] == cs), None)
                if idx is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((idx, tt >> 4, tt & 0x0F))
            if 1 < len(scan) < len(comps):
                return None  # multi-scan baseline: valid, out of scope -> PIL
            if len(scan) == 1 and len(comps) > 1:
                # ADVICE r7: an Ns=1 FIRST scan of a multi-component frame
                # is only decodable here when it is the frame's first
                # (luma) component at full resolution — a chroma-only or
                # subsampled first scan would otherwise be returned as
                # luma on the wrong block grid (or raise on the size
                # mismatch). Valid file, out of scope -> PIL.
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                idx = scan[0][0]
                if idx != 0 or (comps[idx][1], comps[idx][2]) != (hmax, vmax):
                    return None
            return _decode_scan(buf, i + 2 + seg_len, frame, scan, qtables,
                                huff_dc, huff_ac, restart_interval, np)
        # APPn / COM / others: skip
        i += 2 + seg_len
    raise ValueError("JPEG has no scan (truncated before SOS)")


def _decode_scan(buf, data_start, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval, np):
    height, width, comps = frame
    if len(scan) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the MCU
        # is ONE 8x8 data unit in raster order and the component's
        # sampling factors do not shape the block layout.
        comps = [(comps[scan[0][0]][0], 1, 1, comps[scan[0][0]][3])]
        scan = [(0, scan[0][1], scan[0][2])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    y_idx = scan[0][0]
    _, hy, vy, tq_y = comps[y_idx]
    if (hy, vy) != (hmax, vmax):
        return None              # subsampled luma: valid, out of scope -> PIL
    if tq_y not in qtables:
        raise ValueError("JPEG luma quant table missing")
    q_y = np.array(qtables[tq_y], dtype=np.float64).reshape(8, 8)
    m = _idct_matrix()

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    plane = np.zeros((mcus_y * mcu_h, mcus_x * mcu_w), dtype=np.uint8)

    segments, _ = _split_entropy(buf, data_start)
    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg_data in segments:
        if mcu >= n_mcus:
            break
        reader = _BitReader(seg_data)
        preds = [0] * len(comps)
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for comp_idx, tdc, tac in scan:
                _, h, v, _tq = comps[comp_idx]
                dc_tab, ac_tab = huff_dc.get(tdc), huff_ac.get(tac)
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG huffman table missing")
                for bv in range(v):
                    for bh in range(h):
                        if comp_idx == y_idx:
                            coef = [0] * 64
                            preds[comp_idx] = _decode_block(
                                reader, dc_tab, ac_tab, preds[comp_idx],
                                coef)
                            blk = (np.array(coef, dtype=np.float64)
                                   .reshape(8, 8) * q_y)
                            pix = m.T @ blk @ m
                            pix = np.clip(np.round(pix) + 128, 0, 255)
                            r0 = my * mcu_h + bv * 8
                            c0 = mx * mcu_w + bh * 8
                            plane[r0:r0 + 8, c0:c0 + 8] = pix.astype("u1")
                        else:
                            # chroma: advance the bitstream, skip IDCT
                            preds[comp_idx] = _decode_block(
                                reader, dc_tab, ac_tab, preds[comp_idx])
            mcu += 1
    if mcu < n_mcus:
        raise ValueError("JPEG truncated: "
                         f"{mcu}/{n_mcus} MCUs decoded")
    return plane[:height, :width]


# ---------------------------------------------------------------------------
# Progressive (SOF2) huffman decode — ITU-T T.81 Annex G (VERDICT r7 #5).
# The web's most common JPEG variant after baseline: coefficients arrive
# over MULTIPLE scans (DC first + refinements, AC spectral bands +
# successive-approximation bit planes) and are accumulated into a per-block
# coefficient buffer; dequant + IDCT run once at the end, reusing the
# baseline path's tables, bit reader, huffman decode and IDCT basis.
# Luma-only, like the baseline decoder: chroma AC scans are skipped
# outright (each progressive scan is its own entropy segment), and chroma
# DC values inside interleaved DC scans are entropy-decoded but discarded.


def _ac_first_block(reader, coef, zz0, ss, se, al, ac_tab, eobrun):
    """First pass of an AC band (Ah=0), T.81 G.1.2.2: run/size coding
    plus EOBn band-skip runs. `zz0` is the block's offset into the flat
    coefficient array. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1    # the run includes this block
            k += 16                  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        coef[zz0 + _ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, coef, zz0, ss, se, al, ac_tab, eobrun):
    """Refinement pass of an AC band (Ah>0), T.81 G.1.2.3: each newly
    nonzero coefficient arrives as ±1<<Al; every already-nonzero
    coefficient crossed on the way (and the whole band tail during an EOB
    run) receives one correction bit. Returns the remaining EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:          # EOBn: run starts at this block
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG AC refinement symbol")
                newval = p1 if reader.read_bit() else -p1
            # advance over r zero-history coeffs, correcting nonzero ones
            while k <= se:
                z = zz0 + _ZIGZAG[k]
                c = coef[z]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coef[z] = c + (p1 if c >= 0 else -p1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval and k <= se:
                coef[zz0 + _ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:               # correction bits for the band tail
            z = zz0 + _ZIGZAG[k]
            c = coef[z]
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    coef[z] = c + (p1 if c >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(buf, np):
    """Progressive JPEG → luma plane (see module docstring). Returns None
    for valid-but-out-of-scope shapes (12-bit, subsampled luma); raises
    ValueError on corrupt files."""
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef = None                      # flat int array: block-major, 64 each
    bx = by = nbx = nby = mcus_x = mcus_y = 0
    saw_luma_scan = False
    i = 2
    while i + 2 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = buf[i + 1]
        if marker == 0xFF:           # fill byte
            i += 1
            continue
        if marker == 0xD9:           # EOI
            break
        if i + 4 > len(buf):
            raise ValueError("truncated JPEG segment")
        seg_len = int.from_bytes(buf[i + 2:i + 4], "big")
        seg = buf[i + 4:i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xC2:
            if seg[0] != 8:
                return None          # 12-bit: out of scope -> PIL
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            _validate_frame(height, width, comps)
            if len(comps) == 4:
                # CMYK/YCCK (Adobe 4-component): the first component is
                # Cyan, not luma — returning it as gray would be silently
                # wrong. Valid file, out of scope -> PIL (r8 review).
                return None
            frame = (height, width, comps)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            height, width, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if (comps[0][1], comps[0][2]) != (hmax, vmax):
                return None          # subsampled luma: out of scope -> PIL
            if coef is None:
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                # interleaved DC scans may write dummy blocks up to the
                # MCU grid; non-interleaved scans stop at the component
                # grid. Allocate the larger, IDCT only the real blocks.
                bx, by = mcus_x * hmax, mcus_y * vmax
                nbx, nby = -(-width // 8), -(-height // 8)
                coef = np.zeros(by * bx * 64, dtype=np.int64)
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next((j for j, cm in enumerate(comps)
                            if cm[0] == cs), None)
                if idx is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((idx, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan with nonzero Se")
            if ss > 0 and (ns != 1 or se < ss or se > 63):
                raise ValueError("bad progressive AC scan header")
            segments, end = _split_entropy(buf, i + 2 + seg_len)
            luma_here = any(idx == 0 for idx, _t, _a in scan)
            if luma_here:
                saw_luma_scan = True
                _progressive_scan(coef, segments, scan, comps, ss, se, ah,
                                  al, huff_dc, huff_ac, restart_interval,
                                  mcus_x, mcus_y, bx, nbx, nby)
            # chroma-only scan: its entropy data is self-contained — skip
            i = end
            continue
        i += 2 + seg_len
    if coef is None or not saw_luma_scan:
        raise ValueError("JPEG has no luma scan (truncated before SOS)")
    height, width, comps = frame
    tq_y = comps[0][3]
    if tq_y not in qtables:
        raise ValueError("JPEG luma quant table missing")
    q = np.array(qtables[tq_y], dtype=np.float64).reshape(8, 8)
    m = _idct_matrix()
    blocks = coef.reshape(by, bx, 8, 8)[:nby, :nbx].astype(np.float64) * q
    pix = np.einsum("ux,ijuv,vy->ijxy", m, blocks, m)
    pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
    plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return plane[:height, :width]


def _progressive_scan(coef, segments, scan, comps, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval,
                      mcus_x, mcus_y, bx, nbx, nby):
    """Decode one progressive scan that includes the luma component into
    the flat coefficient buffer. DC scans may be interleaved (every
    component's DC is entropy-decoded to advance the bitstream; only
    luma's is stored); AC scans are single-component by T.81 G."""
    if ss == 0 and len(scan) > 1:
        units = mcus_x * mcus_y      # interleaved DC scan: MCU units
    elif ss == 0:
        idx = scan[0][0]
        _cid, h, v, _tq = comps[idx]
        units = nbx * nby if idx == 0 else 0   # non-interleaved: blocks
    else:
        units = nbx * nby            # AC: always Ns=1; luma grid
    per_seg = restart_interval if restart_interval else units
    unit = 0
    for seg_data in segments:
        if unit >= units:
            break
        reader = _BitReader(seg_data)
        preds = [0] * len(comps)
        eobrun = 0
        for _ in range(min(per_seg, units - unit)):
            if ss == 0 and len(scan) > 1:
                my, mx = divmod(unit, mcus_x)
                for comp_idx, tdc, _tac in scan:
                    _cid, h, v, _tq = comps[comp_idx]
                    for bv in range(v):
                        for bh in range(h):
                            store = (comp_idx == 0)
                            r = my * v + bv
                            c = mx * h + bh
                            zz0 = (r * bx + c) * 64 if store else 0
                            _dc_unit(reader, coef, zz0, ah, al,
                                     huff_dc.get(tdc), preds, comp_idx,
                                     store)
            elif ss == 0:
                r, c = divmod(unit, nbx)
                zz0 = (r * bx + c) * 64
                _dc_unit(reader, coef, zz0, ah, al,
                         huff_dc.get(scan[0][1]), preds, scan[0][0], True)
            else:
                r, c = divmod(unit, nbx)
                zz0 = (r * bx + c) * 64
                ac_tab = huff_ac.get(scan[0][2])
                if ah == 0:
                    if ac_tab is None:
                        raise ValueError("JPEG huffman table missing")
                    eobrun = _ac_first_block(reader, coef, zz0, ss, se,
                                             al, ac_tab, eobrun)
                else:
                    if ac_tab is None:
                        raise ValueError("JPEG huffman table missing")
                    eobrun = _ac_refine_block(reader, coef, zz0, ss, se,
                                              al, ac_tab, eobrun)
            unit += 1
    if unit < units:
        raise ValueError(f"JPEG truncated: {unit}/{units} progressive "
                         "scan units decoded")


def _dc_unit(reader, coef, zz0, ah, al, dc_tab, preds, comp_idx, store):
    """One block's DC contribution: first pass (Ah=0) decodes a huffman
    diff in the >>Al domain; refinement (Ah>0) is one appended bit."""
    if ah == 0:
        if dc_tab is None:
            raise ValueError("JPEG huffman table missing")
        t = _decode_huff(reader, dc_tab)
        preds[comp_idx] += _extend(reader.read_bits(t), t) if t else 0
        if store:
            coef[zz0] = preds[comp_idx] << al
    else:
        bit = reader.read_bit()
        if store and bit:
            coef[zz0] = int(coef[zz0]) | (1 << al)
