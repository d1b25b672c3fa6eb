"""Baseline JFIF (JPEG) codec from the public ITU-T T.81 spec — pure
numpy/stdlib, no third-party codec libraries.

Decoder subset: baseline sequential DCT (SOF0/SOF1), 8-bit samples, Huffman
entropy coding, 1 or 3 components, arbitrary sampling factors (4:4:4 /
4:2:2 / 4:2:0 ...), restart markers (DRI).  Progressive (SOF2), arithmetic
coding, 12-bit precision and hierarchical modes raise NotImplementedError.

Encoder: baseline 4:4:4 or 4:2:0, one shared quantization table (Annex-K
luminance table scaled by the libjpeg quality formula) and per-scan
CUSTOM canonical Huffman tables built from the actual symbol set (every
used symbol gets the same code length L with n_symbols < 2^L, so the
all-ones code — reserved by T.81 — is never assigned).  The decoder reads
whatever tables the file declares, so these files are also valid input for
any spec-conforming decoder.

JPEG is LOSSY: decode(encode(x)) recovers x only within quantization
error.  Fixture oracles therefore pin (a) exact dims/channels, (b) a
mean-absolute-error bound against the PRE-encoding source pixels
(non-circular), and (c) hand-computed single-block IDCT pins (exact).

Reference parity note: the reference engine (sbustreamspot-core) is
graph-only; this backs the multimodal decode plumbing of the
training-data pipeline operator set (SURVEY.md §2.9).
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    pass


# natural (row-major) index of each position in zigzag order (T.81 fig. 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K table K.1 (luminance), natural order
QUANT_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    # orthonormal 8-point DCT-II matrix: forward X = C @ x @ C.T,
    # inverse x = C.T @ X @ C
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c / 2


_DCT = _dct_matrix()


def _extend(v: int, t: int) -> int:
    # T.81 F.12: map the t-bit magnitude to its signed value
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops (raises StopIteration-like flag) at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegFormatError("entropy data ran past end of file")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                # scan terminated by a real marker (EOI/next segment): the
                # spec pads the last byte with 1-bits; feed 1s
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return out

    def align_restart(self, expect: int) -> None:
        """Byte-align and consume the next restart marker (must be RSTn)."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    if (m - 0xD0) != expect:
                        raise JpegFormatError("restart marker out of order")
                    self.pos += 2
                    return
                raise JpegFormatError("expected restart marker")
            self.pos += 1
        raise JpegFormatError("missing restart marker")


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


class _Huff:
    """Canonical Huffman decoder from a DHT (bits[1..16], values)."""

    def __init__(self, counts: list[int], values: bytes):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bits(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code")


def _decode_block(br: _BitReader, dc: _Huff, ac: _Huff, pred: int
                  ) -> tuple[np.ndarray, int]:
    coef = np.zeros(64, dtype=np.float64)
    t = dc.decode(br)
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:          # ZRL: 16 zeros
                k += 16
                continue
            break                # EOB
        k += r
        if k > 63:
            raise JpegFormatError("AC run past end of block")
        coef[k] = _extend(br.bits(s), s)
        k += 1
    return coef, pred


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array (H, W) grayscale or (H, W, 3) RGB.

    Baseline sequential Huffman subset (interleaved or one-component-per-
    scan); raises JpegFormatError on malformed input, NotImplementedError
    outside the subset."""
    try:
        return _jpeg_decode(data)
    except (JpegFormatError, NotImplementedError):
        raise
    except _RestartMarker:
        raise JpegFormatError("unexpected restart marker in entropy data")
    except (struct.error, IndexError, KeyError, ValueError) as e:
        # the documented malformed-input contract: low-level parse slips
        # (short segment bodies, bad table ids, ...) surface uniformly
        raise JpegFormatError(f"malformed JPEG: {e}")


def _jpeg_decode(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart_interval = 0
    planes: dict[int, np.ndarray] = {}
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError("expected marker")
        marker = data[pos + 1]
        pos += 2
        while marker == 0xFF:                    # B.1.1.2: 0xFF fill bytes
            if pos >= len(data):
                raise JpegFormatError("truncated marker")
            marker = data[pos]
            pos += 1
        if marker == 0xD9:                       # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                             # standalone
        if pos + 2 > len(data):
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if pos + seglen > len(data):
            raise JpegFormatError("truncated segment body")
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    q = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    q = np.frombuffer(body[i:i + 128], dtype=">u2")
                    i += 128
                tbl = np.zeros(64)
                tbl[ZIGZAG] = q.astype(np.float64)   # de-zigzag
                qtables[tq] = tbl
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                values = body[i + 17:i + 17 + n]
                huffs[(tc, th)] = _Huff(counts, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1):             # SOF0 / SOF1 (baseline)
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision (subset: 8)")
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF marker 0xFF{marker:02X} (progressive/arithmetic/"
                "hierarchical) not in baseline subset")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            h, w, comps = frame
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in comps if x[0] == cs), None)
                if comp is None:
                    raise JpegFormatError("scan component not in frame")
                scan.append((comp, tt >> 4, tt & 0x0F))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # planes persist ACROSS scans: legal baseline files may carry
            # one component per scan (non-interleaved), so each SOS only
            # adds the planes it covers
            for (cid, ch, cv, tq), _, _ in scan:
                if cid not in planes:
                    planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8))

            def tables_for(entry):
                (cid, ch, cv, tq), td, ta = entry
                qt = qtables.get(tq)
                if qt is None:
                    raise JpegFormatError(f"missing quant table {tq}")
                dc_t = huffs.get((0, td))
                ac_t = huffs.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise JpegFormatError("missing Huffman table")
                return qt, dc_t, ac_t

            def put_block(cid, qt, coef_z, by_abs, bx_abs):
                blk = np.zeros(64)
                blk[ZIGZAG] = coef_z                # de-zigzag
                blk = (blk * qt).reshape(8, 8)
                px = _DCT.T @ blk @ _DCT + 128
                planes[cid][by_abs * 8:by_abs * 8 + 8,
                            bx_abs * 8:bx_abs * 8 + 8] = px

            br = _BitReader(data, pos)
            preds = {c[0][0]: 0 for c in scan}
            rst = 0
            if ns == 1:
                # non-interleaved scan: the MCU is ONE block of this
                # component; block grid = ceil(comp samples / 8) per axis
                # (T.81 A.2.2)
                (cid, ch, cv, tq), td, ta = scan[0]
                qt, dc_t, ac_t = tables_for(scan[0])
                sx = -(-(w * ch) // hmax)           # comp samples per row
                sy = -(-(h * cv) // vmax)
                bw = -(-sx // 8)
                bh = -(-sy // 8)
                for m in range(bw * bh):
                    if restart_interval and m and m % restart_interval == 0:
                        br.align_restart(rst)
                        rst = (rst + 1) & 7
                        preds[cid] = 0
                    by_abs, bx_abs = divmod(m, bw)
                    coef_z, preds[cid] = _decode_block(
                        br, dc_t, ac_t, preds[cid])
                    put_block(cid, qt, coef_z, by_abs, bx_abs)
            else:
                for m in range(mcux * mcuy):
                    if restart_interval and m and m % restart_interval == 0:
                        br.align_restart(rst)
                        rst = (rst + 1) & 7
                        preds = {c[0][0]: 0 for c in scan}
                    my, mx = divmod(m, mcux)
                    for entry in scan:
                        (cid, ch, cv, tq), td, ta = entry
                        qt, dc_t, ac_t = tables_for(entry)
                        for by in range(cv):
                            for bx in range(ch):
                                coef_z, preds[cid] = _decode_block(
                                    br, dc_t, ac_t, preds[cid])
                                put_block(cid, qt, coef_z,
                                          my * cv + by, mx * ch + bx)
            pos = br.pos
        elif marker in (0xC8, 0xF7, 0xF8):
            raise NotImplementedError("JPG extensions not in subset")
        # APPn / COM / others: skipped
    if frame is None or not planes:
        raise JpegFormatError("no frame decoded")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, ch, cv, _ in comps:
        if cid not in planes:
            raise JpegFormatError(f"component {cid} has no scan data")
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG (subset: 1/3)")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)            # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)      # pad with 1-bits
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], list[int],
                                                    dict[int, tuple[int, int]]]:
    """Canonical Huffman table giving every symbol the same length L with
    n < 2^L strictly, so the reserved all-ones code is never used.
    Returns (bits[1..16], huffval, {sym: (code, L)})."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, n.bit_length())              # smallest L with n < 2^L
    if n >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(vals)}
    return bits, vals, enc


def _quant_table(quality: int) -> np.ndarray:
    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    t = np.floor((QUANT_BASE * scale + 50) / 100)
    return np.clip(t, 1, 255)


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsample: int = 1, interleaved: bool = True) -> bytes:
    """uint8 (H, W) or (H, W, 3) -> baseline JFIF bytes.

    ``subsample`` 1 = 4:4:4, 2 = 4:2:0 (box-mean chroma downsample).  One
    shared quantization table; scan-specific fixed-length canonical Huffman
    tables declared in DHT (valid for any conforming decoder).
    ``interleaved=False`` emits one scan per component (legal baseline
    non-interleaved layout; requires subsample=1)."""
    a = np.asarray(arr, dtype=np.uint8).astype(np.float64)
    if a.ndim == 2:
        comps = [("Y", a, 1, 1)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample not in (1, 2):
            raise ValueError("subsample must be 1 or 2")
        s = subsample
        if s == 2:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4
            cb, cr = down(cb), down(cr)
        comps = [("Y", y, s, s), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
    else:
        raise ValueError("expected (H, W) or (H, W, 3) uint8 array")
    h, w = a.shape[0], a.shape[1]
    qt = _quant_table(quality)                   # natural order
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized blocks in MCU-interleaved order, one stream per component
    blocks: list[list[np.ndarray]] = [[] for _ in comps]
    for ci, (_, plane, ch, cv) in enumerate(comps):
        ph = mcuy * cv * 8
        pw = mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge")
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    blk = p[y0:y0 + 8, x0:x0 + 8] - 128
                    d = _DCT @ blk @ _DCT.T
                    qz = np.rint(d / qt.reshape(8, 8)).astype(np.int64)
                    blocks[ci].append(qz.reshape(64)[ZIGZAG])  # zigzag order

    # symbol passes -> per-scan Huffman tables (shared across components)
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}                   # always include EOB
    sequences: list[list[tuple]] = [[] for _ in comps]
    preds = [0] * len(comps)
    for ci in range(len(comps)):
        for zz in blocks[ci]:
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            t = _category(diff)
            dc_syms.add(t)
            seq = [("dc", t, diff)]
            run = 0
            last_nz = 0
            nz = np.nonzero(zz[1:])[0]
            last_nz = (nz[-1] + 1) if len(nz) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    seq.append(("ac", 0xF0, 0, 0))
                    run -= 16
                s = _category(v)
                ac_syms.add((run << 4) | s)
                seq.append(("ac", (run << 4) | s, v, s))
                run = 0
            if last_nz < 63:
                seq.append(("ac", 0x00, 0, 0))   # EOB
            sequences[ci].append(seq)
    dc_bits, dc_vals, dc_enc = _fixed_length_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _fixed_length_table(ac_syms)

    def write_seq(bw: _BitWriter, seq: list) -> None:
        for item in seq:
            if item[0] == "dc":
                _, t, diff = item
                code, ln = dc_enc[t]
                bw.write(code, ln)
                if t:
                    mag = diff if diff >= 0 else diff + (1 << t) - 1
                    bw.write(mag, t)
            else:
                _, rs, v, s = item
                code, ln = ac_enc[rs]
                bw.write(code, ln)
                if rs not in (0x00, 0xF0):
                    mag = v if v >= 0 else v + (1 << s) - 1
                    bw.write(mag, s)

    # (scan component indices, entropy bytes) per SOS
    scans: list[tuple[list[int], bytes]] = []
    if interleaved or len(comps) == 1:
        bw = _BitWriter()
        n_blocks = [0] * len(comps)
        per_mcu = [c[2] * c[3] for c in comps]
        for m in range(mcux * mcuy):
            for ci in range(len(comps)):
                for _ in range(per_mcu[ci]):
                    write_seq(bw, sequences[ci][n_blocks[ci]])
                    n_blocks[ci] += 1
        scans.append((list(range(len(comps))), bw.flush()))
    else:
        # one component per scan (legal baseline, T.81 A.2.2).  With
        # subsample=1 each component's MCU-order block stream IS raster
        # order, so the per-component sequences can be emitted as-is; the
        # per-component DC predictor already starts at 0, matching the
        # per-scan reset the decoder applies.
        if subsample != 1:
            raise ValueError(
                "interleaved=False supported only with subsample=1")
        for ci in range(len(comps)):
            bw = _BitWriter()
            for seq in sequences[ci]:
                write_seq(bw, seq)
            scans.append(([ci], bw.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                 # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_qt = qt.reshape(64)[ZIGZAG].astype(np.uint8)  # natural -> zigzag
    out += seg(0xDB, bytes([0x00]) + zz_qt.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_, _, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    for comp_ids, entropy in scans:
        sos = bytes([len(comp_ids)])
        for i in comp_ids:
            sos += bytes([i + 1, 0x00])          # DC table 0, AC table 0
        sos += bytes([0, 63, 0])                 # Ss, Se, AhAl
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"                           # EOI
    return bytes(out)
