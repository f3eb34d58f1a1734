"""Baseline JPEG real-codec path: fixtures are REAL JPEG bitstreams
hand-assembled in-test (custom canonical Huffman tables declared in
their DHT segments, explicit DC/AC symbol emission), and the expected
pixels come from T.81's IDCT formula written out independently here —
so the decoder's marker parse / Huffman / zigzag / dequant / MCU
bookkeeping is checked against the spec, not against itself. The
certified stub media_ahash plan stays untouched (see the plan pin in
test_png_ahash.py)."""

from __future__ import annotations

import math
import struct

import pytest

from flink_ecommerce_spark.operators.multimodal import (
    ahash64_from_luma,
    decode_jpeg,
    decode_luma,
    decode_png,
    media_ahash_real,
)
from tests.test_png_ahash import _gradient, encode_png

# 12 DC categories at code length 4 (canonical codes 0..11); 8 AC
# run/size symbols at code length 4 (canonical codes 0..7) — tiny
# but fully valid JPEG Huffman tables, declared in the DHT segment.
_DC_BITS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_VALS = bytes(range(12))
_AC_SYMS = [0x00, 0x01, 0x02, 0x03, 0x04, 0x11, 0x21, 0xF0]
_AC_BITS = bytes([0, 0, 0, 8] + [0] * 12)
_AC_VALS = bytes(_AC_SYMS)


class _BitWriter:
    """MSB-first with 0xFF00 byte stuffing (T.81 §B.1.1.5)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:  # pad the final byte with 1-bits
        while self.n:
            self.write(1, 1)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _emit_dc(w: _BitWriter, diff: int) -> None:
    t = _category(diff)
    w.write(t, 4)  # canonical code for DC symbol t IS t here
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_ac(w: _BitWriter, run: int, value: int) -> None:
    s = _category(value)
    w.write(_AC_SYMS.index((run << 4) | s), 4)
    w.write(value if value >= 0 else value + (1 << s) - 1, s)


def _emit_eob(w: _BitWriter) -> None:
    w.write(_AC_SYMS.index(0x00), 4)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def make_jpeg(w, h, comps, quant, scan: bytes, dri: int = 0) -> bytes:
    """comps: [(cid, hs, vs)], all on quant table 0 / huff tables 0.
    quant: one uniform value or a 64-list in zigzag order."""
    q64 = [quant] * 64 if isinstance(quant, int) else list(quant)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(q64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + _DC_BITS + _DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + _AC_BITS + _AC_VALS)
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _dc_only_block(diff: int) -> bytes:
    w = _BitWriter()
    _emit_dc(w, diff)
    _emit_eob(w)
    w.flush()
    return bytes(w.buf)


def test_jpeg_dc_only_flat_gray():
    """DC-only block: every pixel is F00·q/8 + 128 (the IDCT of a
    constant), exactly — q=8 makes it integer with no rounding."""
    scan = _dc_only_block(25)  # dequant DC = 200 -> flat 25 + 128
    raw = make_jpeg(8, 8, [(1, 1, 1)], 8, scan)
    w, h, luma = decode_jpeg(raw)
    assert (w, h) == (8, 8)
    assert luma == [[153] * 8] * 8


def test_jpeg_single_ac_basis_orientation():
    """One AC coefficient at zigzag index 1 (u=0, v=1): decoded block
    must equal ¼·C(u)C(v)·c·q·cos((2x+1)uπ/16)·cos((2y+1)vπ/16)+128
    computed straight from T.81 — rows constant, columns varying,
    which also pins the transform's orientation."""
    import numpy as np

    c, q = 7, 16
    w = _BitWriter()
    _emit_dc(w, 0)
    _emit_ac(w, 0, c)  # first AC in scan order = zigzag index 1
    _emit_eob(w)
    w.flush()
    raw = make_jpeg(8, 8, [(1, 1, 1)], q, bytes(w.buf))
    _, _, luma = decode_jpeg(raw)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    expected = [
        [
            int(
                np.clip(
                    np.round(
                        0.25
                        * inv_sqrt2  # C(0); C(1)=1
                        * c
                        * q
                        * math.cos((2 * y + 1) * 1 * math.pi / 16.0)
                    )
                    + 128,
                    0,
                    255,
                )
            )
            for y in range(8)
        ]
        for _x in range(8)
    ]
    assert luma == expected
    assert luma[0] != [luma[0][0]] * 8  # columns vary
    assert [r[0] for r in luma] == [luma[0][0]] * 8  # rows constant


def test_jpeg_multi_mcu_dc_prediction_and_crop():
    """Three MCUs across, width 20 (not a block multiple): DC values
    are DIFF-coded against the previous block (T.81 §F.1.1.5.1), and
    the padded Y plane must crop to the declared width."""
    w = _BitWriter()
    for diff in (10, 20, -40):  # absolute DCs: 10, 30, -10
        _emit_dc(w, diff)
        _emit_eob(w)
    w.flush()
    raw = make_jpeg(20, 8, [(1, 1, 1)], 8, bytes(w.buf))
    gw, gh, luma = decode_jpeg(raw)
    assert (gw, gh) == (20, 8)
    assert all(len(r) == 20 for r in luma)
    assert luma[0][0] == 10 + 128
    assert luma[0][8] == 30 + 128
    assert luma[0][16] == -10 + 128


def test_jpeg_ycbcr_420_interleave():
    """A 16×16 4:2:0 MCU is 4 Y blocks then Cb then Cr (T.81 §A.2.3);
    the chroma blocks must be entropy-decoded (to advance the stream)
    but must not disturb the luma quadrants."""
    w = _BitWriter()
    for diff in (5, 15, -30, 30):  # Y quadrants: 5, 20, -10, 20
        _emit_dc(w, diff)
        _emit_eob(w)
    for chroma_dc in (33, -21):  # Cb, Cr: nonzero, with AC too
        _emit_dc(w, chroma_dc)
        _emit_ac(w, 1, 1)  # symbol 0x11: run 1, size 1
        _emit_eob(w)
    w.flush()
    raw = make_jpeg(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], 8, bytes(w.buf)
    )
    gw, gh, luma = decode_jpeg(raw)
    assert (gw, gh) == (16, 16)
    assert luma[0][0] == 133 and luma[0][15] == 148
    assert luma[15][0] == 118 and luma[15][15] == 148


def test_jpeg_restart_markers_reset_dc():
    """DRI=1: an RST marker between MCUs byte-aligns the reader and
    resets DC prediction, so the second block re-encodes its absolute
    value (T.81 §E.2.4)."""
    w1 = _BitWriter()
    _emit_dc(w1, 40)
    _emit_eob(w1)
    w1.flush()
    w2 = _BitWriter()
    _emit_dc(w2, 60)  # absolute again: prediction was reset
    _emit_eob(w2)
    w2.flush()
    scan = bytes(w1.buf) + b"\xff\xd0" + bytes(w2.buf)
    raw = make_jpeg(16, 8, [(1, 1, 1)], 8, scan, dri=1)
    _, _, luma = decode_jpeg(raw)
    assert luma[0][0] == 40 + 128
    assert luma[0][8] == 60 + 128


def test_jpeg_progressive_raises():
    raw = make_jpeg(8, 8, [(1, 1, 1)], 8, _dc_only_block(1))
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(prog)


def test_jpeg_truncated_raises_value_error():
    """A payload cut mid-scan must surface as ValueError, not a raw
    IndexError from the bit reader."""
    w = _BitWriter()
    for _ in range(16):  # 16 blocks, 12 bits each: a ~24-byte scan
        _emit_dc(w, 100)
        _emit_eob(w)
    w.flush()
    raw = make_jpeg(128, 8, [(1, 1, 1)], 8, bytes(w.buf))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(raw[:-12])  # drop EOI + the scan's tail
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_decode_luma_dispatch_and_reject():
    png = encode_png([[100, 200], [50, 25]], color_type=0)
    assert decode_luma(png) == decode_png(png)
    jpg = make_jpeg(8, 8, [(1, 1, 1)], 8, _dc_only_block(25))
    assert decode_luma(jpg) == decode_jpeg(jpg)
    with pytest.raises(ValueError, match="unsupported"):
        decode_luma(b"GIF89a....")


def test_cross_codec_same_image_same_hash():
    """An image of flat 8×8 tiles is losslessly encodable in BOTH
    formats (PNG exactly; JPEG as DC-only blocks at q=8, where the
    IDCT of a constant is exact integer). Decoding each must yield
    the same luma grid, hence the identical aHash — the two codec
    paths agree end-to-end on content they can both represent."""
    import random

    rng = random.Random(7)
    tiles = [[rng.randint(-120, 120) for _ in range(5)] for _ in range(3)]
    pixels = [
        [tiles[y // 8][x // 8] + 128 for x in range(40)] for y in range(24)
    ]
    png = encode_png(pixels, color_type=0)

    w = _BitWriter()
    pred = 0
    for ty in range(3):
        for tx in range(5):
            _emit_dc(w, tiles[ty][tx] - pred)
            pred = tiles[ty][tx]
            _emit_eob(w)
    w.flush()
    jpg = make_jpeg(40, 24, [(1, 1, 1)], 8, bytes(w.buf))

    pw, ph, pluma = decode_png(png)
    jw, jh, jluma = decode_jpeg(jpg)
    assert (pw, ph) == (jw, jh) == (40, 24)
    assert pluma == jluma
    assert ahash64_from_luma(pluma, pw, ph) == ahash64_from_luma(
        jluma, jw, jh
    )


def test_media_ahash_real_mixed_formats(spark):
    """PNG and JPEG payloads through ONE Spark mapInPandas pass,
    dispatched per payload by magic bytes; hashes match the pure
    reference for each codec."""
    png = encode_png(_gradient())
    w = _BitWriter()
    # 2 MCUs: bright block then dark block -> structured luma
    _emit_dc(w, 60)
    _emit_eob(w)
    _emit_dc(w, -120)
    _emit_eob(w)
    w.flush()
    jpg = make_jpeg(16, 8, [(1, 1, 1)], 8, bytes(w.buf))

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpg))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in media_ahash_real(df).collect()}
    assert len(got) == 2

    def bits(r):
        return (r["ahash_hi"] << 32) | r["ahash_lo"]

    for doc_id, raw in ((1, png), (2, jpg)):
        w_, h_, luma = decode_luma(raw)
        assert bits(got[doc_id]) == ahash64_from_luma(luma, w_, h_)
