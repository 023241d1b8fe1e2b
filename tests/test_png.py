"""PNG encoder tests: bit packing goldens (FIXTURES.md §B10), roundtrip
through our test decoder, tRNS/PLTE layout, dynamic-palette cap rule."""

import numpy as np
import pytest

from rastertiler_rs_ray.functions.packing import pack_bits_rows
from rastertiler_rs_ray.png import (
    Colormap,
    ColormapEncoder,
    GrayscaleEncoder,
    RGBEncoder,
    decode_png,
    parse_colormap,
    rgb8_from_hex,
    rgb8_from_u32,
)
from rastertiler_rs_ray.png.encoders import build_dynamic_palette, _select_depth


def test_hex_parse():
    assert rgb8_from_hex("#FF00FF") == (255, 0, 255)
    with pytest.raises(ValueError):
        rgb8_from_hex("FF00FF")
    with pytest.raises(ValueError):
        rgb8_from_hex("#FF00F")


def test_u32_unpack():
    r, g, b = rgb8_from_u32(np.array([0xAABBCC, 0x010203], dtype=np.uint32))
    assert list(r) == [0xAA, 0x01] and list(g) == [0xBB, 0x02] and list(b) == [0xCC, 0x03]


# B10 packing goldens (src/png/util.rs:5-17)
def test_pack_goldens():
    assert pack_bits_rows(np.array([[1, 0, 0, 0, 0, 0, 0, 1]], np.uint8), 1)[0, 0] == 0x81
    assert pack_bits_rows(np.array([[3, 2, 1, 0]], np.uint8), 2)[0, 0] == 0xE4
    assert pack_bits_rows(np.array([[0xF, 0x1]], np.uint8), 4)[0, 0] == 0xF1
    # row-aligned padding: 3 pixels at 2-bit → one byte, low bits zero
    assert pack_bits_rows(np.array([[3, 3, 3]], np.uint8), 2)[0, 0] == 0b11111100


def test_depth_selection():
    # palette len incl nodata slot: ≤2→1, ≤4→2, ≤16→4, else 8 (colormap.rs:96-101)
    assert _select_depth(2) == 1
    assert _select_depth(3) == 2
    assert _select_depth(4) == 2
    assert _select_depth(16) == 4
    assert _select_depth(17) == 8


def test_grayscale_roundtrip():
    rng = np.random.default_rng(42)
    buf = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    png = GrayscaleEncoder(16, 16, nodata=7).encode(buf)
    d = decode_png(png)
    assert d["color_type"] == 0 and d["bit_depth"] == 8
    assert d["trns"] == bytes([0, 7])
    np.testing.assert_array_equal(d["pixels"], buf)


@pytest.mark.parametrize("n_colors,exp_depth", [(1, 1), (3, 2), (14, 4), (100, 8)])
def test_indexed_roundtrip(n_colors, exp_depth):
    cm = Colormap(nodata=0)
    for v in range(1, n_colors + 1):
        cm.add_color(v, (v % 256, (v * 3) % 256, (v * 7) % 256))
    rng = np.random.default_rng(1)
    buf = rng.integers(0, n_colors + 1, size=(16, 16), dtype=np.uint16)
    png = ColormapEncoder(16, 16, cm).encode(buf)
    d = decode_png(png)
    assert d["color_type"] == 3 and d["bit_depth"] == exp_depth
    assert d["trns"] == b"\x00"
    assert d["palette"][:3] == b"\x00\x00\x00"  # index 0 = nodata, black
    np.testing.assert_array_equal(d["pixels"], cm.index_of(buf))


def test_indexed_unknown_value_maps_to_zero():
    cm = parse_colormap("1:#ff0000,2:#00ff00", nodata=255)
    buf = np.array([[1, 2, 99, 255]], dtype=np.uint8)
    idx = cm.index_of(buf)
    # 255 (nodata) → 0; unknown 99 → 0 (transparent per color.rs:99-106)
    np.testing.assert_array_equal(idx, [[1, 2, 0, 0]])
    assert cm.palette_bytes() == bytes([0, 0, 0, 255, 0, 0, 0, 255, 0])


def test_indexed_u16_pixels():
    """ColormapEncoder is pixel-dtype generic, like the reference's
    ColormapEncoder<T: PixelValue> with `impl PixelValue for u16`
    (src/png/mod.rs:15-19): a uint16 buffer with values beyond the u8
    range encodes byte-identically to the same values as uint32."""
    cm = Colormap(nodata=0)
    cm.add_color(1000, (255, 0, 0))
    cm.add_color(40000, (0, 255, 0))
    buf16 = np.array([[1000, 40000], [0, 1000]], dtype=np.uint16)
    enc = ColormapEncoder(2, 2, cm)
    png16 = enc.encode(buf16)
    png32 = enc.encode(buf16.astype(np.uint32))
    assert png16 == png32
    d = decode_png(png16)
    assert d["color_type"] == 3  # indexed
    np.testing.assert_array_equal(cm.index_of(buf16), [[1, 2], [0, 1]])


def test_rgb_roundtrip():
    rng = np.random.default_rng(3)
    buf = rng.integers(0, 2**24, size=(8, 8), dtype=np.uint32)
    enc = RGBEncoder(8, 8, nodata=0x123456)
    png = enc.encode_u32(buf)
    d = decode_png(png)
    assert d["color_type"] == 2 and d["bit_depth"] == 8
    assert d["trns"] == bytes([0, 0x12, 0, 0x34, 0, 0x56])
    r, g, b = rgb8_from_u32(buf)
    np.testing.assert_array_equal(d["pixels"], np.stack([r, g, b], axis=-1))


def test_dynamic_palette_insertion_order():
    buf = np.array([[5, 5, 3], [3, 9, 0]], dtype=np.uint32)
    cm = build_dynamic_palette(buf, nodata=0)
    # insertion order: nodata=0 → idx0, then 5, 3, 9 by first occurrence
    np.testing.assert_array_equal(cm.index_of(buf), [[1, 1, 2], [2, 3, 0]])
    assert len(cm) == 4


def test_dynamic_palette_cap():
    # 254 distinct non-nodata → palette; 256 → RGB
    ok = np.arange(1, 255, dtype=np.uint32).reshape(2, 127)
    assert build_dynamic_palette(ok, nodata=0) is not None
    over = np.arange(1, 257, dtype=np.uint32).reshape(2, 128)
    assert build_dynamic_palette(over, nodata=0) is None
    # exactly 255 distinct, last new value at final pixel → still palette
    edge = np.concatenate([np.arange(1, 255, dtype=np.uint32),
                           np.array([1, 255], dtype=np.uint32)])
    assert build_dynamic_palette(edge.reshape(1, -1), nodata=0) is not None
    # exactly 255 distinct but last new value NOT at final pixel → RGB
    edge2 = np.concatenate([np.arange(1, 256, dtype=np.uint32),
                            np.array([1], dtype=np.uint32)])
    assert build_dynamic_palette(edge2.reshape(1, -1), nodata=0) is None


def test_png_determinism():
    buf = np.arange(256, dtype=np.uint8).reshape(16, 16)
    a = GrayscaleEncoder(16, 16, 0).encode(buf)
    b = GrayscaleEncoder(16, 16, 0).encode(buf.copy())
    assert a == b


def test_decode_png_all_filter_types():
    """decode_png must unfilter scanlines written with every PNG filter
    type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) — foreign writers
    pick filters per row; ours always writes 0."""
    import struct
    import zlib

    from rastertiler_rs_ray.png.writer import _SIGNATURE, _chunk, decode_png

    rng = np.random.RandomState(4)
    h, w = 10, 17
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa_, pb_, pc_ = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        if pa_ <= pb_ and pa_ <= pc_:
            return int(a)
        if pb_ <= pc_:
            return int(b)
        return int(c)

    # forward-filter per the PNG spec, cycling through all 5 types
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        ft = y % 5
        row = img[y].astype(np.int64)
        enc = np.zeros(w, dtype=np.int64)
        for x in range(w):
            a = row[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ft == 0:
                enc[x] = row[x]
            elif ft == 1:
                enc[x] = (row[x] - a) % 256
            elif ft == 2:
                enc[x] = (row[x] - b) % 256
            elif ft == 3:
                enc[x] = (row[x] - (a + b) // 2) % 256
            else:
                enc[x] = (row[x] - paeth(a, b, c)) % 256
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    got = decode_png(png)
    assert got["width"] == w and got["height"] == h
    assert np.array_equal(got["pixels"], img)
