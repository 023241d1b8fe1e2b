"""TIFF-flavor LZW codec (TIFF 6.0 spec §13, public domain algorithm).

The reference writes COMPRESS=LZW GeoTIFFs via GDAL
(/root/reference/src/dataset.rs:213), and LZW is the most common
GeoTIFF compression in the wild — this pure-Python implementation lets
the reader ingest those files and the writer produce byte-compatible
ones without any native codec.

TIFF LZW specifics implemented here (vs generic LZW):

- MSB-first bit packing;
- codes start at 9 bits; ClearCode=256, EOI=257, first table entry 258;
- "early change": the code width bumps one code EARLY — when the next
  free code reaches 511/1023/2047 the width becomes 10/11/12 bits;
- the encoder emits ClearCode whenever the next free code would be 4094
  (table reset; readers cap the table at 4095 with 4094 reserved).

Throughput note: this is a per-byte Python loop (~a few MB/s), fine for
256² raster tiles (64 KiB each, decoded once into the actor LRU chunk
cache); deflate remains the fast path for engine-authored files.
"""

from __future__ import annotations

_CLEAR = 256
_EOI = 257


def encode(data: bytes) -> bytes:
    """Compress ``data`` with TIFF-LZW."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    width = 9

    def put(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table: dict[tuple[int, int], int] = {}
    next_code = 258
    put(_CLEAR)
    prev = -1
    for byte in data:
        if prev < 0:
            prev = byte
            continue
        hit = table.get((prev, byte))
        if hit is not None:
            prev = hit
            continue
        put(prev)
        table[(prev, byte)] = next_code
        next_code += 1
        # early change: bump width when the NEXT code to assign reaches
        # 2^width - 1 (TIFF writes the following code in the wider size)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table full → reset
            put(_CLEAR)
            table.clear()
            next_code = 258
            width = 9
        prev = byte
    if prev >= 0:
        put(prev)
    put(_EOI)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def decode(data: bytes, max_size: int | None = None) -> bytes:
    """Decompress TIFF-LZW ``data``; stops at EOI or end of input.

    ``max_size`` optionally bounds the output (a corrupt stream cannot
    balloon past the expected chunk size).
    """
    out = bytearray()
    # table[i] = bytes for code i; codes 0-255 are single bytes
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    prev_entry: bytes | None = None

    while True:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)  # ran off the end without EOI: tolerate
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= width
        code = (bitbuf >> bitcnt) & ((1 << width) - 1)

        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev_entry = None
            continue
        if prev_entry is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev_entry + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev_entry + prev_entry[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table size")
        out += entry
        prev_entry = entry
        if max_size is not None and len(out) > max_size:
            raise ValueError("LZW output exceeds expected chunk size")
        # early change (decoder side): the decoder's table trails the
        # encoder's next_code by one (it appends only after seeing the
        # FOLLOWING code), so it widens at 510/1022/2046 where the
        # encoder widened at 511/1023/2047
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
