"""Mapbox Vector Tile pyramid: protobuf encoding, decode parity,
pipeline determinism, tileset-layout compatibility."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from rastertiler_rs_ray.pipelines.vectortile import (
    MVT_EXTENT,
    decode_point_layer,
    encode_point_layer,
    mvt_assign,
    render_vector_tileset,
    varint_encode,
    zigzag,
)


def _rd_varints(buf):
    out, i = [], 0
    while i < len(buf):
        shift = val = 0
        while True:
            b = buf[i]
            val |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                break
            shift += 7
        out.append(val)
    return out


def test_varint_roundtrip():
    vals = [0, 1, 127, 128, 300, 16383, 16384, 2**21 - 1, 2**32 - 1, 2**56 + 7]
    assert _rd_varints(varint_encode(np.array(vals, dtype=np.uint64))) == vals


def test_varint_known_bytes():
    # protobuf spec examples: 1 -> 0x01, 300 -> 0xAC 0x02
    assert varint_encode(np.array([1])) == b"\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


def test_zigzag_convention():
    assert list(zigzag(np.array([0, -1, 1, -2, 2147483647, -2147483648]))) == [
        0, 1, 2, 3, 4294967294, 4294967295,
    ]


def test_encode_decode_roundtrip():
    ids = np.array([3, 17, 4096], dtype=np.int64)
    px = np.array([0, 4095, 2048], dtype=np.int64)
    py = np.array([4095, 0, 1], dtype=np.int64)
    blob = encode_point_layer(ids, px, py, name="pts", extent=4096)
    d = decode_point_layer(blob)
    assert d["version"] == 2
    assert d["name"] == "pts"
    assert d["extent"] == 4096
    assert d["ids"] == list(ids)
    assert d["px"] == list(px)
    assert d["py"] == list(py)


def test_encode_deterministic_bytes():
    ids = np.arange(50, dtype=np.int64)
    px = (ids * 37) % 4096
    py = (ids * 91) % 4096
    a = encode_point_layer(ids, px, py)
    b = encode_point_layer(ids.copy(), px.copy(), py.copy())
    assert a == b


def test_mvt_assign_matches_closed_form():
    from rastertiler_rs_ray.geo.mercator import ORIGIN

    rng = np.random.default_rng(7)
    mx = rng.uniform(-ORIGIN, ORIGIN, 500)
    my = rng.uniform(-ORIGIN, ORIGIN, 500)
    t = pa.table({"doc_id": pa.array(np.arange(500)), "mx": mx, "my": my})
    out = mvt_assign(t, zoom=2, extent=256)
    n_px = (1 << 2) * 256
    gx = np.clip(np.floor((mx + ORIGIN) / (2.0 * ORIGIN) * n_px), 0, n_px - 1).astype(int)
    gy = np.clip(
        np.floor((1.0 - (my + ORIGIN) / (2.0 * ORIGIN)) * n_px), 0, n_px - 1
    ).astype(int)
    assert np.array_equal(np.asarray(out.column("x")), gx // 256)
    assert np.array_equal(np.asarray(out.column("y")), gy // 256)
    assert np.array_equal(np.asarray(out.column("lx")), gx % 256)
    assert np.array_equal(np.asarray(out.column("ly")), gy % 256)


@pytest.fixture()
def point_ds(ray_session):
    from rastertiler_rs_ray.geo.mercator import ORIGIN

    ids = np.arange(2000, dtype=np.int64)
    mx = ((ids * 2654435761) % 3_600_000) / 3_600_000 * 2 * ORIGIN - ORIGIN
    my = ((ids * 2246822519) % 1_700_000) / 1_700_000 * 1.7 * ORIGIN - 0.85 * ORIGIN
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "mx": mx, "my": my})
    ).repartition(4)


def test_render_vector_tileset(point_ds, tmp_path):
    out = str(tmp_path / "mvt")
    man = render_vector_tileset(point_ds, out, [1, 2], extent=MVT_EXTENT)
    tiles = ray.data.read_parquet(os.path.join(out, "tiles")).to_pandas()
    # every input feature appears exactly once per zoom
    assert len(tiles) > 0
    seen = {1: set(), 2: set()}
    from rastertiler_rs_ray.geo.mercator import ORIGIN

    for _, row in tiles.iterrows():
        d = decode_point_layer(bytes(row["tile_data"]))
        assert d["version"] == 2 and d["extent"] == MVT_EXTENT
        z, x, y = int(row["zoom"]), int(row["x"]), int(row["y"])
        assert int(row["tms_y"]) == (1 << z) - 1 - y
        # ids sorted within tile (determinism contract)
        assert d["ids"] == sorted(d["ids"])
        for fid, lx, ly in zip(d["ids"], d["px"], d["py"]):
            assert 0 <= lx < MVT_EXTENT and 0 <= ly < MVT_EXTENT
            assert fid not in seen[z]
            seen[z].add(fid)
    assert seen[1] == set(range(2000)) and seen[2] == set(range(2000))
    # manifest records both zoom parts + images
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert m["meta"]["metadata"]["format"] == "pbf"
    assert m["partitions"]["tiles/g01"]["rows"] > 0
    assert m["partitions"]["images"]["status"] == "complete"
    # images content-dedup exists and is consistent with tile hashes
    imgs = ray.data.read_parquet(os.path.join(out, "images")).to_pandas()
    assert set(imgs["tile_hash"]) == set(tiles["tile_hash"])
    assert imgs["tile_hash"].is_unique


def test_render_vector_tileset_deterministic(point_ds, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    render_vector_tileset(point_ds, a, [2])
    render_vector_tileset(point_ds.repartition(9), b, [2])
    ta = ray.data.read_parquet(os.path.join(a, "tiles")).to_pandas()
    tb = ray.data.read_parquet(os.path.join(b, "tiles")).to_pandas()
    ta = ta.sort_values(["zoom", "x", "y"]).reset_index(drop=True)
    tb = tb.sort_values(["zoom", "x", "y"]).reset_index(drop=True)
    assert list(ta["tile_hash"]) == list(tb["tile_hash"])
    assert all(bytes(p) == bytes(q) for p, q in zip(ta["tile_data"], tb["tile_data"]))


def test_vector_tileset_audit_compatible(point_ds, tmp_path):
    """The MVT tileset is a first-class citizen of the tileset toolset:
    the audit sees a complete cover of its own addresses."""
    from rastertiler_rs_ray.pipelines.merge import diff_tilesets

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    render_vector_tileset(point_ds, a, [2])
    render_vector_tileset(point_ds, b, [2])
    assert diff_tilesets(a, b).count() == 0


def test_line_layer_roundtrip_fuzz():
    from rastertiler_rs_ray.pipelines.vectortile import (
        decode_line_layer,
        encode_line_layer,
    )

    rng = np.random.default_rng(12)
    for _ in range(25):
        nf = int(rng.integers(1, 50))
        kk = rng.integers(2, 10, nf)  # MVT: linestrings need >= 2 vertices
        starts = np.concatenate([[0], np.cumsum(kk)])
        px = rng.integers(-6000, 6000, starts[-1])
        py = rng.integers(-6000, 6000, starts[-1])
        ids = np.sort(rng.choice(10**7, nf, replace=False))
        d = decode_line_layer(encode_line_layer(ids, starts, px, py, name="l"))
        assert d["name"] == "l" and d["version"] == 2
        assert d["ids"] == ids.tolist()
        want = [
            [(int(px[a + i]), int(py[a + i])) for i in range(b - a)]
            for a, b in zip(starts[:-1], starts[1:])
        ]
        assert d["lines"] == want


def test_line_layer_rejects_single_vertex():
    """MVT v2.1: a MoveTo with no LineTo is invalid LINESTRING geometry —
    the encoder must reject it instead of emitting it silently."""
    import pytest

    from rastertiler_rs_ray.pipelines.vectortile import encode_line_layer

    with pytest.raises(ValueError, match="2"):
        encode_line_layer(
            np.array([1], np.uint64), np.array([0, 1]),
            np.array([5]), np.array([5]), name="l",
        )


def test_contour_mvt_end_to_end(ray_session, tmp_path):
    """Contour segments → MVT lines tileset → decode a tile back and
    check the features against the segment table (endpoints survive the
    encode/decode; buffer coords beyond [0, extent) allowed)."""
    import dataclasses

    import pyarrow.dataset as pads

    from rastertiler_rs_ray.pipelines.contour import contour_segments_windowed
    from rastertiler_rs_ray.pipelines.vectortile import (
        decode_line_layer,
        render_contour_mvt,
    )
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    r = default_u8_raster()
    segs = contour_segments_windowed(
        r.spec(), 256, 256, 384, 384, level=127.5, chunk=64
    ).materialize()
    n_segs = segs.count()
    out = str(tmp_path / "cmvt")
    render_contour_mvt(
        segs, dataclasses.astuple(r.transform), out, zoom=12
    )
    tiles = pads.dataset(out + "/tiles", format="parquet", partitioning="hive").to_table()
    assert tiles.num_rows > 0
    total = 0
    for blob in tiles.column("tile_data"):
        d = decode_line_layer(blob.as_py())
        assert d["name"] == "contours" and d["version"] == 2
        assert all(len(line) == 2 for line in d["lines"])
        assert d["ids"] == sorted(d["ids"])  # deterministic bytes
        total += len(d["ids"])
    assert total == n_segs  # every segment landed in exactly one tile


def test_point_layer_attrs_roundtrip():
    from rastertiler_rs_ray.pipelines.vectortile import (
        decode_point_layer,
        encode_point_layer,
    )

    rng = np.random.default_rng(33)
    n = 60
    ids = np.sort(rng.choice(10**6, n, replace=False))
    px = rng.integers(0, 4096, n)
    py = rng.integers(0, 4096, n)
    counts = rng.integers(-50, 50, n)  # negatives exercise sint values
    ranks = rng.integers(0, 5, n)
    blob = encode_point_layer(
        ids, px, py, attrs={"n_docs": counts, "rank": ranks}
    )
    d = decode_point_layer(blob)
    assert d["keys"] == ["n_docs", "rank"]
    assert d["ids"] == ids.tolist()
    for i in range(n):
        assert d["attrs"][i] == {"n_docs": int(counts[i]), "rank": int(ranks[i])}
    # attribute-free bytes are unchanged (no keys/values blocks)
    d0 = decode_point_layer(encode_point_layer(ids, px, py))
    assert d0["keys"] == [] and d0["attrs"] == [{}] * n


def test_polygon_box_layer_roundtrip():
    from rastertiler_rs_ray.pipelines.vectortile import (
        decode_polygon_box_layer,
        encode_polygon_box_layer,
    )

    rng = np.random.default_rng(44)
    n = 40
    ids = np.sort(rng.choice(10**6, n, replace=False))
    x0 = rng.integers(-500, 3000, n)
    y0 = rng.integers(-500, 3000, n)
    x1 = x0 + rng.integers(1, 800, n)
    y1 = y0 + rng.integers(1, 800, n)
    areas = (x1 - x0) * (y1 - y0)
    d = decode_polygon_box_layer(
        encode_polygon_box_layer(ids, x0, y0, x1, y1, attrs={"area": areas})
    )
    assert d["version"] == 2 and d["name"] == "boxes"
    assert d["ids"] == ids.tolist()
    assert d["boxes"] == [
        (int(a), int(b), int(c), int(e)) for a, b, c, e in zip(x0, y0, x1, y1)
    ]
    assert all(
        d["attrs"][i] == {"area": int(areas[i])} for i in range(n)
    )


def test_point_layer_string_tags():
    from rastertiler_rs_ray.pipelines.vectortile import (
        decode_point_layer,
        encode_point_layer,
    )

    ids = np.array([1, 2, 3, 4])
    px = py = np.array([0, 1, 2, 3])
    langs = np.array(["en", "fr", "en", "zh"])
    n = np.array([10, -1, 10, 0])
    d = decode_point_layer(
        encode_point_layer(ids, px, py, attrs={"lang": langs, "n": n})
    )
    assert d["attrs"] == [
        {"lang": "en", "n": 10},
        {"lang": "fr", "n": -1},
        {"lang": "en", "n": 10},
        {"lang": "zh", "n": 0},
    ]
    # string values table deduped in first-occurrence order
    assert d["values"][:3] == ["en", "fr", "zh"]
