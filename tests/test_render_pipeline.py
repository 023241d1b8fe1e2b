"""End-to-end render/merge pipeline tests against frozen goldens.

Verifies: Ray-distributed output == single-process goldens (hash-exact
at any parallelism), per-zoom counts, images dedup cardinality, MBTiles
export schema parity, resume-skips-completed-partitions, and merge
left-wins semantics (FIXTURES.md §B11-B12)."""

import glob
import hashlib
import json
import os
import sqlite3

import pandas as pd
import pyarrow.dataset as pads
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _load_golden(name):
    with open(os.path.join(GOLD, f"{name}.json")) as f:
        return json.load(f)


def _tile_hashes(out_dir):
    t = pads.dataset(os.path.join(out_dir, "tiles"), format="parquet").to_table()
    out = {}
    for i in range(len(t)):
        key = f"{t.column('zoom')[i]}/{t.column('x')[i]}/{t.column('y')[i]}"
        out[key] = hashlib.sha256(t.column("tile_data")[i].as_py()).hexdigest()
    return out


@pytest.fixture(scope="module")
def rendered_u8(ray_session, tmp_path_factory):
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    out = str(tmp_path_factory.mktemp("ts") / "u8")
    manifest = render_pyramid(
        default_u8_raster(), out, 0, 6, tilesize=256, concurrency=3, resume=False
    )
    return out, manifest


def test_render_u8_matches_golden(rendered_u8):
    out, _ = rendered_u8
    golden = _load_golden("render_u8_z0-6_ts256")
    assert _tile_hashes(out) == golden["tiles"]


def test_render_counts_and_images(rendered_u8):
    from rastertiler_rs_ray.pipelines.render import tileset_counts

    out, _ = rendered_u8
    golden = _load_golden("render_u8_z0-6_ts256")
    c = tileset_counts(out)
    assert c["total"] == golden["count"]
    assert c["images"] == golden["distinct_images"]


def test_manifest_lineage(rendered_u8):
    out, manifest = rendered_u8
    parts = manifest.completed_partitions()
    assert "images" in parts
    tile_parts = [p for p in parts if p.startswith("tiles/")]
    assert tile_parts
    total = sum(manifest.partition(p)["rows"] for p in tile_parts)
    assert total == _load_golden("render_u8_z0-6_ts256")["count"]
    for p in tile_parts:
        assert manifest.partition(p)["wall_s"] > 0
        assert "input_tiles" in manifest.partition(p)


def test_mbtiles_export(rendered_u8, tmp_path):
    from rastertiler_rs_ray.pipelines.render import export_mbtiles

    out, _ = rendered_u8
    db = str(tmp_path / "out.mbtiles")
    export_mbtiles(out, db)
    conn = sqlite3.connect(db)
    golden = _load_golden("render_u8_z0-6_ts256")
    assert conn.execute("select count(*) from map").fetchone()[0] == golden["count"]
    assert (
        conn.execute("select count(*) from images").fetchone()[0]
        == golden["distinct_images"]
    )
    # tiles view joins back to full cardinality (ref src/mbtiles.rs:27-29)
    assert conn.execute("select count(*) from tiles").fetchone()[0] == golden["count"]
    md = dict(conn.execute("select name, value from metadata").fetchall())
    assert md["minzoom"] == "0" and md["maxzoom"] == "6"
    assert md["format"] == "png" and md["type"] == "overlay" and md["version"] == "1.0.0"
    # y stored TMS-flipped: z1 tile rows ∈ {0,1} and match 2^z-1-y
    rows = conn.execute(
        "select tile_column, tile_row from map where zoom_level=1"
    ).fetchall()
    assert all(0 <= r < 2 for _, r in rows)
    conn.close()


def test_resume_skips_completed(rendered_u8):
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    out, manifest = rendered_u8
    tiles_dirs = sorted(
        d for d in os.listdir(os.path.join(out, "tiles")) if d.startswith("part=g")
    )
    assert tiles_dirs, "expected hive-partitioned tile group dirs"
    mtime_before = {
        d: os.path.getmtime(os.path.join(out, "tiles", d)) for d in tiles_dirs
    }
    m2 = render_pyramid(
        default_u8_raster(), out, 0, 6, tilesize=256, concurrency=3, resume=True
    )
    # no partition rewritten
    for d in tiles_dirs:
        assert os.path.getmtime(os.path.join(out, "tiles", d)) == mtime_before[d]
    assert set(m2.completed_partitions()) == set(manifest.completed_partitions())


def test_render_u32_matches_golden(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.render import render_pyramid, tileset_counts
    from rastertiler_rs_ray.raster import default_u32_raster

    out = str(tmp_path / "u32")
    render_pyramid(
        default_u32_raster(), out, 5, 7, tilesize=256, concurrency=3, resume=False
    )
    golden = _load_golden("render_u32_z5-7_ts256")
    assert _tile_hashes(out) == golden["tiles"]
    assert tileset_counts(out)["images"] == golden["distinct_images"]


def test_render_u8_colormap_matches_golden(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    out = str(tmp_path / "u8cm")
    render_pyramid(
        default_u8_raster(), out, 4, 5, tilesize=256,
        colormap="42:#ff7f50,7:#0000ff,99:#00ff00",
        concurrency=2, resume=False,
    )
    assert _tile_hashes(out) == _load_golden("render_u8_cm_z4-5_ts256")["tiles"]


def test_colormap_rejected_for_u32(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u32_raster

    with pytest.raises(ValueError, match="colormap"):
        render_pyramid(
            default_u32_raster(), str(tmp_path / "x"), 0, 1, colormap="1:#ff0000"
        )


def test_merge_left_wins(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.merge import merge_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster
    from rastertiler_rs_ray.state.manifest import Manifest

    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    # same tile addresses, different content (different seed)
    render_pyramid(default_u8_raster(seed=42), left_dir, 3, 5, tilesize=64,
                   concurrency=2, resume=False)
    render_pyramid(default_u8_raster(seed=99), right_dir, 4, 6, tilesize=64,
                   concurrency=2, resume=False)

    out = str(tmp_path / "merged")
    manifest = merge_tilesets(left_dir, right_dir, out)

    lh = _tile_hashes(left_dir)
    rh = _tile_hashes(right_dir)
    mh = _tile_hashes(out)

    # union of addresses
    assert set(mh) == set(lh) | set(rh)
    # left wins on overlap; right-only tiles come from right
    for k, v in mh.items():
        assert v == (lh[k] if k in lh else rh[k])
    # metadata zoom range union (ref src/mbtiles.rs:181-207)
    md = Manifest(os.path.join(out, "manifest.json")).get_meta("metadata")
    assert md["minzoom"] == "3" and md["maxzoom"] == "6"


def test_merge_is_map_only(ray_session, tmp_path, monkeypatch):
    """merge_tilesets must never put blobs through a shuffle: groupby,
    sort and repartition are forbidden for the whole merge job (the
    winner election is a broadcast anti-join on narrow packed keys)."""
    import ray.data

    from rastertiler_rs_ray.pipelines.merge import merge_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    render_pyramid(default_u8_raster(seed=42), left_dir, 3, 4, tilesize=64,
                   concurrency=2, resume=False)
    render_pyramid(default_u8_raster(seed=99), right_dir, 4, 5, tilesize=64,
                   concurrency=2, resume=False)

    def forbidden(name):
        def f(self, *a, **kw):
            raise AssertionError(f"{name} called during merge_tilesets")
        return f

    monkeypatch.setattr(ray.data.Dataset, "groupby", forbidden("groupby"))
    monkeypatch.setattr(ray.data.Dataset, "sort", forbidden("sort"))
    monkeypatch.setattr(ray.data.Dataset, "repartition", forbidden("repartition"))

    out = str(tmp_path / "merged")
    merge_tilesets(left_dir, right_dir, out)
    lh, rh, mh = _tile_hashes(left_dir), _tile_hashes(right_dir), _tile_hashes(out)
    assert set(mh) == set(lh) | set(rh)
    for k, v in mh.items():
        assert v == (lh[k] if k in lh else rh[k])


def test_dedup_hits_at_upsampled_zooms(ray_session, tmp_path):
    # constant-content blocks upsample into identical tiles → images < map
    from rastertiler_rs_ray.pipelines.render import render_pyramid, tileset_counts
    from rastertiler_rs_ray.raster import default_u8_raster

    out = str(tmp_path / "hi")
    render_pyramid(default_u8_raster(), out, 9, 10, tilesize=256,
                   concurrency=3, resume=False)
    golden = _load_golden("render_u8_z9-10_ts256")
    c = tileset_counts(out)
    assert c["total"] == golden["count"]
    assert c["images"] == golden["distinct_images"]
    assert c["images"] < c["total"]


def test_tileset_sorted_by_construction(ray_session, tmp_path):
    """Without a global sort, the tileset must still come out ordered
    (zoom asc, x-major) because enumeration order is preserved end-to-end."""
    import numpy as np
    import pyarrow.dataset as pads

    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    out = str(tmp_path / "sorted_ts")
    render_pyramid(default_u8_raster(), out, 0, 5, tilesize=256, concurrency=3, resume=False)
    files = sorted(glob.glob(os.path.join(out, "tiles", "**", "*.parquet"), recursive=True))
    t = pads.dataset(files, format="parquet").to_table(columns=["zoom", "x", "y"])
    key = (
        t.column("zoom").to_numpy().astype(np.int64) << 58
    ) | (t.column("x").to_numpy().astype(np.int64) << 29) | t.column("y").to_numpy().astype(np.int64)
    assert np.all(np.diff(key) > 0), "tileset rows not strictly sorted by (zoom,x,y)"


def test_resume_after_simulated_crash(ray_session, tmp_path):
    """A run that died mid-way (one zoom-group's files missing, no
    manifest record — the crash window) resumes by re-rendering ONLY the
    missing group and converges to the complete result."""
    import json
    import shutil

    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    out = str(tmp_path / "clean")
    # small per-group target -> several checkpoint partitions at z0-5
    render_pyramid(
        default_u8_raster(), out, 0, 5, tilesize=256, concurrency=3,
        resume=False, target_tiles_per_group=2,
    )
    crashed = str(tmp_path / "crashed")
    shutil.copytree(out, crashed)
    full_hashes = _tile_hashes(out)

    # simulate the crash: drop one group's partition dir + manifest entry
    groups = sorted(
        d for d in os.listdir(os.path.join(crashed, "tiles")) if d.startswith("part=g")
    )
    assert len(groups) >= 3, groups
    victim = groups[1]
    shutil.rmtree(os.path.join(crashed, "tiles", victim))
    mpath = os.path.join(crashed, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["partitions"]["tiles/" + victim.removeprefix("part=")]
    with open(mpath, "w") as f:
        json.dump(m, f)

    survivors = [d for d in groups if d != victim]
    mtime_before = {
        d: os.path.getmtime(os.path.join(crashed, "tiles", d)) for d in survivors
    }
    m2 = render_pyramid(
        default_u8_raster(), crashed, 0, 5, tilesize=256, concurrency=3,
        resume=True, target_tiles_per_group=2,
    )
    # survivors untouched, victim re-rendered, output identical to a clean run
    for d in survivors:
        assert os.path.getmtime(os.path.join(crashed, "tiles", d)) == mtime_before[d]
    assert m2.is_complete("tiles/" + victim.removeprefix("part="))
    assert _tile_hashes(crashed) == full_hashes


def test_resume_partial_manifest_rebuilds_full_images(ray_session, tmp_path):
    """Crash window: some tile groups recorded complete, images/ not yet
    recorded.  The resumed run re-renders only the pending group but must
    build images/ from ALL tiles (completed partitions included) — a
    hash that appears only in a completed partition must still get its
    blob, or map rows dangle in the exported `tiles` view."""
    import json
    import shutil

    from rastertiler_rs_ray.pipelines.render import render_pyramid, tileset_counts
    from rastertiler_rs_ray.raster import default_u8_raster

    out = str(tmp_path / "full")
    render_pyramid(
        default_u8_raster(), out, 0, 5, tilesize=256, concurrency=3,
        resume=False, target_tiles_per_group=2,
    )
    full_counts = tileset_counts(out)
    full_hashes = _tile_hashes(out)

    crashed = str(tmp_path / "crashed")
    shutil.copytree(out, crashed)
    groups = sorted(
        d for d in os.listdir(os.path.join(crashed, "tiles")) if d.startswith("part=g")
    )
    assert len(groups) >= 3, groups
    # crash: last group unrendered, images not recorded (dir half-written)
    victim = groups[-1]
    shutil.rmtree(os.path.join(crashed, "tiles", victim))
    shutil.rmtree(os.path.join(crashed, "images"))
    mpath = os.path.join(crashed, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["partitions"]["tiles/" + victim.removeprefix("part=")]
    del m["partitions"]["images"]
    with open(mpath, "w") as f:
        json.dump(m, f)

    render_pyramid(
        default_u8_raster(), crashed, 0, 5, tilesize=256, concurrency=3,
        resume=True, target_tiles_per_group=2,
    )
    assert _tile_hashes(crashed) == full_hashes
    c = tileset_counts(crashed)
    assert c == full_counts
    # every map row's hash has a blob in images/
    img = pads.dataset(os.path.join(crashed, "images"), format="parquet").to_table(
        columns=["tile_hash"]
    )
    tiles = pads.dataset(os.path.join(crashed, "tiles"), format="parquet").to_table(
        columns=["tile_hash"]
    )
    assert set(tiles.column("tile_hash").to_pylist()) <= set(
        img.column("tile_hash").to_pylist()
    )


def test_mbtiles_roundtrip_and_merge(ray_session, tmp_path):
    """render → export_mbtiles → read/import_mbtiles → identical tileset;
    the imported layout merges with a rendered one."""
    from rastertiler_rs_ray.pipelines.merge import merge_tilesets
    from rastertiler_rs_ray.pipelines.render import (
        export_mbtiles,
        import_mbtiles,
        read_mbtiles,
        render_pyramid,
        tileset_counts,
    )
    from rastertiler_rs_ray.raster import default_u8_raster

    src = str(tmp_path / "src")
    render_pyramid(default_u8_raster(), src, 2, 4, tilesize=64, concurrency=2,
                   resume=False)
    db = str(tmp_path / "t.mbtiles")
    export_mbtiles(src, db)

    # read path: same addresses and blobs as the source tileset
    got = read_mbtiles(db).to_pandas()
    want = _tile_hashes(src)
    assert len(got) == len(want)
    import hashlib as _h
    for _, r in got.iterrows():
        assert want[f"{r['zoom']}/{r['x']}/{r['y']}"] == _h.sha256(r["tile_data"]).hexdigest()

    # import path: full tileset-layout parity
    imp = str(tmp_path / "imported")
    m = import_mbtiles(db, imp)
    assert _tile_hashes(imp) == want
    assert tileset_counts(imp)["images"] == tileset_counts(src)["images"]
    assert m.get_meta("metadata")["minzoom"] == "2"

    # imported tileset participates in merge (left-wins overlap)
    other = str(tmp_path / "other")
    render_pyramid(default_u8_raster(seed=99), other, 3, 5, tilesize=64,
                   concurrency=2, resume=False)
    merged = str(tmp_path / "merged")
    merge_tilesets(imp, other, merged)
    mh = _tile_hashes(merged)
    oh = _tile_hashes(other)
    assert set(mh) == set(want) | set(oh)
    for k, v in mh.items():
        assert v == (want[k] if k in want else oh[k])


def test_world_raster_full_pyramid(ray_session, tmp_path):
    """A corner-to-corner Web Mercator raster renders the COMPLETE
    pyramid (4^z tiles per zoom) with boundary clamps at the projection
    edge; determinism holds at a second concurrency."""
    from rastertiler_rs_ray.pipelines.render import render_pyramid, tileset_counts
    from rastertiler_rs_ray.raster.synthetic import world_u8_raster

    out = str(tmp_path / "world")
    render_pyramid(world_u8_raster(), out, 0, 3, tilesize=128, concurrency=3,
                   resume=False)
    c = tileset_counts(out)
    # all-nodata tiles are skipped (ref semantics); oracle the expected
    # set from the raster itself
    r = world_u8_raster()
    expect = {
        z: sum(
            1
            for x in range(1 << z)
            for y in range(1 << z)
            if r.read_tile(z, x, y, 128) is not None
        )
        for z in range(4)
    }
    assert c["per_zoom"] == expect
    assert expect[0] == 1 and expect[1] == 4  # low zooms never all-nodata here
    assert sum(expect.values()) == c["total"]
    h1 = _tile_hashes(out)

    out2 = str(tmp_path / "world2")
    render_pyramid(world_u8_raster(), out2, 0, 3, tilesize=128, concurrency=7,
                   resume=False)
    assert _tile_hashes(out2) == h1


def test_incremental_render_equals_full(ray_session, tmp_path):
    """Dirty-cover re-render + left-wins merge == full re-render of the
    patched raster, tile-for-tile."""
    from rastertiler_rs_ray.pipelines.merge import merge_tilesets
    from rastertiler_rs_ray.pipelines.render import (
        render_pyramid,
        tileset_map_dataset,
    )
    from rastertiler_rs_ray.raster.synthetic import (
        PatchedRaster,
        default_u8_raster,
    )

    base_r = default_u8_raster(seed=42)
    patched = PatchedRaster(
        base_r.spec(), default_u8_raster(seed=9).spec(), (512, 512, 1024, 896)
    )
    d = str(tmp_path)
    render_pyramid(base_r, f"{d}/base", 2, 5, tilesize=64, resume=False)
    render_pyramid(
        patched,
        f"{d}/patch",
        2,
        5,
        tilesize=64,
        resume=False,
        plan_bounds=patched.dirty_bounds(),
    )
    merge_tilesets(f"{d}/patch", f"{d}/base", f"{d}/merged")
    render_pyramid(patched, f"{d}/full", 2, 5, tilesize=64, resume=False)

    def m(p):
        return (
            tileset_map_dataset(p)
            .select_columns(["zoom", "x", "y", "tile_hash"])
            .to_pandas()
            .sort_values(["zoom", "x", "y"])
            .reset_index(drop=True)
        )

    got, want = m(f"{d}/merged"), m(f"{d}/full")
    pd.testing.assert_frame_equal(got, want)
    # and the patch really changed something vs the base
    assert not m(f"{d}/base").equals(want)


def test_patched_raster_values():
    import numpy as np

    from rastertiler_rs_ray.raster.factory import raster_from_spec
    from rastertiler_rs_ray.raster.synthetic import (
        PatchedRaster,
        default_u8_raster,
    )

    a = default_u8_raster(seed=42)
    b = default_u8_raster(seed=9)
    p = PatchedRaster(a.spec(), b.spec(), (100, 200, 300, 400))
    cols = np.arange(50, 350)[None, :]
    rows = np.arange(150, 450)[:, None]
    got = p.values_at(cols, rows)
    va = a.values_at(cols, rows)
    vb = b.values_at(cols, rows)
    in_r = (cols >= 100) & (cols < 300) & (rows >= 200) & (rows < 400)
    assert np.array_equal(got, np.where(in_r, vb, va))
    # spec roundtrip through the factory
    p2 = raster_from_spec(p.spec())
    assert np.array_equal(p2.values_at(cols, rows), got)


def test_diff_tilesets(ray_session, tmp_path):
    """diff_tilesets classifies added / removed / changed tile
    addresses against an exact per-address hash compare of the two
    rendered pyramids; identical tiles never appear."""
    from rastertiler_rs_ray.pipelines.merge import diff_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    old_dir = str(tmp_path / "old")
    new_dir = str(tmp_path / "new")
    render_pyramid(default_u8_raster(seed=42), old_dir, 2, 4, tilesize=64,
                   concurrency=2, resume=False)
    render_pyramid(default_u8_raster(seed=99), new_dir, 3, 5, tilesize=64,
                   concurrency=2, resume=False)

    got = {
        f"{r['zoom']}/{r['x']}/{r['y']}": r["change"]
        for r in diff_tilesets(old_dir, new_dir).take_all()
    }

    oh, nh = _tile_hashes(old_dir), _tile_hashes(new_dir)
    want = {}
    for k in set(oh) | set(nh):
        if k not in oh:
            want[k] = "added"
        elif k not in nh:
            want[k] = "removed"
        elif oh[k] != nh[k]:
            want[k] = "changed"
    assert got == want
    # the construction plants all three classes (zooms 2 vs 5 disjoint,
    # zooms 3-4 shared with different seeds)
    assert {"added", "removed", "changed"} <= set(want.values())


def test_diff_tilesets_identical_is_empty(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.merge import diff_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    render_pyramid(default_u8_raster(seed=7), a, 2, 3, tilesize=64,
                   concurrency=2, resume=False)
    render_pyramid(default_u8_raster(seed=7), b, 2, 3, tilesize=64,
                   concurrency=2, resume=False)
    assert diff_tilesets(a, b).count() == 0


def test_tileset_missing_tiles(ray_session, tmp_path):
    from rastertiler_rs_ray.geo.tileid import tile_range
    from rastertiler_rs_ray.pipelines.render import (
        render_pyramid,
        tileset_missing_tiles,
    )
    from rastertiler_rs_ray.raster import default_u8_raster

    r = default_u8_raster(seed=42)
    out = str(tmp_path / "ts")
    render_pyramid(r, out, 3, 5, tilesize=64, concurrency=2, resume=False)

    got = {
        (row["zoom"], row["x"], row["y"]): row["status"]
        for row in tileset_missing_tiles(out, [4, 5, 6], r.bounds()).take_all()
    }

    def cover(z):
        tr = tile_range(z, r.bounds())
        return {
            (z, x, y)
            for x in range(tr.xmin, tr.xmax + 1)
            for y in range(tr.ymin, tr.ymax + 1)
        }

    want = {k: "missing" for k in cover(6)}        # never rendered
    want.update({k: "orphan" for k in cover(3)})   # outside audit zooms
    assert got == want
    # clean zooms (4, 5) report nothing
    assert not any(k[0] in (4, 5) for k in got)


def test_tileset_missing_tiles_complete_is_empty(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.render import (
        render_pyramid,
        tileset_missing_tiles,
    )
    from rastertiler_rs_ray.raster import default_u8_raster

    r = default_u8_raster(seed=7)
    out = str(tmp_path / "ts")
    render_pyramid(r, out, 3, 4, tilesize=64, concurrency=2, resume=False)
    assert tileset_missing_tiles(out, [3, 4], r.bounds()).count() == 0


def test_merge_many_priority_wins(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.merge import merge_many_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster
    from rastertiler_rs_ray.state.manifest import Manifest

    dirs = []
    for i, (seed, z0, z1) in enumerate([(42, 3, 4), (99, 3, 5), (7, 4, 6)]):
        d = str(tmp_path / f"in{i}")
        render_pyramid(default_u8_raster(seed=seed), d, z0, z1, tilesize=64,
                       concurrency=2, resume=False)
        dirs.append(d)
    out = str(tmp_path / "merged")
    merge_many_tilesets(dirs, out)

    hashes = [_tile_hashes(d) for d in dirs]
    mh = _tile_hashes(out)
    assert set(mh) == set().union(*[set(h) for h in hashes])
    for k, v in mh.items():
        want = next(h[k] for h in hashes if k in h)  # lowest index wins
        assert v == want
    md = Manifest(os.path.join(out, "manifest.json")).get_meta("metadata")
    assert md["minzoom"] == "3" and md["maxzoom"] == "6"


def test_merge_many_single_input_is_copy(ray_session, tmp_path):
    from rastertiler_rs_ray.pipelines.merge import merge_many_tilesets
    from rastertiler_rs_ray.pipelines.render import render_pyramid
    from rastertiler_rs_ray.raster import default_u8_raster

    d = str(tmp_path / "only")
    render_pyramid(default_u8_raster(seed=5), d, 3, 4, tilesize=64,
                   concurrency=2, resume=False)
    out = str(tmp_path / "m")
    merge_many_tilesets([d], out)
    assert _tile_hashes(out) == _tile_hashes(d)
