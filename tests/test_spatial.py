"""Interleaved doc table + cell encoding + spatial join tests.

Join results are checked against brute-force numpy oracles computed
from the same deterministic position function (FIXTURES.md §B12), and
the span-sequence invariant is asserted across the pipelines.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

N_DOCS = 2000
LEVEL = 10


@pytest.fixture(scope="module")
def docs(ray_session):
    from rastertiler_rs_ray.sources.docs import generate_documents

    return generate_documents(N_DOCS, seed=42).materialize()


@pytest.fixture(scope="module")
def encoded(docs):
    from rastertiler_rs_ray.pipelines.spatial import encode_cells

    return encode_cells(docs, level=LEVEL, concurrency=2).materialize()


@pytest.fixture(scope="module")
def oracle_positions():
    from rastertiler_rs_ray.sources.docs import doc_positions

    idx = np.arange(N_DOCS)
    lon, lat, has_geo = doc_positions(idx, seed=42)
    return pd.DataFrame(
        {
            "doc_id": [f"doc-{i:012d}" for i in idx],
            "lon": lon,
            "lat": lat,
            "has_geo": has_geo,
        }
    )


def test_generation_deterministic_across_partitioning(ray_session):
    from rastertiler_rs_ray.sources.docs import generate_documents, span_signatures

    a = generate_documents(300, seed=42, override_num_blocks=1).take_all()
    b = generate_documents(300, seed=42, override_num_blocks=7).take_all()
    ta = pa.Table.from_pylist(sorted(a, key=lambda r: r["doc_id"]))
    tb = pa.Table.from_pylist(sorted(b, key=lambda r: r["doc_id"]))
    assert span_signatures(ta) == span_signatures(tb)


def test_schema_and_offsets(docs):
    t = pa.Table.from_pylist(docs.take(50))
    assert t.column_names == ["doc_id", "spans"]
    for row in t.column("spans").to_pylist():
        assert len(row) >= 1
        offs = [s["offset"] for s in row]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in row:
            if s["kind"] == "text":
                assert s["media_ref"] == "" and s["text"] != ""
            else:
                assert s["kind"] == "media" and s["text"] == ""
                assert s["media_ref"].startswith("geo://")


def test_encode_positions_match_oracle(encoded, oracle_positions):
    df = encoded.to_pandas().sort_values("doc_id").reset_index(drop=True)
    o = oracle_positions.sort_values("doc_id").reset_index(drop=True)
    assert (df["has_geo"] == o["has_geo"]).all()
    geo = df["has_geo"]
    # media_ref carries 6 decimals → positions match to ~1e-6
    np.testing.assert_allclose(df.loc[geo, "lon"], o.loc[geo, "lon"], atol=1e-6)
    np.testing.assert_allclose(df.loc[geo, "lat"], o.loc[geo, "lat"], atol=1e-6)
    assert geo.sum() > 0.8 * N_DOCS  # ~9/10 docs have geo


def test_encode_preserves_span_invariant(docs, encoded):
    from rastertiler_rs_ray.sources.docs import span_signatures

    before = span_signatures(pa.Table.from_pylist(
        sorted(docs.take_all(), key=lambda r: r["doc_id"])))
    rows = sorted(encoded.select_columns(["doc_id", "spans"]).take_all(),
                  key=lambda r: r["doc_id"])
    after = span_signatures(pa.Table.from_pylist(rows))
    assert before == after


def test_cell_ids_match_direct(encoded):
    from rastertiler_rs_ray.geo.cell import cell_from_lonlat

    df = encoded.to_pandas()
    geo = df[df["has_geo"]]
    expected = cell_from_lonlat(LEVEL, geo["lon"].to_numpy(), geo["lat"].to_numpy())
    np.testing.assert_array_equal(geo["cell_id"].to_numpy().astype(np.uint64), expected)


def test_tile_assignment_counts(encoded):
    from rastertiler_rs_ray.geo.tileid import point_to_tile
    from rastertiler_rs_ray.pipelines.spatial import assign_tiles, tile_assignment_counts

    zooms = [3, 8]
    counts = tile_assignment_counts(assign_tiles(encoded, zooms)).to_pandas()
    # oracle
    df = encoded.to_pandas()
    geo = df[df["has_geo"]]
    for z in zooms:
        x, y = point_to_tile(z, geo["mx"].to_numpy(), geo["my"].to_numpy())
        o = pd.DataFrame({"x": x, "y": y}).value_counts().sort_index()
        got = (
            counts[counts["zoom"] == z]
            .set_index(["x", "y"])["n_docs"]
            .sort_index()
        )
        assert got.sum() == len(geo)
        assert len(got) == len(o)
        assert (got.to_numpy() == o.to_numpy()).all()


def test_raster_vector_join_matches_oracle(encoded, ray_session):
    from rastertiler_rs_ray.geo.tileid import point_to_tile, tile_mercator_bounds
    from rastertiler_rs_ray.pipelines.spatial import raster_vector_join
    from rastertiler_rs_ray.raster import default_u8_raster

    raster = default_u8_raster()
    zoom, ts = 7, 256
    out = raster_vector_join(encoded, raster, zoom, tilesize=ts).to_pandas()

    df = encoded.to_pandas()
    geo = df[df["has_geo"]].reset_index(drop=True)
    assert len(out) == len(geo)  # one row per geo doc

    # oracle: recompute sample per doc directly
    x, y = point_to_tile(zoom, geo["mx"].to_numpy(), geo["my"].to_numpy())
    merged = out.set_index("doc_id")
    oracle_vals = {}
    for (tx, ty), grp in geo.groupby([x, y]):
        buf = raster.read_tile(zoom, int(tx), int(ty), ts)
        xmin, ymin, xmax, ymax = (
            float(v[0]) for v in tile_mercator_bounds(
                np.array([zoom]), np.array([int(tx)]), np.array([int(ty)]))
        )
        res = (xmax - xmin) / ts
        for _, r in grp.iterrows():
            if buf is None:
                oracle_vals[r["doc_id"]] = None
                continue
            col = min(max(int(np.floor((r["mx"] - xmin) / res)), 0), ts - 1)
            row = min(max(int(np.floor((ymax - r["my"]) / res)), 0), ts - 1)
            v = int(buf[row, col])
            oracle_vals[r["doc_id"]] = None if v == raster.nodata else v
    for doc, expected in oracle_vals.items():
        got = merged.loc[doc, "raster_value"]
        if expected is None:
            assert pd.isna(got)
        else:
            assert got == expected


def test_raster_vector_join_salted_same_result(encoded, ray_session):
    from rastertiler_rs_ray.pipelines.spatial import raster_vector_join
    from rastertiler_rs_ray.raster import default_u8_raster

    raster = default_u8_raster()
    plain = (
        raster_vector_join(encoded, raster, 5, tilesize=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # force salting on every tile (S=8)
    keys = (
        (np.uint64(5) << np.uint64(58))
        | (plain["x"].astype(np.uint64).to_numpy() << np.uint64(29))
        | plain["y"].astype(np.uint64).to_numpy()
    )
    salt_map = {int(k): 8 for k in np.unique(keys)}
    salted = (
        raster_vector_join(encoded, raster, 5, tilesize=64, salt_map=salt_map)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_point_in_polygon_matches_oracle(encoded, ray_session):
    from rastertiler_rs_ray.pipelines.spatial import point_in_polygon
    from rastertiler_rs_ray.sources.polygons import generate_polygons

    polys = generate_polygons(12, seed=7)
    got = point_in_polygon(encoded, polys).to_pandas()
    got_pairs = set(zip(got["doc_id"], got["poly_id"]))

    # brute-force oracle (matplotlib-free ray casting, python loop)
    df = encoded.to_pandas()
    geo = df[df["has_geo"]]
    expected = set()
    for p in polys:
        lon = np.array(p["lon"]); lat = np.array(p["lat"])
        x2 = np.roll(lon, -1); y2 = np.roll(lat, -1)
        for _, r in geo.iterrows():
            inside = False
            for e in range(len(lon)):
                if (lat[e] > r["lat"]) != (y2[e] > r["lat"]):
                    xint = (x2[e] - lon[e]) * (r["lat"] - lat[e]) / (y2[e] - lat[e]) + lon[e]
                    if r["lon"] < xint:
                        inside = not inside
            if inside:
                expected.add((r["doc_id"], p["poly_id"]))
    assert got_pairs == expected
    assert len(expected) > 0  # fixture is non-trivial


def test_knn_matches_oracle(encoded, ray_session):
    from rastertiler_rs_ray.geo.mercator import geo_to_mercator
    from rastertiler_rs_ray.pipelines.spatial import knn_join

    qlon = np.array([-122.4, 2.3, 100.0])
    qlat = np.array([37.7, 48.8, 0.0])
    qx, qy = geo_to_mercator(qlon, qlat)
    queries = np.stack([qx, qy], axis=1)
    k = 7
    got = knn_join(encoded, queries, k=k)

    df = encoded.to_pandas()
    geo = df[df["has_geo"]]
    for qi in range(len(queries)):
        d2 = (geo["mx"].to_numpy() - qx[qi]) ** 2 + (geo["my"].to_numpy() - qy[qi]) ** 2
        order = np.argsort(d2, kind="stable")[:k]
        expected_docs = geo["doc_id"].to_numpy()[order]
        got_q = got[got["query_id"] == qi].sort_values("rank")
        np.testing.assert_allclose(
            got_q["dist"].to_numpy(), np.sqrt(d2[order]), rtol=1e-12
        )
        # doc sets must match (ties broken by doc_id in both)
        assert set(got_q["doc_id"]) == set(expected_docs)


def test_raster_vector_join_broadcast_equals_shuffle(ray_session):
    """The shuffle-free broadcast sampler must produce row-identical
    output to the groupby co-partition join."""
    import pandas as pd

    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import (
        raster_vector_join,
        raster_vector_join_broadcast,
    )
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    pos = synthetic_positions_dataset(5000, extent=(-59.9, 26.7, -48.8, 33.6))
    norm = lambda df: (
        df.assign(
            zoom=df["zoom"].astype("int64"),
            x=df["x"].astype("int64"),
            y=df["y"].astype("int64"),
            raster_value=df["raster_value"].astype("Int64"),
        )
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "zoom", "x", "y", "raster_value"]]
    )
    a = norm(raster_vector_join(pos, default_u8_raster(), zoom=10).to_pandas())
    b = norm(
        raster_vector_join_broadcast(
            pos, default_u8_raster(), zoom=10, concurrency=(1, 2)
        ).to_pandas()
    )
    assert a.equals(b)


def test_point_in_polygon_cells_equals_broadcast(ray_session):
    """The cell-co-partitioned PIP must emit exactly the broadcast
    plan's (doc_id, poly_id) pairs."""
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import point_in_polygon, point_in_polygon_cells
    from rastertiler_rs_ray.sources.polygons import generate_polygons
    import pyarrow.compute as pc
    import pyarrow as pa

    pos = synthetic_positions_dataset(4000)

    def stringify(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pc.cast(batch.column("doc_id"), pa.string()))

    enc = pos.map_batches(stringify, batch_format="pyarrow")
    polys = generate_polygons(20)
    a = {(r["doc_id"], r["poly_id"]) for r in point_in_polygon(enc, polys).take_all()}
    b = {(r["doc_id"], r["poly_id"]) for r in point_in_polygon_cells(enc, polys, level=7).take_all()}
    assert a == b
    assert len(a) > 0


def test_knn_cell_join_equals_exact(ray_session):
    """Ring-expansion kNN must return exactly the brute-force kNN sets
    (same docs per query; distance ties broken identically)."""
    import numpy as np

    from rastertiler_rs_ray.geo.mercator import geo_to_mercator
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import knn_cell_join, knn_join
    import pyarrow.compute as pc
    import pyarrow as pa

    pos = synthetic_positions_dataset(6000)

    def stringify(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pc.cast(batch.column("doc_id"), pa.string()))

    enc = pos.map_batches(stringify, batch_format="pyarrow").materialize()
    qlon = np.array([-122.4, 2.35, 139.7, 151.2, 0.0, -179.9])
    qlat = np.array([37.7, 48.85, 35.6, -33.8, 0.0, 80.0])
    qx, qy = geo_to_mercator(qlon, qlat)
    qpts = np.stack([qx, qy], axis=1)
    exact = knn_join(enc, qpts, k=5)
    stats = {}
    ring = knn_cell_join(enc, qpts, k=5, level=6, stats=stats)
    for qid in range(len(qpts)):
        e = set(exact[exact.query_id == qid]["doc_id"])
        r = set(ring[ring.query_id == qid]["doc_id"])
        assert e == r, (qid, e ^ r)
    # scale contract: every round reads a pruned partition subset, never
    # the full bucketed corpus (the old design rescanned all docs/round)
    n_docs = enc.count()
    assert stats["rounds"], "no round telemetry recorded"
    for rnd in stats["rounds"]:
        assert rnd["partitions_read"] < rnd["partitions_total"], rnd
        assert rnd["rows_read"] < n_docs, rnd


def test_knn_cell_join_finalizes_at_max_rounds(ray_session):
    """A query still live when max_rounds runs out returns its
    best-so-far candidates instead of silently vanishing."""
    import numpy as np

    from rastertiler_rs_ray.geo.mercator import geo_to_mercator
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import knn_cell_join
    import pyarrow.compute as pc
    import pyarrow as pa

    pos = synthetic_positions_dataset(3000)

    def stringify(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pc.cast(batch.column("doc_id"), pa.string()))

    enc = pos.map_batches(stringify, batch_format="pyarrow").materialize()
    qx, qy = geo_to_mercator(np.array([-122.4, 139.7]), np.array([37.7, 35.6]))
    qpts = np.stack([qx, qy], axis=1)
    # max_rounds=1 at a coarse level: radius-1 cannot certify the margin
    # for most queries, so they exhaust rounds and must still report
    out = knn_cell_join(enc, qpts, k=5, level=6, max_rounds=1)
    for qid in range(len(qpts)):
        got = out[out.query_id == qid]
        assert len(got) > 0, f"query {qid} returned no rows after max_rounds"


def test_knn_cell_join_scratch_dir_validation(ray_session, tmp_path):
    """A reused scratch_dir bucketed at a different (level, parent_level)
    must raise instead of silently matching zero partitions; the same
    parameters reuse the bucketed layout without re-bucketing."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest as _pytest

    from rastertiler_rs_ray.geo.mercator import geo_to_mercator
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import knn_cell_join

    pos = synthetic_positions_dataset(2000)

    def stringify(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("doc_id")
        return batch.set_column(i, "doc_id", pc.cast(batch.column("doc_id"), pa.string()))

    enc = pos.map_batches(stringify, batch_format="pyarrow").materialize()
    qx, qy = geo_to_mercator(np.array([-122.4]), np.array([37.7]))
    qpts = np.stack([qx, qy], axis=1)
    scratch = str(tmp_path / "knn_cells")

    first = knn_cell_join(enc, qpts, k=3, level=6, scratch_dir=scratch)
    assert len(first) == 3
    meta = os.path.join(scratch, "_knn_bucket_meta.json")
    assert os.path.isfile(meta)

    # reuse with the same parameters: no re-bucketing, same answer
    mtime = os.path.getmtime(meta)
    again = knn_cell_join(enc, qpts, k=3, level=6, scratch_dir=scratch)
    assert os.path.getmtime(meta) == mtime
    assert set(again["doc_id"]) == set(first["doc_id"])

    with _pytest.raises(ValueError, match="bucketed with"):
        knn_cell_join(enc, qpts, k=3, level=7, scratch_dir=scratch)

    os.remove(meta)
    with _pytest.raises(ValueError, match="_knn_bucket_meta"):
        knn_cell_join(enc, qpts, k=3, level=6, scratch_dir=scratch)


def test_synthetic_positions_slim_parity(ray_session):
    """slim=True prunes fixture columns at the source; the broadcast
    join result must be identical modulo the doc_id dtype (int64 vs
    string)."""
    from rastertiler_rs_ray.pipelines.driver_queries import synthetic_positions_dataset
    from rastertiler_rs_ray.pipelines.spatial import raster_vector_join_broadcast
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    ext = (-59.9, 26.7, -48.8, 33.6)
    full = raster_vector_join_broadcast(
        synthetic_positions_dataset(3000, extent=ext), default_u8_raster(), zoom=9
    ).to_pandas()
    slim = raster_vector_join_broadcast(
        synthetic_positions_dataset(3000, extent=ext, slim=True),
        default_u8_raster(),
        zoom=9,
    ).to_pandas()
    assert list(slim.columns) == list(full.columns)
    full["doc_id"] = full["doc_id"].astype("int64")
    a = full.sort_values("doc_id").reset_index(drop=True)
    b = slim.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_zorder_sort_global_order_and_locality(ray_session):
    """The Morton sort's global ordering contract (invisible to the
    driver's sorted-hash compare): iterating the sorted dataset's
    batches in order yields a globally non-decreasing zkey, and the
    curve actually buys locality — mean |tile-space jump| between
    consecutive rows beats the unsorted layout by a wide margin."""
    import numpy as np
    import ray.data

    from rastertiler_rs_ray.pipelines.spatial import zorder_sort

    rng = np.random.default_rng(42)
    n = 5000
    ext = 6378137.0 * np.pi * 0.8
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "mx": pa.array(rng.uniform(-ext, ext, n), pa.float64()),
                "my": pa.array(rng.uniform(-ext, ext, n), pa.float64()),
            }
        )
    ).repartition(8)
    out = zorder_sort(ds, zoom=10)
    keys = []
    xs = []
    ys = []
    for b in out.iter_batches(batch_format="pandas", batch_size=512):
        keys.append(b["zkey"].to_numpy())
        xs.append(b["mx"].to_numpy())
        ys.append(b["my"].to_numpy())
    keys = np.concatenate(keys)
    assert len(keys) == n
    assert (np.diff(keys) >= 0).all(), "global Z-order violated across blocks"
    # locality: consecutive-row euclidean jumps, sorted vs original
    def mean_jump(mx, my):
        return float(np.hypot(np.diff(mx), np.diff(my)).mean())

    sorted_jump = mean_jump(np.concatenate(xs), np.concatenate(ys))
    rnd_jump = mean_jump(
        *(c.to_numpy() for c in (ds.to_pandas()["mx"], ds.to_pandas()["my"]))
    )
    assert sorted_jump < rnd_jump / 4


# ---------------------------------------------------------- zonal_stats


def test_zonal_stats_matches_direct_evaluation(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import zonal_stats
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    r = default_u8_raster()
    rng = np.random.default_rng(3)
    zones = []
    for zid in range(8):
        c0 = int(rng.integers(0, r.width - 200))
        r0 = int(rng.integers(0, r.height - 200))
        zones.append((zid, c0, r0, c0 + int(rng.integers(1, 200)),
                      r0 + int(rng.integers(1, 200))))
    # zone 8: clamps (negative origin, overshoot past the raster edge)
    zones.append((8, -50, -50, 100, 100))
    t = pa.table({
        "zone_id": pa.array([z[0] for z in zones], pa.int64()),
        "col0": pa.array([z[1] for z in zones], pa.int64()),
        "row0": pa.array([z[2] for z in zones], pa.int64()),
        "col1": pa.array([z[3] for z in zones], pa.int64()),
        "row1": pa.array([z[4] for z in zones], pa.int64()),
    })
    got = (
        zonal_stats(ray.data.from_arrow(t).repartition(3), r.spec(), chunk=64)
        .to_pandas()
        .set_index("zone_id")
        .sort_index()
    )
    for zid, c0, r0, c1, r1 in zones:
        c0, r0 = max(c0, 0), max(r0, 0)
        c1, r1 = min(c1, r.width), min(r1, r.height)
        v = r.values_at(
            np.arange(c0, c1)[None, :], np.arange(r0, r1)[:, None]
        ).astype(np.int64)
        vv = v[v != r.nodata]
        if len(vv) == 0:
            assert zid not in got.index
            continue
        row = got.loc[zid]
        assert row["n"] == len(vv)
        assert row["sum_val"] == vv.sum()
        assert row["min_val"] == vv.min() and row["max_val"] == vv.max()
        assert row["mean_e4"] == int(np.floor(vv.sum() / len(vv) * 1e4 + 0.5))


def test_zonal_stats_chunk_invariance(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import zonal_stats
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    r = default_u8_raster()
    t = pa.table({
        "zone_id": pa.array([0], pa.int64()),
        "col0": pa.array([100], pa.int64()),
        "row0": pa.array([450], pa.int64()),
        "col1": pa.array([700], pa.int64()),  # spans several 512-blocks
        "row1": pa.array([1100], pa.int64()),
    })
    outs = [
        zonal_stats(ray.data.from_arrow(t), r.spec(), chunk=ch)
        .to_pandas().iloc[0].to_dict()
        for ch in (64, 512, 4096)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_zonal_stats_polygon_matches_direct_mask(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import (
        _even_odd_mask,
        zonal_stats_polygon,
    )
    from rastertiler_rs_ray.raster.synthetic import default_u8_raster

    r = default_u8_raster()
    rng = np.random.default_rng(9)
    polys = []
    for zid in range(6):
        cx = rng.uniform(200, r.width - 200)
        cy = rng.uniform(200, r.height - 200)
        nv = int(rng.integers(3, 7))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(20, 150, nv)
        polys.append((zid, cx + rad * np.cos(ang), cy + rad * np.sin(ang)))
    t = pa.table({
        "zone_id": pa.array([p[0] for p in polys], pa.int64()),
        "xs": pa.array([list(p[1]) for p in polys], pa.list_(pa.float64())),
        "ys": pa.array([list(p[2]) for p in polys], pa.list_(pa.float64())),
    })
    got = (
        zonal_stats_polygon(ray.data.from_arrow(t).repartition(2), r.spec(), chunk=64)
        .to_pandas()
        .set_index("zone_id")
        .sort_index()
    )
    for zid, xs, ys in polys:
        c0, c1 = int(np.floor(xs.min())), int(np.ceil(xs.max()))
        r0, r1 = int(np.floor(ys.min())), int(np.ceil(ys.max()))
        cols = np.arange(c0, c1, dtype=np.int64)[None, :]
        rws = np.arange(r0, r1, dtype=np.int64)[:, None]
        h, w = r1 - r0, c1 - c0
        m = _even_odd_mask(
            np.broadcast_to(cols + 0.5, (h, w)),
            np.broadcast_to(rws + 0.5, (h, w)), xs, ys,
        )
        v = r.values_at(cols, rws).astype(np.int64)
        vv = v[m & (v != r.nodata)]
        if len(vv) == 0:
            assert zid not in got.index
            continue
        row = got.loc[zid]
        assert row["n"] == len(vv) and row["sum_val"] == vv.sum()
        assert row["min_val"] == vv.min() and row["max_val"] == vv.max()


def test_even_odd_mask_square_and_boundary(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import _even_odd_mask

    # unit square [1,3]x[1,3]: center (2.5,2.5) of pixel (2,2) inside,
    # pixel (3,3) center (3.5,3.5) outside
    xs = np.array([1.0, 3.0, 3.0, 1.0])
    ys = np.array([1.0, 1.0, 3.0, 3.0])
    px = np.array([2.5, 3.5, 1.5, 0.5])
    py = np.array([2.5, 3.5, 1.5, 2.0])
    assert _even_odd_mask(px, py, xs, ys).tolist() == [True, False, True, False]


# ------------------------------------------------- box_intersect_join


def test_box_intersect_join_exactly_once_vs_brute(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import box_intersect_join

    rng = np.random.default_rng(2)

    def boxes(n, key):
        x0 = rng.uniform(-500, 500, n)
        y0 = rng.uniform(-500, 500, n)
        return pa.table({
            key: pa.array(np.arange(n, dtype=np.int64)),
            "xmin": pa.array(x0), "ymin": pa.array(y0),
            "xmax": pa.array(x0 + rng.uniform(1, 120, n)),
            "ymax": pa.array(y0 + rng.uniform(1, 120, n)),
        })

    L, R = boxes(200, "lid"), boxes(150, "rid")
    got = box_intersect_join(
        ray.data.from_arrow(L).repartition(4),
        ray.data.from_arrow(R).repartition(3),
        cell=64.0, left_cols=["lid"], right_cols=["rid"],
        num_partitions=8,
    ).to_pandas()
    pairs = list(zip(got["l_lid"], got["r_rid"]))
    assert len(pairs) == len(set(pairs))  # canonical-cell dedup held
    ld, rd = L.to_pandas(), R.to_pandas()
    want = {
        (i, j)
        for i in range(len(ld))
        for j in range(len(rd))
        if ld.xmin[i] <= rd.xmax[j] and rd.xmin[j] <= ld.xmax[i]
        and ld.ymin[i] <= rd.ymax[j] and rd.ymin[j] <= ld.ymax[i]
    }
    assert set(pairs) == want and len(want) > 100


def test_box_intersect_join_touching_edges_and_spanning_box(ray_session):
    from rastertiler_rs_ray.pipelines.spatial import box_intersect_join

    # closed-interval touch counts as a hit; one box spans many cells
    L = pa.table({
        "lid": pa.array([0, 1], pa.int64()),
        "xmin": pa.array([0.0, 500.0]), "ymin": pa.array([0.0, 500.0]),
        "xmax": pa.array([400.0, 510.0]), "ymax": pa.array([400.0, 510.0]),
    })
    R = pa.table({
        "rid": pa.array([0, 1], pa.int64()),
        "xmin": pa.array([400.0, 0.0]), "ymin": pa.array([400.0, 0.0]),
        "xmax": pa.array([450.0, 1000.0]), "ymax": pa.array([450.0, 1000.0]),
    })
    got = box_intersect_join(
        ray.data.from_arrow(L), ray.data.from_arrow(R),
        cell=64.0, left_cols=["lid"], right_cols=["rid"], num_partitions=4,
    ).to_pandas()
    assert sorted(zip(got["l_lid"], got["r_rid"])) == [(0, 0), (0, 1), (1, 1)]


class TestRadiusSelfJoin:
    ZOOM = 5
    RADIUS = 1_000_000.0

    def _brute(self, ids, mx, my):
        import itertools

        out = set()
        r2 = self.RADIUS * self.RADIUS
        for i, j in itertools.combinations(range(len(ids)), 2):
            a, b = (i, j) if ids[i] < ids[j] else (j, i)
            dx = mx[a] - mx[b]
            dy = my[a] - my[b]
            if dx * dx + dy * dy <= r2:
                out.add((ids[a], ids[b]))
        return out

    def _run(self, ids, mx, my):
        from rastertiler_rs_ray.pipelines.spatial import radius_self_join

        pos = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "mx": pa.array(mx, pa.float64()),
                    "my": pa.array(my, pa.float64()),
                }
            )
        )
        df = radius_self_join(
            pos, radius_m=self.RADIUS, zoom=self.ZOOM
        ).to_pandas()
        return df

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(11)
        n = 400
        ids = np.arange(n, dtype=np.int64)
        mx = rng.uniform(-2.0e7, 2.0e7, n)
        my = rng.uniform(-1.9e7, 1.9e7, n)
        df = self._run(ids, mx, my)
        got = set(zip(df.a_doc_id, df.b_doc_id))
        assert got == self._brute(ids, mx, my)
        # exactly-once: no duplicate pairs
        assert len(df) == len(got)
        assert (df.a_doc_id < df.b_doc_id).all()

    def test_boundary_straddling_pair(self, ray_session):
        # two points 1 km apart across a zoom-5 tile boundary
        from rastertiler_rs_ray.geo import CE, ORIGIN

        side = CE / 32.0
        bx = -ORIGIN + 7 * side  # tile edge
        ids = np.array([10, 3], dtype=np.int64)
        mx = np.array([bx - 500.0, bx + 500.0])
        my = np.array([1234.5, 1800.0])
        df = self._run(ids, mx, my)
        assert len(df) == 1
        assert (df.a_doc_id.iloc[0], df.b_doc_id.iloc[0]) == (3, 10)

    def test_zoom_too_deep_rejected(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import radius_self_join

        pos = ray.data.from_arrow(
            pa.table({"doc_id": [1], "mx": [0.0], "my": [0.0]})
        )
        with pytest.raises(ValueError, match="cell side"):
            radius_self_join(pos, radius_m=self.RADIUS, zoom=8)


class TestIdwInterpolate:
    def test_matches_brute_force(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import idw_interpolate

        rng = np.random.default_rng(3)
        ns, nq = 300, 40
        smx = rng.uniform(-1.9e7, 1.9e7, ns)
        smy = rng.uniform(-1.8e7, 1.8e7, ns)
        val = rng.uniform(1.0, 100.0, ns)
        qmx = rng.uniform(-1.9e7, 1.9e7, nq)
        qmy = rng.uniform(-1.8e7, 1.8e7, nq)
        radius, zoom = 2_000_000.0, 4
        samples = ray.data.from_arrow(
            pa.table({"mx": smx, "my": smy, "val": val})
        )
        queries = ray.data.from_arrow(
            pa.table(
                {"qid": pa.array(np.arange(nq), pa.int64()), "mx": qmx, "my": qmy}
            )
        )
        got = (
            idw_interpolate(queries, samples, radius_m=radius, zoom=zoom)
            .to_pandas()
            .sort_values("qid")
            .reset_index(drop=True)
        )
        # brute force
        dx = qmx[:, None] - smx[None, :]
        dy = qmy[:, None] - smy[None, :]
        d2 = dx * dx + dy * dy
        ok = (d2 > 0) & (d2 <= radius * radius)
        n = ok.sum(1)
        num = np.where(ok, val[None, :] / d2, 0).sum(1)
        den = np.where(ok, 1.0 / d2, 0).sum(1)
        keep = n > 0
        want = pd.DataFrame(
            {
                "qid": np.arange(nq)[keep],
                "n": n[keep],
                "idw_e4": np.floor(num[keep] / den[keep] * 1e4 + 0.5).astype(
                    np.int64
                ),
            }
        ).reset_index(drop=True)
        assert got.qid.tolist() == want.qid.tolist()
        assert got.n.tolist() == want.n.tolist()
        # summation order may differ by one ulp across plans
        assert (np.abs(got.idw_e4 - want.idw_e4) <= 1).all()

    def test_no_samples_in_range(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import idw_interpolate

        samples = ray.data.from_arrow(
            pa.table({"mx": [1.0e7], "my": [1.0e7], "val": [5.0]})
        )
        queries = ray.data.from_arrow(
            pa.table(
                {
                    "qid": pa.array([0], pa.int64()),
                    "mx": [-1.0e7],
                    "my": [-1.0e7],
                }
            )
        )
        out = idw_interpolate(
            queries, samples, radius_m=2_000_000.0, zoom=4
        ).to_pandas()
        assert len(out) == 0


def test_trajectory_session_paths(ray_session):
    """Hand-computed sessions and path lengths for one user."""
    from rastertiler_rs_ray.pipelines.spatial import trajectory_session_paths

    ts = pd.to_datetime(
        [
            "2026-01-01 10:00",
            "2026-01-01 10:10",
            "2026-01-01 10:20",
            "2026-01-01 12:00",  # > 30 min gap -> new session
            "2026-01-01 12:05",
        ]
    )
    mx = np.array([0.0, 3.0, 3.0, 100.0, 103.0])
    my = np.array([0.0, 4.0, 8.0, 0.0, 4.0])
    t = pa.table(
        {
            "user_id": pa.array([7] * 5, pa.int64()),
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(ts),
            "mx": mx,
            "my": my,
        }
    )
    out = (
        trajectory_session_paths(
            ray.data.from_arrow(t),
            ["user_id"],
            ["ts", "event_id"],
            "ts",
            gap_seconds=1800,
        )
        .to_pandas()
        .sort_values("session_id")
        .reset_index(drop=True)
    )
    assert out.session_id.tolist() == [1, 2]
    assert out.n_hops.tolist() == [2, 1]
    assert out.path_m_e2.tolist() == [900, 500]  # (5+4)*100, 5*100
    assert (out.user_id == 7).all()


def test_dbscan_grid_roles(ray_session):
    """Hand-built scene: a dense 4-point core cluster with one border
    point hanging off it, and an isolated noise point."""
    from rastertiler_rs_ray.pipelines.spatial import dbscan_grid

    eps = 100_000.0
    # points 0-3: pairwise within eps (all core at min_pts=3)
    # point 4: within eps of only point 3 (border)
    # point 5: far away (noise)
    mx = np.array([0.0, 30e3, 0.0, 30e3, 128e3, 5e6])
    my = np.array([0.0, 0.0, 30e3, 30e3, 30e3, 5e6])
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(6), pa.int64()),
            "mx": mx,
            "my": my,
        }
    )
    out = (
        dbscan_grid(
            ray.data.from_arrow(t), eps_m=eps, zoom=8, min_pts=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.role.tolist() == ["core"] * 4 + ["border", "noise"]
    assert out.cluster.tolist() == [0, 0, 0, 0, 0, -1]


def test_dbscan_grid_isolated_core(ray_session):
    """A core point whose neighbors are all non-core self-labels its
    cluster; the neighbors become border points with that label."""
    from rastertiler_rs_ray.pipelines.spatial import dbscan_grid

    eps = 100_000.0
    # star: center 7 within eps of tips 8,9; tips not within eps of
    # each other and not core (1 neighbor each)
    mx = np.array([0.0, 60e3, -60e3])
    my = np.array([0.0, 0.0, 0.0])
    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "mx": mx,
            "my": my,
        }
    )
    out = (
        dbscan_grid(
            ray.data.from_arrow(t), eps_m=eps, zoom=8, min_pts=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.role.tolist() == ["core", "border", "border"]
    assert out.cluster.tolist() == [7, 7, 7]


def test_rasterize_polygons_matches_dense(ray_session):
    """Distributed burn == dense evaluation over every tile at z3."""
    from rastertiler_rs_ray.geo.tileid import tile_mercator_bounds
    from rastertiler_rs_ray.pipelines.spatial import (
        _even_odd_mask,
        rasterize_polygons,
    )

    rng = np.random.default_rng(4)
    ts, zoom = 16, 3
    polys = []
    for pid in range(12):
        cx = rng.uniform(-1.5e7, 1.5e7)
        cy = rng.uniform(-1.4e7, 1.4e7)
        r = rng.uniform(5e5, 6e6)
        ang = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(3, 7)))
        polys.append(
            {
                "poly_id": pid,
                "xs": (cx + r * np.cos(ang)).tolist(),
                "ys": (cy + r * np.sin(ang)).tolist(),
            }
        )
    ds = ray.data.from_items(polys)
    got = (
        rasterize_polygons(ds, zoom=zoom, tilesize=ts)
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    # dense: every tile x every polygon
    rows = []
    for tx in range(8):
        for ty in range(8):
            bxmin, bymin, bxmax, bymax = (
                float(v[0])
                for v in tile_mercator_bounds(
                    np.array([zoom]), np.array([tx]), np.array([ty])
                )
            )
            span = bxmax - bxmin
            px = bxmin + (np.arange(ts) + 0.5) * (span / ts)
            py = bymax - (np.arange(ts) + 0.5) * (span / ts)
            pxg = np.broadcast_to(px[None, :], (ts, ts))
            pyg = np.broadcast_to(py[:, None], (ts, ts))
            mask = np.zeros((ts, ts), bool)
            for p in polys:
                mask |= _even_odd_mask(
                    pxg, pyg, np.asarray(p["xs"]), np.asarray(p["ys"])
                )
            if mask.sum():
                rows.append(
                    {"zoom": zoom, "x": tx, "y": ty, "n_covered": int(mask.sum())}
                )
    want = pd.DataFrame(rows).sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


class TestSimplifyPolylines:
    def _ref(self, xs, ys, tol):
        """Plain recursive Douglas-Peucker reference."""

        def d(p, a, b):
            ax, ay = a
            bx, by = b
            px, py = p
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            if L2 == 0:
                return ((px - ax) ** 2 + (py - ay) ** 2) ** 0.5
            t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / L2))
            return (
                (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2
            ) ** 0.5

        def rec(pts):
            if len(pts) < 3:
                return pts
            dists = [d(p, pts[0], pts[-1]) for p in pts[1:-1]]
            i = int(np.argmax(dists))
            if dists[i] > tol:
                left = rec(pts[: i + 2])
                right = rec(pts[i + 1 :])
                return left[:-1] + right
            return [pts[0], pts[-1]]

        return rec(list(zip(xs, ys)))

    def test_matches_recursive_reference(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import simplify_polylines

        rng = np.random.default_rng(8)
        rows = []
        for lid in range(20):
            n = rng.integers(3, 60)
            xs = np.cumsum(rng.normal(0, 10, n))
            ys = np.cumsum(rng.normal(0, 10, n))
            rows.append({"line_id": lid, "xs": xs.tolist(), "ys": ys.tolist()})
        tol = 8.0
        out = (
            simplify_polylines(ray.data.from_items(rows), tolerance=tol)
            .to_pandas()
            .sort_values("line_id")
            .reset_index(drop=True)
        )
        for r in rows:
            got = out[out.line_id == r["line_id"]].iloc[0]
            want = self._ref(r["xs"], r["ys"], tol)
            assert list(zip(got["xs"], got["ys"])) == want
            assert got["n_in"] == len(r["xs"]) and got["n_out"] == len(want)

    def test_straight_line_collapses(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import simplify_polylines

        xs = np.linspace(0, 100, 50)
        ys = xs * 2.0
        out = simplify_polylines(
            ray.data.from_items([{"line_id": 1, "xs": xs.tolist(), "ys": ys.tolist()}]),
            tolerance=0.01,
        ).to_pandas()
        assert out["n_out"].iloc[0] == 2  # endpoints only
        assert out["xs"].iloc[0][0] == 0.0 and out["xs"].iloc[0][-1] == 100.0


class TestPolygonBoxClip:
    def _frac_clip_area(self, pts, x0, y0, x1, y1):
        """Exact-Fraction Sutherland-Hodgman + shoelace reference."""
        from fractions import Fraction as F

        pts = [(F(a), F(b)) for a, b in pts]

        def clip(poly, axis, bound, keep_le):
            out = []
            n = len(poly)
            for i in range(n):
                cur, prv = poly[i], poly[i - 1]
                cin = cur[axis] <= bound if keep_le else cur[axis] >= bound
                pin = prv[axis] <= bound if keep_le else prv[axis] >= bound
                if cin != pin:
                    t = (bound - prv[axis]) / (cur[axis] - prv[axis])
                    out.append(
                        (
                            prv[0] + t * (cur[0] - prv[0]),
                            prv[1] + t * (cur[1] - prv[1]),
                        )
                    )
                if cin:
                    out.append(cur)
            return out

        for axis, bound, keep in ((0, F(x1), True), (0, F(x0), False),
                                  (1, F(y1), True), (1, F(y0), False)):
            pts = clip(pts, axis, bound, keep)
            if not pts:
                return 0.0
        if len(pts) < 3:
            return 0.0
        s = sum(
            pts[i][0] * pts[(i + 1) % len(pts)][1]
            - pts[(i + 1) % len(pts)][0] * pts[i][1]
            for i in range(len(pts))
        )
        return float(abs(s) / 2)

    def test_kernel_matches_exact_fractions(self):
        from rastertiler_rs_ray.pipelines.spatial import clip_area_with_box

        rng = np.random.default_rng(13)
        for _ in range(60):
            # random triangle + random box on a small integer grid so
            # Fractions stay exact and floats are exact too
            tri = rng.integers(-20, 20, (3, 2)).astype(float)
            bx = np.sort(rng.integers(-15, 15, 2).astype(float))
            by = np.sort(rng.integers(-15, 15, 2).astype(float))
            got = clip_area_with_box(
                tri[:, 0], tri[:, 1], bx[0], by[0], bx[1] + 1, by[1] + 1
            )
            want = self._frac_clip_area(
                [tuple(p) for p in tri], bx[0], by[0], bx[1] + 1, by[1] + 1
            )
            assert abs(got - want) < 1e-9

    def test_pipeline_cases(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import polygon_box_clip_areas

        polys = ray.data.from_items(
            [
                # unit right triangle area 50 fully inside box 1
                {"poly_id": 1, "xs": [0.0, 10.0, 0.0], "ys": [0.0, 0.0, 10.0]},
                # triangle fully outside every box
                {"poly_id": 2, "xs": [900.0, 910.0, 900.0], "ys": [900.0, 900.0, 910.0]},
            ]
        )
        boxes = ray.data.from_items(
            [
                {"box_id": 7, "xmin": -5.0, "ymin": -5.0, "xmax": 50.0, "ymax": 50.0},
                # half-covering box: clips the triangle at x = 5
                {"box_id": 8, "xmin": 5.0, "ymin": -5.0, "xmax": 50.0, "ymax": 50.0},
            ]
        )
        out = (
            polygon_box_clip_areas(polys, boxes, cell=64.0)
            .to_pandas()
            .sort_values(["poly_id", "box_id"])
            .reset_index(drop=True)
        )
        assert out.poly_id.tolist() == [1, 1]
        assert out.box_id.tolist() == [7, 8]
        assert out.clip_area_e2.tolist() == [5000, 1250]  # 50.0, 12.5


class TestHaversineSelfJoin:
    RADIUS = 1_000_000.0
    LAT_MAX = 60.0

    def _brute(self, ids, lon, lat):
        import itertools
        import math

        R = 6371000.0
        keep = [i for i in range(len(ids)) if abs(lat[i]) <= self.LAT_MAX]
        out = {}
        for i, j in itertools.combinations(keep, 2):
            a, b = (i, j) if ids[i] < ids[j] else (j, i)
            rlat1, rlat2 = math.radians(lat[a]), math.radians(lat[b])
            rlon1, rlon2 = math.radians(lon[a]), math.radians(lon[b])
            s1 = math.sin((rlat2 - rlat1) / 2.0)
            s2 = math.sin((rlon2 - rlon1) / 2.0)
            h = s1 * s1 + math.cos(rlat1) * math.cos(rlat2) * s2 * s2
            d = 2.0 * R * math.asin(math.sqrt(h))
            if d <= self.RADIUS:
                out[(ids[a], ids[b])] = math.floor(d)
        return out

    def _run(self, ids, lon, lat):
        from rastertiler_rs_ray.pipelines.spatial import haversine_self_join

        pos = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lon": pa.array(lon, pa.float64()),
                    "lat": pa.array(lat, pa.float64()),
                }
            )
        )
        return haversine_self_join(
            pos, radius_m=self.RADIUS, lat_max=self.LAT_MAX
        ).to_pandas()

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(17)
        n = 400
        ids = np.arange(n, dtype=np.int64)
        lon = rng.uniform(-180.0, 180.0, n)
        lat = rng.uniform(-80.0, 80.0, n)  # some outside the band
        df = self._run(ids, lon, lat)
        want = self._brute(ids, lon, lat)
        got = {
            (a, b): d
            for a, b, d in zip(df.a_doc_id, df.b_doc_id, df.dist_m)
        }
        assert got == want
        assert len(df) == len(got)  # exactly-once
        assert (df.a_doc_id < df.b_doc_id).all()

    def test_antimeridian_pair(self, ray_session):
        # 179.9°E and 179.9°W at the equator: Δλ = 0.2° ≈ 22 km — must
        # pair even though the raw lon difference is 359.8°
        ids = np.array([5, 2], dtype=np.int64)
        lon = np.array([179.9, -179.9])
        lat = np.array([0.0, 0.0])
        df = self._run(ids, lon, lat)
        assert len(df) == 1
        assert (df.a_doc_id.iloc[0], df.b_doc_id.iloc[0]) == (2, 5)
        assert 22000 < df.dist_m.iloc[0] < 23000

    def test_band_filter(self, ray_session):
        # both points above lat_max: dropped, no pairs
        ids = np.array([1, 2], dtype=np.int64)
        df = self._run(ids, np.array([0.0, 0.1]), np.array([70.0, 70.1]))
        assert len(df) == 0


class TestSegmentIntersectionJoin:
    def _run(self, segs_a, segs_b, cell=64.0):
        from rastertiler_rs_ray.pipelines.spatial import segment_intersection_join

        def tbl(segs):
            ids, x1, y1, x2, y2 = zip(*segs)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "seg_id": pa.array(ids, pa.int64()),
                        "x1": pa.array(x1, pa.int64()),
                        "y1": pa.array(y1, pa.int64()),
                        "x2": pa.array(x2, pa.int64()),
                        "y2": pa.array(y2, pa.int64()),
                    }
                )
            )

        df = segment_intersection_join(
            tbl(segs_a), tbl(segs_b), cell=cell
        ).to_pandas()
        return set(zip(df.l_seg_id, df.r_seg_id))

    def test_edge_cases(self, ray_session):
        a = [
            (1, 0, 0, 100, 100),   # diagonal
            (2, 0, 200, 100, 200), # horizontal
            (3, 0, 300, 100, 300), # horizontal (collinear cases)
            (4, 50, 400, 50, 400), # degenerate point
        ]
        b = [
            (10, 0, 100, 100, 0),    # proper X crossing with 1
            (11, 50, 150, 50, 250),  # vertical T through 2's interior
            (12, 100, 200, 200, 200),# shares endpoint (100,200) with 2
            (13, 50, 300, 200, 300), # collinear overlapping with 3
            (14, 150, 300, 200, 300),# collinear DISJOINT from 3 → no
            (15, 0, 301, 100, 301),  # parallel, offset → no
            (16, 0, 350, 100, 450),  # passes through point-segment 4
        ]
        got = self._run(a, b)
        assert got == {(1, 10), (2, 11), (2, 12), (3, 13), (4, 16)}

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(23)
        n = 300
        def mk(base):
            ids = np.arange(base, base + n, dtype=np.int64)
            x1 = rng.integers(0, 2000, n)
            y1 = rng.integers(0, 2000, n)
            x2 = x1 + rng.integers(-150, 151, n)
            y2 = y1 + rng.integers(-150, 151, n)
            return list(zip(ids.tolist(), x1.tolist(), y1.tolist(),
                            x2.tolist(), y2.tolist()))
        a, b = mk(0), mk(10000)

        def seg_int(s, t):
            ax1, ay1, ax2, ay2 = s[1:]
            bx1, by1, bx2, by2 = t[1:]
            def o(px, py, qx, qy, rx, ry):
                v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
                return (v > 0) - (v < 0)
            def on(px, py, qx, qy, rx, ry):
                return min(px, qx) <= rx <= max(px, qx) and min(py, qy) <= ry <= max(py, qy)
            o1 = o(ax1, ay1, ax2, ay2, bx1, by1)
            o2 = o(ax1, ay1, ax2, ay2, bx2, by2)
            o3 = o(bx1, by1, bx2, by2, ax1, ay1)
            o4 = o(bx1, by1, bx2, by2, ax2, ay2)
            if o1 * o2 < 0 and o3 * o4 < 0:
                return True
            return (
                (o1 == 0 and on(ax1, ay1, ax2, ay2, bx1, by1))
                or (o2 == 0 and on(ax1, ay1, ax2, ay2, bx2, by2))
                or (o3 == 0 and on(bx1, by1, bx2, by2, ax1, ay1))
                or (o4 == 0 and on(bx1, by1, bx2, by2, ax2, ay2))
            )

        want = {(s[0], t[0]) for s in a for t in b if seg_int(s, t)}
        assert self._run(a, b, cell=128.0) == want


class TestAdaptiveCellPartition:
    def test_hot_cells_refine_cold_stay(self, ray_session):
        from rastertiler_rs_ray.geo.tileid import point_to_tile
        from rastertiler_rs_ray.pipelines.spatial import adaptive_cell_partition
        from rastertiler_rs_ray.geo import CE, ORIGIN

        rng = np.random.default_rng(5)
        # 40 points crammed into one z2 tile + 5 scattered singles
        side = CE / 4.0
        hot_x = -ORIGIN + 2 * side + rng.uniform(0.1, 0.9, 40) * side
        hot_y = ORIGIN - 1 * side - rng.uniform(0.1, 0.9, 40) * side
        cold_x = np.array([-ORIGIN + 0.5 * side, -ORIGIN + 1.5 * side,
                           -ORIGIN + 3.5 * side, -ORIGIN + 0.5 * side,
                           -ORIGIN + 2.5 * side])
        cold_y = np.array([ORIGIN - 3.5 * side, ORIGIN - 2.5 * side,
                           ORIGIN - 0.5 * side, ORIGIN - 0.5 * side,
                           ORIGIN - 3.5 * side])
        mx = np.concatenate([hot_x, cold_x])
        my = np.concatenate([hot_y, cold_y])
        ids = np.arange(len(mx), dtype=np.int64)
        pos = ray.data.from_arrow(
            pa.table({"doc_id": ids, "mx": mx, "my": my})
        )
        df = (
            adaptive_cell_partition(
                pos, zoom=2, deep_zoom=5, max_per_cell=10
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(df) == len(ids)  # exactly one key per point
        hot = df.iloc[:40]
        cold = df.iloc[40:]
        assert (hot.cell_zoom == 5).all()
        assert (cold.cell_zoom == 2).all()
        # refined keys are descendants of the hot coarse tile (2,1)@z2
        assert (hot.cx // 8 == 2).all() and (hot.cy // 8 == 1).all()
        # each refined key matches the direct z5 assignment
        dx, dy = point_to_tile(5, mx[:40], my[:40])
        assert (hot.cx.to_numpy() == dx).all() and (hot.cy.to_numpy() == dy).all()


class TestSnapToSegments:
    def test_vs_scalar_oracle(self, ray_session):
        import numpy as np

        from rastertiler_rs_ray.pipelines.spatial import snap_to_segments

        rng = np.random.default_rng(11)
        segs = rng.uniform(-10, 10, size=(17, 4))
        pts = rng.uniform(-12, 12, size=(60, 2))
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(60)), "lon": pts[:, 0], "lat": pts[:, 1]})
        )
        got = (
            snap_to_segments(ds, segs).to_pandas().set_index("doc_id").sort_index()
        )

        def seg_dist(p, s):
            a = np.array(s[:2]); b = np.array(s[2:])
            ab = b - a
            t = np.clip(np.dot(p - a, ab) / np.dot(ab, ab), 0.0, 1.0)
            return float(np.linalg.norm(p - (a + t * ab)))

        for i, p in enumerate(pts):
            cand = [
                (int(np.floor(seg_dist(p, s) * 1e4 + 0.5)), j)
                for j, s in enumerate(segs)
            ]
            de4, j = min(cand)
            assert got.loc[i, "seg_id"] == j
            assert got.loc[i, "dist_e4"] == de4

    def test_endpoint_clamp_and_degenerate(self, ray_session):
        import numpy as np

        from rastertiler_rs_ray.pipelines.spatial import snap_to_segments

        # one horizontal segment and one zero-length segment (a point)
        segs = np.array([[0.0, 0.0, 2.0, 0.0], [5.0, 5.0, 5.0, 5.0]])
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [0, 1, 2],
                    "lon": [-1.0, 1.0, 5.0],
                    "lat": [0.0, 3.0, 5.5],
                }
            )
        )
        got = snap_to_segments(ds, segs).to_pandas().set_index("doc_id")
        # point left of segment clamps to endpoint (0,0): dist 1
        assert got.loc[0, "seg_id"] == 0 and got.loc[0, "dist_e4"] == 10000
        # point above the interior projects perpendicular: dist 3
        assert got.loc[1, "seg_id"] == 0 and got.loc[1, "dist_e4"] == 30000
        # degenerate segment behaves as a point: dist 0.5
        assert got.loc[2, "seg_id"] == 1 and got.loc[2, "dist_e4"] == 5000


class TestZorderRangeQuery:
    def test_cover_is_exact_random_boxes(self, ray_session):
        import numpy as np

        from rastertiler_rs_ray.geo.cell import morton_interleave
        from rastertiler_rs_ray.pipelines.spatial import morton_cover_ranges

        rng = np.random.default_rng(5)
        zoom = 6
        n = 1 << zoom
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        z = morton_interleave(xs.ravel(), ys.ravel()).astype(np.int64)
        for _ in range(25):
            x0, x1 = sorted(rng.integers(0, n, 2).tolist())
            y0, y1 = sorted(rng.integers(0, n, 2).tolist())
            r = morton_cover_ranges(zoom, x0, y0, x1, y1)
            # disjoint, sorted, coalesced
            assert (r[:, 0] < r[:, 1]).all()
            assert (r[1:, 0] > r[:-1, 1]).all() or len(r) <= 1
            starts, ends = r[:, 0], r[:, 1]
            i = np.searchsorted(starts, z, side="right") - 1
            ok = (i >= 0) & (z < ends[np.maximum(i, 0)])
            want = (
                (xs.ravel() >= x0) & (xs.ravel() <= x1)
                & (ys.ravel() >= y0) & (ys.ravel() <= y1)
            )
            assert np.array_equal(ok, want)
            # area conservation: covered key count == box area
            assert int((ends - starts).sum()) == (x1 - x0 + 1) * (y1 - y0 + 1)

    def test_empty_and_full_box(self, ray_session):
        from rastertiler_rs_ray.pipelines.spatial import morton_cover_ranges

        assert len(morton_cover_ranges(4, 3, 3, 2, 5)) == 0  # inverted → empty
        full = morton_cover_ranges(4, 0, 0, 15, 15)
        assert full.tolist() == [[0, 256]]  # whole level = one interval


class TestPointDensity:
    def _pos(self, n=400, seed=23):
        import numpy as np

        rng = np.random.default_rng(seed)
        O = 20037508.342789244
        return ray.data.from_arrow(
            pa.table(
                {
                    "mx": rng.uniform(-O, O, n),
                    "my": rng.uniform(-O, O, n),
                }
            )
        ), O

    def test_summary_vs_numpy(self, ray_session):
        import numpy as np

        from rastertiler_rs_ray.pipelines.spatial import point_density_tiles

        ds, O = self._pos()
        df = ds.to_pandas()
        zoom, ts = 3, 32
        npx = (1 << zoom) * ts
        px = np.clip(np.floor((df.mx + O) / (2 * O) * npx), 0, npx - 1).astype(int)
        py = np.clip(np.floor((1 - (df.my + O) / (2 * O)) * npx), 0, npx - 1).astype(int)
        tx, ty, idx = px // ts, py // ts, (py % ts) * ts + px % ts
        got = (
            point_density_tiles(ds, zoom=zoom, tilesize=ts)
            .to_pandas()
            .set_index(["x", "y"])
            .sort_index()
        )
        import pandas as pd

        want = (
            pd.DataFrame({"x": tx, "y": ty, "idx": idx})
            .groupby(["x", "y"])
            .agg(total=("idx", "size"), n_px=("idx", "nunique"),
                 px_checksum=("idx", lambda s: int((s + 1).sum())))
            .sort_index()
        )
        assert got["total"].to_dict() == want["total"].to_dict()
        assert got["n_px"].to_dict() == want["n_px"].to_dict()
        assert got["px_checksum"].to_dict() == want["px_checksum"].to_dict()

    def test_blocks_match_summary(self, ray_session):
        import numpy as np

        from rastertiler_rs_ray.pipelines.spatial import (
            point_density_blocks,
            point_density_tiles,
        )

        ds, _ = self._pos(n=300, seed=9)
        zoom, ts = 2, 16
        summary = {
            (r["x"], r["y"]): (r["total"], r["n_px"], r["px_checksum"])
            for r in point_density_tiles(ds, zoom=zoom, tilesize=ts).take_all()
        }
        for r in point_density_blocks(ds, zoom=zoom, tilesize=ts).take_all():
            grid = np.frombuffer(r["pixels"], dtype=np.uint32)
            t, npx, ck = summary[(r["x"], r["y"])]
            assert int(grid.sum()) == t
            assert int((grid > 0).sum()) == npx
            assert int((grid * (np.arange(ts * ts) + 1)).sum()) == ck
        assert len(summary) == point_density_blocks(ds, zoom=zoom, tilesize=ts).count()


def test_hilbert_curve_properties():
    """Bijection over the full order-6 grid, exact inverse, and the
    defining Hilbert property Morton lacks: EVERY consecutive curve
    step is 4-adjacent (|dx|+|dy| == 1)."""
    import numpy as np

    from rastertiler_rs_ray.geo.hilbert import hilbert_d2xy, hilbert_xy2d

    order = 6
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_xy2d(order, xs.ravel(), ys.ravel())
    assert sorted(d.tolist()) == list(range(n * n))
    x2, y2 = hilbert_d2xy(order, d)
    assert np.array_equal(x2, xs.ravel()) and np.array_equal(y2, ys.ravel())
    o = np.argsort(d)
    step = np.abs(np.diff(xs.ravel()[o])) + np.abs(np.diff(ys.ravel()[o]))
    assert int(step.max()) == 1


def test_hilbert_sort_global_order_and_locality(ray_session):
    """Same contract as the Morton twin, plus the S2 rationale: the
    Hilbert layout's mean consecutive-row jump is no worse than
    Morton's on the same points (it's the curve's raison d'être)."""
    import numpy as np
    import ray.data

    from rastertiler_rs_ray.pipelines.spatial import hilbert_sort, zorder_sort

    rng = np.random.default_rng(7)
    n = 5000
    ext = 6378137.0 * np.pi * 0.8
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "mx": pa.array(rng.uniform(-ext, ext, n), pa.float64()),
                "my": pa.array(rng.uniform(-ext, ext, n), pa.float64()),
            }
        )
    ).repartition(8)

    def mean_jump(out, key):
        xs, ys, keys = [], [], []
        for b in out.iter_batches(batch_format="pandas", batch_size=512):
            keys.append(b[key].to_numpy())
            xs.append(b["mx"].to_numpy())
            ys.append(b["my"].to_numpy())
        keys = np.concatenate(keys)
        assert len(keys) == n and (np.diff(keys) >= 0).all()
        return float(
            np.hypot(np.diff(np.concatenate(xs)), np.diff(np.concatenate(ys))).mean()
        )

    hj = mean_jump(hilbert_sort(ds, zoom=10), "hkey")
    zj = mean_jump(zorder_sort(ds, zoom=10), "zkey")
    assert hj <= zj * 1.05  # Hilbert locality >= Morton locality


def test_hilbert_cover_ranges_exact_and_compact():
    """The Hilbert quadtree cover is EXACT (membership in the ranges ≡
    the rectangle predicate, no refine step) and at least as compact as
    the Morton cover for the same box — the S2 rationale."""
    import numpy as np

    from rastertiler_rs_ray.geo.cell import morton_interleave
    from rastertiler_rs_ray.geo.hilbert import hilbert_xy2d
    from rastertiler_rs_ray.pipelines.spatial import (
        hilbert_cover_ranges,
        morton_cover_ranges,
    )

    zoom = 8
    n = 1 << zoom
    boxes = [(13, 27, 200, 101), (0, 0, n - 1, n - 1), (50, 50, 50, 50),
             (1, 254, 130, 255), (100, 3, 101, 250)]
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    hall = hilbert_xy2d(zoom, xs, ys)
    zall = morton_interleave(xs, ys).astype(np.int64)

    def member(keys, ranges):
        if not len(ranges):
            return np.zeros(len(keys), bool)
        starts, ends = ranges[:, 0], ranges[:, 1]
        i = np.searchsorted(starts, keys, side="right") - 1
        return (i >= 0) & (keys < ends[np.maximum(i, 0)])

    for x0, y0, x1, y1 in boxes:
        want = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
        hr = hilbert_cover_ranges(zoom, x0, y0, x1, y1)
        zr = morton_cover_ranges(zoom, x0, y0, x1, y1)
        np.testing.assert_array_equal(member(hall, hr), want)
        np.testing.assert_array_equal(member(zall, zr), want)
        assert len(hr) <= len(zr), (len(hr), len(zr), (x0, y0, x1, y1))


def test_s2_cell_id_conventions():
    """S2-style packed ids: level recovery from the trailing sentinel,
    parent-by-bitmask == parent-by-construction (the quad-prefix
    property), strict range containment, sibling disjointness, and
    cross-level curve-sorted interleaving."""
    import numpy as np

    from rastertiler_rs_ray.geo.hilbert import (
        s2_cell_contains,
        s2_cell_id,
        s2_cell_level,
        s2_cell_parent,
        s2_cell_range,
    )

    rng = np.random.RandomState(3)
    for lvl in (1, 6, 13, 30):
        x = rng.randint(0, 1 << lvl, 300)
        y = rng.randint(0, 1 << lvl, 300)
        cid = s2_cell_id(lvl, x, y)
        assert (s2_cell_level(cid) == lvl).all()
        for pl in (0, lvl // 2, lvl):
            par = s2_cell_parent(cid, pl)
            want = s2_cell_id(pl, x >> (lvl - pl), y >> (lvl - pl))
            np.testing.assert_array_equal(par, want)
            assert s2_cell_contains(par, cid).all()
        lo, hi = s2_cell_range(cid)
        assert ((lo <= cid) & (cid <= hi)).all()

    # siblings at the same level never contain each other
    a = s2_cell_id(5, np.array([3]), np.array([4]))
    b = s2_cell_id(5, np.array([3]), np.array([5]))
    assert not s2_cell_contains(a, b)[0] and not s2_cell_contains(b, a)[0]

    # ids of a parent and its four children sort adjacently on the
    # curve: every child id lies between the parent's range bounds and
    # ids from DIFFERENT parents never interleave
    lvl = 4
    px, py = 2, 3
    par = s2_cell_id(lvl, np.array([px]), np.array([py]))
    lo, hi = s2_cell_range(par)
    kids = s2_cell_id(
        lvl + 1,
        np.array([2 * px, 2 * px + 1, 2 * px, 2 * px + 1]),
        np.array([2 * py, 2 * py, 2 * py + 1, 2 * py + 1]),
    )
    assert ((kids >= lo[0]) & (kids <= hi[0])).all()
