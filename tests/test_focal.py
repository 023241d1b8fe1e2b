"""Focal (3x3 stencil) statistics: plan equivalence + edge semantics.

Both physical plans (halo-exchange over a distributed block dataset,
zero-shuffle overlap reads) must agree with a dense numpy reference on
a raster whose structural block size is small enough that the region
crosses nodata and constant blocks.
"""

import numpy as np
import pandas as pd
import pytest

from rastertiler_rs_ray.geo import Affine
from rastertiler_rs_ray.raster.synthetic import SyntheticRaster

CHUNK = 32
REGION = (32, 64, 160, 192)  # block-aligned at CHUNK, crosses struct blocks


@pytest.fixture(scope="module")
def raster():
    # block=32 so the [REGION] window crosses many nodata/const blocks
    return SyntheticRaster(
        dtype="uint8",
        nodata=0,
        width=256,
        height=256,
        transform=Affine(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
        seed=7,
        block=32,
    )


def dense_reference(r, c0, r0, c1, r1) -> pd.DataFrame:
    from numpy.lib.stride_tricks import sliding_window_view

    cols = np.arange(c0 - 1, c1 + 1)[None, :]
    rows = np.arange(r0 - 1, r1 + 1)[:, None]
    v = r.values_at(cols, rows).astype(np.int64)
    inside = (cols >= c0) & (cols < c1) & (rows >= r0) & (rows < r1)
    valid = (v != r.nodata) & inside
    w = sliding_window_view(v, (3, 3))
    vw = sliding_window_view(valid, (3, 3))
    n = vw.sum(axis=(2, 3))
    s = np.where(vw, w, 0).sum(axis=(2, 3))
    mn = np.where(vw, w, 2**62).min(axis=(2, 3))
    mx = np.where(vw, w, -(2**62)).max(axis=(2, 3))
    keep = n > 0
    rr, cc = np.nonzero(keep)
    return pd.DataFrame(
        {
            "gcol": cc + c0,
            "grow": rr + r0,
            "n": n[keep],
            "sum_val": s[keep],
            "min_val": mn[keep],
            "max_val": mx[keep],
            "mean_e4": np.floor(s[keep] / n[keep] * 1e4 + 0.5).astype(np.int64),
        }
    )


def norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["gcol", "grow", "n", "sum_val", "min_val", "max_val", "mean_e4"]
    return (
        df[cols].astype(np.int64).sort_values(["grow", "gcol"]).reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def ref(raster):
    return norm(dense_reference(raster, *REGION))


def test_exchange_matches_dense(ray_session, raster, ref):
    from rastertiler_rs_ray.pipelines.focal import (
        focal_stats_exchange,
        raster_blocks_dataset,
    )

    c0, r0, c1, r1 = REGION
    blocks = raster_blocks_dataset(
        raster.spec(),
        c0 // CHUNK,
        r0 // CHUNK,
        c1 // CHUNK,
        r1 // CHUNK,
        chunk=CHUNK,
        concurrency=(1, 2),
    )
    got = norm(
        focal_stats_exchange(blocks, chunk=CHUNK, nodata=raster.nodata).to_pandas()
    )
    pd.testing.assert_frame_equal(got, ref)


def test_windowed_matches_dense(ray_session, raster, ref):
    from rastertiler_rs_ray.pipelines.focal import focal_stats_windowed

    got = norm(
        focal_stats_windowed(
            raster.spec(), *REGION, chunk=CHUNK, concurrency=(1, 2)
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, ref)


def test_region_edges_are_nodata(ray_session, raster):
    """A corner center sees only the 2x2 in-region quadrant: n <= 4,
    and every emitted center lies inside the region."""
    from rastertiler_rs_ray.pipelines.focal import focal_stats_windowed

    c0, r0, c1, r1 = REGION
    df = focal_stats_windowed(
        raster.spec(), *REGION, chunk=CHUNK, concurrency=(1, 2)
    ).to_pandas()
    assert df.gcol.between(c0, c1 - 1).all()
    assert df.grow.between(r0, r1 - 1).all()
    corner = df[(df.gcol == c0) & (df.grow == r0)]
    if len(corner):
        assert int(corner.n.iloc[0]) <= 4
    edge = df[df.gcol == c0]
    assert (edge.n <= 6).all()


def test_non_aligned_region_windowed(ray_session, raster):
    """The windowed plan also accepts non-block-aligned regions: output
    equals the dense reference on the same rectangle."""
    from rastertiler_rs_ray.pipelines.focal import focal_stats_windowed

    region = (40, 72, 150, 185)
    got = norm(
        focal_stats_windowed(
            raster.spec(), *region, chunk=CHUNK, concurrency=(1, 2)
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, norm(dense_reference(raster, *region)))


class TestLocalAlgebra:
    def test_ndvi_matches_dense(self, ray_session, raster):
        from rastertiler_rs_ray.pipelines.mapalgebra import local_algebra
        from rastertiler_rs_ray.raster.synthetic import SyntheticRaster

        spec_a = raster.spec()
        spec_b = {**spec_a, "seed": raster.seed + 5}
        region = (16, 16, 150, 120)  # deliberately non-chunk-aligned
        got = (
            local_algebra(spec_a, spec_b, *region, op="ndvi", chunk=CHUNK)
            .to_pandas()
            .sort_values(["bx", "by"])
            .reset_index(drop=True)
        )
        b = SyntheticRaster.from_spec(spec_b)
        c0, r0, c1, r1 = region
        cs = np.arange(c0, c1)[None, :]
        rs = np.arange(r0, r1)[:, None]
        va = raster.values_at(cs, rs).astype(np.float64)
        vb = b.values_at(cs, rs).astype(np.float64)
        valid = (va != 0) & (vb != 0)
        v = np.floor((va - vb) / (va + vb) * 1e4 + 0.5).astype(np.int64)
        bxs = np.broadcast_to(cs // CHUNK, va.shape)
        bys = np.broadcast_to(rs // CHUNK, va.shape)
        rows = []
        for bx in np.unique(bxs):
            for by in np.unique(bys):
                m = valid & (bxs == bx) & (bys == by)
                if m.sum() == 0:
                    continue
                rows.append(
                    {
                        "bx": bx,
                        "by": by,
                        "n": int(m.sum()),
                        "val_sum": int(v[m].sum()),
                        "val_min": int(v[m].min()),
                        "val_max": int(v[m].max()),
                    }
                )
        want = (
            pd.DataFrame(rows).sort_values(["bx", "by"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))

    def test_unknown_op_rejected(self, ray_session, raster):
        from rastertiler_rs_ray.pipelines.mapalgebra import local_algebra

        with pytest.raises(ValueError, match="unknown op"):
            local_algebra(raster.spec(), raster.spec(), 0, 0, 8, 8, op="mul")


def test_hillshade_flat_and_validity(ray_session, raster):
    """A constant region shades to the flat-terrain value
    floor(255*cos(zenith)+0.5); pixels whose 3x3 window touches nodata
    or the region edge emit nothing."""
    import numpy as np

    from rastertiler_rs_ray.pipelines.focal import hillshade_windowed

    # find a constant struct block of the test raster (bh % 7 == 1)
    df = hillshade_windowed(
        raster.spec(), *REGION, chunk=CHUNK, cellsize=10.0
    ).to_pandas()
    c0, r0, c1, r1 = REGION
    # validity: no output on the region border (window leaves region)
    assert not ((df.gcol == c0) | (df.gcol == c1 - 1)).any()
    assert not ((df.grow == r0) | (df.grow == r1 - 1)).any()
    # flat-terrain pixels (interior of const blocks) get the flat value
    flat = int(np.floor(255.0 * np.cos(np.deg2rad(45.0)) + 0.5))
    cols = np.arange(c0, c1)
    rows = np.arange(r0, r1)
    v = raster.values_at(cols[None, :], rows[:, None]).astype(np.int64)
    # any pixel whose full 3x3 is one constant value must shade flat
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(v, (3, 3))
    const_win = (w == w[..., 1:2, 1:2]).all(axis=(2, 3)) & (w[..., 1, 1] != 0)
    rr, cc = np.nonzero(const_win)
    if len(rr):
        sel = df.set_index(["gcol", "grow"])
        hits = 0
        for r_, c_ in zip(rows[rr + 1], cols[cc + 1]):
            if (c_, r_) in sel.index:
                assert int(sel.loc[(c_, r_), "hillshade"]) == flat
                hits += 1
        assert hits > 0
