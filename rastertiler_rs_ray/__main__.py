"""CLI entry points — parity with the reference's clap surface
(/root/reference/src/main.rs:20-87): ``render`` and ``merge``
subcommands with the same validation rules (zoom ≤ 24, minzoom ≤
maxzoom, colormap only for uint8; src/main.rs:108-115, 136-154).

Run as ``python -m rastertiler_rs_ray render|merge|export-mbtiles ...``
or via ``ray job submit -- python -m rastertiler_rs_ray ...`` on a
cluster.  This is the only module (besides bench.py and tests) that may
own a Ray session.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_zoom(v: str) -> int:
    z = int(v)
    if not 0 <= z <= 24:
        raise argparse.ArgumentTypeError(f"zoom must be in [0, 24], got {z}")
    return z


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rastertiler_rs_ray")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("render", help="render a raster into a tileset (ref: render)")
    r.add_argument("out_dir", help="output tileset directory")
    r.add_argument("--tif", default=None, metavar="PATH",
                   help="GeoTIFF source (single-band u8/u32, EPSG:3857 or 4326; "
                        "pure-Python reader, no GDAL needed)")
    r.add_argument("--disable-overviews", action="store_true",
                   help="force base-grid reads (more precise, slower; ref --disable-overviews)")
    r.add_argument("--raster", choices=["u8", "u32"], default="u8",
                   help="synthetic raster variant when no --tif is given")
    r.add_argument("--seed", type=int, default=42)
    r.add_argument("--minzoom", type=_parse_zoom, default=0)
    r.add_argument("--maxzoom", type=_parse_zoom, default=4)
    r.add_argument("--tilesize", type=int, default=512)
    r.add_argument("--colormap", default=None, help='"v:#rrggbb,v:#rrggbb" (uint8 only)')
    r.add_argument("--name", default=None)
    r.add_argument("--workers", type=int, default=None, help="actor pool size")
    r.add_argument("--no-resume", action="store_true", help="delete any existing output first")
    r.add_argument("--mbtiles", default=None, help="also export a sqlite MBTiles file here")

    m = sub.add_parser("merge", help="merge two tilesets, left wins on conflicts (ref: merge)")
    m.add_argument("left")
    m.add_argument("right")
    m.add_argument("out_dir")

    e = sub.add_parser("export-mbtiles", help="tileset dir -> sqlite MBTiles file")
    e.add_argument("tileset_dir")
    e.add_argument("mbtiles_path")

    i = sub.add_parser(
        "import-mbtiles",
        help="sqlite MBTiles file -> partitioned tileset dir (bridge from the reference)",
    )
    i.add_argument("mbtiles_path")
    i.add_argument("out_dir")

    c = sub.add_parser(
        "curate",
        help="training-data curation: quality gate -> decontaminate -> "
             "dedup -> pack sequences, resumable partitioned parquet out",
    )
    c.add_argument("input", help="parquet file/dir with (doc_id: int64, text: string)")
    c.add_argument("out_dir")
    c.add_argument("--capacity", type=int, default=256, help="tokens per training sequence")
    c.add_argument("--shard-size", type=int, default=100, help="doc ids per pack shard")
    c.add_argument("--min-distinct-frac-e4", type=int, default=4000,
                   help="drop docs with distinct-token fraction below this (e4 scale)")
    c.add_argument("--eval-mod", type=int, default=20,
                   help="doc_id %% MOD == 0 rows form the held-out eval corpus")
    c.add_argument("--ngram", type=int, default=4, help="decontamination n-gram size")
    c.add_argument("--no-resume", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)
    try:
        if args.command == "render":
            if args.minzoom > args.maxzoom:
                print("error: minzoom must be <= maxzoom", file=sys.stderr)
                return 2
            from .pipelines.render import export_mbtiles, render_pyramid
            from .raster.synthetic import default_u8_raster, default_u32_raster

            if args.tif is not None:
                import os

                if not os.path.isfile(args.tif):
                    # clap file_exists validation parity (src/main.rs:108-115)
                    print(f"error: file does not exist: {args.tif}", file=sys.stderr)
                    return 2
                from .raster.geotiff import open_raster

                raster = open_raster(args.tif, disable_overviews=args.disable_overviews)
            else:
                raster = (
                    default_u8_raster(seed=args.seed)
                    if args.raster == "u8"
                    else default_u32_raster(seed=args.seed)
                )
            manifest = render_pyramid(
                raster,
                args.out_dir,
                args.minzoom,
                args.maxzoom,
                tilesize=args.tilesize,
                colormap=args.colormap,
                name=args.name,
                concurrency=args.workers,
                resume=not args.no_resume,
            )
            if args.mbtiles:
                export_mbtiles(args.out_dir, args.mbtiles)
            parts = manifest.data.get("partitions", {})
            print(json.dumps({
                "out_dir": args.out_dir,
                "partitions": {k: v.get("rows") for k, v in parts.items()},
            }))
        elif args.command == "merge":
            from .pipelines.merge import merge_tilesets

            manifest = merge_tilesets(args.left, args.right, args.out_dir)
            print(json.dumps({"out_dir": args.out_dir,
                              "rows": manifest.data.get("partitions", {})
                              .get("tiles/merged", {}).get("rows")}))
        elif args.command == "export-mbtiles":
            from .pipelines.render import export_mbtiles

            export_mbtiles(args.tileset_dir, args.mbtiles_path)
            print(json.dumps({"mbtiles": args.mbtiles_path}))
        elif args.command == "import-mbtiles":
            from .pipelines.render import import_mbtiles

            manifest = import_mbtiles(args.mbtiles_path, args.out_dir)
            print(json.dumps({"out_dir": args.out_dir,
                              "rows": manifest.partition("tiles/imported").get("rows")}))
        elif args.command == "curate":
            if args.eval_mod < 2:
                raise ValueError("--eval-mod must be >= 2")
            if args.capacity < 1:
                raise ValueError("--capacity must be >= 1")
            if args.shard_size < 1:
                raise ValueError("--shard-size must be >= 1")
            import pyarrow as pa
            import ray.data

            from .pipelines.curation import (
                decontaminate,
                filter_repetitive,
                pack_sequences,
            )
            from .pipelines.dedup import exact_dedup
            from .pipelines.sink import checkpointed_write

            docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])

            def split(keep_eval):
                def f(batch: "pa.Table") -> "pa.Table":
                    ids = batch.column("doc_id").to_numpy()
                    return batch.filter(pa.array((ids % args.eval_mod == 0) == keep_eval))

                return f

            train = docs.map_batches(split(False), batch_format="pyarrow")
            eval_ds = docs.map_batches(split(True), batch_format="pyarrow")
            packed = pack_sequences(
                exact_dedup(
                    decontaminate(
                        filter_repetitive(
                            train, min_distinct_frac_e4=args.min_distinct_frac_e4
                        ),
                        eval_ds,
                        n=args.ngram,
                    )
                ),
                capacity=args.capacity,
                shard_size=args.shard_size,
            )

            def add_part(batch: "pa.Table") -> "pa.Table":
                shards = batch.column("seq_id").to_numpy() // 1_000_000
                return batch.append_column("part", pa.array(shards, pa.int64()))

            manifest = checkpointed_write(
                packed.map_batches(add_part, batch_format="pyarrow"),
                args.out_dir,
                partition_col="part",
                resume=not args.no_resume,
                meta={"capacity": args.capacity, "eval_mod": args.eval_mod,
                      "ngram": args.ngram, "input": args.input},
            )
            parts = manifest.data.get("partitions", {})
            print(json.dumps({
                "out_dir": args.out_dir,
                "rows": sum(v.get("rows", 0) for v in parts.values()),
                "partitions": len(parts),
            }))
    except ValueError as e:  # validation parity: clean error, nonzero exit
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
