"""CLI entry point — the S3 surface (/root/reference/osm2shp.cc:12-15:
``osm2shp <input> <base-path>``, exit 1 on wrong args; mapgen.sh adds
discovery + postprocess + resume).

    python -m osm2shp_ray convert <images-table> <out-dir> [--resume]
    python -m osm2shp_ray mapgen  <images-table> <out-dir>
    python -m osm2shp_ray bench   [--scaling]

The CLI owns the Ray session (ray.init/shutdown); library code never
does (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _session(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_convert(args) -> int:
    ray = _session(args.num_cpus)
    import ray.data as rd

    from .pipelines import adapter, convert
    from .sources.readers import discover_input, read_table
    from .state import checkpoint, metrics

    path = discover_input(args.input)
    actor = metrics.get_or_create()
    from .sources.readers import is_osm_path
    if is_osm_path(path):
        # the reference's native input: parse OSM XML straight to
        # (nodes, ways) — no image adapter in this path
        from .sources.osmxml import read_osm
        nodes, ways = read_osm(path)
        actor.inc.remote("processed_nodes", nodes.count())
    else:
        meta = read_table(path, columns=["image_id", "caption", "phash"])
        # count the input once, explicitly: a counted() stage inside a
        # lineage that multiple branches re-execute would double-count
        actor.inc.remote("processed_images", meta.count())
        nodes, ways = adapter.adapt_images(meta)
    points, ways_out = convert.convert(nodes, ways)
    if (getattr(args, "shapefiles", False) or getattr(args, "geojson",
                                                      False)
            or getattr(args, "avro", False)):
        # consumed twice (parquet + extra export): materialize so
        # the lineage doesn't re-execute the join per consumer
        points = points.materialize()
        ways_out = ways_out.materialize()
    if args.resume:
        checkpoint.resumable_write(points, os.path.join(args.out, "points"),
                                   "layer", stage="points")
        checkpoint.resumable_write(ways_out, os.path.join(args.out, "ways"),
                                   "layer", stage="ways")
    else:
        points.write_parquet(os.path.join(args.out, "points"),
                             partition_cols=["layer"])
        ways_out.write_parquet(os.path.join(args.out, "ways"),
                               partition_cols=["layer"])
    if getattr(args, "shapefiles", False):
        from .sources.shapefile import export_shapefiles
        export_shapefiles(points, ways_out,
                          os.path.join(args.out, "shapefiles"))
    if getattr(args, "geojson", False):
        from .sources.geojson import write_geojsonl
        write_geojsonl(points, os.path.join(args.out, "geojson", "points"))
        write_geojsonl(ways_out, os.path.join(args.out, "geojson", "ways"))
    if getattr(args, "avro", False):
        from .sources.avrofmt import write_avro_dataset
        write_avro_dataset(points, os.path.join(args.out, "avro", "points"))
        write_avro_dataset(ways_out, os.path.join(args.out, "avro", "ways"))
    # A4 analog: job-end totals (handler.cc:59-62) — now including
    # dropped_ways/unresolved_refs from the J2 gate
    report = ray.get(actor.report.remote())
    print(json.dumps({"out": args.out, "metrics": report}))
    ray.shutdown()
    return 0


def cmd_mapgen(args) -> int:
    ray = _session(args.num_cpus)
    from .pipelines import fused, mapgen
    from .sources.readers import discover_input, read_table
    from .stages.geometry import build_way_wkb_batch

    path = discover_input(args.input)
    meta = read_table(path, columns=["image_id", "caption", "phash"])
    assembled = fused.assembled_ways_fused(meta)
    cleaned = mapgen.postprocess_lines(assembled)
    out_ds = cleaned.map_batches(build_way_wkb_batch, batch_format="pyarrow")
    if getattr(args, "shapefiles", False) or getattr(args, "geojson",
                                                     False):
        out_ds = out_ds.materialize()  # consumed twice (write + export)
    if args.resume:
        from .state import checkpoint
        written = checkpoint.resumable_write(out_ds, args.out, "layer",
                                             stage="mapgen")
        print(json.dumps({"out": args.out,
                          "written_partitions": len(written),
                          **checkpoint.manifest_metrics(args.out)}))
    else:
        out_ds.write_parquet(args.out, partition_cols=["layer"])
        print(json.dumps({"out": args.out, "features": out_ds.count()}))
    if getattr(args, "shapefiles", False):
        # P7 parity: mapgen's observable output is one .shp per line
        # layer (mapgen.sh:63,72,81,90 v.out.ogr)
        from .sources.shapefile import SHPT_ARC, export_layer
        sdir = os.path.join(args.out, "shapefiles")
        os.makedirs(sdir, exist_ok=True)
        from .pipelines.mapgen import LINE_LAYERS
        for layer in LINE_LAYERS:
            export_layer(out_ds.filter(expr=f"layer == '{layer}'"),
                         os.path.join(sdir, layer), SHPT_ARC)
    if getattr(args, "geojson", False):
        from .sources.geojson import write_geojsonl
        write_geojsonl(out_ds, os.path.join(args.out, "geojson"))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="osm2shp_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("convert", cmd_convert), ("mapgen", cmd_mapgen)):
        sp = sub.add_parser(name)
        sp.add_argument("input")
        sp.add_argument("out")
        sp.add_argument("--resume", action="store_true")
        sp.add_argument("--shapefiles", action="store_true",
                        help="also export reference-parity .shp/.dbf/.prj "
                             "triples per layer")
        sp.add_argument("--geojson", action="store_true",
                        help="also export line-delimited GeoJSON shards")
        sp.add_argument("--avro", action="store_true",
                        help="also export Avro container shards "
                             "(vendored spec-subset codec)")
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
