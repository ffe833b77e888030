"""Fused 2-shuffle image->ways path must produce byte-identical results
to the generic adapter->classify->resolve_ways path."""

import numpy as np

import ray.data as rd

from osm2shp_ray.pipelines import adapter, convert, fused
from osm2shp_ray.sources import fixtures


def _normalize(rows):
    return sorted((r["way_id"], int(r["layer_idx"]),
                   tuple(r["xs"]), tuple(r["ys"])) for r in rows)


def test_fused_matches_generic(ray_session):
    imgs = fixtures.images_table(1500)
    meta = rd.from_arrow(imgs.select(["image_id", "caption", "phash"]))

    nodes, ways = adapter.adapt_images(meta, n_buckets=8)
    from osm2shp_ray.stages.classify import classify_ways_batch
    from osm2shp_ray.stages.join import resolve_ways
    generic = resolve_ways(
        nodes, ways.map_batches(classify_ways_batch, batch_format="pyarrow"),
        n_buckets=8).take_all()

    fast = fused.assembled_ways_fused(meta, n_buckets=8).take_all()
    assert _normalize(fast) == _normalize(generic)
    assert len(fast) > 0
