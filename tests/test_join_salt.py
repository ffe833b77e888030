"""Salted hot-ref join must be byte-identical to the unsalted join,
including on a pathologically skewed ref distribution."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from osm2shp_ray.stages.classify import classify_ways_batch
from osm2shp_ray.stages.join import resolve_ways


def _mk(n_ways=400, hot_every=2):
    """Half of all way vertices reference node 1 (the hub) — the skew
    case salting exists for."""
    rng = np.random.default_rng(4)
    nodes = pa.table({
        "id": pa.array(np.arange(1, 1001), pa.int64()),
        "lon": pa.array(rng.uniform(-10, 10, 1000), pa.float64()),
        "lat": pa.array(rng.uniform(-10, 10, 1000), pa.float64()),
        "tags": pa.array([""] * 1000, pa.string()),
    })
    refs, offs = [], [0]
    for i in range(n_ways):
        k = int(rng.integers(2, 6))
        r = rng.integers(2, 1001, size=k).tolist()
        if i % hot_every == 0:
            r[0] = 1  # hub node
        refs.extend(r)
        offs.append(len(refs))
    ways = pa.table({
        "way_id": pa.array(np.arange(n_ways), pa.int64()),
        "node_refs": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(refs, pa.int64())),
        "tags": pa.array(["highway=motorway"] * n_ways, pa.string()),
    })
    return nodes, ways


def _norm(rows):
    return sorted((r["way_id"], int(r["layer_idx"]), tuple(r["xs"]), tuple(r["ys"]))
                  for r in rows)


def test_salted_join_identical(ray_session):
    nodes_t, ways_t = _mk()
    nodes = rd.from_arrow(nodes_t)
    classified = rd.from_arrow(ways_t).map_batches(classify_ways_batch,
                                                   batch_format="pyarrow")
    plain = resolve_ways(nodes, classified, n_buckets=8, salt=1).take_all()
    salted = resolve_ways(nodes, classified, n_buckets=8, salt=4).take_all()
    assert _norm(salted) == _norm(plain)
    assert len(plain) == 400   # all ways resolve (hub included)
