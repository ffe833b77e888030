"""OSM XML reader (S1): round-trip the edge-case fixture corpus
through generated XML (plain, .gz, .bz2) and prove the parsed tables
drive convert() to the identical output as the in-memory tables."""

import bz2
import gzip
import os

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.sources.fixtures import nodes_ways_tables
from osm2shp_ray.sources.osmxml import parse_osm_xml, read_osm


def _to_xml(nodes_t: pa.Table, ways_t: pa.Table) -> str:
    out = ["<?xml version='1.0'?>", "<osm version='0.6'>"]
    for i in range(nodes_t.num_rows):
        tags = nodes_t["tags"][i].as_py()
        nid = nodes_t["id"][i].as_py()
        lon = nodes_t["lon"][i].as_py()
        lat = nodes_t["lat"][i].as_py()
        out.append(f"<node id='{nid}' lat='{lat}' lon='{lon}'>")
        for tok in tags.split():
            k, _, v = tok.partition("=")
            out.append(f"  <tag k='{k}' v='{v}'/>")
        out.append("</node>")
    for i in range(ways_t.num_rows):
        out.append(f"<way id='{ways_t['way_id'][i].as_py()}'>")
        for ref in ways_t["node_refs"][i].as_py():
            out.append(f"  <nd ref='{ref}'/>")
        for tok in ways_t["tags"][i].as_py().split():
            k, _, v = tok.partition("=")
            out.append(f"  <tag k='{k}' v='{v}'/>")
        out.append("</way>")
    out.append("</osm>")
    return "\n".join(out)


@pytest.fixture(scope="module")
def xml_files(tmp_path_factory):
    nodes_t, ways_t = nodes_ways_tables()
    xml = _to_xml(nodes_t, ways_t)
    d = tmp_path_factory.mktemp("osm")
    plain = d / "map.osm"
    plain.write_text(xml)
    with gzip.open(d / "map.osm.gz", "wt") as f:
        f.write(xml)
    with bz2.open(d / "map.osm.bz2", "wt") as f:
        f.write(xml)
    return d, nodes_t, ways_t


@pytest.mark.parametrize("name", ["map.osm", "map.osm.gz", "map.osm.bz2"])
def test_parse_roundtrip(xml_files, name):
    d, nodes_t, ways_t = xml_files
    nodes, ways = [], []
    for kind, t in parse_osm_xml(str(d / name), batch_rows=16):
        (nodes if kind == "node" else ways).append(t)
    nt = pa.concat_tables(nodes)
    wt = pa.concat_tables(ways)
    assert nt["id"].to_pylist() == nodes_t["id"].to_pylist()
    assert np.allclose(nt["lon"].to_numpy(), nodes_t["lon"].to_numpy())
    assert nt["tags"].to_pylist() == nodes_t["tags"].to_pylist()
    assert wt["way_id"].to_pylist() == ways_t["way_id"].to_pylist()
    assert wt["node_refs"].to_pylist() == ways_t["node_refs"].to_pylist()
    assert wt["tags"].to_pylist() == ways_t["tags"].to_pylist()


def test_read_osm_drives_convert(ray_session, xml_files):
    import ray.data as rd
    from osm2shp_ray.pipelines import convert
    d, nodes_t, ways_t = xml_files
    nodes, ways = read_osm(str(d / "map.osm"))
    p1, w1 = convert.convert(nodes, ways, n_buckets=4)
    p2, w2 = convert.convert(rd.from_arrow(nodes_t), rd.from_arrow(ways_t),
                             n_buckets=4)
    key = lambda rows: sorted((r.get("way_id", -1), r["layer"],
                               bytes(r["geometry_wkb"])) for r in rows)
    assert key(p1.take_all()) == key(p2.take_all())
    assert key(w1.take_all()) == key(w2.take_all())


def test_read_osm_directory(ray_session, xml_files):
    d, nodes_t, _ = xml_files
    nodes, ways = read_osm(str(d))  # 3 files -> 3 parse tasks
    assert nodes.count() == 3 * nodes_t.num_rows


def test_read_osm_single_pass_equals_double(ray_session, xml_files, tmp_path):
    # the single-pass (scratch parquet) and double-parse modes must
    # yield identical tables
    d, _nodes_t, _ways_t = xml_files
    n1, w1 = read_osm(str(d / "map.osm"), single_pass=True,
                      scratch_dir=str(tmp_path))
    n2, w2 = read_osm(str(d / "map.osm"), single_pass=False)
    key_n = lambda rows: sorted((r["id"], r["lon"], r["lat"], r["tags"])
                                for r in rows)
    key_w = lambda rows: sorted((r["way_id"], tuple(r["node_refs"]), r["tags"])
                                for r in rows)
    assert key_n(n1.take_all()) == key_n(n2.take_all())
    assert key_w(w1.take_all()) == key_w(w2.take_all())
