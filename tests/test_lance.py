"""Vendored Lance v2 fragment format: container-layout conformance,
round-trip equality on the mandated image-table shape, column-pruned
reads, Ray-parallel dataset write/read, and reader dispatch."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.sources import lancefmt
from osm2shp_ray.sources.fixtures import images_table


@pytest.fixture(scope="module")
def img_lance(tmp_path_factory):
    t = images_table(300)
    path = str(tmp_path_factory.mktemp("lance") / "images.lance")
    lancefmt.write_lance(t, path, rows_per_fragment=128)  # 3 fragments
    return t, path


def test_footer_layout(img_lance):
    _t, path = img_lance
    frag = lancefmt.fragment_paths(path)[0]
    raw = open(frag, "rb").read()
    assert raw[-4:] == b"LANC"
    (cm, cmo, gbo, n_gb, n_cols, major, minor, magic) = struct.unpack(
        "<QQQIIHH4s", raw[-40:])
    assert magic == b"LANC" and (major, minor) == (2, 0)
    assert n_cols == 7 and n_gb == 1
    assert cm < cmo < gbo < len(raw) - 40


def test_round_trip_exact(img_lance):
    t, path = img_lance
    frags = lancefmt.fragment_paths(path)
    assert len(frags) == 3
    back = pa.concat_tables([lancefmt.read_fragment(p) for p in frags])
    assert back.schema.names == t.schema.names
    assert back.combine_chunks().equals(t.combine_chunks())


def test_schema_and_pruned_read(img_lance):
    t, path = img_lance
    sch = lancefmt.read_schema(path)
    assert sch.names == list(t.schema.names)
    assert sch.field("phash").type == pa.int64()
    frag = lancefmt.fragment_paths(path)[0]
    sub = lancefmt.read_fragment(frag, columns=["image_id", "phash"])
    assert sub.schema.names == ["image_id", "phash"]
    assert sub["phash"].equals(t["phash"].slice(0, len(sub)))


def test_ray_read_and_parallel_write(img_lance, ray_session, tmp_path):
    import ray.data as rd
    t, path = img_lance
    ds = lancefmt.read_lance(path, columns=["image_id", "caption", "phash"])
    assert ds.count() == t.num_rows
    got = ds.to_pandas().sort_values("image_id", ignore_index=True)
    exp3 = (t.select(["image_id", "caption", "phash"]).to_pandas()
            .sort_values("image_id", ignore_index=True))
    assert got["phash"].tolist() == exp3["phash"].tolist()
    assert got["caption"].tolist() == exp3["caption"].tolist()
    # Ray-parallel dataset write: one fragment per block
    out = str(tmp_path / "roundtrip.lance")
    lancefmt.write_lance(rd.from_arrow(t).repartition(4), out)
    back = lancefmt.read_lance(out).to_pandas().sort_values(
        "image_id", ignore_index=True)
    exp = t.to_pandas().sort_values("image_id", ignore_index=True)
    assert back["phash"].tolist() == exp["phash"].tolist()
    assert back["caption"].tolist() == exp["caption"].tolist()


def test_reader_dispatch_lance(img_lance, ray_session):
    from osm2shp_ray.sources.readers import read_table
    _t, path = img_lance
    ds = read_table(path, columns=["image_id", "w", "h"])
    assert ds.schema().names == ["image_id", "w", "h"]
    assert ds.count() == 300


def test_rejects_nulls_and_bad_magic(tmp_path):
    t = pa.table({"a": pa.array([1, None], pa.int64())})
    with pytest.raises(ValueError, match="non-null"):
        lancefmt.write_fragment(t, str(tmp_path / "x.lance"))
    bad = tmp_path / "bad.lance"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        lancefmt.read_fragment(str(bad))
