"""Vendored Avro container codec (sources/avrofmt.py): round trips
across every supported type, block boundaries, both codecs, the
sequential no-rowindex fallback, sliced arrays, and the read_table
dispatch."""
import numpy as np
import pyarrow as pa
import pytest

from osm2shp_ray.sources import avrofmt as av


def _table():
    return pa.table({
        "a": pa.array([1, -5, 2**62, 0, -2**62, 7], pa.int64()),
        "b": pa.array([1.5, -2.25, float("inf"), 0.0, -0.0, 3.14159],
                      pa.float64()),
        "s": pa.array(["", "hello", "héllo wörld", "x" * 300,
                       "y", "z"], pa.string()),
        "bin": pa.array([b"", b"\x00\x80\xff", b"abc", b"d" * 1000,
                         b"e", b"f"], pa.binary()),
        "f": pa.array([True, False, True, True, False, False],
                      pa.bool_()),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
@pytest.mark.parametrize("rows_per_block", [2, 6, 100])
def test_roundtrip(tmp_path, codec, rows_per_block):
    t = _table()
    p = str(tmp_path / "t.avro")
    av.write_avro_table(t, p, codec=codec, rows_per_block=rows_per_block)
    assert av.read_avro(p).equals(t)


def test_sequential_fallback_matches(tmp_path, monkeypatch):
    """A file WITHOUT the rowindex metadata (foreign writer) decodes
    through the per-row fallback to the identical table."""
    t = _table()
    p = str(tmp_path / "t.avro")
    av.write_avro_table(t, p, rows_per_block=3)
    fast = av.read_avro(p)
    monkeypatch.setattr(av, "_parse_rowindex", lambda blob: None)
    slow = av.read_avro(p)
    assert fast.equals(slow) and fast.equals(t)


def test_sliced_input(tmp_path):
    """Sliced (offset != 0) arrays encode correctly — the offsets
    buffer carries leading elements that must be skipped."""
    t = _table().slice(2, 3)
    p = str(tmp_path / "s.avro")
    av.write_avro_table(t, p)
    assert av.read_avro(p).equals(pa.table(t.to_pydict()))


def test_deterministic_bytes(tmp_path):
    t = _table()
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    av.write_avro_table(t, p1, rows_per_block=2)
    av.write_avro_table(t, p2, rows_per_block=2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_empty_table(tmp_path):
    e = pa.table({"a": pa.array([], pa.int64()),
                  "s": pa.array([], pa.string())})
    p = str(tmp_path / "e.avro")
    av.write_avro_table(e, p)
    back = av.read_avro(p)
    assert back.num_rows == 0 and back.schema.names == ["a", "s"]


def test_magic_and_sync_guard(tmp_path):
    p = str(tmp_path / "bad.avro")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not an Avro container"):
        av.read_avro(p)


def test_unsupported_type():
    t = pa.table({"x": pa.array([[1, 2]], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="unsupported Arrow type"):
        av.write_avro_table(t, "/tmp/never.avro")


def test_read_table_dispatch(tmp_path, ray_session):
    """read_table dispatches .avro files and shard directories."""
    from osm2shp_ray.sources.readers import read_table

    t = _table()
    d = tmp_path / "shards"
    d.mkdir()
    av.write_avro_table(t.slice(0, 3), str(d / "p0.avro"))
    av.write_avro_table(t.slice(3, 3), str(d / "p1.avro"))
    got = (read_table(str(d), columns=["a", "s"]).to_pandas()
           .sort_values("a").reset_index(drop=True))
    want = (t.select(["a", "s"]).to_pandas()
            .sort_values("a").reset_index(drop=True))
    assert got.equals(want)
