"""Round-3 regression tests: string-id connected components, the
distributed dedup fallback with string doc ids, PBF malformed-stream
validation, and the disjoint split-piece id space."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_connected_components_string_ids(ray_session):
    from osm2shp_ray.stages.components import connected_components
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": ["b", "c", "x"], "id_b": ["a", "b", "y"]}))
    got = {r["id"]: r["root"] for r in connected_components(pairs).take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_int_ids_large_values(ray_session):
    # 63-bit ids: the old sum(label) fixpoint check overflowed here
    from osm2shp_ray.stages.components import connected_components
    big = (1 << 62) + 5
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": [big, big + 1], "id_b": [big + 1, big + 2]}))
    got = {r["id"]: r["root"] for r in connected_components(pairs).take_all()}
    assert got == {big: big, big + 1: big, big + 2: big}


def test_dedup_minhash_string_ids_distributed(ray_session):
    # component_cap=0 forces the distributed CC fallback, which used to
    # hardcode int64 node ids and crash on string doc ids
    from osm2shp_ray.stages.dedup import dedup_minhash
    base = "the quick brown fox jumps over the lazy dog " * 3
    df = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "text": [base, base + "!",
                 "completely different text about ray data engines"]})
    kept = sorted(r["doc_id"] for r in dedup_minhash(
        rd.from_pandas(df), threshold=0.7, shingle_n=3,
        component_cap=0).take_all())
    assert kept == ["d1", "d3"]


def test_dense_tags_truncated_raises():
    from osm2shp_ray.sources.osmpbf import _dense_tags
    sarr = np.array(["", "k", "v"], dtype=object)
    with pytest.raises(ValueError, match="truncated"):
        _dense_tags(np.array([1]), sarr, 1)  # stream ends on a key id
    with pytest.raises(ValueError, match="truncated"):
        _dense_tags(np.array([1, 0]), sarr, 1)  # value slot is the end marker
    assert _dense_tags(np.array([1, 2, 0]), sarr, 1) == ["k=v"]


def test_break_piece_ids_disjoint():
    # two crossing lines -> 4 pieces; piece ids are negative (disjoint
    # from genuine way ids, which the pipeline requires to be > 0) and
    # unique per (way, piece)
    from osm2shp_ray.stages.geometry import break_lines_group
    df = pd.DataFrame({
        "way_id": [7, 8],
        "layer_idx": np.array([0, 0], dtype=np.int8),
        "xs": [np.array([-1.0, 1.0]), np.array([0.0, 0.0])],
        "ys": [np.array([0.0, 0.0]), np.array([-1.0, 1.0])],
    })
    out = break_lines_group(df)
    ids = out["way_id"].to_numpy(zero_copy_only=False)
    assert len(ids) == 4
    assert (ids < 0).all()
    assert len(np.unique(ids)) == 4
    assert set(-ids >> 20) == {7, 8}
