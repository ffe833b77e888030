"""broadcast_join / dim_join equivalence vs the shuffle hash_join.

The broadcast join is the zero-exchange dimension-side path (Spark-AQE
style): right side counted on materialized blocks, collected once,
ray.put once, probed per left batch with one Acero Table.join. Every
``how`` it supports must be row-for-row identical to hash_join.
"""
import numpy as np
import pandas as pd
import pytest


def _frames(seed=7, nl=2000, nr=150):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, nl),
        "k2": rng.integers(0, 3, nl),
        "a": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 60, nr),  # some keys unmatched both ways
        "k2": rng.integers(0, 3, nr),
        "b": np.arange(nr, dtype=np.int64) * 7,
    })
    return left, right


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
@pytest.mark.parametrize("on", ["k", ["k", "k2"]])
def test_broadcast_matches_hash_join(ray_session, how, on):
    import ray
    from osm2shp_ray.stages.joins import broadcast_join, dim_join, hash_join

    left, right = _frames()
    if on == "k":  # single-key case: k2 would be a non-key overlap
        right = right.drop(columns=["k2"])

    h = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  on=on, how=how).to_pandas()
    b = broadcast_join(ray.data.from_pandas(left),
                       ray.data.from_pandas(right), on=on,
                       how=how).to_pandas()
    d = dim_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                 on=on, how=how).to_pandas()
    assert list(h.columns) == list(b.columns) == list(d.columns)
    assert _sorted(h).equals(_sorted(b))
    assert _sorted(h).equals(_sorted(d))


def test_dim_join_falls_back_above_cap(ray_session):
    import ray
    from osm2shp_ray.stages.joins import broadcast_join, dim_join, hash_join

    left, right = _frames()
    ref = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on=["k", "k2"], how="inner").to_pandas()
    # cap below the right side's 150 rows: must take the shuffle path
    out = dim_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                   on=["k", "k2"], how="inner", broadcast_cap=10).to_pandas()
    assert _sorted(ref).equals(_sorted(out))
    with pytest.raises(ValueError, match="broadcast_cap"):
        broadcast_join(ray.data.from_pandas(left),
                       ray.data.from_pandas(right), on="k",
                       broadcast_cap=10)


def test_broadcast_join_typed_nulls_survive_int64(ray_session):
    """how='left' unmatched right columns must be typed Arrow nulls —
    int64 values above 2^53 survive exactly (the hash_join
    contract)."""
    import ray
    from osm2shp_ray.stages.joins import broadcast_join

    big = (1 << 60) + 12345
    left = pd.DataFrame({"k": [1, 2], "a": [0, 1]})
    right = pd.DataFrame({"k": [1], "v": np.array([big], dtype=np.int64)})
    out = (broadcast_join(ray.data.from_pandas(left),
                          ray.data.from_pandas(right), on="k", how="left")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.loc[0, "v"] == big
    assert pd.isna(out.loc[1, "v"])


def test_broadcast_join_empty_right_with_schema(ray_session):
    import pyarrow as pa
    import ray
    from osm2shp_ray.stages.joins import broadcast_join

    left = pd.DataFrame({"k": [1, 2], "a": [0, 1]})
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": [1], "v": [9]})).filter(lambda r: False)
    sch = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    out = broadcast_join(ray.data.from_pandas(left), right, on="k",
                         how="left_anti", right_schema=sch).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]
