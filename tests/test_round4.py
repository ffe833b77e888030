"""Round-4 additions: enforced skew contracts, partial top-k tails,
the oracle-gated LSH embedding near-dup path, and the vendored
baseline-JPEG codec."""

import numpy as np
import pyarrow as pa
import pytest


# ------------------------------------------------ ra_link_scores caps

def test_ra_wedges_drops_power_law_hub():
    """A planted hub with degree > max_hub_degree contributes ZERO
    wedge rows and is counted as dropped (no silent caps)."""
    from osm2shp_ray.stages.graph import _ra_wedges

    cap = 8
    hot_deg = 100                     # would be 4950 wedges uncapped
    o = np.concatenate([np.zeros(hot_deg, np.int64),       # hot hub 0
                        np.array([1, 1, 1, 2, 2], np.int64)])
    p = np.concatenate([np.arange(hot_deg, dtype=np.int64) + 10,
                        np.array([3, 4, 5, 3, 4], np.int64)])
    tbl, n_dropped = _ra_wedges(o, p, quant=1_000_000_000,
                                max_hub_degree=cap)
    assert n_dropped == 1
    # only hubs 1 (deg 3 -> 3 pairs) and 2 (deg 2 -> 1 pair) survive;
    # pair (3,4) shared -> 3 distinct pair keys
    assert tbl.num_rows == 3
    # wedge volume is bounded by surviving-hub degrees, never deg^2
    # of the hot hub
    assert int(pa.compute.sum(tbl["cnt"]).as_py()) == 4


def test_ra_link_scores_cap_end_to_end(ray_session):
    """End-to-end: with the cap below a planted hub's degree, its
    pairs vanish from the scores; with the cap above, they return."""
    import ray.data as rd

    from osm2shp_ray.stages.graph import ra_link_scores

    rows = []
    for item in range(20):            # hot hub 999: degree 20
        rows.append({"o": 999, "p": 100 + item})
    for hub, items in [(1, [1, 2]), (2, [1, 2]), (3, [2, 5])]:
        for item in items:
            rows.append({"o": hub, "p": item})
    ds = rd.from_items(rows)
    capped = ra_link_scores(ds, topk=50, max_hub_degree=10)
    # only the small hubs' pairs survive: (1,2) with 2 common hubs,
    # (2,5) with 1
    assert len(capped) == 2
    assert capped.iloc[0]["p1"] == 1 and capped.iloc[0]["p2"] == 2
    assert capped.iloc[0]["n_common"] == 2
    uncapped = ra_link_scores(ds, topk=500, max_hub_degree=4096)
    assert len(uncapped) == 2 + 20 * 19 // 2


def test_ra_link_scores_id_width_validation(ray_session):
    import ray.data as rd

    from osm2shp_ray.stages.graph import ra_link_scores

    bad_hub = rd.from_items([{"o": 1 << 32, "p": 1}])
    with pytest.raises(Exception, match="hub ids"):
        ra_link_scores(bad_hub)
    bad_item = rd.from_items([{"o": 1, "p": 1 << 31}])
    with pytest.raises(Exception, match="item ids"):
        ra_link_scores(bad_item)
