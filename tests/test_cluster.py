"""stages/cluster.py (distributed DBSCAN) vs a brute-force
single-process reference on fuzzed and adversarial point sets."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_dbscan(ids, x, y, eps, min_pts):
    """O(n^2) reference with the same deterministic contract."""
    n = len(ids)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    adj = (dx * dx + dy * dy) <= eps * eps
    nb = adj.sum(axis=1)  # includes self
    core = nb >= min_pts
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ci = np.flatnonzero(core)
    for a in ci:
        for b in ci:
            if b > a and adj[a, b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for a in ci:
        r = find(a)
        comp_min[r] = min(comp_min.get(r, 1 << 62), ids[a])
    lab = np.full(n, -1, np.int64)
    role = np.full(n, "noise", object)
    for a in ci:
        lab[a] = comp_min[find(a)]
        role[a] = "core"
    for p in range(n):
        if core[p]:
            continue
        nc = ci[adj[p, ci]]
        if len(nc):
            role[p] = "border"
            lab[p] = min(lab[a] for a in nc)
    return {int(i): (int(l), r) for i, l, r in zip(ids, lab, role)}


def _run(ids, x, y, eps, min_pts, **kw):
    import ray
    from osm2shp_ray.stages.cluster import dbscan
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "xi": pa.array(x, pa.int64()),
        "yi": pa.array(y, pa.int64())}))
    out = dbscan(ds, eps=eps, min_pts=min_pts, id_col="id",
                 n_buckets=4, **kw).to_pandas()
    return {int(r.id): (int(r.label), r.role) for r in out.itertuples()}


@pytest.mark.parametrize("seed", [0, 1])
def test_dbscan_matches_brute_force_fuzzed(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 180
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    # mix: 3 planted blobs + uniform background
    centers = np.array([[50, 50], [200, 60], [120, 220]], np.int64) * 1000
    which = rng.integers(0, 4, n)
    x = np.where(which < 3, centers[which % 3, 0] + rng.integers(-15_000, 15_001, n),
                 rng.integers(0, 300_000, n)).astype(np.int64)
    y = np.where(which < 3, centers[which % 3, 1] + rng.integers(-15_000, 15_001, n),
                 rng.integers(0, 300_000, n)).astype(np.int64)
    eps, mp = 12_000, 4
    ref = _brute_dbscan(ids, x, y, eps, mp)
    assert _run(ids, x, y, eps, mp) == ref
    # the capped driver min-label and the distributed component path
    # must be byte-identical duals (uf_cap=0 forces the latter), and
    # the broadcast tail (one-pass semijoin / border lookup) must
    # equal the bucketed dim_join tail (bcast_cap=0 forces the latter)
    if seed == 0:
        assert _run(ids, x, y, eps, mp, uf_cap=0) == ref
        assert _run(ids, x, y, eps, mp, bcast_cap=0) == ref
        assert _run(ids, x, y, eps, mp, uf_cap=0, bcast_cap=0) == ref


def test_dbscan_edge_cases(ray_session):
    # duplicate coordinates (d2=0 pairs), an isolated pair (never
    # core at min_pts=3), and a lone point
    ids = np.array([10, 11, 12, 20, 21, 30], np.int64)
    x = np.array([0, 0, 5, 90_000, 90_004, 500_000], np.int64)
    y = np.array([0, 0, 0, 0, 0, 0], np.int64)
    eps, mp = 10, 3
    got = _run(ids, x, y, eps, mp)
    assert got == _brute_dbscan(ids, x, y, eps, mp)
    assert got[10] == (10, "core") and got[12] == (10, "core")
    assert got[20] == (-1, "noise") and got[30] == (-1, "noise")


def test_dbscan_rejects_bad_params(ray_session):
    import ray
    from osm2shp_ray.stages.cluster import dbscan
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "xi": pa.array([1], pa.int64()),
        "yi": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        dbscan(ds, eps=0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(ds, eps=5, min_pts=1)


def test_dbscan_all_noise(ray_session):
    """No core points anywhere: every point comes back as noise
    instead of crashing on the empty broadcast sides (regression for
    the zero-row dim_join schema hint)."""
    ids = np.array([1, 2, 3], np.int64)
    x = np.array([0, 100_000, 200_000], np.int64)
    y = np.zeros(3, np.int64)
    got = _run(ids, x, y, eps=10, min_pts=2)
    assert got == {1: (-1, "noise"), 2: (-1, "noise"), 3: (-1, "noise")}
