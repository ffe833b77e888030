"""Distributed grid-based DBSCAN over integer-coordinate points.

Density clustering for the geospatial tier: cluster ids for every
point, with the classic core / border / noise roles. The reference
has no clustering at all — its only spatial structure is the node-ref
lookup (/root/reference/osm/point_database.cc:63-71); this operator
is a north_rule-§2.8-style addition designed Ray-Data-first.

Determinism contract (so a SQL oracle can mirror it exactly):
  * coordinates are non-negative int64 (e.g. micro-degrees); all
    distances are exact int64 squared distances, no floats anywhere;
  * a point is CORE iff |{q : d2(p,q) <= eps^2}| >= min_pts (the
    count includes p itself, the standard DBSCAN convention);
  * cluster label = min core-point id of the core connected
    component (min-label components are order-free, unlike the
    textbook's scan-order flood fill);
  * a BORDER point takes the MIN label over its core neighbors
    (textbook DBSCAN assigns the first visitor — order-dependent;
    min is the deterministic refinement);
  * NOISE points get label -1.

Scale shape (the only one that works at 10^12 rows):
  1. one grid co-group builds the eps-neighbor pair list: each point
     is OWNED by its (xi//eps, yi//eps) cell and VISITS the 4
     half-neighborhood cells (bounded 5x on one side), so every
     unordered pair meets — and its distance is evaluated — in
     exactly one group, then is mirrored in-kernel; in-group
     distances are a blocked int64 matrix (<= ``pair_block``
     resident), so a hot cell degrades to bounded-memory brute force;
  2. neighbor counts / core set: one groupby over the pair list;
  3. core-core edges -> cluster labels via a CAPPED DUAL: at or below
     ``uf_cap`` edge rows the ids-only edge list folds on the driver
     (vectorized min-label propagation with pointer jumping); above
     it, components.connected_components runs its bucketed
     O(diameter)-round propagation — byte-identical outputs
     (equivalence test);
  4. border assignment: one adaptive join + groupby-min over the
     pair list.
Everything else is bucketed/broadcast exchanges over the PAIR graph,
which the eps grid keeps proportional to true neighbor density,
never all-pairs; the only driver-side work is the ids-only fold
under its documented cap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Min, Sum

from .components import connected_components
from .util import coalesced

_PACK = np.int64(1) << np.int64(32)  # cell key = (cx+1)*2^32 + (cy+1)


def _ids(t: pa.Table, col: str) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False).astype(np.int64)


def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of ``vals`` in a SORTED id array via searchsorted —
    the broadcast-semijoin probe (O(n log m), no hashing)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), bool)
    idx = np.minimum(np.searchsorted(sorted_arr, vals),
                     len(sorted_arr) - 1)
    return sorted_arr[idx] == vals


def _grid_pairs(points_ds, eps: int, id_col: str, x_col: str, y_col: str,
                pair_block: int):
    """Directed eps-neighbor pairs (a, b), a != b, d2 <= eps^2 — both
    directions present in the OUTPUT, but each unordered pair is
    COMPUTED exactly once (round-4 owner-pair halving): a point is
    OWNED by its (x//eps, y//eps) cell and VISITS only the 4
    half-neighborhood cells {E, NE, N, NW}, so each adjacent cell pair
    exchanges visitors in exactly one direction and each qualifying
    pair meets in exactly one group — within-cell pairs via a strict
    upper triangle over the owners, cross-cell pairs via owner x
    visitor. The kernel mirrors every hit, so downstream consumers
    see the same directed multiset as the old 3x3 both-directions
    replication at 5/9 the shuffle rows and half the distance
    evaluations (measured: q_dbscan 15.2 s -> ~9 s warm at sf0.1)."""
    eps2 = np.int64(eps) * np.int64(eps)

    def prep_owner(t: pa.Table) -> pa.Table:
        xi, yi = _ids(t, x_col), _ids(t, y_col)
        if len(xi) and (xi.min() < 0 or yi.min() < 0):
            raise ValueError("dbscan: coordinates must be non-negative")
        cell = (xi // eps + 1) * _PACK + (yi // eps + 1)
        return pa.table({"__cell": pa.array(cell, pa.int64()),
                         "__side": pa.array(np.zeros(t.num_rows, np.int8)),
                         "__id": t[id_col].cast(pa.int64()),
                         "__x": pa.array(xi, pa.int64()),
                         "__y": pa.array(yi, pa.int64())})

    def prep_visitor(t: pa.Table) -> pa.Table:
        xi, yi = _ids(t, x_col), _ids(t, y_col)
        n = t.num_rows
        cx, cy = xi // eps + 1, yi // eps + 1
        # half-neighborhood: one of each opposite-offset pair, so an
        # adjacent (C1, C2) meets in exactly one of the two cells
        dx = np.repeat(np.array([1, 1, 0, -1]), n)
        dy = np.repeat(np.array([0, 1, 1, 1]), n)
        nx, ny = np.tile(cx, 4) + dx, np.tile(cy, 4) + dy
        ok = nx >= 1  # grid is non-negative (cx, cy >= 1); no wrap
        src = np.tile(np.arange(n, dtype=np.int64), 4)[ok]
        take = pa.array(src, pa.int64())
        return pa.table({"__cell": pa.array(nx[ok] * _PACK + ny[ok], pa.int64()),
                         "__side": pa.array(np.ones(len(src), np.int8)),
                         "__id": t[id_col].take(take).cast(pa.int64()),
                         "__x": pa.array(xi[src], pa.int64()),
                         "__y": pa.array(yi[src], pa.int64())})

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})

    def join_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        ot = t.filter(pa.array(side == 0))
        vt = t.filter(pa.array(side == 1))
        n0 = ot.num_rows
        if n0 == 0:
            return empty  # visitors alone can't pair (owners own pairs)
        ox, oy, oid = _ids(ot, "__x"), _ids(ot, "__y"), _ids(ot, "__id")
        out = []

        def emit(a_ids: np.ndarray, b_ids: np.ndarray) -> None:
            # mirror: both directions from the single evaluation
            out.append(pa.table({
                "a": pa.array(np.concatenate([a_ids, b_ids]), pa.int64()),
                "b": pa.array(np.concatenate([b_ids, a_ids]), pa.int64())}))

        # within-cell: strict upper triangle over the owners
        if n0 >= 2:
            step = max(1, pair_block // n0)
            col = np.arange(n0, dtype=np.int64)
            for s in range(0, n0, step):
                e = min(n0, s + step)
                ddx = ox[s:e, None] - ox[None, :]
                ddy = oy[s:e, None] - oy[None, :]
                d2 = ddx * ddx + ddy * ddy
                ii, jj = np.nonzero((d2 <= eps2)
                                    & (col[s:e, None] < col[None, :]))
                if len(ii):
                    emit(oid[s + ii], oid[jj])
        # cross-cell: owners x visitors (each pair meets exactly here)
        if vt.num_rows:
            vx, vy, vid = _ids(vt, "__x"), _ids(vt, "__y"), _ids(vt, "__id")
            step = max(1, pair_block // max(1, len(vx)))
            for s in range(0, n0, step):
                e = min(n0, s + step)
                ddx = ox[s:e, None] - vx[None, :]
                ddy = oy[s:e, None] - vy[None, :]
                d2 = ddx * ddx + ddy * ddy
                ai, bi = np.nonzero(d2 <= eps2)
                if len(ai):
                    emit(oid[s + ai], vid[bi])
        return pa.concat_tables(out) if out else empty

    unioned = (points_ds.map_batches(prep_owner, batch_format="pyarrow")
               .union(points_ds.map_batches(prep_visitor,
                                            batch_format="pyarrow")))
    return (coalesced(unioned).groupby("__cell")
            .map_groups(join_group, batch_format="pyarrow"))


def _driver_min_label(a: np.ndarray, b: np.ndarray):
    """Vectorized min-label propagation with pointer jumping over a
    BOUNDED edge list (ids only, <= uf_cap rows by the caller's
    check): labels are indexes into the sorted node array, so the
    fixpoint is the min node id per component; each round is two
    ``np.minimum.at`` scatters + one jump, converging in
    O(log diameter) rounds. Returns (nodes, root_ids)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    s, d = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, s, lab[d])
        np.minimum.at(new, d, lab[s])
        new = new[new]  # pointer jump — labels only ever decrease
        if np.array_equal(new, lab):
            break
        lab = new
    return nodes, nodes[lab]


def dbscan(points_ds, eps: int, min_pts: int, id_col: str = "id",
           x_col: str = "xi", y_col: str = "yi",
           n_buckets: int = 32, pair_block: int = 1 << 22,
           uf_cap: int = 5_000_000, bcast_cap: int = 2_000_000):
    """DBSCAN(eps, min_pts) -> Dataset (id_col, label, role).

    ``label`` is the min core id of the cluster (int64), -1 for noise;
    ``role`` in {'core', 'border', 'noise'}. Coordinates must be
    non-negative int64; ``eps`` is in the same integer units.

    Core-component labeling is a capped dual (the dedup_minhash /
    pagerank pattern): at or below ``uf_cap`` core-core edge rows the
    ids-only edge list folds on the driver via vectorized min-label
    propagation (equivalence-tested against the distributed path);
    above it, ``components.connected_components`` runs its bucketed
    O(diameter)-round propagation.

    Joins around it make the dim_join broadcast decision ONCE, on the
    core-set size: at or below ``bcast_cap`` cores the sorted core-id
    / label arrays ship via ray.put and the a-AND-b edge semijoin,
    isolated-core detection and border-label lookup each run as one
    streamed pass over the pair list (zero extra exchanges); past the
    cap every step falls back to the bucketed ``dim_join``/
    ``hash_join`` plan. Both groupbys (neighbor counts, per-point min
    label) are pre-combined inside each block before their exchange.
    """
    if eps <= 0 or min_pts < 2:
        raise ValueError(f"dbscan: need eps > 0 and min_pts >= 2, "
                         f"got {eps}, {min_pts}")
    points = points_ds.map_batches(
        lambda t: pa.table({"pid": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow")
    pairs = _grid_pairs(points_ds, eps, id_col, x_col, y_col,
                        pair_block).materialize()

    import ray
    import ray.data as rd

    # core set: 1 + directed-neighbor count >= min_pts. The count is
    # PRE-COMBINED inside each pair block (a point's pairs concentrate
    # in <= 5 cell groups, so partials are ~5 rows per point), so the
    # exchange moves partial counts, never the 9x-bigger pair list.
    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["a"]).group_by(["a"]).aggregate([("a", "count")])
        return pa.table({"a": g["a"],
                         "n": g["a_count"].cast(pa.int64())})

    cores = (coalesced(pairs.map_batches(count_partial,
                                         batch_format="pyarrow"))
             .groupby("a").aggregate(Sum("n", alias_name="n"))
             .map_batches(lambda t: t.filter(
                 pa.compute.greater_equal(t["n"],
                                          pa.scalar(min_pts - 1)))
                 .select(["a"]), batch_format="pyarrow")
             .materialize())

    # components over core-core edges; isolated cores self-label.
    # Broadcast fast path (the dim_join decision, made once here for
    # the whole tail): while the CORE SET is dimension-small, ship the
    # sorted core-id array via ray.put and run the a-and-b semijoin as
    # ONE streamed pass over the pair list; past the cap, fall back to
    # the two bucketed semijoins.
    from .joins import dim_join

    sch_a = pa.schema([("a", pa.int64())])
    sch_b = pa.schema([("b", pa.int64())])
    sch_cid = pa.schema([("cid", pa.int64())])
    sch_lab = pa.schema([("cid", pa.int64()), ("label", pa.int64())])
    n_cores = cores.count()
    bcast = n_cores <= bcast_cap
    if bcast:
        chunks = [b["a"].to_numpy(zero_copy_only=False)
                  for b in cores.iter_batches(batch_format="pyarrow")]
        core_arr = np.sort(np.concatenate(chunks).astype(np.int64)
                           if chunks else np.empty(0, np.int64))
        core_ref = ray.put(core_arr)

        def edge_filter(t: pa.Table) -> pa.Table:
            ca = ray.get(core_ref)
            m = (_in_sorted(ca, _ids(t, "a"))
                 & _in_sorted(ca, _ids(t, "b")))
            return t.filter(pa.array(m))

        core_edges = pairs.map_batches(
            edge_filter, batch_format="pyarrow").materialize()
    else:
        core_edges = dim_join(
            dim_join(pairs, cores, on="a", how="left_semi",
                     n_buckets=n_buckets, right_schema=sch_a),
            cores.map_batches(lambda t: t.rename_columns(["b"]),
                              batch_format="pyarrow"),
            on="b", how="left_semi", n_buckets=n_buckets,
            right_schema=sch_b).materialize()

    cid_arr = lab_arr = None     # sorted (cid -> label) driver arrays
    if core_edges.count() <= uf_cap:
        cols = {"a": [], "b": []}
        for batch in core_edges.iter_batches(batch_format="pyarrow"):
            cols["a"].append(batch["a"].to_numpy(zero_copy_only=False))
            cols["b"].append(batch["b"].to_numpy(zero_copy_only=False))
        if cols["a"]:
            nodes, roots = _driver_min_label(
                np.concatenate(cols["a"]).astype(np.int64),
                np.concatenate(cols["b"]).astype(np.int64))
        else:
            nodes = roots = np.empty(0, np.int64)
        if bcast:
            # isolated cores computed ids-only on the driver: no
            # left_anti exchange needed while cores are dim-small
            lone = np.setdiff1d(core_arr, nodes)
            cid_arr = np.concatenate([nodes, lone])
            lab_arr = np.concatenate([roots, lone])
            order = np.argsort(cid_arr, kind="stable")
            cid_arr, lab_arr = cid_arr[order], lab_arr[order]
            # (the bcast tail consumes cid_arr/lab_arr directly — no
            # Dataset materialization of the label table needed here)
        else:
            comp_l = rd.from_arrow(pa.table({
                "cid": pa.array(nodes, pa.int64()),
                "label": pa.array(roots, pa.int64())}))
    else:
        comp = connected_components(core_edges, id_a="a", id_b="b",
                                    n_buckets=n_buckets)
        comp_l = comp.map_batches(
            lambda t: pa.table({"cid": t["id"].cast(pa.int64()),
                                "label": t["root"].cast(pa.int64())}),
            batch_format="pyarrow")
    if cid_arr is None:
        lonely = dim_join(
            cores.map_batches(lambda t: t.rename_columns(["cid"]),
                              batch_format="pyarrow"),
            comp_l.select_columns(["cid"]), on="cid", how="left_anti",
            n_buckets=n_buckets, right_schema=sch_cid).map_batches(
            lambda t: pa.table({"cid": t["cid"], "label": t["cid"]}),
            batch_format="pyarrow")
        core_labels = comp_l.union(lonely).materialize()
        if bcast:
            # label table has exactly n_cores rows <= bcast_cap: the
            # same bounded pull dim_join's broadcast side would make
            batches = list(core_labels.iter_batches(
                batch_format="pyarrow"))
            lt = pa.concat_tables(batches) if batches else pa.table(
                {"cid": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64())})
            cid_arr = lt["cid"].to_numpy(zero_copy_only=False)
            lab_arr = lt["label"].to_numpy(zero_copy_only=False)
            order = np.argsort(cid_arr, kind="stable")
            cid_arr = cid_arr[order].astype(np.int64)
            lab_arr = lab_arr[order].astype(np.int64)

    # point labels: min over core-neighbor labels, union cores' own.
    # Either path pre-combines the per-point min INSIDE each block
    # before the groupby, so the exchange is ~5 rows per point.
    if bcast:
        lab_ref = ray.put((cid_arr, lab_arr))

        def cand_min_partial(t: pa.Table) -> pa.Table:
            cid, lab = ray.get(lab_ref)
            p, b = _ids(t, "a"), _ids(t, "b")
            m = _in_sorted(cid, b)
            if not m.any():
                return pa.table({"p": pa.array([], pa.int64()),
                                 "label": pa.array([], pa.int64())})
            lb = lab[np.searchsorted(cid, b[m])]
            up, inv = np.unique(p[m], return_inverse=True)
            mn = np.full(len(up), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mn, inv, lb)
            return pa.table({"p": pa.array(up, pa.int64()),
                             "label": pa.array(mn, pa.int64())})

        cand = pairs.map_batches(cand_min_partial,
                                 batch_format="pyarrow")
        self_cand = rd.from_arrow(pa.table({
            "p": pa.array(cid_arr, pa.int64()),
            "label": pa.array(lab_arr, pa.int64())}))
    else:
        def min_partial(t: pa.Table) -> pa.Table:
            g = (t.select(["p", "label"]).group_by(["p"])
                 .aggregate([("label", "min")]))
            return pa.table({"p": g["p"], "label": g["label_min"]})

        cand = dim_join(
            pairs.map_batches(lambda t: pa.table({"p": t["a"],
                                                  "cid": t["b"]}),
                              batch_format="pyarrow"),
            core_labels, on="cid", n_buckets=n_buckets,
            right_schema=sch_lab).map_batches(
            lambda t: pa.table({"p": t["p"], "label": t["label"]}),
            batch_format="pyarrow").map_batches(
            min_partial, batch_format="pyarrow")
        self_cand = core_labels.map_batches(
            lambda t: pa.table({"p": t["cid"], "label": t["label"]}),
            batch_format="pyarrow")
    point_labels = (coalesced(cand.union(self_cand)).groupby("p")
                    .aggregate(Min("label", alias_name="label")))

    # assemble roles over ALL points
    lab = dim_join(
        points, point_labels.map_batches(
            lambda t: pa.table({"pid": t["p"], "label": t["label"]}),
            batch_format="pyarrow"),
        on="pid", how="left", n_buckets=n_buckets,
        right_schema=pa.schema([("pid", pa.int64()),
                                ("label", pa.int64())]))
    full = dim_join(
        lab, cores.map_batches(
            lambda t: pa.table({"pid": t["a"],
                                "corem": pa.array(
                                    np.ones(t.num_rows, np.int8))}),
            batch_format="pyarrow"),
        on="pid", how="left", n_buckets=n_buckets,
        right_schema=pa.schema([("pid", pa.int64()),
                                ("corem", pa.int8())]))

    def finish(t: pa.Table) -> pa.Table:
        is_core = pa.compute.fill_null(t["corem"], 0).to_numpy(
            zero_copy_only=False).astype(bool)
        has_label = pa.compute.is_valid(t["label"]).to_numpy(
            zero_copy_only=False)
        role = np.where(is_core, "core",
                        np.where(has_label, "border", "noise"))
        out_label = pa.compute.fill_null(
            t["label"].combine_chunks() if isinstance(
                t["label"], pa.ChunkedArray) else t["label"],
            pa.scalar(-1, pa.int64()))
        return pa.table({id_col: t["pid"],
                         "label": out_label,
                         "role": pa.array(role.astype(str),
                                          pa.string())})

    return full.map_batches(finish, batch_format="pyarrow")
