"""Iterative graph algorithms over edge Datasets.

``pagerank`` complements the label-propagation connected components
(stages/components.py) as the second iterative-graph family: rank mass
flows along edges for a fixed number of synchronous iterations.

All arithmetic is INTEGER: ranks live in ``scale`` fixed-point units,
contributions are ``r // deg`` and the update is
``base + damping_num * s // damping_den`` (floor division on
non-negative operands everywhere). Integer addition is associative, so
the distributed sums are order-independent and an unrolled SQL CTE
chain reproduces every iteration bit-for-bit — the ann.kmeans
quantize-for-the-oracle trick, but with NO rounding ambiguity at all.

Execution is a capped dual (the stitch-label-attach pattern):

- ``n <= node_cap`` (default 5M): edges are exchanged ONCE — a
  groupby on ``bucket(dst)`` that also dedups pairs in-group — and
  stay stationary, partitioned by destination. Each iteration
  broadcasts the (node -> rank/degree) arrays via ``ray.put`` and
  runs ONE embarrassingly-parallel map over the edge blocks: because
  every edge of a destination lives in exactly one block, the
  in-block per-dst sums are already FINAL — an iteration has zero
  shuffles, and only bounded (node, int64) arrays cross the driver.
- above the cap: fully distributed — each iteration hash_joins the
  rank Dataset onto the edges and groupby-sums contributions (no
  driver-side state at any size), at the cost of re-exchanging the
  edge set per iteration.

Both paths compute the identical integer recurrence
(equivalence-tested in tests/test_round3.py).

Reference analog: none (the reference has no iterative operators);
this extends SURVEY.md §2.8's scale family per the round-3 brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config
from ..functions.hashing import bucket_of
from .joins import hash_join
from .util import arrow_table, coalesced

PR_SCALE = 10**12


def _bucket_by_dst(edges_ds, n_buckets: int, drop_dups: bool):
    """One exchange: bucket edges by dst hash so a destination's edges
    never span blocks (the stationary layout the broadcast path
    needs); with ``drop_dups`` the in-group kernel also removes
    duplicate (src, dst) pairs — WITHOUT it the multigraph is
    preserved exactly (each copy keeps contributing rank mass)."""
    def add_bucket(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return (t.select(["src", "dst"])
                .append_column("__b", pa.array(bucket_of(dst, n_buckets),
                                               pa.int64())))

    def group(df: pd.DataFrame) -> pa.Table:
        out = df[["src", "dst"]]
        if drop_dups:
            out = out.drop_duplicates(ignore_index=True)
        return arrow_table(out)

    return (coalesced(edges_ds.map_batches(add_bucket,
                                           batch_format="pyarrow"))
            .groupby("__b").map_groups(group, batch_format="pandas"))


def pagerank(edges_ds, iters: int = 3, damping_num: int = 85,
             damping_den: int = 100, scale: int = PR_SCALE,
             n_buckets: int | None = None, node_cap: int = 5_000_000,
             dedup: bool = False):
    """Fixed-iteration integer PageRank over a directed edge Dataset
    ``(src: int64, dst: int64)``.

    Every node must appear as a ``src`` at least once (true for
    symmetrized/undirected graphs — feed both edge directions); rank
    mass lost to truncation is not redistributed (deterministic, and
    mirrored exactly by the SQL oracle). ``dedup=True`` folds
    duplicate-pair removal into the setup exchange (multigraph input
    -> simple graph).

    Returns a Dataset ``(node: int64, r: int64)`` with ranks in
    ``scale`` fixed-point units after ``iters`` synchronous updates
    from the uniform start ``scale // n``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from ray.data.aggregate import Count

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    # the dst-bucket exchange is the (optional) dedup pass AND the
    # stationary layout for the broadcast path; the distributed dual
    # reuses it as its edge input
    edges = _bucket_by_dst(edges_ds, b, drop_dups=dedup).materialize()
    deg = (edges.groupby("src").aggregate(Count(alias_name="deg"))
           .materialize())
    n = deg.count()
    r0 = int(scale) // n
    base = ((damping_den - damping_num) * r0) // damping_den

    if n <= node_cap:
        return _pagerank_broadcast(edges, deg, n, r0, base, iters,
                                   damping_num, damping_den, b)
    return _pagerank_distributed(edges, deg, r0, base, iters,
                                 damping_num, damping_den, b)


def _pagerank_broadcast(edges, deg, n, r0, base, iters,
                        damping_num, damping_den, n_buckets):
    """Stationary-edges path: per iteration ONE map over the
    dst-partitioned edge blocks with the (ids, deg, ranks) arrays
    broadcast — in-block per-dst sums are final, so the per-iteration
    driver transfer is <= n (dst, sum) rows. Driver state is bounded
    by node_cap int64 triples."""
    import ray

    parts = [(b_["src"].to_numpy(zero_copy_only=False),
              b_["deg"].to_numpy(zero_copy_only=False))
             for b_ in deg.iter_batches(batch_format="pyarrow")]
    ids = np.concatenate([p[0] for p in parts])
    dg = np.concatenate([p[1] for p in parts])
    order = np.argsort(ids, kind="stable")
    ids, dg = ids[order], dg[order]
    ranks = np.full(n, r0, dtype=np.int64)

    for _ in range(iters):
        state = ray.put((ids, dg, ranks))

        def contrib(t: pa.Table, state=state) -> pa.Table:
            nid, d, r = ray.get(state)
            si = np.searchsorted(nid, t["src"].to_numpy(zero_copy_only=False))
            c = r[si] // d[si]
            dst = t["dst"].to_numpy(zero_copy_only=False)
            ud, inv = np.unique(dst, return_inverse=True)
            s = np.zeros(len(ud), dtype=np.int64)
            np.add.at(s, inv, c)
            return pa.table({"dst": pa.array(ud, pa.int64()),
                             "c": pa.array(s, pa.int64())})

        # batch_size=None keeps whole blocks, so a destination's
        # contributions are summed once per block; the driver
        # accumulates RAW sums and applies damping once at the end —
        # exact under floor division for any block layout
        gathered = edges.map_batches(contrib, batch_format="pyarrow",
                                     batch_size=None)
        acc = np.zeros(n, dtype=np.int64)
        for b_ in gathered.iter_batches(batch_format="pyarrow"):
            dst = b_["dst"].to_numpy(zero_copy_only=False)
            s = b_["c"].to_numpy(zero_copy_only=False)
            np.add.at(acc, np.searchsorted(ids, dst), s)
        ranks = base + (damping_num * acc) // damping_den

    return ray.data.from_arrow(pa.table({
        "node": pa.array(ids, pa.int64()),
        "r": pa.array(ranks, pa.int64())}))


def pagerank_weighted(edges_ds, iters: int = 3, damping_num: int = 85,
                      damping_den: int = 100, scale: int = PR_SCALE,
                      n_buckets: int | None = None,
                      node_cap: int = 5_000_000, w_col: str = "w"):
    """WEIGHTED integer PageRank over a directed edge Dataset
    ``(src, dst, w: int64 >= 1)`` — rank mass flows proportional to
    edge weight: each edge ROW contributes ``(r_src * w) // W_src``
    (``W_src`` = the source's total out-weight). Flooring PER EDGE
    keeps parallel-edge semantics explicit (two rows of weight w are
    NOT merged into one of 2w — floors differ) and makes the unrolled
    SQL mirror a verbatim ``sum((r * w) // W)``.

    Same capped dual and stationary dst-partitioned layout as
    ``pagerank`` (every dst's edges in one bucket, so in-block sums
    are final and a broadcast iteration has zero shuffles); the
    distributed path joins the rank Dataset per iteration. Guards:
    weights must be >= 1 (zero/negative weights break the invariant
    that every src has W >= out-degree) and ``scale * max_w`` must
    fit int64 (ValueError otherwise — lower ``scale`` for heavy
    weights). Returns ``(node, r)`` in ``scale`` fixed-point units.
    """
    import ray
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return (t.select(["src", "dst", w_col])
                .append_column("__b", pa.array(bucket_of(dst, b),
                                               pa.int64())))

    def regroup(df: pd.DataFrame) -> pa.Table:
        return arrow_table(df[["src", "dst", w_col]])

    edges = (coalesced(edges_ds.map_batches(add_bucket,
                                            batch_format="pyarrow"))
             .groupby("__b").map_groups(regroup, batch_format="pandas")
             .materialize())
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    bounds = edges.aggregate(_Min(w_col, alias_name="lo"),
                             _Max(w_col, alias_name="hi"))
    wmin, wmax = bounds["lo"], bounds["hi"]
    if wmin is None:
        raise ValueError("pagerank_weighted needs at least one edge")
    if wmin < 1:
        raise ValueError(f"edge weights must be >= 1, got min {wmin}")
    if int(scale) > (2**62) // int(wmax):
        raise ValueError(
            f"scale {scale} * max weight {wmax} risks int64 overflow — "
            "lower scale")

    W = (edges.groupby("src").aggregate(Sum(w_col, alias_name="W"))
         .materialize())
    n = W.count()
    r0 = int(scale) // n
    base = ((damping_den - damping_num) * r0) // damping_den

    if n <= node_cap:
        parts = [(b_["src"].to_numpy(zero_copy_only=False),
                  b_["W"].to_numpy(zero_copy_only=False))
                 for b_ in W.iter_batches(batch_format="pyarrow")]
        ids = np.concatenate([p[0] for p in parts])
        ws = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids, kind="stable")
        ids, ws = ids[order], ws[order]
        ranks = np.full(n, r0, dtype=np.int64)

        for _ in range(iters):
            state = ray.put((ids, ws, ranks))

            def contrib(t: pa.Table, state=state) -> pa.Table:
                nid, wv, r = ray.get(state)
                si = np.searchsorted(
                    nid, t["src"].to_numpy(zero_copy_only=False))
                w = t[w_col].to_numpy(zero_copy_only=False)
                c = (r[si] * w) // wv[si]
                dst = t["dst"].to_numpy(zero_copy_only=False)
                ud, inv = np.unique(dst, return_inverse=True)
                s = np.zeros(len(ud), dtype=np.int64)
                np.add.at(s, inv, c)
                return pa.table({"dst": pa.array(ud, pa.int64()),
                                 "c": pa.array(s, pa.int64())})

            gathered = edges.map_batches(contrib, batch_format="pyarrow",
                                         batch_size=None)
            acc = np.zeros(n, dtype=np.int64)
            for b_ in gathered.iter_batches(batch_format="pyarrow"):
                dst = b_["dst"].to_numpy(zero_copy_only=False)
                s = b_["c"].to_numpy(zero_copy_only=False)
                np.add.at(acc, np.searchsorted(ids, dst), s)
            ranks = base + (damping_num * acc) // damping_den

        return ray.data.from_arrow(pa.table({
            "node": pa.array(ids, pa.int64()),
            "r": pa.array(ranks, pa.int64())}))

    # distributed dual: ranks stay a Dataset; per iteration one
    # hash_join (ranks+W onto edges) + one groupby-sum
    edges_w = hash_join(edges, W, on="src", n_buckets=b).materialize()
    ranks_ds = W.map_batches(
        lambda t: pa.table({"src": t["src"],
                            "r": pa.array(np.full(t.num_rows, r0,
                                                  np.int64))}),
        batch_format="pyarrow")
    for _ in range(iters):
        joined = hash_join(edges_w, ranks_ds, on="src", n_buckets=b)

        def step(t: pa.Table) -> pa.Table:
            c = ((t["r"].to_numpy(zero_copy_only=False)
                  * t[w_col].to_numpy(zero_copy_only=False))
                 // t["W"].to_numpy(zero_copy_only=False))
            return pa.table({"dst": t["dst"],
                             "c": pa.array(c, pa.int64())})

        summed = (joined.map_batches(step, batch_format="pyarrow")
                  .groupby("dst").aggregate(Sum("c", alias_name="s")))
        ranks_ds = summed.map_batches(
            lambda t: pa.table({
                "src": t["dst"],
                "r": pa.array(base + (damping_num
                                      * t["s"].to_numpy(
                                          zero_copy_only=False))
                              // damping_den, pa.int64())}),
            batch_format="pyarrow").materialize()
    return ranks_ds.map_batches(
        lambda t: t.rename_columns(["node", "r"]),
        batch_format="pyarrow")


def _pagerank_distributed(edges_in, deg, r0, base, iters,
                          damping_num, damping_den, n_buckets):
    """No-driver-state dual: ranks stay a Dataset; each iteration is
    one hash_join (ranks onto edges) + one groupby-sum."""
    from ray.data.aggregate import Sum

    edges_deg = hash_join(edges_in, deg, on="src",
                          n_buckets=n_buckets).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"],
                         "r": pa.array(np.full(t.num_rows, r0, np.int64))})

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow")

    def contrib(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        d = t["deg"].to_numpy(zero_copy_only=False)
        return pa.table({"dst": t["dst"],
                         "c": pa.array(r // d, pa.int64())})

    def update(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        r = base + (damping_num * s) // damping_den
        return pa.table({"src": t["dst"],
                         "r": pa.array(r.astype(np.int64))})

    for _ in range(iters):
        gathered = (hash_join(edges_deg, ranks, on="src",
                              n_buckets=n_buckets)
                    .map_batches(contrib, batch_format="pyarrow")
                    .groupby("dst").aggregate(Sum("c", alias_name="s")))
        ranks = gathered.map_batches(update, batch_format="pyarrow")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "r"])

    return ranks.map_batches(rename, batch_format="pyarrow")


def _chunks(col) -> list:
    return col.chunks if isinstance(col, pa.ChunkedArray) else [col]


def _tri_wedges(edges_ds, u_col: str, v_col: str,
                n_buckets: int | None, bcast_cap: int, keep_ctr: bool):
    """Shared degree-oriented triangle plan (see triangle_count's
    docstring for the full rationale): normalize+dedup edges ->
    degree count -> endpoint-degree attach (broadcast under
    ``bcast_cap`` nodes, two hash_joins past it) -> orient -> wedge
    self-join -> strict (deg, id)-ordered wedge pairs. Returns
    ``(n_edges, n_nodes, deg, O, W)`` where ``W`` rows are candidate
    closing edges ``([ctr,] src, dst)`` — ``ctr`` (the wedge center,
    i.e. the triangle's third vertex) rides along only when
    ``keep_ctr`` so the count-only caller pays no extra column."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from .joins import distinct_rows

    def norm(t: pa.Table) -> pa.Table:
        a, b = t[u_col], t[v_col]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return (pa.table({"u": lo, "v": hi})
                .filter(pc.not_equal(lo, hi)))

    E = distinct_rows(edges_ds.map_batches(norm, batch_format="pyarrow"),
                      ["u", "v"], n_buckets).materialize()
    n_edges = E.count()

    def explode_nodes(t: pa.Table) -> pa.Table:
        arr = pa.chunked_array(_chunks(t["u"]) + _chunks(t["v"]),
                               type=t.schema.field("u").type)
        return pa.table({"node": arr})

    deg = (E.map_batches(explode_nodes, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .materialize())

    n_nodes = deg.count()
    if n_nodes <= bcast_cap:
        # broadcast degree attach: both endpoint degrees in ONE pass
        chunks = list(deg.iter_batches(batch_format="pyarrow"))
        dt = pa.concat_tables(chunks) if chunks else pa.table(
            {"node": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64())})
        nodes_a = dt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        degs_a = dt["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes_a, kind="stable")
        deg_ref = ray.put((nodes_a[order], degs_a[order]))

        def orient_bcast(t: pa.Table) -> pa.Table:
            nd, dg = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            du = dg[np.searchsorted(nd, u)]
            dv = dg[np.searchsorted(nd, v)]
            u_first = (du < dv) | ((du == dv) & (u < v))
            return pa.table({
                "src": pa.array(np.where(u_first, u, v), pa.int64()),
                "dst": pa.array(np.where(u_first, v, u), pa.int64()),
                "deg_dst": pa.array(np.where(u_first, dv, du),
                                    pa.int64())})

        O = E.map_batches(orient_bcast,
                          batch_format="pyarrow").materialize()
    else:
        withdeg = hash_join(
            hash_join(E,
                      deg.map_batches(
                          lambda t: t.rename_columns(["u", "deg_u"]),
                          batch_format="pyarrow"),
                      on="u", n_buckets=n_buckets),
            deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]),
                            batch_format="pyarrow"),
            on="v", n_buckets=n_buckets)

        def orient(t: pa.Table) -> pa.Table:
            du = t["deg_u"].cast(pa.int64())
            dv = t["deg_v"].cast(pa.int64())
            u_first = pc.or_(pc.less(du, dv),
                             pc.and_(pc.equal(du, dv),
                                     pc.less(t["u"], t["v"])))
            return pa.table({
                "src": pc.if_else(u_first, t["u"], t["v"]),
                "dst": pc.if_else(u_first, t["v"], t["u"]),
                "deg_dst": pc.if_else(u_first, dv, du)})

        O = withdeg.map_batches(orient,
                                batch_format="pyarrow").materialize()

    wedges = hash_join(
        O,
        O.map_batches(lambda t: t.rename_columns(["src", "dst2",
                                                  "deg_dst2"]),
                      batch_format="pyarrow"),
        on="src", n_buckets=n_buckets)

    def wedge_pairs(t: pa.Table) -> pa.Table:
        # strict (deg, id) order keeps ONE of the two join orders per
        # unordered out-neighbor pair (and drops dst == dst2 rows)
        d1 = t["deg_dst"].cast(pa.int64())
        d2 = t["deg_dst2"].cast(pa.int64())
        first = pc.or_(pc.less(d1, d2),
                       pc.and_(pc.equal(d1, d2),
                               pc.less(t["dst"], t["dst2"])))
        t2 = t.filter(first)
        if keep_ctr:
            return pa.table({"ctr": t2["src"], "src": t2["dst"],
                             "dst": t2["dst2"]})
        return pa.table({"src": t2["dst"], "dst": t2["dst2"]})

    W = wedges.map_batches(wedge_pairs, batch_format="pyarrow")
    return n_edges, n_nodes, deg, O, W


def triangle_count(edges_ds, u_col: str = "u", v_col: str = "v",
                   n_buckets: int | None = None,
                   bcast_cap: int = 2_000_000):
    """Exact triangle count of an undirected simple graph given as an
    edge Dataset (third graph family next to components/pagerank).

    Degree-ORIENTED join plan — the standard skew defense: every edge
    is directed from its lower (degree, id) endpoint to the higher, so
    every node's out-degree is O(sqrt(m)) and the wedge self-join can
    never explode on a hub the way a naive (u < v) plan does. Each
    triangle has exactly one node whose two oriented out-edges cover
    it, so every wedge is enumerated once (strict (deg, id) order
    between the two out-neighbors picks one of the two join orders)
    and closed by one left_semi join against the oriented edge set —
    the closing edge, when present, is stored in exactly the wedge's
    direction. Pipeline: normalize+dedup edges -> degree count -> two
    hash_joins to attach endpoint degrees -> orient (stateless map) ->
    wedge self-join on source -> closing-edge left_semi. Every
    exchange carries (id, id[, int64]) rows only.

    Capped broadcast duals (the dim_join decision, dbscan-style): at
    or below ``bcast_cap`` nodes the degree table ships once via
    ray.put and BOTH endpoint degrees attach in one streamed pass
    (vs two bucketed joins); at or below ``bcast_cap`` oriented edges
    the closing-edge check is a sorted-pair searchsorted probe (vs a
    bucketed semijoin). Past the caps each step falls back to its
    hash_join plan — same counts either way (equivalence-tested).

    Returns a 1-row pandas DataFrame (n_edges, n_triangles) — two
    driver-side scalars of distributed counts.
    """
    import ray

    n_edges, _, _, O, W = _tri_wedges(edges_ds, u_col, v_col,
                                      n_buckets, bcast_cap,
                                      keep_ctr=False)

    if n_edges <= bcast_cap:
        # broadcast closing-edge probe: the oriented edge set ships
        # once as a sorted structured (src, dst) array; each wedge
        # batch counts its closed wedges locally — no semijoin
        # exchange, and only per-block COUNTS reach the driver
        echunks = list(O.iter_batches(batch_format="pyarrow"))
        et = pa.concat_tables(echunks) if echunks else pa.table(
            {"src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64())})
        epairs = np.empty(et.num_rows,
                          dtype=[("s", np.int64), ("d", np.int64)])
        epairs["s"] = et["src"].to_numpy(zero_copy_only=False)
        epairs["d"] = et["dst"].to_numpy(zero_copy_only=False)
        epairs.sort()
        edge_ref = ray.put(epairs)

        def count_closed(t: pa.Table) -> pa.Table:
            ep = ray.get(edge_ref)
            w = np.empty(t.num_rows,
                         dtype=[("s", np.int64), ("d", np.int64)])
            w["s"] = t["src"].to_numpy(zero_copy_only=False)
            w["d"] = t["dst"].to_numpy(zero_copy_only=False)
            if len(ep):
                ix = np.minimum(np.searchsorted(ep, w), len(ep) - 1)
                hits = int((ep[ix] == w).sum())
            else:
                hits = 0
            return pa.table({"n": pa.array([hits], pa.int64())})

        n_tri = int(W.map_batches(count_closed, batch_format="pyarrow")
                    .sum("n") or 0)
    else:
        closed = hash_join(
            W,
            O.map_batches(lambda t: t.select(["src", "dst"]),
                          batch_format="pyarrow"),
            on=["src", "dst"], how="left_semi", n_buckets=n_buckets)
        n_tri = int(closed.count())
    return pd.DataFrame({"n_edges": [np.int64(n_edges)],
                         "n_triangles": [np.int64(n_tri)]})


CC_SCALE = 1_000_000


def clustering_coeff(edges_ds, u_col: str = "u", v_col: str = "v",
                     n_buckets: int | None = None,
                     bcast_cap: int = 2_000_000):
    """Per-node LOCAL clustering coefficient — the node-level dual of
    triangle_count and the standard cohesion feature of graph
    curation (ego-net density, spam/bot heuristics, community
    seeding). Shares the degree-oriented wedge plan (``_tri_wedges``)
    so it inherits the O(sqrt(m)) hub bound; the only addition is that
    the wedge CENTER rides the candidate rows, and each closed wedge
    credits all three of its vertices.

    Closing-edge check is the same capped dual as triangle_count:
    broadcast sorted-pair probe at or below ``bcast_cap`` oriented
    edges (per-batch (node, c) partials — the per-block combiner keeps
    the credit exchange node-bounded), bucketed left_semi hash_join
    past it. Triangle credits then attach to the degree table
    (deg >= 2 nodes only — one wedge minimum) the dim_join way:
    collected + ray.put under ``bcast_cap`` nodes, hash_join above.

    Output: ``(node, deg, tri_cnt, cc_ppm)`` — all int64, with
    ``cc_ppm = (2 * CC_SCALE * tri_cnt) // (deg * (deg - 1))``
    (parts-per-million coefficient; exact integer arithmetic, so the
    SQL mirror is bit-identical).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    n_edges, n_nodes, deg, O, W = _tri_wedges(edges_ds, u_col, v_col,
                                              n_buckets, bcast_cap,
                                              keep_ctr=True)

    def credit_partial(ctr, src, dst) -> pa.Table:
        nodes = np.concatenate([ctr, src, dst])
        un, cn = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "c": pa.array(cn.astype(np.int64), pa.int64())})

    if n_edges <= bcast_cap:
        echunks = list(O.iter_batches(batch_format="pyarrow"))
        et = pa.concat_tables(echunks) if echunks else pa.table(
            {"src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64())})
        epairs = np.empty(et.num_rows,
                          dtype=[("s", np.int64), ("d", np.int64)])
        epairs["s"] = et["src"].to_numpy(zero_copy_only=False)
        epairs["d"] = et["dst"].to_numpy(zero_copy_only=False)
        epairs.sort()
        edge_ref = ray.put(epairs)

        def closed_credits(t: pa.Table) -> pa.Table:
            ep = ray.get(edge_ref)
            w = np.empty(t.num_rows,
                         dtype=[("s", np.int64), ("d", np.int64)])
            w["s"] = t["src"].to_numpy(zero_copy_only=False)
            w["d"] = t["dst"].to_numpy(zero_copy_only=False)
            if len(ep) and len(w):
                ix = np.minimum(np.searchsorted(ep, w), len(ep) - 1)
                hit = ep[ix] == w
            else:
                hit = np.zeros(len(w), bool)
            return credit_partial(
                t["ctr"].to_numpy(zero_copy_only=False)[hit],
                w["s"][hit], w["d"][hit])

        credits = W.map_batches(closed_credits, batch_format="pyarrow")
    else:
        closed = hash_join(
            W,
            O.map_batches(lambda t: t.select(["src", "dst"]),
                          batch_format="pyarrow"),
            on=["src", "dst"], how="left_semi", n_buckets=n_buckets)

        def explode_credits(t: pa.Table) -> pa.Table:
            return credit_partial(
                t["ctr"].to_numpy(zero_copy_only=False),
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False))

        credits = closed.map_batches(explode_credits,
                                     batch_format="pyarrow")

    tri = credits.groupby("node").aggregate(Sum("c", alias_name="t"))

    def finish(node, dg, t) -> pa.Table:
        cc = (2 * CC_SCALE * t) // (dg * (dg - 1))
        return pa.table({"node": pa.array(node, pa.int64()),
                         "deg": pa.array(dg, pa.int64()),
                         "tri_cnt": pa.array(t, pa.int64()),
                         "cc_ppm": pa.array(cc, pa.int64())})

    deg2 = deg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["deg"].cast(pa.int64()), 2)),
        batch_format="pyarrow")

    if n_nodes <= bcast_cap:
        # triangle-credit table is node-bounded: collect once, probe
        # the degree blocks — zero additional exchanges
        rows = tri.take_all()
        tn = np.array([r["node"] for r in rows], np.int64)
        tv = np.array([r["t"] for r in rows], np.int64)
        order = np.argsort(tn, kind="stable")
        tri_ref = ray.put((tn[order], tv[order]))

        def attach(t: pa.Table) -> pa.Table:
            tn_, tv_ = ray.get(tri_ref)
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            dg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            tt = np.zeros(len(node), np.int64)
            if len(tn_) and len(node):
                ix = np.minimum(np.searchsorted(tn_, node), len(tn_) - 1)
                hit = tn_[ix] == node
                tt[hit] = tv_[ix[hit]]
            return finish(node, dg, tt)

        return deg2.map_batches(attach, batch_format="pyarrow")

    joined = hash_join(deg2, tri, on="node", how="left",
                       n_buckets=n_buckets)

    def fill(t: pa.Table) -> pa.Table:
        return finish(
            t["node"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["deg"].to_numpy(zero_copy_only=False).astype(np.int64),
            pc.fill_null(t["t"], 0).to_numpy(zero_copy_only=False)
            .astype(np.int64))

    return joined.map_batches(fill, batch_format="pyarrow")


def bfs_hops(edges_ds, sources, max_hops: int,
             n_buckets: int | None = None,
             edge_cap: int = 5_000_000):
    """Multi-source unweighted BFS over a directed edge Dataset
    ``(src: int64, dst: int64)``: returns ``(node, hops)`` with the
    MINIMUM hop count from any source, for every node within
    ``max_hops`` (sources themselves at hops 0). Fourth graph family
    next to components / pagerank / triangle_count; the engine analog
    of a bounded recursive-CTE traversal.

    ``sources`` is a driver-known seed array (the usual BFS contract:
    seeds are a query parameter, not data-scale).

    Capped dual (the pagerank pattern):

    - ``edges.count() <= edge_cap``: ZERO exchanges — the edge set is
      materialized once (no repartition; block layout is irrelevant
      because the driver unions per-block unique frontiers), and each
      hop is one embarrassingly-parallel map with the sorted frontier
      broadcast via ``ray.put``. Driver state (visited ids + hops) is
      bounded by the distinct-node count <= 2 * edge_cap.
    - above the cap: fully distributed — per hop one left_semi
      hash_join (frontier onto edges) + a distinct + a left_anti
      against the visited set; no driver-side node array at any size.

    Both paths compute the identical frontier sequence
    (equivalence-tested; BFS layers are set-valued, so there is no
    arithmetic-order concern at all).
    """
    import ray
    from .joins import distinct_rows

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    seeds = np.unique(np.asarray(list(sources), dtype=np.int64))
    if len(seeds) == 0:
        raise ValueError("bfs_hops needs at least one source node")

    edges = edges_ds.map_batches(lambda t: t.select(["src", "dst"]),
                                 batch_format="pyarrow").materialize()
    if edges.count() <= edge_cap:
        return _bfs_broadcast(edges, seeds, max_hops)
    return _bfs_distributed(edges, seeds, max_hops, b)


def _bfs_broadcast(edges, seeds: np.ndarray, max_hops: int):
    """Zero-exchange path: per hop one map over the stationary edge
    blocks (sorted frontier broadcast), per-block unique expansion,
    driver set-union. Per-hop driver transfer is <= the new layer's
    size per block (unique'd in the task, not on the driver)."""
    import ray

    visited = seeds.copy()          # sorted unique
    hops = np.zeros(len(seeds), dtype=np.int64)
    frontier = seeds
    for h in range(1, max_hops + 1):
        if len(frontier) == 0:
            break
        fref = ray.put(frontier)    # sorted by construction

        def expand(t: pa.Table, fref=fref) -> pa.Table:
            f = ray.get(fref)
            src = t["src"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(f, src)
            idx[idx == len(f)] = 0
            m = f[idx] == src
            ud = np.unique(t["dst"].to_numpy(zero_copy_only=False)[m])
            return pa.table({"dst": pa.array(ud, pa.int64())})

        parts = [b_["dst"].to_numpy(zero_copy_only=False)
                 for b_ in edges.map_batches(expand,
                                             batch_format="pyarrow",
                                             batch_size=None)
                 .iter_batches(batch_format="pyarrow")]
        cand = (np.unique(np.concatenate(parts)) if parts
                else np.array([], dtype=np.int64))
        # both sides unique -> exact set difference
        frontier = np.setdiff1d(cand, visited, assume_unique=True)
        order = np.argsort(np.concatenate([visited, frontier]),
                           kind="stable")
        hops = np.concatenate([hops,
                               np.full(len(frontier), h, np.int64)])[order]
        visited = np.concatenate([visited, frontier])[order]

    return ray.data.from_arrow(pa.table({
        "node": pa.array(visited, pa.int64()),
        "hops": pa.array(hops, pa.int64())}))


def _bfs_distributed(edges, seeds: np.ndarray, max_hops: int,
                     n_buckets: int):
    """No-driver-state dual: visited/frontier stay Datasets; each hop
    is one left_semi hash_join (edges x frontier) + distinct dsts +
    one left_anti against visited. 3 narrow exchanges per hop (only
    node ids ever cross), unbounded graph size."""
    import ray
    from .joins import distinct_rows

    def layer(ids: np.ndarray, h: int):
        return ray.data.from_arrow(pa.table({
            "node": pa.array(ids, pa.int64()),
            "hops": pa.array(np.full(len(ids), h, np.int64))}))

    visited = layer(seeds, 0).materialize()
    frontier = visited
    out = [visited]
    for h in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        nbrs = hash_join(
            edges.map_batches(lambda t: t.rename_columns(["node", "dst"]),
                              batch_format="pyarrow"),
            frontier.map_batches(lambda t: t.select(["node"]),
                                 batch_format="pyarrow"),
            on="node", how="left_semi", n_buckets=n_buckets)
        cand = distinct_rows(
            nbrs.map_batches(lambda t: pa.table({"node": t["dst"]}),
                             batch_format="pyarrow"), n_buckets=n_buckets)
        fresh = hash_join(
            cand, visited.map_batches(lambda t: t.select(["node"]),
                                      batch_format="pyarrow"),
            on="node", how="left_anti", n_buckets=n_buckets)
        frontier = fresh.map_batches(
            lambda t, h=h: t.append_column(
                "hops", pa.array(np.full(t.num_rows, h, np.int64))),
            batch_format="pyarrow").materialize()
        out.append(frontier)
        visited = visited.union(frontier).materialize()

    res = out[0]
    for d in out[1:]:
        res = res.union(d)
    return res


def assortativity(edges_ds, u_col: str = "u", v_col: str = "v",
                  n_buckets: int | None = None,
                  bcast_cap: int = 2_000_000):
    """Degree assortativity coefficient of an undirected simple graph
    — the Pearson correlation between the endpoint degrees of every
    edge (Newman's r): positive = hubs link hubs, negative = hub-leaf
    (the disassortative signature of web/co-purchase graphs). The
    graph-level summary statistic beside the per-node
    clustering_coeff.

    Reuses the triangle-plan front (normalize+dedup + degree count +
    capped broadcast/hash_join degree attach via ``_tri_wedges``'s
    shape): per-batch int64 moment partials over the SYMMETRIZED
    (deg_u, deg_v) pairs (each undirected edge contributes both
    orders, the standard convention), one scalar reduce, Pearson in
    the one shared float expression of grouped_corr.

    Returns a 1-row pandas DataFrame ``(n_edges, r: float64
    UNROUNDED)``; graphs with zero degree variance yield r = 0.0.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Sum

    from .joins import distinct_rows

    def norm(t: pa.Table) -> pa.Table:
        a, b = t[u_col], t[v_col]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return (pa.table({"u": lo, "v": hi})
                .filter(pc.not_equal(lo, hi)))

    E = distinct_rows(edges_ds.map_batches(norm, batch_format="pyarrow"),
                      ["u", "v"], n_buckets).materialize()
    n_edges = E.count()

    def explode_nodes(t: pa.Table) -> pa.Table:
        arr = pa.chunked_array(_chunks(t["u"]) + _chunks(t["v"]),
                               type=t.schema.field("u").type)
        return pa.table({"node": arr})

    deg = (E.map_batches(explode_nodes, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .materialize())

    if deg.count() <= bcast_cap:
        chunks = list(deg.iter_batches(batch_format="pyarrow"))
        dt = pa.concat_tables(chunks) if chunks else pa.table(
            {"node": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64())})
        nodes_a = dt["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        degs_a = dt["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes_a, kind="stable")
        deg_ref = ray.put((nodes_a[order], degs_a[order]))

        def attach(t: pa.Table) -> pa.Table:
            nd, dg = ray.get(deg_ref)
            u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            du = dg[np.searchsorted(nd, u)]
            dv = dg[np.searchsorted(nd, v)]
            return pa.table({"du": pa.array(du, pa.int64()),
                             "dv": pa.array(dv, pa.int64())})

        pairs = E.map_batches(attach, batch_format="pyarrow")
    else:
        withdeg = hash_join(
            hash_join(E,
                      deg.map_batches(
                          lambda t: t.rename_columns(["u", "deg_u"]),
                          batch_format="pyarrow"),
                      on="u", n_buckets=n_buckets),
            deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]),
                            batch_format="pyarrow"),
            on="v", n_buckets=n_buckets)
        pairs = withdeg.map_batches(
            lambda t: pa.table({"du": t["deg_u"].cast(pa.int64()),
                                "dv": t["deg_v"].cast(pa.int64())}),
            batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        du = t["du"].to_numpy(zero_copy_only=False)
        dv = t["dv"].to_numpy(zero_copy_only=False)
        # symmetrize: each edge contributes (du, dv) AND (dv, du)
        x = np.concatenate([du, dv]).astype(np.int64)
        y = np.concatenate([dv, du]).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    m = (pairs.map_batches(moments, batch_format="pyarrow")
         .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                    Sum("sxx", alias_name="sxx"),
                    Sum("sxy", alias_name="sxy")))
    n = float(m["n"] or 0)
    sx = float(m["sx"] or 0)
    sxx = float(m["sxx"] or 0)
    sxy = float(m["sxy"] or 0)
    # symmetric pairs: Sy == Sx, Syy == Sxx
    var = n * sxx - sx * sx
    r = (n * sxy - sx * sx) / var if var > 0 else 0.0
    return pd.DataFrame({"n_edges": [np.int64(n_edges)],
                         "r": [np.float64(r)]})


def sssp(edges_ds, sources, rounds: int,
         n_buckets: int | None = None, edge_cap: int = 5_000_000):
    """Bounded-round single-source(-set) shortest paths over a
    directed WEIGHTED edge Dataset ``(src, dst, w: int64 >= 0)`` —
    synchronous Bellman-Ford: after ``rounds`` relaxation rounds every
    node carries the exact minimum path weight reachable in <= rounds
    edges (seeds at 0). Sixth graph family next to components /
    pagerank / triangles / BFS / k-core; the weighted generalization
    of ``bfs_hops``. All arithmetic is int64 min-plus — associative
    and order-free, so the unrolled per-round SQL mirror (one
    min-aggregate CTE per round, NO path enumeration) is bit-exact.

    Parallel edges collapse to their minimum weight in one setup
    exchange (per-batch combiner first). Capped dual (the bfs/pagerank
    pattern):

    - ``<= edge_cap`` distinct edges: the edge arrays materialize once
      on the driver; each round is one vectorized relaxation
      (searchsorted membership + np.minimum.at) — zero per-round
      exchanges, driver state bounded by the distinct-node count.
    - above the cap: dist stays a Dataset; each round is one
      hash_join (dist onto edges by src) + a union with the previous
      dist + one groupby-min. No driver-side node array at any size.

    Both paths compute the identical synchronous recurrence
    (equivalence-tested). Returns ``(node, dist)`` for reached nodes.
    """
    import ray
    from ray.data.aggregate import Min

    from .util import coalesced

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    seeds = np.unique(np.asarray(list(sources), dtype=np.int64))
    if len(seeds) == 0:
        raise ValueError("sssp needs at least one source node")

    def pre(t: pa.Table) -> pa.Table:
        import polars as pl
        src = t["src"].to_numpy(zero_copy_only=False)
        df = (pl.DataFrame({
            "src": src,
            "dst": t["dst"].to_numpy(zero_copy_only=False),
            "w": t["w"].to_numpy(zero_copy_only=False)})
            .group_by(["src", "dst"]).agg(pl.col("w").min()))
        s = df["src"].to_numpy().astype(np.int64)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(df["dst"].to_numpy(), pa.int64()),
                         "w": pa.array(df["w"].to_numpy(), pa.int64()),
                         "__b": pa.array(bucket_of(s, b), pa.int64())})

    def group_min(df: pd.DataFrame) -> pa.Table:
        g = (df.groupby(["src", "dst"], as_index=False, sort=False)["w"]
             .min())
        return pa.table({"src": pa.array(g["src"].to_numpy(), pa.int64()),
                         "dst": pa.array(g["dst"].to_numpy(), pa.int64()),
                         "w": pa.array(g["w"].to_numpy(), pa.int64())})

    # bucket-of-src exchange instead of a sort-based 2-key groupby:
    # 2x fewer comparisons on the wide step (the pagerank setup shape);
    # a (src, dst) pair lands in exactly one bucket, so the in-group
    # pandas min is the exact global min
    edges = (coalesced(edges_ds.map_batches(pre, batch_format="pyarrow"))
             .groupby("__b").map_groups(group_min, batch_format="pandas")
             .materialize())

    if edges.count() <= edge_cap:
        chunks = list(edges.iter_batches(batch_format="pyarrow"))
        et = (pa.concat_tables(chunks) if chunks else
              pa.table({"src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64())}))
        es = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        ed = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ew = et["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(es, kind="stable")
        es, ed, ew = es[order], ed[order], ew[order]

        nodes = seeds.copy()
        dist = np.zeros(len(seeds), np.int64)
        for _ in range(rounds):
            if len(es):
                ix = np.minimum(np.searchsorted(nodes, es),
                                len(nodes) - 1)
                hit = nodes[ix] == es
                cd = dist[ix[hit]] + ew[hit]
                cn = ed[hit]
                un, inv = np.unique(cn, return_inverse=True)
                best = np.full(len(un), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(best, inv, cd)
            else:
                un = np.empty(0, np.int64)
                best = np.empty(0, np.int64)
            allan = np.union1d(nodes, un)
            nd = np.full(len(allan), np.iinfo(np.int64).max, np.int64)
            pos = np.searchsorted(allan, nodes)
            nd[pos] = dist
            pos2 = np.searchsorted(allan, un)
            nd[pos2] = np.minimum(nd[pos2], best)
            nodes, dist = allan, nd
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "dist": pa.array(dist, pa.int64())}))

    dist_ds = ray.data.from_arrow(pa.table({
        "node": pa.array(seeds, pa.int64()),
        "dist": pa.array(np.zeros(len(seeds), np.int64), pa.int64())}))
    for _ in range(rounds):
        relaxed = hash_join(
            edges.map_batches(lambda t: t.rename_columns(
                ["node", "dst", "w"]), batch_format="pyarrow"),
            dist_ds, on="node", n_buckets=b)

        def step(t: pa.Table) -> pa.Table:
            d = (t["dist"].to_numpy(zero_copy_only=False)
                 + t["w"].to_numpy(zero_copy_only=False))
            return pa.table({"node": t["dst"],
                             "dist": pa.array(d, pa.int64())})

        dist_ds = (relaxed.map_batches(step, batch_format="pyarrow")
                   .union(dist_ds)
                   .groupby("node")
                   .aggregate(Min("dist", alias_name="dist"))
                   .materialize())
    return dist_ds


def _ra_wedges(o: np.ndarray, p: np.ndarray, quant: int,
               max_hub_degree: int) -> tuple[pa.Table, int]:
    """Wedge generation for one hash(hub) bucket: dedup (hub, item)
    edges, compute hub degrees, emit one combined (pair-key, Σweight,
    count) row per distinct item pair. Hubs whose (post-dedup) degree
    exceeds ``max_hub_degree`` are DROPPED — returns the dropped-hub
    count so callers can log it (never a silent cap). Module-level so
    the planted power-law-hub test can assert the bound directly.

    Id-width contract (validated by the caller): hub ids and item ids
    must be in [0, 2^32) and item ids in [0, 2^31) — hubs pack with
    items into a uint64 dedup key, and the item pair packs as
    ``p1 * 2^32 + p2`` into a SIGNED int64 groupby key."""
    key = (o.astype(np.uint64) << np.uint64(32)) | p.astype(np.uint64)
    uniq = np.unique(key)
    o = (uniq >> np.uint64(32)).astype(np.int64)
    p = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
    new_o = np.concatenate(([True], o[1:] != o[:-1]))
    starts = np.flatnonzero(new_o)
    sizes = np.diff(np.append(starts, len(o))).astype(np.int64)
    n_dropped = int((sizes > max_hub_degree).sum())
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "wt": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    ks, ws = [], []
    for g in np.unique(sizes):
        if g < 2 or g > max_hub_degree:
            continue
        base = starts[sizes == g]
        iu, ju = np.triu_indices(int(g), 1)
        p1 = p[(base[:, None] + iu[None, :]).ravel()]
        p2 = p[(base[:, None] + ju[None, :]).ravel()]
        ks.append(p1 * (np.int64(1) << np.int64(32)) + p2)
        ws.append(np.full(len(p1), quant // int(g), np.int64))
    if not ks:
        return empty, n_dropped
    # in-kernel combiner: same-pair wedges from this bucket's
    # hubs collapse before the exchange
    k = np.concatenate(ks)
    w = np.concatenate(ws)
    uk, inv = np.unique(k, return_inverse=True)
    sw = np.zeros(len(uk), np.int64)
    cn = np.zeros(len(uk), np.int64)
    np.add.at(sw, inv, w)
    np.add.at(cn, inv, 1)
    return pa.table({"k": pa.array(uk, pa.int64()),
                     "wt": pa.array(sw, pa.int64()),
                     "cnt": pa.array(cn, pa.int64())}), n_dropped


def ra_link_scores(edges_ds, hub_col: str = "o", item_col: str = "p",
                   topk: int = 50, quant: int = 1_000_000_000,
                   n_buckets: int | None = None,
                   max_hub_degree: int = 4096):
    """Resource-allocation link-prediction scores over a bipartite
    (hub, item) edge set — the fifth graph family: for every item
    pair sharing >= 1 hub, ``ra_q = Σ_hubs quant // deg(hub)`` (Zhou
    et al.'s RA index with an integer weight so the score is
    SQL-bit-exact), plus the common-hub count. High scores predict
    missing item-item links (co-occurrence normalized by hub
    promiscuity).

    Scale shape: ONE bucketed exchange on hash(hub) co-locates each
    hub's items, and a single per-bucket kernel does edge dedup,
    degree computation AND wedge generation (grouped by run length,
    vectorized per group-size class). Then ONE bucketed exchange on
    hash(pair key) whose kernel both sums the partials and keeps a
    tie-free partial top-k (every instance of a pair key lands in the
    same bucket, so the in-bucket sums are final and top-``topk`` by
    the total order (ra_q desc, p1, p2) per bucket then globally is
    exact); <= topk rows per bucket reach the bounded driver merge.
    Two exchanges total — the earlier global groupby-sum sorted the
    full wedge table for a ~0.3% reduction (measured 7.8 s of the
    9.4 s query at sf0.1; the bucketed kernel does it in ~1 s).

    Skew contract, ENFORCED: wedge volume per hub is deg*(deg-1)/2,
    so one power-law hub (a mega-order, a viral item) would emit
    deg^2/2 rows inside a single bucket kernel. Hubs whose deduped
    degree exceeds ``max_hub_degree`` are dropped with a logged count
    (the no-silent-caps rule) — an RA weight of quant // deg is < 1
    ulp of signal for huge hubs anyway (quant//10^6 = 1000 of 10^9).
    Default 4096 bounds any one hub to ~8.4M wedge rows.

    Id-width contract, validated: hub/item ids in [0, 2^32), item ids
    in [0, 2^31) — see _ra_wedges. Raises ValueError otherwise.

    Output: pandas (p1, p2, ra_q, n_common), p1 < p2, ordered by
    (ra_q desc, p1, p2), top ``topk``.
    """
    import pandas as pd

    from .util import coalesced

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        o = t[hub_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(o) and (int(o.min()) < 0 or int(o.max()) >= 1 << 32):
            raise ValueError("ra_link_scores: hub ids must be in [0, 2^32)")
        if len(p) and (int(p.min()) < 0 or int(p.max()) >= 1 << 31):
            raise ValueError("ra_link_scores: item ids must be in [0, 2^31)")
        return pa.table({"o": pa.array(o, pa.int64()),
                         "p": pa.array(p, pa.int64()),
                         "__b": pa.array(bucket_of(o, b), pa.int64())})

    def wedge_kernel(df: pd.DataFrame) -> pa.Table:
        out, n_dropped = _ra_wedges(df["o"].to_numpy(), df["p"].to_numpy(),
                                    quant, max_hub_degree)
        if n_dropped:
            print(f"ra_link_scores: dropped {n_dropped} hubs with degree "
                  f"> {max_hub_degree} (bucket {int(df['__b'].iloc[0])})")
        # route each pair partial to its hash(pair-key) bucket: the
        # next exchange is bucketed, never a global sort
        return out.append_column(
            "__kb", pa.array(bucket_of(
                out["k"].to_numpy(zero_copy_only=False), b), pa.int64()))

    wedges = (coalesced(edges_ds.map_batches(add_bucket,
                                             batch_format="pyarrow"))
              .groupby("__b").map_groups(wedge_kernel,
                                         batch_format="pandas"))

    def sum_topk_kernel(t: pa.Table) -> pa.Table:
        # ALL partials of a pair key are in this bucket, so the sums
        # are final; keys are then unique, so (ra_q desc, k asc) is a
        # total order and a per-bucket top-k is exact (the
        # ann.brute_force_topk partial-top-k pattern)
        k = t["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        uk, start = np.unique(ks, return_index=True)
        ra = np.add.reduceat(
            t["wt"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[order], start) if len(ks) else \
            np.empty(0, np.int64)
        nc = np.add.reduceat(
            t["cnt"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[order], start) if len(ks) else \
            np.empty(0, np.int64)
        keep = np.lexsort((uk, -ra))[:topk]
        return pa.table({"p1": pa.array(uk[keep] >> 32, pa.int64()),
                         "p2": pa.array(uk[keep] & 0xFFFFFFFF, pa.int64()),
                         "ra_q": pa.array(ra[keep], pa.int64()),
                         "n_common": pa.array(nc[keep], pa.int64())})

    scores = (coalesced(wedges).groupby("__kb")
              .map_groups(sum_topk_kernel, batch_format="pyarrow"))

    # bounded driver merge: <= topk rows per bucket reach the driver
    out = (scores.to_pandas()
           .sort_values(["ra_q", "p1", "p2"],
                        ascending=[False, True, True])
           .head(topk).reset_index(drop=True))
    return out


def kcore(edges_ds, k: int, node_cap: int = 5_000_000,
          max_rounds: int = 16, n_buckets: int | None = None,
          dedup: bool = False):
    """Nodes of the k-core of an undirected graph — iterative peel:
    repeatedly drop nodes whose degree (over surviving edges) is
    below ``k`` until a fixpoint. The graph-curation primitive for
    spam/fringe trimming (keep only the densely-connected core).

    Input: directed edge Dataset ``(src, dst)`` with BOTH directions
    present (the pagerank convention); ``dedup=True`` folds
    duplicate-pair removal into the setup exchange. Output:
    ``(node: int64, deg: int64)`` — the surviving nodes with their
    in-core degrees. Raises if the peel has not converged within
    ``max_rounds`` (the SQL oracle unrolls a fixed round count, so
    convergence within it is part of the contract).

    Capped dual (the pagerank shape):
    - ``n <= node_cap``: ONE dst-bucket exchange makes edge blocks
      stationary; each round is one zero-shuffle map over the edge
      blocks with the sorted alive-node array broadcast via ray.put
      (in-block per-dst degree sums are final), and only bounded
      (node, int64) arrays cross the driver.
    - above the cap: fully distributed — each round semi-joins the
      ORIGINAL edge set against the current alive Dataset on both
      endpoints and re-counts degrees (peeling is monotone, so
      re-filtering from the full set is exact); no driver-side node
      state at any size.
    Both paths compute the identical fixpoint (equivalence-tested).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import ray
    from ray.data.aggregate import Count

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    edges = _bucket_by_dst(edges_ds, b, drop_dups=dedup).materialize()
    deg = (edges.groupby("dst").aggregate(Count(alias_name="deg"))
           .materialize())
    n = deg.count()

    if n <= node_cap:
        parts = [(b_["dst"].to_numpy(zero_copy_only=False),
                  b_["deg"].to_numpy(zero_copy_only=False))
                 for b_ in deg.iter_batches(batch_format="pyarrow")]
        ids = np.concatenate([p[0] for p in parts]) if parts else \
            np.empty(0, np.int64)
        dg = np.concatenate([p[1] for p in parts]) if parts else \
            np.empty(0, np.int64)
        order = np.argsort(ids, kind="stable")
        ids, dg = ids[order], dg[order]
        alive = dg >= k          # round 0 uses the full-graph degrees
        cur_deg = dg
        for _ in range(max_rounds):
            if not alive.any():
                break
            aref = ray.put(ids[alive])

            def deg_map(t: pa.Table, aref=aref) -> pa.Table:
                av = ray.get(aref)
                s = t["src"].to_numpy(zero_copy_only=False)
                d = t["dst"].to_numpy(zero_copy_only=False)
                si = np.searchsorted(av, s).clip(0, max(len(av) - 1, 0))
                di = np.searchsorted(av, d).clip(0, max(len(av) - 1, 0))
                keep = (av[si] == s) & (av[di] == d) if len(av) else \
                    np.zeros(len(s), bool)
                ud, cnt = np.unique(d[keep], return_counts=True)
                return pa.table({"dst": pa.array(ud, pa.int64()),
                                 "c": pa.array(cnt.astype(np.int64),
                                               pa.int64())})

            acc = np.zeros(len(ids), dtype=np.int64)
            for b_ in (edges.map_batches(deg_map, batch_format="pyarrow",
                                         batch_size=None)
                       .iter_batches(batch_format="pyarrow")):
                dst = b_["dst"].to_numpy(zero_copy_only=False)
                c = b_["c"].to_numpy(zero_copy_only=False)
                np.add.at(acc, np.searchsorted(ids, dst), c)
            new_alive = acc >= k
            cur_deg = acc
            if (new_alive == alive).all():
                alive = new_alive
                sel = alive
                return ray.data.from_arrow(pa.table({
                    "node": pa.array(ids[sel], pa.int64()),
                    "deg": pa.array(cur_deg[sel], pa.int64())}))
            alive = new_alive
        if not alive.any():
            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64())}))
        raise ValueError(
            f"kcore: no fixpoint within max_rounds={max_rounds}")

    # distributed dual: re-filter the ORIGINAL edges against the
    # current alive set each round (2 semijoins + 1 count exchange)
    from .joins import hash_join

    alive_ds = (deg.filter(expr=f"deg >= {int(k)}")
                .map_batches(lambda t: t.select(["dst"])
                             .rename_columns(["node"]),
                             batch_format="pyarrow").materialize())
    n_alive = alive_ds.count()
    for _ in range(max_rounds):
        if n_alive == 0:
            break
        nodes_u = alive_ds.map_batches(
            lambda t: t.rename_columns(["src"]), batch_format="pyarrow")
        nodes_v = alive_ds.map_batches(
            lambda t: t.rename_columns(["dst"]), batch_format="pyarrow")
        kept = hash_join(
            hash_join(edges, nodes_u, on="src", how="left_semi",
                      n_buckets=b),
            nodes_v, on="dst", how="left_semi", n_buckets=b)
        deg2 = (kept.groupby("dst").aggregate(Count(alias_name="deg"))
                .materialize())
        nxt = (deg2.filter(expr=f"deg >= {int(k)}")
               .map_batches(lambda t: t.select(["dst"])
                            .rename_columns(["node"]),
                            batch_format="pyarrow").materialize())
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            return deg2.filter(expr=f"deg >= {int(k)}").map_batches(
                lambda t: pa.table({"node": t["dst"], "deg": t["deg"]}),
                batch_format="pyarrow")
        alive_ds, n_alive = nxt, n_nxt
    if n_alive == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64())}))
    raise ValueError(f"kcore: no fixpoint within max_rounds={max_rounds}")
