"""Iterative graph algorithms over edge Datasets.

``pagerank`` complements the label-propagation connected components
(stages/components.py) as the second iterative-graph family: rank mass
flows along edges for a fixed number of synchronous iterations. The
per-iteration shape is the canonical distributed PageRank: one
hash_join (attach each source's current rank + degree to its out
edges) and one groupby-sum (gather contributions per destination) —
two exchanges per iteration, each moving only (node, int64) pairs,
never payload columns.

All arithmetic is INTEGER: ranks live in ``scale`` fixed-point units,
contributions are ``r // deg`` and the update is
``base + damping_num * s // damping_den`` (floor division on
non-negative operands everywhere). Integer addition is associative, so
the distributed sums are order-independent and an unrolled SQL CTE
chain reproduces every iteration bit-for-bit — the same
quantize-for-the-oracle trick as ann.kmeans, but with NO rounding
ambiguity at all.

Reference analog: none (the reference has no iterative operators);
this extends SURVEY.md §2.8's scale family per the round-3 brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .joins import hash_join
from .util import coalesced

PR_SCALE = 10**12


def pagerank(edges_ds, iters: int = 3, damping_num: int = 85,
             damping_den: int = 100, scale: int = PR_SCALE,
             n_buckets: int = 64):
    """Fixed-iteration integer PageRank over a directed edge Dataset
    ``(src: int64, dst: int64)``.

    Every node must appear as a ``src`` at least once (true for
    symmetrized/undirected graphs — feed both edge directions); rank
    mass lost to truncation is not redistributed (deterministic, and
    mirrored exactly by the SQL oracle).

    Returns a Dataset ``(node: int64, r: int64)`` with ranks in
    ``scale`` fixed-point units after ``iters`` synchronous updates
    from the uniform start ``scale // n``.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from ray.data.aggregate import Count, Sum

    edges = coalesced(edges_ds).materialize()
    deg = (edges.groupby("src").aggregate(Count(alias_name="deg"))
           .materialize())
    n = deg.count()
    r0 = int(scale) // n
    base = ((damping_den - damping_num) * r0) // damping_den

    # attach degree to every edge ONCE; iterations only re-join ranks
    edges_deg = hash_join(edges, deg, on="src",
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
