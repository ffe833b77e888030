"""Distributed connected components over an edge Dataset.

Used by the near-dedup keep-set (``dedup.dedup_minhash``): components
of the candidate-pair graph, keep the min-id representative. The
algorithm is iterative min-label propagation (the MapReduce-style
label propagation of Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the simple variant, which converges
in O(diameter) rounds; dedup-cluster diameters are tiny):

    labels(v) <- min(v, neighbors(v))
    repeat: labels(v) <- min(labels(v), min over edges (u,v) of labels(u))
    until sum(labels) stops decreasing  (labels only ever decrease, so
    an unchanged sum IS the fixed point)

Each round is one hash_join (edges x labels) + one groupby-min — both
on the PAIR graph, which is orders of magnitude smaller than the
corpus (only docs involved in >=1 candidate pair appear). Labels are
materialized per round so round N+1 does not re-execute rounds 1..N
through lineage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .joins import hash_join
from .util import coalesced


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         n_buckets: int = 64, max_iters: int = 64):
    """Edge Dataset (id_a, id_b) -> Dataset (id, root) for every node
    that appears in an edge; root = min node id of its component."""
    from ray.data.aggregate import Min

    def directed(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False)
        b = t[id_b].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = coalesced(pairs_ds.map_batches(directed, batch_format="pyarrow")).materialize()

    # initial labels: min over (self, direct neighbors)
    def self_rows(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "cand": t["src"]})

    def nbr_rows(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "cand": t["dst"]})

    labels = (edges.map_batches(self_rows, batch_format="pyarrow")
              .union(edges.map_batches(nbr_rows, batch_format="pyarrow"))
              .groupby("src").aggregate(Min("cand", alias_name="label"))
              .materialize())
    total = labels.sum("label")

    for _ in range(max_iters):
        # propagate: label(u) flows across each edge (u, v) as a
        # candidate for v, then min-reduce with the current labels
        prop = (hash_join(edges, labels, on="src", n_buckets=n_buckets)
                .map_batches(lambda t: pa.table({"src": t["dst"],
                                                 "cand": t["label"]}),
                             batch_format="pyarrow"))
        cur = labels.map_batches(lambda t: pa.table({"src": t["src"],
                                                     "cand": t["label"]}),
                                 batch_format="pyarrow")
        labels = (prop.union(cur).groupby("src")
                  .aggregate(Min("cand", alias_name="label")).materialize())
        new_total = labels.sum("label")
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")

    return labels.map_batches(
        lambda t: pa.table({"id": t["src"], "root": t["label"]}),
        batch_format="pyarrow")
