"""Distributed connected components over an edge Dataset.

Used by the near-dedup keep-set (``dedup.dedup_minhash``): components
of the candidate-pair graph, keep the min-id representative. The
algorithm is iterative min-label propagation (the MapReduce-style
label propagation of Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the simple variant, which converges
in O(diameter) rounds; dedup-cluster diameters are tiny):

    labels(v) <- min(v, neighbors(v))
    repeat: labels(v) <- min(labels(v), min over edges (u,v) of labels(u))
    until the label checksum stops changing (labels only ever decrease,
    so an unchanged checksum IS the fixed point; see _label_checksum)

Each round is one hash_join (edges x labels) + one groupby-min — both
on the PAIR graph, which is orders of magnitude smaller than the
corpus (only docs involved in >=1 candidate pair appear). Labels are
materialized per round so round N+1 does not re-execute rounds 1..N
through lineage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from .joins import hash_join
from .util import coalesced


def _label_checksum(labels_ds) -> tuple[int, int]:
    """Fixpoint detector that works for int AND string node ids and
    cannot overflow: sum of 64-bit avalanched label hashes, carried as
    two exact 32-bit-partial int64 sums (each < 2^63 for < 2^31 rows
    per block aggregate). Labels only ever decrease, so an unchanged
    checksum is the fixed point up to a 2^-64 hash-sum collision per
    round (replaces the raw sum(label), which overflowed for 63-bit
    int ids and did not exist for string ids)."""
    def h(t: pa.Table) -> pa.Table:
        col = t["label"]
        if pa.types.is_integer(col.type):
            v = splitmix64(
                col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            import polars as pl
            v = splitmix64(
                pl.from_arrow(col.combine_chunks()
                              if isinstance(col, pa.ChunkedArray) else col)
                .hash(seed=7).to_numpy().astype(np.uint64))
        return pa.table({
            "lo": pa.array((v & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            "hi": pa.array((v >> np.uint64(32)).astype(np.int64)),
        })

    s = labels_ds.map_batches(h, batch_format="pyarrow").sum(["lo", "hi"])
    return (s["sum(lo)"], s["sum(hi)"])


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         n_buckets: int = 64, max_iters: int = 64):
    """Edge Dataset (id_a, id_b) -> Dataset (id, root) for every node
    that appears in an edge; root = min node id of its component.
    Node ids keep their native Arrow type (int64 corpora and string
    doc-id corpora both work; "min" is the type's natural order)."""
    from ray.data.aggregate import Min

    def directed(t: pa.Table) -> pa.Table:
        a = t[id_a].combine_chunks() if isinstance(t[id_a], pa.ChunkedArray) else t[id_a]
        b = t[id_b].combine_chunks() if isinstance(t[id_b], pa.ChunkedArray) else t[id_b]
        return pa.table({
            "src": pa.chunked_array([a, b]),
            "dst": pa.chunked_array([b, a]),
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
    total = _label_checksum(labels)

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
        new_total = _label_checksum(labels)
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")

    return labels.map_batches(
        lambda t: pa.table({"id": t["src"], "root": t["label"]}),
        batch_format="pyarrow")
