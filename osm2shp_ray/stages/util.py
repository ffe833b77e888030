"""Shared stage utilities."""

from __future__ import annotations


def arrow_table(df) -> "object":
    """pandas group-kernel output -> Arrow block. Group kernels that
    return pandas leave pandas-backed blocks in the stream; when those
    feed another sort-shuffle, Ray unifies mixed pandas/arrow schemas
    per reduce task (the bench-tail 'Failed to hash the schemas' /
    'RefBundle with a different schema' warnings). Uniform Arrow
    blocks keep schema unification trivial. The b'pandas' schema
    metadata from_pandas attaches is stripped: ANY schema metadata
    makes pa.Schema unhashable (metadata is a dict), which is exactly
    the 'Failed to hash the schemas' warning."""
    import pyarrow as pa
    return pa.Table.from_pandas(df, preserve_index=False) \
             .replace_schema_metadata(None)


def shuffle_blocks(factor: int = 1) -> int:
    """Target block count for inputs to wide ops (sort/groupby).

    Ray's sort-based shuffle is all-pairs between map and reduce
    partitions: feeding it hundreds of tiny blocks (map chains inherit
    and split upstream block structure) makes the exchange quadratic in
    block count — measured 12s -> 0.9s on an 862k-row groupby by
    coalescing 432 blocks to 32 first. Rule: ~1-2 blocks per core.
    """
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, cpus * factor)


def _strip_meta(t):
    # parquet files written by pandas stamp b'pandas' schema metadata
    # on every read block; metadata-bearing schemas are unhashable and
    # trip Ray's per-reduce schema unification (see arrow_table). O(1)
    # per batch — replaces the schema pointer, never touches data.
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def coalesced(ds, factor: int = 1):
    """Coalesce ``ds`` to shuffle_blocks() blocks (no full shuffle) —
    call immediately before a groupby/sort on a deep map chain. Also
    strips schema metadata so the shuffle's schema dedup stays
    hashable."""
    return (ds.map_batches(_strip_meta, batch_format="pyarrow")
            .repartition(shuffle_blocks(factor)))


def topk(ds, keys, descending, k: int):
    """Distributed top-k WITHOUT a global sort: per-block top-k, then
    one single-block merge of the <= k-per-block survivors — the
    ann.brute_force_topk reduce shape, generalized. Replaces
    ``ds.sort(keys, descending=...).limit(k)`` tails, whose sort is a
    full all-to-all range exchange of EVERY row just to keep k.

    CORRECTNESS CONTRACT: ``keys`` must be a total order over rows
    (include a unique tiebreak column, as every caller's SQL oracle
    already does with its ORDER BY) — with ties at the global kth row
    under a non-total key, per-block truncation could drop a tied
    row the global sort would keep. Returns a single sorted block.
    """
    import pyarrow.compute as pc

    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    pairs = [(c, "descending" if d else "ascending")
             for c, d in zip(keys, descending)]

    def block_topk(t):
        t = _strip_meta(t)
        if t.num_rows <= k:
            return t          # partial pass-through; final pass sorts
        return t.take(pc.sort_indices(t, sort_keys=pairs)[:k])

    def final_topk(t):
        t = _strip_meta(t)
        return t.take(pc.sort_indices(t, sort_keys=pairs)[:k])

    return (ds.map_batches(block_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_topk, batch_format="pyarrow"))


def small_key_count(ds, key: str, alias: str = "n"):
    """Count-per-key for LOW-cardinality keys (layers, statuses)
    without empty sort ranges: per-batch partial counts collapse the
    stream to one row per key per batch, then a SINGLE-partition
    groupby sums them. One reducer has no range boundaries to
    duplicate, so Ray never emits the zero-column empty blocks that
    trip its RefBundle schema warning — and a single reducer over
    n_batches x n_keys partial rows is exact and tiny at any corpus
    size. Output: (key, alias: int64)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(t):
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return pa.table({key: g[key],
                         "__pc": g["count_all"].cast(pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .groupby(key).aggregate(Sum("__pc", alias_name=alias)))
