"""Generic distributed hash join (union -> bucket groupby -> per-bucket
pandas merge).

This generalizes the node-ref->coordinate join of ``stages/join.py``
(the engine's replacement for the reference's sqlite staging lookups,
/root/reference/osm/point_database.cc:48-112) into a reusable
``hash_join(left, right, on=...)`` for relational queries: both sides
are tagged and unioned, bucketed by an avalanched hash of the key, and
each bucket is joined with one C-level pandas merge.

Why not ``ray.data.Dataset.join``: it exists (Ray >= 2.46) but runs on
the hash-shuffle aggregator-actor path, which stalls on small hosts
(spawns per-partition aggregator workers that starve the read stage —
measured in round 1; the sort-shuffle groupby backend is reliable).
Semantics here are a strict subset (equi-join, inner/left/semi/anti)
expressed in the same groupby machinery every other stage uses.

Scale notes: one wide exchange total (the union shuffle); bucket count
should be ~4x cluster cores so a bucket fits a worker's heap. Key skew
concentrates a bucket — mitigate by raising ``n_buckets`` (buckets are
avalanched, so only true single-key hot spots concentrate; for those,
broadcast the small side instead — see TileAssigner for the pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config
from ..functions.hashing import splitmix64
from .util import coalesced


def _key_hash(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Avalanched combined 64-bit hash for one or more key columns
    (int or string keys; strings hashed via polars' vectorized
    xxhash). Shared by bucketing AND the bloom prefilter so both see
    the same key identity."""
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = t[k]
            if pa.types.is_integer(col.type):
                h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
            else:
                import polars as pl
                c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                h = pl.from_arrow(c).hash(seed=23).to_numpy().astype(np.uint64)
            acc = splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) ^ h)
    return acc


def _key_bucket(t: pa.Table, keys: list[str], n_buckets: int) -> np.ndarray:
    return (_key_hash(t, keys) % np.uint64(n_buckets)).astype(np.int64)


# ----------------------------------------------------- bloom prefilter

def _bloom_positions(acc: np.ndarray, n_bits: int, k_hashes: int) -> np.ndarray:
    """(n, k_hashes) bit positions via double hashing (h1 + i*h2, h2
    forced odd so the probe sequence never degenerates)."""
    with np.errstate(over="ignore"):
        h1 = acc % np.uint64(n_bits)
        h2 = splitmix64(acc ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                         for i in range(k_hashes)], axis=1)


def build_bloom(ds, keys: list[str], n_bits: int, k_hashes: int) -> np.ndarray:
    """Distributed bloom-filter build over a Dataset's key columns:
    each batch emits its DISTINCT set-bit positions (<= k * rows,
    capped by n_bits), the driver ORs them into one packed uint64
    word array. Driver transfer is bounded by k * |build side| rows —
    the same "small enough to broadcast" precondition the filter's
    ray.put broadcast needs anyway."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pos": pa.array([], pa.int64())})
        pos = _bloom_positions(_key_hash(t, keys), n_bits, k_hashes)
        return pa.table({"pos": pa.array(
            np.unique(pos.reshape(-1)).astype(np.int64), pa.int64())})

    words = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        p = b["pos"].to_numpy(zero_copy_only=False).astype(np.uint64)
        np.bitwise_or.at(words, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))
    return words


def _bloom_maybe(t: pa.Table, keys: list[str], words: np.ndarray,
                 n_bits: int, k_hashes: int) -> np.ndarray:
    """Per-row membership test: True = possibly in the build side
    (false positives possible, false negatives never)."""
    if t.num_rows == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(_key_hash(t, keys), n_bits, k_hashes)
    hit = np.ones(t.num_rows, dtype=bool)
    for i in range(k_hashes):
        p = pos[:, i]
        hit &= ((words[(p >> np.uint64(6)).astype(np.int64)]
                 >> (p & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


def _fetched_schema(ds, side: str) -> pa.Schema:
    s = ds.schema()
    if s is None or not isinstance(s.base_schema, pa.Schema):
        raise ValueError(
            f"hash_join cannot infer the {side} side's schema — the "
            "side executed to zero rows (Ray keeps no empty block to "
            "read a schema from). Pass left_schema/right_schema when "
            "a side can legitimately be empty.")
    return s.base_schema


def hash_join(left_ds, right_ds, on, how: str = "inner",
              n_buckets: int | None = None,
              bloom_prefilter: bool = False, bloom_bits: int = 1 << 23,
              bloom_k: int = 4, left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              sort_blocks: int | None = None):
    """Equi-join two Datasets on shared key column(s).

    ``how``: "inner" | "left" | "left_semi" | "left_anti" | "right" |
    "full_outer".
    Key columns must have the same names on both sides (rename with a
    map_batches first); non-key column names must be disjoint.
    Returns a Dataset with left columns followed by right non-key
    columns (semi/anti return left columns only).

    With how="left"/"right"/"full_outer", the unmatched side's columns
    come back as typed Arrow nulls (not NaN-widened floats) — int64
    values survive exactly at any magnitude.

    ``bloom_prefilter=True`` builds a bloom filter over the RIGHT
    side's keys (distributed partial positions, driver OR, one
    ray.put broadcast — so the right side must be broadcast-small,
    the usual bloom precondition; it is materialized to avoid a
    second lineage execution) and tests every left row before the
    wide exchange:
    - inner / left_semi: definite non-members are DROPPED pre-shuffle
      — the classic probe-side shuffle-volume cut (false positives
      just ride through the exact join);
    - left / left_anti: definite non-members can't be dropped (they
      ARE output), so they are routed to negative buckets that
      contain no right rows — they still cross the exchange once but
      skip all merge work via the right-empty fast path.
    Output is byte-identical with and without the prefilter
    (tests/test_round3.py equivalence suite).

    ``left_schema`` / ``right_schema``: explicit Arrow schemas for
    sides that can legitimately execute to ZERO rows (a filter that
    matches nothing) — Ray keeps no empty block to infer from, so
    schema inference raises without a hint.

    ``sort_blocks``: explicit block count for the union exchange (the
    sort-partition count of the bucket groupby). Default is
    ``shuffle_blocks()`` (~1-2 per core) — right for big sides, but a
    VOCAB-SIZED union sorted into 16-32 range partitions gets
    duplicate sampled boundaries (few distinct keys), hence EMPTY
    reduce ranges; Ray map tasks over empty blocks emit zero-column
    blocks, which trips the executor's RefBundle schema warning on
    every downstream stage. Callers that know a union is small (e.g.
    a materialized count) should pass ``sort_blocks ≈ rows/8192`` so
    every range partition stays non-empty.
    """
    if how not in ("inner", "left", "left_semi", "left_anti",
                   "right", "full_outer"):
        raise ValueError(f"unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    bloom_state = None
    if bloom_prefilter:
        import ray
        right_ds = right_ds.materialize()  # consumed twice: build + join
        words = build_bloom(right_ds, keys, bloom_bits, bloom_k)
        bloom_state = (ray.put(words), bloom_bits, bloom_k)

    # normalize to arrow blocks so schema() yields real pa.DataTypes.
    # The normalization map forces schema() to EXECUTE a limit-1
    # prefix and read the true output block schema — the lazy
    # schema() shortcut is wrong for map_groups+Project plans (it
    # reports an upstream operator's schema). The one case execution
    # cannot answer is a ZERO-ROW side (Ray drops empty blocks, so
    # schema() returns None): callers that can legitimately produce
    # an empty side must pass left_schema/right_schema explicitly.
    left_ds = left_ds.map_batches(lambda t: t, batch_format="pyarrow")
    right_ds = right_ds.map_batches(lambda t: t, batch_format="pyarrow")
    lsch = left_schema or _fetched_schema(left_ds, "left")
    rsch = right_schema or _fetched_schema(right_ds, "right")
    l_names = list(lsch.names)
    r_names = list(rsch.names)
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    for k in keys:
        if k not in l_names or k not in r_names:
            raise ValueError(f"join key {k!r} missing from a side")
    l_vals = [c for c in l_names if c not in keys]
    r_vals = [c for c in r_names if c not in keys]
    overlap = set(l_vals) & set(r_vals)
    if overlap:
        raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
    semi = how in ("left_semi", "left_anti")
    out_r_vals = [] if semi else r_vals

    def tag_left(t: pa.Table) -> pa.Table:
        bucket = _key_bucket(t, keys, b)
        if bloom_state is not None:
            import ray
            wref, nb, kh = bloom_state
            maybe = _bloom_maybe(t, keys, ray.get(wref), nb, kh)
            # right join: unmatched LEFT rows are never output, so
            # definite non-members drop pre-shuffle exactly as inner
            if how in ("inner", "left_semi", "right"):
                sel = pa.array(maybe)
                t = t.filter(sel)
                bucket = bucket[maybe]
            else:  # left / left_anti: reroute to right-free buckets
                bucket = np.where(maybe, bucket, -1 - bucket)
        cols = {k: t[k] for k in keys}
        for c in l_vals:
            cols[c] = t[c]
        for c in out_r_vals:
            cols[c] = pa.nulls(t.num_rows, r_types[c])
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__jb", pa.array(bucket, pa.int64()))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for c in l_vals:
            cols[c] = pa.nulls(t.num_rows, l_types[c])
        for c in out_r_vals:
            cols[c] = t[c]
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        out = pa.table(cols)
        return out.append_column("__jb", pa.array(_key_bucket(t, keys, b), pa.int64()))

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(right_ds.map_batches(tag_right, batch_format="pyarrow")))
    if sort_blocks is not None:
        from .util import _strip_meta
        unioned = (tagged.map_batches(_strip_meta, batch_format="pyarrow")
                   .repartition(max(1, sort_blocks)))
    else:
        unioned = coalesced(tagged)

    out_cols = keys + l_vals + out_r_vals
    types = {**l_types, **r_types}
    out_schema = pa.schema([(c, types[c]) for c in out_cols])

    def join_group(t: pa.Table) -> pa.Table:
        # split sides in ARROW and drop each side's padded null columns
        # BEFORE any pandas conversion: converting the padded union
        # block whole would widen int64-with-null to float64 and
        # silently corrupt keys/values above 2^53. After the split both
        # sides are null-free, so the numpy-backed merge is exact; only
        # how="left" (which creates real nulls) uses Arrow-backed
        # pandas dtypes so unmatched rows stay typed nulls, not NaN.
        import pyarrow.compute as pc
        is_l = pc.equal(t["__side"], 0)
        # right-empty fast path (every bloom-rerouted negative bucket,
        # and any genuinely unmatched bucket): no merge needed —
        # anti/left pass the left rows through (left's null right
        # columns were padded at tag time), inner/semi emit nothing
        if not pc.any(pc.invert(is_l)).as_py():
            if how in ("inner", "left_semi", "right"):
                return t.slice(0, 0).select(out_cols).cast(out_schema)
            if how in ("left", "left_anti", "full_outer"):
                return t.select(out_cols).cast(out_schema)
        outer = how in ("left", "right", "full_outer")
        tm = pd.ArrowDtype if outer else None
        lhs = t.filter(is_l).select(keys + l_vals).to_pandas(types_mapper=tm)
        rt = t.filter(pc.invert(is_l)).select(keys if semi else keys + r_vals)
        if semi:
            rk = rt.to_pandas().drop_duplicates()
            flag = (lhs.merge(rk.assign(__hit=1), on=keys, how="left")
                    ["__hit"].notna().values)
            out = lhs[flag if how == "left_semi" else ~flag].reset_index(drop=True)
        else:
            rhs = rt.to_pandas(types_mapper=tm)
            pd_how = {"inner": "inner", "left": "left",
                      "right": "right", "full_outer": "outer"}[how]
            out = lhs.merge(rhs, on=keys, how=pd_how)[out_cols]
        return (pa.Table.from_pandas(out, preserve_index=False)
                .cast(out_schema))

    return unioned.groupby("__jb").map_groups(join_group,
                                              batch_format="pyarrow")


# --------------------------------------------- broadcast (dimension) join

def collect_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small) Dataset into ONE driver-side Arrow table
    without re-executing lineage: block refs are fetched zero-copy
    from the object store and concatenated. Caller is responsible for
    the side being bounded (broadcast_join enforces its cap BEFORE
    calling this). ``schema`` covers the zero-row case (Ray keeps no
    empty block to infer from)."""
    import ray
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        if schema is None:
            raise ValueError(
                "collect_table: side executed to zero rows and no "
                "schema hint was given")
        return schema.empty_table()
    return pa.concat_tables(tabs, promote_options="default")


def broadcast_join(left_ds, right_ds, on, how: str = "inner",
                   broadcast_cap: int = 2_000_000,
                   right_schema: pa.Schema | None = None):
    """Zero-exchange equi-join for DIMENSION-sized right sides: the
    right side is counted on its materialized blocks, required to be
    <= ``broadcast_cap`` rows (fail fast — at 10^12-row scale a grown
    side must take the shuffle path, see ``dim_join``), collected to
    one Arrow table, ``ray.put`` ONCE, and every left batch probes it
    with a single C-level Acero ``Table.join``. The left side streams;
    no all-to-all exchange happens at all.

    Semantics and output layout match ``hash_join`` for
    how in ("inner", "left", "left_semi", "left_anti"): key columns
    first, then left non-key columns, then (inner/left) right non-key
    columns; how="left" unmatched rows carry typed Arrow nulls.
    Join keys must be non-null on both sides (SQL null-key rows never
    match here; keep parity with hash_join by filtering nulls first).

    This is the TileAssigner broadcast pattern generalized to
    relational joins — the explicit Spark-AQE-style broadcast-hash
    join. Replaces 1 wide exchange (and the build side's shuffle
    write) per dimension join; measured on the TPC-H q08/q09 chains
    in BASELINE.md."""
    import ray
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"broadcast_join: unsupported how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    right_ds = right_ds.map_batches(lambda t: t,
                                    batch_format="pyarrow").materialize()
    n = right_ds.count()
    if n > broadcast_cap:
        raise ValueError(
            f"broadcast_join: right side has {n} rows > broadcast_cap "
            f"{broadcast_cap}; use hash_join (or dim_join, which picks "
            "automatically)")
    r_tbl = collect_table(right_ds, right_schema).combine_chunks()

    rsch = r_tbl.schema
    r_types = dict(zip(rsch.names, rsch.types))
    for k in keys:
        if k not in r_types:
            raise ValueError(f"join key {k!r} missing from the right side")
    r_vals = [c for c in rsch.names if c not in keys]
    semi = how in ("left_semi", "left_anti")
    join_type = {"inner": "inner", "left": "left outer",
                 "left_semi": "left semi",
                 "left_anti": "left anti"}[how]

    tref = ray.put(r_tbl)

    # deliberately NO left-side schema probe: a driver-side schema()
    # fetch executes a limit-1 prefix of the left lineage, and chained
    # joins would re-execute expensive upstream aggregates once per
    # probe (measured 20s -> 4s on a 2-join chain over a lineitem
    # aggregate). The output layout is derived per batch — left blocks
    # share one schema, so every probe emits the same layout.
    def probe(t: pa.Table) -> pa.Table:
        import ray as _ray
        for k in keys:
            if k not in t.column_names:
                raise ValueError(f"join key {k!r} missing from left batch")
        l_vals = [c for c in t.column_names if c not in keys]
        overlap = set(l_vals) & set(r_vals)
        if overlap:
            raise ValueError(f"non-key columns overlap: {sorted(overlap)}")
        out_cols = keys + l_vals + ([] if semi else r_vals)
        types = {**dict(zip(t.schema.names, t.schema.types)), **r_types}
        out_schema = pa.schema([(c, types[c]) for c in out_cols])
        if t.num_rows == 0:
            return out_schema.empty_table()
        r = _ray.get(tref)  # zero-copy object-store read per worker
        out = t.join(r, keys=keys, join_type=join_type)
        return out.select(out_cols).cast(out_schema)

    return left_ds.map_batches(probe, batch_format="pyarrow")


def dim_join(left_ds, right_ds, on, how: str = "inner",
             broadcast_cap: int = 2_000_000,
             n_buckets: int | None = None,
             right_schema: pa.Schema | None = None,
             **hash_kwargs):
    """Size-ADAPTIVE equi-join: materialize the right side once, count
    it, and broadcast when it is dimension-small (<= broadcast_cap
    rows), else run the shuffle ``hash_join`` — the Spark-AQE
    broadcast decision made explicit and testable. At test scale the
    TPC-H dimension sides broadcast (zero exchanges); on a 100 TB run
    a side that grew past the cap falls back to the one-exchange
    bucketed join automatically, so the plan never silently collects
    an unbounded table to the driver."""
    right_ds = right_ds.map_batches(lambda t: t,
                                    batch_format="pyarrow").materialize()
    if (how in ("inner", "left", "left_semi", "left_anti")
            and right_ds.count() <= broadcast_cap):
        return broadcast_join(left_ds, right_ds, on, how,
                              broadcast_cap, right_schema)
    # shuffle fallback; bloom_prefilter etc. pass through untouched
    return hash_join(left_ds, right_ds, on, how, n_buckets=n_buckets,
                     right_schema=right_schema, **hash_kwargs)


# ------------------------------------------------------------- set ops

def distinct_rows(ds, cols: list[str] | None = None,
                  n_buckets: int | None = None):
    """DISTINCT over whole rows (or ``cols``): per-batch combiner
    dedup, then one bucketed exchange with an in-group exact dedup —
    equality is on the VALUES (the bucket hash only routes; collisions
    merely co-locate). Arrow-native end to end (``group_by`` with no
    aggregations), so nullable int64 columns never take the pandas
    float64-widening detour that corrupts values above 2^53."""
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def prep(t: pa.Table) -> pa.Table:
        use = cols or t.column_names
        g = t.select(use).group_by(use).aggregate([])
        return g.append_column(
            "__jb", pa.array(_key_bucket(g, use, b), pa.int64()))

    def uniq(t: pa.Table) -> pa.Table:
        use = [c for c in t.column_names if c != "__jb"]
        return t.select(use).group_by(use).aggregate([])

    return (coalesced(ds.map_batches(prep, batch_format="pyarrow"))
            .groupby("__jb").map_groups(uniq, batch_format="pyarrow"))


def intersect_distinct(left_ds, right_ds, cols: list[str],
                       n_buckets: int | None = None):
    """SQL INTERSECT: distinct ``cols`` rows present on BOTH sides —
    distinct_rows on the left, then a semi hash_join on all columns
    (no non-key payload, so the exchange moves keys only)."""
    return hash_join(distinct_rows(left_ds, cols, n_buckets),
                     right_ds.map_batches(lambda t: t.select(cols),
                                          batch_format="pyarrow"),
                     on=cols, how="left_semi", n_buckets=n_buckets)


def except_distinct(left_ds, right_ds, cols: list[str],
                    n_buckets: int | None = None):
    """SQL EXCEPT: distinct ``cols`` rows on the left absent from the
    right (anti join on all columns)."""
    return hash_join(distinct_rows(left_ds, cols, n_buckets),
                     right_ds.map_batches(lambda t: t.select(cols),
                                          batch_format="pyarrow"),
                     on=cols, how="left_anti", n_buckets=n_buckets)


def snapshot_diff(old_ds, new_ds, on, compare: list[str],
                  n_buckets: int | None = None):
    """Keyed table diff — the dataset-reconciliation op behind
    incremental crawl refreshes and output regression checks: full
    outer ``hash_join`` old vs new on ``on``, then classify every key
    as 'added' (new only) / 'removed' (old only) / 'changed' (both
    sides, any ``compare`` column differs, null-safe) / 'same'.

    Old-side compare columns are renamed ``<c>__old`` pre-join so the
    non-key namespaces stay disjoint; explicit int8 presence markers
    disambiguate a missing side from a legitimately-null compare
    value. One wide exchange (the join); classification is a
    stateless vectorized map over the joined stream.

    Output: key column(s) + ``status`` (string) + the new-side
    ``compare`` columns (typed null for removed keys).
    """
    import pyarrow.compute as pc

    keys = [on] if isinstance(on, str) else list(on)

    def prep_old(t: pa.Table) -> pa.Table:
        t = t.select(keys + compare).rename_columns(
            keys + [f"{c}__old" for c in compare])
        return t.append_column(
            "__in_old", pa.array(np.ones(len(t), np.int8)))

    def prep_new(t: pa.Table) -> pa.Table:
        t = t.select(keys + compare)
        return t.append_column(
            "__in_new", pa.array(np.ones(len(t), np.int8)))

    joined = hash_join(old_ds.map_batches(prep_old, batch_format="pyarrow"),
                       new_ds.map_batches(prep_new, batch_format="pyarrow"),
                       on=keys, how="full_outer", n_buckets=n_buckets)

    def classify(t: pa.Table) -> pa.Table:
        in_old = pc.is_valid(t["__in_old"])
        in_new = pc.is_valid(t["__in_new"])
        diff = pa.array(np.zeros(len(t), bool))
        for c in compare:
            a, b = t[f"{c}__old"], t[c]
            ne = pc.fill_null(pc.not_equal(a, b), False)
            one_null = pc.xor(pc.is_valid(a), pc.is_valid(b))
            diff = pc.or_(diff, pc.or_(ne, one_null))
        status = pc.if_else(
            pc.invert(in_old), pa.scalar("added"),
            pc.if_else(pc.invert(in_new), pa.scalar("removed"),
                       pc.if_else(diff, pa.scalar("changed"),
                                  pa.scalar("same"))))
        out = t.select(keys + compare)
        return out.append_column("status", status.combine_chunks()
                                 if isinstance(status, pa.ChunkedArray)
                                 else status)

    return joined.map_batches(classify, batch_format="pyarrow")


def union_by_name(datasets: list, fill_types: dict | None = None):
    """SQL UNION ALL BY NAME: concatenate Datasets whose schemas
    differ, aligning columns by name — missing columns come back as
    typed nulls (never NaN-widened floats). The target schema is the
    name-ordered union of all input schemas; ``fill_types`` overrides
    the Arrow type for columns absent from some inputs (otherwise the
    type comes from the first dataset that has the column). A
    stateless per-batch projection + Dataset.union — no shuffle.
    """
    def _pa_type(t):
        # Ray's Schema yields numpy dtypes for pandas-backed datasets
        if isinstance(t, pa.DataType):
            return t
        try:
            if np.dtype(t) == np.dtype(object):
                return pa.string()
            return pa.from_numpy_dtype(np.dtype(t))
        except TypeError:
            return pa.string()

    schemas = [ds.schema() for ds in datasets]
    types: dict = dict(fill_types or {})
    for s in schemas:
        for name, typ in zip(s.names, s.types):
            types.setdefault(name, _pa_type(typ))
    cols = sorted(types)

    def align(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            out[c] = t[c] if c in t.column_names \
                else pa.nulls(len(t), types[c])
        return pa.table(out)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in datasets]
    u = aligned[0]
    for nxt in aligned[1:]:
        u = u.union(nxt)
    return u
