"""Temporal operators over stream-shaped tables (ray_guide
'Streaming-shaped workloads'): session windows and as-of joins.

Ray Data has no event-time window/watermark machinery; both operators
are expressed as bucket-partitioned group computations with explicit
in-group ordering — the documented partitioning assumption is that one
key's rows fit one group (true for per-user event streams; shard keys
further by time range if a single key's history outgrows a worker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config
from ..functions.hashing import bucket_of
from .util import arrow_table, coalesced



def _value_bins(v, bin_width: float):
    """Shared bin rule for ALL range/interval joins: floor of the
    float64 ratio, regardless of the column's storage type. Mixing an
    integer-division rule for int columns with a float rule for float
    columns would put the two sides of one join in different bin
    spaces (silently dropping pairs) whenever their types differ or
    bin_width is fractional; int64 microsecond timestamps are exact
    in float64 (< 2^53), so the float rule is lossless for them.
    """
    return np.floor(np.asarray(v).astype(np.float64)
                    / bin_width).astype(np.int64)



def _explode_spans(lo, hi, bin_width: float, max_bins: int, label: str):
    """Shared interval->bins replication for the range/interval/keyed
    joins: returns (src, bins) where ``src[i]`` is the input row index
    of replicated row i and ``bins[i]`` its bin. Intervals spanning
    more than ``max_bins`` bins are dropped with a log line (never
    silently) — route such outliers through a broadcast join."""
    b0 = _value_bins(lo, bin_width)
    b1 = _value_bins(hi, bin_width)
    nb = b1 - b0 + 1
    keep = nb <= max_bins
    skipped = int(len(lo) - keep.sum())
    if skipped:
        print(f"{label}: skipped {skipped} intervals spanning "
              f"> {max_bins} bins (bin_width={bin_width})")
    src0 = np.flatnonzero(keep)
    counts = nb[src0]
    rep = np.repeat(np.arange(len(src0)), counts)
    starts = (np.concatenate(([0], np.cumsum(counts)[:-1]))
              if len(src0) else np.empty(0, np.int64))
    local = (np.arange(int(counts.sum()), dtype=np.int64)
             - np.repeat(starts, counts))
    src = src0[rep]
    return src, b0[src] + local


def session_windows(ds, key_col: str = "user_id", ts_col: str = "ts",
                    gap_s: float = 1800.0, value_col: str = "value",
                    tiebreak_col: str = "event_id",
                    n_buckets: int | None = None):
    """Gap-based sessionization: rows of one key, ordered by
    (ts, tiebreak), split where the gap to the previous row exceeds
    ``gap_s``. Emits one row per session:
    (key, session_start, n, total_value)."""
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys = df[key_col].to_numpy()
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        gap = np.concatenate(([0], np.diff(ts))) > gap_s * 1e6
        brk = new_key | gap
        sess = np.cumsum(brk)
        out = (pd.DataFrame({
            key_col: keys, "__sess": sess,
            ts_col: df[ts_col].to_numpy(),
            value_col: df[value_col].to_numpy()})
            .groupby([key_col, "__sess"], sort=False)
            .agg(session_start=(ts_col, "min"), n=(ts_col, "size"),
                 total_value=(value_col, "sum"))
            .reset_index().drop(columns="__sess"))
        out["n"] = out["n"].astype(np.int64)
        return arrow_table(out)

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(sessionize, batch_format="pandas"))


def asof_join(left_ds, right_ds, key_col: str, left_ts: str, right_ts: str,
              right_value: str, n_buckets: int | None = None,
              left_cols: list[str] | None = None):
    """As-of (backward) join: for each left row, the greatest
    ``right_ts`` <= ``left_ts`` among right rows with the same key;
    left rows with no match are dropped (inner). Expressed as a
    union-tag -> groupby(bucket(key)) -> per-group pd.merge_asof
    (ray_guide 'As-of / range join')."""
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    left_cols = left_cols or []

    def prep_left(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[key_col],
            "__ts": t[left_ts].cast(pa.timestamp("us")),
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "__val": pa.nulls(t.num_rows, pa.timestamp("us")),
        }
        for c in left_cols:
            cols[c] = t[c]
        return pa.table(cols)

    # the union needs identical schemas: the right side carries typed
    # nulls for the left's carried columns
    left_schema = left_ds.schema()  # ray Schema wrapper: .names/.types
    left_types = dict(zip(left_schema.names, left_schema.types))

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {
            "__key": t[key_col],
            "__ts": t[right_ts].cast(pa.timestamp("us")),
            "__side": pa.array(np.ones(t.num_rows, np.int8)),
            "__val": t[right_value].cast(pa.timestamp("us")),
        }
        for c in left_cols:
            cols[c] = pa.nulls(t.num_rows, left_types[c])
        return pa.table(cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["__key"].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    unioned = (left_ds.map_batches(prep_left, batch_format="pyarrow")
               .union(right_ds.map_batches(prep_right, batch_format="pyarrow"))
               .map_batches(add_bucket, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["__side"] == 0].sort_values("__ts", kind="mergesort")
        right = (df[df["__side"] == 1][["__key", "__ts", "__val"]]
                 .sort_values("__ts", kind="mergesort"))
        if len(left) == 0 or len(right) == 0:
            out = left.head(0)[[*left_cols]].copy()
            out["asof_value"] = pd.Series(dtype="datetime64[us]")
            return arrow_table(out)
        merged = pd.merge_asof(left, right, on="__ts", by="__key",
                               direction="backward", suffixes=("", "_r"))
        merged = merged[~merged["__val_r"].isna()]
        out = merged[[*left_cols]].copy()
        for c in left_cols:
            # the union carried typed nulls on the right side, which
            # pandas widened (int64 -> float64); restore the left dtype
            out[c] = out[c].astype(left_types[c].to_pandas_dtype())
        out["asof_value"] = merged["__val_r"].to_numpy()
        return arrow_table(out)

    return (coalesced(unioned).groupby("__b")
            .map_groups(merge, batch_format="pandas"))


def range_join(points_ds, intervals_ds, point_val: str, lo_col: str,
               hi_col: str, point_cols: list[str], interval_cols: list[str],
               bin_width: float, max_bins: int = 64,
               n_buckets: int | None = None):
    """Interval-containment join WITHOUT an equi key: emit one row per
    (point, interval) pair with ``lo <= point_val <= hi`` (inclusive),
    carrying ``point_cols`` + ``interval_cols`` (names must be
    disjoint).

    Scale shape (ray_guide 'As-of / range join'): the value domain is
    binned at ``bin_width``; each point lands in exactly ONE bin (so
    pairs are emitted exactly once, no dedup pass) and each interval
    replicates to every bin it overlaps (the explode_tiles pattern).
    One groupby on the bin is the only exchange; the in-bin kernel is
    a vectorized point x interval containment mask, so ``bin_width``
    is the explicit partitioning contract: pick it near the typical
    interval length, so intervals replicate to O(1) bins AND a bin's
    point x interval product fits a worker. Intervals longer than
    ``max_bins`` bins are skipped with a log line (never silently) —
    route such outliers to a broadcast join instead.
    """
    import pyarrow.compute as pc

    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    psch = points_ds.schema()
    isch = intervals_ds.schema()
    p_types = dict(zip(psch.names, psch.types))
    i_types = dict(zip(isch.names, isch.types))
    overlap = set(point_cols) & set(interval_cols)
    if overlap:
        raise ValueError(f"carried columns overlap: {sorted(overlap)}")


    def prep_points(t: pa.Table) -> pa.Table:
        v = t[point_val].to_numpy(zero_copy_only=False)
        cols = {"__bin": pa.array(_value_bins(v, bin_width), pa.int64()),
                "__v": pa.array(v.astype(np.float64)),
                "__lo": pa.nulls(t.num_rows, pa.float64()),
                "__hi": pa.nulls(t.num_rows, pa.float64())}
        for c in point_cols:
            cols[c] = t[c]
        for c in interval_cols:
            cols[c] = pa.nulls(t.num_rows, i_types[c])
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def prep_intervals(t: pa.Table) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        src, bins = _explode_spans(lo, hi, bin_width, max_bins,
                                   "range_join")
        take = pa.array(src, pa.int64())
        n = len(src)
        cols = {"__bin": pa.array(bins, pa.int64()),
                "__v": pa.nulls(n, pa.float64()),
                "__lo": pa.array(lo[src].astype(np.float64)),
                "__hi": pa.array(hi[src].astype(np.float64))}
        for c in point_cols:
            cols[c] = pa.nulls(n, p_types[c])
        for c in interval_cols:
            cols[c] = t[c].take(take)
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    unioned = coalesced(
        points_ds.map_batches(prep_points, batch_format="pyarrow")
        .union(intervals_ds.map_batches(prep_intervals,
                                        batch_format="pyarrow")))

    out_types = {**p_types, **i_types}
    out_schema = pa.schema([(c, out_types[c])
                            for c in point_cols + interval_cols])

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_p = pc.equal(t["__side"], 0)
        pts = t.filter(is_p)
        ivs = t.filter(pc.invert(is_p))
        if pts.num_rows * ivs.num_rows >= 1 << 20:
            # heavy bins (point x interval product) are the skew
            # signal that says bin_width is mis-sized for this data
            from ..state.metrics import observe_partition
            observe_partition("range_join_bin",
                              int(t["__bin"][0].as_py()), t.num_rows)
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return out_schema.empty_table()
        v = pts["__v"].to_numpy(zero_copy_only=False)
        lo = ivs["__lo"].to_numpy(zero_copy_only=False)
        hi = ivs["__hi"].to_numpy(zero_copy_only=False)
        hit = (v[:, None] >= lo[None, :]) & (v[:, None] <= hi[None, :])
        pi, ii = np.nonzero(hit)
        cols = {c: pts[c].take(pa.array(pi, pa.int64())) for c in point_cols}
        for c in interval_cols:
            cols[c] = ivs[c].take(pa.array(ii, pa.int64()))
        return pa.table(cols).cast(out_schema)

    return unioned.groupby("__bin").map_groups(match, batch_format="pyarrow")


def scd2(ds, key_col: str = "user_id", ts_col: str = "ts",
         val_col: str = "event_type", tiebreak_col: str = "event_id",
         n_buckets: int | None = None):
    """Slowly-changing-dimension type-2 interval builder: order each
    key's changelog rows by (ts, tiebreak), collapse consecutive runs
    of the SAME value (only transitions open a new version), and emit
    one validity interval per version — ``valid_to_us`` is the next
    transition's timestamp, or the -1 open-interval sentinel for the
    current version (an integer, not NULL, so both engines hash
    identically). The warehouse dual of ``cdc_merge`` (which keeps
    only the final state).

    Scale shape: ONE bucketed exchange on hash(key) + a per-bucket
    sorted numpy kernel (boundary/transition masks + shifted arrays;
    never a per-key loop). Same partitioning contract as lag_rank:
    one key's rows fit one group.

    Output: (key_col, state, valid_from_us: int64, valid_to_us: int64).
    """
    from ..functions.hashing import bucket_any

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_any(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        vals = df[val_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        change = new_key | np.concatenate(([True], vals[1:] != vals[:-1]))
        k, v, f = keys[change], vals[change], ts[change]
        nk = new_key[change]
        # valid_to = next version's start within the same key, else -1
        to = np.concatenate((f[1:], [-1]))
        to[np.concatenate((nk[1:], [True]))] = -1
        return arrow_table(pd.DataFrame({
            key_col: k, "state": v,
            "valid_from_us": f, "valid_to_us": to}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def path_length(ds, key_col: str = "user_id", ts_col: str = "ts",
                tiebreak_col: str = "event_id",
                x_col: str = "x", y_col: str = "y",
                rad: float = 0.017453292519943295,
                earth_r: float = 6371000.0,
                n_buckets: int | None = None):
    """Per-key trajectory path length: order each key's points by
    (ts, tiebreak), sum the haversine distance between consecutive
    points. The GPS/telemetry staple (ST_Length over ST_MakeLine)
    the reference's GRASS post-chain has no analog for.

    Each segment is quantized to floor(meters) BEFORE the sum, so the
    per-key total is an order-independent int64 a SQL mirror can
    reproduce exactly (same libm-drift-vs-quantum argument as
    q_haversine_knn: literal ``x * rad``, ``s*s`` operand shapes on
    both sides; 1 m quantum dwarfs the ulp drift).

    Scale shape: ONE bucketed exchange on hash(key) + a per-bucket
    sorted numpy kernel (shift + boundary mask; never a per-key
    loop). Same partitioning contract as lag_rank / session_windows:
    one key's rows fit one group.

    Output: (key_col, n_points: int64, path_m: int64).
    """
    from ..functions.hashing import bucket_any

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_any(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        latr = df[y_col].to_numpy() * rad
        lonr = df[x_col].to_numpy() * rad
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        s1 = np.sin((latr - np.roll(latr, 1)) / 2.0)
        s2 = np.sin((lonr - np.roll(lonr, 1)) / 2.0)
        a = s1 * s1 + np.cos(np.roll(latr, 1)) * np.cos(latr) * (s2 * s2)
        d = 2.0 * np.arcsin(np.sqrt(np.minimum(1.0, a))) * earth_r
        seg = np.floor(d).astype(np.int64)
        seg[new_key] = 0  # first point of a key contributes no segment
        starts = np.flatnonzero(new_key)
        return arrow_table(pd.DataFrame({
            key_col: keys[starts],
            "n_points": np.diff(np.append(starts, len(keys))).astype(np.int64),
            "path_m": np.add.reduceat(seg, starts).astype(np.int64)}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def lag_rank(ds, key_col: str = "user_id", ts_col: str = "ts",
             tiebreak_col: str = "event_id",
             n_buckets: int | None = None):
    """Per-key analytic window pass — ``row_number()`` and the
    microsecond delta to the previous event (``ts - lag(ts)``), the
    standard feature precompute for inter-arrival analysis and
    sessionization thresholds. SQL analog: ``row_number() OVER
    (PARTITION BY key ORDER BY ts, tiebreak)`` / ``lag`` — expressed
    as ONE bucketed exchange + a per-bucket sorted numpy kernel
    (cumcount + diff masked at key boundaries; never a per-key loop).

    First event of a key gets ``delta_us = -1`` (integer sentinel, not
    NULL, so both engines hash identically). Same partitioning
    contract as session_windows: one key's rows fit one group.

    Output: (tiebreak_col, key_col, rn: int64, delta_us: int64).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        # row_number: positions since the last key boundary
        idx = np.arange(len(keys), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - start + 1
        delta = np.concatenate(([0], np.diff(ts)))
        delta[new_key] = -1
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys, "rn": rn, "delta_us": delta}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def running_total(ds, ts_col: str = "ts", value_col: str = "value",
                  tiebreak_col: str = "event_id",
                  bin_us: int = 3_600_000_000, quant: int = 10_000):
    """GLOBAL ordered cumulative sum (``sum(value) OVER (ORDER BY ts,
    tiebreak)``) — the distributed prefix-scan primitive, expressed as
    the classic two-phase scan:

    1. per-bin partial sums: values are quantized to integer units
       (``floor(value * quant)`` — integer addition is associative, so
       the distributed sum order can never change the result) and
       summed per coarse time bin with a per-batch combiner before ONE
       small (bin, partial) exchange;
    2. the driver computes the exclusive prefix over the ~(time range
       / bin_us) bin sums — a bounded, documented collection (e.g. a
       year of 1-hour bins is 8.8k rows regardless of data volume) —
       and broadcasts the offsets;
    3. one groupby(bin) orders each bin locally (ts, tiebreak) and adds
       its offset to the in-bin cumulative sum.

    The partitioning contract: one bin's rows fit one worker (pick
    ``bin_us`` accordingly; skewed bins surface in the skew histogram
    like any other group key).

    Output: (tiebreak_col, run_q: int64) where run_q is the running
    sum in quantized units.
    """
    import ray

    def prep(t: pa.Table) -> pa.Table:
        ts = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(v * quant).astype(np.int64)
        return pa.table({
            tiebreak_col: t[tiebreak_col],
            "__ts": pa.array(ts, pa.int64()),
            "__bin": pa.array(ts // bin_us, pa.int64()),
            "__q": pa.array(q, pa.int64()),
        })

    prepped = coalesced(ds.map_batches(prep, batch_format="pyarrow"))
    prepped = prepped.materialize()  # consumed by both phases

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("__bin").aggregate([("__q", "sum")])
        return g.rename_columns(["__bin", "part"])

    from ray.data.aggregate import Sum
    bin_rows = (prepped.map_batches(partial, batch_format="pyarrow")
                .groupby("__bin").aggregate(Sum("part", alias_name="total"))
                .take_all())
    bins = sorted(r["__bin"] for r in bin_rows)
    totals = {r["__bin"]: r["total"] for r in bin_rows}
    offsets, acc = {}, 0
    for b_ in bins:
        offsets[b_] = acc
        acc += int(totals[b_])
    off_ref = ray.put(offsets)

    def scan(df: pd.DataFrame) -> pa.Table:
        off = ray.get(off_ref)
        df = df.sort_values(["__ts", tiebreak_col], kind="mergesort")
        run = np.cumsum(df["__q"].to_numpy()) + off[int(df["__bin"].iloc[0])]
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            "run_q": run.astype(np.int64)}))

    return prepped.groupby("__bin").map_groups(scan, batch_format="pandas")


def watermark_late(ds, ts_col: str = "ts", order_col: str = "event_id",
                   type_col: str = "event_type",
                   late_us: int = 3_600_000_000, bin_sz: int = 65_536):
    """Event-time watermark accounting over an out-of-order stream —
    the streaming-ingest health metric: with arrival order defined by
    ``order_col`` (a monotone ingest sequence), the high-water mark
    before a row is max(event time) over all PREVIOUSLY ARRIVED rows,
    and a row is LATE iff its ts < hwm - late_us — it would have
    missed a watermark that trails the stream head by ``late_us``.

    Distributed prefix-MAX scan (the running_total two-phase shape —
    max is associative, so the scan distributes exactly like sum):
    1. rows bin by ``order_col // bin_sz``; per-bin max-ts partials
       (per-batch combiner) feed ONE small (bin, max) exchange;
    2. the driver computes the exclusive prefix max over the bounded
       bin list (#bins = id range / bin_sz, data-volume-free) and
       broadcasts it;
    3. one groupby(bin) kernel sorts its bin by ``order_col``, runs
       the in-bin exclusive running max seeded with the bin's offset,
       flags late rows, and emits per-type PARTIAL aggregates; a tiny
       final groupby sums them.

    Partitioning contract: one bin's rows fit one worker (size
    ``bin_sz`` accordingly).

    Output: (type_col, n_late, n_events, max_late_us) int64 — per
    event type, how many rows arrived later than the watermark and
    the worst lateness observed (0 when none).
    """
    import ray
    from ray.data.aggregate import Max as AMax, Sum

    NEG = np.int64(-(1 << 62))  # "no prior row" sentinel; NEG-late_us
    #                             cannot underflow and beats no epoch

    def prep(t: pa.Table) -> pa.Table:
        ts = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        oid = (t[order_col].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        return pa.table({
            "__o": pa.array(oid, pa.int64()),
            "__tu": pa.array(ts, pa.int64()),
            "__bin": pa.array(oid // bin_sz, pa.int64()),
            type_col: t[type_col]})

    prepped = coalesced(ds.map_batches(prep, batch_format="pyarrow"))
    prepped = prepped.materialize()  # consumed by both phases

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("__bin").aggregate([("__tu", "max")])
        return g.rename_columns(["__bin", "part"])

    bin_rows = (prepped.map_batches(partial, batch_format="pyarrow")
                .groupby("__bin").aggregate(AMax("part",
                                                 alias_name="mx"))
                .take_all())
    bins = sorted(r["__bin"] for r in bin_rows)
    mxs = {r["__bin"]: int(r["mx"]) for r in bin_rows}
    offsets, acc = {}, int(NEG)
    for b_ in bins:
        offsets[b_] = acc
        acc = max(acc, mxs[b_])
    off_ref = ray.put(offsets)

    def scan(df: pd.DataFrame) -> pa.Table:
        off = ray.get(off_ref)
        df = df.sort_values("__o", kind="mergesort")
        tu = df["__tu"].to_numpy()
        # exclusive running max, seeded with the bin's prefix offset
        hwm = np.maximum.accumulate(
            np.concatenate(([off[int(df["__bin"].iloc[0])]], tu[:-1])))
        late = tu < hwm - late_us
        lateness = np.where(late, hwm - late_us - tu, 0)
        part = (pd.DataFrame({type_col: df[type_col].to_numpy(),
                              "n_late": late.astype(np.int64),
                              "n_events": np.ones(len(tu), np.int64),
                              "max_late_us": lateness.astype(np.int64)})
                .groupby(type_col, as_index=False)
                .agg({"n_late": "sum", "n_events": "sum",
                      "max_late_us": "max"}))
        return arrow_table(part)

    parts = prepped.groupby("__bin").map_groups(scan,
                                                batch_format="pandas")
    return (parts.groupby(type_col)
            .aggregate(Sum("n_late", alias_name="n_late"),
                       Sum("n_events", alias_name="n_events"),
                       AMax("max_late_us", alias_name="max_late_us")))


def ntile(ds, k: int, key_col: str = "user_id", ts_col: str = "ts",
          tiebreak_col: str = "event_id", n_buckets: int | None = None):
    """Per-key ``NTILE(k)`` — rows of one key ordered by (ts, tiebreak)
    split into ``k`` near-equal tiles, the first ``n % k`` tiles one
    row larger (exact SQL semantics). Same single-exchange shape as
    ``lag_rank``: bucket by key hash, one sorted numpy kernel per
    bucket (group sizes via run-length boundaries, never a per-key
    loop). Output: (tiebreak_col, key_col, tile: int64).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        m = len(keys)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - start  # 0-based in-key rank
        bounds = np.flatnonzero(new_key)
        sizes = np.diff(np.concatenate((bounds, [m])))
        n_of = np.repeat(sizes, sizes)  # per-row group size
        size = n_of // k
        rem = n_of % k
        cut = (size + 1) * rem
        tile = np.where(rn < cut, rn // np.maximum(size + 1, 1),
                        rem + (rn - cut) // np.maximum(size, 1)) + 1
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys, "tile": tile.astype(np.int64)}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def interval_join(left_ds, right_ds, lo_col: str, hi_col: str,
                  left_cols: list[str], right_cols: list[str],
                  bin_width: float, max_bins: int = 64,
                  n_buckets: int | None = None):
    """Interval-OVERLAP join without an equi key: one row per (left,
    right) pair whose closed intervals intersect
    (``l.lo <= r.hi AND r.lo <= l.hi``). Both inputs carry their
    bounds in ``lo_col``/``hi_col`` (same names both sides); carried
    columns must be disjoint.

    Scale shape (the range_join bin contract, symmetrized): each side
    replicates to every bin its interval overlaps; a pair is emitted
    ONLY in its owner bin ``bin(max(l.lo, r.lo))`` — a bin both
    intervals provably cover — so output is exactly-once with no dedup
    pass. One groupby on the bin; the in-bin kernel is a vectorized
    l x r overlap mask. ``bin_width`` near the typical interval length
    keeps replication O(1) and the in-bin product bounded; intervals
    spanning more than ``max_bins`` bins are skipped with a log line
    (route such outliers through a broadcast join instead).
    """
    import pyarrow.compute as pc

    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")

    lsch = left_ds.schema()
    rsch = right_ds.schema()
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"carried columns overlap: {sorted(overlap)}")

    def explode(t: pa.Table, side: int, carry: list[str],
                pad: list[str], pad_types: dict) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        src, bins = _explode_spans(lo, hi, bin_width, max_bins,
                                   "interval_join")
        take = pa.array(src, pa.int64())
        n = len(src)
        cols = {"__bin": pa.array(bins, pa.int64()),
                "__lo": pa.array(lo[src]), "__hi": pa.array(hi[src]),
                "__side": pa.array(np.full(n, side, np.int8))}
        for c in carry:
            cols[c] = t[c].take(take)
        for c in pad:
            cols[c] = pa.nulls(n, pad_types[c])
        return pa.table(cols)

    unioned = coalesced(
        left_ds.map_batches(
            lambda t: explode(t, 0, left_cols, right_cols, r_types),
            batch_format="pyarrow")
        .union(right_ds.map_batches(
            lambda t: explode(t, 1, right_cols, left_cols, l_types),
            batch_format="pyarrow")))

    out_types = {**l_types, **r_types}
    out_schema = pa.schema([(c, out_types[c])
                            for c in left_cols + right_cols])

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_l = pc.equal(t["__side"], 0)
        lt = t.filter(is_l)
        rt = t.filter(pc.invert(is_l))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        la = lt["__lo"].to_numpy(zero_copy_only=False)[:, None]
        ha = lt["__hi"].to_numpy(zero_copy_only=False)[:, None]
        lb = rt["__lo"].to_numpy(zero_copy_only=False)[None, :]
        hb = rt["__hi"].to_numpy(zero_copy_only=False)[None, :]
        this_bin = int(t["__bin"][0].as_py())
        owner = np.floor(np.maximum(la, lb) / bin_width) == this_bin
        hit = (la <= hb) & (lb <= ha) & owner
        li_, ri_ = np.nonzero(hit)
        cols = {c: lt[c].take(pa.array(li_, pa.int64())) for c in left_cols}
        for c in right_cols:
            cols[c] = rt[c].take(pa.array(ri_, pa.int64()))
        return pa.table(cols).cast(out_schema)

    return unioned.groupby("__bin").map_groups(match, batch_format="pyarrow")


def keyed_range_join(points_ds, intervals_ds, key_col: str,
                     point_val: str, lo_col: str, hi_col: str,
                     point_cols: list[str], interval_cols: list[str],
                     bin_width: float, max_bins: int = 64,
                     n_buckets: int | None = None):
    """Equi-key + range composite join: one row per (point, interval)
    pair with MATCHING ``key_col`` AND ``lo <= point_val <= hi`` —
    the "events of the same customer within N days of the order"
    shape that a plain equi join over-produces and a plain range join
    can't key.

    Scale shape: the exchange key is (hash-bucket(key), value-bin) —
    points land in one composite bin, intervals replicate across the
    bins they span WITHIN their key bucket, so co-partitioning holds
    on both dimensions at once. The in-group kernel masks on exact
    key equality (bucket collisions only co-locate) times
    containment. Intervals spanning > ``max_bins`` bins are skipped
    with a log line, as in ``range_join``.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    psch = points_ds.schema()
    isch = intervals_ds.schema()
    p_types = dict(zip(psch.names, psch.types))
    i_types = dict(zip(isch.names, isch.types))
    overlap = set(point_cols) & set(interval_cols)
    if overlap:
        raise ValueError(f"carried columns overlap: {sorted(overlap)}")
    key_t = p_types[key_col]


    def prep_points(t: pa.Table) -> pa.Table:
        v = t[point_val].to_numpy(zero_copy_only=False)
        k = t[key_col].to_numpy(zero_copy_only=False)
        cols = {"__kb": pa.array(bucket_of(k, b), pa.int64()),
                "__bin": pa.array(_value_bins(v, bin_width), pa.int64()),
                "__key": t[key_col],
                "__v": pa.array(v.astype(np.float64)),
                "__lo": pa.nulls(t.num_rows, pa.float64()),
                "__hi": pa.nulls(t.num_rows, pa.float64())}
        for c in point_cols:
            cols[c] = t[c]
        for c in interval_cols:
            cols[c] = pa.nulls(t.num_rows, i_types[c])
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def prep_intervals(t: pa.Table) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        k = t[key_col].to_numpy(zero_copy_only=False)
        src, bins = _explode_spans(lo, hi, bin_width, max_bins,
                                   "keyed_range_join")
        take = pa.array(src, pa.int64())
        n = len(src)
        cols = {"__kb": pa.array(bucket_of(k[src], b), pa.int64()),
                "__bin": pa.array(bins, pa.int64()),
                "__key": t[key_col].take(take),
                "__v": pa.nulls(n, pa.float64()),
                "__lo": pa.array(lo[src].astype(np.float64)),
                "__hi": pa.array(hi[src].astype(np.float64))}
        for c in point_cols:
            cols[c] = pa.nulls(n, p_types[c])
        for c in interval_cols:
            cols[c] = t[c].take(take)
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    unioned = coalesced(
        points_ds.map_batches(prep_points, batch_format="pyarrow")
        .union(intervals_ds.map_batches(prep_intervals,
                                        batch_format="pyarrow")))

    out_types = {**p_types, **i_types}
    out_schema = pa.schema([(c, out_types[c])
                            for c in point_cols + interval_cols])

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        is_p = pc.equal(t["__side"], 0)
        pts = t.filter(is_p)
        ivs = t.filter(pc.invert(is_p))
        if pts.num_rows == 0 or ivs.num_rows == 0:
            return out_schema.empty_table()
        v = pts["__v"].to_numpy(zero_copy_only=False)
        lo = ivs["__lo"].to_numpy(zero_copy_only=False)
        hi = ivs["__hi"].to_numpy(zero_copy_only=False)
        pk = pts["__key"].to_numpy(zero_copy_only=False)
        ik = ivs["__key"].to_numpy(zero_copy_only=False)
        hit = ((pk[:, None] == ik[None, :])
               & (v[:, None] >= lo[None, :]) & (v[:, None] <= hi[None, :]))
        pi, ii = np.nonzero(hit)
        cols = {c: pts[c].take(pa.array(pi, pa.int64())) for c in point_cols}
        for c in interval_cols:
            cols[c] = ivs[c].take(pa.array(ii, pa.int64()))
        return pa.table(cols).cast(out_schema)

    return (unioned.groupby(["__kb", "__bin"])
            .map_groups(match, batch_format="pyarrow"))


def funnel(ds, stages: list[str], key_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           n_buckets: int | None = None):
    """Ordered funnel: for each key, stage i+1 counts only if an event
    of that type occurs AT OR AFTER the key's first qualifying stage-i
    event (min-ts semantics, ties pass). Returns one row per stage:
    (stage: string, n_keys: int64) — how many keys reached it.

    One bucketed exchange over only the funnel-relevant events (rows
    of other types are dropped pre-shuffle); the per-bucket kernel
    walks the stages with vectorized pandas min-merges, then a tiny
    per-stage partial-count reduce — the standard product-analytics
    op expressed as combiner + narrow groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if not stages:
        raise ValueError("stages must be non-empty")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t[type_col], pa.array(stages)))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: t[key_col],
            "__ts": t[ts_col].cast(pa.timestamp("us")),
            "__typ": t[type_col],
            "__b": pa.array(bucket_of(keys, b), pa.int64()),
        })

    def kernel(df: pd.DataFrame) -> pa.Table:
        cur = None  # per-key frontier ts of the previous stage
        counts = []
        for s in stages:
            ev = df[df["__typ"] == s][[key_col, "__ts"]]
            if cur is not None:
                ev = ev.merge(cur, on=key_col)
                ev = ev[ev["__ts"] >= ev["__prev"]]
                ev = ev[[key_col, "__ts"]]
            cur = (ev.groupby(key_col, as_index=False)["__ts"].min()
                   .rename(columns={"__ts": "__prev"}))
            counts.append(len(cur))
        return arrow_table(pd.DataFrame({
            "stage": stages,
            "n_keys": np.array(counts, np.int64)}))

    import ray.data as rd
    # zero-count seed: every stage row exists even when no qualifying
    # events do (the SQL mirror always returns len(stages) rows)
    seed = rd.from_arrow(pa.table({
        "stage": pa.array(stages, pa.string()),
        "n_keys": pa.array(np.zeros(len(stages), np.int64))}))
    partials = (coalesced(ds.map_batches(prep, batch_format="pyarrow"))
                .groupby("__b").map_groups(kernel, batch_format="pandas"))
    return (partials.union(seed).groupby("stage")
            .aggregate(Sum("n_keys", alias_name="n_keys")))


def retention_cohorts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      day_us: int = 86_400_000_000,
                      n_buckets: int | None = None):
    """Cohort retention matrix: keys are cohorted by the day of their
    FIRST event; each (key, active-day) pair then counts once toward
    (cohort_day, day_offset). One bucketed exchange by key — the
    per-bucket kernel derives first-day + distinct active days and
    emits per-(cohort, offset) PARTIAL counts, so the final reduce
    sees (cohorts x offsets) rows per bucket, not per-key rows.

    Output: (cohort_day: int64, day_offset: int64, n_keys: int64).
    """
    from ray.data.aggregate import Sum

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def prep(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        us = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            key_col: t[key_col],
            "__day": pa.array(us // day_us, pa.int64()),
            "__b": pa.array(bucket_of(keys, b), pa.int64()),
        })

    def kernel(df: pd.DataFrame) -> pa.Table:
        d = df[[key_col, "__day"]].drop_duplicates()
        first = (d.groupby(key_col, as_index=False)["__day"].min()
                 .rename(columns={"__day": "__cohort"}))
        j = d.merge(first, on=key_col)
        out = (j.assign(day_offset=j["__day"] - j["__cohort"])
               .groupby(["__cohort", "day_offset"], as_index=False)
               .size().rename(columns={"__cohort": "cohort_day",
                                       "size": "n_keys"}))
        out["n_keys"] = out["n_keys"].astype(np.int64)
        return arrow_table(out)

    partials = (coalesced(ds.map_batches(prep, batch_format="pyarrow"))
                .groupby("__b").map_groups(kernel, batch_format="pandas"))
    return (partials.groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n_keys", alias_name="n_keys")))


def time_weighted(ds, key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", tiebreak_col: str = "event_id",
                  quant: int = 10_000, n_buckets: int | None = None):
    """Per-key time-weighted value aggregate: each event's value holds
    until the key's next event; the last event holds nothing. Values
    quantize to integer units (``floor(v * quant)``) and durations are
    integer microseconds, so the weighted sum is an exact int64 and
    the SQL lead() mirror matches bit-for-bit (callers divide
    wsum/duration for the average).

    Output: (key, n_intervals: int64, wsum_q: int64, dur_us: int64).
    Same single-exchange shape and partitioning contract as lag_rank.
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vq = np.floor(df[value_col].to_numpy() * quant).astype(np.int64)
        same_next = np.concatenate((keys[1:] == keys[:-1], [False]))
        dt = np.concatenate((np.diff(ts), [0]))
        dt = np.where(same_next, dt, 0)
        # n_intervals counts positive holding times only (a ts tie
        # yields dt = 0 and contributes nothing — matches the SQL
        # lead() mirror's dt > 0 predicate)
        out = (pd.DataFrame({key_col: keys,
                             "__n": (dt > 0).astype(np.int64),
                             "__w": vq * dt, "__d": dt})
               .groupby(key_col, as_index=False).sum())
        out.columns = [key_col, "n_intervals", "wsum_q", "dur_us"]
        return arrow_table(out)

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def rolling_sum(ds, window: int, key_col: str = "user_id",
                ts_col: str = "ts", value_col: str = "value",
                tiebreak_col: str = "event_id", quant: int = 10_000,
                n_buckets: int | None = None):
    """Per-key ROWS-frame window aggregate: for each row, the sum of
    the quantized value over the frame ``window - 1 PRECEDING ..
    CURRENT ROW`` in (ts, tiebreak) order — the moving-sum/moving-
    average primitive. Values quantize to integers (``floor(v *
    quant)``), so the prefix-difference kernel is exact and the SQL
    ``sum() OVER (... ROWS BETWEEN n PRECEDING AND CURRENT ROW)``
    mirror matches bit-for-bit.

    Same single-exchange shape as lag_rank: bucket by key hash, one
    sorted numpy kernel per bucket (per-key cumulative sums minus the
    lagged cumulative, frames clipped at each key's start — never a
    per-key loop).

    Output: (tiebreak_col, key_col, n_in_frame: int64, roll_q: int64).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        m = len(keys)
        vq = np.floor(df[value_col].to_numpy() * quant).astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - start  # 0-based in-key rank
        cum = np.cumsum(vq)
        # frame start index, clipped at the key boundary
        f0 = np.maximum(start, idx - (window - 1))
        prev = np.where(f0 > 0, cum[f0 - 1], 0)
        # rows before the key's first row must not leak in: when
        # f0 == start, cum[f0-1] is the PREVIOUS key's cumulative
        roll = cum - prev
        n_in = idx - f0 + 1
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys,
            "n_in_frame": n_in.astype(np.int64),
            "roll_q": roll.astype(np.int64)}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def session_ids(ds, key_col: str = "user_id", ts_col: str = "ts",
                gap_s: float = 1800.0, tiebreak_col: str = "event_id",
                n_buckets: int | None = None):
    """Sessionized event ENRICHMENT: every row gets its key's session
    ordinal (1-based, new session when the gap to the previous event
    exceeds ``gap_s``) — the row-level dual of ``session_windows``'s
    per-session aggregate, for grouping downstream work by session.
    Same single-exchange shape as lag_rank.

    Output: (tiebreak_col, key_col, session_seq: int64).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        m = len(keys)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        gap = np.concatenate(([0], np.diff(ts))) > gap_s * 1e6
        brk = (new_key | gap).astype(np.int64)
        s = np.cumsum(brk)
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        seq = s - s[start] + 1  # per-key ordinal (1 at the key's start)
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys, "session_seq": seq.astype(np.int64)}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def transition_counts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      state_col: str = "event_type",
                      tiebreak_col: str = "event_id",
                      n_buckets: int | None = None):
    """First-order transition matrix of a per-key event stream:
    counts of consecutive (state -> next state) pairs across all
    keys. One bucketed exchange; the per-bucket kernel emits PARTIAL
    pair counts (states x states rows per bucket), then a tiny
    groupby-sum — the Markov-chain estimation shape.

    States must be strings (the empty-bucket schema pin below is
    typed; see util.arrow_table for why pinning matters).

    Output: (from_state, to_state, n: int64).
    """
    from ray.data.aggregate import Sum

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b), pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        st = df[state_col].to_numpy()
        same = keys[1:] == keys[:-1] if len(keys) else np.empty(0, bool)
        pairs = pd.DataFrame({"from_state": st[:-1][same],
                              "to_state": st[1:][same]})
        if not len(pairs):
            # all keys in this bucket are singletons: pin the schema so
            # the downstream groupby never sees null-typed columns
            return pa.table({"from_state": pa.array([], pa.string()),
                             "to_state": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = (pairs.groupby(["from_state", "to_state"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return arrow_table(out)

    partials = (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
                .groupby("__b").map_groups(kernel, batch_format="pandas"))
    return (partials.groupby(["from_state", "to_state"])
            .aggregate(Sum("n", alias_name="n")))


def rolling_anomaly(ds, window: int, z_num: int = 2, min_n: int = 3,
                    key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value",
                    tiebreak_col: str = "event_id", quant: int = 100,
                    n_buckets: int | None = None):
    """Per-key windowed z-score anomaly flag — streaming outlier
    detection over event values: a row is anomalous when its quantized
    value deviates from its ROWS-frame mean (``window - 1 PRECEDING ..
    CURRENT ROW``) by more than ``z_num`` population standard
    deviations, with at least ``min_n`` rows in the frame.

    The test is EXACT INTEGER arithmetic — |v - s/n| > z*std is
    algebraically cleared of divisions to
    ``(n*v - s)^2 > z^2 * (n*ssq - s^2)`` over int64 frame sums
    (s = sum, ssq = sum of squares), so the SQL window mirror matches
    bit-for-bit with no float tolerance. Same single-exchange shape as
    rolling_sum: bucket by key hash, one sorted prefix-difference
    kernel per bucket (cumulative v and v^2), never a per-key loop.

    Output: (tiebreak_col, key_col, n_in_frame: int64, flag: int64).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col],
                            kind="mergesort")
        keys = df[key_col].to_numpy()
        m = len(keys)
        vq = np.floor(df[value_col].to_numpy() * quant).astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        f0 = np.maximum(start, idx - (window - 1))
        cum = np.cumsum(vq)
        cum2 = np.cumsum(vq * vq)
        s = cum - np.where(f0 > 0, cum[f0 - 1], 0)
        ssq = cum2 - np.where(f0 > 0, cum2[f0 - 1], 0)
        n = idx - f0 + 1
        lhs = (n * vq - s) ** 2
        rhs = z_num * z_num * (n * ssq - s * s)
        flag = ((n >= min_n) & (lhs > rhs)).astype(np.int64)
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys,
            "n_in_frame": n.astype(np.int64),
            "flag": flag}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def event_sequences(ds, key_col: str = "user_id", ts_col: str = "ts",
                    val_col: str = "event_type",
                    tiebreak_col: str = "event_id", sep: str = ">",
                    n_buckets: int | None = None):
    """Ordered per-key sequence construction — string_agg(val, sep
    ORDER BY ts, tiebreak): the session/behavior-sequence builder that
    turns event streams into training examples. One bucketed exchange;
    inside each bucket a C-level pandas groupby joins the pre-sorted
    values (never a per-key python loop over rows).

    Output: (key_col, n: int64, seq: string).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col],
                            kind="mergesort")
        g = df.groupby(key_col, sort=True)[val_col]
        out = pd.DataFrame({
            "n": g.size().astype(np.int64),
            "seq": g.agg(sep.join)}).reset_index()
        return arrow_table(out[[key_col, "n", "seq"]])

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def interval_coverage(ds, key_col: str, lo_col: str, hi_col: str,
                      tiebreak_col: str, n_buckets: int | None = None):
    """Per-key interval-UNION length — merge overlapping [lo, hi]
    intervals and report total covered span plus the merged-island
    count (time-coverage dedup: "how much wall-clock does this user's
    activity actually cover?").

    Incremental-union kernel, fully vectorized: sort by (key, lo,
    tiebreak); each row contributes ``max(0, hi - max(lo, m))`` where
    ``m`` is the running max of earlier hi values within the key (a
    C-level pandas per-group cummax — resets at key borders without
    the offset trick, which would overflow int64 for microsecond
    timestamps x many keys); a row opens a new island when ``lo > m``.
    One bucketed exchange; int64 arithmetic end to end, so the SQL
    window-frame mirror is exact.

    Output: (key_col, n_islands: int64, covered: int64).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, lo_col, tiebreak_col],
                            kind="mergesort")
        keys = df[key_col].to_numpy()
        lo = df[lo_col].to_numpy().astype(np.int64)
        hi = df[hi_col].to_numpy().astype(np.int64)
        m = len(keys)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        gid = np.cumsum(new_key) - 1
        run = pd.Series(hi).groupby(gid).cummax().to_numpy()
        prev = np.concatenate(([0], run[:-1]))
        sentinel = np.iinfo(np.int64).min
        prev[new_key] = sentinel  # no earlier hi within the key
        contrib = np.maximum(0, hi - np.maximum(lo, prev))
        island = (lo > prev).astype(np.int64)
        nk = int(gid[-1]) + 1 if m else 0
        cov = np.zeros(nk, np.int64)
        isl = np.zeros(nk, np.int64)
        np.add.at(cov, gid, contrib)
        np.add.at(isl, gid, island)
        return arrow_table(pd.DataFrame({
            key_col: keys[new_key], "n_islands": isl, "covered": cov}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def ewma(ds, key_col: str = "user_id", ts_col: str = "ts",
         value_col: str = "value", tiebreak_col: str = "event_id",
         num: int = 3, den: int = 4, quant: int = 100,
         n_buckets: int | None = None):
    """Per-key exponentially weighted moving average — the sequential
    streaming-state recurrence family: ``s_1 = vq_1`` and
    ``s_t = (num * s_{t-1} + (den - num) * vq_t) // den`` over
    quantized int64 values in (ts, tiebreak) order. Pure integer
    floor arithmetic on non-negative operands, so the SQL RECURSIVE
    CTE mirror reproduces every step bit-for-bit.

    The kernel vectorizes ACROSS KEYS: after one sort, step t updates
    row t of every key simultaneously (gather from the previous row,
    one vector op per step) — the loop is over the MAX per-key depth,
    never over rows or keys.

    Output: (tiebreak_col, key_col, vq: int64, ewma_q: int64).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col],
                            kind="mergesort")
        keys = df[key_col].to_numpy()
        m = len(keys)
        vq = np.floor(df[value_col].to_numpy() * quant).astype(np.int64)
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(m, dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        rn = idx - start
        s = vq.copy()
        max_rn = int(rn.max()) if m else 0
        for t in range(1, max_rn + 1):
            pos = np.nonzero(rn == t)[0]
            s[pos] = (num * s[pos - 1] + (den - num) * vq[pos]) // den
        return arrow_table(pd.DataFrame({
            tiebreak_col: df[tiebreak_col].to_numpy(),
            key_col: keys, "vq": vq, "ewma_q": s}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def ohlc(ds, key_col: str = "user_id", ts_col: str = "ts",
         value_col: str = "value", tiebreak_col: str = "event_id",
         bucket_s: int = 3600, n_buckets: int | None = None):
    """Time-bucketed OHLC — per (key, time bucket): the first (open),
    max (high), min (low), and last (close) value in (ts, tiebreak)
    order, plus the row count. Open/close are order-statistics
    selections, not arithmetic, so raw float values compare exactly
    across engines. One bucketed exchange; first/last come from a
    C-level sorted drop_duplicates, min/max from a groupby — never a
    per-key loop.

    Output: (key_col, bucket_id: int64, n: int64, open/high/low/close
    double).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(__bid=ts // (bucket_s * 1_000_000))
        df = df.sort_values([key_col, "__bid", ts_col, tiebreak_col],
                            kind="mergesort")
        g = df.groupby([key_col, "__bid"], sort=False)[value_col]
        first = g.first()
        last = g.last()
        agg = g.agg(["size", "max", "min"])
        out = pd.DataFrame({
            "n": agg["size"].astype(np.int64),
            "open": first, "high": agg["max"],
            "low": agg["min"], "close": last}).reset_index()
        out = out.rename(columns={"__bid": "bucket_id"})
        return arrow_table(out)

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def gap_fill(ds, key_col: str, ts_col: str, bucket_s: float,
             count_col: str = "n_events", max_buckets: int = 100_000,
             n_buckets: int | None = None):
    """Dense per-key time grid with zero-filled gaps: one output row
    per (key, bucket) for EVERY bucket between the key's first and
    last event — the missing-bucket densification every
    windowed-metrics pipeline needs before rates/anomaly scoring
    (a groupby alone silently drops empty buckets).

    Plan shape: per-batch (key, bucket) partial counts combine before
    one groupby exchange; per-key [min, max] bucket ranges reduce from
    those narrow rows (second exchange is O(distinct key-buckets));
    the dense grid replicates from the ranges with the shared
    grouped-arange explode (``_explode_spans`` — vectorized, keys
    spanning more than ``max_buckets`` are dropped with a log line,
    never silently); actual counts meet the grid in a bucketed left
    join, nulls zero-fill. No stage ever materializes rows per EVENT
    — only per (key, bucket).
    """
    from ray.data.aggregate import Max, Min, Sum

    from .util import coalesced
    from .joins import hash_join

    bucket_us = int(bucket_s * 1e6)

    def partial(t: pa.Table) -> pa.Table:
        us = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        b = us // bucket_us  # integer floor-div: exact at boundaries
        g = (pa.table({key_col: t[key_col],
                       "bucket": pa.array(b, pa.int64())})
             .group_by([key_col, "bucket"]).aggregate([("bucket", "count")]))
        return g.rename_columns([key_col, "bucket", "c"])

    counts = (coalesced(ds.map_batches(partial, batch_format="pyarrow"))
              .groupby([key_col, "bucket"])
              .aggregate(Sum("c", alias_name=count_col))
              .materialize())  # consumed twice: ranges + join
    ranges = (counts.groupby(key_col)
              .aggregate(Min("bucket", alias_name="bmin"),
                         Max("bucket", alias_name="bmax")))

    def explode(t: pa.Table) -> pa.Table:
        lo = t["bmin"].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t["bmax"].to_numpy(zero_copy_only=False).astype(np.float64)
        src, bins = _explode_spans(lo, hi, 1.0, max_buckets, "gap_fill")
        return pa.table({key_col: t[key_col].take(pa.array(src, pa.int64())),
                         "bucket": pa.array(bins, pa.int64())})

    grid = ranges.map_batches(explode, batch_format="pyarrow")
    out = hash_join(grid, counts, on=[key_col, "bucket"], how="left",
                    n_buckets=n_buckets or 32)

    def zero_fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            key_col: t[key_col], "bucket": t["bucket"],
            count_col: pc.fill_null(t[count_col].cast(pa.int64()),
                                    pa.scalar(0, pa.int64()))})

    return out.map_batches(zero_fill, batch_format="pyarrow")


def rolling_active(ds, user_col: str = "user_id", ts_col: str = "ts",
                   window_days: int = 7,
                   n_buckets: int | None = None):
    """DAU / trailing-window active users — the product-analytics
    staple (WAU/MAU): for every observed day, the count of distinct
    users active that day (dau) and within the trailing
    ``window_days`` window ending that day (wau).

    Set-distinct shapes throughout, never per-event rows past the
    first combine: per-batch DISTINCT (user, day) pairs -> one
    distinct exchange; each surviving pair then claims membership for
    the ``window_days`` target days it covers (a bounded vectorized
    explode — window length is a query constant, not data-scale) ->
    a second distinct exchange -> per-day counts from per-batch
    partials. Output days are restricted to OBSERVED days (inner
    join), matching the SQL mirror.

    Output: ``(day: int64 epoch-day, dau: int64, wau: int64)``.
    """
    from ray.data.aggregate import Sum

    from .joins import distinct_rows, hash_join

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")

    def pairs(t: pa.Table) -> pa.Table:
        us = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        d = us // 86_400_000_000
        g = (pa.table({"u": t[user_col], "d": pa.array(d, pa.int64())})
             .group_by(["u", "d"]).aggregate([]))
        return g

    ud = distinct_rows(
        coalesced(ds.map_batches(pairs, batch_format="pyarrow")),
        ["u", "d"], n_buckets).materialize()  # consumed 3x below

    def day_count(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False)
        un, cn = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(un, pa.int64()),
                         "dau": pa.array(cn.astype(np.int64), pa.int64())})

    dau = (ud.map_batches(day_count, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("dau", alias_name="dau")))

    def explode_window(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        n = len(u)
        rep = np.repeat(np.arange(n), window_days)
        off = np.tile(np.arange(window_days, dtype=np.int64), n)
        return pa.table({"u": pa.array(u[rep]),
                         "d": pa.array(d[rep] + off, pa.int64())})

    w = distinct_rows(ud.map_batches(explode_window,
                                     batch_format="pyarrow"),
                      ["u", "d"], n_buckets)

    def wau_count(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False)
        un, cn = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(un, pa.int64()),
                         "wau": pa.array(cn.astype(np.int64), pa.int64())})

    wau = (w.map_batches(wau_count, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("wau", alias_name="wau")))

    # inner join restricts to observed days (window explode also
    # creates future phantom days — a day with no events reports no row)
    return hash_join(dau, wau, on="day", n_buckets=n_buckets)


def interp_resample(ds, key_col: str, ts_col: str, value_col: str,
                    id_col: str, bucket_s: float,
                    max_buckets: int = 100_000,
                    n_buckets: int | None = None):
    """Per-key LINEAR interpolation onto a regular time grid — the
    third member of the densification family (gap_fill zero-fills,
    locf_fill carries forward, this one interpolates): every grid
    instant ``g*bucket`` between a key's first and last event gets the
    value linearly interpolated between its surrounding events. The
    resampling step of sensor/trajectory/metrics alignment.

    Exactness contract: ``value_col`` must be integer-quantized
    upstream (the running_total contract); the interpolated value is
    ``vp + trunc((vn - vp)*(g - tp) / (tn - tp))`` with EXPLICIT
    toward-zero integer division (sign * (abs // den)) — pure int64
    on both engines, so the SQL mirror is bit-identical. Duplicate
    timestamps within a key collapse to the max-``id_col`` event
    (last-write-wins, deterministic); a grid instant that hits an
    event exactly returns that event's value.

    Plan shape: ONE bucketed exchange (hash(key) — interpolation needs
    each key's full event set co-located, the sessionize layout); the
    per-bucket kernel is fully vectorized across keys AND grid points
    via structured-array searchsorted over the (key_rank, ts) compound
    (the triangle-closing-probe trick — no per-key Python loop). Keys
    whose grid would exceed ``max_buckets`` rows drop with a log line
    (never silently).

    Output: ``(key, bucket: int64 grid index, v_q: int64)``.
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    bucket_us = int(bucket_s * 1e6)

    def add_bucket(t: pa.Table) -> pa.Table:
        us = (t[ts_col].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            key_col: t[key_col],
            "__t": pa.array(us, pa.int64()),
            "__v": t[value_col].cast(pa.int64()),
            "__e": t[id_col].cast(pa.int64()),
            "__b": pa.array(bucket_of(
                t[key_col].to_numpy(zero_copy_only=False), b),
                pa.int64())})

    def kernel(df: pd.DataFrame) -> pa.Table:
        k = df[key_col].to_numpy()
        ts = df["__t"].to_numpy().astype(np.int64)
        v = df["__v"].to_numpy().astype(np.int64)
        e = df["__e"].to_numpy().astype(np.int64)
        order = np.lexsort((e, ts, k))
        k, ts, v = k[order], ts[order], v[order]
        # last-write-wins per (key, ts): keep the final row of each run
        last = np.ones(len(k), bool)
        if len(k) > 1:
            last[:-1] = (k[1:] != k[:-1]) | (ts[1:] != ts[:-1])
        k, ts, v = k[last], ts[last], v[last]
        first = np.ones(len(k), bool)
        if len(k) > 1:
            first[1:] = k[1:] != k[:-1]
        rank = np.cumsum(first) - 1  # dense key index, sorted order
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(k))
        gmin = (ts[starts] + bucket_us - 1) // bucket_us
        gmax = ts[ends - 1] // bucket_us
        cnt = np.maximum(gmax - gmin + 1, 0)
        over = cnt > max_buckets
        if over.any():
            print(f"interp_resample: skipped {int(over.sum())} keys "
                  f"spanning > {max_buckets} grid rows")
            cnt = np.where(over, 0, cnt)
        total = int(cnt.sum())
        if total == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "v_q": pa.array(
                                 np.empty(0, np.int64), pa.int64())})
        src = np.repeat(np.arange(len(cnt)), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        g = gmin[src] + (np.arange(total, dtype=np.int64)
                         - np.repeat(offs, cnt))
        gt = g * bucket_us
        a = np.empty(len(k), dtype=[("r", np.int64), ("t", np.int64)])
        a["r"], a["t"] = rank, ts
        q = np.empty(total, dtype=[("r", np.int64), ("t", np.int64)])
        q["r"], q["t"] = src, gt
        # grid instants lie inside [first, last], so both probes stay
        # within the key's own segment of the compound-sorted array
        pi = np.searchsorted(a, q, side="right") - 1
        ni = np.searchsorted(a, q, side="left")
        tp, tn = ts[pi], ts[ni]
        vp, vn = v[pi], v[ni]
        num = (vn - vp) * (gt - tp)
        den = np.maximum(tn - tp, 1)
        interp = vp + np.sign(num) * (np.abs(num) // den)
        out = np.where(tn == tp, vp, interp)
        return pa.table({key_col: pa.array(k[starts][src]),
                         "bucket": pa.array(g, pa.int64()),
                         "v_q": pa.array(out, pa.int64())})

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def locf_fill(sparse_ds, key_col: str, bucket_col: str, value_col: str,
              max_buckets: int = 100_000, n_buckets: int | None = None):
    """Last-observation-carried-forward over a dense per-key bucket
    grid: given SPARSE (key, bucket, value) observations, emit one row
    per (key, bucket) for every bucket between the key's first and
    last observation, carrying the latest observed value forward into
    the gaps — the time-series forward-fill (LOCF) primitive,
    composed from the gap-fill grid explode and a per-key vectorized
    fill kernel.

    Plan shape: per-key [min, max] ranges reduce from the sparse rows
    (tiny); the dense grid replicates via the shared grouped-arange
    explode (keys spanning > ``max_buckets`` drop with a log line);
    observations meet the grid in a bucketed left join; ONE per-key
    map_groups runs the fill as two numpy passes (sort +
    maximum.accumulate over observed indices) — never a Python row
    loop. The grid starts at a real observation, so every output row
    has a value.
    """
    from ray.data.aggregate import Max, Min

    import pyarrow.compute as pc

    from .joins import hash_join

    ranges = (sparse_ds.groupby(key_col)
              .aggregate(Min(bucket_col, alias_name="bmin"),
                         Max(bucket_col, alias_name="bmax")))

    def explode(t: pa.Table) -> pa.Table:
        lo = t["bmin"].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t["bmax"].to_numpy(zero_copy_only=False).astype(np.float64)
        src, bins = _explode_spans(lo, hi, 1.0, max_buckets, "locf_fill")
        return pa.table({key_col: t[key_col].take(pa.array(src, pa.int64())),
                         bucket_col: pa.array(bins, pa.int64())})

    grid = ranges.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(grid, sparse_ds, on=[key_col, bucket_col],
                       how="left", n_buckets=n_buckets or 32)

    def fill(t: pa.Table) -> pa.Table:
        order = np.argsort(t[bucket_col].to_numpy(zero_copy_only=False),
                           kind="stable")
        v = t[value_col].to_numpy(zero_copy_only=False)[order]
        valid = ~pd.isna(v)
        idx = np.where(valid, np.arange(len(v)), 0)
        np.maximum.accumulate(idx, out=idx)
        filled = pa.array(
            np.where(valid, v, 0)[idx].astype(np.int64), pa.int64())
        return pa.table({
            key_col: t[key_col].take(pa.array(order, pa.int64())),
            bucket_col: t[bucket_col].take(pa.array(order, pa.int64())),
            value_col: filled})

    return joined.groupby(key_col).map_groups(fill, batch_format="pyarrow")


def activity_islands(ds, key_col: str, day_col: str,
                     n_buckets: int | None = None):
    """Per-key gaps-and-islands: group each key's DISTINCT day values
    into maximal runs of consecutive integers and report one row per
    run — (key, start_day, end_day, n_days). The classic streak /
    retention-run primitive (SQL: GROUP BY day - row_number()).

    One bucketed exchange on the key hash; the in-bucket kernel is a
    C-level pandas pipeline (sort -> drop_duplicates -> the day - rank
    island id -> groupby min/max/count), never a per-key Python loop.
    Input rows may carry duplicate (key, day) pairs — the kernel
    dedups them inside the bucket, so no separate DISTINCT exchange is
    needed (a key's rows always co-locate).
    """
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        # per-batch combiner dedup: only unique (key, day) pairs cross
        g = (t.select([key_col, day_col])
             .group_by([key_col, day_col]).aggregate([]))
        keys = g[key_col].to_numpy(zero_copy_only=False)
        return g.append_column("__b", pa.array(bucket_of(keys, b),
                                               pa.int64()))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = (df[[key_col, day_col]]
              .drop_duplicates()
              .sort_values([key_col, day_col], kind="mergesort")
              .reset_index(drop=True))
        rn = df.groupby(key_col, sort=False).cumcount()
        island = df[day_col].to_numpy() - rn.to_numpy()
        g = df.groupby([df[key_col], island], sort=False)[day_col]
        out = pd.DataFrame({
            key_col: g.min().index.get_level_values(0),
            "start_day": g.min().to_numpy(),
            "end_day": g.max().to_numpy(),
            "n_days": g.size().to_numpy().astype(np.int64)})
        return arrow_table(out)

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def cusum_range(ds, key_col: str = "user_id", ts_col: str = "ts",
                val_col: str = "value", tiebreak_col: str = "event_id",
                quant: int = 100, n_buckets: int | None = None):
    """Per-key CUSUM change-point statistic: the range (max - min) of
    the running sum of deviations from the key's own integer mean
    target (``target = Σv // n``, trunc) over (ts, tiebreak) order —
    large ranges flag level shifts in the series. All arithmetic is
    int64 on quantized values, so the statistic is order-exact and a
    SQL window mirror (running sum over the same order, same trunc
    target) reproduces it bit-for-bit.

    ONE bucketed exchange + a per-bucket sorted numpy kernel (cumsum
    with per-key offsets subtracted; never a per-key loop).
    Output: (key_col, n: int64, cusum_range_q: int64).
    """
    from ..functions.hashing import bucket_any

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key_col: t[key_col], ts_col: t[ts_col],
            tiebreak_col: t[tiebreak_col],
            "vq": pa.array(np.floor(v * quant).astype(np.int64), pa.int64()),
            "__b": pa.array(bucket_any(keys, b), pa.int64())})

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key_col, ts_col, tiebreak_col],
                            kind="mergesort")
        keys = df[key_col].to_numpy()
        vq = df["vq"].to_numpy()
        new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(new_key)
        n = np.diff(np.append(starts, len(keys))).astype(np.int64)
        sv = np.add.reduceat(vq, starts).astype(np.int64)
        # integer target per key; deviations sum to a small remainder,
        # not exactly zero — both engines carry the same remainder
        target = np.sign(sv) * (np.abs(sv) // n)
        dev = vq - np.repeat(target, n)
        cs = np.cumsum(dev)
        # subtract the running total accumulated BEFORE each key
        prev = np.concatenate(([0], cs))[starts]
        cs = cs - np.repeat(prev, n)
        hi = np.maximum.reduceat(np.maximum(cs, 0), starts)
        lo = np.minimum.reduceat(np.minimum(cs, 0), starts)
        return arrow_table(pd.DataFrame({
            key_col: keys[starts], "n": n,
            "cusum_range_q": (hi - lo).astype(np.int64)}))

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))


def decayed_counts(ds, half_life_s: int = 172_800,
                   ts_col: str = "ts", key_col: str = "user_id",
                   val_col: str = "value", scale: int = 100):
    """Exponential-decay (half-life) value totals per key — the
    feature-store freshness-weighting primitive: each event
    contributes ``floor(value * scale) >> age_bins`` where
    ``age_bins = (max_ts - ts) // half_life`` counts whole half-lives
    before the corpus watermark. Integer halving makes the decay
    EXACT (no float exp), so per-key sums are order-independent and
    the SQL mirror is bit-equal; shifts cap at 62 (older events
    contribute 0).

    Scale shape: one driver scalar (the global max event time — the
    q22 broadcast-scalar pattern), one stateless partial map (per-key
    in-batch combine), one narrow groupby sum. Output:
    ``(key, n: int64, decayed_q: int64)``."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    mx = ds.max(ts_col)
    mx_us = int(pa.scalar(mx, pa.timestamp("us")).value)
    hl_us = int(half_life_s) * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False)
        vq = np.floor(v * scale).astype(np.int64)
        bins = np.minimum((mx_us - ts) // hl_us, 62).astype(np.int64)
        contrib = vq >> bins
        k = t[key_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, contrib)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({key_col: pa.array(uk),
                         "n": pa.array(n, pa.int64()),
                         "decayed_q": pa.array(s, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("decayed_q", alias_name="decayed_q")))


def basket_pairs(ds, bucket_s: int = 3600, min_support: int = 1,
                 ts_col: str = "ts", key_col: str = "user_id",
                 item_col: str = "event_type"):
    """Pairwise frequent-itemset support (market-basket analysis):
    a basket = one (key, time bucket); every unordered item pair
    co-occurring in a basket counts one support. Scale shape: the
    batch partial dedups (basket, item) rows, ONE groupby on a packed
    basket key enumerates in-basket pairs (items per basket are
    catalog-bounded, so the pair fan-out is bounded per group), and a
    second narrow groupby sums per-pair support. Output:
    ``(item_a, item_b, n)`` with item_a < item_b and n >= min_support.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    bs_us = int(bucket_s) * 1_000_000

    def dedup_batch(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hb = ts // bs_us
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # packed basket key: key * 2^40 + bucket (epoch buckets are
        # far below 2^40 for any realistic bucket_s)
        bk = k * (1 << 40) + hb
        g = (pa.table({"bk": pa.array(bk, pa.int64()),
                       "item": t[item_col]})
             .group_by(["bk", "item"]).aggregate([]))
        return g

    def pairs_in_basket(df) -> pa.Table:
        items = np.sort(np.unique(df["item"].to_numpy()))
        m = len(items)
        if m < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(m, k=1)
        pair = np.char.add(np.char.add(items[ia].astype(str), "\x1f"),
                           items[ib].astype(str))
        return pa.table({"pair": pa.array(pair, pa.string()),
                         "c": pa.array(np.ones(len(pair), np.int64))})

    from .util import coalesced
    per_basket = (coalesced(ds.map_batches(dedup_batch,
                                           batch_format="pyarrow"))
                  .groupby("bk")
                  .map_groups(pairs_in_basket, batch_format="pandas"))
    agg = (per_basket.groupby("pair")
           .aggregate(Sum("c", alias_name="n"))
           .filter(expr=f"n >= {int(min_support)}"))

    def unpack(t: pa.Table) -> pa.Table:
        import polars as pl
        p = pl.from_arrow(t["pair"].combine_chunks()
                          if isinstance(t["pair"], pa.ChunkedArray)
                          else t["pair"]).str.split_exact("\x1f", 1)
        f = p.struct.unnest()
        return pa.table({
            "item_a": f["field_0"].to_arrow().cast(pa.string()),
            "item_b": f["field_1"].to_arrow().cast(pa.string()),
            "n": t["n"]})

    return agg.map_batches(unpack, batch_format="pyarrow")
