"""Near-duplicate detection operators (SURVEY.md §2.8 'Deduplication'):
MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine
near-dup. Exact dedup lives in stages/spatial.py (dedup_exact).

Pipeline shape (the classic shingle -> minhash -> band -> bucket
groupby): signatures are computed batch-vectorized (numpy reduceat
over a flat shingle-hash array); band rows are the only thing
shuffled (b x 16 bytes per doc — never the text); candidate pairs are
verified inside the band groups by signature similarity; connected
components use iterative min-label propagation when the pair set is
large, driver union-find below a cap.

Scale notes: at 10^12 rows the bands groupby is the wide exchange —
the band key is (band_id, band_hash) which is uniformly distributed by
construction (hash values), so no salting is needed; pathological
all-identical corpora degenerate to one bucket per band, where the
``max_bucket`` guard switches pair enumeration to star-linking against
the bucket's min-id member (connectivity preserved for dedup, O(m)
output, logged via print + metrics counter — never silent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

from ..functions.hashing import splitmix64
from .util import arrow_table, coalesced

_MERSENNE = np.uint64((1 << 61) - 1)


def _log_star_bucket(m: int) -> None:
    """Observability for the over-full-bucket star fallback (never a
    silent cap): worker log line + metrics counter when available."""
    try:
        import ray
        ray.get_actor("osm2shp_metrics").inc_many.remote(
            {"lsh_star_buckets": 1, "lsh_star_members": m})
    except Exception:
        pass
    print(f"lsh: bucket of {m} members exceeded max_bucket -> "
          f"star-linked to its min-id member (connectivity preserved, "
          f"full pair enumeration skipped)")

def _dedup_pairs(pairs_ds, n_buckets: int = 1024):
    """Dedup (id_a, id_b) pairs surfaced by multiple bands: bucket by a
    pair hash, then one vectorized drop_duplicates per bucket — NOT a
    groupby over the pair key itself, which would invoke Python once
    per pair (measured: dominated the whole LSH runtime).

    n_buckets is deliberately well above the sort-partition count:
    with as many distinct bucket values as partitions, the sort's
    sampled range boundaries duplicate and empty reduce ranges emit
    zero-column blocks (the executor RefBundle schema warning — see
    hash_join's sort_blocks doc). 1024 avalanched values keep every
    boundary distinct while drop_dups stays one vectorized call per
    present bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        def h(col):
            if pa.types.is_integer(col.type):
                return splitmix64(
                    col.to_numpy(zero_copy_only=False).astype(np.uint64))
            c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return pl.from_arrow(c).hash(seed=23).to_numpy().astype(np.uint64)

        with np.errstate(over="ignore"):
            key = splitmix64(
                h(t["id_a"]) * np.uint64(0x9E3779B97F4A7C15) ^ h(t["id_b"]))
        return t.append_column("__pb", pa.array(
            (key % np.uint64(n_buckets)).astype(np.int64), pa.int64()))

    def drop_dups(df: pd.DataFrame) -> pa.Table:
        return arrow_table(df.sort_values(["id_a", "id_b"])
                           .drop_duplicates(["id_a", "id_b"])
                           .drop(columns="__pb"))

    return (pairs_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__pb").map_groups(drop_dups, batch_format="pandas"))



def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(texts, n: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Character n-gram shingles -> (flat uint64 hashes, doc offsets).
    Vectorized: one polars hash pass over the exploded shingle list."""
    s = pl.from_arrow(texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    low = s.str.to_lowercase()
    lens = low.str.len_chars().to_numpy().astype(np.int64)
    counts = np.maximum(lens - n + 1, 1)
    # build shingles with polars: slice per position is not vectorizable
    # across variable lengths in one expression; explode an index list
    df = pl.DataFrame({"t": low, "c": counts})
    exploded = (df.with_row_index("doc")
                  .with_columns(pl.int_ranges(0, pl.col("c")).alias("i"))
                  .explode("i")
                  .with_columns(pl.col("t").str.slice(pl.col("i"), n).alias("sh")))
    h = exploded["sh"].hash(seed=42).to_numpy().astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return h, offsets


def word_shingle_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """WORD n-gram shingles -> (flat uint64 hashes, doc offsets).
    Tokens are ASCII ``[a-zA-Z0-9_]+`` runs of the lowercased text (the
    exact token definition the SQL oracles use); an n-gram hash is the
    position-weighted mix of its n token hashes. Documents with fewer
    than n tokens contribute an EMPTY shingle set (matching the SQL
    ``CASE WHEN len(toks) >= n`` guard)."""
    s = pl.from_arrow(texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    toks = s.str.to_lowercase().str.extract_all(r"[a-z0-9_]+")
    lens = toks.list.len().to_numpy().astype(np.int64)
    flat = pl.Series(toks.explode().drop_nulls()).hash(seed=42).to_numpy().astype(np.uint64)
    counts = np.maximum(lens - n + 1, 0)
    out_off = np.concatenate(([0], np.cumsum(counts)))
    tok_off = np.concatenate(([0], np.cumsum(lens)))
    g = np.zeros(int(out_off[-1]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            # gather the j-th token of every shingle, vectorized across docs
            idx = (np.arange(len(g), dtype=np.int64)
                   - np.repeat(out_off[:-1], counts)
                   + np.repeat(tok_off[:-1], counts) + j)
            g = g * np.uint64(0x100000001B3) ^ splitmix64(flat[idx]) if len(g) else g
    return g, out_off


def minhash_signatures(texts, num_perm: int = 64, n: int = 5,
                       seed: int = 1, shingle_mode: str = "char") -> np.ndarray:
    """(num_docs, num_perm) uint64 MinHash signature matrix,
    batch-vectorized: (a*h+b mod p) broadcast then minimum.reduceat."""
    h, offsets = (shingle_hashes(texts, n) if shingle_mode == "char"
                  else word_shingle_hashes(texts, n))
    a, b = _perm_params(num_perm, seed)
    ndocs = len(offsets) - 1
    sig = np.empty((ndocs, num_perm), dtype=np.uint64)
    if len(h) == 0:
        sig[:] = _MERSENNE
        return sig
    counts = np.diff(offsets)
    empty = counts == 0
    # reduceat over NON-EMPTY docs' starts only: empty segments are
    # zero-width, so each non-empty start's segment still ends exactly
    # at the next non-empty start (clamping starts instead would steal
    # the last shingle from the doc PRECEDING a trailing empty doc —
    # a real signature-corruption bug caught in review)
    ne_starts = offsets[:-1][~empty]
    with np.errstate(over="ignore"):
        hv = (h % _MERSENNE)
        # chunk the permutation axis to bound the (num_perm x n_shingles)
        # temporary (memory-aware batching inside the batch)
        for p0 in range(0, num_perm, 16):
            p1 = min(p0 + 16, num_perm)
            vals = (a[p0:p1, None] * hv[None, :] + b[p0:p1, None]) % _MERSENNE
            if len(ne_starts):
                sig[~empty, p0:p1] = np.minimum.reduceat(
                    vals, ne_starts, axis=1).T
    sig[empty] = _MERSENNE  # empty shingle set -> sentinel signature
    return sig


def signature_similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    return (sig_a == sig_b).mean(axis=-1)


def sig_rows_batch(batch: pa.Table, text_col: str, id_col: str,
                   num_perm: int, n: int = 5,
                   shingle_mode: str = "char") -> pa.Table:
    """docs -> (id, sig list<int64>) — ONE minhash pass per doc; the
    signature table is the shared input of the band explode and the
    post-candidate similarity attach (it never rides the band
    exchange bands-times over, the round-4 LSH restructure)."""
    sig = minhash_signatures(batch[text_col], num_perm=num_perm, n=n,
                             shingle_mode=shingle_mode)
    ndocs, _ = sig.shape
    off = pa.array(np.arange(0, (ndocs + 1) * num_perm, num_perm,
                             dtype=np.int32), pa.int32())
    return pa.table({
        id_col: batch[id_col],
        "sig": pa.ListArray.from_arrays(
            off, pa.array(sig.reshape(-1).astype(np.int64), pa.int64()))})


def _sig_matrix(t: pa.Table, num_perm: int) -> np.ndarray:
    """(rows, num_perm) uint64 view of a sig list column (int64 ->
    uint64 astype is a bit-exact reinterpret for hash words)."""
    col = t["sig"].combine_chunks() if isinstance(
        t["sig"], pa.ChunkedArray) else t["sig"]
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.uint64).reshape(-1, num_perm)


def band_rows_batch(batch: pa.Table, id_col: str,
                    num_perm: int, bands: int) -> pa.Table:
    """(id, sig) rows -> (id, band_id, band_hash) rows — the LSH
    explode, ids-only: 24 bytes per band row cross the exchange, the
    signatures stay behind in the materialized sig table."""
    sig = _sig_matrix(batch, num_perm)
    ndocs = sig.shape[0]
    r = num_perm // bands
    band_hash = np.empty((ndocs, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(bands):
            chunk = sig[:, bi * r:(bi + 1) * r]
            acc = np.full(ndocs, np.uint64(0xCBF29CE484222325))
            for j in range(r):
                acc = splitmix64(acc ^ chunk[:, j])
            band_hash[:, bi] = acc
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(np.repeat(ids, bands)),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int64),
                                    ndocs), pa.int64()),
        "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64),
                              pa.int64())})


def _mix_bucket_key(band_id: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """One avalanched uint64 per (band_id, band_hash) pair — the
    broadcastable heavy-bucket lookup key (collision odds across the
    observed bucket population are ~n_heavy * n_buckets / 2^64)."""
    with np.errstate(over="ignore"):
        return splitmix64(band_hash.astype(np.int64).view(np.uint64)
                          ^ splitmix64(band_id.astype(np.uint64)
                                       + np.uint64(0x9E3779B9))
                          ).view(np.int64)


def _detect_heavy_buckets(bands_ds, heavy_threshold: int, det_cap: int):
    """Exact-SOUND heavy-bucket detection in one map-only pass: each
    batch emits (mixed key, count) only for buckets with in-batch
    count >= 2, the driver sums partials. The sum is a LOWER bound on
    the true bucket size (per-batch singletons are dropped), so
    ``lower > heavy_threshold`` never flags a light bucket; a heavy
    bucket spread too thin across batches can be missed, which only
    forgoes flattening — the group kernel's own fallback still runs
    and the pair output is identical. Returns (mk_sorted, counts) or
    None when the partial volume exceeds ``det_cap`` (logged, never
    silent)."""
    def partial(t: pa.Table) -> pa.Table:
        mk = _mix_bucket_key(
            t["band_id"].to_numpy(zero_copy_only=False),
            t["band_hash"].to_numpy(zero_copy_only=False))
        uk, cnt = np.unique(mk, return_counts=True)
        keep = cnt >= 2
        return pa.table({
            "mk": pa.array(uk[keep], pa.int64()),
            "c": pa.array(cnt[keep].astype(np.int64), pa.int64())})

    mks, cs, total = [], [], 0
    for b in (bands_ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        mks.append(b["mk"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
        total += len(mks[-1])
        if total > det_cap:
            try:
                import ray
                ray.get_actor("osm2shp_metrics").inc_many.remote(
                    {"lsh_flatten_detection_overflow": 1})
            except Exception:
                pass
            print(f"lsh: heavy-bucket detection partials exceeded "
                  f"det_cap={det_cap}; skipping exchange flattening "
                  "(outputs unchanged, in-group fallbacks still apply)")
            return None
    if not total:
        return None
    mk = np.concatenate(mks)
    c = np.concatenate(cs)
    uk, inv = np.unique(mk, return_inverse=True)
    sums = np.zeros(len(uk), np.int64)
    np.add.at(sums, inv, c)
    heavy = sums > heavy_threshold
    if not heavy.any():
        return None
    return uk[heavy], sums[heavy]           # uk sorted ascending (int64)


def _exact_bucket_min(bands_ds, id_col: str, mk_heavy: np.ndarray):
    """Exact global min id per detected heavy bucket (the star
    center): map-only per-batch min over broadcast keys, driver-side
    min merge. Bounded by the (small) heavy-bucket count."""
    import ray

    ref = ray.put(np.sort(mk_heavy))

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mk = _mix_bucket_key(
            t["band_id"].to_numpy(zero_copy_only=False),
            t["band_hash"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(keys, mk)
        np.clip(pos, 0, max(len(keys) - 1, 0), out=pos)
        hit = (keys[pos] == mk) if len(keys) else np.zeros(len(mk), bool)
        sub = t.filter(pa.array(hit))
        if sub.num_rows == 0:
            return pa.table({"mk": pa.array([], pa.int64()),
                             "mn": pa.nulls(0, t[id_col].type)})
        smk = mk[hit]
        g = (pl.from_arrow(sub.select([id_col]))
             .with_columns(pl.Series("mk", smk))
             .group_by("mk").agg(pl.col(id_col).min().alias("mn")))
        at = g.to_arrow()
        return pa.table({"mk": at["mk"].cast(pa.int64()),
                         "mn": at["mn"]})

    best: dict = {}
    for b in (bands_ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for mkv, mnv in zip(b["mk"].to_pylist(), b["mn"].to_pylist()):
            cur = best.get(mkv)
            if cur is None or mnv < cur:
                best[mkv] = mnv
    return [best[int(k)] for k in mk_heavy]


def lsh_candidate_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, bands: int = 16,
                        shingle_n: int = 5, threshold: float = 0.7,
                        max_bucket: int | None = 200,
                        shingle_mode: str = "char",
                        sig_bcast_cap: int = 200_000,
                        flatten_heavy: bool = True,
                        target_cell: int = 96,
                        det_cap: int = 500_000):
    """Dataset of docs -> Dataset of verified near-dup pairs
    (id_a, id_b, sim) with sim = signature similarity >= threshold.

    Scale shape (round-4 restructure): ONE minhash pass materializes
    the (id, sig) table; the band explode and its (band_id, band_hash)
    exchange carry 24-byte ids-only rows (signatures used to ride the
    band exchange ``bands`` times over — 16x the bytes, through a
    sort); candidate pairs are deduped ids-only; the signature
    similarity is attached afterwards as a capped dual — at or below
    ``sig_bcast_cap`` docs the sig matrix ships once via ray.put and
    every pair batch probes it by searchsorted, above the cap two
    bucketed ``hash_join`` attaches move each signature at most twice
    (vs ``bands`` times before). Identical (id_a, id_b, sim) output:
    sims are full-signature means either way.

    ``max_bucket`` bounds per-bucket pair enumeration: a bucket with
    m > max_bucket members switches from all-pairs (O(m^2) output) to
    STAR-LINKING — every member is paired with the bucket's min-id
    member only (O(m) output). The star preserves connectivity for the
    common huge-bucket case (a near-duplicate CLUSTER, where every
    member is similar to every other, center included); it can miss
    pairs in adversarial buckets where two members are similar to each
    other but neither is similar to the min-id member — raise
    max_bucket, or pass max_bucket=None when the full pair set is the
    contract (exact_jaccard_pairs does; its output is inherently
    quadratic in duplicate-cluster size). Star fallbacks are logged
    (print + 'lsh_star_buckets' metrics counter), never silent."""
    import ray

    def cand_in_group(df: pd.DataFrame) -> pd.DataFrame:
        m = len(df)
        if m >= 64:
            # heavy LSH (sub)buckets are the skew signal; observing
            # every group would be one remote call per bucket. Key by
            # (band_hash, cell) so flattened sub-buckets register as
            # separate exchange partitions, not re-accumulations of
            # the parent bucket.
            from ..state.metrics import observe_partition
            ok = (int(df["band_hash"].iloc[0])
                  ^ (0x9E3779B9 * (int(df["cell_i"].iloc[0]) + 1))
                  ^ (0x85EBCA6B * (int(df["cell_j"].iloc[0]) + 1)))
            observe_partition("lsh_band_bucket", ok, m)
        if "__has_center" in df.columns and bool(df["__has_center"].iloc[0]):
            # salted STAR sub-bucket: pair every member with the
            # bucket's broadcast exact-min center — the union over
            # sub-buckets is exactly the unsalted star pair set
            center = df["__center"].iloc[0]
            ids = df[id_col].to_numpy()
            oa = ids[ids != center]
            if len(oa) == 0:
                return arrow_table(pd.DataFrame({
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64")}))
            return arrow_table(pd.DataFrame({
                "id_a": np.minimum(oa, center),
                "id_b": np.maximum(oa, center)}))
        if m < 2:
            return arrow_table(pd.DataFrame({
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64")}))
        ids = df[id_col].to_numpy()
        if max_bucket is not None and m > max_bucket:
            _log_star_bucket(m)
            center = ids.min()
            oa = ids[ids != center]
            return arrow_table(pd.DataFrame({
                "id_a": np.minimum(oa, center),
                "id_b": np.maximum(oa, center)}))
        ia, ib = np.triu_indices(m, k=1)
        return arrow_table(pd.DataFrame({
            "id_a": np.minimum(ids[ia], ids[ib]),
            "id_b": np.maximum(ids[ia], ids[ib])}))

    # coalesce BEFORE the signature map: a single-file parquet read is
    # one block, which would serialize the (expensive) minhash compute
    # on one core; ~1 block/core parallelizes it.
    sigs = coalesced(ds).map_batches(
        lambda t: sig_rows_batch(t, text_col, id_col, num_perm,
                                 shingle_n, shingle_mode),
        batch_format="pyarrow").materialize()
    bands_ds = sigs.map_batches(
        lambda t: band_rows_batch(t, id_col, num_perm, bands),
        batch_format="pyarrow")

    # --- heavy-bucket exchange flattening (round 5) -----------------
    # A near-dup CLUSTER puts its whole membership into ONE (band,
    # hash) group in every band — at web scale that is one reducer
    # swallowing the cluster. Detect genuinely-heavy buckets exactly
    # (sound lower-bound counts), then split their rows BEFORE the
    # exchange:
    #   * all-pairs mode (max_bucket=None): TRIANGLE BLOCKING — member
    #     in salt-group g is replicated to cells {(min(g,j),max(g,j))},
    #     so every pair of the bucket co-occurs in exactly one cell;
    #     in-cell all-pairs is a superset whose duplicates the
    #     downstream pair dedup removes. Replication factor s on
    #     heavy-bucket rows only; max cell ~2m/s.
    #   * star mode: member goes to ONE salt cell, paired against the
    #     bucket's broadcast exact-min center — identical pair set to
    #     the unsalted in-group star.
    # A missed heavy bucket (thin spread) just keeps today's in-group
    # path: outputs identical either way.
    flat_ref = None
    star_mode = max_bucket is not None
    if flatten_heavy:
        thr = max_bucket if star_mode else 2 * target_cell
        det = _detect_heavy_buckets(bands_ds, thr, det_cap)
        if det is not None:
            mk_h, c_h = det
            if star_mode:
                s_h = np.maximum(
                    np.ceil(c_h / float(target_cell)), 2).astype(np.int64)
                centers = _exact_bucket_min(bands_ds, id_col, mk_h)
            else:
                s_h = np.maximum(
                    np.ceil(2.0 * c_h / target_cell), 2).astype(np.int64)
                centers = None
            try:
                ray.get_actor("osm2shp_metrics").inc_many.remote(
                    {"lsh_flattened_buckets": int(len(mk_h)),
                     "lsh_flattened_members": int(c_h.sum())})
            except Exception:
                pass
            flat_ref = ray.put((mk_h, s_h, centers))

    def _id_hash(col) -> np.ndarray:
        if pa.types.is_integer(col.type):
            return splitmix64(
                col.to_numpy(zero_copy_only=False).astype(np.uint64))
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pl.from_arrow(c).hash(seed=71).to_numpy().astype(np.uint64)

    def add_cells(t: pa.Table) -> pa.Table:
        n = t.num_rows
        zeros = pa.array(np.zeros(n, np.int64), pa.int64())
        if flat_ref is None:
            return (t.append_column("cell_i", zeros)
                    .append_column("cell_j", zeros))
        mk_h_, s_h_, centers_ = ray.get(flat_ref)
        mk = _mix_bucket_key(
            t["band_id"].to_numpy(zero_copy_only=False),
            t["band_hash"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(mk_h_, mk)
        np.clip(pos, 0, max(len(mk_h_) - 1, 0), out=pos)
        hit = mk_h_[pos] == mk
        hv = _id_hash(t[id_col])
        s_row = np.where(hit, s_h_[pos], 1).astype(np.uint64)
        g = (hv % s_row).astype(np.int64)
        if star_mode:
            cell_i = np.where(hit, g, 0)
            # center rides as (flag, value) — a nullable int column
            # would widen to float in the pandas group kernel and
            # corrupt ids above 2^53, so light rows carry a fill value
            # and the flag column gates its use
            cen_arr = np.asarray(centers_)
            cen_full = np.where(hit, cen_arr[pos], cen_arr[0])
            return (t.append_column("cell_i", pa.array(cell_i, pa.int64()))
                    .append_column("cell_j", zeros)
                    .append_column("__has_center", pa.array(hit))
                    .append_column("__center", pa.array(cen_full)))
        reps = np.where(hit, s_h_[pos], 1).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(reps)))
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        j = np.arange(idx.size, dtype=np.int64) - np.repeat(cum[:-1], reps)
        g_rep = np.repeat(g, reps)
        cell_i = np.minimum(g_rep, j)
        cell_j = np.maximum(g_rep, j)
        return (t.take(pa.array(idx))
                .append_column("cell_i", pa.array(cell_i, pa.int64()))
                .append_column("cell_j", pa.array(cell_j, pa.int64())))

    cand = (bands_ds.map_batches(add_cells, batch_format="pyarrow")
            .groupby(["band_id", "band_hash", "cell_i", "cell_j"])
            .map_groups(cand_in_group, batch_format="pandas"))

    n_docs = sigs.count()
    if n_docs <= sig_bcast_cap:
        chunks = list(sigs.iter_batches(batch_format="pyarrow"))
        if chunks:
            tt = pa.concat_tables(chunks)
            # ids may be ints OR strings: keep the native numpy dtype
            # (object arrays sort/searchsort via Python comparisons)
            all_ids = tt[id_col].to_numpy(zero_copy_only=False)
            mat = _sig_matrix(tt, num_perm)
            order = np.argsort(all_ids, kind="stable")
            sig_ref = ray.put((all_ids[order],
                               np.ascontiguousarray(mat[order])))
        else:
            sig_ref = ray.put((np.empty(0, np.int64),
                               np.empty((0, num_perm), np.uint64)))

        def attach_sim(t: pa.Table) -> pa.Table:
            ids_sorted, m_ = ray.get(sig_ref)
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            sims = ((m_[np.searchsorted(ids_sorted, a)]
                     == m_[np.searchsorted(ids_sorted, b)]).mean(axis=1)
                    if len(a) else np.empty(0, np.float64))
            keep = sims >= threshold
            return (t.filter(pa.array(keep))
                    .append_column("sim",
                                   pa.array(sims[keep], pa.float64())))

        # sim-filter FIRST (a stateless broadcast map), so the
        # multi-band dedup exchange sees only surviving pairs —
        # pair sims are band-independent, so filter/dedup commute
        return _dedup_pairs(cand.map_batches(attach_sim,
                                             batch_format="pyarrow"))

    # distributed attach: dedup FIRST (ids only), then each signature
    # crosses at most two bucketed exchanges, independent of the band
    # count
    cand = _dedup_pairs(cand)
    from .joins import hash_join

    def ren(suffix):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns([f"id_{suffix}", f"sig_{suffix}"])
        return f

    both = hash_join(
        hash_join(cand, sigs.map_batches(ren("a"),
                                         batch_format="pyarrow"),
                  on="id_a"),
        sigs.map_batches(ren("b"), batch_format="pyarrow"), on="id_b")

    def sim_filter(t: pa.Table) -> pa.Table:
        ma = _sig_matrix(t.select(["sig_a"]).rename_columns(["sig"]),
                         num_perm)
        mb = _sig_matrix(t.select(["sig_b"]).rename_columns(["sig"]),
                         num_perm)
        sims = (ma == mb).mean(axis=1) if len(ma) else \
            np.empty(0, np.float64)
        keep = sims >= threshold
        kt = t.filter(pa.array(keep))
        return pa.table({"id_a": kt["id_a"], "id_b": kt["id_b"],
                         "sim": pa.array(sims[keep], pa.float64())})

    return both.map_batches(sim_filter, batch_format="pyarrow")


def shingle_sets_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id", shingle_mode: str = "char",
                       n: int = 5) -> pa.Table:
    """docs -> (id, sh list<int64>) where sh is the DISTINCT shingle
    hash set (sorted). Set Jaccard over these hash sets equals set
    Jaccard over the shingle strings (64-bit collisions negligible),
    which is what the DuckDB oracles compute on the string side."""
    h, off = (shingle_hashes(batch[text_col], n) if shingle_mode == "char"
              else word_shingle_hashes(batch[text_col], n))
    doc = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(off))
    order = np.lexsort((h, doc))
    d, hv = doc[order], h[order]
    first = np.concatenate(([True], (d[1:] != d[:-1]) | (hv[1:] != hv[:-1]))) \
        if len(d) else np.empty(0, bool)
    d, hv = d[first], hv[first]
    counts = np.bincount(d, minlength=len(batch))
    offsets = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    return pa.table({
        id_col: batch[id_col],
        "sh": pa.ListArray.from_arrays(
            offsets, pa.array(hv.astype(np.int64), pa.int64())),
    })


def exact_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, shingle_mode: str = "char",
                        shingle_n: int = 5, num_perm: int = 64,
                        bands: int = 16, prefilter_margin: float = 0.2,
                        small_cap: int = 50_000,
                        max_bucket: int | None = None):
    """Near-dup pairs verified by EXACT shingle-set Jaccard — the
    SQL-oracle-equal operator: LSH narrows candidates (signature-sim
    prefilter at threshold - margin, so the +-1/sqrt(num_perm) estimate
    error cannot drop a true pair), then the true Jaccard is computed
    from the candidates' distinct-shingle sets and thresholded.

    Distribution: only the candidate-pair COUNT reaches the driver.
    At or below ``small_cap`` pairs, the ids are collected (bounded by
    the cap) and broadcast to filter the docs Dataset, and the verify
    runs driver-side — the fixed shuffle barriers of the joins would
    dominate. Above the cap, everything stays distributed: the
    candidate-id set is itself a Dataset, candidate docs are selected
    with a left_semi ``hash_join``, and the two pair-side attaches are
    hash_joins over candidate docs only — full texts of NON-candidates
    never reach the pair verify either way.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Recall: with r = num_perm/bands = 4 rows/band, a pair at true
    Jaccard J is missed by all 16 bands with prob (1 - J^4)^16 — at
    J = threshold+0.1 = 0.9 that is ~2e-6, and the signature prefilter
    at threshold - margin sits >3 sigma below (sigma = 1/sqrt(64)),
    so the exact verify sees every plausible pair. Raise num_perm/
    bands for corpora dense just above threshold."""
    import ray

    from .joins import hash_join

    # max_bucket=None: the pair-set contract is EXACT, so no bucket may
    # fall back to star-linking — the output (and cost) is inherently
    # quadratic in the largest duplicate cluster; set a cap consciously
    # for corpora where that is unacceptable (forfeits SQL equality)
    cand = lsh_candidate_pairs(
        ds, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, threshold=max(0.0, threshold - prefilter_margin),
        shingle_mode=shingle_mode, max_bucket=max_bucket)
    # materialize: cand is consumed twice (id collection + the join
    # side) — without this the whole LSH pipeline re-executes per
    # consumer (Ray re-runs lineage for each branch)
    cand = cand.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow").materialize()

    n_pairs = cand.count()  # a scalar, never the rows
    if n_pairs == 0:
        import pandas as pd
        return ray.data.from_pandas(pd.DataFrame({
            "id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64")}))

    shingles = lambda d: d.map_batches(
        lambda t: shingle_sets_batch(t, text_col, id_col, shingle_mode,
                                     shingle_n),
        batch_format="pyarrow")

    if n_pairs <= small_cap:
        # fast path: candidate count is bounded-small (<= small_cap by
        # the check above), so the 4 fixed shuffle barriers of the two
        # distributed joins cost more than the work; collect the pair
        # ids, broadcast-filter the docs, verify on the driver.
        import pandas as pd
        pair_rows = cand.take_all()
        cand_ids = np.unique(np.concatenate(
            [np.array([p["id_a"] for p in pair_rows], dtype=np.int64),
             np.array([p["id_b"] for p in pair_rows], dtype=np.int64)]))
        ids_ref = ray.put(cand_ids)

        def only_candidates(t: pa.Table) -> pa.Table:
            import ray as _ray
            wanted = _ray.get(ids_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, wanted)))

        docsets = shingles(ds.map_batches(only_candidates,
                                          batch_format="pyarrow"))
        by_id = {r[id_col]: np.asarray(r["sh"], dtype=np.int64)
                 for r in docsets.take_all()}
        ia, ib, jac = [], [], []
        for p in pair_rows:
            sa = by_id.get(p["id_a"])
            sb = by_id.get(p["id_b"])
            if sa is None or sb is None:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                ia.append(p["id_a"]); ib.append(p["id_b"]); jac.append(j)
        return ray.data.from_pandas(pd.DataFrame({
            "id_a": pd.Series(ia, dtype="int64"),
            "id_b": pd.Series(ib, dtype="int64"),
            "jaccard": pd.Series(jac, dtype="float64")}))

    # distributed path: the candidate-id set stays a Dataset and docs
    # are selected with a semijoin — nothing pair-shaped on the driver
    ids_ds = cand.map_batches(
        lambda t: pa.table({id_col: pa.chunked_array([
            t["id_a"].combine_chunks(), t["id_b"].combine_chunks()])}),
        batch_format="pyarrow")
    docsets = shingles(hash_join(
        ds.map_batches(lambda t: t.select([id_col, text_col]),
                       batch_format="pyarrow"),
        ids_ds, on=id_col, how="left_semi", n_buckets=16))

    sets_a = docsets.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "sh_a": t["sh"]}),
        batch_format="pyarrow")
    sets_b = docsets.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "sh_b": t["sh"]}),
        batch_format="pyarrow")
    joined = hash_join(hash_join(cand, sets_a, on="id_a", n_buckets=16),
                       sets_b, on="id_b", n_buckets=16)

    def verify(t: pa.Table) -> pa.Table:
        # vectorized per-batch exact Jaccard: both list columns flatten
        # to (row, shingle) structured keys; one structured intersect1d
        # + a bincount gives every row's intersection size at once
        import pyarrow.compute as pc
        n = t.num_rows
        if n == 0:
            return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                             "jaccard": pa.array([], pa.float64())})
        dt = np.dtype([("r", np.int64), ("v", np.int64)])

        def keyed(col):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            vals = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            k = np.empty(len(vals), dtype=dt)
            k["r"] = np.repeat(np.arange(n), lens)
            k["v"] = vals
            return k, lens

        ka, na = keyed(t["sh_a"])
        kb, nb = keyed(t["sh_b"])
        common = np.intersect1d(ka, kb, assume_unique=True)
        inter = np.bincount(common["r"], minlength=n)
        union = na + nb - inter
        ja = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = ja >= threshold
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "jaccard": pa.array(ja[keep], pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")


def dedup_minhash(ds, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16, shingle_n: int = 5,
                  component_cap: int = 500_000):
    """Near-dedup keep-set: connected components over verified pairs,
    keep the min-id representative of each component; returns the
    filtered Dataset.

    Components: driver union-find below ``component_cap`` pairs (fast
    path), distributed min-label propagation above it
    (stages/components.py) — no hard pair-count limit. The final
    keep-filter broadcasts the drop-id array (sized by the number of
    duplicates, the operator's output-scale side) and applies a
    vectorized np.isin per batch."""
    import ray

    pairs = lsh_candidate_pairs(ds, text_col, id_col, num_perm, bands,
                                shingle_n, threshold).materialize()
    n_pairs = pairs.count()
    if n_pairs <= component_cap:
        rows = pairs.take_all()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for p in rows:
            a, b = find(p["id_a"]), find(p["id_b"])
            if a != b:
                if b < a:
                    a, b = b, a
                parent[b] = a
        # native dtype (ids may be strings): np.isin handles object
        # arrays; do NOT coerce to int64
        drop_arr = np.array(sorted(x for x in parent if find(x) != x))
    else:
        import pyarrow.compute as pc
        from .components import connected_components
        cc = connected_components(pairs)
        non_roots = cc.map_batches(
            lambda t: pa.table({"id": t["id"].filter(
                pc.not_equal(t["id"], t["root"]))}),
            batch_format="pyarrow")
        drop_arr = np.sort(np.concatenate(
            [b["id"].to_numpy(zero_copy_only=False)
             for b in non_roots.iter_batches(batch_format="pyarrow",
                                             batch_size=65536)] or
            [np.empty(0, np.int64)]))
    drop_ref = ray.put(drop_arr)

    def filter_batch(t: pa.Table) -> pa.Table:
        import ray as _ray
        d = _ray.get(drop_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, d)))

    return ds.map_batches(filter_batch, batch_format="pyarrow")


# ------------------------------------------------------------- SimHash

def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word tokens: signed bit-vote of token
    hashes, vectorized with a bit-unpack matrix per batch.

    Token hash is the md5-derived 60-bit hash (functions/hashing.
    md5_hash60) so the per-document SimHash VALUE is reproducible in
    SQL (the q_simhash_docs oracle re-computes the same bit votes in
    DuckDB); bits 60-63 always vote negative and stay 0. Tokens are
    ASCII ``[a-z0-9_]+`` runs of the lowercased text (RE2 parity)."""
    from ..functions.hashing import md5_hash60
    s = pl.from_arrow(batch[text_col])
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    toks = s.str.to_lowercase().str.extract_all(r"[a-z0-9_]+")
    lens = toks.list.len().to_numpy().astype(np.int64)
    flat = md5_hash60(
        toks.explode().drop_nulls().to_numpy()).astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32) * 2 - 1  # (n_tok, 64)
    sums = np.zeros((len(batch), 64), dtype=np.int64)
    nz = lens > 0
    if bits.shape[0]:
        sums[nz] = np.add.reduceat(bits, offsets[:-1][nz], axis=0)[np.arange(nz.sum())]
    sig_bits = (sums > 0).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).reshape(-1)
    return batch.append_column("simhash", pa.array(packed.astype(np.int64), pa.int64()))


def _hamming_band_pairs(band_ds, id_col: str, val_col: str,
                        max_hamming: int, id_type: pa.DataType,
                        n_buckets: int = 64,
                        family: str = "hamming_band_bucket"):
    """(id, band_id, band_hash, value) rows -> exact-hamming pairs.

    ONE coarse groupby on a hashed (band_id, band_hash) % n_buckets
    bucket — NOT a groupby on the band key itself, which would invoke
    a Python kernel once per band bucket and scale the per-group
    dispatch overhead with corpus size (the _dedup_pairs lesson).
    Inside a bucket, singleton band groups are dropped vectorized;
    only COLLIDING groups (actual dup clusters) generate pairs, and
    the XOR-popcount verify over all of a bucket's pairs is one
    vectorized pass."""
    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            key = splitmix64(bid * np.uint64(0x9E3779B97F4A7C15)
                             ^ splitmix64(bh))
        return t.append_column("__bb", pa.array(
            (key % np.uint64(n_buckets)).astype(np.int64), pa.int64()))

    def verify_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) >= 1 << 17:
            from ..state.metrics import observe_partition
            observe_partition(family, int(df["__bb"].iloc[0]), len(df))
        if len(df) < 2:
            return empty
        # band_hash < 2^16 and band_id is tiny, so one packed int64
        # identifies the exact band group
        code = ((df["band_id"].to_numpy().astype(np.int64) << np.int64(32))
                | df["band_hash"].to_numpy().astype(np.int64))
        order = np.argsort(code, kind="stable")
        sc = code[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.r_[starts[1:], len(sc)]
        sizes = ends - starts
        multi = np.flatnonzero(sizes >= 2)
        if len(multi) == 0:
            return empty
        vals = (df[val_col].to_numpy().astype(np.int64)
                .astype(np.uint64)[order])
        ids = df[id_col].to_numpy()[order]
        ia_parts, ib_parts = [], []
        for g in multi:  # collision clusters only; pair math stays
            s, e = starts[g], ends[g]  # vectorized below
            li, lj = np.triu_indices(e - s, k=1)
            ia_parts.append(li + s)
            ib_parts.append(lj + s)
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        x = vals[ia] ^ vals[ib]
        ham = (np.unpackbits(x[:, None].view(np.uint8), axis=1)
               .sum(axis=1).astype(np.int64))
        keep = ham <= max_hamming
        return pa.table({
            "id_a": pa.array(np.minimum(ids[ia[keep]], ids[ib[keep]])),
            "id_b": pa.array(np.maximum(ids[ia[keep]], ids[ib[keep]])),
            "hamming": pa.array(ham[keep], pa.int64()),
        }).cast(empty.schema)

    pairs = (band_ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__bb").map_groups(verify_bucket,
                                         batch_format="pandas"))
    return _dedup_pairs(pairs)


def simhash_near_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3):
    """Near-dup pairs by SimHash: 4 x 16-bit band tables (any pair
    within hamming distance 3 shares at least one exact 16-bit band —
    pigeonhole), exact-hamming verify via the bucketed
    _hamming_band_pairs kernel."""

    def band_rows(t: pa.Table) -> pa.Table:
        t = simhash_batch(t, text_col)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(sh)
        out_band = np.tile(np.arange(4, dtype=np.int64), n)
        shift = (np.arange(4, dtype=np.uint64) * np.uint64(16))
        chunks = ((sh[:, None] >> shift[None, :]) & np.uint64(0xFFFF)).reshape(-1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, 4)),
            "band_id": pa.array(out_band, pa.int64()),
            "band_hash": pa.array(chunks.astype(np.int64), pa.int64()),
            "simhash": pa.array(np.repeat(sh.astype(np.int64), 4), pa.int64()),
        })

    return _hamming_band_pairs(
        coalesced(ds).map_batches(band_rows, batch_format="pyarrow"),
        id_col, "simhash", max_hamming, pa.int64(),
        family="simhash_band_bucket")


# ----------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16):
    """WORD n-gram Jaccard near-dup: LSH candidates over word-shingle
    minhash (high band count = high recall), verified by EXACT
    word-n-gram set Jaccard (exact_jaccard_pairs) — the semantics the
    name promises and the DuckDB oracle computes."""
    return exact_jaccard_pairs(ds, text_col, id_col, threshold=threshold,
                               shingle_mode="word", shingle_n=n,
                               num_perm=num_perm, bands=bands)


# ------------------------------------------- embedding cosine near-dup

def embedding_near_dup_pairs(ds, vec_col: str = "embedding",
                             id_col: str = "vec_id", threshold: float = 0.95,
                             n_planes: int = 16, n_tables: int = 4,
                             seed: int = 3):
    """Random-hyperplane LSH over normalized embeddings -> bucket
    groupby -> exact cosine verify inside buckets (precision is exact;
    recall is the LSH knob).

    Recall model: a pair at cosine c agrees on one random hyperplane
    with p = 1 - arccos(c)/pi; it shares a table's full n_planes-bit
    signature with prob p^n_planes, so the miss probability over
    ``n_tables`` independent plane sets is (1 - p^n_planes)^n_tables.
    Defaults (16 planes, 4 tables): miss ~2e-5 at c=0.99, ~0.04 at
    c=0.95, ~0.7 at c=0.90 — raise n_tables (linear cost in shuffle
    rows) or lower n_planes (quadratic cost in bucket verify) for
    looser thresholds. Exact duplicates are always found."""

    def bucket_rows(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        dim = vn.shape[1]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for table in range(n_tables):
            rng = np.random.default_rng(seed * 1009 + table)
            planes = rng.standard_normal((dim, n_planes))
            bits = (vn @ planes > 0).astype(np.uint64)
            sig = np.zeros(len(vn), dtype=np.uint64)
            for j in range(n_planes):
                sig |= bits[:, j] << np.uint64(j)
            parts.append(pa.table({
                id_col: pa.array(ids),
                "band_id": pa.array(np.full(len(ids), table), pa.int64()),
                "band_hash": pa.array(sig.astype(np.int64), pa.int64()),
                vec_col: t[vec_col],
            }))
        return pa.concat_tables(parts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = len(df)
        if m < 2:
            return arrow_table(pd.DataFrame({
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64")}))
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        ids = df[id_col].to_numpy()
        sims = vn @ vn.T
        ia, ib = np.triu_indices(m, k=1)
        cs = sims[ia, ib]
        keep = cs >= threshold
        return arrow_table(pd.DataFrame({
            "id_a": np.minimum(ids[ia[keep]], ids[ib[keep]]),
            "id_b": np.maximum(ids[ia[keep]], ids[ib[keep]]),
            "cosine": cs[keep]}))

    pairs = (coalesced(ds).map_batches(bucket_rows, batch_format="pyarrow")
             .groupby(["band_id", "band_hash"])
             .map_groups(verify, batch_format="pandas"))
    return _dedup_pairs(pairs)


# ------------------------------------------------ perceptual-hash (image)

def phash_near_dup_pairs(ds, phash_col: str = "phash",
                         id_col: str = "image_id", max_hamming: int = 4):
    """Near-duplicate IMAGES by 64-bit perceptual hash: 5 band tables
    (13/13/13/13/12 bits — any pair within hamming distance 4 shares
    at least one exact band, pigeonhole), exact XOR-popcount verify
    inside the band group, multi-band hits deduped by _dedup_pairs.

    Same banded shape as simhash_near_dup_pairs, but over the mandated
    image table's ``phash`` column (BASELINE.json input_hint), so
    image-level near-dup detection ships only (id, phash) rows through
    the shuffle — never pixel payloads, never a decode."""
    shifts = np.array([0, 13, 26, 39, 52], dtype=np.uint64)
    widths = np.array([13, 13, 13, 13, 12], dtype=np.uint64)
    n_bands = len(shifts)

    def band_rows(t: pa.Table) -> pa.Table:
        ph = t[phash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        masks = (np.uint64(1) << widths) - np.uint64(1)
        chunks = ((ph[:, None] >> shifts[None, :]) & masks[None, :]).reshape(-1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_bands)),
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int64), len(ph)),
                pa.int64()),
            "band_hash": pa.array(chunks.astype(np.int64), pa.int64()),
            "__ph": pa.array(np.repeat(ph.astype(np.int64), n_bands),
                             pa.int64()),
        })

    return _hamming_band_pairs(
        coalesced(ds).map_batches(band_rows, batch_format="pyarrow"),
        id_col, "__ph", max_hamming, pa.string(),
        family="phash_band_bucket")


def semantic_dedup(ds, centroid_ids: np.ndarray, centroids: np.ndarray,
                   tau: float, vec_col: str = "embedding",
                   id_col: str = "vec_id", block: int = 2048):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 pattern): assign every vector to its nearest
    (pre-trained) centroid, then WITHIN each cluster drop any vector
    whose cosine similarity to a lower-id cluster member is >= tau.
    The keep rule is deterministic and non-transitive (compare against
    lower ids only), so it is exactly re-derivable in SQL.

    Scale shape: the k-means stage bounds expected cluster size to
    corpus/k — choose k so a cluster fits one group kernel (the
    published recipe: k ~ sqrt(n) keeps clusters ~sqrt(n)); the only
    wide exchange is the cluster groupby of (id, vector) rows, and the
    in-group all-pairs runs as column-BLOCKED float64 matmul (never an
    n^2 allocation over the whole cluster at once).

    Returns the kept rows as a Dataset (id_col, cluster), streaming.
    """
    import ray

    from .ann import _as_matrix, _normalize

    if not (0.0 < tau <= 1.0):
        raise ValueError(f"tau must be in (0,1], got {tau}")
    ref = ray.put((np.asarray(centroid_ids, np.int64),
                   np.asarray(centroids, np.float64)))

    def assign(t: pa.Table) -> pa.Table:
        import ray as _ray
        cids_, C_ = _ray.get(ref)
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             vec_col: t[vec_col]})
        x = _as_matrix(t[vec_col])
        a = np.argmin(((x[:, None, :] - C_[None]) ** 2).sum(-1), axis=1)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(cids_[a], pa.int64()),
                         vec_col: t[vec_col]})

    def prune(df: pd.DataFrame) -> pa.Table:
        order = np.argsort(df[id_col].to_numpy(), kind="stable")
        ids = df[id_col].to_numpy()[order]
        x = np.stack([np.asarray(v, np.float64)
                      for v in df[vec_col].to_numpy()[order]])
        xn = _normalize(x)
        n = len(ids)
        keep = np.ones(n, bool)
        for j0 in range(1, n, block):
            j1 = min(j0 + block, n)
            s = xn[:j1] @ xn[j0:j1].T  # (j1, j1-j0) one column block
            # rows strictly above the diagonal = lower-id members
            ri = np.arange(j1)[:, None]
            cj = np.arange(j0, j1)[None, :]
            s = np.where(ri < cj, s, -np.inf)
            keep[j0:j1] = s.max(axis=0) < tau
        out = pd.DataFrame({id_col: ids[keep],
                            "cluster": df["cluster"].to_numpy()[order][keep]})
        return arrow_table(out)

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return coalesced(assigned).groupby("cluster").map_groups(
        prune, batch_format="pandas")


# ------------------------------------------------ incremental dedup

def _content_hash_frame(col, prefix_k: int | None):
    """60-bit SQL-parity content hash per text row: h60 of the exact
    text, or of the first ``prefix_k`` lowercase [a-z0-9_]+ tokens
    joined by single spaces (the prefix-fingerprint heuristic that
    catches boilerplate re-crawls; SQL mirror
    ``array_to_string(a[1:k], ' ')``)."""
    from ..functions.hashing import md5_hash60

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if prefix_k is None:
        return md5_hash60(col.to_numpy(zero_copy_only=False))
    s = pl.from_arrow(col)
    pre = (s.str.to_lowercase().str.extract_all(r"[a-z0-9_]+")
           .list.head(prefix_k).list.join(" "))
    return md5_hash60(pre.to_numpy())


def incremental_dedup(new_ds, seen_ds, text_col: str = "text",
                      id_col: str = "doc_id", seen_text_col: str = "text",
                      prefix_k: int | None = None,
                      bloom_prefilter: bool = True):
    """Incremental corpus dedup — "new crawl minus already-ingested":
    drop every NEW document whose content hash already appears in the
    SEEN snapshot, regardless of id. The recurring curation op when a
    corpus is grown in crawls: only the delta should enter training.

    Content identity is the 60-bit md5 hash of the exact text (or of
    the ``prefix_k``-token prefix fingerprint), so the rule is
    SQL-reproducible collision-semantics included.

    Shape: both sides reduce to hash columns in stateless maps — ids
    + hashes only ever cross an exchange, never text; the seen side
    collapses to DISTINCT hashes in one narrow groupby; the delta is
    one ``hash_join(how="left_anti")``, with the bloom prefilter ON
    by default (a definite non-member new row skips all merge work
    via the right-empty bucket fast path — at 100 TB most new rows
    are non-members, which is exactly the bloom's sweet spot).

    Output: ``(id_col, gh: int64)`` — the surviving new rows' ids and
    content hashes (join back to payloads by id downstream).
    """
    from ray.data.aggregate import Count

    from .joins import hash_join

    def new_pairs(t: pa.Table) -> pa.Table:
        idc = (t[id_col].combine_chunks()
               if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
        return pa.table({id_col: idc,
                         "gh": pa.array(_content_hash_frame(t[text_col], prefix_k),
                                        pa.int64())})

    def seen_partial(t: pa.Table) -> pa.Table:
        h = _content_hash_frame(t[seen_text_col], prefix_k)
        return pa.table({"gh": pa.array(np.unique(h), pa.int64())})

    seen = (seen_ds.map_batches(seen_partial, batch_format="pyarrow")
            .groupby("gh").aggregate(Count(alias_name="__c"))
            .select_columns(["gh"]))
    return hash_join(new_ds.map_batches(new_pairs, batch_format="pyarrow"),
                     seen, on="gh", how="left_anti",
                     bloom_prefilter=bloom_prefilter)


def dedup_keep_best(ds, key_cols, score_col: str, id_col: str,
                    n_buckets: int | None = None):
    """Keep-BEST exact dedup — the curation variant of keep-first:
    among rows sharing ``key_cols`` (e.g. identical normalized text),
    keep the one with the highest ``score_col`` (ties broken by the
    smallest ``id_col``), so the canonical representative of every
    duplicate cluster is the best-quality one, not an arbitrary one.

    One bucketed exchange on the key hash; inside each group a
    vectorized lexsort picks the per-key argmax (never a per-key
    loop). Per-batch pre-reduction keeps only each batch's local best
    per key, so the exchange carries at most (distinct keys x blocks)
    rows.

    Output: (key_col, id_col, score_col) — one row per distinct key.
    """
    import pandas as pd

    from ..functions.hashing import bucket_any
    from .util import arrow_table, coalesced

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    b = n_buckets or 64
    order = keys + [score_col, id_col]
    asc = [True] * len(keys) + [False, True]

    def local_best(t: pa.Table) -> pa.Table:
        df = t.select(keys + [score_col, id_col]).to_pandas()
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        df = df[~df[keys].duplicated().to_numpy()]
        # equal composite keys share keys[0], so bucketing on it alone
        # co-locates them (no composite hash needed)
        df["__b"] = bucket_any(df[keys[0]].to_numpy(), b)
        return arrow_table(df.reset_index(drop=True))

    def kernel(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        df = df[~df[keys].duplicated().to_numpy()]
        return arrow_table(df[keys + [id_col, score_col]]
                           .reset_index(drop=True))

    return (coalesced(ds.map_batches(local_best, batch_format="pyarrow"))
            .groupby("__b").map_groups(kernel, batch_format="pandas"))
