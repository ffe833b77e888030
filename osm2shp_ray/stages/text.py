"""Text-analysis operators for training-data pipelines (SURVEY.md §2.8):
language-ID, quality scoring, token counting, document fingerprinting.
All vectorized via polars' regex/string kernels inside map_batches —
no Python row loops. Regexes are compiled once per process (module
constants), the actor-pool-free analog of compile-once state.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ..functions.hashing import splitmix64

_WS = r"\s+"

# tiny per-language stopword profiles (public common-word lists)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "que", "de", "no", "una", "con", "para", "por"],
}


def _series(col) -> pl.Series:
    s = pl.from_arrow(col if isinstance(col, (pa.Array, pa.ChunkedArray)) else pa.array(col))
    return s.to_series() if isinstance(s, pl.DataFrame) else s


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens (SQL-parity: empty/blank text -> 0) plus a
    BPE-ish subword estimate (runs of letters, digits, or single
    non-space symbols)."""
    s = _series(batch[text_col])
    trimmed = s.str.strip_chars()
    gaps = trimmed.str.count_matches(_WS).to_numpy().astype(np.int64)
    nonempty = (trimmed.str.len_chars() > 0).to_numpy()
    n_ws = np.where(nonempty, gaps + 1, 0)
    n_bpe = (s.str.count_matches(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
             .to_numpy().astype(np.int64))
    return (batch
            .append_column("n_tokens", pa.array(n_ws, pa.int64()))
            .append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64())))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality features + a
    composite [0,1] score."""
    s = _series(batch[text_col])
    n_chars = s.str.len_chars().cast(pl.Float64)
    safe = n_chars.clip(lower_bound=1)
    punct = s.str.count_matches(r"[.,!?;:]").cast(pl.Float64)
    upper = s.str.count_matches(r"[A-Z]").cast(pl.Float64)
    digits = s.str.count_matches(r"[0-9]").cast(pl.Float64)
    words = s.str.strip_chars().str.count_matches(_WS).cast(pl.Float64) + 1.0
    stop = s.str.to_lowercase().str.count_matches(
        r"\b(" + "|".join(LANG_PROFILES["en"]) + r")\b").cast(pl.Float64)
    punct_ratio = (punct / safe)
    upper_ratio = (upper / safe)
    digit_ratio = (digits / safe)
    stop_ratio = (stop / words)
    mean_word_len = (n_chars / words)
    score = (
        (stop_ratio.clip(upper_bound=0.5) * 2.0) * 0.4
        + (1.0 - (punct_ratio * 5.0).clip(upper_bound=1.0)) * 0.2
        + (1.0 - (digit_ratio * 5.0).clip(upper_bound=1.0)) * 0.2
        + ((mean_word_len.clip(lower_bound=2.0, upper_bound=10.0) - 2.0) / 8.0) * 0.2
    )
    def col(x):
        return pa.array(x.to_list(), pa.float64())
    return (batch
            .append_column("punct_ratio", col(punct_ratio))
            .append_column("upper_ratio", col(upper_ratio))
            .append_column("digit_ratio", col(digit_ratio))
            .append_column("stop_ratio", col(stop_ratio))
            .append_column("mean_word_len", col(mean_word_len))
            .append_column("quality", col(score)))


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n-gram/stopword heuristic language ID: per-language stopword hit
    rates, argmax with 'und' (undetermined) when no profile fires."""
    s = _series(batch[text_col]).str.to_lowercase()
    n = len(s)
    scores = np.zeros((len(LANG_PROFILES), n), dtype=np.float64)
    words = s.str.strip_chars().str.count_matches(_WS).cast(pl.Float64) + 1.0
    wnp = words.to_numpy()
    for i, (lang, stops) in enumerate(LANG_PROFILES.items()):
        hits = s.str.count_matches(r"\b(" + "|".join(stops) + r")\b").cast(pl.Float64).to_numpy()
        scores[i] = hits / wnp
    best = np.argmax(scores, axis=0)
    best_score = scores[best, np.arange(n)]
    langs = np.asarray(list(LANG_PROFILES), dtype=object)
    out = np.where(best_score > 0.0, langs[best], "und")
    return (batch
            .append_column("lang_pred", pa.array(out.tolist(), pa.string()))
            .append_column("lang_conf", pa.array(best_score, pa.float64())))


FP_MOD = 8  # mod-p sampling rate for fingerprint_modp_batch


def fingerprint_modp_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           mod: int = FP_MOD) -> pa.Table:
    """Mod-p sampled document fingerprint (Manber'94-style "0 mod p"
    selection): word n-gram shingles, keep the distinct shingle hashes
    with h % mod == 0, EXPLODED to (id, fp) rows sorted per doc.

    Hash is the md5-derived 60-bit hash of the shingle string
    ("tok1 tok2 tok3" of ASCII [a-z0-9_]+ tokens), so the fingerprint
    VALUES are reproducible in SQL — the winnowing variant
    (fingerprint_batch) keeps k-smallest of a rolling hash and is
    property-tested instead."""
    from ..functions.hashing import md5_hash60
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    df = pl.DataFrame({
        "id": ids,
        "t": _series(batch[text_col]).str.to_lowercase()
             .str.extract_all(r"[a-z0-9_]+"),
    })
    # vectorized shingle-string build: explode a per-doc start-index
    # range, then slice+join the token list at each start
    ex = (df.with_columns(
            pl.int_ranges(0, (pl.col("t").list.len().cast(pl.Int64)
                              - (n - 1)).clip(0))  # cast first: u32 len
              .alias("i"))                         # minus n underflows
          .explode("i").drop_nulls("i")
          .with_columns(pl.col("t").list.slice(pl.col("i"), n)
                        .list.join(" ").alias("sh")))
    if ex.height == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    h = md5_hash60(ex["sh"].to_numpy())
    oid = ex["id"].to_numpy().astype(np.int64)
    keep = h % mod == 0
    oid, h = oid[keep], h[keep]
    # distinct + sorted per doc
    order = np.lexsort((h, oid))
    oid, h = oid[order], h[order]
    first = np.concatenate(([True], (oid[1:] != oid[:-1]) | (h[1:] != h[:-1]))) \
        if len(oid) else np.empty(0, bool)
    return pa.table({id_col: pa.array(oid[first], pa.int64()),
                     "fp": pa.array(h[first], pa.int64())})


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      k: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: rolling hash over word
    3-grams, keep the k smallest hashes per document (mergeable,
    order-insensitive). Vectorized: one flat token-hash array + offsets,
    3-gram combine by shifted multiply-xor, per-doc k-smallest via
    np.partition inside an offsets loop only over documents."""
    s = _series(batch[text_col]).str.to_lowercase().str.extract_all(r"\w+")
    lens = s.list.len().to_numpy().astype(np.int64)
    flat = s.explode().drop_nulls()
    tok_hash = splitmix64(
        pl.Series(flat).hash(seed=7).to_numpy().astype(np.uint64))
    offsets = np.concatenate(([0], np.cumsum(lens)))
    with np.errstate(over="ignore"):
        g = np.zeros(max(0, len(tok_hash) - 2), dtype=np.uint64)
        if len(g):
            g = (tok_hash[:-2] * np.uint64(0x9E3779B97F4A7C15)
                 ^ tok_hash[1:-1] * np.uint64(0xC2B2AE3D27D4EB4F)
                 ^ tok_hash[2:])
    out_vals: list[np.ndarray] = []
    counts = np.empty(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        lo, hi = offsets[i], offsets[i + 1]
        m = hi - lo - 2  # number of 3-grams
        if m <= 0:
            grams = tok_hash[lo:hi] if hi > lo else np.empty(0, np.uint64)
        else:
            grams = g[lo:lo + m]
        # mask to 63 bits so values stay positive as int64 (storage type)
        uniq = np.unique(grams & np.uint64(0x7FFFFFFFFFFFFFFF))
        sel = np.sort(uniq)[:k]
        out_vals.append(sel.astype(np.int64))
        counts[i] = len(sel)
    off = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
    vals = pa.array(np.concatenate(out_vals) if out_vals else np.empty(0, np.int64), pa.int64())
    return batch.append_column("fingerprint", pa.ListArray.from_arrays(off, vals))


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al.
    2021 §A1.1, adapted to token level for single-line corpora):

    - ``dup_tok_frac``      1 - distinct_tokens / tokens
    - ``top_unigram_frac``  occurrences of the most frequent token / tokens
    - ``top_bigram_frac``   occurrences of the most frequent bigram / (tokens-1)
    - ``symbol_ratio``      non-[A-Za-z0-9 whitespace] chars / chars

    Tokens are the SQL-parity whitespace split (token_count_batch):
    ``regexp_split_to_array(trim_ws(text), '\\s+')``. Empty/blank text
    yields 0 for every stat. Pure within-row computation — stateless,
    streams at any scale, no shuffle. The per-doc top-counts are one
    polars explode + C-level group_by over the batch (never a Python
    loop per document)."""
    s = _series(batch[text_col])
    n = len(s)
    toks = s.str.strip_chars().str.extract_all(r"\S+")
    n_tok = toks.list.len().to_numpy().astype(np.int64)
    n_uniq = toks.list.n_unique().to_numpy().astype(np.int64)
    long = (pl.DataFrame({"i": pl.Series(np.arange(n, dtype=np.int64)),
                          "tok": toks})
            .explode("tok").drop_nulls("tok"))
    top1 = np.zeros(n, np.int64)
    u = (long.group_by(["i", "tok"]).len()
         .group_by("i").agg(pl.col("len").max().alias("c")))
    top1[u["i"].to_numpy()] = u["c"].to_numpy()
    big = (long.with_columns(nxt=pl.col("tok").shift(-1).over("i"))
           .drop_nulls("nxt")
           .with_columns(b=pl.col("tok") + " " + pl.col("nxt")))
    topb = np.zeros(n, np.int64)
    bx = (big.group_by(["i", "b"]).len()
          .group_by("i").agg(pl.col("len").max().alias("c")))
    topb[bx["i"].to_numpy()] = bx["c"].to_numpy()
    nt = np.maximum(n_tok, 1)
    nchars = s.str.len_chars().to_numpy().astype(np.int64)
    sym = s.str.count_matches(r"[^A-Za-z0-9\s]").to_numpy().astype(np.int64)
    return (batch
            .append_column("dup_tok_frac", pa.array(
                np.where(n_tok > 0, 1.0 - n_uniq / nt, 0.0), pa.float64()))
            .append_column("top_unigram_frac", pa.array(
                np.where(n_tok > 0, top1 / nt, 0.0), pa.float64()))
            .append_column("top_bigram_frac", pa.array(
                np.where(n_tok > 1, topb / np.maximum(n_tok - 1, 1), 0.0),
                pa.float64()))
            .append_column("symbol_ratio", pa.array(
                sym / np.maximum(nchars, 1), pa.float64())))


def bigram_rows_batch(batch: pa.Table, text_col: str = "text",
                      out_col: str = "bg") -> pa.Table:
    """Explode whitespace-token bigrams ("tok_i tok_i+1") to one row
    each — the streaming n-gram feed for corpus-level frequency ops
    (heavy_hitters). SQL parity: ``a[i] || ' ' || a[i+1]`` over the
    trim+split token array. Output schema: (out_col: string)."""
    s = _series(batch[text_col])
    toks = s.str.strip_chars().str.extract_all(r"\S+")
    long = (pl.DataFrame({"i": pl.Series(np.arange(len(s), dtype=np.int64)),
                          "tok": toks})
            .explode("tok").drop_nulls("tok"))
    big = (long.with_columns(nxt=pl.col("tok").shift(-1).over("i"))
           .drop_nulls("nxt"))
    out = (pl.col("tok") + " " + pl.col("nxt")).alias(out_col)
    arr = big.select(out)[out_col].to_arrow().cast(pa.string())
    return pa.table({out_col: arr})


# ------------------------------------------------------------- BM25

BM25_K1 = 1.2
BM25_B = 0.75


def _token_lists(col) -> pl.Series:
    return _series(col).str.to_lowercase().str.extract_all(r"[a-z0-9_]+")


def bm25_topk(ds, terms: list[str], k: int = 20, text_col: str = "text",
              id_col: str = "doc_id", k1: float = BM25_K1,
              b: float = BM25_B):
    """Okapi BM25 top-k document search for a fixed term list, fully
    streaming at any corpus size:

    Pass 1 (corpus stats): per-batch partials pre-aggregated to
    |terms|+1 rows (per-term document frequency + doc/length totals),
    so the stats groupby exchanges O(terms) rows per block and the
    reduced table — a few rows by construction — is the only driver
    materialization.
    Pass 2 (scoring): idf weights broadcast once via ray.put;
    per-batch vectorized tf via polars list.count_matches; tie-widened
    partial top-k per block (the ann._topk_ids pattern) so the final
    reduce sees <= k rows per block, never the corpus.

    Float contract with the SQL oracle: every arithmetic step is
    ordered exactly as the mirrored SQL expression (left-assoc * and /,
    per-term sum in declaration order); the only non-identical
    primitive is ln(), identical within 1 ulp on both engines and
    swallowed by the caller's 4-decimal rounding.

    Returns the per-block candidate Dataset (id_col, raw); the caller
    finishes with the tiny global (-raw, id) top-k.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    terms = list(terms)
    if not terms or k <= 0:
        raise ValueError("bm25_topk needs a non-empty term list and k > 0")
    STAT = "\x00stats"

    def stats_partial(t: pa.Table) -> pa.Table:
        tok = _token_lists(t[text_col])
        dl = tok.list.len().cast(pl.Int64).to_numpy()
        dfs = [int(tok.list.contains(term).sum() or 0) for term in terms]
        return pa.table({
            "term": pa.array([STAT] + terms, pa.string()),
            "df": pa.array([0] + dfs, pa.int64()),
            "n_docs": pa.array([len(dl)] + [0] * len(terms), pa.int64()),
            "dl_sum": pa.array([int(dl.sum())] + [0] * len(terms),
                               pa.int64()),
        })

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("term")
             .aggregate(_Sum("df", alias_name="df"),
                        _Sum("n_docs", alias_name="n_docs"),
                        _Sum("dl_sum", alias_name="dl_sum"))
             .take_all())  # <= |terms|+1 rows by construction
    by_term = {r["term"]: r for r in stats}
    n = float(by_term[STAT]["n_docs"])
    if n == 0:
        raise ValueError("bm25_topk over an empty corpus")
    avgdl = by_term[STAT]["dl_sum"] / n
    idf = np.array([np.log((n - by_term[t]["df"] + 0.5)
                           / (by_term[t]["df"] + 0.5) + 1.0)
                    for t in terms])
    state = ray.put((terms, idf, float(avgdl)))

    def score_block(t: pa.Table) -> pa.Table:
        import ray as _ray
        from .ann import _topk_ids
        terms_, idf_, avgdl_ = _ray.get(state)
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "raw": pa.array([], pa.float64())})
        tok = _token_lists(t[text_col])
        dl = tok.list.len().cast(pl.Int64).to_numpy().astype(np.float64)
        denom = k1 * (1.0 - b + b * dl / avgdl_)
        s = np.zeros(len(dl))
        for term, w in zip(terms_, idf_):
            tf = tok.list.count_matches(term).to_numpy().astype(np.float64)
            s = s + w * (tf * (k1 + 1.0)) / (tf + denom)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sel = _topk_ids(s, ids, min(k, len(s)))
        return pa.table({id_col: pa.array(ids[sel], pa.int64()),
                         "raw": pa.array(s[sel], pa.float64())})

    return ds.map_batches(score_block, batch_format="pyarrow")


def pack_chunks(ds, budget: int, key_col: str = "source",
                id_col: str = "doc_id", n_tokens_col: str = "n_tokens",
                n_buckets: int | None = None):
    """Sequence packing: concatenate each key's docs in ``id_col``
    order and cut at every ``budget`` tokens — chunk k of a doc is
    ``(running_total_before_doc) // budget`` (a doc longer than the
    budget still lands in one chunk; real packers would split it, but
    the chunk ASSIGNMENT is the distributed part). One bucketed
    groupby is the only exchange; the in-group kernel is a sorted
    per-key cumsum (C-level pandas).

    Partitioning contract: chunking is order-dependent WITHIN a key,
    so one key's rows must fit one group — same assumption as
    session_windows; at corpus scale pre-shard the key (e.g.
    source+date) so each shard chunks independently.
    """
    from .. import config
    from .util import arrow_table, coalesced

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t[key_col]
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        h = pl.from_arrow(c).hash(seed=11).to_numpy().astype(np.uint64)
        return t.append_column(
            "__b", pa.array((h % np.uint64(b)).astype(np.int64), pa.int64()))

    def pack(df) -> pa.Table:
        df = df.sort_values([key_col, id_col], kind="mergesort")
        run = df.groupby(key_col, sort=False)[n_tokens_col].cumsum()
        out = df[[key_col, id_col, n_tokens_col]].copy()
        out["chunk"] = ((run - df[n_tokens_col]) // budget).astype(np.int64)
        return arrow_table(out)

    return (coalesced(ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("__b").map_groups(pack, batch_format="pandas"))


# ------------------------------------------- benchmark decontamination

def _ngram_hash_frame(col, n: int):
    """(row_index, gram_hash) arrays for every lowercase word n-gram
    ([a-z0-9_]+ tokens, the bm25 tokenizer) of a text column — the
    generalized n-gram feed of ``bigram_rows_batch``, hashed to the
    60-bit SQL-parity md5 value so membership tests reproduce exactly
    in DuckDB (h60 of ``a[i] || ' ' || ... || a[i+n-1]``)."""
    from ..functions.hashing import md5_hash60

    toks = _token_lists(col)
    long = (pl.DataFrame({"i": pl.Series(np.arange(len(toks), dtype=np.int64)),
                          "tok": toks})
            .explode("tok").drop_nulls("tok"))
    tails = [f"t{j}" for j in range(1, n)]
    if tails:
        long = (long.with_columns([pl.col("tok").shift(-j).over("i").alias(c)
                                   for j, c in enumerate(tails, start=1)])
                .drop_nulls(tails))
    df = long.select(
        pl.col("i"),
        pl.concat_str([pl.col("tok"), *(pl.col(c) for c in tails)],
                      separator=" ").alias("g"))
    if df.height == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return df["i"].to_numpy(), md5_hash60(df["g"].to_numpy())


def decontaminate(docs, eval_ds, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", eval_text_col: str = "text",
                  distributed: bool = False):
    """Benchmark decontamination — the pre-training curation gate that
    drops corpus documents overlapping an evaluation set: per document,
    count the DISTINCT eval-set word n-grams it contains; docs with
    ``n_hit >= 1`` are the contaminated set. Membership is by 60-bit
    md5 gram hash on BOTH sides, so the rule (collision semantics
    included) is exactly reproducible in SQL.

    Default (broadcast) path: the eval set's distinct gram hashes are
    reduced per-batch and collected driver-side — bounded by contract:
    eval benchmarks are tiny next to the training corpus — sorted and
    ``ray.put`` once; each doc batch probes via ``searchsorted`` and
    counts per-doc distinct hits in one vectorized polars group_by.
    ZERO shuffles: the corpus streams through a single stateless map.

    ``distributed=True`` (no broadcast-size precondition): doc grams
    explode to (id, gh) rows — per-batch distinct, and globally
    distinct because a document's text lives in one batch — semijoin
    the eval hash set via ``hash_join``, then one groupby(id) count.
    Byte-identical output (equivalence test in tests/test_round3.py).

    Output schema: ``(id_col, n_hit: int64)`` — contaminated docs only.
    """
    import ray

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def eval_partial(t: pa.Table) -> pa.Table:
        _, h = _ngram_hash_frame(t[eval_text_col], n)
        return pa.table({"gh": pa.array(np.unique(h), pa.int64())})

    ev = eval_ds.map_batches(eval_partial, batch_format="pyarrow")

    if distributed:
        from ray.data.aggregate import Count

        from .joins import hash_join

        def doc_pairs(t: pa.Table) -> pa.Table:
            idc = (t[id_col].combine_chunks()
                   if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
            i, h = _ngram_hash_frame(t[text_col], n)
            df = pl.DataFrame({"i": i, "gh": h}).unique()
            return pa.table({id_col: idc.take(pa.array(df["i"].to_numpy())),
                             "gh": pa.array(df["gh"].to_numpy(), pa.int64())})

        ev_distinct = (ev.groupby("gh")
                       .aggregate(Count(alias_name="__c"))
                       .select_columns(["gh"]))
        pairs = hash_join(docs.map_batches(doc_pairs, batch_format="pyarrow"),
                          ev_distinct, on="gh", how="left_semi")
        return (pairs.groupby(id_col)
                .aggregate(Count(alias_name="n_hit")))

    rows = ev.take_all()  # eval-side distinct hashes only, bounded by contract
    hashes = (np.unique(np.array([r["gh"] for r in rows], dtype=np.int64))
              if rows else np.empty(0, np.int64))
    ref = ray.put(hashes)

    def flag(t: pa.Table) -> pa.Table:
        import ray as _ray
        idc = (t[id_col].combine_chunks()
               if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
        empty = pa.table({id_col: idc.slice(0, 0),
                          "n_hit": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        i, h = _ngram_hash_frame(t[text_col], n)
        ev_ = _ray.get(ref)
        if len(ev_) == 0 or len(h) == 0:
            return empty
        pos = np.minimum(np.searchsorted(ev_, h), len(ev_) - 1)
        hit = ev_[pos] == h
        if not hit.any():
            return empty
        cnt = (pl.DataFrame({"i": i[hit], "gh": h[hit]})
               .unique().group_by("i").len())
        return pa.table({id_col: idc.take(pa.array(cnt["i"].to_numpy())),
                         "n_hit": pa.array(cnt["len"].to_numpy().astype(np.int64),
                                           pa.int64())})

    return docs.map_batches(flag, batch_format="pyarrow")


# --------------------------------------- unigram LM quality scoring

LM_SCALE = 1_000_000  # logprob quantization (micro-nats)


def _token_rows(col):
    """(row_index, token) exploded frame for a text column — the
    lowercase [a-z0-9_]+ tokenizer shared with bm25/decontaminate."""
    toks = _token_lists(col)
    return (pl.DataFrame({"i": pl.Series(np.arange(len(toks), dtype=np.int64)),
                          "tok": toks})
            .explode("tok").drop_nulls("tok"))


def unigram_counts(ds, text_col: str = "text"):
    """Distributed corpus unigram counts: per-batch partial counts
    (polars explode + group_by — one (tok, c) row per DISTINCT token
    per batch, the combiner that keeps the exchange sub-corpus-sized),
    then one global groupby sum. Output: (tok: string, c: int64)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cnt = _token_rows(t[text_col]).group_by("tok").len()
        return pa.table({"tok": cnt["tok"].to_arrow().cast(pa.string()),
                         "c": pa.array(cnt["len"].to_numpy().astype(np.int64),
                                       pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("tok").aggregate(Sum("c", alias_name="c")))


def _doc_token_weights(text_col: str, id_col: str):
    """Batch fn: explode docs to DISTINCT (id, tok, n) rows — the
    weighted probe side of the distributed scoring joins. Tokens
    repeat heavily (stopwords), so shipping one weighted row per
    distinct (doc, token) instead of one per INSTANCE cuts the join
    exchange and flattens the hot-token bucket; downstream sums use
    Σ n·lp == Σ over instances of lp, exactly (int64)."""
    def doc_tokens(t: pa.Table) -> pa.Table:
        idc = (t[id_col].combine_chunks()
               if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
        long = _token_rows(t[text_col])
        pairs = pa.table({
            id_col: idc.take(pa.array(long["i"].to_numpy())),
            "tok": long["tok"].to_arrow().cast(pa.string())})
        g = pairs.group_by([id_col, "tok"]).aggregate([([], "count_all")])
        return pa.table({id_col: g[id_col], "tok": g["tok"],
                         "n": g["count_all"].cast(pa.int64())})
    return doc_tokens


def _weighted_doc_lp_partial(id_col: str, n_col: str):
    """Per-batch combiner of WEIGHTED join output (id, ..., n, lp):
    per doc, n_col = Σn and lp = Σ n·lp — integer sums, so the global
    Sum-of-partials equals the unweighted per-instance Count/Sum."""
    def f(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        lp = t["lp"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = pa.table({id_col: t[id_col],
                      "n": pa.array(n, pa.int64()),
                      "nlp": pa.array(n * lp, pa.int64())})
        g = w.group_by([id_col]).aggregate([("n", "sum"), ("nlp", "sum")])
        return pa.table({id_col: g[id_col],
                         n_col: g["n_sum"],
                         "lp": g["nlp_sum"]})
    return f


def lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
             scale: int = LM_SCALE, distributed: bool = False):
    """Unigram language-model log-likelihood scoring — the CCNet-style
    quality proxy of corpus curation: train a unigram LM on the corpus
    itself (distributed counts), then score every document by the sum
    of its tokens' log-probabilities. Low mean logprob = unusual token
    distribution = candidate for the quality-filter tail.

    Exactness contract: the per-token logprob is QUANTIZED to an
    integer — ``floor(scale * ln(c / T))`` (micro-nats) — so per-doc
    sums are order-independent integer arithmetic and the SQL oracle
    reproduces them bit-for-bit (ln() is the one shared libm
    primitive; the floor boundary is measure-zero and fixture-
    verified, the same contract as the quantized k-means mirror).

    Broadcast path (default): the reduced vocab — O(distinct tokens),
    ≪ corpus by construction; prune upstream if a web-scale vocab
    outgrows worker heap — is collected once, token array sorted,
    ray.put; each doc batch maps tokens via searchsorted and sums
    int64 logprobs in one polars group_by. One narrow shuffle total
    (the count reduce).

    ``distributed=True``: no broadcast — doc tokens explode to
    (id, tok) rows, inner-join the vocab Dataset via ``hash_join``,
    one groupby(id) sum. Byte-identical output (equivalence test).

    Output: ``(id_col, n_tok: int64, lp_sum: int64)`` — docs with at
    least one token (empty docs have no LM evidence, matching the SQL
    join semantics).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    vocab = unigram_counts(ds, text_col)

    if distributed:
        from .joins import hash_join

        # pin the counts: total, and the join side below, both trace
        # to this lineage — unmaterialized, Ray re-runs the full
        # corpus count reduce once PER consumer
        vocab = vocab.materialize()
        total = vocab.sum("c")  # tiny driver scalar

        def add_lp(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            lp = np.floor(scale * np.log(c / float(total))).astype(np.int64)
            return pa.table({"tok": t["tok"], "lp": pa.array(lp, pa.int64())})

        joined = hash_join(ds.map_batches(_doc_token_weights(text_col,
                                                             id_col),
                                          batch_format="pyarrow"),
                           vocab.map_batches(add_lp, batch_format="pyarrow"),
                           on="tok")
        # pre-combine per batch: the exchange moves one row per doc
        # per block, never the full (doc, token) join output
        return (joined.map_batches(_weighted_doc_lp_partial(id_col,
                                                            "n_tok"),
                                   batch_format="pyarrow")
                .groupby(id_col)
                .aggregate(Sum("n_tok", alias_name="n_tok"),
                           Sum("lp", alias_name="lp_sum")))

    rows = vocab.take_all()  # reduced vocab only — bounded by contract
    toks = np.array([r["tok"] for r in rows], dtype=object)
    cs = np.array([r["c"] for r in rows], dtype=np.float64)
    order = np.argsort(toks)
    toks, cs = toks[order], cs[order]
    total = float(cs.sum())
    qlp = (np.floor(scale * np.log(cs / total)).astype(np.int64)
           if len(cs) else np.empty(0, np.int64))
    return _token_value_scan(ds, text_col, id_col, toks, qlp, "lp_sum")


def _token_value_scan(ds, text_col: str, id_col: str,
                      toks_sorted: np.ndarray, vals: np.ndarray,
                      out_col: str, rows_fn=None, key_field: str = "tok",
                      n_col: str = "n_tok"):
    """Broadcast a (sorted key array, int64 value array) lookup once
    via ray.put; stream docs through ONE stateless map that sums the
    values of each document's in-vocab keys (searchsorted probe +
    polars group_by). OOV keys carry no evidence and are dropped —
    inner-join semantics, matching the SQL mirrors. ``rows_fn``
    generalizes the key frame (unigram ``_token_rows`` by default,
    ``_bigram_rows`` for adjacent-pair models) so every scorer shares
    this one probe."""
    import ray

    rows_fn = rows_fn or _token_rows

    ref = ray.put((toks_sorted, vals))

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray
        idc = (t[id_col].combine_chunks()
               if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
        empty = pa.table({id_col: idc.slice(0, 0),
                          n_col: pa.array([], pa.int64()),
                          out_col: pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        long = rows_fn(t[text_col])
        if long.height == 0:
            return empty
        toks_, vals_ = _ray.get(ref)
        arr = long[key_field].to_numpy()
        if len(toks_) == 0:
            return empty
        pos = np.minimum(np.searchsorted(toks_, arr), len(toks_) - 1)
        valid = toks_[pos] == arr
        if not valid.any():
            return empty
        agg = (pl.DataFrame({"i": long["i"].to_numpy()[valid],
                             "v": vals_[pos[valid]]})
               .group_by("i").agg(pl.len().alias(n_col),
                                  pl.col("v").sum().alias(out_col)))
        return pa.table({
            id_col: idc.take(pa.array(agg["i"].to_numpy())),
            n_col: pa.array(agg[n_col].to_numpy().astype(np.int64),
                            pa.int64()),
            out_col: pa.array(agg[out_col].to_numpy().astype(np.int64),
                              pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def _bigram_rows(col):
    """(row_index, 'w1 w2') exploded frame of adjacent-token pairs —
    the order-preserving explode of ``_token_rows`` shifted against
    itself inside each row (vectorized; never a per-doc loop)."""
    long = _token_rows(col)
    if long.height == 0:
        return pl.DataFrame({"i": pl.Series([], dtype=pl.Int64),
                             "big": pl.Series([], dtype=pl.String)})
    return (long.with_columns(w2=pl.col("tok").shift(-1),
                              i2=pl.col("i").shift(-1))
            .filter(pl.col("i") == pl.col("i2"))
            .select("i", big=pl.col("tok") + " " + pl.col("w2")))


def bigram_counts(ds, text_col: str = "text"):
    """Distributed corpus bigram counts, packed as one 'w1 w2' string
    key (single-key groupby — a two-string-key Ray groupby measured
    >4x slower at identical row counts). Per-batch partials keep the
    exchange at one row per DISTINCT bigram per batch.
    Output: (big: string, c: int64)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cnt = _bigram_rows(t[text_col]).group_by("big").len()
        return pa.table({"big": cnt["big"].to_arrow().cast(pa.string()),
                         "c": pa.array(cnt["len"].to_numpy().astype(np.int64),
                                       pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("big").aggregate(Sum("c", alias_name="c")))


def bigram_lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
                    scale: int = LM_SCALE, distributed: bool = False):
    """Conditional bigram language-model scoring — the second-order
    refinement of ``lm_score``: train bigram counts on the corpus
    itself, quantize each bigram's CONDITIONAL log-probability
    ``floor(scale * ln(c(w1,w2) / c1(w1)))`` (``c1`` = w1's total as a
    bigram left element, so the model is properly normalized per
    context), then score every document by the integer sum over its
    adjacent-pair instances. Fluency-per-context beats raw unigram
    rarity for boilerplate/gibberish detection.

    Same exactness contract as ``lm_score``: integer micro-nats make
    per-doc sums order-independent and SQL-bit-exact (shared libm
    ``ln`` on identical doubles; floor boundaries measure-zero).

    Scale shape: one bigram count reduce + one vocab-sized groupby
    (c1) + one vocab-sized join, then EITHER a broadcast probe
    (default — bigram vocab is reduced-vocab-sized by contract; prune
    upstream if a web-scale vocab outgrows worker heap) or, with
    ``distributed=True``, a no-broadcast dual: doc bigrams explode to
    (id, big) rows and inner-join the model via ``hash_join`` —
    byte-identical output (equivalence test).

    Output: ``(id_col, n_big: int64, lp_sum: int64)`` for docs with
    >= 1 bigram (single-token and empty docs carry no evidence,
    matching the SQL join semantics).
    """
    from ray.data.aggregate import Sum

    from .joins import hash_join

    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    cnt = bigram_counts(ds, text_col)

    if distributed:
        from .util import shuffle_blocks as _shuffle_blocks

        # no-broadcast dual, ONE-exchange model build (round 5; was
        # cnt-aggregate -> c1-aggregate -> model hash_join = three
        # barriers): grouping the per-batch (w1, big, c) partials by
        # w1 co-locates every bigram sharing a left context, so one
        # map_groups computes the cross-batch bigram totals AND the
        # c1 normalizer AND the quantized lp in place. Same int64
        # sums, same doubles, same floor — byte-identical model. A w1
        # group is bounded by one context word's fan-out in the
        # REDUCED vocab (partial rows, never doc instances) — the
        # documented model-build skew bound.
        def w1_partials(t: pa.Table) -> pa.Table:
            cnt_b = _bigram_rows(t[text_col]).group_by("big").len()
            w1 = cnt_b["big"].str.split(" ").list.first()
            return pa.table({
                "w1": w1.to_arrow().cast(pa.string()),
                "big": cnt_b["big"].to_arrow().cast(pa.string()),
                "c": pa.array(cnt_b["len"].to_numpy().astype(np.int64),
                              pa.int64())})

        # partials are vocab-bounded per batch; materialize to SIZE
        # the exchange: empty sort ranges over a low-cardinality w1
        # key are what trip Ray's zero-column RefBundle warnings — a
        # single reduce partition has no boundaries to duplicate, and
        # by the time partial rows outgrow the threshold the w1
        # cardinality is high enough for distinct sampled boundaries.
        partials = ds.map_batches(w1_partials,
                                  batch_format="pyarrow").materialize()
        vb = max(1, min(int(_shuffle_blocks()),
                        int(partials.count()) // 65536))

        def model_group(t: pa.Table) -> pa.Table:
            g = (pl.from_arrow(t.select(["big", "c"]))
                 .group_by("big").agg(pl.col("c").sum()))
            c = g["c"].to_numpy().astype(np.float64)
            c1 = float(c.sum())
            lp = np.floor(scale * np.log(c / c1)).astype(np.int64)
            return pa.table({"big": g["big"].to_arrow().cast(pa.string()),
                             "lp": pa.array(lp, pa.int64())})

        model = (partials.repartition(vb).groupby("w1")
                 .map_groups(model_group, batch_format="pyarrow"))

        def doc_bigrams(t: pa.Table) -> pa.Table:
            # per-batch (id, big) -> n combiner BEFORE the join
            # exchange: docs repeat bigrams (Zipf), so shipping one
            # weighted row per distinct (doc, bigram) instead of one
            # row per INSTANCE cuts exchange volume and flattens the
            # hot-bigram bucket (a hot key now holds <= one row per
            # doc per batch, not its full instance count). lp_sum =
            # sum(n*lp) == sum over instances of lp, exactly (int64).
            idc = (t[id_col].combine_chunks()
                   if isinstance(t[id_col], pa.ChunkedArray)
                   else t[id_col])
            long = _bigram_rows(t[text_col])
            pairs = pa.table({
                id_col: idc.take(pa.array(long["i"].to_numpy())),
                "big": long["big"].to_arrow().cast(pa.string())})
            g = pairs.group_by([id_col, "big"]).aggregate([([], "count_all")])
            return pa.table({id_col: g[id_col], "big": g["big"],
                             "n": g["count_all"].cast(pa.int64())})

        joined = hash_join(ds.map_batches(doc_bigrams,
                                          batch_format="pyarrow"),
                           model, on="big")

        out = (joined.map_batches(_weighted_doc_lp_partial(id_col,
                                                           "n_big"),
                                  batch_format="pyarrow")
               .groupby(id_col)
               .aggregate(Sum("n_big", alias_name="n_big"),
                          Sum("lp", alias_name="lp_sum")))
        return out

    # broadcast path: the model gets take_all'd for the probe anyway
    # (bigram vocab — bounded by contract), so finalize it ON THE
    # DRIVER in one vectorized pass: the c1 groupby and the model
    # hash_join were two extra exchanges spent producing a table we
    # were about to collect. Same integers (int64 sums), same doubles
    # (c/s division), so byte-identical to the distributed dual.
    rows = cnt.take_all()  # bigram vocab only — bounded by contract
    bigs = np.array([r["big"] for r in rows], dtype=object)
    cs = np.array([r["c"] for r in rows], dtype=np.int64)
    order = np.argsort(bigs)
    bigs, cs = bigs[order], cs[order]
    w1 = np.array([s.split(" ", 1)[0] for s in bigs], dtype=object)
    uw, inv = np.unique(w1, return_inverse=True)
    c1s = np.zeros(len(uw), np.int64)
    np.add.at(c1s, inv, cs)
    lps = np.floor(scale * np.log(cs.astype(np.float64)
                                  / c1s[inv].astype(np.float64))
                   ).astype(np.int64)
    scored = _bigram_value_scan(ds, text_col, id_col, bigs, lps)
    return scored


def _bigram_value_scan(ds, text_col: str, id_col: str,
                       keys_sorted: np.ndarray, vals: np.ndarray):
    """Bigram instantiation of the shared ``_token_value_scan``
    probe (adjacent-pair keys, n_big count column)."""
    return _token_value_scan(ds, text_col, id_col, keys_sorted, vals,
                             "lp_sum", rows_fn=_bigram_rows,
                             key_field="big", n_col="n_big")


def dsir_weights(ds, target_ds, text_col: str = "text",
                 id_col: str = "doc_id", scale: int = LM_SCALE,
                 distributed: bool = False):
    """DSIR-style importance weighting for data selection: score every
    corpus document by how much more likely its tokens are under the
    TARGET distribution than under the raw-corpus distribution —
    ``w_sum = Σ_tokens [qlp_target(tok) − qlp_raw(tok)]`` — then keep
    the top fraction (or sample ∝ exp(w)) to shift the corpus toward
    the target domain.

    Both unigram models are trained distributedly (`unigram_counts`);
    the raw model uses maximum likelihood (every scored token has
    c ≥ 1 by construction), the target model add-one smoothing over
    the RAW vocabulary — ``(c_t + 1) / (T_t + V)`` with ``T_t`` the
    target token total and ``V`` the raw vocab size — so unseen-in-
    target tokens get a finite penalty. Per-token values are quantized
    to integer micro-nats (the `lm_score` contract), making per-doc
    sums order-independent and the SQL mirror bit-exact.

    Scale shape (default): two narrow count reduces + one broadcast +
    one streaming scan; nothing doc-sized crosses a shuffle. The
    broadcast is the reduced raw vocab — bounded by contract, with
    ``distributed=True`` as the no-broadcast dual: the two vocab
    Datasets left-join via ``hash_join`` to a (tok, w) table, doc
    tokens explode and inner-join it, one groupby(id) sum —
    byte-identical output (equivalence test in tests/test_round3.py).

    Output: ``(id_col, n_tok: int64, w_sum: int64)`` for docs with at
    least one in-vocab token.
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    if distributed:
        from ray.data.aggregate import Sum

        from .joins import hash_join
        from .util import shuffle_blocks as _shuffle_blocks

        raw = unigram_counts(ds, text_col).materialize()  # scalars + join
        tgt = unigram_counts(target_ds, text_col).materialize()
        t_raw = float(raw.sum("c"))
        v = float(raw.count())
        t_tgt = float(tgt.sum("c") or 0)

        def rename_ct(t: pa.Table) -> pa.Table:
            return pa.table({"tok": t["tok"], "ct": t["c"]})

        # vocab-sized union: size the exchange from the known counts
        # so no sort range partition is empty (zero-column RefBundle
        # warnings; see hash_join's sort_blocks doc)
        vb = max(1, min(int(_shuffle_blocks()),
                        (int(v) + int(tgt.count())) // 65536))
        vocab = hash_join(raw, tgt.map_batches(rename_ct,
                                               batch_format="pyarrow"),
                          on="tok", how="left", sort_blocks=vb)

        def add_w(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            cr_ = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            ct_ = (pc.fill_null(t["ct"], 0).to_numpy(zero_copy_only=False)
                   .astype(np.float64))
            w_ = (np.floor(scale * np.log((ct_ + 1.0) / (t_tgt + v)))
                  - np.floor(scale * np.log(cr_ / t_raw))).astype(np.int64)
            return pa.table({"tok": t["tok"], "lp": pa.array(w_, pa.int64())})

        joined = hash_join(ds.map_batches(_doc_token_weights(text_col,
                                                             id_col),
                                          batch_format="pyarrow"),
                           vocab.map_batches(add_w, batch_format="pyarrow"),
                           on="tok")
        # weighted pre-combine (see _doc_token_weights): Σn == the
        # per-instance Count, Σ n·lp == the per-instance Sum, exactly
        return (joined.map_batches(_weighted_doc_lp_partial(id_col,
                                                            "n_tok"),
                                   batch_format="pyarrow")
                .groupby(id_col)
                .aggregate(Sum("n_tok", alias_name="n_tok"),
                           Sum("lp", alias_name="w_sum")))

    raw_rows = unigram_counts(ds, text_col).take_all()
    tgt_rows = unigram_counts(target_ds, text_col).take_all()
    toks = np.array([r["tok"] for r in raw_rows], dtype=object)
    cr = np.array([r["c"] for r in raw_rows], dtype=np.float64)
    order = np.argsort(toks)
    toks, cr = toks[order], cr[order]
    t_raw = float(cr.sum())
    v = float(len(toks))
    ct = np.zeros(len(toks), dtype=np.float64)
    if tgt_rows:
        ttoks = np.array([r["tok"] for r in tgt_rows], dtype=object)
        tcs = np.array([r["c"] for r in tgt_rows], dtype=np.float64)
        pos = np.minimum(np.searchsorted(toks, ttoks), max(len(toks) - 1, 0))
        hit = (toks[pos] == ttoks) if len(toks) else np.zeros(len(ttoks), bool)
        ct[pos[hit]] = tcs[hit]
        t_tgt = float(tcs.sum())  # ALL target tokens, in-vocab or not
    else:
        t_tgt = 0.0
    if len(toks) == 0:
        w = np.empty(0, np.int64)
    else:
        qlp_t = np.floor(scale * np.log((ct + 1.0) / (t_tgt + v)))
        qlp_r = np.floor(scale * np.log(cr / t_raw))
        w = (qlp_t - qlp_r).astype(np.int64)
    return _token_value_scan(ds, text_col, id_col, toks, w, "w_sum")


def nb_classify(ds, text_col: str = "text", id_col: str = "doc_id",
                label_col: str = "source", scale: int = LM_SCALE,
                distributed: bool = False):
    """Multinomial Naive Bayes, trained on the corpus itself and then
    applied back to every document — the classic supervised
    source/domain classifier of corpus curation (fastText-style
    routing, quality-domain tagging). Add-one (Laplace) smoothing over
    the corpus vocabulary, class priors from document counts.

    Exactness contract (the lm_score family contract): every per-token
    class log-probability and every class prior is QUANTIZED to
    integer micro-nats — ``floor(scale * ln(x))`` — before any
    summation, so per-(doc, class) scores are order-independent int64
    sums and the SQL oracle reproduces them bit-for-bit. Prediction is
    argmax score with lexicographic tie-break on the label.

    Training is one narrow exchange either way: per-batch (label, tok,
    c) partials (polars combiner) -> one groupby sum whose output is
    O(classes x observed vocab), corpus-size-independent. Priors ride
    a second O(classes) aggregate.

    Broadcast path (default): the quantized dense (classes x vocab)
    log-prob matrix — bounded by the same vocab contract as lm_score;
    prune upstream if a web-scale vocab outgrows worker heap — ships
    once via ray.put; each doc batch scores with one searchsorted
    probe + one integer matmul accumulation. Zero additional shuffles.

    ``distributed=True``: no model broadcast. Scores decompose as
    ``score(d,c) = base_q(c) + N_d*miss_q(c) + sum_t n_t*delta(c,t)``
    where delta is only defined on OBSERVED (class, token) pairs — so
    the model Dataset stays sparse. The weighted doc explode joins the
    sparse model on ``tok`` (hash_join), per-batch partials combine by
    (id, label), per-doc token totals ride the SAME exchange as
    sentinel-label rows (one union, no second reduce), and one final
    groupby(id) computes all class scores + argmax against the tiny
    O(classes) base vector. Byte-identical output (equivalence test).

    Output: ``(id_col, pred: string, score_q: int64)`` for docs with
    at least one token (empty docs carry no evidence, matching the
    SQL inner-join semantics).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    def partial(t: pa.Table) -> pa.Table:
        labc = (t[label_col].combine_chunks()
                if isinstance(t[label_col], pa.ChunkedArray)
                else t[label_col])
        long = _token_rows(t[text_col])
        pairs = pa.table({
            "lab": labc.take(pa.array(long["i"].to_numpy())),
            "tok": long["tok"].to_arrow().cast(pa.string())})
        g = pairs.group_by(["lab", "tok"]).aggregate([([], "count_all")])
        return pa.table({"lab": g["lab"], "tok": g["tok"],
                         "c": g["count_all"].cast(pa.int64())})

    model = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["lab", "tok"]).aggregate(Sum("c", alias_name="c")))
    if distributed:
        # the sparse join side below shares this lineage with the
        # driver fold — pin it or Ray re-runs the count reduce twice
        model = model.materialize()

    prior_rows = (ds.groupby(label_col)
                  .aggregate(Count(alias_name="nd")).take_all())
    labels = np.array(sorted(r[label_col] for r in prior_rows),
                      dtype=object)
    nd_by_lab = {r[label_col]: float(r["nd"]) for r in prior_rows}
    nd_total = float(sum(nd_by_lab.values()))
    prior_q = np.array([np.floor(scale * np.log(nd_by_lab[l] / nd_total))
                        for l in labels], dtype=np.int64)

    # model exchange output is O(classes x vocab) — bounded by the
    # lm_score vocab contract, so the driver fold below is too
    rows = model.take_all()
    toks_all = np.array(sorted({r["tok"] for r in rows}), dtype=object)
    v = float(len(toks_all))
    lab_idx = {l: i for i, l in enumerate(labels)}
    cnt = np.zeros((len(labels), len(toks_all)), dtype=np.float64)
    if rows:
        r_lab = np.array([lab_idx[r["lab"]] for r in rows], np.int64)
        r_tok = np.searchsorted(toks_all,
                                np.array([r["tok"] for r in rows],
                                         dtype=object))
        cnt[r_lab, r_tok] = np.array([r["c"] for r in rows], np.float64)
    tc = cnt.sum(axis=1)  # per-class token totals
    # quantize BEFORE summing: identical float64 composition in SQL
    lp = np.floor(scale * np.log((cnt + 1.0)
                                 / (tc[:, None] + v))).astype(np.int64)
    miss_q = np.floor(scale * np.log(1.0 / (tc + v))).astype(np.int64)

    out_schema = pa.schema([(id_col, pa.int64()), ("pred", pa.string()),
                            ("score_q", pa.int64())])

    if not distributed:
        ref = ray.put((toks_all, labels, lp, prior_q))

        def score(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            idc = (t[id_col].combine_chunks()
                   if isinstance(t[id_col], pa.ChunkedArray) else t[id_col])
            long = _token_rows(t[text_col])
            if long.height == 0:
                return out_schema.empty_table()
            toks_, labs_, lp_, pr_ = ray.get(ref)
            g = long.group_by(["i", "tok"]).len()
            di = g["i"].to_numpy()
            n = g["len"].to_numpy().astype(np.int64)
            tix = np.searchsorted(toks_, g["tok"].to_numpy())
            # docs trained on == docs scored: every token is in-vocab
            uniq, inv = np.unique(di, return_inverse=True)
            scores = np.tile(pr_, (len(uniq), 1))
            np.add.at(scores, inv, (lp_[:, tix] * n).T)
            best = np.argmax(scores, axis=1)  # first max = smallest label
            return pa.table({
                id_col: idc.take(pa.array(uniq)),
                "pred": pa.array(labs_[best].tolist(), pa.string()),
                "score_q": pa.array(scores[np.arange(len(uniq)), best],
                                    pa.int64())})

        return ds.map_batches(score, batch_format="pyarrow")

    # ---- distributed dual: sparse-delta join, one union, one reduce
    from .joins import hash_join

    SENTINEL = "\x00"
    base_ref = ray.put((labels, prior_q, miss_q))

    def sparse_delta(t: pa.Table) -> pa.Table:
        labs_, _, miss_ = ray.get(base_ref)
        li = np.array([lab_idx[x] for x in
                       t["lab"].to_numpy(zero_copy_only=False)], np.int64)
        tix = np.searchsorted(toks_all,
                              t["tok"].to_numpy(zero_copy_only=False)
                              .astype(object))
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp_obs = np.floor(scale * np.log((c + 1.0)
                                         / (tc[li] + v))).astype(np.int64)
        return pa.table({"tok": t["tok"],
                         "lab": t["lab"].combine_chunks().cast(pa.string())
                         if isinstance(t["lab"], pa.ChunkedArray)
                         else t["lab"],
                         "delta": pa.array(lp_obs - miss_[li], pa.int64())})

    probe = ds.map_batches(_doc_token_weights(text_col, id_col),
                           batch_format="pyarrow")

    from .. import config
    n_buckets = config.DEFAULT_JOIN_BUCKETS

    def _bucket(ids: np.ndarray) -> pa.Array:
        return pa.array((splitmix64(ids.astype(np.uint64))
                         % np.uint64(n_buckets)).astype(np.int64),
                        pa.int64())

    def ntok_partial(t: pa.Table) -> pa.Table:
        df = (pl.DataFrame({"id": t[id_col].to_numpy(zero_copy_only=False),
                            "n": t["n"].to_numpy(zero_copy_only=False)})
              .group_by("id").agg(pl.col("n").sum()))
        ids = df["id"].to_numpy().astype(np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "lab": pa.array([SENTINEL] * df.height, pa.string()),
            "s": pa.array(df["n"].to_numpy().astype(np.int64), pa.int64()),
            "__b": _bucket(ids)})

    joined = hash_join(probe, model.map_batches(sparse_delta,
                                                batch_format="pyarrow"),
                       on="tok")

    def obs_partial(t: pa.Table) -> pa.Table:
        df = (pl.DataFrame({"id": t[id_col].to_numpy(zero_copy_only=False),
                            "lab": t["lab"].to_numpy(zero_copy_only=False),
                            "v": t["n"].to_numpy(zero_copy_only=False)
                            * t["delta"].to_numpy(zero_copy_only=False)})
              .group_by(["id", "lab"]).agg(pl.col("v").sum()))
        ids = df["id"].to_numpy().astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "lab": pa.array(df["lab"].to_list(), pa.string()),
                         "s": pa.array(df["v"].to_numpy().astype(np.int64),
                                       pa.int64()),
                         "__b": _bucket(ids)})

    both = (joined.map_batches(obs_partial, batch_format="pyarrow")
            .union(probe.map_batches(ntok_partial,
                                     batch_format="pyarrow")))

    def finalize(df: "pd.DataFrame") -> pa.Table:
        labs_, pr_, miss_ = ray.get(base_ref)
        ids = df[id_col].to_numpy()
        labs = df["lab"].to_numpy()
        s = df["s"].to_numpy().astype(np.int64)
        # NB: compare in polars — numpy's U dtype strips "\x00", so a
        # numpy == comparison against the sentinel is always False
        frame = pl.DataFrame({"id": ids, "lab": labs, "s": s})
        n_tok = (frame.filter(pl.col("lab") == SENTINEL)
                 .group_by("id").agg(pl.col("s").sum()))
        uniq = np.sort(n_tok["id"].to_numpy())
        nvec = n_tok.sort("id")["s"].to_numpy().astype(np.int64)
        scores = pr_[None, :] + nvec[:, None] * miss_[None, :]
        obs = frame.filter(pl.col("lab") != SENTINEL)
        if obs.height:
            oi = np.searchsorted(uniq, obs["id"].to_numpy())
            oc = np.array([lab_idx[x] for x in obs["lab"].to_list()],
                          np.int64)
            np.add.at(scores, (oi, oc),
                      obs["s"].to_numpy().astype(np.int64))
        best = np.argmax(scores, axis=1)
        return pa.table({
            id_col: pa.array(uniq, pa.int64()),
            "pred": pa.array(labs_[best].tolist(), pa.string()),
            "score_q": pa.array(scores[np.arange(len(uniq)), best],
                                pa.int64())})

    return both.groupby("__b").map_groups(finalize, batch_format="pandas")


def lexical_diversity(ds, group_col: str = "source",
                      text_col: str = "text"):
    """Per-group lexical-diversity statistics — the corpus-health
    readout of curation dashboards: total token count, distinct
    vocabulary size, hapax-legomena count (tokens seen exactly once
    in the group — the OOV/noise signal) and the type-token ratio in
    ppm. All int64 (ttr_ppm = n_distinct * 1e6 // n_tokens), so the
    SQL mirror is bit-exact.

    Two narrow exchanges: per-batch (group, tok, c) partials (polars
    combiner) -> one groupby sum bounded by groups x vocab, then
    per-batch scalar partials -> one O(groups) reduce. The corpus
    streams once; no token ever reaches the driver."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        gc = (t[group_col].combine_chunks()
              if isinstance(t[group_col], pa.ChunkedArray)
              else t[group_col])
        long = _token_rows(t[text_col])
        pairs = pa.table({
            "g": gc.take(pa.array(long["i"].to_numpy())),
            "tok": long["tok"].to_arrow().cast(pa.string())})
        agg = pairs.group_by(["g", "tok"]).aggregate([([], "count_all")])
        return pa.table({"g": agg["g"], "tok": agg["tok"],
                         "c": agg["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["g", "tok"]).aggregate(Sum("c", alias_name="c")))

    def scalar_partial(t: pa.Table) -> pa.Table:
        df = (pl.DataFrame({"g": t["g"].to_numpy(zero_copy_only=False),
                            "c": t["c"].to_numpy(zero_copy_only=False)})
              .group_by("g")
              .agg(pl.col("c").sum().alias("n_tokens"),
                   pl.len().alias("n_distinct"),
                   (pl.col("c") == 1).sum().alias("n_hapax")))
        return pa.table({
            group_col: pa.array(df["g"].to_list(), pa.string()),
            "n_tokens": pa.array(df["n_tokens"].to_numpy()
                                 .astype(np.int64), pa.int64()),
            "n_distinct": pa.array(df["n_distinct"].to_numpy()
                                   .astype(np.int64), pa.int64()),
            "n_hapax": pa.array(df["n_hapax"].to_numpy()
                                .astype(np.int64), pa.int64())})

    sums = (counts.map_batches(scalar_partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_distinct", alias_name="n_distinct"),
                       Sum("n_hapax", alias_name="n_hapax")))

    def finish(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = t["n_distinct"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (t.append_column("ttr_ppm", pa.array(
            (nd * 1_000_000) // np.maximum(nt, 1), pa.int64())))

    return sums.map_batches(finish, batch_format="pyarrow")


def vocab_overlap(ds, group_col: str = "source",
                  text_col: str = "text",
                  n_buckets: int | None = None):
    """Pairwise VOCABULARY Jaccard between groups — the
    corpus-overlap audit (which sources share a lexicon; contamination
    and near-mirror detection at the vocabulary level, the cheap
    precursor to document-level dedup).

    Set algebra on exact integers: distinct (group, token) pairs
    reduce in one exchange; tokens then co-group by token-hash bucket
    and each token's sorted group list explodes to its (a < b) pairs
    with the triangle grouped-arange trick (pair fan per token is
    bounded by the GROUP count — the categorical contract — never by
    corpus size), pre-combined per batch; per-group vocabulary sizes
    ride the same distinct table. Output one row per group pair
    sharing at least one token: ``(src_a, src_b, inter, uni,
    jaccard_ppm)`` — all int64, ``jaccard_ppm = inter * 1e6 // uni``.
    """
    from ray.data.aggregate import Count, Sum

    from .. import config
    from .util import coalesced

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS

    def gt_partial(t: pa.Table) -> pa.Table:
        gc = (t[group_col].combine_chunks()
              if isinstance(t[group_col], pa.ChunkedArray)
              else t[group_col])
        long = _token_rows(t[text_col])
        pairs = pa.table({
            "g": gc.take(pa.array(long["i"].to_numpy())),
            "tok": long["tok"].to_arrow().cast(pa.string())})
        return pairs.group_by(["g", "tok"]).aggregate([])

    from .joins import distinct_rows
    gt = distinct_rows(
        coalesced(ds.map_batches(gt_partial, batch_format="pyarrow")),
        ["g", "tok"], b).materialize()  # consumed twice: sizes + pairs

    sizes = {r["g"]: r["n"] for r in
             gt.groupby("g").aggregate(Count(alias_name="n"))
             .take_all()}  # bounded: one row per group

    def pair_partial(t: pa.Table) -> pa.Table:
        import polars as pl
        g = t["g"].to_numpy(zero_copy_only=False)
        tok = t["tok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((g, tok))
        g, tok = g[order], tok[order]
        first = np.ones(len(tok), bool)
        if len(tok) > 1:
            first[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(tok)))
        npairs = lens * (lens - 1) // 2
        total = int(npairs.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        seg = np.repeat(np.arange(len(lens)), npairs)
        offs = np.concatenate(([0], np.cumsum(npairs)[:-1]))
        k = np.arange(total, dtype=np.int64) - np.repeat(offs, npairs)
        L = lens[seg]
        # k-th (i < j) pair of an L-element segment, row-major: find
        # the row by vectorized walking — the iteration count is
        # bounded by the GROUP count (categorical contract), not data
        r = np.zeros(total, np.int64)
        rem = k.copy()
        width = (L - 1).copy()
        # at most max(L)-1 iterations; group count is small by contract
        while True:
            step = rem >= width
            if not step.any():
                break
            rem[step] -= width[step]
            r[step] += 1
            width[step] -= 1
        ia = starts[seg] + r
        ib = starts[seg] + r + 1 + rem
        df = (pl.DataFrame({"a": g[ia], "b": g[ib]})
              .group_by(["a", "b"]).agg(pl.len().alias("c")))
        return pa.table({"a": pa.array(df["a"].to_list(), pa.string()),
                         "b": pa.array(df["b"].to_list(), pa.string()),
                         "c": pa.array(df["c"].to_numpy()
                                       .astype(np.int64), pa.int64())})

    def add_bucket(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_hash60
        tok = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array(md5_hash60(tok) % b, pa.int64()))

    inter = (gt.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda df: pair_partial(
                 pa.Table.from_pandas(df[["g", "tok"]],
                                      preserve_index=False)),
                         batch_format="pandas")
             .groupby(["a", "b"]).aggregate(Sum("c", alias_name="inter")))

    def finish(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        bb = t["b"].to_pylist()
        it = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = np.array([sizes[x] for x in a], np.int64)
        sb = np.array([sizes[x] for x in bb], np.int64)
        uni = sa + sb - it
        return pa.table({
            "src_a": pa.array(a, pa.string()),
            "src_b": pa.array(bb, pa.string()),
            "inter": pa.array(it, pa.int64()),
            "uni": pa.array(uni, pa.int64()),
            "jaccard_ppm": pa.array((it * 1_000_000) // uni, pa.int64())})

    return inter.map_batches(finish, batch_format="pyarrow")


def json_extract_field(ds, col: str, key: str, out_col: str,
                       as_int: bool = True):
    """Semi-structured column access: extract ``$.key`` from a JSON
    string column into a typed column (int64 or string), vectorized
    via polars' JSON path kernel — one stateless map, no shuffle.
    Malformed JSON and missing keys yield typed nulls (failures stay
    data, the codec-stage contract)."""
    import polars as pl

    def extract(t: pa.Table) -> pa.Table:
        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        v = pl.from_arrow(c).str.json_path_match(f"$.{key}")
        if as_int:
            v = v.cast(pl.Int64, strict=False)
        arr = v.to_arrow()
        if as_int:
            arr = arr.cast(pa.int64())
        return t.append_column(out_col, arr)

    return ds.map_batches(extract, batch_format="pyarrow")


def _lev_pairs(sa: list, sb: list) -> np.ndarray:
    """Exact Levenshtein distance for aligned string pair lists,
    DP vectorized ACROSS pairs (the per-cell loop is over string
    positions — bounded by max length — never over pairs)."""
    n = len(sa)
    if n == 0:
        return np.empty(0, np.int64)
    la = np.fromiter((len(s) for s in sa), np.int64, n)
    lb = np.fromiter((len(s) for s in sb), np.int64, n)
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(La, 1)), np.int32)
    B = np.zeros((n, max(Lb, 1)), np.int32)
    for i, s in enumerate(sa):
        A[i, :len(s)] = np.fromiter(map(ord, s), np.int32, len(s))
    for i, s in enumerate(sb):
        B[i, :len(s)] = np.fromiter(map(ord, s), np.int32, len(s))
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, La + 1):
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        cost = (ai != B).astype(np.int32)           # (n, Lb)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1])
        keep = (i <= la)[:, None]
        prev = np.where(keep, cur, prev)
    return prev[np.arange(n), lb].astype(np.int64)


def edit_distance_pairs(ds, col: str, k: int = 2,
                        n_buckets_hint: int | None = None):
    """Similarity self-join on a string column: all DISTINCT value
    pairs (a < b) within Levenshtein distance ``k`` — the record-
    linkage / entity-resolution primitive.

    Blocking is LOSSLESS: ed(a, b) >= |len(a) - len(b)|, so values are
    binned by len // (k+1) and each value is replicated to bins
    {b-1, b}; any qualifying pair shares a bin, and the pair is
    evaluated exactly once in bin min(home_a, home_b) (the owner-bin
    rule used by the interval join). Within a bin, candidate pairs are
    pruned by the length filter, then scored by a pair-vectorized DP
    (the position loop is O(maxlen^2); the pair dimension is numpy).

    Length-only blocking is deliberately conservative — it misses
    nothing but prunes little; production-scale corpora would add
    PassJoin-style segment blocks INSIDE each length bin (still
    lossless) to cut the candidate count. Bin population is the skew
    knob: a bin with B values yields O(B^2) candidates.

    Output: (name_a: string, name_b: string, dist: int64).
    """
    from .joins import distinct_rows
    from .util import coalesced

    width = k + 1
    schema = pa.schema([("name_a", pa.string()), ("name_b", pa.string()),
                        ("dist", pa.int64())])

    def replicate(t: pa.Table) -> pa.Table:
        s = _series(t[col])
        home = (s.str.len_chars().cast(pl.Int64) // width).to_numpy()
        vals = t[col].combine_chunks() \
            if isinstance(t[col], pa.ChunkedArray) else t[col]
        idx = np.concatenate([np.arange(len(t)), np.arange(len(t))])
        bins = np.concatenate([home, home - 1])
        homes = np.concatenate([home, home])
        return pa.table({"bin": pa.array(bins, pa.int64()),
                         "home": pa.array(homes, pa.int64()),
                         "name": vals.take(pa.array(idx))})

    def pair_kernel(t: pa.Table) -> pa.Table:
        g = int(t["bin"][0].as_py())
        names = t["name"].to_pylist()
        homes = t["home"].to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(s) for s in names), np.int64, len(names))
        order = np.argsort(np.array(names, dtype=object), kind="stable")
        ia, ib = np.triu_indices(len(names), 1)
        ia, ib = order[ia], order[ib]   # name_a < name_b by sort order
        own = np.minimum(homes[ia], homes[ib]) == g
        close = np.abs(lens[ia] - lens[ib]) <= k
        keep = own & close & (lens[ia] + lens[ib] > 0)
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return schema.empty_table()
        sa = [names[i] for i in ia]
        sb = [names[i] for i in ib]
        dist = _lev_pairs(sa, sb)
        m = dist <= k
        return pa.table({"name_a": pa.array([s for s, f in zip(sa, m) if f],
                                            pa.string()),
                         "name_b": pa.array([s for s, f in zip(sb, m) if f],
                                            pa.string()),
                         "dist": pa.array(dist[m], pa.int64())})

    uniq = distinct_rows(ds.map_batches(lambda t: t.select([col]),
                                        batch_format="pyarrow"), [col])
    return (coalesced(uniq.map_batches(replicate, batch_format="pyarrow"))
            .groupby("bin")
            .map_groups(pair_kernel, batch_format="pyarrow"))


def kl_drift(ds, group_col: str = "source", text_col: str = "text",
             scale: int = 1_000_000):
    """Per-group corpus drift: KL divergence of each group's unigram
    token distribution from the GLOBAL corpus distribution — the
    domain-mixing monitor of training-data curation (a source whose
    language shifts shows a rising KL against the pooled corpus).

    Quantization contract (the lm_score pattern): each token
    contributes ``floor(scale * (c/n) * ln((c/n) / (cg/nn)))`` —
    c = the (group, token) count, n = the group's token total,
    cg/nn = the global analogs — and the per-group score is the INT64
    SUM of those terms, order-independent and bit-exact against the
    SQL mirror (identical expression shape, IEEE doubles both sides).

    Exchanges: one (group, tok) count reduce (per-batch polars
    combiner first), one tok-level global-count reduce, one hash_join
    to attach global counts, one final per-group sum. Group totals
    (one row per group) are the only driver-side state — bounded by
    the number of sources, not the corpus.

    Output: (group_col, n: int64, kl_q: int64).
    """
    from ray.data.aggregate import Sum

    from .joins import hash_join
    from .util import coalesced

    def partial(t: pa.Table) -> pa.Table:
        grp = t[group_col].combine_chunks() \
            if isinstance(t[group_col], pa.ChunkedArray) else t[group_col]
        long = _token_rows(t[text_col])
        frame = pl.DataFrame({
            group_col: pl.from_arrow(grp.take(pa.array(long["i"].to_numpy()))),
            "tok": long["tok"]})
        cnt = frame.group_by([group_col, "tok"]).len()
        return pa.table({
            group_col: cnt[group_col].to_arrow().cast(pa.string()),
            "tok": cnt["tok"].to_arrow().cast(pa.string()),
            "c": pa.array(cnt["len"].to_numpy().astype(np.int64),
                          pa.int64())})

    counts = (coalesced(ds.map_batches(partial, batch_format="pyarrow"))
              .groupby([group_col, "tok"])
              .aggregate(Sum("c", alias_name="c"))
              .materialize())  # consumed three times below
    grp_rows = (counts.groupby(group_col)
                .aggregate(Sum("c", alias_name="n")).take_all())
    n_by = {r[group_col]: int(r["n"]) for r in grp_rows}
    nn = float(sum(n_by.values()))
    glob = counts.groupby("tok").aggregate(Sum("c", alias_name="cg"))
    joined = hash_join(counts, glob, on="tok")

    def term(t: pa.Table) -> pa.Table:
        import pandas as pd
        g = t[group_col].to_pandas()
        n = g.map(n_by).to_numpy(dtype=np.float64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cg = t["cg"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = c / n
        q = cg / nn
        tq = np.floor(scale * (p * np.log(p / q))).astype(np.int64)
        return pa.table({group_col: t[group_col],
                         "term_q": pa.array(tq, pa.int64())})

    out = (joined.map_batches(term, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("term_q", alias_name="kl_q"))
           .to_pandas())
    out["n"] = out[group_col].map(n_by).astype("int64")
    return out[[group_col, "n", "kl_q"]]


def dup_ngram_stats(ds, n: int = 3, text_col: str = "text",
                    id_col: str = "doc_id", n_buckets: int = 32):
    """Per-document duplicated-shingle coverage — the corpus-level
    repeated-substring signal behind exact substring dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better"):
    for every document, how many of its distinct word ``n``-grams
    appear in at least one OTHER document, and what fraction of the
    document that covers.

    Plan shape (3 exchanges): one streaming pass emits distinct
    (doc, gram-hash) rows (documents never span batches, so
    within-doc dedup is local); a groupby on the 60-bit gram hash
    counts carrier docs; ONE bucketed ``hash_join`` carries the
    carrier count back onto every gram row (no text ever shuffles —
    only int64 hash rows); a single per-doc aggregate then produces
    both the total and the duplicated-gram count, so no per-doc join
    or null-fill is needed. The coverage percentage is integer-exact:
    ``dup_pct_q = (10000 * n_dup) // n_grams``.
    """
    from ray.data.aggregate import Count, Sum

    import pyarrow.compute as pc

    from .joins import hash_join
    from .util import coalesced

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ridx, gh = _ngram_hash_frame(t[text_col], n)
        df = pl.DataFrame({id_col: ids[ridx], "gh": gh}).unique()
        return df.to_arrow().select([id_col, "gh"])

    grams = coalesced(ds.map_batches(gram_rows, batch_format="pyarrow")) \
        .materialize()  # consumed twice: carrier counts + join-back
    carriers = grams.groupby("gh").aggregate(Count(alias_name="n_docs"))
    joined = hash_join(grams, carriers, on="gh", n_buckets=n_buckets)

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.if_else(pc.greater_equal(t["n_docs"].cast(pa.int64()),
                                          pa.scalar(2, pa.int64())),
                         pa.scalar(1, pa.int64()),
                         pa.scalar(0, pa.int64()))
        return pa.table({id_col: t[id_col], "dup": dup})

    out = (joined.map_batches(flag, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(Count(alias_name="n_grams"),
                      Sum("dup", alias_name="n_dup")))

    def finish(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].cast(pa.int64())
        nd = t["n_dup"].cast(pa.int64())
        pct = pc.divide(pc.multiply(nd, pa.scalar(10000, pa.int64())), ng)
        return pa.table({id_col: t[id_col], "n_grams": ng, "n_dup": nd,
                         "dup_pct_q": pct})

    return out.map_batches(finish, batch_format="pyarrow")


def chunk_dedup_stats(ds, width: int = 8, text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 32):
    """Sub-document exact dedup with first-wins reassembly counts —
    the chunk-granular variant of corpus dedup (Lee et al.): each
    document splits into consecutive non-overlapping ``width``-word
    chunks; for every distinct chunk the GLOBAL winner is the
    lexicographically smallest (doc, chunk-position) occurrence; the
    result reports, per document, how many of its chunks survive.

    Plan shape: one streaming pass emits (doc, chunk-pos, 60-bit
    chunk hash) rows; the winner election is a single Min aggregate
    over the packed (doc << 20 | pos) key grouped by hash (no text
    shuffles); per-doc totals and kept counts meet in a bucketed left
    join. The packed key bounds chunk positions at 2^20 — documents
    are pre-chunked upstream at any realistic corpus, and the bound
    is asserted, never silently wrapped.
    """
    from ray.data.aggregate import Count, Min

    import pyarrow.compute as pc

    from ..functions.hashing import md5_hash60
    from .joins import hash_join
    from .util import coalesced

    POS_BITS = 20

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = _token_lists(t[text_col])
        long = (pl.DataFrame({"i": pl.Series(np.arange(len(toks),
                                                       dtype=np.int64)),
                              "tok": toks})
                .explode("tok").drop_nulls("tok"))
        if long.height == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cidx": pa.array([], pa.int64()),
                             "gh": pa.array([], pa.int64())})
        long = long.with_columns(
            ((pl.col("tok").cum_count().over("i") - 1) // width)
            .alias("cidx"))
        ch = (long.group_by(["i", "cidx"], maintain_order=True)
              .agg(pl.col("tok").str.join(" ").alias("chunk")))
        cidx = ch["cidx"].to_numpy()
        if cidx.size and int(cidx.max()) >= (1 << POS_BITS):
            raise ValueError("chunk position exceeds the packed-key "
                             "bound; pre-chunk oversized documents")
        return pa.table({
            id_col: pa.array(ids[ch["i"].to_numpy()], pa.int64()),
            "cidx": pa.array(cidx, pa.int64()),
            "gh": pa.array(md5_hash60(ch["chunk"].to_numpy()), pa.int64())})

    chunks = coalesced(ds.map_batches(chunk_rows, batch_format="pyarrow"))

    def pack(t: pa.Table) -> pa.Table:
        pk = pc.add(pc.multiply(t[id_col],
                                pa.scalar(1 << POS_BITS, pa.int64())),
                    t["cidx"])
        return pa.table({"gh": t["gh"], "pk": pk, id_col: t[id_col]})

    packed = chunks.map_batches(pack, batch_format="pyarrow") \
        .materialize()  # consumed twice: totals + winner election
    totals = packed.groupby(id_col).aggregate(Count(alias_name="n_chunks"))
    winners = (packed.groupby("gh").aggregate(Min("pk", alias_name="pk"))
               .map_batches(lambda t: pa.table({
                   id_col: pc.divide(t["pk"],
                                     pa.scalar(1 << POS_BITS, pa.int64()))}),
                   batch_format="pyarrow"))
    kept = winners.groupby(id_col).aggregate(Count(alias_name="n_kept"))
    out = hash_join(totals, kept, on=id_col, how="left",
                    n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_chunks": t["n_chunks"].cast(pa.int64()),
            "n_kept": pc.fill_null(t["n_kept"].cast(pa.int64()),
                                   pa.scalar(0, pa.int64()))})

    return out.map_batches(finish, batch_format="pyarrow")


def chunk_passages(ds, width: int, stride: int,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Overlapping sliding-window passage extraction — the RAG/
    retrieval chunking primitive (unlike chunk_dedup_stats'
    NON-overlapping windows): passage i of a document covers analysis
    tokens [i*stride, i*stride + width); the last window always
    reaches the final token. n_passages = 1 + ceil((n - width) /
    stride) for n > width else 1; empty documents yield none.

    Entirely batch-local (each document is one row): a single
    streaming map emits (doc, passage idx, token count, 60-bit
    passage hash) with NO exchange at any corpus size — downstream
    dedup/embedding stages decide what to shuffle. Tokenisation and
    the md5-derived passage hash are reproducible in SQL
    (functions/hashing.md5_hash60), so the full passage table sits
    under the DuckDB hash gate.
    """
    if stride <= 0 or width <= 0 or stride > width:
        raise ValueError("require 0 < stride <= width")

    from ..functions.hashing import md5_hash60

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("chunk_idx", pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("passage_h", pa.int64())])

    def passages(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        toks = _token_lists(t[text_col])
        df = (pl.DataFrame({"i": pl.Series(np.arange(len(toks),
                                                     dtype=np.int64)),
                            "toks": toks})
              .with_columns(n=pl.col("toks").list.len().cast(pl.Int64))
              .filter(pl.col("n") > 0)
              .with_columns(
                  nch=pl.when(pl.col("n") > width)
                  .then((pl.col("n") - width + (stride - 1)) // stride)
                  .otherwise(0) + 1)
              .with_columns(cidx=pl.int_ranges(0, pl.col("nch")))
              .explode("cidx")
              .with_columns(
                  passage=pl.col("toks").list.slice(
                      pl.col("cidx") * stride, width))
              .with_columns(
                  n_tokens=pl.col("passage").list.len().cast(pl.Int64),
                  ptext=pl.col("passage").list.join(" ")))
        if df.height == 0:
            return out_schema.empty_table()
        return pa.table({
            id_col: pa.array(ids[df["i"].to_numpy()], pa.int64()),
            "chunk_idx": df["cidx"].cast(pl.Int64).to_arrow(),
            "n_tokens": df["n_tokens"].to_arrow(),
            "passage_h": pa.array(md5_hash60(df["ptext"].to_numpy()),
                                  pa.int64())}).cast(out_schema)

    return ds.map_batches(passages, batch_format="pyarrow")


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, scale: int = 1_000_000,
                    n_buckets: int | None = None):
    """Per-document TF-IDF keyword extraction: the top-``k`` tokens of
    each document by ``floor(scale * c * ln(N / df))`` — c = the
    (doc, token) count, N = the corpus document count, df = the
    token's document frequency. The keyword/tagging dual of bm25_topk
    (which ranks DOCS for a query; this ranks TERMS for a doc).

    Quantization contract (the kl_drift pattern): the score is one
    int64 per (doc, token), computed as ``(scale * c) * ln(N / df)``
    in IEEE doubles with exactly that association, so the SQL mirror
    reproduces it bit-for-bit. Ties break (score desc, token asc).

    Exchanges: one (tok, df) reduce over per-batch (doc, tok) pairs
    (docs never split across batches — one text per row — so
    per-batch doc counts sum exactly), a size-adaptive dim_join to
    attach df (vocab is dictionary-scale: broadcast under the cap),
    and one doc-bucketed top-k groupby. Payload text never crosses an
    exchange; only (doc, tok, c) triples do.

    Output: (id_col, tok: string, score_q: int64), <= k rows per doc.
    """
    from ray.data.aggregate import Sum

    from .. import config
    from ..functions.hashing import bucket_of
    from .joins import dim_join
    from .util import arrow_table, coalesced

    b = n_buckets or config.DEFAULT_JOIN_BUCKETS
    n_docs = float(ds.count())

    def pairs(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks() \
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        long = _token_rows(t[text_col])
        frame = pl.DataFrame({
            "id": pl.from_arrow(ids.take(pa.array(long["i"].to_numpy()))),
            "tok": long["tok"]})
        cnt = frame.group_by(["id", "tok"]).len()
        return pa.table({
            id_col: cnt["id"].to_arrow(),
            "tok": cnt["tok"].to_arrow().cast(pa.string()),
            "c": pa.array(cnt["len"].to_numpy().astype(np.int64),
                          pa.int64())})

    pair_ds = coalesced(ds.map_batches(pairs,
                                       batch_format="pyarrow")).materialize()
    # one (doc, tok) row per doc per token -> per-tok row count IS df
    df_ds = (pair_ds.map_batches(lambda t: pa.table({
                 "tok": t["tok"],
                 "df": pa.array(np.ones(t.num_rows, np.int64))}),
                 batch_format="pyarrow")
             .groupby("tok").aggregate(Sum("df", alias_name="df")))

    def score(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = np.floor((scale * c) * np.log(n_docs / dfv)).astype(np.int64)
        out = pa.table({id_col: t[id_col], "tok": t["tok"],
                        "score_q": pa.array(sq, pa.int64())})
        keys = t[id_col].to_numpy(zero_copy_only=False)
        return out.append_column("__b", pa.array(bucket_of(keys, b),
                                                 pa.int64()))

    scored = dim_join(pair_ds, df_ds, on="tok").map_batches(
        score, batch_format="pyarrow")

    def head_k(df: pd.DataFrame) -> pa.Table:
        out = (df.sort_values([id_col, "score_q", "tok"],
                              ascending=[True, False, True],
                              kind="mergesort")
               .groupby(id_col, sort=False).head(k))
        return arrow_table(out[[id_col, "tok", "score_q"]])

    return (scored.groupby("__b").map_groups(head_k,
                                             batch_format="pandas"))


def bpe_pair_counts(ds, text_col: str = "text"):
    """Corpus-wide adjacent-character-pair frequencies within
    [a-z0-9_]+ tokens — the statistic the first BPE tokenizer merge
    maximizes (Sennrich et al. 2016's public algorithm, step 1).

    Per-batch combiner: every token in the batch is joined into ONE
    separator-delimited buffer, viewed as uint8, and the pair codes
    ``a[:-1]*256 + a[1:]`` are bincounted in a single numpy pass —
    no per-token or per-doc Python loop. The exchange then carries one
    (pair, c) row per DISTINCT pair per batch, which is
    alphabet-bounded (<= 37*37 rows for [a-z0-9_]) regardless of
    corpus size, so the global groupby sum is O(alphabet²) — the same
    bounded-partial shape as unigram_counts but with a hard cap.

    Output: (pair: string(2), c: int64), one row per observed pair.
    """
    from ray.data.aggregate import Sum

    SEP = 0x0A  # '\n' — never inside a [a-z0-9_]+ token

    def partial(t: pa.Table) -> pa.Table:
        toks = _token_lists(t[text_col])
        joined = "\n".join(toks.list.join("\n").fill_null("").to_list())
        buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
        if buf.size < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        lo, hi = buf[1:], buf[:-1]
        valid = (lo != SEP) & (hi != SEP)
        codes = hi[valid].astype(np.int32) * 256 + lo[valid]
        counts = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(counts)
        pairs = np.stack([(nz // 256).astype(np.uint8),
                          (nz % 256).astype(np.uint8)], axis=1)
        return pa.table({
            "pair": pa.array([bytes(p).decode("ascii") for p in pairs],
                             pa.string()),
            "c": pa.array(counts[nz].astype(np.int64), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("pair").aggregate(Sum("c", alias_name="c")))


def vocab_coverage(ds_vocab, ds_stats, vocab_size: int = 50,
                   text_col: str = "text", group_col: str = "source"):
    """Out-of-vocabulary rate per group against the corpus top-V
    vocabulary — the tokenizer-coverage curation metric (what fraction
    of token occurrences a V-entry vocab would leave unmerged).

    Pass 1 (``ds_vocab``): unigram_counts -> top-V by the
    deterministic (c desc, tok asc) order — V rows by construction,
    the only driver materialization, broadcast once via ray.put.
    Pass 2 (``ds_stats``): per-batch polars explode + is_in(vocab) ->
    per-group integer partials (n_tok, n_oov) -> one narrow groupby
    sum over |groups| rows. ``oov_ppm = (1_000_000 * n_oov) // n_tok``
    uses integer division so the SQL mirror is bit-exact.

    Two dataset handles because the corpus is scanned twice (vocab
    build, then coverage) — pass the same _read() twice; each pass
    streams independently. Output: (group_col, n_tok: int64,
    n_oov: int64, oov_ppm: int64).
    """
    import ray
    from ray.data.aggregate import Sum

    from .util import topk as ds_topk
    top = ds_topk(unigram_counts(ds_vocab, text_col),
                  ["c", "tok"], [True, False],
                  vocab_size).take_all()           # V rows, bounded
    vocab_ref = ray.put(pl.Series("v", [r["tok"] for r in top]))

    def partial(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        groups = t[group_col].combine_chunks() \
            if isinstance(t[group_col], pa.ChunkedArray) else t[group_col]
        long = _token_rows(t[text_col])
        frame = pl.DataFrame({
            "g": pl.from_arrow(groups.take(pa.array(long["i"].to_numpy()))),
            "oov": (~long["tok"].is_in(vocab)).cast(pl.Int64)})
        agg = frame.group_by("g").agg(
            n_tok=pl.len().cast(pl.Int64), n_oov=pl.col("oov").sum())
        return pa.table({group_col: agg["g"].to_arrow().cast(pa.string()),
                         "n_tok": agg["n_tok"].to_arrow(),
                         "n_oov": agg["n_oov"].to_arrow()})

    stats = (ds_stats.map_batches(partial, batch_format="pyarrow")
             .groupby(group_col)
             .aggregate(Sum("n_tok", alias_name="n_tok"),
                        Sum("n_oov", alias_name="n_oov")))

    def finish(t: pa.Table) -> pa.Table:
        n_tok = t["n_tok"].to_numpy(zero_copy_only=False)
        n_oov = t["n_oov"].to_numpy(zero_copy_only=False)
        ppm = np.where(n_tok > 0, (1_000_000 * n_oov) // np.maximum(n_tok, 1),
                       np.int64(0))
        return pa.table({group_col: t[group_col], "n_tok": t["n_tok"],
                         "n_oov": t["n_oov"],
                         "oov_ppm": pa.array(ppm.astype(np.int64), pa.int64())})

    return stats.map_batches(finish, batch_format="pyarrow")


def redact_batch(batch: pa.Table, patterns, text_col: str = "text",
                 hash_mod: int = 1_000_000_000) -> pa.Table:
    """Vectorized multi-pattern PII-style redaction — the scrub stage
    every curation pipeline runs before training (emails, phone
    numbers, ids). ``patterns`` is an ordered list of ``(name, regex,
    replacement)``; each pattern is counted (non-overlapping matches)
    and replaced IN ORDER, so later patterns see earlier redactions —
    the SQL mirror nests ``regexp_replace`` in the same order.

    Stateless per-batch kernel (polars' compiled-regex engine;
    compilation is cached per process by polars itself), so the stage
    is an elastic map_batches — no shuffle, no state, safe at any
    scale. Output: the input minus ``text_col`` plus one
    ``n_<name>: int64`` hit count per pattern and ``red_h: int64`` =
    h60(redacted_text) % hash_mod (mod keeps downstream SUMs inside
    int64 for order-independent whole-text equality checks).
    """
    from ..functions.hashing import md5_hash60

    s = _series(batch[text_col])
    cols = {c: batch[c] for c in batch.column_names if c != text_col}
    for name, rx, repl in patterns:
        cols[f"n_{name}"] = pa.array(
            s.str.count_matches(rx).cast(pl.Int64).to_numpy(),
            pa.int64())
        s = s.str.replace_all(rx, repl)
    red = md5_hash60(s.to_numpy().astype(object)) % hash_mod
    cols["red_h"] = pa.array(red, pa.int64())
    return pa.table(cols)


def bpe_train(ds, n_merges: int, text_col: str = "text"):
    """BPE tokenizer TRAINING (Sennrich et al. 2016, the public
    algorithm): learn ``n_merges`` merges over the corpus, returning
    the merge table — the artifact a tokenizer ships.

    Scale shape: ONE corpus pass builds the distinct-word count table
    (``unigram_counts`` — the exchange is vocabulary-sized, never
    corpus-sized); every merge iteration then runs on that word table
    only, exactly like the reference algorithm's word-frequency dict.
    Per iteration: (a) adjacent-symbol-pair counts weighted by word
    count — a polars slice/explode kernel per batch, then a narrow
    (pair, c) groupby whose size is bounded by the total symbol count
    of the DISTINCT-word table; (b) the argmax pair (c desc, pair asc
    — deterministic tie break) is taken on that bounded table; (c) the
    merge is broadcast and applied vectorized with a word-boundary
    regex (``\\b<l> <r>\\b`` — leftmost non-overlapping replacement is
    exactly BPE's left-to-right scan; rust-regex and RE2 agree). The
    word table is re-materialized each iteration (vocab-sized, cheap);
    the corpus is never touched again.

    Output: (step: int64, pair: string "l r", merged: string, c:
    int64) — one row per learned merge, in order.
    """
    import re

    from ray.data.aggregate import Sum

    def space_out(t: pa.Table) -> pa.Table:
        s = _series(t["tok"]).str.extract_all(".").list.join(" ")
        return pa.table({"w": pa.array(s.to_numpy().astype(object),
                                       pa.string()),
                         "c": t["c"]})

    wc = (unigram_counts(ds, text_col)
          .map_batches(space_out, batch_format="pyarrow")
          .materialize())

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame({"s": _series(t["w"]).str.split(" "),
                           "c": _series(t["c"])})
        df = df.with_columns(n=pl.col("s").list.len()).filter(
            pl.col("n") >= 2)
        if not len(df):
            return pa.table({"pair": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        ex = (df.select(
                  l=pl.col("s").list.slice(0, pl.col("n") - 1),
                  r=pl.col("s").list.slice(1), c=pl.col("c"))
              .explode(["l", "r"]))
        g = (ex.with_columns(
                 pair=pl.concat_str([pl.col("l"), pl.col("r")],
                                    separator=" "))
             .group_by("pair").agg(pl.col("c").sum()))
        return pa.table({"pair": g["pair"].to_arrow().cast(pa.string()),
                         "c": pa.array(g["c"].to_numpy().astype(np.int64),
                                       pa.int64())})

    merges = []
    for step in range(1, n_merges + 1):
        counts = (wc.map_batches(pair_partial, batch_format="pyarrow")
                  .groupby("pair").aggregate(Sum("c", alias_name="c"))
                  .take_all())  # bounded: pairs over DISTINCT words
        if not counts:
            break
        best = min(counts, key=lambda r: (-r["c"], r["pair"]))
        pair, cnt = best["pair"], int(best["c"])
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, cnt))
        pat = rf"\b{re.escape(pair)}\b"

        def apply_merge(t: pa.Table, pat=pat, merged=merged) -> pa.Table:
            s = _series(t["w"]).str.replace_all(pat, merged)
            return pa.table({"w": pa.array(s.to_numpy().astype(object),
                                           pa.string()),
                             "c": t["c"]})

        wc = wc.map_batches(apply_merge,
                            batch_format="pyarrow").materialize()

    return pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "pair": pa.array([m[1] for m in merges], pa.string()),
        "merged": pa.array([m[2] for m in merges], pa.string()),
        "c": pa.array([m[3] for m in merges], pa.int64())})


def bpe_encode_counts(ds, merges: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id"):
    """BPE tokenizer APPLICATION — the serving half of ``bpe_train``:
    encode every document with a trained merge table and return its
    BPE token count (the sequence-length signal packing and budget
    planning need).

    The merge chain applies to the DISTINCT-word vocabulary only
    (bounded by contract, the ``lm_score`` collect precedent): each
    ordered merge is the same word-boundary leftmost regex rewrite as
    training, run locally over the collected vocab; per-word symbol
    counts then broadcast once and the corpus streams through the
    ``_token_value_scan`` probe — ONE corpus pass total, no
    per-document merge work anywhere.

    Output: (id_col, n_tok: int64, bpe_tokens: int64) for docs with
    >= 1 token.
    """
    import re

    vocab = unigram_counts(ds, text_col).take_all()  # bounded vocab
    toks = np.array([r["tok"] for r in vocab], dtype=object)
    if len(toks):
        w = (pl.Series(toks.astype(str)).str.extract_all(".")
             .list.join(" "))
        for i in range(merges.num_rows):
            pair = merges["pair"][i].as_py()
            merged = merges["merged"][i].as_py()
            w = w.str.replace_all(rf"\b{re.escape(pair)}\b", merged)
        n_sym = w.str.split(" ").list.len().to_numpy().astype(np.int64)
    else:
        n_sym = np.empty(0, np.int64)
    order = np.argsort(toks)
    return _token_value_scan(ds, text_col, id_col, toks[order],
                             n_sym[order], "bpe_tokens")
