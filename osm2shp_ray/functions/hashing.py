"""Deterministic vectorized hashing.

Used for: stable entity ids from string keys (entity adapter, SURVEY.md
§7.2), content hashes for exact dedup, bucket assignment for the
distributed join (the role the sqlite PRIMARY KEY index plays in the
reference, /root/reference/osm/point_database.cc:16-17), and salting of
hot keys. All functions are pure numpy / FNV-1a — no Python-loop hot
paths and no dependence on process-seeded hash().
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def fnv1a_bytes(data: bytes) -> int:
    """Scalar FNV-1a 64 over raw bytes."""
    h = int(_FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a-64 over an array/sequence of strings.

    Implementation: concatenate all UTF-8 bytes once, then run the FNV
    loop position-by-position only over the ragged tail (amortized: the
    loop is over max_len, vectorized across rows). Deterministic across
    processes and platforms.
    """
    enc = [str(v).encode("utf-8") if v is not None else b"" for v in values]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    # (n, max_len) byte matrix, zero padded
    mat = np.zeros((n, max_len), dtype=np.uint64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    if flat.size:
        row = np.repeat(np.arange(n), lens)
        col = np.arange(flat.size) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[row, col] = flat
    h = np.full(n, _FNV_OFFSET ^ np.uint64(seed * 0x9E3779B9 + seed), dtype=np.uint64)
    active_len = lens.copy()
    with np.errstate(over="ignore"):
        for i in range(max_len):
            mask = active_len > i
            h[mask] = (h[mask] ^ mat[mask, i]) * _FNV_PRIME
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — integer avalanche for bucket /
    salt assignment from integer keys."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + _MIX)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def stable_id64(values) -> np.ndarray:
    """Positive int64 entity id from string keys (entity adapter:
    ``id = stable_hash64(image_id)`` kept > 0 so the reference's id<=0
    filter, /root/reference/osm/handler.cc:87-88, stays meaningful)."""
    h = hash_strings(values)
    pos = (h >> np.uint64(1)).astype(np.int64)  # clear sign bit
    pos[pos == 0] = 1
    return pos


def md5_hash60(values) -> np.ndarray:
    """60-bit hash of strings with EXACT SQL parity: equals DuckDB's
    ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — the first 15 hex chars
    of the md5 digest. Used wherever a hash VALUE is part of an
    oracle-checked query output (SimHash bit votes, fingerprints).

    Vectorization note: md5 itself is per-string C code (hashlib); we
    dictionary-encode first so repeated tokens (the common case for
    word streams) hash once. Returns int64 (values < 2^60, so always
    positive)."""
    import hashlib
    arr = values if isinstance(values, np.ndarray) else np.asarray(values, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    out = np.empty(len(uniq), dtype=np.int64)
    for i, s in enumerate(uniq):
        out[i] = int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:15], 16)
    return out[inv]


def bucket_of(keys: np.ndarray, n_buckets: int, seed: int = 0) -> np.ndarray:
    """Shuffle bucket for integer keys — avalanched so sequential ids
    spread evenly (plain ``id % B`` would correlate with generation
    order and skew the shuffle)."""
    z = splitmix64(keys.astype(np.uint64) ^ np.uint64(seed))
    return (z % np.uint64(n_buckets)).astype(np.int64)


def bucket_any(keys: np.ndarray, n_buckets: int, seed: int = 0) -> np.ndarray:
    """``bucket_of`` for keys of ANY dtype: integer arrays take the
    avalanche path; string/object arrays hash via FNV-1a first."""
    if keys.dtype.kind in ("i", "u"):
        return bucket_of(keys, n_buckets, seed)
    h = hash_strings(keys, seed)
    return (h % np.uint64(n_buckets)).astype(np.int64)
