"""Vectorized tag access.

The reference reads OSM tags through two predicates — key presence and
key==value equality (/root/reference/osm/handler.cc:14-24) — plus one
value fetch (``name``, handler.cc:92). Our canonical on-wire tag
representation is a single space-separated ``"k=v k2=v2"`` string
column (the entity adapter parses captions into it, SURVEY.md §7.2);
Arrow ``map<string,string>`` columns are normalized to it once at
ingest. Extraction is vectorized via polars' regex engine — no Python
row loop.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def tags_from_map(col: pa.Array) -> pa.Array:
    """map<string,string> -> canonical "k=v k2=v2" string column.
    Vectorized: one element-wise "k=v" join over the flattened entries,
    then a per-row list join — both pyarrow C++ kernels."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    kv = pc.binary_join_element_wise(col.keys, col.items.cast(pa.string()), "=")
    offs = col.offsets
    if offs[0].as_py() != 0:  # sliced map arrays carry a nonzero base
        base = offs[0].as_py()
        offs = pc.subtract(offs, base).cast(pa.int32())
        kv = kv.slice(base)
    rows = pa.ListArray.from_arrays(offs, kv)
    return pc.binary_join(rows, " ")


def tag_value(tags: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Extract the value of ``key`` from a canonical tags string column.

    Returns a string array with nulls where the key is absent —
    ``has_key`` is ``is_valid`` on the result, ``has_key_value`` is
    equality (mirrors handler.cc:14-24).
    """
    s = pl.from_arrow(tags if isinstance(tags, (pa.Array, pa.ChunkedArray)) else pa.array(tags))
    if isinstance(s, pl.DataFrame):  # from_arrow on chunked gives Series already; guard
        s = s.to_series()
    # (\S*) not (\S+): an empty value ("landuse=") is still key-PRESENT
    # (the reference's get_value_by_key returns "" with is_valid true)
    ext = s.str.extract(rf"(?:^|\s){_re_escape(key)}=(\S*)", 1)
    arr = ext.to_arrow()
    return arr if isinstance(arr, pa.Array) else arr.combine_chunks()


def _re_escape(key: str) -> str:
    import re
    return re.escape(key)


def tag_values_np(tags, key: str) -> np.ndarray:
    """Same as tag_value but as a numpy object array (None for absent)."""
    return np.asarray(tag_value(tags, key).to_pylist(), dtype=object)


def parse_caption_tags(captions: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Caption -> canonical tags string. Fixture captions already *are*
    space-separated ``k=v`` token streams mixed with free text; we keep
    only tokens containing '='. Vectorized: split + filter in polars."""
    s = pl.from_arrow(captions)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    out = (
        s.str.split(" ")
        .list.eval(pl.element().filter(pl.element().str.contains("=")))
        .list.join(" ")
    )
    arr = out.to_arrow()
    arr = arr if isinstance(arr, pa.Array) else arr.combine_chunks()
    return arr.cast(pa.string())
