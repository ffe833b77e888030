"""Avro Object Container File writer/reader — vendored from the
public Apache Avro 1.11 specification (container format: magic
``Obj\\x01``, file-metadata map, 16-byte sync marker, blocks of
``count, byte-length, data, sync``; binary encoding: zigzag-varint
longs, little-endian 8-byte doubles, length-prefixed strings/bytes,
1-byte booleans). Seventh interchange format next to parquet / Lance /
ORC / CSV / JSONL / GeoJSONL — the row-oriented log-shipping format of
ingestion pipelines.

Supported schema subset: flat records of ``long`` (int64), ``double``
(float64), ``string``, ``bytes``, ``boolean`` — the engine's scalar
column types. Files are fully spec-compliant and readable by any Avro
implementation.

Vectorization: Avro is row-major, so a naive reader walks a
byte-by-byte chain (each string length gates every later offset). The
writer therefore records each block's ROW-START offsets under the
spec-sanctioned custom metadata key ``x.osm2shp.rowindex`` (foreign
readers ignore unknown keys; ~1 byte/row). With row starts known, the
reader decodes each field as ONE lockstep numpy pass across all rows
(the restart-segment trick of functions/jpeg.py): masked varint
accumulation for longs, fancy-index gathers for fixed-width and
string payloads — no Python row loop. Files without the index (from
other writers) fall back to a sequential per-row parse (correct,
slow; documented).

Reference analog: none (the reference links osmium/libshp instead of
shipping codecs; format plurality extends SURVEY.md §2.1's S-family).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"Obj\x01"
ROWINDEX_KEY = "x.osm2shp.rowindex"

_AVRO_OF_ARROW = {
    pa.int64(): "long",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "bytes",
    pa.bool_(): "boolean",
}


# ----------------------------------------------------------- helpers

def _zigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64)
    return ((v >> np.uint64(1))
            ^ (np.uint64(0) - (v & np.uint64(1)))).astype(np.int64)


def _varint_bytes(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 -> (flat varint bytes, per-value byte lengths), fully
    vectorized: a (n, 10) byte matrix masked by each value's length."""
    v = np.asarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    mat = np.empty((n, 10), np.uint8)
    more = np.empty((n, 10), bool)
    x = v.copy()
    for i in range(10):
        mat[:, i] = (x & np.uint64(0x7F)).astype(np.uint8)
        x = x >> np.uint64(7)
        more[:, i] = x != 0
    lens = more.sum(axis=1).astype(np.int64) + 1
    mat[more] |= 0x80
    keep = np.arange(10)[None, :] < lens[:, None]
    return mat[keep], lens


def _varints_at(b: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray,
                                                         np.ndarray]:
    """Decode one varint starting at every position in ``pos`` —
    lockstep across rows: <= 10 masked passes, no per-row loop.
    Returns (uint64 values, byte lengths)."""
    n = len(pos)
    out = np.zeros(n, np.uint64)
    lens = np.zeros(n, np.int64)
    cur = pos.astype(np.int64).copy()
    active = np.ones(n, bool)
    shift = np.uint64(0)
    for i in range(10):
        if not active.any():
            break
        idx = cur[active]
        byte = b[idx]
        out[active] |= ((byte & np.uint64(0x7F)).astype(np.uint64)
                        << shift)
        done = (byte & 0x80) == 0
        act_idx = np.flatnonzero(active)
        lens[act_idx[done]] = i + 1
        active[act_idx[done]] = False
        cur += 1
        shift += np.uint64(7)
    if active.any():
        raise ValueError("varint longer than 10 bytes")
    return out, lens


def _gather_segments(src: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Concatenate variable-length segments src[starts[i]:+lens[i]]
    into one flat byte array — the grouped-arange gather."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.uint8)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = (np.repeat(starts, lens)
           + (np.arange(total, dtype=np.int64) - np.repeat(offs, lens)))
    return src[idx]


def _schema_json(schema: pa.Schema, name: str = "Row") -> str:
    fields = []
    for f in schema:
        if f.type not in _AVRO_OF_ARROW:
            raise ValueError(f"unsupported Arrow type for Avro: {f.type}")
        fields.append({"name": f.name, "type": _AVRO_OF_ARROW[f.type]})
    return json.dumps({"type": "record", "name": name, "fields": fields},
                      separators=(",", ":"))


def _long(v: int) -> bytes:
    flat, _ = _varint_bytes(_zigzag(np.array([v], np.int64)))
    return flat.tobytes()


def _bytes_item(b: bytes) -> bytes:
    return _long(len(b)) + b


# ------------------------------------------------------------ writer

def write_avro_table(table: pa.Table, path: str, codec: str = "null",
                     rows_per_block: int = 8192) -> str:
    """Write one Arrow table as a spec-compliant Avro container file.
    ``codec``: "null" | "deflate". The sync marker is derived from the
    schema + content hash, so identical tables produce identical
    bytes (content-addressed shards stay deterministic)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    schema_json = _schema_json(table.schema)

    blocks = []
    rowindex = bytearray()
    n_blocks = 0
    for off in range(0, max(table.num_rows, 1), rows_per_block):
        chunk = table.slice(off, rows_per_block)
        if chunk.num_rows == 0 and table.num_rows > 0:
            break
        data, row_starts = _encode_block(chunk)
        n_blocks += 1
        flat, _ = _varint_bytes(_zigzag(
            np.diff(np.concatenate(([0], row_starts)))))
        rowindex += _long(chunk.num_rows) + flat.tobytes()
        payload = zlib.compress(data, 6)[2:-4] if codec == "deflate" \
            else data
        blocks.append((chunk.num_rows, payload))
        if table.num_rows == 0:
            break

    h = hashlib.md5(schema_json.encode()
                    + b"".join(p for _, p in blocks)).digest()
    sync = h[:16]

    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
        ROWINDEX_KEY: _long(n_blocks) + bytes(rowindex),
    }
    out = bytearray(MAGIC)
    out += _long(len(meta))
    for k, v in meta.items():
        out += _bytes_item(k.encode()) + _bytes_item(v)
    out += _long(0)  # map terminator
    out += sync
    for n_rows, payload in blocks:
        out += _long(n_rows) + _long(len(payload)) + payload + sync
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


def _encode_block(chunk: pa.Table) -> tuple[bytes, np.ndarray]:
    """Row-major binary encoding of a table slice, fully vectorized:
    per-field flat byte buffers + per-row segment lengths, interleaved
    with one grouped-arange gather. Returns (data, row END offsets)."""
    n = chunk.num_rows
    seg_bytes: list[np.ndarray] = []   # one flat buffer per segment col
    seg_lens: list[np.ndarray] = []    # per-row lengths, one per segment
    for col in chunk.columns:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        t = arr.type
        if t == pa.int64():
            flat, lens = _varint_bytes(_zigzag(
                arr.to_numpy(zero_copy_only=False).astype(np.int64)))
            seg_bytes.append(flat)
            seg_lens.append(lens)
        elif t == pa.float64():
            raw = np.ascontiguousarray(
                arr.to_numpy(zero_copy_only=False)
                .astype("<f8")).view(np.uint8)
            seg_bytes.append(raw)
            seg_lens.append(np.full(n, 8, np.int64))
        elif t == pa.bool_():
            raw = (arr.to_numpy(zero_copy_only=False)
                   .astype(np.uint8))
            seg_bytes.append(raw)
            seg_lens.append(np.full(n, 1, np.int64))
        elif t in (pa.string(), pa.large_string(), pa.binary()):
            if t == pa.large_string():
                arr = arr.cast(pa.string())
            # offsets buffer covers [0, arr.offset + len]; slice off
            # the preceding elements of a sliced array
            off = np.frombuffer(
                arr.buffers()[1], np.int32,
                count=arr.offset + len(arr) + 1).astype(np.int64)
            base = off[arr.offset:]
            data_buf = arr.buffers()[2]
            payload = (np.frombuffer(data_buf, np.uint8)
                       if data_buf is not None and len(data_buf)
                       else np.empty(0, np.uint8))
            str_lens = np.diff(base)
            lflat, llens = _varint_bytes(_zigzag(str_lens))
            seg_bytes.append(lflat)
            seg_lens.append(llens)
            seg_bytes.append(_gather_segments(payload, base[:-1],
                                              str_lens))
            seg_lens.append(str_lens)
        else:
            raise ValueError(f"unsupported Arrow type for Avro: {t}")

    k = len(seg_lens)
    if n == 0 or k == 0:
        return b"", np.empty(0, np.int64)
    lens_mat = np.stack(seg_lens, axis=1)          # (n, k) row-major
    dst_lens = lens_mat.ravel()                    # segment order
    src_starts = np.empty_like(lens_mat)
    for j in range(k):
        np.cumsum(lens_mat[:, j], out=src_starts[:, j])
    src_starts = src_starts - lens_mat             # exclusive prefix
    bases = np.concatenate(
        ([0], np.cumsum([len(bts) for bts in seg_bytes])[:-1]))
    src_start_flat = (src_starts + bases[None, :]).ravel()
    big_src = (np.concatenate(seg_bytes) if seg_bytes
               else np.empty(0, np.uint8))
    out = _gather_segments(big_src, src_start_flat, dst_lens)
    row_ends = np.cumsum(lens_mat.sum(axis=1))
    return out.tobytes(), row_ends


def write_avro_dataset(ds, out_dir: str, codec: str = "null",
                       return_paths: bool = False):
    """Write a Dataset as one content-addressed .avro shard per block
    (the GeoJSONL/ORC sink pattern): writer tasks emit their shard
    paths through the data plane, so the read side needs no driver
    listing of worker-written files — one metadata row per block
    reaches the driver. ``out_dir`` must be a shared URI on a
    multi-node cluster (the write_parquet precondition). Returns the
    row count, or ``(count, sorted shard paths)``."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = ""
        if t.num_rows:
            blob_name = hashlib.md5(
                t.schema.serialize().to_pybytes()
                + str(t.slice(0, 1).to_pydict()).encode()
                + str(t.num_rows).encode()).hexdigest()[:20]
            final = os.path.join(out_dir, f"{blob_name}.avro")
            tmp = final + ".tmp"
            write_avro_table(t, tmp, codec=codec)
            os.replace(tmp, final)  # atomic: no partial files survive
            path = final
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "path": pa.array([path], pa.string())})

    out = ds.map_batches(write_block, batch_format="pyarrow")
    if not return_paths:
        return out.sum("n")
    rows = out.take_all()   # shard manifest — one row per block
    return (sum(r["n"] for r in rows),
            sorted(r["path"] for r in rows if r["path"]))


# ------------------------------------------------------------ reader

def read_avro(path: str) -> pa.Table:
    """Read an Avro container file into an Arrow table. Files carrying
    the ``x.osm2shp.rowindex`` metadata key decode with the lockstep
    vectorized path; foreign files fall back to a sequential parse."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    buf = np.frombuffer(raw, np.uint8)
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, ln = _varints_at(buf, np.array([pos], np.int64))
        cnt = int(_unzigzag(cnt)[0])
        pos += int(ln[0])
        if cnt == 0:
            break
        if cnt < 0:  # negative count: abs count + byte size follows
            cnt = -cnt
            _, ln2 = _varints_at(buf, np.array([pos], np.int64))
            pos += int(ln2[0])
        for _ in range(cnt):
            klen, ln = _varints_at(buf, np.array([pos], np.int64))
            pos += int(ln[0])
            klen = int(_unzigzag(klen)[0])
            key = raw[pos:pos + klen].decode()
            pos += klen
            vlen, ln = _varints_at(buf, np.array([pos], np.int64))
            pos += int(ln[0])
            vlen = int(_unzigzag(vlen)[0])
            meta[key] = raw[pos:pos + vlen]
            pos += vlen
    sync = raw[pos:pos + 16]
    pos += 16

    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("only record schemas are supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, t in fields:
        if t not in ("long", "double", "string", "bytes", "boolean"):
            raise ValueError(f"unsupported Avro field type: {t}")

    rowindex = _parse_rowindex(meta.get(ROWINDEX_KEY))

    cols: dict[str, list] = {name: [] for name, _ in fields}
    block_i = 0
    while pos < len(raw):
        cnt, ln = _varints_at(buf, np.array([pos], np.int64))
        n_rows = int(_unzigzag(cnt)[0])
        pos += int(ln[0])
        sz, ln = _varints_at(buf, np.array([pos], np.int64))
        nbytes = int(_unzigzag(sz)[0])
        pos += int(ln[0])
        payload = raw[pos:pos + nbytes]
        pos += nbytes
        if raw[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt file")
        pos += 16
        data = (zlib.decompress(payload, -15) if codec == "deflate"
                else payload)
        starts = None
        if rowindex is not None and block_i < len(rowindex):
            idx_rows, row_starts = rowindex[block_i]
            if idx_rows == n_rows:
                starts = row_starts
        if starts is not None:
            block_cols = _decode_block_vec(
                np.frombuffer(data, np.uint8), starts, fields)
        else:
            block_cols = _decode_block_seq(data, n_rows, fields)
        for (name, _), arr in zip(fields, block_cols):
            cols[name].append(arr)
        block_i += 1

    out = {}
    for name, t in fields:
        chunks = cols[name]
        typ = {"long": pa.int64(), "double": pa.float64(),
               "string": pa.string(), "bytes": pa.binary(),
               "boolean": pa.bool_()}[t]
        out[name] = (pa.chunked_array(chunks, typ) if chunks
                     else pa.array([], typ))
    return pa.table(out)


def _parse_rowindex(blob: bytes | None):
    if not blob:
        return None
    from .osmpbf import decode_varints

    buf = np.frombuffer(blob, np.uint8)
    p = 0
    nb, ln = _varints_at(buf, np.array([p], np.int64))
    n_blocks = int(_unzigzag(nb)[0])
    p += int(ln[0])
    blocks = []
    for _ in range(n_blocks):
        nr, ln = _varints_at(buf, np.array([p], np.int64))
        n_rows = int(_unzigzag(nr)[0])
        p += int(ln[0])
        # n_rows packed zigzag per-row lengths follow: continuation
        # bits alone delimit values here (no fixed-width bytes), so
        # the packed stream decoder applies; span = end of the n-th
        if n_rows:
            lastbits = (buf[p:] & 0x80) == 0
            ends = np.flatnonzero(lastbits)
            span = int(ends[n_rows - 1]) + 1
            deltas = _unzigzag(decode_varints(buf[p:p + span]))
            p += span
        else:
            deltas = np.empty(0, np.int64)
        blocks.append((n_rows, np.cumsum(deltas) - deltas))
    return blocks


def _decode_block_vec(b: np.ndarray, row_starts: np.ndarray,
                      fields) -> list[pa.Array]:
    """Lockstep vectorized block decode: one masked pass per field
    across all rows (no Python row loop)."""
    pos = row_starts.astype(np.int64).copy()
    n = len(pos)
    out = []
    for _, t in fields:
        if t == "long":
            v, ln = _varints_at(b, pos)
            out.append(pa.array(_unzigzag(v), pa.int64()))
            pos += ln
        elif t == "double":
            if n:
                idx = pos[:, None] + np.arange(8)[None, :]
                vals = np.ascontiguousarray(b[idx]).view("<f8").ravel()
            else:
                vals = np.empty(0, np.float64)
            out.append(pa.array(vals, pa.float64()))
            pos += 8
        elif t == "boolean":
            out.append(pa.array(b[pos] != 0 if n
                                else np.empty(0, bool), pa.bool_()))
            pos += 1
        else:  # string / bytes
            lv, ln = _varints_at(b, pos)
            slen = _unzigzag(lv)
            pos += ln
            payload = _gather_segments(b, pos, slen)
            offsets = np.concatenate(
                ([0], np.cumsum(slen))).astype(np.int32)
            flat = pa.py_buffer(payload.tobytes())
            typ = pa.string() if t == "string" else pa.binary()
            out.append(pa.Array.from_buffers(
                typ, n, [None, pa.py_buffer(offsets.tobytes()), flat]))
            pos += slen
    return out


def _decode_block_seq(data: bytes, n_rows: int, fields) -> list:
    """Sequential fallback for files without the row index (foreign
    writers): correct, per-row Python — not a hot path by contract."""
    vals: list[list] = [[] for _ in fields]
    p = 0
    mv = memoryview(data)
    for _ in range(n_rows):
        for j, (_, t) in enumerate(fields):
            if t == "long":
                v, p = _read_zigzag(mv, p)
                vals[j].append(v)
            elif t == "double":
                vals[j].append(struct.unpack_from("<d", mv, p)[0])
                p += 8
            elif t == "boolean":
                vals[j].append(mv[p] != 0)
                p += 1
            else:
                ln, p = _read_zigzag(mv, p)
                raw = bytes(mv[p:p + ln])
                vals[j].append(raw.decode() if t == "string" else raw)
                p += ln
    typ = {"long": pa.int64(), "double": pa.float64(),
           "string": pa.string(), "bytes": pa.binary(),
           "boolean": pa.bool_()}
    return [pa.array(v, typ[t]) for v, (_, t) in zip(vals, fields)]


def _read_zigzag(mv, p: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        byte = mv[p]
        p += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), p
