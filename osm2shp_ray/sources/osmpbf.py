"""OSM PBF reader/writer — the reference's second native input format
(S2: /root/reference/Makefile links osmpbf; osm2shp reads .pbf).

Self-contained minimal protobuf codec for the PUBLIC OSM PBF spec
(https://wiki.openstreetmap.org/wiki/PBF_Format): no protobuf library
exists in this container, and the subset the format needs — varints,
zigzag sints, length-delimited fields, packed repeated scalars — is
~100 lines. Covered: BlobHeader/Blob framing (raw + zlib), OSMHeader,
OSMData PrimitiveBlock with stringtable, DenseNodes (delta-coded
id/lat/lon + interleaved keys_vals) and Ways (packed keys/vals,
delta-coded refs). Relations are skipped (the reference has node/way
callbacks only).

Parallelism: unlike XML, PBF is SPLITTABLE — every OSMData blob is
self-contained (own stringtable, own delta bases). ``read_osm_pbf``
scans blob offsets on the driver (header bytes only, no payload
reads), then each blob decodes in its own Ray task and becomes its own
object-store block — true parallel ingest of a single file.

Decode is vectorized: packed varint streams parse with numpy (byte
continuation masks + per-position shifts, max 10 passes), never a
per-value Python loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

GRANULARITY = 100
NANO = 1e-9


# ------------------------------------------------------------ varints

def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Packed varint byte stream -> uint64 values, vectorized: group
    bytes at continuation-bit boundaries, then accumulate each byte
    position's 7 bits with one vector op per position (<= 10)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    last = (b & 0x80) == 0                 # final byte of each varint
    ends = np.flatnonzero(last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(len(ends), dtype=np.uint64)
    pos = starts.copy()
    shift = np.uint64(0)
    with np.errstate(over="ignore"):
        for _ in range(10):
            active = pos <= ends
            if not active.any():
                break
            out[active] |= ((b[pos[active]] & np.uint64(0x7F)).astype(np.uint64)
                            << shift)
            pos = pos + 1
            shift += np.uint64(7)
    return out


def unzigzag(v: np.ndarray) -> np.ndarray:
    return ((v >> np.uint64(1)) ^ (np.uint64(0) - (v & np.uint64(1)))).astype(np.int64)


def encode_varints(vals: np.ndarray) -> bytes:
    """uint64 values -> packed varint bytes (encoder is test/fixture
    support; per-value Python is fine there)."""
    out = bytearray()
    for v in np.asarray(vals, dtype=np.uint64):
        v = int(v)
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
    return bytes(out)


def zigzag(vals: np.ndarray) -> np.ndarray:
    v = np.asarray(vals, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


# ----------------------------------------------------- field scanning

def iter_fields(buf, pos: int = 0, end: int | None = None):
    """Yield (field_number, wire_type, value) over a protobuf message.
    value: int for varint(0)/fixed(1,5), memoryview for bytes(2)."""
    mv = memoryview(buf)
    end = len(mv) if end is None else end
    while pos < end:
        key = 0
        shift = 0
        while True:
            byte = mv[pos]
            pos += 1
            key |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        field, wt = key >> 3, key & 7
        if wt == 0:
            val = 0
            shift = 0
            while True:
                byte = mv[pos]
                pos += 1
                val |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            yield field, wt, val
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                byte = mv[pos]
                pos += 1
                ln |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            yield field, wt, mv[pos:pos + ln]
            pos += ln
        elif wt == 5:
            yield field, wt, int.from_bytes(mv[pos:pos + 4], "little")
            pos += 4
        elif wt == 1:
            yield field, wt, int.from_bytes(mv[pos:pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _field(tag_field: int, wt: int) -> bytes:
    return encode_varints(np.array([(tag_field << 3) | wt], dtype=np.uint64))


def _len_field(tag_field: int, payload: bytes) -> bytes:
    return (_field(tag_field, 2)
            + encode_varints(np.array([len(payload)], dtype=np.uint64))
            + payload)


# ------------------------------------------------------------- decode

def _dense_tags(kv: np.ndarray, sarr: np.ndarray, n_nodes: int) -> list[str]:
    """DenseNodes keys_vals stream (interleaved string ids, 0 ends a
    node) -> one "k=v k2=v2" string per node, VECTORIZED: pair strings
    built with numpy object concatenation, per-node join via a polars
    group_by (the hot ingest path must not loop per tag)."""
    if len(kv) == 0:
        return [""] * n_nodes
    is_end = kv == 0
    node_of = np.concatenate(([0], np.cumsum(is_end)[:-1]))
    seg_start = np.concatenate(([0], np.flatnonzero(is_end) + 1))[node_of]
    local = np.arange(len(kv)) - seg_start
    keys_m = (~is_end) & (local % 2 == 0)
    pair_node = node_of[keys_m]
    val_idx = np.flatnonzero(keys_m) + 1
    if len(val_idx) and (val_idx[-1] >= len(kv) or (kv[val_idx] == 0).any()):
        raise ValueError("truncated DenseNodes keys_vals: key id with no "
                         f"following value id (stream length {len(kv)})")
    pairs = (sarr[kv[keys_m]].astype(object) + "="
             + sarr[kv[val_idx]].astype(object))
    if len(pairs) == 0:
        return [""] * n_nodes
    import polars as pl
    joined = (pl.DataFrame({"node": pair_node, "pair": pairs.astype(str)})
              .group_by("node", maintain_order=False)
              .agg(pl.col("pair").str.join(" ")))
    out = [""] * n_nodes
    for node, s in zip(joined["node"], joined["pair"]):
        out[node] = s
    return out


def _to_i64(v: int) -> int:
    """Protobuf int64 varints arrive as raw unsigned magnitudes; map
    the two's-complement range back (negative lat_offset/way ids)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_block(data) -> tuple[pa.Table, pa.Table]:
    """One OSMData PrimitiveBlock -> (nodes table, ways table) in the
    engine's canonical schemas (tags normalized to "k=v k2=v2")."""
    strings: list[str] = []
    groups = []
    gran, lat_off, lon_off = GRANULARITY, 0, 0
    for f, _wt, v in iter_fields(data):
        if f == 1:      # stringtable
            strings = [bytes(s).decode("utf-8")
                       for ff, _w, s in iter_fields(v) if ff == 1]
        elif f == 2:
            groups.append(v)
        elif f == 17:
            gran = v
        elif f == 19:
            lat_off = _to_i64(v)
        elif f == 20:
            lon_off = _to_i64(v)
    sarr = np.asarray(strings, dtype=object)

    n_ids, n_lon, n_lat, n_tags = [], [], [], []
    w_ids, w_refs, w_tags = [], [], []

    def kv_to_tags(keys: np.ndarray, vals: np.ndarray) -> str:
        return " ".join(f"{sarr[k]}={sarr[v]}" for k, v in zip(keys, vals))

    for g in groups:
        for f, _wt, v in iter_fields(g):
            if f == 1:      # plain (non-dense) Node — legal alternative
                nid, klist, vlist = 0, np.empty(0, np.int64), np.empty(0, np.int64)
                nlat = nlon = 0
                for ff, _w, vv in iter_fields(v):
                    if ff == 1:   # Node.id is sint64 (zigzag)
                        nid = int(unzigzag(np.array([vv], dtype=np.uint64))[0])
                    elif ff == 2:
                        klist = decode_varints(np.frombuffer(vv, np.uint8)).astype(np.int64)
                    elif ff == 3:
                        vlist = decode_varints(np.frombuffer(vv, np.uint8)).astype(np.int64)
                    elif ff == 8:
                        nlat = unzigzag(np.array([vv], dtype=np.uint64))[0]
                    elif ff == 9:
                        nlon = unzigzag(np.array([vv], dtype=np.uint64))[0]
                n_ids.append(np.array([nid], dtype=np.int64))
                n_lat.append(np.array([NANO * (lat_off + gran * int(nlat))]))
                n_lon.append(np.array([NANO * (lon_off + gran * int(nlon))]))
                n_tags.append(kv_to_tags(klist, vlist))
            elif f == 2:      # DenseNodes
                ids = lats = lons = None
                kv = np.empty(0, dtype=np.int64)
                for ff, _w, vv in iter_fields(v):
                    if ff == 1:
                        ids = np.cumsum(unzigzag(decode_varints(np.frombuffer(vv, np.uint8))))
                    elif ff == 8:
                        lats = np.cumsum(unzigzag(decode_varints(np.frombuffer(vv, np.uint8))))
                    elif ff == 9:
                        lons = np.cumsum(unzigzag(decode_varints(np.frombuffer(vv, np.uint8))))
                    elif ff == 10:
                        kv = decode_varints(np.frombuffer(vv, np.uint8)).astype(np.int64)
                if ids is None:
                    continue
                n_ids.append(ids)
                n_lat.append(NANO * (lat_off + gran * lats))
                n_lon.append(NANO * (lon_off + gran * lons))
                n_tags.extend(_dense_tags(kv, sarr, len(ids)))
            elif f == 3:    # Way
                wid, keys, vals, refs = 0, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                for ff, _w, vv in iter_fields(v):
                    if ff == 1:           # Way.id is int64
                        wid = _to_i64(vv)
                    elif ff == 2:
                        keys = decode_varints(np.frombuffer(vv, np.uint8)).astype(np.int64)
                    elif ff == 3:
                        vals = decode_varints(np.frombuffer(vv, np.uint8)).astype(np.int64)
                    elif ff == 8:
                        refs = np.cumsum(unzigzag(decode_varints(np.frombuffer(vv, np.uint8))))
                w_ids.append(wid)
                w_refs.append(refs.tolist())
                w_tags.append(kv_to_tags(keys, vals))

    nodes = pa.table({
        "id": pa.array(np.concatenate(n_ids) if n_ids else np.empty(0, np.int64), pa.int64()),
        "lon": pa.array(np.concatenate(n_lon) if n_lon else np.empty(0), pa.float64()),
        "lat": pa.array(np.concatenate(n_lat) if n_lat else np.empty(0), pa.float64()),
        "tags": pa.array(n_tags, pa.string()),
    })
    ways = pa.table({
        "way_id": pa.array(w_ids, pa.int64()),
        "node_refs": pa.array(w_refs, pa.list_(pa.int64())),
        "tags": pa.array(w_tags, pa.string()),
    })
    return nodes, ways


def _decompress_blob(blob) -> bytes:
    raw, z = None, None
    for f, _wt, v in iter_fields(blob):
        if f == 1:
            raw = bytes(v)
        elif f == 3:
            z = bytes(v)
    if raw is not None:
        return raw
    if z is not None:
        return zlib.decompress(z)
    raise ValueError("blob has neither raw nor zlib_data")


def scan_blobs(path: str) -> list[tuple[int, int, str]]:
    """Driver-side blob index: [(payload_offset, payload_size, type)].
    Reads only the 4-byte lengths + BlobHeaders — O(#blobs) tiny reads,
    no payload bytes touched."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            header = f.read(hlen)
            btype, dsize = "", 0
            for ff, _wt, v in iter_fields(header):
                if ff == 1:
                    btype = bytes(v).decode()
                elif ff == 3:
                    dsize = v
            off = f.tell()
            out.append((off, dsize, btype))
            f.seek(off + dsize)
    return out


SUPPORTED_FEATURES = {"OsmSchema-V0.6", "DenseNodes"}


def _check_header(path: str, off: int, size: int) -> None:
    """Spec mandate: refuse files whose OSMHeader declares a required
    feature this reader does not implement (e.g. HistoricalInformation
    — silently reading such a file would emit wrong data)."""
    with open(path, "rb") as f:
        f.seek(off)
        payload = f.read(size)
    header = _decompress_blob(payload)
    required = [bytes(v).decode() for ff, _wt, v in iter_fields(header)
                if ff == 4]
    unsupported = [r for r in required if r not in SUPPORTED_FEATURES]
    if unsupported:
        raise NotImplementedError(
            f"{path}: PBF declares required features {unsupported} this "
            f"reader does not implement (supported: {sorted(SUPPORTED_FEATURES)})")


def read_osm_pbf(path: str):
    """.osm.pbf -> (nodes_ds, ways_ds): one Ray task per OSMData blob
    (the format's native split unit); blocks land in the object store
    via from_arrow_refs — the driver never holds decoded tables."""
    import ray
    import ray.data as rd

    scanned = scan_blobs(path)
    for o, s, t in scanned:
        if t == "OSMHeader":
            _check_header(path, o, s)
    blobs = [(o, s) for o, s, t in scanned if t == "OSMData"]

    @ray.remote(num_returns=2)
    def decode(off: int, size: int):
        with open(path, "rb") as f:
            f.seek(off)
            payload = f.read(size)
        return _decode_block(_decompress_blob(payload))

    refs = [decode.remote(o, s) for o, s in blobs]
    nodes_ds = rd.from_arrow_refs([r[0] for r in refs])
    ways_ds = rd.from_arrow_refs([r[1] for r in refs])
    return nodes_ds, ways_ds


# ------------------------------------------------------------- encode
# (fixture/round-trip support: enough of a writer to produce files the
# reader — and any spec-conformant reader — accepts)

def _string_table(strings: list[str]) -> tuple[bytes, dict]:
    """Index 0 is RESERVED as the DenseNodes keys_vals delimiter (the
    spec stores an unreferenced empty string there) — every real
    string, INCLUDING an empty tag value, gets an index >= 1."""
    entries = [""]
    idx: dict[str, int] = {}
    for s in strings:
        if s not in idx:
            idx[s] = len(entries)
            entries.append(s)
    payload = b"".join(_len_field(1, s.encode("utf-8")) for s in entries)
    return payload, idx


def _packed(field: int, vals: np.ndarray) -> bytes:
    return _len_field(field, encode_varints(vals))


def _tags_of(col, i):
    s = col[i].as_py()
    return [tuple(tok.split("=", 1)) for tok in s.split() if "=" in tok]


def _encode_node_block(chunk: pa.Table) -> bytes:
    """One DenseNodes PrimitiveBlock payload (uncompressed)."""
    kvs = [_tags_of(chunk["tags"], i) for i in range(chunk.num_rows)]
    strings = [x for kv in kvs for pair in kv for x in pair]
    st, idx = _string_table(strings)
    ids = chunk["id"].to_numpy(zero_copy_only=False)
    lat = np.round(chunk["lat"].to_numpy(zero_copy_only=False) / NANO
                   / GRANULARITY).astype(np.int64)
    lon = np.round(chunk["lon"].to_numpy(zero_copy_only=False) / NANO
                   / GRANULARITY).astype(np.int64)
    kv_stream: list[int] = []
    for kv in kvs:
        for k, v in kv:
            kv_stream.extend((idx[k], idx[v]))
        kv_stream.append(0)
    dense = (_packed(1, zigzag(np.diff(ids, prepend=0)))
             + _packed(8, zigzag(np.diff(lat, prepend=0)))
             + _packed(9, zigzag(np.diff(lon, prepend=0)))
             + _packed(10, np.asarray(kv_stream, dtype=np.uint64)))
    group = _len_field(2, dense)
    return _len_field(1, st) + _len_field(2, group)


def _encode_way_block(chunk: pa.Table) -> bytes:
    """One Ways PrimitiveBlock payload (uncompressed)."""
    kvs = [_tags_of(chunk["tags"], i) for i in range(chunk.num_rows)]
    strings = [x for kv in kvs for pair in kv for x in pair]
    st, idx = _string_table(strings)
    parts = []   # join once: += on bytes is O(n^2) per block
    for i in range(chunk.num_rows):
        refs = np.asarray(chunk["node_refs"][i].as_py(), dtype=np.int64)
        way = (_field(1, 0)
               + encode_varints(np.array([chunk["way_id"][i].as_py()],
                                         dtype=np.uint64))
               + _packed(2, np.asarray([idx[k] for k, _ in kvs[i]],
                                       dtype=np.uint64))
               + _packed(3, np.asarray([idx[v] for _, v in kvs[i]],
                                       dtype=np.uint64))
               + _packed(8, zigzag(np.diff(refs, prepend=0))))
        parts.append(_len_field(3, way))
    return _len_field(1, st) + _len_field(2, b"".join(parts))


def _blob_frame(btype: str, payload: bytes) -> bytes:
    """BlobHeader + Blob framing for one (type, raw payload) pair:
    zlib-compressed, raw_size recorded — the fileformat.proto frame."""
    z = zlib.compress(payload, 6)
    blob = (_field(2, 0)
            + encode_varints(np.array([len(payload)], dtype=np.uint64))
            + _len_field(3, z))
    bh = (_len_field(1, btype.encode())
          + _field(3, 0)
          + encode_varints(np.array([len(blob)], dtype=np.uint64)))
    return struct.pack(">I", len(bh)) + bh + blob


def write_osm_pbf(path: str, nodes: pa.Table, ways: pa.Table,
                  block_rows: int = 8000,
                  parallel: bool | None = None) -> int:
    """Engine-canonical nodes/ways tables -> .osm.pbf (DenseNodes +
    Ways, one zlib OSMData blob per ``block_rows`` chunk). Returns the
    blob count.

    Blob encode + compress are independent per chunk (the same
    property the reader exploits for blob-parallel DECODE), so with a
    live Ray session they run as parallel tasks; only the final
    sequential file concat is serial. ``parallel=False`` forces the
    in-process path (or it falls back automatically when Ray is not
    initialised)."""
    import ray

    chunks: list[tuple[str, pa.Table]] = []
    for lo in range(0, nodes.num_rows, block_rows):
        chunks.append(("node", nodes.slice(lo, block_rows)))
    for lo in range(0, ways.num_rows, block_rows):
        chunks.append(("way", ways.slice(lo, block_rows)))

    def encode(kind: str, chunk: pa.Table) -> bytes:
        payload = (_encode_node_block(chunk) if kind == "node"
                   else _encode_way_block(chunk))
        return _blob_frame("OSMData", payload)

    # parallel=True still requires a LIVE session: auto-connect would
    # boot a whole local cluster as a side effect of writing a file
    use_ray = (ray.is_initialized() and len(chunks) > 1
               and parallel is not False)
    if use_ray:
        enc = ray.remote(encode)
        frames = ray.get([enc.remote(k, c) for k, c in chunks])
    else:
        frames = [encode(k, c) for k, c in chunks]

    with open(path, "wb") as f:
        f.write(_blob_frame("OSMHeader",
                            _len_field(4, b"DenseNodes")))  # required_features
        for frame in frames:
            f.write(frame)
    return len(frames)
