"""OSM XML reader — the reference's native input format (S1:
/root/reference/osm2shp.cc:16-18 parses OSM XML; mapgen.sh:24-33
probes `.osm`, `.osm.gz`, `.osm.bz2`).

Format (public OSM XML schema): `<node id lat lon><tag k v/></node>`,
`<way id><nd ref/><tag k v/></way>`. Tags normalize to the engine's
canonical "k=v k2=v2" string column (functions/tags.py).

Parallelism note: XML is not byte-range-splittable (an element can
straddle any offset), so ONE streaming parser per FILE is the unit of
parallelism — `read_osm` turns each file into a sequence of Arrow
batches via `ray.data.from_items` over per-file parse tasks when given
a directory, or a single streamed file otherwise. The parse itself is
expat-backed iterparse (C speed); at 100 TB scale the mandated input
is Lance/parquet (readers.py) and OSM XML is the ingest/parity path,
mirroring how the reference is actually fed.
"""

from __future__ import annotations

import bz2
import gzip
import os
from xml.etree.ElementTree import iterparse

import numpy as np
import pyarrow as pa


def _open_stream(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    return open(path, "rb")


def _tags_str(elem) -> str:
    return " ".join(f"{t.get('k')}={t.get('v')}"
                    for t in elem.findall("tag"))


def parse_osm_xml(path: str, batch_rows: int = 65536):
    """Stream one OSM XML file -> yields ("node"|"way", pa.Table)
    batches. Memory-bounded: elements are cleared as soon as consumed
    (the iterparse idiom), so arbitrarily large files stream."""
    n_ids: list[int] = []
    n_lon: list[float] = []
    n_lat: list[float] = []
    n_tags: list[str] = []
    w_ids: list[int] = []
    w_refs: list[list[int]] = []
    w_tags: list[str] = []

    def node_batch():
        t = pa.table({
            "id": pa.array(np.asarray(n_ids, dtype=np.int64), pa.int64()),
            "lon": pa.array(np.asarray(n_lon, dtype=np.float64), pa.float64()),
            "lat": pa.array(np.asarray(n_lat, dtype=np.float64), pa.float64()),
            "tags": pa.array(n_tags, pa.string()),
        })
        n_ids.clear(); n_lon.clear(); n_lat.clear(); n_tags.clear()
        return t

    def way_batch():
        t = pa.table({
            "way_id": pa.array(np.asarray(w_ids, dtype=np.int64), pa.int64()),
            "node_refs": pa.array(w_refs, pa.list_(pa.int64())),
            "tags": pa.array(w_tags, pa.string()),
        })
        w_ids.clear(); w_refs.clear(); w_tags.clear()
        return t

    with _open_stream(path) as f:
        # capture the root on its start event and clear it after each
        # consumed element: elem.clear() alone empties the element but
        # the root's CHILD LIST still references it, so a planet-scale
        # file would accumulate O(n) empty Elements (review finding)
        root = None
        for event, elem in iterparse(f, events=("start", "end")):
            if event == "start":
                if root is None:
                    root = elem
                continue
            if elem.tag == "node":
                n_ids.append(int(elem.get("id")))
                n_lon.append(float(elem.get("lon")))
                n_lat.append(float(elem.get("lat")))
                n_tags.append(_tags_str(elem))
                if len(n_ids) >= batch_rows:
                    yield "node", node_batch()
            elif elem.tag == "way":
                w_ids.append(int(elem.get("id")))
                w_refs.append([int(nd.get("ref"))
                               for nd in elem.findall("nd")])
                w_tags.append(_tags_str(elem))
                if len(w_ids) >= batch_rows:
                    yield "way", way_batch()
            # relations are ignored (the reference has node/way
            # callbacks only); any completed top-level element is
            # dropped from the root's child list below
            if root is not None and elem.tag in ("node", "way",
                                                 "relation", "bounds"):
                root.clear()  # drops processed children; tag/nd stay
                # attached to their parent until the parent completes
    if n_ids:
        yield "node", node_batch()
    if w_ids:
        yield "way", way_batch()


def read_osm(path: str, batch_rows: int = 65536,
             single_pass: bool = False, scratch_dir: str | None = None):
    """OSM XML file or directory of files -> (nodes_ds, ways_ds)
    ray.data Datasets with the engine's canonical schemas.

    Each FILE parses in one Ray task (XML is not offset-splittable);
    a directory of per-extract files is the parallel form, exactly how
    planet-scale OSM dumps ship (per-region extracts).

    ``single_pass=True``: each file is parsed ONCE, with node/way
    batches streamed through ParquetWriters into ``scratch_dir``, then
    both sides come back as ordinary parallel ``read_parquet``
    datasets (column-prunable, re-readable). Expat parsing dominates
    XML ingest, so one parse + a parquet round-trip beats the default
    two-parse mode on CPU — but the scratch dir MUST be visible to
    every node (shared filesystem / fsspec path): the parse task
    writes where it runs and the read tasks run anywhere. The scratch
    files persist for the lazy Datasets' lifetime (caller owns
    cleanup). The default double-parse mode keeps everything in the
    object store — cluster-safe with zero scratch — at the cost of a
    second parse per file."""
    import ray
    import ray.data as rd

    from .readers import is_osm_path

    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if is_osm_path(os.path.join(path, f))
              and os.path.isfile(os.path.join(path, f))]
             if os.path.isdir(path) else [path])
    if not files:
        raise FileNotFoundError(f"no .osm files under {path}")

    empty = {
        "node": pa.table({"id": pa.array([], pa.int64()),
                          "lon": pa.array([], pa.float64()),
                          "lat": pa.array([], pa.float64()),
                          "tags": pa.array([], pa.string())}),
        "way": pa.table({"way_id": pa.array([], pa.int64()),
                         "node_refs": pa.array([], pa.list_(pa.int64())),
                         "tags": pa.array([], pa.string())}),
    }

    # streaming generator task: each yielded batch becomes its OWN
    # object-store block the moment it is parsed — the task never holds
    # a whole file's tables (parse_osm_xml is batch-bounded), and one
    # big file still produces many downstream blocks. One pass per
    # kind: re-parsing trades double parse CPU for bounded memory.
    @ray.remote(num_returns="dynamic")
    def parse_kind(p: str, kind: str):
        n = 0
        for k, t in parse_osm_xml(p, batch_rows):
            if k == kind:
                n += 1
                yield t
        if n == 0:
            yield empty[kind]

    # .pbf files decode blob-parallel via sources/osmpbf.py (the
    # format's native split unit); XML files get one streaming parse
    # task per kind. Submit everything up front so tasks run
    # concurrently; the ray.get blocks only for ref ENUMERATION (values
    # stay in the object store).
    @ray.remote
    def parse_once(p: str, out_dir: str) -> tuple[str, str]:
        """Single streaming parse -> scratch parquet per kind (lazy
        ParquetWriters, so memory stays batch-bounded)."""
        import uuid

        import pyarrow.parquet as pq
        base = uuid.uuid4().hex[:12]
        paths = {k: os.path.join(out_dir, f"{base}-{k}.parquet")
                 for k in ("node", "way")}
        writers: dict = {}
        try:
            for k, t in parse_osm_xml(p, batch_rows):
                if k not in writers:
                    writers[k] = pq.ParquetWriter(paths[k], t.schema)
                writers[k].write_table(t)
            for k in ("node", "way"):
                if k not in writers:
                    pq.write_table(empty[k], paths[k])
        finally:
            for w in writers.values():
                w.close()
        return paths["node"], paths["way"]

    pbf = [p for p in files if p.endswith(".pbf")]
    xml = [p for p in files if not p.endswith(".pbf")]
    n_parts, w_parts = [], []
    if pbf:
        from .osmpbf import read_osm_pbf
        for p in pbf:
            nd, wd = read_osm_pbf(p)
            n_parts.append(nd)
            w_parts.append(wd)
    if xml and single_pass:
        if scratch_dir is None:
            raise ValueError(
                "single_pass=True needs scratch_dir= on SHARED storage "
                "(parse tasks write where they run; read tasks run "
                "anywhere)")
        scratch = scratch_dir
        os.makedirs(scratch, exist_ok=True)
        pairs = ray.get([parse_once.remote(p, scratch) for p in xml])
        n_parts.append(rd.read_parquet([n for n, _ in pairs]))
        w_parts.append(rd.read_parquet([w for _, w in pairs]))
    elif xml:
        n_refs = [parse_kind.remote(p, "node") for p in xml]
        w_refs = [parse_kind.remote(p, "way") for p in xml]
        n_parts.append(rd.from_arrow_refs(
            [r for g in ray.get(n_refs) for r in g]))
        w_parts.append(rd.from_arrow_refs(
            [r for g in ray.get(w_refs) for r in g]))
    nodes_ds = n_parts[0]
    ways_ds = w_parts[0]
    for nd in n_parts[1:]:
        nodes_ds = nodes_ds.union(nd)
    for wd in w_parts[1:]:
        ways_ds = ways_ds.union(wd)
    return nodes_ds, ways_ds
