"""Input readers — the S1-S4 surface of SURVEY.md §2.1.

The reference reads OSM XML (plain/.gz/.bz2) and PBF through one entry
point with format dispatch (/root/reference/osm2shp.cc:1,16-18;
mapgen.sh:24-33 probes extensions in order). Here the same shape: one
``read_table(path)`` that dispatches on extension/format, returning a
``ray.data.Dataset``:

- ``.parquet`` / directory of parquet -> ray.data.read_parquet
- ``.lance`` -> ray.data.read_lance where pylance is installed, else
  the vendored Lance v2 fragment reader (sources/lancefmt.py — the
  mandated input format per BASELINE.json input_hint; the lance
  library is absent from this container, so the engine ships its own
  spec-subset reader the way osmpbf ships its protobuf subset)
- ``.csv`` / ``.json`` -> corresponding Ray readers (conveniences)

``discover_input`` mirrors mapgen's ordered-extension probing.
"""

from __future__ import annotations

import os


def read_table(path: str, columns=None, **kwargs):
    import ray.data as rd

    ext = _ext(path)
    if ext == "" and os.path.isdir(path) and any(
            f.endswith(".avro") for f in os.listdir(path)):
        ext = "avro"  # extension-less shard directory
    if ext in ("parquet", ""):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if ext == "lance":
        try:
            import lance  # noqa: F401  # prefer real pylance when present
            return rd.read_lance(path, columns=columns, **kwargs)
        except ImportError:
            if kwargs:
                raise TypeError(
                    "the vendored lance reader supports only columns=; "
                    f"got extra kwargs {sorted(kwargs)} (install pylance "
                    "for the full ray.data.read_lance surface)")
            from .lancefmt import read_lance
            return read_lance(path, columns=columns)
    if ext == "csv":
        return rd.read_csv(path, **kwargs)
    if ext in ("json", "jsonl"):
        return rd.read_json(path, **kwargs)
    if ext == "avro":
        # vendored spec-subset container reader (sources/avrofmt.py);
        # one file or a directory of shards, one read task per file
        import pyarrow as pa

        from .avrofmt import read_avro
        paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))
                  if f.endswith(".avro")]
                 if os.path.isdir(path) else [path])
        ds = rd.from_items(paths).map_batches(
            lambda t: pa.concat_tables(
                [read_avro(p) for p in t["item"].to_pylist()]),
            batch_format="pyarrow", batch_size=1)
        if columns is not None:
            ds = ds.select_columns(list(columns))
        return ds
    raise NotImplementedError(f"no reader for extension {ext!r} ({path})")


def _ext(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    if "." not in base:
        return ""
    e = base.rsplit(".", 1)[-1].lower()
    return e


def is_osm_path(path: str) -> bool:
    """True for the reference's native inputs: .osm / .osm.gz /
    .osm.bz2 files, or a DIRECTORY containing any (the per-extract
    parallel form). osm2shp.cc:16-18; mapgen.sh:24-33. These parse via
    sources/osmxml.py into (nodes, ways) Datasets — two tables, so
    they go through ``osmxml.read_osm`` rather than read_table."""
    base = os.path.basename(path.rstrip("/"))
    if (base.endswith(".osm") or base.endswith(".osm.gz")
            or base.endswith(".osm.bz2") or base.endswith(".osm.pbf")):
        return True
    if os.path.isdir(path):
        # recurse on FULL paths (bare basenames would resolve isdir
        # against the CWD) and only count actual files
        return any(is_osm_path(os.path.join(path, f))
                   and os.path.isfile(os.path.join(path, f))
                   for f in os.listdir(path))
    return False


def discover_input(base: str, exts=("lance", "parquet", "csv", "jsonl",
                                    "avro", "osm", "osm.pbf", "osm.gz",
                                    "osm.bz2")) -> str:
    """Probe ``base.<ext>`` in priority order (mapgen.sh:24-33 analog);
    an existing path (file or directory) is accepted as-is."""
    if os.path.exists(base):
        return base
    for e in exts:
        cand = f"{base}.{e}"
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no input found for {base} (tried {exts})")
