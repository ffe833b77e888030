"""Per-partition checkpoint manifests + resumable partitioned writes.

The reference's resume story is whole-run: mapgen.sh skips conversion
only if the entire output dir exists and deletes partial output on
interrupt (/root/reference/mapgen.sh:15-40). The north_rule demands
per-partition lineage: a killed run must resume without recomputing
completed partitions.

Design (SURVEY.md §4 'Checkpoint / resume'):
- output is partitioned by a key column; EACH partition is written by
  exactly one task via groupby(key).map_groups -> temp dir -> atomic
  os.rename -> manifest JSON (rows, order-insensitive checksum, stage,
  wall seconds). A crash can only ever leave: (a) temp dirs (ignored,
  cleaned next run), (b) renamed dirs without manifest (rewritten next
  run — rename+manifest-write is the tiny non-atomic window), or (c)
  manifested dirs (skipped on resume).
- resume = read the manifest key set (driver, tiny), broadcast it,
  filter finished keys out of the input BEFORE the shuffle, run the
  same write.

Partition granularity is the caller's lever: layer alone gives 10
partitions (reference parity); compose layer x coarse cell for enough
partitions to matter at cluster scale.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"


def _manifest_path(out_dir: str, key: str) -> str:
    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in str(key))
    return os.path.join(out_dir, MANIFEST_DIR, f"{safe}.json")


def completed_keys(out_dir: str) -> set:
    """Keys with a manifest entry — the resume set."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    keys = set()
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    keys.add(json.load(fh)["key"])
            except (json.JSONDecodeError, KeyError):
                continue  # half-written manifest = not completed
    return keys


def _checksum(table: pa.Table) -> int:
    """Order-insensitive content checksum: per-row polars hash summed
    (the driver's compare is order-insensitive too, SURVEY.md §7.4.7)."""
    import polars as pl
    df = pl.from_arrow(table)
    if df.height == 0:
        return 0
    h = df.hash_rows(seed=99).to_numpy().astype(np.uint64)
    return int(np.sum(h, dtype=np.uint64))


def resumable_write(ds, out_dir: str, partition_col: str, stage: str = "write",
                    fail_on_keys: set | None = None):
    """Write ``ds`` partitioned by ``partition_col`` with per-partition
    manifests; skips partitions already manifested. Returns the list of
    manifest dicts written this run.

    ``fail_on_keys`` injects a failure after data write but before the
    manifest for the given keys — used by the kill/resume test to prove
    crash windows are safe.
    """
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    done = completed_keys(out_dir)

    if done:
        done_arr = pa.array(sorted(str(k) for k in done), pa.string())

        def drop_done(t: pa.Table) -> pa.Table:
            col = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(col, value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    fail_keys = {str(k) for k in (fail_on_keys or ())}

    def write_group(t: pa.Table) -> pa.Table:
        t0 = time.time()
        key = str(t[partition_col][0].as_py())
        final = os.path.join(out_dir, f"{partition_col}={key}")
        tmp = os.path.join(out_dir, f"_tmp-{key}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
        if os.path.exists(final):  # unmanifested leftover from a crash
            import shutil
            shutil.rmtree(final)
        os.rename(tmp, final)
        if key in fail_keys:
            raise RuntimeError(f"injected failure after write of {key}")
        manifest = {
            "key": key, "stage": stage, "rows": t.num_rows,
            "checksum": _checksum(t), "seconds": round(time.time() - t0, 3),
            "partition_col": partition_col,
        }
        tmp_m = _manifest_path(out_dir, key) + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp_m, _manifest_path(out_dir, key))
        return pa.table({"key": pa.array([key], pa.string()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    from ..stages.util import coalesced
    written = (coalesced(ds).groupby(partition_col)
                 .map_groups(write_group, batch_format="pyarrow")
                 .take_all())
    return written


def read_output(out_dir: str, partition_col: str) -> pa.Table:
    """Read back only manifested partitions (ignores stragglers)."""
    parts = []
    for key in sorted(completed_keys(out_dir)):
        d = os.path.join(out_dir, f"{partition_col}={key}")
        if os.path.isdir(d):
            t = pq.read_table(d)
            parts.append(t.append_column(
                partition_col + "_key", pa.array([key] * t.num_rows, pa.string())))
    return pa.concat_tables(parts) if parts else pa.table({})


def manifest_metrics(out_dir: str) -> dict:
    """Aggregate per-partition metrics from the manifests."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    rows = 0
    seconds = 0.0
    n = 0
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                rows += m.get("rows", 0)
                seconds += m.get("seconds", 0.0)
                n += 1
    return {"partitions": n, "rows": rows, "write_seconds": round(seconds, 3)}
