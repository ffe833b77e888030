"""Checkpoint/resume + metrics tests (SURVEY.md §5.4: kill mid-run,
restart, assert no duplicated partitions and identical final output)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from osm2shp_ray.state import checkpoint, metrics


def _mk_ds(n=1000):
    rng = np.random.default_rng(3)
    t = pa.table({
        "k": pa.array(rng.integers(0, 8, n), pa.int64()),
        "v": pa.array(np.arange(n), pa.int64()),
    })
    return rd.from_arrow(t), t


def test_resumable_write_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "out")
    ds, t = _mk_ds()
    written = checkpoint.resumable_write(ds, out, "k", stage="s1")
    assert len(written) == 8
    assert checkpoint.completed_keys(out) == {str(i) for i in range(8)}
    back = checkpoint.read_output(out, "k")
    assert back.num_rows == 1000
    # second run: everything skipped
    ds2, _ = _mk_ds()
    written2 = checkpoint.resumable_write(ds2, out, "k", stage="s1")
    assert written2 == []
    assert checkpoint.read_output(out, "k").num_rows == 1000  # no duplicates
    m = checkpoint.manifest_metrics(out)
    assert m["partitions"] == 8 and m["rows"] == 1000


def test_crash_window_resume(ray_session, tmp_path):
    """Injected crash AFTER the data rename but BEFORE the manifest:
    partition must be rewritten on resume without duplication."""
    out = str(tmp_path / "out")
    ds, t = _mk_ds()
    with pytest.raises(Exception):
        checkpoint.resumable_write(ds, out, "k", fail_on_keys={"3"})
    done = checkpoint.completed_keys(out)
    assert "3" not in done           # crashed partition not manifested
    # data dir for key 3 may exist (the crash window) — resume must heal it
    ds2, _ = _mk_ds()
    checkpoint.resumable_write(ds2, out, "k")
    assert checkpoint.completed_keys(out) == {str(i) for i in range(8)}
    back = checkpoint.read_output(out, "k")
    assert back.num_rows == 1000
    # exact content equality with a clean one-shot run
    clean = str(tmp_path / "clean")
    ds3, _ = _mk_ds()
    checkpoint.resumable_write(ds3, clean, "k")
    a = back.select(["k", "v"]).to_pandas().sort_values(["k", "v"], ignore_index=True)
    b = (checkpoint.read_output(clean, "k").select(["k", "v"])
         .to_pandas().sort_values(["k", "v"], ignore_index=True))
    assert a.equals(b)


def test_metrics_actor(ray_session):
    actor = metrics.get_or_create("test_metrics")
    ds, t = _mk_ds(500)
    counted = metrics.counted(ds, "processed_rows", actor)
    assert counted.count() == 500
    import time
    for _ in range(50):           # fire-and-forget: allow delivery
        if ray.get(actor.get.remote("processed_rows")) >= 500:
            break
        time.sleep(0.1)
    assert ray.get(actor.get.remote("processed_rows")) == 500
    rep = ray.get(actor.report.remote())
    assert rep["processed_rows"] == 500
