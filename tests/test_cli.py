"""CLI (S3 surface) test — runs the real subcommands in a subprocess
(owns its own Ray session, like a user invocation)."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    return subprocess.run([sys.executable, "-m", "osm2shp_ray", *args],
                          capture_output=True, text=True, cwd=REPO, env=env)


def test_cli_convert_and_resume(tmp_path):
    from osm2shp_ray.sources.fixtures import cached_images_parquet
    fixture = cached_images_parquet(500, use_ray=False)
    out = str(tmp_path / "out")
    r = _run("convert", fixture, out, "--resume")
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metrics"]["processed_images"] == 500
    pts = pads.dataset(os.path.join(out, "points"), partitioning="hive").to_table()
    assert pts.num_rows > 0
    # rerun: resume skips everything, output unchanged
    r2 = _run("convert", fixture, out, "--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    pts2 = pads.dataset(os.path.join(out, "points"), partitioning="hive").to_table()
    assert pts2.num_rows == pts.num_rows


def test_cli_bad_args():
    r = _run("convert")
    assert r.returncode != 0


def test_cli_kill_resume(tmp_path):
    """SIGKILL the convert mid-run; a rerun must heal and produce
    byte-identical output to a clean run (SURVEY.md §5.4)."""
    import signal
    import time
    from osm2shp_ray.sources.fixtures import cached_images_parquet
    fixture = cached_images_parquet(2000, use_ray=False)
    out = str(tmp_path / "killed")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    proc = subprocess.Popen([sys.executable, "-m", "osm2shp_ray", "convert",
                             fixture, out, "--resume"],
                            cwd=REPO, env=env, start_new_session=True,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(12)  # mid-run: ray is up, writes may have started
    # SIGKILL the whole process group (the CLI's private ray cluster
    # included) — NOT `ray stop`, which would also kill the pytest
    # session's own cluster
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    # resume
    r = _run("convert", fixture, out, "--resume")
    assert r.returncode == 0, r.stderr[-2000:]
    # clean reference run
    clean = str(tmp_path / "clean")
    r2 = _run("convert", fixture, clean, "--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    import pyarrow.dataset as pads2
    for sub in ("points", "ways"):
        a = (pads.dataset(os.path.join(out, sub), partitioning="hive")
             .to_table().sort_by("x"))
        b = (pads2.dataset(os.path.join(clean, sub), partitioning="hive")
             .to_table().sort_by("x"))
        assert a.num_rows == b.num_rows, sub


def test_cli_convert_from_lance(tmp_path):
    """The mandated input format end-to-end through the user CLI: an
    images table in (vendored) Lance converts identically to the same
    table in parquet."""
    import pyarrow.parquet as pq
    from osm2shp_ray.sources import lancefmt
    from osm2shp_ray.sources.fixtures import cached_images_parquet

    fixture = cached_images_parquet(500, use_ray=False)
    table = pq.read_table(os.path.join(fixture, "part-0.parquet"))
    lance_in = str(tmp_path / "images.lance")
    lancefmt.write_lance(table, lance_in, rows_per_fragment=200)

    out_l = str(tmp_path / "out_lance")
    r = _run("convert", lance_in, out_l)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["metrics"]["processed_images"] == 500

    out_p = str(tmp_path / "out_parquet")
    rp = _run("convert", fixture, out_p)
    assert rp.returncode == 0, rp.stderr[-2000:]
    t_l = (pads.dataset(os.path.join(out_l, "points"), partitioning="hive")
           .to_table().sort_by("x"))
    t_p = (pads.dataset(os.path.join(out_p, "points"), partitioning="hive")
           .to_table().sort_by("x"))
    assert t_l.num_rows == t_p.num_rows
    assert t_l["x"].equals(t_p["x"]) and t_l["y"].equals(t_p["y"])


def test_cli_convert_avro_sink(tmp_path):
    """--avro exports points/ways as vendored Avro container shards
    whose read-back row counts match the parquet output."""
    from osm2shp_ray.sources.fixtures import cached_images_parquet

    fixture = cached_images_parquet(500, use_ray=False)
    out = str(tmp_path / "out")
    r = _run("convert", fixture, out, "--avro")
    assert r.returncode == 0, r.stderr[-2000:]

    from osm2shp_ray.sources.avrofmt import read_avro
    for sub in ("points", "ways"):
        d = os.path.join(out, "avro", sub)
        shards = [os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".avro")]
        assert shards, sub
        n = sum(read_avro(p).num_rows for p in shards)
        pq = pads.dataset(os.path.join(out, sub),
                          partitioning="hive").to_table()
        assert n == pq.num_rows, sub
