"""Job metrics: the Ray-native replacement for the reference's four
counters + progress prints (/root/reference/osm/handler.cc:84-85,
108-109, 59-62: processed/exported nodes/ways, cadence logging,
destructor totals).

A single named detached-scope actor accumulates counters; stages
report per-batch deltas fire-and-forget (one tiny remote call per
batch — amortized over thousands of rows, never awaited in the hot
path). ``report()`` yields the job-end summary (A4 analog).
"""

from __future__ import annotations

import pyarrow as pa

import ray


# A3 progress cadence (handler.cc:84-85,108-109: a line every 100k
# nodes / 10k ways): counters matching a suffix log when their value
# crosses a cadence boundary. Batch deltas make crossings approximate
# to within one batch — same observable behavior, no per-row cost.
CADENCE_SUFFIX = {"_images": 100_000, "_nodes": 100_000, "_ways": 10_000}


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._counters: dict[str, int] = {}
        self._partitions: dict[str, dict] = {}

    def _bump(self, name: str, n: int) -> None:
        old = self._counters.get(name, 0)
        new = old + int(n)
        self._counters[name] = new
        for suffix, step in CADENCE_SUFFIX.items():
            if name.endswith(suffix) and old // step != new // step:
                print(f"[metrics] {name}: {new}")
                break

    def inc(self, name: str, n: int = 1) -> None:
        self._bump(name, n)

    def inc_many(self, deltas: dict) -> None:
        for k, v in deltas.items():
            self._bump(k, v)

    def get(self, name: str) -> int:
        return self._counters.get(name, 0)

    def observe_partition(self, family: str, bucket: int, rows: int) -> None:
        """Per-partition row histogram for a shuffle family (SURVEY
        §7.4.5: at 100 TB, skew you can't see is skew you can't
        salt). Keyed by bucket so re-observations accumulate."""
        h = self._partitions.setdefault(family, {})
        h[bucket] = h.get(bucket, 0) + int(rows)

    def report(self) -> dict:
        out: dict = dict(sorted(self._counters.items()))
        for fam in sorted(self._partitions):
            vals = sorted(self._partitions[fam].values())
            n = len(vals)
            total = sum(vals)
            mean = total / n
            median = (vals[n // 2] if n % 2
                      else (vals[n // 2 - 1] + vals[n // 2]) / 2)
            out[f"skew[{fam}]"] = {
                "partitions": n, "rows": total, "max": vals[-1],
                "median": median,
                "max_over_mean": round(vals[-1] / mean, 2) if mean else 0.0,
            }
        return out


def get_or_create(name: str = "osm2shp_metrics"):
    try:
        return ray.get_actor(name)
    except ValueError:
        return MetricsActor.options(name=name, lifetime=None).remote()


def observe_partition(family: str, bucket, rows: int) -> None:
    """Fire-and-forget per-partition observation from inside a group
    kernel; no-op when no metrics actor exists (bare query runs).
    Callers bound call volume: per-bucket shuffles (~n_buckets calls)
    observe every group; high-cardinality groupbys (LSH bands) observe
    only heavy groups."""
    try:
        ray.get_actor("osm2shp_metrics").observe_partition.remote(
            family, int(bucket), int(rows))
    except Exception:
        pass


def counted(ds, counter: str, actor=None):
    """Wrap a dataset stage with a row counter (A1/A2 analog). The
    remote inc is fire-and-forget; batches pass through zero-copy.

    CAVEAT: attach only to a stream that is consumed exactly once.
    Ray Data re-executes lineage per consuming branch, so a counted()
    stage shared by two downstream pipelines increments twice — use an
    explicit ``ds.count()`` for input totals instead."""
    handle = actor or get_or_create()

    def count_batch(t: pa.Table) -> pa.Table:
        handle.inc.remote(counter, t.num_rows)
        return t

    return ds.map_batches(count_batch, batch_format="pyarrow")
