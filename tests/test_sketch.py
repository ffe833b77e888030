"""Unit tests for stages/sketch.py: deterministic split + HLL sketch.

The SQL-parity of both operators' query outputs is covered by the
oracle mirror (tests/test_queries_oracle.py via q_split_stats /
q_distinct_hll); these tests cover the pieces the hash gate can't:
the float estimate's accuracy, bit-level helpers, and determinism
properties the split relies on at scale.
"""

import numpy as np

from osm2shp_ray.stages import sketch


def test_bit_length_u64_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 60, size=5000).astype(np.uint64)
    x[:4] = [0, 1, 2, (1 << 51) - 1]
    got = sketch._bit_length_u64(x)
    want = np.array([int(v).bit_length() for v in x], dtype=np.int64)
    assert (got == want).all()


def test_split_deterministic_and_order_free():
    ids = np.arange(1, 20001)
    a = sketch.split_of(ids)
    b = sketch.split_of(ids[::-1])[::-1]  # resharding must not matter
    assert (a == b).all()
    frac = {s: float((a == s).mean()) for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.80) < 0.02
    assert abs(frac["val"] - 0.10) < 0.02
    assert abs(frac["test"] - 0.10) < 0.02


def test_hll_estimate_accuracy_and_merge():
    # partial registers from disjoint batches must merge (max) to the
    # same registers as one pass, and the estimate must land within
    # the p=9 error band on both a small and a larger cardinality
    for n, tol in ((300, 0.15), (20000, 0.15)):
        vals = np.arange(n) * 7 + 1  # distinct ints
        m = 1 << sketch.HLL_P_DEFAULT
        reg_whole = np.zeros(m, np.int64)
        nz, rho = sketch._partial_registers(vals, sketch.HLL_P_DEFAULT)
        reg_whole[nz] = rho
        reg_merged = np.zeros(m, np.int64)
        for chunk in np.array_split(vals, 7):
            nz, rho = sketch._partial_registers(chunk, sketch.HLL_P_DEFAULT)
            np.maximum.at(reg_merged, nz, rho)
        assert (reg_whole == reg_merged).all()
        est = sketch.hll_estimate(np.arange(m), reg_whole)
        assert abs(est - n) / n < tol, (n, est)


def test_hll_duplicates_do_not_move_estimate():
    vals = np.arange(1000)
    nz1, rho1 = sketch._partial_registers(vals, sketch.HLL_P_DEFAULT)
    nz2, rho2 = sketch._partial_registers(np.tile(vals, 5),
                                          sketch.HLL_P_DEFAULT)
    assert (nz1 == nz2).all() and (rho1 == rho2).all()


def test_grouped_hll_estimates_per_group(ray_session):
    # per-group registers must estimate each group's OWN cardinality
    import pyarrow as pa
    import ray.data as rd

    n_a, n_b = 5000, 300
    t = pa.table({
        "v": pa.array(np.concatenate([np.arange(n_a) * 3 + 1,
                                      np.arange(n_b) * 5 + 2]), pa.int64()),
        "g": pa.array(["a"] * n_a + ["b"] * n_b),
    })
    regs = sketch.hll_register_table(rd.from_arrow(t), "v",
                                     group_col="g").to_pandas()
    for g, n in (("a", n_a), ("b", n_b)):
        part = regs[regs["g"] == g]
        est = sketch.hll_estimate(part["bucket"].values, part["rho"].values)
        assert abs(est - n) / n < 0.15, (g, n, est)


def test_grouped_gini_negative_sum_trunc(ray_session):
    """A key whose value sum is negative divides by a negative
    denominator; the engine must trunc toward zero exactly like
    DuckDB's // (regression: sign(num) alone was off by one)."""
    import pandas as pd
    import pyarrow as pa
    import ray
    from osm2shp_ray.stages.sketch import grouped_gini

    df = pd.DataFrame({"k": ["a", "a", "b", "b"],
                       "v": [-3.01, 1.00, 1.0, 2.0]})
    out = (grouped_gini(ray.data.from_pandas(df), "k", "v", quant=100,
                        n_buckets=2)
           .to_pandas().sort_values("k", ignore_index=True))
    # key a: vq sorted [-301, 100]; n=2 sv=-201 siv=-301*1+100*2=-101
    # num = 1e6*(2*(-101) - 3*(-201)) = 401_000_000; den = -402
    # trunc(401000000 / -402) = -997512 (floor would give -997513)
    assert out.loc[0, "gini_ppm"] == -997512
    import duckdb
    assert duckdb.sql("SELECT 401000000 // -402").fetchone()[0] == -997512


def test_winsorized_rejects_pct_zero(ray_session):
    import pandas as pd
    import pytest
    import ray
    from osm2shp_ray.stages.sketch import winsorized_mean

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError):
        winsorized_mean(ds, "k", "v", lo_pct=0)
