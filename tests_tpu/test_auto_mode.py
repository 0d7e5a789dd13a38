"""On-chip tests of the DEFAULT payload mode ('auto'): exact integer
aggregates (bitwise BASELINE bar) + the documented sr error bound for float
sums.  The behavioral suite under tests/ pins i24 for its numpy-oracle
tolerances; THIS file is the out-of-box accuracy contract.

Run on real TPU hardware: python -m pytest tests_tpu/ -x -q
"""

import os

import numpy as np
import pytest

import jax

if jax.devices()[0].platform != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU device", allow_module_level=True)

# the auto default must be what ships — guard against env leakage
os.environ.pop("VAEX_TPU_PALLAS_PAYLOAD", None)

import vaex_tpu as vaex  # noqa: E402
from vaex_tpu import settings  # noqa: E402
from vaex_tpu.ops.pallas_gridagg import sr_error_sd  # noqa: E402


def test_default_is_auto():
    assert settings.compute.pallas_payload == "auto"


@pytest.mark.parametrize("dtype,lo,hi", [
    ("int8", -128, 128), ("uint8", 0, 256),
    ("int16", -32768, 32768), ("uint16", 0, 65536),
    ("int32", -2**31, 2**31),
])
def test_integer_sums_bitwise_exact(dtype, lo, hi):
    """Integer binned sums under the DEFAULT mode are bitwise equal to the
    int64 oracle at full dtype range (reference agg_sum.cpp parity —
    BASELINE.md config 2's 'integer aggregates bitwise-equal' bar)."""
    rng = np.random.RandomState(3)
    n = 1_000_000
    k = rng.randint(0, 100, n).astype(np.int8)
    v = rng.randint(lo, hi, n, dtype=np.int64).astype(dtype)
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, 100], shape=100))
    ref = np.zeros(100, np.int64)
    np.add.at(ref, k, v.astype(np.int64))
    np.testing.assert_array_equal(got, ref)
    # scalar sum too
    assert int(df.sum("v")) == int(v.astype(np.int64).sum())


def test_integer_groupby_exact_and_counts():
    rng = np.random.RandomState(5)
    n = 2_000_000
    k = rng.randint(0, 1000, n).astype(np.int16)
    v = rng.randint(-2**31, 2**31, n, dtype=np.int64).astype(np.int32)
    df = vaex.from_arrays(k=k, v=v)
    res = df.groupby("k", agg={"v": "sum", "n": vaex.agg.count()}, sort=True)
    keys = np.asarray(res.evaluate("k"))
    sums = np.asarray(res.evaluate("v"))
    cnts = np.asarray(res.evaluate("n"))
    ref_s = np.zeros(1000, np.int64)
    np.add.at(ref_s, k, v.astype(np.int64))
    ref_c = np.bincount(k, minlength=1000)
    np.testing.assert_array_equal(keys, np.arange(1000))
    np.testing.assert_array_equal(sums, ref_s)
    np.testing.assert_array_equal(cnts, ref_c)


def test_float_sum_within_sr_bound():
    """Float binned sums under 'auto' ride i8sr: counts exact, per-cell sum
    error within 6 sigma of the documented bound sr_error_sd (zero-mean SR:
    SD <= (halfrange/125) * sqrt(n/6))."""
    rng = np.random.RandomState(7)
    n = 4_000_000
    k = rng.randint(0, 256, n).astype(np.int32)
    v = rng.normal(3.0, 2.0, n).astype(np.float32)
    df = vaex.from_arrays(k=k, v=v)
    cnt = np.asarray(df.count(binby="k", limits=[0, 256], shape=256))
    got = np.asarray(df.sum("v", binby="k", limits=[0, 256], shape=256))
    ref = np.zeros(256, np.float64)
    np.add.at(ref, k, v.astype(np.float64))
    np.testing.assert_array_equal(cnt, np.bincount(k, minlength=256))
    half = (v.max() - v.min()) / 2.0
    bound = 6.0 * sr_error_sd(cnt, half) + 1e-3
    err = np.abs(got - ref)
    assert (err <= bound).all(), (err.max(), bound.min())
    # and zero-mean: the TOTAL error across cells concentrates
    assert abs((got - ref).sum()) <= 6.0 * sr_error_sd(np.array([n]), half)[0]


def test_mixed_launch_default_mode():
    """One launch, int exact + float sr + counts, h2o-q4 style."""
    rng = np.random.RandomState(9)
    n = 500_000
    k = rng.randint(0, 100, n).astype(np.int8)
    v1 = rng.randint(1, 6, n).astype(np.int8)
    v3 = rng.normal(size=n).astype(np.float32)
    df = vaex.from_arrays(k=k, v1=v1, v3=v3)
    res = df.groupby("k", agg={"v1": "mean", "v3": "mean"}, sort=True)
    m1 = np.asarray(res.evaluate("v1"))
    m3 = np.asarray(res.evaluate("v3"))
    for i in range(100):
        sel = k == i
        # int mean = exact int sum / exact count -> f64-exact
        assert abs(m1[i] - v1[sel].astype(np.float64).mean()) < 1e-12
        half = (v3[sel].max() - v3[sel].min()) / 2
        bound = 6 * float(sr_error_sd(np.array([sel.sum()]), half)[0]) / sel.sum()
        assert abs(m3[i] - v3[sel].astype(np.float64).mean()) <= bound + 1e-6
