"""On-chip contract for precision='float64' exact-limb sums (VERDICT r4 #5).

The TPU stores f64 as an f32 double-double (~2^-48) and emulated f64
scatters run ~8M rows/s, so parity mode accumulates float sums as exact
multi-limb integer fixed point (i64 is exact on the chip) and reconstructs
IEEE f64 on host: the result is the correctly-rounded sum — verified here
against math.fsum — at >10x the old emulated-scatter rate.

Run on real TPU hardware: python -m pytest tests_tpu/ -x -q
"""
import math

import numpy as np
import pytest

import jax

if jax.devices()[0].platform != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU device", allow_module_level=True)

import vaex_tpu as vaex  # noqa: E402
from vaex_tpu import settings  # noqa: E402


@pytest.fixture(autouse=True)
def _parity_precision():
    # per-test, NOT module-level: pytest imports every tests_tpu module at
    # collection, so a module-level mutation leaks into other files' tests
    old = settings.compute.precision
    settings.compute.precision = "float64"
    yield
    settings.compute.precision = old


def _fsum_grid(k, v, ncells):
    out = np.zeros(ncells)
    for c in range(ncells):
        out[c] = math.fsum(v[k == c].astype(np.float64))
    return out


def test_f32_binned_sum_correctly_rounded_onchip():
    rng = np.random.RandomState(11)
    n, C = 1_000_000, 64
    k = rng.randint(0, C, n).astype(np.int32)
    v = (rng.normal(0, 2, n) * 2.0 ** rng.randint(-20, 21, n)).astype(np.float32)
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, C], shape=C))
    ref = _fsum_grid(k, v, C)
    np.testing.assert_array_equal(got, ref)
    assert float(df.sum("v")) == math.fsum(v.astype(np.float64))


def test_f64_binned_sum_exact_bits_shipped_onchip():
    """f64 columns reach the chip as exact i64 bit patterns
    (functions._f64_sum_bits): the result is fsum-exact despite the lossy
    dd f64 H2D path."""
    rng = np.random.RandomState(12)
    n, C = 500_000, 32
    k = rng.randint(0, C, n).astype(np.int32)
    v = rng.normal(3, 2, n) * 10.0 ** rng.randint(-8, 9, n)
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, C], shape=C))
    np.testing.assert_array_equal(got, _fsum_grid(k, v, C))


def test_parity_mean_and_std_onchip():
    rng = np.random.RandomState(13)
    n, C = 500_000, 16
    k = rng.randint(0, C, n).astype(np.int32)
    v = rng.normal(5, 3, n).astype(np.float32)
    df = vaex.from_arrays(k=k, v=v)
    mean = np.asarray(df.mean("v", binby="k", limits=[0, C], shape=C))
    ref = _fsum_grid(k, v, C) / np.bincount(k, minlength=C)
    np.testing.assert_array_equal(mean, ref)
    std = np.asarray(df.std("v", binby="k", limits=[0, C], shape=C))
    for c in [0, C - 1]:
        sel = v[k == c].astype(np.float64)
        assert std[c] == pytest.approx(sel.std(), rel=1e-10)


def test_parity_specials_onchip():
    k = np.array([0, 0, 1, 1, 2, 2], np.int32)
    v = np.array([1.5, np.nan, np.inf, 2.0, 4.0, -1e308])
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, 3], shape=3))
    assert got[0] == 1.5
    assert got[1] == np.inf
    assert got[2] == 4.0 - 1e308
