"""precision='float64' exact-limb sums (VERDICT r4 #5).

On TPU, parity-mode float sums ride a multi-limb integer fixed-point
accumulator (ops/gridagg._exact_limb_update): i64 arithmetic is exact on the
chip, the f64 reconstruction happens host-side, and the result is the
CORRECTLY ROUNDED sum (within 1 ulp) — strictly tighter than the reference's
sequential f64 adds (agg_sum.cpp).  These tests exercise the machinery on
the CPU mesh by widening EXACT_LIMB_BACKENDS; tests_tpu/test_exact_sum.py
re-runs the contract on the real chip.
"""
import math

import numpy as np
import pytest

import vaex_tpu as vaex
from vaex_tpu import settings
from vaex_tpu.ops import gridagg


@pytest.fixture
def limb_cpu(monkeypatch):
    monkeypatch.setattr(gridagg, "EXACT_LIMB_BACKENDS", {"tpu", "cpu"})
    monkeypatch.setattr(settings.compute, "precision", "float64")
    # a fresh executor would be cleaner, but program caches key on settings
    # values that include precision, so reuse is safe
    yield


def _fsum_grid(k, v, ncells):
    out = np.zeros(ncells)
    for c in range(ncells):
        out[c] = math.fsum(v[k == c].astype(np.float64))
    return out


def test_exact_limb_unit_correctly_rounded():
    """Direct op-level check: decoded digits -> limbs -> host reconstruction
    equals math.fsum exactly, including negatives and a wide exponent spread."""
    import jax.numpy as jnp
    op = gridagg.AggOpSum(np.float64, precision="float64")
    old = gridagg.EXACT_LIMB_BACKENDS
    gridagg.EXACT_LIMB_BACKENDS = {"tpu", "cpu"}
    try:
        rng = np.random.RandomState(1)
        n, C = 100_000, 37
        k = rng.randint(0, C, n).astype(np.int32)
        v = rng.normal(0, 1, n) * np.exp(rng.uniform(-25, 25, n))
        v[::1000] = -v[::1000] * 1e12       # magnitude outliers
        state = op.init(C)
        bits = jnp.asarray(v.view(np.int64))
        include = jnp.ones(n, bool)
        state = op.update(state, jnp.asarray(k), bits, include)
        got = np.asarray(op.finalize(state))[:-1]
        ref = _fsum_grid(k, v, C)
        np.testing.assert_array_equal(got, ref)
    finally:
        gridagg.EXACT_LIMB_BACKENDS = old


def test_exact_limb_merge_and_multichunk():
    """Chunked accumulation + replica merge reproduce fsum exactly even when
    chunks have very different magnitudes (window re-anchoring)."""
    import jax.numpy as jnp
    op = gridagg.AggOpSum(np.float64, precision="float64")
    old = gridagg.EXACT_LIMB_BACKENDS
    gridagg.EXACT_LIMB_BACKENDS = {"tpu", "cpu"}
    try:
        rng = np.random.RandomState(2)
        n, C = 30_000, 11
        k = rng.randint(0, C, 3 * n).astype(np.int32)
        v = np.concatenate([
            rng.normal(0, 1e-20, n),       # tiny chunk first
            rng.normal(0, 1e15, n),        # then huge (anchor moves up)
            rng.normal(0, 1.0, n),         # then ordinary
        ])
        sa = op.init(C)
        sb = op.init(C)
        for i, s in [(0, "a"), (1, "b"), (2, "a")]:
            chunk_k = jnp.asarray(k[i * n:(i + 1) * n])
            chunk_v = jnp.asarray(v[i * n:(i + 1) * n].view(np.int64))
            if s == "a":
                sa = op.update(sa, chunk_k, chunk_v, jnp.ones(n, bool))
            else:
                sb = op.update(sb, chunk_k, chunk_v, jnp.ones(n, bool))
        merged = op.merge(sa, sb)
        got = np.asarray(op.finalize(merged))[:-1]
        ref = _fsum_grid(k, v, C)
        # cells dominated by the 1e15 chunk: exact; the documented window
        # truncation bound is n * 2^(bottom) with bottom ~ max_exp - 160
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= scale * 2.0 ** -100
    finally:
        gridagg.EXACT_LIMB_BACKENDS = old


def test_exact_limb_specials():
    """NaN skipped (reference agg_sum nan semantics), +-inf propagates via
    the spill grid, excluded rows contribute nothing."""
    import jax.numpy as jnp
    op = gridagg.AggOpSum(np.float64, precision="float64")
    old = gridagg.EXACT_LIMB_BACKENDS
    gridagg.EXACT_LIMB_BACKENDS = {"tpu", "cpu"}
    try:
        k = np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
        v = np.array([1.5, np.nan, np.inf, 2.0, -np.inf, np.inf, 4.0, 1e300])
        include = np.array([1, 1, 1, 1, 1, 1, 1, 0], bool)
        state = op.init(4)
        state = op.update(state, jnp.asarray(k), jnp.asarray(v.view(np.int64)),
                          jnp.asarray(include))
        got = np.asarray(op.finalize(state))[:-1]
        assert got[0] == 1.5          # nan skipped
        assert got[1] == np.inf       # inf + finite
        assert np.isnan(got[2])       # inf + -inf
        assert got[3] == 4.0          # excluded row dropped
    finally:
        gridagg.EXACT_LIMB_BACKENDS = old


def test_parity_binned_sum_end_to_end(limb_cpu):
    """Full engine drive: binned f64 sum + scalar sum + mean under
    precision='float64' match fsum through the public API."""
    rng = np.random.RandomState(3)
    n, C = 200_000, 64
    k = rng.randint(0, C, n).astype(np.int32)
    v = (rng.normal(3, 2, n) * 10.0 ** rng.randint(-6, 7, n))
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, C], shape=C))
    ref = _fsum_grid(k, v, C)
    np.testing.assert_array_equal(got, ref)
    assert float(df.sum("v")) == math.fsum(v)
    # mean: host-side division of exact sum by exact count
    got_mean = np.asarray(df.mean("v", binby="k", limits=[0, C], shape=C))
    cnt = np.bincount(k, minlength=C)
    np.testing.assert_array_equal(got_mean, ref / cnt)


def test_parity_f32_column_and_std(limb_cpu):
    rng = np.random.RandomState(4)
    n, C = 100_000, 32
    k = rng.randint(0, C, n).astype(np.int32)
    v = rng.normal(0, 5, n).astype(np.float32)
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, C], shape=C))
    ref = _fsum_grid(k, v.astype(np.float64), C)
    np.testing.assert_array_equal(got, ref)
    # std goes through the moment path (exact sum of f64-rounded squares)
    got_std = np.asarray(df.std("v", binby="k", limits=[0, C], shape=C))
    for c in [0, 7, C - 1]:
        sel = v[k == c].astype(np.float64)
        assert got_std[c] == pytest.approx(sel.std(), rel=1e-12)


def test_parity_masked_and_nan(limb_cpu):
    k = np.array([0, 0, 1, 1, 2, 2], np.int32)
    v = np.ma.MaskedArray([1.0, 2.0, np.nan, 3.0, 4.0, 5.0],
                          mask=[False, True, False, False, False, False])
    df = vaex.from_arrays(k=k, v=v)
    got = np.asarray(df.sum("v", binby="k", limits=[0, 3], shape=3))
    np.testing.assert_array_equal(got, [1.0, 3.0, 9.0])
