"""N-dimensional binned aggregation: the hot path, as fused XLA programs.

TPU-native re-design of the reference C++ superagg module
(/root/reference/packages/vaex-core/src/agg.hpp:28-143 Grid::bin_ +
binners.cpp / binner_ordinal.cpp / agg_*.cpp): instead of per-thread C++
loops over 1024-row index blocks, each streaming chunk runs one compiled
program that (1) evaluates the binby expressions, (2) fuses all binners into
a single flat cell index, and (3) scatter-updates every aggregator's grid —
all inside one ``jax.jit`` so XLA fuses expression eval, binning and
accumulation into a single pass over the chunk in HBM.

Edge-slot layouts are bit-compatible with the reference so ``edges=True``
semantics and integer aggregates match exactly:

* BinnerScalar  (binners.cpp:27-36):  ``[nan, under, bin0..binN-1, over]``,
  shape N+3; ``edges=False`` slices ``[2:-1]`` (agg.py:328-336).
* BinnerOrdinal (binner_ordinal.cpp:11): ``[bin0..binN-1, (other), null, nan]``,
  shape N+2 (+1 with other); ``edges=False`` slices ``[0:-2]``.

Rows excluded by the filter/selection or chunk padding are routed to one
extra **void cell** appended at flat index ``grid_size``; it is dropped when
results are fetched.  This keeps shapes static (no host-side compaction, no
dynamic shapes) — the TPU translation of the reference's pre-filtering
(execution.py:516-522).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import utils
from ..datatype import DataType


# ---------------------------------------------------------------------------
# binner descriptors (host side, encodable)
# ---------------------------------------------------------------------------

class BinnerBase:
    def __eq__(self, other):
        return type(self) is type(other) and self._key() == other._key()

    def __hash__(self):
        return hash((type(self).__name__,) + tuple(str(k) for k in self._key()))

    def fingerprint(self):
        return utils.fingerprint(type(self).__name__, [str(k) for k in self._key()])

    def __repr__(self):
        return f"{type(self).__name__}{self._key()!r}"


class BinnerScalar(BinnerBase):
    """Reference: vaex/dataframe.py:7282 + src/binners.cpp."""

    snake_name = "scalar"

    def __init__(self, expression, minimum, maximum, count):
        self.expression = str(expression)
        self.minimum = float(minimum)
        self.maximum = float(maximum)
        self.count = int(count)

    def _key(self):
        return (self.expression, self.minimum, self.maximum, self.count)

    @property
    def shape(self):
        return self.count + 3

    def edges_slice(self):
        return slice(2, -1)

    def to_bins(self, values, invalid):
        """values: jnp array; invalid: bool mask or None. Returns int32 bins.

        Mirrors binners.cpp:13-58: nan/masked→0, under→1, data→[2, N+2),
        over→N+2.  The C cast `(int)(scaled*bins)` truncates toward zero;
        scaled>=0 here so floor == trunc.
        """
        v = values.astype(jnp.float64)
        scale = 1.0 / (self.maximum - self.minimum)
        scaled = (v - self.minimum) * scale
        idx = (scaled * self.count).astype(jnp.int32) + 2
        idx = jnp.where(scaled < 0, 1, idx)
        idx = jnp.where(scaled >= 1, self.count + 2, idx)
        bad = jnp.isnan(scaled)
        if invalid is not None:
            bad = bad | invalid
        return jnp.where(bad, 0, idx)

    def encode(self, encoding):
        return dict(type=self.snake_name, expression=self.expression,
                    minimum=self.minimum, maximum=self.maximum, count=self.count)

    @classmethod
    def decode(cls, encoding, spec):
        return cls(spec["expression"], spec["minimum"], spec["maximum"], spec["count"])


class BinnerOrdinal(BinnerBase):
    """Reference: vaex/dataframe.py:7313 + src/binner_ordinal.cpp."""

    snake_name = "ordinal"

    def __init__(self, expression, count, minimum=0, allow_other=False, invert=False):
        self.expression = str(expression)
        self.count = int(count)
        self.minimum = int(minimum)
        self.allow_other = bool(allow_other)
        self.invert = bool(invert)

    def _key(self):
        return (self.expression, self.count, self.minimum, self.allow_other, self.invert)

    @property
    def shape(self):
        return self.count + (3 if self.allow_other else 2)

    def edges_slice(self):
        return slice(0, -2)

    def to_bins(self, values, invalid):
        """Mirrors binner_ordinal.cpp:21-170 (all four branches)."""
        n = self.count
        if jnp.issubdtype(values.dtype, jnp.floating):
            isnan = jnp.isnan(values)
            v = jnp.where(isnan, 0, values).astype(jnp.int64) - self.minimum
        else:
            isnan = None
            v = values.astype(jnp.int64) - self.minimum
        oor = (v < 0) | (v >= n)
        data_idx = jnp.clip(v, 0, n - 1)
        if self.invert:
            data_idx = n - 1 - data_idx
        idx = data_idx.astype(jnp.int32)
        if self.allow_other:
            idx = jnp.where(oor, n, idx)
            if invalid is not None:
                idx = jnp.where(invalid, n + 1, idx)
            if isnan is not None:
                idx = jnp.where(isnan, n + 2, idx)
        else:
            bad = oor if invalid is None else (oor | invalid)
            idx = jnp.where(bad, n, idx)
            if isnan is not None:
                idx = jnp.where(isnan, n + 1, idx)
        return idx

    def encode(self, encoding):
        return dict(type=self.snake_name, expression=self.expression, count=self.count,
                    minimum=self.minimum, allow_other=self.allow_other, invert=self.invert)

    @classmethod
    def decode(cls, encoding, spec):
        return cls(spec["expression"], spec["count"], spec.get("minimum", 0),
                   spec.get("allow_other", False), spec.get("invert", False))


def decode_binner(spec):
    types = {"scalar": BinnerScalar, "ordinal": BinnerOrdinal}
    return types[spec["type"]].decode(None, spec)


def grid_shape(binners):
    return tuple(b.shape for b in binners)


def flat_index(binners, bin_indices):
    """Combine per-binner indices into one flat C-order cell index with
    binners[0] outermost — the jnp analogue of Grid::bin_'s
    ``index += bin*stride`` accumulation (agg.hpp:84-143)."""
    if not binners:
        return None
    shape = grid_shape(binners)
    strides = np.ones(len(shape), dtype=np.int64)
    for i in range(len(shape) - 2, -1, -1):
        strides[i] = strides[i + 1] * shape[i + 1]
    flat = bin_indices[0].astype(jnp.int32) * np.int32(strides[0])
    for idx, stride in zip(bin_indices[1:], strides[1:]):
        flat = flat + idx.astype(jnp.int32) * np.int32(stride)
    return flat


# ---------------------------------------------------------------------------
# aggregation ops (device): init / update / merge / finalize
# ---------------------------------------------------------------------------

def _acc_dtype_for_sum(data_dtype):
    """agg_sum.cpp:7-60 upcast table."""
    dt = DataType(np.dtype(data_dtype))
    return dt.upcast().numpy


class AggOp:
    """One primitive grid aggregator.  State is a pytree of jnp arrays with a
    flat length of grid_size+1 (the +1 is the void cell)."""

    needs_value = True

    def __init__(self, data_dtype=None):
        self.data_dtype = np.dtype(data_dtype) if data_dtype is not None else None

    def init(self, ncells):
        raise NotImplementedError

    def update(self, state, idx, value, include, order_key=None):
        """idx: int32 [L] flat cell index (void-routed already); value: jnp
        [L] or None; include: bool [L]."""
        raise NotImplementedError

    def merge(self, state, other):
        return jax.tree_util.tree_map(jnp.add, state, other)

    def finalize(self, state):
        """Host-side: state (numpy) → raw grid array of length ncells (void
        dropped by caller)."""
        return state


class AggOpCount(AggOp):
    """agg_count.cpp: counts rows with valid (non-missing, non-nan) value;
    with no argument counts all rows."""

    def __init__(self, data_dtype=None):
        super().__init__(data_dtype)
        self.needs_value = data_dtype is not None

    def init(self, ncells):
        return jnp.zeros(ncells + 1, dtype=jnp.int64)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        return state.at[routed].add(1)


class AggOpSum(AggOp):
    def init(self, ncells):
        return jnp.zeros(ncells + 1, dtype=_acc_dtype_for_sum(self.data_dtype))

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        acc = state.dtype
        v = jnp.where(include, value, 0).astype(acc)
        return state.at[routed].add(v)


class AggOpSumMoment(AggOp):
    """agg_sum.cpp AggSumMomentPrimitive: sum of value**moment."""

    def __init__(self, data_dtype=None, moment=2):
        super().__init__(data_dtype)
        self.moment = moment

    def init(self, ncells):
        return jnp.zeros(ncells + 1, dtype=jnp.float64)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        v = jnp.where(include, value, 0).astype(jnp.float64)
        return state.at[routed].add(v ** self.moment)


class AggOpMin(AggOp):
    def _sentinel(self):
        dt = np.dtype(self.data_dtype)
        if dt.kind == "f":
            return np.array(np.inf, dtype=dt)
        if dt.kind in "mM":
            return np.array(np.iinfo(np.int64).max, dtype=np.int64)
        return np.array(np.iinfo(dt).max, dtype=dt)

    def init(self, ncells):
        dt = np.dtype(self.data_dtype)
        if dt.kind in "mM":
            dt = np.dtype(np.int64)
        return jnp.full(ncells + 1, self._sentinel(), dtype=dt)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        v = jnp.where(include, value, self._sentinel()).astype(state.dtype)
        return state.at[routed].min(v)

    def merge(self, state, other):
        return jnp.minimum(state, other)


class AggOpMax(AggOp):
    def _sentinel(self):
        dt = np.dtype(self.data_dtype)
        if dt.kind == "f":
            return np.array(-np.inf, dtype=dt)
        if dt.kind in "mM":
            return np.array(np.iinfo(np.int64).min, dtype=np.int64)
        return np.array(np.iinfo(dt).min, dtype=dt)

    def init(self, ncells):
        dt = np.dtype(self.data_dtype)
        if dt.kind in "mM":
            dt = np.dtype(np.int64)
        return jnp.full(ncells + 1, self._sentinel(), dtype=dt)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        v = jnp.where(include, value, self._sentinel()).astype(state.dtype)
        return state.at[routed].max(v)

    def merge(self, state, other):
        return jnp.maximum(state, other)


_ORDER_SENTINEL = np.iinfo(np.int64).max


class AggOpFirst(AggOp):
    """agg_first.cpp: value at the smallest order key per cell (first);
    `last` uses negated order keys.

    Two-phase per chunk: (1) scatter-min the order key per cell, (2) rows
    whose key equals the per-cell winner write their value — exactly one row
    per cell wins since keys are unique row numbers.
    """

    def __init__(self, data_dtype=None, inverted=False):
        super().__init__(data_dtype)
        self.inverted = inverted

    def init(self, ncells):
        dt = np.dtype(self.data_dtype)
        if dt.kind in "mM":
            dt = np.dtype(np.int64)
        fill = np.zeros((), dtype=dt)
        return (jnp.full(ncells + 1, _ORDER_SENTINEL, dtype=jnp.int64),
                jnp.full(ncells + 1, fill, dtype=dt))

    def update(self, state, idx, value, include, order_key=None):
        best_order, best_value = state
        n = best_order.shape[0]
        routed = jnp.where(include, idx, n - 1)
        key = jnp.where(include, order_key, _ORDER_SENTINEL)
        new_best = best_order.at[routed].min(key)
        # rows that set the new per-cell best this chunk
        winner = include & (key == new_best[routed]) & (key != _ORDER_SENTINEL)
        routed2 = jnp.where(winner, routed, n - 1)
        new_value = best_value.at[routed2].set(jnp.asarray(value).astype(best_value.dtype))
        # cells whose winner did NOT change keep old value: at[].set above may
        # have overwritten only won cells; rows with equal key can't exist
        return (new_best, new_value)

    def merge(self, state, other):
        bo, bv = state
        oo, ov = other
        take_other = oo < bo
        return (jnp.where(take_other, oo, bo), jnp.where(take_other, ov, bv))

    def finalize(self, state):
        return state[1]


def make_agg_op(short_name, data_dtype=None, **kwargs):
    table = {
        "count": AggOpCount,
        "sum": AggOpSum,
        "summoment": AggOpSumMoment,
        "min": AggOpMin,
        "max": AggOpMax,
        "first": AggOpFirst,
    }
    return table[short_name](data_dtype, **kwargs)
