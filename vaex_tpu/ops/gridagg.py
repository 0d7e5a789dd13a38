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

    def to_bins(self, values, invalid, limits=None):
        """values: jnp array; invalid: bool mask or None. Returns int32 bins.

        Mirrors binners.cpp:13-58: nan/masked→0, under→1, data→[2, N+2),
        over→N+2.  The C cast `(int)(scaled*bins)` truncates toward zero;
        scaled>=0 here so floor == trunc.

        Bin arithmetic runs in the input's own float width for <=32-bit
        inputs under precision='mixed' (f64 emulation makes the remote XLA
        compile ~20x slower and the VPU path slower); f64 inputs — and
        precision='float64' parity mode — use double like the reference.

        limits: optional traced f64 [2] array (min, max).  When given, the
        limit VALUES are runtime arguments instead of trace-time constants —
        the compiled pass is reusable across data-derived limits (each fresh
        minmax pair otherwise pays a full remote XLA recompile; see
        execution._binner_slots).  The arithmetic matches the static path:
        diff in f64, then cast to the bin float width.
        """
        from .. import settings
        use_f64 = (values.dtype == jnp.float64) or settings.compute.precision == "float64"
        ftype = jnp.float64 if use_f64 else jnp.float32
        v = values.astype(ftype)
        if limits is not None:
            minimum = limits[0].astype(ftype)
            width = (limits[1] - limits[0]).astype(ftype)
        else:
            minimum = ftype(self.minimum)
            width = ftype(self.maximum - self.minimum)
        if use_f64:
            # reference op order (binners.cpp:16,24: scale_v = 1/(vmax-vmin),
            # scaled = (v - vmin) * scale_v) for bitwise f64 parity
            scaled = (v - minimum) * (ftype(1.0) / width)
            idx = (scaled * ftype(self.count)).astype(jnp.int32) + 2
            idx = jnp.where(scaled < 0, 1, idx)
            idx = jnp.where(scaled >= 1, self.count + 2, idx)
        else:
            # f32: the bin index must satisfy i*width <= (v-min)*count <
            # (i+1)*width.  A division-based floor((v-min)/width*count) is
            # NOT edge-exact on TPU: the chip's f32 divide can come out one
            # ULP below the correctly-rounded quotient, so integer data on
            # integer bin edges ((k/N)*N) truncates into the previous bin
            # (zeroed bins / doubled neighbours; the CPU XLA lowering
            # happened to round the other way, which is why the suite only
            # caught this on real hardware).  Compute a candidate by
            # division, then SNAP it with multiply-only comparisons — a
            # single f32 multiply is correctly rounded on both backends, so
            # the decisive comparison never involves the divide.
            t = (v - minimum) * ftype(self.count)
            scaled = t / width
            cand = scaled.astype(jnp.int32)  # trunc; in-range t>=0
            cand = cand + ((cand.astype(ftype) + 1) * width <= t).astype(jnp.int32)
            cand = cand - (cand.astype(ftype) * width > t).astype(jnp.int32)
            idx = cand + 2
            idx = jnp.where(t < 0, 1, idx)
            idx = jnp.where(t >= width * ftype(self.count), self.count + 2, idx)
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

    def __init__(self, expression, count, minimum=0, allow_other=False, invert=False,
                 assume_in_range=False):
        self.expression = str(expression)
        self.count = int(count)
        self.minimum = int(minimum)
        self.allow_other = bool(allow_other)
        self.invert = bool(invert)
        # True when the producer guarantees every unmasked value lies in
        # [minimum, minimum+count) — e.g. GrouperIntRange, whose bounds come
        # from the data's own minmax.  Lets 64-bit keys bin with a plain
        # i32 narrowing convert instead of emulated-i64 subtract+clip
        # (values outside the guarantee may alias, so this is opt-in).
        self.assume_in_range = bool(assume_in_range)

    def _key(self):
        return (self.expression, self.count, self.minimum, self.allow_other, self.invert,
                self.assume_in_range)

    @property
    def shape(self):
        return self.count + (3 if self.allow_other else 2)

    def edges_slice(self):
        return slice(0, -2)

    def in_range32(self):
        """True when the i32-narrowing fast branch applies — a STRUCTURAL
        property: it must be part of the compiled-program key when `minimum`
        itself is a runtime argument (execution._structural_binner_spec)."""
        return (self.assume_in_range
                and -2**31 <= self.minimum and self.minimum + self.count < 2**31)

    def to_bins(self, values, invalid, minimum=None):
        """Mirrors binner_ordinal.cpp:21-170 (all four branches).

        minimum: optional traced i64 scalar — the runtime-argument analogue
        of self.minimum (see BinnerScalar.to_bins limits); branch SELECTION
        still comes from the host-side self.minimum via in_range32()."""
        n = self.count
        dyn = minimum is not None
        # ordinal codes fit in int32 (bin counts < 2^31); 64-bit inputs are
        # range-clamped first so the downcast is safe
        if jnp.issubdtype(values.dtype, jnp.floating):
            isnan = jnp.isnan(values)
            v = jnp.where(isnan, 0, values)
            if v.dtype == jnp.float64:
                v = v.astype(jnp.int64)
        else:
            isnan = None
            v = values
        if v.dtype in (jnp.int64, jnp.uint64, jnp.float64):
            if self.in_range32():
                # guaranteed-in-range values fit i32 exactly; excluded rows
                # may alias after the narrowing convert but their bin is
                # clipped and masked by the include routing anyway
                m32 = minimum.astype(jnp.int32) if dyn else np.int32(self.minimum)
                v = v.astype(jnp.int32) - m32
            else:
                m64 = minimum.astype(jnp.int64) if dyn else np.int64(self.minimum)
                shifted = v.astype(jnp.int64) - m64
                v = jnp.clip(shifted, -1, n).astype(jnp.int32)
        else:
            m32 = minimum.astype(jnp.int32) if dyn else np.int32(self.minimum)
            v = v.astype(jnp.int32) - m32
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
                    minimum=self.minimum, allow_other=self.allow_other, invert=self.invert,
                    assume_in_range=self.assume_in_range)

    @classmethod
    def decode(cls, encoding, spec):
        return cls(spec["expression"], spec["count"], spec.get("minimum", 0),
                   spec.get("allow_other", False), spec.get("invert", False),
                   spec.get("assume_in_range", False))


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
    flat length of grid_size+1 (the +1 is the void cell).

    Accumulation is **two-level** when precision='mixed' (default): each chunk
    scatter-updates a fresh 32-bit *partial* grid (TPU scatters on 32-bit
    elements are ~13x faster than emulated 64-bit, measured on v5e), which is
    then folded densely into the 64-bit *master* grid inside the same compiled
    step.  Counts stay exact (chunk rows < 2^31); float sums keep near-f64
    accuracy (per-cell f32 partial of one chunk, f64 across chunks).
    precision='float64' forces direct 64-bit scatters (bit-exact reference
    parity, agg_sum.cpp upcast semantics); 'float32' keeps masters in f32.
    """

    needs_value = True

    def __init__(self, data_dtype=None, precision=None):
        from .. import settings
        self.data_dtype = np.dtype(data_dtype) if data_dtype is not None else None
        self.precision = precision or settings.compute.precision

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

    def finalize_device(self, state):
        """Device-side finalize for keep_device tasks (groupby result frames
        stay on device): return a jax array, or None when this op needs host
        post-processing (f64 minmax key decode)."""
        return state


class AggOpCount(AggOp):
    """agg_count.cpp: counts rows with valid (non-missing, non-nan) value;
    with no argument counts all rows."""

    def __init__(self, data_dtype=None, precision=None):
        super().__init__(data_dtype, precision)
        self.needs_value = data_dtype is not None

    def init(self, ncells):
        if self.precision == "float32":
            dt = jnp.int32
        elif (self.precision == "mixed"
              and getattr(self, "rows_upper_bound", None) is not None
              and self.rows_upper_bound < 2**31):
            # counts are bounded by total rows: int32 state is exact, halves
            # both the per-chunk master update and the D2H result transfer
            dt = jnp.int32
        else:
            dt = jnp.int64
        return jnp.zeros(ncells + 1, dtype=dt)

    def update(self, state, idx, value, include, order_key=None):
        ncells1 = state.shape[0]
        routed = jnp.where(include, idx, ncells1 - 1)
        if ncells1 == 2:
            return state.at[0].add(jnp.sum(include.astype(jnp.int32)).astype(state.dtype))
        if self.precision == "mixed" or (
                self.precision == "float64"
                and jax.default_backend() in EXACT_LIMB_BACKENDS):
            # _partial_scatter also routes small grids to the one-hot
            # compare+reduce strategy (no scatter at all).  int32 partials
            # are EXACT (chunk rows < 2^31), so parity mode takes them too:
            # the emulated i64 scatter is ~13x slower for identical results
            partial = _partial_scatter(routed, jnp.ones(routed.shape, jnp.int32), ncells1, jnp.int32)
            return state + partial.astype(state.dtype)
        return state.at[routed].add(1)

    def finalize(self, state):
        out = super().finalize(state)
        # int32 state is an internal exactness-preserving optimization; the
        # public count dtype stays int64 (reference agg_count.cpp)
        if np.asarray(out).dtype == np.int32:
            out = np.asarray(out).astype(np.int64)
        return out

    def finalize_device(self, state):
        return state.astype(jnp.int64) if state.dtype == jnp.int32 else state


def _segment_sum_sorted(state, routed, values):
    """Exact segment sums without scatter: sort rows by cell, cumsum, and
    difference the per-cell boundaries.  On TPU, 64-bit scatters are
    emulated and ~10x slower than sort+cumsum (measured: 527ms vs 56ms for
    8M int64 rows) — this is the bit-exact int64/uint64 accumulation path."""
    sb, sv = jax.lax.sort((routed, values), num_keys=1)
    cum = jnp.cumsum(sv)
    ncells1 = state.shape[0]
    cells = jax.lax.broadcasted_iota(jnp.int32, (ncells1, 1), 0).squeeze(-1)
    ends = jnp.searchsorted(sb, cells, side="right")
    cum0 = jnp.concatenate([jnp.zeros(1, cum.dtype), cum])
    totals = cum0[ends]
    partial = totals - jnp.concatenate([jnp.zeros(1, totals.dtype), totals[:-1]])
    return state + partial


def _segment_minmax_sorted(state, routed, values, sentinel, is_min):
    """Segment min/max via 2-key sort: per-cell extreme = first/last payload
    in the (cell, value)-sorted order.  Used for 64-bit dtypes where
    scatter-min/max is emulated (measured ~1.04s vs ~0.1s per 8M rows)."""
    sb, sv = jax.lax.sort((routed, values), num_keys=2)
    ncells1 = state.shape[0]
    cells = jax.lax.broadcasted_iota(jnp.int32, (ncells1, 1), 0).squeeze(-1)
    starts = jnp.searchsorted(sb, cells, side="left")
    ends = jnp.searchsorted(sb, cells, side="right")
    n = sv.shape[0]
    picked = sv[jnp.clip(starts, 0, n - 1)] if is_min else sv[jnp.clip(ends - 1, 0, n - 1)]
    has = ends > starts
    cand = jnp.where(has, picked, sentinel)
    return jnp.minimum(state, cand) if is_min else jnp.maximum(state, cand)


# ---------------------------------------------------------------------------
# exact float sums on TPU: multi-limb integer fixed point
# (precision='float64' fast path, VERDICT r4 #5)
#
# On this TPU generation f64 is EMULATED as an f32 double-double (~2^-48
# relative; the verify notes' "1-2 ulp comparison noise" and the lossy f64
# H2D are the same root cause), and emulated f64 scatters run 7.9M rows/s —
# so "accumulate in f64 on device" can neither be exact nor fast.  i64
# arithmetic IS exact on TPU (x64 rewriter), so parity-mode float sums ride
# a fixed-point representation instead: each value |v| = M * 2^P decomposes
# into 32-bit digit limbs positioned against a running per-grid anchor
# window, the limbs accumulate exactly in int64 (sort by cell + one cumsum
# per limb row, the _segment_sum_sorted strategy), and the f64 result is
# reconstructed ON HOST at finalize (host f64 is real IEEE binary64).
#
# Accuracy: per cell the sum of every value within 2^(32*rows-84) of the
# running max (f32 inputs: 2^73; f64: 2^76) is EXACT — digits below the
# window truncate, bounded by n_cell * 2^bottom, astronomically below one
# ulp of the result.  The final host reconstruction rounds once (<= 1 ulp).
# That is strictly tighter than the reference's sequential f64 adds
# (agg_sum.cpp), whose error is ~n*eps*max|partial|; results are
# bit-identical to sequential f64 whenever the sequential sum is exact.
# +-inf rides a separate f64 spill grid (rare chunks, lax.cond-gated);
# NaN values are skipped like the reference (agg_sum.cpp:98-126).
# ---------------------------------------------------------------------------

_LIMB_INIT_BOTTOM = -(1 << 62)      # fresh-state anchor sentinel (x32 aligned)
_LIMB_MASK32 = np.int64(0xFFFFFFFF)
# backends that take the limb path for precision='float64' float sums;
# tests add "cpu" to exercise the machinery on the virtual mesh
EXACT_LIMB_BACKENDS = {"tpu"}

# backends whose high-cardinality min/max takes the sort-based paths
# (scatter-min/max is native-fast on CPU); tests add "cpu" for coverage
SORTED_MINMAX_BACKENDS = {"tpu"}


def _limb_digit_rows(data_dtype):
    """f32 mantissas (24 bits) get a 128-bit window; f64 (53) gets 160."""
    return 4 if np.dtype(data_dtype).itemsize <= 4 else 5


def _use_exact_limbs(data_dtype, precision):
    return (precision == "float64"
            and np.dtype(data_dtype).kind == "f"
            and jax.default_backend() in EXACT_LIMB_BACKENDS)


def _decode_float_bits(value):
    """Device value -> (M, P, neg, inf): |v| = M * 2^P EXACTLY, M >= 0 i64.

    Accepts float32 (native 32-bit bitcast), int64 (f64 bit patterns shipped
    from host by functions._f64_sum_bits — the only lossless way f64 data
    reaches the chip), or float64 (device-computed dd values: the canonical
    bit pattern via the narrowing f64->u32[2] bitcast, same as _f64_to_key).
    NaNs decode to M=0 (the aggregation skips them, reference
    agg_sum.cpp:98-126); +-inf rows flag `inf` for the spill branch."""
    if value.dtype == jnp.int64:
        bits = value
        e = ((bits >> 52) & 0x7FF).astype(jnp.int32)
        frac = bits & ((np.int64(1) << 52) - 1)
        M = frac | jnp.where(e > 0, np.int64(1) << 52, np.int64(0))
        P = jnp.maximum(e, 1) - 1075
        neg = bits < 0
        special = e == 0x7FF
    elif value.dtype == jnp.float64:
        lohi = jax.lax.bitcast_convert_type(value, jnp.uint32)
        hi = lohi[..., 1].astype(jnp.int64)   # NONNEGATIVE (u32 -> i64):
        lo = lohi[..., 0].astype(jnp.int64)   # the sign lives in bit 31
        e = ((hi >> 20) & 0x7FF).astype(jnp.int32)
        frac = ((hi & 0xFFFFF) << 32) | lo
        M = frac | jnp.where(e > 0, np.int64(1) << 52, np.int64(0))
        P = jnp.maximum(e, 1) - 1075
        neg = (hi >> 31) != 0
        special = e == 0x7FF
    else:
        b = jax.lax.bitcast_convert_type(value.astype(jnp.float32), jnp.int32)
        e = (b >> 23) & 0xFF
        frac = (b & 0x7FFFFF).astype(jnp.int64)
        M = frac | jnp.where(e > 0, np.int64(1) << 23, np.int64(0))
        P = jnp.maximum(e, 1) - 150
        neg = b < 0
        special = e == 0xFF
    inf = special & (frac == 0) & (M != 0)
    M = jnp.where(special, np.int64(0), M)
    return M, P.astype(jnp.int32), neg, inf


def _limb_renorm(limbs):
    """Carry-propagate raw signed i64 row sums to digits in [0, 2^32) plus a
    signed top row — exact (i64 two's-complement identities)."""
    rows = []
    carry = jnp.zeros_like(limbs[0])
    for j in range(limbs.shape[0] - 1):
        s = limbs[j] + carry
        rows.append(s & _LIMB_MASK32)
        carry = s >> 32          # arithmetic shift: floor, handles negatives
    rows.append(limbs[-1] + carry)
    return jnp.stack(rows)


def _limb_shift_down(limbs, q):
    """Drop the lowest q digit rows (the window anchor moved up by 32*q bits).
    The dropped digits are below the new window — the documented truncation.
    q is a traced scalar; rows select statically."""
    R = limbs.shape[0]
    q = jnp.clip(q, 0, R)
    out = []
    for i in range(R):
        acc = jnp.zeros_like(limbs[0])
        for c in range(R):
            if i + c < R:
                acc = jnp.where(q == c, limbs[i + c], acc)
        out.append(acc)
    return jnp.stack(out)


def _limb_row_digits(M, t, j):
    """digit_j = floor(M * 2^t / 2^(32j)) mod 2^32, overflow-free in i64.
    M >= 0 (53 bits max), t >= 0."""
    sh_r = 32 * j - t
    d_r = jnp.where(sh_r >= 63, np.int64(0), M >> jnp.clip(sh_r, 0, 63))
    sh_l = t - 32 * j
    d_l = jnp.where(sh_l >= 32, np.int64(0),
                    (M & _LIMB_MASK32) << jnp.clip(sh_l, 0, 31))
    return jnp.where(sh_r >= 0, d_r, d_l) & _LIMB_MASK32


def _limb_chunk_sums(routed, streams, n_rows, ncells1, sorted_arrays=None):
    """Per-cell digit-row sums for one chunk: [n_rows+1, ncells1] raw i64.

    streams: [(M, P, neg)] decoded value streams (already zeroed for
    excluded rows).  Strategy mirrors _segment_sum_sorted: ONE sort by cell
    (payload = the packed stream inputs via `sorted_arrays` hook), then one
    i64 cumsum + boundary diff per digit row.  Scalar grids (ncells1 == 2)
    skip the sort and tree-reduce each row."""
    if ncells1 == 2:
        rows = []
        for j in range(n_rows):
            total = jnp.zeros((), jnp.int64)
            for (M, t, neg) in streams:
                d = _limb_row_digits(M, t, j)
                total = total + jnp.sum(jnp.where(neg, -d, d))
            rows.append(jnp.stack([total, jnp.zeros((), jnp.int64)]))
        rows.append(jnp.zeros(2, jnp.int64))
        return jnp.stack(rows)
    cells = jax.lax.broadcasted_iota(jnp.int32, (ncells1, 1), 0).squeeze(-1)
    sk = sorted_arrays[0]
    ends = jnp.searchsorted(sk, cells, side="right")
    starts = jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])
    rows = []
    for j in range(n_rows):
        digit = jnp.zeros(sk.shape, jnp.int64)
        for (M, t, neg) in streams:
            d = _limb_row_digits(M, t, j)
            digit = digit + jnp.where(neg, -d, d)
        cum = jnp.cumsum(digit)
        cum0 = jnp.concatenate([jnp.zeros(1, cum.dtype), cum])
        rows.append(cum0[ends] - cum0[starts])
    rows.append(jnp.zeros(ncells1, jnp.int64))
    return jnp.stack(rows)


def _exact_limb_update(state, idx, raw_values, include, mbits_list,
                       transform=None):
    """One chunk of the exact limb accumulation.

    raw_values: device arrays (f32 / i64-bits / dd-f64) — one per stream;
    transform: optional per-value map applied before decoding (moments)."""
    limbs, bottom, spill = state["limbs"], state["bottom"], state["spill"]
    n_rows = limbs.shape[0] - 1
    ncells1 = limbs.shape[1]
    routed = jnp.where(include, idx, ncells1 - 1)

    # zero excluded rows BEFORE anything else: their magnitudes must affect
    # neither the window anchor nor the digits
    zeroed = []
    for v in raw_values:
        if transform is not None:
            v = transform(v)
        zeroed.append(jnp.where(include, v, jnp.zeros((), v.dtype)))

    if ncells1 == 2:
        sorted_vals = zeroed
        sk = None
    else:
        sk, *sorted_vals = jax.lax.sort((routed, *zeroed), num_keys=1)

    decoded = [_decode_float_bits(v) for v in sorted_vals]
    # window anchor: highest occupied bit across streams, x32-aligned
    chunk_top = jnp.full((), -(1 << 30), jnp.int32)
    for (M, P, neg, inf), mb in zip(decoded, mbits_list):
        row_top = jnp.where(M > 0, P + mb, -(1 << 30))
        chunk_top = jnp.maximum(chunk_top, jnp.max(row_top))
    needed = ((chunk_top.astype(jnp.int64) + 1 - 32 * n_rows + 31) // 32) * 32
    new_bottom = jnp.maximum(bottom, jnp.broadcast_to(needed, bottom.shape))
    nb = new_bottom[0]

    streams = []
    any_inf = jnp.zeros((), bool)
    for (M, P, neg, inf) in decoded:
        t = P - nb.astype(jnp.int32)
        Mq = jnp.where(t < 0, M >> jnp.clip(-t, 0, 63), M)
        streams.append((Mq, jnp.maximum(t, 0), neg))
        any_inf = any_inf | jnp.any(inf)

    chunk = _limb_chunk_sums(routed, streams, n_rows, ncells1,
                             sorted_arrays=(sk,))
    shifted = _limb_shift_down(limbs, (nb - bottom[0]) >> 5)
    new_limbs = _limb_renorm(shifted + chunk)

    # +-inf spill: scatter only when the chunk actually has infinities
    def add_inf(sp):
        contrib = jnp.zeros(routed.shape, jnp.float64)
        for (M, P, neg, inf) in decoded:
            v_inf = jnp.where(inf, jnp.where(neg, -jnp.inf, jnp.inf), 0.0)
            contrib = contrib + v_inf
        if ncells1 == 2:
            return sp.at[0].add(jnp.sum(contrib))
        return sp.at[sk].add(contrib)

    new_spill = jax.lax.cond(any_inf, add_inf, lambda sp: sp, spill)
    return dict(limbs=new_limbs, bottom=new_bottom, spill=new_spill)


def _exact_limb_merge(a, b):
    nb = jnp.maximum(a["bottom"], b["bottom"])
    la = _limb_shift_down(a["limbs"], (nb[0] - a["bottom"][0]) >> 5)
    lb = _limb_shift_down(b["limbs"], (nb[0] - b["bottom"][0]) >> 5)
    return dict(limbs=_limb_renorm(la + lb), bottom=nb,
                spill=a["spill"] + b["spill"])


def _exact_limb_finalize(state):
    """Host reconstruction: exact digits -> f64 via compensated Horner.
    Host f64 is real IEEE binary64; the single final rounding is <= 1 ulp."""
    limbs = np.asarray(state["limbs"], np.int64)
    bottom = int(np.asarray(state["bottom"]).reshape(-1)[0])
    spill = np.asarray(state["spill"], np.float64)
    if bottom <= _LIMB_INIT_BOTTOM:
        return spill        # never saw data
    # renorm in numpy (exact): digits in [0, 2^32) + signed top
    rows = []
    carry = np.zeros(limbs.shape[1], np.int64)
    for j in range(limbs.shape[0] - 1):
        s = limbs[j] + carry
        rows.append(s & np.int64(0xFFFFFFFF))
        carry = s >> 32
    top = limbs[-1] + carry
    # dd Horner from the top: top split exactly (|top| can exceed 2^53)
    hi = (top >> 26).astype(np.float64) * float(1 << 26)
    hi = hi + (top - ((top >> 26) << 26)).astype(np.float64)
    lo = np.zeros_like(hi)
    for d in rows[::-1]:
        hi *= 4294967296.0
        lo *= 4294967296.0
        df = d.astype(np.float64)          # < 2^32: exact
        s = hi + df                        # branch-free two-sum: s + err
        bb = s - hi                        # == hi + df exactly
        err = (hi - (s - bb)) + (df - bb)
        hi, lo = s, lo + err
    bclip = max(min(bottom, 2000), -2000)  # real exponents are in range;
    out = np.ldexp(hi, bclip) + np.ldexp(lo, bclip)
    return out + spill


def _sum_partial_dtype(data_dtype, acc_dtype):
    """32-bit partial dtype when exact/accurate per chunk, else None
    (direct accumulation into the master)."""
    dt = np.dtype(data_dtype)
    if dt.kind == "f" and dt.itemsize <= 4:
        return np.dtype("float32")
    if dt.kind == "b":
        # values ∈ {0,1}, chunk rows < 2^31 → partial sums exact in int32
        return np.dtype("int32")
    return None



_F64_KEY_MASK = np.int64(0x7FFFFFFFFFFFFFFF)


def _f64_to_key(values):
    """f64 → order-preserving SIGNED i64 key, exact on TPU.

    TPU f64 *comparisons* are emulated and carry ~1-2 ulp noise, and the x64
    rewriter has no 64-bit bitcast-converts (neither f64→s64 nor anything
    producing u64); but a narrowing bitcast f64→u32[..., 2] IS supported and
    i64 shifts/or/xor/compares are exact.  So: reassemble the bit pattern
    into an i64 with pure integer arithmetic, then apply the classic signed
    total-order transform (negatives get their non-sign bits flipped) — i64
    ordering then equals float ordering, so min/max on keys are
    bitwise-exact (VERDICT r1 item 10)."""
    lohi = jax.lax.bitcast_convert_type(values.astype(jnp.float64), jnp.uint32)
    hi = lohi[..., 1].astype(jnp.int64)
    lo = lohi[..., 0].astype(jnp.int64)
    b = (hi << 32) | lo  # the f64 bit pattern in an i64 container (mod 2^64)
    return jnp.where(b < 0, b ^ _F64_KEY_MASK, b)


def _key_to_f64(keys):
    """Host-side inverse of _f64_to_key (numpy)."""
    keys = np.asarray(keys, dtype=np.int64)
    bits = np.where(keys < 0, keys ^ _F64_KEY_MASK, keys)
    return bits.astype(np.int64).view(np.float64)


def _f64_key_host(x):
    """Host-side forward transform of one f64 (sentinels: key of +/-inf)."""
    b = np.float64(x).view(np.int64)
    return np.int64(b ^ _F64_KEY_MASK) if b < 0 else np.int64(b)


def _onehot_cell_limit():
    """One-hot compare+reduce beats scatter up to ~8192 cells on TPU (VPU
    loves the fused compare+tree-reduce; scatters serialize).  On CPU the
    opposite holds everywhere: XLA CPU scatter runs ~50M rows/s single-core
    while the [rows, cells] compare amplifies work `cells`-fold (measured
    5M rows/s at just 19 cells, 10x slower than scatter) — scatter always."""
    return 8192 if jax.default_backend() == "tpu" else 0


def _partial_scatter(routed, contrib, ncells1, pdt):
    """Per-chunk partial accumulation, strategy by grid size.

    - <=8192 cells: one-hot compare + column tree-reduction — XLA fuses it
      without materializing [rows, cells]; measured 4x faster than scatter at
      small grids (24ms vs 98ms per 8M rows), still ahead at 8k cells
      (180ms vs 201ms), AND more accurate (tree reduce per cell).
    - mid-size grids: scatter into row-sliced replica rows (divides per-slot
      add counts, bounding f32 accumulation error).
    - large grids: plain scatter (per-cell counts are small anyway).
    Scalar aggregations (one cell) never reach here — they use a dense tree
    reduction directly."""
    L = routed.shape[0]
    if ncells1 <= _onehot_cell_limit():
        if np.dtype(pdt).kind == "f" and L % 8192 == 0 and L > 8192:
            # two-level: f32 tree-reduce per 8192-row block, then fold the
            # [blocks, cells] partials in f64 — bounds the f32 accumulation
            # error to one block (~100x better than a single full-column
            # reduce at 8M rows) for the cost of blocks*cells emulated adds
            B = 8192
            cells = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ncells1), 2)
            eq = routed.reshape(-1, B)[:, :, None] == cells
            inner = jnp.where(eq, contrib.reshape(-1, B)[:, :, None], 0)
            inner = inner.sum(axis=1, dtype=jnp.float32)
            return inner.astype(jnp.float64).sum(axis=0)
        cells = jax.lax.broadcasted_iota(jnp.int32, (1, ncells1), 1)
        oh = routed[:, None] == cells
        return jnp.where(oh, contrib[:, None], 0).sum(axis=0, dtype=pdt)
    if ncells1 * 8 <= 1 << 20:
        R = 8
        slot = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).squeeze(-1) % np.int32(R)
        flat = slot * np.int32(ncells1) + routed
        partial = jnp.zeros(R * ncells1, pdt).at[flat].add(contrib)
        return partial.reshape(R, ncells1).sum(axis=0)
    return jnp.zeros(ncells1, pdt).at[routed].add(contrib)


class AggOpSum(AggOp):
    def init(self, ncells):
        if _use_exact_limbs(self.data_dtype, self.precision):
            rows = _limb_digit_rows(self.data_dtype) + 1
            return dict(limbs=jnp.zeros((rows, ncells + 1), jnp.int64),
                        bottom=jnp.full((1,), _LIMB_INIT_BOTTOM, jnp.int64),
                        spill=jnp.zeros(ncells + 1, jnp.float64))
        acc = _acc_dtype_for_sum(self.data_dtype)
        if self.precision == "float32" and acc.kind == "f":
            acc = np.dtype("float32")
        return jnp.zeros(ncells + 1, dtype=acc)

    def merge(self, state, other):
        if isinstance(state, dict):
            return _exact_limb_merge(state, other)
        return super().merge(state, other)

    def finalize(self, state):
        if isinstance(state, dict):
            return _exact_limb_finalize(state)
        return super().finalize(state)

    def finalize_device(self, state):
        # exact-limb reconstruction needs real IEEE f64: host only
        return None if isinstance(state, dict) else state

    def update(self, state, idx, value, include, order_key=None):
        if isinstance(state, dict):
            # precision='float64' on TPU: exact multi-limb integer fixed
            # point (see the section comment above _decode_float_bits);
            # mantissa width for the window anchor by incoming stream dtype
            mbits = 24 if value.dtype == jnp.float32 else 53
            return _exact_limb_update(state, idx, (value,), include, (mbits,))
        ncells1 = state.shape[0]
        routed = jnp.where(include, idx, ncells1 - 1)
        v = jnp.where(include, value, 0)
        if ncells1 == 2:
            # scalar aggregation: dense tree reduction, exact-ish and fast
            total = jnp.sum(v.astype(state.dtype))
            return state.at[0].add(total)
        if self.precision == "mixed":
            if jax.default_backend() != "tpu":
                # CPU/GPU: f64 scatters are native-speed — accumulate at the
                # state dtype directly (full accuracy, no two-level folding;
                # the mixed machinery below exists because TPU f64 is
                # emulated ~10x slower)
                return state.at[routed].add(v.astype(state.dtype))
            pdt = _sum_partial_dtype(self.data_dtype, state.dtype)
            if pdt is not None and pdt != state.dtype:
                partial = _partial_scatter(routed, v.astype(pdt), ncells1, pdt)
                return state + partial.astype(state.dtype)
            if np.dtype(state.dtype).kind in "iu" and np.dtype(state.dtype).itemsize == 8:
                if jax.default_backend() == "tpu":
                    return _segment_sum_sorted(state, routed, v.astype(state.dtype))
                # CPU: native i64 scatter (138ms/8M) beats sort+cumsum (7s)
                return state.at[routed].add(v.astype(state.dtype))
            if state.dtype == jnp.float64:
                # f64 inputs: hi/lo f32-pair scatters (~2x f32 cost) — emulated
                # f64 scatters are ~10x slower and f64 cumsum doesn't compile
                # in reasonable time on this TPU generation
                v64 = v.astype(jnp.float64)
                hi = v64.astype(jnp.float32)
                lo = (v64 - hi.astype(jnp.float64)).astype(jnp.float32)
                p_hi = _partial_scatter(routed, hi, ncells1, jnp.float32)
                p_lo = _partial_scatter(routed, lo, ncells1, jnp.float32)
                return state + p_hi.astype(jnp.float64) + p_lo.astype(jnp.float64)
        return state.at[routed].add(v.astype(state.dtype))


class AggOpSumMoment(AggOp):
    """agg_sum.cpp AggSumMomentPrimitive: sum of value**moment."""

    def __init__(self, data_dtype=None, moment=2, precision=None):
        super().__init__(data_dtype, precision)
        self.moment = moment

    def init(self, ncells):
        if (self.precision == "float64"
                and jax.default_backend() in EXACT_LIMB_BACKENDS
                and np.dtype(self.data_dtype).kind in "fiub"):
            # moments are computed in (emulated dd) f64 then summed EXACTLY
            # (any input dtype: the moment itself is always f64)
            rows = _limb_digit_rows(np.float64) + 1
            return dict(limbs=jnp.zeros((rows, ncells + 1), jnp.int64),
                        bottom=jnp.full((1,), _LIMB_INIT_BOTTOM, jnp.int64),
                        spill=jnp.zeros(ncells + 1, jnp.float64))
        dt = jnp.float32 if self.precision == "float32" else jnp.float64
        return jnp.zeros(ncells + 1, dtype=dt)

    def merge(self, state, other):
        if isinstance(state, dict):
            return _exact_limb_merge(state, other)
        return AggOp.merge(self, state, other)

    def finalize(self, state):
        if isinstance(state, dict):
            return _exact_limb_finalize(state)
        return AggOp.finalize(self, state)

    def finalize_device(self, state):
        return None if isinstance(state, dict) else state

    def update(self, state, idx, value, include, order_key=None):
        if isinstance(state, dict):
            # v**moment in device f64 rounds like the reference's f64 multiply
            # chain (dd: ~2^-48 on this platform); the SUM of those rounded
            # moments is then exact via the limb path
            return _exact_limb_update(
                state, idx, (value,), include, (53,),
                transform=lambda v: v.astype(jnp.float64) ** self.moment)
        ncells1 = state.shape[0]
        routed = jnp.where(include, idx, ncells1 - 1)
        if ncells1 == 2:
            m = jnp.where(include, value, 0).astype(state.dtype) ** self.moment
            return state.at[0].add(jnp.sum(m))
        if self.precision == "mixed" and jax.default_backend() != "tpu":
            # CPU/GPU: accumulate moments at f64 directly (see AggOpSum)
            m = jnp.where(include, value, 0).astype(state.dtype) ** self.moment
            return state.at[routed].add(m)
        small_float = value.dtype.itemsize <= 4 and jnp.issubdtype(value.dtype, jnp.floating)
        small_int = jnp.issubdtype(value.dtype, jnp.integer) and value.dtype.itemsize <= 2
        if self.precision == "mixed" and (small_float or small_int):
            v = jnp.where(include, value, 0).astype(jnp.float32)
            partial = _partial_scatter(routed, v ** self.moment, ncells1, jnp.float32)
            return state + partial.astype(state.dtype)
        if self.precision == "mixed" and value.dtype == jnp.float64 and state.dtype == jnp.float64:
            # hi/lo split of the MOMENT (pivot-shifted upstream, agg.py) —
            # same rationale as AggOpSum's f64 path
            m = jnp.where(include, value, 0).astype(jnp.float64) ** self.moment
            hi = m.astype(jnp.float32)
            lo = (m - hi.astype(jnp.float64)).astype(jnp.float32)
            p_hi = _partial_scatter(routed, hi, ncells1, jnp.float32)
            p_lo = _partial_scatter(routed, lo, ncells1, jnp.float32)
            return state + p_hi.astype(jnp.float64) + p_lo.astype(jnp.float64)
        v = jnp.where(include, value, 0).astype(state.dtype)
        return state.at[routed].add(v ** self.moment)


class AggOpMin(AggOp):
    def _use_f64_keys(self):
        # f64 comparisons on TPU are emulated with ~1-2 ulp noise; the
        # u64-key domain makes min/max bitwise-exact.  Used on every backend
        # so CPU tests exercise the exact device path.
        return np.dtype(self.data_dtype).kind == "f" and np.dtype(self.data_dtype).itemsize == 8

    def _sentinel(self):
        dt = np.dtype(self.data_dtype)
        if self._use_f64_keys():
            return _f64_key_host(np.inf)
        if dt.kind == "f":
            return np.array(np.inf, dtype=dt)
        if dt.kind in "mM":
            return np.array(np.iinfo(np.int64).max, dtype=np.int64)
        if dt.kind == "b":  # booleans reduce in int32 (np.iinfo rejects bool)
            dt = np.dtype("int32")
        return np.array(np.iinfo(dt).max, dtype=dt)

    def init(self, ncells):
        dt = np.dtype(self.data_dtype)
        if self._use_f64_keys():
            dt = np.dtype(np.int64)
        elif dt.kind in "mM":
            dt = np.dtype(np.int64)
        elif dt.kind == "b":
            dt = np.dtype(np.int32)
        return jnp.full(ncells + 1, self._sentinel(), dtype=dt)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        if self._use_f64_keys() and value.dtype != jnp.int64:
            # i64 input means keys were pre-computed host-side
            # (execution.py wraps f64 min/max values in _f64_minmax_key
            # on TPU, where the device bitcast path can't compile)
            value = _f64_to_key(value)
        v = jnp.where(include, value, self._sentinel()).astype(state.dtype)
        n = state.shape[0]
        if n == 2:
            # scalar: dense tree reduction, no scatter
            return state.at[0].min(v.min())
        if n <= _onehot_cell_limit():
            cells = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            oh = routed[:, None] == cells
            partial = jnp.where(oh, v[:, None], self._sentinel()).min(axis=0)
            return jnp.minimum(state, partial)
        if (self.precision != "float64" and np.dtype(state.dtype).itemsize == 8
                and jax.default_backend() in SORTED_MINMAX_BACKENDS):
            # 64-bit scatter-min is EMULATED on TPU (~10x slower than the
            # sort detour); for <=32-bit dtypes the native scatter wins —
            # measured h2o q7 (int8, 2^20 cells, 1e8 rows): scatter 2.98s
            # vs composite-key sort 5.48s end-to-end
            return _segment_minmax_sorted(state, routed, v, self._sentinel(), is_min=True)
        return state.at[routed].min(v)

    def merge(self, state, other):
        return jnp.minimum(state, other)

    def finalize(self, state):
        if self._use_f64_keys():
            return _key_to_f64(state)
        return state

    def finalize_device(self, state):
        # f64 keys decode host-side (no 64-bit bitcasts on TPU)
        return None if self._use_f64_keys() else state


class AggOpMax(AggOp):
    _use_f64_keys = AggOpMin._use_f64_keys

    def _sentinel(self):
        dt = np.dtype(self.data_dtype)
        if self._use_f64_keys():
            return _f64_key_host(-np.inf)
        if dt.kind == "f":
            return np.array(-np.inf, dtype=dt)
        if dt.kind in "mM":
            return np.array(np.iinfo(np.int64).min, dtype=np.int64)
        if dt.kind == "b":
            dt = np.dtype("int32")
        return np.array(np.iinfo(dt).min, dtype=dt)

    def init(self, ncells):
        dt = np.dtype(self.data_dtype)
        if self._use_f64_keys():
            dt = np.dtype(np.int64)
        elif dt.kind in "mM":
            dt = np.dtype(np.int64)
        elif dt.kind == "b":
            dt = np.dtype(np.int32)
        return jnp.full(ncells + 1, self._sentinel(), dtype=dt)

    def update(self, state, idx, value, include, order_key=None):
        routed = jnp.where(include, idx, state.shape[0] - 1)
        if self._use_f64_keys() and value.dtype != jnp.int64:
            # i64 input = keys pre-computed host-side (see AggOpMin.update)
            value = _f64_to_key(value)
        v = jnp.where(include, value, self._sentinel()).astype(state.dtype)
        n = state.shape[0]
        if n == 2:
            # scalar: dense tree reduction, no scatter
            return state.at[0].max(v.max())
        if n <= _onehot_cell_limit():
            cells = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            oh = routed[:, None] == cells
            partial = jnp.where(oh, v[:, None], self._sentinel()).max(axis=0)
            return jnp.maximum(state, partial)
        if (self.precision != "float64" and np.dtype(state.dtype).itemsize == 8
                and jax.default_backend() in SORTED_MINMAX_BACKENDS):
            # 64-bit scatter-max is EMULATED on TPU (~10x slower than the
            # sort detour); for <=32-bit dtypes the native scatter wins —
            # measured h2o q7 (int8, 2^20 cells, 1e8 rows): scatter 2.98s
            # vs composite-key sort 5.48s end-to-end
            return _segment_minmax_sorted(state, routed, v, self._sentinel(), is_min=False)
        return state.at[routed].max(v)

    def merge(self, state, other):
        return jnp.maximum(state, other)

    def finalize(self, state):
        if self._use_f64_keys():
            return _key_to_f64(state)
        return state

    finalize_device = AggOpMin.finalize_device


_ORDER_SENTINEL = np.iinfo(np.int64).max


class AggOpFirst(AggOp):
    """agg_first.cpp: value at the smallest order key per cell (first);
    `last` uses negated order keys.

    Two-phase per chunk: (1) scatter-min the order key per cell, (2) rows
    whose key equals the per-cell winner write their value — exactly one row
    per cell wins since keys are unique row numbers.
    """

    def __init__(self, data_dtype=None, inverted=False, precision=None):
        super().__init__(data_dtype, precision)
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
        return (new_best, new_value)

    def merge(self, state, other):
        bo, bv = state
        oo, ov = other
        take_other = oo < bo
        return (jnp.where(take_other, oo, bo), jnp.where(take_other, ov, bv))

    def finalize(self, state):
        return state[1]

    def finalize_device(self, state):
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
