"""Value dispatch for expression evaluation on two backends.

TPU-native counterpart of the reference NumpyDispatch
(/root/reference/packages/vaex-core/vaex/arrow/numpy_dispatch.py): one
expression string evaluates either

* on the **host** — numeric chunks as numpy (or numpy.ma masked) arrays,
  strings as Arrow arrays wrapped in :class:`StringOps` so comparison
  operators route to ``pyarrow.compute``; or
* on the **device** — chunks as :class:`MV` pairs ``(values, invalid-mask)``
  of traced ``jnp`` arrays, so null/missing propagation stays inside the
  compiled XLA program (masks combine with logical OR across operands, the
  same propagation numpy.ma gives on the host).
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.compute as pc
except ImportError:  # pragma: no cover
    pa = None
    pc = None


class MV:
    """Masked value on the device: (values, mask) with mask True = missing."""

    __slots__ = ("values", "mask")
    __array_priority__ = 100

    def __init__(self, values, mask=None):
        if isinstance(values, MV):
            mask = values.mask if mask is None else mask
            values = values.values
        self.values = values
        self.mask = mask

    def __repr__(self):
        return f"MV({self.values!r}, mask={self.mask!r})"

    # -- helpers
    @staticmethod
    def _v(x):
        return x.values if isinstance(x, MV) else x

    @staticmethod
    def _m(x):
        return x.mask if isinstance(x, MV) else None

    @staticmethod
    def combine_masks(*masks):
        import jax.numpy as jnp
        masks = [m for m in masks if m is not None]
        if not masks:
            return None
        out = masks[0]
        for m in masks[1:]:
            out = jnp.logical_or(out, m)
        return out

    def _binop(self, other, op):
        values = op(self.values, MV._v(other))
        return MV(values, MV.combine_masks(self.mask, MV._m(other)))

    def _rbinop(self, other, op):
        values = op(MV._v(other), self.values)
        return MV(values, MV.combine_masks(self.mask, MV._m(other)))


def _add_operators():
    import operator

    ops = {
        "add": operator.add, "sub": operator.sub, "mul": operator.mul,
        "truediv": operator.truediv, "floordiv": operator.floordiv,
        "mod": operator.mod, "pow": operator.pow,
        "and": operator.and_, "or": operator.or_, "xor": operator.xor,
        "lshift": operator.lshift, "rshift": operator.rshift,
        "lt": operator.lt, "le": operator.le, "gt": operator.gt,
        "ge": operator.ge, "eq": operator.eq, "ne": operator.ne,
    }
    for name, op in ops.items():
        def binop(self, other, _op=op):
            return self._binop(other, _op)
        setattr(MV, f"__{name}__", binop)
        if name not in ("lt", "le", "gt", "ge", "eq", "ne"):
            def rbinop(self, other, _op=op):
                return self._rbinop(other, _op)
            setattr(MV, f"__r{name}__", rbinop)

    def neg(self):
        return MV(-self.values, self.mask)

    def pos(self):
        return MV(+self.values, self.mask)

    def invert(self):
        return MV(~self.values, self.mask)

    def absf(self):
        import jax.numpy as jnp
        return MV(jnp.abs(self.values), self.mask)

    MV.__neg__ = neg
    MV.__pos__ = pos
    MV.__invert__ = invert
    MV.__abs__ = absf


_add_operators()


def unwrap(x):
    return x.values if isinstance(x, MV) else x


def mask_of(x):
    return x.mask if isinstance(x, MV) else None


def wrap_device_function(f):
    """Lift a jnp function to MV semantics: masks of array args OR together."""

    def wrapped(*args, **kwargs):
        masks = [mask_of(a) for a in args] + [mask_of(v) for v in kwargs.values()]
        values = f(*[unwrap(a) for a in args], **{k: unwrap(v) for k, v in kwargs.items()})
        return MV(values, MV.combine_masks(*masks))

    wrapped.__name__ = getattr(f, "__name__", "wrapped")
    return wrapped


class StringOps:
    """Host-side wrapper for Arrow string arrays so python operators inside
    expression strings dispatch to pyarrow.compute (the reference routes
    str_* through pyarrow too, vaex/functions.py:29-33)."""

    __slots__ = ("ar",)

    def __init__(self, ar):
        if isinstance(ar, StringOps):
            ar = ar.ar
        self.ar = ar

    def __len__(self):
        return len(self.ar)

    def _other(self, other):
        if isinstance(other, StringOps):
            return other.ar
        return other

    def __eq__(self, other):
        return _np_bool(pc.equal(self.ar, self._other(other)))

    def __ne__(self, other):
        return _np_bool(pc.not_equal(self.ar, self._other(other)))

    def __lt__(self, other):
        return _np_bool(pc.less(self.ar, self._other(other)))

    def __le__(self, other):
        return _np_bool(pc.less_equal(self.ar, self._other(other)))

    def __gt__(self, other):
        return _np_bool(pc.greater(self.ar, self._other(other)))

    def __ge__(self, other):
        return _np_bool(pc.greater_equal(self.ar, self._other(other)))

    def __add__(self, other):
        return StringOps(pc.binary_join_element_wise(self.ar, self._other(other), ""))

    def __hash__(self):
        return id(self.ar)


def _np_bool(arrow_bool):
    """Arrow bool -> numpy bool (masked where null), False where null treated
    as missing via numpy.ma so selections skip them."""
    ar = arrow_bool
    if ar.null_count:
        values = np.asarray(ar.fill_null(False))
        mask = np.asarray(ar.is_null())
        return np.ma.MaskedArray(values, mask=mask)
    return np.asarray(ar)


def wrap_host(chunk):
    """Wrap a host chunk for expression eval: numeric → numpy/np.ma,
    strings/struct/list → StringOps or raw arrow."""
    from . import array_types
    if isinstance(chunk, np.ndarray):
        return chunk
    if array_types.is_arrow_array(chunk):
        dt = array_types.data_type(chunk)
        if dt.is_string:
            ar = chunk
            if isinstance(ar, pa.ChunkedArray):
                ar = ar.combine_chunks()
            if dt.is_dictionary:
                ar = ar.dictionary_decode()
            return StringOps(ar)
        if dt.is_list or dt.is_struct:
            return chunk
        return array_types.arrow_to_numpy(chunk)
    return chunk


def unwrap_host(result):
    """Expression eval result → plain numpy / numpy.ma / arrow array."""
    if isinstance(result, StringOps):
        return result.ar
    if isinstance(result, MV):  # shouldn't appear on host, but be safe
        values = np.asarray(result.values)
        if result.mask is not None:
            return np.ma.MaskedArray(values, mask=np.asarray(result.mask))
        return values
    return result
