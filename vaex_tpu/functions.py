"""Expression function registry with dual host/device implementations.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/functions.py
(~300 registered names) + registry.py: every function callable inside an
expression string is registered here with

* a **host** implementation (numpy / numpy.ma / pyarrow.compute / pandas) used
  by `df.evaluate` and string/temporal paths, and
* a **device** implementation (jnp, lifted to masked `MV` semantics) used by
  the compiled aggregation passes — the reference's opt-in jit_numba/jit_cuda
  (vaex/expression.py:1113-1129) becomes the default execution mode here.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.compute as pc
except ImportError:  # pragma: no cover
    pa = None
    pc = None

from . import dispatch
from .dispatch import MV, StringOps, wrap_device_function


class FunctionDef:
    def __init__(self, name, host, device=None, scope=None, as_property=False):
        self.name = name
        self.host = host
        self.device = device
        self.scope = scope
        self.as_property = as_property

    def __call__(self, *args, **kwargs):
        return self.host(*args, **kwargs)


functions: dict[str, FunctionDef] = {}
scopes: dict[str, dict[str, FunctionDef]] = {"str": {}, "dt": {}, "td": {}, "struct": {}}


def register_function(f=None, name=None, scope=None, as_property=False, on_expression=True, device=None):
    """Register a function for use in expression strings
    (reference: vaex/registry.py register_function)."""

    def decorator(func):
        fname = name or func.__name__
        full_name = fname if scope is None else f"{scope}_{fname}" if not fname.startswith(f"{scope}_") else fname
        fdef = FunctionDef(full_name, func, device=device, scope=scope, as_property=as_property)
        functions[full_name] = fdef
        if scope:
            short = full_name[len(scope) + 1:]
            scopes.setdefault(scope, {})[short] = fdef
        return func

    if f is not None:
        return decorator(f)
    return decorator


def _register(name, host, device=None, scope=None, as_property=False):
    full = name if scope is None else f"{scope}_{name}"
    fdef = FunctionDef(full, host, device=device, scope=scope, as_property=as_property)
    functions[full] = fdef
    if scope:
        scopes.setdefault(scope, {})[name] = fdef
    return fdef


# ---------------------------------------------------------------------------
# numpy <-> jnp ufunc bridge (reference: vaex/functions.py:52-107)
# ---------------------------------------------------------------------------

_NUMPY_NAMES = """
abs arccos arccosh arcsin arcsinh arctan arctan2 arctanh clip cos cosh
deg2rad digitize exp expm1 isfinite isinf log log10 log1p maximum minimum
rad2deg round searchsorted sin sinc sinh sqrt tan tanh floor ceil sign
nan_to_num degrees radians hypot cbrt exp2 log2 trunc rint fmod power mod
add subtract multiply divide true_divide floor_divide negative positive
logical_and logical_or logical_not logical_xor
""".split()


def _host_ufunc(np_func):
    def impl(*args, **kwargs):
        args = [a.ar if isinstance(a, StringOps) else a for a in args]
        return np_func(*args, **kwargs)
    return impl


def _make_numpy_bridge():
    import jax.numpy as jnp
    for fname in _NUMPY_NAMES:
        np_func = getattr(np, fname, None)
        if np_func is None:
            continue
        jnp_func = getattr(jnp, fname, None)
        device = wrap_device_function(jnp_func) if jnp_func is not None else None
        _register(fname, _host_ufunc(np_func), device=device)


_make_numpy_bridge()


# ---------------------------------------------------------------------------
# missing-value functions (reference: vaex/functions.py:109-282)
# ---------------------------------------------------------------------------

def _values_mask(ar):
    """(values, invalid_mask_or_None) for a host array."""
    if np.ma.isMaskedArray(ar):
        return ar.data, np.ma.getmaskarray(ar)
    from . import array_types
    if array_types.is_arrow_array(ar):
        npar = array_types.arrow_to_numpy(ar)
        return _values_mask(npar)
    return ar, None


def _as_string_ops(ar):
    """Wrap a bare arrow string array (e.g. a memoized virtual-column value)
    as StringOps so the string fast paths apply."""
    if isinstance(ar, StringOps):
        return ar
    from . import array_types
    if array_types.is_arrow_array(ar):
        t = ar.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            if isinstance(ar, pa.ChunkedArray):
                ar = ar.combine_chunks()
            return StringOps(ar)
    return None


@register_function
def fillmissing(ar, value):
    """Fill masked/null values (NOT NaN) (reference: functions.py fillmissing)."""
    s = _as_string_ops(ar)
    if s is not None:
        return StringOps(s.ar.fill_null(value))
    values, mask = _values_mask(ar)
    if mask is None:
        return values
    values = np.asarray(values).copy()
    values[mask] = value
    return values


def _fillmissing_device(ar, value):
    import jax.numpy as jnp
    if isinstance(ar, MV) and ar.mask is not None:
        return MV(jnp.where(ar.mask, value, ar.values), None)
    return MV(dispatch.unwrap(ar), None)


functions["fillmissing"].device = _fillmissing_device


@register_function
def fillnan(ar, value):
    s = _as_string_ops(ar)
    if s is not None:
        return s
    values, mask = _values_mask(ar)
    if np.asarray(values).dtype.kind == "f":
        values = np.where(np.isnan(values), value, values)
    if mask is not None:
        return np.ma.MaskedArray(values, mask=mask)
    return values


def _fillnan_device(ar, value):
    import jax.numpy as jnp
    v = dispatch.unwrap(ar)
    if jnp.issubdtype(v.dtype, jnp.floating):
        v = jnp.where(jnp.isnan(v), value, v)
    return MV(v, dispatch.mask_of(ar))


functions["fillnan"].device = _fillnan_device


@register_function
def fillna(ar, value):
    """Fill masked/null AND NaN values (reference: functions.py fillna)."""
    return fillnan(fillmissing(ar, value), value)


functions["fillna"].device = lambda ar, value: _fillnan_device(_fillmissing_device(ar, value), value)


@register_function
def ismissing(ar):
    if isinstance(ar, StringOps):
        return np.asarray(ar.ar.is_null())
    _, mask = _values_mask(ar)
    if mask is None:
        return np.zeros(len(ar), dtype=bool)
    return mask.copy()


def _ismissing_device(ar):
    import jax.numpy as jnp
    m = dispatch.mask_of(ar)
    v = dispatch.unwrap(ar)
    return MV(jnp.zeros(v.shape, bool) if m is None else m, None)


functions["ismissing"].device = _ismissing_device


@register_function
def notmissing(ar):
    return ~ismissing(ar)


functions["notmissing"].device = lambda ar: MV(~_ismissing_device(ar).values, None)


@register_function
def isnan(ar):
    if isinstance(ar, StringOps):
        return np.zeros(len(ar), dtype=bool)
    values, mask = _values_mask(ar)
    values = np.asarray(values)
    out = np.isnan(values) if values.dtype.kind == "f" else np.zeros(len(values), dtype=bool)
    if mask is not None:
        out = out & ~mask  # masked entries are 'missing', not 'nan' (reference semantics)
    return out


def _isnan_device(ar):
    import jax.numpy as jnp
    v = dispatch.unwrap(ar)
    m = dispatch.mask_of(ar)
    out = jnp.isnan(v) if jnp.issubdtype(v.dtype, jnp.floating) else jnp.zeros(v.shape, bool)
    if m is not None:
        out = out & ~m
    return MV(out, None)


functions["isnan"].device = _isnan_device


@register_function
def notnan(ar):
    return ~isnan(ar)


functions["notnan"].device = lambda ar: MV(~_isnan_device(ar).values, None)


@register_function
def isna(ar):
    """Missing or NaN (reference: functions.py isna)."""
    return ismissing(ar) | isnan(ar)


def _isna_device(ar):
    return MV(_ismissing_device(ar).values | _isnan_device(ar).values, None)


functions["isna"].device = _isna_device


@register_function
def notna(ar):
    return ~isna(ar)


functions["notna"].device = lambda ar: MV(~_isna_device(ar).values, None)


# ---------------------------------------------------------------------------
# general helpers: where / astype / isin / map
# ---------------------------------------------------------------------------

@register_function
def where(condition, x, y):
    condition = condition.ar if isinstance(condition, StringOps) else condition
    if isinstance(x, StringOps) or isinstance(y, StringOps):
        xar = x.ar if isinstance(x, StringOps) else x
        yar = y.ar if isinstance(y, StringOps) else y
        cond = pa.array(np.asarray(condition)) if not isinstance(condition, (pa.Array, pa.ChunkedArray)) else condition
        return StringOps(pc.if_else(cond, xar, yar))
    return np.where(condition, x, y)


def _where_device(condition, x, y):
    import jax.numpy as jnp
    c, cx, cy = dispatch.unwrap(condition), dispatch.unwrap(x), dispatch.unwrap(y)
    mx, my = dispatch.mask_of(x), dispatch.mask_of(y)
    out = jnp.where(c, cx, cy)
    mask = None
    if mx is not None or my is not None:
        import jax.numpy as jnp
        fx = mx if mx is not None else jnp.zeros(out.shape, bool)
        fy = my if my is not None else jnp.zeros(out.shape, bool)
        mask = jnp.where(c, fx, fy)
    mc = dispatch.mask_of(condition)
    return MV(out, MV.combine_masks(mask, mc))


functions["where"].device = _where_device


@register_function(name="_astype")
def _astype(x, dtype_name):
    if isinstance(x, StringOps):
        if dtype_name in ("str", "string", "large_string"):
            return x
        dt = np.dtype(dtype_name)
        if dt.kind == "M":
            # numpy parses ISO strings and infers the unit for the generic
            # 'datetime64' (reference keeps this inference; arrow cast would
            # need a bound unit)
            return np.array(x.ar.to_pylist(), dtype=dt)
        return np.asarray(x.ar.cast(pa.from_numpy_dtype(dt)))
    if dtype_name in ("str", "string", "large_string"):
        from . import array_types
        values, mask = _values_mask(x)
        strings = np.array([str(v) for v in np.asarray(values)], dtype=object)
        return StringOps(pa.array(strings, mask=mask) if mask is not None else pa.array(strings))
    if np.ma.isMaskedArray(x):
        return x.astype(np.dtype(dtype_name))
    return np.asarray(x).astype(np.dtype(dtype_name))


def _astype_device(x, dtype_name):
    v = dispatch.unwrap(x)
    return MV(v.astype(np.dtype(dtype_name)), dispatch.mask_of(x))


functions["_astype"].device = _astype_device


@register_function(name="_float")
def _float(x):
    return _astype(x, "float64")


functions["_float"].device = lambda x: _astype_device(x, "float64")


@register_function(name="_isin")
def _isin(x, values):
    if isinstance(x, StringOps):
        return np.asarray(pc.is_in(x.ar, value_set=pa.array(values)))
    xval, mask = _values_mask(x)
    out = np.isin(np.asarray(xval), np.asarray(values))
    if mask is not None:
        out = out & ~mask
    return out


def _isin_device(x, values):
    import jax.numpy as jnp
    v = dispatch.unwrap(x)
    table = jnp.sort(jnp.asarray(dispatch.unwrap(values)))
    if table.dtype != v.dtype and table.dtype.kind == v.dtype.kind:
        table = table.astype(v.dtype)
    if table.shape[0] <= 512:
        # broadcast equality: no gathers (slow on TPU at millions of rows)
        out = (v[:, None] == table[None, :]).any(axis=1)
    else:
        pos = jnp.searchsorted(table, v, method="sort")
        pos = jnp.clip(pos, 0, table.shape[0] - 1)
        out = table[pos] == v
    m = dispatch.mask_of(x)
    if m is not None:
        out = out & ~m
    return MV(out, None)


functions["_isin"].device = _isin_device
_register("_isin_set", _isin, device=_isin_device)

# reference-compatible public names (reference functions.py:2507,2511,2582
# registers these as 'float'/'astype'/'isin_set') so state files written by
# vaex-core evaluate unchanged
_register("astype", _astype, device=_astype_device)
_register("float", _float, device=functions["_float"].device)
_register("isin_set", _isin, device=_isin_device)
# public name so string expressions like "isin(x, [1, 2])" work
# (reference: vaex/functions.py isin registration)
_register("isin", _isin, device=_isin_device)


@register_function(name="_map")
def _map(x, choices_key, choices_value, default_value=None, use_missing=False, axis=None):
    """Map values via parallel key/value arrays (reference: functions.py _map,
    backing Expression.map, vaex/expression.py:1298)."""
    if isinstance(x, StringOps):
        keys = pa.array(choices_key)
        indices = pc.index_in(x.ar, value_set=keys)
        found = np.asarray(indices.is_valid())
        idx = np.asarray(indices.fill_null(0))
    else:
        xval, xmask = _values_mask(x)
        keys = np.asarray(choices_key)
        order = np.argsort(keys)
        skeys = keys[order]
        pos = np.searchsorted(skeys, xval)
        pos = np.clip(pos, 0, len(skeys) - 1)
        found = skeys[pos] == np.asarray(xval)
        if xmask is not None:
            found = found & ~xmask
        idx = order[pos]
    values = choices_value
    from . import array_types
    values_np = np.asarray(values, dtype=object) if getattr(np.asarray(values), "dtype", np.dtype("O")).kind == "O" else np.asarray(values)
    out = values_np[idx]
    if use_missing:
        return np.ma.MaskedArray(out, mask=~found)
    if default_value is not None:
        out = np.where(found, out, default_value)
    return out


@register_function(name="searchsorted")
def _searchsorted(a, v, side="left"):
    return np.searchsorted(np.asarray(a), v, side=side)


# ---------------------------------------------------------------------------
# ordinal values: binning through a hashmap/key-table (groupby fast path)
# reference: vaex/functions.py:2455 _ordinal_values
# ---------------------------------------------------------------------------

@register_function(name="_ordinal_values")
def _ordinal_values(x, hash_map_unique):
    return hash_map_unique.map_ordinal(x)


def _ordinal_values_device(x, hash_map_unique):
    return hash_map_unique.map_ordinal_device(x)


functions["_ordinal_values"].device = _ordinal_values_device


@register_function(name="hashmap_apply")
def hashmap_apply(x, hashmap, check_missing=False):
    codes = hashmap.map_ordinal(x)
    if check_missing:
        # unknown keys (code -1) become missing values (reference:
        # hashmap_apply in functions.py — ordinal_encode with explicit values)
        mask = np.asarray(codes) == -1
        if mask.any():
            return np.ma.MaskedArray(np.asarray(codes), mask=mask)
    return codes


@register_function(name="index_values")
def index_values(x):
    """Dictionary indices of a dict-encoded column (reference: functions.py)."""
    from . import array_types
    ar = x.ar if isinstance(x, StringOps) else x
    if array_types.is_arrow_array(ar):
        if isinstance(ar, pa.ChunkedArray):
            ar = ar.combine_chunks()
        if pa.types.is_dictionary(ar.type):
            out = np.asarray(ar.indices)
            if ar.null_count:
                mask = np.asarray(ar.is_null())
                return np.ma.MaskedArray(out, mask=mask)
            return out
    raise TypeError("index_values expects a dictionary-encoded column")


@register_function(name="_choose")
def _choose(ar, choices, default=None):
    indices = np.asarray(ar)
    return np.choose(indices, choices)


@register_function(name="_choose_masked")
def _choose_masked(ar, choices):
    ar = np.ma.asarray(ar)
    return np.ma.choose(ar, choices)


@register_function(name="stack")
def stack(*arrays):
    """Row-wise stack: stack([x, y]) -> [[x0,y0], [x1,y1], ...]
    (reference: vaex/functions.py stack; tests/stack_test.py).  Masked
    inputs keep their mask (rows render as None in lists)."""
    if len(arrays) == 1 and isinstance(arrays[0], (list, tuple)):
        arrays = tuple(arrays[0])
    cols = [dispatch.unwrap_numpy(a) if hasattr(dispatch, "unwrap_numpy") else a for a in arrays]
    cols = [a.ar if isinstance(a, StringOps) else a for a in cols]
    cols = [np.ma.asarray(c) if np.ma.isMaskedArray(c) else np.asarray(c) for c in cols]
    if any(np.ma.isMaskedArray(c) for c in cols):
        return np.ma.stack(cols, axis=1)
    return np.stack(cols, axis=1)


@register_function(name="getitem")
def getitem(ar, index):
    return ar[index]


@register_function(name="dot_product")
def dot_product(a, b):
    products = [np.asarray(x) * np.asarray(y) for x, y in zip(a, b)]
    out = products[0]
    for p in products[1:]:
        out = out + p
    return out


@register_function(name="format")
def format(x, fmt="{}"):
    """Format values as strings (reference: functions.py format)."""
    values = x.ar.to_pylist() if isinstance(x, StringOps) else np.asarray(x).tolist()
    return StringOps(pa.array([fmt.format(v) if v is not None else None for v in values]))


@register_function(name="to_string")
def to_string(x):
    return _astype(x, "str")


@register_function(name="as_arrow")
def as_arrow(x):
    from . import array_types
    return x if isinstance(x, StringOps) else array_types.to_arrow(x)


@register_function(name="as_numpy")
def as_numpy(x):
    from . import array_types
    return array_types.to_numpy(x.ar if isinstance(x, StringOps) else x)


@register_function(name="list_sum")
def list_sum(ar, fill_empty=0):
    ar = ar.ar if isinstance(ar, StringOps) else ar
    if isinstance(ar, pa.ChunkedArray):
        ar = ar.combine_chunks()
    out = pc.list_value_length(ar)
    values = [sum(v) if v else fill_empty for v in ar.to_pylist()]
    return np.array(values)


_register("array_sum", list_sum)


# ---------------------------------------------------------------------------
# datetime scope (reference: vaex/functions.py:302-810) — host via pandas
# ---------------------------------------------------------------------------

def _dt_series(x):
    import pandas as pd
    values, mask = _values_mask(x)
    return pd.Series(np.asarray(values)), mask


def _dt_out(values, mask):
    values = np.asarray(values)
    if mask is not None:
        return np.ma.MaskedArray(values, mask=mask)
    return values


def _dt_accessor(attr, as_property=True, transform=None):
    def impl(x, *args, **kwargs):
        s, mask = _dt_series(x)
        acc = getattr(s.dt, attr)
        out = acc(*args, **kwargs) if callable(acc) and not as_property else acc
        if transform:
            out = transform(out)
        return _dt_out(out.values if hasattr(out, "values") else out, mask)
    return impl


for _name, _attr, _prop in [
    ("date", "date", True), ("year", "year", True), ("month", "month", True),
    ("day", "day", True), ("hour", "hour", True), ("minute", "minute", True),
    ("second", "second", True), ("microsecond", "microsecond", True),
    ("nanosecond", "nanosecond", True),
    ("dayofweek", "dayofweek", True), ("dayofyear", "dayofyear", True),
    ("is_leap_year", "is_leap_year", True), ("quarter", "quarter", True),
    ("month_name", "month_name", False), ("day_name", "day_name", False),
]:
    _register(_name, _dt_accessor(_attr, as_property=_prop), scope="dt", as_property=True)


def _dt_weekofyear(x):
    import pandas as pd
    s, mask = _dt_series(x)
    out = s.dt.isocalendar().week.values.astype(np.int64)
    return _dt_out(out, mask)


_register("weekofyear", _dt_weekofyear, scope="dt", as_property=True)


def _dt_halfyear(x):
    s, mask = _dt_series(x)
    return _dt_out(((s.dt.quarter.values - 1) // 2) + 1, mask)


_register("halfyear", _dt_halfyear, scope="dt", as_property=True)


def _dt_strftime(x, date_format):
    s, mask = _dt_series(x)
    out = s.dt.strftime(date_format)
    return StringOps(pa.array(out.values.astype(object), mask=mask if mask is not None else None))


_register("strftime", _dt_strftime, scope="dt")


_FREQ_ALIASES = {"H": "h", "T": "min", "S": "s", "L": "ms", "U": "us", "N": "ns"}


def _dt_floor(x, freq, *args):
    s, mask = _dt_series(x)
    # the reference API accepts pandas' retired uppercase offset codes
    freq = _FREQ_ALIASES.get(freq, freq)
    return _dt_out(s.dt.floor(freq, *args).values, mask)


_register("floor", _dt_floor, scope="dt")


# td scope (reference: functions.py:810-931)
def _td_components(x, component):
    values, mask = _values_mask(x)
    td = np.asarray(values)
    import pandas as pd
    s = pd.Series(td)
    out = getattr(s.dt, component).values
    return _dt_out(out, mask)


for _name in ["days", "seconds", "microseconds", "nanoseconds"]:
    _register(_name, (lambda name: lambda x: _td_components(x, name))(_name), scope="td", as_property=True)


def _td_total_seconds(x):
    values, mask = _values_mask(x)
    out = np.asarray(values).astype("timedelta64[ns]").astype(np.int64) / 1e9
    return _dt_out(out, mask)


_register("total_seconds", _td_total_seconds, scope="td")


def _scalar_datetime(s):
    return np.datetime64(s)


def _scalar_timedelta(value, unit="s"):
    return np.timedelta64(value, unit)


_register("scalar_datetime", _scalar_datetime)
_register("scalar_timedelta", _scalar_timedelta)


@register_function(name="format")
def _format(x, fmt):
    """C-style %-format to strings (reference: functions.py:2417 format)."""
    s = _as_string_ops(x)
    if s is not None:
        values = s.ar.to_pylist()
        return StringOps(pa.array([None if v is None else fmt % v for v in values]))
    values, mask = _values_mask(x)
    out = [fmt % v for v in np.asarray(values)]
    return StringOps(pa.array(out, mask=mask if mask is not None else None))


# ---------------------------------------------------------------------------
# string scope — pyarrow.compute backed (reference: functions.py:963-2400;
# the reference's C++ superstrings module is replaced by pyarrow kernels)
# ---------------------------------------------------------------------------

def _sarr(x):
    if isinstance(x, StringOps):
        ar = x.ar
    elif isinstance(x, (pa.Array, pa.ChunkedArray)):
        ar = x
    elif isinstance(x, np.ndarray):
        ar = pa.array(x.astype(object))
    else:
        ar = pa.array(x)
    if isinstance(ar, pa.ChunkedArray):
        ar = ar.combine_chunks()
    if pa.types.is_dictionary(ar.type):
        ar = ar.dictionary_decode()
    return ar


def _str_wrap(result):
    if isinstance(result, (pa.Array, pa.ChunkedArray)):
        t = result.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return StringOps(result)
        if pa.types.is_boolean(t) or pa.types.is_integer(t) or pa.types.is_floating(t):
            return dispatch._np_bool(result) if pa.types.is_boolean(t) else _int_from_arrow(result)
    return result


def _int_from_arrow(ar):
    if ar.null_count:
        mask = np.asarray(ar.is_null())
        return np.ma.MaskedArray(np.asarray(ar.fill_null(0)), mask=mask)
    return np.asarray(ar)


def _str_fn(pc_name=None, impl=None):
    def wrapper(x, *args, **kwargs):
        ar = _sarr(x)
        if impl is not None:
            return _str_wrap(impl(ar, *args, **kwargs))
        return _str_wrap(getattr(pc, pc_name)(ar, *args, **kwargs))
    return wrapper


_register("capitalize", _str_fn("utf8_capitalize"), scope="str")
_register("lower", _str_fn("utf8_lower"), scope="str")
_register("upper", _str_fn("utf8_upper"), scope="str")
_register("title", _str_fn("utf8_title"), scope="str")
_register("swapcase", _str_fn("utf8_swapcase"), scope="str")
_register("reverse", _str_fn("utf8_reverse"), scope="str")
_register("len", _str_fn("utf8_length"), scope="str")
_register("byte_length", _str_fn("binary_length"), scope="str")
_register("isalnum", _str_fn("utf8_is_alnum"), scope="str")
_register("isalpha", _str_fn("utf8_is_alpha"), scope="str")
_register("isdigit", _str_fn("utf8_is_digit"), scope="str")
_register("isspace", _str_fn("utf8_is_space"), scope="str")
_register("islower", _str_fn("utf8_is_lower"), scope="str")
_register("isupper", _str_fn("utf8_is_upper"), scope="str")
_register("istitle", _str_fn("utf8_is_title"), scope="str")
_register("isnumeric", _str_fn("utf8_is_numeric"), scope="str")
_register("isdecimal", _str_fn("utf8_is_decimal"), scope="str")


def _str_strip(ar, to_strip=None):
    return pc.utf8_trim(ar, characters=to_strip) if to_strip else pc.utf8_trim_whitespace(ar)


def _str_lstrip(ar, to_strip=None):
    return pc.utf8_ltrim(ar, characters=to_strip) if to_strip else pc.utf8_ltrim_whitespace(ar)


def _str_rstrip(ar, to_strip=None):
    return pc.utf8_rtrim(ar, characters=to_strip) if to_strip else pc.utf8_rtrim_whitespace(ar)


_register("strip", _str_fn(impl=_str_strip), scope="str")
_register("lstrip", _str_fn(impl=_str_lstrip), scope="str")
_register("rstrip", _str_fn(impl=_str_rstrip), scope="str")


def _str_contains(ar, pattern, regex=True):
    if regex:
        return pc.match_substring_regex(ar, pattern)
    return pc.match_substring(ar, pattern)


_register("contains", _str_fn(impl=_str_contains), scope="str")
_register("match", _str_fn(impl=lambda ar, pattern: pc.match_like(ar, pattern) if "%" in pattern else pc.match_substring_regex(ar, "^" + pattern + "$")), scope="str")
_register("startswith", _str_fn(impl=lambda ar, pat: pc.starts_with(ar, pattern=pat)), scope="str")
_register("endswith", _str_fn(impl=lambda ar, pat: pc.ends_with(ar, pattern=pat)), scope="str")
_register("equals", _str_fn(impl=lambda ar, y: pc.equal(ar, _sarr(y) if not isinstance(y, str) else y)), scope="str")
_register("notequals", _str_fn(impl=lambda ar, y: pc.not_equal(ar, _sarr(y) if not isinstance(y, str) else y)), scope="str")


def _str_count(ar, pat, regex=False):
    if regex:
        return pc.count_substring_regex(ar, pat)
    return pc.count_substring(ar, pat)


_register("count", _str_fn(impl=_str_count), scope="str")
_register("find", _str_fn(impl=lambda ar, sub, start=0, end=None: pc.find_substring(ar, sub)), scope="str")
_register("rfind", _str_fn(impl=lambda ar, sub, start=0, end=None: pc.find_substring(ar.slice(0), sub)), scope="str")


def _str_replace(ar, pat, repl, n=-1, flags=0, regex=False):
    if regex:
        return pc.replace_substring_regex(ar, pattern=pat, replacement=repl, max_replacements=None if n == -1 else n)
    return pc.replace_substring(ar, pattern=pat, replacement=repl, max_replacements=None if n == -1 else n)


_register("replace", _str_fn(impl=_str_replace), scope="str")


def _str_slice(ar, start=0, stop=None):
    return pc.utf8_slice_codeunits(ar, start=start, stop=stop if stop is not None else np.iinfo(np.int32).max)


_register("slice", _str_fn(impl=_str_slice), scope="str")
_register("get", _str_fn(impl=lambda ar, i: pc.utf8_slice_codeunits(ar, start=i, stop=i + 1 if i != -1 else None)), scope="str")


def _str_pad(ar, width, side="left", fillchar=" "):
    if side == "left":
        return pc.utf8_lpad(ar, width=width, padding=fillchar)
    if side == "right":
        return pc.utf8_rpad(ar, width=width, padding=fillchar)
    return pc.utf8_center(ar, width=width, padding=fillchar)


_register("pad", _str_fn(impl=_str_pad), scope="str")
_register("ljust", _str_fn(impl=lambda ar, width, fillchar=" ": pc.utf8_rpad(ar, width=width, padding=fillchar)), scope="str")
_register("rjust", _str_fn(impl=lambda ar, width, fillchar=" ": pc.utf8_lpad(ar, width=width, padding=fillchar)), scope="str")
_register("center", _str_fn(impl=lambda ar, width, fillchar=" ": pc.utf8_center(ar, width=width, padding=fillchar)), scope="str")
_register("zfill", _str_fn(impl=lambda ar, width: pc.utf8_lpad(ar, width=width, padding="0")), scope="str")


def _str_cat(ar, other):
    other = _sarr(other) if not isinstance(other, str) else other
    return pc.binary_join_element_wise(ar, other, "")


_register("cat", _str_fn(impl=_str_cat), scope="str")
_register("concat", _str_fn(impl=_str_cat), scope="str")


def _str_repeat(ar, repeats):
    return pc.binary_repeat(ar, repeats)


_register("repeat", _str_fn(impl=_str_repeat), scope="str")


def _str_split(ar, pattern=None, max_splits=-1):
    if pattern is None:
        return pc.utf8_split_whitespace(ar, max_splits=None if max_splits == -1 else max_splits)
    return pc.split_pattern(ar, pattern=pattern, max_splits=None if max_splits == -1 else max_splits)


def _str_rsplit(ar, pattern=None, max_splits=-1):
    if pattern is None:
        return pc.utf8_split_whitespace(ar, max_splits=None if max_splits == -1 else max_splits, reverse=True)
    return pc.split_pattern(ar, pattern=pattern, max_splits=None if max_splits == -1 else max_splits, reverse=True)


_register("split", _str_fn(impl=_str_split), scope="str")
_register("rsplit", _str_fn(impl=_str_rsplit), scope="str")


def _str_join(x, sep):
    ar = _sarr(x)
    return StringOps(pc.binary_join(ar, sep))


_register("join", _str_join, scope="str")


def _str_extract_regex(x, pattern):
    ar = _sarr(x)
    return pc.extract_regex(ar, pattern=pattern)


_register("extract_regex", _str_extract_regex, scope="str")
_register("index", _str_fn(impl=lambda ar, sub, start=0, end=None: pc.find_substring(ar, sub)), scope="str")
_register("rindex", functions["str_rfind"].host, scope="str")


# struct scope: struct field access
def _struct_get(x, field):
    ar = x.ar if isinstance(x, StringOps) else x
    if isinstance(ar, pa.ChunkedArray):
        ar = ar.combine_chunks()
    out = ar.field(field) if hasattr(ar, "field") else pc.struct_field(ar, field)
    return _str_wrap(out) if (pa.types.is_string(out.type) or pa.types.is_large_string(out.type)) else out


_register("get", _struct_get, scope="struct")
_register("project", lambda x, fields: x, scope="struct")


def host_namespace():
    """Name → callable for host-mode expression eval."""
    return {name: fdef.host for name, fdef in functions.items()}


def device_namespace():
    """Name → MV-lifted callable for device (traced) expression eval; only
    functions with a device implementation appear."""
    out = {}
    for name, fdef in functions.items():
        if fdef.device is not None:
            out[name] = fdef.device
    return out


def has_device_impl(name):
    fdef = functions.get(name)
    return fdef is not None and fdef.device is not None


# ---------------------------------------------------------------------------
# str_pandas shadow scope (reference: functions.py:2427-2448 registers a
# pandas-backed mirror of every str function so `str_pandas_upper(x)` etc.
# evaluate in expression strings / state files; pandas semantics where the
# Series.str method exists, falling back to our pyarrow impl otherwise)
# ---------------------------------------------------------------------------

def _make_str_pandas(short, fallback):
    def wrapper(*args, **kwargs):
        import pandas
        x, rest = args[0], args[1:]
        ar = x.ar if isinstance(x, StringOps) else x
        series = pandas.Series(np.asarray(ar), dtype="string")
        method = getattr(series.str, short, None)
        if method is None:
            return fallback.host(*args, **kwargs)
        return StringOps(pa.array(method(*rest, **kwargs), from_pandas=True))
    return wrapper


for _short, _fdef in list(scopes["str"].items()):
    _register(_short, _make_str_pandas(_short, _fdef), scope="str_pandas")
del _short, _fdef


# ---------------------------------------------------------------------------
# geometry: point-in-polygon for lasso selections
# (reference: pnpoly C kernel, src/vaexfast.cpp:1856 — here a vectorized
# crossing-number test that runs identically under numpy and jnp)
# ---------------------------------------------------------------------------

def _pnpoly(xp, x, y, xs, ys):
    inside = xp.zeros(xp.asarray(x).shape, dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[j], ys[j]
        denom = (yj - yi) if (yj - yi) != 0 else 1e-300
        cond = ((yi > y) != (yj > y)) & (x < (xj - xi) * (y - yi) / denom + xi)
        inside = inside ^ cond
        j = i
    return inside


@register_function(name="_f64_minmax_key")
def _f64_minmax_key(x):
    """f64 → order-preserving signed-i64 key, HOST-only (no device impl, so
    the executor ships the pre-computed keys to the device).

    On TPU neither f64 compares (emulated, ~1-2 ulp noise) nor any 64-bit
    bitcast-convert (x64 rewriter limitation) are usable, so the bitwise
    min/max key transform (ops/gridagg._f64_to_key) runs here in numpy;
    NaNs surface as masked values so the aggregation skips them exactly
    like the reference's nan handling (agg_minmax semantics)."""
    mask = None
    if np.ma.isMaskedArray(x):
        mask = np.ma.getmaskarray(x)
        x = x.data
    values = np.ascontiguousarray(x, dtype=np.float64)
    bits = values.view(np.int64)
    keys = np.where(bits < 0, bits ^ np.int64(0x7FFFFFFFFFFFFFFF), bits)
    nan = np.isnan(values)
    if nan.any() or mask is not None:
        full = nan if mask is None else (nan | mask)
        return np.ma.MaskedArray(keys, mask=full)
    return keys


@register_function(name="_f64_sum_bits")
def _f64_sum_bits(x):
    """f64 → raw i64 bit pattern, HOST-only: the lossless way f64 values
    reach the chip for precision='float64' sums (the axon platform stores
    device f64 as an f32 double-double, so f64 H2D transfers round at
    ~2^-48; i64 transfers are exact).  The exact-limb accumulator decodes
    mantissa/exponent integerly on device (ops/gridagg._decode_float_bits).
    NaNs surface as masked values so the aggregation skips them exactly like
    the reference (agg_sum.cpp:98-126)."""
    mask = None
    if np.ma.isMaskedArray(x):
        mask = np.ma.getmaskarray(x)
        x = x.data
    values = np.ascontiguousarray(x, dtype=np.float64)
    bits = values.view(np.int64)
    nan = np.isnan(values)
    if nan.any() or mask is not None:
        full = nan if mask is None else (nan | mask)
        return np.ma.MaskedArray(bits, mask=full)
    return bits


@register_function(name="_lasso")
def _lasso(x, y, xs, ys):
    x = np.asarray(x)
    y = np.asarray(y)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return _pnpoly(np, x, y, xs, ys)


def _lasso_device(x, y, xs, ys):
    import jax.numpy as jnp
    xv, yv = dispatch.unwrap(x), dispatch.unwrap(y)
    xsv = np.asarray(dispatch.unwrap(xs))
    ysv = np.asarray(dispatch.unwrap(ys))
    out = _pnpoly(jnp, xv, yv, xsv, ysv)
    m = MV.combine_masks(dispatch.mask_of(x), dispatch.mask_of(y))
    if m is not None:
        out = out & ~m
    return MV(out, None)


functions["_lasso"].device = _lasso_device
