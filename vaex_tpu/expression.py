"""Expressions: strings with operator overloading, lazily evaluated.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/
expression.py (Meta metaclass :94, Expression :386): building blocks of every
computation.  ``df.x + df.y`` is the *string* ``"(x + y)"`` bound to the
DataFrame; nothing runs until a pass streams chunks through the compiled
program.  Namespaces ``.str``/``.dt``/``.td``/``.struct`` expose the scoped
registry functions.
"""

from __future__ import annotations

import functools

import numpy as np

from . import expresso, functions as functions_mod
from .datatype import DataType

_binary_ops = [
    ("add", "+"), ("sub", "-"), ("mul", "*"), ("truediv", "/"),
    ("floordiv", "//"), ("mod", "%"), ("pow", "**"),
    ("and", "&"), ("or", "|"), ("xor", "^"),
    ("lshift", "<<"), ("rshift", ">>"),
    ("lt", "<"), ("le", "<="), ("gt", ">"), ("ge", ">="),
    ("eq", "=="), ("ne", "!="),
]
_unary_ops = [("neg", "-"), ("pos", "+"), ("invert", "~")]
_comparison_names = {"lt", "le", "gt", "ge", "eq", "ne"}


def _repr_operand(df, value):
    if isinstance(value, Expression):
        return f"({value.expression})"
    if isinstance(value, str):
        return repr(value)
    if isinstance(value, np.ndarray) and value.ndim == 0:
        value = value[()]  # 0-d arrays embed as scalars
    if isinstance(value, np.timedelta64):
        # embed as an expression call, NOT a df variable — comparing against
        # a scalar must not mutate the frame (reference: expression.py:137-150,
        # datetime_test.py test_no_change_fingerprint)
        unit, step = np.datetime_data(value.dtype)
        assert step == 1
        return f"scalar_timedelta({value.astype(np.int64).item()}, {unit!r})"
    if isinstance(value, np.datetime64):
        return f'scalar_datetime("{value}")'
    if isinstance(value, np.ndarray):
        var = df.add_variable("arr_", value, unique=True)
        return var
    if isinstance(value, (list, tuple)):
        if any(isinstance(v, Expression) for v in value):
            return "[" + ", ".join(_repr_operand(df, v) for v in value) + "]"
        return repr(list(value))
    if isinstance(value, (bool, np.bool_)):
        return str(bool(value))
    if isinstance(value, (int, np.integer)):
        return repr(int(value))
    if isinstance(value, (float, np.floating)):
        return repr(float(value))
    return repr(value)


class Meta(type):
    """Generates all dunder operators building expression strings
    (reference: vaex/expression.py:94)."""

    def __new__(mcs, name, bases, attrs):
        for opname, symbol in _binary_ops:
            def binop(self, other, _symbol=symbol):
                if isinstance(other, str):
                    # a string operand against a datetime column compares as
                    # a datetime scalar (reference: expression.py:107-108)
                    try:
                        if self.data_type().is_datetime:
                            other = np.datetime64(other)
                    except Exception:
                        pass
                other_repr = _repr_operand(self.df, other)
                return Expression(self.df, f"({self.expression} {_symbol} {other_repr})")

            def rbinop(self, other, _symbol=symbol):
                other_repr = _repr_operand(self.df, other)
                return Expression(self.df, f"({other_repr} {_symbol} {self.expression})")

            attrs.setdefault(f"__{opname}__", binop)
            if opname not in _comparison_names:
                attrs.setdefault(f"__r{opname}__", rbinop)
        for opname, symbol in _unary_ops:
            def unop(self, _symbol=symbol):
                return Expression(self.df, f"({_symbol}({self.expression}))")
            attrs.setdefault(f"__{opname}__", unop)
        attrs.setdefault("__abs__", lambda self: Expression(self.df, f"abs({self.expression})"))

        # numpy-bridge functions as methods: df.x.abs(), df.x.log()...
        for fname in ["abs", "sqrt", "exp", "log", "log1p", "log10", "sin", "cos",
                      "tan", "arcsin", "arccos", "arctan", "sinh", "cosh", "tanh",
                      "floor", "ceil", "round", "clip", "maximum", "minimum",
                      "isfinite", "isinf"]:
            def method(self, *args, _fname=fname, **kwargs):
                arg_strs = [_repr_operand(self.df, a) for a in args]
                kw_strs = [f"{k}={_repr_operand(self.df, v)}" for k, v in kwargs.items()]
                all_args = ", ".join([self.expression] + arg_strs + kw_strs)
                return Expression(self.df, f"{_fname}({all_args})")
            attrs.setdefault(fname, method)
        return type.__new__(mcs, name, bases, attrs)


class ScopeAccessor:
    """`.str` / `.dt` / `.td` / `.struct` namespaces (reference:
    vaex/expression.py StringOperations:150 etc.)."""

    def __init__(self, expression, scope):
        self._expression = expression
        self._scope = scope

    def __getattr__(self, name):
        fdef = functions_mod.scopes.get(self._scope, {}).get(name)
        if fdef is None:
            raise AttributeError(f"no function {name!r} in scope {self._scope!r}")
        expr = self._expression

        def call(*args, **kwargs):
            arg_strs = [_repr_operand(expr.df, a) for a in args]
            kw_strs = [f"{k}={_repr_operand(expr.df, v)}" for k, v in kwargs.items()]
            all_args = ", ".join([expr.expression] + arg_strs + kw_strs)
            return Expression(expr.df, f"{fdef.name}({all_args})")

        if fdef.as_property:
            return call()
        return call


class Expression(metaclass=Meta):
    """Reference: vaex/expression.py:386."""

    def __init__(self, df, expression, _ast=None):
        if isinstance(expression, Expression):
            expression = expression.expression
        self.df = df
        self.expression = str(expression)
        self._ast = _ast

    @property
    def ast(self):
        if self._ast is None:
            self._ast = expresso.parse_expression(self.expression)
        return self._ast

    def __str__(self):
        return self.expression

    def __repr__(self):
        return self._repr_plain()

    def _repr_plain(self):
        from .formatting import repr_expression
        return repr_expression(self)

    def __hash__(self):
        return hash((id(self.df), self.expression))

    def __bool__(self):
        """`==`/`!=` build expressions; identity comparison shortcut so
        `expr == expr` in boolean context behaves (reference semantics)."""
        if self.expression.startswith("(") and " == " in self.expression:
            left, _, right = self.expression[1:-1].partition(" == ")
            if left == right:
                return True
        if " != " in self.expression:
            left, _, right = self.expression[1:-1].partition(" != ")
            if left == right:
                return False
        return True

    def __len__(self):
        return len(self.df)

    def __call__(self, *args, **kwargs):
        """Call expression: when this expression names a registered function,
        build the call expression (reference: add_function returns a callable
        Expression, vaex/expression.py)."""
        arg_strs = [_repr_operand(self.df, a) for a in args]
        kw_strs = [f"{k}={_repr_operand(self.df, v)}" for k, v in kwargs.items()]
        return Expression(self.df, f"{self.expression}({', '.join(arg_strs + kw_strs)})")

    def __getitem__(self, item):
        if isinstance(item, slice):
            return Expression(self.df[item], self.expression)
        if isinstance(item, str):
            return Expression(self.df, f"struct_get({self.expression}, {item!r})")
        if isinstance(item, int):
            return Expression(self.df, f"struct_get({self.expression}, {item})")
        raise TypeError(f"cannot index expression with {item!r}")

    # -- namespaces
    @property
    def str(self):
        return ScopeAccessor(self, "str")

    @property
    def dt(self):
        return ScopeAccessor(self, "dt")

    @property
    def td(self):
        return ScopeAccessor(self, "td")

    @property
    def struct(self):
        return ScopeAccessor(self, "struct")

    # -- introspection
    def expand(self, stop=None):
        """Inline virtual columns (reference: vaex/expression.py:678)."""
        stop = stop or []
        translation = {}
        for name in expresso.names(self.expression):
            if name in self.df.virtual_columns and name not in stop:
                sub = Expression(self.df, self.df.virtual_columns[name]).expand(stop=stop).expression
                translation[name] = f"({sub})"
        if translation:
            return Expression(self.df, expresso.translate(self.expression, translation))
        return self

    def dependencies(self):
        """All leaf columns + variables this expression depends on
        (reference: vaex/expression.py:725 variables())."""
        return self.variables()

    def variables(self, ourself=False, expand_virtual=True, include_virtual=False):
        fnames = set(functions_mod.functions) | set(self.df.functions)
        seen = []

        def walk(expr_str):
            for name in expresso.names(expr_str):
                if name in fnames and name not in self.df.get_column_names(hidden=True):
                    continue
                if name in self.df.virtual_columns:
                    if include_virtual and name not in seen:
                        seen.append(name)
                    if expand_virtual:
                        walk(self.df.virtual_columns[name])
                elif name not in seen:
                    seen.append(name)

        walk(self.expression)
        if ourself and self.expression not in seen:
            seen.append(self.expression)
        return set(seen)

    def root_columns(self):
        return {name for name in self.variables() if name in self.df.dataset}

    def fingerprint(self):
        from . import utils
        return utils.fingerprint("expression", self.expand().expression)

    # -- types & values
    def data_type(self, array_type=None):
        return self.df.data_type(self, array_type=array_type)

    @property
    def dtype(self):
        return self.data_type()

    def is_masked(self):
        return self.df.is_masked(self)

    def evaluate(self, i1=None, i2=None, parallel=True, array_type=None):
        return self.df.evaluate(self, i1=i1, i2=i2, parallel=parallel, array_type=array_type)

    @property
    def values(self):
        return self.evaluate()

    def to_numpy(self):
        from . import array_types
        return array_types.to_numpy(self.evaluate())

    def to_arrow(self):
        from . import array_types
        return array_types.to_arrow(self.evaluate())

    def tolist(self, i1=None, i2=None):
        values = self.evaluate(i1=i1, i2=i2)
        if hasattr(values, "to_pylist"):
            return values.to_pylist()
        if np.ma.isMaskedArray(values):
            return values.tolist()  # masked entries become None
        return np.asarray(values).tolist()

    def __array__(self, dtype=None):
        values = self.to_numpy()
        return np.asarray(values, dtype=dtype) if dtype is not None else values

    # -- transformations
    def astype(self, data_type):
        if str(data_type) in ("str", "string", "large_string"):
            return Expression(self.df, f"_astype({self.expression}, 'str')")
        return Expression(self.df, f"_astype({self.expression}, {str(DataType(np.dtype(str(data_type))))!r})")

    def abs(self):
        return Expression(self.df, f"abs({self.expression})")

    def format(self, fmt):
        """%-format values to strings (reference: functions.py:2417)."""
        return Expression(self.df, f"format({self.expression}, {fmt!r})")

    def fillna(self, value):
        expr = self._upcast_for(value)
        return Expression(self.df, f"fillna({expr.expression}, {_repr_operand(self.df, value)})")

    def fillmissing(self, value):
        expr = self._upcast_for(value)
        return Expression(self.df, f"fillmissing({expr.expression}, {_repr_operand(self.df, value)})")

    def fillnan(self, value):
        expr = self._upcast_for(value)
        return Expression(self.df, f"fillnan({expr.expression}, {_repr_operand(self.df, value)})")

    def _upcast_for(self, value):
        """Widen an integer expression so `value` fits (reference:
        expression.py:1091 _upcast_for / utils.required_dtype_for_int)."""
        try:
            dtype = self.data_type()
        except Exception:
            return self
        if not (dtype.is_numpy and dtype.numpy.kind in "iu" and isinstance(value, (int, np.integer))):
            return self
        value = int(value)
        info = np.iinfo(dtype.numpy)
        if info.min <= value <= info.max:
            return self
        signed = dtype.numpy.kind == "i" or value < 0
        kinds = ["int8", "int16", "int32", "int64"] if signed else ["uint8", "uint16", "uint32", "uint64"]
        for name in kinds:
            cand = np.dtype(name)
            if cand.itemsize <= dtype.numpy.itemsize:
                continue
            ci = np.iinfo(cand)
            if ci.min <= value <= ci.max:
                return self.astype(name)
        return self.astype("float64")

    def isna(self):
        return Expression(self.df, f"isna({self.expression})")

    def notna(self):
        return Expression(self.df, f"notna({self.expression})")

    def isnan(self):
        return Expression(self.df, f"isnan({self.expression})")

    def notnan(self):
        return Expression(self.df, f"notnan({self.expression})")

    def ismissing(self):
        return Expression(self.df, f"ismissing({self.expression})")

    def notmissing(self):
        return Expression(self.df, f"notmissing({self.expression})")

    def where(self, x, y=None):
        if y is None:
            return Expression(self.df, f"where({self.expression}, {_repr_operand(self.df, x)}, {self.expression})")
        return Expression(self.df, f"where({self.expression}, {_repr_operand(self.df, x)}, {_repr_operand(self.df, y)})")

    def isin(self, values, use_hashmap=True):
        """Membership against a value set (reference: vaex/expression.py:1194)."""
        values = np.asarray(values) if not isinstance(values, (list, tuple)) else values
        var = self.df.add_variable("isin_values_", np.asarray(values), unique=True)
        return Expression(self.df, f"_isin({self.expression}, {var})")

    def map(self, mapper, nan_value=None, missing_value=None, default_value=None, allow_missing=False, axis=None):
        """Map values through a dict (reference: vaex/expression.py:1298)."""
        keys = list(mapper.keys())
        values = list(mapper.values())

        def _is_nan(k):
            try:
                return bool(np.isnan(k))
            except (TypeError, ValueError):
                return False

        if sum(_is_nan(k) for k in keys) > 1:
            raise ValueError("multiple nan values provided as keys in the mapper")
        if default_value is not None:
            allow_missing = True
        if not allow_missing:
            # the mapper keys must cover every value present in the data
            # (reference: expression.py map 'Missing %i values in mapper')
            found = self.unique(array_type="list")
            plain_keys = {k for k in keys if k is not None and not _is_nan(k)}
            missing = {k for k in found
                       if k is not None and not _is_nan(k) and k not in plain_keys}
            if missing:
                raise ValueError(f"Missing {len(missing)} values in mapper: {missing}")
        use_missing = allow_missing or default_value is None
        key_var = self.df.add_variable("map_keys_", np.asarray(keys), unique=True)
        val_var = self.df.add_variable("map_values_", np.asarray(values) if not any(isinstance(v, str) for v in values) else np.asarray(values, dtype=object), unique=True)
        use_missing_flag = default_value is None and allow_missing
        return Expression(self.df, f"_map({self.expression}, {key_var}, {val_var}, default_value={_repr_operand(self.df, default_value)}, use_missing={use_missing_flag})")

    def apply(self, f, vectorize=False, multiprocessing=False):
        """Lazily apply a python UDF (reference: vaex/expression.py:1238).

        The UDF runs on the host per chunk; numeric, jax-traceable UDFs can be
        registered via df.add_function(..., traceable=True) to stay on-device.
        """
        return self.df.apply(f, arguments=[self], vectorize=vectorize, multiprocessing=multiprocessing)

    # -- reductions (forward to df)
    def count(self, **kwargs):
        return self.df.count(self.expression, **kwargs)

    def sum(self, **kwargs):
        return self.df.sum(self.expression, **kwargs)

    def mean(self, **kwargs):
        return self.df.mean(self.expression, **kwargs)

    def std(self, **kwargs):
        return self.df.std(self.expression, **kwargs)

    def var(self, **kwargs):
        return self.df.var(self.expression, **kwargs)

    def min(self, **kwargs):
        return self.df.min(self.expression, **kwargs)

    def max(self, **kwargs):
        return self.df.max(self.expression, **kwargs)

    def minmax(self, **kwargs):
        return self.df.minmax(self.expression, **kwargs)

    def unique(self, dropna=False, dropnan=False, dropmissing=False, selection=None, limit=None, array_type="list"):
        return self.df.unique(self.expression, dropna=dropna, dropnan=dropnan, dropmissing=dropmissing,
                              selection=selection, limit=limit, array_type=array_type)

    def nunique(self, dropna=False, dropnan=False, dropmissing=False, selection=None):
        return self.df.nunique(self.expression, dropna=dropna, dropnan=dropnan, dropmissing=dropmissing, selection=selection)

    def value_counts(self, dropna=False, dropnan=False, dropmissing=False, ascending=False, progress=False):
        """pandas-style value counts Series (reference: vaex/expression.py:994
        value_counts; ordering/missing-label semantics cpu.py:263-280)."""
        import pandas as pd
        if dropna:
            dropnan = True
            dropmissing = True
        keys, counts = self.df._value_counts(self.expression, dropnan=dropnan, dropmissing=dropmissing)
        order = np.argsort(counts)
        if not ascending:
            order = order[::-1]
        keys = [keys[i] for i in order]
        counts = [int(counts[i]) for i in order]
        # a missing-value key is labeled "missing" and listed first
        # (reference: cpu.py:270-276)
        if None in keys:
            i = keys.index(None)
            keys.pop(i)
            keys = ["missing"] + keys
            counts = [counts.pop(i)] + counts
        return pd.Series(counts, index=keys)

    def countna(self):
        return self.isna().astype("int64").sum()

    def countnan(self):
        return self.isnan().astype("int64").sum()

    def countmissing(self):
        return self.ismissing().astype("int64").sum()

    def dropna(self):
        return self.df.dropna(column_names=[self.expression])[self.expression]

    def dropnan(self):
        return self.df.dropnan(column_names=[self.expression])[self.expression]

    def dropmissing(self):
        return self.df.dropmissing(column_names=[self.expression])[self.expression]

    def sample(self, n=None, frac=None, replace=False, random_state=None):
        return self.df.sample(n=n, frac=frac, replace=replace, random_state=random_state)[self.expression]

    # -- reference-parity helpers
    def ast_names(self):
        return expresso.names(self.expression)

    def index_values(self):
        """Category codes of this expression (reference: expression.py
        index_values): ordinal-encoded/categorized columns subtract their
        offset; arrow dictionary columns expose their indices."""
        name = self.expression
        df = self.df
        if name in getattr(df, "_categories", {}):
            offset = df.category_offset(name)
            return Expression(df, f"({name} - {offset})") if offset else self
        return Expression(df, f"index_values({name})")

    def derivative(self, var, simplify=True):
        """Symbolic derivative expression (reference: expression.py derivative)."""
        return Expression(self.df, expresso.derivative(self.expression, str(var), simplify))

    def is_string(self):
        """Method (not property) for reference parity
        (reference: expression.py:1430)."""
        return self.data_type().is_string

    @property
    def masked(self):
        return self.is_masked()

    @property
    def ndim(self):
        return 1

    @property
    def shape(self):
        return (len(self.df),)

    def skew(self, **kwargs):
        return self.df.skew(self.expression, **kwargs)

    def kurtosis(self, **kwargs):
        return self.df.kurtosis(self.expression, **kwargs)

    def nop(self):
        """Evaluate and discard (IO benchmark helper)."""
        self.evaluate()

    def to_pandas_series(self):
        import pandas as pd
        values = self.evaluate()
        if hasattr(values, "to_pandas"):
            return pd.Series(values.to_pandas())
        return pd.Series(np.asarray(values))

    def to_dask_array(self, chunks="auto"):
        raise NotImplementedError("dask is not available in this environment")

    @property
    def transient(self):
        """True when not directly backed by storage (reference: transient)."""
        return self.expression not in self.df.dataset

    @property
    def str_pandas(self):
        """pandas-backed string namespace: same functions, pandas semantics
        (reference exposes both .str and .str_pandas; pyarrow covers both
        here)."""
        return self.str

    # -- misc
    def expand_macro(self):
        return self.expand()

    def _rename(self, old, new, inplace=False):
        new_expr = expresso.translate(self.expression, {old: new})
        if inplace:
            self.expression = new_expr
            self._ast = None
            return self
        return Expression(self.df, new_expr)

    def copy(self, df=None):
        return Expression(df if df is not None else self.df, self.expression)

    def jit_jax(self):
        """No-op: on TPU every expression already compiles via XLA (the
        reference's opt-in jit_numba/jit_cuda, vaex/expression.py:1113)."""
        return self

    jit_numba = jit_jax
    jit_cuda = jit_jax

    def __iter__(self):
        values = self.evaluate()
        if hasattr(values, "to_pylist"):
            return iter(values.to_pylist())
        return iter(np.asarray(values))
