"""The lazy DataFrame frontend.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/
dataframe.py (DataFrame:146, DataFrameLocal:5717, 7371 LoC): column
bookkeeping, virtual columns, variables, named selections + filter, all
statistics entry points (`count/mean/std/var/skew/kurtosis/cov/correlation/
minmax/median_approx/percentile_approx/mode/mutual_information`), limits
estimation, state get/set, export, evaluation and slicing.  Computation is
delegated to the streaming TPU executor (execution.py); everything here is
lazy metadata.
"""

from __future__ import annotations

import collections
import copy as copy_mod
import functools
import warnings

import numpy as np

from . import agg as agg_mod
from . import array_types, expresso, selections as selections_mod, settings, utils
from .column import Column
from .datatype import DataType
from .delayed import Promise, delayed, delayed_args, delayed_list
from .dispatch import StringOps
from .execution import get_main_executor
from .expression import Expression
from .ops.gridagg import BinnerOrdinal, BinnerScalar
from .scopes import BlockScope
from .selections import FILTER_SELECTION_NAME
from .tasks import TaskHashmapUniqueCreate, TaskMapReduce

DEFAULT_SHAPE = 128

def _default_selection_index():
    return -1  # module-level (not a lambda) so DataFrames pickle


_dataframe_accessors = {}


def register_dataframe_accessor(name, cls=None, override=False):
    def wrapper(cls):
        _dataframe_accessors[name] = cls
        return cls
    if cls is not None:
        return wrapper(cls)
    return wrapper


def _ensure_string_expression(e):
    return e.expression if isinstance(e, Expression) else str(e)


def _column_ref(name):
    """Expression text referencing a column: non-identifier names use the
    df['name'] subscript form (reference: utils.py:417 valid_expression)."""
    import keyword
    if name.isidentifier() and not keyword.iskeyword(name):
        return name
    return f"df[{name!r}]"


def _ensure_strings_from_expressions(expressions):
    if isinstance(expressions, (list, tuple)):
        return [_ensure_string_expression(e) for e in expressions]
    return _ensure_string_expression(expressions)


class DataFrame:
    """Reference: vaex/dataframe.py:146."""

    def __init__(self, name=None, executor=None):
        self.name = name or "dataframe"
        self._executor = executor
        self.virtual_columns = {}
        self.variables = {"pi": np.pi, "e": np.e, "nan": np.nan, "inf": np.inf}
        self.functions = {}
        self.selection_histories = collections.defaultdict(list)
        self.selection_history_indices = collections.defaultdict(_default_selection_index)
        self._selection_masks = {}
        self._renamed_columns = []
        self.column_names = []
        self._column_aliases = {}
        self.units = {}
        self.descriptions = {}
        self.ucds = {}
        self.description = None
        self._categories = {}
        self._future_behaviour = False
        self._auto_fraction = False
        self._length_cache = {}
        # emitted as (df, name) whenever a named selection changes — the
        # jupyter reactive layer links brushing across views through it
        # (reference: dataframe.py signal_selection_changed)
        from .events import Signal
        self.signal_selection_changed = Signal("selection_changed")

    # -- executor ------------------------------------------------------
    @property
    def executor(self):
        return self._executor or get_main_executor()

    @executor.setter
    def executor(self, executor):
        self._executor = executor

    def execute(self):
        """Run all scheduled (delayed) tasks in one streaming pass
        (reference: vaex/dataframe.py execute)."""
        self.executor.execute()

    async def execute_async(self):
        await self.executor.execute_async()

    def _delay(self, delay, promise, progressbar=False):
        if delay:
            return promise
        self.execute()
        return promise.get()

    # -- columns -------------------------------------------------------
    def get_column_names(self, virtual=True, strings=True, hidden=False, regex=None, dtypes=None):
        names = []
        for name in self.column_names:
            if not hidden and name.startswith("__"):
                continue
            if not virtual and name in self.virtual_columns:
                continue
            if not strings and self.data_type(name).is_string:
                continue
            if regex is not None:
                import re
                if not re.match(regex, name):
                    continue
            if dtypes is not None:
                if self.data_type(name) not in [DataType(np.dtype(d)) if not isinstance(d, DataType) else d for d in dtypes]:
                    continue
            names.append(name)
        return names

    def get_names(self, hidden=False):
        return self.get_column_names(hidden=hidden)

    def __contains__(self, name):
        return name in self.column_names

    @property
    def col(self):
        """Attribute access to columns: df.col.x (reference: dataframe.py col)."""
        class Col:
            def __init__(col_self, df):
                col_self._df = df

            def __getattr__(col_self, name):
                return col_self._df[name]
        return Col(self)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in _dataframe_accessors and name in ("ml", "viz", "widget", "graphql", "geo", "astro", "struct"):
            # lazy accessor registration (reference: entry_points
            # 'vaex.dataframe.accessor', __init__.py:735-808)
            import importlib
            try:
                importlib.import_module(f"vaex_tpu.{name}")
            except ImportError:
                pass
        if name in _dataframe_accessors:
            acc = _dataframe_accessors[name](self)
            setattr(self, name, acc)
            return acc
        try:
            columns = object.__getattribute__(self, "column_names")
        except AttributeError:
            raise AttributeError(name)
        if name in columns:
            return self[name]
        raise AttributeError(f"{type(self).__name__!r} object has no attribute {name!r}")

    def __getitem__(self, item):
        if isinstance(item, int):
            return [self.evaluate(name, item, item + 1)[0] for name in self.get_column_names()]
        if isinstance(item, str):
            if item in self.column_names or item in self.virtual_columns:
                return Expression(self, _column_ref(item))
            # allow expressions directly
            expresso.validate_expression(item, set(self.get_column_names(hidden=True)) | set(self.variables),
                                         set(self._function_names()))
            return Expression(self, item)
        if isinstance(item, Expression):
            # boolean filtering
            return self.filter(item)
        if isinstance(item, (list, tuple)):
            df = self.copy(column_names=[_ensure_string_expression(e) for e in item])
            return df
        if isinstance(item, slice):
            start, stop, step = item.indices(len(self))
            assert step in (1, None)
            return self._slice(start, stop)
        raise TypeError(f"cannot index DataFrame with {item!r}")

    def __setitem__(self, name, value):
        if isinstance(value, Expression):
            if value.df is not self:
                value = value.copy(self)
            self.add_virtual_column(name, value.expression)
        elif isinstance(value, (np.ndarray,) + array_types.supported_arrow_array_types) or isinstance(value, Column):
            self.add_column(name, value)
        elif np.isscalar(value):
            self.add_virtual_column(name, repr(value))
        else:
            raise TypeError(f"cannot assign {type(value)} as a column")

    def __delitem__(self, name):
        name = _ensure_string_expression(name)
        self.drop(name, inplace=True)

    def __iter__(self):
        return iter(self.get_column_names())

    def keys(self):
        return self.get_column_names()

    def __dataframe__(self, nan_as_null=False, allow_copy=True):
        """DataFrame interchange protocol (reference: dataframe.py:264)."""
        from .dataframe_protocol import make_dataframe_interchange
        return make_dataframe_interchange(self, nan_as_null=nan_as_null, allow_copy=allow_copy)

    def _function_names(self):
        from . import functions as functions_mod
        return set(functions_mod.functions) | set(self.functions)

    def validate_expression(self, expression):
        expression = _ensure_string_expression(expression)
        names = set(self.get_column_names(hidden=True)) | set(self.variables) | set(self.virtual_columns)
        return expresso.validate_expression(expression, names, self._function_names())

    # -- variables / functions ----------------------------------------
    def add_variable(self, name, value, overwrite=True, unique=False):
        if unique:
            # content-dedupe with POSITION-STABLE names: identical values
            # reuse their existing variable; fresh values take the next free
            # sequential name.  (Names used to embed the value fingerprint,
            # which leaked table identity into expression strings and
            # defeated compiled-pass reuse across datasets — see execution
            # dynamic tables / _hashmap_table_vars.)
            fp = utils.fingerprint(value if not isinstance(value, np.ndarray)
                                   else utils.hash_array_data(value))
            fps = self.__dict__.setdefault("_variable_fps", {})
            if fp in fps and fps[fp] in self.variables:
                return fps[fp]
            i = 0
            while f"{name}{i}" in self.variables:
                i += 1
            name = f"{name}{i}"
            fps[fp] = name
        if unique or overwrite or name not in self.variables:
            self.variables[name] = value
        return name

    def get_variable(self, name):
        return self.variables[name]

    def set_variable(self, name, value):
        self.variables[name] = value

    def add_function(self, name, f, unique=False, traceable=False):
        from .serialize import UserFunction
        name = utils.find_valid_name(name, used=[] if not unique else list(self.functions))
        function = UserFunction(name, f, traceable=traceable)
        self.functions[name] = function
        return Expression(self, name)

    def apply(self, f, arguments=None, vectorize=True, multiprocessing=False):
        """Lazy UDF application (reference: dataframe.py apply)."""
        assert arguments is not None, "apply requires arguments="
        arguments = [_ensure_string_expression(e) for e in arguments]
        name = utils.find_valid_name(("lambda_" if f.__name__ == "<lambda>" else f.__name__), used=list(self.functions))
        traceable = getattr(f, "_vaex_traceable", False)
        if not vectorize:
            f = np.vectorize(f)
        lazy_function = self.add_function(name, f, unique=True, traceable=traceable and vectorize)
        return lazy_function(*[self[e] for e in arguments])

    # -- virtual columns ----------------------------------------------
    def add_virtual_column(self, name, expression, unique=False):
        expression = _ensure_string_expression(expression)
        if name in self.get_column_names(hidden=True) and name not in self.virtual_columns:
            # renaming a real column: hide it (reference: dataframe.py add_virtual_column)
            renamed = utils.find_valid_name("__" + name, used=self.get_column_names(hidden=True))
            self._rename_column(name, renamed)
            expression = expresso.translate(expression, {name: renamed})
        elif name in self.virtual_columns:
            # redefining a virtual column, possibly in terms of itself
            # (df['v'] = df.v + 1): hide the old definition under a fresh
            # name and rewrite every reference (reference renames ANY
            # existing column here, dataframe.py:3800-3804)
            renamed = utils.find_valid_name("__" + name, used=self.get_column_names(hidden=True))
            self.virtual_columns[renamed] = self.virtual_columns.pop(name)
            self.column_names[self.column_names.index(name)] = renamed
            for vname, vexpr in list(self.virtual_columns.items()):
                if vname != renamed:
                    self.virtual_columns[vname] = expresso.translate(vexpr, {name: renamed})
            expression = expresso.translate(expression, {name: renamed})
        self.virtual_columns[name] = expression
        if name not in self.column_names:
            self.column_names.append(name)
        # reject self-referential definitions up front (e.g. a virtual column
        # whose expression calls a UDF registered under the same name):
        # downstream expression expansion would recurse without bound
        try:
            self[name].root_columns()
        except RecursionError:
            del self.virtual_columns[name]
            if name in self.column_names:
                self.column_names.remove(name)
            raise ValueError(
                f"virtual column {name!r} is self-referential (its expression "
                f"{expression!r} depends on {name!r}); pick a different column "
                "or function name") from None
        return self[name]

    def _covariance_matrix_guess(self, columns, full=False):
        """σ/cov expression strings from the reference's column-name
        conventions (reference: dataframe.py:3598-3642): σ(x) from x+'_error'
        /'_uncertainty'/'e'/'_e' postfixes or 'e'/'e_' prefixes; cov(x, y)
        from '_cov'/'_covariance' postfixes, or '_correlation'/'_corr'
        scaled by both sigmas (x_y_cov = x_e * y_e * x_y_correlation)."""
        names = self.get_column_names()
        cols = _ensure_strings_from_expressions(columns)

        def sigma(x):
            for cand in (x + "_error", x + "_uncertainty", x + "e", x + "_e",
                         "e" + x, "e_" + x):
                if cand in names:
                    return cand
            if full:
                raise ValueError(f"no uncertainty column found for {x!r}")
            return None

        def cov(x, y):
            if x == y:
                s = sigma(x)
                return f"{s} ** 2" if s else "0"
            for post in ("_cov", "_covariance"):
                for a, b in ((x, y), (y, x)):
                    if f"{a}_{b}{post}" in names:
                        return f"{a}_{b}{post}"
            for post in ("_correlation", "_corr"):
                for a, b in ((x, y), (y, x)):
                    if f"{a}_{b}{post}" in names:
                        sx, sy = sigma(x), sigma(y)
                        if sx and sy:
                            return f"{a}_{b}{post} * {sx} * {sy}"
            if full:
                raise ValueError(
                    f"no covariance or correlation column found for {x!r} and {y!r}")
            return "0"

        return [[cov(x, y) for y in cols] for x in cols]

    def _jacobian(self, expressions, variables):
        """∂fᵢ/∂xⱼ expression matrix via the symbolic differentiator
        (reference: dataframe.py:3644; expresso.derivative)."""
        exprs = _ensure_strings_from_expressions(expressions)
        return [[self[e].expand(stop=[v]).derivative(v) for v in variables]
                for e in exprs]

    def propagate_uncertainties(self, columns, depending_variables=None,
                                cov_matrix="auto",
                                covariance_format="{}_{}_covariance",
                                uncertainty_format="{}_uncertainty"):
        """First-order (Jacobian) uncertainty propagation for virtual columns
        (reference: dataframe.py:3648-3710).

        For each requested column f, adds ``f_uncertainty`` =
        ``sqrt(Σ_kl (∂f/∂x_k) cov(x_k, x_l) (∂f/∂x_l))`` as a virtual
        column, and pairwise ``fi_fj_covariance`` columns for distinct
        requested columns.  The covariance matrix of the depending variables
        is guessed from column-name conventions (_covariance_matrix_guess)
        unless given explicitly; derivatives are symbolic (expresso), so the
        result is itself a lazy expression that computes on device.

        :param columns: virtual columns (or expressions) to propagate
        :param depending_variables: input columns carrying uncertainties;
            auto-detected from the expanded expressions when None
        :param cov_matrix: 'auto' (guess, missing entries → 0), 'full'
            (guess, missing entries raise), or an explicit n×n list of
            expression strings
        """
        from .expression import Expression
        names = _ensure_strings_from_expressions(columns)
        exprs = [self.virtual_columns.get(name, name) for name in names]
        if depending_variables is None:
            deps = set()
            for e in exprs:
                deps |= Expression(self, e).expand().variables()
            depending_variables = sorted(deps)
        else:
            depending_variables = _ensure_strings_from_expressions(depending_variables)
        J = self._jacobian(exprs, depending_variables)
        if isinstance(cov_matrix, str):
            C = self._covariance_matrix_guess(depending_variables,
                                              full=cov_matrix == "full")
        else:
            C = [[_ensure_string_expression(e) for e in row] for row in cov_matrix]
        n = len(depending_variables)
        for i in range(len(exprs)):
            for j in range(i + 1):
                terms = []
                for k in range(n):
                    for l in range(n):
                        dik, djl = J[i][k].expression, J[j][l].expression
                        if dik == "0" or djl == "0" or C[k][l] == "0":
                            continue  # zero terms drop symbolically
                        terms.append(f"({dik}) * ({C[k][l]}) * ({djl})")
                sigma2 = expresso.simplify(" + ".join(terms)) if terms else "0"
                if i == j:
                    self.add_virtual_column(uncertainty_format.format(names[i]),
                                            f"sqrt({sigma2})")
                else:
                    self.add_virtual_column(
                        covariance_format.format(names[i], names[j]), sigma2)

    def add_virtual_columns_matrix3d(self, x, y, z, xnew, ynew, znew, matrix,
                                     translation=(0, 0, 0),
                                     propagate_uncertainties=False):
        """Linear 3-D transform (rows of `matrix` × (x, y, z) + translation)
        as virtual columns (reference: dataframe.py:3564-3585)."""
        x, y, z = _ensure_strings_from_expressions([x, y, z])
        for out, row, t in zip((xnew, ynew, znew), matrix, translation):
            expr = f"{row[0]} * {x} + {row[1]} * {y} + {row[2]} * {z}"
            if t:
                expr = f"{expr} + {t}"
            self.add_virtual_column(out, expresso.simplify(expr))
        if propagate_uncertainties:
            self.propagate_uncertainties([xnew, ynew, znew], [x, y, z])

    def add_column(self, name, data):
        raise NotImplementedError

    def rename(self, name, new_name, unique=False):
        """Rename a (virtual) column (reference: dataframe.py rename)."""
        if name == new_name:
            return name
        if name in self.virtual_columns:
            expr = self.virtual_columns.pop(name)
            self.virtual_columns[new_name] = expr
            self.column_names[self.column_names.index(name)] = new_name
        else:
            self._rename_column(name, new_name)
        # rewrite dependants
        for vname, vexpr in list(self.virtual_columns.items()):
            self.virtual_columns[vname] = expresso.translate(vexpr, {name: new_name})
        for histories in self.selection_histories.values():
            pass  # expression-based selections keep strings; acceptable: re-select after rename
        return new_name

    def _rename_column(self, name, new_name):
        raise NotImplementedError

    def drop(self, columns, inplace=False, check=True):
        columns = [columns] if isinstance(columns, (str, Expression)) else list(columns)
        columns = [_ensure_string_expression(c) for c in columns]
        df = self if inplace else self.copy()
        for name in columns:
            if name in df.virtual_columns:
                del df.virtual_columns[name]
                df.column_names.remove(name)
            elif name in df.column_names:
                depending = df._depending_columns(name) if check else []
                if depending:
                    # hide instead of drop (reference: dataframe.py drop hide)
                    hidden = "__" + name
                    df._rename_column(name, hidden)
                else:
                    df._drop_column(name)
            else:
                raise KeyError(name)
        return df

    def _depending_columns(self, name):
        out = []
        for vname, vexpr in self.virtual_columns.items():
            if name in expresso.names(vexpr):
                out.append(vname)
        return out

    def _drop_column(self, name):
        raise NotImplementedError

    # -- dtypes / schema ----------------------------------------------
    def data_type(self, expression, array_type=None, internal=False, axis=0):
        expression = _ensure_string_expression(expression)
        if expression == "*":
            return DataType(np.dtype("int64"))
        if expression in self.dataset and expression not in self.virtual_columns:
            # bare stored column: dtype comes from column metadata, never a
            # sample eval — a device (jax.Array) column sample costs a D2H
            # round-trip (~28ms on a tunneled TPU), and data_type runs ~20x
            # per aggregation query
            return array_types.data_type(self.dataset[expression])
        for _, _, chunk in self._evaluate_iterator_raw(
                [expression], i1=0, i2=min(1, self._length_unfiltered),
                filtered=False):
            sample = chunk[0]
            if array_types.is_jax_array(sample):
                # dtype reads off the device array's aval — NO np.asarray:
                # a 1-row D2H costs a full tunnel round-trip (~25ms) and
                # data_type runs several times per groupby/agg call
                return DataType(np.dtype(sample.dtype))
            return array_types.data_type(sample)
        sample = self.evaluate(expression, 0, min(1, self._length_unfiltered), filtered=False, parallel=False)
        dt = array_types.data_type(sample)
        return dt

    def dtype(self, expression):
        return self.data_type(expression)

    @property
    def dtypes(self):
        import pandas as pd
        names = self.get_column_names()
        return pd.Series([self.data_type(n) for n in names], index=names)

    def schema(self):
        return {name: self.data_type(name) for name in self.get_column_names()}

    def schema_arrow(self, reduce_large=False):
        import pyarrow as pa
        fields = []
        for name in self.get_column_names():
            dt = self.data_type(name)
            fields.append(pa.field(name, dt.arrow))
        return pa.schema(fields)

    def is_masked(self, column):
        column = _ensure_string_expression(column)
        if column in self.dataset:
            return self.dataset.is_masked(column)
        sample = self.evaluate(column, 0, min(1, self._length_unfiltered), filtered=False, parallel=False)
        return np.ma.isMaskedArray(sample)

    def is_string(self, expression):
        return self.data_type(expression).is_string

    def is_datetime(self, expression):
        return self.data_type(expression).is_datetime

    # -- categories ----------------------------------------------------
    def is_category(self, column):
        column = _ensure_string_expression(column)
        if column in self._categories:
            return True
        if column in self.dataset:
            return self.data_type(column).is_dictionary
        return False

    def category_labels(self, column, aslist=True):
        column = _ensure_string_expression(column)
        if column in self._categories:
            labels = self._categories[column]["labels"]
            return list(labels) if aslist else labels
        if self.is_category(column):
            col = self.dataset[column]
            ar = col[0:len(col)] if isinstance(col, Column) else col
            import pyarrow as pa
            if isinstance(ar, pa.ChunkedArray):
                ar = ar.combine_chunks()
            return ar.dictionary.to_pylist()
        raise ValueError(f"{column} is not a category")

    def category_count(self, column):
        column = _ensure_string_expression(column)
        if column in self._categories:
            return self._categories[column]["N"]
        return len(self.category_labels(column))

    def category_offset(self, column):
        column = _ensure_string_expression(column)
        if column in self._categories:
            return self._categories[column].get("min_value", 0)
        return 0

    def categorize(self, column, min_value=0, max_value=None, labels=None, inplace=False):
        """Mark an int column as categorical (reference: dataframe.py:5858
        categorize — when max_value is absent, [min, max] come from the data)."""
        df = self if inplace else self.copy()
        column = _ensure_string_expression(column)
        dt = df.data_type(column)
        if not (dt.is_numpy and dt.numpy.kind in "iu"):
            raise TypeError(f"Only integer columns can be marked as categorical, {column} is {dt}")
        if max_value is not None:
            labels = list(range(min_value, max_value + 1))
        else:
            vmin, vmax = df.minmax(column)
            vmin, vmax = int(vmin), int(vmax)
            if labels is None:
                labels = list(range(vmin, vmax + 1))
            min_value = vmin
            if (vmax - vmin) >= len(list(labels)):
                raise ValueError(f"value of {vmax} found, which is larger than number of labels {len(list(labels))}")
        labels = list(labels)
        df._categories[column] = dict(labels=labels, N=len(labels), min_value=min_value)
        return df

    def ordinal_encode(self, column, values=None, inplace=False, lazy=False):
        """Dictionary-encode a column IN PLACE of the original: the original
        moves to a hidden '__original_' name and `column` becomes the integer
        codes, marked categorical (reference: dataframe.py:5906 ordinal_encode).

        With explicit `values`, their order defines the codes and data values
        absent from the list become missing. Dense integer columns redirect to
        categorize() with a warning (reference:5929-5934)."""
        import warnings
        df = self if inplace else self.copy()
        column = _ensure_string_expression(column)
        if values is None:
            found = df.unique(column, dropmissing=True, array_type="list")
            dt = df.data_type(column)
            if dt.is_numpy and dt.numpy.kind in "iu" and len(found):
                mn, mx = int(min(found)), int(max(found))
                if mx - mn + 1 == len(found):
                    warnings.warn(f"It seems your column {column} is already ordinal encoded "
                                  f"(values between {mn} and {mx}), automatically switching to use df.categorize")
                    return df.categorize(column, min_value=mn, max_value=mx, inplace=inplace)
            values = found
        values = list(values)
        # the hashmap is built from the VALUES (their order defines the codes)
        dtype = df.data_type(column)
        if dtype.is_string or dtype.is_object:
            import pyarrow as pa
            keys = pa.array(values)
        else:
            keys = np.asarray(values, dtype=dtype.numpy)
        from . import hash as hash_mod
        hashmap = hash_mod.HashMapUnique.from_keys(keys)
        var = df.add_variable("hashmap_", hashmap, unique=True)
        code_expr = f"hashmap_apply({column}, {var}, check_missing=True)"
        if lazy:
            df[column] = Expression(df, code_expr)
        else:
            codes = df.evaluate(code_expr, filtered=False)
            small = np.min_scalar_type(-max(len(values), 1))  # signed minimal
            if np.ma.isMaskedArray(codes):
                codes = codes.astype(small)
            else:
                codes = np.asarray(codes).astype(small)
            df.rename(column, "__original_" + column, unique=True)
            df.add_column(column, codes)
        df._categories[column] = dict(labels=values, N=len(values), min_value=0)
        return df

    # -- filter & selections ------------------------------------------
    @property
    def filtered(self):
        return self.has_selection(FILTER_SELECTION_NAME)

    def _filter_expression(self):
        sel = self.get_selection(FILTER_SELECTION_NAME)
        return sel.to_expression(self)

    def filter(self, expression, mode="and"):
        """Lazy row filter (reference: dataframe.py:5332)."""
        df = self.copy()
        df.select(expression, mode=mode if df.filtered else "replace", name=FILTER_SELECTION_NAME)
        df._invalidate_length()
        return df

    def select(self, boolean_expression, mode="replace", name="default", executor=None):
        """Named selection (reference: dataframe.py select)."""
        boolean_expression = _ensure_string_expression(boolean_expression)
        current = self.get_selection(name)
        selection = selections_mod.SelectionExpression(boolean_expression, current, mode)
        self._selection(selection, name)

    def select_nothing(self, name="default"):
        self._selection(None, name)

    def select_inverse(self, name="default", executor=None):
        current = self.get_selection(name)
        if current is not None:
            self._selection(selections_mod.SelectionInvert(current), name)

    def select_box(self, spaces, limits, mode="replace", name="default"):
        exprs = []
        for space, limit in zip(spaces, limits):
            space = _ensure_string_expression(space)
            exprs.append(f"(({space}) >= {limit[0]}) & (({space}) < {limit[1]})")
        self.select(" & ".join(exprs), mode=mode, name=name)

    def select_rectangle(self, x, y, limits, mode="replace", name="default"):
        self.select_box([x, y], limits, mode=mode, name=name)

    def select_circle(self, x, y, xc, yc, r, mode="replace", name="default", inclusive=True):
        x = _ensure_string_expression(x)
        y = _ensure_string_expression(y)
        op = "<=" if inclusive else "<"
        self.select(f"(({x}) - {xc})**2 + (({y}) - {yc})**2 {op} {r}**2", mode=mode, name=name)

    def select_ellipse(self, x, y, xc, yc, width, height, angle=0, mode="replace", name="default", radians=False):
        import math
        if not radians:
            angle = math.radians(angle)
        x = _ensure_string_expression(x)
        y = _ensure_string_expression(y)
        expr = (f"((((({x}) - {xc}) * cos({angle}) + (({y}) - {yc}) * sin({angle})) / {width / 2})**2 + "
                f"(((({x}) - {xc}) * sin({angle}) - (({y}) - {yc}) * cos({angle})) / {height / 2})**2) <= 1")
        self.select(expr, mode=mode, name=name)

    def select_lasso(self, expression_x, expression_y, xsequence, ysequence, mode="replace", name="default"):
        current = self.get_selection(name)
        selection = selections_mod.SelectionLasso(_ensure_string_expression(expression_x),
                                                  _ensure_string_expression(expression_y),
                                                  xsequence, ysequence, current, mode)
        self._selection(selection, name)

    def select_non_missing(self, drop_nan=True, drop_masked=True, column_names=None, mode="replace", name="default"):
        column_names = column_names or self.get_column_names()
        current = self.get_selection(name)
        selection = selections_mod.SelectionDropNa(drop_nan, drop_masked, column_names, current, mode)
        self._selection(selection, name)

    def _selection(self, selection, name, executor=None):
        history = self.selection_histories[name]
        index = self.selection_history_indices[name]
        del history[index + 1:]
        history.append(selection)
        self.selection_history_indices[name] = len(history) - 1
        if name == FILTER_SELECTION_NAME:
            self._invalidate_length()
        self.signal_selection_changed.emit(self, name)

    def get_selection(self, name="default"):
        history = self.selection_histories.get(name, [])
        index = self.selection_history_indices.get(name, -1)
        if index == -1 or index >= len(history):
            return None
        return history[index]

    def has_selection(self, name="default"):
        return self.get_selection(name) is not None

    def selection_undo(self, name="default"):
        if self.selection_can_undo(name):
            self.selection_history_indices[name] -= 1
            if name == FILTER_SELECTION_NAME:
                self._invalidate_length()
            self.signal_selection_changed.emit(self, name)

    def selection_redo(self, name="default"):
        if self.selection_can_redo(name):
            self.selection_history_indices[name] += 1
            if name == FILTER_SELECTION_NAME:
                self._invalidate_length()
            self.signal_selection_changed.emit(self, name)

    def selection_can_undo(self, name="default"):
        return self.selection_history_indices.get(name, -1) > -1

    def selection_can_redo(self, name="default"):
        return self.selection_history_indices.get(name, -1) < len(self.selection_histories.get(name, [])) - 1

    def _selection_expression(self, selection):
        """Normalize a selection argument to an expression string or None."""
        if selection is None or selection is False:
            return None
        if selection is True:
            sel = self.get_selection("default")
            if sel is None:
                raise ValueError("selection=True but no selection made")
            return sel.to_expression(self)
        if isinstance(selection, selections_mod.Selection):
            return selection.to_expression(self)
        if isinstance(selection, (str, Expression)):
            s = _ensure_string_expression(selection)
            if self.has_selection(s):
                return self.get_selection(s).to_expression(self)
            return s
        raise TypeError(f"cannot interpret selection {selection!r}")

    def _selection_dependencies(self, selection):
        # isinstance guard: an Expression selection overloads == (it would
        # build a truthy comparison Expression and steal the filter branch)
        if isinstance(selection, str) and selection == FILTER_SELECTION_NAME and self.filtered:
            expr = self._filter_expression()
        else:
            expr = self._selection_expression(selection)
        if expr is None:
            return set()
        return Expression(self, expr).root_columns()

    def count_selected(self, name="default"):
        return self.count(selection=name)

    # -- fingerprint & state ------------------------------------------
    def fingerprint(self, dependencies=None, treeshake=False):
        deps_fp = self.dataset.fingerprint
        state = dict(
            virtual_columns=self.virtual_columns,
            variables={k: utils._fingerprint_normalize(v) for k, v in self.variables.items()},
            selections={name: (sel.encode() if sel is not None else None)
                        for name in self.selection_histories
                        for sel in [self.get_selection(name)]},
            column_names=self.column_names,
            active_range=[self._index_start, self._index_end],
        )
        return "dataframe-" + utils.fingerprint(deps_fp, state)

    def state_get(self, skip=None):
        """JSON-serializable pipeline state (reference: dataframe.py:2502)."""
        from .serialize import UserFunction
        functions = {name: f.encode() for name, f in self.functions.items() if isinstance(f, UserFunction)}
        return dict(
            version="tpu-1",
            column_names=list(self.column_names),
            virtual_columns=dict(self.virtual_columns),
            variables={k: _encode_variable(v) for k, v in self.variables.items()},
            functions=functions,
            selections={name: (self.get_selection(name).encode() if self.get_selection(name) else None)
                        for name in self.selection_histories},
            renamed_columns=list(self._renamed_columns),
            categories=copy_mod.deepcopy(self._categories),
            active_range=[self._index_start, self._index_end],
            description=self.description,
            descriptions=dict(self.descriptions),
            units={k: str(v) for k, v in self.units.items()},
        )

    def state_set(self, state, use_active_range=False, keep_columns=None, set_filter=True, trusted=True, warn=True):
        """Reference: dataframe.py:2661."""
        from .serialize import UserFunction
        self.virtual_columns = dict(state.get("virtual_columns", {}))
        self.variables.update({k: _decode_variable(v) for k, v in state.get("variables", {}).items()})
        for name, spec in state.get("functions", {}).items():
            self.functions[name] = UserFunction.decode(spec, trusted=trusted)
        for old, new in state.get("renamed_columns", []):
            if old in self.column_names:
                self._rename_column(old, new)
        self.column_names = list(state.get("column_names", self.column_names))
        keep_columns = keep_columns or []
        for col in keep_columns:
            if col not in self.column_names:
                self.column_names.append(col)
        self._categories = dict(state.get("categories", {}))
        for name, sel_spec in state.get("selections", {}).items():
            if name == FILTER_SELECTION_NAME and not set_filter:
                continue
            sel = selections_mod.selection_decode(sel_spec) if sel_spec else None
            self._selection(sel, name)
        if use_active_range and "active_range" in state:
            self._index_start, self._index_end = state["active_range"]
        self._invalidate_length()
        return self

    def state_write(self, file, fs_options=None):
        import json
        with open(file, "w") as f:
            json.dump(self.state_get(), f, default=str)

    def state_load(self, file, use_active_range=False, fs_options=None):
        import json
        with open(file) as f:
            state = json.load(f)
        return self.state_set(state, use_active_range=use_active_range)

    # -- aggregation machinery ----------------------------------------
    def _create_binners(self, binby, limits, shape, selection=None, delay=False, progress=None):
        """Delayed binner construction (reference: dataframe.py:5633)."""
        binby = [binby] if not isinstance(binby, (list, tuple)) else list(binby)
        binby = [_ensure_string_expression(b) for b in binby]
        shapes = shape if isinstance(shape, (list, tuple)) else [shape] * len(binby)
        if len(binby) == 0:
            return Promise.fulfilled(())

        @delayed
        def make_binners(limits_list):
            binners = []
            for expr, lims, shp in zip(binby, limits_list, shapes):
                if self.is_category(expr):
                    N = self.category_count(expr)
                    offset = self.category_offset(expr)
                    binners.append(BinnerOrdinal(expr, N, offset))
                else:
                    vmin, vmax = lims
                    binners.append(BinnerScalar(expr, vmin, vmax, int(shp)))
            return tuple(binners)

        limits_needed = [b for b in binby if not self.is_category(b)]
        if limits_needed:
            # no shape= here: with a shape the limits() return form becomes
            # (limits, shapes) (reference parity); binners only need limits
            limits_promise = self.limits(binby, limits, selection=selection, delay=True)
        else:
            limits_promise = Promise.fulfilled([[0, 1]] * len(binby))
        return make_binners(limits_promise)

    def _compute_agg(self, name, expression, binby=[], limits=None, shape=DEFAULT_SHAPE,
                     selection=False, delay=False, edges=False, progress=None, array_type=None,
                     extra_expressions=None, agg_kwargs=None):
        """Generic aggregation entry (reference: dataframe.py:842)."""
        agg_kwargs = agg_kwargs or {}
        expression_waslist = isinstance(expression, (list, tuple))
        expressions = list(expression) if expression_waslist else [expression]
        expressions = [_ensure_string_expression(e) if e is not None else None for e in expressions]
        selection_waslist = isinstance(selection, (list, tuple))
        selections = list(selection) if selection_waslist else [selection]

        binners_promise = self._create_binners(binby, limits, shape, selection=selections[0], delay=True)

        @delayed
        def compute(binners):
            results = []
            for expr in expressions:
                per_selection = []
                for sel in selections:
                    factory = agg_mod.aggregates[name]
                    if name == "count":
                        descriptor = factory(expr if expr is not None else "*", selection=sel, edges=edges, **agg_kwargs)
                    else:
                        descriptor = factory(expr, selection=sel, edges=edges, **agg_kwargs)
                    tasks, result = descriptor.add_tasks(self, binners, progress=progress)
                    per_selection.append(result)
                results.append(delayed_list(per_selection))
            return delayed_list(results)

        @delayed
        def finish(values):
            out = []
            for per_expr in values:
                per_sel = [np.asarray(v) if not np.isscalar(v) else v for v in per_expr]
                value = np.stack(per_sel) if selection_waslist else per_sel[0]
                out.append(value)
            result = out if expression_waslist else out[0]
            if array_type == "xarray":
                result = self._to_xarray_like(result, binby, shape)
            return result

        promise = finish(compute(binners_promise))
        return self._delay(delay, promise)

    def _to_xarray_like(self, data, binby, shape):
        from .xarray_lite import DataArrayLite
        return DataArrayLite(np.asarray(data), dims=[_ensure_string_expression(b) for b in (binby if isinstance(binby, (list, tuple)) else [binby])])

    # -- statistics entry points --------------------------------------
    def count(self, expression=None, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
              delay=False, edges=False, progress=None, array_type=None):
        """Reference: dataframe.py count."""
        return self._compute_agg("count", expression, binby, limits, shape, selection, delay, edges, progress, array_type)

    def sum(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
            delay=False, progress=None, edges=False, array_type=None):
        return self._compute_agg("sum", expression, binby, limits, shape, selection, delay, edges, progress, array_type)

    def mean(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
             delay=False, progress=None, edges=False, array_type=None):
        return self._compute_agg("mean", expression, binby, limits, shape, selection, delay, edges, progress, array_type)

    def std(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
            delay=False, progress=None, array_type=None):
        return self._compute_agg("std", expression, binby, limits, shape, selection, delay, False, progress, array_type)

    def var(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
            delay=False, progress=None, array_type=None):
        return self._compute_agg("var", expression, binby, limits, shape, selection, delay, False, progress, array_type)

    def skew(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
             delay=False, progress=None, array_type=None):
        return self._compute_agg("skew", expression, binby, limits, shape, selection, delay, False, progress, array_type)

    def kurtosis(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
                 delay=False, progress=None, array_type=None):
        return self._compute_agg("kurtosis", expression, binby, limits, shape, selection, delay, False, progress, array_type)

    def min(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
            delay=False, progress=None, edges=False, array_type=None):
        return self._compute_agg("min", expression, binby, limits, shape, selection, delay, edges, progress, array_type)

    def max(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
            delay=False, progress=None, edges=False, array_type=None):
        return self._compute_agg("max", expression, binby, limits, shape, selection, delay, edges, progress, array_type)

    def first(self, expression, order_expression=None, binby=[], limits=None, shape=DEFAULT_SHAPE,
              selection=False, delay=False, progress=None, edges=False, array_type=None):
        binners_promise = self._create_binners(binby, limits, shape, selection=selection, delay=True)

        @delayed
        def compute(binners):
            descriptor = agg_mod.first(_ensure_string_expression(expression),
                                       _ensure_string_expression(order_expression) if order_expression is not None else None,
                                       selection=selection, edges=edges)
            tasks, result = descriptor.add_tasks(self, binners)
            return result

        return self._delay(delay, compute(binners_promise))

    def last(self, expression, order_expression=None, binby=[], limits=None, shape=DEFAULT_SHAPE,
             selection=False, delay=False, progress=None, edges=False, array_type=None):
        binners_promise = self._create_binners(binby, limits, shape, selection=selection, delay=True)

        @delayed
        def compute(binners):
            descriptor = agg_mod.last(_ensure_string_expression(expression),
                                      _ensure_string_expression(order_expression) if order_expression is not None else None,
                                      selection=selection, edges=edges)
            tasks, result = descriptor.add_tasks(self, binners)
            return result

        return self._delay(delay, compute(binners_promise))

    def minmax(self, expression, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False,
               delay=False, progress=None):
        """[min, max] in one pass (reference: dataframe.py minmax)."""
        expression_waslist = isinstance(expression, (list, tuple))
        expressions = list(expression) if expression_waslist else [expression]

        @delayed
        def finish(mins, maxs):
            if expression_waslist:
                return np.array([[np.asarray(a), np.asarray(b)] for a, b in zip(mins, maxs)])
            return np.array([mins[0], maxs[0]])

        mins = self.min(expressions, binby=binby, limits=limits, shape=shape, selection=selection, delay=True, progress=progress)
        maxs = self.max(expressions, binby=binby, limits=limits, shape=shape, selection=selection, delay=True, progress=progress)
        return self._delay(delay, finish(mins, maxs))

    def mode(self, expression, binby=[], limits=None, shape=256, mode_shape=64, mode_limits=None,
             progressbar=False, selection=None):
        """Most common value via binned histogram argmax (reference:
        dataframe.py mode)."""
        expression = _ensure_string_expression(expression)
        if binby:
            raise NotImplementedError("mode with binby not yet supported")
        if self.is_category(expression):
            counts = self.count(binby=expression, selection=selection, array_type=None, shape=mode_shape)
            labels = self.category_labels(expression)
            return labels[int(np.argmax(counts))]
        counts = self.count(binby=expression, limits=mode_limits, shape=mode_shape, selection=selection)
        limits_ = self.limits(expression, mode_limits, selection=selection)
        centers = np.linspace(limits_[0], limits_[1], mode_shape + 1)
        centers = (centers[1:] + centers[:-1]) / 2
        return centers[int(np.argmax(counts))]

    def median_approx(self, expression, percentage=50., binby=[], limits=None, shape=DEFAULT_SHAPE,
                      percentile_shape=256, percentile_limits="minmax", selection=False, delay=False, progress=None):
        """Reference: dataframe.py:1611 median_approx (reference default
        percentile_shape=256; pass a larger shape for finer accuracy)."""
        return self.percentile_approx(expression, 50, binby=binby, limits=limits, shape=shape,
                                      percentile_shape=percentile_shape, percentile_limits=percentile_limits,
                                      selection=selection, delay=delay, progress=progress)

    def percentile_approx(self, expression, percentage=50., binby=[], limits=None, shape=DEFAULT_SHAPE,
                          percentile_shape=1024, percentile_limits="minmax", selection=False,
                          delay=False, progress=None):
        """Approximate percentile from a fine histogram + cumsum interpolation
        (reference: dataframe.py:1632 re-implementing vaexfast
        grid_find_edges:1680 as cumsum + linear interpolation)."""
        expression = _ensure_string_expression(expression)
        waslist = isinstance(percentage, (list, tuple))
        percentages = list(percentage) if waslist else [percentage]
        if binby:
            binby_list = binby if isinstance(binby, (list, tuple)) else [binby]
        else:
            binby_list = []

        @delayed
        def compute(percentile_limits_):
            vmin, vmax = percentile_limits_
            if binby_list:
                binby_limits = limits
                if binby_limits is None:
                    binby_limits = [None] * len(binby_list)
                elif len(binby_list) == 1 and not isinstance(binby_limits[0], (list, tuple)):
                    binby_limits = [binby_limits]  # single flat [min, max] pair
                all_limits = list(binby_limits) + [[vmin, vmax]]
                all_shapes = ([shape] * len(binby_list) if not isinstance(shape, (list, tuple)) else list(shape)) + [percentile_shape]
            else:
                all_limits = [[vmin, vmax]]
                all_shapes = percentile_shape
            counts = self.count(binby=list(binby_list) + [expression],
                                limits=all_limits, shape=all_shapes,
                                selection=selection, delay=True, edges=True)

            @delayed
            def finish(counts_):
                counts_ = np.asarray(counts_, dtype=np.float64)
                # edges=True applies to every axis: strip the leading binby
                # axes' edge slots ([nan, under, ..., over] scalar / [...,
                # null, nan] ordinal), keep the percentile axis' edges for
                # the under-count
                lead = []
                for b in binby_list:
                    lead.append(slice(0, -2) if self.is_category(b) else slice(2, -1))
                counts_ = counts_[tuple(lead) + (slice(None),)] if lead else counts_
                # edges layout [nan, under, data..., over] on the last axis
                data = counts_[..., 2:-1]
                under = counts_[..., 1]
                cum = np.cumsum(data, axis=-1)
                total = cum[..., -1] + under
                results = []
                edges_vals = np.linspace(vmin, vmax, percentile_shape + 1)
                for p in percentages:
                    target = (under + cum[..., -1]) * (p / 100.0)
                    # linear interpolation within the bin where cum crosses target
                    cum_with_under = under[..., None] + np.concatenate([np.zeros_like(cum[..., :1]), cum], axis=-1)
                    flat_cum = cum_with_under.reshape(-1, percentile_shape + 1)
                    flat_target = np.asarray(target).reshape(-1)
                    out = np.empty(flat_cum.shape[0])
                    for i in range(flat_cum.shape[0]):
                        c = flat_cum[i]
                        t = flat_target[i]
                        if c[-1] <= 0:
                            out[i] = np.nan
                            continue
                        j = int(np.searchsorted(c, t, side="left"))
                        j = max(1, min(j, percentile_shape))
                        c0, c1 = c[j - 1], c[j]
                        frac = 0.0 if c1 == c0 else (t - c0) / (c1 - c0)
                        out[i] = edges_vals[j - 1] + frac * (edges_vals[j] - edges_vals[j - 1])
                    result = out.reshape(np.asarray(target).shape)
                    results.append(result if result.shape else float(result))
                if waslist:
                    return np.array(results) if not binby_list else np.array(results)
                return results[0]

            return finish(counts)

        limits_promise = self.limits(expression, percentile_limits, selection=selection, delay=True)
        return self._delay(delay, compute(limits_promise))

    def cov(self, x, y=None, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False, delay=False, progress=None):
        """Covariance matrix (reference: dataframe.py cov)."""
        if y is None:
            expressions = list(x) if isinstance(x, (list, tuple)) else [x]
        else:
            expressions = [x, y]
        expressions = [_ensure_string_expression(e) for e in expressions]
        n = len(expressions)

        @delayed
        def finish(*blocks):
            means = blocks[:n]
            raw_mix = blocks[n:]
            cov_matrix = np.zeros(np.shape(means[0]) + (n, n)) if np.ndim(means[0]) else np.zeros((n, n))
            k = 0
            for i in range(n):
                for j in range(i, n):
                    value = raw_mix[k] - np.asarray(means[i]) * np.asarray(means[j])
                    if np.ndim(value):
                        cov_matrix[..., i, j] = value
                        cov_matrix[..., j, i] = value
                    else:
                        cov_matrix[i, j] = cov_matrix[j, i] = value
                    k += 1
            return cov_matrix

        means = [self.mean(e, binby=binby, limits=limits, shape=shape, selection=selection, delay=True, progress=progress) for e in expressions]
        raw_mix = []
        for i in range(n):
            for j in range(i, n):
                raw_mix.append(self.mean(f"({expressions[i]}) * ({expressions[j]})", binby=binby, limits=limits,
                                         shape=shape, selection=selection, delay=True, progress=progress))
        return self._delay(delay, finish(*(means + raw_mix)))

    def covar(self, x, y, binby=[], limits=None, shape=DEFAULT_SHAPE, selection=False, delay=False, progress=None):
        """Covariance between x and y (reference: dataframe.py covar)."""
        x = _ensure_string_expression(x)
        y = _ensure_string_expression(y)

        @delayed
        def finish(mean_xy, mean_x, mean_y):
            return np.asarray(mean_xy) - np.asarray(mean_x) * np.asarray(mean_y)

        mean_xy = self.mean(f"({x}) * ({y})", binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
        mean_x = self.mean(x, binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
        mean_y = self.mean(y, binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
        return self._delay(delay, finish(mean_xy, mean_x, mean_y))

    def correlation(self, x, y=None, binby=[], limits=None, shape=DEFAULT_SHAPE, sort=False,
                    sort_key=np.abs, selection=False, delay=False, progress=None, array_type=None):
        """Pearson correlation (reference: dataframe.py correlation)."""
        if y is None:
            if isinstance(x, (list, tuple)) and isinstance(x[0], (list, tuple)):
                pairs = [(_ensure_string_expression(a), _ensure_string_expression(b)) for a, b in x]
            else:
                exprs = [_ensure_string_expression(e) for e in x]
                pairs = [(a, b) for a in exprs for b in exprs]
                matrix_shape = (len(exprs), len(exprs))

                @delayed
                def finish_matrix(values):
                    return np.array(values).reshape(matrix_shape)
                values = [self.correlation(a, b, binby=binby, limits=limits, shape=shape, selection=selection, delay=True) for a, b in pairs]
                return self._delay(delay, finish_matrix(delayed_list(values)))
        else:
            pairs = [(_ensure_string_expression(x), _ensure_string_expression(y))]

        results = []
        for a, b in pairs:
            @delayed
            def finish(cov_ab, var_a, var_b):
                with np.errstate(divide="ignore", invalid="ignore"):
                    return cov_ab / np.sqrt(np.asarray(var_a) * np.asarray(var_b))

            cov_ab = self.covar(a, b, binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
            var_a = self.var(a, binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
            var_b = self.var(b, binby=binby, limits=limits, shape=shape, selection=selection, delay=True)
            results.append(finish(cov_ab, var_a, var_b))
        if len(results) == 1:
            return self._delay(delay, results[0])
        return self._delay(delay, delayed_list(results))

    def mutual_information(self, x, y=None, dimension=2, mi_limits=None, mi_shape=256, binby=[],
                           limits=None, shape=DEFAULT_SHAPE, sort=False, selection=False, delay=False):
        """Mutual information of the 2-D distribution p(x,y)
        (reference: dataframe.py mutual_information, kld.py)."""
        if y is None:
            exprs = [_ensure_string_expression(e) for e in x]
            pairs = [(a, b) for i, a in enumerate(exprs) for b in exprs[i + 1:]]
        else:
            pairs = [(_ensure_string_expression(x), _ensure_string_expression(y))]

        @delayed
        def compute_mi(counts):
            counts = np.asarray(counts, dtype=np.float64)
            total = counts.sum()
            if total == 0:
                return 0.0
            pxy = counts / total
            px = pxy.sum(axis=1, keepdims=True)
            py = pxy.sum(axis=0, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                terms = pxy * np.log(pxy / (px * py))
            return float(np.nansum(terms))

        results = []
        for a, b in pairs:
            counts = self.count(binby=[a, b], limits=mi_limits, shape=mi_shape, selection=selection, delay=True)
            results.append(compute_mi(counts))
        if len(results) == 1:
            out = self._delay(delay, results[0])
            return out
        out = self._delay(delay, delayed_list(results))
        if sort and not delay:
            order = np.argsort(out)[::-1]
            return np.array(out)[order], [pairs[i] for i in order]
        return out

    # -- limits --------------------------------------------------------
    def limits(self, expression, value=None, square=False, selection=None, delay=False, progress=None, shape=None):
        """Find sensible [min, max] per expression; supports 'minmax',
        explicit pairs, and percentage strings like '99.7%'
        (reference: dataframe.py:1844 + limits_percentage:1795)."""
        waslist = isinstance(expression, (list, tuple))
        expressions = list(expression) if waslist else [expression]
        expressions = [_ensure_string_expression(e) for e in expressions]
        n = len(expressions)

        values = value
        if values is None:
            values = "minmax"
        # one limit spec for all, or per-expression list
        if not isinstance(values, (list, tuple)) or (len(values) == 2 and not isinstance(values[0], (list, tuple, str, type(None))) and n != 2):
            values = [values] * n
        elif isinstance(values, (list, tuple)) and len(values) == 2 and n == 1 and all(isinstance(v, (int, float)) for v in values):
            values = [values]
        elif isinstance(values, (list, tuple)) and n > 1 and len(values) != n:
            values = [values] * n
        if isinstance(values, str):
            values = [values] * n

        promises = []
        for expr, limit in zip(expressions, values):
            if self.is_category(expr):
                # categorical columns bin on their codes: [-0.5, N-0.5]
                # (reference: dataframe.py:1922-1924)
                N = self.category_count(expr)
                promises.append(Promise.fulfilled([-0.5, N - 0.5]))
                continue
            if limit is None:
                limit = "minmax"
            if isinstance(limit, str):
                if limit == "minmax":
                    promises.append(self.minmax(expr, selection=selection, delay=True))
                elif limit.endswith("%"):
                    promises.append(self._limits_percentage(expr, float(limit[:-1]), selection=selection))
                else:
                    raise ValueError(f"cannot interpret limit {limit!r}")
            else:
                promises.append(Promise.fulfilled([limit[0], limit[1]]))

        @delayed
        def finish(limits_list):
            limits_list = [np.array(l, dtype=np.float64) for l in limits_list]
            for expr, l in zip(expressions, limits_list):
                if l[0] == l[1] and not self.is_category(expr):
                    # degenerate range: widen (reference behavior)
                    l[0], l[1] = l[0] - 1, l[1] + 1
            out = [list(l) for l in limits_list] if waslist else list(limits_list[0])
            if shape is not None:
                # with a shape request, return (limits, shapes); categorical
                # shapes clamp to N (reference: dataframe.py:1914-1916,1904)
                shape_list = list(shape) if isinstance(shape, (list, tuple)) else [shape] * n
                shapes = [min(self.category_count(e), s) if self.is_category(e) else s
                          for e, s in zip(expressions, shape_list)]
                return (out, shapes if waslist else shapes[0])
            return out

        return self._delay(delay, finish(delayed_list(promises)))

    def _limits_percentage(self, expression, percentage, selection=None, square=False):
        """Reference: dataframe.py:1795 — minmax pass, then a 1024-bin
        histogram, then symmetric cumulative trimming."""
        @delayed
        def compute(minmax_):
            vmin, vmax = float(minmax_[0]), float(minmax_[1])
            if vmin == vmax:
                return Promise.fulfilled([vmin - 1, vmax + 1])
            shape_ = 1024
            counts = self.count(binby=expression, limits=[vmin, vmax], shape=shape_, selection=selection, delay=True)

            @delayed
            def finish(counts_):
                counts_ = np.asarray(counts_, dtype=np.float64)
                total = counts_.sum()
                if total == 0:
                    return [vmin, vmax]
                f = (1 - percentage / 100.0) / 2
                cum = np.cumsum(counts_) / total
                edges = np.linspace(vmin, vmax, shape_ + 1)
                lo_idx = int(np.searchsorted(cum, f))
                hi_idx = int(np.searchsorted(cum, 1 - f))
                return [float(edges[lo_idx]), float(edges[min(hi_idx + 1, shape_)])]

            return finish(counts)

        return compute(self.minmax(expression, selection=selection, delay=True))

    def limits_percentage(self, expression, percentage=99.73, square=False, selection=False, progress=None, delay=False):
        promise = self._limits_percentage(expression, percentage, selection=selection)
        return self._delay(delay, promise)

    # -- unique / value_counts / isin ---------------------------------
    def _hash_map_unique(self, expression, progress=None, selection=None, flatten=True, delay=False,
                        limit=None, limit_raise=True, return_inverse=False):
        """Reference: dataframe.py:500."""
        expression = _ensure_string_expression(expression)
        task = TaskHashmapUniqueCreate(self, expression, flatten=flatten, limit=limit,
                                       limit_raise=limit_raise, selection=selection,
                                       return_inverse=return_inverse)
        task = self.executor.schedule(task)
        return self._delay(delay, task)

    def unique(self, expression, return_inverse=False, dropna=False, dropnan=False, dropmissing=False,
               progress=False, selection=None, axis=None, delay=False, limit=None, limit_raise=True,
               array_type="python"):
        """Reference: dataframe.py unique."""
        expression = _ensure_string_expression(expression)
        if dropna:
            dropnan = dropmissing = True

        @delayed
        def finish(hashmap):
            keys = hashmap.keys()
            if hasattr(keys, "to_pylist"):
                keys = keys.to_pylist()
            if dropmissing and hashmap.has_null:
                if isinstance(keys, list):
                    keys = [k for i, k in enumerate(keys) if i != hashmap.null_index]
                else:
                    sel = np.ones(len(keys), dtype=bool)
                    sel[hashmap.null_index] = False
                    keys = keys[sel]
            if dropnan and hashmap.has_nan:
                if isinstance(keys, np.ndarray) and keys.dtype.kind == "f":
                    keys = keys[~np.isnan(keys)]
                elif isinstance(keys, list):
                    keys = [k for k in keys if not (isinstance(k, float) and np.isnan(k))]
            if return_inverse:
                codes = np.concatenate([hashmap.map_ordinal(chunk)
                                        for _, _, chunk in self.evaluate_iterator_single(expression)]) if len(self) else np.empty(0, np.int64)
                return _as_unique_array(keys, array_type), codes
            return _as_unique_array(keys, array_type)

        hashmap_promise = self._hash_map_unique(expression, selection=selection, delay=True,
                                               limit=limit, limit_raise=limit_raise)
        return self._delay(delay, finish(hashmap_promise))

    def nunique(self, expression, dropna=False, dropnan=False, dropmissing=False, selection=None,
                delay=False, limit=None, limit_raise=True, progress=None):
        @delayed
        def finish(values):
            return len(values)
        values = self.unique(expression, dropna=dropna, dropnan=dropnan, dropmissing=dropmissing,
                             selection=selection, delay=True, limit=limit, limit_raise=limit_raise)
        return self._delay(delay, finish(values))

    def _value_counts(self, expression, dropna=False, dropnan=False, dropmissing=False):
        """(keys_list, counts) using a hashmap pass + ordinal-binned count."""
        expression = _ensure_string_expression(expression)
        hashmap = self._hash_map_unique(expression)
        n = hashmap.count
        counts = getattr(hashmap, "_key_counts", None)
        if counts is None:
            # generic path: one more count pass binned by ordinal code.  The
            # device range-count build stashes the counts on the hashmap, so
            # integer keys skip this entirely (at 1e9 rows the extra pass was
            # 4/5ths of value_counts' wall time).
            var = self.add_variable("hashmap_", hashmap, unique=True)
            counts = self.count(binby=f"_ordinal_values({expression}, {var})",
                                limits=[0, max(n, 1)], shape=max(n, 1))
        keys = hashmap.keys()
        keys_list = keys.tolist() if hasattr(keys, "tolist") else list(keys)
        # replace masked entry with None
        if hashmap.has_null and not isinstance(keys_list[hashmap.null_index], (str, type(None))):
            keys_list[hashmap.null_index] = None
        out_keys, out_counts = [], []
        for i, (k, c) in enumerate(zip(keys_list, counts)):
            if dropmissing and hashmap.has_null and i == hashmap.null_index:
                continue
            if dropnan and hashmap.has_nan and i == hashmap.nan_index:
                continue
            out_keys.append(k)
            out_counts.append(int(c))
        return out_keys, np.array(out_counts)

    def evaluate_iterator_single(self, expression, chunk_size=None):
        for i1, i2, chunks in self.evaluate_iterator([expression], chunk_size=chunk_size):
            yield i1, i2, chunks[0]

    # -- evaluation ----------------------------------------------------
    def evaluate(self, expression, i1=None, i2=None, out=None, selection=None, filtered=True,
                 array_type=None, parallel=True, chunk_size=None, progress=None):
        """Materialize an expression on the host (reference: dataframe.py
        evaluate)."""
        if isinstance(expression, (list, tuple)):
            return [self.evaluate(e, i1=i1, i2=i2, selection=selection, filtered=filtered, array_type=array_type) for e in expression]
        expression = _ensure_string_expression(expression)
        if (selection in (None, False) and not (filtered and self.filtered)
                and out is None and expression not in self.virtual_columns
                and expression in self.dataset):
            col = self.dataset[expression]
            from .column import ColumnIndexed as _CI
            device = (array_types.is_jax_array(col)
                      or (isinstance(col, _CI) and not col.masked
                          and array_types.is_jax_array(col.indices)
                          and array_types.is_jax_array(col.column)))
            if device:
                # device column: one slice + ONE fetch — the chunked path
                # pays a device round-trip per chunk (~26ms each tunneled)
                start = self._index_start + (i1 or 0)
                end = self._index_end if i2 is None else min(self._index_start + i2, self._index_end)
                return array_types.convert(np.asarray(col[start:end]), array_type)
        parts = []
        for _, _, chunk in self._evaluate_iterator_raw([expression], i1=i1, i2=i2, selection=selection,
                                                       filtered=filtered, chunk_size=chunk_size):
            parts.append(chunk[0])
        if not parts:
            dt = DataType(np.dtype("float64"))
            result = np.empty(0, dtype=np.float64)
        else:
            result = array_types.concat(parts) if len(parts) > 1 else parts[0]
        return array_types.convert(result, array_type)

    def _evaluate_iterator_raw(self, expressions, i1=None, i2=None, selection=None, filtered=True, chunk_size=None):
        """Stream evaluated chunks (filtered rows compacted).

        With a filter active, i1/i2 index *filtered* row positions (reference
        semantics): the filter's row indices are materialized once and the
        requested window becomes a lazy take."""
        from .execution import chunk_size_for, _to_bool_mask
        expressions = [_ensure_string_expression(e) for e in expressions]
        if filtered and self.filtered and (i1 is not None or i2 is not None):
            indices = self._filtered_indices()[i1:i2]
            window = self._unfiltered_copy()
            window.dataset = self.dataset.take(indices)
            window._index_start = 0
            window._index_end = window.dataset.row_count
            yield from window._evaluate_iterator_raw(expressions, selection=selection,
                                                     filtered=False, chunk_size=chunk_size)
            return
        start = self._index_start if i1 is None else self._index_start + i1
        end = self._index_end if i2 is None else min(self._index_start + i2, self._index_end)
        if start >= end:
            return
        deps = set()
        for e in expressions:
            deps |= Expression(self, e).root_columns()
        use_filter = filtered and self.filtered
        if use_filter:
            deps |= self._selection_dependencies(FILTER_SELECTION_NAME)
        if selection is not None:
            deps |= self._selection_dependencies(selection)
        chunk_size = chunk_size or chunk_size_for(end - start)
        offset = 0
        for i1_, i2_, chunks in self.dataset.chunk_iterator(sorted(deps), chunk_size, start=start, end=end):
            scope = BlockScope(self, values=dict(chunks))
            mask = None
            if use_filter:
                mask = _to_bool_mask(scope.evaluate(self._filter_expression()))
            if selection is not None:
                smask = _to_bool_mask(scope.evaluate(self._selection_expression(selection)))
                mask = smask if mask is None else (mask & smask)
            results = []
            for e in expressions:
                value = scope.evaluate(e)
                if np.isscalar(value) or (isinstance(value, np.ndarray) and value.ndim == 0):
                    value = np.full(i2_ - i1_, value)
                if mask is not None:
                    value = array_types.filter_array(value, mask)
                results.append(value)
            n = len(results[0]) if results else 0
            yield offset, offset + n, results
            offset += n

    def evaluate_iterator(self, expression, s1=None, s2=None, i1=None, i2=None, chunk_size=None,
                          parallel=True, selection=None, array_type=None, prefetch=True, progress=None):
        """Reference: dataframe.py:3112 — with prefetch=True the next chunk is
        evaluated on a background thread while the caller consumes the
        current one (itertools.buffer, the reference's prefetch pattern)."""
        expressions = expression if isinstance(expression, (list, tuple)) else [expression]
        single = not isinstance(expression, (list, tuple))
        iterator = self._evaluate_iterator_raw(expressions, i1=i1, i2=i2, selection=selection,
                                               chunk_size=chunk_size)
        if prefetch:
            from .itertools import buffer
            iterator = buffer(iterator, n=2)
        for o1, o2, results in iterator:
            results = [array_types.convert(r, array_type) for r in results]
            yield o1, o2, (results[0] if single else results)

    # -- conversion ----------------------------------------------------
    def to_pandas_df(self, column_names=None, selection=None, strings=True, virtual=True, index_name=None,
                     parallel=True, chunk_size=None, array_type=None):
        import pandas as pd
        column_names = column_names or self.get_column_names(strings=strings, virtual=virtual)
        data = {}
        for name in column_names:
            values = self.evaluate(name, selection=selection)
            if array_types.is_arrow_array(values):
                values = values.to_pandas()
            data[name] = np.asarray(values) if not isinstance(values, np.ma.MaskedArray) else values
        df = pd.DataFrame(data)
        if index_name is not None and index_name in df:
            df = df.set_index(index_name)
        return df

    def to_arrow_table(self, column_names=None, selection=None, strings=True, virtual=True,
                       parallel=True, chunk_size=None, reduce_large=False):
        """Arrow table; with chunk_size a generator of (i1, i2, table)
        (reference: dataframe.py to_arrow_table chunked mode)."""
        import pyarrow as pa
        column_names = column_names or self.get_column_names(strings=strings, virtual=virtual)
        if chunk_size is not None:
            def chunks():
                for i1, i2, blocks in self.evaluate_iterator(column_names, chunk_size=chunk_size,
                                                             selection=selection):
                    arrays = [array_types.to_arrow(b) for b in blocks]
                    yield i1, i2, pa.table(arrays, names=column_names)
            return chunks()
        arrays = [array_types.to_arrow(self.evaluate(name, selection=selection)) for name in column_names]
        return pa.table(arrays, names=column_names)

    def __arrow_c_stream__(self, requested_schema=None):
        """Arrow PyCapsule interface: any Arrow-aware consumer
        (pandas/polars/duckdb) can ingest this DataFrame directly — the
        successor to the __dataframe__ interchange protocol."""
        return self.to_arrow_table().__arrow_c_stream__(requested_schema)

    def to_dict(self, column_names=None, selection=None, strings=True, virtual=True, array_type=None):
        column_names = column_names or self.get_column_names(strings=strings, virtual=virtual)
        return {name: array_types.convert(self.evaluate(name, selection=selection), array_type) for name in column_names}

    def to_items(self, column_names=None, selection=None, strings=True, virtual=True, array_type=None):
        return list(self.to_dict(column_names, selection, strings, virtual, array_type).items())

    def to_records(self, index=None, selection=None, column_names=None, strings=True, virtual=True, array_type="python"):
        if index is not None:
            row = {name: self.evaluate(name, index, index + 1)[0] for name in self.get_column_names(strings=strings, virtual=virtual)}
            return {k: (v.as_py() if hasattr(v, "as_py") else (v.item() if hasattr(v, "item") else v)) for k, v in row.items()}
        names = column_names or self.get_column_names(strings=strings, virtual=virtual)
        columns = {name: self.evaluate(name, selection=selection) for name in names}
        out = []
        n = len(next(iter(columns.values()))) if columns else 0
        lists = {name: (v.to_pylist() if hasattr(v, "to_pylist") else np.asarray(v).tolist()) for name, v in columns.items()}
        for i in range(n):
            out.append({name: lists[name][i] for name in names})
        return out

    def to_copy(self, column_names=None, selection=None, strings=True, virtual=True):
        from . import from_arrays
        return from_arrays(**self.to_dict(column_names=column_names, selection=selection, strings=strings, virtual=virtual))

    def to_dask_array(self, chunks="auto"):
        raise NotImplementedError("dask bridge not available in this environment")

    # -- repr/head/tail -----------------------------------------------
    def head(self, n=10):
        return self[:min(n, len(self))].extract()

    def tail(self, n=10):
        N = len(self)
        return self[max(0, N - n):N].extract()

    def head_and_tail_print(self, n=5):
        from .formatting import repr_html_table
        return repr_html_table(self, n)

    def __repr__(self):
        return self._head_and_tail_table(format="plain")

    def _repr_html_(self):
        return self._head_and_tail_table(format="html")

    def _head_and_tail_table(self, n=None, format="plain"):
        from . import formatting
        n = n or settings.display.max_rows
        return formatting.table_string(self, n, format=format)

    def __str__(self):
        return self._head_and_tail_table(format="plain")

    def describe(self, strings=True, virtual=True, selection=None):
        """Summary stats per column (reference: dataframe.py describe)."""
        import pandas as pd
        columns = self.get_column_names(strings=strings, virtual=virtual)
        data = dict(data_type=[], count=[], NA=[], mean=[], std=[], min=[], max=[])
        n_total = len(self)
        means = {}
        stds = {}
        mins = {}
        maxs = {}
        counts = {}
        numeric = []
        for name in columns:
            dt = self.data_type(name)
            if dt.is_numeric and not dt.is_temporal:
                numeric.append(name)
                counts[name] = self.count(name, selection=selection, delay=True)
                means[name] = self.mean(name, selection=selection, delay=True)
                stds[name] = self.std(name, selection=selection, delay=True)
                mins[name] = self.min(name, selection=selection, delay=True)
                maxs[name] = self.max(name, selection=selection, delay=True)
            else:
                counts[name] = self.count(name, selection=selection, delay=True)
        self.execute()
        for name in columns:
            dt = self.data_type(name)
            count = int(counts[name].get())
            data["data_type"].append(str(dt))
            data["count"].append(count)
            data["NA"].append(n_total - count)
            if name in numeric:
                data["mean"].append(float(means[name].get()))
                data["std"].append(float(stds[name].get()))
                data["min"].append(_scalar(mins[name].get()))
                data["max"].append(_scalar(maxs[name].get()))
            else:
                data["mean"].append("--")
                data["std"].append("--")
                data["min"].append("--")
                data["max"].append("--")
        return pd.DataFrame(data=data, index=columns).T

    # -- misc reference-parity API ------------------------------------
    @property
    def shape(self):
        """(rows, columns) (reference: dataframe.py shape)."""
        return (len(self), self.column_count())

    @property
    def nbytes(self):
        return self.byte_size()

    def length(self, selection=False):
        return self.count(selection=selection) if selection else len(self)

    def selected_length(self, selection="default"):
        """Rows in the named selection (reference: selected_length)."""
        return int(self.count(selection=selection))

    def active_length(self):
        return self._length_unfiltered

    def close(self):
        self.dataset.close()

    def hashed(self):
        return self

    def nop(self, expression=None, progress=False, delay=False):
        """Evaluate and discard — IO/compute benchmark helper
        (reference: dataframe.py nop)."""
        expression = expression or self.get_column_names()
        expressions = [expression] if isinstance(expression, str) else list(expression)
        for _, _, _chunks in self.evaluate_iterator(expressions, prefetch=False):
            pass

    def iscategory(self, column):
        return self.is_category(column)

    def category_values(self, column):
        return self.category_labels(column)

    def add_columns(self, names, columns):
        try:
            from scipy.sparse import csr_matrix
        except ImportError:  # pragma: no cover
            csr_matrix = None
        if csr_matrix is not None and isinstance(columns, csr_matrix):
            # reference dataframe.py:3516-3528: one ColumnSparse view per
            # matrix column (vaex-ml one-hot/vectorizer output)
            from .column import ColumnSparse
            if len(names) != columns.shape[1]:
                raise ValueError(
                    f"number of columns ({columns.shape[1]}) does not match "
                    f"number of column names ({len(names)})")
            for i, name in enumerate(names):
                self.add_column(name, ColumnSparse(columns, i))
            return
        for name, column in zip(names, columns):
            self.add_column(name, column)

    def delete_virtual_column(self, name):
        del self.virtual_columns[name]
        if name in self.column_names:
            self.column_names.remove(name)

    def delete_variable(self, name):
        del self.variables[name]

    def set_selection(self, selection, name="default"):
        from .selections import as_selection
        self._selection(as_selection(selection), name)

    def iterrows(self):
        """Iterate (index, row-dict) (reference: dataframe.py iterrows)."""
        names = self.get_column_names()
        for i1, i2, chunks in self.evaluate_iterator(names, prefetch=False):
            lists = [c.to_pylist() if hasattr(c, "to_pylist") else np.asarray(c).tolist() for c in chunks]
            for j in range(i2 - i1):
                yield i1 + j, {name: lists[k][j] for k, name in enumerate(names)}

    def to_arrays(self, column_names=None, selection=None):
        column_names = column_names or self.get_column_names()
        return [self.evaluate(name, selection=selection) for name in column_names]

    @property
    def values(self):
        """2-D numpy array of all (numeric) columns (reference: df.values)."""
        return np.column_stack([array_types.to_numpy(self.evaluate(n))
                                for n in self.get_column_names(strings=False)])

    def as_numpy(self, strict=False):
        df = self.copy()
        return df

    def as_arrow(self):
        df = self.copy()
        return df

    @property
    def func(self):
        """Function namespace building expressions: df.func.sin(df.x)
        (reference: dataframe.py func)."""
        df = self

        class Func:
            def __getattr__(self, name):
                from . import functions as functions_mod
                if name not in functions_mod.functions:
                    raise AttributeError(name)

                def call(*args, **kwargs):
                    from .expression import _repr_operand
                    arg_strs = [_repr_operand(df, a) for a in args]
                    kw_strs = [f"{k}={_repr_operand(df, v)}" for k, v in kwargs.items()]
                    return df[f"{name}({', '.join(arg_strs + kw_strs)})"]
                return call
        return Func()

    def get_current_row(self):
        return getattr(self, "_current_row", None)

    def set_current_row(self, row):
        if row is not None and not (0 <= row < len(self)):
            raise IndexError(f"row {row} out of range")
        self._current_row = row

    def has_current_row(self):
        return getattr(self, "_current_row", None) is not None

    def get_private_dir(self, create=False):
        import os
        path = os.path.expanduser(f"~/.vaex_tpu/dataframes/{utils.fingerprint(self.name)[:12]}")
        if create:
            os.makedirs(path, exist_ok=True)
        return path

    def label(self, expression, unit=None, output_unit=None):
        expression = _ensure_string_expression(expression)
        unit = unit or self.units.get(expression)
        return f"{expression} ({unit})" if unit else expression

    def unit(self, expression, default=None):
        return self.units.get(_ensure_string_expression(expression), default)

    def ucd_find(self, ucds, exclude=[]):
        ucds = [ucds] if isinstance(ucds, str) else ucds
        for name, ucd in self.ucds.items():
            if all(u in ucd for u in ucds) and name not in exclude:
                return name
        return None

    def info(self, description=True):
        return self.describe()

    def cat(self, i1, i2, format="plain"):
        """Display rows [i1, i2] (reference: dataframe.py cat)."""
        from . import formatting
        return formatting.table_string(self[i1:i2], n=i2 - i1, format=format)

    def compare(self, other, report_missing=True, report_difference=False, show=1e-6, orderby=None, column_names=None):
        """Column-level diff against another DataFrame (reference:
        dataframe.py compare). Returns (missing, different, equal)."""
        names_self = set(self.get_column_names())
        names_other = set(other.get_column_names())
        missing = sorted(names_self ^ names_other)
        different, equal = [], []
        for name in sorted(names_self & names_other):
            a = array_types.to_numpy(self.evaluate(name))
            b = array_types.to_numpy(other.evaluate(name))
            same = len(a) == len(b)
            if same:
                try:
                    same = bool(np.allclose(np.asarray(a, dtype=np.float64),
                                            np.asarray(b, dtype=np.float64), equal_nan=True))
                except (TypeError, ValueError):
                    same = list(map(str, a)) == list(map(str, b))
            (equal if same else different).append(name)
        return missing, different, equal

    def bin_edges(self, expression, limits, shape=DEFAULT_SHAPE):
        limits = self.limits(expression, limits)
        return np.linspace(limits[0], limits[1], shape + 1)

    def bin_centers(self, expression, limits, shape=DEFAULT_SHAPE):
        edges = self.bin_edges(expression, limits, shape)
        return (edges[1:] + edges[:-1]) / 2

    def nearest_bin(self, value, limits, shape):
        bins = np.linspace(limits[0], limits[1], shape)
        return int(np.argmin(np.abs(bins - value)))

    def export_fits(self, path, progress=None):
        from .astro import export_fits
        export_fits(self, path)

    def export_votable(self, path, table_name="vaex_tpu"):
        from .astro import export_votable
        export_votable(self, path, table_name=table_name)

    def export_csv_pandas(self, path, progress=None, chunk_size=None, **kwargs):
        return self.export_csv(path, progress=progress, chunk_size=chunk_size, **kwargs)

    export_csv_arrow = export_csv_pandas

    def export_many(self, path, progress=None, chunk_size=1024 * 1024 * 4, **kwargs):
        """Export into multiple numbered files (reference: export_many):
        path must contain a format field, e.g. 'part-{i:03}.parquet'."""
        import math
        n_files = max(1, math.ceil(len(self) / chunk_size))
        paths = []
        for i in range(n_files):
            part = self[i * chunk_size:min((i + 1) * chunk_size, len(self))].extract()
            fname = path.format(i=i)
            part.export(fname, **kwargs)
            paths.append(fname)
        return paths

    # -- selection favorites (reference: dataframe.py selection_favorite_*)
    def _favorites_path(self):
        import os
        return os.path.join(self.get_private_dir(create=True), "favorites.json")

    def selection_favorite_add(self, name, selection_name="default"):
        import json, os
        selection = self.get_selection(selection_name)
        if selection is None:
            raise ValueError("no selection to store")
        favorites = self.selections_favorite_load() or {}
        favorites[name] = selection.encode()
        with open(self._favorites_path(), "w") as f:
            json.dump(favorites, f)
        return favorites

    def selection_favorite_remove(self, name):
        import json
        favorites = self.selections_favorite_load() or {}
        favorites.pop(name, None)
        with open(self._favorites_path(), "w") as f:
            json.dump(favorites, f)

    def selection_favorite_apply(self, name, selection_name="default"):
        favorites = self.selections_favorite_load() or {}
        if name not in favorites:
            raise KeyError(f"no favorite selection {name!r}")
        self._selection(selections_mod.selection_decode(favorites[name]), selection_name)

    def selections_favorite_load(self):
        import json, os
        path = self._favorites_path()
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def selections_favorite_store(self, favorites):
        import json
        with open(self._favorites_path(), "w") as f:
            json.dump(favorites, f)

    def set_auto_fraction(self, enabled):
        self._auto_fraction = enabled

    def get_auto_fraction(self):
        return self._auto_fraction

    # -- length/slicing stubs (DataFrameLocal implements) -------------
    def __len__(self):
        raise NotImplementedError

    def _invalidate_length(self):
        self._length_cache = {}

    def copy(self, column_names=None):
        raise NotImplementedError

    def trim(self, inplace=False):
        df = self if inplace else self.copy()
        return df

    def _slice(self, start, stop):
        raise NotImplementedError


def _scalar(v):
    v = np.asarray(v)
    return v.item() if v.shape == () else v


def _as_unique_array(keys, array_type):
    if isinstance(keys, list):
        values = keys
        if array_type in ("python", "list"):
            return values
        import pyarrow as pa
        return pa.array(values)
    if array_type in ("python", "list"):
        if np.ma.isMaskedArray(keys):
            return [None if m else v.item() if hasattr(v, "item") else v for v, m in zip(keys.data, np.ma.getmaskarray(keys))]
        return keys.tolist() if hasattr(keys, "tolist") else list(keys)
    if array_type == "numpy" or array_type is None:
        return keys
    if array_type == "arrow":
        return array_types.to_arrow(keys)
    return keys


def _encode_variable(v):
    if isinstance(v, np.ndarray):
        return dict(type="ndarray", data=v.tolist(), dtype=str(v.dtype))
    if isinstance(v, (np.datetime64, np.timedelta64)):
        return dict(type=type(v).__name__, data=str(v))
    from .hash import HashMapUnique
    if isinstance(v, HashMapUnique):
        return dict(type="hashmap", data=v.encode(None))
    return v


def _decode_variable(v):
    if isinstance(v, dict) and "type" in v:
        if v["type"] == "ndarray":
            return np.asarray(v["data"], dtype=v["dtype"])
        if v["type"] == "datetime64":
            return np.datetime64(v["data"])
        if v["type"] == "timedelta64":
            return np.timedelta64(v["data"])
        if v["type"] == "hashmap":
            from .hash import HashMapUnique
            return HashMapUnique.decode(None, v["data"])
    return v


class DataFrameLocal(DataFrame):
    """DataFrame backed by a local Dataset (reference: dataframe.py:5717)."""

    def __init__(self, dataset=None, name=None):
        super().__init__(name=name)
        from .dataset import DatasetArrays
        if dataset is None:
            dataset = DatasetArrays({})
        self.dataset = dataset
        self.column_names = list(dataset)
        self._index_start = 0
        self._index_end = dataset.row_count

    @property
    def columns(self):
        return self.dataset

    @property
    def _length_unfiltered(self):
        return self._index_end - self._index_start

    @property
    def length_unfiltered(self):
        return self._length_unfiltered

    def length_original(self):
        return self.dataset.row_count

    def __len__(self):
        if not self.filtered:
            return self._length_unfiltered
        key = self.fingerprint()
        if key not in self._length_cache:
            self._length_cache[key] = int(self.count())
        return self._length_cache[key]

    def count_nothing_selected(self):
        return len(self)

    def set_active_range(self, i1, i2):
        self._index_start = i1
        self._index_end = i2
        self._invalidate_length()

    def set_active_fraction(self, fraction):
        n = int(self.dataset.row_count * fraction)
        self.set_active_range(0, n)

    def get_active_fraction(self):
        return self._length_unfiltered / max(self.dataset.row_count, 1)

    def column_count(self, hidden=False):
        return len(self.get_column_names(hidden=hidden))

    def byte_size(self, selection=False, virtual=False):
        """Approximate bytes of the (selected) data
        (reference: dataframe.py byte_size)."""
        n = len(self) if (selection or self.filtered) else self._length_unfiltered
        total = 0
        for name in self.get_column_names(virtual=virtual):
            try:
                dt = self.data_type(name)
                total += n * (dt.byte_size if not dt.is_string else 8)
            except Exception:  # noqa: BLE001
                pass
        return total

    def evaluate_variable(self, name):
        return self.variables[name]

    def get_active_range(self):
        return self._index_start, self._index_end

    # -- copy ----------------------------------------------------------
    def copy(self, column_names=None, treeshake=False):
        df = DataFrameLocal(self.dataset, name=self.name)
        df.column_names = list(self.column_names)
        df.virtual_columns = dict(self.virtual_columns)
        df.variables = dict(self.variables)
        df.functions = dict(self.functions)
        df._categories = copy_mod.deepcopy(self._categories)
        df._index_start = self._index_start
        df._index_end = self._index_end
        df.units = dict(self.units)
        df.descriptions = dict(self.descriptions)
        df.description = self.description
        df._renamed_columns = list(self._renamed_columns)
        for name, history in self.selection_histories.items():
            df.selection_histories[name] = list(history)
            df.selection_history_indices[name] = self.selection_history_indices[name]
        if column_names is not None:
            # keep hidden dependencies alive
            needed = []
            for name in column_names:
                if name not in df.column_names and name not in df.virtual_columns:
                    # an expression: add as virtual column
                    df.add_virtual_column(name, name)
            deps = set()
            for name in column_names:
                deps |= Expression(df, name).variables(include_virtual=True)
            hidden_needed = [n for n in df.get_column_names(hidden=True) if n in deps and n not in column_names]
            df.column_names = list(column_names) + hidden_needed
        return df

    def shallow_copy(self):
        return self.copy()

    def is_local(self):
        return True

    # -- columns -------------------------------------------------------
    def add_column(self, name, data):
        from .dataset import DatasetArrays, DatasetMerged
        if np.isscalar(data):
            from .column import ColumnVirtualConstant
            data = ColumnVirtualConstant(data, self._length_unfiltered)
        if len(data) != self.dataset.row_count:
            if self.filtered and len(data) == len(self):
                raise ValueError("cannot add a column to a filtered dataframe with filtered length; "
                                 "use df.extract() first")
            raise ValueError(f"array length {len(data)} does not match dataframe length {self.dataset.row_count}")
        if name in self.dataset:
            # replace: merge a renamed dataset
            base = self.dataset.dropped(name)
            self.dataset = base.merged(DatasetArrays({name: data}))
        else:
            if len(self.dataset):
                self.dataset = self.dataset.merged(DatasetArrays({name: data}))
            else:
                self.dataset = DatasetArrays({name: data})
                self._index_start = 0
                self._index_end = self.dataset.row_count
        if name not in self.column_names:
            self.column_names.append(name)
        self._invalidate_length() if False else None

    def _rename_column(self, name, new_name):
        self.dataset = self.dataset.renamed({name: new_name})
        if name in self.column_names:
            self.column_names[self.column_names.index(name)] = new_name
        self._renamed_columns.append((name, new_name))

    def _drop_column(self, name):
        self.dataset = self.dataset.dropped(name)
        self.column_names.remove(name)

    # -- row ops -------------------------------------------------------
    def _slice(self, start, stop):
        df = self.copy()
        if df.filtered:
            # materialize filter indices for the requested range
            indices = self._filtered_indices()
            df = self._unfiltered_copy()
            df.dataset = self.dataset.take(indices[start:stop])
            df._index_start = 0
            df._index_end = df.dataset.row_count
            return df
        df._index_start = self._index_start + start
        df._index_end = self._index_start + stop
        df._invalidate_length()
        return df

    def _unfiltered_copy(self):
        df = self.copy()
        if df.filtered:
            history = df.selection_histories[FILTER_SELECTION_NAME]
            df.selection_histories[FILTER_SELECTION_NAME] = []
            df.selection_history_indices[FILTER_SELECTION_NAME] = -1
            df._invalidate_length()
        return df

    def _filtered_indices(self):
        """Row indices (into the unfiltered dataset) passing the filter."""
        from .execution import _to_bool_mask, chunk_size_for
        deps = sorted(self._selection_dependencies(FILTER_SELECTION_NAME))
        dev = self._filtered_indices_device(deps)
        if dev is not None:
            return dev
        indices = []
        chunk_size = chunk_size_for(self._length_unfiltered)
        for i1, i2, chunks in self.dataset.chunk_iterator(deps, chunk_size, start=self._index_start, end=self._index_end):
            scope = BlockScope(self, values=dict(chunks))
            mask = _to_bool_mask(scope.evaluate(self._filter_expression()))
            local = np.nonzero(mask)[0] + (i1 + self._index_start)
            indices.append(local)
        return np.concatenate(indices) if indices else np.empty(0, dtype=np.int64)

    def _filtered_indices_device(self, deps):
        """Device path: every filter dep is a resident jax column and the
        filter expression traces — evaluate the mask ON DEVICE and keep the
        index vector in HBM.  The host path D2H's every dep column (at 1e8
        rows over the tunnel that is minutes: the taxi-pipeline join wall —
        filter -> extract -> join never needs the columns on host)."""
        from . import array_types, dispatch, settings
        from .scopes import DeviceScope, expression_is_device_compatible
        mode = settings.compute.device_filter
        if mode == "off":
            return None
        if mode == "auto":
            import jax
            if jax.default_backend() == "cpu":
                return None  # host numpy is ~3x faster on the CPU backend
        ds = self.dataset
        cols = {}
        for name in deps:
            if name not in ds:
                return None
            col = ds[name]
            if not array_types.is_jax_array(col):
                return None
            cols[name] = col
        if not expression_is_device_compatible(self, self._filter_expression()):
            return None
        import jax.numpy as jnp
        i0, i1 = self._index_start, self._index_end
        scope = DeviceScope(self, values={n: c[i0:i1] for n, c in cols.items()})
        try:
            result = scope.evaluate(self._filter_expression())
        except Exception:  # noqa: BLE001 — any host-only corner: fall back
            return None
        mask = jnp.asarray(dispatch.unwrap(result)).astype(bool)
        invalid = dispatch.mask_of(result)
        if invalid is not None:
            mask = mask & ~invalid  # missing never selects (reference semantics)
        count = int(mask.sum())  # the only host sync: one scalar
        # int32 compaction throughout: with x64 on, jnp.nonzero builds its
        # index vector in EMULATED int64 (iota/cumsum/scatter all i64) —
        # measured ~17s for 1e8 rows on the chip vs ~2s for the explicit
        # i32 cumsum+scatter below (the taxi join wall)
        if self._index_end < 2**31 - 1:
            import jax as _jax

            @_jax.jit
            def _compact32(mask):
                n = mask.shape[0]
                rows32 = _jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
                pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
                tgt = jnp.where(mask & (pos < count), pos, count)
                return jnp.zeros(count + 1, jnp.int32).at[tgt].set(rows32)[:count]

            idx = _compact32(mask)
            return idx + jnp.int32(i0) if i0 else idx
        idx = jnp.nonzero(mask, size=count, fill_value=0)[0].astype(jnp.int64)
        return idx + i0 if i0 else idx

    def extract(self):
        """Drop filtered-out rows & inactive range → compact dataframe
        (reference: dataframe.py extract)."""
        if self.filtered:
            indices = self._filtered_indices()
            df = self._unfiltered_copy()
            df.dataset = self.dataset.take(indices)
        else:
            df = self.copy()
            df.dataset = self.dataset.sliced(self._index_start, self._index_end)
        df._index_start = 0
        df._index_end = df.dataset.row_count
        df._invalidate_length()
        return df

    def take(self, indices, filtered=True, dropfilter=True):
        """Row subset by (filtered) positional indices (reference:
        dataframe.py:4444)."""
        df = self
        device_indices = array_types.is_jax_array(indices)
        if not device_indices:
            indices = np.asarray(indices)
        if self.filtered and filtered:
            base = self._filtered_indices()
            if device_indices:  # filtered base lives on host
                indices = np.asarray(indices)
                device_indices = False
            indices = base[indices]
            df = self._unfiltered_copy()
        else:
            if self._index_start:
                indices = indices + self._index_start
        out = df._unfiltered_copy() if df.filtered and dropfilter else df.copy()
        out.dataset = self.dataset.take(indices)
        out._index_start = 0
        out._index_end = out.dataset.row_count
        out._invalidate_length()
        return out

    def sample(self, n=None, frac=None, replace=False, weights=None, random_state=None):
        """Reference: dataframe.py sample."""
        rng = np.random.RandomState(random_state) if not isinstance(random_state, np.random.RandomState) else random_state
        N = len(self)
        if n is None:
            frac = 1 if frac is None else frac
            n = int(round(frac * N))
        p = None
        if weights is not None:
            w = np.asarray(self.evaluate(weights), dtype=np.float64)
            p = w / w.sum()
        indices = rng.choice(N, n, replace=replace, p=p)
        return self.take(indices)

    def shuffle(self, random_state=None):
        return self.sample(frac=1, random_state=random_state)

    def split(self, into=None, shuffle=False, random_state=None):
        """Reference: dataframe.py split."""
        df = self.shuffle(random_state=random_state) if shuffle else self
        N = len(df)
        if isinstance(into, int):
            sizes = [N // into + (1 if i < N % into else 0) for i in range(into)]
        else:
            if isinstance(into, float):
                # reference: split(into=0.3) -> [30%, 70%] (dataframe.py:4644)
                into = [into, 1.0 - into]
            fracs = list(into)
            sizes = [int(round(f * N)) for f in fracs]
            sizes[-1] = N - sum(sizes[:-1])
        out = []
        offset = 0
        for size in sizes:
            out.append(df[offset:offset + size])
            offset += size
        return out

    def split_random(self, into, random_state=None):
        return self.split(into, shuffle=True, random_state=random_state)

    def sort(self, by, ascending=True, kind="quicksort"):
        """Materialized sort via argsort → lazy take (reference:
        dataframe.py sort; device argsort in ops/sorting.py)."""
        from .ops import sorting
        by = _ensure_strings_from_expressions(by)
        by_list = by if isinstance(by, list) else [by]
        ascending_list = ascending if isinstance(ascending, list) else [ascending] * len(by_list)
        keys = self._device_key_columns(by_list)
        if keys is None:
            keys = [self.evaluate(b) for b in by_list]
        indices = sorting.lexsort_indices(keys, ascending_list)
        return self.take(indices)

    def _device_key_columns(self, by_list):
        """Raw device (jax.Array) key columns for plain column names when the
        frame is unfiltered and FULLY device-resident; else None.  Gate for
        the device-resident sort/join paths: the permutation/lookup produced
        from these keys stays on device, so every other column must be
        device-gatherable too (no reference equivalent — the reference works
        via host numpy, dataframe.py:4700)."""
        from .column import ColumnIndexed as _CI
        if self.filtered:
            return None

        def is_device_col(col):
            return (array_types.is_jax_array(col)
                    or (isinstance(col, _CI) and not col.masked
                        and array_types.is_jax_array(col.indices)
                        and array_types.is_jax_array(col.column)))

        ds = self.dataset
        names = list(ds)
        if not names:
            return None
        for name in names:
            if not is_device_col(ds[name]):  # __getitem__ applies dataset slicing
                return None

        def value_of(name):
            col = ds[name]
            v = col if array_types.is_jax_array(col) else col[0:len(col)]  # device gather
            return (v[self._index_start:self._index_end]
                    if (self._index_start, self._index_end) != (0, len(v)) else v)

        keys = []
        for b in by_list:
            if b in names:
                keys.append(value_of(b))
                continue
            # virtual-column / expression key: evaluate eagerly on device
            # when every function in it has a jnp implementation
            from .scopes import DeviceScope, expression_is_device_compatible
            if not expression_is_device_compatible(self, b):
                return None
            deps = Expression(self, b).root_columns()
            if any(d not in names for d in deps):
                return None
            scope = DeviceScope(self, values={d: value_of(d) for d in deps})
            result = scope.evaluate(b)
            values = getattr(result, "values", result)
            if not array_types.is_jax_array(values):
                return None
            keys.append(values)
        return keys

    def fillna(self, value, column_names=None, prefix="__original_", inplace=False):
        df = self if inplace else self.copy()
        column_names = column_names or df.get_column_names()
        for name in column_names:
            dt = df.data_type(name)
            if dt.is_numeric or dt.is_string:
                df[name] = df[name].fillna(value)
        return df

    def _filter_all(self, func_name, column_names=None, how="any"):
        """Drop rows where any/all of the columns match a predicate
        (reference: dataframe.py:5123 _filter_all)."""
        if isinstance(column_names, str):
            column_names = [column_names]
        if column_names is None:
            column_names = self.get_column_names(virtual=False)
        if how not in ("any", "all"):
            raise ValueError("`how` must be either 'any' or 'all'")
        joiner = " | " if how == "any" else " & "
        expr = joiner.join(f"{func_name}({_column_ref(name)})" for name in column_names)
        return self.filter(f"~({expr})", mode="and")

    def dropna(self, column_names=None, how="any", drop_nan=True, drop_masked=True):
        """Reference: dataframe.py:5101 dropna (drop_nan/drop_masked kept for
        the select_non_missing-era calling convention)."""
        if drop_nan and drop_masked:
            return self._filter_all("isna", column_names, how)
        if drop_nan:
            return self._filter_all("isnan", column_names, how)
        return self._filter_all("ismissing", column_names, how)

    def dropnan(self, column_names=None, how="any"):
        return self._filter_all("isnan", column_names, how)

    def dropmissing(self, column_names=None, how="any"):
        return self._filter_all("ismissing", column_names, how)

    def dropinf(self, column_names=None, how="any"):
        if column_names is None:
            column_names = [name for name in self.get_column_names(virtual=False, strings=False)
                            if self.data_type(name).is_float]
        if not column_names:
            return self.copy()
        return self._filter_all("isinf", column_names, how)

    def drop_filter(self, inplace=False):
        df = self if inplace else self.copy()
        df.selection_histories[FILTER_SELECTION_NAME] = []
        df.selection_history_indices[FILTER_SELECTION_NAME] = -1
        df._invalidate_length()
        return df

    # -- map_reduce (host path, powers join) ---------------------------
    def map_reduce(self, map, reduce, arguments, progress=False, delay=False, info=False,
                   to_numpy=True, ignore_filter=False, pre_filter=False, name="map reduce",
                   selection=None):
        """Reference: dataframe.py:431."""
        task = TaskMapReduce(self, arguments, map, reduce, info=info, to_numpy=to_numpy,
                             ignore_filter=ignore_filter, selection=selection,
                             pre_filter=pre_filter, name=name)
        task = self.executor.schedule(task)

        @delayed
        def finish(value):
            return value

        return self._delay(delay, finish(task))

    def _index(self, expression, progress=False, delay=False, prime_growth=False, cardinality=None):
        """Build a value→row multimap for joins (reference: dataframe.py:514)."""
        from .join import RowIndex
        expression = _ensure_string_expression(expression)
        values = self.evaluate(expression)
        return RowIndex.build(values)

    # -- structure ops (delegated) ------------------------------------
    def join(self, other, on=None, left_on=None, right_on=None, lprefix="", rprefix="",
             lsuffix="", rsuffix="", how="left", allow_duplication=False, inplace=False, cardinality_other=None):
        from .join import join as join_impl
        return join_impl(self, other, on=on, left_on=left_on, right_on=right_on,
                         lprefix=lprefix, rprefix=rprefix, lsuffix=lsuffix, rsuffix=rsuffix,
                         how=how, allow_duplication=allow_duplication, inplace=inplace)

    def groupby(self, by=None, agg=None, sort=False, ascending=True, assume_sparse="auto",
                row_limit=None, copy=True, progress=None, delay=False):
        from .groupby import GroupBy
        # assume_sparse is the reference's name for the combined multi-key
        # strategy switch (reference: dataframe.py:7133 groupby)
        groupby = GroupBy(self, by=by, sort=sort, ascending=ascending, row_limit=row_limit,
                          combine=assume_sparse)
        if agg is None:
            return groupby
        return groupby.agg(agg)

    def binby(self, by=None, agg=None, sort=False, limits=None, shape=DEFAULT_SHAPE, delay=False, progress=None):
        from .groupby import BinBy
        binby = BinBy(self, by=by, sort=sort, limits=limits, shape=shape)
        if agg is None:
            return binby
        return binby.agg(agg)

    def rolling(self, window, trim=False, column=None, fill_value=None, edge="right"):
        from .rolling import Rolling
        return Rolling(self, window, trim=trim, columns=column, fill_value=fill_value, edge=edge)

    def shift(self, periods, column=None, fill_value=None, trim=False, inplace=False):
        from .shift import shift as shift_impl
        return shift_impl(self, periods, column=column, fill_value=fill_value, trim=trim, inplace=inplace)

    def diff(self, periods=1, column=None, fill_value=None, trim=False, inplace=False):
        df = self if inplace else self.copy()
        columns = column if column is not None else df.get_column_names(strings=False)
        columns = [columns] if isinstance(columns, str) else [_ensure_string_expression(c) for c in columns]
        df = df.extract() if df.filtered else df
        # alias each column so only the alias gets shifted, then diff against it
        aliases = {}
        for name in columns:
            alias = f"__{name}_diff_shift"
            if name in df.virtual_columns:
                df.add_column(alias, df.evaluate(name, filtered=False))
            else:
                df.add_column(alias, df.dataset[name])
            aliases[name] = alias
        shifted = df.shift(periods, column=list(aliases.values()), fill_value=fill_value, trim=trim)
        for name, alias in aliases.items():
            shifted.add_virtual_column(name, f"({name}) - ({alias})" if name not in shifted.virtual_columns
                                       else f"({shifted.virtual_columns[name]}) - ({alias})")
        return shifted

    def concat(self, *others, resolver="flexible"):
        from . import concat as concat_impl
        return concat_impl([self] + list(others), resolver=resolver)

    # -- materialize / export -----------------------------------------
    def materialize(self, column=None, inplace=False, virtual_column=None):
        """Evaluate virtual columns into real arrays (reference:
        dataframe.py materialize)."""
        df = self if inplace else self.copy()
        if virtual_column is not None:
            column = virtual_column
        columns = [column] if isinstance(column, str) else (column or list(df.virtual_columns))
        for name in columns:
            values = df.evaluate(name, filtered=False)
            del df.virtual_columns[name]
            df.column_names.remove(name)
            df.add_column(name, values)
        return df

    def export(self, path, progress=None, chunk_size=None, parallel=True, fs_options=None, fs=None, **kwargs):
        """Dispatch by extension (reference: dataframe.py:6731)."""
        path = str(path)
        if path.endswith((".hdf5", ".h5")):
            self.export_hdf5(path, progress=progress, chunk_size=chunk_size, **kwargs)
        elif path.endswith((".arrow", ".ipc")):
            self.export_arrow(path, progress=progress, chunk_size=chunk_size, **kwargs)
        elif path.endswith(".feather"):
            self.export_feather(path, progress=progress, **kwargs)
        elif path.endswith((".parquet", ".pq")):
            self.export_parquet(path, progress=progress, chunk_size=chunk_size, **kwargs)
        elif path.endswith((".csv", ".txt")):
            self.export_csv(path, progress=progress, chunk_size=chunk_size, **kwargs)
        elif path.endswith(".json"):
            self.export_json(path, progress=progress, **kwargs)
        elif path.endswith((".vot", ".votable")):
            self.export_votable(path, **kwargs)
        elif path.endswith(".fits"):
            self.export_fits(path, progress=progress)
        else:
            raise ValueError(f"unknown extension for {path}")

    def export_hdf5(self, path, progress=None, chunk_size=None, **kwargs):
        from .io.hdf5 import export_hdf5
        export_hdf5(self, path, chunk_size=chunk_size, progress=progress, **kwargs)

    def export_arrow(self, path, progress=None, chunk_size=None, as_stream=False, **kwargs):
        from .io.arrow import export_arrow
        export_arrow(self, path, chunk_size=chunk_size, progress=progress, as_stream=as_stream)

    def export_feather(self, path, progress=None, **kwargs):
        from .io.arrow import export_feather
        export_feather(self, path, **kwargs)

    def export_parquet(self, path, progress=None, chunk_size=None, **kwargs):
        from .io.arrow import export_parquet
        export_parquet(self, path, chunk_size=chunk_size, progress=progress)

    def export_csv(self, path, progress=None, chunk_size=None, **kwargs):
        from .io.csv import export_csv
        export_csv(self, path, chunk_size=chunk_size, progress=progress, **kwargs)

    def drop_duplicates(self, columns=None):
        """Unique rows by the given columns, keeping the first occurrence
        (reference: dataframe.py drop_duplicates — groupby keys + first row
        index, then a lazy take)."""
        columns = columns or self.get_column_names()
        columns = [columns] if isinstance(columns, str) else [_ensure_string_expression(c) for c in columns]
        from . import agg as agg_mod
        from .column import ColumnVirtualRange
        df = self.extract() if self.filtered else self.copy()
        row_name = utils.find_valid_name("__row_index", used=df.get_column_names(hidden=True))
        df.add_column(row_name, ColumnVirtualRange(0, df.dataset.row_count))
        grouped = df.groupby(columns, agg={"__first_row": agg_mod.min(row_name)})
        rows = np.sort(np.asarray(grouped.evaluate("__first_row")))
        return df.take(rows, filtered=False).drop(row_name)

    def export_partitioned(self, path, by, directory_format="{key}={value}", progress=None, chunk_size=None, **kwargs):
        """Hive-style partitioned export (reference: dataframe.py
        export_partitioned): one file per group value combination under
        key=value directories."""
        import os as _os
        by = [by] if isinstance(by, (str, Expression)) else list(by)
        by = [_ensure_string_expression(b) for b in by]
        for values, df_group in self.groupby(by):
            values = values if isinstance(values, tuple) else (values,)
            parts = [directory_format.format(key=k, value=v) for k, v in zip(by, values)]
            directory = _os.path.join(path, *parts)
            _os.makedirs(directory, exist_ok=True)
            fname = _os.path.join(directory, f"part.{path.rsplit('.', 1)[-1] if '.' in path else 'parquet'}")
            df_group.extract().drop(by).export(fname, **kwargs)

    def export_json(self, path, progress=None, **kwargs):
        import json
        records = self.to_records()
        with open(path, "w") as f:
            json.dump(records, f, default=str)

class DataFrameConcatenated(DataFrameLocal):
    """Reference: dataframe.py DataFrameConcatenated — built on the lazily
    concatenated dataset."""

    def __init__(self, dfs, resolver="flexible"):
        dfs = list(dfs)
        datasets = [df.extract().dataset for df in dfs]
        dataset = datasets[0].concat(*datasets[1:], resolver=resolver)
        super().__init__(dataset)
        # merge virtual columns present in all
        first = dfs[0]
        for name, expr in first.virtual_columns.items():
            if all(df.virtual_columns.get(name) == expr for df in dfs):
                self.add_virtual_column(name, expr)
