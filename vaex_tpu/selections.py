"""Named boolean selections with history (undo/redo) and combine modes.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/
selections.py:38-214: every selection reduces to a boolean *expression
string*, so it evaluates inside the compiled device pass like any other
expression (the reference caches per-chunk masks instead,
scopes.py:130-177).  The filter is the special selection ``__filter__``
(reference: vaex/dataframe.py:61).
"""

from __future__ import annotations

import numpy as np

FILTER_SELECTION_NAME = "__filter__"

_mode_function = {
    "replace": lambda old, new: new,
    "and": lambda old, new: f"({old}) & ({new})" if old else new,
    "or": lambda old, new: f"({old}) | ({new})" if old else new,
    "xor": lambda old, new: f"({old}) ^ ({new})" if old else new,
    "subtract": lambda old, new: f"({old}) & ~({new})" if old else f"~({new})",
}


def combine(old_expression, new_expression, mode):
    if mode not in _mode_function:
        raise ValueError(f"unknown selection mode {mode!r}")
    return _mode_function[mode](old_expression, new_expression)


class Selection:
    def to_expression(self, df):
        raise NotImplementedError

    def dependencies(self, df):
        from .expression import Expression
        return Expression(df, self.to_expression(df)).root_columns()

    def encode(self, encoding=None):
        raise NotImplementedError

    def __repr__(self):
        return f"{type(self).__name__}({self.encode()!r})"


class SelectionExpression(Selection):
    """Reference: vaex/selections.py:38 SelectionExpression."""

    def __init__(self, boolean_expression, previous_selection=None, mode="replace"):
        self.boolean_expression = str(boolean_expression)
        self.previous_selection = previous_selection
        self.mode = mode

    def to_expression(self, df):
        previous = self.previous_selection.to_expression(df) if self.previous_selection is not None else None
        return combine(previous, self.boolean_expression, self.mode)

    def encode(self, encoding=None):
        return dict(type="expression", boolean_expression=self.boolean_expression, mode=self.mode,
                    previous_selection=self.previous_selection.encode(encoding) if self.previous_selection else None)


class SelectionInvert(Selection):
    def __init__(self, selection):
        self.selection = selection

    def to_expression(self, df):
        return f"~({self.selection.to_expression(df)})"

    def encode(self, encoding=None):
        return dict(type="invert", selection=self.selection.encode(encoding))


class SelectionDropNa(Selection):
    """Select rows with no missing values in the given columns
    (reference: vaex/selections.py SelectionDropNa)."""

    def __init__(self, drop_nan, drop_masked, column_names, previous_selection=None, mode="replace"):
        self.drop_nan = drop_nan
        self.drop_masked = drop_masked
        self.column_names = list(column_names)
        self.previous_selection = previous_selection
        self.mode = mode

    def to_expression(self, df):
        parts = []
        for name in self.column_names:
            if self.drop_nan and self.drop_masked:
                parts.append(f"notna({name})")
            elif self.drop_nan:
                parts.append(f"notnan({name})")
            else:
                parts.append(f"notmissing({name})")
        new = " & ".join(f"({p})" for p in parts) if parts else "True"
        previous = self.previous_selection.to_expression(df) if self.previous_selection is not None else None
        return combine(previous, new, self.mode)

    def encode(self, encoding=None):
        return dict(type="dropna", drop_nan=self.drop_nan, drop_masked=self.drop_masked,
                    column_names=self.column_names, mode=self.mode,
                    previous_selection=self.previous_selection.encode(encoding) if self.previous_selection else None)


class SelectionLasso(Selection):
    """Point-in-polygon selection (reference: vaex/selections.py
    SelectionLasso; the C pnpoly kernel vaexfast.cpp:1856 becomes a
    vectorized winding-number test registered as the `_lasso` device
    function, ops/geometry.py)."""

    def __init__(self, boolean_expression_x, boolean_expression_y, xseq, yseq,
                 previous_selection=None, mode="replace"):
        self.boolean_expression_x = str(boolean_expression_x)
        self.boolean_expression_y = str(boolean_expression_y)
        self.xseq = np.asarray(xseq, dtype=np.float64)
        self.yseq = np.asarray(yseq, dtype=np.float64)
        self.previous_selection = previous_selection
        self.mode = mode
        self._vars = None

    def to_expression(self, df):
        if self._vars is None:
            vx = df.add_variable("lasso_x_", self.xseq, unique=True)
            vy = df.add_variable("lasso_y_", self.yseq, unique=True)
            self._vars = (vx, vy)
        vx, vy = self._vars
        new = f"_lasso({self.boolean_expression_x}, {self.boolean_expression_y}, {vx}, {vy})"
        previous = self.previous_selection.to_expression(df) if self.previous_selection is not None else None
        return combine(previous, new, self.mode)

    def encode(self, encoding=None):
        return dict(type="lasso", boolean_expression_x=self.boolean_expression_x,
                    boolean_expression_y=self.boolean_expression_y,
                    xseq=self.xseq.tolist(), yseq=self.yseq.tolist(), mode=self.mode,
                    previous_selection=self.previous_selection.encode(encoding) if self.previous_selection else None)


def selection_decode(spec):
    if spec is None:
        return None
    t = spec["type"]
    prev = selection_decode(spec.get("previous_selection"))
    if t == "expression":
        return SelectionExpression(spec["boolean_expression"], prev, spec.get("mode", "replace"))
    if t == "invert":
        return SelectionInvert(selection_decode(spec["selection"]))
    if t == "dropna":
        return SelectionDropNa(spec["drop_nan"], spec["drop_masked"], spec["column_names"], prev, spec.get("mode", "replace"))
    if t == "lasso":
        return SelectionLasso(spec["boolean_expression_x"], spec["boolean_expression_y"],
                              spec["xseq"], spec["yseq"], prev, spec.get("mode", "replace"))
    raise ValueError(f"unknown selection type {t!r}")


def as_selection(value):
    """Normalize user input to a Selection object."""
    from .expression import Expression
    if value is None or isinstance(value, Selection):
        return value
    if isinstance(value, Expression):
        return SelectionExpression(value.expression)
    if isinstance(value, str):
        return SelectionExpression(value)
    raise TypeError(f"cannot interpret {value!r} as a selection")
