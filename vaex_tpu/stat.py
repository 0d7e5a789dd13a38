"""Composable statistic expressions: `vaex.stat.mean('x') / vaex.stat.std('x')`.

Counterpart of /root/reference/packages/vaex-core/vaex/stat.py:7-122 — lazy
algebra over grid statistics: a statistic object describes *what* to compute
(count/sum/mean/std/covar/correlation of expressions), combines with Python
operators and numpy functions into derived quantities, and `calculate(df,
binby=..., shape=...)` evaluates the whole tree, batching every underlying
grid statistic into one fused device pass via delay=True.
"""

from __future__ import annotations

import operator

import numpy as np

from .delayed import delayed

_BINOPS = {
    "add": (operator.add, "+"), "sub": (operator.sub, "-"),
    "mul": (operator.mul, "*"), "truediv": (operator.truediv, "/"),
    "floordiv": (operator.floordiv, "//"), "mod": (operator.mod, "%"),
    "pow": (operator.pow, "**"),
    "lt": (operator.lt, "<"), "le": (operator.le, "<="),
    "gt": (operator.gt, ">"), "ge": (operator.ge, ">="),
    "eq": (operator.eq, "=="), "ne": (operator.ne, "!="),
}
_REVERSABLE = {"add", "sub", "mul", "truediv", "floordiv", "mod", "pow"}
_UNOPS = {"neg": (operator.neg, "-"), "pos": (operator.pos, "+"),
          "abs": (operator.abs, "abs")}


class Meta(type):
    def __new__(mcs, name, bases, attrs):
        for opname, (fn, code) in _BINOPS.items():
            def make(fn=fn, code=code):
                def fwd(a, b):
                    return _StatisticsCalculation(code, fn, [a, b], binary=True)

                def rev(a, b):
                    return _StatisticsCalculation(code, fn, [b, a], binary=True)
                return fwd, rev
            fwd, rev = make()
            attrs.setdefault(f"__{opname}__", fwd)
            if opname in _REVERSABLE:
                attrs.setdefault(f"__r{opname}__", rev)
        for opname, (fn, code) in _UNOPS.items():
            def make(fn=fn, code=code):
                def f(a):
                    return _StatisticsCalculation(code, fn, [a], unary=True)
                return f
            attrs.setdefault(f"__{opname}__", make())
        return type.__new__(mcs, name, bases, attrs)


class Expression(metaclass=Meta):
    """A (composition of) statistic(s); reference: stat.py Expression."""

    def calculate(self, df, binby=[], shape=256, limits=None, selection=None,
                  delay=False, progress=None):
        raise NotImplementedError

    # numpy ufuncs applied to statistics compose lazily too
    def sqrt(self):
        return _StatisticsCalculation("sqrt", np.sqrt, [self])

    def log(self):
        return _StatisticsCalculation("log", np.log, [self])

    def log10(self):
        return _StatisticsCalculation("log10", np.log10, [self])

    def __repr__(self):
        return f"{self}"


class _StatisticsCalculation(Expression):
    """An operator node over statistics (reference: stat.py:47)."""

    def __init__(self, code, op, args, binary=False, unary=False):
        self.code = code
        self.op = op
        self.args = args
        self.binary = binary
        self.unary = unary

    def __str__(self):
        if self.binary:
            return f"({self.args[0]} {self.code} {self.args[1]})"
        if self.unary:
            return f"{self.code}({self.args[0]})"
        return f"{self.code}({', '.join(str(a) for a in self.args)})"

    def calculate(self, df, binby=[], shape=256, limits=None, selection=None,
                  delay=False, progress=None):
        def to_value(v):
            if isinstance(v, Expression):
                return v.calculate(df, binby=binby, shape=shape, limits=limits,
                                   selection=selection, delay=True)
            return v
        values = [to_value(v) for v in self.args]
        result = delayed(self.op)(*values)
        return df._delay(delay, result)


class _Statistic(Expression):
    """A leaf statistic bound to df method `name` (reference: stat.py:79)."""

    def __init__(self, name, *expressions):
        self.name = name
        self.expressions = expressions
        self.args = expressions

    def pretty_name(self, id=None):
        id = id or "_".join(map(str, self.expressions))
        return f"{id}_{self.name}"

    def __str__(self):
        return f"{self.name}({', '.join(str(a) for a in self.args)})"

    def calculate(self, df, binby=[], shape=256, limits=None, selection=None,
                  delay=False, progress=None):
        method = getattr(df, self.name)
        return method(*self.expressions, binby=binby, shape=shape, limits=limits,
                      selection=selection, delay=delay, progress=progress)


def count(expression="*"):
    """Count statistic."""
    return _Statistic("count", expression)


def sum(expression):
    """Sum statistic."""
    return _Statistic("sum", expression)


def mean(expression):
    """Mean statistic."""
    return _Statistic("mean", expression)


def std(expression):
    """Standard deviation statistic."""
    return _Statistic("std", expression)


def var(expression):
    """Variance statistic."""
    return _Statistic("var", expression)


def min(expression):
    """Minimum statistic."""
    return _Statistic("min", expression)


def max(expression):
    """Maximum statistic."""
    return _Statistic("max", expression)


def covar(x, y):
    """Covariance statistic."""
    return _Statistic("covar", x, y)


def correlation(x, y):
    """Correlation-coefficient statistic."""
    return _Statistic("correlation", x, y)
