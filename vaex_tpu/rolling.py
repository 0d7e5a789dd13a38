"""Rolling windows built on shifted columns.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/rolling.py
(df.rolling, dataframe.py:5656): a window of size w over column c becomes w
shifted virtual views aggregated elementwise — lazy, no materialization."""

from __future__ import annotations

import numpy as np


class Rolling:
    def __init__(self, df, window, trim=False, columns=None, fill_value=None, edge="right"):
        self.df = df
        self.window = window
        self.trim = trim
        self.fill_value = fill_value
        self.edge = edge
        if columns is None:
            columns = df.get_column_names(strings=False)
        self.columns = [columns] if isinstance(columns, str) else [str(c) for c in columns]

    def _shifts(self):
        w = self.window
        if self.edge == "right":
            return range(0, w)          # rows [i-w+1, i]
        if self.edge == "left":
            return range(-(w - 1), 1)
        # center
        left = (w - 1) // 2
        return range(-left, w - left)

    def _apply(self, reducer_name, jnp_reduce):
        out = self.df.copy()
        for col in self.columns:
            parts = []
            for k in self._shifts():
                if k == 0:
                    parts.append(f"({col})")
                else:
                    shifted = self.df.shift(k, column=[col], fill_value=self.fill_value)
                    tmp_name = f"__{col}_shift_{k}".replace("-", "m")
                    out.add_column(tmp_name, shifted.evaluate(col))
                    parts.append(f"({tmp_name})")
            expr = self._combine(parts, reducer_name)
            out.add_virtual_column(col, expr)
        if self.trim:
            w = self.window
            out = out[w - 1:len(out)] if self.edge == "right" else out
        return out

    def _combine(self, parts, reducer):
        if reducer == "sum":
            return " + ".join(parts)
        if reducer == "mean":
            return f"({' + '.join(parts)}) / {len(parts)}"
        if reducer == "min":
            expr = parts[0]
            for p in parts[1:]:
                expr = f"minimum({expr}, {p})"
            return expr
        if reducer == "max":
            expr = parts[0]
            for p in parts[1:]:
                expr = f"maximum({expr}, {p})"
            return expr
        raise ValueError(reducer)

    def sum(self):
        return self._apply("sum", np.sum)

    def mean(self):
        return self._apply("mean", np.mean)

    def min(self):
        return self._apply("min", np.min)

    def max(self):
        return self._apply("max", np.max)
