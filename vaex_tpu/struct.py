"""DataFrame-level struct operations (reference:
/root/reference/packages/vaex-core/vaex/struct.py:19-62 DataFrameAccessorStruct).

Struct columns are Arrow struct arrays; field projection stays a lazy
virtual column (struct_get), so flatten() is metadata-only until evaluated.
"""

from __future__ import annotations

from .dataframe import register_dataframe_accessor


@register_dataframe_accessor("struct")
class DataFrameAccessorStruct:
    """`df.struct`: struct-column helpers."""

    def __init__(self, df):
        self.df = df

    def _field_names(self, column, df=None):
        dtype = (df if df is not None else self.df).data_type(column)
        t = dtype.internal
        return [t.field(i).name for i in range(t.num_fields)]

    def flatten(self, column=None, recursive=True, join_char="_"):
        """Expand struct columns into one column per field
        (reference: struct.py:24 flatten).

        :param column: column name or list of names to expand (default: all)
        :param recursive: keep expanding struct fields that are structs
        :param join_char: separator between the parent and field name
        """
        df = self.df.copy()
        if column is None:
            filter_columns = set(self.df.get_column_names())
        elif isinstance(column, str):
            filter_columns = {column}
        else:
            filter_columns = set(column)
        queue = list(self.df.get_column_names())
        column_names = []
        while queue:
            name = queue.pop(0)
            dtype = df.data_type(name)
            if name in filter_columns and dtype.is_struct:
                for field in reversed(self._field_names(name, df)):
                    projected = f"{name}{join_char}{field}"
                    df[projected] = df[name].struct.get(field)
                    queue.insert(0, projected)
                    if recursive:
                        filter_columns.add(projected)
            else:
                column_names.append(name)
        out = df[column_names]
        # hide the struct parents (copy keeps dependencies visible; the
        # reference's _hide_column is a "__"-prefix rename)
        for name in out.get_column_names():
            if name not in column_names:
                out.rename(name, f"__{name}")
        return out

    def keys(self, column):
        """Field names of a struct column."""
        return self._field_names(column)
