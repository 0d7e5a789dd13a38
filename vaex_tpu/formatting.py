"""Table/expression reprs (reference: /root/reference/packages/vaex-core/vaex/formatting.py)."""

from __future__ import annotations

import numpy as np

MAX_LENGTH = 50


def _format_value(value):
    if value is None:
        return "--"
    if isinstance(value, bytes):
        value = value.decode("utf8", errors="replace")
    if isinstance(value, np.ma.core.MaskedConstant):
        return "--"
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, (np.floating,)):
        return repr(float(value))
    if isinstance(value, (np.integer,)):
        return str(int(value))
    if isinstance(value, np.datetime64):
        if np.isnat(value):
            return "--"
        return str(value)
    s = str(value)
    if len(s) > MAX_LENGTH:
        s = s[:MAX_LENGTH - 3] + "..."
    return s


def table_string(df, n=10, format="plain"):
    N = len(df)
    columns = df.get_column_names()
    head_n = min(n // 2 + n % 2, N)
    tail_n = min(n // 2, max(N - head_n, 0))
    rows = []
    for i in range(head_n):
        rows.append((i, df.to_records(i)))
    if head_n + tail_n < N:
        rows.append(("...", None))
    for i in range(N - tail_n, N):
        if i >= head_n:
            rows.append((i, df.to_records(i)))

    header = ["#"] + columns
    table_rows = [header]
    for idx, record in rows:
        if record is None:
            table_rows.append(["..."] * (len(columns) + 1))
        else:
            table_rows.append([str(idx)] + [_format_value(record.get(c)) for c in columns])

    widths = [max(len(r[i]) for r in table_rows) for i in range(len(header))]
    if format == "html":
        body = "".join(
            "<tr>" + "".join(f"<td>{cell}</td>" for cell in row) + "</tr>" for row in table_rows[1:])
        head = "<tr>" + "".join(f"<th>{cell}</th>" for cell in table_rows[0]) + "</tr>"
        return f"<table>{head}{body}</table>"
    lines = []
    for row in table_rows:
        lines.append("  ".join(cell.ljust(w) for cell, w in zip(row, widths)))
    return "\n".join(lines)


def repr_expression(expr, n=5):
    try:
        N = len(expr.df)
        count = min(n, N)
        values = expr.evaluate(0, count)
        if hasattr(values, "to_pylist"):
            values_list = values.to_pylist()
        else:
            values_list = list(np.asarray(values)) if not np.ma.isMaskedArray(values) else [
                None if m else v for v, m in zip(values.data, np.ma.getmaskarray(values))]
        shown = ", ".join(_format_value(v) for v in values_list)
        suffix = ", ..." if N > count else ""
        try:
            dtype = expr.data_type()
        except Exception:  # noqa: BLE001
            dtype = "?"
        return (f"Expression = {expr.expression}\n"
                f"Length: {N:,} dtype: {dtype}\n"
                f"[{shown}{suffix}]")
    except Exception as e:  # noqa: BLE001
        return f"Expression = {expr.expression} (error evaluating preview: {e})"


def repr_html_table(df, n=5):
    return table_string(df, n, format="html")
