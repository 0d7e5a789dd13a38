"""GraphQL query interface: df.graphql accessor.

Counterpart of /root/reference/packages/vaex-graphql (369 LoC, Hasura-like
schema: where/groupby/agg/min/max/mean, graphql/__init__.py:1-343).  Two
entry points with the same semantics:

* ``df.graphql.query({...})`` — plain JSON documents (no dependencies);
* ``df.graphql.execute("{ df { count mean { x } } }")`` — GraphQL *string*
  documents, parsed by the built-in recursive-descent parser below
  (graphene is not available in this environment; the parser covers the
  subset the reference schema exposes: where-arguments, aggregations on
  fields, nested groupby, row pagination).
"""

from __future__ import annotations

import re

import numpy as np

from .dataframe import register_dataframe_accessor

_OPERATORS = {
    "_eq": lambda col, v: f"({col}) == {v!r}",
    "_neq": lambda col, v: f"({col}) != {v!r}",
    "_gt": lambda col, v: f"({col}) > {v!r}",
    "_gte": lambda col, v: f"({col}) >= {v!r}",
    "_lt": lambda col, v: f"({col}) < {v!r}",
    "_lte": lambda col, v: f"({col}) <= {v!r}",
    "_in": lambda col, v: f"isin({col}, {list(v)!r})",
}


def _where_expression(where: dict) -> str:
    parts = []
    for key, value in where.items():
        if key == "_and":
            parts.append(" & ".join(f"({_where_expression(w)})" for w in value))
        elif key == "_or":
            parts.append(" | ".join(f"({_where_expression(w)})" for w in value))
        elif key == "_not":
            parts.append(f"~({_where_expression(value)})")
        else:
            for op, v in value.items():
                if op not in _OPERATORS:
                    raise ValueError(f"unknown operator {op!r}")
                parts.append(_OPERATORS[op](key, v))
    return " & ".join(f"({p})" for p in parts) if parts else "True"


# --------------------------------------------------------------------------
# GraphQL string-document parser (the subset the reference schema exposes)

_TOKEN = re.compile(r"""
    (?P<ws>[\s,]+)
  | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
  | (?P<float>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
  | (?P<int>-?\d+)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<punct>[{}():\[\]!])
""", re.VERBOSE)


def _tokenize(text):
    pos = 0
    out = []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise ValueError(f"GraphQL syntax error at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent parser for { field(args) { selection } ... }."""

    def __init__(self, text):
        self.tokens = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.tokens[self.i]

    def next(self):
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, value):
        kind, tok = self.next()
        if tok != value:
            raise ValueError(f"GraphQL syntax error: expected {value!r}, got {tok!r}")

    def parse_document(self):
        kind, tok = self.peek()
        if kind == "name" and tok in ("query", "mutation"):
            self.next()
            if self.peek()[0] == "name":  # operation name
                self.next()
        return self.parse_selection_set()

    def parse_selection_set(self):
        self.expect("{")
        fields = []
        while self.peek()[1] != "}":
            fields.append(self.parse_field())
        self.expect("}")
        return fields

    def parse_field(self):
        kind, name = self.next()
        if kind != "name":
            raise ValueError(f"GraphQL syntax error: expected field name, got {name!r}")
        args = {}
        if self.peek()[1] == "(":
            self.next()
            while self.peek()[1] != ")":
                _, arg_name = self.next()
                self.expect(":")
                args[arg_name] = self.parse_value()
            self.expect(")")
        selections = None
        if self.peek()[1] == "{":
            selections = self.parse_selection_set()
        return (name, args, selections)

    def parse_value(self):
        kind, tok = self.next()
        if kind == "int":
            return int(tok)
        if kind == "float":
            return float(tok)
        if kind == "string":
            return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if kind == "name":
            return {"true": True, "false": False, "null": None}.get(tok, tok)
        if tok == "{":
            obj = {}
            while self.peek()[1] != "}":
                _, key = self.next()
                self.expect(":")
                obj[key] = self.parse_value()
            self.expect("}")
            return obj
        if tok == "[":
            items = []
            while self.peek()[1] != "]":
                items.append(self.parse_value())
            self.expect("]")
            return items
        raise ValueError(f"GraphQL syntax error: unexpected {tok!r} in value")


_AGG_FIELDS = ("min", "max", "mean", "sum", "std", "var", "count")


def _to_python(value):
    value = np.asarray(value)
    return value.tolist()


def _execute_df_field(df, args, selections):
    """Resolve one `df(...) { ... }` field (reference: create_aggregate,
    graphql/__init__.py:214-343)."""
    if args.get("where"):
        df = df.filter(_where_expression(args["where"]))
    out = {}
    for name, fargs, subsel in selections or []:
        if name == "count":
            out["count"] = int(df.count())
        elif name in _AGG_FIELDS:
            vals = {}
            for col, _, _ in subsel or []:
                vals[col] = float(getattr(df, name)(col))
            out[name] = vals
        elif name == "row":
            limit = fargs.get("limit", 100)
            offset = fargs.get("offset", 0) or 0
            n = min(len(df) - offset, limit)
            sliced = df[offset:offset + max(n, 0)]
            cols = [c for c, _, _ in subsel or []]
            data = {c: _to_python(sliced.evaluate(c)) for c in cols}
            out["row"] = [dict(zip(cols, vals)) for vals in zip(*[data[c] for c in cols])] \
                if cols else []
        elif name == "groupby":
            out["groupby"] = _execute_groupby(df, [], subsel or [])
        else:
            raise ValueError(f"unknown field {name!r} on df")
    return out


def _execute_groupby(df, by, selections):
    """`groupby { <column> { count keys mean { col } groupby {...} } }`
    (reference: create_groupby, graphql/__init__.py:167-202)."""
    out = {}
    for col, _, subsel in selections:
        by2 = by + [col]
        groupby = df.groupby(by2)
        sub = {}
        for name, fargs, inner in subsel or []:
            if name == "count":
                dfg = groupby.agg({"count": "count"})
                sub["count"] = _to_python(dfg["count"].values)
            elif name == "keys":
                dfg = groupby.agg({"count": "count"})
                sub["keys"] = _to_python(dfg[col].values)
            elif name in _AGG_FIELDS:
                from . import agg as agg_mod
                vals = {}
                for vcol, _, _ in inner or []:
                    dfg = groupby.agg({"agg": getattr(agg_mod, name)(vcol)})
                    vals[vcol] = _to_python(dfg["agg"].values)
                sub[name] = vals
            elif name == "groupby":
                sub["groupby"] = _execute_groupby(df, by2, inner or [])
            else:
                raise ValueError(f"unknown field {name!r} in groupby")
        out[col] = sub
    return out


class ExecutionResult:
    """Mirrors graphql.ExecutionResult: `.data` and `.errors`."""

    def __init__(self, data=None, errors=None):
        self.data = data
        self.errors = errors

    def __repr__(self):
        return f"ExecutionResult(data={self.data!r}, errors={self.errors!r})"


@register_dataframe_accessor("graphql")
class DataFrameAccessorGraphQL:
    def __init__(self, df):
        self.df = df

    def query(self, q: dict):
        """Execute a Hasura-style query document.

        Example (mirrors the reference's graphene schema):
            {"where": {"age": {"_gt": 30}},
             "groupby": ["city"],
             "agg": {"count": True, "mean": ["income"], "min": ["age"]},
             "row_limit": 100}
        or row selection:
            {"where": ..., "select": ["name", "age"], "limit": 10, "offset": 0}
        """
        if isinstance(q, str):
            raise TypeError("string GraphQL documents require graphene (not in this "
                            "environment); pass a dict query — see this method's docstring")
        df = self.df
        if "where" in q and q["where"]:
            df = df.filter(_where_expression(q["where"]))
        if "groupby" in q and q["groupby"]:
            agg_spec = {}
            agg_q = q.get("agg", {"count": True})
            if agg_q.get("count"):
                agg_spec["count"] = "count"
            from . import agg as agg_mod
            for op in ("mean", "sum", "min", "max", "std", "nunique"):
                for col in agg_q.get(op, []):
                    agg_spec[f"{col}_{op}"] = getattr(agg_mod, op)(col)
            res = df.groupby(q["groupby"], agg=agg_spec,
                             sort=q.get("sort", False), row_limit=q.get("row_limit"))
            return res.to_dict(array_type="python")
        out = {}
        agg_q = q.get("agg")
        if agg_q:
            if agg_q.get("count"):
                out["count"] = int(df.count())
            for op in ("mean", "sum", "min", "max", "std"):
                for col in agg_q.get(op, []):
                    out[f"{col}_{op}"] = float(getattr(df, op)(col))
            return out
        columns = q.get("select") or df.get_column_names()
        offset = q.get("offset", 0)
        limit = q.get("limit", 100)
        sliced = df[offset:min(offset + limit, len(df))]
        return sliced.to_dict(column_names=columns, array_type="python")

    def schema(self, name="df"):
        """A `graphene.Schema` over this DataFrame when graphene is
        installed (graphql_graphene.create_schema, mirroring the reference's
        type mapping graphql/__init__.py:47-343); otherwise a facade with the
        same `.execute(document)` surface backed by the built-in parser."""
        try:
            from .graphql_graphene import create_schema
            return create_schema({name: self.df})
        except ImportError:
            pass
        accessor = self

        class _Schema:
            def execute(self, document, **kwargs):
                return accessor.execute(document, name=name)

        return _Schema()

    def execute(self, q, name="df"):
        """Execute a GraphQL document — a string like
        ``"{ df(where: {x: {_gt: 2}}) { count mean { y } row(limit: 3) { x } } }"``
        or a dict document (see `query`).  Returns an ExecutionResult with
        ``.data`` / ``.errors`` like the reference's graphene schema."""
        if isinstance(q, dict):
            return self.query(q)
        try:
            fields = _Parser(q).parse_document()
            data = {}
            for fname, args, selections in fields:
                if fname != name:
                    raise ValueError(f"unknown root field {fname!r} (expected {name!r})")
                data[fname] = _execute_df_field(self.df, args, selections)
            return ExecutionResult(data=data)
        except Exception as e:  # noqa: BLE001 - collected like graphene does
            return ExecutionResult(data=None, errors=[e])

    def serve(self, port=9001, address="", name="df", verbose=True):
        """Serve GraphQL over HTTP POST (reference: graphql/__init__.py:36-45
        serve via tornado; here a stdlib http.server thread).  POST a JSON
        body {"query": "..."} to /graphql."""
        import http.server
        import json as _json
        import threading
        accessor = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = _json.loads(self.rfile.read(n) or b"{}")
                result = accessor.execute(body.get("query", ""), name=name)
                payload = {"data": result.data}
                if result.errors:
                    payload["errors"] = [str(e) for e in result.errors]
                data = _json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *args):  # quiet
                pass

        server = http.server.ThreadingHTTPServer((address, port), Handler)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        if verbose:
            print(f"serving at: http://{address or 'localhost'}:{server.server_address[1]}/graphql")
        return server


def register_pandas_accessor(name="graphql"):
    """pandas DataFrame `.graphql` accessor (reference:
    vaex-graphql/vaex/graphql/__init__.py:330-343): converts the pandas frame
    through vaex and exposes the same execute/serve/schema surface.  Called
    lazily — importing vaex_tpu does not import pandas."""
    import pandas as pd

    @pd.api.extensions.register_dataframe_accessor(name)
    class GraphQLPandasAccessor:
        def __init__(self, pandas_df):
            from . import from_pandas
            self.df = from_pandas(pandas_df)

        def query(self, q):
            return self.df.graphql.query(q)

        def execute(self, q, **kwargs):
            return self.df.graphql.execute(q, **kwargs)

        def schema(self, **kwargs):
            return self.df.graphql.schema(**kwargs)

        def serve(self, *args, **kwargs):
            return self.df.graphql.serve(*args, **kwargs)

    return GraphQLPandasAccessor
