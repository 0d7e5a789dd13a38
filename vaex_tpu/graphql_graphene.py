"""graphene-backed GraphQL schema over DataFrames (import-gated).

TPU-native counterpart of the reference's graphene type mapping
(/root/reference/packages/vaex-graphql/vaex/graphql/__init__.py:47-343):
per-DataFrame Hasura-style types — a ``where`` input tree of per-column
comparison objects (``_eq/_neq/_gt/_gte/_lt/_lte/_in``) with ``_and/_or/_not``
combinators, an Aggregation object exposing ``count`` plus per-column
``min/max/mean/sum/std`` sub-objects and ``row(limit, offset)`` access.

graphene is OPTIONAL (not in this environment): ``create_schema`` imports it
lazily — the builder receives the module so headless tests can drive it with
a fake (tests/ecosystem_test.py), while a real installation gets a genuine
``graphene.Schema``.  Resolvers delegate to the engine's own filter/agg
machinery, so the string-document parser path (graphql.py) and this schema
compute through the same code.
"""

from __future__ import annotations

import numpy as np

_COMPARISONS = ("_eq", "_neq", "_gt", "_gte", "_lt", "_lte", "_in")


def _scalar_of(graphene, dtype):
    if dtype.kind in "iu":
        return graphene.Int
    if dtype.kind == "f":
        return graphene.Float
    if dtype.kind == "b":
        return graphene.Boolean
    return graphene.String


def _comparison_where(name, comp):
    """graphene comparison input object -> engine dict-where fragment."""
    out = {}
    for op in _COMPARISONS:
        value = getattr(comp, op, None)
        if value is not None:
            out[op] = list(value) if op == "_in" else value
    return {name: out} if out else None


def _boolexp_to_where(df, exp):
    """BoolExp input tree -> the dict `where` format graphql._where_expression
    understands ({_and: [...], col: {_gt: v}, ...})."""
    where = {}
    _and = getattr(exp, "_and", None)
    if _and:
        where["_and"] = [_boolexp_to_where(df, e) for e in _and]
    _or = getattr(exp, "_or", None)
    if _or:
        where["_or"] = [_boolexp_to_where(df, e) for e in _or]
    _not = getattr(exp, "_not", None)
    if _not:
        where["_not"] = _boolexp_to_where(df, _not)
    for name in df.get_column_names():
        comp = getattr(exp, name, None)
        if comp is not None:
            frag = _comparison_where(name, comp)
            if frag:
                where.update(frag)
    return where


def create_schema(dfs, graphene=None):
    """Build a graphene.Schema over {name: DataFrame} (reference:
    graphql/__init__.py create_query:324).  Pass a module as `graphene` to
    override the import (testing with a fake)."""
    if graphene is None:
        import graphene  # noqa: F811 - the import gate
    query = create_query(dfs, graphene)
    return graphene.Schema(query=query)


def create_query(dfs, graphene):
    fields = {}
    for name, df in dfs.items():
        Aggregation = _create_aggregation(df, graphene, postfix="_" + name)
        BoolExp = _create_boolexp(df, graphene, postfix="_" + name)

        def resolve(parent, info, where=None, df=df, Aggregation=Aggregation):
            if where is not None:
                from .graphql import _where_expression
                w = _boolexp_to_where(df, where)
                if w:
                    df = df.filter(_where_expression(w))
            return Aggregation(df=df)

        fields[name] = graphene.Field(Aggregation, resolver=resolve,
                                      where=graphene.Argument(BoolExp))
    return type("Query", (graphene.ObjectType,), fields)


def _numeric_columns(df):
    out = []
    for name in df.get_column_names():
        dt = df.data_type(name)
        if getattr(dt, "is_numeric", False) or getattr(dt, "is_bool", False):
            out.append(name)
    return out


def _create_aggregation(df, graphene, postfix=""):
    """Aggregation object: count + per-column stat sub-objects + row access
    (reference: create_aggregate, graphql/__init__.py:47-286)."""

    def stat_object(op):
        attrs = {}
        for col in _numeric_columns(df):
            def resolve(parent, info, op=op, col=col):
                return float(getattr(parent.df, op)(col))
            attrs[col] = graphene.Field(graphene.Float, resolver=resolve)

        def resolve_self(parent, info):
            return parent
        holder = type(f"Agg_{op}{postfix}", (graphene.ObjectType,), attrs)
        return holder, resolve_self

    attrs = {"df": None}

    def resolve_count(parent, info):
        return int(parent.df.count())

    attrs["count"] = graphene.Field(graphene.Int, resolver=resolve_count)
    for op in ("min", "max", "mean", "sum", "std"):
        holder, resolve_self = stat_object(op)

        def resolve_stat(parent, info, holder=holder):
            out = holder()
            out.df = parent.df
            return out

        attrs[op] = graphene.Field(holder, resolver=resolve_stat)

    row_attrs = {}
    for col in df.get_column_names():
        dt = df.data_type(col)
        scalar = _scalar_of(graphene, np.dtype(str(getattr(dt, "numpy", "O"))) if hasattr(dt, "numpy") else np.dtype("O"))

        def resolve_col(parent, info, col=col):
            return parent["values"].get(col)

        row_attrs[col] = graphene.Field(scalar, resolver=resolve_col)
    Row = type(f"Row{postfix}", (graphene.ObjectType,), row_attrs)

    def resolve_row(parent, info, limit=100, offset=0):
        d = parent.df[offset:min(offset + limit, len(parent.df))]
        records = d.to_dict(array_type="python")
        n = len(next(iter(records.values()))) if records else 0
        return [{"values": {k: v[i] for k, v in records.items()}} for i in range(n)]

    attrs["row"] = graphene.Field(graphene.List(Row), resolver=resolve_row,
                                  limit=graphene.Argument(graphene.Int),
                                  offset=graphene.Argument(graphene.Int))

    def __init__(self, df=None):
        self.df = df

    attrs["__init__"] = __init__
    return type(f"Aggregation{postfix}", (graphene.ObjectType,), attrs)


def _create_boolexp(df, graphene, postfix=""):
    """Hasura-style where input (reference: create_boolexp,
    graphql/__init__.py:290-320)."""
    comparison_types = {}

    def comparison_for(col):
        dt = df.data_type(col)
        npdt = np.dtype(str(getattr(dt, "numpy", "float64"))) if hasattr(dt, "numpy") else np.dtype("O")
        scalar = _scalar_of(graphene, npdt)
        key = scalar.__name__ if hasattr(scalar, "__name__") else str(scalar)
        if key not in comparison_types:
            attrs = {op: graphene.Field(scalar) for op in _COMPARISONS if op != "_in"}
            attrs["_in"] = graphene.Field(graphene.List(scalar))
            comparison_types[key] = type(f"Comparison_{key}{postfix}",
                                         (graphene.InputObjectType,), attrs)
        return comparison_types[key]

    attrs = {
        "_and": graphene.Field(graphene.List(lambda: BoolExp)),
        "_or": graphene.Field(graphene.List(lambda: BoolExp)),
        "_not": graphene.Field(lambda: BoolExp),
    }
    for col in df.get_column_names():
        attrs[col] = graphene.Field(comparison_for(col))
    BoolExp = type(f"BoolExp{postfix}", (graphene.InputObjectType,), attrs)
    return BoolExp
