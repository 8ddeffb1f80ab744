"""Filter DSL -> pyarrow dataset expression (reference M17 semantics).

The reference translates {"field": {"$op": value}} dicts into Meilisearch
filter strings, AND-joined (search_executor.py:766-843, ops $eq/$ne/$gt/$gte/
$lt/$lte/$in/$exists; bare values mean $eq). Here the same DSL compiles to a
pyarrow.dataset expression, so filters PUSH DOWN to the parquet read
(row-group pruning) instead of running post-hoc.
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.dataset as pads

_OPS = {
    "$eq": lambda f, v: f == v,
    "$ne": lambda f, v: f != v,
    "$gt": lambda f, v: f > v,
    "$gte": lambda f, v: f >= v,
    "$lt": lambda f, v: f < v,
    "$lte": lambda f, v: f <= v,
    "$in": lambda f, v: f.isin(list(v)),
    "$exists": lambda f, v: ~f.is_null() if v else f.is_null(),
}


def compile_filter(dsl: dict) -> pads.Expression | None:
    """{"lang": {"$in": ["en"]}, "n_chars": {"$gt": 300}, "source": "src0"}
    -> AND-joined expression. Unknown ops raise ValueError (fail loud, like the
    reference's validation)."""
    if not dsl:
        return None
    expr = None
    for field, cond in dsl.items():
        f = pc.field(field)
        if not isinstance(cond, dict):
            cond = {"$eq": cond}
        for op, value in cond.items():
            fn = _OPS.get(op)
            if fn is None:
                raise ValueError(f"unsupported filter operator: {op}")
            e = fn(f, value)
            expr = e if expr is None else (expr & e)
    return expr


def dsl_to_sql(dsl: dict) -> str:
    """The same DSL as an ANSI-SQL WHERE clause (oracle parity)."""
    parts = []
    for field, cond in (dsl or {}).items():
        if not isinstance(cond, dict):
            cond = {"$eq": cond}
        for op, value in cond.items():
            if op == "$in":
                vals = ", ".join(_sql_lit(v) for v in value)
                parts.append(f"{field} IN ({vals})")
            elif op == "$exists":
                parts.append(f"{field} IS {'NOT ' if value else ''}NULL")
            else:
                sym = {"$eq": "=", "$ne": "<>", "$gt": ">", "$gte": ">=",
                       "$lt": "<", "$lte": "<="}[op]
                parts.append(f"{field} {sym} {_sql_lit(value)}")
    return " AND ".join(parts) if parts else "TRUE"


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return str(v)
