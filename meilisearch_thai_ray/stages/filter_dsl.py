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


# -------------------------- Meilisearch filter-language string front end

def compile_filter_str(s: str) -> pads.Expression:
    """Meilisearch filter string (kernel/filter_lang.py grammar: =/!=/
    comparisons, IN, TO ranges, EXISTS, NOT, AND/OR, parens) -> pyarrow
    dataset expression, so string filters PUSH DOWN to the read exactly
    like the dict DSL."""
    from ..kernel.filter_lang import parse_filter

    return _ast_to_expr(parse_filter(s))


def _ast_to_expr(node) -> pads.Expression:
    tag = node[0]
    if tag == "and":
        return _ast_to_expr(node[1]) & _ast_to_expr(node[2])
    if tag == "or":
        return _ast_to_expr(node[1]) | _ast_to_expr(node[2])
    if tag == "not":
        return ~_ast_to_expr(node[1])
    if tag == "cmp":
        # TWO-valued leaves (Meilisearch semantics: a missing attribute is
        # plain FALSE, so NOT keeps it): raw(null)=null, is_valid=false, and
        # Kleene AND makes null & false = false — never null
        _, attr, op, v = node
        f = pc.field(attr)
        raw = {"=": f == v, "!=": f != v, ">": f > v, ">=": f >= v,
               "<": f < v, "<=": f <= v}[op]
        return raw & f.is_valid()
    if tag == "in":
        return pc.field(node[1]).isin(list(node[2]))
    if tag == "range":
        f = pc.field(node[1])
        return (f >= node[2]) & (f <= node[3]) & f.is_valid()
    if tag == "exists":
        f = pc.field(node[1])
        return ~f.is_null() if node[2] else f.is_null()
    raise ValueError(f"unknown AST node {tag!r}")


def filter_str_to_sql(s: str) -> str:
    """The same filter string as an ANSI-SQL WHERE clause (oracle parity:
    ONE parse drives both the pushed-down expression and the DuckDB side)."""
    from ..kernel.filter_lang import parse_filter

    return _ast_to_sql(parse_filter(s))


def _ast_to_sql(node) -> str:
    tag = node[0]
    if tag in ("and", "or"):
        return (f"({_ast_to_sql(node[1])} {tag.upper()} "
                f"{_ast_to_sql(node[2])})")
    if tag == "not":
        return f"(NOT {_ast_to_sql(node[1])})"
    # every leaf renders TWO-valued (a null attribute is plain FALSE —
    # Meilisearch's semantics: NOT keeps documents missing the attribute);
    # coalesce forces SQL's three-valued logic to agree with the pyarrow
    # expression side (property-tested in test_properties.py)
    if tag == "cmp":
        _, attr, op, v = node
        sym = "<>" if op == "!=" else op
        return f"coalesce({attr} {sym} {_sql_lit(v)}, FALSE)"
    if tag == "in":
        vals = ", ".join(_sql_lit(v) for v in node[2])
        return f"coalesce({node[1]} IN ({vals}), FALSE)"
    if tag == "range":
        return (f"coalesce({node[1]} >= {_sql_lit(node[2])} AND "
                f"{node[1]} <= {_sql_lit(node[3])}, FALSE)")
    if tag == "exists":
        return f"{node[1]} IS {'NOT ' if node[2] else ''}NULL"
    raise ValueError(f"unknown AST node {tag!r}")


def filter_str_attrs(s: str) -> list[str]:
    """Attribute names a filter string references (sorted, deduped) — lets a
    caller add exactly the filter's columns to a pruned parquet read (a
    pushed-down expression can only see projected columns)."""
    from ..kernel.filter_lang import parse_filter

    out: set[str] = set()

    def walk(node):
        tag = node[0]
        if tag in ("and", "or"):
            walk(node[1]); walk(node[2])
        elif tag == "not":
            walk(node[1])
        else:  # cmp / in / range / exists — attr at position 1
            out.add(node[1])

    walk(parse_filter(s))
    return sorted(out)
