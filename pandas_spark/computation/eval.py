"""pandas query/eval dialect → Spark SQL expression translator.

pandas parses the *Python* AST (reference: pandas/core/computation/
expr.py:805 Expr, PandasExprVisitor:783) rewriting chained
comparisons, ``in``→isin, ``and/or``→``&/|``, resolving ``@var``
locals via Scope (computation/scope.py). Spark SQL already parses a
superset of the target language, so this is a small AST→SQL printer
(SURVEY.md §3.3): Python expression in, ANSI-SQL string out, handed
to ``F.expr`` for Catalyst to optimize like any native predicate.
"""

from __future__ import annotations

import ast
from typing import Any, Mapping

_BINOPS = {
    ast.Add: "+",
    ast.Sub: "-",
    ast.Mult: "*",
    ast.Div: "/",
    ast.Mod: "%",
    ast.Pow: "power",
    ast.FloorDiv: "floordiv",
}

_CMPOPS = {
    ast.Eq: "=",
    ast.NotEq: "!=",
    ast.Lt: "<",
    ast.LtE: "<=",
    ast.Gt: ">",
    ast.GtE: ">=",
}


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple, set)):
        return "(" + ", ".join(_sql_literal(x) for x in v) + ")"
    if hasattr(v, "isoformat"):  # datetime/date
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'" if hasattr(v, "hour") else f"DATE '{v.isoformat()}'"
    return repr(v)


class _Printer(ast.NodeVisitor):
    def __init__(self, scope: Mapping[str, Any]):
        self.scope = scope

    def visit_Expression(self, node):
        return self.visit(node.body)

    def visit_BoolOp(self, node):
        op = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + op.join(self.visit(v) for v in node.values) + ")"

    def visit_BinOp(self, node):
        if isinstance(node.op, ast.BitAnd):
            return f"({self.visit(node.left)} AND {self.visit(node.right)})"
        if isinstance(node.op, ast.BitOr):
            return f"({self.visit(node.left)} OR {self.visit(node.right)})"
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ValueError(f"unsupported operator {ast.dump(node.op)}")
        l, r = self.visit(node.left), self.visit(node.right)
        if op == "power":
            return f"power({l}, {r})"
        if op == "floordiv":
            return f"floor({l} / {r})"
        return f"({l} {op} {r})"

    def visit_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, (ast.Not, ast.Invert)):
            return f"(NOT {v})"
        if isinstance(node.op, ast.USub):
            return f"(-{v})"
        return v

    def visit_Compare(self, node):
        parts = []
        left = self.visit(node.left)
        for op, comp in zip(node.ops, node.comparators):
            right = self.visit(comp)
            if isinstance(op, ast.In):
                parts.append(f"{left} IN {right}")
            elif isinstance(op, ast.NotIn):
                parts.append(f"{left} NOT IN {right}")
            else:
                parts.append(f"{left} {_CMPOPS[type(op)]} {right}")
            left = right
        return "(" + " AND ".join(parts) + ")"

    def visit_Name(self, node):
        if node.id in ("True", "False", "None"):
            return {"True": "TRUE", "False": "FALSE", "None": "NULL"}[node.id]
        return f"`{node.id}`"

    def visit_Attribute(self, node):
        # col.str.len()-style not supported in query strings; dotted name
        return f"`{self.visit(node.value).strip('`')}.{node.attr}`"

    def visit_Constant(self, node):
        return _sql_literal(node.value)

    def visit_List(self, node):
        return "(" + ", ".join(self.visit(e) for e in node.elts) + ")"

    visit_Tuple = visit_List

    def visit_Call(self, node):
        allowed = {"abs", "sqrt", "exp", "log", "sin", "cos", "floor", "ceil", "upper", "lower"}
        if isinstance(node.func, ast.Name) and node.func.id in allowed:
            args = ", ".join(self.visit(a) for a in node.args)
            return f"{node.func.id}({args})"
        raise ValueError("only simple math/string functions allowed in query()")

    def generic_visit(self, node):
        raise ValueError(f"unsupported syntax in query(): {type(node).__name__}")


def _resolve_at_vars(expr: str, scope: Mapping[str, Any]) -> str:
    """``@var`` → inline SQL literal from the caller's scope."""
    out = []
    i = 0
    quote = None  # inside a string literal, @ is just a character
    while i < len(expr):
        ch = expr[i]
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch == "@":
            j = i + 1
            while j < len(expr) and (expr[j].isalnum() or expr[j] == "_"):
                j += 1
            name = expr[i + 1 : j]
            if name not in scope:
                raise NameError(f"@{name} not found in scope")
            out.append(_sql_literal(scope[name]))
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def translate_query(expr: str, scope: Mapping[str, Any] | None = None) -> str:
    """pandas ``DataFrame.query`` string → Spark SQL boolean expression."""
    scope = scope or {}
    src = _resolve_at_vars(expr, scope)
    # backticked names parse as Name after replacement with safe tokens
    src = src.replace("`", "")
    tree = ast.parse(src, mode="eval")
    return _Printer(scope).visit(tree)


def translate_assign(expr: str, scope: Mapping[str, Any] | None = None) -> tuple[str, str]:
    """pandas ``DataFrame.eval('name = expr')`` → (name, SQL expression)."""
    name, _, rhs = expr.partition("=")
    if not rhs:
        raise ValueError("eval() expects 'name = expression'")
    return name.strip(), translate_query(rhs.strip(), scope)
