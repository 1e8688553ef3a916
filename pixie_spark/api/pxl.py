"""Verbatim-PxL execution support: source fixups + AST lowering.

PxL is Python-syntax (the reference compiles it with its own frontend,
src/carnot/planner/compiler). Two gaps keep literal ``.pxl`` text from
running under CPython:

1. ``and`` / ``or`` / ``not`` on DataFrame columns. PxL's compiler lowers
   boolean operators to logical expressions; CPython can't overload them
   (they call ``__bool__``, which pyspark Columns reject). We lower them
   at the AST level to ``px._and / px._or / px._not`` calls, which apply
   ``& | ~`` when any operand is a Column and plain Python semantics
   otherwise — the same lowering the reference frontend does
   (src/carnot/planner/compiler/ast_visitor.cc ProcessBoolOp).

2. A handful of shipped scripts have a missing comma between keyword
   arguments (e.g. service.pxl:101, differential.pxl:30 — upstream bugs
   their own frontend must tolerate or the scripts are stale).
   ``fixup_missing_commas`` repairs exactly that pattern, guided by the
   SyntaxError position, and nothing else.
"""

from __future__ import annotations

import ast
import re


_KWARG_LINE = re.compile(r"^\s*[A-Za-z_][A-Za-z_0-9]*=")


def fixup_missing_commas(src: str) -> str:
    """Repair the known upstream missing-comma-between-kwargs bug
    (service.pxl:101, differential.pxl:30 — scripts their own frontend
    tolerates or that shipped stale).

    Only applied when the source fails to compile: CPython's SyntaxError
    pinpoints the offending line; if the NEXT line looks like a keyword
    argument (``name=...``), append a comma there and retry. Repaired
    until it compiles or the error stops moving — a syntactically valid
    script is returned untouched."""
    try:
        compile(src, "<pxl>", "exec")
        return src
    except SyntaxError:
        pass
    for _ in range(10):
        try:
            compile(src, "<pxl>", "exec")
            return src
        except SyntaxError as e:
            lines = src.split("\n")
            i = (e.lineno or 1) - 1
            if (
                0 <= i < len(lines) - 1
                and lines[i].rstrip()
                and not lines[i].rstrip().endswith((",", "(", "[", "{"))
                and _KWARG_LINE.match(lines[i + 1])
            ):
                lines[i] = lines[i].rstrip() + ","
                src = "\n".join(lines)
                continue
            return src
    return src


class _AssignLowering(ast.NodeTransformer):
    """``name.attr = v`` → ``name = px._assign_attr(name, 'attr', v)`` and
    ``name[k] = v`` → ``name = px._assign_item(name, k, v)``.

    PxL assignment has VALUE semantics: the reference frontend rebinds the
    variable to a new Dataset IR node on every column assign
    (ast_visitor.cc ProcessAssign), so a frame passed into a function is
    never mutated for the caller. Corpus scripts depend on this —
    kafka_overview's json_unnest_first5 derives df0..df4 from one shared
    frame and appends them. The helpers return a NEW PxDataFrame for
    frames and fall back to plain setattr/setitem (aliasing preserved)
    for every other object."""

    def _px_call(self, fn: str, args: list[ast.expr]) -> ast.Call:
        return ast.Call(
            func=ast.Attribute(
                value=ast.Name(id="px", ctx=ast.Load()), attr=fn, ctx=ast.Load()
            ),
            args=args,
            keywords=[],
        )

    def visit_Assign(self, node: ast.Assign):  # noqa: N802
        self.generic_visit(node)
        if len(node.targets) != 1:
            return node
        t = node.targets[0]
        if isinstance(t, ast.Attribute) and isinstance(t.value, ast.Name):
            call = self._px_call(
                "_assign_attr",
                [ast.Name(id=t.value.id, ctx=ast.Load()),
                 ast.Constant(value=t.attr), node.value],
            )
            return ast.Assign(
                targets=[ast.Name(id=t.value.id, ctx=ast.Store())], value=call
            )
        if isinstance(t, ast.Subscript) and isinstance(t.value, ast.Name):
            call = self._px_call(
                "_assign_item",
                [ast.Name(id=t.value.id, ctx=ast.Load()), t.slice, node.value],
            )
            return ast.Assign(
                targets=[ast.Name(id=t.value.id, ctx=ast.Store())], value=call
            )
        return node


class _BoolOpLowering(ast.NodeTransformer):
    """a and b → px._and(a, b); a or b → px._or(a, b); not a → px._not(a)."""

    def _px(self, fn: str, args: list[ast.expr]) -> ast.Call:
        return ast.Call(
            func=ast.Attribute(
                value=ast.Name(id="px", ctx=ast.Load()), attr=fn, ctx=ast.Load()
            ),
            args=args,
            keywords=[],
        )

    def visit_BoolOp(self, node: ast.BoolOp) -> ast.Call:  # noqa: N802
        self.generic_visit(node)
        fn = "_and" if isinstance(node.op, ast.And) else "_or"
        out = node.values[0]
        for v in node.values[1:]:
            out = self._px(fn, [out, v])
        return out

    def visit_UnaryOp(self, node: ast.UnaryOp):  # noqa: N802
        self.generic_visit(node)
        if isinstance(node.op, ast.Not):
            return self._px("_not", [node.operand])
        return node

    def visit_BinOp(self, node: ast.BinOp):  # noqa: N802
        """a + b → px._add(a, b): PxL's + concatenates strings (the
        reference registers a string AddUDF); Spark Columns need concat.
        px._add keeps numeric semantics for non-string operands."""
        self.generic_visit(node)
        if isinstance(node.op, ast.Add):
            return self._px("_add", [node.left, node.right])
        return node


def compile_pxl(src: str, filename: str = "<pxl_script>"):
    """Source → code object with the PxL lowerings applied."""
    src = fixup_missing_commas(src)
    tree = ast.parse(src, filename)
    tree = _BoolOpLowering().visit(tree)
    tree = _AssignLowering().visit(tree)
    ast.fix_missing_locations(tree)
    return compile(tree, filename, "exec")
