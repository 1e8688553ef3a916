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
   arguments (e.g. service.pxl:101, an upstream bug their own frontend
   must tolerate or the scripts are stale). ``fixup_missing_commas``
   repairs exactly that pattern — a line ending in ``)`` followed by a
   line starting with ``name=`` — and nothing else.
"""

from __future__ import annotations

import ast
import re

_MISSING_COMMA = re.compile(r"(\)[ \t]*)\n(\s*[A-Za-z_][A-Za-z_0-9]*=)")


def fixup_missing_commas(src: str) -> str:
    """Repair the known upstream missing-comma-between-kwargs bug.

    Only applied when the source fails to compile, and only until it
    compiles — a syntactically valid script is returned untouched."""
    try:
        compile(src, "<pxl>", "exec")
        return src
    except SyntaxError:
        pass
    for _ in range(10):
        fixed = _MISSING_COMMA.sub(r"\1,\n\2", src)
        if fixed == src:
            break
        src = fixed
        try:
            compile(src, "<pxl>", "exec")
            return src
        except SyntaxError:
            continue
    return src


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
    ast.fix_missing_locations(tree)
    return compile(tree, filename, "exec")
