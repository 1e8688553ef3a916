"""PxL-style compile errors for the facade surface.

The reference compiles PxL with its own frontend and turns every user
mistake into a located CompilerError (src/carnot/planner/compiler/
compiler_test.cc — 3.2k LoC of ERROR cases; per-rule tests under
compiler/analyzer/*_test.cc). This facade's "compiler" is CPython +
Catalyst, whose raw failures are py4j tracebacks a PxL user can't act
on. These exception types restore the reference's contract: a clear,
PxL-phrased message naming the offending table/column/function.

Each subclass also inherits the Python exception a pre-round-5 caller
would have caught (KeyError/TypeError/ValueError/AttributeError), so
hardening the wording never breaks existing handlers.

Message wording mirrors the reference where one exists:
- "Table '$0' not found."            (ir/memory_source_ir.cc:116)
- "Column '$0' not found in parent dataframe"
                                      (analyzer_test.cc:313,375,779)
- "Expected tuple for $0 but received $1"  (objects/dataframe.cc:227)
- "All elements of the agg tuple must be column names, except the last
   which should be a function"        (objects/dataframe.cc:189)
- "Expected second tuple argument to be type Func, received $0"
                                      (objects/dataframe.cc:198)
- "Could not find function '$0'."    (compiler_state/registry_info.cc:121)
- "Expected Boolean for Filter expression" (compiler_test.cc:672)
- "'groupby()' should be followed by an 'agg()'"
                                      (remove_group_by_rule_test.cc:68)
- "'suffixes' must be a list with 2 elements. Received $0"
                                      (objects/dataframe.cc:170)
- "subscript argument must have a list of strings or expression. '$0'
   not allowed"                       (objects/dataframe.cc:301)
- "No runnable code found"           (compiler_test.cc:2547)
- "SyntaxError: ..."                 (compiler_test.cc:2430-2443)
"""

from __future__ import annotations


class CompilerError(Exception):
    """A PxL compile-surface error: message + optional script location."""

    def __init__(self, message: str, line: int | None = None, col: int | None = None):
        self.message = message
        self.line = line
        self.col = col
        super().__init__(message)

    def __str__(self) -> str:  # KeyError would repr-quote the message
        loc = f" (line {self.line})" if self.line is not None else ""
        return f"{self.message}{loc}"


class PxKeyError(CompilerError, KeyError):
    """Unknown table/column — also a KeyError for legacy handlers."""


class PxTypeError(CompilerError, TypeError):
    """Malformed expression/tuple/filter — also a TypeError."""


class PxValueError(CompilerError, ValueError):
    """Bad argument value (unknown function, bad 'how') — also ValueError."""


class PxAttributeError(CompilerError, AttributeError):
    """Unknown dataframe method/column — also an AttributeError (the
    getattr protocol requires it)."""


def column_not_found(name: str, columns) -> PxKeyError:
    return PxKeyError(
        f"Column '{name}' not found in parent dataframe. Columns: {sorted(columns)}"
    )
