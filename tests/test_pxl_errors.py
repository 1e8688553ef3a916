"""Compile-error parity with the reference's compiler test corpus.

The reference ships 3.2k LoC of compiler ERROR cases
(src/carnot/planner/compiler/compiler_test.cc; per-rule tests under
compiler/analyzer/*_test.cc). Each case here ports a representative
one: the facade must raise a typed CompilerError whose message names
the offending table/column/function — never a raw py4j traceback.

Every assertion checks BOTH the exception type and that the message
carries the offending identifier (the round-4 review's done-criterion).
The Px* exception types also subclass the legacy Python exception
(KeyError/TypeError/...), asserted at the end, so pre-existing callers
keep working.
"""

import pytest

import pixie_spark.api as px
from pixie_spark.api.errors import (
    CompilerError,
    PxAttributeError,
    PxKeyError,
    PxTypeError,
    PxValueError,
)


@pytest.fixture()
def ctx(spark):
    http = spark.createDataFrame(
        [(1_000, "a", 200, 5.0), (2_000, "b", 500, 7.5)],
        "time_ long, service string, resp_status int, latency double",
    )
    px.set_context(spark, {"http_events": http})
    return http


def df(px_ctx=None):
    return px.DataFrame("http_events")


# --- source errors ----------------------------------------------------------


def test_unknown_table(ctx):
    # memory_source_ir.cc:116 "Table '$0' not found."
    with pytest.raises(PxKeyError, match="Table 'bogus_table' not found"):
        px.DataFrame("bogus_table")


def test_unknown_column_in_select(ctx):
    # analyzer_test.cc:375 "Column 'cpu100' not found in parent dataframe"
    with pytest.raises(PxKeyError, match="Column 'cpu100' not found in parent dataframe"):
        px.DataFrame("http_events", select=["time_", "cpu100"])


# --- column resolution ------------------------------------------------------


def test_unknown_attribute_column(ctx):
    # compiler_test.cc:2630 "dataframe has no method 'bar'"
    with pytest.raises(PxAttributeError, match="dataframe has no method or column 'bar'"):
        _ = df().bar


def test_unknown_column_in_keep_list(ctx):
    # analyzer_test.cc:779 'thiscoldoesnotexist'
    with pytest.raises(PxKeyError, match="Column 'thiscoldoesnotexist' not found"):
        _ = df()[["time_", "thiscoldoesnotexist"]]


def test_unknown_column_in_drop(ctx):
    # Spark drop is silently lenient; the reference errors — we match
    # the reference (analyzer_test.cc:779)
    with pytest.raises(PxKeyError, match="Column 'nope' not found"):
        df().drop(["nope"])


def test_unknown_column_in_groupby(ctx):
    # analyzer_test.cc:405 group-by key resolution
    with pytest.raises(PxKeyError, match="Column 'cpu1' not found"):
        df().groupby("cpu1")


# --- filter errors ----------------------------------------------------------


def test_filter_expression_not_boolean(ctx):
    # compiler_test.cc:672 "Expected Boolean for Filter expression"
    d = df()
    with pytest.raises(PxTypeError, match="Expected Boolean for Filter expression"):
        _ = d[d.latency + 1.0]


def test_filter_unsupported_indexer(ctx):
    # objects/dataframe.cc:301 "subscript argument must have a list of
    # strings or expression. '$0' not allowed"
    with pytest.raises(PxTypeError, match="subscript argument must have a list"):
        _ = df()[42]


# --- agg tuple errors -------------------------------------------------------


def test_agg_value_not_a_tuple(ctx):
    # objects/dataframe.cc:227 "Expected tuple for $0 but received $1"
    with pytest.raises(PxTypeError, match="Expected tuple for outcol1 but received"):
        df().groupby("service").agg(outcol1="latency")


def test_agg_tuple_wrong_arity(ctx):
    # objects/dataframe.cc:189
    with pytest.raises(PxTypeError, match="All elements of the agg tuple must be column names"):
        df().groupby("service").agg(out=("latency",))


def test_agg_tuple_first_element_not_a_name(ctx):
    # objects/dataframe.cc:189 (non-string column slot)
    d = df()
    with pytest.raises(PxTypeError, match="All elements of the agg tuple must be column names"):
        d.groupby("service").agg(out=(d.latency, "px.mean"))


def test_agg_tuple_unknown_column(ctx):
    # analyzer_test.cc:375 wording through the agg path
    with pytest.raises(PxKeyError, match="Column 'cpu9' not found"):
        df().groupby("service").agg(out=("cpu9", "px.mean"))


def test_agg_tuple_unknown_function(ctx):
    # registry_info.cc:121 "Could not find function '$0'."
    with pytest.raises(PxValueError, match="Could not find function 'px.meanbogus'"):
        df().groupby("service").agg(out=("latency", "px.meanbogus"))


def test_agg_tuple_last_element_not_callable(ctx):
    # objects/dataframe.cc:198 "Expected second tuple argument to be type Func"
    with pytest.raises(PxTypeError, match="Expected second tuple argument to be type Func"):
        df().groupby("service").agg(out=("latency", 3))


# --- groupby/display protocol ----------------------------------------------


def test_dangling_groupby_display(ctx):
    # remove_group_by_rule_test.cc:68
    with pytest.raises(PxTypeError, match=r"'groupby\(\)' should be followed by an 'agg\(\)'"):
        px.display(df().groupby("service"), "out")


# --- merge errors -----------------------------------------------------------


def test_merge_bad_how(ctx):
    with pytest.raises(PxValueError, match="'sideways' not a supported merge how"):
        df().merge(df(), how="sideways", left_on="service")


def test_merge_bad_suffixes(ctx):
    # objects/dataframe.cc:170 "'suffixes' must be a list with 2 elements"
    with pytest.raises(PxValueError, match="'suffixes' must be a list with 2 elements"):
        df().merge(df(), left_on="service", suffixes=("_x", "_y", "_z"))


def test_merge_unknown_key(ctx):
    with pytest.raises(PxKeyError, match="Column 'svc_id' not found"):
        df().merge(df(), left_on="svc_id")


# --- script-level errors ----------------------------------------------------


def test_script_syntax_error_is_located(ctx):
    # compiler_test.cc:2431 'import px\npx.DataFrame(' — a syntax error
    # surfaces as a located CompilerError, not a CPython traceback
    with pytest.raises(CompilerError, match="SyntaxError") as ei:
        px.run_script("import px\ndf = px.DataFrame(")
    assert ei.value.line is not None


def test_script_no_runnable_code(ctx):
    # compiler_test.cc:2547 "No runnable code found": compiles, runs,
    # but registers no sink
    with pytest.raises(CompilerError, match="No runnable code found"):
        px.run_script("import px\ndf = px.DataFrame('http_events')")


def test_script_error_names_the_bad_column(ctx):
    # end-to-end: the error a user sees from a verbatim script typo
    # carries the PxL identifier, not a JVM stack
    with pytest.raises(PxAttributeError, match="no method or column 'latencyz'"):
        px.run_script(
            "import px\n"
            "df = px.DataFrame('http_events')\n"
            "df.ms = df.latencyz / 1000000\n"
            "px.display(df, 'out')\n"
        )


# --- legacy exception compatibility -----------------------------------------


def test_px_errors_subclass_legacy_types(ctx):
    assert issubclass(PxKeyError, KeyError)
    assert issubclass(PxTypeError, TypeError)
    assert issubclass(PxValueError, ValueError)
    assert issubclass(PxAttributeError, AttributeError)
    for t in (PxKeyError, PxTypeError, PxValueError, PxAttributeError):
        assert issubclass(t, CompilerError)
    # KeyError's repr-quoting must not mangle the message
    assert str(PxKeyError("Table 'x' not found.")) == "Table 'x' not found."


def test_head_non_int_argument(ctx):
    # dataframe.cc head() arg typecheck: must be a PxL error naming the
    # offending value, never a raw py4j Method-does-not-exist trace
    with pytest.raises(PxTypeError, match="'head' expects an integer 'n', got str 'ten'"):
        px.DataFrame("http_events").head("ten")


def test_display_non_dataframe(ctx):
    with pytest.raises(PxTypeError, match="'display' expects a DataFrame, got int 42"):
        px.display(42)


def test_debug_non_dataframe_does_not_pollute_results(ctx):
    # round-5 ADVICE: debug() used to register the argument into
    # results() BEFORE the type check (so an invalid object satisfied
    # the 'No runnable code found' sink check) and misnamed itself
    # 'display' in the error
    with pytest.raises(PxTypeError, match="'debug' expects a DataFrame, got int 42"):
        px.debug(42)
    assert "_debug" not in px.results()


def test_bad_duration_string_is_a_value_error(ctx):
    # time parse errors (compile-time fns): '-5q' is not a duration
    with pytest.raises(ValueError, match="bad duration '-5q'"):
        px.run_script(
            "import px\ndf = px.DataFrame('http_events', start_time='-5q')\npx.display(df)"
        )
