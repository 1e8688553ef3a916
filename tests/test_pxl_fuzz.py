"""Property-based fuzz harness for the PxL facade (round-5 review #8).

The 96 registry queries and 25 fixed error cases pin KNOWN shapes; this
is the generative complement: a seeded generator emits random small PxL
scripts (projection → filters/assignments in random order → optional
groupby-aggregate) TOGETHER with the equivalent DuckDB SQL derived from
the same AST, runs the script through the real px.run_script facade,
and cross-checks the results through the SAME comparator the driver
gate uses (tools/check_oracle.compare_frames: columns, dtype kinds,
order-insensitive normalized values).

Domain discipline keeps every variant exactly comparable:
- arithmetic only over int64 columns (exact in both engines; no
  float-fold order sensitivity),
- float columns appear only in comparisons against literals (same
  parquet doubles on both sides),
- sums cast to BIGINT on the DuckDB side (sum(BIGINT) is HUGEINT),
- no head()/limit (order-dependent by definition).

200 variants, fixed seed — failures reproduce byte-for-byte and the
assert message carries the full script + SQL.
"""

import random

import pixie_spark.api as px
import pytest
from pixie_spark.sources import load_table
from tools.check_oracle import compare_frames, oracle_connection

SF_DIR = "/root/testdata/sf0.001"
N_VARIANTS = 200

INT_COLS = ["event_id", "user_id"]
FLOAT_COLS = ["value"]
STR_COLS = ["event_type"]
BASE_COLS = INT_COLS + FLOAT_COLS + STR_COLS
EVENT_TYPES = ["click", "error", "purchase", "signup", "view", "no_such_type"]

# (px fn name, sql template, needs int input)
AGG_FNS = [
    ("px.count", "CAST(count({c}) AS BIGINT)"),
    ("px.sum", "CAST(sum({c}) AS BIGINT)"),
    ("px.min", "min({c})"),
    ("px.max", "max({c})"),
    ("px.mean", "avg({c})"),
]


@pytest.fixture(scope="module")
def fuzz_ctx(spark):
    ev = load_table(spark, SF_DIR, "events").select(*BASE_COLS)
    px.set_context(spark, tables={"events": ev})
    con = oracle_connection(SF_DIR)
    yield con
    con.close()


class _Gen:
    """One random script+SQL pair from a shared op sequence."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.int_cols = list(INT_COLS)  # grows with derived columns
        self.str_cols = list(STR_COLS)
        self.lines = ["import px", "df = px.DataFrame('events')"]
        self.ctes = [
            f"q0 AS (SELECT {', '.join(BASE_COLS)} FROM events)"
        ]
        self.step = 0

    def _next_cte(self, select_sql: str) -> None:
        prev = f"q{self.step}"
        self.step += 1
        self.ctes.append(f"q{self.step} AS (SELECT {select_sql} FROM {prev})")

    def _predicate(self) -> tuple[str, str]:
        r = self.rng
        kind = r.choice(["int", "int", "float", "str", "contains"])
        if kind == "int":
            c = r.choice(self.int_cols)
            op = r.choice([">", ">=", "<", "<=", "==", "!="])
            lit = r.randint(0, 1200)
            return f"(df['{c}'] {op} {lit})", f"({c} {'=' if op == '==' else op} {lit})"
        if kind == "float":
            c = r.choice(FLOAT_COLS)
            op = r.choice([">", "<", ">=", "<="])
            lit = round(r.uniform(0.0, 350.0), 2)
            return f"(df['{c}'] {op} {lit})", f"({c} {op} {lit})"
        if kind == "contains":
            c = r.choice(self.str_cols)
            sub = r.choice(["e", "a", "ck", "or", "x", "UP"])
            return (
                f"(px.contains(df['{c}'], '{sub}'))",
                f"contains({c}, '{sub}')",
            )
        c = r.choice(STR_COLS)
        op = r.choice(["==", "!="])
        lit = r.choice(EVENT_TYPES)
        return (
            f"(df['{c}'] {op} '{lit}')",
            f"({c} {'=' if op == '==' else '<>'} '{lit}')",
        )

    def add_filter(self) -> None:
        p_px, p_sql = self._predicate()
        if self.rng.random() < 0.3:
            q_px, q_sql = self._predicate()
            conj = self.rng.choice(["&", "|"])
            p_px = f"({p_px} {conj} {q_px})"
            p_sql = f"({p_sql} {'AND' if conj == '&' else 'OR'} {q_sql})"
        self.lines.append(f"df = df[{p_px}]")
        prev = f"q{self.step}"
        self.step += 1
        self.ctes.append(
            f"q{self.step} AS (SELECT * FROM {prev} WHERE {p_sql})"
        )

    def add_assign(self) -> None:
        r = self.rng
        a = r.choice(self.int_cols)
        op = r.choice(["+", "-", "*", "%"])
        if op != "%" and r.random() < 0.5:
            b = r.choice(self.int_cols)
            rhs_px, rhs_sql = f"df['{a}'] {op} df['{b}']", f"{a} {op} {b}"
        else:
            # % gets a positive literal; Spark and DuckDB both use
            # C-style sign-of-dividend semantics so negatives are safe
            lit = r.randint(2, 7) if op == "%" else r.randint(1, 7)
            rhs_px, rhs_sql = f"df['{a}'] {op} {lit}", f"{a} {op} {lit}"
        name = f"v{self.step}"
        self.lines.append(f"df['{name}'] = {rhs_px}")
        self._next_cte(f"*, CAST({rhs_sql} AS BIGINT) AS {name}")
        self.int_cols.append(name)

    def add_str_assign(self) -> None:
        """Derived columns through the px string-function family
        (functions/string_ops.py): case mapping and substring yield new
        string columns (usable by later contains predicates), length
        and 0-based find yield new int columns (usable by later
        arithmetic / group keys)."""
        r = self.rng
        c = r.choice(self.str_cols)
        name = f"s{self.step}"
        kind = r.choice(["upper", "lower", "substr", "length", "find"])
        if kind in ("upper", "lower"):
            fn = "toupper" if kind == "upper" else "tolower"
            self.lines.append(f"df['{name}'] = px.{fn}(df['{c}'])")
            self._next_cte(f"*, {'upper' if kind == 'upper' else 'lower'}({c}) AS {name}")
            self.str_cols.append(name)
        elif kind == "substr":
            a, n = r.randint(0, 2), r.randint(1, 4)
            self.lines.append(f"df['{name}'] = px.substring(df['{c}'], {a}, {n})")
            self._next_cte(f"*, substring({c}, {a + 1}, {n}) AS {name}")
            self.str_cols.append(name)
        elif kind == "length":
            self.lines.append(f"df['{name}'] = px.length(df['{c}'])")
            self._next_cte(f"*, length({c}) AS {name}")
            self.int_cols.append(name)
        else:  # find: 0-based index, -1 if absent (C++ string::find)
            sub = r.choice(["e", "a", "ck", "or"])
            self.lines.append(f"df['{name}'] = px.find(df['{c}'], '{sub}')")
            self._next_cte(f"*, CAST(strpos({c}, '{sub}') - 1 AS BIGINT) AS {name}")
            self.int_cols.append(name)

    def add_merge(self) -> None:
        """Self-aggregate merge: an aggregate built over a FILTERED copy
        of the current frame joined back on event_type. The filter makes
        some keys vanish from the right side, so how='left' genuinely
        produces null merge columns (and 'inner' genuinely drops rows)."""
        r = self.rng
        how = r.choice(["inner", "left"])
        thresh = r.randint(0, 12)
        c = r.choice(self.int_cols)
        m = f"m{self.step}"
        self.lines.append(f"sub = df[(df['user_id'] > {thresh})]")
        self.lines.append(
            f"agg = sub.groupby('event_type').agg({m}=('{c}', 'px.sum'))"
        )
        self.lines.append(
            f"df = df.merge(agg, how='{how}', left_on='event_type', "
            f"right_on='event_type', suffixes=('', '_r'))"
        )
        prev = f"q{self.step}"
        self.step += 1
        jt = "JOIN" if how == "inner" else "LEFT JOIN"
        self.ctes.append(
            f"q{self.step} AS (SELECT l.*, r.event_type AS event_type_r, r.{m} "
            f"FROM {prev} l {jt} (SELECT event_type, CAST(sum({c}) AS BIGINT) "
            f"AS {m} FROM {prev} WHERE user_id > {thresh} GROUP BY event_type) r "
            f"ON l.event_type = r.event_type)"
        )
        self.int_cols.append(m)

    def finish(self) -> tuple[str, str]:
        r = self.rng
        if r.random() < 0.5:
            # groupby-aggregate tail: none, one string key, or a
            # composite (string, derived-int) key
            by = r.choice([None, "event_type", "multi"])
            n_aggs = r.randint(1, 3)
            specs, sqls = [], []
            for i in range(n_aggs):
                fn, sql_t = r.choice(AGG_FNS)
                c = r.choice(self.int_cols)
                specs.append(f"a{i}=('{c}', '{fn}')")
                sqls.append(sql_t.format(c=c) + f" AS a{i}")
            if by is None:
                self.lines.append(f"df = df.agg({', '.join(specs)})")
                self._next_cte(", ".join(sqls))
            else:
                if by == "multi":
                    k2 = r.choice(self.int_cols)
                    by_px = f"['event_type', '{k2}']"
                    by_sql = f"event_type, {k2}"
                else:
                    by_px, by_sql = f"'{by}'", by
                self.lines.append(
                    f"df = df.groupby({by_px}).agg({', '.join(specs)})"
                )
                prev = f"q{self.step}"
                self.step += 1
                self.ctes.append(
                    f"q{self.step} AS (SELECT {by_sql}, {', '.join(sqls)} "
                    f"FROM {prev} GROUP BY {by_sql})"
                )
        self.lines.append("px.display(df, 'out')")
        sql = "WITH " + ",\n".join(self.ctes) + f"\nSELECT * FROM q{self.step}"
        return "\n".join(self.lines), sql


def _variant(rng: random.Random) -> tuple[str, str]:
    g = _Gen(rng)
    merged = False
    for _ in range(rng.randint(1, 4)):
        roll = rng.random()
        if roll < 0.4:
            g.add_filter()
        elif roll < 0.65:
            g.add_assign()
        elif roll < 0.85:
            g.add_str_assign()
        elif not merged:
            g.add_merge()
            merged = True
        else:
            g.add_assign()
    return g.finish()


def test_pxl_facade_fuzz_200_variants(spark, fuzz_ctx):
    rng = random.Random(2026)
    failures = []
    zero_rows = n_merges = n_multi = n_strfn = 0
    for i in range(N_VARIANTS):
        script, sql = _variant(rng)
        n_merges += ".merge(" in script
        n_multi += ".groupby(['" in script
        n_strfn += any(
            f"px.{fn}(" in script
            for fn in ("toupper", "tolower", "length", "find", "substring")
        )
        sdf = px.run_script(script)["out"].toPandas()
        odf = fuzz_ctx.execute(sql).fetchdf()
        if len(sdf) == 0 and len(odf) == 0:
            # empty frames lose dtype fidelity through toPandas/fetchdf;
            # the contract that remains checkable is the column set
            zero_rows += 1
            if sorted(sdf.columns) != sorted(odf.columns):
                failures.append((i, script, sql, "empty-frame column mismatch"))
            continue
        problems = compare_frames(sdf, odf)
        if problems:
            failures.append((i, script, sql, "; ".join(problems)))
    assert not failures, "\n\n".join(
        f"variant {i}:\n--- script ---\n{s}\n--- sql ---\n{q}\n--- {p}"
        for i, s, q, p in failures[:3]
    ) + f"\n({len(failures)} of {N_VARIANTS} variants failed)"
    # the generator must actually exercise non-trivial shapes: most
    # variants return rows (an all-empty sweep would vacuously pass),
    # and the merge / composite-groupby paths genuinely fire
    assert zero_rows < N_VARIANTS * 0.5, f"{zero_rows} empty variants"
    assert n_merges >= 10, f"only {n_merges} merge variants generated"
    assert n_multi >= 5, f"only {n_multi} composite-groupby variants"
    assert n_strfn >= 20, f"only {n_strfn} string-function variants"


def test_pxl_facade_fuzz_streaming_duality(spark, fuzz_ctx, tmp_path):
    """Generative stream≡batch: a sample of random facade scripts run
    TWICE — batch over the events table, then through
    StreamingScriptRun with events arriving as a 4-chunk file stream —
    and the final streaming refresh must equal the batch rows exactly.
    The fixed-script streaming tier pins 62 corpus scripts; this is its
    generative complement over the same machinery."""
    from pixie_spark.sources import load_table
    from pixie_spark.streaming.script_stream import StreamingScriptRun

    ev = load_table(spark, SF_DIR, "events").select(*BASE_COLS)
    rng = random.Random(77)
    n_checked = 0
    failures = []
    for i in range(40):
        script, _ = _variant(rng)
        px.set_context(spark, tables={"events": ev})
        batch_rows = sorted(
            map(str, px.run_script(script)["out"].collect())
        )
        if not batch_rows:
            continue  # empty batch result: nothing to pin
        if n_checked >= 12:
            break
        run = StreamingScriptRun(
            spark, script,
            stream_tables={"events": ev}, static_tables={},
            work_dir=str(tmp_path / f"fz{i}"),
            time_col="event_id",  # chunk arrival keyed on the pk
        )
        try:
            run.await_drained()
        finally:
            run.stop()
        got = sorted(map(str, run.results["out"]))
        if got != batch_rows:
            failures.append((i, script, len(got), len(batch_rows)))
        n_checked += 1
    px.set_context(spark, tables={"events": ev})
    assert not failures, "\n\n".join(
        f"variant {i} ({ng} vs {nb} rows):\n{s}" for i, s, ng, nb in failures[:3]
    )
    assert n_checked >= 12, f"only {n_checked} non-empty streaming variants"
