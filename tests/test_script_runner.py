"""Cron script runner semantics (ref: src/vizier/services/query_broker/
script_runner/script_runner.go): ticker scheduling, the 1 s-overlap
plugin window, upsert/delete from sources, error recording, and the
GetCronScriptHistory feed."""

import pytest
from pyspark.sql import functions as F

import pixie_spark.api as px
from pixie_spark.streaming.script_runner import (
    CronScript,
    ScriptDirSource,
    ScriptRunner,
    StaticSource,
    SECOND_NS,
)

T0 = 1_704_067_200_000_000_000  # 2024-01-01 UTC, ns

SCRIPT = """
import px
df = px.DataFrame('ticks', start_time=px.plugin.start_time, end_time=px.plugin.end_time)
px.display(df, 'out')
"""


@pytest.fixture()
def ctx(spark):
    rows = [(T0 + i * SECOND_NS, i) for i in range(0, 120)]
    df = spark.createDataFrame(rows, "time_ long, v long")
    px.set_context(spark, tables={"ticks": df})
    yield
    px.set_plugin_window(None)
    px.set_now(None)


def test_ticker_first_fire_one_period_after_registration(ctx):
    r = ScriptRunner()
    r.upsert(CronScript("s1", SCRIPT, frequency_s=10), now_ns=T0)
    assert r.due(T0) == []
    assert r.due(T0 + 9 * SECOND_NS) == []
    assert [s.script_id for s in r.due(T0 + 10 * SECOND_NS)] == ["s1"]


def test_plugin_window_has_one_second_overlap(ctx):
    """Window = [last_run - 1s, last_run - 1s + period] (go:266-269)."""
    r = ScriptRunner()
    r.upsert(CronScript("s1", SCRIPT, frequency_s=10), now_ns=T0)
    [rec] = r.tick(T0 + 10 * SECOND_NS)
    assert rec.success
    assert rec.window_start_ns == T0 - SECOND_NS
    assert rec.window_end_ns == T0 - SECOND_NS + 10 * SECOND_NS
    # rows with T0 <= time_ < T0+9s  (start clamps to the table's first row)
    assert rec.result_rows == {"out": 9}

    # second fire: window slides from the new last_run
    [rec2] = r.tick(T0 + 20 * SECOND_NS)
    assert rec2.window_start_ns == T0 + 10 * SECOND_NS - SECOND_NS
    assert rec2.result_rows == {"out": 10}


def test_plugin_outside_context_errors(ctx):
    px.set_plugin_window(None)
    with pytest.raises(RuntimeError, match="No plugin config found"):
        _ = px.plugin.start_time


def test_error_recorded_and_runner_continues(ctx):
    r = ScriptRunner()
    r.upsert(CronScript("bad", "import px\nnope_this_breaks(", frequency_s=5), now_ns=T0)
    r.upsert(CronScript("good", SCRIPT, frequency_s=5), now_ns=T0)
    recs = r.tick(T0 + 5 * SECOND_NS)
    by_id = {x.script_id: x for x in recs}
    assert not by_id["bad"].success and by_id["bad"].error
    assert by_id["good"].success
    # the failed script stays scheduled (reference keeps the ticker alive)
    assert {s.script_id for s in r.due(T0 + 10 * SECOND_NS)} == {"bad", "good"}


def test_static_source_upsert_delete(ctx):
    src = StaticSource([CronScript("a", SCRIPT, frequency_s=5)])
    r = ScriptRunner(sources=[src])
    r.sync(now_ns=T0)
    assert r.tick(T0 + 5 * SECOND_NS)[0].script_id == "a"

    src.push_delete("a")
    src.push_upsert(CronScript("b", SCRIPT, frequency_s=5))
    recs = r.tick(T0 + 10 * SECOND_NS)
    # 'a' deleted before scheduling; 'b' registered at this tick fires next period
    assert recs == []
    assert [x.script_id for x in r.tick(T0 + 15 * SECOND_NS)] == ["b"]


def test_dir_source_diffs(tmp_path, ctx):
    d = tmp_path / "scripts"
    d.mkdir()
    (d / "one.pxl").write_text("# cron: 30\n" + SCRIPT)
    src = ScriptDirSource(str(d))
    init = src.initial()
    assert init["one"].frequency_s == 30

    (d / "two.pxl").write_text(SCRIPT)  # default frequency
    (d / "one.pxl").write_text("# cron: 60\n" + SCRIPT)  # changed schedule
    ups = dict()
    dels = []
    for kind, payload in src.poll():
        if kind == "upsert":
            ups[payload.script_id] = payload
        else:
            dels.append(payload)
    assert set(ups) == {"one", "two"}
    assert ups["one"].frequency_s == 60
    assert ups["two"].frequency_s == 60 and dels == []

    (d / "two.pxl").unlink()
    assert src.poll() == [("delete", "two")]


def test_on_result_and_history_feed(spark, ctx):
    got = []
    r = ScriptRunner(on_result=lambda s, out, rec: got.append((s.script_id, sorted(out))))
    r.upsert(CronScript("s1", SCRIPT, frequency_s=10), now_ns=T0)
    r.tick(T0 + 10 * SECOND_NS)
    assert got == [("s1", ["out"])]
    # run_script feeds the cron-script store analogue read by the UDTF
    hist = px.GetCronScriptHistory().to_spark()
    assert hist.where(F.col("error_message") == "").count() >= 1


def test_now_pinned_to_tick_and_restored(ctx):
    px.set_now(123)
    r = ScriptRunner()
    r.upsert(CronScript("s1", SCRIPT, frequency_s=10), now_ns=T0)
    r.tick(T0 + 10 * SECOND_NS)
    assert px.now() == 123  # restored after the run
    px.set_now(None)
