"""STREAMING-mode execution of flagship corpus scripts — the round-3
verdict's #2 ask: the same verbatim script must produce the batch golden
values when its source arrives as a stream (the reference's
``df.stream()`` duality, stream_ir.h:44 / dataframe.h:404-419).

Two execution tiers are covered:

- multi-aggregate DAG scripts (http_request_stats, dns_flow_graph,
  most_http_data) through StreamingScriptRun: Structured-Streaming
  ingestion into a ring-buffer snapshot + per-micro-batch script
  refresh; final refresh must EQUAL the batch golden values.
- a true one-pipeline script (readStream source → ctx join → rolling
  window agg → px.display stream + px.export OTel sink) where every
  stage is a single incremental Structured Streaming query.
"""

import json
import os

import pytest
from pytest import approx

import pixie_spark.api as px
from pixie_spark.sources.fixtures import BASE_NS, HOUR_NS, observability_context
from pixie_spark.streaming.script_stream import StreamingScriptRun

REF = "/root/reference/src/pxl_scripts/px"
PXVIEWS = "/root/reference/src/carnot/planner/pxl_lib/pxviews.pxl"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus checkout not present"
)


def _read(rel: str) -> str:
    with open(os.path.join(REF, rel)) as f:
        return f.read()


def _read_pxviews() -> str:
    text = open(PXVIEWS).read()
    return text[text.index('R"(') + 3 : text.rindex(')"')]


@pytest.fixture(scope="module")
def ctx(spark):
    tables, resolver = observability_context(spark)
    px.set_context(spark, tables=tables, metadata=resolver)
    px.register_module("pxviews", _read_pxviews())
    px.set_now(BASE_NS + HOUR_NS)
    yield tables
    px.set_now(None)


def _stream_run(spark, tables, script, streamed, work_dir, calls=None, chunks=4):
    stream_tables = {n: tables[n] for n in streamed}
    static_tables = {n: df for n, df in tables.items() if n not in streamed}
    run = StreamingScriptRun(
        spark,
        script,
        stream_tables=stream_tables,
        static_tables=static_tables,
        work_dir=work_dir,
        calls=calls,
        chunks=chunks,
    )
    try:
        return run.await_drained()
    finally:
        run.stop()
        # restore the batch tables for subsequent tests
        for n, df in tables.items():
            px.register_table(n, df)


def _dicts(rows, *sort_cols):
    ds = [r.asDict() for r in rows]
    return sorted(ds, key=lambda d: tuple(d[c] for c in sort_cols))


def test_http_request_stats_streamed_equals_golden(spark, ctx, tmp_path):
    """Per-service p50/p90/p99/error-rate/totals from a STREAMED
    http_events feed must equal the batch golden values pinned in
    test_pxl_golden.py — and the script must have refreshed continuously
    (once per micro-batch), not once at the end."""
    px.set_now(BASE_NS + 30 * 1_000_000_000)
    try:
        run = _stream_run(
            spark, ctx, _read("http_request_stats/stats.pxl"),
            streamed=["http_events"], work_dir=str(tmp_path / "hrs"),
        )
    finally:
        px.set_now(BASE_NS + HOUR_NS)
    assert run.refresh_count >= 3, "expected a refresh per micro-batch"
    rows = _dicts(run.results["output"], "service")
    assert [r["service"] for r in rows] == ["prod/api", "prod/frontend", "staging/db"]
    got = {
        r["service"]: (
            r["latency(p50)"], r["latency(p90)"], r["latency(p99)"],
            r["errors"], r["throughput total"],
        )
        for r in rows
    }
    assert got["prod/api"] == (
        1954305, 8444043, 24733519, approx(0.06722689075630252, rel=1e-9), 595,
    )
    assert got["prod/frontend"] == (
        2189487, 10556760, 24848896, approx(0.06177606177606178, rel=1e-9), 777,
    )
    assert got["staging/db"] == (
        1886023, 9279300, 36789297, approx(0.060176991150442475, rel=1e-9), 565,
    )


def test_dns_flow_graph_streamed_equals_golden(spark, ctx, tmp_path):
    """Flow-graph script (function entry point, ctx joins, nslookup)
    over a streamed dns_events feed — all 10 edges with exact counts."""
    run = _stream_run(
        spark, ctx, _read("dns_flow_graph/dns_flow_graph.pxl"),
        streamed=["dns_events"], work_dir=str(tmp_path / "dns"),
        calls=[("dns_flow_graph", {"start_time": "-1h", "from_entity_filter": "",
                                   "to_entity_filter": ""})],
    )
    assert run.refresh_count >= 3
    rows = _dicts(run.results["dns_flow_graph"], "from_entity")
    expected = [
        ("prod/api-0001", 28, 1740337, 541262.5714285715),
        ("prod/api-0004", 31, 6198564, 759602.3548387097),
        ("prod/api-0007", 34, 3046706, 790225.9117647059),
        ("prod/frontend-0000", 20, 3208470, 819781.15),
        ("prod/frontend-0003", 27, 4531309, 719006.9629629629),
        ("prod/frontend-0006", 28, 2619665, 852506.4642857143),
        ("prod/frontend-0009", 28, 2014475, 652506.2857142857),
        ("staging/db-0002", 39, 2323244, 616739.2307692308),
        ("staging/db-0005", 28, 2417717, 583329.5714285715),
        ("staging/db-0008", 37, 4961523, 852199.3243243244),
    ]
    assert len(rows) == len(expected)
    for r, (ent, cnt, lmax, lavg) in zip(rows, expected):
        assert r["from_entity"] == ent
        assert r["to_entity"] == "10.32.0.10"
        assert r["count"] == cnt
        assert r["latency_max"] == lmax
        assert r["latency_avg"] == approx(lavg, rel=1e-9)


def test_most_http_data_streamed_equals_golden(spark, ctx, tmp_path):
    run = _stream_run(
        spark, ctx, _read("most_http_data/data.pxl"),
        streamed=["http_events"], work_dir=str(tmp_path / "mhd"),
    )
    rows = _dicts(run.results["max_path_pod"], "pod")
    assert rows == [
        {"pod": "prod/api-0004", "req_path": "/api/v1/inventory", "resp_bytes_sum": 63708}
    ]


ONE_PIPELINE_SCRIPT = """
import px
df = px.DataFrame(table='http_events')
df.service = df.ctx['service']
df = df.stream()
df = df.rolling('5s')
per_w = df.groupby(['service', 'time_']).agg(
    throughput=('latency', px.count),
    mean_latency=('latency', px.mean),
)
px.display(per_w, 'service_windows')
px.export(per_w, px.otel.Data(
    resource={'service.name': 'pixie-spark'},
    data=[px.otel.metric.Gauge(name='http.throughput', value=per_w.throughput,
                               attributes={'service': per_w.service})],
    endpoint=px.otel.Endpoint(url='OTEL_DIR'),
))
"""


def test_one_pipeline_stream_rolling_otel(spark, ctx, tmp_path):
    """A VERBATIM script executed as ONE incremental pipeline: streaming
    http_events source → ctx broadcast join → rolling 5s window →
    grouped agg → px.display memory stream AND px.export OTel sink, all
    Structured Streaming. Final windows must equal the batch run of the
    SAME script, and the OTel JSONL gauges must carry the same values."""
    import pixie_spark.api as pxm

    otel_dir = str(tmp_path / "otel")
    script = ONE_PIPELINE_SCRIPT.replace("OTEL_DIR", otel_dir)

    # batch reference: same script, batch table (stream flag is a no-op
    # on a batch frame; export writes batch JSONL to a separate dir)
    batch_script = ONE_PIPELINE_SCRIPT.replace("OTEL_DIR", str(tmp_path / "otel_batch"))
    batch_out = px.run_script(batch_script)
    expected = {
        (r["service"], r["time_"]): (r["throughput"], r["mean_latency"])
        for r in batch_out["service_windows"].collect()
    }
    assert expected, "batch reference must not be empty"

    # streamed source: the fixture laid out as ordered chunks
    src = str(tmp_path / "src")
    base = ctx["http_events"]
    base.repartitionByRange(4, "time_").sortWithinPartitions("time_").write.mode(
        "overwrite"
    ).parquet(src)
    stream_df = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    px.register_table("http_events", stream_df)
    try:
        px.run_script(script)
        queries = list(pxm.streams().values())
        assert len(queries) >= 2, "display stream + otel export stream"
        for q in queries:
            q.processAllAvailable()
        rows = spark.table("service_windows").collect()
        got = {
            (r["service"], r["time_"]): (r["throughput"], r["mean_latency"])
            for r in rows
        }
        assert set(got) == set(expected)
        for k, (n, m) in expected.items():
            assert got[k][0] == n
            assert got[k][1] == approx(m, rel=1e-9)
        # OTel sink: latest gauge per (service, window) equals throughput
        final = {}
        for fname in sorted(os.listdir(otel_dir)):
            with open(os.path.join(otel_dir, fname)) as f:
                for line in f:
                    p = json.loads(line)
                    for rm in p.get("resourceMetrics", []):
                        for sm in rm.get("scopeMetrics", []):
                            for metric in sm.get("metrics", []):
                                if metric["name"] != "http.throughput":
                                    continue
                                for dp in metric["gauge"]["dataPoints"]:
                                    svc = next(
                                        a["value"]["stringValue"]
                                        for a in dp["attributes"]
                                        if a["key"] == "service"
                                    )
                                    final[(svc, int(dp["timeUnixNano"]))] = dp["asDouble"]
        assert final, "expected exported gauge payloads"
        for (svc, t), (n, _) in expected.items():
            assert final.get((svc, t)) == float(n)
    finally:
        for q in pxm.streams().values():
            try:
                q.stop()
            except Exception:  # noqa: BLE001
                pass
        px.register_table("http_events", base)
