"""px.otel / px.export surface (ref: src/carnot/planner/objects/otel.h,
pixie_module.h:77) and its wiring through the cron script runner —
executor-side JSONL export against a file:// endpoint."""

import json
import os

import pytest

import pixie_spark.api as px
from pixie_spark.streaming.script_runner import CronScript, ScriptRunner, SECOND_NS

T0 = 1_704_067_200_000_000_000

EXPORT_SCRIPT = """
import px
df = px.DataFrame('ticks', start_time=px.plugin.start_time, end_time=px.plugin.end_time)
px.export(df, px.otel.Data(
    resource={'service.name': 'ticker', 'service.instance.id': 'pod-1'},
    data=[px.otel.metric.Gauge(name='tick.value', value=df.v,
                               attributes={'tag': df.tag, 'env': 'test'})],
))
"""


def _read_payloads(d):
    out = []
    for fn in sorted(os.listdir(d)):
        with open(os.path.join(d, fn)) as f:
            out.extend(json.loads(line) for line in f)
    return out


@pytest.fixture()
def ctx(spark):
    rows = [(T0 + i * SECOND_NS, float(i), f"t{i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, "time_ long, v double, tag string")
    px.set_context(spark, tables={"ticks": df})
    yield
    px.set_otel_endpoint(None)
    px.set_plugin_window(None)
    px.set_now(None)


def test_gauge_export_writes_otlp_jsonl(spark, ctx, tmp_path):
    out = str(tmp_path / "otlp")
    df = px.DataFrame("ticks")
    px.export(
        df,
        px.otel.Data(
            resource={"service.name": "ticker"},
            data=[px.otel.metric.Gauge(name="tick.value", value=df.v)],
            endpoint=px.otel.Endpoint(url=f"file://{out}"),
        ),
    )
    payloads = _read_payloads(out)
    pts = [
        dp
        for p in payloads
        for rm in p["resourceMetrics"]
        for sm in rm["scopeMetrics"]
        for m in sm["metrics"]
        for dp in m["gauge"]["dataPoints"]
    ]
    assert len(pts) == 20
    assert {p["asDouble"] for p in pts} == {float(i) for i in range(20)}
    res = payloads[0]["resourceMetrics"][0]["resource"]["attributes"]
    assert {"key": "service.name", "value": {"stringValue": "ticker"}} in res


def test_summary_and_span_containers(spark, ctx, tmp_path):
    out = str(tmp_path / "otlp2")
    sdf = spark.createDataFrame(
        [(T0, 10, 55.5, 1.0, 9.9, T0, T0 + 5 * SECOND_NS, "op-a")],
        "time_ long, n long, total double, p50 double, p99 double, "
        "st long, en long, opname string",
    )
    df = px.from_spark(sdf)
    px.export(
        df,
        px.otel.Data(
            resource={"service.name": "svc"},
            data=[
                px.otel.metric.Summary(
                    name="latency", count=df.n, sum=df.total,
                    quantile_values={0.5: df.p50, 0.99: df.p99},
                ),
                px.otel.trace.Span(
                    name=df.opname, start_time=df.st, end_time=df.en,
                    kind=px.otel.trace.SPAN_KIND_CLIENT,
                ),
            ],
            endpoint=px.otel.Endpoint(url=out),  # bare path works too
        ),
    )
    payloads = _read_payloads(out)
    summaries = [
        dp
        for p in payloads
        if "resourceMetrics" in p
        for rm in p["resourceMetrics"]
        for sm in rm["scopeMetrics"]
        for m in sm["metrics"]
        for dp in m["summary"]["dataPoints"]
    ]
    assert summaries == [
        {
            "timeUnixNano": T0,
            "count": 10,
            "sum": 55.5,
            "quantileValues": [
                {"quantile": 0.5, "value": 1.0},
                {"quantile": 0.99, "value": 9.9},
            ],
            "attributes": [],
        }
    ]
    spans = [
        s
        for p in payloads
        if "resourceSpans" in p
        for rs in p["resourceSpans"]
        for ss in rs["scopeSpans"]
        for s in ss["spans"]
    ]
    assert len(spans) == 1
    assert spans[0]["name"] == "op-a"
    assert spans[0]["kind"] == px.otel.trace.SPAN_KIND_CLIENT
    assert len(spans[0]["traceId"]) == 32 and len(spans[0]["spanId"]) == 16


def test_metric_requires_time_column(spark, ctx, tmp_path):
    sdf = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="time_"):
        px.export(
            px.from_spark(sdf),
            px.otel.Data(
                resource={"service.name": "x"},
                data=[px.otel.metric.Gauge(name="m", value="v")],
                endpoint=px.otel.Endpoint(url=str(tmp_path)),
            ),
        )


def test_resource_requires_service_name(spark, ctx):
    with pytest.raises(ValueError, match="service.name"):
        px.otel.Data(resource={"other": "x"}, data=[])


def test_no_endpoint_errors_outside_plugin_context(spark, ctx):
    df = px.DataFrame("ticks")
    with pytest.raises(ValueError, match="no OTel endpoint"):
        px.export(
            df,
            px.otel.Data(
                resource={"service.name": "x"},
                data=[px.otel.metric.Gauge(name="m", value=df.v)],
            ),
        )


def test_cron_script_exports_through_plugin_endpoint(spark, ctx, tmp_path):
    """End-to-end: cron tick → plugin window + default endpoint from the
    script's config → executor-side JSONL export of the window's rows."""
    out = str(tmp_path / "cron-otlp")
    r = ScriptRunner()
    r.upsert(
        CronScript(
            "exporter",
            EXPORT_SCRIPT,
            frequency_s=10,
            configs={"otel_endpoint": {"url": f"file://{out}"}},
        ),
        now_ns=T0,
    )
    [rec] = r.tick(T0 + 10 * SECOND_NS)
    assert rec.success, rec.error
    payloads = _read_payloads(out)
    pts = [
        dp
        for p in payloads
        for rm in p["resourceMetrics"]
        for sm in rm["scopeMetrics"]
        for m in sm["metrics"]
        for dp in m["gauge"]["dataPoints"]
    ]
    # window [T0-1s, T0+9s) clamps to rows 0..8
    assert {p["asDouble"] for p in pts} == {float(i) for i in range(9)}
    tags = {a["value"]["stringValue"] for p in pts for a in p["attributes"] if a["key"] == "tag"}
    assert tags == {"t0", "t1"}
    # endpoint cleared after the run
    assert px._ctx.get("otel_endpoint") is None


# --- generate_data: the plugin system's auto-export conversion --------------
# (ref: otel_generator.cc:560-662 GenerateOTelScript column rules)


def test_generate_data_column_rules(spark, ctx, tmp_path):
    """Numeric cols → Gauges named table.col; string cols → resource
    attributes; service column → service.name — and the export groups
    payloads per resolved resource."""
    sdf = spark.createDataFrame(
        [
            (T0, "prod/api", 1.5, 10),
            (T0 + SECOND_NS, "prod/frontend", 2.5, 20),
        ],
        "time_ long, service string, latency double, n_requests long",
    )
    data = px.otel.generate_data(px.from_spark(sdf), "http_stats")
    assert {c.name for c in data.data} == {"http_stats.latency", "http_stats.n_requests"}
    out = str(tmp_path / "gen")
    data.endpoint = px.otel.Endpoint(url=out)
    px.export(px.from_spark(sdf), data)
    payloads = _read_payloads(out)
    svc_to_vals = {}
    for p in payloads:
        for rm in p["resourceMetrics"]:
            attrs = {a["key"]: a["value"]["stringValue"] for a in rm["resource"]["attributes"]}
            for sm in rm["scopeMetrics"]:
                for m in sm["metrics"]:
                    for dp in m["gauge"]["dataPoints"]:
                        svc_to_vals.setdefault(attrs["service.name"], set()).add(
                            (m["name"], dp["asDouble"])
                        )
    assert svc_to_vals == {
        "prod/api": {("http_stats.latency", 1.5), ("http_stats.n_requests", 10.0)},
        "prod/frontend": {("http_stats.latency", 2.5), ("http_stats.n_requests", 20.0)},
    }


def test_generate_data_reference_error_cases(spark, ctx):
    no_time = px.from_spark(spark.createDataFrame([("s", 1.0)], "service string, v double"))
    with pytest.raises(ValueError, match="time_ column"):
        px.otel.generate_data(no_time, "t")

    no_service = px.from_spark(spark.createDataFrame([(T0, 1.0)], "time_ long, v double"))
    with pytest.raises(ValueError, match="service column"):
        px.otel.generate_data(no_service, "t")

    no_numeric = px.from_spark(
        spark.createDataFrame([(T0, "s")], "time_ long, service string")
    )
    with pytest.raises(ValueError, match="INT64 or FLOAT64"):
        px.otel.generate_data(no_numeric, "t")

    upid_like = px.from_spark(
        spark.createDataFrame(
            [(T0, "s", (1, 2), 1.0)],
            "time_ long, service string, upid struct<high:long,low:long>, v double",
        )
    )
    with pytest.raises(ValueError, match="UINT128"):
        px.otel.generate_data(upid_like, "t")
