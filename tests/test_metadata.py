"""K8s metadata layer: ctx[...] resolution via broadcast joins against
the FIXTURES.md dimension tables, incl. the orphan-upid fallback path."""

import pytest
from pyspark.sql import functions as F

import pixie_spark.api as px
from pixie_spark.functions.metadata import MetadataResolver
from pixie_spark.plans import assert_broadcast_join
from pixie_spark.sources.fixtures import http_events_fixture, k8s_fixtures


@pytest.fixture(scope="module")
def fixtures(spark):
    pods, services = k8s_fixtures(spark)
    events = http_events_fixture(spark, n=500)
    return pods, services, events


def test_resolver_pod_and_service(spark, fixtures):
    pods, services, events = fixtures
    r = MetadataResolver(pods, services)
    out = r.resolve_upid(events, ["pod_name", "service_name", "namespace"])
    rows = out.select("pod_name", "service_name", "namespace").where(
        F.col("pod_name").isNotNull()
    )
    assert rows.count() > 400  # ~97% resolve (3% orphans)
    sample = rows.first()
    assert "/" in sample["pod_name"] and "/" in sample["service_name"]


def test_orphan_upids_stay_null(spark, fixtures):
    """1-5% of upids are deliberately absent from k8s_pods (FIXTURES §8) —
    the left join must keep those rows with null metadata, mirroring
    metadata_ops.cc:48's fallback behavior."""
    pods, services, events = fixtures
    r = MetadataResolver(pods, services)
    out = r.upid_to_pod_name(events)
    n_orphan = out.where(F.col("pod_name").isNull()).count()
    assert 0 < n_orphan < events.count() * 0.1
    assert out.count() == events.count()  # left join never drops rows


def test_metadata_join_is_broadcast(spark, fixtures):
    pods, services, events = fixtures
    r = MetadataResolver(pods, services)
    out = r.resolve_upid(events, ["pod_name"])
    assert_broadcast_join(out.to_spark() if hasattr(out, "to_spark") else out, 1)


def test_ctx_accessor_through_api(spark, fixtures):
    """df.svc = df.ctx['service_name'] — the PxL surface
    (dataframe.h:422 → convert_metadata_rule.cc)."""
    pods, services, events = fixtures
    px.set_context(
        spark, tables={"http_events": events}, metadata=MetadataResolver(pods, services)
    )
    df = px.DataFrame("http_events")
    df.svc = df.ctx["service_name"]
    df.pod = df.ctx["pod_name"]
    out = df[["svc", "pod"]]
    got = out.to_spark().where(F.col("svc").isNotNull())
    assert got.count() > 400


def test_ip_to_pod_id(spark, fixtures):
    pods, services, _ = fixtures
    r = MetadataResolver(pods, services)
    df = spark.createDataFrame([("10.0.0.1",), ("203.0.113.9",)], ["pod_ip"])
    rows = {r2["pod_ip"]: r2["pod_id"] for r2 in r.ip_to_pod_id(df, "pod_ip").collect()}
    assert rows["10.0.0.1"] is not None and rows["203.0.113.9"] is None


def test_flagship_http_request_stats(spark, fixtures):
    """The flagship PxL script re-expressed (BASELINE.md workload corpus:
    src/pxl_scripts/px/http_request_stats/stats.pxl — scan → map/bin →
    groupby+agg(quantiles/count) → metadata join → filter)."""
    pods, services, events = fixtures
    px.set_context(
        spark, tables={"http_events": events}, metadata=MetadataResolver(pods, services)
    )
    df = px.DataFrame("http_events", start_time=0)
    df.svc = df.ctx["service_name"]
    df.failure = df.resp_status >= 400
    df = df.rolling("10s")
    stats = df.groupby(["svc"]).agg(
        throughput=("latency", "px.count"),
        error_count=("failure", lambda c: F.sum(c.cast("long"))),
        latency_quantiles=("latency", "px.quantiles"),
    )
    out = px.display(stats, "http_stats")
    rows = out.collect()
    assert len(rows) > 10
    cols = set(out.columns)
    assert {"time_", "svc", "throughput", "error_count", "latency_quantiles"} <= cols
    total = sum(r["throughput"] for r in rows)
    assert total == 500
    any_q = next(r["latency_quantiles"] for r in rows if r["latency_quantiles"] is not None)
    assert any_q["p50"] is not None and any_q["p99"] >= any_q["p50"]


def test_flagship_service_flow_graph(spark, fixtures):
    """Service-graph script re-expressed (ref workload corpus:
    src/pxl_scripts/px/{net_flow_graph,dns_flow_graph}/ — resolve both
    endpoints to services, aggregate edges). Server side via upid ctx,
    client side via ip→pod→service broadcast lookups."""
    pods, services, events = fixtures
    r = MetadataResolver(pods, services)

    server = r.resolve_upid(events, ["service_name"]).withColumnRenamed(
        "service_name", "server_svc"
    )
    with_client_pod = r.ip_to_pod_id(server, "remote_addr")
    svc_dim = F.broadcast(
        pods.select("pod_id", "service_id").join(
            services.select("service_id", F.col("service_name").alias("client_svc")),
            "service_id",
        ).select("pod_id", "client_svc")
    )
    edges_src = with_client_pod.join(svc_dim, "pod_id", "left")
    edges = (
        edges_src.where(F.col("server_svc").isNotNull() & F.col("client_svc").isNotNull())
        .groupBy("client_svc", "server_svc")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum((F.col("resp_status") >= 400).cast("long")).alias("n_errors"),
            F.percentile_approx("latency", 0.99).alias("latency_p99"),
        )
    )
    rows = edges.collect()
    assert rows, "expected resolvable service->service edges"
    assert sum(r2["n_requests"] for r2 in rows) > 300  # 90% internal x 97% known upids
    names = {r2["client_svc"] for r2 in rows} | {r2["server_svc"] for r2 in rows}
    assert all("/" in n for n in names)
    from pixie_spark.plans import assert_no_cartesian
    assert_no_cartesian(edges)


def test_pod_and_service_id_accessors(spark, fixtures):
    """pod_id_to_* / service_id_to_* accessor families
    (metadata_ops.cc:35-139) as chained broadcast hops."""
    pods, services, _ = fixtures
    r = MetadataResolver(pods, services)
    df = spark.createDataFrame([("pod-id-0000",), ("pod-id-bogus",)], ["pod_id"])
    out = {x["pod_id"]: x["service_name"] for x in r.pod_id_to_service_name(df).collect()}
    assert out["pod-id-0000"] is not None and "/" in out["pod-id-0000"]
    assert out["pod-id-bogus"] is None
    named = r.pod_id_to(df, ["pod_name", "namespace"])
    row = named.where(F.col("pod_id") == "pod-id-0000").first()
    assert row["pod_name"].startswith(row["namespace"] + "/")
