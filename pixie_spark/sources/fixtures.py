"""Deterministic synthetic observability fixtures (FIXTURES.md).

Generates http_events + k8s metadata dimensions with the reference's
conventions: time_ = col 0, long ns, sorted; upid = struct<high,low>;
skewed resp_status (95/4/1), log-normal latency, ~20 req_path templates,
1-5% of upids absent from k8s_pods to exercise left-join fallbacks
(metadata_ops.cc:48 _upid_to_podname_local_addr_fallback).

Seeded → identical across runs; used by the pixie-semantics parity tests
(tests/test_api.py, tests/test_metadata.py).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pixie_spark.schemas import HTTP_EVENTS, K8S_PODS, K8S_SERVICES

BASE_NS = 1_704_067_200_000_000_000  # 2024-01-01 UTC
HOUR_NS = 3_600_000_000_000

_METHODS = ["GET", "GET", "GET", "POST", "PUT", "DELETE"]
_PATH_TEMPLATES = [
    "/api/v1/items/{id}", "/api/v1/items", "/api/v1/users/{id}",
    "/api/v1/users/{id}/orders", "/api/v2/search", "/healthz", "/metrics",
    "/api/v1/cart/{id}", "/api/v1/checkout", "/login", "/logout",
    "/static/app.js", "/api/v1/products/{id}", "/api/v1/products",
    "/api/v2/recommendations/{id}", "/admin/users", "/api/v1/reviews/{id}",
    "/api/v1/inventory", "/ws/notifications", "/api/v3/feature-flags",
]


def _upid(asid: int, pid: int, start_ts: int) -> dict:
    return {"high": (asid << 32) | pid, "low": start_ts}


def k8s_fixtures(spark: SparkSession, n_pods: int = 10, seed: int = 42):
    """(k8s_pods, k8s_services): ~10 pods / 3 services / 2 namespaces /
    3 nodes, with validity windows."""
    rng = np.random.RandomState(seed)
    namespaces = ["prod", "staging"]
    services = [("s-frontend", "frontend"), ("s-api", "api"), ("s-db", "db")]
    nodes = ["node-1", "node-2", "node-3"]
    pods, svc_rows = [], []
    for sid, sname in services:
        ns = namespaces[0] if sname != "db" else namespaces[1]
        svc_rows.append((sid, f"{ns}/{sname}", ns, f"10.96.0.{len(svc_rows)+1}", json.dumps([])))
    for i in range(n_pods):
        sid, sname = services[i % len(services)]
        ns = namespaces[0] if sname != "db" else namespaces[1]
        asid, pid = i % 3 + 1, 1000 + i
        start = BASE_NS - ((i % 48) + 1) * HOUR_NS  # deterministic: join key
        pods.append(
            (
                _upid(asid, pid, start),
                f"pod-id-{i:04d}",
                f"{ns}/{sname}-{i:04d}",
                ns,
                nodes[i % 3],
                f"10.0.{i // 250}.{i % 250 + 1}",
                sid,
                f"rs-{sname}-1",
                f"dep-{sname}",
                "Running" if i % 7 else "Pending",
                start,
                None,
            )
        )
    return (
        spark.createDataFrame(pods, K8S_PODS),
        spark.createDataFrame(svc_rows, K8S_SERVICES),
    )


def k8s_containers_fixture(spark: SparkSession, n_pods: int = 10) -> DataFrame:
    """Containers dimension: one container per pod's process upid, with
    container ids/names/cmdlines and a status (FIXTURES.md §6)."""
    from pixie_spark.schemas import K8S_CONTAINERS

    rows = []
    for i in range(n_pods):
        upid = _upid(i % 3 + 1, 1000 + i, BASE_NS - ((i % 48) + 1) * HOUR_NS)
        rows.append(
            (
                upid,
                f"containerd://c-{i:04d}",
                f"app-{i % 3}",
                f"/bin/server --port={8080 + i}",
                "CONTAINER_STATUS_RUNNING" if i % 5 else "CONTAINER_STATUS_WAITING",
            )
        )
    return spark.createDataFrame(rows, K8S_CONTAINERS)


def process_stats_fixture(
    spark: SparkSession, n_pods: int = 10, samples_per_pod: int = 40, seed: int = 45
) -> DataFrame:
    """process_stats-like table: per-upid MONOTONIC cpu/io counters and
    gauge memory values sampled every ~10s (process_stats_table.h)."""
    from pixie_spark.schemas import PROCESS_STATS

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_pods):
        upid = _upid(i % 3 + 1, 1000 + i, BASE_NS - ((i % 48) + 1) * HOUR_NS)
        utime = ktime = rchar = wchar = rbytes = wbytes = 0
        majf = minf = 0
        for s in range(samples_per_pod):
            t = BASE_NS + s * 10_000_000_000
            utime += int(rng.randint(1_000_000, 500_000_000))
            ktime += int(rng.randint(1_000_000, 100_000_000))
            rchar += int(rng.randint(0, 1 << 20))
            wchar += int(rng.randint(0, 1 << 19))
            rbytes += int(rng.randint(0, 1 << 18))
            wbytes += int(rng.randint(0, 1 << 17))
            majf += int(rng.randint(0, 2))
            minf += int(rng.randint(0, 100))
            rows.append(
                (
                    t, upid, majf, minf, utime, ktime,
                    int(rng.randint(4, 64)),
                    int(rng.randint(1 << 28, 1 << 31)),
                    int(rng.randint(1 << 26, 1 << 29)),
                    rchar, wchar, rbytes, wbytes,
                )
            )
    return spark.createDataFrame(rows, PROCESS_STATS)


def network_stats_fixture(
    spark: SparkSession, n_pods: int = 10, samples_per_pod: int = 40, seed: int = 46
) -> DataFrame:
    """network_stats-like table keyed by pod_id: monotonic rx/tx counters
    (network_stats_table.h)."""
    from pixie_spark.schemas import NETWORK_STATS

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_pods):
        rxb = txb = rxp = txp = rxe = txe = rxd = txd = 0
        for s in range(samples_per_pod):
            t = BASE_NS + s * 10_000_000_000
            rxb += int(rng.randint(1 << 10, 1 << 20))
            txb += int(rng.randint(1 << 10, 1 << 19))
            rxp += int(rng.randint(10, 1000))
            txp += int(rng.randint(10, 800))
            rxe += int(rng.randint(0, 2))
            txe += int(rng.randint(0, 2))
            rxd += int(rng.randint(0, 3))
            txd += int(rng.randint(0, 3))
            rows.append((t, f"pod-id-{i:04d}", rxb, txb, rxp, txp, rxe, txe, rxd, txd))
    return spark.createDataFrame(rows, NETWORK_STATS)


def stack_traces_fixture(
    spark: SparkSession, n_pods: int = 10, n: int = 400, seed: int = 47
) -> DataFrame:
    """stack_traces.beta-like table: folded-stack strings with counts
    (perf_profiler stack_traces_table.h)."""
    from pixie_spark.schemas import STACK_TRACES

    rng = np.random.RandomState(seed)
    frames = ["main", "runtime.schedule", "net/http.serve", "db.query",
              "json.Marshal", "crypto/tls.handshake", "gc.scan"]
    rows = []
    for i in range(n):
        pod = int(rng.randint(0, n_pods))
        upid = _upid(pod % 3 + 1, 1000 + pod, BASE_NS - (pod % 48 + 1) * HOUR_NS)
        depth = int(rng.randint(2, 5))
        stack = ";".join(frames[int(rng.randint(0, len(frames)))] for _ in range(depth))
        rows.append(
            (
                BASE_NS + (i % 60) * 10_000_000_000,
                upid,
                int(hash(stack) & 0x7FFFFFFF),
                stack,
                int(rng.randint(1, 50)),
            )
        )
    return spark.createDataFrame(rows, STACK_TRACES)


def observability_context(spark: SparkSession, n_pods: int = 10):
    """One-call setup for the verbatim-corpus tests: every source table
    the pxl_scripts corpus scans plus a fully-populated MetadataResolver.
    Returns (tables_dict, resolver)."""
    from pixie_spark.functions.metadata import MetadataResolver

    pods, services = k8s_fixtures(spark, n_pods=n_pods)
    tables = {
        "http_events": http_events_fixture(spark, n_pods=n_pods),
        "process_stats": process_stats_fixture(spark, n_pods=n_pods),
        "conn_stats": conn_stats_fixture(spark, n_pods=n_pods),
        "network_stats": network_stats_fixture(spark, n_pods=n_pods),
        "dns_events": dns_events_fixture(spark, n_pods=n_pods),
        "stack_traces.beta": stack_traces_fixture(spark, n_pods=n_pods),
        "jvm_stats": jvm_stats_fixture(spark, n_pods=n_pods),
        **dict(zip(["stirling_error", "probe_status"], stirling_error_fixtures(spark, n_pods=n_pods))),
        **{
            name: protocol_events_fixture(spark, proto, n_pods=n_pods)
            for name, proto in [
                ("mysql_events", "mysql"), ("pgsql_events", "pgsql"),
                ("redis_events", "redis"), ("cql_events", "cql"),
                ("kafka_events.beta", "kafka"), ("mongodb_events", "mongodb"),
                ("nats_events.beta", "nats"), ("mux_events", "mux"),
                ("amqp_events", "amqp"),
            ]
        },
    }
    resolver = MetadataResolver(
        pods, services, containers=k8s_containers_fixture(spark, n_pods=n_pods)
    )
    return tables, resolver


def dns_events_fixture(
    spark: SparkSession, n: int = 300, n_pods: int = 10, seed: int = 44
) -> DataFrame:
    """dns_events-like table (FIXTURES.md §5): JSON req/resp bodies with
    query names and answer arrays, log-normal latency."""
    from pixie_spark.schemas import DNS_EVENTS

    rng = np.random.RandomState(seed)
    names = [f"svc-{i}.prod.svc.cluster.local" for i in range(6)] + ["example.com", "api.github.com"]
    rows = []
    for i in range(n):
        pod = int(rng.randint(0, n_pods))
        upid = _upid(pod % 3 + 1, 1000 + pod, BASE_NS - (pod % 48 + 1) * HOUR_NS)
        qname = names[int(rng.randint(0, len(names)))]
        n_answers = int(rng.randint(0, 3))
        answers = [
            {"name": qname, "type": "A", "addr": f"10.0.0.{int(rng.randint(1, 250))}"}
            for _ in range(n_answers)
        ]
        rows.append(
            (
                BASE_NS + i * 10_000_000_000,
                upid,
                "10.32.0.10",
                53,
                f"10.0.0.{pod + 1}",
                int(rng.randint(30000, 60000)),
                1,
                False,
                json.dumps({"qr": 0, "rd": 1}),
                json.dumps({"queries": [{"name": qname, "type": "A"}]}),
                json.dumps({"qr": 1, "rcode": 0 if n_answers else 3}),
                json.dumps({"answers": answers}),
                int(np.exp(rng.normal(np.log(5e5), 1.0))),
            )
        )
    return spark.createDataFrame(rows, DNS_EVENTS)


# --- protocol trace fixtures (socket_tracer/*_table.h shapes) ----------------
# One generator per protocol family, sharing the canonical connection
# prefix: (time_, upid, remote_addr, remote_port, local_addr, local_port,
# trace_role, encrypted). Roughly 70% of events are traced server-side
# (trace_role=2) with the client pod's IP in remote_addr; the rest are
# client-side traces of out-of-cluster servers (203.0.113.x), matching
# the tracing model the *_data.pxl scripts document.

_SQL_POOL = [
    "SELECT * FROM orders WHERE customer_id = ?",
    "SELECT id, total FROM orders WHERE o_orderdate > ?",
    "INSERT INTO events (ts, kind) VALUES (?, ?)",
    "UPDATE inventory SET qty = qty - 1 WHERE part_id = ?",
    "SELECT COUNT(*) FROM lineitem",
]


def _proto_prefix(rng, i: int, n_pods: int, port: int):
    """Canonical prefix values for event i: (time_, upid, remote_addr,
    remote_port, local_addr, local_port, trace_role, encrypted)."""
    pod = int(rng.randint(0, n_pods))
    upid = _upid(pod % 3 + 1, 1000 + pod, BASE_NS - (pod % 48 + 1) * HOUR_NS)
    server_side = rng.rand() < 0.7
    if server_side:
        caller = int(rng.randint(0, n_pods))
        remote = f"10.0.0.{caller + 1}"
    else:
        remote = f"203.0.113.{int(rng.randint(1, 250))}"
    return (
        BASE_NS + i * 9_000_000_000,
        upid,
        remote,
        int(rng.randint(30000, 60000)) if server_side else port,
        f"10.0.0.{pod + 1}",
        port if server_side else int(rng.randint(30000, 60000)),
        2 if server_side else 1,
        False,
    )


def _lat(rng) -> int:
    return int(np.exp(rng.normal(np.log(8e5), 1.1)))


def protocol_events_fixture(spark: SparkSession, protocol: str, n: int = 300, n_pods: int = 10) -> DataFrame:
    """Protocol trace tables for the *_data/*_stats/*_flow_graph corpus
    scripts. Payload columns follow the stirling table definitions
    (socket_tracer/{mysql,pgsql,redis,cass,kafka,mongodb,nats,mux,amqp}_table.h)."""
    from pixie_spark import schemas as S

    seed = 50 + sum(ord(c) for c in protocol) % 37
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        pre = _proto_prefix(rng, i, n_pods, port={
            "mysql": 3306, "pgsql": 5432, "redis": 6379, "cql": 9042,
            "kafka": 9092, "mongodb": 27017, "nats": 4222, "mux": 1984,
            "amqp": 5672,
        }[protocol])
        sql = _SQL_POOL[int(rng.randint(0, len(_SQL_POOL)))]
        if protocol == "mysql":
            # req_cmd 3 = COM_QUERY (protocols/mysql Command::kQuery)
            rows.append((*pre, 3, sql, 0, f"Resultset rows = {int(rng.randint(0, 100))}", _lat(rng)))
        elif protocol == "pgsql":
            rows.append((*pre, "Query", sql, f"SELECT {int(rng.randint(0, 100))}", _lat(rng)))
        elif protocol == "redis":
            cmd = ["GET", "SET", "HGET", "INCR", "EXPIRE"][int(rng.randint(0, 5))]
            rows.append((*pre, cmd, json.dumps([f"key:{int(rng.randint(0, 50))}"]), "OK", _lat(rng)))
        elif protocol == "cql":
            # req_op 7 = QUERY, resp_op 8 = RESULT (cass opcodes)
            rows.append((*pre, 7, sql, 8, "Response type = ROWS", _lat(rng)))
        elif protocol == "kafka":
            # req_cmd 0 = Produce, 1 = Fetch, 11 = JoinGroup, 14 = SyncGroup
            # (kafka APIKey). Produce carries message sets in req_body;
            # Fetch carries them in resp (kafka_overview unnests each
            # side); Join/SyncGroup pairs share (group_id, generation_id,
            # member_id) so the rebalancing delay join finds partners.
            client = f"client-{int(rng.randint(0, n_pods))}"
            r = rng.rand()
            topic = ["orders", "events", "logs"][int(rng.randint(0, 3))]
            topics_body = {
                "topics": [{
                    "name": topic,
                    "partitions": [{"index": int(rng.randint(0, 3)),
                                    "message_set": {"size": int(rng.randint(100, 10_000))}}],
                }]
            }
            if r < 0.45:  # produce
                rows.append((*pre, 0, client, json.dumps(topics_body),
                             json.dumps({"error_code": 0}), _lat(rng)))
            elif r < 0.9:  # fetch
                rows.append((*pre, 1, client, json.dumps({"topics": [{"name": topic}]}),
                             json.dumps(topics_body), _lat(rng)))
            else:  # join + sync pair (rebalance)
                gen = int(rng.randint(1, 5))
                member = f"m-{int(rng.randint(0, 4))}"
                group = {"group_id": "cg-1", "generation_id": gen, "member_id": member}
                rows.append((*pre, 11, client, json.dumps({"group_id": "cg-1"}),
                             json.dumps({"generation_id": gen, "member_id": member}),
                             _lat(rng)))
                t2 = (pre[0] + 50_000_000, *pre[1:])
                rows.append((*t2, 14, client, json.dumps(group),
                             json.dumps({"error_code": 0}), _lat(rng)))
        elif protocol == "mongodb":
            cmd = ["find", "insert", "update"][int(rng.randint(0, 3))]
            rows.append((*pre, cmd, json.dumps({"collection": "users"}),
                         "ok", json.dumps({"n": int(rng.randint(0, 10))}), _lat(rng)))
        elif protocol == "nats":
            cmd = ["PUB", "SUB", "MSG"][int(rng.randint(0, 3))]
            rows.append((*pre, cmd,
                         json.dumps({"subject": "orders.created", "payload_size": int(rng.randint(10, 500))}),
                         "+OK"))
        elif protocol == "mux":
            # req_type 2 = Tdispatch (mux frame types)
            rows.append((*pre, 2, _lat(rng)))
        elif protocol == "amqp":
            # frame_type 1 = METHOD; class 60 = Basic; method 40 publish / 60 deliver
            method = 40 if rng.rand() < 0.5 else 60
            rows.append((*pre, 1, 1, 60, method, 0, 0,
                         json.dumps({"exchange": "amq.topic", "routing_key": "orders"}),
                         "", _lat(rng)))
        else:
            raise ValueError(f"unknown protocol {protocol!r}")
    schema = {
        "mysql": S.MYSQL_EVENTS, "pgsql": S.PGSQL_EVENTS, "redis": S.REDIS_EVENTS,
        "cql": S.CQL_EVENTS, "kafka": S.KAFKA_EVENTS, "mongodb": S.MONGODB_EVENTS,
        "nats": S.NATS_EVENTS, "mux": S.MUX_EVENTS, "amqp": S.AMQP_EVENTS,
    }[protocol]
    return spark.createDataFrame(rows, schema)


def stirling_error_fixtures(spark: SparkSession, n_pods: int = 10, seed: int = 49):
    """(stirling_error, probe_status): collector self-reporting tables
    (stirling_error_table.h / probe_status_table.h). Status enum follows
    statuspb: 0 = OK, 2 = UNKNOWN, 13 = INTERNAL."""
    from pixie_spark.schemas import PROBE_STATUS, STIRLING_ERROR

    rng = np.random.RandomState(seed)
    connectors = ["socket_tracer", "perf_profiler", "jvm_stats", "process_stats"]
    err_rows, probe_rows = [], []
    for i in range(60):
        pod = int(rng.randint(0, n_pods))
        upid = _upid(pod % 3 + 1, 1000 + pod, BASE_NS - (pod % 48 + 1) * HOUR_NS)
        t = BASE_NS + i * 30_000_000_000
        conn = connectors[int(rng.randint(0, len(connectors)))]
        failed = rng.rand() < 0.2
        err_rows.append(
            (
                t, upid, conn, 13 if failed else 0,
                "probe attach failed: permission denied" if failed else "",
                json.dumps({"attempt": int(rng.randint(1, 4))}),
            )
        )
        probe_rows.append(
            (
                t, upid, conn, f"{conn}__probe_{int(rng.randint(0, 5))}",
                2 if failed else 0,
                "kprobe target symbol missing" if failed else "",
                json.dumps({"kernel": "6.1"}),
            )
        )
    return (
        spark.createDataFrame(err_rows, STIRLING_ERROR),
        spark.createDataFrame(probe_rows, PROBE_STATUS),
    )


def jvm_stats_fixture(
    spark: SparkSession, n_pods: int = 10, samples_per_pod: int = 30, seed: int = 48
) -> DataFrame:
    """jvm_stats table (jvm_stats_table.h): GC-time counters and heap
    gauges sampled per java process."""
    from pixie_spark.schemas import JVM_STATS

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_pods):
        upid = _upid(i % 3 + 1, 1000 + i, BASE_NS - ((i % 48) + 1) * HOUR_NS)
        young, full = 0, 0
        max_heap = 512 * 1024 * 1024
        for s in range(samples_per_pod):
            young += int(rng.randint(0, 5_000_000))
            full += int(rng.randint(0, 500_000))
            used = int(rng.randint(64, 400)) * 1024 * 1024
            rows.append(
                (
                    BASE_NS + s * 10_000_000_000, upid, young, full,
                    used, max(used + 64 * 1024 * 1024, 256 * 1024 * 1024), max_heap,
                )
            )
    return spark.createDataFrame(rows, JVM_STATS)


def conn_stats_fixture(
    spark: SparkSession, n_pods: int = 10, samples_per_pod: int = 60, seed: int = 43
) -> DataFrame:
    """conn_stats-like table (FIXTURES.md §2): per-upid MONOTONIC counters
    sampled every ~10s over 10 min, with one mid-series counter reset to
    exercise the clamp path."""
    from pixie_spark.schemas import CONN_STATS

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_pods):
        upid = _upid(i % 3 + 1, 1000 + i, BASE_NS - ((i % 48) + 1) * HOUR_NS)
        # each pod traces a server-side series (trace_role=2, the inbound
        # connection) AND a client-side series (trace_role=1, its outbound
        # connection to a peer pod) — conn_stats_table.h keys counters by
        # (upid, remote_addr, trace_role). One client points outside the
        # cluster to exercise the nslookup fallback-to-IP path.
        peer = (i + 1) % n_pods
        client_remote = "203.0.113.9" if i == 1 else f"10.0.0.{peer + 1}"
        # one pod receives traffic FROM outside the cluster (inbound_conns
        # looks for server-side series whose remote is not a known pod)
        server_remote = "203.0.113.77" if i == 2 else f"10.0.0.{i+1}"
        sent, recv, opened = 0, 0, 0
        csent, crecv, copened = 0, 0, 0
        for s in range(samples_per_pod):
            t = BASE_NS + s * 10_000_000_000
            if i == 0 and s == samples_per_pod // 2:
                sent, recv, opened = 0, 0, 0  # process restart: counter reset
            sent += int(rng.randint(100, 10_000))
            recv += int(rng.randint(100, 20_000))
            opened += int(rng.randint(0, 3))
            rows.append(
                (
                    t, upid, server_remote, 8080, 2, 2, 1, bool(i % 2),
                    opened, max(opened - 1, 0), 1, sent, recv,
                )
            )
            csent += int(rng.randint(100, 5_000))
            crecv += int(rng.randint(100, 10_000))
            copened += int(rng.randint(0, 2))
            rows.append(
                (
                    t, upid, client_remote, 8080, 1, 2, 1, bool(i % 2),
                    copened, max(copened - 1, 0), 1, csent, crecv,
                )
            )
    return spark.createDataFrame(rows, CONN_STATS)


def http_events_fixture(
    spark: SparkSession, n: int = 2000, n_pods: int = 10, seed: int = 42, orphan_frac: float = 0.03
) -> DataFrame:
    """Skewed HTTP events table (FIXTURES.md §1/§8)."""
    rng = np.random.RandomState(seed)
    # uneven event rate over 1h: mixture of two rates
    t = np.sort(
        np.concatenate(
            [
                rng.uniform(0, 0.4, int(n * 0.7)),
                rng.uniform(0.4, 1.0, n - int(n * 0.7)),
            ]
        )
    )
    times = (BASE_NS + t * HOUR_NS).astype(np.int64)
    status_pool = np.concatenate(
        [
            np.repeat([200, 204], [80, 15]),
            np.repeat([400, 404], [2, 2]),
            np.array([500]),
        ]
    )
    latency = np.minimum(
        (np.exp(rng.normal(np.log(2e6), 1.2, n))).astype(np.int64), 2_000_000_000
    )  # log-normal around 2ms, p99 ~ 150ms
    rows = []
    for i in range(n):
        if rng.rand() < orphan_frac:
            upid = _upid(9, 9900 + int(rng.randint(0, 50)), BASE_NS - 7 * HOUR_NS)
        else:
            pod = int(rng.randint(0, n_pods))
            upid = _upid(pod % 3 + 1, 1000 + pod, BASE_NS - (pod % 48 + 1) * HOUR_NS)
        tmpl = _PATH_TEMPLATES[int(rng.randint(0, len(_PATH_TEMPLATES)))]
        path = tmpl.replace("{id}", str(int(rng.randint(1, 500))))
        status = int(status_pool[int(rng.randint(0, len(status_pool)))])
        method = _METHODS[int(rng.randint(0, len(_METHODS)))]
        body_size = int(rng.randint(0, 4096))
        # remote addr = a caller pod's ip (service-graph edges resolvable
        # via ip→pod→service), with a few external clients mixed in
        if rng.rand() < 0.9:
            caller = int(rng.randint(0, n_pods))
            remote_addr = f"10.0.{caller // 250}.{caller % 250 + 1}"
        else:
            remote_addr = f"203.0.113.{int(rng.randint(1, 250))}"
        rows.append(
            (
                int(times[i]),
                upid,
                remote_addr,
                int(rng.randint(1024, 65535)),
                "10.0.0.1",
                8080,
                2,  # server
                bool(rng.rand() < 0.5),
                1,
                1,
                1 if rng.rand() < 0.6 else 0,
                json.dumps({"host": "svc.local"}),
                method,
                path,
                "{}" if method in ("GET", "DELETE") else json.dumps({"q": int(rng.randint(0, 9))}),
                body_size,
                json.dumps({"content-type": "application/json"}),
                status,
                "",
                json.dumps({"ok": status < 400}),
                int(rng.randint(16, 65536)),
                int(latency[i]),
            )
        )
    return spark.createDataFrame(rows, HTTP_EVENTS)
