"""K8s metadata resolution — the reference's ~100 metadata UDFs
(src/carnot/funcs/metadata/metadata_ops.cc:35-139: upid_to_pod_name,
upid_to_service_name, pod_id_to_*, service_id_to_*, ip_to_pod_id, ...)
re-expressed as broadcast joins against slowly-changing dimension tables.

The reference resolves each call against an in-memory k8s metadata
snapshot on the agent; the Spark equivalent is a broadcast dimension
join — one hash lookup per row, same asymptotics, but planner-visible
(column pruning, join reordering) and cluster-wide consistent.

Dimension schemas: pixie_spark.schemas.K8S_* (FIXTURES.md §6). Rows
carry [start_time, stop_time) validity windows; resolution is as-of the
event time when a time column is given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# accessor name → (dim table, join key on dim, value column)
_UPID_ACCESSORS = {
    "pod_id": "pod_id",
    "pod_name": "pod_name",
    "pod": "pod_name",  # PxL ctx['pod'] alias
    "namespace": "namespace",
    "node_name": "node_name",
    "node": "node_name",  # PxL ctx['node'] alias
    "pod_ip": "pod_ip",
    "service_id": "service_id",
    "replicaset_id": "replicaset_id",
    "deployment_id": "deployment_id",
    "pod_phase": "phase",
}

# ctx['service'] is the canonical PxL accessor for the service name
_SERVICE_ALIASES = ("service", "service_name")

# ctx resolution for frames that carry pod_id but no upid (post-agg frames
# in the pxviews corpus: groupby(['pod_id', ...]) then df.ctx['pod'])
_POD_ID_ACCESSORS = {
    "pod_name": "pod_name",
    "pod": "pod_name",
    "namespace": "namespace",
    "node_name": "node_name",
    "node": "node_name",
    "pod_ip": "pod_ip",
    "service_id": "service_id",
    "pod_phase": "phase",
}

# ctx accessors resolved from the containers dimension (keyed by upid)
_CONTAINER_ACCESSORS = {
    "container": "container_name",
    "container_name": "container_name",
    "container_id": "container_id",
    "cmdline": "cmdline",
}

# px.X_to_Y scalar-lookup UDFs (metadata_ops.cc) → (dim, key, value) hops;
# a list of hops expresses chains like pod_id → service_id → service_name
SCALAR_LOOKUPS: dict[str, list[tuple[str, str, str]]] = {
    "ip_to_pod_id": [("pods", "pod_ip", "pod_id")],
    "ip_to_service_id": [("pods", "pod_ip", "service_id")],
    "pod_id_to_pod_name": [("pods", "pod_id", "pod_name")],
    "pod_id_to_namespace": [("pods", "pod_id", "namespace")],
    "pod_id_to_node_name": [("pods", "pod_id", "node_name")],
    "pod_name_to_status": [("pods", "pod_name", "phase")],
    "pod_name_to_start_time": [("pods", "pod_name", "start_time")],
    "pod_name_to_pod_ip": [("pods", "pod_name", "pod_ip")],
    "pod_name_to_namespace": [("pods", "pod_name", "namespace")],
    "service_id_to_service_name": [("services", "service_id", "service_name")],
    "service_name_to_service_id": [("services", "service_name", "service_id")],
    "upid_to_pod_id": [("pods", "upid", "pod_id")],
    "upid_to_pod_name": [("pods", "upid", "pod_name")],
    "upid_to_namespace": [("pods", "upid", "namespace")],
    "upid_to_node_name": [("pods", "upid", "node_name")],
    "upid_to_service_id": [("pods", "upid", "service_id")],
    "pod_id_to_service_name": [
        ("pods", "pod_id", "service_id"),
        ("services", "service_id", "service_name"),
    ],
    "pod_id_to_service_id": [("pods", "pod_id", "service_id")],
    "upid_to_service_name": [
        ("pods", "upid", "service_id"),
        ("services", "service_id", "service_name"),
    ],
    "upid_to_container_name": [("containers", "upid", "container_name")],
    "upid_to_container_id": [("containers", "upid", "container_id")],
    "upid_to_cmdline": [("containers", "upid", "cmdline")],
    "container_id_to_status": [("containers", "container_id", "status")],
    # px.nslookup (src/carnot/funcs/net/net_ops.cc): reverse lookup of an
    # IP. A per-row resolver(3) call is an executor-killing anti-pattern at
    # scale; resolve against the pod-IP dimension instead (fallback_to_key
    # on the MetadataCall returns the raw IP for non-cluster addresses,
    # matching the reference's miss behavior).
    "nslookup": [("pods", "pod_ip", "pod_name")],
}


class MetadataResolver:
    """Holds the k8s dimension tables and rewrites ctx[...] accessors into
    broadcast joins (SURVEY §2.2 MetadataIR / convert_metadata_rule.cc).
    """

    def __init__(
        self,
        pods: DataFrame,
        services: DataFrame | None = None,
        replicasets: DataFrame | None = None,
        deployments: DataFrame | None = None,
        containers: DataFrame | None = None,
    ):
        self.pods = pods
        self.services = services
        self.replicasets = replicasets
        self.deployments = deployments
        self.containers = containers

    def _dim(self, name: str) -> DataFrame:
        d = getattr(self, name, None)
        if d is None:
            raise ValueError(f"no {name} dimension bound on the resolver")
        return d

    def _join_pods(self, df: DataFrame, upid_col: str, cols: list[str], time_col: str | None) -> DataFrame:
        dim_cols = ["upid"] + sorted({c for c in cols}) + (
            ["start_time", "stop_time"] if time_col else []
        )
        pods = self.pods
        if time_col is None:
            # K8S_PODS carries [start_time, stop_time) validity windows; a
            # upid with multiple validity rows (pod restart epochs) would
            # fan out event rows in the untimed path. Keep only the latest
            # validity row per upid (window over the broadcast-small dim).
            from pyspark.sql import Window

            w = Window.partitionBy("upid").orderBy(F.col("start_time").desc())
            pods = (
                pods.withColumn("__md_rn", F.row_number().over(w))
                .where(F.col("__md_rn") == 1)
                .drop("__md_rn")
            )
        dim = pods.select(*[F.col(c).alias(f"__md_{c}") for c in dim_cols])
        cond = df[upid_col] == F.col("__md_upid")
        if time_col:
            cond = (
                cond
                & (df[time_col] >= F.col("__md_start_time"))
                & ((df[time_col] < F.col("__md_stop_time")) | F.col("__md_stop_time").isNull())
            )
        out = df.join(F.broadcast(dim), cond, "left")
        for c in cols:
            out = out.withColumn(c, F.col(f"__md_{c}"))
        return out.drop(*[f"__md_{c}" for c in dim_cols])

    def resolve_upid(
        self, df: DataFrame, attrs: list[str], upid_col: str = "upid", time_col: str | None = None
    ) -> DataFrame:
        """df.ctx['pod_name'] etc. → one broadcast join adding all attrs.

        Multiple attrs resolve in a single join (the reference pays one
        UDF call per attr; the analyzer here merges them — the analogue of
        CombineConsecutiveMapsRule).
        """
        unknown = [a for a in attrs if a not in _UPID_ACCESSORS and a not in _SERVICE_ALIASES]
        if unknown:
            raise KeyError(
                f"unknown metadata attrs: {unknown}; have "
                f"{sorted(_UPID_ACCESSORS)} + {list(_SERVICE_ALIASES)}"
            )
        pod_reqs = [(a, _UPID_ACCESSORS[a]) for a in attrs if a in _UPID_ACCESSORS]
        service_reqs = [a for a in attrs if a in _SERVICE_ALIASES]
        dim_cols = sorted({c for _, c in pod_reqs})
        if service_reqs and "service_id" not in dim_cols:
            dim_cols.append("service_id")
        out = self._join_pods(df, upid_col, dim_cols, time_col)
        # one output column PER REQUESTED NAME (an alias and its canonical
        # name may both be requested — e.g. ['pod', 'pod_name'])
        for req, dim in pod_reqs:
            if req != dim:
                out = out.withColumn(req, F.col(dim))
        requested_names = {a for a, _ in pod_reqs}
        for dim in dim_cols:
            if dim not in requested_names and dim != "service_id":
                out = out.drop(dim)
        if service_reqs:
            if self.services is None:
                raise ValueError(f"{service_reqs[0]} requested but no services dimension provided")
            svc = F.broadcast(
                self.services.select(
                    F.col("service_id").alias("__svc_id"),
                    F.col("service_name").alias("__svc_name"),
                )
            )
            out = out.join(svc, out["service_id"] == F.col("__svc_id"), "left").drop("__svc_id")
            for a in service_reqs:
                out = out.withColumn(a, F.col("__svc_name"))
            out = out.drop("__svc_name")
            if "service_id" not in attrs:
                out = out.drop("service_id")
        return out

    def resolve_ctx(
        self, df: DataFrame, attr: str, out_name: str, time_col: str | None = None
    ) -> DataFrame:
        """df.ctx[attr] for ANY frame shape: upid-keyed frames resolve via
        the pods dim (as the reference's metadata rules do); post-agg
        frames that only carry pod_id resolve via pod_id (the pxviews
        corpus does this constantly); container attrs via the containers
        dim; 'pid' is computed from the upid directly."""
        if attr == "pid":
            from pixie_spark.types import upid_to_pid

            return df.withColumn(out_name, upid_to_pid(F.col("upid")))
        if attr in _CONTAINER_ACCESSORS:
            return self.lookup_expr(
                df, [("containers", "upid", _CONTAINER_ACCESSORS[attr])],
                F.col("upid"), out_name,
            )
        if "upid" in df.columns:
            resolved = self.resolve_upid(df, [attr], time_col=time_col)
            if attr != out_name:
                resolved = resolved.withColumnRenamed(attr, out_name)
            # '' on miss for string attrs (reference metadata UDF parity —
            # corpus scripts filter ctx misses with `df.pod != ''`)
            if resolved.schema[out_name].dataType.typeName() == "string":
                resolved = resolved.withColumn(
                    out_name, F.coalesce(F.col(out_name), F.lit(""))
                )
            return resolved
        if "pod_id" in df.columns:
            return self.resolve_pod_id(df, attr, out_name)
        raise KeyError(
            f"ctx[{attr!r}] needs a upid or pod_id column; frame has {df.columns}"
        )

    def resolve_pod_id(self, df: DataFrame, attr: str, out_name: str) -> DataFrame:
        if attr in _POD_ID_ACCESSORS:
            hops = [("pods", "pod_id", _POD_ID_ACCESSORS[attr])]
        elif attr in _SERVICE_ALIASES:
            hops = [
                ("pods", "pod_id", "service_id"),
                ("services", "service_id", "service_name"),
            ]
        else:
            raise KeyError(f"unknown pod_id ctx attr {attr!r}")
        return self.lookup_expr(df, hops, F.col("pod_id"), out_name)

    def lookup_expr(
        self,
        df: DataFrame,
        hops: list[tuple[str, str, str]],
        key: Column,
        out_name: str,
        fallback_to_key: bool = False,
    ) -> DataFrame:
        """Generic scalar-lookup chain keyed by an arbitrary Column
        expression: each (dim, key_attr, value_attr) hop is one broadcast
        left join; the final value lands in ``out_name``. This is the
        engine behind every px.X_to_Y metadata UDF (SCALAR_LOOKUPS) — the
        reference's per-row hash lookup against the k8s metadata snapshot
        becomes a planner-visible broadcast hash join with identical
        asymptotics. fallback_to_key=True coalesces misses to the key
        itself (px.nslookup semantics). String-valued lookups coalesce
        misses to '' — every reference metadata UDF returns an empty
        string, never null, for an unresolvable key (metadata_ops.h:112,
        135, 156...), and corpus scripts test `== ''` accordingly."""
        cur = key
        value_type = None
        for i, (dim_name, key_attr, value_attr) in enumerate(hops):
            dim = self._dim(dim_name)
            mk, mv = f"__lk{i}_k", f"__lk{i}_v"
            d = F.broadcast(
                dim.select(F.col(key_attr).alias(mk), F.col(value_attr).alias(mv))
                .where(F.col(mk).isNotNull())
                .dropDuplicates([mk])
            )
            df = df.join(d, cur.eqNullSafe(F.col(mk)), "left").drop(mk)
            cur = F.col(mv)
            value_type = dim.schema[value_attr].dataType.typeName()
        if fallback_to_key:
            out = F.coalesce(cur, key)
        elif value_type == "string":
            out = F.coalesce(cur, F.lit(""))
        else:
            out = cur
        df = df.withColumn(out_name, out)
        return df.drop(*[f"__lk{i}_v" for i in range(len(hops))])

    # individual accessors (generated API parity with metadata_ops.cc) -------

    def upid_to_pod_name(self, df: DataFrame, upid_col: str = "upid") -> DataFrame:
        return self.resolve_upid(df, ["pod_name"], upid_col)

    def upid_to_service_name(self, df: DataFrame, upid_col: str = "upid") -> DataFrame:
        return self.resolve_upid(df, ["service_name"], upid_col)

    def upid_to_namespace(self, df: DataFrame, upid_col: str = "upid") -> DataFrame:
        return self.resolve_upid(df, ["namespace"], upid_col)

    def upid_to_node_name(self, df: DataFrame, upid_col: str = "upid") -> DataFrame:
        return self.resolve_upid(df, ["node_name"], upid_col)

    def ip_to_pod_id(self, df: DataFrame, ip_col: str) -> DataFrame:
        dim = F.broadcast(
            self.pods.select(F.col("pod_ip").alias(ip_col), "pod_id").dropDuplicates([ip_col])
        )
        return df.join(dim, ip_col, "left")

    def has_service_name(self, df: DataFrame, upid_col: str = "upid") -> DataFrame:
        out = self.upid_to_service_name(df, upid_col)
        return out.withColumn("has_service_name", F.col("service_name").isNotNull())

    # pod_id_* / service_id_* accessor families (metadata_ops.cc:35-139) ----

    def pod_id_to(self, df: DataFrame, attrs: list[str], pod_id_col: str = "pod_id") -> DataFrame:
        """pod_id_to_pod_name / _namespace / _node_name / _service_id / ..."""
        dim = F.broadcast(
            self.pods.select("pod_id", *attrs).dropDuplicates(["pod_id"]).withColumnRenamed(
                "pod_id", pod_id_col
            )
        )
        return df.join(dim, pod_id_col, "left")

    def service_id_to(
        self, df: DataFrame, attrs: list[str], service_id_col: str = "service_id"
    ) -> DataFrame:
        """service_id_to_service_name / _namespace / _cluster_ip."""
        if self.services is None:
            raise ValueError("no services dimension bound")
        dim = F.broadcast(
            self.services.select("service_id", *attrs)
            .dropDuplicates(["service_id"])
            .withColumnRenamed("service_id", service_id_col)
        )
        return df.join(dim, service_id_col, "left")

    def pod_id_to_service_name(self, df: DataFrame, pod_id_col: str = "pod_id") -> DataFrame:
        """Two chained broadcast hops: pod_id → service_id → service_name."""
        return self.service_id_to(self.pod_id_to(df, ["service_id"], pod_id_col), ["service_name"])
