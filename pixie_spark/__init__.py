"""pixie_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pixie-io/pixie (Carnot query engine),
re-expressed Spark-first.

Layers (mirrors SURVEY.md structure, not the reference architecture):

- :mod:`pixie_spark.session`   — SparkSession factory tuned for the workload.
- :mod:`pixie_spark.types`     — the 6-type system + semantic types + UPID.
- :mod:`pixie_spark.schemas`   — source-table schemas (http_events, ...).
- :mod:`pixie_spark.functions` — the UDF/UDA registry re-expressed as
  native Column expressions (reference: src/carnot/funcs/builtins/*).
- :mod:`pixie_spark.api`       — PxL-flavored DataFrame facade
  (reference: src/carnot/planner/objects/dataframe.h).
- :mod:`pixie_spark.operators` — operators beyond stock Spark: dedup,
  similarity search, text analysis, multimodal plumbing.
- :mod:`pixie_spark.sources`   — table registration / fixture generation.
- :mod:`pixie_spark.streaming` — df.stream() / rolling windows / sinks.
- :mod:`pixie_spark.plans`     — plan inspection & scale assertions.

Everything here is built on public Apache Spark APIs only.
"""

from pixie_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
