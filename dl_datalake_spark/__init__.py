"""dl_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference lake (`vladtarrow/dl-datalake`): partitioned-Parquet time-series
storage with upsert/merge semantics, a manifest catalog, incremental
ingest, integrity verification, resample aggregation — plus the full
relational query surface (joins/aggs/windows/set-ops) and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.

Everything is declared through the DataFrame/SQL API so Catalyst owns
predicate pushdown, partition pruning, join strategy and AQE; Python
never touches the data plane row-at-a-time.
"""

__version__ = "0.1.0"

from dl_datalake_spark.session import get_spark, ensure_runtime_confs  # noqa: F401
