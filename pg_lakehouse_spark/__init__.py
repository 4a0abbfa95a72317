"""pg_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the ``pg_lakehouse`` PostgreSQL extension (reference:
MisterRaindrop/pg_lakehouse): full SQL over snapshot-versioned lakehouse
tables, plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Architecture (see SURVEY.md for the reference mapping):

- ``session``      SparkSession factory (AQE, UTC, tuned shuffle).
- ``tables``       fixture/table registry over parquet directories.
- ``lakehouse``    snapshot-versioned table format: ACID append/overwrite,
                   time travel, DELETE/UPDATE/MERGE, compaction, vacuum
                   (Spark-first equivalent of the reference's iceberg_am
                   TAM + catalog, reference pg_lakehouse_iceberg/src/*).
- ``catalog``      pluggable catalog seam: directory (internal/hadoop)
                   and Iceberg-REST-shaped HTTP backends.
- ``sources``      file formats (parquet/orc/csv/json/avro) + sinks.
- ``avro_io``      pure-Python Avro OCF codec (fallback when the
                   spark-avro jar is absent), Spark-distributed.
- ``objectstore``  s3a configuration + path normalization.
- ``logical_types`` Iceberg time/uuid/fixed mappings Spark lacks.
- ``timeutil``     timestamp-encoding normalization (epoch_us).
- ``operators``    relational query library (joins incl. as-of/range,
                   windows, top-k, set ops, grouping sets).
- ``functions``    scalar function library (string/date/math/array/json).
- ``llm``          dedup (exact/minhash/simhash/jaccard), ANN similarity,
                   text analysis, multimodal binary columns.
- ``streaming``    watermarked tumbling/sliding/session windows; lake
                   append + CDC-upsert (MERGE-per-batch) sinks.
- ``rollup``       incremental continuous-aggregate rollups.
- ``workload``     the oracle-checked query suite (driver contract).
"""

from pg_lakehouse_spark.session import get_spark
from pg_lakehouse_spark.tables import TABLE_NAMES, load_tables

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "TABLE_NAMES", "__version__"]
