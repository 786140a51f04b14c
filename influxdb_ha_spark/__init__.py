"""influxdb_ha_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `adamringhede/influxdb-ha` reference
(a Go clustering proxy for InfluxDB 1.x).

Architecture (Spark-first, NOT a port):

- The reference's clustering mechanics (consistent-hash ring, replica
  resolution, scatter/gather HTTP fan-out, k-way merge, partial-aggregate
  rewrite — reference service/coordinator.go, service/merge/*) are replaced
  by Spark's own distribution: partitioned Parquet storage, Catalyst's
  partial/final aggregation, and shuffle.
- What we actually implement on top of Spark:
  * the InfluxDB data model (measurements, tags, fields, ns time) — model.py
  * an InfluxQL frontend (parser + planner → DataFrame) — influxql/, planner.py
  * fill() semantics (bucket spine + 4 fill modes) — functions/fill.py
  * the full aggregate/selector/transform matrix — functions/
  * line-protocol ingest + partition-key validation — lineprotocol.py, ingest.py
  * continuous queries as Structured Streaming jobs — streaming/
  * the admin/meta surface (SHOW ..., clusterql) — admin.py, influxql/clusterql.py
  * LLM-data-pipeline operators (dedup, similarity, text, multimodal) — operators/
"""

__version__ = "0.1.0"

from .model import Catalog, Measurement, PartitionKey, TIME_COL  # noqa: E402,F401
from .planner import Planner, QueryError, influxql_df  # noqa: E402,F401
from .server import Engine, write_lines  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
