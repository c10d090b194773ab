"""flume_source_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
``cas-bigdatalab/flume-source`` (a Flume directory-watching source,
``/root/reference/``) as an idiomatic Spark engine:

- :mod:`flume_source_spark.sources.filemeta` — the reference's
  directory-watching source as a Spark Structured Streaming custom
  source (Python DataSource API), with a batch twin.
- :mod:`flume_source_spark.operators` — the declared relational
  operator surface (joins, aggregations, windows, set ops, scalar
  function families) as oracle-checked query builders, all registered
  in :mod:`flume_source_spark.registry`.
- :mod:`flume_source_spark.pipeline` — LLM-data-pipeline operators:
  deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search, text analysis, multimodal column plumbing.
- :mod:`flume_source_spark.streaming` — watermarked/windowed streaming
  helpers with batch-equivalence oracles.

Everything is DataFrame/SQL-first so Catalyst handles pushdown,
pruning, join strategy selection, and AQE; Python UDFs appear only
where built-in functions genuinely can't express the semantics.
"""

__version__ = "0.1.0"

from flume_source_spark.session import get_session  # noqa: F401
from flume_source_spark.tables import TABLE_NAMES, load_tables, register_views  # noqa: F401
