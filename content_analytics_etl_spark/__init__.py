"""content_analytics_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference project ``HanhHoang05/content-analytics-etl``
(a viewing-log batch ETL: recode → aggregate → pivot → join → OLAP
derivations), generalized to a star-schema analytics surface and extended
with the operators a large-scale training-data pipeline needs
(deduplication, similarity search, text analysis, multimodal columns,
structured streaming).

Design principles (see SURVEY.md):
- DataFrame/SQL declarative plans; Catalyst + Tungsten pick physical strategy.
- Explicit schemas everywhere (no inference jobs).
- No driver-side loops / collect in operators; everything distributed.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
