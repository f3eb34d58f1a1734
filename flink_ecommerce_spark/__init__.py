"""flink_ecommerce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference Flink e-commerce streaming job
(hoangvubrvt/flink-ecommerce, see SURVEY.md), built Spark-first:

- batch + streaming share the same DataFrame-building query functions
  (``plans/``): declare the logical plan, let Catalyst/Tungsten pick
  the physical strategy;
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) live in ``operators/``;
- sources/sinks (Kafka, files, JDBC-upsert-style foreachBatch) in
  ``sources/`` and ``streaming/``.

Everything here is derived from public knowledge only: the Apache
Spark API and documentation, and the reference repo's observable
behavior.
"""

__version__ = "0.1.0"
