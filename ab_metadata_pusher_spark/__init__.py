"""ab_metadata_pusher_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``Wonong/ab-metadata-pusher`` (a cron-scheduled metadata-ETL pusher built on
Amundsen Databuilder; see /root/reference) as an idiomatic Spark engine:

* metadata extraction pipelines (catalog scan -> nested TableMetadata ->
  property-graph nodes/relations) expressed as lazy DataFrame plans;
* staging + publishing sinks (parquet/CSV staging, size-aware chunked SQS
  publisher, Kafka) as pluggable peers;
* a relational operator library (joins, aggregations, windows, set ops,
  top-k, scalar functions) with DuckDB-oracle parity tests;
* LLM-data-pipeline operators (exact/near dedup, similarity search, text
  analysis, multimodal column plumbing) designed for 100 TB scale;
* Structured Streaming equivalents of the reference's cron cadence.

Everything is declarative DataFrame/SQL first so Catalyst/Tungsten/AQE pick
the physical strategy; Python UDFs appear only as Arrow-batched pandas UDFs
where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
