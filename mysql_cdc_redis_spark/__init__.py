"""mysql_cdc_redis_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of dlf412/mysql-cdc-redis.

The reference (/root/reference) is a MySQL-binlog → Redis → CSV → BigQuery
CDC pipeline.  This package re-expresses every operator of that pipeline —
and the LLM-data-pipeline extensions the driver contract asks for — as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, designed for
a 1000-executor cluster at ~100 TB even though tests run on local[32].

Layout:
  session.py    — tuned SparkSession factory (AQE, Arrow, UTC)
  sources/      — parquet/CSV scans, synthetic CDC changelog source
  operators/    — compaction (the reference's core keyed-merge), dedup,
                  similarity search, text analysis, multimodal plumbing
  functions/    — scalar helpers shared by operators and plans
  plans/        — the query catalog exposed through __spark_entry__.py
  streaming/    — Structured Streaming twin of the compaction operator
"""

__version__ = "0.1.0"
