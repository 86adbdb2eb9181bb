"""Schema tooling + path-derivation catalog entries (SURVEY.md §2.10
C1/C2, §2.2 P6/P7).

The schema-inference oracle is DuckDB's own information_schema.columns —
a genuinely independent reimplementation of the reference's MySQL
information_schema scan (bq_schema_from_mysql.py:134-152)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.schema_tool import warehouse_schema
from ..sources import load_table
from .catalog import register

_SCHEMA_TABLES = ("customer", "lineitem", "nation", "orders", "part", "region", "supplier")


@register(
    "schema_infer_warehouse",
    doc="C1+S9: per-table warehouse schema — Spark StructType reflection "
    "translated through the reference's type map (ints→integer, "
    "decimal/float→float, dates→string, datetime→timestamp, unknown→"
    "string), system columns cdc_action/cdc_ts appended, name-sorted "
    "(bq_schema_from_mysql.py:54-88,150-157).  Oracle = DuckDB's own "
    "information_schema.columns under the same translation.",
    tags=("schema", "ref:C1", "ref:S9"),
    oracle=f"""
SELECT table_name AS tbl, column_name, CASE
         WHEN data_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT','HUGEINT','BOOLEAN') THEN 'integer'
         WHEN data_type IN ('FLOAT','DOUBLE','REAL') OR data_type LIKE 'DECIMAL%' THEN 'float'
         WHEN data_type IN ('TIMESTAMP','TIMESTAMP_NS','TIMESTAMP WITH TIME ZONE') THEN 'timestamp'
         ELSE 'string' END AS wtype
FROM information_schema.columns
WHERE table_name IN {_SCHEMA_TABLES!r}
UNION ALL
SELECT t.tbl, c.column_name, c.wtype
FROM (VALUES {", ".join(f"('{t}')" for t in _SCHEMA_TABLES)}) t(tbl),
     (VALUES ('cdc_action', 'string'), ('cdc_ts', 'timestamp')) c(column_name, wtype)
ORDER BY tbl, column_name
""",
)
def schema_infer_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for t in _SCHEMA_TABLES:
        for name, wtype in warehouse_schema(load_table(spark, sf_dir, t)):
            rows.append((t, name, wtype))
    return spark.createDataFrame(rows, "tbl string, column_name string, wtype string").orderBy(
        "tbl", "column_name"
    )


@register(
    "path_table_derivation",
    doc="P6: derive 'db.table' from the scanned file's basename "
    "(loadcsv.py:83-89) via input_file_name + regexp on the Spark side; "
    "the oracle states the expected derivation over the registered views "
    "(SF-agnostic — the fixture layout guarantees <table>.parquet names).",
    tags=("scalar", "ref:P6"),
    oracle="""
SELECT tbl, n_rows FROM (
  SELECT 'tpch.orders' AS tbl, count(*) AS n_rows FROM orders
  UNION ALL
  SELECT 'tpch.nation', count(*) FROM nation
)
ORDER BY tbl
""",
)
def path_table_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, name)
            .select(F.input_file_name().alias("path"))
            .select(
                F.concat(
                    F.lit("tpch."), F.regexp_extract("path", r"([^/]+)[.]parquet$", 1)
                ).alias("tbl")
            )
        )

    return (
        one("orders")
        .unionByName(one("nation"))
        .groupBy("tbl")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("tbl")
    )


@register(
    "gs_url_parse",
    doc="P7: parse the gs:// dump URL back into (system, sid, db, table, "
    "ts) — dump2csv.py:236-238's split idiom over URLs synthesized from "
    "orders rows; pure string functions both sides.",
    tags=("scalar", "ref:P7"),
    oracle="""
WITH urls AS (
  SELECT 'gs://bucket/binlog/' || CAST(o_custkey AS VARCHAR) || '/20240101/tpch.orders.'
         || CAST(o_orderkey AS VARCHAR) || '.csv' AS url
  FROM orders
),
parts AS (
  -- split of gs://bucket/binlog/<sid>/<date>/<file> yields 7 segments:
  -- [gs:, '', bucket, binlog, sid, date, file]
  SELECT url,
         string_split(url, '/') AS seg,
         string_split(string_split(url, '/')[7], '.') AS base
  FROM urls
)
SELECT seg[4] AS system, seg[5] AS sid, base[1] AS db, base[2] AS tb,
       CAST(base[3] AS BIGINT) AS file_ts
FROM parts ORDER BY CAST(base[3] AS BIGINT)
""",
)
def gs_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urls = orders.select(
        F.concat(
            F.lit("gs://bucket/binlog/"),
            F.col("o_custkey").cast("string"),
            F.lit("/20240101/tpch.orders."),
            F.col("o_orderkey").cast("string"),
            F.lit(".csv"),
        ).alias("url")
    )
    seg = F.split(F.col("url"), "/")
    base = F.split(F.element_at(seg, 7), r"\.")
    return urls.select(
        F.element_at(seg, 4).alias("system"),
        F.element_at(seg, 5).alias("sid"),
        F.element_at(base, 1).alias("db"),
        F.element_at(base, 2).alias("tb"),
        F.element_at(base, 3).cast("long").alias("file_ts"),
    ).orderBy("file_ts")


# ---------------------------------------------------------------------------
# Source-format breadth: JSON-lines and ORC roundtrips (S-row extensions —
# the reference's only interchange format is header'd CSV, dump2csv.py:90-94;
# a Spark-native warehouse speaks JSON/ORC/parquet interchangeably)
# ---------------------------------------------------------------------------


def _fmt_tmp(name: str) -> str:
    import os
    import tempfile
    import uuid

    return os.path.join(tempfile.gettempdir(), f"{name}_{uuid.uuid4().hex[:8]}")


@register(
    "source_json_roundtrip",
    doc="JSON-lines sink ∘ source roundtrip: events projected and written "
    "as newline-delimited JSON, read back with an explicit schema (no "
    "inference pass — at 100 TB schema inference is a full extra scan), "
    "then aggregated.  The oracle aggregates the original parquet directly, so "
    "a match proves the JSON encode/decode is lossless for the typed "
    "columns.  Timestamps travel as int64 epoch-microseconds "
    "(unix_micros ∘ timestamp_micros) — the pattern formatter "
    "('SSSSSS') silently truncates to milliseconds on the JSON write "
    "path, so the integer encoding is the only lossless choice.",
    tags=("source", "json", "ext"),
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS total_value,
       CAST(min(ts) AS TIMESTAMP) AS first_ts,
       CAST(max(ts) AS TIMESTAMP) AS last_ts
FROM events
GROUP BY event_type ORDER BY event_type
""",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    path = _fmt_tmp("events_json")
    events.write.mode("overwrite").json(path)
    back = (
        spark.read.schema(events.schema)
        .json(path)
        .withColumn("ts", F.timestamp_micros("ts_us").cast("timestamp_ntz"))
        .drop("ts_us")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "source_orc_roundtrip",
    doc="ORC sink ∘ source roundtrip: orders written as ORC (Spark's "
    "second columnar native format, with its own predicate-pushdown and "
    "column-pruning path), read back and aggregated; a pushed filter "
    "(o_orderdate >= 1995-01-01) exercises ORC row-group skipping.  "
    "Oracle aggregates the original parquet under the same predicate.",
    tags=("source", "orc", "ext"),
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _fmt_tmp("orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).where(F.col("o_orderdate") >= F.lit("1995-01-01"))
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_json_corrupt_records",
    doc="Error-tolerant ingestion (the source-layer analog of the "
    "reference's SaveIgnore drop-and-log, rcache.py:242-245, cdc.py:"
    "123-124): a JSONL batch where every key≡7 (mod 10) line is "
    "truncated garbage is read in PERMISSIVE mode with an explicit "
    "_corrupt_record column — bad rows become quarantine rows instead "
    "of failing the job or silently vanishing, and the good rows parse "
    "normally.  The aggregate accounts for BOTH populations, so the "
    "oracle (which derives good/bad from the same key rule) proves no "
    "row is lost or double-counted.  At 100 TB, fail-fast on one bad "
    "line of a trillion is not an option; quarantine-and-count is.",
    tags=("source", "json", "errors", "ext"),
    oracle="""
SELECT CASE WHEN o_orderkey % 10 = 7 THEN 'corrupt' ELSE 'good' END AS record_class,
       count(*) AS n_rows,
       sum(CASE WHEN o_orderkey % 10 = 7 THEN NULL ELSE o_orderkey END) AS key_sum,
       round(sum(CASE WHEN o_orderkey % 10 = 7 THEN NULL ELSE o_totalprice END), 2) AS price_sum
FROM orders
GROUP BY record_class
ORDER BY record_class
""",
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _fmt_tmp("orders_dirty_jsonl")
    # serialize each row as JSON, then deterministically corrupt key≡7 lines
    lines = orders.select(
        F.when(
            F.col("o_orderkey") % 10 == 7,
            F.concat(F.lit('{"k": '), F.col("o_orderkey").cast("string"), F.lit(", TRUNC")),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
                )
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = (
        spark.read.schema("k BIGINT, p DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return (
        back.groupBy(
            F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
            .otherwise("good")
            .alias("record_class")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_sum"),
            F.round(F.sum("p"), 2).alias("price_sum"),
        )
        .orderBy("record_class")
    )


@register(
    "source_parquet_schema_evolution",
    doc="Parquet schema evolution via mergeSchema (the storage-layer "
    "form of the reference's schema-drift handling, dump2csv.py:54-87: "
    "old dumps lack columns newer dumps carry): pre-1995 orders land "
    "WITHOUT o_orderpriority, 1995+ orders WITH it, in the same "
    "directory; `mergeSchema=true` unifies the footers and back-fills "
    "NULL for the missing column instead of failing or truncating.  "
    "One footer-merge at planning; data files are untouched.  The "
    "oracle recreates the evolution rule with a CASE on the year.",
    tags=("source", "parquet", "schema-drift", "ext"),
    oracle="""
SELECT coalesce(CASE WHEN year(o_orderdate) >= 1995 THEN o_orderpriority END,
                'MISSING') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY priority
ORDER BY priority
""",
)
def source_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _fmt_tmp("orders_evolved")
    old = orders.filter(F.year("o_orderdate") < 1995).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter(F.year("o_orderdate") >= 1995).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    old.write.mode("overwrite").parquet(f"{path}/gen=0")
    new.write.mode("overwrite").parquet(f"{path}/gen=1")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=0", f"{path}/gen=1"
    )
    return (
        merged.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("MISSING")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Anti-entropy: hierarchical table checksum (post-migration verification)
# ---------------------------------------------------------------------------


@register(
    "tooling_table_checksum",
    doc="Hierarchical order-insensitive table checksum — the verification "
    "step a CDC migration needs after replay (does the warehouse equal "
    "the source?).  Level 0: per-row md5 over a canonical string form "
    "(decimals pinned to scale 2, timestamps to dates, so both engines "
    "render identical text).  Level 1: rows route to 256 buckets by "
    "digest prefix; each bucket folds to md5(sorted row digests).  "
    "Level 2: md5 over the 256 bucket digests.  Per-bucket payload is "
    "|rows|/256 — at 100 TB widen the prefix (4 hex chars = 65k "
    "buckets) so every ordered aggregate stays memory-bounded; the "
    "level-2 reduce is always 32 bytes x buckets.  Exactly-equal "
    "checksums <=> exactly-equal multisets of rows, no row order or "
    "partitioning assumptions on either side.",
    tags=("tooling", "checksum", "ext"),
    oracle="""
WITH r AS (
  SELECT md5(concat_ws('|',
           CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
           o_orderstatus,
           CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)) AS h
  FROM orders
), b AS (
  SELECT substring(h, 1, 2) AS bucket, count(*) AS n,
         md5(string_agg(h, '' ORDER BY h)) AS digest
  FROM r GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets, CAST(sum(n) AS BIGINT) AS n_rows,
       md5(string_agg(digest, '' ORDER BY bucket)) AS checksum
FROM b
""",
)
def tooling_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"),
            F.col("o_orderdate").cast("date").cast("string"),
            F.col("o_orderpriority"),
        )
    )
    buckets = (
        orders.select(h.alias("h"))
        .withColumn("bucket", F.substring("h", 1, 2))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("md5(listagg(h, '') WITHIN GROUP (ORDER BY h))").alias("digest"),
        )
    )
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("n_rows"),
        F.expr("md5(listagg(digest, '') WITHIN GROUP (ORDER BY bucket))").alias("checksum"),
    )


@register(
    "tooling_partition_skew_report",
    doc="Shuffle-balance diagnostic: the row-count histogram a key would "
    "produce under hash partitioning, approximated engine-neutrally by "
    "key mod 32 (both engines' internal hashes differ, so the modulo "
    "proxy keeps the oracle exact while preserving the diagnostic "
    "shape).  Reports per-bucket counts plus each bucket's ratio to "
    "the mean — ratio >> 1 is the skewed-reducer warning that says "
    "'salt this key' before a 100 TB shuffle, not after it dies.",
    tags=("tooling", "skew", "ext"),
    oracle="""
WITH b AS (
  SELECT o_custkey % 32 AS bucket, count(*) AS n_rows
  FROM orders GROUP BY bucket
)
SELECT bucket, n_rows,
       round(n_rows / (avg(n_rows) OVER ()), 4) AS ratio_to_mean
FROM b ORDER BY bucket
""",
)
def tooling_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    b = orders.groupBy((F.col("o_custkey") % 32).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy()
    return b.select(
        "bucket",
        "n_rows",
        F.round(F.col("n_rows") / F.avg("n_rows").over(w), 4).alias("ratio_to_mean"),
    ).orderBy("bucket")


@register(
    "source_parquet_codec_matrix",
    doc="Compression-codec matrix: the same orders projection written "
    "parquet-zstd / snappy / gzip / lz4 and read back, each arm "
    "aggregated to an identical content digest — codec choice must "
    "never change bytes-on-read (it changes bytes-on-disk and "
    "scan CPU: zstd ~2x smaller than snappy, snappy/lz4 fastest "
    "to decode; at 100 TB the scan is IO-bound so zstd usually "
    "wins end-to-end).  Oracle: one aggregate of the source "
    "cross-joined with the codec labels.",
    tags=("source", "parquet", "codec", "ext"),
    oracle="""
SELECT codec, n_orders, key_sum, price_sum
FROM (VALUES ('gzip'), ('lz4'), ('snappy'), ('zstd')) c(codec)
CROSS JOIN (
  SELECT count(*) AS n_orders,
         CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
         round(sum(o_totalprice), 2) AS price_sum
  FROM orders WHERE o_orderkey IS NOT NULL
)
ORDER BY codec
""",
)
def source_parquet_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey").isNotNull()
    ).select("o_orderkey", "o_totalprice")
    out = None
    for codec in ("gzip", "lz4", "snappy", "zstd"):
        path = _fmt_tmp(f"orders_{codec}")
        orders.write.mode("overwrite").option("compression", codec).parquet(path)
        arm = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_orderkey").alias("key_sum"),
                F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
            )
            .select(F.lit(codec).alias("codec"), "*")
        )
        out = arm if out is None else out.unionByName(arm)
    return out.orderBy("codec")


@register(
    "tooling_manifest_reconcile",
    doc="Manifest reconciliation — the bookkeeping the reference's "
    "upload loop does by hand (dump2csv.py's uploaded/loaded lists, "
    "dump2csv.py:163-277): two file manifests (source vs destination, "
    "synthesized deterministically from orders chunks — destination "
    "missing every 7th file and corrupting every 11th file's size) "
    "full-outer-join on the file key into one sync report: "
    "missing_at_dst / orphan_at_dst / size_mismatch / ok, with "
    "counts and bytes per class.  One shuffle on the manifest key; "
    "manifests are O(files), never O(rows).",
    tags=("tooling", "manifest", "sink", "ext"),
    oracle="""
WITH src AS (
  SELECT 'chunk-' || CAST(o_orderkey // 100 AS VARCHAR) || '.csv' AS file,
         CAST(sum(o_orderkey % 1000) AS BIGINT) AS bytes
  FROM orders WHERE o_orderkey IS NOT NULL
  GROUP BY 1
),
dst AS (
  SELECT file, CASE WHEN CAST(replace(replace(file, 'chunk-', ''), '.csv', '') AS BIGINT) % 11 = 0
                    THEN bytes + 1 ELSE bytes END AS bytes
  FROM src
  WHERE CAST(replace(replace(file, 'chunk-', ''), '.csv', '') AS BIGINT) % 7 <> 0
)
SELECT CASE WHEN d.file IS NULL THEN 'missing_at_dst'
            WHEN s.file IS NULL THEN 'orphan_at_dst'
            WHEN s.bytes <> d.bytes THEN 'size_mismatch'
            ELSE 'ok' END AS status,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(coalesce(s.bytes, d.bytes)) AS BIGINT) AS total_bytes
FROM src s FULL OUTER JOIN dst d ON s.file = d.file
GROUP BY status ORDER BY status
""",
)
def tooling_manifest_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey").isNotNull())
    src = orders.groupBy(
        F.concat(
            F.lit("chunk-"),
            F.floor(F.col("o_orderkey") / 100).cast("long").cast("string"),
            F.lit(".csv"),
        ).alias("file")
    ).agg(F.sum(F.col("o_orderkey") % 1000).alias("bytes"))
    chunk_no = F.regexp_extract("file", r"chunk-(\d+)\.csv", 1).cast("long")
    dst = src.where(chunk_no % 7 != 0).select(
        "file",
        F.when(chunk_no % 11 == 0, F.col("bytes") + 1).otherwise(F.col("bytes")).alias(
            "bytes"
        ),
    )
    j = src.select(F.col("file").alias("s_file"), F.col("bytes").alias("s_bytes")).join(
        dst.select(F.col("file").alias("d_file"), F.col("bytes").alias("d_bytes")),
        F.col("s_file") == F.col("d_file"),
        "full_outer",
    )
    status = (
        F.when(F.col("d_file").isNull(), "missing_at_dst")
        .when(F.col("s_file").isNull(), "orphan_at_dst")
        .when(F.col("s_bytes") != F.col("d_bytes"), "size_mismatch")
        .otherwise("ok")
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.coalesce("s_bytes", "d_bytes")).alias("total_bytes"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# tooling ext: full referential-integrity orphan census
# ---------------------------------------------------------------------------


@register(
    "tooling_fk_orphan_census",
    doc="Referential-integrity census over every FK edge of the star "
    "schema in one result: per edge, child rows whose key has no parent "
    "(anti-join semantics spelled as conditional counts over left joins "
    "of pre-aggregated key sets — each side reduces to DISTINCT keys "
    "before joining, so at 100 TB the joins touch |keys|, not |rows|).",
    tags=("tooling", "quality", "join", "ext"),
    oracle="""
WITH edges AS (
  SELECT 'orders->customer' AS edge,
         (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders) c
          WHERE NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.k))
           AS n_orphan_keys,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS n_child_keys
  UNION ALL
  SELECT 'lineitem->orders',
         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.k)),
         (SELECT count(DISTINCT l_orderkey) FROM lineitem)
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.k)),
         (SELECT count(DISTINCT l_partkey) FROM lineitem)
  UNION ALL
  SELECT 'lineitem->supplier',
         (SELECT count(*) FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM supplier p WHERE p.s_suppkey = c.k)),
         (SELECT count(DISTINCT l_suppkey) FROM lineitem)
  UNION ALL
  SELECT 'customer->nation',
         (SELECT count(*) FROM (SELECT DISTINCT c_nationkey AS k FROM customer) c
          WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.k)),
         (SELECT count(DISTINCT c_nationkey) FROM customer)
  UNION ALL
  SELECT 'supplier->nation',
         (SELECT count(*) FROM (SELECT DISTINCT s_nationkey AS k FROM supplier) c
          WHERE NOT EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.k)),
         (SELECT count(DISTINCT s_nationkey) FROM supplier)
  UNION ALL
  SELECT 'nation->region',
         (SELECT count(*) FROM (SELECT DISTINCT n_regionkey AS k FROM nation) c
          WHERE NOT EXISTS (SELECT 1 FROM region p WHERE p.r_regionkey = c.k)),
         (SELECT count(DISTINCT n_regionkey) FROM nation)
)
SELECT edge, n_orphan_keys, n_child_keys FROM edges ORDER BY edge
""",
)
def tooling_fk_orphan_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table as lt

    def edge(name, child, ckey, parent, pkey):
        ck = child.select(F.col(ckey).alias("k")).distinct()
        pk = parent.select(F.col(pkey).alias("pk")).distinct()
        orphans = ck.join(pk, ck.k == pk.pk, "left_anti")
        return (
            orphans.agg(F.count(F.lit(1)).alias("n_orphan_keys"))
            .crossJoin(ck.agg(F.count(F.lit(1)).alias("n_child_keys")))
            .select(F.lit(name).alias("edge"), "n_orphan_keys", "n_child_keys")
        )

    orders = lt(spark, sf_dir, "orders")
    lineitem = lt(spark, sf_dir, "lineitem")
    customer = lt(spark, sf_dir, "customer")
    part = lt(spark, sf_dir, "part")
    supplier = lt(spark, sf_dir, "supplier")
    nation = lt(spark, sf_dir, "nation")
    region = lt(spark, sf_dir, "region")
    out = edge("orders->customer", orders, "o_custkey", customer, "c_custkey")
    for args in (
        ("lineitem->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        ("lineitem->part", lineitem, "l_partkey", part, "p_partkey"),
        ("lineitem->supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
        ("customer->nation", customer, "c_nationkey", nation, "n_nationkey"),
        ("supplier->nation", supplier, "s_nationkey", nation, "n_nationkey"),
        ("nation->region", nation, "n_regionkey", region, "r_regionkey"),
    ):
        out = out.unionByName(edge(*args))
    return out.orderBy("edge")


@register(
    "source_text_lines_roundtrip",
    doc="Raw line-oriented text source — the rawest pretraining-corpus "
    "interchange format (one document per line): documents written via "
    "the text sink (UTF-8 bytes + newline, no quoting/escaping layer), "
    "read back with spark.read.text, and profiled.  The oracle computes "
    "the same profile from the documents table directly, so a match "
    "proves the text encode/decode is byte-lossless for newline-free "
    "docs (the fixture has none; real corpora escape newlines before "
    "this sink, e.g. as JSONL).",
    tags=("source", "text", "llm", "ext"),
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_line_bytes,
       count(DISTINCT md5(text)) AS n_distinct_lines
FROM documents
""",
)
def source_text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    path = _fmt_tmp("docs_text")
    docs.write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.octet_length("value")).alias("total_bytes"),
        F.max(F.octet_length("value")).cast("bigint").alias("max_line_bytes"),
        F.countDistinct(F.md5("value")).alias("n_distinct_lines"),
    )


@register(
    "source_binaryfile_scan",
    doc="binaryFile source — the multimodal ingest front door: a corpus "
    "staged as raw files on the lake is scanned whole-file-per-row "
    "(path, length, content bytes), the shape image/audio/video ingest "
    "uses before the mm_* decode stages.  The documents text is staged "
    "as 4 text part files; the binaryFile scan's byte totals must agree "
    "with the text-side arithmetic (file bytes = Σ doc bytes + one "
    "newline per doc), and the content md5 proves bytes arrive intact.",
    tags=("source", "binary", "multimodal", "ext"),
    oracle="""
SELECT CAST(4 AS BIGINT) AS n_files,
       CAST(sum(octet_length(encode(text)) + 1) AS BIGINT) AS total_file_bytes,
       count(*) AS n_docs
FROM documents
""",
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    path = _fmt_tmp("docs_binfiles")
    docs.repartition(4).write.mode("overwrite").text(path)
    # whole-file-per-row scan (underscore-prefixed commit markers like
    # _SUCCESS are hidden from Spark file listings, so exactly the 4
    # part files appear)
    files = spark.read.format("binaryFile").load(path)
    file_stats = files.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_file_bytes"),
    )
    # cross-check rides the same plan as a broadcast 1-row aggregate:
    # re-reading the files as text must recover every document
    doc_stats = spark.read.text(path).agg(F.count(F.lit(1)).alias("n_docs"))
    return file_stats.crossJoin(F.broadcast(doc_stats)).select(
        "n_files", "total_file_bytes", "n_docs"
    )
