"""Sources (SURVEY.md §2.1, S1-S4).

The reference relies on schema *inference* for its batch CSV/JSON scans
(reference: q2_ecommerce_analysis.py:38-43, q3_json_processing.py:25-30) —
an extra full pass over the data that is unaffordable at 100 TB and
nondeterministic under dirty rows.  Every reader here takes an explicit
``StructType``; inference is opt-in for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Pin the runtime SQL confs the engine's semantics depend on, so query
    builders behave identically under ANY caller-provided session (the
    driver constructs its own):

    - nanosAsLong: the testdata's events.ts is parquet TIMESTAMP(NANOS),
      which Spark otherwise refuses to scan;
    - UTC session timezone: timestamp values must collect as the same wall
      times the DuckDB oracle sees (SURVEY.md §7 timezone-offset hazard).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — session.py's defaults already cover it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver testdata table (TESTDATA.md).

    Parquet + explicit column selection downstream gives Catalyst predicate
    pushdown and column pruning for free — ``.explain`` must show
    ``PushedFilters`` / a narrowed ``ReadSchema`` on the 100 TB path.
    """
    _ensure_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with a true TIMESTAMP ``ts``.

    The driver's parquet has shipped two flavors of ``ts`` across rounds:
    TIMESTAMP(NANOS) (read as nanos-long under
    ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ).  Both are normalized
    here to a session-timezone TIMESTAMP: the session is pinned to UTC
    (_ensure_runtime_confs), so the NTZ→LTZ cast preserves the wall-clock
    values the DuckDB oracle sees, and every downstream operator
    (``unix_micros``, ``window``, RANGE frames) gets the one type it
    expects.
    """
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


# --- S1: retail transactions CSV (reference: q2_ecommerce_analysis.py:38-43) ---

RETAIL_SCHEMA = T.StructType(
    [
        T.StructField("InvoiceNo", T.StringType()),
        T.StructField("StockCode", T.StringType()),
        T.StructField("Description", T.StringType()),
        T.StructField("Quantity", T.IntegerType()),
        T.StructField("InvoiceDate", T.StringType()),
        T.StructField("UnitPrice", T.DoubleType()),
        T.StructField("CustomerID", T.LongType()),
        T.StructField("Country", T.StringType()),
    ]
)


def read_retail_csv(spark: SparkSession, path: str, infer: bool = False) -> DataFrame:
    """CSV scan with header (S1). Explicit schema by default; PERMISSIVE mode
    keeps malformed rows as nulls for the cleaning pipeline to drop
    (the reference's dirty-data contract, q2_ecommerce_analysis.py:49-61)."""
    reader = spark.read.option("header", True).option("mode", "PERMISSIVE")
    if infer:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(RETAIL_SCHEMA)
    return reader.csv(path)


# --- S2: nested orders JSON-lines (reference: q3_json_processing.py:25-30) ---

ORDERS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("order_date", T.StringType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField(
            "products",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("price", T.DoubleType()),
                        T.StructField("product_id", T.StringType()),
                        T.StructField("quantity", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def read_orders_json(
    spark: SparkSession,
    path: str,
    infer: bool = False,
    capture_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines scan (S2), multiLine=False — one order document per line.

    ``capture_corrupt`` is the X5 malformed-line contract for JSON (the
    CSV path does it via PERMISSIVE): instead of silently nulling bad
    lines, PERMISSIVE mode routes each unparseable line's raw text into a
    ``_corrupt_record`` column so a pipeline can count/quarantine them —
    at 100 TB "0.3% of lines failed to parse" must be an observable fact,
    not a silent row-count drift.

    Spark restriction: a query that references ONLY ``_corrupt_record``
    (e.g. ``df.filter(col("_corrupt_record").isNotNull()).count()``)
    raises AnalysisException on a raw JSON scan — ``cache()`` the frame
    (or select a data column alongside) before the quarantine filter, as
    the Spark SQL migration guide prescribes."""
    reader = spark.read.option("multiLine", False)
    if capture_corrupt:
        schema = T.StructType(
            ORDERS_JSON_SCHEMA.fields
            + [T.StructField("_corrupt_record", T.StringType())]
        )
        return (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .schema(schema)
            .json(path)
        )
    if not infer:
        reader = reader.schema(ORDERS_JSON_SCHEMA)
    return reader.json(path)


# --- S3: streaming sensor JSON file source (reference: q4_streaming.ipynb cell-1 lines 32-42) ---

SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), nullable=False),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("timestamp", T.StringType()),
    ]
)


def read_sensor_stream(
    spark: SparkSession, watch_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming JSON file source over a watched directory (S3).

    ``maxFilesPerTrigger`` bounds micro-batch size — at scale an unbounded
    file source can pull an arbitrarily large batch and blow state in one
    trigger.
    """
    reader = spark.readStream.schema(SENSOR_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(watch_dir)


def read_rate_stream(
    spark: SparkSession, rows_per_batch: int = 100, start_ts_ms: int = 0
) -> DataFrame:
    """Deterministic synthetic stream (``rate-micro-batch``): every trigger
    emits exactly ``rows_per_batch`` rows with consecutive ``value`` longs —
    load/soak testing without a watched directory, and fully reproducible
    (unlike the wall-clock ``rate`` source).  Batch k carries values
    [k*rows_per_batch, (k+1)*rows_per_batch)."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", start_ts_ms)
        .load()
    )


# --- S4: text-line source (reference: q1_mapper.py:43-46 reads stdin) ---


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text line source (S4): one row per line, column ``value``."""
    return spark.read.text(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (vectorized; pushdown/pruning like parquet — Spark's
    native ORC reader honors ``spark.sql.orc.filterPushdown``)."""
    _ensure_runtime_confs(spark)
    return spark.read.orc(path)
