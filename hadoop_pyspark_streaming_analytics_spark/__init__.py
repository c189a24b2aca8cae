"""PySpark-native analytics engine with the capabilities of
``Sharayu1418/hadoop-pyspark-streaming-analytics``, rebuilt Spark-first.

The reference is a five-module big-data analytics project (Hadoop-Streaming
word stats, e-commerce batch analysis with window functions, nested JSON
processing, Structured Streaming over sensor data, and a UDF/join bonus).
This package re-expresses every operator in that surface as idiomatic
PySpark DataFrame / SQL / Structured Streaming plans (see SURVEY.md §2 for
the operator inventory), plus the LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns) required for
100 TB-scale training-data work.

Layout:
    session.py   -- SparkSession factory (AQE, UTC, shuffle sizing)
    sources/     -- readers (explicit schemas) and sinks
    operators/   -- batch operators: cleaning, relational, windows, nested,
                    text, dedup, similarity, quality, multimodal
    functions/   -- scalar function surface (UDF / pandas_udf / builtin twins)
    streaming/   -- Structured Streaming query builders + test harness
    plans/       -- the query catalog binding builders to oracle SQL
"""

__version__ = "0.1.0"
