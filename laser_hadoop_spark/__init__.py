"""laser_hadoop_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system (statgen/LASER-Hadoop, a
Hadoop-MapReduce preprocessing/orchestration tier; see SURVEY.md) as an
idiomatic Spark DataFrame engine, extended with the operators a
large-scale (100 TB design point) training-data pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, multimodal binary columns, and text analysis.

Layout:
    session.py    — SparkSession factory (AQE, Arrow, UTC defaults)
    registry.py   — query registry backing __spark_entry__.py
    tables.py     — parquet table loaders for the test star schema
    queries/      — declared correctness queries (SURVEY.md §2) + oracles
    operators/    — reusable engine operators (joins, dedup, text, ...)
    sources/      — readers (seq/site/VCF/TSV/JSONL), sinks, SFTP ingest
    functions/    — column-expression helpers
    plans/        — validation gates + pipeline composition (LASER/TRACE)
    streaming/    — Structured Streaming operators
"""

__version__ = "0.1.0"
