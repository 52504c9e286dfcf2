"""crawl4ai_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the query & data-processing capabilities of the reference
(parakastha/crawl4ai, see /root/repo/SURVEY.md) as idiomatic Spark:
DataFrame/SQL logical plans, vectorized pandas/Arrow UDFs where built-ins
cannot express the semantics, batch crawl rounds with snapshot-committed
(Iceberg-style) state for exact resume.

Nothing here is a port: the reference is an asyncio/Playwright wrapper;
this engine is a distributed URL-frontier + fetch scheduler + document
processing pipeline designed for 10^10-URL / 100 TB scale.
"""

__version__ = "0.1.0"
