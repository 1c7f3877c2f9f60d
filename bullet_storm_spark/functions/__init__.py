"""Scalar function helpers shared by queries: JSON access, text analysis,
vector math. All built on pyspark.sql.functions (JVM-side) — Python UDFs
appear only where explicitly documented (multimodal decode)."""
