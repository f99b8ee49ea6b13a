"""Vectorized pandas/Arrow UDFs + built-in-function compositions.

Rule of the house: anything expressible with ``pyspark.sql.functions``
stays JVM-side (whole-stage codegen); Python appears only where Spark has
no built-in (HTML parsing, image codecs, pseudo-embeddings) and then only
as Arrow-batched pandas UDFs — never row-at-a-time Python UDFs.
"""
