"""Column-expression and vectorized-UDF building blocks.

Everything here is either a native ``pyspark.sql.functions`` expression
(JVM-side, whole-stage-codegen-able) or an Arrow-batched pandas UDF —
never per-row Python (input_hint contract).
"""
