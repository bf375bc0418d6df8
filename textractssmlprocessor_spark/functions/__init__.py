"""Pure-Python reference semantics.

Every function here is deterministic, side-effect free, and importable
without Spark — the same code is unit-tested in-process and wrapped into
vectorized pandas UDFs by ``textractssmlprocessor_spark.operators.udfs``.
"""
