"""Spark DataFrame operators: compositions of native columnar expressions
plus vectorized pandas UDF wrappers around the pure functions package."""
