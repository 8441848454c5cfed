"""Column-level function library (JVM-side expressions preferred).

Everything here returns pyspark Column expressions built from
pyspark.sql.functions, so they stay inside whole-stage codegen; pandas UDFs
appear only where an expression genuinely can't be composed (and are Arrow
batched, never row-at-a-time).
"""

from shuttle_spark.functions import text, vectors  # noqa: F401
