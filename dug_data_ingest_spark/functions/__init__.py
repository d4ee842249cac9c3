"""Column-expression function libraries: scalar text analysis and
vector math. Everything here is pure pyspark.sql.functions composition
(JVM-side, codegen'd) — no Python UDFs in the hot path.
"""
