"""Native pyspark.sql column programs — the JVM-side (whole-stage codegen) hot
path. Anything expressible here must NOT be a Python UDF."""
