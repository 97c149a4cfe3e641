from networkit_spark.functions import text
