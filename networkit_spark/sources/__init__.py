from networkit_spark.sources.tables import load_table, derive_web_edges, GRAPH_MODULUS
