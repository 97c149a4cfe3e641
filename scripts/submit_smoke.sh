#!/usr/bin/env bash
# spark-submit --py-files end-to-end smoke: packages the engine as a zip
# and runs a PageRank job through spark-submit, exactly as a cluster
# deployment would (north rule: "launched via spark-submit --py-files on
# multi-executor clusters"). On a real cluster swap --master for
# yarn/k8s and point --py-files at the artifact store.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT

(cd "$REPO" && zip -qr "$TMP/networkit_spark.zip" networkit_spark)

cat > "$TMP/job.py" <<'PY'
import sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.appName("submit_smoke")
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())
from networkit_spark.generators import rmat
from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import NO_SINK_HANDLING, pagerank_fixed

edges = rmat(spark, scale=10, edge_factor=4).dropDuplicates(["src", "dst"])
g = Graph.from_edges(edges, directed=True)
scores = pagerank_fixed(g, n_iter=3, distribute_sinks=NO_SINK_HANDLING,
                        checkpoint_every=3)
top = scores.orderBy(scores.score.desc()).limit(3).collect()
total = scores.count()
print(f"SUBMIT_SMOKE_OK vertices={total} top={[(r['id'], round(r['score'], 6)) for r in top]}")
spark.stop()
PY

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
"$SPARK_SUBMIT" \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --py-files "$TMP/networkit_spark.zip" \
  --conf spark.ui.enabled=false \
  "$TMP/job.py"
