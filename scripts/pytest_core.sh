#!/usr/bin/env bash
# Core-algorithm pytest subset — the high-signal gate that fits a
# ~10-minute review budget (the FULL suite, `python -m pytest tests/ -q`,
# is Spark-session-heavy and runs ~50 min on this host; the driver's
# 139-query oracle gate in scripts/check_parity.py is the other
# independent full-surface signal).
#
# Covers the four north-star algorithms (PageRank, connected components,
# PLP, triangles), the pages ingest byte-identity contract, the plan
# regression locks, and one representative from each adjacent family
# (community, matching, dedup/ANN, IO).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest -x -q \
  tests/test_pagerank.py \
  tests/test_components.py \
  tests/test_labelprop.py \
  tests/test_triangles.py \
  tests/test_pages.py \
  tests/test_plans.py \
  tests/test_plm.py \
  tests/test_similarity.py \
  tests/test_dedup_text.py \
  tests/test_edgelist.py \
  "$@"
