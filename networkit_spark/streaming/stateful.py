"""Custom stateful streaming operators via applyInPandasWithState.

Two operators a web-scale ingest pipeline keeps on the stream side
(alongside streaming/edge_stream.py's windowed aggs + foreachBatch CC):

- streaming_dedup_first_seen: per-content-hash KEEP-FIRST dedup over an
  unbounded document stream — the streaming twin of
  operators/dedup.dedup_exact. State per distinct md5(text): the kept
  doc_id + a duplicate counter. A document row is emitted exactly once,
  the first time its hash appears across ALL micro-batches.
- streaming_running_degrees: per-vertex cumulative degree over an edge
  stream (the stream-side accessor behind dynamic top-degree monitors).
  State per vertex: its running degree; each batch APPENDS the new
  totals for touched vertices (append mode — every emitted row is new;
  readers take the latest row per vertex).

Scale notes: state is one tiny row per distinct key, hash-partitioned by
Spark's state store; at 100 TB turn on the RocksDB state store provider
and (for dedup) a GroupStateTimeout if the retention contract allows
forgetting old hashes. The kernels are Arrow-batched pandas (no per-row
Python in the plan — one vectorized pass per group batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "text_hash string, doc_id long, n_dups long"
DEDUP_STATE_SCHEMA = "kept_doc long, dups long"

DEG_OUT_SCHEMA = "id long, degree long"
DEG_STATE_SCHEMA = "degree long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n_new = len(rows)
    if state.exists:
        kept, dups = state.get
        state.update((int(kept), int(dups) + n_new))
        return iter(())  # hash already kept — emit nothing
    kept = int(rows["doc_id"].min())  # deterministic keep policy: min id
    state.update((kept, n_new - 1))
    return iter(
        [pd.DataFrame({"text_hash": [key[0]], "doc_id": [kept],
                       "n_dups": [n_new - 1]})]
    )


def streaming_dedup_first_seen(docs: DataFrame) -> DataFrame:
    """(text_hash, doc_id, n_dups) — one output row per DISTINCT text,
    emitted the first micro-batch that text appears in; doc_id = the
    kept document (min id inside that batch, exactly-first across
    batches). Input: streaming (doc_id long, text string)."""
    keyed = docs.select(F.md5("text").alias("text_hash"), "doc_id")
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _degree_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(p) for p in pdfs)
    total = (state.get[0] if state.exists else 0) + n
    state.update((int(total),))
    return iter([pd.DataFrame({"id": [key[0]], "degree": [total]})])


def streaming_running_degrees(edges: DataFrame) -> DataFrame:
    """(id, degree) — cumulative UNDIRECTED degree per vertex over a
    streaming edge table (src long, dst long); each batch emits the new
    totals for vertices it touched."""
    ends = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    )
    return ends.groupBy("id").applyInPandasWithState(
        _degree_fn,
        outputStructType=DEG_OUT_SCHEMA,
        stateStructType=DEG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
