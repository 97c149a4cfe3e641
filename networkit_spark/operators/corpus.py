"""Corpus-level training-data operators: cross-corpus decontamination
and TF-IDF term scoring.

Decontamination is the standard pretraining hygiene step (drop training
documents sharing any long word-n-gram with an evaluation set). Spark
shape: shingle both corpora with the SAME n-gram rule the dedup suite
uses (functions/text.ngrams_df — set semantics), reduce the eval side
to a DISTINCT shingle dictionary, and count matches per training doc.
The eval dictionary is broadcast (eval corpora are benchmark-sized —
thousands of docs); when it outgrows the broadcast threshold the same
plan degrades gracefully to a shuffle hash join, and a bloom-filter
pre-pass on the train side is the 100 TB refinement (noted, not needed
at bench scale). The train-side shingle explosion is the identical
intermediate MinHash already pays — one explode + one join + one
aggregation, no Python.

TF-IDF: tf per (doc, term) and df per term from ONE tokenize-explode
pass, idf = ln(N/df), score rounded to 9 decimals BEFORE the per-doc
top-k rank so float ulp differences can never reorder the cross-engine
tie-break (score desc, term asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.functions.text import ngrams_df, tokens


def decontaminate(
    train_docs: DataFrame, eval_docs: DataFrame, n: int = 5
) -> DataFrame:
    """(doc_id, n_shared) for every CONTAMINATED training document —
    one sharing at least one distinct word-n-gram with any eval doc.
    Documents shorter than n tokens are never contaminated (no
    shingles), matching the dedup suite's shingle rule."""
    tr = ngrams_df(train_docs, n)
    ev = ngrams_df(eval_docs, n).select("ngram").distinct()
    return (
        tr.join(F.broadcast(ev), "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def tf_idf(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """(doc_id, term, score) — top_k highest-TF-IDF terms per document,
    score = tf · ln(N / df) rounded to 9 decimals, ties toward the
    lexicographically smaller term. One explode feeds both the tf and
    df aggregations; the per-doc rank window is bounded by document
    vocabulary (never a global sort)."""
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("doc_id", "term", "score")
    )


PACK_SCHEMA = "doc_id long, shard int, bin long, n_tokens long"


def pack_sequences(
    docs: DataFrame, capacity: int, shards: int = 8
) -> DataFrame:
    """(doc_id, shard, bin, n_tokens) — next-fit sequence packing of
    documents into fixed token-capacity bins, the training-data step
    that turns a shuffled corpus into dense context windows.

    Packing is inherently sequential, so the distributed contract is
    per-shard: every document lands in shard = doc_id % shards (the
    deterministic analog of the random shard a shuffled corpus gives
    each worker), and each shard packs ITS documents next-fit in doc_id
    order — open a new bin when the current one cannot fit the next
    document; oversize documents (> capacity) get a bin of their own.
    Shards pack independently and in parallel, which is exactly how a
    1000-worker pipeline packs 100 TB: no cross-shard coordination, and
    the per-shard loop touches only (doc_id, n_tokens) — token counts
    are computed JVM-side BEFORE the shuffle so document text never
    crosses the wire.

    Bin ids are globally unique: shard * 2^40 + per-shard bin index.
    """
    import pandas as pd

    with_tok = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).cast("int").alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        bins, used, cur = [], 0, 0
        for tok in pdf["n_tokens"]:
            t = int(tok)
            if cur == 0 or used + t > capacity:
                cur += 1
                used = t
            else:
                used += t
            bins.append((shard << 40) + cur)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin", "n_tokens"]]

    return with_tok.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
