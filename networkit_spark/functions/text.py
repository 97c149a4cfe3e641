"""Text-analysis column functions for the documents table — the
training-data-pipeline side of the engine (language ID, quality scoring,
token counting, fingerprinting).

Everything here is built-in pyspark.sql.functions only (JVM-side,
whole-stage-codegen) — no Python UDFs; the hot path at 100 TB is a single
projection over the scan. Every function has an exact DuckDB-SQL twin in
networkit_spark/oracles.py; the Spark/SQL pair is held identical down to
hash function (md5 → lowercase hex in both engines) so results value-hash
equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tokenization: documents.text is single-space separated lowercase words.
# Keep the rule trivially identical across engines: split on single space.
def tokens(text: Column) -> Column:
    return F.split(text, " ")


def word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams; caller guards size >= n."""
    # transform over 1..size-n+1 (1-based like DuckDB list indexing)
    return F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + k) for k in range(n)]),
    )


def ngrams_df(docs: DataFrame, n: int, distinct: bool = True) -> DataFrame:
    """(doc_id, ngram) exploded; docs with < n tokens contribute nothing
    (set semantics when distinct=True — shingle sets for MinHash/Jaccard)."""
    w = docs.select("doc_id", tokens(F.col("text")).alias("w")).filter(
        F.size("w") >= n
    )
    out = w.select("doc_id", F.explode(word_ngrams(F.col("w"), n)).alias("ngram"))
    return out.dropDuplicates(["doc_id", "ngram"]) if distinct else out


STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "das"),
    "fr": ("le", "les", "et"),
    "zh": ("de5", "shi4", "le5"),  # pinyin-ish markers for the synthetic corpus
}


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars, bpe_est) — token
    counting incl. a BPE-ish estimate (≈ 1 token / 4 chars, the standard
    heuristic)."""
    w = docs.select("doc_id", F.col("text"), tokens(F.col("text")).alias("w"))
    return w.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, stopword_ratio, type_token_ratio,
    quality) — length/stopword/diversity quality heuristics (rounded to 6
    so the FP value-hash is stable across engines)."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    w = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    base = w.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        (
            F.aggregate(
                F.transform(F.col("w"), lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size("w")
        ).alias("mean_len"),
        (
            F.size(F.filter(F.col("w"), lambda t: F.array_contains(sw, t)))
            / F.size("w")
        ).alias("sw_ratio"),
        (F.size(F.array_distinct("w")) / F.size("w")).alias("tt_ratio"),
    )
    quality = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.col("sw_ratio") * 0.3
        + F.col("tt_ratio") * 0.3
    )
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_len", 6).alias("mean_token_len"),
        F.round("sw_ratio", 6).alias("stopword_ratio"),
        F.round("tt_ratio", 6).alias("type_token_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-token voting with deterministic
    tie-break (max votes, then lexicographically smallest lang)."""
    w = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    scored = None
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        s = w.select(
            "doc_id",
            F.lit(lang).alias("lang"),
            F.size(F.filter(F.col("w"), lambda t: F.array_contains(marr, t)))
            .cast("long")
            .alias("votes"),
        )
        scored = s if scored is None else scored.unionByName(s)
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("votes"), F.asc("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter("rn = 1")
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )


def fingerprints(docs: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, fingerprint) — document fingerprint = min md5 over word
    n-gram shingles (winnowing-style content hash; whole-doc md5 when the
    doc has < n tokens)."""
    w = docs.select("doc_id", F.col("text"), tokens(F.col("text")).alias("w"))
    shingled = w.filter(F.size("w") >= n).select(
        "doc_id", F.explode(word_ngrams(F.col("w"), n)).alias("ngram")
    )
    mins = shingled.groupBy("doc_id").agg(F.min(F.md5(F.col("ngram"))).alias("fingerprint"))
    short = w.filter(F.size("w") < n).select("doc_id", F.md5("text").alias("fingerprint"))
    return mins.unionByName(short)
