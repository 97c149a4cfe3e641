"""Deduplication operators over the documents table — exact, MinHash+LSH,
SimHash, and n-gram-Jaccard near-dup detection.

A web-scale training-data pipeline dedups before anything else; these are
first-class operators of the engine (same documents corpus the link graph
comes from). All hot paths are built-in functions (md5 / explode /
groupBy-min / self-join) — JVM-side, no Python UDFs — and every operator
has an exact DuckDB twin in networkit_spark/oracles.py.

Scale design:
- exact dedup: one hash shuffle on md5(text) — the minimum possible.
- MinHash: explode(shingles) is the big intermediate; it is immediately
  hash-aggregated (partial min per partition map-side, then one shuffle on
  (doc_id, seed)). Signature width H=8 keeps the message count H×docs.
- LSH banding: bucket join only materializes candidate pairs, never the
  full n² cross product; hot buckets (boilerplate-heavy corpora) are the
  skew risk — AQE skew-join splitting covers the join, and callers can cap
  bucket width upstream with a count filter.
- SimHash: 16-dim bit aggregation = one shuffle on (doc_id, dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.functions.text import ngrams_df, tokens

MINHASH_SEEDS = 8   # signature length H
LSH_ROWS_PER_BAND = 2  # bands = H / rows


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(text_hash, n_docs, min_doc_id) — exact dedup groups by content
    hash; keep-policy = smallest doc_id (deterministic)."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Documents with exact duplicates removed (keep smallest doc_id)."""
    keep = exact_duplicates(docs).select(F.col("min_doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


def minhash_signatures(docs: DataFrame, n: int = 3, seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(doc_id, seed, minhash) — MinHash over word-n-gram shingle sets.

    h_seed(x) = md5('s{seed}|' + x); the min of a uniform hash over the
    shingle set is the classic MinHash estimator (hex strings order like
    the underlying 128-bit values).
    """
    shingles = ngrams_df(docs, n, distinct=True)
    seed_df = docs.sparkSession.range(seeds).select(F.col("id").cast("int").alias("seed"))
    return (
        shingles.crossJoin(F.broadcast(seed_df))
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(F.concat(F.lit("s"), F.col("seed").cast("string"), F.lit("|"), F.col("ngram")))
            ).alias("minhash")
        )
    )


def lsh_buckets(sigs: DataFrame, rows_per_band: int = LSH_ROWS_PER_BAND) -> DataFrame:
    """(doc_id, band, bucket) — band the signature, hash each band."""
    banded = sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("minhash"))
                    )
                ),
                ",",
            )
        ).alias("bucket")
    )


def lsh_candidate_pairs(docs: DataFrame, n: int = 3, seeds: int = MINHASH_SEEDS,
                        rows_per_band: int = LSH_ROWS_PER_BAND,
                        max_bucket: int = 4096) -> DataFrame:
    """(doc_a, doc_b) distinct candidate near-dup pairs (a < b) — docs
    sharing at least one LSH band bucket.

    Hot-bucket cap (the boilerplate guard): a bucket of B near-identical
    docs — cookie banners, templated pages — would emit B² pairs and
    quadratic-blow one join task. Buckets wider than `max_bucket` are
    salted into ⌈B/max_bucket⌉ sub-buckets (all-pairs only within each),
    and the per-sub-bucket representatives (min doc_id) are starred to
    the bucket representative so the boilerplate cluster stays
    TRANSITIVELY connected for downstream dedup grouping. Under the cap
    the output is byte-identical to the uncapped join; over it, distant
    member pairs are traded for the star spine — linear, not quadratic,
    output per hot bucket."""
    b = lsh_buckets(minhash_signatures(docs, n, seeds), rows_per_band)
    cnt = b.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("width"))
    b = b.join(cnt, ["band", "bucket"])

    def _pairs(members: DataFrame, keys: list[str]) -> DataFrame:
        left = members.select(F.col("doc_id").alias("doc_a"), *keys)
        right = members.select(F.col("doc_id").alias("doc_b"), *keys)
        return (
            left.join(right, keys)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )

    cold = _pairs(b.filter(F.col("width") <= max_bucket), ["band", "bucket"])

    hot = b.filter(F.col("width") > max_bucket).withColumn(
        "sub",
        F.pmod(
            F.xxhash64("doc_id"),
            F.ceil(F.col("width") / max_bucket).cast("long"),
        ),
    )
    hot_pairs = _pairs(hot, ["band", "bucket", "sub"])
    reps = hot.groupBy("band", "bucket", "sub").agg(F.min("doc_id").alias("rep"))
    rep0 = reps.groupBy("band", "bucket").agg(F.min("rep").alias("rep0"))
    spine = (
        reps.join(rep0, ["band", "bucket"])
        .filter(F.col("rep") != F.col("rep0"))
        .select(
            F.least("rep0", "rep").alias("doc_a"),
            F.greatest("rep0", "rep").alias("doc_b"),
        )
    )
    return (
        cold.unionByName(hot_pairs)
        .unionByName(spine)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact word-n-gram Jaccard for the given
    candidate pairs (rounded 6 for stable value hashing)."""
    sh = ngrams_df(docs, n, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "ngram")
    b = sh.select(F.col("doc_id").alias("doc_b"), "ngram")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "ngram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sza") + F.col("szb") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def near_duplicates(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by exact Jaccard
    ≥ threshold. The full MinHash→band→bucket-join→verify pipeline."""
    pairs = lsh_candidate_pairs(docs, n)
    return ngram_jaccard(docs, pairs, n).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, dims: int = 16) -> DataFrame:
    """(doc_id, simhash) — SimHash fingerprint over word unigrams with
    multiplicity; dim j weight = hexval(md5(token)[j]) - 7.5, bit = sign.

    The fingerprint is a {0,1}-string of length `dims` (Hamming distance =
    cheap near-dup metric).
    """
    w = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    hashed = w.select("doc_id", F.md5("tok").alias("h"))
    dims_df = docs.sparkSession.range(dims).select(F.col("id").cast("int").alias("dim"))
    bits = (
        hashed.crossJoin(F.broadcast(dims_df))
        .select(
            "doc_id",
            "dim",
            (
                F.conv(F.substring(F.col("h"), F.col("dim") + 1, 1), 16, 10).cast("double")
                - F.lit(7.5)
            ).alias("wgt"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("wgt").alias("s"))
        .select(
            "doc_id", "dim", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "bit"))), lambda x: x["bit"]
            ),
            "",
        ).alias("simhash")
    )


def simhash_near_duplicates(
    docs: DataFrame,
    dims: int = 16,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — document pairs whose SimHash fingerprints
    differ in at most `max_hamming` bits (a < b).

    Scale design (the standard Manku/Jarvelin web-dedup trick): split the
    fingerprint into `n_bands` contiguous bands; any two fingerprints
    within Hamming distance < n_bands must agree on at least one FULL
    band (pigeonhole), so the candidate set is n_bands equi-joins on
    (band index, band bits) — never an all-pairs product. Candidates are
    then verified exactly with one XOR + popcount on the fingerprints
    (bit_count is whole-stage-codegen'd). Completeness requires
    max_hamming < n_bands, asserted below.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            "banding is only complete for max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    if dims % n_bands != 0:
        raise ValueError("n_bands must divide dims evenly")
    width = dims // n_bands

    sh = simhash(docs, dims).withColumn(
        "sig", F.conv("simhash", 2, 10).cast("long")
    )
    banded = None
    for i in range(n_bands):
        part = sh.select(
            "doc_id",
            "sig",
            F.lit(i).alias("band"),
            F.substring("simhash", i * width + 1, width).alias("key"),
        )
        banded = part if banded is None else banded.unionByName(part)

    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
        "band", "key",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
        "band", "key",
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def dedup_clusters(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """(doc_id, cluster, keep) — the end-to-end dedup DECISION: near-dup
    pairs (MinHash→LSH→Jaccard-verify) become edges of an undirected
    graph over doc ids; connected components merge transitive chains
    (a~b, b~c ⇒ one group even when a,c never shared a bucket); the
    canonical cluster id is the MIN doc_id in the group (hash-min CC's
    fixed point) and keep = (doc_id == cluster) — the deterministic
    keep-one policy a training pipeline filters on.

    Scale: pairs are bucket-bounded (never all-pairs); the CC runs on the
    near-dup graph only, whose components are tiny (dup clusters), so
    hash-min converges in O(log max-cluster-diameter) supersteps. One
    extra shuffle over the pairs — everything upstream is shared with
    near_duplicates.
    """
    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import connected_components

    pairs = near_duplicates(docs, n=n, threshold=threshold)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).withColumn("weight", F.lit(1.0))
    vertices = docs.select(F.col("doc_id").alias("id"))
    g = Graph.from_edges(edges, directed=False, vertices=vertices)
    labels = connected_components(g).labels
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster"),
        (F.col("id") == F.col("label")).alias("keep"),
    )
