"""Common-Crawl-style pages ingest: pages(url, warc_ts, html, text, lang)
→ link edges, per BASELINE.json input_hint.

Three pieces:

1. reference_extract(html) — the FROZEN single-row pure-Python extractor
   (FIXTURES.md §1). The per-row invariant vs the distributed path is
   byte-identity of the extracted text per url. NetworKit itself has no
   HTML extractor (its ingest starts at edge lists — SURVEY.md §2.1), so
   this frozen function IS the reference for the extraction stage.
2. extract_links / extract_text — the distributed extractor: Arrow-batched
   mapInPandas over the pages table, implemented with vectorized pandas
   .str regex kernels (C-level row loops, no per-row Python), asserted
   byte-identical to reference_extract in tests/test_pages.py.
3. generate_pages / pages_to_graph — deterministic seeded corpus generator
   (planted out-links define the graph) and the pages → edge-table →
   Graph pipeline with xxhash64(url) ids.

Scale design: the html:binary column never flows past the extraction
stage — extract once, project (src_url, dst_url), hash to longs, write
the edge table partitioned by src; the graph jobs only ever read the
narrow edge table (SURVEY.md §4: "never drag html:binary through the
graph jobs").
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_ANCHOR_RE = re.compile(r'<a href="([^"]*)">(.*?)</a>', re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)


# ---------------------------------------------------------------- reference
def reference_extract(html: bytes) -> tuple[list[str], str]:
    """FROZEN single-row extractor: (out-link hrefs in document order,
    extracted text). Text = title, anchor texts, paragraph texts joined
    with '\\n'. Bytes are decoded utf-8 strict — no lossy normalization."""
    s = html.decode("utf-8", errors="strict")
    title = _TITLE_RE.findall(s)
    anchors = _ANCHOR_RE.findall(s)
    paras = _PARA_RE.findall(s)
    links = [href for href, _ in anchors]
    text = "\n".join(title + [t for _, t in anchors] + paras)
    return links, text


# -------------------------------------------------------------- distributed
def _decode(series: pd.Series) -> pd.Series:
    return series.map(lambda b: b.decode("utf-8", errors="strict"))


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) — one row per out-link, document order preserved
    within a page. Arrow-batched; pandas .str.extractall is the kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            s = _decode(pdf["html"])
            hits = s.str.extractall(_ANCHOR_RE)  # index = (row, match)
            if len(hits) == 0:
                yield pd.DataFrame({"src_url": pd.Series(dtype="object"),
                                    "dst_url": pd.Series(dtype="object")})
                continue
            src = pdf["url"].iloc[hits.index.get_level_values(0)].to_numpy()
            yield pd.DataFrame({"src_url": src, "dst_url": hits[0].to_numpy()})

    return pages.select("url", "html").mapInPandas(
        batches, schema="src_url string, dst_url string"
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, text) — byte-identical to reference_extract per url."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            s = _decode(pdf["html"])
            title = s.str.extractall(_TITLE_RE)[0].groupby(level=0).agg("\n".join)
            parts = [
                p.reindex(s.index)
                for p in (
                    title,
                    s.str.extractall(_ANCHOR_RE)[1].groupby(level=0).agg("\n".join),
                    s.str.extractall(_PARA_RE)[0].groupby(level=0).agg("\n".join),
                )
            ]
            # vectorized join of the present parts with '\n' (byte-identical
            # to "\n".join(non-null parts) — asserted vs reference_extract
            # in tests/test_pages.py); no per-row Python lambda.
            text = pd.Series("", index=s.index, dtype=object)
            started = np.zeros(len(s), dtype=bool)
            for part in parts:
                has = part.notna().to_numpy()
                sep = np.where(started & has, "\n", "")
                text = text + pd.Series(sep, index=s.index) + part.fillna("")
                started |= has
            yield pd.DataFrame({"url": pdf["url"], "text": text})

    return pages.select("url", "html").mapInPandas(batches, schema="url string, text string")


# ---------------------------------------------------------------- generator
def generate_pages(
    spark: SparkSession,
    n_pages: int,
    out_links: int = 3,
    seed: int = 42,
    n_langs: int = 1,
) -> DataFrame:
    """Deterministic synthetic pages corpus (FIXTURES.md §1). Page i links
    to pages hash(seed, i, j) % n for j < out_links (self-links dropped).
    Entirely column expressions — the corpus is generated distributed and
    never materialized on the driver."""
    pages = spark.range(n_pages).select(F.col("id").alias("pid"))
    url = F.concat(
        F.lit("https://site"),
        (F.col("pid") % 97).cast("string"),
        F.lit(".example/page"),
        F.col("pid").cast("string"),
    )

    if out_links > 0:
        # NB: F.sequence(0, k) with k < 0 yields a DESCENDING sequence, not
        # an empty array — guard the zero-out-links case explicitly.
        targets = F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(out_links - 1)),
                lambda j: F.abs(F.xxhash64(F.lit(seed), F.col("pid"), j)) % n_pages,
            ),
            lambda t: t != F.col("pid"),
        )
    else:
        targets = F.array().cast("array<bigint>")
    anchors = F.aggregate(
        targets,
        F.lit(""),
        lambda acc, t: F.concat(
            acc,
            F.lit('<a href="https://site'),
            (t % 97).cast("string"),
            F.lit(".example/page"),
            t.cast("string"),
            F.lit('">anchor '),
            t.cast("string"),
            F.lit("</a>"),
        ),
    )
    filler = F.concat(
        F.lit("<p>filler words number "),
        (F.abs(F.xxhash64(F.lit(seed + 1), F.col("pid"))) % 1000).cast("string"),
        F.lit(" for page "),
        F.col("pid").cast("string"),
        F.lit("</p>"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>t"),
        F.col("pid").cast("string"),
        F.lit("</title></head><body>"),
        anchors,
        filler,
        F.lit("</body></html>"),
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "zh"][:n_langs]]),
        (F.abs(F.xxhash64(F.lit(seed + 2), F.col("pid"))) % n_langs + 1).cast("int"),
    )
    raw = pages.select(
        url.alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=F.col("pid").cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        lang.alias("lang"),
    )
    # text column = distributed extraction of html (byte-identical to the
    # frozen reference extractor by construction; asserted in tests).
    txt = extract_text(raw)
    return raw.join(txt, "url").select("url", "warc_ts", "html", "text", "lang")


def pages_to_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, weight) with xxhash64(url) ids — the ingest pipeline's
    output; dedup keeps one arc per (page, target)."""
    links = extract_links(pages)
    return (
        links.select(
            F.xxhash64("src_url").alias("src"), F.xxhash64("dst_url").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


def url_id_map(pages: DataFrame) -> DataFrame:
    """(url, id) — the id dictionary; tests assert no xxhash64 collisions
    (distinct ids == distinct urls, SURVEY.md §7 hard part 6)."""
    return pages.select("url", F.xxhash64("url").alias("id")).distinct()
