"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Beyond-reference surface (SURVEY.md §7 step 10) for training-data pipelines.

Scale design:
- **Exact dedup** is a hash-groupBy on the normalized-text digest: one shuffle
  keyed by a 128-bit md5, no skew (uniform hash keys), no driver state.
- **MinHash-LSH** avoids the O(n²) pair space: shingles → K min-hash values →
  B bands; candidate pairs come from a self-join *within LSH buckets only*.
  At 100 TB the bucket join is the only shuffle-heavy step and its fan-out is
  controlled by (K, B) — identical to the standard MinHash-LSH formulation.
- **SimHash** produces a 64-bit fingerprint per doc; near-dup candidates are
  banded on 16-bit chunks the same way.
- All hashing is md5-derived so results are reproducible across engines and
  runs (no seed-per-partition nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition on the doc key before CPU-heavy per-row expressions.

    Small inputs arrive as one file split (one task); the shingle/hash work
    is compute-bound, so spread it across the cluster. At 100 TB the scan
    already yields thousands of splits and AQE coalesces this no-op away.
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)


def exact_dedup_keys(df: DataFrame, doc_id: str, text: str) -> DataFrame:
    """Group exact duplicates by normalized-text digest.

    Returns one row per distinct content: (dedup_key, keep_id = min doc_id,
    dup_count). Survivors = join back on keep_id; at scale this is a single
    shuffle on the digest.
    """
    keyed = df.select(
        F.col(doc_id).alias("doc_id"),
        F.md5(normalize_text(F.col(text))).alias("dedup_key"),
    )
    return keyed.groupBy("dedup_key").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").cast("long").alias("dup_count"),
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) from normalized text.

    Built with ``split`` + ``transform`` over index ``sequence`` — no UDF.
    Documents shorter than ``n`` tokens contribute their full token string.
    """
    toks = F.split(normalize_text(text), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - F.lit(1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(df: DataFrame, doc_id: str, text: str, num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(doc_id, sig: array<string>) MinHash signature per document.

    Hash family h_i(s) = md5(i || ':' || s); the min is taken lexicographically
    over hex digests — a valid min-wise family, and byte-stable across engines.
    Computed by exploding shingles once and aggregating K mins in one pass
    (map-side combine; shuffle keyed by doc_id).
    """
    sh = _spread(df, doc_id).select(
        F.col(doc_id).alias("doc_id"),
        F.explode(shingles(F.col(text), shingle_n)).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Bucket key = md5(band_index || band slice of the signature). Self-join is
    per-bucket (equi-join on the bucket hash), so cost is Σ bucket_size² —
    bounded by tuning (bands, rows_per_band), never a global cross join.
    """
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(str(b)),
                            *[
                                F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(b, on="bucket")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_similarity(sh_a: Column, sh_b: Column) -> Column:
    """Exact n-gram Jaccard between two shingle arrays (verification step)."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def near_dup_pairs(
    df: DataFrame,
    doc_id: str,
    text: str,
    threshold: float = 0.7,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold.

    The classic two-phase shape: cheap recall via LSH buckets, exact precision
    via shingle-set Jaccard on candidates only.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, doc_id, text, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sig, bands, rows_per_band)
    sh = df.select(
        F.col(doc_id).alias("doc_id"), shingles(F.col(text), shingle_n).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("jaccard", jaccard_similarity(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_table(df: DataFrame, doc_id: str, text: str, bits: int = 32, shingle_n: int = 2) -> DataFrame:
    """(doc_id, simhash) via explode + bit-majority aggregation.

    Explodes shingles once, extracts ``bits`` bits from each shingle's md5,
    and takes the per-bit majority with one groupBy — the scalable formulation
    (shuffle keyed by doc_id, map-side partial sums).
    """
    sh = _spread(df, doc_id).select(
        F.col(doc_id).alias("doc_id"),
        F.explode(shingles(F.col(text), shingle_n)).alias("shingle"),
    )
    hx = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    votes = sh.select(
        "doc_id",
        *[
            F.when(F.shiftright(hx, i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{i}")
            for i in range(bits)
        ],
    )
    maj = votes.groupBy("doc_id").agg(
        *[F.sum(F.col(f"b{i}")).alias(f"b{i}") for i in range(bits)]
    )
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc + F.when(F.col(f"b{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(0)
    return maj.select("doc_id", acc.alias("simhash"))
