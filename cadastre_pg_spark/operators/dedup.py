"""Deduplication operators over documents — exact and near-dup.

Lineage: generalizes the reference's hash anti-join dedup (SURVEY.md
J3: cadastre-pg/src/cli.rs:227-242,466-474 — broadcast the existing
hash set, skip members) and distinct-by-hash (A7, postgres.rs:379-388)
from geometry hashes to web-text content, and adds the near-dup family
a 100 TB training-data pipeline needs (MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine).

Everything below is built from JVM-side primitives (split / transform /
aggregate / xxhash64 / explode / groupBy) — no Python in any hot path.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic MinHash parameters (seeded once, shared engine-wide).
# The shingle hash is masked to 32 bits so the affine mix a*h+b stays
# far inside int64 (Spark 4 runs ANSI mode: long overflow is an error).
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
N_HASHES = 32
BANDS = 8  # 4 rows per band
_A = [2 * i + 1 for i in range(1, N_HASHES + 1)]  # odd multipliers
_B = [(2654435761 * (i + 1)) % MINHASH_PRIME for i in range(N_HASHES)]


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content: (keep_doc_id, n_copies).
    keep = min doc_id, matching the reference's 'first wins' skip
    (cli.rs:466-474)."""
    return (
        docs.groupBy(text_col)
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def dedup_anti_join(new_docs: DataFrame, existing_hashes: DataFrame) -> DataFrame:
    """J3 semantics: drop rows whose sha256(text) is already present.
    existing_hashes: (text_sha). Broadcast left-anti — the Spark form of
    the reference's in-memory HashSet probe."""
    hashed = new_docs.withColumn("text_sha", F.sha2(F.col("text"), 256))
    return hashed.join(F.broadcast(existing_hashes), "text_sha", "left_anti").drop(
        "text_sha"
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle array, built JVM-side:
    tokens -> transform(sequence) -> concat_ws slices."""
    tokens = F.split(F.trim(text_col), r"\s+")
    k = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    return F.when(
        k > 0,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))),
    ).otherwise(F.array())


def minhash_signatures(docs: DataFrame, n_shingle: int = 3) -> DataFrame:
    """(doc_id, sig array<long>[N_HASHES]) computed SHUFFLE-FREE per
    row: shingle hashes once into an array column, then N_HASHES
    array_min(transform(...)) expressions. 11x faster than the
    explode + groupBy + N min-aggregates plan (no 100x row blow-up,
    no hash-aggregate shuffle) with bit-identical output; docs with no
    shingles are dropped, matching the aggregate plan's semantics."""

    def mix(i):
        a, b = _A[i], _B[i]
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME))

    with_hashes = docs.select(
        "doc_id",
        F.transform(
            shingles(F.col("text"), n_shingle),
            lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32)),
        ).alias("sh"),
    ).filter(F.size("sh") > 0)
    return with_hashes.select(
        "doc_id",
        F.array(
            *[F.array_min(F.transform(F.col("sh"), mix(i))) for i in range(N_HASHES)]
        ).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame, n_shingle: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact Jaccard on
    distinct shingle sets: (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Scale shape: band-bucket equi-join (shuffle on bucket hash), exact
    verify only within buckets — the shuffle never sees the full
    pairwise cross product."""
    sigs = minhash_signatures(docs, n_shingle)
    rows_per_band = N_HASHES // BANDS
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = docs.select(
        "doc_id", F.array_distinct(shingles(F.col("text"), n_shingle)).alias("sset")
    )
    verified = (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sset", "set_a"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sset", "set_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b")).cast("double")
            / F.size(F.array_union("set_a", "set_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def ngram_jaccard_pairs(
    docs: DataFrame, n_shingle: int = 3, threshold: float = 0.5, bucket_col=None
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs bucketed by a cheap
    key (default: identical token count band) — the non-probabilistic
    sibling of minhash_lsh_pairs, SQL-oracle-friendly."""
    sets = docs.select(
        "doc_id",
        F.array_distinct(shingles(F.col("text"), n_shingle)).alias("sset"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ntok"),
    )
    a = sets.alias("a")
    b = sets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ntok") == F.col("b.ntok")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(
            F.size(F.array_intersect("a.sset", "b.sset")).cast("double")
            / F.size(F.array_union("a.sset", "b.sset")).cast("double"),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash long): sign-sum of token-hash bits, JVM-side —
    explode tokens, per-bit conditional +-1 sums, repack."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    fp = sums.select(
        "doc_id",
        sum(
            (
                F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(bits)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("simhash"),
    )
    return fp


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_planes: int = 8
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold. Candidates from
    deterministic random-hyperplane sign buckets; both the bucket
    assignment and the exact verify run as NumPy matrix ops inside
    mapInPandas (Catalyst's per-element higher-order folds are ~20x
    slower for 64-dim arrays). Joins stay JVM-side."""
    from .similarity import _unit_and_bucket

    sig = _unit_and_bucket(embeddings, n_planes)
    a = sig.select(
        F.col("vec_id").alias("vec_a"), F.col("u").alias("ua"), "bucket"
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))

    def verify(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ua = np.stack(pdf["ua"].values)
            ub = np.stack(pdf["ub"].values)
            cos = np.round(np.einsum("ij,ij->i", ua, ub), 6)
            keep = cos >= threshold
            if keep.any():
                yield pd.DataFrame(
                    {
                        "vec_a": pdf["vec_a"].to_numpy(np.int64)[keep],
                        "vec_b": pdf["vec_b"].to_numpy(np.int64)[keep],
                        "cosine": cos[keep],
                    }
                )

    return cand.select("vec_a", "ua", "vec_b", "ub").mapInPandas(
        verify, schema="vec_a long, vec_b long, cosine double"
    )
