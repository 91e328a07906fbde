"""Deduplication operators for training-data pipelines.

All hot paths are JVM-side: shingling via sequence+substring (codegen),
hashing via xxhash64, min-aggregation for MinHash, banded LSH buckets
as plain groupBy keys.  No Python in any per-row path.

* exact_dedup        — hash-groupBy canonicalization
* ngram_jaccard_pairs— exact n-gram Jaccard on candidate pairs
* minhash_lsh_pairs  — MinHash signatures + banded LSH candidate pairs
* simhash            — 64-bit SimHash per document
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (canonical_id, n_copies) — one row per distinct text."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("canonical_id", "n_copies")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Distinct character n-gram shingles per doc — pure codegen exprs."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
                    f" i -> substring({text_col}, i, {n}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_jaccard_1000: int = 200,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    -> (doc_a, doc_b, jac_1000) with doc_a < doc_b and
    jac_1000 = floor(1000 * |A∩B| / |A∪B|) >= threshold.
    Integer output so an ANSI-SQL oracle matches bit-for-bit.
    """
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    jac = (F.lit(1000) * F.col("n_inter")) / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        j.withColumn("jac_1000", F.floor(jac).cast("long"))
        .where(F.col("jac_1000") >= min_jaccard_1000)
        .select("doc_a", "doc_b", "jac_1000")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_n: int = 8,
) -> DataFrame:
    """-> (id, mh_0..mh_{k-1}) MinHash signature, fully JVM.

    h_i(shingle) = xxhash64(shingle, seed=i); signature_i = min over
    the doc's shingles.  xxhash64 is Spark-native (deterministic,
    codegen'd) — the scale path runs at shuffle speed.
    """
    sh = shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 8,
) -> DataFrame:
    """Banded-LSH candidate near-dup pairs -> (doc_a, doc_b, n_bands_hit).

    Docs colliding in >=1 band are candidates; verify with
    ngram_jaccard_pairs on the candidate set if exactness is needed.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("key"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l = buckets.select(F.col(id_col).alias("doc_a"), "band", "key")
    r = buckets.select(F.col(id_col).alias("doc_b"), "band", "key")
    return (
        l.join(r, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens -> (id, simhash long).

    Per bit b: sign of sum over tokens of (2*bit_b(xxhash64(token))-1);
    bits assembled JVM-side (64 conditional sums in one aggregation).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = tok.withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    per = h.groupBy(id_col).agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(64):
        bit = F.lit(2**b if b < 63 else -(2**63)).cast("long")
        acc = acc.bitwiseOR(F.when(F.col(f"b{b}") > 0, bit).otherwise(F.lit(0).cast("long")))
    return per.select(F.col(id_col), acc.alias("simhash"))
