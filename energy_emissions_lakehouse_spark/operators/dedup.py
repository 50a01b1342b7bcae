"""Deduplication operators (extension surface: training-data pipelines).

Four tiers, each a `queries()` entry over ``documents``:
- exact:      hash-groupBy on content (dedup_exact_documents)
- n-gram:     exact Jaccard on word-3-gram shingle sets (ngram_jaccard_pairs)
- MinHash+LSH: shingle -> minhash signature -> band-bucket join -> verify
- SimHash:    32-bit sign-random-projection hash -> banded hamming join

Scale design (the point of each tier at 100 TB):
- exact Jaccard all-pairs is quadratic — only ever run it *within blocks*
  (or as verification of LSH candidates, which is what minhash_lsh_pairs
  does). The LSH band join replaces the cartesian product with an equi-join
  on (band_id, band_values): shuffle-partitionable, linear in candidates.
- SimHash banding is exact for hamming <= BANDS-1 by pigeonhole: k bit
  flips cannot touch all k+1 bands, so candidates = equi-join on any band.
- Token/shingle ids come from an explicit dictionary (sorted dense ids)
  rather than an engine hash, making every stage reproducible in the DuckDB
  oracle; at pure-production scale you'd swap the dictionary join for
  xxhash64 and skip the vocab build (one fewer shuffle) at the cost of
  oracle checkability.

MinHash h_i(t) = (A_i * t + B_i) mod P with P prime > 2^32; A_i spread over
[0, P) so products wrap the modulus (small multipliers would make every h_i
pick the same argmin — a classic silent correctness bug). int64-safe:
A_i * tid < 2^63 for vocab < 2e9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.text import shingles, tokens

MINHASH_P = 4_294_967_311  # prime > 2^32
NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows
MINHASH_A = [(2_654_435_761 * (i + 1) + 104_729) % MINHASH_P for i in range(NUM_HASHES)]
MINHASH_B = [(40_503 * (i + 1) * 2_246_822_519 + 3_266_489_917) % MINHASH_P for i in range(NUM_HASHES)]

SIMHASH_BITS = 32
SIMHASH_A = 2_654_435_761
SIMHASH_B = 104_729
SIMHASH_M = 1 << 32
SIMHASH_BANDS = 4  # exact for hamming <= 3


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh: array<string>) — distinct word n-gram shingles."""
    return docs.select(
        "doc_id", shingles(tokens(F.col("text")), n=n).alias("sh")
    )


def shingle_vocabulary(doc_sh: DataFrame) -> DataFrame:
    """(shingle, tid) dictionary with dense ids ordered lexically.

    The global sort is one shuffle over the *distinct* shingle set (vocab,
    not corpus, cardinality). Oracle-reproducible; see module docstring for
    the hash-based alternative at production scale."""
    w = Window.orderBy("shingle")
    return (
        doc_sh.select(F.explode("sh").alias("shingle"))
        .distinct()
        .select("shingle", F.row_number().over(w).cast("long").alias("tid"))
    )


def _exploded_tids(doc_sh: DataFrame, vocab: DataFrame) -> DataFrame:
    return doc_sh.select("doc_id", F.explode("sh").alias("shingle")).join(
        vocab, "shingle"
    )


def minhash_signatures(doc_sh: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k-1}): min over shingle ids of (A_i*tid+B_i) mod P.
    One explode + one groupBy — partial aggregation keeps shuffle tiny
    (k longs per doc). Docs with no shingles drop out (LSH has nothing to
    hash), matching the SQL oracle's inner join."""
    ex = _exploded_tids(doc_sh, vocab)
    aggs = [
        F.min((F.col("tid") * A + B) % MINHASH_P).alias(f"h{i}")
        for i, (A, B) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Distinct (a_id, b_id) pairs agreeing on at least one full band.

    Long-format band keys + self-equi-join on (band, h_0..h_{r-1}): the
    shuffle key is the band value, so identical docs co-locate and there is
    no cartesian anywhere."""
    n_bands = NUM_HASHES // BAND_SIZE
    bands = None
    for b in range(n_bands):
        cols = [F.col(f"h{b * BAND_SIZE + j}").alias(f"b{j}") for j in range(BAND_SIZE)]
        part = signatures.select(
            F.col("doc_id"), F.lit(b).alias("band"), *cols
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.select(
        F.col("doc_id").alias("a_id"), "band", *[f"b{j}" for j in range(BAND_SIZE)]
    )
    right = bands.select(
        F.col("doc_id").alias("b_id"), "band", *[f"b{j}" for j in range(BAND_SIZE)]
    )
    on = ["band"] + [f"b{j}" for j in range(BAND_SIZE)]
    return (
        left.join(right, on)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard(a_sh: Column, b_sh: Column) -> Column:
    """Exact Jaccard over two shingle arrays (JVM array intersect)."""
    inter = F.size(F.array_intersect(a_sh, b_sh)).cast("double")
    union = (F.size(a_sh) + F.size(b_sh)).cast("double") - inter
    return inter / F.nullif(union, F.lit(0.0))


def verified_pairs(
    candidates: DataFrame, doc_sh: DataFrame, threshold: float
) -> DataFrame:
    """Join candidate ids back to shingle sets and keep exact-Jaccard >=
    threshold: (a_id, b_id, sim) with sim rounded for cross-engine ties."""
    a = doc_sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = doc_sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    return (
        candidates.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def simhash(doc_sh: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, sh32): 32-bit SimHash from shingle-id hashes.

    bit_j(doc) = sign of sum over shingles of (+1/-1 per hash bit j) —
    computed as 32 conditional sums in ONE aggregate pass (no per-bit
    shuffles)."""
    g = (F.col("tid") * SIMHASH_A + SIMHASH_B) % SIMHASH_M
    ex = _exploded_tids(doc_sh, vocab).withColumn("g", g)
    weights = [
        F.sum(
            (F.shiftright(F.col("g"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"w{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = ex.groupBy("doc_id").agg(*weights)
    bits = [
        F.when(F.col(f"w{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return per_doc.select("doc_id", total.cast("long").alias("sh32"))


def simhash_hamming_pairs(sims: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a_id, b_id, hamming) with hamming <= max_hamming via banded join.

    Bands the 32 bits into SIMHASH_BANDS bytes; pigeonhole makes the band
    equi-join EXACT for hamming <= SIMHASH_BANDS-1 — no cartesian product,
    same shuffle shape as the MinHash LSH join."""
    assert max_hamming <= SIMHASH_BANDS - 1
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    bands = None
    for b in range(SIMHASH_BANDS):
        part = sims.select(
            "doc_id",
            F.col("sh32"),
            F.lit(b).alias("band"),
            F.shiftright(F.col("sh32"), b * width).bitwiseAND(F.lit(mask)).alias(
                "band_val"
            ),
        )
        bands = part if bands is None else bands.unionByName(part)
    left = bands.select(
        F.col("doc_id").alias("a_id"), F.col("sh32").alias("a_sh32"), "band", "band_val"
    )
    right = bands.select(
        F.col("doc_id").alias("b_id"), F.col("sh32").alias("b_sh32"), "band", "band_val"
    )
    return (
        left.join(right, ["band", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.bit_count(
                F.col("a_sh32").bitwiseXOR(F.col("b_sh32"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
