"""Deduplication operators (extension surface: training-data pipelines).

Four tiers, each a `queries()` entry over ``documents``:
- exact:      hash-groupBy on content (dedup_exact_documents)
- n-gram:     exact Jaccard via prefix-filter set-similarity join
- MinHash+LSH: shingle -> minhash signature -> band-bucket join -> verify
- SimHash:    32-bit sign-random-projection hash -> banded hamming join

Scale design (the point of each tier at 100 TB):
- Shingle ids are a deterministic md5-derived 60-bit hash computed inline
  (``hash_id``) — no dictionary build, no global sort, no extra shuffle.
  The same expression runs in DuckDB (verified bit-equal), so every stage
  stays oracle-checkable. Collision odds across a 10^9-shingle vocabulary
  are ~10^-9 (birthday bound at 60 bits) — absorbed by LSH's inherent
  approximation.
- Exact Jaccard all-pairs is quadratic; ``prefix_candidate_pairs`` replaces
  the blocked cartesian with the PPJoin prefix-filter equi-join: two sets
  with Jaccard >= t MUST share one of each other's first
  ``|sh| - ceil(t*|sh|) + 1`` shingles under any global total order, so
  candidates come from an equi-join on prefix shingles — shuffle keyed by
  shingle (high cardinality), not by block id.
- The LSH band join replaces the cartesian product with an equi-join on
  (band_id, band_values): shuffle-partitionable, linear in candidates.
- SimHash banding is exact for hamming <= BANDS-1 by pigeonhole: k bit
  flips cannot touch all k+1 bands, so candidates = equi-join on any band.

MinHash h_i(t) = (A_i * (t mod P) + B_i) mod P with P = 2^31-1 (Mersenne
prime). int64-safe: (P-1)^2 + B < 2^63. A_i spread over [1, P) so products
wrap the modulus many times (small sequential multipliers would preserve
ordering and make every h_i pick the same argmin — a classic silent
correctness bug).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.text import shingles, tokens
from energy_emissions_lakehouse_spark.session import loop_shuffle_partitions

MINHASH_P = 2_147_483_647  # Mersenne prime 2^31 - 1
NUM_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows
MINHASH_A = [
    (2_654_435_761 * (i + 1) + 104_729) % MINHASH_P or 1 for i in range(NUM_HASHES)
]
MINHASH_B = [
    (40_503 * (i + 1) * 2_246_822_519 + 3_266_489_917) % MINHASH_P
    for i in range(NUM_HASHES)
]

SIMHASH_BITS = 32
SIMHASH_MASK = (1 << SIMHASH_BITS) - 1
SIMHASH_BANDS = 4  # exact for hamming <= 3


def hash_id(col: Column) -> Column:
    """Deterministic 60-bit id from any string: first 15 hex chars of md5.

    Bit-equal in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT`` —
    the cross-engine anchor for every hash-based operator here."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_id_sql(expr: str) -> str:
    """DuckDB mirror of :func:`hash_id` (same bits, verified)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh: array<string>) — distinct word n-gram shingles."""
    return docs.select(
        "doc_id", shingles(tokens(F.col("text")), n=n).alias("sh")
    )


def _exploded_hids(doc_sh: DataFrame) -> DataFrame:
    """(doc_id, hid) — one row per (doc, shingle), hash-id'd inline.
    Narrow (no shuffle): explode + md5 inside whole-stage codegen."""
    return doc_sh.select("doc_id", F.explode(F.col("sh")).alias("shingle")).select(
        "doc_id", hash_id(F.col("shingle")).alias("hid")
    )


def minhash_signatures(doc_sh: DataFrame) -> DataFrame:
    """(doc_id, h0..h{k-1}): min over shingle ids of (A_i*(hid%P)+B_i) mod P.
    One explode + one groupBy — partial aggregation keeps shuffle tiny
    (k longs per doc). Docs with no shingles drop out (LSH has nothing to
    hash), matching the SQL oracle's grouped inner aggregation."""
    ex = _exploded_hids(doc_sh).withColumn("tm", F.col("hid") % MINHASH_P)
    aggs = [
        F.min((F.col("tm") * A + B) % MINHASH_P).alias(f"h{i}")
        for i, (A, B) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Distinct (a_id, b_id) pairs agreeing on at least one full band.

    Long-format band keys + self-equi-join on (band, h_0..h_{r-1}): the
    shuffle key is the band value, so identical docs co-locate and there is
    no cartesian anywhere.

    Round-12 note: materializing ``signatures`` before banding was
    measured NET-WORSE here (the extra eager job + lost pipeline fusion
    cost more than the repeated aggregate at bench scale) — the repeated
    subtree stays, deliberately."""
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


def prefix_candidate_pairs(doc_sh: DataFrame, threshold: float) -> DataFrame:
    """Distinct (a_id, b_id) candidates via PPJoin prefix filtering.

    Sound for Jaccard >= threshold: |A∩B| >= t*max(|A|,|B|) implies the
    prefixes of length |X| - ceil(t*|X|) + 1 under ANY global total order
    intersect (pigeonhole on the sorted arrays). The equi-join key is the
    prefix shingle itself — cardinality ~vocab, so the shuffle spreads
    evenly regardless of how many documents share a language/block.

    Three PPJoin filters compound here (each sound, i.e. never drops a
    true pair):
    - PREFIX under the global order (document frequency ASC, shingle) —
      the canonical rarest-first ordering, so prefixes are built from the
      least-common shingles (lexicographic order put stop-word shingles
      in prefixes: 2,315 vs 25 candidates at sf0.01);
    - LENGTH: Jaccard >= t forces t*|A| <= |B| <= |A|/t, applied at the
      candidate join (before the shuffle-out), not at verify;
    - POSITIONAL: a pair first co-occurring at position i of A's prefix
      and j of B's can overlap at most 1 + min(|A|-i, |B|-j) shingles,
      which must reach ceil(t/(1+t)*(|A|+|B|)) — sound because a true
      pair always survives via its FIRST shared ordered shingle (where
      nothing has been matched yet).

    Measured at t=0.8 on the flat-df synthetic corpus (every shingle df
    ~7-12 — no Zipf tail, the adversarial case for prefix filtering):
    sf0.01 (500 docs) 2,315 lexicographic candidates -> 25 (= exactly
    the true pairs); sf0.1 (5,000 docs) 220,218 -> 12,740 (256 true).

    Cost of the ordering: one vocab-keyed groupBy for df + one re-sort
    groupBy per corpus — the same shuffle key as the candidate join, and
    both aggregate map-side. (Round-12: materializing ``ranked`` before
    the two-sided prefix derivation measured net-worse — same verdict as
    the LSH band join above — so the repeated subtree stays.)"""
    ex = doc_sh.select("doc_id", F.explode("sh").alias("s"))
    df_tbl = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        ex.join(df_tbl, "s")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))),
                lambda e: e.s,
            ).alias("sh_o")
        )
    )
    k = (
        F.size("sh_o") - F.ceil(F.size("sh_o") * F.lit(threshold)) + 1
    ).cast("int")
    pref = ranked.select(
        F.col("doc_id"),
        F.size("sh_o").alias("m"),
        F.posexplode(F.slice("sh_o", F.lit(1), k)).alias("pos0", "p"),
    )
    left = pref.select(
        F.col("doc_id").alias("a_id"),
        F.col("m").alias("a_m"),
        (F.col("pos0") + 1).alias("a_pos"),
        "p",
    )
    right = pref.select(
        F.col("doc_id").alias("b_id"),
        F.col("m").alias("b_m"),
        (F.col("pos0") + 1).alias("b_pos"),
        "p",
    )
    t_lit = F.lit(threshold)
    min_overlap = F.ceil(
        (F.col("a_m") + F.col("b_m")) * t_lit / (F.lit(1.0) + t_lit)
    )
    return (
        left.join(right, "p")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            (F.col("b_m") >= F.col("a_m") * t_lit)
            & (F.col("a_m") >= F.col("b_m") * t_lit)
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("a_m") - F.col("a_pos"), F.col("b_m") - F.col("b_pos")
            )
            >= min_overlap
        )
        .select("a_id", "b_id")
        .distinct()
    )


def verified_pairs(
    candidates: DataFrame, doc_sh: DataFrame, threshold: float
) -> DataFrame:
    """Join candidate ids back to shingle sets and keep exact-Jaccard >=
    threshold: (a_id, b_id, sim) with sim rounded for cross-engine ties.

    A size-ratio prefilter (|a|>=t|b| and |b|>=t|a| — necessary for
    Jaccard>=t) prunes most candidates before the O(|a|+|b|) intersect."""
    a = doc_sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = doc_sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    na, nb = F.size("a_sh").cast("double"), F.size("b_sh").cast("double")
    return (
        candidates.join(a, "a_id")
        .join(b, "b_id")
        .filter((na >= nb * threshold) & (nb >= na * threshold))
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def simhash(doc_sh: DataFrame) -> DataFrame:
    """(doc_id, sh32): 32-bit SimHash from shingle-id hash bits.

    Uses the low 32 bits of the md5-derived shingle id directly as the
    per-shingle projection (already uniform — no second mixing needed).
    bit_j(doc) = sign of sum over shingles of (+1/-1 per bit j) — computed
    as 32 conditional sums in ONE aggregate pass (no per-bit shuffles)."""
    ex = _exploded_hids(doc_sh).withColumn(
        "g", F.col("hid").bitwiseAND(F.lit(SIMHASH_MASK))
    )
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
    same shuffle shape as the MinHash LSH join.

    ``sims`` is materialized once before banding (round-12): the 4-band
    union x 2 join sides otherwise re-ran the 32-conditional-sum shingle
    aggregate EIGHT times per query (measured 3.4 s -> see
    OPTIMIZATION_r12.md). (doc_id, sh32) is two longs per doc."""
    sims = sims.localCheckpoint(eager=True)
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


def connected_components(
    edges: DataFrame, max_iter: int = 25, n_partitions: int | None = 8
) -> DataFrame:
    """Connected components by min-label propagation: (node, component_id)
    where component_id is the smallest node id reachable from ``node``.

    Pregel-shaped iteration: each round every node takes the min of its own
    label and its neighbors' labels; convergence in <= diameter rounds. Each
    round is one keyed join + groupBy (hash-partitioned, no driver data),
    localCheckpoint'd so lineage stays flat. This is the same structure the
    large-star/small-star algorithm uses at web scale — duplicate-cluster
    graphs have tiny diameters, so rounds stay single digits. Input edges:
    (a_id, b_id); nodes not in any edge are absent (callers union singletons
    back if they need total coverage).

    Execution shape (round-6: the k-core fixed-overhead fix applied here —
    this was the 237-query sweep's slowest entry at 5-6.5 s under a plain
    200-partition session, overhead only): the whole propagation runs under
    a loop-local ``spark.sql.shuffle.partitions = n_partitions`` override
    (session.loop_shuffle_partitions, restored on exit); every round's
    state is checkpointed INSIDE it so no shuffle of the loop ever sees
    the caller's setting. Round 1 is FUSED with label init — with labels
    seeded to node ids, round 1's new label is exactly
    ``least(node, min(neighbor))``, one aggregation over the symmetric
    edge list instead of an init job plus a join round. The convergence
    probe carries the previous label through the step join and asks
    ``isEmpty`` of the checkpointed step frame — no extra join,
    early-exits on the first changed row. The returned frame is a pure
    column-rename over the last checkpointed state (no shuffle left, so
    the caller's partition setting can't touch it). The edge list is
    pair-scale (candidate-join output, orders smaller than the corpus);
    at real scale size ``n_partitions`` to that pair volume, not to the
    corpus."""
    spark = edges.sparkSession
    with loop_shuffle_partitions(spark, n_partitions):
        sym = (
            edges.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
            .unionByName(
                edges.select(F.col("b_id").alias("a"), F.col("a_id").alias("b"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fused init + round 1: label_1(v) = min(v, min neighbor id)
        labels = (
            sym.groupBy("a")
            .agg(F.least(F.col("a"), F.min("b")).alias("label"))
            .select(F.col("a").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
        # round 1 converged iff it left every label at its init value (the
        # node id) — probe it so max_iter=1 keeps its old contract of
        # succeeding on already-converged (e.g. edgeless) inputs instead
        # of falling through to the no-fixpoint raise. One isEmpty over
        # the checkpointed vertex-scale frame.
        if labels.filter(F.col("label") != F.col("node")).isEmpty():
            return labels.select("node", F.col("label").alias("component_id"))
        for _ in range(max_iter - 1):
            nb_min = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("label").alias("nb_label"))
            )
            stepped = (
                labels.join(nb_min, labels["node"] == nb_min["a"], "left")
                .select(
                    F.col("node"),
                    F.col("label").alias("old"),
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nb_label"), F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            labels = stepped.select("node", "label")
            if stepped.filter(F.col("label") != F.col("old")).isEmpty():
                break
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_iter}"
            )
        return labels.select("node", F.col("label").alias("component_id"))


# -------------------------------------------------- exact-substring tier
def exact_substring_windows(
    docs: DataFrame, w: int = 50
) -> DataFrame:
    """``(doc_id, n_tokens, pos, hid)`` — one row per ``w``-token sliding
    window of each document, keyed by the portable md5 hash of the
    window's text (the suffix-array replacement for Lee et al. 2022's
    EXACT-SUBSTRING dedup tier, 50-token default granularity).

    Why windows instead of a suffix array: the suffix array is a
    single-machine structure; a verbatim run of length ``L >= w`` shared
    between any two corpus positions is EXACTLY the set of runs all of
    whose w-windows collide, so window-hash equality distributes the
    same detection as keyed groupBy/join — no all-pairs step anywhere,
    O(total tokens) window rows.

    Window construction uses the zip_with chain (operators/text.shingles
    rationale: transform(sequence) would re-evaluate the token array per
    element); ``docs`` must carry (doc_id, toks)."""
    from energy_emissions_lakehouse_spark.operators.text import all_ngrams

    grams = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.posexplode(all_ngrams(F.col("toks"), n=w)).alias("pos", "gram"),
    )
    return grams.select(
        "doc_id", "n_tokens", "pos", hash_id(F.col("gram")).alias("hid")
    )


def exact_substring_coverage_from_windows(
    win: DataFrame, w: int = 50
) -> DataFrame:
    """Per-document duplicated-run coverage at ``w``-token granularity
    (Lee et al. 2022 'Deduplicating Training Data Makes Language Models
    Better', the exact-substring tier): windows occurring >= 2 times
    ANYWHERE in the corpus (other documents or the same one) mark
    duplicated spans; overlapping windows merge into maximal runs
    (gaps-and-islands over positions) and each document reports its
    total covered tokens — the quantity production dedup CUTS from the
    corpus.  Only documents with at least one duplicated run appear.

    Scale shape: one groupBy on the window hash (map-side partials),
    one co-partitioned equi-join back, then a per-DOCUMENT window fold —
    state bounded by a document's own duplicated windows, never a hot
    global key.  The complement of the 3-gram span profile
    (queries/text.doc_duplicate_span_coverage): that tier sees ANY
    shared 3-gram, this tier sees only LONG verbatim runs."""
    from pyspark.sql.window import Window

    cnt = win.groupBy("hid").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = win.join(cnt.filter(F.col("n_occ") >= 2), "hid")
    ww = Window.partitionBy("doc_id").orderBy("pos")
    marked = (
        dup.withColumn("prev", F.lag("pos").over(ww))
        .withColumn(
            "brk",
            (
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + w)
            ).cast("int"),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                ww.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    islands = marked.groupBy("doc_id", "n_tokens", "island").agg(
        (F.max("pos") - F.min("pos") + w).alias("covered"),
        F.count(F.lit(1)).alias("nw"),
    )
    return islands.groupBy("doc_id", "n_tokens").agg(
        F.sum("nw").cast("long").alias("n_dup_windows"),
        F.sum("covered").cast("long").alias("covered_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_dup_windows",
        "covered_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


def exact_substring_coverage(docs: DataFrame, w: int = 50) -> DataFrame:
    """Convenience composition of :func:`exact_substring_windows` +
    :func:`exact_substring_coverage_from_windows` — note the window
    frame is referenced TWICE downstream (occurrence count + join
    back), so callers that already materialize windows (the registered
    query memoizes them per corpus version, like queries/text._doc_sh)
    should pass them to the from-windows form directly."""
    return exact_substring_coverage_from_windows(
        exact_substring_windows(docs, w), w
    )
