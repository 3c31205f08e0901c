"""Deduplication primitives for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Plans are pure DataFrame compositions (explode/groupBy/join) so Catalyst
distributes them; hashing uses the portable md5-derived 60-bit hash so
DuckDB oracles can verify MinHash and Jaccard results exactly.

Scale notes (100 TB): exact dedup is one hash-shuffle; MinHash is
explode(k×shingles) -> partial-agg min per (doc, i) — shuffle size is
k rows per doc, not k×shingles; LSH banding turns near-dup search into
an equi join on (band, band_hash), which AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import portable_hash64, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by full-content hash: representative id
    (min), duplicate count. One shuffle on the 60-bit content hash."""
    h = portable_hash64(F.col(text_col)).alias("content_hash")
    return (df.select(h, F.col(id_col))
              .groupBy("content_hash")
              .agg(F.min(id_col).alias("rep_id"),
                   F.count("*").alias("n_dups")))


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-gram shingles of the text."""
    toks = tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      k: int = 16, shingle_n: int = 2) -> DataFrame:
    """MinHash signatures: for each of k hash functions, the minimum
    portable hash of (shingle || '#' || i) over the doc's shingle set.
    Output: (id, i, minhash) — long form so the oracle SQL stays flat."""
    shingled = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), shingle_n)).alias("shingle"))
    hashed = (shingled
              .select(F.col(id_col), F.col("shingle"),
                      F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"))
              .withColumn("h", portable_hash64(
                  F.concat_ws("#", F.col("shingle"),
                              F.col("i").cast("string")))))
    return (hashed.groupBy(id_col, "i")
                  .agg(F.min("h").alias("minhash")))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      k: int = 16, bands: int = 4,
                      shingle_n: int = 2) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: docs agreeing on
    all rows of any band become candidates. Returns (id_a, id_b, n_bands)
    with id_a < id_b."""
    rows_per_band = k // bands
    sig = minhash_signature(df, text_col, id_col, k, shingle_n)
    banded = (sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
                 .groupBy(id_col, "band")
                 .agg(F.concat_ws(",", F.sort_array(
                     F.collect_list(F.concat_ws(":", F.col("i").cast("string"),
                                                F.col("minhash").cast("string")))))
                      .alias("band_key")))
    # the self-join consumes `banded` twice and Catalyst does not reuse the
    # exchange across the two aliases — materialize once via an eager
    # localCheckpoint: unlike persist() it leaves no cache-manager entry
    # behind (blocks are freed when the plan is GC'd), so repeated calls in
    # a long-lived session don't leak storage memory. On a real cluster
    # with executor churn, swap for setCheckpointDir + checkpoint() —
    # localCheckpoint blocks are lost with their executor.
    banded = banded.localCheckpoint(eager=True)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (a.join(b, ["band", "band_key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_bands")))


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """SimHash over word shingles: per bit, majority vote of the shingle
    hashes' bits. One shuffle of (doc, token-hash) rows into an
    Arrow-batched GROUPED_AGG popcount UDAF — 60x less shuffle than the
    bit-explode formulation (kept below as simhash64_expr for the pure-SQL
    cross-check)."""
    from ..functions.udafs import simhash60_agg
    shingled = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), 1)).alias("tok"))
    h = shingled.withColumn("h", portable_hash64(F.col("tok")))
    return h.groupBy(id_col).agg(simhash60_agg(F.col("h")).alias("simhash"))


def simhash64_expr(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Pure explode/groupBy SimHash (no Python) — the oracle-shaped
    formulation; 60x heavier shuffle than the UDAF path."""
    shingled = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), 1)).alias("tok"))
    h = shingled.withColumn("h", portable_hash64(F.col("tok")))
    bits = h.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
        F.col("h"))
    votes = (bits.withColumn(
                "vote", F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1))
                 .groupBy(id_col, "bit")
                 .agg(F.sum("vote").alias("v")))
    return (votes.withColumn(
                "bitval", F.when(F.col("v") > 0,
                                 F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                           .otherwise(F.lit(0).cast("long")))
                 .groupBy(id_col)
                 .agg(F.sum("bitval").alias("simhash")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        group_col: str | None = None, n: int = 3,
                        threshold: float = 0.5,
                        df_cap: int | None = None) -> DataFrame:
    """n-gram Jaccard similarity pairs above threshold.
    |A∩B| via explode+join+count; |A∪B| = |A|+|B|-|A∩B|.
    If group_col given, only pairs within the same group are compared
    (blocking — at scale, always block).

    df_cap bounds the hot-gram quadratic blow-up (prefix-filtering): a
    gram shared by m docs yields m² intersection join rows, so grams with
    document frequency > df_cap are dropped from the intersection (their
    docs still count in the union sizes). The reported jaccard is
    therefore a lower bound for pairs whose overlap includes capped grams
    — a conservative, deterministic trade that the oracle mirrors
    exactly. The default df_cap=None is EXACT (quadratic in the hottest
    gram's frequency); scale-sensitive callers opt in to a cap — at
    100 TB always set one (the gate query pins df_cap=64)."""
    grams = df.select(
        F.col(id_col),
        *([F.col(group_col)] if group_col else []),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
    # consumed 3-4x (sizes, df-cap, both join sides): materialize once via
    # eager localCheckpoint — no cache-manager entry left behind, blocks
    # are freed when the plan is GC'd (persist() here leaked storage
    # memory for the rest of the session). Real-cluster note: prefer
    # setCheckpointDir + checkpoint() under executor churn.
    grams = grams.localCheckpoint(eager=True)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    join_keys = ["g"] + ([group_col] if group_col else [])
    capped = grams
    if df_cap is not None:
        # grams are distinct per doc (word_ngrams dedups), so count(*)
        # per join key == document frequency; the hot set is tiny ->
        # broadcast anti join
        hot = (grams.groupBy(*join_keys)
                    .agg(F.count("*").alias("_df"))
                    .filter(F.col("_df") > df_cap)
                    .select(*join_keys))
        capped = grams.join(F.broadcast(hot), join_keys, "left_anti")
    a = capped.select(*[F.col(c) for c in join_keys],
                      F.col(id_col).alias("id_a"))
    b = capped.select(*[F.col(c) for c in join_keys],
                      F.col(id_col).alias("id_b"))
    inter = (a.join(b, join_keys)
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("inter")
                                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def fuzzy_join_blocked(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str,
                       max_dist: int = 2,
                       block: str = "length") -> DataFrame:
    """Approximate string join: pairs whose edit distance <= max_dist,
    compared only INSIDE a blocking class (entity-resolution style —
    an unblocked fuzzy join is a cross join and is refused). Returns
    (left_col, right_col, dist).

    block="length" buckets on exact string length — complete for
    substitution-only noise (the common OCR/typo model) and misses
    insert/delete noise by construction; pass block="prefix" to bucket
    on the first character instead (complete for non-initial edits).
    At scale the blocked join is an equi shuffle join; levenshtein runs
    codegen-side per candidate pair.
    """
    if block == "length":
        bl = F.length
    elif block == "prefix":
        def bl(c):
            return F.substring(c, 1, 1)
    else:
        raise ValueError(f"unknown blocking scheme {block!r}")
    a = left.select(F.col(left_col).alias("_l"),
                    bl(F.col(left_col)).alias("_bk")).distinct()
    b = right.select(F.col(right_col).alias("_r"),
                     bl(F.col(right_col)).alias("_bk")).distinct()
    return (a.join(b, "_bk")
             .withColumn("dist", F.levenshtein(F.col("_l"), F.col("_r")))
             .filter(F.col("dist") <= max_dist)
             .select(F.col("_l").alias(left_col),
                     F.col("_r").alias(right_col), "dist"))


def jaccard_prefix_pairs(df: DataFrame, text_col: str, id_col: str,
                         n: int = 1,
                         threshold: float = 0.5) -> DataFrame:
    """EXACT n-gram Jaccard pairs above threshold via prefix filtering
    (PPJoin-family; Chaudhuri et al. ICDE'06, Xiao et al. WWW'08) — the
    lossless, scale-superior alternative to ngram_jaccard_pairs'
    df_cap truncation.

    Order every doc's gram set by GLOBAL document frequency ascending
    (rarest first, ties by gram text — a total order). If
    J(A,B) >= t then |A∩B| >= t·|A|, so at most |A| - ceil(t·|A|)
    of A's grams miss B — A's first L_A = |A| - ceil(t·|A|) + 1
    ordered grams (its PREFIX, the rarest ones) must hit B. Candidate
    pairs are therefore prefix(A) ⋈ allgrams(B) on the gram — no pair
    with J >= t can be missed, and hot grams never self-join: they sort
    to the END of every doc's ordering and fall outside the prefix, so
    the quadratic blow-up df_cap exists to suppress simply never forms.

    Plan shape (100 TB): grams exploded once; df is a vocabulary-keyed
    count (broadcastable); the prefix rank is a doc-partitioned window
    (never global); candidate generation is an equi-join keyed on the
    RAREST grams only; verification joins the (small) candidate pair
    set back to the full gram table — candidate-driven, so verification
    cost scales with output, not corpus². Exactness: every emitted
    jaccard is computed from full intersection counts, and the prefix
    guarantee above means no qualifying pair is dropped.
    """
    from pyspark.sql import Window
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
    # consumed by sizes, df, ranking, and both verification sides —
    # materialize once (same localCheckpoint rationale as
    # ngram_jaccard_pairs above)
    grams = grams.localCheckpoint(eager=True)
    sizes = grams.groupBy("_id").agg(F.count("*").alias("sz"))
    dfreq = grams.groupBy("g").agg(F.count("*").alias("gdf"))
    prefix_len = (F.col("sz")
                  - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
    pref = (grams.join(dfreq, "g")
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("_id").orderBy("gdf", "g")))
            .join(sizes, "_id")
            .filter(F.col("rn") <= prefix_len)
            .select("_id", "g"))
    cand = (pref.select(F.col("g"), F.col("_id").alias("id_a"))
            .join(grams.select(F.col("g"), F.col("_id").alias("id_b")),
                  "g")
            .filter(F.col("id_a") != F.col("id_b"))
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"))
            .distinct())
    inter = (grams.select(F.col("_id").alias("id_a"), "g")
             .join(cand, "id_a")
             .join(grams.select(F.col("_id").alias("id_b"), "g"),
                   ["id_b", "g"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def editdist_verify_pairs(df: DataFrame, pairs: DataFrame,
                          text_col: str, id_col: str,
                          max_dist_per_5_chars: int = 1,
                          broadcast_texts: bool = True) -> DataFrame:
    """Exact edit-distance confirm stage after LSH banding — the
    classic candidate-verify step: join each candidate pair back to its
    two texts and compute the true Levenshtein distance, confirming
    pairs with dist*5 <= max(len_a, len_b) (i.e. at most one edit per 5
    characters of the longer text; all-integer arithmetic so every
    engine agrees). MinHash banding over-generates on short docs — this
    bounds the false-positive rate with exact evidence, and the cost is
    O(|candidates| * len^2), safe because banding already cut the pair
    space.

    Shuffle plan: the text table is first cut to CANDIDATE ids only (a
    semi join against the pair ids — banding bounds that set), then the
    bounded (id, text) projection attaches to both pair sides as a
    broadcast: full-corpus text bytes never enter an exchange; only the
    candidate subset moves, once, inside the broadcast. For a candidate
    set too large to broadcast, pass broadcast_texts=False to fall back
    to key-partitioned shuffle joins of the same (already candidate-
    filtered) projection.
    Output: (id_a, id_b, edit_dist, confirmed)."""
    # consumed three times below (both id projections + the final join):
    # materialize the bounded candidate pair table once so the upstream
    # banding pipeline doesn't re-run per consumer
    pairs = pairs.localCheckpoint(eager=True)
    ids = (pairs.select(F.col("id_a").alias(id_col))
           .unionAll(pairs.select(F.col("id_b").alias(id_col)))
           .distinct())
    t = (df.select(F.col(id_col), F.col(text_col))
         .join(ids, id_col, "left_semi"))
    # consumed twice (side a, side b): materialize the bounded candidate
    # projection once instead of re-running the scan + semi join
    t = t.localCheckpoint(eager=True)
    if broadcast_texts:
        t = F.broadcast(t)
    a = t.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = t.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein("_ta", "_tb")
    longer = F.greatest(F.length("_ta"), F.length("_tb"))
    return joined.select(
        "id_a", "id_b",
        dist.cast("long").alias("edit_dist"),
        (dist * F.lit(5) <= longer * F.lit(max_dist_per_5_chars))
        .alias("confirmed"))
