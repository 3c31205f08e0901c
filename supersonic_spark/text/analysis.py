"""Text analysis expressions for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All JVM-side built-in expressions (no Python UDFs) so they stay inside
whole-stage codegen at 100 TB scale. Every formula is deliberately
SQL-expressible so DuckDB oracles can verify it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker vocabularies for the n-gram/marker language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "zu"],
}


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash that DuckDB can reproduce exactly:
    first 15 hex chars of md5 as a big-endian integer. The engine's
    cross-system fingerprint (Supersonic's Fingerprint analogue —
    reference: supersonic/expression/ext/hashing/hashing_expressions.h:28-35
    — but portable instead of engine-internal)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def quality_score(col: Column) -> Column:
    """Cheap quality heuristic in [0,1]: length band + alpha ratio +
    mean token length band. Deterministic arithmetic only."""
    n_chars = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_tok = token_count(col)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    len_band = F.when((n_chars >= 20) & (n_chars <= 4000), F.lit(1.0)) \
                .otherwise(F.lit(0.3))
    tok_band = F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12.0),
                      F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((0.4 * len_band + 0.4 * alpha_ratio + 0.2 * tok_band), 4)


def langid_expr(col: Column) -> Column:
    """Marker-word language ID: the language whose marker set intersects
    the text's token set most wins; ties and no-signal -> 'und'.
    Set-intersection semantics match DuckDB's list_intersect."""
    toks = F.array_distinct(tokens(F.lower(col)))
    scores = {lang: F.size(F.array_intersect(
        toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()}
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    # deterministic priority order on ties: de < es < en evaluated last wins
    for lang in ["de", "es", "en"]:
        expr = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(expr)
    return F.when(best_score <= 0, F.lit("und")).otherwise(expr)


def doc_fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: lowercase, strip non-alphanumerics,
    collapse whitespace, then portable 60-bit hash — catches
    formatting-only near-duplicates."""
    norm = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " ")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return portable_hash64(norm)


def token_rarity_scores(df, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Corpus-relative unigram rarity — the LM-style quality-filter
    signal (average -log2 token probability) in EXACT integer
    arithmetic so any engine computes bit-identical results: a token's
    rarity bucket is bit_length(n_total DIV n_token)  (= floor(log2 of
    the inverse frequency) + 1, computed as LENGTH(BIN(q)) which both
    Spark and DuckDB define identically on integers), a document's
    score sums its tokens' buckets, and avg_rarity_x100 uses integer
    division. Plan: one explode + token-frequency aggregate + equi join
    back + per-doc aggregate — two shuffles, no floats, no UDFs. At
    100 TB the frequency table is vocabulary-sized (shuffle of distinct
    tokens only) and everything else is map-side."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("tok"))
    # consumed twice (frequency aggregate + score join): materialize the
    # exploded token stream once instead of re-running the scan+explode
    # per consumer (same localCheckpoint rationale as minhash_lsh_pairs)
    toks = toks.localCheckpoint(eager=True)
    freqs = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = freqs.agg(F.sum("n_tok").alias("n_total"))
    scored = (toks.join(freqs, "tok")
              .crossJoin(F.broadcast(total))
              .withColumn("bucket",
                          F.length(F.bin(F.expr("n_total div n_tok")))))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("bucket").alias("rarity_sum"))
            .withColumn("avg_rarity_x100",
                        F.expr("(rarity_sum * 100) div n_tokens")))


def redact_pii(col: Column) -> Column:
    """Curation-time PII scrubbing: emails, then 16+-char hex blobs
    (tokens/keys), then long digit runs (phone/account numbers) —
    replaced with typed placeholders. Patterns are plain RE2-compatible
    classes so Spark (Java regex) and DuckDB (RE2) rewrite identically;
    order matters: emails contain digits, and because digits are a subset
    of hex, a pure 16+-digit run (e.g. a 16-digit account number)
    classifies as <HEX>, not <NUM>."""
    out = F.regexp_replace(
        col, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    out = F.regexp_replace(out, "[0-9a-fA-F]{16,}", "<HEX>")
    out = F.regexp_replace(out, "[0-9][0-9 ()+-]{6,}[0-9]", "<NUM>")
    return out


def normalize_text(col: Column, lowercase: bool = False) -> Column:
    """Curation-stage text normalization, pure codegen expressions:

    1. zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) are deleted,
    2. C0/C1 control characters (tab/newline included) become spaces,
    3. runs of whitespace collapse to one space,
    4. trim; optional lowercase.

    The Java-regex patterns have exact RE2 twins (DuckDB oracle in
    plans/oracles.py text_normalize), so the normalized text is
    engine-portable byte-for-byte -- the property that matters when a
    dedup fingerprint computed by one engine must match another's."""
    x = F.regexp_replace(col, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
    x = F.regexp_replace(x, "[\\x00-\\x1F\\x7F\\u0080-\\u009F]", " ")
    x = F.trim(F.regexp_replace(x, " +", " "))
    return F.lower(x) if lowercase else x


def char_entropy(df, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Per-document Shannon entropy of the character distribution —
    the classic cheap gibberish/binary detector (natural prose sits
    ~4.0-4.5 bits/char; base64 blobs and repeated filler fall far
    outside). Explode-to-chars feeds a (doc, char) aggregate whose
    map-side partial combine caps the shuffle at
    O(docs x distinct-chars), NOT O(total characters) — the partial
    agg is what makes the pattern safe at corpus scale. Entropy is
    folded per doc with the total carried by a doc-keyed window on the
    already-tiny counts table. Output: (id, n_chars, entropy), entropy
    in bits rounded to 4. Only truly empty/NULL docs are absent;
    whitespace counts as characters (a whitespace-only doc scores
    entropy 0.0)."""
    from pyspark.sql import Window
    chars = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), "")).alias("ch"))
             .filter(F.col("ch") != ""))
    counts = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    n = F.sum("c").over(Window.partitionBy(id_col))
    p = F.col("c") / n
    return (counts.select(F.col(id_col), F.col("c"), n.alias("n"),
                          (p * F.log2(p)).alias("_plp"))
            .groupBy(id_col)
            .agg(F.sum("c").alias("n_chars"),
                 F.round(-F.sum("_plp"), 4).alias("entropy")))
