"""Full-text retrieval over the document corpus: TF-IDF term weighting,
BM25 ranked search, and hashing-trick featurization.

The lexical-search counterpart to the ANN stack (ann.py): where ANN
ranks by embedding cosine, these rank by term statistics — the two
retrieval modes a training-data pipeline mixes (semantic + lexical
dedup/search). Everything is built-in DataFrame expressions (explode /
groupBy / window), no UDFs, so the whole path stays in whole-stage
codegen and every formula has an exact DuckDB twin.

Scale notes (100 TB): the term pipeline is explode -> (doc, term)
partial-count -> term-keyed df join — all map-side combining
aggregations on bounded keys (vocabulary, documents). Scoring joins
are term-keyed; the per-doc top-k is a doc-partitioned window, never a
global sort. df (document frequency) tables are vocabulary-sized —
broadcastable for real corpora vocabularies (<< doc count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from supersonic_spark.text.analysis import portable_hash64


def term_counts(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, token, tf): whitespace tokens, empty tokens dropped."""
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"))
    return (tok.filter(F.col("token") != "")
               .groupBy(id_col, "token")
               .agg(F.count("*").alias("tf")))


def tfidf_topk(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    score = tf * (ln((N+1)/(df+1)) + 1) (the sklearn-style smooth idf,
    always positive). Returns (doc_id, token, tf, df_docs, score, rn)
    with rn = 1..k ranked by (score desc, token).

    Scale: tf is one explode+partial-count; df is a vocabulary-keyed
    count over the tf table; N is a 1-row broadcast. The rank window
    partitions by document — no global sort.
    """
    from pyspark.sql import Window
    # consumed twice (df aggregate + score join): one materialized
    # term-count pass instead of two explode+aggregate scans
    tf = term_counts(docs, id_col, text_col).localCheckpoint(eager=True)
    dfx = tf.groupBy("token").agg(F.count("*").alias("df_docs"))
    n = docs.agg(F.count("*").alias("_n"))
    score = (F.col("tf")
             * (F.log((F.col("_n") + F.lit(1.0))
                      / (F.col("df_docs") + F.lit(1.0))) + F.lit(1.0)))
    w = Window.partitionBy(id_col).orderBy(F.col("_score").desc(),
                                          "token")
    return (tf.join(dfx, "token")
              .crossJoin(F.broadcast(n))
              .withColumn("_score", score)
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= k)
              .select(id_col, "token", "tf", "df_docs",
                      F.round("_score", 4).alias("score"),
                      F.col("rn").cast("int").alias("rn")))


def bm25_corpus_stats(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Materialize the BM25 corpus-statistics table ONCE: one row per
    document (doc_id, _dl, _avgdl, _n) with the corpus aggregates
    denormalized onto every row (two tiny columns — the join stays
    doc-keyed and broadcast-friendly). A real retrieval deployment
    builds this at index time and serves every query from it, so the
    per-query plan scans the token stream exactly once (for the query
    terms) instead of re-deriving document lengths per query."""
    tf = term_counts(docs, id_col, text_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("_dl"))
    stats = dl.agg(F.avg("_dl").alias("_avgdl"),
                   F.count("*").alias("_n"))
    return dl.crossJoin(F.broadcast(stats))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text",
              corpus_stats: DataFrame | None = None) -> DataFrame:
    """BM25 ranked retrieval for a bag-of-terms query. Score per doc =
    sum over query terms of
        idf_t * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)). Returns the top-k
    (doc_id, score) rows ranked by (score desc, doc_id) — a
    deterministic cut at k.

    Scale: the term filter cuts the tf table to |query| terms BEFORE
    any join (predicate on the term-keyed aggregate — an inverted-index
    probe in relational clothing); doc length and avgdl come from the
    corpus_stats table (pass the result of bm25_corpus_stats to serve
    many queries from one materialized stats build — the deployment
    path); self-contained calls materialize the (doc, term, tf) table
    once with an eager localCheckpoint so the executed plan still scans
    the token stream exactly once. The final top-k is a bounded global
    sort of the matching docs only (TakeOrdered, not a full sort).
    """
    if corpus_stats is None:
        # consumed twice (doc lengths + query-term probe): materialize
        # the term-count table once instead of exploding the token
        # stream per consumer
        tf = term_counts(docs, id_col, text_col).localCheckpoint(eager=True)
        dl = tf.groupBy(id_col).agg(F.sum("tf").alias("_dl"))
        stats = dl.agg(F.avg("_dl").alias("_avgdl"),
                       F.count("*").alias("_n"))
        dlstats = dl.crossJoin(F.broadcast(stats))
        qt = tf.filter(F.col("token").isin(list(query_terms)))
    else:
        dlstats = corpus_stats
        # the tiny query-term slice is consumed twice (df count + score
        # join): materialize it so the token stream scans exactly once
        qt = (term_counts(docs, id_col, text_col)
              .filter(F.col("token").isin(list(query_terms)))
              .localCheckpoint(eager=True))
    dfx = qt.groupBy("token").agg(F.count("*").alias("_df"))
    idf = F.log(F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                            + (F.lit(b) * F.col("_dl")) / F.col("_avgdl")))
    term_score = (idf * (F.col("tf") * F.lit(k1 + 1.0))) / denom
    scored = (qt.join(dfx, "token")
                .join(dlstats, id_col)
                .groupBy(id_col)
                .agg(F.sum(term_score).alias("_score")))
    return (scored.orderBy(F.col("_score").desc(), id_col)
                  .limit(k)
                  .select(id_col, F.round("_score", 4).alias("score")))


def feature_hash(docs: DataFrame, n_features: int = 64,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Hashing-trick featurization: each token maps to bucket
    portable_hash64(token) % n_features; returns the sparse count
    vector as rows (doc_id, feature, cnt). Engine-portable (md5
    arithmetic), so any system — including the DuckDB oracle —
    reproduces the exact same feature ids.

    Scale: explode + one (doc, feature)-keyed partial-count; output is
    the sparse representation (no n_features-wide dense row blowup).
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"))
    return (tok.filter(F.col("token") != "")
               .withColumn("feature",
                           (portable_hash64(F.col("token"))
                            % n_features).cast("int"))
               .groupBy(id_col, "feature")
               .agg(F.count("*").alias("cnt")))


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   max_df: int | None = None) -> DataFrame:
    """Build an inverted index: (token, df_docs, postings), where
    postings is the doc-id-sorted list "doc:tf,doc:tf,..." — the
    lexical-retrieval data structure BM25/TF-IDF queries probe, as a
    materializable table.

    min_df prunes hapax noise; max_df prunes stopword-grade terms whose
    posting lists are corpus-sized (at 100 TB ALWAYS set one — a
    stopword's posting list is the document count; real engines either
    cap or tier them). Both filters are applied to the aggregated df,
    so the pruning decision is exact.

    Scale: one explode + (doc, token) partial count (map-side combine),
    then a vocabulary-keyed shuffle; collect_list is bounded per token
    by max_df. The postings string is engine-portable (DuckDB
    string_agg ORDER BY reproduces it byte-for-byte).
    """
    tf = term_counts(docs, id_col, text_col)
    idx = (tf.groupBy("token")
           .agg(F.count("*").alias("df_docs"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col(id_col).alias("d"),
                                     F.col("tf").alias("c")))),
                        lambda s: F.concat_ws(":", s["d"], s["c"])),
                    ",").alias("postings")))
    out = idx.filter(F.col("df_docs") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df_docs") <= max_df)
    return out


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             score_col: str = "score", k0: int = 60,
             k: int = 20) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked lists — THE hybrid-retrieval combiner (lexical BM25 +
    vector cosine in a RAG stack): fused(d) = sum over lists of
    1/(k0 + rank_d), ranks 1-based by (score desc, id), documents
    absent from a list simply contribute nothing. Returns the top-k
    (id, rrf, n_lists) by (rrf desc, id).

    Inputs must already be BOUNDED ranked lists (each ranker's top-k
    output) — that is what makes the per-list rank window (global, no
    partition key) safe: it sorts <= k rows, not the corpus. Ranks are
    computed on the (rounded) scores the rankers emit, so a SQL engine
    replays the fusion exactly; RRF itself only consumes ranks, which
    is why it needs no score normalization across heterogeneous
    rankers."""
    from pyspark.sql import Window
    tagged = []
    for r in rankings:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        tagged.append(r.select(F.col(id_col),
                               F.row_number().over(w).alias("_rank")))
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    fused = (u.groupBy(id_col)
             .agg(F.round(F.sum(F.lit(1.0) / (F.lit(k0) + F.col("_rank"))),
                          6).alias("rrf"),
                  F.count("*").alias("n_lists")))
    return fused.orderBy(F.col("rrf").desc(), id_col).limit(k)
