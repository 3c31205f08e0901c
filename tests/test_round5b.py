"""Round-5b tests: bucket-grain DELETE (GDPR-erasure path), hardlink
snapshots (time travel), and product quantization (PQ / IVF-PQ) for
embedding search."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# delete_bucketized


def test_delete_bucketized_roundtrip(spark, tmp_path):
    """Deleting conversations rewrites ONLY their bucket files; the next
    prebucketed encode re-encodes only those buckets, and the decoded
    table equals src-minus-deleted exactly."""
    from supersonic_spark.datagen import generate_transcripts
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table, delete_bucketized,
                                           encode_table_prebucketed)
    src = generate_transcripts(spark, n_convs=200, seed=7)
    bdir = str(tmp_path / "b")
    bucketize_table(spark, src, bdir, n_buckets=8)
    out = str(tmp_path / "enc_del")
    cfg = EncodeConfig(chunk_rows=2048)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="del")

    gone = [r.conv_id for r in
            src.select("conv_id").distinct().limit(3).collect()]
    keys = spark.createDataFrame([(c,) for c in gone], "conv_id string")
    affected = delete_bucketized(spark, keys, bdir)
    assert affected and len(affected) <= 3

    m2 = encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="del")
    fresh = (m2.filter(~F.col("resumed"))
             .select("partition_id").distinct().count())
    assert fresh == len(affected)          # only touched buckets re-encode

    got = sorted(map(tuple, decode_table(spark, out).collect()))
    want = sorted(map(tuple,
                      src.filter(~F.col("conv_id").isin(gone)).collect()))
    assert got == want and len(got) > 0


def test_delete_bucketized_empties_whole_bucket(spark, tmp_path):
    """Deleting EVERY conversation of a bucket must (a) keep an empty
    parquet file so positional bucket ids stay stable, (b) unlink the
    stale block file on re-encode so decode cannot resurrect deleted
    rows, (c) leave every other bucket byte-identical (resumed)."""
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table, delete_bucketized,
                                           encode_table_prebucketed)
    rows = [(f"u{i}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "conv_id string, v long")
    bdir = str(tmp_path / "bz")
    bucketize_table(spark, df, bdir, n_buckets=4)
    out = str(tmp_path / "enc_bz")
    cfg = EncodeConfig(chunk_rows=64, conv_key="conv_id", order_key="v",
                       sort_keys=("conv_id", "v"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="bz")

    n = 4
    bid = F.pmod(F.hash(F.col("conv_id")), F.lit(n))
    routed = df.withColumn("b", bid)
    target = routed.groupBy("b").count().orderBy("b").collect()[0]["b"]
    victims = [r.conv_id for r in
               routed.filter(F.col("b") == target).collect()]
    keys = spark.createDataFrame([(c,) for c in victims],
                                 "conv_id string")
    affected = delete_bucketized(spark, keys, bdir)
    assert affected == [target]

    # the emptied bucket still has a (0-row) parquet file at its slot
    import re
    import pyarrow.parquet as pq
    by_num = {}
    for p in os.listdir(bdir):
        m = re.match(r"part-(\d{5})-.*\.parquet$", p)
        if m:
            by_num[int(m.group(1))] = os.path.join(bdir, p)
    assert target in by_num
    assert pq.ParquetFile(by_num[target]).metadata.num_rows == 0

    blk = os.path.join(out, "blocks", f"part-{target:05d}.ssb")
    assert os.path.exists(blk)             # stale until re-encode
    m2 = encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="bz")
    assert not os.path.exists(blk)         # unlinked by empty partition
    fresh = set(r.partition_id for r in
                m2.filter(~F.col("resumed"))
                .select("partition_id").distinct().collect())
    assert fresh == set()                  # 0-chunk partition emits no rows

    got = sorted((r.conv_id, r.v) for r in
                 decode_table(spark, out).collect())
    want = sorted((c, v) for c, v in rows if c not in set(victims))
    assert got == want


def test_delete_bucketized_key_type_cast(spark, tmp_path):
    """Delete keys arriving narrower than the stored key column (int
    literals vs long) must still route to the right bucket — murmur3
    differs by byte width."""
    from supersonic_spark.pipeline import bucketize_table, delete_bucketized
    df = spark.createDataFrame([(i, i * 10) for i in range(100)],
                               "conv_id long, v long")
    bdir = str(tmp_path / "bk")
    bucketize_table(spark, df, bdir, n_buckets=8)
    keys = spark.createDataFrame([(3,), (55,)], "conv_id int")
    affected = delete_bucketized(spark, keys, bdir)
    assert affected
    back = spark.read.parquet(bdir)
    assert back.count() == 98
    assert back.filter(F.col("conv_id").isin(3, 55)).count() == 0


def test_delete_bucketized_no_match_is_noop(spark, tmp_path):
    from supersonic_spark.pipeline import bucketize_table, delete_bucketized
    df = spark.createDataFrame([(f"c{i}", i) for i in range(50)],
                               "conv_id string, v long")
    bdir = str(tmp_path / "bn")
    bucketize_table(spark, df, bdir, n_buckets=4)
    before = sorted(os.listdir(bdir))
    # keys that hash into buckets but match no stored conversation still
    # rewrite those buckets (content unchanged); an empty key frame is a
    # pure no-op
    keys = spark.createDataFrame([], "conv_id string")
    assert delete_bucketized(spark, keys, bdir) == []
    assert sorted(os.listdir(bdir)) == before
    assert spark.read.parquet(bdir).count() == 50


# ---------------------------------------------------------------------------
# snapshot_table


def test_snapshot_time_travel_across_upsert(spark, tmp_path):
    """A snapshot taken before a MERGE decodes to the ORIGINAL table
    after the live table has been upserted and re-encoded (hardlinked
    block bytes survive os.replace of the live names)."""
    from supersonic_spark.datagen import generate_transcripts
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table,
                                           encode_table_prebucketed,
                                           list_snapshots, snapshot_table,
                                           upsert_bucketized)
    src = generate_transcripts(spark, n_convs=120, seed=5)
    bdir = str(tmp_path / "b")
    bucketize_table(spark, src, bdir, n_buckets=4)
    out = str(tmp_path / "enc_snap")
    cfg = EncodeConfig(chunk_rows=2048)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="snap")
    base = sorted(map(tuple, decode_table(spark, out).collect()))

    snap = snapshot_table(out, "v1")
    assert list_snapshots(out) == ["v1"]

    some = [r.conv_id for r in
            src.select("conv_id").distinct().limit(2).collect()]
    upd = (src.filter(F.col("conv_id").isin(some))
           .withColumn("text", F.concat(F.lit("UPD:"), F.col("text"))))
    upsert_bucketized(spark, upd, bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="snap")

    live = sorted(map(tuple, decode_table(spark, out).collect()))
    want_live = sorted(map(tuple,
                           src.filter(~F.col("conv_id").isin(some))
                           .unionByName(upd).collect()))
    assert live == want_live and live != base

    # time travel: the snapshot still decodes to the pre-merge table
    old = sorted(map(tuple, decode_table(spark, snap).collect()))
    assert old == base

    with pytest.raises(ValueError, match="already exists"):
        snapshot_table(out, "v1")


def test_snapshot_rejects_non_table(tmp_path):
    from supersonic_spark.pipeline import snapshot_table
    d = str(tmp_path / "not_a_table")
    os.makedirs(d)
    with pytest.raises(ValueError, match="not an encoded table"):
        snapshot_table(d, "v1")


def test_snapshot_survives_delete_of_emptied_bucket(spark, tmp_path):
    """The empty-partition cleanup unlinks the live block NAME; a
    snapshot's hardlink must keep the bytes readable."""
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table, delete_bucketized,
                                           encode_table_prebucketed,
                                           snapshot_table)
    rows = [(f"u{i}", i) for i in range(80)]
    df = spark.createDataFrame(rows, "conv_id string, v long")
    bdir = str(tmp_path / "b")
    bucketize_table(spark, df, bdir, n_buckets=4)
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(chunk_rows=64, conv_key="conv_id", order_key="v",
                       sort_keys=("conv_id", "v"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="sd")
    snap = snapshot_table(out, "before-erasure")

    bid = F.pmod(F.hash(F.col("conv_id")), F.lit(4))
    target = (df.withColumn("b", bid).groupBy("b").count()
              .orderBy("b").collect()[0]["b"])
    victims = [r.conv_id for r in
               df.withColumn("b", bid)
               .filter(F.col("b") == target).collect()]
    delete_bucketized(
        spark, spark.createDataFrame([(c,) for c in victims],
                                     "conv_id string"), bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="sd")

    assert decode_table(spark, out).count() == 80 - len(victims)
    old = sorted((r.conv_id, r.v) for r in
                 decode_table(spark, snap).collect())
    assert old == sorted(rows)             # snapshot untouched by erasure


# ---------------------------------------------------------------------------
# product quantization


def _emb(spark, n=200, dim=16):
    from supersonic_spark.datagen import generate_clustered_embeddings
    return (generate_clustered_embeddings(spark, n, dim=dim, n_clusters=4)
            .select("vec_id", "embedding"))


def test_pq_codes_binary_roundtrip():
    """codes -> Arrow binary -> codes is exact, including on a sliced
    (non-zero offset) array."""
    import numpy as np
    from supersonic_spark.pq import _binary_to_codes, _codes_to_binary
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 256, size=(50, 8), dtype=np.uint8)
    arr = _codes_to_binary(codes)
    assert bytes(arr[0].as_py()) == codes[0].tobytes()
    back = _binary_to_codes(arr, 8)
    assert (back == codes).all()
    sl = arr.slice(13, 20)
    assert (_binary_to_codes(sl, 8) == codes[13:33]).all()


def test_pq_assign_expr_matches_arrow(spark):
    """The expression-path twin and the Arrow kernel agree code-for-code
    on every vector (same argmin, same lowest-index tie-break)."""
    from supersonic_spark.pq import (pq_assign_arrow, pq_assign_expr,
                                     toy_pq_codebooks)
    df = _emb(spark)
    books = toy_pq_codebooks(m=4, ksub=4, dsub=4)
    kern = pq_assign_arrow(df, books)
    rows = {r.vec_id: list(r.pq_code) for r in kern.collect()}
    expr = pq_assign_expr(df, books)
    for r in expr.collect():
        assert rows[r.vec_id] == [r.c0, r.c1, r.c2, r.c3]
    assert len(rows) == 200


def test_pq_adc_equals_reconstruction_cosine(spark):
    """ADC cosine == exact cosine of the PQ reconstruction (the LUT path
    is algebra, not approximation — the approximation is quantization)."""
    import numpy as np
    from supersonic_spark.pq import (pq_adc_scores_arrow, pq_assign_arrow,
                                     toy_pq_codebooks)
    df = _emb(spark, n=60)
    books = toy_pq_codebooks(m=4, ksub=4, dsub=4)
    c = np.asarray(books)
    q = [float(v) for v in
         df.filter(F.col("vec_id") == 0).collect()[0].embedding]
    codes_df = pq_assign_arrow(df, books)
    got = {r.vec_id: r.cos_sim
           for r in pq_adc_scores_arrow(codes_df, q, books).collect()}
    codes = {r.vec_id: list(r.pq_code) for r in codes_df.collect()}
    qv = np.asarray(q)
    for vid, code in codes.items():
        recon = np.concatenate([c[s][code[s]] for s in range(4)])
        want = float(qv @ recon /
                     (np.linalg.norm(qv) * np.linalg.norm(recon)))
        assert abs(got[vid] - want) < 1e-9


def test_pq_training_reduces_distortion(spark):
    """Lloyd iterations must not increase total quantization error, and
    training is deterministic across runs."""
    import numpy as np
    from supersonic_spark.pq import (_assign_codes, _codebook_matrix,
                                     train_pq_codebooks)
    df = _emb(spark, n=300)
    mat = np.asarray([list(map(float, r.embedding))
                      for r in df.orderBy("vec_id").collect()])

    def distortion(books):
        c, c_sq = _codebook_matrix(books)
        m, ksub, dsub = c.shape
        codes = _assign_codes(mat, c, c_sq)
        err = 0.0
        for s in range(m):
            xs = mat[:, s * dsub:(s + 1) * dsub]
            err += ((xs - c[s][codes[:, s]]) ** 2).sum()
        return err

    b0 = train_pq_codebooks(df, dim=16, m=4, ksub=8, lloyd_iters=0)
    b2 = train_pq_codebooks(df, dim=16, m=4, ksub=8, lloyd_iters=2)
    b2b = train_pq_codebooks(df, dim=16, m=4, ksub=8, lloyd_iters=2)
    assert b2 == b2b                       # deterministic
    assert distortion(b2) <= distortion(b0) + 1e-9
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, dim=16, m=5, ksub=4)


def test_pq_refined_topk_exact_when_shortlist_covers(spark):
    """With refine*k >= table size the ADC shortlist is the whole table,
    so refined top-k equals exact brute-force cosine top-k."""
    from supersonic_spark.ann import cosine_topk_arrow
    from supersonic_spark.pq import pq_topk_refined, toy_pq_codebooks
    df = _emb(spark, n=150)
    books = toy_pq_codebooks(m=4, ksub=4, dsub=4)
    q = [float(v) for v in
         df.filter(F.col("vec_id") == 7).collect()[0].embedding]
    got = [(r.vec_id, r.cos_sim)
           for r in pq_topk_refined(df, q, books, k=10, refine=15).collect()]
    want = [(r.vec_id, r.cos_sim)
            for r in cosine_topk_arrow(df, q, 10).collect()]
    assert got == want


def test_pq_refined_shortlist_recall_on_trained_books(spark):
    """Realistic setting: trained codebooks, small refine — the refined
    top-k must still contain most of the exact top-k (clustered data,
    ADC shortlist quality)."""
    from supersonic_spark.ann import cosine_topk_arrow
    from supersonic_spark.pq import pq_topk_refined, train_pq_codebooks
    df = _emb(spark, n=400)
    books = train_pq_codebooks(df, dim=16, m=4, ksub=16, lloyd_iters=2)
    q = [float(v) for v in
         df.filter(F.col("vec_id") == 3).collect()[0].embedding]
    got = {r.vec_id for r in
           pq_topk_refined(df, q, books, k=10, refine=4).collect()}
    want = {r.vec_id for r in cosine_topk_arrow(df, q, 10).collect()}
    assert len(got & want) >= 7            # recall@10 >= 0.7


def test_ivfpq_index_prunes_partitions(spark, tmp_path):
    """build_ivfpq_index partitions by ivf_cell; the probe's scan must
    carry the cell predicate as PartitionFilters (directory pruning) and
    full probing + full refine must equal exact top-k."""
    from supersonic_spark.ann import cosine_topk_arrow, train_centroids
    from supersonic_spark.pq import (build_ivfpq_index, ivfpq_topk_indexed,
                                     toy_pq_codebooks)
    df = _emb(spark, n=200)
    books = toy_pq_codebooks(m=4, ksub=4, dsub=4)
    cents = train_centroids(df, k=4)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, df, idx, cents, books)
    q = [float(v) for v in
         df.filter(F.col("vec_id") == 11).collect()[0].embedding]

    pruned = (spark.read.parquet(idx)
              .filter(F.col("ivf_cell").isin([0]))
              .select("vec_id", "pq_code"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    got = [(r.vec_id, r.cos_sim)
           for r in ivfpq_topk_indexed(spark, idx, q, 10, cents, books,
                                       n_probe=4, refine=20).collect()]
    want = [(r.vec_id, r.cos_sim)
            for r in cosine_topk_arrow(df, q, 10).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# CDC / snapshot retention / partition-subset decode


def test_snapshot_diff_cdc(spark, tmp_path):
    """Upsert two conversations + delete one after a snapshot: the diff
    emits exactly their rows as insert/delete pairs, and an untouched
    table diffs to empty (all chunk CRCs match -> no block file read)."""
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           delete_bucketized,
                                           encode_table_prebucketed,
                                           snapshot_diff, snapshot_table,
                                           upsert_bucketized)
    rows = [(f"u{i % 20}", i, f"t{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "conv_id string, v long, text string")
    bdir = str(tmp_path / "b")
    bucketize_table(spark, df, bdir, n_buckets=4)
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(chunk_rows=64, conv_key="conv_id", order_key="v",
                       sort_keys=("conv_id", "v"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="cdc")
    snapshot_table(out, "v1")

    assert snapshot_diff(spark, out, "v1").count() == 0  # no changes yet

    upd = (df.filter(F.col("conv_id") == "u3")
           .withColumn("text", F.concat(F.lit("U:"), F.col("text"))))
    upsert_bucketized(spark, upd, bdir)
    delete_bucketized(
        spark, spark.createDataFrame([("u5",)], "conv_id string"), bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="cdc")

    diff = snapshot_diff(spark, out, "v1").collect()
    ins = {(r.conv_id, r.v, r.text) for r in diff
           if r.change_type == "insert"}
    dels = {(r.conv_id, r.v, r.text) for r in diff
            if r.change_type == "delete"}
    want_ins = {(r.conv_id, r.v, r.text) for r in upd.collect()}
    want_del = ({(c, v, t) for c, v, t in rows if c == "u3"}
                | {(c, v, t) for c, v, t in rows if c == "u5"})
    assert ins == want_ins and dels == want_del


def test_snapshot_diff_schema_evolution(spark, tmp_path):
    """Live table re-encoded with an additive column: snapshot rows are
    aligned with NULLs in the new column, so every row whose new column
    is non-NULL appears as delete+insert."""
    from supersonic_spark.pipeline import (EncodeConfig, encode_table,
                                           snapshot_diff, snapshot_table)
    df = spark.createDataFrame([(f"c{i}", i) for i in range(50)],
                               "conv_id string, v long")
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(n_partitions=2, chunk_rows=32, conv_key="conv_id",
                       order_key="v", sort_keys=("conv_id", "v"))
    encode_table(spark, df, out, cfg, fingerprint="se1")
    snapshot_table(out, "v1")
    df2 = df.withColumn("lang", F.lit("en"))
    encode_table(spark, df2, out, cfg, fingerprint="se2")

    diff = snapshot_diff(spark, out, "v1")
    assert set(diff.columns) == {"conv_id", "v", "lang", "change_type"}
    ins = diff.filter(F.col("change_type") == "insert")
    dels = diff.filter(F.col("change_type") == "delete")
    assert ins.count() == 50 and dels.count() == 50
    assert ins.filter(F.col("lang") == "en").count() == 50
    assert dels.filter(F.col("lang").isNull()).count() == 50

    import pytest as _pytest
    with _pytest.raises(ValueError, match="no snapshot"):
        snapshot_diff(spark, out, "nope")


def test_expire_snapshots_retention(spark, tmp_path):
    """Expiring a snapshot unlinks only its names: the kept snapshot and
    the live table still decode, including bytes only the kept snapshot
    references."""
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table, delete_bucketized,
                                           encode_table_prebucketed,
                                           expire_snapshots, list_snapshots,
                                           snapshot_table)
    rows = [(f"u{i}", i) for i in range(80)]
    df = spark.createDataFrame(rows, "conv_id string, v long")
    bdir = str(tmp_path / "b")
    bucketize_table(spark, df, bdir, n_buckets=4)
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(chunk_rows=32, conv_key="conv_id", order_key="v",
                       sort_keys=("conv_id", "v"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="ex")
    snapshot_table(out, "a")
    snapshot_table(out, "b")
    delete_bucketized(
        spark, spark.createDataFrame([("u0",), ("u1",)], "conv_id string"),
        bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="ex")

    assert expire_snapshots(out, keep=["b"]) == ["a"]
    assert list_snapshots(out) == ["b"]
    snap_rows = decode_table(
        spark, str(tmp_path / "enc" / "snapshots" / "b")).count()
    assert snap_rows == 80                  # pre-delete bytes survive
    assert decode_table(spark, out).count() == 78
    assert expire_snapshots(out) == ["b"]   # keep=() drops everything
    assert list_snapshots(out) == []


def test_decode_partition_subset(spark, tmp_path):
    """decode_table(partitions=[p]) reads exactly partition p's rows
    (manifest row count agreement), and an empty subset decodes empty."""
    from supersonic_spark.datagen import generate_transcripts
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)
    src = generate_transcripts(spark, n_convs=100, seed=3)
    out = str(tmp_path / "enc")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512)
    encode_table(spark, src, out, cfg, fingerprint="ps")
    man = spark.read.parquet(out + "/manifest")
    per = {r.partition_id: r.n for r in
           man.filter(F.col("column") == "conv_id")
           .groupBy("partition_id").agg(F.sum("n_rows").alias("n"))
           .collect()}
    got = decode_table(spark, out, partitions=[2]).count()
    assert got == per[2] > 0
    both = decode_table(spark, out, partitions=[0, 3]).count()
    assert both == per[0] + per[3]
    assert decode_table(spark, out, partitions=[]).count() == 0


# ---------------------------------------------------------------------------
# semantic dedup


def test_semantic_dedup_exact_duplicates(spark):
    """Injected exact duplicates resolve to the original id as
    representative; distinct vectors keep themselves (threshold 0.999
    connects only exact copies on random data)."""
    from supersonic_spark.ann import semantic_dedup, toy_centroids
    from supersonic_spark.datagen import generate_clustered_embeddings
    base = generate_clustered_embeddings(spark, 200, dim=16, n_clusters=4) \
        .select("vec_id", "embedding")
    dups = (base.filter(F.col("vec_id") < 30)
            .withColumn("vec_id", F.col("vec_id") + 10_000))
    df = base.unionByName(dups)
    out = {r.id: r.rep_id
           for r in semantic_dedup(df, toy_centroids(4, 16),
                                   threshold=0.999).collect()}
    assert len(out) == 230
    for vid in range(30):
        assert out[10_000 + vid] == vid     # duplicate -> original
        assert out[vid] == vid
    for vid in range(30, 200):
        assert out[vid] == vid              # distinct rows keep themselves
    kept = sum(1 for i, r in out.items() if i == r)
    assert kept == 200


def test_semantic_dedup_transitive_cluster(spark):
    """A chain a~b, b~c inside one cell collapses to one representative
    even if a and c are below the pair threshold (connected components,
    not pairwise filtering)."""
    import numpy as np
    from supersonic_spark.ann import semantic_dedup
    base = np.zeros(8); base[0] = 1.0
    mid = np.asarray([0.97, 0.2429, 0, 0, 0, 0, 0, 0])
    far = np.asarray([0.89, 0.456, 0, 0, 0, 0, 0, 0])
    rows = [(0, [float(v) for v in base]),
            (1, [float(v) for v in mid / np.linalg.norm(mid)]),
            (2, [float(v) for v in far / np.linalg.norm(far)]),
            (3, [0.0] * 7 + [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0] + [0.0] * 7, [0.0] * 7 + [1.0]]
    out = {r.id: r.rep_id
           for r in semantic_dedup(df, cents, threshold=0.96).collect()}
    # cos(0,1)=0.97, cos(1,2)~0.965 >= .96, cos(0,2)~0.89 < .96
    assert out == {0: 0, 1: 0, 2: 0, 3: 3}
