"""Deterministic synthetic multi-turn transcript generator.

Schema (BASELINE.json input_hint): (conv_id string, turn_idx int32,
role string, text string, tool string nullable, ts timestamp[us]).

Every value is a pure function of (seed, conv index, turn index) via a
splitmix64-style vectorized mixer — so generation is embarrassingly
parallel and identical regardless of partitioning (the property a
10^12-turn distributed generator needs). Conversation lengths are
Zipf-ish with rare mega-conversations to exercise skew salting.
Deterministic seeding mirrors the reference's benchmark discipline
(MTRandom(0); reference: supersonic/benchmark/examples/operation_example.cc:46).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_ROLES = np.array(["system", "user", "assistant", "tool"])
_TOOLS = np.array([f"tool_{n}" for n in (
    "search", "bash", "python", "browser", "sql", "read", "write", "edit",
    "fetch", "calc", "email", "calendar", "maps", "vision", "translate",
    "weather", "news", "stocks", "docs", "deploy")])

# token soup vocabulary: frequent short words + role-ish phrases + rare tokens
_VOCAB = np.array(
    ["the", "a", "to", "of", "and", "is", "in", "it", "you", "that", "for",
     "on", "with", "this", "as", "are", "be", "or", "not", "can", "we",
     "I'll", "let", "me", "check", "the result", "function", "value",
     "error", "file", "line", "test", "query", "data", "table", "column",
     "run", "now", "see", "output", "return", "def", "class", "import",
     "assert", "true", "false", "null", "json", "list", "model", "token",
     "user asked", "here is", "based on", "looks like", "I found",
     "according to", "let's", "first", "then", "finally", "however",
     "λόγος", "数据", "émigré", "→", "…"]
    + [f"w{i:03d}" for i in range(400)])

_EPOCH_US = 1_600_000_000_000_000  # 2020-09-13, base conversation epoch
_TWO_YEARS_US = 2 * 365 * 24 * 3600 * 1_000_000

MEGA_EVERY_DEFAULT = 4096   # every k-th conversation is "mega" (skew)
MEGA_LEN_DEFAULT = 8192     # mega conversation turn count


def _mix(*cols: np.ndarray | int, seed: int) -> np.ndarray:
    """Vectorized splitmix64-style mixer over uint64 columns."""
    x = np.full(1, (seed * 0x9E3779B97F4A7C15) % (1 << 64), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            c = np.asarray(c, dtype=np.uint64)
            x = (x ^ c) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
    return x


def conv_length(conv_idx: np.ndarray, seed: int,
                mega_every: int = MEGA_EVERY_DEFAULT,
                mega_len: int = MEGA_LEN_DEFAULT) -> np.ndarray:
    """Zipf-ish lengths in [2, 50]; every mega_every-th conv gets mega_len."""
    u = _mix(conv_idx, 1, seed=seed) / np.float64(2**64)
    lens = (2 + np.floor(48 * u ** 3)).astype(np.int64)
    if mega_every:
        lens = np.where(conv_idx % mega_every == (7 % mega_every),
                        np.int64(mega_len), lens)
    return lens


def generate_conv_batch(conv_idx: np.ndarray, seed: int = 42,
                        mega_every: int = MEGA_EVERY_DEFAULT,
                        mega_len: int = MEGA_LEN_DEFAULT) -> pa.Table:
    """All turns for the given conversation indices, fully vectorized."""
    conv_idx = np.asarray(conv_idx, dtype=np.int64)
    lens = conv_length(conv_idx, seed, mega_every, mega_len)
    n = int(lens.sum())
    if n == 0:
        return TRANSCRIPT_SCHEMA.empty_table()

    conv_rep = np.repeat(conv_idx, lens)                       # conv per row
    row_start = np.repeat(np.cumsum(lens) - lens, lens)
    turn = (np.arange(n, dtype=np.int64) - row_start)           # 0..len-1

    # roles: turn 0 = system; then user/assistant alternating; ~1/6 tool turns
    h_role = _mix(conv_rep, turn, 2, seed=seed)
    role_idx = np.where(turn == 0, 0, np.where(turn % 2 == 1, 1, 2))
    is_tool = (h_role % np.uint64(6) == 0) & (turn > 1)
    role_idx = np.where(is_tool, 3, role_idx)
    role = _ROLES[role_idx]
    tool_name = _TOOLS[(_mix(conv_rep, turn, 3, seed=seed)
                        % np.uint64(len(_TOOLS))).astype(np.int64)]
    tool = np.where(is_tool, tool_name, None)

    # text: per-turn token count 0..63 (log-skewed), tokens from shared vocab
    # + conv-local sub-vocabulary for realistic repetition
    u_len = _mix(conv_rep, turn, 4, seed=seed) / np.float64(2**64)
    n_tok = np.floor(64 * u_len ** 2).astype(np.int64)          # many short
    tok_total = int(n_tok.sum())
    tok_row = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    tok_start = np.repeat(np.cumsum(n_tok) - n_tok, n_tok)
    tok_pos = np.arange(tok_total, dtype=np.int64) - tok_start
    h_tok = _mix(conv_rep[tok_row], turn[tok_row], tok_pos, 5, seed=seed)
    # 70% global zipf-ish vocab, 30% conv-local 16-word vocabulary
    g = (h_tok % np.uint64(997)).astype(np.float64) / 997.0
    global_idx = np.floor((len(_VOCAB)) * g ** 2.2).astype(np.int64)
    local_idx = (_mix(conv_rep[tok_row], h_tok % np.uint64(16), 6, seed=seed)
                 % np.uint64(len(_VOCAB))).astype(np.int64)
    use_local = (h_tok >> np.uint64(32)) % np.uint64(10) < 3
    tok_idx = np.where(use_local, local_idx, global_idx)
    tokens = pa.array(_VOCAB[tok_idx], type=pa.string())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tok_lists = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()), tokens)
    text = pc.binary_join(tok_lists, " ")

    # ts: conv start + cumulative per-turn gaps of 100ms..5min
    start = (_mix(conv_idx, 7, seed=seed) % np.uint64(_TWO_YEARS_US)).astype(np.int64) + _EPOCH_US
    gaps = (np.int64(100_000)
            + (_mix(conv_rep, turn, 8, seed=seed)
               % np.uint64(300_000_000 - 100_000)).astype(np.int64))
    cum = np.cumsum(gaps)
    seg_base = np.repeat(cum[np.cumsum(lens) - lens], lens)  # cum at each conv's first row
    first_gap = np.repeat(gaps[np.cumsum(lens) - lens], lens)
    ts = np.repeat(start, lens) + (cum - seg_base + first_gap)

    conv_id = pc.binary_join_element_wise(
        pa.array(np.full(n, "conv-"), type=pa.string()),
        pc.utf8_lpad(pa.array(conv_rep.astype("U"), type=pa.string()), 9, "0"),
        pa.scalar(""))

    return pa.table({
        "conv_id": conv_id,
        "turn_idx": pa.array(turn.astype(np.int32), type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
    }).cast(TRANSCRIPT_SCHEMA)


def generate_transcripts_local(n_convs: int, seed: int = 42,
                               mega_every: int = MEGA_EVERY_DEFAULT,
                               mega_len: int = MEGA_LEN_DEFAULT) -> pa.Table:
    """Driver-local generation (tests / small fixtures)."""
    return generate_conv_batch(np.arange(n_convs, dtype=np.int64), seed,
                               mega_every, mega_len)


def generate_transcripts(spark, n_convs: int, seed: int = 42,
                         mega_every: int = MEGA_EVERY_DEFAULT,
                         mega_len: int = MEGA_LEN_DEFAULT,
                         parallelism: int | None = None):
    """Distributed generation: spark.range over conv indices -> mapInArrow.

    Each task derives its rows purely from conv indices, so the result is
    identical for any partitioning — the design a 10^12-turn table needs.
    """
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType, TimestampType)
    out_schema = StructType([
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ])

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .runtime import pin_worker_threads
        pin_worker_threads()
        for batch in batches:
            idx = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            tbl = generate_conv_batch(idx, seed, mega_every, mega_len)
            # cap output batches so huge mega-convs don't blow one batch
            for sub in tbl.to_batches(max_chunksize=65536):
                yield sub

    par = parallelism or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_convs, numPartitions=min(par * 4, max(n_convs, 1)))
    return rng.mapInArrow(gen, schema=out_schema)


def generate_clustered_embeddings(spark, n_vecs: int, dim: int = 64,
                                  n_clusters: int = 16, seed: int = 42,
                                  sigma: float = 0.15,
                                  parallelism: int | None = None):
    """Mixture-of-Gaussians embedding table (vec_id long, embedding
    list<float32>, label int): cluster centers are deterministic unit
    vectors (seeded per cluster), each vector = its center + N(0, sigma)
    noise, derived purely from vec_id so the result is identical under
    any partitioning. This is the CLUSTERED counterpart of the uniform
    testdata embeddings — the distribution where a coarse quantizer's
    recall must beat its scanned fraction (on uniform data recall can
    only track the scanned fraction; see tools/ann_recall.py)."""
    out_schema = ("vec_id long, embedding array<float>, label int")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .runtime import pin_worker_threads
        pin_worker_threads()
        centers = np.stack([
            _unit_center(c, dim, seed) for c in range(n_clusters)])
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False) \
                       .astype(np.int64)
            lab = (ids % n_clusters).astype(np.int32)
            noise = _keyed_normal(ids, dim, seed)
            vecs = centers[lab] + sigma * noise
            flat = vecs.astype(np.float32).ravel()
            emb = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (len(ids) + 1) * dim, dim,
                                   dtype=np.int32)),
                pa.array(flat, pa.float32()))
            yield pa.RecordBatch.from_arrays([
                pa.array(ids, pa.int64()), emb,
                pa.array(lab, pa.int32()),
            ], ["vec_id", "embedding", "label"])

    par = parallelism or spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_vecs, numPartitions=par)
    return rng_df.mapInArrow(gen, schema=out_schema)


def _keyed_normal(ids: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """(n, dim) standard-normal noise derived purely from each id —
    counter-based (splitmix mix + Box-Muller), fully vectorized, so any
    partitioning of ids yields identical vectors."""
    n = len(ids)
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
    ctr = (ids[:, None].astype(np.uint64) * np.uint64(dim)
           + np.arange(dim, dtype=np.uint64)[None, :] + seed_mix)
    x = ctr + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    # second independent stream for the Box-Muller angle
    y = (x ^ np.uint64(0xD1B54A32D192ED03)) + np.uint64(0x9E3779B97F4A7C15)
    y = (y ^ (y >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    y = (y ^ (y >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    y = y ^ (y >> np.uint64(31))
    u1 = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (y >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u1 = np.clip(u1, 1e-12, 1.0)
    return (np.sqrt(-2.0 * np.log(u1))
            * np.cos(2.0 * np.pi * u2)).reshape(n, dim)


def _unit_center(cluster: int, dim: int, seed: int) -> np.ndarray:
    g = np.random.Generator(np.random.Philox(
        key=(seed * 0xC105 + 1, cluster)))
    v = g.standard_normal(dim)
    return v / np.sqrt((v * v).sum())
