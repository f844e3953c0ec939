"""Streaming exact dedup: a stateful seen-hash set per key bucket.

The streaming form of the reference's in-memory hash-set probe
(cadastre-pg/src/cli.rs:227-242,466-474): state per bucket is the set
of content hashes already emitted; only first-seen rows pass. Buckets
(pmod of the hash) bound per-group state and parallelize the probe —
the same sharding a 1000-executor cluster would use.

Two state policies:
- `streaming_dedup` — EXACT per-bucket seen-set. State grows with the
  distinct-hash count; the variant used for stream==batch equality
  tests and bounded backfills.
- `streaming_dedup_bounded` — fixed-size Bloom filter per bucket plus
  a processing-time TTL that drops idle buckets. Constant memory
  forever (the production shape for a 100-TB stream); the documented
  trade is a ~0.1%-at-design-load false-positive rate that DROPS a
  unique document, and re-admission of ancient dups after the TTL.
"""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "doc_id long, text_sha string"
STATE_SCHEMA = "seen array<string>"
N_BUCKETS = 32


def _dedup_fn(key, pdfs, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_shas = [], []
    for pdf in pdfs:
        for doc_id, sha in zip(pdf["doc_id"], pdf["text_sha"]):
            if sha not in seen:
                seen.add(sha)
                out_ids.append(doc_id)
                out_shas.append(sha)
    state.update((list(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "text_sha": out_shas})


# 65536 bits/bucket packed 32-per-long (top 32 bits unused so values
# stay far from the signed-long boundary) -> ~0.1% FP at ~2k
# hashes/bucket, fixed 16 KiB state per bucket forever
BLOOM_SLOTS = 2048
BLOOM_PROBES = 4
STATE_SCHEMA_BLOOM = "bits array<long>, n long"


def _bloom_positions(sha_hex: str):
    """BLOOM_PROBES deterministic bit positions from the sha hex — four
    16-bit slices of the (already uniform) content hash."""
    v = int(sha_hex[:16], 16)
    return [(v >> (16 * i)) & 0xFFFF for i in range(BLOOM_PROBES)]


def _empty_out():
    return pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text_sha": pd.Series([], dtype="object"),
        }
    )


def make_dedup_bloom_fn(ttl_ms: int | None):
    """Bounded-state streaming dedup state function: a per-bucket Bloom
    filter of the content hashes seen so far (fixed 16 KiB per bucket,
    forever), optionally with a processing-time TTL that drops idle
    buckets' state entirely. The trade vs the exact seen-set: a false
    positive (~0.1% at design load) DROPS a unique document; state
    never grows. The production shape for a 100-TB stream — the
    exact-set variant stays for stream==batch equality tests."""

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield _empty_out()
            return
        if state.exists:
            bits, n = list(state.get[0]), state.get[1]
        else:
            bits, n = [0] * BLOOM_SLOTS, 0
        out_ids, out_shas = [], []
        for pdf in pdfs:
            for doc_id, sha in zip(pdf["doc_id"], pdf["text_sha"]):
                pos = _bloom_positions(sha)
                seen = all(bits[p >> 5] & (1 << (p & 31)) for p in pos)
                if not seen:
                    for p in pos:
                        bits[p >> 5] |= 1 << (p & 31)
                    n += 1
                    out_ids.append(doc_id)
                    out_shas.append(sha)
        state.update((bits, n))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"doc_id": out_ids, "text_sha": out_shas})

    return fn


def streaming_dedup_bounded(
    spark: SparkSession,
    path: str,
    query_name: str = "stream_dedup_bloom",
    ttl_ms: int | None = None,
    max_files_per_trigger: int | None = None,
    out_path: str | None = None,
    checkpoint: str | None = None,
):
    """Bounded-memory variant of streaming_dedup (Bloom state; pass
    ttl_ms to also expire idle buckets). NOTE: with a TTL the engine
    schedules timeout-evaluation micro-batches continuously, so
    processAllAvailable() never settles — production queries run with a
    trigger; tests use ttl_ms=None and exercise the timeout branch on
    the state function directly.

    Sink: out_path -> append parquet (distributed, checkpointed — the
    scale/bench shape); default -> memory sink `query_name` (tests)."""
    reader = spark.readStream.format("parquet").schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.load(path)
    hashed = docs.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha"),
        F.pmod(F.xxhash64(F.sha2("text", 256)), F.lit(N_BUCKETS)).alias("bucket"),
    )
    out = hashed.groupBy("bucket").applyInPandasWithState(
        make_dedup_bloom_fn(ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA_BLOOM,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
    if out_path:
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint or out_path + "_ckpt")
            .start()
        )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_dedup(
    spark: SparkSession, path: str, query_name: str = "stream_dedup"
):
    docs = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string, lang string, source string, n_chars long")
        .load(path)
    )
    hashed = docs.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha"),
        F.pmod(F.xxhash64(F.sha2("text", 256)), F.lit(N_BUCKETS)).alias("bucket"),
    )
    out = hashed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
