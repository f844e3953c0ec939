"""Streaming exact dedup: a stateful seen-hash set per key bucket.

The streaming form of the reference's in-memory hash-set probe
(cadastre-pg/src/cli.rs:227-242,466-474): state per bucket is the set
of content hashes already emitted; only first-seen rows pass. Buckets
(pmod of the hash) bound per-group state and parallelize the probe —
the same sharding a 1000-executor cluster would use.

SCALE CAVEAT (deliberate demo simplification): per-bucket state is an
ever-growing exact seen-set, rebuilt as a Python set each micro-batch.
A production 100-TB stream needs bounded state — either a TTL via
GroupStateTimeout (drop hashes not seen for N days: occasional
re-emission of ancient dups, bounded memory) or a counting/bloom
filter per bucket (fixed memory, tunable false-positive drop rate).
The sharding and applyInPandasWithState plumbing stay identical; only
the state payload changes, which is why the exact-set version is the
one tested for stream==batch equality.
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
