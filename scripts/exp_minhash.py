"""Scratch: stage-by-stage cost of minhash_lsh_pairs at sf0.1."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (SparkSession.builder.master(f"local[{CPUS}]").appName("exp")
    .config("spark.sql.shuffle.partitions", str(CPUS * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()
def _warm(it):
    for pdf in it: yield pdf
spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(_warm, schema="id long").count()

t0 = time.time()
def lap(msg):
    global t0
    t1 = time.time(); print(f"{t1-t0:7.3f}  {msg}", flush=True); t0 = t1

from cadastre_pg_spark.operators.dedup import (
    minhash_store, _lsh_candidates, _band_keys, N_HASHES)

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
n = docs.count()
lap(f"read+count docs ({n})")

for trial in range(2):
    t0 = time.time()
    ss = minhash_store(docs, 3, "md5").persist()
    nss = ss.count()
    lap(f"[{trial}] minhash_store materialize ({nss})")
    banded = _band_keys(ss)
    nb = banded.count()
    lap(f"[{trial}] band_keys count ({nb})")
    cand, skipped = _lsh_candidates(ss, 4096)
    nc = cand.count()
    lap(f"[{trial}] candidates ({nc})")
    # verify joins
    import math as _math
    est_min = int(_math.ceil((0.4 - 0.25) * N_HASHES - 1e-9))
    a_side = ss.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), F.col("sset").alias("set_a"))
    b_side = ss.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), F.col("sset").alias("set_b"))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    verified = (cand.join(a_side, "doc_a").join(b_side, "doc_b")
        .filter(est >= F.lit(est_min))
        .withColumn("jaccard",
            F.size(F.array_intersect("set_a", "set_b")).cast("double")
            / F.size(F.array_union("set_a", "set_b")).cast("double"))
        .filter(F.col("jaccard") >= 0.4)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")))
    nv = verified.count()
    lap(f"[{trial}] verified ({nv})")
    ss.unpersist()
spark.stop()
