"""Scratch experiment: where does the time go inside the iterative ops
at sf0.1? Times each phase of connected_components / pagerank / hits
round by round. Not part of the product; analysis only."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("exp")
    .config("spark.sql.shuffle.partitions", str(CPUS * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()


def _warm(it):
    for pdf in it:
        yield pdf


spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(_warm, schema="id long").count()

t0 = time.time()


def lap(msg):
    global t0
    t1 = time.time()
    print(f"{t1 - t0:7.3f}  {msg}", flush=True)
    t0 = t1


# --- connected components over the minhash pair graph (dedup_clusters) ---
from cadastre_pg_spark.operators.dedup import minhash_lsh_pairs

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
lap("read docs")
pairs = minhash_lsh_pairs(docs, threshold=0.4, hash_fn="md5")
lap("build pairs plan")
n_pairs = pairs.count()
lap(f"materialize pairs ({n_pairs} rows)")

sym = pairs.select(
    F.col("doc_a").cast("long").alias("src"), F.col("doc_b").cast("long").alias("dst")
).unionByName(
    pairs.select(
        F.col("doc_b").cast("long").alias("src"),
        F.col("doc_a").cast("long").alias("dst"),
    )
)
sym = sym.localCheckpoint(eager=True)
lap("sym checkpoint")
lab = (
    sym.select(F.col("src").alias("node"))
    .distinct()
    .withColumn("lab", F.col("node"))
    .localCheckpoint(eager=True)
)
lap("lab checkpoint")
prev_sum = lab.agg(F.sum("lab")).first()[0]
lap("initial sum")
n_nodes = lab.count()
lap(f"count nodes ({n_nodes})")

for r in range(6):
    nbr = sym.join(F.broadcast(lab), sym.src == lab.node).select(
        F.col("dst").alias("node"), "lab"
    )
    stepped = (
        lab.select("node", "lab")
        .unionByName(nbr)
        .groupBy("node")
        .agg(F.min("lab").alias("lab"))
        .localCheckpoint(eager=True)
    )
    lap(f"round {r}: stepped checkpoint")
    jump = stepped.select(
        F.col("node").alias("m_node"), F.col("lab").alias("m_lab")
    )
    new = stepped.join(F.broadcast(jump), F.col("lab") == F.col("m_node"), "left").select(
        "node", F.coalesce(F.col("m_lab"), F.col("lab")).alias("lab")
    )
    new_sum = new.agg(F.sum("lab")).first()[0]
    lap(f"round {r}: jump+sum ({new_sum})")
    lab = new
    if new_sum == prev_sum:
        print(f"converged after round {r}")
        break
    prev_sum = new_sum

# --- pagerank rounds ---
import __spark_entry__ as E

qs = E.queries()
t0 = time.time()
d = qs["pagerank"](spark, sf_dir=SF_DIR)
lap("pagerank build")
d.agg(F.count(F.lit(1)), F.sum("rank")).first()
lap("pagerank action")

t0 = time.time()
d = qs["hits"](spark, sf_dir=SF_DIR)
lap("hits build")
d.count()
lap("hits action")

t0 = time.time()
d = qs["sssp"](spark, sf_dir=SF_DIR)
lap("sssp build")
d.agg(F.count(F.lit(1)), F.sum("dist")).first()
lap("sssp action")

spark.stop()
