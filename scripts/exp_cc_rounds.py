"""Scratch: CC phase timing on the dissolve pair graph (current shape)."""
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
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()
def _warm(it):
    for pdf in it: yield pdf
spark.range(0, CPUS*4, 1, CPUS).mapInPandas(_warm, schema="id long").count()

import __spark_entry__ as E
from cadastre_pg_spark.data import synthetic as S
from cadastre_pg_spark.operators.overlay import rect_overlap_join
from cadastre_pg_spark.operators.graph import _shuffle_n

t0 = time.time()
def lap(msg):
    global t0
    t1 = time.time(); print(f"{t1-t0:7.3f}  {msg}", flush=True); t0 = t1

parts = spark.read.parquet(f"{SF_DIR}/part.parquet")
key = F.col("p_partkey").cast("long")
cx, cy, hw, hh = S.parcel_box_cols(key)
rects = parts.select(key.alias("rect_id"),
    (cx - hw).alias("x0"), (cy - hh).alias("y0"),
    (cx + hw).alias("x1"), (cy + hh).alias("y1"))
edges = rect_overlap_join(rects, level=E.OVL_LEVEL)
a, b = "a_id", "b_id"

for trial in range(2):
    t0 = time.time()
    sym = (edges.select(F.explode(F.array(
        F.struct(F.col(a).cast("long").alias("src"), F.col(b).cast("long").alias("dst")),
        F.struct(F.col(b).cast("long").alias("src"), F.col(a).cast("long").alias("dst")),
    )).alias("e")).select("e.src", "e.dst").localCheckpoint(eager=True))
    lap(f"[{trial}] sym checkpoint")
    n_sym = sym.count(); n_parts = sym.rdd.getNumPartitions()
    want = min(max(1, -(-n_sym // 500_000)), _shuffle_n(edges))
    lap(f"[{trial}] sym count {n_sym} parts {n_parts} want {want}")
    if want > n_parts:
        sym = sym.repartition(want, "dst").localCheckpoint(eager=True)
        lap(f"[{trial}] sym respread")
    lab = (sym.select(F.col("dst").alias("node")).distinct()
           .withColumn("lab", F.col("node")).localCheckpoint(eager=True))
    lap(f"[{trial}] lab checkpoint")
    first = lab.agg(F.sum("lab"), F.count(F.lit(1))).first()
    prev_sum, n_nodes = first[0], first[1]
    lap(f"[{trial}] init agg n={n_nodes}")
    for r in range(20):
        nbr = sym.join(F.broadcast(lab), sym.src == lab.node).select(
            F.col("dst").alias("node"), "lab")
        stepped = (lab.select("node", "lab").unionByName(nbr)
                   .groupBy("node").agg(F.min("lab").alias("lab"))
                   .localCheckpoint(eager=False))
        new_sum = stepped.agg(F.sum("lab")).first()[0]
        lap(f"[{trial}] round {r}: materialize+sum")
        if new_sum == prev_sum:
            print("converged", r); break
        prev_sum = new_sum
        jump = stepped.select(F.col("node").alias("m_node"), F.col("lab").alias("m_lab"))
        lab = (stepped.join(F.broadcast(jump), F.col("lab") == F.col("m_node"), "left")
               .select("node", F.coalesce(F.col("m_lab"), F.col("lab")).alias("lab")))
spark.stop()
