"""Scratch: pagerank eager-checkpoint vs lazy-checkpoint vs composed.
Verifies identical results and compares wall time at sf0.1 shape."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (SparkSession.builder.master(f"local[{CPUS}]").appName("exp")
    .config("spark.sql.shuffle.partitions", str(CPUS * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

import __spark_entry__ as E
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# build the same graph q_pagerank uses
n = max(300, int(E.PR_NODES_PER_SF * E._sf_of(SF_DIR)))
nodes, edges = E._pr_graph(spark, n)
edges = edges.localCheckpoint(eager=True)
nodes = nodes.localCheckpoint(eager=True)
print("nodes:", n, "edges:", edges.count())

RANK_UNIT = 1e14
damping = 0.85
base = (1.0 - damping) / n
u0 = int((1.0 / n) * RANK_UNIT)


def variant(mode, iters=5):
    t0 = time.time()
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src")
    ranks = nodes.select(F.col("node").cast("long").alias("v"),
                         F.lit(u0).alias("u"))
    if mode in ("eager", "lazy"):
        ed = ed.localCheckpoint(eager=(mode == "eager"))
        ranks = ranks.localCheckpoint(eager=(mode == "eager"))
    out = None
    for _ in range(iters):
        contrib = (ed.join(F.broadcast(ranks), ed.src == ranks.v)
            .select("dst", F.floor(F.col("u").cast("double") / F.col("d")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s")))
        stepped = nodes.select(F.col("node").cast("long").alias("v")).join(
            F.broadcast(contrib), F.col("v") == F.col("dst"), "left")
        rd = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(RANK_UNIT))
        out = stepped.select("v", rd.alias("rd"))
        if mode == "eager":
            out = out.localCheckpoint(eager=True)
        elif mode == "lazy":
            out = out.localCheckpoint(eager=False)
        ranks = out.select("v", F.floor(F.col("rd") * F.lit(RANK_UNIT)).alias("u"))
    res = out.select(F.col("v").alias("node"), F.col("rd").alias("rank"))
    build = time.time() - t0
    t1 = time.time()
    agg = res.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.floor(F.col("rank") * F.lit(RANK_UNIT))).alias("s")).first()
    act = time.time() - t1
    print(f"{mode:9s} build={build:6.3f} action={act:6.3f} total={build+act:6.3f} "
          f"n={agg['n']} checksum={agg['s']}")
    return agg["s"]


for mode in ("eager", "lazy"):
    variant(mode)



def variant_copart(mode, iters=5):
    N = CPUS * 2
    t0 = time.time()
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").repartition(N, "dst").localCheckpoint(eager=True)
    nodes0 = (nodes.select(F.col("node").cast("long").alias("v"))
              .repartition(N, "v").localCheckpoint(eager=True))
    ranks = nodes0.select("v", F.lit(u0).alias("u"))
    out = None
    for _ in range(iters):
        contrib = (ed.join(F.broadcast(ranks), ed.src == ranks.v)
            .select("dst", F.floor(F.col("u").cast("double") / F.col("d")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s")))
        stepped = nodes0.join(contrib, F.col("v") == F.col("dst"), "left")
        rd = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(RANK_UNIT))
        out = stepped.select("v", rd.alias("rd"))
        if mode == "eager":
            out = out.localCheckpoint(eager=True)
        elif mode == "lazy":
            out = out.localCheckpoint(eager=False)
        ranks = out.select("v", F.floor(F.col("rd") * F.lit(RANK_UNIT)).alias("u"))
    res = out.select(F.col("v").alias("node"), F.col("rd").alias("rank"))
    build = time.time() - t0
    t1 = time.time()
    agg = res.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.floor(F.col("rank") * F.lit(RANK_UNIT))).alias("s")).first()
    act = time.time() - t1
    print(f"copart-{mode:9s} build={build:6.3f} action={act:6.3f} total={build+act:6.3f} "
          f"n={agg['n']} checksum={agg['s']}", flush=True)


def variant_copart2(mode, iters=5):
    N = CPUS * 2
    t0 = time.time()
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").repartition(N, "src").localCheckpoint(eager=True)
    nodes0 = (nodes.select(F.col("node").cast("long").alias("v"))
              .repartition(N, "v").localCheckpoint(eager=True))
    ranks = nodes0.select("v", F.lit(u0).alias("u"))
    out = None
    for _ in range(iters):
        contrib = (ed.join(ranks, ed.src == ranks.v)
            .select("dst", F.floor(F.col("u").cast("double") / F.col("d")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s")))
        stepped = nodes0.join(contrib, F.col("v") == F.col("dst"), "left")
        rd = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(RANK_UNIT))
        out = stepped.select("v", rd.alias("rd"))
        if mode == "eager":
            out = out.localCheckpoint(eager=True)
        elif mode == "lazy":
            out = out.localCheckpoint(eager=False)
        ranks = out.select("v", F.floor(F.col("rd") * F.lit(RANK_UNIT)).alias("u"))
    res = out.select(F.col("v").alias("node"), F.col("rd").alias("rank"))
    build = time.time() - t0
    t1 = time.time()
    agg = res.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.floor(F.col("rank") * F.lit(RANK_UNIT))).alias("s")).first()
    act = time.time() - t1
    print(f"copart2-{mode:9s} build={build:6.3f} action={act:6.3f} total={build+act:6.3f} "
          f"n={agg['n']} checksum={agg['s']}", flush=True)


for mode in ("lazy", "eager", "lazy", "none", "lazy", "none"):
    variant_copart2(mode)
for mode in ("lazy", "lazy"):
    variant_copart(mode)
import pyspark.sql
_d = None
spark.stop()
