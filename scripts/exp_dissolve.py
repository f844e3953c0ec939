"""Scratch: where does dissolve spend time now?"""
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
from cadastre_pg_spark.operators.graph import connected_components

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
lap("build rects")
for trial in range(2):
    t0 = time.time()
    pairs = rect_overlap_join(rects, level=E.OVL_LEVEL)
    lap(f"[{trial}] build pairs plan")
    np_ = pairs.count()
    lap(f"[{trial}] pairs count ({np_})")
    cc = connected_components(pairs, a="a_id", b="b_id")
    lap(f"[{trial}] cc built")
    ncc = cc.count()
    lap(f"[{trial}] cc count ({ncc})")
    from cadastre_pg_spark.operators.spatial_join import release_cached
    release_cached(cc)
    release_cached(pairs)
spark.stop()
