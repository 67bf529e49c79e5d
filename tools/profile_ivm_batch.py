"""Profile one foreach_batch_ivm micro-batch: job count + phase wall
times, to name the floor the r6 tuned bench row exposed (VERDICT r6
directive #3). Usage: python tools/profile_ivm_batch.py [sf_dir]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.plans.ivm import MaterializedAgg
from cocoindex_data_ingestion_spark.sources.tables import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile_ivm")
sc = spark.sparkContext

tmp = tempfile.mkdtemp(prefix="prof_ivm_")
src = os.path.join(tmp, "src")
base = load_table(spark, "events", sf_dir).select(
    "event_id", "ts", "user_id", "event_type", "value", "props"
)
base.repartition(10).write.parquet(src)
# one micro-batch = one of the 10 files (as maxFilesPerTrigger=1 does)
files = sorted(
    os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
)
batch1 = spark.read.parquet(files[0])
batch2 = spark.read.parquet(files[1])

view = MaterializedAgg(
    spark, os.path.join(tmp, "state"), group_col="event_type",
    sum_cols=("value",), n_buckets=8,
)


def profiled(tag, fn):
    sc.setJobGroup(tag, tag)
    t0 = time.time()
    fn()
    wall = time.time() - t0
    jobs = sc.statusTracker().getJobIdsForGroup(tag)
    print(f"{tag}: {wall:.2f}s, {len(jobs)} jobs")
    sc.setJobGroup("other", "other")
    return wall, len(jobs)


profiled("refresh_batch1_cold_state", lambda: view.refresh(inserts=batch1))
profiled("refresh_batch2_warm_state", lambda: view.refresh(inserts=batch2))
profiled("refresh_batch2_again", lambda: view.refresh(inserts=batch2))

shutil.rmtree(tmp, ignore_errors=True)
