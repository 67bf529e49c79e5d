import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.functions.text import tokenize
from cocoindex_data_ingestion_spark.operators.dedup import shingle_rows

spark = get_spark("dedup_hist")
docs = entrymod._t(spark, "/root/testdata/sf0.1", "documents")

# exact_substring: gram-hash occurrence histogram (min_len=8 as registry)
from pyspark.sql import Window
pos = docs.select(F.col("doc_id"), F.posexplode(tokenize("text")).alias("pos0","token"))
ow = Window.partitionBy("doc_id").orderBy("pos0")
parts = [F.col("token")] + [F.lead("token", i).over(ow) for i in range(1, 8)]
grams = (pos.withColumn("_last", parts[-1])
         .withColumn("h", F.md5(F.concat_ws(" ", *parts)))
         .filter(F.col("_last").isNotNull()).select("h"))
n = grams.count()
hist = (grams.groupBy("h").count()
        .groupBy().agg(F.count("*").alias("distinct_h"), F.max("count").alias("max_occ"),
                       F.expr("percentile_approx(count, 0.5)").alias("p50"),
                       F.expr("percentile_approx(count, 0.999)").alias("p999"),
                       F.sum(F.when(F.col("count")>=2, F.col("count")).otherwise(0)).alias("dup_rows"))
        ).first()
print("XSUB grams:", n, dict(hist.asDict()))
top = grams.groupBy("h").count().orderBy(F.col("count").desc()).limit(5).collect()
print("XSUB top5 occ:", [r["count"] for r in top])

# jaccard_prefix: shingle df histogram + prefix-token df histogram
tok = shingle_rows(docs, 3, "doc_id", "text", out_col="token")
dfr = tok.groupBy("token").agg(F.count("*").alias("tdf"))
s = dfr.agg(F.count("*"), F.max("tdf"), F.expr("percentile_approx(tdf, 0.5)"),
            F.expr("percentile_approx(tdf, 0.999)")).first()
print("PPJ shingles distinct/max/p50/p999:", list(s))
# prefix tokens only (what the candidate join actually sees)
ow2 = Window.partitionBy("id").orderBy("tdf", "token")
sw = Window.partitionBy("id")
pre = (tok.join(dfr, "token")
       .withColumn("rn", F.row_number().over(ow2))
       .withColumn("sz", F.count("*").over(sw))
       .filter(F.col("rn") <= F.col("sz") - F.ceil(F.lit(0.5)*F.col("sz")) + 1)
       .select("id","token"))
pdf = pre.groupBy("token").count()
s2 = pdf.agg(F.count("*"), F.max("count"), F.expr("percentile_approx(count, 0.999)")).first()
print("PPJ prefix-token distinct/max/p999:", list(s2))
print("PPJ prefix rows:", pre.count(), "of tok rows:", tok.count())
