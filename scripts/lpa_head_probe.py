"""Timing probe for the r9 LPA alignment-flip regression question.

The r9 final bench recorded graph_label_propagation at a normalized
ratio of 1.21 (5.71 s in a 0.822x session vs the 5.74 s r8 driver
baseline) right after commit 2abee3a rebuilt the loop around an eager
initial-labels localCheckpoint.  This probe times the query warm,
N reps, alongside a stable untouched reference (graph_triangles) so
two runs of the probe against different code states can be compared
on normalized time (lpa / triangles) rather than raw seconds.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from ab_metadata_pusher_spark.plans import analytics_queries as aq

SF_DIR = "/root/testdata/sf0.1"
REPS = 5


def timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # warmup both
    timed(aq.q_graph_label_propagation, spark)
    timed(aq.q_graph_triangles, spark)
    lpa, tri = [], []
    for _ in range(REPS):
        lpa.append(timed(aq.q_graph_label_propagation, spark))
        tri.append(timed(aq.q_graph_triangles, spark))
    lpa_s = sorted(lpa)
    tri_s = sorted(tri)
    med_l = lpa_s[len(lpa_s) // 2]
    med_t = tri_s[len(tri_s) // 2]
    print("lpa  reps:", [round(x, 2) for x in lpa])
    print("tri  reps:", [round(x, 2) for x in tri])
    print(f"median lpa {med_l:.2f}s  median tri {med_t:.2f}s  "
          f"lpa/tri {med_l / med_t:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
