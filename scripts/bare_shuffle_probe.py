"""Bare-shuffle control for the scaling decomposition (VERDICT r4 #1):
a minimal Spark job with stage A's actual key shapes — ~60-byte URL
strings, short host strings, longs — through the same shuffle pattern
(hash repartition + groupBy + sort-window cut) with NONE of the
engine's operator logic. Its 8→32 scaling is the ceiling the Spark
shuffle machinery itself reaches on this box for these key widths; if
stage A scales like this control, the residual gap is the local-mode
shuffle/memory system, not the engine's plans.

Runs in-process twice (local[8], local[32]), clean JVM each via
spark-submit when available.

Usage: python scripts/bare_shuffle_probe.py [n_rows]
       SPARK_GRAFT_PROBE_CPUS=8 python scripts/bare_shuffle_probe.py  (single run)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def one(cpus: int) -> dict:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]").appName("bare_shuffle")
        .config("spark.driver.memory", "24g")  # VM-bench protocol heap
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def job():
        base = spark.range(0, N, 1, 64).select(
            F.concat(
                F.lit("https://host"), (F.col("id") % 20000).cast("string"),
                F.lit(".example.com/path/segment/page"), F.col("id").cast("string"),
                F.lit(".html?utm=x"),
            ).alias("url"),
            F.concat(F.lit("host"), (F.col("id") % 20000).cast("string")).alias("host"),
            F.col("id").alias("seq"),
            (F.xxhash64("id")).alias("url_hash"),
        )
        # the stage-A shuffle pattern: hash-key dedup agg → host agg join →
        # salted window cut, 64 partitions throughout
        dedup = base.groupBy("url_hash").agg(
            F.min_by(F.struct("url", "host", "seq"), "seq").alias("r")
        ).select("url_hash", "r.*")
        caps = dedup.groupBy("host").agg(F.count("*").alias("n"))
        joined = dedup.join(caps, "host")
        w = Window.partitionBy("host", F.pmod(F.col("seq"), F.lit(16))).orderBy("seq")
        cut = joined.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 50)
        return cut.select(F.count("*"), F.bit_xor("url_hash")).collect()

    job()  # warm (codegen, JIT)
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        job()
        secs = time.monotonic() - t0
        best = secs if best is None or secs < best else best
    spark.stop()
    return {"cpus": cpus, "secs": round(best, 3), "thr": round(N / best, 1)}


def main() -> None:
    solo = os.environ.get("SPARK_GRAFT_PROBE_CPUS")
    if solo:
        print("PROBE " + json.dumps(one(int(solo))))
        return
    # clean JVM per size via subprocess self-invocation
    results = {}
    for cpus in (8, 32, 8, 32):
        env = os.environ.copy()
        env["SPARK_GRAFT_PROBE_CPUS"] = str(cpus)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(N)],
            env=env, capture_output=True, text=True,
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("PROBE "):
                r = json.loads(line[6:])
                results.setdefault(cpus, []).append(r)
                print(line, flush=True)
                break
        else:
            raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])
    b8 = max(results[8], key=lambda r: r["thr"])
    b32 = max(results[32], key=lambda r: r["thr"])
    print(json.dumps({
        "n_rows": N, "secs8": b8["secs"], "secs32": b32["secs"],
        "speedup": round(b8["secs"] / b32["secs"], 2),
        "bare_shuffle_eff": round(b8["secs"] / b32["secs"] / 4, 3),
    }))


if __name__ == "__main__":
    main()
