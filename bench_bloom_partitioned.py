#!/usr/bin/env python
"""Partitioned-Bloom scale bench (VERDICT r1 task 2): build a 2^30-bit
sharded filter (128 MiB of bitmaps — the regime where broadcasting the
whole filter to every probe task stops being free) over a multi-million-
key seen set, entirely executor-side, then measure the shard-
co-partitioned probe throughput.  Writes BENCH/bloom_partitioned.json.

Run: spark-submit --driver-memory 24g bench_bloom_partitioned.py
 (or python bench_bloom_partitioned.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))

N_KEYS = int(os.environ.get("GRABSPARK_PBLOOM_KEYS", "4000000"))
N_BITS = 1 << 30
N_SHARDS = 64


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("grabspark-pbloom-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from grabspark.session import attach_package

    attach_package(spark)
    from grabspark.bloom import PartitionedBloom, partitioned_prefilter

    pb = PartitionedBloom(
        tempfile.mkdtemp(prefix="grabspark-pbloom-bench-"),
        n_bits=N_BITS,
        n_hashes=7,
        n_shards=N_SHARDS,
    )
    pb.create()
    keys = spark.range(N_KEYS).select(
        F.concat(F.lit("http://h"), (F.col("id") % 1024).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("k")
    )
    # warm-up (JIT + python workers + sandbox CPU ramp)
    pb_warm = PartitionedBloom(
        tempfile.mkdtemp(prefix="grabspark-pbloom-warm-"), n_bits=1 << 22, n_hashes=7, n_shards=N_SHARDS
    )
    pb_warm.create()
    pb_warm.update(keys.limit(200_000), "k")

    t0 = time.time()
    pb.update(keys, "k")
    t_build = time.time() - t0

    probe = spark.range(2 * N_KEYS).select(
        F.concat(F.lit("http://h"), (F.col("id") % 1024).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("k")
    )
    t0 = time.time()
    tagged = partitioned_prefilter(probe, F.col("k"), pb, spark, out_col="m")
    n_maybe = tagged.filter(F.col("m")).count()
    t_probe = time.time() - t0

    out = {
        "n_bits": N_BITS,
        "n_shards": N_SHARDS,
        "n_keys": N_KEYS,
        "build_sec": round(t_build, 3),
        "build_keys_per_sec": round(N_KEYS / t_build),
        "probe_rows": 2 * N_KEYS,
        "probe_sec": round(t_probe, 3),
        "probe_keys_per_sec": round(2 * N_KEYS / t_probe),
        "n_maybe": n_maybe,
        "true_positive_floor": N_KEYS,  # every inserted key must probe true
        "fp_rate_est": round(max(0, n_maybe - N_KEYS) / N_KEYS, 6),
        "shard_files": len(pb.shard_files()),
        "filter_mib": round(N_BITS / 8 / 2**20, 1),
    }
    assert n_maybe >= N_KEYS, "false negatives detected!"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bloom_partitioned.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
