"""Single-parallelism-level extraction benchmark job.

Run as a subprocess pinned to exactly N CPUs (``taskset -c 0-{N-1}``) so a
``local[N]`` session cannot borrow idle host cores for its python workers —
this makes the two-cluster-size scaling measurement honest (an N-core run
behaves like an N-core cluster, per the north rule's N vs 4N criterion).

Usage: python -m pdfextractor_spark.benchjob <corpus_parquet> <cores> [reps] [group]
Prints one JSON line: {"cores": N, "docs": D, "wall_sec": W, "docs_per_sec": T}

``group`` (default 1) batches consecutive runs: the reported wall is the
minimum over groups of the group's PER-RUN mean. A high-parallelism leg
that runs 4x faster per run uses group=4 so its min-of-N estimator
averages noise over the same wall-clock window length as the
low-parallelism leg's single runs — otherwise the short leg's min can
cherry-pick a quiet 30-second window the long leg must average over,
inflating the measured scaling ratio one-sidedly.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import os

    corpus_path = sys.argv[1]
    cores = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    group = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # partitions per core (measured: 4 beats 8 here — task overhead exceeds
    # the straggler savings at this corpus size)
    parts_mult = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS_MULT", "4"))

    from pyspark.sql import functions as F

    from pdfextractor_spark.pipeline.fused import extract_fused
    from pdfextractor_spark.session import get_spark

    # shuffle spill to RAM-backed tmpfs: removes disk-IO variance from the
    # scaling measurement (a real cluster has fast local NVMe per executor)
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm = f"/dev/shm/spark-bench-{os.getpid()}"
        os.makedirs(shm, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = shm

    spark = get_spark(app_name=f"benchjob-{cores}", cores=cores)
    pages = spark.read.parquet(corpus_path)

    def run() -> tuple[float, int, float | None]:
        t0 = time.perf_counter()
        silver = extract_fused(pages, num_partitions=cores * parts_mult)
        out = silver.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("total_goals").alias("goals"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("failures"),
            F.sum(F.when(F.col("text_match"), 1).otherwise(0)).alias("matched"),
            F.sum(F.when(F.col("text_match").isNotNull(), 1).otherwise(0)).alias("parity_rows"),
        ).collect()[0]
        rate = (out["matched"] / out["parity_rows"]) if out["parity_rows"] else None
        return time.perf_counter() - t0, int(out["docs"]), rate

    # Warm-up on a slice at the MEASURED stage shape (same partition count):
    # the first full run in a fresh JVM otherwise pays an ~8 s absolute tax
    # (C2 JIT of the scan/shuffle/arrow hot loops, python worker ramp) that
    # a 400-doc single-wave warmup does not absorb. The tax is absolute, so
    # it deflates a short high-parallelism leg by ~15% while costing a long
    # low-parallelism leg ~5% — a systematic bias on the scaling ratio, not
    # noise (measured: rep0 55.5 s vs rep1 46.8 s at 8 cores / 80k docs;
    # after a 4000-doc full-shape warmup the warmup itself absorbs the gap).
    extract_fused(pages.limit(4000), num_partitions=cores * parts_mult).agg(
        F.count(F.lit(1))).collect()

    runs = [run() for _ in range(reps)]
    docs, match_rate = runs[0][1], runs[0][2]
    group = max(1, min(group, reps))
    walls = [r[0] for r in runs]
    # min over groups of the group's per-run mean (group=1 == min-of-N)
    wall = min(sum(walls[i:i + group]) / group
               for i in range(0, reps - group + 1, group))
    spark.stop()
    shm = os.environ.get("SPARK_LOCAL_DIRS", "")
    if shm.startswith("/dev/shm/spark-bench-"):
        import shutil

        shutil.rmtree(shm, ignore_errors=True)
    print(json.dumps({"cores": cores, "docs": docs, "wall_sec": round(wall, 3),
                      "docs_per_sec": round(docs / wall, 2),
                      "byte_match_rate": round(match_rate, 6) if match_rate is not None else None}))


if __name__ == "__main__":
    main()
