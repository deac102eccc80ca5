#!/usr/bin/env python
"""Where does the DRIVER spend its time during one query?

Runs <query> once warm (like profile_query.py), then during the timed
rep samples the driver JVM's thread stacks every ~150 ms with jstack
and buckets the hot frames (Analyzer / Optimizer / physical planning /
AQE / DAGScheduler / codegen / execution-wait). This answers the
guide-§7.3 question for the plan-bound iterative loops: WHICH
single-threaded driver phase is the floor.

Usage: python scripts/profile_driver.py <query> [reps]
"""
from __future__ import annotations

import os
import re
import subprocess
import sys
import threading
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# frame-substring -> bucket, first match wins (ordered by specificity)
BUCKETS = [
    ("org.apache.spark.sql.catalyst.analysis", "analyzer"),
    ("org.apache.spark.sql.catalyst.optimizer", "optimizer"),
    ("ConstraintPropagation", "optimizer"),
    ("org.apache.spark.sql.execution.adaptive", "aqe"),
    ("org.apache.spark.sql.execution.exchange", "planning"),
    ("org.apache.spark.sql.execution.SparkStrateg", "planning"),
    ("org.apache.spark.sql.execution.QueryExecution", "planning"),
    ("org.apache.spark.sql.catalyst.plans.logical", "catalyst-misc"),
    ("org.apache.spark.sql.catalyst.trees", "catalyst-misc"),
    ("org.apache.spark.sql.catalyst.expressions.codegen", "codegen"),
    ("org.codehaus.janino", "codegen"),
    ("org.apache.spark.scheduler.DAGScheduler", "dagscheduler"),
    ("org.apache.spark.rdd", "rdd-exec"),
    ("org.apache.spark.sql.execution.collect", "collect"),
    ("py4j", "py4j-idle"),
]


def bucket_stack(stack: str) -> str:
    for needle, b in BUCKETS:
        if needle in stack:
            return b
    return "other"


def main(name: str, reps: int = 2) -> int:
    import __spark_entry__ as entrymod
    from simba_spark.context import get_spark

    spark = get_spark(app_name=f"pdrv_{name}", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    qs = dict(entrymod.queries())
    qs.update(getattr(entrymod, "extra_queries", dict)())
    if hasattr(entrymod, "prepare"):
        try:
            entrymod.prepare(spark, SF_DIR)
        except Exception as e:
            print(f"# prepare failed: {e}", file=sys.stderr)
    fn = qs[name]
    for i in range(reps - 1):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"rep {i} (warm-up): {time.time() - t0:.2f}s")

    # find the JVM pid: the py4j gateway child of this python process
    out = subprocess.check_output(
        ["pgrep", "-P", str(os.getpid()), "-f", "java"], text=True)
    jvm_pid = int(out.split()[0])

    samples: Counter = Counter()
    hot_frames: Counter = Counter()
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            try:
                dump = subprocess.check_output(
                    ["jstack", str(jvm_pid)], text=True,
                    stderr=subprocess.DEVNULL)
            except Exception:
                time.sleep(0.1)
                continue
            # split into per-thread stacks; keep RUNNABLE non-daemon-idle
            for th in dump.split("\n\n"):
                if '"' not in th or "RUNNABLE" not in th:
                    continue
                tname = th.split('"')[1]
                # the interesting thread: the one driving query execution
                # (main / Thread-N for py4j calls / AQE threads)
                if not (tname.startswith("Thread-")
                        or tname.startswith("main")
                        or "execution" in tname.lower()):
                    continue
                frames = re.findall(r"at ([\w.$]+)\(", th)
                if not frames:
                    continue
                sj = "\n".join(frames)
                b = bucket_stack(sj)
                samples[(tname.split("-")[0], b)] += 1
                if b != "py4j-idle":
                    # record the topmost spark frame for detail
                    top = next((f for f in frames
                                if f.startswith("org.apache.spark")), frames[0])
                    hot_frames[(b, top)] += 1
            time.sleep(0.05)

    th = threading.Thread(target=sampler, daemon=True)
    t0 = time.time()
    th.start()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    stop.set()
    th.join(timeout=2)

    print(f"\n=== {name}: timed rep {wall:.2f}s, "
          f"{sum(samples.values())} thread-samples ===")
    for (tname, b), n in samples.most_common(20):
        print(f"  {tname:10s} {b:14s} {n:5d}")
    print("\ntop frames:")
    for (b, f), n in hot_frames.most_common(25):
        print(f"  {n:5d}  {b:12s}  {f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2))
