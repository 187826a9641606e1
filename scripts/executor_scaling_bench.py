"""Multi-executor emulation of the N -> 4N scaling criterion.

A real 4N-executor cluster is 4x as many INDEPENDENT JVMs, each with its
own heap, GC, Python workers, and memory bus share — not one JVM with 4x
threads. The closest in-sandbox model: run the identical engine job as

  leg A (N executors):  ONE  local[8] process over the whole input
  leg B (4N executors): FOUR concurrent local[8] processes, each over a
                        disjoint quarter of the input (its data slice),
                        writing to its own output dir

Slices are hash(clip_id) % 4 — balanced, codec-skew preserved inside
each slice, exactly how a cluster partitions work across executors.
Throughput = total clips / wall; efficiency = (T_B / T_A) / 4.

Usage: python scripts/executor_scaling_bench.py <data_dir> <n_clips> [trials]
       (data_dir from scripts/scaling_bench.py, or omit to generate)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys, time, tempfile
sys.path.insert(0, {repo!r})
from nadeefiler_spark.session import get_spark
from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.presets import default_clip_rules
from nadeefiler_spark.profiler import default_clips_config

data_dir, warmups, trials = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(app_name="exec8", parallelism=8)
clips = spark.read.parquet(f"{{data_dir}}/clips")
refs = spark.read.parquet(f"{{data_dir}}/transcript_refs")
for _ in range(warmups):
    eng = ValidationEngine(spark, tempfile.mkdtemp(prefix="exwarm_"),
                           rules=default_clip_rules(), profile_cfg=default_clips_config())
    eng.run(clips, refs=refs, resume=False)
walls = []
for _ in range(trials):
    eng = ValidationEngine(spark, tempfile.mkdtemp(prefix="exrun_"),
                           rules=default_clip_rules(), profile_cfg=default_clips_config())
    t0 = time.monotonic()
    eng.run(clips, refs=refs, resume=False)
    walls.append(time.monotonic() - t0)
print("WALLS " + ",".join(f"{{w:.3f}}" for w in walls))
"""


def split_slices(data_dir: str, n_slices: int = 4) -> str:
    out = tempfile.mkdtemp(prefix="exec_slices_")
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from nadeefiler_spark.session import get_spark\n"
        "from pyspark.sql import functions as F\n"
        "spark = get_spark(app_name='slice', parallelism=32)\n"
        f"for name in ('clips', 'transcript_refs'):\n"
        f"    df = spark.read.parquet(f'{data_dir}/{{name}}')\n"
        f"    df = df.withColumn('_slice', F.pmod(F.xxhash64('clip_id'), F.lit({n_slices})))\n"
        f"    for s in range({n_slices}):\n"
        f"        (df.where(F.col('_slice') == s).drop('_slice')\n"
        f"           .write.mode('overwrite').partitionBy('part')\n"
        f"           .parquet(f'{out}/slice{{s}}/{{name}}'))\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return out


def run_children(dirs: list[str], warmups: int, trials: int) -> tuple[float, list[list[float]]]:
    """Run one child per dir CONCURRENTLY; each does its own warmups then
    `trials` timed runs. Returns (median-total-wall, per-child trials).
    Children synchronize implicitly: wall is measured around the full
    concurrent batch of timed trials (warmups excluded via two-phase
    protocol is overkill; we take per-trial maxima instead)."""
    # model an 8-core executor CONTAINER: the JVM must see 8 cpus (else
    # it sizes GC/JIT pools for the whole host — 4 JVMs x 32 GC threads
    # thrash) and a container-sized heap
    env = dict(os.environ,
               SPARK_GRAFT_JVM_EXTRA="-XX:ActiveProcessorCount=8",
               SPARK_GRAFT_DRIVER_MEM="6g")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD.format(repo=REPO), d, str(warmups), str(trials)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        )
        for d in dirs
    ]
    outs = [p.communicate()[0] for p in procs]
    for p in procs:
        if p.returncode != 0:
            raise RuntimeError("child failed")
    all_walls = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("WALLS "):
                all_walls.append([float(x) for x in line[6:].split(",")])
    # per-trial cluster wall = max over children (the straggler bounds it)
    return all_walls


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else None
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 96000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    assert data_dir, "pass the scaling_bench data dir (contains clips/ transcript_refs/)"

    # leg A: one 8-core executor, whole input
    a_walls = run_children([data_dir], warmups=2, trials=trials)[0]
    a_wall = sorted(a_walls)[len(a_walls) // 2]
    thr_a = n_clips / a_wall

    # leg B: four 8-core executors, disjoint quarters, concurrent
    slices_root = os.environ.get("EXEC_SLICES_DIR") or split_slices(data_dir, 4)
    slice_dirs = [f"{slices_root}/slice{s}" for s in range(4)]
    b_all = run_children(slice_dirs, warmups=2, trials=trials)
    b_cluster_walls = [max(w[i] for w in b_all) for i in range(trials)]
    b_wall = sorted(b_cluster_walls)[len(b_cluster_walls) // 2]
    thr_b = n_clips / b_wall

    print(json.dumps({
        "n_clips": n_clips,
        "legA_1x_local8": {"wall_s": round(a_wall, 3), "clips_per_sec": round(thr_a, 1),
                           "trials_s": [round(w, 3) for w in a_walls]},
        "legB_4x_local8": {"wall_s": round(b_wall, 3), "clips_per_sec": round(thr_b, 1),
                           "cluster_trials_s": [round(w, 3) for w in b_cluster_walls],
                           "per_executor_trials_s": [[round(w, 3) for w in ws] for ws in b_all]},
        "executor_scaling_efficiency_N_to_4N": round((thr_b / thr_a) / 4.0, 3),
    }, indent=2))


if __name__ == "__main__":
    main()
