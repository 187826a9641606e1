"""Two-parallelism scaling evidence for BASELINE.json's north_rule.

No real cluster exists in the sandbox, so the N -> 4N executor scaling
criterion is evidenced by running the IDENTICAL engine job on the
IDENTICAL input at local[8] and local[32] (fresh process each — Spark
fixes master at JVM start) and reporting throughput at both plus
efficiency (T_32 / T_8) / 4. Results land in BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_clips] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys, time, tempfile, json
sys.path.insert(0, {repo!r})
from nadeefiler_spark.session import get_spark
from nadeefiler_spark import datagen
from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.presets import default_clip_rules
from nadeefiler_spark.profiler import default_clips_config

cpus, n_clips, trials, data_dir = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
spark = get_spark(app_name=f"scale{{cpus}}", parallelism=cpus)
clips = spark.read.parquet(f"{{data_dir}}/clips")
refs = spark.read.parquet(f"{{data_dir}}/transcript_refs")

# Warmup outside the timed window: JVM JIT + GC heuristics + Python
# workers + OS page cache for the full dataset (the steady state of a
# long-running production job over hot storage). Two full passes —
# measured: G1/JIT keep adapting through the first repeat.
for _ in range(2):
    warm = tempfile.mkdtemp(prefix=f"scale_warm_{{cpus}}_")
    weng = ValidationEngine(spark, warm, rules=default_clip_rules(with_drift=True),
                            profile_cfg=default_clips_config())
    weng.run(clips, refs=refs, resume=False)

# hot-path (decode pandas-UDF) scaling, measured separately: on a real
# 4N-executor cluster each JVM is independent; in one local JVM the
# driver/GC/page-cache are shared, so the end-to-end number undersells
from nadeefiler_spark.rules.audio_rules import decode_facts
dec = []
for _ in range(trials):
    t0 = time.monotonic()
    decode_facts(clips).write.format("noop").mode("overwrite").save()
    dec.append(time.monotonic() - t0)
dec_wall = sorted(dec)[len(dec) // 2]

walls = []
for t in range(trials):
    out = tempfile.mkdtemp(prefix=f"scale_out_{{cpus}}_")
    eng = ValidationEngine(spark, out, rules=default_clip_rules(with_drift=True),
                           profile_cfg=default_clips_config())
    t0 = time.monotonic()
    eng.run(clips, refs=refs, resume=False)
    walls.append(time.monotonic() - t0)
wall = sorted(walls)[len(walls) // 2]
print("RESULT " + json.dumps({{"cpus": cpus, "wall_s": round(wall, 3),
                               "clips_per_sec": round(n_clips / wall, 1),
                               "trials_s": [round(w, 3) for w in walls],
                               "decode_wall_s": round(dec_wall, 3),
                               "decode_clips_per_sec": round(n_clips / dec_wall, 1),
                               "decode_trials_s": [round(w, 3) for w in dec]}}))
"""


def gen_data(n_clips: int, dur_min_ms: int, dur_max_ms: int) -> str:
    data_dir = tempfile.mkdtemp(prefix="scale_data_")
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from nadeefiler_spark.session import get_spark\n"
        "from nadeefiler_spark import datagen\n"
        f"spark = get_spark(app_name='gen', parallelism=32)\n"
        f"datagen.write_clips(spark, {data_dir!r}, datagen.GenConfig("
        f"n_rows={n_clips}, dur_min_ms={dur_min_ms}, dur_max_ms={dur_max_ms}))\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return data_dir


def run_at(cpus: int, n_clips: int, trials: int, data_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cpus), str(n_clips), str(trials), data_dir],
        capture_output=True, text=True, check=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line in child output:\n{p.stdout}\n{p.stderr}")


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # realistic speech-clip durations (seconds, not the test-default
    # 60-400ms) so decode compute — the part that scales with cores —
    # dominates fixed job-launch latency, as it would at production scale
    dur_min = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    dur_max = int(sys.argv[4]) if len(sys.argv) > 4 else 6000
    data_dir = gen_data(n_clips, dur_min, dur_max)
    r8 = run_at(8, n_clips, trials, data_dir)
    r32 = run_at(32, n_clips, trials, data_dir)
    eff = (r32["clips_per_sec"] / r8["clips_per_sec"]) / 4.0
    dec_eff = (r32["decode_clips_per_sec"] / r8["decode_clips_per_sec"]) / 4.0
    out = {"n_clips": n_clips, "dur_ms": [dur_min, dur_max],
           "local8": r8, "local32": r32,
           "scaling_efficiency_N_to_4N": round(eff, 3),
           "decode_scaling_efficiency_N_to_4N": round(dec_eff, 3)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
