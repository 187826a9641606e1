"""Memory-bus saturation probe: aggregate streaming bandwidth vs
process count on this host.

Purpose (BENCH/BASELINE.md): the engine's decode path streams
parquet -> Arrow -> numpy arrays; if the HOST's aggregate memory
bandwidth stops growing past ~8 concurrent streams, then end-to-end
scaling efficiency measured by putting 4 "executors" on ONE box is
bounded by the bus, not by the engine — a real 4N cluster brings 4x
buses along with 4x cores.

Each worker process streams over a 512 MB float32 array (np.sum — pure
sequential read, no page faults after the first pass) for `secs`
seconds and reports bytes read. Aggregate GB/s per process count tells
the story.

Usage: python scripts/membw_probe.py [secs_per_level]
Prints one JSON line: {procs: GBps, ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_BYTES = 512 * 1024 * 1024


def worker(secs: float, out) -> None:
    x = np.ones(ARR_BYTES // 4, dtype=np.float32)
    float(x.sum())  # fault pages in before timing
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < secs:
        float(x.sum())
        n += 1
    out.put(n * ARR_BYTES / (time.monotonic() - t0))


def measure(procs: int, secs: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(secs, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        out[str(procs)] = round(measure(procs, secs), 2)
    out["unit"] = "GB/s aggregate"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
