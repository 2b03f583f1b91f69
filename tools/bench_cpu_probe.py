"""No-Spark CPU-capacity probe for scaling-bench adjudication.

Runs a fixed-work pure-Python busy loop at 1, 4, and 32 worker processes
and reports aggregate throughput per level. The loop touches no memory
beyond a few ints, so the only thing that can stop K processes doing K
times the aggregate work of 1 process is the machine itself (hypervisor
CPU-steal / core capping) — there is no engine code, no Spark, no I/O,
no shared memory to blame.

Use: run immediately before/after a scaling-bench pair. If this probe
reads (say) 1.3x aggregate speedup at 4 processes, the window is
incapable of evidencing ANY parallel scaling and the pair's efficiency
sample is machine-invalid — same adjudication role as the vanilla-Spark
control in bench.py, but cheaper (~30 s) and with zero moving parts.

Output: one JSON line {"levels": {"1": {...}, "4": {...}, "32": {...}},
"speedup_1_to_4": x, "speedup_1_to_32": y}.
"""
import json
import multiprocessing as mp
import sys
import time

WORK_UNITS = 40  # chunks of _spin work per level (fixed, divisible by 1/4/32)
SPIN_N = 2_000_000  # inner-loop iterations per chunk (~0.1-0.2 s on this box)


def _spin(_i):
    acc = 0
    for k in range(SPIN_N):
        acc = (acc * 1103515245 + 12345 + k) & 0x7FFFFFFF
    return acc


def probe_level(procs):
    # Fixed total work (WORK_UNITS chunks) split across `procs` workers:
    # aggregate throughput = WORK_UNITS / wall, ideal speedup = procs.
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_spin, range(procs))  # warm up workers (untimed)
        t0 = time.time()
        pool.map(_spin, range(WORK_UNITS), chunksize=1)
        wall = time.time() - t0
    return {"procs": procs, "wall_sec": round(wall, 3),
            "chunks_per_sec": round(WORK_UNITS / wall, 2)}


def main():
    levels = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                               else ["1", "4", "32"])]
    out = {"levels": {}}
    for lv in levels:
        out["levels"][str(lv)] = probe_level(lv)
    base = out["levels"].get("1")
    if base:
        for lv in levels:
            if lv != 1 and str(lv) in out["levels"]:
                out[f"speedup_1_to_{lv}"] = round(
                    out["levels"][str(lv)]["chunks_per_sec"]
                    / base["chunks_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
