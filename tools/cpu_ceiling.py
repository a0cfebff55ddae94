"""Pure-CPU scaling ceiling for this box (no Spark, no memory pressure).

Runs an L1-resident integer-arithmetic kernel under multiprocessing at
each proc count and reports per-proc throughput; the N->4N ratio of
per-proc throughputs is the hardware's own scaling ceiling — the upper
bound ANY software (including this engine) can measure on this VM. Used
to contextualize tools/scaling_bench.py results in BASELINE.md: a
shared/virtualized box does not deliver 4x work from 4x `local[n]`
threads even for perfectly parallel arithmetic.

Usage: python tools/cpu_ceiling.py [--procs 2 4 8] [--secs 20]
Prints one JSON line: {"per_proc": {n: tasks_per_sec}, "ceiling": {"2->8": r}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _kernel(out, secs: float) -> None:
    # L1-resident integer mix; counts completed inner blocks
    x, n = 12345, 0
    t_end = time.perf_counter() + secs
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    out.put(n / secs)


def measure(procs: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_kernel, args=(q, secs)) for _ in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / procs  # per-proc throughput


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--secs", type=float, default=20.0)
    args = ap.parse_args()
    per = {n: round(measure(n, args.secs), 4) for n in args.procs}
    ceil = {}
    for lo in args.procs:
        for hi in args.procs:
            if hi == 4 * lo and per[lo] > 0:
                ceil[f"{lo}->{hi}"] = round(per[hi] / per[lo], 3)
    print(json.dumps({"per_proc": per, "ceiling": ceil, "secs": args.secs}))


if __name__ == "__main__":
    main()
