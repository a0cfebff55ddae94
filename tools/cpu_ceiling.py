"""Hardware scaling ceilings for this box (no Spark).

Two kernels, selected with --kernel:

- ``cpu`` (default): L1-resident integer arithmetic — the pure-CPU
  ceiling. A shared/virtualized box does not deliver 4x work from 4x
  processes even for perfectly parallel arithmetic; this measures how
  far off it is right now.
- ``mem``: LLC-defeating 256 MB numpy buffer copies — the MEMORY
  BANDWIDTH ceiling. The pipeline's checkpoint-I/O stages (signatures,
  block: tmpfs read/write of the corpus) are bandwidth-bound, and all
  N local[] threads share ONE memory bus, so their scaling is bounded
  by this ratio, not the CPU one. A real N->4N executor scale-up
  multiplies aggregate bandwidth by 4; this box cannot — which is why
  per-stage speedups split into a compute band (score: tracks the cpu
  ceiling) and an I/O band (signatures/block: tracks the mem ceiling).

The N->4N ratio of per-proc throughputs is the ceiling ANY software can
measure on this VM for that resource class. Used to bracket
tools/scaling_bench.py draws in BASELINE.md.

Usage: python tools/cpu_ceiling.py [--procs 2 8] [--secs 20] [--kernel cpu|mem]
Prints one JSON line: {"per_proc": {n: rate}, "ceiling": {"2->8": r}, "kernel": k}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _kernel(out, secs: float, barrier) -> None:
    # L1-resident integer mix; counts completed inner blocks
    barrier.wait()
    x, n = 12345, 0
    t_end = time.perf_counter() + secs
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 1
    out.put(n / secs)


def _mem_kernel(out, secs: float, barrier) -> None:
    # 2 x 128 MB buffers per proc — far beyond any LLC, so every copy is
    # bus traffic (counted as read + write bytes); GB/s per proc. All
    # allocation + first-touch faulting happens BEFORE the barrier: with
    # N procs concurrently faulting in N x 256 MB, an unsynchronized
    # start bills minutes of kernel page-zeroing to the timed window and
    # reports a fictitious 0.01-class ceiling (measured).
    import numpy as np

    src = np.ones(16 * 1024 * 1024, dtype=np.float64)
    dst = np.empty_like(src)
    traffic = src.nbytes * 2
    np.copyto(dst, src)  # fault in dst + warm the path
    barrier.wait()
    n = 0
    t_end = time.perf_counter() + secs
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
        n += 1
    out.put(n * traffic / secs / 1e9)


def measure(procs: int, secs: float, kernel: str = "cpu") -> float:
    target = _kernel if kernel == "cpu" else _mem_kernel
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [
        mp.Process(target=target, args=(q, secs, barrier))
        for _ in range(procs)
    ]
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
    ap.add_argument("--kernel", choices=["cpu", "mem"], default="cpu")
    args = ap.parse_args()
    per = {n: round(measure(n, args.secs, args.kernel), 4) for n in args.procs}
    ceil = {}
    for lo in args.procs:
        for hi in args.procs:
            if hi == 4 * lo and per[lo] > 0:
                ceil[f"{lo}->{hi}"] = round(per[hi] / per[lo], 3)
    print(
        json.dumps(
            {
                "per_proc": per,
                "ceiling": ceil,
                "kernel": args.kernel,
                "secs": args.secs,
            }
        )
    )


if __name__ == "__main__":
    main()
