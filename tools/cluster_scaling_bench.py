"""Two-cluster-size scaling evidence on REAL multi-executor JVMs.

``local-cluster[N, coresPerExec, memMB]`` is Spark's built-in testing
master that launches N genuine executor PROCESSES (separate JVMs via
CoarseGrainedExecutorBackend) with real RPC, real serialization, and
real Netty shuffle fetches between them — the closest in-sandbox
stand-in for an N-executor cluster that exists (``local[N]`` threads
share one heap and skip the network stack entirely; see
tools/scaling_bench.py for that protocol). This tool runs the flagship
pipeline at N and 4N single-core executors and reports the same
per-core-normalized efficiency metric:

    eff = throughput_hi / (4 * throughput_lo)

Memory fairness is structural here: each executor brings its own heap,
so 4N executors hold 4x the total memory — exactly what a real
N -> 4N scale-up provides.

Usage:
    python tools/cluster_scaling_bench.py --pages 1000000 --lo 2 --hi 8
    python tools/cluster_scaling_bench.py --worker --execs 8   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(
    execs: int, pages_n: int, seed: int, exec_mem_mb: int, partitions: int = 0
) -> None:
    import shutil

    from ny_campaign_finance_dedupe_spark.plans.pipeline import (
        DedupePipeline,
        PipelineConfig,
    )
    from ny_campaign_finance_dedupe_spark.session import get_spark, scratch_dir
    from ny_campaign_finance_dedupe_spark.sources.checkpoint import CheckpointStore
    from ny_campaign_finance_dedupe_spark.synth import synth_pages

    # executors fork python workers from the same interpreter
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    # ship the package to the executors' python workers the way a real
    # cluster submit does (north_rule: spark-submit --py-files) — in
    # local-cluster mode the executor JVMs spawn their OWN python
    # workers, which do not inherit the driver's sys.path
    pyzip = _build_pyfiles()
    spark = get_spark(
        f"cluster-scaling-{execs}",
        master=f"local-cluster[{execs},1,{exec_mem_mb}]",
        # partitions>0: data-sized protocol — same count both levels
        # (see tools/scaling_bench.py); 0 = legacy 2 per executor
        shuffle_partitions=partitions or 2 * execs,
        extra_conf={
            # local-cluster requires executor.memory == the master
            # string's memMB or the worker refuses the allocation
            "spark.executor.memory": f"{exec_mem_mb}m",
            "spark.driver.memory": "4g",
            "spark.submit.pyFiles": pyzip,
            # every executor JVM on this ONE host sees a 32-core machine
            # and sizes its GC/JIT/netty pools for it; at 4N executors
            # that oversubscribes the host ~4N/1x in a way no real
            # cluster does (each real executor owns its node). Cap each
            # JVM's self-sizing at its granted core count + 1 so the
            # topology, not host contention, is what the two levels
            # compare (without this, the extract stage scales
            # NEGATIVELY 2 -> 8 executors on this VM).
            "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=2",
            # UI on for the post-run per-stage executor telemetry
            # snapshot (tools/stage_telemetry.py)
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
        },
    )
    spark.sparkContext.addPyFile(pyzip)
    spark.sparkContext.setLogLevel("ERROR")
    pages, _ = synth_pages(
        spark, n_pages=pages_n, seed=seed, partitions=partitions or 2 * execs
    )
    pages = pages.persist()
    pages.count()  # materialize input outside the timed region
    os.makedirs(scratch_dir(), exist_ok=True)
    ckpt_root = tempfile.mkdtemp(
        prefix=f"nycfd_clscale{execs}_", dir=scratch_dir()
    )
    t0 = time.perf_counter()
    store = CheckpointStore(ckpt_root)
    em = DedupePipeline(PipelineConfig(), store).run(spark, pages)
    rows = em.count()
    secs = time.perf_counter() - t0
    # content equivalence across topologies (order-insensitive; see
    # tools/scaling_bench.py — float cluster_score excluded on purpose)
    import pyspark.sql.functions as F

    em_hash = str(
        em.select(
            # ANSI mode: a long SUM overflows; accumulate in decimal(38,0)
            F.sum(
                F.xxhash64("record_id", "cluster_id").cast("decimal(38,0)")
            ).alias("h")
        ).collect()[0]["h"]
    )
    stage_walls = {}
    for st in ("extract", "signatures", "block", "pairs", "score", "cluster"):
        mp = store._meta_path(st)
        if mp.exists():
            stage_walls[st] = round(
                json.loads(mp.read_text())["wall_clock_s"], 2
            )
    # best-effort executor telemetry (never fails the measurement)
    try:
        from tools.stage_telemetry import stage_exec_metrics

        stage_exec = stage_exec_metrics(spark)
    except Exception:
        stage_exec = None
    shutil.rmtree(ckpt_root, ignore_errors=True)
    print(
        json.dumps(
            {
                "executors": execs,
                "pages": pages_n,
                "secs": round(secs, 2),
                "pages_per_sec": round(pages_n / secs, 1),
                "entity_map_rows": rows,
                "entity_map_hash": em_hash,
                "stage_walls": stage_walls,
                "stage_exec": stage_exec,
            }
        )
    )


def _build_pyfiles() -> str:
    """dist/nycfd_spark.zip via tools/make_pyfiles.py (same artifact the
    spark-submit jobs ship)."""
    here = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "make_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.strip().splitlines()[-1]


def run_level(
    execs: int, pages_n: int, seed: int, exec_mem_mb: int, partitions: int = 0
) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            "--execs",
            str(execs),
            "--pages",
            str(pages_n),
            "--seed",
            str(seed),
            "--exec-mem-mb",
            str(exec_mem_mb),
            "--partitions",
            str(partitions),
        ],
        capture_output=True,
        text=True,
        check=False,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    if out.returncode != 0 or not line.startswith("{"):
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(
            f"worker local-cluster[{execs}] failed rc={out.returncode}"
        )
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--execs", type=int, default=None)
    ap.add_argument("--lo", type=int, default=2, help="N executors")
    ap.add_argument("--hi", type=int, default=8, help="4N executors")
    ap.add_argument(
        "--exec-mem-mb",
        type=int,
        default=4096,
        help="heap per executor (memory fairness is structural: "
        "4N executors bring 4x total memory, like a real scale-up)",
    )
    ap.add_argument("--worker", action="store_true")
    ap.add_argument(
        "--partitions",
        type=int,
        default=0,
        help="shuffle/input partition count at BOTH levels (0 = legacy 2*execs)",
    )
    args = ap.parse_args()
    if args.worker:
        worker(args.execs, args.pages, args.seed, args.exec_mem_mb, args.partitions)
        return
    lo = run_level(args.lo, args.pages, args.seed, args.exec_mem_mb, args.partitions)
    hi = run_level(args.hi, args.pages, args.seed, args.exec_mem_mb, args.partitions)
    assert lo["entity_map_rows"] == hi["entity_map_rows"], (
        "entity map differs between cluster sizes"
    )
    assert lo["entity_map_hash"] == hi["entity_map_hash"], (
        "entity-map CONTENT differs between cluster sizes"
    )
    ratio = args.hi / args.lo
    eff = hi["pages_per_sec"] / (ratio * lo["pages_per_sec"])
    print(
        json.dumps(
            {
                "metric": f"cluster_scaling_efficiency_{args.lo}_to_{args.hi}",
                "value": round(eff, 3),
                "unit": "ratio",
                "lo": lo,
                "hi": hi,
                "speedup": round(hi["pages_per_sec"] / lo["pages_per_sec"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
