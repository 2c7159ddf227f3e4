"""Engine-vs-host scaling diagnosis from task metrics, 4 -> 16 cores.

Wall-clock scaling on this sandbox is hostage to hypervisor neighbors
(tools/scaling_attempts_r03.jsonl / scaling_gated.py). From Spark event
logs of the SAME warmed flagship execution at 4 and 16 cores this
reports, per leg:

  * executor OCCUPANCY = executor run core-sec / (cores x wall): the
    engine-side scalability signal that contention cannot fake. An
    engine that serializes at higher parallelism (driver bottleneck,
    lock convoy, skewed partitions, empty-task overhead) shows idle
    executor threads; this engine measures ~0.98-0.99 at BOTH levels.
  * per-stage straggler balance (max/mean task duration on heavy
    stages) and the 4x-cores task layout.
  * total executor CPU time. Interpretation caveat learned the hard
    way: stalled cycles COUNT as thread CPU time, so under
    memory-bandwidth contention per-task CPU inflates with concurrent
    thread count. On the contended 2026-08-17 host the 16-core leg
    burned 3.5x the CPU per row at 98% occupancy with even tasks —
    i.e. all 16 streams executing, each starved by the shared bus.
    That combination (full occupancy + even tasks + inflated per-row
    CPU) is direct evidence the scaling loss is host-delivered
    bandwidth, not engine behavior: an engine-side loss CANNOT show
    full occupancy. On a quiet host the CPU ratio reads ~1.0 (work
    conservation).

Usage: python tools/scaling_workcheck.py            # both legs + report
       python tools/scaling_workcheck.py --leg 4    # one leg (internal)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/fg_eventlogs"


def run_leg(cores: int) -> None:
    os.makedirs(EVDIR, exist_ok=True)
    from featuregenerator_spark.plans.pipeline import (
        FEATURE_COLUMNS,
        build_turn_features,
    )
    from featuregenerator_spark.plans.temporal import with_ts_seconds
    from featuregenerator_spark.session import get_spark
    from featuregenerator_spark.sources.transcripts import synth_transcripts

    spark = get_spark(
        "fg-workcheck",
        cores=cores,
        shuffle_partitions=4 * cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
        },
    )
    sf = os.environ.get("SPARK_GRAFT_SCALE_SF", "4")
    import bench

    n_convs, max_turns, skew = bench.SF_SYNTH[sf]
    path = f"/tmp/fg_bench_transcripts_sf{sf}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tr = synth_transcripts(
            spark, n_convs=n_convs, max_turns=max_turns, seed=42,
            skew_conv_turns=skew,
        )
        tr.repartition(64, "conv_id").write.mode("overwrite").parquet(path)
    tr = spark.read.parquet(path)
    rows = tr.count()
    feat = build_turn_features(with_ts_seconds(tr)).select(*FEATURE_COLUMNS)
    feat.write.format("noop").mode("overwrite").save()  # JIT warm
    t0_ms = int(time.time() * 1000)
    w0 = time.time()
    feat.write.format("noop").mode("overwrite").save()  # the timed run
    wall = time.time() - w0
    t1_ms = int(time.time() * 1000)
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flushes the event log
    print(json.dumps({
        "cores": cores, "rows": rows, "wall_sec": round(wall, 3),
        "t0_ms": t0_ms, "t1_ms": t1_ms, "app_id": app_id,
    }))


def parse_log(app_id: str, t0_ms: int, t1_ms: int) -> dict:
    """Aggregate TaskEnd metrics for tasks launched inside [t0, t1]."""
    # Spark 4 rolling layout: eventlog_v2_<appId>/events_N_<appId>[.ext];
    # older Sparks write a single file named <appId>[.inprogress]
    cand = glob.glob(os.path.join(EVDIR, f"eventlog_v2_{app_id}", "events_*"))
    cand += [
        p for p in glob.glob(os.path.join(EVDIR, app_id + "*"))
        if os.path.isfile(p)
    ]
    cpu_ns = 0
    run_ms = 0
    n_tasks = 0
    stages: dict[int, list[float]] = {}
    for path in sorted(cand):
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            info = ev.get("Task Info", {})
            if not (t0_ms <= info.get("Launch Time", 0) <= t1_ms):
                continue
            m = ev.get("Task Metrics") or {}
            cpu_ns += m.get("Executor CPU Time", 0)
            run_ms += m.get("Executor Run Time", 0)
            n_tasks += 1
            dur = (info.get("Finish Time", 0) - info["Launch Time"]) / 1000.0
            stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    heavy = {
        sid: {
            "tasks": len(ds),
            "max_task_sec": round(max(ds), 2),
            "mean_task_sec": round(sum(ds) / len(ds), 2),
            "straggler_ratio": round(max(ds) / (sum(ds) / len(ds)), 2),
        }
        for sid, ds in stages.items()
        if sum(ds) > 0.05 * sum(sum(x) for x in stages.values())
    }
    return {
        "cpu_core_sec": round(cpu_ns / 1e9, 1),
        "run_core_sec": round(run_ms / 1e3, 1),
        "tasks": n_tasks,
        "heavy_stages": heavy,
    }


def main() -> None:
    if "--leg" in sys.argv:
        return run_leg(int(sys.argv[sys.argv.index("--leg") + 1]))
    out: dict[str, dict] = {}
    for cores in (4, 16):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(cores)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        leg = json.loads(
            [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        )
        leg.update(parse_log(leg["app_id"], leg["t0_ms"], leg["t1_ms"]))
        leg["executor_occupancy"] = round(
            leg["run_core_sec"] / (cores * leg["wall_sec"]), 3
        )
        out[f"cores_{cores}"] = leg
    c4, c16 = out["cores_4"], out["cores_16"]
    report = {
        "metric": "scaling_workcheck_4_to_16_cores",
        # the engine-side signal: idle executor threads at 16 cores
        # would mean the ENGINE failed to parallelize; ~1.0 at both
        # levels means every scaling loss is per-thread slowdown, which
        # only the host can cause (see module docstring)
        "executor_occupancy": {
            "cores_4": c4["executor_occupancy"],
            "cores_16": c16["executor_occupancy"],
        },
        # ~1.0 on a quiet host (work conservation); inflates under
        # bandwidth contention because stalled cycles count as CPU time
        "cpu_work_ratio_16_over_4": round(
            c16["cpu_core_sec"] / c4["cpu_core_sec"], 3
        ),
        "legs": out,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
