"""Probe-gated scaling reps: same protocol as `bench.py --scaling`, gated.

The sandbox host alternates between quiet and contended windows on
~10-minute timescales (tools/scaling_attempts_r03.jsonl: seven full
interleaved attempts on 2026-08-17, every one straddled a contended
window on at least one leg — e.g. attempt 7's 4-core leg hit the clean
53.4 s signature while its 16-core legs ran under a probe reading of
8.9/16 effective cores). Unlike round 2's memory-bandwidth-shaped
contention, today's contention IS visible to the ALU spin probe, so the
fix is to gate on it.

This runner measures the IDENTICAL job on the IDENTICAL staged input
with the identical per-level-MIN rule as `bench.py --scaling`; the only
change is scheduling: each single-level rep runs only when
`_effective_cores(n)` reports the host can actually deliver the n cores
being measured, and it re-probes after the rep so a window that
degraded mid-rep is visible in the log. Legs alternate across gated
windows instead of being packed into one 15-minute attempt. Every rep
(clean or not) is appended to the JSONL log; the final efficiency is
computed from per-level minima exactly as bench.py does.

Usage: python tools/scaling_gated.py [--budget-min 100] [--log PATH]
           [--clean16 WALL]

If the log already exists, its reps SEED the wall pool (identical job +
identical staged input across runs), so an interrupted hunt resumes
instead of re-chasing a leg it already landed; `--clean16` tightens the
16-core clean signature to chase a fully-quiet window. A final record
appended under a tightened bar reports `both_legs_clean` against THAT
bar — read it next to the bar it was run with.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: reuse _effective_cores + rep runner)

# clean-signature walls from the attempt history (r1 quiet host: 59.2/14.7;
# r2 representative: 58.3/17.1; r3 attempt 7: 53.4 at 4 cores). A rep at or
# under these bounds is a quiet-window measurement.
CLEAN_WALL = {4: 57.0, 16: 18.0}
# Gate BOTH leg types on the 16-proc probe: it is the sensitive contention
# detector. Measured 20:09: the 4-proc probe read 3.9/4 (looks clean) while
# the 16-proc probe read 12.9/16 and the actual 4-core rep landed at 77 s
# vs the 53-57 s clean signature — light neighbor load hides inside 4
# spinners' share but is unmistakable at 16.
PROBE_GATE_16 = 15.0


def run_leg(cores: int, sf: str = "4") -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_BENCH_SF=sf,
        SPARK_DRIVER_MEM="48g",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py"),
         "--cores", str(cores), "--pipeline-only"],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    budget_min = 100.0
    log_path = "tools/scaling_gated_r03.jsonl"
    for i, a in enumerate(sys.argv):
        if a == "--budget-min":
            budget_min = float(sys.argv[i + 1])
        if a == "--log":
            log_path = sys.argv[i + 1]
        if a == "--clean16":
            # tighten the 16-core clean signature (e.g. to chase a
            # fully-quiet window and prove wall parity across refactors)
            CLEAN_WALL[16] = float(sys.argv[i + 1])
        if a == "--clean4":
            # tighten the 4-core clean signature: after the first fully
            # quiet 16-core window landed 12.98 s (20% under the prior
            # best), the per-level-min efficiency went superlinear
            # (1.075) — evidence the 4-core leg's best window was still
            # externally loaded. Chasing a matching-quality 4-core wall
            # bounds the honest efficiency from below.
            CLEAN_WALL[4] = float(sys.argv[i + 1])

    t_end = time.time() + budget_min * 60
    walls: dict[int, list[float]] = {4: [], 16: []}
    rows = None
    order = [16, 4]  # 16-core legs are the ones the host has been denying

    # Resume: seed walls from reps already in the log so an interrupted
    # run (or a prior session's run) doesn't re-chase a leg it already
    # landed clean. Identical job + identical staged input across runs,
    # so reps are poolable; the per-level-min rule is unchanged.
    if os.path.exists(log_path):
        for line in open(log_path):
            rec = json.loads(line)
            if rec.get("event") == "rep":
                walls[rec["cores"]].append(rec["wall_sec"])
            if rec.get("rows"):
                rows = rec["rows"]

    def log(rec: dict) -> None:
        rec["t"] = time.strftime("%H:%M:%S")
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    while time.time() < t_end:
        done = all(
            walls[c] and min(walls[c]) <= CLEAN_WALL[c] for c in (4, 16)
        )
        if done:
            break
        # pick the neediest level first: one without a clean rep yet
        for cores in sorted(order, key=lambda c: bool(walls[c] and min(walls[c]) <= CLEAN_WALL[c])):
            probe = bench._effective_cores(16)
            if probe < PROBE_GATE_16:
                log({"event": "gate_skip", "cores": cores, "probe_16": probe})
                time.sleep(30)  # host contended — wait for a quiet window
                break
            res = run_leg(cores)
            wall = res["queries"]["flagship_transcripts"]
            rows = res["flagship_rows"]
            probe_after = bench._effective_cores(16)
            walls[cores].append(wall)
            log({
                "event": "rep", "cores": cores, "wall_sec": wall,
                "probe_before": probe, "probe_after": probe_after,
                "clean": wall <= CLEAN_WALL[cores],
                "turns_per_sec": res["flagship_turns_per_sec"],
            })
    if walls[4] and walls[16] and rows:
        t4, t16 = min(walls[4]), min(walls[16])
        eff = (rows / t16) / (rows / t4) / 4.0
        final = {
            "metric": "scaling_efficiency_4_to_16_cores",
            "value": round(eff, 3),
            "unit": "ratio",
            "throughput_rows_per_sec": {
                "cores_4": round(rows / t4, 1), "cores_16": round(rows / t16, 1),
            },
            "wall_sec": {"cores_4": t4, "cores_16": t16},
            "wall_sec_reps": {"cores_4": walls[4], "cores_16": walls[16]},
            "both_legs_clean": t4 <= CLEAN_WALL[4] and t16 <= CLEAN_WALL[16],
            "protocol": "probe-gated single-leg reps, per-level min (see module docstring)",
            "sf": "4", "rows": rows,
        }
        log(final)


if __name__ == "__main__":
    main()
