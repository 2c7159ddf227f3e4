"""Benchmark driver — prints ONE JSON line with per-query seconds.

Default: runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32):

  - flagship: full point-in-time turn-feature pipeline over a
    deterministic synthetic transcript table sized to the SF (plus one
    mega-conversation hot key), written to a noop sink;
  - pipeline_events: the same pipeline over the driver events table;
  - representative operator queries from __spark_entry__ (windows, as-of,
    dedup, LSH, ANN).

`--scaling` additionally runs the flagship at two parallelism levels
(N vs 4N local cores in separate subprocesses, default local[4] vs
local[16], interleaved reps, per-level min) and reports throughput +
scaling efficiency — the sandbox stand-in for the north rule's N vs 4N
executors criterion (see BASELINE.md §2 for why 4/16: the host gives 32
threads only ~25 effective cores, capping any engine's 8->32 at ~0.78).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# synthetic transcript scale per SF (≈ 6x lineitem rows of the same SF)
SF_SYNTH = {
    "0.001": (200, 40, 2_000),
    "0.01": (2_000, 50, 10_000),
    "0.1": (20_000, 55, 50_000),
    # scaling workload: hot key at <0.1% of rows — exercises the skew path
    # without an Amdahl ceiling (a window over ONE conversation is
    # inherently serial; 200k/6.4M serial rows would cap efficiency ~0.65)
    "1": (200_000, 60, 20_000),
    "4": (800_000, 60, 20_000),
    "8": (1_600_000, 60, 20_000),
}

BENCH_QUERIES = [
    "rolling_count_1h",
    "rolling_sum_24h",
    "sessionize_30m",
    "asof_last_purchase",
    "lookup_array_kernel_parity",
    "user_stats_salted",
    "neardup_token_jaccard",
    "minhash_lsh_candidates",
    "ann_cosine_top10",
]


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else base


def _noop(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_flagship(spark, sf: str) -> tuple[float, int]:
    """Synthetic-transcript feature pipeline; returns (sec, rows).

    The deterministic input table is staged to parquet once (untimed,
    reused across runs/parallelism levels) so the timed section measures
    the feature pipeline reading from storage — like production — and not
    the data generator.
    """
    from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
    from featuregenerator_spark.plans.temporal import with_ts_seconds
    from featuregenerator_spark.sources.transcripts import synth_transcripts

    n_convs, max_turns, skew = SF_SYNTH.get(sf, SF_SYNTH["0.1"])
    path = f"/tmp/fg_bench_transcripts_sf{sf}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tr = synth_transcripts(
            spark, n_convs=n_convs, max_turns=max_turns, seed=42,
            skew_conv_turns=skew,
        )
        # fixed file count so scan parallelism doesn't depend on which
        # parallelism level staged the data
        tr.repartition(64, "conv_id").write.mode("overwrite").parquet(path)
    tr = spark.read.parquet(path)
    rows = tr.count()
    # plan once (driver-serial analyzer/optimizer work amortizes over the
    # whole table in production); time executions of the same plan
    feat = build_turn_features(with_ts_seconds(tr)).select(*FEATURE_COLUMNS)

    def run() -> float:
        t0 = time.time()
        _noop(feat)
        return time.time() - t0

    # first run JIT-compiles every codegen stage (cold runs are 3-8x
    # slower and do not scale with cores); report the warmed steady state
    run()
    return min(run(), run()), rows


def run_skew_stress(spark) -> dict[str, float]:
    """The feature pipeline over three same-size transcript tables: no
    hot key, a ~10%-hot conversation, and ONE conversation holding every
    row (the Amdahl worst case for conv-partitioned windows). Evidences
    the layered skew strategy (salted conversation-level aggregation,
    O(1)-state range windows, AQE skew joins) and the time-chunked
    skew-parallel path (plans/skew.py), which runs the mega table both
    serial (standard) and chunked. Reported as absolute walls + ratios;
    the mega legs are deliberately pathological and are excluded from
    the headline total (separate top-level fields)."""
    from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
    from featuregenerator_spark.plans.skew import build_turn_features_chunked
    from featuregenerator_spark.plans.temporal import with_ts_seconds
    from featuregenerator_spark.sources.transcripts import synth_transcripts

    shapes = {
        # ~560k rows each; skew10's mega-conversation is ~56k rows (~10%);
        # skew_mega is ONE conversation holding every row — the Amdahl
        # worst case for conv-partitioned windows.
        "skew_uniform": dict(n_convs=20_000, max_turns=55, skew_conv_turns=0),
        "skew_hot10": dict(n_convs=18_200, max_turns=55, skew_conv_turns=56_000),
        "skew_mega": dict(n_convs=1, max_turns=5, skew_conv_turns=560_000),
    }

    def build_std(tr):
        return build_turn_features(with_ts_seconds(tr)).select(*FEATURE_COLUMNS)

    def build_std_horizon(tr):
        # gap_horizon run: the contract the chunked path is defined
        # against — same features, so serial-vs-chunked is apples-to-apples
        return build_turn_features(
            with_ts_seconds(tr), gap_horizon_seconds=86400.0
        ).select(*FEATURE_COLUMNS)

    def build_chunked(tr):
        # the skew-parallel path (plans/skew.py): windows evaluate over
        # (conv_id, time_chunk) partitions; feature-for-feature equal to
        # the standard gap-horizon run (pinned in tests/test_skew.py and
        # by the driver's *_chunked oracle rows). Direct (router-less)
        # call: the auto router's hot-detection and routing joins cost
        # ~3 input scans — amortized at production scale, but they mask
        # the window-stage mechanism this entry isolates.
        return build_turn_features_chunked(tr).select(*FEATURE_COLUMNS)

    legs = {
        "skew_uniform": ("skew_uniform", build_std),
        "skew_hot10": ("skew_hot10", build_std),
        "skew_mega_serial": ("skew_mega", build_std_horizon),
        "skew_mega_chunked": ("skew_mega", build_chunked),
    }
    out: dict[str, float] = {}
    for name, (shape_name, builder) in legs.items():
        # cache key embeds the shape kwargs + seed: editing the shapes dict
        # must invalidate the staged parquet, or round-over-round skew
        # ratios silently compare against stale inputs
        import hashlib

        shape_sig = hashlib.sha256(
            repr(("seed", 42, sorted(shapes[shape_name].items()))).encode()
        ).hexdigest()[:10]
        path = f"/tmp/fg_bench_{shape_name}_{shape_sig}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            tr = synth_transcripts(spark, seed=42, **shapes[shape_name])
            tr.repartition(64, "conv_id").write.mode("overwrite").parquet(path)
        tr = spark.read.parquet(path)
        feat = builder(tr)
        _noop(feat)  # JIT warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _noop(feat)
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def run_curation(spark, cores: int) -> dict[str, float]:
    """Curation-battery throughput (non-headline): the SF documents table
    replicated 100x with a deterministic id remap, pseudo-lines derived,
    then the WHOLE battery — all 11 Gopher rule metrics, C4 cleaning,
    PII counts, token count, the linear model prob — in ONE select of
    pure Column exprs. This
    is the scan-speed claim made measurable: docs/s through ~40 string/
    array HOF features at once. The 5k-row base is repartitioned BEFORE
    the 100x broadcast cross join so only ~5 MB shuffles and the battery
    evaluates on cores*4 partitions."""
    from pyspark.sql import functions as F

    from featuregenerator_spark.operators.quality_rules import (
        quality_rule_columns,
    )
    from featuregenerator_spark.operators.quality_model import (
        DEMO_BIAS,
        DEMO_WEIGHTS,
        linear_score_columns,
    )
    from featuregenerator_spark.operators.text_analysis import token_count
    from featuregenerator_spark.operators.text_clean import (
        c4_clean_columns,
        pii_scrub_columns,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_rep = 100
    n_docs = docs.count() * n_rep
    big = (
        docs.repartition(cores * 4)
        .crossJoin(F.broadcast(spark.range(n_rep).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") * n_rep + F.col("rep")).alias("doc_id"),
            F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1.\n").alias(
                "text"
            ),
        )
    )
    q = quality_rule_columns(F.col("text"))
    c4 = c4_clean_columns(F.col("text"))
    pii = pii_scrub_columns(F.col("text"))
    out = big.select(
        "doc_id",
        *[v.alias(k) for k, v in q.items()],
        c4["n_kept_lines"].alias("c4_kept_lines"),
        c4["keep_doc"].alias("c4_keep_doc"),
        pii["n_email"].alias("pii_emails"),
        token_count(F.col("text")).alias("n_tokens"),
        linear_score_columns(F.col("text"), DEMO_WEIGHTS, DEMO_BIAS)[
            "quality_prob"
        ].alias("model_prob"),
    )
    _noop(out)  # JIT warmup, same as every other entry
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        _noop(out)
        best = min(best, time.time() - t0)
    return {
        "curation_battery": round(best, 3),
        "curation_docs_per_sec": round(n_docs / best, 1),
    }


def _time_family(qmap, spark, names) -> dict[str, float]:
    """Warm once (JIT-compiles the codegen stages), then min of two
    executions of the same plan — the single timing policy every bench
    family uses."""
    out: dict[str, float] = {}
    for name in names:
        df = qmap[name](spark, SF_DIR)
        _noop(df)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _noop(df)
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def _time_full_cycle(qmap, spark, names) -> dict[str, float]:
    """Times the WHOLE query callable — staging, snapshot commits, and
    the final read — not just the final plan. For queries whose work IS
    the commit protocol (the _time_family policy would time only the
    post-commit scan). Each invocation re-stages from scratch (the
    queries rmtree their base first), so reps measure the full cycle;
    one warm rep absorbs JIT."""
    out: dict[str, float] = {}
    for name in names:
        fn = qmap[name]
        _noop(fn(spark, SF_DIR))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        return run_scaling()

    cores = CPUS
    for i, a in enumerate(sys.argv):
        if a == "--cores":
            cores = int(sys.argv[i + 1])

    # host-quietness probe BEFORE the JVM exists: taken after session
    # startup it under-reads by ~2-3/16 (startup threads look like
    # contention — measured 12.2 in-run vs 15.1 external seconds apart
    # on a rep that then ran at quiet-window speed), mislabeling quiet
    # headline windows as dirty
    probe_headline_before = _effective_cores(16)

    from featuregenerator_spark.session import get_spark

    spark = get_spark(
        "fg-bench",
        cores=cores,
        # 4x cores at every parallelism level (the standard production
        # sizing rule): ~4 waves per stage smooth stragglers — measured
        # 31.7s -> 21.7s at 32 cores on the sf8 flagship, and it is what
        # lifts 8->32-core scaling efficiency past 0.8 (tail variance at
        # 1 wave/stage dominates the 32-core side otherwise)
        shuffle_partitions=4 * cores,
        # small local files: split finer than the 128MB default so the scan
        # parallelizes at 32 cores (a real cluster keeps the default)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            # RAM-backed shuffle dirs: the sandbox's overlay /tmp adds
            # high-variance I/O latency; cluster deployments use NVMe
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    sf = os.environ.get("SPARK_GRAFT_BENCH_SF") or _sf_of(SF_DIR)

    import __spark_entry__ as entrymod

    queries: dict[str, float] = {}

    # the closing bracket lands right after the headline family below;
    # the non-headline families run minutes later, so a post-process
    # probe would conflate their window with the headline's (the
    # round-4/5 quiet-window chases need the headline bracket)
    t, rows = run_flagship(spark, sf)
    queries["flagship_transcripts"] = round(t, 3)
    turns_per_sec = rows / t if t > 0 else 0.0
    probe_headline_after = _effective_cores(16)  # re-read below the full family

    skew_ratio = skew_mega_speedup = None
    skew_mega: dict[str, float] = {}
    incremental: dict[str, float] = {}
    substring: dict[str, float] = {}
    text_ops: dict[str, float] = {}
    session7: dict[str, float] = {}
    layout_ops: dict[str, float] = {}
    snapshot_ops: dict[str, float] = {}
    retrieval_ops: dict[str, float] = {}
    encoding_ops: dict[str, float] = {}
    if "--pipeline-only" not in sys.argv:
        skew = run_skew_stress(spark)
        # the deliberately-pathological mega legs stay out of the headline
        # sum (round-over-round comparability); reported as own fields
        skew_mega = {k: skew.pop(k) for k in ("skew_mega_serial", "skew_mega_chunked")}
        queries.update(skew)
        skew_ratio = round(skew["skew_hot10"] / skew["skew_uniform"], 3)
        skew_mega_speedup = round(
            skew_mega["skew_mega_serial"] / skew_mega["skew_mega_chunked"], 3
        )
        qmap = entrymod.queries()
        queries.update(_time_family(qmap, spark, BENCH_QUERIES))
        probe_headline_after = _effective_cores(16)

        # incremental-dedup legs (round 3 additions): like skew_mega,
        # reported as separate fields, NOT in the headline sum, to keep
        # the total comparable round-over-round. The pair contrasts the
        # exact batch-vs-corpus pair scan with the LSH band-equijoin
        # scale path on identical output (best-match decisions pinned
        # identical in tests/test_incremental.py).
        incremental = _time_family(
            qmap, spark, ("dedup_incremental", "dedup_incremental_lsh")
        )

        # substring-dedup legs (round 4): the ExactSubstr report + trim
        # over the full documents table, non-headline like the other
        # post-r2 families. One window-hash explode feeds both; trim
        # additionally pays the canonical min(struct) agg and the
        # indexed-lambda rebuild.
        substring = _time_family(
            qmap, spark, ("substring_dup_coverage", "substring_dup_trim")
        )

        # session-6 curation/dedup family (round 4): the relational
        # LM-perplexity filter (train + score + tertiles), paragraph
        # dedup, the deterministic mixture resample, and TF-IDF top
        # terms — non-headline like the other post-r2 families.
        text_ops = _time_family(
            qmap,
            spark,
            (
                "quality_lm_perplexity",
                "paragraph_dedup",
                "source_mix_sample",
                "tfidf_top_terms",
            ),
        )

        # session-7 family (round 4): EWMA decayed window features, the
        # theta-sketch profiling battery, SemDeDup semantic dedup, audio
        # DSP features, and the JSONL/CSV source roundtrips — non-headline
        # like the other post-r2 families. The source roundtrips time a
        # full write+read+scan cycle, not just a scan.
        session7 = _time_family(
            qmap,
            spark,
            (
                "ewma_decayed_activity",
                "sketch_profile_events",
                "semdedup_prune",
                "audio_spectral",
                "source_jsonl_roundtrip",
                "source_csv_roundtrip",
                "interval_session_assign",
                "image_phash_neardup",
                "chunk_pack_documents",
            ),
        )

        # session-8 family (round 4): physical-layout + ingest-robustness
        # tooling — ORC roundtrip (write+read, bloom-indexed), small-file
        # compaction (fragment 24-way x per-day dirs, AQE-rebalance
        # rewrite, full read-back), the Morton z-order key (stats pass +
        # codegen interleave over every event), corrupt-record
        # quarantine (text+from_json parse of the whole table), and the
        # superset-schema evolution read (two staged writes + dual-dir
        # scan).
        layout_ops = _time_family(
            qmap,
            spark,
            (
                "source_orc_roundtrip",
                "compact_roundtrip",
                "zorder_key",
                "source_jsonl_corrupt_audit",
                "source_csv_corrupt_audit",
                "schema_evolution_read",
            ),
        )

        # snapshot-table family (round 5): the Iceberg commit protocol
        # end-to-end — snapshot_pruned_read stages three appends (with
        # stats aggs) then a file-skipped range read; cow_upsert_delete
        # stages, then pays a full MERGE (semi-join locate + rewrite)
        # and a COW DELETE. Non-headline; full-cycle timing (staging +
        # commits + read — the commit protocol IS the workload, so the
        # plan-only policy would measure just the final scan).
        snapshot_ops = _time_full_cycle(
            qmap,
            spark,
            (
                "snapshot_isolation_read",
                "snapshot_pruned_read",
                "snapshot_cow_upsert_delete",
            ),
        )

        # retrieval/curation-front-end family (round 5 session 2): BM25
        # corpus search, bit-reproducible Lloyd k-means over the
        # embeddings table, the UT1-style domain-blocklist audit, and
        # rule-based HTML main-content extraction — non-headline like
        # the other post-r2 families.
        retrieval_ops = _time_family(
            qmap,
            spark,
            (
                "bm25_topk",
                "kmeans_assign",
                "url_domain_filter",
                "html_extract",
            ),
        )

        # feature-encoding family (round 5 session 2): leakage-safe
        # target encoding (chunked distributed prefix sum), data-driven
        # quantile binning, and relational BPE tokenizer training —
        # non-headline.
        encoding_ops = _time_family(
            qmap,
            spark,
            (
                "target_encode_pit",
                "quantile_bins",
                "bpe_train",
                "psi_drift",
                "psi_drift_cat",
                "bpe_token_count",
                "negative_pairs",
            ),
        )

    curation: dict[str, float] = {}
    if "--pipeline-only" not in sys.argv:
        curation = run_curation(spark, cores)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cores": cores,
                "probe_headline_before": probe_headline_before,
                "probe_headline_after": probe_headline_after,
                "flagship_rows": rows,
                "flagship_turns_per_sec": round(turns_per_sec, 1),
                "skew_slowdown_ratio": skew_ratio,
                "skew_mega": skew_mega,
                "skew_mega_chunked_speedup": skew_mega_speedup,
                "dedup_incremental": incremental,
                "substring_dedup": substring,
                "text_ops": text_ops,
                "session7_ops": session7,
                "layout_ops": layout_ops,
                "snapshot_ops": snapshot_ops,
                "retrieval_ops": retrieval_ops,
                "encoding_ops": encoding_ops,
                "curation": curation,
            }
        )
    )


def _spin(secs: float) -> int:
    # module-level so multiprocessing can pickle it
    t0 = time.time()
    x = 0
    while time.time() - t0 < secs:
        x += 1
    return x


def _effective_cores(n: int, secs: float = 1.5) -> float:
    """Measured parallel capacity at n spinner processes (the sandbox's 32
    vCPUs are hypervisor-shared: 32 spinners only get ~25 cores' worth,
    which caps 8->32 efficiency at ~0.78 for ANY engine; 16 spinners get
    ~14.7). Recorded in the output so the N vs 4N choice is auditable.

    The single-process baseline is the max over interleaved samples taken
    before AND after the n-proc pool (one noisy sample would skew the
    ratio; max = the least-contended observation of true 1-core speed),
    and the result is clamped to n (n procs can never exceed n cores)."""
    import multiprocessing as mp

    def one() -> float:
        with mp.Pool(1) as p:
            (b,) = p.map(_spin, [secs])
        return b

    bases = [one(), one()]
    with mp.Pool(n) as p:
        r = p.map(_spin, [secs] * n)
    bases += [one(), one()]
    return round(min(float(n), sum(r) / max(bases)), 1)


def run_scaling() -> None:
    """Same job at N and 4N cores -> throughput + scaling efficiency.

    Defaults to 4 vs 16 cores (SPARK_GRAFT_SCALE_CORES=4,16): the sandbox
    host gives 32 threads only ~25 effective cores (see _effective_cores),
    which would cap 8->32 at ~0.78 regardless of engine quality; 4 and 16
    both fit inside the real capacity, so the measurement reflects the
    engine, not the hypervisor. Uses the sf=4 synthetic size (~25M turns)
    so per-core work dominates fixed stage-scheduling overhead.
    """
    # the sandbox shares a host: multi-minute load drift can hit one
    # parallelism level and not the other. Interleave repetitions of the
    # two levels and take the per-level minimum (steady-state throughput),
    # so a noisy window can't bias the ratio.
    lo, hi = (
        int(c) for c in os.environ.get("SPARK_GRAFT_SCALE_CORES", "4,16").split(",")
    )
    sf = os.environ.get("SPARK_GRAFT_SCALE_SF", "4")
    results = {}
    walls: dict[int, list[float]] = {lo: [], hi: []}
    # 3 interleaved reps per level: the host is hypervisor-shared and
    # noise windows can last minutes — per-level min over 3 spread-out
    # reps is much more likely to catch a quiet window at both levels
    for cores in (lo, hi, lo, hi, lo, hi):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cores),
            SPARK_GRAFT_BENCH_SF=sf,
            SPARK_DRIVER_MEM="48g",
        )
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores), "--pipeline-only"],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        walls[cores].append(results[cores]["queries"]["flagship_transcripts"])
    t_lo = min(walls[lo])
    t_hi = min(walls[hi])
    tput_lo = results[lo]["flagship_rows"] / t_lo
    tput_hi = results[hi]["flagship_rows"] / t_hi
    efficiency = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{lo}_to_{hi}_cores",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "throughput_rows_per_sec": {
                    f"cores_{lo}": round(tput_lo, 1),
                    f"cores_{hi}": round(tput_hi, 1),
                },
                "wall_sec": {f"cores_{lo}": t_lo, f"cores_{hi}": t_hi},
                "wall_sec_reps": {f"cores_{lo}": walls[lo], f"cores_{hi}": walls[hi]},
                "effective_host_cores": {
                    f"at_{lo}_procs": _effective_cores(lo),
                    f"at_{hi}_procs": _effective_cores(hi),
                },
                "sf": sf,
                "rows": results[lo]["flagship_rows"],
            }
        )
    )


if __name__ == "__main__":
    main()
