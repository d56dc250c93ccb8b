#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] as
$SPARK_GRAFT_BENCH_REPS INTERLEAVED full passes (per-query min across
passes — back-to-back reps share one steal window on this noisy VM;
interleaved samples land minutes apart), print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

--scaling: run the flagship clip pipeline across a parallelism ladder
(local[2]/local[8]/local[32]) in subprocesses on the SAME materialized
input and report throughput per level plus N→4N scaling efficiencies and a
hardware spin-loop baseline (sandbox stand-in for N vs 4N executors, per
BASELINE.json north_rule) — summarized in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = (
    "quality_filter_clips",   # flagship: full langid+scrub+rules pipeline
    "heli_identify_docs",     # pure langid mapInPandas
    "heli_topk_docs",         # C6 top-k over the FULL table (batched scorer)
    "q1_pricing_summary",     # wide hash aggregation
    "region_revenue",         # 5-way broadcast join chain
    "events_sessions",        # window sessionization
    "char_trigrams",          # n-gram explode + count (T1/T3)
    "dedup_minhash_lsh",      # shingle->minhash->band self-join
    "ann_bruteforce",         # embedding cosine top-k
    "simhash",                # signed bit aggregate
)


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return -1.0


def run_bench() -> dict:
    import __spark_entry__ as entrymod
    from heliport_spark.plans import get_spark

    spark = get_spark(app_name="heliport_spark_bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    # JVM/model warmup on the tiny sf so first-query timing isn't JIT noise
    # (fall back to SF_DIR when the driver fixture path doesn't exist on
    # this host — the warmup must never be the thing that crashes the bench)
    warm_sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{warm_sf}/documents.parquet"):
        warm_sf = SF_DIR
    qs["heli_identify_docs"](spark, warm_sf).count()

    # INTERLEAVED min-of-N (VERDICT r03 #5): run the whole suite as R full
    # passes and take each query's min ACROSS passes. Back-to-back reps of
    # one query both land inside the same host-steal storm and min() can't
    # reject it — round 3's audit burned time on 1.12-1.18x phantom drifts
    # on unchanged queries for exactly this reason. Interleaving puts a
    # query's samples minutes apart, so a burst poisons at most one of them.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    rowcounts: dict[str, int] = {}
    # steady-state pipeline input materialized up front (quality_filter_clips
    # includes fixture PCM synthesis; pipeline_materialized measures the
    # pipeline itself, which is what a cluster would run)
    path = ensure_scaling_clips(spark)
    _timed_pipeline_run(spark, path)  # warmup: JIT + python workers + mmap
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.time()
            rowcounts[name] = qs[name](spark, SF_DIR).count()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
        nrows, dt = _timed_pipeline_run(spark, path)
        rowcounts["pipeline_materialized"] = nrows
        dt = round(dt, 3)
        times["pipeline_materialized"] = min(
            times.get("pipeline_materialized", dt), dt
        )
    clips_per_sec = round(
        rowcounts["quality_filter_clips"] / times["quality_filter_clips"], 1
    )
    nrows = rowcounts["pipeline_materialized"]
    best = times["pipeline_materialized"]
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_label(SF_DIR),
        "cpus": CPUS,
        "clips_per_sec": clips_per_sec,
        "pipeline_clips_per_sec": round(nrows / best, 1),
        "pipeline_rows": nrows,
    }
    spark.stop()
    return out


SCALING_REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "160"))
# v2: replicas are salted with a distinct trailing token (see
# sources/clips.py) so the scorer's exact-duplicate shortcut cannot skip the
# scoring work this table exists to measure
def _sf_key(sf_dir: str) -> str:
    """Cache/state key for the scaling input: the parsed sf label when the
    dir follows the sf<float> convention, else a hash of the FULL path —
    two different unparseable corpora must never collide onto the same
    materialized clips table or min-merge their scaling measurements."""
    lbl = _sf_label(sf_dir)
    if lbl != -1.0:
        return str(lbl)
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:10]


SCALING_CLIPS = f"/tmp/heliport_scaling_clips_v2_{_sf_key(SF_DIR)}_{SCALING_REPLICATE}"


def ensure_scaling_clips(spark) -> str:
    """Materialize the scaling input once: documents replicated N× as a
    clips table with short PCM (the pipeline never decodes in the hot path;
    scoring work scales with transcript text, which is what replication
    multiplies). Both parallelism levels then read the SAME parquet input."""
    from heliport_spark.sources.clips import clips_from_documents

    if not os.path.exists(os.path.join(SCALING_CLIPS, "_SUCCESS")):
        clips = clips_from_documents(
            spark, SF_DIR, with_golden=False,
            replicate=SCALING_REPLICATE, max_pcm_ms=250,
        )
        clips.write.mode("overwrite").parquet(SCALING_CLIPS)
    return SCALING_CLIPS


def _timed_pipeline_run(spark, path: str) -> "tuple[int, float]":
    """One full-pipeline pass forcing every decision column (an agg over all
    outputs so Catalyst cannot prune the scrub/rule expressions)."""
    from pyspark.sql import functions as F

    from heliport_spark.pipeline import quality_filter

    clips = spark.read.parquet(path)
    out = quality_filter(clips, with_ft=False)
    t0 = time.time()
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.sum(F.length("scrubbed_text")).alias("scrub_len"),
        F.sum("quality.scrub_spans").alias("spans"),
        F.sum(F.length("lang")).alias("lang_len"),
    ).collect()[0]
    return int(row["n"]), time.time() - t0


def run_flagship_only() -> dict:
    from heliport_spark.plans import get_spark

    # Partition sizing: the stage is Arrow-batch-bound — the scorer's fixed
    # per-batch costs amortize over ≥10k-row batches, so partitions must
    # carry ≥ maxRecordsPerBatch rows. The v2 table (~6.4 GB, 800k rows) at
    # the default 128 MB split gives ~50 partitions ≈ 16k rows each — right.
    # (An earlier 16 MB override, tuned for the round-1 slower scorer, made
    # ~385 partitions of ~2k rows: measured 2× SLOWER once the scorer got
    # fast, because every task became one sub-sized Arrow batch.)
    spark = get_spark(
        app_name="heliport_spark_scaling",
        master=f"local[{CPUS}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_scaling_clips(spark)
    _timed_pipeline_run(spark, path)  # warmup: JIT + python workers + mmap
    reps = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPS", "3"))
    best, n = None, 0
    for _ in range(reps):  # min-of-N: host CPU steal on this shared VM is bursty
        n, dt = _timed_pipeline_run(spark, path)
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cpus": CPUS, "rows": n, "sec": round(best, 3),
            "rows_per_sec": round(n / best, 1)}


def _cpu_baseline(procs: int, secs: float = 2.0) -> float:
    """Per-process CPU capacity at a given concurrency (spin-loop iters/s) —
    exposes hypervisor steal / shared-host contention so code-scaling can be
    separated from hardware ceiling in the report."""
    from multiprocessing import Pool

    import _bench_spin  # noqa: F401  (module-level fn needed for Pool)

    with Pool(procs) as p:
        r = p.map(_bench_spin.spin, [secs] * procs)
    return sum(r) / len(r) / secs


def run_scaling() -> dict:
    """Same job, same materialized input, across a parallelism ladder
    (sandbox stand-in for N vs 4N executors per BASELINE.json north_rule).
    Reports N=2→4N=8 and N=8→4N=32 efficiencies plus the host's raw CPU
    ceiling at each concurrency.

    Resumable: each completed (round, level) leg is checkpointed to
    SPARK_GRAFT_SCALE_STATE so an interrupted ladder continues where it
    stopped instead of rerunning finished legs (the full ladder exceeds
    single-command time budgets on slow hosts)."""
    ladder = (2, 8, 32)
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    state_path = os.environ.get(
        "SPARK_GRAFT_SCALE_STATE", f"/tmp/heliport_scaling_state_{_sf_label(SF_DIR)}.json"
    )
    # Version-key the resume state to the input table identity AND the code
    # revision: legs recorded against a different scaling input (e.g. the
    # pre-salting v1 clips) must not be min-merged with fresh measurements
    # (ADVICE r02), and legs measured on an older engine revision must not
    # be reported as the current one's (round 5: a code-only change reused
    # a round-4 ladder verbatim because only the input was keyed).
    try:
        import subprocess

        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except OSError:
        rev = "unknown"
    version = f"{SCALING_CLIPS}@{rev}"
    state: dict = {}
    if os.path.exists(state_path):
        try:
            with open(state_path) as fh:
                state = json.load(fh)
        except (ValueError, OSError):
            state = {}  # truncated/corrupt state: restart the ladder
        if state.get("version") != version:
            state = {}
    results: dict = state.get("results", {})
    done: list = state.get("done", [])
    # Interleave levels across rounds and keep each level's best sample:
    # host CPU steal on this shared VM is bursty, so any single run can be
    # 2x off; the per-level minimum is the cleanest estimate of capability.
    for rnd in range(rounds):
        for cpus in ladder:
            leg = f"{rnd}:{cpus}"
            if leg in done:
                continue
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only"],
                capture_output=True, text=True, env=env,
            )
            if p.returncode != 0 or not p.stdout.strip():
                # surface the child's real failure instead of dying on
                # splitlines()[-1] with the stderr swallowed
                raise RuntimeError(
                    f"scaling leg {leg} failed (rc={p.returncode}):\n"
                    f"{p.stderr[-2000:]}"
                )
            r = json.loads(p.stdout.strip().splitlines()[-1])
            k = str(cpus)
            if k not in results or r["sec"] < results[k]["sec"]:
                results[k] = r
            done.append(leg)
            # atomic: a kill mid-write must not brick the resume the state
            # exists to provide
            tmp = state_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"version": version, "results": results, "done": done}, fh
                )
            os.replace(tmp, state_path)
    try:
        hw = {str(c): round(_cpu_baseline(c), 0) for c in ladder}
    except Exception:
        hw = {}
    r2, r8, r32 = results["2"], results["8"], results["32"]
    eff_2_8 = round((r8["rows_per_sec"] / r2["rows_per_sec"]) / 4, 4)
    eff_8_32 = round((r32["rows_per_sec"] / r8["rows_per_sec"]) / 4, 4)
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": eff_2_8,
        "unit": "ratio",
        "eff_2_to_8": eff_2_8,
        "eff_8_to_32": eff_8_32,
        "ladder": results,
        "hw_spin_iters_per_proc": hw,
        "sf": _sf_label(SF_DIR),
        "replicate": SCALING_REPLICATE,
    }


if __name__ == "__main__":
    if "--flagship-only" in sys.argv:
        print(json.dumps(run_flagship_only()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
