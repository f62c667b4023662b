"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line. Additionally produces the north-rule scaling evidence: the
flagship extraction job at local[N] vs local[4N] (default N=1) over
the same seeded corpus (no real cluster in the sandbox — two
parallelism levels stand in for N vs 4N executors), reporting
docs/sec at both and the throughput scaling efficiency
(tp_4N / tp_N) / 4.

Usage: python bench.py            # full run (headline + scaling)
       python bench.py --fast     # headline only (iteration loop)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "36000"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
# path keyed by doc count: a stale corpus with a different count would
# silently corrupt the docs/sec math
CORPUS_PATH = f"/tmp/ocr_intern_bench_corpus_{BENCH_DOCS}.parquet"

HEADLINE = [
    "extract_full_pipeline",
    "extract_reading_order",
    "pricing_summary",
    "revenue_by_nation",
    "top_customer_per_nation",
    "dedup_minhash_fast_lsh_buckets",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "text_token_stats",
    "events_by_type",
    # round-3 additions — keep r1/r2 comparisons per-query, not on
    # the headline total (which grows with the set)
    "extract_xycut_order",
    "extract_html_block_classify",
    "text_gopher_repetition",
    "text_quality_classifier",
    "text_quality_ensemble",
    # round-4 additions: the 7-table broadcast-chain join stress and
    # the global_rank-backed decile segmentation (keeps the
    # distributed-rank operator's cost visible round over round)
    "market_share_by_year",
    "customer_spend_deciles",
    # session-9 addition: composite-key analytic decorrelation over
    # the fact (Q9 shape) — the newest fact-heavy shape, kept visible
    "product_profit_by_nation",
    # session-11 addition: the CCNet tertile split — bigram-LM scoring
    # pass + the materialized two-pass global rank, the TeraSort shape
    "text_ccnet_buckets",
]


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16g, NOT bigger: G1 with a huge heap measured ~8x slower on
        # this workload (allocation-heavy codegen projections); see
        # BENCH/BASELINE.md. NB: only the first session in a python
        # process sets the JVM heap — later .config() changes are
        # silently ignored, so bench runs each parallelism in the
        # same-process JVM created here.
        .config("spark.driver.memory", "16g")
        # big code cache: Spark's generated classes otherwise exhaust
        # the JIT cache and hot projections fall back to interpreter;
        # ParallelGC beat G1 ~2x on this allocation profile
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _shutdown_jvm(spark) -> None:
    """stop() the session AND kill the py4j gateway JVM. A stopped
    PySpark session leaves its JVM alive until the python process
    exits — during the scaling phase that idle JVM (8+ GB RSS, GC
    threads) measurably deflates the subprocess attempts (r2 measured
    local[4] 132.9 docs/s with it resident vs 300.4 without)."""
    from pyspark import SparkContext

    spark.stop()
    try:
        gw = SparkContext._gateway
        if gw is not None:
            gw.shutdown()
            # shutdown() only closes the py4j connection — the JVM
            # child is held alive by the gateway launcher pipe until
            # this python process exits; terminate it explicitly
            # (verified: without this the 8 GB JVM survived 45+ min
            # into the scaling phase)
            proc = getattr(gw, "proc", None)
            if proc is not None:
                proc.terminate()
            SparkContext._gateway = None
            SparkContext._jvm = None
    except Exception:
        pass  # best-effort; the subprocess attempts still run


QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "4.0"))
QUIET_TIMEOUT = float(os.environ.get("SPARK_GRAFT_QUIET_TIMEOUT", "300"))
# The SCALING gate is much stricter than the headline gate: the r3
# driver artifact launched its local[1] attempts at loads 2.1-2.9 —
# "quiet" under the old 4.0 gate — and the deflated draws pushed the
# median estimator to 0.745 < 0.8 while max passed at 0.998. Its own
# data shows 2+ loads deflate local[1] materially, so scaling attempts
# require a genuinely idle box and wait longer for one.
SCALING_QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_SCALING_QUIET_LOAD", "1.0"))
SCALING_QUIET_TIMEOUT = float(
    os.environ.get("SPARK_GRAFT_SCALING_QUIET_TIMEOUT", "600")
)


def _wait_quiet(
    limit: float = QUIET_LOAD, timeout: float = QUIET_TIMEOUT
) -> float:
    """Hold an attempt until the 1-min load average drops below
    `limit` (or `timeout` elapses). Host contention only DEFLATES
    throughput, so launching into a known-busy window wastes the
    attempt — r2's first scaling sweep ran entirely inside the
    post-headline busy window and measured 0.44× of the quiet-box
    value at every level. Returns the load actually observed at
    launch, which is recorded per-attempt for audit."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        load = os.getloadavg()[0]
        if load < limit:
            return load
        time.sleep(10)
    return os.getloadavg()[0]


def run_headline(spark) -> tuple[dict[str, float], dict[str, list[float]]]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # Warm-up at sf0.001: pays JVM JIT, janino codegen, Arrow channel
    # and Python-worker startup ONCE before any timed query — otherwise
    # the first headline entry absorbs ~20-60 s of one-time constants
    # that amortize to zero at real scale and only add inter-round
    # noise here (see BENCH/BASELINE.md). EVERY headline query warms:
    # each compiles its own generated classes (r3 measured the
    # minhash-LSH shingle projection at 12.7 s first-run vs 1.9 s
    # steady in the same JVM — warming only the flagship leaves that
    # first-run cost inside another query's attempt 1).
    for name in HEADLINE:
        _materialize(qs[name](spark, "/root/testdata/sf0.001"))
        # each invocation builds FRESH lineage objects, so caches from
        # the previous query are dead weight, never reused — drop them
        # after the terminal action (safe point: the frame is consumed)
        # so a long sweep's MEMORY_AND_DISK footprint stays one query
        # deep instead of growing monotonically
        spark.catalog.clearCache()

    # Best-of-2 per query (like the scaling section): host noise only
    # ever INFLATES wall time, so min-of-attempts converges on the
    # noise-free value and round-over-round deltas become attributable
    # to code, not the co-tenant. All raw attempts are reported.
    times: dict[str, float] = {}
    attempts: dict[str, list[float]] = {}
    for attempt in range(2):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            _materialize(fn(spark, SF_DIR))
            attempts.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            # dead caches from this attempt are never reused by the
            # next (fresh lineage per invocation) — release outside
            # the timed span
            spark.catalog.clearCache()
    for name in HEADLINE:
        times[name] = min(attempts[name])
    return times, attempts


def ensure_corpus() -> None:
    if not os.path.exists(CORPUS_PATH):
        from ocr_intern_spark.sources.corpus import write_corpus_parquet

        write_corpus_parquet(CORPUS_PATH, BENCH_DOCS, seed=42)


def run_extract_throughput(cpus: int) -> float:
    """docs/sec for the flagship extraction at a given parallelism.

    Uses the COSTED stub recognizer (~1.5 ms CPU per media ref
    simulating real decode+OCR inference; identical output) so the
    benchmark measures how the dominant real-world stage scales
    rather than fixed job overheads — see BENCH/BASELINE.md."""
    from ocr_intern_spark.operators.extract import extract
    from ocr_intern_spark.sources.corpus import costed_stub_ocr_tokens

    spark = _session(cpus)
    try:
        docs = spark.read.parquet(CORPUS_PATH)
        # warm-up (JVM JIT + codegen + Arrow channel + python workers)
        _materialize(extract(docs.limit(2000), costed_stub_ocr_tokens))
        t0 = time.perf_counter()
        mono0 = time.monotonic()
        _materialize(extract(docs, costed_stub_ocr_tokens))
        wall = time.perf_counter() - t0
        # CLOCK_MONOTONIC is process-shared on Linux: the parent's
        # trample sampler uses these bounds to score only the TIMED
        # window (JVM startup/warm-up burn >cpus cores briefly and
        # would otherwise read as co-tenant excess)
        print(f"TIMED {mono0} {time.monotonic()}")
        return BENCH_DOCS / wall
    finally:
        spark.stop()


def run_extract_throughput_subprocess(
    cpus: int,
) -> tuple[float, tuple[float, float] | None]:
    """Fresh python+JVM per parallelism level: JVM-level options
    (heap) are fixed by the first session in a process, so in-process
    re-measurement would be unfair."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--throughput", str(cpus)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "SPARK_GRAFT_BENCH_DOCS": str(BENCH_DOCS)},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("THROUGHPUT ")][-1]
    timed = [l for l in out.stdout.splitlines() if l.startswith("TIMED ")]
    window = None
    if timed:
        _, a, b = timed[-1].split()
        window = (float(a), float(b))
    return float(line.split()[1]), window


# --- mid-attempt trample detection ----------------------------------------
# The launch-load gate cannot see co-tenant bursts that arrive DURING
# a 1-7-minute attempt: the r4 validation run launched every attempt
# below load 1.0 and still drew local[4] ∈ {172, 177, 307, 362} — two
# mid-attempt tramples that pushed the median estimator to 0.735 while
# max passed at 1.074 (same failure shape as the r3 driver artifact).
# So each scaling attempt is WATCHED: a sampler thread reads
# /proc/stat every 2 s and converts busy-jiffy deltas to "busy cores".
# An attempt at local[N] should keep ~N cores busy plus ~1.5 of
# JVM/python overhead; sustained busy beyond N + TRAMPLE_HEADROOM is,
# by construction, someone else's CPU. Under the deflation-only noise
# model (contention can only LOWER a draw, never raise it) a trampled
# draw is a strict underestimate, so discarding it and retrying cannot
# bias the estimate upward — every discarded draw is still recorded in
# the JSON for audit, and a draw that exhausts the retry budget is
# kept (best trampled value) with the trample flag raised.

TRAMPLE_HEADROOM = float(os.environ.get("SPARK_GRAFT_TRAMPLE_HEADROOM", "1.5"))
TRAMPLE_MEAN_EXCESS = float(
    os.environ.get("SPARK_GRAFT_TRAMPLE_MEAN_EXCESS", "0.75")
)
TRAMPLE_RETRY_BUDGET = int(os.environ.get("SPARK_GRAFT_TRAMPLE_RETRIES", "3"))


def _busy_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal — busy = all but
    # idle+iowait
    vals = [int(v) for v in parts[1:9]]
    return sum(vals) - vals[3] - vals[4]


def run_attempt_watched(cpus: int) -> tuple[float, float, float]:
    """One throughput attempt with the busy-core sampler running.
    Returns (docs_per_sec, mean_busy_cores, mean_excess_cores) where
    excess is busy beyond this attempt's own expected demand."""
    import threading

    hz = os.sysconf("SC_CLK_TCK")
    samples: list[tuple[float, float]] = []  # (monotonic ts, busy cores)
    stop = threading.Event()

    def watch() -> None:
        prev = _busy_jiffies()
        prev_t = time.monotonic()
        while not stop.wait(2.0):
            cur, cur_t = _busy_jiffies(), time.monotonic()
            dt = cur_t - prev_t
            if dt > 0:
                samples.append((cur_t, (cur - prev) / dt / hz))
            prev, prev_t = cur, cur_t

    th = threading.Thread(target=watch, daemon=True)
    th.start()
    try:
        tp, window = run_extract_throughput_subprocess(cpus)
    finally:
        stop.set()
        th.join(timeout=5)
    # score only the subprocess's TIMED window (monotonic clock is
    # process-shared): JVM startup + warm-up burn >cpus cores briefly
    # and would otherwise read as co-tenant excess
    if window:
        vals = [b for (ts, b) in samples if window[0] <= ts <= window[1]]
    else:
        vals = [b for (_ts, b) in samples]
    if not vals:  # attempt shorter than one sample period
        return tp, 0.0, 0.0
    own = cpus + TRAMPLE_HEADROOM
    mean_busy = sum(vals) / len(vals)
    mean_excess = sum(max(0.0, s - own) for s in vals) / len(vals)
    return tp, round(mean_busy, 2), round(mean_excess, 2)


def main() -> None:
    if "--throughput" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--throughput") + 1])
        ensure_corpus()
        print(f"THROUGHPUT {run_extract_throughput(cpus)}")
        return

    fast = "--fast" in sys.argv
    scaling_only = "--scaling" in sys.argv
    ensure_corpus()

    result: dict = {"metric": "headline_queries_total_wall", "unit": "sec",
                    "sf": SF_DIR.rstrip("/").split("sf")[-1]}

    # SCALING PHASE FIRST: it is the north-rule gate and the most
    # contention-sensitive measurement in the run, so it gets the
    # coldest, quietest part of the bench window — before the headline
    # phase heats the box (r3 ran it after and the driver artifact's
    # local[1] draws launched at loads 2.1-2.9, failing the median
    # estimator that the same code cleared on a quiet box).
    if not fast:
        # North-rule protocol: same job, N vs 4N cores (local[1] vs
        # local[4] — a 4-core demand is rarely starved by co-tenants
        # on this 32-core box, where wider runs measured systematic
        # deflation); fresh JVM per attempt; INTERLEAVED best-of runs
        # per level (host noise is multiplicative per-run and only
        # ever DEFLATES throughput — measured same-boot swings of
        # 142→302 docs/s at local[4] — so max-of-attempts converges on
        # the noise-free value and interleaving guards against drift).
        # Rationale + measurements in BENCH/BASELINE.md.
        # EQUAL attempt counts per level (3 and 3, interleaved): under
        # the deflation-only noise model, asymmetric counts would push
        # the better-sampled level closer to its noise-free value and
        # bias the efficiency estimate. Median reported alongside max
        # so any residual asymmetry is visible in the raw record.
        import statistics

        n, n4 = SCALE_N, 4 * SCALE_N
        # 4 attempts per level (equal counts), FULLY alternating so
        # both levels sample the same co-tenant windows; 30 s settle
        # between attempts lets the previous JVM/worker tree die and
        # the page cache quiesce. r2 measured the local[4] draw
        # distribution at {211..300} docs/s on a "quiet" box — 3
        # draws routinely missed the noise-free max that two manual
        # spot-checks hit (294, 300), so the max-estimator needs the
        # extra draw more than the bench needs the 10 minutes.
        n_attempts = int(os.environ.get("SPARK_GRAFT_SCALE_ATTEMPTS", "4"))
        attempts: dict[int, list[float]] = {n: [], n4: []}
        loads: dict[int, list[float]] = {n: [], n4: []}
        busy: dict[int, list[float]] = {n: [], n4: []}
        discarded: dict[int, list[dict]] = {n: [], n4: []}
        kept_trampled: dict[int, int] = {n: 0, n4: 0}
        retries_left = TRAMPLE_RETRY_BUDGET
        for i in range(n_attempts):
            for level in (n4, n):
                # retry loop: a draw whose sampler saw sustained
                # co-tenant CPU beyond this attempt's own demand is a
                # strict underestimate (deflation-only noise) — retry
                # it from the shared budget, keep the best trampled
                # draw if the budget runs out, and record every
                # discarded draw for audit.
                while True:
                    launch_load = round(
                        _wait_quiet(SCALING_QUIET_LOAD, SCALING_QUIET_TIMEOUT),
                        2,
                    )
                    tp, mean_busy, mean_excess = run_attempt_watched(level)
                    trampled = mean_excess > TRAMPLE_MEAN_EXCESS
                    if trampled and retries_left > 0:
                        retries_left -= 1
                        discarded[level].append(
                            {
                                "docs_per_sec": round(tp, 1),
                                "mean_busy_cores": mean_busy,
                                "mean_excess_cores": mean_excess,
                                "launch_load": launch_load,
                            }
                        )
                        time.sleep(30)
                        continue
                    if trampled:
                        # budget exhausted: keep the better of this
                        # draw and an UNCONSUMED discarded sibling
                        # (both are underestimates; the max is closest
                        # to truth). Each discarded draw substitutes at
                        # most ONCE — re-using one across several
                        # reported attempts would fabricate the
                        # independent draws the median estimator
                        # assumes.
                        spare = max(
                            (
                                d
                                for d in discarded[level]
                                if not d.get("consumed")
                            ),
                            key=lambda d: d["docs_per_sec"],
                            default=None,
                        )
                        if spare and spare["docs_per_sec"] > tp:
                            spare["consumed"] = True
                            tp = spare["docs_per_sec"]
                            mean_busy = spare["mean_busy_cores"]
                        kept_trampled[level] += 1
                    # loads/busy recorded ONLY for the reported draw,
                    # so attempt_launch_loads aligns 1:1 with attempts
                    # (discarded draws carry their own launch_load)
                    loads[level].append(launch_load)
                    attempts[level].append(tp)
                    busy[level].append(mean_busy)
                    break
                time.sleep(30)
        tp_n, tp_4n = max(attempts[n]), max(attempts[n4])
        eff = (tp_4n / tp_n) / 4.0
        med_eff = (
            statistics.median(attempts[n4]) / statistics.median(attempts[n])
        ) / 4.0
        # A trampled artifact must self-identify: a reported draw that
        # was trampled past the retry budget, or a launch the quiet
        # gate timed out on, means the numbers below are deflated —
        # the flag makes that loud instead of leaving it implicit.
        violated = bool(
            sum(kept_trampled.values())
            or [
                v
                for vals in loads.values()
                for v in vals
                if v >= SCALING_QUIET_LOAD
            ]
        )
        result["scaling"] = {
            "corpus_docs": BENCH_DOCS,
            f"docs_per_sec_local{n}": round(tp_n, 1),
            f"docs_per_sec_local{n4}": round(tp_4n, 1),
            f"scaling_efficiency_{n}_to_{n4}": round(eff, 3),
            f"scaling_efficiency_median_{n}_to_{n4}": round(med_eff, 3),
            "quiet_gate": SCALING_QUIET_LOAD,
            "gate_violated": violated,
            "trample_headroom_cores": TRAMPLE_HEADROOM,
            "trampled_draws_kept": sum(kept_trampled.values()),
            "attempts": {
                f"local{lvl}": [round(v, 1) for v in vals]
                for lvl, vals in attempts.items()
            },
            "attempt_mean_busy_cores": {
                f"local{lvl}": vals for lvl, vals in busy.items()
            },
            "attempt_launch_loads": {
                f"local{lvl}": vals for lvl, vals in loads.items()
            },
            "discarded_trampled": {
                f"local{lvl}": vals
                for lvl, vals in discarded.items()
                if vals
            },
        }

    if not scaling_only:
        # Quiet-gate the headline phase like the scaling attempts: the
        # co-tenant on this box cycles between idle and load ~10-18,
        # and a headline run launched into a busy window measures the
        # co-tenant, not the code (r3 measured the same flagship at
        # 5.3 s quiet vs 54.5 s busy). The observed launch load is
        # recorded so a reader can weigh the scalar.
        result["headline_launch_load"] = round(_wait_quiet(), 2)
        spark = _session(CPUS)
        try:
            times, q_attempts = run_headline(spark)
            # North-rule span gate, recorded in the bench artifact too
            # (VERDICT r4 #6): live flagship vs the committed golden,
            # per-doc (kind, text, order) fingerprint equality at the
            # bench SF. 100.0 means every golden doc matched exactly.
            import __spark_entry__ as entrymod
            from pyspark.sql import functions as F

            sr = entrymod.queries()["extract_span_regression"](spark, SF_DIR)
            agg = sr.agg(
                F.count("*").alias("docs"),
                F.sum(F.col("span_match").cast("long")).alias("matched"),
            ).collect()[0]
            result["span_match"] = {
                "docs": agg["docs"],
                "matched": int(agg["matched"] or 0),
                "pct": round(100.0 * (agg["matched"] or 0) / agg["docs"], 3)
                if agg["docs"]
                else None,
            }
        finally:
            _shutdown_jvm(spark)
        result["queries"] = times
        result["query_attempts"] = q_attempts
        result["value"] = round(sum(times.values()), 3)
    else:
        result["queries"] = {}
        result["value"] = 0.0

    # The r4 driver artifact recorded "parsed": null because the full
    # result line (query_attempts + per-attempt scaling audit) outgrew
    # the driver's tail capture and the line's HEAD was truncated. Fix
    # (VERDICT r4 #4): the verbose record goes whole into
    # BENCH/last_run.json, and stdout ends with a COMPACT result line —
    # small enough that any tail capture gets it intact — carrying the
    # metric, per-query bests, scaling summary, and span gate.
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH"), exist_ok=True)
    # overridable so test runs of --fast don't clobber the committed
    # full-protocol artifact (which happened once: the pytest pin's
    # sf0.001 record silently replaced the real run's JSON)
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json"
    )
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)

    compact = {
        k: v
        for k, v in result.items()
        if k not in ("query_attempts", "scaling")
    }
    if "scaling" in result:
        compact["scaling"] = {
            k: v
            for k, v in result["scaling"].items()
            if k.startswith(("docs_per_sec", "scaling_efficiency"))
            or k in ("corpus_docs", "gate_violated", "trampled_draws_kept")
        }
    compact["detail"] = (
        os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or "BENCH/last_run.json"
    )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
