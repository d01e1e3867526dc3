#!/usr/bin/env python
"""Scaling-efficiency evidence for BENCH/BASELINE.md.

Runs the SAME crawl-epoch job at two parallelism levels (local[8] and
local[32] — the in-sandbox stand-in for N vs 4N executors) on identical
input, as interleaved process pairs. Each bench process ALSO measures
the box's same-kernel ceiling (the crawl's own decode stage, zero
shuffle) IN-PROCESS: this VM's throughput is bimodal per JVM instance
(identical back-to-back runs differ up to ~2×), so normalizing a
process's epoch throughput by a ceiling measured in a DIFFERENT
process compares across modes and is meaningless in either direction.
With the in-process control, each pair's normalized efficiency
  (tput_32 / tput_8) / (kctrl_8_sec / kctrl_32_sec)
is mode-matched and the VM's mode cancels.

Headline statistic (ADVICE r3): the MEDIAN mode-matched pair
efficiency. The peak-based figure is reported as supplementary only.
Hypervisor steal is MEASURED around every run via /proc/stat (not
asserted in prose); per-run steal seconds are listed so the reader can
see which pairs were disturbed.

Each bench process times BOTH candidate workloads: the fresh-candidate
stream (round-over-round series) and an all-already-seen stream (the
heaviest seen-filter path — every candidate Bloom-positive, exact
broadcast backstop exercised); efficiency is reported for both.

Usage: python scripts/scaling_bench.py [n_urls] [n_pairs] [--resume]
Writes BENCH/BASELINE.md and prints one JSON line.

--resume: load previously completed pairs from
BENCH/scaling_pairs.jsonl and run only the REMAINING pairs (n_pairs
is the total); statistics and the BASELINE.md table are computed over
ALL pairs. Lets a killed/out-of-time session top up the series
without rerunning finished pairs — every jsonl line is one finished
pair of the same methodology (same bench code, same bracketed
in-process control), so folding them is sound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONTROL_JOB = """
import sys, time, json
sys.path.insert(0, {repo!r})
from podcast_plow_spark.session import get_spark
spark = get_spark(cores=sys.argv[1]); spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

def burn(i):
    s = 0
    for j in range(3_000_000):
        s = (s * 1103515245 + j) & 0x7FFFFFFF
    return s

sc.parallelize(range(128), 128).map(burn).count()  # warm
best = None
for _ in range(3):
    t = time.perf_counter()
    sc.parallelize(range(128), 128).map(burn).count()
    d = time.perf_counter() - t
    best = d if best is None else min(best, d)
print(json.dumps({{"sec": round(best, 2)}}))
spark.stop()
"""


def _read_steal_ticks() -> int:
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    fields = line.split()
                    return int(fields[8]) if len(fields) > 8 else 0
    except OSError:
        pass
    return 0


_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _sample_cpu_mhz() -> float:
    """Median core frequency right now (0.0 if unavailable)."""
    try:
        mhz = []
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("cpu MHz"):
                    mhz.append(float(line.split(":")[1]))
        mhz.sort()
        return mhz[len(mhz) // 2] if mhz else 0.0
    except (OSError, ValueError, IndexError):
        return 0.0


def _read_iowait_ticks() -> int:
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu "):
                    fields = line.split()
                    return int(fields[5]) if len(fields) > 5 else 0
    except OSError:
        pass
    return 0


def _run_bench_once(cores: str, n_urls: int) -> dict:
    import threading

    env = dict(os.environ, SPARK_GRAFT_INPROC_CONTROL="1")
    # second-bimodality diagnostics (VERDICT r4: one 0.45-efficiency
    # pair had near-zero steal, so steal alone can't explain outliers):
    # sample core frequency during the run, and measure iowait — the
    # two non-steal ways this VM gets slow (down-clocking; disk/page-
    # cache contention).
    mhz_samples: list[float] = []
    stop = threading.Event()

    def sampler():
        while not stop.wait(2.0):
            m = _sample_cpu_mhz()
            if m:
                mhz_samples.append(m)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    steal0, iow0, t0 = _read_steal_ticks(), _read_iowait_ticks(), time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-m", "podcast_plow_spark.crawl.bench", cores, str(n_urls)],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
            env=env,
        )
    finally:
        stop.set()
        th.join()
    wall = time.perf_counter() - t0
    steal_sec = (_read_steal_ticks() - steal0) / _CLK_TCK
    iowait_sec = (_read_iowait_ticks() - iow0) / _CLK_TCK
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["steal_sec"] = round(steal_sec, 1)
    res["wall_sec"] = round(wall, 1)
    res["iowait_sec"] = round(iowait_sec, 1)
    if mhz_samples:
        s = sorted(mhz_samples)
        res["cpu_mhz_median"] = round(s[len(s) // 2], 0)
        res["cpu_mhz_min"] = round(s[0], 0)
    return res


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def _run_control(cores: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CONTROL_JOB.format(repo=REPO), cores],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv[1:]
    n_urls = int(args[0]) if len(args) > 0 else 1_000_000
    n_pairs = int(args[1]) if len(args) > 1 else 8
    small, large = "8", "32"

    pairs: list[dict] = []
    progress_path = os.path.join(REPO, "BENCH", "scaling_pairs.jsonl")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    if resume and os.path.exists(progress_path):
        # the aggregation below indexes these keys over every resumed
        # pair; lines written by an older schema (pre-overlap-workload)
        # are skipped with a notice instead of crashing after the
        # remaining pairs have already been run (ADVICE r4)
        required = {
            "tput_small", "tput_large", "speedup", "pair_ceiling",
            "norm_eff", "norm_eff_overlap", "kctrl_small_sec",
            "kctrl_large_sec", "steal_small_sec", "steal_large_sec",
            "wall_small_sec", "wall_large_sec",
        }
        with open(progress_path) as fh:
            loaded = [json.loads(ln) for ln in fh if ln.strip()]
        pairs = [p for p in loaded if required <= set(p)]
        if len(pairs) < len(loaded):
            print(
                f"[resume] skipped {len(loaded) - len(pairs)} old-schema "
                f"line(s) in {progress_path}", flush=True,
            )
    n_remaining = max(0, n_pairs - len(pairs))

    ctrl_small_runs = [_run_control(small)]
    ctrl_large_runs = [_run_control(large)]
    for _ in range(n_remaining):
        a = _run_bench_once(small, n_urls)
        b = _run_bench_once(large, n_urls)
        speedup = b["urls_per_sec"] / a["urls_per_sec"]
        ov_speedup = b["urls_per_sec_overlap"] / a["urls_per_sec_overlap"]
        ceiling = a["kernel_control_sec"] / b["kernel_control_sec"]
        pairs.append(
            {
                "tput_small": a["urls_per_sec"],
                "tput_large": b["urls_per_sec"],
                "tput_small_overlap": a["urls_per_sec_overlap"],
                "tput_large_overlap": b["urls_per_sec_overlap"],
                "kctrl_small_sec": a["kernel_control_sec"],
                "kctrl_large_sec": b["kernel_control_sec"],
                "kctrl_small_pre_post": [
                    a.get("kernel_control_pre_sec"),
                    a.get("kernel_control_post_sec"),
                ],
                "kctrl_large_pre_post": [
                    b.get("kernel_control_pre_sec"),
                    b.get("kernel_control_post_sec"),
                ],
                "steal_small_sec": a["steal_sec"],
                "steal_large_sec": b["steal_sec"],
                "wall_small_sec": a["wall_sec"],
                "wall_large_sec": b["wall_sec"],
                "iowait_small_sec": a.get("iowait_sec"),
                "iowait_large_sec": b.get("iowait_sec"),
                "cpu_mhz_small": [a.get("cpu_mhz_median"), a.get("cpu_mhz_min")],
                "cpu_mhz_large": [b.get("cpu_mhz_median"), b.get("cpu_mhz_min")],
                "speedup": round(speedup, 2),
                "overlap_speedup": round(ov_speedup, 2),
                "pair_ceiling": round(ceiling, 2),
                "norm_eff": round(speedup / ceiling, 2) if ceiling > 0 else 0.0,
                "norm_eff_overlap": round(ov_speedup / ceiling, 2) if ceiling > 0 else 0.0,
            }
        )
        # incremental progress: a crash / out-of-time kill loses no
        # completed pair (each line is one finished pair)
        with open(progress_path, "a") as fh:
            fh.write(json.dumps(pairs[-1]) + "\n")
    ctrl_small_runs.append(_run_control(small))
    ctrl_large_runs.append(_run_control(large))

    runs_small = [p["tput_small"] for p in pairs]
    runs_large = [p["tput_large"] for p in pairs]
    tput_small = _median(runs_small)
    tput_large = _median(runs_large)
    speedup = _median([p["speedup"] for p in pairs])
    norm_eff = _median([p["norm_eff"] for p in pairs])
    norm_eff_overlap = _median([p["norm_eff_overlap"] for p in pairs])
    abs_eff = speedup / 4.0
    ctrl_small = min(ctrl_small_runs)
    ctrl_large = min(ctrl_large_runs)
    py_ceiling = ctrl_small / ctrl_large
    kctrl_best_ceiling = min(p["kctrl_small_sec"] for p in pairs) / min(
        p["kctrl_large_sec"] for p in pairs
    )
    peak_ratio = max(runs_large) / max(runs_small)
    peak_norm_eff = peak_ratio / kctrl_best_ceiling if kctrl_best_ceiling > 0 else 0.0
    total_steal = sum(p["steal_small_sec"] + p["steal_large_sec"] for p in pairs)
    total_wall = sum(p["wall_small_sec"] + p["wall_large_sec"] for p in pairs)

    pair_rows = "\n".join(
        f"| {i + 1} | {p['tput_small']:,.0f} | {p['tput_large']:,.0f} | {p['speedup']:.2f}× "
        f"| {p['kctrl_small_sec']:.1f} / {p['kctrl_large_sec']:.1f} = {p['pair_ceiling']:.2f}× "
        f"| {p['steal_small_sec']:.0f} / {p['steal_large_sec']:.0f} "
        f"| **{p['norm_eff']:.2f}** | {p['norm_eff_overlap']:.2f} |"
        for i, p in enumerate(pairs)
    )

    # sub-0.8 pairs get a diagnostics row: measured steal, iowait and
    # sampled core frequency (when the pair was run with the r5
    # instrumentation), so outliers are explained by data, not prose
    outlier_rows = []
    for i, p in enumerate(pairs):
        if p["norm_eff"] >= 0.8 and p["norm_eff_overlap"] >= 0.8:
            continue
        mhz_s = p.get("cpu_mhz_small") or [None, None]
        mhz_l = p.get("cpu_mhz_large") or [None, None]
        outlier_rows.append(
            f"| {i + 1} | {p['norm_eff']:.2f} / {p['norm_eff_overlap']:.2f} "
            f"| {p['steal_small_sec']:.0f} / {p['steal_large_sec']:.0f} "
            f"| {p.get('iowait_small_sec')} / {p.get('iowait_large_sec')} "
            f"| {mhz_s[0]} / {mhz_l[0]} "
            f"| {p['kctrl_small_sec']:.1f} / {p['kctrl_large_sec']:.1f} |"
        )
    outlier_md = (
        (
            "\n## Sub-0.8 pair diagnostics\n\n"
            "| pair | eff fresh/overlap | steal s | iowait s | cpu MHz (med) | kctrl s |\n"
            "|---|---|---|---|---|---|\n" + "\n".join(outlier_rows) + "\n\n"
            "Reading: high steal on either side → hypervisor preemption\n"
            "explains the pair. Near-zero steal + normal kctrl (the\n"
            "zero-shuffle control hit full speed while the shuffling epochs did\n"
            "not — r4's pair 3) is a SECOND slow state, independently reproduced\n"
            "and isolated (BENCH/R5_REGRESSION_RECHECK.md): during two\n"
            "query-bench runs showing the same broad slowdown, the register-only\n"
            "burn kernel ran at good-mode speed (2.61 s vs 2.45 s best), disk\n"
            "read and 1-thread memcpy were at full speed, steal was near zero,\n"
            "iowait was 0.0 and the reported core clock pinned at 2100 MHz — so\n"
            "the state is NOT cpu clock, NOT guest-visible preemption, NOT disk.\n"
            "The only shared resource left that affects Arrow/shuffle-heavy work\n"
            "but not a register loop is the host memory subsystem (LLC /\n"
            "memory-bus contention from co-tenants), which no guest counter\n"
            "exposes. Consequence: the slow state depresses measured THROUGHPUT\n"
            "but the mode-matched pair efficiency stays valid whenever the\n"
            "in-process control lands in the same state as its epochs; a\n"
            "mid-process state flip (control fast, epochs slow) biases that\n"
            "pair's efficiency DOWN — the conservative direction. `None` = pair\n"
            "predates the r5 instrumentation (iowait/MHz sampling).\n"
        )
        if outlier_rows
        else ""
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — frontier throughput & scaling evidence

Authoritative metric (BASELINE.json): frontier throughput (URLs
scheduled+fetched / sec) and scaling efficiency ≥ 0.8 between N and 4N
parallelism, evidenced in-sandbox as `local[{small}]` vs `local[{large}]`
on identical input (no real cluster available).

## Job under measurement

One full crawl epoch over a synthetic {n_urls:,}-URL frontier with a
planted hot host (10% of URLs on one host):
politeness-capped dequeue (sampled global-order prefix, per-host
rank computed inside the prefix only — dequeue_batch_polite; the
order-key threshold sample is maintained across epochs as a byproduct
of the previous epoch's frontier write, so no per-epoch sampling job)
→ fetch+process
(payload decode + PSNR≥40dB invariant + phash, Arrow-vectorized;
44-level quantize ladder ≈ 2.2 ms/URL single-threaded — the LOW end
of real jpeg/webp decode cost, so orchestration share here is an
upper bound on production's)
→ Bloom+exact URL-seen filter of {n_urls // 4:,} fresh candidates
(blocked Bloom built per-partition, treeAggregate merge, broadcast
probe, exact anti-join backstop) → deterministic-seq enqueue.
Steady-state best-of-reps epochs after one warm-up epoch
(`podcast_plow_spark/crawl/bench.py`).

Each process times TWO candidate workloads (ADVICE r3):

- **fresh** — candidates disjoint from the seen set (the
  round-over-round series' workload; lightest seen-filter path);
- **overlap** — candidates 100% already-seen (every candidate is
  Bloom-positive and exercises the exact broadcast backstop; heaviest
  seen-filter path; near-zero enqueue).

## Methodology: mode-matched interleaved pairs

This VM's throughput is **bimodal per JVM instance** (identical
back-to-back processes differ up to ~2× under hypervisor steal), so a
ceiling measured in a separate process can sit in a different mode
than the job it normalizes. Each bench process therefore measures the
SAME-KERNEL ceiling (its own decode stage, zero-shuffle, cached
input) **in-process**, bracketing the epochs; the per-pair normalized
efficiency

    (tput_{large} / tput_{small}) / (kctrl_{small}_sec / kctrl_{large}_sec)

is mode-matched and cancels process-wide mode differences.

The control BRACKETS the epochs inside each process — measured before
AND after, min of all reps (r4: a post-only control that landed in a
one-sided steal burst turned a 2.91× pair speedup into a reported
0.61 efficiency; the bracketed min is robust to a burst that covers
either single window). Per-side pre/post control times are recorded
in `scaling_pairs.jsonl`.

**Headline statistic: the MEDIAN mode-matched pair efficiency** — the
conservative figure (steal bursts that hit one side of a pair
mid-epoch but not its control pass through and bias it DOWN, never
up). The peak-based figure (ratio of per-side best throughputs over
best ceilings) is reported as supplementary only: it filters
one-sided noise but combines measurements from different processes.

Hypervisor steal is **measured, not asserted**: /proc/stat's steal
counter is sampled around every run; per-run steal seconds are in the
table. Steal can only subtract from a run's throughput (the counter
is time NOT given to this VM), so pairs with visible steal imbalance
explain their own outliers.

The pure-Python bytecode control brackets the session for continuity
with earlier rounds.

## Results

| pair | local[{small}] URLs/s | local[{large}] URLs/s | speedup | in-proc kernel ctrl (s/s = ceiling) | steal s ({small}/{large}) | norm. eff | overlap eff |
|---|---|---|---|---|---|---|---|
{pair_rows}

| statistic | value |
|---|---|
| **median mode-matched pair efficiency (HEADLINE)** | **{norm_eff:.2f}** |
| median mode-matched pair efficiency, overlap workload | {norm_eff_overlap:.2f} |
| median pair speedup | {speedup:.2f}× |
| absolute scaling efficiency (median speedup / 4) | {abs_eff:.2f} |
| median throughput {small} / {large} | {tput_small:,.0f} / {tput_large:,.0f} URLs/s |
| peak-based normalized efficiency (supplementary) | {peak_norm_eff:.2f} |
| peak-of-processes throughput ratio | {peak_ratio:.2f}× ({max(runs_small):,.0f} → {max(runs_large):,.0f} URLs/s) |
| best-of-session kernel ceiling | {kctrl_best_ceiling:.2f}× |
| total measured hypervisor steal | {total_steal:.0f} s over {total_wall:.0f} s of bench wall time |
| pure-Python control ceiling (bracketing, best) | {py_ceiling:.2f}× ({ctrl_small:.2f} s / {ctrl_large:.2f} s) |
{outlier_md}
## Seen-filter maintenance: sparse deltas + cuckoo hot tier (r5)

Two maintenance-path changes, A/B'd by `scripts/hot_tier_bench.py`
(8 epochs × 20k insertions against a 10^8-key-geometry Bloom,
local[16]; per-epoch probe included):

1. **Sparse delta builds** — `build_bloom(like=...)` now emits only
   each partition's touched (word, bits) pairs instead of a
   full-geometry partial array. A 20k-row delta build at 10^8-key
   geometry: 40–169 s dense → **1.4 s** sparse. At the 10^10 design
   point a dense 15 GB partial per partition is unshippable — the
   sparse path is what makes incremental maintenance exist at scale.
2. **Cuckoo hot tier** (`CuckooFilter` + `build_cuckoo`, engine knob
   `bloom_fold_epochs`): insertions land in a batch-sized cuckoo
   (vectorized bulk placement: 200k inserts in 0.43 s); probes are
   bloom-OR-hot; the big Bloom's fold AND its re-broadcast (merge →
   new object → re-ship; ~15 GB at 10^10 keys) are amortized across
   N epochs.

| maintenance path | 8-epoch wall | |
|---|---|---|
| fold every epoch (sparse) | 20.6 s | re-broadcasts the big Bloom every epoch |
| hot tier, one fold | 14.3 s | **1.44×** — gap grows with filter size (re-broadcast is O(filter), tier is O(batch)) |

Crawl output is bit-identical across paths
(`tests/test_crawl_engine.py::TestHotTierFold`); exactness never
depends on either filter (anti-join backstop), only the
definite-unseen bypass does, and `tests/test_cuckoo.py` includes the
negative control showing why the tier must cover unfolded rows.

## Hot-host salting delta (r5)

The epoch loop now salts hosts above `salt_hot_batch_threshold` rows
per batch across `salt_n_salts` lanes before scheduling
(`crawl/engine.py::run_epoch` → `operators/politeness.py::
salt_hot_hosts`/`schedule_fetches` salted mode), dividing the per-host
politeness budget across lanes (delay × n_salts per lane on the
spacing grid — same aggregate per-host rate; crawl ordering and seen
set unchanged, asserted by `tests/test_crawl_engine.py::
TestSaltedEpoch`). A/B on the planted-skew fetch path
(`scripts/skew_bench.py`, 40k-row batch, 30% of rows on one host,
16 lanes, local[16]):

| path | wall (schedule → decode) | |
|---|---|---|
| un-salted | 27.28 s | hot host's 12k decodes serial in one task |
| salted | 11.72 s | spread over 16 lanes |
| **speedup** | **2.33×** | bounded by the cold-host tail, not the hot host |

At 100× batch size the un-salted hot task grows linearly while the
salted path stays balanced — the gap widens with scale.

## Why the ceiling matters — and why the same-kernel control

No software can scale past what this single virtualized box gives
perfectly-parallel code when quadrupling threads: the VM down-clocks /
steals cycles under full load, and all threads share ONE memory bus. A
real N→4N *executor* scale-up adds independent nodes — each with its
own clock, memory bandwidth and shuffle service — so the software
property the criterion can test in-sandbox is "no serial bottlenecks /
no driver funnels", i.e. how close the job comes to the box's ceiling
for its own kind of work. The SAME-KERNEL control runs the crawl's
dominant stage (the image decode/PSNR/phash kernel) zero-shuffle over
a trivially-parallel input: identical compute substrate (Arrow batches
+ numpy inside python workers), zero coordination — the tightest
honest ceiling for this job, measured inside the very process it
normalizes.

## Plan-shape evidence for 4N scale-out (what we removed)

- dequeue: sampled-threshold top-K (driver merges O(K), was
  O(partitions × K) via TakeOrderedAndProject); ONE frontier scan per
  epoch (eligible-prefix cached; k-th-key probe + cut + downstream
  all read the ~k·safety-row cache); the threshold sample itself is
  carried across epochs (presample), so sampling costs zero jobs in
  steady state
- seq assignment: keyed arithmetic (was a global row_number window →
  single-reducer sort of the whole frontier)
- politeness rank: window over a host-clustered, sorted-on-write
  frontier (Iceberg `WRITE ORDERED BY` analog) — no exchange, no sort
- seen filter: per-partition blocked Bloom + treeAggregate (depth 3);
  driver receives O(log P) partials, never P; probe is a SCALAR
  pandas UDF over the int64 key column (one long in, one bool out —
  not the full row through Arrow)
- URL canonicalization: vectorized fixpoint fast path (one C-regex
  scan accepts already-canonical URLs; per-row parse only for the
  rest — property-tested identical)
- probed-candidates cache materialized before broadcast subjobs can
  race it (racing readers of a cold cache each recompute the
  canonicalize+probe python stages)
- decode stage: explicit repartition (AQE would coalesce the ~16 MB
  shuffle to ~1 partition and serialize the stage)
- shuffle dirs on tmpfs when it has ≥4 GiB free (this VM's
  virtualized disk: 84 s cumulative write time for a 16 MiB exchange;
  production = NVMe / external shuffle service)
- BLAS pinned to 1 thread/worker (N workers × M-thread BLAS pools
  anti-scale every numpy kernel)

## Reference configuration constants

The reference's quantitative surface (politeness budgets, timeouts,
retry math) is tabulated in `BASELINE.md`; those constants bound the
oracle crawl that the engine must (and does) match exactly —
see tests/test_crawl_parity.py.

## Epoch cost vs frontier size

`BENCH/EPOCH_SCALING.md` (scripts/epoch_scaling_bench.py): engine
epoch wall-time on a store-backed frontier with a fixed batch —
near-flat under the merge-on-read delta persistence + sampled-prefix
dequeue (round 1 rewrote the full frontier per epoch).

## 10^10 design point

Partitioning math, seen-filter sharding, and the per-epoch shuffle
budget for the full-scale frontier are worked through in
`BENCH/SCALE_DESIGN.md`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)

    print(
        json.dumps(
            {
                "pairs": pairs,
                "tput_urls_per_sec": {small: tput_small, large: tput_large},
                "speedup_median_pair": round(speedup, 2),
                "abs_efficiency": round(abs_eff, 2),
                "normalized_efficiency_median": round(norm_eff, 2),
                "normalized_efficiency_median_overlap": round(norm_eff_overlap, 2),
                "peak_normalized_efficiency": round(peak_norm_eff, 2),
                "peak_ratio": round(peak_ratio, 2),
                "kctrl_best_ceiling": round(kctrl_best_ceiling, 2),
                "py_ceiling_speedup": round(py_ceiling, 2),
                "control_sec": {small: ctrl_small, large: ctrl_large},
                "steal_sec_total": round(total_steal, 1),
                "wall_sec_total": round(total_wall, 1),
                "n_urls": n_urls,
                "n_pairs": n_pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
