"""Scaling-efficiency evidence (BASELINE.json north_rule).

A real N-vs-4N-executor cluster is unavailable in this sandbox, so the
protocol from BASELINE.md is used instead: the same extraction job on
the same input at local[2] and local[8] (separate JVMs via
subprocess), reporting throughput at both plus
efficiency = (T_lo / T_hi) / 4.

The sandbox host is SHARED and its effective CPU budget fluctuates
(controls have measured anywhere from ~7 to ~14 effective cores within
one session), so the two parallelism levels are measured in
TIME-PAIRED ROUNDS — lo then hi back-to-back, efficiency computed per
round — and the median across rounds is the headline.  Unpaired
min-of-N at each level (the previous protocol) mixes load windows and
has produced swings from 0.74 to 0.95 for the identical binary.

Two CPU controls bracket the hardware ceiling for each pair:
- n plain busy processes (models a pure-CPU job), and
- 2n busy processes (models this engine's actual demand: each Spark
  task pipelines a JVM thread with a Python worker, so local[n] keeps
  ~2n execution contexts busy).

Writes BENCH_SCALING.md and prints the JSON result.

Usage: python tools/scaling.py [sf_dir] [turns_per_doc] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, sf_dir: str, turns_per_doc: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_TURNS_PER_DOC"] = str(turns_per_doc)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    out = subprocess.run(
        [sys.executable, "bench.py", "--cores", str(cores), "--extract-only"],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py --cores {cores} produced no JSON "
            f"(exit {out.returncode}); stderr tail: {out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def _burn(seconds: float) -> int:
    import time as _t

    t0 = _t.time()
    x = 0
    while _t.time() - t0 < seconds:
        for _ in range(10000):
            x += 1
    return x


def cpu_control(n: int, seconds: float = 2.0) -> float:
    """Total busy-loop iterations achievable with n processes — the
    machine's effective throughput for an n-way CPU-bound job."""
    import multiprocessing as mp

    with mp.Pool(n) as p:
        return float(sum(p.map(_burn, [seconds] * n)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    turns_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    lo_c, hi_c = 2, 8

    round_rows = []
    for i in range(rounds):
        lo = run_once(lo_c, sf_dir, turns_per_doc)
        hi = run_once(hi_c, sf_dir, turns_per_doc)
        full = (lo["queries"]["extract_pipeline"]
                / hi["queries"]["extract_pipeline"]) / 4.0
        refs = (lo["queries"]["extract_refs_only"]
                / hi["queries"]["extract_refs_only"]) / 4.0
        round_rows.append(
            {
                "round": i + 1,
                "lo_sec": lo["queries"]["extract_pipeline"],
                "hi_sec": hi["queries"]["extract_pipeline"],
                "lo_tps": lo["extract_turns_per_sec"],
                "hi_tps": hi["extract_turns_per_sec"],
                "eff_full": round(full, 3),
                "eff_refs_only": round(refs, 3),
                "turns": lo["turns"],
                "sf": lo["sf"],
            }
        )

    med_full = round(statistics.median(r["eff_full"] for r in round_rows), 3)
    med_refs = round(
        statistics.median(r["eff_refs_only"] for r in round_rows), 3
    )
    best_full = max(r["eff_full"] for r in round_rows)

    # secondary, hardware-saturated pair (single round)
    s_lo = run_once(8, sf_dir, turns_per_doc)
    s_hi = run_once(32, sf_dir, turns_per_doc)
    sec = {
        "lo_sec": s_lo["queries"]["extract_pipeline"],
        "hi_sec": s_hi["queries"]["extract_pipeline"],
        "lo_tps": s_lo["extract_turns_per_sec"],
        "hi_tps": s_hi["extract_turns_per_sec"],
        "efficiency": round(
            (s_lo["queries"]["extract_pipeline"]
             / s_hi["queries"]["extract_pipeline"]) / 4.0, 3),
    }

    ctl_n = round(cpu_control(hi_c) / cpu_control(lo_c) / 4.0, 3)
    ctl_2n = round(
        cpu_control(2 * hi_c) / cpu_control(2 * lo_c) / 4.0, 3
    )

    headline = med_full
    out = {
        "scaling_2_8": {
            "rounds": round_rows,
            "median_efficiency_full": med_full,
            "median_efficiency_refs_only": med_refs,
            "best_round_full": best_full,
        },
        "scaling_8_32": sec,
        "cpu_control_efficiency": {"n_procs": ctl_n, "2n_procs": ctl_2n},
        "hw_relative_efficiency": (
            round(headline / ctl_2n, 3) if ctl_2n > 0 else None
        ),
        "target": 0.8,
        "pass": headline >= 0.8,
    }
    print(json.dumps(out))

    r = round_rows[0]
    lines = [
        "# Scaling evidence (N -> 4N cores, sandbox protocol)",
        "",
        "Same extraction job, same input, two parallelism levels in",
        "separate JVMs (BASELINE.md row 'Target scaling efficiency').",
        "Workers are warmed before timing (steady-state throughput, as",
        "on a long-lived cluster).  The host is SHARED with a",
        "fluctuating CPU budget, so the levels are measured in",
        "time-paired rounds (lo then hi back-to-back) and the MEDIAN",
        "per-round efficiency is the headline; unpaired best-of-N",
        "sampling has swung 0.74-0.95 for an identical binary.",
        "",
        f"Input: {r['turns']} turns from sf={r['sf']} documents "
        f"(turns_per_doc={turns_per_doc}).",
        "",
        "## Primary: N=2 -> 4N=8 cores (time-paired rounds)",
        "",
        "| round | local[2] | local[8] | efficiency (full) | efficiency (refs-only output) |",
        "|---|---|---|---|---|",
    ]
    for rr in round_rows:
        lines.append(
            f"| {rr['round']} | {rr['lo_sec']:.2f}s ({rr['lo_tps']:.0f} t/s) "
            f"| {rr['hi_sec']:.2f}s ({rr['hi_tps']:.0f} t/s) "
            f"| {rr['eff_full']:.3f} | {rr['eff_refs_only']:.3f} |"
        )
    lines += [
        "",
        f"- **median efficiency (full artifacts): {med_full:.3f}** "
        f"(target >= 0.8: {'PASS' if med_full >= 0.8 else 'FAIL'})",
        f"- median efficiency (references-only output): {med_refs:.3f}",
        f"- best round (full): {best_full:.3f}",
        "",
        "## Secondary: 8 -> 32 cores (hardware-saturated)",
        "",
        f"- local[8]:  {sec['lo_sec']:.2f}s ({sec['lo_tps']:.0f} turns/s)",
        f"- local[32]: {sec['hi_sec']:.2f}s ({sec['hi_tps']:.0f} turns/s)",
        f"- efficiency = {sec['efficiency']:.3f}",
        "",
        "## CPU controls (busy-loop, no Spark)",
        "",
        f"- n-process control, 2->8: {ctl_n}",
        f"- 2n-process control (demand-matched), 4->16: {ctl_2n}",
        "",
        "Each Spark task pipelines a JVM thread with a Python worker, so",
        "local[n] keeps ~2n execution contexts busy; the demand-matched",
        "control is the fair hardware ceiling for this engine's shape.",
        "The container advertises 32 CPUs but delivers ~14 effective",
        "cores, so the 8->32 pair is hardware-bounded near ~0.5 for ANY",
        "CPU-bound job and the 2->8 pair is the meaningful N->4N",
        "evidence.  The extraction plan itself is a single mapInArrow",
        "over turn rows — no shuffle, no driver collection — so no",
        "coordination cost grows with executor count.",
        "",
    ]
    with open(os.path.join(ROOT, "BENCH_SCALING.md"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
