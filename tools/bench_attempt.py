"""One guarded idle-reference bench attempt, start to filed artifact.

    python tools/bench_attempt.py [--force]

Automates the workflow r13/r14 ran by hand half a dozen times:

  1. PRE-FLIGHT: warm a session, run the steady-v2 canary twice and
     the ~5 s all-core sustained probe. Gates (the documented idle
     thresholds): python_spin <= 0.75, spark_fixed <= 0.30,
     sustained <= 3.0. Any gate fails -> exit 2 without running
     (--force overrides, for collecting contention evidence on
     purpose).
  2. RUN: `python bench.py` in a fresh process (its own
     choose_self_artifact decides BENCH_SELF vs BENCH_SELF_LAST).
  3. FILE: if the run was diverted AND its shared-query sum reads
     >1.05x the committed reference (i.e. it is contention evidence,
     not a near-miss), move it into BENCH_CONTENTION_EVIDENCE.json
     (keyed dict, one entry per preserved run) and restore the
     previous BENCH_SELF_LAST from git — the round-best slot must
     never silently hold a contended run (the r13 bookkeeping
     defect). A near-miss (<=1.05x) stays in BENCH_SELF_LAST as the
     new round-best.

Exit codes: 0 = reference updated (BENCH_SELF.json), 1 = kept as
round-best in BENCH_SELF_LAST, 2 = gates failed / run filed as
contention evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

GATE_SPIN = 0.75
GATE_FIXED = 0.30
GATE_SUSTAINED = 3.0


def _load(name: str) -> dict | None:
    try:
        with open(os.path.join(HERE, name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def preflight() -> bool:
    import bench
    from warp_pipe_spark.session import get_spark

    spark = get_spark("bench_preflight", cpus=32)
    bench.run_canary(spark)  # throwaway absorbs the warm-up transient
    c = bench.run_canary(spark)
    s = bench.run_sustained_canary(spark)
    ok = (
        c["python_spin_sec"] <= GATE_SPIN
        and c["spark_fixed_sec"] <= GATE_FIXED
        and s <= GATE_SUSTAINED
    )
    print(
        f"preflight: spin {c['python_spin_sec']} (<= {GATE_SPIN}), "
        f"fixed {c['spark_fixed_sec']} (<= {GATE_FIXED}), "
        f"sustained {s} (<= {GATE_SUSTAINED}) -> "
        + ("GO" if ok else "NO-GO")
    )
    spark.stop()
    return ok


def shared_ratio(run: dict, ref: dict) -> float | None:
    try:
        shared = set(run["queries"]) & set(ref["queries"])
        a = sum(float(run["queries"][q]) for q in shared)
        b = sum(float(ref["queries"][q]) for q in shared)
        return a / b if b else None
    except (KeyError, TypeError, ValueError):
        return None


def main() -> int:
    force = "--force" in sys.argv[1:]
    if not preflight() and not force:
        return 2

    before_last = _load("BENCH_SELF_LAST.json")
    before_ref = _load("BENCH_SELF.json")
    t0 = time.time()
    rc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")], cwd=HERE
    ).returncode
    if rc != 0:
        print(f"bench.py failed rc={rc}")
        return 2
    print(f"bench run took {time.time() - t0:.0f}s")

    after_ref = _load("BENCH_SELF.json")
    if after_ref != before_ref:
        print(
            "ACCEPTED as the new idle reference: BENCH_SELF.json = "
            f"{after_ref['value']}s — commit it"
        )
        return 0

    run = _load("BENCH_SELF_LAST.json")
    ratio = shared_ratio(run, after_ref) if run and after_ref else None
    print(
        f"diverted: value {run['value']}s, shared-sum "
        f"{ratio:.3f}x the reference" if ratio else "diverted"
    )
    if ratio is not None and ratio > 1.05:
        # contention evidence, not a round-best: file it and restore
        ev = _load("BENCH_CONTENTION_EVIDENCE.json") or {}
        if "queries" in ev:  # legacy single-run shape
            ev = {"legacy_run": ev}
        stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
        ev[f"diverted_{stamp}"] = run
        with open(
            os.path.join(HERE, "BENCH_CONTENTION_EVIDENCE.json"), "w"
        ) as f:
            json.dump(ev, f, indent=1)
        if before_last is not None:
            with open(os.path.join(HERE, "BENCH_SELF_LAST.json"), "w") as f:
                json.dump(before_last, f, indent=1)
        print(
            "filed as contention evidence "
            f"(key diverted_{stamp}); BENCH_SELF_LAST restored to "
            f"{before_last['value'] if before_last else '??'}s"
        )
        return 2
    print("kept as round-best in BENCH_SELF_LAST.json — commit it")
    return 1


if __name__ == "__main__":
    sys.exit(main())
