"""Two-parallelism scaling study (north rule evidence).

Runs bench.py as subprocesses at N and 4N local cores on the SAME input and
reports throughput at both plus scaling efficiency
``tp_4N / (4 * tp_N)`` for the grouped-exception pipeline.

Usage: python scripts/scaling_bench.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_SCALE=os.environ.get("SPARK_GRAFT_BENCH_SCALE", "8"),
        PYTHONPATH=REPO,
    )
    # SPARK_GRAFT_PIN: bench pins its whole process tree (JVM task threads
    # AND python workers) to exactly `cpus` cores for the measured section —
    # local[N] alone only bounds JVM task slots, so an unpinned "N-core" run
    # would silently borrow extra cores for Python, inflating the small-N
    # baseline.  Generation/warm-up stay unpinned (setup, not measurement).
    env["SPARK_GRAFT_PIN"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


QNAME = os.environ.get("SPARK_GRAFT_SCALING_QUERY", "exception_pipeline")


def best_of(reps: int, cpus: int, sf_dir: str) -> dict:
    """Best of N runs — the sandbox shows intermittent multi-x slowdowns of
    whole Spark JVMs (co-tenancy); the best run reflects actual capability.
    SPARK_GRAFT_SCALING_QUERY picks which bench query drives throughput
    (exception_pipeline_bucketed = the production clustered layout)."""
    runs = [run(cpus, sf_dir) for _ in range(reps)]
    best = max(runs, key=lambda r: r["turns"] / r["queries"][QNAME])
    best["turns_per_sec"] = round(best["turns"] / best["queries"][QNAME], 1)
    best["scaling_query"] = QNAME
    best["all_pipeline_secs"] = [r["queries"][QNAME] for r in runs]
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    lo = best_of(reps, n, sf_dir)
    hi = best_of(reps, 4 * n, sf_dir)
    eff = hi["turns_per_sec"] / (4 * lo["turns_per_sec"])
    result = {
        "sf": lo["sf"],
        "turns": lo["turns"],
        "n_cores": n,
        "scaling_query": QNAME,
        "tp_n": lo["turns_per_sec"],
        "sec_n": lo["queries"][QNAME],
        "n4_cores": 4 * n,
        "tp_4n": hi["turns_per_sec"],
        "sec_4n": hi["queries"][QNAME],
        "scaling_efficiency": round(eff, 3),
        "headline_n": lo,
        "headline_4n": hi,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
