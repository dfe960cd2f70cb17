"""Machine controls for the scaling study (north-rule evidence support).

Two kernels, each run at N and 4N pinned processes on this box:

* ``cpu``   — regex + md5 over strings (the pipeline's compute profile):
  cache-resident, no memory-bus pressure.  Scaling efficiency here bounds
  what ANY software can achieve on this machine.
* ``membw`` — large-buffer memcpy (the profile of shuffle + Arrow transfer,
  which dominates the pipeline's JVM side).  On one box all cores share one
  memory system, so this kernel's 8→32 efficiency measures the *hardware*
  ceiling for bandwidth-bound stages — a real cluster's 4N executors bring
  4N memory buses and do not share this ceiling.

Usage: python scripts/machine_controls.py [N]   (default 8; compares N vs 4N)
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import re
import sys
import time

LINES = [
    "  at com.example.myproject.Foo.bar(Foo.java:%d)\n" % i for i in range(64)
] + ["Traceback (most recent call last):\n", "plain log line %d\n" % 7]
PATS = [re.compile(p) for p in (
    r"^[\t ]+(?:eval )?at ", r"(?:Exception|Error|Throwable)[:\r\n]",
    r"^Traceback \(most recent call last\):$", r"\bpanic: ", r"^[\t ]+File ",
)]


def cpu_kernel(dur: float, core: int, out):
    os.sched_setaffinity(0, {core})
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        for line in LINES:
            for p in PATS:
                p.search(line)
            hashlib.md5(line.encode()).digest()
        n += len(LINES)
    out.put(n)


def membw_kernel(dur: float, core: int, out):
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.empty(64 * 1024 * 1024, dtype=np.uint8)  # 64 MiB, far beyond LLC share
    b = np.empty_like(a)
    a[:] = 7
    t_end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < t_end:
        np.copyto(b, a)
        np.copyto(a, b)
        n += 2 * a.nbytes
    out.put(n)


def run(kernel, nproc: int, dur: float = 3.0) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=kernel, args=(dur, i, q)) for i in range(nproc)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / dur


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = {}
    for name, kern in (("cpu", cpu_kernel), ("membw", membw_kernel)):
        tp_n = max(run(kern, n) for _ in range(2))
        tp_4n = max(run(kern, 4 * n) for _ in range(2))
        out[name] = {
            "n": n,
            "tp_n": round(tp_n, 1),
            "tp_4n": round(tp_4n, 1),
            "efficiency": round(tp_4n / (4 * tp_n), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
