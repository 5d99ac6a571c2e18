"""Pure-CPU hardware control for the scaling measurement (BASELINE.md).

Runs N_TASKS independent matmul burns as Ray tasks at two cpu levels in
fresh processes and reports the same efficiency statistic as
``bench.py --scaling``. The engine's scaling number is only meaningful
next to a SAME-HOUR run of this control: the sandbox's CPU and DRAM
budgets throttle independently and drift across hours (round-2 lesson,
BASELINE.md "Single-run noise").

Usage: python tools/cpu_control.py [lo hi repeats]   (default 2 8 3)
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

CODE = r"""
import ray, sys, time
import numpy as np
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)

@ray.remote(num_cpus=1)
def burn(seed: int) -> float:
    rng = np.random.default_rng(seed)
    a = rng.random((384, 384))
    s = 0.0
    for _ in range(60):
        a = a @ a
        a /= np.abs(a).max() + 1e-9
        s += float(a[0, 0])
    return s

t0 = time.time()
ray.get([burn.remote(i) for i in range(64)])
print("RESULT", round(time.time() - t0, 3))
ray.shutdown()
"""


def one(ncpu: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CODE, str(ncpu)], capture_output=True, text=True, check=True
    ).stdout
    return float([ln for ln in out.splitlines() if ln.startswith("RESULT")][0].split()[1])


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo_runs = [one(lo) for _ in range(repeats)]
    hi_runs = [one(hi) for _ in range(repeats)]
    t_lo, t_hi = statistics.median(lo_runs), statistics.median(hi_runs)
    print(
        json.dumps(
            {
                "metric": "cpu_control_scaling",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "runs_lo": lo_runs,
                "runs_hi": hi_runs,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
