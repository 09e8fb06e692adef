"""Host compute-capacity probe.

Measures how aggregate throughput of IDENTICAL independent processes
scales with process count, for (a) cache-resident ALU-bound work and
(b) DRAM-bound work.  This bounds what ANY engine can show for
multi-process scaling on this box: if K->4K pure-numpy processes only
deliver R× aggregate, no benchmark run at those levels can exceed
efficiency R/4.

Measured on the sandbox host (2026-08-17):

    light n=1  per_proc=9979      heavy n=1  per_proc=15
    light n=2  per_proc=9330      heavy n=8  per_proc=13
    light n=4  per_proc=8973      heavy n=32 per_proc=11
    light n=8  per_proc=8440
    light n=16 per_proc=6550
    light n=32 per_proc=3998

    pairwise ALU efficiency:  2->8 = 0.90   4->16 = 0.73   8->32 = 0.47

i.e. a 16-physical-core SMT-32 host: the second hyperthread of a core
adds ~25% ALU throughput, so 8->32 processes tops out at ~1.9× for
compute-bound work.  The scaling north-rule pair is therefore
num_cpus=2 vs num_cpus=8 (N vs 4N, both within physical cores), the
faithful stand-in for N vs 4N *nodes* each contributing full cores.
"""

from __future__ import annotations

import subprocess
import sys

_WORK = """
import numpy as np, time, sys
kind = sys.argv[1]
size = 200_000 if kind == "light" else 8_000_000  # 1.6MB vs 64MB
a = np.random.RandomState(0).rand(size)
t0 = time.time(); it = 0
while time.time() - t0 < 6.0:
    b = np.sqrt(a * 1.0001 + 0.5); s = b.sum(); it += 1
print(it)
"""


def probe(kind: str, counts=(1, 2, 4, 8, 16, 32)) -> dict[int, float]:
    out = {}
    for n in counts:
        procs = [
            subprocess.Popen([sys.executable, "-c", _WORK, kind], stdout=subprocess.PIPE)
            for _ in range(n)
        ]
        total = sum(int(p.communicate()[0]) for p in procs)
        out[n] = total / n
        print(f"{kind} n={n} aggregate={total} per_proc={total / n:.0f}", flush=True)
    return out


if __name__ == "__main__":
    light = probe("light")
    probe("heavy", counts=(1, 8, 32))
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        eff = (light[hi] * hi) / (light[lo] * lo) / (hi / lo)
        print(f"ALU pairwise efficiency {lo}->{hi}: {eff:.2f}")
