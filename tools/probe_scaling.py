"""Pure-CPU scaling-ceiling probe (BASELINE.md noise protocol).

Measures what the ENVIRONMENT lets pure CPU scale from 2 to 8
processes (equal busy-loop work per process; linear scaling => equal
wall time => ratio 1.0). `bench.py --scaling` readings are only
representative when bracketed by near-linear probes: in throttled
hypervisor windows the engine's raw ratio tracks just under this
probe's own ceiling (measured repeatedly in rounds 4-5), so a low
engine ratio under a low probe is host-imposed, not architectural.

Usage: python tools/probe_scaling.py [repeats]
Prints one line per repeat: wall2, wall8, ceiling.
No Ray involved; safe to run while no benchmark is active (never run
concurrently with a bench — one measurement at a time).
"""

import multiprocessing as mp
import sys
import time


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def wall(procs: int, n: int = 30_000_000) -> float:
    t0 = time.monotonic()
    with mp.Pool(procs) as p:
        p.map(burn, [n] * procs)
    return time.monotonic() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for _ in range(reps):
        t2 = wall(2)
        t8 = wall(8)
        print(f"wall2={t2:.2f}s wall8={t8:.2f}s ceiling={t2 / t8:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
