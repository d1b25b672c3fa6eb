"""N -> 4N scaling-efficiency evidence.

No real multi-node cluster exists in this sandbox, so "cluster size" is
emulated honestly: each run is CPU-pinned with ``taskset`` to exactly N host
cores (a local[N] JVM otherwise steals extra host cores for GC/JIT/shuffle
threads, silently flattering the small configuration).  The host is shared
(background load from other tenants), so rounds are interleaved N/4N and the
minimum steady-state superstep time per configuration is used — the minimum
is the contention-free capability, which is what a dedicated cluster
delivers.

Writes/updates BENCH.md and prints a JSON summary.

Usage: python tools/scaling.py [n_small] [n_edges] [rounds]
"""

from __future__ import annotations

import json
import subprocess
import sys

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N_EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
N_BIG = N_SMALL * 4
SUPERSTEPS = 4


def run(cpus: int) -> dict:
    cores = f"0-{cpus - 1}"
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "tools/scaling_probe.py",
         str(cpus), str(N_EDGES), str(SUPERSTEPS)],
        capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results: dict[int, list[dict]] = {N_SMALL: [], N_BIG: []}
    for _ in range(ROUNDS):
        for cpus in (N_BIG, N_SMALL):          # interleaved
            r = run(cpus)
            results[cpus].append(r)
            print(json.dumps(r))

    def best_steady(cpus: int) -> float:
        return min(min(x["steps"][1:]) for x in results[cpus])

    t_small, t_big = best_steady(N_SMALL), best_steady(N_BIG)
    speedup = t_small / t_big
    eff = speedup / 4
    edges = results[N_SMALL][0]["edges"]
    summary = {
        "n_small": N_SMALL, "n_big": N_BIG, "edges": edges,
        "steady_step_sec_small": t_small, "steady_step_sec_big": t_big,
        "edges_per_sec_small": round(edges / t_small, 1),
        "edges_per_sec_big": round(edges / t_big, 1),
        "speedup": round(speedup, 3), "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    section = f"""
## Scaling evidence (this engine, round-generated)

Same PageRank job (deterministic generated graph, {edges:,} edges,
{SUPERSTEPS} supersteps) at two emulated cluster sizes — CPU-pinned
`taskset -c` + `local[N]`, interleaved min-of-{ROUNDS} rounds (shared noisy
host; min = contention-free capability):

| parallelism | steady superstep (s) | edges/sec |
|---|---|---|
| local[{N_SMALL}] (N) | {t_small:.2f} | {edges / t_small:,.0f} |
| local[{N_BIG}] (4N) | {t_big:.2f} | {edges / t_big:,.0f} |

**Speedup N->4N: {speedup:.2f}x, scaling efficiency: {eff:.2f}**
(target >= 0.8).  Methodology note: a plain `local[N]` comparison without CPU
pinning is invalid here — the JVM's GC/JIT/shuffle threads use all host cores
regardless of N, so small-N runs are silently flattered.
"""
    with open("BENCH.md", "a") as f:
        f.write(section)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
