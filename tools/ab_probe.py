"""Interleaved A/B isolated probe: alternate fresh-JVM runs of the SAME
query between two repo checkouts (before/after), so slow box-load drift
contaminates both sides equally instead of whichever side ran second.

Each child invocation is tools/isolated_probe.py's child protocol (one
fresh JVM, input-scan warm-up + one untimed run, then `runs` timed noop
runs); this driver alternates B,A,B,A,... and reports each side's
pooled median.

Usage: python tools/ab_probe.py <before_repo> <after_repo> q1,q2 [rounds=3] [runs=1]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def probe_once(repo: str, name: str, runs: int) -> list[float]:
    env = dict(os.environ, ISOPROBE_CHILD=name)
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "isolated_probe.py"),
         str(runs)],
        env=env, capture_output=True, text=True, cwd=repo,
    )
    line = next(
        (l for l in p.stdout.splitlines() if l.startswith("ISOPROBE ")), None
    )
    if line is None:
        print(f"FAIL {name} in {repo}: rc={p.returncode}\n{p.stderr[-1500:]}")
        return []
    return json.loads(line[len("ISOPROBE "):])["runs"]


def median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 3)


def main() -> None:
    before, after = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    for name in names:
        b_all: list[float] = []
        a_all: list[float] = []
        for _ in range(rounds):
            b_all += probe_once(before, name, runs)
            a_all += probe_once(after, name, runs)
        if b_all and a_all:
            mb, ma = median(b_all), median(a_all)
            print(
                f"AB {name}: before={mb:.2f} after={ma:.2f} "
                f"speedup={mb / ma:.2f}  b_runs={sorted(b_all)} "
                f"a_runs={sorted(a_all)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
