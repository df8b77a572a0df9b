"""Round-end preflight: run every gate the driver will apply, in the
order they fail fastest, and print one PASS/FAIL summary line each.

    python scripts/preflight.py [--quick]

Gates (rationale in .claude/skills/verify/SKILL.md and memory):
  1. --check-window   : everything code-touched this round is inside
                        the driver's 50-slot correctness window
  2. selfcheck sf0.001: full oracle suite, tuned session (fast signal)
  3. selfcheck --vanilla sf0.01 : full suite on the PLAIN SparkSession
                        the driver actually uses (1g heap — catches
                        config/memory assumptions the factory hides)
  4. pytest           : the unit/property/plan-guard suite
  5. bench            : one sf0.1 bench run (skipped with --quick)

Each stage runs as a subprocess so a JVM-fatal failure in one cannot
take down the rest."""

from __future__ import annotations

import subprocess
import sys
import time

STAGES: list[tuple[str, list[str]]] = [
    ("check-window", [sys.executable, "scripts/selfcheck.py", "--check-window"]),
    ("selfcheck sf0.001", [sys.executable, "scripts/selfcheck.py", "/root/testdata/sf0.001"]),
    (
        "selfcheck --vanilla sf0.01",
        [sys.executable, "scripts/selfcheck.py", "--vanilla", "/root/testdata/sf0.01"],
    ),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
    ("bench sf0.1", [sys.executable, "bench.py"]),
]


def main() -> int:
    quick = "--quick" in sys.argv[1:]
    failures = []
    for name, cmd in STAGES:
        if quick and name == "bench sf0.1":
            print(f"SKIP {name} (--quick)")
            continue
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True)
        dt = time.time() - t0
        status = "PASS" if proc.returncode == 0 else "FAIL"
        if proc.returncode == 0:
            tail = (proc.stdout or proc.stderr).strip().splitlines()[-3:]
        else:
            # Spark/JVM fatals land on stderr; show BOTH tails so the
            # actual diagnostic is never hidden behind an unrelated
            # stdout tail (ADVICE r4)
            tail = proc.stderr.strip().splitlines()[-3:] + proc.stdout.strip().splitlines()[-3:]
            failures.append(name)
        print(f"{status} {name} ({dt:.0f}s)")
        for ln in tail:
            print(f"     {ln[:160]}")
    if failures:
        print(f"\nPREFLIGHT FAIL: {failures}")
        return 1
    print("\nPREFLIGHT PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
