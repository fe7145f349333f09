#!/usr/bin/env python
"""Per-module process isolation for the test suite.

Two full single-process suite runs have segfaulted inside XLA:CPU's
``backend_compile_and_load`` at ~80% of the run (upstream LLVM/XLA flake
under hundreds of live jitted executables; the same tests pass in a fresh
process — docs/ROADMAP.md reliability note).  ``tests/conftest.py`` clears
JAX caches per module, which has held so far; this runner makes the
isolation STRUCTURAL: each test module runs in its own pytest subprocess,
so one module's backend state can never take down another's run, and a
crash is attributed to the exact module.

Usage: ``python tests/run_suite.py [extra pytest args]``
Exit code: 0 iff every module passed.
"""

import glob
import os
import subprocess
import sys
import time

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def main(argv):
    modules = sorted(glob.glob(os.path.join(TESTS_DIR, "test_*.py")))
    failures = []
    t0 = time.time()
    for mod in modules:
        name = os.path.basename(mod)
        t1 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", mod, "-q", *argv],
            cwd=REPO,
        )
        # rc 5 = "no tests collected" (e.g. under a -k filter): not a failure
        ok = proc.returncode in (0, 5)
        status = "ok" if ok else f"FAIL rc={proc.returncode}"
        print(f"[run_suite] {name}: {status} ({time.time() - t1:.0f}s)",
              flush=True)
        if not ok:
            failures.append((name, proc.returncode))
    print(f"[run_suite] {len(modules) - len(failures)}/{len(modules)} "
          f"modules passed in {time.time() - t0:.0f}s")
    for name, rc in failures:
        print(f"[run_suite]   FAILED: {name} (rc={rc})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
