#!/usr/bin/env python
"""Per-file test runner for timeshared hosts: one pytest process per file.

Why not one `pytest tests/`? On this class of (timeshared, live-migrating)
host, XLA:CPU sporadically SIGSEGVs/aborts while COMPILING or SERIALIZING
the suite's largest programs (the vmapped / shard_map multi-restart fit
executables) — but only deep into a long-running process; the same tests
pass every time in a fresh process (observed r5: four consecutive full-suite
runs died at ~90% inside jax's backend_compile_and_load / cache-write path,
with cache on, off, and ISA-pinned, while every per-file run passed).

Running one process per test file keeps each process short (compiles are
reliable), lets the shared persistent compilation cache accumulate safely
(later files reuse earlier files' programs), and retries a crashed file
once in a fresh process. Exit code 0 iff every file passes.

Usage: python tools/run_tests.py [extra pytest args...]
"""

import glob
import os
import subprocess
import sys
import time


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "tests", "test_*.py")))
    extra = sys.argv[1:]
    failed, crashed_once = [], []
    t0 = time.time()
    for f in files:
        name = os.path.basename(f)
        for attempt in (1, 2):
            t = time.time()
            r = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", *extra], cwd=repo
            )
            dt = time.time() - t
            if r.returncode == 0:
                print(f"[run_tests] {name}: OK ({dt:.0f}s"
                      + (", retry" if attempt == 2 else "") + ")")
                break
            if r.returncode in (1,):  # genuine test failures: no retry
                print(f"[run_tests] {name}: FAILED (rc=1)")
                failed.append(name)
                break
            # native crash (segfault/abort) or other abnormal exit: retry
            # once in a fresh process
            print(f"[run_tests] {name}: rc={r.returncode} (crash?), "
                  + ("retrying" if attempt == 1 else "giving up"))
            if attempt == 1:
                crashed_once.append(name)
            else:
                failed.append(name)
    print(f"[run_tests] total {time.time()-t0:.0f}s; "
          f"{len(files)-len(failed)}/{len(files)} files green"
          + (f"; retried after crash: {crashed_once}" if crashed_once else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
