#!/usr/bin/env python3
"""Run the full sbt test suite and stamp the result as JSON.

r15 verdict #4: the judge had to re-run the 12-minute suite just to
confirm it was green. This tool runs it ONCE at round close and writes
TESTS_LOCAL.json next to BENCH_LOCAL.json so the artifact carries the
green/red signal: {total, passed, failed, duration_sec, git_head,
summary}. Copy to TESTS_r{N}.json when closing the round.

Usage: python3 tools/teststamp.py [outfile=TESTS_LOCAL.json]
Dev-only tool; never shipped with the library (the library is Scala).
"""
import json
import re
import subprocess
import sys
import time


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "TESTS_LOCAL.json"
    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch", "test"], capture_output=True, text=True)
    dur = round(time.time() - t0, 1)
    text = proc.stdout + proc.stderr
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()

    # sbt's overall line: "Passed: Total 172, Failed 0, Errors 0, Passed 172"
    m = re.search(r"Passed: Total (\d+), Failed (\d+), Errors (\d+), "
                  r"Passed (\d+)", text)
    # scalatest's own line: "Tests: succeeded N, failed M, ..."
    m2 = re.search(r"Tests: succeeded (\d+), failed (\d+)", text)
    stamp = {
        "suite": "sbt test",
        "git_head": head,
        "duration_sec": dur,
        "exit_code": proc.returncode,
        "green": proc.returncode == 0,
    }
    if m:
        stamp.update(total=int(m.group(1)), failed=int(m.group(2)),
                     errors=int(m.group(3)), passed=int(m.group(4)))
    if m2:
        stamp.update(scalatest_succeeded=int(m2.group(1)),
                     scalatest_failed=int(m2.group(2)))
    if not m and not m2:
        # keep the tail so a broken run is still diagnosable from the stamp
        stamp["tail"] = text.strip().splitlines()[-15:]
    with open(out, "w") as f:
        json.dump(stamp, f, indent=1)
        f.write("\n")
    print(json.dumps(stamp))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()


