"""Serial sharded full-suite runner for degraded (1-core) rigs.

VERDICT r4 #2: the 45-60 min suite has never been recorded green end-to-end
because the rig keeps degrading to nproc=1 mid-round, where one monolithic
pytest run (a) takes hours and (b) intermittently dies from the XLA CPU-mesh
collective-rendezvous watchdog SIGABRT (CLAUDE.md), losing the whole record.

This runner executes the suite ONE TEST FILE PER PROCESS, strictly serially
(never two XLA-CPU processes at once), appending a JSONL line per file so a
crash loses one file, not the run.  Files that die abnormally (signal, or a
crash with no pytest failure report — the watchdog abort hides behind rc!=0
with a "passed" line already printed) are retried up to 2 extra times; real
test FAILURES are never retried.  The persistent compilation cache
(tests/conftest.py -> .jax_cache/) makes repeat shards cheap.

Usage:
    python tools/run_suite.py [--out SUITE_LOG.jsonl] [tests/test_x.py ...]

Prints a cumulative `passed/failed` total and exits 0 only when every file
is green.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORDS = {"passed": "passed", "failed": "failed", "skipped": "skipped",
          "errors": "error"}  # pytest prints "1 error" / "2 errors"


def _parse_counts(out: str) -> dict:
    """Pull pass/fail/skip counts from pytest's final summary line."""
    counts = {k: 0 for k in _WORDS}
    for line in reversed(out.splitlines()):
        if " passed" in line or " failed" in line or " error" in line:
            for key, word in _WORDS.items():
                m = re.search(rf"(\d+) {word}", line)
                if m:
                    counts[key] = int(m.group(1))
            if any(counts.values()):
                return counts
    return counts


def run_file(path: str, timeout: float, attempts: int = 3) -> dict:
    for attempt in range(1, attempts + 1):
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q", "--tb=line",
                 "-p", "no:cacheprovider"],
                capture_output=True, text=True, timeout=timeout, cwd=REPO)
            rc, out = res.returncode, res.stdout + res.stderr
        except subprocess.TimeoutExpired as exc:
            rc, out = 124, (exc.stdout or "") + (exc.stderr or "")
            out = out if isinstance(out, str) else out.decode(
                "utf-8", "replace")
        dt = time.time() - t0
        counts = _parse_counts(out)
        rec = {"file": os.path.basename(path), "rc": rc, "secs": round(dt, 1),
               "attempt": attempt, **counts}
        if rc == 0:
            return rec
        # real pytest-reported failures are deterministic: do not retry
        if counts["failed"] or counts["errors"]:
            rec["tail"] = "\n".join(out.splitlines()[-15:])
            return rec
        # abnormal death (signal / watchdog abort / timeout): retry
        rec["crash_tail"] = "\n".join(out.splitlines()[-6:])
        print(f"  {os.path.basename(path)}: abnormal death rc={rc} "
              f"(attempt {attempt}/{attempts}) — "
              + ("retrying" if attempt < attempts else "giving up"),
              flush=True)
        if attempt == attempts:
            return rec
    raise AssertionError("unreachable")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="*",
                    help="test files (default: all tests/test_*.py)")
    ap.add_argument("--out", default=os.path.join(REPO, "SUITE_LOG.jsonl"))
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-file subprocess timeout (seconds)")
    args = ap.parse_args(argv)
    files = args.files or sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py")))

    total = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    bad = []
    t_start = time.time()
    with open(args.out, "a") as log:
        log.write(json.dumps({"suite_start": time.strftime("%F %T"),
                              "n_files": len(files), "nproc":
                              os.cpu_count()}) + "\n")
        log.flush()
        for i, path in enumerate(files, 1):
            rec = run_file(path, args.timeout)
            for key in total:
                total[key] += rec.get(key, 0)
            status = "ok" if rec["rc"] == 0 else f"RC={rec['rc']}"
            if rec["rc"] != 0:
                bad.append(rec["file"])
            print(f"[{i}/{len(files)}] {rec['file']}: {status} "
                  f"{rec['passed']}p/{rec['failed']}f/{rec['skipped']}s "
                  f"in {rec['secs']}s (cum {total['passed']}p/"
                  f"{total['failed']}f)", flush=True)
            log.write(json.dumps(rec) + "\n")
            log.flush()
        summary = {"suite_end": time.strftime("%F %T"),
                   "wall_secs": round(time.time() - t_start, 1),
                   "bad_files": bad, **total}
        log.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)
    return 0 if not bad and not total["failed"] and not total["errors"] else 1


if __name__ == "__main__":
    sys.exit(main())
