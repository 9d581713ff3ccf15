#!/usr/bin/env python
"""Release gate: the one command that must be green before shipping.

Runs, in order, and prints a one-page PASS/FAIL summary:
  1. full pytest suite            (tests/)
  2. oracle sweep at sf0.01       (the driver's correctness gate)
  3. oracle sweep at sf0.1        (the hardening sweep — engine-boundary
                                   semantics that only diverge at scale,
                                   e.g. DuckDB date_diff boundary counting,
                                   have historically surfaced ONLY here)
  4. shuffle audit --check        (regenerates SHUFFLES.md; FAILS on any
                                   sort-class Exchange SinglePartition not
                                   on the explicit allowlist — the round-10
                                   lesson: global sort windows must not
                                   sail through the gate)
  5. bench at sf0.1               (wall + scaling guards; detail JSON)

Usage: python tools/release_gate.py [--skip-tests] [--skip-bench]
Exit code 0 iff every stage passed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag: str, cmd: list[str], timeout: int) -> tuple[bool, float, str]:
    start = time.perf_counter()
    try:
        p = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        ok = p.returncode == 0
        tail = (p.stdout or "").strip().splitlines()[-1:] or [""]
        return ok, time.perf_counter() - start, tail[0]
    except subprocess.TimeoutExpired:
        return False, time.perf_counter() - start, "TIMEOUT"


def main() -> int:
    skip_tests = "--skip-tests" in sys.argv
    skip_bench = "--skip-bench" in sys.argv
    stages: list[tuple[str, bool, float, str]] = []

    # Stage timeouts are sized for a ~3x co-tenant slowdown over the
    # quiet-box walls (r13 quiet suite: 1428 s; the same suite measured
    # 4297 s under heavy co-load in r14) — a TIMEOUT here should mean a
    # hang, not a busy neighbor.
    if not skip_tests:
        # -m "slow or not slow" overrides pytest.ini's default
        # -m "not slow" (the driver VERIFY profile): the release gate
        # always runs the FULL suite, slow-marked tests included.
        ok, wall, tail = run(
            "pytest",
            [
                sys.executable, "-m", "pytest", "tests/", "-x", "-q",
                "-m", "slow or not slow",
            ],
            5400,
        )
        stages.append(("pytest", ok, wall, tail))

    for sf in ("0.01", "0.1"):
        ok, wall, tail = run(
            f"sweep sf{sf}",
            [sys.executable, "tools/oracle_sweep.py", f"/root/testdata/sf{sf}"],
            3600,
        )
        stages.append((f"oracle sweep sf{sf}", ok, wall, tail))

    ok, wall, tail = run(
        "shuffle audit",
        [sys.executable, "tools/shuffle_audit.py", "--check"],
        3600,
    )
    stages.append(("shuffle audit", ok, wall, tail))

    if not skip_bench:
        ok, wall, tail = run("bench", [sys.executable, "bench.py"], 3600)
        if ok:
            try:
                d = json.loads(tail)
                guards = (
                    d.get("scaling_ok", True)
                    and d.get("index_scaling_ok", True)
                    and d.get("bm25_zipf_ok", True)
                )
                ok = ok and guards
                tail = (
                    f"total={d.get('value')}s queries={len(d.get('queries', {}))}"
                    f" scaling_ok={d.get('scaling_ok')}"
                    f" index_scaling_ok={d.get('index_scaling_ok')}"
                    f" bm25_zipf_ok={d.get('bm25_zipf_ok')}"
                    f" la1_median={d.get('la1_median')}"
                )
            except (json.JSONDecodeError, TypeError):
                ok = False
                tail = f"unparseable bench line: {tail[:120]}"
        stages.append(("bench sf0.1", ok, wall, tail))

    print("\n=== release gate ===")
    all_ok = True
    for tag, ok, wall, tail in stages:
        all_ok &= ok
        print(f"{'PASS' if ok else 'FAIL':4} {tag:18} {wall:7.1f}s  {tail}")
    print("=== " + ("ALL GREEN" if all_ok else "GATE FAILED") + " ===")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
