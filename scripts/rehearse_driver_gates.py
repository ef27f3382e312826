"""Rehearse the driver's round-end gates under a driver-like timeout.

Round 3 shipped zero driver-visible evidence because bench.py and
``__graft_entry__.dryrun_multichip`` grew past the driver's execution envelope —
both artifacts came back rc=124 with empty tails, and nothing in the repo would
have caught it (VERDICT r3 weak #6). This script is that regression guard: it runs
both gates exactly the way the driver does (subprocess, hard external timeout) and
fails loudly if either misses its envelope or violates its output contract:

- ``python bench.py`` must exit 0 within the envelope and print exactly ONE stdout
  line, parseable JSON with the headline metric and value > 0 (a partial record
  from the in-process watchdog still passes — that is the r4 design working).
- ``dryrun_multichip(8)`` must exit 0 within the envelope and print the three
  section lines (adversarial step, extraction parity, MGFN parity).

Usage:
    python scripts/rehearse_driver_gates.py [--envelope 1500] [--gate bench|dryrun|both]

Exit code 0 = both gates would have produced green driver artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_gate(cmd: list[str], envelope: int, env: dict) -> tuple[int, str, str, float]:
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=envelope
        )
        return proc.returncode, proc.stdout, proc.stderr, time.perf_counter() - t0
    except subprocess.TimeoutExpired as e:
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        return 124, out, err, time.perf_counter() - t0


def rehearse_bench(envelope: int) -> bool:
    env = dict(os.environ)
    # The in-process watchdog must beat the external kill by a margin, as in prod.
    env.setdefault("BENCH_TIMEOUT_S", str(max(envelope - 180, 120)))
    rc, out, err, wall = run_gate([sys.executable, "bench.py"], envelope, env)
    tail = "\n".join(err.strip().splitlines()[-5:])
    print(f"--- bench.py: rc={rc} wall={wall:.0f}s\nstderr tail:\n{tail}")
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    if rc != 0:
        print(f"FAIL: bench rc={rc} (driver would record a timeout/crash)")
        return False
    if len(lines) != 1:
        print(f"FAIL: bench printed {len(lines)} stdout lines, contract is exactly 1")
        return False
    try:
        rec = json.loads(lines[0])
    except json.JSONDecodeError as e:
        print(f"FAIL: bench stdout not JSON: {e}")
        return False
    if rec.get("metric") != "feature_extraction_clips_per_sec_per_chip" or not rec.get("value"):
        print(f"FAIL: bench record malformed or value==0: {lines[0][:200]}")
        return False
    print(f"OK: bench {rec['value']} clips/s (vs_baseline {rec['vs_baseline']}), "
          f"{len(rec.get('detail', {}))} detail keys, wall {wall:.0f}s")
    return True


def rehearse_dryrun(envelope: int) -> bool:
    env = dict(os.environ)
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    rc, out, err, wall = run_gate([sys.executable, "-c", code], envelope, env)
    print(f"--- dryrun_multichip(8): rc={rc} wall={wall:.0f}s")
    if rc != 0:
        print(f"FAIL: dryrun rc={rc}\nstdout tail: {out[-500:]}\nstderr tail: {err[-500:]}")
        return False
    combined = out + err
    required = [
        "dryrun_multichip OK",
        "extraction parity OK",
        "MGFN parity OK",
    ]
    missing = [r for r in required if r not in combined]
    if missing:
        print(f"FAIL: dryrun missing section lines: {missing}\nstdout: {out[-800:]}")
        return False
    print(f"OK: dryrun all three section lines present, wall {wall:.0f}s")
    return True


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--envelope", type=int, default=1500,
                    help="driver-like external timeout per gate (seconds)")
    ap.add_argument("--gate", choices=("bench", "dryrun", "both"), default="both")
    args = ap.parse_args()

    ok = True
    if args.gate in ("dryrun", "both"):
        ok = rehearse_dryrun(args.envelope) and ok
    if args.gate in ("bench", "both"):
        ok = rehearse_bench(args.envelope) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
