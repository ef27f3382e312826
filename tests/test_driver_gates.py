"""Regression guards for the driver's round-end gates (VERDICT r3 weak #6).

Round 3's bench.py and dryrun_multichip grew past the driver's execution envelope
and shipped rc=124 artifacts with empty tails; nothing in the repo caught it. These
tests rehearse both gates the way the driver runs them — subprocess, hard external
timeout, output-contract assertions — so an envelope regression fails the build
instead of silently forfeiting a round.

The full-scale rehearsal (real shapes, real device) is scripts/rehearse_driver_gates.py;
here the dryrun runs at its real (tiny-model) scale and bench runs in BENCH_SMOKE mode
(same emission machinery, tiny compute).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )


def test_bench_smoke_contract():
    """bench.py in smoke mode must satisfy the driver's parse contract: exit 0,
    exactly one stdout line, valid JSON, headline value > 0."""
    proc = _run(
        [sys.executable, "bench.py"],
        timeout=900,
        extra_env={"BENCH_SMOKE": "1", "BENCH_TIMEOUT_S": "800"},
    )
    assert proc.returncode == 0, f"stderr tail: {proc.stderr[-1000:]}"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {len(lines)}: {lines[:3]}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "feature_extraction_clips_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert "batched_fused_clips_per_sec" in rec["detail"]


def test_bench_emit_is_one_shot():
    """emit() and the failure record share one guard: whichever path runs first
    wins, every later call is a no-op (the driver parses exactly one line)."""
    import importlib

    import bench

    importlib.reload(bench)  # fresh _EMITTED state regardless of test order
    bench.RESULT["value"] = 1.0
    assert bench.emit() is True
    assert bench.emit() is False  # second call suppressed
    # The failure record is also suppressed once anything was emitted.
    bench._print_fail_record("late failure")  # must not raise or print a 2nd record


def test_bench_failure_record_on_crash():
    """If bench dies before the headline exists (dead backend, crash), it must
    still print exactly one JSON record (value 0, fatal_error) and exit 1 — never
    an empty stdout like BENCH_r03. BENCH_FAULT_INJECT=init fails pre-headline
    deterministically (racing the init-fuse timer was flaky on a busy host, and
    this box force-selects its platform outside the env-var path, so a bogus
    JAX_PLATFORMS cannot crash it)."""
    proc = _run(
        [sys.executable, "bench.py"],
        timeout=300,
        extra_env={"BENCH_FAULT_INJECT": "init"},
    )
    assert proc.returncode == 1
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines[:3]}"
    rec = json.loads(lines[0])
    assert rec["value"] == 0.0
    assert "fatal_error" in rec["detail"]


@pytest.mark.slow
def test_dryrun_multichip_rehearsal_under_driver_timeout():
    """dryrun_multichip(8) must finish inside a driver-like envelope and print all
    three section lines (the MULTICHIP artifact's tail contract)."""
    proc = _run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        timeout=1200,
    )
    assert proc.returncode == 0, f"stderr tail: {proc.stderr[-1000:]}"
    combined = proc.stdout + proc.stderr
    for required in ("dryrun_multichip OK", "extraction parity OK", "MGFN parity OK"):
        assert required in combined, f"missing {required!r}; stdout: {proc.stdout[-800:]}"


def test_bench_block_anatomy_loader():
    """The computed-ceiling path only engages when the committed anatomy matches
    this device generation AND batch; anything else falls back to the estimate
    (a stale artifact from another part/batch must never relabel the ceiling)."""
    import importlib

    import bench

    importlib.reload(bench)
    rec = bench._load_block_anatomy("tpu v5 lite", 16)
    if rec is not None:  # artifact committed (hw_checklist/block_anatomy.json)
        assert rec["mfu_ceiling_computed"] > 0
        assert rec["blocks"] and all("ms" in b for b in rec["blocks"].values())
        assert abs(sum(b["ms"] for b in rec["blocks"].values()) - rec["sum_blocks_ms"]) < 0.01
    # Mismatches -> None (fallback to estimate), never an exception.
    assert bench._load_block_anatomy("tpu v5 lite", 2) is None
    assert bench._load_block_anatomy("tpu v99", 16) is None


def test_bench_emit_snapshot_is_thread_safe():
    """emit() serializes a SNAPSHOT: a detail dict that mutates mid-emit must not
    suppress the record (ADVICE r4 — the watchdog emits from a timer thread)."""
    import importlib
    import threading

    import bench

    importlib.reload(bench)
    bench.RESULT["value"] = 1.0
    stop = threading.Event()

    def churn():
        i = 0
        while not stop.is_set():
            bench.DETAIL[f"k{i % 64}"] = i
            i += 1

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    try:
        assert bench.emit() is True  # must not raise 'dict changed size'
    finally:
        stop.set()
        t.join(timeout=5)
