"""Smoke tests: every example runs end-to-end at its small default scale.

The examples are the acceptance surface (SURVEY.md §2.2 — the reference's
workload scripts define what "complete" means), so each must at least
execute its pipeline on the CPU mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}


def _run(script, *argv, timeout=900):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *argv],
        capture_output=True, text=True, cwd=REPO, timeout=timeout, env=ENV,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_population_4param_mle_and_bayes(tmp_path):
    out = _run(
        "population_4param.py",
        "--per-grid", "100", "--layers", "2", "--hidden", "16",
        "--mle-epochs", "30", "--batch-frac", "1.0",
        "--bayes", "--kernel", "chees",
        "--num-warmup", "20", "--num-samples", "20", "--num-chains", "2",
        "--outdir", str(tmp_path),
    )
    assert "MLE done" in out and "model complexity" in out
    assert (tmp_path / "post_4param.npz").exists()
