"""The examples/ scripts are the onboarding surface (the reference
README's run-the-example role) — run each end-to-end at --smoke scale so
they cannot rot silently as the API evolves (VERDICT r3 #7).

Subprocess isolation is deliberate: custom_pressure flips
jax_enable_x64 globally and every example configures jax_platforms,
neither of which may leak into this process's JAX state."""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = REPO / "examples"


def _run(name, marker):
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / name), "--cpu", "--smoke"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO))
    assert proc.returncode == 0, \
        f"{name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    assert marker in proc.stdout, \
        f"{name}: expected output marker {marker!r} missing:\n" \
        f"{proc.stdout[-2000:]}"


def test_custom_pressure_example():
    _run("custom_pressure.py", "P_0")


def test_multicluster_example():
    _run("multicluster_fit.py", "acceptance per cluster")


@pytest.mark.slow
def test_model_comparison_example(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / "model_comparison.py"), "--cpu",
         "--smoke", "--out", str(tmp_path / "ev.json")],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    assert proc.returncode == 0, \
        f"model_comparison failed:\n{proc.stdout[-2000:]}\n" \
        f"{proc.stderr[-2000:]}"
    assert "log Bayes factors" in proc.stdout
    assert (tmp_path / "ev.json").exists()
