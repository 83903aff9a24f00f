"""CLI smoke tests (argument wiring; heavy paths covered by e2e tests)."""

import json
import subprocess
import sys


def test_help():
    out = subprocess.run(
        [sys.executable, "-m", "stutter_tpu", "--help"],
        capture_output=True, text=True, env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert out.returncode == 0
    for cmd in ("preprocess", "extract", "train", "train-ab", "train-seq", "predict", "stream", "bench"):
        assert cmd in out.stdout


def test_unknown_command_fails():
    out = subprocess.run(
        [sys.executable, "-m", "stutter_tpu", "nope"],
        capture_output=True, text=True, env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert out.returncode != 0
