"""Smoke test for tools/kernel_bench.py (VERDICT r2 #9).

The microbenchmark harness encodes the measurement methodology (DCE
pitfalls, pattern probes, scan-amortized timing) that the round-2/3 kernel
conclusions rest on; this keeps it executable without a TPU by running a
probe subset through the Mosaic interpreter at tiny shapes in a
subprocess (its own process because the tool mutates global jax config
and argv).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# slow-marked (21 s subprocess): guards a measurement tool, not the
# training stack — run with `pytest -m slow` after editing kernel_bench
pytestmark = pytest.mark.slow


def test_kernel_bench_probes_run_in_interpret_mode():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "kernel_bench.py"),
         "b=4", "hw=1024", "pt=512", "iters=1", "interpret=1",
         "only=gemm1,fused-loss"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    # the probes each print one scan_time line; the fused loss+grad kernel
    # (the round-2/3 hot path) must be among them
    assert "fused-loss" in out.stdout, out.stdout
    assert "gemm1" in out.stdout, out.stdout
