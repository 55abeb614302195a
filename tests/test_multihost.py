"""Multi-host (jax.distributed) path: the two-process CPU simulation runs
the full env-guarded bootstrap — ``maybe_init_distributed`` → global
4-device mesh across 2 processes → ``put_global_batch``
(``make_array_from_process_local_data``) → one jitted train step — and
both processes must agree on the loss (``scripts/check_multihost_cpu.py``;
the reference's torchrun-DDP analog, ``/root/reference/train.py:414-425``)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Hardware checks pin these paths on the real chip each round; the
# CPU oracle here is thorough but slow (two-process jax.distributed simulation).
pytestmark = pytest.mark.slow


def test_two_process_cpu_simulation():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_multihost_cpu.py")],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
