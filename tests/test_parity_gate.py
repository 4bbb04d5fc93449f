"""The ARMED checkpoint-parity gate (VERDICT r3 item 2): the gate's assert
path executes in CI against the recorded full-flagship-shape torch-oracle
fixture — no released ``.pth`` needed.

Fixture provenance: tools/record_parity_fixture.py ran the reference's
actual model code (iconvsr_ipb_par.py via tests/oracle/mmcv_shim) at
mid_channels=64 / num_blocks=8 / K=6 on the deterministic synthetic
compressed-clip dataset and recorded outputs (fp16) + PSNR/SSIM computed
with our cv2-oracle-tested metrics. The gate regenerates the dataset from
spec.json, converts the recorded state_dict through core/convert.py, and
asserts per-clip max|output diff| / PSNR / SSIM (the reference protocol's
regression check is exactly this PSNR/SSIM read: reference
tools/test.py:175-182).
"""

import sys
from pathlib import Path

import pytest

pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.parity_check import run_fixture_gate

FIXTURE = Path(__file__).parent / "fixtures" / "parity"


@pytest.mark.slow
def test_fixture_gate_passes():
    """Converted full-shape flagship matches the recorded torch-oracle run
    on every REDS4-named clip (outputs + metrics)."""
    assert run_fixture_gate(str(FIXTURE)) == 0


@pytest.mark.slow
def test_fixture_gate_fails_on_tampered_weights():
    """The assert path FIRES: a perturbed weight must fail the gate (guards
    against the gate silently passing everything)."""
    assert run_fixture_gate(str(FIXTURE), clips_limit=1, tamper=True) == 1
