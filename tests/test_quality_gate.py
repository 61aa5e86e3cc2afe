"""Standing quality regression gate for the flagship serving stack.

Replays the committed trained anchor (``gate/flagship_sim40_f16.npz``, the
round-3 40-epoch 3-phase cista-eiflow run, exported f16 by gate_export.py)
through the real eval CLI on the deterministic held-out simulated sequences
and pins the metrics against the committed targets
(``gate/targets_sim_eiflow.json``). Any drift anywhere in the serving stack
— reader, voxelization, windowed device-resident serving, DCEIFlow, warps,
CISTA-LSTC, metrics — moves PSNR/SSIM/EPE and fails this test.

The targets were recorded on CPU float32 at this exact configuration
(gate_export.record_targets), so the comparison here is tight (0.2%), far
below the 1% quality north star (BASELINE.md). Reference protocol being
pinned: /root/reference/test_with_flow.py:24-233.
"""
from __future__ import annotations

import json
import os

import pytest

from conftest import REPO_ROOT

GATE_DIR = os.path.join(REPO_ROOT, "gate")
ANCHOR = os.path.join(GATE_DIR, "flagship_sim40_f16.npz")
TARGETS = os.path.join(GATE_DIR, "targets_sim_eiflow.json")

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not os.path.exists(ANCHOR),
                    reason="gate anchor not committed yet")
def test_flagship_quality_gate(tmp_path):
    import eval_harness
    import sim_quality

    eval_dir = sim_quality.ensure_eval_data(str(tmp_path), 180, 240,
                                            eval_frames=30, seed=0)
    rc = eval_harness.main([
        "--harness_mode", "with_flow",
        "--model_mode", "cista-eiflow",
        "--image_dim", "180", "240",
        "--path_to_test_data", eval_dir,
        "--test_data_mode", "upsampled",
        "--path_to_test_model", ANCHOR,
        "--dtype", "float32",
        "--output_folder", str(tmp_path / "out"),
        "--targets", TARGETS,
        "--harness_tolerance", "0.002",
    ])
    assert rc == 0, "gate metrics drifted beyond 0.2% tolerance"

    # absolute floor: the gate stays meaningful even if targets are ever
    # regenerated — the trained anchor must reconstruct well (untrained nets
    # emit ~flat gray at ~17.4 dB on these sequences)
    with open(TARGETS) as f:
        targets = json.load(f)
    assert targets["psnr"] > 22.5
    assert targets["ssim"] > 0.75
    assert targets["epe"] < 1.0
