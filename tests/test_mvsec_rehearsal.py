"""MVSEC end-to-end rehearsal on simulator-generated HDF5.

VERDICT round-2 item: the day the real MVSEC files mount, the whole path
must already be known-green beyond unit tests. This generates a small
MVSEC-layout HDF5 pair with the event simulator (physically consistent
events + image_raw + flow_dist, the exact group names of the released files
— ref: data_readers/MVSEC.py:59-66,133-151), then runs the REAL pipeline
over it with no test doubles:

* ``test_mvsec.evaluate`` — discovery by ``*_data.hdf5``, the real
  ``MVSEC_NE`` reader (real VALID_TIME_INDEX window of indoor_flying4, raw
  event chunking, triangular GT-flow propagation), event accumulation to
  0.8*num_events, windowed device-resident serving, metrics + FWL + writers.
* ``eval_harness --harness_mode mvsec`` — --save_targets then the 1% gate
  against the run's own targets (the standing quality-regression flow).

Only the sensor resolution is reduced (cfg.mvsec_sensor_size — the DAVIS
260x346 sensor stays the default) to keep the CPU tier tractable.
"""
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier only: compile-heavy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cista_flow_tpu.configs import Config
from cista_flow_tpu.data import sim

pytest.importorskip("h5py")

H, W = 120, 160
SPLIT = "indoor_flying4"   # smallest real VALID_TIME_INDEX window


@pytest.fixture(scope="module")
def mvsec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvsec_sim")
    seq_dir = os.path.join(str(root), SPLIT)
    sim.write_mvsec_hdf5(seq_dir, split=SPLIT, n_real=10, h=H, w=W, seed=3,
                         speed=40.0)
    return str(root)


def _cfg(mvsec_root, out):
    cfg = Config(image_dim=(H, W), model_mode="cista-eiflow",
                 path_to_test_data=mvsec_root, test_data_name=SPLIT,
                 output_folder=out, num_events=2000, test_img_num=5,
                 flow_iters=1)
    cfg.mvsec_sensor_size = (H, W)
    return cfg


def test_mvsec_cli_runs_on_simulated_hdf5(mvsec_root, tmp_path):
    from test_mvsec import evaluate

    results, keys = evaluate(_cfg(mvsec_root, str(tmp_path / "out")))
    assert "psnr" in keys and keys[-1] == "FWL"
    rows = [r for r in results if r[0] != "mean"]
    assert rows and rows[0][-1] >= 1  # metrics over >= 1 frame
    mean = dict(zip(keys, [float(v) for v in results[-1][1:1 + len(keys)]]))
    assert np.isfinite(list(mean.values())).all()
    assert 0.0 < mean["ssim"] <= 1.0
    assert mean["psnr"] > 0.0


def test_eval_harness_mvsec_gate(mvsec_root, tmp_path, monkeypatch):
    """save-targets then gate: the standing regression flow, end to end
    through the harness CLI (argv -> configs -> evaluate -> compare)."""
    import eval_harness

    targets = str(tmp_path / "targets_mvsec.json")
    argv = ["--harness_mode", "mvsec", "--targets", targets,
            "--path_to_test_data", mvsec_root,
            "--test_data_name", SPLIT,
            "--image_dim", str(H), str(W),
            "--model_mode", "cista-eiflow", "--flow_iters", "1",
            "--num_events", "2000", "--test_img_num", "5",
            "--output_folder", str(tmp_path / "out")]
    # the CLI has no --mvsec_sensor_size flag (the real sensor needs none);
    # inject the rehearsal override through from_args
    orig = eval_harness.configs.from_args

    def patched(args):
        cfg = orig(args)
        cfg.mvsec_sensor_size = (H, W)
        return cfg

    monkeypatch.setattr(eval_harness.configs, "from_args", patched)

    assert eval_harness.main(argv + ["--save_targets"]) == 0
    saved = json.load(open(targets))
    assert "psnr" in saved and np.isfinite(list(saved.values())).all()
    # identical run gates green at 1%
    assert eval_harness.main(argv) == 0
    # a corrupted target trips the gate
    saved["psnr"] *= 1.5
    json.dump(saved, open(targets, "w"))
    assert eval_harness.main(argv) == 1
