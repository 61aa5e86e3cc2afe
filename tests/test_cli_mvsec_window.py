"""test_mvsec CLI: the windowed (step_window-batched) accumulation loop must
reproduce the sequential per-window stepping of the reference loop exactly
(ref: test_mvsec.py:147-160 — accumulate raw events to >= 0.8*num_events,
voxelize, step; metrics on the batch's final reconstruction)."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # full tier only: compile-heavy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cista_flow_tpu.configs import Config
from cista_flow_tpu.runner import Reconstructor
from test_mvsec_data import H, W, make_mvsec_hdf5  # noqa: E402

h5py = pytest.importorskip("h5py")


@pytest.fixture()
def mvsec_root(tmp_path, monkeypatch):
    from cista_flow_tpu.data import mvsec
    monkeypatch.setitem(mvsec.VALID_TIME_INDEX, "indoor_flying1", [2, 20])
    root = str(tmp_path / "mvsec" / "indoor_flying")
    make_mvsec_hdf5(root)
    return str(tmp_path / "mvsec")


def _small_ne(cfg, path, name):
    """MVSEC_NE resized to the synthetic fixture's dims (the real class
    hardcodes the DAVIS 260x346 sensor)."""
    from cista_flow_tpu.data.mvsec import MVSEC_NE
    ds = MVSEC_NE(cfg, data_root=path, data_split=name)
    ds.width, ds.height = W, H
    ds.crop_size = (H, W)
    return ds


def test_mvsec_cli_windowed_matches_sequential(mvsec_root, tmp_path):
    from test_mvsec import evaluate

    cfg = Config(image_dim=(H, W), model_mode="cista-idnet",
                 path_to_test_data=mvsec_root, test_data_name="indoor_flying1",
                 output_folder=str(tmp_path / "out"), num_events=300,
                 test_img_num=8, flow_iters=1)

    results, keys = evaluate(cfg, dataset_factory=_small_ne)
    assert results and keys[-1] == "FWL"
    windowed_rows = [r for r in results if r[0] != "mean"]
    assert windowed_rows and windowed_rows[0][-1] >= 1  # N_frames

    # sequential reference loop: the exact upstream per-window stepping
    recon = Reconstructor(cfg)
    ds = _small_ne(cfg, os.path.join(mvsec_root, "indoor_flying"),
                   "indoor_flying1")
    recon.reset()
    seq_final_recs = []
    num_events_acc, events_acc = 0, []
    for batch_idx in range(min(len(ds), cfg.test_img_num)):
        raw_events_list, batch_gt = ds[batch_idx]
        rec = None
        for events, n_e in raw_events_list:
            num_events_acc += n_e
            events_acc.append(events)
            if cfg.num_events > 0 and num_events_acc < 0.8 * cfg.num_events:
                continue
            num_events_acc = 0
            evs = ds.events_to_voxel(np.concatenate(events_acc, axis=0),
                                     ds.height, ds.width)
            events_acc = []
            rec, _ = recon.step(evs)
        if num_events_acc != 0 or rec is None:
            continue
        seq_final_recs.append(rec)

    # windowed CLI's per-batch final reconstructions, recomputed through
    # step_window on a fresh runner (same dataset pass)
    recon2 = Reconstructor(cfg)
    recon2.reset()
    ds2 = _small_ne(cfg, os.path.join(mvsec_root, "indoor_flying"),
                    "indoor_flying1")
    win_final_recs = []
    num_events_acc, events_acc = 0, []
    for batch_idx in range(min(len(ds2), cfg.test_img_num)):
        raw_events_list, batch_gt = ds2[batch_idx]
        windows = []
        for events, n_e in raw_events_list:
            num_events_acc += n_e
            events_acc.append(events)
            if cfg.num_events > 0 and num_events_acc < 0.8 * cfg.num_events:
                continue
            num_events_acc = 0
            windows.append(ds2.events_to_voxel(
                np.concatenate(events_acc, axis=0), ds2.height, ds2.width))
            events_acc = []
        rec = None
        if windows:
            rec, _ = recon2.step_window(windows)
        if num_events_acc != 0 or rec is None:
            continue
        win_final_recs.append(rec)

    assert len(seq_final_recs) == len(win_final_recs) >= 1
    for a, b in zip(seq_final_recs, win_final_recs):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
