"""Phase schedule parity with the reference trainer (ref: train.py:116-129,
210-217): which subnet is frozen, which loss runs, and when the temporal
consistency term is allowed (only on the train-rec alternation)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from types import SimpleNamespace

from train import phase_for_epoch


def _cfg(flow_epoch=5, rec_epoch=5, model_mode="cista-eiflow"):
    return SimpleNamespace(model_mode=model_mode, flow_epoch=flow_epoch,
                           rec_epoch=rec_epoch)


def test_phase1_train_flow_gt_flow():
    for e in range(5):
        assert phase_for_epoch(_cfg(), e) == ("rec", "flow", True, None)


def test_phase2_train_rec_pred_flow():
    for e in range(5, 10):
        assert phase_for_epoch(_cfg(), e) == ("flow", "rec", False, None)


def test_phase3_alternation_matches_reference():
    # ref train.py:123-129: (e-F-R)%4>=2 -> fix flow / train_rec -> loss 'rec'
    # (consis on at s>=2); else fix rec / train flow -> loss 'both', no consis.
    expect = {0: ("rec", "both"), 1: ("rec", "both"),
              2: ("flow", "rec"), 3: ("flow", "rec")}
    for e in range(10, 22):
        fix, loss_mode, use_gt, lr = phase_for_epoch(_cfg(), e)
        assert (fix, loss_mode) == expect[(e - 10) % 4], e
        assert use_gt is False and lr == 3e-5


def test_gtflow_pretrain_mode():
    assert phase_for_epoch(_cfg(model_mode="cista-gtflow"), 3) == (
        None, "rec", True, None)
