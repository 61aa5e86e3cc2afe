"""Combine loss/metric aggregators + dataset dispatchers.

Equivalents of the reference's pretraining plumbing
(ref: DCEIFlow/core/loss/Combine.py:11-34, core/metric/Combine.py:11-53,
utils/datasets/__init__.py:4-52): weighted sums of named loss callables and
a running metric accumulator with summaries.
"""
from __future__ import annotations

from typing import Callable, Sequence


class CombineLoss:
    """Weighted sum of loss callables, merged metric dicts.

    Each callable: (output, target) -> (loss_scalar, metrics_dict).
    """

    def __init__(self, losses: Sequence[Callable], weights: Sequence[float]):
        assert len(losses) == len(weights)
        self.losses = list(losses)
        self.weights = list(weights)

    def __call__(self, output, target):
        total = 0.0
        metrics = {}
        for fn, w in zip(self.losses, self.weights):
            loss, m = fn(output, target)
            total = total + loss * w
            metrics.update(m)
        metrics["loss"] = total
        return metrics


class CombineMetric:
    """Running metric accumulator (ref metric Combine: calculate/push/summary)."""

    def __init__(self, metrics: Sequence[Callable]):
        self.metrics = list(metrics)
        self.all_metrics: dict[str, list] = {}

    def clear(self):
        self.all_metrics = {}

    def calculate(self, output, target, name=None) -> dict:
        out = {}
        for fn in self.metrics:
            out.update(fn(output, target))
        return out

    def push(self, metric_each: dict) -> dict:
        for key, v in metric_each.items():
            self.all_metrics.setdefault(key, []).append(float(v))
        return self.all_metrics

    def get_all(self):
        return self.all_metrics

    def summary(self):
        summary = {k: sum(v) / len(v) for k, v in self.all_metrics.items()}
        text = ",".join(f"{k}:{v:8.6f}" for k, v in summary.items())
        self.clear()
        return text, summary


def fetch_dataset(args, data_root_chairs2="./data/FlyingChairs2"):
    """Training-set dispatcher (ref: utils/datasets/__init__.py:4-21)."""
    from ..data import FlyingChairs2

    if args.stage == "chairs2":
        aug_params = {"crop_size": tuple(args.image_dim),
                      "min_scale": -0.2, "max_scale": 0.4, "do_flip": True}
        train = FlyingChairs2(args, data_root_chairs2, data_kind="train",
                              aug_params=aug_params)
        val = FlyingChairs2(args, data_root_chairs2, data_kind="trainval")
        return train, [val], ["chairs2trainval"]
    raise NotImplementedError(f"unknown stage {args.stage}")


def fetch_test_dataset(args, data_root_chairs2="./data/FlyingChairs2",
                       data_root_mvsec="./data/MVSEC_HDF5"):
    """Test-set dispatcher (ref: utils/datasets/__init__.py:24-52)."""
    from ..data import FlyingChairs2
    from ..data.mvsec import MVSEC

    if args.stage in ("chairs2", "chairs2val"):
        return ([FlyingChairs2(args, data_root_chairs2, data_kind="val")],
                ["chairs2val"])
    if args.stage == "chairs2train":
        return ([FlyingChairs2(args, data_root_chairs2, data_kind="train")],
                ["chairs2train"])
    if args.stage in ("mvsec", "mvsecfull"):
        splits = ["indoor_flying1", "indoor_flying2", "indoor_flying3",
                  "outdoor_day1", "outdoor_day2"]
        return ([MVSEC(args, data_root_mvsec, data_split=s) for s in splits],
                [f"mvsecval/{s}" for s in splits])
    raise NotImplementedError(f"unknown stage {args.stage}")
