"""Typed configuration with the reference's CLI flag surface.

One dataclass consumed everywhere (the reference threads an argparse
namespace — ref: utils/configs.py:4-165). ``add_args``/``from_args`` keep the
exact flag names so reference run commands work unchanged.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    return v not in ("0", "false", "False", "no")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    try:
        return int(v)
    except ValueError:
        import warnings
        warnings.warn(f"{name}={v!r} is not an int; using default {default}")
        return default


@dataclass
class Config:
    # basic
    image_dim: tuple = (180, 240)
    path_to_model: str = "models"
    path_to_test_model: str | None = None
    model_name: str = ""

    # e2v network
    model_mode: str = "cista-lstc"  # cista-lstc | cista-eiflow | cista-eraft | cista-idnet
    num_bins: int = 5
    depth: int = 5
    base_channels: int = 64
    ds: int = 8

    # training
    path_to_e2v: str | None = None
    path_to_e2vflow: str | None = None
    path_to_flownet: str | None = None
    path_to_train_data: str | None = None
    len_sequence: int = 10
    shuffle: bool = True
    epochs: int = 1
    flow_epoch: int = 20
    rec_epoch: int = 5
    lr: float = 1e-4
    batch_size: int = 1
    is_SummaryWriter: bool = False
    load_epoch_for_train: int = 0
    load_lr: float = 1e-4
    train_all: bool = False
    is_load_flow: bool = False
    is_forward_flow: bool = False
    no_warp: bool = False
    is_gt_flow: bool = False
    warp_mode: str = "forward"
    is_reverse_events: bool = False
    is_bi: bool = False
    distributed: bool = False

    # testing
    path_to_test_data: str | None = None
    load_epoch_for_test: int | None = None
    reader_type: str = "image_reader"
    test_data_name: str | None = None
    dataset: str = "SIM"
    time_unit: str = "s"
    test_img_num: int = 50
    num_events: int = 15000
    test_data_mode: str = "real"
    k_shift: int = -1
    n_event_skip: int = 0
    dvs: str | None = None

    # output
    output_folder: str = "test_images"
    is_write_image: bool = True
    is_write_event: bool = False
    is_write_video: bool = False
    is_write_flow: bool = False
    is_write_emap: bool = False

    # display (kept for CLI parity; interactive display is a no-op headless)
    display_train: bool = False
    display_test: bool = False
    show_events: bool = True
    event_display_mode: str = "grayscale"
    num_bins_to_show: int = -1

    # TPU-specific extensions (absent from the reference)
    dtype: str = "float32"           # compute dtype: float32 | bfloat16
    mesh_shape: str = "1"            # comma ints, e.g. "8" (dp) or "4,2" (dp,mp)
    mesh_axes: str = "data"          # comma axis names matching mesh_shape
    flow_iters: int | None = None    # override flow GRU iterations
    seed: int = 1234
    orbax_ckpt: bool = False         # also write native orbax checkpoints
    save_every_steps: int = 0        # >0: mid-epoch preemption-safe saves
    remat: bool = False              # rematerialize BPTT steps (large batch)

    # Serving/kernel knobs (TPU extensions). These change which exactness-
    # pinned formulation runs, so they are CONFIG, not ambient env; the
    # CISTA_* env vars remain available as overrides of the defaults only
    # (a set env var changes the default; an explicit CLI flag wins).
    # PERF.md documents each formulation and its measured A/B.
    encoder_merge: str = field(default_factory=lambda: {
        "0": "", "1": "trio", "pair": "pair", "trio": "trio", "": ""}.get(
            os.environ.get("CISTA_TRIO", "pair"), "pair"))
    serve_pallas: bool = field(default_factory=lambda: _env_bool(
        "CISTA_SERVE_PALLAS", True))       # Pallas corr lookup when serving
    train_pallas: bool = field(default_factory=lambda: _env_bool(
        "CISTA_TRAIN_PALLAS", False))      # custom_vjp lookup in BPTT graphs
    corr_fuse_proj: bool = field(default_factory=lambda: _env_bool(
        "CISTA_CORR_FUSE_PROJ", True))     # motion-enc convc1 inside the kernel
    eraft_pair_tower: bool = field(default_factory=lambda: _env_bool(
        "CISTA_ERAFT_PAIR", False))        # block-diag fnet+cnet at step batch
    eraft_tchunk: int = field(default_factory=lambda: _env_int(
        "CISTA_ERAFT_TCHUNK", 0))          # time-subchunk the window flow call
    flow_half: bool = field(default_factory=lambda: _env_bool(
        "CISTA_FLOW_HALF", False))         # run the eiflow flow net on the
    #                                        2x-downsampled domain (serving
    #                                        reduction; gate-admitted only)

    # derived / fixed (ref: e2v/e2v_model.py:111)
    scale_factor: float = 0.5

    @property
    def padded_dim(self):
        h, w = self.image_dim
        return ((h + 31) // 32 * 32, (w + 31) // 32 * 32)

    def default_flow_iters(self) -> int:
        if self.flow_iters is not None:
            return self.flow_iters
        return {"cista-eiflow": 6, "cista-eraft": 12, "cista-idnet": 1}.get(
            self.model_mode, 6)


_BOOL_FALSE_FLAGS = {
    # flags whose presence sets the field False (reference uses dest inversion)
    "no_shuffle": "shuffle",
    "no_write_image": "is_write_image",
}


def add_args(parser: argparse.ArgumentParser) -> None:
    """Register the reference's flag surface (ref: utils/configs.py:4-165)."""
    parser.add_argument("--image_dim", nargs=2, default=[180, 240], type=int)
    parser.add_argument("--path_to_model", default="models", type=str)
    parser.add_argument("--path_to_test_model", type=str)
    parser.add_argument("--model_name", default="", type=str)
    parser.add_argument("--model_mode", default="cista-lstc", type=str)
    parser.add_argument("-b", "--num_bins", default=5, type=int)
    parser.add_argument("-d", "--depth", default=5, type=int)
    parser.add_argument("-c", "--base_channels", default=64, type=int)
    parser.add_argument("--ds", default=8, type=int)

    parser.add_argument("--path_to_e2v", type=str)
    parser.add_argument("--path_to_e2vflow", type=str)
    parser.add_argument("--path_to_flownet", type=str)
    parser.add_argument("--path_to_train_data", type=str)
    parser.add_argument("-s", "--len_sequence", default=10, type=int)
    parser.add_argument("--no_shuffle", dest="shuffle", action="store_false")
    parser.set_defaults(shuffle=True)
    parser.add_argument("--epochs", default=1, type=int)
    parser.add_argument("--flow_epoch", default=20, type=int)
    parser.add_argument("--rec_epoch", default=5, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--is_SummaryWriter", action="store_true")
    parser.add_argument("--load_epoch_for_train", default=0, type=int)
    parser.add_argument("--load_lr", default=1e-4, type=float)
    parser.add_argument("--train_all", action="store_true")
    parser.add_argument("--is_load_flow", action="store_true")
    parser.add_argument("--is_forward_flow", action="store_true")
    parser.add_argument("--no_warp", action="store_true")
    parser.add_argument("--is_gt_flow", action="store_true")
    parser.add_argument("--warp_mode", type=str, default="forward")
    parser.add_argument("--is_reverse_events", action="store_true")
    parser.add_argument("--is_bi", action="store_true")
    parser.add_argument("--distributed", action="store_true")

    parser.add_argument("--path_to_test_data", type=str)
    parser.add_argument("--load_epoch_for_test", default=None, type=int)
    parser.add_argument("--reader_type", default="image_reader", type=str)
    parser.add_argument("--test_data_name", default=None, type=str)
    parser.add_argument("--dataset", default="SIM", type=str)
    parser.add_argument("--time_unit", default="s", type=str)
    parser.add_argument("--test_img_num", default=50, type=int)
    parser.add_argument("--num_events", default=15000, type=int)
    parser.add_argument("--test_data_mode", default="real", type=str)
    parser.add_argument("--k_shift", default=-1, type=int)
    parser.add_argument("--n_event_skip", default=0, type=int)
    parser.add_argument("--dvs", default=None, type=str)

    parser.add_argument("-o", "--output_folder", default="test_images", type=str)
    parser.add_argument("--no_write_image", dest="is_write_image", action="store_false")
    parser.set_defaults(is_write_image=True)
    parser.add_argument("--is_write_event", action="store_true")
    parser.add_argument("--is_write_video", action="store_true")
    parser.add_argument("--is_write_flow", action="store_true")
    parser.add_argument("--is_write_emap", action="store_true")

    parser.add_argument("--display_train", action="store_true")
    parser.add_argument("--display_test", action="store_true")
    parser.add_argument("--show_events", action="store_true", default=True)
    parser.add_argument("--event_display_mode", default="grayscale", type=str)
    parser.add_argument("--num_bins_to_show", default=-1, type=int)

    # TPU extensions
    parser.add_argument("--dtype", default="float32", type=str)
    parser.add_argument("--mesh_shape", default="1", type=str)
    parser.add_argument("--mesh_axes", default="data", type=str)
    parser.add_argument("--flow_iters", default=None, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--orbax_ckpt", action="store_true")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--save_every_steps", default=0, type=int)

    # serving/kernel knobs (defaults resolved in Config, incl. env overrides;
    # passing a flag explicitly always wins)
    parser.add_argument("--encoder_merge", default=None, type=str,
                        choices=["", "pair", "trio"])
    parser.add_argument("--serve_pallas", default=None,
                        action=argparse.BooleanOptionalAction)
    parser.add_argument("--train_pallas", default=None,
                        action=argparse.BooleanOptionalAction)
    parser.add_argument("--corr_fuse_proj", default=None,
                        action=argparse.BooleanOptionalAction)
    parser.add_argument("--eraft_pair_tower", default=None,
                        action=argparse.BooleanOptionalAction)
    parser.add_argument("--eraft_tchunk", default=None, type=int)
    parser.add_argument("--flow_half", default=None,
                        action=argparse.BooleanOptionalAction)


def from_args(args: argparse.Namespace) -> Config:
    # every CLI funnels through here: switch on the persistent XLA
    # compilation cache for the process (TPU default, see compile_cache.py)
    from cista_flow_tpu import compile_cache

    compile_cache.enable()
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    # knob flags default to None on the CLI = "keep the Config default
    # (which already folded in any CISTA_* env override)"
    for knob in ("encoder_merge", "serve_pallas", "train_pallas",
                 "corr_fuse_proj", "eraft_pair_tower", "eraft_tchunk",
                 "flow_half"):
        if kw.get(knob) is None:
            kw.pop(knob, None)
    if "image_dim" in kw and kw["image_dim"] is not None:
        kw["image_dim"] = tuple(kw["image_dim"])
    return Config(**kw)


def parse_config(argv=None) -> Config:
    parser = argparse.ArgumentParser(description="cista_flow_tpu")
    add_args(parser)
    return from_args(parser.parse_args(argv))
