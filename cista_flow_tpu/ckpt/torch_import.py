"""Import reference PyTorch checkpoints (.pth.tar) into our param pytrees.

Host-side I/O only (torch never appears in the compute path). Handles the
reference layouts:
* ``{'epoch': int, 'state_dict': OrderedDict}`` (ref: train.py:137-140)
* flow-net checkpoints with 'model' / 'model_state_dict' keys and optional
  'module.' DDP prefixes (ref: DCEIFlow/DCEIFlow.py:120-140)
* the duplicated weight-tied ``lista_blocks.{0..4}`` key sets collapse onto a
  single ISTA param set (ref: e2v/e2v_model.py:34-35).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_state_dict(path: str) -> dict:
    """Load a torch checkpoint into a {key: np.ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for k in ("state_dict", "model", "model_state_dict"):
            if k in ckpt:
                ckpt = ckpt[k]
                break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[7:]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def from_torch(sd: dict | object) -> dict:
    """Normalize either a torch module, a torch state_dict, or a numpy dict."""
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }


def _w(sd, key):
    """torch conv weight OIHW -> HWIO."""
    return jnp.asarray(np.transpose(sd[key], (2, 3, 1, 0)))


def _b(sd, key):
    return jnp.asarray(sd[key])


def _conv(sd, prefix):
    p = {"w": _w(sd, prefix + ".weight")}
    if prefix + ".bias" in sd:
        p["b"] = _b(sd, prefix + ".bias")
    return p


def _bn(sd, prefix):
    params = {"scale": jnp.asarray(sd[prefix + ".weight"]),
              "bias": jnp.asarray(sd[prefix + ".bias"])}
    state = {"mean": jnp.asarray(sd[prefix + ".running_mean"]),
             "var": jnp.asarray(sd[prefix + ".running_var"])}
    return params, state


# ---------------------------------------------------------------------------
# CISTA-LSTC
# ---------------------------------------------------------------------------

def cista_lstc_params(sd: dict, prefix: str = "") -> dict:
    """Map a CistaLSTCNet state_dict (keys ref: e2v/e2v_model.py:10-46)."""
    g = lambda k: prefix + k
    lam = sd[g("lista_blocks.0.Lambda")]  # (1, 2C, 1, 1)
    return {
        "We": _conv(sd, g("We.conv2d")),
        "Wi": _conv(sd, g("Wi.conv2d")),
        "W0": _conv(sd, g("W0.conv2d")),
        "P0": {
            "gates": _conv(sd, g("P0.gates")),
            "out_gates": _conv(sd, g("P0.out_gates")),
            "P0": _conv(sd, g("P0.P0")),
        },
        "ista": {
            "D": _conv(sd, g("lista_blocks.0.D.conv2d")),
            "P": _conv(sd, g("lista_blocks.0.P.conv2d")),
            "Lambda": jnp.asarray(np.transpose(lam, (0, 2, 3, 1))),
        },
        "Dg": {
            "conv": _conv(sd, g("Dg.conv.conv2d")),
            "lstm": {"gates": _conv(sd, g("Dg.recurrent_block.Gates"))},
        },
        "upsamp": _conv(sd, g("upsamp_conv.conv2d")),
        "final": _conv(sd, g("final_conv.conv2d")),
    }


def cista_lstc_export(params: dict, depth: int = 5) -> dict:
    """Export back to the reference key set (incl. duplicated tied ISTA keys)
    so checkpoints stay loadable by the upstream torch code."""
    out = {}

    def put_conv(prefix, p):
        out[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if "b" in p:
            out[prefix + ".bias"] = np.asarray(p["b"])

    put_conv("We.conv2d", params["We"])
    put_conv("Wi.conv2d", params["Wi"])
    put_conv("W0.conv2d", params["W0"])
    put_conv("P0.gates", params["P0"]["gates"])
    put_conv("P0.out_gates", params["P0"]["out_gates"])
    put_conv("P0.P0", params["P0"]["P0"])
    lam = np.transpose(np.asarray(params["ista"]["Lambda"]), (0, 3, 1, 2))
    for i in range(depth):
        put_conv(f"lista_blocks.{i}.D.conv2d", params["ista"]["D"])
        put_conv(f"lista_blocks.{i}.P.conv2d", params["ista"]["P"])
        out[f"lista_blocks.{i}.Lambda"] = lam
    put_conv("Dg.conv.conv2d", params["Dg"]["conv"])
    put_conv("Dg.recurrent_block.Gates", params["Dg"]["lstm"]["gates"])
    put_conv("upsamp_conv.conv2d", params["upsamp"])
    put_conv("final_conv.conv2d", params["final"])
    return out
