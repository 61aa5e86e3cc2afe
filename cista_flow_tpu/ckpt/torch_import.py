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
    """Load a checkpoint into a {key: np.ndarray} dict.

    ``.npz`` files (torch-free; e.g. the committed quality-gate anchor in
    ``gate/``) hold the same reference-layout key set as a ``.pth.tar``
    state_dict; reduced-precision (f16/bf16) archives are upcast to f32 —
    the compute path re-casts to its serving dtype.
    """
    if path.endswith(".npz"):
        z = np.load(path)
        out = {}
        for k in z.files:
            v = z[k]
            key = k[7:] if k.startswith("module.") else k
            out[key] = v.astype(np.float32) if v.dtype == np.float16 else v
        return out
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
# RAFT-family encoders / update blocks
# ---------------------------------------------------------------------------

def _residual_block(sd, prefix, norm_fn):
    p, s = {}, {}
    p["conv1"] = _conv(sd, prefix + ".conv1")
    p["conv2"] = _conv(sd, prefix + ".conv2")
    for i in (1, 2):
        if norm_fn == "batch":
            p[f"norm{i}"], s[f"norm{i}"] = _bn(sd, f"{prefix}.norm{i}")
        else:
            p[f"norm{i}"], s[f"norm{i}"] = {}, {}
    if prefix + ".downsample.0.weight" in sd:
        p["down"] = _conv(sd, prefix + ".downsample.0")
        if norm_fn == "batch":
            p["norm3"], s["norm3"] = _bn(sd, prefix + ".downsample.1")
        else:
            p["norm3"], s["norm3"] = {}, {}
    return p, s


def basic_encoder_params(sd: dict, prefix: str, norm_fn: str):
    """Map BasicEncoder keys (ref: raft_encoder.py:125-177 / ERAFT/extractor.py)."""
    g = lambda k: f"{prefix}.{k}" if prefix else k
    p, s = {}, {}
    p["conv1"] = _conv(sd, g("conv1"))
    if norm_fn == "batch":
        p["norm1"], s["norm1"] = _bn(sd, g("norm1"))
    else:
        p["norm1"], s["norm1"] = {}, {}
    for i in (1, 2, 3):
        for j, suf in ((0, "a"), (1, "b")):
            p[f"layer{i}{suf}"], s[f"layer{i}{suf}"] = _residual_block(
                sd, g(f"layer{i}.{j}"), norm_fn)
    p["conv2"] = _conv(sd, g("conv2"))
    return p, s


def _seq_mask(sd, prefix):
    """nn.Sequential(conv3x3, relu, conv1x1) mask heads."""
    return {"conv1": _conv(sd, prefix + ".0"), "conv2": _conv(sd, prefix + ".2")}


def _flow_head(sd, prefix):
    return {"conv1": _conv(sd, prefix + ".conv1"), "conv2": _conv(sd, prefix + ".conv2")}


def _sep_gru(sd, prefix):
    return {k: _conv(sd, f"{prefix}.{k}") for k in
            ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2")}


def _gru(sd, prefix):
    return {k: _conv(sd, f"{prefix}.{k}") for k in ("convz", "convr", "convq")}


def eraft_params(sd: dict, prefix: str = ""):
    """Full E-RAFT (ref: ERAFT/eraft.py:37-61). Returns (params, bn_state)."""
    g = lambda k: f"{prefix}{k}"
    p, s = {}, {}
    p["fnet"], s["fnet"] = basic_encoder_params(sd, g("fnet"), "instance")
    p["cnet"], s["cnet"] = basic_encoder_params(sd, g("cnet"), "batch")
    enc = g("update_block.encoder")
    p["update"] = {
        "encoder": {k: _conv(sd, f"{enc}.{k}") for k in
                    ("convc1", "convc2", "convf1", "convf2", "conv")},
        "gru": _sep_gru(sd, g("update_block.gru")),
        "flow_head": _flow_head(sd, g("update_block.flow_head")),
        "mask": _seq_mask(sd, g("update_block.mask")),
    }
    return p, s


def raft_params(sd: dict, prefix: str = ""):
    """Vanilla RAFT (ref: DCEIFlow/RAFT.py:53-57) — identical torch module
    layout to E-RAFT (fnet/cnet/update_block.{encoder,gru,flow_head,mask})."""
    return eraft_params(sd, prefix)


def dceiflow_params(sd: dict, prefix: str = ""):
    """Full DCEIFlow (ref: DCEIFlow/DCEIFlow.py:49-88). Returns (params, bn_state)."""
    g = lambda k: f"{prefix}{k}"
    p, s = {}, {}
    p["fnet"], s["fnet"] = basic_encoder_params(sd, g("fnet"), "instance")
    p["enet"], s["enet"] = basic_encoder_params(sd, g("enet"), "instance")
    p["cnet"], s["cnet"] = basic_encoder_params(sd, g("cnet"), "batch")
    p["fusion"] = {k: _conv(sd, g(f"fusion.{k}")) for k in ("conv1", "conv2", "convo")}
    enc = g("update_block.encoder")
    p["update"] = {
        "encoder": {k: _conv(sd, f"{enc}.{k}") for k in
                    ("convc1", "convc2", "conve1", "conve2", "convf1", "convf2", "conv")},
        "gru": _sep_gru(sd, g("update_block.gru")),
        "flow_head": _flow_head(sd, g("update_block.flow_head")),
    }
    return p, s


def idnet_params(sd: dict, prefix: str = "", num_outputs: int = 2):
    """IDNet IDEDEQIDO (ref: idn/idedeq.py:13-47)."""
    g = lambda k: f"{prefix}{k}"
    p = {"fnet": {"conv1": _conv(sd, g("fnet.conv1"))}}
    for i in (1, 2):
        for j, suf in ((0, "a"), (1, "b")):
            p["fnet"][f"layer{i}{suf}"], _ = _residual_block(
                sd, g(f"fnet.layer{i}.{j}"), "none")
    u = g("update_net")
    p["update"] = {
        "gru": _gru(sd, f"{u}.gru"),
        "flow_head": _flow_head(sd, f"{u}.flow_head"),
        "mask": _seq_mask(sd, f"{u}.mask"),
    }
    if num_outputs == 2:
        p["update"]["flow_head2"] = _flow_head(sd, f"{u}.flow_head2")
        p["update"]["mask2"] = _seq_mask(sd, f"{u}.mask2")
    if any(k.startswith(g("cnet.")) for k in sd):
        # input_flowmap mode: context LiteEncoder over the running flow map
        # (ref: idn/idedeq.py:42-46)
        p["cnet"] = {"conv1": _conv(sd, g("cnet.conv1"))}
        for i in (1, 2):
            for j, suf in ((0, "a"), (1, "b")):
                p["cnet"][f"layer{i}{suf}"], _ = _residual_block(
                    sd, g(f"cnet.layer{i}.{j}"), "none")
    return p


# ---------------------------------------------------------------------------
# Composite CISTA-Flow checkpoints ('cista_net.' + 'event_flownet.' prefixes,
# ref: e2v/e2v_model.py:102-133 module names)
# ---------------------------------------------------------------------------

def composite_params(sd: dict, model_mode: str):
    """Full CISTA-Flow checkpoint -> ({'cista', 'flow'}, model_state)."""
    params = {"cista": cista_lstc_params(sd, prefix="cista_net.")}
    model_state = {"flow": {}}
    if model_mode == "cista-eiflow":
        params["flow"], model_state["flow"] = dceiflow_params(sd, "event_flownet.")
    elif model_mode == "cista-eraft":
        params["flow"], model_state["flow"] = eraft_params(sd, "event_flownet.")
    elif model_mode == "cista-idnet":
        params["flow"] = idnet_params(sd, "event_flownet.")
    else:
        params["flow"] = {}
    return params, model_state


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


def _put_conv(out, prefix, p):
    out[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"])


def _put_bn(out, prefix, p, s):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])
    out[prefix + ".running_mean"] = np.asarray(s["mean"])
    out[prefix + ".running_var"] = np.asarray(s["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _export_residual_block(out, prefix, p, s, norm_fn):
    _put_conv(out, prefix + ".conv1", p["conv1"])
    _put_conv(out, prefix + ".conv2", p["conv2"])
    if norm_fn == "batch":
        _put_bn(out, prefix + ".norm1", p["norm1"], s["norm1"])
        _put_bn(out, prefix + ".norm2", p["norm2"], s["norm2"])
    if "down" in p:
        _put_conv(out, prefix + ".downsample.0", p["down"])
        if norm_fn == "batch":
            # torch registers norm3 twice: as an attribute AND inside the
            # downsample Sequential (same tensors) — emit both key sets
            _put_bn(out, prefix + ".downsample.1", p["norm3"], s["norm3"])
            _put_bn(out, prefix + ".norm3", p["norm3"], s["norm3"])


def basic_encoder_export(p, s, prefix, norm_fn) -> dict:
    out = {}
    _put_conv(out, prefix + ".conv1", p["conv1"])
    if norm_fn == "batch":
        _put_bn(out, prefix + ".norm1", p["norm1"], s["norm1"])
    for i in (1, 2, 3):
        for j, suf in ((0, "a"), (1, "b")):
            _export_residual_block(out, f"{prefix}.layer{i}.{j}",
                                   p[f"layer{i}{suf}"],
                                   s.get(f"layer{i}{suf}", {}), norm_fn)
    _put_conv(out, prefix + ".conv2", p["conv2"])
    return out


def _export_named_convs(out, prefix, p, names):
    for n in names:
        _put_conv(out, f"{prefix}.{n}", p[n])


def _export_flow_head(out, prefix, p):
    _put_conv(out, prefix + ".conv1", p["conv1"])
    _put_conv(out, prefix + ".conv2", p["conv2"])


def _export_seq_mask(out, prefix, p):
    _put_conv(out, prefix + ".0", p["conv1"])
    _put_conv(out, prefix + ".2", p["conv2"])


def eraft_export(p, s, prefix="") -> dict:
    out = {}
    out.update(basic_encoder_export(p["fnet"], s["fnet"], prefix + "fnet", "instance"))
    out.update(basic_encoder_export(p["cnet"], s["cnet"], prefix + "cnet", "batch"))
    u = prefix + "update_block"
    _export_named_convs(out, f"{u}.encoder", p["update"]["encoder"],
                        ("convc1", "convc2", "convf1", "convf2", "conv"))
    _export_named_convs(out, f"{u}.gru", p["update"]["gru"],
                        ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"))
    _export_flow_head(out, f"{u}.flow_head", p["update"]["flow_head"])
    _export_seq_mask(out, f"{u}.mask", p["update"]["mask"])
    return out


def raft_export(p, s, prefix="") -> dict:
    """Vanilla RAFT export — same torch layout as E-RAFT."""
    return eraft_export(p, s, prefix)


def dceiflow_export(p, s, prefix="") -> dict:
    out = {}
    out.update(basic_encoder_export(p["fnet"], s["fnet"], prefix + "fnet", "instance"))
    out.update(basic_encoder_export(p["enet"], s["enet"], prefix + "enet", "instance"))
    out.update(basic_encoder_export(p["cnet"], s["cnet"], prefix + "cnet", "batch"))
    _export_named_convs(out, prefix + "fusion", p["fusion"],
                        ("conv1", "conv2", "convo"))
    u = prefix + "update_block"
    _export_named_convs(out, f"{u}.encoder", p["update"]["encoder"],
                        ("convc1", "convc2", "conve1", "conve2",
                         "convf1", "convf2", "conv"))
    _export_named_convs(out, f"{u}.gru", p["update"]["gru"],
                        ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"))
    _export_flow_head(out, f"{u}.flow_head", p["update"]["flow_head"])
    return out


def idnet_export(p, prefix="") -> dict:
    out = {}
    _put_conv(out, prefix + "fnet.conv1", p["fnet"]["conv1"])
    for i in (1, 2):
        for j, suf in ((0, "a"), (1, "b")):
            _export_residual_block(out, f"{prefix}fnet.layer{i}.{j}",
                                   p["fnet"][f"layer{i}{suf}"], {}, "none")
    u = prefix + "update_net"
    _export_named_convs(out, f"{u}.gru", p["update"]["gru"],
                        ("convz", "convr", "convq"))
    _export_flow_head(out, f"{u}.flow_head", p["update"]["flow_head"])
    _export_seq_mask(out, f"{u}.mask", p["update"]["mask"])
    if "flow_head2" in p["update"]:
        _export_flow_head(out, f"{u}.flow_head2", p["update"]["flow_head2"])
        _export_seq_mask(out, f"{u}.mask2", p["update"]["mask2"])
    if "cnet" in p:  # input_flowmap mode (ref: idn/idedeq.py:42-46)
        _put_conv(out, prefix + "cnet.conv1", p["cnet"]["conv1"])
        for i in (1, 2):
            for j, suf in ((0, "a"), (1, "b")):
                _export_residual_block(out, f"{prefix}cnet.layer{i}.{j}",
                                       p["cnet"][f"layer{i}{suf}"], {}, "none")
    return out


def composite_export(params, model_state, model_mode: str, depth: int = 5) -> dict:
    """Full CISTA-Flow -> reference-compatible state_dict (cista_net.* +
    event_flownet.* keys), loadable by the upstream torch code."""
    out = {f"cista_net.{k}": v
           for k, v in cista_lstc_export(params["cista"], depth).items()}
    flow_state = model_state.get("flow", {})
    if model_mode == "cista-eiflow":
        out.update(dceiflow_export(params["flow"], flow_state, "event_flownet."))
    elif model_mode == "cista-eraft":
        out.update(eraft_export(params["flow"], flow_state, "event_flownet."))
    elif model_mode == "cista-idnet":
        out.update(idnet_export(params["flow"], "event_flownet."))
    return out


def save_torch_checkpoint(path: str, params, model_state, model_mode: str,
                          epoch: int, depth: int = 5):
    """Write the reference's ``{'epoch', 'state_dict'}`` .pth.tar layout
    (ref: train.py:137-140)."""
    import torch

    sd = composite_export(params, model_state, model_mode, depth)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    torch.save({"epoch": epoch, "state_dict": sd}, path)


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
