"""CISTA-LSTC building blocks (functional, NHWC).

Re-designs of the reference layers (ref: e2v/base_layers.py) as pure
init/apply pairs. All convs use reflect padding like the reference; the ISTA
blocks are WEIGHT-TIED across iterations by construction (one param set,
iterated) — the reference achieves this accidentally by registering the same
module 5x (ref: e2v/e2v_model.py:34-35), which duplicates keys in
checkpoints; our importer de-duplicates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import conv as C


def softshrink(x: jnp.ndarray, lambd: jnp.ndarray) -> jnp.ndarray:
    """ISTA proximal op: relu(x-l) - relu(-x-l) (ref: e2v/base_layers.py:11)."""
    return jax.nn.relu(x - lambd) - jax.nn.relu(-x - lambd)


_ACTS = {None: lambda x: x, "relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid,
         "tanh": jnp.tanh}


# -------------------------- ConvLayer ---------------------------------------

def conv_layer_init(key, cin, cout, k=3, bias=True, groups=1):
    return C.conv_params(key, k, k, cin, cout, bias=bias, groups=groups)


def conv_layer(p, x, stride=1, padding=1, activation=None, groups=1):
    """ConvLayer: reflect-padded conv + optional activation
    (ref: e2v/base_layers.py:137-163; norm unused by the shipped models)."""
    y = C.apply_conv(p, x, stride=stride, padding=padding,
                     padding_mode="reflect", groups=groups)
    return _ACTS[activation](y)


# -------------------------- UpsampleConvLayer -------------------------------

def upsample_conv_layer(p, x, out_hw=None, activation=None):
    """Bilinear x2 (align_corners=False) -> reflect pad (k-1)/2 -> conv
    (ref: e2v/base_layers.py:168-212).

    The reflect pad is folded into the resize's constant interpolation
    matrices (duplicated border rows), so the full-res padded tensor is
    produced by the same two MXU einsums and the conv runs VALID — no
    separate pad materialization."""
    from ..ops.resize import resize_bilinear

    _, h, w, _ = x.shape
    target = out_hw if out_hw is not None else (h * 2, w * 2)
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    y = resize_bilinear(x, target, align_corners=False, reflect_pad=pad)
    y = C.apply_conv(p, y, stride=1, padding=0)
    return _ACTS[activation](y)


# -------------------------- ConvLSTC ----------------------------------------

def conv_lstc_init(key, x_size, z_size, output_size, k=3):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gates": C.conv_params(k1, k, k, x_size + z_size, 2 * output_size),
        "out_gates": C.conv_params(k2, k, k, z_size + output_size, output_size),
        "P0": C.conv_params(k3, k, k, x_size, output_size),
    }


def conv_lstc(p, x, z, prev_state):
    """LSTC cell for sparse codes (ref: e2v/base_layers.py:38-71).

    x: (B,H,W,x_size); z: previous sparse code (B,H,W,z_size);
    prev_state: previous cell (B,H,W,output_size). Returns (output, new_cell).
    """
    pad = (p["gates"]["w"].shape[0]) // 2
    g = C.apply_conv(p["gates"], jnp.concatenate([x, z], axis=-1),
                     padding=pad, padding_mode="reflect")
    in_gate, forget_gate = jnp.split(g, 2, axis=-1)
    in_gate = jax.nn.sigmoid(in_gate)
    forget_gate = jax.nn.sigmoid(forget_gate)
    z0 = C.apply_conv(p["P0"], x, padding=pad, padding_mode="reflect")
    out_gate = jax.nn.sigmoid(
        C.apply_conv(p["out_gates"], jnp.concatenate([z0, z], axis=-1),
                     padding=pad, padding_mode="reflect")
    )
    cell = forget_gate * prev_state + in_gate * z0
    return out_gate * jnp.tanh(cell), cell


# -------------------------- ConvLSTM ----------------------------------------

def conv_lstm_init(key, input_size, hidden_size, k=3):
    return {"gates": C.conv_params(key, k, k, input_size + hidden_size,
                                   4 * hidden_size)}


def conv_lstm(p, x, state):
    """4-gate ConvLSTM (ref: e2v/base_layers.py:75-132). state = (h, c)."""
    h, c = state
    pad = p["gates"]["w"].shape[0] // 2
    g = C.apply_conv(p["gates"], jnp.concatenate([x, h], axis=-1),
                     padding=pad, padding_mode="reflect")
    in_gate, remember, out_gate, cell_gate = jnp.split(g, 4, axis=-1)
    cell = jax.nn.sigmoid(remember) * c + jax.nn.sigmoid(in_gate) * jnp.tanh(cell_gate)
    hidden = jax.nn.sigmoid(out_gate) * jnp.tanh(cell)
    return hidden, cell


# -------------------------- IstaBlock ---------------------------------------

def ista_block_init(key, base_channels, k=3):
    """D: 2C->C, P: C->2C, Lambda: (1,1,1,2C) init 0.001*U[0,1)
    (ref: e2v/base_layers.py:21-31)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "D": C.conv_params(k1, k, k, 2 * base_channels, base_channels),
        "P": C.conv_params(k2, k, k, base_channels, 2 * base_channels),
        "Lambda": 0.001 * jax.random.uniform(k3, (1, 1, 1, 2 * base_channels)),
    }


def ista_iteration(p, x1, z):
    """One tied ISTA step: z <- softshrink(P(x1 - D(z)) + z, Lambda)
    (ref: e2v/e2v_model.py:81-87)."""
    tmp = conv_layer(p["D"], z, padding=1)
    x = conv_layer(p["P"], x1 - tmp, padding=1)
    return softshrink(x + z, p["Lambda"])


# -------------------------- Variant layers ----------------------------------
# Defined-but-unused in the reference's shipped models; provided for
# capability parity (ref: e2v/base_layers.py:14-15, 230-358).

def doubletanh(x, u, lambd):
    """Alternative proximal op (ref: e2v/base_layers.py:14-15)."""
    return u * (jnp.tanh(x + lambd) + jnp.tanh(x - lambd))


def recurrent_conv_layer_init(key, cin, cout, k=3):
    """ConvLayer -> ConvLSTM (ref: e2v/base_layers.py:216-227)."""
    k1, k2 = jax.random.split(key)
    return {"conv": conv_layer_init(k1, cin, cout, k),
            "lstm": conv_lstm_init(k2, cout, cout)}


def recurrent_conv_layer(p, x, state, stride=1, padding=1, activation=None):
    y = conv_layer(p["conv"], x, stride=stride, padding=padding,
                   activation=activation)
    hidden, cell = conv_lstm(p["lstm"], y, state)
    return hidden, (hidden, cell)


def recurrent_upsample_conv_layer_init(key, cin, cout, k=3):
    """UpsampleConvLayer -> ConvLSTM (ref: e2v/base_layers.py:230-240)."""
    k1, k2 = jax.random.split(key)
    return {"conv": conv_layer_init(k1, cin, cout, k),
            "lstm": conv_lstm_init(k2, cout, cout)}


def recurrent_upsample_conv_layer(p, x, state, out_hw=None, activation=None):
    y = upsample_conv_layer(p["conv"], x, out_hw=out_hw, activation=activation)
    hidden, cell = conv_lstm(p["lstm"], y, state)
    return hidden, (hidden, cell)


def decay_gates_init(key, channels1, channels2, num_gates=3, reduction=4):
    """'get_decay_simmp' mixed max/avg-pool gating MLP
    (ref: e2v/base_layers.py:243-281, 'mix' configuration)."""
    import math as _math

    k1, k2, k3 = jax.random.split(key, 3)

    def linear(k, cin, cout):
        bound = 1.0 / _math.sqrt(cin)
        kw, kb = jax.random.split(k)
        return {"w": jax.random.uniform(kw, (cin, cout), jnp.float32, -bound, bound),
                "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)}

    return {
        "fc1": linear(k1, channels1, channels1 // reduction),
        "fc2": linear(k2, channels2 // reduction, num_gates),
        "fc3": linear(k3, channels1 + channels2, channels2 // reduction),
    }


def decay_gates(p, x, x1=None):
    """x: (B,H,W,C1); x1: optional (B,H,W,C2). Returns (B, num_gates)."""
    def lin(q, v):
        return v @ q["w"] + q["b"]

    if x1 is None:
        theta = jnp.max(x, axis=(1, 2))
        theta = jax.nn.relu(lin(p["fc1"], theta))
        return lin(p["fc2"], theta)
    t1 = jnp.max(x1, axis=(1, 2))       # local motion (max-pool)
    t2 = jnp.mean(x, axis=(1, 2))       # global firing rate (avg-pool)
    theta = jnp.concatenate([t1, t2], axis=-1)
    theta = jax.nn.relu(lin(p["fc3"], theta))
    return lin(p["fc2"], theta)


def neuron_lstc_init(key, x_size, output_size, k=3):
    """NeuronLSTC variant (ref: e2v/base_layers.py:283-321): gates produced
    by global pooled statistics instead of convs."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "P0": conv_layer_init(k1, x_size, output_size, k),
        "conv1x1": conv_layer_init(k2, x_size, 3 * output_size, 1),
        "gates": decay_gates_init(k3, x_size, 3 * output_size, 3),
    }


def neuron_lstc(p, x, prev_z0):
    x1 = conv_layer(p["conv1x1"], x, padding=0)
    g = decay_gates(p["gates"], x, x1)  # (B, 3)
    in_g, forget_g, out_g = [jax.nn.sigmoid(g[:, i])[:, None, None, None]
                             for i in range(3)]
    pad = p["P0"]["w"].shape[0] // 2
    z0 = conv_layer(p["P0"], x, padding=pad)
    z0 = forget_g * prev_z0 + in_g * z0
    return out_g * jnp.tanh(z0)
