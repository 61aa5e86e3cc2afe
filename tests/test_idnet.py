"""IDNet parity vs the upstream torch reference at equal weights."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import idnet


class Cfg:
    image_dim = (100, 172)


@pytest.fixture(scope="module")
def ref_net():
    add_reference_to_path()
    import types

    from idn.idedeq import IDEDEQIDO

    torch.manual_seed(0)
    config = types.SimpleNamespace(update_iters=1, pred_next_flow=True,
                                   image_dim=(100, 172))
    net = IDEDEQIDO(config)
    net.eval()
    return net


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


@pytest.mark.parametrize("with_init", [False, True])
def test_idnet_forward_parity(ref_net, with_init):
    rng = np.random.default_rng(7)
    B, H, W = 1, 100, 172
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    flow_init = None
    tflow_init = None
    if with_init:
        # flow_init lives at PADDED resolution (next_flow chaining)
        fi = (rng.standard_normal((B, 128, 192, 2)) * 2).astype(np.float32)
        flow_init = jnp.asarray(fi)
        tflow_init = t(fi)

    with torch.no_grad():
        ref = ref_net(event_bins=t(ev), flow_init=tflow_init)

    params = ti.idnet_params(ti.from_torch(ref_net))
    out = idnet.apply(params, jnp.asarray(ev), Cfg(), flow_init=flow_init)

    for key in ("flow_final", "next_flow"):
        ref_v = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out[key]), ref_v,
                                   rtol=1e-3, atol=1e-3, err_msg=key)


def test_idnet_input_flowmap_no_deblur_parity():
    """Live reference branches: input_flowmap cnet seeding, deblur=False,
    add_delta=True (ref: idn/idedeq.py:157-210)."""
    add_reference_to_path()
    import types

    from idn.idedeq import IDEDEQIDO

    torch.manual_seed(1)
    config = types.SimpleNamespace(update_iters=2, pred_next_flow=True,
                                   image_dim=(100, 172), input_flowmap=True,
                                   deblur=False, add_delta=True)
    net = IDEDEQIDO(config)
    net.eval()
    assert net.cnet is not None

    rng = np.random.default_rng(9)
    B, H, W = 1, 100, 172
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    fi = (rng.standard_normal((B, 128, 192, 2)) * 2).astype(np.float32)
    with torch.no_grad():
        ref = net(event_bins=t(ev), flow_init=t(fi))

    params = ti.idnet_params(ti.from_torch(net))
    assert "cnet" in params
    out = idnet.apply(params, jnp.asarray(ev), Cfg(), flow_init=jnp.asarray(fi),
                      deblur_iters=2, input_flowmap=True, deblur=False,
                      add_delta=True)
    for key in ("flow_final", "next_flow"):
        ref_v = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out[key]), ref_v,
                                   rtol=1e-3, atol=2e-3, err_msg=key)
    # export round-trip includes cnet: strict=True into the upstream model
    sd_out = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
              for k, v in ti.idnet_export(params).items()}
    net.load_state_dict(sd_out, strict=True)

    # delta_flow history surface: init + one per iteration
    assert len(out["delta_flow"]) == 3
    ref_d = ref["delta_flow"].numpy()  # (B, iters+1, 2, H, W)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out["delta_flow"][i]),
            np.transpose(ref_d[:, i], (0, 2, 3, 1)), rtol=1e-3, atol=2e-3)


def test_idnet_multi_deblur_iters(ref_net):
    """deblur_iters=2: the cumulative deblur-warp chain must match."""
    rng = np.random.default_rng(8)
    B, H, W = 1, 100, 172
    ev = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    with torch.no_grad():
        ref = ref_net(event_bins=t(ev), deblur_iters=2)
    params = ti.idnet_params(ti.from_torch(ref_net))
    out = idnet.apply(params, jnp.asarray(ev), Cfg(), deblur_iters=2)
    for key in ("flow_final", "next_flow"):
        ref_v = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out[key]), ref_v,
                                   rtol=1e-3, atol=2e-3, err_msg=key)
