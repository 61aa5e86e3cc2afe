"""E-RAFT parity vs the upstream torch reference at equal weights."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path
from cista_flow_tpu.ckpt import torch_import as ti
from cista_flow_tpu.models import eraft


class Cfg:
    # Large enough that the coarsest corr-pyramid level is > 1x1 (at 1x1 the
    # reference's grid normalization divides by zero); odd-ish to exercise
    # the left/top padding (pads to 128x192).
    num_bins = 5
    image_dim = (100, 172)


@pytest.fixture(scope="module")
def ref_net():
    add_reference_to_path()
    from ERAFT.eraft import ERAFT

    torch.manual_seed(0)
    cfg = Cfg()
    net = ERAFT(cfg)
    net.eval()
    return net


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def test_eraft_forward_parity(ref_net):
    rng = np.random.default_rng(3)
    B, H, W = 1, 100, 172
    v1 = rng.standard_normal((B, H, W, 5), dtype=np.float32)
    v2 = rng.standard_normal((B, H, W, 5), dtype=np.float32)

    with torch.no_grad():
        ref = ref_net(t(v1), t(v2), iters=4)

    params, state = ti.eraft_params(ti.from_torch(ref_net))
    out, _ = eraft.apply(params, state, jnp.asarray(v1), jnp.asarray(v2),
                         Cfg(), iters=4)

    ref_final = np.transpose(ref["flow_final"].numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out["flow_final"]), ref_final, rtol=1e-3, atol=1e-3)

    # every intermediate (padded) prediction
    for i in range(4):
        ref_i = np.transpose(ref["flow_preds"][i].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(out["flow_preds"][i]), ref_i, rtol=1e-3, atol=1e-3,
            err_msg=f"iter {i}")
