"""Torch-parity tests for the foundation ops.

Every grid_sample / interpolate / pooling / padding convention the reference
uses is pinned here against torch CPU with random inputs.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cista_flow_tpu import ops

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((9, 13), (18, 26)), ((12, 16), (6, 8)), ((90, 120), (180, 240)), ((7, 7), (15, 10))],
)
def test_resize_bilinear(align, in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ref = F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((9, 13), (18, 26)),      # x2 phase-lerp fast path
     ((9, 13), (14, 20))],     # interpolation-matrix path
)
def test_resize_bilinear_reflect_pad(in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    want = jnp.pad(
        ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=False),
        ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=False,
                              reflect_pad=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
def test_grid_sample(align, padding_mode):
    x = RNG.standard_normal((2, 11, 17, 4), dtype=np.float32)
    # grids both inside and far outside [-1, 1]
    grid = (RNG.standard_normal((2, 9, 14, 2)) * 1.5).astype(np.float32)
    ref = F.grid_sample(
        nchw(x),
        torch.from_numpy(grid),
        mode="bilinear",
        align_corners=align,
        padding_mode=padding_mode,
    )
    got = ops.grid_sample(
        jnp.asarray(x), jnp.asarray(grid), align_corners=align, padding_mode=padding_mode
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_grid_sample_randomized_sweep():
    """Randomized shapes x modes x grid scales vs torch — catches fold/clamp
    geometry edge cases the fixed-size test can miss (1-pixel dims, grids far
    outside [-1, 1], exactly-on-edge coords)."""
    rng = np.random.default_rng(123)
    for case in range(24):
        B = int(rng.integers(1, 3))
        H = int(rng.integers(1, 13))
        W = int(rng.integers(1, 13))
        C = int(rng.integers(1, 5))
        Hg = int(rng.integers(1, 9))
        Wg = int(rng.integers(1, 9))
        align = bool(rng.integers(0, 2))
        pad = ["zeros", "border", "reflection"][int(rng.integers(0, 3))]
        scale = [0.5, 1.0, 3.0][case % 3]
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        grid = (rng.standard_normal((B, Hg, Wg, 2)) * scale).astype(np.float32)
        # sprinkle exactly-on-edge and integer-coordinate samples
        grid.flat[:: max(grid.size // 7, 1)] = 1.0
        grid.flat[1:: max(grid.size // 5, 1)] = -1.0
        ref = F.grid_sample(nchw(x), torch.from_numpy(grid), mode="bilinear",
                            align_corners=align, padding_mode=pad)
        got = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid),
                              align_corners=align, padding_mode=pad)
        np.testing.assert_allclose(
            np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"case={case} B{B} H{H} W{W} C{C} g{Hg}x{Wg} "
                    f"align={align} pad={pad} scale={scale}")


@pytest.mark.parametrize("mode", ["forward", "backward"])
def test_frame_warp_matches_reference(mode):
    """Pin the reference's peculiar 2*(x/W - 0.5) normalization."""
    import sys
    from conftest import add_reference_to_path

    add_reference_to_path()
    from utils.flow_utils import FrameWarp  # reference torch code

    H, W = 20, 30
    img = RNG.standard_normal((2, H, W, 1), dtype=np.float32)
    flow = (RNG.standard_normal((2, H, W, 2)) * 3).astype(np.float32)

    ref_warp = FrameWarp(mode=mode)
    ref = ref_warp.warp_frame(nchw(img), nchw(flow))
    got = ops.frame_warp(jnp.asarray(img), jnp.asarray(flow), mode=mode)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_bilinear_sampler_matches_reference():
    from conftest import add_reference_to_path

    add_reference_to_path()
    from DCEIFlow.utils.sample_utils import bilinear_sampler as ref_sampler

    x = RNG.standard_normal((3, 12, 12, 8), dtype=np.float32)
    coords = (RNG.random((3, 5, 6, 2)) * 14 - 1).astype(np.float32)  # some OOB
    ref = ref_sampler(nchw(x), torch.from_numpy(coords))
    got = ops.bilinear_sampler(jnp.asarray(x), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_avg_pool2():
    for hw in [(8, 8), (9, 13)]:
        x = RNG.standard_normal((2, *hw, 5), dtype=np.float32)
        ref = F.avg_pool2d(nchw(x), 2, stride=2)
        got = ops.avg_pool2(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stride,pad,mode", [(1, 1, "reflect"), (2, 1, "reflect"), (1, 3, "zeros"), (2, 3, "zeros")])
def test_conv2d(stride, pad, mode):
    x = RNG.standard_normal((2, 16, 20, 6), dtype=np.float32)
    k = 7 if pad == 3 else 3
    w = RNG.standard_normal((5, 6, k, k), dtype=np.float32) * 0.1  # OIHW
    b = RNG.standard_normal(5, dtype=np.float32)

    conv = torch.nn.Conv2d(6, 5, k, stride=stride, padding=pad,
                           padding_mode="reflect" if mode == "reflect" else "zeros")
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    ref = conv(nchw(x))

    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    got = ops.conv2d(jnp.asarray(x), w_hwio, jnp.asarray(b), stride=stride,
                     padding=pad, padding_mode=mode)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_conv2d_rect_kernel():
    """(1,5)/(5,1) separable GRU convs (ref: with_event_updater.py:38-50)."""
    x = RNG.standard_normal((1, 10, 12, 4), dtype=np.float32)
    w = RNG.standard_normal((3, 4, 1, 5), dtype=np.float32) * 0.2
    conv = torch.nn.Conv2d(4, 3, (1, 5), padding=(0, 2))
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.zero_()
    ref = conv(nchw(x))
    got = ops.conv2d(jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                     None, padding=(0, 2))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_image_padder():
    from conftest import add_reference_to_path

    add_reference_to_path()
    from utils.image_process import ImagePadder as RefPadder

    x = RNG.standard_normal((2, 180, 240, 5), dtype=np.float32)
    ref_p = RefPadder(image_dim=(180, 240), min_size=32)
    ref = ref_p.pad(nchw(x))
    padder = ops.ImagePadder((180, 240), min_size=32)
    got = padder.pad(jnp.asarray(x))
    assert got.shape == (2, 192, 256, 5)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref))
    back = padder.unpad(got)
    np.testing.assert_allclose(np.asarray(back), x)


def test_batch_norm_eval_and_train():
    x = RNG.standard_normal((4, 6, 6, 8), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(8) + 0.5)
        bn.bias.copy_(torch.rand(8) - 0.5)
        bn.running_mean.copy_(torch.randn(8) * 0.1)
        bn.running_var.copy_(torch.rand(8) + 0.5)
    # np.array copies matter: jax may zero-copy-alias numpy views on CPU and
    # torch mutates running stats in place during train-mode forward.
    p = {"scale": jnp.asarray(np.array(bn.weight.detach())),
         "bias": jnp.asarray(np.array(bn.bias.detach()))}
    st = {"mean": jnp.asarray(np.array(bn.running_mean)),
          "var": jnp.asarray(np.array(bn.running_var))}

    bn.eval()
    ref = bn(nchw(x))
    got, _ = ops.batch_norm(p, st, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)

    bn.train()
    ref = bn(nchw(x))
    got, new_st = ops.batch_norm(p, st, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_st["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_st["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_instance_norm():
    x = RNG.standard_normal((3, 7, 9, 6), dtype=np.float32)
    ref = torch.nn.InstanceNorm2d(6)(nchw(x))
    got = ops.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_convex_upsample_matches_torch_unfold():
    """Replicates ERAFT.upsample_flow exactly (ref: ERAFT/eraft.py:77-88)."""
    B, H, W, r = 2, 5, 7, 8
    flow = RNG.standard_normal((B, H, W, 2), dtype=np.float32)
    mask = RNG.standard_normal((B, H, W, 9 * r * r), dtype=np.float32)

    # torch reference computation
    tflow, tmask = nchw(flow), nchw(mask)
    m = tmask.view(B, 1, 9, r, r, H, W)
    m = torch.softmax(m, dim=2)
    up = F.unfold(r * tflow, [3, 3], padding=1).view(B, 2, 9, 1, 1, H, W)
    up = torch.sum(m * up, dim=2).permute(0, 1, 4, 2, 5, 3).reshape(B, 2, r * H, r * W)

    got = ops.convex_upsample(jnp.asarray(flow), jnp.asarray(mask), factor=r)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(up), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [((2, 8, 10, 16), 32), ((1, 2, 2, 8), 8),
                                        ((2, 5, 3, 4), 6), ((1, 3, 2, 7), 5),
                                        ((2, 24, 32, 12), 16)])
def test_conv_reflect_edge_matches_padded(shape, cout):
    """The zero-pad + border-strip formulation of a reflect-padded SAME 3x3
    conv must match pad-then-conv exactly (incl. H/W == 2 and corners)."""
    from cista_flow_tpu.ops import conv as C

    rng = np.random.default_rng(hash((shape, cout)) % 2**31)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    fast = C._conv_reflect_edge(x, w, b)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    ref = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=C.DIMS) + b
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
