"""Space-to-depth conv reformulations (ops/s2d.py) vs the plain conv path.

The s2d block convs must be exact (up to float summation order) against
reflect-padded stride-1 / stride-2 convs, including at the borders where
the edge-replicate block pad stands in for the original-domain reflect.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cista_flow_tpu.ops import conv as C
from cista_flow_tpu.ops import s2d


def _rand(rng, shape, scale=0.3):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


def test_space_to_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = _rand(rng, (2, 8, 10, 3))
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space(s2d.space_to_depth(x))), np.asarray(x))


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 20, 24, 6), 6, 16),    # CISTA head shape class
    ((1, 10, 12, 3), 3, 8),     # tiny, odd-ish content
])
def test_conv3x3_s2d_matches_reflect_conv(shape, cin, cout):
    rng = np.random.default_rng(1)
    x = _rand(rng, shape)
    w = _rand(rng, (3, 3, cin, cout))
    b = _rand(rng, (cout,))
    ref = C.conv2d(x, w, b, stride=1, padding=1, padding_mode="reflect")
    got = s2d.depth_to_space(
        s2d.conv3x3_reflect_s2d(s2d.space_to_depth(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_conv3x3s2_s2d_to_plain_matches_strided_conv():
    rng = np.random.default_rng(2)
    x = _rand(rng, (2, 20, 24, 16))
    w = _rand(rng, (3, 3, 16, 32))
    b = _rand(rng, (32,))
    ref = C.conv2d(x, w, b, stride=2, padding=1, padding_mode="reflect")
    got = s2d.conv3x3s2_reflect_s2d_to_plain(s2d.space_to_depth(x), w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_s2d_path_differentiable():
    rng = np.random.default_rng(3)
    x = _rand(rng, (1, 8, 8, 6))
    w = _rand(rng, (3, 3, 6, 8))

    def f(w):
        y = s2d.conv3x3_reflect_s2d(s2d.space_to_depth(x), w, None)
        return jnp.sum(y ** 2)

    g = jax.grad(f)(w)
    assert g.shape == w.shape and bool(jnp.all(jnp.isfinite(g)))


def test_cista_s2d_gate_matches_plain_path():
    """The model-level gate: force-enable the s2d branch on CPU f32 by
    monkeypatching the guards, and pin it against the default branch."""
    from cista_flow_tpu.models import cista_lstc
    from cista_flow_tpu.configs import Config

    cfg = Config(model_mode="cista-eiflow", image_dim=(16, 20))
    key = jax.random.PRNGKey(0)
    params = cista_lstc.init(key, cfg)
    rng = np.random.default_rng(4)
    ev = _rand(rng, (2, 16, 20, cfg.num_bins), 1.0)
    img = jnp.asarray(rng.uniform(size=(2, 16, 20, 1)), jnp.float32)
    state = cista_lstc.zero_state(2, (16, 20), cfg.base_channels)

    rec_ref, st_ref = cista_lstc.apply(params, ev, img, state)

    # run the s2d branch directly (same code path the bf16 TPU gate takes)
    we, wi = params["We"], params["Wi"]
    bins, half = we["w"].shape[2], we["w"].shape[3]
    kz = jnp.zeros((3, 3, bins + 1, half), we["w"].dtype)
    k_head = jnp.concatenate([
        kz.at[:, :, :bins].set(we["w"]),
        kz.at[:, :, bins:].set(wi["w"]),
    ], axis=-1)
    b_head = jnp.concatenate([we["b"], wi["b"]])
    head_in = jnp.concatenate([ev, img], axis=-1)
    hb = s2d.conv3x3_reflect_s2d(s2d.space_to_depth(head_in), k_head, b_head)
    x1_s2d = s2d.conv3x3s2_reflect_s2d_to_plain(
        hb, params["W0"]["w"], params["W0"]["b"])

    from cista_flow_tpu.nn import layers as L
    x1_ref = L.conv_layer({"w": k_head, "b": b_head}, head_in, padding=1)
    x1_ref = L.conv_layer(params["W0"], x1_ref, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(x1_s2d), np.asarray(x1_ref),
                               rtol=1e-4, atol=1e-5)
    # and the full apply is unchanged on the default path
    rec2, _ = cista_lstc.apply(params, ev, img, state)
    np.testing.assert_array_equal(np.asarray(rec_ref), np.asarray(rec2))


def test_resize_x2_reflect_s2d_matches_matrix_resize():
    from cista_flow_tpu.ops import resize
    rng = np.random.default_rng(5)
    x = _rand(rng, (2, 10, 12, 16))
    ref = resize.resize_bilinear(x, (20, 24), align_corners=False,
                                 reflect_pad=1)
    got = s2d.depth_to_space(s2d.resize_x2_reflect_s2d(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_upsample_conv_s2d_matches_upsample_conv_layer():
    from cista_flow_tpu.nn import layers as L
    rng = np.random.default_rng(6)
    x = _rand(rng, (2, 10, 12, 16))
    w = _rand(rng, (3, 3, 16, 16))
    b = _rand(rng, (16,))
    ref = L.upsample_conv_layer({"w": w, "b": b}, x, out_hw=(20, 24),
                                activation="relu")
    got = s2d.depth_to_space(jax.nn.relu(s2d.upsample_conv_s2d(x, w, b)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_encoder_pair_and_trio_match_separate_towers():
    from cista_flow_tpu.nn import encoders as E
    rng = np.random.default_rng(7)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pf, sf = E.basic_encoder_init(ks[0], 1, 256, "instance")
    pe, se = E.basic_encoder_init(ks[1], 5, 256, "instance")
    pc, sc = E.basic_encoder_init(ks[2], 1, 256, "batch")
    sc = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(rng.uniform(0.1, 0.5, v.shape),
                                  jnp.float32), sc)
    xf = _rand(rng, (2, 32, 40, 1), 1.0)
    xe = _rand(rng, (2, 32, 40, 5), 1.0)
    f_ref, _ = E.basic_encoder(pf, sf, xf, "instance", train=False)
    e_ref, _ = E.basic_encoder(pe, se, xe, "instance", train=False)
    c_ref, _ = E.basic_encoder(pc, sc, xf, "batch", train=False)
    f2, e2 = E.basic_encoder_multi([pf, pe], None, None, [xf, xe])
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e_ref),
                               rtol=1e-4, atol=1e-4)
    f3, e3, c3 = E.basic_encoder_trio(pf, pe, pc, sc, xf, xe, xf)
    np.testing.assert_allclose(np.asarray(f3), np.asarray(f_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_head_conv_with_prepacked_events_matches():
    """The cin_perm path: [s2d(events) | s2d(img)] channel layout with a
    permuted kernel equals packing the concatenated tensor."""
    rng = np.random.default_rng(8)
    bins = 5
    ev = _rand(rng, (2, 12, 16, bins), 1.0)
    img = _rand(rng, (2, 12, 16, 1), 1.0)
    w = _rand(rng, (3, 3, bins + 1, 16))
    b = _rand(rng, (16,))
    ref = s2d.conv3x3_reflect_s2d(
        s2d.space_to_depth(jnp.concatenate([ev, img], axis=-1)), w, b)
    xb = jnp.concatenate(
        [s2d.space_to_depth(ev), s2d.space_to_depth(img)], axis=-1)
    perm = ([p * (bins + 1) + c for p in range(4) for c in range(bins)]
            + [p * (bins + 1) + bins for p in range(4)])
    got = s2d.conv3x3_reflect_s2d(xb, w, b, cin_perm=perm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_half_flow_composed_matches_two_stage():
    from cista_flow_tpu.configs import Config
    from cista_flow_tpu.models import composite
    from cista_flow_tpu.ops.resize import interpolate_scale, upflow
    from cista_flow_tpu.ops.pad import ImagePadder
    cfg = Config(model_mode="cista-eiflow", image_dim=(180, 240))
    rng = np.random.default_rng(9)
    f8 = jnp.asarray(rng.standard_normal((2, 24, 32, 2)) * 3, jnp.float32)
    padder = ImagePadder(cfg.image_dim, min_size=32)
    ref = interpolate_scale(padder.unpad(upflow(f8, 8)), 0.5,
                            align_corners=True)
    got = composite._half_flow_composed(f8, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
