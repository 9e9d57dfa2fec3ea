"""Space-to-depth stem rewrite (TPU.S2D_STEM) is EXACT: the 4x4/s1
conv over the 2x2 space-to-depth input computes the same function as
the canonical 7x7/s2 stem conv (models/resnet.py:s2d_stem_kernel),
with the identical parameter tree."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.models.resnet import (
    Stem,
    s2d_stem_kernel,
    space_to_depth,
)


def _conv7(x, w7):
    return jax.lax.conv_general_dilated(
        x, w7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_s2d(x, w7):
    return jax.lax.conv_general_dilated(
        space_to_depth(x), s2d_stem_kernel(w7),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_kernel_rewrite_exact_various_shapes():
    rng = np.random.RandomState(0)
    for h, w in ((64, 64), (32, 48), (30, 42)):
        x = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
        w7 = jnp.asarray(rng.randn(7, 7, 3, 8), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(_conv7(x, w7)), np.asarray(_conv_s2d(x, w7)),
            rtol=0, atol=1e-4,
        )


def test_stem_module_same_params_same_output():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32)
    base = Stem(out_channels=16)
    s2d = Stem(out_channels=16, s2d=True)
    params = base.init(jax.random.PRNGKey(0), x)
    # identical tree: the s2d branch must accept the canonical params
    jax.tree_util.tree_map(
        lambda a, b: None,
        params, s2d.init(jax.random.PRNGKey(0), x),
    )
    np.testing.assert_allclose(
        np.asarray(base.apply(params, x)),
        np.asarray(s2d.apply(params, x)),
        rtol=0, atol=1e-4,
    )


def test_stem_s2d_falls_back_on_odd_shapes():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 63, 65, 3), jnp.float32)
    s2d = Stem(out_channels=8, s2d=True)
    params = s2d.init(jax.random.PRNGKey(0), x)
    base = Stem(out_channels=8)
    np.testing.assert_allclose(
        np.asarray(base.apply(params, x)),
        np.asarray(s2d.apply(params, x)),
        rtol=0, atol=1e-5,
    )


def test_gradient_flows_to_canonical_kernel():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    s2d = Stem(out_channels=8, s2d=True)
    params = s2d.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(s2d.apply(p, x) ** 2))(params)
    k = g["params"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 3, 8)
    assert float(jnp.abs(k).sum()) > 0
