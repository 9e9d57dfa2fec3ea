import jax
import jax.numpy as jnp
import numpy as np

from cvpr22_cross_modal_pseudo_labeling_tpu.models.resnet import ResNet


def test_resnet_with_dcn_stage():
    model = ResNet(
        stages=(1, 1),
        return_stages=("C3",),
        stem_out_channels=8,
        res2_out_channels=16,
        stage_with_dcn=(False, True),
        with_modulated_dcn=True,
    )
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["C3"]
    assert out.shape == (1, 4, 4, 32)
    # offset conv exists in the DCN stage and is zero-initialized
    p = params["params"]["layer2"]["block0"]
    assert "conv2_offset" in p
    np.testing.assert_allclose(
        np.asarray(p["conv2_offset"]["kernel"]), 0.0
    )
    assert "conv2_kernel" in p


def test_resnext_dcn_grouped():
    """ResNeXt (num_groups > 1) + DCN: the grouped deformable kernel
    [3,3,Cin/g,Cout] must contract group-blockwise (reference DFConv2d
    groups=num_groups, resnet.py:290-300)."""
    model = ResNet(
        stages=(1, 1),
        return_stages=("C3",),
        stem_out_channels=8,
        res2_out_channels=16,
        num_groups=2,
        width_per_group=8,
        stage_with_dcn=(False, True),
    )
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["C3"]
    assert out.shape == (1, 4, 4, 32)
    k = params["params"]["layer2"]["block0"]["conv2_kernel"]
    # grouped kernel holds Cin/g input channels
    assert k.shape[2] * 2 == k.shape[3]
    assert bool(jnp.isfinite(out).all())


def test_dcn_with_dilation():
    """Dilated DCN stage: the offset conv must be dilated like the main
    conv or the offset grid's spatial shape disagrees (misc.py:158)."""
    model = ResNet(
        stages=(1, 1),
        return_stages=("C3",),
        stem_out_channels=8,
        res2_out_channels=16,
        stage_with_dcn=(False, True),
        res5_dilation=2,
    )
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["C3"]
    assert bool(jnp.isfinite(out).all())
