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
