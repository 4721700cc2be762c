"""ConvNeXt parity vs transformers (random tiny weights through
models/convnext.from_hf_state_dict) — pins the depthwise-conv layout,
layer-scale residuals, stage downsampling, and pooled-output conventions
Magma-8B's vision tower conversion depends on."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models import convnext as cnx  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
CFG = cnx.tiny_test_config()


@pytest.fixture(scope="module")
def hf_convnext():
    from transformers import ConvNextConfig, ConvNextModel

    cfg = ConvNextConfig(
        num_channels=3, patch_size=CFG.patch_size,
        num_stages=len(CFG.depths), depths=list(CFG.depths),
        hidden_sizes=list(CFG.dims), hidden_act="gelu",
        layer_norm_eps=CFG.norm_eps, layer_scale_init_value=CFG.layer_scale_init,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    return ConvNextModel(cfg).eval().float()


def test_features_and_pooled_parity(hf_convnext):
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf_convnext.state_dict().items()}
    params = cnx.from_hf_state_dict(sd, CFG, prefix="")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf_convnext(torch.tensor(img.transpose(0, 3, 1, 2)))
        ref_feat = out.last_hidden_state.numpy().transpose(0, 2, 3, 1)  # NCHW->NHWC
        ref_pool = out.pooler_output.numpy()

    feat, pooled = cnx.encode(params, jnp.asarray(img), CFG, FP32)
    np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pool, rtol=2e-4, atol=2e-5)


def test_own_init_runs():
    import jax

    params = cnx.init(jax.random.key(0), CFG)
    feat, pooled = cnx.encode(
        params, jnp.zeros((1, 32, 32, 3), jnp.float32), CFG, FP32
    )
    assert feat.shape == (1, 4, 4, CFG.dims[-1])
    assert pooled.shape == (1, CFG.dims[-1])
