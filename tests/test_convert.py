"""Checkpoint converter round-trip tests: our params -> torch-layout state
dict -> back must be exact, and a converted tree must produce identical
model outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import Pi0Config, model as pi0
from intact_tpu.models.pi0.convert import from_torch_state_dict, to_torch_state_dict

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


class TestConvertRoundtrip:
    def test_roundtrip_exact(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        sd = to_torch_state_dict(params, cfg)
        # torch layout sanity: Linear weights are [out, in]
        assert sd["model.state_proj.weight"].shape == (cfg.proj_width, cfg.max_state_dim)
        assert sd[
            "model.paligemma_with_expert.paligemma.vision_tower.vision_model"
            ".embeddings.patch_embedding.weight"
        ].shape == (cfg.vision.width, 3, cfg.vision.patch_size, cfg.vision.patch_size)

        back = from_torch_state_dict(sd, cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
            )

    def test_converted_params_same_outputs(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        back = from_torch_state_dict(to_torch_state_dict(params, cfg), cfg)
        back = jax.tree.map(jnp.asarray, back)

        ks = jax.random.split(jax.random.key(1), 4)
        s = cfg.vision.image_size
        args = dict(
            images=jax.random.uniform(ks[0], (1, 1, s, s, 3), minval=-1, maxval=1),
            img_masks=jnp.ones((1, 1), bool),
            lang_tokens=jax.random.randint(ks[1], (1, cfg.tokenizer_max_length), 0, 255),
            lang_masks=jnp.ones((1, cfg.tokenizer_max_length), bool),
            state=jax.random.normal(ks[2], (1, cfg.max_state_dim)),
        )
        a = pi0.sample_actions(params, jax.random.key(5), **args, cfg=cfg, policy=FP32)
        b = pi0.sample_actions(back, jax.random.key(5), **args, cfg=cfg, policy=FP32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
