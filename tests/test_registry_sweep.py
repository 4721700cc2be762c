"""Registry sweep: every registered *_tiny model type must init and run.

Guards the model registry against bit-rot: a family whose registry entry,
config factory, or module drifts out of sync fails HERE, not when a user
first names the type in a config. (Per-family behavior is covered by the
dedicated test modules; this is the wiring check.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import registry

TINY_TYPES = sorted(t for t in registry.available() if t.endswith("_tiny"))


def _family_batch(cfg, b=1):
    rng = np.random.default_rng(0)
    s = cfg.vision.image_size
    k = getattr(cfg, "num_cameras", 1)
    lang = rng.integers(1, 64, (b, cfg.tokenizer_max_length)).astype(np.int32)
    return {
        "images": rng.uniform(-1, 1, (b, k, s, s, 3)).astype(np.float32),
        "img_masks": np.ones((b, k), bool),
        "lang_tokens": lang,
        "lang_masks": np.ones_like(lang, bool),
        "state": rng.normal(size=(b, cfg.max_state_dim)).astype(np.float32),
        "actions": rng.normal(size=(b, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32),
    }


@pytest.mark.parametrize("mtype", TINY_TYPES)
def test_tiny_type_initializes_and_runs(mtype):
    import importlib

    entry = registry.get(mtype)
    cfg = entry["default_config"]()
    mod = importlib.import_module(entry["module"])
    params = mod.init(jax.random.key(0), cfg)
    assert jax.tree_util.tree_leaves(params), mtype

    if mtype == "magma_native_tiny":
        from intact_tpu.models.magma import model as magma
        from intact_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=cfg.image_token_id,
                            max_length=cfg.max_prompt_tokens)
        tokens, masks = magma.build_prompt(tok, ["pick up the cube"], cfg)
        ids = magma.generate(
            params,
            np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32),
            tokens, masks, cfg,
        )
        assert ids.shape[0] == 1
        return
    if mtype == "spatialvla_native_tiny":
        from intact_tpu.models.spatialvla import model as svla
        from intact_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=cfg.spatial_offset,
                            max_length=cfg.tokenizer_max_length)
        lang, mask = tok(["pick up the cube"], cfg.tokenizer_max_length)
        s = cfg.vision.image_size
        ids = svla.predict_action_tokens(
            params, np.zeros((1, s, s, 3), np.float32),
            svla.flat_depth(1, cfg), lang, mask, cfg,
        )
        assert ids.shape == (1, cfg.tokens_per_action * cfg.n_action_steps)
        return
    if mtype == "octo_tiny":
        from intact_tpu.models.octo import model as octo

        b, t = 1, cfg.history
        s = cfg.image_size
        lang = np.ones((b, cfg.max_lang_tokens), np.int32)
        chunk = octo.sample_actions(
            params, jax.random.key(1),
            jnp.zeros((b, t, s, s, 3)), jnp.ones((b, t), bool),
            jnp.asarray(lang), jnp.ones_like(lang, dtype=bool),
            jnp.zeros((b, cfg.max_state_dim)), cfg=cfg,
        )
        assert np.isfinite(np.asarray(chunk)).all()
        return

    # flow/AR families share the compute_loss(batch) surface
    batch = _family_batch(cfg)
    loss, aux = mod.compute_loss(params, jax.random.key(1), batch, cfg)
    assert np.isfinite(float(loss)), mtype
