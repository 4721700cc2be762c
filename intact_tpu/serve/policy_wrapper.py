"""Policy wrappers: glue between the wire protocol, env adapters, and models.

Role parity with `src/experiments/policies/policy_wrapper.py:26-371`:
`select_action(obs) -> np.ndarray [action_step, dim]`, `reset()`,
`switch_model(path)` (hot checkpoint swap for sweeps). The TPU differences:
params reload is an Orbax restore into fresh device buffers (no gc/empty-
cache dance), and wrappers expose `select_action_batch` so the batching
server can fuse concurrent client requests into one device call.
"""

from __future__ import annotations

import numpy as np

from intact_tpu.utils.monitor import setup_logger
from intact_tpu.utils.pipeline import get_class_from_path, set_seed_everywhere


class BasePolicyWrapper:
    def __init__(self, config):
        self.config = config
        self.logger = setup_logger(True, name="policy_wrapper")
        set_seed_everywhere(config.seed, train=False)
        self.env_adapter = get_class_from_path(config.eval_cfg.env_adapter_path)(config)
        self.action_step = config.eval_cfg.action_step

    def reset(self) -> None:
        self.env_adapter.reset()

    def switch_model(self, new_model_path: str) -> None:
        raise NotImplementedError

    def select_action(self, obs: dict) -> np.ndarray:
        raise NotImplementedError


class Pi0PolicyWrapper(BasePolicyWrapper):
    """Serves intact_tpu Pi0 checkpoints (LeRobotPolicyWrapper-equivalent,
    reference policy_wrapper.py:106-157)."""

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        import importlib

        import jax

        from intact_tpu.models import registry as model_registry
        from intact_tpu.models.pi0.policy import Pi0Policy

        self.model_cfg = model_cfg or config.make_model_config()
        model_module = importlib.import_module(
            model_registry.get(config.model_type)["module"]
        )
        # multi-chip host (e.g. v5e-8): shard serving over the configured
        # mesh (default pure data-parallel) — aggregate throughput scales
        # with chips while the wire protocol stays unchanged
        mesh = None
        if jax.device_count() > 1:
            from intact_tpu.parallel import MeshConfig, make_mesh

            m = config.mesh
            mesh = make_mesh(MeshConfig(m.data, m.fsdp, m.tensor))
        self.policy = Pi0Policy(
            self.model_cfg, seed=config.seed, use_bf16=config.use_bf16,
            model_module=model_module,
            tokenizer_path=config.resolve_tokenizer_path(),
            mesh=mesh,
        )
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.policy.load(path)
            self.logger.info("loaded checkpoint %s", path)

    def reset(self) -> None:
        super().reset()
        self.policy.reset()

    def switch_model(self, new_model_path: str) -> None:
        self.policy.load(new_model_path)
        self.env_adapter.reset()

    def select_action(self, obs: dict) -> np.ndarray:
        """One client obs -> [action_step, action_dim] env actions; batched
        adapters (vectorized ManiSkill3) get [N, action_step, action_dim]."""
        inputs = self.env_adapter.preprocess(obs)
        chunk = self.policy.sample_action_chunk(inputs)  # [N, chunk, 32]
        env_dim = len(self.env_adapter.dataset_statistics["action"]["mean"])
        if hasattr(self.env_adapter, "postprocess_batch"):
            return self.env_adapter.postprocess_batch(
                chunk[:, : self.action_step, :env_dim]
            )
        return self.env_adapter.postprocess(chunk[0, : self.action_step, :env_dim])

    def select_action_batch(self, obs_list: list[dict]) -> list[np.ndarray]:
        """Fused inference for the batching server: N client obs -> N action
        chunks in ONE device call. Adapters with episode state (sticky
        gripper) are per-connection, so postprocess stays per-item."""
        inputs = [self.env_adapter.preprocess(o) for o in obs_list]
        batch = {
            "image": np.concatenate([i["image"] for i in inputs]),
            "state": np.concatenate([i["state"] for i in inputs]),
            "task": [i["task"][0] for i in inputs],
        }
        chunks = self.policy.sample_action_chunk(batch)  # [N, chunk, 32]
        env_dim = len(self.env_adapter.dataset_statistics["action"]["mean"])
        return [
            self.env_adapter.postprocess(chunks[i, : self.action_step, :env_dim])
            for i in range(len(obs_list))
        ]


class OctoPolicyWrapper(BasePolicyWrapper):
    """Serves the native-JAX Octo (reference policy_wrapper.py:305-371
    semantics: 2-frame image history deque with timestep pad mask, text task,
    diffusion-head sampling)."""

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        import functools
        import importlib
        from collections import deque

        import jax
        import jax.numpy as jnp

        from intact_tpu.models import registry as model_registry
        from intact_tpu.models.tokenizer import make_tokenizer

        self.model_cfg = model_cfg or config.make_model_config()
        cfg = self.model_cfg
        self._upstream = "upstream" in config.model_type
        self.model = importlib.import_module(
            model_registry.get(config.model_type)["module"]
        )
        self._jnp, self._jax = jnp, jax
        self.params = jax.jit(lambda k: self.model.init(k, cfg))(jax.random.key(config.seed))
        vocab = cfg.t5.vocab_size if self._upstream else cfg.vocab_size
        # upstream octo conditions on the t5-base tokenizer; canonical hub
        # name as the default asset, hash fallback only when unconfigured
        tok_path = config.resolve_tokenizer_path() or (
            "t5-base" if self._upstream else None
        )
        try:
            self.tokenizer = make_tokenizer(tok_path, cfg.max_lang_tokens, vocab_size=vocab)
        except RuntimeError:
            if tok_path != "t5-base":
                raise  # explicit asset failed -> loud (tokenizer.py policy)
            self.logger.warning(
                "t5-base tokenizer asset unavailable; falling back to the "
                "hermetic hash tokenizer (NOT t5-vocab-compatible)"
            )
            self.tokenizer = make_tokenizer("hash", cfg.max_lang_tokens, vocab_size=vocab)
        self._history = deque(maxlen=cfg.history)
        self._rng = jax.random.key(config.seed)
        self._sample = jax.jit(
            functools.partial(self.model.sample_actions, cfg=cfg)
        )
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.switch_model(path)

    def reset(self):
        super().reset()
        self._history.clear()

    def switch_model(self, new_model_path: str) -> None:
        """Orbax step dirs for own-trained checkpoints; released Octo
        snapshots (msgpack/orbax flax trees) go through the upstream
        converter (models/octo/upstream.py, reference
        policy_wrapper.py:356-371)."""
        if self._upstream:
            from intact_tpu.models.octo.upstream import load_octo_checkpoint

            self.params = load_octo_checkpoint(new_model_path, self.model_cfg)
        else:
            from intact_tpu.train import checkpoint as ckpt_lib

            self.params = ckpt_lib.restore_params(new_model_path, self.params)
        self.reset()

    def select_action(self, obs: dict) -> "np.ndarray":
        jnp, jax = self._jnp, self._jax
        cfg = self.model_cfg
        inputs = self.env_adapter.preprocess(obs)

        self._history.append(np.asarray(inputs["image"][0]))
        frames = list(self._history)
        n_pad = cfg.history - len(frames)
        images = np.stack([frames[0]] * n_pad + frames)[None]  # [1, T, H, W, 3]
        img_masks = np.array([[False] * n_pad + [True] * len(frames)])

        lang_tokens, lang_masks = self.tokenizer(inputs["task"], cfg.max_lang_tokens)
        self._rng, key = jax.random.split(self._rng)
        chunk = self._sample(
            self.params, key, jnp.asarray(images), jnp.asarray(img_masks),
            jnp.asarray(lang_tokens), jnp.asarray(lang_masks),
            jnp.asarray(inputs["state"]),
        )
        chunk = np.asarray(chunk)[0, : self.action_step]
        return self.env_adapter.postprocess(chunk)


class SpatialVLAPolicyWrapper(BasePolicyWrapper):
    """SpatialVLA-4B serving scaffold (reference policy_wrapper.py:194-223):
    requires the upstream HF model (trust_remote_code) which is not part of
    this framework — the wrapper wires the adapter + chunk-ensembling and
    fails with a clear error if the model asset is absent."""

    def __init__(self, config):
        super().__init__(config)
        path = config.eval_cfg.pretrained_model_path
        try:
            from transformers import AutoModel, AutoProcessor

            self.processor = AutoProcessor.from_pretrained(path, trust_remote_code=True)
            self.model = AutoModel.from_pretrained(path, trust_remote_code=True)
        except Exception as e:
            raise RuntimeError(
                "SpatialVLA serving needs the upstream HF checkpoint "
                f"(pretrained_model_path={path!r}); see SURVEY.md §2.5"
            ) from e
        self.unnorm_key = config.eval_cfg.unnorm_key

    def switch_model(self, new_model_path: str) -> None:
        from transformers import AutoModel

        self.model = AutoModel.from_pretrained(new_model_path, trust_remote_code=True)

    def select_action(self, obs: dict) -> "np.ndarray":
        inputs = self.env_adapter.preprocess(obs)
        hf_inputs = self.processor(
            images=inputs["image"], text=inputs["task"][0], return_tensors="pt"
        )
        out = self.model.predict_action(hf_inputs)
        actions = self.processor.decode_actions(out, unnorm_key=self.unnorm_key)
        return self.env_adapter.postprocess(np.asarray(actions)[: self.action_step])


class MagmaPolicyWrapper(BasePolicyWrapper):
    """Magma-8B serving scaffold (reference policy_wrapper.py:226-303):
    chat-template prompt -> generate -> last 7 action tokens -> 256-bin
    vocab-offset de-discretization (intact_tpu.serve.decoding) -> quantile
    unnormalization."""

    N_ACTION_TOKENS = 7

    def __init__(self, config):
        super().__init__(config)
        path = config.eval_cfg.pretrained_model_path
        try:
            from transformers import AutoModelForCausalLM, AutoProcessor

            self.processor = AutoProcessor.from_pretrained(path, trust_remote_code=True)
            self.model = AutoModelForCausalLM.from_pretrained(path, trust_remote_code=True)
        except Exception as e:
            raise RuntimeError(
                "Magma serving needs the upstream HF checkpoint "
                f"(pretrained_model_path={path!r}); see SURVEY.md §2.5"
            ) from e

    def switch_model(self, new_model_path: str) -> None:
        from transformers import AutoModelForCausalLM

        self.model = AutoModelForCausalLM.from_pretrained(
            new_model_path, trust_remote_code=True
        )

    def select_action(self, obs: dict) -> "np.ndarray":
        from intact_tpu.serve.decoding import (
            denormalize_with_quantiles,
            tokens_to_actions,
        )

        inputs = self.env_adapter.preprocess(obs)
        convo = [{"role": "user", "content": f"<image>\nWhat action should the robot take to {inputs['task'][0]}?"}]
        prompt = self.processor.tokenizer.apply_chat_template(
            convo, tokenize=False, add_generation_prompt=True
        )
        hf_inputs = self.processor(images=inputs["image"], texts=prompt, return_tensors="pt")
        output_ids = self.model.generate(**hf_inputs, max_new_tokens=1000, use_cache=False)
        action_ids = np.asarray(output_ids)[0, -(self.N_ACTION_TOKENS + 1):-1]
        norm = tokens_to_actions(action_ids, vocab_size=len(self.processor.tokenizer))
        stats = self.env_adapter.dataset_statistics["action"]
        mask = np.array([True] * 6 + [False])
        raw = denormalize_with_quantiles(norm, stats["p01"], stats["p99"], mask)
        return self.env_adapter.postprocess(raw[None])


class SpatialVLANativePolicyWrapper(BasePolicyWrapper):
    """Fully native SpatialVLA path: SigLIP + Ego3D PE + Gemma2 spatial-token
    decode as ONE XLA program (models/spatialvla), replacing the reference's
    torch `predict_action`/`decode_actions` (policy_wrapper.py:194-223).
    Chunk ensembling mirrors the reference's SpatialVLA adapter
    (exp-weighted ActionEnsembler, simpler.py:492-519)."""

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        import functools

        import jax

        from intact_tpu.envs.adapters.simpler import ActionEnsembler
        from intact_tpu.models.common import DEFAULT_POLICY, SERVING_POLICY
        from intact_tpu.models.spatialvla import model as svla
        from intact_tpu.models.tokenizer import make_tokenizer

        self.model_cfg = model_cfg or config.make_model_config()
        cfg = self.model_cfg
        self._svla, self._jax = svla, jax
        policy = SERVING_POLICY if config.use_bf16 else DEFAULT_POLICY
        self._policy = policy
        self.params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(policy.param_dtype), svla.init(k, cfg)
            )
        )(jax.random.key(config.seed))
        # PaliGemma2 tokenizer asset (spatial tokens appended at the tail);
        # hermetic hash fallback when unconfigured
        self.tokenizer = make_tokenizer(
            config.resolve_tokenizer_path(), cfg.tokenizer_max_length,
            vocab_size=cfg.spatial_offset,
        )
        self.action_tokenizer = svla.make_action_tokenizer(cfg)
        self.ensembler = ActionEnsembler(pred_horizon=cfg.n_action_steps)
        self._predict = jax.jit(
            functools.partial(svla.predict_action_tokens, cfg=cfg, policy=policy)
        )
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.switch_model(path)

    def reset(self) -> None:
        super().reset()
        self.ensembler.reset()

    def switch_model(self, new_model_path: str) -> None:
        import os

        if any(
            f.endswith(".safetensors") for f in (
                os.listdir(new_model_path) if os.path.isdir(new_model_path) else []
            )
        ):
            raw = self._svla.load_spatialvla_checkpoint(new_model_path, self.model_cfg)
            self.params = self._jax.tree.map(
                lambda x: self._jax.numpy.asarray(x, self._policy.param_dtype), raw
            )
        else:
            from intact_tpu.train import checkpoint as ckpt_lib

            self.params = ckpt_lib.restore_params(new_model_path, self.params)
        self.reset()

    def select_action(self, obs: dict) -> np.ndarray:
        import cv2

        cfg = self.model_cfg
        inputs = self.env_adapter.preprocess(obs)
        image = np.asarray(inputs["image"], np.float32)  # [1, H, W, 3] in [-1,1]
        s = cfg.vision.image_size
        if image.shape[1] != s or image.shape[2] != s:
            image = np.stack([
                cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
                for im in image
            ])
        depth = obs.get("observation.depth")
        if depth is None:
            # no depth estimator on the serving host: flat-plane prior (the
            # upstream ZoeDepth estimate is an external asset; Ego3D then
            # encodes ray directions + plane distance)
            depth = self._svla.flat_depth(image.shape[0], cfg)
        else:
            g = cfg.vision.grid
            d = np.asarray(depth, np.float32)
            if d.ndim == 2:
                d = d[None]
            depth = np.stack([
                cv2.resize(di, (g, g), interpolation=cv2.INTER_AREA) for di in d
            ])

        lang_tokens, lang_masks = self.tokenizer(inputs["task"], cfg.tokenizer_max_length)
        ids = np.asarray(
            self._predict(self.params, image, depth, lang_tokens, lang_masks)
        )[0]
        chunk = self.action_tokenizer.decode(
            ids.reshape(cfg.n_action_steps, cfg.tokens_per_action)
        )  # [n_steps, 7] normalized
        ensembled = self.ensembler.ensemble(chunk)
        return self.env_adapter.postprocess(ensembled[None])


class MagmaNativePolicyWrapper(BasePolicyWrapper):
    """Fully native Magma path: ConvNeXt + projector + LLaMA-3 decode as ONE
    XLA program (models/magma), replacing the reference's torch
    `generate(use_cache=False)` Python loop (policy_wrapper.py:226-303).
    Checkpoints: HF safetensors snapshot (imported) or Orbax step dirs."""

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        import functools

        import jax

        from intact_tpu.models.common import DEFAULT_POLICY, SERVING_POLICY
        from intact_tpu.models.magma import model as magma
        from intact_tpu.models.tokenizer import make_tokenizer

        self.model_cfg = model_cfg or config.make_model_config()
        cfg = self.model_cfg
        self._magma, self._jax = magma, jax
        policy = SERVING_POLICY if config.use_bf16 else DEFAULT_POLICY
        self._policy = policy
        self.params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(policy.param_dtype), magma.init(k, cfg)
            )
        )(jax.random.key(config.seed))
        # Magma tokenizes with the LLaMA-3 tokenizer; explicit asset or the
        # hermetic hash fallback (make_tokenizer warns loudly). The hash
        # fallback's vocab is bounded below image_token_id so text tokens
        # can never collide with the image-placeholder id (which would
        # silently corrupt the prompt splice).
        self.tokenizer = make_tokenizer(
            config.resolve_tokenizer_path(), cfg.max_prompt_tokens,
            vocab_size=min(cfg.image_token_id, cfg.lm.vocab_size),
        )
        self._generate = jax.jit(
            functools.partial(magma.generate, cfg=cfg, policy=policy)
        )
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.switch_model(path)

    def switch_model(self, new_model_path: str) -> None:
        import os

        if any(
            f.endswith(".safetensors") for f in (
                os.listdir(new_model_path) if os.path.isdir(new_model_path) else []
            )
        ):
            raw = self._magma.load_magma_checkpoint(new_model_path, self.model_cfg)
            self.params = self._jax.tree.map(
                lambda x: self._jax.numpy.asarray(x, self._policy.param_dtype), raw
            )
        else:
            from intact_tpu.train import checkpoint as ckpt_lib

            self.params = ckpt_lib.restore_params(new_model_path, self.params)
        self.env_adapter.reset()

    # CLIP image normalization (the HF Magma processor's convention)
    _CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    _CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def _prep_images(self, image: np.ndarray) -> np.ndarray:
        """Adapter output [B, H, W, 3] in [-1, 1] -> CLIP-normalized floats
        at the vision tower's native resolution."""
        import cv2

        s = self.model_cfg.image_size
        pix01 = (np.asarray(image, np.float32) + 1.0) / 2.0
        if pix01.shape[1] != s or pix01.shape[2] != s:
            pix01 = np.stack([
                cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
                for im in pix01
            ])
        return (pix01 - self._CLIP_MEAN) / self._CLIP_STD

    def select_action(self, obs: dict) -> np.ndarray:
        from intact_tpu.serve.decoding import (
            denormalize_with_quantiles,
            tokens_to_actions,
        )

        cfg = self.model_cfg
        inputs = self.env_adapter.preprocess(obs)
        images = self._prep_images(inputs["image"])
        tokens, masks = self._magma.build_prompt(self.tokenizer, inputs["task"], cfg)
        out_ids = np.asarray(
            self._generate(self.params, images, tokens, masks)
        )[0, : cfg.n_action_tokens]
        norm = tokens_to_actions(
            out_ids, vocab_size=cfg.lm.vocab_size, n_bins=cfg.n_action_bins
        )
        stats = self.env_adapter.dataset_statistics["action"]
        mask = np.array([True] * 6 + [False])
        raw = denormalize_with_quantiles(norm, stats["p01"], stats["p99"], mask)
        return self.env_adapter.postprocess(raw[None])


def make_policy_wrapper(config):
    """Model type -> wrapper (reference run.py:24-56 policy_wrapper_map)."""
    mtype = config.model_cfg.get("type", "pi0")
    wrappers = {
        "pi0": Pi0PolicyWrapper,
        "pi0_tiny": Pi0PolicyWrapper,
        "mvla": Pi0PolicyWrapper,
        "mvla_tiny": Pi0PolicyWrapper,
        "octo": OctoPolicyWrapper,
        "octo_tiny": OctoPolicyWrapper,
        "octo_small_upstream": OctoPolicyWrapper,
        "octo_base_upstream": OctoPolicyWrapper,
        "spatialvla": SpatialVLAPolicyWrapper,
        "spatialvla_native": SpatialVLANativePolicyWrapper,
        "spatialvla_native_tiny": SpatialVLANativePolicyWrapper,
        "magma": MagmaPolicyWrapper,
        "magma_native": MagmaNativePolicyWrapper,
        "magma_native_tiny": MagmaNativePolicyWrapper,
    }
    if mtype not in wrappers:
        raise ValueError(
            f"No policy wrapper for model type {mtype!r} (available: {sorted(wrappers)})"
        )
    return wrappers[mtype](config)
