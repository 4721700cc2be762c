"""Pi0Policy: host-side policy interface around the jitted model.

The LeRobot-PreTrainedPolicy-equivalent surface the serving stack consumes
(reference `src/model/mvla/modeling_mvla.py:221-342`): language tokenization,
state/image padding to model dims, an action queue that re-infers every
n_action_steps, and checkpoint load/save. All device work is two jitted
functions (sample chunk / compute loss); everything else is numpy.
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.models.tokenizer import make_tokenizer
from intact_tpu.train import checkpoint as ckpt_lib


class Pi0Policy:
    def __init__(
        self,
        cfg: Pi0Config,
        params=None,
        tokenizer=None,
        seed: int = 0,
        use_bf16: bool = True,
        sharding=None,
        model_module=None,
        quantize: bool = False,
        tokenizer_path: str | None = None,
        mesh=None,
    ):
        """model_module: any module exposing init/sample_actions with the
        pi0 signature (pi0 by default; mvla works identically).
        quantize: int8 W8A8 serving for the transformer-block matmuls.
        tokenizer_path: HF tokenizer asset ("hash" for the hermetic
        fallback); ignored when an explicit tokenizer object is passed.
        mesh: optional jax.sharding.Mesh for multi-chip serving — params
        shard by the fsdp/tensor rules (parallel/sharding.py), inference
        batches shard over (data, fsdp); XLA inserts the ICI collectives."""
        self.cfg = cfg
        self.model = model_module or pi0
        self._quantize = quantize
        self.policy = (
            cm.SERVING_POLICY if use_bf16 else
            cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
        )
        self.tokenizer = tokenizer or make_tokenizer(
            tokenizer_path, cfg.tokenizer_max_length, vocab_size=cfg.vlm.vocab_size
        )
        self._rng = jax.random.key(seed)
        self._queue: deque = deque()
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None and sharding is None:
            from intact_tpu.parallel.sharding import batch_sharding, param_shardings

            template = jax.eval_shape(
                lambda k: jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, self.policy.param_dtype),
                    self.model.init(k, cfg),
                ),
                jax.random.key(seed),
            )
            sharding = param_shardings(template, mesh)
            self._batch_sharding = batch_sharding(mesh)
        self._sharding = sharding

        if params is None:
            init_fn = lambda k: jax.tree.map(  # noqa: E731
                lambda x: x.astype(self.policy.param_dtype), self.model.init(k, cfg)
            )
            params = jax.jit(init_fn, out_shardings=self._sharding)(jax.random.key(seed))
        if quantize:
            params = jax.jit(cm.quantize_params)(params)
        self.params = params
        from intact_tpu.utils.device import drain_device_queue

        # lowering the first big sample graph while the init program is
        # still in flight stalls 100-300 s through the tunnel
        drain_device_queue(self.params)

        sample_fn = self.model.sample_actions

        def sample(params, key, images, img_masks, lang_tokens, lang_masks, state):
            # serving ships uint8 frames (4x fewer bytes over the
            # host->device transfer); normalize to [-1, 1] on device. The
            # dtype branch resolves at trace time — float inputs (training
            # validation, tests) pass through untouched.
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            return sample_fn(
                params, key, images, img_masks, lang_tokens, lang_masks,
                state, cfg=cfg, policy=self.policy,
            )

        self._sample = jax.jit(sample)

    # ------------------------------------------------------------------
    # checkpoint interface (step_{n} contract, hot-swappable)
    # ------------------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Pi0Config, **kwargs) -> "Pi0Policy":
        policy = cls(cfg, **kwargs)
        policy.load(path)
        return policy

    def load(self, path: str) -> None:
        """Restore params from an Orbax step dir (or latest under a root).
        Unlike the reference's del-model/gc/empty-cache dance
        (policy_wrapper.py:61-67), restore writes into fresh device buffers
        and the old params are dropped atomically."""
        template = self.params
        if self._quantize:
            # checkpoints store fp params; restore against an fp template
            template = jax.eval_shape(
                lambda k: self.model.init(k, self.cfg), jax.random.key(0)
            )
        restored = ckpt_lib.restore_params(path, template, self._sharding)
        params = jax.tree.map(lambda x: x.astype(self.policy.param_dtype), restored)
        if self._quantize:
            params = jax.jit(cm.quantize_params)(params)
        self.params = params
        self.reset()

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def reset(self) -> None:
        self._queue.clear()

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def prepare_inputs(self, batch: dict):
        """Normalize a host obs batch into model arrays.

        batch keys: "image" [B, H, W, 3] float [-1,1] or [B, K, H, W, 3];
        "state" [B, <=max_state_dim]; "task" list[str].
        """
        image = np.asarray(batch["image"])
        if image.dtype != np.uint8:  # uint8 normalizes on device (_sample)
            image = image.astype(np.float32)
        if image.ndim == 4:
            image = image[:, None]  # add camera axis
        b = image.shape[0]
        img_masks = np.ones((b, image.shape[1]), bool)

        lang_tokens, lang_masks = self.tokenizer(
            list(batch["task"]), self.cfg.tokenizer_max_length
        )

        state_in = np.asarray(batch["state"], np.float32)
        state = np.zeros((b, self.cfg.max_state_dim), np.float32)
        state[:, : state_in.shape[-1]] = state_in
        return image, img_masks, lang_tokens, lang_masks, state

    def sample_action_chunk(self, batch: dict) -> np.ndarray:
        """One inference -> [B, chunk_size, action_dim] (unpadded dims kept)."""
        images, img_masks, lang_tokens, lang_masks, state = self.prepare_inputs(batch)
        n = images.shape[0]
        if self._batch_sharding is not None:
            # batch must divide over the (data, fsdp) axes: pad by repeating
            # the last row, slice the padding back off below
            div = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
            pad = (-n) % div

            def put(x):
                if pad:
                    x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                return jax.device_put(jnp.asarray(x), self._batch_sharding)
        else:
            put = jnp.asarray
        actions = self._sample(
            self.params, self._next_key(), put(images), put(img_masks),
            put(lang_tokens), put(lang_masks), put(state),
        )
        return np.asarray(actions, np.float32)[:n]

    def select_action(self, batch: dict, action_dim: int | None = None) -> np.ndarray:
        """Queue semantics (reference modeling_mvla.py:255-307): re-infer when
        the queue of n_action_steps actions drains; returns [B, action_dim]."""
        if not self._queue:
            chunk = self.sample_action_chunk(batch)
            if action_dim is not None:
                chunk = chunk[:, :, :action_dim]
            for i in range(min(self.cfg.n_action_steps, chunk.shape[1])):
                self._queue.append(chunk[:, i])
        return self._queue.popleft()
