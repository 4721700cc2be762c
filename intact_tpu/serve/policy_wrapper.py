"""Policy wrappers: glue between the wire protocol, env adapters, and models.

Role parity with `src/experiments/policies/policy_wrapper.py:26-371`:
`select_action(obs) -> np.ndarray [action_step, dim]`, `reset()`,
`switch_model(path)` (hot checkpoint swap for sweeps). The TPU differences:
params reload is an Orbax restore into fresh device buffers (no gc/empty-
cache dance), and every wrapper implements ONE fused-batch contract —
`infer_batch(items)` — that both the per-request path (`select_action`) and
the continuous-batching server route through, so there is a single fuse
implementation per model family.

Per-connection episode state (env-adapter sticky grippers, Octo's image
history, SpatialVLA's chunk ensembler) lives in a `PolicySession`, created
per websocket connection by the batching server via `new_session()`. The
shared device-side policy stays stateless across co-batched clients.
"""

from __future__ import annotations

import numpy as np

from intact_tpu.utils.monitor import setup_logger
from intact_tpu.utils.pipeline import get_class_from_path, set_seed_everywhere


class PolicySession:
    """Per-connection episode state: a fresh env adapter plus any
    model-specific state a family needs between steps. One client's
    `reset` resets only its own session — co-batched neighbors and the
    shared policy are untouched (the reference's per-connection reset
    semantics, websocket_policy_server.py:74-77)."""

    # sessions on the uint8 wire ask the adapter to skip its float
    # normalize entirely (adapters that support output_uint8 emit the
    # resized uint8 frame; others keep the float contract and the session
    # re-encodes via float_to_u8)
    wants_uint8 = False

    def __init__(self, wrapper: "BasePolicyWrapper", adapter):
        self.wrapper = wrapper
        self.adapter = adapter
        # episode state predicted by a model that has since been hot-swapped
        # must not leak into the new model's episodes (Octo history frames,
        # SpatialVLA ensembler chunks): infer_batch resets any session whose
        # generation lags the wrapper's
        self.model_generation = getattr(wrapper, "model_generation", 0)
        if self.wants_uint8 and hasattr(adapter, "output_uint8"):
            adapter.output_uint8 = True

    def preprocess(self, obs: dict) -> dict:
        return self.adapter.preprocess(obs)

    def reset(self) -> None:
        self.adapter.reset()


class BasePolicyWrapper:
    session_cls = PolicySession
    # class-level default so partially-constructed wrappers (test stubs via
    # __new__) still satisfy the generation protocol; __init__ shadows it
    model_generation = 0

    def __init__(self, config):
        self.config = config
        self.logger = setup_logger(True, name="policy_wrapper")
        set_seed_everywhere(config.seed, train=False)
        self.env_adapter = get_class_from_path(config.eval_cfg.env_adapter_path)(config)
        self.action_step = config.eval_cfg.action_step
        self._default_session: PolicySession | None = None
        # bumped by every switch_model so live sessions detect the swap
        self.model_generation = 0

    # ------------------------------------------------------------------
    # session / fuse surface (consumed by serve.batching)
    # ------------------------------------------------------------------

    @property
    def session(self) -> PolicySession:
        """The wrapper's own session (per-request server path). Lazy: family
        session classes read state set up by subclass __init__."""
        if self._default_session is None:
            self._default_session = self.session_cls(self, self.env_adapter)
        return self._default_session

    def new_session(self) -> PolicySession:
        """Fresh per-connection state for the batching server."""
        adapter = get_class_from_path(self.config.eval_cfg.env_adapter_path)(
            self.config
        )
        return self.session_cls(self, adapter)

    def fuse_key(self, inputs: dict):
        """Requests whose inputs share this key may be fused into one device
        batch; the batching server groups by it, so a client sending odd
        shapes (or dtypes — uint8 frames must never concatenate into a
        float batch un-normalized) forms its own group instead of poisoning
        neighbors.

        Also the per-request validation gate: raising here rejects ONLY the
        offending request (the server catches fuse_key errors per request).
        The rows to task-strings consistency check lives here because a
        request whose task list is shorter than its image rows would
        silently shift every co-batched NEIGHBOR's language conditioning
        after the row-offset flatten in the fuse implementations."""
        task = inputs.get("task")
        img = inputs.get("image")
        if isinstance(task, (list, tuple)) and isinstance(img, np.ndarray):
            if len(task) != img.shape[0] or not task:
                raise ValueError(
                    f"request has {img.shape[0]} image row(s) but "
                    f"{len(task)} task string(s); per-row task conditioning "
                    "requires one task per row"
                )
        return tuple(
            (k, v.shape[1:], str(v.dtype))
            for k, v in sorted(inputs.items())
            if isinstance(v, np.ndarray)
        )

    def bucket_size(self, n: int) -> int:
        """Fused device batches pad to power-of-two buckets, capped at
        eval_cfg.max_batch_size, so the jitted sample path compiles a
        bounded set of shapes instead of one per arrival pattern. Row
        counts beyond max_batch (vectorized clients) are served by
        SPLITTING the device call (see Pi0PolicyWrapper.infer_batch), never
        by compiling an unbounded shape."""
        b = 1
        while b < n:
            b *= 2
        return min(b, self.config.eval_cfg.max_batch_size)

    def effective_fused_size(self, n: int) -> int:
        """The device batch a fuse of n rows actually compiles — bucket
        padding plus any mesh-divisor rounding. Used by prewarm to dedupe
        shapes and by the fuse implementations."""
        target = self.bucket_size(n)
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            div = mesh.shape["data"] * mesh.shape["fsdp"]
            target = target + (-target) % div
        return target

    def bucket_sizes(self) -> list[int]:
        sizes, b = [], 1
        max_b = max(int(self.config.eval_cfg.max_batch_size), 1)
        while b < max_b:
            sizes.append(b)
            b *= 2
        sizes.append(max_b)
        return sizes

    def infer_batch(self, items: list[tuple[dict, PolicySession]]):
        """THE fuse contract: N (inputs, session) pairs -> N results in
        order, each an env-action array or an Exception (one client's
        failing postprocess must not kill co-batched neighbors).

        The batching server's fuse-group cap is an independent constructor
        arg, so it may exceed this wrapper's eval_cfg.max_batch_size; split
        oversized fuses here so no family's _infer_fused ever sees more
        items than its compiled bucket ceiling (a fuse beyond the ceiling
        would otherwise compute a negative pad and crash the whole group).
        """
        # a session created before a hot model swap carries episode state the
        # OLD model produced (Octo history, SpatialVLA ensembler chunks);
        # blending it with new-model predictions silently corrupts actions,
        # so lagging sessions reset at their next inference
        for _, session in items:
            if session.model_generation != self.model_generation:
                session.reset()
                session.model_generation = self.model_generation

        max_b = max(int(self.config.eval_cfg.max_batch_size), 1)
        if len(items) <= max_b:
            return self._infer_fused(items)
        out = []
        for start in range(0, len(items), max_b):
            out.extend(self._infer_fused(items[start:start + max_b]))
        return out

    def _infer_fused(self, items: list[tuple[dict, PolicySession]]):
        """Family fused-inference hook (items already capped at
        eval_cfg.max_batch_size). Default: per-item serial inference
        (families without a fused device path, e.g. the upstream-HF
        scaffolds)."""
        out = []
        for inputs, session in items:
            try:
                out.append(self._infer_one(inputs, session))
            except Exception as e:  # noqa: BLE001 — isolated per request
                out.append(e)
        return out

    def _infer_one(self, inputs: dict, session: PolicySession) -> np.ndarray:
        raise NotImplementedError

    def _fuse_pad(self, items, keys):
        """Shared fuse assembly for the single-row AR/diffusion families:
        concat each `keys` array across items, replicate the last row up to
        effective_fused_size, and pad the task list to match. Returns
        (arrays_by_key, padded_tasks)."""
        n = len(items)
        pad = self.effective_fused_size(n) - n
        arrays = {}
        for key in keys:
            arr = np.concatenate([it[0][key] for it in items])
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            arrays[key] = arr
        tasks = [it[0]["task"][0] for it in items]
        return arrays, tasks + [tasks[-1]] * pad

    def _put_device(self, arr):
        """Host array -> device, through the fused-batch sharding when the
        wrapper serves over a mesh (families set self._batch_sharding)."""
        import jax

        sharding = getattr(self, "_batch_sharding", None)
        if sharding is None:
            return jax.numpy.asarray(arr)
        return jax.device_put(jax.numpy.asarray(arr), sharding)

    def warmup_inputs(self) -> dict:
        """One post-preprocess request the server can replicate to compile
        every fused-batch bucket before accepting traffic."""
        raise NotImplementedError

    def prewarm(self) -> None:
        """Compile every fused-batch bucket (one dummy inference per
        DISTINCT device shape) so a ramping client fleet never pays a
        compile mid-traffic. Buckets that round to the same effective
        device batch (mesh-divisor padding) compile once."""
        session = self.new_session()
        try:
            inputs = self.warmup_inputs()
        except NotImplementedError:
            self.logger.info("no warmup inputs for %s; skipping prewarm",
                             type(self).__name__)
            return
        seen: set[int] = set()
        for b in self.bucket_sizes():
            eff = self.effective_fused_size(b)
            if eff in seen:
                continue
            seen.add(eff)
            results = self.infer_batch([(inputs, session)] * b)
            for r in results:
                if isinstance(r, Exception):
                    # the device compile already happened; only the dummy
                    # postprocess failed
                    self.logger.warning("prewarm postprocess: %s", r)
                    break
            self.logger.info("prewarmed bucket %d", b)

    # ------------------------------------------------------------------
    # per-request surface (reference policy_wrapper.py API)
    # ------------------------------------------------------------------

    def reset(self) -> None:
        self.session.reset()

    def switch_model(self, new_model_path: str) -> None:
        raise NotImplementedError

    def select_action(self, obs: dict) -> np.ndarray:
        res = self.infer_batch([(self.session.preprocess(obs), self.session)])[0]
        if isinstance(res, Exception):
            raise res
        return res


class Pi0Session(PolicySession):
    """Ships frames as uint8: adapters that support it emit resized uint8
    directly (output_uint8); others resize uint8 -> uint8 before
    normalizing, so re-encoding their [-1, 1] float output back to uint8
    recovers the same pixels — the device sees the same values after the
    in-graph normalize (Pi0Policy._sample) while the host->device transfer
    carries 4x fewer bytes."""

    wants_uint8 = True

    def preprocess(self, obs: dict) -> dict:
        from intact_tpu.utils.device import float_to_u8

        inputs = self.adapter.preprocess(obs)
        inputs["image"] = float_to_u8(np.asarray(inputs["image"]))
        return inputs


class Pi0PolicyWrapper(BasePolicyWrapper):
    """Serves intact_tpu Pi0/MVLA checkpoints (LeRobotPolicyWrapper-
    equivalent, reference policy_wrapper.py:106-157)."""

    session_cls = Pi0Session

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
        # effective_fused_size/prewarm read self.mesh: without it, buckets
        # that round to the same mesh-padded device batch would each issue
        # a redundant warm inference (the policy re-rounds internally, so
        # inference itself was already correct)
        self.mesh = mesh
        self.policy = Pi0Policy(
            self.model_cfg, seed=config.seed, use_bf16=config.use_bf16,
            model_module=model_module,
            tokenizer_path=config.resolve_tokenizer_path(),
            mesh=mesh,
            quantize=getattr(config.eval_cfg, "quantize_int8", False),
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
        self.model_generation += 1

    def warmup_inputs(self) -> dict:
        h, w = self.config.env.image_size
        state_dim = int(getattr(
            getattr(self.policy, "cfg", None), "max_state_dim", 8
        ) or 8)
        return {
            "image": np.zeros((1, h, w, 3), np.uint8),
            "state": np.zeros((1, state_dim), np.float32),
            "task": ["warmup"],
        }

    def _infer_fused(self, items):
        """Fuse N requests' {image, state, task} into bucketed
        sample_action_chunk calls, then scatter per-item postprocess.
        Requests may carry >1 row each (vectorized ManiSkill3 adapters);
        row totals beyond max_batch_size run as multiple max_batch-sized
        device calls, so the compiled-shape set stays bounded no matter how
        wide a client's request is."""
        rows = [it[0]["image"].shape[0] for it in items]
        n = sum(rows)
        imgs = np.concatenate([it[0]["image"] for it in items])
        states = np.concatenate([it[0]["state"] for it in items])
        tasks = [t for it in items for t in it[0]["task"]]

        max_b = max(int(self.config.eval_cfg.max_batch_size), 1)
        parts = []
        for start in range(0, n, max_b):
            stop = min(start + max_b, n)
            m = stop - start
            pad = self.bucket_size(m) - m
            ci, cs = imgs[start:stop], states[start:stop]
            ct = tasks[start:stop]
            if pad:  # replicate the last row up to the bucket boundary
                ci = np.concatenate([ci, np.repeat(ci[-1:], pad, axis=0)])
                cs = np.concatenate([cs, np.repeat(cs[-1:], pad, axis=0)])
                ct = ct + [ct[-1]] * pad
            parts.append(self.policy.sample_action_chunk(
                {"image": ci, "state": cs, "task": ct}
            )[:m])
        chunks = parts[0] if len(parts) == 1 else np.concatenate(parts)
        # [n, chunk, max_action_dim]

        out, offset = [], 0
        for (inputs, session), r in zip(items, rows):
            try:
                env_dim = len(session.adapter.dataset_statistics["action"]["mean"])
                sl = chunks[offset:offset + r, : self.action_step, :env_dim]
                if hasattr(session.adapter, "postprocess_batch"):
                    out.append(session.adapter.postprocess_batch(sl))
                else:
                    out.append(session.adapter.postprocess(sl[0]))
            except Exception as e:  # noqa: BLE001 — isolated per request
                out.append(e)
            offset += r
        return out


class OctoSession(PolicySession):
    """Octo keeps a 2-frame image-history deque with a timestep pad mask
    (reference policy_wrapper.py:344-354). The deque is per-connection: a
    co-batched client's reset must not clear another episode's history."""

    wants_uint8 = True

    def __init__(self, wrapper, adapter):
        super().__init__(wrapper, adapter)
        from collections import deque

        self.history = deque(maxlen=wrapper.model_cfg.history)

    def preprocess(self, obs: dict) -> dict:
        cfg = self.wrapper.model_cfg
        inputs = self.adapter.preprocess(obs)
        if inputs["image"].shape[0] != 1:
            # history is a single-episode deque; silently folding an N-env
            # vectorized request into it would return wrong actions for
            # envs 1..N-1
            raise ValueError(
                f"octo serving is single-env per connection; adapter "
                f"produced a {inputs['image'].shape[0]}-row request"
            )
        got = inputs["image"].shape[1:3]
        if got != (cfg.image_size, cfg.image_size):
            # the adapter owns the (fidelity-critical, upstream-matching)
            # resize — a silent re-resize here would corrupt it, so mismatch
            # is a config error: set env.image_size to the model's input size
            raise ValueError(
                f"octo adapter produced {got} images but the model expects "
                f"({cfg.image_size}, {cfg.image_size}); set env.image_size "
                "accordingly"
            )
        # ship uint8 (exactly invertible: the adapter's floats come from
        # uint8 pixels); the jitted sample normalizes on device
        from intact_tpu.utils.device import float_to_u8

        self.history.append(float_to_u8(np.asarray(inputs["image"][0])))
        frames = list(self.history)
        n_pad = cfg.history - len(frames)
        return {
            "images": np.stack([frames[0]] * n_pad + frames)[None],  # [1,T,H,W,3]
            "img_masks": np.array([[False] * n_pad + [True] * len(frames)]),
            "state": np.asarray(inputs["state"], np.float32),
            "task": inputs["task"],
        }

    def reset(self) -> None:
        super().reset()
        self.history.clear()


class OctoPolicyWrapper(BasePolicyWrapper):
    """Serves the native-JAX Octo (reference policy_wrapper.py:305-371
    semantics: 2-frame image history deque with timestep pad mask, text task,
    diffusion-head sampling)."""

    session_cls = OctoSession

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        import functools
        import importlib

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
        from intact_tpu.utils.device import drain_device_queue

        drain_device_queue(self.params)  # tunnel lowering-stall workaround
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
        self._rng = jax.random.key(config.seed)
        sample_fn = functools.partial(self.model.sample_actions, cfg=cfg)

        def sample(params, key, images, img_masks, lang_tokens, lang_masks, state):
            # uint8 frames normalize on device (trace-time dtype branch)
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            return sample_fn(
                params, key, images, img_masks, lang_tokens, lang_masks, state
            )

        self._sample = jax.jit(sample)
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.switch_model(path)

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
        self.model_generation += 1

    def warmup_inputs(self) -> dict:
        cfg = self.model_cfg
        # the session guards adapter output to the model's input size, so
        # warmup compiles exactly the serving shape (uint8 wire)
        h = w = cfg.image_size
        return {
            "images": np.zeros((1, cfg.history, h, w, 3), np.uint8),
            "img_masks": np.ones((1, cfg.history), bool),
            # proprio_dim, NOT action_dim: they default equal (7) but a
            # model with a wider proprio would otherwise prewarm the wrong
            # state shape and pay a cold compile on the first real request
            "state": np.zeros((1, cfg.proprio_dim), np.float32),
            "task": ["warmup"],
        }

    def _infer_fused(self, items):
        """Fuse N requests' {images, img_masks, state, task} (history
        stacking already done per-session) into one bucketed diffusion
        sample; scatter per-item postprocess."""
        jnp, jax = self._jnp, self._jax
        cfg = self.model_cfg
        arrays, tasks = self._fuse_pad(items, ("images", "img_masks", "state"))
        lang_tokens, lang_masks = self.tokenizer(tasks, cfg.max_lang_tokens)
        self._rng, key = jax.random.split(self._rng)
        chunk = np.asarray(self._sample(
            self.params, key, jnp.asarray(arrays["images"]),
            jnp.asarray(arrays["img_masks"]), jnp.asarray(lang_tokens),
            jnp.asarray(lang_masks), jnp.asarray(arrays["state"]),
        ))

        out = []
        for i, (inputs, session) in enumerate(items):
            try:
                out.append(session.adapter.postprocess(chunk[i, : self.action_step]))
            except Exception as e:  # noqa: BLE001
                out.append(e)
        return out


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
        self.model_generation += 1

    def _infer_one(self, inputs: dict, session: PolicySession) -> np.ndarray:
        from intact_tpu.utils.device import float_to_u8

        # AutoProcessor expects uint8/PIL pixels and applies its own
        # rescale+normalize; the adapter hands back float [-1, 1] frames,
        # which would be re-normalized into near-black noise
        image = float_to_u8(np.asarray(inputs["image"]))[0]
        hf_inputs = self.processor(
            images=image, text=inputs["task"][0], return_tensors="pt"
        )
        out = self.model.predict_action(hf_inputs)
        actions = self.processor.decode_actions(out, unnorm_key=self.unnorm_key)
        return session.adapter.postprocess(np.asarray(actions)[: self.action_step])


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
        self.model_generation += 1

    def _infer_one(self, inputs: dict, session: PolicySession) -> np.ndarray:
        from intact_tpu.serve.decoding import (
            denormalize_with_quantiles,
            tokens_to_actions,
        )

        from intact_tpu.utils.device import float_to_u8

        convo = [{"role": "user", "content": f"<image>\nWhat action should the robot take to {inputs['task'][0]}?"}]
        prompt = self.processor.tokenizer.apply_chat_template(
            convo, tokenize=False, add_generation_prompt=True
        )
        # uint8 pixels for the processor's own rescale+normalize (adapter
        # emits float [-1, 1])
        image = float_to_u8(np.asarray(inputs["image"]))[0]
        hf_inputs = self.processor(images=image, texts=prompt, return_tensors="pt")
        output_ids = self.model.generate(**hf_inputs, max_new_tokens=1000, use_cache=False)
        action_ids = np.asarray(output_ids)[0, -(self.N_ACTION_TOKENS + 1):-1]
        # bin = vocab - id - 1 counts from the END of the model's OUTPUT
        # vocab: use the model config's vocab_size (the logits/embedding
        # width), NOT len(tokenizer) — checkpoints that pad the embedding
        # beyond the tokenizer would shift every action by the pad amount
        vocab = getattr(self.model.config, "vocab_size", None) or len(
            self.processor.tokenizer
        )
        norm = tokens_to_actions(action_ids, vocab_size=vocab)
        stats = session.adapter.dataset_statistics["action"]
        mask = np.array([True] * 6 + [False])
        raw = denormalize_with_quantiles(norm, stats["p01"], stats["p99"], mask)
        return session.adapter.postprocess(raw[None])


class SpatialVLASession(PolicySession):
    """SpatialVLA's exp-weighted chunk ensembler is per-episode state
    (reference simpler.py:492-519) — per-connection here. preprocess also
    owns the host-side resize + depth prep so the fused device call only
    sees model-shaped arrays."""

    wants_uint8 = True

    def __init__(self, wrapper, adapter):
        super().__init__(wrapper, adapter)
        from intact_tpu.envs.adapters.simpler import ActionEnsembler

        self.ensembler = ActionEnsembler(
            pred_horizon=wrapper.model_cfg.n_action_steps
        )

    def preprocess(self, obs: dict) -> dict:
        import cv2

        wrapper = self.wrapper
        cfg = wrapper.model_cfg
        inputs = self.adapter.preprocess(obs)
        if inputs["image"].shape[0] != 1:
            # the chunk ensembler is single-episode state; N-env vectorized
            # requests are not meaningful through it
            raise ValueError(
                f"spatialvla serving is single-env per connection; adapter "
                f"produced a {inputs['image'].shape[0]}-row request"
            )
        # ship uint8; the jitted predict normalizes on device (4x fewer
        # bytes over the host->device transfer — svla.normalize_images)
        from intact_tpu.utils.device import float_to_u8

        image = float_to_u8(np.asarray(inputs["image"]))  # [1, H, W, 3] u8
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
            depth = wrapper._svla.flat_depth(image.shape[0], cfg)
        else:
            g = cfg.vision.grid
            d = np.asarray(depth, np.float32)
            if d.ndim == 2:
                d = d[None]
            depth = np.stack([
                cv2.resize(di, (g, g), interpolation=cv2.INTER_AREA) for di in d
            ])
        return {
            "image": image,
            "depth": np.asarray(depth, np.float32),
            "task": inputs["task"],
        }

    def reset(self) -> None:
        super().reset()
        self.ensembler.reset()


def _init_native_serving(mod, cfg, config, policy, materialize: bool = True):
    """Build the device param tree for a native AR wrapper (SpatialVLA /
    Magma): (params, mesh, shardings, batch_sharding, quantize).

    quantize (config.eval_cfg.quantize_int8) streams the W8A8 init leaf by
    leaf (models/common.streamed_quantized_init) — the single-chip mode for
    Magma-8B, whose 17.8 GB bf16 weights exceed one v5e's HBM (8.9 GB
    int8 fits). On a multi-device host both fp and int8 trees shard by the
    same path rules (the `kernel(_q)?` patterns in parallel/sharding.py);
    kernel_scale falls to the replicated catch-all.

    materialize=False returns an abstract (ShapeDtypeStruct) param tree —
    for wrappers about to switch_model to a checkpoint, where a random
    init would be discarded unused."""
    import jax

    from intact_tpu.models import common as cm

    quantize = bool(getattr(config.eval_cfg, "quantize_int8", False))
    seed_key = jax.random.key(config.seed)

    def init_fp(k):
        return jax.tree.map(
            lambda x: x.astype(policy.param_dtype), mod.init(k, cfg)
        )

    mesh = shardings = batch_shard = None
    fp_template = None
    if jax.device_count() > 1:
        from intact_tpu.parallel import MeshConfig, make_mesh
        from intact_tpu.parallel.sharding import batch_sharding, param_shardings

        m = config.mesh
        mesh = make_mesh(MeshConfig(m.data, m.fsdp, m.tensor))
        # ONE abstract trace of the model init; the quantized template for
        # shardings is derived by tracing only quantize_params over it
        # (eval_shape accepts abstract arguments)
        fp_template = jax.eval_shape(init_fp, seed_key)
        template = (
            jax.eval_shape(cm.quantize_params, fp_template)
            if quantize else fp_template
        )
        shardings = param_shardings(template, mesh)
        batch_shard = batch_sharding(mesh)

    if not materialize:
        # a pretrained checkpoint will immediately replace the params, so
        # materializing a random tree (minutes of streamed device init for
        # an 8B model) would be thrown-away work: hand back the ABSTRACT
        # tree instead — every downstream consumer before switch_model
        # (restore templates, shape checks) only reads .shape/.dtype
        if fp_template is None:
            fp_template = jax.eval_shape(init_fp, seed_key)
        params = (
            jax.eval_shape(cm.quantize_params, fp_template)
            if quantize else fp_template
        )
    elif quantize:
        params = cm.streamed_quantized_init(
            init_fp, seed_key, policy, shardings=shardings,
            template=fp_template,
        )
    else:
        params = jax.jit(init_fp, out_shardings=shardings)(seed_key)
    return params, mesh, shardings, batch_shard, quantize


def _put_native_checkpoint(raw, policy, shardings, quantize):
    """Host param tree (importer output) -> device tree, honoring the
    wrapper's quantize/sharding mode. With quantize, the fp tree never
    materializes on device (models/common.quantize_host_tree streams it)."""
    import jax
    import jax.numpy as jnp

    from intact_tpu.models import common as cm

    if quantize:
        return cm.quantize_host_tree(raw, policy, shardings=shardings)
    if shardings is not None:
        # each device gets only its shard; an unsharded put of Magma-8B's
        # 17.8 GB would OOM a single device first
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x, policy.param_dtype), s),
            raw, shardings,
        )
    return jax.tree.map(lambda x: jnp.asarray(x, policy.param_dtype), raw)


def _native_switch_model(wrapper, mod, load_fn, new_model_path) -> None:
    """Shared switch_model for the native AR wrappers (SpatialVLA / Magma):
    an HF safetensors snapshot DIRECTORY routes to the family importer,
    anything else to Orbax step-dir restore. A direct *.safetensors FILE
    path raises with a pointer — the importers consume the snapshot
    directory (sharded index + shards), and silently falling through to the
    Orbax branch produced a confusing restore error."""
    import os

    if str(new_model_path).endswith(".safetensors"):
        raise ValueError(
            f"{new_model_path} is a safetensors FILE; pass its snapshot "
            "directory (the importer reads the index + every shard)"
        )
    if os.path.isdir(new_model_path) and any(
        f.endswith(".safetensors") for f in os.listdir(new_model_path)
    ):
        raw = load_fn(new_model_path, wrapper.model_cfg)
        wrapper.params = _put_native_checkpoint(
            raw, wrapper._policy, wrapper._shardings, wrapper._quantize
        )
    else:
        wrapper.params = _restore_native_orbax(
            mod, wrapper.model_cfg, new_model_path, wrapper._policy,
            wrapper.params, wrapper._shardings, wrapper._quantize,
        )
    wrapper.model_generation += 1


def _restore_native_orbax(mod, cfg, path, policy, self_params, shardings, quantize):
    """Orbax step-dir restore for a native wrapper. Checkpoints store fp
    params; under quantize the fp tree is restored to HOST numpy and
    streamed to device in int8 form (the fp tree may not fit on device)."""
    import jax

    from intact_tpu.models import common as cm
    from intact_tpu.train import checkpoint as ckpt_lib

    if not quantize:
        return ckpt_lib.restore_params(path, self_params, shardings)
    template = jax.eval_shape(
        lambda k: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, policy.param_dtype),
            mod.init(k, cfg),
        ),
        jax.random.key(0),
    )
    raw = ckpt_lib.restore_params_host(path, template)
    return cm.quantize_host_tree(raw, policy, shardings=shardings)


class SpatialVLANativePolicyWrapper(BasePolicyWrapper):
    """Fully native SpatialVLA path: SigLIP + Ego3D PE + Gemma2 spatial-token
    decode as ONE XLA program (models/spatialvla), replacing the reference's
    torch `predict_action`/`decode_actions` (policy_wrapper.py:194-223).
    Chunk ensembling mirrors the reference's SpatialVLA adapter
    (exp-weighted ActionEnsembler, simpler.py:492-519)."""

    session_cls = SpatialVLASession

    def __init__(self, config, model_cfg=None):
        super().__init__(config)

        import jax

        from intact_tpu.models.common import DEFAULT_POLICY, SERVING_POLICY
        from intact_tpu.models.spatialvla import model as svla
        from intact_tpu.models.tokenizer import make_tokenizer

        self.model_cfg = model_cfg or config.make_model_config()
        cfg = self.model_cfg
        self._svla, self._jax = svla, jax
        policy = SERVING_POLICY if config.use_bf16 else DEFAULT_POLICY
        self._policy = policy
        # multi-chip host: shard params over the configured mesh and fused
        # batches over (data, fsdp) — same scheme as Pi0Policy/Magma;
        # eval_cfg.quantize_int8 serves W8A8 (gate via action_parity int8)
        path = config.eval_cfg.pretrained_model_path
        (self.params, self.mesh, self._shardings, self._batch_sharding,
         self._quantize) = _init_native_serving(
            svla, cfg, config, policy, materialize=not path,
        )
        # PaliGemma2 tokenizer asset (spatial tokens appended at the tail);
        # hermetic hash fallback when unconfigured
        self.tokenizer = make_tokenizer(
            config.resolve_tokenizer_path(), cfg.tokenizer_max_length,
            vocab_size=cfg.spatial_offset,
        )
        self.action_tokenizer = svla.make_action_tokenizer(cfg)

        def predict_u8(params, images_u8, depth, lang_tokens, lang_masks):
            return svla.predict_action_tokens(
                params, svla.normalize_images(images_u8), depth,
                lang_tokens, lang_masks, cfg=cfg, policy=policy,
            )

        self._predict = jax.jit(predict_u8)
        if path:
            self.switch_model(path)
        from intact_tpu.utils.device import drain_device_queue

        drain_device_queue(self.params)  # tunnel lowering-stall workaround

    def switch_model(self, new_model_path: str) -> None:
        _native_switch_model(
            self, self._svla, self._svla.load_spatialvla_checkpoint,
            new_model_path,
        )
        self.reset()

    def warmup_inputs(self) -> dict:
        cfg = self.model_cfg
        s = cfg.vision.image_size
        return {
            "image": np.zeros((1, s, s, 3), np.uint8),
            "depth": np.asarray(self._svla.flat_depth(1, cfg), np.float32),
            "task": ["warmup"],
        }

    def _infer_fused(self, items):
        """Fuse N requests into one spatial-token decode; per-item chunk
        decode + per-session ensembling + postprocess."""
        cfg = self.model_cfg
        arrays, tasks = self._fuse_pad(items, ("image", "depth"))
        lang_tokens, lang_masks = self.tokenizer(tasks, cfg.tokenizer_max_length)
        ids = np.asarray(self._predict(
            self.params, self._put_device(arrays["image"]),
            self._put_device(arrays["depth"]),
            self._put_device(lang_tokens), self._put_device(lang_masks),
        ))

        out = []
        for i, (inputs, session) in enumerate(items):
            try:
                chunk = self.action_tokenizer.decode(
                    ids[i].reshape(cfg.n_action_steps, cfg.tokens_per_action)
                )  # [n_steps, 7] normalized
                ensembled = session.ensembler.ensemble(chunk)
                out.append(session.adapter.postprocess(ensembled[None]))
            except Exception as e:  # noqa: BLE001
                out.append(e)
        return out


class MagmaSession(PolicySession):
    """Magma's host-side image prep (resize to the ConvNeXt native
    resolution) happens per-connection; images ship as uint8 and the CLIP
    normalization runs ON DEVICE inside the jitted generate
    (models/magma/model.py:normalize_images) — 4x fewer bytes over the
    host->device transfer, which dominates per-request latency at 512px."""

    wants_uint8 = True

    def preprocess(self, obs: dict) -> dict:
        import cv2

        inputs = self.adapter.preprocess(obs)
        if inputs["image"].shape[0] != 1:
            raise ValueError(
                f"magma serving is single-env per connection; adapter "
                f"produced a {inputs['image'].shape[0]}-row request"
            )
        s = self.wrapper.model_cfg.image_size
        # adapter output -> uint8 at native res (uint8 passthrough when the
        # adapter already emits it)
        from intact_tpu.utils.device import float_to_u8

        u8 = float_to_u8(np.asarray(inputs["image"]))
        if u8.shape[1] != s or u8.shape[2] != s:
            u8 = np.stack([
                cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
                for im in u8
            ])
        return {"image": u8, "task": inputs["task"]}


class MagmaNativePolicyWrapper(BasePolicyWrapper):
    """Fully native Magma path: ConvNeXt + projector + LLaMA-3 decode as ONE
    XLA program (models/magma), replacing the reference's torch
    `generate(use_cache=False)` Python loop (policy_wrapper.py:226-303).
    Checkpoints: HF safetensors snapshot (imported) or Orbax step dirs.

    Memory: Magma-8B is 17.8 GB of bf16 weights — over one v5e's HBM. The
    single-chip mode is int8 (bench.py --model magma); bf16 serving runs
    SHARDED: on a multi-device host the params spread over the configured
    (data, fsdp, tensor) mesh via the family-generic sharding rules
    (parallel/sharding.py) and inference batches shard over (data, fsdp)."""

    session_cls = MagmaSession

    def __init__(self, config, model_cfg=None):
        super().__init__(config)

        import jax

        from intact_tpu.models.common import DEFAULT_POLICY, SERVING_POLICY
        from intact_tpu.models.magma import model as magma
        from intact_tpu.models.tokenizer import make_tokenizer

        self.model_cfg = model_cfg or config.make_model_config()
        cfg = self.model_cfg
        self._magma, self._jax = magma, jax
        policy = SERVING_POLICY if config.use_bf16 else DEFAULT_POLICY
        self._policy = policy
        # eval_cfg.quantize_int8 is THE single-chip mode for Magma-8B
        # (17.8 GB bf16 > one v5e's HBM; 8.9 GB int8 fits) — bf16 serving
        # runs sharded over the mesh. Gate fidelity via action_parity int8.
        path = config.eval_cfg.pretrained_model_path
        (self.params, self.mesh, self._shardings, self._batch_sharding,
         self._quantize) = _init_native_serving(
            magma, cfg, config, policy, materialize=not path,
        )
        # Magma tokenizes with the LLaMA-3 tokenizer; explicit asset or the
        # hermetic hash fallback (make_tokenizer warns loudly). The hash
        # fallback's vocab is bounded below image_token_id so text tokens
        # can never collide with the image-placeholder id (which would
        # silently corrupt the prompt splice).
        self.tokenizer = make_tokenizer(
            config.resolve_tokenizer_path(), cfg.max_prompt_tokens,
            vocab_size=min(cfg.image_token_id, cfg.lm.vocab_size),
        )
        def generate_u8(params, images_u8, tokens, masks):
            return magma.generate(
                params, magma.normalize_images(images_u8), tokens, masks,
                cfg=cfg, policy=policy,
            )

        self._generate = jax.jit(generate_u8)
        if path:
            self.switch_model(path)
        from intact_tpu.utils.device import drain_device_queue

        drain_device_queue(self.params)  # tunnel lowering-stall workaround

    def switch_model(self, new_model_path: str) -> None:
        _native_switch_model(
            self, self._magma, self._magma.load_magma_checkpoint,
            new_model_path,
        )
        self.env_adapter.reset()

    def warmup_inputs(self) -> dict:
        s = self.model_cfg.image_size
        return {
            "image": np.zeros((1, s, s, 3), np.uint8),
            "task": ["warmup"],
        }

    def _infer_fused(self, items):
        """Fuse N requests into one batched greedy decode; per-item token
        de-discretization + quantile denorm + postprocess."""
        from intact_tpu.serve.decoding import (
            denormalize_with_quantiles,
            tokens_to_actions,
        )

        cfg = self.model_cfg
        arrays, tasks = self._fuse_pad(items, ("image",))
        tokens, masks = self._magma.build_prompt(self.tokenizer, tasks, cfg)
        out_ids = np.asarray(self._generate(
            self.params, self._put_device(arrays["image"]),
            self._put_device(tokens), self._put_device(masks),
        ))

        out = []
        for i, (inputs, session) in enumerate(items):
            try:
                norm = tokens_to_actions(
                    out_ids[i, : cfg.n_action_tokens],
                    vocab_size=cfg.lm.vocab_size, n_bins=cfg.n_action_bins,
                )
                stats = session.adapter.dataset_statistics["action"]
                mask = np.array([True] * 6 + [False])
                raw = denormalize_with_quantiles(norm, stats["p01"], stats["p99"], mask)
                out.append(session.adapter.postprocess(raw[None]))
            except Exception as e:  # noqa: BLE001
                out.append(e)
        return out


def make_policy_wrapper(config):
    """Model type -> wrapper (reference run.py:24-56 policy_wrapper_map)."""
    mtype = config.model_cfg.get("type", "pi0")
    wrappers = {
        "pi0": Pi0PolicyWrapper,
        "pi0_tiny": Pi0PolicyWrapper,
        "mvla": Pi0PolicyWrapper,
        "mvla_tiny": Pi0PolicyWrapper,
        "mmmvla": Pi0PolicyWrapper,
        "mmmvla_tiny": Pi0PolicyWrapper,
        "pi0fast": Pi0PolicyWrapper,
        "pi0fast_tiny": Pi0PolicyWrapper,
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
