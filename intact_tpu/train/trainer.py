"""Trainer: config -> mesh -> sharded train loop with validation,
checkpointing, and metric logging.

Role parity with `BaseTrainer` (`src/agent/trainer.py:43-733`), redesigned
for TPU:
  * DDP/FSDP wrappers -> one pjit'd train step over a (data, fsdp, tensor)
    mesh; freezing is an optax mask, not requires_grad surgery;
  * autocast/AMP -> explicit dtype policy (bf16 compute, fp32 params+opt);
  * bitsandbytes AdamW8bit -> optax AdamW (moments sharded with params);
  * torch DataLoader -> host numpy iterator + device_put with the batch
    sharding (async dispatch overlaps host prep with device compute);
  * per-rank stdout silencing + all-reduce metric aggregation -> process 0
    logging; metrics come off the device once per log_freq;
  * save_pretrained/auxiliary_data.pt -> Orbax step_{n} checkpoints.

The train log line keeps the reference's field order (update count, loss,
lr, timing) so downstream log parsers keep working (SURVEY.md §5.5).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.config.pipeline import (
    TrainPipelineConfig,
    optimizer_config_from_model_json,
)
from intact_tpu.data.dataset import InterleavedDataset
import importlib

from intact_tpu.models import common as cm
from intact_tpu.models import registry as model_registry
from intact_tpu.models.tokenizer import make_tokenizer
from intact_tpu.parallel import MeshConfig, make_mesh, batch_sharding
from intact_tpu.train import checkpoint as ckpt
from intact_tpu.train.optim import make_optimizer
from intact_tpu.train.train_step import (
    init_train_state,
    jit_train_step,
    make_train_step,
    state_shardings,
)
from intact_tpu.utils.metric import get_action_accuracy, l1_error
from intact_tpu.utils.monitor import Timer, log_device_memory, setup_logger
from intact_tpu.utils.pipeline import set_seed_everywhere


CAMERA_KEYS = ("image_primary", "image_secondary", "image_wrist")


def preprocess_batch(batch: dict, tokenizer, model_cfg, train: bool = True) -> dict:
    """RLDS batch -> model inputs (reference preprocess_batch,
    `trainer.py:385-425`): uint8 frames -> [-1,1] float, instruction bytes ->
    tokens, proprio/action padded to the model's max dims.

    Cameras and history are separate axes: each observation image_* key is
    one camera [B, T(history), H, W, C]; the CURRENT (last) history frame of
    each present camera feeds the model, and missing cameras are synthesized
    as zero padding images with img_mask=False (reference
    `src/agent/trainer.py:385-425` + padding-image synthesis in
    `obs_transforms.py:107-172`). History windows >1 are not folded into the
    camera axis — models here consume single-step observations.
    """
    from intact_tpu import native

    obs = batch["observation"]
    present = [k for k in CAMERA_KEYS if k in obs]
    if not present:
        raise KeyError(f"no camera keys in observation (expected one of {CAMERA_KEYS})")
    if len(present) > model_cfg.num_cameras:
        raise ValueError(
            f"batch has {len(present)} cameras {present} but the model expects "
            f"num_cameras={model_cfg.num_cameras}"
        )

    first = obs[present[0]]
    b = first.shape[0]
    cam_frames, cam_masks = [], []
    for key in present:
        imgs = np.asarray(obs[key])
        if imgs.ndim == 5:  # [B, T, H, W, C] -> current frame
            frame = imgs[:, -1]
        elif imgs.ndim == 4:  # already [B, H, W, C]
            frame = imgs
        else:
            raise ValueError(f"{key}: unexpected image rank {imgs.ndim}")
        cam_frames.append(frame)
        # an all-zero frame is a dropped/padding camera (image_dropout)
        cam_masks.append(frame.reshape(b, -1).any(axis=-1))

    h, w, c = cam_frames[0].shape[1:]
    n_missing = model_cfg.num_cameras - len(cam_frames)
    for _ in range(n_missing):
        cam_frames.append(np.zeros((b, h, w, c), cam_frames[0].dtype))
        cam_masks.append(np.zeros((b,), bool))

    stacked = np.stack(cam_frames, axis=1)  # [B, K, H, W, C] uint8
    # fused native u8 -> [-1,1] f32 (one pass instead of cast+mul+sub)
    images = native.normalize_u8(stacked)
    img_masks = np.stack(cam_masks, axis=1)  # [B, K]

    texts = [
        s.decode() if isinstance(s, bytes) else str(s)
        for s in batch["task"]["language_instruction"]
    ]
    lang_tokens, lang_masks = tokenizer(texts, model_cfg.tokenizer_max_length)

    state = np.zeros((b, model_cfg.max_state_dim), np.float32)
    if "proprio" in batch["observation"]:  # absent when load_proprio=false
        proprio = batch["observation"]["proprio"][:, -1]  # last history frame
        sd = min(proprio.shape[-1], model_cfg.max_state_dim)
        state[:, :sd] = proprio[:, :sd]

    out = {
        "images": images,
        "img_masks": img_masks,
        "lang_tokens": lang_tokens,
        "lang_masks": lang_masks,
        "state": state,
    }
    if "action" in batch:
        act = batch["action"][:, -1]  # [B, horizon, dim] (last history frame)
        actions = np.zeros((b, model_cfg.chunk_size, model_cfg.max_action_dim), np.float32)
        h = min(act.shape[1], model_cfg.chunk_size)
        ad = min(act.shape[-1], model_cfg.max_action_dim)
        actions[:, :h, :ad] = act[:, :h, :ad]
        out["actions"] = actions
        pad = batch.get("action_pad_mask")
        if pad is not None:
            # [B, horizon, dim] -> a chunk frame is padding if NO dim is valid
            valid = pad[:, -1][:, :h].any(axis=-1)
            action_is_pad = np.ones((b, model_cfg.chunk_size), bool)
            action_is_pad[:, :h] = ~valid
            out["action_is_pad"] = action_is_pad
    return out


# model types whose compute_loss provably never differentiates through the
# frozen tower (pi0: predict_velocity_frozen_prefix stop-gradients the whole
# prefix K/V) — the only ones where quantize_frozen_int8 is sound
_QUANTIZE_FROZEN_SAFE = {"pi0"}


class Trainer:
    """Model-agnostic flow-matching VLA trainer (pi0 / mvla families)."""

    def __init__(self, cfg: TrainPipelineConfig):
        from intact_tpu.parallel.distributed import initialize as dist_init

        dist_init()  # idempotent multi-host setup (no-op single process)
        self.cfg = cfg
        self.main_rank = jax.process_index() == 0
        self.logger = setup_logger(self.main_rank, name="trainer")
        set_seed_everywhere(cfg.seed)

        self.model_cfg = cfg.make_model_config()
        # model module resolved from the registry (pi0 / mvla / ...): must
        # expose init / compute_loss / sample_actions
        self.model = importlib.import_module(
            model_registry.get(cfg.model_type)["module"]
        )
        self.policy = cm.DtypePolicy(
            param_dtype=jnp.float32,
            compute_dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
        )

        self.mesh = make_mesh(MeshConfig(cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor))
        self.logger.info("mesh: %s", dict(self.mesh.shape))

        # ---- optimizer (freeze masks replace requires_grad surgery) ----
        opt_cfg = optimizer_config_from_model_json(cfg.model_cfg, cfg)
        n_batch_devices = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        accum = max(1, cfg.global_batch_size // (cfg.per_device_batch_size * n_batch_devices))
        effective_global = accum * cfg.per_device_batch_size * n_batch_devices
        if effective_global != cfg.global_batch_size:
            raise ValueError(
                f"global_batch_size={cfg.global_batch_size} is not a "
                f"multiple of the micro batch "
                f"{cfg.per_device_batch_size * n_batch_devices} "
                f"(per_device_batch_size={cfg.per_device_batch_size} x "
                f"{n_batch_devices} data*fsdp devices); training would "
                f"silently run at effective global batch {effective_global}. "
                "Adjust global_batch_size or per_device_batch_size."
            )
        import dataclasses as _dc

        opt_cfg = _dc.replace(opt_cfg, grad_accumulation_steps=accum)
        self.opt_cfg = opt_cfg
        self.micro_batch_size = cfg.per_device_batch_size * n_batch_devices

        params_template = jax.eval_shape(
            lambda k: self.model.init(k, self.model_cfg), jax.random.key(cfg.seed)
        )
        frozen_mask = self._freeze_mask(params_template)

        if cfg.quantize_frozen_int8:
            # int8 frozen tower is only grad-safe where NO gradient flows
            # through the quantized matmuls: pi0's train_expert_only fast
            # path runs the tower forward-only under stop_gradient. Models
            # that train THROUGH the frozen tower (MVLA metaqueries) must
            # not quantize it — the activation-quant round() has zero
            # gradient and would silently kill their training signal.
            if cfg.model_type not in _QUANTIZE_FROZEN_SAFE or not getattr(
                self.model_cfg, "train_expert_only", False
            ):
                raise ValueError(
                    "quantize_frozen_int8 requires a model whose loss never "
                    "differentiates through the frozen tower (supported: "
                    f"{sorted(_QUANTIZE_FROZEN_SAFE)} with train_expert_only"
                    f"=true); got model_type={cfg.model_type!r}, "
                    "train_expert_only="
                    f"{getattr(self.model_cfg, 'train_expert_only', False)}"
                )

        # Mixed fine-tune precision: frozen subtrees carry no optimizer state
        # and never update, so fp32 masters buy nothing — store them bf16
        # (compute is bf16 anyway) and keep fp32 only on trainable leaves.
        # Halves HBM for the frozen 3B VLM in expert-only fine-tunes; this is
        # also exactly what bench.py --mode train measures.
        if cfg.master_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"master_dtype must be float32|bfloat16, got {cfg.master_dtype!r}")
        self.bf16_masters = cfg.master_dtype == "bfloat16" and cfg.use_bf16
        if self.bf16_masters:
            # reference joint-recipe precision (model.to(bf16) then
            # AdamW8bit, trainer.py:133-140): EVERYTHING stored bf16; the
            # train step applies updates with stochastic rounding
            def fp_init(k):
                return jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16),
                    self.model.init(k, self.model_cfg),
                )
        elif frozen_mask is not None and cfg.use_bf16:
            fp_mask = frozen_mask

            def _cast(x, trainable):
                return x if trainable else x.astype(jnp.bfloat16)

            def fp_init(k):
                return jax.tree.map(
                    _cast, self.model.init(k, self.model_cfg), fp_mask
                )
        else:
            def fp_init(k):
                return self.model.init(k, self.model_cfg)

        if cfg.quantize_frozen_int8:
            # frozen tower kernels -> int8 (W8A8 on the MXU: ~2x bf16
            # prefill throughput); the trainable expert stays float. The
            # param tree structure changes (kernel -> kernel_q/kernel_scale
            # under frozen blocks), so the freeze mask and optimizer are
            # built on the quantized template.
            fp_mask_q = frozen_mask

            def model_init(k):
                return cm.quantize_frozen(fp_init(k), fp_mask_q)
        else:
            model_init = fp_init

        params_template = jax.eval_shape(model_init, jax.random.key(cfg.seed))
        if cfg.quantize_frozen_int8:
            frozen_mask = self._freeze_mask(params_template)
        self.tx, self.lr_schedule = make_optimizer(opt_cfg, frozen_mask)

        # ---- params: init sharded on the mesh (never materialized on one
        # device — jit with out_shardings does a sharded init) ----
        from intact_tpu.parallel.sharding import param_shardings

        p_shardings = param_shardings(params_template, self.mesh)
        init_fn = jax.jit(model_init, out_shardings=p_shardings)
        params = init_fn(jax.random.key(cfg.seed))

        # float-checkpoint loading support for the quantized mode: restore
        # into the pre-quant template, then quantize on device
        self._prequant = None
        if cfg.quantize_frozen_int8:
            fp_template = jax.eval_shape(fp_init, jax.random.key(cfg.seed))
            fp_shardings = param_shardings(fp_template, self.mesh)
            self._prequant = (
                fp_template,
                fp_shardings,
                jax.jit(
                    lambda p: cm.quantize_frozen(p, fp_mask_q),
                    out_shardings=p_shardings,
                ),
            )

        if cfg.fused_update:
            # fused backward+optimizer (train/fused_joint.py): the only way
            # the full-tower joint recipe fits a single 16 GB chip. The
            # FusedTrainState is carried as a TrainState VIEW so the
            # checkpoint/validate/log machinery is unchanged.
            from intact_tpu.train import fused_joint as fj

            if cfg.model_type != "pi0" or getattr(
                    self.model_cfg, "train_expert_only", False):
                raise ValueError(
                    "fused_update is the pi0 joint-recipe step (full-tower "
                    "gradients); use the standard path for expert-only or "
                    "other families")
            if cfg.quantize_frozen_int8:
                raise ValueError("fused_update trains the tower; "
                                 "quantize_frozen_int8 is unsound with it")
            if cfg.freeze_vlm or self.model_cfg.freeze_vision_encoder:
                raise ValueError(
                    "fused_update implements the joint recipe's freeze set "
                    "(embedding only); freeze_vlm/freeze_vision_encoder "
                    "need the standard path")
            if accum > 1:
                raise ValueError(
                    "fused_update applies each layer's update inside the "
                    "backward — gradient accumulation would need the full "
                    "gradient tree the mode exists to avoid. Reach the "
                    "global batch with data-parallel chips "
                    f"(global_batch_size={cfg.global_batch_size} needs "
                    f"accumulation {accum} at this mesh/micro-batch).")

            def fused_init(p):
                return fj.to_train_state(fj.init_fused_state(p, cfg.seed))

            state_template = jax.eval_shape(fused_init, params)
            self.shardings = state_shardings(state_template, self.mesh)
            self.state = jax.jit(
                fused_init, out_shardings=self.shardings, donate_argnums=(0,)
            )(params)
            del params, state_template
        else:
            # shardings from shapes, then a jitted + donated state init:
            # eager tx.init would chain per-leaf transients (fp32 zero
            # moments, quantization indices) that OOM a 3B init on one chip
            state_template = jax.eval_shape(
                lambda p: init_train_state(p, self.tx, seed=cfg.seed), params
            )
            self.shardings = state_shardings(state_template, self.mesh)
            self.state = jax.jit(
                lambda p: init_train_state(p, self.tx, seed=cfg.seed),
                out_shardings=self.shardings,
                donate_argnums=(0,),
            )(params)
            del params, state_template

        self.batch_shard = batch_sharding(self.mesh)

        def loss_fn(p, key, batch):
            return self.model.compute_loss(p, key, batch, self.model_cfg, self.policy)

        if cfg.remat and getattr(self.model_cfg, "train_expert_only", False):
            # the frozen-prefix fast path compiles no tower backward, so
            # remat stores ~nothing and costs ~2x step time (46.3 vs 89.6
            # samples/s on v5e at batch 48) — worth a loud hint
            self.logger.warning(
                "remat=true with train_expert_only: the fast path has no "
                "tower backward, rematerialization is pure recompute "
                "(~2x step time) — set remat: false unless memory-bound"
            )

        if cfg.fused_update:
            from intact_tpu.train import fused_joint as fj

            fused_step = fj.make_fused_joint_step(
                self.model_cfg, self.opt_cfg, self.policy,
                stochastic_rounding=self.bf16_masters,
            )

            def ts_step(ts, batch):
                fs, metrics = fused_step(fj.from_train_state(ts), batch)
                return fj.to_train_state(fs), metrics

            self.train_step = jit_train_step(
                ts_step, self.mesh, self.shardings, self.batch_shard)
        else:
            self.train_step = jit_train_step(
                make_train_step(loss_fn, self.tx, self.policy,
                                remat=cfg.remat,
                                trainable_mask=frozen_mask,
                                stochastic_rounding=self.bf16_masters),
                self.mesh, self.shardings, self.batch_shard,
            )

        def sample_fn(p, key, batch):
            return self.model.sample_actions(
                p, key, batch["images"], batch["img_masks"], batch["lang_tokens"],
                batch["lang_masks"], batch["state"], self.model_cfg, self.policy,
            )

        # out_shardings pinned: validate() takes local_rows(pred) on pods,
        # which needs batch-only partitioning — a compiler-chosen output
        # sharding may replicate or split a feature axis instead
        self.sample_fn = jax.jit(sample_fn, out_shardings=self.batch_shard)

        # ---- data ----
        self.tokenizer = make_tokenizer(
            cfg.resolve_tokenizer_path(), self.model_cfg.tokenizer_max_length,
            vocab_size=self.model_cfg.vlm.vocab_size,
        )
        stats = cfg.data.dataset_stats if cfg.data.dataset_stats else None
        # pipeline-level stats use the observation.state/action dict form
        norm_stats = None
        if stats:
            norm_stats = {
                "action": stats.get("action"),
                "proprio": stats.get("observation.state"),
            }
        # each host builds ONLY the rows its devices consume: the dataset is
        # already sharded by process, so batching it at the host-local size
        # (micro/process_count) and assembling the global array from
        # process-local data keeps the host pipeline's throughput budget
        # per-host constant as the pod grows
        if self.micro_batch_size % jax.process_count():
            raise ValueError(
                f"micro batch {self.micro_batch_size} not divisible by "
                f"{jax.process_count()} processes"
            )
        self.host_batch_size = self.micro_batch_size // jax.process_count()
        # train-time normalization must use the scheme the serving adapters
        # INVERT (EnvConfig.action_normalization_type, default "bound" =
        # p01/p99 -> [-1, 1]); adapters say "gaussian" where the data layer
        # says "normal"
        norm_type = (
            "normal" if cfg.env.action_normalization_type == "gaussian"
            else "bound"
        )
        self.train_data = InterleavedDataset(
            cfg.data, self.host_batch_size, split="train",
            shard_index=jax.process_index(), num_shards=jax.process_count(),
            stats=norm_stats, normalization_type=norm_type, seed=cfg.seed,
            image_size=self.model_cfg.vision.image_size,
            task_paraphrase=cfg.task_paraphrase,
        )
        self.val_data = InterleavedDataset(
            cfg.data, self.host_batch_size, split="val",
            shard_index=jax.process_index(), num_shards=jax.process_count(),
            stats=norm_stats, normalization_type=norm_type, seed=cfg.seed + 1,
            image_size=self.model_cfg.vision.image_size,
        )

        # ---- bookkeeping ----
        self.ckpt_root = Path(cfg.log_dir) / (cfg.name or "run") / "checkpoint"
        self.cnt_update = 0
        if cfg.load_from_checkpoint:
            self._load(cfg.load_from_checkpoint, cfg.resume_run)

        from intact_tpu.config.core import to_dict
        from intact_tpu.utils import wandb_gate

        if cfg.wandb is None:  # --wandb null: same as use_wandb=false
            from intact_tpu.config.pipeline import WandBConfig

            cfg.wandb = WandBConfig()
        self.wandb = wandb_gate.init(
            cfg.use_wandb and self.main_rank, cfg.wandb.project,
            name=cfg.name, entity=cfg.wandb.entity, run_id=cfg.wandb.run_id,
            config=to_dict(cfg),
        )
        cfg.wandb.run_id = self.wandb.id  # persisted into checkpoints
        log_device_memory("after init", self.logger)

    def _freeze_mask(self, params_template):
        """True = trainable. Mirrors reference freeze flags
        (trainer.py:109-123, configuration_mvla freeze_vision_encoder /
        train_expert_only / freeze_vlm; freeze_lm_head freezes the VLM's
        token embeddings — the lm_head itself is removed/absent in the
        flow-matching model, reference trainer.py:110-117)."""
        cfg, mc = self.cfg, self.model_cfg
        # pi0-family only, like the reference's `if model.name == "pi0"`
        # guard: pi0fast's AR head is the (tied) embedding — freezing it
        # there would stop its training signal
        freeze_embed = (
            cfg.freeze_lm_head
            and cfg.model_type == "pi0"
            and "vlm_embed" in params_template
        )
        if not (mc.freeze_vision_encoder or cfg.freeze_vlm
                or mc.train_expert_only or freeze_embed):
            return None
        mask = jax.tree.map(lambda _: True, params_template)
        if freeze_embed:
            mask["vlm_embed"] = jax.tree.map(lambda _: False, mask["vlm_embed"])
        if mc.freeze_vision_encoder or mc.train_expert_only or cfg.freeze_vlm:
            if mc.freeze_vision_encoder or mc.train_expert_only:
                mask["siglip"] = jax.tree.map(lambda _: False, mask["siglip"])
            if cfg.freeze_vlm or mc.train_expert_only:
                mask["vlm"] = jax.tree.map(lambda _: False, mask["vlm"])
                mask["vlm_embed"] = jax.tree.map(lambda _: False, mask["vlm_embed"])
                if mc.freeze_vision_encoder or mc.train_expert_only:
                    mask["img_proj"] = jax.tree.map(lambda _: False, mask["img_proj"])
        # MVLA opt-in (config.freeze_metaqueries): freeze the metaqueries so
        # the model's stop-gradient at the VLM boundary is consistent with
        # the optimizer mask
        if getattr(mc, "freeze_metaqueries", False) and "metaquery" in mask:
            mask["metaquery"] = jax.tree.map(lambda _: False, mask["metaquery"])
        return mask

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    def train(self):
        from intact_tpu.utils.prefetch import PrefetchIterator

        cfg = self.cfg
        n_micro = cfg.n_updates * self.opt_cfg.grad_accumulation_steps
        timer = Timer()
        metric_window: list[dict] = []
        # host pipeline (tf.data -> tokenize -> device_put) runs one batch
        # ahead on a worker thread while the device executes the current step
        from intact_tpu.parallel import put_global_batch

        data_iter = PrefetchIterator(
            iter(self.train_data),
            prepare=lambda raw: put_global_batch(
                preprocess_batch(raw, self.tokenizer, self.model_cfg),
                self.batch_shard,
            ),
            depth=2,
        )

        self.logger.info(
            "training: %d updates x %d accumulation (micro-batch %d, global %d)",
            cfg.n_updates, self.opt_cfg.grad_accumulation_steps,
            self.micro_batch_size, cfg.global_batch_size,
        )

        for micro in range(n_micro):
            batch = next(data_iter)  # already preprocessed + device_put
            self.state, metrics = self.train_step(self.state, batch)
            metric_window.append(metrics)

            is_update = (micro + 1) % self.opt_cfg.grad_accumulation_steps == 0
            if not is_update:
                continue
            self.cnt_update += 1

            # debug profiling: chrome-trace updates 2..4 (reference had no
            # profiler at all, SURVEY.md §5.1)
            if cfg.debug and self.main_rank:
                if self.cnt_update == 2:
                    jax.profiler.start_trace(str(Path(cfg.log_dir) / "profile"))
                    self._trace_active = True
                elif self.cnt_update == 4 and self._trace_active:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    self._trace_active = False

            if self.cnt_update % cfg.log_freq == 0:
                self._log_training(metric_window, timer)
                metric_window = []
            if self.cnt_update % cfg.eval_freq == 0:
                self.validate()
            if self.cnt_update % cfg.save_model_freq == 0:
                self.save()
            if self.cnt_update >= cfg.n_updates:
                break

        # a debug run shorter than 4 updates would otherwise exit with the
        # trace unflushed — exactly the run the profile was wanted for
        if self._trace_active:
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._trace_active = False

        # the loop usually exits before the data stream does: stop the
        # prefetch worker so it doesn't linger holding device buffers
        data_iter.close()
        if self._last_saved_update != self.cnt_update:
            self.save()
        self.logger.info("training done at update %d", self.cnt_update)

    def validate(self):
        from intact_tpu.parallel import local_rows, put_global_batch

        cfg = self.cfg
        n_batches = max(1, cfg.eval_size // self.micro_batch_size)
        accs, l1s = [], []
        val_iter = iter(self.val_data)
        for i in range(n_batches):
            raw = next(val_iter)
            batch = preprocess_batch(raw, self.tokenizer, self.model_cfg)
            gt = batch.pop("actions")  # host-local rows
            batch.pop("action_is_pad", None)
            batch = put_global_batch(batch, self.batch_shard)
            pred = self.sample_fn(self.state.params, jax.random.key(1000 + i), batch)
            if jax.process_count() > 1:
                # score this host's rows against its own ground truth; the
                # cross-host mean below aggregates (reference all-reduces)
                pred = jnp.asarray(local_rows(pred))
            accs.append(np.asarray(
                get_action_accuracy(jnp.asarray(gt), pred, cfg.eval_thresholds)))
            l1s.append(float(l1_error(jnp.asarray(gt), pred)))
        accs = np.mean(accs, axis=0)
        metrics = {"l1_loss": float(np.mean(l1s)),
                   **{f"acc@{t}": float(a) for t, a in zip(cfg.eval_thresholds, accs)}}
        # cross-host mean (reference all-reduces eval metrics, trainer.py:525-538)
        from intact_tpu.parallel.distributed import process_mean

        metrics = process_mean(metrics)
        self.logger.info(
            "val @ update %d | %s",
            self.cnt_update,
            " | ".join(f"{k} {v:.4f}" for k, v in metrics.items()),
        )
        self.wandb.log(metrics, step=self.cnt_update)
        return metrics

    def _log_training(self, window: list[dict], timer: Timer):
        mean = {
            k: float(np.mean([float(m[k]) for m in window]))
            for k in self.cfg.train_log_metrics + ["grad_norm"]
            if k in window[-1]
        }
        # the adamw schedule count advances once per EMITTED update (optax
        # MultiSteps only steps the inner transform on emit), so the
        # schedule is indexed by update count — never by micro-steps
        lr = float(self.lr_schedule(self.cnt_update))
        line = " | ".join(f"{k} {v:8.5f}" for k, v in mean.items())
        self.logger.info(
            "update %6d | %s | lr %10.8f | t %5.2fs",
            self.cnt_update, line, lr, timer(),
        )
        self.wandb.log({**mean, "learning rate": lr}, step=self.cnt_update)

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------

    _last_saved_update: int = -1
    _trace_active: bool = False

    def save(self):
        path = ckpt.save_checkpoint(
            self.ckpt_root, self.state,
            aux={"wandb_id": self.cfg.wandb.run_id, "name": self.cfg.name},
            step=self.cnt_update,
        )
        self._last_saved_update = self.cnt_update
        self.logger.info("saved checkpoint %s", path)
        return path

    def _load(self, path: str, resume_run: bool):
        if self._prequant is not None and not resume_run:
            # quantize_frozen_int8 + fresh fine-tune: the checkpoint holds
            # FLOAT pretrained params — restore into the pre-quant template
            # and quantize the frozen tower on device. (Resume checkpoints
            # were written by this run's config and are already quantized.)
            fp_template, fp_shardings, quantize_fn = self._prequant
            self.state, aux = ckpt.restore_train_state(
                path, self.state, self.shardings, resume_run=False,
                params_template=fp_template, params_shardings=fp_shardings,
                params_transform=quantize_fn,
            )
        else:
            self.state, aux = ckpt.restore_train_state(
                path, self.state, self.shardings, resume_run=resume_run
            )
        self.cnt_update = int(aux.get("cnt_update", 0)) if resume_run else 0
        self.logger.info("restored %s (resume=%s, update=%d)", path, resume_run, self.cnt_update)


# Backwards-compatible name: the trainer was pi0-only before the registry
Pi0Trainer = Trainer
