"""Sharded training tests on the virtual 8-device CPU mesh.

Exercises the full multi-chip story without hardware: mesh construction,
param sharding rules, the pjit'd train step over (data, fsdp, tensor), and
that a sharded step produces the same loss as a single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.parallel import MeshConfig, make_mesh, batch_sharding, param_shardings
from intact_tpu.train.optim import OptimizerConfig, cosine_warmup_restarts, make_optimizer
from intact_tpu.train.train_step import (
    TrainState,
    init_train_state,
    jit_train_step,
    make_train_step,
    state_shardings,
)

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def make_batch(cfg, b=8, seed=1):
    ks = jax.random.split(jax.random.key(seed), 4)
    s = cfg.vision.image_size
    return {
        "images": jax.random.uniform(ks[0], (b, 1, s, s, 3), minval=-1, maxval=1),
        "img_masks": jnp.ones((b, 1), bool),
        "lang_tokens": jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 256),
        "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}

    def test_auto_data_axis(self):
        mesh = make_mesh(MeshConfig(data=-1, fsdp=4, tensor=1))
        assert mesh.shape["data"] == 2

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=3, fsdp=3, tensor=1))


class TestLocalRows:
    def test_batch_sharded_roundtrip_dedups_tensor_axis(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from intact_tpu.parallel import local_rows

        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        g = jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"))))
        out = local_rows(g)
        assert isinstance(out, np.ndarray)
        np.testing.assert_array_equal(out, x)

    def test_feature_axis_partitioning_raises(self):
        """A compiler-chosen sharding that splits a non-batch axis must be
        rejected: the start-of-batch dedup would otherwise return one
        arbitrary partial-feature block per row range."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from intact_tpu.parallel import local_rows

        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        g = jax.device_put(x, NamedSharding(mesh, P("data", "tensor")))
        with pytest.raises(ValueError, match="batch-only"):
            local_rows(g)


class TestShardingRules:
    def test_specs_divide_or_drop(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        shardings = param_shardings(params, mesh)
        # every sharding must be valid for its leaf (is_equivalent check via
        # device_put not raising)
        jax.tree.map(
            lambda p, s: jax.device_put(p, s), params, shardings
        )

    def test_big_kernel_gets_sharded(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        sh = param_shardings(params, mesh)
        spec = sh["vlm"]["blocks"]["mlp"]["gate"]["kernel"].spec
        assert tuple(spec) == (None, "fsdp", "tensor")
        # embeddings sharded too
        assert tuple(sh["vlm_embed"]["embedding"].spec) == ("tensor", "fsdp")


class TestSchedule:
    def test_warmup_then_cosine(self):
        sched = cosine_warmup_restarts(
            max_lr=1e-3, first_cycle_steps=100, warmup_steps=10, min_lr=1e-8
        )
        assert float(sched(0)) < 1e-6
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
        assert float(sched(55)) < 1e-3
        # restart: cycle resets and warms up again from min_lr
        assert float(sched(100)) < 1e-6
        np.testing.assert_allclose(float(sched(110)), 1e-3, rtol=1e-5)

    def test_gamma_decay_on_restart(self):
        sched = cosine_warmup_restarts(
            max_lr=1e-3, first_cycle_steps=10, warmup_steps=0, min_lr=0.0, gamma=0.5
        )
        np.testing.assert_allclose(float(sched(10)), 5e-4, rtol=1e-5)


class TestTrainStep:
    @pytest.fixture  # function-scoped: the sharded test donates its state
    def setup(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        opt_cfg = OptimizerConfig(lr=1e-4, warmup_steps=1, first_cycle_steps=1000)
        tx, _ = make_optimizer(opt_cfg)

        def loss_fn(p, key, batch):
            return pi0.compute_loss(p, key, batch, cfg, FP32)

        return cfg, params, tx, loss_fn

    def test_sharded_step_runs_and_matches_replicated(self, setup):
        cfg, params, tx, loss_fn = setup
        batch = make_batch(cfg)

        # single-device reference
        state0 = init_train_state(params, tx, seed=0)
        step = make_train_step(loss_fn, tx, FP32)
        ref_state, ref_metrics = jax.jit(step)(state0, batch)

        # sharded over 2x2x2
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        state = init_train_state(params, tx, seed=0)
        sh = state_shardings(state, mesh)
        state = jax.device_put(state, sh)
        sharded_batch = jax.device_put(batch, batch_sharding(mesh))
        sharded_step = jit_train_step(step, mesh, sh, batch_sharding(mesh))
        new_state, metrics = sharded_step(state, sharded_batch)

        np.testing.assert_allclose(
            float(metrics["l2_loss"]), float(ref_metrics["l2_loss"]), rtol=1e-4
        )
        assert int(new_state.step) == 1
        # params actually moved
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), new_state.params, ref_state.params
        )
        assert max(jax.tree.leaves(diff)) < 1e-4  # same update on both paths

    def test_loss_decreases(self, setup):
        cfg, params, _, loss_fn = setup
        opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=1, first_cycle_steps=10_000)
        tx, _ = make_optimizer(opt_cfg)
        batch = make_batch(cfg, b=4)

        # fixed-key eval: flow-matching training loss is stochastic in
        # (noise, time), so compare a deterministic eval before/after
        def eval_loss(p):
            return float(loss_fn(p, jax.random.key(99), batch)[0])

        before = eval_loss(params)
        state = init_train_state(params, tx, seed=0)
        step = jax.jit(make_train_step(loss_fn, tx, FP32))
        for _ in range(10):
            state, _ = step(state, batch)
        assert eval_loss(state.params) < before

    def test_frozen_mask_keeps_params_fixed(self, setup):
        cfg, params, tx0, loss_fn = setup
        opt_cfg = OptimizerConfig(lr=1e-2, warmup_steps=1, first_cycle_steps=100)
        # freeze vision encoder (reference freeze_vision_encoder flag)
        mask = jax.tree.map(lambda _: True, params)
        mask["siglip"] = jax.tree.map(lambda _: False, params["siglip"])
        tx, _ = make_optimizer(opt_cfg, frozen_mask=mask)
        state = init_train_state(params, tx, seed=0)
        step = jax.jit(make_train_step(loss_fn, tx, FP32))
        new_state, _ = step(state, make_batch(cfg, b=4))
        frozen_diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            new_state.params["siglip"], params["siglip"],
        )
        assert max(jax.tree.leaves(frozen_diff)) == 0.0
        live_diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            new_state.params["expert"], params["expert"],
        )
        assert max(jax.tree.leaves(live_diff)) > 0.0

    def test_grad_accumulation(self, setup):
        cfg, params, _, loss_fn = setup
        opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=1, first_cycle_steps=100,
                                  grad_accumulation_steps=2)
        tx, _ = make_optimizer(opt_cfg)
        state = init_train_state(params, tx, seed=0)
        step = jax.jit(make_train_step(loss_fn, tx, FP32))
        s1, _ = step(state, make_batch(cfg, b=4, seed=1))
        # after 1 micro-step params unchanged (accumulating)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1.params, params)
        assert max(jax.tree.leaves(d)) == 0.0
        s2, _ = step(s1, make_batch(cfg, b=4, seed=2))
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s2.params, params)
        assert max(jax.tree.leaves(d)) > 0.0


def _expert_only_mask(params):
    """Bool mask (True=trainable) for a pi0 expert-only fine-tune: frozen
    SigLIP+VLM tower, trainable expert + glue heads (trainer._freeze_mask)."""
    mask = jax.tree.map(lambda _: False, params)
    for name in ("expert", "state_proj", "action_in_proj", "time_mlp_in",
                 "time_mlp_out", "action_out_proj"):
        if name in mask:
            mask[name] = jax.tree.map(lambda _: True, mask[name])
    return mask


class TestQuantizedFrozenSharded:
    """quantize_frozen_int8 on the mesh: int8 kernel_q leaves shard under
    the same rules as float kernels, and the sharded quantized train step
    matches the single-device quantized step."""

    def test_kernel_q_sharding_rules(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        qparams = cm.quantize_frozen(params, _expert_only_mask(params))
        mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
        sh = param_shardings(qparams, mesh)
        assert tuple(sh["vlm"]["blocks"]["mlp"]["gate"]["kernel_q"].spec) == \
            (None, "fsdp", "tensor")
        assert tuple(sh["vlm"]["blocks"]["attn"]["o"]["kernel_q"].spec) == \
            (None, "tensor", "fsdp")
        # trainable expert kernels untouched by quantization, still sharded
        assert tuple(sh["expert"]["blocks"]["mlp"]["gate"]["kernel"].spec) == \
            (None, "fsdp", "tensor")
        jax.tree.map(lambda p, s: jax.device_put(p, s), qparams, sh)

    def test_quantized_sharded_step_matches_single_device(self):
        import dataclasses

        cfg = dataclasses.replace(Pi0Config.tiny(), train_expert_only=True)
        params = pi0.init(jax.random.key(0), cfg)
        fp_mask = _expert_only_mask(params)
        qparams = cm.quantize_frozen(params, fp_mask)
        q_mask = _expert_only_mask(qparams)  # rebuilt over kernel_q structure

        opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=1, first_cycle_steps=100)
        tx, _ = make_optimizer(opt_cfg, frozen_mask=q_mask)

        def loss_fn(p, key, batch):
            return pi0.compute_loss(p, key, batch, cfg, FP32)

        batch = make_batch(cfg, b=8)
        step = make_train_step(loss_fn, tx, FP32, trainable_mask=q_mask)

        ref_state, ref_metrics = jax.jit(step)(
            init_train_state(qparams, tx, seed=0), batch
        )

        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        state = init_train_state(qparams, tx, seed=0)
        sh = state_shardings(state, mesh)
        state = jax.device_put(state, sh)
        sharded_batch = jax.device_put(batch, batch_sharding(mesh))
        sharded_step = jit_train_step(step, mesh, sh, batch_sharding(mesh))
        new_state, metrics = sharded_step(state, sharded_batch)

        np.testing.assert_allclose(
            float(metrics["l2_loss"]), float(ref_metrics["l2_loss"]), rtol=1e-4
        )
        # int8 tower bit-identical on both paths; expert update matches
        np.testing.assert_array_equal(
            np.asarray(new_state.params["vlm"]["blocks"]["attn"]["q"]["kernel_q"]),
            np.asarray(qparams["vlm"]["blocks"]["attn"]["q"]["kernel_q"]),
        )
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
            new_state.params["expert"], ref_state.params["expert"],
        )
        assert max(jax.tree.leaves(d)) < 1e-4


class TestFrozenWithAccumulation:
    def test_accumulator_covers_only_trainable_leaves(self):
        """MultiSteps sits INSIDE the trainable partition (optim.py): with a
        frozen tower + accumulation, the accumulator (+Adam moments) buffers
        cover only trainable leaves — 3x trainable bytes, NOT +1x total."""
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        mask = _expert_only_mask(params)
        opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=1, first_cycle_steps=100,
                                  grad_accumulation_steps=2)
        tx, _ = make_optimizer(opt_cfg, frozen_mask=mask)
        state = init_train_state(params, tx, seed=0)

        trainable_bytes = sum(
            leaf.size * 4
            for leaf, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
            if m
        )
        opt_bytes = sum(
            np.asarray(leaf).nbytes for leaf in jax.tree.leaves(state.opt_state)
        )
        # mu + nu + acc_grads = 3x trainable (+ tiny counters); if the
        # accumulator covered the whole tree this would exceed 3x by ~1x
        # of the (much larger) frozen tower
        assert opt_bytes < 3 * trainable_bytes + 4096

        def loss_fn(p, key, batch):
            return pi0.compute_loss(p, key, batch, cfg, FP32)

        step = jax.jit(make_train_step(loss_fn, tx, FP32, trainable_mask=mask))
        batch = make_batch(cfg, b=4)
        s1, _ = step(state, batch)
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s1.params, params)
        assert max(jax.tree.leaves(d)) == 0.0  # still accumulating
        s2, _ = step(s1, make_batch(cfg, b=4, seed=2))
        frozen_d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s2.params["siglip"], params["siglip"],
        )
        assert max(jax.tree.leaves(frozen_d)) == 0.0
        live_d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s2.params["expert"], params["expert"],
        )
        assert max(jax.tree.leaves(live_d)) > 0.0


class TestShardedServing:
    def test_policy_on_mesh_matches_single_device(self):
        """Pi0Policy(mesh=...) shards params (fsdp/tensor) and batches
        (data, fsdp) and produces the same actions as the unsharded policy —
        multi-chip serving for the v5e-8 aggregate-throughput target."""
        import numpy as np

        from intact_tpu.models.pi0.config import Pi0Config
        from intact_tpu.models.pi0.policy import Pi0Policy
        from intact_tpu.parallel import MeshConfig, make_mesh

        cfg = Pi0Config.tiny()
        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))

        sharded = Pi0Policy(cfg, seed=0, use_bf16=False, mesh=mesh,
                            tokenizer_path="hash")
        plain = Pi0Policy(cfg, seed=0, use_bf16=False, tokenizer_path="hash")

        # params really are distributed
        q = sharded.params["vlm"]["blocks"]["attn"]["q"]["kernel"]
        assert len(q.sharding.device_set) > 1

        rng = np.random.default_rng(0)
        s = cfg.vision.image_size
        batch = {
            "image": rng.uniform(-1, 1, (8, s, s, 3)).astype(np.float32),
            "state": rng.normal(size=(8, 7)).astype(np.float32),
            "task": ["put the carrot on the plate"] * 8,
        }
        a_sharded = sharded.sample_action_chunk(dict(batch))
        a_plain = plain.sample_action_chunk(dict(batch))
        np.testing.assert_allclose(a_sharded, a_plain, rtol=2e-4, atol=2e-4)

    def test_sharded_serving_pads_odd_batches(self):
        import numpy as np

        from intact_tpu.models.pi0.config import Pi0Config
        from intact_tpu.models.pi0.policy import Pi0Policy
        from intact_tpu.parallel import MeshConfig, make_mesh

        cfg = Pi0Config.tiny()
        mesh = make_mesh(MeshConfig(data=8, fsdp=1, tensor=1))
        policy = Pi0Policy(cfg, seed=0, use_bf16=False, mesh=mesh,
                           tokenizer_path="hash")
        rng = np.random.default_rng(1)
        s = cfg.vision.image_size
        for b in (1, 3, 8):
            batch = {
                "image": rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32),
                "state": rng.normal(size=(b, 7)).astype(np.float32),
                "task": ["x"] * b,
            }
            out = policy.sample_action_chunk(batch)
            assert out.shape[0] == b


class TestShardedMVLA:
    def test_mvla_sharded_step_matches_replicated(self):
        """The sharding rules are family-generic: an MVLA (metaquery +
        connector + cross-attn expert) training step over the 2x2x2 mesh
        matches the single-device step."""
        from intact_tpu.models.mvla import MVLAConfig, model as mvla

        cfg = MVLAConfig.tiny()
        params = mvla.init(jax.random.key(0), cfg)
        tx, _ = make_optimizer(OptimizerConfig(lr=1e-4, warmup_steps=1,
                                               first_cycle_steps=1000))

        def loss_fn(p, key, batch):
            return mvla.compute_loss(p, key, batch, cfg, FP32)

        s = cfg.vision.image_size
        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.uniform(-1, 1, (8, 1, s, s, 3)), jnp.float32),
            "img_masks": jnp.ones((8, 1), bool),
            "lang_tokens": jnp.asarray(rng.integers(0, 30, (8, cfg.tokenizer_max_length)), jnp.int32),
            "lang_masks": jnp.ones((8, cfg.tokenizer_max_length), bool),
            "state": jnp.asarray(rng.normal(size=(8, cfg.max_state_dim)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(8, cfg.chunk_size, cfg.max_action_dim)), jnp.float32),
        }

        state0 = init_train_state(params, tx, seed=0)
        step = make_train_step(loss_fn, tx, FP32)
        _, ref_metrics = jax.jit(step)(state0, batch)

        mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
        state = init_train_state(params, tx, seed=0)
        sh = state_shardings(state, mesh)
        state = jax.device_put(state, sh)
        sharded_step = jit_train_step(step, mesh, sh, batch_sharding(mesh))
        _, metrics = sharded_step(state, jax.device_put(batch, batch_sharding(mesh)))

        np.testing.assert_allclose(
            float(metrics["l2_loss"]), float(ref_metrics["l2_loss"]), rtol=1e-4
        )


class TestShardedMagmaServing:
    def test_magma_wrapper_on_mesh_matches_single_device(self):
        """Magma-8B bf16 (17.8 GB) exceeds one v5e's HBM, so bf16 serving is
        a SHARDED configuration: on a multi-device host the native wrapper
        spreads params over the (data, fsdp, tensor) mesh and the fused
        batch over (data, fsdp). The sharded decode must match the
        single-device decode token for token."""
        from pathlib import Path

        from intact_tpu.config.pipeline import (
            EnvConfig,
            EvalConfig,
            TrainPipelineConfig,
        )
        from intact_tpu.serve.policy_wrapper import MagmaNativePolicyWrapper

        repo = Path(__file__).resolve().parent.parent
        cfg = TrainPipelineConfig(
            name="sharded_magma",
            model_cfg={"type": "magma_native_tiny"},
            use_bf16=False,
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="BridgeSimplerAdapter",
                recording=False,
                action_step=4,
                max_batch_size=8,
            ),
            env=EnvConfig(
                dataset_statistics_path=str(
                    repo / "config/dataset/bridge_statistics.json"
                ),
                image_size=(28, 28),
            ),
        )
        cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor = 2, 2, 2
        wrapper = MagmaNativePolicyWrapper(cfg)  # 8 CPU devices -> mesh
        assert wrapper.mesh is not None
        q = wrapper.params["lm"]["blocks"]["attn"]["q"]["kernel"]
        assert len(q.sharding.device_set) > 1  # params really distributed

        # single-device reference: same config, mesh suppressed
        plain = MagmaNativePolicyWrapper.__new__(MagmaNativePolicyWrapper)
        import jax as _jax
        import unittest.mock as mock

        with mock.patch.object(_jax, "device_count", return_value=1):
            plain.__init__(cfg)
        assert plain.mesh is None

        rng = np.random.default_rng(0)
        obs = {
            "observation.images.top": rng.integers(
                0, 255, (64, 64, 3), dtype=np.uint8
            ),
            "observation.state": {
                "agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8])}
            },
            "task": "put the carrot on the plate",
        }
        # odd fused sizes exercise the mesh-divisor padding (1 and 3 rows)
        for n in (1, 3):
            items_s = [
                (wrapper.session.preprocess(obs), wrapper.session)
                for _ in range(n)
            ]
            items_p = [
                (plain.session.preprocess(obs), plain.session)
                for _ in range(n)
            ]
            out_s = wrapper.infer_batch(items_s)
            out_p = plain.infer_batch(items_p)
            for a, b in zip(out_s, out_p):
                assert not isinstance(a, Exception), a
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestShardedSpatialVLAServing:
    def test_spatialvla_wrapper_on_mesh_matches_single_device(self):
        """SpatialVLA-4B serving shards like Magma (params over the mesh,
        fused batch over (data, fsdp)) for v5e-8 throughput scaling; the
        sharded spatial-token decode must match single-device."""
        from pathlib import Path

        from intact_tpu.config.pipeline import (
            EnvConfig,
            EvalConfig,
            TrainPipelineConfig,
        )
        from intact_tpu.serve.policy_wrapper import SpatialVLANativePolicyWrapper

        repo = Path(__file__).resolve().parent.parent
        cfg = TrainPipelineConfig(
            name="sharded_svla",
            model_cfg={"type": "spatialvla_native_tiny"},
            use_bf16=False,
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="BridgeSimplerAdapter",
                recording=False,
                action_step=4,
                max_batch_size=8,
            ),
            env=EnvConfig(
                dataset_statistics_path=str(
                    repo / "config/dataset/bridge_statistics.json"
                ),
                image_size=(28, 28),
            ),
        )
        cfg.mesh.data, cfg.mesh.fsdp, cfg.mesh.tensor = 2, 2, 2
        wrapper = SpatialVLANativePolicyWrapper(cfg)
        assert wrapper.mesh is not None
        q = wrapper.params["lm"]["blocks"]["attn"]["q"]["kernel"]
        assert len(q.sharding.device_set) > 1

        import unittest.mock as mock

        import jax as _jax

        plain = SpatialVLANativePolicyWrapper.__new__(SpatialVLANativePolicyWrapper)
        with mock.patch.object(_jax, "device_count", return_value=1):
            plain.__init__(cfg)
        assert plain.mesh is None

        rng = np.random.default_rng(0)
        obs = {
            "observation.images.top": rng.integers(
                0, 255, (64, 64, 3), dtype=np.uint8
            ),
            "observation.state": {
                "agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8])}
            },
            "task": "put the carrot on the plate",
        }
        for n in (1, 3):
            out_s = wrapper.infer_batch(
                [(wrapper.new_session().preprocess(obs), wrapper.new_session())
                 for _ in range(n)]
            )
            out_p = plain.infer_batch(
                [(plain.new_session().preprocess(obs), plain.new_session())
                 for _ in range(n)]
            )
            for a, b in zip(out_s, out_p):
                assert not isinstance(a, Exception), a
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
