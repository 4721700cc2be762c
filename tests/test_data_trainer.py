"""Data pipeline + trainer integration tests (tiny model, synthetic data)."""

import dataclasses

import numpy as np
import pytest

from intact_tpu.config.pipeline import (
    DataConfig,
    TrainDataConfig,
    TrainPipelineConfig,
)
from intact_tpu.data.dataset import InterleavedDataset
from intact_tpu.data.synthetic import SyntheticBridgeDataset
from intact_tpu.data.transforms import (
    binarize_gripper_actions,
    chunk_act_obs,
    invert_gripper_actions,
    rel2abs_gripper_actions,
)


class TestChunking:
    def test_chunk_shapes_and_padding(self):
        T, D = 10, 7
        traj = {
            "observation": {"image_primary": np.zeros((T, 8, 8, 3), np.uint8),
                            "proprio": np.arange(T * D, dtype=np.float32).reshape(T, D)},
            "task": {},
            "action": np.arange(T * D, dtype=np.float32).reshape(T, D),
        }
        out = chunk_act_obs(traj, window_size=2, action_horizon=4)
        assert out["action"].shape == (T, 2, 4, D)
        assert out["observation"]["proprio"].shape == (T, 2, D)
        # first frame history is padding
        assert not out["observation"]["timestep_pad_mask"][0, 0]
        assert out["observation"]["timestep_pad_mask"][0, 1]
        # future actions clamp at the end and are marked padding past goal
        np.testing.assert_array_equal(out["action"][T - 1, 1, 3], traj["action"][T - 1])
        assert not out["action_pad_mask"][T - 1, 1, 3].any()
        assert out["action_pad_mask"][0, 1, 0].all()

    def test_gripper_relabel(self):
        cont = np.array([1.0, 0.5, 0.0, 0.5, 1.0])
        binarized = binarize_gripper_actions(cont)
        np.testing.assert_array_equal(binarized, [1, 0, 0, 1, 1])
        np.testing.assert_array_equal(invert_gripper_actions(binarized), [0, 1, 1, 0, 0])
        rel = np.array([0.0, 1.0, 0.0, -1.0, 0.0])
        np.testing.assert_array_equal(rel2abs_gripper_actions(rel), [1, 1, 1, 0, 0])


class TestSynthetic:
    def test_episode_deterministic(self):
        ds = SyntheticBridgeDataset(image_size=32, action_horizon=4, seed=3)
        e1, e2 = ds.episode(5), ds.episode(5)
        np.testing.assert_array_equal(e1["action"], e2["action"])
        assert not np.array_equal(e1["action"], ds.episode(6)["action"])

    def test_batches_schema(self):
        ds = SyntheticBridgeDataset(image_size=32, action_horizon=4)
        batch = next(ds.batches(batch_size=3))
        assert batch["observation"]["image_primary"].shape == (3, 1, 32, 32, 3)
        assert batch["observation"]["image_primary"].dtype == np.uint8
        assert batch["action"].shape == (3, 1, 4, 7)
        assert batch["action_pad_mask"].shape == (3, 1, 4, 7)
        assert batch["task"]["language_instruction"].dtype.kind == "S"

    def test_host_sharding_disjoint(self):
        ds = SyntheticBridgeDataset(image_size=16, action_horizon=2)
        b0 = next(ds.batches(4, shard_index=0, num_shards=2))
        b1 = next(ds.batches(4, shard_index=1, num_shards=2))
        assert not np.array_equal(b0["action"], b1["action"])


class TestInterleavedDataset:
    def test_normalization_applied(self):
        stats = {
            "action": {"mean": [0.0] * 7, "std": [2.0] * 7,
                       "p01": [-1.0] * 7, "p99": [1.0] * 7},
            "proprio": {"mean": [0.0] * 7, "std": [1.0] * 7,
                        "p01": [-1.0] * 7, "p99": [1.0] * 7},
        }
        dc = DataConfig(train=TrainDataConfig(action_horizon=4), backend="synthetic")
        ds = InterleavedDataset(dc, batch_size=2, stats=stats, normalization_type="normal")
        raw_ds = InterleavedDataset(dc, batch_size=2, stats=None)
        b = next(iter(ds))
        raw = next(iter(raw_ds))
        # non-gripper dims divided by std=2; gripper untouched
        np.testing.assert_allclose(b["action"][..., :6], raw["action"][..., :6] / 2, rtol=1e-5)
        np.testing.assert_allclose(b["action"][..., 6], raw["action"][..., 6], rtol=1e-5)
        assert len(ds) == 2_195_527


class TestTrainerEndToEnd:
    @pytest.fixture(scope="class")
    def pipeline_cfg(self, tmp_path_factory):
        cfg = TrainPipelineConfig(
            name="tiny_e2e",
            model_cfg={"type": "pi0"},
            global_batch_size=8,
            per_device_batch_size=1,
            n_updates=3,
            save_model_freq=100,
            log_freq=1,
            eval_freq=2,
            eval_size=4,
            use_bf16=False,
        )
        cfg.log_dir = tmp_path_factory.mktemp("log")
        return cfg

    def test_trainer_runs_and_checkpoints(self, pipeline_cfg, monkeypatch):
        # swap the 3B config for the tiny one
        from intact_tpu.config import pipeline as cp
        from intact_tpu.models.pi0.config import Pi0Config

        monkeypatch.setattr(
            cp, "pi0_config_from_json", lambda d: Pi0Config.tiny()
        )
        from intact_tpu.train.trainer import Pi0Trainer

        trainer = Pi0Trainer(pipeline_cfg)
        trainer.train()
        assert trainer.cnt_update == 3
        # one real step must produce a finite loss (guards tokenizer/vocab
        # mismatches that surface as NaN)
        raw = next(iter(trainer.train_data))
        from intact_tpu.train.trainer import preprocess_batch
        import jax as _jax

        batch = preprocess_batch(raw, trainer.tokenizer, trainer.model_cfg)
        from intact_tpu.models.pi0 import model as pi0

        loss, _ = pi0.compute_loss(
            trainer.state.params, _jax.random.key(0), batch,
            trainer.model_cfg, trainer.policy,
        )
        assert np.isfinite(float(loss)), "training loss is not finite"

        # checkpoint written with the step_{n} contract
        from intact_tpu.train.checkpoint import list_steps

        steps = list_steps(trainer.ckpt_root)
        assert steps == [3]

        # resume restores the counter
        cfg2 = dataclasses.replace(pipeline_cfg)
        cfg2.load_from_checkpoint = str(trainer.ckpt_root)
        cfg2.finalize()
        trainer2 = Pi0Trainer(cfg2)
        assert trainer2.cnt_update == 3
        p_old = trainer.state.params["expert"]["final_norm"]["scale"]
        p_new = trainer2.state.params["expert"]["final_norm"]["scale"]
        np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))


class TestMixedFinetunePrecision:
    def test_frozen_subtrees_stored_bf16(self, tmp_path, monkeypatch):
        """With use_bf16 + freeze flags, frozen params (no optimizer state,
        bf16 compute anyway) are stored bf16; trainable leaves keep fp32
        masters — the policy bench.py --mode train measures."""
        import jax.numpy as jnp

        from intact_tpu.config import pipeline as cp
        from intact_tpu.models.pi0.config import Pi0Config
        import dataclasses as _dc

        monkeypatch.setattr(
            cp, "pi0_config_from_json",
            lambda d: _dc.replace(Pi0Config.tiny(), train_expert_only=True),
        )
        from intact_tpu.train.trainer import Trainer

        cfg = TrainPipelineConfig(
            name="mixed_prec",
            model_cfg={"type": "pi0"},
            global_batch_size=8,
            per_device_batch_size=1,
            n_updates=1,
            use_bf16=True,
        )
        cfg.log_dir = tmp_path
        trainer = Trainer(cfg)
        p = trainer.state.params
        assert p["vlm"]["blocks"]["attn"]["q"]["kernel"].dtype == jnp.bfloat16
        assert p["siglip"]["patch_embed"]["kernel"].dtype == jnp.bfloat16
        assert p["expert"]["blocks"]["attn"]["q"]["kernel"].dtype == jnp.float32
        assert p["action_out_proj"]["kernel"].dtype == jnp.float32
        # one step still runs
        trainer.train()
        assert trainer.cnt_update == 1


class TestQuantizeFrozenInt8:
    """quantize_frozen_int8: expert-only fine-tunes store the frozen tower's
    block kernels int8 (W8A8 forward on the int8 MXU); the trainable expert
    keeps fp32 masters. Grad-safe only because pi0's train_expert_only path
    never differentiates through the tower."""

    def _patch_tiny(self, monkeypatch, train_expert_only=True):
        import dataclasses as _dc

        from intact_tpu.config import pipeline as cp
        from intact_tpu.models.pi0.config import Pi0Config

        monkeypatch.setattr(
            cp, "pi0_config_from_json",
            lambda d: _dc.replace(Pi0Config.tiny(), train_expert_only=train_expert_only),
        )

    def _cfg(self, log_dir, **kw):
        cfg = TrainPipelineConfig(
            name="q8_frozen",
            model_cfg={"type": "pi0"},
            global_batch_size=8,
            per_device_batch_size=1,
            n_updates=1,
            log_freq=1,
            use_bf16=True,
            **kw,
        )
        cfg.log_dir = log_dir
        return cfg

    def test_frozen_tower_int8_expert_float_and_step_runs(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        self._patch_tiny(monkeypatch)
        from intact_tpu.train.trainer import Trainer

        trainer = Trainer(self._cfg(tmp_path, quantize_frozen_int8=True))
        p = trainer.state.params
        # frozen tower: block kernels are int8 + per-channel scales
        assert p["vlm"]["blocks"]["attn"]["q"]["kernel_q"].dtype == jnp.int8
        assert "kernel_scale" in p["vlm"]["blocks"]["attn"]["q"]
        assert p["siglip"]["blocks"]["mlp"]["fc1"]["kernel_q"].dtype == jnp.int8
        # trainable expert: untouched fp32 masters
        assert p["expert"]["blocks"]["attn"]["q"]["kernel"].dtype == jnp.float32
        assert p["action_out_proj"]["kernel"].dtype == jnp.float32
        # non-block frozen leaves (embeddings, norms) stay float (bf16 cast)
        assert p["vlm_embed"]["embedding"].dtype == jnp.bfloat16

        frozen_before = np.asarray(p["vlm"]["blocks"]["attn"]["q"]["kernel_q"])
        expert_before = np.asarray(p["expert"]["blocks"]["attn"]["q"]["kernel"])
        captured = {}
        orig_step = trainer.train_step

        def spy(state, batch):
            state, m = orig_step(state, batch)
            captured.update(m)
            return state, m

        trainer.train_step = spy
        trainer.train()
        assert trainer.cnt_update == 1
        # param_norm must skip the int8 kernel_q leaves: squaring them in
        # int8 arithmetic wraps negative and NaNs the whole norm
        assert np.isfinite(float(captured["param_norm"]))
        assert np.isfinite(float(captured["grad_norm"]))
        p = trainer.state.params
        np.testing.assert_array_equal(
            np.asarray(p["vlm"]["blocks"]["attn"]["q"]["kernel_q"]), frozen_before
        )
        assert not np.array_equal(
            np.asarray(p["expert"]["blocks"]["attn"]["q"]["kernel"]), expert_before
        ), "expert did not update"

    def test_rejects_models_that_train_through_the_tower(self, tmp_path, monkeypatch):
        # pi0 WITHOUT train_expert_only differentiates through the tower —
        # the activation-quant round() would silently kill that signal
        self._patch_tiny(monkeypatch, train_expert_only=False)
        from intact_tpu.train.trainer import Trainer

        with pytest.raises(ValueError, match="quantize_frozen_int8"):
            Trainer(self._cfg(tmp_path, quantize_frozen_int8=True))

    def test_float_checkpoint_quantized_on_load(self, tmp_path, monkeypatch):
        """load_from_checkpoint with a FLOAT pretrained checkpoint: params
        restore into the pre-quant template and the frozen tower quantizes
        on device (the production fine-tune entry path)."""
        self._patch_tiny(monkeypatch)
        from intact_tpu.train.trainer import Trainer

        float_trainer = Trainer(self._cfg(tmp_path / "float"))
        float_trainer.train()  # writes step_1
        ref_kernel = np.asarray(
            float_trainer.state.params["vlm"]["blocks"]["attn"]["q"]["kernel"],
            dtype=np.float32,
        )

        cfg = self._cfg(tmp_path / "q8", quantize_frozen_int8=True)
        cfg.load_from_checkpoint = str(float_trainer.ckpt_root)
        cfg.resume_run = False
        cfg.finalize()
        qt = Trainer(cfg)
        assert qt.cnt_update == 0  # fresh fine-tune, not a resume
        node = qt.state.params["vlm"]["blocks"]["attn"]["q"]
        kq = np.asarray(node["kernel_q"], dtype=np.float32)
        scale = np.asarray(node["kernel_scale"], dtype=np.float32)
        dequant = kq * scale[:, None, :]
        # int8 round-trip error is bounded by half a quantization step
        assert np.all(np.abs(dequant - ref_kernel) <= scale[:, None, :] * 0.51 + 1e-7)

        # resume of a QUANTIZED run restores the quantized structure directly
        kq_before = np.asarray(node["kernel_q"])  # copy: train() donates state
        qt.train()  # writes its own (quantized) step_1
        cfg2 = self._cfg(tmp_path / "q8_resume", quantize_frozen_int8=True)
        cfg2.load_from_checkpoint = str(qt.ckpt_root)
        cfg2.finalize()
        qt2 = Trainer(cfg2)
        assert qt2.cnt_update == 1
        np.testing.assert_array_equal(
            np.asarray(qt2.state.params["vlm"]["blocks"]["attn"]["q"]["kernel_q"]),
            kq_before,
        )


class TestUncommittedCheckpointGuard:
    def test_only_uncommitted_step_dirs_raise(self, tmp_path):
        """A crash-truncated step dir (no auxiliary_data.json commit marker)
        must never be silently restored by the latest-step fallback
        (ADVICE round-2 #3)."""
        import optax
        import pytest

        from intact_tpu.models.pi0.config import Pi0Config
        from intact_tpu.models.pi0 import model as pi0
        from intact_tpu.train.checkpoint import restore_train_state
        from intact_tpu.train.train_step import init_train_state
        import jax

        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        state = init_train_state(params, optax.sgd(0.0))
        # partial step dir: params item present, NO commit marker
        (tmp_path / "step_5" / "params").mkdir(parents=True)
        with pytest.raises(FileNotFoundError, match="uncommitted"):
            restore_train_state(tmp_path, state)

    def test_save_refuses_committed_and_clears_partial(self, tmp_path):
        """save_checkpoint must refuse to overwrite a COMMITTED step dir
        (data loss if the rewrite crashes) but auto-clear a stale PARTIAL
        one (no commit marker) so a crash-retry can save at the same
        update."""
        import optax
        import pytest

        import jax
        from intact_tpu.train.checkpoint import save_checkpoint

        from intact_tpu.train.train_step import init_train_state

        params = {"a": jax.numpy.ones((2, 2))}
        state = init_train_state(params, optax.sgd(0.0))
        save_checkpoint(tmp_path, state, step=3)
        with pytest.raises(FileExistsError, match="committed"):
            save_checkpoint(tmp_path, state, step=3)
        # stale partial at a different step: leftover item dir, no marker
        (tmp_path / "step_4" / "params").mkdir(parents=True)
        (tmp_path / "step_4" / "params" / "junk").write_text("x")
        path = save_checkpoint(tmp_path, state, step=4)
        assert (path / "auxiliary_data.json").exists()

    def test_params_restore_skips_newer_partial_step(self, tmp_path):
        """restore_params / restore_params_host resolving a ROOT dir must
        pick the newest COMMITTED step, not a newer crash-truncated partial
        one."""
        import optax

        import jax
        import numpy as np
        from intact_tpu.train.checkpoint import (
            restore_params,
            restore_params_host,
            save_checkpoint,
        )
        from intact_tpu.train.train_step import init_train_state

        params = {"a": jax.numpy.full((2, 2), 7.0)}
        save_checkpoint(tmp_path, init_train_state(params, optax.sgd(0.0)), step=2)
        # newer partial: would be picked by a commit-blind latest-step scan
        (tmp_path / "step_9" / "params").mkdir(parents=True)
        out = restore_params(tmp_path, params)
        np.testing.assert_array_equal(np.asarray(out["a"]), 7.0)
        out_h = restore_params_host(tmp_path, params)
        assert isinstance(out_h["a"], np.ndarray)
        np.testing.assert_array_equal(out_h["a"], 7.0)

    def test_opt_state_structure_mismatch_explains_itself(self, tmp_path):
        """An opt_state whose on-disk tree no longer matches the live
        template (e.g. checkpoints written before MultiSteps moved inside
        the multi_transform partition) must fail with a message pointing at
        params-only resume — not a bare Orbax tree error."""
        import optax
        import pytest

        import jax
        from intact_tpu.train.checkpoint import restore_train_state, save_checkpoint
        from intact_tpu.train.train_step import init_train_state

        params = {"a": jax.numpy.ones((2, 2)), "b": jax.numpy.ones((3,))}
        mask = {"a": True, "b": False}
        labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
        # OLD layout: MultiSteps wraps the whole multi_transform chain
        old_tx = optax.MultiSteps(
            optax.multi_transform(
                {"train": optax.adam(1e-3), "freeze": optax.set_to_zero()},
                param_labels=labels,
            ),
            every_k_schedule=2,
        )
        save_checkpoint(tmp_path, init_train_state(params, old_tx), step=1)
        # NEW layout: MultiSteps only wraps the trainable partition
        new_tx = optax.multi_transform(
            {
                "train": optax.MultiSteps(optax.adam(1e-3), every_k_schedule=2),
                "freeze": optax.set_to_zero(),
            },
            param_labels=labels,
        )
        template = init_train_state(params, new_tx)
        with pytest.raises(RuntimeError, match="params-only"):
            restore_train_state(tmp_path, template)
