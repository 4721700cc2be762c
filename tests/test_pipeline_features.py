"""Round-2 data-pipeline feature wiring tests (VERDICT missing #6):
future-action chunking, paraphrase augmentation, image dropout + padding
cameras, goal relabeling, and camera/history separation in preprocess_batch.
Each flag must measurably change pipeline output."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from intact_tpu.data.tf_transforms import (  # noqa: E402
    chunk_act_obs_tf,
    uniform_goal_relabel_tf,
)
from intact_tpu.data.transforms import chunk_act_obs  # noqa: E402


def _traj(T=6, dim=3):
    return {
        "observation": {
            "image_primary": np.arange(T)[:, None, None, None].astype(np.uint8)
            * np.ones((T, 4, 4, 3), np.uint8),
            "proprio": np.arange(T * dim, dtype=np.float32).reshape(T, dim),
        },
        "task": {"language_instruction": np.array([b"put the carrot on the plate"] * T)},
        "action": np.arange(T * dim, dtype=np.float32).reshape(T, dim),
    }


class TestFutureActionChunking:
    def test_numpy_shapes_and_tail_repeat(self):
        out = chunk_act_obs(_traj(), window_size=1, action_horizon=2,
                            max_action_future=4)
        fa = out["future_action"]
        assert fa.shape == (6, 1, 4, 3)
        # frame 0's future = actions 0..3
        np.testing.assert_array_equal(
            fa[0, 0], np.arange(12, dtype=np.float32).reshape(4, 3)
        )
        # last frame: future repeats the final action
        np.testing.assert_array_equal(fa[5, 0, 1], fa[5, 0, 0])
        np.testing.assert_array_equal(fa[5, 0, 3], np.arange(15, 18, dtype=np.float32))

    def test_tf_matches_numpy(self):
        traj = _traj()
        ref = chunk_act_obs(dict(traj), window_size=2, action_horizon=2,
                            max_action_future=5)
        got = chunk_act_obs_tf(
            {k: tf.nest.map_structure(tf.constant, v) for k, v in traj.items()},
            window_size=2, action_horizon=2, max_action_future=5,
        )
        np.testing.assert_allclose(got["future_action"].numpy(), ref["future_action"])
        np.testing.assert_allclose(got["action"].numpy(), ref["action"])

    def test_flag_off_means_no_key(self):
        assert "future_action" not in chunk_act_obs(_traj(), 1, 2)


class TestGoalRelabeling:
    def test_uniform_adds_goals_and_rewards(self):
        traj = {k: tf.nest.map_structure(tf.constant, v) for k, v in _traj().items()}
        out = uniform_goal_relabel_tf(traj, reached_proportion=0.5, seed=tf.constant([0, 7]))
        goals = out["task"]["goal_image_primary"].numpy()
        idxs = out["task"]["timestep"].numpy()
        rewards = out["reward"].numpy()
        assert goals.shape == (6, 4, 4, 3)
        # goal indices never look backward; final frame always goal-reaching
        assert (idxs >= np.arange(6)).all()
        assert idxs[-1] == 5 and rewards[-1] == 0.0
        assert set(np.unique(rewards)) <= {0.0, -1.0}
        # goal image content equals the observation at the goal index
        np.testing.assert_array_equal(goals[:, 0, 0, 0], idxs.astype(np.uint8))
        # reward 0 <=> goal reached at own index
        np.testing.assert_array_equal(rewards == 0.0, idxs == np.arange(6))


class TestParaphrase:
    TABLE = {"put the carrot on the plate": ["move the carrot onto the plate",
                                             "place the carrot on a plate"]}

    def test_traj_tf_rephrase_prob_one(self):
        from intact_tpu.data.task_augmentation import (
            Rephraser,
            rephrase_instruction_traj_tf,
        )

        table = Rephraser(self.TABLE, rephrase_prob=1.0).to_tf_table()
        traj = {k: tf.nest.map_structure(tf.constant, v) for k, v in _traj().items()}
        out = rephrase_instruction_traj_tf(traj, table, 1.0, tf.constant([3, 4]))
        instr = [s.decode() for s in out["task"]["language_instruction"].numpy()]
        allowed = {"put the carrot on the plate", *self.TABLE["put the carrot on the plate"]}
        assert set(instr) <= allowed
        # with prob 1 and per-frame sampling over 3 options, 6 frames
        # essentially never all keep the original
        assert any(s != "put the carrot on the plate" for s in instr)

    def test_unknown_instruction_passthrough(self):
        from intact_tpu.data.task_augmentation import (
            Rephraser,
            rephrase_instruction_traj_tf,
        )

        table = Rephraser(self.TABLE, rephrase_prob=1.0).to_tf_table()
        traj = {k: tf.nest.map_structure(tf.constant, v) for k, v in _traj().items()}
        traj["task"]["language_instruction"] = tf.constant([b"unknown task"] * 6)
        out = rephrase_instruction_traj_tf(traj, table, 1.0, tf.constant([3, 4]))
        assert out["task"]["language_instruction"].numpy()[0] == b"unknown task"

    def test_synthetic_backend_wiring(self, tmp_path):
        import json

        from intact_tpu.config.pipeline import DataConfig
        from intact_tpu.data.dataset import InterleavedDataset

        table_path = tmp_path / "para.json"
        # the synthetic backend's instructions come from its own task list;
        # paraphrase one we know it emits
        from intact_tpu.data.synthetic import SyntheticBridgeDataset

        ds_probe = SyntheticBridgeDataset(image_size=16, seed=0)
        probe = next(iter(ds_probe.batches(4, 0, 1)))
        instr = probe["task"]["language_instruction"][0]
        instr = instr.decode() if isinstance(instr, bytes) else str(instr)
        table_path.write_text(json.dumps({instr: ["REPHRASED VARIANT"]}))

        cfg = DataConfig(backend="synthetic", paraphrase_json=str(table_path))
        ds = InterleavedDataset(cfg, 8, split="train", task_paraphrase=True, seed=0)
        seen = []
        it = iter(ds)
        for _ in range(10):
            batch = next(it)
            seen += [
                s.decode() if isinstance(s, bytes) else str(s)
                for s in batch["task"]["language_instruction"]
            ]
        assert any(s == "REPHRASED VARIANT" for s in seen), "paraphrase never applied"
        assert any(s == instr for s in seen), "rephrase_prob=0.5 should keep some originals"

    def test_missing_table_raises(self, monkeypatch):
        from intact_tpu.config.pipeline import DataConfig
        from intact_tpu.data.dataset import InterleavedDataset
        import intact_tpu.data.task_augmentation as ta

        monkeypatch.setattr(
            ta.Rephraser, "from_hub",
            classmethod(lambda cls, **kw: (_ for _ in ()).throw(OSError("no net"))),
        )
        with pytest.raises(RuntimeError, match="paraphrase"):
            InterleavedDataset(
                DataConfig(backend="synthetic"), 8, split="train", task_paraphrase=True
            )


class TestImageDropout:
    def _frames(self, n=4):
        def gen():
            for _ in range(n):
                yield {
                    "observation": {
                        "image_primary": np.full((1, 8, 8, 3), 100, np.uint8),
                        "image_wrist": np.full((1, 8, 8, 3), 50, np.uint8),
                    },
                    "action": np.zeros((1, 2, 3), np.float32),
                }

        return tf.data.Dataset.from_generator(
            gen,
            output_signature={
                "observation": {
                    "image_primary": tf.TensorSpec((1, 8, 8, 3), tf.uint8),
                    "image_wrist": tf.TensorSpec((1, 8, 8, 3), tf.uint8),
                },
                "action": tf.TensorSpec((1, 2, 3), tf.float32),
            },
        )

    def test_dropout_zeroes_wrist_keeps_primary(self):
        from intact_tpu.data.rlds import apply_frame_transforms

        ds = apply_frame_transforms(
            self._frames(), train=True, resize_size=(8, 8), augment=False,
            image_dropout_prob=1.0,
        )
        for frame in ds.as_numpy_iterator():
            assert frame["observation"]["image_wrist"].sum() == 0
            assert frame["observation"]["image_primary"].sum() > 0

    def test_no_dropout_by_default(self):
        from intact_tpu.data.rlds import apply_frame_transforms

        ds = apply_frame_transforms(
            self._frames(), train=True, resize_size=(8, 8), augment=False,
        )
        for frame in ds.as_numpy_iterator():
            assert frame["observation"]["image_wrist"].sum() > 0


class TestPreprocessBatchCameras:
    def _model_cfg(self, num_cameras):
        from intact_tpu.models.pi0.config import Pi0Config
        import dataclasses

        return dataclasses.replace(Pi0Config.tiny(), num_cameras=num_cameras)

    def _batch(self, b=2, t=1, extra_cams=(), h=16):
        obs = {"image_primary": np.full((b, t, h, h, 3), 9, np.uint8),
               "proprio": np.ones((b, t, 7), np.float32)}
        for k in extra_cams:
            obs[k] = np.full((b, t, h, h, 3), 5, np.uint8)
        return {
            "observation": obs,
            "task": {"language_instruction": [b"x"] * b},
            "action": np.ones((b, t, 4, 7), np.float32),
        }

    def test_history_not_fed_as_cameras(self):
        from intact_tpu.models.tokenizer import HashTokenizer
        from intact_tpu.train.trainer import preprocess_batch

        cfg = self._model_cfg(1)
        batch = self._batch(t=3)  # window_size 3 history
        # mark history frames distinctly; the CURRENT frame must be chosen
        batch["observation"]["image_primary"][:, -1] = 77
        out = preprocess_batch(batch, HashTokenizer(max_length=8), cfg)
        assert out["images"].shape[1] == 1  # one camera, NOT 3
        # 77/255*2-1 within rounding
        expected = 77 / 255.0 * 2.0 - 1.0
        np.testing.assert_allclose(out["images"][0, 0, 0, 0, 0], expected, atol=1e-2)

    def test_missing_cameras_padded_with_mask_false(self):
        from intact_tpu.models.tokenizer import HashTokenizer
        from intact_tpu.train.trainer import preprocess_batch

        cfg = self._model_cfg(2)
        out = preprocess_batch(self._batch(), HashTokenizer(max_length=8), cfg)
        assert out["images"].shape[1] == 2
        assert out["img_masks"].tolist() == [[True, False]] * 2
        # padding camera is the normalize_u8 of zeros = -1
        np.testing.assert_allclose(out["images"][:, 1], -1.0, atol=1e-6)

    def test_too_many_cameras_fails_loudly(self):
        from intact_tpu.models.tokenizer import HashTokenizer
        from intact_tpu.train.trainer import preprocess_batch

        cfg = self._model_cfg(1)
        with pytest.raises(ValueError, match="num_cameras"):
            preprocess_batch(
                self._batch(extra_cams=("image_wrist",)),
                HashTokenizer(max_length=8), cfg,
            )

    def test_dropped_camera_masked(self):
        from intact_tpu.models.tokenizer import HashTokenizer
        from intact_tpu.train.trainer import preprocess_batch

        cfg = self._model_cfg(2)
        batch = self._batch(extra_cams=("image_wrist",))
        batch["observation"]["image_wrist"][:] = 0  # image-dropout output
        out = preprocess_batch(batch, HashTokenizer(max_length=8), cfg)
        assert out["img_masks"].tolist() == [[True, False]] * 2
