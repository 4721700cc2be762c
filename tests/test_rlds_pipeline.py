"""tf.data RLDS pipeline tests: tf-vs-numpy transform parity and the
interleaved pipeline end-to-end over an .npz episode directory."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from intact_tpu.data import transforms as np_t
from intact_tpu.data import tf_transforms as tf_t


class TestTfNumpyParity:
    def test_chunk_parity(self):
        T, D = 9, 7
        rng = np.random.default_rng(0)
        traj = {
            "observation": {"proprio": rng.normal(size=(T, D)).astype(np.float32)},
            "task": {},
            "action": rng.normal(size=(T, D)).astype(np.float32),
            "action_pad_mask": np.ones((T, D), bool),
        }
        ref = np_t.chunk_act_obs(dict(traj), window_size=2, action_horizon=4)
        tf_traj = {
            "observation": {"proprio": tf.constant(traj["observation"]["proprio"])},
            "task": {},
            "action": tf.constant(traj["action"]),
            "action_pad_mask": tf.constant(traj["action_pad_mask"]),
        }
        out = tf_t.chunk_act_obs_tf(tf_traj, window_size=2, action_horizon=4)
        np.testing.assert_allclose(out["action"].numpy(), ref["action"])
        np.testing.assert_array_equal(
            out["action_pad_mask"].numpy(), ref["action_pad_mask"]
        )
        np.testing.assert_array_equal(
            out["observation"]["timestep_pad_mask"].numpy(),
            ref["observation"]["timestep_pad_mask"],
        )

    def test_gripper_parity(self):
        cont = np.array([1.0, 0.5, 0.0, 0.5, 1.0, 0.3], np.float32)
        np.testing.assert_allclose(
            tf_t.binarize_gripper_actions_tf(tf.constant(cont)).numpy(),
            np_t.binarize_gripper_actions(cont),
        )
        rel = np.array([0.0, 1.0, 0.0, -1.0, 0.0], np.float32)
        np.testing.assert_allclose(
            tf_t.rel2abs_gripper_actions_tf(tf.constant(rel)).numpy(),
            np_t.rel2abs_gripper_actions(rel),
        )

    def test_augment_deterministic_and_shape(self):
        img = tf.constant(np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8))
        seed = tf.constant([3, 4], tf.int32)
        a = tf_t.augment_image_tf(img, seed).numpy()
        b = tf_t.augment_image_tf(img, seed).numpy()
        np.testing.assert_array_equal(a, b)
        c = tf_t.augment_image_tf(img, tf.constant([5, 6], tf.int32)).numpy()
        assert not np.array_equal(a, c)
        assert a.shape == (32, 32, 3) and a.dtype == np.uint8

    def test_decode_and_resize(self):
        img = np.zeros((48, 64, 3), np.uint8)
        out = tf_t.decode_and_resize_tf(tf.constant(img), (32, 32)).numpy()
        assert out.shape == (32, 32, 3)
        encoded = tf.io.encode_jpeg(tf.constant(img))
        out2 = tf_t.decode_and_resize_tf(encoded, (32, 32)).numpy()
        assert out2.shape == (32, 32, 3)

    def test_decode_augment_resize_fused(self):
        """The fused train-path transform: deterministic under a seed,
        source-resolution crop -> target size, and padding cameras (empty
        byte string) stay exactly zero (jitter must not gray them out)."""
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        encoded = tf.io.encode_jpeg(tf.constant(img))
        seed = tf.constant([7, 8], tf.int32)
        a = tf_t.decode_augment_resize_tf(encoded, (32, 32), seed).numpy()
        b = tf_t.decode_augment_resize_tf(encoded, (32, 32), seed).numpy()
        np.testing.assert_array_equal(a, b)
        assert a.shape == (32, 32, 3) and a.dtype == np.uint8
        c = tf_t.decode_augment_resize_tf(
            encoded, (32, 32), tf.constant([9, 10], tf.int32)
        ).numpy()
        assert not np.array_equal(a, c)
        # decoded-tensor input works too
        d = tf_t.decode_augment_resize_tf(tf.constant(img), (32, 32), seed).numpy()
        assert d.shape == (32, 32, 3)
        # padding camera: all-zero in, all-zero out
        pad = tf_t.decode_augment_resize_tf(
            tf.constant("", tf.string), (32, 32), seed
        ).numpy()
        np.testing.assert_array_equal(pad, 0)


class TestInterleavedPipeline:
    @pytest.fixture(scope="class")
    def npz_dir(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("data")
        import os
        import subprocess
        import sys

        out = root / "bridge_dataset"
        env = dict(os.environ, PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
        subprocess.run(
            [sys.executable, "scripts/dataset/write_npz_episodes.py",
             "--out", str(out), "--episodes", "6", "--image-size", "32"],
            check=True, cwd="/root/repo", env=env,
        )
        return root

    def test_end_to_end_batches(self, npz_dir, tmp_path, monkeypatch):
        monkeypatch.setenv("INTACT_STATS_CACHE", str(tmp_path / "cache"))
        from intact_tpu.data.rlds import make_interleaved_dataset

        kwargs = [{
            "name": "bridge_dataset",
            "data_dir": str(npz_dir),
            "standardize_fn": None,
            "action_normalization_mask": [True] * 6 + [False],
        }]
        ds, total, stats = make_interleaved_dataset(
            kwargs, None, train=True, shuffle_buffer_size=100,
            window_size=1, action_horizon=4, resize_size=(32, 32), seed=0,
        )
        batch = next(ds.batch(4).as_numpy_iterator())
        assert batch["observation"]["image_primary"].shape == (4, 1, 32, 32, 3)
        assert batch["action"].shape == (4, 1, 4, 7)
        assert batch["action_pad_mask"].shape == (4, 1, 4, 7)
        lang = batch["task"]["language_instruction"]
        assert lang.dtype.kind in ("S", "O") and isinstance(lang[0], bytes)
        assert "bridge_dataset" in stats
        assert total == stats["bridge_dataset"]["num_transitions"]
        # actions normalized: non-gripper dims roughly standard scale
        assert abs(float(batch["action"][..., :6].mean())) < 3.0

    def test_statistics_identical_across_splits_and_shards(self, npz_dir, tmp_path, monkeypatch):
        """Normalization constants come from the FULL dataset: every host
        shard and both train/val splits must see IDENTICAL statistics (else
        multi-host training silently diverges)."""
        monkeypatch.setenv("INTACT_STATS_CACHE", str(tmp_path / "cache"))
        from intact_tpu.data.rlds import make_dataset_from_rlds

        common = dict(name="bridge_dataset", data_dir=str(npz_dir),
                      skip_unlabeled=False)
        _, s_train = make_dataset_from_rlds(train=True, **common)
        _, s_val = make_dataset_from_rlds(train=False, **common)
        _, s_shard = make_dataset_from_rlds(
            train=True, shard_index=1, num_shards=2, **common
        )
        np.testing.assert_array_equal(s_train["action"]["mean"], s_val["action"]["mean"])
        np.testing.assert_array_equal(s_train["action"]["std"], s_shard["action"]["std"])
        assert s_train["num_transitions"] == s_val["num_transitions"]

    def test_tf_data_service_distribute(self, npz_dir, tmp_path, monkeypatch):
        """data.train.service_address routes the batched pipeline through a
        tf.data service (in-process dispatcher + worker here): batches flow
        with identical structure, and the shared-job path the multi-host
        recipe relies on registers cleanly."""
        monkeypatch.setenv("INTACT_STATS_CACHE", str(tmp_path / "cache"))
        from intact_tpu.data.rlds import (
            RLDSInterleavedBackend,
            make_interleaved_dataset,
        )

        dispatcher = tf.data.experimental.service.DispatchServer()
        worker = tf.data.experimental.service.WorkerServer(  # noqa: F841
            tf.data.experimental.service.WorkerConfig(
                dispatcher_address=dispatcher.target.split("://")[1]
            )
        )

        kwargs = [{
            "name": "bridge_dataset",
            "data_dir": str(npz_dir),
            "standardize_fn": None,
            "action_normalization_mask": [True] * 6 + [False],
        }]
        ds, _, _ = make_interleaved_dataset(
            kwargs, None, train=True, shuffle_buffer_size=50,
            window_size=1, action_horizon=4, resize_size=(32, 32), seed=0,
        )
        backend = RLDSInterleavedBackend.__new__(RLDSInterleavedBackend)
        backend._service_address = dispatcher.target
        backend._split = "train"
        backend._ds = ds
        batch = next(iter(backend.batches(4)))
        assert batch["observation"]["image_primary"].shape == (4, 1, 32, 32, 3)
        assert batch["action"].shape == (4, 1, 4, 7)

    def test_per_host_sharding_disjoint(self, npz_dir, tmp_path, monkeypatch):
        monkeypatch.setenv("INTACT_STATS_CACHE", str(tmp_path / "cache"))
        from intact_tpu.data.rlds import make_dataset_from_rlds

        common = dict(
            name="bridge_dataset", data_dir=str(npz_dir), train=True,
            skip_unlabeled=False,
        )
        ds0, _ = make_dataset_from_rlds(shard_index=0, num_shards=2, **common)
        ds1, _ = make_dataset_from_rlds(shard_index=1, num_shards=2, **common)
        a = next(ds0.as_numpy_iterator())["action"]
        b = next(ds1.as_numpy_iterator())["action"]
        assert a.shape[0] != b.shape[0] or not np.allclose(a, b)
