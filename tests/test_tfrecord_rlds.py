"""TFDS-path integration tests (VERDICT weak #6): write a tiny TFDS-format
RLDS dataset to disk and drive the FULL production pipeline through the
native TFRecord reader — the branch every real OXE run takes."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from intact_tpu.data import tfrecord_rlds  # noqa: E402


def _bridge_episode(rng, T, hw=32):
    return {
        "observation": {
            "image_0": rng.integers(0, 255, (T, hw, hw, 3), dtype=np.uint8),
            "state": rng.normal(size=(T, 7)).astype(np.float32),
        },
        "action": rng.normal(size=(T, 7)).astype(np.float32) * 0.05 + 0.5,
        "language_instruction": np.array(["put the carrot on the plate"] * T),
    }


@pytest.fixture(scope="module")
def tfds_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    episodes = [_bridge_episode(rng, T) for T in (8, 6, 10, 7)]
    root = tmp_path_factory.mktemp("tfds_data")
    tfrecord_rlds.write_rlds_dataset(
        root, "bridge_dataset", episodes, num_shards=2
    )
    return root, episodes


class TestNativeReader:
    def test_roundtrip_trajectories(self, tfds_dir):
        root, episodes = tfds_dir
        ds = tfrecord_rlds.read_rlds_dataset(root, "bridge_dataset",
                                             split="train", shuffle_files=False)
        got = list(ds.as_numpy_iterator())
        assert len(got) == 4
        lengths = sorted(t["action"].shape[0] for t in got)
        assert lengths == [6, 7, 8, 10]
        t0 = got[0]
        assert t0["action"].shape[-1] == 7
        assert t0["observation"]["state"].shape[-1] == 7
        # images come back as one encoded byte string per step
        assert t0["observation"]["image_0"].dtype.kind in ("S", "O")
        img = tf.io.decode_png(t0["observation"]["image_0"][0]).numpy()
        assert img.shape == (32, 32, 3)
        assert t0["language_instruction"][0] == b"put the carrot on the plate"

    def test_png_content_roundtrip(self, tfds_dir):
        root, episodes = tfds_dir
        ds = tfrecord_rlds.read_rlds_dataset(root, "bridge_dataset",
                                             split="train", shuffle_files=False)
        got = {t["action"].shape[0]: t for t in ds.as_numpy_iterator()}
        for ep in episodes:
            T = ep["action"].shape[0]
            dec = tf.io.decode_png(got[T]["observation"]["image_0"][0]).numpy()
            np.testing.assert_array_equal(dec, ep["observation"]["image_0"][0])
            np.testing.assert_allclose(got[T]["action"], ep["action"], rtol=1e-6)

    def test_percent_slices_are_disjoint(self, tfds_dir):
        root, _ = tfds_dir
        tr = list(tfrecord_rlds.read_rlds_dataset(
            root, "bridge_dataset", split="train[:50%]", shuffle_files=False
        ).as_numpy_iterator())
        va = list(tfrecord_rlds.read_rlds_dataset(
            root, "bridge_dataset", split="train[50%:]", shuffle_files=False
        ).as_numpy_iterator())
        assert len(tr) + len(va) == 4 and len(tr) > 0 and len(va) > 0
        # slices are disjoint AND complete by episode identity (lengths are
        # unique in the fixture), even with shuffled parallel shard reads
        tr_s = list(tfrecord_rlds.read_rlds_dataset(
            root, "bridge_dataset", split="train[:50%]",
            shuffle_files=True, seed=3,
        ).as_numpy_iterator())
        va_s = list(tfrecord_rlds.read_rlds_dataset(
            root, "bridge_dataset", split="train[50%:]",
            shuffle_files=True, seed=4,
        ).as_numpy_iterator())
        ids = sorted(t["action"].shape[0] for t in tr_s + va_s)
        assert ids == [6, 7, 8, 10]

    def test_missing_dataset_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            tfrecord_rlds.read_rlds_dataset(tmp_path, "nope")

    def test_registry_named_cameras_and_uint8_tensors(self, tmp_path):
        """Cameras with OXE registry names that don't start with 'image'
        (rgb_static, cam_high) must be ENCODED by the writer (not exploded
        into int64 lists), and a raw non-image uint8 tensor must round-trip
        through the int64 wire type with its dtype restored."""
        rng = np.random.default_rng(2)
        T = 5
        episodes = [{
            "observation": {
                "rgb_static": rng.integers(0, 255, (T, 16, 16, 3), dtype=np.uint8),
                "cam_high": rng.integers(0, 255, (T, 16, 16, 3), dtype=np.uint8),
                "seg_mask": rng.integers(0, 9, (T, 4)).astype(np.uint8),
                "state": rng.normal(size=(T, 7)).astype(np.float32),
            },
            "action": rng.normal(size=(T, 7)).astype(np.float32),
            "language_instruction": np.array(["sweep"] * T),
        }]
        tfrecord_rlds.write_rlds_dataset(tmp_path, "taco_play", episodes)
        got = next(iter(tfrecord_rlds.read_rlds_dataset(
            tmp_path, "taco_play", split="train", shuffle_files=False
        ).as_numpy_iterator()))
        for cam in ("rgb_static", "cam_high"):
            # one encoded byte string per step, not a flat int64 tensor
            assert got["observation"][cam].dtype.kind in ("S", "O")
            dec = tf.io.decode_png(got["observation"][cam][0]).numpy()
            np.testing.assert_array_equal(
                dec, episodes[0]["observation"][cam][0]
            )
        assert got["observation"]["seg_mask"].dtype == np.uint8
        np.testing.assert_array_equal(
            got["observation"]["seg_mask"], episodes[0]["observation"]["seg_mask"]
        )


class TestFullPipelineOverTfds:
    def test_interleaved_batches_from_tfds_layout(self, tfds_dir):
        """End-to-end: oxe kwargs (bridge standardize incl. relabel+binarize)
        -> native TFRecord read -> normalize -> chunk -> flatten -> decode ->
        batch, exactly the path a real OXE run takes."""
        from intact_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
        from intact_tpu.data.rlds import make_interleaved_dataset

        root, _ = tfds_dir
        kwargs_list, weights = make_oxe_dataset_kwargs_and_weights("bridge", str(root))
        for kw in kwargs_list:
            kw.pop("load_proprio", None)
        ds, total, stats = make_interleaved_dataset(
            kwargs_list, weights,
            train=True,
            shuffle_buffer_size=16,
            window_size=1,
            action_horizon=2,
            resize_size=(24, 24),
            batch_size=3,
            seed=0,
        )
        batch = next(iter(ds.as_numpy_iterator()))
        img = batch["observation"]["image_primary"]
        assert img.shape == (3, 1, 24, 24, 3) and img.dtype == np.uint8
        assert batch["action"].shape == (3, 1, 2, 7)
        assert batch["observation"]["proprio"].shape == (3, 1, 7)
        assert b"carrot" in batch["task"]["language_instruction"][0]
        assert stats["bridge_dataset"]["num_transitions"] > 0

    def test_bound_normalization_with_explicit_stats(self, tfds_dir, tmp_path):
        """normalization_type='bound' + an explicit statistics file must
        normalize actions with EXACTLY those constants (the scheme and
        numbers the serving adapters invert) — the trainer wires
        env.action_normalization_type through this path."""
        import json

        from intact_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
        from intact_tpu.data.rlds import make_interleaved_dataset

        root, _ = tfds_dir
        d = 7
        stats = {
            "action": {
                "mean": [0.0] * d, "std": [1.0] * d,
                "p01": [-2.0] * d, "p99": [2.0] * d,
            },
            "proprio": {
                "mean": [0.0] * d, "std": [1.0] * d,
                "p01": [-3.0] * d, "p99": [3.0] * d,
            },
            "num_transitions": 31, "num_trajectories": 4,
        }
        stats_path = tmp_path / "stats.json"
        stats_path.write_text(json.dumps(stats))
        kwargs_list, weights = make_oxe_dataset_kwargs_and_weights("bridge", str(root))
        ds, total, all_stats = make_interleaved_dataset(
            kwargs_list, weights, train=True, shuffle_buffer_size=4,
            window_size=1, action_horizon=1, resize_size=(24, 24),
            batch_size=4, seed=0,
            normalization_type="bound",
            dataset_statistics=str(stats_path),
        )
        assert total == 31  # explicit stats drive the epoch accounting
        batch = next(iter(ds.as_numpy_iterator()))
        a = batch["action"]
        # bound scheme: clipped to [-1, 1], with interior values actually
        # rescaled (not all saturated) — the random fixture's standardized
        # deltas straddle the toy +-2 percentile band
        assert np.all(a >= -1.0 - 1e-5) and np.all(a <= 1.0 + 1e-5)
        assert (np.abs(a[..., :6]) < 0.99).any()


class TestRlds2Lerobot:
    def test_export_layout_and_readback(self, tfds_dir, tmp_path):
        import importlib.util
        import json

        spec = importlib.util.spec_from_file_location(
            "rlds2lerobot",
            str(__import__("pathlib").Path(__file__).parent.parent
                / "scripts/dataset/rlds2lerobot.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        root, episodes = tfds_dir
        out = tmp_path / "lerobot"
        info = mod.export(
            mod.iter_rlds_episodes(str(root), "bridge_dataset", limit=None),
            out, fps=5.0,
        )
        assert info["total_episodes"] == 4
        assert info["total_frames"] == sum(e["action"].shape[0] for e in episodes)
        assert (out / "meta/info.json").exists()
        assert (out / "meta/tasks.jsonl").exists()
        tasks = [json.loads(line) for line in (out / "meta/tasks.jsonl").read_text().splitlines()]
        assert tasks[0]["task"] == "put the carrot on the plate"

        import pyarrow.parquet as pq

        t = pq.read_table(out / "data/chunk-000/episode_000000.parquet")
        assert {"observation.images.top", "observation.state", "action",
                "timestamp", "frame_index", "episode_index", "index",
                "task_index"} <= set(t.column_names)
        import tensorflow as tf2

        png = t["observation.images.top"][0].as_py()
        img = tf2.io.decode_png(png).numpy()
        assert img.shape == (32, 32, 3)


class TestModifyRldsDataset:
    def test_resize_and_reencode_roundtrip(self, tfds_dir, tmp_path):
        """Full offline modification: read -> decode -> resize -> jpeg
        shards, then the modified dataset reads back through the same
        production reader."""
        from intact_tpu.data.preprocess import modify_rlds_dataset

        root, episodes = tfds_dir
        out = tmp_path / "resize_16"
        modify_rlds_dataset(
            root, "bridge_dataset", out, ["resize_and_jpeg_encode"],
            num_workers=2, num_shards=2, image_size=16,
        )
        ds = tfrecord_rlds.read_rlds_dataset(out, "bridge_dataset",
                                             split="train", shuffle_files=False)
        got = list(ds.as_numpy_iterator())
        assert len(got) == 4
        img = tf.io.decode_image(got[0]["observation"]["image_0"][0]).numpy()
        assert img.shape == (16, 16, 3)
        # non-image features pass through untouched
        lengths = sorted(t["action"].shape[0] for t in got)
        assert lengths == [6, 7, 8, 10]

    def test_proprio_conversion_inverts(self):
        from intact_tpu.data.preprocess import (
            proprio_euler_to_quat,
            proprio_quat_to_euler,
        )

        rng = np.random.default_rng(0)
        p7 = np.concatenate(
            [rng.normal(size=(5, 3)), rng.uniform(-1.2, 1.2, (5, 3)),
             rng.uniform(0, 1, (5, 1))], axis=-1,
        ).astype(np.float32)
        ep = {"observation": {"proprio": p7}, "action": np.zeros((5, 7))}
        back = proprio_quat_to_euler(proprio_euler_to_quat(ep))
        np.testing.assert_allclose(
            back["observation"]["proprio"], p7, atol=1e-5
        )

    def test_same_dir_refused(self, tfds_dir):
        from intact_tpu.data.preprocess import modify_rlds_dataset

        root, _ = tfds_dir
        with pytest.raises(ValueError, match="overwrite"):
            modify_rlds_dataset(root, "bridge_dataset", root, ["resize"])

    def test_unknown_mod_raises(self, tfds_dir, tmp_path):
        from intact_tpu.data.preprocess import modify_rlds_dataset

        root, _ = tfds_dir
        with pytest.raises(KeyError, match="unknown mod"):
            modify_rlds_dataset(root, "bridge_dataset", tmp_path / "x", ["nope"])


class TestNoTfdsFallback:
    def test_unreadable_layout_raises_with_pointer(self, tmp_path):
        """There is deliberately no tensorflow_datasets fallback (VERDICT
        round-2 next #8): a native-reader failure surfaces as a RuntimeError
        pointing at tfrecord_rlds / the npz converter, chained to the cause."""
        ds_dir = tmp_path / "broken_dataset" / "1.0.0"
        ds_dir.mkdir(parents=True)
        (ds_dir / "dataset_info.json").write_text("not json {")
        from intact_tpu.data.rlds import _episodes_from_tfds

        with pytest.raises(RuntimeError, match="tfrecord_rlds") as ei:
            _episodes_from_tfds("broken_dataset", str(tmp_path), "train", 1)
        assert ei.value.__cause__ is not None
