"""Aux subsystem tests: task augmentation, image dropout, wandb gate,
distributed helpers."""

import numpy as np
import pytest

from intact_tpu.data.task_augmentation import Rephraser, delete_task_conditioning


class TestTaskAugmentation:
    def test_rephrase_prob_and_determinism(self):
        table = {"pick the cup": ["grab the cup", "lift the cup"]}
        r = Rephraser(table, rephrase_prob=1.0, seed=0)
        out = r.rephrase("pick the cup")
        assert out in table["pick the cup"]
        # unknown instruction passes through
        assert r.rephrase("unknown") == "unknown"
        # prob 0 never rephrases
        r0 = Rephraser(table, rephrase_prob=0.0, seed=0)
        assert r0.rephrase("pick the cup") == "pick the cup"

    def test_rephrase_batch_bytes(self):
        r = Rephraser({"a": ["b"]}, rephrase_prob=1.0, seed=0)
        out = r.rephrase_batch([b"a", b"c"])
        assert out[0] == b"b" and out[1] == b"c"

    def test_tf_rephrase(self):
        tf = pytest.importorskip("tensorflow")
        from intact_tpu.data.task_augmentation import rephrase_instruction_tf

        r = Rephraser({"pick the cup": ["grab the cup"]}, rephrase_prob=1.0)
        table = r.to_tf_table()
        frame = {"task": {"language_instruction": tf.constant("pick the cup")}}
        out = rephrase_instruction_tf(frame, table, 1.0, tf.constant([1, 2]))
        assert out["task"]["language_instruction"].numpy() == b"grab the cup"
        frame2 = {"task": {"language_instruction": tf.constant("nope")}}
        out2 = rephrase_instruction_tf(frame2, table, 1.0, tf.constant([1, 2]))
        assert out2["task"]["language_instruction"].numpy() == b"nope"

    def test_delete_task_conditioning(self):
        rng = np.random.default_rng(0)
        out = delete_task_conditioning([b"x"] * 100, keep_prob=0.5, rng=rng)
        kept = sum(1 for s in out if s == b"x")
        assert 25 < kept < 75

    def test_image_dropout_tf(self):
        tf = pytest.importorskip("tensorflow")
        from intact_tpu.data.tf_transforms import image_dropout_tf

        img = tf.ones((4, 4, 3), tf.uint8) * 7
        dropped = image_dropout_tf(img, tf.constant([0, 1]), 1.0)
        assert int(tf.reduce_sum(dropped)) == 0
        kept = image_dropout_tf(img, tf.constant([0, 1]), 0.0)
        assert int(tf.reduce_sum(kept)) > 0


class TestGates:
    def test_wandb_noop(self):
        from intact_tpu.utils.wandb_gate import init

        run = init(enabled=False, project="x")
        assert run.id
        run.log({"a": 1}, step=0)
        run.finish()

    def test_distributed_single_process(self):
        from intact_tpu.parallel.distributed import initialize, process_mean

        initialize()  # no-op, must not raise
        out = process_mean({"loss": 1.5})
        assert out == {"loss": 1.5}


class TestActionParityCLI:
    def test_record_then_compare_self_passes(self, tmp_path, monkeypatch):
        """record -> compare against own recording must pass the MSE gate
        exactly (same params, same noise)."""
        import importlib.util
        import json as _json
        from pathlib import Path

        import numpy as np

        spec = importlib.util.spec_from_file_location(
            "action_parity",
            str(Path(__file__).parent.parent / "scripts/eval/action_parity.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        rng = np.random.default_rng(0)
        from intact_tpu.models.pi0.config import Pi0Config

        cfg = Pi0Config.tiny()
        s = cfg.vision.image_size
        fix = {
            "images": rng.uniform(-1, 1, (2, 1, s, s, 3)).astype(np.float32),
            "state": rng.normal(size=(2, 7)).astype(np.float32),
            "lang_tokens": rng.integers(0, 100, (2, cfg.tokenizer_max_length)).astype(np.int32),
            "lang_masks": np.ones((2, cfg.tokenizer_max_length), bool),
            "noise": rng.normal(size=(2, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32),
        }
        ours = mod.run_policy(fix, None, "pi0_tiny", use_bf16=False)
        assert ours.shape == (2, cfg.chunk_size, cfg.max_action_dim)

        fix["actions"] = ours
        again = mod.run_policy(fix, None, "pi0_tiny", use_bf16=False)
        mse = float(((again - ours) ** 2).mean())
        assert mse < mod.MSE_GATE

    def test_int8_gate_scores_and_passes_at_tiny_scale(self):
        """The automated int8 acceptance gate (VERDICT round-2 next #5):
        int8-vs-bf16 on shared noise scores MSE + relative deviation and
        passes the stated budget at tiny scale; an intentionally absurd
        budget fails it (the gate actually gates)."""
        import importlib.util
        from pathlib import Path

        import numpy as np

        spec = importlib.util.spec_from_file_location(
            "action_parity",
            str(Path(__file__).parent.parent / "scripts/eval/action_parity.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        rng = np.random.default_rng(1)
        from intact_tpu.models.pi0.config import Pi0Config

        cfg = Pi0Config.tiny()
        s = cfg.vision.image_size
        fix = {
            "images": rng.uniform(-1, 1, (2, 1, s, s, 3)).astype(np.float32),
            "state": rng.normal(size=(2, 7)).astype(np.float32),
            "lang_tokens": rng.integers(0, 100, (2, cfg.tokenizer_max_length)).astype(np.int32),
            "lang_masks": np.ones((2, cfg.tokenizer_max_length), bool),
            "noise": rng.normal(size=(2, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32),
        }
        result = mod.score_int8(fix, None, "pi0_tiny")
        assert result["mse"] > 0  # int8 must actually differ from bf16
        assert result["pass"], result
        strict = mod.score_int8(fix, None, "pi0_tiny", mse_gate=1e-12, rel_gate=1e-12)
        assert not strict["pass"]

    def test_int8_ar_gate_machinery_tiny(self):
        """The int8 gate for the native AR families (config-level
        quantize_int8 serving): both precisions run the full greedy decode
        on identical inputs, the verdict budgets the DECODED actions and
        reports token agreement. At random init the verdict itself is
        knife-edge (greedy ties), so this pins the machinery: metrics
        finite, agreement in [0,1], decode deterministic across runs."""
        import importlib.util
        from pathlib import Path

        import numpy as np

        spec = importlib.util.spec_from_file_location(
            "action_parity",
            str(Path(__file__).parent.parent / "scripts/eval/action_parity.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        for model in ("spatialvla_native_tiny", "magma_native_tiny"):
            assert mod._is_ar_native(model)
            result = mod.score_int8_ar(model, None, batch=2, seed=0,
                                       use_bf16=False)
            assert np.isfinite(result["mse"]), result
            assert np.isfinite(result["mean_relative_deviation"]), result
            assert 0.0 <= result["token_agreement"] <= 1.0, result
            assert isinstance(result["pass"], bool)

            a1, ids1 = mod.run_ar_policy(model, None, batch=2, seed=0,
                                         use_bf16=False)
            a2, ids2 = mod.run_ar_policy(model, None, batch=2, seed=0,
                                         use_bf16=False)
            np.testing.assert_array_equal(ids1, ids2)
            np.testing.assert_array_equal(a1, a2)


class TestPrefetchIterator:
    def test_order_and_prepare(self):
        from intact_tpu.utils.prefetch import PrefetchIterator

        out = list(PrefetchIterator(iter(range(10)), prepare=lambda x: x * 2, depth=3))
        assert out == [x * 2 for x in range(10)]

    def test_exception_propagates(self):
        from intact_tpu.utils.prefetch import PrefetchIterator

        def gen():
            yield 1
            raise RuntimeError("pipeline broke")

        it = PrefetchIterator(gen())
        assert next(it) == 1
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="pipeline broke"):
            for _ in it:
                pass

    def test_overlap_actually_happens(self):
        import threading
        import time as _time

        from intact_tpu.utils.prefetch import PrefetchIterator

        produced = []

        def slow_gen():
            for i in range(4):
                produced.append(i)
                yield i

        it = PrefetchIterator(iter(slow_gen()), depth=2)
        _time.sleep(0.2)  # worker runs ahead without any consumption
        assert len(produced) >= 2
        assert list(it) == [0, 1, 2, 3]
