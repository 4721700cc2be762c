"""Vectorized MS3 and LIBERO evaluator loops against fake simulators +
a live tiny-pi0 policy server over a real websocket."""

import threading

import numpy as np
import pytest

from tests.test_serve_eval import make_cfg, start_server_thread


class FakeMS3Env:
    """Batched gym-style env (vectorized ManiSkill3 stand-in)."""

    def __init__(self, n: int):
        self.n = n
        self._t = 0

    @property
    def unwrapped(self):
        return self

    def get_language_instruction(self):
        return "put the carrot on the plate"

    def reset(self, seed=None, options=None):
        self._t = 0
        return self._obs(), {}

    def step(self, action):
        assert np.asarray(action).shape == (self.n, 7)
        self._t += 1
        truncated = np.full(self.n, self._t >= 8)
        info = {}
        if truncated.all():
            info = {
                "episode_stats": {
                    "moved_correct_obj": np.ones(self.n),
                    "moved_wrong_obj": np.zeros(self.n),
                    "is_src_obj_grasped": np.ones(self.n),
                    "source_intention": np.ones(self.n),
                },
                "success": np.zeros(self.n, bool),
            }
        return self._obs(), 0.0, np.zeros(self.n, bool), truncated, info

    def _obs(self):
        eef = np.tile(
            np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8]), (self.n, 1)
        )
        return {"agent": {"eef_pos": eef}}


def fake_ms3_image_getter(env, obs):
    return np.zeros((env.n, 48, 48, 3), np.uint8)


class FakeLiberoTask:
    bddl_file = "fake.bddl"
    language = "open the drawer"


class FakeLiberoSuite:
    n_tasks = 1

    def get_task(self, task_id):
        return FakeLiberoTask()

    def get_task_init_states(self, task_id):
        return [np.zeros(4)]


class FakeLiberoEnv:
    def __init__(self):
        self._t = 0

    def reset(self):
        self._t = 0

    def seed(self, s):
        pass

    def set_init_state(self, state):
        return self._obs()

    def step(self, action):
        self._t += 1
        done = self._t > 40
        return self._obs(), 0.0, done, {}

    def _obs(self):
        return {
            "agentview_image": np.zeros((64, 64, 3), np.uint8),
            "robot0_eef_pos": np.zeros(3),
            "robot0_eef_quat": np.array([0, 0, 0, 1.0]),  # xyzw identity
            "robot0_gripper_qpos": np.array([0.04, -0.04]),
        }


@pytest.mark.slow
class TestBatchedAndLiberoEvaluators:
    def test_ms3_batched_loop(self, tmp_path, monkeypatch):
        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        from intact_tpu.protocol.websocket_policy_server import WebsocketPolicyServer
        from intact_tpu.serve.policy_wrapper import Pi0PolicyWrapper
        from intact_tpu.envs.evaluators.simplerMS3 import SimplerMS3Evaluator

        cfg = make_cfg(port=18631)
        cfg.eval_cfg.simulator_name = "simplerMS3"
        cfg.eval_cfg.env_adapter = "BatchBridgeSimplerAdapter"
        cfg.eval_cfg.n_parallel_eval = 2
        cfg.eval_cfg.n_eval_episode = 2
        cfg.finalize()
        wrapper = Pi0PolicyWrapper(cfg)
        server = WebsocketPolicyServer(wrapper, host="127.0.0.1", port=18631)
        start_server_thread(server.serve_forever)

        client_cfg = make_cfg(port=18631)
        client_cfg.eval_cfg.simulator_name = "simplerMS3"
        client_cfg.eval_cfg.env_adapter = "BatchBridgeSimplerAdapter"
        client_cfg.eval_cfg.n_parallel_eval = 2
        client_cfg.eval_cfg.n_eval_episode = 2
        client_cfg.eval_cfg.role = "client"
        client_cfg.finalize()
        ev = SimplerMS3Evaluator(
            client_cfg, env_factory=lambda t, n, s: FakeMS3Env(n),
            image_getter=fake_ms3_image_getter,
        )
        results = ev.evaluate()
        task = results["widowx_carrot_on_plate"]
        assert task["Move Correct"] == 1.0
        assert task["Success Rate"] == 0.0
        # buffered per task, then FLUSHED once per checkpoint sweep
        assert ev._wandb_buffer == {}

    def test_libero_loop(self, tmp_path, monkeypatch):
        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        from intact_tpu.protocol.websocket_policy_server import WebsocketPolicyServer
        from intact_tpu.serve.policy_wrapper import Pi0PolicyWrapper
        from intact_tpu.envs.evaluators.libero import LiberoEvaluator

        cfg = make_cfg(port=18632)
        cfg.eval_cfg.simulator_name = "libero"
        cfg.eval_cfg.env_adapter = "LiberoAdapter"
        cfg.eval_cfg.task_list = ["libero_spatial"]
        cfg.eval_cfg.n_eval_episode = 1
        cfg.eval_cfg.recording = False
        cfg.finalize()
        wrapper = Pi0PolicyWrapper(cfg)
        server = WebsocketPolicyServer(wrapper, host="127.0.0.1", port=18632)
        start_server_thread(server.serve_forever)

        client_cfg = make_cfg(port=18632)
        client_cfg.eval_cfg.simulator_name = "libero"
        client_cfg.eval_cfg.env_adapter = "LiberoAdapter"
        client_cfg.eval_cfg.task_list = ["libero_spatial"]
        client_cfg.eval_cfg.n_eval_episode = 1
        client_cfg.eval_cfg.recording = False
        client_cfg.eval_cfg.role = "client"
        client_cfg.finalize()
        ev = LiberoEvaluator(
            client_cfg, suite_factory=lambda n: FakeLiberoSuite(),
            env_factory=lambda task, res, seed: (FakeLiberoEnv(), task.language),
        )
        results = ev.evaluate()
        assert results["libero_spatial"]["Success Rate"] == 1.0


@pytest.mark.slow
class TestMS3ThroughBatchingServer:
    def test_ms3_vectorized_client_through_batching_server(self, tmp_path, monkeypatch):
        """A vectorized ManiSkill3 client (multi-row requests) drives the
        CONTINUOUS-BATCHING server: rows fuse alongside the bucket padding
        and scatter back per request (round-3 unified infer_batch)."""
        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        from intact_tpu.serve.batching import BatchingPolicyServer
        from intact_tpu.serve.policy_wrapper import Pi0PolicyWrapper
        from intact_tpu.envs.evaluators.simplerMS3 import SimplerMS3Evaluator

        cfg = make_cfg(port=18633)
        cfg.eval_cfg.simulator_name = "simplerMS3"
        cfg.eval_cfg.env_adapter = "BatchBridgeSimplerAdapter"
        cfg.eval_cfg.n_parallel_eval = 2
        cfg.eval_cfg.n_eval_episode = 2
        cfg.eval_cfg.max_batch_size = 4
        cfg.finalize()
        wrapper = Pi0PolicyWrapper(cfg)
        server = BatchingPolicyServer(
            wrapper, cfg, host="127.0.0.1", port=18633,
            metadata={"model": "pi0_tiny"}, max_batch_size=4,
            batch_timeout_ms=10, prewarm=False,
        )
        start_server_thread(server.serve_forever)

        client_cfg = make_cfg(port=18633)
        client_cfg.eval_cfg.simulator_name = "simplerMS3"
        client_cfg.eval_cfg.env_adapter = "BatchBridgeSimplerAdapter"
        client_cfg.eval_cfg.n_parallel_eval = 2
        client_cfg.eval_cfg.n_eval_episode = 2
        client_cfg.eval_cfg.role = "client"
        client_cfg.finalize()
        ev = SimplerMS3Evaluator(
            client_cfg, env_factory=lambda t, n, s: FakeMS3Env(n),
            image_getter=fake_ms3_image_getter,
        )
        results = ev.evaluate()
        task = results["widowx_carrot_on_plate"]
        assert task["Move Correct"] == 1.0
