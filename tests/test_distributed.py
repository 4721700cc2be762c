"""Multi-process execution of the distributed backend (VERDICT round-2
next #4): two real OS processes rendezvous through
`jax.distributed.initialize` (CPU backend) and exchange data via
`process_mean` / `broadcast_from_host0` — the paths that replace the
reference's NCCL process-group init (configuration_pipeline.py:160-172)
and its all_reduce metric aggregation (trainer.py:453-460)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # single local CPU device per process
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from intact_tpu.parallel import distributed

distributed.initialize()
rank = jax.process_index()
assert jax.process_count() == 2, jax.process_count()

# cross-process metric mean: rank0 reports 1.0, rank1 reports 3.0
mean = distributed.process_mean({"loss": 1.0 + 2.0 * rank, "acc": float(rank)})

# host-0 broadcast: every process must end up with rank0's array
got = distributed.broadcast_from_host0(np.full(3, 10.0 + rank, np.float32))

# host-local batch -> global array (the trainer's data path): each process
# contributes ONLY its own rows; a jitted global reduction must see both
# hosts' rows, and local_rows must hand back exactly this host's input
from intact_tpu.parallel import (
    MeshConfig, make_mesh, batch_sharding, put_global_batch, local_rows,
)
mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=1))
local = np.arange(6, dtype=np.float32).reshape(2, 3) + 100.0 * rank
g = put_global_batch({"x": local}, batch_sharding(mesh))["x"]
assert g.shape == (4, 3), g.shape
total = float(jax.jit(lambda a: a.sum())(g))
roundtrip = np.asarray(local_rows(g))
assert roundtrip.shape == local.shape, roundtrip.shape
assert np.array_equal(roundtrip, local), (roundtrip, local)

# multi-host checkpointing into SHARED storage: a stale partial step dir
# (pre-created by the parent) must be cleared by process 0 behind the
# collective barrier, the Orbax save is collective over both processes,
# and any process can restore the committed step the moment save returns
import optax
from pathlib import Path
from jax.sharding import NamedSharding, PartitionSpec
from intact_tpu.train.checkpoint import restore_params, save_checkpoint
from intact_tpu.train.train_step import init_train_state

root = Path(os.environ["INTACT_TPU_TEST_CKPT_ROOT"])
rep = NamedSharding(mesh, PartitionSpec())
w = jax.make_array_from_callback(
    (2, 3), rep, lambda idx: np.full((2, 3), 5.0, np.float32)[idx]
)
saved = save_checkpoint(root, init_train_state({"w": w}, optax.sgd(0.0)), step=7)
restored = restore_params(
    root, {"w": np.zeros((2, 3), np.float32)}, shardings={"w": rep}
)
ckpt_sum = float(jax.jit(lambda a: a.sum())(restored["w"]))

print(json.dumps({
    "rank": rank,
    "mean": mean,
    "broadcast": [float(x) for x in got],
    "global_sum": total,
    "ckpt_committed": (saved / "auxiliary_data.json").exists(),
    "ckpt_sum": ckpt_sum,
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_initialize_mean_broadcast(tmp_path):
    port = _free_port()
    ckpt_root = tmp_path / "ckpt"
    # stale partial leftover of a "crash" at the SAME step the children will
    # save: no auxiliary_data.json marker, so save must clear it (process 0
    # only, behind the barrier) rather than fail on both ranks
    (ckpt_root / "step_7" / "params").mkdir(parents=True)
    (ckpt_root / "step_7" / "params" / "junk").write_text("x")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(rank),
            "HF_HUB_OFFLINE": "1",
            "PYTHONPATH": str(REPO),
            "INTACT_TPU_TEST_CKPT_ROOT": str(ckpt_root),
        })
        # fresh interpreters: conftest's 8-device XLA_FLAGS and the axon
        # platform pin must not leak into the children
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"rank process failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:
        # mean over {1.0, 3.0} and {0.0, 1.0}, identical on every process
        assert o["mean"] == {"acc": 0.5, "loss": 2.0}
        # broadcast carries rank0's value everywhere
        assert o["broadcast"] == [10.0, 10.0, 10.0]
        # global batch saw BOTH hosts' rows: sum(0..5) + sum(0..5 + 600)
        assert o["global_sum"] == 15.0 + 615.0
        # collective checkpoint: committed marker present, stale junk gone,
        # restore round-trips 2*3 leaves of 5.0 on both processes
        assert o["ckpt_committed"] is True
        assert o["ckpt_sum"] == 30.0
    assert not (ckpt_root / "step_7" / "params" / "junk").exists()
    assert (ckpt_root / "step_7" / "auxiliary_data.json").exists()
