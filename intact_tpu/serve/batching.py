"""Continuous-batching websocket policy server.

The reference server answers one request at a time per connection
(`websocket_policy_server.py:55-81`) and scales by launching 4 server
processes per GPU. On TPU the economics invert: one Pi0-3B inference for
batch 1 and batch 64 costs nearly the same wall-clock, so this server keeps
ONE model on the chip and fuses concurrent client requests into device-sized
batches:

  connection handlers ──obs──> request queue ──collect(max_batch, timeout)──>
  one sample_action_chunk ──scatter──> per-connection replies

Wire format is unchanged (msgpack-numpy, metadata push, reset/switch_model
control messages), so reference evaluator clients drive it unmodified.
Per-connection state (env adapter episode state like sticky grippers) lives
with the connection, not the model.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import logging
import traceback

import numpy as np
import websockets.asyncio.server
import websockets.frames

from intact_tpu.protocol import msgpack_numpy
from intact_tpu.utils.monitor import setup_logger
from intact_tpu.utils.pipeline import get_class_from_path


class _Request:
    __slots__ = ("inputs", "adapter", "future")

    def __init__(self, inputs, adapter, future):
        self.inputs = inputs
        self.adapter = adapter
        self.future = future


class BatchingPolicyServer:
    def __init__(
        self,
        policy,  # Pi0Policy-like: sample_action_chunk(batch) -> [N, chunk, D]
        config,
        host: str = "0.0.0.0",
        port: int = 8000,
        metadata: dict | None = None,
        max_batch_size: int = 64,
        batch_timeout_ms: float = 5.0,
        prewarm: bool = True,
    ):
        self._policy = policy
        self._config = config
        self._host = host
        self._port = port
        self._metadata = metadata or {}
        self._max_batch = max_batch_size
        self._timeout_s = batch_timeout_ms / 1000.0
        self._prewarm = prewarm
        self._queue: asyncio.Queue[_Request] = None  # created in run()
        # ONE device-work thread: inference and hot model swaps serialize on
        # it, so a switch_model never races an in-flight sample_action_chunk
        # (the default executor has many threads and would interleave them)
        self._device_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="device"
        )
        # power-of-two fused-batch buckets: the jitted sample path compiles
        # once per distinct batch size (~13 s for Pi0-3B), so arbitrary fused
        # sizes 1..max_batch cause a recompilation storm under a ramping
        # client fleet. Padding to buckets bounds compiles to len(buckets).
        self._buckets = []
        b = 1
        while b < max_batch_size:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(max_batch_size)
        self.logger = setup_logger(True, name="batching_server")
        self.logger.setLevel(logging.INFO)

    def _bucket_size(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        return self._max_batch

    def _make_adapter(self):
        return get_class_from_path(self._config.eval_cfg.env_adapter_path)(self._config)

    def serve_forever(self) -> None:
        asyncio.run(self.run())

    async def run(self):
        self._queue = asyncio.Queue()
        if self._prewarm:
            await asyncio.get_running_loop().run_in_executor(
                self._device_executor, self.prewarm_buckets
            )
        worker = asyncio.create_task(self._batch_worker())
        try:
            async with websockets.asyncio.server.serve(
                self._handler, self._host, self._port,
                compression=None, max_size=None,
            ) as server:
                self.logger.info(
                    "batching server on %s:%s (max_batch=%d, timeout=%.1fms)",
                    self._host, self._port, self._max_batch, self._timeout_s * 1e3,
                )
                await server.serve_forever()
        finally:
            worker.cancel()

    # ------------------------------------------------------------------

    async def _batch_worker(self):
        """Collect requests into batches and run the device once per batch."""
        loop = asyncio.get_running_loop()
        n_batches = 0
        n_requests = 0
        while True:
            first = await self._queue.get()
            batch = [first]
            deadline = loop.time() + self._timeout_s
            while len(batch) < self._max_batch:
                remaining = deadline - loop.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self._queue.get(), remaining))
                except asyncio.TimeoutError:
                    break
            n_batches += 1
            n_requests += len(batch)
            if n_batches % 50 == 0:
                self.logger.info(
                    "batching: %d batches, mean fused size %.1f",
                    n_batches, n_requests / n_batches,
                )
            try:
                results = await loop.run_in_executor(
                    self._device_executor, self._infer_batch, batch
                )
                # per-request outcomes: one client's bad input or failing
                # postprocess must not kill its co-batched neighbors'
                # episodes (the reference's per-request server only loses
                # the offending connection)
                for req, res in zip(batch, results):
                    if req.future.done():
                        continue
                    if isinstance(res, Exception):
                        req.future.set_exception(res)
                    else:
                        req.future.set_result(res)
            except Exception as e:  # device-call failure: affects the batch
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def prewarm_buckets(self) -> None:
        """Compile every fused-batch bucket before serving: one dummy
        inference per bucket so a ramping client fleet never pays a compile
        mid-traffic."""
        h, w = self._config.env.image_size
        state_dim = int(getattr(
            getattr(self._policy, "cfg", None), "max_state_dim", 8
        ) or 8)
        for b in self._buckets:
            fused = {
                "image": np.zeros((b, h, w, 3), np.float32),
                "state": np.zeros((b, state_dim), np.float32),
                "task": ["warmup"] * b,
            }
            self._policy.sample_action_chunk(fused)
            self.logger.info("prewarmed bucket %d", b)

    def _infer_batch(self, batch: list[_Request]):
        """-> one result OR Exception per request (same order). Mismatched
        input shapes and per-request postprocess failures are isolated to
        their request; only a device-call failure (raised) hits the batch."""
        ref_img = batch[0].inputs["image"].shape[1:]
        ref_state = batch[0].inputs["state"].shape[1:]
        outcome: dict[int, object] = {}
        good: list[_Request] = []
        for r in batch:
            if (r.inputs["image"].shape[1:] != ref_img
                    or r.inputs["state"].shape[1:] != ref_state):
                outcome[id(r)] = ValueError(
                    f"request shapes {r.inputs['image'].shape[1:]}/"
                    f"{r.inputs['state'].shape[1:]} do not match the fused "
                    f"batch ({ref_img}/{ref_state})"
                )
            else:
                good.append(r)
        if good:
            n = len(good)
            pad = self._bucket_size(n) - n
            imgs = np.concatenate([r.inputs["image"] for r in good])
            states = np.concatenate([r.inputs["state"] for r in good])
            if pad:  # replicate the last row up to the bucket boundary
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
                states = np.concatenate([states, np.repeat(states[-1:], pad, axis=0)])
            fused = {
                "image": imgs,
                "state": states,
                "task": [r.inputs["task"][0] for r in good]
                + [good[-1].inputs["task"][0]] * pad,
            }
            chunks = self._policy.sample_action_chunk(fused)  # [bucket, chunk, D]
            action_step = self._config.eval_cfg.action_step
            for i, req in enumerate(good):
                try:
                    env_dim = len(req.adapter.dataset_statistics["action"]["mean"])
                    outcome[id(req)] = req.adapter.postprocess(
                        chunks[i, :action_step, :env_dim]
                    )
                except Exception as e:
                    outcome[id(req)] = e
        return [outcome[id(r)] for r in batch]

    # ------------------------------------------------------------------

    async def _handler(self, websocket):
        packer = msgpack_numpy.Packer()
        adapter = self._make_adapter()  # per-connection episode state
        await websocket.send(packer.pack(self._metadata))
        loop = asyncio.get_running_loop()

        while True:
            try:
                obs = msgpack_numpy.unpackb(await websocket.recv())

                if isinstance(obs, dict) and obs.get("new_model_path") is not None:
                    # model swap is global to the shared policy. Running it on
                    # the single device thread drains queued inference batches
                    # first, so no in-flight sample uses half-swapped params;
                    # requests arriving during the load simply queue behind it.
                    await loop.run_in_executor(
                        self._device_executor, self._policy.load, obs["new_model_path"]
                    )
                    await websocket.send(packer.pack({"status": "model switched"}))
                    continue

                if isinstance(obs, dict) and obs.get("reset", False):
                    adapter.reset()
                    self._policy.reset()
                    await websocket.send(packer.pack({"status": "reset"}))
                    continue

                inputs = adapter.preprocess(obs)
                future = loop.create_future()
                await self._queue.put(_Request(inputs, adapter, future))
                action = await future
                await websocket.send(packer.pack(action))
            except websockets.ConnectionClosed:
                break
            except Exception:
                await websocket.send(traceback.format_exc())
                await websocket.close(
                    code=websockets.frames.CloseCode.INTERNAL_ERROR,
                    reason="Internal server error. Traceback included in previous frame.",
                )
                raise
