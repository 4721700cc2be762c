"""Wire-format and transport tests (no simulators, no TPU).

The msgpack-numpy byte layout is a compatibility contract with the reference
clients, so these tests pin exact round-trip semantics, and an end-to-end
server<->client exchange runs against a fake policy in a thread.
"""

import threading

import numpy as np
import pytest

from intact_tpu.protocol import msgpack_numpy


class TestMsgpackNumpy:
    def test_ndarray_roundtrip(self):
        for dtype in [np.float32, np.float64, np.uint8, np.int64, np.bool_]:
            arr = (np.random.rand(3, 4, 5) * 100).astype(dtype)
            out = msgpack_numpy.unpackb(msgpack_numpy.packb(arr))
            np.testing.assert_array_equal(out, arr)
            assert out.dtype == arr.dtype

    def test_nested_dict_roundtrip(self):
        obs = {
            "image": np.zeros((224, 224, 3), dtype=np.uint8),
            "state": np.arange(7, dtype=np.float32),
            "task": "put carrot on plate",
            "nested": {"x": np.float32(1.5), "flag": True},
        }
        out = msgpack_numpy.unpackb(msgpack_numpy.packb(obs))
        np.testing.assert_array_equal(out["image"], obs["image"])
        np.testing.assert_array_equal(out["state"], obs["state"])
        assert out["task"] == "put carrot on plate"
        assert out["nested"]["x"] == np.float32(1.5)
        assert out["nested"]["flag"] is True

    def test_scalar_generic(self):
        out = msgpack_numpy.unpackb(msgpack_numpy.packb(np.float64(3.25)))
        assert out == 3.25

    def test_rejects_object_dtype(self):
        with pytest.raises(ValueError, match="Unsupported dtype"):
            msgpack_numpy.packb(np.array([object()]))

    def test_wire_layout_is_tagged_map(self):
        """Pin the exact wire schema the reference clients expect."""
        import msgpack

        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        raw = msgpack.unpackb(msgpack_numpy.packb(arr))
        assert raw[b"__ndarray__"] is True
        assert raw[b"dtype"] == "<f4"
        assert raw[b"shape"] == [2, 3]
        assert raw[b"data"] == arr.tobytes()


class EchoPolicy:
    """Fake policy: returns obs['state'] * 2 as the action."""

    def __init__(self):
        self.resets = 0
        self.model_path = None

    def select_action(self, obs):
        return np.asarray(obs["state"]) * 2

    def reset(self):
        self.resets += 1

    def switch_model(self, path):
        self.model_path = path


class TestWebsocketTransport:
    @pytest.fixture
    def server_client(self):
        import asyncio

        from intact_tpu.protocol.websocket_policy_client import WebsocketPolicyClient
        from intact_tpu.protocol.websocket_policy_server import WebsocketPolicyServer

        policy = EchoPolicy()
        server = WebsocketPolicyServer(
            policy, host="127.0.0.1", port=0, metadata={"model": "echo"}
        )
        loop = asyncio.new_event_loop()
        port_holder = {}
        started = threading.Event()

        stop_holder = {}

        async def _run():
            import websockets.asyncio.server

            stop_holder["stop"] = asyncio.Event()
            async with websockets.asyncio.server.serve(
                server._handler, "127.0.0.1", 0, compression=None, max_size=None
            ) as ws_server:
                port_holder["port"] = ws_server.sockets[0].getsockname()[1]
                started.set()
                # exit through the context manager (never loop.stop(): that
                # abandons websockets' Server._close coroutine unawaited)
                await stop_holder["stop"].wait()

        def _thread():
            try:
                loop.run_until_complete(_run())
            except Exception:
                pass
            finally:
                loop.close()

        t = threading.Thread(target=_thread, daemon=True)
        t.start()
        assert started.wait(10)
        client = WebsocketPolicyClient(
            "127.0.0.1", port_holder["port"], retry_interval_s=0.1
        )
        yield policy, client
        # Teardown must never hang: abortively close the client FIRST (so the
        # server's close handshake sees a dead TCP peer, not a silent one),
        # then signal a clean exit through the async-with.
        try:
            client._ws.close_socket()  # abortive close, skips handshake
        except Exception:
            pass
        try:
            loop.call_soon_threadsafe(stop_holder["stop"].set)
        except RuntimeError:
            pass
        t.join(timeout=5)
        if t.is_alive():  # last resort: hard-stop the loop
            try:
                loop.call_soon_threadsafe(loop.stop)
            except RuntimeError:
                pass
            t.join(timeout=5)

    def test_metadata_infer_reset_switch(self, server_client):
        policy, client = server_client
        assert client.get_server_metadata() == {"model": "echo"}

        action = client.infer({"state": np.arange(4, dtype=np.float32)})
        np.testing.assert_allclose(action, [0, 2, 4, 6])

        assert client.reset() == {"status": "reset"}
        assert policy.resets == 1

        assert client.switch_model("/ckpt/step_100") == {"status": "model switched"}
        assert policy.model_path == "/ckpt/step_100"

    def test_server_error_ships_traceback_and_survives(self, server_client):
        """An inference exception reaches the client as a RuntimeError
        carrying the server traceback (string frame + INTERNAL_ERROR close,
        reference websocket_policy_server.py:82-91), and the server still
        accepts NEW connections afterward."""
        from intact_tpu.protocol.websocket_policy_client import (
            WebsocketPolicyClient,
        )

        policy, client = server_client
        host, port = client.host, client.port
        with pytest.raises(RuntimeError, match="KeyError"):
            client.infer({"wrong_key": np.zeros(3, np.float32)})  # no "state"

        fresh = WebsocketPolicyClient(host, port, retry_interval_s=0.1)
        action = fresh.infer({"state": np.arange(3, dtype=np.float32)})
        np.testing.assert_allclose(action, [0, 2, 4])


class TestImageTools:
    def test_convert_to_uint8(self):
        from intact_tpu.protocol.image_tools import convert_to_uint8

        img = np.full((4, 4, 3), 0.5, dtype=np.float32)
        out = convert_to_uint8(img)
        assert out.dtype == np.uint8
        assert out[0, 0, 0] == 127

    def test_resize_with_pad_shape_and_centering(self):
        from intact_tpu.protocol.image_tools import resize_with_pad

        img = np.full((2, 100, 200, 3), 255, dtype=np.uint8)
        out = resize_with_pad(img, 224, 224)
        assert out.shape == (2, 224, 224, 3)
        # wide image -> vertical zero bands top/bottom, content centered
        assert out[0, 0, 112, 0] == 0
        assert out[0, 112, 112, 0] == 255

    def test_resize_with_pad_noop(self):
        from intact_tpu.protocol.image_tools import resize_with_pad

        img = np.zeros((1, 224, 224, 3), dtype=np.uint8)
        assert resize_with_pad(img, 224, 224) is img
