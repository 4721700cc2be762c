"""Wire protocol: msgpack-numpy serialization + websocket policy transport.

Byte-compatible with the reference `packages/policy-server-client`
(websocket_policy_server.py:16-91, websocket_policy_client.py:19-81,
msgpack_numpy.py:21-57), so unmodified reference simulator clients
(Simpler / ManiSkill3 / LIBERO) can talk to TPU policy servers.
"""

from intact_tpu.protocol import msgpack_numpy
from intact_tpu.protocol.base_policy import BasePolicy
from intact_tpu.protocol.image_tools import convert_to_uint8, resize_with_pad

__all__ = [
    "msgpack_numpy",
    "BasePolicy",
    "convert_to_uint8",
    "resize_with_pad",
]
