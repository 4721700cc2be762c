"""Serving: policy wrappers + websocket servers (simple and batching)."""
