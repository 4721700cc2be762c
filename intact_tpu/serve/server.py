"""Server entry: pick the per-request server (reference semantics) or the
continuous-batching server (TPU default for >1 concurrent client)."""

from __future__ import annotations

from intact_tpu.protocol.websocket_policy_server import WebsocketPolicyServer


def serve(policy_wrapper, config, batching: bool | None = None) -> None:
    """Blocking. policy_wrapper follows the select_action/reset/switch_model
    surface; with batching enabled (default whenever max_batch_size > 1) it
    is served through the request-fusing server instead — every family
    (Pi0/MVLA, Octo, SpatialVLA, Magma) implements the `infer_batch` fuse
    contract, so continuous batching is not Pi0-specific."""
    ec = config.eval_cfg
    metadata = {
        "model": config.model_cfg.get("type", "pi0"),
        "action_step": ec.action_step,
    }
    use_batching = batching if batching is not None else ec.max_batch_size > 1

    if use_batching:
        from intact_tpu.serve.batching import BatchingPolicyServer

        BatchingPolicyServer(
            policy_wrapper,
            config,
            host=ec.host,
            port=ec.port,
            metadata=metadata,
            max_batch_size=ec.max_batch_size,
            batch_timeout_ms=ec.batch_timeout_ms,
            prewarm=ec.prewarm,
        ).serve_forever()
    else:
        WebsocketPolicyServer(
            policy_wrapper, host=ec.host, port=ec.port, metadata=metadata
        ).serve_forever()
