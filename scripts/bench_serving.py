"""End-to-end serving throughput: continuous-batching server + N websocket
clients + Pi0-3B on the chip.

Unlike bench.py (pure device throughput), this measures the WHOLE serving
stack — msgpack wire, per-connection adapters, request fusing into bucketed
device batches — i.e. the north-star configuration (BASELINE.md: >=1000
aggregate policy steps/s on a v5e-8; per chip target 125).

Prints ONE JSON line like bench.py.

Usage:
  python scripts/bench_serving.py --clients 32 --seconds 30
  python scripts/bench_serving.py --tiny --cpu --clients 4 --seconds 5  # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PER_CHIP_BASELINE = 1000.0 / 8.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--timeout-ms", type=float, default=10.0)
    ap.add_argument("--port", type=int, default=18900)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--model",
                    choices=["pi0", "mvla", "octo", "spatialvla", "magma"],
                    default="pi0",
                    help="model family; every family serves through the same "
                         "continuous-batching server via its infer_batch fuse")
    ap.add_argument("--profile-host", action="store_true",
                    help="per-stage host-time budget: wraps preprocess / "
                         "fuse / device call / msgpack with accumulating "
                         "timers and prints seconds + share of wall")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from intact_tpu.config.pipeline import (
        EnvConfig,
        EvalConfig,
        TrainPipelineConfig,
    )
    from intact_tpu.serve.batching import BatchingPolicyServer
    from intact_tpu.serve.policy_wrapper import make_policy_wrapper

    # each family's registry type + the adapter the reference pairs it with
    model_types = {
        "pi0": "pi0", "mvla": "mvla", "octo": "octo",
        "spatialvla": "spatialvla_native", "magma": "magma_native",
    }
    adapters = {
        "pi0": "BridgeSimplerAdapter", "mvla": "BridgeSimplerAdapter",
        "octo": "OctoBridgeSimplerAdapter",
        "spatialvla": "BridgeSimplerAdapter", "magma": "BridgeSimplerAdapter",
    }
    if args.int8 and args.model not in ("pi0", "mvla", "spatialvla", "magma"):
        # validate BEFORE the (potentially minutes-long) model build
        print("--int8 is wired for the pi0/mvla/spatialvla/magma serving "
              "paths only", file=sys.stderr)
        return 2

    mtype = model_types[args.model] + ("_tiny" if args.tiny else "")
    if args.model == "octo":
        # the adapter must resize to the model's input size exactly (the
        # OctoSession guard rejects mismatches): take it from the config
        from intact_tpu.models import registry

        s = registry.get(mtype)["default_config"]().image_size
        hw = (s, s)
    else:
        hw = (28, 28) if args.tiny else (224, 224)
    cfg = TrainPipelineConfig(
        name="bench_serving",
        model_cfg={"type": mtype},
        use_bf16=not args.cpu,
        tokenizer_path="hash",  # hermetic: instruction text is synthetic
        eval_cfg=EvalConfig(
            simulator_name="simpler",
            env_adapter=adapters[args.model],
            recording=False,
            port=args.port,
            action_step=4,
            max_batch_size=args.max_batch,
            batch_timeout_ms=args.timeout_ms,
            # the production int8 path: Pi0Policy quantizes at init and
            # re-quantizes on every hot swap (a raw params overwrite here
            # would silently lose int8 across switch_model)
            quantize_int8=args.int8,
        ),
        env=EnvConfig(
            dataset_statistics_path=str(REPO / "config/dataset/bridge_statistics.json"),
            image_size=hw,
        ),
    )

    t0 = time.time()
    wrapper = make_policy_wrapper(cfg)

    prof_acc: dict[str, float] = {}
    prof_cnt: dict[str, int] = {}
    if args.profile_host:
        # thin accumulating timers around the serving hot path — the
        # host-time budget VERDICT r3 task 4 asked for. GIL note: stages
        # run on different threads of ONE process, so shares can overlap;
        # they are read as "seconds of work attributed to stage X", not
        # disjoint wall segments.
        def wrap(obj, name, key):
            orig = getattr(obj, name)

            def timed(*a, **k):
                t = time.perf_counter()
                r = orig(*a, **k)
                prof_acc[key] = prof_acc.get(key, 0.0) + (time.perf_counter() - t)
                prof_cnt[key] = prof_cnt.get(key, 0) + 1
                return r

            setattr(obj, name, timed)

        wrap(wrapper.session_cls, "preprocess", "preprocess(adapter)")
        wrap(wrapper, "_infer_fused", "infer_fused(total)")
        if hasattr(wrapper, "policy") and hasattr(
                wrapper.policy, "sample_action_chunk"):
            wrap(wrapper.policy, "sample_action_chunk", "device(sample)")
        from intact_tpu.protocol import msgpack_numpy as _mn

        wrap(_mn, "unpackb", "msgpack.unpack(client+server)")

    server = BatchingPolicyServer(
        wrapper, cfg, host="127.0.0.1", port=args.port,
        metadata={"model": args.model}, max_batch_size=args.max_batch,
        batch_timeout_ms=args.timeout_ms, prewarm=True,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"# model init {time.time()-t0:.1f}s; prewarming buckets...", file=sys.stderr)

    from intact_tpu.protocol.websocket_policy_client import WebsocketPolicyClient

    hw = cfg.env.image_size[0]
    obs = {
        "observation.images.top": np.random.default_rng(0).integers(
            0, 255, (hw, hw, 3), dtype=np.uint8
        ),
        "observation.state": {
            "agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8])}
        },
        "task": "put the carrot on the plate",
    }

    counts = [0] * args.clients
    latencies: list[float] = []
    stop = threading.Event()
    ready = threading.Barrier(args.clients + 1)

    def client(i: int):
        c = WebsocketPolicyClient("127.0.0.1", args.port, retry_interval_s=1.0)
        c.infer(obs)  # connected + server warm
        ready.wait()
        while not stop.is_set():
            t = time.time()
            c.infer(obs)
            latencies.append(time.time() - t)
            counts[i] += 1

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    for t in threads:
        t.start()
    ready.wait()  # all clients connected and server compiled
    print("# clients connected; measuring...", file=sys.stderr)
    prof_acc.clear()  # drop prewarm-compile time from the budget
    prof_cnt.clear()
    t_start = time.time()
    time.sleep(args.seconds)
    stop.set()
    wall = time.time() - t_start
    for t in threads:
        t.join(timeout=30)

    total_infers = sum(counts)
    # spatialvla (ensembled) and magma (single AR decode) execute ONE env
    # action per inference; the chunking families execute action_step
    action_step = 1 if args.model in ("spatialvla", "magma") else cfg.eval_cfg.action_step
    steps_per_sec = total_infers * action_step / wall
    lat = sorted(latencies)
    p50 = lat[len(lat) // 2] if lat else float("nan")
    p95 = lat[int(len(lat) * 0.95)] if lat else float("nan")
    print(
        f"# {total_infers} inferences from {args.clients} clients in {wall:.1f}s; "
        f"client p50 {p50*1e3:.0f} ms p95 {p95*1e3:.0f} ms",
        file=sys.stderr,
    )
    if args.profile_host and prof_acc:
        dev = prof_acc.get("device(sample)", 0.0)
        fuse = prof_acc.get("infer_fused(total)", 0.0)
        if dev and fuse:
            prof_acc["fuse-assembly+postprocess(host)"] = fuse - dev
            prof_cnt["fuse-assembly+postprocess(host)"] = prof_cnt[
                "infer_fused(total)"]
        print("# host-time budget (seconds of attributed work over "
              f"{wall:.1f}s wall; threads overlap):", file=sys.stderr)
        for k in sorted(prof_acc, key=prof_acc.get, reverse=True):
            per = prof_acc[k] / max(prof_cnt[k], 1) * 1e3
            print(f"#   {k:34s} {prof_acc[k]:7.2f}s ({prof_acc[k] / wall:6.1%}"
                  f" of wall) {prof_cnt[k]:6d} calls  {per:7.2f} ms/call",
                  file=sys.stderr)
    print(json.dumps({
        "metric": f"{args.model}_serving_aggregate_policy_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "policy_steps/s",
        # the >=125/chip target is the Pi0 bridge operating point
        "vs_baseline": (
            round(steps_per_sec / PER_CHIP_BASELINE, 3)
            if args.model == "pi0" else None
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
