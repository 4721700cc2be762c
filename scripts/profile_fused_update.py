"""Microbench the fused joint step's per-layer optimizer update in
isolation, at the real bridge VLM-trunk scale.

The phase profile (scripts/profile_joint_phases.py) pins the fused step's
optimizer cost; this isolates ONE trunk_row_update (pack grads + pack
params + chunked decode->adam->encode + unpack + row scatter) so chunking /
layout variants can be swept in seconds instead of 2-minute full-step
compiles. HBM-traffic floor per VLM layer is ~1.3 GB => ~1.6 ms; anything
far above that is serialization or copy waste.

Usage:
  python scripts/profile_fused_update.py                # real chip
  python scripts/profile_fused_update.py --rows-chunk 1024 2048 8192 0
  (0 = whole layer in one chunk)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-chunk", type=int, nargs="*", default=[8192])
    ap.add_argument("--pallas", action="store_true",
                    help="per-leaf in-place kernel chain (ops/pallas_adam)")
    ap.add_argument("--pallas-leaf", action="store_true",
                    help="ONE kernel call on the biggest mlp leaf per layer")
    ap.add_argument("--leaf-fused", action="store_true",
                    help="per-leaf single-fusion XLA path (round-5 default),"
                         " bound AND exact scale modes")
    ap.add_argument("--scale-mode", default="exact",
                    choices=["exact", "bound"],
                    help="fp8 re-encode scales in the chunked path")
    ap.add_argument("--no-sr", action="store_true",
                    help="disable stochastic rounding (isolates threefry cost)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from intact_tpu.models import gemma
    from intact_tpu.models.pi0.config import Pi0Config
    from intact_tpu.train import fused_joint as fj
    from intact_tpu.train.optim import OptimizerConfig
    from intact_tpu.utils.device import drain_device_queue

    cfg = Pi0Config.tiny() if args.tiny else Pi0Config.bridge()
    L = cfg.vlm.depth

    # one trunk tree of stacked layer params, bridge scale
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        gemma.init_blocks(k, cfg.vlm)["blocks"]))(jax.random.key(0))
    pack = fj.TrunkPack(params, 2048)
    print(f"# VLM trunk: NB={pack.nb} rows "
          f"({pack.nb * 2048 * L / 1e9:.2f}G moment elems/tree)",
          file=sys.stderr)

    g_rows = jax.jit(lambda k: jax.tree.map(
        lambda x: 1e-3 * jax.random.normal(k, x.shape[1:], jnp.bfloat16),
        params))(jax.random.key(1))
    mu = {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e4m3fn),
          "scale": jnp.zeros((L, pack.nb), jnp.float32)}
    nu = {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e5m2),
          "scale": jnp.zeros((L, pack.nb), jnp.float32)}
    hp = OptimizerConfig(lr=5e-5, weight_decay=0.0)
    drain_device_queue((params, g_rows, mu, nu))

    from intact_tpu.ops import pallas_adam

    def run_variant(name, fn, n_calls):
        upd = jax.jit(fn, donate_argnums=(0, 2, 3))
        key = jax.random.key(2)
        p_, m_, n_ = params, mu, nu
        p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
        np.asarray(ss)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
            np.asarray(ss)
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2] / n_calls
        print(f"# {name}: {med*1e3:7.2f} ms/layer "
              f"-> {med*1e3*2*(L-1):6.1f} ms/step for both trunks(approx)",
              file=sys.stderr, flush=True)
        del p_, m_, n_

    def fresh():
        return (
            jax.jit(lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                gemma.init_blocks(k, cfg.vlm)["blocks"]))(jax.random.key(0)),
            {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e4m3fn),
             "scale": jnp.zeros((L, pack.nb), jnp.float32)},
            {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e5m2),
             "scale": jnp.zeros((L, pack.nb), jnp.float32)},
        )

    if args.pallas or args.pallas_leaf:
        leaves_tpl, treedef = jax.tree_util.tree_flatten(params)
        big_i = max(range(len(leaves_tpl)),
                    key=lambda i: pack.sizes[i] if pallas_adam.eligible(
                        pack.sizes[i], 2048) else -1)

        def body_pallas(layer, carry, only_leaf=None):
            stack, m, n, ss_acc = carry
            qm, sm = m["q"], m["scale"]
            qn, sn = n["q"], n["scale"]
            leaves_p = jax.tree_util.tree_leaves(stack)
            leaves_g = jax.tree_util.tree_leaves(g_rows)
            new_p = []
            for i, (p_leaf, g_leaf) in enumerate(zip(leaves_p, leaves_g)):
                nsz, r, off = pack.sizes[i], pack.rows[i], pack.offsets[i]
                use = pallas_adam.eligible(nsz, 2048) and (
                    only_leaf is None or i == only_leaf)
                if not use:
                    new_p.append(p_leaf)
                    continue
                p2, qm, sm, qn, sn, ss = pallas_adam.fused_adam_rows(
                    p_leaf.reshape(L, r, 2048), g_leaf.reshape(r, 2048),
                    qm, sm, qn, sn, layer=layer, seed=jnp.int32(1234 + i),
                    c1=jnp.float32(0.1), c2=jnp.float32(0.001),
                    lr=jnp.float32(5e-5), clip_factor=jnp.float32(1.0),
                    hp=hp, row_offset=off, stochastic=True)
                new_p.append(p2.reshape(p_leaf.shape))
                ss_acc = ss_acc + ss
            return (jax.tree_util.tree_unflatten(treedef, new_p),
                    {"q": qm, "scale": sm}, {"q": qn, "scale": sn}, ss_acc)

        if args.pallas:
            run_variant("pallas all-leaf chain", lambda s_, g_, m_, n_, k_:
                        jax.lax.fori_loop(0, L, lambda l, c: body_pallas(l, c),
                                          (s_, m_, n_, jnp.float32(0.0))), L)
            params, mu, nu = fresh()
            drain_device_queue((params, mu, nu))
        if args.pallas_leaf:
            frac = pack.sizes[big_i] * 1.0 / sum(
                sz for i, sz in enumerate(pack.sizes)
                if pallas_adam.eligible(sz, 2048))
            print(f"# single leaf = {pack.sizes[big_i]/1e6:.1f}M elems "
                  f"({100*frac:.0f}% of aligned tree)", file=sys.stderr)
            run_variant(
                f"pallas single-leaf[{big_i}]",
                lambda s_, g_, m_, n_, k_:
                jax.lax.fori_loop(0, L,
                                  lambda l, c: body_pallas(l, c, big_i),
                                  (s_, m_, n_, jnp.float32(0.0))), L)
            params, mu, nu = fresh()
            drain_device_queue((params, mu, nu))

    if args.leaf_fused:
        # the round-5 default XLA path: per-leaf single-fusion updates
        # against static moment row ranges (no pack/unpack, no lax.map),
        # bound or exact re-encode scales
        for scale_mode in ("bound", "exact"):
            def all_layers_lf(stack, g, m, n, key, _sm=scale_mode):
                leaves_tpl, treedef2 = jax.tree_util.tree_flatten(stack)

                def body(layer, carry):
                    stack, m, n, ss_acc = carry
                    leaves_p = jax.tree_util.tree_leaves(stack)
                    leaves_g = jax.tree_util.tree_leaves(g)
                    qm, sm = m["q"], m["scale"]
                    qn, sn = n["q"], n["scale"]
                    new_p = []
                    for i, (p_leaf, g_leaf) in enumerate(
                            zip(leaves_p, leaves_g)):
                        nsz, r, off = (pack.sizes[i], pack.rows[i],
                                       pack.offsets[i])
                        if nsz % 2048:
                            new_p.append(p_leaf)
                            continue
                        gr = g_leaf.reshape(r, 2048)
                        ss_acc = ss_acc + jnp.sum(
                            jnp.square(gr.astype(jnp.float32)))
                        qm_r = jax.lax.dynamic_slice(
                            qm, (layer, off, 0), (1, r, 2048))[0]
                        sm_r = jax.lax.dynamic_slice(
                            sm, (layer, off), (1, r))[0][:, None]
                        qn_r = jax.lax.dynamic_slice(
                            qn, (layer, off, 0), (1, r, 2048))[0]
                        sn_r = jax.lax.dynamic_slice(
                            sn, (layer, off), (1, r))[0][:, None]
                        p2n, qm2, sm2, qn2, sn2 = fj._fused_rows_update(
                            p_leaf[layer].reshape(r, 2048), gr,
                            qm_r, sm_r, qn_r, sn_r,
                            c1=jnp.float32(0.1), c2=jnp.float32(0.001),
                            lr=jnp.float32(5e-5),
                            clip_factor=jnp.float32(1.0), hp=hp,
                            key=jax.random.fold_in(key, layer * 131 + i),
                            stochastic=True, scale_mode=_sm)
                        new_p.append(p_leaf.at[layer].set(
                            p2n.reshape(p_leaf.shape[1:])
                            .astype(p_leaf.dtype)))
                        qm = jax.lax.dynamic_update_slice(
                            qm, qm2[None].astype(qm.dtype), (layer, off, 0))
                        sm = jax.lax.dynamic_update_slice(
                            sm, sm2[:, 0][None], (layer, off))
                        qn = jax.lax.dynamic_update_slice(
                            qn, qn2[None].astype(qn.dtype), (layer, off, 0))
                        sn = jax.lax.dynamic_update_slice(
                            sn, sn2[:, 0][None], (layer, off))
                    return (jax.tree_util.tree_unflatten(treedef2, new_p),
                            {"q": qm, "scale": sm},
                            {"q": qn, "scale": sn}, ss_acc)

                return jax.lax.fori_loop(
                    0, L, body, (stack, m, n, jnp.float32(0.0)))

            upd = jax.jit(all_layers_lf, donate_argnums=(0, 2, 3))
            key = jax.random.key(2)
            p_, m_, n_ = params, mu, nu
            p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
            np.asarray(ss)
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
                np.asarray(ss)
                ts.append(time.time() - t0)
            med = sorted(ts)[len(ts) // 2] / L
            print(f"# leaf-fused[{scale_mode}]: {med*1e3:7.2f} ms/layer "
                  f"-> {med*1e3*2*(L-1):6.1f} ms/step for both trunks(approx)",
                  file=sys.stderr, flush=True)
            del p_, m_, n_
            params, mu, nu = fresh()
            drain_device_queue((params, mu, nu))

    for rc in args.rows_chunk:
        rows_chunk = pack.nb if rc == 0 else rc

        def all_layers(stack, g, m, n, key):
            # every layer's update chained in ONE program (the real step's
            # reverse-scan context) — per-call tunnel dispatch (~30 ms)
            # otherwise swamps a per-layer microbench
            def body(layer, carry):
                stack, m, n, ss_acc = carry
                g2 = pack.pack(g)
                ss = jnp.sum(jnp.square(g2.astype(jnp.float32)))
                p2 = pack.pack(jax.tree.map(lambda a: a[layer], stack))
                p2n, qm, sm, qn, sn = fj._chunked_quant_update(
                    p2, g2, m["q"][layer], m["scale"][layer][:, None],
                    n["q"][layer], n["scale"][layer][:, None],
                    c1=0.1, c2=0.001, lr=jnp.float32(5e-5),
                    clip_factor=jnp.float32(1.0), hp=hp,
                    key=jax.random.fold_in(key, layer),
                    stochastic=not args.no_sr, block_size=2048,
                    rows_chunk=rows_chunk, scale_mode=args.scale_mode)
                stack = jax.tree.map(
                    lambda a, r: a.at[layer].set(r.astype(a.dtype)),
                    stack, pack.unpack(p2n))
                m = {"q": m["q"].at[layer].set(qm),
                     "scale": m["scale"].at[layer].set(sm[:, 0])}
                n = {"q": n["q"].at[layer].set(qn),
                     "scale": n["scale"].at[layer].set(sn[:, 0])}
                return stack, m, n, ss_acc + ss

            return jax.lax.fori_loop(
                0, L, body, (stack, m, n, jnp.float32(0.0)))

        upd = jax.jit(all_layers, donate_argnums=(0, 2, 3))
        key = jax.random.key(2)
        p_, m_, n_ = params, mu, nu
        # compile
        p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
        np.asarray(ss)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            p_, m_, n_, ss = upd(p_, g_rows, m_, n_, key)
            np.asarray(ss)
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2] / L
        print(f"# rows_chunk={rc:>6}[{args.scale_mode}]: {med*1e3:7.2f} ms/layer "
              f"-> {med*1e3*2*(L-1):6.1f} ms/step for both trunks(approx)",
              file=sys.stderr, flush=True)
        del p_, m_, n_
        # rebuild donated inputs for the next variant
        params = jax.jit(lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            gemma.init_blocks(k, cfg.vlm)["blocks"]))(jax.random.key(0))
        mu = {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e4m3fn),
              "scale": jnp.zeros((L, pack.nb), jnp.float32)}
        nu = {"q": jnp.zeros((L, pack.nb, 2048), jnp.float8_e5m2),
              "scale": jnp.zeros((L, pack.nb), jnp.float32)}
        drain_device_queue((params, mu, nu))
    return 0


if __name__ == "__main__":
    sys.exit(main())
