#!/usr/bin/env python
"""Decompose the NeXtVladModel train-step time on-chip.

The r3 fused SERVING kernel (kernels/nextvlad.py) removed the XLA
path's HBM blowup at inference (xe [B, F, lambda*D] ~1.4 GB f32 at
B=512 plus two [B, F, G, K] tensors). TRAINING still runs the jnp
graph (cross-batch BN) and pays those intermediates in the forward AND
their re-reads in the backward — but NeXtVLAD's param count (68M at
the reference config, printed by this script) is ~6x smaller than the
flagship NetVLAD family's 411M, so the Adam-HBM argument that made the
fused NetVLAD train core a wash (r2, BENCH_NOTES) does not transfer.
This profile decides whether a custom-VJP fused train core
(flash-style remat, netvlad_train.py pattern) is worth building.

  stage                      what it isolates
  -----------------------    ------------------------------------------
  fwd (loss_fn)              full forward incl. head + loss
  value_and_grad             fwd+bwd; bwd = this - fwd
  adam update (f32 mu)       optimizer HBM pass over the 68M params
  FULL train step            make_train_step (donated), f32 + bf16 mu
  aggregation fwd / v&g      the aggregation math alone (jnp oracle at
                             model shapes, grads wrt all five weights)
                             = the ceiling a fused train core attacks

Each stage is its own jit, synced with device_get. Tunnel variance
+-4-7%: compare within one run only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("YT8M_BENCH_BATCH", "256"))
F, D = 300, 1152
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "10"))


def timed(fn, *args, label="", n=STEPS):
    out = fn(*args)  # compile
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from yt8m_tpu.models import ModelHParams, get_model
    from yt8m_tpu.parallel import mesh as mesh_lib
    from yt8m_tpu.train.losses import get_loss
    from yt8m_tpu.train.state import init_train_state, make_optimizer
    from yt8m_tpu.train.step import make_train_step

    hp = ModelHParams()
    model = get_model("NeXtVladModel", hp)
    loss = get_loss("CrossEntropyLoss")
    mesh = mesh_lib.make_mesh()

    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.integers(0, 256, (B, F, D), dtype=np.uint8),
        "labels": (rng.random((B, 4716)) < 0.002).astype(np.float32),
        "num_frames": rng.integers(30, F + 1, (B,)).astype(np.int32),
        "batch_mask": np.ones((B,), np.float32),
    }

    for mu in ("float32", "bfloat16"):
        tx = make_optimizer(global_batch_size=B, adam_mu_dtype=mu)
        state = init_train_state(
            model, jax.random.PRNGKey(0), batch_np, tx, True
        )
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state.params)
        )
        if mu == "float32":
            print(f"params: {n_params/1e6:.1f}M", flush=True)
        state = jax.device_put(
            state,
            jax.tree_util.tree_map(
                lambda _: mesh_lib.replicated(mesh), state
            ),
        )
        device_batch = mesh_lib.shard_batch(batch_np, mesh)
        step_fn = make_train_step(model, loss)
        key = jax.random.PRNGKey(1)

        # donated step: thread the state, time steady-state
        state2, metrics = step_fn(state, device_batch, key)
        _ = jax.device_get(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(STEPS):
            state2, metrics = step_fn(
                state2, device_batch, jax.random.fold_in(key, i)
            )
        _ = jax.device_get(metrics["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        print(
            f"FULL train step (mu={mu})                  "
            f"{dt*1e3:8.2f} ms  -> {B/dt:.0f} videos/s/chip",
            flush=True,
        )
        if mu == "float32":
            # stage decomposition once (mu only affects the update);
            # use the threaded state's params (same values as init).
            params = state2.params
            # closure carries ONLY the small BN stats; params ride as
            # an arg (closure params would become HLO constants).
            extra_vars = (
                {"batch_stats": state2.batch_stats}
                if state2.batch_stats else {}
            )

            # batch rides as ARGS, not closure constants (the relay
            # rejects multi-MB HLO constant payloads).
            feats_d = jax.device_put(batch_np["features"])
            nf_d = jax.device_put(batch_np["num_frames"])
            labels_d = jax.device_put(batch_np["labels"])

            def loss_fn(params, feats, nf, labels):
                out, _ = model.apply(
                    {**extra_vars, "params": params},
                    feats,
                    nf,
                    train=True,
                    rngs={"sample": key},
                    mutable=["batch_stats"],
                )
                return loss.calculate_loss(
                    out["predictions"], labels
                ).mean()

            timed(
                jax.jit(loss_fn), params, feats_d, nf_d, labels_d,
                label="fwd (loss_fn)",
            )
            timed(
                jax.jit(jax.value_and_grad(loss_fn)),
                params, feats_d, nf_d, labels_d,
                label="value_and_grad",
            )
            timed(
                jax.jit(lambda s: s.apply_gradients(
                    grads=jax.tree_util.tree_map(jnp.zeros_like, s.params)
                )),
                state2,
                label="adam update alone (f32 mu)",
            )

            # Aggregation isolation: the jnp oracle at model shapes
            # (kernels/nextvlad.py reference — the exact math the model
            # runs pre-BN), grads wrt all five aggregation weights.
            # This is the ceiling a fused custom-VJP train core attacks;
            # everything else (BN, hidden FC, head, Adam) it keeps.
            from yt8m_tpu.kernels.nextvlad import (
                nextvlad_aggregate_reference,
            )

            g, lam = hp.nextvlad_groups, hp.nextvlad_expansion
            de = lam * D
            agg_w = {
                "expand_w": rng.normal(0, 0.05, (D, de)).astype(
                    np.float32
                ),
                "attn_w": rng.normal(0, 0.05, (de, g)).astype(
                    np.float32
                ),
                "attn_b": rng.normal(0, 0.05, (g,)).astype(np.float32),
                "cluster_w": rng.normal(
                    0, 0.05, (de, g * hp.nextvlad_cluster_size)
                ).astype(np.float32),
                "centers": rng.normal(
                    0, 0.05, (hp.nextvlad_cluster_size, de // g)
                ).astype(np.float32),
            }
            agg_w = jax.device_put(agg_w)

            def agg_fwd(w, feats, nf):
                return jnp.sum(
                    nextvlad_aggregate_reference(
                        feats, nf, w["expand_w"], w["attn_w"],
                        w["attn_b"], w["cluster_w"], w["centers"],
                        groups=g,
                    )
                )

            timed(
                jax.jit(agg_fwd), agg_w, feats_d, nf_d,
                label="aggregation fwd (jnp oracle)",
            )
            timed(
                jax.jit(jax.value_and_grad(agg_fwd)),
                agg_w, feats_d, nf_d,
                label="aggregation value_and_grad",
            )
        del state, state2, step_fn


if __name__ == "__main__":
    main()
