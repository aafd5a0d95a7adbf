#!/usr/bin/env python
"""Decompose the NetVladLstmModel (flagship) train-step time on-chip.

r2 VERDICT #1: the north-star config trains at the bottom of the zoo
(~84-88 ms at B=256 => ~2.9-3.0k videos/s/chip) and the wavefront-fusion
decision was parked without a training profile. This produces it, with
the same real model / loss / optimizer code the Trainer runs:

  stage                      what it isolates
  -----------------------    ------------------------------------------
  fwd (loss_fn)              full forward incl. both branches + loss
  value_and_grad             fwd+bwd; bwd = this - fwd
  adam update (f32 mu)       optax chain: per-var clip + Adam + apply
  adam update (bf16 mu)      --adam_mu_dtype=bfloat16 variant
  FULL train step            make_train_step (donated), the headline
  -- branch attribution (standalone modules, flagship shapes) --
  lstm branch fwd / v&g      2x1024 fused custom-VJP recurrence path
  vlad branch fwd / v&g      NetVLAD K=256 + 294912->1024 hidden FC
  moe head fwd / v&g         MoeHead(4) on the fused [B, 2048]

Each stage is its own jit, synced with device_get (axon
block_until_ready can return early). Run back-to-back when comparing:
tunnel variance is +-4-7%.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, F, D, C = 256, 300, 1152, 4716
STEPS = 10


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

    mesh = mesh_lib.make_mesh()
    hp = ModelHParams(
        netvlad_cluster_size=256, netvlad_hidden_size=1024,
        lstm_cells=1024, lstm_layers=2, moe_num_mixtures=4,
    )
    model = get_model("NetVladLstmModel", hp)
    loss = get_loss("CrossEntropyLoss")

    rng = np.random.default_rng(0)
    batch_np = {
        "features": rng.integers(0, 256, size=(B, F, D), dtype=np.uint8),
        "labels": (rng.random((B, C)) < 0.002).astype(np.float32),
        "num_frames": rng.integers(30, F + 1, size=(B,)).astype(np.int32),
        "batch_mask": np.ones((B,), np.float32),
    }
    tx = make_optimizer(global_batch_size=B)
    state = init_train_state(
        model, jax.random.PRNGKey(0), batch_np, tx, True
    )
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"flagship params: {n_params/1e6:.1f}M", flush=True)
    state = jax.device_put(
        state,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), state),
    )
    device_batch = mesh_lib.shard_batch(batch_np, mesh)
    key = jax.random.PRNGKey(1)

    feats = device_batch["features"]
    labels = device_batch["labels"]
    nf = device_batch["num_frames"]
    bstats = state.batch_stats

    # ---- forward / fwd+bwd on the REAL model ---------------------------
    def loss_fn(params, batch_stats):
        out, _new = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, nf, train=True, rngs={"sample": key},
            mutable=["batch_stats"],
        )
        per_ex = loss.calculate_loss(out["predictions"], labels)
        return jnp.mean(per_ex) + out.get("regularization_loss", 0.0)

    fwd = jax.jit(loss_fn)
    vgrad = jax.jit(jax.value_and_grad(loss_fn))

    t_fwd = timed(fwd, state.params, bstats, label="forward (loss_fn)")
    t_vg = timed(
        lambda p, b: vgrad(p, b)[0], state.params, bstats,
        label="value_and_grad (fwd+bwd)",
    )
    print(f"{'  => backward alone':44s} {(t_vg-t_fwd)*1e3:8.2f} ms")

    # ---- Adam update alone (both mu dtypes) ----------------------------
    _, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params, bstats)
    grads = jax.device_put(
        grads,
        jax.tree_util.tree_map(lambda _: mesh_lib.replicated(mesh), grads),
    )

    @jax.jit
    def adam_f32(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), new_opt

    timed(
        lambda p, o, g: adam_f32(p, o, g)[0],
        state.params, state.opt_state, grads,
        label="adam update (f32 mu, per-var clip)",
    )

    tx16 = make_optimizer(global_batch_size=B, adam_mu_dtype="bfloat16")
    opt16 = jax.jit(tx16.init)(state.params)

    @jax.jit
    def adam_bf16(params, opt_state, grads):
        updates, new_opt = tx16.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), new_opt

    timed(
        lambda p, o, g: adam_bf16(p, o, g)[0],
        state.params, opt16, grads,
        label="adam update (bf16 mu)",
    )

    # ---- the full donated train step (headline) ------------------------
    step_fn = make_train_step(model, loss)
    state2, m = step_fn(state, device_batch, key)
    _ = jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state2, m = step_fn(state2, device_batch, jax.random.fold_in(key, i))
    _ = jax.device_get(m["loss"])
    t_step = (time.perf_counter() - t0) / STEPS
    print(f"{'FULL train step (donated)':44s} {t_step*1e3:8.2f} ms"
          f"   ({B/t_step:,.0f} videos/s/chip)", flush=True)

    # ---- branch attribution (standalone, flagship shapes) --------------
    import flax.linen as nn

    from yt8m_tpu.models.netvlad import _NetVladAggregation
    from yt8m_tpu.models.rnn import _LstmLayer, _run_rnn

    class LstmBranch(nn.Module):
        @nn.compact
        def __call__(self, x, num_frames, train=True):
            return _run_rnn(
                functools.partial(_LstmLayer, layer_norm=False),
                x, num_frames, layers=2, hidden=1024,
                dtype=jnp.bfloat16, bidirectional=False, pooling="last",
                train=train, use_pallas=True, residual=False,
            )

    class VladBranch(nn.Module):
        @nn.compact
        def __call__(self, x, num_frames, train=True):
            from yt8m_tpu.models.frame_utils import frame_mask
            mask = frame_mask(num_frames, x.shape[1], jnp.float32)
            vlad, _reg = _NetVladAggregation(
                cluster_size=256, add_batch_norm=True,
                dtype=jnp.bfloat16, use_pallas=True, fused_train=False,
                name="vlad",
            )(x, num_frames, mask, train=train)
            w = self.param(
                "hw", nn.initializers.normal(0.01),
                (vlad.shape[-1], 1024), jnp.float32,
            )
            vh = jnp.dot(
                vlad.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            vh = nn.BatchNorm(
                use_running_average=not train, momentum=0.99,
                epsilon=1e-3, dtype=jnp.float32, name="bn",
            )(vh)
            return nn.relu(vh)

    from yt8m_tpu.models.heads import MoeHead

    xf = jnp.asarray(batch_np["features"], jnp.uint8)
    xfloat = (xf.astype(jnp.float32) * (4.0 / 255.0) + (4.0 / 512.0 - 2.0))
    xfloat = jax.device_put(xfloat)
    nf_d = jax.device_put(batch_np["num_frames"])
    fused_in = jax.device_put(
        np.asarray(rng.normal(size=(B, 2048)), np.float32)
    )

    for name, mod, args in [
        ("lstm", LstmBranch(), (xfloat, nf_d)),
        ("vlad", VladBranch(), (xfloat, nf_d)),
    ]:
        variables = mod.init(jax.random.PRNGKey(0), *args, train=False)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        def branch_loss(p, *a):
            vs = {"params": p}
            if bs:
                vs["batch_stats"] = bs
            out = mod.apply(
                vs, *a, train=True, mutable=["batch_stats"] if bs else False
            )
            if bs:
                out, _ = out
            return jnp.sum(out.astype(jnp.float32) ** 2)

        jfwd = jax.jit(branch_loss)
        jvg = jax.jit(jax.value_and_grad(branch_loss))
        tf_ = timed(jfwd, params, *args, label=f"{name} branch fwd")
        tv_ = timed(
            lambda p, *a: jvg(p, *a)[0], params, *args,
            label=f"{name} branch fwd+bwd",
        )
        print(f"{'  => ' + name + ' bwd alone':44s} {(tv_-tf_)*1e3:8.2f} ms")

    head = MoeHead(
        num_mixtures=4, vocab_size=C, dtype=jnp.bfloat16
    )
    hv = head.init(jax.random.PRNGKey(0), fused_in)
    hp_ = hv["params"]

    def head_loss(p, x):
        out = head.apply({"params": p}, x)
        pred = out["predictions"] if isinstance(out, dict) else out
        return jnp.sum(pred.astype(jnp.float32) ** 2)

    head_fwd = jax.jit(head_loss)
    head_vg = jax.jit(jax.value_and_grad(head_loss))
    timed(head_fwd, hp_, fused_in, label="moe head fwd")
    timed(
        lambda p, x: head_vg(p, x)[0],
        hp_, fused_in, label="moe head fwd+bwd",
    )


if __name__ == "__main__":
    main()
