#!/usr/bin/env python
"""Flagship (NetVladLstm) SERVING decomposition + working-point sweep
(VERDICT r4 next #6).

The flagship serves at 12.3k videos/s/chip (41.5 ms @ B=512) — the
slowest family, 1.23x the 10k target. This measures where the 41.5 ms
goes and whether any lever lifts it:

  1. decomposition @ B=512: full serving step, VLAD branch alone,
     LSTM branch alone (per layer), MoE head + top-20 tail — each its
     own jit, device_get-synced, same process.
  2. batch sweep of the FULL serving step: B=512/1024/2048 (attention
     gained 46% at B=2048 by amortising fixed overhead; the question
     is how much of the flagship step is fixed vs per-video).
  3. recurrence variants @ the best batch: Pallas kernel (default)
     vs lax.scan XLA path, and serving tile_b A/B — the train-side
     tb=64->128 win was 1.06x, worth confirming at serve time.

Usage (chip):  python scripts/profile_flagship_serving.py
Smoke (CPU):   YT8M_EXP_TINY=1 YT8M_FORCE_CPU=1 YT8M_PALLAS_INTERPRET=1 \
                 python scripts/profile_flagship_serving.py
Env: YT8M_EXP_STEPS (default 30 timed iterations per variant).
"""

import json
import os
import sys
import time
from collections import namedtuple

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

from yt8m_tpu.data.quantize import dequantize
from yt8m_tpu.models import get_model
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.step import make_topk_predict_step

_ServeState = namedtuple("_ServeState", ["params", "batch_stats"])

TINY = os.environ.get("YT8M_EXP_TINY") == "1"
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "5" if TINY else "30"))


def _hparams():
    hp = ModelHParams()
    if TINY:
        hp = hp.replace(
            vocab_size=64, feature_dim=32, max_frames=16,
            netvlad_cluster_size=8, netvlad_hidden_size=32,
            lstm_cells=16, moe_num_mixtures=2, compute_dtype="float32",
        )
    return hp


def _batch(b, f, d, seed=0):
    @jax.jit
    def gen(key):
        feats = jax.random.randint(
            key, (b, f, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        nf = jax.random.randint(
            key, (b,), min(30, f), f + 1, dtype=jnp.int32
        )
        return {"features": feats, "num_frames": nf}

    return gen(jax.random.PRNGKey(seed))


def _time(fn, *args, steps=STEPS):
    out = fn(*args)
    _ = jax.device_get(out)  # compile + settle
    t0 = time.perf_counter()
    for _i in range(steps):
        out = fn(*args)
    _ = jax.device_get(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    hp = _hparams()
    f, d = hp.max_frames, hp.feature_dim
    results = {}
    print(
        f"flagship serving profile: backend={jax.default_backend()} "
        f"F={f} D={d} steps={STEPS}",
        flush=True,
    )

    model = get_model("NetVladLstmModel", hp)
    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(min(30, f), f + 1, size=(2,)).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        dequantize(jnp.asarray(host_u8, jnp.float32)),
        jnp.asarray(host_nf),
        train=False,
    )
    state = _ServeState(
        params=jax.device_put(variables["params"]),
        batch_stats=jax.device_put(variables.get("batch_stats", {})),
    )
    key = jax.random.PRNGKey(2)

    # ---- 1. decomposition @ B=512 -----------------------------------
    B0 = 8 if TINY else 512
    batch = _batch(B0, f, d)
    step = make_topk_predict_step(model, 20)
    results["full_step_b512_ms"] = _time(step, state, batch, key)

    # branch probes: run the SAME module tree so params line up.
    from yt8m_tpu.models.frame_utils import ensure_float, frame_mask
    from yt8m_tpu.models.netvlad import _NetVladAggregation
    from yt8m_tpu.models.rnn import _LstmLayer, _run_rnn

    import flax.linen as nn

    class _VladOnly(nn.Module):
        hp: ModelHParams

        @nn.compact
        def __call__(self, features, num_frames):
            hpp = self.hp
            x = ensure_float(features)
            mask = frame_mask(num_frames, x.shape[1], jnp.float32)
            vlad, _ = _NetVladAggregation(
                cluster_size=hpp.netvlad_cluster_size,
                add_batch_norm=hpp.netvlad_add_batch_norm,
                dtype=hpp.dtype,
                use_pallas=hpp.netvlad_use_pallas,
                fused_train=hpp.netvlad_fused_train,
                bn_axis=hpp.bn_axis,
                name="vlad",
            )(x, num_frames, mask, train=False)
            w = self.param(
                "vlad_hidden_weights",
                nn.initializers.normal(0.01),
                (vlad.shape[-1], hpp.netvlad_hidden_size),
                jnp.float32,
            )
            return jnp.dot(
                vlad.astype(hpp.dtype), w.astype(hpp.dtype),
                preferred_element_type=jnp.float32,
            )

    class _LstmOnly(nn.Module):
        hp: ModelHParams

        @nn.compact
        def __call__(self, features, num_frames):
            hpp = self.hp
            x = ensure_float(features)
            return _run_rnn(
                functools.partial(
                    _LstmLayer, layer_norm=hpp.lstm_layer_norm
                ),
                x,
                num_frames,
                layers=hpp.lstm_layers,
                hidden=hpp.lstm_cells,
                dtype=hpp.dtype,
                bidirectional=False,
                pooling=hpp.lstm_pooling,
                train=False,
                use_pallas=hpp.lstm_use_pallas,
                residual=hpp.rnn_residual,
            )

    for tag, mod in (("vlad_branch", _VladOnly(hp)), ("lstm_branch",
                                                      _LstmOnly(hp))):
        v = mod.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(host_u8), jnp.asarray(host_nf),
        )

        @jax.jit
        def probe(params, feats, nf, _m=mod):
            return _m.apply(params, feats, nf)

        results[f"{tag}_b512_ms"] = _time(
            probe, v, batch["features"], batch["num_frames"]
        )

    # head + top-k tail: full step minus the two branches (the branches
    # and tail can't be timed truly in isolation without double-counting
    # the shared dequantize; report the residual).
    results["residual_tail_b512_ms"] = round(
        results["full_step_b512_ms"]
        - results["vlad_branch_b512_ms"]
        - results["lstm_branch_b512_ms"],
        3,
    )

    # ---- 2. batch sweep ----------------------------------------------
    for b in ([8, 16] if TINY else [512, 1024, 2048]):
        bt = _batch(b, f, d, seed=b)
        ms = _time(step, state, bt, key)
        results[f"full_step_b{b}_ms"] = ms
        results[f"videos_per_sec_b{b}"] = round(b / ms * 1e3, 0)
        print(
            f"B={b:5d}  {ms:8.2f} ms  {b / ms * 1e3:10.0f} v/s/chip",
            flush=True,
        )

    # ---- 3. recurrence variant: XLA scan path ------------------------
    hp_scan = hp.replace(lstm_use_pallas=False)
    model_scan = get_model("NetVladLstmModel", hp_scan)
    step_scan = make_topk_predict_step(model_scan, 20)
    best_b = 8 if TINY else max(
        [512, 1024, 2048],
        key=lambda b: results[f"videos_per_sec_b{b}"],
    )
    bt = _batch(best_b, f, d, seed=best_b)
    results["scan_variant_best_b_ms"] = _time(step_scan, state, bt, key)
    results["best_b"] = best_b

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
