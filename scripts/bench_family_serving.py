#!/usr/bin/env python
"""Per-family FULL serving-step throughput at B=512, reference hparams.

One process, all families compiled+warmed first, then timed
back-to-back (the axon tunnel shows +-4-7% run-to-run, so only
same-process comparisons are trustworthy). Each step is the REAL
serving path — uint8 [B, 300, 1152] in HBM -> model (fused Pallas
kernels per current defaults) -> serving_topk top-20
(train/step.py :: make_topk_predict_step) — the same factory
infer/predict.py uses.

The r2 table in BENCH_NOTES ("Serving throughput of the VLAD/flagship
families") was measured with the XLA MoE head + approx_max_k tail;
since the r3 Pallas tail chain every family serves through the fused
MoE head + Pallas exact top-k, so these numbers re-baseline the table.

Env: YT8M_FAMILY_BATCH (default 512), YT8M_EXP_STEPS (default 30),
YT8M_FORCE_CPU=1 + YT8M_PALLAS_INTERPRET=1 + YT8M_EXP_TINY=1 for a
CPU interpret-mode smoke.
"""

import json
import os
import sys
import time
from collections import namedtuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# The axon site package force-sets JAX_PLATFORMS=axon at import; only a
# config.update wins over it (needed for the CPU smoke).
if os.environ.get("YT8M_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yt8m_tpu.data.quantize import dequantize
from yt8m_tpu.models import get_model
from yt8m_tpu.models.hparams import ModelHParams
from yt8m_tpu.train.step import make_topk_predict_step

# namedtuple registers as a pytree, so it can cross the jit boundary
# while still exposing .params/.batch_stats like TrainState does.
_ServeState = namedtuple("_ServeState", ["params", "batch_stats"])

B = int(os.environ.get("YT8M_FAMILY_BATCH", "512"))
STEPS = int(os.environ.get("YT8M_EXP_STEPS", "30"))

FAMILIES = [
    "GatedNetVladModel",
    "NetVladLstmModel",
    "AttentionPoolingModel",
    "NeXtVladModel",
    "LstmModel",
    "GruModel",
    # r4: the zoo tail (VERDICT r3 missing #4) — the families the
    # reference's ensembles leaned on but which had unit tests only.
    "NetFVModel",
    "FrameCnnModel",
    "ChainFrameModel",
    "ChainNetVladModel",
    "DeepCombineChainModel",
]

# YT8M_FAMILY_ONLY=Name1,Name2 restricts the run (e.g. a batch sweep
# of just the slow families without recompiling the whole zoo).
_only = os.environ.get("YT8M_FAMILY_ONLY")
if _only:
    _keep = {s.strip() for s in _only.split(",") if s.strip()}
    FAMILIES = [f for f in FAMILIES if f in _keep]


def main():
    hp = ModelHParams()
    if os.environ.get("YT8M_EXP_TINY") == "1":  # CPU interpret smoke
        hp = hp.replace(
            vocab_size=64, feature_dim=32, max_frames=16,
            dbof_cluster_size=64, dbof_hidden_size=32,
            netvlad_cluster_size=8, netvlad_hidden_size=32,
            nextvlad_cluster_size=8, nextvlad_hidden_size=32,
            lstm_cells=16, gru_cells=16,
            attention_hidden_size=16, attention_cluster_size=4,
            cnn_filters=16, cnn_layers=1,
            chain_stages=2, chain_hidden_size=16,
        )
    f, d = hp.max_frames, hp.feature_dim

    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(min(30, f), f + 1, size=(2,)).astype(np.int32)

    @jax.jit
    def make_batch(key):
        feats = jax.random.randint(
            key, (B, f, d), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)
        nf = jax.random.randint(key, (B,), min(30, f), f + 1, dtype=jnp.int32)
        return {"features": feats, "num_frames": nf}

    batches = [make_batch(jax.random.PRNGKey(i)) for i in range(4)]
    _ = jax.device_get(batches[-1]["num_frames"])
    key = jax.random.PRNGKey(2)

    steps, states = {}, {}
    for name in FAMILIES:
        model = get_model(name, hp)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            dequantize(jnp.asarray(host_u8, jnp.float32)),
            jnp.asarray(host_nf),
            train=False,
        )
        states[name] = _ServeState(
            params=jax.device_put(variables["params"]),
            batch_stats=jax.device_put(variables.get("batch_stats", {})),
        )
        steps[name] = make_topk_predict_step(model, 20)
        out = jax.device_get(steps[name](states[name], batches[0], key))
        assert out[0].shape == (B, min(20, hp.vocab_size))
        print(f"compiled {name}", flush=True)

    results = {}
    for name in FAMILIES:
        fn, state = steps[name], states[name]
        t0 = time.perf_counter()
        o = None
        for i in range(STEPS):
            o = fn(state, batches[i % len(batches)], key)
        _ = jax.device_get(o)
        ms = (time.perf_counter() - t0) / STEPS * 1e3
        results[name] = round(ms, 3)
        print(f"{name:24s} {ms:8.3f} ms  {B / ms * 1e3:10.0f} videos/s/chip",
              flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
