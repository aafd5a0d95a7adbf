#!/usr/bin/env python
"""Same-process A/B: fused MoE head kernel vs XLA head at SMALL batch.

The r3 tail-chain decision (BENCH_NOTES "Pallas tail chain") was
measured at B=2048 (the bench.py headline shape). The per-family table
runs B=512, and AttentionPoolingModel — the family where the head+topk
tail is the LARGEST fraction of the step — re-measured slower than its
r2 number. Hypothesis: the head kernel's win flips sign at small B.
Time the full attention serving step (and the DBoF step as control) at
B in {256, 512, 2048} x head in {pallas, xla}, one process.
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

_ServeState = namedtuple("_ServeState", ["params", "batch_stats"])

STEPS = int(os.environ.get("YT8M_EXP_STEPS", "30"))
BATCHES = tuple(
    int(b) for b in os.environ.get("YT8M_EXP_BATCHES", "256,512,2048").split(",")
)
MODELS = os.environ.get(
    "YT8M_EXP_MODELS", "AttentionPoolingModel,GatedDbofModel"
).split(",")


def main():
    hp0 = ModelHParams()
    if os.environ.get("YT8M_EXP_TINY") == "1":
        hp0 = hp0.replace(
            vocab_size=64, feature_dim=32, max_frames=16,
            dbof_cluster_size=64, dbof_hidden_size=32,
            attention_hidden_size=16, attention_cluster_size=4,
        )
    f, d = hp0.max_frames, hp0.feature_dim
    rng = np.random.default_rng(0)
    host_u8 = rng.integers(0, 256, size=(2, f, d), dtype=np.uint8)
    host_nf = rng.integers(min(30, f), f + 1, size=(2,)).astype(np.int32)

    results = {}
    for name in MODELS:
        for head in ("pallas", "xla"):
            hp = hp0.replace(moe_head_pallas=(head == "pallas"))
            model = get_model(name, hp)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                dequantize(jnp.asarray(host_u8, jnp.float32)),
                jnp.asarray(host_nf),
                train=False,
            )
            state = _ServeState(
                params=jax.device_put(variables["params"]),
                batch_stats=jax.device_put(
                    variables.get("batch_stats", {})
                ),
            )
            step = make_topk_predict_step(model, 20)
            for b in BATCHES:
                @jax.jit
                def make_batch(key, b=b):
                    feats = jax.random.randint(
                        key, (b, f, d), 0, 256, dtype=jnp.int32
                    ).astype(jnp.uint8)
                    nf = jax.random.randint(
                        key, (b,), min(30, f), f + 1, dtype=jnp.int32
                    )
                    return {"features": feats, "num_frames": nf}

                batches = [make_batch(jax.random.PRNGKey(i)) for i in range(4)]
                key = jax.random.PRNGKey(2)
                _ = jax.device_get(step(state, batches[0], key))
                t0 = time.perf_counter()
                o = None
                for i in range(STEPS):
                    o = step(state, batches[i % 4], key)
                _ = jax.device_get(o)
                ms = (time.perf_counter() - t0) / STEPS * 1e3
                label = f"{name} B={b} {head}"
                results[label] = round(ms, 3)
                print(f"{label:44s} {ms:8.3f} ms "
                      f"{b / ms * 1e3:10.0f} videos/s/chip", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
