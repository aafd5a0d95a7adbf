"""Serving export (reference: export_model.py :: ModelExporter, which wrote
a SavedModel taking serialized tf.Examples and returning top-k
indices+scores; SURVEY.md §2.1).

TPU-native equivalent: `jax.export` serialises the jitted
uint8-features -> top-k forward pass to StableHLO (portable across JAX
versions/devices), bundled with the orbax-saved params. `load_serving`
restores the pair and returns a callable.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from yt8m_tpu.models import ModelHParams, get_model, is_frame_level_model


def _serving_fn(model, variables, top_k: int, vocab_size: int):
    top_k = min(top_k, vocab_size)

    def serve(features, num_frames):
        out = model.apply(
            variables,
            features,
            num_frames,
            train=False,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        # serving_topk: Pallas exact top-k when exporting ON TPU with a
        # LOCKED batch size (it is what the fused-head serving path
        # pairs with — BENCH_NOTES "Pallas tail chain"). Under a
        # polymorphic batch (batch_size=0) every Pallas dispatch site
        # falls back to its XLA graph (kernels.static_shape — symbolic
        # dims can't trace the kernels' block arithmetic), and on CPU
        # the dispatch is off anyway — both keep the exported StableHLO
        # free of Mosaic custom-calls.
        from yt8m_tpu.kernels.topk import serving_topk

        values, indices = serving_topk(out["predictions"], top_k)
        return values, indices

    return serve


def export_model(
    export_dir: str,
    model_name: str,
    hparams: ModelHParams,
    params,
    batch_stats=None,
    batch_size: int = 0,
    top_k: int = 20,
    ema: bool = False,
) -> str:
    """Write {stablehlo.bin, params/, meta.json} under export_dir.

    batch_size 0 exports a POLYMORPHIC batch dimension
    (jax.export.symbolic_shape) so one artifact serves any batch size;
    a positive batch_size locks the export to that size.

    `ema=True` records that `params` is the Polyak/EMA average (the
    caller selects which tree to pass); meta.json carries the flag so
    serving artifacts are self-describing. meta.json also embeds the
    full ModelHParams so heterogeneous ensembles can rebuild each
    member from its own artifact (SURVEY.md §3.5).
    """
    import dataclasses as _dc

    from jax import export as jax_export

    os.makedirs(export_dir, exist_ok=True)
    model = get_model(model_name, hparams)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    serve = _serving_fn(model, variables, top_k, hparams.vocab_size)

    frame_level = is_frame_level_model(model_name)
    b = batch_size if batch_size else jax_export.symbolic_shape("b")[0]
    if frame_level:
        feat_shape = (b, hparams.max_frames, hparams.feature_dim)
        feat_dtype = jnp.uint8
    else:
        feat_shape = (b, hparams.feature_dim)
        feat_dtype = jnp.float32
    args = (
        jax.ShapeDtypeStruct(feat_shape, feat_dtype),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    exported = jax_export.export(jax.jit(serve))(*args)
    with open(os.path.join(export_dir, "stablehlo.bin"), "wb") as f:
        f.write(exported.serialize())

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(os.path.abspath(export_dir), "variables"),
        jax.device_get(variables),
    )
    ckptr.wait_until_finished()
    with open(os.path.join(export_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "model": model_name,
                "top_k": min(top_k, hparams.vocab_size),
                "frame_level": frame_level,
                # 0 = polymorphic batch dimension (any size serves)
                "batch_size": batch_size,
                "max_frames": hparams.max_frames,
                "feature_dim": hparams.feature_dim,
                "vocab_size": hparams.vocab_size,
                # True when params/ holds the Polyak/EMA average
                "ema": bool(ema),
                "hparams": _dc.asdict(hparams),
            },
            f,
        )
    return export_dir


def load_serving(export_dir: str):
    """Load an exported model; returns (callable, meta dict)."""
    from jax import export as jax_export

    with open(os.path.join(export_dir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(export_dir, "stablehlo.bin"), "rb") as f:
        exported = jax_export.deserialize(f.read())

    def serve(features, num_frames):
        return exported.call(features, num_frames)

    return serve, meta
