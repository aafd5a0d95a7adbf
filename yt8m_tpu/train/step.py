"""Jitted train/eval/predict step factories.

One SPMD program: batch sharded over the 'data' mesh axis, params
replicated (or TP-sharded per parallel.mesh policy); GSPMD inserts the
gradient all-reduce over ICI. Donated state for in-place HBM update.

Reference counterpart: the per-tower build in train.py :: build_graph plus
utils.combine_gradients / clip_gradient_norms — all replaced by one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yt8m_tpu.train.losses import BaseLoss


def _prepare_features(feats):
    """Pass features through raw: models dequantize at the point of first
    arithmetic (after sampling/gather), so uint8 rides HBM untouched
    (SURVEY.md §6 bandwidth constraint; see frame_utils.ensure_float)."""
    return feats


def _is_manual(mesh) -> bool:
    """True when a serving/eval step must run under shard_map.

    Mosaic (Pallas TPU) kernels cannot be auto-partitioned by GSPMD: a
    multi-device jit containing one raises NotImplementedError at
    lowering ("Please wrap the call in a shard_map" —
    jax/_src/tpu_custom_call.py :: _tpu_custom_call_lowering). Serving
    and eval are embarrassingly data-parallel (every model reduction is
    per-video), so on a multi-device mesh the whole step body runs
    MANUAL: batch split on the data axis, state/rng replicated across
    every axis, and the two cross-batch reduces in the sparse eval step
    psum over the data axis. Single-device meshes (and mesh=None) keep
    the plain jit — bitwise-identical behavior and no extra lowering.

    Semantics note: the replicated rng key means frame-SAMPLING models
    (DBoF-family inference with iterations < max_frames) draw their
    sample indices per shard rather than once globally — the same
    distribution, different draws than the unwrapped step. Non-sampling
    models are bitwise-identical (test_manual_serving.py).
    """
    return mesh is not None and mesh.size > 1


def _jit_serving(body, mesh, out_specs):
    """jit a serving/eval step body, shard_map'd when the mesh is
    multi-device (see _is_manual). out_specs may be a single spec or a
    pytree matching the body's output; 'data' marks the per-video dim.

    State is pinned REPLICATED (in_specs P()): a TP- or FSDP-sharded
    checkpoint is resharded to replicated on every serving call — an
    all-gather per call, and no sharded-param memory benefit at serve
    time. That is deliberate: TP/FSDP are TRAIN-memory features (Adam
    moments dominate), serving state is ~4 bytes/param, and replication
    keeps every per-video Pallas kernel whole. Documented in
    docs/FLAGS.md (--model_parallel).
    """
    if not _is_manual(mesh):
        return jax.jit(body)
    from jax.sharding import PartitionSpec as P

    from yt8m_tpu.parallel.mesh import DATA_AXIS

    def _resolve(spec):
        return P(DATA_AXIS) if spec == "data" else P()

    out = jax.tree_util.tree_map(
        _resolve, out_specs,
        is_leaf=lambda x: isinstance(x, str),
    )
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            # state replicated (pytree-prefix spec), batch dim-0 on
            # 'data' (replicated across 'model' — per-video compute is
            # identical on every model-axis device), rng replicated.
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=out,
            # pallas_call emits ShapeDtypeStructs without vma
            # annotations, which jax 0.9's varying-manual-axes checker
            # rejects inside shard_map. The replication facts here are
            # simple and enforced by construction: per-video outputs
            # vary over 'data' only, and the cross-batch leaves are
            # psum'd over 'data' before return.
            check_vma=False,
        )
    )


def _masked_mean(per_example, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_example * mask) / denom


def make_train_step(
    model,
    loss_obj: BaseLoss,
    regularization_penalty: float = 1.0,
    aux_loss_weight: float = 0.5,
    donate: bool = True,
    ema_decay: float = 0.0,
    mesh=None,
    state_specs=None,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ema_decay > 0 maintains a Polyak average of the params in
    state.ema_params (serving-side selection via --use_ema_weights).

    mesh + state_specs select the MANUAL (shard_map) multi-device step
    (_make_manual_train_step) — required to keep the Pallas train
    kernels on multi-device meshes; mesh=None (or size 1) is the plain
    jit, where GSPMD handles any sharding."""
    if mesh is not None and mesh.size > 1:
        return _make_manual_train_step(
            model,
            loss_obj,
            regularization_penalty,
            aux_loss_weight,
            donate,
            ema_decay,
            mesh,
            state_specs,
        )

    def train_step(state, batch, rng):
        feats = _prepare_features(batch["features"])
        labels = batch["labels"]
        mask = batch["batch_mask"]
        num_frames = batch["num_frames"]
        teacher = batch.get("teacher")
        # Boosting (SURVEY.md §2.2 bagging/boosting): per-example weights
        # fold into the loss mask — weighted mean over live examples.
        weights = batch.get("example_weights")
        if weights is not None:
            mask = mask * weights

        def loss_fn(params):
            variables = {"params": params}
            has_bn = bool(state.batch_stats)
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables,
                feats,
                num_frames,
                train=True,
                teacher=teacher,
                rngs={"sample": rng},
                mutable=["batch_stats"] if has_bn else False,
            )
            if has_bn:
                out, new_model_state = out
            else:
                new_model_state = {}
            per_ex = loss_obj.calculate_loss(
                out["predictions"], labels, teacher=teacher
            )
            label_loss = _masked_mean(per_ex, mask)
            total = label_loss
            for aux_pred in out.get("aux_predictions", []):
                aux = _masked_mean(
                    loss_obj.calculate_loss(aux_pred, labels, teacher=teacher),
                    mask,
                )
                total = total + aux_loss_weight * aux
            reg = out.get("regularization_loss", jnp.float32(0.0))
            total = total + regularization_penalty * reg
            return total, (out, new_model_state, label_loss, reg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total_loss, (out, new_model_state, label_loss, reg)), grads = (
            grad_fn(state.params)
        )
        state = state.apply_gradients(grads=grads)
        if new_model_state:
            state = state.replace(
                batch_stats=new_model_state["batch_stats"]
            )
        if ema_decay > 0.0 and state.ema_params is not None:
            d = jnp.float32(ema_decay)
            state = state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: (
                        d * e.astype(jnp.float32)
                        + (1.0 - d) * p.astype(jnp.float32)
                    ).astype(e.dtype),
                    state.ema_params,
                    state.params,
                )
            )
        metrics = {
            "loss": total_loss,
            "label_loss": label_loss,
            "reg_loss": reg,
            "predictions": out["predictions"],
        }
        return state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def _make_manual_train_step(
    model,
    loss_obj: BaseLoss,
    regularization_penalty: float,
    aux_loss_weight: float,
    donate: bool,
    ema_decay: float,
    mesh,
    state_specs,
):
    """MANUAL (shard_map) multi-device train step.

    Why: GSPMD cannot auto-partition Mosaic (Pallas TPU) kernels — a
    multi-device jit containing one fails at lowering — so the r3
    Trainer forced the fused TRAIN kernels (custom-VJP LSTM/GRU
    recurrences, NeXtVLAD train core) off on every multi-device mesh,
    silently losing their measured 1.2-1.9x exactly where the 2 h
    north-star budget is computed (VERDICT r3 weak #1). This step runs
    the whole train body manual, so the kernels stay on.

    Semantics (validated ≡ the single-program step by
    tests/test_manual_train.py):

    - Batch dim-0 sharded over 'data'; the masked-mean loss divides by
      the GLOBAL mask sum (psum), so per-shard gradients sum — not
      average — to the global gradient.
    - Replicated params: local grads psum over 'data'.
    - FSDP-sharded params (PartitionSpec('data', ...) leaves of
      state_specs.params): gathered on use inside loss_fn via
      lax.all_gather(tiled) — whose AD transpose is psum_scatter, i.e.
      the gradient arrives as the shard's slice of the globally-summed
      gradient with no extra code. Adam moments and the EMA tree stay
      sharded (same policy), and the per-variable clip computes the
      full-variable norm via train/state.py :: grad_sharding.
    - Regularization is scaled by 1/n_data inside the local loss so the
      gradient psum reconstructs it exactly once.
    - BatchNorm: the Trainer builds the training model with
      hparams.bn_axis='data', so every BN site psum-averages its batch
      moments (models/norm.py) — matching GSPMD's global-batch stats.
    - rng: folded with the data-axis index, so frame-SAMPLING models
      draw per shard (same distribution, different draws than the
      single-program step — the serving wrapper's documented semantics;
      non-sampling models are unaffected).

    Tensor parallelism ('model' axis > 1) is NOT supported manually —
    the Trainer keeps the GSPMD step (kernels off) for TP meshes.
    """
    from jax.sharding import PartitionSpec as P

    from yt8m_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from yt8m_tpu.train.state import grad_sharding

    if mesh.shape.get(MODEL_AXIS, 1) != 1:
        raise NotImplementedError(
            "manual train step supports data-only meshes; use the GSPMD "
            "step (Pallas train kernels off) for model_parallel > 1"
        )
    if state_specs is None:
        raise ValueError("manual train step requires state_specs")
    param_specs = state_specs.params
    n_data = mesh.shape[DATA_AXIS]

    def _gather_full(p, spec):
        for dim, axes in enumerate(spec):
            if axes is None:
                continue
            for ax in axes if isinstance(axes, tuple) else (axes,):
                p = jax.lax.all_gather(p, ax, axis=dim, tiled=True)
        return p

    def _is_sharded(spec) -> bool:
        return any(ax is not None for ax in spec)

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        feats = _prepare_features(batch["features"])
        labels = batch["labels"]
        mask = batch["batch_mask"]
        num_frames = batch["num_frames"]
        teacher = batch.get("teacher")
        weights = batch.get("example_weights")
        if weights is not None:
            mask = mask * weights
        # Global loss normaliser: the single-program step divides by the
        # global live-example count; mask carries no gradient, so the
        # psum can sit outside loss_fn.
        den = jnp.maximum(jax.lax.psum(jnp.sum(mask), DATA_AXIS), 1.0)

        def loss_fn(local_params):
            params = jax.tree_util.tree_map(
                _gather_full, local_params, param_specs
            )
            variables = {"params": params}
            has_bn = bool(state.batch_stats)
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables,
                feats,
                num_frames,
                train=True,
                teacher=teacher,
                rngs={"sample": rng},
                mutable=["batch_stats"] if has_bn else False,
            )
            if has_bn:
                out, new_model_state = out
            else:
                new_model_state = {}
            per_ex = loss_obj.calculate_loss(
                out["predictions"], labels, teacher=teacher
            )
            # This shard's CONTRIBUTION to the global masked mean:
            # contributions psum to the global loss, so per-shard grads
            # psum to the global grad.
            label_contrib = jnp.sum(per_ex * mask) / den
            total = label_contrib
            for aux_pred in out.get("aux_predictions", []):
                aux = jnp.sum(
                    loss_obj.calculate_loss(
                        aux_pred, labels, teacher=teacher
                    )
                    * mask
                ) / den
                total = total + aux_loss_weight * aux
            reg = out.get("regularization_loss", jnp.float32(0.0))
            # reg is computed identically on every shard; 1/n_data makes
            # the gradient psum reconstruct it exactly once.
            total = total + regularization_penalty * reg / n_data
            return total, (out, new_model_state, label_contrib, reg)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (
            (total_contrib, (out, new_model_state, label_contrib, reg)),
            grads,
        ) = grad_fn(state.params)
        # Sharded leaves arrived globally-summed (all_gather transposes
        # to psum_scatter); replicated leaves are local contributions.
        grads = jax.tree_util.tree_map(
            lambda g, spec: (
                g if _is_sharded(spec) else jax.lax.psum(g, DATA_AXIS)
            ),
            grads,
            param_specs,
        )
        with grad_sharding(param_specs):
            state = state.apply_gradients(grads=grads)
        if new_model_state:
            state = state.replace(
                batch_stats=new_model_state["batch_stats"]
            )
        if ema_decay > 0.0 and state.ema_params is not None:
            d = jnp.float32(ema_decay)
            state = state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: (
                        d * e.astype(jnp.float32)
                        + (1.0 - d) * p.astype(jnp.float32)
                    ).astype(e.dtype),
                    state.ema_params,
                    state.params,
                )
            )
        metrics = {
            "loss": jax.lax.psum(total_contrib, DATA_AXIS),
            "label_loss": jax.lax.psum(label_contrib, DATA_AXIS),
            "reg_loss": reg,
            "predictions": out["predictions"],
        }
        return state, metrics

    metric_specs = {
        "loss": P(),
        "label_loss": P(),
        "reg_loss": P(),
        "predictions": P(DATA_AXIS),
    }
    fn = jax.jit(
        jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(state_specs, P(DATA_AXIS), P()),
            out_specs=(state_specs, metric_specs),
            # Pallas emits ShapeDtypeStructs without vma annotations
            # (see _jit_serving); replication facts are enforced by
            # construction — grads/metrics psum over 'data' before the
            # state update, BN moments psum inside the model.
            check_vma=False,
        ),
        donate_argnums=(0,) if donate else (),
    )
    return fn


def make_eval_step(model, loss_obj: BaseLoss, mesh=None):
    """eval_step(state, batch, rng) -> (predictions, per_example_loss).

    Pass the mesh on multi-device runs (see _is_manual)."""

    def eval_step(state, batch, rng):
        feats = _prepare_features(batch["features"])
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(
            variables,
            feats,
            batch["num_frames"],
            train=False,
            teacher=batch.get("teacher"),
            rngs={"sample": rng},
        )
        per_ex = loss_obj.calculate_loss(out["predictions"], batch["labels"])
        return out["predictions"], per_ex

    return _jit_serving(eval_step, mesh, ("data", "data"))


def make_sparse_eval_step(model, loss_obj: BaseLoss, k: int, mesh=None):
    """Eval step with ON-DEVICE metric sparsification.

    Instead of shipping dense [B, C] predictions to the host (18.9 KB/video
    at C=4716), returns the per-video top-K (value, index, label) triplets
    (exact, sorted descending via lax.top_k) plus the per-video positive
    counts and the padded-row-masked per-class positive totals — everything
    EvaluationMetrics needs, at ~0.8 KB/video for K=64. Host metric cost
    drops with it (no [B, C] argpartition per batch).

    Pass the mesh on multi-device runs (see _is_manual): the per-video
    outputs shard on 'data'; class_positives / nonfinite_predictions are
    psum'd so the host sees the same totals as the single-device step.
    """
    manual = _is_manual(mesh)

    def eval_step(state, batch, rng):
        feats = _prepare_features(batch["features"])
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(
            variables,
            feats,
            batch["num_frames"],
            train=False,
            teacher=batch.get("teacher"),
            rngs={"sample": rng},
        )
        preds = out["predictions"]
        labels = batch["labels"]
        per_ex = loss_obj.calculate_loss(preds, labels)
        kk = min(k, preds.shape[-1])
        # sorted_topk == lax.top_k bit-for-bit (both dispatch states);
        # on TPU the Pallas branch skips the Mosaic->XLA boundary
        # penalty after the fused MoE head (BENCH_NOTES "Pallas tail
        # chain") — metric bitwise-equality is unaffected.
        from yt8m_tpu.kernels.topk import sorted_topk

        vals, idx = sorted_topk(preds, kk)
        lab_k = jnp.take_along_axis(labels, idx, axis=1)
        pos = labels > 0
        row_keep = (batch["batch_mask"] > 0)[:, None]
        class_positives = (pos & row_keep).sum(axis=0).astype(jnp.int32)
        # Diverged-checkpoint tripwire: with the dense [B, C]
        # predictions never reaching the host, a NaN/inf forward
        # would otherwise degrade to garbage-but-bounded metrics
        # silently (exact_topk's sanitisation contract). One
        # masked reduce; the eval loop warns if any batch trips.
        nonfinite = jnp.sum(
            (~jnp.isfinite(preds)) & row_keep, dtype=jnp.int32
        )
        if manual:
            from yt8m_tpu.parallel.mesh import DATA_AXIS

            class_positives = jax.lax.psum(class_positives, DATA_AXIS)
            nonfinite = jax.lax.psum(nonfinite, DATA_AXIS)
        return {
            "loss": per_ex,
            "topk_values": vals,
            "topk_indices": idx.astype(jnp.int32),
            "topk_labels": lab_k.astype(jnp.float32),
            "labels_per_video": pos.sum(axis=1).astype(jnp.int32),
            "class_positives": class_positives,
            "nonfinite_predictions": nonfinite,
        }

    return _jit_serving(
        eval_step,
        mesh,
        {
            "loss": "data",
            "topk_values": "data",
            "topk_indices": "data",
            "topk_labels": "data",
            "labels_per_video": "data",
            "class_positives": "replicated",
            "nonfinite_predictions": "replicated",
        },
    )


def make_predict_step(model, mesh=None):
    """predict_step(state, batch, rng) -> predictions [B, C] float32.

    Pass the mesh on multi-device runs (see _is_manual)."""

    def predict_step(state, batch, rng):
        feats = _prepare_features(batch["features"])
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(
            variables,
            feats,
            batch["num_frames"],
            train=False,
            rngs={"sample": rng},
        )
        return out["predictions"]

    return _jit_serving(predict_step, mesh, "data")


def make_topk_predict_step(model, top_k: int = 20, mesh=None):
    """predict -> (top-k values [B,k] f32, indices [B,k] i32), on device.

    Keeping top-k on device shrinks device->host traffic from [B, 4716]
    floats to [B, 2k] — part of the >=10k videos/sec/chip inference budget.
    Pass the mesh on multi-device runs (see _is_manual).
    """

    def step(state, batch, rng):
        feats = _prepare_features(batch["features"])
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(
            variables,
            feats,
            batch["num_frames"],
            train=False,
            rngs={"sample": rng},
        )
        # serving_topk: Pallas exact top-k on TPU (no Pallas->XLA
        # boundary penalty after the fused MoE head — +18% full-step,
        # BENCH_NOTES "Pallas tail chain"), approx_max_k(recall=1.0)
        # elsewhere; both exact (value/index-set equality on-chip).
        from yt8m_tpu.kernels.topk import serving_topk

        k = min(top_k, out["predictions"].shape[-1])
        return serving_topk(out["predictions"], k)

    return _jit_serving(step, mesh, ("data", "data"))
