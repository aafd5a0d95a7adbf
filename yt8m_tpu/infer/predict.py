"""Inference driver (reference: inference.py :: inference, format_lines).

Writes the Kaggle submission CSV — `VideoId,LabelConfidencePairs` with
top-k `class score` pairs — and optionally dumps dense probabilities for
the ensembling stage (fork: inference-pre-ensemble.py).

TPU path: jitted forward + on-device top-k, so only [B, 2k] scalars cross
back to the host per batch.
"""

from __future__ import annotations

import ctypes
import gzip
import logging
import os
import time

import jax
import numpy as np

from yt8m_tpu.config import InferenceConfig
from yt8m_tpu.data.pipeline import make_batch_iterator
from yt8m_tpu.models import get_model
from yt8m_tpu.parallel import mesh as mesh_lib
from yt8m_tpu.train.loop import reader_config_from
from yt8m_tpu.train.step import make_predict_step, make_topk_predict_step

log = logging.getLogger("yt8m_tpu.infer")


def format_lines(video_ids, top_values, top_indices):
    """One CSV line per video: `vid,cls1 p1 cls2 p2 ...` sorted desc.

    Reference inference.py :: format_lines ("%i %g" pairs).
    """
    lines = []
    for vid, vals, idxs in zip(video_ids, top_values, top_indices):
        order = np.argsort(-vals, kind="stable")
        pairs = " ".join(
            "%i %g" % (int(idxs[j]), float(vals[j])) for j in order
        )
        vid_str = vid.decode() if isinstance(vid, bytes) else str(vid)
        lines.append(f"{vid_str},{pairs}\n")
    return lines


def format_lines_text(video_ids, top_values, top_indices) -> str:
    """format_lines via the native formatter (cpp/yt8m_io.cc ::
    yt8m_format_topk, byte-identical "%i %g" output, ~20x the Python
    formatter on one core); falls back to the Python path when the
    native library is unavailable. Returns one string."""
    from yt8m_tpu.data.pipeline import get_native_lib

    lib = get_native_lib()
    n = len(video_ids)
    if lib is None or n == 0:
        return "".join(format_lines(video_ids, top_values, top_indices))
    ids_arr = np.asarray(
        [v if isinstance(v, bytes) else str(v).encode()
         for v in video_ids],
        dtype="S",
    )
    stride = ids_arr.dtype.itemsize
    values = np.ascontiguousarray(top_values, np.float32)
    indices = np.ascontiguousarray(top_indices, np.int32)
    k = values.shape[1]
    cap = n * (stride + 2 + 32 * k)
    out = ctypes.create_string_buffer(cap)
    written = lib.yt8m_format_topk(
        ids_arr.tobytes(), stride, values, indices, n, k, out, cap
    )
    if written < 0:  # cannot happen with the cap above; belt-and-braces
        return "".join(format_lines(video_ids, top_values, top_indices))
    return out.raw[:written].decode()


def inference(config: InferenceConfig, state=None) -> dict:
    cfg = config
    hp = cfg.resolved_hparams()
    if cfg.ensemble_train_dirs:
        # On-device ensemble serving: a meta-model averaging N members
        # inside one jit (infer/ensemble_serve.py); the rest of this
        # pipeline is unchanged.
        from yt8m_tpu.infer.ensemble_serve import build_ensemble

        model = build_ensemble(cfg)
    else:
        model = get_model(cfg.model, hp)
    mesh = mesh_lib.make_mesh()
    rc = reader_config_from(cfg)

    it = make_batch_iterator(
        cfg.input_data_pattern,
        rc,
        batch_size=cfg.batch_size,
        num_readers=cfg.num_readers,
        reader_processes=cfg.reader_processes,
        shuffle=False,
        num_epochs=1,
        pad_final_batch=True,
    )

    topk_step = make_topk_predict_step(model, cfg.top_k, mesh=mesh)
    dump_topk = int(cfg.output_probabilities_topk or 0)
    dense_step = None
    sparse_step = None
    if cfg.output_probabilities_dir:
        if dump_topk > 0:
            # Fork-style sparse pre-ensemble storage: top-N (value, index)
            # pairs per video at full f32 precision (~1% of the dense size
            # at N=50 vs 4716 classes); missing classes densify to 0.
            sparse_step = make_topk_predict_step(
                model, dump_topk, mesh=mesh
            )
        else:
            dense_step = make_predict_step(model, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.seed)

    out_file = cfg.output_file
    opener = gzip.open if out_file.endswith(".gz") else open
    if cfg.output_probabilities_dir:
        os.makedirs(cfg.output_probabilities_dir, exist_ok=True)
        try:
            dump_dtype = np.dtype(cfg.output_probabilities_dtype)
        except TypeError:
            raise SystemExit(
                f"--output_probabilities_dtype="
                f"{cfg.output_probabilities_dtype!r} is not a valid numpy "
                f"dtype (try float32 or float16)"
            )
    else:
        dump_dtype = np.float32

    restored = state is not None
    n_videos, n_chunks = 0, 0
    nonfinite = 0
    pending = None

    def _drain(p, n_chunks):
        nonlocal nonfinite
        topk_out, dense_out, sparse_out, ids_all, keep = p
        ids = [v for v, m in zip(ids_all, keep) if m]
        from yt8m_tpu.kernels.topk import TOPK_NEG

        def _count_nonfinite(arr):
            # Diverged-checkpoint tripwire (cf. eval/loop.py): NaN/inf
            # confidences — or the top-k kernel's sanitisation sentinel
            # (exact_topk reports exactly TOPK_NEG for NaN/-inf inputs)
            # — must not ship silently.
            return int(np.sum(~(np.isfinite(arr) & (arr > TOPK_NEG))))

        if topk_out is not None:
            values = np.asarray(jax.device_get(topk_out[0]))[keep]
            indices = np.asarray(jax.device_get(topk_out[1]))[keep]
            nonfinite += _count_nonfinite(values)
            f.write(format_lines_text(ids, values, indices))
        if dense_out is not None or sparse_out is not None:
            path = os.path.join(
                cfg.output_probabilities_dir,
                f"predictions-{n_chunks:05d}.npz",
            )
            ids_arr = np.asarray(
                [i.decode() if isinstance(i, bytes) else str(i)
                 for i in ids]
            )
            if dense_out is not None:
                dense = np.asarray(jax.device_get(dense_out))[keep]
                nonfinite += _count_nonfinite(dense)
                np.savez_compressed(
                    path, ids=ids_arr, predictions=dense.astype(dump_dtype)
                )
            else:
                values = np.asarray(jax.device_get(sparse_out[0]))[keep]
                indices = np.asarray(jax.device_get(sparse_out[1]))[keep]
                nonfinite += _count_nonfinite(values)
                np.savez_compressed(
                    path,
                    ids=ids_arr,
                    values=values.astype(dump_dtype),
                    indices=indices.astype(np.int32),
                    num_classes=np.int32(cfg.num_classes),
                )
            n_chunks += 1
        return n_chunks

    t0 = time.time()
    f = opener(out_file, "wt") if out_file else None
    try:
        if f:
            f.write("VideoId,LabelConfidencePairs\n")
        for batch in it:
            if not restored:
                from yt8m_tpu.infer.ensemble_serve import (
                    restore_serving_state,
                )

                state, _ = restore_serving_state(
                    cfg, model, batch, mesh, step=cfg.checkpoint_step
                )
                restored = True
            device_batch = mesh_lib.shard_batch(batch, mesh)
            keep = batch["batch_mask"] > 0
            # One-deep pipeline: dispatch this batch's device work, then
            # drain the previous batch (CSV formatting / npz writing run
            # on the host while the device computes this batch).
            topk_out = (
                topk_step(state, device_batch, rng)
                if f is not None
                else None
            )
            dense_out = (
                dense_step(state, device_batch, rng)
                if dense_step is not None
                else None
            )
            sparse_out = (
                sparse_step(state, device_batch, rng)
                if sparse_step is not None
                else None
            )
            if pending is not None:
                n_chunks = _drain(pending, n_chunks)
            pending = (topk_out, dense_out, sparse_out, batch["id"], keep)
            n_videos += int(keep.sum())
        if pending is not None:
            n_chunks = _drain(pending, n_chunks)
    finally:
        if f:
            f.close()

    dt = max(time.time() - t0, 1e-9)
    stats = {
        "num_videos": n_videos,
        "videos_per_sec": n_videos / dt,
        "nonfinite_predictions": nonfinite,
    }
    if nonfinite:
        log.warning(
            "%d non-finite prediction values written (CSV and/or "
            "probability dumps) — the checkpoint has likely diverged "
            "and the output is not meaningful",
            nonfinite,
        )
    log.info(
        "inference done: %d videos at %.1f videos/sec -> %s",
        n_videos, stats["videos_per_sec"], out_file or
        cfg.output_probabilities_dir,
    )
    return stats
