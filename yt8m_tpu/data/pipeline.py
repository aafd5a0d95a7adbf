"""High-throughput input pipeline: C++ parser + background prefetch.

This is the performance path (reference: TF queue-runners with
--num_readers parse threads feeding shuffle_batch_join; SURVEY.md §3.1).
Here a native parser (cpp/yt8m_io.cc) fills batch buffers directly —
uint8 frame features stay uint8 all the way to the device — and a
prefetch thread overlaps parsing with TPU execution.

Falls back to the pure-Python BatchIterator when the shared library can't
be built (behavioural parity is tested either way).
"""

from __future__ import annotations

import ctypes
import logging
import os
import queue
import subprocess
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from yt8m_tpu.data.readers import ReaderConfig
from yt8m_tpu.data.tfrecord import glob_files

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "cpp", "yt8m_io.cc")
_LIB_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_LIB_DIR, "libyt8m_io.so")

log = logging.getLogger("yt8m_tpu.data")

_lib_handle = None
_lib_lock = threading.Lock()


def _build_library() -> Optional[str]:
    os.makedirs(_LIB_DIR, exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
        _SRC
    ):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None


def get_native_lib():
    """Load (building if needed) the native parser; None if unavailable."""
    global _lib_handle
    with _lib_lock:
        if _lib_handle is not None:
            return _lib_handle or None
        path = _build_library()
        if path is None:
            _lib_handle = False
            return None
        lib = ctypes.CDLL(path)
        lib.yt8m_reader_new.restype = ctypes.c_void_p
        lib.yt8m_reader_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.yt8m_reader_add_file.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p
        ]
        lib.yt8m_reader_free.argtypes = [ctypes.c_void_p]
        lib.yt8m_reader_labels_dropped.restype = ctypes.c_longlong
        lib.yt8m_reader_labels_dropped.argtypes = [ctypes.c_void_p]
        lib.yt8m_reader_set_validate.argtypes = [
            ctypes.c_void_p, ctypes.c_int
        ]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.yt8m_reader_next_frame_batch.restype = ctypes.c_int
        lib.yt8m_reader_next_frame_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, u8p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.yt8m_reader_next_video_batch.restype = ctypes.c_int
        lib.yt8m_reader_next_video_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, f32p, i32p, i32p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.yt8m_format_topk.restype = ctypes.c_int64
        lib.yt8m_format_topk.argtypes = [
            ctypes.c_char_p, ctypes.c_int, f32p, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
        ]
        _lib_handle = lib
        return lib


_ID_STRIDE = 32
# Flat label-budget FACTOR: each batch's label buffer holds
# batch * this many label slots, shared across the batch (real YT-8M
# averages ~3.4 labels/video, max ~23 — the budget never binds there).
# The parser writes every video's labels VERBATIM (no per-video cap;
# reference reader semantics) and counts budget overflow, which the
# iterator surfaces as a loud warning instead of silent truncation.
_LABELS_BUDGET_PER_VIDEO = 64


class NativeBatchIterator:
    """Batches from the C++ parser; same batch dict as BatchIterator."""

    def __init__(
        self,
        file_pattern,
        config: ReaderConfig,
        batch_size: int,
        num_epochs: Optional[int] = 1,
        shuffle: bool = False,
        seed: int = 0,
        pad_final_batch: bool = True,
        drop_remainder: bool = False,
        prefetch: int = 2,
    ):
        self.lib = get_native_lib()
        if self.lib is None:
            raise RuntimeError("native yt8m_io library unavailable")
        if isinstance(file_pattern, str):
            self.files = glob_files(file_pattern)
        else:
            self.files = list(file_pattern)
        if not self.files:
            raise IOError(f"no files matched {file_pattern!r}")
        self.config = config
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.shuffle = shuffle
        self.seed = seed
        self.pad_final_batch = pad_final_batch
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch

    def _new_reader(self, files: Sequence[str]):
        cfg = self.config
        names, sizes = cfg.names_and_sizes
        arr_names = (ctypes.c_char_p * len(names))(
            *[n.encode() for n in names]
        )
        arr_sizes = (ctypes.c_int * len(sizes))(*sizes)
        distill = (cfg.distill_feature or "").encode()
        handle = self.lib.yt8m_reader_new(
            arr_names, arr_sizes, len(names), cfg.max_frames,
            1 if cfg.frame_features else 0, distill, cfg.distill_dim,
        )
        self.lib.yt8m_reader_set_validate(
            handle, int(getattr(cfg, "validate_crc", 1))
        )
        for f in files:
            self.lib.yt8m_reader_add_file(handle, f.encode())
        return handle

    def _raw_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        cfg = self.config
        bsz = self.batch_size
        dim = cfg.feature_dim
        labels_cap = bsz * _LABELS_BUDGET_PER_VIDEO
        rng = np.random.default_rng(self.seed)
        epoch = 0
        has_distill = bool(cfg.distill_feature)
        while self.num_epochs is None or epoch < self.num_epochs:
            files = list(self.files)
            if self.shuffle:
                rng.shuffle(files)
            handle = self._new_reader(files)
            try:
                while True:
                    # frame level: padded rows report 0 frames (matches the
                    # Python reader); video level: always 1.
                    num_frames = (
                        np.zeros((bsz,), np.int32)
                        if cfg.frame_features
                        else np.ones((bsz,), np.int32)
                    )
                    label_off = np.zeros((bsz + 1,), np.int32)
                    labels_flat = np.zeros((labels_cap,), np.int32)
                    ids_buf = ctypes.create_string_buffer(bsz * _ID_STRIDE)
                    distill_buf = (
                        np.zeros((bsz, cfg.distill_dim), np.float32)
                        if has_distill
                        else None
                    )
                    distill_ptr = (
                        distill_buf.ctypes.data_as(ctypes.c_void_p)
                        if distill_buf is not None
                        else None
                    )
                    if cfg.frame_features:
                        feats = np.zeros(
                            (bsz, cfg.max_frames, dim), np.uint8
                        )
                        n = self.lib.yt8m_reader_next_frame_batch(
                            handle, bsz, feats, num_frames, label_off,
                            labels_flat, labels_cap, ids_buf, _ID_STRIDE,
                            distill_ptr,
                        )
                    else:
                        feats = np.zeros((bsz, dim), np.float32)
                        n = self.lib.yt8m_reader_next_video_batch(
                            handle, bsz, feats, label_off, labels_flat,
                            labels_cap, ids_buf, _ID_STRIDE, distill_ptr,
                        )
                    if n < 0:
                        raise RuntimeError("native parser error")
                    if n == 0:
                        break
                    yield self._finish_batch(
                        n, feats, num_frames, label_off, labels_flat,
                        ids_buf, distill_buf,
                    )
            finally:
                dropped = self.lib.yt8m_reader_labels_dropped(handle)
                if dropped:
                    log.warning(
                        "native reader: %d labels exceeded the batch "
                        "label budget (batch_size * %d slots) and were "
                        "DROPPED — ground truth is incomplete for this "
                        "epoch; raise the budget or the batch size",
                        dropped, _LABELS_BUDGET_PER_VIDEO,
                    )
                self.lib.yt8m_reader_free(handle)
            epoch += 1

    def _finish_batch(
        self, n, feats, num_frames, label_off, labels_flat, ids_buf,
        distill_buf,
    ) -> Dict[str, np.ndarray]:
        cfg = self.config
        bsz = self.batch_size
        keep = bsz if (self.pad_final_batch and n < bsz) else n
        dense = np.zeros((keep, cfg.num_classes), np.float32)
        rows = np.repeat(
            np.arange(n), np.diff(label_off[: n + 1]).clip(min=0)
        )
        cols = labels_flat[: label_off[n]]
        valid = (cols >= 0) & (cols < cfg.num_classes)
        dense[rows[valid], cols[valid]] = 1.0
        mask = np.zeros((keep,), np.float32)
        mask[:n] = 1.0
        ids: List[bytes] = []
        raw = ids_buf.raw
        for i in range(keep):
            if i < n:
                chunk = raw[i * _ID_STRIDE : (i + 1) * _ID_STRIDE]
                ids.append(chunk.split(b"\x00", 1)[0])
            else:
                ids.append(b"")
        batch = {
            "id": ids,
            "features": feats[:keep],
            "labels": dense,
            "num_frames": num_frames[:keep],
            "batch_mask": mask,
        }
        if distill_buf is not None:
            batch["teacher"] = distill_buf[:keep]
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        gen = self._raw_batches()
        if self.drop_remainder:
            gen = (
                b for b in gen
                if int(b["batch_mask"].sum()) == self.batch_size
            )
        if self.prefetch <= 0:
            yield from gen
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[BaseException] = []

        def worker():
            try:
                for item in gen:
                    q.put(item)
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


class _FanoutBatchIterator:
    """Shared scaffolding for the parallel-parse iterators: glob +
    round-robin file sharding + worker-count clamp. Subclasses provide
    __iter__ with their worker substrate (threads vs spawn processes —
    the queue/sentinel/error marshalling genuinely differs: object
    identity and exceptions survive a queue.Queue but not a pickling
    mp.Queue)."""

    def __init__(
        self,
        file_pattern,
        config: ReaderConfig,
        batch_size: int,
        num_workers: int = 4,
        queue_depth: int = 2,
        **iter_kw,
    ):
        if isinstance(file_pattern, str):
            self.files = glob_files(file_pattern)
        else:
            self.files = list(file_pattern)
        if not self.files:
            raise IOError(f"no files matched {file_pattern!r}")
        self.config = config
        self.batch_size = batch_size
        self.num_workers = max(1, min(num_workers, len(self.files)))
        self.queue_depth = queue_depth
        self.iter_kw = iter_kw

    def _file_shards(self):
        shards = [
            self.files[w :: self.num_workers]
            for w in range(self.num_workers)
        ]
        return [s for s in shards if s]


class ThreadedBatchIterator(_FanoutBatchIterator):
    """Parallel parse: files fanned across reader THREADS (the reference's
    --num_readers semantics — train.py :: get_input_data_tensors ran N
    parse threads into shuffle_batch_join).

    Each thread runs its own native reader handle over a disjoint
    round-robin file subset; the ctypes call releases the GIL for the
    whole C++ parse+copy, so threads genuinely parallelize on multi-core
    hosts — and unlike the process fan-out there is NO pickle/pipe copy
    of the 345 KB/video batches: finished numpy batch dicts are handed
    over by reference through a bounded queue. Batch order interleaves
    across threads (like shuffle_batch_join); every video appears exactly
    once per epoch.
    """

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(
            maxsize=self.queue_depth * self.num_workers
        )
        sentinel = object()
        stop = threading.Event()

        def worker(files_w):
            try:
                it = NativeBatchIterator(
                    files_w, self.config, self.batch_size, prefetch=0,
                    **self.iter_kw,
                )
                for batch in it:
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:
                # stop-aware put: if the consumer abandoned the generator
                # with the queue full, don't block forever holding the
                # native reader open.
                while not stop.is_set():
                    try:
                        q.put(e, timeout=0.1)
                        break
                    except queue.Full:
                        continue
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        threads = []
        for files_w in self._file_shards():
            t = threading.Thread(
                target=worker, args=(files_w,), daemon=True
            )
            t.start()
            threads.append(t)
        live = len(threads)
        try:
            while live:
                item = q.get()
                if item is sentinel:
                    live -= 1
                    continue
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class MultiprocessBatchIterator(_FanoutBatchIterator):
    """Parallel parse: files fanned across worker processes.

    Reference semantics: --num_readers parallel parse threads feeding
    shuffle_batch_join (train.py :: get_input_data_tensors). Each worker
    runs the native parser over a disjoint round-robin file subset and
    ships finished batch dicts back over a queue; batch order interleaves
    across workers (like shuffle_batch_join), per-worker order preserved,
    every video appears exactly once per epoch.
    """

    def __init__(self, *args, queue_depth: int = 4, **kw):
        # deeper queue than the threaded variant: pickled batches arrive
        # burstier than in-process handoffs
        super().__init__(*args, queue_depth=queue_depth, **kw)


    @staticmethod
    def _worker(files, config, batch_size, iter_kw, q):
        try:
            it = NativeBatchIterator(
                files, config, batch_size, prefetch=0, **iter_kw
            )
            for batch in it:
                q.put(batch)
        except Exception as e:  # pragma: no cover - propagated below
            q.put(e)
        finally:
            q.put(None)

    def __iter__(self):
        import multiprocessing as mp

        # spawn (not fork): workers only need numpy + the ctypes parser,
        # and forking a process with an initialised TPU client is unsafe.
        ctx = mp.get_context("spawn")
        q = ctx.Queue(maxsize=self.queue_depth * self.num_workers)
        procs = []
        for files_w in self._file_shards():
            p = ctx.Process(
                target=self._worker,
                args=(files_w, self.config, self.batch_size,
                      self.iter_kw, q),
                daemon=True,
            )
            p.start()
            procs.append(p)
        live = len(procs)
        try:
            while live:
                item = q.get()
                if item is None:
                    live -= 1
                    continue
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            for p in procs:
                p.terminate()
                p.join(timeout=5)


def make_batch_iterator(
    file_pattern, config, batch_size, num_readers: int = 1,
    reader_processes: bool = False, **kw
):
    """Native iterator when buildable (threaded fan-out when num_readers
    > 1, the reference's parse-thread semantics; process fan-out opt-in
    via reader_processes for GIL-heavy custom paths), else the Python
    fallback."""
    if get_native_lib() is not None:
        try:
            if num_readers > 1 and reader_processes:
                return MultiprocessBatchIterator(
                    file_pattern, config, batch_size,
                    num_workers=num_readers, **kw,
                )
            if num_readers > 1:
                return ThreadedBatchIterator(
                    file_pattern, config, batch_size,
                    num_workers=num_readers, **kw,
                )
            return NativeBatchIterator(
                file_pattern, config, batch_size, **kw
            )
        except RuntimeError:
            pass
    from yt8m_tpu.data.readers import BatchIterator

    kw.pop("prefetch", None)
    return BatchIterator(file_pattern, config, batch_size, **kw)
