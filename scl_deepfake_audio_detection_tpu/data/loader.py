"""Host data pipeline: threaded prefetch feeding the device.

Replaces the reference's 8-worker forked ``DataLoader`` (``main.py:379``).
Item construction (audio IO + DSP) runs in a thread pool — numpy/FFT work
releases the GIL — while batches are assembled in deterministic index order
and handed to the device ahead of consumption (double buffering against the
TPU step).  Shuffling is seeded per epoch, so any run position is exactly
reproducible (the reference's unseeded worker RNGs are not).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

from scl_deepfake_audio_detection_tpu.data.datasets import (
    EvalDataset,
    SCLViewBatchBuilder,
)


def _put_or_stop(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """Blocking put that aborts when ``stop`` is set; True iff enqueued.

    A plain ``q.put`` parks the producer forever on a full prefetch queue
    when the consumer exits early (steps-capped epoch, exception in the
    train step) — ``stop`` is only observable between puts, so the thread,
    its executor workers, and prefetch+1 full batches would leak."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False



class TrainLoader:
    """Yields {'wav': [G, V, T], 'labels': [G, V], 'utts': list} per step."""

    def __init__(
        self,
        builder: SCLViewBatchBuilder,
        groups_per_step: int = 1,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 1234,
        prefetch: int = 2,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """``shard_index``/``num_shards``: multi-host data sharding — every
        process draws the same seeded global order and keeps its stride slice,
        so per-host streams are disjoint and globally reproducible (pass
        ``jax.process_index()``/``jax.process_count()`` on multi-host pods)."""
        self.builder = builder
        self.groups = groups_per_step
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = max(1, num_shards)

    def __len__(self) -> int:
        n = len(self.builder) // self.num_shards
        return n // self.groups if self.drop_last else -(-n // self.groups)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Seeded global order -> this process's slice, trimmed so every
        process sees the SAME number of steps.  Unequal per-host step counts
        would desync global-mesh collectives (host k runs a train_step its
        peers never join -> the pod deadlocks), so the stride slice is cut to
        the common floor(N / num_shards) length."""
        order = np.arange(len(self.builder))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            ).shuffle(order)
        if self.num_shards > 1:
            common = len(order) // self.num_shards
            order = order[self.shard_index :: self.num_shards][:common]
        if self.drop_last:
            order = order[: len(order) - len(order) % self.groups]
        return order

    # ---- per-loader hooks: which builder method, how items -> one batch ----
    def _build_one(self, i: int, epoch: int):
        return self.builder.build(int(i), epoch)

    def _assemble(self, items) -> Dict:
        utts = [u for u, _, _ in items]
        wav = np.stack([w for _, w, _ in items])
        labels = np.stack([l for _, _, l in items])
        return {"wav": wav, "labels": labels, "utts": utts}

    def epoch(self, epoch: int = 0) -> Iterator[Dict]:
        """One concurrency implementation for every train-loader flavor:
        subclasses override only ``_build_one``/``_assemble`` — the
        producer/queue/sentinel/early-exit machinery (which has needed
        dedicated shutdown fixes) lives in exactly one place."""
        order = self._epoch_order(epoch)

        steps = [order[i : i + self.groups] for i in range(0, len(order), self.groups)]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for step_idx in steps:
                        if stop.is_set():
                            return
                        items = list(
                            pool.map(lambda i: self._build_one(i, epoch), step_idx)
                        )
                        if not _put_or_stop(out_q, self._assemble(items), stop):
                            return
                _put_or_stop(out_q, None, stop)
            except BaseException as e:  # surface worker errors to the consumer
                _put_or_stop(out_q, e, stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class DeviceAugTrainLoader(TrainLoader):
    """TrainLoader variant for the on-device augmentation path: workers only
    decode + co-crop (``build_raw``); batches carry raw stacks for
    ``data/device_pipeline.DeviceViewComposer``.  On a single-core host this
    is the difference between ~3 items/s (full host DSP) and ~580 items/s
    (decode only) — the chip runs the augmentations instead.

    ``wire_dtype='int16'`` ships the raw stacks as PCM16 (half the
    host->device bytes; lossless for PCM16-decoded audio — the composer
    rescales on device, mirroring EvalLoader's eval-side wire format).
    """

    def __init__(self, *args, wire_dtype: str = "float32", **kw):
        super().__init__(*args, **kw)
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32 or int16, got {wire_dtype}")
        self.wire_dtype = wire_dtype

    def _wire(self, x: np.ndarray) -> np.ndarray:
        if self.wire_dtype == "int16":
            from scl_deepfake_audio_detection_tpu.utils.audio_io import (
                pcm16_encode,
            )

            return pcm16_encode(x)
        return x

    def _build_one(self, i: int, epoch: int):
        return self.builder.build_raw(int(i), epoch)

    def _assemble(self, items) -> Dict:
        return {
            "utts": [d["utt"] for d in items],
            "anchors": self._wire(np.stack([d["anchor"] for d in items])),
            "reals": self._wire(np.stack([d["reals"] for d in items])),
            "vocoded": self._wire(np.stack([d["vocoded"] for d in items])),
            "spoofs": self._wire(np.stack([d["spoofs"] for d in items])),
        }


class EvalLoader:
    """Yields (wav [B, cut], utt_ids) with a fixed batch shape — the final
    short batch is padded up (and the pad rows dropped by the caller via the
    returned utt list length) so XLA compiles exactly one eval program."""

    def __init__(
        self,
        dataset: EvalDataset,
        batch_size: int = 32,
        num_workers: int = 4,
        pad_final: bool = True,
        prefetch: int = 2,
        wire_dtype: str = "float32",
    ):
        self.ds = dataset
        self.bs = batch_size
        self.num_workers = max(1, num_workers)
        self.pad_final = pad_final
        self.prefetch = prefetch
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32 or int16, got {wire_dtype}")
        self.wire_dtype = wire_dtype

    def __len__(self) -> int:
        return -(-len(self.ds) // self.bs)

    def __iter__(self):
        """Batches are built in a producer thread ``prefetch`` steps ahead, so
        host decode/pad overlaps the device's scoring of the previous batch."""
        from concurrent.futures import ThreadPoolExecutor

        idxs = list(range(len(self.ds)))
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for i in range(0, len(idxs), self.bs):
                        if stop.is_set():
                            return
                        chunk = idxs[i : i + self.bs]
                        items = list(pool.map(self.ds.get, chunk))
                        wav = np.stack([w for w, _ in items])
                        utts = [u for _, u in items]
                        if self.pad_final and len(chunk) < self.bs:
                            pad = np.zeros(
                                (self.bs - len(chunk), wav.shape[1]), wav.dtype
                            )
                            wav = np.concatenate([wav, pad])
                        if self.wire_dtype == "int16":
                            # PCM16 wire format: lossless for 16-bit-sourced
                            # audio and halves host->device transfer; the
                            # jitted score step rescales on device
                            from scl_deepfake_audio_detection_tpu.utils.audio_io import (
                                pcm16_encode,
                            )

                            wav = pcm16_encode(wav)
                        if not _put_or_stop(out_q, (wav, utts), stop):
                            return
                _put_or_stop(out_q, None, stop)
            except BaseException as e:
                _put_or_stop(out_q, e, stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
