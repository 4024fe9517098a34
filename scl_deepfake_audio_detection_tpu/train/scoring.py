"""Score-file writers — byte-compatible with the reference's three formats.

Reference writers (``main.py:120-214``):
  eval  format: ``utt cm0 cm1``   (two log-softmax outputs)
  pred  format: ``utt score pred`` (score = cm[1] bonafide log-prob, argmax)
  emb   mode:   per-utt ``.npy`` embedding + a ``scores.txt`` in eval format

One deliberate fix: files open with ``'w'`` — the reference appends with
``'a+'`` (``main.py:170``), so re-runs double up score files; truncation is
the correct capability.  Line formatting uses repr(float) like Python's
f-string of a float32 — identical tokens to the reference's torch prints.
"""

from __future__ import annotations

import os
from collections import deque
from typing import Callable, Iterable, Optional, Tuple

import numpy as np


def _fmt(x: float) -> str:
    return str(float(x))


def read_valid_rows(path: str, n_tokens: int = 3) -> Tuple[list, set]:
    """Parse an existing score file for eval resumption.

    Returns ``(valid_lines, scored_utts)``: the well-formed rows (exactly
    ``n_tokens`` whitespace tokens, every column past the utt id a parseable
    float-or-int) and the set of utt ids they cover.  A torn final line —
    the normal artifact of a run killed mid-write — is dropped, as is any
    duplicate utt (first occurrence wins, matching how downstream joins
    read the file).  Used by the CLI's ``--resume_eval``: rewrite the valid
    rows, score only the missing utts, append.
    """
    valid, seen = [], set()
    if not os.path.exists(path):
        return valid, seen
    with open(path) as f:
        for line in f:
            if not line.endswith("\n"):
                break  # torn final line: the write was interrupted
            toks = line.split()
            if len(toks) != n_tokens or toks[0] in seen:
                continue
            try:
                for t in toks[1:]:
                    float(t)
            except ValueError:
                continue
            valid.append(line)
            seen.add(toks[0])
    return valid, seen


def _pipelined(batches, launch, depth: int = 2):
    """Keep ``depth`` scoring calls in flight before materializing results.

    ``launch(wav)`` dispatches asynchronously (jax arrays are futures until
    read); yielding with a lag overlaps the next batch's host->device
    transfer and compute with the previous batch's device->host readback —
    per-batch ``np.asarray`` right after the call would serialize the three
    (the reference's per-batch ``.item()`` stall, ``main.py:174``).
    """
    pending = deque()
    for wav, utts in batches:
        pending.append((utts, launch(wav)))
        if len(pending) > depth:
            yield pending.popleft()
    while pending:
        yield pending.popleft()


def produce_evaluation_file(
    batches: Iterable[Tuple[np.ndarray, list]],
    score_fn: Callable[[np.ndarray], np.ndarray],
    out_path: str,
    progress: Optional[Callable[[int], None]] = None,
    append: bool = False,
) -> None:
    """``utt cm0 cm1`` lines (reference ``produce_evaluation_file``,
    ``main.py:161-180``). ``score_fn`` maps wav [B, T] -> log_probs [B, 2];
    padded tail rows (beyond len(utts)) are dropped.  ``append`` adds rows
    to an existing file (``--resume_eval``); the default truncates."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    done = 0
    with open(out_path, "a" if append else "w") as f:
        for utts, lp_dev in _pipelined(batches, score_fn):
            lp = np.asarray(lp_dev)[: len(utts)]
            for utt, row in zip(utts, lp):
                f.write(f"{utt} {_fmt(row[0])} {_fmt(row[1])}\n")
            done += len(utts)
            if progress:
                progress(done)


def produce_prediction_file(
    batches: Iterable[Tuple[np.ndarray, list]],
    score_fn: Callable[[np.ndarray], np.ndarray],
    out_path: str,
    progress: Optional[Callable[[int], None]] = None,
    append: bool = False,
) -> None:
    """``utt score pred`` lines, score = bonafide log-prob, pred = argmax
    (reference ``produce_prediction_file``, ``main.py:182-214``)."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    done = 0
    with open(out_path, "a" if append else "w") as f:
        for utts, lp_dev in _pipelined(batches, score_fn):
            lp = np.asarray(lp_dev)[: len(utts)]
            pred = np.argmax(lp, axis=-1)
            for utt, row, p in zip(utts, lp, pred):
                f.write(f"{utt} {_fmt(row[1])} {int(p)}\n")
            done += len(utts)
            if progress:
                progress(done)


def bucketed_batches(
    wavs: Iterable[np.ndarray],
    utts: Iterable[str],
    batch_size: int,
    bucket_multiple: int = 16000,
    padding_type: str = "repeat",
    max_len: Optional[int] = None,
):
    """Yield ``(wav [B, L_bucket], utts)`` batches grouped by length.

    The variable-length scoring policy for NON-parity workloads: items are
    length-sorted (``data/sampler.length_buckets``), each batch pads to its
    max rounded up to ``bucket_multiple`` — so a whole eval sweep compiles at
    most ceil(max_len / bucket_multiple) XLA programs instead of one per
    distinct batch-max (each fresh shape costs a full compile, ~20-40 s on
    this infra). ``bucket_multiple=0`` disables rounding (exact per-batch
    max — the torch-style policy, kept for the benchmark comparison).

    NOT the parity path: the reference scores fixed 64600-sample crops
    (``datautils/asvspoof_2019_augall_3.py:49-60``) and mean-pool scores are
    length-dependent, so this yields different (not wrong) score files.
    Short items tile-repeat to the bucket length (``padding_type='repeat'``)
    or zero-pad; ``max_len`` caps long items by truncation.
    """
    from scl_deepfake_audio_detection_tpu.data.generic_io import pad_to_bucket
    from scl_deepfake_audio_detection_tpu.data.sampler import length_buckets
    from scl_deepfake_audio_detection_tpu.dsp.pad import pad_eval

    wavs = list(wavs)
    utts = list(utts)
    if len(wavs) != len(utts):
        raise ValueError("wavs and utts length mismatch")
    lengths = [min(w.shape[0], max_len) if max_len else w.shape[0] for w in wavs]
    for idx_batch in length_buckets(lengths, batch_size):
        target = max(lengths[i] for i in idx_batch)
        if bucket_multiple:
            target = pad_to_bucket(target, bucket_multiple)
        if max_len is not None:
            # max_len is a hard cap: bucket rounding must not raise the pad
            # target above it (long items would silently keep up to
            # bucket_multiple-1 extra real samples and the batch would exceed
            # the user's memory/compile bound)
            target = min(target, max_len)
        batch = np.stack(
            [pad_eval(wavs[i], padding_type, target) for i in idx_batch]
        ).astype(np.float32)
        if batch.shape[0] < batch_size:  # ragged tail: tile rows, keep shape
            reps = batch_size // batch.shape[0] + 1
            batch = np.concatenate([batch] * reps)[:batch_size]
        yield batch, [utts[i] for i in idx_batch]


def score_long_audio(
    wav: np.ndarray,
    score_fn: Callable[[np.ndarray], np.ndarray],
    window: int = 64600,
    hop: Optional[int] = None,
    batch: int = 8,
) -> np.ndarray:
    """Chunked scoring of arbitrarily long audio with score averaging.

    The reference truncates everything to 64600 samples (``pad``,
    ``datautils/asvspoof_2019_augall_3.py:49-60``), discarding evidence in
    long In-the-Wild clips.  This scores overlapping ``window``-sample crops
    (hop = window/2 by default) through the same fixed-shape jit program —
    chunks are batched, short tails tile-padded — and returns the mean
    log-prob pair [2] (SURVEY §5's long-audio stretch capability).
    """
    hop = hop or window // 2
    n = wav.shape[0]
    if n <= window:
        starts = [0]
    else:
        starts = list(range(0, n - window + 1, hop))
        if starts[-1] + window < n:
            starts.append(n - window)
    chunks = []
    for s in starts:
        c = wav[s : s + window]
        if c.shape[0] < window:  # tile-pad the tail crop
            reps = window // max(c.shape[0], 1) + 1
            c = np.tile(c, reps)[:window]
        chunks.append(c)
    chunks_a = np.stack(chunks).astype(np.float32)
    outs = []
    for i in range(0, len(chunks_a), batch):
        block = chunks_a[i : i + batch]
        if block.shape[0] < batch:  # keep one compiled shape
            pad = np.zeros((batch - block.shape[0], window), np.float32)
            block = np.concatenate([block, pad])
        lp = np.asarray(score_fn(block))
        outs.append(lp[: min(batch, len(chunks_a) - i)])
    return np.concatenate(outs).mean(axis=0)


def produce_long_audio_evaluation_file(
    dataset,
    score_fn: Callable[[np.ndarray], np.ndarray],
    out_path: str,
    window: int = 64600,
    hop: Optional[int] = None,
    batch: int = 8,
    progress: Optional[Callable[[int], None]] = None,
    append: bool = False,
) -> None:
    """``utt cm0 cm1`` lines via :func:`score_long_audio` on FULL-length
    audio (CLI ``--eval --long_audio``): every utterance is scored as
    overlapping ``window``-sample crops with score averaging instead of the
    reference's truncate-at-64600 policy (``asvspoof_2019_augall_3.py:49-60``
    discards everything past 4 s).  Utterances at or under ``window`` samples
    score identically to the normal path under repeat padding (one
    tile-padded crop).  ``dataset`` needs ``get_raw(idx) -> (wav, utt)``
    (``data.datasets.EvalDataset``)."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with open(out_path, "a" if append else "w") as f:
        for i in range(len(dataset)):
            wav, utt = dataset.get_raw(i)
            row = score_long_audio(
                wav, score_fn, window=window, hop=hop, batch=batch
            )
            f.write(f"{utt} {_fmt(row[0])} {_fmt(row[1])}\n")
            if progress:
                progress(i + 1)


def produce_emb_file(
    batches: Iterable[Tuple[np.ndarray, list]],
    emb_fn: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
    out_dir: str,
    progress: Optional[Callable[[int], None]] = None,
) -> None:
    """Per-utterance ``<utt>.npy`` embeddings + ``scores.txt`` in eval format
    (reference ``produce_emb_file``, ``main.py:120-159``).  ``emb_fn`` maps
    wav [B, T] -> (log_probs [B, 2], emb [B, D])."""
    os.makedirs(out_dir, exist_ok=True)
    done = 0
    with open(os.path.join(out_dir, "scores.txt"), "w") as f:
        for utts, (lp, emb) in _pipelined(batches, emb_fn):
            lp, emb = np.asarray(lp)[: len(utts)], np.asarray(emb)[: len(utts)]
            for utt, row, e in zip(utts, lp, emb):
                base = os.path.splitext(os.path.basename(utt))[0]
                np.save(os.path.join(out_dir, base + ".npy"), e)
                f.write(f"{utt} {_fmt(row[0])} {_fmt(row[1])}\n")
            done += len(utts)
            if progress:
                progress(done)
