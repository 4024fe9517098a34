"""Offline-augmentation cache warm-up.

The reference populates ``aug_dir/<method>/<utt>`` lazily inside DataLoader
workers during the first epoch (``datautils/asvspoof_2019_augall_3.py:271-354``),
so epoch 1 pays the full DSP cost serially with training.  This tool fills the
same cache ahead of time with a thread pool, enumerating exactly the
(file, method) pairs each dataset variant can request:

  augall_3 / augall_5   bonafide x all methods; vocoded x methods[0]
  aug_2                 bonafide x all methods; vocoded x all methods
  xinwang               bonafide x all methods; vocoded x all methods
  scl_normal            bonafide x all methods; spoof x all methods

(Additional spoofs in augall_5 are used un-augmented — see
``SCLViewBatchBuilder.build`` — so they are not cached.)

Cache-file layout and PCM16 storage match the lazy path exactly: jobs run
through the same registry wrappers (``data/augment_registry._cached``), so a
warmed cache is read back by training identically to a lazily-grown one.

RNG provenance: the *contents* of warmed vs lazily-grown entries are two
distinct deterministic streams.  The lazy path draws from the per-item
``(seed, epoch, idx)`` generator at whatever point in batch construction the
cache miss occurs, so its stream depends on access order; warm-up seeds each
job independently as ``SeedSequence([seed, job_idx])`` over the sorted job
list.  Both are reproducible run-to-run, but a given utterance's cached
augmentation differs between the two provenances — pick one (warm everything,
or warm nothing) for a reproducible training recipe.  The reference has the
same property (unseeded ``np.random`` in forked workers, survey §7 item 6).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from scl_deepfake_audio_detection_tpu.data.datasets import SCLViewBatchBuilder
from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio
from scl_deepfake_audio_detection_tpu.utils.registry import AUGMENTATIONS


@dataclass
class WarmupStats:
    total: int = 0
    written: int = 0
    existing: int = 0
    failed: int = 0
    seconds: float = 0.0

    def __str__(self) -> str:
        return (
            f"{self.total} cache entries: {self.written} written, "
            f"{self.existing} already present, {self.failed} failed "
            f"({self.seconds:.1f}s)"
        )


def enumerate_cache_jobs(builder: SCLViewBatchBuilder) -> List[Tuple[str, str]]:
    """All (audio_path, method) pairs the builder's variant can ever request."""
    spec = builder.spec
    # only cache-backed methods warm up: time_mask/freq_mask-style wrappers
    # have no offline cache, so a job for them recomputes every run, writes
    # nothing, and would be misreported as 'written'
    methods = [
        m for m in spec.augmentation_methods
        if getattr(AUGMENTATIONS.get(m), "cache_method", None) is not None
    ]
    jobs: List[Tuple[str, str]] = []

    for u in builder.files:  # anchors + additional reals draw from the same list
        p = os.path.join(builder.bonafide_dir, u)
        jobs += [(p, m) for m in methods]

    if spec.variant in ("augall_3", "augall_5"):
        voc_methods = methods[:1]  # first method only (augall __getitem__)
    elif spec.variant in ("aug_2", "xinwang"):
        voc_methods = methods  # random-choice / all-methods per vocoded view
    else:  # scl_normal has no vocoded negatives
        voc_methods = []
    if voc_methods:
        for u in builder.files:
            for v in spec.vocoders:
                p = os.path.join(builder.vocoded_dir, f"{v}_{u}")
                jobs += [(p, m) for m in voc_methods]

    if spec.variant == "scl_normal":  # spoof views get a random method
        for d, f in builder.spoof_list:
            jobs += [(os.path.join(d, f), m) for m in methods]

    return sorted(set(jobs))


def warm_aug_cache(
    builder: SCLViewBatchBuilder,
    num_workers: int = 8,
    seed: Optional[int] = None,
    verbose: bool = False,
) -> WarmupStats:
    """Pre-populate the offline augmentation cache for one builder.

    Deterministic given ``seed`` (defaults to the builder's seed); existing
    entries are left untouched so re-runs and partially-grown caches are
    safe.  Note the module-docstring RNG-provenance caveat: warmed entries
    are a different deterministic stream than lazily-grown ones.
    """
    res = builder.res
    if res.online or not res.aug_dir:
        raise ValueError(
            "cache warm-up needs offline resources (online_aug: false and an "
            "aug_dir in the config's data kwargs)"
        )
    jobs = enumerate_cache_jobs(builder)
    seed = builder.seed if seed is None else seed
    stats = WarmupStats(total=len(jobs))
    t0 = time.perf_counter()

    def run(job_idx: int) -> str:
        path, method = jobs[job_idx]
        fn = AUGMENTATIONS.get(method)
        cache = os.path.join(res.aug_dir, fn.__name__, os.path.basename(path))
        if os.path.exists(cache):
            return "existing"
        try:
            wav = load_audio(path, res.sample_rate)
            rng = np.random.default_rng(np.random.SeedSequence([seed, job_idx]))
            fn(wav, rng, res, utt_id=path)  # full path: collision guard
            return "written"
        except Exception as e:  # noqa: BLE001 — a bad file must not kill the pool
            if verbose:
                print(f"warm_aug_cache: {method}({path}) failed: {e}")
            return "failed"

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for outcome in pool.map(run, range(len(jobs))):
            setattr(stats, outcome, getattr(stats, outcome) + 1)

    stats.seconds = time.perf_counter() - t0
    return stats
