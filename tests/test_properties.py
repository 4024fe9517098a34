"""Property-based tests (hypothesis) over the pure host-side math.

The fixed-seed unit tests pin known values; these pin INVARIANTS across
randomized inputs: DET monotonicity, EER/t-DCF/minCllr invariance under
monotone score transforms, PAV idempotence and mean preservation, companding
round-trips, rank-norm permutation equivariance.  All numpy-only (no jax
compiles), so hundreds of examples run in seconds.
"""

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from scl_deepfake_audio_detection_tpu.train.calibration import (
    cllr,
    min_cllr,
    pav,
)
from scl_deepfake_audio_detection_tpu.train.metrics import (
    compute_eer,
    det_curve,
    min_tdcf,
)

SETTINGS = dict(max_examples=40, deadline=None)


def scores(min_size=2, max_size=60):
    return arrays(
        np.float64, st.integers(min_size, max_size),
        elements=st.floats(-50, 50, allow_nan=False, width=64),
    )


@given(tar=scores(), non=scores())
@settings(**SETTINGS)
def test_det_curve_monotone_and_bounded(tar, non):
    frr, far, thr = det_curve(tar, non)
    assert np.all(np.diff(frr) >= 0)
    assert np.all(np.diff(far) <= 0)
    assert frr[0] == 0.0 and far[0] == 1.0
    assert frr[-1] == 1.0 and far[-1] == 0.0
    assert np.all((0 <= frr) & (frr <= 1)) and np.all((0 <= far) & (far <= 1))
    eer, t = compute_eer(tar, non)
    assert 0.0 <= eer <= 1.0


@given(tar=scores(), non=scores(),
       shift=st.floats(-100, 100, allow_nan=False),
       scale=st.floats(0.01, 100, allow_nan=False))
@settings(**SETTINGS)
def test_eer_invariant_under_affine_score_transform(tar, non, shift, scale):
    eer, _ = compute_eer(tar, non)
    allv = np.concatenate([tar, non])
    # only when the affine map preserves distinctness in float64 (tiny
    # magnitudes can collapse into the shift and legitimately change ties)
    assume(len(np.unique(allv * scale + shift)) == len(np.unique(allv)))
    eer2, _ = compute_eer(tar * scale + shift, non * scale + shift)
    assert eer2 == eer  # exact: same sort order -> same operating points


@given(bona=scores(3, 50), spoof=scores(3, 50),
       scale=st.floats(0.05, 20, allow_nan=False))
@settings(**SETTINGS)
def test_min_tdcf_bounded_and_monotone_invariant(bona, spoof, scale):
    rng = np.random.default_rng(0)
    tar_a = rng.normal(2.0, 1.0, 50)
    non_a = rng.normal(-2.0, 1.0, 50)
    spoof_a = rng.normal(0.5, 1.0, 50)
    v, _ = min_tdcf(bona, spoof, tar_a, non_a, spoof_a)
    assert 0.0 <= v <= 1.0 + 1e-12
    # the invariance claim needs the affine map to actually preserve the
    # score ordering in float64 (tiny values can collapse into the shift)
    allv = np.concatenate([bona, spoof])
    assume(len(np.unique(allv * scale + 3.0)) == len(np.unique(allv)))
    v2, _ = min_tdcf(bona * scale + 3.0, spoof * scale + 3.0,
                     tar_a, non_a, spoof_a)
    assert v2 == v


@given(tar=scores(3, 50), non=scores(3, 50))
@settings(**SETTINGS)
def test_min_cllr_floor_and_monotone_invariance(tar, non):
    base = min_cllr(tar, non)
    assert 0.0 <= base <= 1.0 + 1e-9
    assert base <= cllr(tar, non) + 1e-9
    allv = np.concatenate([tar, non])
    assume(len(np.unique(2.0 * allv + 1.0)) == len(np.unique(allv)))
    assert abs(min_cllr(2.0 * tar + 1.0, 2.0 * non + 1.0) - base) < 1e-9


@given(y=arrays(np.float64, st.integers(1, 40),
                elements=st.floats(-100, 100, allow_nan=False)))
@settings(**SETTINGS)
def test_pav_isotonic_idempotent_mean_preserving(y):
    out = pav(y)
    assert out.shape == y.shape
    assert np.all(np.diff(out) >= -1e-12)  # non-decreasing
    np.testing.assert_allclose(pav(out), out, atol=1e-9)  # idempotent
    np.testing.assert_allclose(out.mean(), y.mean(), atol=1e-9)  # L2 proj


@given(x=arrays(np.float32, st.integers(1, 200),
                elements=st.floats(np.float32(-1.0), np.float32(0.999),
                                   allow_nan=False, width=32)))
@settings(**SETTINGS)
def test_parametric_companding_roundtrip_bounded(x):
    from scl_deepfake_audio_detection_tpu.dsp.codec import (
        mulaw_compand,
        mulaw_expand,
    )

    # default path QUANTIZES to 256 channels: the error bound is half a
    # compressed-domain step expanded through the local slope
    back = mulaw_expand(mulaw_compand(x))
    # half-step h=1/255 in the compressed domain, slope taken at |y|+h
    # (the code grid is not centered on zero, so the zero sample sits a
    # full h from its code): err <= L*h*(|x| + 1/mu)*exp(h*L)
    L = np.log1p(255.0)
    bound = L * (np.abs(x) + 1.0 / 255.0) / 255.0 * np.exp(L / 255.0) + 1e-7
    assert np.all(np.abs(back - x) <= bound)
    # the un-quantized float companding is an exact analytic inverse
    smooth = mulaw_expand(mulaw_compand(x, scale_to_int=False),
                          input_int=False)
    np.testing.assert_allclose(smooth, x, atol=2e-7)


@given(data=st.lists(st.integers(1, 10), min_size=1, max_size=40),
       seed=st.integers(0, 1000))
@settings(**SETTINGS)
def test_rank_norm_permutation_equivariant(data, seed):
    from scl_deepfake_audio_detection_tpu.utils.stats import rank_norm

    base = np.asarray(rank_norm(data, [1, 10]))
    perm = np.random.default_rng(seed).permutation(len(data))
    permuted = np.asarray(rank_norm([data[i] for i in perm], [1, 10]))
    np.testing.assert_allclose(permuted, base[perm], atol=1e-12)


@given(x=arrays(np.float32, st.integers(1, 100),
                elements=st.floats(np.float32(-0.999), np.float32(0.999),
                                   allow_nan=False, width=32)))
@settings(**SETTINGS)
def test_pcm16_roundtrip_within_half_lsb(x):
    from scl_deepfake_audio_detection_tpu.utils.audio_io import (
        pcm16_decode,
        pcm16_encode,
    )

    back = pcm16_decode(pcm16_encode(x))
    np.testing.assert_allclose(back, x, atol=0.5 / 32768.0 + 1e-7)
    # exactness on the PCM16 grid (what load_audio actually produces)
    grid = np.round(x * 32768.0).clip(-32768, 32767) / 32768.0
    np.testing.assert_array_equal(
        pcm16_decode(pcm16_encode(grid.astype(np.float32))),
        grid.astype(np.float32),
    )


@given(lens=st.lists(st.integers(10, 500), min_size=1, max_size=5),
       length=st.integers(20, 400), repeat=st.booleans(),
       seed=st.integers(0, 99))
@settings(**SETTINGS)
def test_multiview_pad_shape_and_value_provenance(lens, length, repeat, seed):
    from scl_deepfake_audio_detection_tpu.dsp.pad import multiview_pad

    rng = np.random.default_rng(seed)
    views = [rng.normal(size=n).astype(np.float32) for n in lens]
    out = multiview_pad(views, length, repeat_pad=repeat, random_trim=True,
                        rng=np.random.default_rng(seed + 1))
    assert out.shape == (len(views), length)
    for i, v in enumerate(views):
        vals = set(np.unique(v).tolist()) | {0.0}
        assert set(np.unique(out[i]).tolist()) <= vals  # no invented samples


@given(lens=st.lists(st.integers(50, 120_000), min_size=1, max_size=12),
       batch=st.integers(1, 5),
       multiple=st.sampled_from([0, 4000, 16000]),
       cap=st.sampled_from([None, 64600]))
@settings(max_examples=25, deadline=None)
def test_bucketed_batches_cover_every_utt_once_within_cap(lens, batch,
                                                          multiple, cap):
    from scl_deepfake_audio_detection_tpu.train.scoring import bucketed_batches

    rng = np.random.default_rng(0)
    wavs = [rng.normal(size=n).astype(np.float32) for n in lens]
    utts = [f"u{i}" for i in range(len(lens))]
    seen = []
    for b, us in bucketed_batches(wavs, utts, batch_size=batch,
                                  bucket_multiple=multiple, max_len=cap):
        seen += us
        assert b.shape[0] == batch  # fixed batch shape (tail tiles)
        if cap is not None:
            assert b.shape[1] <= cap
        elif multiple:
            assert b.shape[1] % multiple == 0
    assert sorted(seen) == sorted(utts)  # exactly once each


@given(n=st.integers(4, 60), k=st.integers(2, 4),
       seed=st.integers(0, 500))
@settings(max_examples=25, deadline=None)
def test_logistic_fusion_weights_recover_informative_system(n, k, seed):
    """With one informative system and k-1 pure-noise systems, the fusion
    weight on the informative one must dominate."""
    from scl_deepfake_audio_detection_tpu.train.calibration import (
        logistic_fusion,
    )

    rng = np.random.default_rng(seed)
    tar_good = rng.normal(2.0, 1.0, n)
    non_good = rng.normal(-2.0, 1.0, n)
    tar = np.stack([tar_good] + [rng.normal(0, 1, n) for _ in range(k - 1)], 1)
    non = np.stack([non_good] + [rng.normal(0, 1, n) for _ in range(k - 1)], 1)
    w, _b = logistic_fusion(tar, non)
    assert w[0] > 0
    assert abs(w[0]) >= np.max(np.abs(w[1:])) * 0.5  # informative dominates


@given(items=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
       block=st.integers(1, 10), seed=st.integers(0, 99))
@settings(max_examples=25, deadline=None)
def test_block_shuffles_are_permutations(items, block, seed):
    from scl_deepfake_audio_detection_tpu.utils.filelists import (
        shuffle_blocks,
        shuffle_within_blocks,
    )

    rng = np.random.default_rng(seed)
    a = shuffle_within_blocks(items, block, rng)
    b = shuffle_blocks(items, block, np.random.default_rng(seed))
    assert sorted(a) == sorted(items)
    assert sorted(b) == sorted(items)
    # within-block shuffling preserves block membership
    for s in range(0, len(items), block):
        e = min(s + block, len(items))
        assert sorted(a[s:e]) == sorted(items[s:e])
