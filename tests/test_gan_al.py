"""GAN trainer + active-learning loop (train/gan.py, train/active_learning.py)

Capability matches for the vendored NII managers the reference carries
(``nn_manager_GAN.py``, ``nn_manager_AL.py`` — dead on its active path, part
of the repo surface).  The GAN test trains a real tiny GAN on a 2-D Gaussian
over the 8-device mesh and checks the generator actually moves toward the
data; the AL tests pin selection semantics, replacement knobs, and cache
resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.layers import init_linear, linear


class _MLP:
    """Minimal pytree model following the framework contract."""

    def __init__(self, sizes, out_squeeze=False):
        self.sizes = sizes
        self.out_squeeze = out_squeeze

    def init(self, key):
        ks = jax.random.split(key, len(self.sizes) - 1)
        return [
            init_linear(k, i, o)
            for k, i, o in zip(ks, self.sizes[:-1], self.sizes[1:])
        ]

    def apply(self, params, x, train=False, rng=None):
        for i, p in enumerate(params):
            x = linear(p, x)
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x[..., 0] if self.out_squeeze else x


def test_gan_learns_a_shifted_gaussian():
    from scl_deepfake_audio_detection_tpu.parallel import make_mesh
    from scl_deepfake_audio_detection_tpu.train.gan import GANEngine

    target_mean = np.array([2.0, -1.0], np.float32)
    rng = np.random.default_rng(0)

    gen = _MLP([4, 32, 2])
    disc = _MLP([2, 32, 1], out_squeeze=True)
    eng = GANEngine(
        gen, disc, z_dim=4, lr_g=2e-3, lr_d=2e-3,
        mesh=make_mesh((8, 1), devices=jax.devices()[:8]),
    )

    def batches():
        for _ in range(40):
            yield (rng.normal(size=(64, 2)) * 0.3 + target_mean).astype(np.float32)

    logs = []
    pg, pd, og, od = eng.fit(
        batches, num_epochs=6, rng_key=jax.random.key(0),
        log_fn=lambda e, m: logs.append(m),
    )
    assert all(np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"]) for m in logs)
    z = jax.random.normal(jax.random.key(9), (256, 4))
    fake = np.asarray(gen.apply(pg, z))
    # the generator mean must have moved most of the way to the data mean
    assert np.linalg.norm(fake.mean(0) - target_mean) < 1.0, fake.mean(0)


def test_gan_checkpoint_written(tmp_path):
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.train.gan import GANEngine

    gen = _MLP([2, 8, 2])
    disc = _MLP([2, 8, 1], out_squeeze=True)
    eng = GANEngine(gen, disc, z_dim=2)
    rng = np.random.default_rng(1)
    eng.fit(
        lambda: iter([rng.normal(size=(16, 2)).astype(np.float32)]),
        num_epochs=1, rng_key=jax.random.key(1), save_dir=str(tmp_path),
    )
    tree, extra = ckpt.load(str(tmp_path / "gan_last.ckpt"))
    assert extra["epoch"] == 0
    assert "params_g" in tree and "params_d" in tree


def test_wgan_clips_critic_and_skips_generator_updates():
    """mode='wgan' must clamp every critic weight to [-clip, clip] after each
    step and move the generator only every n_critic steps
    (nn_manager_GAN_ob.py:206-349 semantics)."""
    from scl_deepfake_audio_detection_tpu.train.gan import GANEngine

    gen = _MLP([3, 8, 2])
    disc = _MLP([2, 8, 1], out_squeeze=True)
    eng = GANEngine(gen, disc, z_dim=3, mode="wgan", n_critic=3,
                    lr_g=1e-2, lr_d=1e-2)
    pg, pd, og, od = eng.init_state(jax.random.key(0))
    rng = np.random.default_rng(0)

    flat0 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(pg)])
    moved = []
    for i in range(6):
        real = rng.normal(size=(16, 2)).astype(np.float32)
        z = rng.normal(size=(16, 3)).astype(np.float32)
        pg, pd, og, od, m = eng.step(
            pg, pd, og, od, real, z, jax.random.key(i), jnp.int32(i)
        )
        # critic clamp holds after every step
        for leaf in jax.tree.leaves(pd):
            assert np.max(np.abs(np.asarray(leaf))) <= 0.01 + 1e-7
        flat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(pg)])
        moved.append(bool(np.any(flat != flat0)))
        flat0 = flat
        assert np.isfinite(m["d_loss"]) and np.isfinite(m["g_loss"])
    # steps 0 and 3 update G (step_idx % 3 == 0); 1,2,4,5 must not
    assert moved == [True, False, False, True, False, False]


def test_conditional_gan_aux_loss_drives_reconstruction():
    """The observed-condition flavor: G(cond) must approach the target via
    the auxiliary MSE term (compute_aux, nn_manager_GAN_ob.py:306-309).
    Target = fixed linear map of the conditioning input."""
    from scl_deepfake_audio_detection_tpu.train.gan import GANEngine, mse_aux

    W = np.array([[1.0, -2.0], [0.5, 1.5], [2.0, 0.0]], np.float32)
    rng = np.random.default_rng(3)

    gen = _MLP([3, 16, 2])
    disc = _MLP([2, 16, 1], out_squeeze=True)
    eng = GANEngine(gen, disc, z_dim=3, lr_g=5e-3, lr_d=1e-3,
                    aux_loss_fn=mse_aux)

    def batches():
        for _ in range(30):
            cond = rng.normal(size=(32, 3)).astype(np.float32)
            yield {"z": cond, "real": cond @ W}

    logs = []
    pg, *_ = eng.fit(batches, num_epochs=4, rng_key=jax.random.key(2),
                     log_fn=lambda e, m: logs.append(m))
    assert logs[-1]["g_aux"] < 0.5 * logs[0]["g_aux"]
    cond = rng.normal(size=(64, 3)).astype(np.float32)
    fake = np.asarray(gen.apply(pg, jnp.asarray(cond)))
    resid = np.mean((fake - cond @ W) ** 2) / np.mean((cond @ W) ** 2)
    assert resid < 0.5, resid


# --------------------------------------------------------------------- AL


def test_al_selects_most_uncertain_and_moves_indices(tmp_path):
    from scl_deepfake_audio_detection_tpu.train.active_learning import (
        ALConfig,
        al_loop,
    )

    # synthetic pool: log-probs with known certainty ordering — item i has
    # margin shrinking with i, so entropy ranks high-i items first
    def score_pool(idx):
        out = []
        for i in idx:
            p1 = 0.5 + 0.4 * (1.0 - i / 100.0)  # i=100 -> maximally uncertain
            out.append([np.log(1 - p1), np.log(p1)])
        return np.asarray(out)

    trained = []

    cfg = ALConfig(cycles=2, samples_per_cycle=2, epochs_per_cycle=1,
                   cache_path=str(tmp_path / "al.json"))
    state = al_loop(
        cfg,
        train_idx=[0, 1],
        pool_idx=[10, 50, 90, 100],
        train_epochs_fn=lambda idx, n: trained.append((sorted(idx), n)),
        score_pool_fn=score_pool,
    )
    # cycle 1 picks the two most uncertain (100, 90); cycle 2 the next (50, 10)
    assert state.history == [[100, 90], [50, 10]]
    assert state.pool_idx == []
    assert state.train_idx == [0, 1, 10, 50, 90, 100]
    # accumulated training set each cycle (use_new_data_only=False)
    assert trained == [
        ([0, 1, 90, 100], 1),
        ([0, 1, 10, 50, 90, 100], 1),
    ]
    assert os.path.isfile(cfg.cache_path)


def test_al_cache_resume_skips_done_cycles(tmp_path):
    from scl_deepfake_audio_detection_tpu.train.active_learning import (
        ALConfig,
        ALState,
        al_loop,
    )

    cache = str(tmp_path / "al.json")
    ALState([0, 1, 7], [3, 4], history=[[7]]).save(cache)

    trained = []
    cfg = ALConfig(cycles=2, samples_per_cycle=1, cache_path=cache,
                   pre_train_epochs=5)
    state = al_loop(
        cfg,
        train_idx=[0, 1],  # ignored: cache wins
        pool_idx=[3, 4, 7],
        train_epochs_fn=lambda idx, n: trained.append((sorted(idx), n)),
        score_pool_fn=lambda idx: np.tile([np.log(0.5)] * 2, (len(idx), 1)),
    )
    # cycle 0 already recorded -> only cycle 1 runs; pre-train skipped
    assert len(state.history) == 2
    assert len(trained) == 1 and trained[0][1] == 1


def test_al_with_replacement_and_new_data_only():
    from scl_deepfake_audio_detection_tpu.train.active_learning import (
        ALConfig,
        al_loop,
    )

    trained = []
    cfg = ALConfig(cycles=2, samples_per_cycle=1, with_replacement=True,
                   use_new_data_only=True, criterion="margin")
    state = al_loop(
        cfg,
        train_idx=[0],
        pool_idx=[5, 6],
        train_epochs_fn=lambda idx, n: trained.append(sorted(idx)),
        score_pool_fn=lambda idx: np.asarray(
            # item 5 least certain -> picked every cycle (replacement)
            [[np.log(0.5), np.log(0.5)] if i == 5 else [np.log(0.1), np.log(0.9)]
             for i in idx]
        ),
    )
    assert state.history == [[5], [5]]
    assert state.pool_idx == [5, 6]  # with replacement: pool unchanged
    assert trained == [[5], [5]]  # only-new-data training sets


def test_al_random_criterion_resume_matches_uninterrupted(tmp_path):
    """criterion='random' draws a per-cycle RNG keyed on (seed, cycle), so a
    run resumed from the selection cache picks the same samples at cycle k
    as a never-interrupted run (the NII cache contract)."""
    from scl_deepfake_audio_detection_tpu.train.active_learning import (
        ALConfig,
        al_loop,
    )

    pool = list(range(10, 30))
    score = lambda idx: np.tile([np.log(0.5)] * 2, (len(idx), 1))
    train = lambda idx, n: None

    full = al_loop(
        ALConfig(cycles=2, samples_per_cycle=3, criterion="random", seed=7,
                 cache_path=str(tmp_path / "full.json")),
        [0], pool, train, score,
    )
    # interrupted run: cycle 0 only, then resume for cycle 1 from the cache
    cache = str(tmp_path / "resume.json")
    al_loop(
        ALConfig(cycles=1, samples_per_cycle=3, criterion="random", seed=7,
                 cache_path=cache),
        [0], pool, train, score,
    )
    resumed = al_loop(
        ALConfig(cycles=2, samples_per_cycle=3, criterion="random", seed=7,
                 cache_path=cache),
        [0], pool, train, score,
    )
    assert resumed.history == full.history
