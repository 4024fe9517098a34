"""DistillEngine: teacher-student compression via the reference's KLD loss.

The reference ships ``kld_distill`` (loss_metrics.py:258-279) but no trainer
that uses it; these tests pin the live capability: math identities, a real
distillation run on the 8-device mesh (student converges toward the teacher),
and the config guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.ops.losses import kld_distill
from scl_deepfake_audio_detection_tpu.train.distill import (
    DistillConfig,
    DistillEngine,
)
from scl_deepfake_audio_detection_tpu.train.optim import set_learning_rate

pytestmark = pytest.mark.slow  # heavy family: excluded from the smoke gate


def test_kld_on_log_probs_equals_kld_on_logits(rng):
    """Models emit log-softmax outputs; feeding them to the temperature KLD
    is exact because a per-row constant shift cancels inside log_softmax —
    the identity DistillEngine relies on."""
    logits_s = jnp.asarray(rng.normal(size=(6, 2)) * 3, jnp.float32)
    logits_t = jnp.asarray(rng.normal(size=(6, 2)) * 3, jnp.float32)
    logp_s = jax.nn.log_softmax(logits_s, axis=-1)
    logp_t = jax.nn.log_softmax(logits_t, axis=-1)
    for temp in (1.0, 4.0, 20.0):
        a = float(kld_distill(logits_s, logits_t, temp=temp))
        b = float(kld_distill(logp_s, logp_t, temp=temp))
        assert b == pytest.approx(a, rel=1e-5, abs=1e-6)


def _tone_noise_batch(rng, n=8, t=2000):
    wav = np.empty((n, t), np.float32)
    labels = np.empty((n,), np.float32)
    tt = np.arange(t) / 16000.0
    for i in range(n):
        if i % 2 == 0:
            wav[i] = 0.3 * np.sin(2 * np.pi * rng.uniform(200, 600) * tt)
            labels[i] = 1
        else:
            wav[i] = 0.3 * rng.normal(size=t)
            labels[i] = 0
    return {"wav": wav, "labels": labels}


@pytest.fixture(scope="module")
def engines():
    teacher = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    student = LinearNLL(
        ssl=XLSRConfig.tiny(encoder_layers=1, ffn_dim=32), emb_dim=16
    )
    return teacher, student


def test_distill_student_tracks_teacher(engines):
    """Pure-KLD distillation (alpha=0): over a few dozen steps the student's
    KLD to the (fixed random) teacher must drop substantially and its argmax
    agreement with the teacher must rise — the full jitted step on the
    8-device mesh, teacher params bit-unchanged."""
    teacher, student = engines
    cfg = DistillConfig(alpha=0.0, temperature=4.0, emb_loss_weight=0.0)
    eng = DistillEngine(teacher, student, cfg)
    t_params = jax.jit(teacher.init)(jax.random.key(0))
    s_params, opt_state, t_params, t_buf = eng.init_state(
        jax.random.key(1), t_params
    )
    t_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), t_params)
    opt_state = set_learning_rate(opt_state, 3e-3)

    rng = np.random.default_rng(0)
    first, last = None, None
    for epoch in range(6):
        batches = [_tone_noise_batch(rng) for _ in range(5)]
        s_params, opt_state, m = eng.run_epoch(
            s_params, opt_state, t_params, batches, jax.random.key(epoch),
            teacher_buffers=t_buf,
        )
        assert np.isfinite(m["loss"]), m
        first = first or m
        last = m
    assert last["loss_kld"] < 0.5 * first["loss_kld"], (first, last)
    assert last["teacher_agreement"] >= 0.9, last
    # the teacher never moves
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        t_params, t_snapshot,
    )


def test_distill_alpha_and_emb_terms(engines):
    teacher, student = engines
    batch = _tone_noise_batch(np.random.default_rng(1))

    def one_step(cfg):
        eng = DistillEngine(teacher, student, cfg)
        t_params = jax.jit(teacher.init)(jax.random.key(0))
        s_params, opt, t_params, t_buf = eng.init_state(jax.random.key(1), t_params)
        _, _, m = eng.run_epoch(s_params, opt, t_params, [batch],
                                jax.random.key(0), teacher_buffers=t_buf)
        return m

    m_ce = one_step(DistillConfig(alpha=1.0))
    assert m_ce["loss"] == pytest.approx(m_ce["loss_ce"], rel=1e-5)
    assert "loss_emb" not in m_ce

    m_kld = one_step(DistillConfig(alpha=0.0))
    assert m_kld["loss"] == pytest.approx(m_kld["loss_kld"], rel=1e-5)

    m_emb = one_step(DistillConfig(alpha=0.5, emb_loss_weight=2.0))
    assert m_emb["loss"] == pytest.approx(
        0.5 * m_emb["loss_ce"] + 0.5 * m_emb["loss_kld"] + 2.0 * m_emb["loss_emb"],
        rel=1e-5,
    )
    assert 0.0 <= m_emb["loss_emb"] <= 2.0  # 1 - mean cosine in [0, 2]


def test_distill_config_guards(engines):
    teacher, student = engines
    with pytest.raises(ValueError, match="alpha"):
        DistillEngine(teacher, student, DistillConfig(alpha=1.5))

    class FakeBNStudent:
        has_buffers = True

        def init_buffers(self):
            return {"bn": {"mean": np.zeros(4)}}

    with pytest.raises(ValueError, match="stateless"):
        DistillEngine(teacher, FakeBNStudent())


def test_distill_accepts_view_batches(engines):
    """[G, V, T] SCL view batches must produce IDENTICAL metrics to the
    manually flattened [G*V, T] batch — a transposed flatten that mislabels
    views would still give finite loss, so equality is the real pin."""
    teacher, student = engines
    rng = np.random.default_rng(2)
    wav3 = rng.normal(size=(2, 4, 1600)).astype(np.float32)
    labels3 = np.tile([1.0, 1.0, 0.0, 0.0], (2, 1)).astype(np.float32)

    def one_epoch(batch):
        eng = DistillEngine(teacher, student, DistillConfig(alpha=0.5))
        t_params = jax.jit(teacher.init)(jax.random.key(0))
        s_params, opt, t_params, t_buf = eng.init_state(jax.random.key(1),
                                                        t_params)
        _, _, m = eng.run_epoch(s_params, opt, t_params, [batch],
                                jax.random.key(0), teacher_buffers=t_buf)
        return m

    m3 = one_epoch({"wav": wav3, "labels": labels3})
    m2 = one_epoch({"wav": wav3.reshape(-1, 1600),
                    "labels": labels3.reshape(-1)})
    assert np.isfinite(m3["loss"]) and 0.0 <= m3["accuracy"] <= 1.0
    # fp32 reduction-order drift between the on-device reshape and the
    # host pre-flatten is ~1e-6 rel; a wrong flatten changes the loss at O(1)
    for k in m3:
        assert m3[k] == pytest.approx(m2[k], rel=1e-4, abs=1e-5), k
