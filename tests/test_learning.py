"""Learning sanity: the full train step (SupCon + CE through the XLS-R
architecture) must separate an easy synthetic task.

Bonafide views are band-limited tones, spoof views are white noise — if the
gradient path through scan/remat/flash-dispatch/optimizer is healthy, a tiny
model reaches high train accuracy within a few dozen steps.  Guards against
silent gradient breakage (wrong stop_gradient, dtype-severed backward, dead
loss terms) that shape tests can't catch."""

import numpy as np
import pytest

import jax

from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.parallel import make_mesh
from scl_deepfake_audio_detection_tpu.train.engine import Engine
from scl_deepfake_audio_detection_tpu.train.optim import set_learning_rate
from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig


def _batch(rng, groups=2, views=6, t=2000):
    """Half the views are tones (label 1), half noise (label 0)."""
    wavs = np.empty((groups, views, t), np.float32)
    labels = np.empty((groups, views), np.float32)
    tt = np.arange(t) / 16000.0
    for g in range(groups):
        for v in range(views):
            if v < views // 2:
                f = rng.uniform(200, 600)
                wavs[g, v] = 0.3 * np.sin(2 * np.pi * f * tt)
                labels[g, v] = 1
            else:
                wavs[g, v] = 0.3 * rng.normal(size=t)
                labels[g, v] = 0
    return {"wav": wavs, "labels": labels}


@pytest.mark.parametrize("loss_type", [1, 4])
def test_training_learns_synthetic_task(loss_type):
    """loss_type 4 (pure CE) must solve the task; loss_type 1 (CE + two
    SupCon terms, the published recipe) needs its long schedule to classify —
    within this budget the total loss must still descend monotonically-ish
    (gradient health through every term)."""
    model = LinearNLL(ssl=XLSRConfig.tiny(remat=True), emb_dim=16,
                      loss_type=loss_type)
    engine = Engine(model, TrainConfig(max_lr=2e-3),
                    mesh=make_mesh((2, 1), devices=jax.devices()[:2]))
    params, buffers, opt = engine.init_state(jax.random.key(0))
    opt = set_learning_rate(opt, 2e-3)

    rng = np.random.default_rng(0)
    losses = []
    for i in range(30):
        batch = engine.place_batch(_batch(rng))
        params, buffers, opt, m = engine.train_step(
            params, buffers, opt, batch, jax.random.fold_in(jax.random.key(1), i)
        )
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    if loss_type == 4:
        # fresh data, eval mode: must generalize the tone/noise split
        test = _batch(np.random.default_rng(123))
        metrics = engine.eval_step(params, buffers, engine.place_batch(test))
        assert float(metrics["accuracy"]) >= 0.9, float(metrics["accuracy"])
