"""Train engine + sharding: multi-device (8 virtual CPU devices) train step,
optimizer schedule parity with torch CyclicLR, early stop, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.parallel import make_mesh, param_pspecs
from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
from scl_deepfake_audio_detection_tpu.train.engine import Engine
from scl_deepfake_audio_detection_tpu.train.optim import (
    EarlyStop,
    cyclic_exp_lr,
    set_learning_rate,
)
from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig


def _batch(rng, groups=4, views=4, t=3200):
    """Tiny SCL-style batch. Every label needs >=2 views — SupCon anchors with
    no positive pair divide 0/0 (true of the reference too: real batches are
    5 bonafide + 6 spoof views, ``datautils/asvspoof_2019_augall_3.py:144``)."""
    return {
        "wav": rng.normal(size=(groups, views, t)).astype(np.float32),
        "labels": np.tile(np.array([1, 1, 0, 0], np.float32), (groups, 1)),
    }


@pytest.fixture(scope="module")
def shared_engine():
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    mesh = make_mesh((4, 2))  # 4-way data x 2-way tensor parallel
    return Engine(model, TrainConfig(max_lr=1e-4), mesh=mesh)


@pytest.fixture
def engine_state(shared_engine):
    """Fresh state per test — the jitted train step donates its inputs, so
    module-scoped state would be deleted by the first stepping test."""
    params, buffers, opt_state = shared_engine.init_state(jax.random.key(0))
    return shared_engine, params, buffers, opt_state


def test_multi_device_train_step(engine_state):
    engine, params, buffers, opt_state = engine_state
    opt_state = set_learning_rate(opt_state, 1e-4)
    rng = np.random.default_rng(0)
    batch = engine.place_batch(_batch(rng))
    orig = jax.tree.map(np.asarray, params)
    p, b, o, metrics = engine.train_step(
        params, buffers, opt_state, batch, jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert {"loss", "accuracy", "L_CE", "L_CF1", "L_CF2"} <= set(metrics)
    # params actually moved
    d0 = jax.tree.leaves(orig)[0]
    d1 = jax.tree.leaves(p)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_tp_sharding_rules_cover_encoder():
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    params = model.init(jax.random.key(0))
    specs = param_pspecs(params)
    qspec = specs["ssl"]["encoder"]["layers"]["attn"]["q"]["w"]
    assert len(jax.tree.leaves(params)) > 0  # sanity: tree nonempty
    assert qspec == jax.sharding.PartitionSpec(None, None, "model")
    fc2 = specs["ssl"]["encoder"]["layers"]["fc2"]["w"]
    assert fc2 == jax.sharding.PartitionSpec(None, "model", None)
    # head stays replicated
    assert specs["ll"]["w"] == jax.sharding.PartitionSpec()


def test_group_scope_matches_manual_vmap(engine_state):
    """Per-group loss == mean of per-group losses computed one by one."""
    engine, params, buffers, _ = engine_state
    rng = np.random.default_rng(1)
    batch = _batch(rng, groups=2)
    wav, labels = jnp.asarray(batch["wav"]), jnp.asarray(batch["labels"])

    from scl_deepfake_audio_detection_tpu.train.engine import _loss_and_metrics

    total, _ = _loss_and_metrics(
        params, buffers, engine.model, {"wav": wav, "labels": labels},
        None, False, "group",
    )

    singles = []
    for g in range(2):
        out = engine.model.apply(params, wav[g], train=False)
        singles.append(sum(engine.model.loss(out, labels[g]).values()))
    assert float(total) == pytest.approx(np.mean([float(s) for s in singles]), rel=1e-5)


def test_cyclic_lr_matches_torch():
    import torch

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-5)
    sched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=1e-8, max_lr=1e-5, step_size_up=3, mode="exp_range",
        gamma=0.85, cycle_momentum=False,
    )
    for epoch in range(20):
        want = opt.param_groups[0]["lr"]
        got = cyclic_exp_lr(epoch, 1e-8, 1e-5)
        assert got == pytest.approx(want, rel=1e-6), epoch
        sched.step()


def test_early_stop_reference_semantics():
    es = EarlyStop(patience=3, delta=0.01, init_best=90.0)
    assert not es(89.0)  # below init best: no save
    assert es(91.0)  # new best
    assert not es(91.005)  # within delta: counter
    assert not es(90.0)
    assert not es(89.0)
    assert es.early_stop  # 3 strikes


def test_checkpoint_roundtrip(tmp_path, engine_state):
    engine, params, buffers, opt_state = engine_state
    path = str(tmp_path / "state.ckpt")
    ckpt.save_train_state(
        path, params, opt_state, epoch=7, rng_key=jax.random.key(3), best=93.5
    )
    p2, b2, o2, epoch, rng, best = ckpt.load_train_state(path, opt_state)
    assert epoch == 7 and best == 93.5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_one_epoch_with_early_stop(tmp_path, engine_state):
    engine, params, buffers, opt_state = engine_state
    rng = np.random.default_rng(2)
    batches = [_batch(rng, groups=4) for _ in range(2)]

    logs = []
    engine.cfg.num_epochs = 2
    p, b, o = engine.fit(
        params,
        buffers,
        opt_state,
        train_batches=lambda: iter(batches),
        dev_batches=lambda: iter(batches[:1]),
        rng_key=jax.random.key(0),
        save_dir=str(tmp_path),
        log_fn=lambda e, r: logs.append(r),
    )
    assert len(logs) == 2
    assert (tmp_path / "metrics.jsonl").exists()
    assert all(np.isfinite(r["train_loss"]) for r in logs)


def test_sharded_scoring_matches_single_device():
    """Eval scoring with the batch sharded over the data axis (and TP over
    'model') must produce the same log-probs as unsharded scoring — the CLI
    eval path's multi-chip serving contract."""
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.parallel import make_mesh
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    wav = np.random.default_rng(0).normal(size=(8, 3200)).astype(np.float32)

    mesh1 = make_mesh((1, 1), devices=jax.devices()[:1])
    e1 = Engine(model, TrainConfig(), mesh=mesh1)
    p1, b1, _ = e1.init_state(jax.random.key(0))
    ref = np.asarray(e1.score_step(p1, b1, e1.place_batch({"wav": wav})["wav"]))

    mesh = make_mesh((4, 2), devices=jax.devices()[:8])
    eng = Engine(model, TrainConfig(), mesh=mesh)
    params, buffers, _ = eng.init_state(jax.random.key(0))
    placed = eng.place_batch({"wav": wav})["wav"]
    assert len(placed.sharding.device_set) == 8
    out = np.asarray(eng.score_step(params, buffers, placed))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)

    # ragged batch (5 doesn't divide 4): replicated fallback, still correct
    ragged = wav[:5]
    out5 = np.asarray(
        eng.score_step(params, buffers, eng.place_batch({"wav": ragged})["wav"])
    )
    np.testing.assert_allclose(out5, ref[:5], rtol=2e-5, atol=1e-6)


def test_zero1_opt_sharding_parity():
    """ZeRO-1 (AdamW moments sharded over the data axis) must train the same
    trajectory as the replicated optimizer.  The update math is elementwise,
    but re-sharding the opt state gives XLA a different program to fuse, so
    fp32 reduction orders in the backward shift by ~1e-6 relative and Adam's
    m̂/√v̂ amplifies that at early steps — compare the parameter *updates*
    with a tolerance far below any real sharding bug (a miscounted shard
    would shift updates at the 100% scale, not percents)."""
    model = LinearNLL(ssl=XLSRConfig.tiny(ffn_dim=512), emb_dim=16)
    mesh = make_mesh((8, 1))
    rng = np.random.default_rng(0)
    batch = _batch(rng, groups=8)

    results = {}
    init_params = None
    for zero1 in (False, True):
        cfg = TrainConfig(max_lr=1e-4, zero1=zero1, zero1_min_size=1024)
        eng = Engine(model, cfg, mesh=mesh)
        params, buffers, opt_state = eng.init_state(jax.random.key(0))
        opt_state = set_learning_rate(opt_state, 1e-4)
        if init_params is None:
            init_params = jax.tree.map(np.asarray, params)
        if zero1:
            sharded = [
                leaf
                for leaf in jax.tree.leaves(opt_state)
                if isinstance(
                    getattr(leaf, "sharding", None), jax.sharding.NamedSharding
                )
                and "data" in (leaf.sharding.spec or ())
            ]
            assert sharded, "no moment leaf got data-sharded"
            # each chip really holds a fraction of the sharded leaves
            big = max(sharded, key=lambda a: a.size)
            shard_sz = big.addressable_shards[0].data.size
            assert shard_sz * 8 == big.size
        placed = eng.place_batch(batch)
        losses = []
        for i in range(3):
            params, buffers, opt_state, m = eng.train_step(
                params, buffers, opt_state, placed, jax.random.key(i)
            )
            losses.append(float(m["loss"]))
        results[zero1] = (losses, jax.tree.map(np.asarray, params))

    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-5)
    deltas = [
        (a - p0, b - p0)
        for a, b, p0 in zip(
            jax.tree.leaves(results[False][1]),
            jax.tree.leaves(results[True][1]),
            jax.tree.leaves(init_params),
        )
    ]
    # tolerance scales with the *global* update magnitude (~3 steps of lr):
    # near-dead leaves see O(10%) relative jitter from Adam's m̂/√v̂ at g≈0,
    # but a real sharding bug moves active leaves at their full update scale
    scale = max(float(np.abs(da).max()) for da, _ in deltas)
    for da, db in deltas:
        assert float(np.abs(da - db).max()) < 0.1 * scale


def test_global_scope_sharded_matches_single_device():
    """'global' loss scope computes SupCon over the full logical batch; under
    data sharding the pairwise-similarity matrix spans devices, so XLA must
    all-gather the embeddings (SURVEY §5 last row).  One sharded step must
    match the same step on one device."""
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    rng = np.random.default_rng(7)
    batch = _batch(rng, groups=8)

    outs = {}
    init_params = None
    for name, mesh in (
        ("single", make_mesh((1, 1), devices=jax.devices()[:1])),
        ("sharded", make_mesh((8, 1))),
    ):
        eng = Engine(model, TrainConfig(max_lr=1e-4, loss_scope="global"), mesh=mesh)
        params, buffers, opt_state = eng.init_state(jax.random.key(0))
        opt_state = set_learning_rate(opt_state, 1e-4)
        if init_params is None:
            init_params = jax.tree.map(np.asarray, params)
        p, b, o, m = eng.train_step(
            params, buffers, opt_state, eng.place_batch(batch), jax.random.key(1)
        )
        outs[name] = (float(m["loss"]), jax.tree.map(np.asarray, p))

    assert abs(outs["single"][0] - outs["sharded"][0]) < 1e-5
    # compare updates, not raw params: Adam's first step is m̂/√v̂ ≈ sign(g),
    # so reduction-order rounding in g flips near-zero elements by O(lr)
    deltas = [
        (a - p0, b - p0)
        for a, b, p0 in zip(
            jax.tree.leaves(outs["single"][1]),
            jax.tree.leaves(outs["sharded"][1]),
            jax.tree.leaves(init_params),
        )
    ]
    scale = max(float(np.abs(da).max()) for da, _ in deltas)
    for da, db in deltas:
        assert float(np.abs(da - db).max()) < 0.1 * scale


def test_zero1_preserves_tensor_parallel_axis():
    """Moments inherit the params' TP sharding from optimizer.init; ZeRO-1
    must compose 'data' onto a FREE axis, not clobber 'model'."""
    from scl_deepfake_audio_detection_tpu.parallel import shard_opt_state
    from scl_deepfake_audio_detection_tpu.train.optim import make_optimizer

    model = LinearNLL(ssl=XLSRConfig.tiny(ffn_dim=512), emb_dim=16)
    mesh = make_mesh((4, 2))
    from scl_deepfake_audio_detection_tpu.parallel import shard_params

    params = shard_params(model.init(jax.random.key(0)), mesh)
    opt_state = make_optimizer(1e-4).init(params)
    sharded = shard_opt_state(opt_state, mesh, min_size=1024)

    specs = [
        tuple(leaf.sharding.spec)
        for leaf in jax.tree.leaves(sharded)
        if isinstance(getattr(leaf, "sharding", None), jax.sharding.NamedSharding)
        and leaf.ndim >= 2
        and leaf.size >= 1024
    ]
    both = [s for s in specs if "model" in s and "data" in s]
    assert both, f"no moment leaf kept TP while gaining data sharding: {specs[:8]}"

    # 1-wide data axis: opt state untouched (keeps TP placement)
    mesh_tp = make_mesh((1, 8))
    p2 = shard_params(model.init(jax.random.key(0)), mesh_tp)
    o2 = make_optimizer(1e-4).init(p2)
    assert shard_opt_state(o2, mesh_tp, min_size=1024) is o2


def test_async_writer_roundtrip(tmp_path, engine_state):
    """AsyncWriter produces byte-identical checkpoints to the sync path and
    surfaces write failures on wait()."""
    engine, params, buffers, opt_state = engine_state
    sync_p = str(tmp_path / "sync.ckpt")
    async_p = str(tmp_path / "async.ckpt")
    ckpt.save_train_state(sync_p, params, opt_state, 3, jax.random.key(1), 91.0)
    w = ckpt.AsyncWriter()
    ckpt.save_train_state(async_p, params, opt_state, 3, jax.random.key(1),
                          91.0, writer=w)
    w.wait()
    a, ea = ckpt.load(sync_p)
    b, eb = ckpt.load(async_p)
    assert ea == eb
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # a failing write must raise at the join point, not vanish
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("")
    w2 = ckpt.AsyncWriter()
    w2.submit(str(blocker / "x" / "y.ckpt"), {"a": np.zeros(2)}, {})
    import pytest as _pytest

    with _pytest.raises(OSError):
        w2.wait()


def test_ckpt_every_cadence(tmp_path, engine_state):
    import os

    """--ckpt_every N: last.ckpt lands on the cadence epochs + the final
    epoch; resume state is the newest epoch."""
    engine, params, buffers, opt_state = engine_state
    rng = np.random.default_rng(4)
    batches = [_batch(rng, groups=4) for _ in range(1)]
    # engine is module-scoped shared state: restore the cfg fields we mutate
    old_epochs, old_every = engine.cfg.num_epochs, engine.cfg.ckpt_every
    engine.cfg.num_epochs = 5
    engine.cfg.ckpt_every = 3

    saved = []
    orig = ckpt.save_train_state

    def spy(path, *a, **k):
        saved.append((os.path.basename(path), a[2] if len(a) > 2 else k.get("epoch")))
        return orig(path, *a, **k)

    import scl_deepfake_audio_detection_tpu.train.engine as E

    old = E.ckpt.save_train_state
    E.ckpt.save_train_state = spy
    try:
        engine.fit(
            params, buffers, opt_state,
            train_batches=lambda: iter(batches),
            dev_batches=lambda: iter(batches),
            rng_key=jax.random.key(0),
            save_dir=str(tmp_path),
        )
    finally:
        E.ckpt.save_train_state = old
        engine.cfg.num_epochs = old_epochs
        engine.cfg.ckpt_every = old_every
    last_epochs = [e for n, e in saved if n == "last.ckpt"]
    # cadence-3 over epochs 0..4 -> epochs 2 and 4 (final always saves)
    assert last_epochs == [2, 4], saved
    _, extra = ckpt.load(str(tmp_path / "last.ckpt"))
    assert extra["epoch"] == 4


def test_resume_restores_zero1_opt_sharding(tmp_path):
    """load_train_state must re-establish the opt-state template's device
    placement: raw numpy leaves would resume with REPLICATED AdamW moments
    (2x params per chip instead of 2x/N) after a --zero1 checkpoint."""
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    cfg = TrainConfig(max_lr=1e-4, zero1=True, zero1_min_size=64)
    eng = Engine(model, cfg)
    params, buffers, opt_state = eng.init_state(jax.random.key(0))

    def shardings(tree):
        return [
            str(l.sharding)
            for l in jax.tree.leaves(tree)
            if isinstance(l, jax.Array)
        ]

    want = shardings(opt_state)
    assert any("data" in s for s in want)  # ZeRO-1 actually sharded something

    path = str(tmp_path / "state.ckpt")
    ckpt.save_train_state(path, params, opt_state, epoch=3,
                          rng_key=jax.random.key(1), best=50.0,
                          buffers=buffers)
    # fresh engine, fresh template (as on a restart)
    eng2 = Engine(model, cfg)
    _, _, opt_template = eng2.init_state(jax.random.key(0))
    _, _, restored, epoch, _, _ = ckpt.load_train_state(path, opt_template)
    assert epoch == 3
    assert shardings(restored) == want


def test_fit_restores_resume_best(tmp_path):
    """A resumed run must not crown 'best' epochs below the checkpoint's
    saved best-accuracy watermark (EarlyStop restarted at init_best=90
    otherwise, so any resumed epoch above 90 spuriously best-saved)."""
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    eng = Engine(model, TrainConfig(max_lr=1e-4, num_epochs=1))
    params, buffers, opt_state = eng.init_state(jax.random.key(0))

    rng = np.random.default_rng(0)
    batch = {"wav": rng.normal(size=(1, 4, 1600)).astype(np.float32),
             "labels": np.tile([1.0, 1.0, 0.0, 0.0], (1, 1)).astype(np.float32)}
    # pin the dev accuracy BETWEEN EarlyStop's fresh init_best (90) and the
    # checkpoint watermark (99.9): without the resume_best restoration the
    # run WOULD crown a spurious best here, so this test fails if the guard
    # is removed (a fixture whose accuracy can't exceed 90 can't tell)
    eng.run_validation = lambda *a, **kw: {"accuracy": 0.95, "loss": 1.0}
    save_dir = str(tmp_path / "out")
    eng.fit(params, buffers, opt_state,
            train_batches=lambda: iter([batch]),
            dev_batches=lambda: iter([batch]),
            rng_key=jax.random.key(1), save_dir=save_dir, resume_best=99.9)
    import os

    assert not [f for f in os.listdir(save_dir) if f.startswith("epoch_")]
    assert "last.ckpt" in os.listdir(save_dir)
    # sanity of the discrimination: the same run WITHOUT resume_best must
    # best-save at 95% (> init_best 90)
    eng2 = Engine(model, TrainConfig(max_lr=1e-4, num_epochs=1))
    eng2.run_validation = lambda *a, **kw: {"accuracy": 0.95, "loss": 1.0}
    p2, b2, o2 = eng2.init_state(jax.random.key(0))
    save2 = str(tmp_path / "out2")
    eng2.fit(p2, b2, o2, train_batches=lambda: iter([batch]),
             dev_batches=lambda: iter([batch]),
             rng_key=jax.random.key(1), save_dir=save2)
    assert [f for f in os.listdir(save2) if f.startswith("epoch_")]


def test_resume_mid_patience_stops_at_same_epoch(tmp_path):
    """EarlyStop patience persists across resume: a run interrupted
    mid-patience and resumed from last.ckpt must stop at EXACTLY the epoch
    an uninterrupted run stops at (reference EarlyStop state is process-held,
    ``main.py:23-45`` — resume there restarts patience; we persist it)."""
    import os

    def make_engine(num_epochs, start_epoch=0):
        model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
        eng = Engine(model, TrainConfig(
            max_lr=1e-4, num_epochs=num_epochs, start_epoch=start_epoch))
        # constant 95% dev accuracy: epoch 0 crowns the best (95 > 90+delta),
        # every later epoch strikes the patience counter (patience=10), so an
        # uninterrupted run stops after epoch 10 exactly
        eng.run_validation = lambda *a, **kw: {"accuracy": 0.95, "loss": 1.0}
        return eng

    rng = np.random.default_rng(0)
    batch = {"wav": rng.normal(size=(1, 4, 1600)).astype(np.float32),
             "labels": np.tile([1.0, 1.0, 0.0, 0.0], (1, 1)).astype(np.float32)}
    kw = dict(train_batches=lambda: iter([batch]),
              dev_batches=lambda: iter([batch]))

    # uninterrupted run: stops after epoch index 10 (1 best + 10 strikes)
    eng = make_engine(num_epochs=30)
    p, b, o = eng.init_state(jax.random.key(0))
    logs = []
    eng.fit(p, b, o, rng_key=jax.random.key(1),
            save_dir=str(tmp_path / "full"),
            log_fn=lambda e, r: logs.append(e), **kw)
    assert logs[-1] == 10, logs

    # interrupted at epoch 5 (counter=5 in last.ckpt) ...
    eng_a = make_engine(num_epochs=6)
    pa, ba, oa = eng_a.init_state(jax.random.key(0))
    save_a = str(tmp_path / "part")
    eng_a.fit(pa, ba, oa, rng_key=jax.random.key(1), save_dir=save_a, **kw)
    last = os.path.join(save_a, "last.ckpt")
    _, extra = ckpt.load(last)
    assert int(extra["epoch"]) == 5 and int(extra["es_counter"]) == 5

    # ... and resumed (the CLI wiring: load_train_state + extra's es_counter)
    eng_b = make_engine(num_epochs=30, start_epoch=6)
    pb, bb, ob = eng_b.init_state(jax.random.key(0))
    pb, bb, ob, epoch, rng_key, best = ckpt.load_train_state(last, ob)
    from scl_deepfake_audio_detection_tpu.parallel import shard_params

    pb = shard_params(pb, eng_b.mesh)  # the CLI re-shards after load too
    logs_b = []
    eng_b.fit(pb, bb, ob, rng_key=rng_key,
              save_dir=str(tmp_path / "resumed"),
              log_fn=lambda e, r: logs_b.append(e),
              resume_best=best, resume_counter=int(extra["es_counter"]), **kw)
    # identical stop epoch: 6..10 = strikes 6..10, stop after epoch 10 —
    # NOT epoch 15 (what a restarted counter would give)
    assert logs_b[-1] == 10, logs_b

    # resuming a run that ALREADY early-stopped must train ZERO epochs
    # (not strike once more first): last.ckpt of the full run carries
    # counter == patience
    last_full = os.path.join(str(tmp_path / "full"), "last.ckpt")
    _, extra_f = ckpt.load(last_full)
    assert int(extra_f["es_counter"]) == 10
    eng_c = make_engine(num_epochs=30, start_epoch=11)
    pc, bc, oc = eng_c.init_state(jax.random.key(0))
    pc, bc, oc, _, rk, best_c = ckpt.load_train_state(last_full, oc)
    logs_c = []
    eng_c.fit(pc, bc, oc, rng_key=rk, save_dir=str(tmp_path / "re_stopped"),
              log_fn=lambda e, r: logs_c.append(e),
              resume_best=best_c, resume_counter=int(extra_f["es_counter"]),
              **kw)
    assert logs_c == [], logs_c
