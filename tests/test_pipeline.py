"""Pipeline parallelism (parallel/pipeline.py): values and gradients must
match the sequential lax.scan execution; the XLSR encoder layer runs
pipelined unmodified."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.parallel import make_mesh
from scl_deepfake_audio_detection_tpu.parallel.pipeline import pipeline_apply

L, D, B = 8, 16, 8


def _layer_fn(x, layer):
    return jnp.tanh(x @ layer["w"] + layer["b"])


@pytest.fixture
def stacked(rng):
    return {
        "w": jnp.asarray(rng.normal(size=(L, D, D)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1),
    }


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))


def _sequential(stacked, x):
    return jax.lax.scan(lambda c, l: (_layer_fn(c, l), None), x, stacked)[0]


@pytest.mark.parametrize("stages,micro", [(4, 4), (4, 8), (2, 4), (8, 8)])
def test_pipeline_matches_sequential(stacked, x, stages, micro):
    mesh = make_mesh((stages,), axis_names=("pipe",),
                     devices=jax.devices()[:stages])
    ref = _sequential(stacked, x)
    out = pipeline_apply(_layer_fn, stacked, x, mesh, axis="pipe",
                         microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match(stacked, x):
    """jax.grad through ppermute gives the pipeline backward for free — the
    parameter gradients must equal the sequential ones."""
    mesh = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    def loss_pipe(p):
        return jnp.sum(
            pipeline_apply(_layer_fn, p, x, mesh, axis="pipe") ** 2
        )

    g_ref = jax.grad(loss_seq)(stacked)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_single_stage_degenerates_to_scan(stacked, x):
    mesh = make_mesh((1,), axis_names=("pipe",), devices=jax.devices()[:1])
    out = pipeline_apply(_layer_fn, stacked, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_sequential(stacked, x)),
                               rtol=1e-6)


def test_pipeline_runs_xlsr_encoder_layer():
    """The real encoder layer (nested param pytree, attention inside) runs
    pipelined without modification and matches the sequential stack."""
    from scl_deepfake_audio_detection_tpu.models.xlsr import (
        XLSRConfig,
        _encoder_layer,
        init_xlsr,
    )

    cfg = XLSRConfig.tiny(encoder_layers=4)
    params = init_xlsr(jax.random.key(0), cfg)
    stacked = params["encoder"]["layers"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 10, cfg.encoder_dim)).astype(np.float32))

    def layer_fn(c, layer):
        return _encoder_layer(layer, cfg, c, None, None, True)

    ref = jax.lax.scan(lambda c, l: (layer_fn(c, l), None), x, stacked)[0]
    mesh = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])
    out = pipeline_apply(layer_fn, stacked, x, mesh, axis="pipe")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_pipeline_rejects_bad_shapes(stacked, x):
    mesh = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_layer_fn, stacked, x, mesh, microbatches=3)
    bad = jax.tree.map(lambda a: a[:6], stacked)  # 6 layers over 4 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_layer_fn, bad, x, mesh)


def test_pipeline_composes_with_data_parallelism(stacked, x):
    """dp x pp on one 2D mesh (data=2, pipe=4): values AND parameter
    gradients must match the sequential scan — the data-axis grad psum falls
    out of the shard_map transpose (params are replicated over 'data')."""
    mesh = make_mesh((2, 4), axis_names=("data", "pipe"))
    ref = _sequential(stacked, x)
    out = pipeline_apply(_layer_fn, stacked, x, mesh, axis="pipe",
                         data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    def loss_pipe(p):
        return jnp.sum(
            pipeline_apply(_layer_fn, p, x, mesh, axis="pipe",
                           data_axis="data") ** 2
        )

    g_ref = jax.grad(loss_seq)(stacked)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_dp_sharded_input_and_output(stacked, x):
    """With data_axis the batch actually SHARDS: feeding an input already
    placed with the dp sharding runs without resharding and the output
    carries the same data-axis layout (dim0 after the microbatch merge)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((2, 4), axis_names=("data", "pipe"))
    xp = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p, xx: pipeline_apply(_layer_fn, p, xx, mesh, axis="pipe",
                                     data_axis="data")
    )(stacked, xp)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(stacked, x)),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_rejects_bad_data_split(stacked, x):
    """Microbatch size not divisible by the data-axis size is an explicit
    error, not a silent replication."""
    # B=8, microbatches=4 -> microbatch size 2, not divisible by data=4
    with pytest.raises(ValueError, match="data axis"):
        pipeline_apply(_layer_fn, stacked, x,
                       make_mesh((4, 2), axis_names=("data", "pipe")),
                       axis="pipe", microbatches=4, data_axis="data")


def test_pipeline_dtype_changing_stack(stacked, x):
    """A stack whose residual stream runs in bf16 (fp32 wav in, bf16 out —
    the XLSR compute-dtype pattern) pipelines correctly: carry buffers take
    the probed output dtype."""
    mesh = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])

    def bf16_layer(c, layer):
        return _layer_fn(c.astype(jnp.bfloat16), jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), layer)).astype(jnp.bfloat16)

    # plain scan needs the cast OUTSIDE (carry must be type-stable); the
    # pipeline probes the output dtype and ingests with a cast instead
    ref = jax.lax.scan(
        lambda c, l: (bf16_layer(c, l), None), x.astype(jnp.bfloat16), stacked
    )[0]
    out = pipeline_apply(bf16_layer, stacked, x, mesh, axis="pipe")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_pipeline_dtype_changing_stack_one_stage(stacked, x):
    """The num_stages==1 degenerate path must handle a dtype-changing
    layer_fn exactly like the pipelined path (shrinking the pipe axis to 1
    for debugging must not turn a working program into a scan carry-type
    crash)."""
    mesh1 = make_mesh((1,), axis_names=("pipe",), devices=jax.devices()[:1])

    def bf16_layer(c, layer):
        return _layer_fn(c.astype(jnp.bfloat16), jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), layer)).astype(jnp.bfloat16)

    out1 = pipeline_apply(bf16_layer, stacked, x, mesh1, axis="pipe")
    assert out1.dtype == jnp.bfloat16
    mesh4 = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])
    out4 = pipeline_apply(bf16_layer, stacked, x, mesh4, axis="pipe")
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out4, np.float32),
        rtol=1e-2, atol=1e-2,
    )
