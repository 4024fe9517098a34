"""Multi-head self-attention with a Pallas flash-attention TPU kernel.

The XLS-R encoder runs 24 layers of 16-head/1024-dim self-attention over
~200 audio frames — the hot op of the whole framework (the SSL frontend is
>99% of FLOPs, reference ``model/xlsr.py:41``).  Two interchangeable cores:

- ``attention_reference``: einsum + fp32 softmax.  XLA fuses this well; used
  on CPU, for numerics tests, and at production XLS-R lengths (T~=200) where
  the [T, T] tile is small enough that the fused einsum wins (measured).
- ``flash_attention``: a Pallas online-softmax kernel that never materializes
  the [T, T] score matrix in HBM — one grid program per (batch*head, q-block),
  streaming kv blocks through VMEM with a running max/sum.  The backward is
  flash too: the forward additionally emits the per-row logsumexp L, and two
  Pallas kernels recompute P = exp(S - L) blockwise to form dq and dk/dv —
  so long-T training (1B/2B presets, ``score_long_audio`` windows) never
  materializes [T, T] in either pass.

Key-side padding is handled with a static ``kv_len``: sequence lengths are
fixed by the framework's static-shape design (64000/64600-sample inputs →
199/201 frames), so masks are compile-time constants — no dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[int] = None,
) -> jnp.ndarray:
    """Plain attention. q,k,v: [B, H, T, D] (q already scaled). fp32 softmax."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd",
        p,
        v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)


def _flash_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref, *, block_kv: int,
                  kv_len: int):
    """One q-block vs all kv-blocks, online softmax.
    q_ref [1, bq, D]; kt_ref [1, D, T] (K pre-transposed OUTSIDE the kernel:
    a q·k^T dot contracts axis 1 of both operands, and at least one deployed
    Mosaic/AOT compiler rejects that transposed-rhs bf16 matmul with
    "Bad lhs type" — with K laid out [D, T] every dot is a standard
    [M,K]·[K,N] contraction); v_ref [1, T, D]."""
    # dots run on native (usually bf16) operands with fp32 accumulation —
    # the canonical MXU form.  An explicit fp32 upcast before the dot gets
    # re-folded by Mosaic into a mixed-precision matmul that at least one
    # deployed AOT Mosaic rejects ("Bad lhs type").  Softmax statistics stay
    # fp32; P is cast back to the value dtype for the PV matmul, exactly
    # like ``attention_reference`` does.
    q = q_ref[0]  # [bq, D], native dtype
    bq = q.shape[0]
    t_kv = v_ref.shape[1]
    num_kv = t_kv // block_kv

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)

    for j in range(num_kv):  # static: t_kv is compile-time
        kb_t = kt_ref[0, :, j * block_kv : (j + 1) * block_kv]
        vb = v_ref[0, j * block_kv : (j + 1) * block_kv, :]
        s = jax.lax.dot_general(
            q, kb_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bkv] fp32
        if kv_len < (j + 1) * block_kv:  # static masking of key padding
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked blocks: exp(-inf - -inf) -> use finite rescale
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # per-row logsumexp, saved for the flash backward (P = exp(S - L)).
    # The stat is broadcast across an 8-lane pad: Mosaic requires block
    # last-two dims divisible by (8, 128) or equal to the array dims, so a
    # bare [1, block_q] stat block is unmappable; [block_q, 8] is the
    # cheapest legal layout (lane 0 is the value).
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[int],
    block_q: int = 128,
    block_kv: int = 128,
) -> jnp.ndarray:
    b, h, t, d = q.shape
    t_kv = k.shape[2]

    # pad time to block multiples (static shapes; kv padding is masked away,
    # q padding rows are discarded after the call)
    def pad_t(x, bl):
        pad = (-x.shape[2]) % bl
        return x if pad == 0 else jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    eff_kv_len = kv_len if kv_len is not None else t_kv
    qp, kp, vp = pad_t(q, block_q), pad_t(k, block_kv), pad_t(v, block_kv)
    tq, tkv = qp.shape[2], kp.shape[2]
    qf = qp.reshape(b * h, tq, d)
    # K ships pre-transposed [D, T] (see _flash_kernel docstring); the
    # transpose runs once in XLA, outside the kernel
    ktf = kp.reshape(b * h, tkv, d).swapaxes(1, 2)
    vf = vp.reshape(b * h, tkv, d)

    grid = (b * h, tq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_kv=block_kv, kv_len=eff_kv_len),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tq, 8), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tkv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tkv, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_q, 8), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tkv * d,
            bytes_accessed=(qf.size + ktf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=b * h * tq * tkv,
        ),
    )(qf, ktf, vf)
    return (
        out.reshape(b, h, tq, d)[:, :, :t, :],
        lse[:, :, 0].reshape(b, h, tq)[:, :, :t],
    )


def _flash_bwd_dq_kernel(q_ref, g_ref, kt_ref, vt_ref, k_ref, stats_ref,
                         dq_ref, *, block_kv: int, kv_len: int):
    """dq for one q-block: stream kv blocks, recompute P = exp(S - L).

    dS = P * (dP - D) with dP = dO V^T and D = rowsum(dO * O); dq = dS K.
    Same MXU discipline as the forward: K/V ship pre-transposed where the
    contraction needs them as [D, T], every dot is a plain [M,K]·[K,N].
    stats_ref [1, bq, 8] packs the per-row statistics in the lane-padded
    layout Mosaic accepts: lane 0 = L (logsumexp), lane 1 = D."""
    q = q_ref[0]  # [bq, D]
    g = g_ref[0]  # [bq, D]
    lse = stats_ref[0, :, 0:1]  # [bq, 1] fp32
    dvec = stats_ref[0, :, 1:2]  # [bq, 1] fp32
    t_kv = k_ref.shape[1]
    acc = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    for j in range(t_kv // block_kv):  # static trip count
        kt_j = kt_ref[0, :, j * block_kv : (j + 1) * block_kv]  # [D, bkv]
        vt_j = vt_ref[0, :, j * block_kv : (j + 1) * block_kv]  # [D, bkv]
        k_j = k_ref[0, j * block_kv : (j + 1) * block_kv, :]  # [bkv, D]
        s = jax.lax.dot_general(
            q, kt_j, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if kv_len < (j + 1) * block_kv:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
            s = jnp.where(col < kv_len, s, -jnp.inf)
        p = jnp.exp(s - lse)  # [bq, bkv] fp32; padded q rows have lse=+inf -> 0
        dp = jax.lax.dot_general(
            g, vt_j, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dvec)).astype(k_j.dtype)
        acc = acc + jax.lax.dot_general(
            ds, k_j, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, qt_ref, gt_ref, q_ref, g_ref,
                          statst_ref, dk_ref, dv_ref, *, block_q: int,
                          kv_len: int):
    """dk/dv for one kv-block: stream q blocks, work in the transposed frame
    (S^T = K Q^T) so every matmul keeps the kv-block on the M axis —
    no in-kernel transposes.

    dV = P^T dO;  dK = dS^T Q with dS^T = P^T * (dP^T - D^T), dP^T = V dO^T.
    statst_ref [1, 8, Tq] is the TRANSPOSED stats pack (row 0 = L, row 1 =
    D): the transposed frame needs them as [1, bq] row vectors, and slicing
    a pre-transposed array avoids an in-kernel sublane<->lane transpose."""
    jblk = pl.program_id(1)
    k = k_ref[0]  # [bkv, D]
    v = v_ref[0]  # [bkv, D]
    t_q = q_ref.shape[1]
    bkv = k.shape[0]
    dk_acc = jnp.zeros((bkv, k.shape[1]), jnp.float32)
    dv_acc = jnp.zeros((bkv, v.shape[1]), jnp.float32)
    # static mask for key padding in THIS block: rows past kv_len contribute 0
    row = jax.lax.broadcasted_iota(jnp.int32, (bkv, block_q), 0)
    for i in range(t_q // block_q):  # static trip count
        qt_i = qt_ref[0, :, i * block_q : (i + 1) * block_q]  # [D, bq]
        gt_i = gt_ref[0, :, i * block_q : (i + 1) * block_q]  # [D, bq]
        q_i = q_ref[0, i * block_q : (i + 1) * block_q, :]  # [bq, D]
        g_i = g_ref[0, i * block_q : (i + 1) * block_q, :]  # [bq, D]
        lse_i = statst_ref[0, 0:1, i * block_q : (i + 1) * block_q]  # [1, bq]
        d_i = statst_ref[0, 1:2, i * block_q : (i + 1) * block_q]  # [1, bq]
        st = jax.lax.dot_general(
            k, qt_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bkv, bq] = S^T
        st = jnp.where(row + jblk * bkv < kv_len, st, -jnp.inf)
        pt = jnp.exp(st - lse_i)  # padded q cols: lse=+inf -> 0
        dv_acc = dv_acc + jax.lax.dot_general(
            pt.astype(g_i.dtype), g_i, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v, gt_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dst = (pt * (dpt - d_i)).astype(q_i.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            dst, q_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, o, lse, g, kv_len, block_q: int = 128, block_kv: int = 128
):
    """Pallas flash backward: (dq, dk, dv), [T, T] never materialized."""
    b, h, t, d = q.shape
    t_kv = k.shape[2]
    eff_kv_len = kv_len if kv_len is not None else t_kv

    def pad_t(x, bl):
        pad = (-x.shape[2]) % bl
        return x if pad == 0 else jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qp, gp = pad_t(q, block_q), pad_t(g, block_q)
    kp, vp = pad_t(k, block_kv), pad_t(v, block_kv)
    tq, tkv = qp.shape[2], kp.shape[2]
    # D = rowsum(dO * O) — elementwise+reduce, XLA fuses it; fp32
    dvec = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    pad_rows = tq - t
    if pad_rows:
        # padded q rows: lse=+inf makes every recomputed P entry exp(x-inf)=0,
        # so they contribute nothing to dk/dv; their dq rows are sliced off
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_rows)),
                      constant_values=jnp.inf)
        dvec = jnp.pad(dvec, ((0, 0), (0, 0), (0, pad_rows)))

    bh = b * h
    qf = qp.reshape(bh, tq, d)
    gf = gp.reshape(bh, tq, d)
    kf = kp.reshape(bh, tkv, d)
    vf = vp.reshape(bh, tkv, d)
    qtf = qf.swapaxes(1, 2)  # [bh, D, Tq]
    gtf = gf.swapaxes(1, 2)
    ktf = kf.swapaxes(1, 2)  # [bh, D, Tkv]
    vtf = vf.swapaxes(1, 2)
    # per-row stats packed lane 0 = L, lane 1 = D (see kernel docstrings for
    # why the 8-lane pad + a pre-transposed twin)
    stats = jnp.zeros((bh, tq, 8), jnp.float32)
    stats = stats.at[:, :, 0].set(lse.reshape(bh, tq))
    stats = stats.at[:, :, 1].set(dvec.reshape(bh, tq))
    statst = stats.swapaxes(1, 2)  # [bh, 8, Tq]

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (i,) + (0,) * (len(shape) - 1),
                                      memory_space=pltpu.VMEM)
    blk3 = lambda bl: pl.BlockSpec((1, bl, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_kv=block_kv,
                          kv_len=eff_kv_len),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        grid=(bh, tq // block_q),
        in_specs=[
            blk3(block_q),            # q block
            blk3(block_q),            # dO block
            full((1, d, tkv)),        # K^T
            full((1, d, tkv)),        # V^T
            full((1, tkv, d)),        # K
            pl.BlockSpec((1, block_q, 8), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),  # stats block
        ],
        out_specs=blk3(block_q),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * tq * tkv * d,
            bytes_accessed=(qf.size + gf.size + 2 * kf.size + vf.size)
            * qf.dtype.itemsize,
            transcendentals=bh * tq * tkv,
        ),
    )(qf, gf, ktf, vtf, kf, stats)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          kv_len=eff_kv_len),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tkv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, tkv, d), v.dtype),
        ),
        grid=(bh, tkv // block_kv),
        in_specs=[
            blk3(block_kv),           # K block
            blk3(block_kv),           # V block
            full((1, d, tq)),         # Q^T
            full((1, d, tq)),         # dO^T
            full((1, tq, d)),         # Q
            full((1, tq, d)),         # dO
            full((1, 8, tq)),         # stats^T (row 0 = L, row 1 = D)
        ],
        out_specs=(blk3(block_kv), blk3(block_kv)),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * tq * tkv * d,
            bytes_accessed=(2 * qf.size + 2 * gf.size + kf.size + vf.size)
            * qf.dtype.itemsize,
            transcendentals=bh * tq * tkv,
        ),
    )(kf, vf, qtf, gtf, qf, gf, statst)

    return (
        dq.reshape(b, h, tq, d)[:, :, :t, :],
        dk.reshape(b, h, tkv, d)[:, :, :t_kv, :],
        dv.reshape(b, h, tkv, d)[:, :, :t_kv, :],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, kv_len: Optional[int] = None
) -> jnp.ndarray:
    """Flash attention (Pallas forward AND backward; [T,T] never in HBM)."""
    return _flash_forward(q, k, v, kv_len)[0]


def _flash_fwd(q, k, v, kv_len):
    o, lse = _flash_forward(q, k, v, kv_len)
    return o, (q, k, v, o, lse)


def _flash_bwd(kv_len, res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, g, kv_len)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# Below this sequence length the full [T, T] score matrix is tile-sized and
# XLA's fused einsum beats the streaming kernel (measured on v5e, XLS-R 300M
# @ 24x64600 -> T=201: xla 47.3 ms vs flash 49.8 ms per forward; flash wins
# once T spans many kv blocks).
FLASH_MIN_SEQ = 512

# Lazily probed: some TPU deployment paths route compiles through an AOT
# compiler whose Mosaic version rejects the kernel ("Bad lhs type" on the
# bf16xbf16->f32 tpu.matmul — observed via the axon tunnel's remote AOT
# compile, while direct device compiles of the same program succeed).  The
# 'auto' dispatch probes once per process and falls back to the fused
# einsum when the kernel cannot compile; explicit impl='flash' stays
# unguarded so the failure is visible when requested by name.
_flash_supported: Optional[bool] = None


def flash_available() -> bool:
    global _flash_supported
    if _flash_supported is None:
        if pltpu is None or jax.default_backend() != "tpu":
            _flash_supported = False
        else:
            # probe fwd AND bwd with the masked variant (kv_len < T) so the
            # iota/where branches compile too; head_dim/dtype still follow
            # the probe shape, so this is best-effort — per-compile routing
            # flakiness (see note above) can defeat any probe.  One retry:
            # the bad AOT routing is nondeterministic per compile, so a
            # second attempt rescues transient rejections without hiding a
            # genuinely unsupported kernel for long.
            def probe():
                z = jnp.zeros((1, 1, FLASH_MIN_SEQ, 64), jnp.bfloat16)
                jax.block_until_ready(
                    jax.jit(
                        jax.grad(
                            lambda a: jnp.sum(
                                flash_attention(a, a, a, FLASH_MIN_SEQ - 8)
                                .astype(jnp.float32) ** 2
                            )
                        )
                    )(z)
                )

            for _ in range(2):
                try:
                    probe()
                    _flash_supported = True
                    break
                except Exception:  # compile- or run-time rejection
                    _flash_supported = False
    return _flash_supported


def self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[int] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch: 'flash' (Pallas TPU kernel), 'xla' (einsum), or 'auto'
    (on TPU: flash for long sequences, fused einsum for short ones — the
    XLS-R eval shapes sit at T~=200 where einsum measures faster; see
    FLASH_MIN_SEQ). q must be pre-scaled by 1/sqrt(D)."""
    if impl == "auto":
        on_tpu = pltpu is not None and jax.default_backend() == "tpu"
        impl = (
            "flash"
            if on_tpu and q.shape[2] >= FLASH_MIN_SEQ and flash_available()
            else "xla"
        )
    if impl == "flash":
        return flash_attention(q, k, v, kv_len)
    return attention_reference(q, k, v, kv_len)
