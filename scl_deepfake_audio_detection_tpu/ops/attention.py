"""Multi-head self-attention with a Pallas flash-attention TPU kernel.

The XLS-R encoder runs 24 layers of 16-head/1024-dim self-attention over
~200 audio frames — the hot op of the whole framework (the SSL frontend is
>99% of FLOPs, reference ``model/xlsr.py:41``).  Two interchangeable cores:

- ``attention_reference``: einsum + fp32 softmax.  XLA fuses this well; used
  on CPU, for numerics tests, and as the backward path.
- ``flash_attention``: a Pallas online-softmax kernel that never materializes
  the [T, T] score matrix in HBM — one grid program per (batch*head, q-block),
  streaming kv blocks through VMEM with a running max/sum.  Forward-only;
  gradients recompute through the reference core via ``jax.custom_vjp``
  (fine here: T is small, recompute is cheap, and eval scoring dominates).

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


def _flash_kernel(q_ref, kt_ref, v_ref, o_ref, *, block_kv: int, kv_len: int):
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
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_kv=block_kv, kv_len=eff_kv_len),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tkv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tkv, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tkv * d,
            bytes_accessed=(qf.size + ktf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=b * h * tq * tkv,
        ),
    )(qf, ktf, vf)
    return out.reshape(b, h, tq, d)[:, :, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, kv_len: Optional[int] = None
) -> jnp.ndarray:
    """Flash attention forward (Pallas); backward recomputes via XLA."""
    return _flash_forward(q, k, v, kv_len)


def _flash_fwd(q, k, v, kv_len):
    return _flash_forward(q, k, v, kv_len), (q, k, v)


def _flash_bwd(kv_len, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, kv_len), q, k, v)
    return vjp(g)


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
            try:
                # probe with the masked variant (kv_len < T) so the iota/
                # where branch compiles too; head_dim/dtype still follow the
                # probe shape, so this is best-effort — per-compile routing
                # flakiness (see note above) can defeat any probe
                z = jnp.zeros((1, 1, FLASH_MIN_SEQ, 64), jnp.bfloat16)
                jax.block_until_ready(
                    jax.jit(
                        lambda a: _flash_forward(a, a, a, FLASH_MIN_SEQ - 8)
                    )(z)
                )
                _flash_supported = True
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
