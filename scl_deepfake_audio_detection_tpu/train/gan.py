"""Generic GAN trainer — capability match for the vendored NII GAN manager.

The reference carries ``core_scripts/nn_manager/nn_manager_GAN.py`` (675 LoC,
dead on its active path: no config or entry point reaches it) whose
capability is: one training loop driving a generator/discriminator pair with
separate optimizers, alternating D-then-G updates per batch
(``f_run_one_epoch_GAN`` ``:33-174``), per-epoch validation/checkpointing
like the standard manager. Its sibling ``nn_manager_GAN_ob.py`` (628 LoC)
adds the observed-condition flavor — G consumes conditioning input, an
auxiliary reconstruction loss ``compute_aux(data_gen, data_tar)`` joins the
GAN term (``:306-309``) — and a WGAN epoch (``f_run_one_epoch_WGAN:206-349``:
critic weight clamp 0.01, generator update every ``num_critic=5`` batches);
both are covered here via ``mode='wgan'`` / ``aux_loss_fn`` / dict batches.

TPU-native shape: both updates live in ONE jitted, donated step over the
mesh — the discriminator update (real batch vs ``stop_gradient``'d fake) and
the generator update (through the updated D) — so the chip never waits on
Python between the two phases, and XLA fuses/overlaps the shared G forward.
Loss functions are pluggable; the default is the non-saturating BCE pair
(the NII manager delegates loss choice to the model wrapper the same way).

Models follow this framework's pytree contract (``models/base.py``):
``init(key) -> params`` and ``apply(params, x, train=, rng=) -> output``;
the generator consumes latents ``[N, z_dim]``, the discriminator returns
logits ``[N]`` (or ``[N, 1]``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.parallel import make_mesh, shard_batch
from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
from scl_deepfake_audio_detection_tpu.train.engine import MetricMean
from scl_deepfake_audio_detection_tpu.train.optim import make_optimizer


def bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE against a constant 0/1 target."""
    logits = logits.reshape(-1).astype(jnp.float32)
    # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
    return jnp.mean(
        jax.nn.softplus(-logits) if target == 1.0 else jax.nn.softplus(logits)
    )


def d_loss_nonsaturating(d_real: jnp.ndarray, d_fake: jnp.ndarray) -> jnp.ndarray:
    return bce_logits(d_real, 1.0) + bce_logits(d_fake, 0.0)


def g_loss_nonsaturating(d_fake: jnp.ndarray) -> jnp.ndarray:
    return bce_logits(d_fake, 1.0)


def d_loss_wasserstein(d_real: jnp.ndarray, d_fake: jnp.ndarray) -> jnp.ndarray:
    """Critic loss for WGAN (``nn_manager_GAN_ob.py:255-296`` splits this into
    compute_gan_D_real/_fake; the sum is E[D(fake)] - E[D(real)])."""
    return jnp.mean(d_fake.astype(jnp.float32)) - jnp.mean(d_real.astype(jnp.float32))


def g_loss_wasserstein(d_fake: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(d_fake.astype(jnp.float32))


def mse_aux(fake: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Default auxiliary reconstruction loss for the conditional flavor
    (``compute_aux(data_gen, data_tar)``, ``nn_manager_GAN_ob.py:306-309``)."""
    return jnp.mean((fake.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def _gan_step(
    params_g, params_d, opt_g, opt_d, real, z, rng, step_idx,
    *, gen, disc, optimizer_g, optimizer_d, d_loss_fn, g_loss_fn,
    aux_loss_fn=None, weight_clip=None, g_every=1,
):
    # independent keys per forward: a dropout-using D must draw a fresh mask
    # for the real pass, the fake pass, and the generator objective's pass
    # (reusing one key correlates real/fake gradients through a single mask)
    rng_g, rng_d_real, rng_d_fake, rng_g2, rng_d_g = jax.random.split(rng, 5)

    # --- discriminator update: real up, (stop-gradient) fake down ----------
    fake = gen.apply(params_g, z, train=True, rng=rng_g)
    fake_sg = jax.lax.stop_gradient(fake)

    def d_objective(pd):
        d_real = disc.apply(pd, real, train=True, rng=rng_d_real)
        d_fake = disc.apply(pd, fake_sg, train=True, rng=rng_d_fake)
        return d_loss_fn(d_real, d_fake)

    d_val, d_grads = jax.value_and_grad(d_objective)(params_d)
    d_updates, opt_d = optimizer_d.update(d_grads, opt_d, params_d)
    params_d = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), params_d, d_updates)

    if weight_clip is not None:
        # WGAN critic 1-Lipschitz enforcement by clamping
        # (nn_manager_GAN_ob.py:299-301)
        c = float(weight_clip)
        params_d = jax.tree.map(lambda p: jnp.clip(p, -c, c), params_d)

    # --- generator update through the UPDATED discriminator ----------------
    def g_objective(pg):
        f = gen.apply(pg, z, train=True, rng=rng_g2)
        gan_term = g_loss_fn(disc.apply(params_d, f, train=True, rng=rng_d_g))
        aux_term = (
            aux_loss_fn(f, real) if aux_loss_fn is not None
            else jnp.zeros((), jnp.float32)
        )
        return gan_term + aux_term, (gan_term, aux_term)

    def g_update(operand):
        pg, og = operand
        (_, (g_val, aux_val)), g_grads = jax.value_and_grad(
            g_objective, has_aux=True
        )(pg)
        g_updates, og = optimizer_g.update(g_grads, og, pg)
        pg = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), pg, g_updates)
        return pg, og, g_val, aux_val

    if g_every == 1:
        params_g, opt_g, g_val, aux_val = g_update((params_g, opt_g))
    else:
        # WGAN: the generator moves only every `g_every` critic steps
        # (num_critic, nn_manager_GAN_ob.py:222,312-315). The skip branch
        # still evaluates the objective — the reference logs errG every
        # batch — but pays no backward.
        def g_skip(operand):
            pg, og = operand
            _, (g_val, aux_val) = g_objective(pg)
            return pg, og, g_val, aux_val

        params_g, opt_g, g_val, aux_val = jax.lax.cond(
            step_idx % g_every == 0, g_update, g_skip, (params_g, opt_g)
        )

    metrics = {"d_loss": d_val, "g_loss": g_val, "g_aux": aux_val}
    return params_g, params_d, opt_g, opt_d, metrics


class GANEngine:
    """Owns the jitted alternating step + the epoch/checkpoint loop."""

    def __init__(
        self,
        generator,
        discriminator,
        z_dim: int,
        lr_g: float = 1e-4,
        lr_d: float = 1e-4,
        weight_decay: float = 0.0,
        d_loss_fn: Optional[Callable] = None,
        g_loss_fn: Optional[Callable] = None,
        mode: str = "gan",
        n_critic: Optional[int] = None,
        weight_clip: Optional[float] = None,
        aux_loss_fn: Optional[Callable] = None,
        mesh=None,
    ):
        """``mode='wgan'`` selects the Wasserstein flavor of the NII
        ``nn_manager_GAN_ob`` manager (``f_run_one_epoch_WGAN:206-349``):
        critic losses, weight clamp (default 0.01) and a generator update
        every ``n_critic`` (default 5) steps. ``aux_loss_fn(fake, target)``
        adds the conditional manager's reconstruction term (``compute_aux``)
        — pass conditioning features as the ``z`` stream (dict batches with
        a ``"z"`` key) and targets as ``real``."""
        if mode not in ("gan", "wgan"):
            raise ValueError(f"unknown GAN mode {mode!r}")
        if mode == "wgan":
            d_loss_fn = d_loss_fn or d_loss_wasserstein
            g_loss_fn = g_loss_fn or g_loss_wasserstein
            n_critic = 5 if n_critic is None else n_critic
            weight_clip = 0.01 if weight_clip is None else weight_clip
        else:
            d_loss_fn = d_loss_fn or d_loss_nonsaturating
            g_loss_fn = g_loss_fn or g_loss_nonsaturating
            n_critic = 1 if n_critic is None else n_critic
        self.gen, self.disc, self.z_dim = generator, discriminator, z_dim
        self.mesh = mesh if mesh is not None else make_mesh()
        self.opt_g_def = make_optimizer(weight_decay)
        self.opt_d_def = make_optimizer(weight_decay)
        self.lr_g, self.lr_d = lr_g, lr_d
        self._global_step = 0
        self.step = jax.jit(
            functools.partial(
                _gan_step, gen=generator, disc=discriminator,
                optimizer_g=self.opt_g_def, optimizer_d=self.opt_d_def,
                d_loss_fn=d_loss_fn, g_loss_fn=g_loss_fn,
                aux_loss_fn=aux_loss_fn, weight_clip=weight_clip,
                g_every=int(n_critic),
            ),
            donate_argnums=(0, 1, 2, 3),
        )

    def init_state(self, key):
        from scl_deepfake_audio_detection_tpu.train.optim import (
            set_learning_rate,
        )

        kg, kd = jax.random.split(key)
        params_g = jax.jit(self.gen.init)(kg)
        params_d = jax.jit(self.disc.init)(kd)
        opt_g = set_learning_rate(self.opt_g_def.init(params_g), self.lr_g)
        opt_d = set_learning_rate(self.opt_d_def.init(params_d), self.lr_d)
        return params_g, params_d, opt_g, opt_d

    def run_epoch(
        self, params_g, params_d, opt_g, opt_d,
        real_batches: Iterable[np.ndarray], rng_key,
    ) -> Tuple[Any, Any, Any, Any, Dict[str, float]]:
        agg = MetricMean()
        for i, batch in enumerate(real_batches):
            r = jax.random.fold_in(rng_key, i)
            if isinstance(batch, dict):
                # conditional flavor: caller provides the generator input
                # ("z" = conditioning features) and the target ("real")
                real, z = np.asarray(batch["real"]), np.asarray(batch["z"])
            else:
                real = np.asarray(batch)
                z = jax.random.normal(
                    jax.random.fold_in(r, 7), (np.shape(real)[0], self.z_dim)
                )
            placed = shard_batch({"real": real, "z": z}, self.mesh)
            params_g, params_d, opt_g, opt_d, m = self.step(
                params_g, params_d, opt_g, opt_d, placed["real"], placed["z"],
                r, jnp.asarray(self._global_step, jnp.int32),
            )
            self._global_step += 1
            agg.add(m)
        return params_g, params_d, opt_g, opt_d, agg.result()

    def fit(
        self, real_batches_fn: Callable[[], Iterable[np.ndarray]],
        num_epochs: int, rng_key, save_dir: Optional[str] = None,
        log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    ):
        state = self.init_state(rng_key)
        for epoch in range(num_epochs):
            *state, metrics = self.run_epoch(
                *state, real_batches_fn(), jax.random.fold_in(rng_key, epoch)
            )
            if log_fn:
                log_fn(epoch, metrics)
            if save_dir:
                # both networks + both optimizer states, resumable like the
                # NII manager's joint checkpoint (nn_manager_GAN.py:214-218)
                ckpt.save(
                    f"{save_dir}/gan_last.ckpt",
                    {
                        "params_g": state[0], "params_d": state[1],
                        "opt_g_leaves": ckpt.pack_opt_leaves(state[2]),
                        "opt_d_leaves": ckpt.pack_opt_leaves(state[3]),
                    },
                    extra={"epoch": epoch},
                )
        return tuple(state)
