"""GAN losses (JAX).

Parity: /root/reference/traiNNer/losses/gan_loss.py (GANLoss :13,
MultiScaleGANLoss :130, r1_penalty :173, g_path_regularize :191,
gradient_penalty_loss :209) and r3gan_loss.py:112-460 (relativistic hinge +
R1/R2 penalties). Gradient penalties use jax.grad-inside-loss — second-order
differentiation is native in JAX, no create_graph fallbacks needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


def _bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


@LOSS_REGISTRY.register(name="ganloss")
class GANLoss:
    """gan_type: vanilla | lsgan | wgan | wgan_softplus | hinge.

    loss_weight multiplies generator losses only (discriminator always 1.0),
    matching the reference's convention.
    """

    def __init__(
        self,
        loss_weight: float = 1.0,
        gan_type: str = "vanilla",
        real_label_val: float = 1.0,
        fake_label_val: float = 0.0,
    ) -> None:
        self.gan_type = gan_type
        self.loss_weight = loss_weight
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        if gan_type not in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
            raise NotImplementedError(f"GAN type {gan_type} is not implemented.")

    def _base(self, pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
        gt = self.gan_type
        if gt == "vanilla":
            target = jnp.full_like(
                pred, self.real_label_val if target_is_real else self.fake_label_val
            )
            return _bce_with_logits(pred, target)
        if gt == "lsgan":
            target = jnp.full_like(
                pred, self.real_label_val if target_is_real else self.fake_label_val
            )
            return jnp.mean((pred - target) ** 2)
        if gt == "wgan":
            return -pred.mean() if target_is_real else pred.mean()
        if gt == "wgan_softplus":
            return (
                jax.nn.softplus(-pred).mean()
                if target_is_real
                else jax.nn.softplus(pred).mean()
            )
        raise AssertionError

    def __call__(
        self, pred, target_is_real: bool, is_disc: bool = False, **kwargs
    ) -> jnp.ndarray:
        if isinstance(pred, (list, tuple)):
            # multi-scale: delegate to MultiScaleGANLoss semantics
            vals = [
                self(p[-1] if isinstance(p, (list, tuple)) else p, target_is_real, is_disc)
                for p in pred
            ]
            return sum(vals) / len(vals)
        pred = jnp.asarray(pred, jnp.float32)
        if self.gan_type == "hinge":
            if is_disc:
                p = -pred if target_is_real else pred
                loss = jax.nn.relu(1 + p).mean()
            else:
                loss = -pred.mean()
        else:
            loss = self._base(pred, target_is_real)
        # reference convention: the model applies loss_weight for the
        # generator pass; discriminator always weight 1
        return loss


@LOSS_REGISTRY.register(name="multiscaleganloss")
class MultiScaleGANLoss(GANLoss):
    pass  # list handling lives in GANLoss.__call__


def r1_penalty(d_apply, real_images: jnp.ndarray) -> jnp.ndarray:
    """R1: E[||grad_x D(x)||^2] on real data (reference gan_loss.py:173)."""

    def d_sum(x):
        out = d_apply(x)
        if isinstance(out, (list, tuple)):
            out = out[-1]
        return jnp.sum(out)

    grads = jax.grad(d_sum)(real_images)
    return jnp.mean(jnp.sum(grads**2, axis=(1, 2, 3)))


def gradient_penalty_loss(
    d_apply, real_images: jnp.ndarray, fake_images: jnp.ndarray, key
) -> jnp.ndarray:
    """WGAN-GP penalty on random interpolates (reference gan_loss.py:209)."""
    alpha = jax.random.uniform(key, (real_images.shape[0], 1, 1, 1))
    interp = real_images * alpha + fake_images * (1 - alpha)

    def d_sum(x):
        out = d_apply(x)
        if isinstance(out, (list, tuple)):
            out = out[-1]
        return jnp.sum(out)

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


@LOSS_REGISTRY.register(name="r3ganloss")
class R3GANLoss:
    """Relativistic hinge GAN with R1/R2 gradient penalties (R3GAN)."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        gan_type: str = "r3gan",
        real_label_val: float = 1.0,
        fake_label_val: float = 0.0,
        r1_weight: float = 3.0,
        r2_weight: float = 3.0,
        use_relu: bool = False,
    ) -> None:
        self.loss_weight = loss_weight
        self.gan_type = gan_type
        self.r1_weight = float(r1_weight)
        self.r2_weight = float(r2_weight)

    def generator_loss(self, real_pred, fake_pred) -> jnp.ndarray:
        if isinstance(real_pred, (list, tuple)):
            real_pred = real_pred[-1]
        if isinstance(fake_pred, (list, tuple)):
            fake_pred = fake_pred[-1]
        real_pred = jnp.asarray(real_pred, jnp.float32)
        fake_pred = jnp.asarray(fake_pred, jnp.float32)
        loss_real = jax.nn.relu(1.0 + (real_pred - fake_pred.mean())).mean()
        loss_fake = jax.nn.relu(1.0 - (fake_pred - real_pred.mean())).mean()
        return 0.5 * (loss_real + loss_fake)

    def discriminator_loss(
        self, d_apply, real_images: jnp.ndarray, fake_images: jnp.ndarray
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        real_pred = d_apply(real_images)
        fake_pred = d_apply(fake_images)
        if isinstance(real_pred, (list, tuple)):
            real_pred = real_pred[-1]
        if isinstance(fake_pred, (list, tuple)):
            fake_pred = fake_pred[-1]
        real_pred = jnp.asarray(real_pred, jnp.float32)
        fake_pred = jnp.asarray(fake_pred, jnp.float32)

        real_mean = jax.lax.stop_gradient(fake_pred).mean()
        fake_mean = jax.lax.stop_gradient(real_pred).mean()
        adv = 0.5 * (
            jax.nn.relu(1.0 - (real_pred - real_mean)).mean()
            + jax.nn.relu(1.0 + (fake_pred - fake_mean)).mean()
        )
        r1 = self.r1_weight * r1_penalty(d_apply, real_images) if self.r1_weight > 0 else 0.0
        r2 = (
            self.r2_weight * r1_penalty(d_apply, jax.lax.stop_gradient(fake_images))
            if self.r2_weight > 0
            else 0.0
        )
        total = adv + 0.5 * (r1 + r2)
        return total, {
            "l_d_r3gan": adv,
            "l_d_r1": jnp.asarray(r1, jnp.float32),
            "l_d_r2": jnp.asarray(r2, jnp.float32),
        }

    def __call__(self, *args, **kwargs):
        raise TypeError(
            "R3GANLoss is dispatched via generator_loss/discriminator_loss in the "
            "train step, not called directly."
        )


@LOSS_REGISTRY.register(name="multiscaler3ganloss")
class MultiScaleR3GANLoss(R3GANLoss):
    pass
