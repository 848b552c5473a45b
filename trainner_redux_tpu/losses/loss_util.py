"""Loss helpers: reductions and criterion dispatch (JAX, NHWC)."""

from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp


def reduce_loss(loss: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"invalid reduction {reduction}")


def l1(pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    return reduce_loss(jnp.abs(pred - target), reduction)


def l2(pred: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    return reduce_loss((pred - target) ** 2, reduction)


def charbonnier(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-12, reduction: str = "mean"
) -> jnp.ndarray:
    return reduce_loss(jnp.sqrt((pred - target) ** 2 + eps), reduction)


def huber(
    pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0, reduction: str = "mean"
) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff <= delta, 0.5 * diff**2, delta * (diff - 0.5 * delta))
    return reduce_loss(loss, reduction)


def get_criterion(name: str) -> Callable:
    table = {
        "l1": l1,
        "l2": l2,
        "mse": l2,
        "charbonnier": charbonnier,
        "huber": huber,
    }
    if name not in table:
        raise NotImplementedError(f"{name} criterion has not been supported.")
    return table[name]


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """NHWC average pooling with stride=k (torch AvgPool2d(kernel_size=k))."""
    n, h, w, c = x.shape
    x = x[:, : h - h % k, : w - w % k, :]
    x = x.reshape(n, x.shape[1] // k, k, x.shape[2] // k, k, c)
    return x.mean(axis=(2, 4))
