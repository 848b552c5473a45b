"""MoA — Mixture of (batch) Augmentations, on-device (JAX, NHWC).

Parity: /root/reference/traiNNer/ops/batchaug.py:22-430 (mixup :129,
cutmix :162, resizemix :231, cutblur :350, downup :405, up :445). The torch
versions slice dynamic boxes; here every box operation is expressed as a
coordinate-mask or warp over the FULL static canvas (jnp.where +
bilinear_sample), so each augmentation compiles once regardless of the
random box. The augmentation for an iteration is chosen host-side (one
compiled program per augmentation kind, like the reference's per-call
random.choices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.archs.arch_util import bilinear_sample


def _shuffle(key, gt, lq):
    perm = jax.random.permutation(key, gt.shape[0])
    return gt[perm], lq[perm]


def _box_mask(h: int, w: int, cy, cx, cut_h, cut_w, dtype):
    """(1,H,W,1) mask of the clipped box centered at (cy,cx)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    y1, y2 = cy - cut_h // 2, cy + cut_h // 2
    x1, x2 = cx - cut_w // 2, cx + cut_w // 2
    mask = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
    return mask[None, :, :, None].astype(dtype)


def mixup(gt, lq, scale: int, key, alpha_min: float = 0.4, alpha_max: float = 0.6):
    k1, k2 = jax.random.split(key)
    lam = jax.random.uniform(k1, (), minval=alpha_min, maxval=alpha_max)
    gt_s, lq_s = _shuffle(k2, gt, lq)
    return lam * gt + (1 - lam) * gt_s, lam * lq + (1 - lam) * lq_s


def cutmix(gt, lq, scale: int, key, alpha: float = 0.9):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b, gh, gw, c = gt.shape
    lh, lw = lq.shape[1], lq.shape[2]
    lam = jax.random.uniform(k1, (), maxval=alpha)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (lw * cut_rat).astype(jnp.int32)
    cut_h = (lh * cut_rat).astype(jnp.int32)
    cx = jax.random.randint(k2, (), 0, lw)
    cy = jax.random.randint(k3, (), 0, lh)
    gt_s, lq_s = _shuffle(k4, gt, lq)
    m_lq = _box_mask(lh, lw, cy, cx, cut_h, cut_w, lq.dtype)
    m_gt = _box_mask(gh, gw, cy * scale, cx * scale, cut_h * scale, cut_w * scale, gt.dtype)
    return gt * (1 - m_gt) + gt_s * m_gt, lq * (1 - m_lq) + lq_s * m_lq


def _warp_into_box(img, cy, cx, cut_h, cut_w):
    """Resize `img` (full canvas) into the box; outside-the-box values are
    irrelevant (masked by the caller). Implemented as an inverse warp."""
    b, h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    y1 = (cy - cut_h // 2).astype(jnp.float32)
    x1 = (cx - cut_w // 2).astype(jnp.float32)
    sy = (ys - y1) / jnp.maximum(cut_h.astype(jnp.float32), 1.0) * (h - 1)
    sx = (xs - x1) / jnp.maximum(cut_w.astype(jnp.float32), 1.0) * (w - 1)
    sy = jnp.clip(sy, 0, h - 1)
    sx = jnp.clip(sx, 0, w - 1)
    coords_y = jnp.broadcast_to(sy, (b, h, w))
    coords_x = jnp.broadcast_to(sx, (b, h, w))
    return bilinear_sample(img, coords_y, coords_x)


def resizemix(gt, lq, scale: int, key, scope: tuple[float, float] = (0.5, 0.9)):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lh, lw = lq.shape[1], lq.shape[2]
    gh, gw = gt.shape[1], gt.shape[2]
    tao = jax.random.uniform(k1, (), minval=scope[0], maxval=scope[1])
    cut_w = (lw * tao).astype(jnp.int32)
    cut_h = (lh * tao).astype(jnp.int32)
    cx = jax.random.randint(k2, (), 0, lw)
    cy = jax.random.randint(k3, (), 0, lh)
    gt_s, lq_s = _shuffle(k4, gt, lq)
    m_lq = _box_mask(lh, lw, cy, cx, cut_h, cut_w, lq.dtype)
    m_gt = _box_mask(gh, gw, cy * scale, cx * scale, cut_h * scale, cut_w * scale, gt.dtype)
    gt_warp = _warp_into_box(gt_s, cy * scale, cx * scale, cut_h * scale, cut_w * scale)
    lq_warp = _warp_into_box(lq_s, cy, cx, cut_h, cut_w)
    return gt * (1 - m_gt) + gt_warp * m_gt, lq * (1 - m_lq) + lq_warp * m_lq


def cutblur(gt, lq, scale: int, key, alpha: float = 0.7):
    """Paste the (downscaled) GT region into the LQ at the same location."""
    from trainner_redux_tpu.ops.resize import resize

    k1, k2, k3 = jax.random.split(key, 3)
    lh, lw = lq.shape[1], lq.shape[2]
    lam = jax.random.uniform(k1, (), minval=0.2, maxval=alpha)
    cut_w = (lw * lam).astype(jnp.int32)
    cut_h = (lh * lam).astype(jnp.int32)
    cx = jax.random.randint(k2, (), 0, lw)
    cy = jax.random.randint(k3, (), 0, lh)
    gt_down = resize(gt, (lh, lw), mode="bicubic", antialias=True)
    m_lq = _box_mask(lh, lw, cy, cx, cut_h, cut_w, lq.dtype)
    return gt, lq * (1 - m_lq) + gt_down * m_lq


def downup(gt, lq, scale: int, key, scope: tuple[float, float] = (0.5, 0.9)):
    """Random down-then-up of the LQ (bounded bucket set for static shapes)."""
    from trainner_redux_tpu.ops.resize import resize

    k1, k2 = jax.random.split(key)
    lh, lw = lq.shape[1], lq.shape[2]
    n_buckets = 4
    lo, hi = scope
    scales = [lo + (hi - lo) * (i + 0.5) / n_buckets for i in range(n_buckets)]
    modes = ["bicubic", "bilinear", "nearest-exact"]

    def branch(s, mi):
        def f(x):
            dh, dw = max(4, round(lh * s)), max(4, round(lw * s))
            d = resize(x, (dh, dw), mode=modes[mi])
            return resize(d, (lh, lw), mode=modes[(mi + 1) % 2])

        return f

    branches = [branch(s, mi) for s in scales for mi in range(len(modes))]
    idx = jax.random.randint(k1, (), 0, len(branches))
    return gt, jax.lax.switch(idx, branches, lq)


def up(gt, lq, scale: int, key, scope: tuple[float, float] = (0.5, 0.9)):
    """Zoom-in: crop a random sub-box from both and upscale back to size."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, gh, gw, c = gt.shape
    lh, lw = lq.shape[1], lq.shape[2]
    lam = jax.random.uniform(k1, (), minval=scope[0], maxval=scope[1])
    cut = jnp.maximum((jnp.minimum(lh, lw) * lam).astype(jnp.int32) // 2 * 2, 4)
    pad = cut // 2
    cx = jax.random.randint(k2, (), pad, lw - pad)
    cy = jax.random.randint(k3, (), pad, lh - pad)

    def zoom(img, cy0, cx0, half, h, w):
        ys = jnp.linspace(0.0, 1.0, h)[:, None] * (2 * half - 1) + (cy0 - half)
        xs = jnp.linspace(0.0, 1.0, w)[None, :] * (2 * half - 1) + (cx0 - half)
        coords_y = jnp.broadcast_to(ys, (img.shape[0], h, w))
        coords_x = jnp.broadcast_to(xs, (img.shape[0], h, w))
        return bilinear_sample(img, coords_y, coords_x)

    gt_z = zoom(gt, (cy * scale).astype(jnp.float32), (cx * scale).astype(jnp.float32),
                (pad * scale).astype(jnp.float32), gh, gw)
    lq_z = zoom(lq, cy.astype(jnp.float32), cx.astype(jnp.float32),
                pad.astype(jnp.float32), lh, lw)
    return gt_z, lq_z


AUG_FNS = {
    "mixup": mixup,
    "cutmix": cutmix,
    "resizemix": resizemix,
    "cutblur": cutblur,
    "downup": downup,
    "up": up,
}


class BatchAugment:
    """Per-iteration random choice among the configured augmentations
    (reference batchaug.py:22-45). Each augmentation is jitted separately;
    the host picks which compiled program to run."""

    def __init__(
        self,
        scale: int,
        moa_augs: list[str],
        moa_probs: list[float],
        seed: int = 0,
        debug: bool = False,
        debug_limit: int = 100,
        debug_path: str = "debug/moa",
    ):
        self.scale = scale
        self.moa_augs = list(moa_augs)
        probs = np.asarray(moa_probs[: len(moa_augs)], np.float64)
        self.moa_probs = probs / probs.sum()
        self._rng = np.random.default_rng([seed, 424243])
        self._jitted = {}
        self._count = 0
        self._base_key = jax.random.key(seed + 31337)
        self.debug = bool(debug)
        self.debug_limit = int(debug_limit)
        self.debug_path = debug_path

    def _dump(self, name: str, img) -> None:
        """Save a batch as one image grid (reference batchaug.py:71-123 uses
        torchvision save_image)."""
        import os

        from trainner_redux_tpu.utils.img_util import save_batch_grid

        save_batch_grid(jax.device_get(img), os.path.join(self.debug_path, name))

    def __call__(self, gt, lq):
        self._count += 1
        aug = self._rng.choice(self.moa_augs, p=self.moa_probs)
        debug_this = self.debug and (
            self._count <= self.debug_limit or self.debug_limit == 0
        )
        if debug_this:
            import os

            os.makedirs(self.debug_path, exist_ok=True)
            self._dump(f"{self._count:06d}_preauglq.png", lq)
            self._dump(f"{self._count:06d}_preauggt.png", gt)
        if aug == "none":
            return gt, lq
        if aug not in self._jitted:
            fn = AUG_FNS[aug]
            scale = self.scale
            self._jitted[aug] = jax.jit(
                lambda g, l, k, fn=fn: fn(g, l, scale, k)
            )
        key = jax.random.fold_in(self._base_key, self._count)
        gt, lq = self._jitted[aug](gt, lq, key)
        if debug_this:
            self._dump(f"{self._count:06d}_postaug_{aug}_lqfinal.png", lq)
            self._dump(f"{self._count:06d}_postaug_{aug}_gtfinal.png", gt)
        return gt, lq
