"""Device-resident dataset cache with on-device random crop + augment.

TPU-native answer to the input-pipeline gap for conv-speed models
(VERDICT r4 #3). Measured on the bench host: the DATASET is not the
bottleneck (warm-cache `__getitem__` runs at ~8000 img/s single-threaded);
the host->device link is (~65 MB/s on the tunneled backend, ~400 ms per
128-image uint8 block vs 95 ms of SPAN-S compute). The reference hides its
equivalent cost with 8 worker processes + a host RAM decode cache
(/root/reference/traiNNer/data/prefetch_dataloader.py:82-334); the
TPU-native equivalent moves the cache one level down: decoded uint8 source
images live in HBM, and each training batch is cut from them ON DEVICE by
a jitted sampler (dynamic-slice crops + dihedral augment, keyed by the
step RNG). Steady-state H2D traffic drops to zero; crops ride HBM
bandwidth (~µs per batch).

Semantics vs the host loader: crops are uniform over valid offsets and
augments are the same hflip/vflip/transpose coin flips, but the RNG stream
differs from the host path and sampling is with-replacement (the host
EnlargedSampler visits each image exactly `ratio` times per epoch).
Opt in per dataset with `device_cache: true`.

Capacity: every image is padded to the max source extent and stacked, so
the cache costs N * (max_h * max_w * 3) * (1 + 1/scale^2) bytes. DIV2K
(800 x ~2MP GT) is ~5.3 GB — fits a 16 GB v5e chip alongside small-model
training state; the loader refuses datasets above
TRAINNER_DEVICE_CACHE_MB (default 6144) and falls back to the host path.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def device_cache_eligible(dataset, opt) -> tuple[bool, str]:
    """Whether `dataset` can be served from a device cache: train-phase
    paired data with raw uint8 access and bounded total size."""
    if getattr(opt, "phase", None) != "train":
        return False, "device_cache: only the train phase is supported"
    if opt.mean is not None or opt.std is not None or opt.color:
        return False, "device_cache: mean/std/color-y need the host path"
    if not hasattr(dataset, "paths") or not hasattr(dataset, "_load_u8"):
        return False, f"device_cache: {type(dataset).__name__} has no raw access"
    return True, ""


class DeviceCacheFeeder:
    """Drop-in for DevicePrefetcher (reset()/next()) serving jitted
    on-device crops from an HBM-resident image stack."""

    def __init__(
        self,
        dataset,
        opt,
        batch_size: int,
        seed: int = 0,
        sharding=None,
    ) -> None:
        ok, why = device_cache_eligible(dataset, opt)
        if not ok:
            raise ValueError(why)
        scale = opt.scale or 1
        lq_size = opt.lq_size or (opt.gt_size // scale if opt.gt_size else None)
        if lq_size is None:
            raise ValueError("device_cache: train phase requires gt_size/lq_size")
        self.batch_size = batch_size
        self.lq_size = int(lq_size)
        self.scale = int(scale)
        self.use_hflip = bool(opt.use_hflip)
        self.use_rot = bool(opt.use_rot)
        self._seed = seed
        self._count = 0

        lqs, gts, dims = [], [], []
        for entry in dataset.paths:
            lq = dataset._load_u8(entry["lq_path"], "lq")
            gt = dataset._load_u8(entry["gt_path"], "gt")
            gt = gt[: lq.shape[0] * scale, : lq.shape[1] * scale]
            lqs.append(lq)
            gts.append(gt)
            dims.append((lq.shape[0], lq.shape[1]))
        hm = max(d[0] for d in dims)
        wm = max(d[1] for d in dims)
        n = len(lqs)
        budget = float(os.environ.get("TRAINNER_DEVICE_CACHE_MB", 6144)) * 2**20
        total = n * hm * wm * 3 * (1 + scale * scale)
        if total > budget:
            raise ValueError(
                f"device_cache: {total/2**20:.0f} MB exceeds "
                f"TRAINNER_DEVICE_CACHE_MB={budget/2**20:.0f}"
            )
        lq_store = np.zeros((n, hm, wm, 3), np.uint8)
        gt_store = np.zeros((n, hm * scale, wm * scale, 3), np.uint8)
        for i, (lq, gt) in enumerate(zip(lqs, gts)):
            lq_store[i, : lq.shape[0], : lq.shape[1]] = lq
            gt_store[i, : gt.shape[0], : gt.shape[1]] = gt
        put = (
            (lambda x: jax.device_put(x, sharding))
            if sharding is not None
            else jax.device_put
        )
        self._lq_store = put(lq_store)
        self._gt_store = put(gt_store)
        self._dims = put(np.asarray(dims, np.int32))
        self._bind_sampler(k_steps=1, out_sharding=None)

    def _bind_sampler(self, k_steps: int, out_sharding) -> None:
        kwargs = dict(
            bsz=self.batch_size, lq_size=self.lq_size, scale=self.scale,
            use_hflip=self.use_hflip, use_rot=self.use_rot, k_steps=k_steps,
        )
        if out_sharding is not None:
            fn = jax.jit(
                functools.partial(_sample_batch_impl, **kwargs),
                out_shardings=(out_sharding, out_sharding),
            )
        else:
            fn = jax.jit(functools.partial(_sample_batch_impl, **kwargs))
        self._sample = fn

    def configure_for_model(self, model) -> None:
        """Emit batches in the model's exact training layout: the
        (K, B, ...) steps_per_dispatch reshape AND the mesh batch sharding.
        Without this, feed_data sees foreign-sharded jit outputs and
        round-trips them through the HOST to reshard (device_get + re-put:
        ~2 s per 128-image block on the ~65 MB/s tunneled link — measured
        as e2e_fraction 0.044, WORSE than the host loader it replaced)."""
        from trainner_redux_tpu.parallel.mesh import batch_sharding

        k = int(getattr(model, "steps_per_dispatch", 1) or 1)
        mesh = getattr(model, "mesh", None)
        sharding = None
        if mesh is not None:
            sharding = batch_sharding(mesh, 1 if k > 1 else 0)
        self._bind_sampler(k_steps=k, out_sharding=sharding)

    # -- DevicePrefetcher interface ------------------------------------
    def reset(self) -> None:
        pass  # with-replacement sampling has no epoch state

    def next(self) -> dict[str, Any]:
        self._count += 1
        key = jax.random.fold_in(
            jax.random.key(np.uint32((self._seed + 0x9E3779B9) & 0xFFFFFFFF)),
            self._count,
        )
        lq, gt = self._sample(self._lq_store, self._gt_store, self._dims, key)
        return {"lq": lq, "gt": gt}


def _sample_batch_impl(lq_store, gt_store, dims, key, *, bsz, lq_size,
                       scale, use_hflip, use_rot, k_steps=1):
    """One batch of aligned (lq, gt) crops with dihedral augments, all on
    device. Crops use lax.dynamic_slice inside lax.map (a loop of DMAs —
    no data-dependent gather reaches the compiler). k_steps > 1 reshapes
    to the (K, B, ...) dispatch-block layout the train step consumes."""
    n = lq_store.shape[0]
    kimg, ky, kx, kaug = jax.random.split(key, 4)
    idx = jax.random.randint(kimg, (bsz,), 0, n)
    hmax = dims[idx, 0] - lq_size
    wmax = dims[idx, 1] - lq_size
    uy = jax.random.uniform(ky, (bsz,))
    ux = jax.random.uniform(kx, (bsz,))
    y0 = jnp.floor(uy * (hmax + 1).astype(jnp.float32)).astype(jnp.int32)
    x0 = jnp.floor(ux * (wmax + 1).astype(jnp.float32)).astype(jnp.int32)
    aug_bits = jax.random.bernoulli(kaug, 0.5, (bsz, 3))

    def one(args):
        i, y, x, bits = args
        lq_img = jax.lax.dynamic_index_in_dim(lq_store, i, 0, keepdims=False)
        gt_img = jax.lax.dynamic_index_in_dim(gt_store, i, 0, keepdims=False)
        lq = jax.lax.dynamic_slice(lq_img, (y, x, 0), (lq_size, lq_size, 3))
        gt = jax.lax.dynamic_slice(
            gt_img, (y * scale, x * scale, 0),
            (lq_size * scale, lq_size * scale, 3),
        )

        def d4(img, bits):
            # mirror data/transforms.py augment: hflip, vflip (rot), transpose
            if use_hflip:
                img = jnp.where(bits[0], img[:, ::-1], img)
            if use_rot:
                img = jnp.where(bits[1], img[::-1, :], img)
                img = jnp.where(bits[2], jnp.swapaxes(img, 0, 1), img)
            return img

        return d4(lq, bits), d4(gt, bits)

    lq, gt = jax.lax.map(one, (idx, y0, x0, aug_bits))
    if k_steps > 1:
        lq = lq.reshape(k_steps, bsz // k_steps, *lq.shape[1:])
        gt = gt.reshape(k_steps, bsz // k_steps, *gt.shape[1:])
    return lq, gt
