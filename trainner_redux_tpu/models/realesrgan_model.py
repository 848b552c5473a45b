"""RealESRGANModel: on-the-fly degradation synthesis, fully on-device.

TPU-native re-design of /root/reference/traiNNer/models/realesrgan_model.py
(feed_data :455-650, training-pair pool :403-453). The torch version runs the
degradation chain eagerly op-by-op on GPU with CPU codec round-trips for
WebP/AVIF/HEIF (a throughput hazard — SURVEY.md §3.4); here the ENTIRE
six-stage pipeline (optics -> sensor -> ISP -> compression -> editing ->
crop + pool) is ONE jitted program: per-batch random gates are traced
lax.cond/jnp.where on jax.random draws, modern-codec compression is
approximated by DiffJPEG at shifted quality (documented divergence), and the
training-pair pool is a device-resident ring buffer shuffled under jit.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.models.sr_model import SRModel
from trainner_redux_tpu.ops import degradations as D
from trainner_redux_tpu.utils.redux_options import ReduxOptions
from trainner_redux_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class RealESRGANModel(SRModel):
    def __init__(self, opt: ReduxOptions) -> None:
        if int(opt.steps_per_dispatch or 1) > 1:
            raise ValueError(
                "steps_per_dispatch > 1 is not supported with the on-the-fly "
                "degradation models yet: the degradation program and the "
                "device ring-buffer pool operate on flat (B, ...) batches."
            )
        super().__init__(opt)
        self.queue_size = int(opt.queue_size)
        self._pool: dict[str, Any] | None = None
        self._feed_count = 0
        self._degrade_jit = jax.jit(self._degrade, static_argnames=("skip_compression",))
        self._pool_jit = jax.jit(self._pool_step)
        self._op_jits: dict[str, Any] = {}

        # degradation sequence control (reference paragon_sequences.py; the
        # reference's enable_sequences path is broken by a missing import —
        # fixed by construction here)
        self.sequence_controller = None
        if opt.enable_sequences:
            from trainner_redux_tpu.models.paragon_sequences import (
                SequenceController,
                sequences_for_set,
            )

            self.sequence_controller = SequenceController(
                sequences_for_set(opt.sequence_set), seed=opt.manual_seed or 0
            )
            self._seq_rng = np.random.default_rng([opt.manual_seed or 0, 515151])

    # ------------------------------------------------------------------
    # the jitted degradation program
    # ------------------------------------------------------------------

    def _degrade(self, gt, kernel1, kernel2, sinc_kernel, key, skip_compression=False):
        """(B, gt_size+32, gt_size+32, 3) GT -> cropped (gt, lq) pair."""
        if gt.dtype == jnp.uint8:  # uint8 H2D path: normalize on-chip
            gt = gt.astype(jnp.float32) / 255.0
        opt = self.opt
        scale = self.scale
        keys = jax.random.split(key, 48)
        # iterator keys (gates) use indices 0..~17; parameter draws use fixed
        # indices 20+; crop uses 47 — disjoint ranges, no reuse
        kit = iter(keys)
        b, ori_h, ori_w, _ = gt.shape

        def gate(prob: float, k, fn, x):
            """Whole-batch Bernoulli gate (reference batch-level semantics)."""
            if prob <= 0:
                return x
            if prob >= 1:
                return fn(x)
            return jax.lax.cond(
                jax.random.uniform(k) < prob, fn, lambda v: v, x
            )

        out = gt

        # -------- stage 1: optics --------
        out = gate(
            opt.lens_distort_prob,
            next(kit),
            lambda x: D.apply_lens_distortion(
                x,
                jax.random.uniform(
                    keys[20], (b,),
                    minval=opt.lens_distort_strength_range[0],
                    maxval=opt.lens_distort_strength_range[1],
                ),
            ),
            out,
        )
        out = gate(
            opt.chromatic_aberration_prob,
            next(kit),
            lambda x: D.apply_chromatic_aberration(
                x, jax.random.uniform(keys[21], (b,), minval=0.5, maxval=2.0)
            ),
            out,
        )
        if opt.motion_blur_prob > 0:
            kmb = next(kit)
            ksize = int(opt.motion_blur_kernel_size[1]) | 1
            angle = jax.random.uniform(
                keys[22], (b,),
                minval=opt.motion_blur_angle_range[0],
                maxval=opt.motion_blur_angle_range[1],
            )
            mb_kernels = jax.vmap(lambda a: D.motion_blur_kernel(None, ksize, a))(angle)
            out = gate(
                opt.motion_blur_prob, kmb, lambda x: D.filter2d(x, mb_kernels), out
            )
        out = gate(
            opt.blur_prob, next(kit), lambda x: D.filter2d(x, kernel1), out
        )

        # -------- stage 2: sensor --------
        out = gate(opt.demosaic_prob, next(kit), D.apply_demosaic_artifacts, out)
        out = gate(
            opt.sensor_noise_prob,
            next(kit),
            lambda x: D.apply_sensor_noise(
                x,
                keys[23],
                jax.random.uniform(
                    keys[24], (b, 1, 1, 1),
                    minval=opt.sensor_noise_std_range[0],
                    maxval=opt.sensor_noise_std_range[1],
                ),
            ),
            out,
        )
        out = gate(
            opt.rolling_shutter_prob,
            next(kit),
            lambda x: D.apply_rolling_shutter(
                x,
                jax.random.uniform(
                    keys[25], (b, 1),
                    minval=opt.rolling_shutter_strength_range[0],
                    maxval=opt.rolling_shutter_strength_range[1],
                ),
            ),
            out,
        )

        # classic noise knobs (gaussian/poisson), kept for config parity
        if opt.gaussian_noise_prob > 0:
            kg = next(kit)
            sigma = jax.random.uniform(
                keys[26], (b,), minval=opt.noise_range[0] / 255.0,
                maxval=max(opt.noise_range[1], opt.noise_range[0] + 1e-6) / 255.0,
            )
            gray = jax.random.uniform(keys[27], (b,)) < opt.gray_noise_prob
            out = gate(
                opt.gaussian_noise_prob,
                kg,
                lambda x: D.add_gaussian_noise(x, keys[28], sigma, gray),
                out,
            )

        # -------- stage 3: ISP --------
        out = gate(
            opt.exposure_prob,
            next(kit),
            lambda x: D.apply_exposure(
                x,
                jax.random.uniform(
                    keys[29], (b, 1, 1, 1),
                    minval=opt.exposure_factor_range[0],
                    maxval=opt.exposure_factor_range[1],
                ),
            ),
            out,
        )
        out = gate(
            opt.color_temp_prob,
            next(kit),
            lambda x: D.apply_color_temperature(
                x,
                jax.random.uniform(
                    keys[30], (b, 1, 1),
                    minval=opt.color_temp_shift_range[0],
                    maxval=opt.color_temp_shift_range[1],
                ),
            ),
            out,
        )
        out = gate(
            opt.oversharpen_prob,
            next(kit),
            lambda x: D.apply_oversharpen(
                x,
                jax.random.uniform(
                    keys[31], (b, 1, 1, 1),
                    minval=opt.oversharpen_strength[0],
                    maxval=opt.oversharpen_strength[1],
                ),
            ),
            out,
        )
        out = gate(
            opt.aliasing_prob,
            next(kit),
            lambda x: D.apply_aliasing(x, keys[32], tuple(opt.aliasing_scale_range)),
            out,
        )

        # final resize to LQ resolution (random mode among the configured list)
        from trainner_redux_tpu.ops.resize import resize

        lq_h, lq_w = ori_h // scale, ori_w // scale
        modes = list(opt.resize_mode_list3)
        probs = np.asarray(opt.resize_mode_prob3, np.float64)
        probs = probs / probs.sum()
        branches = [
            partial(lambda m, x: resize(x, (lq_h, lq_w), mode=m), m) for m in modes
        ]
        mode_idx = jax.random.choice(
            next(kit), len(modes), p=jnp.asarray(probs, jnp.float32)
        )
        out = jax.lax.switch(mode_idx, branches, out)
        out = jnp.clip(out, 0.0, 1.0)

        # anti-aliasing sinc filter
        out = D.filter2d(out, sinc_kernel)

        # -------- stage 4: compression (jpeg + modern-codec surrogates) --------
        if skip_compression:
            # a degradation sequence replaces the compression stages
            lq = D.round_to_uint8(out)
            gt_size0 = self.opt.datasets["train"].gt_size
            assert gt_size0 is not None
            return D.paired_random_crop_device(gt, lq, keys[47], gt_size0, scale)

        fmt_probs = np.asarray(opt.compression_weights, np.float64)
        fmt_probs = fmt_probs / fmt_probs.sum()
        ranges = {
            "jpeg": (tuple(opt.compression_jpeg_range), 0.0),
            "webp": (tuple(opt.compression_webp_range), 5.0),
            "avif": (tuple(opt.compression_avif_range), 10.0),
            "heif": (tuple(opt.compression_heif_range), 8.0),
        }
        comp_branches = []
        for fmt in opt.compression_formats:
            qr, off = ranges[fmt]
            comp_branches.append(
                partial(
                    lambda qr, off, x, k: D.compress_jpeg_like(x, k, qr, off), qr, off
                )
            )
        kf = next(kit)
        kq = next(kit)
        fmt_idx = jax.random.choice(
            kf, len(comp_branches), p=jnp.asarray(fmt_probs, jnp.float32)
        )
        out = jax.lax.switch(fmt_idx, comp_branches, out, kq)

        # stage 6: platform recompression
        if opt.recompression_prob > 0:
            re_probs = np.asarray(opt.recompression_weights, np.float64)
            re_probs = re_probs / re_probs.sum()
            re_branches = []
            for fmt in opt.recompression_formats:
                qr, off = ranges[fmt]
                re_branches.append(
                    partial(
                        lambda qr, off, x, k: D.compress_jpeg_like(x, k, qr, off),
                        qr,
                        off,
                    )
                )
            kr1, kr2, kr3 = jax.random.split(next(kit), 3)
            re_idx = jax.random.choice(
                kr1, len(re_branches), p=jnp.asarray(re_probs, jnp.float32)
            )
            out = jax.lax.cond(
                jax.random.uniform(kr2) < opt.recompression_prob,
                lambda x: jax.lax.switch(re_idx, re_branches, x, kr3),
                lambda x: x,
                out,
            )

        # -------- stage 5: editing --------
        if opt.editing_prob > 0:
            ke = next(kit)
            ke1, ke2, ke3, ke4, ke5 = jax.random.split(ke, 5)

            def editing(x):
                factor = jax.random.uniform(
                    ke2, (),
                    minval=opt.editing_exposure_range[0],
                    maxval=opt.editing_exposure_range[1],
                )
                y = jax.lax.cond(
                    jax.random.uniform(ke3) < opt.editing_exposure_prob,
                    lambda v: jnp.clip(v * factor, 0.0, 1.0),
                    lambda v: v,
                    x,
                )
                # social-media re-sharpening (editing_oversharpen_prob /
                # editing_oversharpen_strength). The reference draws these
                # params but forgets to apply them (realesrgan_model.py:
                # 603-609 dead-ends after the getattr) — here they do what
                # the config says.
                strength = jax.random.uniform(
                    ke5, (x.shape[0], 1, 1, 1),
                    minval=opt.editing_oversharpen_strength[0],
                    maxval=opt.editing_oversharpen_strength[1],
                )
                y = jax.lax.cond(
                    jax.random.uniform(ke4) < opt.editing_oversharpen_prob,
                    lambda v: D.apply_oversharpen(v, strength),
                    lambda v: v,
                    y,
                )
                return y

            out = jax.lax.cond(
                jax.random.uniform(ke1) < opt.editing_prob, editing, lambda x: x, out
            )

        lq = D.round_to_uint8(out)

        # clean pass-through: replace the whole degraded batch with the
        # 8-bit-rounded downscale-free GT path
        if opt.p_clean > 0:
            kc = next(kit)

            def clean(_):
                return D.round_to_uint8(
                    resize(gt, (lq_h, lq_w), mode="bicubic", antialias=True)
                )

            # NOTE: reference clean path keeps full-res GT as LQ (scale
            # mismatch is then handled by crop); for static shapes we emit the
            # antialiased downscale, the closest shape-consistent equivalent.
            lq = jax.lax.cond(
                jax.random.uniform(kc) < opt.p_clean, clean, lambda _: lq, None
            )

        # random paired crop (same offsets whole batch, as in the reference)
        gt_size = self.opt.datasets["train"].gt_size
        assert gt_size is not None
        gt_c, lq_c = D.paired_random_crop_device(gt, lq, keys[47], gt_size, scale)
        return gt_c, lq_c

    # ------------------------------------------------------------------
    # training-pair pool (device ring buffer, reference :403-453)
    # ------------------------------------------------------------------

    def _pool_step(self, pool_lq, pool_gt, count, lq, gt, key):
        b = lq.shape[0]
        qs = self.queue_size

        def full_case(args):
            pool_lq, pool_gt, count = args
            perm = jax.random.permutation(key, qs)
            sl, sg = pool_lq[perm], pool_gt[perm]
            out_lq, out_gt = sl[:b], sg[:b]
            new_lq = jax.lax.dynamic_update_slice(sl, lq, (0, 0, 0, 0))
            new_gt = jax.lax.dynamic_update_slice(sg, gt, (0, 0, 0, 0))
            return new_lq, new_gt, count, out_lq, out_gt

        def fill_case(args):
            pool_lq, pool_gt, count = args
            new_lq = jax.lax.dynamic_update_slice(pool_lq, lq, (count, 0, 0, 0))
            new_gt = jax.lax.dynamic_update_slice(pool_gt, gt, (count, 0, 0, 0))
            return new_lq, new_gt, count + b, lq, gt

        return jax.lax.cond(count >= qs, full_case, fill_case, (pool_lq, pool_gt, count))

    # ------------------------------------------------------------------

    def _apply_plan(self, lq, plan, key):
        """Execute a degradation-sequence plan with per-op jitted executors.
        Op names match the reference's sequence step vocabulary
        (paragon_sequences.py / paragon_video_sequences.py)."""
        from trainner_redux_tpu.ops.resize import gaussian_blur

        def get(name, fn):
            if name not in self._op_jits:
                self._op_jits[name] = jax.jit(fn)
            return self._op_jits[name]

        for i, (op, params) in enumerate(plan):
            k = jax.random.fold_in(key, i + 100)
            b = lq.shape[0]
            if op in ("jpeg", "recompress_jpeg", "jpeg_compression"):
                q = float(params.get("quality", 75.0))
                lq = get("jpeg", lambda x, qq: D.diff_jpeg_clip(x, qq))(
                    lq, jnp.full((b,), q, jnp.float32)
                )
            elif op in ("webp_compression", "avif_compression", "heif_compression"):
                # modern codecs run through the DiffJPEG surrogate at a
                # format-dependent quality offset (same policy as _degrade)
                off = {"webp_compression": 5.0, "avif_compression": 10.0,
                       "heif_compression": 8.0}[op]
                q = float(params.get("quality", 75.0)) + off
                lq = get("jpeg", lambda x, qq: D.diff_jpeg_clip(x, qq))(
                    lq, jnp.full((b,), min(q, 99.0), jnp.float32)
                )
            elif op == "blur":
                sigma = float(params.get("sigma", 1.0))
                lq = jnp.clip(gaussian_blur(lq, 7, sigma), 0.0, 1.0)
            elif op == "motion_blur":
                ksize = int(params.get("kernel_size", 5)) | 1
                angle = float(params.get("angle", 0.0))
                kern = D.motion_blur_kernel(None, ksize, jnp.float32(angle))
                lq = get(f"mblur{ksize}", D.filter2d)(
                    lq, jnp.broadcast_to(kern, (b, ksize, ksize))
                )
            elif op == "sensor_noise":
                std = float(params.get("std", 0.02))
                lq = get("snoise", D.apply_sensor_noise)(
                    lq, k, jnp.full((b, 1, 1, 1), std, jnp.float32)
                )
            elif op in ("oversharpen", "oversharpening"):
                s_ = float(params.get("strength", 1.2))
                lq = get("osharp", D.apply_oversharpen)(
                    lq, jnp.full((b, 1, 1, 1), s_, jnp.float32)
                )
            elif op in ("exposure", "exposure_error"):
                f_ = float(params.get("factor", 1.0))
                lq = get("expo", D.apply_exposure)(
                    lq, jnp.full((b, 1, 1, 1), f_, jnp.float32)
                )
            elif op == "color_temp_shift":
                s_ = float(params.get("shift", 0.0))
                lq = get("ctemp", D.apply_color_temperature)(
                    lq, jnp.full((b, 1, 1), s_, jnp.float32)
                )
            elif op == "lens_distortion":
                s_ = float(params.get("strength", 0.05))
                lq = get("lens", D.apply_lens_distortion)(
                    lq, jnp.full((b,), s_, jnp.float32)
                )
            elif op == "rolling_shutter":
                s_ = float(params.get("strength", 0.03))
                lq = get("rshut", D.apply_rolling_shutter)(
                    lq, jnp.full((b, 1), s_, jnp.float32)
                )
            elif op == "chromatic_aberration":
                s_ = float(params.get("strength", 1.0))
                lq = get("chrab", D.apply_chromatic_aberration)(
                    lq, jnp.full((b,), s_, jnp.float32)
                )
            elif op == "demosaicing":
                lq = get("demos", D.apply_demosaic_artifacts)(lq)
            elif op == "video_compression":
                crf = float(params.get("crf", 28.0))
                lq = get("vcodec", D.apply_video_codec_artifacts)(
                    lq, k, jnp.float32(crf)
                )
            elif op == "block_artifacts":
                s_ = float(params.get("strength", 12.0))
                lq = get("blockart", D.apply_block_artifacts)(lq, jnp.float32(s_))
            elif op == "color_banding":
                bits = float(params.get("bits", 7))
                lq = get("banding", D.apply_color_banding)(lq, jnp.float32(bits))
            elif op == "ringing":
                s_ = float(params.get("strength", 0.05))
                lq = get("ringing", D.apply_ringing)(lq, jnp.float32(s_))
            else:
                raise ValueError(
                    f"unknown degradation op {op!r} in sequence plan; known ops "
                    "follow the reference's sequence vocabulary "
                    "(paragon_sequences.py). A typo here would silently weaken "
                    "the degradation pipeline, so it is an error."
                )
        return D.round_to_uint8(lq)

    def feed_data(self, data: dict[str, Any]) -> None:
        if not (self.is_train and "kernel1" in data):
            super().feed_data(data)
            return

        batch = self.shard_batch(
            {
                k: v
                for k, v in data.items()
                if k in ("gt", "kernel1", "kernel2", "sinc_kernel")
            }
        )
        self._feed_count += 1
        key = jax.random.fold_in(
            jax.random.key((self.opt.manual_seed or 0) + 7919), self._feed_count
        )
        plan = None
        if (
            self.sequence_controller is not None
            and self._seq_rng.uniform() < self.opt.sequence_probability
        ):
            plan = self.sequence_controller.plan()
        gt, lq = self._degrade_jit(
            batch["gt"], batch["kernel1"], batch["kernel2"], batch["sinc_kernel"], key,
            skip_compression=bool(plan),
        )
        if plan:
            lq = self._apply_plan(lq, plan, key)

        if self.queue_size > 0:
            b = int(lq.shape[0])
            if self.queue_size % b != 0:
                raise ValueError(
                    f"queue_size {self.queue_size} must be a multiple of batch {b}"
                )
            if self._pool is None:
                self._pool = {
                    "lq": jnp.zeros((self.queue_size, *lq.shape[1:]), lq.dtype),
                    "gt": jnp.zeros((self.queue_size, *gt.shape[1:]), gt.dtype),
                    "count": jnp.zeros((), jnp.int32),
                }
                self._pool = self.replicate(self._pool)
            pkey = jax.random.fold_in(key, 1)
            new_plq, new_pgt, new_count, lq, gt = self._pool_jit(
                self._pool["lq"], self._pool["gt"], self._pool["count"], lq, gt, pkey
            )
            self._pool = {"lq": new_plq, "gt": new_pgt, "count": new_count}

        # OTF debug dumps (reference realesrgan_model.py:629-646):
        # high_order_degradations_debug saves each degraded batch pair under
        # debug/otf until the limit is reached (0 = unlimited).
        if self.opt.high_order_degradations_debug and (
            self._feed_count <= int(self.opt.high_order_degradations_debug_limit or 0)
            or not self.opt.high_order_degradations_debug_limit
        ):
            import os

            from trainner_redux_tpu.utils.img_util import save_batch_grid

            os.makedirs("debug/otf", exist_ok=True)
            save_batch_grid(
                jax.device_get(lq), f"debug/otf/{self._feed_count:06d}_otf_lq.png"
            )
            save_batch_grid(
                jax.device_get(gt), f"debug/otf/{self._feed_count:06d}_otf_gt.png"
            )

        # MoA at the end of the OTF feed (reference realesrgan_model.py:648-650)
        if getattr(self, "batch_augment", None) is not None:
            gt, lq = self.batch_augment(gt, lq)

        self.lq = lq
        self.gt = gt


@MODEL_REGISTRY.register()
class RealESRGANPairedModel(RealESRGANModel):
    """Probabilistic per-iteration switch between OTF and paired LR feeds
    (parity: reference realesrgan_paired_model.py:20-67)."""

    def feed_data(self, data: dict[str, Any]) -> None:
        rng = np.random.default_rng(
            [self.opt.manual_seed or 0, 104729, self._feed_count]
        )
        if (
            self.is_train
            and "paired_lq" in data
            and rng.uniform() < self.opt.dataroot_lq_prob
        ):
            super(RealESRGANModel, self).feed_data(
                {"lq": data["paired_lq"], "gt": data["paired_gt"]}
            )
            return
        super().feed_data(data)

