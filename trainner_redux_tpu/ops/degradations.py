"""On-device degradation operators (JAX, NHWC, jit-compiled).

TPU-native re-design of the reference's degradation stack:
- /root/reference/traiNNer/data/degradations.py (blur-kernel synthesis,
  noise, resize) — kernel *synthesis* stays host-side numpy for exact
  distribution parity (tiny arrays), but every *image* operation (filtering,
  noise, resize, compression, optics simulation) runs inside the jitted
  degrade step on device.
- /root/reference/traiNNer/models/paragon_otf_degradations.py:35-800 (the
  Paragon operator set: lens distortion, chromatic aberration, motion blur,
  demosaic, sensor noise, rolling shutter, exposure, color temperature,
  oversharpen, aliasing, compression) — re-expressed with static shapes and
  jax.random keys: per-batch Bernoulli gates become lax.cond/jnp.where on
  traced draws, so ONE compiled program covers every random configuration
  (the torch version pays eager-op overhead and CPU codec round-trips).

All probabilities/gates follow the reference's batch-level semantics: one
draw per batch per op, matching RealESRGANModel.feed_data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trainner_redux_tpu.utils.diffjpeg import diff_jpeg


# ---------------------------------------------------------------------------
# filtering
# ---------------------------------------------------------------------------


def filter2d(img: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-sample 2D kernel to every channel (reference
    img_process_util.filter2D). img (B,H,W,C); kernels (B,k,k) or (k,k)."""
    if kernels.ndim == 2:
        kernels = kernels[None].repeat(img.shape[0], axis=0)
    b, h, w, c = img.shape
    k = kernels.shape[-1]
    pad = k // 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def one(im, ker):
        kern = jnp.tile(ker[:, :, None, None], (1, 1, 1, c)).astype(im.dtype)
        return jax.lax.conv_general_dilated(
            im[None], kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )[0]

    return jax.vmap(one)(imgp, kernels.astype(img.dtype))


def usm_sharpen(
    img: jnp.ndarray, weight: float | jnp.ndarray = 0.5, radius: int = 13, threshold: float = 10 / 255
) -> jnp.ndarray:
    """Unsharp masking (reference img_process_util.py:35, USMSharp)."""
    from trainner_redux_tpu.ops.resize import gaussian_blur

    blur = gaussian_blur(img, kernel_size=radius | 1, sigma=(radius | 1) / 6.0)
    residual = img - blur
    mask = (jnp.abs(residual) > threshold).astype(img.dtype)
    soft_mask = gaussian_blur(mask, kernel_size=radius | 1, sigma=(radius | 1) / 6.0)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


# ---------------------------------------------------------------------------
# noise
# ---------------------------------------------------------------------------


def add_gaussian_noise(
    img: jnp.ndarray, key, sigma: jnp.ndarray, gray: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample gaussian noise; sigma (B,) in [0,1] scale; gray (B,) bool."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    noise_c = jax.random.normal(k1, img.shape, img.dtype)
    noise_g = jax.random.normal(k2, (b, h, w, 1), img.dtype)
    noise = jnp.where(gray[:, None, None, None], noise_g, noise_c)
    return jnp.clip(img + noise * sigma[:, None, None, None], 0.0, 1.0)


def add_poisson_noise(
    img: jnp.ndarray, key, scale: jnp.ndarray, gray: jnp.ndarray
) -> jnp.ndarray:
    """Per-sample poisson (shot) noise, matching the reference's
    unique-value-count vals heuristic approximately via a gaussian
    approximation Poisson(lam*x)/lam ~ x + sqrt(x/lam)*N(0,1) — exact in
    distribution for the lam ranges used (vals ~ 2^5..2^9)."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    # reference draws vals = 2**round(uniform) per image; 2**9 is the mode
    vals = 2.0**9
    gauss_c = jax.random.normal(k1, img.shape, img.dtype)
    gauss_g = jax.random.normal(k2, (b, h, w, 1), img.dtype)
    gauss = jnp.where(gray[:, None, None, None], gauss_g, gauss_c)
    base = jnp.where(gray[:, None, None, None], img.mean(-1, keepdims=True), img)
    shot_noise = jnp.sqrt(jnp.clip(base, 1e-8, 1.0) / vals) * gauss
    out = img + shot_noise * scale[:, None, None, None]
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# optics / sensor / ISP operators (Paragon set)
# ---------------------------------------------------------------------------


def apply_exposure(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img * factor, 0.0, 1.0)


def apply_color_temperature(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """shift in [-1,1]: negative=cooler (boost blue), positive=warmer (boost red)."""
    r = img[..., 0] * (1.0 + 0.3 * shift)
    g = img[..., 1]
    b = img[..., 2] * (1.0 - 0.3 * shift)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def apply_oversharpen(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """USM-style oversharpening with halos (strength >= 1)."""
    from trainner_redux_tpu.ops.resize import gaussian_blur

    blur = gaussian_blur(img, kernel_size=5, sigma=1.0)
    return jnp.clip(img + strength * (img - blur), 0.0, 1.0)


def apply_sensor_noise(img: jnp.ndarray, key, std: jnp.ndarray) -> jnp.ndarray:
    """Luminance-dependent sensor noise: shot (sqrt-signal) + read floor."""
    k1, k2 = jax.random.split(key)
    luma = img.mean(axis=-1, keepdims=True)
    shot = jax.random.normal(k1, img.shape, img.dtype) * jnp.sqrt(
        jnp.clip(luma, 1e-6, 1.0)
    )
    read = jax.random.normal(k2, img.shape, img.dtype) * 0.3
    return jnp.clip(img + std * (shot + read), 0.0, 1.0)


def apply_rolling_shutter(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Per-row horizontal shear (CMOS readout skew); strength in [-0.1, 0.1]
    as fraction of width across the frame height."""
    b, h, w, c = img.shape
    rows = jnp.arange(h, dtype=img.dtype) / max(h - 1, 1)
    shift = strength * rows[None, :] * w  # (B, H) pixels
    cols = jnp.arange(w, dtype=img.dtype)[None, None, :]  # (1,1,W)
    src_x = cols - shift[:, :, None]
    src_y = jnp.broadcast_to(
        jnp.arange(h, dtype=img.dtype)[None, :, None], (b, h, w)
    )
    from trainner_redux_tpu.archs.arch_util import bilinear_sample

    return bilinear_sample(img, src_y, jnp.clip(src_x, 0, w - 1))


def apply_lens_distortion(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Radial barrel/pincushion distortion: r' = r * (1 + k * r^2)."""
    b, h, w, c = img.shape
    yy = (jnp.arange(h, dtype=img.dtype) - (h - 1) / 2) / ((h - 1) / 2)
    xx = (jnp.arange(w, dtype=img.dtype) - (w - 1) / 2) / ((w - 1) / 2)
    gy = jnp.broadcast_to(yy[:, None], (h, w))
    gx = jnp.broadcast_to(xx[None, :], (h, w))
    r2 = gx**2 + gy**2
    k = strength.reshape(b, 1, 1)
    factor = 1.0 + k * r2[None]
    src_y = (gy[None] * factor + 1.0) * (h - 1) / 2
    src_x = (gx[None] * factor + 1.0) * (w - 1) / 2
    from trainner_redux_tpu.archs.arch_util import bilinear_sample

    return bilinear_sample(img, jnp.clip(src_y, 0, h - 1), jnp.clip(src_x, 0, w - 1))


def apply_chromatic_aberration(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Lateral CA: scale R/B channels radially in opposite directions."""
    b, h, w, c = img.shape
    out = []
    for ci, s in ((0, 1.0), (1, 0.0), (2, -1.0)):
        ch = img[..., ci : ci + 1]
        scale = 1.0 + strength.reshape(b, 1, 1) * 0.002 * s
        yy = (jnp.arange(h, dtype=img.dtype) - (h - 1) / 2)
        xx = (jnp.arange(w, dtype=img.dtype) - (w - 1) / 2)
        gy = jnp.broadcast_to(yy[:, None], (h, w))[None] * scale + (h - 1) / 2
        gx = jnp.broadcast_to(xx[None, :], (h, w))[None] * scale + (w - 1) / 2
        from trainner_redux_tpu.archs.arch_util import bilinear_sample

        out.append(
            bilinear_sample(ch, jnp.clip(gy, 0, h - 1), jnp.clip(gx, 0, w - 1))
        )
    return jnp.concatenate(out, axis=-1)


def motion_blur_kernel(key, kernel_size: int, angle: jnp.ndarray) -> jnp.ndarray:
    """Line kernel at `angle` degrees rasterized with soft coverage, (k,k)."""
    k = kernel_size
    theta = jnp.deg2rad(angle)
    c = (k - 1) / 2
    ys = jnp.arange(k, dtype=jnp.float32) - c
    xs = jnp.arange(k, dtype=jnp.float32) - c
    gy = jnp.broadcast_to(ys[:, None], (k, k))
    gx = jnp.broadcast_to(xs[None, :], (k, k))
    # distance from the line through the center with direction (cos, sin)
    d_perp = jnp.abs(-jnp.sin(theta) * gx + jnp.cos(theta) * gy)
    d_par = jnp.abs(jnp.cos(theta) * gx + jnp.sin(theta) * gy)
    mask = jnp.clip(1.0 - d_perp, 0.0, 1.0) * (d_par <= c + 0.5)
    return mask / jnp.maximum(mask.sum(), 1e-8)


def apply_demosaic_artifacts(img: jnp.ndarray) -> jnp.ndarray:
    """Simulate Bayer mosaic + naive bilinear demosaic (zipper/maze artifacts)."""
    b, h, w, c = img.shape
    yy = jnp.arange(h) % 2
    xx = jnp.arange(w) % 2
    gy = jnp.broadcast_to(yy[:, None], (h, w))
    gx = jnp.broadcast_to(xx[None, :], (h, w))
    # RGGB pattern masks
    r_mask = ((gy == 0) & (gx == 0)).astype(img.dtype)[None, :, :, None]
    g_mask = (((gy == 0) & (gx == 1)) | ((gy == 1) & (gx == 0))).astype(img.dtype)[
        None, :, :, None
    ]
    b_mask = ((gy == 1) & (gx == 1)).astype(img.dtype)[None, :, :, None]
    mosaic = (
        img[..., 0:1] * r_mask + img[..., 1:2] * g_mask + img[..., 2:3] * b_mask
    )

    def interp(channel_mask):
        # normalized 3x3 box interpolation of the sparse channel
        kern = jnp.ones((3, 3, 1, 1), img.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        num = jax.lax.conv_general_dilated(
            mosaic * channel_mask, kern, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        )
        den = jax.lax.conv_general_dilated(
            jnp.broadcast_to(channel_mask, mosaic.shape), kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn,
        )
        return num / jnp.maximum(den, 1e-8)

    return jnp.clip(
        jnp.concatenate([interp(r_mask), interp(g_mask), interp(b_mask)], axis=-1),
        0.0,
        1.0,
    )


def apply_aliasing(img: jnp.ndarray, key, scale_range: tuple[float, float]) -> jnp.ndarray:
    """Down-then-up with nearest sampling at a random scale — static-shape
    formulation: choose among a fixed set of scale buckets with lax.switch."""
    from trainner_redux_tpu.ops.resize import resize

    b, h, w, c = img.shape
    lo, hi = scale_range
    n_buckets = 4
    scales = [lo + (hi - lo) * (i + 0.5) / n_buckets for i in range(n_buckets)]

    def branch(s):
        def f(x):
            dh, dw = max(8, round(h * s)), max(8, round(w * s))
            down = resize(x, (dh, dw), mode="nearest", antialias=False)
            return resize(down, (h, w), mode="nearest", antialias=False)

        return f

    idx = jax.random.randint(key, (), 0, n_buckets)
    return jax.lax.switch(idx, [branch(s) for s in scales], img)


def round_to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """clamp + 8-bit rounding (reference: clamp((x*255).round(),0,255)/255)."""
    return jnp.clip(jnp.round(img * 255.0), 0.0, 255.0) / 255.0


def paired_random_crop_device(
    gt: jnp.ndarray, lq: jnp.ndarray, key, gt_patch: int, scale: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-synchronized random crop via dynamic_slice (matching the
    reference's tensor-mode paired_random_crop: one offset per batch)."""
    b, h_lq, w_lq, c = lq.shape
    lq_patch = gt_patch // scale
    k1, k2 = jax.random.split(key)
    top = jax.random.randint(k1, (), 0, h_lq - lq_patch + 1)
    left = jax.random.randint(k2, (), 0, w_lq - lq_patch + 1)
    lq_c = jax.lax.dynamic_slice(
        lq, (0, top, left, 0), (b, lq_patch, lq_patch, c)
    )
    gt_c = jax.lax.dynamic_slice(
        gt, (0, top * scale, left * scale, 0), (gt.shape[0], gt_patch, gt_patch, gt.shape[3])
    )
    return gt_c, lq_c


def compress_jpeg_like(
    img: jnp.ndarray, key, quality_range: tuple[float, float], quality_offset: float = 0.0
) -> jnp.ndarray:
    """DiffJPEG compression with per-sample quality drawn from quality_range.

    WebP/AVIF/HEIF are approximated by DiffJPEG at an adjusted effective
    quality (documented divergence from the reference's CPU PIL round-trips,
    which are a major throughput hazard — SURVEY.md §3.4): modern codecs at
    quality q look roughly like JPEG at q + offset.
    """
    b = img.shape[0]
    q = jax.random.uniform(
        key, (b,), minval=quality_range[0], maxval=quality_range[1]
    )
    q = jnp.clip(q + quality_offset, 1.0, 100.0)
    return diff_jpeg(img, q)


def diff_jpeg_clip(img: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """DiffJPEG with traced per-sample quality, clipped to [0,1]."""
    return jnp.clip(diff_jpeg(img, quality), 0.0, 1.0)


def apply_block_artifacts(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Codec blocking surrogate (reference paragon_otf_degradations.py:683-740).

    The reference loops over 8x8 blocks but applies the SAME uniform
    quantization `round(x*255/s)*s/255` to each, so the op degenerates to
    per-pixel quantization with step s/255 — replicated exactly (and
    trivially jittable)."""
    s = jnp.asarray(strength, img.dtype)
    return jnp.clip(jnp.round(img * (255.0 / s)) * (s / 255.0), 0.0, 1.0)


def apply_color_banding(img: jnp.ndarray, bit_depth: jnp.ndarray) -> jnp.ndarray:
    """Bit-depth-reduction banding (reference :743-773): quantize to
    2**bits levels."""
    levels = jnp.asarray(2.0, img.dtype) ** jnp.asarray(bit_depth, img.dtype)
    return jnp.clip(jnp.round(img * (levels - 1)) / (levels - 1), 0.0, 1.0)


def apply_ringing(img: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """Edge ringing/overshoot (reference :776-834): sobel-x edges, a
    [[0,-1,0],[-1,5,-1],[0,-1,0]]/5 oscillation kernel on |edges|, added
    back with the edge sign."""
    sobel = (
        jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype) / 8.0
    )
    ring_k = (
        jnp.asarray([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], img.dtype) / 5.0
    )

    def dw(x, k):
        b, h, w, c = x.shape
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    edges = dw(img, sobel)
    ringing = dw(jnp.abs(edges), ring_k) * jnp.asarray(strength, img.dtype)
    return jnp.clip(img + ringing * jnp.sign(edges), 0.0, 1.0)


def apply_video_codec_artifacts(
    img: jnp.ndarray, key, crf: jnp.ndarray
) -> jnp.ndarray:
    """H.264/H.265-class compression surrogate (documented divergence: the
    reference shells out to FFmpeg per frame, paragon_otf_degradations.py:
    580-680 — a host round-trip that would serialize the jitted pipeline).
    CRF maps to a DiffJPEG quality (CRF 18 ~ q90, CRF 35 ~ q30) plus the
    quantization blockiness codecs exhibit at higher CRF."""
    from trainner_redux_tpu.utils.diffjpeg import diff_jpeg

    q = jnp.clip(140.0 - 3.2 * jnp.asarray(crf, jnp.float32), 10.0, 95.0)
    b = img.shape[0]
    out = diff_jpeg(img, jnp.broadcast_to(q, (b,)))
    block_s = jnp.clip(0.6 * jnp.asarray(crf, jnp.float32) - 8.0, 2.0, 20.0)
    return apply_block_artifacts(jnp.clip(out, 0.0, 1.0), block_s)
