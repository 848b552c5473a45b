"""LDR-FLIP perceptual difference loss (full published algorithm).

Parity: reference traiNNer/losses/flip_loss.py:64-557 (NVIDIA LDR-FLIP,
Andersson et al., HPG 2020). Implements the complete pipeline — sRGB->YCxCz
opponent transform, per-channel spatial CSF filtering (achromatic/red-green/
blue-yellow sum-of-Gaussians kernels), Hunt-adjusted L*a*b*, HyAB color
metric with error redistribution (qc/pc/pt), and the edge/point feature
pipeline (first/second Gaussian-derivative filters, qf) — combined as
deltaE = deltaE_c ** (1 - deltaE_f).

TPU-native layout: NHWC, the three CSF kernels run as ONE grouped
depthwise conv, color transforms are fused matrix ops, and all filter
kernels/constants are precomputed with numpy at construction so the whole
loss traces into the jitted train step with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.utils.registry import LOSS_REGISTRY

# D65 standard illuminant
_ILLUM = np.array([0.950428545, 1.000000000, 1.088900371], np.float64)
_INV_ILLUM = np.array([1.052156925, 1.000000000, 0.918357670], np.float64)

# exact rational linear-RGB -> XYZ (D65) used by the published implementation
_LINRGB2XYZ = np.array(
    [
        [10135552 / 24577794, 8788810 / 24577794, 4435075 / 24577794],
        [2613072 / 12288897, 8788810 / 12288897, 887015 / 12288897],
        [1425312 / 73733382, 8788810 / 73733382, 70074185 / 73733382],
    ],
    np.float64,
)
_XYZ2LINRGB = np.array(
    [
        [3.241003275, -1.537398934, -0.498615861],
        [-0.969224334, 1.875930071, 0.041554224],
        [0.055639423, -0.204011202, 1.057148933],
    ],
    np.float64,
)

# CSF sum-of-Gaussians parameters per opponent channel (A, RG, BY)
_CSF = {
    "A": (1.0, 0.0047, 0.0, 1e-5),
    "RG": (1.0, 0.0053, 0.0, 1e-5),
    "BY": (34.1, 0.04, 13.5, 0.025),
}


def _srgb2linrgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        c > 0.04045,
        ((jnp.clip(c, 0.04045) + 0.055) / 1.055) ** 2.4,
        c / 12.92,
    )


def _linrgb2srgb_clip(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(c, 0.0, 1.0)


def _xyz2ycxcz(xyz: jnp.ndarray) -> jnp.ndarray:
    xyz = xyz * jnp.asarray(_INV_ILLUM, xyz.dtype)
    y = 116.0 * xyz[..., 1] - 16.0
    cx = 500.0 * (xyz[..., 0] - xyz[..., 1])
    cz = 200.0 * (xyz[..., 1] - xyz[..., 2])
    return jnp.stack([y, cx, cz], axis=-1)


def _ycxcz2xyz(ycc: jnp.ndarray) -> jnp.ndarray:
    y = (ycc[..., 0] + 16.0) / 116.0
    x = y + ycc[..., 1] / 500.0
    z = y - ycc[..., 2] / 200.0
    return jnp.stack([x, y, z], axis=-1) * jnp.asarray(_ILLUM, ycc.dtype)


def _xyz2lab(xyz: jnp.ndarray) -> jnp.ndarray:
    xyz = xyz * jnp.asarray(_INV_ILLUM, xyz.dtype)
    delta = 6.0 / 29.0
    d3 = delta**3
    f = jnp.where(
        xyz > d3,
        jnp.clip(xyz, d3) ** (1.0 / 3.0),
        xyz / (3 * delta * delta) + 4.0 / 29.0,
    )
    ell = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([ell, a, b], axis=-1)


def _hunt(lab: jnp.ndarray) -> jnp.ndarray:
    ell = lab[..., :1]
    return jnp.concatenate([ell, 0.01 * ell * lab[..., 1:]], axis=-1)


def _hyab(a: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    d = a - b
    root = jnp.sqrt(jnp.clip(d[..., 0] ** 2, eps))
    return root + jnp.linalg.norm(d[..., 1:], axis=-1)


def _csf_kernel(ppd: float, channel: str, radius: int) -> np.ndarray:
    a1, b1, a2, b2 = _CSF[channel]
    dx = 1.0 / ppd
    grid = np.arange(-radius, radius + 1, dtype=np.float64)
    xx, yy = np.meshgrid(grid, grid)
    z = (xx * dx) ** 2 + (yy * dx) ** 2
    g = a1 * np.sqrt(np.pi / b1) * np.exp(-(np.pi**2) * z / b1)
    g = g + a2 * np.sqrt(np.pi / b2) * np.exp(-(np.pi**2) * z / b2)
    return (g / g.sum()).astype(np.float32)


def _feature_kernel(ppd: float, kind: str) -> tuple[np.ndarray, int]:
    w = 0.082
    sd = 0.5 * w * ppd
    radius = int(np.ceil(3 * sd))
    grid = np.arange(-radius, radius + 1, dtype=np.float64)
    xx, yy = np.meshgrid(grid, grid)
    g = np.exp(-(xx**2 + yy**2) / (2 * sd * sd))
    gx = -xx * g if kind == "edge" else (xx**2 / (sd * sd) - 1.0) * g
    # normalize positive weights to +1 and negative weights to -1
    neg = -gx[gx < 0].sum()
    pos = gx[gx > 0].sum()
    gx = np.where(gx < 0, gx / neg, gx / pos)
    return gx.astype(np.float32), radius


def _conv_same_replicate(x: jnp.ndarray, k: jnp.ndarray, radius: int,
                         groups: int) -> jnp.ndarray:
    """Depthwise conv with replicate (edge) padding; k is HWIO (kh,kw,1,G)."""
    x = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                mode="edge")
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@LOSS_REGISTRY.register(name="fliploss")
class FLIPLoss:
    """Mean LDR-FLIP error. Inputs: NHWC sRGB in [0, 1]."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        pixels_per_degree: float = (0.7 * 3840 / 0.7) * np.pi / 180,
        **_: dict,
    ) -> None:
        self.loss_weight = float(loss_weight)
        self.ppd = float(pixels_per_degree)
        self.qc, self.qf = 0.7, 0.5
        self.pc, self.pt = 0.4, 0.95
        self.eps = 1e-15

        # CSF kernels share the radius of the widest channel
        max_b = max(max(p[1], p[3]) for p in _CSF.values())
        self.csf_radius = int(np.ceil(3 * np.sqrt(max_b / (2 * np.pi**2)) * self.ppd))
        csf = np.stack(
            [_csf_kernel(self.ppd, ch, self.csf_radius) for ch in ("A", "RG", "BY")],
            axis=-1,
        )  # (k, k, 3)
        self.csf_kernels = jnp.asarray(csf[:, :, None, :])  # HWIO, groups=3

        edge, r = _feature_kernel(self.ppd, "edge")
        point, _ = _feature_kernel(self.ppd, "point")
        self.feat_radius = r
        # x- and y-direction for both detectors in one grouped conv on (Yx2)
        self.feat_kernels = jnp.asarray(
            np.stack([edge, edge.T, point, point.T], axis=-1)[:, :, None, :]
        )

        # cmax: exponentiated max HyAB distance (Hunt-adjusted green vs blue)
        def np_lab(rgb: np.ndarray) -> np.ndarray:
            xyz = _LINRGB2XYZ @ rgb * _INV_ILLUM
            delta = 6.0 / 29.0
            f = np.where(
                xyz > delta**3, np.maximum(xyz, delta**3) ** (1 / 3),
                xyz / (3 * delta * delta) + 4 / 29,
            )
            lab = np.array(
                [116 * f[1] - 16, 500 * (f[0] - f[1]), 200 * (f[1] - f[2])]
            )
            return np.array([lab[0], 0.01 * lab[0] * lab[1], 0.01 * lab[0] * lab[2]])

        g = np_lab(np.array([0.0, 1.0, 0.0]))
        b = np_lab(np.array([0.0, 0.0, 1.0]))
        hyab_gb = np.sqrt(max((g[0] - b[0]) ** 2, self.eps)) + np.linalg.norm(
            g[1:] - b[1:]
        )
        self.cmax = float(hyab_gb**self.qc)

    def _srgb2ycxcz(self, x: jnp.ndarray) -> jnp.ndarray:
        lin = _srgb2linrgb(x)
        xyz = lin @ jnp.asarray(_LINRGB2XYZ.T, x.dtype)
        return _xyz2ycxcz(xyz)

    def _color_pipeline(self, ycc: jnp.ndarray) -> jnp.ndarray:
        filt = _conv_same_replicate(ycc, self.csf_kernels, self.csf_radius, 3)
        # to linear RGB, clamp to the RGB unit cube, then Hunt-adjusted Lab
        lin = _ycxcz2xyz(filt) @ jnp.asarray(_XYZ2LINRGB.T, ycc.dtype)
        lin = _linrgb2srgb_clip(lin)
        xyz = lin @ jnp.asarray(_LINRGB2XYZ.T, ycc.dtype)
        return _hunt(_xyz2lab(xyz))

    def error_map(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel FLIP deltaE (N, H, W) for sRGB NHWC inputs in [0,1]."""
        test = self._srgb2ycxcz(jnp.clip(pred.astype(jnp.float32), 0.0, 1.0))
        ref = self._srgb2ycxcz(jnp.clip(target.astype(jnp.float32), 0.0, 1.0))

        # --- color pipeline ---
        pre_t = self._color_pipeline(test)
        pre_r = self._color_pipeline(ref)
        de_hyab = _hyab(pre_r, pre_t, self.eps) ** self.qc
        pccmax = self.pc * self.cmax
        de_c = jnp.where(
            de_hyab < pccmax,
            (self.pt / pccmax) * de_hyab,
            self.pt + ((de_hyab - pccmax) / (self.cmax - pccmax)) * (1.0 - self.pt),
        )

        # --- feature pipeline --- (normalized Y, 4 filters in one conv)
        y_t = ((test[..., :1] + 16.0) / 116.0)
        y_r = ((ref[..., :1] + 16.0) / 116.0)
        f_t = _conv_same_replicate(y_t, self.feat_kernels, self.feat_radius, 1)
        f_r = _conv_same_replicate(y_r, self.feat_kernels, self.feat_radius, 1)
        edge_t = jnp.linalg.norm(f_t[..., 0:2], axis=-1)
        edge_r = jnp.linalg.norm(f_r[..., 0:2], axis=-1)
        point_t = jnp.linalg.norm(f_t[..., 2:4], axis=-1)
        point_r = jnp.linalg.norm(f_r[..., 2:4], axis=-1)
        de_f = jnp.maximum(
            jnp.abs(edge_r - edge_t), jnp.abs(point_t - point_r)
        )
        de_f = (jnp.clip(de_f, self.eps) / np.sqrt(2.0)) ** self.qf

        return de_c ** (1.0 - de_f)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.loss_weight * self.error_map(pred, target).mean()
