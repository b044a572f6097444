"""Semseg input transforms: chromatic feature aug + coordinate aug.

Behavioral mirror of /root/reference/downstream/semseg/lib/transforms.py:23-225
(ChromaticTranslation / ChromaticAutoContrast / ChromaticJitter /
HueSaturationTranslation; RandomDropout / RandomHorizontalFlip /
ElasticDistortion).  All transforms take and return (coords, feats, labels);
randomness draws from an explicit RandomState when provided (the reference
uses global RNG).
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage
from scipy.interpolate import RegularGridInterpolator


def _rng(rng):
    return rng if rng is not None else np.random


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, *args, **kw):
        for t in self.transforms:
            args = t(*args, **kw)
        return args


# --- feature (chromatic) transforms -------------------------------------


class ChromaticTranslation:
    """Random global color shift: 255 * 2 * ratio * (rand - 0.5), p=0.95."""

    def __init__(self, trans_range_ratio: float = 1e-1):
        self.trans_range_ratio = trans_range_ratio

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if r.rand() < 0.95:
            tr = (r.rand(1, 3) - 0.5) * 255 * 2 * self.trans_range_ratio
            feats[:, :3] = np.clip(tr + feats[:, :3], 0, 255)
        return coords, feats, labels


class ChromaticAutoContrast:
    """Blend with per-cloud contrast-stretched colors, p=0.2."""

    def __init__(self, randomize_blend_factor: bool = True, blend_factor: float = 0.5):
        self.randomize_blend_factor = randomize_blend_factor
        self.blend_factor = blend_factor

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if r.rand() < 0.2:
            lo = feats[:, :3].min(0, keepdims=True)
            hi = feats[:, :3].max(0, keepdims=True)
            assert hi.max() > 1, "colors must be in [0, 255]"
            scale = 255 / np.maximum(hi - lo, 1e-6)
            contrast = (feats[:, :3] - lo) * scale
            blend = r.rand() if self.randomize_blend_factor else self.blend_factor
            feats[:, :3] = (1 - blend) * feats[:, :3] + blend * contrast
        return coords, feats, labels


class ChromaticJitter:
    def __init__(self, std: float = 0.01):
        self.std = std

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if r.rand() < 0.95:
            noise = r.randn(feats.shape[0], 3) * self.std * 255
            feats[:, :3] = np.clip(noise + feats[:, :3], 0, 255)
        return coords, feats, labels


def rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """Vectorized colorsys.rgb_to_hsv over [0,255] arrays (reference
    lib/transforms.py:84-105)."""
    rgb = rgb.astype("float")
    hsv = np.zeros_like(rgb)
    hsv[..., 3:] = rgb[..., 3:]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = np.max(rgb[..., :3], axis=-1)
    minc = np.min(rgb[..., :3], axis=-1)
    hsv[..., 2] = maxc
    mask = maxc != minc
    hsv[mask, 1] = (maxc - minc)[mask] / maxc[mask]
    rc = np.zeros_like(r)
    gc = np.zeros_like(g)
    bc = np.zeros_like(b)
    span = np.where(mask, maxc - minc, 1.0)
    rc[mask] = ((maxc - r) / span)[mask]
    gc[mask] = ((maxc - g) / span)[mask]
    bc[mask] = ((maxc - b) / span)[mask]
    hsv[..., 0] = np.select(
        [r == maxc, g == maxc], [bc - gc, 2.0 + rc - bc], default=4.0 + gc - rc
    )
    hsv[..., 0] = (hsv[..., 0] / 6.0) % 1.0
    return hsv


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    rgb = np.empty_like(hsv)
    rgb[..., 3:] = hsv[..., 3:]
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = (h * 6.0).astype("uint8")
    f = (h * 6.0) - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i % 6
    conditions = [s == 0.0, i == 1, i == 2, i == 3, i == 4, i == 5]
    rgb[..., 0] = np.select(conditions, [v, q, p, p, t, v], default=v)
    rgb[..., 1] = np.select(conditions, [v, v, v, q, p, p], default=t)
    rgb[..., 2] = np.select(conditions, [v, p, t, v, v, q], default=p)
    return rgb.astype("uint8")


class HueSaturationTranslation:
    def __init__(self, hue_max: float, saturation_max: float):
        self.hue_max = hue_max
        self.saturation_max = saturation_max

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        hsv = rgb_to_hsv(feats[:, :3])
        hue_val = (r.rand() - 0.5) * 2 * self.hue_max
        sat_ratio = 1 + (r.rand() - 0.5) * 2 * self.saturation_max
        hsv[..., 0] = np.remainder(hue_val + hsv[..., 0] + 1, 1)
        hsv[..., 1] = np.clip(sat_ratio * hsv[..., 1], 0, 1)
        feats[:, :3] = np.clip(hsv_to_rgb(hsv), 0, 255)
        return coords, feats, labels


# --- coordinate transforms ------------------------------------------------


class RandomDropout:
    def __init__(self, dropout_ratio: float = 0.2, dropout_application_ratio: float = 0.5):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if r.rand() < self.dropout_ratio:
            n = len(coords)
            inds = r.choice(n, int(n * (1 - self.dropout_ratio)), replace=False)
            return coords[inds], feats[inds], labels[inds]
        return coords, feats, labels


class RandomHorizontalFlip:
    def __init__(self, upright_axis: str, is_temporal: bool = False):
        self.is_temporal = is_temporal
        self.d = 4 if is_temporal else 3
        self.upright_axis = {"x": 0, "y": 1, "z": 2}[upright_axis.lower()]
        self.horz_axes = set(range(self.d)) - {self.upright_axis}

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if r.rand() < 0.95:
            for ax in self.horz_axes:
                if r.rand() < 0.5:
                    coord_max = np.max(coords[:, ax])
                    coords[:, ax] = coord_max - coords[:, ax]
        return coords, feats, labels


class ElasticDistortion:
    """Blurred noise grid + trilinear displacement interpolation
    (reference lib/transforms.py:182-225)."""

    def __init__(self, distortion_params):
        self.distortion_params = distortion_params

    @staticmethod
    def elastic_distortion(coords, granularity, magnitude, rng=None):
        r = _rng(rng)
        blurx = np.ones((3, 1, 1, 1), dtype="float32") / 3
        blury = np.ones((1, 3, 1, 1), dtype="float32") / 3
        blurz = np.ones((1, 1, 3, 1), dtype="float32") / 3
        coords_min = coords.min(0)
        noise_dim = ((coords - coords_min).max(0) // granularity).astype(int) + 3
        noise = r.randn(*noise_dim, 3).astype(np.float32)
        for _ in range(2):
            noise = ndimage.convolve(noise, blurx, mode="constant", cval=0)
            noise = ndimage.convolve(noise, blury, mode="constant", cval=0)
            noise = ndimage.convolve(noise, blurz, mode="constant", cval=0)
        ax = [
            np.linspace(d_min, d_max, d)
            for d_min, d_max, d in zip(
                coords_min - granularity,
                coords_min + granularity * (noise_dim - 2),
                noise_dim,
            )
        ]
        interp = RegularGridInterpolator(ax, noise, bounds_error=False, fill_value=0)
        return coords + interp(coords) * magnitude

    def __call__(self, coords, feats, labels, rng=None):
        r = _rng(rng)
        if self.distortion_params is not None and r.rand() < 0.95:
            for granularity, magnitude in self.distortion_params:
                coords = self.elastic_distortion(coords, granularity, magnitude, rng)
        return coords, feats, labels
