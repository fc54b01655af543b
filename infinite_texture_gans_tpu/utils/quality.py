"""Perceptual / texture quality metrics: SIFID, LPIPS-style distance, Gram
distance, power-spectrum and color statistics.

The SIFID (Single-Image FID, SinGAN paper) and LPIPS *computations* are
implemented exactly; the feature extractor is pluggable because this
environment ships no pretrained InceptionV3/AlexNet weights (zero network
egress). The default extractor is a FIXED-SEED random convolutional pyramid
— random-filter features are a standard stand-in for texture statistics
(Ustyuzhaninov et al. 2017, "What does it take to generate natural
textures?": random shallow nets suffice for texture synthesis quality) and
give a deterministic, comparable score between any two models evaluated with
the same seed. Pass ``features_fn`` to use a real pretrained network.

The reference repo has no quality harness at all (validation is by eyeball,
SURVEY.md §4); the paper's SIFID numbers were computed outside the repo.

Usage (CLI):
    python -m infinite_texture_gans_tpu.utils.quality \
        --image examples/241_tpu_crop_1024x2048.jpg --data_path datasets/241.jpg
"""

from __future__ import annotations

import argparse
import functools
import json
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Feature extractor (pluggable; default = fixed random conv pyramid)


@functools.lru_cache(maxsize=4)
def _default_features(seed: int, depths, kernel: int):
    return random_conv_features(jax.random.key(seed), depths, kernel)


def random_conv_features(
    key: jax.Array = None, depths=(16, 32, 64), kernel: int = 5
) -> Callable[[jnp.ndarray], List[jnp.ndarray]]:
    """A fixed random conv/ReLU/avgpool pyramid: img (N, H, W, 3) in [-1, 1]
    -> list of (N, h_i, w_i, c_i) feature maps, one per level.

    With no key, returns a CACHED default extractor (each call would
    otherwise build a fresh jit closure and recompile)."""
    if key is None:
        return _default_features(1234, tuple(depths), kernel)
    keys = jax.random.split(key, len(depths))
    kernels = []
    cin = 3
    for k, cout in zip(keys, depths):
        w = jax.random.normal(k, (kernel, kernel, cin, cout)) / np.sqrt(
            kernel * kernel * cin
        )
        kernels.append(w)
        cin = cout

    @jax.jit
    def features(img: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        h = img
        for w in kernels:
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            h = jax.nn.relu(h)
            feats.append(h)
            h = jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        return feats

    return features


# --------------------------------------------------------------------------
# SIFID (Frechet distance between spatial feature distributions of ONE real
# and ONE generated image — SinGAN, Shaham et al. 2019)


def _stats(feat: np.ndarray):
    """(H*W, C) spatial feature samples -> (mu, cov)."""
    mu = feat.mean(axis=0)
    cov = np.cov(feat, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID between two Gaussians; matrix sqrt via symmetric eigh."""
    diff = mu1 - mu2
    # sqrtm(cov1) via eigh (cov1 is PSD symmetric)
    w, v = np.linalg.eigh(cov1)
    sq1 = (v * np.sqrt(np.clip(w, 0, None))) @ v.T
    inner = sq1 @ cov2 @ sq1
    w2 = np.linalg.eigvalsh((inner + inner.T) / 2)
    tr_sqrt = np.sqrt(np.clip(w2, 0, None)).sum()
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


def sifid(
    real: np.ndarray,
    fake: np.ndarray,
    features_fn: Optional[Callable] = None,
    level: int = 1,
) -> float:
    """Single-image FID: Frechet distance between the spatial distributions
    of features of one real and one generated image.

    real/fake: (H, W, 3) float in [-1, 1] (sizes may differ).
    ``level`` selects the pyramid level (SIFID uses an early Inception map).
    """
    features_fn = features_fn or random_conv_features()
    fr = np.asarray(features_fn(jnp.asarray(real)[None])[level])[0]
    ff = np.asarray(features_fn(jnp.asarray(fake)[None])[level])[0]
    mur, covr = _stats(fr.reshape(-1, fr.shape[-1]))
    muf, covf = _stats(ff.reshape(-1, ff.shape[-1]))
    return frechet_distance(mur, covr, muf, covf)


# --------------------------------------------------------------------------
# LPIPS-style perceptual distance (unit-normalized deep features, averaged
# squared differences across layers and positions — Zhang et al. 2018)


def lpips_distance(
    a: np.ndarray, b: np.ndarray, features_fn: Optional[Callable] = None
) -> float:
    """a/b: (H, W, 3) in [-1, 1], SAME size (LPIPS is positional)."""
    features_fn = features_fn or random_conv_features()
    fa = features_fn(jnp.asarray(a)[None])
    fb = features_fn(jnp.asarray(b)[None])
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
        nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
        total += float(jnp.mean(jnp.sum((na - nb) ** 2, axis=-1)))
    return total / len(fa)


# --------------------------------------------------------------------------
# Pretrain-free texture statistics


def gram_distance(
    a: np.ndarray, b: np.ndarray, features_fn: Optional[Callable] = None
) -> float:
    """Normalized Gram-matrix (texture-statistics) distance; size-agnostic."""
    features_fn = features_fn or random_conv_features()
    fa = features_fn(jnp.asarray(a)[None])
    fb = features_fn(jnp.asarray(b)[None])
    total = 0.0
    for xa, xb in zip(fa, fb):
        va = xa[0].reshape(-1, xa.shape[-1])
        vb = xb[0].reshape(-1, xb.shape[-1])
        ga = va.T @ va / va.shape[0]
        gb = vb.T @ vb / vb.shape[0]
        total += float(jnp.mean((ga - gb) ** 2) / (jnp.mean(ga**2) + 1e-10))
    return total / len(fa)


def radial_spectrum(img: np.ndarray, bins: int = 64) -> np.ndarray:
    """Radially-averaged log power spectrum of a grayscale image."""
    gray = img.mean(axis=-1)
    gray = gray - gray.mean()
    # normalize by pixel count: comparable across image sizes
    f = np.abs(np.fft.fftshift(np.fft.fft2(gray))) ** 2 / gray.size
    h, w = f.shape
    ry = (np.arange(h) - h / 2)[:, None]
    rx = (np.arange(w) - w / 2)[None, :]
    r = np.hypot(ry, rx)
    r = (r / (r.max() + 1e-9) * (bins - 1)).astype(np.int32).ravel()
    sums = np.bincount(r, weights=f.ravel(), minlength=bins)
    counts = np.bincount(r, minlength=bins)
    return np.log1p(sums / np.maximum(counts, 1))


def spectrum_distance(a: np.ndarray, b: np.ndarray, bins: int = 64) -> float:
    """L2 between radially-averaged log power spectra (texture periodicity)."""
    return float(np.mean((radial_spectrum(a, bins) - radial_spectrum(b, bins)) ** 2))


def color_histogram_distance(a: np.ndarray, b: np.ndarray, bins: int = 32) -> float:
    """Mean per-channel chi-square distance between color histograms."""
    total = 0.0
    for ch in range(a.shape[-1]):
        ha, _ = np.histogram(a[..., ch], bins=bins, range=(-1, 1), density=True)
        hb, _ = np.histogram(b[..., ch], bins=bins, range=(-1, 1), density=True)
        total += float(np.sum((ha - hb) ** 2 / (ha + hb + 1e-10)))
    return total / a.shape[-1]


def texture_quality_report(
    source: np.ndarray, generated: np.ndarray, features_fn: Optional[Callable] = None
) -> dict:
    """All size-agnostic metrics of a generated texture vs its source."""
    features_fn = features_fn or random_conv_features()
    return {
        "sifid_rand": sifid(source, generated, features_fn),
        "gram_dist": gram_distance(source, generated, features_fn),
        "spectrum_dist": spectrum_distance(source, generated),
        "color_hist_chi2": color_histogram_distance(source, generated),
    }


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    im = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return im / 127.5 - 1.0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", required=True, help="generated texture image")
    ap.add_argument("--data_path", required=True, help="source texture image")
    ap.add_argument("--self_baseline", action="store_true",
                    help="also score two disjoint halves of the source "
                    "against each other (the 'perfect texture' floor)")
    args = ap.parse_args()

    src = _load_image(args.data_path)
    gen = _load_image(args.image)
    report = {"image": args.image, **texture_quality_report(src, gen)}
    if args.self_baseline:
        h = src.shape[0] // 2
        base = texture_quality_report(src[:h], src[h:])
        report["baseline_self"] = base
    print(json.dumps(report))


if __name__ == "__main__":
    main()
