"""Perceptual / texture quality metrics: SIFID, LPIPS-style distance, Gram
distance, power-spectrum and color statistics.

The SIFID (Single-Image FID, SinGAN paper) and LPIPS *computations* are
implemented exactly; the feature extractor is pluggable. When a pretrained
torchvision-AlexNet state_dict is available locally (``--weights`` or the
``ITG_QUALITY_WEIGHTS`` env var), its five LPIPS conv taps run as jitted
JAX convs and the scores are paper-comparable. Otherwise (this environment
ships no pretrained weights — zero network egress) the default falls back,
with a visible notice, to a FIXED-SEED random convolutional pyramid —
random-filter features are a standard stand-in for texture statistics
(Ustyuzhaninov et al. 2017, "What does it take to generate natural
textures?": random shallow nets suffice for texture synthesis quality) and
give a deterministic, comparable score between any two models evaluated with
the same seed. Pass ``features_fn`` to plug anything else in.

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
# Pretrained AlexNet extractor (auto-detected): paper-comparable features
# when real weights are available locally


#: ImageNet normalization (applied to [-1, 1] inputs converted to [0, 1])
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

#: torchvision AlexNet ``features`` conv layout: key index -> (stride, pad),
#: with a 3x3/stride-2 max-pool AFTER the relu of layers 0 and 3 (the final
#: pool follows the last tapped relu, so it is irrelevant for features)
_ALEXNET_CONVS = ((0, 4, 2), (3, 1, 2), (6, 1, 1), (8, 1, 1), (10, 1, 1))
_ALEXNET_POOL_AFTER = {0, 3}


def alexnet_features_from_state_dict(
    sd,
) -> Callable[[jnp.ndarray], List[jnp.ndarray]]:
    """Build the LPIPS/SIFID feature extractor from a torchvision
    ``alexnet`` state_dict (``features.{0,3,6,8,10}.{weight,bias}`` —
    the five conv taps LPIPS uses, Zhang et al. 2018). Weights convert
    OIHW -> HWIO once; the pyramid runs as jitted JAX convs, so the same
    code path serves CPU and TPU. Channel widths are read off the
    state_dict, so reduced-width stubs exercise the path in tests."""
    layers = []
    for idx, stride, pad in _ALEXNET_CONVS:
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)
        b = np.asarray(sd[f"features.{idx}.bias"], np.float32)
        layers.append(
            (jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b),
             stride, pad, idx in _ALEXNET_POOL_AFTER)
        )

    @jax.jit
    def features(img: jnp.ndarray) -> List[jnp.ndarray]:
        # [-1, 1] -> ImageNet-normalized
        x = (img + 1.0) / 2.0
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        feats = []
        for w, b, stride, pad, pool in layers:
            x = jax.lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
            feats.append(x)
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID",
                )
        return feats

    return features


#: env var naming a local AlexNet weights file (torchvision state_dict or a
#: full checkpoint dict containing one)
WEIGHTS_ENV = "ITG_QUALITY_WEIGHTS"

_resolve_cache: dict = {}


def resolve_features_fn(
    weights_path: Optional[str] = None, verbose: bool = True
) -> Callable[[jnp.ndarray], List[jnp.ndarray]]:
    """The extractor every metric defaults to: REAL pretrained AlexNet
    features when a weights file is available (``weights_path`` argument or
    the ``ITG_QUALITY_WEIGHTS`` env var — paper-comparable LPIPS/SIFID
    inputs), else the fixed random pyramid with a one-time visible notice
    (scores then comparable only between models evaluated here)."""
    import os
    import sys

    path = weights_path or os.environ.get(WEIGHTS_ENV)
    key = path or ""
    if key in _resolve_cache:
        return _resolve_cache[key]
    fn = None
    if path:
        try:
            import torch

            try:
                # a plain state_dict never needs arbitrary unpickling —
                # prefer the safe load and only fall back explicitly
                obj = torch.load(path, map_location="cpu", weights_only=True)
            except Exception:
                obj = torch.load(path, map_location="cpu", weights_only=False)
            sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            fn = alexnet_features_from_state_dict(
                {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
            )
            if verbose:
                print(f"quality metrics: pretrained AlexNet features ({path})")
        except Exception as e:  # missing file, wrong keys, no torch
            print(
                f"quality metrics: failed to load pretrained weights from "
                f"{path!r} ({e}); falling back to the fixed random pyramid",
                file=sys.stderr,
            )
            fn = None
    if fn is None:
        if path is None and verbose:
            print(
                "quality metrics: no pretrained weights "
                f"(set ${WEIGHTS_ENV} to an AlexNet state_dict for "
                "paper-comparable scores); using the fixed random pyramid",
                file=sys.stderr,
            )
        fn = random_conv_features()
    _resolve_cache[key] = fn
    return fn


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
    features_fn = features_fn or resolve_features_fn()
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
    features_fn = features_fn or resolve_features_fn()
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
    features_fn = features_fn or resolve_features_fn()
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
    features_fn = features_fn or resolve_features_fn()
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
    ap.add_argument("--weights", default=None,
                    help="local pretrained AlexNet state_dict (.pth) for "
                    "paper-comparable features; default: $"
                    + WEIGHTS_ENV + " or the fixed random pyramid")
    ap.add_argument("--platform", default="cpu",
                    choices=["auto", "cpu", "tpu"],
                    help="JAX platform for the feature convs (default cpu: "
                    "the metrics are tiny and a tunneled accelerator adds "
                    "compile latency + hang risk; env vars cannot re-pin "
                    "a sitecustomize-pinned platform — only jax.config)")
    args = ap.parse_args()

    from infinite_texture_gans_tpu.config import apply_platform

    apply_platform(args)  # before any backend touch
    from infinite_texture_gans_tpu import route_cache_for_backend

    route_cache_for_backend()  # ambient-CPU sessions use the per-host dir
    features_fn = resolve_features_fn(args.weights)
    src = _load_image(args.data_path)
    gen = _load_image(args.image)
    report = {"image": args.image, **texture_quality_report(src, gen, features_fn)}
    if args.self_baseline:
        h = src.shape[0] // 2
        base = texture_quality_report(src[:h], src[h:], features_fn)
        report["baseline_self"] = base
    print(json.dumps(report))


if __name__ == "__main__":
    main()
