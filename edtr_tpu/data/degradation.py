"""Degradation kernel/noise/JPEG library.

Re-implementation of the standard BasicSR/Real-ESRGAN degradation math used
by the reference (``datasets/degradation.py``, 765 LoC): bivariate
(generalized/plateau) Gaussian blur kernels, sinc ``circular_lowpass_kernel``,
Gaussian/Poisson noise in both host-numpy (per-sample CPU pipeline) and
batched-jnp (on-device RealESRGAN transform) flavors, JPEG via cv2.

Host functions take an explicit ``rng: np.random.Generator`` (the reference
uses global ``np.random`` — distribution parity, not bitwise; SURVEY.md §7
"RNG parity"). Device functions take a jax PRNG key and operate on NHWC
batches (the reference's ``*_pt`` torch variants are NCHW).

Also hosts :func:`codeformer_degrade`: the blur->downsample->noise->jpeg->
resize-back block that the reference clones into every Degraded* dataset
(``datasets/classification.py:116-142`` etc.) — centralized here.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# blur kernels (host numpy)
# ---------------------------------------------------------------------------

def mesh_grid(kernel_size: int):
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    grid = np.stack([xx, yy], axis=-1)  # (K, K, 2)
    return grid, xx, yy


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    return u @ d @ u.T


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    inv = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum((grid @ inv) * grid, axis=2))


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0, isotropic=True):
    grid, _, _ = mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
    else:
        sigma = sigma_matrix2(sig_x, sig_y, theta)
    k = pdf2(sigma, grid)
    return k / k.sum()


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y, theta, beta, isotropic=True):
    grid, _, _ = mesh_grid(kernel_size)
    sigma = (
        np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
        if isotropic
        else sigma_matrix2(sig_x, sig_y, theta)
    )
    inv = np.linalg.inv(sigma)
    k = np.exp(-0.5 * np.power(np.sum((grid @ inv) * grid, 2), beta))
    return k / k.sum()


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, isotropic=True):
    grid, _, _ = mesh_grid(kernel_size)
    sigma = (
        np.array([[sig_x ** 2, 0], [0, sig_x ** 2]])
        if isotropic
        else sigma_matrix2(sig_x, sig_y, theta)
    )
    inv = np.linalg.inv(sigma)
    k = np.reciprocal(np.power(np.sum((grid @ inv) * grid, 2), beta) + 1)
    return k / k.sum()


def _rand_ks_params(rng, kernel_size, sigma_x_range, sigma_y_range, rotation_range, isotropic):
    assert kernel_size % 2 == 1
    sigma_x = rng.uniform(*sigma_x_range)
    if isotropic:
        return sigma_x, sigma_x, 0.0
    sigma_y = rng.uniform(*sigma_y_range)
    rotation = rng.uniform(*rotation_range)
    return sigma_x, sigma_y, rotation


def _maybe_noise(rng, kernel, noise_range):
    if noise_range is not None:
        noise = rng.uniform(noise_range[0], noise_range[1], size=kernel.shape)
        kernel = kernel * noise
    return kernel / kernel.sum()


def random_bivariate_gaussian(
    kernel_size, sigma_x_range, sigma_y_range, rotation_range,
    noise_range=None, isotropic=True, rng: Optional[np.random.Generator] = None,
):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_ks_params(rng, kernel_size, sigma_x_range, sigma_y_range, rotation_range, isotropic)
    k = bivariate_gaussian(kernel_size, sx, sy, rot, isotropic)
    return _maybe_noise(rng, k, noise_range)


def random_bivariate_generalized_gaussian(
    kernel_size, sigma_x_range, sigma_y_range, rotation_range, beta_range,
    noise_range=None, isotropic=True, rng=None,
):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_ks_params(rng, kernel_size, sigma_x_range, sigma_y_range, rotation_range, isotropic)
    # reference samples beta <1 or >1 uniformly around 1
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    k = bivariate_generalized_gaussian(kernel_size, sx, sy, rot, beta, isotropic)
    return _maybe_noise(rng, k, noise_range)


def random_bivariate_plateau(
    kernel_size, sigma_x_range, sigma_y_range, rotation_range, beta_range,
    noise_range=None, isotropic=True, rng=None,
):
    rng = rng or np.random.default_rng()
    sx, sy, rot = _rand_ks_params(rng, kernel_size, sigma_x_range, sigma_y_range, rotation_range, isotropic)
    if rng.uniform() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    k = bivariate_plateau(kernel_size, sx, sy, rot, beta, isotropic)
    return _maybe_noise(rng, k, noise_range)


def random_mixed_kernels(
    kernel_list: Sequence[str],
    kernel_prob: Sequence[float],
    kernel_size: int = 21,
    sigma_x_range=(0.6, 5),
    sigma_y_range=(0.6, 5),
    rotation_range=(-math.pi, math.pi),
    betag_range=(0.5, 8),
    betap_range=(0.5, 8),
    noise_range=None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Parity: ``random_mixed_kernels`` (``datasets/degradation.py:325-384``)."""
    rng = rng or np.random.default_rng()
    kind = rng.choice(kernel_list, p=kernel_prob)
    common = dict(rng=rng, noise_range=noise_range)
    if kind == "iso":
        return random_bivariate_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            isotropic=True, **common)
    if kind == "aniso":
        return random_bivariate_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            isotropic=False, **common)
    if kind == "generalized_iso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=True, **common)
    if kind == "generalized_aniso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=False, **common)
    if kind == "plateau_iso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, isotropic=True, **common)
    if kind == "plateau_aniso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, isotropic=False, **common)
    raise ValueError(f"unknown kernel kind {kind}")


def circular_lowpass_kernel(cutoff: float, kernel_size: int, pad_to: int = 0) -> np.ndarray:
    """2-D sinc filter; parity ``datasets/degradation.py:390-410``."""
    from scipy.special import j1

    assert kernel_size % 2 == 1
    c = (kernel_size - 1) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        xs, ys = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size))
        r = np.sqrt((xs - c) ** 2 + (ys - c) ** 2)
        kernel = cutoff * j1(cutoff * r) / (2 * np.pi * r)
    kernel[int(c), int(c)] = cutoff ** 2 / (4 * np.pi)
    kernel = kernel / kernel.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel


# ---------------------------------------------------------------------------
# noise (host numpy)
# ---------------------------------------------------------------------------

def _apply_clip_round(out, clip, rounds, xp):
    if clip and rounds:
        return xp.clip((out * 255.0).round(), 0, 255) / 255.0
    if clip:
        return xp.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.0
    return out


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False, rng=None):
    rng = rng or np.random.default_rng()
    if gray_noise:
        noise = rng.standard_normal(img.shape[:2]).astype(np.float32) * sigma / 255.0
        noise = np.repeat(noise[:, :, None], 3, axis=2)
    else:
        noise = rng.standard_normal(img.shape).astype(np.float32) * sigma / 255.0
    return _apply_clip_round(img + noise, clip, rounds, np)


def random_add_gaussian_noise(img, sigma_range=(0, 1.0), gray_prob=0, clip=True, rounds=False, rng=None):
    rng = rng or np.random.default_rng()
    sigma = rng.uniform(*sigma_range)
    gray = rng.uniform() < gray_prob
    return add_gaussian_noise(img, sigma, clip, rounds, gray, rng)


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False, rng=None):
    """Poisson (shot) noise; parity ``generate_poisson_noise`` semantics."""
    rng = rng or np.random.default_rng()
    base = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_BGR2GRAY) / 255.0 if gray_noise else img
    base = np.clip(base, 0, 1)
    vals = 10 ** np.ceil(np.log10(len(np.unique((base * 255).astype(np.uint8)))))
    noisy = rng.poisson(base * vals) / float(vals)
    noise = noisy - base
    if gray_noise:
        noise = np.repeat(noise[:, :, None], 3, axis=2)
    return _apply_clip_round(img + noise * scale, clip, rounds, np)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True, rounds=False, rng=None):
    rng = rng or np.random.default_rng()
    scale = rng.uniform(*scale_range)
    gray = rng.uniform() < gray_prob
    return add_poisson_noise(img, scale, clip, rounds, gray, rng)


# ---------------------------------------------------------------------------
# JPEG (host cv2)
# ---------------------------------------------------------------------------

def add_jpg_compression(img, quality=90):
    img = np.clip(img, 0, 1)
    _, enc = cv2.imencode(".jpg", img * 255.0, [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    return np.float32(cv2.imdecode(enc, 1)) / 255.0


def random_add_jpg_compression(img, quality_range=(90, 100), rng=None):
    rng = rng or np.random.default_rng()
    quality = rng.uniform(*quality_range)
    return add_jpg_compression(img, int(quality))


# ---------------------------------------------------------------------------
# batched device variants (jnp, NHWC) — for the RealESRGAN on-device pipeline
# ---------------------------------------------------------------------------

def filter2d(img, kernel):
    """Batched depthwise filter; jnp NHWC equivalent of ``datasets/utils.py:71-96``.

    img (B, H, W, C); kernel (B, K, K) or (K, K). Reflect padding.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (b, *kernel.shape))
    k = kernel.shape[-1]
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def one(xi, ki):
        kern = jnp.tile(ki[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            xi[None], kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    return jax.vmap(one)(x, kernel)


def random_add_gaussian_noise_jax(key, img, sigma_range=(0, 1.0), gray_prob=0.0, clip=True, rounds=False):
    """Batched Gaussian noise; parity ``random_add_gaussian_noise_pt``
    (``datasets/degradation.py:545-554``), NHWC."""
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma = jax.random.uniform(k1, (b, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1])
    gray = (jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob).astype(img.dtype)
    noise = jax.random.normal(k3, img.shape, img.dtype) * sigma / 255.0
    noise_gray = jax.random.normal(k4, img.shape[:3] + (1,), img.dtype) * sigma / 255.0
    noise = noise * (1 - gray) + noise_gray * gray
    return _apply_clip_round(img + noise, clip, rounds, jnp)


def random_add_poisson_noise_jax(key, img, scale_range=(0, 1.0), gray_prob=0.0, clip=True, rounds=False):
    """Batched Poisson noise via the Gaussian approximation actually used in
    Real-ESRGAN's `_pt` variant (``datasets/degradation.py:715-724`` computes
    unique-level `vals` then Poisson-samples; we use the matched-variance
    normal approximation, standard for on-device pipelines)."""
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), minval=scale_range[0], maxval=scale_range[1])
    gray = (jax.random.uniform(k2, (b, 1, 1, 1)) < gray_prob).astype(img.dtype)
    base = jnp.clip(img, 0, 1)
    luma = base.mean(axis=-1, keepdims=True)
    vals = 2.0 ** 8  # 256 quantization levels (the common case of `vals`)
    std_color = jnp.sqrt(jnp.maximum(base, 1e-8) / vals)
    std_gray = jnp.sqrt(jnp.maximum(luma, 1e-8) / vals)
    n = jax.random.normal(k3, img.shape, img.dtype)
    noise = n * (std_color * (1 - gray) + std_gray * gray)
    return _apply_clip_round(img + noise * scale, clip, rounds, jnp)


# ---------------------------------------------------------------------------
# the shared CodeFormer-style per-sample block
# ---------------------------------------------------------------------------

def codeformer_degrade(
    img_gt_bgr: np.ndarray,
    blur_kernel_size: Optional[int] = 41,
    kernel_list: Sequence[str] = ("iso", "aniso"),
    kernel_prob: Sequence[float] = (0.5, 0.5),
    blur_sigma: Tuple[float, float] = (0.1, 8),
    downsample_range: Tuple[float, float] = (1, 16),
    noise_range: Optional[Tuple[float, float]] = (0, 10),
    jpeg_range: Optional[Tuple[float, float]] = (50, 100),
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """blur -> random downsample -> noise -> jpeg -> resize back.

    Parity: the degradation block cloned in each Degraded* dataset
    (``datasets/classification.py:116-142``, ``datasets/segmentation.py:135-161``,
    ``datasets/detection.py:155-181``). Input/output: BGR float32 [0,1] HWC.
    """
    rng = rng or np.random.default_rng()
    h, w, _ = img_gt_bgr.shape
    if blur_kernel_size is not None:
        kernel = random_mixed_kernels(
            kernel_list, kernel_prob, blur_kernel_size,
            blur_sigma, blur_sigma, (-math.pi, math.pi),
            noise_range=None, rng=rng,
        )
        img_lq = cv2.filter2D(img_gt_bgr, -1, kernel)
    else:
        img_lq = img_gt_bgr
    scale = rng.uniform(downsample_range[0], downsample_range[1])
    img_lq = cv2.resize(
        img_lq, (int(w // scale), int(h // scale)), interpolation=cv2.INTER_LINEAR
    )
    if noise_range is not None:
        img_lq = random_add_gaussian_noise(img_lq, noise_range, rng=rng)
    if jpeg_range is not None:
        img_lq = random_add_jpg_compression(img_lq, jpeg_range, rng=rng)
    img_lq = cv2.resize(img_lq, (w, h), interpolation=cv2.INTER_LINEAR)
    return img_lq.astype(np.float32)
