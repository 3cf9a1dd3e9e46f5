"""Real-ESRGAN two-stage on-device batch degradation (jnp, NHWC).

Parity: ``RealESRGANBatchTransform`` (``datasets/detection_cocov2.py:281-539``
in /root/reference):

  USM sharpen -> blur(kernel1) -> random resize -> Gauss|Poisson noise ->
  DiffJPEG -> [p] blur(kernel2) -> stage-2 scale/resize -> noise ->
  {JPEG + sinc} in random order -> resize back -> clamp+round,
  plus the ``_dequeue_and_enqueue`` shuffle pool for intra-batch diversity.

TPU-first notes: random resize *scales* would create unbounded dynamic
shapes under jit; intermediate sizes are quantized to multiples of
``SIZE_QUANT`` so the jit cache stays bounded while preserving the scale
distribution (the reference runs eagerly on GPU where any size is free).
Stage randomness draws from an explicit numpy Generator on host (branching)
and jax keys on device (noise), mirroring the reference's mixed RNG.
"""

from __future__ import annotations

import random as pyrandom
from typing import Any, Dict, Sequence, Union

import numpy as np

from edtr_tpu.data.degradation import (
    filter2d,
    random_add_gaussian_noise_jax,
    random_add_poisson_noise_jax,
)
from edtr_tpu.data.diffjpeg import diff_jpeg

SIZE_QUANT = 16


def _quantize_size(v: float) -> int:
    return max(SIZE_QUANT, int(round(v / SIZE_QUANT)) * SIZE_QUANT)


def _resize(img, h: int, w: int, mode: str):
    import jax

    method = {"area": "linear", "bilinear": "linear", "bicubic": "cubic"}[mode]
    if mode == "area":
        # area downsampling ~ linear antialiased resize
        return jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]), "linear")
    return jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]), method)


class USMSharp:
    """Unsharp masking; parity ``USMSharp`` (datasets/utils.py:99-119)."""

    def __init__(self, radius: int = 50, sigma: float = 0):
        import cv2

        if radius % 2 == 0:
            radius += 1
        self.kernel = cv2.getGaussianKernel(radius, sigma)
        self.kernel = (self.kernel @ self.kernel.T).astype(np.float32)

    def __call__(self, img, weight: float = 0.5, threshold: int = 10):
        import jax.numpy as jnp

        k = jnp.asarray(self.kernel)
        blur = filter2d(img, k)
        residual = img - blur
        mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
        soft_mask = filter2d(mask, k)
        sharp = jnp.clip(img + weight * residual, 0, 1)
        return soft_mask * sharp + (1 - soft_mask) * img


class RealESRGANBatchTransform:
    def __init__(
        self,
        hq_key: str = "hq",
        extra_keys: Sequence[str] = (),
        use_sharpener: bool = True,
        queue_size: int = 256,
        resize_prob: Sequence[float] = (0.2, 0.7, 0.1),
        resize_range: Sequence[float] = (0.15, 1.5),
        gray_noise_prob: float = 0.4,
        gaussian_noise_prob: float = 0.5,
        noise_range: Sequence[float] = (1, 30),
        poisson_scale_range: Sequence[float] = (0.05, 3),
        jpeg_range: Sequence[float] = (30, 95),
        second_blur_prob: float = 0.8,
        stage2_scale: Union[float, Sequence[float]] = 4,
        resize_prob2: Sequence[float] = (0.3, 0.4, 0.3),
        resize_range2: Sequence[float] = (0.3, 1.2),
        gray_noise_prob2: float = 0.4,
        gaussian_noise_prob2: float = 0.5,
        noise_range2: Sequence[float] = (1, 25),
        poisson_scale_range2: Sequence[float] = (0.05, 2.5),
        jpeg_range2: Sequence[float] = (30, 95),
        resize_back: bool = True,
        seed: int = 0,
    ):
        self.hq_key = hq_key
        self.extra_keys = list(extra_keys)
        self.resize_prob = list(resize_prob)
        self.resize_range = tuple(resize_range)
        self.gray_noise_prob = gray_noise_prob
        self.gaussian_noise_prob = gaussian_noise_prob
        self.noise_range = tuple(noise_range)
        self.poisson_scale_range = tuple(poisson_scale_range)
        self.jpeg_range = tuple(jpeg_range)
        self.second_blur_prob = second_blur_prob
        self.stage2_scale = stage2_scale
        self.resize_prob2 = list(resize_prob2)
        self.resize_range2 = tuple(resize_range2)
        self.gray_noise_prob2 = gray_noise_prob2
        self.gaussian_noise_prob2 = gaussian_noise_prob2
        self.noise_range2 = tuple(noise_range2)
        self.poisson_scale_range2 = tuple(poisson_scale_range2)
        self.jpeg_range2 = tuple(jpeg_range2)
        self.resize_back = resize_back
        self.use_sharpener = use_sharpener
        self.usm = USMSharp() if use_sharpener else None
        self.queue_size = queue_size
        self.queue: Dict[str, Any] = {}
        self.queue_ptr = 0
        self._np = np.random.default_rng(seed)
        self._py = pyrandom.Random(seed)
        import jax

        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def _rand_resize_params(self, probs, rng_range):
        updown = self._py.choices(["up", "down", "keep"], probs)[0]
        if updown == "up":
            scale = self._np.uniform(1, rng_range[1])
        elif updown == "down":
            scale = self._np.uniform(rng_range[0], 1)
        else:
            scale = 1.0
        mode = self._py.choice(["area", "bilinear", "bicubic"])
        return scale, mode

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        import jax.numpy as jnp

        hq = jnp.asarray(batch[self.hq_key])  # (B, H, W, 3) [0,1]
        if self.use_sharpener:
            hq = self.usm(hq)
        kernel1 = jnp.asarray(batch["kernel1"])
        kernel2 = jnp.asarray(batch["kernel2"])
        sinc_kernel = jnp.asarray(batch["sinc_kernel"])
        b, ori_h, ori_w, _ = hq.shape

        # ---- stage 1 ----------------------------------------------------------
        out = filter2d(hq, kernel1)
        scale, mode = self._rand_resize_params(self.resize_prob, self.resize_range)
        out = _resize(out, _quantize_size(ori_h * scale), _quantize_size(ori_w * scale), mode)
        if self._np.uniform() < self.gaussian_noise_prob:
            out = random_add_gaussian_noise_jax(
                self._next_key(), out, self.noise_range,
                gray_prob=self.gray_noise_prob,
            )
        else:
            out = random_add_poisson_noise_jax(
                self._next_key(), out, self.poisson_scale_range,
                gray_prob=self.gray_noise_prob,
            )
        q = self._np.uniform(*self.jpeg_range, size=(b,)).astype(np.float32)
        out = diff_jpeg(jnp.clip(out, 0, 1), jnp.asarray(q))

        # ---- stage 2 ----------------------------------------------------------
        if self._np.uniform() < self.second_blur_prob:
            out = filter2d(out, kernel2)
        if isinstance(self.stage2_scale, (list, tuple)):
            stage2_scale = self._np.uniform(*self.stage2_scale)
        else:
            stage2_scale = float(self.stage2_scale)
        stage2_h = _quantize_size(ori_h / stage2_scale)
        stage2_w = _quantize_size(ori_w / stage2_scale)

        scale, mode = self._rand_resize_params(self.resize_prob2, self.resize_range2)
        out = _resize(out, _quantize_size(stage2_h * scale), _quantize_size(stage2_w * scale), mode)
        if self._np.uniform() < self.gaussian_noise_prob2:
            out = random_add_gaussian_noise_jax(
                self._next_key(), out, self.noise_range2,
                gray_prob=self.gray_noise_prob2,
            )
        else:
            out = random_add_poisson_noise_jax(
                self._next_key(), out, self.poisson_scale_range2,
                gray_prob=self.gray_noise_prob2,
            )

        q2 = self._np.uniform(*self.jpeg_range2, size=(b,)).astype(np.float32)
        mode = self._py.choice(["area", "bilinear", "bicubic"])
        if self._np.uniform() < 0.5:
            out = _resize(out, stage2_h, stage2_w, mode)
            out = filter2d(out, sinc_kernel)
            out = diff_jpeg(jnp.clip(out, 0, 1), jnp.asarray(q2))
        else:
            out = diff_jpeg(jnp.clip(out, 0, 1), jnp.asarray(q2))
            out = _resize(out, stage2_h, stage2_w, mode)
            out = filter2d(out, sinc_kernel)

        if stage2_scale != 1 and self.resize_back:
            out = _resize(out, ori_h, ori_w, "bicubic")
        lq = jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0

        result = {"GT": hq, "LQ": lq}
        for k in self.extra_keys:
            result[k] = batch[k]
        if self.queue_size > 0:
            result = self._dequeue_and_enqueue(result)
        return result

    def _dequeue_and_enqueue(self, values: Dict[str, Any]) -> Dict[str, Any]:
        """Shuffle pool; parity ``datasets/detection_cocov2.py:347-410``."""
        import jax.numpy as jnp

        if not self.queue:
            for k, v in values.items():
                if hasattr(v, "shape"):
                    self.queue[k] = np.zeros((self.queue_size,) + tuple(v.shape[1:]), np.float32)
                else:
                    self.queue[k] = [None] * self.queue_size
            self.queue_ptr = 0

        b = len(values[self.hq_key]) if self.hq_key in values else len(values["GT"])
        if self.queue_size % b != 0:
            raise ValueError(f"queue size {self.queue_size} must divide by batch {b}")

        results: Dict[str, Any] = {}
        if self.queue_ptr == self.queue_size:
            idx = self._np.permutation(self.queue_size)
            for k, qv in self.queue.items():
                v = values[k]
                if isinstance(qv, np.ndarray):
                    q_shuf = qv[idx]
                    results[k] = jnp.asarray(q_shuf[:b].copy())
                    q_shuf[:b] = np.asarray(v)
                    self.queue[k] = q_shuf
                else:
                    q_shuf = [qv[i] for i in idx]
                    results[k] = q_shuf[:b]
                    for i in range(b):
                        q_shuf[i] = v[i]
                    self.queue[k] = q_shuf
        else:
            for k, qv in self.queue.items():
                v = values[k]
                if isinstance(qv, np.ndarray):
                    qv[self.queue_ptr : self.queue_ptr + b] = np.asarray(v)
                else:
                    for i in range(b):
                        qv[self.queue_ptr + i] = v[i]
            results = dict(values)
            self.queue_ptr += b
        return results
