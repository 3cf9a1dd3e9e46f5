"""edtr_tpu — a TPU-native (JAX/XLA/Pallas) framework for task-driven image
restoration with short-step diffusion priors.

Re-implements the full capability surface of JaehaKim97/EDTR (ICCV 2025,
"Exploiting Diffusion Prior for Task-driven Image Restoration") as an
idiomatic JAX framework:

  * functional model definitions (flax.linen) with NHWC layouts,
  * the K-step spaced-DDPM sampler compiled as one `lax.scan`,
  * bf16 compute with fp32 norms/softmax (TPU-native mixed precision),
  * SPMD data parallelism over a `jax.sharding.Mesh` (psum grads),
  * Pallas kernels for the hot attention / normalization paths,
  * a PyTorch->JAX checkpoint converter for lossless weight parity.

Reference layer map: see SURVEY.md; parity citations in module docstrings
point at the reference implementation (file:line) under /root/reference.
"""

__version__ = "0.1.0"

from edtr_tpu.config import Config, instantiate_from_config, load_config  # noqa: F401
