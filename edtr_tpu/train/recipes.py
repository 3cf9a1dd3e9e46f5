"""Training recipes beyond EDTR: oracle/LQ task training, SwinIR variants,
SR4IR, DiffBIR — as pure jitted step builders shared across cls/seg/det.

Parity map (/root/reference, cls variants cited; seg/det differ only in the
task loss):
  train_{cls,seg,det}    -> main/cls/train_cls.py:85-96   (CE on gt|lq input)
  train_swinir           -> main/cls/train_swinir.py:92-100 (task net on
                            FROZEN swinir(lq))
  train_swinir-pre       -> main/cls/train_swinir-pre.py:88-89 (L1*255)
  train_swinir-sr4ir     -> main/cls/train_swinir-sr4ir.py:110-140
                            (swinir: pix L1*w + TDP feature L1;
                             task: CE over [res, gt, CutMix-quality mix])
  train_diffbir          -> main/cls/train_diffbir.py:140-178
                            (eps p_losses; task half uses 50-step sampling)

Task losses:
  cls: cross-entropy (label smoothing 0)        main/cls/train_cls.py:93
  seg: cross-entropy ignore_index=255 on 'out'  main/seg/train_seg.py:100
  det: detector loss dict                       (FasterRCNN training mode)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

Params = Dict[str, Any]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def seg_cross_entropy(
    logits: jnp.ndarray, mask: jnp.ndarray, ignore_index: int = 255
) -> jnp.ndarray:
    """CE over NHWC logits with ignore pixels; parity main/seg/train_seg.py:100."""
    valid = mask != ignore_index
    safe = jnp.where(valid, mask, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


@struct.dataclass
class SimpleTrainState:
    """Params + optimizer + non-trainable collections (e.g. batch_stats)."""

    params: Params
    opt_state: Any
    step: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    extra_vars: Optional[Dict[str, Any]] = None

    @classmethod
    def create(cls, variables, tx):
        if "params" in variables:
            params = variables["params"]
            extra = {k: v for k, v in variables.items() if k != "params"} or None
        else:
            params, extra = variables, None
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32), tx=tx, extra_vars=extra)

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, **(self.extra_vars or {})}

    def apply_gradients(self, grads, new_extra: Optional[Dict] = None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
            extra_vars=new_extra if new_extra is not None else self.extra_vars,
        )


def cosine_tx(kind: str, lr: float, steps: int, eta_min: float = 1e-7,
              weight_decay: Optional[float] = None):
    """Cosine-annealed optimizer matching the reference's torch defaults.

    Reference weight decays: AdamW torch default 1e-2 (train_edtr/diffbir),
    explicit 0 for swinir-pre & the sr4ir swinir half
    (main/det/train_swinir-pre.py:47-49, train_swinir-sr4ir.py:56-58);
    SGD coupled wd 1e-4 for cls/det, 1e-6 for seg
    (main/det/train_det.py:45-47, main/seg/train_seg.py:44-46).
    """
    sched = optax.cosine_decay_schedule(lr, steps, alpha=eta_min / lr)
    if kind == "adamw":
        wd = 1e-2 if weight_decay is None else weight_decay
        return optax.adamw(sched, weight_decay=wd)
    if kind == "sgd":
        wd = 1e-4 if weight_decay is None else weight_decay
        # add_decayed_weights BEFORE sgd == torch's coupled decay (wd folded
        # into the grad ahead of the momentum buffer)
        return optax.chain(optax.add_decayed_weights(wd), optax.sgd(sched, momentum=0.9))
    raise ValueError(kind)


# -- task-net training (oracle / LQ / frozen-swinir input) -----------------------

def make_task_train_step(
    task_apply: Callable,
    pre_restore: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    use_gt: bool = False,
    jit: bool = True,
):
    """Generic task-net update.

    ``task_apply(params, extra_vars, images, target, rng) ->
    (loss, (metrics, new_extra_vars))`` encapsulates the per-task loss and
    BatchNorm-stat updates; ``pre_restore`` (frozen) implements the
    train_swinir recipe; ``use_gt`` the oracle recipe.
    """

    def step_fn(state: SimpleTrainState, batch, rng):
        inp = batch["gt"] if use_gt else batch["lq"]
        if pre_restore is not None:
            inp = jax.lax.stop_gradient(pre_restore(inp))

        def loss_fn(p):
            return task_apply(p, state.extra_vars, inp, batch["target"], rng)

        (loss, (metrics, new_extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return state.apply_gradients(grads, new_extra), metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


# -- SwinIR pre-restoration training ---------------------------------------------

def make_swinir_pre_train_step(swinir, jit: bool = True):
    """L1(res, gt) * 255; parity main/*/train_swinir-pre.py:88-89."""

    def step_fn(state: SimpleTrainState, batch, rng):
        def loss_fn(p):
            res = swinir.apply({"params": p}, batch["lq"])
            return jnp.abs(res - batch["gt"]).mean() * 255.0

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), dict(loss=loss)

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


# -- SR4IR -------------------------------------------------------------------------

def make_sr4ir_train_step(
    swinir,
    task_apply_feats: Callable,
    task_apply_loss: Callable,
    pix_weight: float = 255.0,
    cutmix_cells: int = 8,
    jit: bool = True,
):
    """SR4IR joint update; parity main/cls/train_swinir-sr4ir.py:110-140.

    ``task_apply_feats(params, images) -> feat`` (deepest task feature);
    ``task_apply_loss(params, images, targets, rng) -> (loss, metrics)``.
    Returns step over a state dict {swinir: SimpleTrainState, task: ...}.
    """

    def step_fn(states, batch, rng):
        sw_state, task_state = states
        gt, lq = batch["gt"], batch["lq"]
        r_mask, r_task = jax.random.split(rng)

        # swinir half: pixel + task-driven-perceptual losses
        def sw_loss(p):
            res = swinir.apply({"params": p}, lq)
            pix = jnp.abs(res - gt).mean() * pix_weight
            f_gt = jax.lax.stop_gradient(
                task_apply_feats(task_state.params, task_state.extra_vars, gt)
            )
            f_res = task_apply_feats(task_state.params, task_state.extra_vars, res)
            tdp = jnp.abs(f_res - f_gt).mean()
            return pix + tdp, dict(swinir_pix=pix, swinir_tdp=tdp)

        (sw_l, sw_m), sw_g = jax.value_and_grad(sw_loss, has_aux=True)(sw_state.params)
        sw_state = sw_state.apply_gradients(sw_g)

        # task half: CE over [res, gt, CutMix-quality mix]
        res = jax.lax.stop_gradient(swinir.apply({"params": sw_state.params}, lq))
        b, h, w, _ = gt.shape
        cells = jax.random.bernoulli(
            r_mask, 0.5, (b, cutmix_cells, cutmix_cells, 1)
        ).astype(gt.dtype)
        mask = jax.image.resize(cells, (b, h, w, 1), "nearest")
        cqmix = res * mask + gt * (1 - mask)
        img_cat = jnp.concatenate([res, gt, cqmix], axis=0)
        tgt = batch["target"]
        tgt_cat = jax.tree.map(lambda t: jnp.concatenate([t] * 3, axis=0), tgt)

        def task_loss(p):
            return task_apply_loss(p, task_state.extra_vars, img_cat, tgt_cat, r_task)

        (t_l, (t_m, new_extra)), t_g = jax.value_and_grad(task_loss, has_aux=True)(
            task_state.params
        )
        task_state = task_state.apply_gradients(t_g, new_extra)
        metrics = {**sw_m, **t_m, "task_loss": t_l}
        return (sw_state, task_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


# -- DiffBIR -----------------------------------------------------------------------

def make_diffbir_train_step(
    pipe,
    task_apply_loss: Callable,
    task_apply_feats: Callable,
    steps: int = 50,
    weight_ce: float = 1.0,
    weight_fm: float = 0.2,
    jit: bool = True,
):
    """DiffBIR two-half update; parity main/cls/train_diffbir.py:130-178.

    Stage 1: standard eps-prediction ``p_losses`` at t ~ U[0, 1000) with
    ControlNet trainable. Stage 2: task net on 50-step from-noise samples
    (half batch) + GT half, CE + teacher feature-matching.
    """
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.train.edtr_step import merge_params, split_trainable
    from edtr_tpu.utils.image import wavelet_reconstruction

    schedule = pipe.sampler.make_schedule(steps)

    def step_fn(states, batch, rng):
        cldm_state, task_state, teacher_params = states
        gt, lq, c_txt = batch["gt"], batch["lq"], batch["c_txt"]
        r_t, r_eps, r_x0, r_s, r_task = jax.random.split(rng, 5)

        params_all = cldm_state.params
        pre_res = jax.lax.stop_gradient(pipe.pre_restore(params_all, lq))
        z_pre = jax.lax.stop_gradient(
            pipe.cldm.vae_encode(params_all, pre_res * 2 - 1, sample=False)
        )
        cond = dict(c_txt=c_txt, c_img=z_pre)

        trainable, frozen = split_trainable(params_all, train_decoder=False)

        def eps_loss(tr):
            params = merge_params(tr, frozen)
            z_0 = pipe.cldm.vae_encode(params, gt * 2 - 1, sample=True, rng=r_x0)
            t = jax.random.randint(r_t, (gt.shape[0],), 0, pipe.diffusion.num_timesteps)
            return pipe.diffusion.p_losses(pipe.cldm.model_fn(params), z_0, t, cond, r_eps)

        loss_eps, grads = jax.value_and_grad(eps_loss)(trainable)
        updates, new_opt = cldm_state.tx.update(grads, cldm_state.opt_state, trainable)
        cldm_state = cldm_state.replace(
            params=merge_params(optax.apply_updates(trainable, updates), frozen),
            opt_state=new_opt,
            step=cldm_state.step + 1,
        )

        # stage 2: 50-step from pure noise on half batch
        params = cldm_state.params
        bs2 = max(gt.shape[0] // 2, 1)
        cond2 = dict(c_txt=c_txt[:bs2], c_img=z_pre[:bs2])
        x_T = jax.random.normal(r_s, z_pre[:bs2].shape, z_pre.dtype)
        z = sample_scan(pipe.cldm.model_fn(params), schedule, x_T, cond2, r_s)
        res = jax.lax.stop_gradient(
            wavelet_reconstruction((pipe.cldm.vae_decode(params, z) + 1) / 2, pre_res[:bs2])
        )
        images = jnp.concatenate([res, gt[bs2:]], axis=0)

        # teacher_params: full variables dict {"params": ..., [collections]}
        t_p = teacher_params.get("params", teacher_params)
        t_extra = {k: v for k, v in teacher_params.items() if k != "params"} or None

        def t_loss(p):
            loss_ce, (metrics, new_extra) = task_apply_loss(
                p, task_state.extra_vars, images, batch["target"], r_task
            )
            f_s = task_apply_feats(p, task_state.extra_vars, images)
            f_t = jax.lax.stop_gradient(task_apply_feats(t_p, t_extra, gt))
            loss_fm = weight_fm * jnp.abs(f_s - f_t).mean()
            return weight_ce * loss_ce + loss_fm, (
                dict(metrics, loss_ce=loss_ce, loss_fm=loss_fm), new_extra
            )

        (tl, (tm, new_extra)), tg = jax.value_and_grad(t_loss, has_aux=True)(
            task_state.params
        )
        task_state = task_state.apply_gradients(tg, new_extra)
        return (cldm_state, task_state, teacher_params), dict(loss_eps=loss_eps, **tm)

    return jax.jit(step_fn) if jit else step_fn
