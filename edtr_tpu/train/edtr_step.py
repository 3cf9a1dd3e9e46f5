"""EDTR training step: the two-optimizer alternating update, fully compiled.

Parity: the hot loop of ``main/det/train_edtr.py:160-250`` (/root/reference):

* **EDTR half** (AdamW lr 1e-4 cosine->1e-7 over ControlNet [+ VAE decoder]):
  frozen SwinIR -> vae_encode(mode) -> random t in used_timesteps ->
  ``diffusion.reverse`` (ONE ControlNet+UNet forward) -> decode -> wavelet ->
  HLF loss = weight_hlf * 0.5 * sum of L1 between restored/GT features of the
  *student* AND *teacher* detnets on FPN keys [-3:-1] (== '0','1')
  (``main/det/train_edtr.py:186-197``).
* **task-net half** (SGD lr 5e-3 m=0.9 wd=1e-4 cosine): no-grad K-step short
  sampling on the first half of the batch -> detnet on [restored ; GT-half]
  with detection losses (weight_det) + feature-matching L1 vs the frozen
  teacher on keys '0','1' (weight_fm) (``main/det/train_edtr.py:203-241``).

TPU-first: both halves are ONE jitted step — shared activations (cond,
z_pre_res) are computed once (the reference reuses them too, :177-218);
data-parallel grads all-reduce automatically via jit + sharded batch.
When no detnet is provided (restoration-only recipes / dryrun) the HLF loss
falls back to pixel L1 with identical optimizer topology.
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


def split_trainable(params: Params, train_decoder: bool = True) -> Tuple[Params, Params]:
    """EDTR partition: ControlNet (+ VAE decoder); parity :84-92."""
    trainable = {"controlnet": params["controlnet"]}
    frozen = {
        "unet": params["unet"],
        "clip": params["clip"],
    }
    if train_decoder:
        trainable["vae_decoder"] = params["vae"]["decoder"]
        frozen["vae_rest"] = {k: v for k, v in params["vae"].items() if k != "decoder"}
    else:
        frozen["vae_rest"] = params["vae"]
    for k in ("swinir", "detnet", "teacher_detnet"):
        if k in params:
            frozen[k] = params[k]
    return trainable, frozen


def cast_frozen_bf16(params: Params, train_decoder: bool = True) -> Params:
    """bf16 storage for submodules that never receive updates.

    Frozen weights need no fp32 masters (the reference keeps fp32 because
    torch DDP autocast does; on TPU this halves the frozen side's HBM —
    UNet+CLIP+SwinIR+teacher ≈ 1.2B params). Modules already compute in
    their ``dtype`` regardless of storage dtype.
    """
    def bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree)

    out = dict(params)
    for k in ("unet", "clip", "swinir", "teacher_detnet", "teacher_tasknet"):
        if k in out:
            out[k] = bf16(out[k])
    if "vae" in out:
        if train_decoder:
            out["vae"] = {k: (v if k == "decoder" else bf16(v))
                          for k, v in out["vae"].items()}
        else:
            out["vae"] = bf16(out["vae"])
    return out


def merge_params(trainable: Params, frozen: Params) -> Params:
    if "vae_decoder" in trainable:
        vae = {**frozen["vae_rest"], "decoder": trainable["vae_decoder"]}
    else:
        vae = frozen["vae_rest"]
    params = {
        "controlnet": trainable["controlnet"],
        "unet": frozen["unet"],
        "clip": frozen["clip"],
        "vae": vae,
    }
    for k in ("swinir", "detnet", "teacher_detnet"):
        if k in frozen:
            params[k] = frozen[k]
    return params


@struct.dataclass
class EDTRTrainState:
    params: Params
    opt_edtr_state: Any
    opt_detnet_state: Any
    step: jnp.ndarray
    tx_edtr: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_detnet: optax.GradientTransformation = struct.field(pytree_node=False)
    train_decoder: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        pipe,
        params: Params,
        learning_rate_edtr: float = 1e-4,
        learning_rate_detnet: float = 5e-3,
        train_steps: int = 10000,
        train_decoder: Optional[bool] = None,
    ) -> "EDTRTrainState":
        if train_decoder is None:
            train_decoder = getattr(pipe.cldm.vae, "train_decoder", True)
        # cosine annealing to eta_min=1e-7; parity :89-101
        sched_e = optax.cosine_decay_schedule(
            learning_rate_edtr, train_steps, alpha=1e-7 / learning_rate_edtr
        )
        # torch AdamW default weight_decay=1e-2 (main/det/train_edtr.py:89-90
        # passes lr only)
        tx_edtr = optax.adamw(sched_e, weight_decay=1e-2)
        sched_d = optax.cosine_decay_schedule(
            learning_rate_detnet, train_steps, alpha=1e-7 / learning_rate_detnet
        )
        tx_detnet = optax.chain(
            optax.add_decayed_weights(1e-4),
            optax.sgd(sched_d, momentum=0.9),
        )
        trainable, _ = split_trainable(params, train_decoder)
        # detnet entries are FULL flax variables dicts ({"params", ...});
        # only the "params" collection is optimized
        det_vars = params.get("detnet", {})
        det_params = det_vars.get("params", det_vars) if det_vars else {}
        if det_params:
            # torchvision pretrained-backbone freezing (trainable_layers=3)
            from ..models.faster_rcnn import mask_detnet_tx

            tx_detnet = mask_detnet_tx(tx_detnet, det_params)
        return cls(
            params=params,
            opt_edtr_state=tx_edtr.init(trainable),
            opt_detnet_state=tx_detnet.init(det_params) if det_params else None,
            step=jnp.zeros((), jnp.int32),
            tx_edtr=tx_edtr,
            tx_detnet=tx_detnet,
            train_decoder=train_decoder,
        )


def _feat_l1(fa: Dict[str, jnp.ndarray], fb: Dict[str, jnp.ndarray], keys) -> jnp.ndarray:
    return sum(
        jnp.abs(fa[k].astype(jnp.float32) - fb[k].astype(jnp.float32)).mean() * 0.5
        for k in keys
    )


def make_edtr_train_step(
    pipe,
    detnet=None,
    mesh=None,
    weight_hlf: float = 0.5,
    weight_det: float = 1.0,
    weight_fm: float = 0.2,
    hlf_loss_fn: Optional[Callable] = None,
    jit: bool = True,
    accum_steps: int = 1,
):
    """Build the jitted two-half EDTR update.

    ``detnet``: the FasterRCNN module (shared by student/teacher — their
    params differ). ``batch`` must carry lq/gt (B,H,W,3), c_txt, and padded
    ``targets`` {boxes, labels, valid} when detnet is given.

    ``accum_steps=K`` runs the reference's GLOBAL batch semantics on fewer
    chips: the incoming batch (the full global batch, e.g. 16 for the VOC
    flagship ``configs/det/voc2012/train/007_edtr-s4.yaml:159-161``) is
    split into K microbatches; each half accumulates mean-of-means grads
    over a ``lax.scan`` and applies ONE optimizer update — numerically the
    reference's DDP all-reduced gradient at global bs (equal microbatches).
    Shared no-grad activations (pre_res/z_pre) are computed once per
    microbatch and reused by both halves, mirroring the reference's reuse
    across its two sub-updates (main/det/train_edtr.py:177-218; valid
    because SwinIR + VAE encoder are frozen). Detnet BatchNorm running
    stats update sequentially per microbatch (same K-updates-per-step
    semantics as torch's per-forward updates).
    """
    diffusion = pipe.diffusion
    used_ts = jnp.asarray(pipe.used_timesteps, jnp.int32)

    @jax.checkpoint
    def det_feats(det_vars, images):
        # rematerialized: the HLF half runs four 512² detnet feature passes
        # whose activations otherwise sit in HBM for the backward.
        # BN note: these FEATURE passes normalize with running stats
        # (eval-mode BN). The torch reference leaves the student detnet in
        # train() here, so for the v2 recipe its feature passes would use
        # batch stats and update the running buffers 4 extra times per step
        # — a documented minor deviation kept deliberately: an L1 feature-
        # matching loss through remat'd no-update batch-stat BN would
        # couple the loss to batch composition for no modeling benefit.
        # The detnet LOSS half (detnet_loss below) is exact train-mode BN.
        _, _, feats = detnet.apply(det_vars, images)
        return feats["features"]

    def edtr_loss(trainable, frozen, batch, shared, rng):
        params = merge_params(trainable, frozen)
        gt, pre_res, z_pre, cond = shared
        rng_t, rng_n = jax.random.split(rng)
        idx = jax.random.randint(rng_t, (gt.shape[0],), 0, len(pipe.used_timesteps))
        t = jnp.take(used_ts, idx)
        out = diffusion.reverse(pipe.cldm.model_fn(params), t, z_pre, cond, rng=rng_n)
        decoded = (pipe.cldm.vae_decode(params, out["x_pred"]) + 1) / 2
        res = wavelet_reconstruction(decoded, pre_res)
        if detnet is None:
            loss = weight_hlf * (
                hlf_loss_fn(res, gt) if hlf_loss_fn else jnp.abs(res - gt).mean()
            )
            return loss, dict(loss_hlf=loss)
        keys = ("0", "1")  # FPN keys [-3:-1] of ['0','1','pool'] (:193)
        f_res = det_feats(params["detnet"], res)
        f_gt = jax.lax.stop_gradient(det_feats(params["detnet"], gt))
        tf_res = det_feats(params["teacher_detnet"], res)
        tf_gt = jax.lax.stop_gradient(det_feats(params["teacher_detnet"], gt))
        loss = weight_hlf * (
            _feat_l1(f_res, f_gt, keys) + _feat_l1(tf_res, tf_gt, keys)
        )
        return loss, dict(loss_hlf=loss)

    def detnet_loss(det_params, params, batch, shared, rng):
        gt, pre_res, z_pre, cond = shared
        bs = gt.shape[0]
        bs2 = max(bs // 2, 1)
        rng_n, rng_s, rng_smp = jax.random.split(rng, 3)
        cond2 = dict(c_txt=cond["c_txt"][:bs2], c_img=cond["c_img"][:bs2])
        noise = jax.random.normal(rng_n, z_pre[:bs2].shape, z_pre.dtype)
        t = jnp.full((bs2,), pipe.start_timestep, jnp.int32)
        z_T = diffusion.q_sample(z_pre[:bs2], t, noise)
        z = sample_scan(pipe.cldm.model_fn(params), pipe.schedule, z_T, cond2, rng_s)
        decoded = (pipe.cldm.vae_decode(params, z) + 1) / 2
        res = jax.lax.stop_gradient(wavelet_reconstruction(decoded, pre_res[:bs2]))

        images = jnp.concatenate([res, gt[bs2:]], axis=0)
        targets = batch["targets"]
        det_extra = {k: v for k, v in params["detnet"].items() if k != "params"}
        if det_extra:
            # torch model.train() parity: BNs use batch stats and update the
            # running stats (reference v2 recipe trains with plain
            # nn.BatchNorm2d, model/faster_rcnn.py:987-992; the mobilenet
            # variant's norm_frozen keeps FrozenBN semantics regardless)
            (_, losses, feats), new_extra = detnet.apply(
                {"params": det_params, **det_extra}, images, targets=targets,
                train=True, mutable=list(det_extra.keys()),
                rngs={"sampler": rng_smp},
            )
            new_extra = dict(new_extra)
        else:
            _, losses, feats = detnet.apply(
                {"params": det_params}, images, targets=targets,
                rngs={"sampler": rng_smp},
            )
            new_extra = {}
        loss_det = weight_det * sum(losses.values())
        tf_gt = jax.lax.stop_gradient(det_feats(params["teacher_detnet"], gt))
        loss_fm = weight_fm * _feat_l1(feats["features"], tf_gt, ("0", "1"))
        metrics = dict(loss_det=loss_det, loss_fm=loss_fm, **losses)
        return loss_det + loss_fm, (metrics, new_extra)

    def _shared_for(params, mb):
        pre_res = jax.lax.stop_gradient(pipe.pre_restore(params, mb["lq"]))
        z_pre = jax.lax.stop_gradient(
            pipe.cldm.vae_encode(params, pre_res * 2 - 1, sample=False)
        )
        cond = dict(c_txt=mb["c_txt"], c_img=z_pre)
        return (mb["gt"], pre_res, z_pre, cond)

    def step_fn(state: EDTRTrainState, batch, rng):
        r_shared, r_edtr, r_det = jax.random.split(rng, 3)
        params = state.params

        if accum_steps == 1:
            shared = _shared_for(params, batch)

            trainable, frozen = split_trainable(params, state.train_decoder)
            (loss_e, m_e), grads = jax.value_and_grad(edtr_loss, has_aux=True)(
                trainable, frozen, batch, shared, r_edtr
            )
            updates, new_opt_e = state.tx_edtr.update(
                grads, state.opt_edtr_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            params = merge_params(new_trainable, frozen)
            metrics = dict(m_e)

            new_opt_d = state.opt_detnet_state
            if detnet is not None:
                det_params = params["detnet"]["params"]
                (loss_d, (m_d, new_extra)), dgrads = jax.value_and_grad(
                    detnet_loss, has_aux=True
                )(det_params, params, batch, shared, r_det)
                dupdates, new_opt_d = state.tx_detnet.update(
                    dgrads, state.opt_detnet_state, det_params
                )
                params = dict(params)
                params["detnet"] = {
                    **params["detnet"],
                    "params": optax.apply_updates(det_params, dupdates),
                    **new_extra,  # updated BatchNorm running stats
                }
                metrics.update(m_d)

            return (
                state.replace(
                    params=params,
                    opt_edtr_state=new_opt_e,
                    opt_detnet_state=new_opt_d,
                    step=state.step + 1,
                ),
                metrics,
            )

        # ----- gradient accumulation: global-batch semantics on one chip ----
        def to_micro(x):
            return x.reshape((accum_steps, x.shape[0] // accum_steps)
                             + x.shape[1:])

        micro = jax.tree.map(to_micro, batch)
        trainable, frozen = split_trainable(params, state.train_decoder)

        # precompute the shared no-grad activations once per microbatch;
        # both halves reuse them (SwinIR/encoder are frozen, so the EDTR
        # update between the halves cannot invalidate them)
        def shared_scan(_, mb):
            return None, _shared_for(params, mb)

        _, shared_stack = jax.lax.scan(shared_scan, None, micro)

        def edtr_acc(carry, inp):
            g_acc, key = carry
            mb, sh = inp
            key, sub = jax.random.split(key)
            (_, m), g = jax.value_and_grad(edtr_loss, has_aux=True)(
                trainable, frozen, mb, sh, sub
            )
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, key), m

        zeros = jax.tree.map(jnp.zeros_like, trainable)
        (g_sum, _), m_e = jax.lax.scan(
            edtr_acc, (zeros, r_edtr), (micro, shared_stack))
        grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
        updates, new_opt_e = state.tx_edtr.update(
            grads, state.opt_edtr_state, trainable)
        params = merge_params(optax.apply_updates(trainable, updates), frozen)
        metrics = {k: v.mean() for k, v in m_e.items()}

        new_opt_d = state.opt_detnet_state
        if detnet is not None:
            det_params = params["detnet"]["params"]

            def det_acc(carry, inp):
                g_acc, extra, key = carry
                mb, sh = inp
                key, sub = jax.random.split(key)
                p = dict(params)
                p["detnet"] = {**params["detnet"], **extra}
                (_, (m, new_extra)), g = jax.value_and_grad(
                    detnet_loss, has_aux=True
                )(det_params, p, mb, sh, sub)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, new_extra or extra, key), m

            extra0 = {k: v for k, v in params["detnet"].items()
                      if k != "params"}
            dzeros = jax.tree.map(jnp.zeros_like, det_params)
            (dg_sum, new_extra, _), m_d = jax.lax.scan(
                det_acc, (dzeros, extra0, r_det), (micro, shared_stack))
            dgrads = jax.tree.map(lambda g: g / accum_steps, dg_sum)
            dupdates, new_opt_d = state.tx_detnet.update(
                dgrads, state.opt_detnet_state, det_params)
            params = dict(params)
            params["detnet"] = {
                **params["detnet"],
                "params": optax.apply_updates(det_params, dupdates),
                **new_extra,
            }
            metrics.update({k: v.mean() for k, v in m_d.items()})

        return (
            state.replace(
                params=params,
                opt_edtr_state=new_opt_e,
                opt_detnet_state=new_opt_d,
                step=state.step + 1,
            ),
            metrics,
        )

    if not jit:
        return step_fn
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_shard = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(None, batch_shard, None), donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def make_edtr_generic_train_step(
    pipe,
    task_feats_fn: Callable,
    task_loss_fn: Callable,
    weight_hlf: float = 0.5,
    weight_task: float = 1.0,
    weight_fm: float = 0.2,
    jit: bool = True,
    accum_steps: int = 1,
):
    """EDTR two-half step for cls/seg task nets.

    Parity: ``main/cls/train_edtr.py:160-218`` (seg is identical modulo the
    task loss): HLF = weight_hlf * [L1(student feats res/gt) + L1(teacher
    feats res/gt)]; task half = task loss on [restored ; GT-half] + teacher
    feature matching.

    ``task_feats_fn(params, extra_vars, images) -> feature`` and
    ``task_loss_fn(params, extra_vars, images, target, rng) ->
    (loss, (metrics, new_extra))`` come from ``runner._task_apply_for``.
    The param bundle carries ``tasknet`` / ``teacher_tasknet`` as full
    variables dicts.

    ``accum_steps=K``: same microbatch accumulation as
    :func:`make_edtr_train_step` — the reference cls recipe trains at
    global bs 32 and seg at 16 (configs/{cls,seg}/*/train/007_edtr-s4.yaml),
    reproducible on one chip with K microbatches per optimizer update.
    """
    diffusion = pipe.diffusion
    used_ts = jnp.asarray(pipe.used_timesteps, jnp.int32)

    def _vars(entry):
        p = entry.get("params", entry)
        extra = {k: v for k, v in entry.items() if k != "params"} or None
        return p, extra

    def edtr_loss(trainable, frozen, shared, rng):
        params = merge_params(trainable, frozen)
        gt, pre_res, z_pre, cond = shared
        rng_t, rng_n = jax.random.split(rng)
        idx = jax.random.randint(rng_t, (gt.shape[0],), 0, len(pipe.used_timesteps))
        t = jnp.take(used_ts, idx)
        out = diffusion.reverse(pipe.cldm.model_fn(params), t, z_pre, cond, rng=rng_n)
        decoded = (pipe.cldm.vae_decode(params, out["x_pred"]) + 1) / 2
        res = wavelet_reconstruction(decoded, pre_res)
        sp, se = _vars(params["tasknet"])
        tp, te = _vars(params["teacher_tasknet"])
        f_res = task_feats_fn(sp, se, res)
        f_gt = jax.lax.stop_gradient(task_feats_fn(sp, se, gt))
        tf_res = task_feats_fn(tp, te, res)
        tf_gt = jax.lax.stop_gradient(task_feats_fn(tp, te, gt))
        loss = weight_hlf * (
            jnp.abs(f_res - f_gt).mean() + jnp.abs(tf_res - tf_gt).mean()
        )
        return loss, dict(loss_hlf=loss)

    def task_loss(task_params, params, batch, shared, rng):
        gt, pre_res, z_pre, cond = shared
        bs2 = max(gt.shape[0] // 2, 1)
        r_n, r_s, r_t = jax.random.split(rng, 3)
        cond2 = dict(c_txt=cond["c_txt"][:bs2], c_img=cond["c_img"][:bs2])
        noise = jax.random.normal(r_n, z_pre[:bs2].shape, z_pre.dtype)
        t = jnp.full((bs2,), pipe.start_timestep, jnp.int32)
        z_T = diffusion.q_sample(z_pre[:bs2], t, noise)
        z = sample_scan(pipe.cldm.model_fn(params), pipe.schedule, z_T, cond2, r_s)
        decoded = (pipe.cldm.vae_decode(params, z) + 1) / 2
        res = jax.lax.stop_gradient(wavelet_reconstruction(decoded, pre_res[:bs2]))
        images = jnp.concatenate([res, gt[bs2:]], axis=0)
        _, s_extra = _vars(params["tasknet"])
        loss_task, (metrics, new_extra) = task_loss_fn(
            task_params, s_extra, images, batch["target"], r_t
        )
        tp, te = _vars(params["teacher_tasknet"])
        f_s = task_feats_fn(task_params, new_extra or s_extra, images)
        f_t = jax.lax.stop_gradient(task_feats_fn(tp, te, gt))
        loss_fm = weight_fm * jnp.abs(f_s - f_t).mean()
        total = weight_task * loss_task + loss_fm
        return total, (dict(metrics, loss_task=loss_task, loss_fm=loss_fm), new_extra)

    def _shared_for(params, mb):
        pre_res = jax.lax.stop_gradient(pipe.pre_restore(params, mb["lq"]))
        z_pre = jax.lax.stop_gradient(
            pipe.cldm.vae_encode(params, pre_res * 2 - 1, sample=False)
        )
        cond = dict(c_txt=mb["c_txt"], c_img=z_pre)
        return (mb["gt"], pre_res, z_pre, cond)

    def step_fn(state: EDTRTrainState, batch, rng):
        r_edtr, r_task = jax.random.split(rng)
        params = state.params

        if accum_steps == 1:
            shared = _shared_for(params, batch)

            trainable, frozen = split_trainable(params, state.train_decoder)
            (loss_e, m_e), grads = jax.value_and_grad(edtr_loss, has_aux=True)(
                trainable, frozen, shared, r_edtr
            )
            updates, new_opt_e = state.tx_edtr.update(
                grads, state.opt_edtr_state, trainable)
            params = merge_params(optax.apply_updates(trainable, updates), frozen)
            metrics = dict(m_e)

            task_params = params["tasknet"]["params"]
            (loss_t, (m_t, new_extra)), tgrads = jax.value_and_grad(
                task_loss, has_aux=True
            )(task_params, params, batch, shared, r_task)
            tupdates, new_opt_d = state.tx_detnet.update(
                tgrads, state.opt_detnet_state, task_params
            )
            params = dict(params)
            params["tasknet"] = {
                **params["tasknet"],
                "params": optax.apply_updates(task_params, tupdates),
                **(new_extra or {}),
            }
            metrics.update(m_t)
            return (
                state.replace(
                    params=params, opt_edtr_state=new_opt_e,
                    opt_detnet_state=new_opt_d, step=state.step + 1,
                ),
                metrics,
            )

        # ----- gradient accumulation (see make_edtr_train_step) ------------
        def to_micro(x):
            return x.reshape((accum_steps, x.shape[0] // accum_steps)
                             + x.shape[1:])

        micro = jax.tree.map(to_micro, batch)
        trainable, frozen = split_trainable(params, state.train_decoder)

        def shared_scan(_, mb):
            return None, _shared_for(params, mb)

        _, shared_stack = jax.lax.scan(shared_scan, None, micro)

        def edtr_acc(carry, inp):
            g_acc, key = carry
            mb, sh = inp
            key, sub = jax.random.split(key)
            (_, m), g = jax.value_and_grad(edtr_loss, has_aux=True)(
                trainable, frozen, sh, sub
            )
            return (jax.tree.map(jnp.add, g_acc, g), key), m

        zeros = jax.tree.map(jnp.zeros_like, trainable)
        (g_sum, _), m_e = jax.lax.scan(
            edtr_acc, (zeros, r_edtr), (micro, shared_stack))
        grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
        updates, new_opt_e = state.tx_edtr.update(
            grads, state.opt_edtr_state, trainable)
        params = merge_params(optax.apply_updates(trainable, updates), frozen)
        metrics = {k: v.mean() for k, v in m_e.items()}

        task_params = params["tasknet"]["params"]

        def task_acc(carry, inp):
            g_acc, extra, key = carry
            mb, sh = inp
            key, sub = jax.random.split(key)
            p = dict(params)
            p["tasknet"] = {**params["tasknet"], **extra}
            (_, (m, new_extra)), g = jax.value_and_grad(
                task_loss, has_aux=True
            )(task_params, p, mb, sh, sub)
            return (jax.tree.map(jnp.add, g_acc, g), new_extra or extra, key), m

        extra0 = {k: v for k, v in params["tasknet"].items() if k != "params"}
        tzeros = jax.tree.map(jnp.zeros_like, task_params)
        (tg_sum, new_extra, _), m_t = jax.lax.scan(
            task_acc, (tzeros, extra0, r_task), (micro, shared_stack))
        tgrads = jax.tree.map(lambda g: g / accum_steps, tg_sum)
        tupdates, new_opt_d = state.tx_detnet.update(
            tgrads, state.opt_detnet_state, task_params)
        params = dict(params)
        params["tasknet"] = {
            **params["tasknet"],
            "params": optax.apply_updates(task_params, tupdates),
            **new_extra,
        }
        metrics.update({k: v.mean() for k, v in m_t.items()})
        return (
            state.replace(
                params=params, opt_edtr_state=new_opt_e,
                opt_detnet_state=new_opt_d, step=state.step + 1,
            ),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn


def make_edtr_sample_fn(pipe, jit: bool = True, staged: bool = True):
    """No-grad K-step restore used for eval; parity ``test_edtr`` flow.

    ``staged=True`` (default) dispatches four per-stage executables
    (swinir | vae_encode | q_sample+scan | decode+wavelet) instead of one
    monolith: dispatch RTT is ~0.01 ms while the monolithic executable
    measured ~10 ms/img slower than its stage sum at 512² bs8 (XLA
    buffer-pressure; same effect that made fused restore+detect slower in
    r2). Results are numerically identical.
    """

    def stage_pre(params, lq):
        return pipe.pre_restore(params, lq)

    def stage_enc(params, pre_res):
        return pipe.cldm.vae_encode(params, pre_res * 2 - 1, sample=False)

    def stage_denoise(params, z_pre, c_txt, rng):
        cond = dict(c_txt=c_txt, c_img=z_pre)
        r1, r2 = jax.random.split(rng)
        noise = jax.random.normal(r1, z_pre.shape, z_pre.dtype)
        t = jnp.full((z_pre.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(z_pre, t, noise)
        return sample_scan(pipe.cldm.model_fn(params), pipe.schedule, z_T, cond, r2)

    def stage_dec(params, z, pre_res):
        decoded = (pipe.cldm.vae_decode(params, z) + 1) / 2
        return wavelet_reconstruction(decoded, pre_res)

    if staged and jit:
        f_pre = jax.jit(stage_pre)
        f_enc = jax.jit(stage_enc)
        f_den = jax.jit(stage_denoise)
        f_dec = jax.jit(stage_dec)

        def sample(params, lq, c_txt, rng):
            pre_res = f_pre(params, lq)
            z = f_den(params, f_enc(params, pre_res), c_txt, rng)
            return f_dec(params, z, pre_res)

        return sample

    def sample(params, lq, c_txt, rng):
        pre_res = stage_pre(params, lq)
        z = stage_denoise(params, stage_enc(params, pre_res), c_txt, rng)
        return stage_dec(params, z, pre_res)

    return jax.jit(sample) if jit else sample
