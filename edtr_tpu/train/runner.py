"""Recipe runner: builds models/data from a reference-style YAML config and
drives training/eval loops.

This is the TPU-native counterpart of the reference's 24 ``main/{task}/*.py``
entry scripts, whose bodies are identical boilerplate (SURVEY.md §2.6):
config -> environment -> models -> optimizers -> loaders -> step loop with
log/ckpt/image/val blocks. Here the boilerplate lives once; thin CLI scripts
under ``main/`` call these functions.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from edtr_tpu.config import Config, instantiate_from_config, load_config
from edtr_tpu.pipeline import build_pipeline_from_config
from edtr_tpu.train.harness import make_dataloader, pad_annots, prepare_batch
from edtr_tpu.utils.logging_utils import prepare_environment
from edtr_tpu.utils import checkpoint as ckpt
from edtr_tpu.utils import convert as C
from edtr_tpu.utils.image import calculate_psnr


def build_edtr_models(cfg: Config, dtype=jnp.bfloat16):
    """Pipeline + detnets built/loaded per the config's resume_* fields.

    Parity: the model-build + weight-surgery block of
    ``main/det/train_edtr.py:43-78``.
    """
    pipe = build_pipeline_from_config(cfg, dtype=dtype)
    train_cfg = cfg.get("train", None) or cfg.get("test", Config())

    params: Dict[str, Any] = {}
    sd_path = train_cfg.get("sd_path", None)
    if sd_path and os.path.exists(sd_path):
        sd = ckpt.load_torch_state_dict(sd_path)
        params.update(pipe.cldm.load_pretrained_sd(sd))
    else:
        rng = jax.random.PRNGKey(train_cfg.get("seed", 231))
        params.update(pipe.cldm.init_params(rng, latent_hw=64))

    resume_cldm = train_cfg.get("resume_cldm", None)
    if resume_cldm and os.path.exists(str(resume_cldm)):
        cn = ckpt.load_network(str(resume_cldm), converter=pipe.cldm.load_controlnet_from_ckpt)
        params["controlnet"] = cn
    else:
        params["controlnet"] = pipe.cldm.load_controlnet_from_unet(params["unet"])

    if pipe.swinir is not None:
        resume_swinir = train_cfg.get("resume_swinir", None)
        conv_sw = lambda sd: C.convert_swinir(
            sd, depths=tuple(pipe.swinir.depths), unshuffle=pipe.swinir.unshuffle,
            upsampler=pipe.swinir.upsampler, sf=pipe.swinir.sf,
        )
        if resume_swinir and os.path.exists(str(resume_swinir)):
            params["swinir"] = ckpt.load_network(str(resume_swinir), converter=conv_sw)
        else:
            # init through an UNPADDED twin: the lane_pad exactness
            # contract (models/swinir.py) requires zero pad channels, which
            # random init of the padded module would violate.
            import dataclasses

            unpadded = (dataclasses.replace(pipe.swinir, lane_pad=0)
                        if pipe.swinir.lane_pad else pipe.swinir)
            params["swinir"] = jax.jit(unpadded.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )["params"]
        if pipe.swinir.lane_pad:
            params["swinir"] = C.pad_swinir_lanes(
                params["swinir"], lane_pad=pipe.swinir.lane_pad,
                heads=pipe.swinir.num_heads[0])
    return pipe, params


def build_detnet(cfg: Config, key: str, dtype=None):
    """Detection net + params from config node ``model.{key}``."""
    det = instantiate_from_config(cfg["model"][key], dtype=dtype)
    return det


def init_detnet_params(det, rng, image_size=512):
    """Full flax variables dict ({"params", "batch_stats", ...})."""
    return jax.jit(det.init)(
        {"params": rng}, jnp.zeros((1, image_size, image_size, 3))
    )



def _build_batch_transform(cfg, logger=None):
    """On-device RealESRGAN degradation from cfg.dataset.batch_transform.

    Parity: ``main/det/train_edtr.py:115-117`` — present only in the COCO v2
    (real-world) recipes; None elsewhere.
    """
    node = cfg["dataset"].get("batch_transform", None)
    if not node:
        return None
    if logger:
        logger("building RealESRGAN batch transform (on-device degradation)")
    return instantiate_from_config(node)


def edtr_train(cfg_path: str, debug: bool = False, seed: Optional[int] = None):
    """The flagship EDTR detection training loop.

    Parity: ``main/det/train_edtr.py`` — two-optimizer alternating updates,
    log/ckpt/image/val blocks (``--debug`` short-circuits the `% every`
    conditions exactly like the reference, :253-384).
    """
    from edtr_tpu.train.edtr_step import (
        EDTRTrainState,
        make_edtr_sample_fn,
        make_edtr_train_step,
    )

    cfg = load_config(cfg_path)
    exp_dir, ckpt_dir, img_dir, logger, writer = prepare_environment(cfg, cfg_path, seed)
    train_cfg = cfg["train"]

    pipe, params = build_edtr_models(cfg)
    detnet = build_detnet(cfg, "detnet", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(train_cfg.get("seed", 231))
    det_params = init_detnet_params(detnet, rng)
    teacher_params = init_detnet_params(detnet, jax.random.fold_in(rng, 1))
    for name, field in (("detnet", "resume_detnet"), ("teacher_detnet", "resume_teacher_detnet")):
        path = train_cfg.get(field, None)
        if path and os.path.exists(str(path)):
            logger(f"loading {name} from {path}")
            # torchvision-style detnet checkpoints need the detection converter
            # (landing with COCO recipes); orbax checkpoints restore directly
            loaded = ckpt.load_network(str(path), template=det_params, strict=False)
            if name == "detnet":
                det_params = loaded
            else:
                teacher_params = loaded
    params["detnet"] = det_params
    params["teacher_detnet"] = teacher_params

    if train_cfg.get("frozen_bf16", True):
        # frozen submodules need no fp32 masters (HBM policy; see
        # edtr_step.cast_frozen_bf16) — disable with frozen_bf16: false
        from edtr_tpu.train.edtr_step import cast_frozen_bf16

        params = cast_frozen_bf16(
            params, getattr(pipe.cldm.vae, "train_decoder", True))

    state = EDTRTrainState.create(
        pipe, params,
        learning_rate_edtr=train_cfg.get("learning_rate_edtr", 1e-4),
        learning_rate_detnet=train_cfg.get("learning_rate_detnet", 5e-3),
        train_steps=train_cfg.get("train_steps", 10000),
    )
    # data-parallel mesh over all local devices (reference: DDP with
    # split_batches=True — global batch divided across ranks, SURVEY §2.7)
    mesh = None
    n_dev = jax.device_count()
    if n_dev > 1 and train_cfg.get("batch_size", 16) % n_dev == 0:
        from edtr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)
        logger(f"data-parallel mesh over {n_dev} devices")
    elif n_dev > 1:
        logger(f"batch size {train_cfg.get('batch_size', 16)} not divisible "
               f"by {n_dev} devices; running unsharded")
    # reference-batch semantics on few chips: train.accum_steps splits the
    # global batch into microbatches inside the compiled step (the VOC
    # flagship's global bs 16 runs on ONE v5e with accum_steps=8)
    accum_steps = int(train_cfg.get("accum_steps", 1))
    if accum_steps > 1:
        logger(f"gradient accumulation: {accum_steps} microbatches/step")
    step_fn = make_edtr_train_step(
        pipe, detnet=detnet, mesh=mesh,
        weight_hlf=train_cfg.get("weight_hlf", 0.5),
        weight_det=train_cfg.get("weight_det", 1.0),
        weight_fm=train_cfg.get("weight_fm", 0.2),
        accum_steps=accum_steps,
    )
    sample_fn = make_edtr_sample_fn(pipe)

    dataset = instantiate_from_config(cfg["dataset"]["train"])
    batch_transform = _build_batch_transform(cfg, logger)
    loader = make_dataloader(
        dataset,
        batch_size=train_cfg.get("batch_size", 16),
        num_workers=train_cfg.get("num_workers", 0),
        aspect_ratio_group_factor=train_cfg.get("aspect_ratio_group_factor", -1),
        seed=train_cfg.get("seed", 231),
    )
    c_txt_one = pipe.cldm.encode_text(params, [train_cfg.get("default_prompt", "")])

    max_steps = 2 if debug else train_cfg.get("train_steps", 10000)
    log_every = 1 if debug else train_cfg.get("log_every", 50)
    ckpt_every = 1 if debug else train_cfg.get("ckpt_every", 10000)

    # in-training validation + image dumps (main/det/train_edtr.py:276-362)
    from edtr_tpu.train import valhooks as V

    val_cfg = cfg.get("val", None) or Config()
    val_ds = None
    if cfg["dataset"].get("val", None):
        val_ds = instantiate_from_config(cfg["dataset"]["val"])
    val_every = 1 if debug else val_cfg.get("val_every", 0)
    image_every = 1 if debug else train_cfg.get("image_every", 0)
    val_max = 2 if debug else None
    det_eval_fn = jax.jit(lambda v, im: detnet.apply(v, im)[0])
    pre_fn = jax.jit(pipe.pre_restore)

    # full train-state resume (the reference only reloads weights,
    # SURVEY.md §5.4; we restore optimizer + step too)
    state_dir = os.path.join(ckpt_dir, "trainstate_last")
    if train_cfg.get("resume_state", False) and os.path.isdir(state_dir):
        restored = ckpt.restore_checkpoint(
            state_dir,
            dict(params=state.params, opt_edtr=state.opt_edtr_state,
                 opt_detnet=state.opt_detnet_state, step=state.step),
        )
        state = state.replace(
            params=restored["params"], opt_edtr_state=restored["opt_edtr"],
            opt_detnet_state=restored["opt_detnet"], step=restored["step"],
        )
        logger(f"resumed full train state at step {int(state.step)}")

    global_step = int(state.step)
    key = jax.random.PRNGKey(train_cfg.get("seed", 231))
    t0 = time.time()
    while global_step < max_steps:
        for batch in loader:
            _, _, gt_batch, lq_batch, annot_list, _, bs = prepare_batch(
                batch, batch_transform=batch_transform)
            targets = pad_annots(annot_list)
            dev_batch = dict(
                lq=jnp.asarray(lq_batch),
                gt=jnp.asarray(gt_batch),
                c_txt=jnp.tile(c_txt_one, (bs, 1, 1)),
                targets={k: jnp.asarray(v) for k, v in targets.items()},
            )
            if mesh is not None and jax.process_count() > 1:
                # multi-process: each host contributes its loader shard; the
                # global sharded array spans all processes' devices
                from edtr_tpu.parallel.distributed import shard_host_batch

                dev_batch = shard_host_batch(dev_batch, mesh)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, dev_batch, sub)
            global_step += 1

            if global_step % log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                logger(
                    f"step {global_step}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                    + f" ({(time.time() - t0) / global_step:.2f}s/step)"
                )
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", v, global_step)
            if global_step % ckpt_every == 0:
                save = dict(
                    controlnet=state.params["controlnet"],
                    decoder=state.params["vae"]["decoder"],
                    detnet=state.params["detnet"],
                )
                if "swinir" in state.params:
                    save["swinir"] = state.params["swinir"]
                ckpt.save_submodules(ckpt_dir, save, step=global_step)
                ckpt.save_checkpoint(
                    state_dir,
                    dict(params=state.params, opt_edtr=state.opt_edtr_state,
                         opt_detnet=state.opt_detnet_state, step=state.step),
                )
                logger(f"checkpoints saved at step {global_step}")
            if image_every and global_step % image_every == 0:
                k = min(4, bs)
                key, sub = jax.random.split(key)
                restored = sample_fn(
                    state.params, dev_batch["lq"][:k],
                    dev_batch["c_txt"][:k], sub)
                pre_res = pre_fn(state.params, dev_batch["lq"][:k])
                p = V.save_image_grid(img_dir, global_step, dict(
                    gt=dev_batch["gt"][:k], lq=dev_batch["lq"][:k],
                    pre_restored=pre_res, restored=restored))
                logger(f"image grid saved: {p}")
            if val_ds is not None and val_every and global_step % val_every == 0:
                key, sub = jax.random.split(key)
                stats = V.validate_detection(
                    val_ds, det_eval_fn, state.params["detnet"], sub,
                    restore_fn=lambda x, rng: sample_fn(
                        state.params, x, c_txt_one, rng),
                    max_images=val_max)
                V.log_val_stats(logger, writer, global_step, stats)
            if global_step >= max_steps:
                break
    logger("training done")
    return state


def _task_apply_for(task: str, net):
    """(loss_fn, feats_fn) for cls/seg/det task nets.

    ``loss_fn(params, extra_vars, images, target, rng) ->
    (loss, (metrics, new_extra_vars))`` — BatchNorm running stats live in
    ``extra_vars`` and update during training (torch train()-mode parity);
    ``feats_fn(params, extra_vars, images)`` returns the feature used by
    TDP/feature-matching losses.
    """
    from edtr_tpu.train.recipes import cross_entropy, seg_cross_entropy

    def _run(p, extra, images, train, **kwargs):
        variables = {"params": p, **(extra or {})}
        if train and extra:
            out, ups = net.apply(
                variables, images, train=True, mutable=list(extra.keys()), **kwargs
            )
            return out, dict(ups)
        return net.apply(variables, images, **kwargs), extra

    if task == "cls":
        def loss_fn(p, extra, images, labels, rng):
            logits, new_extra = _run(p, extra, images, True, normalize=True)
            return cross_entropy(logits, labels), ({}, new_extra)

        def feats_fn(p, extra, images):
            out, _ = _run(p, extra, images, False, normalize=True, return_feat=True)
            return out[1]

        return loss_fn, feats_fn
    if task == "seg":
        def loss_fn(p, extra, images, masks, rng):
            out, new_extra = _run(p, extra, images, True, normalize=True)
            return seg_cross_entropy(out["out"], masks), ({}, new_extra)

        def feats_fn(p, extra, images):
            out, _ = _run(p, extra, images, False, normalize=True, return_feat=True)
            return out[1]["C5"]

        return loss_fn, feats_fn
    if task == "det":
        def loss_fn(p, extra, images, targets, rng):
            variables = {"params": p, **(extra or {})}
            if extra:
                # torch train() parity: BN batch stats + running updates
                # (norm_frozen variants leave the stats untouched)
                (_, losses, _), new_extra = net.apply(
                    variables, images, targets=targets, train=True,
                    mutable=list(extra.keys()), rngs={"sampler": rng},
                )
                return sum(losses.values()), (losses, dict(new_extra))
            _, losses, _ = net.apply(
                variables, images, targets=targets, rngs={"sampler": rng}
            )
            return sum(losses.values()), (losses, extra)

        def feats_fn(p, extra, images):
            variables = {"params": p, **(extra or {})}
            _, _, feats = net.apply(variables, images)
            return feats["features"]["0"]

        return loss_fn, feats_fn
    raise ValueError(task)


def task_train(
    cfg_path: str,
    task: str,
    recipe: str = "task",  # task | swinir (frozen pre-restore) | swinir-pre | sr4ir
    debug: bool = False,
    seed: Optional[int] = None,
):
    """Oracle/LQ task training + SwinIR recipes for cls/seg.

    Parity: ``main/{cls,seg}/train_{cls,seg,swinir,swinir-pre,swinir-sr4ir}.py``.
    """
    from edtr_tpu.train import recipes as R

    cfg = load_config(cfg_path)
    exp_dir, ckpt_dir, img_dir, logger, writer = prepare_environment(cfg, cfg_path, seed)
    train_cfg = cfg["train"]
    key = jax.random.PRNGKey(train_cfg.get("seed", 231))

    net_key = {"cls": "clsnet", "seg": "segnet", "det": "detnet"}[task]
    net = instantiate_from_config(cfg["model"][net_key], dtype=jnp.bfloat16)
    img_size = cfg["dataset"]["train"]["params"].get("out_size", None) or \
        cfg["dataset"]["train"]["params"].get("gt_size", 512)
    net_params = jax.jit(net.init)(
        {"params": key}, jnp.zeros((1, img_size, img_size, 3))
    )  # full variables (params + batch_stats)

    swinir = None
    sw_params = None
    if recipe in ("swinir", "swinir-pre", "sr4ir") and "swinir" in cfg["model"]:
        from edtr_tpu.models.swinir import SwinIR

        sw_cfg = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in (cfg["model"]["swinir"]["params"].to_dict()).items()}
        swinir = SwinIR(dtype=jnp.bfloat16, **sw_cfg)
        resume = train_cfg.get("resume_swinir", None)
        if resume and os.path.exists(str(resume)):
            conv_sw = lambda sd: C.convert_swinir(
                sd, depths=tuple(swinir.depths), unshuffle=swinir.unshuffle,
                upsampler=swinir.upsampler, sf=swinir.sf)
            sw_params = ckpt.load_network(str(resume), converter=conv_sw)
        else:
            sw_params = jax.jit(swinir.init)(
                jax.random.fold_in(key, 7), jnp.zeros((1, img_size, img_size, 3))
            )["params"]

    loss_fn, feats_fn = _task_apply_for(task, net)
    lr = train_cfg.get("learning_rate", 1e-3)
    steps = train_cfg.get("train_steps", 10000)

    sgd_wd = 1e-6 if task == "seg" else 1e-4  # main/seg/train_seg.py:46 vs 1e-4
    if recipe == "swinir-pre":
        # AdamW weight_decay=0 (main/*/train_swinir-pre.py:47-49)
        state = R.SimpleTrainState.create(
            sw_params, R.cosine_tx("adamw", lr, steps, weight_decay=0.0))
        step_fn = R.make_swinir_pre_train_step(swinir)
    elif recipe == "sr4ir":
        # swinir half: AdamW weight_decay=0 (main/*/train_swinir-sr4ir.py:56-58)
        sw_state = R.SimpleTrainState.create(
            sw_params, R.cosine_tx("adamw", train_cfg.get("learning_rate_swinir", lr),
                                   steps, weight_decay=0.0))
        from edtr_tpu.models.faster_rcnn import mask_detnet_tx

        t_state = R.SimpleTrainState.create(
            net_params,
            mask_detnet_tx(
                R.cosine_tx("sgd", train_cfg.get("learning_rate_task", lr), steps,
                            weight_decay=sgd_wd),
                net_params["params"]))
        state = (sw_state, t_state)
        step_fn = R.make_sr4ir_train_step(
            swinir, feats_fn, loss_fn, pix_weight=train_cfg.get("pix_weight", 255.0))
    else:
        pre = None
        if recipe == "swinir":
            pre = lambda lq: swinir.apply({"params": sw_params}, lq)
        from edtr_tpu.models.faster_rcnn import mask_detnet_tx

        state = R.SimpleTrainState.create(
            net_params, mask_detnet_tx(R.cosine_tx("sgd", lr, steps, weight_decay=sgd_wd),
                                       net_params["params"]))
        step_fn = R.make_task_train_step(
            loss_fn, pre_restore=pre,
            use_gt=bool(cfg["dataset"].get("use_gt", False)),
        )

    dataset = instantiate_from_config(cfg["dataset"]["train"])
    batch_transform = _build_batch_transform(cfg, logger)
    loader = make_dataloader(
        dataset, batch_size=train_cfg.get("batch_size", 16),
        num_workers=train_cfg.get("num_workers", 0),
        seed=train_cfg.get("seed", 231),
    )

    max_steps = 2 if debug else steps
    log_every = 1 if debug else train_cfg.get("log_every", 50)
    ckpt_every = 1 if debug else train_cfg.get("ckpt_every", steps)

    # in-training validation + image dumps (main/*/train_swinir.py:141-199)
    from edtr_tpu.train import valhooks as V

    val_cfg = cfg.get("val", None) or Config()
    val_ds = None
    if cfg["dataset"].get("val", None):
        val_ds = instantiate_from_config(cfg["dataset"]["val"])
    val_every = 1 if debug else val_cfg.get("val_every", 0)
    image_every = 1 if debug else train_cfg.get("image_every", 0)
    val_max = 2 if debug else None

    _sw_apply = (jax.jit(lambda p, x: swinir.apply({"params": p}, x))
                 if swinir is not None else None)

    def _current_restore_fn():
        """(lq, rng) -> restored, per recipe; None when nothing restores.

        Jitted once (params as arg) — eager swinir.apply would pay per-op
        tunnel RTT on every validation image.
        """
        if recipe == "swinir-pre":
            p = state.params
            return lambda x, rng: _sw_apply(p, x)
        if recipe == "sr4ir":
            p = state[0].params
            return lambda x, rng: _sw_apply(p, x)
        if recipe == "swinir":
            return lambda x, rng: _sw_apply(sw_params, x)
        return None

    def _current_net_vars():
        if recipe == "sr4ir":
            return state[1].variables
        if recipe == "swinir-pre":
            return None
        return state.variables

    if task == "det":
        det_eval_fn = jax.jit(lambda v, im: net.apply(v, im)[0])
    else:
        task_eval_fn = jax.jit(lambda v, x: net.apply(v, x, normalize=True))

    global_step = 0
    while global_step < max_steps:
        for batch in loader:
            if task == "det":
                _, _, gt_b, lq_b, annot_list, _, _ = prepare_batch(
                    batch, batch_transform=batch_transform)
                gt, lq = jnp.asarray(gt_b), jnp.asarray(lq_b)
                target = {k: jnp.asarray(v) for k, v in pad_annots(annot_list).items()}
            else:
                gt_l, lq_l, target_l, _ = batch
                gt = jnp.asarray(np.stack(gt_l))
                lq = jnp.asarray(np.stack(lq_l))
                target = jnp.asarray(np.stack(target_l))
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, dict(gt=gt, lq=lq, target=target), sub)
            global_step += 1
            if global_step % log_every == 0:
                logger(f"step {global_step}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", float(v), global_step)
            if global_step % ckpt_every == 0:
                if recipe == "sr4ir":
                    ckpt.save_submodules(ckpt_dir, {
                        "swinir": state[0].params, net_key: state[1].params}, global_step)
                elif recipe == "swinir-pre":
                    ckpt.save_submodules(ckpt_dir, {"swinir": state.params}, global_step)
                else:
                    ckpt.save_submodules(ckpt_dir, {net_key: state.params}, global_step)
            restore = _current_restore_fn()
            if image_every and global_step % image_every == 0:
                k = min(4, gt.shape[0])
                rows = dict(gt=gt[:k], lq=lq[:k])
                if restore is not None:
                    key, sub = jax.random.split(key)
                    rows["restored"] = restore(lq[:k], sub)
                p = V.save_image_grid(img_dir, global_step, rows)
                logger(f"image grid saved: {p}")
            if val_ds is not None and val_every and global_step % val_every == 0:
                key, sub = jax.random.split(key)
                net_vars = _current_net_vars()
                if task == "det" and net_vars is not None:
                    stats = V.validate_detection(
                        val_ds, det_eval_fn, net_vars, sub,
                        restore_fn=restore, max_images=val_max)
                elif net_vars is not None:
                    stats = V.validate_task(
                        task, val_ds, task_eval_fn, net_vars, sub,
                        restore_fn=restore, max_images=val_max)
                else:  # swinir-pre: restoration-only PSNR
                    from edtr_tpu.utils.image import calculate_psnr

                    psnrs = []
                    n_v = min(len(val_ds), val_max or len(val_ds))
                    for i in range(n_v):
                        g_i, l_i = val_ds[i][0], val_ds[i][1]
                        key, sub = jax.random.split(key)
                        r = restore(jnp.asarray(l_i)[None], sub)
                        psnrs.append(float(calculate_psnr(
                            r, jnp.asarray(g_i)[None])[0]))
                    stats = dict(psnr=float(np.mean(psnrs)))
                V.log_val_stats(logger, writer, global_step, stats)
            if global_step >= max_steps:
                break
    logger("training done")
    return state


def edtr_train_task(
    cfg_path: str, task: str, debug: bool = False, seed: Optional[int] = None
):
    """EDTR training for cls/seg tasks.

    Parity: ``main/{cls,seg}/train_edtr.py`` — same two-half update as
    detection with the task net's features for the HLF loss.
    """
    from edtr_tpu.train.edtr_step import (
        EDTRTrainState,
        make_edtr_generic_train_step,
    )

    cfg = load_config(cfg_path)
    exp_dir, ckpt_dir, img_dir, logger, writer = prepare_environment(cfg, cfg_path, seed)
    train_cfg = cfg["train"]
    key = jax.random.PRNGKey(train_cfg.get("seed", 231))

    pipe, params = build_edtr_models(cfg)
    net_key = {"cls": "clsnet", "seg": "segnet"}[task]
    net = instantiate_from_config(cfg["model"][net_key], dtype=jnp.bfloat16)
    img_size = cfg["dataset"]["train"]["params"].get("out_size", 512) or 512
    task_vars = jax.jit(net.init)(
        {"params": key}, jnp.zeros((1, img_size, img_size, 3))
    )
    teacher_vars = task_vars
    for name, field in (("tasknet", f"resume_{net_key}"),
                        ("teacher_tasknet", f"resume_teacher_{net_key}")):
        path = train_cfg.get(field, None)
        if path and os.path.exists(str(path)):
            loaded = ckpt.load_network(str(path), template=task_vars, strict=False)
            if name == "tasknet":
                task_vars = loaded
            else:
                teacher_vars = loaded
    params["tasknet"] = task_vars
    params["teacher_tasknet"] = teacher_vars

    loss_fn, feats_fn = _task_apply_for(task, net)
    state = EDTRTrainState.create(
        pipe, {**params, "detnet": task_vars},  # detnet slot drives the SGD init
        learning_rate_edtr=train_cfg.get("learning_rate_edtr", 1e-4),
        learning_rate_detnet=train_cfg.get("learning_rate_task",
                                           train_cfg.get("learning_rate_detnet", 5e-3)),
        train_steps=train_cfg.get("train_steps", 10000),
    )
    state = state.replace(params=params)
    accum_steps = int(train_cfg.get("accum_steps", 1))
    if accum_steps > 1:
        logger(f"gradient accumulation: {accum_steps} microbatches/step")
    step_fn = make_edtr_generic_train_step(
        pipe, feats_fn, loss_fn,
        weight_hlf=train_cfg.get("weight_hlf", 0.5),
        weight_task=train_cfg.get("weight_ce", train_cfg.get("weight_det", 1.0)),
        weight_fm=train_cfg.get("weight_fm", 0.2),
        accum_steps=accum_steps,
    )

    dataset = instantiate_from_config(cfg["dataset"]["train"])
    batch_transform = _build_batch_transform(cfg, logger)
    loader = make_dataloader(
        dataset, batch_size=train_cfg.get("batch_size", 16),
        num_workers=train_cfg.get("num_workers", 0), seed=train_cfg.get("seed", 231),
    )
    c_txt_one = pipe.cldm.encode_text(params, [train_cfg.get("default_prompt", "")])

    max_steps = 2 if debug else train_cfg.get("train_steps", 10000)
    log_every = 1 if debug else train_cfg.get("log_every", 50)
    ckpt_every = 1 if debug else train_cfg.get("ckpt_every", 10000)

    # in-training validation + image dumps (main/{cls,seg}/train_edtr.py)
    from edtr_tpu.train import valhooks as V
    from edtr_tpu.train.edtr_step import make_edtr_sample_fn

    sample_fn = make_edtr_sample_fn(pipe)
    val_cfg = cfg.get("val", None) or Config()
    val_ds = None
    if cfg["dataset"].get("val", None):
        val_ds = instantiate_from_config(cfg["dataset"]["val"])
    val_every = 1 if debug else val_cfg.get("val_every", 0)
    image_every = 1 if debug else train_cfg.get("image_every", 0)
    val_max = 2 if debug else None
    task_eval_fn = jax.jit(lambda v, x: net.apply(v, x, normalize=True))
    pre_fn = jax.jit(pipe.pre_restore)

    global_step = 0
    while global_step < max_steps:
        for batch in loader:
            gt_l, lq_l, target_l, _ = batch
            bs = len(gt_l)
            dev_batch = dict(
                gt=jnp.asarray(np.stack(gt_l)),
                lq=jnp.asarray(np.stack(lq_l)),
                target=jnp.asarray(np.stack(target_l)),
                c_txt=jnp.tile(c_txt_one, (bs, 1, 1)),
            )
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, dev_batch, sub)
            global_step += 1
            if global_step % log_every == 0:
                logger(f"step {global_step}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", float(v), global_step)
            if global_step % ckpt_every == 0:
                ckpt.save_submodules(ckpt_dir, dict(
                    controlnet=state.params["controlnet"],
                    decoder=state.params["vae"]["decoder"],
                    **{net_key: state.params["tasknet"]},
                ), global_step)
            if image_every and global_step % image_every == 0:
                k = min(4, bs)
                key, sub = jax.random.split(key)
                restored = sample_fn(state.params, dev_batch["lq"][:k],
                                     dev_batch["c_txt"][:k], sub)
                pre_res = pre_fn(state.params, dev_batch["lq"][:k])
                p = V.save_image_grid(img_dir, global_step, dict(
                    gt=dev_batch["gt"][:k], lq=dev_batch["lq"][:k],
                    pre_restored=pre_res, restored=restored))
                logger(f"image grid saved: {p}")
            if val_ds is not None and val_every and global_step % val_every == 0:
                key, sub = jax.random.split(key)
                stats = V.validate_task(
                    task, val_ds, task_eval_fn, state.params["tasknet"], sub,
                    restore_fn=lambda x, rng: sample_fn(
                        state.params, x, c_txt_one, rng),
                    max_images=val_max)
                V.log_val_stats(logger, writer, global_step, stats)
            if global_step >= max_steps:
                break
    logger("training done")
    return state


def task_eval(cfg_path: str, task: str, debug: bool = False, seed: int = 231,
              max_images: Optional[int] = None):
    """PSNR + top-1 / mIoU eval; parity main/{cls,seg}/test_*.py."""
    from edtr_tpu.utils.metrics import confusion_matrix, compute_iou, topk_accuracy

    cfg = load_config(cfg_path)
    test_cfg = cfg.get("test", None) or cfg.get("val", Config())
    net_key = {"cls": "clsnet", "seg": "segnet", "det": "detnet"}[task]
    net = instantiate_from_config(cfg["model"][net_key], dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    dataset = instantiate_from_config(cfg["dataset"]["val"])
    g0, l0 = dataset[0][0], dataset[0][1]
    params = jax.jit(net.init)({"params": key}, jnp.zeros((1,) + g0.shape))
    resume = test_cfg.get(f"resume_{net_key}", None)
    if resume and os.path.exists(str(resume)):
        params = ckpt.load_network(str(resume), template=params, strict=False)
    else:
        print(f"WARNING: resume_{net_key} not found ({resume!r}); "
              "evaluating a randomly-initialized task net")

    apply = jax.jit(lambda p, x: net.apply(p, x, normalize=True))
    n = min(len(dataset), max_images or (4 if debug else len(dataset)))
    correct, total = 0, 0
    mats = None
    psnrs = []
    for i in range(n):
        gt, lq, target, _ = dataset[i]
        x = jnp.asarray(lq)[None]
        psnrs.append(float(calculate_psnr(jnp.asarray(gt)[None], x)[0]))
        out = apply(params, x)
        if task == "cls":
            correct += int(topk_accuracy(out, jnp.asarray([target]))[0])
            total += 1
        else:
            pred = np.asarray(out["out"].argmax(-1))[0]
            m = confusion_matrix(pred, np.asarray(target), out["out"].shape[-1])
            mats = m if mats is None else mats + m
    stats = dict(psnr=float(np.mean(psnrs)))
    if task == "cls":
        stats["top1"] = correct / max(total, 1)
    else:
        _, stats["miou"] = compute_iou(mats)
    print(stats)
    return stats


def _restore_eval_loop(cfg_path: str, task: str, restore_builder,
                       debug: bool, seed: int, max_images: Optional[int]):
    """Shared restore->task-metric eval loop (cls/seg).

    ``restore_builder(cfg, pipe-like) -> restore_fn(lq_batch, rng)``.
    """
    from edtr_tpu.utils.metrics import compute_iou, confusion_matrix, topk_accuracy

    cfg = load_config(cfg_path)
    test_cfg = cfg.get("test", None) or cfg.get("val", Config())
    net_key = {"cls": "clsnet", "seg": "segnet"}[task]
    net = instantiate_from_config(cfg["model"][net_key], dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    dataset = instantiate_from_config(cfg["dataset"]["val"])
    g0 = dataset[0][0]
    net_vars = jax.jit(net.init)({"params": key}, jnp.zeros((1,) + g0.shape))
    resume = test_cfg.get(f"resume_{net_key}", None)
    if resume and os.path.exists(str(resume)):
        net_vars = ckpt.load_network(str(resume), template=net_vars, strict=False)
    else:
        print(f"WARNING: resume_{net_key} not found ({resume!r}); "
              "evaluating a randomly-initialized task net")

    restore_fn = restore_builder(cfg)
    apply = jax.jit(lambda v, x: net.apply(v, x, normalize=True))
    n = min(len(dataset), max_images or (2 if debug else len(dataset)))
    psnrs, correct, total, mats = [], 0, 0, None
    for i in range(n):
        gt, lq, target, _ = dataset[i]
        key, sub = jax.random.split(key)
        restored = restore_fn(jnp.asarray(lq)[None], sub)
        psnrs.append(float(calculate_psnr(jnp.asarray(gt)[None], restored)[0]))
        out = apply(net_vars, restored)
        if task == "cls":
            correct += int(topk_accuracy(out, jnp.asarray([target]))[0])
            total += 1
        else:
            pred = np.asarray(out["out"].argmax(-1))[0]
            m = confusion_matrix(pred, np.asarray(target), out["out"].shape[-1])
            mats = m if mats is None else mats + m
    stats = dict(psnr=float(np.mean(psnrs)))
    if task == "cls":
        stats["top1"] = correct / max(total, 1)
    else:
        _, stats["miou"] = compute_iou(mats)
    print(stats)
    return stats


def edtr_eval_task(cfg_path: str, task: str, debug: bool = False, seed: int = 231,
                   max_images: Optional[int] = None):
    """EDTR restore -> cls/seg metric; parity main/{cls,seg}/test_edtr.py."""
    from edtr_tpu.train.edtr_step import make_edtr_sample_fn

    def builder(cfg):
        pipe, params = build_edtr_models(cfg)
        sample_fn = make_edtr_sample_fn(pipe)
        test_cfg = cfg.get("test", None) or Config()
        c_txt = pipe.cldm.encode_text(params, [test_cfg.get("default_prompt", "")])
        return lambda lq, rng: sample_fn(params, lq, c_txt, rng)

    return _restore_eval_loop(cfg_path, task, builder, debug, seed, max_images)


def swinir_eval(cfg_path: str, task: str, debug: bool = False, seed: int = 231,
                max_images: Optional[int] = None):
    """Frozen-SwinIR restore -> task metric; parity main/*/test_swinir.py."""

    def builder(cfg):
        from edtr_tpu.models.swinir import SwinIR

        test_cfg = cfg.get("test", None) or Config()
        sw_cfg = {k: (tuple(v) if isinstance(v, list) else v)
                  for k, v in cfg["model"]["swinir"]["params"].to_dict().items()}
        swinir = SwinIR(dtype=jnp.bfloat16, **sw_cfg)
        resume = test_cfg.get("resume_swinir", None)
        if resume and os.path.exists(str(resume)):
            conv_sw = lambda sd: C.convert_swinir(
                sd, depths=tuple(swinir.depths), unshuffle=swinir.unshuffle,
                upsampler=swinir.upsampler, sf=swinir.sf)
            sw_params = ckpt.load_network(str(resume), converter=conv_sw)
        else:
            sw_params = jax.jit(swinir.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        fn = jax.jit(lambda lq: swinir.apply({"params": sw_params}, lq))
        return lambda lq, rng: fn(lq)

    return _restore_eval_loop(cfg_path, task, builder, debug, seed, max_images)


def diffbir_eval(cfg_path: str, task: str, debug: bool = False, seed: int = 231,
                 max_images: Optional[int] = None, steps: int = 50):
    """50-step from-noise DiffBIR restore -> task metric.

    Parity: main/*/test_diffbir.py (full ``sampler.sample`` from pure noise).
    """
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.utils.image import wavelet_reconstruction

    def builder(cfg):
        pipe, params = build_edtr_models(cfg)
        schedule = pipe.sampler.make_schedule(steps)
        test_cfg = cfg.get("test", None) or Config()
        c_txt = pipe.cldm.encode_text(params, [test_cfg.get("default_prompt", "")])

        @jax.jit
        def restore(lq, rng):
            pre = pipe.pre_restore(params, lq)
            z_pre = pipe.cldm.vae_encode(params, pre * 2 - 1, sample=False)
            cond = dict(c_txt=c_txt, c_img=z_pre)
            r1, r2 = jax.random.split(rng)
            x_T = jax.random.normal(r1, z_pre.shape, z_pre.dtype)
            z = sample_scan(pipe.cldm.model_fn(params), schedule, x_T, cond, r2)
            return wavelet_reconstruction(
                (pipe.cldm.vae_decode(params, z) + 1) / 2, pre
            )

        return restore

    return _restore_eval_loop(cfg_path, task, builder, debug, seed, max_images)


def diffbir_train(cfg_path: str, task: str, debug: bool = False,
                  seed: Optional[int] = None):
    """DiffBIR training; parity main/*/train_diffbir.py.

    Uses :func:`edtr_tpu.train.recipes.make_diffbir_train_step` with the
    task hooks from ``_task_apply_for`` (det uses the detection loss dict).
    """
    from edtr_tpu.train import recipes as R
    from edtr_tpu.train.recipes import SimpleTrainState, cosine_tx

    cfg = load_config(cfg_path)
    exp_dir, ckpt_dir, img_dir, logger, writer = prepare_environment(cfg, cfg_path, seed)
    train_cfg = cfg["train"]
    key = jax.random.PRNGKey(train_cfg.get("seed", 231))

    pipe, params = build_edtr_models(cfg)
    net_key = {"cls": "clsnet", "seg": "segnet", "det": "detnet"}[task]
    net = instantiate_from_config(cfg["model"][net_key], dtype=jnp.bfloat16)
    img_size = cfg["dataset"]["train"]["params"].get("out_size", 512) or 512
    task_vars = jax.jit(net.init)(
        {"params": key}, jnp.zeros((1, img_size, img_size, 3)))
    teacher_vars = task_vars
    loss_fn, feats_fn = _task_apply_for(task, net)

    steps = train_cfg.get("train_steps", 10000)
    # torch AdamW default wd=1e-2 (main/det/train_diffbir.py:73-74); opt state
    # must be inited over the TRAINABLE split (the step updates that subtree)
    from edtr_tpu.train.edtr_step import split_trainable

    tx_cldm = cosine_tx("adamw", train_cfg.get("learning_rate_diffbir",
                                               train_cfg.get("learning_rate_edtr", 1e-4)),
                        steps, weight_decay=1e-2)
    trainable0, _ = split_trainable(params, train_decoder=False)
    cldm_state = SimpleTrainState(
        params=params, opt_state=tx_cldm.init(trainable0),
        step=jnp.zeros((), jnp.int32), tx=tx_cldm)
    task_state = SimpleTrainState.create(
        task_vars, cosine_tx("sgd", train_cfg.get("learning_rate_task", 5e-3), steps,
                             weight_decay=1e-6 if task == "seg" else 1e-4))
    step_fn = R.make_diffbir_train_step(
        pipe, loss_fn, feats_fn,
        weight_ce=train_cfg.get("weight_ce", 1.0),
        weight_fm=train_cfg.get("weight_fm", 0.2),
    )

    dataset = instantiate_from_config(cfg["dataset"]["train"])
    batch_transform = _build_batch_transform(cfg, logger)
    loader = make_dataloader(
        dataset, batch_size=train_cfg.get("batch_size", 16),
        num_workers=train_cfg.get("num_workers", 0), seed=train_cfg.get("seed", 231))
    c_txt_one = pipe.cldm.encode_text(params, [train_cfg.get("default_prompt", "")])

    max_steps = 2 if debug else steps
    log_every = 1 if debug else train_cfg.get("log_every", 50)
    ckpt_every = 1 if debug else train_cfg.get("ckpt_every", steps)

    # in-training validation + image dumps (main/*/train_diffbir.py val/image
    # blocks — 50-step from-noise restore like test_diffbir)
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.train import valhooks as V
    from edtr_tpu.utils.image import wavelet_reconstruction

    val_cfg = cfg.get("val", None) or Config()
    val_ds = None
    if cfg["dataset"].get("val", None):
        val_ds = instantiate_from_config(cfg["dataset"]["val"])
    val_every = 1 if debug else val_cfg.get("val_every", 0)
    image_every = 1 if debug else train_cfg.get("image_every", 0)
    val_max = 2 if debug else None
    schedule50 = pipe.sampler.make_schedule(train_cfg.get("sample_steps", 50))

    @jax.jit
    def _restore50(params, lq, rng):
        # jitted ONCE with params as an argument — rebuilding a closure per
        # val/image event would recompile the 50-step graph every time
        pre = pipe.pre_restore(params, lq)
        z_pre = pipe.cldm.vae_encode(params, pre * 2 - 1, sample=False)
        cond = dict(c_txt=jnp.tile(c_txt_one, (lq.shape[0], 1, 1)),
                    c_img=z_pre)
        r1, r2 = jax.random.split(rng)
        x_T = jax.random.normal(r1, z_pre.shape, z_pre.dtype)
        z = sample_scan(pipe.cldm.model_fn(params), schedule50, x_T, cond, r2)
        return wavelet_reconstruction(
            (pipe.cldm.vae_decode(params, z) + 1) / 2, pre)

    def make_restore(params):
        return lambda lq, rng: _restore50(params, lq, rng)

    if task == "det":
        det_eval_fn = jax.jit(lambda v, im: net.apply(v, im)[0])
    else:
        task_eval_fn = jax.jit(lambda v, x: net.apply(v, x, normalize=True))

    state = (cldm_state, task_state, teacher_vars)
    global_step = 0
    while global_step < max_steps:
        for batch in loader:
            if task == "det":
                _, _, gt_b, lq_b, annot_list, _, bs = prepare_batch(
                    batch, batch_transform=batch_transform)
                gt, lq = jnp.asarray(gt_b), jnp.asarray(lq_b)
                target = {k: jnp.asarray(v) for k, v in pad_annots(annot_list).items()}
            else:
                gt_l, lq_l, target_l, _ = batch
                bs = len(gt_l)
                gt = jnp.asarray(np.stack(gt_l))
                lq = jnp.asarray(np.stack(lq_l))
                target = jnp.asarray(np.stack(target_l))
            key, sub = jax.random.split(key)
            dev_batch = dict(gt=gt, lq=lq, target=target,
                             c_txt=jnp.tile(c_txt_one, (bs, 1, 1)))
            state, metrics = step_fn(state, dev_batch, sub)
            global_step += 1
            if global_step % log_every == 0:
                logger(f"step {global_step}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", float(v), global_step)
            if global_step % ckpt_every == 0:
                ckpt.save_submodules(ckpt_dir, dict(
                    controlnet=state[0].params["controlnet"],
                    **{net_key: state[1].variables},
                ), global_step)
            if image_every and global_step % image_every == 0:
                k = min(4, bs)
                restore = make_restore(state[0].params)
                key, sub = jax.random.split(key)
                restored = restore(lq[:k], sub)
                p = V.save_image_grid(img_dir, global_step, dict(
                    gt=gt[:k], lq=lq[:k], restored=restored))
                logger(f"image grid saved: {p}")
            if val_ds is not None and val_every and global_step % val_every == 0:
                restore = make_restore(state[0].params)
                key, sub = jax.random.split(key)
                if task == "det":
                    stats = V.validate_detection(
                        val_ds, det_eval_fn, state[1].variables, sub,
                        restore_fn=restore, max_images=val_max)
                else:
                    stats = V.validate_task(
                        task, val_ds, task_eval_fn, state[1].variables, sub,
                        restore_fn=restore, max_images=val_max)
                V.log_val_stats(logger, writer, global_step, stats)
            if global_step >= max_steps:
                break
    logger("training done")
    return state


def edtr_eval(
    cfg_path: str,
    debug: bool = False,
    seed: int = 231,
    save_img: bool = False,
    calc_fd: bool = False,
    max_images: Optional[int] = None,
):
    """EDTR detection evaluation: restore -> detect -> PSNR + COCO mAP,
    optional restored-image dumps and teacher feature-distance.

    Parity: ``main/det/test_edtr.py:100-190`` (+ --save-img :149-160,
    --calc-fd :144-147,166-168).
    """
    from edtr_tpu.train.edtr_step import make_edtr_sample_fn
    from edtr_tpu.utils.coco_eval import CocoEvaluator
    from edtr_tpu.data.coco import gt_from_dataset

    cfg = load_config(cfg_path)
    test_cfg = cfg.get("test", None) or cfg.get("val", Config())
    pipe, params = build_edtr_models(cfg)
    detnet = build_detnet(cfg, "detnet", dtype=jnp.bfloat16)
    det_params = init_detnet_params(detnet, jax.random.PRNGKey(seed))
    path = test_cfg.get("resume_detnet", None)
    if path and os.path.exists(str(path)):
        det_params = ckpt.load_network(str(path), template=det_params, strict=False)
    elif not debug:
        # the reference fails loudly on missing checkpoints (strict load,
        # utils/common.py:272-334); silently evaluating a random detnet
        # would waste a TPU run
        raise FileNotFoundError(
            f"resume_detnet missing or not found ({path!r}); refusing to "
            "evaluate a randomly-initialized detector (pass --debug to allow)")

    dataset = instantiate_from_config(cfg["dataset"]["val"])
    gt_index = gt_from_dataset(dataset)
    evaluator = CocoEvaluator(gt_index)

    sample_fn = make_edtr_sample_fn(pipe)
    det_fn = jax.jit(lambda p, im: detnet.apply(p, im)[0])
    c_txt = pipe.cldm.encode_text(params, [test_cfg.get("default_prompt", "")])

    teacher_params = None
    fd_fn = None
    if calc_fd:
        teacher_params = init_detnet_params(detnet, jax.random.fold_in(jax.random.PRNGKey(seed), 1))
        tpath = test_cfg.get("resume_teacher_detnet", None)
        if tpath and os.path.exists(str(tpath)):
            teacher_params = ckpt.load_network(str(tpath), template=teacher_params, strict=False)
        fd_fn = jax.jit(
            lambda p, a, b: jnp.abs(
                detnet.apply(p, a)[2]["features"]["0"]
                - detnet.apply(p, b)[2]["features"]["0"]
            ).mean()
        )

    img_dir = None
    if save_img:
        img_dir = os.path.join(
            (cfg.get("test", None) or Config()).get("exp_dir", "results"), "images"
        )
        os.makedirs(img_dir, exist_ok=True)

    psnrs, fds = [], []
    n = min(len(dataset), max_images or (4 if debug else len(dataset)))
    key = jax.random.PRNGKey(seed)
    for i in range(n):
        gt, lq, annot, _ = dataset[i]
        h, w = gt.shape[:2]
        from edtr_tpu.train.harness import list_to_batch

        lq_b = jnp.asarray(list_to_batch([lq], 512))
        gt_b = jnp.asarray(list_to_batch([gt], 512))
        key, sub = jax.random.split(key)
        restored = sample_fn(params, lq_b, c_txt, sub)
        psnrs.append(float(calculate_psnr(restored[:, :h, :w], gt_b[:, :h, :w])[0]))
        if fd_fn is not None:
            fds.append(float(fd_fn(teacher_params, gt_b, restored)))
        if img_dir is not None:
            from PIL import Image

            out01 = np.clip(np.asarray(restored[0, :h, :w]), 0, 1)
            Image.fromarray((out01 * 255).astype(np.uint8)).save(
                os.path.join(img_dir, f"{i:05d}.png"))
        dets = det_fn(det_params, restored)
        valid = np.asarray(dets["valid"][0])
        evaluator.update({
            annot["image_id"]: dict(
                boxes=np.asarray(dets["boxes"][0])[valid],
                scores=np.asarray(dets["scores"][0])[valid],
                labels=np.asarray(dets["labels"][0])[valid],
            )
        })
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = evaluator.summarize()
    stats["psnr"] = float(np.mean(psnrs))
    if fds:
        stats["feature_distance"] = float(np.mean(fds))
    print(f"PSNR: {stats['psnr']:.3f}  mAP: {stats['AP']:.4f}  mAP50: {stats['AP50']:.4f}"
          + (f"  FD: {stats['feature_distance']:.4f}" if fds else ""))
    return stats
