"""Lossless PyTorch -> JAX checkpoint conversion.

This is the correctness anchor of the framework (SURVEY.md §7 "hard parts"):
every reference checkpoint (SD2.1 ``v2-1_512-ema-pruned.ckpt``, EDTR released
weights, torchvision backbones) converts into edtr_tpu param pytrees with an
explicit, per-architecture mapping.

Conventions:
* inputs are dicts of numpy arrays (load torch checkpoints with
  ``torch.load(..., map_location="cpu")`` then ``.numpy()`` — see
  :func:`torch_state_dict_to_numpy`);
* conv kernels transpose OIHW -> HWIO, linear kernels transpose (out,in) ->
  (in,out); norm ``weight``/``bias`` become ``scale``/``bias``;
* the SD-checkpoint module remapping (``model.diffusion_model`` -> unet,
  ``first_stage_model`` -> vae, ``cond_stage_model`` -> clip) reproduces
  ``ControlLDM.load_pretrained_sd`` (``model/cldm.py:47-77``);
* ``controlnet_from_unet`` reproduces the zero-pad weight surgery of
  ``ControlLDM.load_controlnet_from_unet`` (``model/cldm.py:84-105``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

Params = Dict[str, Any]


def torch_state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        try:
            # explicit copy: .numpy() VIEWS the torch storage, so a live
            # module would keep mutating the "converted" arrays (e.g. BN
            # running stats during a train-mode forward)
            out[k] = np.array(v.detach().cpu().float().numpy())
        except AttributeError:
            out[k] = np.asarray(v)
    return out


# -- leaf converters ---------------------------------------------------------

def conv(sd: Dict[str, np.ndarray], key: str) -> Params:
    p = {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def linear(sd: Dict[str, np.ndarray], key: str) -> Params:
    p = {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def norm(sd: Dict[str, np.ndarray], key: str) -> Params:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


# -- LDM UNet / ControlNet ---------------------------------------------------

def _resblock(sd, p: str, has_skip: bool) -> Params:
    out = {
        "in_norm": norm(sd, f"{p}.in_layers.0"),
        "in_conv": conv(sd, f"{p}.in_layers.2"),
        "emb_proj": linear(sd, f"{p}.emb_layers.1"),
        "out_norm": norm(sd, f"{p}.out_layers.0"),
        "out_conv": conv(sd, f"{p}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = conv(sd, f"{p}.skip_connection")
    return out


def _cross_attention(sd, p: str) -> Params:
    return {
        "to_q": linear(sd, f"{p}.to_q"),
        "to_k": linear(sd, f"{p}.to_k"),
        "to_v": linear(sd, f"{p}.to_v"),
        "to_out": linear(sd, f"{p}.to_out.0"),
    }


def _transformer_block(sd, p: str) -> Params:
    return {
        "norm1": norm(sd, f"{p}.norm1"),
        "norm2": norm(sd, f"{p}.norm2"),
        "norm3": norm(sd, f"{p}.norm3"),
        "attn1": _cross_attention(sd, f"{p}.attn1"),
        "attn2": _cross_attention(sd, f"{p}.attn2"),
        "ff": {
            "proj": linear(sd, f"{p}.ff.net.0.proj"),
            "out": linear(sd, f"{p}.ff.net.2"),
        },
    }


def _spatial_transformer(sd, p: str, depth: int, use_linear: bool) -> Params:
    proj = linear if use_linear else conv
    out = {
        "norm": norm(sd, f"{p}.norm"),
        "proj_in": proj(sd, f"{p}.proj_in"),
        "proj_out": proj(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        out[f"blocks_{d}"] = _transformer_block(sd, f"{p}.transformer_blocks.{d}")
    return out


def convert_ldm_unet(
    sd: Dict[str, np.ndarray],
    prefix: str = "",
    model_channels: int = 320,
    num_res_blocks: int = 2,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    use_linear_in_transformer: bool = True,
) -> Params:
    """Convert a (prefixed) LDM UNet torch state dict to edtr_tpu params.

    Walks the same construction loop as ``model/unet.py:473-607`` so block
    indices line up exactly.
    """
    pfx = f"{prefix}." if prefix else ""
    P: Params = {
        "time_embed_0": linear(sd, f"{pfx}time_embed.0"),
        "time_embed_2": linear(sd, f"{pfx}time_embed.2"),
        "input_blocks_0_0": conv(sd, f"{pfx}input_blocks.0.0"),
        "out_norm": norm(sd, f"{pfx}out.0"),
        "out_conv": conv(sd, f"{pfx}out.2"),
    }
    blk = 1
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            out_ch = mult * model_channels
            P[f"input_blocks_{blk}_0"] = _resblock(
                sd, f"{pfx}input_blocks.{blk}.0", has_skip=(ch != out_ch)
            )
            ch = out_ch
            if ds in attention_resolutions:
                P[f"input_blocks_{blk}_1"] = _spatial_transformer(
                    sd, f"{pfx}input_blocks.{blk}.1",
                    transformer_depth, use_linear_in_transformer,
                )
            blk += 1
        if level != len(channel_mult) - 1:
            P[f"input_blocks_{blk}_0"] = {"op": conv(sd, f"{pfx}input_blocks.{blk}.0.op")}
            blk += 1
            ds *= 2

    P["middle_block_0"] = _resblock(sd, f"{pfx}middle_block.0", has_skip=False)
    P["middle_block_1"] = _spatial_transformer(
        sd, f"{pfx}middle_block.1", transformer_depth, use_linear_in_transformer
    )
    P["middle_block_2"] = _resblock(sd, f"{pfx}middle_block.2", has_skip=False)

    # decoder
    input_block_chans = [model_channels]
    ch = model_channels
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch = mult * model_channels
            input_block_chans.append(ch)
        if level != len(channel_mult) - 1:
            input_block_chans.append(ch)

    blk = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            ich = input_block_chans.pop()
            out_ch = mult * model_channels
            P[f"output_blocks_{blk}_0"] = _resblock(
                sd, f"{pfx}output_blocks.{blk}.0", has_skip=(ch + ich != out_ch)
            )
            ch = out_ch
            sub = 1
            if (2 ** level) in attention_resolutions:
                P[f"output_blocks_{blk}_{sub}"] = _spatial_transformer(
                    sd, f"{pfx}output_blocks.{blk}.{sub}",
                    transformer_depth, use_linear_in_transformer,
                )
                sub += 1
            if level != 0 and i == num_res_blocks:
                P[f"output_blocks_{blk}_{sub}"] = {
                    "conv": conv(sd, f"{pfx}output_blocks.{blk}.{sub}.conv")
                }
            blk += 1
    return P


def convert_controlnet(
    sd: Dict[str, np.ndarray],
    prefix: str = "",
    model_channels: int = 320,
    num_res_blocks: int = 2,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    use_linear_in_transformer: bool = True,
) -> Params:
    """Convert a ControlNet torch state dict (``model/controlnet.py:44-258``)."""
    pfx = f"{prefix}." if prefix else ""
    P: Params = {
        "time_embed_0": linear(sd, f"{pfx}time_embed.0"),
        "time_embed_2": linear(sd, f"{pfx}time_embed.2"),
        "input_blocks_0_0": conv(sd, f"{pfx}input_blocks.0.0"),
        "zero_convs_0": conv(sd, f"{pfx}zero_convs.0.0"),
        "middle_block_out": conv(sd, f"{pfx}middle_block_out.0"),
    }
    blk = 1
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            out_ch = mult * model_channels
            P[f"input_blocks_{blk}_0"] = _resblock(
                sd, f"{pfx}input_blocks.{blk}.0", has_skip=(ch != out_ch)
            )
            ch = out_ch
            if ds in attention_resolutions:
                P[f"input_blocks_{blk}_1"] = _spatial_transformer(
                    sd, f"{pfx}input_blocks.{blk}.1",
                    transformer_depth, use_linear_in_transformer,
                )
            P[f"zero_convs_{blk}"] = conv(sd, f"{pfx}zero_convs.{blk}.0")
            blk += 1
        if level != len(channel_mult) - 1:
            P[f"input_blocks_{blk}_0"] = {"op": conv(sd, f"{pfx}input_blocks.{blk}.0.op")}
            P[f"zero_convs_{blk}"] = conv(sd, f"{pfx}zero_convs.{blk}.0")
            blk += 1
            ds *= 2

    P["middle_block_0"] = _resblock(sd, f"{pfx}middle_block.0", has_skip=False)
    P["middle_block_1"] = _spatial_transformer(
        sd, f"{pfx}middle_block.1", transformer_depth, use_linear_in_transformer
    )
    P["middle_block_2"] = _resblock(sd, f"{pfx}middle_block.2", has_skip=False)
    return P


def controlnet_from_unet(unet_params: Params, hint_channels: int = 4) -> Params:
    """Initialize ControlNet params from converted UNet params.

    Reproduces ``ControlLDM.load_controlnet_from_unet`` (``model/cldm.py:84-105``):
    copy every encoder/middle tensor, zero-pad the first conv kernel along
    input channels for the hint, zero-init all zero_convs/middle_block_out.
    """
    import jax

    P: Params = {}
    for name, sub in unet_params.items():
        if name.startswith(("input_blocks", "middle_block", "time_embed")):
            P[name] = jax.tree.map(np.array, sub)
    k = np.asarray(P["input_blocks_0_0"]["kernel"])  # (3,3,in,mc)
    pad = np.zeros(k.shape[:2] + (hint_channels, k.shape[3]), dtype=k.dtype)
    P["input_blocks_0_0"] = dict(P["input_blocks_0_0"])
    P["input_blocks_0_0"]["kernel"] = np.concatenate([k, pad], axis=2)

    mc = k.shape[3]
    # zero convs: one per encoder block; channel sizes follow the block chans
    # walk: [mc] + per-level res outs + downsample outs
    # (sizes inferred from the copied blocks to stay config-agnostic)
    idx = 0
    P[f"zero_convs_{idx}"] = _zero_conv_params(mc)
    blk = 1
    while f"input_blocks_{blk}_0" in P:
        sub = P[f"input_blocks_{blk}_0"]
        if "op" in sub:  # downsample
            ch = np.asarray(sub["op"]["kernel"]).shape[3]
        else:
            ch = np.asarray(sub["out_conv"]["kernel"]).shape[3]
        P[f"zero_convs_{blk}"] = _zero_conv_params(ch)
        blk += 1
    mid_ch = np.asarray(P["middle_block_2"]["out_conv"]["kernel"]).shape[3]
    P["middle_block_out"] = _zero_conv_params(mid_ch)
    return P


def _zero_conv_params(ch: int) -> Params:
    return {
        "kernel": np.zeros((1, 1, ch, ch), dtype=np.float32),
        "bias": np.zeros((ch,), dtype=np.float32),
    }


# -- KL-VAE --------------------------------------------------------------------

def _vae_resblock(sd, p: str, has_skip: bool) -> Params:
    out = {
        "norm1": norm(sd, f"{p}.norm1"),
        "conv1": conv(sd, f"{p}.conv1"),
        "norm2": norm(sd, f"{p}.norm2"),
        "conv2": conv(sd, f"{p}.conv2"),
    }
    if has_skip:
        out["nin_shortcut"] = conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p: str) -> Params:
    return {
        "norm": norm(sd, f"{p}.norm"),
        "q": conv(sd, f"{p}.q"),
        "k": conv(sd, f"{p}.k"),
        "v": conv(sd, f"{p}.v"),
        "proj_out": conv(sd, f"{p}.proj_out"),
    }


def convert_vae_encoder(
    sd, prefix: str = "encoder",
    ch: int = 128, ch_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
) -> Params:
    """Parity: ``Encoder`` (``model/vae.py:326-446``)."""
    if prefix == "":
        sd = {f"x.{k}": v for k, v in sd.items()}
        prefix = "x"
    p = prefix
    P: Params = {
        "conv_in": conv(sd, f"{p}.conv_in"),
        "mid_block_1": _vae_resblock(sd, f"{p}.mid.block_1", False),
        "mid_attn_1": _vae_attn(sd, f"{p}.mid.attn_1"),
        "mid_block_2": _vae_resblock(sd, f"{p}.mid.block_2", False),
        "norm_out": norm(sd, f"{p}.norm_out"),
        "conv_out": conv(sd, f"{p}.conv_out"),
    }
    in_mult = (1,) + tuple(ch_mult)
    for i_level, mult in enumerate(ch_mult):
        block_in = ch * in_mult[i_level]
        block_out = ch * mult
        for i_block in range(num_res_blocks):
            P[f"down_{i_level}_block_{i_block}"] = _vae_resblock(
                sd, f"{p}.down.{i_level}.block.{i_block}", has_skip=(block_in != block_out)
            )
            block_in = block_out
        if i_level != len(ch_mult) - 1:
            P[f"down_{i_level}_downsample"] = {
                "conv": conv(sd, f"{p}.down.{i_level}.downsample.conv")
            }
    return P


def convert_vae_decoder(
    sd, prefix: str = "decoder",
    ch: int = 128, ch_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
) -> Params:
    """Parity: ``Decoder`` (``model/vae.py:449-560``)."""
    if prefix == "":
        sd = {f"x.{k}": v for k, v in sd.items()}
        prefix = "x"
    p = prefix
    P: Params = {
        "conv_in": conv(sd, f"{p}.conv_in"),
        "mid_block_1": _vae_resblock(sd, f"{p}.mid.block_1", False),
        "mid_attn_1": _vae_attn(sd, f"{p}.mid.attn_1"),
        "mid_block_2": _vae_resblock(sd, f"{p}.mid.block_2", False),
        "norm_out": norm(sd, f"{p}.norm_out"),
        "conv_out": conv(sd, f"{p}.conv_out"),
    }
    block_in = ch * ch_mult[-1]
    for i_level in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[i_level]
        for i_block in range(num_res_blocks + 1):
            P[f"up_{i_level}_block_{i_block}"] = _vae_resblock(
                sd, f"{p}.up.{i_level}.block.{i_block}", has_skip=(block_in != block_out)
            )
            block_in = block_out
        if i_level != 0:
            P[f"up_{i_level}_upsample"] = {
                "conv": conv(sd, f"{p}.up.{i_level}.upsample.conv")
            }
    return P


def convert_autoencoder_kl(
    sd, ch: int = 128, ch_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
) -> Params:
    """Convert a full ``AutoencoderKL`` state dict (``model/vae.py:681-743``)."""
    return {
        "encoder": convert_vae_encoder(sd, "encoder", ch, ch_mult, num_res_blocks),
        "decoder": convert_vae_decoder(sd, "decoder", ch, ch_mult, num_res_blocks),
        "quant_conv": conv(sd, "quant_conv"),
        "post_quant_conv": conv(sd, "post_quant_conv"),
    }


# -- torchvision-family task networks -------------------------------------------
#
# These return {"params": ..., "batch_stats": ...} (full flax variables):
# torch BatchNorm weight/bias -> params scale/bias; running_mean/var ->
# batch_stats (FrozenBatchNorm2d in the detection nets maps identically).

def _bn(sd, key):
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }
    return params, stats


def convert_resnet(sd, prefix: str = "", type: int = 18) -> Params:
    """ResNet (``model/resnet.py``) -> full variables dict."""
    layers = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
              101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[type]
    bottleneck = type >= 50
    pfx = f"{prefix}." if prefix else ""
    P: Params = {"conv1": conv(sd, f"{pfx}conv1")}
    S: Params = {}
    P["bn1"], S["bn1"] = _bn(sd, f"{pfx}bn1")
    if f"{pfx}fc.weight" in sd:
        P["fc"] = linear(sd, f"{pfx}fc")
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            bp = f"{pfx}layer{li}.{bi}"
            name = f"layer{li}_{bi}"
            blk_p: Params = {}
            blk_s: Params = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = conv(sd, f"{bp}.conv{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = _bn(sd, f"{bp}.bn{ci}")
            if f"{bp}.downsample.0.weight" in sd:
                blk_p["downsample_0"] = conv(sd, f"{bp}.downsample.0")
                blk_p["downsample_1"], blk_s["downsample_1"] = _bn(sd, f"{bp}.downsample.1")
            P[name] = blk_p
            S[name] = blk_s
    return {"params": P, "batch_stats": S}


def _convbnact(sd, key):
    p = {"conv": conv(sd, f"{key}.0")}
    s = {}
    p["bn"], s["bn"] = _bn(sd, f"{key}.1")
    return p, s


def convert_mobilenetv3(sd, prefix: str = "", with_classifier: bool = True) -> Params:
    """MobileNetV3-Large (``model/mobilenetv3.py``) -> full variables dict."""
    pfx = f"{prefix}." if prefix else ""
    P: Params = {}
    S: Params = {}
    P["features_0"], S["features_0"] = _convbnact(sd, f"{pfx}features.0")
    bi = 1
    while f"{pfx}features.{bi}.block.0.0.weight" in sd:
        blk_p: Params = {}
        blk_s: Params = {}
        j = 0
        while True:
            base = f"{pfx}features.{bi}.block.{j}"
            if f"{base}.0.weight" in sd:
                blk_p[f"block_{j}"], blk_s[f"block_{j}"] = _convbnact(sd, base)
            elif f"{base}.fc1.weight" in sd:
                blk_p[f"block_{j}"] = {
                    "fc1": conv(sd, f"{base}.fc1"),
                    "fc2": conv(sd, f"{base}.fc2"),
                }
            else:
                break
            j += 1
        P[f"features_{bi}"] = blk_p
        if blk_s:
            S[f"features_{bi}"] = blk_s
        bi += 1
    last = f"{pfx}features.{bi}"
    if f"{last}.0.weight" in sd:
        P[f"features_{bi}"], S[f"features_{bi}"] = _convbnact(sd, last)
    if with_classifier and f"{pfx}classifier.0.weight" in sd:
        P["classifier_0"] = linear(sd, f"{pfx}classifier.0")
        P["classifier_3"] = linear(sd, f"{pfx}classifier.3")
    return {"params": P, "batch_stats": S}


def _nchw_flat_linear(sd, key: str, c: int, h: int, w: int) -> Params:
    """Linear whose torch input is flatten(NCHW) but ours is flatten(NHWC).

    torch box heads flatten pooled RoI maps channel-major (c*H*W + y*W + x);
    our NHWC reshape is spatial-major ((y*W + x)*C + c) — reorder the kernel
    rows accordingly so converted weights see the right features.
    """
    p = linear(sd, key)
    k = p["kernel"]  # (c*h*w, out)
    p["kernel"] = (
        k.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(c * h * w, -1)
    )
    return p


def convert_fasterrcnn_mobilenet(sd) -> Params:
    """FasterRCNN mobilenet-FPN detnet checkpoint -> full variables dict.

    Parity: the reference's released ``detnet_*.pt`` state dicts
    (``model/faster_rcnn.py:733-795`` architecture).
    """
    # IntermediateLayerGetter flattens `features` out of the key path
    sd = dict(sd)
    for k in list(sd):
        if k.startswith("backbone.body.") and not k.startswith("backbone.body.features."):
            sd["backbone.body.features." + k[len("backbone.body."):]] = sd.pop(k)
    body = convert_mobilenetv3(sd, prefix="backbone.body", with_classifier=False)
    P: Params = {"body": body["params"]}
    S: Params = {"body": body["batch_stats"]}

    fpn: Params = {}
    i = 0
    while f"backbone.fpn.inner_blocks.{i}.0.weight" in sd:
        fpn[f"inner_{i}"] = conv(sd, f"backbone.fpn.inner_blocks.{i}.0")
        fpn[f"layer_{i}"] = conv(sd, f"backbone.fpn.layer_blocks.{i}.0")
        i += 1
    P["fpn"] = fpn

    rpn: Params = {}
    if "rpn.head.conv.0.0.weight" in sd:
        rpn["conv_0"] = conv(sd, "rpn.head.conv.0.0")
    else:  # pre-v2 layout
        rpn["conv_0"] = conv(sd, "rpn.head.conv")
    if "rpn.head.conv.1.0.weight" in sd:
        rpn["conv_1"] = conv(sd, "rpn.head.conv.1.0")
    rpn["cls_logits"] = conv(sd, "rpn.head.cls_logits")
    rpn["bbox_pred"] = conv(sd, "rpn.head.bbox_pred")
    P["rpn_head"] = rpn

    P["box_head"] = {
        "fc6": _nchw_flat_linear(sd, "roi_heads.box_head.fc6", 256, 7, 7),
        "fc7": linear(sd, "roi_heads.box_head.fc7"),
    }
    P["box_predictor"] = {
        "cls_score": linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    return {"params": P, "batch_stats": S}


def convert_fasterrcnn_resnet50_v2(sd) -> Params:
    """FasterRCNN ResNet50-FPN **v2** checkpoint -> full variables dict.

    Parity: ``fasterrcnn_resnet50_fpn_v2`` (model/faster_rcnn.py:939-1003):
    resnet50 body (``backbone.body.*``), FPN with BatchNorm
    (``backbone.fpn.{inner,layer}_blocks.{i}.{0=conv,1=bn}``), 2-deep RPN
    head (``rpn.head.conv.{0,1}.0``), ConvFC box head
    (``roi_heads.box_head.{0..3}.{0=conv,1=bn}`` + ``.5`` linear after the
    Flatten at index 4), and the usual predictor. Used for the reference's
    COCO checkpoints (``FasterRCNN_ResNet50_FPN_V2_Weights_COCO_V1.pt``,
    utils/common.py:306-334 load path).
    """
    body = convert_resnet(sd, prefix="backbone.body", type=50)
    P: Params = {"body": body["params"]}
    S: Params = {"body": body["batch_stats"]}

    fpn_p: Params = {}
    fpn_s: Params = {}
    i = 0
    while f"backbone.fpn.inner_blocks.{i}.0.weight" in sd:
        fpn_p[f"inner_{i}"] = conv(sd, f"backbone.fpn.inner_blocks.{i}.0")
        fpn_p[f"inner_bn_{i}"], fpn_s[f"inner_bn_{i}"] = _bn(
            sd, f"backbone.fpn.inner_blocks.{i}.1")
        fpn_p[f"layer_{i}"] = conv(sd, f"backbone.fpn.layer_blocks.{i}.0")
        fpn_p[f"layer_bn_{i}"], fpn_s[f"layer_bn_{i}"] = _bn(
            sd, f"backbone.fpn.layer_blocks.{i}.1")
        i += 1
    P["fpn"] = fpn_p
    S["fpn"] = fpn_s

    rpn: Params = {
        "conv_0": conv(sd, "rpn.head.conv.0.0"),
        "conv_1": conv(sd, "rpn.head.conv.1.0"),
        "cls_logits": conv(sd, "rpn.head.cls_logits"),
        "bbox_pred": conv(sd, "rpn.head.bbox_pred"),
    }
    P["rpn_head"] = rpn

    head_p: Params = {}
    head_s: Params = {}
    for j in range(4):
        head_p[f"conv_{j}"] = conv(sd, f"roi_heads.box_head.{j}.0")
        head_p[f"bn_{j}"], head_s[f"bn_{j}"] = _bn(sd, f"roi_heads.box_head.{j}.1")
    head_p["fc"] = _nchw_flat_linear(sd, "roi_heads.box_head.5", 256, 7, 7)
    P["box_head"] = head_p
    S["box_head"] = head_s

    P["box_predictor"] = {
        "cls_score": linear(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": linear(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    return {"params": P, "batch_stats": S}


def convert_deeplabv3_mobilenet(sd) -> Params:
    """DeepLabV3-MobileNetV3 segnet checkpoint -> full variables dict.

    torch keys: backbone.{feature idx}..., classifier.{0..4}, aux_classifier
    (IntermediateLayerGetter flattens ``features`` out of the key path).
    """
    sd = dict(sd)
    for k in list(sd):
        if k.startswith("backbone.") and not k.startswith("backbone.features."):
            sd["backbone.features." + k[len("backbone."):]] = sd.pop(k)
    body = convert_mobilenetv3(sd, prefix="backbone", with_classifier=False)
    P: Params = {"backbone": body["params"]}
    S: Params = {"backbone": body["batch_stats"]}

    # classifier = DeepLabHead: 0=ASPP, 1=conv3x3, 2=bn, 3=relu, 4=conv1x1
    aspp_p: Params = {}
    aspp_s: Params = {}
    i = 0
    while f"classifier.0.convs.{i}.0.weight" in sd:
        aspp_p[f"convs_{i}"], aspp_s[f"convs_{i}"] = _convbnact(sd, f"classifier.0.convs.{i}")
        i += 1
    # the pooling branch: convs.{last}.1 is the conv (after AdaptiveAvgPool)
    last = i
    if f"classifier.0.convs.{last}.1.weight" in sd:
        p = {"conv": conv(sd, f"classifier.0.convs.{last}.1")}
        s = {}
        p["bn"], s["bn"] = _bn(sd, f"classifier.0.convs.{last}.2")
        aspp_p[f"convs_{last}"] = p
        aspp_s[f"convs_{last}"] = s
    proj_p = {"conv": conv(sd, "classifier.0.project.0")}
    proj_s = {}
    proj_p["bn"], proj_s["bn"] = _bn(sd, "classifier.0.project.1")
    aspp_p["project"] = proj_p
    aspp_s["project"] = proj_s

    head_p = {"conv": conv(sd, "classifier.1")}
    head_s = {}
    head_p["bn"], head_s["bn"] = _bn(sd, "classifier.2")
    P["classifier"] = {"aspp": aspp_p, "head": head_p, "out": conv(sd, "classifier.4")}
    S["classifier"] = {"aspp": aspp_s, "head": head_s}

    if "aux_classifier.0.weight" in sd:
        aux_p = {"head": {"conv": conv(sd, "aux_classifier.0")}}
        aux_s = {"head": {}}
        aux_p["head"]["bn"], aux_s["head"]["bn"] = _bn(sd, "aux_classifier.1")
        aux_p["out"] = conv(sd, "aux_classifier.4")
        P["aux_classifier"] = aux_p
        S["aux_classifier"] = aux_s
    return {"params": P, "batch_stats": S}


# -- SwinIR ----------------------------------------------------------------------

def convert_swinir(
    sd,
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6),
    unshuffle: bool = True,
    upsampler: str = "nearest+conv",
    sf: int = 8,
    patch_norm: bool = True,
) -> Params:
    """Convert a SwinIR state dict (``model/swinir.py:627-894``)."""
    P: Params = {
        "norm": norm(sd, "norm"),
        "conv_after_body": conv(sd, "conv_after_body"),
        "conv_last": conv(sd, "conv_last"),
    }
    if unshuffle:
        P["conv_first_1"] = conv(sd, "conv_first.1")
    else:
        P["conv_first"] = conv(sd, "conv_first")
    if patch_norm:
        P["patch_embed_norm"] = norm(sd, "patch_embed.norm")
    for i, depth in enumerate(depths):
        L: Params = {"conv": conv(sd, f"layers.{i}.conv")}
        for j in range(depth):
            bp = f"layers.{i}.residual_group.blocks.{j}"
            L[f"blocks_{j}"] = {
                "norm1": norm(sd, f"{bp}.norm1"),
                "norm2": norm(sd, f"{bp}.norm2"),
                "attn": {
                    "qkv": linear(sd, f"{bp}.attn.qkv"),
                    "proj": linear(sd, f"{bp}.attn.proj"),
                    "relative_position_bias_table": sd[
                        f"{bp}.attn.relative_position_bias_table"
                    ],
                },
                "mlp": {
                    "fc1": linear(sd, f"{bp}.mlp.fc1"),
                    "fc2": linear(sd, f"{bp}.mlp.fc2"),
                },
            }
        P[f"layers_{i}"] = L
    if upsampler == "nearest+conv":
        P["conv_before_upsample_0"] = conv(sd, "conv_before_upsample.0")
        P["conv_up1"] = conv(sd, "conv_up1")
        if sf >= 4:
            P["conv_up2"] = conv(sd, "conv_up2")
        if sf == 8:
            P["conv_up3"] = conv(sd, "conv_up3")
        P["conv_hr"] = conv(sd, "conv_hr")
    elif upsampler == "pixelshuffle":
        P["conv_before_upsample_0"] = conv(sd, "conv_before_upsample.0")
        n_up = {2: 1, 4: 2, 8: 3}[sf]
        for i in range(n_up):
            P[f"upsample_{i * 2}"] = conv(sd, f"upsample.{i * 2}")
    return P


# -- OpenCLIP text tower -------------------------------------------------------

def convert_clip_text(sd, prefix: str = "model", layers: int = 24) -> Params:
    """Convert the OpenCLIP text transformer (``cond_stage_model.model.*``).

    The fused torch ``in_proj_weight`` (3W, W) splits into q/k/v kernels.
    Parity: ``model/open_clip/transformer.py:199-254`` + ``model/clip.py``.
    """
    pfx = f"{prefix}." if prefix else ""
    P: Params = {
        "token_embedding": sd[f"{pfx}token_embedding.weight"],
        "positional_embedding": sd[f"{pfx}positional_embedding"],
        "ln_final": norm(sd, f"{pfx}ln_final"),
    }
    for i in range(layers):
        rp = f"{pfx}transformer.resblocks.{i}"
        if f"{rp}.ln_1.weight" not in sd:
            break
        w = sd[f"{rp}.attn.in_proj_weight"]
        b = sd[f"{rp}.attn.in_proj_bias"]
        width = w.shape[1]
        qw, kw, vw = w[:width], w[width : 2 * width], w[2 * width :]
        qb, kb, vb = b[:width], b[width : 2 * width], b[2 * width :]
        P[f"resblocks_{i}"] = {
            "ln_1": norm(sd, f"{rp}.ln_1"),
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": linear(sd, f"{rp}.attn.out_proj"),
            "ln_2": norm(sd, f"{rp}.ln_2"),
            "c_fc": linear(sd, f"{rp}.mlp.c_fc"),
            "c_proj": linear(sd, f"{rp}.mlp.c_proj"),
        }
    return P


# -- SD checkpoint module split ----------------------------------------------

SD_MODULE_MAP = {
    "unet": "model.diffusion_model",
    "vae": "first_stage_model",
    "clip": "cond_stage_model",
}


def split_sd_checkpoint(
    sd: Dict[str, np.ndarray], is_turbo: bool = False
) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a full SD2.1 checkpoint into unet/vae/clip sub-dicts.

    Parity: ``ControlLDM.load_pretrained_sd`` key remap (``model/cldm.py:48-66``).
    """
    module_map = dict(SD_MODULE_MAP)
    if is_turbo:
        module_map["clip"] = "conditioner.embedders.0"
    out: Dict[str, Dict[str, np.ndarray]] = {k: {} for k in module_map}
    for key, value in sd.items():
        for name, pfx in module_map.items():
            if key.startswith(pfx + "."):
                out[name][key[len(pfx) + 1:]] = value
                break
    return out


# indices of the conv modules inside each lpips-package slice Sequential
_LPIPS_ALEX_SLICES = {0: "slice1.0", 1: "slice2.3", 2: "slice3.6",
                      3: "slice4.8", 4: "slice5.10"}
_LPIPS_VGG_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_LPIPS_VGG_SLICE_START = {0: 0, 1: 4, 2: 9, 3: 16, 4: 23}  # features idx per slice


def convert_lpips(sd, net: str = "alex") -> Params:
    """``lpips.LPIPS(net=...)`` full state dict -> models/lpips.py params.

    The package keeps torchvision feature indices inside each slice
    Sequential (``net.slice1.0.weight`` ...), and its learned heads as
    ``lin{i}.model.1.weight`` (1,C,1,1, no bias). OIHW -> HWIO throughout.
    """
    sd = torch_state_dict_to_numpy(sd)
    tower: Params = {}
    if net == "alex":
        for ci, loc in _LPIPS_ALEX_SLICES.items():
            tower[f"conv{ci}"] = {
                "kernel": sd[f"net.{loc}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"net.{loc}.bias"],
            }
    else:  # vgg16
        slice_of = sorted(_LPIPS_VGG_SLICE_START.items())
        for ci, fi in enumerate(_LPIPS_VGG_CONV_IDX):
            si = max(s for s, start in slice_of if start <= fi)
            key = f"net.slice{si + 1}.{fi}"
            tower[f"conv{ci}"] = {
                "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"{key}.bias"],
            }
    params: Params = {"tower": tower}
    for i in range(5):
        # dropout(0) is model.0; the 1x1 conv is model.1
        w = sd.get(f"lin{i}.model.1.weight", sd.get(f"lins.{i}.model.1.weight"))
        params[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return params


def convert_plain_cnn(sd) -> Params:
    """Generic torch->flax conversion for CNNs whose flax module names mirror
    the torch attribute names with Sequential indices merged by underscore
    (``RRDB_trunk.0.RDB1.conv1`` -> ``RRDB_trunk_0 / RDB1 / conv1``).
    4-D weights transpose OIHW->HWIO; 1-/2-D pass through as bias/kernel.
    """
    params: Params = {}
    for k, v in torch_state_dict_to_numpy(sd).items():
        parts = k.split(".")
        names: list = []
        for p in parts[:-1]:
            if p.isdigit() and names:
                names[-1] = f"{names[-1]}_{p}"
            else:
                names.append(p)
        node = params
        for n in names:
            node = node.setdefault(n, {})
        leaf = parts[-1]
        if leaf == "weight" and v.ndim == 4:
            node["kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and v.ndim == 2:
            node["kernel"] = v.T
        else:
            node[leaf] = v
    return params


def convert_rrdbnet(sd) -> Params:
    """BSRNet/RRDBNet state dict -> models/bsrnet.py params
    (``model/bsrnet.py:75-113``: conv_first[.1], RRDB_trunk.{i}.RDB{j}.conv{k},
    trunk_conv, upconv1/2, HRconv, conv_last)."""
    return convert_plain_cnn(sd)


def convert_edsr(sd, n_resblocks: int = 32, unshuffle: bool = False) -> Params:
    """EDSR state dict -> models/edsr.py params (``model/edsr.py:79-129``).

    sub_mean/add_mean are fixed DIV2K MeanShift convs — folded into the flax
    module's constant mean math, so their keys are skipped. body.{i}.body.0/2
    -> body_{i}.conv1/conv2; tail.0.{2j} (Upsampler convs) -> up_{j};
    tail.1 -> tail; head.{1 if unshuffle else 0} -> head.
    """
    sdn = torch_state_dict_to_numpy(sd)

    def cv(key: str) -> Params:
        return {
            "kernel": sdn[f"{key}.weight"].transpose(2, 3, 1, 0),
            "bias": sdn[f"{key}.bias"],
        }

    params: Params = {"head": cv("head.1" if unshuffle else "head.0")}
    for i in range(n_resblocks):
        params[f"body_{i}"] = {
            "conv1": cv(f"body.{i}.body.0"),
            "conv2": cv(f"body.{i}.body.2"),
        }
    params["body_conv"] = cv(f"body.{n_resblocks}")
    up_keys = sorted(
        (k for k in sdn if k.startswith("tail.0.") and k.endswith(".weight")),
        key=lambda s: int(s.split(".")[2]),
    )
    for j, k in enumerate(up_keys):
        params[f"up_{j}"] = cv(k[: -len(".weight")])
    params["tail"] = cv("tail.1")
    return params


def convert_scunet(sd) -> Params:
    """SCUNet state dict -> models/scunet.py params (``model/scunet.py``).

    Stage Sequentials map as: the trailing strided conv of each m_down ->
    ``_pool``; the leading ConvTranspose of each m_up -> ``_t`` (block
    indices shift down by one); ``m_head.0``/``m_tail.0`` drop the index.
    LayerNorm 1-D weights -> flax "scale"; WMSA relative_position_params
    copy through; ConvTranspose IOHW -> HWIO.
    """
    params: Params = {}
    for k, v in torch_state_dict_to_numpy(sd).items():
        parts = k.split(".")
        top, idx, rest = parts[0], int(parts[1]), parts[2:]
        is_block = len(rest) > 1  # bare convs end as `m_X.i.weight`
        if top in ("m_head", "m_tail"):
            names = [top]
        elif top.startswith("m_down") and not is_block:
            names = [f"{top}_pool"]
        elif top.startswith("m_up"):
            names = [f"{top}_t"] if not is_block else [f"{top}_{idx - 1}"]
        else:
            names = [f"{top}_{idx}"]
        for p in rest[:-1]:
            if p.isdigit():
                names[-1] = f"{names[-1]}_{p}"
            else:
                names.append(p)
        node = params
        for n in names:
            node = node.setdefault(n, {})
        leaf = rest[-1] if rest else parts[-1]
        if leaf == "weight" and v.ndim == 4:
            if top.startswith("m_up") and not is_block:
                # torch ConvTranspose2d (IOHW, true transposed conv) ->
                # flax ConvTranspose (HWIO, transpose_kernel=False):
                # spatial flip + IOHW->HWIO is exact
                node["kernel"] = np.ascontiguousarray(
                    v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
                )
            else:
                node["kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and v.ndim == 2:
            node["kernel"] = v.T
        elif leaf == "weight" and v.ndim == 1:
            node["scale"] = v
        else:
            node[leaf] = v
    return params


def convert_skunet(sd) -> Params:
    """SKUNet state dict -> models/skunet.py variables (``model/skunet.py``).

    torch wraps each selective conv in ``maxpool_conv.1`` (down path) or
    ``conv`` (up path) Sequential shells that the flax modules inline, and
    ``selector.fc`` is a one-layer Sequential (``fc.0``). BatchNorm splits
    into params (scale/bias) + batch_stats (mean/var).
    """
    params: Params = {}
    stats: Params = {}
    for k, v in torch_state_dict_to_numpy(sd).items():
        if k.endswith("num_batches_tracked"):
            continue
        parts = [p for p in k.split(".") if p not in ("maxpool_conv", "conv")]
        parts = [p for p in parts if not p.isdigit()]
        names, leaf = parts[:-1], parts[-1]
        if leaf in ("running_mean", "running_var"):
            node = stats
            leaf = {"running_mean": "mean", "running_var": "var"}[leaf]
        else:
            node = params
        for n in names:
            node = node.setdefault(n, {})
        # the torch Selector flattens its 4x4 pooled map channel-major
        # ((b, c, 4, 4).view(b, -1)); the NHWC module flattens spatial-major.
        # Permute the fc rows / att_conv columns so both orderings agree.
        sel = ".selector." in k
        if leaf == "weight" and v.ndim == 4:
            node["kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and v.ndim == 2:
            w = v.T  # (in, out)
            if sel and names[-1] == "fc":
                w = w[_sel_perm(w.shape[0])]
            elif sel and names[-1].startswith("att_conv"):
                w = w[:, _sel_perm(w.shape[1])]
            node["kernel"] = w
        elif leaf == "weight" and v.ndim == 1:
            node["scale"] = v
        elif leaf == "bias" and sel and names[-1].startswith("att_conv"):
            node["bias"] = v[_sel_perm(v.shape[0])]
        else:
            node[leaf] = v
    return {"params": params, "batch_stats": stats}


def _sel_perm(n: int, sa: int = 4) -> np.ndarray:
    """Index map from NHWC spatial-major flatten (s*C + c) to the torch
    Selector's channel-major flatten (c*sa^2 + s)."""
    c = n // (sa * sa)
    m = np.arange(n)
    return (m % c) * sa * sa + m // c


# ---------------------------------------------------------------------------
# SwinIR lane padding (round 5; VERDICT r4 next #2)
# ---------------------------------------------------------------------------

def pad_swinir_lanes(params: Params, lane_pad: int = 12,
                     heads: int = 6) -> Params:
    """Zero-pad a converted SwinIR param tree from ``embed_dim`` to
    ``embed_dim + lane_pad`` channels (flagship: 180 -> 192 = 1.5x128
    lanes, head dim 30 -> 32).

    Exactness contract (models/swinir.py ``lane_pad`` field): every padded
    weight/bias/LN-affine entry is ZERO, so padded activation channels are
    zero everywhere, raw channel sums are unchanged, and the padded net
    computes the identical function (LN divisors and the softmax scale keep
    the real dims inside the module). The residual stream pads at the END
    of the channel axis; attention q/k/v and the proj INPUT pad PER HEAD
    (channel h*d+j -> h*d_new+j).

    Works on any converted/init'd tree of the SwinIR module (torch
    checkpoints via :func:`convert_swinir` first).
    """
    import jax

    p = jax.tree.map(np.asarray, params)
    c = p["conv_after_body"]["kernel"].shape[-1]
    cp = c + lane_pad
    d_old, d_new = c // heads, cp // heads
    assert heads * d_old == c and heads * d_new == cp, (c, cp, heads)

    def pad_to(a, axis, n):
        w = [(0, 0)] * a.ndim
        w[axis] = (0, n - a.shape[axis])
        return np.pad(a, w)

    def pad_heads(a, axis, segs):
        shp = list(a.shape)
        shp[axis:axis + 1] = [segs, heads, d_old]
        a = a.reshape(shp)
        w = [(0, 0)] * a.ndim
        w[axis + 2] = (0, d_new - d_old)
        a = np.pad(a, w)
        shp2 = list(a.shape)
        shp2[axis:axis + 3] = [segs * heads * d_new]
        return a.reshape(shp2)

    def pad_ln(node):
        return {k: pad_to(v, 0, cp) for k, v in node.items()}

    out: Params = {}
    for key, node in p.items():
        if key in ("patch_embed_norm", "norm"):
            out[key] = pad_ln(node)
        elif key in ("conv_first", "conv_first_1"):
            out[key] = {"kernel": pad_to(node["kernel"], 3, cp),
                        "bias": pad_to(node["bias"], 0, cp)}
        elif key == "conv_after_body":
            out[key] = {"kernel": pad_to(pad_to(node["kernel"], 2, cp), 3, cp),
                        "bias": pad_to(node["bias"], 0, cp)}
        elif key == "conv_before_upsample_0":
            out[key] = {"kernel": pad_to(node["kernel"], 2, cp),
                        "bias": node["bias"]}
        elif key.startswith("layers_"):
            layer: Params = {}
            for bkey, bnode in node.items():
                if bkey == "conv":
                    layer[bkey] = {
                        "kernel": pad_to(pad_to(bnode["kernel"], 2, cp), 3, cp),
                        "bias": pad_to(bnode["bias"], 0, cp)}
                    continue
                blk: Params = {}
                for name, sub in bnode.items():
                    if name in ("norm1", "norm2"):
                        blk[name] = pad_ln(sub)
                    elif name == "attn":
                        hidden = None
                        qkv = {"kernel": pad_heads(
                            pad_to(sub["qkv"]["kernel"], 0, cp), 1, 3)}
                        if "bias" in sub["qkv"]:
                            qkv["bias"] = pad_heads(sub["qkv"]["bias"], 0, 3)
                        blk[name] = {
                            "qkv": qkv,
                            "proj": {
                                "kernel": pad_to(
                                    pad_heads(sub["proj"]["kernel"], 0, 1),
                                    1, cp),
                                "bias": pad_to(sub["proj"]["bias"], 0, cp)},
                            "relative_position_bias_table":
                                sub["relative_position_bias_table"],
                        }
                    elif name == "mlp":
                        h_old = sub["fc1"]["kernel"].shape[1]
                        h_new = h_old + lane_pad * (h_old // c)
                        blk[name] = {
                            "fc1": {"kernel": pad_to(pad_to(
                                sub["fc1"]["kernel"], 0, cp), 1, h_new),
                                "bias": pad_to(sub["fc1"]["bias"], 0, h_new)},
                            "fc2": {"kernel": pad_to(pad_to(
                                sub["fc2"]["kernel"], 0, h_new), 1, cp),
                                "bias": pad_to(sub["fc2"]["bias"], 0, cp)},
                        }
                    else:
                        blk[name] = sub
                layer[bkey] = blk
            out[key] = layer
        else:
            out[key] = node
    return out
