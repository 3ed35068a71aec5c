"""torchvision → flax weight conversion for the ResNet camera encoder.

Parity: pc_processor/models/pmf_net.py:69-72 — the reference copies the
ImageNet-pretrained torchvision state_dict into the encoder, keeping the
7×7 conv1 weights in a stride-1 conv. Here we convert a torchvision
ResNet state_dict (a `.pth` of tensors, or an `.npz` with the same key
names) into our flax parameter tree:

  conv weights:  torch [O, I, Kh, Kw] → flax [Kh, Kw, I, O] (nested
                 under the Conv wrapper's inner scope `Conv_0`)
  bn params:     weight→scale, bias→bias; running stats → batch_stats
  layer naming:  torch layer{s}.{i}.conv{j} → flax layer{s}_{i}/conv{j}
  downsample:    torch layer{s}.{i}.downsample.{0,1} →
                 flax layer{s}_{i}/downsample_{conv,bn}
"""
from __future__ import annotations

import numpy as np


def _load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def convert_resnet_state_dict(sd: dict) -> tuple[dict, dict]:
    """Return (params, batch_stats) flax subtrees for ResNetEncoder."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv_w(v):
        return np.transpose(v, (2, 3, 1, 0))

    for key, v in sd.items():
        v = np.asarray(v)
        parts = key.split(".")
        if parts[0] == "conv1" and parts[1] == "weight":
            put(params, ("conv1", "Conv_0", "kernel"), conv_w(v))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[1], v, put)
        elif parts[0].startswith("layer"):
            stage = parts[0]          # layer1
            blk = parts[1]            # 0..n
            mod = parts[2]            # conv1 / bn1 / downsample
            name = f"{stage}_{blk}"
            if mod.startswith("conv"):
                put(params, (name, mod, "Conv_0", "kernel"), conv_w(v))
            elif mod.startswith("bn"):
                _put_bn(params, stats, (name, mod), parts[3], v, put)
            elif mod == "downsample":
                sub = parts[3]
                if parts[2 + 1] == "0":  # conv
                    put(params, (name, "downsample_conv", "Conv_0", "kernel"),
                        conv_w(v))
                else:  # "1" → bn
                    _put_bn(params, stats, (name, "downsample_bn"),
                            parts[4], v, put)
    return params, stats


def _put_bn(params, stats, prefix, field, v, put):
    # our BatchNorm module wraps flax nn.BatchNorm under scope 'BatchNorm_0'
    p = prefix + ("BatchNorm_0",)
    if field == "weight":
        put(params, p + ("scale",), v)
    elif field == "bias":
        put(params, p + ("bias",), v)
    elif field == "running_mean":
        put(stats, p + ("mean",), v)
    elif field == "running_var":
        put(stats, p + ("var",), v)


# torch nn.Sequential children are anonymous indices; our flax modules name
# them. (parent_module, index) → flax submodule name.
_SEQ_RENAMES = {
    ("fuse_conv", "0"): "fuse_conv", ("fuse_conv", "2"): "fuse_bn",
    ("attention", "0"): "att_conv1", ("attention", "1"): "att_bn1",
    ("attention", "3"): "att_conv2", ("attention", "4"): "att_bn2",
    **{(f"up_{i}a", "0"): f"up_{i}a_conv" for i in (1, 2, 3, 4)},
    **{(f"up_{i}a", "2"): f"up_{i}a_bn" for i in (1, 2, 3, 4)},
    # EPMF extraUpSample: Sequential(Conv, LReLU, BN, PixelShuffle) →
    # nested flax module extraUpSample/{conv,bn}
    ("extraUpSample", "0"): ("extraUpSample", "conv"),
    ("extraUpSample", "2"): ("extraUpSample", "bn"),
}


def _rename_path(parts: tuple) -> tuple:
    out: list = []
    for p in parts:
        if out and (out[-1], p) in _SEQ_RENAMES:
            new = _SEQ_RENAMES[(out[-1], p)]
            out[-1:] = [new] if isinstance(new, str) else list(new)
        else:
            out.append(p)
    return tuple(out)


def convert_generic_state_dict(sd: dict) -> tuple[dict, dict]:
    """Convert a torch state_dict whose module names mirror our flax module
    names (the SalsaNext/PMF/EPMF families are written that way — parity
    with pc_processor/models/{salsanext,pmf_net,epmf_net}.py attribute
    naming) into (params, batch_stats) flax subtrees.

    Convs are detected structurally: a BN prefix owns a `running_mean` key;
    everything else with a `weight` is a conv. Sequential indices are
    renamed via _SEQ_RENAMES.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    bn_prefixes = {k[:-len(".running_mean")] for k in sd
                   if k.endswith(".running_mean")}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(v)
        parts = key.split(".")
        prefix, field = ".".join(parts[:-1]), parts[-1]
        path = _rename_path(tuple(parts[:-1]))
        if field == "bias" and f"{prefix}.conv.weight" in sd:
            # SparseVariantConv extra module-level bias (epmf_net.py:20)
            put(params, path + ("bias",), v)
        elif prefix in bn_prefixes:
            p = path + ("BatchNorm_0",)
            if field == "weight":
                put(params, p + ("scale",), v)
            elif field == "bias":
                put(params, p + ("bias",), v)
            elif field == "running_mean":
                put(stats, p + ("mean",), v)
            elif field == "running_var":
                put(stats, p + ("var",), v)
        else:
            p = path + ("Conv_0",)
            if field == "weight":
                put(params, p + ("kernel",), np.transpose(v, (2, 3, 1, 0)))
            elif field == "bias":
                put(params, p + ("bias",), v)
    return params, stats


def convert_pmf_state_dict(sd: dict) -> tuple[dict, dict]:
    """Full-PMFNet torch→flax conversion (all three streams).

    The camera encoder goes through convert_resnet_state_dict (torchvision
    layer naming); lidar_stream + camera_stream_decoder go through the
    generic converter. Parity: pc_processor/models/pmf_net.py:224-249.
    """
    enc_sd, rest_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("camera_stream_encoder."):
            enc_sd[k[len("camera_stream_encoder."):]] = v
        else:
            rest_sd[k] = v
    p_enc, s_enc = convert_resnet_state_dict(enc_sd)
    params, stats = convert_generic_state_dict(rest_sd)
    params["camera_stream_encoder"] = p_enc
    if s_enc:
        stats["camera_stream_encoder"] = s_enc
    return params, stats


def load_pretrained_resnet_into(variables: dict, path: str, backbone: str,
                                encoder_key: str = "camera_stream_encoder",
                                log=None) -> dict:
    """Load converted torchvision weights into the full model variables.

    Tolerant like the reference partial load (tasks/pmf/main.py:55-66):
    only matching-shape leaves are copied (e.g. a 3-channel conv1 kernel
    only if in_channels == 3).
    """
    import flax

    sd = _load_state_dict(path)
    params, stats = convert_resnet_state_dict(sd)

    var = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") \
        else dict(variables)
    from ..train.checkpoint import partial_load

    merged_p = partial_load(dict(var["params"][encoder_key]), params, log)
    var["params"] = dict(var["params"])
    var["params"][encoder_key] = merged_p
    if "batch_stats" in var and stats:
        merged_s = partial_load(dict(var["batch_stats"][encoder_key]), stats, log)
        var["batch_stats"] = dict(var["batch_stats"])
        var["batch_stats"][encoder_key] = merged_s
    return var
