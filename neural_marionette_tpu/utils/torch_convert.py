"""PyTorch reference checkpoint (.pth state_dict) -> flax param pytree.

Consumes the reference's published checkpoints (e.g.
``pretrained/aist/aist_pretrained.pth`` or
``pretrained/detector/<ds>_detector.pth``) so users can switch frameworks
without retraining.  The reference's module tree (model/kypt_detector.py,
model/hsvrnn_bvh.py, modules/vox_modules.py) maps onto ours as below;
layout transforms:

* Conv3d weight (O, I, D, H, W)        -> flax kernel (D, H, W, I, O)
* ConvTranspose3d weight (I, O, D, H, W) -> flax kernel, spatially FLIPPED
  (torch conv_transpose correlates the kernel forward; lax.conv_transpose
  without transpose_kernel flips it)
* Linear weight (out, in)              -> (in, out)
* GRUCell weight_ih/hh (3H, in)        -> (in, 3H); gate order r|z|n matches
* initial_heatmaps (K, g, g, g)        -> (g, g, g, K)
"""
from __future__ import annotations

from typing import Any

import numpy as np


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _convT_w(w):
    # (I, O, D, H, W) -> (D, H, W, I, O), spatial flip for lax.conv_transpose
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1, ::-1])


def _linear_w(w):
    return np.ascontiguousarray(np.transpose(w))


# flax names inside each block type, keyed by the torch Sequential index
_BASIC = {"block.0": ("Conv_0", _conv_w), "block.1": ("GroupNorm_0", None)}
_POOL = {"stride_conv.0": ("Conv_0", _conv_w),
         "stride_conv.1": ("GroupNorm_0", None)}
_RES = {"res_branch.0": ("Conv_0", _conv_w),
        "res_branch.1": ("GroupNorm_0", None),
        "res_branch.3": ("Conv_1", _conv_w),
        "res_branch.4": ("GroupNorm_1", None),
        "skip_con.0": ("Conv_2", _conv_w),
        "skip_con.1": ("GroupNorm_2", None)}
_UP = {"block.0": ("ConvTranspose_0", _convT_w),
       "block.1": ("GroupNorm_0", None)}

# reference HG attribute -> (flax child name, block table)
_HG = {
    "skip_res1": ("Res3DBlock_0", _RES),
    "encoder_pool1": ("Pool3DBlock_0", _POOL),
    "encoder_res1": ("Res3DBlock_1", _RES),
    "skip_res2": ("Res3DBlock_2", _RES),
    "encoder_pool2": ("Pool3DBlock_1", _POOL),
    "encoder_res2": ("Res3DBlock_3", _RES),
    "skip_res3": ("Res3DBlock_4", _RES),
    "encoder_pool3": ("Pool3DBlock_2", _POOL),
    "encoder_res3": ("Res3DBlock_5", _RES),
    "decoder_res3": ("Res3DBlock_6", _RES),
    "decoder_upsample3": ("Upsample3DBlock_0", _UP),
    "decoder_res2": ("Res3DBlock_7", _RES),
    "decoder_upsample2": ("Upsample3DBlock_1", _UP),
    "decoder_res1": ("Res3DBlock_8", _RES),
    "decoder_upsample1": ("Upsample3DBlock_2", _UP),
}

# feature net Sequential index -> (flax child, table or 'HG')
_FEATURE_NET = {
    "0": ("Basic3DBlock_0", _BASIC),
    "1": ("Pool3DBlock_0", _POOL),
    "2": ("Res3DBlock_0", _RES),
    "3": ("Pool3DBlock_1", _POOL),
    "4": ("Hourglass_0", "HG"),
    "5": ("Res3DBlock_1", _RES),
}

# voxel decoder Sequential index -> flax child in VoxelDecoder_0
_DECODER = {
    "1": ("Conv_0", _conv_w), "2": ("GroupNorm_0", None),
    "4": ("Conv_1", _conv_w), "5": ("GroupNorm_1", None),
    "8": ("Conv_2", _conv_w), "9": ("GroupNorm_2", None),
    "11": ("Conv_3", _conv_w), "12": ("GroupNorm_3", None),
    "14": ("Conv_4", _conv_w),
}

_DYNA_LINEAR = {
    "extract_post_dist.0": "post_l1",
    "extract_post_dist.2": "post_l2",
    "extract_prior_dist.0": "prior_l1",
    "extract_prior_dist.2": "prior_l2",
    "root_intensity_decoder.0": "root_l1",
    "root_intensity_decoder.2": "root_l2",
    "joint_matrix_decoder.0": "joint_l1",
    "joint_matrix_decoder.2": "joint_l2",
}


def _set(tree: dict, path: list[str], leaf_w, leaf_b, w, b) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    if w is not None:
        node[leaf_w] = w
    if b is not None:
        node[leaf_b] = b


def _put_block(tree, base_path, table, sub, param, value):
    """sub e.g. 'res_branch.0', param 'weight'|'bias'."""
    flax_name, transform = table[sub]
    is_conv = transform is not None
    if param == "weight":
        value = transform(value) if is_conv else value
        leaf = "kernel" if is_conv else "scale"
        _set(tree, base_path + [flax_name], leaf, None, value, None)
    elif flax_name.startswith("ConvTranspose"):
        # our Upsample3DBlock holds the (output-padding-aware) bias at
        # block level rather than inside flax ConvTranspose
        _set(tree, base_path, "bias", None, value, None)
    else:
        _set(tree, base_path + [flax_name], "bias", None, value, None)


def convert_reference_state_dict(state_dict: dict[str, Any]) -> dict:
    """Reference ``network.state_dict()`` -> flax ``{'params': ...}``."""
    tree: dict = {}

    def put_conv_module(base_path, table, rest, param, value):
        # rest like '0.block.0' for Sequential of blocks, or 'block.0'
        parts = rest.split(".")
        if table is _FEATURE_NET:
            child, sub_table = _FEATURE_NET[parts[0]]
            if sub_table == "HG":
                attr = parts[1]
                sub_child, sub_sub = _HG[attr]
                _put_block(tree, base_path + [child, sub_child], sub_sub,
                           ".".join(parts[2:]), param, value)
            else:
                _put_block(tree, base_path + [child], sub_table,
                           ".".join(parts[1:]), param, value)
        else:
            _put_block(tree, base_path, table, rest, param, value)

    for key, tensor in state_dict.items():
        value = np.asarray(tensor, dtype=np.float32)
        parts = key.split(".")
        param = parts[-1]

        if parts[0] == "kypt_detector":
            det = ["kypt_detector"]
            if parts[1] == "affinity_params":
                _set(tree, det, "affinity_params", None, value, None)
            elif parts[1] == "vox_to_kypt":
                v2k = det + ["vox_to_kypt"]
                mod = parts[2]
                rest = ".".join(parts[3:-1])
                if mod == "extract_features":
                    put_conv_module(v2k + ["extract_features"], _FEATURE_NET,
                                    ".".join(parts[3:-1]), param, value)
                elif mod == "extract_spatio_temporal_features":
                    put_conv_module(v2k + ["extract_st_features"],
                                    _FEATURE_NET, ".".join(parts[3:-1]),
                                    param, value)
                elif mod == "extract_heatmaps_from_features":
                    w = _conv_w(value) if param == "weight" else value
                    _set(tree, v2k + ["extract_heatmaps", "Conv_0"],
                         "kernel" if param == "weight" else "bias", None,
                         w, None)
                elif mod == "extract_spatio_temporal_heatmaps_from_features":
                    w = _conv_w(value) if param == "weight" else value
                    _set(tree, v2k + ["extract_st_heatmaps", "Conv_0"],
                         "kernel" if param == "weight" else "bias", None,
                         w, None)
                elif mod == "propagate_heatmaps":
                    if param == "weight":
                        _set(tree, v2k, "propagate_kernel", None,
                             _conv_w(value), None)
                    else:
                        _set(tree, v2k, "propagate_bias", None, value, None)
                elif mod == "initial_heatmaps":
                    _set(tree, v2k, "initial_heatmaps", None,
                         np.transpose(value, (1, 2, 3, 0)), None)
                elif mod == "sigmas":
                    _set(tree, v2k, "sigmas", None, value, None)
                else:
                    raise KeyError(f"unmapped vox_to_kypt key: {key}")
            elif parts[1] == "kypt_to_vox":
                k2v = det + ["kypt_to_vox"]
                mod = parts[2]
                if mod == "adjust_combined_representation":
                    w = _conv_w(value) if param == "weight" else value
                    _set(tree, k2v + ["Conv_0"],
                         "kernel" if param == "weight" else "bias", None,
                         w, None)
                elif mod == "decode_voxel_from_combined_representation":
                    idx = parts[3]
                    flax_name, transform = _DECODER[idx]
                    if param == "weight":
                        w = transform(value) if transform else value
                        leaf = "kernel" if transform else "scale"
                    else:
                        w, leaf = value, "bias"
                    _set(tree, k2v + ["VoxelDecoder_0", flax_name], leaf,
                         None, w, None)
                else:
                    raise KeyError(f"unmapped kypt_to_vox key: {key}")
            else:
                raise KeyError(f"unmapped detector key: {key}")

        elif parts[0] == "dyna_module":
            dyn = ["dyna_module"]
            mod = ".".join(parts[1:-1])
            if mod in _DYNA_LINEAR:
                base = _DYNA_LINEAR[mod]
                if param == "weight":
                    _set(tree, dyn, f"{base}_w", None, _linear_w(value), None)
                else:
                    _set(tree, dyn, f"{base}_b", None, value, None)
            elif parts[1] == "kypt_rnn_cell":
                name = {"weight_ih": "gru_w_ih", "weight_hh": "gru_w_hh",
                        "bias_ih": "gru_b_ih", "bias_hh": "gru_b_hh"}[param]
                w = _linear_w(value) if param.startswith("weight") else value
                _set(tree, dyn, name, None, w, None)
            elif parts[1] == "init_kypt_rnn_state":
                _set(tree, dyn, "init_kypt_rnn_state", None, value, None)
            elif parts[1] == "offset_param":
                _set(tree, dyn, "offset_param", None, value, None)
            else:
                raise KeyError(f"unmapped dyna key: {key}")
        else:
            raise KeyError(f"unmapped top-level key: {key}")

    return {"params": tree}


def _res_block_table(key):  # kept for introspection/tests
    return _RES


def load_torch_state_dict(path: str) -> dict:
    import torch
    return torch.load(path, map_location="cpu")


def load_reference_checkpoint(path: str) -> dict:
    """.pth file -> flax params pytree."""
    return convert_reference_state_dict(load_torch_state_dict(path))


def load_torch_detector(path: str, state, cfg):
    """Merge a reference detector-only .pth into a TrainState
    (reference train.py:270-278 filters the kypt_detector.* prefix)."""
    sd = load_torch_state_dict(path)
    sd = {k: v for k, v in sd.items() if k.startswith("kypt_detector.")}
    converted = convert_reference_state_dict(sd)
    merged = dict(state.params["params"])
    merged["kypt_detector"] = converted["params"]["kypt_detector"]
    return state.replace(params={"params": merged})
