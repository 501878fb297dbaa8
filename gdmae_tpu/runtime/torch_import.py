"""Reference torch-checkpoint import/export (shape-tolerant partial load).

TPU-native equivalent of the reference's pretrained-weight flow
(reference pcdet/models/detectors/detector3d_template.py:361-411
``_load_state_dict`` / ``load_params_from_file``): published GD-MAE ``.pth``
checkpoints (and the MAE pretrain -> detection fine-tune handoff of
tools/scripts/dist_ssl_train.sh) load directly into the flax models here.

The mapping is RULE-BASED over the flax param tree: every flax leaf path is
translated to its reference state-dict name plus a layout transform
(torch Linear/Conv2d/ConvTranspose2d/MHA layouts -> flax), so the import is
total over the families it knows (gd_mae detection + MAE pretrain +
CenterPoint-style heads) and degrades per-leaf, like the reference's
shape-tolerant loader: a missing or shape-mismatched entry is skipped with
a note, everything else loads.

Layout transforms:
  * torch ``Linear.weight`` (out, in)            -> flax ``kernel`` (in, out)
  * torch ``Conv2d.weight`` (out, in, kh, kw)    -> flax (kh, kw, in, out)
  * spconv2 ``weight`` (out, kh, kw, in)         -> flax (kh, kw, in, out)
    (spconv1 checkpoints already store (kh, kw, in, out) — both accepted,
    disambiguated by shape, mirroring the reference's spconv shim at
    detector3d_template.py:368-379)
  * torch ``ConvTranspose2d.weight`` (in, out, s, s) with kernel == stride
    -> the DeconvFuse 1x1-conv relayout (1, 1, in, s*s*out) used by
    models/backbones_3d/spt_backbone.py DeconvFuse (same function space;
    see its docstring)
  * torch MHA ``in_proj_weight`` (3c, c)         -> flax (c, 3c)
  * BatchNorm ``weight/bias/running_mean/running_var``
    -> params ``scale/bias`` + batch_stats ``mean/var``
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "load_torch_checkpoint", "import_torch_state", "export_torch_state",
    "flax_to_torch_name",
]


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

def _enc_suffix(rest: str) -> Optional[Tuple[str, str]]:
    """shift_block_{b}/encoder_{j}/<leaf-path> -> reference encoder name."""
    m = re.match(r"shift_block_(\d+)/encoder_(\d+)/(.*)$", rest)
    if not m:
        return None
    b, j, tail = int(m.group(1)), int(m.group(2)), m.group(3)
    base = f"encoder_blocks.{b}.encoder_list.{j}"
    table = {
        "win_attn/in_proj_weight": ("win_attn.self_attn.in_proj_weight", "t"),
        "win_attn/in_proj_bias": ("win_attn.self_attn.in_proj_bias", ""),
        "win_attn/tau": ("win_attn.self_attn.tau", "tau"),
        "win_attn/out_proj/kernel": ("win_attn.self_attn.out_proj.weight", "t"),
        "win_attn/out_proj/bias": ("win_attn.self_attn.out_proj.bias", ""),
        "linear1/kernel": ("linear1.weight", "t"),
        "linear1/bias": ("linear1.bias", ""),
        "linear2/kernel": ("linear2.weight", "t"),
        "linear2/bias": ("linear2.bias", ""),
        "norm1/scale": ("norm1.weight", ""),
        "norm1/bias": ("norm1.bias", ""),
        "norm2/scale": ("norm2.weight", ""),
        "norm2/bias": ("norm2.bias", ""),
    }
    if tail not in table:
        return None
    name, tf = table[tail]
    return f"{base}.{name}", tf


_BN_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}


def _conv_bn_suffix(rest: str, torch_conv: str, torch_bn: str,
                    conv_tf: str = "conv"):
    """Match ``<flax-conv-or-bn leaf>`` of a ConvBNReLU / TokenConvBNReLU
    (dense path nests Conv_0/MaskedBatchNorm_0; token path keeps a bare
    ``kernel``)."""
    if rest in ("Conv_0/kernel", "kernel"):
        return torch_conv, conv_tf
    m = re.match(r"MaskedBatchNorm_0/(scale|bias|mean|var)$", rest)
    if m:
        return f"{torch_bn}.{_BN_LEAF[m.group(1)]}", ""
    return None


def flax_to_torch_name(path: str, mae: bool = False):
    """Translate one flax leaf path (``a/b/c`` form, params and batch_stats
    alike) to ``(reference_state_dict_name, transform)`` or ``None`` when
    the leaf has no reference counterpart.

    ``mae``: the tree belongs to an MAE pretrain graph (SPTBackboneMAE) —
    its fuse stack maps to ``decoder_deblocks``/``decoder_conv_out``
    (reference spt_backbone_mae.py:31-52) instead of the detection
    backbone's ``deblocks``/``conv_out`` (spt_backbone.py:287-303).
    """
    # ---- VFE ----
    m = re.match(r"vfe/mlp(\d+)_(\d+)/(.*)$", path)
    if m:
        i, k, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if rest == "Dense_0/kernel":
            return f"vfe.dvfe_mlps.{i}.{3 * k}.weight", "t"
        mm = re.match(r"MaskedBatchNorm_0/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"vfe.dvfe_mlps.{i}.{3 * k + 1}."
                    f"{_BN_LEAF[mm.group(1)]}"), ""
        return None
    m = re.match(r"vfe/agg_(\d+)/(.*)$", path)
    if m:
        k, rest = int(m.group(1)), m.group(2)
        out = _conv_bn_suffix(rest, f"vfe.aggregation_mlp.{3 * k}.weight",
                              f"vfe.aggregation_mlp.{3 * k + 1}", "t")
        if out:
            return out
        if rest == "Dense_0/kernel":
            return f"vfe.aggregation_mlp.{3 * k}.weight", "t"
        return None

    # ---- SPT backbone (detection AND MAE encoder) ----
    m = re.match(r"backbone_3d/(?:encoder/)?sst_block_(\d+)/(.*)$", path)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        base = f"backbone_3d.sst_blocks.{i}"
        for conv in ("conv_down", "conv_out"):
            if rest.startswith(conv + "/"):
                return _conv_bn_suffix(
                    rest[len(conv) + 1:], f"{base}.{conv}.0.weight",
                    f"{base}.{conv}.1", "spconv")
        enc = _enc_suffix(rest)
        if enc:
            return f"{base}.{enc[0]}", enc[1]
        return None

    # ---- VoxelBackBone8x / VoxelResBackBone8x (3D sparse pyramid) ----
    # ours (models/backbones_3d/spconv_backbone.py): conv_input, conv1 /
    # conv1_res{1,2}, conv{s}_down + conv{s}_subm{1,2} / conv{s}_res{1,2},
    # conv_out; reference spconv_backbone.py: SparseSequential stacks
    # (conv{s}.0 = strided block, .{j} = subm block or SparseBasicBlock
    # with conv1/bn1/conv2/bn2 attributes).
    m = re.match(r"backbone_3d/(conv_input|conv_out|conv\d(?:_\w+)?)/(.*)$",
                 path)
    if m and not path.startswith("backbone_3d/sst_block"):
        mod, rest = m.group(1), m.group(2)
        mm = re.match(r"(conv\d)_res(\d)/(conv\d)/(.*)$",
                      mod + "/" + rest)
        if mm:  # SparseBasicBlock: conv{s}_res{r}/conv{j}
            stage, r, cj, rest2 = (mm.group(1), int(mm.group(2)),
                                   mm.group(3), mm.group(4))
            # stage conv1: blocks at list index r-1; strided stages: the
            # blocks sit AFTER the strided block (index r)
            idx = r - 1 if stage == "conv1" else r
            base = f"backbone_3d.{stage}.{idx}"
            if rest2 == "kernel":
                return f"{base}.{cj}.weight", "spconv3d"
            mm2 = re.match(r"MaskedBatchNorm_0/(scale|bias|mean|var)$", rest2)
            if mm2:
                bn = "bn1" if cj == "conv1" else "bn2"
                return f"{base}.{bn}.{_BN_LEAF[mm2.group(1)]}", ""
            return None
        table = {
            "conv_input": "backbone_3d.conv_input",       # conv at .0, bn .1
            "conv_out": "backbone_3d.conv_out",
            "conv1": "backbone_3d.conv1.0",               # post_act_block
        }
        mm = re.match(r"conv(\d)_down$", mod)
        if mm:
            base = f"backbone_3d.conv{mm.group(1)}.0"
        elif re.match(r"conv(\d)_subm(\d)$", mod):
            mm = re.match(r"conv(\d)_subm(\d)$", mod)
            base = f"backbone_3d.conv{mm.group(1)}.{mm.group(2)}"
        elif mod in table:
            base = table[mod]
        else:
            return None
        if rest == "kernel":
            return f"{base}.0.weight", "spconv3d"
        mm = re.match(r"MaskedBatchNorm_0/(scale|bias|mean|var)$", rest)
        if mm:
            return f"{base}.1.{_BN_LEAF[mm.group(1)]}", ""
        return None

    # ---- FPN fuse: detection deblocks / MAE generative decoder ----
    m = re.match(r"backbone_3d/(encoder/)?fuse/(.*)$", path)
    if m:
        is_mae = mae or bool(m.group(1))
        rest = m.group(2)
        deb = "backbone_3d.decoder_deblocks" if is_mae else \
            "backbone_3d.deblocks"
        cout = "backbone_3d.decoder_conv_out" if is_mae else \
            "backbone_3d.conv_out"
        mm = re.match(r"deblock_(\d+)/kernel$", rest)
        if mm:
            return f"{deb}.{int(mm.group(1))}.0.weight", "deconv"
        mm = re.match(r"deblock_bn_(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{deb}.{int(mm.group(1))}.1."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        if rest == "conv_out/kernel":
            return f"{cout}.0.weight", "conv"
        mm = re.match(r"conv_out_bn/(scale|bias|mean|var)$", rest)
        if mm:
            return f"{cout}.1.{_BN_LEAF[mm.group(1)]}", ""
        return None

    # ---- MAE decoder head ----
    m = re.match(r"backbone_3d/decoder_pred/(kernel|bias)$", path)
    if m:
        leaf = m.group(1)
        return (f"backbone_3d.decoder_pred."
                f"{'weight' if leaf == 'kernel' else 'bias'}",
                "t" if leaf == "kernel" else "")

    # ---- DLA-34 image backbone (the torchvision-hub pretrained surface:
    # reference dla.py:196 loads ImageNet weights into `base` only) ----
    m = re.match(r"img_backbone/base/(.*)$", path)
    if m:
        rest = m.group(1)
        base = "img_backbone.base"
        mm = re.match(r"(base_layer|level0|level1)/(.*)$", rest)
        if mm:  # Sequential(conv, bn, relu)
            return _conv_bn_suffix(mm.group(2), f"{base}.{mm.group(1)}.0.weight",
                                   f"{base}.{mm.group(1)}.1", "conv")
        mm = re.match(r"(level\d(?:/tree[12])*)/(.*)$", rest)
        if mm:
            tree = f"{base}." + mm.group(1).replace("/", ".")
            leaf = mm.group(2)
            mm2 = re.match(r"(conv[12])/(.*)$", leaf)
            if mm2:  # BasicBlock convs: bn lives as bn{j} sibling
                j = mm2.group(1)[-1]
                out = _conv_bn_suffix(mm2.group(2), f"{tree}.{mm2.group(1)}.weight",
                                      f"{tree}.bn{j}", "conv")
                if out:
                    return out
            mm2 = re.match(r"root/conv/(.*)$", leaf)
            if mm2:
                return _conv_bn_suffix(mm2.group(1), f"{tree}.root.conv.weight",
                                       f"{tree}.root.bn", "conv")
            if leaf == "project/kernel":
                return f"{tree}.project.0.weight", "conv"
            mm2 = re.match(r"project_bn/(scale|bias|mean|var)$", leaf)
            if mm2:
                return f"{tree}.project.1.{_BN_LEAF[mm2.group(1)]}", ""
        return None

    # ---- 2D BEV backbone (SSTBEVBackbone) ----
    m = re.match(r"backbone_2d/conv_(\d+)/kernel$", path)
    if m:
        return f"backbone_2d.conv_layer.{int(m.group(1))}.0.weight", "conv"
    m = re.match(r"backbone_2d/bn_(\d+)/(scale|bias|mean|var)$", path)
    if m:
        return (f"backbone_2d.conv_layer.{int(m.group(1))}.1."
                f"{_BN_LEAF[m.group(2)]}"), ""

    # ---- BaseBEVBackbone (multi-scale conv/deconv FPN) ----
    # ours (models/backbones_2d/sst_bev_backbone.py:68) <-> reference
    # base_bev_backbone.py:28-70: blocks.{i} = Sequential(ZeroPad2d, Conv2d,
    # BN, ReLU, (Conv2d, BN, ReLU)*n) so conv j sits at 1+3j and its BN at
    # 2+3j; deblocks.{i} = Sequential(ConvTranspose2d(kernel=stride), BN,
    # ReLU).  Only UPSAMPLE_STRIDE >= 1 is importable (the <1 downsample
    # branch has no shipped config and would need a plain "conv" layout).
    m = re.match(r"backbone_2d/block(\d+)_conv(\d+)/kernel$", path)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"backbone_2d.blocks.{i}.{1 + 3 * j}.weight", "conv"
    m = re.match(r"backbone_2d/block(\d+)_bn(\d+)/(scale|bias|mean|var)$",
                 path)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return (f"backbone_2d.blocks.{i}.{2 + 3 * j}."
                f"{_BN_LEAF[m.group(3)]}"), ""
    m = re.match(r"backbone_2d/deblock_(\d+)/kernel$", path)
    if m:
        return f"backbone_2d.deblocks.{int(m.group(1))}.0.weight", "deconv"
    m = re.match(r"backbone_2d/deblock_bn_(\d+)/(scale|bias|mean|var)$", path)
    if m:
        return (f"backbone_2d.deblocks.{int(m.group(1))}.1."
                f"{_BN_LEAF[m.group(2)]}"), ""

    # ---- PointNet2MSG / PointNet2SAMSG (SA pyramid [+ FP decoder]) ----
    # ours (models/backbones_3d/pointnet2_backbone.py) <-> reference
    # pointnet2_backbone.py:7-189 + pointnet2_batch/pointnet2_modules.py:
    # SA_modules.{k}.mlps.{g} are Conv2d-ks1 (+BN2d) stacks,
    # aggregation_mlp is Conv1d (+BN1d), FP_modules.{i}.mlp is Conv2d-ks1.
    m = re.match(r"backbone_3d/sa_(\d+)/mlp_(\d+)/fc(\d+)/kernel$", path)
    if m:
        k, g, i = (int(v) for v in m.groups())
        return f"backbone_3d.SA_modules.{k}.mlps.{g}.{3 * i}.weight", "conv1d"
    m = re.match(r"backbone_3d/sa_(\d+)/mlp_(\d+)/bn(\d+)/"
                 r"(scale|bias|mean|var)$", path)
    if m:
        k, g, i = int(m.group(1)), int(m.group(2)), int(m.group(3))
        return (f"backbone_3d.SA_modules.{k}.mlps.{g}.{3 * i + 1}."
                f"{_BN_LEAF[m.group(4)]}"), ""
    m = re.match(r"backbone_3d/sa_(\d+)/agg/fc(\d+)/kernel$", path)
    if m:
        k, i = int(m.group(1)), int(m.group(2))
        return (f"backbone_3d.SA_modules.{k}.aggregation_mlp.{3 * i}.weight",
                "conv1d")
    m = re.match(r"backbone_3d/sa_(\d+)/agg/bn(\d+)/(scale|bias|mean|var)$",
                 path)
    if m:
        k, i = int(m.group(1)), int(m.group(2))
        return (f"backbone_3d.SA_modules.{k}.aggregation_mlp.{3 * i + 1}."
                f"{_BN_LEAF[m.group(3)]}"), ""
    m = re.match(r"backbone_3d/fp_(\d+)/SharedMLP_0/fc(\d+)/kernel$", path)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return f"backbone_3d.FP_modules.{i}.mlp.{3 * j}.weight", "conv1d"
    m = re.match(r"backbone_3d/fp_(\d+)/SharedMLP_0/bn(\d+)/"
                 r"(scale|bias|mean|var)$", path)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        return (f"backbone_3d.FP_modules.{i}.mlp.{3 * j + 1}."
                f"{_BN_LEAF[m.group(3)]}"), ""

    # ---- PointHeadVote (VoteNet-style head: 3DSSD / Graph-Po) ----
    # ours (models/dense_heads/point_head_vote.py) <-> reference
    # point_head_vote.py:19-56 via point_head_template.make_fc_layers:36-50:
    # vote_layers is a Conv1d(+BN1d) stack closed by a Conv1d WITH bias,
    # shared/cls/box trees are nn.Linear stacks, vote_SA_module.mlps are
    # Conv2d-ks1.  The final-layer Sequential index (3 * n_fc) is unknown
    # from one flax path: candidates are resolved against the checkpoint on
    # import and against the sibling count on export.
    m = re.match(r"point_head/(.*)$", path)
    if m:
        rest = m.group(1)
        base = "point_head"
        mm = re.match(r"vote_fc(\d+)/kernel$", rest)
        if mm:
            return (f"{base}.vote_layers.{3 * int(mm.group(1))}.weight",
                    "conv1d")
        mm = re.match(r"vote_bn(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{base}.vote_layers.{3 * int(mm.group(1)) + 1}."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        mm = re.match(r"vote_out/(kernel|bias)$", rest)
        if mm:
            leaf = "weight" if mm.group(1) == "kernel" else "bias"
            cands = [f"{base}.vote_layers.{j}.{leaf}" for j in (3, 6, 9, 0)]
            return cands, ("conv1d" if leaf == "weight" else "")
        mm = re.match(r"vote_sa_mlp_(\d+)/fc(\d+)/kernel$", rest)
        if mm:
            g, i = int(mm.group(1)), int(mm.group(2))
            return (f"{base}.vote_SA_module.mlps.{g}.{3 * i}.weight",
                    "conv1d")
        mm = re.match(r"vote_sa_mlp_(\d+)/bn(\d+)/(scale|bias|mean|var)$",
                      rest)
        if mm:
            g, i = int(mm.group(1)), int(mm.group(2))
            return (f"{base}.vote_SA_module.mlps.{g}.{3 * i + 1}."
                    f"{_BN_LEAF[mm.group(3)]}"), ""
        mm = re.match(r"shared_fc(\d+)/kernel$", rest)
        if mm:
            return f"{base}.shared_conv.{3 * int(mm.group(1))}.weight", "t"
        mm = re.match(r"shared_bn(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{base}.shared_conv.{3 * int(mm.group(1)) + 1}."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        mm = re.match(r"(cls|box)_fc(\d+)/kernel$", rest)
        if mm:
            tag, i = mm.group(1), int(mm.group(2))
            return f"{base}.{tag}_conv.{3 * i}.weight", "t"
        mm = re.match(r"(cls|box)_bn(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            tag, i = mm.group(1), int(mm.group(2))
            return (f"{base}.{tag}_conv.{3 * i + 1}."
                    f"{_BN_LEAF[mm.group(3)]}"), ""
        mm = re.match(r"(cls|box)_out/(kernel|bias)$", rest)
        if mm:
            tag = mm.group(1)
            leaf = "weight" if mm.group(2) == "kernel" else "bias"
            cands = [f"{base}.{tag}_conv.{j}.{leaf}" for j in (3, 6, 9, 0)]
            return cands, ("t" if leaf == "weight" else "")
        return None

    # ---- anchor heads (AnchorHeadSingle): 1x1 Conv2d with bias ----
    m = re.match(r"dense_head/conv_(cls|box|dir_cls)/(kernel|bias)$", path)
    if m:
        head, leaf = m.group(1), m.group(2)
        torch_leaf = "weight" if leaf == "kernel" else "bias"
        return (f"dense_head.conv_{head}.{torch_leaf}",
                "conv" if leaf == "kernel" else "")

    # ---- CenterHead: shared conv + SeparateHead branches ----
    # ours (models/dense_heads/center_head.py): dense_head/shared_conv/
    # kernel + shared_bn/*, head_{g}/{name}_conv{k} + {name}_bn{k} +
    # {name}_out; reference center_head.py:11-45,73-80: shared_conv is
    # Sequential(Conv2d, BN, ReLU); each SeparateHead target is
    # Sequential(Sequential(Conv2d, BN, ReLU) x (num_conv-1), Conv2d) ->
    # the final conv sits at list index num_conv-1 (unknown from one flax
    # path: candidate names, resolved against the checkpoint).
    m = re.match(r"dense_head/shared_conv/(kernel|bias)$", path)
    if m:
        leaf = m.group(1)
        return (f"dense_head.shared_conv.0."
                f"{'weight' if leaf == 'kernel' else 'bias'}",
                "conv" if leaf == "kernel" else "")
    m = re.match(r"dense_head/shared_bn/(scale|bias|mean|var)$", path)
    if m:
        return f"dense_head.shared_conv.1.{_BN_LEAF[m.group(1)]}", ""
    m = re.match(r"dense_head/head_(\d+)/([a-z0-9_]+)_conv(\d+)/"
                 r"(kernel|bias)$", path)
    if m:
        g, name, k, leaf = (int(m.group(1)), m.group(2), int(m.group(3)),
                            m.group(4))
        return (f"dense_head.heads_list.{g}.{name}.{k}.0."
                f"{'weight' if leaf == 'kernel' else 'bias'}",
                "conv" if leaf == "kernel" else "")
    m = re.match(r"dense_head/head_(\d+)/([a-z0-9_]+)_bn(\d+)/"
                 r"(scale|bias|mean|var)$", path)
    if m:
        g, name, k = int(m.group(1)), m.group(2), int(m.group(3))
        return (f"dense_head.heads_list.{g}.{name}.{k}.1."
                f"{_BN_LEAF[m.group(4)]}"), ""
    m = re.match(r"dense_head/head_(\d+)/([a-z0-9_]+)_out/(kernel|bias)$",
                 path)
    if m:
        g, name, leaf = int(m.group(1)), m.group(2), m.group(3)
        torch_leaf = "weight" if leaf == "kernel" else "bias"
        cands = [f"dense_head.heads_list.{g}.{name}.{j}.{torch_leaf}"
                 for j in (1, 2, 3, 0, 4)]
        return cands, ("conv" if leaf == "kernel" else "")

    # ---- GraphRCNNHead (DFVS + attentive GNN second stage) ----
    # ours (models/roi_heads/graphrcnn_head.py) <-> reference
    # graphrcnn_head.py:14-177; reference Conv1d/Conv2d kernel-size-1 stacks
    # are Dense layers here ("conv1d" transform squeezes the kernel dims).
    m = re.match(r"roi_head/(.*)$", path)
    if m:
        rest = m.group(1)
        base = "roi_head"
        gnn = f"{base}.attn_gnn_layer"
        mm = re.match(r"attn_gnn/edge_(\d+)/kernel$", rest)
        if mm:
            return f"{gnn}.edge_layes.{mm.group(1)}.0.weight", "conv1d"
        mm = re.match(r"attn_gnn/edge_bn_(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{gnn}.edge_layes.{mm.group(1)}.1."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        table = {
            "attn_gnn/calib_fc1/kernel": (f"{gnn}.calib.0.weight", "conv1d"),
            "attn_gnn/calib_fc2/kernel": (f"{gnn}.calib.3.weight", "conv1d"),
            "attn_gnn/calib_fc2/bias": (f"{gnn}.calib.3.bias", ""),
            "attn_gnn/reduction/kernel": (f"{gnn}.reduction.0.weight",
                                          "conv1d"),
            "attn_gnn/sc_fc1/kernel": (f"{gnn}.shortcut.conv1.weight",
                                       "conv1d"),
            "attn_gnn/sc_fc1/bias": (f"{gnn}.shortcut.conv1.bias", ""),
            "attn_gnn/sc_fc2/kernel": (f"{gnn}.shortcut.conv2.weight",
                                       "conv1d"),
            "attn_gnn/sc_fc2/bias": (f"{gnn}.shortcut.conv2.bias", ""),
            "shared_fc/kernel": (f"{base}.shared_fc_layer.0.weight",
                                 "conv1d"),
            "cls_layer/kernel": (f"{base}.cls_layers.weight", "conv1d"),
            "cls_layer/bias": (f"{base}.cls_layers.bias", ""),
            "reg_layer/kernel": (f"{base}.reg_layers.weight", "conv1d"),
            "reg_layer/bias": (f"{base}.reg_layers.bias", ""),
        }
        if rest in table:
            return table[rest]
        bn_table = {
            "attn_gnn/calib_bn": f"{gnn}.calib.1",
            "attn_gnn/reduction_bn": f"{gnn}.reduction.1",
            "attn_gnn/sc_bn1": f"{gnn}.shortcut.norm1",
            "attn_gnn/sc_bn2": f"{gnn}.shortcut.norm2",
            "shared_bn": f"{base}.shared_fc_layer.1",
        }
        mm = re.match(r"(.*)/(scale|bias|mean|var)$", rest)
        if mm and mm.group(1) in bn_table:
            return f"{bn_table[mm.group(1)]}.{_BN_LEAF[mm.group(2)]}", ""
        mm = re.match(r"attn_gnn/exp_(\d+)/kernel$", rest)
        if mm:
            return (f"{gnn}.expansion.{3 * int(mm.group(1))}.weight",
                    "conv1d")
        mm = re.match(r"attn_gnn/exp_bn_(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{gnn}.expansion.{3 * int(mm.group(1)) + 1}."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        mm = re.match(r"img_conv(\d+)/kernel$", rest)
        if mm:
            return (f"{base}.img_conv.{3 * int(mm.group(1))}.weight",
                    "conv1d")
        mm = re.match(r"img_bn(\d+)/(scale|bias|mean|var)$", rest)
        if mm:
            return (f"{base}.img_conv.{3 * int(mm.group(1)) + 1}."
                    f"{_BN_LEAF[mm.group(2)]}"), ""
        return None

    return None


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def _to_flax(val: np.ndarray, tf: str, target_shape) -> Optional[np.ndarray]:
    """Transform a torch-layout array into flax layout for ``target_shape``
    (returns None when the layouts are irreconcilable)."""
    v = np.asarray(val)
    if tf == "":
        out = v
    elif tf == "t":
        out = v.T
    elif tf == "tau":
        out = v.reshape(target_shape) if v.size == int(
            np.prod(target_shape)) else v
    elif tf == "conv":
        if v.ndim != 4:
            return None
        out = v.transpose(2, 3, 1, 0)  # (out,in,kh,kw)->(kh,kw,in,out)
    elif tf == "spconv":
        if v.ndim != 4:
            return None
        if v.shape == tuple(target_shape):           # spconv1 (kh,kw,in,out)
            out = v
        elif v.transpose(1, 2, 3, 0).shape == tuple(target_shape):
            out = v.transpose(1, 2, 3, 0)            # spconv2 (out,kh,kw,in)
        elif v.transpose(2, 3, 1, 0).shape == tuple(target_shape):
            out = v.transpose(2, 3, 1, 0)            # dense torch conv
        else:
            return None
    elif tf == "conv1d":
        # torch Conv1d/Conv2d kernel-size-1 (out, in, 1[, 1]) -> Dense
        # kernel (in, out)
        if v.ndim < 2 or any(d != 1 for d in v.shape[2:]):
            return None
        out = v.reshape(v.shape[0], v.shape[1]).T
    elif tf == "spconv3d":
        # target (K, in, out) with K = prod(kernel), tap-major (z, y, x)
        if v.ndim != 5:
            return None
        k_t, cin_t, cout_t = target_shape
        if v.shape[-1] == cout_t and int(np.prod(v.shape[:3])) == k_t:
            out = v.reshape(k_t, cin_t, cout_t)      # spconv1 (k,k,k,in,out)
        elif v.shape[0] == cout_t and int(np.prod(v.shape[1:4])) == k_t:
            out = v.transpose(1, 2, 3, 4, 0).reshape(
                k_t, cin_t, cout_t)                  # spconv2 (out,k,k,k,in)
        else:
            return None
    elif tf == "deconv":
        # torch ConvTranspose2d (in, out, s, s), kernel == stride -> our
        # 1x1-conv depth-to-space relayout (1, 1, in, s*s*out)
        if v.ndim != 4 or v.shape[2] != v.shape[3]:
            return None
        cin, cout, s, _ = v.shape
        out = v.transpose(0, 2, 3, 1).reshape(1, 1, cin, s * s * cout)
    else:
        raise ValueError(f"unknown transform {tf!r}")
    if tuple(out.shape) != tuple(target_shape):
        return None
    return np.ascontiguousarray(out)


def _from_flax(val: np.ndarray, tf: str, torch_like: Optional[np.ndarray],
               deconv_stride: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`_to_flax` (for exporting to reference format)."""
    v = np.asarray(val)
    if tf == "":
        return v
    if tf == "t":
        return np.ascontiguousarray(v.T)
    if tf == "tau":
        if v.ndim == 3 and v.shape[0] > 1:  # (h,1,1) -> (1,h,1,1)
            return v.reshape(1, *v.shape)
        return v  # shared (1,1,1)
    if tf == "conv":
        return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
    if tf == "conv1d":
        return np.ascontiguousarray(v.T[..., None])  # (in,out)->(out,in,1)
    if tf == "spconv":
        # export in spconv2 layout (out, kh, kw, in)
        return np.ascontiguousarray(v.transpose(3, 0, 1, 2))
    if tf == "spconv3d":
        # (K, in, out) -> spconv2 (out, k1, k2, k3, in); K factors as a
        # cube (3,3,3) or the conv_out (3,1,1) special case
        k, cin, cout = v.shape
        dims = {27: (3, 3, 3), 3: (3, 1, 1), 1: (1, 1, 1)}[k]
        return np.ascontiguousarray(
            v.reshape(*dims, cin, cout).transpose(4, 0, 1, 2, 3))
    if tf == "deconv":
        _, _, cin, sso = v.shape
        if deconv_stride is None:
            # infer s from s*s*out: try small strides (1, 2, 4, 8)
            for s in (1, 2, 4, 8):
                if sso % (s * s) == 0 and (
                        torch_like is None or (
                            torch_like.ndim == 4
                            and torch_like.shape[2] == s)):
                    if torch_like is not None or s * s <= sso:
                        deconv_stride = s
                        if torch_like is not None:
                            break
            if torch_like is None:
                raise ValueError(
                    "deconv export needs deconv_stride or a torch template")
        s = deconv_stride
        out = v.reshape(cin, s, s, sso // (s * s)).transpose(0, 3, 1, 2)
        return np.ascontiguousarray(out)
    raise ValueError(f"unknown transform {tf!r}")


# ---------------------------------------------------------------------------
# tree helpers
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out["/".join(prefix)] = tree
    return out


def _set_path(tree, path: str, val):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = val


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _is_mae_tree(flat_params) -> bool:
    return any(p.startswith("backbone_3d/encoder/") or
               p.startswith("backbone_3d/decoder_pred/") for p in flat_params)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` checkpoint into {name: numpy array}
    (reference load_params_from_file, detector3d_template.py:392-411;
    checkpoints store {'model_state': state_dict, 'epoch', 'it', ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in state.items()}


def load_dla_hub_weights(path: str, params, batch_stats=None, logger=None):
    """Load a torchvision-hub-format DLA-34 ImageNet checkpoint into the
    ``img_backbone.base`` subtree.

    The reference fetches this file from the model hub at build time
    (reference dla.py:196 ``model_zoo.load_url`` -> e.g.
    ``dla34-ba72cf86.pth``) — unfetchable in offline environments, so this
    accepts the SAME file from local disk (config key
    ``MODEL.IMG_BACKBONE.PRETRAINED``).  Hub checkpoints are bare state
    dicts keyed WITHOUT the in-detector prefix (``base_layer.0.weight``,
    ``level3.tree1.conv1.weight``, ..., plus an ``fc`` ImageNet classifier
    the reference discards); keys are re-prefixed to the reference's
    detector names (``img_backbone.base.*``) and routed through
    :func:`import_torch_state`'s shape-tolerant partial restore."""
    sd = load_torch_checkpoint(path)
    sd = sd.get("state_dict", sd) if not isinstance(
        next(iter(sd.values()), None), np.ndarray) else sd
    prefixed = {f"img_backbone.base.{k}": v for k, v in sd.items()
                if not k.startswith("fc.")}
    return import_torch_state(prefixed, params, batch_stats, logger=logger)


def import_torch_state(state_dict: Dict[str, np.ndarray], params,
                       batch_stats=None, logger=None):
    """Shape-tolerant partial load of a reference state dict into flax
    ``(params, batch_stats)`` trees.

    Returns ``(params, batch_stats, report)`` where report is a dict with
    ``loaded`` / ``skipped`` / ``unmapped`` name lists.  Semantics mirror
    the reference's ``_load_state_dict(strict=False)``
    (detector3d_template.py:361-390): entries missing from the checkpoint
    or with irreconcilable shapes keep their current (e.g. random-init)
    values.
    """
    import jax.numpy as jnp

    flat_p = _flatten(params)
    flat_s = _flatten(batch_stats) if batch_stats is not None else {}
    mae = _is_mae_tree(flat_p)

    new_p = _to_mutable(params)
    new_s = _to_mutable(batch_stats) if batch_stats is not None else None
    report = {"loaded": [], "skipped": [], "unmapped": []}

    def log(msg):
        if logger is not None:
            logger.info(msg)

    for which, flat, tree in (("P", flat_p, new_p), ("S", flat_s, new_s)):
        for path, cur in flat.items():
            mapped = flax_to_torch_name(path, mae=mae)
            if mapped is None:
                report["unmapped"].append(path)
                continue
            name, tf = mapped
            if isinstance(name, list):  # ambiguous index: first present wins
                name = next((n for n in name if n in state_dict), name[0])
            if name not in state_dict:
                report["skipped"].append((path, name, "missing"))
                log(f"Not updated weight {path} (no {name} in checkpoint)")
                continue
            val = _to_flax(state_dict[name], tf, cur.shape)
            if val is None:
                report["skipped"].append((path, name, "shape"))
                log(f"Not updated weight {path}: checkpoint {name} shape "
                    f"{state_dict[name].shape} vs {tuple(cur.shape)}")
                continue
            _set_path(tree, path, jnp.asarray(val, dtype=cur.dtype))
            report["loaded"].append((path, name))

    log(f"==> Done (loaded {len(report['loaded'])}/"
        f"{len(flat_p) + len(flat_s)})")
    return new_p, new_s, report


def export_torch_state(params, batch_stats=None,
                       deconv_strides: Optional[Dict[str, int]] = None):
    """Export flax trees to a reference-layout state dict {name: numpy}.

    The inverse of :func:`import_torch_state` — lets checkpoints trained
    here be evaluated by the reference stack (or round-trip tested).
    ``deconv_strides``: optional {flax deblock path -> upsample stride}
    (inferred from FUSE_LAYER configs by callers; required because the
    1x1-relayout folds the stride into the channel dim).
    """
    flat = dict(_flatten(params))
    if batch_stats is not None:
        flat.update(_flatten(batch_stats))
    mae = _is_mae_tree(flat)
    out = {}
    for path, val in flat.items():
        mapped = flax_to_torch_name(path, mae=mae)
        if mapped is None:
            continue
        name, tf = mapped
        if isinstance(name, list):
            # SeparateHead final conv: its Sequential index is the number
            # of preceding conv sub-blocks (count the _conv{k} siblings)
            mm = re.match(r"(dense_head/head_\d+/[a-z0-9_]+)_out/", path)
            # PointHeadVote final layers: flat (layer, BN, ReLU) stacks, so
            # the closing Conv1d/Linear sits at 3 * n_fc (count _fc{k})
            mp = re.match(r"(point_head/[a-z0-9_]+?)_out/", path)
            if mm:
                j = len({p for p in flat
                         if re.match(re.escape(mm.group(1)) + r"_conv\d+/kernel$", p)})
            elif mp:
                j = 3 * len({p for p in flat
                             if re.match(re.escape(mp.group(1)) + r"_fc\d+/kernel$", p)})
            else:
                j = 1
            name = re.sub(r"\.(\d+)\.(weight|bias)$",
                          lambda s: f".{j}.{s.group(2)}", name[0])
        stride = (deconv_strides or {}).get(path)
        if tf == "deconv" and stride is None:
            # unambiguous only when s*s*out has a unique factorization in
            # the allowed strides; default: assume square kernels with the
            # smallest stride whose out-channels stay >= in/4
            sso = int(val.shape[-1])
            stride = 1
            for s in (8, 4, 2, 1):
                if sso % (s * s) == 0:
                    stride = s
                    break
        out[name] = _from_flax(np.asarray(val), tf, None,
                               deconv_stride=stride)
    return out
