"""Conv+BN folding for inference (reference
pcdet/models/model_utils/fusion_utils.py, applied by eval_utils.py:40-41
under --fuse_conv_bn).

Walks the param tree; wherever a module holds exactly one conv kernel and
one MaskedBatchNorm, the BN affine + running stats are folded into the conv
weights and the BN is reset to identity — removing the normalization work
from the serving graph.
"""
from __future__ import annotations

import numpy as np
from flax.core import freeze, unfreeze

BN_EPS = 1e-3


def _is_conv(d):
    return isinstance(d, dict) and "kernel" in d


def _is_bn(d):
    return isinstance(d, dict) and set(d.keys()) >= {"scale", "bias"} \
        and "kernel" not in d


def fuse_conv_bn(params, batch_stats, eps: float = BN_EPS):
    """Returns (fused_params, fused_batch_stats).  Identity-folds every
    (conv, MaskedBatchNorm) sibling pair found in a module."""
    params = unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    batch_stats = unfreeze(batch_stats) if hasattr(batch_stats, "unfreeze") \
        else dict(batch_stats)

    def walk(p, s):
        if not isinstance(p, dict):
            return
        conv_keys = [k for k, v in p.items() if _is_conv(v)]
        bn_keys = [k for k, v in p.items()
                   if _is_bn(v) and isinstance(s, dict) and k in s]
        if len(conv_keys) == 1 and len(bn_keys) == 1:
            ck, bk = conv_keys[0], bn_keys[0]
            kernel = np.asarray(p[ck]["kernel"], np.float64)
            scale = np.asarray(p[bk]["scale"], np.float64)
            bias = np.asarray(p[bk]["bias"], np.float64)
            mean = np.asarray(s[bk]["mean"], np.float64)
            var = np.asarray(s[bk]["var"], np.float64)
            factor = scale / np.sqrt(var + eps)
            p[ck]["kernel"] = (kernel * factor).astype(np.float32)
            shift = bias - mean * factor
            if "bias" in p[ck]:
                p[ck]["bias"] = (np.asarray(p[ck]["bias"], np.float64) * factor
                                 + shift).astype(np.float32)
                p[bk]["bias"] = np.zeros_like(bias, dtype=np.float32)
            else:
                # conv has no bias param: carry the shift in the (now
                # otherwise-identity) BN bias
                p[bk]["bias"] = shift.astype(np.float32)
            p[bk]["scale"] = np.ones_like(scale, dtype=np.float32)
            s[bk]["mean"] = np.zeros_like(mean, dtype=np.float32)
            # var + eps == 1 so the BN rsqrt is exactly identity
            s[bk]["var"] = np.full_like(var, 1.0 - eps, dtype=np.float32)
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v, s.get(k, {}) if isinstance(s, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats
