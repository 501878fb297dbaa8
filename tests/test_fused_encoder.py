"""Oracle tests for the fused encoder-layer Pallas kernel.

Checks three-way agreement on the packed 128-token block stream:
  1. reference_encoder_layer (pure-XLA _layer_block, vmapped)
  2. fused_encoder_layer in interpret mode (the Pallas program)
  3. the flax BucketEncoderLayer packed path (the production XLA layer),
     driven with the same parameter values
plus gradient agreement (values AND all 13 parameter grads) between the
interpret-mode kernel pair (fwd+bwd) and the XLA oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmae_tpu.ops import window as W
from gdmae_tpu.ops.pallas.fused_encoder import (
    fused_encoder_layer, reference_encoder_layer)


def _rand_setup(seed, b, ts, c, h, f):
    rng = np.random.RandomState(seed)
    nb = len(ts)
    s = 128
    x = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32)) * 0.5
    pos = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32)) * 0.1
    valid = jnp.asarray(rng.rand(b, nb, s) > 0.3)
    valid = valid.reshape(b, -1, min(ts)).at[..., 0].set(True).reshape(
        b, nb, s)
    bias = W.packed_block_bias(ts)
    params = (
        jnp.asarray(rng.randn(c, 3 * c).astype(np.float32)) / np.sqrt(c),
        jnp.asarray(rng.randn(1, 3 * c).astype(np.float32)) * 0.02,
        jnp.asarray(1.0 / np.maximum(rng.rand(1, h).astype(np.float32), 0.05)),
        jnp.asarray(rng.randn(c, c).astype(np.float32)) / np.sqrt(c),
        jnp.asarray(rng.randn(1, c).astype(np.float32)) * 0.02,
        jnp.ones((1, c), jnp.float32),
        jnp.zeros((1, c), jnp.float32),
        jnp.asarray(rng.randn(c, f).astype(np.float32)) / np.sqrt(c),
        jnp.asarray(rng.randn(1, f).astype(np.float32)) * 0.02,
        jnp.asarray(rng.randn(f, c).astype(np.float32)) / np.sqrt(f),
        jnp.asarray(rng.randn(1, c).astype(np.float32)) * 0.02,
        jnp.ones((1, c), jnp.float32) * 1.1,
        jnp.zeros((1, c), jnp.float32) + 0.05,
    )
    return x, pos, valid, bias, params


@pytest.mark.parametrize("b,ts,c,h,f", [
    (2, (16, 16, 32, 64), 64, 4, 128),
    (1, (128,), 128, 8, 256),
    (3, (32,), 64, 2, 96),
])
def test_fused_matches_reference(b, ts, c, h, f):
    x, pos, valid, bias, params = _rand_setup(0, b, ts, c, h, f)
    ref = reference_encoder_layer(x, pos, valid, bias, params, h)
    got = fused_encoder_layer(x, pos, valid, bias, params, h, interpret=True)
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_bucket_encoder_layer():
    """Against the production flax layer (packed path) with the same params."""
    from gdmae_tpu.models.model_utils.sst_layers import BucketEncoderLayer

    b, c, h, f = 2, 64, 4, 128
    ts = (16,) * 2 + (32,) + (64,)
    x, pos, valid, bias, params = _rand_setup(1, b, ts, c, h, f)
    # the flax layer uses ONE shared tau (non_shared_tau=False): make the
    # kernel's per-head inv_tau uniform so the two parameterizations agree
    params = params[:2] + (jnp.full((1, h), 2.5, jnp.float32),) + params[3:]
    (qkv_w, qkv_b, inv_tau, out_w, out_b, ln1_s, ln1_b,
     w1, b1, w2, b2, ln2_s, ln2_b) = params
    tau = 1.0 / inv_tau[0, 0]

    layer = BucketEncoderLayer(d_model=c, nhead=h, dim_feedforward=f,
                               cosine=True, tau_min=0.01)
    variables = {"params": {
        "win_attn": {
            "in_proj_weight": qkv_w, "in_proj_bias": qkv_b[0],
            "tau": jnp.full((1, 1, 1), tau),
            "out_proj": {"kernel": out_w, "bias": out_b[0]},
        },
        "norm1": {"scale": ln1_s[0], "bias": ln1_b[0]},
        "linear1": {"kernel": w1, "bias": b1[0]},
        "linear2": {"kernel": w2, "bias": b2[0]},
        "norm2": {"scale": ln2_s[0], "bias": ln2_b[0]},
    }}
    out_flax = layer.apply(variables, x, pos, valid, block_ts=ts)
    got = fused_encoder_layer(x, pos, valid, bias, params, h, interpret=True)
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(out_flax),
                               rtol=3e-5, atol=3e-5)


def test_fused_gradients_match_reference():
    b, c, h, f = 1, 64, 4, 128
    ts = (16, 32)
    x, pos, valid, bias, params = _rand_setup(2, b, ts, c, h, f)
    tgt = jnp.asarray(
        np.random.RandomState(3).randn(b, len(ts), 128, c).astype(np.float32))
    wm = valid[..., None].astype(jnp.float32)

    def loss_ref(x, pos, params):
        r = reference_encoder_layer(x, pos, valid, bias, params, h)
        return jnp.sum(((r - tgt) * wm) ** 2)

    def loss_fused(x, pos, params):
        r = fused_encoder_layer(x, pos, valid, bias, params, h,
                                interpret=True)
        return jnp.sum(((r - tgt) * wm) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, pos, params)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, pos, params)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-4)
    for i, (a, r) in enumerate(zip(g_got[2], g_ref[2])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=3e-4, atol=3e-4,
            err_msg=f"param grad {i}")


def test_fused_layer_in_canvas_shift_block():
    """Model-level wiring: CanvasShiftBlock with fused_layer=True produces
    the same rows as the unfused packed path, sharing one param tree."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock
    from gdmae_tpu.ops import window as W

    rng = np.random.RandomState(11)
    b, m, c = 2, 200, 64
    ny, nx = 32, 32
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    # dedupe cells per sample (plans assume one token per cell)
    for bi in range(b):
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        coords[bi, ~keep] = 0
        coords[bi, ~keep, 0] = ny - 1  # park dupes in one corner cell
    mask = np.ones((b, m), bool)
    occ = np.zeros((b, ny, nx), bool)
    for bi in range(b):
        occ[bi, coords[bi, :, 0], coords[bi, :, 1]] = True
    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ_j = jnp.asarray(occ)

    window = (8, 8)
    specs = W.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    caps = (24, 16, 8)
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    plans = [
        W.plan_to_tokens(
            W.build_bucket_plan(occ_j, (ny, nx), window, shift, specs, caps),
            c2t, tcell, m)
        for shift in ((0, 0), (4, 4))
    ]
    assert all(W.plan_block_ts(p) is not None for p in plans)

    kw = dict(d_model=c, nhead=4, dim_feedforward=96, window=window,
              cosine=True, tau_min=0.01)
    blk_ref = CanvasShiftBlock(**kw, fused_layer=False)
    blk_fus = CanvasShiftBlock(**kw, fused_layer=True)
    variables = blk_ref.init(jax.random.PRNGKey(0), rows, plans)
    out_ref = blk_ref.apply(variables, rows, plans)
    # same variables load into the fused block (identical param tree)
    out_fus = blk_fus.apply(variables, rows, plans)
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_ref),
                               rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# wid variant (JointPlan packing: per-slot window-id mask instead of a
# static per-block sub-window bias)
# ---------------------------------------------------------------------------

def _rand_wid(seed, b, nb, s, max_win=9):
    """Random sorted per-block window ids with -1 on invalid slots."""
    rng = np.random.RandomState(seed)
    wid = np.sort(rng.randint(0, max_win, (b, nb, s)), axis=-1)
    # make ids globally unique per (b, block) so cross-block ids never
    # collide in meaning (matches JointPlan's flat window numbering)
    wid += (np.arange(nb) * max_win)[None, :, None]
    valid = rng.rand(b, nb, s) > 0.25
    valid[..., 0] = True
    wid = np.where(valid, wid, -1)
    return jnp.asarray(wid.astype(np.int32)), jnp.asarray(valid)


@pytest.mark.parametrize("b,nb,c,h,f", [
    (2, 3, 64, 4, 128),
    (1, 1, 128, 8, 256),
])
def test_fused_wid_matches_reference(b, nb, c, h, f):
    from gdmae_tpu.ops.pallas.fused_encoder import (
        fused_encoder_layer_wid, reference_encoder_layer_wid)

    x, pos, _, _, params = _rand_setup(4, b, (64,) * nb, c, h, f)
    wid, valid = _rand_wid(5, b, nb, 128)
    ref = reference_encoder_layer_wid(x, pos, valid, wid, params, h)
    got = fused_encoder_layer_wid(x, pos, valid, wid, params, h,
                                  interpret=True)
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref) * m,
                               rtol=2e-5, atol=2e-5)


def test_fused_wid_gradients_match_reference():
    from gdmae_tpu.ops.pallas.fused_encoder import (
        fused_encoder_layer_wid, reference_encoder_layer_wid)

    b, nb, c, h, f = 1, 2, 64, 4, 128
    x, pos, _, _, params = _rand_setup(6, b, (64,) * nb, c, h, f)
    wid, valid = _rand_wid(7, b, nb, 128)
    tgt = jnp.asarray(
        np.random.RandomState(8).randn(b, nb, 128, c).astype(np.float32))
    wm = valid[..., None].astype(jnp.float32)

    def loss_ref(x, pos, params):
        r = reference_encoder_layer_wid(x, pos, valid, wid, params, h)
        return jnp.sum(((r - tgt) * wm) ** 2)

    def loss_fused(x, pos, params):
        r = fused_encoder_layer_wid(x, pos, valid, wid, params, h,
                                    interpret=True)
        return jnp.sum(((r - tgt) * wm) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, pos, params)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, pos, params)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-4)
    for i, (a, r) in enumerate(zip(g_got[2], g_ref[2])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=3e-4, atol=3e-4,
            err_msg=f"param grad {i}")


def test_fused_layer_joint_plan_in_canvas_shift_block():
    """CanvasShiftBlock on a JointPlan with fused_layer=True matches the
    unfused wid path, sharing one param tree."""
    from gdmae_tpu.models.model_utils.sst_layers import CanvasShiftBlock
    from gdmae_tpu.ops import window as W

    rng = np.random.RandomState(21)
    b, m, c = 2, 200, 64
    ny, nx = 32, 32
    coords = np.stack([rng.randint(0, ny, (b, m)),
                       rng.randint(0, nx, (b, m))], -1)
    for bi in range(b):
        cells = coords[bi, :, 0] * nx + coords[bi, :, 1]
        _, first = np.unique(cells, return_index=True)
        keep = np.zeros(m, bool)
        keep[first] = True
        coords[bi, ~keep] = 0
        coords[bi, ~keep, 0] = ny - 1
    mask = np.ones((b, m), bool)
    occ = np.zeros((b, ny, nx), bool)
    for bi in range(b):
        occ[bi, coords[bi, :, 0], coords[bi, :, 1]] = True
    rows = jnp.asarray(rng.randn(b, m, c).astype(np.float32))
    coords_j, mask_j = jnp.asarray(coords), jnp.asarray(mask)
    occ_j = jnp.asarray(occ)

    window = (8, 8)
    specs = W.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    c2t = W.build_cell2tok(coords_j, mask_j, (ny, nx))
    tcell = W.token_cell_index(coords_j, mask_j, (ny, nx))
    plans = [
        W.joint_plan_to_tokens(
            W.build_joint_plan(occ_j, (ny, nx), window, shift, specs, 512),
            c2t, tcell, m)
        for shift in ((0, 0), (4, 4))
    ]

    kw = dict(d_model=c, nhead=4, dim_feedforward=96, window=window,
              cosine=True, tau_min=0.01)
    blk_ref = CanvasShiftBlock(**kw, fused_layer=False)
    blk_fus = CanvasShiftBlock(**kw, fused_layer=True)
    variables = blk_ref.init(jax.random.PRNGKey(0), rows, plans)
    out_ref = blk_ref.apply(variables, rows, plans)
    out_fus = blk_fus.apply(variables, rows, plans)
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_ref),
                               rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# attention-core flash kernel (wid mask; projections/FFN stay in XLA)
# ---------------------------------------------------------------------------

def test_wid_flash_attention_matches_oracles():
    """Kernel (interpret) == its XLA oracle == the head-major
    wid_window_attention path it replaces, values AND input grads."""
    from gdmae_tpu.ops.pallas.fused_encoder import (
        reference_wid_flash_attention, wid_flash_attention)
    from gdmae_tpu.ops.pallas.window_attention import wid_window_attention

    b, nb, s, c, h = 2, 3, 128, 64, 4
    hd = c // h
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32)) * 0.5
    wid, valid = _rand_wid(12, b, nb, s)
    m = np.asarray(valid)[..., None]

    def headmajor(q, k, v):  # the route wid_flash_attention replaces
        def heads(x):
            return jnp.moveaxis(x.reshape(b, nb, s, h, hd), -2, -3)
        out = wid_window_attention(heads(q), heads(k), heads(v), valid, wid,
                                   True)
        return jnp.moveaxis(out, -3, -2).reshape(b, nb, s, c)

    ref_hm = headmajor(q, k, v)
    ref_xla = reference_wid_flash_attention(q, k, v, valid, wid, h)
    got = wid_flash_attention(q, k, v, valid, wid, h, interpret=True)
    np.testing.assert_allclose(np.asarray(ref_xla) * m,
                               np.asarray(ref_hm) * m, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(ref_hm) * m,
                               rtol=2e-5, atol=2e-5)

    tgt = jnp.asarray(rng.randn(b, nb, s, c).astype(np.float32))
    wm = valid[..., None].astype(jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(((fn(q, k, v) - tgt) * wm) ** 2)

    g_ref = jax.grad(loss(headmajor), argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss(lambda q, k, v: wid_flash_attention(
        q, k, v, valid, wid, h, interpret=True)), argnums=(0, 1, 2))(q, k, v)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(g_got[i]), np.asarray(g_ref[i]),
                                   rtol=2e-4, atol=2e-4, err_msg=f"grad {i}")
