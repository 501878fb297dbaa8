"""SparseDecodeFuse == DeconvFuse + decode-site gather (values and grads).

The sparse MAE decoder (models/backbones_3d/sparse_decode.py) must compute
exactly the dense fuse's function at the decode sites: same params (the
module trees are name/shape compatible), same outputs in eval mode, and —
through the gather-only custom VJP — the same gradients w.r.t. every stage
token list and every fuse parameter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdmae_tpu.config import as_easy
from gdmae_tpu.models.backbones_3d.sparse_decode import SparseDecodeFuse
from gdmae_tpu.models.backbones_3d.spt_backbone import (
    DeconvFuse, scatter_pillars_to_canvas)
from gdmae_tpu.ops import window as window_ops

FUSE_CFG = as_easy({
    "x_conv1": {"UPSAMPLE_STRIDE": 1, "NUM_FILTER": 8, "NUM_UPSAMPLE_FILTER": 8},
    "x_conv2": {"UPSAMPLE_STRIDE": 2, "NUM_FILTER": 8, "NUM_UPSAMPLE_FILTER": 8},
    "x_conv3": {"UPSAMPLE_STRIDE": 4, "NUM_FILTER": 8, "NUM_UPSAMPLE_FILTER": 8},
})
SOURCES = ["x_conv1", "x_conv2", "x_conv3"]
NY, NX = 8, 8
B = 2


def _mk_source(rng, h, w, c, m):
    # m random occupied cells, raster-sorted
    toks = jnp.asarray(rng.randn(B, m, c), jnp.float32)
    coords = np.zeros((B, m, 2), np.int32)
    mask = np.zeros((B, m), bool)
    for bi in range(B):
        n = rng.randint(m // 2, m + 1)
        cells = np.sort(rng.choice(h * w, size=n, replace=False))
        coords[bi, :n, 0] = cells // w
        coords[bi, :n, 1] = cells % w
        mask[bi, :n] = True
    coords = jnp.asarray(coords)
    mask = jnp.asarray(mask)
    toks = toks * mask[..., None]
    c2t = window_ops.build_cell2tok(coords, mask, (h, w))
    return toks, coords, mask, c2t, (h, w)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    stage_tok = {
        "x_conv1": _mk_source(rng, 8, 8, 8, 24),
        "x_conv2": _mk_source(rng, 4, 4, 8, 10),
        "x_conv3": _mk_source(rng, 2, 2, 8, 4),
    }
    p = 12
    dec_coords = np.zeros((B, p, 2), np.int32)
    dec_valid = np.zeros((B, p), bool)
    for bi in range(B):
        n = rng.randint(p // 2, p + 1)
        cells = np.sort(rng.choice(NY * NX, size=n, replace=False))
        dec_coords[bi, :n, 0] = cells // NX
        dec_coords[bi, :n, 1] = cells % NX
        dec_valid[bi, :n] = True
    dec_coords = jnp.asarray(dec_coords)
    dec_valid = jnp.asarray(dec_valid)

    sparse = SparseDecodeFuse(
        fuse_cfg=FUSE_CFG, sources=SOURCES, full_hw=(NY, NX))
    variables = sparse.init(
        jax.random.PRNGKey(0), stage_tok, dec_coords, dec_valid, train=False)
    dense = DeconvFuse(fuse_cfg=FUSE_CFG, sources=SOURCES)
    return stage_tok, dec_coords, dec_valid, sparse, dense, variables


def _dense_feats(dense, variables, stage_tok, dec_coords, dec_valid):
    fmaps = {}
    for src, (toks, coords, mask, _, hw) in stage_tok.items():
        canvas, _ = scatter_pillars_to_canvas(toks, coords, mask, hw)
        fmaps[src] = canvas
    out = dense.apply(variables, fmaps, False)  # (B, NY, NX, C)
    flat = out.reshape(B, NY * NX, -1)
    idx = (dec_coords[..., 0] * NX + dec_coords[..., 1]).clip(0, NY * NX - 1)
    g = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return g * dec_valid[..., None]


def test_values_match_dense(setup):
    stage_tok, dec_coords, dec_valid, sparse, dense, variables = setup
    ref = _dense_feats(dense, variables, stage_tok, dec_coords, dec_valid)
    got = sparse.apply(variables, stage_tok, dec_coords, dec_valid, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_dense(setup):
    stage_tok, dec_coords, dec_valid, sparse, dense, variables = setup
    cot = jnp.asarray(
        np.random.RandomState(1).randn(B, dec_coords.shape[1],
                                       8).astype(np.float32))
    cot = cot * dec_valid[..., None]

    def loss_sparse(params, toks):
        st = {s: (toks[s],) + stage_tok[s][1:] for s in stage_tok}
        out = sparse.apply({"params": params, **{
            k: v for k, v in variables.items() if k != "params"}},
            st, dec_coords, dec_valid, train=False)
        return jnp.sum(out * cot)

    def loss_dense(params, toks):
        st = {s: (toks[s],) + stage_tok[s][1:] for s in stage_tok}
        vs = {"params": params, **{
            k: v for k, v in variables.items() if k != "params"}}
        return jnp.sum(_dense_feats(dense, vs, st, dec_coords, dec_valid) * cot)

    toks0 = {s: stage_tok[s][0] for s in stage_tok}
    gs_p, gs_t = jax.grad(loss_sparse, argnums=(0, 1))(
        variables["params"], toks0)
    gd_p, gd_t = jax.grad(loss_dense, argnums=(0, 1))(
        variables["params"], toks0)
    for s in toks0:
        np.testing.assert_allclose(
            np.asarray(gs_t[s]), np.asarray(gd_t[s]), rtol=1e-4, atol=1e-4,
            err_msg=f"token grads differ for {s}")
    flat_s = jax.tree_util.tree_leaves_with_path(gs_p)
    flat_d = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gd_p)}
    for k, v in flat_s:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_d[jax.tree_util.keystr(k)]),
            rtol=1e-4, atol=1e-4, err_msg=f"param grad differs at {k}")


def test_train_mode_runs_and_updates_stats(setup):
    stage_tok, dec_coords, dec_valid, sparse, dense, variables = setup
    out, mut = sparse.apply(
        variables, stage_tok, dec_coords, dec_valid, train=True,
        mutable=["batch_stats"])
    assert out.shape == (B, dec_coords.shape[1], 8)
    assert np.isfinite(np.asarray(out)).all()
    # deblock BN running stats must equal the dense path's (exact canvas
    # statistics from token sums)
    _, mut_d = dense.apply(
        variables, {
            src: scatter_pillars_to_canvas(*stage_tok[src][:3],
                                           stage_tok[src][4])[0]
            for src in stage_tok},
        True, mutable=["batch_stats"])
    for i in range(3):
        for field in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][f"deblock_bn_{i}"][field]),
                np.asarray(mut_d["batch_stats"][f"deblock_bn_{i}"][field]),
                rtol=1e-5, atol=1e-6,
                err_msg=f"deblock_bn_{i} running {field}")


def _dense_canvases(stage_tok):
    from gdmae_tpu.models.backbones_3d.spt_backbone import (
        scatter_pillars_to_canvas)
    return {
        src: scatter_pillars_to_canvas(*stage_tok[src][:3],
                                       stage_tok[src][4])[0]
        for src in stage_tok}


def test_hybrid_values_match_dense(setup):
    """HybridDecodeFuse == dense fuse + decode-site gather in eval mode."""
    from gdmae_tpu.models.backbones_3d.sparse_decode import HybridDecodeFuse
    stage_tok, dec_coords, dec_valid, _, dense, variables = setup
    hybrid = HybridDecodeFuse(fuse_cfg=FUSE_CFG, sources=SOURCES)
    ref = _dense_feats(dense, variables, stage_tok, dec_coords, dec_valid)
    got = hybrid.apply(variables, _dense_canvases(stage_tok), dec_coords,
                       dec_valid, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_grads_match_dense(setup):
    from gdmae_tpu.models.backbones_3d.sparse_decode import HybridDecodeFuse
    stage_tok, dec_coords, dec_valid, _, dense, variables = setup
    hybrid = HybridDecodeFuse(fuse_cfg=FUSE_CFG, sources=SOURCES)
    cot = jnp.asarray(
        np.random.RandomState(2).randn(B, dec_coords.shape[1],
                                       8).astype(np.float32))
    cot = cot * dec_valid[..., None]
    toks0 = {s: stage_tok[s][0] for s in stage_tok}

    def loss_hybrid(params, toks):
        st = {s: (toks[s],) + stage_tok[s][1:] for s in stage_tok}
        vs = {"params": params, **{
            k: v for k, v in variables.items() if k != "params"}}
        out = hybrid.apply(vs, _dense_canvases(st), dec_coords, dec_valid,
                           train=False)
        return jnp.sum(out * cot)

    def loss_dense(params, toks):
        st = {s: (toks[s],) + stage_tok[s][1:] for s in stage_tok}
        vs = {"params": params, **{
            k: v for k, v in variables.items() if k != "params"}}
        return jnp.sum(_dense_feats(dense, vs, st, dec_coords, dec_valid) * cot)

    gh_p, gh_t = jax.grad(loss_hybrid, argnums=(0, 1))(
        variables["params"], toks0)
    gd_p, gd_t = jax.grad(loss_dense, argnums=(0, 1))(
        variables["params"], toks0)
    for s in toks0:
        np.testing.assert_allclose(
            np.asarray(gh_t[s]), np.asarray(gd_t[s]), rtol=1e-4, atol=1e-4,
            err_msg=f"token grads differ for {s}")
    flat_d = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gd_p)}
    for k, v in jax.tree_util.tree_leaves_with_path(gh_p):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_d[jax.tree_util.keystr(k)]),
            rtol=1e-4, atol=1e-4, err_msg=f"param grad differs at {k}")


def test_fuse_split_equivalence():
    """conv(concat(a,b,c), W) == sum_i conv(x_i, W_i): the split conv_out
    form (avoids the (B, Ny, Nx, 384) concat through fwd+bwd) must agree
    with the concat form in values AND parameter gradients on the SAME
    param tree (checkpoint-identical; VERDICT r4 weak #5)."""
    import os
    from gdmae_tpu.models.backbones_3d.spt_backbone import DeconvFuse

    fuse_cfg = {
        "x_conv1": {"UPSAMPLE_STRIDE": 1, "NUM_UPSAMPLE_FILTER": 8},
        "x_conv2": {"UPSAMPLE_STRIDE": 2, "NUM_UPSAMPLE_FILTER": 8},
        "x_conv3": {"UPSAMPLE_STRIDE": 4, "NUM_UPSAMPLE_FILTER": 8},
    }
    sources = ["x_conv1", "x_conv2", "x_conv3"]
    rng = np.random.RandomState(3)
    fmaps = {
        "x_conv1": jnp.asarray(rng.randn(2, 16, 12, 6).astype(np.float32)),
        "x_conv2": jnp.asarray(rng.randn(2, 8, 6, 6).astype(np.float32)),
        "x_conv3": jnp.asarray(rng.randn(2, 4, 3, 6).astype(np.float32)),
    }
    fuse = DeconvFuse(fuse_cfg=fuse_cfg, sources=sources)

    def run(split, variables=None):
        old = os.environ.pop("GDMAE_FUSE_SPLIT", None)
        if split:
            os.environ["GDMAE_FUSE_SPLIT"] = "1"
        try:
            if variables is None:
                variables = fuse.init(jax.random.PRNGKey(0), fmaps, True)

            def loss(params):
                out, _ = fuse.apply(
                    {"params": params, **{k: v for k, v in variables.items()
                                          if k != "params"}},
                    fmaps, True, mutable=["batch_stats"])
                return (out.astype(jnp.float32) ** 2).sum(), out

            (lv, out), grads = jax.value_and_grad(
                loss, has_aux=True)(variables["params"])
            return variables, out, grads, lv
        finally:
            os.environ.pop("GDMAE_FUSE_SPLIT", None)
            if old is not None:
                os.environ["GDMAE_FUSE_SPLIT"] = old

    v_cat, out_cat, g_cat, l_cat = run(False)
    v_split, out_split, g_split, l_split = run(True, variables=v_cat)

    # identical param trees (checkpoint compatibility)
    ka = sorted(jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_flatten_with_path(
                    v_cat["params"])[0])
    kb = sorted(jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_flatten_with_path(
                    v_split["params"])[0])
    assert ka == kb

    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_cat),
                               rtol=2e-5, atol=2e-5)
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_flatten_with_path(g_cat)[0],
            jax.tree_util.tree_flatten_with_path(g_split)[0]):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa))
