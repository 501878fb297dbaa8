"""Dense-window encoder vs bucketed encoder equivalence.

With 8x8 windows, every shipped DROP_INFO has max_tokens == 64 == window
cells, so the bucket machinery never drops tokens (only window-capacity
overflow can, and ample caps rule that out here).  The dense-window path
must therefore produce identical features at every occupied cell.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdmae_tpu.ops import window as window_ops
from gdmae_tpu.models.model_utils.sst_layers import (
    CanvasShiftBlock, DenseWindowShiftBlock)

# full-model compiles: slow tier (deselect via pytest.ini addopts)
pytestmark = pytest.mark.slow


def _setup(b=2, grid=(16, 24), n_occ=40, c=32, seed=0):
    rng = np.random.RandomState(seed)
    ny, nx = grid
    coords = np.zeros((b, n_occ + 8, 2), np.int32)
    mask = np.zeros((b, n_occ + 8), bool)
    for bi in range(b):
        cells = np.sort(rng.choice(ny * nx, n_occ, replace=False))
        coords[bi, :n_occ, 0] = cells // nx
        coords[bi, :n_occ, 1] = cells % nx
        mask[bi, :n_occ] = True
    tokens = rng.standard_normal((b, n_occ + 8, c)).astype(np.float32)
    tokens[~mask] = 0.0
    return jnp.asarray(tokens), jnp.asarray(coords), jnp.asarray(mask)


@pytest.mark.parametrize("cosine", [True, False])
def test_dense_matches_bucket(cosine):
    grid = (16, 24)
    window = (8, 8)
    c = 32
    tokens, coords, mask = _setup(c=c)
    b, m, _ = tokens.shape
    occ = window_ops.occupancy_from_coords(coords, mask, grid)

    drop_specs = window_ops.drop_specs_from_cfg({
        "0": {"max_tokens": 16, "drop_range": [0, 16]},
        "1": {"max_tokens": 32, "drop_range": [16, 32]},
        "2": {"max_tokens": 64, "drop_range": [32, 100000]},
    })
    caps = (16, 16, 16)  # ample: at most 12 windows per shift
    c2t = window_ops.build_cell2tok(coords, mask, grid)
    tcell = window_ops.token_cell_index(coords, mask, grid)
    plans = [
        window_ops.plan_to_tokens(
            window_ops.build_bucket_plan(
                occ, grid, window, shift, drop_specs, caps),
            c2t, tcell, m)
        for shift in ((0, 0), (4, 4))
    ]
    assert int(plans[0].overflow) == 0 and int(plans[1].overflow) == 0
    # ample caps: every valid token is covered by both plans
    for plan in plans:
        covered = np.asarray(plan.inv_idx < plan.total_tokens)
        assert (covered == np.asarray(mask)).all()

    kw = dict(d_model=c, nhead=4, dim_feedforward=2 * c, window=window,
              cosine=cosine)
    bucket = CanvasShiftBlock(**kw)
    dense = DenseWindowShiftBlock(**kw)

    params = bucket.init(jax.random.PRNGKey(0), tokens, plans)
    rows_out = bucket.apply(params, tokens, plans)

    cv = np.zeros((b, grid[0], grid[1], c), np.float32)
    co_np, mk_np, tk_np = np.asarray(coords), np.asarray(mask), np.asarray(tokens)
    for bi in range(b):
        for mi in range(m):
            if mk_np[bi, mi]:
                cv[bi, co_np[bi, mi, 0], co_np[bi, mi, 1]] = tk_np[bi, mi]
    canvas_out = dense.apply(params, jnp.asarray(cv), occ)  # same param tree

    got = jax.vmap(
        lambda cv, co: cv[co[:, 0], co[:, 1]]
    )(canvas_out, coords)
    want = np.asarray(rows_out)
    got = np.asarray(got * mask[..., None])
    want = want * np.asarray(mask)[..., None]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dense_empty_cells_stay_zero():
    grid = (16, 24)
    tokens, coords, mask = _setup()
    occ = window_ops.occupancy_from_coords(coords, mask, grid)
    dense = DenseWindowShiftBlock(
        d_model=32, nhead=4, dim_feedforward=64, window=(8, 8))
    canvas, _ = None, None
    b, m, c = tokens.shape
    cv = np.zeros((b, grid[0], grid[1], c), np.float32)
    co = np.asarray(coords)
    for bi in range(b):
        for mi in range(m):
            if mask[bi, mi]:
                cv[bi, co[bi, mi, 0], co[bi, mi, 1]] = tokens[bi, mi]
    params = dense.init(jax.random.PRNGKey(1), jnp.asarray(cv), occ)
    out = np.asarray(dense.apply(params, jnp.asarray(cv), occ))
    assert np.abs(out[~np.asarray(occ)]).max() == 0.0


def test_sst_block_dense_mode_shapes():
    """SSTBlock dense path: stride-2 stage consumes a canvas and returns the
    downsampled canvas + dilated occupancy, no token lists."""
    from gdmae_tpu.config import as_easy
    from gdmae_tpu.models.backbones_3d.spt_backbone import SSTBlock

    grid = (16, 24)
    tokens, coords, mask = _setup()
    occ = window_ops.occupancy_from_coords(coords, mask, grid)
    blk_cfg = {
        "PREPROCESS": {
            "WINDOW_SHAPE": [8, 8, 1],
            "DROP_INFO": {
                "train": {"0": {"max_tokens": 64, "drop_range": [0, 100000]}},
                "test": {"0": {"max_tokens": 64, "drop_range": [0, 100000]}},
            },
            "POS_TEMPERATURE": 1000,
            "NORMALIZE_POS": False,
        },
        "ENCODER": {
            "NUM_BLOCKS": 1, "STRIDE": 2, "D_MODEL": 48, "NHEAD": 4,
            "DIM_FEEDFORWARD": 96, "ACTIVATION": "gelu",
            "LAYER_CFG": {"cosine": True, "tau_min": 0.01},
        },
    }
    blk = SSTBlock(block_cfg=blk_cfg, grid_hw=grid, win_caps=(8,),
                   window_mode="dense", remat=False)
    variables = blk.init(
        {"params": jax.random.PRNGKey(0)},
        tokens, coords, mask, occ, None, train=False)
    (t2, c2, m2, occ2, canvas2, _c2t), _ = blk.apply(
        variables, tokens, coords, mask, occ, None, train=False,
        mutable=["batch_stats"])
    assert t2 is None and c2 is None and m2 is None
    assert occ2.shape == (2, 8, 12)
    assert canvas2.shape == (2, 8, 12, 48)
    # occupancy must be the 3x3-dilated downsample of the input occupancy
    assert bool(occ2.any())
    assert np.abs(np.asarray(canvas2)[~np.asarray(occ2)]).max() == 0.0
