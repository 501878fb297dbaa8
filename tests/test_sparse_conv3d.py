"""Sparse 3D conv ops vs a dense numpy conv oracle."""
import numpy as np
import jax.numpy as jnp

from gdmae_tpu.ops import sparse_conv3d as sc


def dense_conv3d_oracle(dense, weight, kernel, stride, padding):
    """dense: (nz, ny, nx, Cin); weight: (K, Cin, Cout) tap-major z,y,x."""
    nz, ny, nx, cin = dense.shape
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    oz = (nz + 2 * pz - kz) // sz + 1
    oy = (ny + 2 * py - ky) // sy + 1
    ox = (nx + 2 * px - kx) // sx + 1
    cout = weight.shape[-1]
    pad = np.pad(dense, ((pz, pz), (py, py), (px, px), (0, 0)))
    out = np.zeros((oz, oy, ox, cout))
    w = weight.reshape(kz, ky, kx, cin, cout)
    for z in range(oz):
        for y in range(oy):
            for x in range(ox):
                patch = pad[z*sz:z*sz+kz, y*sy:y*sy+ky, x*sx:x*sx+kx]
                out[z, y, x] = np.einsum("zyxc,zyxcd->d", patch, w)
    return out


def make_sparse(rng, shape, v, cap, cin):
    nz, ny, nx = shape
    lin = rng.choice(nz * ny * nx, v, replace=False)
    coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx], 1).astype(np.int32)
    feats = rng.randn(v, cin).astype(np.float32)
    pc = np.zeros((cap, 3), np.int32)
    pf = np.zeros((cap, cin), np.float32)
    pc[:v] = coords
    pf[:v] = feats
    mask = np.arange(cap) < v
    dense = np.zeros((*shape, cin), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return pf, pc, mask, dense


def test_subm_conv_matches_dense_at_input_sites():
    rng = np.random.RandomState(0)
    shape = (8, 12, 10)
    pf, pc, mask, dense = make_sparse(rng, shape, 40, 64, 4)
    w = rng.randn(27, 4, 6).astype(np.float32)
    out = np.asarray(sc.subm_conv3d(
        jnp.asarray(pf), jnp.asarray(pc), jnp.asarray(mask), shape, jnp.asarray(w)))
    oracle = dense_conv3d_oracle(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    for i in range(40):
        z, y, x = pc[i]
        np.testing.assert_allclose(out[i], oracle[z, y, x], rtol=1e-4, atol=1e-4)
    assert np.all(out[40:] == 0)


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    shape = (9, 12, 14)
    pf, pc, mask, dense = make_sparse(rng, shape, 50, 64, 3)
    w = rng.randn(27, 3, 5).astype(np.float32)
    oc, om, num_out, out_shape = sc.downsample_coords(
        jnp.asarray(pc), jnp.asarray(mask), shape, out_cap=512)
    assert int(num_out) <= 512
    out = np.asarray(sc.sparse_conv3d(
        jnp.asarray(pf), jnp.asarray(pc), jnp.asarray(mask), shape,
        jnp.asarray(w), oc, om, out_shape))
    oracle = dense_conv3d_oracle(dense, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    oc_np, om_np = np.asarray(oc), np.asarray(om)
    # every output site with nonzero oracle must be in the sparse output set
    nz_sites = {tuple(p) for p in np.argwhere(np.abs(oracle).sum(-1) > 1e-6)}
    got_sites = {tuple(oc_np[i]) for i in range(len(oc_np)) if om_np[i]}
    assert nz_sites <= got_sites
    for i in range(len(oc_np)):
        if om_np[i]:
            z, y, x = oc_np[i]
            np.testing.assert_allclose(out[i], oracle[z, y, x], rtol=1e-4, atol=1e-4)


def test_asymmetric_kernel_stride():
    # conv_out of VoxelBackBone8x: kernel (3,1,1), stride (2,1,1), pad 0
    rng = np.random.RandomState(2)
    shape = (5, 6, 7)
    pf, pc, mask, dense = make_sparse(rng, shape, 30, 48, 2)
    w = rng.randn(3, 2, 4).astype(np.float32)
    oc, om, _, out_shape = sc.downsample_coords(
        jnp.asarray(pc), jnp.asarray(mask), shape, out_cap=48,
        kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0))
    out = np.asarray(sc.sparse_conv3d(
        jnp.asarray(pf), jnp.asarray(pc), jnp.asarray(mask), shape,
        jnp.asarray(w), oc, om, out_shape,
        kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0)))
    oracle = dense_conv3d_oracle(dense, w, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    oc_np, om_np = np.asarray(oc), np.asarray(om)
    for i in range(len(oc_np)):
        if om_np[i]:
            z, y, x = oc_np[i]
            np.testing.assert_allclose(out[i], oracle[z, y, x], rtol=1e-4, atol=1e-4)


def test_to_dense_roundtrip():
    rng = np.random.RandomState(3)
    shape = (4, 5, 6)
    pf, pc, mask, dense = make_sparse(rng, shape, 20, 32, 3)
    got = np.asarray(sc.to_dense(jnp.asarray(pf), jnp.asarray(pc), jnp.asarray(mask), shape))
    np.testing.assert_allclose(got, dense, rtol=1e-6)
