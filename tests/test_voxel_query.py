import numpy as np
import jax.numpy as jnp

from gdmae_tpu.ops import sparse_conv3d as sc
from gdmae_tpu.ops.centernet import circle_nms


def test_voxel_query_finds_neighbors():
    shape = (4, 8, 8)
    vs = (0.5, 0.5, 0.5)
    pr = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)
    coords = jnp.array([[0, 0, 0], [0, 0, 1], [1, 2, 2], [3, 7, 7]], jnp.int32)
    mask = jnp.ones((4,), bool)
    index = sc.build_index(coords, mask, shape)
    centers = jnp.stack([
        (coords[:, 2] + 0.5) * vs[0] + pr[0],
        (coords[:, 1] + 0.5) * vs[1] + pr[1],
        (coords[:, 0] + 0.5) * vs[2] + pr[2],
    ], axis=-1)

    q = jnp.array([[0.3, 0.3, 0.3], [3.7, 3.7, 1.7], [2.0, 2.0, 2.0]])
    qv = jnp.ones((3,), bool)
    idx, cnt = sc.voxel_query(q, qv, index, centers, shape, vs, pr,
                              max_range=(2, 2, 2), radius=1.0, nsample=4)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    # first query near voxels 0 and 1
    assert cnt[0] == 2 and set(idx[0, :2]) == {0, 1}
    # second query near voxel 3 only
    assert cnt[1] == 1 and idx[1, 0] == 3
    # third query sees nothing within 1.0m
    assert cnt[2] == 0 and (idx[2] == -1).all()


def test_circle_nms_suppresses_near_centers():
    xy = jnp.array([[0., 0.], [0.5, 0.], [5., 5.], [5.2, 5.], [9., 9.]])
    sc_ = jnp.array([0.9, 0.8, 0.95, 0.5, 0.3])
    idx, mask, scores = circle_nms(xy, sc_, min_radius=1.0, post_maxsize=5)
    kept = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert kept == {0, 2, 4}
    assert abs(float(scores[0]) - 0.95) < 1e-6
