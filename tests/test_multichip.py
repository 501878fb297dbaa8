"""Multi-device data-parallel correctness.

conftest.py forces an 8-device CPU platform, so these tests exercise the
real mesh runtime (gdmae_tpu/parallel/mesh.py) the way the driver's
``dryrun_multichip`` does: full train step jitted over an 8-device ``data``
mesh with the state replicated and the batch sharded.  The sharded step
must agree numerically with the plain single-device step — GSPMD semantics
are global, so any disagreement beyond float-reduction noise is a sharding
bug (reference semantics: DDP grad all-reduce, tools/train_utils/
train_utils.py:51 + pcdet/utils/commu_utils.py).
"""
import numpy as np
import pytest


def _setup(n_devices):
    import jax

    import __graft_entry__ as g
    from gdmae_tpu.runtime import optimization, train as train_lib

    # shrink=True: tiny widths/depths, same step structure — the full-size
    # compile is minutes on a single host core (see _shrink_model_cfg)
    cfg, meta, model = g._small_setup(grid=32, max_points=512,
                                      max_pillars=256, shrink=True)
    batch = g._synth_batch(meta, b=n_devices, n=512)
    params, batch_stats = train_lib.init_model(model, batch, seed=0)
    tx, _ = optimization.build_optimizer(cfg.OPTIMIZATION, 10, 2)
    state = train_lib.TrainState.create(params, batch_stats, tx)
    return model, state, batch


@pytest.mark.slow
def test_parallel_step_matches_single_device():
    import jax

    from gdmae_tpu.parallel import mesh as mesh_lib
    from gdmae_tpu.runtime import train as train_lib

    n = 8
    assert len(jax.devices()) >= n, jax.devices()
    model, state, batch = _setup(n)
    rng = jax.random.PRNGKey(1)

    step = train_lib.make_train_step(model, donate=False)
    ref_state, ref_metrics = step(state, batch, rng)
    ref_loss = float(ref_metrics["loss"])
    assert np.isfinite(ref_loss)

    mesh = mesh_lib.make_mesh(jax.devices()[:n])
    pstep = mesh_lib.make_parallel_train_step(step, mesh)
    pstate = jax.device_put(state, mesh_lib.replicated(mesh))
    sharded = mesh_lib.shard_batch(batch, mesh)
    # the batch really is sharded across all 8 devices
    assert len(sharded["points"].sharding.device_set) == n
    new_state, metrics = pstep(pstate, sharded, rng)

    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=1e-4, atol=1e-5)
    # params after one optimizer step agree leaf-by-leaf.  Tolerance: adam
    # divides the gradient by sqrt(v)+eps, so for near-zero-gradient params
    # float-reduction noise in the 8-way psum is amplified to ~1e-3 scale
    # after the update — rtol alone can't cover it.
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_par = jax.tree_util.tree_leaves_with_path(new_state.params)
    assert len(flat_ref) == len(flat_par)
    for (path_r, leaf_r), (path_p, leaf_p) in zip(flat_ref, flat_par):
        assert path_r == path_p
        np.testing.assert_allclose(
            np.asarray(leaf_p), np.asarray(leaf_r), rtol=2e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path_r))


def test_all_gather_object_single_process():
    from gdmae_tpu.parallel import mesh as mesh_lib

    obj = {"a": np.arange(3), "b": "x"}
    out = mesh_lib.all_gather_object(obj)
    assert len(out) == 1 and out[0] is obj


def test_shard_batch_layout():
    import jax

    from gdmae_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(jax.devices()[:4])
    batch = {"x": np.zeros((8, 5), np.float32), "n": 3}
    out = mesh_lib.shard_batch(batch, mesh)
    assert out["n"] == 3
    assert len(out["x"].sharding.device_set) == 4
    shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shard_shapes == {(2, 5)}
