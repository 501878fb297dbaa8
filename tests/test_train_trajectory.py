"""Training-dynamics parity vs the torch reference.

Forward parity (test_torch_import.py) proves the graphs agree at one point;
these tests prove the TRAINING DYNAMICS agree — everything forward parity
cannot see: gradients through every layer, train-mode BatchNorm batch
statistics + running-stat updates, and the fastai OneCycle/true-wd optimizer
chain (reference hot loop tools/train_utils/train_utils.py:34-61, optimizer
construction tools/train_utils/optimization/__init__.py:11-36).

Structure (why not "K Adam steps must track at 1e-3"): Adam's step-0 update
is lr*sign(g) elementwise, so any tiny-gradient element whose sign differs
by float noise between frameworks moves +-2*lr apart — Adam trajectories
fundamentally cannot track at tight tolerance across frameworks even when
gradients agree at 1e-6 (measured: grad-norm 15.555570 vs 15.555583, yet
step-1 loss diverged 1%).  Instead we pin each link of the chain:

 1. per-tensor GRADIENT parity at step 0 (covers bwd through every layer);
 2. K-step SGD loss trajectory + final BN running stats (update ~ grad, so
    framework noise stays linear — covers train-mode BN batch statistics,
    clip_grad_norm, and multi-step compounding);
 3. adam_onecycle OPTIMIZER-CHAIN parity on identical synthetic gradients
    vs the real fastai OptimWrapper+OneCycle (covers true-wd, bias
    correction, the injected momentum/lr schedules).

No dataset files exist in-env, so a fixed synthetic scene stands in for the
loader (the reference's QA oracle is end-metric parity, SURVEY §4 — these
are the strongest in-env proxies).
"""
from functools import partial

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

from tests import ref_loader
from gdmae_tpu.runtime import torch_import

# gradient/trajectory parity vs torch requires torch F.gelu's exact erf
# form in the encoder FFNs (runtime default is the tanh fast path; the
# tanh/erf delta is asserted separately in test_gelu_fast_path_deviation)


@pytest.fixture(autouse=True)
def _exact_gelu(monkeypatch):
    monkeypatch.setenv("GDMAE_EXACT_GELU", "1")
    # torch_scatter first-winner tie routing (runtime default is the
    # tie-splitting backward — identical on tie-free realistic data, see
    # test_segmax_split_gradient_deviation)
    monkeypatch.setenv("GDMAE_SEGMAX_BWD", "exact")

K_STEPS = 6
SGD_LR = 0.01
CLIP = 10.0


def _small_meta():
    from gdmae_tpu.models.detectors.detector3d_template import DatasetMeta
    return DatasetMeta(
        class_names=["Car", "Pedestrian", "Cyclist"],
        point_cloud_range=[0, -10.24, -3, 20.48, 10.24, 1],
        voxel_size=[0.32, 0.32, 4],
        grid_size=[64, 64],
        num_point_features=4,
        max_points=2048,
        max_pillars=2048,
    )


def _synth_scene(seed, n):
    """Points + gt boxes with a NON-DEGENERATE anchor assignment.

    The reference assigner force-matches every gt to the anchors whose
    overlap EXACTLY equals the gt's best overlap (float equality,
    axis_aligned_target_assigner.py:155-157).  A gt much larger than the
    anchor fully contains many anchors at identical IoU, so the force set
    is a huge exact-tie set that any last-bit IoU difference between
    frameworks re-shuffles.  Real KITTI gts match their class anchors in
    size; mirror that: per-class dims near the anchor dims (x 0.95-1.15),
    small rotations, generic (non-grid-symmetric) positions — the best
    anchor per gt is then unique and both assigners agree exactly.
    """
    rng = np.random.RandomState(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0.5, 20.0, n)
    pts[:, 1] = rng.uniform(-10.0, 10.0, n)
    pts[:, 2] = rng.uniform(-2.5, 0.5, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    anchor_dims = {1: (3.9, 1.6, 1.56), 2: (0.8, 0.6, 1.73), 3: (1.76, 0.6, 1.73)}
    classes = [1, 1, 2, 3, 3]
    gt = np.zeros((1, 5, 8), np.float32)
    for gi, cls in enumerate(classes):
        dx, dy, dz = (d * rng.uniform(0.95, 1.15) for d in anchor_dims[cls])
        gt[0, gi] = [rng.uniform(3, 18), rng.uniform(-8, 8), -1.0,
                     dx, dy, dz, rng.uniform(-0.25, 0.25), cls]
    return pts, gt


@pytest.fixture(scope="module")
def det_pair():
    """The gd_mae.yaml detection graph built twice with IDENTICAL weights:
    reference torch modules (train mode) and our flax network."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from pathlib import Path
    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import build_network
    from gdmae_tpu.runtime import train as train_lib

    repo = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(repo / "tools/cfgs/kitti_models/gd_mae.yaml"))
    meta = _small_meta()
    grid = np.array([64, 64, 1])
    pcr = np.array(meta.point_cloud_range, np.float32)
    vsz = [0.32, 0.32, 4.0]

    dyn_vfe = ref_loader.load_ref("pcdet.models.backbones_3d.vfe.dyn_vfe")
    spt = ref_loader.load_ref("pcdet.models.backbones_3d.spt_backbone")
    bev = ref_loader.load_ref("pcdet.models.backbones_2d.sst_bev_backbone")
    heads = ref_loader.load_ref("pcdet.models.dense_heads.anchor_head_single")

    torch.manual_seed(0)

    class RefDet(nn.Module):
        def __init__(self):
            super().__init__()
            self.vfe = dyn_vfe.DynVFE(
                model_cfg=cfg.MODEL.VFE, num_point_features=4,
                voxel_size=vsz, point_cloud_range=pcr, grid_size=grid)
            self.backbone_3d = spt.SPTBackbone(
                model_cfg=cfg.MODEL.BACKBONE_3D, input_channels=128,
                grid_size=np.array([64, 64]), voxel_size=vsz,
                point_cloud_range=pcr)
            self.backbone_2d = bev.SSTBEVBackbone(
                model_cfg=cfg.MODEL.BACKBONE_2D)
            self.dense_head = heads.AnchorHeadSingle(
                model_cfg=cfg.MODEL.DENSE_HEAD, input_channels=128,
                num_class=3, class_names=list(cfg.CLASS_NAMES),
                grid_size=grid, point_cloud_range=pcr,
                predict_boxes_when_training=False)

        def forward(self, bd):
            for m in (self.vfe, self.backbone_3d, self.backbone_2d,
                      self.dense_head):
                bd = m(bd)
            loss, tb = self.dense_head.get_loss()
            return loss

    ref_model = RefDet().train()
    sd0 = {k: v.detach().clone().numpy()
           for k, v in ref_model.state_dict().items()}

    pts, gt = _synth_scene(4, meta.max_points)

    cfg.MODEL.BACKBONE_3D.pop("TPU_WINDOW_CAPS", None)
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    batch = {"points": jnp.asarray(pts[None]),
             "point_mask": jnp.ones((1, meta.max_points), bool),
             "gt_boxes": jnp.asarray(gt)}
    with jax.default_matmul_precision("highest"):
        params, batch_stats = train_lib.init_model(model, batch, seed=0)
        params, batch_stats, report = torch_import.import_torch_state(
            sd0, params, batch_stats)
    assert report["unmapped"] == [], report["unmapped"][:10]
    assert report["skipped"] == [], report["skipped"][:10]

    # deconv strides from the FUSE_LAYER config — the export's 1x1-relayout
    # of deblock kernels needs them (see test_torch_import roundtrip)
    strides = {}
    for i, src in enumerate(cfg.MODEL.BACKBONE_3D.FEATURES_SOURCE):
        s = int(cfg.MODEL.BACKBONE_3D.FUSE_LAYER[src].UPSAMPLE_STRIDE)
        strides[f"backbone_3d/fuse/deblock_{i}/kernel"] = s

    return dict(cfg=cfg, meta=meta, ref_model=ref_model, sd0=sd0,
                model=model, params=params, batch_stats=batch_stats,
                batch=batch, pts=pts, gt=gt, deconv_strides=strides)


def _ref_batch(torch, pts, gt):
    n = pts.shape[0]
    t_pts = torch.as_tensor(
        np.concatenate([np.zeros((n, 1), np.float32), pts], axis=1))
    return {"points": t_pts, "batch_size": 1,
            "gt_boxes": torch.as_tensor(gt)}


def _load_sd(ref_model, sd0):
    import torch
    ref_model.load_state_dict({k: torch.as_tensor(v) for k, v in sd0.items()})


def test_step0_gradient_parity(det_pair):
    """d(loss)/d(theta) per tensor matches the reference backward.

    Runs under ``jax.default_matmul_precision("highest")``: the DEFAULT
    precision lowers fp32 matmuls to bf16 passes (TPU MXU semantics, and
    XLA:CPU mirrors it on avx512-bf16 hosts) which injects ~4e-3 relative
    noise per matmul — fine for training, but it would drown the parity
    tolerance this test enforces.

    Tolerances are module-aware because the SST encoder's backward is
    ill-conditioned in fp32: the torch reference's OWN f32 gradients differ
    from its f64 gradients by median 7.4e-3 / max 4.3e-2 in `sst_blocks`
    (measured via tools/experiments/dbg_traj64.py — train-mode BN batch
    stats + deep masked-softmax chains amplify round-off), so per-tensor
    2e-3 there would flag pure noise.  Downstream modules (dense head,
    BEV backbone, fuse deblocks) are well-conditioned and keep the strict
    gate; the encoder+VFE group is gated on its MEDIAN (coherent semantic
    errors — e.g. the tanh-vs-erf gelu mismatch this test caught — lift
    the median to >=1.6e-2, while conditioning noise sits at ~4e-3).
    """
    import torch
    p = det_pair
    _load_sd(p["ref_model"], p["sd0"])
    p["ref_model"].zero_grad()
    loss = p["ref_model"](_ref_batch(torch, p["pts"], p["gt"]))
    loss.backward()
    ref_grads = {k: prm.grad.detach().numpy()
                 for k, prm in p["ref_model"].named_parameters()
                 if prm.grad is not None}

    def loss_fn(params):
        out, _ = p["model"].apply(
            {"params": params, "batch_stats": p["batch_stats"]},
            p["batch"], train=True,
            rngs={"mae_mask": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return out["loss"]

    with jax.default_matmul_precision("highest"):
        jloss, grads = jax.value_and_grad(loss_fn)(p["params"])
    np.testing.assert_allclose(float(jloss), float(loss.item()), rtol=1e-4)

    # export the gradient pytree through the same name-mapped layout
    # transforms as the weights (every transform is a permutation/reshape,
    # so it maps gradients exactly)
    got = torch_import.export_torch_state(
        grads, deconv_strides=p["deconv_strides"])
    checked, bad, noisy_rels = 0, [], []
    for name, ref_g in ref_grads.items():
        assert name in got, f"gradient for {name} not exported"
        g = np.asarray(got[name], np.float64)
        r = np.asarray(ref_g, np.float64)
        rn = np.linalg.norm(r)
        if rn < 1e-10:  # dead tensor on both sides
            assert np.linalg.norm(g) < 1e-8, name
            continue
        rel = np.linalg.norm(g - r) / rn
        checked += 1
        ill_conditioned = name.startswith(("backbone_3d.sst_blocks", "vfe"))
        if ill_conditioned:
            noisy_rels.append(rel)
        if rel > (6e-2 if ill_conditioned else 2e-3):
            bad.append((name, rel, rn))
    assert checked > 100, checked
    assert not bad, bad[:20]
    noisy_rels.sort()
    assert noisy_rels and noisy_rels[len(noisy_rels) // 2] < 8e-3, (
        "median encoder-gradient error above the fp32 conditioning floor: "
        f"{noisy_rels[len(noisy_rels) // 2]:.2e}")


def test_k_step_sgd_trajectory_and_bn_stats(det_pair):
    """K fwd+bwd+clip+SGD steps: loss curves track at 1e-3 and the BN
    running statistics agree after K train-mode updates (covers batch-stat
    computation, the torch (1-m)*run + m*batch update with torch-default vs
    (1e-3, 0.01) module-specific hyperparams, and unbiased-variance use)."""
    import torch
    from torch.nn.utils import clip_grad_norm_
    import optax
    from gdmae_tpu.runtime import train as train_lib

    p = det_pair
    _load_sd(p["ref_model"], p["sd0"])
    opt = torch.optim.SGD(p["ref_model"].parameters(), lr=SGD_LR)
    ref_losses = []
    for _ in range(K_STEPS):
        opt.zero_grad()
        loss = p["ref_model"](_ref_batch(torch, p["pts"], p["gt"]))
        loss.backward()
        clip_grad_norm_(p["ref_model"].parameters(), CLIP)
        opt.step()
        ref_losses.append(float(loss.item()))

    tx = optax.chain(optax.clip_by_global_norm(CLIP), optax.sgd(SGD_LR))
    with jax.default_matmul_precision("highest"):
        state = train_lib.TrainState.create(p["params"], p["batch_stats"], tx)
        step = train_lib.make_train_step(p["model"], donate=False)
        key = jax.random.PRNGKey(0)
        got_losses = []
        for _ in range(K_STEPS):
            state, metrics = step(state, p["batch"], key)
            got_losses.append(float(metrics["loss"]))

    # per-step tolerance schedule: step-0 is the (bit-exact) forward, and
    # the fp32 backward-conditioning noise of the SST encoder (~4e-3 per
    # gradient, see test_step0_gradient_parity) compounds ~x3-4 per SGD
    # step — measured trajectories split 0 / 2e-5 / 3e-4 / 6e-4 / 1e-3 /
    # 1e-2 (the late jump is a discrete ReLU/max tie flip).  Semantic bugs
    # break the EARLY steps: the tanh-vs-erf gelu mismatch shifted step 0.
    rtols = [1e-5, 1e-4, 1e-3, 2e-3, 4e-3, 2.5e-2]
    for i, (g, r) in enumerate(zip(got_losses, ref_losses)):
        np.testing.assert_allclose(
            g, r, rtol=rtols[i], atol=1e-5,
            err_msg=f"step {i}: ref={ref_losses} got={got_losses}")
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-4  # it really trained

    # BN running stats after K train-mode steps
    ref_sd = {k: v.detach().numpy()
              for k, v in p["ref_model"].state_dict().items()}
    got_sd = torch_import.export_torch_state(
        state.params, state.batch_stats,
        deconv_strides=p["deconv_strides"])
    n_stats = 0
    for name, rv in ref_sd.items():
        if "running_mean" not in name and "running_var" not in name:
            continue
        assert name in got_sd, name
        # atol 1e-3: the stats are EMAs of batch moments whose inputs carry
        # the compounding late-step parameter noise measured above (small
        # near-zero entries otherwise flag ~4e-4 absolute wiggle)
        np.testing.assert_allclose(
            np.asarray(got_sd[name]), rv, rtol=2e-3, atol=1e-3,
            err_msg=name)
        n_stats += 1
    assert n_stats >= 30, n_stats


def test_adam_onecycle_chain_parity():
    """The full adam_onecycle update chain — Adam with scheduled beta1 and
    bias correction, true (decoupled, lr-scaled) weight decay, OneCycle
    lr/momentum — matches the reference fastai OptimWrapper bitwise-close
    on identical synthetic gradients (reference fastai_optim.py:135-153,
    learning_schedules_fastai.py:60-78)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from gdmae_tpu.runtime import optimization

    fastai_optim = ref_loader.load_ref(
        "tools_ref.train_utils.optimization.fastai_optim")
    fastai_sched = ref_loader.load_ref(
        "tools_ref.train_utils.optimization.learning_schedules_fastai")

    lr_max, moms, div, pct, wd = 3e-3, (0.95, 0.85), 10.0, 0.4, 0.01
    iters, epochs = 8, 3
    total = iters * epochs

    torch.manual_seed(3)
    lin1 = nn.Linear(17, 9)
    lin2 = nn.Linear(9, 5)
    net = nn.Sequential(lin1, lin2)
    tensors = list(net.parameters())
    rng = np.random.RandomState(7)
    base_grads = [rng.randn(*t.shape).astype(np.float32) for t in tensors]

    opt = fastai_optim.OptimWrapper.create(
        partial(torch.optim.Adam, betas=(0.9, 0.99)), lr_max, [net],
        wd=wd, true_wd=True, bn_wd=True)
    sched = fastai_sched.OneCycle(opt, total, lr_max, list(moms), div, pct)
    for it in range(total):
        sched.step(it)
        opt.zero_grad()
        scale = 1.0 + 0.25 * np.sin(0.7 * it)  # step-varying gradients
        loss = sum((t * torch.as_tensor(g * scale)).sum()
                   for t, g in zip(tensors, base_grads))
        loss.backward()
        opt.step()
    ref_final = [t.detach().numpy() for t in tensors]

    class OC(dict):
        __getattr__ = dict.__getitem__
    oc = OC(OPTIMIZER="adam_onecycle", LR=lr_max, WEIGHT_DECAY=wd,
            MOMS=list(moms), DIV_FACTOR=div, PCT_START=pct,
            GRAD_NORM_CLIP=0.0)
    tx, _ = optimization.build_optimizer(oc, iters, epochs)
    # restart from the SAME init as the torch side
    torch.manual_seed(3)
    lin1b = nn.Linear(17, 9)
    lin2b = nn.Linear(9, 5)
    params = {f"p{i}": jnp.asarray(t.detach().numpy())
              for i, t in enumerate(nn.Sequential(lin1b, lin2b).parameters())}
    opt_state = tx.init(params)
    import optax
    for it in range(total):
        scale = 1.0 + 0.25 * np.sin(0.7 * it)
        grads = {f"p{i}": jnp.asarray(g * np.float32(scale))
                 for i, g in enumerate(base_grads)}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    for i, ref in enumerate(ref_final):
        np.testing.assert_allclose(
            np.asarray(params[f"p{i}"]), ref, rtol=1e-5, atol=1e-7,
            err_msg=f"param {i}")


def test_gelu_fast_path_gradient_deviation(det_pair):
    """Pin the gradient deviation of the tanh-gelu fast path (runtime
    default, sst_layers.gelu) vs the exact erf form on the detection graph.

    Measured: median 1.6e-2 / max <6e-2 relative per-tensor — about 2x the
    fp32 backward-conditioning floor of the encoder (median 7.4e-3,
    torch-f32-vs-f64, test_step0_gradient_parity docstring).  This is a
    COHERENT ~1e-3 activation-scale function change (torch
    F.gelu(approximate='tanh') — a standard, training-neutral
    substitution), not noise; the gates here freeze that envelope so a
    future change that widens the fast path's deviation (or breaks the
    erf flag) fails loudly.  Torch-parity suites always pin
    GDMAE_EXACT_GELU=1."""
    p = det_pair

    def grads_with(exact):
        import os
        old = os.environ.pop("GDMAE_EXACT_GELU", None)
        if exact:
            os.environ["GDMAE_EXACT_GELU"] = "1"
        try:
            def loss_fn(params):
                out, _ = p["model"].apply(
                    {"params": params, "batch_stats": p["batch_stats"]},
                    p["batch"], train=True,
                    rngs={"mae_mask": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"])
                return out["loss"]
            with jax.default_matmul_precision("highest"):
                # fresh trace each call: the env is read at trace time
                return jax.value_and_grad(loss_fn)(p["params"])
        finally:
            os.environ.pop("GDMAE_EXACT_GELU", None)
            if old is not None:
                os.environ["GDMAE_EXACT_GELU"] = old

    loss_e, g_exact = grads_with(True)
    loss_t, g_tanh = grads_with(False)
    np.testing.assert_allclose(float(loss_t), float(loss_e), rtol=1e-3)

    # unlike the torch-parity test, BOTH sides here compute (slightly)
    # different functions, so every downstream tensor legitimately shifts
    # by the activation delta (~1e-3..4e-3 measured, incl. backbone_2d and
    # the fuse) — gate ALL tensors against the reference's own fp32
    # conditioning envelope (median 7.4e-3 / max 4.3e-2 torch-f32-vs-f64)
    flat_e = jax.tree_util.tree_flatten_with_path(g_exact)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(g_tanh)[0]
    rels, bad, checked = [], [], 0
    for (path_e, ve), (path_t, vt) in zip(flat_e, flat_t):
        assert path_e == path_t
        name = jax.tree_util.keystr(path_e)
        r = np.asarray(ve, np.float64)
        g = np.asarray(vt, np.float64)
        rn = np.linalg.norm(r)
        if rn < 1e-10:
            continue
        rel = np.linalg.norm(g - r) / rn
        checked += 1
        rels.append(rel)
        if rel > 6e-2:
            bad.append((name, rel))
    assert checked > 100, checked
    assert not bad, bad[:20]
    rels.sort()
    assert rels[len(rels) // 2] < 2.5e-2, (
        "tanh-gelu gradient deviation above its measured envelope: "
        f"median {rels[len(rels) // 2]:.2e}")
    # and the two forms really are different functions (flag is live)
    assert rels[-1] > 1e-4, "erf/tanh paths produced identical gradients"


@pytest.fixture(scope="module")
def mae_pair():
    """The gd_mae_ssl.yaml PRETRAIN graph (DynVFE -> SPTBackboneMAE with
    masking, generative decoder, chamfer) built twice with identical
    weights: reference torch modules (pytorch3d chamfer + sst_ops
    group_inner_inds replaced by exact oracles in ref_loader) and our flax
    network.  The torch side draws the random pillar mask; it is captured
    from its forward and injected into our graph via ``host_mae_mask`` so
    both sides mask identical pillars."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from pathlib import Path
    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import build_network
    from gdmae_tpu.runtime import train as train_lib

    repo = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(repo / "tools/cfgs/kitti_models/gd_mae_ssl.yaml"))
    meta = _small_meta()
    grid = np.array([64, 64])
    pcr = np.array(meta.point_cloud_range, np.float32)
    vsz = [0.32, 0.32, 4.0]

    dyn_vfe = ref_loader.load_ref("pcdet.models.backbones_3d.vfe.dyn_vfe")
    spt_mae = ref_loader.load_ref(
        "pcdet.models.backbones_3d.spt_backbone_mae")

    torch.manual_seed(0)

    class RefMAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.vfe = dyn_vfe.DynVFE(
                model_cfg=cfg.MODEL.VFE, num_point_features=4,
                voxel_size=vsz, point_cloud_range=pcr,
                grid_size=np.array([64, 64, 1]))
            self.backbone_3d = spt_mae.SPTBackboneMAE(
                model_cfg=cfg.MODEL.BACKBONE_3D, input_channels=128,
                grid_size=grid, voxel_size=vsz, point_cloud_range=pcr)

        def forward(self, bd):
            bd = self.vfe(bd)
            bd = self.backbone_3d(bd)
            loss, _ = self.backbone_3d.get_loss()
            return loss, bd

    ref_model = RefMAE().train()
    sd0 = {k: v.detach().clone().numpy()
           for k, v in ref_model.state_dict().items()}

    pts, _ = _synth_scene(5, meta.max_points)

    # one torch forward to capture the random pillar mask (the mask is
    # drawn inside the reference forward, spt_backbone_mae.py:96-100)
    torch.manual_seed(11)
    _, bd0 = ref_model(_ref_batch(torch, pts, np.zeros((1, 1, 8), np.float32)))
    mae_mask = bd0["voxel_mae_mask"].detach().numpy().astype(np.float32)
    n_vox = mae_mask.shape[0]
    host_mask = np.ones((1, meta.max_pillars), np.float32)
    host_mask[0, :n_vox] = mae_mask

    b3d = cfg.MODEL.BACKBONE_3D
    b3d.pop("TPU_WINDOW_CAPS", None)
    # exact-parity knobs: wrap-repeat GT grouping (reference
    # group_inner_inds semantics) and the plain dense decoder fuse
    b3d.TPU_MAE_WRAP_GT = True
    b3d.TPU_HYBRID_DECODE = False
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    batch = {"points": jnp.asarray(pts[None]),
             "point_mask": jnp.ones((1, meta.max_points), bool),
             "host_mae_mask": jnp.asarray(host_mask)}
    with jax.default_matmul_precision("highest"):
        params, batch_stats = train_lib.init_model(model, batch, seed=0)
        params, batch_stats, report = torch_import.import_torch_state(
            sd0, params, batch_stats)
    assert report["unmapped"] == [], report["unmapped"][:10]
    assert report["skipped"] == [], report["skipped"][:10]

    strides = {}
    for i, src in enumerate(b3d.FEATURES_SOURCE):
        s = int(b3d.FUSE_LAYER[src].UPSAMPLE_STRIDE)
        # the MAE graph nests the fuse under the (shared-checkpoint)
        # encoder scope: backbone_3d/encoder/fuse/deblock_i
        strides[f"backbone_3d/encoder/fuse/deblock_{i}/kernel"] = s

    return dict(cfg=cfg, meta=meta, ref_model=ref_model, sd0=sd0,
                model=model, params=params, batch_stats=batch_stats,
                batch=batch, pts=pts, deconv_strides=strides)


def test_mae_step0_gradient_parity(mae_pair):
    """d(chamfer)/d(theta) per tensor through the WHOLE pretrain graph —
    masking, SST encoder over kept pillars, generative decoder, decoder
    head, chamfer — matches the reference backward (reference
    spt_backbone_mae.py:83-89).  Same module-aware tolerances as the
    detection-graph test (the SST encoder backward carries ~4e-3 fp32
    conditioning noise)."""
    import torch
    p = mae_pair
    _load_sd(p["ref_model"], p["sd0"])
    p["ref_model"].zero_grad()
    torch.manual_seed(11)  # same mask draw as the captured one
    loss, _ = p["ref_model"](
        _ref_batch(torch, p["pts"], np.zeros((1, 1, 8), np.float32)))
    loss.backward()
    ref_grads = {k: prm.grad.detach().numpy()
                 for k, prm in p["ref_model"].named_parameters()
                 if prm.grad is not None}

    def loss_fn(params):
        out, _ = p["model"].apply(
            {"params": params, "batch_stats": p["batch_stats"]},
            p["batch"], train=True,
            rngs={"mae_mask": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return out["loss"]

    with jax.default_matmul_precision("highest"):
        jloss, grads = jax.value_and_grad(loss_fn)(p["params"])
    np.testing.assert_allclose(float(jloss), float(loss.item()), rtol=1e-4)

    got = torch_import.export_torch_state(
        grads, deconv_strides=p["deconv_strides"])
    checked, bad, noisy_rels = 0, [], []
    for name, ref_g in ref_grads.items():
        assert name in got, f"gradient for {name} not exported"
        g = np.asarray(got[name], np.float64)
        r = np.asarray(ref_g, np.float64)
        rn = np.linalg.norm(r)
        if rn < 1e-10:
            assert np.linalg.norm(g) < 1e-8, name
            continue
        rel = np.linalg.norm(g - r) / rn
        checked += 1
        ill = name.startswith(("backbone_3d.sst_blocks", "vfe"))
        if ill:
            noisy_rels.append(rel)
        if rel > (6e-2 if ill else 2e-3):
            bad.append((name, rel, rn))
    assert checked > 60, checked
    assert not bad, bad[:20]
    noisy_rels.sort()
    assert noisy_rels and noisy_rels[len(noisy_rels) // 2] < 8e-3, (
        "median encoder-gradient error above the fp32 conditioning floor: "
        f"{noisy_rels[len(noisy_rels) // 2]:.2e}")


# ---------------------------------------------------------------------------
# CenterHead(+IoU head) graph — the flagship Waymo head (VERDICT r4 #4).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def center_pair():
    """The gd_mae_iou.yaml-style graph (DynVFE -> SPTBackbone ->
    SSTBEVBackbone -> CenterHead with IoU head) built twice with identical
    weights: reference torch modules (gaussian-heatmap target assign on
    CPU per sample, focal/reg/IoU losses — reference
    center_head.py:106-277) and our flax network.  The reference's CUDA
    boxes_iou3d_gpu is replaced by the exact polygon-clip CPU oracle in
    ref_loader (the loss uses it through .detach(), so numpy is faithful)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from pathlib import Path
    from gdmae_tpu.config import cfg_from_yaml_file
    from gdmae_tpu.models.detectors.detector3d_template import build_network
    from gdmae_tpu.runtime import train as train_lib

    repo = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(repo / "tools/cfgs/waymo_models/gd_mae_iou.yaml"))
    # the head's CLASS_NAMES_EACH_HEAD matches against the DATASET's class
    # list — keep the waymo names or the Vehicle branch silently shrinks
    meta = _small_meta()
    meta.class_names = list(cfg.CLASS_NAMES)
    grid = np.array([64, 64, 1])
    pcr = np.array(meta.point_cloud_range, np.float32)
    vsz = [0.32, 0.32, 4.0]

    dyn_vfe = ref_loader.load_ref("pcdet.models.backbones_3d.vfe.dyn_vfe")
    spt = ref_loader.load_ref("pcdet.models.backbones_3d.spt_backbone")
    bev = ref_loader.load_ref("pcdet.models.backbones_2d.sst_bev_backbone")
    ch = ref_loader.load_ref("pcdet.models.dense_heads.center_head")

    torch.manual_seed(3)

    class RefCenter(nn.Module):
        def __init__(self):
            super().__init__()
            self.vfe = dyn_vfe.DynVFE(
                model_cfg=cfg.MODEL.VFE, num_point_features=4,
                voxel_size=vsz, point_cloud_range=pcr, grid_size=grid)
            self.backbone_3d = spt.SPTBackbone(
                model_cfg=cfg.MODEL.BACKBONE_3D, input_channels=128,
                grid_size=np.array([64, 64]), voxel_size=vsz,
                point_cloud_range=pcr)
            self.backbone_2d = bev.SSTBEVBackbone(
                model_cfg=cfg.MODEL.BACKBONE_2D)
            self.dense_head = ch.CenterHead(
                model_cfg=cfg.MODEL.DENSE_HEAD, input_channels=128,
                num_class=3, class_names=list(cfg.CLASS_NAMES),
                grid_size=grid, point_cloud_range=pcr, voxel_size=vsz,
                predict_boxes_when_training=False)

        def forward(self, bd):
            for m in (self.vfe, self.backbone_3d, self.backbone_2d,
                      self.dense_head):
                bd = m(bd)
            loss, tb = self.dense_head.get_loss()
            return loss

    ref_model = RefCenter().train()
    sd0 = {k: v.detach().clone().numpy()
           for k, v in ref_model.state_dict().items()}

    pts, gt = _synth_scene(6, meta.max_points)
    # class ids follow cfg.CLASS_NAMES (Vehicle/Pedestrian/Cyclist) —
    # _synth_scene's KITTI-anchor-matched sizes are still valid boxes for
    # the gaussian assigner (no anchor-tie concerns here)

    b3d = cfg.MODEL.BACKBONE_3D
    b3d.pop("TPU_WINDOW_CAPS", None)
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    batch = {"points": jnp.asarray(pts[None]),
             "point_mask": jnp.ones((1, meta.max_points), bool),
             "gt_boxes": jnp.asarray(gt)}
    with jax.default_matmul_precision("highest"):
        params, batch_stats = train_lib.init_model(model, batch, seed=0)
        params, batch_stats, report = torch_import.import_torch_state(
            sd0, params, batch_stats)
    assert report["unmapped"] == [], report["unmapped"][:10]
    assert report["skipped"] == [], report["skipped"][:10]

    strides = {}
    for i, src in enumerate(b3d.FEATURES_SOURCE):
        s = int(b3d.FUSE_LAYER[src].UPSAMPLE_STRIDE)
        strides[f"backbone_3d/fuse/deblock_{i}/kernel"] = s

    return dict(cfg=cfg, meta=meta, ref_model=ref_model, sd0=sd0,
                model=model, params=params, batch_stats=batch_stats,
                batch=batch, pts=pts, gt=gt, deconv_strides=strides)


def test_center_head_step0_gradient_parity(center_pair):
    """d(focal+reg+IoU)/d(theta) per tensor through the full CenterHead
    graph matches the reference backward — the loss surface behind every
    Waymo number in BASELINE.md (reference center_head.py:233-277).  Same
    module-aware tolerances as the anchor-head test (the SST encoder
    backward carries ~4e-3 fp32 conditioning noise)."""
    import torch
    p = center_pair
    _load_sd(p["ref_model"], p["sd0"])
    p["ref_model"].zero_grad()
    loss = p["ref_model"](_ref_batch(torch, p["pts"], p["gt"]))
    loss.backward()
    ref_grads = {k: prm.grad.detach().numpy()
                 for k, prm in p["ref_model"].named_parameters()
                 if prm.grad is not None}

    def loss_fn(params):
        out, _ = p["model"].apply(
            {"params": params, "batch_stats": p["batch_stats"]},
            p["batch"], train=True,
            rngs={"mae_mask": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return out["loss"]

    with jax.default_matmul_precision("highest"):
        jloss, grads = jax.value_and_grad(loss_fn)(p["params"])
    np.testing.assert_allclose(float(jloss), float(loss.item()), rtol=1e-4)

    got = torch_import.export_torch_state(
        grads, deconv_strides=p["deconv_strides"])
    checked, bad, noisy_rels = 0, [], []
    for name, ref_g in ref_grads.items():
        assert name in got, f"gradient for {name} not exported"
        g = np.asarray(got[name], np.float64)
        r = np.asarray(ref_g, np.float64)
        rn = np.linalg.norm(r)
        if rn < 1e-5:
            # e.g. conv biases directly followed by BN: the mean
            # subtraction cancels the bias direction, leaving an eps-level
            # gradient on BOTH sides — relative comparison is meaningless,
            # require agreement that it is tiny
            assert np.linalg.norm(g) < 1e-4, (name, np.linalg.norm(g))
            continue
        rel = np.linalg.norm(g - r) / rn
        checked += 1
        ill = name.startswith(("backbone_3d.sst_blocks", "vfe"))
        if ill:
            noisy_rels.append(rel)
        if rel > (6e-2 if ill else 2e-3):
            bad.append((name, rel, rn))
    assert checked > 100, checked
    assert not bad, bad[:20]
    noisy_rels.sort()
    assert noisy_rels and noisy_rels[len(noisy_rels) // 2] < 8e-3, (
        "median encoder-gradient error above the fp32 conditioning floor: "
        f"{noisy_rels[len(noisy_rels) // 2]:.2e}")


def test_center_head_k_step_sgd_trajectory(center_pair):
    """K fwd+bwd+clip+SGD steps on the CenterHead graph: per-step loss
    trajectory tracks the reference (update ~ grad keeps framework noise
    linear — the same structure and tolerance schedule as
    test_k_step_sgd_trajectory_and_bn_stats on the anchor graph)."""
    import torch
    from torch.nn.utils import clip_grad_norm_
    import optax
    from gdmae_tpu.runtime import train as train_lib

    p = center_pair
    _load_sd(p["ref_model"], p["sd0"])
    opt = torch.optim.SGD(p["ref_model"].parameters(), lr=SGD_LR)
    ref_losses = []
    for _ in range(K_STEPS):
        opt.zero_grad()
        loss = p["ref_model"](_ref_batch(torch, p["pts"], p["gt"]))
        loss.backward()
        clip_grad_norm_(p["ref_model"].parameters(), CLIP)
        opt.step()
        ref_losses.append(float(loss.item()))

    tx = optax.chain(optax.clip_by_global_norm(CLIP), optax.sgd(SGD_LR))
    with jax.default_matmul_precision("highest"):
        state = train_lib.TrainState.create(p["params"], p["batch_stats"], tx)
        step = train_lib.make_train_step(p["model"], donate=False)
        key = jax.random.PRNGKey(0)
        got_losses = []
        for _ in range(K_STEPS):
            state, metrics = step(state, p["batch"], key)
            got_losses.append(float(metrics["loss"]))

    # per-step schedule: steps 0-2 track at <=1e-5 relative (measured
    # 2e-6 / 1e-6 / 1e-5); the late steps compound faster than the anchor
    # graph's — the IoU-loss target is the 3D IoU of DECODED boxes
    # (center_head.py:259-273), so parameter noise moves the target itself,
    # and the focal heatmap loss is spiky under lr=0.01 SGD (ref losses
    # swing 24.8->31.8->24.1 over 6 steps).  Measured splits:
    # 2e-6 / 1e-6 / 1e-5 / 1.1e-2 / 2e-2 / 5.4e-2.
    rtols = [1e-5, 1e-4, 1e-3, 2e-2, 4e-2, 8e-2]
    for i, (g, r) in enumerate(zip(got_losses, ref_losses)):
        np.testing.assert_allclose(
            g, r, rtol=rtols[i], atol=1e-5,
            err_msg=f"step {i}: ref={ref_losses} got={got_losses}")
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-4  # it really trained


def test_segmax_split_gradient_deviation(det_pair):
    """Pin the gradient deviation of jax's tie-splitting segment_max
    backward (GDMAE_SEGMAX_BWD=split, ~5 ms/step cheaper than the exact
    first-winner bookkeeping on v5e — PERFORMANCE.md r4) vs the
    torch-parity first-winner form on the detection graph (VERDICT r4 #6).

    Unlike the gelu fast path, ties here are NOT rare: the VFE's ReLU'd
    features tie at exactly 0.0 whenever a pillar's max is dead, so the
    split form reroutes real cotangent mass.  The gates freeze the
    measured envelope; the default stays decided by this evidence (see
    ops/scatter._segment_max_bwd)."""
    p = det_pair

    def grads_with(mode):
        import os
        old = os.environ.pop("GDMAE_SEGMAX_BWD", None)
        if mode:
            os.environ["GDMAE_SEGMAX_BWD"] = mode
        try:
            def loss_fn(params):
                out, _ = p["model"].apply(
                    {"params": params, "batch_stats": p["batch_stats"]},
                    p["batch"], train=True,
                    rngs={"mae_mask": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"])
                return out["loss"]
            with jax.default_matmul_precision("highest"):
                return jax.value_and_grad(loss_fn)(p["params"])
        finally:
            os.environ.pop("GDMAE_SEGMAX_BWD", None)
            if old is not None:
                os.environ["GDMAE_SEGMAX_BWD"] = old

    loss_x, g_exact = grads_with("exact")
    loss_s, g_split = grads_with("split")
    # the FORWARD is identical — only the backward tie rule differs
    np.testing.assert_allclose(float(loss_s), float(loss_x), rtol=1e-6)

    flat_x = jax.tree_util.tree_flatten_with_path(g_exact)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(g_split)[0]
    rels, vfe_rels, checked = [], [], 0
    for (path_x, vx), (path_s, vs) in zip(flat_x, flat_s):
        assert path_x == path_s
        name = jax.tree_util.keystr(path_x)
        r = np.asarray(vx, np.float64)
        g = np.asarray(vs, np.float64)
        rn = np.linalg.norm(r)
        if rn < 1e-10:
            continue
        rel = np.linalg.norm(g - r) / rn
        checked += 1
        rels.append((rel, name))
        if "vfe" in name:
            vfe_rels.append(rel)
    assert checked > 100, checked
    rels.sort()
    med = rels[len(rels) // 2][0]
    mx = rels[-1]
    print(f"\nsegmax split deviation: median {med:.3e}  "
          f"max {mx[0]:.3e} ({mx[1]})  "
          f"vfe median {sorted(vfe_rels)[len(vfe_rels) // 2]:.3e}")
    # MEASURED (r5): median 0.0, max 0.0 — on realistic continuous
    # features no pillar's channel max is ever attained twice, so the two
    # tie rules coincide exactly; this is the evidence behind shipping the
    # cheaper split form as the default (ops/scatter._segment_max_bwd).
    # The tie rules themselves differ (test_scatter.py pins both), so a
    # nonzero deviation here means the data regime changed — re-evaluate
    # the default if this gate ever fires.
    assert med < 1e-6, f"median {med:.2e}"
    assert mx[0] < 1e-4, mx
