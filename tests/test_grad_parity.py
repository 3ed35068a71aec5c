"""Train-step GRADIENT parity against the reference torch stack.

test_torch_parity.py proves forward agreement per model; this proves the
whole differentiable surface agrees: the ACTUAL reference losses
(/root/reference/pc_processor/loss/{focal_softmax,lovasz_softmax}.py)
composed exactly as the reference trainer does
(tasks/pmf/trainer.py:305-338: focal + λ·lovász per stream + γ·entropy-
gated bidirectional KL), backpropagated through the ACTUAL reference
PMFNet — versus our pmf_losses + jax.grad through the converted flax
model. Parameter gradients are compared leaf-by-leaf through the same
state_dict converter (the conversion transforms — transposes, BN
scale/bias naming — are linear, so gradients convert identically to
weights).

This is the strongest dataset-free check that a training run of this
framework descends the same loss surface as the reference.
"""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import randomize_, ref_models, to_nhwc  # noqa: F401,E501  (fixture reuse)

REF_LOSS = "/root/reference/pc_processor/loss"

LAMBDA = 1.0
GAMMA = 0.5
TAU = 0.7
NCLASSES = 20


@pytest.fixture(scope="module")
def ref_losses():
    mods = {}
    for name in ("focal_softmax", "lovasz_softmax"):
        spec = importlib.util.spec_from_file_location(
            f"ref_loss_{name}", f"{REF_LOSS}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_loss_{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def reference_total_loss(lidar_pred, camera_pred, label, alpha, ref_losses):
    """The reference trainer's exact train-mode loss composition
    (tasks/pmf/trainer.py:215-252 + :305-332), on live torch tensors."""
    import math

    focal = ref_losses["focal_softmax"].FocalSoftmaxLoss(
        NCLASSES, gamma=2, alpha=alpha, softmax=False)
    lovasz = ref_losses["lovasz_softmax"].Lovasz_softmax(ignore=0)
    kl = torch.nn.KLDivLoss(reduction="none")

    label_mask = label.gt(0)
    lidar_log = torch.log(lidar_pred.clamp(min=1e-8))
    camera_log = torch.log(camera_pred.clamp(min=1e-8))
    pcd_entropy = -(lidar_pred * lidar_log).sum(1) / math.log(NCLASSES)
    img_entropy = -(camera_pred * camera_log).sum(1) / math.log(NCLASSES)

    loss_foc = focal(lidar_pred, label, mask=label_mask)
    loss_lov = lovasz(lidar_pred, label)
    loss_foc_cam = focal(camera_pred, label, mask=label_mask)
    loss_lov_cam = lovasz(camera_pred, label)

    pcd_conf = 1 - pcd_entropy
    img_conf = 1 - img_entropy
    importance = pcd_conf - img_conf
    pcd_guide = importance.gt(0).float() * importance.abs() \
        * pcd_conf.ge(TAU).float()
    img_guide = importance.lt(0).float() * importance.abs() \
        * img_conf.ge(TAU).float()
    loss_per = (kl(lidar_log, camera_pred) * img_guide.unsqueeze(1)).mean() \
        + (kl(camera_log, lidar_pred) * pcd_guide.unsqueeze(1)).mean()

    return (loss_foc + loss_lov * LAMBDA + loss_foc_cam
            + loss_lov_cam * LAMBDA + loss_per * GAMMA)


def test_pmf_train_gradient_parity(ref_models, ref_losses):
    import jax
    import jax.numpy as jnp

    from pmf_tpu.models import PMFNet
    from pmf_tpu.models.torch_convert import convert_pmf_state_dict
    from pmf_tpu.train.steps import LossConfig, pmf_losses

    ref = randomize_(ref_models["pmf_net"].PMFNet(
        pcd_channels=5, img_channels=3, nclasses=NCLASSES, base_channels=32,
        imagenet_pretrained=False, image_backbone="resnet34"), seed=21)
    ref.eval()  # BN running stats on both sides; dropout off — the
    # gradient flow under test is the loss composition + every layer's
    # backward, which eval-mode normalization exercises identically

    g = torch.Generator().manual_seed(22)
    pcd = torch.randn(2, 5, 64, 96, generator=g)
    img = torch.randn(2, 3, 64, 96, generator=g)
    label = torch.randint(0, NCLASSES, (2, 64, 96), generator=g)
    alpha = (np.arange(NCLASSES) % 5 + 1).astype(np.float32) / 5.0
    alpha[0] = 0.0

    # --- reference: autograd through the real torch stack
    lidar_t, cam_t = ref(pcd, img)
    total_t = reference_total_loss(lidar_t, cam_t, label, alpha, ref_losses)
    total_t.backward()
    total_t = total_t.detach()
    grad_sd = {}
    for k, v in ref.state_dict().items():
        p = dict(ref.named_parameters()).get(k)
        grad_sd[k] = (p.grad if p is not None else v).detach().numpy()
    grads_t, _ = convert_pmf_state_dict(grad_sd)

    # --- ours: jax.grad through the converted flax model
    params, stats = convert_pmf_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = PMFNet(nclasses=NCLASSES, base_channels=32,
                   image_backbone="resnet34")
    cfg = LossConfig(nclasses=NCLASSES, alpha=tuple(alpha.tolist()),
                     gamma_focal=2.0, lambda_=LAMBDA, gamma=GAMMA, tau=TAU)
    label_j = jnp.asarray(label.numpy())

    def loss_fn(params):
        lidar, cam = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(to_nhwc(pcd)), jnp.asarray(to_nhwc(img)),
            train=False)
        total, _ = pmf_losses(lidar, cam, label_j, cfg)
        return total

    total_f, grads_f = jax.value_and_grad(loss_fn)(params)

    assert abs(float(total_f) - float(total_t)) < 1e-4, \
        (float(total_f), float(total_t))

    flat_t = jax.tree_util.tree_flatten_with_path(grads_t)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(grads_f)[0])
    assert len(flat_t) == len(flat_f)
    worst = (0.0, None)
    for path, g_t in flat_t:
        g_f = np.asarray(flat_f[path], np.float32)
        g_t = np.asarray(g_t, np.float32)
        scale = max(float(np.max(np.abs(g_t))), 1e-3)
        err = float(np.max(np.abs(g_f - g_t))) / scale
        if err > worst[0]:
            worst = (err, jax.tree_util.keystr(path))
        assert err < 5e-3, (jax.tree_util.keystr(path), err, scale)
    # the whole tree should be much tighter than the per-leaf bound
    assert worst[0] < 5e-3, worst
