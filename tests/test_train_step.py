"""Full train-step parity: loss, gradients, SGD update, and OIM lut
trajectory vs torch autograd driven through the functional oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import torch_oracle as oracle
from grl_tpu import models
from grl_tpu.engine.optim import SGD, lr_mult_tree, step_decay_lr
from grl_tpu.engine.train_step import init_train_state, make_train_step

B, T, H, W = 4, 2, 32, 16
NUM_CLASSES = 3
LR = 0.01
WD = 5e-4
MU = 0.9


def build():
    trunk = models.ResNetTrunk(layers=(1, 1, 1, 1), last_stride=1, width=4)
    cnn = models.GRLModel(trunk=trunk)
    siamese = models.Siamese(input_num=cnn.num_feat, output_num=16)
    unc = models.SiameseVideo(input_num=cnn.num_feat)
    return cnn, siamese, unc


def torch_params(tree):
    """Deep-copy a param pytree into requires-grad torch leaves."""
    if isinstance(tree, dict):
        return {k: torch_params(v) for k, v in tree.items()}
    t = torch.from_numpy(np.asarray(tree).copy())
    t.requires_grad_(True)
    return t


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def torch_total_loss(cnn, tp, ts, clips_t, targets, luts):
    b = clips_t.shape[0]
    t = clips_t.shape[1]
    y = torch.from_numpy(targets.astype(np.int64))

    xu, xc = oracle.grl_model(cnn, tp["cnn"], ts["cnn"], clips_t, True)

    tar_probe, tar_gallery = y[0::2], y[1::2]
    target = torch.cat([tar_probe, tar_gallery])

    scores, pooled = oracle.siamese(tp["siamese"], ts["siamese"], xc, True)

    # frame OIM with the torch-backward gradient coupling: the frame and
    # video OIM share one lut and torch's OIM mutates it in BACKWARD, with
    # the video node (created later) running first — so the frame VALUE
    # uses the original lut while the frame GRADIENT flows through the
    # post-video-update table (train_step.py grl_loss_fn; proven against
    # the literal trainer's conv1 grad: coupled rel 2.7e-5, uncoupled 87%)
    frame = xc.reshape(b * t, -1)
    frame_y = y.repeat_interleave(t)
    lut0 = torch.from_numpy(luts["corr"])
    lut_mid = lut0.clone()
    for x, yy in zip(pooled.detach(), target):
        row = 0.5 * lut_mid[yy] + 0.5 * x
        lut_mid[yy] = row / row.norm()
    value = 30.0 * frame @ lut0.t()
    gpath = 30.0 * frame @ lut_mid.t()
    frame_logits = gpath + (value - gpath).detach()
    loss_frame = F.cross_entropy(frame_logits, frame_y)
    vid_logits = 30.0 * pooled @ torch.from_numpy(luts["corr"]).t()
    loss_vid = F.cross_entropy(vid_logits, target)

    diff = pooled.unsqueeze(1) - pooled.unsqueeze(0)
    dist = ((diff ** 2).sum(2) + 1e-12).sqrt()
    same = target.unsqueeze(1) == target.unsqueeze(0)
    pos = same & ~torch.eye(b, dtype=torch.bool)
    z = (dist * pos.float()).max(1)[0] - (dist + 1e5 * same.float()).min(1)[0]
    loss_tri = torch.log1p(torch.exp(z)).mean()

    probs = torch.softmax(scores, dim=-1)[:, :, 1].reshape(-1)
    labels = (tar_probe[:, None] == tar_gallery[None, :]).float().reshape(-1)
    loss_ver = F.binary_cross_entropy(probs, labels)

    _, unc_out = oracle.siamese_video(tp["siamese_uncorr"], ts["siamese_uncorr"], xu, True)
    unc_logits = 30.0 * unc_out @ torch.from_numpy(luts["uncorr"]).t()
    loss_unc = F.cross_entropy(unc_logits, target)

    total = loss_frame + loss_vid + 20.0 * loss_ver + loss_tri + loss_unc
    feats = {
        "corr_vid": (pooled.detach().numpy(), target.numpy()),
        "corr_frame": (frame.detach().numpy(), frame_y.numpy()),
        "uncorr_vid": (unc_out.detach().numpy(), target.numpy()),
    }
    return total, feats


def torch_lut_step(lut, feats, targets, momentum=0.5):
    lut = lut.copy()
    for x, yy in zip(feats, targets):
        row = momentum * lut[yy] + (1 - momentum) * x
        lut[yy] = row / np.linalg.norm(row)
    return lut


def test_full_train_step_matches_torch():
    cnn, siamese, unc = build()
    ts0 = init_train_state(
        jax.random.PRNGKey(0), cnn, siamese, unc, NUM_CLASSES, num_feat=cnn.num_feat,
        optimizer=SGD(momentum=MU, weight_decay=WD, nesterov=True),
    )
    # non-trivial luts so OIM losses have signal
    rng = np.random.RandomState(1)
    for k in ("corr", "uncorr"):
        lut = rng.randn(NUM_CLASSES, cnn.num_feat).astype(np.float32)
        ts0["luts"][k] = jnp.asarray(lut / np.linalg.norm(lut, axis=1, keepdims=True))

    clips = rng.randn(B, T, H, W, 3).astype(np.float32)
    targets = np.array([0, 0, 1, 1], dtype=np.int32)

    opt = SGD(momentum=MU, weight_decay=WD, nesterov=True)
    step = make_train_step(cnn, siamese, unc, opt, donate=False)
    ts1, m = step(ts0, jnp.asarray(clips), jnp.asarray(targets), LR)

    # ---- torch side ----
    np_tree = lambda t: jax.tree.map(np.asarray, t)
    tp = torch_params(np_tree(ts0["params"]))
    tst = oracle.mutable_bn_states(np_tree(ts0["model_state"]))
    luts_np = {k: np.asarray(v) for k, v in ts0["luts"].items()}
    clips_t = torch.from_numpy(np.transpose(clips, (0, 1, 4, 2, 3)))

    total, feats = torch_total_loss(cnn, tp, tst, clips_t, targets, luts_np)
    total.backward()

    np.testing.assert_allclose(float(m["loss"]), float(total), rtol=2e-4)

    # gradient parity on a sample of leaves across all three models
    flat_j = flatten(jax.tree.map(np.asarray, jax.tree.map(lambda x: x, ts0["params"])))
    grads_t = flatten(tp)
    flat_new = flatten(np_tree(ts1["params"]))
    mults = flatten(ts0["lr_mults"])

    checked = 0
    for key, p0 in flat_j.items():
        tt = grads_t[key]
        if tt.grad is None:
            # Unreached-by-loss params: featV (reference Siamese.py:99-100
            # defines but never applies it) and the uncorr verification
            # classifier (its loss term is excluded, trainer.py:166). torch
            # skips them entirely (grad None); this framework uniformly
            # applies weight decay to zero-grad leaves — output-invisible,
            # documented divergence.
            g = np.zeros_like(p0)
        else:
            g = tt.grad.numpy()
        if g.ndim == 4:
            pass  # oracle grads already HWIO (params were fed in our layout)
        # torch-SGD first step: buf = g + wd*p ; nesterov d = (1+mu)*buf
        gw = g + WD * p0
        expected = p0 - LR * mults[key] * (1 + MU) * gw
        np.testing.assert_allclose(
            flat_new[key], expected, rtol=5e-3, atol=1e-4,
            err_msg=f"param update mismatch at {key}",
        )
        checked += 1
    assert checked > 80

    # lut trajectory: video update then frame update on the shared corr lut
    corr = torch_lut_step(luts_np["corr"], *feats["corr_vid"])
    corr = torch_lut_step(corr, *feats["corr_frame"])
    uncorr = torch_lut_step(luts_np["uncorr"], *feats["uncorr_vid"])
    np.testing.assert_allclose(np.asarray(ts1["luts"]["corr"]), corr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts1["luts"]["uncorr"]), uncorr, rtol=1e-4, atol=1e-5)

    # BN running stats advanced
    assert not np.allclose(
        np.asarray(ts1["model_state"]["cnn"]["corr_bn"]["mean"]),
        np.asarray(ts0["model_state"]["cnn"]["corr_bn"]["mean"]),
    )


def test_lr_schedule_and_mults():
    assert step_decay_lr(0.001, 0) == 0.001
    assert abs(step_decay_lr(0.001, 15) - 0.0001) < 1e-12
    assert abs(step_decay_lr(0.001, 44) - 1e-5) < 1e-15

    params = {"cnn": {"backbone": {"a": np.zeros(1)}, "trl": {"b": np.zeros(1)}},
              "siamese": {"c": np.zeros(1)}}
    mults = lr_mult_tree(params, {"cnn/backbone": 1.0}, default=2.0)
    assert mults["cnn"]["backbone"]["a"] == 1.0
    assert mults["cnn"]["trl"]["b"] == 2.0
    assert mults["siamese"]["c"] == 2.0
