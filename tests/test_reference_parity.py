"""Numeric parity against the LITERAL reference code, not a transcription.

Every oracle in this file is the reference's own source, loaded from
/root/reference via tests/reference_loader.py:

- models: reid/models/{resnets1,basebranch,grl_model,Siamese,
  Siamese_video}.py driven with weights converted FROM a grl_tpu init by
  ``pytree_to_torch_state`` (``utils/convert_torch.py`` run in reverse) —
  so one test simultaneously proves the model math AND the converter's
  alias table / layout rules against the reference's real module
  structure, including strict ``load_state_dict``.
- metrics: reid/evaluator/eva_functions.py (evaluate, cmc, mean_ap,
  accuracy, evaluate_zhengliang) as the oracle for engine/metrics.py.
- re-ranking: reid/evaluator/rerank.py re_ranking as the oracle for the
  host rewrite and the on-device implementation.
- clip sampling: reid/data/video_loader.py VideoDataset as the
  index-exact oracle for the rrs_test/dense/rrs_train grids and the
  'random' consecutive window, and reid/data/seqtransforms.py for the
  eval decode/resize/normalize chain.
- dataset catalogs: reid/dataset/{mars,duke,ilidsvidsequence,
  prid2011sequence}.py (+ datasequence.py window plucking) as
  output-exact oracles on generated trees in the real on-disk layouts
  (hardcoded roots re-pointed where present).

The hand-written torch oracle (tests/torch_oracle.py) remains as
documentation and for tiny-shape sweeps; THESE tests are the parity
authority. Distances here are continuous random floats: the reference
relies on numpy's unstable argsort while grl_tpu canonicalizes ties with
a stable sort (engine/metrics.py:20-30), so tie-heavy inputs are
deliberately out of scope (covered by grl_tpu's own invariant tests).
"""

import numpy as np
import pytest
import torch

from reference_loader import load_reference_evaluator, load_reference_models

import jax

from grl_tpu import models
from grl_tpu.engine import metrics as M
from grl_tpu.engine import rerank as R
from grl_tpu.utils import convert_torch as ct


def np_tree(tree):
    return jax.tree.map(np.asarray, tree)


def load_into_torch(torch_module, params, state, aliases=None):
    """Reverse-convert grl_tpu pytrees and strict-load into the literal
    reference module; strictness proves key/shape coverage both ways."""
    flat = ct.pytree_to_torch_state(
        np_tree(params), np_tree(state), list(torch_module.state_dict().keys()), aliases=aliases
    )
    torch_module.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat.items()}, strict=True
    )


def bn_stats_match(torch_module, params, state, aliases=None, rtol=1e-3, atol=1e-4):
    """Compare EVERY BatchNorm running_mean/running_var in the reference
    module against the grl_tpu state pytree (post-training trajectories)."""
    ref_sd = torch_module.state_dict()
    keys = [k for k in ref_sd if k.endswith(("running_mean", "running_var"))]
    assert keys, "reference module has no BN stats?"
    flat = ct.pytree_to_torch_state(np_tree(params), np_tree(state), keys, aliases=aliases)
    for k in keys:
        np.testing.assert_allclose(
            flat[k], ref_sd[k].numpy(), rtol=rtol, atol=atol, err_msg=k
        )


# ---------------------------------------------------------------------------
# Models: full-size GRL CNN + Siamese heads vs the reference's own modules
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_grl_model_matches_reference_modules():
    """Full-size ResNet50_GRL_Model (reference grl_model.py:184-229):
    eval-mode outputs, two train-mode steps, and the complete BN
    running-stat trajectory. 256x128 input is required — the reference
    Backbone hardcodes the 16x8 feature-map geometry (basebranch.py:59)."""
    ref = load_reference_models()
    m_ref = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0)

    model = models.GRLModel()
    params, state = model.init(jax.random.PRNGKey(0))
    load_into_torch(m_ref, params, state, aliases=ct.GRL_ALIASES)

    rng = np.random.RandomState(0)
    clips = rng.rand(2, 2, 256, 128, 3).astype(np.float32) * 2 - 1
    t_clips = torch.from_numpy(np.transpose(clips, (0, 1, 4, 2, 3)).copy())

    # eval mode
    m_ref.eval()
    with torch.no_grad():
        ref_u, ref_c = m_ref(t_clips)
    (ju, jc), _ = model.apply(params, state, clips, training=False)
    np.testing.assert_allclose(np.asarray(ju), ref_u.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), ref_c.numpy(), atol=2e-5, rtol=1e-4)

    # two train-mode steps: outputs + BN running stats advance identically
    m_ref.train()
    clips2 = rng.rand(2, 2, 256, 128, 3).astype(np.float32) * 2 - 1
    t_clips2 = torch.from_numpy(np.transpose(clips2, (0, 1, 4, 2, 3)).copy())
    with torch.no_grad():
        m_ref(t_clips)
        ref_u2, ref_c2 = m_ref(t_clips2)
    _, state1 = model.apply(params, state, clips, training=True)
    (ju2, jc2), state2 = model.apply(params, state1, clips2, training=True)
    # train-mode batch statistics over b*t=4 (and b=2 for the head BNs)
    # divide by near-zero variances, amplifying fp32 accumulation-order
    # differences; eval mode above is the tight semantic check (2e-5).
    # The time-major frame layout (gce.py round 5) reorders those
    # reductions: measured worst case 2.3e-3 on 6/4096 uncorr elements
    # with the BN running-stat trajectories still matching exactly below.
    np.testing.assert_allclose(np.asarray(ju2), ref_u2.numpy(), atol=4e-3)
    np.testing.assert_allclose(np.asarray(jc2), ref_c2.numpy(), atol=4e-3)
    bn_stats_match(m_ref, params, state2, aliases=ct.GRL_ALIASES)


@pytest.mark.parametrize("training", [False, True])
def test_siamese_matches_reference_module(training):
    """reference reid/models/Siamese.py:42-142 at its live size
    (2048 -> 512 Q/K, 2-way classifier), including the unused featV
    parameters the state_dict carries."""
    ref = load_reference_models()
    m_ref = ref.Siamese.Siamese(2048, 512, 2)

    model = models.Siamese(input_num=2048, output_num=512, class_num=2)
    params, state = model.init(jax.random.PRNGKey(1))
    load_into_torch(m_ref, params, state)

    x = np.random.RandomState(2).randn(4, 8, 2048).astype(np.float32)
    m_ref.train(training)
    with torch.no_grad():
        ref_scores, ref_out = m_ref(torch.from_numpy(x.copy()))
    (scores, out), ns = model.apply(params, state, x, training=training)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(), atol=1e-4, rtol=1e-4)
    if training:
        bn_stats_match(m_ref, params, ns)


@pytest.mark.parametrize("training", [False, True])
def test_siamese_video_matches_reference_module(training):
    """reference reid/models/Siamese_video.py (degenerate pair head)."""
    ref = load_reference_models()
    m_ref = ref.Siamese_video.Siamese_video(2048, 2048, 2)

    model = models.SiameseVideo(input_num=2048)
    params, state = model.init(jax.random.PRNGKey(3))
    load_into_torch(m_ref, params, state)

    x = np.random.RandomState(4).randn(6, 2048).astype(np.float32)
    m_ref.train(training)
    with torch.no_grad():
        ref_scores, ref_out = m_ref(torch.from_numpy(x.copy()))
    (scores, out), ns = model.apply(params, state, x, training=training)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(), atol=1e-4, rtol=1e-4)
    if training:
        bn_stats_match(m_ref, params, ns)


def test_resnet_trunk_matches_reference_resnets1():
    """reid/models/resnets1.py resnet50_s1 in isolation (last-stride-1
    surgery, :109): trunk features before any GCE/TRL processing."""
    ref = load_reference_models()
    t_ref = ref.resnets1.resnet50_s1(pretrained=False)

    trunk = models.resnet50_trunk(last_stride=1)
    params, state = trunk.init(jax.random.PRNGKey(5))
    # resnet50_s1 keeps its ImageNet fc/avgpool in the state_dict; the
    # trunk pytree has no fc — fill those two entries from the torch init.
    sd = t_ref.state_dict()
    keys = [k for k in sd if not k.startswith("fc.")]
    flat = ct.pytree_to_torch_state(np_tree(params), np_tree(state), keys)
    flat["fc.weight"] = sd["fc.weight"].numpy()
    flat["fc.bias"] = sd["fc.bias"].numpy()
    t_ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flat.items()}, strict=True
    )

    x = np.random.RandomState(6).rand(2, 64, 32, 3).astype(np.float32)
    t_ref.eval()
    with torch.no_grad():
        # drive the reference's own submodule stack exactly as the live
        # GRL path consumes it (basebranch.py:27-36 re-wraps conv1..layer4
        # and never touches avgpool/fc, whose 7x7 kernel also cannot run
        # on small test maps)
        h = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        h = t_ref.maxpool(t_ref.relu(t_ref.bn1(t_ref.conv1(h))))
        ref_out = t_ref.layer4(t_ref.layer3(t_ref.layer2(t_ref.layer1(h))))
    y, _ = trunk.apply(params, state, x, training=False)
    got = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out.numpy(), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_loss_recipe_matches_reference_seqtrainer(tmp_path):
    """The complete 5-term training objective pinned against the literal
    SEQTrainer._forward (reference reid/train/trainer.py:107-170) with
    the reference's own OIMLoss/PairLoss/TripletLoss criterions — total
    loss, all three precision metrics, and the post-backward OIM lut
    trajectories (the stateful in-backward momentum+renorm side effect,
    duplicate ids included). Reference models carry weights converted
    from the grl_tpu init; luts start at zero on both sides."""
    from reference_loader import load_reference_training

    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import grl_loss_fn, init_train_state
    from grl_tpu import losses

    ref = load_reference_models()
    tr = load_reference_training()

    num_classes = 6
    cnn_ref = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0).train()
    sia_ref = ref.Siamese.Siamese(2048, 512, 2).train()
    unc_ref = ref.Siamese_video.Siamese_video(2048, 2048, 2).train()

    cnn = models.GRLModel()
    sia = models.Siamese(input_num=2048, output_num=512, class_num=2)
    unc = models.SiameseVideo(input_num=2048)
    ts = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, num_classes, 2048, SGD())

    load_into_torch(cnn_ref, ts["params"]["cnn"], ts["model_state"]["cnn"],
                    aliases=ct.GRL_ALIASES)
    load_into_torch(sia_ref, ts["params"]["siamese"], ts["model_state"]["siamese"])
    load_into_torch(unc_ref, ts["params"]["siamese_uncorr"],
                    ts["model_state"]["siamese_uncorr"])

    # non-degenerate luts on both sides: with the zero init every OIM
    # logit ties at 0 and argmax/topk tie-breaking (not semantics) would
    # decide the precision metrics
    lut_rng = np.random.RandomState(7)
    for name in ("corr", "uncorr"):
        lut = lut_rng.randn(num_classes, 2048).astype(np.float32)
        lut /= np.linalg.norm(lut, axis=1, keepdims=True)
        ts["luts"][name] = jax.numpy.asarray(lut)

    crit_corr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    crit_uncorr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    with torch.no_grad():
        crit_corr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["corr"])))
        crit_uncorr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["uncorr"])))
    crit_veri = tr.loss.PairLoss()
    trainer = tr.trainer.SEQTrainer(
        cnn_ref, sia_ref, unc_ref, crit_veri, crit_corr, crit_uncorr, str(tmp_path)
    )

    rng = np.random.RandomState(0)
    clips = (rng.rand(4, 2, 256, 128, 3).astype(np.float32) * 2 - 1)
    pids = np.array([0, 0, 1, 1], np.int32)  # interleaved pairs, duplicate ids
    t_clips = torch.from_numpy(np.transpose(clips, (0, 1, 4, 2, 3)).copy())
    t_pids = torch.from_numpy(pids.astype(np.int64))

    all_loss, prec_u, prec_v, prec_f = trainer._forward([t_clips], t_pids, 0, 0)
    all_loss.backward()  # literal OIM.backward updates the criterion luts

    total, aux = grl_loss_fn(
        ts["params"], ts["model_state"], ts["luts"], clips, pids,
        cnn=cnn, siamese=sia, siamese_uncorr=unc,
    )
    m = aux["metrics"]
    assert float(total) == pytest.approx(float(all_loss), rel=1e-4)
    assert float(m["prec_uncorr"]) == pytest.approx(float(prec_u), abs=1e-6)
    assert float(m["prec_vid"]) == pytest.approx(float(prec_v), abs=1e-6)
    assert float(m["prec_frame"]) == pytest.approx(float(prec_f), abs=1e-6)

    # lut trajectories: video-then-frame on the shared corr table
    feats = aux["lut_features"]
    corr = losses.update_lut(ts["luts"]["corr"], *feats["corr_vid"], 0.5)
    corr = losses.update_lut(corr, *feats["corr_frame"], 0.5)
    uncorr = losses.update_lut(ts["luts"]["uncorr"], *feats["uncorr_vid"], 0.5)
    # the lut rows inherit each framework's forward features, which
    # differ at the usual fp32 cross-framework 1e-5 level
    np.testing.assert_allclose(
        np.asarray(corr), crit_corr.lut.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(uncorr), crit_uncorr.lut.numpy(), atol=2e-4
    )


def test_sgd_semantics_match_torch_optim_exactly():
    """Drift-free multi-step parity of the optimizer ALONE against the
    literal ``torch.optim.SGD`` construction (mars_train.py:94-108:
    momentum 0.9, weight_decay 5e-4, nesterov, per-group lr_mult 1/2
    applied via adjust_lr, mars_train.py:110-114): 6 steps on synthetic
    params/gradients, params asserted to ~1e-6 each step. This isolates
    the momentum-buffer + weight-decay + nesterov interaction from step 2
    onward — the trajectory test below runs the same optimizer under the
    full models where fp32 cross-framework drift amplified through the
    random-weight conv backward dominates elementwise comparisons."""
    from grl_tpu.engine.optim import SGD

    rng = np.random.RandomState(3)
    shapes = {"backbone": (7, 5), "head": (4,), "bn_scale": (6,)}
    params = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    mults = {"backbone": 1.0, "head": 2.0, "bn_scale": 2.0}

    t_params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
                for k, v in params.items()}
    lr = 1e-2
    optimizer = torch.optim.SGD(
        [
            {"params": [t_params["backbone"]], "lr_mult": 1},
            {"params": [t_params["head"], t_params["bn_scale"]], "lr_mult": 2},
        ],
        lr=lr, momentum=0.9, weight_decay=5e-4, nesterov=True,
    )
    for g in optimizer.param_groups:  # adjust_lr epoch 0
        g["lr"] = lr * g.get("lr_mult", 1)

    opt = SGD()
    j_params = {k: jax.numpy.asarray(v) for k, v in params.items()}
    j_mults = {k: jax.numpy.float32(v) for k, v in mults.items()}
    opt_state = opt.init(j_params)

    for step in range(6):
        grads = {k: rng.randn(*v.shape).astype(np.float32)
                 for k, v in params.items()}
        optimizer.zero_grad()
        for k in t_params:
            t_params[k].grad = torch.from_numpy(grads[k].copy())
        optimizer.step()
        j_grads = {k: jax.numpy.asarray(v) for k, v in grads.items()}
        j_params, opt_state = opt.update(j_params, j_grads, opt_state, lr, j_mults)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(j_params[k]), t_params[k].detach().numpy(),
                rtol=1e-5, atol=1e-6, err_msg=f"{k} after step {step}",
            )


@pytest.mark.slow
def test_optimizer_trajectory_matches_reference_sgd(tmp_path):
    """Multi-step training-trajectory parity against the literal reference
    optimizer: the EXACT torch.optim.SGD construction from
    mars_train.py:94-108 (4 param groups, backbone lr_mult 1 / new modules
    lr_mult 2, momentum 0.9, wd 5e-4, nesterov) with adjust_lr
    (mars_train.py:110-114) applied, driving the literal SEQTrainer
    zero_grad/backward/step loop (trainer.py:53-55) for 3 steps on fixed
    batches — vs grl_tpu's jitted make_train_step on the same batches.

    Pinned at every step: total loss, ALL trainable params of all three
    modules (i.e. the momentum-buffer + weight-decay interaction from step
    2 onward, which tests/test_train_step.py only covers with a first-step
    closed form), every BN running-stat trajectory, and both OIM luts.

    Design: TEACHER-FORCED (per-step resync). A random-init full-size GRL
    is chaotically stiff — conv1 gradients measure ~7e3, so a single SGD
    step moves weights by multiples of their own scale and the benign
    ~3% fp32 cross-framework backward drift (measured; the same drift is
    2.7e-5 torch-vs-torch) amplifies into O(1) loss divergence one step
    later. Free-running elementwise comparison is therefore meaningless
    past step 0. Instead, after comparing each step's outputs, the torch
    side is resynchronized FROM the jax state — params, BN stats, luts,
    and the SGD momentum buffers (converted through the same
    pytree_to_torch_state path) — so every step k>=1 is a fresh one-step
    comparison from identical state with REAL accumulated momentum
    buffers, never the first-step closed form. Parity per step: loss to
    ~3e-4 rel, per-leaf update vectors to 12%-of-update norm (vs ~100%
    deviations for any semantic optimizer error), luts to 5e-4. The
    drift-free exact recursion (6 steps, ~1e-6) is pinned separately by
    test_sgd_semantics_match_torch_optim_exactly above.

    Documented divergence (train_step.py module docstring): params the
    loss never reaches keep grad=None in torch and are skipped by its SGD
    entirely (no wd either), while grl_tpu gives them zero grad + uniform
    wd. The skip set is asserted to be exactly those params (Siamese.featV*
    and the Siamese_video verification classifier, whose scores feed only
    the excluded uncorr_loss_ver, trainer.py:162,166)."""
    from reference_loader import load_reference_training

    from grl_tpu.engine.optim import SGD
    from grl_tpu.engine.train_step import init_train_state, make_train_step

    ref = load_reference_models()
    tr = load_reference_training()

    num_classes = 6
    cnn_ref = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0).train()
    sia_ref = ref.Siamese.Siamese(2048, 512, 2).train()
    unc_ref = ref.Siamese_video.Siamese_video(2048, 2048, 2).train()

    cnn = models.GRLModel()
    sia = models.Siamese(input_num=2048, output_num=512, class_num=2)
    unc = models.SiameseVideo(input_num=2048)
    opt = SGD()
    ts = init_train_state(jax.random.PRNGKey(0), cnn, sia, unc, num_classes, 2048, opt)

    load_into_torch(cnn_ref, ts["params"]["cnn"], ts["model_state"]["cnn"],
                    aliases=ct.GRL_ALIASES)
    load_into_torch(sia_ref, ts["params"]["siamese"], ts["model_state"]["siamese"])
    load_into_torch(unc_ref, ts["params"]["siamese_uncorr"],
                    ts["model_state"]["siamese_uncorr"])

    lut_rng = np.random.RandomState(7)
    for name in ("corr", "uncorr"):
        lut = lut_rng.randn(num_classes, 2048).astype(np.float32)
        lut /= np.linalg.norm(lut, axis=1, keepdims=True)
        ts["luts"][name] = jax.numpy.asarray(lut)

    crit_corr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    crit_uncorr = tr.loss.OIMLoss(2048, num_classes, scalar=30.0, momentum=0.5)
    with torch.no_grad():
        crit_corr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["corr"])))
        crit_uncorr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["uncorr"])))
    trainer = tr.trainer.SEQTrainer(
        cnn_ref, sia_ref, unc_ref, tr.loss.PairLoss(), crit_corr, crit_uncorr,
        str(tmp_path)
    )

    # literal optimizer construction (mars_train.py:94-108, sans DataParallel)
    base_param_ids = set(map(id, cnn_ref.backbone.parameters()))
    new_params = [p for p in cnn_ref.parameters() if id(p) not in base_param_ids]
    param_groups = [
        {"params": cnn_ref.backbone.parameters(), "lr_mult": 1},
        {"params": new_params, "lr_mult": 2},
        {"params": sia_ref.parameters(), "lr_mult": 2},
        {"params": unc_ref.parameters(), "lr_mult": 2},
    ]
    lr = 1e-7
    optimizer = torch.optim.SGD(
        param_groups, lr=lr, momentum=0.9, weight_decay=5e-4, nesterov=True
    )
    for g in optimizer.param_groups:  # adjust_lr(0), mars_train.py:110-114
        g["lr"] = lr * g.get("lr_mult", 1)

    step = make_train_step(cnn, sia, unc, opt, donate=False)

    mods = (("cnn", cnn_ref, ct.GRL_ALIASES), ("siamese", sia_ref, None),
            ("siamese_uncorr", unc_ref, None))

    def module_delta_matches(mod, m_ref, aliases, pre, skip, rel, msg):
        """Per-leaf update-vector parity: ||(ours-pre) - (torch-pre)|| must
        stay within rel of the torch update's norm (+ a noise floor for
        near-zero-gradient leaves). A wrong momentum/wd/nesterov/lr_mult
        produces O(1)-relative deviations; fp32 backward drift measures
        a few percent."""
        sd = m_ref.state_dict()
        keys = [k for k in sd
                if not k.endswith("num_batches_tracked") and k not in skip]
        flat = ct.pytree_to_torch_state(
            np_tree(ts["params"][mod]), np_tree(ts["model_state"][mod]),
            keys, aliases=aliases
        )
        for k in keys:
            d_t = sd[k].numpy().astype(np.float64) - pre[k]
            d_o = flat[k].astype(np.float64) - pre[k]
            err = float(np.linalg.norm(d_o - d_t))
            lim = rel * float(np.linalg.norm(d_t)) + 1e-4
            assert err <= lim, (
                f"{msg}: {k} update diff {err:.3e} > {lim:.3e} "
                f"(||torch update||={np.linalg.norm(d_t):.3e})"
            )

    def resync_torch_from_jax(skip):
        """Teacher-force the torch side onto the jax post-step state:
        params + BN stats (strict state_dict load), OIM luts, and the SGD
        momentum buffers (the optax trace mirrors the params structure, so
        the same jax->torch converter emits them in torch layout)."""
        for mod, m_ref, aliases in mods:
            load_into_torch(m_ref, ts["params"][mod], ts["model_state"][mod],
                            aliases=aliases)
        with torch.no_grad():
            crit_corr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["corr"])))
            crit_uncorr.lut.copy_(torch.from_numpy(np.asarray(ts["luts"]["uncorr"])))
        trace = next(s for s in ts["opt"] if hasattr(s, "trace")).trace
        for mod, m_ref, aliases in mods:
            named = dict(m_ref.named_parameters())
            keys = [n for n in named if n not in skip[mod]]
            bufs = ct.pytree_to_torch_state(
                np_tree(trace[mod]), np_tree(ts["model_state"][mod]), keys,
                aliases=aliases
            )
            for n in keys:
                # np views of jax CPU arrays alias the device buffer, which
                # jax reuses on the next dispatch — copy, or the torch
                # buffer silently turns to garbage mid-test (this happened)
                optimizer.state[named[n]]["momentum_buffer"] = torch.from_numpy(
                    np.array(bufs[n], copy=True)
                )

    rng = np.random.RandomState(11)
    skip = None
    for k in range(3):
        clips = rng.rand(4, 2, 256, 128, 3).astype(np.float32) * 2 - 1
        pids = np.array([0, 0, 1, 1], np.int32)  # interleaved pairs, dup ids
        t_clips = torch.from_numpy(np.transpose(clips, (0, 1, 4, 2, 3)).copy())
        t_pids = torch.from_numpy(pids.astype(np.int64))

        pre = {mod: {kk: v.numpy().astype(np.float64).copy()
                     for kk, v in m.state_dict().items()}
               for mod, m, _ in mods}

        all_loss, _, _, _ = trainer._forward([t_clips], t_pids, k, 0)
        optimizer.zero_grad()
        all_loss.backward()
        if skip is None:
            skip = {
                mod: {n for n, p in m.named_parameters() if p.grad is None}
                for mod, m, _ in mods
            }
            assert skip["cnn"] == set()
            assert skip["siamese"] == {
                "featV.weight", "featV.bias", "featV_bn.weight", "featV_bn.bias"
            }
            assert skip["siamese_uncorr"] == {
                "classifierBN.weight", "classifierBN.bias",
                "classifierlinear.weight", "classifierlinear.bias",
            }
        optimizer.step()

        ts, metrics = step(ts, jax.numpy.asarray(clips), jax.numpy.asarray(pids),
                           jax.numpy.float32(lr))

        # resynced each step => per-step drift only, no chaotic compounding.
        # (forward drift at the post-step point measures ~1e-3 rel on the
        # 30x-scaled CE losses; step 0 from the pristine init is 4e-5)
        assert float(metrics["loss"]) == pytest.approx(
            float(all_loss), rel=3e-4 if k == 0 else 3e-3)
        for mod, m_ref, aliases in mods:
            module_delta_matches(
                mod, m_ref, aliases, pre[mod], skip[mod], 0.12,
                f"{mod} after step {k}"
            )
        for name, crit in (("corr", crit_corr), ("uncorr", crit_uncorr)):
            np.testing.assert_allclose(
                np.asarray(ts["luts"][name]), crit.lut.numpy(), atol=5e-4,
                err_msg=f"lut {name} after step {k}"
            )

        resync_torch_from_jax(skip)


@pytest.mark.slow
def test_eval_descriptor_matches_reference_recipe():
    """The 6144-d descriptor construction (reference attevaluator.py:77-80:
    cat(x_uncorr, siamese.self_attention(x_corr), x_corr.mean(t))) through
    the REAL extraction path (Evaluator.describe_clips incl. bucketing)
    vs the literal reference modules computing the same concat."""
    from grl_tpu.data.transforms import normalize
    from grl_tpu.engine.evaluator import Evaluator

    ref = load_reference_models()
    cnn_ref = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0).eval()
    sia_ref = ref.Siamese.Siamese(2048, 512, 2).eval()

    cnn = models.GRLModel()
    sia = models.Siamese(input_num=2048, output_num=512)
    cnn_p, cnn_s = cnn.init(jax.random.PRNGKey(0))
    sia_p, sia_s = sia.init(jax.random.PRNGKey(1))
    load_into_torch(cnn_ref, cnn_p, cnn_s, aliases=ct.GRL_ALIASES)
    load_into_torch(sia_ref, sia_p, sia_s)

    clips_u8 = np.random.RandomState(0).randint(
        0, 256, (3, 2, 256, 128, 3), np.uint8
    )
    ev = Evaluator(cnn, sia, micro_batch=4)
    params = {"cnn": cnn_p, "siamese": sia_p}
    state = {"cnn": cnn_s, "siamese": sia_s}
    chunks = ev.describe_clips(params, state, clips_u8)
    got = np.concatenate([np.asarray(c)[:n] for c, n in chunks])

    t_clips = torch.from_numpy(
        np.transpose(np.asarray(normalize(clips_u8)), (0, 1, 4, 2, 3)).copy()
    )
    with torch.no_grad():
        x_uncorr, x_corr = cnn_ref(t_clips)
        pooled = sia_ref.self_attention(x_corr)
        want = torch.cat((x_uncorr, pooled, x_corr.mean(dim=1)), dim=1)
    assert got.shape == (3, 6144)
    np.testing.assert_allclose(got, want.numpy(), atol=5e-5)


@pytest.mark.slow
def test_reference_checkpoint_import_roundtrip():
    """The FORWARD converter against a real reference checkpoint: a
    literal ResNet50_GRL_Model's state_dict (with the DataParallel
    'module.' prefixes the reference's save_cnn_checkpoint produces,
    mars_train.py:80 + serialization.py:25-43) loads into grl_tpu via
    load_grl_checkpoint, and both models then produce identical eval
    outputs. Together with the reverse-converter tests above, both
    conversion directions are proven on real reference structure."""
    from grl_tpu.utils.convert_torch import load_grl_checkpoint

    ref = load_reference_models()
    torch.manual_seed(0)
    m_ref = ref.grl_model.ResNet50_GRL_Model(pretrained=False, numclasses=0).eval()
    flat = {f"module.{k}": v.numpy() for k, v in m_ref.state_dict().items()}

    model = models.GRLModel()
    params, state = model.init(jax.random.PRNGKey(9))
    params, state = load_grl_checkpoint(np_tree(params), np_tree(state), flat)

    clips = np.random.RandomState(3).rand(2, 2, 256, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_u, ref_c = m_ref(
            torch.from_numpy(np.transpose(clips, (0, 1, 4, 2, 3)).copy())
        )
    (ju, jc), _ = model.apply(params, state, clips, training=False)
    np.testing.assert_allclose(np.asarray(ju), ref_u.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jc), ref_c.numpy(), atol=2e-5, rtol=1e-4)


def test_eval_transform_chain_matches_reference(tmp_path):
    """The eval input chain end to end vs the literal reference transforms:
    JPEG file -> decode -> RectScale resize -> ToTensor -> Normalize
    (reference dataloader.py:66-72 chain, seqtransforms.py RectScale/
    ToTensor/Normalize run as-is) against ClipDataset's native decode +
    resize + on-device normalize. With the native resize PIL-bit-exact,
    the two pipelines should agree to float rounding."""
    import importlib.util

    from PIL import Image

    from grl_tpu.data import ClipDataset
    from grl_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, normalize

    spec = importlib.util.spec_from_file_location(
        "_ref_seqtransforms", "/root/reference/reid/data/seqtransforms.py"
    )
    T = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(T)

    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = (rng.rand(48, 20, 3) * 255).astype(np.uint8)
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(img).save(p, quality=92)
        paths.append(str(p))

    h, w = 64, 32
    chain = T.Compose([
        T.RectScale(h, w),
        T.ToTensor(),
        T.Normalize(list(IMAGENET_MEAN), list(IMAGENET_STD)),
    ])
    ref_frames = chain([[Image.open(p).convert("RGB") for p in paths]])[0]
    ref = torch.stack(ref_frames).numpy()  # (t, 3, h, w)

    ds = ClipDataset([(tuple(paths), 0, 0)], seq_len=4, sample="rrs_test",
                     height=h, width=w)
    clips_u8 = ds.get(0)[0]  # (t, h, w, 3) uint8 — decoded + resized
    got = np.transpose(np.asarray(normalize(clips_u8)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Metrics: engine/metrics.py vs the reference's own eva_functions.py
# ---------------------------------------------------------------------------


def random_protocol(seed, num_q=20, num_g=60, num_pids=6, num_cams=4, junk_pids=False):
    rng = np.random.RandomState(seed)
    distmat = rng.rand(num_q, num_g)
    q_pids = rng.randint(0, num_pids, num_q)
    g_pids = rng.randint(0, num_pids, num_g)
    if junk_pids:
        g_pids[rng.rand(num_g) < 0.15] = -1
    q_cams = rng.randint(0, num_cams, num_q)
    g_cams = rng.randint(0, num_cams, num_g)
    return distmat, q_pids, g_pids, q_cams, g_cams


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_evaluate_matches_reference(seed):
    eva, _ = load_reference_evaluator()
    dm, qp, gp, qc, gc = random_protocol(seed)
    ref_cmc, ref_map = eva.evaluate(dm, qp, gp, qc, gc, max_rank=30)
    got_cmc, got_map = M.evaluate(dm, qp, gp, qc, gc, max_rank=30)
    np.testing.assert_allclose(got_cmc, ref_cmc, atol=1e-6)
    assert got_map == pytest.approx(float(ref_map), abs=1e-9)


@pytest.mark.parametrize(
    "config",
    [
        # legacy evaluator.py:21-33 configurations
        dict(separate_camera_set=False, single_gallery_shot=False, first_match_break=False),
        dict(separate_camera_set=False, single_gallery_shot=False, first_match_break=True),
        dict(separate_camera_set=True, single_gallery_shot=True, first_match_break=False),
    ],
    ids=["allshots", "market1501", "cuhk03"],
)
def test_cmc_matches_reference(config):
    eva, _ = load_reference_evaluator()
    dm, qp, gp, qc, gc = random_protocol(7)
    if config["single_gallery_shot"] and not hasattr(np, "bool"):
        pytest.skip("reference _unique_sample needs np.bool (removed in numpy 1.24-2.0)")
    # the reference samples via the GLOBAL numpy RNG; our cmc takes a seed
    # that must reproduce the same stream (RandomState(s) == seed(s))
    np.random.seed(11)
    ref = eva.cmc(dm, qp, gp, qc, gc, topk=25, **config)
    got = M.cmc(dm, qp, gp, qc, gc, topk=25, seed=11, **config)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_mean_ap_matches_reference_sklearn():
    eva, _ = load_reference_evaluator()
    dm, qp, gp, qc, gc = random_protocol(9)
    ref = eva.mean_ap(dm, qp, gp, qc, gc)
    got = M.mean_ap(dm, qp, gp, qc, gc)
    assert got == pytest.approx(float(ref), abs=1e-9)


def test_accuracy_matches_reference():
    """The reference accuracy (eva_functions.py:118-131) bit-rots under
    torch >= 1.1 for k > 1: ``correct[:k].view(-1)`` on the transposed
    prediction matrix is a non-contiguous view. The k=1 slice happens to
    stay contiguous, so the top-1 path (the only one the live trainer
    uses, reid/train/trainer.py via PairLoss) pins against the literal
    code; k>1 coverage lives in test_metrics.py against the documented
    intent."""
    eva, _ = load_reference_evaluator()
    rng = np.random.RandomState(10)
    logits = rng.randn(32, 7).astype(np.float32)
    target = rng.randint(0, 7, 32)
    ref = [float(x) for x in eva.accuracy(logits, target, topk=(1,))]
    got = M.accuracy(logits, target, topk=(1,))
    np.testing.assert_allclose(got, ref, atol=1e-7)
    with pytest.raises(RuntimeError):  # documents the k>1 bit-rot
        eva.accuracy(logits, target, topk=(1, 3))


@pytest.mark.parametrize("seed", [12, 13])
def test_evaluate_market_matches_reference_zhengliang(seed):
    eva, _ = load_reference_evaluator()
    dm, qp, gp, qc, gc = random_protocol(seed, junk_pids=True)
    ref_cmc, ref_map = eva.evaluate_zhengliang(dm, qp, gp, qc, gc, max_rank=30)
    got_cmc, got_map = M.evaluate_market(dm, qp, gp, qc, gc, max_rank=30)
    np.testing.assert_allclose(got_cmc, ref_cmc, atol=1e-6)
    assert got_map == pytest.approx(float(ref_map), abs=1e-7)


# ---------------------------------------------------------------------------
# Re-ranking: host rewrite AND device path vs the reference's rerank.py
# ---------------------------------------------------------------------------


def random_rerank_problem(seed, num_q=12, num_g=30, dim=16):
    """Consistent cosine-style distance blocks from random unit features."""
    rng = np.random.RandomState(seed)
    feats = rng.randn(num_q + num_g, dim).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    d = -feats @ feats.T
    return d[:num_q, num_q:], d[:num_q, :num_q], d[num_q:, num_q:]


@pytest.mark.parametrize("seed", [0, 1])
def test_re_ranking_matches_reference(seed):
    _, rr = load_reference_evaluator()
    qg, qq, gg = random_rerank_problem(seed)
    ref = rr.re_ranking(qg, qq, gg, k1=8, k2=3, lambda_value=0.3)
    got = R.re_ranking(qg, qq, gg, k1=8, k2=3, lambda_value=0.3)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_re_ranking_device_matches_reference():
    _, rr = load_reference_evaluator()
    qg, qq, gg = random_rerank_problem(2)
    ref = rr.re_ranking(qg, qq, gg, k1=8, k2=3, lambda_value=0.3)
    got = np.asarray(
        R.re_ranking_device(qg, qq, gg, k1=8, k2=3, lambda_value=0.3, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Clip sampling grids: data/sampling.py vs the reference's video_loader.py
# ---------------------------------------------------------------------------


def _load_reference_video_loader():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_video_loader", "/root/reference/reid/data/video_loader.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FrameIdTransform:
    """Maps each PIL frame to a (1,) tensor of its red-channel value — with
    1x1 solid frames whose value IS the source frame index, the literal
    VideoDataset's output becomes its chosen index grid, readable without
    replicating any of its internals."""

    def __call__(self, seq):
        return [
            [torch.tensor([float(np.asarray(img)[0, 0, 0])]) for img in modal]
            for modal in seq
        ]


@pytest.mark.parametrize("seq_len", [4, 8])
def test_sampling_grids_match_reference(tmp_path, seq_len):
    """rrs_test / dense / rrs_train frame-index grids, index-exact vs the
    literal reference VideoDataset over every tracklet length 1..30:
    chunk strips, ceil-interval padding with last-frame repeats, the dense
    tail clip's cycling self-append, and (for rrs_train, whose per-chunk
    draw mechanics differ by design) grid membership at the reference's
    own randomly-chosen columns (reference reid/data/video_loader.py
    builds sample_clip at :36-50, rrs_test :142-155, dense :86-123,
    rrs_train :124-141)."""
    from PIL import Image

    from grl_tpu.data import sampling as SA

    VL = _load_reference_video_loader()
    all_paths = []
    for i in range(30):
        p = tmp_path / f"f{i}.png"
        Image.fromarray(np.full((1, 1, 3), i, np.uint8)).save(p)
        all_paths.append(str(p))

    tf = _FrameIdTransform()
    for num in range(1, 31):
        cat = [(tuple(all_paths[:num]), 0, 0)]

        ref = VL.VideoDataset(cat, seq_len=seq_len, sample="rrs_test", transform=tf)
        got_ref = ref[0][0].numpy().ravel().astype(int)
        np.testing.assert_array_equal(
            SA.rrs_test_indices(num, seq_len), got_ref, err_msg=f"rrs_test num={num}"
        )

        ref = VL.VideoDataset(cat, seq_len=seq_len, sample="dense", transform=tf)
        ref_dense = ref[0][0].numpy()[..., 0].astype(int)
        np.testing.assert_array_equal(
            SA.dense_indices(num, seq_len), ref_dense, err_msg=f"dense num={num}"
        )

        # rrs_train: the reference draws ONE column choice over the global
        # numpy RNG; replaying that stream against OUR grid pins the full
        # sample_clip matrix (not just column 0) without requiring our
        # per-pool draw mechanics to share the reference's stream.
        for seed in (0, 1):
            np.random.seed(seed)
            ref = VL.VideoDataset(cat, seq_len=seq_len, sample="rrs_train", transform=tf)
            got_train = ref[0][0].numpy().ravel().astype(int)
            grid = SA.rrs_grid(num, seq_len)
            cols = np.random.RandomState(seed).choice(len(grid[0]), len(grid))
            expect = np.array([grid[r][c] for r, c in enumerate(cols)])
            np.testing.assert_array_equal(
                expect, got_train, err_msg=f"rrs_train num={num} seed={seed}"
            )


# ---------------------------------------------------------------------------
# MARS catalog: data/catalogs/mars.py vs the reference's dataset/mars.py
# ---------------------------------------------------------------------------


def test_mars_catalog_matches_reference(tmp_path):
    """Output-exact catalog parity on the same on-disk tree: tracklet
    (paths, pid, camid) tuples for train/query/gallery, pid counts, and
    the queryinfo/galleryinfo protocol arrays, against the literal
    reference Mars parser (reid/dataset/mars.py) with its hardcoded-root
    class attributes re-pointed at a generated fake tree (the root bug —
    ignoring --data-dir — is the one documented divergence)."""
    import os.path as osp
    import sys

    from reference_loader import load_reference_mars, point_reference_mars_at

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from make_fake_mars import make_fake_mars

    from grl_tpu.data.catalogs.mars import Mars as OurMars

    root = make_fake_mars(
        str(tmp_path / "MARS"), train_ids=3, test_ids=3, cams=3,
        tracklets_per_id_cam=2, junk_tracklets=2, query_cams=2,
    )

    ref_mod = load_reference_mars()
    point_reference_mars_at(ref_mod.Mars, root)
    ref = ref_mod.Mars(min_seq_len=0)
    ours = OurMars(root, use_cache=False)

    def norm(tracklets):
        return [(tuple(paths), int(pid), int(cam)) for paths, pid, cam in tracklets]

    assert norm(ours.train) == norm(ref.train)
    assert norm(ours.query) == norm(ref.query)
    assert norm(ours.gallery) == norm(ref.gallery)
    assert ours.num_train_pids == ref.num_train_pids
    assert ours.num_query_pids == ref.num_query_pids
    assert ours.num_gallery_pids == ref.num_gallery_pids
    for split in ("queryinfo", "galleryinfo"):
        for field in ("pid", "camid", "tranum"):
            np.testing.assert_array_equal(
                np.asarray(getattr(getattr(ours, split), field)),
                np.asarray(getattr(getattr(ref, split), field)),
                err_msg=f"{split}.{field}",
            )


def test_duke_catalog_matches_reference(tmp_path):
    """Duke directory-walk parity on the same tree vs the literal
    reference parser (reid/dataset/duke.py): tracklet frame-path
    reconstruction by F-index lookup, old/new filename camid parsing,
    dense sub-clip splitting, and pid counts. The reference's tracklet
    ORDER and train relabeling come from unsorted glob and set-iteration
    accidents, so lists are compared sorted and the train labels as a
    bijection (any consistent relabeling is equivalent for the OIM lut)."""
    import os.path as osp
    import sys

    from reference_loader import load_reference_duke

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from make_fake_duke import make_fake_duke

    from grl_tpu.data.catalogs.duke import DukeMTMCVidReID as OurDuke

    root = make_fake_duke(str(tmp_path / "DukeV"), train_ids=3, test_ids=3, cams=3)

    # ours FIRST with caching off: the literal writes split_*.json into
    # the tree, and reading those back would compare the reference to
    # itself
    ours = OurDuke(root, use_cache=False, verbose=False)
    ref_mod = load_reference_duke()
    ref_mod.DukeMTMCVidReID.root = root
    ref = ref_mod.DukeMTMCVidReID(verbose=False)

    def by_first_path(tracklets):
        return sorted(
            ((tuple(p), int(pid), int(cam)) for p, pid, cam in tracklets),
            key=lambda t: t[0][0],
        )

    for split in ("query", "gallery"):
        assert by_first_path(getattr(ours, split)) == by_first_path(getattr(ref, split)), split

    for ours_t, ref_t in (
        (ours.train, ref.train),
        (ours.train_dense, ref.train_dense),
    ):
        a, b = by_first_path(ours_t), by_first_path(ref_t)
        assert [(t[0], t[2]) for t in a] == [(t[0], t[2]) for t in b]  # paths+camid
        pairs = {(ta[1], tb[1]) for ta, tb in zip(a, b)}
        assert len({p[0] for p in pairs}) == len(pairs) == len({p[1] for p in pairs}), \
            "train relabeling is not a consistent bijection"

    assert ours.num_train_pids == ref.num_train_pids
    assert ours.num_query_pids == ref.num_query_pids
    assert ours.num_gallery_pids == ref.num_gallery_pids


@pytest.mark.parametrize("seq_len", [4, 8])
def test_random_window_matches_reference(tmp_path, seq_len):
    """'random' consecutive-window sampling vs the literal VideoDataset
    (video_loader.py:52-84): replay the reference's global-random begin
    draw into our random_window_indices via an rng stub, so the window
    construction and cycling repeat-padding must agree index-exact (the
    draw MECHANICS differ by design: global python random vs passed-in
    numpy rng)."""
    import random

    from PIL import Image

    from grl_tpu.data import sampling as SA

    VL = _load_reference_video_loader()
    all_paths = []
    for i in range(30):
        p = tmp_path / f"f{i}.png"
        Image.fromarray(np.full((1, 1, 3), i, np.uint8)).save(p)
        all_paths.append(str(p))

    class _Replay:
        def __init__(self, begin):
            self.begin = begin

        def randint(self, lo, hi):
            assert lo <= self.begin < hi
            return self.begin

    tf = _FrameIdTransform()
    for num in range(1, 31):
        cat = [(tuple(all_paths[:num]), 0, 0)]
        for seed in (0, 1):
            random.seed(seed)
            ref = VL.VideoDataset(cat, seq_len=seq_len, sample="random", transform=tf)
            got_ref = ref[0][0].numpy().ravel().astype(int)
            begin = random.Random(seed).randint(0, max(0, num - seq_len - 1))
            got = SA.random_window_indices(num, seq_len, _Replay(begin))
            np.testing.assert_array_equal(
                got, got_ref, err_msg=f"random num={num} seed={seed}"
            )


def _assert_sequence_catalog_matches(ours, ref, root):
    """Window-exact comparison: rebuild the literal (start, end, pid,
    index, camid) records into our (img_paths, label, camid) tracklet
    tuples through the shared meta.json and compare every split."""
    import os.path as osp

    identities = ours.meta["identities"]

    def rebuild(records):
        return [
            (
                tuple(
                    osp.join(root, "images", identities[pid][camid][i])
                    for i in range(s, e)
                ),
                idx,
                camid,
            )
            for s, e, pid, idx, camid in records
        ]

    assert list(ours.train) == rebuild(ref.train)
    assert list(ours.val) == rebuild(ref.val)
    assert list(ours.trainval) == rebuild(ref.trainval)
    assert list(ours.query) == rebuild(ref.query)
    assert list(ours.gallery) == rebuild(ref.gallery)
    assert ours.num_train_pids == ref.num_train_ids
    assert ours.num_trainval_ids == ref.num_trainval_ids
    for split in ("queryinfo", "galleryinfo"):
        for field in ("pid", "camid", "tranum"):
            np.testing.assert_array_equal(
                np.asarray(getattr(getattr(ours, split), field)),
                np.asarray(getattr(getattr(ref, split), field)),
                err_msg=f"{split}.{field}",
            )


@pytest.mark.parametrize("name", ["ilids", "prid"])
def test_sequence_catalog_matches_reference(tmp_path, name):
    """iLIDS-VID / PRID-2011 windowed catalogs vs the literal reference
    classes (reid/dataset/{ilidsvidsequence,prid2011sequence}.py +
    datasequence.py _pluckseq/_pluckseq_cam) on the same PREPARED layout:
    train/val/trainval window plucking with the (seq_len, seq_srd)
    stride-exclusive range and whole-tracklet fallback, per-camera
    query/gallery windows, and the protocol info arrays. The random
    trainval shuffle is replayed by seeding the global numpy RNG for the
    literal and passing the same seed to ours (same MT19937 stream)."""
    from reference_loader import load_reference_sequences

    from test_sequence_catalogs import make_raw_ilids, make_raw_prid

    from grl_tpu.data.catalogs import iLIDSVIDSequence
    from grl_tpu.data.catalogs.prepare import prepare_ilidsvid, prepare_prid2011
    from grl_tpu.data.catalogs.sequence import PRID2011Sequence

    ilids_mod, prid_mod = load_reference_sequences()
    if name == "ilids":
        root = make_raw_ilids(tmp_path, num_ids=5, frames=9)
        prepare_ilidsvid(root)
        ref_cls, our_cls = ilids_mod.iLIDSVIDSEQUENCE, iLIDSVIDSequence
    else:
        root = make_raw_prid(tmp_path, num_ids=5, frames=9)
        prepare_prid2011(root, num_splits=3)
        ref_cls, our_cls = prid_mod.PRID2011SEQUENCE, PRID2011Sequence

    kw = dict(split_id=0, seq_len=4, seq_srd=2, num_val=1)
    np.random.seed(13)
    ref = ref_cls(str(root), **kw)
    ours = our_cls(str(root), seed=13, verbose=False, **kw)
    _assert_sequence_catalog_matches(ours, ref, str(root))
