"""The GRL training step — loss recipe, gradients, optimizer, OIM updates.

Reproduces SEQTrainer._forward (reference reid/train/trainer.py:107-170):

1. frame-level OIM on the correlated stream, targets tiled over time;
2. Siamese attention pooling -> video-level OIM + soft batch-hard triplet
   on the pooled correlated features;
3. verification: softmax of the pairwise scores' class-1 probability ->
   pair BCE, weighted x20 (trainer.py:165);
4. uncorrelated stream -> SiameseVideo head -> video-level OIM;
   total = (1) + (2) + (3) + (4).

The frame and video OIM losses share one lookup table (the reference passes
the same ``criterion_corr`` to both, trainer.py:126,138); lut updates are
applied after the gradient in reverse forward order — video features first,
then frame features — matching torch autograd's reverse-order backward
execution of the two stateful OIM Functions. That reverse order also
COUPLES the gradients: the frame OIM's backward reads the shared buffer
after the video OIM's backward mutated it, so the frame gradient flows
through the post-video-update lut while its loss value used the original
(see the value/grad split in grl_loss_fn — pinned against literal torch
autograd in tests/test_reference_parity.py).

Everything (forward, backward, optimizer, lut updates, BN state advance) is
one jitted function of explicit state — under a device mesh the same
function is pjit-sharded over the pair axis of the batch.

Documented divergence: params the loss never reaches (Siamese.featV, the
uncorrelated verification classifier) keep ``grad=None`` in torch and are
skipped by its SGD entirely; here they receive zero gradient and uniform
weight decay. Neither affects any model output or evaluation result.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

from .. import losses

# module-scope criterion like the reference (trainer.py:12-13 instantiates
# TripletLoss('soft', True) at import time); stateless
_TRIPLET = losses.TripletLoss("soft", True)


def top1_accuracy(logits, targets):
    return jnp.mean(jnp.argmax(logits, axis=-1) == targets)


@functools.lru_cache(maxsize=32)
def _jit_init(model):
    return jax.jit(model.init)


def init_train_state(rng, cnn, siamese, siamese_uncorr, num_classes, num_feat=2048,
                     optimizer=None):
    """Build the full training-state pytree."""
    from .optim import SGD, lr_mult_tree

    r1, r2, r3 = jax.random.split(rng, 3)
    # jit each init: one compiled program instead of hundreds of eager
    # per-layer RNG dispatches (order-of-magnitude startup win on TPU);
    # wrappers are cached per model object (CLAUDE.md: a fresh jit per
    # call discards the compile cache)
    cnn_p, cnn_s = _jit_init(cnn)(r1)
    sia_p, sia_s = _jit_init(siamese)(r2)
    unc_p, unc_s = _jit_init(siamese_uncorr)(r3)
    params = {"cnn": cnn_p, "siamese": sia_p, "siamese_uncorr": unc_p}
    model_state = {"cnn": cnn_s, "siamese": sia_s, "siamese_uncorr": unc_s}
    luts = {
        "corr": losses.init_lut(num_classes, num_feat),
        "uncorr": losses.init_lut(num_classes, num_feat),
    }
    optimizer = optimizer if optimizer is not None else SGD()
    # backbone (GCE incl. trunk) at lr_mult 1, everything new at 2
    # (mars_train.py:98-103).
    mults = lr_mult_tree(params, {"cnn/backbone": 1.0}, default=2.0)
    return {
        "params": params,
        "model_state": model_state,
        "luts": luts,
        "opt": optimizer.init(params),
        "lr_mults": mults,
        "step": jnp.zeros((), jnp.int32),
    }


def grl_loss_fn(params, model_state, luts, clips, targets, *, cnn, siamese,
                siamese_uncorr, oim_scalar=30.0, oim_momentum=0.5,
                verif_weight=20.0):
    """Returns (total_loss, aux) with aux carrying new model state, the
    features needed for lut updates, and scalar metrics."""
    b, t = clips.shape[0], clips.shape[1]
    ns = {}
    (x_uncorr, x_corr), ns["cnn"] = cnn.apply(
        params["cnn"], model_state["cnn"], clips, training=True
    )

    # pair-interleaved verification targets (trainer.py:130-135)
    tar_probe = targets[0::2]
    tar_gallery = targets[1::2]
    target = jnp.concatenate([tar_probe, tar_gallery])

    # (2) video-level: Siamese pooling -> OIM + triplet
    (encode_scores, siamese_out), ns["siamese"] = siamese.apply(
        params["siamese"], model_state["siamese"], x_corr, training=True
    )
    vid_logits = losses.oim_logits(siamese_out, luts["corr"], oim_scalar)
    corr_id_loss_vid = losses.cross_entropy(vid_logits, target)
    corr_loss_tri = jnp.mean(_TRIPLET(siamese_out, target))

    # (1) frame-level OIM on the correlated stream. The frame and video
    # OIM share one lut (the reference passes the same criterion_corr to
    # both, trainer.py:126,138) and torch's OIM mutates that buffer in
    # BACKWARD: autograd runs the video node's backward first (reverse
    # creation order), so by the time the frame node's backward computes
    # grad = grad_logits @ lut, the buffer already carries the video
    # momentum update. The loss VALUE, though, was computed in forward
    # with the original lut. Reproduce both: value from luts["corr"],
    # gradient through the post-video-update table (lut_mid is built from
    # stop_gradient'd features — torch's buffer update is grad-opaque).
    # Verified torch-vs-torch against the literal trainer's conv1 grad:
    # this coupled form matches to 2.7e-5 rel; the uncoupled form (grad
    # through the original lut) is off by 87% (tests/torch_oracle.py's
    # recipe carries the same split).
    frame_corr = x_corr.reshape(b * t, -1)
    frame_targets = jnp.repeat(targets, t)
    lut_mid = losses.update_lut(
        luts["corr"], jax.lax.stop_gradient(siamese_out), target, oim_momentum
    )
    frame_logits = losses.oim_logits(frame_corr, luts["corr"], oim_scalar)
    frame_logits_grad_path = losses.oim_logits(frame_corr, lut_mid, oim_scalar)
    frame_logits = frame_logits_grad_path + jax.lax.stop_gradient(
        frame_logits - frame_logits_grad_path
    )
    corr_id_loss_frame = losses.cross_entropy(frame_logits, frame_targets)

    # (3) verification BCE == 2-class cross-entropy of the raw scores
    # (stable log_softmax form; see losses.pair_loss_from_logits)
    corr_loss_ver, corr_prec_ver = losses.pair_loss_from_logits(
        encode_scores, tar_probe, tar_gallery
    )

    # (4) uncorrelated stream video OIM (verification loss computed but
    # excluded from the total in the reference, trainer.py:162,166)
    (_unc_scores, unc_out), ns["siamese_uncorr"] = siamese_uncorr.apply(
        params["siamese_uncorr"], model_state["siamese_uncorr"], x_uncorr, training=True
    )
    unc_logits = losses.oim_logits(unc_out, luts["uncorr"], oim_scalar)
    uncorr_id_loss_vid = losses.cross_entropy(unc_logits, target)

    total = (
        corr_id_loss_frame
        + corr_id_loss_vid
        + verif_weight * corr_loss_ver
        + corr_loss_tri
        + uncorr_id_loss_vid
    )

    aux = {
        "model_state": ns,
        "lut_features": {
            "corr_vid": (jax.lax.stop_gradient(siamese_out), target),
            "corr_frame": (jax.lax.stop_gradient(frame_corr), frame_targets),
            "uncorr_vid": (jax.lax.stop_gradient(unc_out), target),
        },
        "metrics": {
            "loss": total,
            "loss_frame_oim": corr_id_loss_frame,
            "loss_vid_oim": corr_id_loss_vid,
            "loss_verif": corr_loss_ver,
            "loss_triplet": corr_loss_tri,
            "loss_uncorr_oim": uncorr_id_loss_vid,
            "prec_frame": top1_accuracy(frame_logits, frame_targets),
            "prec_vid": top1_accuracy(vid_logits, target),
            "prec_uncorr": top1_accuracy(unc_logits, target),
            "prec_verif": corr_prec_ver,
        },
    }
    return total, aux


def make_train_step(cnn, siamese, siamese_uncorr, optimizer, *, oim_scalar=30.0,
                    oim_momentum=0.5, verif_weight=20.0, donate=True):
    """Build the jitted train step: (train_state, clips, targets, lr) ->
    (train_state, metrics)."""

    loss_fn = partial(
        grl_loss_fn,
        cnn=cnn,
        siamese=siamese,
        siamese_uncorr=siamese_uncorr,
        oim_scalar=oim_scalar,
        oim_momentum=oim_momentum,
        verif_weight=verif_weight,
    )

    def step(train_state, clips, targets, lr):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_state["params"],
            train_state["model_state"],
            train_state["luts"],
            clips,
            targets,
        )
        params, opt_state = optimizer.update(
            train_state["params"], grads, train_state["opt"], lr, train_state["lr_mults"]
        )
        # lut updates in torch-backward order (video before frame)
        feats = aux["lut_features"]
        corr = losses.update_lut(train_state["luts"]["corr"], *feats["corr_vid"], oim_momentum)
        corr = losses.update_lut(corr, *feats["corr_frame"], oim_momentum)
        uncorr = losses.update_lut(train_state["luts"]["uncorr"], *feats["uncorr_vid"], oim_momentum)

        new_state = {
            "params": params,
            "model_state": aux["model_state"],
            "luts": {"corr": corr, "uncorr": uncorr},
            "opt": opt_state,
            "lr_mults": train_state["lr_mults"],
            "step": train_state["step"] + 1,
        }
        return new_state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,) if donate else ())
