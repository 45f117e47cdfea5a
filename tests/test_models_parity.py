"""End-to-end numeric parity of the JAX models vs the torch oracle.

One random init feeds both implementations; train mode exercises the full
BatchNorm running-stat trajectory (including BN-in-scan inside TRL).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from grl_tpu import models

B, T, H, W = 2, 3, 32, 16
WIDTH = 4  # trunk channels: 8 * WIDTH * 4 = 128


def tiny_trunk():
    return models.ResNetTrunk(layers=(1, 1, 1, 1), last_stride=1, width=WIDTH)


def np_tree(tree):
    return jax.tree.map(np.asarray, tree)


def clips_pair():
    rng = np.random.RandomState(0)
    nhwc = rng.randn(B, T, H, W, 3).astype(np.float32)
    nchw = np.transpose(nhwc, (0, 1, 4, 2, 3))
    return jnp.asarray(nhwc), torch.from_numpy(nchw)


def assert_close(a, b, tol=2e-4):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(), rtol=tol, atol=tol)


@pytest.mark.parametrize("training", [False, True])
def test_trunk_parity(training):
    trunk = tiny_trunk()
    params, state = trunk.init(jax.random.PRNGKey(1))
    x_j, x_t = clips_pair()
    x_j, x_t = x_j[:, 0], x_t[:, 0]

    y, new_state = trunk.apply(params, state, x_j, training=training)

    ts = oracle.mutable_bn_states(np_tree(state))
    ref = oracle.trunk(trunk, np_tree(params), ts, x_t, training)
    assert_close(jnp.transpose(y, (0, 3, 1, 2)), ref)
    if training:
        # running stats advanced identically
        np.testing.assert_allclose(
            np.asarray(new_state["bn1"]["mean"]), ts["bn1"]["mean"].numpy(), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("training", [False, True])
def test_grl_model_parity(training):
    model = models.GRLModel(trunk=tiny_trunk())
    params, state = model.init(jax.random.PRNGKey(2))
    x_j, x_t = clips_pair()

    (f_uncorr, f_corr), new_state = model.apply(params, state, x_j, training=training)

    ts = oracle.mutable_bn_states(np_tree(state))
    ref_uncorr, ref_corr = oracle.grl_model(model, np_tree(params), ts, x_t, training)
    assert_close(f_uncorr, ref_uncorr)
    assert_close(f_corr, ref_corr)
    if training:
        # BN-in-scan trajectory: memory-block stats advanced t times.
        got = np.asarray(new_state["temporal_learning_block"]["fwd"]["memo"]["bn1"]["mean"])
        want = ts["temporal_learning_block"]["fwd"]["memo"]["bn1"]["mean"].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert not np.allclose(got, 0.0)


@pytest.mark.parametrize("training", [False, True])
def test_siamese_parity(training):
    chans = 64
    model = models.Siamese(input_num=chans, output_num=16)
    params, state = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    x = rng.randn(4, T, chans).astype(np.float32)

    (scores, pooled), _ = model.apply(params, state, jnp.asarray(x), training=training)

    ts = oracle.mutable_bn_states(np_tree(state))
    ref_scores, ref_pooled = oracle.siamese(np_tree(params), ts, torch.from_numpy(x), training)
    assert_close(pooled, ref_pooled)
    assert_close(scores, ref_scores)


def test_siamese_video_shapes():
    model = models.SiameseVideo(input_num=32)
    params, state = model.init(jax.random.PRNGKey(5))
    x = jnp.asarray(np.random.RandomState(6).randn(6, 32).astype(np.float32))
    (scores, out), _ = model.apply(params, state, x, training=True)
    assert scores.shape == (3, 3, 2)
    assert out.shape == (6, 32)
    # pooled output ordering: probes first then galleries
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(x[1]))


def test_factory():
    assert "resnet50_grl" in models.names()
    m = models.create("siamese_video", input_num=16)
    assert isinstance(m, models.SiameseVideo)
    with pytest.raises(KeyError):
        models.create("nope")
