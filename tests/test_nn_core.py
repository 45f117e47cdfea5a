"""Numeric parity of the nn core against PyTorch (CPU) oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from grl_tpu import nn


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def torch_conv_to_hwio(w):
    # torch conv weight OIHW -> HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


@pytest.mark.parametrize("stride,padding,ks", [(1, 1, 3), (2, 3, 7), (1, 0, 1)])
def test_conv2d_matches_torch(stride, padding, ks):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 16, 12).astype(np.float32)  # NCHW for torch
    tconv = tnn.Conv2d(8, 5, ks, stride=stride, padding=padding, bias=True)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    conv = nn.Conv2d(8, 5, ks, stride=stride, padding=padding, bias=True)
    params = {
        "kernel": jnp.asarray(torch_conv_to_hwio(tconv.weight)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    y, _ = conv.apply(params, {}, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_linear_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 32).astype(np.float32)
    tlin = tnn.Linear(32, 10)
    with torch.no_grad():
        ref = tlin(torch.from_numpy(x)).numpy()
    lin = nn.Linear(32, 10)
    params = {
        "kernel": jnp.asarray(tlin.weight.detach().numpy().T),
        "bias": jnp.asarray(tlin.bias.detach().numpy()),
    }
    y, _ = lin.apply(params, {}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm2d_train_and_eval_match_torch():
    rng = np.random.RandomState(2)
    x1 = rng.randn(4, 6, 5, 3).astype(np.float32) * 2 + 1  # NCHW
    x2 = rng.randn(4, 6, 5, 3).astype(np.float32)

    tbn = tnn.BatchNorm2d(6)
    tbn.train()
    with torch.no_grad():
        r1 = tbn(torch.from_numpy(x1)).numpy()
        r2 = tbn(torch.from_numpy(x2)).numpy()
    tbn.eval()
    with torch.no_grad():
        r3 = tbn(torch.from_numpy(x1)).numpy()

    bn = nn.BatchNorm(6)
    params, state = bn.init(jax.random.PRNGKey(0))
    y1, state = bn.apply(params, state, jnp.asarray(to_nhwc(x1)), training=True)
    y2, state = bn.apply(params, state, jnp.asarray(to_nhwc(x2)), training=True)
    y3, _ = bn.apply(params, state, jnp.asarray(to_nhwc(x1)), training=False)

    np.testing.assert_allclose(np.asarray(y1), to_nhwc(r1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), to_nhwc(r2), rtol=1e-4, atol=1e-5)
    # running-stat trajectory parity (two sequential momentum updates)
    np.testing.assert_allclose(np.asarray(state["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y3), to_nhwc(r3), rtol=1e-4, atol=1e-5)


def test_batchnorm1d_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(8, 16).astype(np.float32)
    tbn = tnn.BatchNorm1d(16)
    tbn.train()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x)).numpy()
    bn = nn.BatchNorm1d(16)
    params, state = bn.init(jax.random.PRNGKey(0))
    y, _ = bn.apply(params, state, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 17, 9).astype(np.float32)
    with torch.no_grad():
        ref = tnn.MaxPool2d(3, stride=2, padding=1)(torch.from_numpy(x)).numpy()
    y = nn.max_pool2d(jnp.asarray(to_nhwc(x)), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), rtol=1e-5, atol=1e-6)


def test_sequential_threads_state():
    seq = nn.Sequential(nn.Conv2d(3, 4, 1, bias=False), nn.BatchNorm(4), nn.Lambda(nn.functional.relu))
    params, state = seq.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 4, 4, 3))
    y, new_state = seq.apply(params, state, x, training=True)
    assert y.shape == (2, 4, 4, 4)
    assert not np.allclose(np.asarray(new_state["1"]["mean"]), 0.0)


def test_l2_normalize():
    x = jnp.asarray(np.random.RandomState(5).randn(4, 7).astype(np.float32))
    y = nn.functional.l2_normalize(x, axis=1)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1), 1.0, rtol=1e-5)
