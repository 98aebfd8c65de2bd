"""Layer parity vs plain torch: BatchNorm semantics, grouped 1x1 conv, GELU,
avg-pool."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gkgnet_tpu.nn import layers as Lyr


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6, 5, 8)).astype(np.float32)  # NHWC
    bn = Lyr.BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)

    tbn = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    tbn.train()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # two training steps to exercise running-stat accumulation
    variables = dict(variables)
    for _ in range(2):
        y, mutated = bn.apply(
            variables, jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        variables = {"params": variables["params"], **mutated}
        yt = tbn(xt)

    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), yt.detach().numpy(),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-5)

    # eval mode uses the running stats
    tbn.eval()
    y_eval = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_eval), (0, 3, 1, 2)),
        tbn(xt).detach().numpy(), atol=1e-5, rtol=1e-5)


def test_grouped_pointwise_conv_matches_torch():
    rng = np.random.default_rng(1)
    cin, cout, g = 16, 24, 4
    x = rng.standard_normal((2, 10, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin // g, 1, 1)).astype(np.float32)
    b = rng.standard_normal((cout,)).astype(np.float32)

    conv = Lyr.PointwiseConv(cout, groups=g)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch weight (Cout, Cin/G, 1, 1) -> ours (G, Cin/G, Cout/G)
    wk = w[:, :, 0, 0].reshape(g, cout // g, cin // g).transpose(0, 2, 1)
    variables = {"params": {"kernel": jnp.asarray(wk), "bias": jnp.asarray(b)}}
    got = np.asarray(conv.apply(variables, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(cin, cout, 1, groups=g)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(np.transpose(x, (0, 2, 1))[:, :, :, None])
    want = tconv(xt).detach().numpy()[:, :, :, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(Lyr.Activation("gelu").apply({}, jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hswish_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(Lyr.Activation("hswish").apply({}, jnp.asarray(x)))
    want = torch.nn.Hardswish()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_avg_pool_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12, 8, 5)).astype(np.float32)
    got = np.asarray(Lyr.avg_pool_nhwc(jnp.asarray(x), 4))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = torch.nn.functional.avg_pool2d(xt, 4, 4).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_droppath_eval_identity_and_train_mask():
    x = jnp.ones((8, 4, 4, 3))
    dp = Lyr.DropPath(0.5)
    y = dp.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y = dp.apply({}, x, deterministic=False,
                 rngs={"droppath": jax.random.PRNGKey(1)})
    vals = np.asarray(y).reshape(8, -1)
    for row in vals:  # per-sample: all zero or all 1/keep
        assert np.all(row == 0.0) or np.allclose(row, 2.0)
