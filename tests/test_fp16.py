"""fp16 dynamic-loss-scale mode (mmcv LossScaler semantics: skip + halve on
non-finite grads, grow x2 after N consecutive finite steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gkgnet_tpu.core.trainer import create_train_state, make_train_step
from gkgnet_tpu.nn.classifier import GKGNetClassifier


def _setup(growth_interval):
    model = GKGNetClassifier(arch="t", k=3, k_label_gcn=3, n_classes=80,
                             size=128, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 128, 128, 3), jnp.float32)
    tx = optax.sgd(1e-3)
    state = create_train_state(model, rng, sample, tx,
                               dynamic_loss_scale=True)
    step = make_train_step(model, tx, dynamic_loss_scale=True,
                           scale_growth_interval=growth_interval,
                           donate=False)
    return state, step


def test_dynamic_scale_growth_and_finite_update():
    state, step = _setup(growth_interval=2)
    assert float(state.loss_scale) == 2.0 ** 16
    batch = {"img": jnp.ones((2, 128, 128, 3), jnp.float32) * 0.1,
             "gt_label": jnp.zeros((2, 80), jnp.float32).at[0, 3].set(1.0)}
    rng = jax.random.PRNGKey(1)
    p0 = state.params["head"]["fc1_kernel"]
    state, logs = step(state, batch, rng)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["loss_scale"]) == 2.0 ** 16   # good_steps 0 -> 1
    assert not np.allclose(np.asarray(state.params["head"]["fc1_kernel"]),
                           np.asarray(p0))          # finite step applied
    state, logs = step(state, batch, rng)
    assert float(logs["loss_scale"]) == 2.0 ** 17   # grew after 2 finite steps
    assert int(state.good_steps) == 0


def test_dynamic_scale_backoff_skips_update():
    state, step = _setup(growth_interval=2000)
    bad = {"img": jnp.full((2, 128, 128, 3), jnp.nan, jnp.float32),
           "gt_label": jnp.zeros((2, 80), jnp.float32)}
    rng = jax.random.PRNGKey(1)
    params0 = jax.tree.map(np.asarray, state.params)
    state, logs = step(state, bad, rng)
    assert float(logs["loss_scale"]) == 2.0 ** 15   # halved
    assert int(state.good_steps) == 0
    # update skipped: params identical
    for a, b in zip(jax.tree.leaves(params0),
                    jax.tree.leaves(jax.tree.map(np.asarray, state.params))):
        np.testing.assert_array_equal(a, b)
