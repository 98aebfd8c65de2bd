"""Parallelism: 8-device CPU mesh — DP train step, GSPMD graph sharding,
explicit shard_map edge partition, cross-replica BN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gkgnet_tpu.ops.aggregate import max_relative
from gkgnet_tpu.ops.knn import dilate_edges, knn_graph
from gkgnet_tpu.parallel.edge_partition import edge_partitioned_knn_mr
from gkgnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from gkgnet_tpu.parallel.sharding import graph_sharding

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, graph=4)


def test_edge_partitioned_matches_unsharded(mesh):
    rng = np.random.default_rng(0)
    bg, n, m, c, k, d = 4, 64, 32, 16, 3, 2
    x = jnp.asarray(rng.standard_normal((bg, n, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, m, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)

    ref_idx = dilate_edges(knn_graph(x, y, k=k * d, bias=bias), dilation=d)
    ref_mr = max_relative(x, ref_idx, y)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "graph", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "graph", None)))
    bs = jax.device_put(bias, NamedSharding(mesh, P("graph", None)))
    idx, mr = jax.jit(
        lambda x_, y_, b_: edge_partitioned_knn_mr(
            mesh, x_, y_, b_, k=k, dilation=d))(xs, ys, bs)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(mr), np.asarray(ref_mr),
                               atol=1e-5, rtol=1e-5)


def test_edge_partitioned_self_knn(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    ref_idx = knn_graph(x, None, k=4)
    ref_mr = max_relative(x, ref_idx)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "graph", None)))
    idx, mr = jax.jit(
        lambda x_: edge_partitioned_knn_mr(mesh, x_, None, None, k=4))(xs)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(mr), np.asarray(ref_mr), atol=1e-5)


def test_label_sharded_knn_mr_bitwise(mesh):
    """Graph-sharded label build (target axis over 'graph', local top-k*d
    + exact lex merge + owner-side psum feature combine) vs the unsharded
    XLA build: idx bitwise, mr exact (the psum adds exact zeros)."""
    from gkgnet_tpu.parallel.edge_partition import (
        label_sharded_knn_mr, replicated_knn_mr)

    rng = np.random.default_rng(5)
    bg, l, m, c, k = 4, 10, 64, 16, 4
    x = jnp.asarray(rng.standard_normal((bg, l, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, m, c)), jnp.float32)
    ref_idx = knn_graph(x, y, k=k)
    ref_mr = max_relative(x, ref_idx, y)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "graph", None)))
    idx, mr = jax.jit(lambda a, b: label_sharded_knn_mr(
        mesh, a, b, k=k))(xs, ys)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(mr), np.asarray(ref_mr))

    # and vs the replicated shard_map path it replaces
    r_idx, r_mr = jax.jit(lambda a, b: replicated_knn_mr(
        mesh, a, b, k=k, use_pallas=False))(
            xs, jax.device_put(y, NamedSharding(mesh, P("data", None, None))))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(r_idx))
    np.testing.assert_array_equal(np.asarray(mr), np.asarray(r_mr))


def test_label_sharded_knn_mr_grad(mesh):
    """Gradients of the sharded label build (through gather + psum) match
    the unsharded recompute-gather path."""
    from gkgnet_tpu.parallel.edge_partition import label_sharded_knn_mr

    rng = np.random.default_rng(6)
    bg, l, m, c, k = 2, 6, 32, 8, 3
    x = jnp.asarray(rng.standard_normal((bg, l, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, m, c)), jnp.float32)

    def loss_ref(x_, y_):
        idx = knn_graph(x_, y_, k=k)
        return jnp.sum(max_relative(x_, idx, y_) ** 2)

    def loss_sharded(x_, y_):
        _, mr = label_sharded_knn_mr(mesh, x_, y_, k=k)
        return jnp.sum(mr ** 2)

    gx_r, gy_r = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "graph", None)))
    gx_s, gy_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(xs, ys)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_r),
                               atol=1e-5, rtol=1e-5)


def test_gspmd_forward_matches_single_device(mesh):
    """Model forward under (data, graph) sharding constraints == unsharded."""
    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    model = GKGNetClassifier(arch="t", k=3, k_label_gcn=3, n_classes=10,
                             size=128)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 128, 128, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = model.apply(variables, x, train=False)

    sharded_vars = jax.device_put(variables, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with graph_sharding(mesh):
        got, _ = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
            sharded_vars, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_batchnorm_axis_name_is_global_bn():
    """Explicit shard_map BN with axis_name == BN over the global batch."""
    from jax import shard_map

    from gkgnet_tpu.nn.layers import BatchNorm

    mesh2 = make_mesh(data=8, graph=1)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((16, 4, 4, 6)).astype(np.float32)

    bn = BatchNorm(axis_name="data")
    bn_ref = BatchNorm()
    variables = bn_ref.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            use_running_average=False)
    want, want_stats = bn_ref.apply(
        variables, jnp.asarray(x), use_running_average=False,
        mutable=["batch_stats"])

    def local(xl):
        out, mutated = bn.apply(variables, xl, use_running_average=False,
                                mutable=["batch_stats"])
        return out, mutated["batch_stats"]["mean"], mutated["batch_stats"]["var"]

    fn = shard_map(local, mesh=mesh2,
                   in_specs=P("data"),
                   out_specs=(P("data"), P(), P()))
    got, mean, var = jax.jit(fn)(
        jax.device_put(jnp.asarray(x),
                       NamedSharding(mesh2, P("data"))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(want_stats["batch_stats"]["mean"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(want_stats["batch_stats"]["var"]),
        rtol=1e-4)


def test_ring_overlap_matches_gather(mesh):
    """ppermute-ring schedule == all_gather schedule == unsharded, incl.
    (distance, index) tie order and the relative-pos bias slice."""
    rng = np.random.default_rng(5)
    bg, n, m, c, k, d = 4, 64, 32, 16, 3, 2
    x = jnp.asarray(rng.standard_normal((bg, n, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, m, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)

    ref_idx = dilate_edges(knn_graph(x, y, k=k * d, bias=bias), dilation=d)
    ref_mr = max_relative(x, ref_idx, y)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "graph", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "graph", None)))
    bs = jax.device_put(bias, NamedSharding(mesh, P("graph", None)))
    idx, mr = jax.jit(
        lambda x_, y_, b_: edge_partitioned_knn_mr(
            mesh, x_, y_, b_, k=k, dilation=d, overlap=True))(xs, ys, bs)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(mr), np.asarray(ref_mr),
                               atol=1e-5, rtol=1e-5)


def test_ring_overlap_self_knn_no_bias(mesh):
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    ref_idx = knn_graph(x, None, k=4)
    ref_mr = max_relative(x, ref_idx)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "graph", None)))
    idx, mr = jax.jit(
        lambda x_: edge_partitioned_knn_mr(mesh, x_, None, None, k=4,
                                           overlap=True))(xs)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(mr), np.asarray(ref_mr), atol=1e-5)


def test_ring_overlap_pallas_interpret(mesh):
    """The Pallas kernels inside the shard_map ring (interpret mode on the
    CPU mesh) match the XLA path bitwise."""
    rng = np.random.default_rng(7)
    bg, n, m, c, k = 2, 16, 16, 8, 3
    x = jnp.asarray(rng.standard_normal((bg, n, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, m, c)), jnp.float32)
    ref_idx = knn_graph(x, y, k=k)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "graph", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "graph", None)))
    idx, _ = jax.jit(
        lambda x_, y_: edge_partitioned_knn_mr(
            mesh, x_, y_, None, k=k, overlap=True, use_pallas=True))(xs, ys)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_model_graph4_shard_map_matches_single_device(mesh):
    """Full model forward on the graph=4 mesh — now routed through the
    explicit shard_map edge-partitioned paths (VERDICT round-1 item 3) —
    matches the unsharded forward."""
    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    model = GKGNetClassifier(arch="t", k=3, k_label_gcn=3, n_classes=10,
                             size=128)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 128, 128, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref, _ = model.apply(variables, x, train=False)

    sharded_vars = jax.device_put(variables, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    for overlap in (False, True):
        with graph_sharding(mesh, overlap=overlap):
            got, _ = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
                sharded_vars, xs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=f"overlap={overlap}")
