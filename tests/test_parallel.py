"""Sharding tests on the virtual 8-device CPU mesh: TP layout correctness
(sharded forward == replicated forward) and the driver dryrun."""

import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_shapes():
    from lightcompress_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh2 = make_mesh(8)
    assert mesh2.shape["dp"] * mesh2.shape["tp"] == 8


def test_sharded_forward_matches_replicated():
    from helpers import make_tiny_adapter
    from lightcompress_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    model = make_tiny_adapter(vocab=128, hidden=64, inter=128, layers=2,
                              heads=4, kv_heads=4, seed=0)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (4, 8)), jnp.int32)
    ref = np.asarray(model.forward(ids))

    mesh = make_mesh(8, dp=2, tp=4)
    params_sharded = shard_params(model.params, mesh, model.arch)
    model.params = params_sharded
    ids_sharded = shard_batch(ids, mesh)
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(model.forward)(ids_sharded))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
