"""Pipeline (pp) and sequence (sp) parallelism on the 8-device CPU mesh:
both must reproduce the serial forward exactly (fp32 tolerance)."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter


def _model(layers=4):
    return make_tiny_adapter(vocab=128, hidden=64, inter=128, layers=layers,
                             heads=4, kv_heads=4, seed=0)


def test_pipeline_forward_matches_serial():
    from lightcompress_tpu.models import arch as A
    from lightcompress_tpu.parallel.mesh import make_mesh
    from lightcompress_tpu.parallel.pipeline import pipeline_blocks_forward

    model = _model(layers=4)
    arch = model.arch
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 128, (8, 16)), jnp.int32)

    # serial reference: embed -> blocks -> (pre-head hidden states)
    x = A.embed_forward(arch, model.params, ids)
    cos, sin = A.rope_cos_sin(arch, jnp.arange(16))
    mask = A.causal_mask(16, 16)
    ref = x
    for bp in model.params["blocks"]:
        ref, _, _ = A.block_forward(arch, bp, ref, cos, sin, mask)
    ref = np.asarray(ref)

    devs = jax.devices()[:4]
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devs), axis_names=("pp",))
    out = pipeline_blocks_forward(
        mesh, arch, model.params["blocks"], x, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_pipeline_bubble_schedule_few_microbatches():
    # n_micro < pp still correct (pure-bubble regime)
    from lightcompress_tpu.models import arch as A
    from lightcompress_tpu.parallel.pipeline import pipeline_blocks_forward

    model = _model(layers=8)
    arch = model.arch
    ids = jnp.asarray(
        np.random.RandomState(1).randint(0, 128, (2, 8)), jnp.int32)
    x = A.embed_forward(arch, model.params, ids)
    cos, sin = A.rope_cos_sin(arch, jnp.arange(8))
    mask = A.causal_mask(8, 8)
    ref = x
    for bp in model.params["blocks"]:
        ref, _, _ = A.block_forward(arch, bp, ref, cos, sin, mask)

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), axis_names=("pp",))  # pp=8
    out = pipeline_blocks_forward(
        mesh, arch, model.params["blocks"], x, n_micro=2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sp_prefill_matches_serial():
    from lightcompress_tpu.parallel.mesh import make_mesh
    from lightcompress_tpu.parallel.sequence import sp_prefill_forward

    model = _model(layers=2)
    ids = jnp.asarray(
        np.random.RandomState(2).randint(0, 128, (2, 32)), jnp.int32)
    ref = np.asarray(model.forward(ids))

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), axis_names=("sp",))
    out = sp_prefill_forward(mesh, model.arch, model.params, ids)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


def test_sp_activations_are_sequence_sharded():
    """The residual stream really is sharded on the sequence axis."""
    from lightcompress_tpu.parallel.sequence import sp_prefill_forward

    model = _model(layers=2)
    ids = jnp.zeros((1, 32), jnp.int32)
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), axis_names=("sp",))
    out = sp_prefill_forward(mesh, model.arch, model.params, ids)
    # logits come back sequence-sharded over the 8 devices
    assert len(out.sharding.device_set) == 8
