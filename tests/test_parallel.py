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


def test_pp_serving_decode_matches_single():
    """Pipeline-parallel serving decode (stage-sharded quantized weights +
    KV, ppermute ring): per-step logits must match the single-device
    engine."""
    import numpy as np
    from jax.sharding import Mesh

    from helpers import make_tiny_adapter
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving import LLMEngine, build_serving_weights
    from lightcompress_tpu.serving.pp import PPDecoder

    model = make_tiny_adapter(seed=21, vocab=128, hidden=64, inter=128,
                              layers=4, heads=4, kv_heads=2)
    sw = build_serving_weights(
        model, QuantSpec(bit=8, symmetric=True, granularity="per_channel"))
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    ppd = PPDecoder(sw, mesh, max_slots=2, max_len=32)
    eng = LLMEngine(sw, max_slots=2, max_len=32, kv_bits=16,
                    prefill_buckets=(8,))
    active = jnp.asarray([True, True])
    cur = jnp.asarray([5, 9], jnp.int32)
    cache, lengths = eng.cache, eng.lengths
    for step in range(3):
        lg_pp = ppd.decode(cur, active)
        cache, lengths, lg_1 = eng._decode_jit(
            eng.sw, cache, lengths, cur, active)
        corr = float(jnp.corrcoef(
            jnp.ravel(lg_pp), jnp.ravel(lg_1))[0, 1])
        assert corr > 0.999, (step, corr)
        cur = jnp.argmax(lg_1, -1).astype(jnp.int32)


def test_pp_serving_decode_microbatched():
    """Pipelined (slot-microbatched) PP decode: per-step logits match the
    single-device engine for every slot."""
    import numpy as np
    from jax.sharding import Mesh

    from helpers import make_tiny_adapter
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving import LLMEngine, build_serving_weights
    from lightcompress_tpu.serving.pp import PPDecoder

    model = make_tiny_adapter(seed=22, vocab=128, hidden=64, inter=128,
                              layers=4, heads=4, kv_heads=2)
    sw = build_serving_weights(
        model, QuantSpec(bit=8, symmetric=True, granularity="per_channel"))
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    ppd = PPDecoder(sw, mesh, max_slots=4, max_len=32)
    eng = LLMEngine(sw, max_slots=4, max_len=32, kv_bits=16,
                    prefill_buckets=(8,))
    active = jnp.asarray([True] * 4)
    cur = jnp.asarray([5, 9, 17, 88], jnp.int32)
    cache, lengths = eng.cache, eng.lengths
    for step in range(3):
        lg_pp = ppd.decode_microbatched(cur, active)
        cache, lengths, lg_1 = eng._decode_jit(
            eng.sw, cache, lengths, cur, active)
        corr = float(jnp.corrcoef(
            jnp.ravel(lg_pp), jnp.ravel(lg_1))[0, 1])
        assert corr > 0.999, (step, corr)
        cur = jnp.argmax(lg_1, -1).astype(jnp.int32)


def test_pp_serving_prefill_and_decode():
    """PP prefill (prompt through the ring, stage-committed KV) followed
    by PP decode matches the single-device engine's prefill+decode."""
    import numpy as np
    from jax.sharding import Mesh

    from helpers import make_tiny_adapter
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving import LLMEngine, build_serving_weights
    from lightcompress_tpu.serving.pp import PPDecoder

    model = make_tiny_adapter(seed=23, vocab=128, hidden=64, inter=128,
                              layers=4, heads=4, kv_heads=2)
    sw = build_serving_weights(
        model, QuantSpec(bit=8, symmetric=True, granularity="per_channel"))
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    ppd = PPDecoder(sw, mesh, max_slots=2, max_len=32)
    prompt = [3, 17, 9, 2, 100, 44]
    lg_pp = ppd.prefill(0, prompt)

    eng = LLMEngine(sw, max_slots=2, max_len=32, kv_bits=16,
                    prefill_buckets=(len(prompt),))
    ids = np.zeros((1, len(prompt)), np.int32)
    ids[0] = prompt
    cache, lengths, lg_1 = eng._prefill_jit(
        eng.sw, eng.cache, eng.lengths, jnp.asarray(ids), jnp.asarray(0),
        jnp.asarray(len(prompt)), T=len(prompt))
    corr = float(jnp.corrcoef(lg_pp, lg_1)[0, 1])
    assert corr > 0.999, corr
    # continue decoding on both paths
    cur = jnp.asarray([int(jnp.argmax(lg_1)), 0], jnp.int32)
    active = jnp.asarray([True, False])
    for step in range(2):
        lg_pp = ppd.decode(cur, active)
        cache, lengths, lg_d = eng._decode_jit(
            eng.sw, cache, lengths, cur, active)
        corr = float(jnp.corrcoef(lg_pp[0], lg_d[0])[0, 1])
        assert corr > 0.999, (step, corr)
        cur = cur.at[0].set(int(jnp.argmax(lg_d[0])))


def test_sp_serving_prefill_matches_engine():
    """Sequence-parallel serving prefill writes the same cache state and
    logits as the engine's single-device prefill."""
    import numpy as np
    from jax.sharding import Mesh

    from helpers import make_tiny_adapter
    from lightcompress_tpu.parallel.sequence import sp_serving_prefill
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving import LLMEngine, build_serving_weights

    model = make_tiny_adapter(seed=24, vocab=128, hidden=64, inter=128,
                              layers=2, heads=4, kv_heads=2)
    sw = build_serving_weights(
        model, QuantSpec(bit=8, symmetric=True, granularity="per_channel"))
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    prompt = [3, 17, 9, 2, 100, 44, 7, 8]
    ids = np.asarray([prompt], np.int32)

    e1 = LLMEngine(sw, max_slots=2, max_len=32, kv_bits=8,
                   prefill_buckets=(8,))
    cache, lengths, ref = e1._prefill_jit(
        e1.sw, e1.cache, e1.lengths, jnp.asarray(ids), jnp.asarray(0),
        jnp.asarray(len(prompt)), T=8)

    e2 = LLMEngine(sw, max_slots=2, max_len=32, kv_bits=8,
                   prefill_buckets=(8,))
    got = sp_serving_prefill(mesh, e2, ids, 0, len(prompt))
    corr = float(jnp.corrcoef(got, ref)[0, 1])
    assert corr > 0.999, corr
    np.testing.assert_array_equal(np.asarray(e2.lengths),
                                  np.asarray(lengths))
    # cache contents match up to sharded-reduction rounding (float
    # accumulation order differs across the sp shards, so a small
    # fraction of int8 codes land one step away)
    from lightcompress_tpu.serving.kv_cache import read_kv

    k1, v1 = read_kv(cache, 0)
    k2, v2 = read_kv(e2.cache, 0)
    np.testing.assert_allclose(np.asarray(k2, np.float32),
                               np.asarray(k1, np.float32),
                               atol=0.05, rtol=0.1)
