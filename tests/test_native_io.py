"""Native C++ safetensors streamer: zero-copy mmap views must be
byte-identical to the Python safetensors reader, and model loads must be
unaffected by which IO path runs."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import make_tiny_hf_llama


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d, _ = make_tiny_hf_llama(str(tmp_path_factory.mktemp("nio")))
    return d


def _native():
    from lightcompress_tpu.native import NativeShardStreamer, \
        native_available
    if not native_available():
        pytest.skip("no g++ toolchain")
    return NativeShardStreamer


def test_native_streamer_matches_safe_open(tiny_dir):
    from safetensors import safe_open

    NS = _native()
    path = os.path.join(tiny_dir, "model.safetensors")
    st = NS(path)
    with safe_open(path, framework="numpy") as f:
        keys = list(f.keys())
        assert set(st.keys()) == set(keys)
        for k in keys:
            want = f.get_tensor(k)
            got = st.get(k)
            assert got.shape == want.shape
            np.testing.assert_array_equal(np.asarray(got), want)


def test_native_streamer_bf16_bits(tmp_path):
    import torch
    from safetensors.torch import save_file

    NS = _native()
    t = torch.randn(4, 8, dtype=torch.bfloat16)
    p = str(tmp_path / "bf16.safetensors")
    save_file({"w": t}, p)
    st = NS(p)
    got = st.get("w")
    assert got.dtype == np.uint16 and st.dtype_of("w") == "BF16"
    want = t.view(torch.uint16).numpy()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_load_model_native_vs_python_io(tiny_dir):
    from lightcompress_tpu.models import load_model

    ids = jnp.asarray([[1, 5, 9, 44]], jnp.int32)
    os.environ["LCTPU_NATIVE_IO"] = "0"
    try:
        m_py = load_model(tiny_dir, dtype=jnp.float32, with_tokenizer=False)
        ref = np.asarray(m_py.forward(ids))
    finally:
        os.environ["LCTPU_NATIVE_IO"] = "1"
    m_nat = load_model(tiny_dir, dtype=jnp.float32, with_tokenizer=False)
    got = np.asarray(m_nat.forward(ids))
    np.testing.assert_array_equal(got, ref)
