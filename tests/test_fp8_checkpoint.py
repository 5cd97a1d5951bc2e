"""FP8 block-quantized checkpoint loading (DeepSeek-V3/R1 format,
reference base_model.py:205-264): linear weights stored as float8_e4m3fn
plus per-(b0,b1)-block ``weight_scale_inv``; the loader dequantizes on
read."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


BS = (8, 8)


def _fp8_block_quant(w: np.ndarray, bs=BS):
    import torch

    b0, b1 = bs
    oc, ic = w.shape
    p0, p1 = -oc % b0, -ic % b1
    wp = np.pad(w, ((0, p0), (0, p1)))
    blocks = wp.reshape(wp.shape[0] // b0, b0, wp.shape[1] // b1, b1)
    amax = np.abs(blocks).max(axis=(1, 3))
    scale = np.maximum(amax, 1e-12) / 448.0
    q = wp / np.repeat(np.repeat(scale, b0, 0), b1, 1)
    q8 = torch.tensor(q).to(torch.float8_e4m3fn)
    return q8, torch.tensor(scale.astype(np.float32))


@pytest.fixture(scope="module")
def fp8_ckpt(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import torch
    from helpers import make_tiny_hf_llama
    from safetensors.torch import save_file

    tmp = str(tmp_path_factory.mktemp("fp8"))
    d, hf = make_tiny_hf_llama(tmp, seed=3)
    sd = hf.state_dict()
    out = {}
    for k, v in sd.items():
        is_linear = v.ndim == 2 and "layers." in k and "norm" not in k \
            and "embed" not in k
        if is_linear:
            q8, sinv = _fp8_block_quant(v.float().numpy())
            out[k] = q8
            out[k[: -len(".weight")] + ".weight_scale_inv"] = sinv
        else:
            out[k] = v.float()
    save_file(out, os.path.join(d, "model.safetensors"))
    idx = os.path.join(d, "model.safetensors.index.json")
    if os.path.exists(idx):
        os.remove(idx)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "fp8",
        "fmt": "e4m3",
        "weight_block_size": list(BS),
        "activation_scheme": "dynamic",
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    # reference torch forward on the dequantized weights
    with torch.no_grad():
        for k in list(sd):
            if k in out and out[k].dtype == torch.float8_e4m3fn:
                sinv = out[k[: -len(".weight")] + ".weight_scale_inv"]
                b0, b1 = BS
                oc, ic = sd[k].shape
                se = sinv.repeat_interleave(b0, 0)[:oc] \
                    .repeat_interleave(b1, 1)[:, :ic]
                sd[k].copy_(out[k].float() * se)
    return d, hf


def test_fp8_load_matches_torch(fp8_ckpt):
    import torch

    d, hf = fp8_ckpt
    from lightcompress_tpu.models.hf_loader import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    ids = np.arange(1, 9, dtype=np.int32)[None]
    ours = np.asarray(m.jit_forward()(jnp.asarray(ids)))
    with torch.no_grad():
        theirs = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-2)


def test_fp8_reader_passthrough(fp8_ckpt):
    """Tensors without a scale companion read unchanged."""
    d, _ = fp8_ckpt
    from lightcompress_tpu.models.hf_loader import (
        _Fp8DequantReader,
        _ShardReader,
    )

    r = _Fp8DequantReader(_ShardReader(d), BS)
    emb = r.get("model.embed_tokens.weight")
    assert emb is not None and emb.ndim == 2
    w = r.get("model.layers.0.self_attn.q_proj.weight")
    assert np.isfinite(w).all() and w.dtype == np.float32
