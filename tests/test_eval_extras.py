"""New eval types: video_gen sampler, just_infer two-turn VQA consistency,
vqa stage-latency, and the pipeline dispatch for acc/vqa/code/just_infer/
video_gen (reference eval/utils.py:49-74)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from lightcompress_tpu.eval import (
    CustomGenerateJustInfer,
    VideoGenerateEval,
    flow_match_sigmas,
)
from lightcompress_tpu.models.dit import WanT2V


def test_flow_match_sigmas():
    s = flow_match_sigmas(10, shift=5.0)
    assert s.shape == (11,)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] == pytest.approx(0.0)
    assert np.all(np.diff(s) < 0)


def test_video_generate_eval(tmp_path):
    m = WanT2V.tiny(seed=0)
    rng = np.random.RandomState(0)
    samples = [
        {"ctx": rng.randn(1, 8, 64).astype(np.float32), "n_tokens": 16},
        {"ctx": rng.randn(1, 8, 64).astype(np.float32),
         "neg_ctx": rng.randn(1, 8, 64).astype(np.float32), "n_tokens": 16},
    ]
    ev = VideoGenerateEval(m, str(tmp_path), testenc=samples, num_steps=3,
                           n_tokens=16)
    ev.eval(eval_pos="fake_quant")
    for i in range(2):
        lat = np.load(tmp_path / f"fake_quant_output_{i}.npy")
        assert lat.shape == (1, 16, 128)
        assert np.all(np.isfinite(lat))


def test_just_infer_metric():
    # two pairs; pair 1 fully consistent, pair 2 turn-1-right/turn-2-wrong
    data = [
        {"gt": ["cat", "red"], "answer": ["a cat", "red thing"]},
        {"gt": ["red", "cat"], "answer": ["red", "the cat"]},
        {"gt": ["dog", "blue"], "answer": ["a dog", "green"]},
        {"gt": ["blue", "dog"], "answer": ["blue", "a fish"]},
    ]
    acc = CustomGenerateJustInfer.eval_answer(data)
    # T1V: all 4 turn-1 answers right; T1V_T2V: only pair 1's two cross
    # checks pass -> 2/4
    assert acc == pytest.approx(0.5)


def test_just_infer_end_to_end(tmp_path):
    from lightcompress_tpu.models.llava import make_tiny_llava

    m = make_tiny_llava(seed=0)

    class _Tok:
        eos_token_id = None

        def __call__(self, text, return_tensors="np"):
            ids = np.array([[min(3 + len(text) % 7, 9), 5, 6]], np.int32)

            class R:
                input_ids = ids

            return R()

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    m.tokenizer = _Tok()
    rng = np.random.RandomState(0)
    px = rng.randn(1, 32, 32, 3).astype(np.float32)
    np.save(tmp_path / "img0.npy", px)
    samples = [
        {"image": str(tmp_path / "img0.npy"), "question": ["q1", "q2"],
         "gt": ["x", "y"]},
        {"image": str(tmp_path / "img0.npy"), "question": ["q2", "q1"],
         "gt": ["y", "x"]},
    ]
    with open(tmp_path / "samples.json", "w") as f:
        json.dump(samples, f)
    ev = CustomGenerateJustInfer(
        m, str(tmp_path), save_path=str(tmp_path / "ans.json"),
        max_new_tokens=2)
    res = ev.eval()
    assert res == "custom gen done."
    out = json.load(open(tmp_path / "ans.json"))
    assert len(out) == 2 and len(out[0]["answer"]) == 2


def test_pipeline_eval_dispatch(tmp_path):
    """_build_one_eval must route every reference eval type."""
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.pipeline import _build_one_eval
    from lightcompress_tpu.models.dit import WanT2V

    m = WanT2V.tiny(seed=0)
    rng = np.random.RandomState(0)
    vg = str(tmp_path / "vids")
    samples = np.array(
        [{"ctx": rng.randn(1, 8, 64).astype(np.float32), "n_tokens": 16}],
        dtype=object)
    np.savez(tmp_path / "vid_samples.npz", samples=samples)
    obj, etype = _build_one_eval(
        m, DotDict({"type": "video_gen", "output_video_path": vg,
                    "num_steps": 2, "path": str(tmp_path /
                                                "vid_samples.npz")}),
        "t2v")
    assert etype == "video_gen" and len(obj.testenc) == 1
    obj.eval(eval_pos="pretrain")
    assert os.path.exists(os.path.join(vg, "pretrain_output_0.npy"))

    # acc dispatch on a tiny ViT
    from lightcompress_tpu.models.vit import Vit

    vit = Vit.tiny(seed=0) if hasattr(Vit, "tiny") else None
    if vit is not None:
        px = rng.randn(4, vit.image_size, vit.image_size, 3).astype("f") \
            if hasattr(vit, "image_size") else None
    np.savez(tmp_path / "acc.npz",
             pixels=rng.randn(2, 32, 32, 3).astype(np.float32),
             labels=np.array([0, 1]))
    # just check dispatch path wiring (model may not match data shapes)
    obj, etype = _build_one_eval(
        m, DotDict({"type": "acc", "path": str(tmp_path / "acc.npz")}),
        "imagenet")
    assert etype == "acc"

    obj, etype = _build_one_eval(
        m, DotDict({"type": "just_infer", "path": str(tmp_path)}), "custom")
    assert etype == "just_infer"

    obj, etype = _build_one_eval(
        m, DotDict({"type": "vqa", "tasks": ["mme"]}), "mme")
    assert etype == "vqa"
    with pytest.raises(RuntimeError):
        obj.eval()  # lmms-eval not installed in sandbox


def test_tpu_capability_dispatch():
    """is_fp8_supported_gpu() analogue (reference quantization/utils.py:8-15)
    — CPU backend reports conservative caps; table covers v4..v7."""
    from lightcompress_tpu.utils.capability import (
        TpuCapability,
        is_fp8_supported_tpu,
        tpu_capability,
    )

    cap = tpu_capability()
    assert isinstance(cap, TpuCapability)
    assert cap.generation in ("v4", "v5e", "v5p", "v6e", "v7", "cpu")
    assert isinstance(is_fp8_supported_tpu(), bool)
    # fp8_matmul must work under either dispatch branch
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightcompress_tpu.ops.scaled_matmul import fp8_matmul

    rng = np.random.RandomState(0)
    w = rng.randn(16, 8).astype(np.float32) * 0.1
    import torch

    w8 = torch.tensor(w).to(torch.float8_e4m3fn).float().numpy()
    x = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    y = fp8_matmul(x, jnp.asarray(w8).astype(jnp.float8_e4m3fn),
                   jnp.ones((16,), jnp.float32))
    ref = np.asarray(x) @ w8.T
    np.testing.assert_allclose(np.asarray(y), ref, atol=0.15, rtol=0.1)


def test_int8_decode_attention_numerics():
    """Fully-int8 decode attention matches float attention within int8
    quantization error."""
    import jax.numpy as jnp

    from lightcompress_tpu.ops.scaled_matmul import int8_decode_attention

    rng = np.random.RandomState(0)
    B, K, G, S, D = 2, 2, 4, 32, 16
    q = rng.randn(B, K, G, D).astype(np.float32)
    k = rng.randn(B, K, S, D).astype(np.float32)
    v = rng.randn(B, K, S, D).astype(np.float32)

    def q8(t):
        amax = np.abs(t).max(-1, keepdims=True)
        sc = np.maximum(amax, 1e-8) / 127.0
        return np.clip(np.round(t / sc), -127, 127).astype(np.int8), \
            sc[..., 0]

    k8, ks = q8(k)
    v8, vs = q8(v)
    out = np.asarray(int8_decode_attention(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(ks),
        jnp.asarray(v8), jnp.asarray(vs)))
    # float reference on the DEQUANTIZED kv (isolates q/prob quant error)
    kd = k8.astype(np.float32) * ks[..., None]
    vd = v8.astype(np.float32) * vs[..., None]
    sc = np.einsum("bkgd,bksd->bkgs", q, kd) * (D ** -0.5)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bkgs,bksd->bkgd", p, vd)
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)


def test_calib_apply_chat_template():
    """calib.apply_chat_template wraps texts in the tokenizer chat template
    (base_dataset.py:27,99); add_answer keeps the assistant turn."""
    import numpy as np

    from lightcompress_tpu.data.dataset import CalibDataset

    class Tok:
        chat_template = "x"

        def apply_chat_template(self, msgs, tokenize=False,
                                add_generation_prompt=True):
            body = "|".join(m["content"] for m in msgs)
            return f"<chat>{body}</chat>" + ("<gen>" if add_generation_prompt
                                             else "")

        def __call__(self, text, **kw):
            class R:
                input_ids = np.array(
                    [[len(text) % 7 + 1] * kw.get("max_length", 8)])
            return R()

        pad_token_id = 0

    ds = CalibDataset(Tok(), {
        "name": "custom_txt", "path": "/dev/null", "n_samples": 2,
        "seq_len": 4, "preproc": "random_truncate_txt",
        "apply_chat_template": True,
    })
    ds.raw = ["hello", "world"]
    wrapped = ds._chat_wrap(ds.raw, "text")
    assert wrapped == ["<chat>hello</chat><gen>", "<chat>world</chat><gen>"]
    ds.add_answer = True
    w2 = ds._chat_wrap([{"text": "q"}], "text")  # list of strings only path
    assert isinstance(w2, list)


def test_decode_ppl_num_samples():
    """decode_ppl caps eval texts at num_samples rows (eval_ppl.py:65)."""
    import numpy as np

    from lightcompress_tpu.eval import DecodePerplexityEval
    from helpers import make_tiny_adapter

    m = make_tiny_adapter(seed=40)
    enc = np.random.RandomState(0).randint(0, 256, (3, 12)).astype(np.int32)
    p2 = DecodePerplexityEval(enc, num_eval_tokens=8, num_samples=1).eval(m)
    assert np.isfinite(p2)
