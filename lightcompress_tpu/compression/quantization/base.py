"""BaseBlockwiseQuantization — the heart of the compression engine.

Functional re-design of
llmc/compression/quantization/base_blockwise_quantization.py (1029 LoC):

- ``set_quant_config`` (bbq.py:133-268): quantizer spec selection, act-static,
  KV-cache quant, weight clip, mixed precision, special flags.
- equivalent-transform primitives (bbq.py:596-778): ``scale_ln_fcs``,
  ``scale_fc_fc``, ``shift_*`` — here pure functions on the params pytree.
- per-layer quant state (the reference's ``buf_*`` registered buffers):
  ``self.layer_state[block_idx][name]`` dict carrying clip factors, static
  qparams, GPTQ scales/perm, no_quant flags.
- ``block_opt`` (bbq.py:392-461): collect feats -> transform -> static act
  calib -> propagate (float or quantized outputs).
- deploy/eval (bbq.py:932-1029): fake-quant deployment bakes ``w_qdq`` into a
  copy-on-write params tree (EffcientFakeQuantLinear semantics).
"""

from __future__ import annotations

import copy
import gc
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import DotDict
from ...models import arch as A
from ...models.base import BaseModel, Subset, resolve
from ...quant import (
    QParams,
    QuantSpec,
    fake_quant_act_dynamic,
    fake_quant_act_static,
    fake_quant_weight_dynamic,
    fake_quant_weight_static,
    get_tensor_qparams,
    qparams_from_range,
    spec_from_config,
    static_act_qparams,
)
from ..blockwise import BlockwiseOpt

Array = jax.Array


class BaseBlockwiseQuantization(BlockwiseOpt):
    def __init__(self, model, quant_config, input_batches, padding_masks=None,
                 config=None):
        super().__init__(model, quant_config, input_batches, padding_masks, config)
        self.layer_state: List[Dict[str, Dict[str, Any]]] = [
            {} for _ in range(model.num_blocks)
        ]
        self.weight_clips: Dict[int, Dict[str, Any]] = {}
        self.set_quant_config()

    # ------------------------------------------------------------------
    # config parsing (bbq.py:133-268)
    # ------------------------------------------------------------------
    def set_quant_config(self):
        qc = self.quant_config
        self.quant_out = qc.get("quant_out", False)
        self.tp = qc.get("tp", 1)

        wcfg = qc.get("weight", {"bit": 8, "symmetric": True,
                                 "granularity": "per_channel"})
        self.w48 = wcfg.get("bit") == 48
        if self.w48:
            self.wspec8 = spec_from_config(wcfg.get("w_2", wcfg.get("bit8", {})))
            self.wspec = spec_from_config(wcfg.get("w_1", wcfg.get("bit4", {})))
        else:
            self.wspec = spec_from_config(wcfg)
        # mixed-bit sub-configs (utils.py:38-43)
        self.mix_bits_specs: Dict[str, QuantSpec] = {}
        for sub_key in ("w_1", "w_2"):
            if not self.w48 and sub_key in qc:
                sub = qc[sub_key]
                spec = spec_from_config(sub)
                for lname in sub.get("layer_names", []):
                    self.mix_bits_specs[_canon_name(lname)] = spec

        if "act" in qc and qc.get("act") is not None:
            self.w_only = False
            self.aspec = spec_from_config(qc["act"])
            self.act_static = qc["act"].get("static", False)
            if self.act_static and self.aspec.granularity != "per_tensor":
                raise ValueError("only per_tensor static act quant supported")
            self.quant_attn = qc["act"].get("quant_attn", False)
            self.quant_softmax = qc["act"].get("quant_softmax", False)
            self.quant_act_fn = qc["act"].get("quant_act_fn", False)
        else:
            self.w_only = True
            self.aspec = None
            self.act_static = False
            self.quant_attn = False
            self.quant_softmax = False
            self.quant_act_fn = False

        # KV-cache quant (bbq.py:199-214)
        if "kvcache" in qc and qc.get("kvcache") is not None:
            from ...registry import KV_REGISTRY

            kvc = dict(qc["kvcache"])
            kvc["static"] = self.act_static
            self.kv_module = KV_REGISTRY[kvc["method"]](
                kvc.get("quant_type", "int-quant"), kvc, self.model.num_blocks
            )
            self.quant_kvcache = True
        else:
            self.kv_module = None
            self.quant_kvcache = False

        special = qc.get("special", {})
        self.special_config = special
        self.true_sequential = special.get("true_sequential", False)
        self.weight_clip = special.get("weight_clip", False)
        if self.weight_clip or special.get("search_clip_init", False):
            from .auto_clip import AutoClipper

            self.save_clip = special.get("save_clip", False)
            if self.save_clip:
                self.clip_path = special["clip_path"]
            self.clip_version = special.get("clip_version", "v1")
            clip_sym = special.get("clip_sym", self.wspec.symmetric)
            self.auto_clipper = AutoClipper(
                w_only=self.w_only,
                wspec=self.wspec,
                aspec=self.aspec,
                clip_version=self.clip_version,
                clip_sym=clip_sym,
                save_clip=self.save_clip,
                padding_mask=self.padding_masks,
            )
        self.save_scale = special.get("save_scale", False)
        self.online_rotate = special.get("online_rotate", False)
        self.do_gqa_trans = special.get("do_gqa_trans", False)

        # token reduction composability (bbq.py:261-265)
        if "token_reduction" in qc and qc.get("token_reduction"):
            from ...registry import TOKEN_REDUCTION_REGISTRY

            trc = qc["token_reduction"]
            TOKEN_REDUCTION_REGISTRY[trc["method"]](dict(trc), self.model)

        # mixed precision ignored layers (bbq.py:137-144)
        ig = self.config.get("ignored_layers", None) if self.config else None
        if ig:
            self.ignored_block_ids = list(ig.get("block_ids", []))
            self.ignored_layer_names = [
                _canon_name(n) for n in ig.get("layer_names", [])
            ]
            # per-instance full names, e.g. "blocks.3.mlp.down"
            # (reference key is spelled 'speical_names',
            # bbq.py:141,911-929; accept the corrected spelling too)
            self.ignored_special_names = [
                _canon_name(n)
                for n in (list(ig.get("speical_names", []))
                          + list(ig.get("special_names", [])))
            ]
        else:
            self.ignored_block_ids = []
            self.ignored_layer_names = []
            self.ignored_special_names = []

        arch = self.model.arch
        self.has_gqa = arch.num_kv_heads < arch.num_heads

    # ------------------------------------------------------------------
    # per-layer quant state helpers
    # ------------------------------------------------------------------
    def state(self, block_idx: int, name: str) -> Dict[str, Any]:
        return self.layer_state[block_idx].setdefault(name, {})

    def wspec_for(self, block_idx: int, name: str) -> QuantSpec:
        if name in self.mix_bits_specs:
            return self.mix_bits_specs[name]
        return self.wspec

    def is_ignored(self, block_idx: int, name: str) -> bool:
        if block_idx in self.ignored_block_ids:
            return True
        if name in self.ignored_layer_names:
            return True
        return f"blocks.{block_idx}.{name}" in self.ignored_special_names

    # ------------------------------------------------------------------
    # w_qdq / a_qdq (the FakeQuantLinear callbacks, bbq.py:53-75)
    # ------------------------------------------------------------------
    def w_qdq(self, w: Array, block_idx: int, name: str) -> Array:
        if self.is_ignored(block_idx, name):
            return w
        st = self.layer_state[block_idx].get(name, {})
        spec = self.wspec_for(block_idx, name)
        if self.w48:
            from ...quant import fake_quant_weight_w48

            return fake_quant_weight_w48(w, self.wspec8, spec)
        if "qparams" in st:  # statically searched (GPTQ / clip v2 baked)
            return fake_quant_weight_static(w, spec, st["qparams"])
        if "upbound_factor" in st and st["upbound_factor"] is not None:
            args = {
                "upbound_factor": st["upbound_factor"],
                "lowbound_factor": st.get("lowbound_factor"),
            }
            return fake_quant_weight_dynamic(
                w, spec.with_(calib_algo="learnable"), args=args
            )
        return fake_quant_weight_dynamic(w, spec)

    def a_qdq(self, x: Array, block_idx: int, name: str) -> Array:
        if self.w_only or self.is_ignored(block_idx, name):
            return x
        st = self.layer_state[block_idx].get(name, {})
        if self.act_static and "act_qparams" in st:
            return fake_quant_act_static(x, self.aspec, st["act_qparams"])
        return fake_quant_act_dynamic(x, self.aspec)

    def fq_linear_fn(self, block_idx: int) -> A.LinearFn:
        """FakeQuantLinear forward: dynamic weight qdq + act qdq."""

        def lf(name, w, b, x):
            x = self.model.apply_online_rotate(name, x)
            x = self.a_qdq(x, block_idx, name)
            wq = self.w_qdq(w, block_idx, name)
            return A.default_linear(name, wq, b, x)

        return lf

    # ------------------------------------------------------------------
    # equivalent-transform primitives on the params tree (bbq.py:596-778)
    # ------------------------------------------------------------------
    def repeat_gqa_scales(self, scales: Array) -> Array:
        arch = self.model.arch
        s = scales.reshape(arch.num_kv_heads, arch.head_dim)
        return jnp.repeat(s, arch.kv_groups, axis=0).reshape(-1)

    def scale_ln_fcs(self, bp: Dict, ln_name: str, fc_names: List[str],
                     scales: Array) -> None:
        ln = resolve(bp, ln_name)
        s = scales.astype(jnp.float32)
        ln["weight"] = (ln["weight"].astype(jnp.float32) / s).astype(ln["weight"].dtype)
        if "bias" in ln and ln["bias"] is not None:
            ln["bias"] = (ln["bias"].astype(jnp.float32) / s).astype(ln["bias"].dtype)
        for fn in fc_names:
            fc = resolve(bp, fn)
            w = fc["weight"]
            fc["weight"] = (w.astype(jnp.float32) * s[None, :]).astype(w.dtype)
        self._assert_finite(bp, [ln_name] + fc_names)

    def scale_fc_fc(self, bp: Dict, fc1_name: str, fc2_name: str,
                    scales: Array) -> None:
        fc1, fc2 = resolve(bp, fc1_name), resolve(bp, fc2_name)
        s = scales.astype(jnp.float32)
        out1, in2 = fc1["weight"].shape[0], fc2["weight"].shape[1]
        if out1 == in2:
            fc1["weight"] = (
                fc1["weight"].astype(jnp.float32) / s[:, None]
            ).astype(fc1["weight"].dtype)
            if "bias" in fc1 and fc1["bias"] is not None:
                fc1["bias"] = (fc1["bias"].astype(jnp.float32) / s).astype(
                    fc1["bias"].dtype
                )
            s2 = s
        elif self.has_gqa and self.do_gqa_trans:
            # GQA: scale v rows by s (kv_dim), o columns by repeated s
            fc1["weight"] = (
                fc1["weight"].astype(jnp.float32) / s[:, None]
            ).astype(fc1["weight"].dtype)
            if "bias" in fc1 and fc1["bias"] is not None:
                fc1["bias"] = (fc1["bias"].astype(jnp.float32) / s).astype(
                    fc1["bias"].dtype
                )
            s2 = self.repeat_gqa_scales(scales).astype(jnp.float32)
        else:
            raise ValueError(
                f"cannot scale fc-fc: {fc1_name}({out1}) -> {fc2_name}({in2})"
            )
        fc2["weight"] = (
            fc2["weight"].astype(jnp.float32) * s2[None, :]
        ).astype(fc2["weight"].dtype)
        self._assert_finite(bp, [fc1_name, fc2_name])

    def shift_ln_fcs(self, bp: Dict, ln_name: str, fc_names: List[str],
                     shifts: Array) -> None:
        ln = resolve(bp, ln_name)
        sh = shifts.astype(jnp.float32)
        if "bias" in ln and ln["bias"] is not None:
            ln["bias"] = (ln["bias"].astype(jnp.float32) - sh).astype(ln["bias"].dtype)
        for fn in fc_names:
            fc = resolve(bp, fn)
            w = fc["weight"].astype(jnp.float32)
            delta = w @ sh
            if "bias" in fc and fc["bias"] is not None:
                fc["bias"] = (fc["bias"].astype(jnp.float32) + delta).astype(
                    fc["bias"].dtype
                )
            else:
                fc["bias"] = delta.astype(fc["weight"].dtype)

    def shift_fc_fc(self, bp: Dict, fc1_name: str, fc2_name: str,
                    shifts: Array) -> None:
        fc1, fc2 = resolve(bp, fc1_name), resolve(bp, fc2_name)
        sh = shifts.astype(jnp.float32)
        if "bias" in fc1 and fc1["bias"] is not None:
            fc1["bias"] = (fc1["bias"].astype(jnp.float32) - sh).astype(
                fc1["bias"].dtype
            )
        w2 = fc2["weight"].astype(jnp.float32)
        delta = w2 @ sh
        if "bias" in fc2 and fc2["bias"] is not None:
            fc2["bias"] = (fc2["bias"].astype(jnp.float32) + delta).astype(
                fc2["bias"].dtype
            )
        else:
            fc2["bias"] = delta.astype(fc2["weight"].dtype)

    def apply_scale(self, bp: Dict, subset: Subset, scales: Array) -> None:
        if subset.prev_type == "linear":
            assert len(subset.layers) == 1
            self.scale_fc_fc(bp, subset.prev_op, subset.layers[0], scales)
        elif subset.prev_type == "norm":
            self.scale_ln_fcs(bp, subset.prev_op, list(subset.layers), scales)
        else:
            raise NotImplementedError(f"prev_type {subset.prev_type}")

    def apply_shift(self, bp: Dict, subset: Subset, shifts: Optional[Array]) -> None:
        if shifts is None:
            return
        if subset.prev_type == "linear":
            self.shift_fc_fc(bp, subset.prev_op, subset.layers[0], shifts)
        elif subset.prev_type == "norm":
            self.shift_ln_fcs(bp, subset.prev_op, list(subset.layers), shifts)

    def _assert_finite(self, bp: Dict, names: List[str]) -> None:
        """NaN guards after equivalent transforms (bbq.py:743-747,774-778).

        One fused all-finite reduction per touched tensor; disable with
        LCTPU_NAN_CHECKS=0 to avoid the calibration-time host syncs."""
        import os

        if os.environ.get("LCTPU_NAN_CHECKS", "1") == "0":
            return
        for n in names:
            node = resolve(bp, n)
            for key in ("weight", "bias"):
                t = node.get(key)
                if t is None:
                    continue
                if not bool(jnp.all(jnp.isfinite(t.astype(jnp.float32)))):
                    raise FloatingPointError(
                        f"non-finite values in {n}.{key} after equivalent "
                        f"transform (reference asserts at bbq.py:743-747)")

    def update_input_feat(
        self, feats: Dict[str, List[Array]], subset: Subset, scales: Array,
        is_gqa: bool = False,
    ) -> None:
        """Divide cached activations by the applied scale (bbq.py:891-897)."""
        s = scales
        if is_gqa:
            s = self.repeat_gqa_scales(scales)
        for lname in subset.layers:
            if lname in feats:
                feats[lname] = [x / s for x in feats[lname]]

    # ------------------------------------------------------------------
    # static act calibration (bbq.py:566-588)
    # ------------------------------------------------------------------
    def register_act_qparams(self, block_idx: int,
                             feats: Dict[str, List[Array]]) -> None:
        if not (self.act_static and self.aspec is not None):
            return
        for name in self.model.get_block_linear_names(block_idx):
            if name not in feats:
                continue
            qp = static_act_qparams(feats[name], self.aspec)
            # DP merge across data-parallel workers (bbq.py:577 all_reduce)
            from ...parallel.dist import all_reduce_mean

            qp = QParams(all_reduce_mean(qp.scales), all_reduce_mean(qp.zeros))
            self.state(block_idx, name)["act_qparams"] = qp

    # ------------------------------------------------------------------
    # block loop (bbq.py:392-461)
    # ------------------------------------------------------------------
    def block_opt(self, block_idx: int):
        feats, outs = self.collect_block_io(block_idx)
        if not self.quant_out:
            # float outputs become next block's inputs (pre-transform outputs
            # match reference: collected during the hook forward)
            self.input_batches = outs
        self.block_transform(block_idx, feats)
        self.register_act_qparams(block_idx, feats)
        if (self.quant_kvcache and getattr(self.kv_module, "static", False)
                and getattr(self, "_last_kv_states", None)):
            ks = [kv[0] for kv in self._last_kv_states]
            vs = [kv[1] for kv in self._last_kv_states]
            self.kv_module.calibrate(block_idx, ks, vs)
        if self.quant_out:
            self.input_batches = self.block_forward_batches(
                block_idx, linear_fn=self.fq_linear_fn(block_idx)
            )
        del feats
        gc.collect()

    def block_transform(self, block_idx: int, input_feat: Dict[str, List[Array]]):
        bp = self.model.blocks[block_idx]
        for subset in self.model.get_subsets_in_block(block_idx):
            self.subset_transform(block_idx, bp, subset, input_feat)
            if self.true_sequential:
                # re-collect with transformed weights for later subsets
                input_feat_new, _ = self.collect_block_io(block_idx)
                input_feat.update(input_feat_new)

    def subset_transform(self, block_idx: int, bp: Dict, subset: Subset,
                         input_feat: Dict[str, List[Array]]):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # deploy / eval (bbq.py:932-1029)
    # ------------------------------------------------------------------
    def deploy(self, mode: str = "fake_quant"):
        """Install a deployment on the model.

        modes: 'origin_float'/'transformed' (float forward, keeps transforms),
        'fake_quant' (bake w_qdq once + runtime act quant + KV quant),
        'fake_quant_wo_kv' (same without KV quant).
        """
        model = self.model
        if mode in ("origin_float", "transformed"):
            model.deploy_float()
            return
        if mode not in ("fake_quant", "fake_quant_wo_kv"):
            raise ValueError(mode)
        if not hasattr(model, "_fp_blocks"):
            model._fp_blocks = model.get_param_blocks()
        # copy-on-write bake of quantized weights (host-offloaded blocks are
        # quantized one at a time on device then returned to host RAM)
        host = getattr(model, "host_offload", False)
        if host:
            from ...models.streaming import tree_to_device, tree_to_host
        new_blocks = []
        for idx, bp in enumerate(model._fp_blocks):
            nbp = _struct_copy(bp)
            if host:
                nbp = tree_to_device(nbp)
            for name in model.get_block_linear_names(idx):
                node = resolve(nbp, name)
                node["weight"] = self.w_qdq(jnp.asarray(node["weight"]),
                                            idx, name)
            if host:
                nbp = tree_to_host(nbp)
            new_blocks.append(nbp)
        model.set_param_blocks(new_blocks)
        # runtime act quant fns
        if not self.w_only:
            model.linear_fns = [
                self._act_linear_fn(idx) for idx in range(model.num_blocks)
            ]
        else:
            model.linear_fns = None
        if self.quant_kvcache and mode == "fake_quant":
            model.kv_hooks = [
                self.kv_module.make_hook(idx) for idx in range(model.num_blocks)
            ]
        else:
            model.kv_hooks = None
        # attention-internal quant (LlmcMatmul/LlmcSoftmax, attn_utils.py)
        if self.quant_attn and self.aspec is not None:
            aspec = self.aspec

            def matmul_hook(which, a, b):
                return (
                    fake_quant_act_dynamic(a, aspec),
                    fake_quant_act_dynamic(b, aspec),
                )

            model.attn_matmul_hook = matmul_hook
            if self.quant_softmax:
                # softmax outputs are in [0,1]: asymmetric quant
                sspec = aspec.with_(symmetric=False)

                def softmax_hook(p):
                    return fake_quant_act_dynamic(p, sspec)

                model.attn_softmax_hook = softmax_hook

    def _act_linear_fn(self, block_idx: int) -> A.LinearFn:
        def lf(name, w, b, x):
            x = self.model.apply_online_rotate(name, x)
            x = self.a_qdq(x, block_idx, name)
            return A.default_linear(name, w, b, x)

        return lf

    def restore_float(self):
        model = self.model
        if hasattr(model, "_fp_blocks"):
            model.set_param_blocks(model._fp_blocks)
        model.attn_matmul_hook = None
        model.attn_softmax_hook = None
        model.deploy_float()

    def save_model(self, save_dir: str):
        from ...models.hf_loader import save_params

        save_params(self.model, save_dir,
                    hf_config=getattr(self.model, "config", None))


def _struct_copy(tree):
    """Copy dict structure, share leaf arrays."""
    if isinstance(tree, dict):
        return {k: _struct_copy(v) for k, v in tree.items()}
    return tree


def _canon_name(name: str) -> str:
    """Map reference/HF layer names to canonical short names.

    Per-instance names keep their block index: 'model.layers.3.self_attn.
    q_proj' -> 'blocks.3.attn.q' (the ignored_layers speical_names form,
    bbq.py:911-929)."""
    import re

    table = {
        "q_proj": "attn.q", "k_proj": "attn.k", "v_proj": "attn.v",
        "o_proj": "attn.o", "out_proj": "attn.o",
        "gate_proj": "mlp.gate", "up_proj": "mlp.up", "down_proj": "mlp.down",
        "fc1": "mlp.fc1", "fc2": "mlp.fc2",
    }
    m = re.search(r"(?:layers|blocks|h)\.(\d+)\.", name)
    prefix = f"blocks.{m.group(1)}." if m else ""
    for k, v in table.items():
        if k in name:
            return prefix + v
    return name
